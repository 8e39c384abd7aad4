"""Grouped normalization — the grouped-map (``applyInPandas``) custom-
operator tier, with a built-in two-pass equivalent for skew-robust use.

``grouped_standardize`` demonstrates the pattern for per-group Python
logic that genuinely needs the whole group in memory (model scoring,
per-group fits): one shuffle on the group key, each group materialized as
one Arrow batch on an executor.

Scale note: a pathologically large group lands on ONE executor — that is
inherent to grouped-map.  For plain standardization the moments are
algebraic, so ``standardize_builtin`` computes the same z-scores with a
partial-aggregate + broadcast join (no group materialization, skew-safe);
the test suite asserts the two agree.  Reach for applyInPandas only when
the per-group computation is not expressible with built-ins.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grouped_standardize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    *,
    id_col: str,
) -> DataFrame:
    """Per-group z-score via grouped-map pandas UDF:
    ``z = (v - mean(group)) / stddev_samp(group)`` (0.0 for degenerate
    groups).  Output: (id, group, z)."""
    from smartpy_arc_spark.session import ensure_worker_imports

    ensure_worker_imports(df.sparkSession)
    schema = f"{id_col} long, {group_col} string, z double"

    def standardize(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col].astype(float)
        std = v.std(ddof=1)  # == Spark/DuckDB stddev_samp
        if pd.isna(std) or std == 0.0:
            z = v * 0.0
        else:
            z = (v - v.mean()) / std
        return pd.DataFrame(
            {id_col: pdf[id_col], group_col: pdf[group_col], "z": z}
        )

    return df.select(id_col, group_col, value_col).groupBy(group_col).applyInPandas(
        standardize, schema
    )


def standardize_builtin(
    df: DataFrame,
    group_col: str,
    value_col: str,
    *,
    id_col: str,
) -> DataFrame:
    """Same z-scores with built-ins only: per-group moments as one
    partial-aggregated shuffle, broadcast back onto the rows.  Skew-safe
    (no group ever materializes in one task) and whole-stage-codegen."""
    moments = df.groupBy(group_col).agg(
        F.avg(value_col).alias("_mu"),
        F.stddev_samp(value_col).alias("_sd"),
    )
    joined = df.select(id_col, group_col, value_col).join(
        F.broadcast(moments), on=group_col
    )
    z = F.when(
        F.col("_sd").isNull() | (F.col("_sd") == 0), F.lit(0.0)
    ).otherwise((F.col(value_col) - F.col("_mu")) / F.col("_sd"))
    return joined.select(id_col, group_col, z.alias("z"))


def l2_normalize_arrow(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    out_col: str = "unit_vec",
):
    """L2-normalize an embedding column with ``mapInArrow`` — the
    lowest-overhead Python batch API: RecordBatches flow Arrow→numpy with
    no pandas materialization, so per-batch overhead is amortized malloc,
    not Series construction.  Stateless per-batch ⇒ embarrassingly
    parallel at any scale.

    Note the built-in alternative (`F.transform` dividing by
    `sqrt(aggregate(...))`) stays fully JVM-side and is preferred in a
    larger expression; this op is the template for numpy-only kernels
    (quantization, PCA projection) that have no builtin form.
    """
    import pyarrow as pa
    from pyspark.sql import types as T

    # a fresh StructType: .add() on df.schema MUTATES the DataFrame's live
    # schema object and breaks later column resolution
    schema_out = T.StructType(
        list(df.schema.fields)
        + [T.StructField(out_col, T.ArrayType(T.FloatType()))]
    )

    def norm_batches(batches):
        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            col = tbl.column(vec_col)
            flat = col.combine_chunks()
            arr = flat.flatten().to_numpy(zero_copy_only=False)
            offsets = flat.offsets.to_numpy(zero_copy_only=False)
            import numpy as np

            out = np.empty_like(arr, dtype="float32")
            for i in range(len(offsets) - 1):
                lo, hi = offsets[i], offsets[i + 1]
                v = arr[lo:hi]
                nrm = np.sqrt((v * v).sum())
                out[lo:hi] = v / nrm if nrm > 0 else v
            unit = pa.ListArray.from_arrays(
                pa.array(offsets, type=pa.int32()),
                pa.array(out, type=pa.float32()),
            )
            yield pa.RecordBatch.from_arrays(
                [*[tbl.column(n).combine_chunks() for n in tbl.column_names], unit],
                names=[*tbl.column_names, out_col],
            )

    return df.mapInArrow(norm_batches, schema_out)
