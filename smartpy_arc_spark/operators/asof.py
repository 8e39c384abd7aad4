"""As-of (most-recent-at-or-before) join.

Spark has no native as-of join (the reference has no joins beyond single-key
equi at all — SURVEY.md §2.4); this is the standard union-tag-window
construction:

  1. union the left (probe) and right (reference) streams with a tag,
  2. hash-partition by key, sort by (event time, tag) within partitions,
  3. ``last(ref_struct, ignorenulls=True)`` over the preceding window
     carries the most recent reference row forward onto each probe row
     (a struct per reference row, so legitimately-null reference values
     don't reach further back).

One shuffle on the key — the same cost as any keyed window; no range
explosion, no per-row Python.  Ties (reference time == probe time) match,
reference-first — ``ON b.ts <= a.ts`` semantics, like DuckDB ASOF JOIN and
pandas ``merge_asof(direction='backward')``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right[right_ts] <= left[left_ts]`` for the same ``on`` key
    (left-outer: unmatched probe rows keep nulls).

    ``value_cols``: right columns to carry (default: all but key+ts);
    carried columns are suffixed on collision with left columns.
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (on, right_ts)]
    out_names = {c: (c + suffix if c in left.columns else c) for c in value_cols}

    ref_struct = F.struct(*[F.col(c).alias(out_names[c]) for c in value_cols])
    rt = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_tag"),
        ref_struct.alias("_ref"),
        *[F.lit(None).cast(f.dataType).alias(f.name)
          for f in left.schema.fields],
    )
    lt = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(rt.schema["_ref"].dataType).alias("_ref"),
        *left.columns,
    )

    # reference rows (_tag=0) sort before probe rows at equal timestamps so
    # an exactly-equal reference time matches (<= semantics)
    w = (
        W.partitionBy("_k")
        .orderBy(F.col("_t").asc(), F.col("_tag").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = lt.unionByName(rt.select(lt.columns)).withColumn(
        "_m", F.last(F.col("_ref"), ignorenulls=True).over(w)
    )
    return (
        carried.where(F.col("_tag") == 1)
        .select(
            *left.columns,
            *[F.col(f"_m.{out_names[c]}").alias(out_names[c]) for c in value_cols],
        )
    )
