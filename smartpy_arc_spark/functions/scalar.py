"""Scalar computation / derived columns — C1-C6 (SURVEY.md §2.5).

All implemented with built-in ``pyspark.sql.functions`` so they stay inside
whole-stage codegen; no Python UDFs anywhere in this module.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from smartpy_arc_spark.meta import tag_oid

def portable_hash64(c) -> "F.Column":
    """Engine-portable 60-bit hash of a string column: the first 15 hex
    digits of md5, parsed base-16 — deterministic, non-negative, and
    reproducible in any engine with md5 + hex parsing (DuckDB:
    ``CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)``).  The dp_counts
    pattern, shared so every hash-keyed operator can offer an
    oracle-comparable mode next to its xxhash64 fast path (xxhash64 has
    no cross-engine equivalent)."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


# The reference's pandas-representable timestamp range (arc_utils.py:717-718):
# values outside are coerced to null on scan.
TS_CLAMP_LO = "1677-09-22"
TS_CLAMP_HI = "2262-04-11"

INT32_MAX = 2147483647


def copy_oids(df: DataFrame, fld_name: str, order_by: list[str] | None = None) -> DataFrame:
    """C1 ``copy_oids`` (arc_utils.py:376-384): materialize a row id.

    With ``order_by``: dense 1-based ids following the key order, computed
    WITHOUT a single-partition global window: range-partition on the keys
    (partition i holds globally-smaller keys than i+1), sort within each
    partition, derive the per-partition row index from
    ``monotonically_increasing_id``'s documented layout (pid in the upper
    bits, a dense per-partition counter in the lower 33), then add broadcast
    per-partition offsets from one tiny counts job (numPartitions rows to the
    driver).  Identical to ``row_number() OVER (ORDER BY keys)`` whenever the
    keys are unique; ties may be numbered in a different (still arbitrary)
    order.  Without ``order_by``: cheap ``monotonically_increasing_id``
    (unique, not dense, not stable across runs — exactly Spark's contract).
    """
    if order_by:
        part = (
            df.repartitionByRange(*[F.col(c) for c in order_by])
            .sortWithinPartitions(*order_by)
            .withColumn("__mid", F.monotonically_increasing_id())
        )
        pid = F.shiftright(F.col("__mid"), 33)
        local = F.col("__mid").bitwiseAND(F.lit((1 << 33) - 1))
        counts = (
            part.groupBy(pid.alias("__pid")).agg(F.count("*").alias("__n")).collect()
        )
        offsets: dict[int, int] = {}
        acc = 0
        for r in sorted(counts, key=lambda r: r["__pid"]):
            offsets[r["__pid"]] = acc
            acc += r["__n"]
        # literal map pid -> cumulative offset; numPartitions entries, tiny
        off_map = F.create_map(
            *[F.lit(v) for kv in offsets.items() for v in kv]
        )
        out = part.withColumn(
            fld_name,
            (local + off_map[pid] + F.lit(1)).cast(T.LongType()),
        ).drop("__mid")
    else:
        out = df.withColumn(fld_name, F.monotonically_increasing_id())
    return tag_oid(out, fld_name)


def add_ap_ratio(
    df: DataFrame,
    fld_name: str = "ap_ratio",
    *,
    length_col: str = "shape_length",
    area_col: str = "shape_area",
) -> DataFrame:
    """C2 ``add_ap_ratio`` (arc_utils.py:586-606): perimeter / circumference of
    the same-area circle — ``Length / (2 * sqrt(pi * Area))``, the one Arcade
    expression in the reference (arc_utils.py:604)."""
    return df.withColumn(
        fld_name,
        F.col(length_col) / (F.lit(2.0) * F.sqrt(F.lit(math.pi) * F.col(area_col))),
    )


def clamp_timestamps(
    df: DataFrame,
    cols: list[str] | None = None,
    lo: str = TS_CLAMP_LO,
    hi: str = TS_CLAMP_HI,
) -> DataFrame:
    """C4 datetime sanitize (arc_utils.py:710-724): timestamps outside
    [lo, hi] → null.  Spark's µs timestamps are wider than pandas ns, so this
    is a compat option, not a default."""
    if cols is None:
        cols = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (T.TimestampType, T.TimestampNTZType))
        ]
    for c in cols:
        col = F.col(c)
        dt = df.schema[c].dataType  # honor TIMESTAMP vs TIMESTAMP_NTZ
        df = df.withColumn(
            c,
            F.when(
                col.between(F.lit(lo).cast(dt), F.lit(hi).cast(dt)), col
            ).otherwise(F.lit(None).cast(dt)),
        )
    return df


def fill_null_sentinels(df: DataFrame, **kw) -> DataFrame:
    """C5 forward direction: null → sentinel (scan default sentinels)."""
    from smartpy_arc_spark.sources.scan import _fill_sentinels

    return _fill_sentinels(df, **kw)


def restore_null_sentinels(
    df: DataFrame,
    *,
    str_fill: str = "",
    num_fill: float = -1,
    date_fill: str = "1678-01-01",
) -> DataFrame:
    """C5 reverse direction (arc_utils.py:739-745): sentinel → null, including
    the literal string ``'nan'``.  Lossy by design — legitimate sentinel
    values become null; provided for reference parity, not as a default."""
    exprs = []
    for field in df.schema.fields:
        c = F.col(field.name)
        if isinstance(field.dataType, T.StringType):
            exprs.append(
                F.when(c.isin(str_fill, "nan"), F.lit(None)).otherwise(c).alias(field.name)
            )
        elif isinstance(field.dataType, (T.DoubleType, T.FloatType, T.LongType,
                                         T.IntegerType, T.ShortType, T.ByteType)):
            exprs.append(
                F.when(c == F.lit(num_fill).cast(field.dataType), F.lit(None))
                .otherwise(c).alias(field.name)
            )
        elif isinstance(
            field.dataType, (T.TimestampType, T.TimestampNTZType, T.DateType)
        ):
            exprs.append(
                F.when(c == F.lit(date_fill).cast(field.dataType), F.lit(None))
                .otherwise(c).alias(field.name)
            )
        else:
            exprs.append(c.alias(field.name))
    return df.select(exprs)


def compat_cast_for_write(df: DataFrame) -> DataFrame:
    """C6 write-side coercions (arc_utils.py:786-805), applied column-wise:

      * bool → int32 (arc_utils.py:799-800)
      * int64 → int32 iff every value fits ±2147483647, else → float64
        (arc_utils.py:792-798) — the range test is a single distributed
        aggregate over all long columns, not a per-row decision.

    Timestamps are already µs in Spark (the reference's ns→µs step,
    arc_utils.py:801-802, is a no-op here).
    """
    long_cols = [f.name for f in df.schema.fields if isinstance(f.dataType, T.LongType)]
    in_range: dict[str, bool] = {}
    if long_cols:
        aggs = [
            (F.max(F.abs(F.col(c))) <= F.lit(INT32_MAX)).alias(c) for c in long_cols
        ]
        row = df.agg(*aggs).first()
        in_range = {c: bool(row[c]) if row[c] is not None else True for c in long_cols}

    exprs = []
    for field in df.schema.fields:
        c = F.col(field.name)
        if isinstance(field.dataType, T.BooleanType):
            exprs.append(c.cast(T.IntegerType()).alias(field.name))
        elif isinstance(field.dataType, T.LongType):
            target = T.IntegerType() if in_range.get(field.name, True) else T.DoubleType()
            exprs.append(c.cast(target).alias(field.name))
        else:
            exprs.append(c.alias(field.name))
    return df.select(exprs)
