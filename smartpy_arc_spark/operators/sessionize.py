"""Gap-based sessionization (batch form).

No reference counterpart (the reference has no windowing at all, SURVEY.md
§2.8); this is the standard lag + cumulative-sum-of-new-session-flags
construction.  Scale: one shuffle on the user key, then two window passes
over the same partitioning — Spark reuses the exchange, so a 100 TB event
log costs a single hash-partition by user plus per-partition sorts.

The streaming variant lives in :mod:`smartpy_arc_spark.streaming.stream`
(``session_window`` + watermark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def sessionize(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    tiebreak_col: str | None = None,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign a per-user ``session_id`` (1-based) where a new session starts
    after a gap of more than ``gap_minutes`` since the previous event.

    ``tiebreak_col`` makes ordering deterministic for equal timestamps.
    Comparison is done in microseconds (``unix_micros``) so sub-second
    timestamps don't truncate.
    """
    order = [F.col(ts_col).asc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    w = W.partitionBy(user_col).orderBy(*order)
    gap_us = int(gap_minutes * 60 * 1_000_000)

    prev_ts = F.lag(ts_col).over(w)
    new_sess = F.when(
        prev_ts.isNull()
        | ((F.unix_micros(F.col(ts_col)) - F.unix_micros(prev_ts)) > gap_us),
        F.lit(1),
    ).otherwise(F.lit(0))

    w_cum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        df.withColumn("_new_sess", new_sess)
        .withColumn(session_col, F.sum("_new_sess").over(w_cum))
        .drop("_new_sess")
    )
