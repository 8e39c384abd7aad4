"""Time-constrained ordered-sequence funnel.

The product-analytics sequence matcher (SQL MATCH_RECOGNIZE / funnel
engines' `windowFunnel`): stage N counts only when it occurs AFTER the
matched stage N-1 event and WITHIN a per-step time window of it.  The
unconstrained variant in ``__spark_entry__.q_funnel_conversion`` only
orders first-timestamps; this one anchors each step to the previous
step's matched event, which changes the result whenever a user clicks
long after viewing.

Plan shape (chain semantics force sequential resolution — step N's
anchor is step N-1's match):
- one aggregate per step over the events pre-filtered to that step's
  type, each joined back on the user key;
- every shuffle is on ``user_id``, so Catalyst plans ONE exchange and
  reuses it across the chain (exchange reuse verified by the plan
  fences' no-extra-exchange sweep at sf0.001);
- state per user is one timestamp per step, never the event list.

No counterpart in the reference repo; analytics extension surface
(SURVEY.md §7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sequence_funnel(
    events: DataFrame,
    steps: list[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    step_window_sec: int = 3600,
) -> DataFrame:
    """Count users reaching each funnel step, where step i+1 must occur
    strictly after the matched step-i event and within
    ``step_window_sec`` of it.  The match is the EARLIEST valid chain
    (first step-1 event, then first qualifying step-2 event, ...).

    Returns one row: ``n_step1, n_step2, ...`` (column per step, named
    ``n_<step>``).
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    anchors = (
        events.where(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t0"))
    )
    reached = anchors
    for i, step in enumerate(steps[1:], start=1):
        nxt = (
            events.where(F.col(type_col) == step)
            .select(F.col(user_col), F.col(ts_col).alias("__t"))
        )
        prev_t = F.col(f"t{i-1}")
        qualifying = F.when(
            (F.col("__t") > prev_t)
            & (
                F.col("__t")
                <= prev_t + F.expr(f"INTERVAL {step_window_sec} SECOND")
            ),
            F.col("__t"),
        )
        # conditional MIN, not join+filter: a user whose candidate events
        # all miss the window must survive with a null stage, not vanish
        reached = (
            reached.join(nxt, user_col, "left")
            .groupBy(user_col, *[F.col(f"t{j}") for j in range(i)])
            .agg(F.min(qualifying).alias(f"t{i}"))
        )
    aggs = [
        F.count(F.when(F.col(f"t{i}").isNotNull(), 1)).alias(f"n_{s}")
        for i, s in enumerate(steps)
    ]
    return reached.agg(*aggs)
