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


def transition_counts(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    min_count: int = 1,
) -> DataFrame:
    """First-order Markov transition counts over each user's event
    sequence: how often type A is immediately followed by type B.

    One window pass per user (lead over the event order — ties broken by
    the event id so the sequence is total and engine-reproducible), one
    hash aggregate on the bounded (from, to) key.  The per-user ordering
    shuffle is the only data-sized exchange.  Output includes the
    per-from-state transition probability (rounded to 4).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    pairs = (
        events.select(
            F.col(user_col),
            F.col(type_col).alias("from_type"),
            F.lead(type_col).over(w).alias("to_type"),
        )
        .where(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").cast("long").alias("n"))
        .where(F.col("n") >= min_count)
    )
    totals = pairs.groupBy("from_type").agg(F.sum("n").alias("_tot"))
    return (
        pairs.join(F.broadcast(totals), "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            (F.round(F.col("n") / F.col("_tot"), 4) + F.lit(0.0)).alias("p"),
        )
    )


def hopping_window_counts(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    value_col: str = "value",
    window: str = "1 hour",
    slide: str = "15 minutes",
    scale: int = 100,
) -> DataFrame:
    """Batch hopping-window (sliding tumble) aggregation via the same
    ``F.window`` generator Structured Streaming uses: each event lands in
    ``window/slide`` overlapping windows (here 4), emitted as per-window
    event counts and exact fixed-point value sums.

    ``F.window`` works identically in batch — the generator explodes each
    row into its covering windows *before* the hash aggregate, so partial
    aggregation still happens map-side and the shuffle carries one row per
    (window, partial) rather than per event-copy.  Window starts are
    epoch-aligned multiples of the slide; the start is exposed as epoch
    seconds (timezone-free for cross-engine comparison).
    """
    win = F.window(F.col(ts_col), window, slide)
    ticks = F.round(F.col(value_col) * scale).cast("long")
    return (
        df.select(win.alias("w"), ticks.alias("ticks"))
        .groupBy((F.unix_micros("w.start") / 1_000_000).cast("long").alias("hop_start_s"))
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum("ticks").cast("long").alias("sum_ticks"),
        )
    )


def growth_accounting(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly growth accounting — the canonical user-base decomposition:
    every active (user, week) is NEW (first week ever), RETAINED (also
    active the immediately previous week) or RESURRECTED (active before,
    but not last week); CHURNED counts users active last week who did
    not return this week.  New + retained + resurrected = weekly actives,
    and actives(w) − retained(w+1) = churned(w+1): the identities every
    growth dashboard is built on.

    Plan: distinct (user, week) once, then per-USER lag/lead windows
    (never global), and bounded per-week count aggregates.  Churn at
    week w+1 is derived from each activity row's ``lead`` gap — no
    per-week anti-joins.

    Returns per week: ``(week, n_new, n_retained, n_resurrected,
    n_churned)`` — churn rows exist for one week past each gap.
    """
    from pyspark.sql import Window

    uw = (
        df.select(
            F.col(user_col).alias("u"),
            F.date_trunc("week", F.col(ts_col)).cast("date").alias("w"),
        )
        .distinct()
    )
    win = Window.partitionBy("u").orderBy("w")
    flagged = (
        uw.withColumn("prev_w", F.lag("w").over(win))
        .withColumn("next_w", F.lead("w").over(win))
        .withColumn(
            "status",
            F.when(F.col("prev_w").isNull(), "new")
            .when(F.date_add(F.col("prev_w"), 7) == F.col("w"), "retained")
            .otherwise("resurrected"),
        )
    )
    active = flagged.groupBy("w").agg(
        F.sum(F.when(F.col("status") == "new", 1).otherwise(0))
        .cast("long")
        .alias("n_new"),
        F.sum(F.when(F.col("status") == "retained", 1).otherwise(0))
        .cast("long")
        .alias("n_retained"),
        F.sum(F.when(F.col("status") == "resurrected", 1).otherwise(0))
        .cast("long")
        .alias("n_resurrected"),
    )
    churn = (
        flagged.where(
            F.col("next_w").isNull()
            | (F.col("next_w") > F.date_add(F.col("w"), 7))
        )
        .select(F.date_add(F.col("w"), 7).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("n_churned"))
    )
    return (
        active.join(churn, "w", "full_outer")
        .select(
            F.col("w").alias("week"),
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
            F.coalesce("n_retained", F.lit(0)).alias("n_retained"),
            F.coalesce("n_resurrected", F.lit(0)).alias("n_resurrected"),
            F.coalesce("n_churned", F.lit(0)).alias("n_churned"),
        )
    )


def peak_concurrency(
    df: DataFrame,
    start_col: str,
    end_col: str,
    *,
    group_col: str,
) -> DataFrame:
    """Sweep-line peak concurrency per group: the maximum number of
    intervals simultaneously open — peak concurrent sessions/users/open
    orders, the capacity-planning statistic interval tables exist for.

    Classic event-delta formulation: every interval emits (start, +1)
    and (end, −1); ordered by (time, delta) — ends sort BEFORE starts at
    the same instant, giving half-open ``[start, end)`` semantics — the
    running delta sum IS the concurrency curve, and its max is the peak.
    All integer arithmetic over one window keyed by ``group_col`` (the
    partition must bound the sweep: group by day/month so one task never
    sorts the global timeline).  Intervals are assigned to the group of
    their START; document that convention at call sites.

    Returns ``(group, n_intervals, peak_concurrency, peak_at)`` —
    ``peak_at`` the earliest instant the peak is reached.
    """
    from pyspark.sql import Window

    base = df.select(
        F.col(group_col).alias("g"),
        F.col(start_col).alias("s"),
        F.col(end_col).alias("e"),
    )
    deltas = base.select("g", F.col("s").alias("t"), F.lit(1).alias("d")).unionAll(
        base.select("g", F.col("e").alias("t"), F.lit(-1).alias("d"))
    )
    w = (
        Window.partitionBy("g")
        .orderBy("t", "d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    curve = deltas.withColumn("c", F.sum("d").over(w))
    # peak + earliest peak instant in ONE pass (r11, guide §2.4): the
    # group-max rides a second window over the SAME partitioning (no
    # extra exchange), so the aggregate reads the curve once instead of
    # the former stats-join-back shape that re-executed the windowed
    # curve three times (min(t | c = max) ≡ the old join-filter-min)
    curve = curve.withColumn(
        "_pk", F.max("c").over(Window.partitionBy("g"))
    )
    return (
        curve.groupBy("g")
        .agg(
            (F.count("*") / 2).cast("long").alias("n_intervals"),
            F.max("c").cast("long").alias("peak_concurrency"),
            F.min(
                F.when(F.col("c") == F.col("_pk"), F.col("t"))
            ).alias("peak_at"),
        )
        .select(
            F.col("g").alias(group_col),
            "n_intervals",
            "peak_concurrency",
            "peak_at",
        )
    )


def path_ngrams(
    df: DataFrame,
    user_col: str,
    order_cols: list[str],
    event_col: str,
    *,
    n: int = 3,
    top_k: int = 20,
) -> DataFrame:
    """Top user journeys: the most frequent ordered ``n``-step event paths
    (``A > B > C``) across users — the navigation-mining readout one rung
    above pairwise :func:`transition_counts`.

    One user-keyed window pass builds each step's ``n−1`` lookaheads
    (lead), then a path-keyed count with deterministic top-k (count desc,
    path asc).  ``order_cols`` must totally order a user's events
    (timestamp + id tiebreak) so the path extraction is reproducible.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(*order_cols)
    steps = [F.col(event_col)] + [
        F.lead(event_col, i).over(w) for i in range(1, n)
    ]
    paths = df.select(
        F.when(
            steps[-1].isNotNull(), F.concat_ws(" > ", *steps)
        ).alias("path")
    ).where(F.col("path").isNotNull())
    return (
        paths.groupBy("path")
        .agg(F.count("*").cast("long").alias("n_paths"))
        .orderBy(F.desc("n_paths"), F.asc("path"))
        .limit(top_k)
    )


def session_stats(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Session-level web-analytics rollup on top of :func:`sessionize`:
    per (user, session) duration/event-count, aggregated to the corpus
    numbers every engagement dashboard opens with — sessions, events per
    session, session-duration totals, and BOUNCE RATE (single-event
    sessions / sessions).

    Plan: sessionize's one user-keyed shuffle, one (user, session)
    aggregate on the same partitioning (exchange reused), one bounded
    final combine.  Durations sum as exact microsecond integers.

    Returns 1 row: ``(n_sessions, n_events, n_bounces,
    bounce_rate_e6, avg_events_per_session_e4, avg_duration_s_e2)``.
    """
    sess = sessionize(
        df, user_col=user_col, ts_col=ts_col, gap_minutes=gap_minutes,
        tiebreak_col=tiebreak_col,
    )
    per_sess = sess.groupBy(user_col, "session_id").agg(
        F.count("*").cast("long").alias("n_ev"),
        (
            F.unix_micros(F.max(ts_col)) - F.unix_micros(F.min(ts_col))
        ).alias("dur_us"),
    )
    ns = F.count("*").cast("double")
    return per_sess.agg(
        F.count("*").cast("long").alias("n_sessions"),
        F.sum("n_ev").cast("long").alias("n_events"),
        F.sum(F.when(F.col("n_ev") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_bounces"),
        F.round(
            F.sum(F.when(F.col("n_ev") == 1, 1).otherwise(0)).cast("double")
            / ns * 1e6
        ).cast("long").alias("bounce_rate_e6"),
        F.round(F.sum("n_ev").cast("double") / ns * 1e4)
        .cast("long")
        .alias("avg_events_per_session_e4"),
        F.round(
            F.sum("dur_us").cast("double") / ns / 1e6 * 100
        ).cast("long").alias("avg_duration_s_e2"),
    )


def merge_intervals(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Coalesce overlapping/touching intervals per key into maximal
    covered spans — the gaps-and-islands primitive behind SCD repair,
    availability/coverage reporting and interval dedup.  An interval
    starts a new island exactly when its start exceeds the running max
    end of every earlier interval (order by start, then end; ties
    commute, so the result is deterministic for any stable sort).

    One shuffle on the key; both window passes and the final rollup
    reuse that single key-partitioned exchange — islands never cross
    keys, so nothing about this grows with total data size beyond the
    per-key sort.

    Returns ``(key, span_start, span_end, n_intervals)`` — one row per
    maximal merged span.
    """
    w = W.partitionBy(key_col).orderBy(start_col, end_col)
    prev_max_end = F.max(end_col).over(
        w.rowsBetween(W.unboundedPreceding, -1)
    )
    new_island = F.when(
        prev_max_end.isNull() | (F.col(start_col) > prev_max_end), 1
    ).otherwise(0)
    island = F.sum(new_island).over(
        w.rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        df.select(key_col, start_col, end_col, island.alias("_island"))
        .groupBy(key_col, "_island")
        .agg(
            F.min(start_col).alias("span_start"),
            F.max(end_col).alias("span_end"),
            F.count("*").cast("long").alias("n_intervals"),
        )
        .drop("_island")
    )


def calendar_gaps(
    df: DataFrame, key_col: str, date_col: str, *, min_gap_days: int = 2
) -> DataFrame:
    """Missing-date islands per key — the inverse of
    :func:`merge_intervals`: report every hole of at least
    ``min_gap_days`` consecutive absent days between a key's first and
    last activity (data-delivery / outage detection).

    One distinct pass + one per-key lead window: a gap exists where the
    next active day is more than one day ahead.  Exact integer day
    arithmetic.

    Returns ``(key, gap_start, gap_end, gap_days)`` — the inclusive
    missing range.
    """
    days = df.select(
        F.col(key_col).alias("k"), F.col(date_col).cast("date").alias("d")
    ).distinct()
    w = W.partitionBy("k").orderBy("d")
    stepped = days.select(
        "k", "d", F.lead("d").over(w).alias("nxt")
    ).where(F.col("nxt").isNotNull())
    gap = F.datediff(F.col("nxt"), F.col("d")) - 1
    return (
        stepped.where(gap >= min_gap_days)
        .select(
            F.col("k").alias(key_col),
            F.date_add(F.col("d"), 1).alias("gap_start"),
            F.date_sub(F.col("nxt"), 1).alias("gap_end"),
            gap.cast("long").alias("gap_days"),
        )
    )


def state_durations(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    *,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Time-in-state accounting: how long does each key spend in each
    state, attributing the interval [event, next event) to the event's
    state (the last event of a key carries no duration — no fabricated
    horizon).

    One per-key lead pass, exact integer second durations (integer
    ``div`` — cast-rounding differs across engines), one (key, state)
    aggregate.

    Returns ``(key, state, n_intervals, total_sec, share_e6)`` with the
    share of the key's total accounted time.
    """
    order = [F.col(ts_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    w = W.partitionBy(key_col).orderBy(*order)
    stepped = df.select(
        F.col(key_col).alias("k"),
        F.col(state_col).alias("s"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("us"),
        F.unix_micros(F.lead(ts_col).over(w).cast("timestamp")).alias(
            "nxt_us"
        ),
    ).where(F.col("nxt_us").isNotNull())
    secs = stepped.select(
        "k", "s", F.expr("(nxt_us - us) div 1000000").alias("sec")
    )
    per = secs.groupBy("k", "s").agg(
        F.count("*").cast("long").alias("n_intervals"),
        F.sum("sec").cast("long").alias("total_sec"),
    )
    tot = W.partitionBy("k")
    return per.select(
        F.col("k").alias(key_col),
        F.col("s").alias(state_col),
        "n_intervals",
        "total_sec",
        F.round(
            F.col("total_sec").cast("double")
            / F.sum("total_sec").over(tot).cast("double")
            * 1e6
        )
        .cast("long")
        .alias("share_e6"),
    )
