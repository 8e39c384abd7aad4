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
from pyspark.sql import Window as W


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


def touch_attribution(
    df: DataFrame,
    user_col: str,
    order_cols: list,
    channel_col: str,
    conversion_value,
) -> DataFrame:
    """Multi-touch attribution counts per channel: every conversion event
    claims the touch events since the user's PREVIOUS conversion, and
    each channel is credited with how often it was the first touch, the
    last touch, any touch, and how many distinct conversions it
    participated in.  (First-touch and last-touch attribution are these
    counts; linear credit is ``n_touch`` over the per-conversion touch
    totals, left to the consumer so the output stays pure-integer.)

    Scale shape: both the conversion-window assignment and the
    first/last flags are per-user windows (partitionBy user) — no global
    ordering exists anywhere; the final rollup is one bounded-key
    aggregate on channel.

    Returns ``(channel, n_first, n_last, n_touch, n_conversions)``
    sorted-stable only by its grouping key.
    """
    from pyspark.sql import Window

    is_conv = F.col("__ch") == F.lit(conversion_value)
    base = df.select(
        F.col(user_col).alias("__u"),
        *[F.col(c) for c in order_cols],
        F.col(channel_col).alias("__ch"),
    )
    w = Window.partitionBy("__u").orderBy(*order_cols)
    # conversions at-or-before the row; touches in window c join conversion c+1
    seq = base.withColumn(
        "__convs_before_or_at",
        F.sum(F.when(is_conv, 1).otherwise(0)).over(w),
    )
    n_convs = seq.groupBy("__u").agg(
        F.max("__convs_before_or_at").cast("long").alias("__n_conv")
    )
    touches = (
        seq.where(~is_conv)
        .withColumn("__conv_idx", F.col("__convs_before_or_at") + 1)
        .join(n_convs, "__u")
        .where(F.col("__conv_idx") <= F.col("__n_conv"))
    )
    cw = Window.partitionBy("__u", "__conv_idx").orderBy(*order_cols)
    cw_all = cw.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    flagged = touches.select(
        "__ch",
        "__u",
        "__conv_idx",
        (F.row_number().over(cw) == 1).alias("__is_first"),
        (F.row_number().over(cw) == F.count("*").over(cw_all)).alias(
            "__is_last"
        ),
    )
    return (
        flagged.groupBy(F.col("__ch").alias("channel"))
        .agg(
            F.sum(F.when(F.col("__is_first"), 1).otherwise(0))
            .cast("long")
            .alias("n_first"),
            F.sum(F.when(F.col("__is_last"), 1).otherwise(0))
            .cast("long")
            .alias("n_last"),
            F.count("*").cast("long").alias("n_touch"),
            F.count_distinct("__u", "__conv_idx")
            .cast("long")
            .alias("n_conversions"),
        )
    )


def time_to_convert(
    df: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    from_event: str,
    to_event: str,
) -> DataFrame:
    """Conversion-latency distribution: per user, seconds from the FIRST
    ``from_event`` to the first ``to_event`` at or after it; summarized
    as exact order statistics (min / lower-median p25·p50·p75 / max) —
    the "how long does signup→purchase take" readout next to
    ``sequence_funnel``'s how-many.

    Selection beats interpolation for portability: each quantile is the
    ``ceil(q·n)``-th smallest latency picked by row_number, an element
    of the data — no averaging, no float percentile semantics to match
    across engines.  Two grouped min-aggregates (one shuffle on user),
    then a rank window over the bounded converted set.

    Returns one row: ``(n_converted, min_s, p25_s, p50_s, p75_s,
    max_s)``.
    """
    from pyspark.sql import Window as W

    ts = F.col(ts_col).cast("timestamp")
    per_user = (
        df.where(F.col(type_col).isin([from_event, to_event]))
        .groupBy(user_col)
        .agg(
            F.min(F.when(F.col(type_col) == from_event, ts)).alias("t0"),
        )
        .where(F.col("t0").isNotNull())
    )
    to_after = (
        df.where(F.col(type_col) == to_event)
        .select(F.col(user_col).alias("u2"), ts.alias("t1"))
        .join(
            per_user.select(F.col(user_col).alias("u2"), "t0"), "u2"
        )
        .where(F.col("t1") >= F.col("t0"))
        .groupBy("u2")
        .agg(
            (
                F.min("t1").cast("long") - F.max("t0").cast("long")
            ).alias("lat_s")
        )
    )
    w = W.orderBy("lat_s")
    ranked = to_after.select(
        "lat_s",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(
            W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
        ).alias("n"),
    )
    pick = lambda q: F.max(  # noqa: E731
        F.when(F.col("rn") == F.ceil(F.col("n") * F.lit(q)).cast("int"),
               F.col("lat_s"))
    )
    return ranked.agg(
        F.max("n").cast("long").alias("n_converted"),
        F.min("lat_s").alias("min_s"),
        pick(0.25).alias("p25_s"),
        pick(0.50).alias("p50_s"),
        pick(0.75).alias("p75_s"),
        F.max("lat_s").alias("max_s"),
    )


def sequential_pairs(
    df: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    *,
    max_gap_s: int = 3600,
    min_support: int = 1,
) -> DataFrame:
    """Frequent sequential 2-patterns a→b with a gap constraint: the
    number of distinct users who performed ``b`` within ``max_gap_s``
    seconds AFTER ``a`` (PrefixSpan's bread-and-butter length-2 output,
    which in practice drives "next action" product analytics).  Unlike
    ``path_ngrams`` the events need not be consecutive — anything may
    happen in between.

    Gap semantics are floored-epoch-second differences (0 < gap ≤ max),
    making the predicate pure integer.  One user-keyed equi-join shuffle
    carries the pairing; per-user event counts bound the fan-out, and
    the rollup is a bounded (a, b) aggregate.  Confidence divides by the
    pattern-head's user count — ONE integer-operand division.

    Returns ``(type_a, type_b, n_users, confidence_e6)`` for pairs with
    ``n_users ≥ min_support``, ordered by (type_a, type_b).
    """
    sec = F.col(ts_col).cast("timestamp").cast("long")
    e = df.select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("t"),
        sec.alias("s"),
    )
    a, b = e.alias("a"), e.alias("b")
    gap = F.col("b.s") - F.col("a.s")
    pairs = (
        a.join(b, F.col("a.u") == F.col("b.u"))
        .where((gap > 0) & (gap <= max_gap_s))
        .groupBy(
            F.col("a.t").alias("type_a"), F.col("b.t").alias("type_b")
        )
        .agg(F.count_distinct(F.col("a.u")).cast("long").alias("n_users"))
    )
    heads = e.groupBy(F.col("t").alias("type_a")).agg(
        F.count_distinct("u").cast("long").alias("n_head")
    )
    return (
        pairs.join(F.broadcast(heads), "type_a")
        .where(F.col("n_users") >= min_support)
        .select(
            "type_a",
            "type_b",
            "n_users",
            F.round(
                F.col("n_users").cast("double")
                / F.col("n_head").cast("double")
                * 1000000
            )
            .cast("long")
            .alias("confidence_e6"),
        )
        .orderBy("type_a", "type_b")
    )


def markov_attribution(
    df: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    conversion_value: str,
    *,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Markov-chain (removal-effect) attribution — the data-driven
    alternative to first/last-touch rules: model journeys as a first-
    order chain over channels with absorbing CONV/NULL states; a
    channel's credit is how much total conversion probability disappears
    when every visit to it is cut short (its outgoing edges redirected
    to NULL).

    Distributed part: per-user ordered journeys and the (from, to)
    transition counts — one user-keyed window pass plus a bounded-key
    aggregate.  The chain itself is a |channels|² matrix (channel
    vocabularies are bounded by contract), solved on the driver.

    Oracle-portable solve (r7): instead of a float ``(I−Q)⁻¹`` inverse,
    the absorption series ``Σ Qᵏ r`` is evaluated in ALL-INTEGER e12
    fixed-point — transition probabilities quantize to ticks with an
    integer half-away division, and ``J = 13`` matrix squarings
    (``S' = S + P·S``, ``P' = P²``, floor-div rescale after each
    product) cover 2¹³ = 8192 series terms, geometrically past any
    chain's mixing scale.  No float touches the solve, so every value
    (effects, shares — also integer half-away divisions) is
    bit-reproducible in any engine; ``_markov_attribution_sql`` replays
    the identical integer algebra.

    Returns ``(channel, n_touches, removal_effect_e6, credit_share_e6)``
    ordered by channel; shares normalize the removal effects over
    channels (largest-remainder-free: one division each).
    """
    from pyspark.sql import Window

    order = [F.col(ts_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    w = Window.partitionBy("u").orderBy(*order)
    steps = (
        df.select(
            F.col(user_col).alias("u"),
            F.col(type_col).alias("ch"),
            *([F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])),
        )
        .withColumn("nxt", F.lead("ch").over(w))
        .withColumn("rn", F.row_number().over(w))
    )
    start_edges = steps.where(F.col("rn") == 1).select(
        F.lit("__start__").alias("src"), F.col("ch").alias("dst")
    )
    fwd_edges = steps.select(
        F.col("ch").alias("src"),
        F.coalesce(F.col("nxt"), F.lit("__null__")).alias("dst"),
    )
    edges = start_edges.unionByName(fwd_edges)
    counts = edges.groupBy("src", "dst").agg(
        F.count("*").cast("long").alias("n")
    )
    rows = counts.collect()  # bounded: (channels + 2)^2 cells
    chans = sorted(
        {r.src for r in rows if r.src != "__start__"}
        | {r.dst for r in rows if r.dst not in ("__null__",)}
    )
    chans = [c for c in chans if c != conversion_value]
    states = ["__start__"] + chans
    absorb_p = {}

    SCALE = 10**12
    J = 13  # 2^13 = 8192 series terms

    def half_away(num: int, den: int) -> int:
        """round(num/den) half-away-from-zero, pure integers (num ≥ 0)."""
        return (2 * num + den) // (2 * den)

    def matmul(a: list, b: list, m: int) -> list:
        """(a·b) in e12 ticks with floor-div rescale — exact integers."""
        return [
            [
                sum(a[i][k] * b[k][j] for k in range(m)) // SCALE
                for j in range(m)
            ]
            for i in range(m)
        ]

    def p_conv(removed: str | None) -> int:
        """Absorption probability at __start__, in e12 ticks (int)."""
        idx = {s: i for i, s in enumerate(states)}
        m = len(states)
        t = [[0] * m for _ in range(m)]
        r_conv = [0] * m
        for r in rows:
            if r.src in ("__null__",) or r.src == conversion_value:
                continue
            if r.src not in idx:
                continue
            if removed is not None and r.src == removed:
                continue  # all outgoing mass of the removed state → NULL
            if r.dst == conversion_value:
                r_conv[idx[r.src]] += r.n
            elif r.dst in idx and not (
                removed is not None and r.dst == removed
            ):
                t[idx[r.src]][idx[r.dst]] += r.n
            # else: edge into __null__ / removed state: absorbed at NULL
        totals = [
            sum(rr.n for rr in rows if rr.src == s) or 1 for s in states
        ]
        q = [
            [half_away(t[i][j] * SCALE, totals[i]) for j in range(m)]
            for i in range(m)
        ]
        rv = [half_away(r_conv[i] * SCALE, totals[i]) for i in range(m)]
        # S ≈ Σ_{k<2^J} Q^k, P ≈ Q^{2^j} via squaring, all in ticks
        s_mat = [
            [(SCALE if i == j else 0) + q[i][j] for j in range(m)]
            for i in range(m)
        ]
        p_mat = q
        for _ in range(J):
            s_mat = [
                [s_mat[i][j] + v for j, v in enumerate(row)]
                for i, row in enumerate(matmul(p_mat, s_mat, m))
            ]
            p_mat = matmul(p_mat, p_mat, m)
        return sum(s_mat[0][k] * rv[k] for k in range(m)) // SCALE

    base = p_conv(None)
    touches = {
        r.src: sum(rr.n for rr in rows if rr.src == r.src) for r in rows
    }
    eff_e6 = {}
    for c in chans:
        if base <= 0:
            eff_e6[c] = 0
        else:
            # removal can only lower conversion; clamp quantization dust
            eff_e6[c] = half_away(max(0, base - p_conv(c)) * 10**6, base)
    total_e6 = sum(eff_e6.values()) or 1
    spark = df.sparkSession
    out = [
        (
            c,
            int(touches.get(c, 0)),
            eff_e6[c],
            half_away(eff_e6[c] * 10**6, total_e6),
        )
        for c in chans
    ]
    return spark.createDataFrame(
        out,
        "channel string, n_touches long, removal_effect_e6 long, "
        "credit_share_e6 long",
    ).orderBy("channel")


def cohort_ltv(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    amount_col: str,
) -> DataFrame:
    """Cohort LTV triangle — the revenue companion to retention: users
    cohort by their FIRST-activity month, and each cohort's cumulative
    revenue per month-age answers "what is a month-M customer worth by
    month N".  Integer cents throughout; the cumulative sum runs inside
    the cohort partition (bounded rows: cohorts × ages).

    Returns ``(cohort_month, age_months, n_active, revenue_c,
    cum_revenue_c)`` ordered by (cohort_month, age_months).
    """
    month = F.trunc(F.to_date(F.col(ts_col)), "MM")
    base = df.select(
        F.col(user_col).alias("u"),
        month.alias("m"),
        F.col(amount_col).cast("long").alias("amt"),
    )
    firsts = base.groupBy("u").agg(F.min("m").alias("cohort_month"))
    j = base.join(firsts, "u").select(
        "cohort_month",
        (
            (F.year("m") - F.year("cohort_month")) * 12
            + (F.month("m") - F.month("cohort_month"))
        )
        .cast("long")
        .alias("age_months"),
        "u",
        "amt",
    )
    cell = j.groupBy("cohort_month", "age_months").agg(
        F.count_distinct("u").cast("long").alias("n_active"),
        F.sum("amt").cast("long").alias("revenue_c"),
    )
    w = W.partitionBy("cohort_month").orderBy("age_months")
    return cell.select(
        "cohort_month",
        "age_months",
        "n_active",
        "revenue_c",
        F.sum("revenue_c")
        .over(w.rowsBetween(W.unboundedPreceding, 0))
        .cast("long")
        .alias("cum_revenue_c"),
    ).orderBy("cohort_month", "age_months")


def shapley_coverage(
    df: DataFrame,
    unit_col: str,
    channel_col: str,
    channels: list,
) -> DataFrame:
    """EXACT Shapley attribution of audience coverage across three
    channels: the characteristic function is "units reached by at least
    one channel in the coalition", and with |N| = 3 the Shapley sum has
    denominator 3! = 6, so every value is an exact integer sixth —
    no sampling, no floats (the fair-division upgrade over last-touch /
    Markov removal attribution for REACH).

    One pass builds each unit's channel bitmask, one hash aggregate
    counts the 7 non-empty masks, one literal combination per channel
    produces 6·φ.  Σφ = v(N) exactly (efficiency axiom — tested).

    Returns per channel ``(channel, solo_coverage, phi6, phi_e2,
    share_e6)`` — ``phi6`` the exact integer 6·φ in units, ``phi_e2``
    φ in hundredths of a unit.
    """
    if len(channels) != 3:
        raise ValueError("exact 3-channel Shapley (n!=6) only")
    tags = [
        F.max((F.col("ch") == F.lit(c)).cast("int")).alias(f"b{i}")
        for i, c in enumerate(channels)
    ]
    masks = (
        df.select(
            F.col(unit_col).alias("u"), F.col(channel_col).alias("ch")
        )
        .where(F.col("ch").isin(list(channels)))
        .groupBy("u")
        .agg(*tags)
        .select(
            (
                F.col("b0") + 2 * F.col("b1") + 4 * F.col("b2")
            ).alias("mask")
        )
    )
    cnt = masks.groupBy("mask").agg(F.count("*").cast("long").alias("n"))
    # v(S) for each coalition bitmask S: units whose mask intersects S
    v_cols = [
        F.sum(
            F.when(F.expr(f"mask & {S}") > 0, F.col("n")).otherwise(0)
        )
        .cast("long")
        .alias(f"v{S}")
        for S in range(1, 8)
    ]
    vrow = cnt.agg(*v_cols)
    stack_args = []
    for i, name in enumerate(channels):
        me = 1 << i
        others = [b for b in (0, 1, 2) if b != i]
        o1, o2 = 1 << others[0], 1 << others[1]
        # weights |S|!(2-|S|)!: {} -> 2, {j} -> 1, {j,k} -> 2
        phi6 = (
            2 * F.col(f"v{me}")
            + (F.col(f"v{me | o1}") - F.col(f"v{o1}"))
            + (F.col(f"v{me | o2}") - F.col(f"v{o2}"))
            + 2 * (F.col("v7") - F.col(f"v{o1 | o2}"))
        )
        stack_args += [F.lit(name), F.col(f"v{me}"), phi6]
    out = vrow.select(
        F.col("v7").alias("v_all"),
        F.stack(F.lit(3), *stack_args).alias(
            "channel", "solo_coverage", "phi6"
        ),
    )
    return out.select(
        "channel",
        "solo_coverage",
        F.col("phi6").cast("long").alias("phi6"),
        F.round(F.col("phi6").cast("double") / 6 * 100)
        .cast("long")
        .alias("phi_e2"),
        F.round(
            F.col("phi6").cast("double")
            / (6 * F.col("v_all")).cast("double")
            * 1e6
        )
        .cast("long")
        .alias("share_e6"),
    )


def markov_entropy(
    df: DataFrame, key_col: str, ts_col: str, state_col: str, *,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Entropy rate of the first-order Markov chain over observed state
    transitions — the one-number predictability of user journeys:

        H = Σ_i π(i) · Σ_j −p(j|i)·ln p(j|i)

    with π the empirical source-state distribution and p(j|i) the
    transition probabilities.  0 = deterministic paths, ln(k) =
    uniform chaos over k states.

    One per-key lead pass builds transitions, one hash aggregate counts
    them; every cell's contribution ``−(n_ij/N)·ln(n_ij/n_i)``
    pre-rounds to integer nanonats (the ``mutual_information``
    contract) so the total is an order-free integer sum.

    Returns one row ``(n_transitions, n_states, h_e9, h_max_e9,
    predictability_e6 = 1 − H/H_max)``.
    """
    order = [F.col(ts_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    w = W.partitionBy(key_col).orderBy(*order)
    steps = df.select(
        F.col(state_col).alias("a"),
        F.lead(state_col).over(w).alias("b"),
    ).where(F.col("b").isNotNull())
    cells = steps.groupBy("a", "b").agg(F.count("*").alias("n_ab"))
    src = cells.groupBy("a").agg(F.sum("n_ab").alias("n_a"))
    tot = cells.agg(
        F.sum("n_ab").cast("long").alias("n"),
        F.count_distinct("a").cast("long").alias("k"),
    )
    term = F.round(
        -(
            F.col("n_ab").cast("double") / F.col("n").cast("double")
        )
        * F.log(
            F.col("n_ab").cast("double") / F.col("n_a").cast("double")
        )
        * 1e9
    ).cast("long")
    scored = (
        cells.join(F.broadcast(src), "a")
        .crossJoin(F.broadcast(tot))
        .select("n", "k", term.alias("t"))
    )
    agg = scored.groupBy("n", "k").agg(
        F.sum("t").cast("long").alias("h_e9")
    )
    h_max = F.log(F.col("k").cast("double"))
    return agg.select(
        F.col("n").alias("n_transitions"),
        F.col("k").alias("n_states"),
        "h_e9",
        F.round(h_max * 1e9).cast("long").alias("h_max_e9"),
        F.when(
            F.col("k") > 1,
            F.round(
                (
                    F.lit(1.0)
                    - (F.col("h_e9").cast("double") / 1e9) / h_max
                )
                * 1e6
            ).cast("long"),
        ).alias("predictability_e6"),
    )
