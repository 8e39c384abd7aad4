"""Survival analysis: Kaplan-Meier, Nelson-Aalen, RMST, one-step Cox,
log-rank, cumulative incidence — event-table aggregates over windows.

Split out of ``stats.py`` in round 9 (VERDICT r8 item 8): the module had
grown to ~6,000 lines.  Public API is unchanged — ``stats.py`` re-exports
everything, so ``from smartpy_arc_spark.operators.stats import X`` keeps
working for every operator.  Design notes live on each function.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W



def kaplan_meier(
    df: DataFrame, duration_col: str, event_col: str
) -> DataFrame:
    """Kaplan–Meier product-limit survival curve: at each distinct
    event/censoring time ``t``, with ``n`` subjects still at risk and
    ``d`` events, ``S(t) = Π_{t'≤t} (1 − d/n)``; censored subjects leave
    the risk set without dropping the curve.

    Distributed shape: the (duration → events, censored) table is one
    hash aggregate over the subjects; the curve itself is then a
    BOUNDED-cardinality object (distinct observed times — document the
    contract, resolution is the time unit), assembled as one sorted
    array whose prefix products run as explicit in-order folds — the
    same fixed-order-fold portability contract as ``ewma``/``holt``
    (a windowed running product would leave the accumulation order to
    the engine).

    Returns per distinct time: ``(t, n_at_risk, n_events, n_censored,
    s_e6)`` — survival scaled to integer millionths.
    """
    ev = F.col(event_col).cast("int")
    per_t = (
        df.select(F.col(duration_col).alias("t"), ev.alias("e"))
        .where(F.col("t").isNotNull())
        .groupBy("t")
        .agg(
            F.sum("e").cast("long").alias("d"),
            F.sum(1 - F.col("e")).cast("long").alias("c"),
        )
    )
    curve = per_t.agg(
        F.sort_array(F.collect_list(F.struct("t", "d", "c"))).alias("arr"),
        F.sum(F.col("d") + F.col("c")).cast("long").alias("n_total"),
    )
    arr = F.col("arr")

    def at(i):
        return F.element_at(arr, i)

    def prefix(i, init, step):
        return F.aggregate(F.slice(arr, 1, i), init, step)

    rows = F.transform(
        F.sequence(F.lit(1), F.size(arr)),
        lambda i: F.struct(
            at(i)["t"].alias("t"),
            (
                F.col("n_total")
                - prefix(
                    i - 1,
                    F.lit(0).cast("long"),
                    lambda acc, s: acc + s["d"] + s["c"],
                )
            ).alias("n_at_risk"),
            at(i)["d"].alias("n_events"),
            at(i)["c"].alias("n_censored"),
            # struct-accumulator fold: the at-risk count at each step is
            # n_total minus the subjects consumed by EARLIER times
            F.round(
                prefix(
                    i,
                    F.struct(
                        F.lit(1.0).alias("p"),
                        F.lit(0).cast("long").alias("used"),
                    ),
                    lambda acc, s: F.struct(
                        (
                            acc["p"]
                            * (
                                F.lit(1.0)
                                - s["d"]
                                / (F.col("n_total") - acc["used"]).cast(
                                    "double"
                                )
                            )
                        ).alias("p"),
                        (acc["used"] + s["d"] + s["c"]).alias("used"),
                    ),
                )["p"]
                * 1000000
            ).cast("long").alias("s_e6"),
        ),
    )
    return curve.select(F.explode(rows).alias("r")).select("r.*")


def log_rank_test(
    df: DataFrame,
    group_col: str,
    duration_col: str,
    event_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Log-rank test between two survival cohorts — Kaplan–Meier's
    companion significance test: are the two survival curves the same?

        O_a = Σ d_a(t);  E_a = Σ d(t)·n_a(t)/n(t);
        V   = Σ d(t)·(n_a/n)(1−n_a/n)·(n−d)/(n−1);
        z   = (O_a − E_a)/√V

    Distributed shape: collapse to the per-distinct-time (d, c) table
    per cohort (one hash aggregate), derive at-risk counts WITHOUT a
    global sort via ``partitioned_cumsum`` exclusive prefixes
    (``n_g(t) = N_g − cum_before``), then pre-round each E and V term
    to integer nanounits so the sums are order-free — the same
    engine-portability pattern as ``mutual_information``.  O_a is pure
    integer.  Returns one row ``(n_a, n_b, observed_a, expected_a_e9,
    z_e6)``.
    """
    from smartpy_arc_spark.operators.scale import partitioned_cumsum

    ev = F.col(event_col).cast("int")
    per_t = (
        df.where(F.col(group_col).isin(group_a, group_b))
        .select(
            F.col(duration_col).alias("t"),
            ev.alias("e"),
            (F.col(group_col) == group_a).alias("is_a"),
        )
        .where(F.col("t").isNotNull())
        .groupBy("t")
        .agg(
            F.sum(F.when(F.col("is_a"), F.col("e")).otherwise(0))
            .cast("long")
            .alias("da"),
            F.sum(F.when(~F.col("is_a"), F.col("e")).otherwise(0))
            .cast("long")
            .alias("db"),
            F.count(F.when(F.col("is_a"), 1)).cast("long").alias("ra"),
            F.count(F.when(~F.col("is_a"), 1)).cast("long").alias("rb"),
        )
    )
    # cohort sizes from the cumsum's own per-partition-totals collect
    # (r11, guide §2.1/§5.3) — no second aggregate pass + broadcast
    gt: dict = {}
    cum = partitioned_cumsum(
        per_t, ["t"], ["ra", "rb"], inclusive=False, grand_totals=gt
    )
    j = cum.withColumns(
        {
            "n_a": F.lit(int(gt["ra"])).cast("long"),
            "n_b": F.lit(int(gt["rb"])).cast("long"),
        }
    )
    na_t = (F.col("n_a") - F.col("cum_ra").cast("long")).cast("double")
    nb_t = (F.col("n_b") - F.col("cum_rb").cast("long")).cast("double")
    n_t = na_t + nb_t
    d_t = (F.col("da") + F.col("db")).cast("double")
    e_term = d_t * na_t / n_t
    v_term = F.when(
        n_t > 1,
        d_t * (na_t / n_t) * (F.lit(1.0) - na_t / n_t)
        * (n_t - d_t) / (n_t - 1),
    ).otherwise(F.lit(0.0))
    agg = j.agg(
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
        F.sum("da").cast("long").alias("observed_a"),
        F.sum(F.round(e_term * 1e9).cast("long")).cast("long").alias("e_e9"),
        F.sum(F.round(v_term * 1e9).cast("long")).cast("long").alias("v_e9"),
    )
    z = F.when(
        F.col("v_e9") > 0,
        (
            F.col("observed_a").cast("double")
            - F.col("e_e9").cast("double") / 1e9
        )
        / F.sqrt(F.col("v_e9").cast("double") / 1e9),
    )
    return agg.select(
        "n_a",
        "n_b",
        "observed_a",
        F.col("e_e9").alias("expected_a_e9"),
        F.round(z * 1000000).cast("long").alias("z_e6"),
    )


def cox_one_step(
    df: DataFrame,
    time_col: str,
    event_col: str,
    x_col: str,
    *,
    x_scale: int = 100,
) -> DataFrame:
    """Cox proportional-hazards: exact score test and one-step estimator
    for a single numeric covariate (Cox 1972; the one-Newton-step-from-0
    estimator is first-order efficient).

    At each distinct event time t (Breslow ties), with risk set
    R_t = {i : T_i ≥ t}:

        U(0) = Σ_t [ s_t − d_t·x̄(R_t) ]              (score)
        I(0) = Σ_t d_t·[ x²̄(R_t) − x̄(R_t)² ]         (information)
        β̂₁  = U/I,   score χ² = U²/I  (~χ²₁ under H₀)

    Portability: x pre-rounds to integer ``x_scale`` units so every
    risk-set sum is an integer suffix-cumsum; each event time's U term
    rounds to integer hundredths and I term to integer units BEFORE the
    final sum (order-free; I terms are in x²-scaled units, so a finer
    grid would overflow int64 at corpus scale), then β̂ and χ² are
    single divisions of those integers.

    Plan: one groupBy(time) pass over subjects, suffix sums over the
    distinct-time table (bounded by the time resolution — days here, so
    thousands of rows, one tiny partition), one scalar combine.  This is
    the survival-analysis companion of `kaplan_meier`/`log_rank_test`
    for a CONTINUOUS covariate (log-rank covers the two-group case).

    Returns 1 row: ``(n, n_events, n_event_times, u_e2, i_e0, beta_e6,
    chi2_e6)`` with β̂ and χ² × 10⁶ (x in ``x_scale`` units, so β̂ is
    per 1/x_scale of x).
    """
    from pyspark.sql import Window

    xs = F.round(F.col(x_col).cast("double") * x_scale).cast("long")
    ev = F.col(event_col).cast("int")
    per_t = (
        df.select(F.col(time_col).alias("t"), xs.alias("x"), ev.alias("e"))
        .groupBy("t")
        .agg(
            F.count("*").alias("n_at"),
            F.sum("x").alias("sx_at"),
            F.sum(F.col("x") * F.col("x")).alias("sxx_at"),
            F.sum("e").alias("d_t"),
            F.sum(F.col("e") * F.col("x")).alias("s_t"),
        )
    )
    wdesc = Window.orderBy(F.desc("t")).rowsBetween(Window.unboundedPreceding, 0)
    risk = per_t.select(
        "t", "d_t", "s_t",
        F.sum("n_at").over(wdesc).alias("n_t"),
        F.sum("sx_at").over(wdesc).alias("rx_t"),
        F.sum("sxx_at").over(wdesc).alias("rxx_t"),
    ).where(F.col("d_t") > 0)
    nd = F.col("n_t").cast("double")
    xbar = F.col("rx_t").cast("double") / nd
    x2bar = F.col("rxx_t").cast("double") / nd
    terms = risk.select(
        "d_t",
        F.round(
            (F.col("s_t").cast("double") - F.col("d_t").cast("double") * xbar)
            * 100
        ).cast("long").alias("u_term"),
        F.round(
            F.col("d_t").cast("double") * (x2bar - xbar * xbar)
        ).cast("long").alias("i_term"),
    )
    totals = df.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(ev).cast("long").alias("n_events"),
    )
    u = F.col("u_e2").cast("double")  # U × 100
    i = F.col("i_e0").cast("double")  # I × 1
    return (
        terms.agg(
            F.count("*").cast("long").alias("n_event_times"),
            F.sum("u_term").alias("u_e2"),
            F.sum("i_term").alias("i_e0"),
        )
        .crossJoin(F.broadcast(totals))
        .select(
            "n", "n_events", "n_event_times", "u_e2", "i_e0",
            # β = (u/100)/i → ×1e6; χ² = (u/100)²/i → ×1e6
            F.round(u / i * 1e4).cast("long").alias("beta_e6"),
            F.round(u * u / i / 1e4 * 1e6).cast("long").alias("chi2_e6"),
        )
    )


def nelson_aalen(
    df: DataFrame, duration_col: str, event_col: str
) -> DataFrame:
    """Nelson–Aalen cumulative-hazard estimator — the additive
    companion to :func:`kaplan_meier`: ``H(t) = Σ_{t'≤t} d/n`` with the
    same risk-set bookkeeping (censored subjects leave the risk set
    without contributing events), plus its standard variance estimate
    ``Σ d/n²``.

    Portability: each increment is pre-rounded to an integer
    (``round(1e9·d/n)`` / ``round(1e12·d/n²)`` — one division of exact
    integer operands), so the cumulative hazard is an ORDER-INDEPENDENT
    integer prefix sum rather than a float accumulation.  Same
    bounded-curve contract as Kaplan–Meier: the per-time table has one
    row per distinct observed duration (resolution = the time unit), so
    the unpartitioned prefix windows run over a bounded curve, not the
    subject table.

    Returns per distinct time ``(t, n_at_risk, n_events, n_censored,
    h_e9, var_e12)`` ordered by t.
    """
    from pyspark.sql import Window

    ev = F.col(event_col).cast("int")
    per_t = (
        df.select(F.col(duration_col).alias("t"), ev.alias("e"))
        .where(F.col("t").isNotNull())
        .groupBy("t")
        .agg(
            F.sum("e").cast("long").alias("d"),
            F.sum(1 - F.col("e")).cast("long").alias("c"),
        )
    )
    w_desc = Window.orderBy(F.desc("t")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    at_risk = per_t.withColumn(
        "n_at_risk", F.sum(F.col("d") + F.col("c")).over(w_desc).cast("long")
    )
    terms = at_risk.select(
        "t",
        "n_at_risk",
        F.col("d").alias("n_events"),
        F.col("c").alias("n_censored"),
        F.round(
            F.col("d").cast("double") * 1e9 / F.col("n_at_risk").cast("double")
        )
        .cast("long")
        .alias("dh_e9"),
        F.round(
            F.col("d").cast("double")
            * 1e12
            / (F.col("n_at_risk") * F.col("n_at_risk")).cast("double")
        )
        .cast("long")
        .alias("dv_e12"),
    )
    w_asc = Window.orderBy(F.asc("t")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return terms.select(
        "t",
        "n_at_risk",
        "n_events",
        "n_censored",
        F.sum("dh_e9").over(w_asc).cast("long").alias("h_e9"),
        F.sum("dv_e12").over(w_asc).cast("long").alias("var_e12"),
    ).orderBy("t")


def rmst(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    *,
    tau: int,
) -> DataFrame:
    """Restricted mean survival time: the area under the Kaplan–Meier
    curve up to horizon ``tau`` — the clinically-preferred effect
    summary when hazards aren't proportional (mean survival time over
    the first ``tau`` periods).

    Built on :func:`kaplan_meier`'s bounded curve: S is a step function,
    so the integral is the exact integer sum ``Σ s_e6(tᵢ) · (min(tᵢ₊₁,
    τ) − min(tᵢ, τ))`` plus the leading ``S = 1`` segment — no float
    accumulates.  The windows run over the bounded curve (distinct
    observed times), not the subjects.

    Returns one row ``(tau, n_subjects, rmst_e6)`` — RMST in millionths
    of a time unit.
    """
    curve = kaplan_meier(df, duration_col, event_col)
    w = W.orderBy("t")
    tau_l = F.lit(int(tau)).cast("long")
    seg = curve.select(
        "t",
        "n_at_risk",
        "s_e6",
        F.coalesce(F.lead("t").over(w), tau_l).alias("nt"),
        F.row_number().over(w).alias("rn"),
    )
    clamp = lambda c: F.least(c, tau_l)  # noqa: E731
    return seg.agg(
        F.lit(int(tau)).cast("long").alias("tau"),
        F.max(F.when(F.col("rn") == 1, F.col("n_at_risk"))).alias(
            "n_subjects"
        ),
        (
            F.max(
                F.when(
                    F.col("rn") == 1,
                    F.lit(1000000).cast("long") * clamp(F.col("t")),
                )
            )
            + F.sum(
                F.col("s_e6") * (clamp(F.col("nt")) - clamp(F.col("t")))
            )
        )
        .cast("long")
        .alias("rmst_e6"),
    )


def cumulative_incidence(
    df: DataFrame, duration_col: str, cause_col: str
) -> DataFrame:
    """Aalen–Johansen cumulative incidence for two competing risks —
    the correct "probability of event k by time t" when another event
    can preempt it (1 − KM per cause overestimates):

        CIF_k(t) = Σ_{s≤t} S(s⁻) · d_k(s)/n(s),
        S(t) = Π_{s≤t} (1 − (d₁+d₂)(s)/n(s))

    ``cause_col``: 0 = censored, 1/2 = competing event types.

    Distributed shape (the ``kaplan_meier`` contract): one hash
    aggregate to the bounded distinct-time table, then per-point
    in-order struct folds ``(S, CIF₁, CIF₂, used)`` — fixed evaluation
    order, list_reduce-mirrored.  CIF₁ + CIF₂ + S = 1 absent censoring.

    Returns per distinct time ``(t, n_at_risk, d1, d2, n_censored,
    surv_e6, cif1_e6, cif2_e6)``.
    """
    cause = F.col(cause_col).cast("int")
    per_t = (
        df.select(F.col(duration_col).alias("t"), cause.alias("k"))
        .where(F.col("t").isNotNull())
        .groupBy("t")
        .agg(
            F.sum((F.col("k") == 1).cast("int")).cast("long").alias("d1"),
            F.sum((F.col("k") == 2).cast("int")).cast("long").alias("d2"),
            F.sum((F.col("k") == 0).cast("int")).cast("long").alias("c"),
        )
    )
    curve = per_t.agg(
        F.sort_array(F.collect_list(F.struct("t", "d1", "d2", "c"))).alias(
            "arr"
        ),
        F.sum(F.col("d1") + F.col("d2") + F.col("c"))
        .cast("long")
        .alias("n_total"),
    )
    arr = F.col("arr")

    def at(i):
        return F.element_at(arr, i)

    def prefix(i, init, step):
        return F.aggregate(F.slice(arr, 1, i), init, step)

    zero = F.lit(0.0)
    init = F.struct(
        F.lit(1.0).alias("p"),
        zero.alias("c1"),
        zero.alias("c2"),
        F.lit(0).cast("long").alias("used"),
    )

    def step(acc, s):
        nr = (F.col("n_total") - acc["used"]).cast("double")
        return F.struct(
            (acc["p"] * (F.lit(1.0) - (s["d1"] + s["d2"]) / nr)).alias("p"),
            (acc["c1"] + acc["p"] * (s["d1"] / nr)).alias("c1"),
            (acc["c2"] + acc["p"] * (s["d2"] / nr)).alias("c2"),
            (acc["used"] + s["d1"] + s["d2"] + s["c"]).alias("used"),
        )

    rows = F.transform(
        F.sequence(F.lit(1), F.size(arr)),
        lambda i: F.struct(
            at(i)["t"].alias("t"),
            (
                F.col("n_total")
                - prefix(
                    i - 1,
                    F.lit(0).cast("long"),
                    lambda acc, s: acc + s["d1"] + s["d2"] + s["c"],
                )
            ).alias("n_at_risk"),
            at(i)["d1"].alias("d1"),
            at(i)["d2"].alias("d2"),
            at(i)["c"].alias("n_censored"),
            F.round(prefix(i, init, step)["p"] * 1e6)
            .cast("long")
            .alias("surv_e6"),
            F.round(prefix(i, init, step)["c1"] * 1e6)
            .cast("long")
            .alias("cif1_e6"),
            F.round(prefix(i, init, step)["c2"] * 1e6)
            .cast("long")
            .alias("cif2_e6"),
        ),
    )
    return (
        curve.select(F.explode(rows).alias("r"))
        .select("r.*")
        .orderBy("t")
    )

