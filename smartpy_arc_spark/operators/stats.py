"""Statistical tests as aggregates: chi-square independence, Welch t.

The two workhorse significance tests of product/data analysis, computed
as pure aggregate arithmetic (no SciPy, no sampling):

* ``chi_square_independence`` — is categorical column A independent of
  B?  The classic contingency-table statistic
  ``Σ (observed − expected)² / expected``.
* ``welch_t_test`` — do two cohorts have the same mean?  Welch's
  unequal-variance t, the safe default over Student's t.

Both output the STATISTIC (and degrees of freedom), not a p-value —
p-values need the incomplete-gamma/Student CDFs, which belong to the
caller's stats library; the distributed part is the counting, which is
what costs anything at 100 TB.

Scale shape: chi-square is two hash aggregates over bounded key spaces
(cells, then margins — broadcast back); Welch is one grouped aggregate
(count/avg/variance per cohort) and a 2-row combine.  The detail table
is scanned once in both.

No counterpart in the reference repo; analytics extension surface
(SURVEY.md §7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def _check_e4_scale(scale: int) -> None:
    """Operators that rescale e-``scale`` ticks to e4 output with the
    integer factor ``10000 // scale`` require scale to divide 10000
    exactly (any divisor works — 1, 10, 100, 16, 625, … — though powers
    of 10 are the conventional choice) — any other value would silently
    mis-scale the output."""
    if scale <= 0 or 10000 % scale != 0:
        raise ValueError(f"scale must divide 10000; got {scale}")


def chi_square_independence(
    df: DataFrame, col_a: str, col_b: str
) -> DataFrame:
    """Pearson chi-square statistic for independence of two categorical
    columns.  Returns one row ``(chi2 rounded to 4, dof, n)``.

    Cells and margins are hash aggregates over the (bounded) category
    key spaces; expected counts come from broadcast margins, so the
    detail table is read exactly once.
    """
    cells = df.groupBy(col_a, col_b).agg(F.count("*").alias("o"))
    ra = cells.groupBy(col_a).agg(F.sum("o").alias("ra"))
    rb = cells.groupBy(col_b).agg(F.sum("o").alias("rb"))
    n = cells.agg(F.sum("o").alias("n"))
    scored = (
        cells.join(F.broadcast(ra), col_a)
        .join(F.broadcast(rb), col_b)
        .crossJoin(F.broadcast(n))
        .withColumn("e", F.col("ra") * F.col("rb") / F.col("n"))
        .withColumn(
            "cell_chi2",
            (F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e"),
        )
    )
    ka = ra.count()
    kb = rb.count()
    return scored.agg(
        (F.round(F.sum("cell_chi2"), 4) + F.lit(0.0)).alias("chi2"),
        F.lit((ka - 1) * (kb - 1)).cast("long").alias("dof"),
        F.max("n").cast("long").alias("n"),
    )


def welch_t_test(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Welch's unequal-variance t statistic between two cohorts.

    Returns one row ``(mean_a, mean_b, t_stat, dof)`` — means rounded to
    4, t to 4, Welch–Satterthwaite dof to 2.  One grouped aggregate
    (count / mean / sample variance per cohort), then a 2-row combine.
    """
    stats = (
        df.where(F.col(group_col).isin(group_a, group_b))
        .groupBy(group_col)
        .agg(
            F.count("*").cast("double").alias("n"),
            F.avg(value_col).alias("m"),
            F.var_samp(value_col).alias("v"),
        )
    )
    a = stats.where(F.col(group_col) == group_a).select(
        F.col("n").alias("na"), F.col("m").alias("ma"), F.col("v").alias("va")
    )
    b = stats.where(F.col(group_col) == group_b).select(
        F.col("n").alias("nb"), F.col("m").alias("mb"), F.col("v").alias("vb")
    )
    j = a.crossJoin(b)
    se2a = F.col("va") / F.col("na")
    se2b = F.col("vb") / F.col("nb")
    t = (F.col("ma") - F.col("mb")) / F.sqrt(se2a + se2b)
    dof = (
        (se2a + se2b) * (se2a + se2b)
        / (
            se2a * se2a / (F.col("na") - 1)
            + se2b * se2b / (F.col("nb") - 1)
        )
    )
    return j.select(
        (F.round(F.col("ma"), 4) + F.lit(0.0)).alias("mean_a"),
        (F.round(F.col("mb"), 4) + F.lit(0.0)).alias("mean_b"),
        (F.round(t, 4) + F.lit(0.0)).alias("t_stat"),
        (F.round(dof, 2) + F.lit(0.0)).alias("dof"),
    )


def mann_whitney_u(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) between two cohorts, with the
    normal approximation's z including the tie correction.

    Ranking never sorts in one task: values are first collapsed to the
    per-distinct-value contingency (value -> count_a, count_b), then the
    global cumulative counts come from ``partitioned_cumsum`` (range
    partition + per-partition window + broadcast offsets).  Rank sums are
    kept in INTEGER space (doubled ranks, so tied .5 averages stay exact):
    ``u2 = 2*U_a`` is exact at any scale; only the final z touches floats.

    Returns one row ``(n_a, n_b, u2_a, z_e6)`` — ``z_e6`` is z scaled to
    integer millionths (bit-stable across engines; ln/sqrt ulp drift never
    survives integer scaling).
    """
    from smartpy_arc_spark.operators.scale import partitioned_cumsum

    vals = (
        df.where(F.col(group_col).isin(group_a, group_b))
        .groupBy(F.col(value_col).alias("v"))
        .agg(
            F.count(F.when(F.col(group_col) == group_a, 1)).alias("na_v"),
            F.count(F.when(F.col(group_col) == group_b, 1)).alias("nb_v"),
        )
        .withColumn("n_v", F.col("na_v") + F.col("nb_v"))
    )
    cum = partitioned_cumsum(vals, ["v"], ["n_v"], inclusive=False)
    # doubled average rank of value v: 2*cum_before + n_v + 1 (integer)
    agg = cum.agg(
        F.sum("na_v").cast("long").alias("n_a"),
        F.sum("nb_v").cast("long").alias("n_b"),
        F.sum(F.col("na_v") * (2 * F.col("cum_n_v").cast("long") + F.col("n_v") + 1))
        .cast("long")
        .alias("r2_a"),
        F.sum(F.col("n_v") * F.col("n_v") * F.col("n_v") - F.col("n_v"))
        .cast("long")
        .alias("tie_term"),
    )
    na, nb = F.col("n_a"), F.col("n_b")
    n = na + nb
    u2 = F.col("r2_a") - na * (na + 1)  # 2 * U_a, exact integer
    # z = (U - na*nb/2) / sqrt(na*nb/12 * (n+1 - T/(n*(n-1))))
    tie_frac = F.when(
        n > 1,
        F.col("tie_term").cast("double") / (n * (n - 1)).cast("double"),
    ).otherwise(F.lit(0.0))
    var = (na * nb).cast("double") / 12.0 * ((n + 1).cast("double") - tie_frac)
    # all-tied degenerate sample: variance 0 → z undefined (NULL), not a
    # DIVIDE_BY_ZERO under ANSI mode
    z = F.when(
        var > 0,
        (u2.cast("double") - (na * nb).cast("double"))
        / (F.lit(2.0) * F.sqrt(var)),
    )
    return agg.select(
        "n_a",
        "n_b",
        u2.alias("u2_a"),
        F.round(z * 1000000).cast("long").alias("z_e6"),
    )


def ks_test_2samp(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic ``D = sup |F_a - F_b|``.

    Same distributed-CDF shape as ``mann_whitney_u``: collapse to
    distinct values, global cumulative counts via ``partitioned_cumsum``.
    D is kept exact as the integer numerator over the common denominator
    ``n_a * n_b``:  ``d_num = max |cum_a*n_b - cum_b*n_a|`` — the only
    float emitted is the final exact-integer division.

    Returns one row ``(n_a, n_b, d_num, d)``.
    """
    from smartpy_arc_spark.operators.scale import partitioned_cumsum

    vals = (
        df.where(F.col(group_col).isin(group_a, group_b))
        .groupBy(F.col(value_col).alias("v"))
        .agg(
            F.count(F.when(F.col(group_col) == group_a, 1)).alias("na_v"),
            F.count(F.when(F.col(group_col) == group_b, 1)).alias("nb_v"),
        )
    )
    cum = partitioned_cumsum(vals, ["v"], ["na_v", "nb_v"])
    totals = cum.agg(
        F.sum("na_v").cast("long").alias("n_a"),
        F.sum("nb_v").cast("long").alias("n_b"),
    )
    scored = cum.crossJoin(F.broadcast(totals)).select(
        "n_a",
        "n_b",
        F.abs(
            F.col("cum_na_v").cast("long") * F.col("n_b")
            - F.col("cum_nb_v").cast("long") * F.col("n_a")
        ).alias("num"),
    )
    return scored.groupBy("n_a", "n_b").agg(
        F.max("num").alias("d_num")
    ).select(
        "n_a",
        "n_b",
        "d_num",
        (F.col("d_num").cast("double") / (F.col("n_a") * F.col("n_b")).cast("double"))
        .alias("d"),
    )


def ols_fit(
    df: DataFrame,
    x_col: str,
    y_col: str,
    *,
    scale: int = 100,
) -> DataFrame:
    """Closed-form simple linear regression y = a + b*x via the normal
    equations, computed from EXACT integer sums.

    Inputs are fixed-point (``scale`` decimal ticks, default cents);
    Σx, Σy, Σx², Σy², Σxy accumulate as DECIMAL(38,0) — exact at any
    scale and in any engine, unlike double sums whose value depends on
    aggregation order.  The slope/intercept/r² divisions happen once,
    on scalars, so every engine sees identical operands.

    Returns one row ``(n, slope, intercept, r2)`` (rounded to 6).
    """
    xi = F.round(F.col(x_col) * scale).cast("decimal(38,0)")
    yi = F.round(F.col(y_col) * scale).cast("decimal(38,0)")
    agg = df.select(xi.alias("x"), yi.alias("y")).agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    # exact decimal covariance/variance numerators, cast once to double
    cov_n = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    var_x = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    var_y = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    slope = cov_n / var_x
    intercept = (
        (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
        / F.col("n").cast("double")
        / F.lit(float(scale))
    )
    r2 = cov_n * cov_n / (var_x * var_y)
    return agg.select(
        F.col("n").cast("long").alias("n"),
        (F.round(slope, 6) + F.lit(0.0)).alias("slope"),
        (F.round(intercept, 6) + F.lit(0.0)).alias("intercept"),
        (F.round(r2, 6) + F.lit(0.0)).alias("r2"),
    )


def autocorrelation(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    lag: int = 1,
    tiebreak_col: str | None = None,
    scale: int = 100,
    min_pairs: int = 3,
) -> DataFrame:
    """Per-key lag-``lag`` Pearson autocorrelation of a time series.

    One shuffle on the key; the lagged pairing is a window ``lag()``
    PARTITIONED BY the key (never global).  Pair sums accumulate as exact
    fixed-point integers per key (per-key series fit in int64 comfortably:
    overflow needs ~1e9 ticks² per key), so r is derived from
    order-independent operands.  Keys with fewer than ``min_pairs`` lagged
    pairs or zero variance on either side are dropped.

    Returns ``(key, n_pairs, r)`` with r rounded to 6.
    """
    from pyspark.sql import Window

    order = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    ticks = F.round(F.col(value_col) * scale).cast("long")
    pairs = (
        df.withColumn("__x", F.lag(ticks, lag).over(w))
        .withColumn("__y", ticks)
        .where(F.col("__x").isNotNull())
    )
    agg = pairs.groupBy(key_col).agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum("__x").alias("sx"),
        F.sum("__y").alias("sy"),
        F.sum(F.col("__x") * F.col("__x")).alias("sxx"),
        F.sum(F.col("__y") * F.col("__y")).alias("syy"),
        F.sum(F.col("__x") * F.col("__y")).alias("sxy"),
    )
    n = F.col("n_pairs").cast("double")
    cov_n = (F.col("n_pairs") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    var_x = (F.col("n_pairs") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    var_y = (F.col("n_pairs") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    r = cov_n / (F.sqrt(var_x) * F.sqrt(var_y))
    return (
        agg.where(
            (F.col("n_pairs") >= min_pairs)
            & (var_x > 0)
            & (var_y > 0)
        )
        .select(
            F.col(key_col),
            "n_pairs",
            (F.round(r, 6) + F.lit(0.0)).alias("r"),
        )
    )


def concentration(
    df: DataFrame,
    group_col: str,
    cat_col: str,
) -> DataFrame:
    """Per-group categorical concentration profile: Shannon entropy (nats),
    Herfindahl-Hirschman index, and the top category's share.

    Two hash aggregates over bounded key spaces (group x category cells,
    then groups); entropy/HHI derive from exact integer cell counts, with
    one ln() per cell — the only transcendental, absorbed by 6-decimal
    rounding.

    Returns ``(group, n, k_cats, entropy, hhi, top_share)``.
    """
    # "__c" not "c": a user category column named `c` must not collide
    cells = df.groupBy(group_col, cat_col).agg(F.count("*").alias("__c"))
    return (
        cells.groupBy(group_col)
        .agg(
            F.sum("__c").cast("long").alias("n"),
            F.count("*").cast("long").alias("k_cats"),
            F.sum(F.col("__c") * F.col("__c")).cast("long").alias("ss"),
            F.max("__c").cast("long").alias("cmax"),
            F.sum(
                F.col("__c").cast("double")
                * F.log(F.col("__c").cast("double"))
            ).alias("clnc"),
        )
        .select(
            F.col(group_col),
            "n",
            "k_cats",
            # H = ln(n) - (1/n) * sum(c * ln c)   (exact-int operands)
            (
                F.round(
                    F.log(F.col("n").cast("double"))
                    - F.col("clnc") / F.col("n").cast("double"),
                    6,
                )
                + F.lit(0.0)
            ).alias("entropy"),
            (
                F.round(
                    F.col("ss").cast("double")
                    / (F.col("n") * F.col("n")).cast("double"),
                    6,
                )
                + F.lit(0.0)
            ).alias("hhi"),
            (
                F.round(F.col("cmax").cast("double") / F.col("n").cast("double"), 6)
                + F.lit(0.0)
            ).alias("top_share"),
        )
    )


# cumulative Poisson(1) thresholds; LITERALS shared with the SQL oracle so
# both engines parse the identical doubles
_POIS1_CDF = (
    0.36787944117144233,  # P(X <= 0)
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
    0.9999167588507119,
    0.9999897508033253,
)


def poisson_bootstrap(
    df: DataFrame,
    id_col: str,
    value_col: str,
    *,
    n_replicates: int = 50,
    scale: int = 100,
) -> DataFrame:
    """Poisson bootstrap: ``n_replicates`` resampled means of
    ``value_col`` in ONE pass over the data.

    The classical bootstrap resamples n rows with replacement — which
    requires global coordination.  The Poisson approximation gives each
    row an independent Poisson(1) weight per replicate (correct to
    O(1/n)), so the whole thing becomes a row-local explode(B) +
    weighted aggregate: one shuffle of B bounded keys, no sampling
    coordination, the standard bootstrap at terabyte scale.

    Determinism/portability: the per-(row, replicate) uniform draw is a
    Knuth multiplicative hash in EXACT integer arithmetic
    (``(id * 2654435761 + b * 40503) mod 2^32 / 2^32`` — the division is
    by a power of two, so u is an exact dyadic rational in any engine),
    and the Poisson inverse-CDF thresholds are shared literals.  Weighted
    sums accumulate as exact fixed-point integers.  Everything after the
    scan is engine-reproducible bit-for-bit.

    Returns one row per replicate:
    ``(replicate, n_eff, sum_ticks, mean_e4)`` — feed the B means into a
    percentile for the confidence interval.
    """
    b = F.explode(
        F.array(*[F.lit(i) for i in range(n_replicates)])
    ).alias("replicate")
    rows = df.select(
        F.col(id_col).cast("long").alias("__id"),
        F.round(F.col(value_col) * scale).cast("long").alias("__ticks"),
        b,
    )
    u = (
        F.pmod(
            F.col("__id") * F.lit(2654435761) + F.col("replicate") * F.lit(40503),
            F.lit(4294967296),
        ).cast("double")
        / F.lit(4294967296.0)
    )
    k = F.size(
        F.filter(
            F.array(*[F.lit(c) for c in _POIS1_CDF]),
            lambda c: c < u,
        )
    ).cast("long")
    weighted = rows.select("replicate", "__ticks", k.alias("__k"))
    agg = weighted.groupBy("replicate").agg(
        F.sum("__k").alias("n_eff"),
        F.sum(F.col("__k") * F.col("__ticks")).alias("sum_ticks"),
    )
    mean_e4 = F.round(
        F.col("sum_ticks").cast("double")
        / F.col("n_eff").cast("double")
        / scale
        * 10000
    ).cast("long")
    return agg.select(
        F.col("replicate").cast("int").alias("replicate"),
        "n_eff",
        "sum_ticks",
        mean_e4.alias("mean_e4"),
    )


def benford_deviation(
    df: DataFrame,
    value_col: str,
) -> DataFrame:
    """Benford's-law digit forensics: observed first-significant-digit
    distribution vs the log10(1 + 1/d) expectation, with the chi-square
    deviation — the classic fabricated-numbers screen for financial /
    metric columns.

    First digits extract in codegen (string of abs value, strip
    non-digits, first char; zero values drop — they have no significant
    digit); one 9-key aggregate.  Expected shares are literal constants
    so both engines parse identical doubles.

    Returns 9 rows ``(digit, n, share_e6, expected_e6, chi2_term_e6)``.
    """
    first = F.substring(
        F.regexp_replace(F.abs(F.col(value_col)).cast("string"), "[^1-9]", ""),
        1,
        1,
    )
    counts = (
        df.where(F.col(value_col).isNotNull() & (F.col(value_col) != 0))
        .select(first.cast("int").alias("digit"))
        .where(F.col("digit").isNotNull())
        .groupBy("digit")
        .agg(F.count("*").cast("long").alias("n"))
    )
    tot = counts.agg(F.sum("n").alias("__t"))
    import math

    expected = {d: math.log10(1 + 1 / d) for d in range(1, 10)}
    exp_col = F.create_map(
        *[F.lit(v) for d in expected for v in (d, expected[d])]
    )[F.col("digit")]
    share = F.col("n").cast("double") / F.col("__t").cast("double")
    chi2_term = (
        (share - exp_col) * (share - exp_col) / exp_col
        * F.col("__t").cast("double")
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n",
            F.round(share * 1000000).cast("long").alias("share_e6"),
            F.round(exp_col * 1000000).cast("long").alias("expected_e6"),
            F.round(chi2_term * 1000000).cast("long").alias("chi2_term_e6"),
        )
    )


def gini_coefficient(
    df: DataFrame,
    value_col: str,
    *,
    scale: int = 100,
) -> DataFrame:
    """Exact Gini inequality coefficient of a non-negative quantity:

        G = (2 · Σ_i i·x_(i)) / (n · Σx) − (n + 1) / n

    over the ascending-sorted values — the rank weighting computed with
    ``partitioned_cumsum`` over per-distinct-value counts, so nothing
    sorts in one task: for a run of ``c`` equal values ending at
    cumulative position ``k``, Σ of their ranks is ``c·k − c(c−1)/2``,
    all in exact integer space.  One double division pair at the end.

    Returns one row ``(n, gini_e6)``.
    """
    from smartpy_arc_spark.operators.scale import partitioned_cumsum

    ticks = F.round(F.col(value_col) * scale).cast("long")
    vals = (
        df.select(ticks.alias("v"))
        .where(F.col("v") >= 0)
        .groupBy("v")
        .agg(F.count("*").alias("c"))
    )
    cum = partitioned_cumsum(vals, ["v"], ["c"])
    # Σ ranks of this value's run: c*k - c(c-1)/2  (k = inclusive cum count;
    # c(c-1) is even, so the halving stays integral).  The rank-weighted
    # value sum can exceed 2^53, so it accumulates as DECIMAL(38,0) —
    # exact in any engine, unlike a double sum.
    k = F.col("cum_c").cast("long")
    rank_sum = (
        F.col("c").cast("long") * k
        - F.expr("c * (c - 1) div 2").cast("long")
    )
    agg = cum.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("v") * F.col("c")).cast("decimal(38,0)").alias("sx"),
        F.sum(
            (F.col("v") * rank_sum).cast("decimal(38,0)")
        ).alias("sxr"),
    )
    g = (
        F.lit(2.0) * F.col("sxr").cast("double")
        / (F.col("n").cast("double") * F.col("sx").cast("double"))
        - (F.col("n") + 1).cast("double") / F.col("n").cast("double")
    )
    return agg.select(
        "n", F.round(g * 1000000).cast("long").alias("gini_e6")
    )


def spearman_corr(
    df: DataFrame, col_x: str, col_y: str
) -> DataFrame:
    """Spearman rank correlation between two numeric columns, with
    average (fractional) ranks for ties — the textbook definition, not
    the no-ties shortcut.

    Distributed shape: the detail table is scanned ONCE into the joint
    (x, y) contingency; each marginal is ranked WITHOUT a global sort via
    ``partitioned_cumsum`` (range partition + broadcast offsets), exactly
    like ``mann_whitney_u``.  Doubled ranks (``2*cum_before + n_v + 1``)
    keep tied ``.5`` averages in integer space; Pearson's moments are
    then cell-weighted sums over the contingency (``Σ n·r2x·r2y`` etc.)
    — every shuffled row after the first aggregate is a DISTINCT VALUE,
    never a detail row.  Only the final 1-row combine touches doubles.

    Returns one row ``(n, rho_e6)`` — rho scaled to integer millionths
    (bit-stable across engines).
    """
    from smartpy_arc_spark.operators.scale import partitioned_cumsum

    cells = (
        df.select(F.col(col_x).alias("x"), F.col(col_y).alias("y"))
        .where(F.col("x").isNotNull() & F.col("y").isNotNull())
        .groupBy("x", "y")
        .agg(F.count("*").alias("n"))
        .localCheckpoint()
    )

    def doubled_ranks(col: str) -> DataFrame:
        vals = cells.groupBy(F.col(col).alias("v")).agg(
            F.sum("n").alias("n_v")
        )
        cum = partitioned_cumsum(vals, ["v"], ["n_v"], inclusive=False)
        return cum.select(
            F.col("v").alias(col),
            (2 * F.col("cum_n_v").cast("long") + F.col("n_v") + 1).alias(
                f"r2_{col}"
            ),
        )

    ranked = cells.join(doubled_ranks("x"), "x").join(doubled_ranks("y"), "y")
    nd = F.col("n").cast("decimal(38,0)")
    # cast ranks to DECIMAL BEFORE multiplying: doubled ranks reach 2N,
    # so a long×long rank product overflows past ~2e9 detail rows
    rx = F.col("r2_x").cast("decimal(38,0)")
    ry = F.col("r2_y").cast("decimal(38,0)")
    agg = ranked.agg(
        F.sum("n").cast("long").alias("n"),
        F.sum(nd * rx).cast("decimal(38,0)").alias("sx"),
        F.sum(nd * ry).cast("decimal(38,0)").alias("sy"),
        F.sum(nd * rx * ry).cast("decimal(38,0)").alias("sxy"),
        F.sum(nd * rx * rx).cast("decimal(38,0)").alias("sxx"),
        F.sum(nd * ry * ry).cast("decimal(38,0)").alias("syy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    cov = n * F.col("sxy").cast("double") - sx * sy
    vx = n * F.col("sxx").cast("double") - sx * sx
    vy = n * F.col("syy").cast("double") - sy * sy
    rho = F.when(
        (vx > 0) & (vy > 0), cov / F.sqrt(vx) / F.sqrt(vy)
    )
    return agg.select(
        "n", F.round(rho * 1000000).cast("long").alias("rho_e6")
    )


def anova_oneway(
    df: DataFrame, group_col: str, value_col: str, scale: int = 100
) -> DataFrame:
    """One-way ANOVA F statistic across the groups of ``group_col``.

    Values are fixed-point-scaled to integers (``scale`` ticks per unit,
    default cents) so the grouped sums and sums-of-squares are EXACT
    DECIMAL(38,0) aggregates — the classic
    ``F = (SSB/(k-1)) / (SSW/(n-k))`` decomposition then runs in one
    deterministic 1-row combine over the (bounded, sorted) per-group sum
    array, so the float expression shape is identical on any engine.

    One scan, one hash aggregate on a bounded key space.  Returns one row
    ``(k, n, f_e6)``.
    """
    ticks = F.round(F.col(value_col) * scale).cast("long")
    per_group = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(F.col(group_col).alias("g"))
        .agg(
            F.count("*").cast("long").alias("ng"),
            F.sum(ticks.cast("decimal(38,0)")).alias("sg"),
            F.sum((ticks * ticks).cast("decimal(38,0)")).alias("sqg"),
        )
    )
    # Σ sg²/ng folded over the group array in sorted-key order: the
    # divide-then-add sequence is identical in any engine (no FMA shape).
    combined = per_group.agg(
        F.count("*").cast("long").alias("k"),
        F.sum("ng").alias("n"),
        F.sum("sg").alias("s"),
        F.sum("sqg").alias("sq"),
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct("g", "sg", "ng"))
            ),
            F.lit(0.0),
            lambda acc, t: acc
            + (t["sg"].cast("double") * t["sg"].cast("double"))
            / t["ng"].cast("double"),
        ).alias("sum_sg2_over_ng"),
    )
    n = F.col("n").cast("double")
    ssb = F.col("sum_sg2_over_ng") - (
        F.col("s").cast("double") * F.col("s").cast("double")
    ) / n
    ssw = F.col("sq").cast("double") - F.col("sum_sg2_over_ng")
    k = F.col("k")
    f_stat = F.when(
        (k > 1) & (F.col("n") > k) & (ssw > 0),
        (ssb / (k - 1).cast("double"))
        / (ssw / (F.col("n") - k).cast("double")),
    )
    return combined.select(
        "k",
        F.col("n").cast("long").alias("n"),
        F.round(f_stat * 1000000).cast("long").alias("f_e6"),
    )


def proportion_ztest(
    df: DataFrame,
    group_col: str,
    success_col,
    group_a,
    group_b,
) -> DataFrame:
    """Two-proportion z test (pooled standard error) between two cohorts.

    ``success_col`` is a boolean Column (or column name) marking a
    success.  One grouped aggregate produces the four exact counts; the z
    combine is a single deterministic 1-row float expression.  The
    workhorse of A/B conversion readouts and sample-ratio-mismatch
    checks.  Returns one row
    ``(n_a, n_b, successes_a, successes_b, z_e6)``.
    """
    success = (
        F.col(success_col) if isinstance(success_col, str) else success_col
    )
    stats = (
        df.where(F.col(group_col).isin(group_a, group_b))
        .groupBy(F.col(group_col).alias("g"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.when(success, 1).otherwise(0)).cast("long").alias("s"),
        )
    )
    a = stats.where(F.col("g") == group_a).select(
        F.col("n").alias("n_a"), F.col("s").alias("s_a")
    )
    b = stats.where(F.col("g") == group_b).select(
        F.col("n").alias("n_b"), F.col("s").alias("s_b")
    )
    j = a.crossJoin(b)
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    p1 = F.col("s_a").cast("double") / na
    p2 = F.col("s_b").cast("double") / nb
    pool = (F.col("s_a") + F.col("s_b")).cast("double") / (na + nb)
    se = F.sqrt(pool * (F.lit(1.0) - pool) * (F.lit(1.0) / na + F.lit(1.0) / nb))
    z = F.when(se > 0, (p1 - p2) / se)
    return j.select(
        "n_a",
        "n_b",
        F.col("s_a").alias("successes_a"),
        F.col("s_b").alias("successes_b"),
        F.round(z * 1000000).cast("long").alias("z_e6"),
    )


def cusum_changepoints(
    df: DataFrame,
    key_col: str,
    order_cols: list,
    value_col: str,
    threshold: float,
    scale: int = 100,
) -> DataFrame:
    """Per-key CUSUM mean-shift detection: the running sum of deviations
    from the key's own mean, flagged where ``|Σ(x_i − mean)| > threshold``.

    Everything stays in integer space: with ``c_i`` the fixed-point value
    and ``S_k`` its per-key prefix sum, the deviation cumsum scaled by the
    key's count ``n`` is ``D_k = n·S_k − k·total`` (exact), and the flag
    compares ``|D_k| > threshold·scale·n`` — no float enters the
    detection at all.  The window is PER-KEY (partitionBy key), so no
    single-partition exchange exists at any corpus size; the per-key mean
    rides in via a broadcast-able self-aggregate join.

    Returns per key: ``(key, n_obs, n_crossings, max_dev_e4)`` where
    ``max_dev_e4`` is ``max|D_k| / (scale·n)`` — the peak deviation in
    value units — in integer ten-thousandths.
    """
    from pyspark.sql import Window

    ticks = F.round(F.col(value_col) * scale).cast("long")
    base = df.select(
        F.col(key_col).alias("k"),
        *[F.col(c) for c in order_cols],
        ticks.alias("c"),
    ).where(F.col("c").isNotNull())
    totals = base.groupBy("k").agg(
        F.count("*").cast("long").alias("n_obs"),
        F.sum("c").cast("long").alias("total"),
    )
    w = Window.partitionBy("k").orderBy(*order_cols)
    cum = (
        base.withColumn("s", F.sum("c").over(w))
        .withColumn("i", F.row_number().over(w))
        .join(totals, "k")
        .withColumn(
            "dev",
            (
                F.col("n_obs").cast("decimal(38,0)") * F.col("s")
                - F.col("i").cast("decimal(38,0)") * F.col("total")
            ),
        )
    )
    lim = (
        F.col("n_obs").cast("decimal(38,0)")
        * F.lit(int(round(threshold * scale)))
    )
    return (
        cum.groupBy("k", "n_obs")
        .agg(
            F.sum(F.when(F.abs(F.col("dev")) > lim, 1).otherwise(0))
            .cast("long")
            .alias("n_crossings"),
            F.max(F.abs(F.col("dev"))).alias("max_dev"),
        )
        .select(
            F.col("k").alias(key_col),
            F.col("n_obs"),
            "n_crossings",
            F.round(
                F.col("max_dev").cast("double")
                / (F.col("n_obs").cast("double") * float(scale))
                * 10000
            )
            .cast("long")
            .alias("max_dev_e4"),
        )
    )


def kendall_tau_b(df: DataFrame, col_x: str, col_y: str) -> DataFrame:
    """Kendall rank correlation τ-b (tie-corrected) WITHOUT touching
    pairs: the classic O(n²) concordant/discordant count collapses onto
    the (x, y) contingency grid, where 2D prefix sums answer "how many
    points are strictly above-left / above-right of this cell" — so the
    whole statistic is one grid densification plus per-axis window
    cumsums.

    Bounded-cardinality tier (documented, like ``chi_square``): the
    dense grid is |X|·|Y| cells — meant for discrete/bucketed columns;
    pre-bucket continuous data first.  Detail rows are scanned once
    (one hash aggregate); every window partitions by one grid axis, and
    the only global 1D cumsum (per-x totals) runs through
    ``partitioned_cumsum``.  Pair counts stay in DECIMAL(38,0)
    (concordant ≤ N²/2 overflows a long past ~4.3e9 rows).

    Returns one row ``(n, conc_pairs, disc_pairs, tau_e6)``.
    """
    from pyspark.sql import Window

    from smartpy_arc_spark.operators.scale import partitioned_cumsum

    cells = (
        df.select(F.col(col_x).alias("x"), F.col(col_y).alias("y"))
        .where(F.col("x").isNotNull() & F.col("y").isNotNull())
        .groupBy("x", "y")
        .agg(F.count("*").alias("n"))
    )
    gx = cells.select("x").distinct()
    gy = cells.select("y").distinct()
    dense = (
        gx.crossJoin(F.broadcast(gy))
        .join(cells, ["x", "y"], "left")
        .withColumn("n", F.coalesce(F.col("n"), F.lit(0)).cast("long"))
    )
    wy = Window.partitionBy("x").orderBy("y")
    wx = Window.partitionBy("y").orderBy("x")
    dense = (
        dense.withColumn("rowcum", F.sum("n").over(wy))
        .withColumn("colcum", F.sum("n").over(wx))
        .withColumn("p_incl", F.sum("rowcum").over(wx))
    )
    xtot = dense.groupBy("x").agg(F.max("rowcum").alias("t"))
    xcum = partitioned_cumsum(xtot, ["x"], ["t"]).select(
        "x", (F.col("cum_t") - F.col("t")).alias("x_lt")
    )
    scored = dense.join(xcum, "x").select(
        "n",
        # strictly above-left: x' < x and y' < y
        (F.col("p_incl") - F.col("rowcum") - F.col("colcum") + F.col("n"))
        .alias("p_excl"),
        # strictly above-right: x' < x and y' > y
        (F.col("x_lt") - (F.col("p_incl") - F.col("rowcum"))).alias("q"),
    )
    ties_x = xtot.agg(
        F.sum(
            (F.col("t").cast("decimal(38,0)") * (F.col("t") - 1)) / 2
        ).cast("decimal(38,0)").alias("n1")
    )
    ytot = dense.groupBy("y").agg(F.sum("n").alias("t"))
    ties_y = ytot.agg(
        F.sum(
            (F.col("t").cast("decimal(38,0)") * (F.col("t") - 1)) / 2
        ).cast("decimal(38,0)").alias("n2")
    )
    agg = scored.agg(
        F.sum("n").cast("decimal(38,0)").alias("nn"),
        F.sum(F.col("n").cast("decimal(38,0)") * F.col("p_excl")).alias("c"),
        F.sum(F.col("n").cast("decimal(38,0)") * F.col("q")).alias("d"),
    )
    j = agg.crossJoin(F.broadcast(ties_x)).crossJoin(F.broadcast(ties_y))
    n0 = (F.col("nn") * (F.col("nn") - 1) / 2).cast("decimal(38,0)")
    tau = (
        (F.col("c") - F.col("d")).cast("double")
        / F.sqrt((n0 - F.col("n1")).cast("double"))
        / F.sqrt((n0 - F.col("n2")).cast("double"))
    )
    return j.select(
        F.col("nn").cast("long").alias("n"),
        F.col("c").cast("long").alias("conc_pairs"),
        F.col("d").cast("long").alias("disc_pairs"),
        F.round(tau * 1000000).cast("long").alias("tau_e6"),
    )


def theil_sen(
    df: DataFrame,
    x_col: str,
    y_col: str,
    id_col: str,
    *,
    scale: int = 100,
) -> DataFrame:
    """Theil–Sen robust regression, disjoint-pairs variant: rank points
    by x (globally, via ``partitioned_cumsum`` — no single-partition
    window), pair rank ``r`` with rank ``r + n/2``, and take the MEDIAN
    pair slope; the intercept is the median residual ``y − m·x``.  The
    O(n²) all-pairs estimator collapses to n/2 disjoint pairs (Siegel's
    pairing), keeping the 29% breakdown robustness against outliers
    that OLS (``ols_fit``) lacks.

    Medians are deterministic SELECTIONS, not interpolations: the
    element at rank ``(k+1) div 2`` under ``(value, rank)`` ordering —
    both engine-portable (identical doubles, identical order) and free
    of the percentile-interpolation divergence documented in
    ``quantile_normalize``.  Vertical pairs (dx = 0) are excluded.

    Returns one row ``(n, n_pairs, slope_e6, intercept_e4)`` —
    intercept in value units (ten-thousandths).
    """
    from smartpy_arc_spark.operators.scale import partitioned_cumsum

    xt = F.round(F.col(x_col).cast("double") * scale).cast("long")
    yt = F.round(F.col(y_col).cast("double") * scale).cast("long")
    base = df.select(
        xt.alias("x"), yt.alias("y"), F.col(id_col).alias("i")
    ).where(F.col("x").isNotNull() & F.col("y").isNotNull())
    # checkpoint between the three ranking passes: each median_select's
    # offset/count jobs would otherwise re-execute every upstream pass
    # (the same lineage blowup fixed in rfm_segments)
    ranked = (
        partitioned_cumsum(
            base.withColumn("__one", F.lit(1)), ["x", "y", "i"], ["__one"]
        )
        .select("x", "y", F.col("cum___one").cast("long").alias("r"))
        .localCheckpoint()
    )
    n_row = ranked.agg(F.count("*").cast("long").alias("n"))
    half = ranked.crossJoin(F.broadcast(n_row)).withColumn(
        "h", F.floor(F.col("n") / 2).cast("long")
    )
    lo = half.where(F.col("r") <= F.col("h")).select(
        "n", F.col("r").alias("pr"), F.col("x").alias("x1"), F.col("y").alias("y1")
    )
    hi = half.select(
        (F.col("r") - F.col("h")).alias("pr"),
        F.col("x").alias("x2"),
        F.col("y").alias("y2"),
    ).where(F.col("pr") >= 1)
    pairs = (
        lo.join(hi, "pr")
        .where(F.col("x2") != F.col("x1"))
        .select(
            "n",
            "pr",
            (
                (F.col("y2") - F.col("y1")).cast("double")
                / (F.col("x2") - F.col("x1")).cast("double")
            ).alias("m"),
        )
        .localCheckpoint()
    )

    def median_select(sdf, val_col, order_extra):
        """Row at rank (k+1) div 2 under (val, tiebreak) order — the
        deterministic lower-median selection."""
        r = partitioned_cumsum(
            sdf.withColumn("__one", F.lit(1)),
            [val_col, order_extra],
            ["__one"],
        )
        k = r.agg(F.count("*").cast("long").alias("k"))
        return (
            r.crossJoin(F.broadcast(k))
            .where(
                F.col("cum___one").cast("long")
                == F.floor((F.col("k") + 1) / 2).cast("long")
            )
            .select(F.col(val_col).alias("med"), "k")
        )

    m_med = median_select(pairs, "m", "pr")
    slope = m_med.select(F.col("med").alias("m"), F.col("k").alias("n_pairs"))
    resid = (
        ranked.crossJoin(F.broadcast(slope))
        .select(
            "n_pairs",
            "m",
            (F.col("y").cast("double") - F.col("m") * F.col("x").cast("double"))
            .alias("res"),
            "r",
        )
        .localCheckpoint()
    )
    b_med = median_select(resid, "res", "r")
    out = (
        n_row.crossJoin(F.broadcast(slope))
        .crossJoin(
            F.broadcast(b_med.select(F.col("med").alias("b")))
        )
        .select(
            "n",
            "n_pairs",
            F.round(F.col("m") * 1000000).cast("long").alias("slope_e6"),
            F.round(F.col("b") / scale * 10000).cast("long").alias(
                "intercept_e4"
            ),
        )
    )
    return out


def pareto_frontier_2d(
    df: DataFrame, x_col: str, y_col: str, *, scale: int = 100
) -> DataFrame:
    """2-D Pareto frontier (skyline): the points no other point weakly
    dominates (≥ in both maximized dimensions, > in at least one).

    Scalable shape: collapse to the per-distinct-x maximum y (one hash
    aggregate — only frontier-candidate rows survive), then a suffix
    maximum over the DISTINCT x values via ``partitioned_cumsum`` on the
    negated key; a candidate is on the frontier iff its y strictly
    exceeds the best y among all strictly larger x.  The detail table is
    scanned once; nothing ever compares point-to-point.

    Returns the frontier as ``(x, y)`` in fixed-point ticks.
    """
    from smartpy_arc_spark.operators.scale import partitioned_cumsum

    xt = F.round(F.col(x_col).cast("double") * scale).cast("long")
    yt = F.round(F.col(y_col).cast("double") * scale).cast("long")
    cand = (
        df.select(xt.alias("x"), yt.alias("y"))
        .where(F.col("x").isNotNull() & F.col("y").isNotNull())
        .groupBy("x")
        .agg(F.max("y").alias("y"))
    )
    # suffix max over x: cumulative max of y in decreasing-x order.
    # partitioned_cumsum sums, so feed it a monotone transform: running
    # max == value where the EXCLUSIVE running max (over larger x) is
    # smaller.  Compute exclusive running max via the same range-
    # partition machinery on (-x) with a max-fold per partition + driver
    # offsets — expressed here with a per-partition window over the
    # range-partitioned layout.
    from pyspark.sql import Window

    part = (
        cand.withColumn("nx", -F.col("x"))
        .repartitionByRange("nx")
        .sortWithinPartitions("nx")
        .withColumn("__pid", F.spark_partition_id())
    )
    totals = part.groupBy("__pid").agg(F.max("y").alias("pmax")).collect()
    offsets: dict[int, int] = {}
    best = None
    for r in sorted(totals, key=lambda r: r["__pid"]):
        offsets[r["__pid"]] = best if best is not None else -(1 << 62)
        best = max(best, r["pmax"]) if best is not None else r["pmax"]
    off_map = F.create_map(
        *[F.lit(v) for kv in offsets.items() for v in kv]
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy("nx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local_max = F.max("y").over(w)
    prior_best = F.greatest(
        F.coalesce(local_max, F.lit(-(1 << 62))), off_map[F.col("__pid")]
    )
    return (
        part.withColumn("__prior", prior_best)
        .where(F.col("y") > F.col("__prior"))
        .select("x", "y")
    )


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


def mutual_information(
    df: DataFrame, col_a: str, col_b: str
) -> DataFrame:
    """Mutual information I(A;B) between two categorical columns in nats
    — the feature-selection/dependence score chi-square doesn't give
    (MI is 0 iff independent AND scales with the strength of the
    association).

    Same contingency shape as ``chi_square_independence``: one hash
    aggregate to cells, broadcast margins back, then
    ``Σ (n_ab/N)·ln(N·n_ab/(n_a·n_b))`` summed per-cell with each term
    pre-rounded to integer nanonats so the final sum is an order-free
    integer aggregate (the engine-portability pattern of
    ``rake_keywords``).

    Returns one row ``(n, n_cells, mi_e9)``.
    """
    cells = (
        df.select(F.col(col_a).alias("a"), F.col(col_b).alias("b"))
        .where(F.col("a").isNotNull() & F.col("b").isNotNull())
        .groupBy("a", "b")
        .agg(F.count("*").alias("nab"))
    )
    ma = cells.groupBy("a").agg(F.sum("nab").alias("na"))
    mb = cells.groupBy("b").agg(F.sum("nab").alias("nb"))
    tot = cells.agg(F.sum("nab").cast("long").alias("n"))
    term = (
        F.col("nab").cast("double")
        / F.col("n").cast("double")
        * F.log(
            F.col("n").cast("double")
            * F.col("nab").cast("double")
            / (F.col("na").cast("double") * F.col("nb").cast("double"))
        )
    )
    scored = (
        cells.join(F.broadcast(ma), "a")
        .join(F.broadcast(mb), "b")
        .crossJoin(F.broadcast(tot))
        .select(
            "n",
            F.round(term * 1e9).cast("long").alias("term_e9"),
        )
    )
    return scored.groupBy("n").agg(
        F.count("*").cast("long").alias("n_cells"),
        F.sum("term_e9").cast("long").alias("mi_e9"),
    )


def conformal_interval(
    df: DataFrame,
    group_col: str,
    value_col: str,
    key_cols: list,
    *,
    alpha_num: int = 1,
    alpha_den: int = 10,
    scale: int = 100,
) -> DataFrame:
    """Split-conformal prediction interval around a per-group mean
    predictor, with the finite-sample coverage guarantee
    ``P(|y − ŷ| ≤ q̂) ≥ 1 − α``: rows hash-split (md5, engine-portable,
    growth-stable) into train/calibration/test 60/20/20; q̂ is the
    ``⌈(n_cal+1)(1−α)⌉``-th smallest calibration residual — an EXACT
    order statistic selected via ``partitioned_cumsum`` (no percentile
    interpolation, no single-partition sort) — and coverage is then
    measured on the held-out test split.

    Residuals are ratios of exact fixed-point integers (``|v·c − s|/c``
    with the train sums), so both the ordering and the final comparisons
    are deterministic in any IEEE engine.

    Returns one row ``(n_train, n_cal, n_test, qhat_e4, n_covered)``.
    """
    from smartpy_arc_spark.operators.scale import partitioned_cumsum

    key = F.concat_ws("-", *[F.col(c) for c in key_cols])
    bucket = (
        F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long") % 100
    )
    ticks = F.round(F.col(value_col) * scale).cast("long")
    base = df.select(
        F.col(group_col).alias("g"),
        ticks.alias("v"),
        key.alias("k"),
        bucket.alias("b"),
    ).where(F.col("v").isNotNull())
    base = base.localCheckpoint()
    train = base.where("b < 60").groupBy("g").agg(
        F.count("*").cast("long").alias("c"),
        F.sum("v").cast("long").alias("s"),
    )
    resid = F.abs(
        F.col("v").cast("decimal(38,0)") * F.col("c") - F.col("s")
    ).cast("double") / F.col("c").cast("double")
    cal = (
        base.where("b >= 60 AND b < 80")
        .join(F.broadcast(train), "g")
        .select(resid.alias("r"), "k")
    )
    ranked = partitioned_cumsum(
        cal.withColumn("__one", F.lit(1)), ["r", "k"], ["__one"]
    )
    n_cal = ranked.agg(F.count("*").cast("long").alias("n_cal"))
    a_n, a_d = alpha_num, alpha_den
    target = F.least(
        F.floor(
            ((F.col("n_cal") + 1) * (a_d - a_n) + a_d - 1) / a_d
        ).cast("long"),
        F.col("n_cal"),
    )
    qhat = (
        ranked.crossJoin(F.broadcast(n_cal))
        .where(F.col("cum___one").cast("long") == target)
        .select(F.col("r").alias("qhat"), "n_cal")
    )
    test = (
        base.where("b >= 80")
        .join(F.broadcast(train), "g")
        .select(resid.alias("r"))
    )
    n_train = base.where("b < 60").count()
    return (
        test.crossJoin(F.broadcast(qhat))
        .agg(
            F.lit(n_train).cast("long").alias("n_train"),
            F.max("n_cal").alias("n_cal"),
            F.count("*").cast("long").alias("n_test"),
            F.round(F.max("qhat") / scale * 10000).cast("long").alias(
                "qhat_e4"
            ),
            F.sum(F.when(F.col("r") <= F.col("qhat"), 1).otherwise(0))
            .cast("long")
            .alias("n_covered"),
        )
    )


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
    cum = partitioned_cumsum(per_t, ["t"], ["ra", "rb"], inclusive=False)
    totals = cum.agg(
        F.sum("ra").cast("long").alias("n_a"),
        F.sum("rb").cast("long").alias("n_b"),
    )
    j = cum.crossJoin(F.broadcast(totals))
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


def cohens_kappa(
    df: DataFrame, rater_a_col: str, rater_b_col: str
) -> DataFrame:
    """Cohen's kappa — agreement between two labelers corrected for
    chance: ``κ = (p_o − p_e)/(1 − p_e)`` with observed agreement
    ``p_o`` and the chance agreement ``p_e`` from the raters' marginal
    distributions.  The standard QA statistic for double-annotated
    training data (raw percent-agreement flatters skewed label sets).

    One contingency aggregate + broadcast marginals — chi-square's
    shape; all counts exact, one float combine.  Returns one row
    ``(n, n_agree, po_e6, pe_e6, kappa_e6)``.
    """
    cells = (
        df.select(F.col(rater_a_col).alias("a"), F.col(rater_b_col).alias("b"))
        .where(F.col("a").isNotNull() & F.col("b").isNotNull())
        .groupBy("a", "b")
        .agg(F.count("*").alias("c"))
    )
    ma = cells.groupBy("a").agg(F.sum("c").alias("na"))
    mb = cells.groupBy("b").agg(F.sum("c").alias("nb"))
    agg = cells.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.when(F.col("a") == F.col("b"), F.col("c")).otherwise(0))
        .cast("long")
        .alias("n_agree"),
    )
    pe_num = (
        ma.join(mb, ma["a"] == mb["b"])
        .agg(
            F.sum(F.col("na").cast("decimal(38,0)") * F.col("nb")).alias(
                "pe_num"
            )
        )
    )
    j = agg.crossJoin(F.broadcast(pe_num))
    n = F.col("n").cast("double")
    po = F.col("n_agree").cast("double") / n
    pe = F.col("pe_num").cast("double") / (n * n)
    kappa = F.when(pe < 1.0, (po - pe) / (F.lit(1.0) - pe))
    e6 = lambda c: F.round(c * 1000000).cast("long")  # noqa: E731
    return j.select(
        "n",
        "n_agree",
        e6(po).alias("po_e6"),
        e6(pe).alias("pe_e6"),
        e6(kappa).alias("kappa_e6"),
    )


def isotonic_fit(
    df: DataFrame,
    bin_col: str,
    y_col: str,
    *,
    scale: int = 1_000_000,
) -> DataFrame:
    """Exact isotonic (monotone nondecreasing) regression over pre-binned
    data, via the minimax closed form.

    The isotonic solution at bin k is ``ŷ_k = max_{i≤k} min_{j≥k}
    avg(y over bins i..j)`` — PAV's pool-adjacent-violators result
    without PAV's sequential sweep, which has no distributed form.  The
    per-(i, j) interval averages come from prefix sums of the bin table,
    so the whole fit is exact rational arithmetic: y pre-rounds to
    integer ``scale`` units, interval averages are one integer division
    each, and min/max never accumulate float error — the result is
    bit-identical on any engine.

    Scale shape: the ONLY per-row pass is the groupBy(bin) aggregate;
    everything after runs on the k-row bin table (k = #bins, bounded by
    contract — calibration uses 10-100), where the O(k²) interval pairs
    and O(k³)-ish join are driver-free but trivially small.  The classic
    use: isotonic calibration of classifier scores (score-bin → observed
    rate), the monotone counterpart of `calibration_bins`.

    Returns ``(bin, n_obs, y_mean_e6, y_iso_e6)`` ordered by bin;
    ``y_iso_e6`` is nondecreasing.
    """
    from pyspark.sql import Window

    ys = F.round(F.col(y_col).cast("double") * scale).cast("long")
    bins = (
        df.select(F.col(bin_col).alias("bin"), ys.alias("ys"))
        .groupBy("bin")
        .agg(F.count("*").alias("w"), F.sum("ys").alias("s"))
    )
    # prefix sums over the bounded bin table (single tiny partition)
    wseq = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    pre = bins.select(
        "bin", "w", "s",
        F.sum("w").over(wseq).alias("cw"),
        F.sum("s").over(wseq).alias("cs"),
    )
    lo = pre.select(
        F.col("bin").alias("i"),
        (F.col("cw") - F.col("w")).alias("lw"),
        (F.col("cs") - F.col("s")).alias("ls"),
    )
    hi = pre.select(
        F.col("bin").alias("j"), F.col("cw").alias("hw"), F.col("cs").alias("hs")
    )
    # avg over bins i..j, exact single division of integer sums
    pairs = (
        lo.join(hi, F.col("i") <= F.col("j"))
        .select(
            "i", "j",
            (
                (F.col("hs") - F.col("ls")).cast("double")
                / (F.col("hw") - F.col("lw")).cast("double")
            ).alias("avg"),
        )
    )
    ks = bins.select(F.col("bin").alias("k"))
    inner = (
        pairs.join(ks, F.col("j") >= F.col("k"))
        .where(F.col("i") <= F.col("k"))
        .groupBy("i", "k")
        .agg(F.min("avg").alias("mn"))
    )
    iso = (
        inner.groupBy("k")
        .agg(F.max("mn").alias("iso"))
        .select(F.col("k").alias("bin"), F.round("iso").cast("long").alias("y_iso_e6"))
    )
    return (
        bins.join(iso, "bin")
        .select(
            "bin",
            F.col("w").cast("long").alias("n_obs"),
            F.round(F.col("s").cast("double") / F.col("w").cast("double"))
            .cast("long")
            .alias("y_mean_e6"),
            "y_iso_e6",
        )
        .orderBy("bin")
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


def cuped_adjust(
    df: DataFrame,
    y_col: str,
    x_col: str,
    group_col: str,
    *,
    scale: int = 100,
) -> DataFrame:
    """CUPED variance reduction (Deng, Xu, Kohavi, Walker — WSDM 2013):
    adjust an experiment metric with a pre-experiment covariate,

        ŷ = y − θ·(x − x̄),   θ = cov(x, y) / var(x)   (pooled),

    which shrinks metric variance by ρ² while leaving group-mean
    DIFFERENCES unbiased — the standard trick that cuts A/B-test sample
    sizes by the covariate's explanatory power.

    Exactness: y and x pre-round to integer ``scale`` units; all moments
    are integer sums widened to DECIMAL(38,0) (HUGEINT on DuckDB) so
    θ's numerator/denominator are exact integers, and every reported
    number is one double division of exact integers — bit-identical on
    any engine.  Plan: ONE grouped aggregate pass + a 1-row pooled
    broadcast; group count is bounded (experiment arms).

    Returns one row per group: ``(group, n, mean_y_e4, mean_cuped_e4)``
    plus the pooled ``theta_e6`` and ``var_reduction_e6`` (= ρ²×10⁶)
    repeated on each row for context.
    """
    ys = F.round(F.col(y_col).cast("double") * scale).cast("long")
    xs = F.round(F.col(x_col).cast("double") * scale).cast("long")
    base = df.select(F.col(group_col).alias("g"), ys.alias("y"), xs.alias("x"))
    dec = "decimal(38,0)"
    per_g = base.groupBy("g").agg(
        F.count("*").cast("long").alias("n_g"),
        F.sum("y").cast(dec).alias("sy_g"),
        F.sum("x").cast(dec).alias("sx_g"),
    )
    pooled = base.agg(
        F.count("*").cast(dec).alias("n"),
        F.sum("y").cast(dec).alias("sy"),
        F.sum("x").cast(dec).alias("sx"),
        F.sum((F.col("x") * F.col("x")).cast(dec)).alias("sxx"),
        F.sum((F.col("x") * F.col("y")).cast(dec)).alias("sxy"),
        F.sum((F.col("y") * F.col("y")).cast(dec)).alias("syy"),
    )
    cov_num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    varx_num = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vary_num = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    theta = cov_num / varx_num
    rho2 = cov_num * cov_num / (varx_num * vary_num)
    mean_y = F.col("sy_g").cast("double") / (
        F.col("n_g").cast("double") * F.lit(float(scale))
    )
    mean_x_g = F.col("sx_g").cast("double") / (
        F.col("n_g").cast("double") * F.lit(float(scale))
    )
    mean_x = F.col("sx").cast("double") / (
        F.col("n").cast("double") * F.lit(float(scale))
    )
    return (
        per_g.crossJoin(F.broadcast(pooled))
        .select(
            F.col("g").alias(group_col),
            F.col("n_g").alias("n"),
            F.round(mean_y * 1e4).cast("long").alias("mean_y_e4"),
            F.round((mean_y - theta * (mean_x_g - mean_x)) * 1e4)
            .cast("long")
            .alias("mean_cuped_e4"),
            F.round(theta * 1e6).cast("long").alias("theta_e6"),
            F.round(rho2 * 1e6).cast("long").alias("var_reduction_e6"),
        )
    )


def logistic_fit(
    df: DataFrame,
    y_col: str,
    feature_cols: list[str],
    *,
    iterations: int = 8,
    ridge: float = 1e-8,
) -> DataFrame:
    """Binary logistic regression by distributed Newton-Raphson (IRLS) —
    the standard classifier/propensity/quality-filter fit:

        β ← β − H⁻¹ g,   g = Xᵀ(σ(Xβ) − y)/n,
        H = Xᵀ diag(σ(1−σ)) X / n  (+ ridge·I for conditioning)

    Each iteration is ONE distributed aggregate producing the (d+1)
    gradient and (d+1)² Hessian moments (d = #features, bounded by
    contract — the collect is O(d²), never O(rows)); the tiny solve runs
    on the driver, exactly the bounded-state pattern of the IVF/PCA
    trainers.  Features standardize internally for conditioning;
    reported coefficients are rescaled to the ORIGINAL units.  Newton
    converges quadratically — 8 iterations reach float precision on
    anything separable-ish.

    Returns one row per term (``__intercept__`` + each feature):
    ``(term, coef, std_coef)`` plus the final train ``log_loss`` and
    ``n`` repeated per row.
    """
    import numpy as np

    d = len(feature_cols)
    stats = df.agg(
        F.count("*").alias("n"),
        *[F.avg(F.col(c).cast("double")).alias(f"m{j}")
          for j, c in enumerate(feature_cols)],
        *[F.stddev_pop(F.col(c).cast("double")).alias(f"s{j}")
          for j, c in enumerate(feature_cols)],
    ).first()
    n = stats["n"]
    mu = np.array([stats[f"m{j}"] for j in range(d)])
    sd = np.array([stats[f"s{j}"] or 1.0 for j in range(d)])
    sd[sd == 0] = 1.0

    xs = [
        ((F.col(c).cast("double") - float(mu[j])) / float(sd[j])).alias(f"x{j}")
        for j, c in enumerate(feature_cols)
    ]
    base = df.select(F.col(y_col).cast("double").alias("y"), *xs)
    base = base.localCheckpoint(eager=True)

    beta = np.zeros(d + 1)  # [intercept, std-features...]
    for _ in range(iterations):
        z = F.lit(float(beta[0]))
        for j in range(d):
            z = z + F.lit(float(beta[j + 1])) * F.col(f"x{j}")
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        w = (p * (F.lit(1.0) - p)).alias("w")
        cols = [F.lit(1.0).alias("x_0")] + [
            F.col(f"x{j}").alias(f"x_{j + 1}") for j in range(d)
        ]
        aggs = []
        for a in range(d + 1):
            aggs.append(F.sum((p - F.col("y")) * cols[a]).alias(f"g{a}"))
            for b in range(a, d + 1):
                aggs.append(F.sum(w * cols[a] * cols[b]).alias(f"h{a}_{b}"))
        row = base.agg(*aggs).first()
        g = np.array([row[f"g{a}"] for a in range(d + 1)]) / n
        H = np.zeros((d + 1, d + 1))
        for a in range(d + 1):
            for b in range(a, d + 1):
                H[a, b] = H[b, a] = row[f"h{a}_{b}"] / n
        H += ridge * np.eye(d + 1)
        beta = beta - np.linalg.solve(H, g)

    z = F.lit(float(beta[0]))
    for j in range(d):
        z = z + F.lit(float(beta[j + 1])) * F.col(f"x{j}")
    eps = 1e-12
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    loss_row = base.agg(
        F.avg(
            -(
                F.col("y") * F.log(F.greatest(p, F.lit(eps)))
                + (F.lit(1.0) - F.col("y"))
                * F.log(F.greatest(F.lit(1.0) - p, F.lit(eps)))
            )
        ).alias("ll")
    ).first()
    # rescale standardized coefficients to original units
    coefs = beta[1:] / sd
    intercept = float(beta[0] - np.sum(beta[1:] * mu / sd))
    spark = df.sparkSession
    rows = [("__intercept__", intercept, float(beta[0]))] + [
        (c, float(coefs[j]), float(beta[j + 1]))
        for j, c in enumerate(feature_cols)
    ]
    out = spark.createDataFrame(rows, "term string, coef double, std_coef double")
    return out.select(
        "term",
        F.round("coef", 8).alias("coef"),
        F.round("std_coef", 8).alias("std_coef"),
        F.lit(round(float(loss_row["ll"]), 8)).alias("log_loss"),
        F.lit(int(n)).alias("n"),
    )


def rolling_corr(
    df: DataFrame,
    ts_col: str,
    x_col: str,
    y_col: str,
    *,
    window: int = 30,
    min_periods: int = 10,
    scale: int = 100,
) -> DataFrame:
    """Rolling Pearson correlation between two aligned series — the
    co-movement monitor (metric A vs metric B over a trailing window).

    Exactness: both series pre-round to integer ``scale`` units and the
    window carries the six raw integer moments (n, Σx, Σy, Σxy, Σx²,
    Σy²); the correlation is then ONE closed-form double expression per
    row — no Welford-style running state whose accumulation order an
    engine could choose differently.  Rows with fewer than
    ``min_periods`` observations yield null.

    One ordered window pass (the input must already be one row per
    ``ts_col``; the caller aggregates to the grid first — windows over a
    time grid are calendar-bounded, the `mom_change` allowlist shape).

    Returns ``(ts, n_window, corr_e6)``.
    """
    from pyspark.sql import Window

    xs = F.round(F.col(x_col).cast("double") * scale).cast("long")
    ys = F.round(F.col(y_col).cast("double") * scale).cast("long")
    base = df.select(F.col(ts_col).alias("t"), xs.alias("x"), ys.alias("y"))
    w = Window.orderBy("t").rowsBetween(-(window - 1), 0)
    n = F.count("*").over(w)
    sx = F.sum("x").over(w)
    sy = F.sum("y").over(w)
    sxy = F.sum(F.col("x") * F.col("y")).over(w)
    sxx = F.sum(F.col("x") * F.col("x")).over(w)
    syy = F.sum(F.col("y") * F.col("y")).over(w)
    num = (n * sxy - sx * sy).cast("double")
    den = F.sqrt((n * sxx - sx * sx).cast("double")) * F.sqrt(
        (n * syy - sy * sy).cast("double")
    )
    corr = F.when((n >= min_periods) & (den > 0), num / den)
    return base.select(
        F.col("t").alias(ts_col),
        n.cast("long").alias("n_window"),
        F.round(corr * 1e6).cast("long").alias("corr_e6"),
    )


def diff_in_diff(
    df: DataFrame,
    y_col: str,
    treat_col: str,
    post_col: str,
    *,
    scale: int = 100,
) -> DataFrame:
    """Difference-in-differences estimator — the workhorse quasi-
    experimental effect measure:

        DiD = (ȳ_treat,post − ȳ_treat,pre) − (ȳ_ctrl,post − ȳ_ctrl,pre)

    with the classical large-sample standard error
    ``SE² = Σ_cells s²_c/n_c`` over the four (treat × post) cells.

    ONE conditional aggregate produces all four cells' integer moment
    sums (y pre-rounds to ``scale`` units), so every reported number is
    a fixed arithmetic expression over exact integers — one division per
    mean/variance, explicit four-term adds (no engine-ordered float
    accumulation), IEEE sqrt for the SE.  Returns one row: per-cell
    means (e4), ``did_e4``, ``se_e4`` and ``t_e4 = DiD/SE``.
    """
    ys = F.round(F.col(y_col).cast("double") * scale).cast("long")
    t = F.col(treat_col).cast("int")
    p = F.col(post_col).cast("int")
    base = df.select(ys.alias("y"), t.alias("t"), p.alias("p"))
    aggs = []
    for ti in (0, 1):
        for pi in (0, 1):
            cell = (F.col("t") == ti) & (F.col("p") == pi)
            tag = f"{ti}{pi}"
            aggs += [
                F.count(F.when(cell, 1)).alias(f"n{tag}"),
                F.sum(F.when(cell, F.col("y"))).alias(f"s{tag}"),
                # y² sums overflow int64 at corpus scale: exact DECIMAL
                F.sum(
                    F.when(cell, (F.col("y") * F.lit(1)).cast("decimal(38,0)")
                           * F.col("y"))
                ).alias(f"q{tag}"),
            ]
    wide = df.sparkSession.createDataFrame([(1,)], "one int").crossJoin(
        F.broadcast(base.agg(*aggs))
    ).drop("one")

    def mean(tag):
        return F.col(f"s{tag}").cast("double") / (
            F.col(f"n{tag}").cast("double") * F.lit(float(scale))
        )

    def var_over_n(tag):
        n = F.col(f"n{tag}").cast("double")
        s = F.col(f"s{tag}").cast("double")
        q = F.col(f"q{tag}").cast("double")
        # s²/n = (Σy² − (Σy)²/n)/(n−1)/n in value units (÷ scale²)
        return (q - s * s / n) / (n - F.lit(1.0)) / n / F.lit(float(scale * scale))

    did = (mean("11") - mean("10")) - (mean("01") - mean("00"))
    se = F.sqrt(
        var_over_n("00") + var_over_n("01") + var_over_n("10") + var_over_n("11")
    )
    e4 = lambda c: F.round(c * 1e4).cast("long")  # noqa: E731
    return wide.select(
        F.col("n00").cast("long").alias("n_ctrl_pre"),
        F.col("n01").cast("long").alias("n_ctrl_post"),
        F.col("n10").cast("long").alias("n_treat_pre"),
        F.col("n11").cast("long").alias("n_treat_post"),
        e4(mean("00")).alias("mean_ctrl_pre_e4"),
        e4(mean("01")).alias("mean_ctrl_post_e4"),
        e4(mean("10")).alias("mean_treat_pre_e4"),
        e4(mean("11")).alias("mean_treat_post_e4"),
        e4(did).alias("did_e4"),
        e4(se).alias("se_e4"),
        e4(did / se).alias("t_e4"),
    )


def decision_stump(
    df: DataFrame,
    *,
    feature_col: str,
    label_col: str,
    bin_width: float,
) -> DataFrame:
    """Exact one-split decision tree (CART stump) by Gini impurity over a
    histogram of the feature — the distributed tree-learning primitive:
    bin, histogram, prefix-scan, argmin.  This is exactly how XGBoost /
    LightGBM / Spark MLlib pick splits at scale (histogram-based split
    finding), expressed relationally.

    One pass bins ``feature_col`` into ``floor(x / bin_width)`` buckets
    (integer-keyed — no min/max pre-pass needed, unlike equal-width
    binning), one aggregate produces per-bin (n, n_pos), a window
    prefix-sum turns the histogram into left/right class counts for every
    candidate split, and the best split maximizes

        score = (posL² + negL²)/nL + (posR² + negR²)/nR

    (algebraically equivalent to minimizing weighted Gini impurity:
    n·(1−gini) = that sum).  Each term is one division of exact integer
    operands, so the score is bit-portable across engines.

    Plan: one shuffle to the bin histogram (map-side combined), then a
    single-partition window over ≤ n_bins rows (bounded — the histogram,
    not the data) and a 1-row argmin.  Returns 1 row:
    ``(split_bin, split_upper, n_left, pos_left, n_right, pos_right,
    score_e6)`` where ``split_upper`` = exclusive upper feature bound of
    the left side and rows with ``x < split_upper`` go left.
    """
    from pyspark.sql import Window

    binned = df.select(
        F.floor(F.col(feature_col) / F.lit(bin_width)).cast("long").alias("bin"),
        F.col(label_col).cast("long").alias("y"),
    )
    hist = binned.groupBy("bin").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("pos"),
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = hist.select(
        "bin",
        F.sum("n").over(w).alias("nl"),
        F.sum("pos").over(w).alias("posl"),
        F.sum("n").over(tot).alias("nt"),
        F.sum("pos").over(tot).alias("post"),
        F.max("bin").over(tot).alias("max_bin"),
    ).where(F.col("bin") < F.col("max_bin"))
    negl = F.col("nl") - F.col("posl")
    nr = F.col("nt") - F.col("nl")
    posr = F.col("post") - F.col("posl")
    negr = nr - posr
    scored = cum.select(
        "bin",
        F.col("nl").alias("n_left"),
        F.col("posl").alias("pos_left"),
        nr.alias("n_right"),
        posr.alias("pos_right"),
        (
            (F.col("posl") * F.col("posl") + negl * negl).cast("double")
            / F.col("nl").cast("double")
            + (posr * posr + negr * negr).cast("double") / nr.cast("double")
        ).alias("score"),
    )
    best = Window.orderBy(F.desc("score"), F.asc("bin"))
    return (
        scored.withColumn("rk", F.row_number().over(best))
        .where(F.col("rk") == 1)
        .select(
            F.col("bin").alias("split_bin"),
            ((F.col("bin") + 1) * F.lit(bin_width)).alias("split_upper"),
            "n_left",
            "pos_left",
            "n_right",
            "pos_right",
            F.round(F.col("score") * 1000000.0).cast("long").alias("score_e6"),
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


def ar_model(
    df: DataFrame,
    *,
    ts_col: str,
    value_col: str | None = None,
) -> DataFrame:
    """AR(2) autoregression fit over a regularly-indexed series — the
    classic Box–Jenkins building block, here as a closed-form
    least-squares solve expressed relationally (no iteration): regress
    the demeaned series on its first two lags.

    Exactness strategy: the series values are integer counts (or
    pre-quantized integers); demeaning subtracts the ROUNDED mean
    (``round(S/n)`` — one portable integer division), keeping every
    residual an exact integer.  The 2×2 normal equations then involve
    only integer sums of products; Cramer's rule gives
    ``φ₁ = (Σz₂²·Σz₁z − Σz₁z₂·Σz₂z) / det`` with integer numerator and
    determinant, emitted as ``round(1e6·num/det)`` — numerator and
    denominator are each exact in a double (≪ 2⁵³ at the demeaned
    scale), and one IEEE division + round is bit-identical across
    engines.

    Plan: one keyed aggregate to the per-step table, a 1-row mean
    scalar, two lag windows over the bounded step grid (calendar-bounded
    — the ``mom_change`` contract), one 1-row moment combine.  Returns
    1 row ``(n_obs, mean_y, phi1_e6, phi2_e6)``.
    """
    from pyspark.sql import Window

    val = (
        F.col(value_col) if value_col is not None else F.lit(1)
    )
    per_t = df.groupBy(F.col(ts_col).alias("t")).agg(
        F.sum(val).cast("long").alias("y")
    )
    mean_row = per_t.agg(
        F.round(F.sum("y").cast("double") / F.count("*").cast("double"))
        .cast("long")
        .alias("ybar"),
        F.count("*").cast("long").alias("n_steps"),
    )
    w = Window.orderBy("t")
    lagged = (
        per_t.crossJoin(F.broadcast(mean_row))
        .select(
            "t",
            "ybar",
            "n_steps",
            (F.col("y") - F.col("ybar")).alias("z"),
            (F.lag("y", 1).over(w) - F.col("ybar")).alias("z1"),
            (F.lag("y", 2).over(w) - F.col("ybar")).alias("z2"),
        )
        .where(F.col("z2").isNotNull())
    )
    m = lagged.agg(
        F.count("*").cast("long").alias("n_obs"),
        F.max("ybar").alias("mean_y"),
        F.sum(F.col("z1") * F.col("z1")).cast("long").alias("a"),
        F.sum(F.col("z1") * F.col("z2")).cast("long").alias("b"),
        F.sum(F.col("z2") * F.col("z2")).cast("long").alias("c"),
        F.sum(F.col("z1") * F.col("z")).cast("long").alias("e"),
        F.sum(F.col("z2") * F.col("z")).cast("long").alias("f"),
    )
    deti = F.col("a") * F.col("c") - F.col("b") * F.col("b")
    det = deti.cast("double")
    num1 = (F.col("c") * F.col("e") - F.col("b") * F.col("f")).cast("double")
    num2 = (F.col("a") * F.col("f") - F.col("b") * F.col("e")).cast("double")
    # singular normal equations (collinear lags) -> NULL coefficients
    return m.select(
        "n_obs",
        "mean_y",
        F.when(deti != 0, F.round(num1 * 1e6 / det).cast("long")).alias(
            "phi1_e6"
        ),
        F.when(deti != 0, F.round(num2 * 1e6 / det).cast("long")).alias(
            "phi2_e6"
        ),
    )


def burst_detect(
    df: DataFrame,
    *,
    key_col: str,
    ts_col: str,
    window_rows: int = 7,
    num: int = 2,
    den: int = 1,
) -> DataFrame:
    """Burst detection over per-key event-rate series (the practical
    core of Kleinberg's burst model, without the HMM): a step is
    BURSTING when its count exceeds ``num/den`` × its trailing
    ``window_rows``-step average, tested by integer cross-multiplication
    (``cnt·w·den > num·trail_sum``) — no float rate ever materializes,
    so the flag is exact on any engine.

    One (key, step) aggregate, one key-partitioned trailing window
    (parallel across keys — no global ordering).  Emits only the
    bursting steps: ``(key, t, cnt, trail_sum, trail_n,
    intensity_e6 = round(1e6·cnt·trail_n / trail_sum))``.
    """
    from pyspark.sql import Window

    per_t = df.groupBy(
        F.col(key_col).alias("key"), F.col(ts_col).alias("t")
    ).agg(F.count("*").cast("long").alias("cnt"))
    w = Window.partitionBy("key").orderBy("t").rowsBetween(-window_rows, -1)
    trail = per_t.select(
        "key",
        "t",
        "cnt",
        F.sum("cnt").over(w).cast("long").alias("trail_sum"),
        F.count("cnt").over(w).cast("long").alias("trail_n"),
    ).where(F.col("trail_n") == window_rows)
    return (
        trail.where(
            F.col("cnt") * F.lit(window_rows) * F.lit(den)
            > F.lit(num) * F.col("trail_sum")
        )
        .select(
            "key",
            "t",
            "cnt",
            "trail_sum",
            "trail_n",
            F.round(
                (F.col("cnt") * F.col("trail_n")).cast("double")
                * 1e6
                / F.col("trail_sum").cast("double")
            )
            .cast("long")
            .alias("intensity_e6"),
        )
        .orderBy("key", "t")
    )


def decision_tree_depth2(
    df: DataFrame,
    *,
    feature_a: str,
    feature_b: str,
    label_col: str,
    bin_width_a: float,
    bin_width_b: float,
) -> DataFrame:
    """Exact depth-2 decision tree by histogram split-finding — the
    recursive step :func:`decision_stump` stops short of: the root
    splits on ``feature_a``, then EACH side independently finds its best
    ``feature_b`` split, exactly how distributed GBDT libraries grow
    level-wise trees from one 2-D histogram.

    One shuffle builds the (bin_a, bin_b) → (n, n_pos) histogram; the
    root's candidates come from marginalizing over bin_b, the children's
    from conditioning on the chosen side — all on the bounded histogram
    table (single-partition windows over ≤ n_bins rows, never the data).
    The split score is the same integer-exact Gini form as the stump
    (``(pos²+neg²)/n`` summed over the two halves, one IEEE division per
    term), so the whole tree is bit-portable.

    Returns 3 rows ordered L, R, root:
    ``(node, split_col, split_bin, split_upper, n_left, pos_left,
    n_right, pos_right, score_e6)``.
    """
    from pyspark.sql import Window

    binned = df.select(
        F.floor(F.col(feature_a) / F.lit(bin_width_a)).cast("long").alias("ba"),
        F.floor(F.col(feature_b) / F.lit(bin_width_b)).cast("long").alias("bb"),
        F.col(label_col).cast("long").alias("y"),
    )
    # the 2-D histogram is the only pass over the data; pin it so the
    # root/children stages (which each reference it) don't re-scan
    hist2 = binned.groupBy("ba", "bb").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("pos"),
    ).localCheckpoint(eager=True)

    def _best_split(hist, bin_col, part_cols):
        """Argmin split over a (part, bin) histogram: per-partition
        prefix window + score + rank-1 pick.  `part_cols` empty = root."""
        part = [F.col(c) for c in part_cols]
        w = (
            Window.partitionBy(*part)
            .orderBy(bin_col)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        tot = (
            Window.partitionBy(*part)
            .orderBy(bin_col)
            .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        )
        cum = hist.select(
            *part_cols,
            F.col(bin_col).alias("bin"),
            F.sum("n").over(w).alias("nl"),
            F.sum("pos").over(w).alias("posl"),
            F.sum("n").over(tot).alias("nt"),
            F.sum("pos").over(tot).alias("post"),
            F.max(bin_col).over(tot).alias("max_bin"),
        ).where(F.col("bin") < F.col("max_bin"))
        negl = F.col("nl") - F.col("posl")
        nr = F.col("nt") - F.col("nl")
        posr = F.col("post") - F.col("posl")
        negr = nr - posr
        scored = cum.select(
            *part_cols,
            "bin",
            F.col("nl").alias("n_left"),
            F.col("posl").alias("pos_left"),
            nr.alias("n_right"),
            posr.alias("pos_right"),
            (
                (F.col("posl") * F.col("posl") + negl * negl).cast("double")
                / F.col("nl").cast("double")
                + (posr * posr + negr * negr).cast("double")
                / nr.cast("double")
            ).alias("score"),
        )
        best = Window.partitionBy(*part).orderBy(
            F.desc("score"), F.asc("bin")
        )
        return (
            scored.withColumn("rk", F.row_number().over(best))
            .where(F.col("rk") == 1)
            .drop("rk")
        )

    hist_a = hist2.groupBy("ba").agg(
        F.sum("n").cast("long").alias("n"), F.sum("pos").cast("long").alias("pos")
    )
    root = _best_split(hist_a, "ba", []).select(
        F.lit("root").alias("node"),
        F.lit(feature_a).alias("split_col"),
        F.col("bin").alias("split_bin"),
        ((F.col("bin") + 1) * F.lit(bin_width_a)).alias("split_upper"),
        "n_left",
        "pos_left",
        "n_right",
        "pos_right",
        F.round(F.col("score") * 1e6).cast("long").alias("score_e6"),
    )
    sided = (
        hist2.crossJoin(
            F.broadcast(root.select(F.col("split_bin").alias("root_bin")))
        )
        .select(
            F.when(F.col("ba") <= F.col("root_bin"), F.lit("L"))
            .otherwise(F.lit("R"))
            .alias("node"),
            "bb",
            "n",
            "pos",
        )
        .groupBy("node", "bb")
        .agg(F.sum("n").cast("long").alias("n"), F.sum("pos").cast("long").alias("pos"))
    )
    children = _best_split(sided, "bb", ["node"]).select(
        "node",
        F.lit(feature_b).alias("split_col"),
        F.col("bin").alias("split_bin"),
        ((F.col("bin") + 1) * F.lit(bin_width_b)).alias("split_upper"),
        "n_left",
        "pos_left",
        "n_right",
        "pos_right",
        F.round(F.col("score") * 1e6).cast("long").alias("score_e6"),
    )
    return root.unionByName(children).orderBy("node")


def cross_correlation(
    series_a: DataFrame,
    series_b: DataFrame,
    *,
    ts_col: str = "day",
    val_col: str = "v",
    max_lag: int = 7,
) -> DataFrame:
    """Lead-lag cross-correlation between two daily integer series:
    Pearson r between ``a(t)`` and ``b(t + lag)`` for every lag in
    ``[-max_lag, +max_lag]``, over the days where both sides exist.
    Positive-lag peaks mean A leads B — the standard "does signups
    activity predict purchases next week?" diagnostic.

    Shape: the (2·max_lag+1)-row lag table broadcasts against series A
    (bounded fan-out), one equi-join shuffle aligns B at ``t + lag``,
    and one grouped aggregate per lag collects the exact DECIMAL
    moments; r is computed from them with IEEE sqrt (correctly rounded,
    engine-portable) and one final division.

    Returns ``(lag, n_days, r_e6)`` for lags with enough overlap to
    define r (ties/degenerate variance yield NULL r).
    """
    spark = series_a.sparkSession
    lags = spark.range(-max_lag, max_lag + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    a = series_a.select(
        F.col(ts_col).alias("da"), F.col(val_col).cast("long").alias("xa")
    )
    b = series_b.select(
        F.col(ts_col).alias("db"), F.col(val_col).cast("long").alias("xb")
    )
    fanned = a.crossJoin(F.broadcast(lags)).withColumn(
        "db", F.date_add(F.col("da"), F.col("lag"))
    )
    paired = fanned.join(b, "db")
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = paired.groupBy("lag").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(dec("xa")).alias("sa"),
        F.sum(dec("xb")).alias("sb"),
        F.sum(dec("xa") * dec("xb")).alias("sab"),
        F.sum(dec("xa") * dec("xa")).alias("saa"),
        F.sum(dec("xb") * dec("xb")).alias("sbb"),
    )
    n = F.col("n").cast("decimal(38,0)")
    cov = (n * F.col("sab") - F.col("sa") * F.col("sb")).cast("double")
    var_a = (n * F.col("saa") - F.col("sa") * F.col("sa")).cast("double")
    var_b = (n * F.col("sbb") - F.col("sb") * F.col("sb")).cast("double")
    r = cov / (F.sqrt(var_a) * F.sqrt(var_b))
    return (
        m.select(
            "lag",
            F.col("n").alias("n_days"),
            F.when(
                (F.col("n") >= 3) & (var_a > 0) & (var_b > 0),
                F.round(r * 1000000).cast("long"),
            ).alias("r_e6"),
        )
        .orderBy("lag")
    )


def covariate_balance(
    df: DataFrame,
    treat_col: str,
    covariates: list[str],
    *,
    smd_flag_e6: int = 100000,
) -> DataFrame:
    """Covariate balance table for an experiment or observational
    comparison: per covariate, group means and the standardized mean
    difference ``(mean_t − mean_c) / sqrt((var_t + var_c) / 2)`` —
    the pre-test every CUPED/diff-in-diff readout should publish
    (|SMD| > 0.1 is the conventional imbalance flag).

    One grouped aggregate collects exact DECIMAL moments for every
    covariate in a single scan (no per-covariate job); the 2-row combine
    uses IEEE sqrt and a fixed division order so the floats are
    engine-portable.  Covariates must be integer-valued (pre-scale
    currency to cents upstream).

    Returns ``(covariate, n_t, n_c, mean_t_e6, mean_c_e6, smd_e6,
    imbalanced)`` ordered by covariate name.
    """
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    aggs = [F.count("*").cast("long").alias("n")]
    for c in covariates:
        aggs += [
            F.sum(dec(F.col(c))).alias(f"s_{c}"),
            F.sum(dec(F.col(c)) * dec(F.col(c))).alias(f"ss_{c}"),
        ]
    two = df.groupBy(F.col(treat_col).cast("int").alias("t")).agg(*aggs)
    t = two.where("t = 1").alias("t")
    c_ = two.where("t = 0").alias("c")
    pair = t.crossJoin(c_)
    rows = []
    for c in covariates:
        nt = F.col("t.n").cast("decimal(38,0)")
        nc = F.col("c.n").cast("decimal(38,0)")
        st, sst = F.col(f"t.s_{c}"), F.col(f"t.ss_{c}")
        sc, ssc = F.col(f"c.s_{c}"), F.col(f"c.ss_{c}")
        mean_t = st.cast("double") / nt.cast("double")
        mean_c = sc.cast("double") / nc.cast("double")
        var_t = (nt * sst - st * st).cast("double") / (
            nt * (nt - F.lit(1).cast("decimal(38,0)"))
        ).cast("double")
        var_c = (nc * ssc - sc * sc).cast("double") / (
            nc * (nc - F.lit(1).cast("decimal(38,0)"))
        ).cast("double")
        pooled = (var_t + var_c) / F.lit(2.0)
        # CASE short-circuits: the division only runs when pooled > 0, so
        # a constant covariate yields NULL SMD instead of an ANSI error.
        smd_e6 = F.when(
            pooled > 0,
            F.round((mean_t - mean_c) / F.sqrt(pooled) * 1000000).cast(
                "long"
            ),
        )
        rows.append(
            F.struct(
                F.lit(c).alias("covariate"),
                F.col("t.n").alias("n_t"),
                F.col("c.n").alias("n_c"),
                F.round(mean_t * 1000000).cast("long").alias("mean_t_e6"),
                F.round(mean_c * 1000000).cast("long").alias("mean_c_e6"),
                smd_e6.alias("smd_e6"),
                (F.abs(smd_e6) > smd_flag_e6).cast("int").alias(
                    "imbalanced"
                ),
            )
        )
    return (
        pair.select(F.explode(F.array(*rows)).alias("r"))
        .select("r.*")
        .orderBy("covariate")
    )


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


def lorenz_curve(
    df: DataFrame,
    value_col: str,
    id_col: str,
    *,
    n_buckets: int = 10,
) -> DataFrame:
    """Lorenz curve in deciles: units ranked ascending by value, the
    cumulative share of total value held by each decile — the curve the
    Gini coefficient summarizes, kept as assertable points.

    ``ntile`` over (value, id) is deterministic (the id tiebreak makes
    the order total); shares are exact integer cumulative sums with one
    final division per row.  The global ntile is a single-partition sort
    of the PRE-AGGREGATED unit table — exactness choice; when the unit
    table itself is huge, bin by broadcast percentile cutpoints instead
    (``quality.equi_depth_histogram``) and accept approximate decile
    edges.

    Returns ``(bucket, n_units, bucket_value, cum_share_e6)``.
    """
    v = F.col(value_col).cast("long")
    ranked = df.select(
        v.alias("v"),
        F.ntile(n_buckets)
        .over(W.orderBy(F.col(value_col), F.col(id_col)))
        .alias("bucket"),
    )
    per_b = ranked.groupBy("bucket").agg(
        F.count("*").cast("long").alias("n_units"),
        F.sum(F.col("v").cast("decimal(38,0)")).alias("bv"),
    )
    wb = W.orderBy("bucket")
    total = F.sum("bv").over(
        wb.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    cum = F.sum("bv").over(wb.rowsBetween(W.unboundedPreceding, W.currentRow))
    return per_b.select(
        "bucket",
        "n_units",
        F.col("bv").cast("long").alias("bucket_value"),
        F.round(cum.cast("double") / total.cast("double") * 1000000)
        .cast("long")
        .alias("cum_share_e6"),
    ).orderBy("bucket")


def brier_decomposition(
    df: DataFrame,
    prob_col: str,
    label_col: str,
    *,
    n_bins: int = 10,
) -> DataFrame:
    """Murphy decomposition of the Brier score — reliability (calibration
    gap), resolution (how much the forecast separates outcomes) and
    outcome uncertainty: ``Brier ≈ REL − RES + UNC``.  The companion
    number set to the ``ece``/``calibration`` queries.

    Exactness: probabilities quantize to e6 ints, so the Brier sum and
    every per-bin squared term are exact DECIMAL integers; each reported
    number is its integer sum through ONE final division (per-bin terms
    pre-rounded to integers first — the order-free-sum contract).

    Returns one row ``(n, n_bins_used, brier_e6, rel_e6, res_e6,
    unc_e6)``.
    """
    q = F.round(F.col(prob_col) * 1000000).cast("long")
    y = F.col(label_col).cast("long")
    binned = df.select(
        q.alias("q"),
        y.alias("y"),
        F.least(
            F.floor(q / F.lit(1000000.0 / n_bins)).cast("int"),
            F.lit(n_bins - 1),
        ).alias("b"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    per_b = binned.groupBy("b").agg(
        F.count("*").cast("long").alias("n_b"),
        F.sum(dec(F.col("q"))).alias("sp"),
        F.sum(dec(F.col("y"))).alias("sy"),
        F.sum(
            dec(F.col("q") - F.col("y") * 1000000)
            * dec(F.col("q") - F.col("y") * 1000000)
        ).alias("sq_err"),
    )
    tot = per_b.agg(
        F.sum("n_b").cast("long").alias("n"),
        F.count("*").cast("long").alias("n_bins_used"),
        F.sum("sy").cast("decimal(38,0)").alias("sy_t"),
        F.sum("sq_err").cast("decimal(38,0)").alias("sq_err_t"),
    )
    # the reliability/resolution terms need a fixed evaluation order —
    # compute them as exact decimal numerators with one rounded division
    per = per_b.crossJoin(F.broadcast(tot))
    rel_t = F.round(
        (
            (dec(F.col("sp")) - dec(F.col("sy")) * 1000000)
            * (dec(F.col("sp")) - dec(F.col("sy")) * 1000000)
        ).cast("double")
        / (dec(F.col("n_b")) * 1000000).cast("double")
    ).cast("long")
    res_num = (
        dec(F.col("sy")) * dec(F.col("n"))
        - dec(F.col("sy_t")) * dec(F.col("n_b"))
    )
    res_t = F.round(
        (res_num * res_num * 1000000).cast("double")
        / (dec(F.col("n_b")) * dec(F.col("n")) * dec(F.col("n"))).cast(
            "double"
        )
    ).cast("long")
    summed = per.select(
        "n", "n_bins_used", "sy_t", "sq_err_t", rel_t.alias("rt"),
        res_t.alias("st"),
    ).groupBy("n", "n_bins_used", "sy_t", "sq_err_t").agg(
        F.sum("rt").cast("long").alias("rel_num"),
        F.sum("st").cast("long").alias("res_num"),
    )
    n = F.col("n").cast("decimal(38,0)")
    return summed.select(
        F.col("n"),
        "n_bins_used",
        F.round(
            F.col("sq_err_t").cast("double")
            / (n * 1000000).cast("double")
        )
        .cast("long")
        .alias("brier_e6"),
        F.round(
            F.col("rel_num").cast("double") / F.col("n").cast("double")
        )
        .cast("long")
        .alias("rel_e6"),
        F.round(
            F.col("res_num").cast("double") / F.col("n").cast("double")
        )
        .cast("long")
        .alias("res_e6"),
        F.round(
            (dec(F.col("sy_t")) * (n - dec(F.col("sy_t"))) * 1000000)
            .cast("double")
            / (n * n).cast("double")
        )
        .cast("long")
        .alias("unc_e6"),
    )


def trimmed_mean(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    *,
    trim_pct: int = 10,
    scale: int = 100,
) -> DataFrame:
    """Trimmed mean per group — the robust location estimate between
    median and mean: drop the lowest and highest ``trim_pct`` percent of
    rows (``floor(n·pct/100)`` each side, deterministic (value, id)
    order) and average the rest.

    Exact: values land as integer ``scale`` ticks, the kept-range sum is
    an exact integer, and the mean is ONE division.  One group-keyed
    window pass (rank + count), no global sort.

    Returns ``(group, n, n_trimmed_each_side, trimmed_mean_e6)`` in
    value units ×1e6.
    """
    ticks = F.round(F.col(value_col) * scale).cast("long")
    w = W.partitionBy(group_col).orderBy(F.col(value_col), F.col(id_col))
    full = W.partitionBy(group_col)
    ranked = df.select(
        F.col(group_col).alias("g"),
        ticks.alias("v"),
        F.row_number().over(w).alias("rn"),
        F.count("*").over(full).alias("n"),
    ).withColumn(
        "k", F.floor(F.col("n") * trim_pct / 100).cast("long")
    )
    kept = ranked.where(
        (F.col("rn") > F.col("k")) & (F.col("rn") <= F.col("n") - F.col("k"))
    )
    return (
        kept.groupBy(F.col("g").alias(group_col), "n", "k")
        .agg(
            F.sum(F.col("v").cast("decimal(38,0)")).alias("s"),
            F.count("*").cast("long").alias("n_kept"),
        )
        .select(
            group_col,
            F.col("n").cast("long").alias("n"),
            F.col("k").alias("n_trimmed_each_side"),
            F.round(
                F.col("s").cast("double")
                / F.col("n_kept").cast("double")
                / F.lit(float(scale))
                * 1000000
            )
            .cast("long")
            .alias("trimmed_mean_e6"),
        )
        .orderBy(group_col)
    )


def effect_sizes(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
    *,
    scale: int = 100,
) -> DataFrame:
    """Effect sizes for a two-cohort comparison — the numbers a test
    statistic doesn't give: Cohen's d (standardized mean difference,
    pooled SD) and Cliff's delta (the ordinal dominance probability
    ``P(a > b) − P(a < b)``, derived exactly from the same doubled-rank
    U statistic as :func:`mann_whitney_u`).

    d follows the exact-integer-moments + fixed-order IEEE contract
    (values in ``scale`` ticks); delta is the single integer division
    ``(2U − n_a·n_b) / (n_a·n_b)``.  Two scans (one for moments, the
    rank pass inside mann_whitney_u) and two 1-row combines.

    Returns one row ``(n_a, n_b, u2_a, cohens_d_e6, cliffs_delta_e6)``.
    """
    ticks = F.round(F.col(value_col) * scale).cast("long")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    two = df.where(F.col(group_col).isin(group_a, group_b)).select(
        (F.col(group_col) == group_a).cast("int").alias("is_a"),
        ticks.alias("v"),
    )
    m = two.groupBy("is_a").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(dec(F.col("v"))).alias("s"),
        F.sum(dec(F.col("v")) * dec(F.col("v"))).alias("ss"),
    )
    a = m.where("is_a = 1").alias("a")
    b = m.where("is_a = 0").alias("b")
    pair = a.crossJoin(b)
    na, nb = dec(F.col("a.n")), dec(F.col("b.n"))
    mean_a = F.col("a.s").cast("double") / na.cast("double")
    mean_b = F.col("b.s").cast("double") / nb.cast("double")
    var_a = (na * F.col("a.ss") - F.col("a.s") * F.col("a.s")).cast(
        "double"
    ) / (na * (na - 1)).cast("double")
    var_b = (nb * F.col("b.ss") - F.col("b.s") * F.col("b.s")).cast(
        "double"
    ) / (nb * (nb - 1)).cast("double")
    pooled = (
        (na - 1).cast("double") * var_a + (nb - 1).cast("double") * var_b
    ) / (na + nb - 2).cast("double")
    d_e6 = F.when(
        pooled > 0,
        F.round((mean_a - mean_b) / F.sqrt(pooled) * 1000000).cast("long"),
    )
    moments = pair.select(
        F.col("a.n").alias("n_a"),
        F.col("b.n").alias("n_b"),
        d_e6.alias("cohens_d_e6"),
    )
    mw = mann_whitney_u(df, group_col, value_col, group_a, group_b).select(
        F.col("u2_a")
    )
    nn = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    return moments.crossJoin(F.broadcast(mw)).select(
        "n_a",
        "n_b",
        "u2_a",
        "cohens_d_e6",
        F.round(
            (F.col("u2_a") - nn("n_a") * nn("n_b")).cast("double")
            / (nn("n_a") * nn("n_b")).cast("double")
            * 1000000
        )
        .cast("long")
        .alias("cliffs_delta_e6"),
    )


def pairwise_mean_diffs(
    df: DataFrame,
    group_col: str,
    value_col: str,
    *,
    scale: int = 100,
) -> DataFrame:
    """Tukey-style pairwise group comparison table — the post-hoc step
    after :func:`anova_oneway` rejects: every (group i < group j) pair
    with mean difference and its pooled-MSE standard error (the q-dist
    p-value belongs to the caller's stats library; the distributed part
    is the moments).

    One grouped moment scan (exact integer ticks), a bounded k-row
    self-join for the pairs (k = number of groups), pooled MSE from the
    same pass; every reported float is integer moments through a fixed
    division order + IEEE sqrt.

    Returns ``(group_a, group_b, n_a, n_b, diff_e6, se_e6)`` ordered by
    (group_a, group_b).
    """
    ticks = F.round(F.col(value_col) * scale).cast("long")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = df.select(F.col(group_col).alias("g"), ticks.alias("v")).groupBy(
        "g"
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(dec(F.col("v"))).alias("s"),
        F.sum(dec(F.col("v")) * dec(F.col("v"))).alias("ss"),
    )
    tot = m.agg(
        F.sum("n").cast("long").alias("nt"),
        F.count("*").cast("long").alias("k"),
        # within-group sum of squares: Σ_g (ss_g − s_g²/n_g); each term
        # one division, pre-summed in fixed double order is NOT safe —
        # keep each term and sum the rounded units instead.  Terms are
        # ~n·ticks² (≈3e18 per group at sf0.1/scale=100), so the SUM
        # runs in DECIMAL(38,0) — a long sum overflows 2⁶³ with a
        # handful of groups (caught by the r6 sf0.1 scale smoke)
        F.sum(
            F.round(
                (dec(F.col("n")) * F.col("ss") - F.col("s") * F.col("s"))
                .cast("double")
                / F.col("n").cast("double")
            ).cast("decimal(38,0)")
        )
        .cast("decimal(38,0)")
        .alias("ssw_x"),
    )
    a = m.alias("a")
    b = m.alias("b")
    pairs = a.crossJoin(b).where(F.col("a.g") < F.col("b.g"))
    out = pairs.crossJoin(F.broadcast(tot))
    mse = F.col("ssw_x").cast("double") / (
        F.col("nt") - F.col("k")
    ).cast("double")
    mean_a = F.col("a.s").cast("double") / F.col("a.n").cast("double")
    mean_b = F.col("b.s").cast("double") / F.col("b.n").cast("double")
    se = F.sqrt(
        mse
        * (
            F.lit(1.0) / F.col("a.n").cast("double")
            + F.lit(1.0) / F.col("b.n").cast("double")
        )
    )
    to_e6 = lambda c: F.round(c / scale * 1000000).cast("long")  # noqa: E731
    return out.select(
        F.col("a.g").alias("group_a"),
        F.col("b.g").alias("group_b"),
        F.col("a.n").alias("n_a"),
        F.col("b.n").alias("n_b"),
        to_e6(mean_a - mean_b).alias("diff_e6"),
        to_e6(se).alias("se_e6"),
    ).orderBy("group_a", "group_b")


def max_drawdown(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    scale: int = 100,
) -> DataFrame:
    """Maximum drawdown of the per-key cumulative daily series — the
    risk statistic behind "how far below its best was this metric": the
    largest peak-to-trough drop of the running total.

    Integer ticks, key-partitioned running sum + running max windows
    (one exchange), exact drawdowns; the trough day reported is the
    EARLIEST day attaining the max (deterministic).

    Returns ``(key, max_drawdown_c, trough_day, peak_c)`` where peak_c
    is the running-max value at that trough.
    """
    day = F.to_date(F.col(ts_col))
    daily = (
        df.select(
            F.col(key_col).alias("k"),
            day.alias("d"),
            F.round(F.col(value_col) * scale).cast("long").alias("v"),
        )
        .groupBy("k", "d")
        .agg(F.sum("v").alias("dv"))
    )
    w = W.partitionBy("k").orderBy("d")
    run = daily.select(
        "k",
        "d",
        F.sum("dv").over(w.rowsBetween(W.unboundedPreceding, 0)).alias("cum"),
    ).select(
        "k",
        "d",
        "cum",
        F.max("cum").over(w.rowsBetween(W.unboundedPreceding, 0)).alias("peak"),
    )
    dd = run.select(
        "k", "d", "peak", (F.col("peak") - F.col("cum")).alias("dd")
    )
    mx = dd.select(
        "k",
        "d",
        "peak",
        "dd",
        F.max("dd").over(W.partitionBy("k")).alias("mdd"),
    )
    return (
        mx.where(F.col("dd") == F.col("mdd"))
        .groupBy(F.col("k").alias(key_col), F.col("mdd").alias("max_drawdown_c"))
        .agg(
            F.min("d").alias("trough_day"),
            F.min_by("peak", "d").alias("peak_c"),
        )
        .select(key_col, "max_drawdown_c", "trough_day", "peak_c")
        .orderBy(key_col)
    )


def arc_elasticity(
    df: DataFrame,
    key_col: str,
    period_col: str,
    price_col: str,
    qty_col: str,
    period_a,
    period_b,
    *,
    scale: int = 100,
) -> DataFrame:
    """Arc price elasticity of demand per key between two periods — the
    midpoint formula ``((q₂−q₁)/(q₂+q₁)) / ((p₂−p₁)/(p₂+p₁))``, the
    log-free form (no ln — portable) every pricing team starts with.
    Price per period is the quantity-weighted average unit price.

    One grouped aggregate builds the two-period cells from exact integer
    ticks; the elasticity is a fixed chain of IEEE divisions over exact
    integers, NULL where a denominator degenerates (equal prices, zero
    quantity).

    Returns ``(key, q1, q2, p1_c, p2_c, elasticity_e6)``.
    """
    ticks = F.round(F.col(price_col) * scale).cast("long")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    per = (
        df.where(F.col(period_col).isin(period_a, period_b))
        .select(
            F.col(key_col).alias("k"),
            (F.col(period_col) == period_b).cast("int").alias("is2"),
            F.col(qty_col).cast("long").alias("q"),
            ticks.alias("pc"),
        )
        .groupBy("k")
        .agg(
            F.sum(F.when(F.col("is2") == 0, F.col("q")).otherwise(0))
            .cast("long")
            .alias("q1"),
            F.sum(F.when(F.col("is2") == 1, F.col("q")).otherwise(0))
            .cast("long")
            .alias("q2"),
            F.sum(
                F.when(F.col("is2") == 0, dec(F.col("pc")) * dec(F.col("q")))
                .otherwise(F.lit(0).cast("decimal(38,0)"))
            ).alias("pq1"),
            F.sum(
                F.when(F.col("is2") == 1, dec(F.col("pc")) * dec(F.col("q")))
                .otherwise(F.lit(0).cast("decimal(38,0)"))
            ).alias("pq2"),
        )
        .where((F.col("q1") > 0) & (F.col("q2") > 0))
    )
    p1 = F.col("pq1").cast("double") / F.col("q1").cast("double")
    p2 = F.col("pq2").cast("double") / F.col("q2").cast("double")
    qrel = (F.col("q2") - F.col("q1")).cast("double") / (
        F.col("q2") + F.col("q1")
    ).cast("double")
    prel = (p2 - p1) / (p2 + p1)
    return per.select(
        F.col("k").alias(key_col),
        "q1",
        "q2",
        F.round(p1).cast("long").alias("p1_c"),
        F.round(p2).cast("long").alias("p2_c"),
        F.when(
            (p2 - p1) != 0, F.round(qrel / prel * 1000000).cast("long")
        ).alias("elasticity_e6"),
    ).orderBy(key_col)


def uplift_by_decile(
    df: DataFrame,
    treat_col: str,
    score_col: str,
    outcome_col: str,
    id_col: str,
    *,
    n_buckets: int = 10,
) -> DataFrame:
    """Uplift (qini-style) table: units ranked by a targeting score into
    deciles, each decile's treatment-vs-control response-rate lift — the
    readout that says WHERE a treatment works, not just whether.

    Deterministic ntile over (score desc, id), exact integer response
    counts, two divisions per row in fixed order (rate_t, rate_c) and
    their difference — portable.

    Returns ``(bucket, n_t, n_c, resp_t, resp_c, uplift_e6)`` (NULL
    uplift when a cell is empty).
    """
    ranked = df.select(
        F.col(treat_col).cast("int").alias("t"),
        F.col(outcome_col).cast("long").alias("y"),
        F.ntile(n_buckets)
        .over(W.orderBy(F.desc(score_col), F.asc(id_col)))
        .alias("bucket"),
    )
    per = ranked.groupBy("bucket").agg(
        F.sum(F.when(F.col("t") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_t"),
        F.sum(F.when(F.col("t") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_c"),
        F.sum(F.when(F.col("t") == 1, F.col("y")).otherwise(0))
        .cast("long")
        .alias("resp_t"),
        F.sum(F.when(F.col("t") == 0, F.col("y")).otherwise(0))
        .cast("long")
        .alias("resp_c"),
    )
    rate_t = F.col("resp_t").cast("double") / F.col("n_t").cast("double")
    rate_c = F.col("resp_c").cast("double") / F.col("n_c").cast("double")
    return per.select(
        "bucket",
        "n_t",
        "n_c",
        "resp_t",
        "resp_c",
        F.when(
            (F.col("n_t") > 0) & (F.col("n_c") > 0),
            F.round((rate_t - rate_c) * 1000000).cast("long"),
        ).alias("uplift_e6"),
    ).orderBy("bucket")


def group_ablation(
    df: DataFrame,
    group_col: str,
    value_col: str,
    *,
    scale: int = 1000,
) -> DataFrame:
    """Leave-one-group-out ablation — the cheapest data-valuation
    signal: for each group (source, domain, shard), how much does the
    corpus-level mean of a metric move if the group is removed?
    ``delta = mean_without − mean_with`` > 0 means the group was
    DRAGGING the metric down.  One grouped moment pass + a 1-row total
    broadcast: the jackknife-by-groups identity ``mean_without =
    (S − s_g) / (N − n_g)`` needs no second scan.

    Returns ``(group, n, group_mean_e6, loo_mean_e6, delta_e6)`` ordered
    by delta desc (most-harmful group first), NULL loo for a group that
    is the whole corpus.
    """
    ticks = F.round(F.col(value_col) * scale).cast("long")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    per = df.select(F.col(group_col).alias("g"), ticks.alias("v")).groupBy(
        "g"
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(dec(F.col("v"))).alias("s"),
    )
    tot = per.agg(
        F.sum("n").cast("long").alias("nt"),
        F.sum("s").cast("decimal(38,0)").alias("st"),
    )
    out = per.crossJoin(F.broadcast(tot))
    e6 = lambda num, den: F.round(  # noqa: E731
        num.cast("double") / den.cast("double") / scale * 1000000
    ).cast("long")
    gmean = e6(F.col("s"), dec(F.col("n")))
    loo = F.when(
        F.col("nt") > F.col("n"),
        e6(
            dec(F.col("st")) - dec(F.col("s")),
            dec(F.col("nt")) - dec(F.col("n")),
        ),
    )
    full = e6(F.col("st"), dec(F.col("nt")))
    return out.select(
        F.col("g").alias(group_col),
        "n",
        gmean.alias("group_mean_e6"),
        loo.alias("loo_mean_e6"),
        (loo - full).alias("delta_e6"),
    ).orderBy(F.desc_nulls_last("delta_e6"), group_col)


def srm_check(
    df: DataFrame,
    unit_col: str,
    treat_col: str,
    *,
    chi2_crit_e6: int = 3_841_459,
) -> DataFrame:
    """Sample-ratio-mismatch guard for a 50/50 experiment — the first
    thing to check before reading ANY result: with an even split
    expected, the 1-df chi-square reduces to the exact rational
    ``(n_t − n_c)² / n``, so the statistic is one integer division and
    the flag compares against the 0.05 critical value (3.841…, inlined
    as an e6 literal).

    Returns one row ``(n_t, n_c, chi2_e6, srm_detected)``.
    """
    units = df.select(
        F.col(unit_col).alias("u"), F.col(treat_col).cast("int").alias("t")
    ).distinct()
    agg = units.agg(
        F.sum(F.when(F.col("t") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_t"),
        F.sum(F.when(F.col("t") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_c"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    diff = dec(F.col("n_t")) - dec(F.col("n_c"))
    n = dec(F.col("n_t")) + dec(F.col("n_c"))
    chi2 = F.round(
        (diff * diff * 1000000).cast("double") / n.cast("double")
    ).cast("long")
    return agg.select(
        "n_t",
        "n_c",
        chi2.alias("chi2_e6"),
        (chi2 > chi2_crit_e6).cast("int").alias("srm_detected"),
    )


# (z_{0.025} + z_{0.8})² for 95% confidence / 80% power, pre-rounded in
# Python so no engine ever evaluates a normal quantile
_POWER_K_E6 = 7_848_886


def power_analysis(
    df: DataFrame,
    group_col: str,
    value_col: str,
    *,
    rel_mde_e4: int = 200,
    scale: int = 100,
) -> DataFrame:
    """Two-sample test power analysis per segment: the units needed PER
    ARM to detect a ``rel_mde_e4``/1e4 relative lift of the segment mean
    at 95% confidence / 80% power — ``n = 2(z_{α/2}+z_β)²σ²/δ²`` with
    the z-constant pre-rounded into ``_POWER_K_E6`` (no engine-side
    normal quantile).

    Variance comes from exact integer-tick moments; the final expression
    is a fixed chain of IEEE ops, ceil'd to an integer sample size.

    Returns ``(group, n, mean_e6, var_e6, mde_e6, n_per_arm)``.
    """
    ticks = F.round(F.col(value_col) * scale).cast("long")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = df.select(F.col(group_col).alias("g"), ticks.alias("v")).groupBy(
        "g"
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(dec(F.col("v"))).alias("s"),
        F.sum(dec(F.col("v")) * dec(F.col("v"))).alias("ss"),
    )
    nn = dec(F.col("n"))
    mean_t = F.col("s").cast("double") / nn.cast("double")
    var_t = (nn * F.col("ss") - F.col("s") * F.col("s")).cast("double") / (
        nn * (nn - 1)
    ).cast("double")
    mde_t = mean_t * F.lit(float(rel_mde_e4)) / F.lit(10000.0)
    k = F.lit(_POWER_K_E6 / 1e6)
    n_req = F.ceil(
        F.lit(2.0) * k * var_t / (mde_t * mde_t)
    ).cast("long")
    e6 = lambda c: F.round(c / scale * 1000000).cast("long")  # noqa: E731
    return m.select(
        F.col("g").alias(group_col),
        "n",
        e6(mean_t).alias("mean_e6"),
        F.when(
            F.col("n") > 1,
            F.round(var_t / (scale * scale) * 1000000).cast("long"),
        ).alias("var_e6"),
        e6(mde_t).alias("mde_e6"),
        F.when((F.col("n") > 1) & (mde_t != 0), n_req).alias("n_per_arm"),
    ).orderBy(group_col)


def market_beta(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    scale: int = 100,
) -> DataFrame:
    """Per-key CAPM-style beta of each segment's series against the
    "market" (the sum of all segments at each grid point):

        β_k = cov(x_k, m) / var(m),   α_k = x̄_k − β_k·m̄

    Exactness: both series pre-round to integer ``scale`` ticks; each
    key carries five exact bigint moments (n, Σx, Σm, Σxm, Σmm); β and
    α are fixed closed-form double expressions over them.

    Plan shape (100 TB): one (key, bucket) aggregate, one bucket-keyed
    aggregate for the market series joined back broadcast (one row per
    grid bucket — calendar-bounded), then one per-key moment aggregate.
    No windows, no cartesian anything.

    Returns ``(key, n_obs, beta_e6, alpha_e4, corr_e6)``.
    """
    x = F.round(F.col(value_col).cast("double") * scale).cast("long")
    per = (
        df.select(F.col(key_col).alias("k"), F.col(ts_col).alias("t"), x.alias("x"))
        .groupBy("k", "t")
        .agg(F.sum("x").alias("x"))
    )
    market = per.groupBy("t").agg(F.sum("x").alias("m"))
    j = per.join(F.broadcast(market), "t")
    # second-order moments and their n·Σ cross terms run in
    # DECIMAL(38,0) — exact like bigint with headroom past int64
    # (n·Σm² alone passes 2⁶³ on ~2500-day grids; ANSI mode would make
    # that a query error, silent wraparound otherwise)
    xd = F.col("x").cast("decimal(19,0)")
    md = F.col("m").cast("decimal(19,0)")
    mom = j.groupBy("k").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("m").cast("long").alias("sm"),
        F.sum(xd * md).cast("decimal(38,0)").alias("sxm"),
        F.sum(md * md).cast("decimal(38,0)").alias("smm"),
        F.sum(xd * xd).cast("decimal(38,0)").alias("sxx"),
    )
    n = F.col("n")
    nd = n.cast("decimal(19,0)")
    sxd = F.col("sx").cast("decimal(19,0)")
    smd = F.col("sm").cast("decimal(19,0)")
    cov_n = (nd * F.col("sxm") - sxd * smd).cast("double")
    var_m = (nd * F.col("smm") - smd * smd).cast("double")
    var_x = (nd * F.col("sxx") - sxd * sxd).cast("double")
    beta = cov_n / var_m
    alpha = (
        F.col("sx").cast("double") / n.cast("double")
        - beta * (F.col("sm").cast("double") / n.cast("double"))
    ) / scale
    corr = cov_n / (F.sqrt(var_x) * F.sqrt(var_m))
    return mom.select(
        F.col("k").alias(key_col),
        n.alias("n_obs"),
        F.when(var_m > 0, F.round(beta * 1e6).cast("long")).alias("beta_e6"),
        F.when(var_m > 0, F.round(alpha * 1e4).cast("long")).alias("alpha_e4"),
        F.when(
            (var_m > 0) & (var_x > 0), F.round(corr * 1e6).cast("long")
        ).alias("corr_e6"),
    )


def sharpe_ratio(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    periods_per_year: int = 252,
    scale: int = 100,
) -> DataFrame:
    """Per-key Sharpe ratio of period-over-period returns (risk-free
    rate 0): mean(r)/sd(r) with sample sd, plus the √periods-per-year
    annualized variant.

    Exactness: each return ``(v_t − v_{t−1})/v_{t−1}`` is a single
    division of exact integer ticks, pre-rounded to integer e6 BEFORE
    aggregation (the ``seasonal_naive`` per-term contract) so the
    moment sums are order-free bigints; mean/sd/ratio are then fixed
    double expressions.  The lag pairing is a per-key ordered window —
    one shuffle on the key, reused by the moment aggregate.

    Returns ``(key, n_returns, mean_ret_e6, sd_ret_e6, sharpe_e4,
    sharpe_ann_e4)``.
    """
    x = F.round(F.col(value_col).cast("double") * scale).cast("long")
    base = df.select(
        F.col(key_col).alias("k"), F.col(ts_col).alias("t"), x.alias("x")
    )
    w = W.partitionBy("k").orderBy("t")
    prev = F.lag("x").over(w)
    r = F.round(
        (F.col("x") - prev).cast("double") / prev.cast("double") * 1e6
    ).cast("long")
    rets = base.select("k", prev.alias("p"), r.alias("r")).where(
        F.col("p").isNotNull() & (F.col("p") != 0)
    )
    # r can reach ~1e12 e6-units on near-zero denominators, so the
    # second moment runs in DECIMAL(38,0) — exact like bigint, headroom
    # past int64 (ANSI mode makes a long overflow a query error)
    rd = F.col("r").cast("decimal(19,0)")
    mom = rets.groupBy("k").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("r").cast("long").alias("s"),
        F.sum(rd * rd).cast("decimal(38,0)").alias("q"),
    )
    n = F.col("n")
    mean = F.col("s").cast("double") / n.cast("double")
    sd = F.sqrt(
        (
            n.cast("decimal(19,0)") * F.col("q")
            - (
                F.col("s").cast("decimal(19,0)")
                * F.col("s").cast("decimal(19,0)")
            )
        ).cast("double")
        / (n * (n - 1)).cast("double")
    )
    sharpe = mean / sd
    return mom.select(
        F.col("k").alias(key_col),
        n.alias("n_returns"),
        F.round(mean).cast("long").alias("mean_ret_e6"),
        F.when(n >= 2, F.round(sd).cast("long")).alias("sd_ret_e6"),
        F.when((n >= 2) & (sd > 0), F.round(sharpe * 1e4).cast("long")).alias(
            "sharpe_e4"
        ),
        F.when(
            (n >= 2) & (sd > 0),
            F.round(sharpe * F.sqrt(F.lit(float(periods_per_year))) * 1e4)
            .cast("long"),
        ).alias("sharpe_ann_e4"),
    )


def kruskal_wallis(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Kruskal–Wallis H (one-way ANOVA on ranks, k ≥ 2 groups) with the
    tie correction — the distribution-free companion to
    :func:`anova_oneway`, generalizing :func:`mann_whitney_u`.

    Ranking never sorts in one task (the mann_whitney contract): values
    collapse to the distinct-value table, global exclusive cumulative
    counts come from ``partitioned_cumsum``, and each group's DOUBLED
    rank sum ``R2_g = Σ_v n_gv·(2·cum_v + n_v + 1)`` stays in exact
    integer space.  Per-group terms ``R2_g²/(4·n_g)`` pre-round to
    integer e6 (DECIMAL square → one division) so the cross-group sum
    is order-free; H and the tie-corrected H' are then fixed double
    expressions over exact integers.

    Returns one row ``(n, k_groups, h_e6, h_adj_e6)``.
    """
    from smartpy_arc_spark.operators.scale import partitioned_cumsum

    base = df.select(
        F.col(group_col).alias("g"), F.col(value_col).alias("v")
    ).where(F.col("v").isNotNull() & F.col("g").isNotNull())
    vals = base.groupBy("v").agg(F.count("*").alias("n_v"))
    cum = partitioned_cumsum(vals, ["v"], ["n_v"], inclusive=False)
    d2 = 2 * F.col("cum_n_v").cast("long") + F.col("n_v") + 1
    cells = (
        base.groupBy("g", "v")
        .agg(F.count("*").alias("n_gv"))
        .join(cum.select("v", d2.alias("d2"), "n_v"), "v")
    )
    per_g = cells.groupBy("g").agg(
        F.sum("n_gv").cast("long").alias("n_g"),
        F.sum(F.col("n_gv") * F.col("d2")).cast("long").alias("r2"),
    )
    r2d = F.col("r2").cast("decimal(19,0)")
    # term values reach ~1e17 rank-units² at 10⁵ rows — pre-round to the
    # nearest INTEGER (relative error ~1e-17, far below the e6 output
    # precision) and carry them in DECIMAL(38,0), not int64
    term = F.round(
        (r2d * r2d).cast("double")
        / F.col("n_g").cast("double")
        / 4
    ).cast("decimal(38,0)")
    ties = vals.agg(
        F.sum(
            F.col("n_v").cast("long") * F.col("n_v") * F.col("n_v")
            - F.col("n_v")
        )
        .cast("long")
        .alias("tie_term")
    )
    combined = per_g.agg(
        F.sum("n_g").cast("long").alias("n"),
        F.count("*").cast("long").alias("k_groups"),
        F.sum(term).cast("decimal(38,0)").alias("t_sum"),
    ).crossJoin(F.broadcast(ties))
    n = F.col("n")
    h = (
        F.lit(12.0)
        * F.col("t_sum").cast("double")
        / (n * (n + 1)).cast("double")
        - F.lit(3.0) * (n + 1).cast("double")
    )
    c = F.lit(1.0) - F.col("tie_term").cast("double") / (
        n * n * n - n
    ).cast("double")
    return combined.select(
        "n",
        "k_groups",
        F.round(h * 1e6).cast("long").alias("h_e6"),
        F.when(c > 0, F.round(h / c * 1e6).cast("long")).alias("h_adj_e6"),
    )


def levene_bf(
    df: DataFrame, group_col: str, value_col: str, *, scale: int = 100
) -> DataFrame:
    """Brown–Forsythe (median-centered Levene) test of equal variances
    across k groups — the robust gate before trusting a pooled-variance
    ANOVA/t-test:

        W = ((N−k)/(k−1)) · SSB_z / SSW_z,   z_ij = |y_ij − med_j|

    Exactness: y pre-rounds to integer ``scale`` units; each group's
    median is an EXPLICIT order statistic (the lower median, rank
    ``(n+1) div 2`` — engine-selection conventions differ, an explicit
    integer rank rule does not, the ``quantile_normalize`` contract);
    z is then an exact integer, per-group ``Z1_g²/n_g`` terms pre-round
    to e6 (order-free integer sum), and W is one fixed double
    expression.  Second moments run in DECIMAL(38,0) (Σz² passes 2⁶³
    at ~10⁵ rows of 10⁷-unit deviations).

    Returns one row ``(n, k_groups, w_e6)``.
    """
    y = F.round(F.col(value_col).cast("double") * scale).cast("long")
    base = df.select(F.col(group_col).alias("g"), y.alias("y")).where(
        F.col("y").isNotNull() & F.col("g").isNotNull()
    )
    w_rank = W.partitionBy("g").orderBy("y")
    ranked = base.select(
        "g", "y", F.row_number().over(w_rank).alias("rk")
    )
    sizes = base.groupBy("g").agg(F.count("*").alias("n_g"))
    med = (
        ranked.join(F.broadcast(sizes), "g")
        .where(F.col("rk") == F.expr("(n_g + 1) div 2"))
        .select("g", F.col("y").alias("med"))
    )
    zed = base.join(F.broadcast(med), "g").select(
        "g", F.abs(F.col("y") - F.col("med")).alias("z")
    )
    zd = F.col("z").cast("decimal(19,0)")
    per_g = zed.groupBy("g").agg(
        F.count("*").cast("long").alias("n_g"),
        F.sum("z").cast("long").alias("z1"),
        F.sum(zd * zd).cast("decimal(38,0)").alias("z2"),
    )
    z1d = F.col("z1").cast("decimal(19,0)")
    # Z1²/n reaches ~1e16 scaled-units² — integer pre-round in
    # DECIMAL(38,0) (see kruskal_wallis)
    term = F.round(
        (z1d * z1d).cast("double") / F.col("n_g").cast("double")
    ).cast("decimal(38,0)")
    combined = per_g.agg(
        F.sum("n_g").cast("long").alias("n"),
        F.count("*").cast("long").alias("k_groups"),
        F.sum("z1").cast("long").alias("z1t"),
        F.sum("z2").cast("decimal(38,0)").alias("z2t"),
        F.sum(term).cast("decimal(38,0)").alias("t_sum"),
    )
    n, k = F.col("n"), F.col("k_groups")
    t = F.col("t_sum").cast("double")
    # the per-group integer pre-round leaves ±k/2 absolute slack in SSB
    # (negligible against real ~1e16 magnitudes, but it can push a true
    # zero slightly negative) — clamp at 0 on both engines
    ssb = F.greatest(
        t
        - (F.col("z1t").cast("double") * F.col("z1t").cast("double"))
        / n.cast("double"),
        F.lit(0.0),
    )
    ssw = F.col("z2t").cast("double") - t
    w_stat = (
        (n - k).cast("double") * ssb / ((k - 1).cast("double") * ssw)
    )
    return combined.select(
        "n",
        "k_groups",
        F.when((k > 1) & (ssw > 0), F.round(w_stat * 1e6).cast("long")).alias(
            "w_e6"
        ),
    )


def runs_test(
    df: DataFrame, ts_col: str, value_col: str, *, scale: int = 100
) -> DataFrame:
    """Wald–Wolfowitz runs test for randomness of a series around its
    median — detects trend/oscillation a mean-based monitor misses.

    The series dichotomizes against its EXPLICIT lower median (integer
    rank ``(n+1) div 2`` over pre-rounded ticks; ties count as "below",
    documented), runs are counted with one ordered lag pass, and z is a
    fixed double expression over the exact integer counts
    ``(R, n_above, n_below)``.

    One ordered window over calendar-bounded input (1-row output).
    Returns ``(n, n_above, n_below, runs, z_e6)``.
    """
    x = F.round(F.col(value_col).cast("double") * scale).cast("long")
    base = df.select(F.col(ts_col).alias("t"), x.alias("x"))
    n_tot = base.count()
    med = (
        base.select("x", F.row_number().over(W.orderBy("x")).alias("rk"))
        .where(F.col("rk") == (n_tot + 1) // 2)
        .select(F.col("x").alias("med"))
    )
    signed = base.crossJoin(F.broadcast(med)).select(
        "t", (F.col("x") > F.col("med")).cast("int").alias("s")
    )
    w = W.orderBy("t")
    runs = signed.select(
        "s",
        F.when(
            F.lag("s").over(w).isNull() | (F.lag("s").over(w) != F.col("s")),
            1,
        )
        .otherwise(0)
        .alias("new_run"),
    )
    agg = runs.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("s").cast("long").alias("n_above"),
        (F.count("*") - F.sum("s")).cast("long").alias("n_below"),
        F.sum("new_run").cast("long").alias("runs"),
    )
    n1, n2 = F.col("n_above"), F.col("n_below")
    n = F.col("n")
    two_n1n2 = (2 * n1 * n2).cast("double")
    mu = two_n1n2 / n.cast("double") + 1
    var = (
        two_n1n2
        * (two_n1n2 - n.cast("double"))
        / (n * n).cast("double")
        / (n - 1).cast("double")
    )
    z = F.when(var > 0, (F.col("runs").cast("double") - mu) / F.sqrt(var))
    return agg.select(
        "n",
        "n_above",
        "n_below",
        "runs",
        F.round(z * 1e6).cast("long").alias("z_e6"),
    )


def jarque_bera(
    df: DataFrame, group_col: str, value_col: str, *, scale: int = 100
) -> DataFrame:
    """Per-group skewness, excess kurtosis, and the Jarque–Bera
    normality statistic ``JB = n/6·(S² + K²/4)``.

    Exactness: a first pass shifts each group by its ROUNDED integer
    mean (an integer shift leaves central moments unchanged but keeps
    the power sums small and exactly representable); the four shifted
    power sums are exact integers — squares in bigint, cubes and
    fourth powers in DECIMAL(38,0) (mirrored by DuckDB HUGEINT) — and
    skew/kurtosis/JB are fixed double expressions over them.

    Returns ``(group, n, skew_e6, kurt_e6, jb_e6)``.
    """
    y = F.round(F.col(value_col).cast("double") * scale).cast("long")
    base = df.select(F.col(group_col).alias("g"), y.alias("y")).where(
        F.col("y").isNotNull() & F.col("g").isNotNull()
    )
    shift = base.groupBy("g").agg(
        F.round(
            F.sum("y").cast("double") / F.count("*").cast("double")
        )
        .cast("long")
        .alias("c")
    )
    sh = base.join(F.broadcast(shift), "g").select(
        "g", (F.col("y") - F.col("c")).alias("u")
    )
    u = F.col("u")
    u2 = (u * u).alias("u2")
    sh2 = sh.select("g", u, u2)
    u2d = F.col("u2").cast("decimal(19,0)")
    ud = F.col("u").cast("decimal(19,0)")
    mom = sh2.groupBy("g").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("u").cast("long").alias("s1"),
        F.sum("u2").cast("long").alias("s2"),
        F.sum(u2d * ud).cast("decimal(38,0)").alias("s3"),
        F.sum(u2d * u2d).cast("decimal(38,0)").alias("s4"),
    )
    n = F.col("n").cast("double")
    m1 = F.col("s1").cast("double") / n
    r2 = F.col("s2").cast("double") / n
    r3 = F.col("s3").cast("double") / n
    r4 = F.col("s4").cast("double") / n
    m2 = r2 - m1 * m1
    m3 = r3 - F.lit(3.0) * m1 * r2 + F.lit(2.0) * m1 * m1 * m1
    m4 = (
        r4
        - F.lit(4.0) * m1 * r3
        + F.lit(6.0) * m1 * m1 * r2
        - F.lit(3.0) * m1 * m1 * m1 * m1
    )
    skew = m3 / F.sqrt(m2 * m2 * m2)
    kurt = m4 / (m2 * m2) - F.lit(3.0)
    jb = n / F.lit(6.0) * (skew * skew + kurt * kurt / F.lit(4.0))
    ok = (F.col("n") >= 3) & (m2 > 0)
    return mom.select(
        F.col("g").alias(group_col),
        F.col("n"),
        F.when(ok, F.round(skew * 1e6).cast("long")).alias("skew_e6"),
        F.when(ok, F.round(kurt * 1e6).cast("long")).alias("kurt_e6"),
        F.when(ok, F.round(jb * 1e6).cast("long")).alias("jb_e6"),
    )


def durbin_watson(
    df: DataFrame, ts_col: str, x_col: str, y_col: str, *, scale: int = 100
) -> DataFrame:
    """Durbin–Watson autocorrelation statistic of simple-OLS residuals
    — the serial-correlation check on a fitted trend:

        DW = Σ(e_t − e_{t−1})² / Σe_t²

    Exactness: the OLS slope/intercept come from exact DECIMAL moment
    sums (one division each); each residual then pre-rounds to ONE
    integer (`round(y − (a + b·x))` — identical expression tree on both
    engines), so both quadratic forms are exact integer sums in
    DECIMAL(38,0) and DW is a single division.  DW ≈ 2 means no serial
    correlation, → 0 positive, → 4 negative.

    Returns one row ``(n, b_e6, dw_e6)``.
    """
    yv = F.round(F.col(y_col).cast("double") * scale).cast("long")
    base = df.select(
        F.col(ts_col).alias("t"),
        F.col(x_col).cast("long").alias("x"),
        yv.alias("y"),
    )
    xd = F.col("x").cast("decimal(19,0)")
    yd = F.col("y").cast("decimal(19,0)")
    mom = base.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(xd * yd).cast("decimal(38,0)").alias("sxy"),
        F.sum(xd * xd).cast("decimal(38,0)").alias("sxx"),
    )
    nd = F.col("n").cast("decimal(19,0)")
    num = (nd * F.col("sxy") - F.col("sx").cast("decimal(19,0)")
           * F.col("sy").cast("decimal(19,0)")).cast("double")
    den = (nd * F.col("sxx") - F.col("sx").cast("decimal(19,0)")
           * F.col("sx").cast("decimal(19,0)")).cast("double")
    fit = mom.select(
        "n",
        (num / den).alias("b"),
        (
            (F.col("sy").cast("double") - num / den
             * F.col("sx").cast("double"))
            / F.col("n").cast("double")
        ).alias("a"),
    )
    resid = base.crossJoin(F.broadcast(fit)).select(
        "t",
        "n",
        "b",
        F.round(
            F.col("y").cast("double")
            - (F.col("a") + F.col("b") * F.col("x").cast("double"))
        )
        .cast("long")
        .alias("e"),
    )
    w = W.orderBy("t")
    de = F.col("e") - F.lag("e").over(w)
    stepped = resid.select(
        "n", "b", "e", de.alias("de")
    )
    ed = F.col("e").cast("decimal(19,0)")
    ded = F.col("de").cast("decimal(19,0)")
    agg = stepped.groupBy("n", "b").agg(
        F.sum(ed * ed).cast("decimal(38,0)").alias("see"),
        F.sum(ded * ded).cast("decimal(38,0)").alias("sde"),
    )
    dw = F.col("sde").cast("double") / F.col("see").cast("double")
    return agg.select(
        "n",
        F.round(F.col("b") * 1e6).cast("long").alias("b_e6"),
        F.when(
            F.col("see").cast("double") > 0, F.round(dw * 1e6).cast("long")
        ).alias("dw_e6"),
    )


def wilcoxon_signed_rank(
    df: DataFrame, a_col: str, b_col: str, *, scale: int = 100
) -> DataFrame:
    """Wilcoxon signed-rank test for paired samples (one row per pair)
    — the nonparametric paired-t: did the population shift between the
    two measurements?

    Zero differences drop (the standard convention); |d| ranks use the
    DOUBLED-rank integer construction over the distinct-|d| table with
    ``partitioned_cumsum`` (never a global sort task — the
    ``mann_whitney_u`` contract), W⁺ keeps doubled units, and z with
    the tie correction is one fixed double expression over exact
    integers.

    Returns one row ``(n_pairs, n_nonzero, w2_plus, z_e6)``.
    """
    from smartpy_arc_spark.operators.scale import partitioned_cumsum

    da = F.round(F.col(a_col).cast("double") * scale).cast("long")
    db = F.round(F.col(b_col).cast("double") * scale).cast("long")
    diffs = df.select((da - db).alias("d")).where(F.col("d").isNotNull())
    n_pairs = diffs.count()
    nz = diffs.where(F.col("d") != 0).select(
        F.abs(F.col("d")).alias("ad"),
        (F.col("d") > 0).cast("int").alias("pos"),
    )
    vals = nz.groupBy("ad").agg(
        F.count("*").alias("n_v"), F.sum("pos").alias("n_pos_v")
    )
    cum = partitioned_cumsum(vals, ["ad"], ["n_v"], inclusive=False)
    d2 = 2 * F.col("cum_n_v").cast("long") + F.col("n_v") + 1
    agg = cum.agg(
        F.sum("n_v").cast("long").alias("n"),
        F.sum(F.col("n_pos_v") * d2).cast("long").alias("w2_plus"),
        F.sum(
            F.col("n_v").cast("long") * F.col("n_v") * F.col("n_v")
            - F.col("n_v")
        )
        .cast("long")
        .alias("tie_term"),
    )
    n = F.col("n")
    mu2 = (n * (n + 1)).cast("double") / 2  # doubled-units mean: n(n+1)/2
    var2 = (
        (n * (n + 1) * (2 * n + 1)).cast("double") / 6
        - F.col("tie_term").cast("double") / 12
    )  # doubled-units variance: 4·(n(n+1)(2n+1)/24 − T/48)
    z = F.when(
        var2 > 0,
        (F.col("w2_plus").cast("double") - mu2) / F.sqrt(var2),
    )
    return agg.select(
        F.lit(n_pairs).cast("long").alias("n_pairs"),
        F.col("n").alias("n_nonzero"),
        "w2_plus",
        F.round(z * 1e6).cast("long").alias("z_e6"),
    )


def wasserstein_1d(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
    *,
    scale: int = 100,
) -> DataFrame:
    """1-D Wasserstein (earth-mover) distance between two cohorts'
    empirical distributions — the magnitude-aware companion to
    :func:`ks_test_2samp` (KS reports the worst CDF gap; W₁ integrates
    ALL of it):

        W₁ = Σ_segments |F_a − F_b| · (v_{i+1} − v_i)

    Same distributed-CDF shape as ks_test: distinct-value collapse,
    ``partitioned_cumsum``, CDF differences as the exact integer
    numerator ``|cum_a·n_b − cum_b·n_a|``.  Each segment's term
    ``|d|·gap/(n_a·n_b)`` pre-rounds to e6 (DECIMAL product — the
    numerator passes 2⁶³ at ~10⁶ rows × 10⁷-tick gaps) so the sum is
    order-free.  The segment walk is one ordered pass over the
    distinct-value table (the ks_test distinct-value contract).

    Returns one row ``(n_a, n_b, w1_e6)`` — distance in original value
    units.
    """
    from smartpy_arc_spark.operators.scale import partitioned_cumsum

    x = F.round(F.col(value_col).cast("double") * scale).cast("long")
    vals = (
        df.where(F.col(group_col).isin(group_a, group_b))
        .select(F.col(group_col).alias("g"), x.alias("v"))
        .groupBy("v")
        .agg(
            F.count(F.when(F.col("g") == group_a, 1)).alias("na_v"),
            F.count(F.when(F.col("g") == group_b, 1)).alias("nb_v"),
        )
    )
    cum = partitioned_cumsum(vals, ["v"], ["na_v", "nb_v"])
    totals = cum.agg(
        F.sum("na_v").cast("long").alias("n_a"),
        F.sum("nb_v").cast("long").alias("n_b"),
    )
    gap = F.lead("v").over(W.orderBy("v")) - F.col("v")
    seg = cum.select(
        F.col("cum_na_v").cast("long").alias("ca"),
        F.col("cum_nb_v").cast("long").alias("cb"),
        "v",
        gap.alias("gap"),
    ).where(F.col("gap").isNotNull())
    scored = seg.crossJoin(F.broadcast(totals))
    d = F.abs(
        F.col("ca") * F.col("n_b") - F.col("cb") * F.col("n_a")
    ).cast("decimal(19,0)")
    term = F.round(
        (d * F.col("gap").cast("decimal(19,0)")).cast("double")
        / (F.col("n_a") * F.col("n_b")).cast("double")
        / scale
        * 1e6
    ).cast("long")
    return scored.groupBy("n_a", "n_b").agg(
        F.sum(term).cast("long").alias("w1_e6")
    )


def js_divergence(
    df: DataFrame, group_col: str, cat_col: str
) -> DataFrame:
    """Per-group KL and Jensen–Shannon divergence of each group's
    category distribution against the corpus distribution — the drift /
    source-skew monitor (JS is symmetric, bounded by ln 2, defined even
    when a group misses categories).

    The (group × category) grid is materialized explicitly (both
    dimensions bounded: they're the table's categorical domains) so
    zero cells contribute their exact ``½·q·ln 2``-shaped JS mass.
    Each cell's nats pre-round to integer e9 (the ``mutual_information``
    per-term contract) so group sums are order-free.

    Returns ``(group, n, kl_e9, js_e9)``.
    """
    base = df.select(
        F.col(group_col).alias("g"), F.col(cat_col).alias("c")
    ).where(F.col("g").isNotNull() & F.col("c").isNotNull())
    cells = base.groupBy("g", "c").agg(F.count("*").alias("n_gc"))
    gtot = cells.groupBy("g").agg(F.sum("n_gc").cast("long").alias("n_g"))
    ctot = cells.groupBy("c").agg(F.sum("n_gc").cast("long").alias("n_c"))
    tot = cells.agg(F.sum("n_gc").cast("long").alias("n_tot"))
    grid = (
        gtot.crossJoin(F.broadcast(ctot))
        .crossJoin(F.broadcast(tot))
        .join(cells, ["g", "c"], "left")
        .select(
            "g",
            "n_g",
            "n_c",
            "n_tot",
            F.coalesce(F.col("n_gc"), F.lit(0)).cast("long").alias("n_gc"),
        )
    )
    p = F.col("n_gc").cast("double") / F.col("n_g").cast("double")
    q = F.col("n_c").cast("double") / F.col("n_tot").cast("double")
    m = (p + q) / 2
    kl_term = F.when(
        F.col("n_gc") > 0, F.round(p * F.log(p / q) * 1e9).cast("long")
    ).otherwise(F.lit(0).cast("long"))
    js_val = (
        F.when(F.col("n_gc") > 0, F.lit(0.5) * p * F.log(p / m)).otherwise(
            F.lit(0.0)
        )
        + F.lit(0.5) * q * F.log(q / m)
    )
    js_term = F.round(js_val * 1e9).cast("long")
    return grid.groupBy("g").agg(
        F.max("n_g").alias("n"),
        F.sum(kl_term).cast("long").alias("kl_e9"),
        F.sum(js_term).cast("long").alias("js_e9"),
    ).select(F.col("g").alias(group_col), "n", "kl_e9", "js_e9")


def ridge_2f(
    df: DataFrame,
    x1_col: str,
    x2_col: str,
    y_col: str,
    *,
    lam: int = 0,
    scale: int = 100,
) -> DataFrame:
    """Two-feature ridge regression (no intercept), closed form by
    Cramer's rule on the regularized normal equations

        (XᵀX + λI) β = Xᵀy

    — the L2-shrunk companion to ``ols_fit`` (λ=0 recovers unpenalized
    least squares; λ in squared-tick units).

    Exactness: all five moment sums are exact DECIMAL(38,0) integers
    (mirrored by DuckDB HUGEINT); determinant and solutions are fixed
    double expressions over them, one division per coefficient.  One
    map-side-combined aggregate — no shuffle beyond the 1-row combine.

    Returns one row ``(n, det_ok, beta1_e6, beta2_e6)`` — coefficients
    in original (y-unit per x-unit) scale.
    """
    x1 = F.round(F.col(x1_col).cast("double") * scale).cast("long")
    x2 = F.round(F.col(x2_col).cast("double") * scale).cast("long")
    yv = F.round(F.col(y_col).cast("double") * scale).cast("long")
    base = df.select(x1.alias("x1"), x2.alias("x2"), yv.alias("y")).where(
        F.col("x1").isNotNull()
        & F.col("x2").isNotNull()
        & F.col("y").isNotNull()
    )
    d = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    mom = base.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(d("x1") * d("x1")).cast("decimal(38,0)").alias("s11"),
        F.sum(d("x1") * d("x2")).cast("decimal(38,0)").alias("s12"),
        F.sum(d("x2") * d("x2")).cast("decimal(38,0)").alias("s22"),
        F.sum(d("x1") * d("y")).cast("decimal(38,0)").alias("s1y"),
        F.sum(d("x2") * d("y")).cast("decimal(38,0)").alias("s2y"),
    )
    a11 = F.col("s11").cast("double") + F.lit(float(lam))
    a22 = F.col("s22").cast("double") + F.lit(float(lam))
    a12 = F.col("s12").cast("double")
    b1 = F.col("s1y").cast("double")
    b2 = F.col("s2y").cast("double")
    det = a11 * a22 - a12 * a12
    beta1 = (b1 * a22 - b2 * a12) / det
    beta2 = (a11 * b2 - a12 * b1) / det
    return mom.select(
        "n",
        (det != 0).cast("int").alias("det_ok"),
        F.when(det != 0, F.round(beta1 * 1e6).cast("long")).alias("beta1_e6"),
        F.when(det != 0, F.round(beta2 * 1e6).cast("long")).alias("beta2_e6"),
    )


def changepoint_binseg(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    *,
    min_seg: int = 5,
    scale: int = 100,
) -> DataFrame:
    """Single best changepoint by binary segmentation: the split that
    maximizes the SSE reduction of a two-mean fit over a one-mean fit
    (the first step of the classic recursive segmentation / the exact
    CUSUM-of-squares optimum):

        gain(t) = S_t²/t + (S−S_t)²/(n−t) − S²/n

    Prefix sums over the ordered pre-rounded series give exact integer
    ``(t, S_t)``; gain is one fixed double expression per candidate;
    the argmax is deterministic (gain desc, earliest t).  Splits closer
    than ``min_seg`` to either edge are excluded.

    One ordered prefix pass over calendar-bounded input + a 1-row
    totals broadcast.  Returns one row ``(n, split_idx, split_ts,
    gain_units, mean_left_e4, mean_right_e4)``.
    """
    x = F.round(F.col(value_col).cast("double") * scale).cast("long")
    base = df.select(F.col(ts_col).alias("t"), x.alias("x"))
    w = W.orderBy("t").rowsBetween(W.unboundedPreceding, 0)
    pre = base.select(
        "t",
        F.row_number().over(W.orderBy("t")).alias("i"),
        F.sum("x").over(w).alias("st"),
    )
    totals = base.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
    )
    cand = pre.crossJoin(F.broadcast(totals)).where(
        (F.col("i") >= min_seg) & (F.col("i") <= F.col("n") - min_seg)
    )
    i = F.col("i").cast("double")
    n = F.col("n").cast("double")
    st = F.col("st").cast("double")
    s = F.col("s").cast("double")
    gain = st * st / i + (s - st) * (s - st) / (n - i) - s * s / n
    # gain is a sum-of-squares difference (~n·σ² in tick² units): report
    # it as integer squared ORIGINAL units (tick²/scale²) — an e6 scaling
    # would pass 2⁶³ on ~10⁹-tick daily series
    scored = cand.select(
        F.col("n"),
        F.col("i").cast("long").alias("split_idx"),
        F.col("t").alias("split_ts"),
        F.round(gain / scale / scale).cast("long").alias("gain_units"),
        F.round(st / i / scale * 10000).cast("long").alias("mean_left_e4"),
        F.round((s - st) / (n - i) / scale * 10000)
        .cast("long")
        .alias("mean_right_e4"),
    )
    return scored.orderBy(
        F.col("gain_units").desc(), F.col("split_idx")
    ).limit(1)


def friedman_test(
    df: DataFrame,
    block_col: str,
    treat_col: str,
    value_col: str,
    *,
    scale: int = 100,
) -> DataFrame:
    """Friedman test for k treatments over n matched blocks (the
    repeated-measures companion to :func:`kruskal_wallis`):

        Q = 12/(n·k·(k+1)) · Σ_j R_j² − 3·n·(k+1)

    Within-block ranking is a tiny k-row window PARTITIONED BY BLOCK —
    scale-free — with ties as doubled average ranks (``2·cnt_less +
    cnt_eq + 1``, exact integers).  Only complete blocks (all k
    treatments present exactly once) participate.  Q is one fixed
    double expression over the exact integer rank sums.

    Returns one row ``(n_blocks, k_treatments, q_e6)``.
    """
    y = F.round(F.col(value_col).cast("double") * scale).cast("long")
    base = df.select(
        F.col(block_col).alias("b"),
        F.col(treat_col).alias("tr"),
        y.alias("y"),
    ).where(
        F.col("b").isNotNull() & F.col("tr").isNotNull() & F.col("y").isNotNull()
    )
    k_total = base.select("tr").distinct().count()
    sizes = base.groupBy("b").agg(
        F.count("*").alias("n_b"),
        F.count_distinct("tr").alias("k_b"),
    )
    complete = sizes.where(
        (F.col("n_b") == k_total) & (F.col("k_b") == k_total)
    ).select("b")
    inb = base.join(complete, "b")
    # doubled average rank within block: 2*(# smaller) + (# equal) + 1,
    # via two range-frame window counts over the k-row block
    ranked = inb.select(
        "b",
        "tr",
        "y",
        (
            2 * F.count(F.when(F.col("y").isNotNull(), 1)).over(
                W.partitionBy("b").orderBy("y").rangeBetween(
                    W.unboundedPreceding, -1
                )
            )
            + F.count(F.when(F.col("y").isNotNull(), 1)).over(
                W.partitionBy("b").orderBy("y").rangeBetween(0, 0)
            )
            + 1
        ).alias("r2"),
    )
    per_t = ranked.groupBy("tr").agg(
        F.sum("r2").cast("long").alias("r2_sum"),
        F.count("*").cast("long").alias("n_blocks"),
    )
    r2d = F.col("r2_sum").cast("decimal(19,0)")
    agg = per_t.agg(
        F.max("n_blocks").cast("long").alias("n_blocks"),
        F.count("*").cast("long").alias("k_treatments"),
        F.sum((r2d * r2d).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("sum_r2sq"),
    )
    n = F.col("n_blocks")
    kk = F.col("k_treatments")
    q = (
        F.lit(3.0)
        * F.col("sum_r2sq").cast("double")
        / (n * kk * (kk + 1)).cast("double")
        - F.lit(3.0) * (n * (kk + 1)).cast("double")
    )
    return agg.select(
        "n_blocks",
        "k_treatments",
        F.when(
            (n > 0) & (kk > 1), F.round(q * 1e6).cast("long")
        ).alias("q_e6"),
    )


def corr_matrix(
    df: DataFrame, cols: list, *, scale: int = 100
) -> DataFrame:
    """All pairwise Pearson correlations of k numeric columns in ONE
    moment aggregate — the feature-screening matrix (k(k-1)/2 pairs
    from a single scan, never k² passes).

    Exactness: columns pre-round to integer ``scale`` ticks; all k
    first moments, k second moments, and k(k-1)/2 cross moments are
    exact DECIMAL(38,0) sums; each correlation is one fixed double
    expression (the ``market_beta`` DECIMAL/HUGEINT contract — n·Σxy
    passes 2⁶³ on ~10⁵ rows of 10⁷-tick values).  Rows with a null in
    ANY column drop (listwise deletion), so every pair shares one n.

    Returns one row per (col_a, col_b) pair, ``(col_a, col_b, n,
    corr_e6)``, pairs in input-list order.
    """
    ticks = [
        F.round(F.col(c).cast("double") * scale).cast("long").alias(f"x{i}")
        for i, c in enumerate(cols)
    ]
    d = lambda i: F.col(f"x{i}").cast("decimal(19,0)")  # noqa: E731
    aggs = [F.count("*").cast("long").alias("n")]
    for i in range(len(cols)):
        aggs.append(F.sum(f"x{i}").cast("long").alias(f"s{i}"))
        aggs.append(
            F.sum(d(i) * d(i)).cast("decimal(38,0)").alias(f"q{i}")
        )
    for i in range(len(cols)):
        for jj in range(i + 1, len(cols)):
            aggs.append(
                F.sum(d(i) * d(jj))
                .cast("decimal(38,0)")
                .alias(f"p{i}_{jj}")
            )
    mom = df.select(*ticks)
    for i in range(len(cols)):
        mom = mom.where(F.col(f"x{i}").isNotNull())
    mom = mom.agg(*aggs)
    nd = F.col("n").cast("decimal(19,0)")

    def corr(i, jj):
        si = F.col(f"s{i}").cast("decimal(19,0)")
        sj = F.col(f"s{jj}").cast("decimal(19,0)")
        num = (nd * F.col(f"p{i}_{jj}") - si * sj).cast("double")
        vi = (nd * F.col(f"q{i}") - si * si).cast("double")
        vj = (nd * F.col(f"q{jj}") - sj * sj).cast("double")
        return F.when(
            (vi > 0) & (vj > 0),
            F.round(num / (F.sqrt(vi) * F.sqrt(vj)) * 1e6).cast("long"),
        )

    stack_args = []
    for i in range(len(cols)):
        for jj in range(i + 1, len(cols)):
            stack_args += [
                F.lit(cols[i]),
                F.lit(cols[jj]),
                corr(i, jj),
            ]
    n_pairs = len(cols) * (len(cols) - 1) // 2
    pairs = mom.select(
        "n",
        F.stack(
            F.lit(n_pairs), *stack_args
        ).alias("col_a", "col_b", "corr_e6"),
    )
    return pairs.select("col_a", "col_b", "n", "corr_e6")


def overdispersion_fit(
    df: DataFrame, group_col: str, count_col: str
) -> DataFrame:
    """Per-group count-model diagnostics: mean, sample variance, the
    dispersion ratio var/mean (≈1 ⇒ Poisson; >1 ⇒ overdispersed), and
    the method-of-moments negative-binomial fit

        r = mean² / (var − mean),   p = mean / var

    — the decision table for modeling count columns (orders per
    customer, events per session) before reaching for a GLM.

    Exactness: counts are integers, so (n, Σc, Σc²) are exact bigint
    moments and every statistic is a fixed double expression; NB
    parameters are null when var ≤ mean (Poisson or under-dispersed —
    MoM undefined).

    Returns ``(group, n, mean_e6, var_e6, dispersion_e6, nb_r_e6,
    nb_p_e6)``.
    """
    c = F.col(count_col).cast("long")
    base = df.select(F.col(group_col).alias("g"), c.alias("c")).where(
        F.col("c").isNotNull() & F.col("g").isNotNull()
    )
    mom = base.groupBy("g").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("c").cast("long").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("q"),
    )
    n = F.col("n")
    mean = F.col("s").cast("double") / n.cast("double")
    var = (
        (n * F.col("q") - F.col("s") * F.col("s")).cast("double")
        / (n * (n - 1)).cast("double")
    )
    disp = var / mean
    nb_ok = (n >= 2) & (var > mean) & (mean > 0)
    r = mean * mean / (var - mean)
    p = mean / var
    return mom.select(
        F.col("g").alias(group_col),
        "n",
        F.round(mean * 1e6).cast("long").alias("mean_e6"),
        F.when(n >= 2, F.round(var * 1e6).cast("long")).alias("var_e6"),
        F.when((n >= 2) & (mean > 0), F.round(disp * 1e6).cast("long")).alias(
            "dispersion_e6"
        ),
        F.when(nb_ok, F.round(r * 1e6).cast("long")).alias("nb_r_e6"),
        F.when(nb_ok, F.round(p * 1e6).cast("long")).alias("nb_p_e6"),
    )


def var_cvar(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    tail_den: int = 20,
    scale: int = 100,
) -> DataFrame:
    """Historical Value-at-Risk and Conditional VaR (expected shortfall)
    of period-over-period changes, per key, at tail fraction
    ``1/tail_den`` (default 5%).

    Selection, not interpolation (the ``time_to_convert`` contract):
    the VaR is the ``k = ceil(n_changes/tail_den)``-th SMALLEST change
    by the total order (change, ts) — an explicit integer rank rule —
    and CVaR is the exact integer mean of those k worst changes (one
    division).  Engine quantile conventions never enter.

    Returns ``(key, n_changes, k_tail, var_e4, cvar_e4)`` in original
    value units (negative = loss).
    """
    _check_e4_scale(scale)
    x = F.round(F.col(value_col).cast("double") * scale).cast("long")
    base = df.select(
        F.col(key_col).alias("k"), F.col(ts_col).alias("t"), x.alias("x")
    )
    wt = W.partitionBy("k").orderBy("t")
    d = (F.col("x") - F.lag("x").over(wt)).alias("d")
    chg = base.select("k", "t", d).where(F.col("d").isNotNull())
    wr = W.partitionBy("k").orderBy(F.col("d"), F.col("t"))
    ranked = chg.select(
        "k", "d", F.row_number().over(wr).alias("rk")
    )
    sizes = ranked.groupBy("k").agg(F.count("*").cast("long").alias("n"))
    kk = F.expr(f"(n + {tail_den - 1}) div {tail_den}")
    sized = ranked.join(F.broadcast(sizes.select("k", "n", kk.alias("kt"))), "k")
    tail = sized.where(F.col("rk") <= F.col("kt"))
    agg = tail.groupBy("k", "n", "kt").agg(
        F.max(F.when(F.col("rk") == F.col("kt"), F.col("d"))).alias("var_d"),
        F.sum("d").cast("long").alias("tail_sum"),
    )
    return agg.select(
        F.col("k").alias(key_col),
        F.col("n").alias("n_changes"),
        F.col("kt").alias("k_tail"),
        (F.col("var_d") * (10000 // scale)).cast("long").alias("var_e4"),
        F.round(
            F.col("tail_sum").cast("double")
            / F.col("kt").cast("double")
            / scale
            * 10000
        )
        .cast("long")
        .alias("cvar_e4"),
    )


def grubbs_statistic(
    df: DataFrame, ts_col: str, value_col: str, *, scale: int = 100
) -> DataFrame:
    """Grubbs outlier statistic ``G = max|x − x̄|/s`` with the offending
    observation — the single-most-extreme-point screen for a series
    (compare G against the t-based critical value for your α off-line).

    Exactness: the per-row deviation keeps the exact integer numerator
    ``|n·x − S|`` (no float mean subtraction), the argmax is
    deterministic (deviation desc, earliest ts), and G is one fixed
    double expression over exact DECIMAL moments.

    Returns one row ``(n, mean_e4, sd_e4, g_e6, outlier_ts,
    outlier_e4)``.
    """
    _check_e4_scale(scale)
    x = F.round(F.col(value_col).cast("double") * scale).cast("long")
    base = df.select(F.col(ts_col).alias("t"), x.alias("x"))
    xd = F.col("x").cast("decimal(19,0)")
    mom = base.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
        F.sum(xd * xd).cast("decimal(38,0)").alias("q"),
    )
    dev = F.abs(F.col("n") * F.col("x") - F.col("s"))
    flagged = base.crossJoin(F.broadcast(mom)).select(
        "t", "x", "n", "s", "q", dev.alias("dev")
    )
    top = (
        flagged.withColumn(
            "rk",
            F.row_number().over(W.orderBy(F.col("dev").desc(), F.col("t"))),
        )
        .where(F.col("rk") == 1)
        .drop("rk")
    )
    n = F.col("n")
    nd = n.cast("decimal(19,0)")
    sd = F.sqrt(
        (
            nd * F.col("q")
            - F.col("s").cast("decimal(19,0)")
            * F.col("s").cast("decimal(19,0)")
        ).cast("double")
        / (n * (n - 1)).cast("double")
    )
    g = F.col("dev").cast("double") / n.cast("double") / sd
    return top.select(
        "n",
        F.round(
            F.col("s").cast("double") / n.cast("double") / scale * 10000
        )
        .cast("long")
        .alias("mean_e4"),
        F.when(n >= 2, F.round(sd / scale * 10000).cast("long")).alias(
            "sd_e4"
        ),
        F.when((n >= 2) & (sd > 0), F.round(g * 1e6).cast("long")).alias(
            "g_e6"
        ),
        F.col("t").alias("outlier_ts"),
        (F.col("x") * (10000 // scale)).cast("long").alias("outlier_e4"),
    )


def kfold_regression(
    df: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    *,
    k: int = 5,
    scale: int = 100,
) -> DataFrame:
    """K-fold OLS coefficient stability: for each fold, fit the simple
    regression on the OTHER k−1 folds (leave-fold-out) — the
    cross-validation primitive, relationally:  per-fold exact DECIMAL
    moment sums, train-split moments by SUBTRACTION from the 1-row
    totals (never k passes over the data), one Cramer solve per fold.

    Fold assignment is ``id mod k`` — deterministic on any engine (a
    hash-based split would pin the fold map to one engine's hash).

    Returns ``(fold, n_train, slope_e6, intercept_e4)`` — the spread
    across folds is the stability diagnostic.
    """
    x = F.round(F.col(x_col).cast("double") * scale).cast("long")
    y = F.round(F.col(y_col).cast("double") * scale).cast("long")
    base = df.select(
        (F.col(id_col) % k).cast("int").alias("fold"),
        x.alias("x"),
        y.alias("y"),
    ).where(F.col("x").isNotNull() & F.col("y").isNotNull())
    xd = F.col("x").cast("decimal(19,0)")
    yd = F.col("y").cast("decimal(19,0)")
    per_fold = base.groupBy("fold").agg(
        F.count("*").cast("long").alias("n_f"),
        F.sum("x").cast("long").alias("sx_f"),
        F.sum("y").cast("long").alias("sy_f"),
        F.sum(xd * yd).cast("decimal(38,0)").alias("sxy_f"),
        F.sum(xd * xd).cast("decimal(38,0)").alias("sxx_f"),
    )
    totals = per_fold.agg(
        F.sum("n_f").cast("long").alias("n_t"),
        F.sum("sx_f").cast("long").alias("sx_t"),
        F.sum("sy_f").cast("long").alias("sy_t"),
        F.sum("sxy_f").cast("decimal(38,0)").alias("sxy_t"),
        F.sum("sxx_f").cast("decimal(38,0)").alias("sxx_t"),
    )
    j = per_fold.crossJoin(F.broadcast(totals))
    n = (F.col("n_t") - F.col("n_f")).cast("long")
    sx = (F.col("sx_t") - F.col("sx_f")).cast("long")
    sy = (F.col("sy_t") - F.col("sy_f")).cast("long")
    sxy = F.col("sxy_t") - F.col("sxy_f")
    sxx = F.col("sxx_t") - F.col("sxx_f")
    nd = n.cast("decimal(19,0)")
    num = (nd * sxy - sx.cast("decimal(19,0)") * sy.cast("decimal(19,0)")).cast(
        "double"
    )
    den = (nd * sxx - sx.cast("decimal(19,0)") * sx.cast("decimal(19,0)")).cast(
        "double"
    )
    slope = num / den
    intercept = (
        sy.cast("double") - num / den * sx.cast("double")
    ) / n.cast("double") / scale
    return j.select(
        "fold",
        n.alias("n_train"),
        F.when(den > 0, F.round(slope * 1e6).cast("long")).alias("slope_e6"),
        F.when(den > 0, F.round(intercept * 1e4).cast("long")).alias(
            "intercept_e4"
        ),
    )


def group_mode(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Most frequent value per group with a deterministic tie rule
    (count desc, value asc) — the categorical central tendency
    aggregate SQL engines leave out (or define with engine-specific
    ties: Spark's ``mode()`` picks arbitrarily; this one never does).

    One hash aggregate to (group, value) counts, then a 1-row-per-group
    window argmax inside the group partition.  Returns
    ``(group, mode_value, mode_count, n, share_e6)``.
    """
    cells = (
        df.select(F.col(group_col).alias("g"), F.col(value_col).alias("v"))
        .where(F.col("g").isNotNull() & F.col("v").isNotNull())
        .groupBy("g", "v")
        .agg(F.count("*").cast("long").alias("c"))
    )
    w = W.partitionBy("g").orderBy(F.col("c").desc(), F.col("v"))
    tot = W.partitionBy("g")
    top = (
        cells.select(
            "g",
            "v",
            "c",
            F.sum("c").over(tot).cast("long").alias("n"),
            F.row_number().over(w).alias("rk"),
        )
        .where(F.col("rk") == 1)
    )
    return top.select(
        F.col("g").alias(group_col),
        F.col("v").alias("mode_value"),
        F.col("c").alias("mode_count"),
        "n",
        F.round(
            F.col("c").cast("double") / F.col("n").cast("double") * 1e6
        )
        .cast("long")
        .alias("share_e6"),
    )


def percentile_bands(
    df: DataFrame,
    group_col: str,
    value_col: str,
    *,
    qs: tuple = (10, 50, 90),
    scale: int = 100,
) -> DataFrame:
    """Per-group percentile bands by EXPLICIT selection rank — the
    ``ceil(q·n/100)``-th smallest actual value (the ``time_to_convert``
    /
    ``quantile_normalize`` contract: engine interpolation conventions
    never enter, the reported number is always a real data value).

    One ordered rank window per group partition + a per-group size
    window over the same exchange; each requested q becomes a
    conditional aggregate column.  Returns ``(group, n, p{q}_e4...)``.
    """
    _check_e4_scale(scale)
    x = F.round(F.col(value_col).cast("double") * scale).cast("long")
    base = df.select(F.col(group_col).alias("g"), x.alias("x")).where(
        F.col("x").isNotNull() & F.col("g").isNotNull()
    )
    w = W.partitionBy("g").orderBy("x")
    ranked = base.select(
        "g",
        "x",
        F.row_number().over(w).alias("rk"),
        F.count("*").over(W.partitionBy("g")).cast("long").alias("n"),
    )
    aggs = [F.max("n").alias("n")]
    for q in qs:
        k = F.expr(f"(n * {q} + 99) div 100")
        aggs.append(
            (
                F.max(F.when(F.col("rk") == k, F.col("x")))
                * (10000 // scale)
            )
            .cast("long")
            .alias(f"p{q}_e4")
        )
    return ranked.groupBy("g").agg(*aggs).select(
        F.col("g").alias(group_col), "n", *[f"p{q}_e4" for q in qs]
    )


def price_index(
    df: DataFrame,
    period_col: str,
    item_col: str,
    amount_col: str,
    qty_col: str,
    base_period,
    *,
    scale: int = 100,
) -> DataFrame:
    """Laspeyres, Paasche, and Fisher price indices per period against a
    base period — the standard inflation/price-drift decomposition (did
    revenue move because of PRICE or because of MIX?):

        L_t = Σ p_t·q_0 / Σ p_0·q_0      (base-period basket)
        P_t = Σ p_t·q_t / Σ p_0·q_t      (current basket)
        F_t = √(L_t · P_t)

    over items present in both periods.  Per-item unit prices are
    rationals (amount cents / qty); each basket term ``(c/s)·q`` is a
    single exact-operand division pre-rounded to integer e2 cents
    (playbook rule 7: round per-term, sum integers), so all four basket
    sums are order-free and each index is one division of exact
    integers.

    Returns ``(period, n_items, laspeyres_e6, paasche_e6, fisher_e6)``.
    """
    amt = F.round(F.col(amount_col).cast("double") * scale).cast("long")
    qty = F.round(F.col(qty_col).cast("double")).cast("long")
    per = (
        df.select(
            F.col(period_col).alias("t"),
            F.col(item_col).alias("i"),
            amt.alias("c"),
            qty.alias("s"),
        )
        .where(F.col("c").isNotNull() & F.col("s").isNotNull() & (F.col("s") > 0))
        .groupBy("t", "i")
        .agg(F.sum("c").alias("c"), F.sum("s").alias("s"))
    )
    base = per.where(F.col("t") == F.lit(base_period)).select(
        "i", F.col("c").alias("c0"), F.col("s").alias("s0")
    )
    j = per.where(F.col("t") != F.lit(base_period)).join(base, "i")

    def term(cn, sn, qn):
        # (c/s)·q pre-rounded to integer cents
        return F.round(
            F.col(cn).cast("double")
            / F.col(sn).cast("double")
            * F.col(qn).cast("double")
        ).cast("long")

    agg = j.groupBy("t").agg(
        F.count("*").cast("long").alias("n_items"),
        F.sum(term("c", "s", "s0")).cast("long").alias("l_num"),
        F.sum(term("c0", "s0", "s0")).cast("long").alias("l_den"),
        F.sum(term("c", "s", "s")).cast("long").alias("p_num"),
        F.sum(term("c0", "s0", "s")).cast("long").alias("p_den"),
    )
    lasp = F.col("l_num").cast("double") / F.col("l_den").cast("double")
    paas = F.col("p_num").cast("double") / F.col("p_den").cast("double")
    return agg.select(
        F.col("t").alias(period_col),
        "n_items",
        F.round(lasp * 1e6).cast("long").alias("laspeyres_e6"),
        F.round(paas * 1e6).cast("long").alias("paasche_e6"),
        F.round(F.sqrt(lasp * paas) * 1e6).cast("long").alias("fisher_e6"),
    )


def abc_xyz(
    df: DataFrame,
    item_col: str,
    period_col: str,
    value_col: str,
    *,
    scale: int = 100,
    a_cut_e6: int = 800000,
    b_cut_e6: int = 950000,
    x_cut_e6: int = 500000,
    y_cut_e6: int = 1000000,
) -> DataFrame:
    """ABC–XYZ inventory classification: ABC by cumulative revenue share
    (A ≤ 80%, B ≤ 95%, C above) and XYZ by demand variability
    (coefficient of variation across periods: X < 0.5, Y < 1.0, Z
    above) — the 9-cell planning matrix.

    Scale shape: the revenue ranking never sorts in one task — the
    cumulative share comes from ``partitioned_cumsum`` over
    ``(−revenue, item)`` (range partition + offsets).  CV uses exact
    DECIMAL per-period moments; all class cuts are INTEGER e6
    comparisons (no float thresholds).

    Returns ``(item, revenue, cum_share_e6, abc, cv_e6, xyz, klass)``.
    """
    from smartpy_arc_spark.operators.scale import partitioned_cumsum

    v = F.round(F.col(value_col).cast("double") * scale).cast("long")
    cells = (
        df.select(
            F.col(item_col).alias("i"),
            F.col(period_col).alias("t"),
            v.alias("v"),
        )
        .where(F.col("v").isNotNull())
        .groupBy("i", "t")
        .agg(F.sum("v").alias("v"))
    )
    vd = F.col("v").cast("decimal(19,0)")
    per_item = cells.groupBy("i").agg(
        F.count("*").cast("long").alias("m"),
        F.sum("v").cast("long").alias("rev"),
        F.sum(vd * vd).cast("decimal(38,0)").alias("q"),
    )
    keyed = per_item.select(
        "i", "m", "rev", "q", (-F.col("rev")).alias("neg_rev")
    )
    cum = partitioned_cumsum(keyed, ["neg_rev", "i"], ["rev"])
    total = cum.agg(F.sum("rev").cast("long").alias("tot"))
    scored = cum.crossJoin(F.broadcast(total))
    share = F.round(
        F.col("cum_rev").cast("double") / F.col("tot").cast("double") * 1e6
    ).cast("long")
    m = F.col("m")
    mean = F.col("rev").cast("double") / m.cast("double")
    md = m.cast("decimal(19,0)")
    revd = F.col("rev").cast("decimal(19,0)")
    sd = F.sqrt(
        (md * F.col("q") - revd * revd).cast("double")
        / (m * (m - 1)).cast("double")
    )
    cv = F.when((m >= 2) & (mean > 0), F.round(sd / mean * 1e6).cast("long"))
    out = scored.select(
        F.col("i").alias(item_col),
        F.col("rev").alias("revenue"),
        share.alias("cum_share_e6"),
        F.when(share <= a_cut_e6, "A")
        .when(share <= b_cut_e6, "B")
        .otherwise("C")
        .alias("abc"),
        cv.alias("cv_e6"),
        F.when(cv.isNull(), "Z")
        .when(cv < x_cut_e6, "X")
        .when(cv < y_cut_e6, "Y")
        .otherwise("Z")
        .alias("xyz"),
    )
    return out.select(
        "*", F.concat("abc", "xyz").alias("klass")
    )


def eb_shrinkage(
    df: DataFrame, item_col: str, hits_col: str, trials_col: str
) -> DataFrame:
    """Empirical-Bayes (beta-binomial) rate shrinkage: fit a beta prior
    to the observed per-item rates by method of moments, then shrink
    each item's rate toward it —

        α + β = m(1−m)/v − 1,   shrunk = (x + α)/(n + α + β)

    — the small-sample fix for ranking items by conversion/defect rate
    (an item at 1/1 must not beat one at 97/100).

    Exactness: per-item rates pre-round to integer e6 (one division of
    exact counts each) so the prior's mean/variance come from order-free
    integer sums; α/β and every shrunk rate are then fixed double
    expressions.  Degenerate priors (v ≥ m(1−m) or v = 0) return the
    raw rates with null α/β.

    Returns ``(item, hits, trials, rate_e6, alpha_e6, beta_e6,
    shrunk_e6)``.
    """
    x = F.col(hits_col).cast("long")
    n = F.col(trials_col).cast("long")
    base = df.select(
        F.col(item_col).alias("i"), x.alias("x"), n.alias("n")
    ).where(F.col("n") > 0)
    r6 = F.round(
        F.col("x").cast("double") / F.col("n").cast("double") * 1e6
    ).cast("long")
    rated = base.select("i", "x", "n", r6.alias("r6"))
    mom = rated.agg(
        F.count("*").cast("long").alias("k"),
        F.sum("r6").cast("long").alias("s"),
        F.sum(
            F.col("r6").cast("decimal(19,0)") * F.col("r6").cast("decimal(19,0)")
        )
        .cast("decimal(38,0)")
        .alias("q"),
    )
    k = F.col("k")
    m = F.col("s").cast("double") / k.cast("double") / 1e6
    v = (
        (
            k.cast("decimal(19,0)") * F.col("q")
            - F.col("s").cast("decimal(19,0)") * F.col("s").cast("decimal(19,0)")
        ).cast("double")
        / (k * (k - 1)).cast("double")
        / 1e12
    )
    ab = m * (F.lit(1.0) - m) / v - F.lit(1.0)
    prior_ok = (k >= 2) & (v > 0) & (ab > 0)
    alpha = m * ab
    beta = (F.lit(1.0) - m) * ab
    pri = mom.select(
        prior_ok.alias("ok"),
        F.when(prior_ok, alpha).alias("a"),
        F.when(prior_ok, beta).alias("b"),
    )
    j = rated.crossJoin(F.broadcast(pri))
    shrunk = F.when(
        F.col("ok"),
        (F.col("x").cast("double") + F.col("a"))
        / (F.col("n").cast("double") + F.col("a") + F.col("b"))
        * 1e6,
    ).otherwise(F.col("r6").cast("double"))
    return j.select(
        F.col("i").alias(item_col),
        F.col("x").alias("hits"),
        F.col("n").alias("trials"),
        F.col("r6").alias("rate_e6"),
        F.round(F.col("a") * 1e6).cast("long").alias("alpha_e6"),
        F.round(F.col("b") * 1e6).cast("long").alias("beta_e6"),
        F.round(shrunk).cast("long").alias("shrunk_e6"),
    )


def mediation_analysis(
    df: DataFrame,
    x_col: str,
    m_col: str,
    y_col: str,
    *,
    scale: int = 100,
) -> DataFrame:
    """Baron–Kenny mediation with the Sobel test: does X affect Y
    through M?

        a  = slope of M ~ X          (path a)
        b, c' = slopes of Y ~ X + M  (path b, direct effect)
        c  = slope of Y ~ X          (total effect)
        indirect = a·b,  Sobel z = a·b / √(b²·se_a² + a²·se_b²)

    Exactness: all variables pre-round to integer ticks and center by
    their ROUNDED integer means (the ``jarque_bera`` shift — keeps the
    DECIMAL cross-moments small and exact); every path coefficient and
    standard error is then a fixed double expression (Cramer 2×2 for
    the multiple regression, classical OLS variance formulas).

    Returns one row ``(n, a_e6, c_e6, c_prime_e6, b_e6, indirect_e6,
    sobel_z_e6, prop_mediated_e6)``.
    """
    xv = F.round(F.col(x_col).cast("double") * scale).cast("long")
    mv = F.round(F.col(m_col).cast("double") * scale).cast("long")
    yv = F.round(F.col(y_col).cast("double") * scale).cast("long")
    base = df.select(xv.alias("x"), mv.alias("m"), yv.alias("y")).where(
        F.col("x").isNotNull() & F.col("m").isNotNull() & F.col("y").isNotNull()
    )
    shift = base.agg(
        *[
            F.round(F.sum(c).cast("double") / F.count("*").cast("double"))
            .cast("long")
            .alias(f"c_{c}")
            for c in ("x", "m", "y")
        ]
    )
    cen = base.crossJoin(F.broadcast(shift)).select(
        (F.col("x") - F.col("c_x")).alias("x"),
        (F.col("m") - F.col("c_m")).alias("m"),
        (F.col("y") - F.col("c_y")).alias("y"),
    )
    d = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    mom = cen.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("tx"),
        F.sum("m").cast("long").alias("tm"),
        F.sum("y").cast("long").alias("ty"),
        F.sum(d("x") * d("x")).cast("decimal(38,0)").alias("sxx"),
        F.sum(d("x") * d("m")).cast("decimal(38,0)").alias("sxm"),
        F.sum(d("m") * d("m")).cast("decimal(38,0)").alias("smm"),
        F.sum(d("x") * d("y")).cast("decimal(38,0)").alias("sxy"),
        F.sum(d("m") * d("y")).cast("decimal(38,0)").alias("smy"),
        F.sum(d("y") * d("y")).cast("decimal(38,0)").alias("syy"),
    )
    n = F.col("n")
    nd = n.cast("double")
    # centered (about the rounded mean) corrected moments: subtract the
    # residual mean contribution t·t/n exactly in double (t is tiny)
    def cm(s, ta, tb):
        return F.col(s).cast("double") - F.col(ta).cast(
            "double"
        ) * F.col(tb).cast("double") / nd

    Sxx = cm("sxx", "tx", "tx")
    Sxm = cm("sxm", "tx", "tm")
    Smm = cm("smm", "tm", "tm")
    Sxy = cm("sxy", "tx", "ty")
    Smy = cm("smy", "tm", "ty")
    Syy = cm("syy", "ty", "ty")
    a = Sxm / Sxx
    c = Sxy / Sxx
    det = Sxx * Smm - Sxm * Sxm
    c_p = (Sxy * Smm - Smy * Sxm) / det
    b = (Sxx * Smy - Sxm * Sxy) / det
    # residual variances
    s2_a = (Smm - a * Sxm) / (n - 2).cast("double")
    se_a2 = s2_a / Sxx
    s2_y = (Syy - c_p * Sxy - b * Smy) / (n - 3).cast("double")
    se_b2 = s2_y * Sxx / det
    sobel = (a * b) / F.sqrt(b * b * se_a2 + a * a * se_b2)
    ok = (n >= 4) & (det > 0) & (Sxx > 0)
    e6 = lambda cexpr: F.when(ok, F.round(cexpr * 1e6).cast("long"))  # noqa: E731
    return mom.select(
        "n",
        e6(a).alias("a_e6"),
        e6(c).alias("c_e6"),
        e6(c_p).alias("c_prime_e6"),
        e6(b).alias("b_e6"),
        e6(a * b).alias("indirect_e6"),
        e6(sobel).alias("sobel_z_e6"),
        e6(a * b / c).alias("prop_mediated_e6"),
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


def woe_iv(
    df: DataFrame,
    score_col: str,
    target_col: str,
    id_col: str,
    *,
    n_bins: int = 10,
    scale: int = 100,
) -> DataFrame:
    """Weight of Evidence and Information Value per score bin — the
    credit-scoring feature screen:

        WOE_b = ln( (good_b/G) / (bad_b/B) ),
        IV = Σ_b (good_b/G − bad_b/B) · WOE_b

    Bins are DETERMINISTIC equal-count buckets
    ``bin = ((rank−1)·n_bins) div n`` over the TOTAL order (score tick,
    id) — the explicit-ntile rule of ``lorenz_curve``, with the id
    tiebreak so tied scores land identically on any engine.  WOE nats
    and IV terms pre-round to integer e9 per bin (the
    ``mutual_information`` contract) so the aggregate IV is an
    order-free integer sum.  Bins with zero goods or zero bads return
    null WOE (standard practice is merging; kept explicit here).

    Returns per bin ``(bin, n, n_good, n_bad, woe_e9, iv_term_e9)``.
    """
    x = F.round(F.col(score_col).cast("double") * scale).cast("long")
    t = F.col(target_col).cast("int")
    base = df.select(
        x.alias("x"), t.alias("y"), F.col(id_col).alias("rid")
    ).where(
        F.col("x").isNotNull() & F.col("y").isNotNull()
    )
    n_tot = base.count()
    binned = base.select(
        "x",
        "y",
        F.expr(
            f"((row_number() over (order by x, rid) - 1) * {n_bins})"
            f" div {n_tot}"
        ).alias("bin"),
    )
    per_bin = binned.groupBy("bin").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("n_good"),
        (F.count("*") - F.sum("y")).cast("long").alias("n_bad"),
    )
    totals = per_bin.agg(
        F.sum("n_good").cast("long").alias("g"),
        F.sum("n_bad").cast("long").alias("b"),
    )
    j = per_bin.crossJoin(F.broadcast(totals))
    pg = F.col("n_good").cast("double") / F.col("g").cast("double")
    pb = F.col("n_bad").cast("double") / F.col("b").cast("double")
    ok = (F.col("n_good") > 0) & (F.col("n_bad") > 0)
    woe = F.log(pg / pb)
    return j.select(
        "bin",
        "n",
        "n_good",
        "n_bad",
        F.when(ok, F.round(woe * 1e9).cast("long")).alias("woe_e9"),
        F.when(ok, F.round((pg - pb) * woe * 1e9).cast("long")).alias(
            "iv_term_e9"
        ),
    ).orderBy("bin")


def trend_test(
    df: DataFrame, group_col: str, hit_col: str, weight_map: dict
) -> DataFrame:
    """Cochran–Armitage test for a linear trend in proportions across
    ordered groups (dose-response / year-over-year adoption):

        z = Σ wᵢ(xᵢ − nᵢ·p̄) / √( p̄(1−p̄)·[Σwᵢ²nᵢ − (Σwᵢnᵢ)²/N] )

    with INTEGER score weights ``weight_map[group]`` (pipeline
    constants).  Every moment is an exact integer; z is one fixed
    double expression.

    Returns one row ``(n, n_hits, num, z_e6)`` — ``num = Σw·x·N −
    Σw·n·X`` the exact integer numerator (×N).
    """
    wm = F.create_map(
        *[x for kv in weight_map.items() for x in (F.lit(kv[0]), F.lit(kv[1]))]
    )
    hit = F.col(hit_col).cast("int")
    base = df.select(
        wm[F.col(group_col)].cast("long").alias("w"), hit.alias("y")
    ).where(F.col("w").isNotNull() & F.col("y").isNotNull())
    agg = base.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("x_tot"),
        F.sum(F.col("w") * F.col("y")).cast("long").alias("swx"),
        F.sum("w").cast("long").alias("swn"),
        F.sum(F.col("w") * F.col("w")).cast("long").alias("sw2n"),
    )
    n = F.col("n")
    # numerator ×N: Σw·x·N − Σw·n·X  (exact integers)
    num = n * F.col("swx") - F.col("swn") * F.col("x_tot")
    pbar = F.col("x_tot").cast("double") / n.cast("double")
    bracket = (
        F.col("sw2n").cast("double")
        - F.col("swn").cast("double")
        * F.col("swn").cast("double")
        / n.cast("double")
    )
    var = pbar * (F.lit(1.0) - pbar) * bracket
    z = F.when(
        var > 0,
        (num.cast("double") / n.cast("double")) / F.sqrt(var),
    )
    return agg.select(
        "n",
        F.col("x_tot").alias("n_hits"),
        num.cast("long").alias("num"),
        F.round(z * 1e6).cast("long").alias("z_e6"),
    )


def mcnemar_test(
    df: DataFrame, before_col: str, after_col: str
) -> DataFrame:
    """McNemar test for paired binary outcomes (did the flip rate
    change direction?): only the discordant cells matter,

        χ² = (b − c)² / (b + c)

    with ``b`` = 1→0 flips, ``c`` = 0→1 flips — exact integers, one
    division.  Includes the continuity-corrected variant
    ``(|b−c|−1)²/(b+c)``.

    Returns one row ``(n_pairs, b, c, chi2_e6, chi2_cc_e6)``.
    """
    bv = F.col(before_col).cast("int")
    av = F.col(after_col).cast("int")
    base = df.select(bv.alias("p"), av.alias("q")).where(
        F.col("p").isNotNull() & F.col("q").isNotNull()
    )
    agg = base.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum(((F.col("p") == 1) & (F.col("q") == 0)).cast("int"))
        .cast("long")
        .alias("b"),
        F.sum(((F.col("p") == 0) & (F.col("q") == 1)).cast("int"))
        .cast("long")
        .alias("c"),
    )
    b, c = F.col("b"), F.col("c")
    disc = b + c
    chi2 = ((b - c) * (b - c)).cast("double") / disc.cast("double")
    cc = (F.abs(b - c) - 1) * (F.abs(b - c) - 1)
    chi2_cc = cc.cast("double") / disc.cast("double")
    return agg.select(
        "n_pairs",
        "b",
        "c",
        F.when(disc > 0, F.round(chi2 * 1e6).cast("long")).alias("chi2_e6"),
        F.when(
            disc > 0, F.round(chi2_cc * 1e6).cast("long")
        ).alias("chi2_cc_e6"),
    )


def burstiness(
    df: DataFrame, key_col: str, ts_col: str
) -> DataFrame:
    """Burstiness index of inter-arrival times (Goh & Barabási):

        B = (σ − μ) / (σ + μ)

    −1 = perfectly periodic, 0 = Poisson, → 1 = extremely bursty — the
    one-number arrival-pattern classifier per key (complements
    ``burst_detect``'s windowed alarms).

    Inter-arrival gaps are exact integer seconds (lag over the per-key
    order); μ/σ come from exact DECIMAL moments; B is one fixed double
    expression.  Keys with < 3 events return null.

    Returns ``(key, n_gaps, mean_gap_e2, sd_gap_e2, b_e6)``.
    """
    base = df.select(
        F.col(key_col).alias("k"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("us"),
    )
    w = W.partitionBy("k").orderBy("us")
    lagged = base.select(
        "k", "us", F.lag("us").over(w).alias("prev_us")
    ).where(F.col("prev_us").isNotNull())
    # integer `div`, not a double divide + cast: Spark's double->long
    # cast truncates while DuckDB's rounds (playbook rule 6)
    gaps = lagged.select(
        "k", F.expr("(us - prev_us) div 1000000").alias("g")
    )
    gd = F.col("g").cast("decimal(19,0)")
    mom = gaps.groupBy("k").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("g").cast("long").alias("s"),
        F.sum(gd * gd).cast("decimal(38,0)").alias("q"),
    )
    n = F.col("n")
    mean = F.col("s").cast("double") / n.cast("double")
    sd = F.sqrt(
        (
            n.cast("decimal(19,0)") * F.col("q")
            - F.col("s").cast("decimal(19,0)")
            * F.col("s").cast("decimal(19,0)")
        ).cast("double")
        / (n * (n - 1)).cast("double")
    )
    b = F.when(
        (n >= 2) & (sd + mean > 0), (sd - mean) / (sd + mean)
    )
    return mom.select(
        F.col("k").alias(key_col),
        n.alias("n_gaps"),
        F.round(mean * 100).cast("long").alias("mean_gap_e2"),
        F.when(n >= 2, F.round(sd * 100).cast("long")).alias("sd_gap_e2"),
        F.round(b * 1e6).cast("long").alias("b_e6"),
    )


def fleiss_kappa(
    df: DataFrame, item_col: str, rating_col: str
) -> DataFrame:
    """Fleiss' κ: chance-corrected agreement when EVERY item is rated by
    the same number of raters n (items with a different rater count are
    excluded and reported) — the n-rater generalization of Cohen's κ.

        P̄ = mean_i [ (Σ_j n_ij² − n) / (n(n−1)) ],   P_e = Σ_j p_j²,
        κ = (P̄ − P_e) / (1 − P_e)

    Exactness: per-item agreement numerators are exact integers summed
    order-free; p_j are exact rationals; κ is one fixed double
    expression.  Returns one row ``(n_items, n_raters, n_excluded,
    pbar_e6, pe_e6, kappa_e6)``.
    """
    base = df.select(
        F.col(item_col).alias("i"), F.col(rating_col).alias("r")
    ).where(F.col("i").isNotNull() & F.col("r").isNotNull())
    sizes = base.groupBy("i").agg(F.count("*").cast("long").alias("n_i"))
    # modal rater count = the design's n (count desc, n asc tiebreak)
    n_mode = (
        sizes.groupBy("n_i")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), F.col("n_i"))
        .limit(1)
        .select(F.col("n_i").alias("n_raters"))
    )
    kept = sizes.join(F.broadcast(n_mode), sizes["n_i"] == F.col("n_raters"))
    n_excluded = sizes.count()
    cells = (
        base.join(kept.select("i", "n_raters"), "i")
        .groupBy("i", "r", "n_raters")
        .agg(F.count("*").cast("long").alias("n_ij"))
    )
    per_item = cells.groupBy("i", "n_raters").agg(
        F.sum(F.col("n_ij") * F.col("n_ij")).cast("long").alias("ssq")
    )
    cat_tot = cells.groupBy("r").agg(
        F.sum("n_ij").cast("long").alias("n_j")
    )
    tot = per_item.agg(
        F.count("*").cast("long").alias("n_items"),
        F.max("n_raters").cast("long").alias("n_raters"),
        F.sum("ssq").cast("long").alias("ssq_tot"),
    )
    pe_row = cat_tot.agg(
        F.sum("n_j").cast("long").alias("n_all"),
        F.sum(
            F.col("n_j").cast("decimal(19,0)")
            * F.col("n_j").cast("decimal(19,0)")
        )
        .cast("decimal(38,0)")
        .alias("sq_all"),
    )
    j = tot.crossJoin(F.broadcast(pe_row))
    ni = F.col("n_items")
    nr = F.col("n_raters")
    pbar = (
        (F.col("ssq_tot") - ni * nr).cast("double")
        / (ni * nr * (nr - 1)).cast("double")
    )
    pe = F.col("sq_all").cast("double") / (
        F.col("n_all").cast("double") * F.col("n_all").cast("double")
    )
    kappa = F.when(pe < 1, (pbar - pe) / (F.lit(1.0) - pe))
    return j.select(
        "n_items",
        "n_raters",
        (F.lit(n_excluded) - ni).cast("long").alias("n_excluded"),
        F.round(pbar * 1e6).cast("long").alias("pbar_e6"),
        F.round(pe * 1e6).cast("long").alias("pe_e6"),
        F.round(kappa * 1e6).cast("long").alias("kappa_e6"),
    )


def chi_square_residuals(
    df: DataFrame, col_a: str, col_b: str
) -> DataFrame:
    """Per-cell adjusted standardized residuals of a contingency table —
    the post-hoc that tells you WHICH cells drive a significant
    chi-square:

        r_ij = (O − E) / √(E·(1 − p_i)·(1 − p_j)),   E = n_i·n_j/N

    |r| > 2 flags a cell.  Exactness: O·N − n_i·n_j is an exact integer
    numerator; the denominator is one fixed double expression over
    exact counts.

    Returns per cell ``(a, b, n_obs, resid_e6, flagged)``.
    """
    cells = (
        df.select(F.col(col_a).alias("a"), F.col(col_b).alias("b"))
        .where(F.col("a").isNotNull() & F.col("b").isNotNull())
        .groupBy("a", "b")
        .agg(F.count("*").cast("long").alias("o"))
    )
    ma = cells.groupBy("a").agg(F.sum("o").cast("long").alias("n_a"))
    mb = cells.groupBy("b").agg(F.sum("o").cast("long").alias("n_b"))
    tot = cells.agg(F.sum("o").cast("long").alias("n"))
    j = (
        cells.join(F.broadcast(ma), "a")
        .join(F.broadcast(mb), "b")
        .crossJoin(F.broadcast(tot))
    )
    n = F.col("n").cast("double")
    e = F.col("n_a").cast("double") * F.col("n_b").cast("double") / n
    pa = F.col("n_a").cast("double") / n
    pb = F.col("n_b").cast("double") / n
    num = (F.col("o") * F.col("n") - F.col("n_a") * F.col("n_b")).cast(
        "double"
    ) / n
    resid = num / F.sqrt(e * (F.lit(1.0) - pa) * (F.lit(1.0) - pb))
    return j.select(
        "a",
        "b",
        F.col("o").alias("n_obs"),
        F.round(resid * 1e6).cast("long").alias("resid_e6"),
        (F.abs(resid) > 2).cast("int").alias("flagged"),
    )


def simpson_check(
    df: DataFrame, group_col: str, x_col: str, y_col: str
) -> DataFrame:
    """Simpson's-paradox detector for two binaries across strata: does
    the overall association between x and y point the OPPOSITE way from
    (almost) every within-stratum association?

    Association per table = the exact integer cross-product sign
    ``n11·n00 − n10·n01`` (the odds-ratio numerator − denominator; no
    division, no float).  Returns the overall sign, per-stratum signs,
    and the reversal verdict.

    One conditional aggregate per stratum + a 1-row combine.  Returns
    one row ``(n, n_strata, overall_sign, n_pos, n_neg, n_zero,
    reversed)`` — ``reversed = 1`` when the overall sign is nonzero and
    no stratum shares it.
    """
    x = F.col(x_col).cast("int")
    y = F.col(y_col).cast("int")
    base = df.select(
        F.col(group_col).alias("g"), x.alias("x"), y.alias("y")
    ).where(F.col("x").isNotNull() & F.col("y").isNotNull())
    cells = base.groupBy("g").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(((F.col("x") == 1) & (F.col("y") == 1)).cast("int"))
        .cast("long")
        .alias("n11"),
        F.sum(((F.col("x") == 1) & (F.col("y") == 0)).cast("int"))
        .cast("long")
        .alias("n10"),
        F.sum(((F.col("x") == 0) & (F.col("y") == 1)).cast("int"))
        .cast("long")
        .alias("n01"),
        F.sum(((F.col("x") == 0) & (F.col("y") == 0)).cast("int"))
        .cast("long")
        .alias("n00"),
    )
    assoc = (
        F.col("n11").cast("decimal(19,0)") * F.col("n00").cast("decimal(19,0)")
        - F.col("n10").cast("decimal(19,0)")
        * F.col("n01").cast("decimal(19,0)")
    )
    sgn = F.when(assoc > 0, 1).when(assoc < 0, -1).otherwise(0)
    per_g = cells.select("g", "n", "n11", "n10", "n01", "n00", sgn.alias("s"))
    comb = per_g.agg(
        F.sum("n").cast("long").alias("n"),
        F.count("*").cast("long").alias("n_strata"),
        F.sum("n11").cast("long").alias("t11"),
        F.sum("n10").cast("long").alias("t10"),
        F.sum("n01").cast("long").alias("t01"),
        F.sum("n00").cast("long").alias("t00"),
        F.sum((F.col("s") == 1).cast("int")).cast("long").alias("n_pos"),
        F.sum((F.col("s") == -1).cast("int")).cast("long").alias("n_neg"),
        F.sum((F.col("s") == 0).cast("int")).cast("long").alias("n_zero"),
    )
    o_assoc = (
        F.col("t11").cast("decimal(19,0)") * F.col("t00").cast("decimal(19,0)")
        - F.col("t10").cast("decimal(19,0)")
        * F.col("t01").cast("decimal(19,0)")
    )
    o_sgn = F.when(o_assoc > 0, 1).when(o_assoc < 0, -1).otherwise(0)
    rev = F.when(
        ((o_sgn == 1) & (F.col("n_pos") == 0))
        | ((o_sgn == -1) & (F.col("n_neg") == 0)),
        1,
    ).otherwise(0)
    return comb.select(
        "n",
        "n_strata",
        o_sgn.cast("int").alias("overall_sign"),
        "n_pos",
        "n_neg",
        "n_zero",
        rev.cast("int").alias("reversed"),
    )


def wilson_ci(
    df: DataFrame, group_col: str, hit_col: str, *, z_e3: int = 1960
) -> DataFrame:
    """Wilson score confidence interval for a proportion per group —
    the small-n-safe CI (never escapes [0,1], unlike the Wald
    interval):

        center = (p̂ + z²/2n) / (1 + z²/n),
        hw = z·√(p̂(1−p̂)/n + z²/4n²) / (1 + z²/n)

    ``z`` enters as a pre-rounded e3 integer literal (1.96 by default)
    so both engines inline the identical constant; everything else is a
    fixed double expression over exact counts.

    Returns ``(group, n, hits, p_e6, lo_e6, hi_e6)``.
    """
    hit = F.col(hit_col).cast("int")
    base = df.select(F.col(group_col).alias("g"), hit.alias("y")).where(
        F.col("y").isNotNull() & F.col("g").isNotNull()
    )
    agg = base.groupBy("g").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("x"),
    )
    n = F.col("n").cast("double")
    p = F.col("x").cast("double") / n
    z = F.lit(z_e3 / 1000.0)
    z2 = z * z
    denom = F.lit(1.0) + z2 / n
    center = (p + z2 / (F.lit(2.0) * n)) / denom
    hw = (
        z
        * F.sqrt(
            p * (F.lit(1.0) - p) / n
            + z2 / (F.lit(4.0) * n * n)
        )
        / denom
    )
    return agg.select(
        F.col("g").alias(group_col),
        F.col("n").alias("n"),
        F.col("x").alias("hits"),
        F.round(p * 1e6).cast("long").alias("p_e6"),
        F.round((center - hw) * 1e6).cast("long").alias("lo_e6"),
        F.round((center + hw) * 1e6).cast("long").alias("hi_e6"),
    )


def mantel_haenszel(
    df: DataFrame, stratum_col: str, x_col: str, y_col: str
) -> DataFrame:
    """Mantel–Haenszel pooled odds ratio and the CMH chi-square across
    stratified 2×2 tables — the confounder-adjusted association test
    (the formal companion to :func:`simpson_check`'s sign screen):

        OR_MH = Σ_k (n11·n00/n_k) / Σ_k (n10·n01/n_k)
        CMH   = (Σ(n11 − E_k))² / Σ V_k,
        E_k = r1·c1/n,  V_k = r1·r0·c1·c0 / (n²(n−1))

    Per-stratum terms are single divisions of exact integers pre-rounded
    to e6 (order-free sums — playbook rule 7); OR, ln OR (reported in
    ln units — no engine-side exp), and the CMH statistic are fixed
    double expressions.  Single-row strata (n < 2) are excluded (their
    CMH variance is undefined).

    Returns one row ``(n, n_strata, or_mh_e6, ln_or_e6, cmh_e6)``.
    """
    x = F.col(x_col).cast("int")
    y = F.col(y_col).cast("int")
    base = df.select(
        F.col(stratum_col).alias("g"), x.alias("x"), y.alias("y")
    ).where(F.col("x").isNotNull() & F.col("y").isNotNull())
    cells = base.groupBy("g").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(((F.col("x") == 1) & (F.col("y") == 1)).cast("int"))
        .cast("long")
        .alias("n11"),
        F.sum(((F.col("x") == 1) & (F.col("y") == 0)).cast("int"))
        .cast("long")
        .alias("n10"),
        F.sum(((F.col("x") == 0) & (F.col("y") == 1)).cast("int"))
        .cast("long")
        .alias("n01"),
        F.sum(((F.col("x") == 0) & (F.col("y") == 0)).cast("int"))
        .cast("long")
        .alias("n00"),
    )
    nd = F.col("n").cast("double")
    a_term = F.round(
        (F.col("n11") * F.col("n00")).cast("double") / nd * 1e6
    ).cast("long")
    b_term = F.round(
        (F.col("n10") * F.col("n01")).cast("double") / nd * 1e6
    ).cast("long")
    r1 = F.col("n11") + F.col("n10")
    r0 = F.col("n01") + F.col("n00")
    c1 = F.col("n11") + F.col("n01")
    c0 = F.col("n10") + F.col("n00")
    e_term = F.round((r1 * c1).cast("double") / nd * 1e6).cast("long")
    v_term = F.round(
        (r1.cast("decimal(19,0)") * r0.cast("decimal(19,0)")).cast("double")
        * (c1.cast("decimal(19,0)") * c0.cast("decimal(19,0)")).cast("double")
        / (nd * nd * (nd - F.lit(1.0)))
        * 1e6
    ).cast("long")
    agg = cells.where(F.col("n") >= 2).agg(
        F.sum("n").cast("long").alias("n"),
        F.count("*").cast("long").alias("n_strata"),
        F.sum("n11").cast("long").alias("t11"),
        F.sum(a_term).cast("long").alias("sa"),
        F.sum(b_term).cast("long").alias("sb"),
        F.sum(e_term).cast("long").alias("se_sum"),
        F.sum(v_term).cast("long").alias("sv"),
    )
    or_mh = F.col("sa").cast("double") / F.col("sb").cast("double")
    dev = (
        F.col("t11").cast("double")
        - F.col("se_sum").cast("double") / 1e6
    )
    cmh = dev * dev / (F.col("sv").cast("double") / 1e6)
    ok_or = (F.col("sa") > 0) & (F.col("sb") > 0)
    return agg.select(
        "n",
        "n_strata",
        F.when(ok_or, F.round(or_mh * 1e6).cast("long")).alias("or_mh_e6"),
        F.when(ok_or, F.round(F.log(or_mh) * 1e6).cast("long")).alias(
            "ln_or_e6"
        ),
        F.when(
            F.col("sv") > 0, F.round(cmh * 1e6).cast("long")
        ).alias("cmh_e6"),
    )


def contingency_effects(
    df: DataFrame, col_a: str, col_b: str
) -> DataFrame:
    """Contingency-table association summary in one pass: Pearson χ²,
    the likelihood-ratio G statistic, and Cramér's V effect size —
    the "is it associated, and HOW MUCH" companion to
    :func:`chi_square_independence` (which reports χ² alone):

        χ² = Σ (O·N − nᵢ·nⱼ)² / (N·nᵢ·nⱼ),
        G  = 2·Σ O·ln(O·N/(nᵢ·nⱼ)),
        V  = √(χ²/(N·min(r−1, c−1)))

    Per-cell χ² terms are exact rationals and G terms single ln calls,
    each pre-rounded to integer e6 (order-free sums — playbook rule 7);
    the three statistics are fixed double expressions.

    Returns one row ``(n, n_rows, n_cols, dof, chi2_e6, g_e6,
    cramers_v_e6)``.
    """
    cells = (
        df.select(F.col(col_a).alias("a"), F.col(col_b).alias("b"))
        .where(F.col("a").isNotNull() & F.col("b").isNotNull())
        .groupBy("a", "b")
        .agg(F.count("*").cast("long").alias("o"))
    )
    ma = cells.groupBy("a").agg(F.sum("o").cast("long").alias("n_a"))
    mb = cells.groupBy("b").agg(F.sum("o").cast("long").alias("n_b"))
    tot = cells.agg(
        F.sum("o").cast("long").alias("n"),
        F.count_distinct("a").cast("long").alias("r"),
        F.count_distinct("b").cast("long").alias("c"),
    )
    j = (
        cells.join(F.broadcast(ma), "a")
        .join(F.broadcast(mb), "b")
        .crossJoin(F.broadcast(tot))
    )
    od = F.col("o").cast("decimal(19,0)")
    nd = F.col("n").cast("decimal(19,0)")
    nab = F.col("n_a").cast("decimal(19,0)") * F.col("n_b").cast(
        "decimal(19,0)"
    )
    diff = (od * nd - nab).cast("double")
    chi_term = F.round(
        diff
        * diff
        / (
            F.col("n").cast("double")
            * F.col("n_a").cast("double")
            * F.col("n_b").cast("double")
        )
        * 1e6
    ).cast("long")
    g_term = F.round(
        F.lit(2.0)
        * F.col("o").cast("double")
        * F.log(
            F.col("o").cast("double")
            * F.col("n").cast("double")
            / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
        )
        * 1e6
    ).cast("long")
    agg = j.groupBy("n", "r", "c").agg(
        F.sum(chi_term).cast("long").alias("chi2_sum"),
        F.sum(g_term).cast("long").alias("g_sum"),
    )
    chi2 = F.col("chi2_sum").cast("double") / 1e6
    mind = F.least(F.col("r") - 1, F.col("c") - 1)
    v = F.when(
        mind > 0,
        F.sqrt(chi2 / (F.col("n") * mind).cast("double")),
    )
    return agg.select(
        "n",
        F.col("r").alias("n_rows"),
        F.col("c").alias("n_cols"),
        ((F.col("r") - 1) * (F.col("c") - 1)).cast("long").alias("dof"),
        F.col("chi2_sum").alias("chi2_e6"),
        F.col("g_sum").alias("g_e6"),
        F.round(v * 1e6).cast("long").alias("cramers_v_e6"),
    )


def kish_ess(
    df: DataFrame, group_col: str, weight_col: str, *, scale: int = 100
) -> DataFrame:
    """Kish effective sample size of a weighted set per group:

        ESS = (Σw)² / Σw²,   deff = n / ESS

    — the one-number answer to "how much did weighting cost me?"
    (importance weights, survey weights, propensity weights).

    Weights pre-round to integer ``scale`` units; both sums are exact
    (DECIMAL second moment); ESS and the design effect are fixed double
    expressions.  Returns ``(group, n, ess_e2, deff_e6)``.
    """
    w = F.round(F.col(weight_col).cast("double") * scale).cast("long")
    base = df.select(F.col(group_col).alias("g"), w.alias("w")).where(
        F.col("w").isNotNull() & (F.col("w") > 0)
    )
    wd = F.col("w").cast("decimal(19,0)")
    agg = base.groupBy("g").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("w").cast("long").alias("s"),
        F.sum(wd * wd).cast("decimal(38,0)").alias("q"),
    )
    ess = (
        F.col("s").cast("double") * F.col("s").cast("double")
    ) / F.col("q").cast("double")
    return agg.select(
        F.col("g").alias(group_col),
        "n",
        F.round(ess * 100).cast("long").alias("ess_e2"),
        F.round(F.col("n").cast("double") / ess * 1e6)
        .cast("long")
        .alias("deff_e6"),
    )


def ljung_box(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    *,
    max_lag: int = 7,
    scale: int = 100,
) -> DataFrame:
    """Ljung–Box portmanteau test for autocorrelation up to ``max_lag``:

        Q = n(n+2) · Σ_k ρ̂_k² / (n−k)

    — the residual-whiteness check after any time-series fit
    (complements the single-lag :func:`autocorrelation` and the
    first-lag-only :func:`durbin_watson`).

    Exactness: the series pre-rounds to ticks and shifts by its rounded
    integer mean (the ``jarque_bera`` trick), so every lag's numerator
    ``Σ u_t·u_{t+k}`` and the denominator ``Σ u²`` are exact DECIMAL
    integers; each ρ̂_k pre-rounds to e6 and Q is a fixed k-term double
    expression with exact integer factors.

    One ordered pass with ``max_lag`` lead columns over the same
    window.  Returns one row ``(n, q_e6, rho1_e6, ..., rho{L}_e6)``.
    """
    x = F.round(F.col(value_col).cast("double") * scale).cast("long")
    base = df.select(F.col(ts_col).alias("t"), x.alias("x"))
    shift = base.agg(
        F.round(F.sum("x").cast("double") / F.count("*").cast("double"))
        .cast("long")
        .alias("c")
    )
    cen = base.crossJoin(F.broadcast(shift)).select(
        "t", (F.col("x") - F.col("c")).alias("u")
    )
    w = W.orderBy("t")
    cols = [F.col("u")]
    for k in range(1, max_lag + 1):
        cols.append(F.lead("u", k).over(w).alias(f"u{k}"))
    led = cen.select("t", *cols)
    ud = F.col("u").cast("decimal(19,0)")
    aggs = [
        F.count("u").cast("long").alias("n"),
        F.sum("u").cast("long").alias("su"),
        F.sum(ud * ud).cast("decimal(38,0)").alias("den"),
    ]
    for k in range(1, max_lag + 1):
        aggs.append(
            F.sum(ud * F.col(f"u{k}").cast("decimal(19,0)"))
            .cast("decimal(38,0)")
            .alias(f"num{k}")
        )
    mom = led.agg(*aggs)
    n = F.col("n")
    den_ok = F.col("den").cast("double") > 0
    rhos = [
        F.when(
            den_ok,
            F.round(
                F.col(f"num{k}").cast("double")
                / F.col("den").cast("double")
                * 1e6
            ).cast("long"),
        )
        for k in range(1, max_lag + 1)
    ]
    sel = mom.select(
        "n", F.col("den"), *[r.alias(f"rho{k}_e6") for k, r in enumerate(rhos, 1)]
    )
    q = None
    for k in range(1, max_lag + 1):
        term = (
            (F.col(f"rho{k}_e6").cast("double") / 1e6)
            * (F.col(f"rho{k}_e6").cast("double") / 1e6)
            / (n - k).cast("double")
        )
        q = term if q is None else q + term
    q = (n * (n + 2)).cast("double") * q
    return sel.select(
        "n",
        F.when(
            (n > max_lag) & (F.col("den").cast("double") > 0),
            F.round(q * 1e6).cast("long"),
        ).alias("q_e6"),
        *[f"rho{k}_e6" for k in range(1, max_lag + 1)],
    )


def cluster_agreement(
    df: DataFrame, cluster_col: str, label_col: str
) -> DataFrame:
    """External cluster-evaluation metrics between a cluster assignment
    and ground-truth labels: purity and normalized mutual information

        purity = Σ_c max_l n_cl / N,
        NMI = I(C;L) / √(H(C)·H(L))

    — the standard "did the clustering recover the classes" scorecard.

    Exactness: purity's numerator is an exact integer (per-cluster max
    via a deterministic window); MI and both entropies use per-cell /
    per-margin nanonat pre-rounds (the ``mutual_information``
    contract); NMI is one fixed double expression over the three
    integer sums.

    Returns one row ``(n, n_clusters, n_labels, purity_e6, mi_e9,
    h_c_e9, h_l_e9, nmi_e6)``.
    """
    base = df.select(
        F.col(cluster_col).alias("c"), F.col(label_col).alias("l")
    ).where(F.col("c").isNotNull() & F.col("l").isNotNull())
    cells = base.groupBy("c", "l").agg(F.count("*").cast("long").alias("n_cl"))
    mc = cells.groupBy("c").agg(F.sum("n_cl").cast("long").alias("n_c"))
    ml = cells.groupBy("l").agg(F.sum("n_cl").cast("long").alias("n_l"))
    tot = cells.agg(F.sum("n_cl").cast("long").alias("n"))
    # purity: per-cluster max cell
    w = W.partitionBy("c").orderBy(F.col("n_cl").desc(), F.col("l"))
    best = (
        cells.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .agg(F.sum("n_cl").cast("long").alias("pure_sum"))
    )
    # MI terms
    j = (
        cells.join(F.broadcast(mc), "c")
        .join(F.broadcast(ml), "l")
        .crossJoin(F.broadcast(tot))
    )
    mi_term = F.round(
        F.col("n_cl").cast("double")
        / F.col("n").cast("double")
        * F.log(
            F.col("n").cast("double")
            * F.col("n_cl").cast("double")
            / (F.col("n_c").cast("double") * F.col("n_l").cast("double"))
        )
        * 1e9
    ).cast("long")
    mi_sum = j.agg(F.sum(mi_term).cast("long").alias("mi_e9"))

    def entropy(margins, cnt_col):
        t = F.round(
            -(F.col(cnt_col).cast("double") / F.col("n").cast("double"))
            * F.log(
                F.col(cnt_col).cast("double") / F.col("n").cast("double")
            )
            * 1e9
        ).cast("long")
        return margins.crossJoin(F.broadcast(tot)).agg(
            F.sum(t).cast("long").alias("h"),
            F.count("*").cast("long").alias("k"),
        )

    hc = entropy(mc, "n_c").select(
        F.col("h").alias("h_c_e9"), F.col("k").alias("n_clusters")
    )
    hl = entropy(ml, "n_l").select(
        F.col("h").alias("h_l_e9"), F.col("k").alias("n_labels")
    )
    out = (
        tot.crossJoin(F.broadcast(best))
        .crossJoin(F.broadcast(mi_sum))
        .crossJoin(F.broadcast(hc))
        .crossJoin(F.broadcast(hl))
    )
    nmi = F.when(
        (F.col("h_c_e9") > 0) & (F.col("h_l_e9") > 0),
        (F.col("mi_e9").cast("double") / 1e9)
        / F.sqrt(
            (F.col("h_c_e9").cast("double") / 1e9)
            * (F.col("h_l_e9").cast("double") / 1e9)
        ),
    )
    return out.select(
        "n",
        "n_clusters",
        "n_labels",
        F.round(
            F.col("pure_sum").cast("double") / F.col("n").cast("double")
            * 1e6
        )
        .cast("long")
        .alias("purity_e6"),
        "mi_e9",
        "h_c_e9",
        "h_l_e9",
        F.round(nmi * 1e6).cast("long").alias("nmi_e6"),
    )


def theil_index(
    df: DataFrame, group_col: str, value_col: str, *, scale: int = 100
) -> DataFrame:
    """Theil T inequality index with its exact between/within-group
    decomposition (the property Gini lacks):

        T = Σᵢ (xᵢ/X)·ln(n·xᵢ/X) = T_between + Σ_g (X_g/X)·T_g

    — how much inequality lives BETWEEN segments vs INSIDE them.

    Exactness: values pre-round to integer ticks; every ln argument is
    a ratio of exact integers and every term pre-rounds to integer
    nanonats (the ``mutual_information`` contract), so all three
    reported indices are order-free integer sums (one division each at
    the end).  Non-positive values drop (Theil is defined on x > 0).

    Returns one row ``(n, n_groups, t_total_e9, t_between_e9,
    t_within_e9)`` — total = between + within to the rounding unit.
    """
    x = F.round(F.col(value_col).cast("double") * scale).cast("long")
    base = df.select(F.col(group_col).alias("g"), x.alias("x")).where(
        F.col("x").isNotNull() & (F.col("x") > 0) & F.col("g").isNotNull()
    )
    gtot = base.groupBy("g").agg(
        F.count("*").cast("long").alias("n_g"),
        F.sum("x").cast("long").alias("x_g"),
    )
    tot = gtot.agg(
        F.sum("n_g").cast("long").alias("n"),
        F.sum("x_g").cast("long").alias("x_tot"),
        F.count("*").cast("long").alias("n_groups"),
    )
    # total: per-row terms against the global mean
    rows_t = base.crossJoin(F.broadcast(tot)).select(
        F.round(
            F.col("x").cast("double")
            / F.col("x_tot").cast("double")
            * F.log(
                F.col("n").cast("double")
                * F.col("x").cast("double")
                / F.col("x_tot").cast("double")
            )
            * 1e9
        )
        .cast("long")
        .alias("t")
    )
    t_total = rows_t.agg(F.sum("t").cast("long").alias("t_total_e9"))
    # between: group shares vs group population shares
    between_t = gtot.crossJoin(F.broadcast(tot)).select(
        F.round(
            F.col("x_g").cast("double")
            / F.col("x_tot").cast("double")
            * F.log(
                (
                    F.col("x_g").cast("double")
                    / F.col("x_tot").cast("double")
                )
                / (
                    F.col("n_g").cast("double")
                    / F.col("n").cast("double")
                )
            )
            * 1e9
        )
        .cast("long")
        .alias("t")
    )
    t_between = between_t.agg(F.sum("t").cast("long").alias("t_between_e9"))
    # within: per-row terms against the OWN group mean, share-weighted
    within_rows = (
        base.join(F.broadcast(gtot), "g")
        .crossJoin(F.broadcast(tot))
        .select(
            F.round(
                (
                    F.col("x_g").cast("double")
                    / F.col("x_tot").cast("double")
                )
                * (
                    F.col("x").cast("double")
                    / F.col("x_g").cast("double")
                    * F.log(
                        F.col("n_g").cast("double")
                        * F.col("x").cast("double")
                        / F.col("x_g").cast("double")
                    )
                )
                * 1e9
            )
            .cast("long")
            .alias("t")
        )
    )
    t_within = within_rows.agg(F.sum("t").cast("long").alias("t_within_e9"))
    return (
        tot.crossJoin(F.broadcast(t_total))
        .crossJoin(F.broadcast(t_between))
        .crossJoin(F.broadcast(t_within))
        .select(
            "n", "n_groups", "t_total_e9", "t_between_e9", "t_within_e9"
        )
    )
