"""Time-series and sequential statistics: autocorrelation, changepoints,
rolling measures, spectral/burst diagnostics, financial series stats.

Split out of ``stats.py`` in round 9 (VERDICT r8 item 8): the module had
grown to ~6,000 lines.  Public API is unchanged — ``stats.py`` re-exports
everything, so ``from smartpy_arc_spark.operators.stats import X`` keeps
working for every operator.  Design notes live on each function.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from smartpy_arc_spark.operators._stats_common import _check_e4_scale

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

