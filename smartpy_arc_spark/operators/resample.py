"""Time-series resampling to a fixed grid with forward fill.

The gap-filling operator every metrics/feature pipeline needs: an
irregular event stream becomes one row per (key, bucket) on a regular
grid, buckets with no events carrying the last observed value forward.

Plan shape (scale notes for 100 TB):
  * bucket aggregation — one shuffle on (key, bucket), map-side combined;
  * per-key grid — ``sequence()`` exploded from each key's own [min, max]
    bucket range, so grid size is span/interval per key, NEVER a global
    cross join against a calendar dimension;
  * forward fill — ``last(value, ignorenulls=True)`` over the per-key
    bucket order: one more shuffle-free window pass over the same
    partitioning (Catalyst reuses the exchange).

Dense keys with long spans dominate output size: interval choice is the
knob (document in the pipeline, not hidden here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from smartpy_arc_spark.operators.stats import _check_e4_scale


def resample_ffill(
    df: DataFrame,
    *,
    key_col: str,
    ts_col: str,
    value_col: str,
    interval_sec: int,
) -> DataFrame:
    """Resample ``value_col`` onto an ``interval_sec`` grid per key:
    bucket value = LAST event in the bucket (by event time), empty buckets
    forward-filled from the previous bucket.  Output: (key, bucket_start
    timestamp, value, filled boolean)."""
    bucket = (F.unix_micros(F.col(ts_col).cast("timestamp"))
              / F.lit(interval_sec * 1_000_000)).cast("long")
    per_bucket = (
        df.select(
            F.col(key_col).alias("_k"),
            bucket.alias("_b"),
            F.col(ts_col).alias("_t"),
            F.col(value_col).alias("_v"),
        )
        .groupBy("_k", "_b")
        .agg(F.max_by("_v", "_t").alias("_v"))
    )
    span = per_bucket.groupBy("_k").agg(
        F.min("_b").alias("_b0"), F.max("_b").alias("_b1")
    )
    grid = span.select(
        "_k", F.explode(F.sequence("_b0", "_b1")).alias("_b")
    )
    joined = grid.join(per_bucket, on=["_k", "_b"], how="left")
    w = (
        W.partitionBy("_k")
        .orderBy("_b")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return joined.select(
        F.col("_k").alias(key_col),
        F.timestamp_micros(F.col("_b") * F.lit(interval_sec * 1_000_000)).alias(
            "bucket_start"
        ),
        F.last("_v", ignorenulls=True).over(w).alias(value_col),
        F.col("_v").isNull().alias("filled"),
    )


def resample_interpolate(
    df: DataFrame,
    *,
    key_col: str,
    ts_col: str,
    value_col: str,
    interval_sec: int,
) -> DataFrame:
    """Resample onto an ``interval_sec`` grid with LINEAR interpolation
    across empty buckets (the numeric-feature companion to
    ``resample_ffill``'s step function).

    Empty bucket b between observed buckets p < b < n gets
    ``v_p + (v_n - v_p) · (b - p)/(n - p)``; buckets after the last
    observation carry it flat (no extrapolation).  Same plan shape as
    ffill — one (key, bucket) shuffle, then two window passes over the
    SAME partitioning (prev via last-ignorenulls, next via
    first-ignorenulls over the reversed frame); Catalyst reuses one
    exchange for both.
    """
    bucket = (F.unix_micros(F.col(ts_col).cast("timestamp"))
              / F.lit(interval_sec * 1_000_000)).cast("long")
    per_bucket = (
        df.select(
            F.col(key_col).alias("_k"),
            bucket.alias("_b"),
            F.col(ts_col).alias("_t"),
            F.col(value_col).alias("_v"),
        )
        .groupBy("_k", "_b")
        .agg(F.max_by("_v", "_t").alias("_v"))
    )
    span = per_bucket.groupBy("_k").agg(
        F.min("_b").alias("_lo"), F.max("_b").alias("_hi")
    )
    grid = span.select(
        "_k", F.explode(F.sequence("_lo", "_hi")).alias("_b")
    )
    joined = grid.join(per_bucket, ["_k", "_b"], "left")

    w_prev = (
        W.partitionBy("_k").orderBy("_b")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_next = (
        W.partitionBy("_k").orderBy("_b")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    prev_v = F.last("_v", ignorenulls=True).over(w_prev)
    next_v = F.first("_v", ignorenulls=True).over(w_next)
    prev_b = F.last(
        F.when(F.col("_v").isNotNull(), F.col("_b")), ignorenulls=True
    ).over(w_prev)
    next_b = F.first(
        F.when(F.col("_v").isNotNull(), F.col("_b")), ignorenulls=True
    ).over(w_next)

    interp = F.when(F.col("_v").isNotNull(), F.col("_v")).otherwise(
        F.when(
            next_v.isNull(), prev_v  # after last observation: flat
        ).otherwise(
            prev_v
            + (next_v - prev_v)
            * (F.col("_b") - prev_b)
            / (next_b - prev_b)
        )
    )
    return joined.select(
        F.col("_k").alias(key_col),
        F.timestamp_micros(
            F.col("_b") * F.lit(interval_sec * 1_000_000)
        ).alias("bucket_start"),
        (F.round(interp, 4) + F.lit(0.0)).alias(value_col),
        F.col("_v").isNull().alias("interpolated"),
    )


def ewma(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    alpha: float = 0.25,
    tiebreak_col: str | None = None,
    scale: int = 100,
    raw: bool = False,
) -> DataFrame:
    """Per-key exponentially weighted moving average (final smoothed value
    per key): ``s_i = alpha * x_i + (1 - alpha) * s_{i-1}``, seeded with
    the first observation.

    EWMA is inherently sequential, so it is computed as one in-order fold
    per key: ``collect_list(struct(order..., x)) → sort_array →
    aggregate()`` — a single shuffle on the key, the fold itself runs in
    codegen (no Python).  The per-key series must fit in one task (the
    same bounded-series contract as ``sessionize``/``resample_*``; for
    unbounded keys, window the input first).

    Engine portability: a left fold evaluates in a FIXED order, so the
    result is bit-identical in any engine that folds the same list —
    unlike a ``sum()`` of weighted terms, whose accumulation order is
    engine-chosen.  With a dyadic ``alpha`` (0.25, 0.5) every weight is an
    exact binary fraction on exact fixed-point ticks.

    Returns ``(key, n_obs, last_value, ewma_value)`` (ewma rounded to 6,
    in original value units; ``raw=True`` skips the rounding so callers
    can rescale to a bit-exact integer representation in ONE rounding
    step — double rounding would reintroduce cross-engine drift).
    """
    order = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    ticks = F.round(F.col(value_col) * scale).cast("double")
    item = F.struct(*order, ticks.alias("x"))
    per_key = df.groupBy(key_col).agg(
        F.sort_array(F.collect_list(item)).alias("series")
    )
    xs = F.transform(F.col("series"), lambda s: s["x"])
    folded = F.aggregate(
        F.slice(xs, 2, F.greatest(F.size(xs) - 1, F.lit(0))),
        F.element_at(xs, 1),
        lambda acc, x: F.lit(alpha) * x + F.lit(1.0 - alpha) * acc,
    )
    return per_key.select(
        F.col(key_col),
        F.size("series").cast("long").alias("n_obs"),
        (F.element_at(xs, -1) / scale).alias("last_value"),
        (
            (folded / scale)
            if raw
            else (F.round(folded / scale, 6) + F.lit(0.0))
        ).alias("ewma_value"),
    )


def holt_linear(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    alpha: float = 0.5,
    beta: float = 0.25,
    horizon: int = 3,
    tiebreak_col: str | None = None,
    scale: int = 100,
) -> DataFrame:
    """Per-key Holt double exponential smoothing (level + linear trend)
    with an h-step-ahead forecast — the next rung above ``ewma`` for
    trending series.

    Same in-order fold shape as ``ewma`` (collect → sort → ``aggregate``
    in codegen; bounded-series-per-key contract), with a struct
    accumulator ``(l, b)``:

        l_t = α·x_t + (1−α)(l + b)
        b_t = β(l_t − l) + (1−β)·b

    seeded ``l₀ = x₁, b₀ = x₂ − x₁`` (0 for singleton series) and folded
    over x₂…x_n.  A left fold evaluates in a fixed order, and dyadic
    α/β on fixed-point ticks keep every step an exact binary-float
    expression — bit-identical in any engine folding the same list.

    Returns ``(key, n_obs, level_e4, trend_e4, forecast_e4)`` — level,
    per-step trend and the ``l + h·b`` forecast in integer
    ten-thousandths of a value unit.
    """
    order = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    ticks = F.round(F.col(value_col) * scale).cast("double")
    item = F.struct(*order, ticks.alias("x"))
    per_key = df.groupBy(key_col).agg(
        F.sort_array(F.collect_list(item)).alias("series")
    )
    xs = F.transform(F.col("series"), lambda s: s["x"])
    a, b1 = F.lit(float(alpha)), F.lit(float(beta))
    init = F.struct(
        F.element_at(xs, 1).alias("l"),
        F.coalesce(
            # try_: a singleton series has no x₂ (ANSI element_at throws)
            F.try_element_at(xs, F.lit(2)) - F.element_at(xs, 1), F.lit(0.0)
        ).alias("b"),
    )

    def step(acc, x):
        lt = a * x + (F.lit(1.0) - a) * (acc["l"] + acc["b"])
        return F.struct(
            lt.alias("l"),
            (
                b1 * (a * x + (F.lit(1.0) - a) * (acc["l"] + acc["b"]) - acc["l"])
                + (F.lit(1.0) - b1) * acc["b"]
            ).alias("b"),
        )

    folded = F.aggregate(
        F.slice(xs, 2, F.greatest(F.size(xs) - 1, F.lit(0))), init, step
    )
    e4 = lambda c: F.round(c / scale * 10000).cast("long")  # noqa: E731
    return per_key.select(
        F.col(key_col),
        F.size("series").cast("long").alias("n_obs"),
        e4(folded["l"]).alias("level_e4"),
        e4(folded["b"]).alias("trend_e4"),
        e4(folded["l"] + F.lit(float(horizon)) * folded["b"]).alias(
            "forecast_e4"
        ),
    )


def seasonal_naive_eval(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    cutoff: str,
    *,
    scale: int = 100,
) -> DataFrame:
    """Seasonal-naive forecast backtest: train an (key, hour-of-day)
    mean-value profile on rows before ``cutoff``, predict each test row
    (at or after it) by its profile cell, and report the mean absolute
    error — the baseline every fancier forecaster must beat.

    Exactness: with train sum ``s`` and count ``c`` in fixed-point
    ticks, each test error is ``|v·c − s| / c``, so the per-cell MAE is
    the single division ``Σ|v·c − s| / (c·n_test)`` over an exact
    integer numerator — no float accumulates anywhere.  Two scans (one
    per split, both pruned by the cutoff predicate at the source), one
    bounded (key × 24) profile broadcast back.

    Returns per cell: ``(key, hour, n_train, n_test, mae_e4)`` —
    MAE in value-unit ten-thousandths.
    """
    ticks = F.round(F.col(value_col) * scale).cast("long")
    hour = F.hour(F.col(ts_col))
    base = df.select(
        F.col(key_col).alias("k"),
        hour.alias("h"),
        ticks.alias("v"),
        (F.col(ts_col) < F.lit(cutoff).cast("timestamp")).alias("is_train"),
    ).where(F.col("v").isNotNull())
    train = (
        base.where("is_train")
        .groupBy("k", "h")
        .agg(
            F.count("*").cast("long").alias("c"),
            F.sum("v").cast("long").alias("s"),
        )
    )
    test = base.where(~F.col("is_train"))
    scored = test.join(F.broadcast(train), ["k", "h"]).select(
        "k",
        "h",
        "c",
        F.abs(
            F.col("v").cast("decimal(38,0)") * F.col("c") - F.col("s")
        ).alias("num"),
    )
    return (
        scored.groupBy("k", "h", "c")
        .agg(
            F.count("*").cast("long").alias("n_test"),
            F.sum("num").alias("total_num"),
        )
        .select(
            F.col("k").alias(key_col),
            F.col("h").alias("hour"),
            F.col("c").alias("n_train"),
            "n_test",
            # num/(c·n_test) is the MAE in ticks; ×(10000/scale) → e4
            F.round(
                F.col("total_num").cast("double")
                * (10000.0 / scale)
                / (F.col("c").cast("double") * F.col("n_test").cast("double"))
            )
            .cast("long")
            .alias("mae_e4"),
        )
    )


def time_weighted_avg(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    tiebreak_col: str | None = None,
    scale: int = 100,
) -> DataFrame:
    """Per-key time-weighted average (TWAP): each observation holds its
    value until the next one, so the average weights every value by its
    holding duration — the correct mean for irregularly sampled signals
    (a price quoted once overnight must not count like one tick).

    Exactness: with values in fixed-point ticks and durations in whole
    seconds, the weighted area ``Σ vᵢ·Δtᵢ`` is an exact DECIMAL(38,0)
    sum and the TWAP is ONE division by the total span.  Per-key window
    (lead over the key partition) — no global ordering anywhere.
    Single-observation keys fall back to the plain value.

    Returns ``(key, n_obs, span_sec, twap_e4)``.
    """
    from pyspark.sql import Window

    ticks = F.round(F.col(value_col) * scale).cast("long")
    base = df.select(
        F.col(key_col).alias("k"),
        *([F.col(tiebreak_col)] if tiebreak_col else []),
        F.col(ts_col).alias("__ts"),
        ticks.alias("v"),
    ).where(F.col("v").isNotNull())
    order = [F.col("__ts")] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    w = Window.partitionBy("k").orderBy(*order)
    # microsecond durations: whole-second truncation would disagree with
    # any engine that subtracts full-resolution epochs
    stepped = base.withColumn(
        "dt",
        (
            F.unix_micros(F.lead("__ts").over(w).cast("timestamp"))
            - F.unix_micros(F.col("__ts").cast("timestamp"))
        ).cast("long"),
    )
    return (
        stepped.groupBy("k")
        .agg(
            F.count("*").cast("long").alias("n_obs"),
            F.sum("dt").cast("long").alias("span_us"),
            F.sum(
                F.col("v").cast("decimal(38,0)") * F.coalesce(F.col("dt"), F.lit(0))
            ).alias("area"),
            F.max_by("v", F.struct(*order)).alias("last_v"),
        )
        .select(
            F.col("k").alias(key_col),
            "n_obs",
            F.floor(
                F.coalesce(F.col("span_us"), F.lit(0)) / 1000000
            )
            .cast("long")
            .alias("span_sec"),
            F.round(
                F.when(
                    F.coalesce(F.col("span_us"), F.lit(0)) > 0,
                    F.col("area").cast("double")
                    / F.col("span_us").cast("double"),
                )
                .otherwise(F.col("last_v").cast("double"))
                / scale
                * 10000
            )
            .cast("long")
            .alias("twap_e4"),
        )
    )


def seasonal_decompose(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    *,
    period: int = 12,
    scale: int = 100,
) -> DataFrame:
    """Classical additive seasonal decomposition (the moving-average STL
    ancestor, Kendall/Stuart): per calendar month,

        y = trend + seasonal + remainder

    with trend the centered MA of even order ``period`` (half-weight end
    points: ``(y₋ₕ + 2·Σ y₋ₕ₊₁..ₕ₋₁ + yₕ) / 2·period``, h = period/2) and
    seasonal the per-month-of-cycle mean of the detrended series.

    Everything is EXACT integer arithmetic until one division per output
    value: y aggregates to integer ``scale`` units, the MA numerator is an
    integer window sum over a RANGE frame keyed by month index (so data
    gaps disqualify a window via the count guard instead of silently
    shifting it), detrended values stay ×2·period integers, and seasonal
    means are a single division of integer sums — bit-identical on any
    engine.  Edge months (first/last h) have null trend/remainder, as in
    every classical implementation.

    One monthly aggregate, one bounded window pass over the month table
    (#months rows — calendar-bounded, the `mom_change` allowlist shape),
    one tiny month-of-cycle join.  Returns ``(month, y_scaled, trend_e2,
    seasonal_e2, remainder_e2)`` with e2 = hundredths of a value unit.
    """
    if period % 2:
        raise ValueError("period must be even (centered MA of even order)")
    h = period // 2
    denom = 2 * period
    monthly = (
        df.select(
            F.date_trunc("month", F.col(ts_col)).alias("month"),
            F.round(F.col(value_col).cast("double") * scale)
            .cast("long")
            .alias("ys"),
        )
        .groupBy("month")
        .agg(F.sum("ys").alias("y"))
        .withColumn(
            "midx", F.year("month") * 12 + F.month("month")
        )
    )
    full = W.orderBy("midx").rangeBetween(-h, h)
    inner = W.orderBy("midx").rangeBetween(-(h - 1), h - 1)
    t = monthly.select(
        "month",
        "midx",
        "y",
        (F.sum("y").over(full) + F.sum("y").over(inner)).alias("num"),
        F.count("*").over(full).alias("nwin"),
    ).withColumn(
        "dx", F.when(F.col("nwin") == period + 1, F.lit(denom) * F.col("y") - F.col("num"))
    )
    moc = (F.col("midx") % period).alias("moc")  # month-of-cycle
    seas = (
        t.where(F.col("dx").isNotNull())
        .groupBy(moc)
        .agg(F.sum("dx").alias("sdx"), F.count("*").alias("cnt"))
        .select(
            "moc",
            F.round(
                F.col("sdx").cast("double") * 100
                / (F.lit(float(denom * scale)) * F.col("cnt").cast("double"))
            ).cast("long").alias("seasonal_e2"),
        )
    )
    out = (
        t.withColumn("moc", F.col("midx") % period)
        .join(F.broadcast(seas), "moc", "left")
        .select(
            "month",
            F.col("y").alias("y_scaled"),
            F.when(
                F.col("dx").isNotNull(),
                F.round(
                    F.col("num").cast("double") * 100 / F.lit(float(denom * scale))
                ).cast("long"),
            ).alias("trend_e2"),
            "seasonal_e2",
            F.when(
                F.col("dx").isNotNull(),
                F.round(
                    F.col("dx").cast("double") * 100 / F.lit(float(denom * scale))
                ).cast("long")
                - F.col("seasonal_e2"),
            ).alias("remainder_e2"),
        )
        .orderBy("month")
    )
    return out


def dtw_pairwise(
    df: DataFrame,
    *,
    key_col: str,
    order_col: str,
    value_col: str,
    band: int | None = None,
    scale: int = 100,
) -> DataFrame:
    """Dynamic Time Warping distance between every pair of per-key series
    (Sakoe & Chiba 1978) — the standard elastic distance for comparing
    time series that are similar in SHAPE but locally stretched or
    shifted (daily traffic curves, sensor traces, per-segment seasonality).

    Plan: one groupBy(key) assembles each ordered series (values
    pre-rounded to integer ``scale`` units so assembly is order-exact);
    the bounded key×key pair grid (series comparison is quadratic in
    KEYS by definition — callers pass a bounded key domain, e.g. event
    types or segments, never raw ids) joins the two series arrays and a
    vectorized numpy DP inside ``mapInPandas`` computes the alignment
    cost, O(n·m) per pair or O(n·band) with the Sakoe-Chiba ``band``.

    Returns ``(key_a, key_b, len_a, len_b, dtw_e2)`` for key_a < key_b —
    ``dtw_e2`` the total |a−b| alignment cost in integer hundredths.
    """
    import numpy as np
    import pandas as pd

    from smartpy_arc_spark.session import ensure_worker_imports

    ensure_worker_imports(df.sparkSession)
    ys = F.round(F.col(value_col).cast("double") * scale).cast("long")
    series = (
        df.select(F.col(key_col).alias("k"), F.col(order_col).alias("o"), ys.alias("v"))
        .groupBy("k")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("o", "v"))), lambda s: s["v"]
            ).alias("series")
        )
    )
    pairs = (
        series.select(F.col("k").alias("key_a"), F.col("series").alias("sa"))
        .join(
            series.select(F.col("k").alias("key_b"), F.col("series").alias("sb")),
            F.col("key_a") < F.col("key_b"),
        )
    )

    def compute(batches):
        for pdf in batches:
            rows = []
            for ka, kb, sa, sb in zip(
                pdf["key_a"], pdf["key_b"], pdf["sa"], pdf["sb"]
            ):
                a = np.asarray(sa, dtype=np.float64)
                b = np.asarray(sb, dtype=np.float64)
                n, m = len(a), len(b)
                w = max(band, abs(n - m)) if band is not None else max(n, m)
                INF = np.inf
                prev = np.full(m + 1, INF)
                prev[0] = 0.0
                for i in range(1, n + 1):
                    cur = np.full(m + 1, INF)
                    lo, hi = max(1, i - w), min(m, i + w)
                    if lo > hi:
                        prev = cur
                        continue
                    cost = np.abs(a[i - 1] - b[lo - 1 : hi])
                    # vectorized DP row: min of (insert, delete, match)
                    # still needs the left-to-right scan for cur[j-1]
                    for j, c in zip(range(lo, hi + 1), cost):
                        cur[j] = c + min(prev[j], prev[j - 1], cur[j - 1])
                    prev = cur
                d = prev[m]
                rows.append(
                    (ka, kb, n, m,
                     int(round(d / scale * 100)) if np.isfinite(d) else None)
                )
            yield pd.DataFrame(
                rows, columns=["key_a", "key_b", "len_a", "len_b", "dtw_e2"]
            )

    return pairs.mapInPandas(
        compute,
        f"key_a string, key_b string, len_a int, len_b int, dtw_e2 long",
    )


def holt_winters(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    period: int = 12,
    alpha: float = 0.5,
    beta: float = 0.25,
    gamma: float = 0.5,
    scale: int = 100,
) -> DataFrame:
    """Per-key Holt-Winters additive triple exponential smoothing (level +
    trend + seasonal) — the rung above :func:`holt_linear` for seasonal
    series:

        l_t = α(y_t − s_{t−p}) + (1−α)(l + b)
        b_t = β(l_t − l) + (1−β)b
        s_t = γ(y_t − l_t) + (1−γ)s_{t−p}

    State is a single LIST accumulator ``[l, b, s₁…s_p]`` (the seasonal
    queue rotates by list slicing) folded in order with ``F.aggregate``
    — the same fixed-order codegen fold as holt/ewma, so with dyadic
    α/β/γ on fixed-point ticks every step is the identical binary-float
    expression on any engine.  Init is the textbook two-season scheme:
    ``l₀ = mean(season 1)``, ``b₀ = (mean(season 2) − mean(season 1))/p``,
    ``s_i = y_i − l₀``; the fold consumes observations p+1…n.  Keys with
    fewer than 2p observations return nulls (insufficient history).

    Returns ``(key, n_obs, level_e4, trend_e4, f1_e4, f2_e4)`` —
    one- and two-step-ahead forecasts ``l + h·b + s[h]`` in integer
    ten-thousandths.
    """
    order = [F.col(ts_col)]
    ticks = F.round(F.col(value_col).cast("double") * scale).cast("double")
    item = F.struct(*order, ticks.alias("x"))
    per_key = df.groupBy(key_col).agg(
        F.sort_array(F.collect_list(item)).alias("series")
    )
    xs = F.transform(F.col("series"), lambda s: s["x"])
    p = period
    a, b1, g1 = F.lit(float(alpha)), F.lit(float(beta)), F.lit(float(gamma))

    def list_mean(arr):
        # explicit in-order fold: engines may sum builtin list_sum in any
        # order; a left fold is fixed
        return F.aggregate(arr, F.lit(0.0), lambda acc, v: acc + v) / F.lit(
            float(p)
        )

    season1 = F.slice(xs, 1, p)
    season2 = F.slice(xs, p + 1, p)
    l0 = list_mean(season1)
    b0 = (list_mean(season2) - l0) / F.lit(float(p))
    s0 = F.transform(season1, lambda v: v - l0)
    init = F.concat(F.array(l0, b0), s0)

    def step(acc, y):
        l_prev = F.element_at(acc, 1)
        b_prev = F.element_at(acc, 2)
        s_old = F.element_at(acc, 3)
        l_new = a * (y - s_old) + (F.lit(1.0) - a) * (l_prev + b_prev)
        # no let-binding in HOF lambdas: l_new repeats inside b/s updates
        b_new = (
            b1 * (a * (y - s_old) + (F.lit(1.0) - a) * (l_prev + b_prev) - l_prev)
            + (F.lit(1.0) - b1) * b_prev
        )
        s_new = (
            g1 * (y - (a * (y - s_old) + (F.lit(1.0) - a) * (l_prev + b_prev)))
            + (F.lit(1.0) - g1) * s_old
        )
        return F.concat(
            F.array(l_new, b_new), F.slice(acc, 4, p - 1), F.array(s_new)
        )

    folded = F.aggregate(
        F.slice(xs, p + 1, F.greatest(F.size(xs) - p, F.lit(0))), init, step
    )
    ok = F.size(xs) >= 2 * p
    e4 = lambda c: F.when(ok, F.round(c / scale * 10000).cast("long"))  # noqa: E731
    l_f = F.element_at(folded, 1)
    b_f = F.element_at(folded, 2)
    return per_key.select(
        F.col(key_col),
        F.size("series").cast("long").alias("n_obs"),
        e4(l_f).alias("level_e4"),
        e4(b_f).alias("trend_e4"),
        e4(l_f + b_f + F.element_at(folded, 3)).alias("f1_e4"),
        e4(l_f + F.lit(2.0) * b_f + F.element_at(folded, 4)).alias("f2_e4"),
    )


def croston(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    *,
    alpha: float = 0.25,
) -> DataFrame:
    """Croston's method for intermittent demand: per key, the daily
    demand series (row counts on a dense day spine over the global
    observation window) is folded into two coupled EWMAs — demand size
    ``z`` over the *non-zero* observations and inter-demand interval
    ``p`` — whose ratio ``z/p`` is the per-period demand-rate forecast.
    The standard forecaster for spare-parts/sparse-SKU series, where
    plain exponential smoothing decays to zero between demands.

    Layout: one shuffle builds per-(key, day) counts; the dense spine is
    a bounded calendar ``sequence()`` explode per key (span is calendar-
    bounded, not data-bounded, so the fold list stays small at any SF);
    the fold itself is one ``aggregate`` HOF in codegen — bit-exact in
    any engine folding the same list because demands/intervals are
    integers and ``alpha`` is dyadic.

    Returns ``(key, n_periods, n_demand, z_e4, p_e4, rate_e6)`` with
    ``z``/``p`` in ten-thousandths and the forecast rate ``z/p`` (one
    IEEE division) in millionths; NULL smoothing outputs for keys with
    zero demand periods.
    """
    day = F.to_date(F.col(ts_col))
    daily = (
        df.select(F.col(key_col).alias("k"), day.alias("d"))
        .groupBy("k", "d")
        .agg(F.count("*").cast("double").alias("x"))
    )
    bounds = df.select(
        F.min(day).alias("d0"), F.max(day).alias("d1")
    )
    spine = (
        daily.select("k").distinct()
        .crossJoin(F.broadcast(bounds))
        .select("k", F.explode(F.sequence("d0", "d1")).alias("d"))
    )
    dense = spine.join(daily, ["k", "d"], "left").select(
        "k", "d", F.coalesce("x", F.lit(0.0)).alias("x")
    )
    per_key = dense.groupBy("k").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("d"), F.col("x")))
        ).alias("series")
    )
    xs = F.transform(F.col("series"), lambda s: s["x"])
    a = F.lit(float(alpha))
    one = F.lit(1.0)
    zero = F.lit(0.0)
    # acc = [z, p, q, seen]: smoothed demand, smoothed interval, periods
    # since last demand, 0/1 any-demand flag.
    init = F.array(zero, zero, zero, zero)

    def step(acc, x):
        z, p, q, seen = (F.element_at(acc, i) for i in (1, 2, 3, 4))
        pos = x > zero
        interval = q + one
        z_new = F.when(
            pos, F.when(seen == one, a * x + (one - a) * z).otherwise(x)
        ).otherwise(z)
        p_new = F.when(
            pos,
            F.when(seen == one, a * interval + (one - a) * p).otherwise(
                interval
            ),
        ).otherwise(p)
        q_new = F.when(pos, zero).otherwise(interval)
        seen_new = F.when(pos, one).otherwise(seen)
        return F.array(z_new, p_new, q_new, seen_new)

    folded = F.aggregate(xs, init, step)
    z_f, p_f = F.element_at(folded, 1), F.element_at(folded, 2)
    ok = F.element_at(folded, 4) == one
    e4 = lambda c: F.when(ok, F.round(c * 10000).cast("long"))  # noqa: E731
    n_demand = F.aggregate(
        xs, F.lit(0).cast("long"),
        lambda acc, x: acc + F.when(x > zero, 1).otherwise(0),
    )
    return per_key.select(
        F.col("k").alias(key_col),
        F.size("series").cast("long").alias("n_periods"),
        n_demand.alias("n_demand"),
        e4(z_f).alias("z_e4"),
        e4(p_f).alias("p_e4"),
        F.when(ok, F.round(z_f / p_f * 1000000).cast("long")).alias(
            "rate_e6"
        ),
    )


def rolling_distinct(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    *,
    window_days: int = 7,
) -> DataFrame:
    """Trailing-N-day distinct-entity count per (key, day) — the rolling
    WAU/MAU primitive.  ``count(DISTINCT ...) OVER (RANGE ...)`` has no
    decomposable form, so the scale path is a *contribution explode*:
    each distinct (key, entity, day) presence covers the ``window_days``
    output days it can be seen from (a bounded ×N fan-out that partial
    aggregation collapses), then one distinct-agg per (key, day).  No
    range join, no per-day self-join — linear in input at any SF.

    Output days are restricted to days the key actually had activity.
    Returns ``(key, day, n_active)``.
    """
    day = F.to_date(F.col(ts_col))
    present = (
        df.select(
            F.col(key_col).alias("k"),
            F.col(id_col).alias("e"),
            day.alias("d"),
        )
        .distinct()
    )
    active_days = present.select("k", "d").distinct()
    covered = present.select(
        "k",
        "e",
        F.explode(
            F.sequence(
                F.col("d"), F.date_add(F.col("d"), window_days - 1)
            )
        ).alias("d"),
    )
    return (
        covered.join(active_days, ["k", "d"])
        .groupBy("k", "d")
        .agg(F.count_distinct("e").cast("long").alias("n_active"))
        .select(
            F.col("k").alias(key_col),
            F.col("d").alias("day"),
            "n_active",
        )
    )


def business_days_between(start, end):
    """Whole business days (Mon–Fri) in the half-open span
    ``[start, end)`` as a pure-integer closed form — no calendar
    explode, no UDF, portable to any engine with integer div/mod:
    with ``x`` = days since a Monday anchor (1970-01-05),
    ``B(x) = 5·(x div 7) + least(x mod 7, 5)`` counts the business
    days before ``x``, and the span count is ``B(end) − B(start)``.
    Dates must be on/after the anchor (any modern fact table is).
    """
    anchor = F.lit("1970-01-05").cast("date")

    def b(d):
        d = F.col(d) if isinstance(d, str) else d
        x = F.datediff(d, anchor).cast("long")
        return F.lit(5).cast("long") * F.floor(x / 7).cast("long") + F.least(
            x % 7, F.lit(5).cast("long")
        )

    return b(end) - b(start)


def recognize_revenue(
    df: DataFrame,
    id_col: str,
    amount_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Revenue recognition: spread each contract's integer amount across
    the calendar months its service period ``[start, end)`` overlaps,
    proportional to overlap days — floor allocation everywhere except
    the FINAL month, which takes the exact remainder so every contract
    sums to its amount to the cent (the deterministic largest-bucket
    remainder rule accountants actually use).

    The month fan-out is a bounded ``sequence()`` explode (periods are
    calendar-bounded); the remainder fix is one window sum inside the
    contract-keyed partition.  Pure integer arithmetic throughout.

    Returns per (id, month): ``(id, month, days, recognized)``.
    """
    s, e = F.col(start_col), F.col(end_col)
    total_days = F.datediff(e, s).cast("long")
    base = df.select(
        F.col(id_col).alias("cid"),
        F.col(amount_col).cast("long").alias("amt"),
        s.alias("s"),
        e.alias("e"),
        total_days.alias("td"),
    ).where(F.col("td") > 0)
    months = base.select(
        "cid",
        "amt",
        "s",
        "e",
        "td",
        F.explode(
            F.sequence(
                F.trunc("s", "MM"),
                F.trunc(F.date_sub(F.col("e"), 1), "MM"),
                F.expr("interval 1 month"),
            )
        ).alias("month"),
    )
    nxt_month = F.add_months(F.col("month"), 1)
    days = (
        F.datediff(F.least(F.col("e"), nxt_month),
                   F.greatest(F.col("s"), F.col("month")))
    ).cast("long")
    alloc = F.floor(
        (F.col("amt") * F.col("days")).cast("double") / F.col("td")
    ).cast("long")
    w = W.partitionBy("cid")
    slices = months.select(
        "cid", "amt", "td", "month", days.alias("days")
    ).select(
        "cid",
        "amt",
        "month",
        "days",
        alloc.alias("fa"),
        F.sum(alloc).over(w).alias("fa_sum"),
        F.max("month").over(w).alias("last_m"),
    )
    recognized = F.when(
        F.col("month") == F.col("last_m"),
        F.col("fa") + (F.col("amt") - F.col("fa_sum")),
    ).otherwise(F.col("fa"))
    return slices.select(
        F.col("cid").alias(id_col),
        "month",
        "days",
        recognized.alias("recognized"),
    )


def ohlc_bars(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    tiebreak_col: str | None = None,
    scale: int = 100,
) -> DataFrame:
    """Open/high/low/close bars per (key, day) — the standard financial
    downsample, one hash aggregate: open/close are ``min_by``/``max_by``
    over the (ts, tiebreak) ordering struct (deterministic under ties),
    high/low/volume are plain min/max/count.  Values land as integer
    ``scale`` units so every output is exact.

    Returns ``(key, day, open_c, high_c, low_c, close_c, volume)``.
    """
    ticks = F.round(F.col(value_col) * scale).cast("long")
    order = F.struct(
        F.col(ts_col),
        *( [F.col(tiebreak_col)] if tiebreak_col else [] ),
    )
    return (
        df.select(
            F.col(key_col).alias("k"),
            F.to_date(F.col(ts_col)).alias("day"),
            order.alias("o"),
            ticks.alias("v"),
        )
        .groupBy("k", "day")
        .agg(
            F.min_by("v", "o").alias("open_c"),
            F.max("v").alias("high_c"),
            F.min("v").alias("low_c"),
            F.max_by("v", "o").alias("close_c"),
            F.count("*").cast("long").alias("volume"),
        )
        .select(
            F.col("k").alias(key_col),
            "day",
            "open_c",
            "high_c",
            "low_c",
            "close_c",
            "volume",
        )
    )


def periodogram_topk(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    *,
    top_k: int = 3,
) -> DataFrame:
    """Dominant cycle detection per key: the daily count series (dense
    spine over the key's own [min, max] span) goes through a real FFT
    per group — ``applyInPandas`` keeps the numpy DP on executors, one
    group per task, series length calendar-bounded — and the ``top_k``
    non-DC frequencies by power come back as (period_days, power)
    rows.  Rows-only evidence: FFT has no SQL form; synthetic-sinusoid
    recovery is pinned by tests.

    Returns ``(key, rank, period_days_e3, power_e3)``.
    """
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    from smartpy_arc_spark.session import ensure_worker_imports

    ensure_worker_imports(spark)
    day = F.to_date(F.col(ts_col))
    daily = (
        df.select(F.col(key_col).alias("k"), day.alias("d"))
        .groupBy("k", "d")
        .agg(F.count("*").cast("double").alias("x"))
    )

    def spectrum(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("d")
        d0, d1 = pdf["d"].min(), pdf["d"].max()
        idx = pd.date_range(d0, d1, freq="D").date
        series = pd.Series(0.0, index=idx)
        series.loc[pdf["d"].values] = pdf["x"].values
        x = series.values - series.values.mean()
        if len(x) < 4:
            return pd.DataFrame(
                columns=["k", "rank", "period_days_e3", "power_e3"]
            ).astype(
                {"k": pdf["k"].dtype, "rank": "int64",
                 "period_days_e3": "int64", "power_e3": "int64"}
            )
        p = np.abs(np.fft.rfft(x)) ** 2
        freqs = np.fft.rfftfreq(len(x), d=1.0)
        order = np.argsort(-p[1:]) + 1  # skip DC
        rows = []
        for r, j in enumerate(order[:top_k], start=1):
            rows.append(
                {
                    "k": pdf["k"].iloc[0],
                    "rank": r,
                    "period_days_e3": int(round(1.0 / freqs[j] * 1000)),
                    "power_e3": int(round(float(p[j]) * 1000)),
                }
            )
        return pd.DataFrame(rows)

    kt = daily.schema["k"].dataType.simpleString()
    out = daily.groupBy("k").applyInPandas(
        spectrum,
        f"k {kt}, rank long, period_days_e3 long, power_e3 long",
    )
    return out.select(
        F.col("k").alias(key_col), "rank", "period_days_e3", "power_e3"
    ).orderBy(key_col, "rank")


def vwap(
    df: DataFrame,
    group_col: str,
    price_col: str,
    qty_col: str,
    *,
    scale: int = 100,
) -> DataFrame:
    """Volume-weighted average price per group — the execution-quality /
    unit-economics companion to :func:`time_weighted_avg` (TWAP weights
    by elapsed time; VWAP weights by transacted quantity).

    Exactness: prices pre-round to integer ``scale`` units and
    quantities to integers, so the weighted sum is ONE exact bigint
    aggregate per group and the average is a single correctly-rounded
    double division — no float accumulation anywhere.

    Plan shape (100 TB): one hash aggregate on ``group_col`` with
    map-side partial combine; no joins, no windows.

    Returns ``(group, n_obs, total_qty, vwap_e4)``.
    """
    p = F.round(F.col(price_col).cast("double") * scale).cast("long")
    q = F.round(F.col(qty_col).cast("double")).cast("long")
    base = df.where(
        F.col(price_col).isNotNull() & F.col(qty_col).isNotNull()
    ).select(F.col(group_col).alias("g"), p.alias("p"), q.alias("q"))
    agg = base.groupBy("g").agg(
        F.count("*").cast("long").alias("n_obs"),
        F.sum("q").cast("long").alias("total_qty"),
        F.sum(F.col("p") * F.col("q")).cast("long").alias("pq"),
    )
    vw = (
        F.col("pq").cast("double")
        / F.col("total_qty").cast("double")
        / scale
        * 10000
    )
    return agg.select(
        F.col("g").alias(group_col),
        "n_obs",
        "total_qty",
        F.when(F.col("total_qty") > 0, F.round(vw).cast("long")).alias(
            "vwap_e4"
        ),
    )


def bollinger_bands(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    *,
    window: int = 20,
    width: int = 2,
    scale: int = 100,
) -> DataFrame:
    """Bollinger bands over a pre-aggregated series: trailing-``window``
    mean ± ``width``·σ (population), plus an outside-band breakout flag
    — the volatility-envelope monitor.

    Exactness (the :func:`~smartpy_arc_spark.operators.stats.rolling_corr`
    moment pattern): values pre-round to integer ``scale`` ticks; the
    window carries (n, Σx, Σx²) as exact bigints; mean and σ are each
    ONE closed-form double expression (IEEE sqrt on an exact integer
    operand is correctly rounded); band edges are *integer* arithmetic
    over the two pre-rounded e4 values, so no double ever re-rounds.

    One ordered window pass over calendar-bounded input (the caller
    aggregates to a daily/monthly grid first — the ``mom_change``
    allowlist shape).

    Returns ``(ts, n_window, mid_e4, sd_e4, upper_e4, lower_e4,
    outside)``.
    """
    _check_e4_scale(scale)
    x = F.round(F.col(value_col).cast("double") * scale).cast("long")
    base = df.select(F.col(ts_col).alias("t"), x.alias("x"))
    w = W.orderBy("t").rowsBetween(-(window - 1), 0)
    n = F.count("*").over(w)
    s = F.sum("x").over(w)
    # second moment and n·q − s² in DECIMAL(38,0) (the market_beta
    # pattern): Σx² in plain int64 wraps silently in non-ANSI mode (or
    # errors under ANSI) once ticks reach ~1e8·sf magnitudes
    xd = F.col("x").cast("decimal(19,0)")
    q = F.sum(xd * xd).over(w)
    mid = s.cast("double") / n.cast("double") / scale * 10000
    var_n2 = (
        n.cast("decimal(19,0)") * q
        - s.cast("decimal(19,0)") * s.cast("decimal(19,0)")
    )
    sd = (
        F.sqrt(var_n2.cast("double"))
        / n.cast("double")
        / scale
        * 10000
    )
    stepped = base.select(
        "t",
        n.cast("long").alias("n_window"),
        F.round(mid).cast("long").alias("mid_e4"),
        F.round(sd).cast("long").alias("sd_e4"),
        (F.col("x") * (10000 // scale)).alias("v_e4"),
    )
    upper = F.col("mid_e4") + width * F.col("sd_e4")
    lower = F.col("mid_e4") - width * F.col("sd_e4")
    return stepped.select(
        F.col("t").alias(ts_col),
        "n_window",
        "mid_e4",
        "sd_e4",
        upper.cast("long").alias("upper_e4"),
        lower.cast("long").alias("lower_e4"),
        (
            (F.col("v_e4") > upper) | (F.col("v_e4") < lower)
        ).cast("int").alias("outside"),
    )


def rsi(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    period: int = 14,
    scale: int = 100,
) -> DataFrame:
    """Per-key Wilder relative-strength index — the bounded [0, 100]
    momentum oscillator:

        RSI = 100 · AG / (AG + AL)

    where AG/AL are Wilder-smoothed averages of the up/down moves
    (``ag_t = (ag·(p−1) + gain_t)/p``), seeded with the simple mean of
    the first ``period`` moves.

    Exactness: moves are integer tick differences; both smoothers fold
    in observation order with ``F.aggregate`` — the fixed-order fold
    contract of ``ewma``/``holt_winters``, mirrored by DuckDB
    ``list_reduce`` — and the final ratio is one fixed double
    expression over the two fold results.  Keys with fewer than
    ``period + 1`` observations return null.

    Plan shape (100 TB): one hash aggregate collects each key's series
    (bounded: one float per grid bucket); the fold is per-row codegen —
    no shuffle beyond the initial groupBy.

    Returns ``(key, n_obs, avg_gain_e4, avg_loss_e4, rsi_e4)``.
    """
    ticks = F.round(F.col(value_col).cast("double") * scale).cast("double")
    item = F.struct(F.col(ts_col), ticks.alias("x"))
    per_key = df.groupBy(key_col).agg(
        F.sort_array(F.collect_list(item)).alias("series")
    )
    # HOF-CSE staging (r7): every array rides as a projected COLUMN
    # before the next lambda consumes it — the diff lambda's
    # element_at(xs, i) over an inline xs EXPRESSION re-evaluated the
    # whole value projection per element (O(n²)), and the un-staged
    # ag/al mega-expressions were re-folded once per output column
    # (20.2 s → ~1 s at sf0.1); values are unchanged
    s_xs = per_key.select(
        F.col(key_col),
        F.transform(F.col("series"), lambda s: s["x"]).alias("_xs"),
    )
    nx = F.size(F.col("_xs"))
    s_d = s_xs.select(
        F.col(key_col),
        nx.alias("_n"),
        F.transform(
            F.slice(F.col("_xs"), 2, F.greatest(nx - 1, F.lit(0))),
            lambda v, i: v - F.element_at(F.col("_xs"), i + 1),
        ).alias("_d"),
    )
    s_gl = s_d.select(
        F.col(key_col),
        "_n",
        F.transform(
            F.col("_d"), lambda d: F.when(d > 0, d).otherwise(F.lit(0.0))
        ).alias("_g"),
        F.transform(
            F.col("_d"), lambda d: F.when(d < 0, -d).otherwise(F.lit(0.0))
        ).alias("_l"),
    )
    p = float(period)

    def seed(arr):
        return (
            F.aggregate(F.slice(arr, 1, period), F.lit(0.0), lambda a, v: a + v)
            / F.lit(p)
        )

    def wilder(arr):
        return F.aggregate(
            F.slice(arr, period + 1, F.greatest(F.size(arr) - period, F.lit(0))),
            seed(arr),
            lambda acc, v: (acc * F.lit(p - 1.0) + v) / F.lit(p),
        )

    s_w = s_gl.select(
        F.col(key_col),
        "_n",
        wilder(F.col("_g")).alias("_ag"),
        wilder(F.col("_l")).alias("_al"),
    )
    ag, al = F.col("_ag"), F.col("_al")
    ok = F.col("_n") >= period + 1
    e4 = lambda c: F.when(ok, F.round(c).cast("long"))  # noqa: E731
    rsi_expr = F.when(
        ag + al > 0, F.lit(100.0) * ag / (ag + al) * 10000
    ).otherwise(F.lit(0.0))
    return s_w.select(
        F.col(key_col),
        F.col("_n").cast("long").alias("n_obs"),
        e4(ag / scale * 10000).alias("avg_gain_e4"),
        e4(al / scale * 10000).alias("avg_loss_e4"),
        e4(rsi_expr).alias("rsi_e4"),
    )


def macd(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    fast: int = 12,
    slow: int = 26,
    signal: int = 9,
    scale: int = 100,
) -> DataFrame:
    """Per-key MACD (moving-average convergence/divergence): fast EMA −
    slow EMA, with a signal EMA over the MACD line and the histogram
    (MACD − signal) — the trend-crossover detector.

    All three EMAs advance in ONE ``F.aggregate`` fold with a
    ``[ema_fast, ema_slow, signal]`` array accumulator (the
    ``holt_winters`` list-fold contract: fixed evaluation order, so the
    double recurrence is engine-portable via a DuckDB ``list_reduce``
    mirror).  α = 2/(n+1) literals constant-fold identically on both
    engines.  Seeds: both EMAs start at the first observation, the
    signal at 0 (so the histogram warms up from the MACD line itself).

    Returns ``(key, n_obs, macd_e4, signal_e4, hist_e4)`` with the
    histogram computed from the two pre-rounded integers (no double
    re-round).  Keys with fewer than 2 observations return nulls.
    """
    ticks = F.round(F.col(value_col).cast("double") * scale).cast("double")
    item = F.struct(F.col(ts_col), ticks.alias("x"))
    per_key = df.groupBy(key_col).agg(
        F.sort_array(F.collect_list(item)).alias("series")
    )
    xs = F.transform(F.col("series"), lambda s: s["x"])
    nx = F.size(xs)
    af = F.lit(2.0 / (fast + 1.0))
    as_ = F.lit(2.0 / (slow + 1.0))
    ag = F.lit(2.0 / (signal + 1.0))
    one = F.lit(1.0)
    init = F.array(
        F.element_at(xs, 1), F.element_at(xs, 1), F.lit(0.0)
    )

    def step(acc, y):
        # no let-binding in HOF lambdas: the macd term (ef' - es')
        # repeats inside the signal update
        ef = af * y + (one - af) * F.element_at(acc, 1)
        es = as_ * y + (one - as_) * F.element_at(acc, 2)
        return F.array(
            ef,
            es,
            ag * (ef - es) + (one - ag) * F.element_at(acc, 3),
        )

    folded = F.aggregate(
        F.slice(xs, 2, F.greatest(nx - 1, F.lit(0))), init, step
    )
    ok = nx >= 2
    m = F.element_at(folded, 1) - F.element_at(folded, 2)
    sg = F.element_at(folded, 3)
    e4 = lambda c: F.when(ok, F.round(c / scale * 10000).cast("long"))  # noqa: E731
    out = per_key.select(
        F.col(key_col),
        nx.cast("long").alias("n_obs"),
        e4(m).alias("macd_e4"),
        e4(sg).alias("signal_e4"),
    )
    return out.select(
        "*",
        (F.col("macd_e4") - F.col("signal_e4")).alias("hist_e4"),
    )


def kalman_level(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    q_noise: float = 2500.0,
    r_noise: float = 10000.0,
    scale: int = 100,
) -> DataFrame:
    """Per-key local-level (random-walk + noise) Kalman filter — the
    optimal-under-Gaussian smoother the EWMA family approximates, with
    an adaptive gain instead of a fixed α:

        k = (p + q) / (p + q + r)
        x' = x + k·(y − x),   p' = (1 − k)·(p + q)

    State ``[x, p]`` folds in observation order (``F.aggregate`` /
    ``list_reduce`` — the fixed-order contract of ``ewma``), with
    process/measurement noise as double literals in tick² units.  Seeds:
    ``x₀ = y₁``, ``p₀ = r`` (diffuse-ish).  The gain converges to the
    steady-state Riccati value; its final value is re-derived from the
    folded ``p`` with the same expression.

    Returns ``(key, n_obs, level_e4, p_e2, gain_e6)``.
    """
    ticks = F.round(F.col(value_col).cast("double") * scale).cast("double")
    item = F.struct(F.col(ts_col), ticks.alias("x"))
    per_key = df.groupBy(key_col).agg(
        F.sort_array(F.collect_list(item)).alias("series")
    )
    xs = F.transform(F.col("series"), lambda s: s["x"])
    n = F.size(xs)
    q = F.lit(float(q_noise))
    r = F.lit(float(r_noise))
    one = F.lit(1.0)
    init = F.array(F.element_at(xs, 1), r)

    def step(acc, y):
        # no let-binding in HOF lambdas: the gain expression repeats
        x_prev = F.element_at(acc, 1)
        p_prev = F.element_at(acc, 2)
        return F.array(
            x_prev
            + (p_prev + q) / (p_prev + q + r) * (y - x_prev),
            (one - (p_prev + q) / (p_prev + q + r)) * (p_prev + q),
        )

    folded = F.aggregate(
        F.slice(xs, 2, F.greatest(n - 1, F.lit(0))), init, step
    )
    xf = F.element_at(folded, 1)
    pf = F.element_at(folded, 2)
    gain = (pf + q) / (pf + q + r)
    return per_key.select(
        F.col(key_col),
        n.cast("long").alias("n_obs"),
        F.round(xf / scale * 10000).cast("long").alias("level_e4"),
        F.round(pf * 100).cast("long").alias("p_e2"),
        F.round(gain * 1e6).cast("long").alias("gain_e6"),
    )


def forecast_eval(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    actual_col: str,
    forecast_col: str,
    *,
    scale: int = 100,
) -> DataFrame:
    """Per-key forecast-accuracy table: MAE, RMSE, MAPE, sMAPE, MASE
    (vs the in-sample lag-1 naive), and the 0.9-quantile pinball loss —
    the standard scorecard for any of the forecasting operators
    (``seasonal_naive`` / ``holt_winters`` / ``croston`` / ``ar_model``).

    Exactness: actuals/forecasts pre-round to integer ticks; absolute
    and squared error sums are exact integers (DECIMAL second moments);
    MAPE/sMAPE terms pre-round to integer e6 each (order-free sums);
    the 0.9 pinball loss stays integer via the ×10 trick
    (``10·L = 9·(a−f)⁺ + (f−a)⁺``); MASE's naive MAE uses the key's
    FULL actual series (one lag window), not just scored rows.

    Rows with a null forecast are excluded from scoring.  Returns
    ``(key, n_scored, mae_e4, rmse_e4, mape_e6, smape_e6, mase_e6,
    pinball90_e4)``.
    """
    a = F.round(F.col(actual_col).cast("double") * scale).cast("long")
    f = F.round(F.col(forecast_col).cast("double") * scale).cast("long")
    base = df.select(
        F.col(key_col).alias("k"),
        F.col(ts_col).alias("t"),
        a.alias("a"),
        f.alias("f"),
    ).where(F.col("a").isNotNull())
    # r11 (guide §2.4): one pass, one shuffle.  The naive lag-1 window
    # and the scored aggregate are both keyed by k; running the window
    # first and aggregating on the same key reuses its exchange, and
    # every scored term null-propagates on a null forecast (ae/sse/mape/
    # smape become NULL and drop out of sum/count; pin10's greatest()
    # skips the NULL operand and contributes exact 0), so one grouped
    # pass over the lagged frame replaces the former
    # window-pass + aggregate-pass + per-key join — and any expensive
    # upstream executes once instead of twice.  Keys with zero scored
    # rows are dropped by the n > 0 guard, exactly the rows the former
    # inner side of the left join never produced.
    w = W.partitionBy("k").orderBy("t")
    lagged = base.withColumn("ne", F.abs(F.col("a") - F.lag("a").over(w)))
    e = F.col("a") - F.col("f")
    ae = F.abs(e)
    aed = ae.cast("decimal(19,0)")
    mape_t = F.when(
        F.col("a") != 0,
        F.round(
            ae.cast("double") / F.abs(F.col("a")).cast("double") * 1e6
        ).cast("long"),
    )
    sden = F.abs(F.col("a")) + F.abs(F.col("f"))
    smape_t = F.when(
        sden > 0,
        F.round(
            F.lit(2.0) * ae.cast("double") / sden.cast("double") * 1e6
        ).cast("long"),
    )
    pin10 = 9 * F.greatest(e, F.lit(0)) + F.greatest(-e, F.lit(0))
    j = lagged.groupBy("k").agg(
        F.count("f").cast("long").alias("n"),
        F.sum(ae).cast("long").alias("sae"),
        F.sum(aed * aed).cast("decimal(38,0)").alias("sse"),
        F.count(mape_t).cast("long").alias("n_mape"),
        F.sum(mape_t).cast("long").alias("s_mape"),
        F.count(smape_t).cast("long").alias("n_smape"),
        F.sum(smape_t).cast("long").alias("s_smape"),
        F.sum(F.when(F.col("f").isNotNull(), pin10)).cast("long")
        .alias("s_pin10"),
        F.count("ne").cast("long").alias("m"),
        F.sum("ne").cast("long").alias("ns"),
    ).where(F.col("n") > 0)
    n = F.col("n").cast("double")
    mae = F.col("sae").cast("double") / n
    rmse = F.sqrt(F.col("sse").cast("double") / n)
    naive_mean = F.col("ns").cast("double") / F.col("m").cast("double")
    return j.select(
        F.col("k").alias(key_col),
        F.col("n").alias("n_scored"),
        F.round(mae / scale * 10000).cast("long").alias("mae_e4"),
        F.round(rmse / scale * 10000).cast("long").alias("rmse_e4"),
        F.when(
            F.col("n_mape") > 0,
            F.round(
                F.col("s_mape").cast("double")
                / F.col("n_mape").cast("double")
            ).cast("long"),
        ).alias("mape_e6"),
        F.when(
            F.col("n_smape") > 0,
            F.round(
                F.col("s_smape").cast("double")
                / F.col("n_smape").cast("double")
            ).cast("long"),
        ).alias("smape_e6"),
        F.when(
            F.col("ns") > 0,
            F.round(mae / naive_mean * 1e6).cast("long"),
        ).alias("mase_e6"),
        F.round(
            F.col("s_pin10").cast("double") / (10 * F.col("n")).cast("double")
            / scale
            * 10000
        )
        .cast("long")
        .alias("pinball90_e4"),
    )
