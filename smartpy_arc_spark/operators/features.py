"""Feature-engineering operators: categorical target encoding and the
feature-hashing trick.

Target encoding replaces a categorical with statistics of the label —
the workhorse high-cardinality encoder.  Two variants:

  * ``target_encode_smoothed`` — per-category shrunk mean
    ``(Σy + m·μ) / (n + m)`` (empirical-Bayes shrinkage toward the
    global mean; categories with little evidence collapse to the prior);
  * ``target_encode_loo`` — leave-one-out per ROW
    ``(Σy_cat − y_i) / (n_cat − 1)``, the leakage-safe form for
    training folds (a row never sees its own label).

Both keep label sums as exact fixed-point integers so every emitted
encoding is one deterministic division — bit-identical in any engine.

``feature_hash`` is the hashing trick: category → stable bucket in
[0, n_features) via xxhash64, collision-accepting by design — the fixed-
width encoder when the category space is unbounded (URLs, tokens).

Scale shape: smoothed is one bounded aggregate broadcast back; LOO is
one aggregate + one broadcast join (per-row arithmetic after); the hash
is row-local codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def target_encode_smoothed(
    df: DataFrame,
    cat_col: str,
    label_col: str,
    *,
    smoothing: int = 20,
    scale: int = 100,
) -> DataFrame:
    """Per-category table ``(category, n, enc)`` with the shrunk mean in
    original label units.  ``smoothing`` is the pseudo-count m."""
    ticks = F.round(F.col(label_col) * scale).cast("long")
    cats = df.groupBy(F.col(cat_col).alias("category")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(ticks).alias("sum_ticks"),
    )
    # "__all_n", not "N": Spark resolves case-insensitively by default,
    # so `N` would collide with the per-category `n`
    totals = cats.agg(
        F.sum("n").alias("__all_n"), F.sum("sum_ticks").alias("__all_s")
    )
    mu = F.col("__all_s").cast("double") / F.col("__all_n").cast("double")
    enc = (
        (F.col("sum_ticks").cast("double") + F.lit(float(smoothing)) * mu)
        / (F.col("n") + F.lit(smoothing)).cast("double")
        / scale
    )
    return (
        cats.crossJoin(F.broadcast(totals))
        .select("category", "n", enc.alias("enc"))
    )


def target_encode_loo(
    df: DataFrame,
    cat_col: str,
    label_col: str,
    *,
    id_col: str,
    scale: int = 100,
) -> DataFrame:
    """Leave-one-out encoding per row: ``(id, category, loo_enc)`` —
    NULL for singleton categories (no other rows to borrow from)."""
    ticks = F.round(F.col(label_col) * scale).cast("long")
    rows = df.select(
        F.col(id_col), F.col(cat_col).alias("category"), ticks.alias("__y")
    )
    cats = rows.groupBy("category").agg(
        F.count("*").cast("long").alias("__n"),
        F.sum("__y").alias("__s"),
    )
    loo = F.when(
        F.col("__n") > 1,
        (F.col("__s") - F.col("__y")).cast("double")
        / (F.col("__n") - 1).cast("double")
        / scale,
    )
    return (
        rows.join(F.broadcast(cats), "category")
        .select(F.col(id_col), "category", loo.alias("loo_enc"))
    )


def feature_hash(
    df: DataFrame,
    cat_cols: list[str],
    *,
    n_features: int = 1024,
    id_col: str = "doc_id",
    portable_hash: bool = False,
) -> DataFrame:
    """Hashing-trick encoder: each (column, value) pair maps to a stable
    bucket ``pmod(hash(col_name, value), n_features)`` with a ±1 sign
    from one extra hash bit (the standard signed hashing that keeps
    collision noise zero-mean).  Output is the sparse long form
    ``(id, bucket, sign)`` — pivot downstream if a dense row is needed.

    ``portable_hash=True`` keys on the md5-derived ``portable_hash64``
    of ``col_name \\x1f value`` (engine-reproducible, the oracle mode);
    default stays xxhash64 — bucketing semantics are identical."""
    from smartpy_arc_spark.functions.scalar import portable_hash64

    parts = []
    for c in cat_cols:
        if portable_hash:
            h = portable_hash64(
                F.concat_ws("\x1f", F.lit(c), F.col(c).cast("string"))
            )
        else:
            h = F.xxhash64(F.lit(c), F.col(c).cast("string"))
        parts.append(
            df.select(
                F.col(id_col),
                F.pmod(h, F.lit(n_features)).cast("int").alias("bucket"),
                F.when(F.pmod(F.shiftright(h, 32), F.lit(2)) == 0, 1)
                .otherwise(-1)
                .cast("int")
                .alias("sign"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def rfm_segments(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    amount_col: str,
    *,
    n_tiles: int = 5,
    scale: int = 100,
) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation — the
    classic behavioral triage: per key, days since last activity, event
    count, and exact fixed-point spend, each cut into ``n_tiles``
    NTILE-semantics quantile buckets.

    No single-partition window anywhere: each bucket assignment is a
    ``distributed_ntile`` (range partition + broadcast offsets + the
    closed-form NTILE rule), ordered by ``(metric, key)`` so ties break
    deterministically.  The global "as-of" anchor (max timestamp) is a
    1-row broadcast scalar.

    Returns ``(key, recency_days, frequency, monetary_c, r_bucket,
    f_bucket, m_bucket)`` — ``monetary_c`` in fixed-point ticks
    (``scale`` per unit, default cents).
    """
    from smartpy_arc_spark.operators.scale import distributed_ntile

    per_key = df.groupBy(F.col(key_col).alias("k")).agg(
        F.max(ts_col).alias("last_ts"),
        F.count("*").cast("long").alias("frequency"),
        F.sum(F.round(F.col(amount_col) * scale).cast("long"))
        .cast("long")
        .alias("monetary_c"),
    )
    anchor = df.agg(F.max(ts_col).alias("as_of"))
    base = per_key.crossJoin(F.broadcast(anchor)).select(
        "k",
        F.datediff(F.col("as_of"), F.col("last_ts"))
        .cast("long")
        .alias("recency_days"),
        "frequency",
        "monetary_c",
    )
    # Materialize the per-key triple once: each ntile pass (and its
    # partition-offset job) re-reads a flat checkpoint instead of
    # re-deriving the aggregate — chaining the three ntiles over live
    # lineage would re-execute pass N-1 inside pass N's offset job.
    base = base.localCheckpoint()
    buckets = [
        distributed_ntile(base, [metric, "k"], n_tiles, out_col=col).select(
            "k", col
        )
        for metric, col in [
            ("recency_days", "r_bucket"),
            ("frequency", "f_bucket"),
            ("monetary_c", "m_bucket"),
        ]
    ]
    out = base
    for b in buckets:
        out = out.join(b, "k")
    return out.select(
        F.col("k").alias(key_col),
        "recency_days",
        "frequency",
        "monetary_c",
        "r_bucket",
        "f_bucket",
        "m_bucket",
    )


def make_lag_features(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    lags: tuple = (1, 7),
    roll_windows: tuple = (7, 28),
    scale: int = 100,
) -> DataFrame:
    """Supervised-learning feature table from a keyed daily series: lag
    values, trailing-window means, and calendar features — the
    feature-store materialization every forecasting model trains on.

    Exactness: values pre-round to integer ticks; lags are exact
    integers; each rolling mean is ONE division of an exact integer
    window sum (count-guarded: windows shorter than the nominal width
    report their true count).  All windows share one (key → ts)
    exchange.

    Returns ``(key, ts, y, lag_{L}..., rmean{W}_e4..., n{W}...,
    dow, month)``.
    """
    x = F.round(F.col(value_col).cast("double") * scale).cast("long")
    base = df.select(
        F.col(key_col).alias("k"), F.col(ts_col).alias("t"), x.alias("y")
    )
    w = W.partitionBy("k").orderBy("t")
    cols = [
        F.col("k").alias(key_col),
        F.col("t").alias(ts_col),
        "y",
    ]
    for lag in lags:
        cols.append(F.lag("y", lag).over(w).alias(f"lag_{lag}"))
    for win in roll_windows:
        frame = w.rowsBetween(-(win - 1), 0)
        s = F.sum("y").over(frame)
        n = F.count("*").over(frame)
        cols.append(
            F.round(
                s.cast("double") / n.cast("double") / scale * 10000
            )
            .cast("long")
            .alias(f"rmean{win}_e4")
        )
        cols.append(n.cast("long").alias(f"n{win}"))
    cols.append(F.dayofweek("t").cast("int").alias("dow"))
    cols.append(F.month("t").cast("int").alias("month"))
    return base.select(*cols)
