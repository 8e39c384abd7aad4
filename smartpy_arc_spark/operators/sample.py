"""Deterministic, engine-portable sampling operators.

Random `df.sample()` draws differ run-to-run and engine-to-engine; for
training-data pipelines a *content-hash* sample is reproducible anywhere
(same rows selected by Spark, DuckDB, or a Python script), stable under
repartitioning, and needs no seed bookkeeping — the selection is a pure
function of the row content.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def _hex_threshold(fraction: float) -> str | None:
    """8-hex-digit threshold such that uniform md5 prefixes compare below
    it with probability ≈ fraction.  None means "keep everything" (the
    9-digit hex of 16**8 would compare *lexicographically* below "f..."
    strings and silently drop rows, so >=1.0 short-circuits)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    if fraction >= 1.0:
        return None
    return format(int(fraction * 16**8), "08x")


def stratified_hash_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    key_cols: list[str],
    *,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sample: keep a row iff the first 8 hex
    digits of md5(key) fall below the stratum's threshold.

    Training corpora are rebalanced by domain/language/quality tier with
    *different* rates per stratum; doing it with a content-hash predicate
    (rather than `df.sampleBy`) makes the selection reproducible across
    engines and runs, stable under repartitioning, and row-local — the
    filter is a pure expression that pushes to the scan, no shuffle, no
    seed state.  2^32 granularity (vs 16 for `content_hash_sample`).

    ``fractions`` maps stratum value -> keep fraction; unlisted strata
    get ``default_fraction``.  ``key_cols`` are concat-ws'd into the hash
    key (pick a stable business key, not a position-dependent id).
    """
    key = F.concat_ws("-", *[F.col(c) for c in key_cols])
    prefix = F.substring(F.md5(key), 1, 8)

    def keep_expr(fraction: float):
        thr = _hex_threshold(fraction)
        return F.lit(True) if thr is None else prefix < F.lit(thr)

    pred = keep_expr(default_fraction)
    for value, fraction in fractions.items():
        pred = F.when(F.col(strata_col) == F.lit(value), keep_expr(fraction)).otherwise(
            pred
        )
    return df.where(pred)


def content_hash_sample(
    df: DataFrame,
    col: str,
    *,
    sixteenths: int = 3,
) -> DataFrame:
    """Keep rows whose md5(col) starts with one of the first `sixteenths`
    hex digits — a deterministic ≈ sixteenths/16 sample.

    md5 is uniform over hex digits, the filter is a pure row-local
    expression (no shuffle, pushes below everything except the scan), and
    the same predicate reproduces the exact sample in any engine."""
    if not 0 < sixteenths <= 16:
        raise ValueError("sixteenths must be in 1..16")
    digits = [format(i, "x") for i in range(sixteenths)]
    return df.where(F.substring(F.md5(F.col(col)), 1, 1).isin(digits))


def cap_per_group(
    df: DataFrame,
    group_col: str,
    *,
    cap: int,
    order_by: list[str] | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-source document cap: keep at most ``cap`` rows per group —
    the standard guard against a single domain dominating a training mix
    (every public corpus recipe caps per-host/per-domain contributions).

    Rows within a group are ranked by ``order_by`` (default: ``id_col``,
    i.e. keep the earliest ids) with ``id_col`` always appended as the
    final tiebreak so the cut is total and deterministic in any engine.

    One shuffle on ``group_col``; the rank window's state is a single
    counter per group.  Skew note: a pathologically hot group still
    lands on one task — at 100 TB pre-aggregate extreme groups or raise
    ``spark.sql.shuffle.partitions`` so the hot task fits; the window
    itself never materializes the group.
    """
    from pyspark.sql import Window

    order = [
        F.col(c) if isinstance(c, str) else c for c in (order_by or [])
    ] + [F.col(id_col)]
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= cap)
        .drop("__rk")
    )


def mixture_allocation(
    df: DataFrame,
    group_col: str,
    size_col: str,
    *,
    budget: int,
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-based training-mix allocation: source ``i`` gets
    sampling probability ``p_i ∝ n_i^alpha`` (the multilingual-corpus
    rebalancing rule of mBERT/XLM-R/mT5; ``alpha=1`` is proportional,
    ``alpha→0`` uniform), then an expected token allocation
    ``min(n_i, budget · p_i)`` — the cap keeps a source from being
    over-sampled past one epoch in a single pass.

    Returns one row per group: ``(group_col, n_tokens, weight,
    alloc_tokens, epochs)`` — ``weight`` the normalized probability,
    ``epochs`` the implied repeat rate ``alloc/n`` (rounded to 4).

    One hash aggregate to per-group sizes (map-side combined), one
    1-row scalar for the normalizer, broadcast back: the detail table
    is touched once regardless of corpus size.
    """
    sizes = df.groupBy(group_col).agg(
        F.sum(size_col).cast("long").alias("n_tokens")
    )
    z = sizes.agg(
        F.sum(F.pow(F.col("n_tokens").cast("double"), F.lit(alpha))).alias("z")
    )
    return (
        sizes.crossJoin(F.broadcast(z))
        .select(
            group_col,
            "n_tokens",
            (F.round(
                F.pow(F.col("n_tokens").cast("double"), F.lit(alpha)) / F.col("z"),
                6,
            ) + F.lit(0.0)).alias("weight"),
            # floor, not cast: double->long casts truncate in Spark but
            # round in other engines; floor is unambiguous everywhere
            F.floor(
                F.least(
                    F.col("n_tokens").cast("double"),
                    F.lit(float(budget))
                    * F.pow(F.col("n_tokens").cast("double"), F.lit(alpha))
                    / F.col("z"),
                )
            ).cast("long").alias("alloc_tokens"),
        )
        .withColumn(
            "epochs",
            (F.round(
                F.col("alloc_tokens") / F.col("n_tokens").cast("double"), 4
            ) + F.lit(0.0)),
        )
    )


def weighted_sample_topk(
    df: DataFrame,
    *,
    weight_col: str,
    key_cols: list[str],
    k: int,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement via the Efraimidis–Spirakis
    exponential-key trick (Inf. Proc. Letters 2006): draw
    ``key = -ln(u) / w`` per row and keep the ``k`` smallest keys —
    exactly a weighted sample without replacement.

    ``u`` is derived from the row's content hash (md5 prefix mapped to
    (0,1)), not a seeded RNG, so the SAME rows are selected in any
    engine, on any partitioning, on any rerun — the reproducibility
    contract every sampling op in this module follows.

    One pass + a global top-k (TakeOrdered — no full sort); weights must
    be strictly positive.
    """
    key = F.concat_ws("-", *[F.col(c) for c in key_cols])
    h = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("double")
    u = (h + F.lit(1.0)) / F.lit(float(16**8 + 1))  # (0, 1]
    es_key = -F.log(u) / F.col(weight_col).cast("double")
    return (
        df.where(F.col(weight_col) > 0)
        .withColumn("es_key", F.round(es_key, 10))
        .orderBy(F.col("es_key"), *[F.col(c) for c in key_cols])
        .limit(k)
    )


def dataset_split(
    df: DataFrame,
    key_cols: list[str],
    *,
    val_pct: int = 10,
    test_pct: int = 10,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment from a content hash —
    stable across engines, reruns and repartitioning, and stable under
    corpus growth (a row's split never changes when other rows arrive,
    unlike positional or seeded splits).

    Buckets 0-99 from the md5 prefix: [0, val_pct) -> 'val',
    [val_pct, val_pct+test_pct) -> 'test', rest -> 'train'.  Row-local
    expression; pushes to the scan.
    """
    if val_pct + test_pct >= 100:
        raise ValueError("val_pct + test_pct must leave room for train")
    key = F.concat_ws("-", *[F.col(c) for c in key_cols])
    bucket = (
        F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long") % 100
    )
    return df.withColumn(
        split_col,
        F.when(bucket < val_pct, "val")
        .when(bucket < val_pct + test_pct, "test")
        .otherwise("train"),
    )


def neyman_allocation(
    df: DataFrame,
    stratum_col: str,
    value_col: str,
    *,
    budget: int,
    scale: int = 100,
) -> DataFrame:
    """Variance-optimal (Neyman) sample-size allocation across strata:
    ``n_h ∝ N_h · S_h`` — strata that are big AND internally varied get
    the sample budget, uniform strata barely any.  The principled
    upgrade over proportional allocation when building eval/calibration
    sets from heterogeneous sources.

    One aggregate per stratum (count + exact fixed-point sum/sum-of-
    squares → sample stddev), a 1-row total broadcast back, shares and
    integer allocations derived per stratum.  ``alloc`` rounds each
    stratum independently (Σalloc can differ from the budget by a few —
    the standard caveat; use largest-remainder downstream if an exact
    total matters).

    Returns ``(stratum, n_rows, stddev_e4, share_e6, alloc)``.
    """
    ticks = F.round(F.col(value_col) * scale).cast("long")
    per = df.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(ticks).alias("__s"),
        F.sum(ticks * ticks).alias("__ss"),
    )
    var_num = (F.col("n_rows") * F.col("__ss") - F.col("__s") * F.col("__s"))
    sd = F.when(
        F.col("n_rows") > 1,
        F.sqrt(
            var_num.cast("double")
            / (F.col("n_rows") * (F.col("n_rows") - 1)).cast("double")
        )
        / scale,
    ).otherwise(F.lit(0.0))
    weighted = per.withColumn("__w", F.col("n_rows").cast("double") * sd)
    tot = weighted.agg(F.sum("__w").alias("__wsum"))
    share = F.col("__w") / F.col("__wsum")
    return (
        weighted.crossJoin(F.broadcast(tot))
        .select(
            "stratum",
            "n_rows",
            F.round(sd * 10000).cast("long").alias("stddev_e4"),
            F.round(share * 1000000).cast("long").alias("share_e6"),
            F.round(share * F.lit(float(budget))).cast("long").alias("alloc"),
        )
    )


def negative_samples(
    positives: DataFrame,
    item_pool: DataFrame,
    *,
    anchor_col: str,
    item_col: str,
    k: int = 3,
) -> DataFrame:
    """Deterministic negative sampling for contrastive training: for
    every anchor, pick the ``k`` pool items it has NO positive pair with,
    chosen by a portable content hash (md5 over anchor‖item) — stable
    across engines, reruns, partitionings, and corpus growth (an
    anchor's negatives never change when other anchors arrive).

    Scale shape: the candidate space is anchor × POOL, with the pool a
    bounded broadcast (hundreds–thousands of items — the usual
    contrastive setup samples from a capped candidate set, not the full
    catalog); positives drop out via a hash left-anti join, and the
    per-anchor top-k is a window over the anchor partition only.

    Returns ``(anchor, item, neg_rank)`` with ``neg_rank`` in 1..k.
    """
    from pyspark.sql import Window

    anchors = positives.select(
        F.col(anchor_col).alias("__a")
    ).distinct()
    pool = item_pool.select(F.col(item_col).alias("__i")).distinct()
    cand = anchors.join(F.broadcast(pool))
    pos = positives.select(
        F.col(anchor_col).alias("__a"), F.col(item_col).alias("__i")
    ).distinct()
    neg = cand.join(pos, ["__a", "__i"], "left_anti")
    hkey = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.col("__a"), F.col("__i"))), 1, 15
        ),
        16,
        10,
    ).cast("decimal(38,0)")
    w = Window.partitionBy("__a").orderBy(hkey.asc(), F.col("__i"))
    return (
        neg.withColumn("neg_rank", F.row_number().over(w))
        .where(F.col("neg_rank") <= k)
        .select(
            F.col("__a").alias(anchor_col),
            F.col("__i").alias(item_col),
            F.col("neg_rank").cast("int").alias("neg_rank"),
        )
    )


def ipf_raking(
    df: DataFrame,
    row_col: str,
    col_col: str,
    row_targets: dict,
    col_targets: dict,
    *,
    iterations: int = 5,
    scale: int = 1_000_000,
) -> DataFrame:
    """Iterative proportional fitting (raking, Deming & Stephan 1940):
    reweight a 2-way contingency table so its row and column margins hit
    known population targets — THE survey/panel calibration step before
    any weighted analysis, and the classic dataset-mixing tool when a
    corpus must match target marginals on two attributes at once.

    Determinism: weights live as integer ``scale`` units and each
    margin-scaling step rounds back to integers (``w ← round(w·t/s)``,
    one exact rational per cell), so margin sums are integer sums —
    order-free — and a fixed iteration count reproduces bit-identically
    on any engine (true IPF's irrational intermediates would make float
    accumulation order observable).

    Plan: ONE full-data aggregate builds the cell table; all iterations
    run on the bounded |rows|×|cols| cell table with broadcast margin
    joins.  Returns ``(row, col, n, weight_scaled, cell_weight_e6)``
    where ``cell_weight_e6 ≈ target cell mass`` and per-UNIT design
    weight = cell mass / n.
    """
    from pyspark.sql import Window

    cells = (
        df.select(F.col(row_col).alias("r"), F.col(col_col).alias("c"))
        .groupBy("r", "c")
        .agg(F.count("*").cast("long").alias("n"))
        .withColumn("w", F.col("n") * scale)
        .localCheckpoint(eager=True)
    )

    def target_expr(targets: dict, key: str):
        expr = F.lit(None).cast("long")
        for k, v in sorted(targets.items()):
            expr = F.when(F.col(key) == F.lit(k), F.lit(int(v))).otherwise(expr)
        return expr

    rt, ct = target_expr(row_targets, "r"), target_expr(col_targets, "c")
    # margin sums as WINDOW aggregates and targets as literal CASE chains:
    # each phase is one projection over the bounded cell table, so all
    # iterations compose into ONE linear plan — no joins, no per-round
    # jobs, no exponential re-evaluation of the previous phase
    for _ in range(iterations):
        for tgt, key in ((rt, "r"), (ct, "c")):
            msum = F.sum("w").over(Window.partitionBy(key))
            cells = cells.select(
                "r", "c", "n",
                F.round(
                    F.col("w").cast("double")
                    * (tgt.cast("double") * scale)
                    / msum.cast("double")
                ).cast("long").alias("w"),
            )
    return cells.select(
        F.col("r").alias(row_col),
        F.col("c").alias(col_col),
        "n",
        F.col("w").alias("weight_scaled"),
        F.round(F.col("w").cast("double") * 100 / scale).cast("long").alias(
            "cell_weight_e2"
        ),
    )


def class_balance(
    df: DataFrame, label_col: str, id_col: str
) -> DataFrame:
    """Deterministic balanced downsampling: every class keeps exactly
    ``min(class sizes)`` rows, chosen by md5 order of the id — the
    engine-portable shuffle (md5 of the same string is identical
    everywhere; the repo's portable-randomness contract) so the
    selected SET is reproducible across engines and reruns, unlike
    ``sampleBy`` fractions.

    One class-size aggregate (broadcast, bounded by the label domain),
    one per-class rank window.  Returns the selected rows as
    ``(label, id, pick_rank)``.
    """
    base = df.select(
        F.col(label_col).alias("lbl"), F.col(id_col).alias("rid")
    ).where(F.col("lbl").isNotNull() & F.col("rid").isNotNull())
    sizes = base.groupBy("lbl").agg(F.count("*").alias("n"))
    n_min = sizes.agg(F.min("n").cast("long").alias("n_min"))
    w = W.partitionBy("lbl").orderBy(
        F.md5(F.col("rid").cast("string")), F.col("rid")
    )
    ranked = base.select(
        "lbl", "rid", F.row_number().over(w).alias("pick_rank")
    )
    return (
        ranked.crossJoin(F.broadcast(n_min))
        .where(F.col("pick_rank") <= F.col("n_min"))
        .select(
            F.col("lbl").alias(label_col),
            F.col("rid").alias(id_col),
            "pick_rank",
        )
    )
