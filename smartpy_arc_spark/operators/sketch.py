"""Explicit count-min sketch: frequency estimation over unbounded key
spaces in fixed memory.

Spark 4 ships HLL/theta/KLL sketch aggregates (used by the
`hll_sketch_union` / `theta_segment_overlap` / `kll_quantile_rollup`
queries) and a binary `count_min_sketch` aggregate — but no SQL surface
to QUERY that binary.  This module builds the CMS explicitly out of
relational primitives instead, the same move as `scale.py`'s explicit
bloom filter: the sketch state is a (seed, bucket) -> count table of
``depth × width`` rows, so it stays queryable, mergeable (UNION ALL +
re-aggregate), and engine-inspectable.

    est(t) = min over seeds s of  count[s][xxhash64(t, s) mod width]

which upper-bounds the true count (every occurrence of t lands in all of
its d buckets; collisions only ever ADD) with error <= 2n/width at
confidence 1 - (1/2)^depth — the standard CMS guarantee.

Scale shape: by default building is ONE shuffle of depth×width bounded
keys with map-side combine (each input row contributes `depth` bucket
increments — JVM-side, no Python); probing joins the query terms'
buckets against the broadcast sketch table.  ``vocab_preagg=True``
inserts a distinct-term pre-aggregation FIRST — a second shuffle keyed
on the unbounded term domain.  That trade is right for Zipf token
streams (vocabulary ≪ occurrence stream, each term hashed depth times
once) and wrong for near-unique keys (e.g. bytes-per-URL weighting),
where it shuffles the full occurrence stream; hence it is opt-in, and
defaults on only for ``portable_hash=True`` (the contract path, whose
md5 hashing is the expensive part worth memoizing).  Bucket sums are
identical either way by associativity.  ``portable_hash=True`` swaps
xxhash64 for the md5-based ``portable_hash64`` on ``"{seed}:{term}"``
so DuckDB can rebuild the identical sketch — the contract query runs
that mode; xxhash64 stays the production default.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from smartpy_arc_spark.functions.scalar import portable_hash64


def _cms_bucket(term: Column, seed: Column, width: int, portable: bool) -> Column:
    """Bucket index for one (term, seed) pair.  Both families are
    non-negative before the mod, so Spark ``pmod`` == DuckDB ``%``."""
    if portable:
        return portable_hash64(
            F.concat(seed.cast("string"), F.lit(":"), term)
        ) % F.lit(width)
    return F.pmod(F.xxhash64(term, seed), F.lit(width))


def cms_build(
    df: DataFrame,
    term_col: str,
    *,
    width: int = 256,
    depth: int = 4,
    weight_col: str | None = None,
    portable_hash: bool = False,
    vocab_preagg: bool | None = None,
) -> DataFrame:
    """Aggregate a count-min sketch table ``(seed, bucket, c)``.

    ``weight_col`` switches from row counting to weighted sums (e.g.
    bytes per URL).  Hashing (term, seed) keeps the bucketing
    deterministic and seed-independent across builds, so two sketch
    tables built with the same (width, depth, hash family) merge by
    UNION ALL + groupBy sum.  ``portable_hash`` picks the
    DuckDB-reproducible md5 bucketing over the xxhash64 default.

    ``vocab_preagg`` collapses to the distinct term vocabulary before
    hashing (the bpe_encode memoization) — identical bucket sums by
    associativity, a big win for Zipf term streams but an extra
    unbounded-key shuffle that is a LOSS for near-unique keys.  Default
    (``None``) enables it only alongside ``portable_hash``, where the
    per-(term,seed) md5 is the dominant cost.
    """
    if vocab_preagg is None:
        vocab_preagg = portable_hash
    vocab = df.select(
        F.col(term_col).alias("__t"),
        (F.col(weight_col) if weight_col else F.lit(1)).cast("long").alias("__w"),
    )
    if vocab_preagg:
        vocab = vocab.groupBy("__t").agg(F.sum("__w").alias("__w"))
    seeds = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("seed")
    rows = vocab.select("__t", "__w", seeds)
    return (
        rows.select(
            "seed",
            _cms_bucket(F.col("__t"), F.col("seed"), width, portable_hash).alias(
                "bucket"
            ),
            "__w",
        )
        .groupBy("seed", "bucket")
        .agg(F.sum("__w").alias("c"))
    )


def cms_estimate(
    sketch: DataFrame,
    terms: list,
    *,
    width: int = 256,
    depth: int = 4,
    portable_hash: bool = False,
) -> DataFrame:
    """Point-query the sketch for ``terms``: returns ``(term, est)`` with
    ``est`` the min bucket count over seeds — always >= the true count.

    The sketch table is depth×width rows, broadcast; absent buckets read
    as 0 (a term whose every bucket is empty truly never occurred).
    ``portable_hash`` must match the build-side flag.
    """
    spark = sketch.sparkSession
    probe = (
        spark.createDataFrame([(t,) for t in terms], "term string")
        .select(
            "term",
            F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("seed"),
        )
        .select(
            "term",
            "seed",
            _cms_bucket(F.col("term"), F.col("seed"), width, portable_hash).alias(
                "bucket"
            ),
        )
    )
    return (
        probe.join(F.broadcast(sketch), ["seed", "bucket"], "left")
        .groupBy("term")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).cast("long").alias("est"))
    )


def hll_rollup(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    rollup_col: str,
    *,
    lg_k: int = 12,
) -> DataFrame:
    """Mergeable distinct-count rollup via Datasketches HLL (Spark 4
    ``hll_sketch_agg`` / ``hll_union_agg``) — THE pattern for distincts
    over 100 TB: fine-grained sketches are built once in a single pass,
    persisted or reused, and every coarser grain is a cheap sketch UNION
    instead of a re-scan of raw data (exact distincts don't merge:
    |A ∪ B| ≠ |A| + |B|).

    Builds one sketch per ``group_cols + [rollup_col]`` cell, then unions
    away ``rollup_col`` — e.g. daily sketches → weekly estimate.  Output:
    one row per ``group_cols`` with ``n_fine`` (cells merged),
    ``distinct_est`` (union estimate) and ``sum_fine_est`` (sum of
    per-cell estimates — the WRONG naive answer, kept so the overlap the
    union removed is visible: ``sum_fine_est ≥ distinct_est``).

    Rows-only evidence by construction: HLL estimates are
    library-specific (Datasketches), so no cross-engine value oracle
    exists; the unit tests pin exactness on small cardinalities and the
    union-vs-sum inequality.
    """
    fine = (
        df.groupBy(*group_cols, rollup_col)
        .agg(
            F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("sk"),
        )
        .withColumn("fine_est", F.hll_sketch_estimate("sk"))
    )
    return (
        fine.groupBy(*group_cols)
        .agg(
            F.count("*").cast("long").alias("n_fine"),
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("distinct_est"),
            F.sum("fine_est").cast("long").alias("sum_fine_est"),
        )
    )


def ams_f2(
    df: DataFrame,
    key_col: str,
    *,
    k: int = 33,
    seed: int = 0,
) -> DataFrame:
    """AMS (Alon–Matias–Szegedy) F₂ sketch: estimate the second frequency
    moment ``F₂ = Σ_key count(key)²`` — equivalently the self-join size,
    the quantity a join planner needs to predict skew/output size without
    running the join.  Counter ``j`` accumulates ``Σ_rows sign_j(key)``
    with a deterministic ±1 key hash — the parity of hex digit
    ``j mod 32`` of ``md5("{seed}:{j//32}:key")`` (seed and block index
    are separate hash-input fields, so sketches built with adjacent
    seeds never share block md5s), so ⌈k/32⌉ md5s per
    row serve all ``k`` counters (the per-counter-md5 form hashed every
    row k times — 10× the work for the same estimator; reproducible in
    any engine either way); ``E[counter²] = F₂``.

    Scale shape: the k counters are ONE map-side-combining aggregate over
    the raw rows (k expressions, no explode, no shuffle of data — each
    partition emits one k-vector); the exact F₂ for the error report is
    a separate grouped count (the thing the sketch avoids at 100 TB —
    here it is the oracle half).  ``k`` odd keeps the median an exact
    integer.

    Returns one row ``(k, exact_f2, est_mean, est_median, err_med_e6)``
    where ``err_med_e6`` is the median estimator's signed relative error
    in millionths.
    """
    key = F.col(key_col).cast("string")
    n_blocks = (k + 31) // 32
    # each block md5 is parsed into THREE 60/8-bit integers once
    # (15+15+2 hex digits); counter j's sign is then one shift+mask —
    # no per-counter string work at all
    parsed = []
    for b in range(n_blocks):
        h = F.md5(F.concat(F.lit(f"{seed}:{b}:"), key))
        parsed.append((
            F.conv(F.substring(h, 1, 15), 16, 10).cast("long"),
            F.conv(F.substring(h, 16, 15), 16, 10).cast("long"),
            F.conv(F.substring(h, 31, 2), 16, 10).cast("long"),
        ))

    def parity(j: int):
        d = j % 32
        v0, v1, v2 = parsed[j // 32]
        if d <= 14:
            return F.shiftright(v0, 4 * (14 - d)).bitwiseAND(F.lit(1))
        if d <= 29:
            return F.shiftright(v1, 4 * (29 - d)).bitwiseAND(F.lit(1))
        return F.shiftright(v2, 4 * (31 - d)).bitwiseAND(F.lit(1))

    signs = [
        F.sum(F.lit(1).cast("long") - F.lit(2).cast("long") * parity(j))
        .alias(f"c{j}")
        for j in range(k)
    ]
    counters = df.agg(*signs).select(
        F.array(*[F.col(f"c{j}") for j in range(k)]).alias("cs")
    )
    sq = F.transform(F.col("cs"), lambda c: c * c)
    est_mean = F.round(
        F.aggregate(sq, F.lit(0).cast("decimal(38,0)"), lambda a, v: a + v)
        .cast("double")
        / F.lit(float(k))
    ).cast("long")
    est_median = F.element_at(F.array_sort(sq), (k + 1) // 2)
    sketch = counters.select(
        F.lit(k).cast("int").alias("k"),
        est_mean.alias("est_mean"),
        est_median.alias("est_median"),
    )
    exact = (
        df.groupBy(key_col)
        .agg(F.count("*").cast("decimal(38,0)").alias("c"))
        .agg(F.sum(F.col("c") * F.col("c")).cast("long").alias("exact_f2"))
    )
    return sketch.crossJoin(F.broadcast(exact)).select(
        "k",
        "exact_f2",
        "est_mean",
        "est_median",
        F.round(
            (F.col("est_median") - F.col("exact_f2")).cast("double")
            / F.col("exact_f2").cast("double")
            * 1000000
        )
        .cast("long")
        .alias("err_med_e6"),
    )
