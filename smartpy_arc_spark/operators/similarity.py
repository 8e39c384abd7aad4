"""Embedding similarity search.

Two tiers:
  * ``knn_cosine_bruteforce`` — exact top-k, query set broadcast against the
    distributed corpus.  The baseline: correct for any k, cost O(|Q|·|C|·d)
    spread across partitions; right answer whenever |Q| is bounded.
  * ``ann_lsh_topk`` — random-hyperplane (SRP) LSH: bucket by sign bits,
    candidate pairs only within matching buckets (multi-probe via several
    independent tables), exact cosine rerank on candidates.  The 100 TB
    path: the corpus is hashed once (shuffle on bucket key), queries touch
    only their buckets instead of the full corpus.

All dot products are built-in higher-order functions (``zip_with`` +
``aggregate``) over ``array<double>`` — JVM-side, no Python, no UDF.
Cosine uses ``dot / sqrt(norm_a² · norm_b²)`` — the same association order
DuckDB's ``list_cosine_similarity`` uses, so oracle comparisons match
bit-for-bit before rounding.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine(a: Column, b: Column) -> Column:
    """dot(a,b) / sqrt(dot(a,a) * dot(b,b)) on array<double> columns.

    Null (not NaN) for zero-norm vectors: Spark sorts NaN above every
    number, so a 0/0 NaN would rank a zero vector as the top neighbor of
    every query; NULL sorts last under ``desc`` and drops out of top-k.
    """
    denom = F.sqrt(_dot(a, a) * _dot(b, b))
    return F.when(denom > 0, _dot(a, b) / denom)


def knn_cosine_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k: broadcast the bounded query set, scan the corpus
    once, rank per query with a deterministic tiebreak.

    Returns (query_id, neighbor_id, cos_sim rounded to 6, rk).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qv"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("_cv"),
    )
    pairs = c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        cosine(F.col("_qv"), F.col("_cv")).alias("_cos"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("_cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("_cos"), 6).alias("cos_sim"),
            "rk",
        )
    )


def train_ivf_codebook(
    corpus: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    n_iters: int = 3,
) -> DataFrame:
    """Distributed Lloyd k-means codebook for the IVF coarse quantizer.

    Deterministic init (lowest-id corpus vectors), then ``n_iters`` rounds
    of assign + re-mean:

      * assignment: broadcast the (n_centroids × dim) codebook, per-row
        cosine argmin — one corpus scan, zero shuffle;
      * new means: explode to (centroid, dim_pos, value), one shuffle keyed
        by (centroid, pos) with map-side partial aggregation, re-assemble
        the mean vector ordered by position.

    The codebook itself is collected to the driver between rounds —
    n_centroids × dim doubles, a few KB — which keeps each round's lineage
    flat and the next broadcast trivial.  Empty clusters keep their
    previous centroid.  Everything is deterministic: same corpus → same
    codebook (ties break on lowest centroid_id).
    """
    c = corpus.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_cv"),
    )
    spark = corpus.sparkSession
    cents = [
        (int(r["_id"]), [float(x) for x in r["_cv"]])
        for r in c.orderBy("_id").limit(n_centroids).collect()
    ]
    for _ in range(n_iters):
        cent_df = spark.createDataFrame(
            cents, "centroid_id long, _cent array<double>"
        )
        scored = c.crossJoin(F.broadcast(cent_df)).select(
            "_id", "_cv", "centroid_id", cosine(F.col("_cv"), F.col("_cent")).alias("_d")
        )
        w = W.partitionBy("_id").orderBy(F.desc("_d"), F.asc("centroid_id"))
        assigned = (
            scored.withColumn("_r", F.row_number().over(w)).where("_r = 1")
        )
        means = (
            assigned.select("centroid_id", F.posexplode("_cv").alias("_p", "_v"))
            .groupBy("centroid_id", "_p")
            .agg(F.avg("_v").alias("_m"))
            .groupBy("centroid_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_p", "_m"))),
                    lambda s: s["_m"],
                ).alias("_cent")
            )
        )
        new = {int(r["centroid_id"]): [float(x) for x in r["_cent"]] for r in means.collect()}
        cents = [(cid, new.get(cid, vec)) for cid, vec in cents]
    return spark.createDataFrame(cents, "centroid_id long, _cent array<double>")


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    codebook: DataFrame | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k.

    Coarse quantizer: ``codebook`` when given (train one with
    :func:`train_ivf_codebook`), else ``n_centroids`` deterministic seed
    vectors (the lowest-id corpus vectors — a k-means init without
    iterations).  The corpus is assigned to its nearest centroid once
    (shuffle on centroid id = the inverted lists); each query probes its
    ``n_probe`` nearest lists and reranks exactly.

    At 100 TB the corpus pass is a single scan + one bounded-broadcast
    argmin; per-query cost drops from |C| to ~|C|·n_probe/n_centroids.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("_cv"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qv"),
    )
    centroids = (
        codebook
        if codebook is not None
        else corpus.orderBy(id_col)
        .limit(n_centroids)
        .select(
            F.col(id_col).alias("centroid_id"),
            F.col(vec_col).cast("array<double>").alias("_cent"),
        )
    )

    def nearest_lists(side: DataFrame, vec: str, n_keep: int) -> DataFrame:
        scored = side.crossJoin(F.broadcast(centroids)).select(
            *side.columns, "centroid_id", cosine(F.col(vec), F.col("_cent")).alias("_d")
        )
        w = W.partitionBy(side.columns[0]).orderBy(F.desc("_d"), F.asc("centroid_id"))
        return (
            scored.withColumn("_r", F.row_number().over(w))
            .where(F.col("_r") <= n_keep)
            .drop("_d", "_r")
        )

    c_assigned = nearest_lists(c, "_cv", 1)
    q_assigned = nearest_lists(q, "_qv", n_probe)

    cands = c_assigned.join(F.broadcast(q_assigned), on="centroid_id").where(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = cands.select(
        "query_id", "neighbor_id", cosine(F.col("_qv"), F.col("_cv")).alias("_cos")
    ).distinct()
    w = W.partitionBy("query_id").orderBy(F.desc("_cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("_cos"), 6).alias("cos_sim"),
            "rk",
        )
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def srp_bucket(vec: Column, planes: np.ndarray) -> Column:
    """Signed-random-projection bucket id: one bit per hyperplane (sign of
    the projection), packed into a long.  Planes ride along as literal
    arrays — a few KB broadcast inside the plan, no driver loop."""
    bucket = F.lit(0).cast("long")
    for p in planes:
        plane_col = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(_dot(vec, plane_col) >= 0, 1).otherwise(0)
        bucket = bucket * 2 + bit
    return bucket


def ann_lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    dim: int | None = None,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: ``n_tables`` independent SRP hash tables; a
    corpus/query pair is a candidate iff it collides in at least one table.
    Exact cosine rerank on the candidate set only.

    Recall rises with ``n_tables``; cost per query falls from |C| to the
    occupancy of its buckets (corpus hashed once per table — shuffle on the
    (table, bucket) key, identical at any scale factor).

    ``dim`` defaults to the corpus's actual vector length (one cheap probe
    of the first row) — a wrong dim would null every plane projection and
    silently collapse all vectors into one bucket.
    """
    if dim is None:
        first = corpus.select(F.size(F.col(vec_col)).alias("d")).first()
        if first is None:
            dim = 0
        else:
            dim = int(first["d"])
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qv"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("_cv"),
    )
    c_buckets = []
    q_buckets = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + t)
        c_buckets.append(
            c.select(
                "neighbor_id", "_cv",
                F.lit(t).alias("tbl"),
                srp_bucket(F.col("_cv"), planes).alias("bucket"),
            )
        )
        q_buckets.append(
            q.select(
                "query_id", "_qv",
                F.lit(t).alias("tbl"),
                srp_bucket(F.col("_qv"), planes).alias("bucket"),
            )
        )
    c_all = c_buckets[0]
    for extra in c_buckets[1:]:
        c_all = c_all.unionByName(extra)
    q_all = q_buckets[0]
    for extra in q_buckets[1:]:
        q_all = q_all.unionByName(extra)

    cands = (
        c_all.join(F.broadcast(q_all), on=["tbl", "bucket"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "_qv", "_cv")
        .distinct()
    )
    scored = cands.select(
        "query_id", "neighbor_id", cosine(F.col("_qv"), F.col("_cv")).alias("_cos")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("_cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("_cos"), 6).alias("cos_sim"),
            "rk",
        )
    )
