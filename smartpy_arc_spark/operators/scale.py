"""Scale helpers: skew-aware joins, bucketing, partition advice.

None of these change query semantics — they are physical-layout tools for
the 100 TB tier:

  * ``salted_join`` — explicit hot-key mitigation when AQE's skew-join
    splitting isn't available (e.g. broadcast side too big, or pre-3.0
    clusters): replicate the small side R ways, scatter the big side's hot
    keys across R salt buckets, join on (key, salt).
  * ``bucketize`` — write bucketed+sorted by join key so later joins on the
    key are shuffle-free (bucketed scan ↔ bucketed scan co-location).
  * ``repartition_for_join`` — pre-shuffle both sides once on the key so a
    chain of operations against the same key reuses one exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    *,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's keys scattered over ``salt`` buckets.

    The small side is exploded ×salt (bounded blow-up), the big side gets a
    deterministic salt from a hash of its whole row spread via
    ``monotonically_increasing_id`` — every task then holds ~1/salt of each
    hot key.  Join keys keep their original names in the output (small-side
    key dropped like ``enrich_join``)."""
    salted_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    salted_big = big.withColumn(
        "_salt",
        (F.abs(F.xxhash64(*[F.col(c) for c in big.columns])) % salt).cast("int"),
    )
    joined = salted_big.join(
        salted_small,
        (salted_big[big_key] == salted_small[small_key])
        & (salted_big["_salt"] == salted_small["_salt"]),
        how,
    )
    return joined.drop(salted_small[small_key]).drop("_salt")


def bucketize(
    df: DataFrame,
    table_name: str,
    key: str,
    *,
    n_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> DataFrame:
    """Persist hash-bucketed (and sorted) by ``key`` so subsequent joins or
    aggregations on ``key`` read co-located buckets with no exchange.
    Returns the re-read bucketed table."""
    writer = df.write.mode(mode).bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table_name)
    return df.sparkSession.table(table_name)


def repartition_for_join(
    left: DataFrame, right: DataFrame, left_key: str, right_key: str,
    n_partitions: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Hash-partition both sides identically on their join keys; Catalyst
    then reuses the exchange for every downstream join/agg on the key."""
    spark = left.sparkSession
    n = n_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    return (
        left.repartition(n, F.col(left_key)),
        right.repartition(n, F.col(right_key)),
    )


def partition_advice(
    spark: SparkSession,
    total_bytes: int,
    *,
    target_partition_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Sizing advice for a dataset of ``total_bytes``: shuffle partition
    count targeting ~128 MB per partition (the classic rule), clamped to at
    least the default parallelism."""
    parallelism = spark.sparkContext.defaultParallelism
    n = max(parallelism, total_bytes // target_partition_bytes or 1)
    return {
        "shuffle_partitions": int(n),
        "maxPartitionBytes": target_partition_bytes,
        "note": "set spark.sql.shuffle.partitions and "
                "spark.sql.files.maxPartitionBytes; AQE coalesces the excess",
    }
