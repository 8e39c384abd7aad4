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


def morton_code(x, y, *, bits: int = 8):
    """Interleave the low ``bits`` bits of two non-negative integer columns
    into a Z-order (Morton) value: x's bit b lands at position 2b+1, y's at
    2b.  Pure shift/and/or expression — whole-stage codegen, engine-portable
    (the same expression is SQL in any dialect with bit operators)."""
    x = F.col(x) if isinstance(x, str) else x
    y = F.col(y) if isinstance(y, str) else y
    z = F.lit(0).cast("long")
    for b in range(bits):
        # .bitwiseOR, not `|`: on Columns `|` is logical OR and fails on longs
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(x, b).bitwiseAND(F.lit(1)), 2 * b + 1)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(y, b).bitwiseAND(F.lit(1)), 2 * b)
        )
    return z


def cluster_zorder(
    df: DataFrame,
    cols: list[str],
    *,
    bits: int = 12,
    n_partitions: int | None = None,
) -> DataFrame:
    """Re-layout ``df`` along a Z-order curve over two numeric columns so
    parquet row-group/file min-max statistics prune *both* dimensions.

    A linear sort clusters only its leading column: a predicate on the
    second column hits every file.  Z-ordering interleaves the bits of
    min-max-normalized ranks of both columns, so every file covers a small
    *rectangle* of the value space and a selective predicate on either
    column (or a 2-D box) skips most files at scan time.

    Two jobs: a scalar min/max aggregate (2·|cols| numbers to the driver —
    bounded, not a collect of data), then one range-shuffle + in-partition
    sort.  This is the batch maintenance operation a 100 TB table runs per
    partition; at that tier you'd pick ``n_partitions`` from
    ``partition_advice`` and run it under ``TempOverwrite``.
    """
    if len(cols) != 2:
        raise ValueError("cluster_zorder currently interleaves exactly 2 columns")
    cx, cy = cols
    stats = df.agg(
        F.min(cx).alias("nx"), F.max(cx).alias("xx"),
        F.min(cy).alias("ny"), F.max(cy).alias("xy"),
    ).first()
    top = (1 << bits) - 1

    def norm(c: str, lo, hi):
        if lo is None or hi is None or hi == lo:
            return F.lit(0).cast("long")
        scale = float(top) / (float(hi) - float(lo))
        return F.least(
            F.lit(top).cast("long"),
            F.greatest(
                F.lit(0).cast("long"),
                ((F.col(c).cast("double") - float(lo)) * scale).cast("long"),
            ),
        )

    z = morton_code(norm(cx, stats["nx"], stats["xx"]),
                    norm(cy, stats["ny"], stats["xy"]), bits=bits)
    out = df.withColumn("_z", z)
    n = n_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    return (
        out.repartitionByRange(n, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    *,
    bits: int = 12,
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered on a Z-order curve over ``cols``
    (one output file per range partition; each file's min-max footer stats
    then prune 2-D predicates at read time)."""
    cluster_zorder(df, cols, bits=bits, n_partitions=n_files).write.mode(
        mode
    ).parquet(path)


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


def bloom_prefilter_join(
    fact: DataFrame,
    dim: DataFrame,
    *,
    fact_key: str,
    dim_key: str,
    num_bits: int = 65536,
    num_hashes: int = 3,
    how: str = "inner",
) -> DataFrame:
    """Runtime-filter join: build a Bloom filter over ``dim``'s keys, drop
    fact rows that cannot match *before* the shuffle, then run the exact
    join.

    This is the manual form of Spark's runtime row-level filtering
    (``spark.sql.optimizer.runtime.bloomFilter.enabled``; the JVM
    ``bloom_filter_agg`` expression is not registered for direct use):
    at 100 TB the shuffle of the fact side dominates a selective join, and
    a bitset membership test at the scan cuts shuffled bytes by the dim
    side's selectivity.  False positives are eliminated by the real join
    that follows, so the result is EXACTLY the plain join's result for
    inner and left-semi joins — correctness never depends on the filter.

    Build: each dim key sets ``num_hashes`` bit positions
    (``pmod(xxhash64(key, seed), num_bits)``); one hash-aggregate ORs the
    bits into 64-bit words, and only the *set* words come back to the
    driver (bytes, not rows — the same driver-merge a native bloom build
    does).  Probe: the dense word array ships as a broadcast literal and
    each fact row tests its ``num_hashes`` bits with ``element_at`` +
    bitmask — whole-stage codegen, no Python, no extra shuffle.
    """
    if how not in ("inner", "left_semi"):
        raise ValueError(
            f"bloom prefilter preserves semantics only for inner/left_semi, got {how!r}"
        )
    if num_bits % 64:
        raise ValueError("num_bits must be a multiple of 64")

    # seeds are int32 literals on BOTH sides — xxhash64 hashes (value, type),
    # so an int seed here and a bigint seed there would build/probe
    # different bit positions
    positions = [
        f"pmod(xxhash64(`{{key}}`, {i}), {num_bits})" for i in range(num_hashes)
    ]

    set_words = (
        dim.select(
            F.explode(
                F.array(
                    *[F.expr(p.format(key=dim_key)) for p in positions]
                )
            ).alias("pos")
        )
        .selectExpr(
            "pos div 64 as word",
            "shiftleft(1L, cast(pos % 64 as int)) as bit",
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("bits"))
        .collect()
    )
    words = [0] * (num_bits // 64)
    for r in set_words:
        words[r["word"]] = r["bits"]
    bloom = F.array(*[F.lit(w).cast("long") for w in words])

    probe = None
    for p in positions:
        pos = p.format(key=fact_key)
        hit = F.expr(
            f"(element_at(__bloom__, cast(({pos}) div 64 as int) + 1)"
            f" & shiftleft(1L, cast(({pos}) % 64 as int))) != 0"
        )
        probe = hit if probe is None else (probe & hit)
    filtered = fact.withColumn("__bloom__", bloom).where(probe).drop("__bloom__")
    return filtered.join(dim, filtered[fact_key] == dim[dim_key], how)


def partitioned_cumsum(
    df: DataFrame,
    order_cols: list[str],
    sum_cols: list[str],
    *,
    prefix: str = "cum_",
    inclusive: bool = True,
    materialize: bool = True,
    grand_totals: dict | None = None,
) -> DataFrame:
    """Global running sums over ``order_cols`` WITHOUT a single-partition
    window.

    ``row_number()/sum() OVER (ORDER BY ...)`` with no PARTITION BY pulls
    the whole table through one task — the classic scale cliff for
    rank/CDF computations.  This primitive keeps the sort distributed:

      1. ``repartitionByRange(order_cols)`` — partition *i* holds globally
         smaller keys than partition *i+1* (one range-exchange, same cost
         class as any global sort);
      2. per-partition running sums via a window PARTITIONED BY
         ``spark_partition_id()`` (never crosses tasks);
      3. one tiny job aggregates per-partition totals (numPartitions rows
         to the driver), whose exclusive prefix sums come back as a
         broadcast literal map added to every row's local running sum.

    Emits one ``{prefix}{col}`` per entry of ``sum_cols`` (inclusive
    running sum by default; ``inclusive=False`` gives the exclusive
    "sum of everything strictly before this row's frame").  Rows that tie
    on ``order_cols`` are ordered arbitrarily among themselves — pass a
    unique tiebreaker as the last order col when that matters.

    ``materialize=True`` (default since r11, guide §2.4/§5)
    localCheckpoints the range-partitioned sorted frame BEFORE the
    per-partition-totals collect: the input is sampled once (range
    boundaries) and sorted ONCE, with both the totals job and the
    windowed output reading the materialized partitions — the
    un-materialized form re-executed the full exchange+sort for the
    totals collect AND again for every downstream action, and its
    correctness silently relied on ``repartitionByRange`` re-executing
    deterministically between those passes.  ``materialize=False``
    restores the recompute form (plan-inspection/tests).
    """
    from pyspark.sql import Window

    part = (
        df.repartitionByRange(*[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
    )
    if materialize:
        part = part.localCheckpoint()
    totals = part.groupBy("__pid").agg(
        *[F.sum(c).alias(c) for c in sum_cols]
    ).collect()
    offsets: dict[str, dict[int, float]] = {c: {} for c in sum_cols}
    acc = {c: 0 for c in sum_cols}
    for r in sorted(totals, key=lambda r: r["__pid"]):
        for c in sum_cols:
            offsets[c][r["__pid"]] = acc[c]
            acc[c] += r[c] or 0
    w = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0 if inclusive else -1)
    )
    out = part
    for c in sum_cols:
        if offsets[c]:
            off = F.create_map(
                *[F.lit(v) for kv in offsets[c].items() for v in kv]
            )[F.col("__pid")]
        else:
            # empty input: zero partitions collected — an argless
            # create_map() types its keys VOID and map()[__pid] fails
            # analysis; the offset of nothing is 0
            off = F.lit(0)
        local = F.sum(F.col(c)).over(w)
        out = out.withColumn(
            prefix + c,
            F.coalesce(local, F.lit(0)) + off,
        )
    if grand_totals is not None:
        grand_totals.update(acc)
    return out.drop("__pid")


def distributed_ntile(
    df: DataFrame,
    order_cols: list[str],
    k: int,
    *,
    out_col: str = "bucket",
) -> DataFrame:
    """SQL ``NTILE(k) OVER (ORDER BY ...)`` without the single-partition
    window: global row numbers come from ``partitioned_cumsum`` (range
    partition + broadcast offsets) and the bucket is the closed-form
    NTILE rule — with ``q = n div k`` and ``r = n mod k``, the first
    ``r`` buckets take ``q+1`` rows, the rest ``q`` — applied row-locally.

    Ties on ``order_cols`` land in arbitrary buckets exactly as NTILE's
    nondeterminism does; pass a unique tiebreaker as the last order col
    for reproducible output (the oracle-facing queries always do).
    """
    with_one = df.withColumn("__one", F.lit(1))
    # n comes from the cumsum's own per-partition-totals collect (r11,
    # guide §2.1/§5.3) — the former count-agg job + crossJoin(broadcast)
    # re-read the whole cumsum output for one scalar
    gt: dict = {}
    cum = partitioned_cumsum(with_one, order_cols, ["__one"], grand_totals=gt)
    n = int(gt["__one"])
    rank = F.col("cum___one").cast("long")
    q = n // k
    r = n - q * k
    head = r * (q + 1)
    q_div = F.lit(q).cast("long") if q > 0 else F.lit(None).cast("long")
    bucket = F.when(
        rank <= F.lit(head).cast("long"),
        F.ceil(rank / F.lit(q + 1).cast("long")),
    ).otherwise(
        F.lit(r).cast("long") + F.ceil((rank - F.lit(head).cast("long")) / q_div)
    )
    return (
        cum.withColumn(out_col, bucket.cast("int"))
        .drop("__one", "cum___one")
    )


def distributed_exact_percentiles(
    df: DataFrame,
    specs: list[tuple[str, list[float], str]],
    *,
    group_col: str | None = None,
) -> DataFrame:
    """Bit-exact replica of ``percentile(col, array(*fracs))`` [per
    ``group_col``] WITHOUT the exact-percentile buffer (guide §5).

    The builtin exact ``percentile()`` is an ObjectHashAggregate whose
    per-group buffer holds a counts-map of EVERY distinct value of the
    column, merged through ONE final exchange — at 100 TB the final
    aggregation task for a hot group materializes the whole column's
    value domain in memory: an executor OOM, not a slow query.  This
    primitive keeps the same exact semantics with the state distributed:

      1. melt the requested columns and aggregate per-(group, column,
         value) counts — map-side partial aggregation means the shuffle
         carries the distinct-value domain, never the row count;
      2. ``partitioned_cumsum`` turns the counts into distributed
         cumulative ranks (range exchange, per-partition windows only);
      3. ONE bounded per-(group, column) stats collect (N plus the
         group's global rank base) sizes the rank targets driver-side;
      4. ONE conditional-min aggregate over the materialized cumsum
         resolves the two bracketing values for every requested fraction;
      5. the interpolation replicates ``Percentile.getPercentile``'s
         arithmetic exactly:

             position = (N-1).toDouble * frac            (Long * Double)
             lower, higher = floor(position), ceil(position)
             lowerKey  = first value with cum count >= lower + 1
             higherKey = first value with cum count >= higher + 1
             result = lowerKey                      if higher == lower
                      lowerKey                      if higherKey == lowerKey
                      (higher-position)*lowerKey + (position-lower)*higherKey

         with every float op the same separately-rounded IEEE double the
         builtin performs: the two coefficients are computed driver-side
         from the identical Long→Double conversions, and the
         multiply-add runs in codegen in the same order.  Bit-equality
         vs the builtin is pinned by tests/test_round12_opt.py.

    ``specs`` is a list of ``(value_col, fracs, out_col)``; the output has
    one row per group present in ``df`` (groups whose values are all NULL
    yield NULL, like the builtin) and one ``array<double>`` column per
    spec.  EAGER: collects one bounded stats row per (group, column) at
    construction time (the partitioned_cumsum/grand_totals discipline) —
    group cardinality must be bounded, exactly as the builtin's own
    per-group final buffers already require.  NULL group keys are
    rejected (create_map literals cannot key on NULL); ±0.0 / NaN values
    follow Spark SQL grouping normalization rather than the builtin's
    raw-key map, which only diverges on data containing both -0.0 and
    +0.0 or NaNs.
    """
    import math

    if group_col is not None:
        sel = df.select(F.col(group_col).alias("__g"), *[
            F.col(c).alias(f"__v{i}") for i, (c, _, _) in enumerate(specs)
        ])
    else:
        sel = df.select(F.lit(0).alias("__g"), *[
            F.col(c).alias(f"__v{i}") for i, (c, _, _) in enumerate(specs)
        ])
    # melt: one scan feeds every requested column's count table
    melted = sel.select(
        "__g",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("__wc"),
                    F.col(f"__v{i}").cast("double").alias("__v"),
                )
                for i in range(len(specs))
            ])
        ).alias("__e"),
    ).select("__g", F.col("__e.__wc").alias("__wc"), F.col("__e.__v").alias("__v"))
    counts = (
        melted.where(F.col("__v").isNotNull())
        .groupBy("__g", "__wc", "__v")
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    cum = partitioned_cumsum(counts, ["__g", "__wc", "__v"], ["__cnt"])
    # per-(group, column) N and global rank base — the base is the
    # cumulative count just before the group's first row, read off the
    # materialized cumsum itself (no driver-side ordering assumption)
    stats = (
        cum.groupBy("__g", "__wc")
        .agg(
            F.sum("__cnt").alias("n"),
            F.min(F.col("cum___cnt") - F.col("__cnt")).alias("base"),
        )
        .collect()
    )
    if any(r["__g"] is None for r in stats):
        raise ValueError(
            "distributed_exact_percentiles: NULL group keys unsupported"
        )

    def _lit_map(d: dict, cast: str) -> F.Column:
        return F.create_map(
            *[
                x
                for k, v in d.items()
                for x in (F.lit(k), F.lit(v).cast(cast))
            ]
        )

    gcol = F.col("__g")
    mins, val_exprs = [], []
    for i, (_, fracs, out_col) in enumerate(specs):
        rows_i = [r for r in stats if r["__wc"] == i]
        base_i = {r["__g"]: int(r["base"]) for r in rows_i}
        if base_i:
            cig = F.col("cum___cnt") - _lit_map(base_i, "long")[gcol]
        else:
            cig = F.col("cum___cnt")  # no non-null rows anywhere: unused
        elems = []
        for j, p in enumerate(fracs):
            lo_r, hi_r, c_lo, c_hi, interp = {}, {}, {}, {}, {}
            for r in rows_i:
                n = int(r["n"])
                pos = float(n - 1) * float(p)
                lo, hi = math.floor(pos), math.ceil(pos)
                lo_r[r["__g"]] = lo + 1
                hi_r[r["__g"]] = hi + 1
                interp[r["__g"]] = 1 if hi != lo else 0
                c_lo[r["__g"]] = float(hi) - pos
                c_hi[r["__g"]] = pos - float(lo)
            lo_v = F.col(f"__lo_{i}_{j}")
            hi_v = F.col(f"__hi_{i}_{j}")
            if rows_i:
                mins.append(
                    F.min(
                        F.when(
                            (F.col("__wc") == i)
                            & (cig >= _lit_map(lo_r, "long")[gcol]),
                            F.col("__v"),
                        )
                    ).alias(f"__lo_{i}_{j}")
                )
                mins.append(
                    F.min(
                        F.when(
                            (F.col("__wc") == i)
                            & (cig >= _lit_map(hi_r, "long")[gcol]),
                            F.col("__v"),
                        )
                    ).alias(f"__hi_{i}_{j}")
                )
                elems.append(
                    F.when(_lit_map(interp, "int")[gcol] == 0, lo_v)
                    .when(lo_v == hi_v, lo_v)
                    .otherwise(
                        _lit_map(c_lo, "double")[gcol] * lo_v
                        + _lit_map(c_hi, "double")[gcol] * hi_v
                    )
                )
            else:
                mins.append(F.min(F.lit(None).cast("double")).alias(f"__lo_{i}_{j}"))
                mins.append(F.min(F.lit(None).cast("double")).alias(f"__hi_{i}_{j}"))
                elems.append(F.lit(None).cast("double"))
        # a group with zero non-null values in THIS column yields NULL
        # (not an array of NULLs), exactly like the builtin's empty buffer
        if rows_i:
            present = _lit_map({r["__g"]: 1 for r in rows_i}, "int")
            val_exprs.append(
                F.when(present[gcol] == 1, F.array(*elems))
                .otherwise(F.lit(None).cast("array<double>"))
                .alias(out_col)
            )
        else:
            val_exprs.append(F.lit(None).cast("array<double>").alias(out_col))
    brackets = cum.groupBy("__g").agg(*mins)
    resolved = brackets.select("__g", *val_exprs)
    # every group present in df appears in the output, even all-NULL ones;
    # the ungrouped form emits exactly one row even on empty input, like
    # a global agg
    if group_col is not None:
        groups = sel.select("__g").distinct()
    else:
        groups = df.sparkSession.range(1).select(F.lit(0).alias("__g"))
    out = groups.join(resolved, "__g", "left")
    if group_col is not None:
        return out.withColumnRenamed("__g", group_col)
    return out.drop("__g")


def skew_report(
    df: DataFrame,
    key_col: str,
    *,
    top_k: int = 10,
) -> DataFrame:
    """Join-planning skew profile of a key column: the ``top_k`` heaviest
    keys with their share of all rows and the skew factor
    ``count / mean_count_per_key`` — the number that decides between a
    plain shuffle join, AQE skew splitting, and explicit salting
    (``salted_join``; rule of thumb: factor > ~20 on a join key is where
    task stragglers start dominating the stage).

    One hash aggregate on the key + a 2-scalar broadcast; the top-k is a
    sorted limit over the aggregate, never over the detail.
    """
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count("*").cast("long").alias("n_rows")
    )
    totals = counts.agg(
        F.sum("n_rows").alias("__total"),
        F.count("*").alias("__n_keys"),
    )
    mean = F.col("__total").cast("double") / F.col("__n_keys").cast("double")
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "key",
            "n_rows",
            F.round(
                F.col("n_rows").cast("double")
                / F.col("__total").cast("double")
                * 1000000
            ).cast("long").alias("share_e6"),
            F.round(F.col("n_rows").cast("double") / mean * 100)
            .cast("long")
            .alias("skew_factor_e2"),
        )
        .orderBy(F.desc("n_rows"), F.asc("key"))
        .limit(top_k)
    )


def compact_small_files(
    spark,
    src_dir: str,
    dst_dir: str,
    *,
    target_bytes: int = 128 * 1024 * 1024,
    fmt: str = "parquet",
) -> "DataFrame":
    """Small-file compaction — the table-maintenance op every long-lived
    lake table needs: streaming ingestion and fine-grained upserts leave
    thousands of KB-sized files, and at 100 TB the resulting task-per-file
    scheduling + open/close overhead dominates scans.  Rewrite the
    directory into ``ceil(total_bytes / target_bytes)`` files.

    The driver only LISTS the directory (names + sizes — metadata, never
    data); the rewrite itself is a distributed read → coalesce → write.
    ``coalesce(n_out)`` is a narrow dependency: each output task
    concatenates whole scan splits locally, so compaction moves ZERO
    bytes across the network, where ``repartition(n_out)`` would shuffle
    the entire table once (plus the sort-before-repartition every
    keyless repartition pays).  Scan splits are bounded by
    ``spark.sql.files.maxPartitionBytes`` (128 MB default), finer than
    any sane ``target_bytes``, so the scan always has >= ``n_out``
    partitions for coalesce to land on exactly; the repartition fallback
    guards the degenerate case (splitting fewer-than-``n_out``
    partitions can only be done by a shuffle).  Returns a 1-row
    DataFrame ``(n_files_before, n_files_after, n_rows)`` for the
    maintenance log.
    """
    import glob as _glob
    import math as _math
    import os as _os

    ext = {"parquet": ".parquet", "orc": ".orc"}[fmt]
    files = [
        p for p in _glob.glob(_os.path.join(src_dir, f"*{ext}"))
        if _os.path.isfile(p)
    ]
    total = sum(_os.path.getsize(p) for p in files)
    n_out = max(1, _math.ceil(total / target_bytes))
    df = spark.read.format(fmt).load(src_dir)
    if df.rdd.getNumPartitions() >= n_out:
        sized = df.coalesce(n_out)
    else:  # more output files than scan splits: only a shuffle can split
        sized = df.repartition(n_out)
    sized.write.mode("overwrite").format(fmt).save(dst_dir)
    after = [
        p for p in _glob.glob(_os.path.join(dst_dir, f"*{ext}"))
        if _os.path.isfile(p)
    ]
    n_rows = spark.read.format(fmt).load(dst_dir).count()
    return spark.createDataFrame(
        [(len(files), len(after), n_rows)],
        "n_files_before int, n_files_after int, n_rows long",
    )


def hilbert_code(x, y, *, bits: int = 8):
    """Hilbert-curve index of two non-negative integer columns in
    ``[0, 2^bits)`` — the locality-preserving alternative to
    :func:`morton_code` (Z-order) used by modern table formats for
    multi-dimensional clustering: Hilbert has no Z-shaped "jumps", so
    file min-max rectangles are tighter and 2-D range predicates skip
    more files.

    The classic xy→d walk (Hamilton's algorithm: per bit-plane, quadrant
    digit + reflect/swap rotation) runs as ONE ``aggregate`` HOF over the
    literal bit-plane list with an ``[x, y, d]`` accumulator — constant
    expression size (no per-bit plan unrolling), whole-stage codegen,
    pure integer ops, bit-identical in any engine folding the same list.
    """
    x = F.col(x) if isinstance(x, str) else x
    y = F.col(y) if isinstance(y, str) else y
    planes = F.array(
        *[F.lit(1 << b).cast("long") for b in range(bits - 1, -1, -1)]
    )
    zero = F.lit(0).cast("long")
    one = F.lit(1).cast("long")
    init = F.array(x.cast("long"), y.cast("long"), zero)

    def step(acc, s):
        hx, hy, hd = (F.element_at(acc, i) for i in (1, 2, 3))
        rx = F.when(hx.bitwiseAND(s) > 0, one).otherwise(zero)
        ry = F.when(hy.bitwiseAND(s) > 0, one).otherwise(zero)
        # no CSE in HOF lambdas: rx/ry are re-inlined where used (bounded)
        d_new = hd + s * s * (
            (F.lit(3).cast("long") * rx).bitwiseXOR(ry)
        )
        # rotation: when ry = 0, reflect within the quadrant if rx = 1,
        # then swap the axes; when ry = 1 the frame is unchanged.
        x_new = F.when(ry == one, hx).otherwise(
            F.when(rx == one, s - one - hy).otherwise(hy)
        )
        y_new = F.when(ry == one, hy).otherwise(
            F.when(rx == one, s - one - hx).otherwise(hx)
        )
        return F.array(x_new, y_new, d_new)

    return F.element_at(F.aggregate(planes, init, step), 3)


def zone_map(
    df: DataFrame,
    zone_expr,
    stats_cols: list[str],
    predicates: dict[str, tuple[str, object, object]] | None = None,
) -> DataFrame:
    """Zone-map (data-skipping) statistics: per zone — a file/row-group
    surrogate such as ``floor(key / width)`` — the row count and min/max
    of each stats column, plus an optional ``scan_<name>`` 0/1 flag per
    named range predicate saying whether the zone's [min, max] envelope
    can satisfy it (0 = the scan planner skips the whole zone).  This is
    the parquet-footer / Delta-stats pruning decision made inspectable:
    the fraction of zones with ``scan_* = 0`` is the I/O the layout saves
    at 100 TB, and comparing it across layouts (sorted vs Z-order vs
    Hilbert) is how a layout choice is justified with data.

    One hash aggregate; min/max are algebraic so the map side collapses
    each partition to one row per zone before the (bounded) shuffle.

    ``predicates`` maps name → ``(col, lo, hi)`` (closed interval; either
    bound may be None for one-sided).
    """
    zone_expr = F.col(zone_expr) if isinstance(zone_expr, str) else zone_expr
    aggs = [F.count("*").cast("long").alias("n_rows")]
    for c in stats_cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    zones = df.groupBy(zone_expr.alias("zone")).agg(*aggs)
    for name, (c, lo, hi) in (predicates or {}).items():
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (F.col(f"max_{c}") >= F.lit(lo))
        if hi is not None:
            cond = cond & (F.col(f"min_{c}") <= F.lit(hi))
        zones = zones.withColumn(f"scan_{name}", cond.cast("int"))
    return zones.orderBy("zone")


GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_expr(lat, lon, *, precision: int = 8):
    """Geohash cell id of (lat, lon) at ``precision`` base-32 chars as a
    pure shift/and/concat Column expression — no UDF, whole-stage
    codegen, engine-portable (the ``morton_code`` contract).

    Equivalence to the textbook bisection construction: ``precision``
    chars carry 5p bits alternating lon (from the most significant bit)
    and lat; successive bisection of [-180, 180] / [-90, 90] is exactly
    floor-quantization to ``ceil(5p/2)`` / ``floor(5p/2)`` bits, so the
    cell index is one multiply+floor per axis (clamped at the top
    edge), then a bit interleave, then 5-bit groups mapped through the
    base-32 alphabet.
    """
    lat = F.col(lat) if isinstance(lat, str) else lat
    lon = F.col(lon) if isinstance(lon, str) else lon
    nbits = 5 * precision
    bits_lon = (nbits + 1) // 2
    bits_lat = nbits // 2
    ix = F.least(
        F.floor(
            (lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(1 << bits_lon))
        ).cast("long"),
        F.lit((1 << bits_lon) - 1),
    )
    iy = F.least(
        F.floor(
            (lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(1 << bits_lat))
        ).cast("long"),
        F.lit((1 << bits_lat) - 1),
    )
    code = F.lit(0).cast("long")
    for b in range(bits_lon):
        # lon bit (bits_lon-1-b) -> global bit position (nbits-1 - 2b)
        code = code.bitwiseOR(
            F.shiftleft(
                F.shiftright(ix, bits_lon - 1 - b).bitwiseAND(F.lit(1)),
                nbits - 1 - 2 * b,
            )
        )
    for b in range(bits_lat):
        # lat bit (bits_lat-1-b) -> global bit position (nbits-2 - 2b)
        code = code.bitwiseOR(
            F.shiftleft(
                F.shiftright(iy, bits_lat - 1 - b).bitwiseAND(F.lit(1)),
                nbits - 2 - 2 * b,
            )
        )
    chars = F.array(*[F.lit(c) for c in GEOHASH_ALPHABET])
    return F.concat(
        *[
            F.element_at(
                chars,
                (
                    F.shiftright(code, 5 * (precision - 1 - g))
                    .bitwiseAND(F.lit(31))
                    + F.lit(1)
                ).cast("int"),
            )
            for g in range(precision)
        ]
    )


def geohash_sql(lat_expr: str, lon_expr: str, *, precision: int = 8) -> str:
    """The SQL mirror of :func:`geohash_expr`, generated from the SAME
    loop so the two expressions cannot drift."""
    nbits = 5 * precision
    bits_lon = (nbits + 1) // 2
    bits_lat = nbits // 2
    ix = (
        f"least(CAST(floor((({lon_expr}) + 180.0) / 360.0 "
        f"* {float(1 << bits_lon)}) AS BIGINT), {(1 << bits_lon) - 1})"
    )
    iy = (
        f"least(CAST(floor((({lat_expr}) + 90.0) / 180.0 "
        f"* {float(1 << bits_lat)}) AS BIGINT), {(1 << bits_lat) - 1})"
    )
    terms = []
    for b in range(bits_lon):
        terms.append(
            f"((({ix}) >> {bits_lon - 1 - b}) & 1) << {nbits - 1 - 2 * b}"
        )
    for b in range(bits_lat):
        terms.append(
            f"((({iy}) >> {bits_lat - 1 - b}) & 1) << {nbits - 2 - 2 * b}"
        )
    code = " | ".join(f"({t})" for t in terms)
    parts = [
        f"substr('{GEOHASH_ALPHABET}', "
        f"CAST(((({code}) >> {5 * (precision - 1 - g)}) & 31) + 1 "
        f"AS INTEGER), 1)"
        for g in range(precision)
    ]
    return " || ".join(parts)
