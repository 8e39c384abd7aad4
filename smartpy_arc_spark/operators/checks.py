"""Data-quality constraint checking — deequ-style rules evaluated in a
single aggregate pass.

A pipeline feeding a 100 TB training run needs cheap, continuous
verification that upstream data still honors its contract (the reference
enforces this shape implicitly through arcpy schema tooling; here it is an
explicit operator).  Design:

  * every row-local rule (completeness, uniqueness-by-count, value range,
    regex conformance) folds into ONE ``df.agg(...)`` — a single scan with
    partial aggregation, no shuffle beyond the final combine;
  * referential rules (foreign-key containment) are the only ones needing
    a second input: a broadcast (or shuffle for big dims) anti-join count.

Output is one row per rule: (rule, col, metric, threshold, passed) —
easy to sink to a monitoring table per batch.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


@dataclass(frozen=True)
class Rule:
    name: str
    column: str
    metric: Column  # aggregate expression producing a double metric
    threshold: float
    # metric >= threshold passes (negate the metric for upper bounds)


def completeness(col: str, min_frac: float = 1.0) -> Rule:
    """Fraction of non-null values >= min_frac."""
    m = F.count(col) / F.greatest(F.count(F.lit(1)), F.lit(1))
    return Rule("completeness", col, m.cast("double"), min_frac)


def uniqueness(col: str, min_frac: float = 1.0) -> Rule:
    """approx-distinct / rows >= min_frac (exact for min_frac=1.0 via
    count_distinct would add a shuffle; approx keeps the single pass —
    rsd 1%, so use thresholds ≤ 0.99 or accept the tolerance)."""
    m = F.approx_count_distinct(col, 0.01) / F.greatest(
        F.count(F.lit(1)), F.lit(1)
    )
    return Rule("uniqueness", col, m.cast("double"), min_frac)


def min_value(col: str, lo: float) -> Rule:
    return Rule("min_value", col, F.min(col).cast("double"), lo)


def max_value(col: str, hi: float) -> Rule:
    # pass iff max <= hi  ⇔  -max >= -hi
    return Rule("max_value", col, (-F.max(col)).cast("double"), -hi)


def matches(col: str, pattern: str, min_frac: float = 1.0) -> Rule:
    m = F.count(F.when(F.col(col).rlike(pattern), 1)) / F.greatest(
        F.count(col), F.lit(1)
    )
    return Rule("matches", col, m.cast("double"), min_frac)


def run_checks(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Evaluate all row-local rules in one aggregate pass; returns
    (rule, col, metric, threshold, passed) per rule."""
    aliased = [r.metric.alias(f"_m{i}") for i, r in enumerate(rules)]
    agg = df.agg(*aliased)
    spark = df.sparkSession
    rows = []
    vals = agg.first()
    for i, r in enumerate(rules):
        v = vals[f"_m{i}"]
        metric = float(v) if v is not None else None
        # report upper-bound rules with the natural sign
        shown = -metric if (r.name == "max_value" and metric is not None) else metric
        thr = -r.threshold if r.name == "max_value" else r.threshold
        passed = metric is not None and metric >= r.threshold
        rows.append((r.name, r.column, shown, float(thr), bool(passed)))
    return spark.createDataFrame(
        rows, "rule string, col string, metric double, threshold double, passed boolean"
    )


def fk_containment(
    child: DataFrame,
    parent: DataFrame,
    child_col: str,
    parent_col: str,
    *,
    broadcast_parent: bool = True,
) -> DataFrame:
    """Referential check: count of child keys missing from the parent
    (anti-join; broadcast the parent when it is a bounded dim, shuffle
    otherwise).  Returns one row (rule, col, n_orphans, passed)."""
    p = parent.select(F.col(parent_col).alias("_pk")).distinct()
    if broadcast_parent:
        p = F.broadcast(p)
    orphans = child.join(
        p, child[child_col] == F.col("_pk"), "left_anti"
    ).count()
    spark = child.sparkSession
    return spark.createDataFrame(
        [("fk_containment", child_col, float(orphans), 0.0, orphans == 0)],
        "rule string, col string, metric double, threshold double, passed boolean",
    )


def with_observed_quality(
    df: DataFrame,
    cols: list[str],
    *,
    name: str = "dq",
):
    """Attach in-flight quality metrics to ``df`` via ``df.observe``:
    row count plus per-column null counts, collected BY THE ACTION THAT
    ALREADY RUNS — zero extra scans, zero extra shuffles.  This is how a
    100 TB write verifies its own batch: the sink action itself reports the
    metrics instead of a second validation pass over the data.

    Returns ``(observed_df, observation)``; after any action on
    ``observed_df``, ``observation.get`` yields
    ``{"n_rows": ..., "nulls_<col>": ...}``.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    metrics += [
        F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}") for c in cols
    ]
    return df.observe(obs, *metrics), obs


def k_anonymity(
    df: DataFrame,
    quasi_cols: list[str],
    *,
    k: int = 5,
) -> DataFrame:
    """k-anonymity audit over a quasi-identifier combination: every row
    must share its QI tuple with at least ``k-1`` others, or it is
    re-identifiable.  Returns one row per QI equivalence class:
    ``(quasi columns..., n, anonymous)`` — feed the ``anonymous = false``
    classes to suppression/generalization.

    One hash aggregate on the QI tuple; class cardinality is the whole
    computation, so this is groupBy-count shaped at any scale (skewed
    popular classes are exactly the safe ones).
    """
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count("*").cast("long").alias("n"))
        .withColumn("anonymous", F.col("n") >= k)
    )


def l_diversity(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    *,
    l: int = 2,
) -> DataFrame:
    """l-diversity audit — k-anonymity's necessary companion: a QI
    equivalence class whose SENSITIVE attribute is uniform leaks the
    secret even when the class is large (the homogeneity attack).  Every
    class must contain at least ``l`` distinct sensitive values.

    Returns one row per QI class: ``(quasi columns..., n, n_sensitive,
    top_sensitive_n, diverse)`` — ``top_sensitive_n`` (the modal
    sensitive count) feeds the stricter entropy/recursive-(c,l) variants
    downstream.  Two bounded hash aggregates (class × sensitive value,
    then class), groupBy-count shaped at any scale.
    """
    cells = df.groupBy(
        *quasi_cols, F.col(sensitive_col).alias("__sv")
    ).agg(F.count("*").alias("__c"))
    return (
        cells.groupBy(*quasi_cols)
        .agg(
            F.sum("__c").cast("long").alias("n"),
            F.count("*").cast("long").alias("n_sensitive"),
            F.max("__c").cast("long").alias("top_sensitive_n"),
        )
        .withColumn("diverse", F.col("n_sensitive") >= l)
    )


def population_stability_index(
    df_expected: DataFrame,
    df_actual: DataFrame,
    value_col: str,
    *,
    lo: float,
    hi: float,
    n_buckets: int = 10,
    epsilon_num: int = 1,
) -> DataFrame:
    """Population Stability Index between two slices of the same metric —
    the standard model/feature drift score:

        PSI = Σ_buckets (p_i − q_i) · ln(p_i / q_i)

    (< 0.1 stable, 0.1–0.25 drifting, > 0.25 shifted, by the usual rule
    of thumb).  Buckets are FIXED-WIDTH over [lo, hi] (width_bucket, with
    underflow/overflow buckets 0 and n+1), because equi-width edges are
    portable constants — percentile edges would re-fit on every run and
    hide drift.  Zero-count buckets are Laplace-smoothed by
    ``epsilon_num/n`` rows so the logarithm stays finite, mirroring
    standard PSI practice.

    Two bounded aggregates (one per slice) joined on the bucket id;
    per-bucket output plus the scalar in ``psi_e6`` on every row (ln is
    the only transcendental; integer-scaled like the other statistics).
    """
    def bucketed(d: DataFrame, side: str) -> DataFrame:
        b = F.width_bucket(
            F.col(value_col), F.lit(float(lo)), F.lit(float(hi)), F.lit(n_buckets)
        ).cast("int")
        return d.groupBy(b.alias("bucket")).agg(
            F.count("*").cast("long").alias(f"n_{side}")
        )

    e = bucketed(df_expected, "expected")
    a = bucketed(df_actual, "actual")
    # materialized once (≤ n_buckets + 2 rows): cells feed the totals
    # aggregate and the scored join, and scored feeds the PSI total and
    # the output — without the checkpoint each consumer re-executes
    # both full-slice bucket aggregates (r11, guide §2.4)
    cells = e.join(a, "bucket", "full").select(
        F.coalesce(F.col("bucket"), F.lit(-1)).alias("bucket"),
        F.coalesce("n_expected", F.lit(0)).alias("n_expected"),
        F.coalesce("n_actual", F.lit(0)).alias("n_actual"),
    ).localCheckpoint(eager=True)
    tot = cells.agg(
        F.sum("n_expected").alias("__te"), F.sum("n_actual").alias("__ta")
    )
    j = cells.crossJoin(F.broadcast(tot))
    p = (F.col("n_expected").cast("double") + F.lit(float(epsilon_num))) / (
        F.col("__te").cast("double") + F.lit(float(epsilon_num))
    )
    q = (F.col("n_actual").cast("double") + F.lit(float(epsilon_num))) / (
        F.col("__ta").cast("double") + F.lit(float(epsilon_num))
    )
    term = (p - q) * F.log(p / q)
    scored = j.select(
        "bucket", "n_expected", "n_actual",
        F.round(term * 1000000).cast("long").alias("term_e6"),
    )
    total = scored.agg(F.sum("term_e6").cast("long").alias("psi_e6"))
    return scored.crossJoin(F.broadcast(total))


def referential_report(
    fact: DataFrame,
    dims: list[tuple[str, DataFrame, str]],
    *,
    fact_name: str = "fact",
) -> DataFrame:
    """Referential-integrity audit: for each (fk_col, dim, pk_col) spec,
    count fact rows whose foreign key has no match in the dimension
    (orphans) and NULL keys (excused from the FK contract, reported
    separately) — the pre-join health check that explains inner-join row
    loss before anyone debugs the join itself.

    One LEFT ANTI join per constraint against the dim's distinct key —
    anti joins broadcast when the key set is small and never produce
    fan-out; NULL keys are counted in the same scan.  Returns one row
    per constraint: ``(constraint, n_rows, n_null_fk, n_orphans, ok)``.
    """
    spark = fact.sparkSession
    out = None
    n_rows = fact.count()
    for fk, dim, pk in dims:
        nulls = fact.where(F.col(fk).isNull()).count()
        orphans = (
            fact.where(F.col(fk).isNotNull())
            .join(
                dim.select(F.col(pk).alias(fk)).distinct(),
                fk,
                "left_anti",
            )
            .count()
        )
        row = spark.createDataFrame(
            [(f"{fact_name}.{fk} -> {pk}", n_rows, nulls, orphans, orphans == 0)],
            "constraint string, n_rows long, n_null_fk long, "
            "n_orphans long, ok boolean",
        )
        out = row if out is None else out.unionAll(row)
    return out


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    *,
    scale: int = 100,
    approx: bool = False,
) -> DataFrame:
    """One-pass column profile — the `DESCRIBE`-on-steroids every
    ingestion pipeline runs first: per column, row count, null count,
    exact distinct count, min/max (as strings, so one schema fits every
    type) and, for numeric columns, an exact fixed-point mean.

    All columns profile in a SINGLE aggregate over one scan (Catalyst
    expands the multi-distinct into one shuffle); the wide 1-row result
    unpivots to one row per column.  Exact ``count_distinct`` is the
    oracle-matching choice; ``approx=True`` swaps in
    ``approx_count_distinct`` (HLL++, one partial-mergeable sketch per
    column, NO Expand stage) — the 100 TB configuration — with the rest
    of the plan unchanged.

    Returns ``(column, dtype, n_rows, n_null, n_distinct, min_value,
    max_value, mean_e4)`` — ``mean_e4`` NULL for non-numeric columns.
    """
    numeric = {"int", "bigint", "smallint", "tinyint", "double", "float"}
    cols = columns or df.columns
    dtypes = dict(df.dtypes)
    aggs = []
    for c in cols:
        col = F.col(c)
        aggs += [
            F.count("*").alias(f"{c}__n"),
            F.count(F.when(col.isNull(), 1)).alias(f"{c}__nul"),
            (
                # rsd 0.01, not the 0.05 default: the default admits ~9%
                # distinct-count misses (observed on orders at sf0.01),
                # which defeats the profile's purpose; 0.01 keeps the
                # sketch ~4 KB/column — still trivially mergeable state
                F.approx_count_distinct(col, 0.01) if approx
                else F.count_distinct(col)
            ).alias(f"{c}__dis"),
            F.min(col).cast("string").alias(f"{c}__min"),
            F.max(col).cast("string").alias(f"{c}__max"),
            (
                F.round(
                    F.sum(F.round(col.cast("double") * scale).cast("long"))
                    .cast("double")
                    / (F.lit(float(scale)) * F.count(col).cast("double"))
                    * 10000
                ).cast("long")
                if dtypes[c] in numeric
                else F.lit(None).cast("long")
            ).alias(f"{c}__avg"),
        ]
    wide = df.agg(*aggs)
    rows = [
        F.struct(
            F.lit(c).alias("column"),
            F.lit(dtypes[c]).alias("dtype"),
            F.col(f"{c}__n").cast("long").alias("n_rows"),
            F.col(f"{c}__nul").cast("long").alias("n_null"),
            F.col(f"{c}__dis").cast("long").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_value"),
            F.col(f"{c}__max").alias("max_value"),
            F.col(f"{c}__avg").alias("mean_e4"),
        )
        for c in cols
    ]
    return wide.select(
        F.explode(F.array(*rows)).alias("p")
    ).select("p.*")


def table_fingerprint(
    df: DataFrame, columns: list[str] | None = None
) -> DataFrame:
    """Order-insensitive table checksum for cross-system reconciliation:
    every row hashes (md5 over a canonical string form — engine-portable,
    unlike xxhash) to a 63-bit integer, and the table fingerprint is the
    SUM of row hashes mod 2⁶³ plus the row count.  Two tables holding the
    same multiset of rows produce the same pair on ANY engine, in any row
    or partition order — the "did replication/migration produce the same
    table?" primitive.

    One scan, one scalar aggregate; the mod-sum is commutative so
    map-side partials combine freely.  NULLs encode as a sentinel so
    (NULL, 'x') and ('x', NULL) differ.
    """
    cols = columns or df.columns
    canon = F.concat_ws(
        "\x1f", *[
            F.coalesce(F.col(c).cast("string"), F.lit("\x00NULL"))
            for c in cols
        ]
    )
    row_hash = F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast(
        "decimal(38,0)"
    )
    # 2^63 exceeds the long literal range — spell it as a DECIMAL literal
    m = F.expr("CAST(9223372036854775808 AS DECIMAL(38,0))")
    return df.select(row_hash.alias("h")).agg(
        F.count("*").cast("long").alias("n_rows"),
        (F.sum("h") % m).cast("long").alias("fingerprint"),
    )


def calibration_bins(
    df: DataFrame,
    prob_col: str,
    label_col,
    *,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability-diagram bins for a probabilistic classifier: bucket
    predictions into ``n_bins`` equal-width probability bins and compare
    each bin's mean predicted probability against its empirical positive
    rate — the calibration readout behind ECE and calibration plots.

    Per-row predictions pre-round to integer millionths before the bin
    sums (order-free aggregates); each emitted mean is ONE division.
    One hash aggregate over a bounded bin key.  Returns per bin:
    ``(bin, n, avg_pred_e6, pos_rate_e6)``.
    """
    label = F.col(label_col) if isinstance(label_col, str) else label_col
    p = F.col(prob_col)
    b = F.least(
        F.floor(p * n_bins).cast("int"), F.lit(n_bins - 1)
    )
    p_e6 = F.round(p * 1000000).cast("long")
    return (
        df.where(p.isNotNull())
        .groupBy(b.alias("bin"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(p_e6).cast("long").alias("sp"),
            F.sum(F.when(label, 1).otherwise(0)).cast("long").alias("pos"),
        )
        .select(
            "bin",
            "n",
            F.round(F.col("sp").cast("double") / F.col("n").cast("double"))
            .cast("long")
            .alias("avg_pred_e6"),
            F.round(
                F.col("pos").cast("double")
                / F.col("n").cast("double")
                * 1000000
            )
            .cast("long")
            .alias("pos_rate_e6"),
        )
    )


def classification_metrics(
    df: DataFrame,
    prob_col: str,
    label_col,
    *,
    threshold: float = 0.5,
) -> DataFrame:
    """Thresholded binary-classification metrics in ONE aggregate pass:
    confusion counts plus precision / recall / F1 / accuracy and the
    Brier score.  Counts are exact integers; each emitted metric is a
    single division (Brier's numerator sums per-row integer
    ``(p_e6 − y·1e6)²`` in DECIMAL), so everything is engine-portable.

    Returns one row ``(n, tp, fp, fn, tn, precision_e6, recall_e6,
    f1_e6, accuracy_e6, brier_e6)``.
    """
    label = F.col(label_col) if isinstance(label_col, str) else label_col
    p = F.col(prob_col)
    pred = p >= threshold
    y = F.when(label, 1).otherwise(0)
    p_e6 = F.round(p * 1000000).cast("long")
    diff = p_e6 - y.cast("long") * 1000000
    agg = df.where(p.isNotNull()).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(pred & label, 1).otherwise(0)).cast("long").alias("tp"),
        F.sum(F.when(pred & ~label, 1).otherwise(0)).cast("long").alias("fp"),
        F.sum(F.when(~pred & label, 1).otherwise(0)).cast("long").alias("fn"),
        F.sum(F.when(~pred & ~label, 1).otherwise(0)).cast("long").alias("tn"),
        F.sum((diff * diff).cast("decimal(38,0)")).alias("sq"),
    )
    tp, fp, fn, tn = (F.col(c).cast("double") for c in ("tp", "fp", "fn", "tn"))
    prec = F.when(tp + fp > 0, tp / (tp + fp))
    rec = F.when(tp + fn > 0, tp / (tp + fn))
    f1 = F.when(
        (tp + fp > 0) & (tp + fn > 0) & (prec + rec > 0),
        2.0 * prec * rec / (prec + rec),
    )
    n = F.col("n").cast("double")
    e6 = lambda c: F.round(c * 1000000).cast("long")  # noqa: E731
    return agg.select(
        "n", "tp", "fp", "fn", "tn",
        e6(prec).alias("precision_e6"),
        e6(rec).alias("recall_e6"),
        e6(f1).alias("f1_e6"),
        e6((tp + tn) / n).alias("accuracy_e6"),
        # brier = mean((p-y)^2); sq is in e12 units
        F.round(F.col("sq").cast("double") / n / 1e6).cast("long").alias(
            "brier_e6"
        ),
    )


def explain_summary(df: DataFrame) -> DataFrame:
    """Physical-plan introspection as DATA: one row per plan metric —
    exchanges, shuffle vs broadcast, join strategies, scan count, pushed
    filters, whole-stage-codegen spans — the `.explain()` facts a
    pipeline can assert on in CI instead of eyeballing (this is the same
    sweep `tools/audit_plans.py` runs repo-wide, packaged per-DataFrame).

    Driver-only: reads the executed plan string, touches no data.
    Returns ``(metric, value)`` rows.
    """
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    metrics = {
        "exchanges_total": len(re.findall(r"Exchange ", plan)),
        "exchanges_single_partition": len(
            re.findall(r"Exchange SinglePartition", plan)
        ),
        "broadcast_exchanges": len(re.findall(r"BroadcastExchange", plan)),
        "broadcast_hash_joins": len(re.findall(r"BroadcastHashJoin", plan)),
        "sort_merge_joins": len(re.findall(r"SortMergeJoin", plan)),
        "broadcast_nested_loop_joins": len(
            re.findall(r"BroadcastNestedLoopJoin", plan)
        ),
        "cartesian_products": len(re.findall(r"CartesianProduct", plan)),
        "file_scans": len(re.findall(r"FileScan|Scan parquet", plan)),
        "pushed_filters": len(re.findall(r"PushedFilters: \[[^\]]", plan)),
        # span markers ("*(N)") only appear once AQE finalizes a plan;
        # 0 on an unexecuted adaptive plan is expected
        "wholestage_codegen_spans": len(
            set(re.findall(r"\*\((\d+)\)", plan))
            | set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
        ),
        "sorts": len(re.findall(r"\bSort \[", plan)),
        "windows": len(re.findall(r"\bWindow \[|WindowExec", plan)),
    }
    spark = df.sparkSession
    return spark.createDataFrame(
        sorted(metrics.items()), "metric string, value long"
    )


def fd_check(
    df: DataFrame,
    pairs: list[tuple[str, str]],
) -> DataFrame:
    """Functional-dependency discovery/validation: for each candidate
    pair ``(determinant, dependent)`` report whether ``det → dep`` holds
    (every determinant value maps to exactly one dependent value) and,
    when it doesn't, how badly — the schema-profiling primitive behind
    key inference, normalization advice, and silent-join-corruption
    checks in data-quality suites.

    Per pair: one determinant-keyed aggregate counting distinct
    dependents per group, then a bounded rollup — ``n_groups``,
    ``n_violating`` (groups with >1 dependent value), ``max_dep_per_det``
    and ``holds``.  Pairs are independent aggregates unioned together
    (each its own map-side-combined shuffle; a 100 TB scan amortizes
    across pairs via Spark's shared scan reuse when cached upstream).
    Exact by construction — counts only.
    """
    outs = []
    for det, dep in pairs:
        g = (
            df.groupBy(F.col(det).alias("_det"))
            .agg(F.count_distinct(F.col(dep)).cast("long").alias("_ndep"))
            .agg(
                F.count("*").cast("long").alias("n_groups"),
                F.sum(F.when(F.col("_ndep") > 1, 1).otherwise(0))
                .cast("long")
                .alias("n_violating"),
                F.max("_ndep").cast("long").alias("max_dep_per_det"),
            )
            .select(
                F.lit(det).alias("determinant"),
                F.lit(dep).alias("dependent"),
                "n_groups",
                "n_violating",
                "max_dep_per_det",
                F.when(F.col("n_violating") == 0, 1)
                .otherwise(0)
                .cast("int")
                .alias("holds"),
            )
        )
        outs.append(g)
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("determinant", "dependent")


def t_closeness(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    *,
    t_flag_e6: int = 200000,
) -> DataFrame:
    """t-closeness audit — the third rung of the anonymity ladder after
    :func:`k_anonymity` and :func:`l_diversity`: a QI class whose
    SENSITIVE-value distribution diverges from the table-wide one leaks
    information even when it is large and diverse (the skewness attack).
    Distance is the Earth Mover's Distance over the ordered sensitive
    domain with unit ground distance, normalized by ``m - 1`` — the
    measure from Li/Li/Venkatasubramanian (ICDE 2007).

    Exactness: with class cumulative count ``G_j`` (of ``n_g``) and
    global cumulative ``C_j`` (of ``n``), each EMD term is
    ``|G_j·n − C_j·n_g|`` — an exact integer — and the distance is ONE
    division of the integer sum by ``n_g·n·(m−1)``.

    Shape: the class × sensitive cell table densifies against the
    bounded sensitive domain (broadcast), cumulative sums run inside the
    class-keyed window partition, and the rollup reuses the same key —
    groupBy-count shaped at any scale.

    Returns per class: ``(quasi columns..., n, t_e6, close)``.
    """
    qi = [F.col(c) for c in quasi_cols]
    # materialized once (bounded by QI classes × sensitive domain): cells
    # feed the domain rollup, the group distinct and the densification
    # join — three consumers that otherwise re-scan the detail (r11)
    cells = df.groupBy(*qi, F.col(sensitive_col).alias("sv")).agg(
        F.count("*").cast("long").alias("c")
    ).localCheckpoint(eager=True)
    domain = (
        cells.groupBy("sv")
        .agg(F.sum("c").cast("long").alias("gc"))
    )
    m_tot = domain.agg(
        F.count("*").cast("long").alias("m"),
        F.sum("gc").cast("long").alias("n_tot"),
    )
    groups = cells.select(*quasi_cols).distinct()
    dense = (
        groups.join(F.broadcast(domain), how="cross")
        .join(cells, [*quasi_cols, "sv"], "left")
        .select(
            *quasi_cols,
            "sv",
            "gc",
            F.coalesce("c", F.lit(0)).cast("long").alias("c"),
        )
    )
    wg = W.partitionBy(*quasi_cols).orderBy("sv")
    full = W.partitionBy(*quasi_cols)
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    cum = dense.select(
        *quasi_cols,
        "sv",
        F.sum("c").over(wg.rowsBetween(W.unboundedPreceding, 0)).alias("cg"),
        F.sum("gc").over(wg.rowsBetween(W.unboundedPreceding, 0)).alias("cc"),
        F.sum("c").over(full).cast("long").alias("n_g"),
        F.row_number().over(wg).alias("rn"),
    )
    terms = cum.crossJoin(F.broadcast(m_tot)).select(
        *quasi_cols,
        "n_g",
        "m",
        F.when(
            F.col("rn") < F.col("m"),
            F.abs(
                dec(F.col("cg")) * dec(F.col("n_tot"))
                - dec(F.col("cc")) * dec(F.col("n_g"))
            ),
        )
        .otherwise(F.lit(0).cast("decimal(38,0)"))
        .alias("term"),
    )
    out = terms.groupBy(*quasi_cols, "n_g", "m").agg(
        F.sum("term").alias("num")
    )
    # denominator n_g * n_tot * (m - 1): one exact decimal product,
    # then the single IEEE division that defines t
    return (
        out.crossJoin(
            F.broadcast(m_tot.select(F.col("n_tot").alias("nt")))
        )
        .select(
            *quasi_cols,
            F.col("n_g").alias("n"),
            # CASE short-circuits: a single-value domain (m = 1) yields
            # NULL t instead of an ANSI zero-division error
            F.when(
                F.col("m") > 1,
                F.round(
                    F.col("num").cast("double")
                    / (
                        dec(F.col("n_g"))
                        * dec(F.col("nt"))
                        * dec(F.col("m") - 1)
                    ).cast("double")
                    * 1000000
                ).cast("long"),
            ).alias("t_e6"),
        )
        .withColumn("close", (F.col("t_e6") <= t_flag_e6).cast("int"))
    )


def dp_counts(
    df: DataFrame,
    group_cols: list[str],
    *,
    epsilon: float = 1.0,
    seed: int = 0,
    sensitivity: int = 1,
) -> DataFrame:
    """ε-differentially-private group counts via the Laplace mechanism —
    the release format of every DP analytics system (each unit changes a
    count by at most ``sensitivity``, so Laplace(sensitivity/ε) noise
    gives ε-DP).  Completes the privacy arc after k-anonymity /
    l-diversity / t-closeness.

    The noise is DETERMINISTIC given (seed, group): an md5-derived
    uniform in (−½, ½) through the Laplace inverse CDF — reproducible
    releases, no RNG state on executors, and the noise never leaves
    codegen.  Rows-only evidence (ln is not bit-portable across
    engines); tests pin determinism, integer release, and that noise
    scales with 1/ε.

    NOTE: the true counts must not be published alongside the release —
    this operator returns ONLY the noisy counts.

    Returns ``(group columns..., noisy_count, epsilon_e6)``.
    """
    true = df.groupBy(*group_cols).agg(F.count("*").alias("__n"))
    gkey = F.concat_ws(
        "\x1f", F.lit(str(seed)), *[F.col(c).cast("string") for c in group_cols]
    )
    # u in (-1/2, 1/2): 52 bits of the md5 → uniform [0,1) minus 1/2,
    # nudged off the endpoints so ln(1 - 2|u|) is finite
    u52 = F.conv(F.substring(F.md5(gkey), 1, 13), 16, 10).cast("double") / F.lit(
        float(1 << 52)
    )
    u = (u52 * F.lit(0.999998) + F.lit(0.000001)) - F.lit(0.5)
    b = F.lit(float(sensitivity) / float(epsilon))
    noise = -b * F.signum(u) * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(u))
    return true.select(
        *group_cols,
        (F.col("__n") + F.round(noise).cast("long")).alias("noisy_count"),
        F.lit(int(round(epsilon * 1e6))).cast("long").alias("epsilon_e6"),
    )


def duplicate_charges(
    df: DataFrame,
    entity_col: str,
    amount_col: str,
    ts_col: str,
    id_col: str,
    *,
    window_days: int = 7,
    scale: int = 100,
) -> DataFrame:
    """Duplicate-payment screen: pairs of SAME-entity, SAME-amount
    transactions within ``window_days`` of each other — the classic
    accounts-payable / double-charge fraud test.

    Scale shape: the self-join blocks on the exact (entity, amount-
    cents, coarse-time-bucket) key — never all-pairs per entity, and
    bounded by LOCAL temporal density even for an entity with years of
    identical-amount charges (a fixed subscription fee): the bucket is
    ``epoch_day div window_days``, one side exploded to its adjacent
    buckets, so any in-window pair meets in exactly one bucket cell and
    candidates per cell are capped by how many charges land within
    ~2·window_days of each other.  Amount equality is integer-cent
    equality; the window predicate is exact day arithmetic.

    Returns ``(entity, amount_units, id_a, id_b, days_apart)`` —
    amounts in integer ``scale`` units.
    """
    wd = max(int(window_days), 1)
    cents = F.round(F.col(amount_col).cast("double") * scale).cast("long")
    bucket = F.floor(F.unix_date(F.col(ts_col).cast("date")) / wd)
    base = df.select(
        F.col(entity_col).alias("e"),
        cents.alias("c"),
        F.col(ts_col).cast("date").alias("d"),
        F.col(id_col).alias("rid"),
        bucket.alias("bk"),
    ).where(F.col("c").isNotNull())
    # a keeps its own bucket; b explodes to {bk−1, bk, bk+1}: a pair with
    # |day_a − day_b| ≤ window_days always differs by ≤1 bucket, and for
    # a given (a, b) exactly ONE exploded value equals a.bk — no dedup
    # pass needed
    a = base.alias("a")
    b = base.withColumn(
        "bk", F.explode(F.array(F.col("bk") - 1, F.col("bk"), F.col("bk") + 1))
    ).alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.e") == F.col("b.e"))
            & (F.col("a.c") == F.col("b.c"))
            & (F.col("a.bk") == F.col("b.bk")),
        )
        .where(F.col("a.rid") < F.col("b.rid"))
        .select(
            F.col("a.e").alias(entity_col),
            F.col("a.c").alias("amount_units"),
            F.col("a.rid").alias("id_a"),
            F.col("b.rid").alias("id_b"),
            F.abs(F.datediff(F.col("b.d"), F.col("a.d")))
            .cast("long")
            .alias("days_apart"),
        )
    )
    return pairs.where(F.col("days_apart") <= window_days)


def round_number_bias(
    df: DataFrame, group_col: str, amount_col: str, *, scale: int = 100
) -> DataFrame:
    """Round-number forensic screen: is the share of whole-dollar
    amounts (cents == 00) higher than the 1% a uniform cent
    distribution implies?  (Fabricated figures cluster on round
    numbers — the Benford companion at the other end of the digits.)

        z = (x − n·p) / √(n·p·(1−p)),  p = 1/100

    Exact integer counts; z is one fixed double expression with the
    literal p.  Returns ``(group, n, n_round, share_e6, z_e6)``.
    """
    cents = F.round(F.col(amount_col).cast("double") * scale).cast("long")
    base = df.select(
        F.col(group_col).alias("g"), cents.alias("c")
    ).where(F.col("c").isNotNull())
    is_round = (F.col("c") % 100 == 0).cast("int")
    agg = base.groupBy("g").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(is_round).cast("long").alias("n_round"),
    )
    n = F.col("n")
    p = F.lit(0.01)
    z = (F.col("n_round").cast("double") - n.cast("double") * p) / F.sqrt(
        n.cast("double") * p * (F.lit(1.0) - p)
    )
    return agg.select(
        F.col("g").alias(group_col),
        "n",
        "n_round",
        F.round(
            F.col("n_round").cast("double") / n.cast("double") * 1e6
        )
        .cast("long")
        .alias("share_e6"),
        F.when(n > 0, F.round(z * 1e6).cast("long")).alias("z_e6"),
    )


def reconciliation_check(
    header: DataFrame,
    lines: DataFrame,
    key_col: str,
    header_amount_col: str,
    line_amount_col: str,
    *,
    tolerance_cents: int = 0,
    scale: int = 100,
) -> DataFrame:
    """Header↔lines amount reconciliation — the finance data-quality
    workhorse: does each order's line total tie out to the header
    amount (within a cent tolerance)?

    Exactness: both sides sum in integer cents; the discrepancy is an
    exact integer per key.  One line aggregate + one broadcast-able
    equi-join; the report aggregates mismatch counts and the worst
    absolute gap.

    Returns one row ``(n_headers, n_matched, n_mismatched, n_missing_
    lines, worst_gap_cents, total_gap_cents)``.
    """
    h = header.select(
        F.col(key_col).alias("k"),
        F.round(F.col(header_amount_col).cast("double") * scale)
        .cast("long")
        .alias("hc"),
    )
    l_agg = (
        lines.select(
            F.col(key_col).alias("k"),
            F.round(F.col(line_amount_col).cast("double") * scale)
            .cast("long")
            .alias("lc"),
        )
        .groupBy("k")
        .agg(F.sum("lc").cast("long").alias("lsum"))
    )
    j = h.join(l_agg, "k", "left").select(
        "k",
        "hc",
        "lsum",
        (F.col("hc") - F.coalesce(F.col("lsum"), F.lit(0))).alias("gap"),
    )
    missing = F.col("lsum").isNull()
    mismatched = (~missing) & (F.abs(F.col("gap")) > tolerance_cents)
    matched = (~missing) & (F.abs(F.col("gap")) <= tolerance_cents)
    return j.agg(
        F.count("*").cast("long").alias("n_headers"),
        F.sum(matched.cast("int")).cast("long").alias("n_matched"),
        F.sum(mismatched.cast("int")).cast("long").alias("n_mismatched"),
        F.sum(missing.cast("int")).cast("long").alias("n_missing_lines"),
        F.max(F.when(~missing, F.abs(F.col("gap"))))
        .cast("long")
        .alias("worst_gap_cents"),
        F.sum(F.when(~missing, F.abs(F.col("gap"))).otherwise(0))
        .cast("long")
        .alias("total_gap_cents"),
    )
