"""Physical-plan audit: every declared query's executed plan is swept for
scale traps.  This is the regression fence for 100 TB-readiness — a future
edit that sneaks a cartesian product, an unexpected single-partition
exchange, or an unfenced nested-loop join into a query fails here, at
sf0.001, before any driver round runs it at scale.
"""

import importlib.util
import os
import sys

import pytest

_ENTRY = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "__spark_entry__.py")
spec = importlib.util.spec_from_file_location("_entry_for_plans", _ENTRY)
entry = importlib.util.module_from_spec(spec)
spec.loader.exec_module(entry)

# Global scalar aggregations legitimately end in one final combine over
# map-side partial aggregates (a handful of rows cross the wire).
SINGLE_PARTITION_OK = {
    "row_count",            # count(*)
    "triangle_count",       # global count(*) over closed paths
    "q6_forecast_revenue",  # global sum
    "q14_promo_revenue",    # global ratio
    "q11_important_parts",  # scalar cutoff: global sum over grouped partials
    "dsir_weights",         # corpus-total scalars: global sums over m-row bucket tables
    "perplexity_buckets",   # LM-total scalar + global percentile cut points
    "mixture_allocation",   # 1-row normalizer scalar over per-source sizes
    "bm25_search",          # corpus stats scalar (N, avgdl) + global top-k
    "chi_square",           # 1-row statistic: margins + total scalars
    "welch_t",              # 1-row statistic: 2-cohort combine
    "q15_top_supplier",     # scalar max subquery
    "q17_small_qty_revenue",  # global sum
    "q19_disjunctive_filter",  # global sum
    "q22_dormant_customers",   # scalar avg subquery
    "tfidf_top_terms",      # broadcast corpus-size scalar
    "theta_segment_overlap",  # global sketch merge: KB-sized partials
    "approx_topk_terms",      # global frequency sketch: bounded state
    "geometric_median",       # per-round (dim+1)-row -> 1-row sort_array
                              #   collect_list combines (r7 chained plan;
                              #   the loop used to run eagerly so fences
                              #   never saw it)
    "croston",                # 1-row global calendar min/max bounds
    "ams_f2",                 # 1-row sketch counters + 1-row exact combine
    "rmst",                   # 1-row statistic over the bounded KM curve
    "time_to_convert",        # 1-row order-statistic over converted users
    "brier_decomposition",    # 1-row statistic: bounded-bin combine
    "effect_sizes",           # 1-row statistic: 2-cohort + U combine
    "pairwise_diffs",         # bounded k-group moment table combine
    "uplift_deciles",         # global decile ntile over pre-aggregated units
    "srm_check",              # 1-row assignment-count statistic
    "source_ablation",        # 1-row corpus-total combine
    "lorenz_curve",           # global decile ntile over pre-aggregated units
                              #   (documented exactness choice; equi_depth_hist
                              #   is the cutpoint-broadcast scale variant)
    "t_closeness",            # 1-row (m, n_total) domain-stats combine
    "funnel_conversion",      # global funnel totals: 3 counters
    "sequence_funnel",        # global funnel totals: one counter per step
    "price_histogram",        # share-of-total window over 13 bucket counts
    "mann_whitney",           # 1-row statistic: global rank-sum combine
    "kruskal_wallis",         # 1-row statistic: bounded k-group term combine
    "levene_bf",              # 1-row statistic: bounded k-group term combine
    "runs_test",              # 1-row statistic: run counts over the
                              #   calendar-bounded daily grid
    "durbin_watson",          # 1-row statistic: residual lag pass over the
                              #   calendar-bounded daily grid
    "wilcoxon",               # 1-row statistic: global signed-rank combine
    "changepoint",            # prefix pass over the calendar-bounded daily
                              #   grid, 1-row argmax output
    "grubbs",                 # 1-row argmax over the calendar-bounded daily
                              #   grid
    "kfold_ols",              # 1-row totals combine over k fold-moment rows
    "abc_xyz",                # 1-row grand-total scalar for the share cuts
                              #   (the abc_classification shape)
    "sketch_eval",            # 1-row exact vs 1-row sketch combine
    "eb_shrinkage",           # 1-row prior-moment combine
    "mediation",              # 1-row centering + path-moment combines
    "ks_test",                # 1-row statistic: D over distinct-value CDF
    "ols_regression",         # 1-row normal-equation sums
    "ridge",                  # 1-row regularized normal-equation sums
    "corr_matrix",            # 1-row all-pairs moment combine
    "friedman",               # 1-row statistic: bounded k-treatment combine
    "wasserstein",            # segment walk over the distinct-value CDF
                              #   (the ks_test distinct-value contract)
    "js_divergence",          # 1-row corpus-total scalar for q
    "equi_depth_hist",        # one cutpoint aggregate + <=n_buckets-row share window
    "quantile_norm",          # 1-row total-n scalar for the rank grid
    "mom_change",             # lag window over calendar-bounded month rows
    "bollinger",              # moment window over calendar-bounded day rows
                              #   (the mom_change shape: input pre-aggregated
                              #   to one row per day)
    "target_encode",          # 1-row global-mean prior scalar
    "psi_drift",              # 1-row totals + scalar PSI combine
    "skew_report",            # 2-scalar totals combine over key counts
    "neyman_allocation",      # 1-row weight-sum scalar combine
    "benford",                # 1-row digit-total scalar combine
    "gini",                   # 1-row statistic: n/sum/rank-sum combine
    "spearman",               # 1-row statistic: rank-moment combine
    "anova",                  # 1-row statistic: bounded per-group moment combine
    "proportion_ztest",       # 1-row statistic: 2-cohort count combine
    "rfm_segments",           # 1-row anchor/total scalars for the ntile rule
    "kendall",                # 1-row statistic: pair-count/tie combine
    "profile",                # 1-row wide profile combine (k-column table stats)
    "theil_sen",              # 1-row statistic: median-selection scalars
    "abc_classification",     # 1-row grand-total scalar for the class cuts
    "kaplan_meier",           # bounded-curve assembly (distinct-times contract)
    "cumulative_incidence",   # bounded-curve assembly (distinct-times contract)
    "shapley_coverage",       # 1-row 7-coalition-value combine
    "trend_test",             # 1-row statistic: weighted-moment combine
    "mcnemar",                # 1-row statistic: discordant-cell combine
    "assortativity",          # 1-row statistic: edge-end moment combine
    "heaps_law",              # 1-row checkpoint-vocabulary combine
    "class_balance",          # 1-row min-class-size scalar combine
    "woe_iv",                 # global decile ntile over pre-aggregated units
                              #   (the lorenz_curve shape) + 1-row G/B totals
    "mutual_information",     # 1-row statistic: total + per-cell term combine
    "markov_entropy",         # 1-row statistic: transition-cell term combine
    "fleiss_kappa",           # 1-row agreement-moment combine (modal-n scalar)
    "chi_square_residuals",   # bounded-cell margins + 1-row total scalar
    "feature_mi_ranking",     # 1-row-per-feature MI combines (3 features)
    "simpson_check",          # 1-row stratum-sign combine
    "mantel_haenszel",        # 1-row stratified-term combine
    "contingency_effects",    # 1-row statistic: cell-term combine
    "cluster_agreement",      # 1-row purity/MI/entropy combines
    "theil_index",            # 1-row total/between/within term combines
    "reconciliation",         # 1-row tie-out report combine
    "ljung_box",              # lag windows over the calendar-bounded daily
                              #   grid, 1-row statistic
    "conformal",              # 1-row q-hat / count scalars
    "table_fingerprint",      # 1-row checksum combine (map-side partials)
    "log_rank",               # 1-row statistic: O/E/V term combine
    "ece",                    # 1-row statistic over <=n_bins bin rows
    "auc",                    # 1-row statistic: rank-sum combine (MW shape)
    "classification_metrics", # 1-row confusion/Brier combine
    "cohens_kappa",           # 1-row agreement statistic combine
    "lift_table",             # 1-row row-count scalar for the ntile rule
    "profile_approx",         # 1-row wide profile combine (HLL sketches per column)
    "isotonic",               # prefix-sum window over the <=k-bin table (k bounded by contract)
    "cox_score",              # suffix-sum window over distinct event times (time-resolution bounded)
    "seasonal_decompose",     # centered-MA window over calendar-bounded month rows (mom_change shape)
    "cuped",                  # 1-row pooled-moment combine broadcast to bounded groups
    "textrank",               # pagerank dangling-mass scalar combine per iteration
    "rolling_corr",           # trailing window over the calendar-bounded day grid (mom_change shape)
    "diff_in_diff",           # 1-row four-cell moment combine
    "dedup_eval",             # 1-row precision/recall statistic combine
    "session_stats",          # 1-row engagement rollup combine (map-side partials)
    "decision_stump",         # prefix-sum window + argmin over the <=n_bins histogram (bounded by contract)
    "fd_discovery",           # 1-row-per-candidate-pair rollup combine (pairs list bounded)
    "rrf_fusion",             # rank window + fused top-k over pre-truncated top-50 lists
    "kmeans",                 # k-row centroid seeding (ordered limit) + k-cluster result assembly
    "decision_tree",          # prefix windows + argmin over the <=n_bins 2-D histogram (bounded by contract)
    "ar_model",               # lag windows over the calendar-bounded day grid (mom_change shape)
    "nelson_aalen",           # bounded-curve prefix sums (kaplan_meier contract: distinct observed times)
}

# BroadcastNestedLoopJoin is acceptable ONLY where the broadcast side is
# bounded by construction (scalar subqueries, fenced candidate tiers,
# broadcast dims under non-equi conditions) — each documented in place.
BNLJ_OK = {
    "geometric_median",       # 1-row estimate-array broadcast cross join
                              #   per Weiszfeld round (r7 chained plan)
    "dsir_weights",           # 1-row corpus-total broadcast cross joins
    "kruskal_wallis",         # 1-row tie-term broadcast cross join
    "runs_test",              # 1-row median broadcast cross join
    "durbin_watson",          # 1-row OLS-fit broadcast cross join
    "wasserstein",            # 1-row cohort-totals broadcast cross join
    "changepoint",            # 1-row totals broadcast cross join
    "grubbs",                 # 1-row moments broadcast cross join
    "ljung_box",              # 1-row shift broadcast cross join
    "kfold_ols",              # 1-row totals broadcast cross join
    "abc_xyz",                # 1-row grand-total broadcast cross join
    "sketch_eval",            # 1-row x 1-row exact/sketch cross join
    "eb_shrinkage",           # 1-row prior broadcast cross join
    "mediation",              # 1-row shift broadcast cross join
    "class_balance",          # 1-row min-size broadcast cross join
    "woe_iv",                 # 1-row totals broadcast cross join
    "heaps_law",              # 1-row token-total broadcast cross join
    "markov_entropy",         # 1-row totals broadcast cross join
    "fleiss_kappa",           # 1-row modal-n / totals broadcast cross joins
    "chi_square_residuals",   # 1-row total broadcast cross join
    "contingency_effects",    # 1-row total broadcast cross join
    "cluster_agreement",      # 1-row total/term broadcast cross joins
    "theil_index",            # 1-row totals broadcast cross joins
    "feature_mi_ranking",     # 1-row total broadcast cross joins
    "knn_classify",           # bounded-test-side broadcast inequality join
                              #   (by contract: window the scoring set at scale)
    "js_divergence",          # bounded category-domain / 1-row total
                              #   broadcast cross joins
    "semdedup",               # k-row seed-centroid broadcast cross join (k bounded)
    "perplexity_buckets",     # 1-row LM-total / cut-point broadcast cross joins
    "mixture_allocation",     # 1-row normalizer broadcast cross join
    "bm25_search",            # 1-row corpus-stats broadcast cross join
    "chi_square",             # 1-row total broadcast cross join
    "welch_t",                # 1-row x 1-row cohort cross join
    "q11_important_parts",    # 1-row scalar cutoff broadcast cross join
    "q22_dormant_customers",  # scalar avg broadcast
    "knn_cosine",             # bounded query side broadcast
    "ivf_ann",                # bounded centroid set
    "embedding_near_dup",     # bounded query side, threshold condition
    "edit_distance_pairs",    # fenced candidate tier (doc_id bound)
    "range_bucket_join",      # broadcast bucket dim, non-equi containment
    "tfidf_top_terms",        # scalar N broadcast
    "ks_test",                # 1-row totals broadcast cross join
    "equi_depth_hist",        # 1-row cutpoint-array broadcast cross join
    "quantile_norm",          # grid-rank interval join (1001-row broadcast)
    "target_encode",          # 1-row prior broadcast cross join
    "psi_drift",              # 1-row totals / scalar broadcast cross joins
    "skew_report",            # 1-row totals broadcast cross join
    "neyman_allocation",      # 1-row weight-sum broadcast cross join
    "benford",                # 1-row digit-total broadcast cross join
    "proportion_ztest",       # 1-row x 1-row cohort cross join
    "rfm_segments",           # 1-row as-of anchor + row-count broadcast cross joins
    "kendall",                # bounded grid-axis cross join + 1-row tie scalars
    "theil_sen",              # 1-row count/slope/intercept broadcast cross joins
    "abc_classification",     # 1-row grand-total broadcast cross join
    "mutual_information",     # 1-row total broadcast cross join (chi_square shape)
    "conformal",              # 1-row q-hat broadcast cross join
    "negative_samples",       # bounded candidate-pool broadcast cross join
    "log_rank",               # 1-row cohort-total broadcast cross join
    "lift_table",             # 1-row row-count broadcast cross join (ntile)
    "cohens_kappa",           # 1-row chance-agreement broadcast cross join
    "isotonic",               # k-row bin-table interval joins (i<=j over bounded bins)
    "cox_score",              # 1-row totals broadcast cross join
    "cuped",                  # 1-row pooled-moment broadcast cross join
    "nb_langid",              # bounded label-dim broadcast cross join (docs x languages)
    "dtw_types",              # bounded key-grid pair join (series comparison is quadratic in KEYS by contract)
    "diff_in_diff",           # 1-row cell-moment broadcast cross join
    "rrf_fusion",             # bm25 corpus-stats scalar + bounded 1-query knn broadcast
    "kmeans",                 # k-row centroid broadcast cross join per Lloyd iteration
    "decision_tree",          # 1-row root-split broadcast cross join
    "ar_model",               # 1-row mean scalar broadcast cross join
    "croston",                # 1-row calendar-bounds broadcast cross join
    "xcorr_leadlag",          # 15-row lag-table broadcast cross join
    "smd_balance",            # 1-row x 1-row group-moment cross join
    "ams_f2",                 # 1-row exact-F2 broadcast cross join
    "t_closeness",            # bounded sensitive-domain + 1-row stats broadcasts
    "brier_decomposition",    # 1-row totals broadcast cross join
    "effect_sizes",           # 1-row x 1-row cohort/U cross joins
    "pairwise_diffs",         # bounded k-row group-pair cross joins
    "rbo",                    # bounded top-k x depth-literal cross join
    "source_ablation",        # 1-row corpus-total broadcast cross join
}

_STREAMING = {n for n in entry.queries() if n.startswith("stream")}
_BATCH = [n for n in entry.queries() if n not in _STREAMING]


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    out = {}
    for name in _BATCH:
        df = entry.queries()[name](spark, sf_dir)
        out[name] = df._jdf.queryExecution().executedPlan().toString()
    return out


def test_no_cartesian_products(plans):
    offenders = [n for n, p in plans.items() if "CartesianProduct" in p]
    assert offenders == []


def test_single_partition_exchanges_only_for_global_aggregates(plans):
    offenders = [
        n for n, p in plans.items()
        if "Exchange SinglePartition" in p and n not in SINGLE_PARTITION_OK
    ]
    assert offenders == []


def test_nested_loop_joins_only_where_fenced(plans):
    offenders = [
        n for n, p in plans.items()
        if "BroadcastNestedLoopJoin" in p and n not in BNLJ_OK
    ]
    assert offenders == []


def test_parquet_filters_pushed_on_filtered_scans(plans):
    # spot contract: the classic filtered scan keeps its pushed filters
    assert "PushedFilters: [" in plans["scan_project_filter"]


def test_zorder_write_prunes_both_dimensions(spark, tmp_path):
    """Evidence for the 100 TB claim: after write_zordered, each parquet
    file's footer min/max covers a small rectangle, so a selective
    predicate on the SECOND dimension skips most files — while a linear
    sort on x leaves y unclustered and every file overlaps."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from smartpy_arc_spark.operators.scale import write_zordered

    df = spark.range(4096).select(
        ((F.col("id") * 7919) % 256).alias("x"),
        ((F.col("id") * 104729) % 256).alias("y"),
    )
    zdir, ldir = str(tmp_path / "z"), str(tmp_path / "linear")
    write_zordered(df, zdir, ["x", "y"], bits=8, n_files=16)
    (df.repartitionByRange(16, "x").sortWithinPartitions("x")
       .write.mode("overwrite").parquet(ldir))

    def overlapping_files(path, lo, hi):
        import glob
        n_files = n_hit = 0
        for f in glob.glob(f"{path}/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            ymin = min(md.row_group(i).column(1).statistics.min
                       for i in range(md.num_row_groups))
            ymax = max(md.row_group(i).column(1).statistics.max
                       for i in range(md.num_row_groups))
            n_files += 1
            if ymax >= lo and ymin <= hi:
                n_hit += 1
        return n_hit, n_files

    z_hit, z_total = overlapping_files(zdir, 0, 31)      # y in lowest 1/8
    l_hit, l_total = overlapping_files(ldir, 0, 31)
    assert z_total >= 8 and l_total >= 8
    assert l_hit == l_total            # linear-by-x: no pruning on y
    assert z_hit <= z_total // 2       # z-order: most files skipped


def test_aqe_splits_skewed_join_partitions(spark):
    """Scale evidence: with a pathologically hot key, AQE's skew-join
    rewrite splits the oversized partition (skew=true in the executed
    plan) instead of letting one task own the whole key."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # 200k rows on ONE key + a sprinkle of others; dim side small but
        # not broadcastable (threshold disabled above)
        big = spark.range(200_000).select(
            F.when(F.col("id") % 20 == 0, F.col("id") % 97)
            .otherwise(F.lit(1)).alias("k"),
            F.col("id").alias("payload"),
        )
        dim = spark.range(100).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("attr")
        )
        joined = big.join(dim, "k")
        # execute THIS DataFrame's own queryExecution (count() would build
        # a different plan instance and leave this one isFinalPlan=false)
        assert len(joined.collect()) == 200_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
