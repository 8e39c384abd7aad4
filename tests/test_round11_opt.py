"""Round-11 optimization equivalence pins: restructured operators must
produce bit-identical output to their pre-optimization composition."""

import pyspark.sql.functions as F


def _docs(spark):
    rows = []
    for i in range(40):
        # three exact-dup families + singletons, word-shingle-able text
        fam = i % 7
        if fam < 2:
            text = f"the quick brown fox jumps over lazy dog {fam}"
        elif fam < 4:
            text = (
                f"alpha beta gamma delta epsilon zeta eta theta {i} "
                f"common boilerplate tail shared by most documents here"
            )
        else:
            text = f"unique document body number {i} with its own words"
        rows.append((i, text))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_prepare_band_split_matches_one_shot(spark):
    """minhash_prepare + minhash_band_candidates (the shared-prefix path
    used by q_minhash_prod_path) must equal minhash_lsh_candidates for
    both the plain and the capped variant, with and without
    materialization."""
    from smartpy_arc_spark.operators.dedup import (
        minhash_band_candidates,
        minhash_lsh_candidates,
        minhash_prepare,
    )

    docs = _docs(spark)
    kw = dict(shingle_mode="word", shingle_size=3, collapse_exact=True)
    want_plain = sorted(
        map(tuple, minhash_lsh_candidates(docs, **kw).collect())
    )
    want_capped = sorted(
        map(
            tuple,
            minhash_lsh_candidates(docs, max_bucket_size=2, **kw).collect(),
        )
    )
    for mat in (False, True):
        sigs, star = minhash_prepare(docs, materialize=mat, **kw)
        got_plain = sorted(
            map(tuple, minhash_band_candidates(sigs, star).collect())
        )
        got_capped = sorted(
            map(
                tuple,
                minhash_band_candidates(
                    sigs, star, max_bucket_size=2
                ).collect(),
            )
        )
        assert got_plain == want_plain, f"plain mismatch (materialize={mat})"
        assert got_capped == want_capped, f"capped mismatch (materialize={mat})"
    assert len(want_capped) <= len(want_plain)


def test_logistic_fit_materialize_false_matches_default(spark):
    """materialize=False over a pre-checkpointed input (the q_logistic
    shape) must be bit-identical to the default path."""
    from smartpy_arc_spark.operators.stats import logistic_fit

    rows = [
        (i % 2 if i % 5 else 1 - i % 2, float(i % 17) - 8.0, float(i % 23))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "y int, x1 double, x2 double")
    want = sorted(map(tuple, logistic_fit(df, "y", ["x1", "x2"]).collect()))
    got = sorted(
        map(
            tuple,
            logistic_fit(
                df.localCheckpoint(eager=True),
                "y",
                ["x1", "x2"],
                materialize=False,
            ).collect(),
        )
    )
    assert got == want


def test_cosine_threshold_pairs_bounded_matches_hof(spark):
    """The vectorized mapInPandas kernel (q_embedding_near_dup) must be
    bit-identical to the staged-norm HOF broadcast-join form, including
    edge cases: mismatched lengths, zero vectors, negative cosines,
    null vectors, null elements."""
    import math
    import random

    from smartpy_arc_spark.operators.similarity import (
        _dot,
        cosine_threshold_pairs_bounded,
    )

    rng = random.Random(7)
    rows = []
    for i in range(60):
        if i == 11:
            vec = None  # null vector
        elif i == 13:
            vec = [0.0, 0.0, 0.0, 0.0]  # zero norm
        elif i == 17:
            vec = [1.0, None, 0.5, -0.25]  # null element poisons fold
        elif i % 10 == 9:
            vec = [rng.uniform(-1, 1) for _ in range(6)]  # odd length
        else:
            base = [rng.uniform(-1, 1) for _ in range(4)]
            if i % 3 == 0:
                base = [-x for x in base]  # negative-cos partners
            vec = base
        rows.append((i, vec))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    va = F.col("embedding").cast("array<double>")
    q = emb.where("vec_id < 20").select(
        F.col("vec_id").alias("id_a"), va.alias("_va"),
        _dot(va, va).alias("_na2"),
    )
    c = emb.select(
        F.col("vec_id").alias("id_b"), va.alias("_vb"),
        _dot(va, va).alias("_nb2"),
    )
    pairs = c.join(F.broadcast(q), F.col("id_b") > F.col("id_a"))
    denom = F.sqrt(F.col("_na2") * F.col("_nb2"))
    cos = F.when(denom > 0, _dot(F.col("_va"), F.col("_vb")) / denom)
    thr = -0.2  # negative threshold so negative cosines are exercised
    want = sorted(
        map(
            tuple,
            pairs.select("id_a", "id_b", cos.alias("cos"))
            .where(F.col("cos") > thr)
            .collect(),
        )
    )

    q_rows = emb.where("vec_id < 20").select(
        F.col("vec_id").alias("id_a"), va.alias("_va")
    ).collect()
    got = sorted(
        map(
            tuple,
            cosine_threshold_pairs_bounded(
                emb.select(F.col("vec_id").alias("id_a"), va.alias("_va")),
                q_rows,
                vec_col="_va",
                id_col="id_a",
                threshold=thr,
            ).collect(),
        )
    )
    assert len(want) > 0
    assert len(got) == len(want)
    for (wa, wb, wc), (ga, gb, gc) in zip(want, got):
        assert (wa, wb) == (ga, gb)
        # bit-identity, not approximate equality
        assert math.isclose(wc, gc, rel_tol=0.0, abs_tol=0.0), (wa, wb, wc, gc)


def test_partitioned_cumsum_grand_totals(spark):
    """grand_totals returns the driver-side total of each sum column —
    the count-job elimination used by theil_sen/conformal."""
    from smartpy_arc_spark.operators.scale import partitioned_cumsum

    df = spark.createDataFrame(
        [(i, 1, i % 3) for i in range(50)], "k int, one int, w int"
    )
    gt: dict = {}
    out = partitioned_cumsum(df, ["k"], ["one", "w"], grand_totals=gt)
    assert gt["one"] == 50
    assert gt["w"] == sum(i % 3 for i in range(50))
    # and the cumsum output itself is unchanged by the out-param
    top = out.orderBy(F.desc("k")).limit(1).collect()[0]
    assert top["cum_one"] == 50


def test_wilcoxon_all_zero_diffs(spark):
    """All-zero diffs: the folded single-pass form must report
    n_pairs = #rows with an EMPTY nonzero rank table (the cumsum's
    grand total is 0 and the zero group carries the whole count)."""
    from smartpy_arc_spark.operators.stats import wilcoxon_signed_rank

    rows = [(10.0, 10.0), (20.0, 20.0), (30.0, 30.0)]
    df = spark.createDataFrame(rows, "a double, b double")
    r = wilcoxon_signed_rank(df, "a", "b").collect()[0]
    assert r.n_pairs == 3
    # no nonzero diffs: rank aggregate is the empty-aggregate row
    assert r.n_nonzero is None or r.n_nonzero == 0


def test_distributed_ntile_literal_n_matches_window(spark):
    """The literal-n NTILE arithmetic (grand_totals path) must equal
    SQL NTILE over a single global ordering, including the uneven
    remainder split."""
    from pyspark.sql import Window as W

    from smartpy_arc_spark.operators.scale import distributed_ntile

    df = spark.createDataFrame([(i,) for i in range(23)], "v int")
    got = {
        r["v"]: r["bucket"]
        for r in distributed_ntile(df, ["v"], 4).collect()
    }
    want = {
        r["v"]: r["b"]
        for r in df.select(
            "v", F.ntile(4).over(W.orderBy("v")).alias("b")
        ).collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# Single-upstream-pass pins for the r11 repeated-subtree materializations
# (the theil_index test pattern: feed the operator a parquet scan; when the
# bounded intermediate is checkpointed, the FINAL plan must contain no — or
# exactly the declared number of — parquet scans).


def _orders(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/orders.parquet")


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_contingency_family_single_detail_pass(spark, sf_dir):
    """cells is materialized once: margins/totals/scored joins read the
    checkpoint, so no consumer re-executes the detail aggregate (the
    contract plans used to scan the detail 4-10x)."""
    from smartpy_arc_spark.operators.stats import (
        chi_square_independence,
        chi_square_residuals,
        cluster_agreement,
        contingency_effects,
        mutual_information,
    )
    from smartpy_arc_spark.operators.stats_tests import js_divergence

    orders = _orders(spark, sf_dir)
    for fn in (
        chi_square_independence,
        chi_square_residuals,
        contingency_effects,
        mutual_information,
        cluster_agreement,
        js_divergence,
    ):
        plan = _plan(fn(orders, "o_orderpriority", "o_orderstatus"))
        assert "Scan parquet" not in plan, fn.__name__


def test_kendall_single_detail_pass(spark, sf_dir):
    from smartpy_arc_spark.operators.stats import kendall_tau_b

    orders = _orders(spark, sf_dir).select(
        (F.col("o_orderkey") % 7).alias("x"),
        (F.col("o_custkey") % 5).alias("y"),
    )
    assert "Scan parquet" not in _plan(kendall_tau_b(orders, "x", "y"))


def test_fleiss_psi_t_closeness_single_detail_pass(spark, sf_dir):
    from smartpy_arc_spark.operators.checks import (
        population_stability_index,
        t_closeness,
    )
    from smartpy_arc_spark.operators.stats import fleiss_kappa

    orders = _orders(spark, sf_dir)
    assert "Scan parquet" not in _plan(
        fleiss_kappa(orders, "o_custkey", "o_orderstatus")
    )
    assert "Scan parquet" not in _plan(
        population_stability_index(
            orders.where("o_custkey % 2 = 0"),
            orders.where("o_custkey % 2 = 1"),
            "o_totalprice",
            lo=0.0,
            hi=500000.0,
            n_buckets=10,
        )
    )
    assert "Scan parquet" not in _plan(
        t_closeness(orders, ["o_orderpriority"], "o_orderstatus")
    )


def test_graph_ops_single_edge_pass(spark, sf_dir):
    """The canonical edge table is checkpointed, so the caller's edge
    pipeline appears zero times in the final plan (link_predict's
    contract plan used to scan lineitem 26x)."""
    from smartpy_arc_spark.operators.components import (
        assortativity,
        clustering_coefficient,
        link_predict,
        triangle_count,
    )

    orders = _orders(spark, sf_dir)
    edges = orders.select(
        (F.col("o_orderkey") % 13).alias("src"),
        (F.col("o_custkey") % 13).alias("dst"),
    )
    for out in (
        link_predict(edges, top_k=10),
        clustering_coefficient(edges),
        triangle_count(edges),
        assortativity(edges, src_col="src", dst_col="dst"),
    ):
        assert "Scan parquet" not in _plan(out)


def test_itemsets_single_detail_pass(spark, sf_dir):
    from smartpy_arc_spark.operators.itemsets import (
        association_rules,
        frequent_pairs,
        frequent_triples,
        item_similarity,
    )

    orders = _orders(spark, sf_dir).select(
        (F.col("o_custkey") % 50).alias("b"),
        (F.col("o_orderkey") % 11).alias("i"),
    )
    for out in (
        frequent_pairs(orders, basket_col="b", item_col="i"),
        association_rules(orders, basket_col="b", item_col="i"),
        frequent_triples(orders, "b", "i", min_support=2),
        item_similarity(orders, basket_col="b", item_col="i"),
    ):
        assert "Scan parquet" not in _plan(out)


def test_dsir_single_pass_per_corpus(spark, sf_dir):
    """With both bucket models checkpointed, the only remaining parquet
    scan is the scoring pass over raw (it used to run each corpus
    explode 3x)."""
    from smartpy_arc_spark.operators.importance import dsir_importance_weights

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(
        dsir_importance_weights(docs, docs.where("lang = 'en'"), m=64)
    )
    assert plan.count("Scan parquet") == 1


def test_curate_corpus_stage_materialization(spark, sf_dir):
    """Each funnel stage reads the previous stage's checkpoint: the only
    parquet scan left in the final plan is the BENCHMARK side of the
    decontamination join (the corpus used to be scanned 9x)."""
    from smartpy_arc_spark.operators.pipeline import curate_corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.where("doc_id % 17 = 0").select("doc_id", "text")
    plan = _plan(curate_corpus(docs, bench))
    # exactly one parquet scan — the benchmark side (ADVICE r11: pin the
    # stable marker only; raw plan-string fragments like expression ids
    # break on Spark formatting changes)
    assert plan.count("Scan parquet") == 1


def test_source_similarity_single_tokenize_pass(spark, sf_dir):
    from smartpy_arc_spark.operators.text import source_similarity

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert "Scan parquet" not in _plan(source_similarity(docs))


def test_peak_concurrency_single_pass_values(spark):
    """The one-pass (group-max window) form must reproduce the sweep-line
    semantics exactly, including the end-before-start tie at one instant
    and the EARLIEST peak timestamp when the peak recurs."""
    from smartpy_arc_spark.operators.sessionize import peak_concurrency

    rows = [
        # g=1: [0,10) [5,15) [10,20) — at t=10 one ends as one starts:
        # peak 2, first reached at t=5; peak recurs at t=10
        (1, 0, 10), (1, 5, 15), (1, 10, 20),
        # g=2: nested intervals, peak 3 at t=4
        (2, 0, 100), (2, 2, 50), (2, 4, 30),
        # g=3: disjoint, peak 1 at t=0
        (3, 0, 1), (3, 5, 6),
    ]
    df = spark.createDataFrame(rows, "g int, s long, e long")
    got = {
        r["g"]: (r["n_intervals"], r["peak_concurrency"], r["peak_at"])
        for r in peak_concurrency(df, "s", "e", group_col="g").collect()
    }
    assert got == {1: (3, 2, 5), 2: (3, 3, 4), 3: (2, 1, 0)}
    plan = _plan(peak_concurrency(df, "s", "e", group_col="g"))
    assert "Join" not in plan  # the old stats-join-back shape is gone
