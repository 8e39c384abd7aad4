"""Unit tests for the round-3 training-data operators: DSIR importance
weights, duplicate-span detection, SemDeDup, bloom-prefilter join."""

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- DSIR

def test_dsir_prefers_target_like_docs(spark):
    from smartpy_arc_spark.operators.importance import dsir_importance_weights

    target = spark.createDataFrame(
        [(100 + i, "the quick brown fox jumps over the lazy dog") for i in range(4)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "quick brown fox and the lazy dog again"),
            (3, "zzz qqq www eee rrr ttt yyy uuu iii ooo"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["weight"]
        for r in dsir_importance_weights(raw, target, m=256).collect()
    }
    # exact target match outranks partial overlap outranks disjoint junk
    assert out[1] > out[2] > out[3]


def test_dsir_top_k_cut_is_deterministic(spark):
    from smartpy_arc_spark.operators.importance import dsir_importance_weights

    raw = spark.createDataFrame(
        [(i, "same text every row") for i in range(10)],
        "doc_id long, text string",
    )
    out = dsir_importance_weights(raw, raw, m=64, top_k=3).collect()
    # identical weights -> tie broken by doc_id ascending
    assert sorted(r["doc_id"] for r in out) == [0, 1, 2]


# ------------------------------------------------- duplicate spans

def test_duplicate_spans_exact_boundaries(spark):
    from smartpy_arc_spark.operators.spans import duplicate_spans

    shared = " ".join(f"w{i}" for i in range(10))  # 10 shared tokens
    docs = spark.createDataFrame(
        [
            (1, "a b c " + shared + " x y z"),
            (2, shared + " p q"),
            (3, "totally unrelated words that never repeat anywhere at all"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in duplicate_spans(docs, n=8, min_docs=2).collect()
    }
    # doc 1: shared block occupies tokens 4..13
    assert (rows[1]["span_start"], rows[1]["span_end"]) == (4, 13)
    # doc 2: tokens 1..10
    assert (rows[2]["span_start"], rows[2]["span_end"]) == (1, 10)
    assert rows[1]["span_tokens"] == 10
    assert 3 not in rows


def test_duplicate_spans_merges_overlapping_windows(spark):
    from smartpy_arc_spark.operators.spans import duplicate_spans

    # 12 shared tokens -> five overlapping 8-gram windows -> ONE span
    shared = " ".join(f"s{i}" for i in range(12))
    docs = spark.createDataFrame(
        [(1, shared), (2, "pad " + shared)],
        "doc_id long, text string",
    )
    out = duplicate_spans(docs, n=8, min_docs=2).collect()
    per_doc = {}
    for r in out:
        per_doc.setdefault(r["doc_id"], []).append(r)
    assert all(len(v) == 1 for v in per_doc.values())
    assert per_doc[1][0]["span_tokens"] == 12


def test_duplicate_spans_rejects_small_n(spark):
    from smartpy_arc_spark.operators.spans import duplicate_spans

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        duplicate_spans(docs, n=1)


# ------------------------------------------------------- SemDeDup

def test_semdedup_marks_exact_and_near_duplicates(spark):
    from smartpy_arc_spark.operators.semdedup import semdedup

    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0]),
        (2, [1.0, 0.0, 0.0]),       # exact dup of 0
        (3, [0.99, 0.14, 0.0]),     # near dup of 0 (cos ~ 0.99)
        (4, [0.0, -1.0, 0.0]),      # anti-parallel to 1: not a dup
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in semdedup(df, k=2, threshold=0.95).collect()}
    assert not out[0]["is_dup"]
    assert out[2]["is_dup"] and out[2]["dup_of"] == 0
    assert out[3]["is_dup"] and out[3]["dup_of"] == 0
    assert not out[1]["is_dup"]
    assert not out[4]["is_dup"] and out[4]["dup_of"] is None


def test_semdedup_cluster_assignment_is_nearest_seed(spark):
    from smartpy_arc_spark.operators.semdedup import assign_clusters

    rows = [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (2, [0.9, 0.1]),   # nearer seed 0
        (3, [0.1, 0.9]),   # nearer seed 1
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r["vec_id"]: r["cluster"]
        for r in assign_clusters(df, k=2).collect()
    }
    assert out[2] == 0 and out[3] == 1
    # seeds belong to their own cluster
    assert out[0] == 0 and out[1] == 1


# --------------------------------------------- bloom prefilter join

def test_bloom_join_equals_plain_join(spark, sf_dir):
    from smartpy_arc_spark.operators.scale import bloom_prefilter_join

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    dim = orders.where("o_orderpriority = '1-URGENT'").select("o_orderkey")
    got = bloom_prefilter_join(
        li, dim, fact_key="l_orderkey", dim_key="o_orderkey"
    )
    want = li.join(dim, li["l_orderkey"] == dim["o_orderkey"])
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0


def test_bloom_join_left_semi_and_bad_how(spark):
    from smartpy_arc_spark.operators.scale import bloom_prefilter_join

    fact = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    dim = spark.createDataFrame([(2,), (3,)], "dk long")
    out = bloom_prefilter_join(
        fact, dim, fact_key="k", dim_key="dk", how="left_semi"
    )
    assert sorted(r["k"] for r in out.collect()) == [2, 3]
    assert out.columns == ["k", "v"]
    with pytest.raises(ValueError):
        bloom_prefilter_join(fact, dim, fact_key="k", dim_key="dk", how="left")


def test_bloom_filter_actually_filters(spark):
    """The bitset probe must reject (almost all) non-member keys before the
    join — build from a tiny dim, probe a disjoint fact, expect the
    pre-filter to keep ~0 rows (false-positive rate, not 100%)."""
    from smartpy_arc_spark.operators.scale import bloom_prefilter_join

    dim = spark.createDataFrame([(i,) for i in range(10)], "dk long")
    fact = spark.createDataFrame(
        [(i, 1.0) for i in range(10_000, 20_000)], "k long, v double"
    )
    out = bloom_prefilter_join(fact, dim, fact_key="k", dim_key="dk")
    assert out.count() == 0


# ------------------------------------------- CCNet perplexity buckets

def test_perplexity_ranks_reference_like_docs_lower(spark):
    from smartpy_arc_spark.operators.perplexity import perplexity_buckets

    ref = spark.createDataFrame(
        [(100 + i, "the cat sat on the mat and the dog sat too") for i in range(3)],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),        # reference-like
            (2, "the dog sat on the cat mat"),    # reference-like
            (3, "xqz jvw pff bbq zzz kkk qqq"),   # alien trigrams
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in perplexity_buckets(corpus, ref).collect()}
    assert out[1]["cross_entropy"] < out[3]["cross_entropy"]
    assert out[3]["bucket"] == "tail"
    assert out[1]["bucket"] == "head"


def test_perplexity_short_doc_yields_no_trigram_rows(spark):
    from smartpy_arc_spark.operators.perplexity import perplexity_buckets

    corpus = spark.createDataFrame(
        [(1, "ab"), (2, "abcdef")], "doc_id long, text string"
    )
    ref = spark.createDataFrame([(9, "abcdef")], "doc_id long, text string")
    out = perplexity_buckets(corpus, ref).collect()
    # doc 1 has no trigrams -> no row (inner-agg over exploded trigrams)
    assert sorted(r["doc_id"] for r in out) == [2]


# ---------------------------------------------------- per-group cap

def test_cap_per_group_keeps_top_by_order(spark):
    from smartpy_arc_spark.operators.sample import cap_per_group
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, "a" if i < 5 else "b", i * 10) for i in range(8)],
        "doc_id long, source string, n_chars long",
    )
    out = cap_per_group(
        df, "source", cap=2, order_by=[F.desc("n_chars")], id_col="doc_id"
    ).collect()
    kept = {r["source"]: sorted(r2["doc_id"] for r2 in out if r2["source"] == r["source"]) for r in out}
    assert kept["a"] == [3, 4]   # two largest n_chars in group a
    assert kept["b"] == [6, 7]


def test_cap_per_group_deterministic_on_ties(spark):
    from smartpy_arc_spark.operators.sample import cap_per_group

    df = spark.createDataFrame(
        [(i, "s", 100) for i in range(6)],
        "doc_id long, source string, n_chars long",
    )
    out = cap_per_group(df, "source", cap=3).collect()
    # all n_chars tie -> id tiebreak keeps lowest ids
    assert sorted(r["doc_id"] for r in out) == [0, 1, 2]


# ------------------------------------------ plan-shape evidence (scale)

def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_dsir_scoring_join_is_broadcast_single_corpus_shuffle(spark, sf_dir):
    """The corpus is exploded and scored via a BROADCAST weight lookup;
    the only hashpartitioning of corpus-derived rows is the final
    groupBy(doc_id) — no intermediate (doc, bucket) shuffle."""
    from smartpy_arc_spark.operators.importance import dsir_importance_weights

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(dsir_importance_weights(docs, docs.where("lang = 'en'"), m=256))
    assert "BroadcastHashJoin" in plan
    assert plan.count("hashpartitioning(doc_id") == 1


def test_perplexity_lm_is_broadcast(spark, sf_dir):
    from smartpy_arc_spark.operators.perplexity import perplexity_buckets

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # materialize=False exposes the full lineage in one explain (the
    # default eagerly checkpoints the LM and per-doc scores, so the
    # final plan only shows the post-checkpoint tail)
    plan = _plan(
        perplexity_buckets(docs, docs.where("lang = 'en'"), materialize=False)
    )
    # trigram LM lookup must be a broadcast hash join, never a shuffle of
    # the exploded corpus against the LM
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # the default (materialized) path must read checkpointed rows — the
    # r11 single-pass property: LM and per-doc scores computed once
    default_plan = _plan(perplexity_buckets(docs, docs.where("lang = 'en'")))
    assert "Scan ExistingRDD" in default_plan


def test_bloom_probe_filters_before_join(spark, sf_dir):
    """The bitset membership test must appear as a Filter on the fact scan
    (pre-shuffle), and the join itself must not be nested-loop."""
    from smartpy_arc_spark.operators.scale import bloom_prefilter_join

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice"
    )
    dim = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .where("o_orderpriority = '1-URGENT'")
        .select("o_orderkey")
    )
    plan = _plan(
        bloom_prefilter_join(li, dim, fact_key="l_orderkey", dim_key="o_orderkey")
    )
    assert "element_at" in plan          # the probe expression, in codegen
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_duplicate_spans_grams_travel_as_int64(spark, sf_dir):
    """Shuffle width evidence: after explode, gram STRINGS must not cross
    the wire — the plan's exchanges carry only the 64-bit hash."""
    from smartpy_arc_spark.operators.spans import duplicate_spans

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(duplicate_spans(docs, n=8))
    assert "xxhash64" in plan
    assert "gram_h" in plan and "gram#" not in plan


# -------------------------------------------------- BPE merge learning

def test_bpe_learns_reference_merges(spark):
    """Sennrich et al.'s worked example: {low:5, lower:2, newest:6,
    widest:3} learns es, est, lo, low as the first four merges."""
    from smartpy_arc_spark.operators.bpe import learn_bpe_merges

    text = " ".join(
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    merges = learn_bpe_merges(df, n_merges=4)
    assert merges == [
        (1, "e", "s", 9),
        (2, "es", "t", 9),
        (3, "l", "o", 7),
        (4, "lo", "w", 7),
    ]


def test_bpe_merge_fold_is_leftmost_greedy(spark):
    from smartpy_arc_spark.operators.bpe import _merge_pair
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(["a", "a", "a"],)], "syms array<string>")
    out = df.select(_merge_pair(F.col("syms"), "a", "a").alias("m")).collect()
    assert out[0]["m"] == ["aa", "a"]


def test_bpe_stops_when_no_pair_repeats(spark):
    from smartpy_arc_spark.operators.bpe import learn_bpe_merges

    df = spark.createDataFrame([(1, "ab cd ef")], "doc_id long, text string")
    merges = learn_bpe_merges(df, n_merges=10)
    assert merges == []   # every pair occurs once -> below min count 2


# ---------------------------------------------- mixture allocation

def test_mixture_allocation_temperature_and_cap(spark):
    from smartpy_arc_spark.operators.sample import mixture_allocation

    df = spark.createDataFrame(
        [("a", 100), ("b", 400)], "source string, n long"
    )
    out = {
        r["source"]: r
        for r in mixture_allocation(
            df, "source", "n", budget=30, alpha=0.5
        ).collect()
    }
    # sqrt sizes 10, 20 -> weights 1/3, 2/3; allocs 10, 20; no cap hit
    assert out["a"]["weight"] == pytest.approx(1 / 3, abs=1e-6)
    assert out["a"]["alloc_tokens"] == 10 and out["b"]["alloc_tokens"] == 20
    assert out["a"]["epochs"] == pytest.approx(0.1)
    # huge budget -> every source capped at one epoch
    capped = {
        r["source"]: r["alloc_tokens"]
        for r in mixture_allocation(
            df, "source", "n", budget=10**9, alpha=0.5
        ).collect()
    }
    assert capped == {"a": 100, "b": 400}


def test_remove_duplicate_spans_cuts_exact_tokens(spark):
    from smartpy_arc_spark.operators.spans import remove_duplicate_spans

    shared = " ".join(f"w{i}" for i in range(10))
    docs = spark.createDataFrame(
        [
            (1, "a b c " + shared + " x y z"),
            (2, shared),                       # fully covered -> empty
            (3, "independent text with no repeats at all whatsoever here"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in remove_duplicate_spans(docs, n=8).collect()}
    assert out[1]["clean_text"] == "a b c x y z"
    assert out[1]["n_removed"] == 10
    assert out[2]["clean_text"] == "" and out[2]["n_removed"] == 10
    assert out[3]["clean_text"].startswith("independent") and out[3]["n_removed"] == 0


def test_partition_prune_scan_touches_one_partition(spark, sf_dir):
    import importlib.util, os
    entry_path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__spark_entry__.py")
    spec = importlib.util.spec_from_file_location("_entry_prune", entry_path)
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)

    df = entry.queries()["partition_prune"](spark, sf_dir)
    plan = _plan(df)
    assert "PartitionFilters: [" in plan
    # the predicate must be a partition filter, not a data filter
    assert "l_returnflag" in plan.split("PartitionFilters")[1][:200]


def test_bucketed_join_plans_zero_exchanges(spark, sf_dir):
    import importlib.util, os
    entry_path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__spark_entry__.py")
    spec = importlib.util.spec_from_file_location("_entry_bucket", entry_path)
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)

    df = entry.queries()["bucketed_join"](spark, sf_dir)
    plan = _plan(df)
    join_part = plan.split("HashAggregate")[-1]  # below the final agg
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan


# ------------------------------------------------- UDTF escape hatch

def test_udtf_equals_builtin_top_tokens(spark):
    """The UDTF surface (lateral-joinable Python fan-out) must agree with
    the pure-builtin plan for the same semantics — the test that keeps
    the escape hatch honest."""
    from smartpy_arc_spark.functions.tablefunc import register_udtfs

    register_udtfs(spark)
    docs = spark.createDataFrame(
        [(1, "b a a c b a"), (2, "x"), (3, None), (4, "t t s s u")],
        "doc_id long, text string",
    )
    docs.createOrReplaceTempView("udtf_docs")
    got = spark.sql("""
        SELECT d.doc_id, t.token, t.n
        FROM udtf_docs d, LATERAL top_tokens(d.text, 2) t
    """).collect()

    want = spark.sql("""
        WITH counts AS (
            SELECT doc_id, tok AS token, CAST(count(*) AS INT) AS n
            FROM udtf_docs
            LATERAL VIEW explode(filter(split(text, ' '), x -> x != '')) AS tok
            GROUP BY doc_id, tok
        ), ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY doc_id ORDER BY n DESC, token) AS rk
            FROM counts
        )
        SELECT doc_id, token, n FROM ranked WHERE rk <= 2
    """).collect()
    key = lambda r: (r["doc_id"], r["token"], r["n"])
    assert sorted(got, key=key) == sorted(want, key=key)


def test_semdedup_refuses_pathological_cluster_width(spark):
    from smartpy_arc_spark.operators.semdedup import semdedup

    df = spark.range(200_000).selectExpr(
        "id as vec_id", "array(cast(id as double)) as embedding"
    )
    with pytest.raises(ValueError, match="quadratic"):
        semdedup(df, k=2)


# --------------------------------------------------------- CDC apply

def test_cdc_apply_latest_wins_semantics(spark):
    from smartpy_arc_spark.operators.merge import cdc_apply

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    changes = spark.createDataFrame(
        [
            (2, "b1", 1, "U"),
            (2, "b2", 2, "U"),   # later seq wins
            (3, None, 5, "D"),   # delete key 3
            (4, "d", 1, "I"),    # insert new key
            (5, "e1", 1, "I"),
            (5, None, 2, "D"),   # inserted then deleted -> absent
        ],
        "k long, v string, seq long, op string",
    )
    out = {r["k"]: r["v"] for r in cdc_apply(base, changes, key_col="k", seq_col="seq").collect()}
    assert out == {1: "a", 2: "b2", 4: "d"}


def test_cdc_apply_rejects_duplicate_key_seq(spark):
    from smartpy_arc_spark.operators.merge import cdc_apply

    base = spark.createDataFrame([(1, "a")], "k long, v string")
    changes = spark.createDataFrame(
        [(1, "x", 1, "U"), (1, "y", 1, "U")], "k long, v string, seq long, op string"
    )
    with pytest.raises(ValueError, match="must be unique"):
        cdc_apply(base, changes, key_col="k", seq_col="seq")


# ---------------------------------------------------- triangle count

def test_triangle_count_known_graph(spark):
    from smartpy_arc_spark.operators.components import triangle_count

    # K4 has 4 triangles; plus a pendant edge and a duplicate/reversed
    # edge that must not change the count
    edges = [(a, b) for a in range(4) for b in range(4) if a != b]
    edges += [(3, 9), (9, 3), (2, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    assert triangle_count(df).collect()[0]["n_triangles"] == 4


def test_triangle_count_triangle_free(spark):
    from smartpy_arc_spark.operators.components import triangle_count

    df = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0)], "src long, dst long"  # 4-cycle
    )
    assert triangle_count(df).collect()[0]["n_triangles"] == 0


# --------------------------------------------------- inverted index

def test_inverted_index_postings_and_min_df(spark):
    from smartpy_arc_spark.operators.text import inverted_index

    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "a c"), (3, "b b c a")],
        "doc_id long, text string",
    )
    out = {r["term"]: r for r in inverted_index(docs).collect()}
    assert out["a"]["doc_freq"] == 3 and out["a"]["total_tf"] == 4
    assert out["a"]["postings"] == "1:2 2:1 3:1"
    assert out["b"]["postings"] == "1:1 3:2"
    assert "c" in out
    only2 = {r["term"] for r in inverted_index(docs, min_df=3).collect()}
    assert only2 == {"a"}


# -------------------------------------- weighted sample / split / BM25

def test_weighted_sample_favors_heavy_rows(spark):
    """With weight ratios of 1000:1 the heavy rows dominate the sample
    overwhelmingly (ES keys scale as 1/w)."""
    from smartpy_arc_spark.operators.sample import weighted_sample_topk

    rows = [(i, 1000.0) for i in range(20)] + [(100 + i, 1.0) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    out = weighted_sample_topk(df, weight_col="w", key_cols=["doc_id"], k=10)
    picked = [r["doc_id"] for r in out.collect()]
    assert sum(1 for p in picked if p < 100) >= 9
    # determinism: same input -> same selection
    again = [r["doc_id"] for r in weighted_sample_topk(
        df, weight_col="w", key_cols=["doc_id"], k=10).collect()]
    assert picked == again


def test_dataset_split_is_stable_under_growth(spark):
    from smartpy_arc_spark.operators.sample import dataset_split

    small = spark.createDataFrame([(i,) for i in range(50)], "doc_id long")
    big = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    s_small = {r["doc_id"]: r["split"] for r in dataset_split(small, ["doc_id"]).collect()}
    s_big = {r["doc_id"]: r["split"] for r in dataset_split(big, ["doc_id"]).collect()}
    # a row's split never changes when the corpus grows
    assert all(s_big[k] == v for k, v in s_small.items())
    assert set(s_big.values()) == {"train", "val", "test"}
    with pytest.raises(ValueError):
        dataset_split(small, ["doc_id"], val_pct=60, test_pct=50)


def test_bm25_ranks_matching_docs_by_relevance(spark):
    from smartpy_arc_spark.operators.text import bm25_search

    docs = spark.createDataFrame(
        [
            (1, "spark spark spark shuffle"),       # dense hit, short
            (2, "spark " + "filler " * 50),         # single hit, long
            (3, "nothing relevant here"),
            (4, "shuffle join spark"),              # all three terms
        ],
        "doc_id long, text string",
    )
    out = bm25_search(docs, ["spark", "shuffle", "join"], top_k=10).collect()
    ids = [r["doc_id"] for r in out]
    assert 3 not in ids                  # no term match -> absent
    assert ids[0] == 4                   # all-terms doc wins
    scores = {r["doc_id"]: r["score"] for r in out}
    assert scores[1] > scores[2]         # tf-dense short doc beats long


def test_resample_interpolate_linear_and_flat_tail(spark):
    from smartpy_arc_spark.operators.resample import resample_interpolate
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base, 10.0),
        (1, base + dt.timedelta(hours=4), 30.0),   # gap of 3 buckets
        (1, base + dt.timedelta(hours=6), 60.0),
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, v double")
    out = {
        int((r["bucket_start"] - base).total_seconds() // 3600): r
        for r in resample_interpolate(
            df, key_col="k", ts_col="ts", value_col="v", interval_sec=3600
        ).collect()
    }
    assert out[0]["v"] == 10.0 and not out[0]["interpolated"]
    assert out[1]["v"] == 15.0 and out[1]["interpolated"]   # 10 + 20*(1/4)
    assert out[2]["v"] == 20.0
    assert out[3]["v"] == 25.0
    assert out[4]["v"] == 30.0 and not out[4]["interpolated"]
    assert out[5]["v"] == 45.0                               # midpoint
    assert out[6]["v"] == 60.0
    assert len(out) == 7                                     # no extrapolation


# -------------------------------------- neighbor join / frequent pairs

def test_neighbor_join_finds_exactly_in_radius_pairs(spark):
    from smartpy_arc_spark.geometry.neighbor import neighbor_join

    # ~0.009° lat ≈ 1 km; points: two ~1.4 km apart, one far away
    pts = spark.createDataFrame(
        [
            (1, 45.0, 7.0),
            (2, 45.009, 7.0128),   # ~1.4 km from 1 (cell-boundary crosser)
            (3, 45.5, 7.5),        # ~60 km away
        ],
        "id long, lat double, lon double",
    )
    out = {(r["l_id"], r["r_id"]): r["dist_km"]
           for r in neighbor_join(pts, pts, radius_km=2.0).collect()}
    assert set(out) == {(1, 2), (2, 1)}
    assert 1.0 < out[(1, 2)] < 2.0


def test_neighbor_join_high_latitude_no_misses(spark):
    """At 60°N one lon degree is only ~55 km — equator-sized cells would
    miss this pair; the max_abs_lat sizing must not."""
    from smartpy_arc_spark.geometry.neighbor import haversine_km, neighbor_join
    from pyspark.sql import functions as F

    pts = spark.createDataFrame(
        [(1, 60.0, 10.0), (2, 60.0, 10.085)],  # ~4.7 km apart at 60°N
        "id long, lat double, lon double",
    )
    d = pts.alias("a").join(pts.alias("b")).where("a.id=1 and b.id=2").select(
        haversine_km(F.col("a.lat"), F.col("a.lon"), F.col("b.lat"), F.col("b.lon")).alias("d")
    ).collect()[0]["d"]
    assert 4.0 < d < 5.0
    out = neighbor_join(pts, pts, radius_km=5.0).collect()
    assert len(out) == 2


def test_frequent_pairs_support_and_lift(spark):
    from smartpy_arc_spark.operators.itemsets import frequent_pairs

    rows = []
    for b in range(10):
        rows += [(b, "x"), (b, "y")]          # x,y always together
    rows += [(100, "x"), (101, "y"), (102, "z"), (103, "z")]
    df = spark.createDataFrame(rows, "basket long, item string")
    out = {(r["item_a"], r["item_b"]): r
           for r in frequent_pairs(df, basket_col="basket", item_col="item",
                                   min_support=5).collect()}
    assert set(out) == {("x", "y")}
    r = out[("x", "y")]
    assert r["n_baskets"] == 10
    # lift = P(xy)/(P(x)P(y)) = (10/14)/((11/14)*(11/14)) ≈ 1.157
    assert r["lift"] == pytest.approx(10 * 14 / (11 * 11), abs=1e-3)


# ---------------------------------------- sequence funnel / snap diff

def test_sequence_funnel_window_anchoring(spark):
    """The click 2h after the view must NOT count (anchored window), and
    a purchase anchored to a non-qualifying click must not either."""
    from smartpy_arc_spark.operators.funnel import sequence_funnel
    import datetime as dt

    t = dt.datetime(2024, 1, 1)
    h = dt.timedelta(hours=1)
    rows = [
        # user 1: view -> click (+30min) -> purchase (+30min): full funnel
        (1, t, "view"), (1, t + h/2, "click"), (1, t + h, "purchase"),
        # user 2: click 2h after view: funnel stops at view
        (2, t, "view"), (2, t + 2*h, "click"), (2, t + 2*h + h/2, "purchase"),
        # user 3: click BEFORE view: not a chain
        (3, t, "click"), (3, t + h/2, "view"),
        # user 4: two clicks; first within window, purchase within window
        # of THAT click
        (4, t, "view"), (4, t + h/4, "click"), (4, t + 3*h, "click"),
        (4, t + h/2, "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    r = sequence_funnel(df, ["view", "click", "purchase"],
                        step_window_sec=3600).collect()[0]
    assert r["n_view"] == 4
    assert r["n_click"] == 2          # users 1 and 4
    assert r["n_purchase"] == 2       # users 1 and 4
    with pytest.raises(ValueError):
        sequence_funnel(df, ["view"])


def test_snapshot_diff_statuses(spark, tmp_path):
    from smartpy_arc_spark.sinks.snapshot import snapshot_diff, write_snapshot

    table = str(tmp_path / "t")
    v1 = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, name string, bal double",
    )
    v2 = spark.createDataFrame(
        [(2, "b", 25.0), (3, "c", 30.0), (4, "d", 40.0)],
        "k long, name string, bal double",
    )
    write_snapshot(v1, table, mode="overwrite")
    write_snapshot(v2, table, mode="overwrite")
    out = {r["k"]: r["change"]
           for r in snapshot_diff(spark, table, key_col="k",
                                  v_from=1, v_to=2).collect()}
    assert out == {1: "removed", 2: "changed", 4: "added"}  # 3 unchanged


# ------------------------------------------------ k-core / MAD outliers

def test_k_core_peels_cascade(spark):
    """A triangle with a pendant chain: 2-core = the triangle (the chain
    peels away in cascading rounds)."""
    from smartpy_arc_spark.operators.components import k_core

    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r["vertex"]: r["degree"] for r in k_core(df, k=2).collect()}
    assert out == {1: 2, 2: 2, 3: 2}
    # 3-core of the same graph is empty
    assert k_core(df, k=3).count() == 0


def test_k_core_keeps_clique(spark):
    from smartpy_arc_spark.operators.components import k_core

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    df = spark.createDataFrame(k4, "src long, dst long")
    out = k_core(df, k=3)
    assert sorted(r["vertex"] for r in out.collect()) == [0, 1, 2, 3]


def test_mad_anomalies_flags_only_outliers(spark):
    from smartpy_arc_spark.operators.quality import mad_anomalies

    rows = [("g", i, 100.0 + (i % 5)) for i in range(20)] + [("g", 99, 500.0)]
    df = spark.createDataFrame(rows, "grp string, id long, v double")
    out = mad_anomalies(df, "grp", "v", n_mads=3.0, id_cols=["id"]).collect()
    assert [r["id"] for r in out] == [99]
    assert out[0]["deviation"] > 3.0


def test_mad_anomalies_constant_group_flags_nothing(spark):
    from smartpy_arc_spark.operators.quality import mad_anomalies

    df = spark.createDataFrame(
        [("g", i, 7.0) for i in range(10)], "grp string, id long, v double"
    )
    assert mad_anomalies(df, "grp", "v", id_cols=["id"]).count() == 0


# --------------------------------------- winsorize / transitions

def test_winsorize_clips_to_group_percentiles(spark):
    from smartpy_arc_spark.operators.quality import winsorize

    rows = [("g", float(i)) for i in range(1, 101)]   # 1..100
    df = spark.createDataFrame(rows, "grp string, v double")
    out = winsorize(df, "grp", "v", lo=0.10, hi=0.90).collect()
    vals = sorted(r["v_w"] for r in out)
    # exact p10 of 1..100 = 10.9, p90 = 90.1 (interpolated)
    assert vals[0] == pytest.approx(10.9)
    assert vals[-1] == pytest.approx(90.1)
    assert sum(1 for r in out if r["clipped"]) == 20
    assert len(out) == 100                            # clip, don't trim


def test_transition_counts_probabilities(spark):
    from smartpy_arc_spark.operators.sessionize import transition_counts
    import datetime as dt

    t = dt.datetime(2024, 1, 1)
    s = dt.timedelta(seconds=1)
    rows = [
        (1, 1, t,       "a"), (1, 2, t + s,   "b"), (1, 3, t + 2*s, "a"),
        (2, 4, t,       "a"), (2, 5, t + s,   "b"),
        (3, 6, t,       "a"), (3, 7, t + s,   "c"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, event_type string"
    )
    out = {(r["from_type"], r["to_type"]): r for r in transition_counts(df).collect()}
    assert out[("a", "b")]["n"] == 2
    assert out[("a", "c")]["n"] == 1
    assert out[("b", "a")]["n"] == 1
    assert out[("a", "b")]["p"] == pytest.approx(2 / 3, abs=1e-3)
    # no cross-user transitions: user 1's trailing 'a' -> user 2's 'a'
    assert ("a", "a") not in out


# ------------------------------------------------- statistical tests

def test_chi_square_known_table(spark):
    """2x2 table [[10, 20], [20, 10]]: chi2 = 60*(10*10-20*20)^2 /
    (30*30*30*30) * ... — classic formula gives 6.6667, dof 1."""
    from smartpy_arc_spark.operators.stats import chi_square_independence

    rows = (
        [("a", "x")] * 10 + [("a", "y")] * 20
        + [("b", "x")] * 20 + [("b", "y")] * 10
    )
    df = spark.createDataFrame(rows, "g string, h string")
    r = chi_square_independence(df, "g", "h").collect()[0]
    # chi2 = n(ad-bc)^2 / ((a+b)(c+d)(a+c)(b+d)) = 60*(100-400)^2/30^4
    assert r["chi2"] == pytest.approx(60 * 300**2 / 30**4, abs=1e-3)
    assert r["dof"] == 1 and r["n"] == 60


def test_chi_square_independent_is_zero(spark):
    from smartpy_arc_spark.operators.stats import chi_square_independence

    rows = [(g, h) for g in "ab" for h in "xy" for _ in range(25)]
    df = spark.createDataFrame(rows, "g string, h string")
    r = chi_square_independence(df, "g", "h").collect()[0]
    assert r["chi2"] == 0.0


def test_welch_t_known_samples(spark):
    from smartpy_arc_spark.operators.stats import welch_t_test
    import statistics as st

    a = [1.0, 2.0, 3.0, 4.0, 5.0]
    b = [2.0, 4.0, 6.0, 8.0]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    r = welch_t_test(df, "g", "v", "a", "b").collect()[0]
    va, vb = st.variance(a), st.variance(b)
    se2 = va / len(a) + vb / len(b)
    t = (st.mean(a) - st.mean(b)) / se2 ** 0.5
    dof = se2**2 / (
        (va / len(a)) ** 2 / (len(a) - 1) + (vb / len(b)) ** 2 / (len(b) - 1)
    )
    assert r["t_stat"] == pytest.approx(t, abs=1e-3)
    assert r["dof"] == pytest.approx(dof, abs=0.01)
    assert r["mean_a"] == 3.0 and r["mean_b"] == 5.0
