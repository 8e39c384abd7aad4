"""LLM-pipeline extension operators: dedup, similarity, text, sessionization."""

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from smartpy_arc_spark.operators.dedup import (
    exact_dedup,
    exact_dedup_groups,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_candidates,
)
from smartpy_arc_spark.operators.sessionize import sessionize
from smartpy_arc_spark.operators.similarity import ann_lsh_topk, knn_cosine_bruteforce
from smartpy_arc_spark.operators.text import (
    lang_id_heuristic,
    quality_score,
    rolling_hash_fingerprint,
    text_stats,
)


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (1, base),
        (2, base),  # exact dup of 1
        (3, base.replace("today", "tomorrow")),  # near dup
        (4, "completely different content about spark query engines and plans"),
        (5, "der hund und die katze sind im haus und das ist gut"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(docs):
    groups = exact_dedup_groups(docs).collect()
    sizes = sorted(g.n_dups for g in groups)
    assert sizes == [1, 1, 1, 2]
    kept = exact_dedup(docs)
    assert kept.count() == 4
    assert {r.doc_id for r in kept.select("doc_id").collect()} == {1, 3, 4, 5}


def test_minhash_signature_properties(docs):
    sigs = {r.doc_id: r.minhash_sig for r in minhash_signatures(docs).collect()}
    assert sigs[1] == sigs[2]  # identical docs → identical signatures
    agree_near = sum(a == b for a, b in zip(sigs[1], sigs[3]))
    agree_far = sum(a == b for a, b in zip(sigs[1], sigs[4]))
    assert agree_near > agree_far  # near-dup agrees more than unrelated


def test_minhash_lsh_finds_dup_pair(docs):
    pairs = {(r.id_a, r.id_b): r.jaccard_est
             for r in minhash_lsh_candidates(docs).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs  # near-dup collides in at least one band
    assert (1, 4) not in pairs and (1, 5) not in pairs


def test_minhash_hot_bucket_collapse_exact(spark, docs):
    """10k byte-identical docs: collapse_exact keeps the candidate count
    LINEAR (9,999 star edges to the min-id representative) where classic
    LSH would emit ~50M quadratic pairs; near/far behavior of the distinct
    texts is unchanged."""
    boiler = spark.range(10, 10_010).select(
        F.col("id").alias("doc_id"), F.lit("same boilerplate page " * 8).alias("text")
    )
    corpus = docs.unionAll(boiler)
    pairs = minhash_lsh_candidates(corpus, collapse_exact=True).collect()
    star = [(r.id_a, r.id_b) for r in pairs if r.id_a == 10]
    assert len(star) == 9_999 and all(r.jaccard_est <= 1.0 for r in pairs)
    got = {(r.id_a, r.id_b) for r in pairs}
    assert (1, 2) in got and (1, 3) in got and (1, 4) not in got
    # bounded total: stars + the small distinct-doc candidate set
    assert len(pairs) < 10_010


def test_minhash_hot_bucket_cap_star_spill(spark):
    """Distinct-but-near-identical docs over the cap: the oversized bucket
    spills to m-1 representative star edges (real signature-agreement
    estimates), not C(m,2) pairs, and nothing is silently dropped — every
    member still connects to the bucket representative."""
    n = 500
    base = "shared legal disclaimer text repeated across pages " * 5
    near = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit(base), F.col("id").cast("string")).alias("text"),
    )
    capped = minhash_lsh_candidates(near, max_bucket_size=32)
    rows = capped.collect()
    # linear, not quadratic: <= bands * (m-1) + small-bucket pairs
    assert 0 < len(rows) < 5_000
    ids_linked = {r.id_b for r in rows} | {r.id_a for r in rows}
    assert len(ids_linked) == n  # every doc reaches its representative


def test_minhash_bucket_stats_reports_cap(spark):
    from smartpy_arc_spark.operators.dedup import minhash_lsh_bucket_stats

    n = 200
    same = spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit("identical " * 20).alias("text")
    )
    stats = minhash_lsh_bucket_stats(same, max_bucket_size=32).collect()
    assert len(stats) == 4  # one row per band
    for r in stats:
        assert r.max_bucket == n and r.docs_in_capped_buckets == n
        assert r.pairs_uncapped == n * (n - 1) // 2
        assert r.pairs_after_cap == n - 1


def test_simhash_hot_bucket_hardening(spark, docs):
    boiler = spark.range(100, 1_100).select(
        F.col("id").alias("doc_id"), F.lit("same boilerplate page " * 8).alias("text")
    )
    corpus = docs.unionAll(boiler)
    rows = simhash_candidates(
        corpus, collapse_exact=True, max_bucket_size=32
    ).collect()
    got = {(r.id_a, r.id_b): r.hamming for r in rows}
    assert got[(1, 2)] == 0  # exact-dup star edge
    star = [p for p in got if p[0] == 100]
    assert len(star) == 999 and all(got[p] == 0 for p in star)
    assert len(rows) < 2_200  # linear, not ~500k quadratic


def test_simhash_hamming(docs):
    sigs = {r.doc_id: r.simhash for r in simhash(docs).collect()}
    assert sigs[1] == sigs[2]
    ham13 = bin(sigs[1] ^ sigs[3]).count("1")
    ham14 = bin(sigs[1] ^ sigs[4]).count("1")
    assert ham13 < ham14
    cands = {(r.id_a, r.id_b): r.hamming
             for r in simhash_candidates(docs, max_hamming=8).collect()}
    assert cands[(1, 2)] == 0 and (1, 3) in cands


def test_ngram_jaccard(docs):
    pairs = {(r.id_a, r.id_b): r.jaccard
             for r in ngram_jaccard_pairs(docs, min_jaccard=0.5).collect()}
    assert pairs[(1, 2)] == 1.0
    assert 0.5 < pairs[(1, 3)] < 1.0


def test_knn_bruteforce_exact(spark):
    vecs = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),   # closest to 0
        (2, [0.0, 1.0, 0.0]),
        (3, [-1.0, 0.0, 0.0]),  # opposite
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    out = knn_cosine_bruteforce(df.where("vec_id = 0"), df, k=3).collect()
    order = [r.neighbor_id for r in sorted(out, key=lambda r: r.rk)]
    assert order == [1, 2, 3]
    assert out[0].cos_sim <= 1.0


def test_ann_lsh_recall_against_bruteforce(spark):
    rng = np.random.default_rng(7)
    data = [(int(i), [float(x) for x in rng.standard_normal(16)]) for i in range(200)]
    df = spark.createDataFrame(data, "vec_id long, embedding array<double>")
    q = df.where("vec_id < 3")
    exact = {(r.query_id, r.neighbor_id)
             for r in knn_cosine_bruteforce(q, df, k=5).collect()}
    approx = {(r.query_id, r.neighbor_id)
              for r in ann_lsh_topk(q, df, k=5, dim=16, n_planes=6,
                                    n_tables=6).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6  # approximate, but must beat random by far


def test_ivf_recall_against_bruteforce(spark):
    from smartpy_arc_spark.operators.similarity import ivf_topk

    rng = np.random.default_rng(11)
    data = [(int(i), [float(x) for x in rng.standard_normal(16)]) for i in range(300)]
    df = spark.createDataFrame(data, "vec_id long, embedding array<double>")
    q = df.where("vec_id < 3")
    exact = {(r.query_id, r.neighbor_id)
             for r in knn_cosine_bruteforce(q, df, k=5).collect()}
    approx = {(r.query_id, r.neighbor_id)
              for r in ivf_topk(q, df, k=5, n_centroids=8, n_probe=4).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4  # probing half the lists on random data


def test_text_stats_and_quality(docs):
    stats = {r.doc_id: r for r in text_stats(docs).collect()}
    assert stats[1].n_tokens == 13
    q = {r.doc_id: r for r in quality_score(docs).collect()}
    assert 0 <= q[1].quality_score <= 1
    assert q[1].stop_ratio > q[5].stop_ratio  # english markers


def test_lang_id(docs):
    pred = {r.doc_id: r.predicted_lang for r in lang_id_heuristic(docs).collect()}
    assert pred[1] == "en"
    assert pred[5] == "de"


def test_rolling_hash_fingerprint_deterministic(docs):
    a = {r.doc_id: r.min_shingle_hash
         for r in rolling_hash_fingerprint(docs).collect()}
    b = {r.doc_id: r.min_shingle_hash
         for r in rolling_hash_fingerprint(docs).collect()}
    assert a == b and a[1] == a[2]


def test_sessionize_gap_logic(spark):
    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        (1, 100, t0),
        (2, 100, t0 + dt.timedelta(minutes=10)),   # same session
        (3, 100, t0 + dt.timedelta(minutes=50)),   # 40min gap → new session
        (4, 200, t0),                               # other user
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    out = {r.event_id: r.session_id
           for r in sessionize(df, tiebreak_col="event_id").collect()}
    assert out[1] == 1 and out[2] == 1 and out[3] == 2 and out[4] == 1


def test_wordcount_topk(docs):
    from smartpy_arc_spark.operators.text import wordcount_topk

    top = wordcount_topk(docs, k=3).collect()
    # 'again' and 'the' tie at 6 occurrences; word-asc tiebreak is deterministic
    assert [(r.word, r.n) for r in top[:2]] == [("again", 6), ("the", 6)]
    assert top[0].n >= top[1].n >= top[2].n


def test_tfidf_top_terms(docs):
    from smartpy_arc_spark.operators.text import tfidf_top_terms

    out = tfidf_top_terms(docs, top_n=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == {1, 2, 3, 4, 5}
    assert all(len(v) == 2 for v in by_doc.values())
    # corpus-wide terms ('the' appears in 3 of 5 docs) rank below rare terms
    doc4_terms = {r.term for r in by_doc[4]}
    assert doc4_terms <= {"completely", "different", "content", "about",
                          "spark", "query", "engines", "plans"}
    # identical docs get identical top terms
    assert [(r.rk, r.term) for r in sorted(by_doc[1], key=lambda r: r.rk)] == [
        (r.rk, r.term) for r in sorted(by_doc[2], key=lambda r: r.rk)
    ]


def test_edit_distance_pairs(docs):
    from smartpy_arc_spark.operators.dedup import edit_distance_pairs

    pairs = {(r.id_a, r.id_b): r.edit_dist
             for r in edit_distance_pairs(docs, max_distance=10**6,
                                          length_band=10**6).collect()}
    assert pairs[(1, 2)] == 0                       # exact dup
    assert 0 < pairs[(1, 3)] <= len("tomorrow")     # single word swap
    assert pairs[(1, 3)] < pairs[(1, 4)]            # near-dup closer than far
    # length-band blocking prunes before levenshtein runs
    banded = edit_distance_pairs(docs, max_distance=10**6, length_band=0)
    assert {(r.id_a, r.id_b) for r in banded.collect()} == {(1, 2)}


def test_content_hash_sample(docs):
    import pytest as _pytest

    from smartpy_arc_spark.operators.sample import content_hash_sample

    full = content_hash_sample(docs, "text", sixteenths=16)
    assert full.count() == docs.count()
    sub = {r.doc_id for r in content_hash_sample(docs, "text", sixteenths=4)
           .select("doc_id").collect()}
    # deterministic: same selection on every evaluation and under repartition
    sub2 = {r.doc_id for r in
            content_hash_sample(docs.repartition(7), "text", sixteenths=4)
            .select("doc_id").collect()}
    assert sub == sub2
    with _pytest.raises(ValueError):
        content_hash_sample(docs, "text", sixteenths=0)


def test_range_join_buckets(spark):
    from smartpy_arc_spark.operators.join import range_join

    facts = spark.createDataFrame(
        [(1, 5.0), (2, 10.0), (3, 24.9), (4, 99.0)], "id long, value double"
    )
    ranges = spark.createDataFrame(
        [("a", 0.0, 10.0), ("b", 10.0, 25.0)], "bucket string, lo double, hi double"
    )
    out = {r.id: r.bucket for r in range_join(facts, ranges, value_col="value").collect()}
    # half-open [lo, hi): 10.0 lands in 'b', 99.0 matches nothing
    assert out == {1: "a", 2: "b", 3: "b"}
    plan = range_join(facts, ranges, value_col="value")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


# --- quality ops (round 2) --------------------------------------------


def test_repetition_stats_planted(spark):
    from smartpy_arc_spark.operators.quality import repetition_stats

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),            # 1 distinct, top frac 1.0
            (2, "a b c d"),                         # all distinct
            (3, "x y x y x y"),                     # bigram "x y" dominates
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in repetition_stats(docs).collect()}
    assert out[1].n_words == 4 and out[1].top_word_frac == 1.0
    assert out[1].top_bigram_frac == 1.0          # "spam spam" x3
    assert out[2].distinct_word_ratio == 1.0 and out[2].top_word_frac == 0.25
    assert out[3].top_bigram_frac == pytest.approx(0.6)  # 3 of 5 bigrams


def test_gopher_flags_gates(spark):
    from smartpy_arc_spark.operators.quality import gopher_flags

    long_ok = "the quick brown fox jumps over a lazy dog today " * 2
    docs = spark.createDataFrame(
        [
            (1, long_ok.strip()),                   # passes everything
            (2, "too short"),                       # fails word count
            (3, " ".join(["9"] * 50)),              # fails stopwords + alpha
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in gopher_flags(docs).collect()}
    assert out[1].keep is True
    assert out[2].keep is False and out[2].ok_word_count is False
    assert out[3].keep is False
    assert out[3].ok_stop_words is False and out[3].ok_alpha is False


def test_pii_redact_patterns(spark):
    from smartpy_arc_spark.operators.quality import pii_redact

    docs = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.org now"),
            (2, "call +1-555-123-4567 or 555-987-6543"),
            (3, "host 192.168.0.1 and 10.0.0.255 up"),
            (4, "clean text with no pii at all"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in pii_redact(docs, id_col="doc_id").collect()}
    assert out[1].n_email == 1 and "[EMAIL]" in out[1].text
    assert "@" not in out[1].text
    assert out[2].n_phone == 2 and out[2].text.count("[PHONE]") == 2
    assert out[3].n_ip == 2 and out[3].text.count("[IP]") == 2
    assert out[4].text == "clean text with no pii at all"
    assert (out[4].n_email, out[4].n_phone, out[4].n_ip) == (0, 0, 0)


def test_gopher_flags_no_shuffle_plan(spark):
    from smartpy_arc_spark.operators.quality import gopher_flags

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = gopher_flags(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # row-local: must run at scan speed


def test_trained_ivf_codebook_improves_or_matches_recall(spark):
    from smartpy_arc_spark.operators.similarity import (
        ivf_topk,
        knn_cosine_bruteforce,
        train_ivf_codebook,
    )

    rng = np.random.default_rng(11)
    # 6 well-separated gaussian clusters: trained centroids should find them
    centers = rng.standard_normal((6, 16)) * 8
    data = [
        (int(i), [float(x) for x in centers[i % 6] + rng.standard_normal(16)])
        for i in range(300)
    ]
    df = spark.createDataFrame(data, "vec_id long, embedding array<double>")
    q = df.where("vec_id < 3")
    exact = {(r.query_id, r.neighbor_id)
             for r in knn_cosine_bruteforce(q, df, k=5).collect()}

    def recall(codebook=None):
        approx = {(r.query_id, r.neighbor_id)
                  for r in ivf_topk(q, df, k=5, n_centroids=6, n_probe=2,
                                    codebook=codebook).collect()}
        return len(exact & approx) / len(exact)

    book = train_ivf_codebook(df, n_centroids=6, n_iters=3)
    r_init, r_trained = recall(None), recall(book)
    assert r_trained >= r_init
    assert r_trained >= 0.85  # clustered data: trained codebook ~nails it

    # determinism: same corpus -> same codebook
    book2 = train_ivf_codebook(df, n_centroids=6, n_iters=3)
    assert sorted(map(tuple, book.collect())) == sorted(map(tuple, book2.collect()))


def test_grouped_standardize_matches_builtin(spark):
    from smartpy_arc_spark.operators.normalize import (
        grouped_standardize,
        standardize_builtin,
    )

    rows = [(i, "g%d" % (i % 3), float(i * i % 17)) for i in range(60)]
    rows.append((60, "solo", 5.0))  # degenerate single-row group -> z=0
    df = spark.createDataFrame(rows, "id long, grp string, v double")
    a = {r.id: round(r.z, 9) for r in
         grouped_standardize(df, "grp", "v", id_col="id").collect()}
    b = {r.id: round(r.z, 9) for r in
         standardize_builtin(df, "grp", "v", id_col="id").collect()}
    assert a == b
    assert a[60] == 0.0


def test_dq_checks_planted_failures(spark):
    from smartpy_arc_spark.operators.checks import (
        completeness,
        fk_containment,
        matches,
        max_value,
        min_value,
        run_checks,
        uniqueness,
    )

    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, None, -5.0), (3, "b", 2000.0), (3, "c", 1.0)],
        "id long, name string, v double",
    )
    rep = {(r.rule, r.col, r.threshold): r for r in run_checks(df, [
        completeness("name", 1.0),       # 3/4 -> fail
        completeness("id", 1.0),         # pass
        uniqueness("id", 0.9),           # 3 distinct / 4 rows -> fail
        min_value("v", 0.0),             # -5 -> fail
        max_value("v", 100.0),           # 2000 -> fail
        max_value("v", 5000.0),          # pass
        matches("name", "^[ab]$", 0.5),  # 2 of 3 non-null -> pass
    ]).collect()}
    assert rep[("completeness", "name", 1.0)].passed is False
    assert rep[("completeness", "name", 1.0)].metric == pytest.approx(0.75)
    assert rep[("completeness", "id", 1.0)].passed is True
    assert rep[("uniqueness", "id", 0.9)].passed is False
    assert rep[("min_value", "v", 0.0)].passed is False
    assert rep[("max_value", "v", 100.0)].metric == pytest.approx(2000.0)
    assert rep[("max_value", "v", 100.0)].passed is False
    assert rep[("max_value", "v", 5000.0)].passed is True
    assert rep[("matches", "name", 0.5)].passed is True

    parent = spark.createDataFrame([(1,), (2,)], "k long")
    fk = fk_containment(df, parent, "id", "k").collect()[0]
    assert fk.metric == 2.0 and fk.passed is False  # the two id=3 rows


# ---------------------------------------------------------------------------
# round 2: decontamination / stratified sampling / packing / incremental LSH


def test_ngram_decontaminate_flags_verbatim_overlap(spark):
    from smartpy_arc_spark.operators.contamination import ngram_decontaminate

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),        # verbatim
            (2, "x y alpha beta gamma delta epsilon q r s t"), # partial
            (3, "totally unrelated words here none shared at all"),
            (4, "too short"),                                  # < n words
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in ngram_decontaminate(corpus, bench, n=5, threshold=0.3).collect()
    }
    assert out[1]["n_ngrams"] == 2 and out[1]["n_hits"] == 2
    assert out[1]["contamination"] == 1.0 and out[1]["is_contaminated"]
    # doc 2 shares exactly one 5-gram: 'alpha beta gamma delta epsilon'
    assert out[2]["n_hits"] == 1
    assert out[3]["n_hits"] == 0 and not out[3]["is_contaminated"]
    assert out[4]["n_ngrams"] == 0 and not out[4]["is_contaminated"]


def test_stratified_hash_sample_rates_and_determinism(spark):
    from smartpy_arc_spark.operators.sample import stratified_hash_sample

    df = spark.range(20000).select(
        F.col("id"),
        (F.col("id") % 4).cast("string").alias("stratum"),
    )
    fracs = {"0": 0.5, "1": 0.1, "2": 1.0}  # "3" -> default 0.0
    out = stratified_hash_sample(df, "stratum", fracs, ["id"])
    counts = {r["stratum"]: r["n"] for r in
              out.groupBy("stratum").agg(F.count("*").alias("n")).collect()}
    assert abs(counts["0"] / 5000 - 0.5) < 0.05
    assert abs(counts["1"] / 5000 - 0.1) < 0.03
    assert counts["2"] == 5000          # fraction 1.0 keeps everything
    assert "3" not in counts            # default 0.0 drops everything
    # deterministic: same rows both runs
    a = sorted(r["id"] for r in out.collect())
    b = sorted(r["id"] for r in out.collect())
    assert a == b

    with pytest.raises(ValueError):
        stratified_hash_sample(df, "stratum", {"0": 1.5}, ["id"]).collect()


def test_pack_sequences_invariants(spark):
    from smartpy_arc_spark.operators.pack import pack_sequences

    n, cap = 500, 100
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.xxhash64("id"), F.lit(120)) + 1).alias("n_tokens"),
    )
    out = pack_sequences(df, length_col="n_tokens", max_len=cap, num_buckets=7)
    rows = out.collect()
    # every doc assigned exactly once
    assert sorted(r["doc_id"] for r in rows) == list(range(n))
    # capacity: sum of effective lengths per (bucket, bin) <= cap
    fills = {}
    for r in rows:
        key = (r["bucket"], r["bin_in_bucket"])
        fills[key] = fills.get(key, 0) + min(r["n_tokens"], cap)
        assert r["truncated"] == (r["n_tokens"] > cap)
    assert all(v <= cap for v in fills.values())
    # reported bin_fill matches the recomputed fill
    for r in rows:
        assert fills[(r["bucket"], r["bin_in_bucket"])] == r["bin_fill"]
    # deterministic plan
    again = {(r["doc_id"]): (r["bucket"], r["bin_in_bucket"]) for r in out.collect()}
    assert again == {r["doc_id"]: (r["bucket"], r["bin_in_bucket"]) for r in rows}
    # packing is tight-ish: FFD wastes < 35% on uniform lengths
    total_len = sum(min(r["n_tokens"], cap) for r in rows)
    assert total_len / (len(fills) * cap) > 0.65


def test_minhash_incremental_matches_full_lsh_on_new_pairs(spark, docs):
    from smartpy_arc_spark.operators.dedup import (
        minhash_incremental_candidates,
        minhash_lsh_candidates,
    )

    corpus = docs.where("doc_id <= 3")
    new = docs.where("doc_id >= 4").unionByName(
        spark.createDataFrame(
            [(6, "the quick brown fox jumps over the lazy dog again and again today")],
            "doc_id long, text string",
        )
    )
    inc = minhash_incremental_candidates(
        corpus, new, shingle_mode="word", shingle_size=3
    )
    got = {(r["id_new"], r["id_match"], r["match_is_new"]) for r in inc.collect()}
    # doc 6 is a verbatim copy of corpus docs 1/2 (near 3): must surface
    assert (6, 1, False) in got and (6, 2, False) in got
    # no corpus-vs-corpus pair ever appears (ids 1-3 are never id_new)
    assert all(pair[0] >= 4 for pair in got)
    # cross-check: every incremental pair involving only new ids appears in
    # full-corpus LSH run over the union, and vice versa for new ids
    full = minhash_lsh_candidates(
        corpus.unionByName(new), shingle_mode="word", shingle_size=3
    )
    full_pairs = {(r["id_a"], r["id_b"]) for r in full.collect()}
    inc_pairs = {tuple(sorted(p[:2])) for p in got}
    full_new = {p for p in full_pairs if p[0] >= 4 or p[1] >= 4}
    assert inc_pairs == full_new


def test_curate_corpus_stage_semantics(spark):
    from smartpy_arc_spark.operators.pipeline import curate_corpus

    good = ("the quick brown fox jumps over the lazy dog and then rests "
            "a while before running off to the woods again")
    rows = [
        (1, good, "en", "s1"),
        (2, good, "en", "s1"),                      # exact dup of 1 -> dropped
        (3, "zz zz zz", "en", "s1"),                # fails quality gates
        (4, good.replace("woods", "hills"), "de", "s2"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    bench = spark.createDataFrame(
        [(99, "jumps over the lazy dog and then rests a while before")],
        "doc_id long, text string",
    )
    # full-keep sampling isolates gates/dedup/decontamination
    out = curate_corpus(
        docs, bench, sample_fractions={"en": 1.0, "de": 1.0},
        default_fraction=1.0,
    )
    ids = sorted(r["doc_id"] for r in out.collect())
    # 1 contaminated (long overlap with bench)? ratio: doc1 has 21 words ->
    # 17 5-grams; bench covers 10-word window -> 6 shared; 6/17 > 0.3 -> dropped.
    # doc4 differs late; shares the same 6 leading bench grams -> also >0.3.
    assert 2 not in ids and 3 not in ids
    # with a lenient threshold both survive and the dup/quality drops remain
    out2 = curate_corpus(
        docs, bench, contamination_threshold=0.9,
        sample_fractions={"en": 1.0, "de": 1.0}, default_fraction=1.0,
    )
    assert sorted(r["doc_id"] for r in out2.collect()) == [1, 4]
    assert set(out2.columns) == {"doc_id", "lang", "source"}


def test_per_group_quantile_filter(spark):
    from smartpy_arc_spark.operators.quality import per_group_quantile_filter

    df = spark.createDataFrame(
        [(i, "a" if i < 100 else "b", float(i % 100)) for i in range(200)],
        "id long, g string, v double",
    )
    kept = per_group_quantile_filter(df, "v", "g", q=0.1)
    # 10th percentile of 0..99 is 9.9 -> keeps v >= 9.9 i.e. 10..99
    assert kept.count() == 180
    assert kept.agg(F.min("v")).first()[0] == 10.0
    below = per_group_quantile_filter(df, "v", "g", q=0.1, keep="below")
    assert below.count() == 20

    with pytest.raises(ValueError):
        per_group_quantile_filter(df, "v", "g", q=1.5)


def test_with_observed_quality_piggybacks_on_action(spark, tmp_path):
    from smartpy_arc_spark.operators.checks import with_observed_quality

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c"), (4, None)], "id long, v string"
    )
    observed, obs = with_observed_quality(df, ["v", "id"])
    # the metrics ride the write action itself — no second scan
    observed.write.mode("overwrite").parquet(str(tmp_path / "out"))
    got = obs.get
    assert got["n_rows"] == 4
    assert got["nulls_v"] == 2 and got["nulls_id"] == 0


def test_l2_normalize_arrow_matches_builtin(spark):
    import math

    from smartpy_arc_spark.operators.normalize import l2_normalize_arrow

    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0]), (3, [1.0, 1.0, 1.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    got = {r["vec_id"]: r["unit_vec"] for r in l2_normalize_arrow(df).collect()}
    assert got[1] == pytest.approx([0.6, 0.8])
    assert got[2] == [0.0, 0.0]                      # zero vector unchanged
    assert got[3] == pytest.approx([0.5] * 4)
    for v in got.values():
        n = math.sqrt(sum(x * x for x in v))
        assert n == 0 or n == pytest.approx(1.0, abs=1e-6)

    # agrees with the JVM-side HOF formulation on real data
    from pyspark.sql import functions as F
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(50)
    norm = F.sqrt(F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x * x))
    builtin = {
        r["vec_id"]: r["u"]
        for r in emb.select(
            "vec_id",
            F.transform("embedding", lambda x: x / norm).alias("u"),
        ).collect()
    }
    arrow = {r["vec_id"]: r["unit_vec"] for r in l2_normalize_arrow(emb).collect()}
    for k in builtin:
        assert arrow[k] == pytest.approx(builtin[k], abs=1e-5)


def test_product_quantization_roundtrip_and_recall(spark):
    import numpy as np

    from smartpy_arc_spark.operators.similarity import (
        pq_encode,
        pq_search,
        train_pq_codebooks,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    books = train_pq_codebooks(emb, m=8, k=16, n_iters=2)
    assert len(books) == 8 and all(len(b) == 16 for b in books)
    assert all(len(c) == 8 for b in books for c in b)
    # deterministic training
    books2 = train_pq_codebooks(emb, m=8, k=16, n_iters=2)
    assert books == books2

    codes = pq_encode(emb, books)
    rows = codes.collect()
    assert len(rows) == 500
    assert all(len(r["pq_codes"]) == 8 for r in rows)
    assert all(0 <= c < 16 for r in rows for c in r["pq_codes"])

    # quantization must beat the trivial all-zero-code assignment
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=float)
            for r in emb.collect()}
    code_map = {r["vec_id"]: r["pq_codes"] for r in rows}
    def recon(vid, codes_):
        return np.concatenate([np.array(books[s][c]) for s, c in enumerate(codes_)])
    err = np.mean([np.sum((vecs[v] - recon(v, code_map[v])) ** 2) for v in vecs])
    err0 = np.mean([np.sum((vecs[v] - recon(v, [0] * 8)) ** 2) for v in vecs])
    assert err < err0 * 0.7

    # ADC recall@10 vs exact squared-L2 top-10
    queries = emb.where("vec_id < 5")
    got = pq_search(queries, pq_encode(emb, books), books, k=10).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
    hits = total = 0
    for qid in range(5):
        qv = vecs[qid]
        exact = sorted(vecs, key=lambda v: float(np.sum((vecs[v] - qv) ** 2)))[:10]
        hits += len(set(exact) & set(by_q[qid]))
        total += 10
    assert hits / total >= 0.4, hits / total


def test_ivfpq_recall_against_exact(spark):
    import numpy as np

    from smartpy_arc_spark.operators.similarity import ivfpq_search

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    got = ivfpq_search(
        emb.where("vec_id < 5"), emb, k=10, n_centroids=8, n_probe=4,
        m=8, pq_k=16, pq_iters=1,
    ).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
    assert set(by_q) == set(range(5))
    assert all(len(v) == 10 for v in by_q.values())

    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=float)
            for r in emb.collect()}
    hits = 0
    for qid in range(5):
        qv = vecs[qid]
        exact = sorted(vecs, key=lambda v: float(np.sum((vecs[v] - qv) ** 2)))[:10]
        hits += len(set(exact) & set(by_q[qid]))
    # probing half the lists with PQ distances: recall well above chance
    # (10/500 = 2%); deterministic given fixed seeds/data
    assert hits / 50 >= 0.3, hits / 50
