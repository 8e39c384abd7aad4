"""Property-based relational algebra invariants (SURVEY.md §5 item 4)."""

from hypothesis import given, settings, strategies as st

from smartpy_arc_spark import enrich_join


rows = st.lists(
    st.tuples(st.integers(0, 8), st.integers(0, 100)), min_size=0, max_size=30
)


@settings(max_examples=12, deadline=None)
@given(target_rows=rows, enrich_rows=rows)
def test_join_row_count_algebra(spark_session_holder, target_rows, enrich_rows):
    """inner ≤ left; left ≥ |target|; inner = Σ matches."""
    spark = spark_session_holder
    target = spark.createDataFrame(
        [(k, v) for k, v in target_rows] or [(None, None)], "tk long, tv long"
    ).where("tk is not null")
    # enrichment side must be unique on its key (the reference's df side is
    # an attribute table); dedupe
    seen = {}
    for k, v in enrich_rows:
        seen.setdefault(k, v)
    enrich = spark.createDataFrame(
        [(k, v) for k, v in seen.items()] or [(None, None)], "ek long, ev long"
    ).where("ek is not null")

    n_target = target.count()
    inner = enrich_join(target, enrich, "tk", "ek", keep_common=True).count()
    left = enrich_join(target, enrich, "tk", "ek", keep_common=False).count()

    assert inner <= left
    assert left == n_target  # unique enrich key → left join preserves rows
    keys = {r.ek for r in enrich.collect()}
    expected_inner = sum(1 for k, _ in target_rows if k in keys)
    assert inner == expected_inner


import pytest  # noqa: E402


@pytest.fixture(scope="module")
def spark_session_holder(spark):
    return spark


# ---------------------------------------- round-3 operator invariants

span_docs = st.lists(
    st.lists(st.integers(0, 5), min_size=0, max_size=24),  # token ids
    min_size=1,
    max_size=6,
)


@settings(max_examples=10, deadline=None)
@given(docs=span_docs)
def test_duplicate_spans_invariants(spark_session_holder, docs):
    """Every span is >= n tokens, within doc bounds, and spans of one doc
    never overlap (islands are maximal and disjoint by construction)."""
    from smartpy_arc_spark.operators.spans import duplicate_spans

    spark = spark_session_holder
    n = 3
    df = spark.createDataFrame(
        [(i, " ".join(f"t{t}" for t in toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    rows = duplicate_spans(df, n=n, min_docs=2).collect()
    lengths = {i: len(toks) for i, toks in enumerate(docs)}
    per_doc = {}
    for r in rows:
        assert r["span_tokens"] == r["span_end"] - r["span_start"] + 1
        assert r["span_tokens"] >= n
        assert 1 <= r["span_start"] <= r["span_end"] <= lengths[r["doc_id"]]
        per_doc.setdefault(r["doc_id"], []).append((r["span_start"], r["span_end"]))
    for spans in per_doc.values():
        spans.sort()
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert e1 < s2 - 1  # disjoint AND non-adjacent (else same island)


@settings(max_examples=10, deadline=None)
@given(
    fact_keys=st.lists(st.integers(0, 50), min_size=0, max_size=40),
    dim_keys=st.lists(st.integers(0, 50), min_size=1, max_size=15),
)
def test_bloom_join_equivalence_property(spark_session_holder, fact_keys, dim_keys):
    from smartpy_arc_spark.operators.scale import bloom_prefilter_join

    spark = spark_session_holder
    fact = spark.createDataFrame(
        [(k, k * 2) for k in fact_keys] or [(None, None)], "k long, v long"
    ).where("k is not null")
    dim = spark.createDataFrame(
        [(k,) for k in set(dim_keys)], "dk long"
    )
    got = sorted(
        (r["k"], r["v"])
        for r in bloom_prefilter_join(
            fact, dim, fact_key="k", dim_key="dk", num_bits=256
        ).collect()
    )
    want = sorted(
        (r["k"], r["v"])
        for r in fact.join(dim, fact["k"] == dim["dk"]).collect()
    )
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    sizes=st.lists(st.integers(1, 10**6), min_size=1, max_size=8, unique=True),
    budget=st.integers(1, 10**7),
)
def test_mixture_allocation_invariants(spark_session_holder, sizes, budget):
    """Weights sum to 1; every allocation respects both the budget share
    and the one-epoch cap."""
    from smartpy_arc_spark.operators.sample import mixture_allocation

    spark = spark_session_holder
    df = spark.createDataFrame(
        [(f"s{i}", n) for i, n in enumerate(sizes)], "source string, n long"
    )
    rows = mixture_allocation(df, "source", "n", budget=budget).collect()
    assert abs(sum(r["weight"] for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert r["alloc_tokens"] <= r["n_tokens"]
        assert 0.0 <= r["epochs"] <= 1.0
