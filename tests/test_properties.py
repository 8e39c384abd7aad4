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


@settings(max_examples=10, deadline=None)
@given(
    base_keys=st.lists(st.integers(0, 20), min_size=0, max_size=15, unique=True),
    changes=st.lists(
        st.tuples(
            st.integers(0, 20),                  # key
            st.integers(1, 5),                   # seq
            st.sampled_from(["I", "U", "D"]),    # op
        ),
        min_size=0,
        max_size=20,
    ),
)
def test_cdc_apply_matches_sequential_replay(spark_session_holder, base_keys, changes):
    """cdc_apply must equal a per-key replay: the highest-seq change
    decides; D removes, I/U sets; untouched keys persist."""
    from smartpy_arc_spark.operators.merge import cdc_apply

    # dedupe (key, seq) pairs — duplicate input is rejected by contract
    seen = {}
    for k, s, op in changes:
        seen[(k, s)] = op
    spark = spark_session_holder
    base = spark.createDataFrame(
        [(k, f"b{k}") for k in base_keys] or [(None, None)], "k long, v string"
    ).where("k is not null")
    ch = spark.createDataFrame(
        [(k, f"c{k}-{s}", s, op) for (k, s), op in seen.items()]
        or [(None, None, None, None)],
        "k long, v string, seq long, op string",
    ).where("k is not null")

    got = {r["k"]: r["v"] for r in cdc_apply(base, ch, key_col="k", seq_col="seq").collect()}

    expected = {k: f"b{k}" for k in base_keys}
    latest: dict = {}
    for (k, s), op in seen.items():
        if k not in latest or s > latest[k][0]:
            latest[k] = (s, op)
    for k, (s, op) in latest.items():
        if op == "D":
            expected.pop(k, None)
        else:
            expected[k] = f"c{k}-{s}"
    assert got == expected


@settings(max_examples=8, deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.integers(1, 4),          # user
            st.integers(0, 20),         # minute offset
            st.sampled_from(["view", "click", "purchase"]),
        ),
        min_size=0,
        max_size=25,
    )
)
def test_sequence_funnel_monotone_and_replay(spark_session_holder, events):
    """Funnel counts are monotone non-increasing down the steps and match
    a per-user Python replay of the earliest-chain semantics."""
    import datetime as dt

    from smartpy_arc_spark.operators.funnel import sequence_funnel

    spark = spark_session_holder
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (u, i, t0 + dt.timedelta(minutes=m), e)
        for i, (u, m, e) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows or [(None, None, None, None)],
        "user_id long, event_id long, ts timestamp, event_type string",
    ).where("user_id is not null")
    window = 600  # 10 minutes
    r = sequence_funnel(
        df, ["view", "click", "purchase"], step_window_sec=window
    ).collect()[0]
    assert r["n_view"] >= r["n_click"] >= r["n_purchase"]

    # python replay
    per_user: dict = {}
    for u, m, e in events:
        per_user.setdefault(u, []).append((m * 60, e))
    n = [0, 0, 0]
    for evs in per_user.values():
        t_prev = min((t for t, e in evs if e == "view"), default=None)
        if t_prev is None:
            continue
        n[0] += 1
        for i, step in enumerate(["click", "purchase"], start=1):
            cand = [
                t for t, e in evs
                if e == step and t_prev < t <= t_prev + window
            ]
            if not cand:
                break
            t_prev = min(cand)
            n[i] += 1
    assert [r["n_view"], r["n_click"], r["n_purchase"]] == n


# --------------------------------------------------------------- round 3

_samples = st.lists(st.integers(0, 20), min_size=2, max_size=40)


@settings(max_examples=12, deadline=None)
@given(a=_samples, b=_samples)
def test_mann_whitney_matches_bruteforce_ranks(spark_session_holder, a, b):
    """U from the distributed-CDF construction equals the textbook
    average-rank computation on any sample pair."""
    from smartpy_arc_spark.operators.stats import mann_whitney_u

    spark = spark_session_holder
    rows = [("a", float(v)) for v in a] + [("b", float(v)) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    r = mann_whitney_u(df, "g", "v", "a", "b").collect()[0]

    allv = sorted(a + b)
    # average rank per value (1-based, ties share the mean rank)
    first = {}
    for i, v in enumerate(allv):
        first.setdefault(v, i + 1)
    avg_rank = {v: first[v] + (allv.count(v) - 1) / 2 for v in set(allv)}
    ra = sum(avg_rank[v] for v in a)
    u_a = ra - len(a) * (len(a) + 1) / 2
    assert r["u2_a"] == round(2 * u_a)
    assert r["n_a"] == len(a) and r["n_b"] == len(b)


@settings(max_examples=12, deadline=None)
@given(a=_samples, b=_samples)
def test_ks_matches_bruteforce_cdf(spark_session_holder, a, b):
    from smartpy_arc_spark.operators.stats import ks_test_2samp

    spark = spark_session_holder
    rows = [("a", float(v)) for v in a] + [("b", float(v)) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    r = ks_test_2samp(df, "g", "v", "a", "b").collect()[0]
    na, nb = len(a), len(b)
    d_num = max(
        abs(sum(1 for x in a if x <= v) * nb - sum(1 for x in b if x <= v) * na)
        for v in set(a + b)
    )
    assert r["d_num"] == d_num


@settings(max_examples=10, deadline=None)
@given(
    vals=st.lists(st.integers(-50, 50), min_size=2, max_size=25),
)
def test_ewma_matches_python_fold(spark_session_holder, vals):
    from smartpy_arc_spark.operators.resample import ewma

    spark = spark_session_holder
    rows = [(1, i, float(v), i) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k long, t long, v double, i long") \
        .selectExpr("k", "timestamp_seconds(t) as ts", "v", "i")
    r = ewma(df, "k", "ts", "v", alpha=0.5, tiebreak_col="i", scale=1).collect()[0]
    s = float(vals[0])
    for v in vals[1:]:
        s = 0.5 * v + 0.5 * s
    # tolerance, not round(s, 6) equality: python round() is banker's,
    # Spark's is HALF_UP — dyadic folds (alpha=0.5) can land exactly on
    # a 5e-7 tie where the two conventions pick different neighbors.
    # The tie itself puts the diff AT 5e-7, and the subtraction adds a
    # final ulp — so the bound needs headroom above the exact boundary.
    assert abs(r["ewma_value"] - s) <= 5.1e-7


@settings(max_examples=10, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)), min_size=0, max_size=40
    ),
)
def test_bfs_matches_dijkstra_unit_weights(spark_session_holder, edges):
    from smartpy_arc_spark.operators.components import bfs_distances

    spark = spark_session_holder
    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["dist"]
        for r in bfs_distances(df, [0], max_hops=15).collect()
    }
    # reference BFS on the undirected adjacency
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    exp = {0: 0}
    frontier = [0]
    d = 0
    while frontier:
        d += 1
        nxt = []
        for n in frontier:
            for m in adj.get(n, ()):
                if m not in exp:
                    exp[m] = d
                    nxt.append(m)
        frontier = nxt
    assert got == exp
