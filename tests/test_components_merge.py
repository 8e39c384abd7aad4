"""Connected components (dedup clustering) and MERGE/SCD2 emulation."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from smartpy_arc_spark.operators.components import connected_components, dedup_clusters
from smartpy_arc_spark.operators.merge import merge_upsert, scd2_apply


def test_connected_components_two_clusters(spark):
    # {1,2,3,4} via chain, {10,11}, singleton edges only
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    comp = {r.node: r.component for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_long_chain_converges(spark):
    # path graph of 40 nodes — needs log-rounds, not 40
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "id_a long, id_b long"
    )
    comp = connected_components(pairs)
    assert comp.select("component").distinct().count() == 1
    assert comp.count() == 41


def test_connected_components_dedup_edges_false_equivalent(spark):
    # min-label spreading is idempotent to duplicate orientations, so the
    # no-dedup fast path (Boruvka's per-round merge) must label identically
    # even when both orientations and repeats are fed in
    pairs = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 4), (10, 11), (10, 11), (11, 10)],
        "id_a long, id_b long",
    )
    a = {r.node: r.component for r in connected_components(pairs).collect()}
    b = {
        r.node: r.component
        for r in connected_components(pairs, dedup_edges=False).collect()
    }
    assert a == b == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_dedup_clusters_keeper_flags(spark):
    pairs = spark.createDataFrame([(5, 9), (9, 7)], "id_a long, id_b long")
    rows = {r.node: r for r in dedup_clusters(pairs).collect()}
    assert rows[5].is_keeper and not rows[7].is_keeper and not rows[9].is_keeper
    assert all(r.component == 5 for r in rows.values())


def test_merge_upsert_semantics(spark):
    target = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)], "k long, name string, v double"
    )
    updates = spark.createDataFrame([(2, "B2", 20.0), (9, "new", 9.0)],
                                    "k long, name string, v double")
    out = {r.k: (r.name, r.v) for r in merge_upsert(target, updates, "k").collect()}
    assert out == {1: ("a", 1.0), 2: ("B2", 20.0), 3: ("c", 3.0), 9: ("new", 9.0)}


def test_merge_upsert_rejects_duplicate_update_keys(spark):
    target = spark.createDataFrame([(1, "a")], "k long, name string")
    dups = spark.createDataFrame([(1, "b"), (1, "c")], "k long, name string")
    with pytest.raises(ValueError, match="multiple rows for key"):
        merge_upsert(target, dups, "k")


def test_scd2_multiple_changes_same_key_chain(spark):
    t0 = dt.datetime(2024, 1, 1)
    t1, t2 = dt.datetime(2024, 3, 1), dt.datetime(2024, 6, 1)
    current = spark.createDataFrame(
        [(1, "v1", t0, None)],
        "k long, attr string, valid_from timestamp, valid_to timestamp",
    )
    changes = spark.createDataFrame(
        [(1, "v2", t1), (1, "v3", t2)], "k long, attr string, change_ts timestamp"
    )
    out = sorted(
        (r.attr, r.valid_from, r.valid_to) for r in scd2_apply(current, changes, key="k").collect()
    )
    assert out == [("v1", t0, t1), ("v2", t1, t2), ("v3", t2, None)]
    # open-row uniqueness holds even with intra-batch chains
    open_rows = [r for r in scd2_apply(current, changes, key="k").collect()
                 if r.valid_to is None]
    assert len(open_rows) == 1


def test_scd2_apply(spark):
    t0, t1 = dt.datetime(2024, 1, 1), dt.datetime(2024, 6, 1)
    current = spark.createDataFrame(
        [(1, "v1", t0, None), (2, "w1", t0, None)],
        "k long, attr string, valid_from timestamp, valid_to timestamp",
    )
    changes = spark.createDataFrame(
        [(1, "v2", t1)], "k long, attr string, change_ts timestamp"
    )
    out = scd2_apply(current, changes, key="k")
    rows = sorted(
        [(r.k, r.attr, r.valid_from, r.valid_to) for r in out.collect()]
    )
    assert rows == [
        (1, "v1", t0, t1),      # closed at change ts
        (1, "v2", t1, None),    # new current row
        (2, "w1", t0, None),    # untouched key passes through
    ]
    # open-row uniqueness invariant
    open_counts = (
        out.where(F.col("valid_to").isNull()).groupBy("k").count().collect()
    )
    assert all(r["count"] == 1 for r in open_counts)


def test_pagerank_dangling_mass_conserved(spark):
    from smartpy_arc_spark.operators.components import pagerank

    # a -> b -> c, c dangling: without redistribution mass leaks each round
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src string, dst string"
    )
    pr = {r.node: r.rank for r in pagerank(edges, iterations=10).collect()}
    assert abs(sum(pr.values()) - 1.0) < 1e-9
    # sink of the chain accumulates the most rank
    assert pr["c"] > pr["b"] > 0
    assert set(pr) == {"a", "b", "c"}


def test_pagerank_symmetric_star(spark):
    from smartpy_arc_spark.operators.components import pagerank

    # undirected star: hub h <-> 4 leaves; hub must dominate, leaves equal
    pairs = [("h", f"l{i}") for i in range(4)]
    edges = spark.createDataFrame(
        pairs + [(b, a) for a, b in pairs], "src string, dst string"
    )
    pr = {r.node: r.rank for r in pagerank(edges, iterations=8).collect()}
    leaves = [v for k, v in pr.items() if k != "h"]
    assert pr["h"] > max(leaves)
    assert max(leaves) - min(leaves) < 1e-12
    assert abs(sum(pr.values()) - 1.0) < 1e-9


def test_louvain_recovers_cliques(spark):
    """Two 5-cliques joined by a single bridge edge: Louvain assigns each
    clique one community, and its partition's modularity beats both the
    singleton and the one-community partitions."""
    from smartpy_arc_spark.operators.components import (
        louvain_communities,
        modularity,
    )

    edges = []
    for base in (0, 10):
        edges += [(base + i, base + j) for i in range(5) for j in range(i + 1, 5)]
    edges.append((0, 10))  # bridge
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.community for r in louvain_communities(e).collect()}
    c_a = {got[i] for i in range(5)}
    c_b = {got[10 + i] for i in range(5)}
    assert len(c_a) == 1 and len(c_b) == 1 and c_a != c_b

    def q_of(assign_rows):
        a = spark.createDataFrame(assign_rows, "node long, community long")
        return sum(
            r.contribution_e9 for r in modularity(e, a).collect()
        )

    q_louvain = q_of([(n, c) for n, c in got.items()])
    q_single = q_of([(n, n) for n in got])
    q_one = q_of([(n, 0) for n in got])
    assert q_louvain > q_single and q_louvain > q_one
    # determinism: a second run is identical
    again = {r.node: r.community
             for r in louvain_communities(e).collect()}
    assert again == got


def test_modularity_exact_values(spark):
    """Hand-computable case: two disjoint triangles.  m=6, each community
    has L=3, D=6 → contribution = (3·24 − 36)/144 = 0.25 per community."""
    from smartpy_arc_spark.operators.components import modularity

    edges = [(0, 1), (1, 2), (0, 2), (10, 11), (11, 12), (10, 12)]
    e = spark.createDataFrame(edges, "src long, dst long")
    a = spark.createDataFrame(
        [(n, n // 10) for n in (0, 1, 2, 10, 11, 12)], "node long, community long"
    )
    rows = {r.community: r for r in modularity(e, a).collect()}
    for c in (0, 1):
        assert rows[c].internal_edges == 3 and rows[c].total_degree == 6
        assert rows[c].contribution_e9 == 250_000_000


def test_louvain_multilevel_selfw_coarsen(spark):
    """ADVICE r10: a nested clique-of-cliques that coarsens through >=2
    levels, exercising the coarsen branch where the prior level's selfw
    rides as self-loop edges (the r10 single-grouped-pass rewrite).
    Assignments and modularity are pinned to the pre-rewrite values so
    any future sweep/coarsen refactor that changes semantics fails here
    instead of only in the sf0.1 contract run."""
    from smartpy_arc_spark.operators.components import (
        louvain_communities,
        modularity,
    )

    edges = []
    for sg in (0, 100):
        cl = [[sg + 10 * c + i for i in range(5)] for c in range(3)]
        for c in cl:
            edges += [
                (a, b) for i, a in enumerate(c) for b in c[i + 1:]
            ]
        # 8 inter-clique edges per clique pair: strong enough that the
        # supergroup merge is profitable at the SUPERNODE level (level 1)
        # but not at the node level (level 0)
        for i in range(3):
            for j in range(i + 1, 3):
                for t in range(8):
                    edges.append((cl[i][t % 5], cl[j][(t * 2) % 5]))
    edges.append((0, 100))  # bridge between supergroups
    e = spark.createDataFrame(edges, "src long, dst long")

    trace = []
    got = {
        r.node: r.community
        for r in louvain_communities(e, _level_trace=trace).collect()
    }
    # three coarsens; the 2nd and 3rd fold prior selfw through the union
    assert [t["selfw_riding"] for t in trace] == [False, True, True]

    # pinned pre-rewrite partition (deterministic parity sweeps; the two
    # supergroups coarsen-merge, each leaving one supernode behind — a
    # synchronous-sweep artifact, pinned as-is)
    parts = {}
    for n, c in got.items():
        parts.setdefault(c, set()).add(n)
    expected = {
        frozenset({0, 1, 2, 3, 4, 10, 11, 12, 13, 14, 21, 22, 23, 24}),
        frozenset({20}),
        frozenset(
            {100, 101, 102, 103, 104, 110, 111, 112, 113, 114,
             121, 122, 123, 124}
        ),
        frozenset({120}),
    }
    assert {frozenset(v) for v in parts.values()} == expected

    a = spark.createDataFrame(list(got.items()), "node long, community long")
    q = sum(r.contribution_e9 for r in modularity(e, a).collect())
    assert q == 418729622

    # determinism: a second run is bit-identical
    again = {
        r.node: r.community for r in louvain_communities(e).collect()
    }
    assert again == got
