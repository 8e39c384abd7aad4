"""Batch-23: Borůvka minimum spanning forest + window-suite semantics."""

import random


def _kruskal(nodes, edges):
    """Reference MST with the same strict (w, s, d) total order."""
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = []
    for w, a, b in sorted((w, a, b) for a, b, w in edges):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            out.append((a, b, w))
    return sorted(out)


def test_mst_matches_kruskal_random_graphs(spark):
    from smartpy_arc_spark.operators.components import (
        minimum_spanning_forest,
    )

    for seed in (3, 11):
        random.seed(seed)
        nodes = list(range(14))
        seen, edges = set(), []
        for _ in range(40):
            a, b = random.sample(nodes, 2)
            a, b = min(a, b), max(a, b)
            if (a, b) in seen:
                continue
            seen.add((a, b))
            edges.append((a, b, random.randint(1, 8)))  # duplicate weights
        df = spark.createDataFrame(edges, "s long, d long, w long")
        got = sorted(
            (r.s, r.d, r.w) for r in minimum_spanning_forest(df).collect()
        )
        assert got == _kruskal(nodes, edges)


def test_mst_chain_exercises_pointer_doubling(spark):
    # strictly increasing weights along a 48-node path: every component's
    # min edge hooks toward node 0, so the round-1 hook tree is a maximal-
    # depth chain — the worst case for the parent pointer-doubling merge
    from smartpy_arc_spark.operators.components import (
        minimum_spanning_forest,
    )

    edges = [(i, i + 1, 100 + i) for i in range(48)]
    df = spark.createDataFrame(edges, "s long, d long, w long")
    got = sorted((r.s, r.d, r.w) for r in minimum_spanning_forest(df).collect())
    assert got == sorted(edges)  # a path IS its own spanning tree


def test_mst_forest_on_disconnected_graph(spark):
    from smartpy_arc_spark.operators.components import (
        minimum_spanning_forest,
    )

    edges = [(1, 2, 5), (2, 3, 1), (1, 3, 2), (10, 11, 7)]
    df = spark.createDataFrame(edges, "s long, d long, w long")
    got = sorted((r.s, r.d, r.w) for r in minimum_spanning_forest(df).collect())
    # two trees: {(2,3,1),(1,3,2)} and {(10,11,7)}
    assert got == [(1, 3, 2), (2, 3, 1), (10, 11, 7)]


def test_mst_single_edge_and_self_loop(spark):
    from smartpy_arc_spark.operators.components import (
        minimum_spanning_forest,
    )

    edges = [(1, 2, 3), (4, 4, 1)]  # self-loop must drop
    df = spark.createDataFrame(edges, "s long, d long, w long")
    got = [(r.s, r.d, r.w) for r in minimum_spanning_forest(df).collect()]
    assert got == [(1, 2, 3)]


def test_window_suite_tie_semantics(spark):
    import __spark_entry__ as entry

    df = spark.createDataFrame(
        [(1, 10, 500.0), (1, 11, 500.0), (1, 12, 300.0), (2, 20, 100.0)],
        "c_nationkey int, c_custkey int, c_acctbal double",
    )
    df.createOrReplaceTempView("_ws_customer")

    # run the same construction inline
    from pyspark.sql import functions as F
    from pyspark.sql import Window as W

    bal = F.round(F.col("c_acctbal") * 100).cast("long")
    base = df.select(
        F.col("c_nationkey").alias("nk"),
        F.col("c_custkey").alias("ck"),
        bal.alias("bal"),
    )
    w_tie = W.partitionBy("nk").orderBy(F.col("bal").desc(), F.col("ck"))
    w_val = W.partitionBy("nk").orderBy(F.col("bal").desc())
    n = F.count("*").over(W.partitionBy("nk"))
    rnk = F.rank().over(w_val)
    out = base.select(
        "nk",
        "ck",
        F.row_number().over(w_tie).alias("rn"),
        rnk.alias("rnk"),
        F.dense_rank().over(w_val).alias("drnk"),
        F.when(
            n > 1,
            F.round((rnk - 1).cast("double") / (n - 1).cast("double") * 1e6),
        )
        .otherwise(0)
        .cast("long")
        .alias("pr"),
        F.round(F.cume_dist().over(w_val) * 1e6).cast("long").alias("cd"),
        (F.first("bal").over(w_tie) - F.col("bal")).alias("gap"),
    )
    rows = {r.ck: r for r in out.collect()}
    # tied top pair: same rank/dense_rank, distinct row_number
    assert rows[10].rnk == rows[11].rnk == 1
    assert rows[10].drnk == rows[11].drnk == 1
    assert {rows[10].rn, rows[11].rn} == {1, 2}
    assert rows[12].rnk == 3 and rows[12].drnk == 2
    # percent_rank: (rank-1)/(n-1) -> 0, 0, 1
    assert rows[10].pr == 0 and rows[12].pr == 1_000_000
    # cume_dist of tied peers includes both
    assert rows[10].cd == rows[11].cd == 666667
    # single-row partition: percent_rank 0 by convention
    assert rows[20].pr == 0 and rows[20].cd == 1_000_000
    assert rows[12].gap == 20000
