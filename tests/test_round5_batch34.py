"""Batch-34: assortativity, heaps_law, burstiness."""


def test_assortativity_star_negative(spark):
    from smartpy_arc_spark.operators.components import assortativity

    # star graph: hub degree n-1 meets leaves degree 1 -> r = -1
    edges = [(0, i) for i in range(1, 6)]
    df = spark.createDataFrame(edges, "s long, d long")
    r = assortativity(df).collect()[0]
    assert r.n_edges == 5 and r.r_e6 == -1_000_000


def test_assortativity_regular_graph_null(spark):
    from smartpy_arc_spark.operators.components import assortativity

    # cycle: every degree equal -> zero variance -> undefined (null)
    edges = [(i, (i + 1) % 6) for i in range(6)]
    df = spark.createDataFrame(edges, "s long, d long")
    r = assortativity(df).collect()[0]
    assert r.n_edges == 6 and r.r_e6 is None


def test_assortativity_two_cliques_positive(spark):
    from smartpy_arc_spark.operators.components import assortativity

    # K4 plus a pendant pair: high-degree meets high-degree mostly
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    edges = k4 + [(10, 11)]
    df = spark.createDataFrame(edges, "s long, d long")
    r = assortativity(df).collect()[0]
    assert r.r_e6 == 1_000_000  # degrees within each component equal


def test_heaps_law_repetitive_vs_unique(spark):
    from smartpy_arc_spark.operators.text import heaps_law

    rep = [(i, "alpha beta gamma delta") for i in range(50)]
    uniq = [(i, f"w{4 * i} w{4 * i + 1} w{4 * i + 2} w{4 * i + 3}") for i in range(50)]
    beta_rep = (
        heaps_law(spark.createDataFrame(rep, "doc_id long, text string"),
                  "doc_id", "text").collect()[0]
    )
    beta_uni = (
        heaps_law(spark.createDataFrame(uniq, "doc_id long, text string"),
                  "doc_id", "text").collect()[0]
    )
    assert beta_rep.vocab == 4 and beta_uni.vocab == 200
    assert beta_rep.n_tokens == beta_uni.n_tokens == 200
    # all-unique corpus: V(n) = n -> beta = 1 exactly
    assert beta_uni.beta_e6 == 1_000_000
    assert beta_rep.beta_e6 < 200000  # vocabulary saturates


def test_burstiness_periodic_vs_bursty(spark):
    import datetime

    from smartpy_arc_spark.operators.stats import burstiness

    t0 = datetime.datetime(2020, 1, 1)
    rows = []
    # periodic: gaps exactly 60s -> sd 0 -> B = -1
    for i in range(20):
        rows.append(("per", t0 + datetime.timedelta(seconds=60 * i)))
    # bursty: 10 events in one second, then a huge gap, repeat
    sec = 0
    for burst in range(4):
        for j in range(10):
            rows.append(
                ("bur", t0 + datetime.timedelta(seconds=sec + j))
            )
        sec += 36000
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    out = {r.k: r for r in burstiness(df, "k", "ts").collect()}
    assert out["per"].b_e6 == -1_000_000 and out["per"].mean_gap_e2 == 6000
    assert out["bur"].b_e6 > 500000  # strongly bursty
