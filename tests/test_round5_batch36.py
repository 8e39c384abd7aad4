"""Batch-36: markov_entropy."""

import math


def test_markov_entropy_deterministic_chain(spark):
    from smartpy_arc_spark.operators.funnel import markov_entropy

    # every user follows a -> b -> a -> b: transitions fully determined
    rows = []
    for u in range(5):
        for i, s in enumerate(["a", "b", "a", "b", "a"]):
            rows.append((u, i, s))
    df = spark.createDataFrame(rows, "u long, t int, s string")
    r = markov_entropy(df, "u", "t", "s").collect()[0]
    assert r.n_transitions == 20 and r.n_states == 2
    assert r.h_e9 == 0 and r.predictability_e6 == 1_000_000


def test_markov_entropy_uniform_chain(spark):
    from smartpy_arc_spark.operators.funnel import markov_entropy

    # one user cycling through every (i, j) pair of 2 states equally:
    # craft a sequence whose transition counts are uniform
    seq = ["a", "a", "b", "b", "a", "a", "b", "b", "a"]
    # transitions: aa,ab,bb,ba,aa,ab,bb,ba -> each pair twice
    rows = [(1, i, s) for i, s in enumerate(seq)]
    df = spark.createDataFrame(rows, "u long, t int, s string")
    r = markov_entropy(df, "u", "t", "s").collect()[0]
    assert r.n_transitions == 8 and r.n_states == 2
    # uniform 2-state chain: H = ln 2 = H_max, predictability 0
    assert abs(r.h_e9 - round(math.log(2) * 1e9)) <= 2
    assert r.predictability_e6 == 0


def test_markov_entropy_single_state(spark):
    from smartpy_arc_spark.operators.funnel import markov_entropy

    rows = [(1, i, "x") for i in range(5)]
    df = spark.createDataFrame(rows, "u long, t int, s string")
    r = markov_entropy(df, "u", "t", "s").collect()[0]
    assert r.n_states == 1 and r.h_e9 == 0
    assert r.predictability_e6 is None  # H_max undefined for k=1
