"""Round-6 guards: bounded-collect enforcement (VERDICT r5 "What's wrong" #2)
and the near-dup routing-rule fence (VERDICT r5 next-round #6)."""

import inspect

import pytest


def _vec_df(spark, n, dim=4):
    rows = [(i, [float(i % 7)] * dim, i % 3) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>, label long")


def test_knn_classify_oversized_test_side_raises(spark):
    """An unbounded scoring set must fail fast with a routing error, not
    collect to the driver."""
    from smartpy_arc_spark.operators.similarity import knn_classify

    df = _vec_df(spark, 40)
    with pytest.raises(ValueError, match="knn_classify test side"):
        knn_classify(
            df, "vec_id", "embedding", "label", k=3, max_test=10
        ).collect()


def test_knn_classify_within_bound_still_works(spark):
    from smartpy_arc_spark.operators.similarity import knn_classify

    df = _vec_df(spark, 20)
    out = knn_classify(df, "vec_id", "embedding", "label", k=3, max_test=10)
    assert out.count() == 10  # odd ids are the default test split


def test_pq_search_oversized_query_side_raises(spark):
    from smartpy_arc_spark.operators.similarity import pq_encode, pq_search

    df = _vec_df(spark, 30)
    books = [
        [[0.0, 0.0], [3.0, 3.0]],
        [[0.0, 0.0], [6.0, 6.0]],
    ]
    codes = pq_encode(df, books, vec_col="embedding", id_col="vec_id")
    with pytest.raises(ValueError, match="pq_search query side"):
        pq_search(
            df, codes, books, vec_col="embedding", id_col="vec_id",
            k=2, max_queries=5,
        ).collect()


def test_assert_bounded_is_cheap_on_big_side(spark):
    """The guard itself must not scan the full side: limit(n+1).count()."""
    from smartpy_arc_spark.operators.similarity import _assert_bounded

    big = spark.range(0, 10_000_000)  # would be slow to fully count per-row
    with pytest.raises(ValueError):
        _assert_bounded(big, 100, "test side")
    # within bound: no raise; returns the persisted frame (r7: the guard
    # caches the side so the caller's collect/broadcast reuses its scan)
    small = _assert_bounded(big.limit(50), 100, "test side")
    assert small.count() == 50
    assert small.storageLevel.useMemory  # cached between guard and collect
    small.unpersist()


def test_embedding_near_dup_keeps_bounded_filter():
    """The exact threshold join in q_embedding_near_dup is only scale-legal
    because its broadcast side is bounded; this fence keeps the filter (and
    the routing-rule docstring) from being silently dropped."""
    import __spark_entry__ as e

    src = inspect.getsource(e.q_embedding_near_dup)
    assert "vec_id < 300" in src, "bounded query-side filter removed"
    assert "broadcast" in src
    doc = e.q_embedding_near_dup.__doc__
    assert "Routing rule" in doc and "semdedup" in doc


def test_e4_scale_guard_rejects_non_divisors(spark):
    """ADVICE r5: the 10000 // scale integer shortcut silently mis-scales
    when scale does not divide 10000 — now a fail-fast error."""
    from smartpy_arc_spark.operators.stats import (
        grubbs_statistic,
        percentile_bands,
        var_cvar,
    )
    from smartpy_arc_spark.operators.resample import bollinger_bands

    df = spark.createDataFrame(
        [(1, "2024-01-01", 10.0)], "k long, t string, v double"
    )
    for call in (
        lambda: var_cvar(df, "k", "t", "v", scale=3),
        lambda: grubbs_statistic(df, "t", "v", scale=30000),
        lambda: percentile_bands(df, "k", "v", scale=7),
        lambda: bollinger_bands(df, "t", "v", scale=3),
    ):
        with pytest.raises(ValueError, match="divide 10000"):
            call()


def test_duplicate_charges_time_bucket_blocking(spark):
    """ADVICE r5: blocking now includes a coarse time bucket; pairs across
    the bucket boundary must still meet exactly once, far-apart identical
    charges must not pair."""
    from smartpy_arc_spark.operators.checks import duplicate_charges

    rows = [
        # same entity+amount: days 1, 6 (in-window, crosses div-7 buckets),
        # 300 (out of window)
        ("acme", 9.99, "2024-01-01", 1),
        ("acme", 9.99, "2024-01-06", 2),
        ("acme", 9.99, "2024-10-01", 3),
        # different amount never pairs
        ("acme", 5.00, "2024-01-02", 4),
    ]
    df = spark.createDataFrame(rows, "e string, amt double, ts string, rid long")
    out = duplicate_charges(df, "e", "amt", "ts", "rid", window_days=7)
    got = {(r["id_a"], r["id_b"]): r["days_apart"] for r in out.collect()}
    assert got == {(1, 2): 5}


def test_bollinger_decimal_moments_no_int64_wrap(spark):
    """ADVICE r5: Sum(x^2) now runs in DECIMAL(38,0) — magnitudes whose
    n*q would wrap int64 (x ~ 4e9 ticks at scale=1) must still produce
    a finite non-negative sd."""
    from smartpy_arc_spark.operators.resample import bollinger_bands

    rows = [(f"2024-01-{d:02d}", 4.0e9 + d * 1e6) for d in range(1, 11)]
    df = spark.createDataFrame(rows, "t string, v double")
    out = bollinger_bands(df, "t", "v", window=5, scale=1).collect()
    assert all(r["sd_e4"] is not None and r["sd_e4"] >= 0 for r in out)
    # x^2 = 1.6e19 > 2^63: the old int64 path wrapped negative here
    assert max(r["sd_e4"] for r in out) > 0
