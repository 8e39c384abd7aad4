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
    # within bound: returns None, no raise
    assert _assert_bounded(big.limit(50), 100, "test side") is None


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
