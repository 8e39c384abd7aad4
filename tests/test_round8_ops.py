"""Round-8 additions: advisor fixes — cms_build's gated vocab
pre-aggregation, geometric_median's empty-input guard."""

import pytest


def test_cms_vocab_preagg_paths_identical(spark):
    """The distinct-vocab pre-aggregation is an associativity-preserving
    rewrite: sketch tables built with and without it are row-identical,
    in both hash families and with weights."""
    from smartpy_arc_spark.operators.sketch import cms_build

    rows = [("a", 3), ("b", 1), ("a", 2), ("c", 7), ("b", 1), ("a", 3)]
    df = spark.createDataFrame(rows, "t string, w long")
    for portable in (False, True):
        for weight in (None, "w"):
            on = cms_build(
                df, "t", width=64, depth=4, weight_col=weight,
                portable_hash=portable, vocab_preagg=True,
            )
            off = cms_build(
                df, "t", width=64, depth=4, weight_col=weight,
                portable_hash=portable, vocab_preagg=False,
            )
            key = lambda r: (r["seed"], r["bucket"])  # noqa: E731
            assert sorted(on.collect(), key=key) == sorted(
                off.collect(), key=key
            )


def test_cms_vocab_preagg_default_tracks_portable(spark):
    """Default (None) enables the pre-agg only on the portable/contract
    path: the xxhash64 production build must stay a single bounded-key
    shuffle — no Aggregate keyed on the raw term column in its plan."""
    from smartpy_arc_spark.operators.sketch import cms_build

    df = spark.createDataFrame([("u%d" % i,) for i in range(50)], "t string")
    plan_prod = cms_build(df, "t", width=64, depth=2)._jdf.queryExecution().optimizedPlan().toString()
    plan_port = cms_build(df, "t", width=64, depth=2, portable_hash=True)._jdf.queryExecution().optimizedPlan().toString()
    # production default: exactly one Aggregate pair (partial+final appear
    # as one logical Aggregate) keyed on (seed, bucket) — never on __t
    assert plan_prod.count("Aggregate [__t") == 0
    assert plan_port.count("Aggregate [__t") >= 1


def test_geometric_median_empty_input_raises(spark):
    """All-null / zero-row input fails fast with a clear ValueError
    instead of an opaque executor-side slice() error."""
    from smartpy_arc_spark.operators.embedding import geometric_median

    empty = spark.createDataFrame([], "v array<double>")
    with pytest.raises(ValueError, match="no non-null vectors"):
        geometric_median(empty, vec_col="v", n_iter=2)
    nulls = spark.createDataFrame([(None,), (None,)], "v array<double>")
    with pytest.raises(ValueError, match="no non-null vectors"):
        geometric_median(nulls, vec_col="v", n_iter=2)


def test_geometric_median_ragged_input_raises(spark):
    """Mixed vector lengths fail fast instead of producing a median
    over positions only some vectors have."""
    from smartpy_arc_spark.operators.embedding import geometric_median

    ragged = spark.createDataFrame(
        [([1.0, 2.0],), ([1.0, 2.0, 3.0],)], "v array<double>"
    )
    with pytest.raises(ValueError, match="ragged"):
        geometric_median(ragged, vec_col="v", n_iter=2)
