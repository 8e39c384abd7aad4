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
