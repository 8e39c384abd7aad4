"""Batch-28: group_mode, percentile_bands."""


def test_group_mode_deterministic_ties(spark):
    from smartpy_arc_spark.operators.stats import group_mode

    rows = [("g", "b")] * 2 + [("g", "a")] * 2 + [("g", "c")]
    df = spark.createDataFrame(rows, "g string, v string")
    r = group_mode(df, "g", "v").collect()[0]
    # a and b tie at 2 -> value asc picks 'a'
    assert r.mode_value == "a" and r.mode_count == 2 and r.n == 5
    assert r.share_e6 == 400000


def test_group_mode_per_group(spark):
    from smartpy_arc_spark.operators.stats import group_mode

    rows = [("g1", "x")] * 3 + [("g1", "y")] + [("g2", "y")] * 2
    df = spark.createDataFrame(rows, "g string, v string")
    out = {r.g: r for r in group_mode(df, "g", "v").collect()}
    assert out["g1"].mode_value == "x" and out["g2"].mode_value == "y"
    assert out["g2"].share_e6 == 1_000_000


def test_percentile_bands_selection_rank(spark):
    from smartpy_arc_spark.operators.stats import percentile_bands

    # values 1..10: k10 = ceil(1.0)=1 -> 1; k50 = 5 -> 5; k90 = 9 -> 9
    df = spark.createDataFrame(
        [("g", float(v)) for v in range(1, 11)], "g string, v double"
    )
    r = percentile_bands(df, "g", "v", qs=(10, 50, 90), scale=1).collect()[0]
    assert r.n == 10
    assert r.p10_e4 == 1 * 10000
    assert r.p50_e4 == 5 * 10000
    assert r.p90_e4 == 9 * 10000


def test_percentile_bands_single_row_group(spark):
    from smartpy_arc_spark.operators.stats import percentile_bands

    df = spark.createDataFrame([("g", 42.0)], "g string, v double")
    r = percentile_bands(df, "g", "v", qs=(10, 50, 90), scale=1).collect()[0]
    assert r.p10_e4 == r.p50_e4 == r.p90_e4 == 420000
