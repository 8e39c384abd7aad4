"""Batch-19 hypothesis-test operators: kruskal_wallis, levene_bf,
runs_test, jarque_bera, durbin_watson, wilcoxon_signed_rank."""

import math


def test_kruskal_textbook_two_groups(spark):
    from smartpy_arc_spark.operators.stats import kruskal_wallis

    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 4.0), ("b", 5.0), ("b", 6.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = kruskal_wallis(df, "g", "v").collect()[0]
    # R_a=6, R_b=15: H = 12/(6*7)*(36/3+225/3) - 21 = 27/7
    assert r.n == 6 and r.k_groups == 2
    assert r.h_e6 == round(27 / 7 * 1e6)
    assert r.h_adj_e6 == r.h_e6  # no ties -> correction is identity


def test_kruskal_all_tied_null_adjusted(spark):
    from smartpy_arc_spark.operators.stats import kruskal_wallis

    df = spark.createDataFrame(
        [("a", 5.0)] * 3 + [("b", 5.0)] * 3, "g string, v double"
    )
    r = kruskal_wallis(df, "g", "v").collect()[0]
    assert r.h_adj_e6 is None  # tie correction degenerates to 0


def test_levene_equal_spread_zero(spark):
    from smartpy_arc_spark.operators.stats import levene_bf

    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 11.0), ("b", 12.0), ("b", 13.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = levene_bf(df, "g", "v").collect()[0]
    assert r.w_e6 == 0  # identical |y - median| profiles


def test_levene_unequal_spread_positive(spark):
    from smartpy_arc_spark.operators.stats import levene_bf

    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 0.0), ("b", 12.0), ("b", 50.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = levene_bf(df, "g", "v").collect()[0]
    assert r.w_e6 is not None and r.w_e6 > 0


def test_runs_monotone_series(spark):
    from smartpy_arc_spark.operators.stats import runs_test

    df = spark.createDataFrame(
        [(i, float(i + 1)) for i in range(10)], "t int, v double"
    )
    r = runs_test(df, "t", "v").collect()[0]
    # lower median = 5; below/above split 5/5, two runs
    assert r.runs == 2 and r.n_above == 5 and r.n_below == 5
    mu = 2 * 25 / 10 + 1
    var = 50 * (50 - 10) / (100 * 9)
    assert r.z_e6 == round((2 - mu) / math.sqrt(var) * 1e6)


def test_runs_alternating_series(spark):
    from smartpy_arc_spark.operators.stats import runs_test

    vals = [1.0 if i % 2 else 10.0 for i in range(10)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "t int, v double"
    )
    r = runs_test(df, "t", "v").collect()[0]
    assert r.runs == 10 and r.z_e6 > 0  # more runs than expected


def test_jarque_bera_symmetric_zero_skew(spark):
    from smartpy_arc_spark.operators.stats import jarque_bera

    vals = [1.0, 2.0, 3.0, 4.0, 5.0]  # symmetric around 3
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v double")
    r = jarque_bera(df, "g", "v").collect()[0]
    assert r.skew_e6 == 0
    # uniform grid has negative excess kurtosis (platykurtic): m4/m2^2 = 1.7
    assert r.kurt_e6 == round((1.7 - 3.0) * 1e6)


def test_jarque_bera_skewed_positive(spark):
    from smartpy_arc_spark.operators.stats import jarque_bera

    vals = [1.0] * 8 + [100.0]  # heavy right tail
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v double")
    r = jarque_bera(df, "g", "v").collect()[0]
    assert r.skew_e6 > 0 and r.jb_e6 > 0


def test_durbin_watson_alternating_residuals(spark):
    from smartpy_arc_spark.operators.stats import durbin_watson

    # y alternates around a flat trend: e = ±1, de = ∓2
    rows = [(i, i, 10.0 + (1.0 if i % 2 else -1.0)) for i in range(40)]
    df = spark.createDataFrame(rows, "t int, x long, y double")
    r = durbin_watson(df, "t", "x", "y").collect()[0]
    # DW -> 4 for perfect negative serial correlation (39 steps of ±2)
    assert r.dw_e6 is not None and 3_800_000 < r.dw_e6 <= 4_000_000


def test_durbin_watson_smooth_residuals_near_zero(spark):
    from smartpy_arc_spark.operators.stats import durbin_watson

    # slow sine around the trend: consecutive residuals nearly equal
    rows = [
        (i, i, float(i) + 100.0 * math.sin(i / 20.0)) for i in range(80)
    ]
    df = spark.createDataFrame(rows, "t int, x long, y double")
    r = durbin_watson(df, "t", "x", "y").collect()[0]
    assert r.dw_e6 is not None and r.dw_e6 < 1_000_000


def test_wilcoxon_all_positive_shift(spark):
    from smartpy_arc_spark.operators.stats import wilcoxon_signed_rank

    rows = [(11.0, 10.0), (22.0, 20.0), (33.0, 30.0)]
    df = spark.createDataFrame(rows, "a double, b double")
    r = wilcoxon_signed_rank(df, "a", "b").collect()[0]
    # d = +1,+2,+3: doubled ranks 2,4,6 all positive
    assert r.n_pairs == 3 and r.n_nonzero == 3 and r.w2_plus == 12
    assert r.z_e6 == round(6 / math.sqrt(14) * 1e6)


def test_wilcoxon_zero_diffs_dropped(spark):
    from smartpy_arc_spark.operators.stats import wilcoxon_signed_rank

    rows = [(10.0, 10.0), (22.0, 20.0), (30.0, 33.0)]
    df = spark.createDataFrame(rows, "a double, b double")
    r = wilcoxon_signed_rank(df, "a", "b").collect()[0]
    # |d| = 2, 3 -> doubled ranks 2, 4; only +2 is positive
    assert r.n_pairs == 3 and r.n_nonzero == 2 and r.w2_plus == 2
