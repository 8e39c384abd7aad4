"""Round-4 additions: Spearman rank correlation, one-way ANOVA,
two-proportion z, and per-key CUSUM changepoint detection."""

import math


# ------------------------------------------------- spearman

def test_spearman_perfect_monotone(spark):
    from smartpy_arc_spark.operators.stats import spearman_corr

    rows = [(float(i), float(i * i)) for i in range(1, 8)]
    df = spark.createDataFrame(rows, "x double, y double")
    r = spearman_corr(df, "x", "y").collect()[0]
    assert r["n"] == 7
    assert r["rho_e6"] == 1000000

    anti = spark.createDataFrame(
        [(float(i), float(-i * i * i)) for i in range(1, 8)],
        "x double, y double",
    )
    assert spearman_corr(anti, "x", "y").collect()[0]["rho_e6"] == -1000000


def test_spearman_hand_computed_permutation(spark):
    """x = 1..4, y = (2,1,4,3): rank-Pearson = 0.6 exactly."""
    from smartpy_arc_spark.operators.stats import spearman_corr

    rows = [(1.0, 2.0), (2.0, 1.0), (3.0, 4.0), (4.0, 3.0)]
    df = spark.createDataFrame(rows, "x double, y double")
    assert spearman_corr(df, "x", "y").collect()[0]["rho_e6"] == 600000


def test_spearman_ties_average_ranks(spark):
    """Tied values share an average rank: perfectly aligned tie groups
    still give rho = 1 (the no-ties shortcut formula would not)."""
    from smartpy_arc_spark.operators.stats import spearman_corr

    rows = [(1.0, 10.0), (2.0, 20.0), (2.0, 20.0), (3.0, 40.0)]
    df = spark.createDataFrame(rows, "x double, y double")
    assert spearman_corr(df, "x", "y").collect()[0]["rho_e6"] == 1000000


def test_spearman_constant_column_null(spark):
    from smartpy_arc_spark.operators.stats import spearman_corr

    rows = [(1.0, 5.0), (2.0, 5.0), (3.0, 5.0)]
    df = spark.createDataFrame(rows, "x double, y double")
    assert spearman_corr(df, "x", "y").collect()[0]["rho_e6"] is None


# ------------------------------------------------- anova

def test_anova_hand_computed(spark):
    """Groups (1,2,3) and (4,5,6): SSB = 13.5, SSW = 4, F = 13.5."""
    from smartpy_arc_spark.operators.stats import anova_oneway

    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 4.0), ("b", 5.0), ("b", 6.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = anova_oneway(df, "g", "v").collect()[0]
    assert r["k"] == 2 and r["n"] == 6
    assert r["f_e6"] == 13500000


def test_anova_identical_groups_zero_f(spark):
    from smartpy_arc_spark.operators.stats import anova_oneway

    rows = [(g, v) for g in ("a", "b", "c") for v in (1.0, 2.0, 3.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    assert anova_oneway(df, "g", "v").collect()[0]["f_e6"] == 0


def test_anova_zero_within_variance_null(spark):
    """All within-group variance zero → F undefined (NULL), not a crash."""
    from smartpy_arc_spark.operators.stats import anova_oneway

    rows = [("a", 1.0), ("a", 1.0), ("b", 2.0), ("b", 2.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    assert anova_oneway(df, "g", "v").collect()[0]["f_e6"] is None


# ------------------------------------------------- two-proportion z

def test_proportion_ztest_hand_computed(spark):
    from pyspark.sql import functions as F

    from smartpy_arc_spark.operators.stats import proportion_ztest

    rows = [("a", i < 8) for i in range(10)] + [("b", i < 4) for i in range(10)]
    df = spark.createDataFrame(rows, "g string, ok boolean")
    r = proportion_ztest(df, "g", F.col("ok"), "a", "b").collect()[0]
    assert (r["n_a"], r["n_b"]) == (10, 10)
    assert (r["successes_a"], r["successes_b"]) == (8, 4)
    pool = 12 / 20
    se = math.sqrt(pool * (1 - pool) * (1 / 10 + 1 / 10))
    assert r["z_e6"] == round((0.8 - 0.4) / se * 1e6)


def test_proportion_ztest_symmetric_sign_flip(spark):
    from pyspark.sql import functions as F

    from smartpy_arc_spark.operators.stats import proportion_ztest

    rows = [("a", i % 3 == 0) for i in range(30)] + [
        ("b", i % 5 == 0) for i in range(25)
    ]
    df = spark.createDataFrame(rows, "g string, ok boolean")
    ab = proportion_ztest(df, "g", F.col("ok"), "a", "b").collect()[0]
    ba = proportion_ztest(df, "g", F.col("ok"), "b", "a").collect()[0]
    assert abs(ab["z_e6"] + ba["z_e6"]) <= 1


def test_proportion_ztest_equal_rates_zero(spark):
    from pyspark.sql import functions as F

    from smartpy_arc_spark.operators.stats import proportion_ztest

    rows = [("a", i % 2 == 0) for i in range(10)] + [
        ("b", i % 2 == 0) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "g string, ok boolean")
    assert proportion_ztest(df, "g", F.col("ok"), "a", "b").collect()[0][
        "z_e6"
    ] == 0


# ------------------------------------------------- cusum

def test_cusum_hand_computed_shift(spark):
    """Values (1,1,1,11,11,11), mean 6: deviation cumsum bottoms at -15;
    threshold 12 → exactly one crossing, peak deviation 15."""
    from smartpy_arc_spark.operators.stats import cusum_changepoints

    rows = [(1, i, v) for i, v in enumerate([1.0, 1.0, 1.0, 11.0, 11.0, 11.0])]
    df = spark.createDataFrame(rows, "k int, i int, v double")
    r = cusum_changepoints(df, "k", ["i"], "v", threshold=12.0).collect()[0]
    assert r["n_obs"] == 6
    assert r["n_crossings"] == 1
    assert r["max_dev_e4"] == 150000


def test_cusum_stable_series_no_crossings(spark):
    from smartpy_arc_spark.operators.stats import cusum_changepoints

    rows = [(1, i, 5.0) for i in range(10)]
    df = spark.createDataFrame(rows, "k int, i int, v double")
    r = cusum_changepoints(df, "k", ["i"], "v", threshold=0.5).collect()[0]
    assert r["n_crossings"] == 0 and r["max_dev_e4"] == 0


def test_cusum_keys_isolated(spark):
    """A shift in one key never flags a neighbouring stable key."""
    from smartpy_arc_spark.operators.stats import cusum_changepoints

    rows = [(1, i, (0.0 if i < 5 else 100.0)) for i in range(10)]
    rows += [(2, i, 7.0) for i in range(10)]
    df = spark.createDataFrame(rows, "k int, i int, v double")
    got = {
        r["k"]: r
        for r in cusum_changepoints(df, "k", ["i"], "v", threshold=10.0).collect()
    }
    assert got[1]["n_crossings"] > 0
    assert got[2]["n_crossings"] == 0
