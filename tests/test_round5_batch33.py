"""Batch-33: make_lag_features, trend_test, mcnemar_test."""


def test_lag_features_exact_values(spark):
    from smartpy_arc_spark.operators.features import make_lag_features

    import datetime

    d0 = datetime.date(2020, 1, 5)  # a Sunday
    rows = [
        ("k", d0 + datetime.timedelta(days=i), float(10 * (i + 1)))
        for i in range(10)
    ]
    df = spark.createDataFrame(rows, "k string, d date, v double")
    out = {r.d.day: r for r in make_lag_features(df, "k", "d", "v", scale=1).collect()}
    r = out[14]  # 10th day: value 100
    assert r.y == 100 and r.lag_1 == 90 and r.lag_7 == 30
    # 7-day mean of 40..100 = 70
    assert r.rmean7_e4 == 700000 and r.n7 == 7
    # 28-day window only has 10 rows: mean 10..100 = 55
    assert r.rmean28_e4 == 550000 and r.n28 == 10
    assert out[5].dow == 1 and out[5].lag_1 is None  # Sunday, first row


def test_trend_test_monotone_adoption(spark):
    from smartpy_arc_spark.operators.stats import trend_test

    rows = []
    for g, rate in (("a", 1), ("b", 5), ("c", 9)):
        rows += [(g, 1)] * rate + [(g, 0)] * (10 - rate)
    df = spark.createDataFrame(rows, "g string, y int")
    r = trend_test(df, "g", "y", {"a": 1, "b": 2, "c": 3}).collect()[0]
    assert r.n == 30 and r.n_hits == 15
    assert r.z_e6 > 3_000_000  # strong upward trend
    rev = trend_test(df, "g", "y", {"a": 3, "b": 2, "c": 1}).collect()[0]
    assert rev.z_e6 == -r.z_e6  # reversing scores flips the sign


def test_trend_test_flat_zero(spark):
    from smartpy_arc_spark.operators.stats import trend_test

    rows = []
    for g in ("a", "b", "c"):
        rows += [(g, 1)] * 5 + [(g, 0)] * 5
    df = spark.createDataFrame(rows, "g string, y int")
    r = trend_test(df, "g", "y", {"a": 1, "b": 2, "c": 3}).collect()[0]
    assert r.num == 0 and r.z_e6 == 0


def test_mcnemar_hand_counts(spark):
    from smartpy_arc_spark.operators.stats import mcnemar_test

    # 3 stay-1, 2 stay-0, b=4 drop (1->0), c=1 gain (0->1)
    rows = (
        [(1, 1)] * 3 + [(0, 0)] * 2 + [(1, 0)] * 4 + [(0, 1)] * 1
    )
    df = spark.createDataFrame(rows, "p int, q int")
    r = mcnemar_test(df, "p", "q").collect()[0]
    assert r.n_pairs == 10 and r.b == 4 and r.c == 1
    assert r.chi2_e6 == round(9 / 5 * 1e6)
    assert r.chi2_cc_e6 == round(4 / 5 * 1e6)


def test_mcnemar_no_discordance_null(spark):
    from smartpy_arc_spark.operators.stats import mcnemar_test

    df = spark.createDataFrame([(1, 1), (0, 0)], "p int, q int")
    r = mcnemar_test(df, "p", "q").collect()[0]
    assert r.chi2_e6 is None
