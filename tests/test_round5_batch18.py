"""Batch-18 market-series operators: vwap, bollinger, rsi, macd,
market_beta, sharpe_ratio — closed-form hand checks."""

from pyspark.sql import functions as F


def test_vwap_weighted_average(spark):
    from smartpy_arc_spark.operators.resample import vwap

    df = spark.createDataFrame(
        [("a", 10.0, 2.0), ("a", 20.0, 2.0), ("b", 5.0, 1.0)],
        "g string, price double, qty double",
    )
    rows = {r.g: r for r in vwap(df, "g", "price", "qty").collect()}
    # a: (1000*2 + 2000*2)/4 = 1500 cents -> 15.0 -> e4 150000
    assert rows["a"].vwap_e4 == 150000 and rows["a"].total_qty == 4
    assert rows["b"].vwap_e4 == 50000 and rows["b"].n_obs == 1


def test_vwap_zero_volume_null(spark):
    from smartpy_arc_spark.operators.resample import vwap

    df = spark.createDataFrame([("a", 10.0, 0.0)], "g string, price double, qty double")
    assert vwap(df, "g", "price", "qty").collect()[0].vwap_e4 is None


def test_bollinger_constant_series_zero_sd(spark):
    from smartpy_arc_spark.operators.resample import bollinger_bands

    df = spark.createDataFrame(
        [(i, 10.0) for i in range(25)], "t int, v double"
    )
    out = bollinger_bands(df, "t", "v", window=20, width=2, scale=1).collect()
    assert all(r.sd_e4 == 0 and r.mid_e4 == 100000 for r in out)
    assert all(r.outside == 0 for r in out)
    assert out[-1].n_window == 20 and out[0].n_window == 1


def test_bollinger_spike_flagged_outside(spark):
    from smartpy_arc_spark.operators.resample import bollinger_bands

    rows = [(i, 10.0) for i in range(24)] + [(24, 100.0)]
    df = spark.createDataFrame(rows, "t int, v double")
    out = {r.t: r for r in bollinger_bands(df, "t", "v", window=20, width=2, scale=1).collect()}
    assert out[24].outside == 1 and out[23].outside == 0
    assert out[24].upper_e4 == out[24].mid_e4 + 2 * out[24].sd_e4


def test_rsi_monotonic_extremes(spark):
    from smartpy_arc_spark.operators.resample import rsi

    up = [("u", i, float(i)) for i in range(20)]
    down = [("d", i, float(100 - i)) for i in range(20)]
    df = spark.createDataFrame(up + down, "k string, t int, v double")
    rows = {r.k: r for r in rsi(df, "k", "t", "v", period=14).collect()}
    assert rows["u"].rsi_e4 == 1_000_000  # all gains -> RSI 100
    assert rows["d"].rsi_e4 == 0  # all losses -> RSI 0
    assert rows["u"].avg_gain_e4 == 10000 and rows["u"].avg_loss_e4 == 0


def test_rsi_short_series_null(spark):
    from smartpy_arc_spark.operators.resample import rsi

    df = spark.createDataFrame(
        [("k", i, float(i)) for i in range(10)], "k string, t int, v double"
    )
    r = rsi(df, "k", "t", "v", period=14).collect()[0]
    assert r.rsi_e4 is None and r.n_obs == 10


def test_macd_constant_series_zero(spark):
    from smartpy_arc_spark.operators.resample import macd

    df = spark.createDataFrame(
        [("k", i, 50.0) for i in range(40)], "k string, t int, v double"
    )
    r = macd(df, "k", "t", "v").collect()[0]
    assert r.macd_e4 == 0 and r.signal_e4 == 0 and r.hist_e4 == 0


def test_macd_uptrend_positive(spark):
    from smartpy_arc_spark.operators.resample import macd

    df = spark.createDataFrame(
        [("k", i, float(i)) for i in range(60)], "k string, t int, v double"
    )
    r = macd(df, "k", "t", "v").collect()[0]
    # fast EMA tracks an uptrend more closely than slow -> positive MACD
    assert r.macd_e4 > 0


def test_market_beta_identity_and_share(spark):
    from smartpy_arc_spark.operators.stats import market_beta

    # two keys, y = 2x at every grid point: market m = 3x;
    # beta_x = cov(x,3x)/var(3x) = 1/3, beta_y = 2/3, corr = 1
    rows = []
    for i, v in enumerate([10.0, 20.0, 30.0, 40.0, 50.0]):
        rows.append(("x", i, v))
        rows.append(("y", i, 2 * v))
    df = spark.createDataFrame(rows, "k string, t int, v double")
    out = {r.k: r for r in market_beta(df, "k", "t", "v", scale=1).collect()}
    assert out["x"].beta_e6 == 333333 and out["y"].beta_e6 == 666667
    assert out["x"].corr_e6 == 1_000_000 and out["y"].corr_e6 == 1_000_000
    assert out["x"].alpha_e4 == 0


def test_market_beta_flat_market_null(spark):
    from smartpy_arc_spark.operators.stats import market_beta

    df = spark.createDataFrame(
        [("x", i, 10.0) for i in range(5)], "k string, t int, v double"
    )
    assert market_beta(df, "k", "t", "v", scale=1).collect()[0].beta_e6 is None


def test_sharpe_constant_growth_zero_sd(spark):
    from smartpy_arc_spark.operators.stats import sharpe_ratio

    # 10% growth every period: identical returns -> sd 0 -> null ratio
    df = spark.createDataFrame(
        [("k", 0, 100.0), ("k", 1, 110.0), ("k", 2, 121.0)],
        "k string, t int, v double",
    )
    r = sharpe_ratio(df, "k", "t", "v", scale=1).collect()[0]
    assert r.n_returns == 2 and r.mean_ret_e6 == 100000
    assert r.sd_ret_e6 == 0 and r.sharpe_e4 is None


def test_sharpe_sign_and_annualization(spark):
    from smartpy_arc_spark.operators.stats import sharpe_ratio

    vals = [100.0, 105.0, 103.0, 108.0, 107.0, 112.0]
    df = spark.createDataFrame(
        [("k", i, v) for i, v in enumerate(vals)], "k string, t int, v double"
    )
    r = sharpe_ratio(df, "k", "t", "v", scale=1).collect()[0]
    assert r.sharpe_e4 is not None and r.sharpe_e4 > 0
    # annualized = sharpe * sqrt(252): ratio ~ 15.87
    assert abs(r.sharpe_ann_e4 / r.sharpe_e4 - 252 ** 0.5) < 0.01
