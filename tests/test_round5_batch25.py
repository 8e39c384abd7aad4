"""Batch-25: forecast_eval scorecard + grubbs_statistic."""


def test_forecast_eval_perfect_forecast(spark):
    from smartpy_arc_spark.operators.resample import forecast_eval

    rows = [("k", i, 10.0 + i, 10.0 + i) for i in range(10)]
    df = spark.createDataFrame(rows, "k string, t int, a double, f double")
    r = forecast_eval(df, "k", "t", "a", "f", scale=1).collect()[0]
    assert r.mae_e4 == 0 and r.rmse_e4 == 0 and r.mape_e6 == 0
    assert r.smape_e6 == 0 and r.mase_e6 == 0 and r.pinball90_e4 == 0


def test_forecast_eval_hand_errors(spark):
    from smartpy_arc_spark.operators.resample import forecast_eval

    # actuals 10,20,30,40; forecasts 12,18,30,44
    # errors: -2,+2,0,-4 -> MAE = 2, RMSE = sqrt(24/4)
    rows = [
        ("k", 0, 10.0, 12.0),
        ("k", 1, 20.0, 18.0),
        ("k", 2, 30.0, 30.0),
        ("k", 3, 40.0, 44.0),
    ]
    df = spark.createDataFrame(rows, "k string, t int, a double, f double")
    r = forecast_eval(df, "k", "t", "a", "f", scale=1).collect()[0]
    assert r.n_scored == 4 and r.mae_e4 == 20000
    assert r.rmse_e4 == round((24 / 4) ** 0.5 * 10000)
    # MAPE terms: .2, .1, 0, .1 -> mean .1
    assert r.mape_e6 == 100000
    # naive lag-1 MAE = 10 -> MASE = 2/10
    assert r.mase_e6 == 200000
    # pinball .9: under-forecasts (a>f): e=+2 -> 9*2; over: e=-2,-4 -> 2+4
    # 10L_sum = 18 + 6 = 24 -> mean L = 24/40 = 0.6
    assert r.pinball90_e4 == 6000


def test_forecast_eval_null_forecasts_excluded(spark):
    from smartpy_arc_spark.operators.resample import forecast_eval

    rows = [("k", 0, 10.0, None), ("k", 1, 20.0, 25.0)]
    df = spark.createDataFrame(rows, "k string, t int, a double, f double")
    r = forecast_eval(df, "k", "t", "a", "f", scale=1).collect()[0]
    assert r.n_scored == 1 and r.mae_e4 == 50000


def test_forecast_eval_single_pass_and_key_drop(spark):
    """r11: the merged one-pass form must (a) drop keys with zero scored
    rows exactly as the former aggregate-side join did, (b) keep the
    mixed-key numbers identical, and (c) plan without any join."""
    from smartpy_arc_spark.operators.resample import forecast_eval

    rows = [
        # key "u": every forecast null -> must NOT appear in the output
        ("u", 0, 10.0, None),
        ("u", 1, 12.0, None),
        # key "k": one scored row among nulls (n_scored=1), naive from
        # the FULL actual series (lag errs 10, 10 -> naive MAE 10)
        ("k", 0, 10.0, None),
        ("k", 1, 20.0, 25.0),
        ("k", 2, 30.0, None),
    ]
    df = spark.createDataFrame(rows, "k string, t int, a double, f double")
    out = forecast_eval(df, "k", "t", "a", "f", scale=1)
    got = {r.k: r for r in out.collect()}
    assert set(got) == {"k"}
    r = got["k"]
    assert r.n_scored == 1 and r.mae_e4 == 50000
    # MASE = 5 / 10 (naive MAE over the whole series incl. unscored rows)
    assert r.mase_e6 == 500000
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # one grouped pass, no per-key join


def test_grubbs_flags_planted_outlier(spark):
    from smartpy_arc_spark.operators.stats import grubbs_statistic

    vals = [10.0] * 20 + [100.0]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "t int, v double"
    )
    r = grubbs_statistic(df, "t", "v", scale=1).collect()[0]
    assert r.outlier_ts == 20 and r.outlier_e4 == 1_000_000
    # G for a planted single outlier: (100 - mean)/sd
    import statistics

    mean = statistics.mean(vals)
    sd = statistics.stdev(vals)
    assert abs(r.g_e6 / 1e6 - (100 - mean) / sd) < 1e-4
    assert r.mean_e4 == round(mean * 10000)


def test_grubbs_tie_earliest_ts(spark):
    from smartpy_arc_spark.operators.stats import grubbs_statistic

    # symmetric extremes: equal deviation -> earliest ts wins
    df = spark.createDataFrame(
        [(0, 0.0), (1, 10.0), (2, 20.0)], "t int, v double"
    )
    r = grubbs_statistic(df, "t", "v", scale=1).collect()[0]
    assert r.outlier_ts == 0
