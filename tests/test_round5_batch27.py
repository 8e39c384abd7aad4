"""Batch-27: kfold_regression, sketch_eval bounds, stream_topk."""


def test_kfold_exact_linear_all_folds_agree(spark):
    from smartpy_arc_spark.operators.stats import kfold_regression

    rows = [(i, float(i % 50), 3.0 * (i % 50) + 7.0) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    out = kfold_regression(df, "id", "x", "y", k=5, scale=1).collect()
    assert len(out) == 5
    assert all(r.slope_e6 == 3_000_000 for r in out)
    assert all(r.intercept_e4 == 70_000 for r in out)
    assert all(r.n_train == 160 for r in out)


def test_kfold_leave_out_changes_fit(spark):
    from smartpy_arc_spark.operators.stats import kfold_regression

    # fold 0 rows carry a different slope -> its leave-out fit is clean
    rows = []
    for i in range(100):
        x = float(i % 20)
        y = (10.0 * x) if i % 5 == 0 else (2.0 * x)
        rows.append((i, x, y))
    df = spark.createDataFrame(rows, "id long, x double, y double")
    out = {r.fold: r for r in kfold_regression(df, "id", "x", "y", k=5, scale=1).collect()}
    assert out[0].slope_e6 == 2_000_000  # outlier fold excluded
    assert all(out[f].slope_e6 > 2_000_000 for f in (1, 2, 3, 4))


def test_sketch_eval_bounds_hold(spark):
    import __spark_entry__ as entry

    r = entry.queries()["sketch_eval"](
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert r.nd_within_3rsd == 1  # 2% rsd sketch within 3 sigma
    assert r.p50_within_1pct == 1
    assert r.nd_exact > 0 and r.p50_exact_cents > 0


def test_stream_topk_rank_semantics(spark):
    import __spark_entry__ as entry

    out = entry.queries()["stream_topk"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(out) > 0
    by_window = {}
    for r in out:
        by_window.setdefault(r.window_start, []).append(r)
    for rows in by_window.values():
        assert 1 <= len(rows) <= 2
        assert sorted(r.rk for r in rows) == list(range(1, len(rows) + 1))
        if len(rows) == 2:
            a = next(r for r in rows if r.rk == 1)
            b = next(r for r in rows if r.rk == 2)
            assert (a.n_events, b.event_type) >= (b.n_events, a.event_type)
