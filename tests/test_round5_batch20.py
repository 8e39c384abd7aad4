"""Batch-20 eval/distribution operators: ir_eval, wasserstein_1d,
js_divergence, ridge_2f."""


def test_ir_eval_hand_case(spark):
    from smartpy_arc_spark.operators.itemsets import ir_eval

    # ranks by score desc: rel pattern [1,0,1,0,0], k=3
    rows = [
        ("g", 50.0, 1, 1),
        ("g", 40.0, 2, 0),
        ("g", 30.0, 3, 1),
        ("g", 20.0, 4, 0),
        ("g", 10.0, 5, 0),
    ]
    df = spark.createDataFrame(rows, "g string, score double, id int, rel int")
    r = ir_eval(df, "g", "score", "rel", "id", k=3).collect()[0]
    assert r.n_items == 5 and r.n_rel == 2
    assert r.rr_e6 == 1_000_000  # first item relevant
    # AP@3 = (1/1 + 2/3)/min(2,3) -> (1000000 + 666667)/2
    assert r.ap_e6 == 833334
    assert r.p_at_k_e6 == 666667 and r.r_at_k_e6 == 1_000_000


def test_ir_eval_no_relevant(spark):
    from smartpy_arc_spark.operators.itemsets import ir_eval

    rows = [("g", 50.0, 1, 0), ("g", 40.0, 2, 0)]
    df = spark.createDataFrame(rows, "g string, score double, id int, rel int")
    r = ir_eval(df, "g", "score", "rel", "id", k=3).collect()[0]
    assert r.rr_e6 == 0 and r.ap_e6 is None and r.r_at_k_e6 is None


def test_wasserstein_known_distance(spark):
    from smartpy_arc_spark.operators.stats import wasserstein_1d

    rows = [("a", 0.0), ("a", 2.0), ("b", 1.0), ("b", 1.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = wasserstein_1d(df, "g", "v", "a", "b").collect()[0]
    # EMD between {0,2} and {1,1} is exactly 1.0
    assert r.n_a == 2 and r.n_b == 2 and r.w1_e6 == 1_000_000


def test_wasserstein_identical_zero(spark):
    from smartpy_arc_spark.operators.stats import wasserstein_1d

    rows = [("a", v) for v in (1.0, 5.0, 9.0)] + [
        ("b", v) for v in (1.0, 5.0, 9.0)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    assert wasserstein_1d(df, "g", "v", "a", "b").collect()[0].w1_e6 == 0


def test_js_divergence_identical_mix_zero(spark):
    from smartpy_arc_spark.operators.stats import js_divergence

    rows = []
    for g in ("s1", "s2"):
        rows += [(g, "en")] * 3 + [(g, "fr")] * 1
    df = spark.createDataFrame(rows, "g string, c string")
    out = js_divergence(df, "g", "c").collect()
    assert all(r.kl_e9 == 0 and r.js_e9 == 0 for r in out)


def test_js_divergence_skewed_positive_bounded(spark):
    import math

    from smartpy_arc_spark.operators.stats import js_divergence

    rows = [("s1", "en")] * 9 + [("s1", "fr")] * 1 + [("s2", "fr")] * 9 + [
        ("s2", "en")
    ] * 1
    df = spark.createDataFrame(rows, "g string, c string")
    out = {r.g: r for r in js_divergence(df, "g", "c").collect()}
    for r in out.values():
        assert 0 < r.js_e9 <= round(math.log(2) * 1e9)
        assert r.kl_e9 > 0
    # symmetric construction -> equal divergences
    assert out["s1"].js_e9 == out["s2"].js_e9


def test_ridge_lambda_zero_recovers_exact_fit(spark):
    from smartpy_arc_spark.operators.stats import ridge_2f

    pts = [(1.0, 0.0), (0.0, 1.0), (1.0, 1.0), (2.0, 1.0)]
    rows = [(x1, x2, 2 * x1 + 3 * x2) for x1, x2 in pts]
    df = spark.createDataFrame(rows, "x1 double, x2 double, y double")
    r = ridge_2f(df, "x1", "x2", "y", lam=0, scale=1).collect()[0]
    assert r.det_ok == 1
    assert r.beta1_e6 == 2_000_000 and r.beta2_e6 == 3_000_000


def test_ridge_shrinks_toward_zero(spark):
    from smartpy_arc_spark.operators.stats import ridge_2f

    pts = [(1.0, 0.0), (0.0, 1.0), (1.0, 1.0), (2.0, 1.0)]
    rows = [(x1, x2, 2 * x1 + 3 * x2) for x1, x2 in pts]
    df = spark.createDataFrame(rows, "x1 double, x2 double, y double")
    r0 = ridge_2f(df, "x1", "x2", "y", lam=0, scale=1).collect()[0]
    r1 = ridge_2f(df, "x1", "x2", "y", lam=10, scale=1).collect()[0]
    assert 0 < r1.beta1_e6 < r0.beta1_e6
    assert 0 < r1.beta2_e6 < r0.beta2_e6
