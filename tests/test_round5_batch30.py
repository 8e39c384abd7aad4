"""Batch-30: eb_shrinkage, mediation_analysis."""


def test_eb_shrinkage_orders_small_samples(spark):
    from smartpy_arc_spark.operators.stats import eb_shrinkage

    # many informative items + one 1/1 item: the 1/1 rate must shrink
    # strictly below a 97/100 item's shrunk rate
    rows = []
    for i in range(20):
        rows.append((i, 30 + (i % 5), 100))  # rates around 0.3
    rows.append((100, 1, 1))     # raw rate 1.0, tiny sample
    rows.append((101, 97, 100))  # raw rate .97, big sample
    df = spark.createDataFrame(rows, "i long, h long, t long")
    out = {r.i: r for r in eb_shrinkage(df, "i", "h", "t").collect()}
    assert out[100].rate_e6 == 1_000_000
    assert out[100].shrunk_e6 < out[101].shrunk_e6
    # shrinkage pulls toward the prior mean, never past the raw rate
    assert out[100].shrunk_e6 < 1_000_000
    assert out[0].alpha_e6 is not None and out[0].beta_e6 is not None


def test_eb_shrinkage_degenerate_prior_passthrough(spark):
    from smartpy_arc_spark.operators.stats import eb_shrinkage

    # identical rates -> zero variance -> raw rates pass through
    df = spark.createDataFrame(
        [(i, 1, 2) for i in range(5)], "i long, h long, t long"
    )
    out = eb_shrinkage(df, "i", "h", "t").collect()
    assert all(r.shrunk_e6 == r.rate_e6 == 500000 for r in out)
    assert all(r.alpha_e6 is None for r in out)


def test_mediation_full_mediation_recovered(spark):
    import random

    from smartpy_arc_spark.operators.stats import mediation_analysis

    # m = 2x exactly, y = 3m exactly -> full mediation:
    # a = 2, b = 3, c = 6, c' = ... collinear (det=0) -> guarded null
    rows = [(float(x), 2.0 * x, 6.0 * x) for x in range(1, 30)]
    df = spark.createDataFrame(rows, "x double, m double, y double")
    r = mediation_analysis(df, "x", "m", "y", scale=1).collect()[0]
    assert r.a_e6 is None  # perfectly collinear design has det == 0

    # add independent noise to m so the design is full rank
    random.seed(2)
    rows = []
    for x in range(1, 200):
        m = 2.0 * x + random.choice((-1.0, 1.0))
        y = 3.0 * m
        rows.append((float(x), m, y))
    df = spark.createDataFrame(rows, "x double, m double, y double")
    r = mediation_analysis(df, "x", "m", "y", scale=1).collect()[0]
    assert abs(r.a_e6 / 1e6 - 2.0) < 0.01
    assert abs(r.b_e6 / 1e6 - 3.0) < 0.01
    assert abs(r.c_prime_e6) < 10000  # no direct effect
    assert abs(r.prop_mediated_e6 - 1_000_000) < 20000
    assert r.sobel_z_e6 > 3_000_000  # strongly significant


def test_mediation_no_mediation(spark):
    import random

    from smartpy_arc_spark.operators.stats import mediation_analysis

    # m independent of x; y depends only on x -> a ~ 0, indirect ~ 0
    random.seed(3)
    rows = [
        (float(x), random.uniform(0, 10), 5.0 * x + random.uniform(-1, 1))
        for x in range(1, 200)
    ]
    df = spark.createDataFrame(rows, "x double, m double, y double")
    r = mediation_analysis(df, "x", "m", "y", scale=100).collect()[0]
    assert abs(r.a_e6) < 30000
    assert abs(r.indirect_e6) < 30000
    assert abs(r.c_e6 / 1e6 - 5.0) < 0.05
