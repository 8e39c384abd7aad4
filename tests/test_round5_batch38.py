"""Batch-38: fleiss_kappa, chi_square_residuals, feature_mi_ranking."""


def test_fleiss_perfect_agreement(spark):
    from smartpy_arc_spark.operators.stats import fleiss_kappa

    # 6 items, 3 raters each, all raters agree per item
    rows = []
    for i in range(6):
        cat = "x" if i % 2 == 0 else "y"
        rows += [(i, cat)] * 3
    df = spark.createDataFrame(rows, "i long, r string")
    k = fleiss_kappa(df, "i", "r").collect()[0]
    assert k.n_items == 6 and k.n_raters == 3 and k.n_excluded == 0
    assert k.pbar_e6 == 1_000_000 and k.kappa_e6 == 1_000_000


def test_fleiss_modal_n_excludes_odd_items(spark):
    from smartpy_arc_spark.operators.stats import fleiss_kappa

    rows = []
    for i in range(5):
        rows += [(i, "x")] * 3  # 5 items with 3 raters
    rows += [(99, "x")] * 2  # one item with only 2 raters
    df = spark.createDataFrame(rows, "i long, r string")
    k = fleiss_kappa(df, "i", "r").collect()[0]
    assert k.n_items == 5 and k.n_raters == 3 and k.n_excluded == 1


def test_fleiss_textbook_value(spark):
    from smartpy_arc_spark.operators.stats import fleiss_kappa

    # 2 items, 2 raters: item0 agrees on x, item1 splits x/y
    rows = [(0, "x"), (0, "x"), (1, "x"), (1, "y")]
    df = spark.createDataFrame(rows, "i long, r string")
    k = fleiss_kappa(df, "i", "r").collect()[0]
    # P1 = 1, P2 = 0 -> pbar = .5; p_x = 3/4, p_y = 1/4 -> pe = 10/16
    assert k.pbar_e6 == 500000 and k.pe_e6 == 625000
    assert k.kappa_e6 == round((0.5 - 0.625) / 0.375 * 1e6)


def test_chi_square_residuals_independence_zero(spark):
    from smartpy_arc_spark.operators.stats import chi_square_residuals

    # perfectly independent 2x2 with equal margins: O == E everywhere
    rows = (
        [("a", "p")] * 4 + [("a", "q")] * 4 + [("b", "p")] * 4 + [("b", "q")] * 4
    )
    df = spark.createDataFrame(rows, "x string, y string")
    out = chi_square_residuals(df, "x", "y").collect()
    assert all(r.resid_e6 == 0 and r.flagged == 0 for r in out)


def test_chi_square_residuals_flags_association(spark):
    from smartpy_arc_spark.operators.stats import chi_square_residuals

    rows = [("a", "p")] * 30 + [("b", "q")] * 30 + [("a", "q")] * 2 + [
        ("b", "p")
    ] * 2
    df = spark.createDataFrame(rows, "x string, y string")
    out = {(r.a, r.b): r for r in chi_square_residuals(df, "x", "y").collect()}
    assert out[("a", "p")].flagged == 1 and out[("a", "p")].resid_e6 > 0
    assert out[("a", "q")].flagged == 1 and out[("a", "q")].resid_e6 < 0


def test_feature_mi_ranking_runs(spark):
    import __spark_entry__ as entry

    out = entry.queries()["feature_mi_ranking"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    feats = {r.feature: r for r in out}
    assert set(feats) == {"priority", "year", "price_band"}
    assert all(r.n == out[0].n for r in out)  # same corpus size


def test_simpson_planted_reversal(spark):
    from smartpy_arc_spark.operators.stats import simpson_check

    # classic construction: within each stratum x HURTS y, but x
    # concentrates in the high-y stratum so the pooled table flips
    rows = []
    rows += [("s1", 1, 1)] * 18 + [("s1", 1, 0)] * 2   # x=1: 90%
    rows += [("s1", 0, 1)] * 10 + [("s1", 0, 0)] * 0   # x=0: 100%
    rows += [("s2", 1, 1)] * 2 + [("s2", 1, 0)] * 8    # x=1: 20%
    rows += [("s2", 0, 1)] * 9 + [("s2", 0, 0)] * 21   # x=0: 30%
    df = spark.createDataFrame(rows, "g string, x int, y int")
    r = simpson_check(df, "g", "x", "y").collect()[0]
    assert r.n_strata == 2 and r.n_neg == 2 and r.n_pos == 0
    assert r.overall_sign == 1 and r.reversed == 1


def test_simpson_consistent_no_flag(spark):
    from smartpy_arc_spark.operators.stats import simpson_check

    rows = []
    for g in ("s1", "s2"):
        rows += [(g, 1, 1)] * 8 + [(g, 1, 0)] * 2
        rows += [(g, 0, 1)] * 2 + [(g, 0, 0)] * 8
    df = spark.createDataFrame(rows, "g string, x int, y int")
    r = simpson_check(df, "g", "x", "y").collect()[0]
    assert r.overall_sign == 1 and r.n_pos == 2 and r.reversed == 0


def test_wilson_ci_properties(spark):
    from smartpy_arc_spark.operators.stats import wilson_ci

    rows = [("a", 1)] * 9 + [("a", 0)] * 1 + [("b", 1)] * 1 + [("b", 0)] * 1
    df = spark.createDataFrame(rows, "g string, y int")
    out = {r.g: r for r in wilson_ci(df, "g", "y").collect()}
    a, b = out["a"], out["b"]
    assert a.p_e6 == 900000
    # interval inside [0, 1] and contains p-hat
    for r in (a, b):
        assert 0 <= r.lo_e6 <= r.p_e6 <= r.hi_e6 <= 1_000_000
    # tiny sample -> much wider interval
    assert (b.hi_e6 - b.lo_e6) > (a.hi_e6 - a.lo_e6)
    # Wilson 9/10 reference: (0.596, 0.982)
    assert abs(a.lo_e6 - 595851) < 2000 and abs(a.hi_e6 - 982113) < 2000


def test_mantel_haenszel_textbook(spark):
    from smartpy_arc_spark.operators.stats import mantel_haenszel

    # two identical strata, OR = (6*6)/(2*2) = 9 in each -> OR_MH = 9
    rows = []
    for g in ("s1", "s2"):
        rows += [(g, 1, 1)] * 6 + [(g, 1, 0)] * 2
        rows += [(g, 0, 1)] * 2 + [(g, 0, 0)] * 6
    df = spark.createDataFrame(rows, "g string, x int, y int")
    r = mantel_haenszel(df, "g", "x", "y").collect()[0]
    assert r.n == 32 and r.n_strata == 2
    assert r.or_mh_e6 == 9_000_000
    import math

    assert abs(r.ln_or_e6 - round(math.log(9) * 1e6)) <= 1
    assert r.cmh_e6 > 0


def test_mantel_haenszel_null_association(spark):
    from smartpy_arc_spark.operators.stats import mantel_haenszel

    rows = []
    for g in ("s1", "s2"):
        rows += [(g, 1, 1)] * 4 + [(g, 1, 0)] * 4
        rows += [(g, 0, 1)] * 4 + [(g, 0, 0)] * 4
    df = spark.createDataFrame(rows, "g string, x int, y int")
    r = mantel_haenszel(df, "g", "x", "y").collect()[0]
    assert r.or_mh_e6 == 1_000_000 and r.ln_or_e6 == 0
    assert r.cmh_e6 == 0


def test_contingency_effects_textbook(spark):
    from smartpy_arc_spark.operators.stats import contingency_effects

    rows = (
        [("a", "p")] * 10 + [("a", "q")] * 20
        + [("b", "p")] * 20 + [("b", "q")] * 10
    )
    df = spark.createDataFrame(rows, "x string, y string")
    r = contingency_effects(df, "x", "y").collect()[0]
    # chi2 = 4 * 300^2/(60*900) = 20/3; V = sqrt(chi2/60) = 1/3
    assert r.dof == 1 and abs(r.chi2_e6 - round(20 / 3 * 1e6)) <= 4
    assert abs(r.cramers_v_e6 - 333333) <= 1
    assert r.g_e6 > r.chi2_e6  # G slightly exceeds chi2 here


def test_contingency_effects_independent_zero(spark):
    from smartpy_arc_spark.operators.stats import contingency_effects

    rows = []
    for x in ("a", "b"):
        rows += [(x, "p")] * 6 + [(x, "q")] * 3
    df = spark.createDataFrame(rows, "x string, y string")
    r = contingency_effects(df, "x", "y").collect()[0]
    assert r.chi2_e6 == 0 and r.g_e6 == 0 and r.cramers_v_e6 == 0


def test_kish_ess_uniform_weights_full(spark):
    from smartpy_arc_spark.operators.stats import kish_ess

    df = spark.createDataFrame([("g", 5.0)] * 8, "g string, w double")
    r = kish_ess(df, "g", "w").collect()[0]
    assert r.n == 8 and r.ess_e2 == 800 and r.deff_e6 == 1_000_000


def test_kish_ess_concentrated_weights_shrink(spark):
    from smartpy_arc_spark.operators.stats import kish_ess

    # one dominant weight: ESS -> ~1
    rows = [("g", 1000.0)] + [("g", 1.0)] * 9
    df = spark.createDataFrame(rows, "g string, w double")
    r = kish_ess(df, "g", "w").collect()[0]
    assert r.ess_e2 < 110 and r.deff_e6 > 9_000_000


def test_ljung_box_alternating_series(spark):
    from smartpy_arc_spark.operators.stats import ljung_box

    # strong negative lag-1 autocorrelation
    vals = [10.0 if i % 2 else 20.0 for i in range(60)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "t int, v double"
    )
    r = ljung_box(df, "t", "v", max_lag=3, scale=1).collect()[0]
    assert r.rho1_e6 < -900000 and r.rho2_e6 > 900000
    assert r.q_e6 > 50_000_000  # wildly non-white


def test_ljung_box_constant_series_null(spark):
    from smartpy_arc_spark.operators.stats import ljung_box

    df = spark.createDataFrame(
        [(i, 5.0) for i in range(30)], "t int, v double"
    )
    r = ljung_box(df, "t", "v", max_lag=3, scale=1).collect()[0]
    assert r.q_e6 is None  # zero variance -> undefined


def test_cluster_agreement_perfect(spark):
    from smartpy_arc_spark.operators.stats import cluster_agreement

    rows = [("c1", "x")] * 5 + [("c2", "y")] * 5
    df = spark.createDataFrame(rows, "c string, l string")
    r = cluster_agreement(df, "c", "l").collect()[0]
    assert r.purity_e6 == 1_000_000 and r.nmi_e6 == 1_000_000


def test_cluster_agreement_independent_zero(spark):
    from smartpy_arc_spark.operators.stats import cluster_agreement

    rows = []
    for c in ("c1", "c2"):
        rows += [(c, "x")] * 3 + [(c, "y")] * 3
    df = spark.createDataFrame(rows, "c string, l string")
    r = cluster_agreement(df, "c", "l").collect()[0]
    assert r.mi_e9 == 0 and r.nmi_e6 == 0
    assert r.purity_e6 == 500000  # best label covers half of each cluster


def test_cluster_agreement_single_label_null_nmi(spark):
    from smartpy_arc_spark.operators.stats import cluster_agreement

    rows = [("c1", "x")] * 3 + [("c2", "x")] * 3
    df = spark.createDataFrame(rows, "c string, l string")
    r = cluster_agreement(df, "c", "l").collect()[0]
    assert r.purity_e6 == 1_000_000 and r.nmi_e6 is None  # H(L) = 0


def test_theil_equal_values_zero(spark):
    from smartpy_arc_spark.operators.stats import theil_index

    rows = [("a", 10.0)] * 4 + [("b", 10.0)] * 4
    df = spark.createDataFrame(rows, "g string, v double")
    r = theil_index(df, "g", "v").collect()[0]
    assert r.t_total_e9 == 0 and r.t_between_e9 == 0 and r.t_within_e9 == 0


def test_theil_decomposition_adds_up(spark):
    import math

    from smartpy_arc_spark.operators.stats import theil_index

    rows = [("a", 10.0), ("a", 30.0), ("b", 20.0), ("b", 60.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = theil_index(df, "g", "v").collect()[0]
    vals = [10.0, 30.0, 20.0, 60.0]
    mu = sum(vals) / 4
    t_ref = sum(v / sum(vals) * math.log(v / mu) for v in vals)
    assert abs(r.t_total_e9 / 1e9 - t_ref) < 1e-6
    # decomposition identity to the rounding unit
    assert abs(r.t_total_e9 - (r.t_between_e9 + r.t_within_e9)) <= 5
    assert r.t_between_e9 > 0 and r.t_within_e9 > 0


def test_theil_between_only(spark):
    from smartpy_arc_spark.operators.stats import theil_index

    # no within-group inequality: all inequality is between groups
    rows = [("a", 10.0)] * 3 + [("b", 40.0)] * 3
    df = spark.createDataFrame(rows, "g string, v double")
    r = theil_index(df, "g", "v").collect()[0]
    assert r.t_within_e9 == 0 and r.t_between_e9 > 0
    assert abs(r.t_between_e9 - r.t_total_e9) <= 1  # nanonat rounding


def test_theil_single_upstream_pass(spark, sf_dir):
    """r11: all three term passes must read the materialized base — the
    upstream may appear ZERO times in the final plan (it used to run 8×)."""
    from pyspark.sql import functions as F

    from smartpy_arc_spark.operators.stats import theil_index

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_mktsegment").alias("g"), F.col("c_acctbal").alias("v")
    )
    out = theil_index(cust, "g", "v")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Scan parquet" not in plan
