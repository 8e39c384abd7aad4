"""Batch-24: XML roundtrip via scan(), overdispersion_fit, var_cvar."""


def test_xml_scan_roundtrip_exact(spark, tmp_path):
    import os

    from smartpy_arc_spark.sources.scan import scan

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", -2.25), (3, None, 0.0)],
        "id long, tag string, v double",
    )
    df.write.format("xml").option("rowTag", "row").mode("overwrite").save(
        os.path.join(str(tmp_path), "t.xml")
    )
    back = scan(
        spark,
        str(tmp_path),
        "t",
        fmt="xml",
        schema="id long, tag string, v double",
    )
    got = sorted((r.id, r.tag, r.v) for r in back.collect())
    assert got == [(1, "a", 1.5), (2, "b", -2.25), (3, None, 0.0)]


def test_overdispersion_poisson_like_no_nb(spark):
    from smartpy_arc_spark.operators.stats import overdispersion_fit

    # constant counts: var 0 < mean -> NB undefined, dispersion 0
    df = spark.createDataFrame(
        [("g", 4)] * 6, "g string, c long"
    )
    r = overdispersion_fit(df, "g", "c").collect()[0]
    assert r.mean_e6 == 4_000_000 and r.var_e6 == 0
    assert r.dispersion_e6 == 0 and r.nb_r_e6 is None


def test_overdispersion_nb_moments_recovered(spark):
    from smartpy_arc_spark.operators.stats import overdispersion_fit

    # counts 0,0,2,2,6,8: mean = 3, sample var = 54/5 = 10.8
    df = spark.createDataFrame(
        [("g", c) for c in (0, 0, 2, 2, 6, 8)], "g string, c long"
    )
    r = overdispersion_fit(df, "g", "c").collect()[0]
    assert r.mean_e6 == 3_000_000
    assert r.var_e6 == round(10.8 * 1e6)
    assert r.dispersion_e6 == round(10.8 / 3 * 1e6)
    assert r.nb_r_e6 == round(9 / 7.8 * 1e6)
    assert r.nb_p_e6 == round(3 / 10.8 * 1e6)


def test_var_cvar_hand_series(spark):
    from smartpy_arc_spark.operators.stats import var_cvar

    # changes: -50, +10, -30, +20, -10, +5, +5, -20, +40, +15
    vals = [100.0]
    for c in (-50, 10, -30, 20, -10, 5, 5, -20, 40, 15):
        vals.append(vals[-1] + c)
    df = spark.createDataFrame(
        [("k", i, v) for i, v in enumerate(vals)], "k string, t int, v double"
    )
    r = var_cvar(df, "k", "t", "v", tail_den=5, scale=1).collect()[0]
    # n=10 changes, k = ceil(10/5) = 2 worst: -50, -30
    assert r.n_changes == 10 and r.k_tail == 2
    assert r.var_e4 == -30 * 10000
    assert r.cvar_e4 == -40 * 10000


def test_var_cvar_all_gains_tail_still_selected(spark):
    from smartpy_arc_spark.operators.stats import var_cvar

    vals = [10.0, 20.0, 35.0, 55.0, 80.0, 110.0]
    df = spark.createDataFrame(
        [("k", i, v) for i, v in enumerate(vals)], "k string, t int, v double"
    )
    r = var_cvar(df, "k", "t", "v", tail_den=5, scale=1).collect()[0]
    # 5 changes, k=1: smallest change = +10
    assert r.k_tail == 1 and r.var_e4 == 100000 and r.cvar_e4 == 100000


def test_no_duplicate_query_or_oracle_keys():
    """A duplicate dict key silently overwrites its earlier entry —
    this fence turns that into a failure (xml_roundtrip regression)."""
    import re
    from collections import Counter

    import os
    src = open(
        os.path.join(os.path.dirname(os.path.dirname(__file__)),
                     "__spark_entry__.py")
    ).read()
    start = src.index("return _stamp_order({")
    end = src.index("})", start)
    qkeys = re.findall(r'"([a-z0-9_]+)":', src[start:end])
    assert not [k for k, c in Counter(qkeys).items() if c > 1]
    o_start = src.index("def oracle_sql()")
    okeys = re.findall(r'^\s{8}"([a-z0-9_]+)": ', src[o_start:], re.M)
    assert not [k for k, c in Counter(okeys).items() if c > 1]
    assert set(okeys) <= set(qkeys)  # every oracle has a query
