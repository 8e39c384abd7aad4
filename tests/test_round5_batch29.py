"""Batch-29: price_index, abc_xyz."""


def test_price_index_pure_inflation(spark):
    from smartpy_arc_spark.operators.stats import price_index

    # every item's price doubles, quantities unchanged:
    # L = P = F = 2.0 exactly
    rows = []
    for item in range(5):
        rows.append((0, item, 10.0 * (item + 1) * 3, 3.0))
        rows.append((1, item, 20.0 * (item + 1) * 3, 3.0))
    df = spark.createDataFrame(rows, "t int, i int, amount double, qty double")
    r = price_index(df, "t", "i", "amount", "qty", 0).collect()[0]
    assert r.n_items == 5
    assert r.laspeyres_e6 == 2_000_000
    assert r.paasche_e6 == 2_000_000
    assert r.fisher_e6 == 2_000_000


def test_price_index_mix_shift_separates_l_and_p(spark):
    from smartpy_arc_spark.operators.stats import price_index

    # item A price doubles, item B price halves; current basket buys
    # much more of B -> Paasche < Laspeyres
    rows = [
        (0, "A", 100.0, 10.0),
        (0, "B", 100.0, 10.0),
        (1, "A", 40.0, 2.0),   # unit 20 (was 10): doubled
        (1, "B", 150.0, 30.0),  # unit 5 (was 10): halved
    ]
    df = spark.createDataFrame(rows, "t int, i string, amount double, qty double")
    r = price_index(df, "t", "i", "amount", "qty", 0).collect()[0]
    assert r.paasche_e6 < r.laspeyres_e6
    # L = (20*10 + 5*10)/(10*10+10*10) = 250/200
    assert r.laspeyres_e6 == 1_250_000
    # P = (20*2 + 5*30)/(10*2 + 10*30) = 190/320
    assert r.paasche_e6 == round(190 / 320 * 1e6)


def test_abc_xyz_classes(spark):
    from smartpy_arc_spark.operators.stats import abc_xyz

    rows = []
    # item "big": 70% of revenue, steady across periods -> A/X
    for t in range(4):
        rows.append(("big", t, 700.0))
    # item "mid": ~21%, volatile -> B with high CV
    for t, v in enumerate((100.0, 700.0, 10.0, 30.0)):
        rows.append(("mid", t, v))
    # item "tiny": ~8%, single period -> C/Z (cv undefined -> Z)
    rows.append(("tiny", 0, 300.0))
    df = spark.createDataFrame(rows, "i string, t int, v double")
    out = {r.i: r for r in abc_xyz(df, "i", "t", "v").collect()}
    assert out["big"].abc == "A" and out["big"].xyz == "X"
    assert out["big"].cv_e6 == 0
    assert out["mid"].abc == "B" and out["mid"].xyz == "Z"
    assert out["tiny"].abc == "C" and out["tiny"].xyz == "Z"
    assert out["tiny"].cv_e6 is None
    assert out["big"].klass == "AX"


def test_abc_xyz_share_monotone(spark):
    from smartpy_arc_spark.operators.stats import abc_xyz

    rows = [(f"i{j}", t, float(100 - j)) for j in range(10) for t in range(3)]
    df = spark.createDataFrame(rows, "i string, t int, v double")
    out = sorted(abc_xyz(df, "i", "t", "v").collect(), key=lambda r: r.cum_share_e6)
    shares = [r.cum_share_e6 for r in out]
    assert shares == sorted(shares) and shares[-1] == 1_000_000
