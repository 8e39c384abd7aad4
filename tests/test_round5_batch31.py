"""Batch-31: cumulative_incidence (Aalen–Johansen), shapley_coverage."""


def test_cif_no_censoring_sums_to_one(spark):
    from smartpy_arc_spark.operators.stats import cumulative_incidence

    # 4 cause-1 events, 4 cause-2 events at distinct times, no censoring
    rows = [(float(t), 1) for t in (1, 3, 5, 7)] + [
        (float(t), 2) for t in (2, 4, 6, 8)
    ]
    df = spark.createDataFrame(rows, "dur double, cause int")
    out = cumulative_incidence(df, "dur", "cause").collect()
    last = out[-1]
    assert last.surv_e6 == 0
    assert last.cif1_e6 + last.cif2_e6 == 1_000_000
    assert last.cif1_e6 == 500000  # symmetric causes
    # monotone non-decreasing CIFs, non-increasing survival
    for a, b in zip(out, out[1:]):
        assert b.cif1_e6 >= a.cif1_e6 and b.cif2_e6 >= a.cif2_e6
        assert b.surv_e6 <= a.surv_e6


def test_cif_hand_computed_small_case(spark):
    from smartpy_arc_spark.operators.stats import cumulative_incidence

    # t=1: d1=1 of n=4 -> CIF1 = 1/4, S = 3/4
    # t=2: censored    -> unchanged, n drops to 2
    # t=3: d2=1 of n=2 -> CIF2 = (3/4)(1/2) = 3/8, S = 3/8
    rows = [(1.0, 1), (2.0, 0), (3.0, 2), (9.0, 0)]
    df = spark.createDataFrame(rows, "dur double, cause int")
    out = {r.t: r for r in cumulative_incidence(df, "dur", "cause").collect()}
    assert out[1.0].n_at_risk == 4 and out[1.0].cif1_e6 == 250000
    assert out[3.0].n_at_risk == 2
    assert out[3.0].cif2_e6 == 375000 and out[3.0].surv_e6 == 375000
    assert out[3.0].cif1_e6 == 250000  # cause-1 unchanged after t=1


def test_shapley_efficiency_and_symmetry(spark):
    from smartpy_arc_spark.operators.funnel import shapley_coverage

    # u1: A only; u2: B only; u3: A+B; u4: C only
    rows = [
        (1, "A"), (2, "B"), (3, "A"), (3, "B"), (4, "C"),
    ]
    df = spark.createDataFrame(rows, "u long, ch string")
    out = {r.channel: r for r in shapley_coverage(df, "u", "ch", ["A", "B", "C"]).collect()}
    # efficiency: sum phi = v(N) = 4 units -> sum phi6 = 24
    assert sum(r.phi6 for r in out.values()) == 24
    # A and B symmetric -> equal phi; C covers its unit alone -> phi = 1
    assert out["A"].phi6 == out["B"].phi6
    assert out["C"].phi6 == 6 and out["C"].phi_e2 == 100
    # shared unit u3 splits between A and B: phi_A = 1 + 0.5 = 1.5
    assert out["A"].phi6 == 9


def test_shapley_requires_three_channels(spark):
    import pytest

    from smartpy_arc_spark.operators.funnel import shapley_coverage

    df = spark.createDataFrame([(1, "A")], "u long, ch string")
    with pytest.raises(ValueError):
        shapley_coverage(df, "u", "ch", ["A", "B"])
