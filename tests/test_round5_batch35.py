"""Batch-35: calendar_gaps, duplicate_charges, round_number_bias."""

import datetime


def test_calendar_gaps_exact_ranges(spark):
    from smartpy_arc_spark.operators.sessionize import calendar_gaps

    d = lambda s: datetime.date.fromisoformat(s)  # noqa: E731
    rows = [
        ("k", d("2020-01-01")),
        ("k", d("2020-01-02")),
        ("k", d("2020-01-06")),   # gap 03..05 (3 days)
        ("k", d("2020-01-08")),   # gap 07 (1 day) — below threshold
        ("k", d("2020-01-20")),   # gap 09..19 (11 days)
    ]
    df = spark.createDataFrame(rows, "k string, dt date")
    out = sorted(
        (str(r.gap_start), str(r.gap_end), r.gap_days)
        for r in calendar_gaps(df, "k", "dt", min_gap_days=2).collect()
    )
    assert out == [
        ("2020-01-03", "2020-01-05", 3),
        ("2020-01-09", "2020-01-19", 11),
    ]


def test_calendar_gaps_duplicate_days_collapse(spark):
    from smartpy_arc_spark.operators.sessionize import calendar_gaps

    d = datetime.date(2020, 1, 1)
    rows = [("k", d), ("k", d), ("k", d + datetime.timedelta(days=10))]
    df = spark.createDataFrame(rows, "k string, dt date")
    out = calendar_gaps(df, "k", "dt", min_gap_days=2).collect()
    assert len(out) == 1 and out[0].gap_days == 9


def test_duplicate_charges_window_and_pairing(spark):
    from smartpy_arc_spark.operators.checks import duplicate_charges

    t = lambda s: datetime.date.fromisoformat(s)  # noqa: E731
    rows = [
        (1, 50.0, t("2020-01-01"), 10),
        (1, 50.0, t("2020-01-03"), 11),   # dup within 7d
        (1, 50.0, t("2020-03-01"), 12),   # same amount, far away
        (1, 60.0, t("2020-01-02"), 13),   # different amount
        (2, 50.0, t("2020-01-02"), 14),   # different entity
    ]
    df = spark.createDataFrame(rows, "e long, amt double, dt date, rid long")
    out = [
        (r.e, r.id_a, r.id_b, r.days_apart)
        for r in duplicate_charges(
            df, "e", "amt", "dt", "rid", window_days=7
        ).collect()
    ]
    assert out == [(1, 10, 11, 2)]


def test_round_number_bias_planted(spark):
    from smartpy_arc_spark.operators.checks import round_number_bias

    # group "clean": cents spread out; group "fab": half whole-dollar
    rows = [("clean", 10.37 + i) for i in range(100)] + [
        ("fab", float(100 + i)) for i in range(50)
    ] + [("fab", 17.23 + i) for i in range(50)]
    df = spark.createDataFrame(rows, "g string, amt double")
    out = {r.g: r for r in round_number_bias(df, "g", "amt").collect()}
    assert out["clean"].n_round == 0 and out["clean"].z_e6 < 0
    assert out["fab"].n_round == 50 and out["fab"].share_e6 == 500000
    assert out["fab"].z_e6 > 10_000_000  # wildly over the 1% base rate


def test_state_durations_attribution(spark):
    from smartpy_arc_spark.operators.sessionize import state_durations

    rows = [
        (1, datetime.datetime(2020, 1, 1, 0, 0, 0), "a"),
        (1, datetime.datetime(2020, 1, 1, 0, 0, 30), "b"),
        (1, datetime.datetime(2020, 1, 1, 0, 1, 30), "a"),
        (1, datetime.datetime(2020, 1, 1, 0, 2, 0), "b"),  # last: no dur
    ]
    df = spark.createDataFrame(rows, "u long, ts timestamp, s string")
    out = {r.s: r for r in state_durations(df, "u", "ts", "s").collect()}
    assert out["a"].total_sec == 30 + 30 and out["a"].n_intervals == 2
    assert out["b"].total_sec == 60 and out["b"].n_intervals == 1
    assert out["a"].share_e6 == 500000 and out["b"].share_e6 == 500000


def test_reconciliation_tie_out(spark):
    from smartpy_arc_spark.operators.checks import reconciliation_check

    h = spark.createDataFrame(
        [(1, 30.0), (2, 50.0), (3, 10.0)], "k long, amt double"
    )
    lines = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (2, 49.99)], "k long, amt double"
    )
    r = reconciliation_check(h, lines, "k", "amt", "amt").collect()[0]
    assert r.n_headers == 3 and r.n_matched == 1
    assert r.n_mismatched == 1 and r.n_missing_lines == 1
    assert r.worst_gap_cents == 1 and r.total_gap_cents == 1


def test_reconciliation_tolerance(spark):
    from smartpy_arc_spark.operators.checks import reconciliation_check

    h = spark.createDataFrame([(1, 50.0)], "k long, amt double")
    lines = spark.createDataFrame([(1, 49.99)], "k long, amt double")
    r = reconciliation_check(
        h, lines, "k", "amt", "amt", tolerance_cents=1
    ).collect()[0]
    assert r.n_matched == 1 and r.n_mismatched == 0
