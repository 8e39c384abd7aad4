"""Round-5 batch-7 operators: Hilbert layout, zone maps, AMS F2,
Croston, rolling distinct, lead-lag xcorr, covariate balance."""

import datetime as dt

from pyspark.sql import functions as F

from smartpy_arc_spark.operators.resample import croston, rolling_distinct
from smartpy_arc_spark.operators.scale import hilbert_code, zone_map
from smartpy_arc_spark.operators.sketch import ams_f2
from smartpy_arc_spark.operators.stats import (
    covariate_balance,
    cross_correlation,
)


def test_hilbert_order2_reference(spark):
    """bits=2 full 4x4 grid matches the canonical Hilbert walk."""
    rows = [(x, y) for x in range(4) for y in range(4)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r.x, r.y): r.h
        for r in df.select(
            "x", "y", hilbert_code("x", "y", bits=2).alias("h")
        ).collect()
    }
    # canonical d-values (Wikipedia xy2d walk) for n=4
    expected = {
        (0, 0): 0, (1, 0): 1, (2, 0): 14, (3, 0): 15,
        (0, 1): 3, (1, 1): 2, (2, 1): 13, (3, 1): 12,
        (0, 2): 4, (1, 2): 7, (2, 2): 8, (3, 2): 11,
        (0, 3): 5, (1, 3): 6, (2, 3): 9, (3, 3): 10,
    }
    assert got == expected


def test_hilbert_is_bijective_and_adjacent(spark):
    """bits=3: every code 0..63 appears once, and consecutive codes are
    grid neighbors (the locality property Z-order lacks)."""
    rows = [(x, y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(rows, "x long, y long")
    out = df.select(
        "x", "y", hilbert_code("x", "y", bits=3).alias("h")
    ).collect()
    by_h = {r.h: (r.x, r.y) for r in out}
    assert sorted(by_h) == list(range(64))
    for d in range(63):
        (x1, y1), (x2, y2) = by_h[d], by_h[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1


def test_zone_map_prune_flags(spark):
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(40)], "k long, v double"
    )
    out = zone_map(
        df,
        F.expr("k div 10"),
        ["v"],
        predicates={"hi": ("v", 25.0, None), "band": ("v", 12.0, 17.0)},
    ).collect()
    assert [r.zone for r in out] == [0, 1, 2, 3]
    assert [r.n_rows for r in out] == [10] * 4
    assert [r.scan_hi for r in out] == [0, 0, 1, 1]
    assert [r.scan_band for r in out] == [0, 1, 0, 0]


def test_ams_f2_exact_and_estimator_sane(spark):
    # 10 keys x 10 rows each: F2 = 10 * 100 = 1000
    df = spark.createDataFrame(
        [(i % 10,) for i in range(100)], "k long"
    )
    row = ams_f2(df, "k", k=33).collect()[0]
    assert row.exact_f2 == 1000
    # AMS median-of-squares is unbiased-ish; allow a loose factor
    assert 0 < row.est_median < 10 * row.exact_f2
    assert row.err_med_e6 == round(
        (row.est_median - row.exact_f2) / row.exact_f2 * 1e6
    )


def test_croston_hand_computed(spark):
    """Series over a 6-day spine: demand 2 on d1, 3 on d4 (zeros else).
    z = .25*3 + .75*2 = 2.25 ; p = .25*3 + .75*1 = 1.5 (first interval
    1, second 3); rate = 1.5M."""
    base = dt.datetime(2024, 1, 1, 12)
    rows = [("a", base)] * 2 + [("a", base + dt.timedelta(days=3))] * 3
    # second key pins the spine to 6 days and has one demand day
    rows += [("b", base + dt.timedelta(days=5))]
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    out = {r.k: r for r in croston(df, "k", "ts").collect()}
    a = out["a"]
    assert a.n_periods == 6 and a.n_demand == 2
    assert a.z_e4 == 22500 and a.p_e4 == 15000
    assert a.rate_e6 == 1_500_000
    b = out["b"]
    assert b.n_demand == 1 and b.z_e4 == 10000 and b.p_e4 == 60000
    assert b.rate_e6 == round(1 / 6 * 1e6)


def test_rolling_distinct_window(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [
        ("t", 1, base),
        ("t", 2, base),
        ("t", 1, base + dt.timedelta(days=3)),
        ("t", 3, base + dt.timedelta(days=9)),
    ]
    df = spark.createDataFrame(rows, "k string, u long, ts timestamp")
    out = {
        r.day.isoformat(): r.n_active
        for r in rolling_distinct(df, "k", "ts", "u", window_days=7).collect()
    }
    # active days only: jan1 {1,2}; jan4 window jan1..4 → {1,2};
    # jan10 window jan4..10 → {1,3} (jan1 aged out, jan4 still inside)
    assert out == {"2024-01-01": 2, "2024-01-04": 2, "2024-01-10": 2}


def test_cross_correlation_shifted_series(spark):
    base = dt.date(2024, 1, 1)
    a = [(base + dt.timedelta(days=i), i * 2 + 1) for i in range(20)]
    b = [(d + dt.timedelta(days=3), v) for d, v in a]  # b = a shifted +3
    da = spark.createDataFrame(a, "day date, v long")
    db = spark.createDataFrame(b, "day date, v long")
    out = {r.lag: r for r in cross_correlation(da, db, max_lag=4).collect()}
    assert out[3].r_e6 == 1_000_000  # perfect at the true lag
    assert out[3].n_days == 20
    assert all(out[l].r_e6 == 1_000_000 for l in out if out[l].r_e6 is not None
               ) is False or out[3].r_e6 == 1_000_000
    # linear series: every lag is perfectly correlated too, but overlap shrinks
    assert out[-4].n_days == 13


def test_covariate_balance_flags_shift(spark):
    rows = [(True, 10 + i % 3, 5) for i in range(50)]
    rows += [(False, 20 + i % 3, 5) for i in range(50)]
    df = spark.createDataFrame(rows, "treat boolean, x long, c long")
    out = {r.covariate: r for r in covariate_balance(df, "treat", ["x", "c"]).collect()}
    x = out["x"]
    assert x.n_t == 50 and x.n_c == 50
    # 50 values of 10+(i%3): 17 zeros, 17 ones, 16 twos → mean 10.98
    assert x.mean_t_e6 == 10_980_000
    # constant covariate: NULL smd, NULL flag
    c = out["c"]
    assert c.smd_e6 is None and c.imbalanced is None
    assert x.imbalanced == 1 and x.smd_e6 < -1_000_000


def test_merge_intervals_islands(spark):
    from smartpy_arc_spark.operators.sessionize import merge_intervals

    rows = [
        ("k", 1, 5), ("k", 3, 7), ("k", 7, 9),   # touch merges
        ("k", 11, 12),
        ("j", 1, 2), ("j", 4, 5),
    ]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    out = sorted(
        merge_intervals(df, "k", "s", "e").collect(),
        key=lambda r: (r.k, r.span_start),
    )
    got = [(r.k, r.span_start, r.span_end, r.n_intervals) for r in out]
    assert got == [
        ("j", 1, 2, 1), ("j", 4, 5, 1), ("k", 1, 9, 3), ("k", 11, 12, 1),
    ]


def test_rmst_hand_computed(spark):
    from smartpy_arc_spark.operators.stats import rmst

    df = spark.createDataFrame(
        [(5, 1), (10, 0), (15, 1), (20, 1)], "dur long, ev int"
    )
    row = rmst(df, "dur", "ev", tau=18).collect()[0]
    # 1*5 + .75*5 + .75*5 + .375*3 = 13.625
    assert row.rmst_e6 == 13_625_000 and row.n_subjects == 4
    # tau beyond the curve extends the last segment at S(20)
    row2 = rmst(df, "dur", "ev", tau=25).collect()[0]
    assert row2.rmst_e6 == 13_625_000 + 375_000 * 2 + 0 * 5


def test_lorenz_curve_shares(spark):
    from smartpy_arc_spark.operators.stats import lorenz_curve

    df = spark.createDataFrame(
        [(i, float(1)) for i in range(8)], "id long, v double"
    )
    out = lorenz_curve(df, "v", "id", n_buckets=4).collect()
    # uniform values: shares are exactly linear
    assert [r.cum_share_e6 for r in out] == [250000, 500000, 750000, 1000000]
    assert [r.n_units for r in out] == [2, 2, 2, 2]


def test_t_closeness_uniform_vs_skewed(spark):
    from smartpy_arc_spark.operators.checks import t_closeness

    rows = [("A", v) for v in [1, 1, 2, 2, 3, 3]]
    rows += [("B", v) for v in [1, 1, 1, 1, 1, 1]]
    df = spark.createDataFrame(rows, "g string, sv long")
    out = {r.g: r.t_e6 for r in t_closeness(df, ["g"], "sv").collect()}
    # global p = (8,2,2)/12; A cum diffs: |2*12-8*6|/.., |4*12-10*6|=12
    # A: (24 + 12)/(6*12*2) = 36/144 = .25 ; B: (16+4+... compute) symmetric
    assert out["A"] == 250000
    assert out["B"] == 250000  # complementary halves are equidistant


def test_pq_encode_codebook_shape(spark):
    from smartpy_arc_spark.operators.embedding import pq_encode

    import math
    rows = [
        (i, [float(i % 4)] * 8 + [float((i * 7) % 5)] * 8)
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = pq_encode(df, m=2, k=4, iters=1).collect()
    assert all(r.sub in (0, 1) for r in out)
    assert sum(r.n_points for r in out if r.sub == 0) == 40
    assert sum(r.n_points for r in out if r.sub == 1) == 40
    # first subspace has only 4 distinct constant subvectors: after one
    # iteration each point sits exactly on its centroid
    assert sum(r.sum_d2 for r in out if r.sub == 0) == 0


def test_time_to_convert_order_stats(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = []
    for u, lat in enumerate([10, 20, 30, 40]):
        rows.append((u, "signup", base))
        rows.append((u, "purchase", base + dt.timedelta(seconds=lat)))
    rows.append((9, "purchase", base))  # never signed up: excluded
    rows.append((0, "purchase", base - dt.timedelta(days=1)))  # before signup
    df = spark.createDataFrame(rows, "u long, t string, ts timestamp")
    from smartpy_arc_spark.operators.funnel import time_to_convert

    row = time_to_convert(df, "u", "t", "ts", "signup", "purchase").collect()[0]
    assert row.n_converted == 4
    assert (row.min_s, row.p25_s, row.p50_s, row.p75_s, row.max_s) == (
        10, 10, 20, 30, 40,
    )


def test_sequential_pairs_gap(spark):
    import datetime as dt

    from smartpy_arc_spark.operators.funnel import sequential_pairs

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, "a", base),
        (1, "b", base + dt.timedelta(seconds=100)),   # within gap
        (1, "c", base + dt.timedelta(seconds=5000)),  # outside gap from a
        (2, "a", base),
        (2, "b", base + dt.timedelta(seconds=3599)),
    ]
    df = spark.createDataFrame(rows, "u long, t string, ts timestamp")
    out = {
        (r.type_a, r.type_b): r
        for r in sequential_pairs(df, "u", "t", "ts").collect()
    }
    assert out[("a", "b")].n_users == 2
    assert out[("a", "b")].confidence_e6 == 1_000_000
    assert ("a", "c") not in out  # 5000s > gap
    assert ("b", "c") not in out  # 4900s > gap too


def test_markov_attribution_hand_chain(spark):
    import datetime as dt

    from smartpy_arc_spark.operators.funnel import markov_attribution

    base = dt.datetime(2024, 1, 1)
    rows, uid = [], 0

    def add(seq):
        nonlocal uid
        for i, ch in enumerate(seq):
            rows.append((uid, ch, base + dt.timedelta(minutes=i)))
        uid += 1

    for _ in range(3):
        add(["A", "conv"])
    for _ in range(3):
        add(["B", "end"])
    add(["A", "B", "conv"])
    df = spark.createDataFrame(rows, "u long, ch string, ts timestamp")
    out = {
        r.channel: r
        for r in markov_attribution(df, "u", "ch", "ts", "conv").collect()
    }
    # base P(conv) = 4/7; removing A -> 3/28, removing B -> 3/7
    assert out["A"].removal_effect_e6 == 812500
    assert out["B"].removal_effect_e6 == 250000
    assert out["end"].removal_effect_e6 == 0


def test_recognize_revenue_exact_totals(spark):
    import datetime as dt

    from smartpy_arc_spark.operators.resample import recognize_revenue

    rows = [
        (1, 10000, dt.date(2024, 1, 15), dt.date(2024, 3, 10)),
        (2, 999, dt.date(2024, 2, 1), dt.date(2024, 2, 11)),
    ]
    df = spark.createDataFrame(rows, "cid long, amt long, s date, e date")
    out = recognize_revenue(df, "cid", "amt", "s", "e").collect()
    by_cid = {}
    for r in out:
        by_cid.setdefault(r.cid, 0)
        by_cid[r.cid] += r.recognized
    assert by_cid == {1: 10000, 2: 999}  # exact to the cent
    jan = [r for r in out if r.cid == 1 and r.month.month == 1][0]
    assert jan.days == 17 and jan.recognized == 10000 * 17 // 55


def test_ndcg_perfect_and_inverted(spark):
    from smartpy_arc_spark.operators.itemsets import ndcg_at_k

    # scores aligned with relevance -> ndcg = 1
    rows = [("g", i, float(100 - i), 10 - i) for i in range(10)]
    df = spark.createDataFrame(rows, "g string, id long, score double, rel long")
    row = ndcg_at_k(df, "g", "score", "rel", "id", k=10).collect()[0]
    assert row.ndcg_e6 == 1_000_000 and row.dcg_e6 == row.idcg_e6
    # scores inverted -> ndcg < 1
    rows2 = [("g", i, float(i), 10 - i) for i in range(10)]
    df2 = spark.createDataFrame(rows2, "g string, id long, score double, rel long")
    row2 = ndcg_at_k(df2, "g", "score", "rel", "id", k=10).collect()[0]
    assert row2.ndcg_e6 < 1_000_000 and row2.idcg_e6 == row.idcg_e6


def test_ohlc_deterministic_ties(spark):
    import datetime as dt

    from smartpy_arc_spark.operators.resample import ohlc_bars

    t = dt.datetime(2024, 1, 1, 9)
    rows = [("k", t, 1, 5.0), ("k", t, 2, 7.0), ("k", t, 3, 3.0)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, event_id long, value double")
    row = ohlc_bars(df, "k", "ts", "value", tiebreak_col="event_id").collect()[0]
    assert (row.open_c, row.high_c, row.low_c, row.close_c, row.volume) == (
        500, 700, 300, 300, 3,
    )


def test_whiten_identity_covariance(spark):
    import numpy as np

    from smartpy_arc_spark.operators.embedding import whiten_embeddings

    rng = np.random.RandomState(0)
    a = rng.randn(200, 4) @ np.array(
        [[3, 0, 0, 0], [1, 2, 0, 0], [0, 0, 1, 0.5], [0, 0, 0, 0.2]]
    )
    rows = [(i, [float(x) for x in a[i]]) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = whiten_embeddings(df, eps=1e-9).collect()
    x = np.array([r.white for r in out])
    c = np.cov(x.T, bias=False)
    assert np.abs(c - np.eye(4)).max() < 0.02


def test_dp_counts_deterministic_and_scales(spark):
    from smartpy_arc_spark.operators.checks import dp_counts

    df = spark.createDataFrame([(i % 3,) for i in range(300)], "g long")
    a = {r.g: r.noisy_count for r in dp_counts(df, ["g"], epsilon=1.0, seed=1).collect()}
    b = {r.g: r.noisy_count for r in dp_counts(df, ["g"], epsilon=1.0, seed=1).collect()}
    assert a == b  # deterministic release
    tight = dp_counts(df, ["g"], epsilon=100.0, seed=1).collect()
    assert all(abs(r.noisy_count - 100) <= 1 for r in tight)  # high eps ≈ exact
    loose = {r.g: r.noisy_count for r in dp_counts(df, ["g"], epsilon=0.01, seed=1).collect()}
    assert any(abs(v - 100) > 5 for v in loose.values())  # low eps = noisy


def test_brier_decomposition_calibrated(spark):
    import random

    from smartpy_arc_spark.operators.stats import brier_decomposition

    random.seed(1)
    rows = []
    for _ in range(4000):
        p = random.random()
        rows.append((p, 1 if random.random() < p else 0))
    df = spark.createDataFrame(rows, "p double, y int")
    r = brier_decomposition(df, "p", "y").collect()[0]
    # calibrated forecaster over U(0,1): Brier≈1/6, REL≈0, RES≈1/12, UNC≈1/4
    assert abs(r.brier_e6 - 166667) < 10000
    assert r.rel_e6 < 5000
    assert abs(r.res_e6 - 83333) < 10000
    assert abs(r.unc_e6 - 250000) < 5000
    # constant forecaster at the base rate: zero resolution
    base = sum(1 for _, y in rows if y) / len(rows)
    df2 = spark.createDataFrame([(base, y) for _, y in rows], "p double, y int")
    r2 = brier_decomposition(df2, "p", "y").collect()[0]
    assert r2.res_e6 == 0 and r2.rel_e6 < 1000


def test_trimmed_mean_drops_outliers(spark):
    from smartpy_arc_spark.operators.stats import trimmed_mean

    rows = [("g", i, float(i)) for i in range(10)] + [("g", 99, 1000.0)]
    df = spark.createDataFrame(rows, "g string, id long, v double")
    r = trimmed_mean(df, "g", "v", "id").collect()[0]
    # n=11, k=1: keeps values 1..9 -> mean 5
    assert (r.n, r.n_trimmed_each_side, r.trimmed_mean_e6) == (11, 1, 5_000_000)


def test_periodogram_recovers_weekly_cycle(spark):
    import datetime as dt
    import math

    from smartpy_arc_spark.operators.resample import periodogram_topk

    base = dt.datetime(2024, 1, 1)
    ev = []
    for d in range(84):
        n = int(10 + 8 * math.sin(2 * math.pi * d / 7))
        ev += [("k", base + dt.timedelta(days=d, hours=1))] * max(n, 0)
    df = spark.createDataFrame(ev, "k string, ts timestamp")
    out = periodogram_topk(df, "k", "ts").collect()
    assert out[0].rank == 1 and out[0].period_days_e3 == 7000


def test_effect_sizes_known_shift(spark):
    from smartpy_arc_spark.operators.stats import effect_sizes

    rows = [("a", float(v)) for v in range(0, 100)]
    rows += [("b", float(v)) for v in range(50, 150)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = effect_sizes(df, "g", "v", "a", "b").collect()[0]
    # identical spread, mean shift -50: d ≈ -50/29.01 ≈ -1.723
    assert abs(r.cohens_d_e6 + 1_723_000) < 5000
    # P(a>b) - P(a<b): overlap half; delta = -0.75 for this construction
    assert r.cliffs_delta_e6 < -700000
    # perfect separation -> delta = -1
    rows2 = [("a", float(v)) for v in range(10)] + [
        ("b", float(v)) for v in range(100, 110)
    ]
    df2 = spark.createDataFrame(rows2, "g string, v double")
    r2 = effect_sizes(df2, "g", "v", "a", "b").collect()[0]
    assert r2.cliffs_delta_e6 == -1_000_000


def test_frequent_triples_apriori(spark):
    from smartpy_arc_spark.operators.itemsets import frequent_triples

    rows = []
    for bk in range(10):
        rows += [(bk, "x"), (bk, "y"), (bk, "z")]
    rows += [(100, "x"), (100, "q")]  # q infrequent
    df = spark.createDataFrame(rows, "bk long, it string")
    out = frequent_triples(df, "bk", "it", min_support=5).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.item_a, r.item_b, r.item_c, r.support) == ("x", "y", "z", 10)


def test_readability_simple_text(spark):
    from smartpy_arc_spark.operators.text import readability

    df = spark.createDataFrame(
        [(1, "The cat sat. The dog ran!"), (2, "")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in readability(df).collect()}
    r = out[1]
    assert r.n_words == 6 and r.n_sentences == 2
    # syllable groups: e,a,a,e,o,a -> 6
    assert r.n_syllables == 6
    assert r.flesch_e3 == round((206.835 - 1.015 * 3 - 84.6 * 1) * 1000)
    assert out[2].flesch_e3 is None


def test_pairwise_diffs_known_groups(spark):
    from smartpy_arc_spark.operators.stats import pairwise_mean_diffs

    rows = [("a", 10.0), ("a", 12.0), ("b", 20.0), ("b", 22.0),
            ("c", 30.0), ("c", 32.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {(r.group_a, r.group_b): r
           for r in pairwise_mean_diffs(df, "g", "v").collect()}
    assert out[("a", "b")].diff_e6 == -10_000_000
    assert out[("a", "c")].diff_e6 == -20_000_000
    # pooled MSE = 2 (all within-var equal), se = sqrt(2*(1/2+1/2)) = sqrt(2)
    import math
    assert abs(out[("a", "b")].se_e6 - round(math.sqrt(2) * 1e6)) <= 1


def test_rbo_identical_and_disjoint(spark):
    from smartpy_arc_spark.operators.similarity import rank_biased_overlap

    a = spark.createDataFrame(
        [(f"i{r}", r) for r in range(1, 21)], "item string, rnk long"
    )
    same = rank_biased_overlap(a, a, k=20, p=0.9).collect()[0]
    # truncated RBO of identical lists = 1 - p^k
    assert abs(same.rbo_e6 - round((1 - 0.9 ** 20) * 1e6)) <= 25
    b = spark.createDataFrame(
        [(f"j{r}", r) for r in range(1, 21)], "item string, rnk long"
    )
    disj = rank_biased_overlap(a, b, k=20, p=0.9).collect()[0]
    assert disj.rbo_e6 == 0 and disj.n_common == 0


def test_max_drawdown_hand_series(spark):
    import datetime as dt

    from smartpy_arc_spark.operators.stats import max_drawdown

    base = dt.datetime(2024, 1, 1, 6)
    vals = [10, 5, -8, 2, -4, 20]  # cum: 10,15,7,9,5,25 ; peak 15 → trough 5
    rows = [
        ("k", base + dt.timedelta(days=i), float(v))
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    r = max_drawdown(df, "k", "ts", "v").collect()[0]
    assert r.max_drawdown_c == 1000  # 15 - 5 = 10.00
    assert r.trough_day.isoformat() == "2024-01-05"
    assert r.peak_c == 1500


def test_cohort_ltv_triangle(spark):
    import datetime as dt

    from smartpy_arc_spark.operators.funnel import cohort_ltv

    rows = [
        (1, dt.date(2024, 1, 5), 100),
        (1, dt.date(2024, 2, 7), 50),
        (2, dt.date(2024, 2, 1), 200),
        (1, dt.date(2024, 3, 9), 25),
    ]
    df = spark.createDataFrame(rows, "u long, d date, amt long")
    out = {
        (r.cohort_month.isoformat(), r.age_months): r
        for r in cohort_ltv(df, "u", "d", "amt").collect()
    }
    jan = out[("2024-01-01", 0)]
    assert jan.revenue_c == 100 and jan.cum_revenue_c == 100
    assert out[("2024-01-01", 1)].cum_revenue_c == 150
    assert out[("2024-01-01", 2)].cum_revenue_c == 175
    feb = out[("2024-02-01", 0)]
    assert feb.n_active == 1 and feb.revenue_c == 200


def test_arc_elasticity_halved_demand(spark):
    from smartpy_arc_spark.operators.stats import arc_elasticity

    # price 1.00 -> 2.00, qty 100 -> 50: qrel = -1/3, prel = 1/3 -> e = -1
    rows = [("x", 1, 1.0, 100), ("x", 2, 2.0, 50)]
    df = spark.createDataFrame(rows, "k string, per int, up double, q long")
    r = arc_elasticity(df, "k", "per", "up", "q", 1, 2).collect()[0]
    assert r.elasticity_e6 == -1_000_000
    assert (r.p1_c, r.p2_c, r.q1, r.q2) == (100, 200, 100, 50)
    # equal prices -> NULL elasticity
    rows2 = [("y", 1, 1.0, 100), ("y", 2, 1.0, 70)]
    df2 = spark.createDataFrame(rows2, "k string, per int, up double, q long")
    r2 = arc_elasticity(df2, "k", "per", "up", "q", 1, 2).collect()[0]
    assert r2.elasticity_e6 is None


def test_uplift_by_decile_signal(spark):
    from smartpy_arc_spark.operators.stats import uplift_by_decile

    rows = []
    # high-score units respond only under treatment; low never respond
    for i in range(100):
        score = 100 - i
        treat = i % 2 == 0
        y = 1 if (treat and score > 50) else 0
        rows.append((treat, float(score), y, i))
    df = spark.createDataFrame(rows, "treat boolean, s double, y long, id long")
    out = {r.bucket: r for r in
           uplift_by_decile(df, "treat", "s", "y", "id", n_buckets=2).collect()}
    assert out[1].uplift_e6 == 1_000_000  # top half: full lift
    assert out[2].uplift_e6 == 0


def test_group_ablation_identity(spark):
    from smartpy_arc_spark.operators.stats import group_ablation

    rows = [("a", 10.0)] * 3 + [("b", 1.0)] * 3
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r.g: r for r in group_ablation(df, "g", "v", scale=1).collect()}
    # full mean 5.5; removing b -> 10, removing a -> 1
    assert out["b"].loo_mean_e6 == 10_000_000
    assert out["b"].delta_e6 == 4_500_000
    assert out["a"].delta_e6 == -4_500_000


def test_srm_check_detects_mismatch(spark):
    from smartpy_arc_spark.operators.stats import srm_check

    ok_rows = [(i, i % 2 == 0) for i in range(1000)]
    df = spark.createDataFrame(ok_rows, "u long, treat boolean")
    r = srm_check(df, "u", "treat").collect()[0]
    assert r.srm_detected == 0 and r.chi2_e6 == 0
    bad_rows = [(i, i % 10 != 0) for i in range(1000)]  # 900/100 split
    r2 = srm_check(
        spark.createDataFrame(bad_rows, "u long, treat boolean"),
        "u", "treat",
    ).collect()[0]
    # chi2 = (800)^2/1000 = 640
    assert r2.chi2_e6 == 640_000_000 and r2.srm_detected == 1


def test_power_analysis_scales_with_variance(spark):
    from smartpy_arc_spark.operators.stats import power_analysis

    rows = [("lo", 100.0 + (i % 3)) for i in range(300)]
    rows += [("hi", 100.0 + 30 * (i % 3)) for i in range(300)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r.g: r for r in power_analysis(df, "g", "v").collect()}
    # same means (~101/130...) but hi has ~900x the variance of lo
    assert out["hi"].n_per_arm > 100 * out["lo"].n_per_arm
    # closed-form check for lo: n = ceil(2K var / (0.02 mean)^2)
    import math
    var = out["lo"].var_e6 / 1e6
    mde = out["lo"].mde_e6 / 1e6
    assert out["lo"].n_per_arm == math.ceil(2 * 7.848886 * var / mde ** 2)
