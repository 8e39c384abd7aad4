"""Batch-21 sequence/state/spatial operators: viterbi_decode,
kalman_level, changepoint_binseg, geohash_expr."""

import math


def _py_viterbi(obs):
    """Plain-python mirror of the integer max-plus recursion."""
    from smartpy_arc_spark.operators.hmm import log_literals

    start, trans, emit, unseen = log_literals()
    s = [start[i] + emit[i].get(obs[0], unseen) for i in (0, 1)]
    for o in obs[1:]:
        s = [
            max(s[0] + trans[0][j], s[1] + trans[1][j])
            + emit[j].get(o, unseen)
            for j in (0, 1)
        ]
    return s


def test_viterbi_matches_python_reference(spark):
    from smartpy_arc_spark.operators.hmm import viterbi_decode

    seqs = {
        1: ["view", "click", "purchase", "view"],
        2: ["error", "error", "error"],
        3: ["view", "error", "click", "error", "error"],
    }
    rows = [
        (u, i, o) for u, obs in seqs.items() for i, o in enumerate(obs)
    ]
    df = spark.createDataFrame(rows, "u long, t int, obs string")
    out = {r.u: r for r in viterbi_decode(df, "u", "t", "obs").collect()}
    for u, obs in seqs.items():
        s = _py_viterbi(obs)
        assert out[u].best_score_e6 == max(s)
        assert out[u].margin_e6 == s[0] - s[1]
        assert out[u].best_state == (0 if s[0] >= s[1] else 1)
    # error-heavy sequence decodes to the frustrated state
    assert out[2].best_state == 1 and out[1].best_state == 0


def test_viterbi_unseen_observation_smoothed(spark):
    from smartpy_arc_spark.operators.hmm import viterbi_decode

    df = spark.createDataFrame(
        [(1, 0, "martian"), (1, 1, "view")], "u long, t int, obs string"
    )
    r = viterbi_decode(df, "u", "t", "obs").collect()[0]
    assert r.best_score_e6 == max(_py_viterbi(["martian", "view"]))


def test_kalman_constant_series_converges(spark):
    from smartpy_arc_spark.operators.resample import kalman_level

    df = spark.createDataFrame(
        [("k", i, 50.0) for i in range(60)], "k string, t int, v double"
    )
    r = kalman_level(df, "k", "t", "v").collect()[0]
    assert r.level_e4 == 500000  # never moves off a constant signal
    # gain converges to the steady-state Riccati root of
    # p = (1-k)(p+q), k = (p+q)/(p+q+r)
    q, rr = 2500.0, 10000.0
    a = q / 2 + math.sqrt(q * q / 4 + q * rr)  # steady prior var p∞+q
    assert abs(r.gain_e6 / 1e6 - a / (a + rr)) < 0.01


def test_kalman_tracks_level_shift(spark):
    from smartpy_arc_spark.operators.resample import kalman_level

    vals = [10.0] * 30 + [100.0] * 30
    df = spark.createDataFrame(
        [("k", i, v) for i, v in enumerate(vals)], "k string, t int, v double"
    )
    r = kalman_level(df, "k", "t", "v").collect()[0]
    assert 950000 < r.level_e4 <= 1000000  # has converged near the new level


def test_changepoint_finds_exact_shift(spark):
    from smartpy_arc_spark.operators.stats import changepoint_binseg

    vals = [10.0] * 20 + [50.0] * 20
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "t int, v double"
    )
    r = changepoint_binseg(df, "t", "v", min_seg=5).collect()[0]
    assert r.split_idx == 20 and r.split_ts == 19
    assert r.mean_left_e4 == 100000 and r.mean_right_e4 == 500000
    # gain = n1*n2/n * diff² = 20*20/40 * 1600 = 16000 (value units²)
    assert r.gain_units == 16000


def test_changepoint_respects_min_seg(spark):
    from smartpy_arc_spark.operators.stats import changepoint_binseg

    vals = [10.0] * 3 + [99.0] + [10.0] * 26
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "t int, v double"
    )
    r = changepoint_binseg(df, "t", "v", min_seg=5).collect()[0]
    assert 5 <= r.split_idx <= len(vals) - 5


def _py_geohash(lat, lon, precision):
    """Textbook bisection construction for cross-checking."""
    alpha = "0123456789bcdefghjkmnpqrstuvwxyz"
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    bits = []
    even = True
    while len(bits) < 5 * precision:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                bits.append(1)
                lon_lo = mid
            else:
                bits.append(0)
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                bits.append(1)
                lat_lo = mid
            else:
                bits.append(0)
                lat_hi = mid
        even = not even
    out = []
    for g in range(precision):
        idx = 0
        for b in bits[5 * g : 5 * g + 5]:
            idx = idx * 2 + b
        out.append(alpha[idx])
    return "".join(out)


def test_geohash_wikipedia_example(spark):
    from smartpy_arc_spark.operators.scale import geohash_expr
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(57.64911, 10.40744)], "lat double, lon double")
    gh = df.select(
        geohash_expr(F.col("lat"), F.col("lon"), precision=8).alias("g")
    ).collect()[0].g
    assert gh == "u4pruydq"


def test_geohash_matches_bisection_reference(spark):
    from smartpy_arc_spark.operators.scale import geohash_expr
    from pyspark.sql import functions as F

    pts = [
        (0.0, 0.0),
        (-89.9, -179.9),
        (89.9, 179.9),
        (48.8583, 2.2945),
        (-33.8568, 151.2153),
        (37.42, -122.08),
    ]
    df = spark.createDataFrame(pts, "lat double, lon double")
    rows = df.select(
        "lat",
        "lon",
        geohash_expr(F.col("lat"), F.col("lon"), precision=7).alias("g"),
    ).collect()
    for r in rows:
        assert r.g == _py_geohash(r.lat, r.lon, 7)
