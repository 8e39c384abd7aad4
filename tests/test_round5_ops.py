"""Round-5 operators: isotonic regression, Cox one-step, bucket stats."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from smartpy_arc_spark.operators.stats import cox_one_step, isotonic_fit


def test_isotonic_matches_pav_small(spark):
    """Classic PAV example: y = [1, 3, 2, 4] → fit [1, 2.5, 2.5, 4]."""
    rows = [(0, 1.0), (1, 3.0), (2, 2.0), (3, 4.0)]
    df = spark.createDataFrame(rows, "bin long, y double")
    got = {r.bin: r.y_iso_e6 for r in isotonic_fit(df, "bin", "y").collect()}
    assert got == {0: 1_000_000, 1: 2_500_000, 2: 2_500_000, 3: 4_000_000}


def test_isotonic_weighted_and_monotone(spark):
    """Weighted pooling (repeated rows = weights) and monotone output on a
    noisy decreasing-then-increasing series."""
    rows = [(0, 2.0)] * 3 + [(1, 0.0)] * 1 + [(2, 1.0)] * 2 + [(3, 5.0)]
    df = spark.createDataFrame(rows, "bin long, y double")
    out = sorted(isotonic_fit(df, "bin", "y").collect(), key=lambda r: r.bin)
    vals = [r.y_iso_e6 for r in out]
    assert vals == sorted(vals)  # nondecreasing
    # pool of bins 0..2: (3*2 + 0 + 2*1)/6 = 8/6
    assert vals[0] == vals[1] == vals[2] == round(8 / 6 * 1e6)
    assert vals[3] == 5_000_000
    assert [r.n_obs for r in out] == [3, 1, 2, 1]


def _cox_reference(times, events, xs):
    """Direct numpy evaluation of U(0), I(0) with Breslow ties."""
    times, events, xs = map(np.asarray, (times, events, xs))
    U = I = 0.0
    for t in np.unique(times[events == 1]):
        risk = times >= t
        at = (times == t) & (events == 1)
        xbar = xs[risk].mean()
        x2bar = (xs[risk] ** 2).mean()
        U += xs[at].sum() - at.sum() * xbar
        I += at.sum() * (x2bar - xbar**2)
    return U, I


def test_cox_one_step_matches_direct_computation(spark):
    rng = np.random.default_rng(11)
    n = 400
    xs = rng.integers(0, 50, n)
    # hazard increases with x: earlier event times for larger x
    times = np.ceil(rng.exponential(100 / (1 + xs * 0.1))).astype(int) + 1
    events = (rng.random(n) < 0.8).astype(int)
    df = spark.createDataFrame(
        [(int(t), int(e), float(x)) for t, e, x in zip(times, events, xs)],
        "t long, e int, x double",
    )
    row = cox_one_step(df, "t", "e", "x", x_scale=1).collect()[0]
    U, I = _cox_reference(times, events, xs)
    assert row.n == n and row.n_events == int(events.sum())
    assert abs(row.u_e2 / 100 - U) < 0.5
    assert abs(row.i_e0 - I) < len(np.unique(times[events == 1]))  # ±1/term
    beta = row.beta_e6 / 1e6
    assert abs(beta - U / I) < 1e-3
    assert beta > 0  # higher x → higher hazard, as constructed
    assert row.chi2_e6 / 1e6 > 3.84  # significant at 5% by construction


def test_cox_no_signal_is_insignificant(spark):
    rng = np.random.default_rng(5)
    n = 300
    xs = rng.integers(0, 50, n)
    times = np.ceil(rng.exponential(50, n)).astype(int) + 1  # x-independent
    events = np.ones(n, dtype=int)
    df = spark.createDataFrame(
        [(int(t), int(e), float(x)) for t, e, x in zip(times, events, xs)],
        "t long, e int, x double",
    )
    row = cox_one_step(df, "t", "e", "x", x_scale=1).collect()[0]
    assert row.chi2_e6 / 1e6 < 3.84
