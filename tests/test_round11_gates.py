"""Round-11 gate hardening (VERDICT r10 items 1/6, ADVICE r10):

- the local oracle replica canonicalizes rows-only results the DRIVER's
  way (raw sort before any stringify), so an array-typed output column —
  the r10 ``pca_embeddings`` failure mode — fails locally before it can
  reach a driver stamp;
- ``regressed`` / ``tail_regressed`` use dispatch-adjusted per-query
  ratios when the committed reference carries job counts: a uniformly
  inflated (degraded-dispatch) run produces ZERO flags even though its
  job-heavy queries inflate more than the median query, while a genuine
  single-query regression still fires;
- ``bench_guard record`` survives non-JSON stdout lines starting with
  "{" and ``check`` falls back to a compact-line artifact's embedded
  tail verdict; ``job_census`` counts via max jobId, immune to the
  spark.ui.retainedJobs cap.
"""

import json
import os
import sys

import numpy as np
import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


# -------------------------------------------- driver-style canonicalization

def test_driver_canon_rejects_array_cells():
    """An ``array<double>`` result column arrives in pandas as ndarray
    cells; the driver's canonicalizer sorts the raw frame and crashes on
    them (r10 ``pca_embeddings``: unhashable type).  The local replica
    must reproduce that failure."""
    from check_oracle import driver_canon

    pdf = pd.DataFrame({
        "vec_id": [2, 1, 1],
        "pc": [np.array([1.0, 2.0]), np.array([0.5]), np.array([0.5])],
    })
    with pytest.raises(TypeError, match="unhashable"):
        driver_canon(pdf)


def test_driver_canon_accepts_scalar_frames():
    from check_oracle import driver_canon

    pdf = pd.DataFrame({
        "b": [3.0, 1.0, 2.0],
        "a": ["y", "x", "x"],
        "t": pd.to_datetime(["2024-01-02", "2024-01-01", "2024-01-03"]),
    })
    out = driver_canon(pdf)
    assert list(out.columns) == ["a", "b", "t"]
    assert out["a"].tolist() == ["x", "x", "y"]
    assert len(out) == 3
    # empty frames and zero-column frames must not crash either
    driver_canon(pdf.iloc[0:0])
    driver_canon(pd.DataFrame(index=[0, 1]))


# ------------------------------------- dispatch-adjusted regression gate

REF_DISPATCH = 90.0

SYNTH_REF = {
    # jobs spread mirrors reality: scan-shaped queries ~2-4 jobs,
    # driver-loop queries tens of jobs (geometric_median 27, louvain 98)
    "queries": {
        "scan_a": 0.4, "join_b": 0.9, "agg_c": 0.6, "tiny_loop_d": 0.5,
        "wide_e": 1.2,
    },
    "total": 3.6,
    "heavy_tail": {"gm_like": 1.5, "graph_like": 4.0, "flat_like": 2.5},
    "heavy_tail_total": 8.0,
    "jobs": {
        "scan_a": 2, "join_b": 4, "agg_c": 3, "tiny_loop_d": 11,
        "wide_e": 3, "gm_like": 27, "graph_like": 98, "flat_like": 3,
    },
    "dispatch_ms": REF_DISPATCH,
    "sf": 0.1,
    "n_runs": 3,
    "recorded": "synthetic test reference",
}


@pytest.fixture()
def synth_ref(tmp_path):
    p = tmp_path / "BENCH_REFERENCE.json"
    p.write_text(json.dumps(SYNTH_REF))
    return str(p)


def _bench_out(queries, heavy, dispatch):
    return {
        "metric": "headline_queries_wall_total",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "heavy_tail": heavy,
        "heavy_tail_total": round(sum(heavy.values()), 3),
        "dispatch_ms": {"pre": dispatch, "mid": dispatch, "post": dispatch},
        "sf": 0.1,
    }


def _degraded(dispatch_ms, compute_factor=1.0):
    """What a run measures when ONLY the dispatch regime changes: each
    query's wall = compute x factor + jobs x dispatch delta."""
    delta = (dispatch_ms - REF_DISPATCH) / 1000.0
    q = {k: round(v * compute_factor + SYNTH_REF["jobs"][k] * delta, 4)
         for k, v in SYNTH_REF["queries"].items()}
    h = {k: round(v * compute_factor + SYNTH_REF["jobs"][k] * delta, 4)
         for k, v in SYNTH_REF["heavy_tail"].items()}
    return q, h


def test_degraded_dispatch_regime_produces_zero_flags(synth_ref):
    """A 280 ms/job storm (the r10 driver regime) inflates job-heavy
    queries 2-5x while scan-shaped ones barely move — the exact shape
    that fabricated the r10 ``geom_split`` / r9 ``q3`` flags under the
    raw-ratio rule.  The job-count model must absorb it completely."""
    from bench import normalize_against_reference

    q, h = _degraded(280.0)
    out = normalize_against_reference(_bench_out(q, h, 280.0), synth_ref)
    # sanity: the raw ratios DO look alarming (that's the trap)
    assert max(out["vs_reference"].values()) > 2.0
    assert out["regressed"] == []
    assert out["tail_regressed"] == []


def test_uniform_compute_inflation_produces_zero_flags(synth_ref):
    from bench import normalize_against_reference

    q, h = _degraded(REF_DISPATCH, compute_factor=1.8)
    out = normalize_against_reference(_bench_out(q, h, REF_DISPATCH), synth_ref)
    assert out["regressed"] == []
    assert out["tail_regressed"] == []


def test_single_query_regression_fires_through_the_model(synth_ref):
    """One query 5x its compute, measured inside a degraded regime: the
    model explains the regime for its peers but NOT the victim."""
    from bench import normalize_against_reference

    q, h = _degraded(280.0)
    q["join_b"] = round(q["join_b"] * 5, 4)
    h["flat_like"] = round(h["flat_like"] * 5, 4)
    out = normalize_against_reference(_bench_out(q, h, 280.0), synth_ref)
    assert out["regressed"] == ["join_b"]
    assert out["tail_regressed"] == ["flat_like"]


def test_job_count_regression_fires(synth_ref):
    """A code change that doubles a driver-loop query's job count shows
    up as wall growth the reference jobs can't explain."""
    from bench import normalize_against_reference

    q, h = _degraded(280.0)
    # gm_like suddenly runs 81 jobs instead of its recorded 27
    h["gm_like"] = round(
        SYNTH_REF["heavy_tail"]["gm_like"] + 81 * (280.0 - 90.0) / 1000, 4)
    out = normalize_against_reference(_bench_out(q, h, 280.0), synth_ref)
    assert out["tail_regressed"] == ["gm_like"]


def test_reference_without_jobs_falls_back_to_raw_ratio(tmp_path):
    from bench import normalize_against_reference

    ref = {k: v for k, v in SYNTH_REF.items() if k != "jobs"}
    p = tmp_path / "ref.json"
    p.write_text(json.dumps(ref))
    q = dict(SYNTH_REF["queries"])
    q["scan_a"] = round(q["scan_a"] * 5, 4)
    out = normalize_against_reference(
        _bench_out(q, dict(SYNTH_REF["heavy_tail"]), 90.0), str(p))
    assert "adj_vs_reference" not in out
    assert out["regressed"] == ["scan_a"]


def test_normalized_totals_keep_raw_ratio_semantics(synth_ref):
    """The job model changes only the FLAGS; regime_factor and the
    normalized totals stay the r9/r10 raw-median computation the judge
    has been tracking round-over-round."""
    from bench import normalize_against_reference
    import statistics

    q, h = _degraded(280.0)
    out = normalize_against_reference(_bench_out(q, h, 280.0), synth_ref)
    raw_median = statistics.median(out["vs_reference"].values())
    assert out["regime_factor"] == pytest.approx(max(raw_median, 1.0), abs=1e-3)
    assert out["normalized_total"] == pytest.approx(
        round(sum(q.values()), 3) / out["regime_factor"], rel=1e-3)


# ---------------------------------------------- bench_guard robustness

def test_bench_guard_check_uses_embedded_tail_verdict(tmp_path):
    """A compact-line artifact (no per-query heavy_tail block) must get
    its tail verdict from the embedded keys, not print nulls."""
    import subprocess

    with open(os.path.join(REPO, "BENCH_REFERENCE.json")) as f:
        ref = json.load(f)
    artifact = {
        "metric": "headline_queries_wall_total",
        "value": ref["total"],
        "unit": "sec",
        "queries": dict(ref["queries"]),
        "heavy_tail_total": ref["heavy_tail_total"],
        "dispatch_ms": {"pre": 95.0, "mid": 97.0, "post": 99.0},
        "sf": ref["sf"],
        "regime_factor": 1.0,
        "tail_regime_factor": 1.21,
        "normalized_total": ref["total"],
        "normalized_heavy_tail_total": 30.695,
        "regressed": [],
        "tail_regressed": ["louvain"],
        "detail": "BENCH_LAST.json",
    }
    p = tmp_path / "BENCH_rX.json"
    p.write_text(json.dumps(artifact))
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "bench_guard.py"),
         "check", str(p)],
        capture_output=True, text=True, check=True,
    )
    verdict = json.loads(res.stdout)
    assert verdict["tail_regime_factor"] == 1.21
    assert verdict["normalized_heavy_tail_total"] == 30.695
    assert verdict["tail_regressed"] == ["louvain"]


def test_bench_guard_record_skips_unparseable_brace_lines(monkeypatch, tmp_path):
    """log4j/progress noise starting with '{' must not abort record()
    (ADVICE r10)."""
    import types
    import bench_guard

    # keep the test from touching the committed reference
    monkeypatch.setattr(
        bench_guard, "REF_PATH", str(tmp_path / "BENCH_REFERENCE.json"))

    fake_stdout = "\n".join([
        "{not json at all",
        json.dumps({"queries": {"a": 1.0}, "heavy_tail": {"b": 2.0},
                    "dispatch_ms": {"pre": 80.0, "mid": 80.0, "post": 80.0},
                    "sf": 0.1}),
        '{"compact": "line without heavy_tail"}',
    ])

    calls = {"n": 0}

    def fake_run(cmd, **kw):
        calls["n"] += 1
        if "job_census.py" in " ".join(cmd):
            return types.SimpleNamespace(
                stdout=json.dumps({"a": {"jobs": 3, "wall_s": 1.0},
                                   "b": {"jobs": 5, "wall_s": 2.0}}) + "\n",
                returncode=0)
        return types.SimpleNamespace(stdout=fake_stdout, returncode=0)

    monkeypatch.setattr(bench_guard.subprocess, "run", fake_run)
    bench_guard.record(1)
    with open(bench_guard.REF_PATH) as f:
        written = json.load(f)
    assert written["queries"] == {"a": 1.0}
    assert written["jobs"] == {"a": 3, "b": 5}
    assert written["dispatch_ms"] == 80.0


def test_job_census_counts_by_max_jobid(monkeypatch):
    """len()-based counting saturates at the retainedJobs cap; max-jobId
    counting does not (ADVICE r10)."""
    import io
    import job_census

    # 1000 retained entries but jobIds run 500..1499: a len()-based count
    # would say 1000 regardless of progress; max-based says 1500.
    payload = json.dumps(
        [{"jobId": i} for i in range(500, 1500)]).encode()
    monkeypatch.setattr(
        job_census.urllib.request, "urlopen",
        lambda url: io.BytesIO(payload))
    assert job_census.job_count("http://x", "app") == 1500


def test_job_census_empty_app(monkeypatch):
    import io
    import job_census

    monkeypatch.setattr(
        job_census.urllib.request, "urlopen",
        lambda url: io.BytesIO(b"[]"))
    assert job_census.job_count("http://x", "app") == 0
