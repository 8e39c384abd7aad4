"""Round-10 bench-gate additions (VERDICT r9 items 1-2, ADVICE r9):

- the final stdout line is compact enough to survive the driver's
  ~2000-char tail capture (BENCH_r09.json lost its own headline to
  ``parsed: null``) while still carrying the full gate verdict;
- the heavy tail is normalized by its OWN regime factor (the dispatch
  regime drifts between the headline and tail phases);
- ``regressed`` uses the unclamped median so a uniformly-faster run
  still flags a query regressing relative to its peers.
"""

import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _ref():
    with open(os.path.join(REPO, "BENCH_REFERENCE.json")) as f:
        return json.load(f)


def _fake_bench(queries, heavy):
    return {
        "metric": "headline_queries_wall_total",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "heavy_tail": heavy,
        "heavy_tail_total": round(sum(heavy.values()), 3),
        "dispatch_ms": {"pre": 97.0, "mid": 99.0, "post": 101.0},
        "sf": 0.1,
    }


# ------------------------------------------------ final-line compactness

def test_final_line_fits_driver_capture_with_real_shape():
    """Build the compact line from a worst-case-realistic output dict
    (real reference query names, full gate block, a few regressed
    entries) and assert it parses and fits the capture window."""
    from bench import MAX_FINAL_LINE, compact_summary_line, \
        normalize_against_reference

    ref = _ref()
    q = {k: round(v * 1.473, 3) for k, v in ref["queries"].items()}
    h = {k: round(v * 2.917, 3) for k, v in ref["heavy_tail"].items()}
    out = _fake_bench(q, h)
    # force non-empty regressed lists so the line budget covers them
    victim = max(ref["queries"], key=len)
    out["queries"][victim] = round(ref["queries"][victim] * 9, 3)
    tail_victim = max(ref["heavy_tail"], key=len)
    out["heavy_tail"][tail_victim] = round(
        ref["heavy_tail"][tail_victim] * 9, 3)
    out.update(normalize_against_reference(out))
    assert victim in out["regressed"]
    assert tail_victim in out["tail_regressed"]

    line = compact_summary_line(out)
    assert len(line) <= MAX_FINAL_LINE
    parsed = json.loads(line)
    # driver contract keys
    for k in ("metric", "value", "unit", "queries", "sf"):
        assert k in parsed, k
    assert parsed["queries"] == out["queries"]
    # gate verdict keys the judge adjudicates from the artifact alone
    for k in ("regime_factor", "tail_regime_factor", "normalized_total",
              "normalized_heavy_tail_total", "regressed",
              "tail_regressed", "dispatch_ms", "heavy_tail_total"):
        assert k in parsed, k
    # bulk blocks must NOT be on the final line
    for k in ("runs", "vs_reference", "heavy_tail",
              "heavy_tail_vs_reference", "reference_meta"):
        assert k not in parsed, k


def test_final_line_raises_when_over_budget():
    from bench import compact_summary_line

    out = _fake_bench(
        {f"query_with_a_rather_long_name_{i:04d}": 1.234
         for i in range(200)}, {"h": 1.0})
    with pytest.raises(AssertionError, match="trim FINAL_LINE_KEYS"):
        compact_summary_line(out)


def test_bench_guard_check_reads_compact_line(tmp_path):
    """`bench_guard.py check` must adjudicate an artifact that carries
    only the compact final line (the post-r10 driver record shape)."""
    from bench import compact_summary_line, normalize_against_reference

    ref = _ref()
    out = _fake_bench(dict(ref["queries"]), dict(ref["heavy_tail"]))
    out.update(normalize_against_reference(out))
    artifact = tmp_path / "BENCH_rX.json"
    artifact.write_text(compact_summary_line(out))

    import subprocess
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "bench_guard.py"),
         "check", str(artifact)],
        capture_output=True, text=True, check=True,
    )
    verdict = json.loads(res.stdout)
    assert verdict["regime_factor"] == 1.0
    assert verdict["regressed"] == []


# ------------------------------------------- per-phase regime factors

def test_tail_gets_its_own_regime_factor():
    """Headline inflated 1.5x, tail 3x (inter-phase drift): each block
    normalizes back to ITS reference, and nothing is flagged."""
    from bench import normalize_against_reference

    ref = _ref()
    q = {k: round(v * 1.5, 6) for k, v in ref["queries"].items()}
    h = {k: round(v * 3.0, 6) for k, v in ref["heavy_tail"].items()}
    out = normalize_against_reference(_fake_bench(q, h))
    assert out["regime_factor"] == pytest.approx(1.5, abs=0.01)
    assert out["tail_regime_factor"] == pytest.approx(3.0, abs=0.01)
    assert out["normalized_total"] == pytest.approx(
        ref["total"], rel=0.01)
    assert out["normalized_heavy_tail_total"] == pytest.approx(
        ref["heavy_tail_total"], rel=0.01)
    assert out["regressed"] == []
    assert out["tail_regressed"] == []


def test_tail_regression_survives_tail_normalization():
    """One tail query at 5x on an otherwise idle tail lands in
    tail_regressed and keeps inflating the normalized tail total."""
    from bench import normalize_against_reference

    ref = _ref()
    h = dict(ref["heavy_tail"])
    victim = sorted(h)[0]
    h[victim] = round(h[victim] * 5, 6)
    out = normalize_against_reference(_fake_bench(dict(ref["queries"]), h))
    assert out["tail_regressed"] == [victim]
    assert out["tail_regime_factor"] == pytest.approx(1.0, abs=0.05)
    assert out["normalized_heavy_tail_total"] > ref["heavy_tail_total"]


def test_regressed_uses_unclamped_median():
    """Run uniformly 2x FASTER than reference except one query at 1.2x
    of reference (2.4x its peers): the clamp must not hide it."""
    from bench import normalize_against_reference

    ref = _ref()
    q = {k: round(v * 0.5, 6) for k, v in ref["queries"].items()}
    victim = sorted(q)[0]
    q[victim] = round(ref["queries"][victim] * 1.2, 6)
    out = normalize_against_reference(
        _fake_bench(q, dict(ref["heavy_tail"])))
    assert out["regressed"] == [victim]
    # but normalization still clamps at 1.0: faster runs are not
    # normalized upward
    assert out["regime_factor"] == 1.0
    assert out["normalized_total"] == pytest.approx(
        sum(q.values()), rel=0.01)
