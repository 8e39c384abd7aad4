#!/usr/bin/env python
"""Bench provenance gate (round 9, VERDICT r8 item 1).

Two subcommands:

``record [N]``
    Run ``bench.py`` N times (default 3) on what should be an idle host,
    take the per-query MIN across runs (headline and heavy-tail blocks)
    and the MIN dispatch_ms observed, and write the result to
    ``BENCH_REFERENCE.json`` at the repo root.  Commit that file: it is
    the idle-regime recording every future driver bench is read against.
    Refuses to record when the best observed dispatch regime is degraded
    (>150 ms/job) — a reference taken under contention would normalize
    future idle runs DOWN and hide regressions.

``check <BENCH_rN.json>``
    Adjudicate a recorded driver bench against the committed reference:
    print the regime factor (median per-query ratio — contention moves
    many ratios at once, a real regression moves one), the
    dispatch-normalized totals, and the real-regression candidates
    (dispatch-adjusted per-query ratios > 2x their unclamped median when
    the reference carries job counts — see bench.py).  This is the
    same computation ``bench.py`` embeds in its own output
    (``normalize_against_reference``); the subcommand exists to re-read
    historical artifacts that predate the gate.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_PATH = os.path.join(REPO, "BENCH_REFERENCE.json")
DEGRADED_MS = 150.0


def record(n: int = 3) -> None:
    runs = []
    for i in range(n):
        print(f"bench run {i + 1}/{n} ...", file=sys.stderr)
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True, text=True, check=True,
        )
        # bench.py prints the full JSON on an earlier line and a compact
        # summary last (round 10); take the newest line that carries the
        # per-query heavy_tail block record() needs.  Non-JSON stdout
        # lines that happen to start with "{" (log4j/progress noise) are
        # skipped rather than aborting the whole recording (ADVICE r10).
        parsed = []
        for ln in out.stdout.strip().splitlines():
            if not ln.startswith("{"):
                continue
            try:
                j = json.loads(ln)
            except json.JSONDecodeError:
                continue
            if "heavy_tail" in j:
                parsed.append(j)
        if not parsed:
            raise SystemExit(
                f"bench run {i + 1} produced no parseable full-JSON line"
            )
        runs.append(parsed[-1])
    dispatch = min(
        min(r["dispatch_ms"].values()) for r in runs  # pre/mid/post
    )
    if dispatch > DEGRADED_MS:
        raise SystemExit(
            f"refusing to record a reference under a degraded dispatch "
            f"regime ({dispatch} ms/job > {DEGRADED_MS}); re-run when idle"
        )
    queries = {
        q: min(r["queries"][q] for r in runs) for q in runs[0]["queries"]
    }
    heavy = {
        q: min(r["heavy_tail"][q] for r in runs) for q in runs[0]["heavy_tail"]
    }
    # Per-query JOB counts (r11, VERDICT r10 item 6): recorded alongside
    # the idle mins so bench.py's regressed gate can model dispatch-regime
    # inflation per query (wall ≈ jobs x dispatch + compute) instead of
    # flagging job-heavy queries whenever the regime degrades.
    print("job census ...", file=sys.stderr)
    census_out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "job_census.py"),
         *queries, *heavy],
        capture_output=True, text=True, check=True,
    )
    jobs = {
        q: rec["jobs"]
        for q, rec in json.loads(
            census_out.stdout.strip().splitlines()[-1]
        ).items()
    }
    ref = {
        "queries": queries,
        "total": round(sum(queries.values()), 3),
        "heavy_tail": heavy,
        "heavy_tail_total": round(sum(heavy.values()), 3),
        "jobs": jobs,
        "dispatch_ms": dispatch,
        "sf": runs[0]["sf"],
        "n_runs": n,
        # self-describing provenance (ADVICE r9: no baked-in round label)
        "recorded": os.environ.get(
            "BENCH_REF_LABEL",
            "idle host, dispatch %.0f ms/job (best-of-%d per query)"
            % (dispatch, n),
        ),
    }
    with open(REF_PATH, "w") as f:
        json.dump(ref, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps({"total": ref["total"], "dispatch_ms": dispatch}))


def check(path: str) -> None:
    sys.path.insert(0, REPO)
    from bench import normalize_against_reference

    with open(path) as f:
        bench = json.load(f)
    if "parsed" in bench and "queries" not in bench:
        # driver-recorded BENCH_r{N}.json wraps bench.py's JSON line
        bench = bench["parsed"]
    block = normalize_against_reference(bench)
    if not block:
        raise SystemExit("no committed reference (or sf mismatch)")
    if "tail_regime_factor" not in block and "tail_regime_factor" in bench:
        # A post-r10 compact-line artifact has no per-query heavy_tail
        # block to recompute from, but it EMBEDS the tail verdict bench.py
        # computed at run time — use those keys instead of printing nulls
        # (ADVICE r10).
        for k in ("tail_regime_factor", "normalized_heavy_tail_total",
                  "tail_regressed"):
            if k in bench:
                block[k] = bench[k]
    print(json.dumps(
        {
            "raw_total": bench["value"],
            "dispatch_ms": bench.get("dispatch_ms"),
            "regime_factor": block["regime_factor"],
            "tail_regime_factor": block.get("tail_regime_factor"),
            "normalized_total": block["normalized_total"],
            "normalized_heavy_tail_total": block.get(
                "normalized_heavy_tail_total"
            ),
            "regressed": block["regressed"],
            "tail_regressed": block.get("tail_regressed"),
        },
        indent=1,
    ))


if __name__ == "__main__":
    if len(sys.argv) >= 2 and sys.argv[1] == "record":
        record(int(sys.argv[2]) if len(sys.argv) > 2 else 3)
    elif len(sys.argv) >= 3 and sys.argv[1] == "check":
        check(sys.argv[2])
    else:
        raise SystemExit(__doc__)
