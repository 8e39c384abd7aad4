#!/usr/bin/env python
"""Spot-check the physical plans of specific queries against the
documented anti-pattern allowlists — the per-query companion to
``tools/audit_plans.py`` (which sweeps all of them).

Usage: python tools/check_plan.py <query> [<query> ...]
Exit 1 if any named query shows an undocumented CartesianProduct,
single-partition exchange, or nested-loop join.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"
    ),
)


def main() -> int:
    import __spark_entry__ as mod
    from test_plans import BNLJ_OK, SINGLE_PARTITION_OK

    from smartpy_arc_spark import get_spark

    names = sys.argv[1:]
    if not names:
        print(__doc__)
        return 2
    sf_dir = os.environ.get("SPARK_GRAFT_PLAN_SF", "/root/testdata/sf0.001")
    spark = get_spark("plan-check")
    bad = 0
    for n in names:
        fn = mod.queries().get(n)
        if fn is None:
            print(f"{n}: UNKNOWN QUERY")
            bad += 1
            continue
        if n.startswith("stream"):
            print(f"{n}: streaming (per-micro-batch plans) — skipped")
            continue
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        flags = []
        if "CartesianProduct" in plan:
            flags.append("CARTESIAN")
        if "Exchange SinglePartition" in plan and n not in SINGLE_PARTITION_OK:
            flags.append("SINGLE_PARTITION")
        if "BroadcastNestedLoopJoin" in plan and n not in BNLJ_OK:
            flags.append("BNLJ")
        n_ex = len(re.findall(r"Exchange ", plan))
        status = ",".join(flags) if flags else "ok"
        print(f"{n}: exchanges={n_ex} {status}")
        bad += bool(flags)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
