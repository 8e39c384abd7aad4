#!/usr/bin/env python
"""Capture .explain("formatted") for named queries into
plans/$SPARK_GRAFT_PLAN_DIR (default r12)/<q>_<tag>.txt.

Usage: python tools/capture_plans.py <tag> [query ...]
With no query list, captures the 31 bench queries (headline + heavy tail).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]

    import bench
    import __spark_entry__ as mod
    from smartpy_arc_spark import get_spark

    if not names:
        names = bench.BENCH_QUERIES + bench.HEAVY_TAIL_QUERIES

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("capture-plans")
    qs = mod.queries()
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", os.environ.get("SPARK_GRAFT_PLAN_DIR", "r12"),
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path} ({len(buf.getvalue())} chars)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
