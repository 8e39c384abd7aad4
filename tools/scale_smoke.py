#!/usr/bin/env python
"""Scale smoke: execute EVERY declared query end-to-end at the given
sf_dir (default the bench scale, sf0.1 — 10x the oracle-gate scale) into
the no-op sink.  No oracle compare; this is the overflow/ANSI/skew fence
the sf0.01 sweep can't provide (r5 caught three int64-overflow bugs at
exactly this scale).  Prints one line per query and a final summary;
exits non-zero on any failure.

Usage: python tools/scale_smoke.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = set(sys.argv[2:])

    import __spark_entry__ as mod
    from smartpy_arc_spark import get_spark

    spark = get_spark("scale_smoke")
    qs = mod.queries()
    names = [n for n in qs if not only or n in only]

    failures = []
    times = {}
    t_all = time.time()
    for i, name in enumerate(names, 1):
        t0 = time.time()
        try:
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.time() - t0
            times[name] = dt
            print(f"ok    {name}: [{dt:.1f}s] ({i}/{len(names)})", flush=True)
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            traceback.print_exc(limit=3)
    wall = time.time() - t_all
    slow = sorted(times.items(), key=lambda kv: -kv[1])[:10]
    print(f"\nsummary: {len(names) - len(failures)}/{len(names)} ok, "
          f"{wall:.0f}s wall")
    print("slowest:", ", ".join(f"{n}={t:.1f}s" for n, t in slow))
    if failures:
        print("FAILURES:", " ".join(failures))
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
