#!/usr/bin/env python
"""Spark-only wall-clock scan of EVERY declared query (no oracle, no
toPandas): one warmed session, per query one warm-up noop + one timed noop.

Coarse by design — a triage radar for queries whose Spark-side cost is out
of line with their shape, not a benchmark.  Usage:

    python tools/time_all.py [sf_dir] > /tmp/time_all.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import __spark_entry__ as mod
    from smartpy_arc_spark import get_spark

    spark = get_spark("time-all")
    qs = mod.queries()

    # warm the JVM until the dispatch probe settles (the r11 finding:
    # fresh JVMs probe 200-340 ms/job and settle under ~100 only after
    # minutes of jobs — unwarmed scans rank everything by position)
    def dispatch_ms(n=5):
        probe = spark.range(1000).repartition(30).localCheckpoint()
        probe.count()
        t0 = time.perf_counter()
        for _ in range(n):
            probe.count()
        return (time.perf_counter() - t0) / n * 1000

    t_warm = time.time()
    while dispatch_ms() > 100 and time.time() - t_warm < 180:
        df = spark.range(200000).repartition(32)
        df.groupBy((df.id % 97).alias("k")).count().write.format(
            "noop").mode("overwrite").save()

    out = {}
    for name, fn in qs.items():
        try:
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            warm = round(time.perf_counter() - t0, 3)
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            out[name] = {"warm": warm, "timed": round(time.perf_counter() - t0, 3)}
        except Exception as e:  # noqa: BLE001 — triage tool, record and move on
            out[name] = {"error": f"{type(e).__name__}: {e}"[:200]}
        print(f"{name}: {out[name]}", file=sys.stderr, flush=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
