#!/usr/bin/env python
"""Per-query Spark JOB census via the UI REST API (VERDICT r9 item 5).

The host's per-job dispatch latency drifts 56-430 ms/job hour-to-hour
(see bench.py's drift protocol), so for driver-loop-shaped queries the
JOB COUNT — not the wall clock — is the stable round-over-round metric:
wall ≈ jobs x dispatch + compute, and only the first factor is ours.
This tool runs named ``queries()`` entries with the Spark UI enabled,
counts jobs per query via ``/api/v1/applications/<id>/jobs`` (AQE
sub-jobs included — every exchange materialization is a job), and
prints one JSON line {query: {"jobs": n, "wall_s": t}}.

Usage: python tools/job_census.py q1 q2 ...   [default: the heavy tail]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = [
    "geometric_median", "louvain", "mst", "pagerank_influence",
    "personalized_pagerank", "embedding_near_dup", "perplexity_buckets",
    "ams_f2", "bpe_encode", "semdedup",
]


def job_count(ui: str, app_id: str) -> int:
    """Highest jobId seen so far (+1), NOT len() of the /jobs list: the
    list is capped by spark.ui.retainedJobs, so once cumulative jobs pass
    the cap a length-based after-before silently undercounts toward 0
    (ADVICE r10).  jobIds are monotonic, so the max survives eviction."""
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/jobs") as r:
        jobs = json.load(r)
    return max((j["jobId"] for j in jobs), default=-1) + 1


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as mod
    from smartpy_arc_spark import get_spark

    spark = get_spark(
        "job_census",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": "4047",
            # belt-and-braces with the max-jobId counting: keep the whole
            # run's jobs visible anyway (default retention is 1000, which a
            # 10-query x 2-pass census can exceed)
            "spark.ui.retainedJobs": "100000",
        },
    )
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    qs = mod.queries()

    out = {}
    for name in names:
        fn = qs[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        before = job_count(ui, app_id)
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = round(time.perf_counter() - t0, 3)
        out[name] = {"jobs": job_count(ui, app_id) - before, "wall_s": wall}
        print(f"{name}: {out[name]}", file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
