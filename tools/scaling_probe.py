#!/usr/bin/env python
"""Scaling probe for the dedup/ANN tiers (VERDICT r6 item 5).

Testdata stops at sf0.1, so this tool synthesizes larger corpora by
unioning N transformed copies of the sf0.1 ``documents``/``embeddings``
tables and measures how the four flagship dedup/ANN pipelines grow with
corpus size.  The copies are made MUTUALLY UNRELATED so workload density
stays constant and measured growth is the engine's, not an artifact of
duplicated content:

- documents: every word in copy ``i`` gets an ``_i`` suffix (word-level
  rewrite), so word-trigram shingles never collide across copies while
  each copy's internal near-dup structure is preserved exactly;
- embeddings: copy ``i`` is cyclically rotated by ``i`` positions — an
  orthogonal coordinate permutation that preserves all within-copy norms,
  dot products, and near-dup pairs, while cross-copy cosines are
  chance-level; ids shift by ``i * 10_000_000``.

Probe configurations (the 100 TB contracts):
- minhash_capped: collapse_exact + max_bucket_size=64, xxhash64
  production hash (the fast path, as a cluster would run it);
- embedding_near_dup: bounded broadcast query side (fixed 300 vectors)
  vs the growing corpus — cost must be linear in the corpus;
- ivf_ann: fixed 16-centroid codebook, fixed 5 queries — probe cost is
  queries x probed-list width, linear in the corpus;
- semdedup: k scales WITH the corpus (k = 8n — the paper's
  constant-cluster-width configuration), so intra-cluster pair work per
  row is constant.

Round-7 additions cover the two tiers the dedup/ANN probe missed:
- pagerank_3it (graph/iterative tier): the customer<->supplier trade
  graph from sf0.1 orders |x| lineitem, scaled as N node-suffixed
  DISJOINT copies (per-copy structure identical, so per-iteration work
  must be linear in edges); 3 power iterations, both directions;
- perplexity_buckets (text/gram tier): the CCNet head/middle/tail split
  on the scaled documents — the word-suffixed copies keep gram space
  growing with the corpus (no cross-copy gram collisions), the honest
  configuration for a gram-keyed shuffle.

Round-8 addition:
- sessionize_agg (window-function tier): 30-minute-gap sessionization +
  per-session aggregate over events scaled as N disjoint user
  populations (ids shifted by i * 10M, identical per-user streams) — the
  user-keyed sort-within-partition shuffle shape none of the other
  probes exercise.

Round-9 additions (VERDICT r8 items 3 and 6):
- a 100x point: COPIES now ends at 100, proving the pagerank_3it
  post-plan-flip plateau and the semdedup_2level linearity with a
  measurement instead of a three-point extrapolation.  semdedup_flat is
  SKIPPED at 100x — it is the documented quadratic the two_level config
  exists to remove; measuring it again at 100x would cost minutes to
  re-prove a known O(n²);
- geometry tier: geom_split (per-row pandas-UDF bisection — the
  rows/sec/core constant), spatial_join (grid-blocked point-in-polygon,
  point side scales, 25 polygons fixed), radius_join (grid-blocked
  radius self-join; copy i shifts latitudes by 1000 degrees so the cell
  grid is disjoint across copies — constant pair density, total work
  must be linear).

Writes SCALING.md and prints one JSON line.

Usage: python tools/scaling_probe.py [base_sf_dir] [out_md]
Env: SCALING_COPIES="1,3,10,30,100" (override the copy ladder),
     SCALING_TIERS="pagerank_3it,semdedup_2level" (restrict tiers;
     with a restriction set, SCALING.md is NOT rewritten — the JSON
     line is the record).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COPIES = tuple(
    int(x)
    for x in os.environ.get("SCALING_COPIES", "1,3,10,30,100").split(",")
)
# (tier, n) combos to skip: re-measuring a documented quadratic at 100x
# proves nothing new and costs minutes
SKIP = {("semdedup_flat", 100)}
WORK = "/tmp/scaling_corpus"

# Every tier the full matrix carries (must match probes()'s jobs dict;
# asserted there).  Used to detect tiers missing from a saved results
# file so a new tier can be merged into an existing matrix without
# re-paying the whole ladder (round 10: louvain + mst_boruvka probe the
# round-structured iterative tiers pagerank_3it alone generalized for).
TIERS = (
    "minhash_capped", "embedding_near_dup", "ivf_ann", "semdedup_flat",
    "semdedup_2level", "pagerank_3it", "perplexity_buckets",
    "sessionize_agg", "geom_split", "spatial_join", "radius_join",
    "louvain", "mst_boruvka",
)


def build_corpora(spark, base: str) -> None:
    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(base, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(base, "embeddings.parquet"))

    for n in COPIES:
        out = os.path.join(WORK, f"n{n}")
        if os.path.exists(os.path.join(out, "_DONE")):
            continue
        shutil.rmtree(out, ignore_errors=True)
        d_parts = []
        e_parts = []
        for i in range(n):
            suffixed = F.array_join(
                F.transform(
                    F.split(F.col("text"), " ", -1),
                    lambda w: F.concat(w, F.lit(f"_{i}")),
                ),
                " ",
            )
            d_parts.append(
                docs.select(
                    (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                    suffixed.alias("text"),
                    "lang",
                )
            )
            v = F.col("embedding")
            shift = i % 64
            rotated = (
                F.concat(F.slice(v, shift + 1, 64 - shift),
                         F.slice(v, 1, shift))
                if shift else v
            )
            e_parts.append(
                emb.select(
                    (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
                    rotated.alias("embedding"),
                    "label",
                )
            )
        d = d_parts[0]
        for p in d_parts[1:]:
            d = d.unionByName(p)
        e = e_parts[0]
        for p in e_parts[1:]:
            e = e.unionByName(p)
        d.write.mode("overwrite").parquet(
            os.path.join(out, "documents.parquet"))
        e.write.mode("overwrite").parquet(
            os.path.join(out, "embeddings.parquet"))
        open(os.path.join(out, "_DONE"), "w").close()

    # trade-graph edges (r7, graph-tier probe): distinct c<->s pairs from
    # orders |x| lineitem; copy i suffixes both endpoints so the scaled
    # graph is N disjoint copies of the 1x graph
    orders = spark.read.parquet(os.path.join(base, "orders.parquet")).select(
        "o_orderkey", "o_custkey"
    )
    li = spark.read.parquet(os.path.join(base, "lineitem.parquet")).select(
        "l_orderkey", "l_suppkey"
    )
    base_pairs = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
        .localCheckpoint()
    )
    for n in COPIES:
        out = os.path.join(WORK, f"n{n}")
        if os.path.exists(os.path.join(out, "_EDGES_DONE")):
            continue
        parts = [
            base_pairs.select(
                F.concat(F.col("src"), F.lit(f"_{i}")).alias("src"),
                F.concat(F.col("dst"), F.lit(f"_{i}")).alias("dst"),
            )
            for i in range(n)
        ]
        e = parts[0]
        for p in parts[1:]:
            e = e.unionByName(p)
        e.write.mode("overwrite").parquet(os.path.join(out, "edges.parquet"))
        open(os.path.join(out, "_EDGES_DONE"), "w").close()

    # weighted long-keyed edges (r10, louvain + MST tiers): the trade
    # graph BLOCKED into ~2000 components per copy (customer block
    # custkey % 2000, suppliers re-keyed per block) — Borůvka's round
    # count and louvain's coarsening depth are logarithmic in COMPONENT
    # size, so bounding components (≤ ~16 nodes) pins the per-copy
    # round count at every rung and the ladder measures pure
    # data-volume growth (a giant single component measures ~14 rounds
    # of dispatch latency instead: ~700 stages at ANY scale).  Copy i
    # shifts both endpoints by i * 10M — N disjoint copies with
    # IDENTICAL weights and structure.
    wbase = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.col("o_custkey").cast("long").alias("s"),
            (
                F.lit(1_000_000)
                + (F.col("l_suppkey") % 8)
                + (F.col("o_custkey") % 2000) * 100
            ).cast("long").alias("d"),
            ((F.col("o_custkey") * 31 + F.col("l_suppkey") * 17) % 100_000)
            .cast("long").alias("w"),
        )
        .groupBy("s", "d")
        .agg(F.min("w").alias("w"))
        .localCheckpoint()
    )
    for n in COPIES:
        out = os.path.join(WORK, f"n{n}")
        if os.path.exists(os.path.join(out, "_WEDGES_DONE")):
            continue
        parts = [
            wbase.select(
                (F.col("s") + F.lit(i * 10_000_000)).alias("s"),
                (F.col("d") + F.lit(i * 10_000_000)).alias("d"),
                "w",
            )
            for i in range(n)
        ]
        e = parts[0]
        for p in parts[1:]:
            e = e.unionByName(p)
        e.write.mode("overwrite").parquet(os.path.join(out, "wedges.parquet"))
        open(os.path.join(out, "_WEDGES_DONE"), "w").close()

    # events (r8, window-function tier): copy i shifts user_id/event_id by
    # i * 10M — disjoint user populations with identical per-user event
    # streams, so per-user window work is constant and total work must be
    # linear in events.  The base table is parquet TIMESTAMP(NANOS): go
    # through the engine scan (nanos -> µs timestamps) like the contract
    # queries do, so the written corpus carries a plain timestamp.
    from smartpy_arc_spark.sources.scan import scan

    events = scan(spark, base, "events", nanos_ts_cols=["ts"]).select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"),
        "user_id", "event_type", "value",
    )
    for n in COPIES:
        out = os.path.join(WORK, f"n{n}")
        if os.path.exists(os.path.join(out, "_EVENTS_DONE")):
            continue
        parts = [
            events.select(
                (F.col("event_id") + F.lit(i * 10_000_000)).alias("event_id"),
                "ts",
                (F.col("user_id") + F.lit(i * 10_000_000)).alias("user_id"),
                "event_type",
                "value",
            )
            for i in range(n)
        ]
        ev = parts[0]
        for p in parts[1:]:
            ev = ev.unionByName(p)
        ev.write.mode("overwrite").parquet(os.path.join(out, "events.parquet"))
        open(os.path.join(out, "_EVENTS_DONE"), "w").close()

    # geometry tier (r9): rects for split (params from the ORIGINAL
    # partkey so every copy is geometrically identical, ids shifted),
    # radius points with per-copy disjoint latitude bands, spatial
    # points with ids shifted (polygons stay the fixed 25 nations)
    from smartpy_arc_spark.geometry.columns import make_rect_wkb

    part = spark.read.parquet(os.path.join(base, "part.parquet")).where(
        "p_partkey < 500"
    )
    base_rects = part.select(
        "p_partkey",
        make_rect_wkb(
            (F.col("p_partkey") % 97).cast("double"),
            (F.col("p_partkey") % 89).cast("double"),
            (F.lit(10) + F.col("p_size")).cast("double"),
            (F.lit(5) + F.col("p_partkey") % 7).cast("double"),
        ).alias("geometry"),
    ).localCheckpoint()
    ev3k = events.where("event_id < 3000").select(
        "event_id",
        ((F.col("user_id") % 1000) / F.lit(100.0)).alias("lat"),
        ((F.col("event_id") % 1000) / F.lit(100.0)).alias("lon"),
    ).localCheckpoint()
    cust = spark.read.parquet(os.path.join(base, "customer.parquet")).select(
        F.col("c_custkey"),
        (((F.col("c_custkey") * 17) % 9000).cast("double") / 100.0).alias("x"),
        (((F.col("c_custkey") * 29) % 9000).cast("double") / 100.0).alias("y"),
    ).localCheckpoint()
    for n in COPIES:
        out = os.path.join(WORK, f"n{n}")
        if os.path.exists(os.path.join(out, "_GEOM_DONE")):
            continue
        rect_parts = [
            base_rects.select(
                (F.col("p_partkey") + F.lit(i * 10_000_000)).alias(
                    "p_partkey"
                ),
                "geometry",
            )
            for i in range(n)
        ]
        radius_parts = [
            ev3k.select(
                (F.col("event_id") + F.lit(i * 10_000_000)).alias("event_id"),
                (F.col("lat") + F.lit(i * 1000.0)).alias("lat"),
                "lon",
            )
            for i in range(n)
        ]
        pt_parts = [
            cust.select(
                (F.col("c_custkey") + F.lit(i * 10_000_000)).alias(
                    "c_custkey"
                ),
                "x",
                "y",
            )
            for i in range(n)
        ]
        for parts_, fname in (
            (rect_parts, "rects.parquet"),
            (radius_parts, "radius_points.parquet"),
            (pt_parts, "spatial_points.parquet"),
        ):
            d = parts_[0]
            for p in parts_[1:]:
                d = d.unionByName(p)
            d.write.mode("overwrite").parquet(os.path.join(out, fname))
        open(os.path.join(out, "_GEOM_DONE"), "w").close()


def probes(spark, sf_dir: str, n: int, base: str) -> dict:
    from pyspark.sql import functions as F

    from smartpy_arc_spark.geometry import split_equal_area, st_area
    from smartpy_arc_spark.geometry.spatial_join import points_in_polygons
    from smartpy_arc_spark.operators.components import (
        louvain_communities,
        minimum_spanning_forest,
        pagerank,
    )
    from smartpy_arc_spark.operators.dedup import minhash_lsh_candidates
    from smartpy_arc_spark.operators.perplexity import perplexity_buckets
    from smartpy_arc_spark.operators.semdedup import semdedup
    from smartpy_arc_spark.operators.sessionize import sessionize
    from smartpy_arc_spark.operators.similarity import _dot, ivf_topk
    from smartpy_arc_spark.operators.spatial import radius_self_join
    from smartpy_arc_spark.session import ensure_worker_imports

    ensure_worker_imports(spark)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    edges = spark.read.parquet(os.path.join(sf_dir, "edges.parquet"))
    events = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    rects = spark.read.parquet(os.path.join(sf_dir, "rects.parquet"))
    radius_pts = spark.read.parquet(
        os.path.join(sf_dir, "radius_points.parquet")
    )
    spatial_pts = spark.read.parquet(
        os.path.join(sf_dir, "spatial_points.parquet")
    )
    wedges = spark.read.parquet(os.path.join(sf_dir, "wedges.parquet"))
    nat = spark.read.parquet(os.path.join(base, "nation.parquet"))
    cx = ((F.col("n_nationkey") * 37) % 90).cast("double")
    cy = ((F.col("n_nationkey") * 73) % 90).cast("double")
    r = (F.lit(3) + F.col("n_nationkey") % 5).cast("double")

    def v(x, y):
        return F.struct(x.alias("x"), y.alias("y"))

    polys = nat.select(
        F.col("n_nationkey").alias("poly_id"),
        F.array(
            v(cx + r, cy), v(cx, cy + r), v(cx - r, cy),
            v(cx - r / 2.0, cy - r), v(cx + r / 2.0, cy - r), v(cx + r, cy),
        ).alias("ring"),
    ).localCheckpoint()
    both = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )

    def near_dup():
        va = F.col("embedding").cast("array<double>")
        q = emb.where("vec_id < 300").select(
            F.col("vec_id").alias("id_a"), va.alias("_va"),
            _dot(va, va).alias("_na2"))
        c = emb.select(
            F.col("vec_id").alias("id_b"), va.alias("_vb"),
            _dot(va, va).alias("_nb2"))
        pairs = c.join(F.broadcast(q), F.col("id_b") > F.col("id_a"))
        denom = F.sqrt(F.col("_na2") * F.col("_nb2"))
        cos = F.when(denom > 0, _dot(F.col("_va"), F.col("_vb")) / denom)
        return (pairs.select("id_a", "id_b", cos.alias("_c"))
                .where("_c > 0.45"))

    jobs = {
        "minhash_capped": lambda: minhash_lsh_candidates(
            docs, shingle_mode="word", shingle_size=3,
            collapse_exact=True, max_bucket_size=64),
        "embedding_near_dup": near_dup,
        "ivf_ann": lambda: ivf_topk(emb.where("vec_id < 5"), emb, k=5),
        "semdedup_flat": lambda: semdedup(emb, k=8 * n, threshold=0.35),
        "semdedup_2level": lambda: semdedup(
            emb, k=8 * n, threshold=0.35, two_level=True),
        "pagerank_3it": lambda: pagerank(
            both, iterations=3, damping=0.85, assume_distinct=True),
        "perplexity_buckets": lambda: perplexity_buckets(
            docs, docs.where("lang = 'en'")),
        "sessionize_agg": lambda: (
            sessionize(events, gap_minutes=30, tiebreak_col="event_id")
            .groupBy("user_id", "session_id")
            .agg(F.count("*").alias("n"), F.sum("value").alias("v"))
        ),
        "geom_split": lambda: (
            split_equal_area(
                rects, oid_col="p_partkey", max_area_units=137.0, flds=[]
            )
            .select("ORIG_FID", st_area(F.col("geometry")).alias("_a"))
            .groupBy("ORIG_FID")
            .agg(F.count(F.lit(1)).alias("n_parts"), F.sum("_a").alias("a"))
        ),
        "spatial_join": lambda: points_in_polygons(
            spatial_pts, polys, cell_size=14.0, point_id="c_custkey"
        ),
        "radius_join": lambda: radius_self_join(
            radius_pts, "event_id", "lat", "lon", radius_e4=500
        ),
        # r10: round-structured iterative graph tiers (VERDICT r9 item
        # 4) — louvain's sweep count is fixed by config but its
        # coarsening depends on community structure; Borůvka's round
        # count depends on component structure.  Disjoint copies keep
        # both per-copy constant, so super-linear growth would expose a
        # per-round shuffle defect pagerank's fixed 3 iterations can't.
        # Both run on the long-keyed weighted corpus: louvain's
        # smallest-community tie-break and parity gating are arithmetic
        # on node ids (numeric by contract, like q_louvain's graph).
        "louvain": lambda: louvain_communities(
            wedges, src_col="s", dst_col="d", weight_col="w",
            max_levels=2, max_sweeps=2,
        ),
        "mst_boruvka": lambda: minimum_spanning_forest(wedges),
    }
    assert set(jobs) == set(TIERS), sorted(set(jobs) ^ set(TIERS))
    tiers_env = os.environ.get("SCALING_TIERS")
    if tiers_env:
        keep = set(tiers_env.split(","))
        jobs = {k: fn for k, fn in jobs.items() if k in keep}
    out = {}
    for name, fn in jobs.items():
        if (name, n) in SKIP:
            continue
        fn().write.format("noop").mode("overwrite").save()  # warm-up
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
    return out


def rung_partitions(n: int) -> int:
    """Shuffle-partition count for a ladder rung — the spill-aware rule
    from the engine's design guidance applied to the probe: size
    partitions so post-shuffle hash/sort state fits task memory.  32
    (the CPU count) up to 10x; 64 at 30x; 128 at 100x — the same knob a
    cluster operator turns as data grows, so the probe measures the
    engine's scaling, not an artificially-frozen partitioning's.  (The
    r9 100x run under a frozen 32 proved the point by failing:
    pagerank's 240M-row distinct put ~7.5M string keys in each map-side
    hash aggregate and died with AGGREGATE_OUT_OF_MEMORY.)"""
    return 32 if n <= 10 else (64 if n <= 30 else 128)


def run_rung(n: int, base: str, tiers: list[str] | None = None) -> dict:
    """One ladder rung in its OWN subprocess → fresh JVM: no checkpoint
    blocks or codegen caches accumulated from smaller rungs (the r9 100x
    failure was partly prior-rung storage pressure), and per-rung
    driver-memory/partition sizing.  ``tiers`` restricts the child to a
    subset (merging a new tier into a saved matrix)."""
    env = dict(os.environ)
    env["SCALING_RUNG"] = str(n)
    if tiers is not None:
        env["SCALING_TIERS"] = ",".join(tiers)
    # uniform heap across rungs: growth ratios must compare like JVMs
    # (a 48g heap measurably DOUBLES per-job dispatch latency vs 16g on
    # this host — measured 501/933 vs 261/290 ms under the same storm —
    # so outsized heaps poison the iterative tiers).  100x fits in the
    # default 16g BECAUSE rung_partitions scales to 128 there: per-task
    # hash state is ~4x smaller than the 32-partition run that OOMed.
    out = __import__("subprocess").run(
        [sys.executable, os.path.abspath(__file__), base],
        capture_output=True, text=True, env=env,
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise SystemExit(f"rung {n} failed (rc={out.returncode})")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_md = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALING.md")

    rung = os.environ.get("SCALING_RUNG")
    if rung is not None:
        # child mode: build (idempotent), probe ONE rung, print JSON
        from bench import dispatch_ms

        from smartpy_arc_spark import get_spark

        n = int(rung)
        spark = get_spark(
            f"scaling_probe_n{n}", shuffle_partitions=rung_partitions(n)
        )
        build_corpora(spark, base)
        pre = dispatch_ms(spark)
        out = probes(spark, os.path.join(WORK, f"n{n}"), n, base)
        out["_dispatch_ms"] = {"pre": pre, "post": dispatch_ms(spark)}
        print(json.dumps(out))
        return

    results: dict[int, dict] = {}
    prior_path = os.environ.get("SCALING_FROM")
    redo = {int(x) for x in os.environ.get("SCALING_REDO", "").split(",")
            if x}
    if prior_path:
        # regenerate the md from a saved results JSON (the line main()
        # prints / the file it drops), re-probing only SCALING_REDO
        # rungs and any tiers a saved rung is missing — lets a storm-hit
        # rung be re-measured, or a new tier merged into the matrix,
        # without paying for the whole ladder again
        with open(prior_path) as f:
            saved = json.load(f)
        if "results" not in saved:
            raise SystemExit(
                f"{prior_path} has no 'results' key — expected the file "
                "this tool writes (/tmp/scaling_results.json)"
            )
        results = {int(k): v for k, v in saved["results"].items()}
        absent = [n for n in COPIES if n not in results]
        if absent:
            # ADVICE r9: a saved rung set that doesn't cover COPIES is a
            # plan, not an error — the loop below probes them fresh
            print(f"saved results lack rungs {absent}; probing fresh",
                  flush=True)

    def measure(n: int, tiers: list[str] | None = None) -> dict:
        # the host's per-job dispatch latency drifts hour-to-hour; a
        # rung measured in a degraded regime poisons the growth column,
        # so retry (fresh JVM each time) until the rung's own dispatch
        # probe reads idle-ish, keeping the best-regime attempt
        best = None
        for _attempt in range(3):
            r = run_rung(n, base, tiers)
            d = max(r["_dispatch_ms"]["pre"], r["_dispatch_ms"]["post"])
            if best is None or d < max(
                best["_dispatch_ms"]["pre"], best["_dispatch_ms"]["post"]
            ):
                best = r
            if d <= 150:
                break
            print(f"n={n}: degraded regime ({d} ms/job), retrying",
                  flush=True)
        return best

    for n in COPIES:
        if n in results and n not in redo:
            missing = [
                t for t in TIERS
                if t not in results[n] and (t, n) not in SKIP
            ]
            if missing:
                print(f"n={n}: probing missing tiers {missing}",
                      flush=True)
                r = measure(n, tiers=missing)
                results[n].update(
                    {k: v for k, v in r.items() if not k.startswith("_")})
                # merged tiers ran under their OWN dispatch regime, not
                # the one in the rung's original _dispatch_ms header —
                # keep their provenance separate so the md's per-rung
                # regime row stays honest for the original columns
                results[n].setdefault("_dispatch_ms_merged", {}).update(
                    {t: r["_dispatch_ms"] for t in missing if t in r})
            continue
        results[n] = measure(n)
        print(f"n={n}: {results[n]}", flush=True)
    payload = {"results": {str(k): v for k, v in results.items()}}
    with open("/tmp/scaling_results.json", "w") as f:
        json.dump(payload, f)
    # durable copy (SCALING_FROM source for future rounds; /tmp is not)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "scaling_results.json"), "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
        f.write("\n")

    if os.environ.get("SCALING_TIERS"):
        # restricted run: the JSON line is the record; don't clobber the
        # full-matrix SCALING.md
        print(json.dumps({"metric": "scaling_probe_partial",
                          "results": results}))
        return

    seen = {k for r in results.values() for k in r if not k.startswith("_")}
    names = [k for k in TIERS if k in seen] + sorted(seen - set(TIERS))
    disp = ", ".join(
        f"{n}x: {results[n]['_dispatch_ms']['pre']}/"
        f"{results[n]['_dispatch_ms']['post']}"
        for n in COPIES
    )
    merged_notes = [
        f"{n}x {tier}: {d['pre']}/{d['post']}"
        for n in COPIES
        for tier, d in sorted(results[n].get("_dispatch_ms_merged", {}).items())
    ]
    merge_line = (
        "Tiers merged into a saved matrix ran under their own regime: "
        + "; ".join(merged_notes) + "."
        if merged_notes else ""
    )
    lines = [
        "# Scaling probe — dedup/ANN tiers beyond sf0.1",
        "",
        "Generated by `tools/scaling_probe.py` (see its docstring for the",
        "corpus construction: N mutually-unrelated transformed copies of",
        "the sf0.1 tables, constant workload density).  Times are warm",
        "min-of-2 noop-sink walls; each rung runs in its OWN fresh JVM",
        "with shuffle partitions sized to the rung (32/64/128 — the",
        "spill-aware knob a cluster operator turns as data grows) and is",
        "retried when its dispatch probe reads a degraded host regime.",
        f"Per-rung dispatch ms/job (pre/post): {disp}.",
        *([merge_line] if merge_line else []),
        "The honest signal is the",
        f"GROWTH RATIO vs the {COPIES[-1]}x size ratio, not the absolute numbers.",
        "",
        "| probe | config | "
        + " | ".join(f"{n}x (s)" for n in COPIES)
        + f" | {COPIES[-1]}x/1x growth |",
        "|---|---|" + "---|" * (len(COPIES) + 1),
    ]
    cfg = {
        "minhash_capped": "collapse_exact, cap 64, xxhash64",
        "embedding_near_dup": "fixed 300-vector broadcast side",
        "ivf_ann": "16 centroids, 5 queries",
        "semdedup_flat": "k = 8n, flat O(n*k) assignment",
        "semdedup_2level": "k = 8n, coarse->fine O(n*sqrt(k))",
        "pagerank_3it": "trade graph, 3 power iterations",
        "perplexity_buckets": "CCNet trigram LM + tertiles",
        "sessionize_agg": "30-min gap windows + session agg",
        "geom_split": "equal-area bisection pandas UDF",
        "spatial_join": "grid point-in-poly, 25 fixed polys",
        "radius_join": "grid radius self-join, disjoint bands",
        "louvain": "2 levels x 2 sweeps + coarsen",
        "mst_boruvka": "Borůvka rounds to convergence",
    }
    growth = {}
    for name in names:
        ts = [results[n].get(name) for n in COPIES]
        measured = [(n, t) for n, t in zip(COPIES, ts) if t is not None]
        hi_n, hi_t = measured[-1]
        g = round(hi_t / measured[0][1], 2) if measured[0][1] > 0 else float(
            "nan")
        growth[name] = g
        suffix = f" {g}x" + (f" @{hi_n}x" if hi_n != COPIES[-1] else "")
        lines.append(
            f"| {name} | {cfg.get(name, '')} | "
            + " | ".join("skip" if t is None else str(t) for t in ts)
            + f" |{suffix} |")
    lines += [
        "",
        f"A growth ratio at or below {COPIES[-1]}x on a {COPIES[-1]}x",
        "corpus means the pipeline is at-worst linear at this scale",
        "(well below it indicates fixed per-job overhead still",
        "amortizing).",
        "",
        "Findings (r7): minhash/near-dup/IVF grow far sub-linearly —",
        "band/bucket-keyed with no corpus-quadratic stage.  The probe",
        "CAUGHT a real quadratic: SemDeDup with the required k ∝ corpus",
        "makes flat nearest-centroid assignment O(n·k) = O(n²/width);",
        "its quadratic term is visible in the flat-vs-two-level gap at",
        "30x and would dominate beyond it.  `two_level=True` (coarse →",
        "fine, O(n·√k) — the IVF trick) removes that term; its residual",
        "growth is the intra-cluster pair stage, which is linear by",
        "construction (constant cluster width × k clusters).  two_level",
        "is the documented 100 TB configuration for `semdedup`; the flat",
        "path remains for exact oracle-compared runs at bounded k, where",
        "its two fewer shuffle stages make it faster.",
        "",
        "Round-7 tier additions: `pagerank_3it` probes the iterative",
        "graph tier (per-iteration cost must be linear in edges — the",
        "scaled graph is N disjoint copies, so any super-linear growth",
        "would expose a shuffle/skew defect in the power-iteration",
        "join); `perplexity_buckets` probes the gram-keyed text tier",
        "(gram space grows with the corpus by construction, so the LM",
        "count shuffle and the per-doc scoring join both scale).",
        "",
        "Round-7 probe readings: `pagerank_3it`'s step at 3x followed",
        "by a PLATEAU through 30x is a broadcast-threshold plan flip,",
        "not a defect: at 1x the rank/degree joins ride under AQE's",
        "broadcast cutoff; past it they become co-partitioned shuffle",
        "joins — the configuration a real cluster runs from the start —",
        "and from there growth is far sub-linear.  Probing the step",
        "surfaced one real build-side bug, fixed in",
        "`operators/components.py`: the dangling-mass anti-join's right",
        "side was the NON-DISTINCT edge src projection (an edge-sized",
        "hash relation rebuilt every round); it is now the distinct",
        "out-node set, checkpointed once.",
        "",
        "Round-8 tier addition: `sessionize_agg` probes the",
        "window-function tier — a user-keyed sort-within-partition",
        "shuffle none of the other probes exercise.  With N disjoint",
        "user populations (identical per-user streams) total work must",
        "be linear in events; the measured sub-3x growth on a 30x",
        "corpus confirms the gap-flag + cumulative-sum window plan has",
        "no cross-user term, and the dangling-mass redistribution in",
        "pagerank now rides a round-invariant is_dangling flag on the",
        "checkpointed rank table (r8) — a filter instead of a per-round",
        "anti-join, with identical probe growth.",
        "",
        "Round-9 additions: the ladder now ends at 100x, replacing the",
        "three-point extrapolation for the two tiers whose 100 TB story",
        "depended on it — `pagerank_3it`'s post-broadcast-flip plateau",
        "and `semdedup_2level`'s linearity are now measured, not argued",
        "(`semdedup_flat` is skipped at 100x: it is the documented",
        "quadratic the two_level config removes).  The geometry tier",
        "joins the matrix: `geom_split` is the per-row pandas-UDF",
        "bisection (embarrassingly parallel — its growth is the",
        "rows/sec/core constant), `spatial_join` scales the point side",
        "against 25 fixed polygons (candidate pairs linear in points),",
        "and `radius_join` scales point count with per-copy disjoint",
        "latitude bands so pair density is constant and any",
        "super-linear growth would expose a cell-join defect.",
        "",
        "Round-10 additions (VERDICT r9 items 4/6): `louvain` and",
        "`mst_boruvka` probe the ROUND-STRUCTURED iterative graph tiers",
        "that 3-iteration pagerank generalized for — louvain's",
        "coarsening depth and Borůvka's round count depend on graph",
        "structure, so each runs on a BLOCKED trade graph (~2000",
        "components per copy, components ≤ ~16 nodes): round counts are",
        "logarithmic in COMPONENT size, so bounding components pins the",
        "per-copy round count at every rung and the ladder measures",
        "data-volume growth (on the unblocked single giant component",
        "both algorithms execute ~700 dispatch-bound stages at ANY",
        "scale — measured before choosing the blocked corpus).  Both",
        "came back strongly sub-linear on the 100x corpus (louvain",
        "~19x, mst ~13x).  The 3x rung was re-measured under the",
        "<150 ms dispatch gate; note the sub-second tiers",
        "(sessionize/geometry/radius) remain non-monotone ACROSS rungs",
        "because each rung's absolute wall is dominated by that rung's",
        "dispatch regime (post-probe 97-177 ms across columns) — the",
        "growth column against the matched 1x/100x regimes is the",
        "honest signal, as the header says.",
        "",
    ]
    with open(out_md, "w") as f:
        f.write("\n".join(lines))
    print(json.dumps({"metric": "scaling_probe", "results": results,
                      f"growth_{COPIES[-1]}x": growth}))


if __name__ == "__main__":
    main()
