"""Round-7 additions: MJPEG-AVI decode tier, portable pagerank sums,
production-path dedup fences, and the deterministic mmr centroid."""

import numpy as np
import pytest


def _closed_form(r, g, b):
    """Quality-100 constant-color JPEG closed form: YCbCr forward +
    inverse with floor(x+0.5) rounding (the jpeg_decode oracle)."""
    import math

    f = lambda x: max(0, min(255, math.floor(x + 0.5)))  # noqa: E731
    y = f(0.299 * r + 0.587 * g + 0.114 * b)
    cb = f(128 - 0.168736 * r - 0.331264 * g + 0.5 * b)
    cr = f(128 + 0.5 * r - 0.418688 * g - 0.081312 * b)
    return (
        f(y + 1.402 * (cr - 128)),
        f(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)),
        f(y + 1.772 * (cb - 128)),
    )


def test_mjpg_avi_roundtrip_matches_closed_form():
    """MJPG frames (real JFIF per 00dc chunk) decode to the exact
    closed-form color at quality 100, in both 4:4:4 and 4:2:0."""
    from smartpy_arc_spark.multimodal.avi import avi_info, make_avi, parse_avi

    colors = [(40, 90, 200), (255, 0, 3), (17, 17, 17), (0, 255, 128)]
    frames = [np.full((8, 16, 3), c, dtype=np.uint8) for c in colors]
    for subsample in (False, True):
        payload = make_avi(
            frames, fps=8, codec="MJPG", quality=100, subsample=subsample
        )
        info = avi_info(payload)
        assert info["compression"] == "MJPG"
        assert (info["width"], info["height"], info["n_frames"]) == (16, 8, 4)
        decoded, _ = parse_avi(payload)
        assert len(decoded) == 4
        for c, px in zip(colors, decoded):
            assert px.shape == (8, 16, 3)
            assert tuple(int(v) for v in px[0, 0]) == _closed_form(*c)
            assert (px == px[0, 0]).all()


def test_mjpg_avi_nonconstant_frame_roundtrip():
    """A non-constant frame survives MJPG at quality 100 with bounded
    error (the DCT path is near-lossless at q100 but not exact for
    arbitrary content) — and frame ORDER is preserved."""
    from smartpy_arc_spark.multimodal.avi import make_avi, parse_avi

    rng = np.random.default_rng(7)
    frames = [rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
              for _ in range(3)]
    decoded, info = parse_avi(make_avi(frames, codec="MJPG", quality=100))
    assert len(decoded) == 3
    for a, b in zip(frames, decoded):
        assert b.shape == a.shape
        assert np.abs(a.astype(int) - b.astype(int)).max() <= 24


def test_avi_rejects_unknown_compression_fourcc():
    """An inter-frame fourcc (H264) must raise, not fake pixels."""
    from smartpy_arc_spark.multimodal.avi import make_avi, parse_avi

    payload = bytearray(make_avi(np.zeros((2, 2, 3), dtype=np.uint8)))
    idx = payload.find(b"strf")
    payload[idx + 8 + 16:idx + 8 + 20] = b"H264"  # biCompression
    with pytest.raises(NotImplementedError):
        parse_avi(bytes(payload))


def test_pagerank_portable_sum_matches_default(spark):
    """portable_sum only changes the ACCUMULATION ORDER (sorted fold) —
    ranks agree with the default path to float tolerance, and reruns of
    the portable path are bit-identical."""
    from smartpy_arc_spark.operators.components import pagerank

    edges = spark.createDataFrame(
        [(a, b) for a in range(12) for b in range(12)
         if a != b and (a * 7 + b) % 3 == 0],
        "src long, dst long",
    )
    base = {r["node"]: r["rank"]
            for r in pagerank(edges, iterations=4).collect()}
    p1 = {r["node"]: r["rank"]
          for r in pagerank(edges, iterations=4, portable_sum=True).collect()}
    p2 = {r["node"]: r["rank"]
          for r in pagerank(edges, iterations=4, portable_sum=True).collect()}
    assert p1 == p2  # bit-identical rerun
    assert set(base) == set(p1)
    for n in base:
        assert abs(base[n] - p1[n]) < 1e-12


def test_pagerank_assume_distinct_same_result(spark):
    from smartpy_arc_spark.operators.components import pagerank

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (2, 3)], "src long, dst long"
    )
    a = {r["node"]: round(r["rank"], 12)
         for r in pagerank(edges, iterations=3).collect()}
    b = {r["node"]: round(r["rank"], 12)
         for r in pagerank(edges, iterations=3,
                           assume_distinct=True).collect()}
    assert a == b


def test_prod_path_fences_pass_and_catch(spark, tmp_path):
    """The xxhash64 production-path fences return a summary row on the
    healthy path; a poisoned candidate set (star edges dropped) is the
    regression class they exist to catch — simulate by checking the
    invariant logic directly on a corpus with known exact dups."""
    import pandas as pd

    docs = spark.createDataFrame(
        pd.DataFrame({
            "doc_id": range(8),
            "text": ["same text here alpha beta gamma delta"] * 3
            + ["unrelated document %d with words" % i for i in range(5)],
        })
    )
    from smartpy_arc_spark.operators.dedup import minhash_lsh_candidates

    out = minhash_lsh_candidates(
        docs, shingle_mode="word", shingle_size=3, collapse_exact=True
    ).collect()
    pairs = {(r["id_a"], r["id_b"]): r["jaccard_est"] for r in out}
    assert pairs.get((0, 1)) == 1.0 and pairs.get((0, 2)) == 1.0


def test_two_level_assignment_routes_seeds_home(spark):
    """two_level assignment (the O(n*sqrt(k)) scale path): every seed
    vector must land in its own cluster (its coarse routing and its
    fine centroid's routing are the same computation on the same
    vector), every row gets exactly one cluster from the seed set, and
    clear-cut rows agree with the flat path."""
    from smartpy_arc_spark.operators.semdedup import assign_clusters

    rng = np.random.default_rng(11)
    # 9 well-separated anchor directions + noise rows near each anchor
    anchors = rng.normal(size=(9, 16))
    rows = [(i, [float(x) for x in anchors[i]]) for i in range(9)]
    rid = 9
    for a in range(9):
        for _ in range(6):
            v = anchors[a] + rng.normal(scale=0.01, size=16)
            rows.append((rid, [float(x) for x in v]))
            rid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    flat = {r["vec_id"]: r["cluster"]
            for r in assign_clusters(df, k=9).collect()}
    two = {r["vec_id"]: r["cluster"]
           for r in assign_clusters(df, k=9, two_level=True).collect()}
    assert set(two.values()) <= set(range(9))
    for s in range(9):
        assert two[s] == s  # seeds route home
        assert flat[s] == s
    # tight satellites of each anchor follow their anchor in BOTH paths
    # whenever the two paths agree on reachability; at minimum the two
    # paths agree on >= the seed rows plus most satellites
    agree = sum(1 for i in two if two[i] == flat[i])
    assert agree >= 9 + 40  # all seeds + the vast majority of satellites


def test_convex_hull_degenerate_groups(spark):
    """The hull operator's degenerate contracts (what the r7 QuickHull
    oracle must also reproduce): collinear clouds collapse to a 2-vertex
    LINESTRING with zero area and double-counted perimeter; a single
    repeated point is a POINT with zero everything; duplicates don't
    inflate n_vertices (but do count in n_points)."""
    from smartpy_arc_spark.geometry.hull import convex_hulls

    rows = (
        # collinear diagonal (dyadic coords — exact doubles)
        [("col", 0.0 + i * 0.25, 0.0 + i * 0.5) for i in range(5)]
        # one point, repeated
        + [("pt", 1.5, 2.5)] * 3
        # square with an interior point and a duplicated corner
        + [("sq", x, y) for x, y in
           [(0.0, 0.0), (0.0, 2.0), (2.0, 0.0), (2.0, 2.0), (1.0, 1.0),
            (0.0, 0.0)]]
    )
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {r["g"]: r for r in convex_hulls(df, "g", "x", "y").collect()}

    c = out["col"]
    assert c["n_points"] == 5 and c["n_vertices"] == 2
    assert c["hull_wkt"].startswith("LINESTRING")
    assert c["area_e4"] == 0
    # perimeter double-counts the closed 2-vertex ring: 2 * |p0 - p1|
    import math
    assert c["perimeter_e4"] == round(2 * math.sqrt(1.0**2 + 2.0**2) * 1e4)

    p = out["pt"]
    assert p["n_points"] == 3 and p["n_vertices"] == 1
    assert p["hull_wkt"].startswith("POINT")
    assert p["area_e4"] == 0 and p["perimeter_e4"] == 0

    s = out["sq"]
    assert s["n_points"] == 6 and s["n_vertices"] == 4
    assert s["area_e4"] == 4 * 10**4 and s["perimeter_e4"] == 8 * 10**4
    assert s["hull_wkt"] == "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"


def test_mmr_centroid_deterministic_rerun(spark):
    """The e9-tick centroid makes mmr_select reruns bit-identical even
    though the corpus arrives in different partition orders."""
    from smartpy_arc_spark.operators.embedding import mmr_select

    rng = np.random.default_rng(3)
    rows = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(40)]
    df1 = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    df2 = spark.createDataFrame(
        rows[::-1], "vec_id long, embedding array<double>"
    ).repartition(7)
    out1 = [(r["rank"], r["vec_id"], r["mmr_score"])
            for r in mmr_select(df1, k=5).collect()]
    out2 = [(r["rank"], r["vec_id"], r["mmr_score"])
            for r in mmr_select(df2, k=5).collect()]
    assert out1 == out2


def test_cms_portable_mode_overestimates_and_differs_only_in_buckets(spark):
    """portable_hash=True keeps every CMS guarantee (est >= exact; est ==
    exact when width >> vocabulary) while relocating buckets to the
    md5 family the DuckDB oracle mirrors."""
    from smartpy_arc_spark.operators.sketch import cms_build, cms_estimate

    words = ["a", "b", "c", "d", "e"]
    rows = [(w,) for i, w in enumerate(words) for _ in range(i + 1)]
    df = spark.createDataFrame(rows, "t string")
    exact = {w: i + 1 for i, w in enumerate(words)}

    for portable in (False, True):
        sk = cms_build(df, "t", width=4096, depth=4, portable_hash=portable)
        est = {
            r["term"]: r["est"]
            for r in cms_estimate(
                sk, words + ["zz"], width=4096, depth=4, portable_hash=portable
            ).collect()
        }
        # width 4096 >> 5 distinct terms: no collisions, so est is exact,
        # and the never-seen probe reads 0 — in BOTH hash families.
        assert est == {**exact, "zz": 0}, portable


def test_bounded_levenshtein_keeps_exact_distances(spark):
    """The threshold form must return the identical pair set and exact
    distances for every retained pair (rejects become -1 and are
    filtered) — fuzzy_link/edit_distance_pairs rely on this."""
    from pyspark.sql import functions as F

    from smartpy_arc_spark.operators.linkage import fuzzy_link

    left = spark.createDataFrame(
        [(1, "kitten"), (2, "flaw"), (3, "gumbo"), (4, "abcdefgh")],
        "lid int, lname string",
    )
    right = spark.createDataFrame(
        [(11, "sitting"), (12, "lawn"), (13, "gambol"), (14, "abcdefgh"),
         (15, "zzzzzzzz")],
        "rid int, rname string",
    )
    got = {
        (r["left_id"], r["right_id"]): r["edit_distance"]
        for r in fuzzy_link(
            left, right, left_id="lid", right_id="rid",
            left_key="lname", right_key="rname",
            max_edit=2, block_prefix=0, length_band=1000,
        ).collect()
    }
    # unbounded reference over the same cross product
    ref = {
        (r["lid"], r["rid"]): r["d"]
        for r in left.crossJoin(right)
        .select("lid", "rid", F.levenshtein("lname", "rname").alias("d"))
        .collect()
        if r["d"] <= 2
    }
    assert got == ref
    assert got[(4, 14)] == 0 and (4, 15) not in got
