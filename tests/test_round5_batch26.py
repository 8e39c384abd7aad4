"""Batch-26: grid-blocked radius self-join."""


def _brute(pts, r):
    out = []
    for i, (ia, xa, ya) in enumerate(pts):
        for ib, xb, yb in pts[i + 1 :]:
            a, b = (ia, ib) if ia < ib else (ib, ia)
            d2 = (round(xa * 1e4) - round(xb * 1e4)) ** 2 + (
                round(ya * 1e4) - round(yb * 1e4)
            ) ** 2
            if d2 <= r * r:
                out.append((a, b, d2))
    return sorted(out)


def test_radius_join_matches_bruteforce(spark):
    import random

    from smartpy_arc_spark.operators.spatial import radius_self_join

    random.seed(5)
    pts = [
        (i, random.uniform(0, 0.5), random.uniform(0, 0.5))
        for i in range(80)
    ]
    df = spark.createDataFrame(pts, "pid long, lat double, lon double")
    got = sorted(
        (r.id_a, r.id_b, r.dist2)
        for r in radius_self_join(
            df, "pid", "lat", "lon", radius_e4=300
        ).collect()
    )
    assert got == _brute(pts, 300)
    assert len(got) > 0  # dense enough to actually exercise pairs


def test_radius_join_cell_boundary_pairs_found(spark):
    from smartpy_arc_spark.operators.spatial import radius_self_join

    # two points straddling a cell boundary, well within the radius
    pts = [(1, 0.0499, 0.0), (2, 0.0501, 0.0), (3, 0.5, 0.5)]
    df = spark.createDataFrame(pts, "pid long, lat double, lon double")
    got = [
        (r.id_a, r.id_b, r.dist_e4)
        for r in radius_self_join(
            df, "pid", "lat", "lon", radius_e4=500
        ).collect()
    ]
    assert got == [(1, 2, 2)]


def test_radius_join_negative_coordinates(spark):
    from smartpy_arc_spark.operators.spatial import radius_self_join

    pts = [(1, -0.001, -0.001), (2, 0.001, 0.001)]
    df = spark.createDataFrame(pts, "pid long, lat double, lon double")
    got = [
        (r.id_a, r.id_b, r.dist2)
        for r in radius_self_join(
            df, "pid", "lat", "lon", radius_e4=100
        ).collect()
    ]
    # dlat = dlon = 20 e4-units -> d2 = 800
    assert got == [(1, 2, 800)]
