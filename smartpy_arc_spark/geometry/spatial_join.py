"""Grid-partitioned point-in-polygon spatial join.

The canonical GIS join (ArcGIS "Spatial Join" / PostGIS ST_Contains)
re-expressed as a blocked equi-join: polygons are replicated to every
grid cell their bounding box overlaps, points key into exactly one cell,
and the exact even-odd ray cast runs only on the cell-local candidates.
Candidate count is O(points × local polygon density) — never the O(n·m)
cross join — and the cell key is a plain equi-join Catalyst shuffles
hash-partitioned, so the plan scales out like any join.

The ray cast itself is a higher-order-function filter over the ring's
edge list (whole-stage codegen, no Python, no UDF): a point is inside
when an odd number of edges crosses the horizontal ray, the textbook
even-odd rule (points exactly ON an edge follow the rule's half-open
convention — deterministic, engine-portable, same as PNPOLY).

Reference surface: the reference delegates containment tests to ArcGIS
geoprocessing (smartpy_arc/arc_utils.py:901-953 joins on key equality
only); this provides the spatial-predicate join Spark lacks natively.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ray_cast_contains(px: Column, py: Column, ring: Column) -> Column:
    """Even-odd containment of point (px, py) in a CLOSED ring (first
    vertex repeated last) given as ``array<struct<x:double,y:double>>``.

    One pass over the n-1 edges via a lambda-with-index filter: edge i is
    (ring[i], ring[i+1]).  The crossing test is the PNPOLY form —
    ``(y1 > py) != (y2 > py) and px < (x2-x1)*(py-y1)/(y2-y1) + x1`` —
    kept in exactly this operand order so any IEEE engine computes
    identical booleans.
    """
    edges = F.slice(ring, 1, F.size(ring) - 1)

    def crosses(p1: Column, i: Column) -> Column:
        p2 = F.element_at(ring, i + 2)  # element_at is 1-based; i is 0-based
        y1, y2 = p1["y"], p2["y"]
        return ((y1 > py) != (y2 > py)) & (
            px
            < (p2["x"] - p1["x"]) * (py - y1) / (y2 - y1) + p1["x"]
        )

    return F.size(F.filter(edges, crosses)) % 2 == 1


def points_in_polygons(
    points: DataFrame,
    polygons: DataFrame,
    *,
    cell_size: float,
    point_id: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    poly_id: str = "poly_id",
    ring_col: str = "ring",
) -> DataFrame:
    """All (point, polygon) containment pairs via grid blocking.

    ``cell_size`` should be on the order of a typical polygon diameter:
    each polygon is replicated to the grid cells its bbox overlaps
    (bounded fan-out), each point keys into exactly one cell, so every
    candidate pair appears exactly once — no post-join dedup needed.

    Returns ``(point_id, poly_id)``.
    """
    cs = F.lit(float(cell_size))
    ring = F.col(ring_col)
    xs = F.transform(ring, lambda v: v["x"])
    ys = F.transform(ring, lambda v: v["y"])
    poly_cells = (
        polygons.withColumn("__minx", F.array_min(xs))
        .withColumn("__maxx", F.array_max(xs))
        .withColumn("__miny", F.array_min(ys))
        .withColumn("__maxy", F.array_max(ys))
        .withColumn(
            "__cx",
            F.explode(
                F.sequence(
                    F.floor(F.col("__minx") / cs), F.floor(F.col("__maxx") / cs)
                )
            ),
        )
        .withColumn(
            "__cy",
            F.explode(
                F.sequence(
                    F.floor(F.col("__miny") / cs), F.floor(F.col("__maxy") / cs)
                )
            ),
        )
    )
    px, py = F.col(x_col), F.col(y_col)
    pt_cells = points.withColumn("__cx", F.floor(px / cs)).withColumn(
        "__cy", F.floor(py / cs)
    )
    cand = pt_cells.join(poly_cells, ["__cx", "__cy"])
    hit = cand.where(
        (px >= F.col("__minx"))
        & (px <= F.col("__maxx"))
        & (py >= F.col("__miny"))
        & (py <= F.col("__maxy"))
    ).where(ray_cast_contains(px, py, F.col(ring_col)))
    return hit.select(F.col(point_id), F.col(poly_id))
