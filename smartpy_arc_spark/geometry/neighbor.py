"""Grid-bucketed geo neighbor join (haversine within radius).

The scalable alternative to a cross-join distance filter: bucket points
into lat/lon grid cells sized >= the search radius, join each point
against its own and the 8 surrounding cells (a bounded 9x fan-out), and
apply the exact haversine test only to those candidates.  The classic
spatial-blocking pattern — candidate count is O(points x density), never
O(n²), and the cell key is an equi-join Catalyst shuffles normally.

Reference geometry surface (arc_utils.py:586-606 works on projected
areas/lengths); this extends it to geographic neighbor search, which the
reference delegates to ArcGIS proximity tools.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km (spherical earth, the standard
    haversine form — asin/sqrt composition, built-ins only)."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    a = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon) * F.sin(dlon)
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def neighbor_join(
    left: DataFrame,
    right: DataFrame,
    *,
    radius_km: float,
    left_id: str = "id",
    right_id: str = "id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    max_abs_lat: float = 66.0,
) -> DataFrame:
    """All (left, right) pairs within ``radius_km`` great-circle distance.

    Cell height is ``radius_km`` in latitude degrees.  Longitude degrees
    SHRINK by cos(lat) away from the equator, so lon cells are sized for
    the dataset's worst-case latitude ``max_abs_lat`` (default 66° ->
    ~2.5x wider cells everywhere; more candidates, never a miss).  Data
    beyond ``max_abs_lat`` would silently miss neighbors — polar-capable
    deployments should use a geohash/S2-style equal-area key instead.
    Output: (left id, right id, dist_km rounded to 4), excluding
    self-pairs when ids collide.
    """
    cell_deg_lat = radius_km / 111.045  # km per degree latitude
    cell_deg_lon = radius_km / (111.045 * math.cos(math.radians(max_abs_lat)))
    lat_cell = F.floor(F.col(lat_col) / F.lit(cell_deg_lat)).cast("long")
    lon_cell = F.floor(F.col(lon_col) / F.lit(cell_deg_lon)).cast("long")

    l = left.select(
        F.col(left_id).alias("l_id"),
        F.col(lat_col).alias("l_lat"),
        F.col(lon_col).alias("l_lon"),
        lat_cell.alias("l_cy"),
        lon_cell.alias("l_cx"),
    )
    # replicate the RIGHT side into its 3x3 neighborhood so the join is a
    # plain equi-join on the cell key (bounded 9x blow-up on one side)
    r = right.select(
        F.col(right_id).alias("r_id"),
        F.col(lat_col).alias("r_lat"),
        F.col(lon_col).alias("r_lon"),
        lat_cell.alias("r_cy"),
        lon_cell.alias("r_cx"),
    ).select(
        "*",
        F.explode(
            F.array(*[F.lit(d) for d in (-1, 0, 1)])
        ).alias("dy"),
    ).select(
        "*",
        F.explode(
            F.array(*[F.lit(d) for d in (-1, 0, 1)])
        ).alias("dx"),
    )
    cand = l.join(
        r,
        (l["l_cy"] == r["r_cy"] + r["dy"]) & (l["l_cx"] == r["r_cx"] + r["dx"]),
    )
    dist = haversine_km(
        F.col("l_lat"), F.col("l_lon"), F.col("r_lat"), F.col("r_lon")
    )
    return (
        cand.where(F.col("l_id") != F.col("r_id"))
        .withColumn("dist_km", F.round(dist, 4))
        .where(F.col("dist_km") <= radius_km)
        .select("l_id", "r_id", "dist_km")
    )
