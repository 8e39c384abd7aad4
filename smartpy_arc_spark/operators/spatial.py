"""Spatial point joins without the cartesian product.

The all-pairs trap: "find every pair of points within distance R" is
O(n²) if expressed as a cross join.  The scale-safe shape is grid
blocking — quantize each point to an R-sized cell, explode ONE side to
its 3×3 cell neighborhood, hash-join on the cell id, then verify the
exact distance predicate.  Every qualifying pair meets exactly once
(the un-exploded side's cell is unique), candidate count is bounded by
local density × 9 cells, and the join is an ordinary shuffled/broadcast
hash join Catalyst can plan.

Coordinates are integer e4 degree units throughout (the repo's
fixed-point contract), with the distance verified as an exact integer
``dlat² + dlon²`` comparison — no trig, no floats.  For true-sphere
semantics swap the verify expression for haversine at the cost of
engine-portable exactness (documented, not default).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def radius_self_join(
    df: DataFrame,
    id_col: str,
    lat_col: str,
    lon_col: str,
    *,
    radius_e4: int,
) -> DataFrame:
    """All point pairs within ``radius_e4`` integer e4-degree units
    (planar metric), each pair once (``id_a < id_b``).

    Returns ``(id_a, id_b, dist2, dist_e4)`` — ``dist2`` the exact
    integer squared distance, ``dist_e4 = round(sqrt(dist2))`` (IEEE
    sqrt of an exact integer: correctly rounded, engine-portable).
    """
    lat = F.round(F.col(lat_col).cast("double") * 10000).cast("long")
    lon = F.round(F.col(lon_col).cast("double") * 10000).cast("long")
    pts = df.select(
        F.col(id_col).alias("pid"), lat.alias("la"), lon.alias("lo")
    ).where(F.col("la").isNotNull() & F.col("lo").isNotNull())
    r = F.lit(int(radius_e4))
    cx = F.floor(F.col("la").cast("double") / r.cast("double")).cast("long")
    cy = F.floor(F.col("lo").cast("double") / r.cast("double")).cast("long")
    celled = pts.select("pid", "la", "lo", cx.alias("cx"), cy.alias("cy"))
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    a = celled.select(
        F.col("pid").alias("id_a"),
        F.col("la").alias("la_a"),
        F.col("lo").alias("lo_a"),
        F.explode(offsets).alias("o"),
        "cx",
        "cy",
    ).select(
        "id_a",
        "la_a",
        "lo_a",
        (F.col("cx") + F.col("o.dx")).alias("jx"),
        (F.col("cy") + F.col("o.dy")).alias("jy"),
    )
    b = celled.select(
        F.col("pid").alias("id_b"),
        F.col("la").alias("la_b"),
        F.col("lo").alias("lo_b"),
        F.col("cx").alias("jx"),
        F.col("cy").alias("jy"),
    )
    d2 = (F.col("la_a") - F.col("la_b")) * (
        F.col("la_a") - F.col("la_b")
    ) + (F.col("lo_a") - F.col("lo_b")) * (F.col("lo_a") - F.col("lo_b"))
    pairs = (
        a.join(b, ["jx", "jy"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", d2.alias("dist2"))
        .where(F.col("dist2") <= r * r)
    )
    return pairs.select(
        "id_a",
        "id_b",
        "dist2",
        F.round(F.sqrt(F.col("dist2").cast("double")))
        .cast("long")
        .alias("dist_e4"),
    )
