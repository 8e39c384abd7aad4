"""Equal-area polygon splitting — G1/G2/G3 (SURVEY.md §2.6).

Reference semantics (re-implemented, not ported):
  * ``split_poly`` (poly_splitting.py:13-82): binary-search a splitter along
    the longer MBR axis; clip the polygon against the left/right envelopes;
    converge when the left area is within ``search_tolerance`` (ratio) of
    the target.  Degenerate input (None, or area <= target) → (None, None).
  * ``recursive_split`` (poly_splitting.py:85-132): halve until one part;
    even counts split area in half; odd counts randomly pick which side
    gets the extra part (poly_splitting.py:118-125).  The reference uses
    unseeded ``random.random()`` — here randomness is seeded per ORIG_FID
    so results are deterministic across runs (SURVEY.md §7 hard part c).
  * ``split_equal_area`` (poly_splitting.py:135-198): per polygon,
    ``num_parts = floor(area_units / max_units)``, run the recursion, emit
    parts with lineage columns ORIG_FID + 1-based SPLIT_SEQ in depth-first
    (left-to-right) order, carrying all non-system attributes.

Spark shape: the per-polygon recursion is a scalar pandas UDF returning
``array<binary>`` of part WKBs, exploded with ``posexplode`` so SPLIT_SEQ
is the part index + 1.  Embarrassingly parallel per polygon: no shuffle,
scales linearly with partitions (the reference is a single-threaded cursor
loop, poly_splitting.py:176-198).
"""

from __future__ import annotations

import math
import random

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from smartpy_arc_spark.geometry.core import (
    Rings,
    bbox,
    clip_polygon_halfplane,
    polygon_area,
)
from smartpy_arc_spark.geometry.wkb import decode_polygon, encode_polygon

_MAX_BISECT_ITERS = 200


def split_poly(
    rings: Rings | None, target_area: float, search_tolerance: float = 0.005
) -> tuple[Rings | None, Rings | None]:
    """G1: one binary-search split along the longer MBR axis."""
    if rings is None:
        return None, None
    area = polygon_area(rings)
    if area <= target_area:
        return None, None

    xmin, ymin, xmax, ymax = bbox(rings)
    # horizontal split when the bbox is wider than tall (axis 0 = x)
    axis = 0 if (xmax - xmin) > (ymax - ymin) else 1
    d_min = xmin if axis == 0 else ymin
    d_max = xmax if axis == 0 else ymax

    left = right = None
    for _ in range(_MAX_BISECT_ITERS):
        if not d_min < d_max:
            break
        d_mid = (d_min + d_max) / 2
        left = clip_polygon_halfplane(rings, axis, d_mid, keep_le=True)
        if left is None:
            return None, None
        left_area = polygon_area(left)
        if math.fabs(1 - (left_area / target_area)) <= search_tolerance:
            right = clip_polygon_halfplane(rings, axis, d_mid, keep_le=False)
            return left, right
        if left_area > target_area:
            d_max = d_mid
        else:
            d_min = d_mid
    return None, None


def recursive_split(
    rings: Rings,
    num_parts: int,
    rng: random.Random,
    search_tolerance: float = 0.005,
) -> list[Rings]:
    """G2: recursively halve into ``num_parts`` leaves, depth-first order."""
    if num_parts <= 1:
        return [rings]
    area = polygon_area(rings)
    if num_parts % 2 == 0:
        left_parts = num_parts // 2
        left_area = area / 2
    else:
        if rng.random() > 0.5:
            left_parts = math.ceil(num_parts / 2.0)
        else:
            left_parts = math.floor(num_parts / 2.0)
        left_area = left_parts * (area / num_parts)
    right_parts = num_parts - left_parts

    left, right = split_poly(rings, left_area, search_tolerance)
    if left is None or right is None:
        # unsplittable (degenerate sliver): emit as a single part rather
        # than propagating None like the reference would
        return [rings]
    return recursive_split(left, left_parts, rng, search_tolerance) + (
        recursive_split(right, right_parts, rng, search_tolerance)
    )


def split_polygon_wkb(
    wkb: bytes, max_area_units: float, seed: int, search_tolerance: float = 0.005
) -> list[bytes]:
    """Driver kernel: WKB in → list of part WKBs (depth-first order)."""
    rings = decode_polygon(wkb)
    area = polygon_area(rings)
    num_parts = int(math.floor(area / max_area_units))
    rng = random.Random(seed)
    parts = recursive_split(rings, num_parts, rng, search_tolerance)
    return [encode_polygon(p) for p in parts]


def split_equal_area(
    df: DataFrame,
    *,
    geom_col: str = "geometry",
    oid_col: str = "OBJECTID",
    max_area_units: float,
    search_tolerance: float = 0.005,
    flds: list[str] | None = None,
    with_area: bool = False,
) -> DataFrame:
    """G3: split every polygon into ~equal parts of at most
    ``max_area_units`` (same planar units as the coordinates; the
    reference's ACRES conversion is the caller's unit choice).

    Output: ``geometry`` (part WKB), ``ORIG_FID`` (source oid), 1-based
    ``SPLIT_SEQ``, plus carried attribute columns (all non-system columns
    by default — the reference's Blob/Geometry/OID/Raster exclusion,
    poly_splitting.py:152-156).

    ``with_area=True`` additionally emits ``part_area`` — the area of
    each part, computed INSIDE the split UDF by running the exact
    ``st_area`` kernel (``columns._multipart_area``) on the just-encoded
    part WKB.  Bit-identical to a downstream ``st_area(geometry)`` call
    by construction (same bytes through the same function), but it saves
    that call's entire extra Python stage — one fewer ArrowEvalPython
    boundary, one fewer ser/deser pass over every part geometry
    (guide §4.1: control how many times columns cross the JVM↔Python
    boundary).  Measured r11: the geom_split contract query drops from
    3 Python stages to 2.
    """
    from smartpy_arc_spark.session import ensure_worker_imports

    ensure_worker_imports(df.sparkSession)
    keep = flds if flds is not None else [
        c for c in df.columns if c not in (geom_col, oid_col)
    ]

    # The bisection UDF is CPU-heavy per polygon; a small input that arrives
    # in one (or few) scan partitions would run it as single-task stages,
    # idling every other core (observed at sf0.1: 500 rows / 1 partition /
    # (0+1)/1 stages).  Spread tiny inputs across the cluster parallelism —
    # the round-robin shuffle of a few hundred raw rows is ~free, and at
    # scale the input already has >= defaultParallelism partitions so this
    # branch never fires (no shuffle added to the 100 TB path).
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    spread = max(2, parallelism // 2)
    if df.rdd.getNumPartitions() < spread:
        df = df.repartition(spread)

    if with_area:
        from smartpy_arc_spark.geometry.columns import _multipart_area

        @F.pandas_udf(T.ArrayType(T.StructType([
            T.StructField("g", T.BinaryType()),
            T.StructField("a", T.DoubleType()),
        ])))
        def parts_area_udf(wkb: pd.Series, oid: pd.Series) -> pd.Series:
            out = []
            for w, o in zip(wkb, oid):
                if w is None:
                    out.append(None)
                    continue
                ps = split_polygon_wkb(
                    bytes(w), max_area_units, seed=int(o),
                    search_tolerance=search_tolerance,
                )
                # the exact st_area kernel on the exact part bytes —
                # bit-identical to a downstream st_area(geometry)
                out.append([(p, _multipart_area(p)) for p in ps])
            return pd.Series(out)

        exploded = (
            df.withColumn(
                "_parts", parts_area_udf(F.col(geom_col), F.col(oid_col))
            )
            .select(
                F.col(oid_col).alias("ORIG_FID"),
                F.posexplode_outer("_parts").alias("_pos", "_part"),
                *[F.col(c) for c in keep],
            )
            .where(F.col("_part").isNotNull())
            .select(
                F.col("_part.g").alias("geometry"),
                "ORIG_FID",
                (F.col("_pos") + 1).cast(T.LongType()).alias("SPLIT_SEQ"),
                F.col("_part.a").alias("part_area"),
                *[F.col(c) for c in keep],
            )
        )
        return exploded

    @F.pandas_udf(T.ArrayType(T.BinaryType()))
    def parts_udf(wkb: pd.Series, oid: pd.Series) -> pd.Series:
        out = []
        for w, o in zip(wkb, oid):
            if w is None:
                out.append(None)
                continue
            out.append(
                split_polygon_wkb(
                    bytes(w), max_area_units, seed=int(o),
                    search_tolerance=search_tolerance,
                )
            )
        return pd.Series(out)

    # posexplode_outer, NOT posexplode: the non-outer form injects a
    # `size(_parts) > 0` pre-filter that Catalyst pushes below the Generate,
    # re-evaluating the (expensive) split UDF a second time per row.  The
    # outer form explodes once and the null rows are dropped by a cheap
    # post-filter on the generated column.
    exploded = (
        df.withColumn("_parts", parts_udf(F.col(geom_col), F.col(oid_col)))
        .select(
            F.col(oid_col).alias("ORIG_FID"),
            F.posexplode_outer("_parts").alias("_pos", "geometry"),
            *[F.col(c) for c in keep],
        )
        .where(F.col("geometry").isNotNull())
        .withColumn("SPLIT_SEQ", (F.col("_pos") + 1).cast(T.LongType()))
        .drop("_pos")
    )
    return exploded.select("geometry", "ORIG_FID", "SPLIT_SEQ", *keep)
