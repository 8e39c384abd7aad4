"""Derived geometry columns — C3 (centroids), the scan's SHAPE@ tokens, and
encoding conversions (SURVEY.md §1.4, §2.5, §2.6).

Reference behaviors:
  * legacy scan derives SHAPE@X/SHAPE@Y always, SHAPE@AREA for polygons,
    SHAPE@LENGTH for polygons/polylines (arc_utils.py:692-701);
  * ``get_centroids`` (arc_utils.py:522-583) computes an inside-guaranteed
    point per polygon in a row-at-a-time cursor loop, keeps the original
    OID as ``src_<oidcol>`` (arc_utils.py:570), fills string nulls
    (arc_utils.py:571-573) and writes an XY point table;
  * encoding conversions among WKB/WKT/GeoJSON (arc_utils.py:970-978).

Here each derived column is an Arrow-batched pandas UDF over the WKB
column — vectorized per batch, no cursor loop, no shuffle; at 100 TB these
run at scan speed alongside the parquet reader.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from smartpy_arc_spark.geometry import core, wkb as wkb_codec


import struct as _struct

# malformed WKB raises struct.error / IndexError, not just ValueError —
# all three null out instead of failing the whole Spark job
_DECODE_ERRORS = (ValueError, _struct.error, IndexError)


def _per_geom(fn, wkb_series: pd.Series) -> list:
    out = []
    for w in wkb_series:
        if w is None:
            out.append(None)
            continue
        try:
            out.append(fn(bytes(w)))
        except _DECODE_ERRORS:
            out.append(None)
    return out


def _multipart_area(w: bytes) -> float:
    kind, val = wkb_codec.decode(w)
    if kind == "polygon":
        return core.polygon_area(val)
    if kind == "multipolygon":
        return sum(core.polygon_area(p) for p in val)
    return 0.0  # points/polylines have no area (arc_utils.py:698-701)


def _multipart_length(w: bytes) -> float:
    kind, val = wkb_codec.decode(w)
    if kind == "polygon":
        return core.polygon_perimeter(val)
    if kind == "multipolygon":
        return sum(core.polygon_perimeter(p) for p in val)
    if kind == "linestring":
        return core.path_length(val)
    if kind == "multilinestring":
        return sum(core.path_length(p) for p in val)
    return 0.0  # point/multipoint


def _multipart_interior_point(w: bytes):
    kind, val = wkb_codec.decode(w)
    if kind == "point":
        return val
    if kind == "multipoint":
        return float(val[:, 0].mean()), float(val[:, 1].mean())
    if kind == "linestring":
        return core.path_midpoint(val)
    if kind == "multilinestring":
        # on-the-feature point: midpoint of the longest part
        return core.path_midpoint(max(val, key=core.path_length))
    parts = val if kind == "multipolygon" else [val]
    # interior point of the largest part (guaranteed inside the feature)
    return core.interior_point(max(parts, key=core.polygon_area))


@F.pandas_udf(T.DoubleType())
def st_area(wkb: pd.Series) -> pd.Series:
    return pd.Series(_per_geom(_multipart_area, wkb), dtype="float64")


@F.pandas_udf(T.DoubleType())
def st_length(wkb: pd.Series) -> pd.Series:
    return pd.Series(_per_geom(_multipart_length, wkb), dtype="float64")


@F.pandas_udf(T.StructType([
    T.StructField("x", T.DoubleType()),
    T.StructField("y", T.DoubleType()),
]))
def st_centroid_xy(wkb: pd.Series) -> pd.DataFrame:
    pts = _per_geom(_multipart_interior_point, wkb)
    return pd.DataFrame(
        [(None, None) if p is None else p for p in pts], columns=["x", "y"]
    )


@F.pandas_udf(T.BinaryType())
def make_rect_wkb(
    x0: pd.Series, y0: pd.Series, w: pd.Series, h: pd.Series
) -> pd.Series:
    """Axis-aligned rectangle → WKB polygon; the deterministic geometry
    synthesizer used by oracle-checked geometry queries (an external SQL
    oracle can recompute area/length/centroid arithmetically)."""
    import numpy as np

    out = []
    for a, b, ww, hh in zip(x0, y0, w, h):
        if a is None or ww is None:
            out.append(None)
            continue
        ring = np.array([
            [a, b], [a + ww, b], [a + ww, b + hh], [a, b + hh], [a, b]
        ], dtype=float)
        out.append(wkb_codec.encode_polygon([ring]))
    return pd.Series(out)


@F.pandas_udf(T.BinaryType())
def make_lshape_wkb(
    x0: pd.Series, y0: pd.Series, dx: pd.Series, dy: pd.Series
) -> pd.Series:
    """L-shaped 2-segment polyline (right dx, then up dy) → WKB LineString;
    the deterministic polyline synthesizer for oracle-checked queries
    (length = dx+dy and the half-length midpoint are SQL-computable)."""
    out = []
    for a, b, w, h in zip(x0, y0, dx, dy):
        if a is None or w is None:
            out.append(None)
            continue
        out.append(
            wkb_codec.encode_linestring([[a, b], [a + w, b], [a + w, b + h]])
        )
    return pd.Series(out)


@F.pandas_udf(T.StringType())
def to_wkt(wkb: pd.Series) -> pd.Series:
    return pd.Series(_per_geom(wkb_codec.to_wkt_str, wkb), dtype="object")


@F.pandas_udf(T.StringType())
def to_geojson(wkb: pd.Series) -> pd.Series:
    return pd.Series(_per_geom(wkb_codec.to_geojson_str, wkb), dtype="object")


@F.pandas_udf(T.StringType())
def to_esrijson(wkb: pd.Series) -> pd.Series:
    return pd.Series(_per_geom(wkb_codec.to_esrijson_str, wkb), dtype="object")


@F.pandas_udf(T.BinaryType())
def to_esrishape(wkb: pd.Series) -> pd.Series:
    from smartpy_arc_spark.geometry import esrishape

    return pd.Series(_per_geom(esrishape.wkb_to_shape, wkb), dtype="object")


def _str_to_wkb(fn):
    def conv(s: pd.Series) -> pd.Series:
        out = []
        for v in s:
            if v is None:
                out.append(None)
                continue
            try:
                out.append(fn(v))
            except (*_DECODE_ERRORS, KeyError, TypeError):
                out.append(None)
        return pd.Series(out, dtype="object")

    return conv


from_wkt = F.pandas_udf(_str_to_wkb(wkb_codec.from_wkt_str), T.BinaryType())
from_geojson = F.pandas_udf(_str_to_wkb(wkb_codec.from_geojson_str), T.BinaryType())
from_esrijson = F.pandas_udf(_str_to_wkb(wkb_codec.from_esrijson_str), T.BinaryType())


@F.pandas_udf(T.BinaryType())
def from_esrishape(buf: pd.Series) -> pd.Series:
    from smartpy_arc_spark.geometry import esrishape

    out = []
    for v in buf:
        if v is None:
            out.append(None)
            continue
        try:
            out.append(esrishape.shape_to_wkb(bytes(v)))
        except _DECODE_ERRORS:
            out.append(None)
    return pd.Series(out, dtype="object")


_TO_ENCODING = {
    "WKB": None,
    "WKT": to_wkt,
    "GEOJSON": to_geojson,
    "ESRIJSON": to_esrijson,
    "ESRISHAPE": to_esrishape,
}
_FROM_ENCODING = {
    "WKB": None,
    "WKT": from_wkt,
    "GEOJSON": from_geojson,
    "ESRIJSON": from_esrijson,
    "ESRISHAPE": from_esrishape,
}


def encode_geometry(
    df: DataFrame, encoding: str, geom_col: str = "geometry"
) -> DataFrame:
    """Convert the canonical WKB geometry column to one of the reference's
    five wire encodings (arc_utils.py:970-978): ESRISHAPE, ESRIJSON,
    GEOJSON, WKT, WKB.  Case-insensitive; the field's encoding metadata is
    updated so a later :func:`decode_geometry` can invert it."""
    from smartpy_arc_spark.meta import tag_geometry
    from smartpy_arc_spark.session import ensure_worker_imports

    key = encoding.upper()
    if key not in _TO_ENCODING:
        raise ValueError(f"unknown geometry encoding {encoding!r}")
    conv = _TO_ENCODING[key]
    if conv is not None:
        ensure_worker_imports(df.sparkSession)
        df = df.withColumn(geom_col, conv(F.col(geom_col)))
    return tag_geometry(df, geom_col, encoding=key)


def decode_geometry(
    df: DataFrame, encoding: str, geom_col: str = "geometry"
) -> DataFrame:
    """Convert a geometry column in any supported wire encoding back to
    canonical WKB."""
    from smartpy_arc_spark.meta import tag_geometry
    from smartpy_arc_spark.session import ensure_worker_imports

    key = encoding.upper()
    if key not in _FROM_ENCODING:
        raise ValueError(f"unknown geometry encoding {encoding!r}")
    conv = _FROM_ENCODING[key]
    if conv is not None:
        ensure_worker_imports(df.sparkSession)
        df = df.withColumn(geom_col, conv(F.col(geom_col)))
    return tag_geometry(df, geom_col, encoding="WKB")


def add_geometry_derived(
    df: DataFrame, geom_col: str = "geometry", prefix: str = "SHAPE@"
) -> DataFrame:
    """The legacy scan's derived columns: <prefix>X/Y always, <prefix>AREA
    and <prefix>LENGTH for polygons (arc_utils.py:692-701)."""
    from smartpy_arc_spark.session import ensure_worker_imports

    ensure_worker_imports(df.sparkSession)
    c = st_centroid_xy(F.col(geom_col))
    return (
        df.withColumn("_c", c)
        .withColumn(f"{prefix}X", F.col("_c.x"))
        .withColumn(f"{prefix}Y", F.col("_c.y"))
        .drop("_c")
        .withColumn(f"{prefix}AREA", st_area(F.col(geom_col)))
        .withColumn(f"{prefix}LENGTH", st_length(F.col(geom_col)))
    )


def get_centroids(
    df: DataFrame,
    *,
    geom_col: str = "geometry",
    oid_col: str = "OBJECTID",
    flds_to_keep: list[str] | None = None,
    fill_str_nulls: bool = True,
) -> DataFrame:
    """C3 ``get_centroids``: per-polygon inside-guaranteed point as x/y
    columns, original id kept as ``src_<oidcol>``, optional string null
    fill — the whole reference cursor loop as one vectorized projection."""
    from smartpy_arc_spark.session import ensure_worker_imports

    ensure_worker_imports(df.sparkSession)
    keep = flds_to_keep or []
    c = st_centroid_xy(F.col(geom_col))
    out = df.select(
        c.getField("x").alias("x"),
        c.getField("y").alias("y"),
        F.col(oid_col).alias(f"src_{oid_col}"),
        *[F.col(f) for f in keep],
    )
    if fill_str_nulls:
        str_cols = {
            f.name: "" for f in out.schema.fields
            if isinstance(f.dataType, T.StringType)
        }
        if str_cols:
            out = out.na.fill(str_cols)
    return out
