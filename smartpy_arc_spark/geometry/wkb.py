"""Minimal WKB codec: Point, Polygon, MultiPolygon (2D, little-endian).

Covers the wire encodings the reference round-trips (WKB/WKT/GeoJSON,
arc_utils.py:970-978); ESRISHAPE/ESRIJSON are geodatabase-specific and out
of scope.  A polygon is represented in memory as ``list[np.ndarray]`` of
(n, 2) float64 ring coordinate arrays — ring 0 the outer ring, the rest
holes.  Rings are stored closed (first point == last point).
"""

from __future__ import annotations

import struct

import numpy as np

WKB_POINT = 1
WKB_POLYGON = 3
WKB_MULTIPOLYGON = 6

Rings = list  # list[np.ndarray (n,2)]


def encode_point(x: float, y: float) -> bytes:
    return struct.pack("<BIdd", 1, WKB_POINT, x, y)


def encode_polygon(rings: Rings) -> bytes:
    parts = [struct.pack("<BII", 1, WKB_POLYGON, len(rings))]
    for ring in rings:
        arr = np.asarray(ring, dtype="<f8")
        if not np.array_equal(arr[0], arr[-1]):
            arr = np.vstack([arr, arr[:1]])
        parts.append(struct.pack("<I", len(arr)))
        parts.append(arr.tobytes())
    return b"".join(parts)


def _read_uint32(buf: memoryview, off: int, little: bool) -> tuple[int, int]:
    (v,) = struct.unpack_from("<I" if little else ">I", buf, off)
    return v, off + 4


def _decode_polygon_body(buf: memoryview, off: int, little: bool) -> tuple[Rings, int]:
    n_rings, off = _read_uint32(buf, off, little)
    rings: Rings = []
    for _ in range(n_rings):
        n_pts, off = _read_uint32(buf, off, little)
        arr = np.frombuffer(
            buf, dtype="<f8" if little else ">f8", count=n_pts * 2, offset=off
        ).reshape(n_pts, 2).astype(np.float64)
        off += n_pts * 16
        rings.append(arr)
    return rings, off


_EWKB_SRID_FLAG = 0x20000000
_EWKB_Z_FLAG = 0x80000000
_EWKB_M_FLAG = 0x40000000


def decode(wkb: bytes):
    """Decode WKB → ("point", (x, y)) | ("polygon", rings) |
    ("multipolygon", list[rings]).

    PostGIS-style EWKB SRID payloads are consumed (the SRID itself is
    carried as column metadata, not per-value); Z/M geometries raise — a
    silent 2D misparse would corrupt every coordinate."""
    buf = memoryview(wkb)
    little = buf[0] == 1
    (gtype,) = struct.unpack_from("<I" if little else ">I", buf, 1)
    off = 5
    if gtype & (_EWKB_Z_FLAG | _EWKB_M_FLAG):
        raise ValueError("Z/M WKB geometries are not supported (2D only)")
    if gtype & _EWKB_SRID_FLAG:
        off += 4  # skip the embedded SRID payload
    gtype = gtype & 0xFF
    if gtype == WKB_POINT:
        x, y = struct.unpack_from("<dd" if little else ">dd", buf, off)
        return "point", (x, y)
    if gtype == WKB_POLYGON:
        rings, _ = _decode_polygon_body(buf, off, little)
        return "polygon", rings
    if gtype == WKB_MULTIPOLYGON:
        n_polys, off = _read_uint32(buf, off, little)
        polys = []
        for _ in range(n_polys):
            sub_little = buf[off] == 1
            off += 5  # byte order + geom type of each sub-polygon
            rings, off = _decode_polygon_body(buf, off, sub_little)
            polys.append(rings)
        return "multipolygon", polys
    raise ValueError(f"unsupported WKB geometry type {gtype}")


def decode_polygon(wkb: bytes) -> Rings:
    """Decode to one polygon's rings; for a multipolygon the largest part
    wins (used by the splitter, which bisects one part at a time).  For
    whole-feature measures over multipart geometry use
    :func:`decode_polygon_parts`."""
    kind, val = decode(wkb)
    if kind == "polygon":
        return val
    if kind == "multipolygon":
        from smartpy_arc_spark.geometry.core import polygon_area

        return max(val, key=polygon_area)
    raise ValueError(f"expected polygon, got {kind}")


def decode_polygon_parts(wkb: bytes) -> list:
    """Decode to a list of polygon parts (length 1 for a plain polygon) so
    area/length/centroid can aggregate over ALL parts — arcpy's SHAPE@AREA
    covers the whole multipart feature (arc_utils.py:692-701)."""
    kind, val = decode(wkb)
    if kind == "polygon":
        return [val]
    if kind == "multipolygon":
        return val
    raise ValueError(f"expected polygon, got {kind}")


# --- text encodings ---------------------------------------------------


def polygon_to_wkt(rings: Rings) -> str:
    ring_strs = []
    for ring in rings:
        arr = np.asarray(ring)
        if not np.array_equal(arr[0], arr[-1]):
            arr = np.vstack([arr, arr[:1]])
        ring_strs.append(
            "(" + ", ".join(f"{x:.10g} {y:.10g}" for x, y in arr) + ")"
        )
    return "POLYGON (" + ", ".join(ring_strs) + ")"


def point_to_wkt(x: float, y: float) -> str:
    return f"POINT ({x:.10g} {y:.10g})"


def to_wkt_str(wkb: bytes) -> str:
    kind, val = decode(wkb)
    if kind == "point":
        return point_to_wkt(*val)
    if kind == "polygon":
        return polygon_to_wkt(val)
    parts = ", ".join(polygon_to_wkt(r)[len("POLYGON ") :] for r in val)
    return "MULTIPOLYGON (" + parts + ")"


def to_geojson_str(wkb: bytes) -> str:
    import json

    kind, val = decode(wkb)
    if kind == "point":
        return json.dumps({"type": "Point", "coordinates": list(val)})
    if kind == "polygon":
        coords = [np.asarray(r).tolist() for r in val]
        return json.dumps({"type": "Polygon", "coordinates": coords})
    coords = [[np.asarray(r).tolist() for r in poly] for poly in val]
    return json.dumps({"type": "MultiPolygon", "coordinates": coords})
