"""ESRI shape-buffer codec: the geometry payload format shared by shapefile
records and the geodatabase ESRISHAPE wire encoding (arc_utils.py:970-978,
:1072-1078 expose it via arcpy's ``SHAPE@``; the layout here follows the
published ESRI *Shapefile Technical Description* — shape type int32 LE,
then type-specific doubles/int32s, all little-endian).

Supported 2D shape types (Z/M variants are decoded by dropping the Z/M
bands, whose payload trails the XY section):

  0 Null, 1 Point, 3 PolyLine, 5 Polygon, 8 MultiPoint

Conversion is to/from this package's WKB representation
(:mod:`geometry.wkb`).  Polygon ring grouping follows the ESRI convention:
clockwise ring = outer (starts a part), counter-clockwise = hole of the
preceding part.
"""

from __future__ import annotations

import struct

import numpy as np

from smartpy_arc_spark.geometry import wkb as wkb_codec
from smartpy_arc_spark.geometry.core import ring_signed_area

SHP_NULL = 0
SHP_POINT = 1
SHP_POLYLINE = 3
SHP_POLYGON = 5
SHP_MULTIPOINT = 8

# Z/M variants: XY section is laid out identically; Z/M bands trail it
_Z_TYPES = {11: 1, 13: 3, 15: 5, 18: 8}
_M_TYPES = {21: 1, 23: 3, 25: 5, 28: 8}


def _parts_points(buf: bytes, off: int) -> tuple[list[np.ndarray], int]:
    n_parts, n_points = struct.unpack_from("<ii", buf, off)
    off += 8
    idx = np.frombuffer(buf, dtype="<i4", count=n_parts, offset=off)
    off += 4 * n_parts
    pts = np.frombuffer(buf, dtype="<f8", count=n_points * 2, offset=off)
    off += 16 * n_points
    pts = pts.reshape(n_points, 2).astype(np.float64)
    bounds = list(idx) + [n_points]
    parts = [pts[bounds[i] : bounds[i + 1]] for i in range(n_parts)]
    return parts, off


def shape_to_wkb(buf: bytes) -> bytes | None:
    """Shape buffer → WKB (None for the Null shape)."""
    (stype,) = struct.unpack_from("<i", buf, 0)
    stype = _Z_TYPES.get(stype, _M_TYPES.get(stype, stype))
    if stype == SHP_NULL:
        return None
    if stype == SHP_POINT:
        x, y = struct.unpack_from("<dd", buf, 4)
        return wkb_codec.encode_point(x, y)
    if stype == SHP_MULTIPOINT:
        (n,) = struct.unpack_from("<i", buf, 36)  # after 4-byte type + bbox
        pts = np.frombuffer(buf, dtype="<f8", count=n * 2, offset=40)
        return wkb_codec.encode_multipoint(pts.reshape(n, 2))
    if stype == SHP_POLYLINE:
        parts, _ = _parts_points(buf, 36)
        if len(parts) == 1:
            return wkb_codec.encode_linestring(parts[0])
        return wkb_codec.encode_multilinestring(parts)
    if stype == SHP_POLYGON:
        rings, _ = _parts_points(buf, 36)
        polys: list[list] = []
        for ring in rings:
            if ring_signed_area(ring) <= 0 or not polys:  # CW = outer
                polys.append([ring])
            else:
                polys[-1].append(ring)
        if len(polys) == 1:
            return wkb_codec.encode_polygon(polys[0])
        return wkb_codec.encode_multipolygon(polys)
    raise ValueError(f"unsupported shape type {stype}")


def _bbox_of(arrs: list[np.ndarray]) -> tuple[float, float, float, float]:
    pts = np.vstack(arrs)
    return (
        float(pts[:, 0].min()), float(pts[:, 1].min()),
        float(pts[:, 0].max()), float(pts[:, 1].max()),
    )


def _pack_parts(stype: int, parts: list[np.ndarray]) -> bytes:
    xmin, ymin, xmax, ymax = _bbox_of(parts)
    n_points = sum(len(p) for p in parts)
    out = [struct.pack("<i4d2i", stype, xmin, ymin, xmax, ymax, len(parts), n_points)]
    idx = 0
    for p in parts:
        out.append(struct.pack("<i", idx))
        idx += len(p)
    out += [np.ascontiguousarray(p, dtype="<f8").tobytes() for p in parts]
    return b"".join(out)


def _close_oriented(ring: np.ndarray, clockwise: bool) -> np.ndarray:
    arr = np.asarray(ring, dtype=np.float64)
    if not np.array_equal(arr[0], arr[-1]):
        arr = np.vstack([arr, arr[:1]])
    if (ring_signed_area(arr) > 0) == clockwise:
        arr = arr[::-1]
    return arr


def wkb_to_shape(wkb: bytes | None) -> bytes:
    """WKB → shape buffer (None → Null shape)."""
    if wkb is None:
        return struct.pack("<i", SHP_NULL)
    kind, val = wkb_codec.decode(bytes(wkb))
    if kind == "point":
        return struct.pack("<idd", SHP_POINT, val[0], val[1])
    if kind == "multipoint":
        arr = np.asarray(val, dtype=np.float64)
        xmin, ymin, xmax, ymax = _bbox_of([arr])
        return (
            struct.pack("<i4di", SHP_MULTIPOINT, xmin, ymin, xmax, ymax, len(arr))
            + np.ascontiguousarray(arr, dtype="<f8").tobytes()
        )
    if kind == "linestring":
        return _pack_parts(SHP_POLYLINE, [np.asarray(val, dtype=np.float64)])
    if kind == "multilinestring":
        return _pack_parts(SHP_POLYLINE, [np.asarray(p, dtype=np.float64) for p in val])
    if kind == "polygon":
        rings = [_close_oriented(val[0], True)]
        rings += [_close_oriented(h, False) for h in val[1:]]
        return _pack_parts(SHP_POLYGON, rings)
    if kind == "multipolygon":
        rings = []
        for poly in val:
            rings.append(_close_oriented(poly[0], True))
            rings.extend(_close_oriented(h, False) for h in poly[1:])
        return _pack_parts(SHP_POLYGON, rings)
    raise ValueError(f"unsupported kind {kind}")
