"""Minimal WKB codec: Point, LineString, Polygon, MultiPoint,
MultiLineString, MultiPolygon (2D, little-endian).

Covers the wire encodings the reference round-trips — WKB/WKT/GeoJSON plus
ESRIJSON and ESRISHAPE (arc_utils.py:970-978, :1072-1078; the ESRI formats
follow the published ArcGIS REST geometry-JSON spec and the shapefile
record layout respectively — see :mod:`geometry.esrishape`).  A polygon is
represented in memory as ``list[np.ndarray]`` of (n, 2) float64 ring
coordinate arrays — ring 0 the outer ring, the rest holes.  Rings are
stored closed (first point == last point).  A polyline is a list of open
(n, 2) path arrays; a multipoint is one (n, 2) array.
"""

from __future__ import annotations

import struct

import numpy as np

WKB_POINT = 1
WKB_LINESTRING = 2
WKB_POLYGON = 3
WKB_MULTIPOINT = 4
WKB_MULTILINESTRING = 5
WKB_MULTIPOLYGON = 6

Rings = list  # list[np.ndarray (n,2)]


def encode_point(x: float, y: float) -> bytes:
    return struct.pack("<BIdd", 1, WKB_POINT, x, y)


def encode_linestring(pts) -> bytes:
    arr = np.asarray(pts, dtype="<f8")
    return struct.pack("<BII", 1, WKB_LINESTRING, len(arr)) + arr.tobytes()


def encode_multilinestring(parts) -> bytes:
    out = [struct.pack("<BII", 1, WKB_MULTILINESTRING, len(parts))]
    out += [encode_linestring(p) for p in parts]
    return b"".join(out)


def encode_multipoint(pts) -> bytes:
    arr = np.asarray(pts, dtype="<f8")
    out = [struct.pack("<BII", 1, WKB_MULTIPOINT, len(arr))]
    out += [encode_point(x, y) for x, y in arr]
    return b"".join(out)


def encode_multipolygon(polys: list) -> bytes:
    out = [struct.pack("<BII", 1, WKB_MULTIPOLYGON, len(polys))]
    out += [encode_polygon(rings) for rings in polys]
    return b"".join(out)


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


def _decode_points(buf: memoryview, off: int, little: bool, n: int):
    arr = np.frombuffer(
        buf, dtype="<f8" if little else ">f8", count=n * 2, offset=off
    ).reshape(n, 2).astype(np.float64)
    return arr, off + n * 16


def decode(wkb: bytes):
    """Decode WKB → ("point", (x, y)) | ("linestring", arr) |
    ("polygon", rings) | ("multipoint", arr) |
    ("multilinestring", list[arr]) | ("multipolygon", list[rings]).

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
    if gtype == WKB_LINESTRING:
        n_pts, off = _read_uint32(buf, off, little)
        arr, _ = _decode_points(buf, off, little, n_pts)
        return "linestring", arr
    if gtype == WKB_POLYGON:
        rings, _ = _decode_polygon_body(buf, off, little)
        return "polygon", rings
    if gtype == WKB_MULTIPOINT:
        n_pts, off = _read_uint32(buf, off, little)
        pts = []
        for _ in range(n_pts):
            sub_little = buf[off] == 1
            off += 5
            x, y = struct.unpack_from("<dd" if sub_little else ">dd", buf, off)
            off += 16
            pts.append((x, y))
        return "multipoint", np.asarray(pts, dtype=np.float64).reshape(-1, 2)
    if gtype == WKB_MULTILINESTRING:
        n_lines, off = _read_uint32(buf, off, little)
        lines = []
        for _ in range(n_lines):
            sub_little = buf[off] == 1
            off += 5
            n_pts, off = _read_uint32(buf, off, sub_little)
            arr, off = _decode_points(buf, off, sub_little, n_pts)
            lines.append(arr)
        return "multilinestring", lines
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


def _coords_str(arr) -> str:
    return "(" + ", ".join(f"{x:.10g} {y:.10g}" for x, y in np.asarray(arr)) + ")"


def to_wkt_str(wkb: bytes) -> str:
    kind, val = decode(wkb)
    if kind == "point":
        return point_to_wkt(*val)
    if kind == "linestring":
        return "LINESTRING " + _coords_str(val)
    if kind == "polygon":
        return polygon_to_wkt(val)
    if kind == "multipoint":
        return "MULTIPOINT " + _coords_str(val)
    if kind == "multilinestring":
        return "MULTILINESTRING (" + ", ".join(_coords_str(p) for p in val) + ")"
    parts = ", ".join(polygon_to_wkt(r)[len("POLYGON ") :] for r in val)
    return "MULTIPOLYGON (" + parts + ")"


def to_geojson_str(wkb: bytes) -> str:
    import json

    kind, val = decode(wkb)
    if kind == "point":
        return json.dumps({"type": "Point", "coordinates": list(val)})
    if kind == "linestring":
        return json.dumps({"type": "LineString", "coordinates": np.asarray(val).tolist()})
    if kind == "polygon":
        coords = [np.asarray(r).tolist() for r in val]
        return json.dumps({"type": "Polygon", "coordinates": coords})
    if kind == "multipoint":
        return json.dumps({"type": "MultiPoint", "coordinates": np.asarray(val).tolist()})
    if kind == "multilinestring":
        coords = [np.asarray(p).tolist() for p in val]
        return json.dumps({"type": "MultiLineString", "coordinates": coords})
    coords = [[np.asarray(r).tolist() for r in poly] for poly in val]
    return json.dumps({"type": "MultiPolygon", "coordinates": coords})


# --- ESRI JSON (ArcGIS REST API geometry-JSON spec) -------------------
# point: {"x","y"}; multipoint: {"points"}; polyline: {"paths"};
# polygon: {"rings"} with outer rings CLOCKWISE, holes counter-clockwise.


def _oriented(ring, clockwise: bool) -> list:
    from smartpy_arc_spark.geometry.core import ring_signed_area

    arr = np.asarray(ring, dtype=np.float64)
    if not np.array_equal(arr[0], arr[-1]):
        arr = np.vstack([arr, arr[:1]])
    is_ccw = ring_signed_area(arr) > 0
    if is_ccw == clockwise:
        arr = arr[::-1]
    return arr.tolist()


def to_esrijson_str(wkb: bytes) -> str:
    """WKB → ESRI geometry JSON (arc_utils.py:970-978's AsShape interop)."""
    import json

    kind, val = decode(wkb)
    if kind == "point":
        return json.dumps({"x": val[0], "y": val[1]})
    if kind == "multipoint":
        return json.dumps({"points": np.asarray(val).tolist()})
    if kind == "linestring":
        return json.dumps({"paths": [np.asarray(val).tolist()]})
    if kind == "multilinestring":
        return json.dumps({"paths": [np.asarray(p).tolist() for p in val]})
    if kind == "polygon":
        rings = [_oriented(val[0], True)] + [_oriented(h, False) for h in val[1:]]
        return json.dumps({"rings": rings})
    rings = []
    for poly in val:  # multipolygon flattens: ESRI polygons are inherently multipart
        rings.append(_oriented(poly[0], True))
        rings.extend(_oriented(h, False) for h in poly[1:])
    return json.dumps({"rings": rings})


def from_esrijson_str(s: str) -> bytes:
    """ESRI geometry JSON → WKB.  Ring grouping: a clockwise ring starts a
    new polygon part; counter-clockwise rings are holes of the preceding
    part (the shapefile/geodatabase convention)."""
    import json

    from smartpy_arc_spark.geometry.core import ring_signed_area

    obj = json.loads(s)
    if "x" in obj and "y" in obj:
        return encode_point(float(obj["x"]), float(obj["y"]))
    if "points" in obj:
        return encode_multipoint(obj["points"])
    if "paths" in obj:
        paths = [np.asarray(p, dtype=np.float64) for p in obj["paths"]]
        if len(paths) == 1:
            return encode_linestring(paths[0])
        return encode_multilinestring(paths)
    if "rings" in obj:
        parts: list[Rings] = []
        for raw in obj["rings"]:
            ring = np.asarray(raw, dtype=np.float64)
            if ring_signed_area(ring) <= 0 or not parts:  # CW (ESRI outer)
                parts.append([ring])
            else:
                parts[-1].append(ring)
        if len(parts) == 1:
            return encode_polygon(parts[0])
        return encode_multipolygon(parts)
    raise ValueError(f"unrecognized esri json geometry: {list(obj)}")


def from_geojson_str(s: str) -> bytes:
    """GeoJSON geometry object → WKB."""
    import json

    obj = json.loads(s)
    t = obj["type"]
    c = obj["coordinates"]
    if t == "Point":
        return encode_point(float(c[0]), float(c[1]))
    if t == "MultiPoint":
        return encode_multipoint(c)
    if t == "LineString":
        return encode_linestring(c)
    if t == "MultiLineString":
        return encode_multilinestring([np.asarray(p, dtype=np.float64) for p in c])
    if t == "Polygon":
        return encode_polygon([np.asarray(r, dtype=np.float64) for r in c])
    if t == "MultiPolygon":
        return encode_multipolygon(
            [[np.asarray(r, dtype=np.float64) for r in poly] for poly in c]
        )
    raise ValueError(f"unsupported geojson type {t!r}")


def _parse_wkt_coords(body: str) -> np.ndarray:
    pts = [p.strip().split() for p in body.split(",")]
    return np.asarray([[float(x), float(y)] for x, y, *_ in pts], dtype=np.float64)


def _split_wkt_groups(body: str) -> list[str]:
    """Split a parenthesized WKT body into its top-level (...) groups."""
    groups, depth, start = [], 0, None
    for i, ch in enumerate(body):
        if ch == "(":
            if depth == 0:
                start = i + 1
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                groups.append(body[start:i])
    return groups


def from_wkt_str(s: str) -> bytes:
    """WKT → WKB for the six supported 2D types."""
    s = s.strip()
    head, _, body = s.partition("(")
    tag = head.strip().upper()
    body = "(" + body  # keep parens for group splitting
    inner = body.strip()[1:-1]  # contents inside the outermost parens
    if tag == "POINT":
        x, y = inner.split()
        return encode_point(float(x), float(y))
    if tag == "LINESTRING":
        return encode_linestring(_parse_wkt_coords(inner))
    if tag == "MULTIPOINT":
        # both "MULTIPOINT (1 2, 3 4)" and "MULTIPOINT ((1 2), (3 4))"
        if "(" in inner:
            pts = [_parse_wkt_coords(g)[0] for g in _split_wkt_groups(inner)]
            return encode_multipoint(np.asarray(pts))
        return encode_multipoint(_parse_wkt_coords(inner))
    if tag == "POLYGON":
        return encode_polygon([_parse_wkt_coords(g) for g in _split_wkt_groups(inner)])
    if tag == "MULTILINESTRING":
        return encode_multilinestring(
            [_parse_wkt_coords(g) for g in _split_wkt_groups(inner)]
        )
    if tag == "MULTIPOLYGON":
        return encode_multipolygon(
            [
                [_parse_wkt_coords(r) for r in _split_wkt_groups(g)]
                for g in _split_wkt_groups(inner)
            ]
        )
    raise ValueError(f"unsupported wkt type {tag!r}")
