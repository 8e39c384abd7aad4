"""Pure-numpy polygon math: area, perimeter, centroid, point-in-polygon,
axis-aligned box clipping (Sutherland–Hodgman).

These are the kernels behind the reference's derived geometry columns
(SHAPE@X/Y/AREA/LENGTH, arc_utils.py:692-701), centroid extraction
(arc_utils.py:522-583) and the polygon splitter's clip step
(poly_splitting.py:57-66, which delegates to arcpy's clip against left/right
envelopes — here re-implemented as S-H clipping against the half-plane).
"""

from __future__ import annotations

import numpy as np

Rings = list  # list[np.ndarray (n,2)], ring 0 outer, rest holes


def _closed(ring: np.ndarray) -> np.ndarray:
    ring = np.asarray(ring, dtype=np.float64)
    if len(ring) and not np.array_equal(ring[0], ring[-1]):
        ring = np.vstack([ring, ring[:1]])
    return ring


def ring_signed_area(ring: np.ndarray) -> float:
    """Shoelace formula; positive for counter-clockwise rings."""
    r = _closed(ring)
    x, y = r[:, 0], r[:, 1]
    return 0.5 * float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


def ring_length(ring: np.ndarray) -> float:
    r = _closed(ring)
    return float(np.sum(np.hypot(np.diff(r[:, 0]), np.diff(r[:, 1]))))


def path_length(path: np.ndarray) -> float:
    """Open polyline length (no implicit closure, unlike ring_length)."""
    p = np.asarray(path, dtype=np.float64)
    if len(p) < 2:
        return 0.0
    return float(np.sum(np.hypot(np.diff(p[:, 0]), np.diff(p[:, 1]))))


def path_midpoint(path: np.ndarray) -> tuple[float, float]:
    """The point halfway along the polyline's length (arcpy's polyline
    centroid contract is 'a point on the line'); vertex mean for a
    degenerate zero-length path."""
    p = np.asarray(path, dtype=np.float64)
    if len(p) == 1:
        return float(p[0, 0]), float(p[0, 1])
    seg = np.hypot(np.diff(p[:, 0]), np.diff(p[:, 1]))
    total = float(seg.sum())
    if total <= 0.0:
        return float(p[:, 0].mean()), float(p[:, 1].mean())
    target = total / 2.0
    acc = 0.0
    for i, s in enumerate(seg):
        if acc + s >= target:
            t = 0.0 if s == 0 else (target - acc) / s
            x = p[i, 0] + t * (p[i + 1, 0] - p[i, 0])
            y = p[i, 1] + t * (p[i + 1, 1] - p[i, 1])
            return float(x), float(y)
        acc += s
    return float(p[-1, 0]), float(p[-1, 1])


def polygon_area(rings: Rings) -> float:
    """Outer area minus hole areas (all as absolute values)."""
    if not rings:
        return 0.0
    area = abs(ring_signed_area(rings[0]))
    for hole in rings[1:]:
        area -= abs(ring_signed_area(hole))
    return max(area, 0.0)


def polygon_perimeter(rings: Rings) -> float:
    """Total boundary length incl. holes (matches Length($feature))."""
    return float(sum(ring_length(r) for r in rings))


def polygon_centroid(rings: Rings) -> tuple[float, float]:
    """Area-weighted centroid; holes subtract.  Falls back to the vertex
    mean for degenerate (zero-area) input."""
    cx = cy = a_sum = 0.0
    for i, ring in enumerate(rings):
        r = _closed(ring)
        x, y = r[:, 0], r[:, 1]
        cross = x[:-1] * y[1:] - x[1:] * y[:-1]
        a = 0.5 * float(np.sum(cross))
        if abs(a) < 1e-300:
            continue
        rcx = float(np.sum((x[:-1] + x[1:]) * cross)) / (6 * a)
        rcy = float(np.sum((y[:-1] + y[1:]) * cross)) / (6 * a)
        sign = 1.0 if i == 0 else -1.0
        w = sign * abs(a)
        cx += rcx * w
        cy += rcy * w
        a_sum += w
    if abs(a_sum) < 1e-300:
        pts = np.vstack(rings)
        return float(pts[:, 0].mean()), float(pts[:, 1].mean())
    return cx / a_sum, cy / a_sum


def bbox(rings: Rings) -> tuple[float, float, float, float]:
    pts = np.vstack(rings)
    return (
        float(pts[:, 0].min()),
        float(pts[:, 1].min()),
        float(pts[:, 0].max()),
        float(pts[:, 1].max()),
    )


def point_in_polygon(x: float, y: float, rings: Rings) -> bool:
    """Even-odd rule over all rings (holes flip parity)."""
    inside = False
    for ring in rings:
        r = _closed(ring)
        x0, y0 = r[:-1, 0], r[:-1, 1]
        x1, y1 = r[1:, 0], r[1:, 1]
        crosses = ((y0 <= y) & (y1 > y)) | ((y1 <= y) & (y0 > y))
        with np.errstate(divide="ignore", invalid="ignore"):
            xi = x0 + (y - y0) * (x1 - x0) / (y1 - y0)
        inside ^= bool(np.sum(crosses & (xi > x)) % 2)
    return inside


def interior_point(rings: Rings) -> tuple[float, float]:
    """A point guaranteed inside the polygon — the reference's centroid
    contract ("point somewhere inside", arc_utils.py:524-525).  Uses the
    centroid when it's interior, else the midpoint of the widest interior
    interval on the horizontal scanline through the bbox middle."""
    cx, cy = polygon_centroid(rings)
    if point_in_polygon(cx, cy, rings):
        return cx, cy
    x0, y0, x1, y1 = bbox(rings)
    y = (y0 + y1) / 2.0
    xs: list[float] = []
    for ring in rings:
        r = _closed(ring)
        ax, ay = r[:-1, 0], r[:-1, 1]
        bx, by = r[1:, 0], r[1:, 1]
        crosses = ((ay <= y) & (by > y)) | ((by <= y) & (ay > y))
        with np.errstate(divide="ignore", invalid="ignore"):
            xi = ax + (y - ay) * (bx - ax) / (by - ay)
        xs.extend(xi[crosses].tolist())
    xs.sort()
    if len(xs) >= 2:
        widths = [(xs[i + 1] - xs[i], i) for i in range(0, len(xs) - 1, 2)]
        if widths:
            _, i = max(widths)
            return (xs[i] + xs[i + 1]) / 2.0, y
    return cx, cy


def clip_ring_halfplane(
    ring: np.ndarray, axis: int, c: float, keep_le: bool
) -> np.ndarray | None:
    """Sutherland–Hodgman clip of one ring against the half-plane
    ``coord[axis] <= c`` (or >= c).  Returns None when fully outside."""
    r = _closed(ring)[:-1]  # open ring for the sweep
    if len(r) < 3:
        return None
    out: list[tuple[float, float]] = []
    n = len(r)
    for i in range(n):
        cur = r[i]
        nxt = r[(i + 1) % n]
        cur_in = (cur[axis] <= c) if keep_le else (cur[axis] >= c)
        nxt_in = (nxt[axis] <= c) if keep_le else (nxt[axis] >= c)
        if cur_in:
            out.append((cur[0], cur[1]))
        if cur_in != nxt_in:
            denom = nxt[axis] - cur[axis]
            t = 0.0 if denom == 0 else (c - cur[axis]) / denom
            ix = cur[0] + t * (nxt[0] - cur[0])
            iy = cur[1] + t * (nxt[1] - cur[1])
            out.append((ix, iy))
    if len(out) < 3:
        return None
    arr = np.asarray(out, dtype=np.float64)
    if abs(ring_signed_area(arr)) < 1e-300:
        return None
    return arr


def clip_polygon_halfplane(
    rings: Rings, axis: int, c: float, keep_le: bool
) -> Rings | None:
    """Clip outer ring + holes; None when the result is empty."""
    outer = clip_ring_halfplane(rings[0], axis, c, keep_le)
    if outer is None:
        return None
    out = [outer]
    for hole in rings[1:]:
        clipped = clip_ring_halfplane(hole, axis, c, keep_le)
        if clipped is not None:
            out.append(clipped)
    return out
