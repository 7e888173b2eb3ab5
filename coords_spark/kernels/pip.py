"""Ray-casting point-in-polygon (SURVEY.md §2.3 J4; BASELINE.json:6).

Even-odd rule, vectorized over points: for each polygon edge we test all
points at once (numpy), so cost is O(edges) numpy passes over the point
array — no per-row Python. Boundary semantics are the standard half-open
crossing rule ((yi > py) != (yj > py)), which is deterministic and
consistent between the Spark engine and the pure-Python oracle.

Polygons are arrays of (x, y) float64 (any planar CRS — we use mercator
grid units); rings need not be explicitly closed (the edge from last to
first vertex is implied).
"""

from __future__ import annotations

import numpy as np


def points_in_ring(px, py, ring_x, ring_y) -> np.ndarray:
    """Even-odd containment of points (px, py) in one ring. Returns bool[N]."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    rx = np.asarray(ring_x, dtype=np.float64)
    ry = np.asarray(ring_y, dtype=np.float64)
    n = rx.shape[0]
    inside = np.zeros(px.shape, dtype=bool)
    j = n - 1
    for i in range(n):
        yi, yj = ry[i], ry[j]
        xi, xj = rx[i], rx[j]
        cond = (yi > py) != (yj > py)
        if np.any(cond):
            xint = (xj - xi) * (py - yi) / (yj - yi) + xi
            inside ^= cond & (px < xint)
        j = i
    return inside


def points_in_polygon(px, py, outer_x, outer_y, inners=()) -> np.ndarray:
    """Containment in a polygon with holes: in outer and in no inner ring.

    `inners` is a sequence of (x_array, y_array) pairs."""
    res = points_in_ring(px, py, outer_x, outer_y)
    for ix, iy in inners:
        res &= ~points_in_ring(px, py, ix, iy)
    return res


def ring_area2(ring_x, ring_y) -> float:
    """Twice the signed area (shoelace). >0 means counter-clockwise in a
    y-up CRS. Used by multipolygon reconstruction to orient rings."""
    x = np.asarray(ring_x, dtype=np.float64)
    y = np.asarray(ring_y, dtype=np.float64)
    return float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def ring_contains_ring(outer_x, outer_y, inner_x, inner_y) -> bool:
    """True if the first vertex of the inner ring lies inside the outer ring.

    Sufficient for valid OSM multipolygons (rings don't cross); used for
    outer/inner nesting classification (T8)."""
    return bool(points_in_ring(np.asarray([inner_x[0]]), np.asarray([inner_y[0]]), outer_x, outer_y)[0])
