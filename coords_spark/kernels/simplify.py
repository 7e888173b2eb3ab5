"""Douglas-Peucker line simplification for LOD levels (SURVEY.md §2.4 T7).

COORDS precomputes simplified geometry per zoom level (REF? src/lod/,
src/geom/simplify* [L-M]). Iterative (stack-based, no recursion), numpy
distance math, deterministic: ties keep the lower index.
"""

from __future__ import annotations

import numpy as np


def dp_mask(x: np.ndarray, y: np.ndarray, eps: float) -> np.ndarray:
    """Boolean keep-mask for polyline (x, y) under tolerance eps (same units
    as the coordinates). Endpoints always kept."""
    n = x.shape[0]
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[-1] = True
    if n <= 2:
        return keep
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        dx, dy = x[j] - x[i], y[j] - y[i]
        seg = np.hypot(dx, dy)
        xs, ys = x[i + 1 : j], y[i + 1 : j]
        if seg == 0.0:
            d = np.hypot(xs - x[i], ys - y[i])
        else:
            d = np.abs(dx * (y[i] - ys) - (x[i] - xs) * dy) / seg
        k = int(np.argmax(d))  # first max -> deterministic
        if d[k] > eps:
            m = i + 1 + k
            keep[m] = True
            stack.append((i, m))
            stack.append((m, j))
    return keep


def simplify(x: np.ndarray, y: np.ndarray, eps: float) -> tuple[np.ndarray, np.ndarray]:
    m = dp_mask(np.asarray(x), np.asarray(y), eps)
    return np.asarray(x)[m], np.asarray(y)[m]


def lod_eps_units(lod: int, max_level: int = 26, px_tolerance: float = 1.0) -> float:
    """Simplification tolerance in MAX_LEVEL grid units for a zoom level:
    one tile at `lod` is 256 px wide, so one px = tile_size/256 units."""
    tile_units = float(1 << (max_level - lod))
    return px_tolerance * tile_units / 256.0
