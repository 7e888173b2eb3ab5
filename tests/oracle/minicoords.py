"""mini-COORDS oracle (SURVEY.md §5.3.2).

A deliberately simple, single-threaded, pure-Python reimplementation of the
COORDS chunking rules. It stands in for the absent reference converter
(/root/reference was empty at survey time — SURVEY.md §0): the Spark engine
must match it byte-for-byte on chunk assignments and join outputs.

Deliberately written scalar-first with different algorithms than the engine
kernels (per-level loops instead of closed-form bit tricks, dict folds
instead of groupBys) so agreement is evidence, not tautology. Only the
float-level mercator formula is definitionally shared — it IS the spec of
the coordinate system.
"""

from __future__ import annotations

import math

MAX_LEVEL = 26
GRID = 1 << MAX_LEVEL
MAX_LAT = 85.05112878


def mercator_unit(lat_i32: int, lon_i32: int) -> tuple[float, float]:
    lat = lat_i32 * 1e-7
    lon = lon_i32 * 1e-7
    ux = (lon + 180.0) / 360.0
    latc = min(max(lat, -MAX_LAT), MAX_LAT)
    s = math.sin(math.radians(latc))
    uy = 0.5 - math.log((1.0 + s) / (1.0 - s)) / (4.0 * math.pi)
    eps = 2.220446049250313e-16
    return min(max(ux, 0.0), 1.0 - eps), min(max(uy, 0.0), 1.0 - eps)


def grid_xy(lat_i32: int, lon_i32: int) -> tuple[int, int]:
    ux, uy = mercator_unit(lat_i32, lon_i32)
    return min(int(ux * GRID), GRID - 1), min(int(uy * GRID), GRID - 1)


def cell_id(gx: int, gy: int, level: int) -> int:
    """Interleave bit-by-bit (slow, obviously-correct)."""
    z = 0
    for b in range(level):
        xb = (gx >> (MAX_LEVEL - level + b)) & 1
        yb = (gy >> (MAX_LEVEL - level + b)) & 1
        z |= xb << (2 * b)
        z |= yb << (2 * b + 1)
    return (z << 6) | level


def cell_level(cell: int) -> int:
    return cell & 63


def ancestor(cell: int, level: int) -> int:
    cur = cell & 63
    z = cell >> 6
    return ((z >> (2 * (cur - level))) << 6) | level


def deepest_containing_cell(gx0: int, gy0: int, gx1: int, gy1: int, max_level: int = MAX_LEVEL) -> int:
    """Walk down from the root; stop when corners separate."""
    for level in range(max_level, -1, -1):
        s = MAX_LEVEL - level
        if (gx0 >> s) == (gx1 >> s) and (gy0 >> s) == (gy1 >> s):
            return cell_id(gx0, gy0, level)
    return cell_id(gx0, gy0, 0)


# --- chunking ---------------------------------------------------------------


def split_set(rows: list[tuple[int, int]], max_bytes: int, base_level: int) -> set[int]:
    """rows: (cell, nbytes). A node splits iff its subtree byte total
    (rows at descendant-or-self cells, deep cells capped to base_level)
    exceeds max_bytes."""
    subtree: dict[int, int] = {}
    for cell, nbytes in rows:
        lv = min(cell_level(cell), base_level)
        c = ancestor(cell, lv)
        for l in range(lv + 1):
            a = ancestor(c, l)
            subtree[a] = subtree.get(a, 0) + nbytes
    return {node for node, b in subtree.items() if b > max_bytes}


def assign_chunk(cell: int, splits: set[int], base_level: int) -> int:
    """First non-split ancestor, capped at own level and base_level."""
    lv = min(cell_level(cell), base_level)
    c = ancestor(cell, lv)
    for l in range(lv + 1):
        a = ancestor(c, l)
        if a not in splits:
            return a
    return c  # every ancestor incl. own level splits -> stay at own level


def chunk_points(
    points: list[tuple[object, int, int, int]], max_bytes: int, base_level: int
) -> dict[object, int]:
    """points: (key, lat_i32, lon_i32, nbytes) -> {key: chunk_id}."""
    cells = []
    for key, lat, lon, nb in points:
        gx, gy = grid_xy(lat, lon)
        cells.append((key, cell_id(gx, gy, base_level), nb))
    splits = split_set([(c, nb) for _, c, nb in cells], max_bytes, base_level)
    return {key: assign_chunk(c, splits, base_level) for key, c, nb in cells}


# --- way resolution (J1) ----------------------------------------------------


def resolve_ways(
    nodes: dict[int, tuple[int, int]], ways: list[tuple[int, list[int]]]
) -> dict[int, list[tuple[int, int, int]]]:
    """way_id -> ordered [(node_id, lat, lon)]; ways with any dangling ref
    are dropped (the engine reports them via an anti-join)."""
    out = {}
    for wid, refs in ways:
        pts = []
        ok = True
        for r in refs:
            if r not in nodes:
                ok = False
                break
            la, lo = nodes[r]
            pts.append((r, la, lo))
        if ok:
            out[wid] = pts
    return out
