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


# --- geometry placement (T3/T4 for extended geometries) ---------------------


def way_envelope_cell(pts: list[tuple[int, int]], max_level: int = MAX_LEVEL) -> int:
    """pts: [(lat, lon)] -> deepest cell containing the envelope. The y axis
    flips: max lat -> min gy."""
    lats = [p[0] for p in pts]
    lons = [p[1] for p in pts]
    gx0, gy0 = grid_xy(max(lats), min(lons))  # NW
    gx1, gy1 = grid_xy(min(lats), max(lons))  # SE
    return deepest_containing_cell(gx0, gy0, gx1, gy1, max_level)


# --- multipolygon assembly (T8) ----------------------------------------------


def _pip_scalar(py: float, px: float, ring: list[tuple[int, int]]) -> bool:
    """Even-odd crossing test, (lat, lon) ring, point (py=lat, px=lon)."""
    inside = False
    n = len(ring)
    for i in range(n):
        y1, x1 = ring[i]
        y2, x2 = ring[(i + 1) % n]
        if (y1 > py) != (y2 > py):
            xint = (x2 - x1) * (py - y1) / (y2 - y1) + x1
            if px < xint:
                inside = not inside
    return inside


def oracle_assemble_rings(arcs: list[list[tuple[int, int]]]) -> list[list[tuple[int, int]]]:
    """Independent scalar ring stitcher: same deterministic rules as the
    engine kernel (seed = smallest unused arc index; smallest-index
    continuation; stuck chains discarded)."""
    used = [False] * len(arcs)
    rings = []
    for seed in range(len(arcs)):
        if used[seed] or len(arcs[seed]) < 2:
            continue
        used[seed] = True
        chain = list(map(tuple, arcs[seed]))
        while chain[-1] != chain[0]:
            found = -1
            rev = False
            for j in range(len(arcs)):
                if used[j] or len(arcs[j]) < 2:
                    continue
                if tuple(arcs[j][0]) == chain[-1]:
                    found, rev = j, False
                    break
                if tuple(arcs[j][-1]) == chain[-1]:
                    found, rev = j, True
                    break
            if found < 0:
                chain = None
                break
            used[found] = True
            seg = list(map(tuple, arcs[found]))
            if rev:
                seg.reverse()
            chain.extend(seg[1:])
        if chain is None:
            continue
        if chain[-1] == chain[0]:
            chain = chain[:-1]
        if len(chain) >= 3:
            rings.append(chain)
    return rings


def oracle_build_polygons(arcs):
    rings = oracle_assemble_rings(arcs)
    depths = []
    for i, r in enumerate(rings):
        d = 0
        for j, other in enumerate(rings):
            if i != j and _pip_scalar(r[0][0], r[0][1], other):
                d += 1
        depths.append(d)
    polys = []
    omap = {}
    for i, r in enumerate(rings):
        if depths[i] % 2 == 0:
            omap[i] = len(polys)
            polys.append((r, []))
    for i, r in enumerate(rings):
        if depths[i] % 2 == 1:
            best, best_d = -1, -1
            for j in omap:
                if depths[j] == depths[i] - 1 and _pip_scalar(r[0][0], r[0][1], rings[j]):
                    if depths[j] > best_d:
                        best, best_d = j, depths[j]
            if best >= 0:
                polys[omap[best]][1].append(r)
    return polys


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
