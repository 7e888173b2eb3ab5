"""Multipolygon ring assembly (SURVEY.md §2.4 T8).

COORDS stitches relation member ways into closed rings by endpoint matching
and classifies outer/inner by ring nesting (REF?
src/geom/multipolygonReconstructor.cc [M-H]). Pure-numpy/python kernel,
deterministic:

  * always seed a new ring from the unused arc with the smallest input
    index; extend by exact endpoint match, preferring the smallest-index
    continuation; arcs are reversed as needed;
  * a chain that closes (end == start) becomes a ring; a chain that gets
    stuck is discarded as invalid (its arcs stay consumed);
  * nesting depth = number of other rings containing the ring's first
    vertex (valid OSM multipolygons don't cross); even depth -> outer,
    odd -> inner, holes attach to their immediate parent.
"""

from __future__ import annotations

import numpy as np

from coords_spark.kernels.pip import points_in_ring


def assemble_rings(arcs: list[np.ndarray]) -> list[np.ndarray]:
    """arcs: list of (n,2) arrays [(lat,lon), ...]. Returns closed rings
    (first point NOT repeated at the end)."""
    used = [False] * len(arcs)
    rings: list[np.ndarray] = []
    for seed in range(len(arcs)):
        if used[seed] or len(arcs[seed]) < 2:
            continue
        used[seed] = True
        chain = [np.asarray(arcs[seed], dtype=np.int64)]
        start = tuple(chain[0][0])
        end = tuple(chain[0][-1])
        while end != start:
            nxt = -1
            rev = False
            for j in range(len(arcs)):
                if used[j] or len(arcs[j]) < 2:
                    continue
                a = arcs[j]
                if tuple(a[0]) == end:
                    nxt, rev = j, False
                    break
                if tuple(a[-1]) == end:
                    nxt, rev = j, True
                    break
            if nxt < 0:
                chain = None  # stuck: dangling chain, discard
                break
            used[nxt] = True
            seg = np.asarray(arcs[nxt], dtype=np.int64)
            if rev:
                seg = seg[::-1]
            chain.append(seg[1:])  # drop duplicated junction point
            end = tuple(seg[-1])
        if chain is None:
            continue
        ring = np.concatenate(chain, axis=0)
        if tuple(ring[-1]) == tuple(ring[0]):
            ring = ring[:-1]  # store open (implicit closure)
        if len(ring) >= 3:
            rings.append(ring)
    return rings


def nesting_depth(rings: list[np.ndarray]) -> list[int]:
    """depth[i] = number of OTHER rings containing ring i's first vertex."""
    depths = []
    for i, r in enumerate(rings):
        d = 0
        px, py = np.asarray([float(r[0, 1])]), np.asarray([float(r[0, 0])])  # x=lon, y=lat
        for j, other in enumerate(rings):
            if i == j:
                continue
            if points_in_ring(px, py, other[:, 1].astype(float), other[:, 0].astype(float))[0]:
                d += 1
        depths.append(d)
    return depths


def build_polygons(arcs: list[np.ndarray]) -> list[tuple[np.ndarray, list[np.ndarray]]]:
    """Full T8: arcs -> [(outer_ring, [hole_rings])], outers ordered by
    (depth, first-vertex) deterministically; each hole attaches to the
    innermost outer ring containing it (its depth parent)."""
    rings = assemble_rings(arcs)
    if not rings:
        return []
    depths = nesting_depth(rings)
    outers = [i for i, d in enumerate(depths) if d % 2 == 0]
    inners = [i for i, d in enumerate(depths) if d % 2 == 1]
    polys: list[tuple[np.ndarray, list[np.ndarray]]] = []
    out_map: dict[int, int] = {}
    for oi in outers:
        out_map[oi] = len(polys)
        polys.append((rings[oi], []))
    for ii in inners:
        # parent = containing outer with the greatest depth (= depth-1)
        best, best_d = -1, -1
        px, py = np.asarray([float(rings[ii][0, 1])]), np.asarray([float(rings[ii][0, 0])])
        for oi in outers:
            r = rings[oi]
            if depths[oi] == depths[ii] - 1 and points_in_ring(
                px, py, r[:, 1].astype(float), r[:, 0].astype(float)
            )[0]:
                if depths[oi] > best_d:
                    best, best_d = oi, depths[oi]
        if best >= 0:
            polys[out_map[best]][1].append(rings[ii])
    return polys
