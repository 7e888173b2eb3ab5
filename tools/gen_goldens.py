"""Generate golden oracle SQL for the driver queries that have no natural
ANSI-SQL twin (spatial engine + LSH dedup + payload verification).

Each golden is computed by an INDEPENDENT implementation — the minicoords
scalar oracle (tests/oracle/minicoords.py), scalar ray-casting / DP /
LSH reimplementations in this file, and the XXH64 kernel (parity-tested
against F.xxhash64) — never by running the Spark query itself. The results
are embedded as VALUES literals into coords_spark/goldens.py, which
driver_surface registers as oracle_sql entries, so the driver's hash gate
pins these queries exactly.

Validity: goldens over sf-dependent tables (orders/supplier/documents/
embeddings) are computed at sf=0.01 — the driver's correctness scale.
Fixture-driven queries (ways/relations/polygons/images) are sf-independent.

Regenerate after any semantic change:  python tools/gen_goldens.py
Then re-check:                         python tools/check_oracle.py
"""

from __future__ import annotations

import math
import os
import sys
import zlib

import numpy as np
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from coords_spark.kernels import xxh64  # noqa: E402
from coords_spark.kernels.phash import COAST_LAT, COAST_LON, HOTSPOTS, anchor, splitmix64  # noqa: E402
from oracle import minicoords as mc  # noqa: E402

SF_DIR = os.environ.get("GOLDEN_SF_DIR", "/root/testdata/sf0.01")
GRID = mc.GRID
BASE_LEVEL = 12


# --------------------------------------------------------------------------
# shared independent helpers
# --------------------------------------------------------------------------


def _unit_xy(lat_i32: np.ndarray, lon_i32: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized mercator unit coords — the definitional CRS formula
    (identical to minicoords.mercator_unit, vectorized for speed)."""
    lat = lat_i32.astype(np.float64) * 1e-7
    lon = lon_i32.astype(np.float64) * 1e-7
    ux = (lon + 180.0) / 360.0
    latc = np.clip(lat, -mc.MAX_LAT, mc.MAX_LAT)
    s = np.sin(np.radians(latc))
    uy = 0.5 - np.log((1.0 + s) / (1.0 - s)) / (4.0 * np.pi)
    eps = 2.220446049250313e-16
    return np.clip(ux, 0.0, 1.0 - eps), np.clip(uy, 0.0, 1.0 - eps)


def _grid_int(ux: np.ndarray, uy: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    gx = np.minimum((ux * GRID).astype(np.int64), GRID - 1)
    gy = np.minimum((uy * GRID).astype(np.int64), GRID - 1)
    return gx, gy


def _points_from_table(path: str, key_col: str) -> tuple[list[str], np.ndarray, np.ndarray]:
    """(key string, lat_i32, lon_i32) via the spec pipeline:
    phash = xxhash64(key_long), anchor(phash) -> lat/lon."""
    keys = pq.read_table(path, columns=[key_col]).column(key_col).to_numpy()
    ph = xxh64.hash_long(np.asarray(keys, dtype=np.int64))
    lat, lon = anchor(ph)
    return [str(int(k)) for k in keys], lat.astype(np.int64), lon.astype(np.int64)


def _crossings(px: np.ndarray, py: np.ndarray, rx: np.ndarray, ry: np.ndarray) -> np.ndarray:
    """Vectorized even-odd ray-cast (independent of kernels/pip.py): points
    (px, py) against ring (rx, ry) (closed implicitly)."""
    inside = np.zeros(px.shape[0], dtype=bool)
    n = len(rx)
    for i in range(n):
        x1, y1 = rx[i], ry[i]
        x2, y2 = rx[(i + 1) % n], ry[(i + 1) % n]
        cond = (y1 > py) != (y2 > py)
        if not cond.any():
            continue
        xint = (x2 - x1) * (py - y1) / ((y2 - y1) if y2 != y1 else 1.0) + x1
        inside ^= cond & (px < xint)
    return inside


def _poly_rings_grid(poly: dict) -> tuple[tuple, list]:
    def ring(pts):
        la = np.asarray([p["lat"] for p in pts], dtype=np.int64)
        lo = np.asarray([p["lon"] for p in pts], dtype=np.int64)
        ux, uy = _unit_xy(la, lo)
        return ux * GRID, uy * GRID

    return ring(poly["outer"]), [ring(h) for h in (poly["inners"] or [])]


def _pip_pairs(px: np.ndarray, py: np.ndarray, polys: list[dict]) -> dict[int, np.ndarray]:
    """{poly_id: boolean mask over points} (outer minus holes)."""
    out = {}
    for poly in polys:
        (ox, oy), inners = _poly_rings_grid(poly)
        x0, x1 = ox.min(), ox.max()
        y0, y1 = oy.min(), oy.max()
        cand = (px >= x0) & (px <= x1) & (py >= y0) & (py <= y1)
        idx = np.nonzero(cand)[0]
        mask = np.zeros(px.shape[0], dtype=bool)
        if idx.size:
            m = _crossings(px[idx], py[idx], ox, oy)
            for ix, iy in inners:
                m &= ~_crossings(px[idx], py[idx], ix, iy)
            mask[idx] = m
        out[int(poly["poly_id"])] = mask
    return out


# --------------------------------------------------------------------------
# per-query golden computations
# --------------------------------------------------------------------------


def g_geo_chunk_rollup():
    keys, lat, lon = _points_from_table(f"{SF_DIR}/orders.parquet", "o_orderkey")
    ux, uy = _unit_xy(lat, lon)
    gx, gy = _grid_int(ux, uy)
    cells = [mc.cell_id(int(x), int(y), BASE_LEVEL) for x, y in zip(gx, gy)]
    splits = mc.split_set([(c, 128) for c in cells], 64 * 1024, BASE_LEVEL)
    agg: dict[int, list] = {}
    for c in cells:
        ch = mc.assign_chunk(c, splits, BASE_LEVEL)
        a = agg.setdefault(ch, [0, c, c])
        a[0] += 1
        a[1] = min(a[1], c)
        a[2] = max(a[2], c)
    rows = [(ch, n, cmin, cmax) for ch, (n, cmin, cmax) in sorted(agg.items())]
    return ["chunk_id", "n_points", "cell_min", "cell_max"], rows, {}


def g_geo_pip_enrich():
    from coords_spark.fixtures import gen_admin_polygons

    keys, lat, lon = _points_from_table(f"{SF_DIR}/orders.parquet", "o_orderkey")
    ux, uy = _unit_xy(lat, lon)
    px, py = ux * GRID, uy * GRID
    polys = gen_admin_polygons(50).to_pylist()
    masks = _pip_pairs(px, py, polys)
    rows = [(pid, int(m.sum())) for pid, m in sorted(masks.items()) if m.any()]
    return ["poly_id", "n_points"], rows, {}


def g_geo_coastline_classify():
    keys, lat, lon = _points_from_table(f"{SF_DIR}/orders.parquet", "o_orderkey")
    ux, uy = _unit_xy(lat, lon)
    px, py = ux * GRID, uy * GRID
    ring = {
        "poly_id": 1,
        "outer": [
            {"lat": int(round(la * 1e7)), "lon": int(round(lo * 1e7))}
            for la, lo in zip(COAST_LAT, COAST_LON)
        ],
        "inners": [],
    }
    mask = _pip_pairs(px, py, [ring])[1]
    n_in = int(mask.sum())
    rows = [(False, len(keys) - n_in), (True, n_in)]
    return ["on_land", "n"], rows, {"on_land": "BOOLEAN"}


def g_geo_knn_ring(k: int = 10):
    keys, lat, lon = _points_from_table(f"{SF_DIR}/orders.parquet", "o_orderkey")
    ux, uy = _unit_xy(lat, lon)
    gx, gy = _grid_int(ux, uy)
    queries = [
        (f"q{i}", int(la * 1e7), int(lo * 1e7)) for i, (la, lo) in enumerate(HOTSPOTS[:3])
    ] + [("q_sparse", int(-55.0 * 1e7), int(100.0 * 1e7))]
    rows = []
    for qid, qla, qlo in queries:
        qux, quy = _unit_xy(np.asarray([qla]), np.asarray([qlo]))
        qgx, qgy = _grid_int(qux, quy)
        d = np.hypot((gx - qgx[0]).astype(np.float64), (gy - qgy[0]).astype(np.float64))
        order = sorted(range(len(keys)), key=lambda i: (d[i], keys[i]))[:k]
        for r, i in enumerate(order, start=1):
            rows.append((qid, r, keys[i], float(d[i])))
    return ["qid", "rank", "image_id", "dist_units"], rows, {
        "qid": "VARCHAR", "image_id": "VARCHAR", "dist_units": "DOUBLE"}


def _chunk_set_for(path: str, key_col: str, max_bytes: int) -> set[int]:
    keys, lat, lon = _points_from_table(path, key_col)
    ux, uy = _unit_xy(lat, lon)
    gx, gy = _grid_int(ux, uy)
    cells = [mc.cell_id(int(x), int(y), BASE_LEVEL) for x, y in zip(gx, gy)]
    splits = mc.split_set([(c, 256) for c in cells], max_bytes, BASE_LEVEL)
    return {mc.assign_chunk(c, splits, BASE_LEVEL) for c in cells}


def g_geo_raster_vector_align():
    raster = _chunk_set_for(f"{SF_DIR}/orders.parquet", "o_orderkey", 16 * 1024)
    vector = _chunk_set_for(f"{SF_DIR}/supplier.parquet", "s_suppkey", 64 * 1024)
    pairs = set()
    vlevels = {mc.cell_level(v) for v in vector}
    rlevels = {mc.cell_level(r) for r in raster}
    for lv in vlevels:
        vs = {v for v in vector if mc.cell_level(v) == lv}
        for r in raster:
            if mc.cell_level(r) >= lv and mc.ancestor(r, lv) in vs:
                pairs.add((mc.ancestor(r, lv), r))
    for lr in rlevels:
        rs = {r for r in raster if mc.cell_level(r) == lr}
        for v in vector:
            if mc.cell_level(v) > lr and mc.ancestor(v, lr) in rs:
                pairs.add((v, mc.ancestor(v, lr)))
    return ["v_chunk", "r_chunk"], sorted(pairs), {}


def _resolved_ways():
    from coords_spark.fixtures import gen_nodes, gen_ways

    nt = gen_nodes(4000).to_pylist()
    wt = gen_ways(600, 4000).to_pylist()
    nodes = {n["id"]: (n["lat"], n["lon"]) for n in nt}
    resolved = mc.resolve_ways(nodes, [(w["id"], list(w["refs"])) for w in wt])
    return resolved  # way_id -> [(node_id, lat, lon)]


def g_geo_osm_way_tiling():
    resolved = _resolved_ways()
    items = []
    for wid, pts in resolved.items():
        latlon = [(la, lo) for _nid, la, lo in pts]
        cell = mc.way_envelope_cell(latlon)
        items.append((cell, len(latlon)))
    splits = mc.split_set(
        [(c, n * 8 + 64) for c, n in items], 64 * 1024, BASE_LEVEL
    )
    agg: dict[int, list] = {}
    for c, n in items:
        ch = mc.assign_chunk(c, splits, BASE_LEVEL)
        a = agg.setdefault(ch, [0, 0])
        a[0] += 1
        a[1] += n
    rows = [(ch, a[0], a[1]) for ch, a in sorted(agg.items())]
    return ["chunk_id", "n_ways", "n_vertices"], rows, {}


def g_incremental_update_apply():
    """Independent scalar twin of the incremental node-diff apply: full
    resolve -> envelope-cell -> split (from the PRE-diff build) -> patch
    one node -> re-resolve -> chunk EVERY way under the same split ->
    per-chunk rollup. The engine must reach the same end state by touching
    only the affected ways' files."""
    from coords_spark.fixtures import gen_nodes, gen_ways

    nt = gen_nodes(2000).to_pylist()
    wt = gen_ways(300, 2000).to_pylist()
    nodes = {n["id"]: (n["lat"], n["lon"]) for n in nt}
    wlist = [(w["id"], list(w["refs"])) for w in wt]
    resolved = mc.resolve_ways(nodes, wlist)
    latlon_of = lambda pts: [(la, lo) for _n, la, lo in pts]  # noqa: E731
    splits = mc.split_set(
        [
            (mc.way_envelope_cell(latlon_of(p)), len(p) * 8 + 64)
            for p in resolved.values()
        ],
        8 * 1024,
        BASE_LEVEL,
    )
    wid = min(resolved)
    nid = dict(wlist)[wid][0]
    nodes2 = dict(nodes)
    nodes2[nid] = (-338000000, 1512000000)
    resolved2 = mc.resolve_ways(nodes2, wlist)
    agg: dict[int, list[int]] = {}
    for w, pts in sorted(resolved2.items()):
        ll = latlon_of(pts)
        ch = mc.assign_chunk(mc.way_envelope_cell(ll), splits, BASE_LEVEL)
        a = agg.setdefault(ch, [0, 0, 0])
        a[0] += 1
        a[1] += len(ll)
        a[2] += w
    rows = [(ch, a[0], a[1], a[2]) for ch, a in sorted(agg.items())]
    return ["chunk_id", "n_ways", "n_vertices", "way_id_sum"], rows, {}


def g_relation_diff_apply():
    """Independent scalar twin of the relation-diff apply: assemble every
    relation's polygons, build the split from the PRE-diff polygon set,
    then re-member relation A with B's rings, delete C, re-assemble and
    chunk EVERYTHING under the same split, per-chunk rollup. The engine
    must reach the same end state by touching only the affected files."""
    from coords_spark.fixtures import gen_relations

    relations, ring_ways = (t.to_pylist() for t in gen_relations(40))
    way_pts = {w["id"]: [(p["lat"], p["lon"]) for p in w["pts"]] for w in ring_ways}

    def polys_of(members):
        arcs = [
            way_pts[m["ref"]]
            for m in members
            if m["mtype"] == 1 and m["ref"] in way_pts
        ]
        return mc.oracle_build_polygons(arcs) if arcs else []

    mps = [r for r in relations if any(m["role"] == "outer" for m in r["members"])]
    a, b, c = mps[0], mps[-1], mps[1]
    items = []
    for rel in relations:
        for outer, _holes in polys_of(rel["members"]):
            items.append((mc.way_envelope_cell(outer), len(outer) * 8 + 64))
    splits = mc.split_set(items, 4 * 1024, BASE_LEVEL)
    agg: dict[int, list[int]] = {}
    for rel in relations:
        if rel["id"] == c["id"]:
            continue  # deleted by the diff
        members = b["members"] if rel["id"] == a["id"] else rel["members"]
        for outer, holes in polys_of(members):
            ch = mc.assign_chunk(mc.way_envelope_cell(outer), splits, BASE_LEVEL)
            g = agg.setdefault(ch, [0, 0, 0, 0])
            g[0] += 1
            g[1] += len(outer)
            g[2] += len(holes)
            g[3] += rel["id"]
    rows = [(ch, *v) for ch, v in sorted(agg.items())]
    return ["chunk_id", "n_polys", "outer_vertices", "n_holes", "rel_sum"], rows, {}


def g_pbf_create_tiles_stats():
    """Independent scalar twin of E3: resolve the way fixture, split under
    64 KiB, keep ways whose FIRST vertex falls in the London viewport
    (the render_read semantic contract — pruning only shrinks I/O),
    per-chunk rollup."""
    resolved = _resolved_ways()
    items = {}
    for wid, pts in resolved.items():
        latlon = [(la, lo) for _nid, la, lo in pts]
        items[wid] = (mc.way_envelope_cell(latlon), latlon)
    splits = mc.split_set(
        [(cell, len(ll) * 8 + 64) for cell, ll in items.values()], 64 * 1024, BASE_LEVEL
    )
    lat0, lon0, lat1, lon1 = int(50.0e7), int(-2.0e7), int(53.0e7), int(1.8e7)
    agg: dict[int, list[int]] = {}
    for wid, (cell, ll) in sorted(items.items()):
        alat, alon = ll[0]
        if not (lat0 <= alat <= lat1 and lon0 <= alon <= lon1):
            continue
        ch = mc.assign_chunk(cell, splits, BASE_LEVEL)
        g = agg.setdefault(ch, [0, 0, 0])
        g[0] += 1
        g[1] += len(ll)
        g[2] += wid
    rows = [(ch, *v) for ch, v in sorted(agg.items())]
    return ["chunk_id", "n_ways", "n_vertices", "way_id_sum"], rows, {}


def g_icepick_compact_stats():
    """Lifecycle contract scalars, stated independently: 6 commits of 100
    rows compact into 1 file (6 in, 1 out), expiry keeps 1 snapshot and
    removes exactly the 6 superseded files, content is the untouched
    union (600 rows, key_sum = sum(0..599), 7 distinct chunks)."""
    rows = [(6, 1, 6, 1, 1, 600, sum(range(600)), 7)]
    return [
        "files_compacted",
        "files_written",
        "files_removed",
        "n_snapshots",
        "files_on_disk",
        "n_rows",
        "key_sum",
        "n_chunks",
    ], rows, {}


def g_update_stream_apply():
    """Independent scalar twin of the continuous-update pipeline: apply
    both composed diff batches as plain dict updates -> final entity
    state; store rollups by id-range chunk (id >> shift, the
    build_entity_store contract); derived way/polygon rollups by
    re-resolving + re-assembling EVERYTHING from the final state and
    chunking under the PRE-diff split (the sidecar contract). The engine
    must reach the same end state by touching only blast-radius files."""
    from coords_spark.fixtures import gen_update_diffs, gen_update_world

    nodes_rows, ways_rows, rels_rows = gen_update_world(10)
    b1, b2 = gen_update_diffs(nodes_rows, ways_rows, rels_rows)

    nodes = {r[0]: r for r in nodes_rows}  # id -> (id, ver, lat, lon, tags)
    ways = {r[0]: r for r in ways_rows}  # id -> (id, ver, refs, tags)
    rels = {r[0]: r for r in rels_rows}  # id -> (id, ver, members, tags)
    for batch in (b1, b2):
        for kind, action, eid, ver, lat, lon, refs, members, tags in batch:
            store = (nodes, ways, rels)[kind]
            if action == "delete":
                store.pop(eid, None)
            elif kind == 0:
                store[eid] = (eid, ver, lat, lon, tags or {})
            elif kind == 1:
                store[eid] = (eid, ver, list(refs), tags or {})
            else:
                store[eid] = (eid, ver, list(members), tags or {})

    rows = []
    for layer, store, shift, a2 in (
        ("nodes_store", nodes, 6, lambda r: r[2] + r[3]),
        ("ways_store", ways, 4, lambda r: sum(r[2])),
        ("rels_store", rels, 2, lambda r: len(r[2])),
    ):
        agg: dict[int, list[int]] = {}
        for r in store.values():
            g = agg.setdefault(r[0] >> shift, [0, 0, 0, 0])
            g[0] += 1
            g[1] += r[0]
            g[2] += r[1]
            g[3] += a2(r)
        rows += [(layer, ch, *v) for ch, v in sorted(agg.items())]

    latlon = lambda pts: [(la, lo) for _n, la, lo in pts]  # noqa: E731
    resolved0 = mc.resolve_ways(
        {r[0]: (r[2], r[3]) for r in nodes_rows}, [(r[0], list(r[2])) for r in ways_rows]
    )
    splits = mc.split_set(
        [
            (mc.way_envelope_cell(latlon(p)), len(p) * 8 + 64)
            for p in resolved0.values()
        ],
        4 * 1024,
        BASE_LEVEL,
    )
    resolved_f = mc.resolve_ways(
        {r[0]: (r[2], r[3]) for r in nodes.values()},
        [(r[0], list(r[2])) for r in ways.values()],
    )
    agg = {}
    for wid, pts in sorted(resolved_f.items()):
        ll = latlon(pts)
        g = agg.setdefault(
            mc.assign_chunk(mc.way_envelope_cell(ll), splits, BASE_LEVEL), [0, 0, 0, 0]
        )
        g[0] += 1
        g[1] += wid
        g[2] += len(ll)
        g[3] += sum(la + lo for la, lo in ll)
    rows += [("way_chunks", ch, *v) for ch, v in sorted(agg.items())]

    way_pts = {wid: latlon(p) for wid, p in resolved_f.items()}
    agg = {}
    for rid, r in sorted(rels.items()):
        arcs = [way_pts[m[1]] for m in r[2] if m[0] == 1 and m[1] in way_pts]
        for outer, _holes in mc.oracle_build_polygons(arcs) if arcs else []:
            g = agg.setdefault(
                mc.assign_chunk(mc.way_envelope_cell(outer), splits, BASE_LEVEL),
                [0, 0, 0, 0],
            )
            g[0] += 1
            g[1] += rid
            g[2] += len(outer)
            g[3] += sum(la + lo for la, lo in outer)
    rows += [("rel_chunks", ch, *v) for ch, v in sorted(agg.items())]
    return ["layer", "chunk_id", "n", "id_sum", "a1", "a2"], sorted(rows), {
        "layer": "VARCHAR"
    }


def g_dirty_tiles_stats(zoom: int = 12, min_zoom: int = 9):
    """Independent scalar twin of the tile-expiry query: dict-apply each
    composed diff batch, compute the blast radius (ways whose OLD or NEW
    refs touch a changed node, plus the way diff itself), resolve old and
    new geometry scalar-side, fan each segment out to its pixel-tile
    bounding rectangle (scalar mercator), then shift right per ancestor
    level."""
    from coords_spark.fixtures import gen_update_diffs, gen_update_world

    nodes_rows, ways_rows, rels_rows = gen_update_world(10)
    b1, b2 = gen_update_diffs(nodes_rows, ways_rows, rels_rows)
    nodes = {r[0]: (r[2], r[3]) for r in nodes_rows}  # id -> (lat, lon)
    ways = {r[0]: list(r[2]) for r in ways_rows}  # id -> refs
    scale = 256 << zoom

    def pix(lat, lon):
        ux, uy = mc.mercator_unit(lat, lon)
        return min(int(ux * scale), scale - 1), min(int(uy * scale), scale - 1)

    rows = []
    for bi, batch in enumerate((b1, b2), 1):
        node_ch = {e[2] for e in batch if e[0] == 0}
        way_ch = {e[2] for e in batch if e[0] == 1}
        post_nodes = {i: v for i, v in nodes.items() if i not in node_ch}
        post_ways = {i: v for i, v in ways.items() if i not in way_ch}
        for kind, action, eid, _ver, lat, lon, refs, _m, _t in batch:
            if action != "upsert":
                continue
            if kind == 0:
                post_nodes[eid] = (lat, lon)
            elif kind == 1:
                post_ways[eid] = list(refs)
        aff = set(way_ch)
        for store in (ways, post_ways):
            aff |= {w for w, refs in store.items() if node_ch & set(refs)}
        base = set()
        for store, nds in ((ways, nodes), (post_ways, post_nodes)):
            for wid in sorted(aff):
                refs = store.get(wid)
                if refs is None or any(r not in nds for r in refs):
                    continue  # resolve_ways drops incomplete ways
                g = [pix(*nds[r]) for r in refs]
                for (x0, y0), (x1, y1) in zip(g, g[1:]):
                    # same piece rule as the render twin: membership by
                    # per-chunk endpoint-sample rects, not whole-segment
                    n1 = max(abs(x1 - x0), abs(y1 - y0))
                    n1c = max(n1, 1)
                    for j in range(n1 // 256 + 1):
                        k_lo, k_hi = j * 256, min(j * 256 + 255, n1)
                        ax = x0 + ((x1 - x0) * k_lo) // n1c
                        ay = y0 + ((y1 - y0) * k_lo) // n1c
                        bx = x0 + ((x1 - x0) * k_hi) // n1c
                        by = y0 + ((y1 - y0) * k_hi) // n1c
                        for tx in range(min(ax, bx) // 256, max(ax, bx) // 256 + 1):
                            for ty in range(min(ay, by) // 256, max(ay, by) // 256 + 1):
                                base.add((tx, ty))
        for z in range(min_zoom, zoom + 1):
            for tx, ty in sorted({(tx >> (zoom - z), ty >> (zoom - z)) for tx, ty in base}):
                rows.append((bi, z, tx, ty))
        nodes, ways = post_nodes, post_ways
    return ["batch", "zoom", "tile_x", "tile_y"], sorted(rows), {}


def g_osc_update_render_stats(zoom: int = 12, tp: int = 256):
    """Independent scalar twin of the continuous-E3 capstone: dict-apply
    both diff batches (tracking each batch's dirty zoom-12 tiles via the
    scalar piece fan-out over old+new affected geometry), then raster the
    FINAL world's ways — every way, not just affected ones; a dirty tile's
    content includes untouched ways crossing it — and keep the dirty
    tiles' (n_ways, n_px, crc)."""
    from coords_spark.fixtures import gen_update_diffs, gen_update_world

    nodes_rows, ways_rows, rels_rows = gen_update_world(10)
    b1, b2 = gen_update_diffs(nodes_rows, ways_rows, rels_rows)
    nodes = {r[0]: (r[2], r[3]) for r in nodes_rows}
    ways = {r[0]: list(r[2]) for r in ways_rows}
    scale = tp << zoom

    def pix(lat, lon):
        ux, uy = mc.mercator_unit(lat, lon)
        return min(int(ux * scale), scale - 1), min(int(uy * scale), scale - 1)

    def piece_rects(x0, y0, x1, y1):
        n1 = max(abs(x1 - x0), abs(y1 - y0))
        n1c = max(n1, 1)
        for j in range(n1 // tp + 1):
            k_lo, k_hi = j * tp, min(j * tp + tp - 1, n1)
            yield (
                k_lo, k_hi,
                x0 + ((x1 - x0) * k_lo) // n1c, y0 + ((y1 - y0) * k_lo) // n1c,
                x0 + ((x1 - x0) * k_hi) // n1c, y0 + ((y1 - y0) * k_hi) // n1c,
            )

    dirty: set = set()
    for batch in (b1, b2):
        node_ch = {e[2] for e in batch if e[0] == 0}
        way_ch = {e[2] for e in batch if e[0] == 1}
        post_nodes = {i: v for i, v in nodes.items() if i not in node_ch}
        post_ways = {i: v for i, v in ways.items() if i not in way_ch}
        for kind, action, eid, _ver, lat, lon, refs, _m, _t in batch:
            if action != "upsert":
                continue
            if kind == 0:
                post_nodes[eid] = (lat, lon)
            elif kind == 1:
                post_ways[eid] = list(refs)
        aff = set(way_ch)
        for store in (ways, post_ways):
            aff |= {w for w, refs in store.items() if node_ch & set(refs)}
        for store, nds in ((ways, nodes), (post_ways, post_nodes)):
            for wid in sorted(aff):
                refs = store.get(wid)
                if refs is None or any(r not in nds for r in refs):
                    continue
                g = [pix(*nds[r]) for r in refs]
                for (x0, y0), (x1, y1) in zip(g, g[1:]):
                    for _kl, _kh, ax, ay, bx, by in piece_rects(x0, y0, x1, y1):
                        for tx in range(min(ax, bx) // tp, max(ax, bx) // tp + 1):
                            for ty in range(min(ay, by) // tp, max(ay, by) // tp + 1):
                                dirty.add((tx, ty))
        nodes, ways = post_nodes, post_ways

    # raster the FINAL world, keep dirty tiles
    tiles: dict[tuple[int, int], dict] = {}
    for wid in sorted(ways):
        refs = ways[wid]
        if any(r not in nodes for r in refs):
            continue
        g = [pix(*nodes[r]) for r in refs]
        for (x0, y0), (x1, y1) in zip(g, g[1:]):
            for k_lo, k_hi, ax, ay, bx, by in piece_rects(x0, y0, x1, y1):
                for tx in range(min(ax, bx) // tp, max(ax, bx) // tp + 1):
                    for ty in range(min(ay, by) // tp, max(ay, by) // tp + 1):
                        if (tx, ty) not in dirty:
                            continue
                        t = tiles.setdefault((tx, ty), {"ways": set(), "segs": []})
                        t["ways"].add(wid)
                        t["segs"].append(
                            (x0 - tx * tp, y0 - ty * tp,
                             x1 - tx * tp, y1 - ty * tp, k_lo, k_hi)
                        )
    rows = []
    for (tx, ty), t in sorted(tiles.items()):
        img = np.zeros((tp, tp), np.uint8)
        for a, b_, c, d, k_lo, k_hi in t["segs"]:
            n1c = max(abs(c - a), abs(d - b_), 1)
            for k in range(k_lo, k_hi + 1):
                px = a + ((c - a) * k) // n1c
                py = b_ + ((d - b_) * k) // n1c
                if 0 <= px < tp and 0 <= py < tp:
                    img[py, px] = 255
        rows.append(
            (tx, ty, len(t["ways"]), int(np.count_nonzero(img)),
             zlib.crc32(img.tobytes()))
        )
    return ["tile_x", "tile_y", "n_ways", "n_px", "px_crc"], rows, {}


def g_osc_parse_rollup():
    """Scalar twin of the osmChange parse rollup: same per-(kind, action)
    aggregation computed from the fixture diff rows DIRECTLY — the
    write_osc -> XML -> parse_osc_bytes layer in the engine query must be
    transparent for every field."""
    from coords_spark.fixtures import gen_update_diffs, gen_update_world

    b1, b2 = gen_update_diffs(*gen_update_world(10))
    agg: dict[tuple, list[int]] = {}
    for kind, action, eid, ver, lat, lon, refs, members, tags in b1 + b2:
        g = agg.setdefault((kind, action), [0] * 7)
        g[0] += 1
        g[1] += eid
        g[2] += ver
        g[3] += (lat + lon) if lat is not None else 0
        g[4] += sum(refs) if refs else 0
        g[5] += sum(m[1] for m in members) if members else 0
        g[6] += len(tags or {})
    rows = [(k, a, *v) for (k, a), v in sorted(agg.items())]
    return (
        ["kind", "action", "n", "id_sum", "ver_sum", "coord_sum", "ref_sum",
         "member_ref_sum", "n_tags"],
        rows,
        {"action": "VARCHAR"},
    )


def _scalar_base_tiles(bbox, zoom, tp):
    """Scalar raster of the viewport at one zoom: anchor filter ->
    mercator pixel transform -> segment tile fan-out -> per-sample integer
    line walk (the pixel rule's THIRD copy — kernels/raster.py holds the
    vectorized and scalar engine statements; this one re-derives every
    pixel for the goldens). Returns {(tx, ty): (way_id_set, mask)}."""
    lat0, lon0, lat1, lon1 = bbox
    scale = tp << zoom

    def pix(lat, lon):
        ux, uy = mc.mercator_unit(lat, lon)
        return min(int(ux * scale), scale - 1), min(int(uy * scale), scale - 1)

    # viewport tile range: the two bbox corners, lat-sorted into ty order
    cx0, cy0 = pix(lat0, lon0)
    cx1, cy1 = pix(lat1, lon1)
    tx0, tx1 = sorted((cx0 // tp, cx1 // tp))
    ty0, ty1 = sorted((cy0 // tp, cy1 // tp))

    tiles: dict[tuple[int, int], dict] = {}
    for wid, pts in _resolved_ways().items():
        ll = [(la, lo) for _nid, la, lo in pts]
        alat, alon = ll[0]
        if not (lat0 <= alat <= lat1 and lon0 <= alon <= lon1):
            continue
        g = [pix(la, lo) for la, lo in ll]
        for (x0, y0), (x1, y1) in zip(g, g[1:]):
            # piece rule (independent statement; engine in render.py, kernel
            # twin in kernels/raster.py segment_pieces): the sample range
            # splits into tp-sample chunks; each chunk fans only to the rect
            # of its endpoint samples and rasterizes only its own k range
            n1 = max(abs(x1 - x0), abs(y1 - y0))
            n1c = max(n1, 1)
            for j in range(n1 // tp + 1):
                k_lo, k_hi = j * tp, min(j * tp + tp - 1, n1)
                ax = x0 + ((x1 - x0) * k_lo) // n1c
                ay = y0 + ((y1 - y0) * k_lo) // n1c
                bx = x0 + ((x1 - x0) * k_hi) // n1c
                by = y0 + ((y1 - y0) * k_hi) // n1c
                for tx in range(min(ax, bx) // tp, max(ax, bx) // tp + 1):
                    for ty in range(min(ay, by) // tp, max(ay, by) // tp + 1):
                        if not (tx0 <= tx <= tx1 and ty0 <= ty <= ty1):
                            continue
                        t = tiles.setdefault((tx, ty), {"ways": set(), "segs": []})
                        t["ways"].add(wid)
                        t["segs"].append(
                            (x0 - tx * tp, y0 - ty * tp,
                             x1 - tx * tp, y1 - ty * tp, k_lo, k_hi)
                        )
    out: dict[tuple[int, int], tuple[set, np.ndarray]] = {}
    for (tx, ty), t in sorted(tiles.items()):
        img = np.zeros((tp, tp), np.uint8)
        for a, b, c, d, k_lo, k_hi in t["segs"]:
            n1c = max(abs(c - a), abs(d - b), 1)
            for k in range(k_lo, k_hi + 1):
                px = a + ((c - a) * k) // n1c
                py = b + ((d - b) * k) // n1c
                if 0 <= px < tp and 0 <= py < tp:
                    img[py, px] = 255
        out[(tx, ty)] = (t["ways"], img)
    return out


def g_geo_render_raster():
    """Golden twin of the single-zoom raster render query (scalar pixel
    loop in _scalar_base_tiles)."""
    bbox = (int(50.0e7), int(-2.0e7), int(53.0e7), int(1.8e7))
    tp = 256
    rows = [
        (tx, ty, len(ways), int(np.count_nonzero(img)), zlib.crc32(img.tobytes()))
        for (tx, ty), (ways, img) in sorted(
            _scalar_base_tiles(bbox, 8, tp).items()
        )
    ]
    return ["tile_x", "tile_y", "n_ways", "n_px", "px_crc"], rows, {}


def _scalar_vector_tiles(ways_ll: dict, bbox, zoom: int, tp: int) -> list:
    """Scalar vector-tile assembly shared by the single-zoom and pyramid
    goldens: anchor filter -> scalar mercator -> piece fan-out membership
    -> per-tile (way_id, seg_idx)-sorted runs of consecutive segments ->
    LINE blobs encoded by an INLINE struct.pack statement of the
    documented GenericGeometry layout (independent of kernels/geomblob).
    `ways_ll`: way_id -> [(lat, lon), ...]. Returns (tx, ty, n_ways,
    n_geoms, n_segs, payload_crc) rows."""
    import struct as _st

    lat0, lon0, lat1, lon1 = bbox
    scale = tp << zoom

    def pix(lat, lon):
        ux, uy = mc.mercator_unit(lat, lon)
        return min(int(ux * scale), scale - 1), min(int(uy * scale), scale - 1)

    cx0, cy0 = pix(lat0, lon0)
    cx1, cy1 = pix(lat1, lon1)
    tx0, tx1 = sorted((cx0 // tp, cx1 // tp))
    ty0, ty1 = sorted((cy0 // tp, cy1 // tp))

    tiles: dict = {}
    for wid, ll in ways_ll.items():
        if not (lat0 <= ll[0][0] <= lat1 and lon0 <= ll[0][1] <= lon1):
            continue
        g = [pix(la, lo) for la, lo in ll]
        for i, ((x0, y0), (x1, y1)) in enumerate(zip(g, g[1:])):
            n1 = max(abs(x1 - x0), abs(y1 - y0))
            n1c = max(n1, 1)
            for j in range(n1 // tp + 1):
                k_lo, k_hi = j * tp, min(j * tp + tp - 1, n1)
                ax = x0 + ((x1 - x0) * k_lo) // n1c
                ay = y0 + ((y1 - y0) * k_lo) // n1c
                bx = x0 + ((x1 - x0) * k_hi) // n1c
                by = y0 + ((y1 - y0) * k_hi) // n1c
                for tx in range(min(ax, bx) // tp, max(ax, bx) // tp + 1):
                    for ty in range(min(ay, by) // tp, max(ay, by) // tp + 1):
                        if not (tx0 <= tx <= tx1 and ty0 <= ty <= ty1):
                            continue
                        tiles.setdefault((tx, ty), {})[(wid, i)] = (
                            x0 - tx * tp, y0 - ty * tp, x1 - tx * tp, y1 - ty * tp
                        )

    def line_blob(gid: int, ys: list[int], xs: list[int]) -> bytes:
        out = [_st.pack("<Bq", 1, gid), _st.pack("<I", 1), _st.pack("<I", len(ys))]
        for y, x in zip(ys, xs):
            out.append(_st.pack("<ii", y, x))
        out.append(_st.pack("<I", 0))  # no tags
        return b"".join(out)

    rows = []
    for (tx, ty), segmap in sorted(tiles.items()):
        entries = sorted(segmap.items())
        blobs = []
        i, n = 0, len(entries)
        while i < n:
            (wid, _sidx), _ = entries[i]
            run = [entries[i]]
            j = i + 1
            while (
                j < n
                and entries[j][0][0] == wid
                and entries[j][0][1] == entries[j - 1][0][1] + 1
            ):
                run.append(entries[j])
                j += 1
            ys = [run[0][1][1]] + [e[1][3] for e in run]
            xs = [run[0][1][0]] + [e[1][2] for e in run]
            blobs.append(line_blob(int(wid), ys, xs))
            i = j
        payload = b"".join(blobs)
        rows.append(
            (tx, ty, len({w for (w, _s) in segmap}), len(blobs), n,
             zlib.crc32(payload))
        )
    return rows


def g_vector_tiles_stats(zoom: int = 8, tp: int = 256):
    """Golden twin of the single-zoom vector-tile query (scalar assembly
    in _scalar_vector_tiles over the full-resolution way fixture)."""
    bbox = (int(50.0e7), int(-2.0e7), int(53.0e7), int(1.8e7))
    ways_ll = {
        wid: [(la, lo) for _nid, la, lo in pts]
        for wid, pts in _resolved_ways().items()
    }
    rows = _scalar_vector_tiles(ways_ll, bbox, zoom, tp)
    return ["tile_x", "tile_y", "n_ways", "n_geoms", "n_segs", "payload_crc"], rows, {}


def g_vector_tile_pyramid_stats(zoom: int = 8, min_zoom: int = 6, tp: int = 256,
                                min_px: float = 2.0):
    """Golden twin of the per-zoom LOD vector pyramid: for each level,
    scalar Douglas-Peucker at that zoom's one-pixel tolerance (_dp_keep,
    mercator GRID units) + the sub-pixel envelope drop rule (the same
    statements g_geo_lod_tables pins), then the shared scalar vector-tile
    assembly on the SIMPLIFIED geometry."""
    bbox = (int(50.0e7), int(-2.0e7), int(53.0e7), int(1.8e7))
    resolved = _resolved_ways()
    rows = []
    for z in range(zoom, min_zoom - 1, -1):
        eps = 1.0 * float(1 << (26 - z)) / 256.0
        px_deg = int(3_600_000_000 / ((1 << z) * 256))
        ways_ll: dict = {}
        for wid, pts in resolved.items():
            la = np.asarray([p[1] for p in pts], dtype=np.int64)
            lo = np.asarray([p[2] for p in pts], dtype=np.int64)
            if not (
                int(lo.max()) - int(lo.min()) >= min_px * px_deg
                or int(la.max()) - int(la.min()) >= min_px * px_deg
            ):
                continue
            if len(la) <= 2:
                keep = [True] * len(la)
            else:
                ux, uy = _unit_xy(la, lo)
                keep = _dp_keep(list(ux * GRID), list(uy * GRID), eps)
            ways_ll[wid] = [
                (int(a), int(b)) for a, b, k in zip(la, lo, keep) if k
            ]
        for r in _scalar_vector_tiles(ways_ll, bbox, z, tp):
            rows.append((z, *r))
    return (
        ["zoom", "tile_x", "tile_y", "n_ways", "n_geoms", "n_segs", "payload_crc"],
        rows,
        {},
    )


def g_geo_render_pyramid(zoom: int = 8, min_zoom: int = 6):
    """Golden twin of the raster pyramid: scalar base raster at `zoom`,
    then per-level scalar 2x max-pool of each parent's quadrant mosaic
    (independent per-pixel statement of the overzoom rule — the engine
    uses a reshape/max trick, the pytest a third copy)."""
    bbox = (int(50.0e7), int(-2.0e7), int(53.0e7), int(1.8e7))
    tp = 256
    level = {
        k: (len(ways), img)
        for k, (ways, img) in _scalar_base_tiles(bbox, zoom, tp).items()
    }
    rows = []
    for z in range(zoom, min_zoom - 1, -1):
        for (tx, ty), (n_src, img) in sorted(level.items()):
            rows.append(
                (z, tx, ty, n_src, int(np.count_nonzero(img)),
                 zlib.crc32(img.tobytes()))
            )
        if z == min_zoom:
            break
        parents: dict[tuple[int, int], tuple[int, np.ndarray]] = {}
        for (tx, ty), (_n, img) in level.items():
            key = (tx // 2, ty // 2)
            n_prev, mosaic = parents.get(key, (0, np.zeros((2 * tp, 2 * tp), np.uint8)))
            mosaic[(ty % 2) * tp : (ty % 2 + 1) * tp, (tx % 2) * tp : (tx % 2 + 1) * tp] = img
            parents[key] = (n_prev + 1, mosaic)
        level = {}
        for key, (n_children, mosaic) in parents.items():
            pooled = np.zeros((tp, tp), np.uint8)
            for yy in range(tp):
                for xx in range(tp):
                    pooled[yy, xx] = max(
                        mosaic[2 * yy, 2 * xx], mosaic[2 * yy, 2 * xx + 1],
                        mosaic[2 * yy + 1, 2 * xx], mosaic[2 * yy + 1, 2 * xx + 1],
                    )
            level[key] = (n_children, pooled)
    return ["zoom", "tile_x", "tile_y", "n_src", "n_px", "px_crc"], rows, {}


def _scalar_polygon_tiles(bbox, zoom: int, tp: int):
    """Scalar polygon fill shared by the single-layer and composite-map
    goldens — the fill rule's THIRD lockstep copy (kernels/raster.py holds
    the vectorized and per-pixel scalar engine statements; this one
    decomposes by SCANLINE): per tile, per polygon, per row, collect the
    exact integer crossing thresholds of edges straddling the row, sort
    them, and a pixel is inside iff the count of thresholds strictly
    greater than px is odd. Holes are just more edges (even/odd);
    overlapping polygons OR. Returns {(tx, ty): (n_polys, img)}."""
    import bisect

    from coords_spark.fixtures import gen_relations

    lat0, lon0, lat1, lon1 = bbox
    scale = tp << zoom

    def pix(lat, lon):
        ux, uy = mc.mercator_unit(lat, lon)
        return min(int(ux * scale), scale - 1), min(int(uy * scale), scale - 1)

    cx0, cy0 = pix(lat0, lon0)
    cx1, cy1 = pix(lat1, lon1)
    tx0, tx1 = sorted((cx0 // tp, cx1 // tp))
    ty0, ty1 = sorted((cy0 // tp, cy1 // tp))

    relations, ring_ways = (t.to_pylist() for t in gen_relations(60))
    way_pts = {w["id"]: [(p["lat"], p["lon"]) for p in w["pts"]] for w in ring_ways}
    polys = []  # list of ring lists, each ring = [(gx, gy), ...]
    for rel in relations:
        arcs = [way_pts[m["ref"]] for m in rel["members"]
                if m["mtype"] == 1 and m["ref"] in way_pts]
        if not arcs:
            continue
        for outer, holes in mc.oracle_build_polygons(arcs):
            polys.append(
                [[pix(la, lo) for la, lo in ring] for ring in [outer, *holes]]
            )

    tiles: dict = {}
    for rings in polys:
        xs = [x for x, _ in rings[0]]
        ys = [y for _, y in rings[0]]
        a, b = max(min(xs) // tp, tx0), min(max(xs) // tp, tx1)
        c, d = max(min(ys) // tp, ty0), min(max(ys) // tp, ty1)
        if a > b or c > d:
            continue
        for tx in range(a, b + 1):
            for ty in range(c, d + 1):
                tiles.setdefault((tx, ty), []).append(rings)

    out = {}
    for (tx, ty), tile_polys in sorted(tiles.items()):
        img = np.zeros((tp, tp), np.uint8)
        for rings in tile_polys:
            # closed local edges of ALL this polygon's rings
            edges = []
            for ring in rings:
                loc = [(x - tx * tp, y - ty * tp) for x, y in ring]
                for (x0, y0), (x1, y1) in zip(loc, loc[1:] + loc[:1]):
                    if y0 != y1:
                        edges.append((x0, y0, x1, y1))
            for py in range(tp):
                ts = []
                for x0, y0, x1, y1 in edges:
                    if (y0 > py) != (y1 > py):
                        num = (x1 - x0) * (py - y0)
                        den = y1 - y0
                        if den < 0:
                            num, den = -num, -den
                        ts.append(x0 + -(-num // den))  # px < x_int <=> px < T
                if not ts:
                    continue
                ts.sort()
                n = len(ts)
                for px in range(tp):
                    if (n - bisect.bisect_right(ts, px)) & 1:
                        img[py, px] = 255
        out[(tx, ty)] = (len(tile_polys), img)
    return out


def g_geo_render_polygons(zoom: int = 7, tp: int = 256):
    """Golden twin of the polygon-fill render query (scalar scanline fill
    in _scalar_polygon_tiles, world viewport)."""
    bbox = (int(-85.0e7), int(-179.9e7), int(85.0e7), int(179.9e7))
    rows = [
        (tx, ty, n, int(np.count_nonzero(img)), zlib.crc32(img.tobytes()))
        for (tx, ty), (n, img) in sorted(
            _scalar_polygon_tiles(bbox, zoom, tp).items()
        )
    ]
    return ["tile_x", "tile_y", "n_polys", "n_px", "px_crc"], rows, {}


def g_geo_render_map_stats(zoom: int = 8, tp: int = 256):
    """Golden twin of the COMPOSITE map-tile query: scalar line raster
    (_scalar_base_tiles — piece fan-out + per-sample walk) OR scalar
    polygon fill (_scalar_polygon_tiles — scanline thresholds) per tile,
    union of both tile sets, London viewport. Pins that compositing is
    exactly mask-OR with absent layers as zero."""
    bbox = (int(50.0e7), int(-2.0e7), int(53.0e7), int(1.8e7))
    lines = _scalar_base_tiles(bbox, zoom, tp)
    fills = _scalar_polygon_tiles(bbox, zoom, tp)
    rows = []
    for key in sorted(set(lines) | set(fills)):
        ways, limg = lines.get(key, (set(), None))
        n_polys, fimg = fills.get(key, (0, None))
        img = np.zeros((tp, tp), np.uint8)
        if limg is not None:
            np.maximum(img, limg, out=img)
        if fimg is not None:
            np.maximum(img, fimg, out=img)
        rows.append(
            (key[0], key[1], len(ways), n_polys,
             int(np.count_nonzero(img)), zlib.crc32(img.tobytes()))
        )
    return (
        ["tile_x", "tile_y", "n_ways", "n_polys", "n_px", "px_crc"],
        rows,
        {},
    )


def g_geo_multipolygon_assembly():
    from coords_spark.fixtures import gen_relations

    relations, ring_ways = (t.to_pylist() for t in gen_relations(60))
    way_pts = {w["id"]: [(p["lat"], p["lon"]) for p in w["pts"]] for w in ring_ways}
    rows = []
    for rel in relations:
        arcs = []
        for m in rel["members"]:
            if m["mtype"] == 1 and m["ref"] in way_pts:
                arcs.append(way_pts[m["ref"]])
        if not arcs:
            continue
        polys = mc.oracle_build_polygons(arcs)
        if not polys:
            continue
        n_polys = len(polys)
        outer_v = sum(len(outer) for outer, _h in polys)
        n_holes = sum(len(h) for _o, h in polys)
        rows.append((rel["id"], n_polys, outer_v, n_holes))
    return ["relation_id", "n_polygons", "outer_vertices", "n_holes"], sorted(rows), {}


def _dp_keep(x: list[float], y: list[float], eps: float) -> list[bool]:
    """Independent scalar Douglas-Peucker (recursive; first-max split like
    the engine's kernel — that tie-break IS part of the spec)."""
    n = len(x)
    keep = [False] * n
    keep[0] = keep[-1] = True

    def rec(i: int, j: int) -> None:
        if j <= i + 1:
            return
        dx, dy = x[j] - x[i], y[j] - y[i]
        seg = math.hypot(dx, dy)
        best, bd = -1, -1.0
        for m in range(i + 1, j):
            if seg == 0.0:
                d = math.hypot(x[m] - x[i], y[m] - y[i])
            else:
                d = abs(dx * (y[i] - y[m]) - (x[i] - x[m]) * dy) / seg
            if d > bd:
                best, bd = m, d
        if bd > eps:
            keep[best] = True
            rec(i, best)
            rec(best, j)

    rec(0, n - 1)
    return keep


def g_geo_lod_tables(lods=(6, 10, 14), min_px: float = 2.0):
    resolved = _resolved_ways()
    ways = []
    for wid, pts in resolved.items():
        la = np.asarray([p[1] for p in pts], dtype=np.int64)
        lo = np.asarray([p[2] for p in pts], dtype=np.int64)
        ux, uy = _unit_xy(la, lo)
        ways.append((la, lo, ux * GRID, uy * GRID))
    rows = []
    for lod in sorted(lods):
        eps = 1.0 * float(1 << (26 - lod)) / 256.0
        px_deg = int(3_600_000_000 / ((1 << lod) * 256))
        n_feat = 0
        n_vert = 0
        for la, lo, gx, gy in ways:
            if not (
                int(lo.max()) - int(lo.min()) >= min_px * px_deg
                or int(la.max()) - int(la.min()) >= min_px * px_deg
            ):
                continue
            n_feat += 1
            if len(gx) <= 2:
                n_vert += len(gx)
            else:
                n_vert += sum(_dp_keep(list(gx), list(gy), eps))
        rows.append((lod, n_feat, n_vert))
    return ["lod", "n_features", "n_vertices"], rows, {}


def g_payload_decode_verify(n: int = 400):
    """Regression pin (kernel-computed): fmt-level counts of the 400-image
    verification batch. Both fixture formats are lossless, so payload_ok
    requires exact hash equality and psnr is the 999.0 sentinel."""
    from coords_spark.fixtures import gen_images
    from coords_spark.kernels import codec, phash as ph

    t = gen_images(n).to_pylist()
    agg: dict[str, list] = {}
    for r in t:
        img = codec.decode_image(r["bytes"], r["fmt"], r["w"], r["h"])
        ref = ph.procedural_image(r["image_id"], r["w"], r["h"])
        p = codec.psnr(ref, img)
        hrec = ph.blockhash64(img)
        if codec.is_lossless(r["fmt"]):
            hok = hrec == r["phash"]
        else:
            hok = bin((hrec ^ r["phash"]) & ((1 << 64) - 1)).count("1") <= 8
        pv = 999.0 if math.isinf(p) else p
        ok = pv >= 40.0 and hok
        from coords_spark.fixtures import expected_caption

        la, lo = ph.anchor(np.asarray([r["phash"]], dtype=np.int64))
        want_cap = expected_caption(int(r["image_id"][3:]), la[0], lo[0])
        a = agg.setdefault(r["fmt"], [0, 0, 0, float("inf")])
        a[0] += 1
        a[1] += int(ok)
        a[2] += int(r["caption"] == want_cap)
        a[3] = min(a[3], pv)
    rows = [(f, a[0], a[1], a[2], round(a[3], 2)) for f, a in sorted(agg.items())]
    return ["fmt", "n", "n_ok", "n_caption_ok", "min_psnr"], rows, {
        "fmt": "VARCHAR", "min_psnr": "DOUBLE"}


def _doc_shingles() -> dict[int, set]:
    docs = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]).to_pylist()
    out = {}
    for d in docs:
        words = [w for w in (d["text"] or "").split() if w]
        out[int(d["doc_id"])] = {
            " ".join(words[i : i + 3]) for i in range(len(words) - 2)
        } if len(words) >= 3 else set()
    return out


def g_dedup_minhash_lsh_pairs(n_bands: int = 8, rows_per_band: int = 2, threshold: float = 0.3):
    sh = _doc_shingles()
    n_hashes = n_bands * rows_per_band
    seeds = [xxh64.hash_bytes(str(i).encode()) & 0xFFFFFFFFFFFFFFFF for i in range(n_hashes)]
    hv_cache: dict[str, list[int]] = {}

    def shingle_hashes(s: str) -> list[int]:
        if s not in hv_cache:
            b = s.encode()
            hv_cache[s] = [xxh64.hash_bytes(b, seed=sd) for sd in seeds]
        return hv_cache[s]

    buckets: dict[tuple, list[int]] = {}
    for doc, shs in sh.items():
        if not shs:
            continue
        mins = [min(shingle_hashes(s)[i] for s in shs) for i in range(n_hashes)]
        for band in range(n_bands):
            pair = mins[band * rows_per_band : (band + 1) * rows_per_band]
            sig = (band, tuple(sorted(str(v) for v in pair)))
            buckets.setdefault(sig, []).append(doc)
    cand = set()
    for docs_in in buckets.values():
        ds = sorted(set(docs_in))
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                cand.add((ds[i], ds[j]))
    rows = []
    for a, b in sorted(cand):
        na, nb = len(sh[a]), len(sh[b])
        ncom = len(sh[a] & sh[b])
        denom = na + nb - ncom
        if denom and ncom / denom >= threshold:
            rows.append((a, b, ncom / denom))
    return ["doc_a", "doc_b", "jaccard"], rows, {"jaccard": "DOUBLE"}


def _simhash64(text: str) -> int:
    toks = [w for w in (text or "").lower().split() if w]
    if not toks:
        return 0
    hs = splitmix64(np.asarray([zlib.crc32(w.encode()) for w in toks], dtype=np.uint64))
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
    votes = bits.sum(axis=0) * 2 - len(toks)
    sim = np.uint64(0)
    for b in np.nonzero(votes > 0)[0]:
        sim |= np.uint64(1) << np.uint64(b)
    return int(np.uint64(sim).view(np.int64))


def g_dedup_simhash_pairs(max_hamming: int = 8):
    docs = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]).to_pylist()
    fps = {int(d["doc_id"]): _simhash64(d["text"]) for d in docs}
    n_blocks = max_hamming + 1
    base, rem = divmod(64, n_blocks)
    widths = [base + 1 if b < rem else base for b in range(n_blocks)]
    starts = [sum(widths[:b]) for b in range(n_blocks)]
    buckets: dict[tuple, list[int]] = {}
    for doc, fp in fps.items():
        u = fp & 0xFFFFFFFFFFFFFFFF
        for b, (s, w) in enumerate(zip(starts, widths)):
            buckets.setdefault((b, (u >> s) & ((1 << w) - 1)), []).append(doc)
    cand = set()
    for ds in buckets.values():
        ds = sorted(set(ds))
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                cand.add((ds[i], ds[j]))
    rows = []
    for a, b in sorted(cand):
        ham = bin((fps[a] ^ fps[b]) & 0xFFFFFFFFFFFFFFFF).count("1")
        if ham <= max_hamming:
            rows.append((a, b, ham))
    return ["doc_a", "doc_b", "hamming"], rows, {}


def g_embedding_ann_topk(k: int = 10, n_planes: int = 8, seed: int = 7, probe_hamming: int = 2):
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy()
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in t.column("embedding").to_pylist()])
    qv = mat[list(ids).index(0)]
    dim = mat.shape[1]
    idx = np.arange(dim * n_planes, dtype=np.uint64) + np.uint64(seed * 1_000_003)
    u = (splitmix64(idx) >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    planes = u.reshape(n_planes, dim) * 2.0 - 1.0
    weights = (1 << np.arange(n_planes)).astype(np.int64)
    sigs = ((mat @ planes.T) > 0) @ weights
    qsig = int(((qv @ planes.T) > 0) @ weights)
    probes = {qsig}
    if probe_hamming >= 1:
        for i in range(n_planes):
            probes.add(qsig ^ (1 << i))
    if probe_hamming >= 2:
        for i in range(n_planes):
            for j in range(i + 1, n_planes):
                probes.add(qsig ^ (1 << i) ^ (1 << j))
    cand = np.isin(sigs, list(probes))
    # cosine exactly as the engine's fold: sequential left-to-right sums
    rows = []
    qn = math.sqrt(math.fsum(float(x) * float(x) for x in qv))
    for i in np.nonzero(cand)[0]:
        v = mat[i]
        dot = 0.0
        nv = 0.0
        for a, b in zip(v, qv):
            dot += float(a) * float(b)
            nv += float(a) * float(a)
        cos = dot / (math.sqrt(nv) * qn)
        rows.append((int(ids[i]), cos))
    rows.sort(key=lambda r: (-r[1], r[0]))
    out = [(vid, round(c, 5)) for vid, c in rows[:k]]
    return ["vec_id", "sim"], out, {"sim": "DOUBLE"}


# --------------------------------------------------------------------------
# SQL emission
# --------------------------------------------------------------------------


def _lit(v, typ: str) -> str:
    if v is None:
        return "NULL"
    if typ == "VARCHAR":
        return "'" + str(v).replace("'", "''") + "'"
    if typ == "BOOLEAN":
        return "TRUE" if v else "FALSE"
    if typ == "DOUBLE":
        return repr(float(v))
    return str(int(v))


def to_sql(cols: list[str], rows: list[tuple], types: dict[str, str]) -> str:
    typs = [types.get(c, "BIGINT") for c in cols]
    sel = ", ".join(f"CAST({c} AS {t}) AS {c}" for c, t in zip(cols, typs))
    if not rows:
        inner = ", ".join(f"NULL AS {c}" for c in cols)
        return f"SELECT {sel} FROM (SELECT {inner}) t WHERE 1=0"
    vals = ",\n      ".join(
        "(" + ", ".join(_lit(v, t) for v, t in zip(r, typs)) + ")" for r in rows
    )
    collist = ", ".join(cols)
    return f"SELECT {sel} FROM (VALUES\n      {vals}\n    ) t({collist})"


def g_embedding_ann_join_topk(k: int = 5, n_planes: int = 8, seed: int = 7,
                              probe_hamming: int = 2, n_queries: int = 3):
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy()
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in t.column("embedding").to_pylist()])
    dim = mat.shape[1]
    idx = np.arange(dim * n_planes, dtype=np.uint64) + np.uint64(seed * 1_000_003)
    u = (splitmix64(idx) >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    planes = u.reshape(n_planes, dim) * 2.0 - 1.0
    weights = (1 << np.arange(n_planes)).astype(np.int64)
    sigs = (((mat @ planes.T) > 0) @ weights).astype(np.int64)

    def seq_cosine(v, q):
        dot = nv = nq = 0.0
        for a, b in zip(v, q):
            dot += float(a) * float(b)
            nv += float(a) * float(a)
            nq += float(b) * float(b)
        return dot / (math.sqrt(nv) * math.sqrt(nq))

    rows = []
    for qi in np.nonzero(ids < n_queries)[0]:
        qv = mat[qi]
        qsig = int(sigs[qi])
        probes = {qsig}
        if probe_hamming >= 1:
            for i in range(n_planes):
                probes.add(qsig ^ (1 << i))
        if probe_hamming >= 2:
            for i in range(n_planes):
                for j in range(i + 1, n_planes):
                    probes.add(qsig ^ (1 << i) ^ (1 << j))
        cand = [
            (int(ids[i]), seq_cosine(mat[i], qv))
            for i in np.nonzero(np.isin(sigs, list(probes)))[0]
        ]
        cand.sort(key=lambda r: (-r[1], r[0]))
        for rank, (vid, cos) in enumerate(cand[:k], start=1):
            rows.append((str(int(ids[qi])), vid, round(cos, 5), rank))
    return ["qid", "vec_id", "sim", "rank"], rows, {"qid": "VARCHAR", "sim": "DOUBLE"}


def g_dedup_embedding_cosine_pairs(
    threshold: float = 0.999, n_bands: int = 4, planes_per_band: int = 4, seed: int = 7
):
    """Independent scalar twin of the banded hyperplane-LSH near-dup with 5
    planted clones: per band, sign-signature buckets over splitmix64
    hyperplanes; candidates = any-band collision; verify = sequential-fold
    cosine >= threshold."""
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = [int(v) for v in t.column("vec_id").to_numpy()]
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in t.column("embedding").to_pylist()])
    sel = [i for i, v in enumerate(ids) if v < 5]
    ids = ids + [ids[i] + 10000 for i in sel]
    mat = np.vstack([mat, mat[sel]])
    dim = mat.shape[1]
    weights = (1 << np.arange(planes_per_band)).astype(np.int64)
    cand = set()
    for band in range(n_bands):
        s = seed + 101 * band
        idx = np.arange(dim * planes_per_band, dtype=np.uint64) + np.uint64(s * 1_000_003)
        u = (splitmix64(idx) >> np.uint64(11)).astype(np.float64) / float(1 << 53)
        planes = u.reshape(planes_per_band, dim) * 2.0 - 1.0
        sigs = (((mat @ planes.T) > 0) @ weights).astype(np.int64)
        buckets: dict[int, list[int]] = {}
        for i, sg in enumerate(sigs):
            buckets.setdefault(int(sg), []).append(i)
        for members in buckets.values():
            for ai in range(len(members)):
                for bi in range(ai + 1, len(members)):
                    x, y = members[ai], members[bi]
                    if ids[x] == ids[y]:
                        continue
                    cand.add((x, y) if ids[x] < ids[y] else (y, x))

    def seq_cosine(v, q):
        dot = nv = nq = 0.0
        for a, b in zip(v, q):
            dot += float(a) * float(b)
            nv += float(a) * float(a)
            nq += float(b) * float(b)
        return dot / (math.sqrt(nv) * math.sqrt(nq))

    rows = []
    for x, y in cand:
        c = seq_cosine(mat[x], mat[y])
        if c >= threshold:
            rows.append((ids[x], ids[y], round(c, 6)))
    rows.sort()
    return ["id_a", "id_b", "cosine"], rows, {"cosine": "DOUBLE"}


def g_embedding_ivf_topk(k: int = 5, n_centroids: int = 16, nprobe: int = 3, n_queries: int = 3):
    """Independent scalar twin of the IVF query-set ANN: sampled coarse
    quantizer (smallest xxh64(vec_id) — kernel parity-tested against
    Spark's xxhash64), argmax-cosine cell assignment, nprobe probe cells,
    exact sequential-fold cosine re-rank."""
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy()
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in t.column("embedding").to_pylist()])
    h = xxh64.hash_long(np.asarray(ids, dtype=np.int64))
    order = sorted(range(len(ids)), key=lambda i: (h[i], ids[i]))[:n_centroids]
    cent = sorted((int(ids[i]), mat[i]) for i in order)
    cids = np.asarray([c for c, _ in cent], dtype=np.int64)
    cm = np.stack([v for _, v in cent])
    cnorm = np.linalg.norm(cm, axis=1)
    cnorm[cnorm == 0] = 1.0
    cn = cm / cnorm[:, None]
    vnorm = np.linalg.norm(mat, axis=1)
    vnorm[vnorm == 0] = 1.0
    sims = (mat / vnorm[:, None]) @ cn.T
    assign = cids[np.argmax(sims, axis=1)]

    def seq_cosine(v, q):
        dot = nv = nq = 0.0
        for a, b in zip(v, q):
            dot += float(a) * float(b)
            nv += float(a) * float(a)
            nq += float(b) * float(b)
        return dot / (math.sqrt(nv) * math.sqrt(nq))

    rows = []
    for qi in np.nonzero(ids < n_queries)[0]:
        probes = cids[np.argsort(-sims[qi], kind="stable")[:nprobe]]
        cand = [
            (int(ids[i]), seq_cosine(mat[i], mat[qi]))
            for i in np.nonzero(np.isin(assign, probes))[0]
        ]
        cand.sort(key=lambda r: (-r[1], r[0]))
        for rank, (vid, cos) in enumerate(cand[:k], start=1):
            rows.append((str(int(ids[qi])), vid, round(cos, 5), rank))
    return ["qid", "vec_id", "sim", "rank"], rows, {"qid": "VARCHAR", "sim": "DOUBLE"}


def g_osm_tag_histogram(n: int = 4000, k: int = 15):
    from coords_spark.fixtures import gen_nodes

    counts: dict[str, int] = {}
    for node in gen_nodes(n).to_pylist():
        for key in dict(node["tags"]):
            counts[key] = counts.get(key, 0) + 1
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return ["tag_key", "n"], top, {"tag_key": "VARCHAR"}


def g_geo_node_way_reverse_index(n_ways: int = 600, n_nodes: int = 4000, k: int = 20):
    from coords_spark.fixtures import gen_ways

    deg: dict[int, int] = {}
    for w in gen_ways(n_ways, n_nodes).to_pylist():
        for node in set(w["refs"]):
            deg[node] = deg.get(node, 0) + 1
    top = sorted(deg.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return ["node_id", "n_ways"], top, {}


def g_ingest_ledger_invariant():
    """Independent scalar twin of the streaming exactly-once ingest query:
    the three fixed image drops (120/100/80 images) are chunk-assigned with
    the minicoords split-set/assign rules; per-drop (n_rows, distinct
    chunks) sorted by size is batch-order-invariant, and the checksum /
    restart flags are TRUE by the ledger contract."""
    from coords_spark.fixtures import gen_images

    t = gen_images(300, with_bytes=False).to_pylist()
    ph = np.asarray([r["phash"] for r in t], dtype=np.int64)
    la, lo = anchor(ph)
    ux, uy = _unit_xy(la.astype(np.int64), lo.astype(np.int64))
    gx, gy = _grid_int(ux, uy)
    cells = [mc.cell_id(int(x), int(y), BASE_LEVEL) for x, y in zip(gx, gy)]
    splits = mc.split_set([(c, 4096) for c in cells], 256 * 1024, BASE_LEVEL)
    chunks = [mc.assign_chunk(c, splits, BASE_LEVEL) for c in cells]
    slices = [(0, 120), (120, 220), (220, 300)]
    stats = sorted(((b - a, len(set(chunks[a:b]))) for a, b in slices), reverse=True)
    rows = [(i + 1, n, k, True, True) for i, (n, k) in enumerate(stats)]
    return (
        ["grp_rank", "n_rows", "n_chunks", "checksums_ok", "stable_after_restart"],
        rows,
        {"checksums_ok": "BOOLEAN", "stable_after_restart": "BOOLEAN"},
    )


def g_icepick_roundtrip_stats():
    cols, rows, types = g_geo_chunk_rollup()
    return ["chunk_id", "n_points"], [(r[0], r[1]) for r in rows], {}


def g_dedup_cluster_stats():
    """Union-find over the independently recomputed verified MinHash pair
    set (the scalar twin of dup_clusters' min-label propagation)."""
    _, pair_rows, _ = g_dedup_minhash_lsh_pairs()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b, _j in pair_rows:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    clusters: dict[int, list[int]] = {}
    for node in parent:
        clusters.setdefault(find(node), []).append(node)
    rows = [
        (min(members), len(members), sum(members))
        for members in clusters.values()
    ]
    return ["cluster_id", "n_docs", "doc_id_sum"], sorted(rows), {}


def g_icepick_time_travel():
    """Scalar twin of the snapshot-isolation query: the two deterministic
    key prefixes' counts and sums."""
    rows = [
        (1, 700, sum(range(700))),        # snapshot after commit 1
        (2, 1000, sum(range(1000))),      # snapshot after commit 2 (both)
    ]
    return ["snap", "n_rows", "key_sum"], rows, {"snap": "INTEGER"}


def g_geo_render_tiles(zoom: int = 8):
    """Scalar twin of the per-tile viewport aggregation: bbox filter on the
    anchor lat/lon, cell id at the render zoom, (count, key sum) per tile."""
    keys, lat, lon = _points_from_table(f"{SF_DIR}/orders.parquet", "o_orderkey")
    ux, uy = _unit_xy(lat, lon)
    gx, gy = _grid_int(ux, uy)
    lat0, lon0, lat1, lon1 = 500000000, -20000000, 530000000, 18000000
    agg: dict[int, list[int]] = {}
    for i in range(len(keys)):
        if not (lat0 <= lat[i] <= lat1 and lon0 <= lon[i] <= lon1):
            continue
        t = mc.cell_id(int(gx[i]), int(gy[i]), zoom)
        a = agg.setdefault(t, [0, 0])
        a[0] += 1
        a[1] += int(keys[i])
    rows = [(t, n, s) for t, (n, s) in sorted(agg.items())]
    return ["tile", "n_points", "key_sum"], rows, {}


def g_cpbf_ingest_stats(n_nodes: int = 4000, n_ways: int = 600, n_rels: int = 200):
    """Independent scalar twin of the cpbf codec gate: per-kind row count,
    id/coordinate/ref/member sums and tag/role crc32 checksums computed
    straight from the fixture tables (never through the codec)."""
    from coords_spark.fixtures import gen_nodes, gen_relations, gen_ways

    def tag_crc(tags) -> int:
        return sum(zlib.crc32(f"{k}={v}".encode()) for k, v in tags)

    def member_sum(members) -> int:
        return sum(
            m["mtype"] * 1000003 + m["ref"] + zlib.crc32(m["role"].encode())
            for m in members
        )

    nodes = gen_nodes(n_nodes).to_pylist()
    ways = gen_ways(n_ways, n_nodes).to_pylist()
    rels = gen_relations(n_rels)[0].to_pylist()
    rows = [
        (
            "nodes",
            len(nodes),
            sum(r["id"] for r in nodes),
            sum(r["lat"] + r["lon"] for r in nodes),
            sum(len(r["tags"]) for r in nodes),
            sum(tag_crc(r["tags"]) for r in nodes),
        ),
        (
            "relations",
            len(rels),
            sum(r["id"] for r in rels),
            sum(member_sum(r["members"]) for r in rels),
            sum(len(r["tags"]) for r in rels),
            sum(tag_crc(r["tags"]) for r in rels),
        ),
        (
            "ways",
            len(ways),
            sum(r["id"] for r in ways),
            sum(sum(r["refs"]) for r in ways),
            sum(len(r["tags"]) for r in ways),
            sum(tag_crc(r["tags"]) for r in ways),
        ),
    ]
    return ["kind", "n", "id_sum", "payload_sum", "n_tags", "tag_crc_sum"], rows, {
        "kind": "VARCHAR"
    }


def g_geo_render_bbox():
    """Independent scalar twin of the bbox+zoom render read: filter the
    order-derived points to the London viewport (inclusive i32 bbox on the
    anchor lat/lon), assign chunks with the minicoords split rules, and
    aggregate (count, key sum) per chunk."""
    keys, lat, lon = _points_from_table(f"{SF_DIR}/orders.parquet", "o_orderkey")
    ux, uy = _unit_xy(lat, lon)
    gx, gy = _grid_int(ux, uy)
    cells = [mc.cell_id(int(x), int(y), BASE_LEVEL) for x, y in zip(gx, gy)]
    splits = mc.split_set([(c, 128) for c in cells], 64 * 1024, BASE_LEVEL)
    lat0, lon0, lat1, lon1 = 500000000, -20000000, 530000000, 18000000
    agg: dict[int, list[int]] = {}
    for i, c in enumerate(cells):
        if not (lat0 <= lat[i] <= lat1 and lon0 <= lon[i] <= lon1):
            continue
        ch = mc.assign_chunk(c, splits, BASE_LEVEL)
        a = agg.setdefault(ch, [0, 0])
        a[0] += 1
        a[1] += int(keys[i])
    rows = [(ch, n, s) for ch, (n, s) in sorted(agg.items())]
    return ["chunk_id", "n_points", "key_sum"], rows, {}


GENERATORS = {
    "embedding_ann_join_topk": g_embedding_ann_join_topk,
    "icepick_roundtrip_stats": g_icepick_roundtrip_stats,
    "geo_render_bbox": g_geo_render_bbox,
    "cpbf_ingest_stats": g_cpbf_ingest_stats,
    # same independent fixture-table stats pin BOTH codec front doors —
    # the golden never routes through either codec, so it gates each
    "pbf_ingest_stats": g_cpbf_ingest_stats,
    "geo_render_tiles": g_geo_render_tiles,
    "icepick_time_travel": g_icepick_time_travel,
    "dedup_cluster_stats": g_dedup_cluster_stats,
    "ingest_ledger_invariant": g_ingest_ledger_invariant,
    "osm_tag_histogram": g_osm_tag_histogram,
    "geo_node_way_reverse_index": g_geo_node_way_reverse_index,
    "geo_chunk_rollup": g_geo_chunk_rollup,
    "geo_pip_enrich": g_geo_pip_enrich,
    "geo_coastline_classify": g_geo_coastline_classify,
    "geo_knn_ring": g_geo_knn_ring,
    "geo_raster_vector_align": g_geo_raster_vector_align,
    "geo_osm_way_tiling": g_geo_osm_way_tiling,
    "incremental_update_apply": g_incremental_update_apply,
    "relation_diff_apply": g_relation_diff_apply,
    "pbf_create_tiles_stats": g_pbf_create_tiles_stats,
    "icepick_compact_stats": g_icepick_compact_stats,
    "update_stream_apply": g_update_stream_apply,
    "dirty_tiles_stats": g_dirty_tiles_stats,
    "osc_update_render_stats": g_osc_update_render_stats,
    "geo_render_raster": g_geo_render_raster,
    "geo_render_pyramid": g_geo_render_pyramid,
    "vector_tiles_stats": g_vector_tiles_stats,
    # the sink-materialized pyramid must land on the SAME rows — the
    # icepick commit/read-back path is required to be transparent
    "pyramid_table_stats": g_geo_render_pyramid,
    "osc_parse_rollup": g_osc_parse_rollup,
    # E1-from-real-pbf lands on the SAME scalar rows as the way-tiling twin
    # (identical fixture + chunk rules; the pbf codec and icepick roundtrip
    # must be transparent)
    "pbf_create_storage_stats": g_geo_osm_way_tiling,
    "geo_multipolygon_assembly": g_geo_multipolygon_assembly,
    "geo_render_polygons": g_geo_render_polygons,
    "geo_render_map_stats": g_geo_render_map_stats,
    "vector_tile_pyramid_stats": g_vector_tile_pyramid_stats,
    "geo_lod_tables": g_geo_lod_tables,
    "payload_decode_verify": g_payload_decode_verify,
    "dedup_minhash_lsh_pairs": g_dedup_minhash_lsh_pairs,
    "dedup_simhash_pairs": g_dedup_simhash_pairs,
    "embedding_ann_topk": g_embedding_ann_topk,
    "embedding_ivf_topk": g_embedding_ivf_topk,
    "dedup_embedding_cosine_pairs": g_dedup_embedding_cosine_pairs,
}


def main() -> None:
    only = set(sys.argv[1:])
    out_path = os.path.join(REPO, "coords_spark", "goldens.py")
    existing: dict[str, str] = {}
    if os.path.exists(out_path):
        ns: dict = {}
        exec(open(out_path).read(), ns)
        # strip the embedding wrapper whitespace on read-back, or partial
        # regenerations would re-wrap and accumulate blank-line padding
        existing = {k: v.strip() for k, v in ns.get("GOLDEN_SQL", {}).items()}
    for name, gen in GENERATORS.items():
        if only and name not in only:
            continue
        import time

        t0 = time.time()
        cols, rows, types = gen()
        existing[name] = to_sql(cols, rows, types)
        print(f"{name}: {len(rows)} rows ({time.time() - t0:.1f}s)")
    body = [
        '"""Golden oracle SQL (generated by tools/gen_goldens.py — do not edit).',
        "",
        "Expected outputs for driver queries with no natural ANSI-SQL twin,",
        "computed by independent scalar implementations (minicoords oracle +",
        "tools/gen_goldens.py) at sf=0.01, embedded as VALUES literals so the",
        "driver's DuckDB hash gate pins these queries exactly.",
        '"""',
        "",
        "GOLDEN_SQL = {",
    ]
    for name in sorted(existing):
        body.append(f"    {name!r}: r'''\n    {existing[name]}\n    ''',")
    body.append("}")
    with open(out_path, "w") as f:
        f.write("\n".join(body) + "\n")
    print("wrote", out_path)


if __name__ == "__main__":
    main()
