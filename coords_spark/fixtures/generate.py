"""Deterministic fixture generators (FIXTURES.md §§1-3).

All columns derive from splitmix64 streams keyed by (salt, row_index) or
from sha256(image_id) — regeneration at any scale or subset is identical.
Tables are built as pyarrow Tables (fast columnar construction) and written
as parquet; Spark reads the files.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from coords_spark.kernels import codec, phash
from coords_spark.kernels.phash import COAST_LAT, COAST_LON, HOTSPOTS, _unif, splitmix64

_U = np.uint64

# image size cycle (FIXTURES.md §1); all multiples of 8 for the batch hash
_SIZES = [(16, 16), (32, 24), (64, 64)]
_FMTS = ["raw", "pngz"]


def _ids(n: int) -> np.ndarray:
    return np.arange(n, dtype=np.int64)


# --------------------------------------------------------------------------
# images — the graft input table (input_hint schema)
# --------------------------------------------------------------------------


def _procedural_batch(image_ids: list[str], w: int, h: int) -> np.ndarray:
    """Vectorized procedural images for a same-size batch: (N, h, w, 3) uint8.
    Identical per-image to kernels.phash.procedural_image."""
    import hashlib

    seeds = np.stack(
        [np.frombuffer(hashlib.sha256(s.encode()).digest(), dtype=np.uint8) for s in image_ids]
    )  # (N, 32)
    yy, xx = np.mgrid[0:h, 0:w]
    s0 = (1 + seeds[:, 0] % 7).astype(np.float64)[:, None, None]
    s1 = (1 + seeds[:, 1] % 7).astype(np.float64)[:, None, None]
    s2 = (1 + seeds[:, 2] % 7).astype(np.float64)[:, None, None]
    base = np.empty((len(image_ids), h, w, 3), dtype=np.float64)
    base[..., 0] = (xx[None] * s0) % 256
    base[..., 1] = (yy[None] * s1) % 256
    base[..., 2] = ((xx + yy)[None] * s2) % 256
    tile = seeds[:, np.arange(64) % 32].reshape(-1, 8, 8).astype(np.float64)
    noise = tile[:, yy % 8, xx % 8]
    img = (0.75 * base + 0.25 * noise[..., None]) % 256
    return img.astype(np.uint8)



def expected_caption(idx: int, lat_i32: int, lon_i32: int) -> str:
    """THE caption format — single source of truth for the input_hint
    "captions verified equal" invariant. Consumed by gen_images (producer),
    operators/images.py caption_ok (verifier), and tools/gen_goldens.py
    (golden pin)."""
    return f"synthetic scene {int(idx)} near ({lat_i32 * 1e-7:.5f},{lon_i32 * 1e-7:.5f})"


def gen_images(n: int, with_bytes: bool = True, offset: int = 0) -> pa.Table:
    """The Iceberg-style graft input (image_id, bytes, w, h, fmt, caption,
    phash) — FIXTURES.md §1. `with_bytes=False` keeps payloads tiny (4-byte
    marker) for throughput benches where only phash/anchors matter."""
    idx = _ids(n) + offset
    image_ids = [f"img{i:010d}" for i in idx]
    size_i = (idx % 3).astype(np.int64)
    ws = np.asarray([_SIZES[i][0] for i in size_i], dtype=np.int32)
    hs = np.asarray([_SIZES[i][1] for i in size_i], dtype=np.int32)
    fmts = [_FMTS[int(i % 2)] for i in idx]

    phashes = np.empty(n, dtype=np.int64)
    blobs: list[bytes | None] = [None] * n
    for si, (w, h) in enumerate(_SIZES):
        sel = np.nonzero(size_i == si)[0]
        if sel.size == 0:
            continue
        # keep the vectorized batch bounded in memory
        for lo in range(0, sel.size, 8192):
            sub = sel[lo : lo + 8192]
            imgs = _procedural_batch([image_ids[j] for j in sub], w, h)
            phashes[sub] = phash.blockhash64_batch(imgs)
            if with_bytes:
                for k, j in enumerate(sub):
                    blobs[j] = codec.encode_image(imgs[k], fmts[j])
    if not with_bytes:
        blobs = [b"\x00\x00\x00\x00"] * n

    lat_i32, lon_i32 = phash.anchor(phashes)
    captions = [
        expected_caption(i, la, lo) for i, la, lo in zip(idx, lat_i32, lon_i32)
    ]
    return pa.table(
        {
            "image_id": pa.array(image_ids, pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "w": pa.array(ws, pa.int32()),
            "h": pa.array(hs, pa.int32()),
            "fmt": pa.array(fmts, pa.string()),
            "caption": pa.array(captions, pa.string()),
            "phash": pa.array(phashes, pa.int64()),
        }
    )


def gen_points(n: int, offset: int = 0) -> pa.Table:
    """Fast image-point table for throughput benches: image_id + a synthetic
    phash (splitmix64 of the row index — same int64 key space as the real
    blockhash, same anchor skew) without pixel payloads. Columns
    (image_id, phash, lat, lon)."""
    idx = _ids(n) + offset
    ph = splitmix64(idx.astype(np.uint64) ^ _U(0x1111)).astype(np.int64)
    lat, lon = phash.anchor(ph)
    return pa.table(
        {
            "image_id": pa.array([f"img{i:010d}" for i in idx], pa.string()),
            "phash": pa.array(ph, pa.int64()),
            "lat": pa.array(lat, pa.int32()),
            "lon": pa.array(lon, pa.int32()),
        }
    )


# --------------------------------------------------------------------------
# OSM-extract-like vector fixture (FIXTURES.md §2)
# --------------------------------------------------------------------------

_TAG_KEYS = ["highway", "name", "building", "natural", "waterway", "amenity"]
_TAG_VALS = ["residential", "primary", "yes", "water", "river", "school", "park"]


def _tags_arrays(salt: int, idx: np.ndarray, p_tagged: float):
    """Deterministic small tag maps; returns (keys_list, vals_list) per row."""
    u = _unif(idx.astype(np.uint64), salt)
    ntags = np.where(u < p_tagged, 1 + (_unif(idx.astype(np.uint64), salt + 1) * 3).astype(int), 0)
    keys, vals = [], []
    for i, nt in enumerate(ntags):
        h = int(splitmix64(np.uint64(idx[i]) ^ np.uint64(salt * 1315423911)))
        ks, vs = [], []
        for t in range(int(nt)):
            ks.append(_TAG_KEYS[(h + 7 * t) % len(_TAG_KEYS)])
            vs.append(_TAG_VALS[(h // 13 + 5 * t) % len(_TAG_VALS)])
        # ensure unique keys (map semantics)
        seen = {}
        for k, v in zip(ks, vs):
            seen[k] = v
        keys.append(list(seen.keys()))
        vals.append(list(seen.values()))
    return keys, vals


def _map_array(keys: list[list[str]], vals: list[list[str]]) -> pa.Array:
    return pa.MapArray.from_arrays(
        pa.array(np.cumsum([0] + [len(k) for k in keys]), pa.int32()),
        pa.array([k for ks in keys for k in ks], pa.string()),
        pa.array([v for vs in vals for v in vs], pa.string()),
    )


def gen_nodes(n: int) -> pa.Table:
    idx = _ids(n)
    nid = idx * 2 + 1  # non-dense ids
    # node positions: same skewed distribution as image anchors
    lat, lon = phash.anchor(splitmix64(idx.astype(np.uint64) ^ _U(0xA5A5)).astype(np.int64))
    keys, vals = _tags_arrays(101, idx, 0.1)
    return pa.table(
        {
            "id": pa.array(nid, pa.int64()),
            "version": pa.array(np.ones(n, np.int32), pa.int32()),
            "lat": pa.array(lat, pa.int32()),
            "lon": pa.array(lon, pa.int32()),
            "tags": _map_array(keys, vals),
        }
    )


def gen_ways(n: int, n_nodes: int) -> pa.Table:
    """Heavy-tailed ref lists over the node id space; ~15% closed rings;
    every idx%1000==7 is a 2000-ref "mega-way" (skew driver)."""
    idx = _ids(n)
    wid = idx * 2 + 2
    u = _unif(idx.astype(np.uint64), 201)
    ln = (2 + np.floor(np.exp(u * 5.0))).astype(np.int64)  # 2..~150 heavy tail
    ln = np.where(idx % 1000 == 7, 2000, ln)
    ln = np.minimum(ln, max(2, n_nodes))
    start = (_unif(idx.astype(np.uint64), 202) * n_nodes).astype(np.int64)
    closed = _unif(idx.astype(np.uint64), 203) < 0.15
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(ln, out=offsets[1:])
    flat = np.empty(offsets[-1], dtype=np.int64)
    for i in range(n):
        l = ln[i]
        walk = (start[i] + np.arange(l)) % n_nodes
        refs = walk * 2 + 1
        if closed[i] and l >= 3:
            refs[-1] = refs[0]
        flat[offsets[i] : offsets[i + 1]] = refs
    keys, vals = _tags_arrays(211, idx, 0.8)
    return pa.table(
        {
            "id": pa.array(wid, pa.int64()),
            "version": pa.array(np.ones(n, np.int32), pa.int32()),
            "refs": pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), pa.array(flat, pa.int64())),
            "tags": _map_array(keys, vals),
        }
    )


RING_WAY_BASE = 1_000_000_000  # id space for synthetic ring-member ways

_MEMBER_T = pa.struct([("mtype", pa.int8()), ("ref", pa.int64()), ("role", pa.string())])


def _ring_points(seed: int, clat: float, clon: float, r_deg: float, nv: int):
    """Closed ring (first point repeated last) around (clat, clon)."""
    t = np.arange(nv) * (2 * np.pi / nv)
    wob = 0.2 * r_deg * np.sin(3 * t + (seed % 7))
    lat = clat + (r_deg + wob) * np.sin(t)
    lon = clon + (r_deg + wob) * np.cos(t)
    lat = np.append(lat, lat[0])
    lon = np.append(lon, lon[0])
    return np.round(lat * 1e7).astype(np.int32), np.round(lon * 1e7).astype(np.int32)


def gen_relations(n: int) -> tuple[pa.Table, pa.Table]:
    """Relations + the dedicated ring-member ways they reference.

    Multipolygon relations (~ first 60% of rows) get an outer ring split
    into 2-4 arc ways plus 0-2 inner rings; 2% carry a dangling member ref.
    Ring ways store their geometry inline via a parallel ways table whose
    refs are synthetic node ids; their positions are emitted as extra
    nodes... simplified: ring ways are returned as a ways-shaped table with
    `pts` baked into companion node rows NOT needed — instead we return a
    `ring_ways` table with explicit lat/lon point lists (schema:
    id, pts: list<struct<lat,lon>>), which the multipolygon stage consumes
    directly (it needs resolved ways anyway).
    """
    members_type = pa.list_(_MEMBER_T)
    rel_ids, rel_members, rel_tag_keys, rel_tag_vals = [], [], [], []
    rw_ids: list[int] = []
    rw_pts: list[list[tuple[int, int]]] = []
    next_way = RING_WAY_BASE
    for i in range(n):
        rid = i * 2 + 3
        h = int(splitmix64(np.uint64(i) ^ _U(0xBEEF)))
        is_mp = i < int(0.6 * n) or n < 4
        members = []
        if is_mp:
            hotspot = HOTSPOTS[h % len(HOTSPOTS)]
            clat = float(hotspot[0]) + ((h >> 8) % 100) / 50.0 - 1.0
            clon = float(hotspot[1]) + ((h >> 16) % 100) / 50.0 - 1.0
            r = 0.05 + ((h >> 24) % 20) / 200.0
            nv = 12 + (h % 12)
            lat, lon = _ring_points(h, clat, clon, r, nv)
            n_arcs = 2 + (h >> 3) % 3  # 2..4 arc ways for the outer ring
            cuts = np.linspace(0, len(lat) - 1, n_arcs + 1).astype(int)
            for a in range(n_arcs):
                pts = list(zip(lat[cuts[a] : cuts[a + 1] + 1].tolist(), lon[cuts[a] : cuts[a + 1] + 1].tolist()))
                rw_ids.append(next_way)
                rw_pts.append(pts)
                members.append({"mtype": 1, "ref": next_way, "role": "outer"})
                next_way += 1
            n_inner = (h >> 5) % 3  # 0..2 holes
            for k in range(n_inner):
                ilat, ilon = _ring_points(h + k + 1, clat, clon, r * 0.3, 8)
                off = r * 0.4 * (k - 0.5)
                ilat = (ilat + np.int32(round(off * 1e7))).astype(np.int32)
                rw_ids.append(next_way)
                rw_pts.append(list(zip(ilat.tolist(), ilon.tolist())))
                members.append({"mtype": 1, "ref": next_way, "role": "inner"})
                next_way += 1
            if h % 50 == 0:  # 2% dangling ref
                members.append({"mtype": 1, "ref": 999_999_999_999, "role": "outer"})
            rel_tag_keys.append(["type", "name"])
            rel_tag_vals.append(["multipolygon", f"mp_{rid}"])
        else:
            members.append({"mtype": 0, "ref": (h % 1000) * 2 + 1, "role": "stop"})
            members.append({"mtype": 1, "ref": (h % 500) * 2 + 2, "role": "route"})
            rel_tag_keys.append(["type"])
            rel_tag_vals.append(["route"])
        rel_ids.append(rid)
        rel_members.append(members)

    relations = pa.table(
        {
            "id": pa.array(rel_ids, pa.int64()),
            "version": pa.array(np.ones(n, np.int32), pa.int32()),
            "members": pa.array(rel_members, members_type),
            "tags": _map_array(rel_tag_keys, rel_tag_vals),
        }
    )
    pt_t = pa.struct([("lat", pa.int32()), ("lon", pa.int32())])
    ring_ways = pa.table(
        {
            "id": pa.array(rw_ids, pa.int64()),
            "pts": pa.array(
                [[{"lat": la, "lon": lo} for la, lo in pts] for pts in rw_pts], pa.list_(pt_t)
            ),
        }
    )
    return relations, ring_ways


UPDATE_WORLD_NODE_BASE = 1_000_000


def gen_update_world(n_rel: int = 10, node_base: int = UPDATE_WORLD_NODE_BASE):
    """Mini OSM world for the continuous-update family: gen_relations'
    inline-pts ring ways exploded into REAL nodes + ref-ways so the full
    resolve chain runs. Returns plain-Python row lists

        nodes: (id, version, lat, lon, tags)
        ways:  (id, version, refs, tags)
        rels:  (id, version, members[(mtype, ref, role)], tags)

    shared verbatim by the pytest, the driver query AND the golden twin —
    the INPUT is shared, the diff-apply computation is implemented
    independently on each side."""
    relations_t, ring_ways_t = gen_relations(n_rel)
    nodes, ways = [], []
    nid = node_base
    for rw in ring_ways_t.to_pylist():
        refs = []
        for p in rw["pts"]:
            nodes.append((nid, 1, p["lat"], p["lon"], {}))
            refs.append(nid)
            nid += 1
        ways.append((rw["id"], 1, refs, {}))
    rels = [
        (r["id"], r["version"], [tuple(m.values()) for m in r["members"]], dict(r["tags"]))
        for r in relations_t.to_pylist()
    ]
    return nodes, ways, rels


def gen_update_diffs(nodes, ways, rels, node_base: int = UPDATE_WORLD_NODE_BASE):
    """Two COMPOSED diff batches over gen_update_world (rows in
    update_stream.DIFF_SCHEMA order: kind, action, id, version, lat, lon,
    refs, members, tags). Batch 1: move a ring vertex (way + relation must
    re-chunk), add a brand-new node and a way referencing it. Batch 2
    depends on batch-1 state: moves the SAME node again, deletes a member
    way and a whole relation."""
    ws = sorted(ways)
    first_way, second_way = ws[0], ws[1]
    move_node = first_way[2][1]
    mrow = next(n for n in nodes if n[0] == move_node)
    new_node, new_way = node_base + 900_000, 777_777
    batch1 = [
        (0, "upsert", move_node, 2, mrow[2] + 40_000, mrow[3] + 40_000, None, None, None),
        (0, "upsert", new_node, 1, mrow[2], mrow[3] - 200_000, None, None, None),
        (1, "upsert", new_way, 1, None, None,
         [first_way[2][0], new_node], None, {"highway": "path"}),
    ]
    batch2 = [
        (0, "upsert", move_node, 3, mrow[2] + 80_000, mrow[3] + 80_000, None, None, None),
        (1, "delete", second_way[0], 2, None, None, None, None, None),
        (2, "delete", min(r[0] for r in rels), 2, None, None, None, None, None),
    ]
    return batch1, batch2


# --------------------------------------------------------------------------
# admin polygons + coastline (FIXTURES.md §3)
# --------------------------------------------------------------------------


def gen_admin_polygons(n: int = 50) -> pa.Table:
    pt_t = pa.struct([("lat", pa.int32()), ("lon", pa.int32())])
    ids, names, levels, outers, inners_all = [], [], [], [], []
    for i in range(n):
        h = int(splitmix64(np.uint64(i) ^ _U(0xADF1)))
        hotspot = HOTSPOTS[i % len(HOTSPOTS)]
        # concentric/offset rings over the hotspots so PIP joins hit them
        clat = float(hotspot[0]) + ((h >> 4) % 40) / 20.0 - 1.0
        clon = float(hotspot[1]) + ((h >> 10) % 40) / 20.0 - 1.0
        r = 0.3 + (i // len(HOTSPOTS)) * 0.35
        nv = 8 + (h % 10)
        lat, lon = _ring_points(h, clat, clon, r, nv)
        outer = [{"lat": int(a), "lon": int(b)} for a, b in zip(lat[:-1], lon[:-1])]
        inner_list = []
        if h % 3 == 0:  # every third polygon has a hole
            ilat, ilon = _ring_points(h + 9, clat, clon, r * 0.25, 6)
            inner_list.append([{"lat": int(a), "lon": int(b)} for a, b in zip(ilat[:-1], ilon[:-1])])
        ids.append(i + 1)
        names.append(f"admin_{i + 1}")
        levels.append(2 + i % 3)
        outers.append(outer)
        inners_all.append(inner_list)
    return pa.table(
        {
            "poly_id": pa.array(ids, pa.int64()),
            "name": pa.array(names, pa.string()),
            "level": pa.array(levels, pa.int32()),
            "outer": pa.array(outers, pa.list_(pt_t)),
            "inners": pa.array(inners_all, pa.list_(pa.list_(pt_t))),
        }
    )


def gen_coastline(n_segs: int = 20) -> pa.Table:
    """The synthetic coast ring (kernels.phash.COAST_*) split into n_segs
    polylines; consecutive segments share endpoints, together closing the
    ring."""
    pt_t = pa.struct([("lat", pa.int32()), ("lon", pa.int32())])
    m = len(COAST_LAT)
    cuts = np.linspace(0, m, n_segs + 1).astype(int)
    ids, ptss = [], []
    lat_i = np.round(np.append(COAST_LAT, COAST_LAT[0]) * 1e7).astype(np.int32)
    lon_i = np.round(np.append(COAST_LON, COAST_LON[0]) * 1e7).astype(np.int32)
    for s in range(n_segs):
        lo, hi = cuts[s], cuts[s + 1]
        pts = [{"lat": int(a), "lon": int(b)} for a, b in zip(lat_i[lo : hi + 1], lon_i[lo : hi + 1])]
        ids.append(s + 1)
        ptss.append(pts)
    return pa.table({"seg_id": pa.array(ids, pa.int64()), "pts": pa.array(ptss, pa.list_(pt_t))})


# --------------------------------------------------------------------------


def write_fixtures(out_dir: str, sf: float = 0.01, with_bytes: bool = True) -> dict[str, str]:
    """Materialize all fixture tables as parquet under out_dir. Row counts
    scale per FIXTURES.md (values quoted there are for sf=0.01)."""
    os.makedirs(out_dir, exist_ok=True)
    n_img = max(60, int(5_000_000 * sf))
    n_nodes = max(500, int(20_000_000 * sf))
    n_ways = max(50, int(2_000_000 * sf))
    n_rel = max(20, int(100_000 * sf))
    paths = {}

    relations, ring_ways = gen_relations(n_rel)
    tables = {
        "images": gen_images(n_img, with_bytes=with_bytes),
        "nodes": gen_nodes(n_nodes),
        "ways": gen_ways(n_ways, n_nodes),
        "relations": relations,
        "ring_ways": ring_ways,
        "admin_polygons": gen_admin_polygons(50),
        "coastline": gen_coastline(20),
    }
    for name, tbl in tables.items():
        p = os.path.join(out_dir, f"{name}.parquet")
        pq.write_table(tbl, p)
        paths[name] = p
    return paths
