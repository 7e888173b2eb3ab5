"""Real `.osm.pbf` front door (SURVEY.md §2.1 S1 / §3 E1; VERDICT r4 ask
  #1). REF? src/osm/osmParser* [M] — mount empty; format is the PUBLIC OSM
PBF spec (fileformat.proto / osmformat.proto).

This is the protobuf wire-format sibling of sources/cpbf.py: same entity
schemas, same vectorized varint kernels, but the actual OSM interchange
format — so a user can point the engine at a real extract.

Layout (public spec):

    file := ( u32be hdr_len, BlobHeader, Blob )*
    BlobHeader := { type:string f1, datasize:int32 f3 }   "OSMHeader"|"OSMData"
    Blob       := { raw:bytes f1 | zlib_data:bytes f3, raw_size:int32 f2 }
    OSMData blob inflates to a PrimitiveBlock:
      { stringtable f1 { s:bytes f1* }, primitivegroup f2*,
        granularity f17 (=100), date_granularity f18,
        lat_offset f19, lon_offset f20 }
    PrimitiveGroup := { nodes f1*, dense f2, ways f3*, relations f4* }
    DenseNodes := { id f1 packed sint64 Δ, denseinfo f5 {version f1 packed},
                    lat f8 packed sint64 Δ, lon f9 packed sint64 Δ,
                    keys_vals f10 packed int32 (0-delimited per node) }
    Way  := { id f1, keys f2 packed, vals f3 packed, info f4 {version f1},
              refs f8 packed sint64 Δ }
    Relation := { id f1, keys f2, vals f3, info f4, roles_sid f8 packed,
                  memids f9 packed sint64 Δ, types f10 packed }

Coordinates: degrees = 1e-9 * (offset + granularity * raw). The engine's
node tables store int32 units of 1e-7 deg, so with the default
granularity=100 / offset=0 the raw values ARE the engine values — exact
roundtrip. Non-multiple-of-100 granularities floor-divide to 1e-7 units
(documented lossy; no mainstream writer uses them).

Scale posture — THE reason this module exists as more than a parser: a
planet file is one ~80 GB file, and `binaryFile` would hand it to ONE
task. Instead the reader scans the blob INDEX (one u32be + ~32-byte
BlobHeader per blob — metadata-only, O(#blobs) seeks, no payload read),
distributes (path, offset, size) rows across the cluster, and each task
seeks+reads+inflates ONLY its own blobs: blob-level parallelism inside a
single file, the same unit PBF was designed around. Requires the file
visible to executors (shared FS / object store), as any Spark source does.
Inside a task, packed id/lat/lon/ref payloads decode through
kernels/varint.py's one-pass vectorized LEB128 (per-way field walks are
offset bookkeeping only; byte-proportional work stays in numpy).
"""

from __future__ import annotations

import os
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pyarrow as pa

from coords_spark.kernels import proto as P
from coords_spark.kernels import varint as V
from coords_spark.sources.cpbf import (
    KIND_NODES,
    KIND_RELATIONS,
    KIND_WAYS,
    NODE_SCHEMA,
    REL_SCHEMA,
    WAY_SCHEMA,
    _block_to_batch,
    _schema_for,
    _seg_deltas,
    _string_table,
    _tags_of,
)

# member types in the spec enum: NODE=0, WAY=1, RELATION=2 — identical to
# cpbf's mtype encoding, so the schemas carry over unchanged.


# ---------------------------------------------------------------------------
# writer (driver/fixture side — emits spec-valid .osm.pbf)
# ---------------------------------------------------------------------------


def _blob(type_: str, payload: bytes, compress: bool = True) -> bytes:
    body = P.enc_field_varint(2, len(payload)) + P.enc_field_len(
        3, zlib.compress(payload, 6)
    ) if compress else P.enc_field_len(1, payload)
    hdr = P.enc_field_len(1, type_.encode()) + P.enc_field_varint(3, len(body))
    return struct.pack(">I", len(hdr)) + hdr + body


def _header_block(bbox_nano: tuple[int, int, int, int] | None = None) -> bytes:
    feats = b"".join(
        P.enc_field_len(4, f) for f in (b"OsmSchema-V0.6", b"DenseNodes")
    )
    bb = b""
    if bbox_nano is not None:
        left, right, top, bottom = bbox_nano
        bb = P.enc_field_len(
            1,
            P.enc_field_sint64(1, left)
            + P.enc_field_sint64(2, right)
            + P.enc_field_sint64(3, top)
            + P.enc_field_sint64(4, bottom),
        )
    return bb + feats + P.enc_field_len(16, b"coords_spark")


def _stringtable(strings: list[bytes]) -> bytes:
    # index 0 is reserved/"" per spec (keys_vals uses 0 as delimiter)
    return b"".join(P.enc_field_len(1, s) for s in [b""] + strings)


def _keys_vals_stream(ntags: np.ndarray, kidx: np.ndarray, iidx: np.ndarray) -> np.ndarray:
    """Interleaved per-node [k, v, ..., 0] stream (empty if no tags at all)."""
    if int(ntags.sum()) == 0:
        return np.empty(0, dtype=np.int64)
    n = ntags.size
    out_lens = 2 * ntags + 1
    out = np.zeros(int(out_lens.sum()), dtype=np.int64)
    # start offset of each node's segment in the output
    starts = np.concatenate(([0], np.cumsum(out_lens)[:-1]))
    # positions of the k/v entries: for node j, tag t -> starts[j] + 2t (+1)
    tag_node = np.repeat(np.arange(n), ntags)
    within = np.arange(int(ntags.sum())) - np.repeat(
        np.concatenate(([0], np.cumsum(ntags)[:-1])), ntags
    )
    base = starts[tag_node] + 2 * within
    out[base] = kidx
    out[base + 1] = iidx
    return out


def _dense_group(tbl: pa.Table, lo: int, hi: int) -> bytes:
    ids = tbl.column("id").to_numpy(zero_copy_only=False)[lo:hi].astype(np.int64)
    lat = tbl.column("lat").to_numpy(zero_copy_only=False)[lo:hi].astype(np.int64)
    lon = tbl.column("lon").to_numpy(zero_copy_only=False)[lo:hi].astype(np.int64)
    ver = tbl.column("version").to_numpy(zero_copy_only=False)[lo:hi].astype(np.int64)
    ntags, keys, items = _tags_of(tbl, lo, hi)
    strings, (kidx, iidx) = _string_table([keys, items])
    kv = _keys_vals_stream(ntags, kidx + 1, iidx + 1)  # +1: slot 0 reserved
    dense = (
        P.enc_packed_sint64(1, V.delta_encode(ids))
        + P.enc_field_len(5, P.enc_packed_uvarints(1, ver.astype(np.uint64)))
        + P.enc_packed_sint64(8, V.delta_encode(lat))
        + P.enc_packed_sint64(9, V.delta_encode(lon))
        + P.enc_packed_uvarints(10, kv.astype(np.uint64))
    )
    return (
        P.enc_field_len(1, _stringtable(strings))
        + P.enc_field_len(2, P.enc_field_len(2, dense))
        + P.enc_field_varint(17, 100)
    )


def _way_messages(tbl: pa.Table, lo: int, hi: int) -> bytes:
    n = hi - lo
    ids = tbl.column("id").to_numpy(zero_copy_only=False)[lo:hi].astype(np.int64)
    ver = tbl.column("version").to_numpy(zero_copy_only=False)[lo:hi].astype(np.int64)
    ntags, keys, items = _tags_of(tbl, lo, hi)
    strings, (kidx, iidx) = _string_table([keys, items])
    col = tbl.column("refs").combine_chunks().slice(lo, n)
    off = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = col.values.to_numpy(zero_copy_only=False).astype(np.int64)[off[0] : off[-1]]
    off = off - off[0]
    toff = np.concatenate(([0], np.cumsum(ntags)))
    msgs = []
    for i in range(n):
        k = (kidx[toff[i] : toff[i + 1]] + 1).astype(np.uint64)
        v = (iidx[toff[i] : toff[i + 1]] + 1).astype(np.uint64)
        refs = flat[off[i] : off[i + 1]]
        way = (
            P.enc_field_varint(1, int(ids[i]))
            + P.enc_packed_uvarints(2, k)
            + P.enc_packed_uvarints(3, v)
            + P.enc_field_len(4, P.enc_field_varint(1, int(ver[i])))
            + P.enc_packed_sint64(8, V.delta_encode(refs))
        )
        msgs.append(P.enc_field_len(3, way))
    return (
        P.enc_field_len(1, _stringtable(strings))
        + P.enc_field_len(2, b"".join(msgs))
        + P.enc_field_varint(17, 100)
    )


def _relation_messages(tbl: pa.Table, lo: int, hi: int) -> bytes:
    n = hi - lo
    ids = tbl.column("id").to_numpy(zero_copy_only=False)[lo:hi].astype(np.int64)
    ver = tbl.column("version").to_numpy(zero_copy_only=False)[lo:hi].astype(np.int64)
    ntags, keys, items = _tags_of(tbl, lo, hi)
    mcol = tbl.column("members").combine_chunks().slice(lo, n)
    moff = mcol.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    a0, b0 = int(moff[0]), int(moff[-1])
    mvals = mcol.values
    mtype = mvals.field("mtype").to_numpy(zero_copy_only=False).astype(np.int64)[a0:b0]
    mrefs = mvals.field("ref").to_numpy(zero_copy_only=False).astype(np.int64)[a0:b0]
    roles = np.asarray(mvals.field("role").slice(a0, b0 - a0).to_pylist(), dtype=object)
    moff = moff - a0
    strings, (kidx, iidx, ridx) = _string_table([keys, items, roles])
    toff = np.concatenate(([0], np.cumsum(ntags)))
    msgs = []
    for i in range(n):
        k = (kidx[toff[i] : toff[i + 1]] + 1).astype(np.uint64)
        v = (iidx[toff[i] : toff[i + 1]] + 1).astype(np.uint64)
        a, b = int(moff[i]), int(moff[i + 1])
        rel = (
            P.enc_field_varint(1, int(ids[i]))
            + P.enc_packed_uvarints(2, k)
            + P.enc_packed_uvarints(3, v)
            + P.enc_field_len(4, P.enc_field_varint(1, int(ver[i])))
            + P.enc_packed_uvarints(8, (ridx[a:b] + 1).astype(np.uint64))
            + P.enc_packed_sint64(9, V.delta_encode(mrefs[a:b]))
            + P.enc_packed_uvarints(10, mtype[a:b].astype(np.uint64))
        )
        msgs.append(P.enc_field_len(4, rel))
    return (
        P.enc_field_len(1, _stringtable(strings))
        + P.enc_field_len(2, b"".join(msgs))
        + P.enc_field_varint(17, 100)
    )


def write_osmpbf(
    path: str,
    nodes: pa.Table | None = None,
    ways: pa.Table | None = None,
    relations: pa.Table | None = None,
    rows_per_block: int = 8000,
) -> str:
    """Emit one spec-valid .osm.pbf: OSMHeader blob, then one OSMData blob
    per rows_per_block slice per entity kind (nodes as DenseNodes). The
    blob is the read-parallelism unit — a big table splits across the
    cluster even inside this single file."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(_blob("OSMHeader", _header_block()))
        for tbl, enc in (
            (nodes, _dense_group),
            (ways, _way_messages),
            (relations, _relation_messages),
        ):
            if tbl is None or tbl.num_rows == 0:
                continue
            for lo in range(0, tbl.num_rows, rows_per_block):
                hi = min(lo + rows_per_block, tbl.num_rows)
                f.write(_blob("OSMData", enc(tbl, lo, hi)))
    return path


# ---------------------------------------------------------------------------
# blob index + decode
# ---------------------------------------------------------------------------


def scan_blob_index(path: str) -> list[tuple[str, int, int]]:
    """[(blob_type, payload_offset, payload_size)] by reading ONLY the
    4-byte lengths + BlobHeaders (no blob payload I/O) — the planning scan
    that makes one giant file a many-task read."""
    out = []
    fsize = os.path.getsize(path)
    with open(path, "rb") as f:
        pos = 0
        while pos < fsize:
            raw = f.read(4)
            if len(raw) < 4:
                raise ValueError("truncated pbf: short header length")
            (hlen,) = struct.unpack(">I", raw)
            hdr = f.read(hlen)
            if len(hdr) < hlen:
                raise ValueError("truncated pbf: short BlobHeader")
            fd = P.fields_dict(hdr, 0, hlen)
            if 1 not in fd or 3 not in fd:
                raise ValueError("BlobHeader missing type/datasize")
            s, e = fd[1][0]
            btype = hdr[s:e].decode()
            dsize = fd[3][0]
            pos = pos + 4 + hlen
            if pos + dsize > fsize:
                raise ValueError("truncated pbf: blob overruns file")
            out.append((btype, pos, dsize))
            f.seek(dsize, os.SEEK_CUR)
            pos += dsize
    return out


def decode_blob(payload: bytes) -> bytes:
    fd = P.fields_dict(payload, 0, len(payload))
    if 3 in fd:
        s, e = fd[3][0]
        data = zlib.decompress(payload[s:e])
        if 2 in fd and fd[2][0] != len(data):
            raise ValueError("blob raw_size mismatch")
        return data
    if 1 in fd:
        s, e = fd[1][0]
        return payload[s:e]
    raise ValueError("blob has neither raw nor zlib_data (unsupported codec)")


def read_header_block(path: str) -> dict:
    """Parse the OSMHeader blob: features, writingprogram, bbox (nanodeg)."""
    for btype, off, size in scan_blob_index(path):
        if btype != "OSMHeader":
            continue
        with open(path, "rb") as f:
            f.seek(off)
            data = decode_blob(f.read(size))
        fd = P.fields_dict(data, 0, len(data))
        out: dict = {
            "required_features": [data[s:e].decode() for s, e in fd.get(4, [])],
            "optional_features": [data[s:e].decode() for s, e in fd.get(5, [])],
        }
        if 16 in fd:
            s, e = fd[16][0]
            out["writingprogram"] = data[s:e].decode()
        if 1 in fd:
            s, e = fd[1][0]
            bb = P.fields_dict(data, s, e)
            out["bbox_nano"] = tuple(
                int(P.zigzag64(np.asarray([bb[i][0]], dtype=np.uint64))[0])
                for i in (1, 2, 3, 4)
            )
        return out
    raise ValueError("no OSMHeader blob found")


def _decode_stringtable(data: bytes, span) -> np.ndarray:
    s, e = span
    spans = [v for fno, _wt, v in P.walk_fields(data, s, e) if fno == 1]
    return np.asarray([data[a:b].decode() for a, b in spans], dtype=object)


def _packed_or_empty(data, fd, fno) -> np.ndarray:
    """All occurrences of a packed field, concatenated in byte order —
    spec-legal writers may split one logical packed field across several
    length-delimited occurrences."""
    if fno not in fd:
        return np.empty(0, dtype=np.uint64)
    spans = fd[fno]
    if len(spans) == 1:
        return P.packed_uvarints(data, spans[0])
    return np.concatenate([P.packed_uvarints(data, sp) for sp in spans])


def _coord_i32(raw: np.ndarray, offset: int, granularity: int) -> np.ndarray:
    nano = offset + granularity * raw.astype(np.int64)
    return (nano // 100).astype(np.int32)


def _tags_from_kv(n: int, kv: np.ndarray, table: np.ndarray):
    """DenseNodes keys_vals (0-delimited) -> (ntags, flat keys, flat vals)."""
    if kv.size == 0:
        z = np.zeros(n, dtype=np.int64)
        e = np.empty(0, dtype=object)
        return z, e, e
    zpos = np.nonzero(kv == 0)[0]
    if zpos.size != n:
        raise ValueError(f"keys_vals has {zpos.size} delimiters for {n} nodes")
    lens = np.diff(np.concatenate(([-1], zpos))) - 1
    if (lens % 2).any():
        raise ValueError("odd keys_vals segment")
    nz = kv[kv != 0]
    return lens // 2, table[nz[0::2]], table[nz[1::2]]


def _map_from_flat(ntags: np.ndarray, keys: np.ndarray, vals: np.ndarray) -> pa.MapArray:
    toff = np.zeros(ntags.size + 1, dtype=np.int32)
    np.cumsum(ntags, out=toff[1:])
    return pa.MapArray.from_arrays(
        pa.array(toff, pa.int32()),
        pa.array(keys, pa.string()),
        pa.array(vals, pa.string()),
    )


def _decode_dense(data, span, table, gran, lat_off, lon_off) -> dict:
    s, e = span
    fd = P.fields_dict(data, s, e)
    ids = V.delta_decode(P.zigzag64(_packed_or_empty(data, fd, 1)))
    n = ids.size
    lat = V.delta_decode(P.zigzag64(_packed_or_empty(data, fd, 8)))
    lon = V.delta_decode(P.zigzag64(_packed_or_empty(data, fd, 9)))
    ver = np.full(n, -1, dtype=np.int64)
    if 5 in fd:
        di = P.fields_dict(data, *fd[5][0])
        v = _packed_or_empty(data, di, 1)
        if v.size:
            ver = v.astype(np.int64)
    ntags, keys, vals = _tags_from_kv(n, _packed_or_empty(data, fd, 10).astype(np.int64), table)
    return {
        "id": ids,
        "version": ver.astype(np.int32),
        "lat": _coord_i32(lat, lat_off, gran),
        "lon": _coord_i32(lon, lon_off, gran),
        "tags": _map_from_flat(ntags, keys, vals),
    }


def _decode_plain_nodes(data, spans, table, gran, lat_off, lon_off) -> dict:
    """Non-dense Node messages (rare in the wild, spec-legal)."""
    n = len(spans)
    ids = np.empty(n, dtype=np.int64)
    lat = np.empty(n, dtype=np.int64)
    lon = np.empty(n, dtype=np.int64)
    ver = np.full(n, -1, dtype=np.int64)
    ntags = np.zeros(n, dtype=np.int64)
    keys_l, vals_l = [], []
    for i, (s, e) in enumerate(spans):
        fd = P.fields_dict(data, s, e)
        ids[i] = P.zigzag64(np.asarray([fd[1][0]], dtype=np.uint64))[0]
        lat[i] = P.zigzag64(np.asarray([fd[8][0]], dtype=np.uint64))[0]
        lon[i] = P.zigzag64(np.asarray([fd[9][0]], dtype=np.uint64))[0]
        if 4 in fd:
            info = P.fields_dict(data, *fd[4][0])
            if 1 in info:
                ver[i] = info[1][0]
        k = _packed_or_empty(data, fd, 2).astype(np.int64)
        v = _packed_or_empty(data, fd, 3).astype(np.int64)
        ntags[i] = k.size
        keys_l.append(table[k])
        vals_l.append(table[v])
    keys = np.concatenate(keys_l) if keys_l else np.empty(0, dtype=object)
    vals = np.concatenate(vals_l) if vals_l else np.empty(0, dtype=object)
    return {
        "id": ids,
        "version": ver.astype(np.int32),
        "lat": _coord_i32(lat, lat_off, gran),
        "lon": _coord_i32(lon, lon_off, gran),
        "tags": _map_from_flat(ntags, keys, vals),
    }


def _walk_messages_vec(data, spans, want, val=None, vlen=None, defaults=None):
    """Vectorized LOCKSTEP walk of N same-type embedded messages: one
    iteration per field SLOT (a Way has ~6), each iteration an array
    operation over every still-active message — no per-message Python.
    Built on proto.precompute_varints (value+length of the varint at every
    byte, one pass per block).

    want: {field_no: 'varint' | 'len' | 'lenm' | 'packed'}. Returns
    (varint values per field [uint64, 0 where absent],
     span (starts, ends) per field [(0,0) where absent],
     occurrence tuples per field [(msg_idx, starts, ends) arrays]).
    Singular scalar fields ('varint') keep the LAST occurrence — proto3
    semantics. 'len' keeps the last span only (use for fields where
    last-wins is acceptable); 'lenm' collects EVERY occurrence into the
    third return slot — the spec says split occurrences of a singular
    EMBEDDED MESSAGE must be MERGED, so message-typed fields (e.g. Info)
    use 'lenm' and the consumer merges field-wise across occurrences
    (_versions_from_info; ADVICE r6). 'packed' fields also collect every
    occurrence: spec-legal writers may split one logical packed field
    across several length-delimited occurrences, and the decoder must
    concatenate them (_bulk_packed does, in byte order). Corrupt lengths
    that push a cursor past its message end raise."""
    if val is None:
        val, vlen = P.precompute_varints(data)
    n = len(spans)
    cur = np.asarray([s for s, _ in spans], dtype=np.int64)
    end = np.asarray([e for _, e in spans], dtype=np.int64)
    defaults = defaults or {}
    out_varint = {
        f: np.full(n, defaults.get(f, 0), dtype=np.uint64)
        for f, t in want.items()
        if t == "varint"
    }
    out_span = {
        f: (np.zeros(n, dtype=np.int64), np.zeros(n, dtype=np.int64))
        for f, t in want.items()
        if t == "len"
    }
    out_packed: dict[int, list] = {
        f: [] for f, t in want.items() if t in ("packed", "lenm")
    }
    while True:
        active = np.nonzero(cur < end)[0]
        if active.size == 0:
            break
        p = cur[active]
        key = val[p]
        klen = vlen[p]
        fno = (key >> np.uint64(3)).astype(np.int64)
        wt = (key & np.uint64(7)).astype(np.int64)
        p2 = p + klen
        adv = np.zeros(active.size, dtype=np.int64)
        m0 = wt == P.WT_VARINT
        m2 = wt == P.WT_LEN
        if m0.any():
            adv[m0] = klen[m0] + vlen[p2[m0]]
        if m2.any():
            adv[m2] = klen[m2] + vlen[p2[m2]] + val[p2[m2]].astype(np.int64)
        m1 = wt == P.WT_FIXED64
        m5 = wt == P.WT_FIXED32
        adv[m1] = klen[m1] + 8
        adv[m5] = klen[m5] + 4
        if (~(m0 | m1 | m2 | m5)).any():
            raise ValueError("unsupported wire type in message")
        for f, t in want.items():
            if t == "varint":
                sel = (fno == f) & m0
                if sel.any():
                    out_varint[f][active[sel]] = val[p2[sel]]
            else:
                sel = (fno == f) & m2
                if sel.any():
                    ps = p2[sel] + vlen[p2[sel]]
                    pe = ps + val[p2[sel]].astype(np.int64)
                    if t in ("packed", "lenm"):
                        out_packed[f].append((active[sel].copy(), ps, pe))
                    else:
                        starts, ends_ = out_span[f]
                        starts[active[sel]] = ps
                        ends_[active[sel]] = pe
        cur[active] = p + adv
        if (cur[active] > end[active]).any():
            raise ValueError("message field overruns span")
    packed = {}
    for f, chunks in out_packed.items():
        if chunks:
            packed[f] = tuple(np.concatenate(a) for a in zip(*chunks))
        else:
            z = np.empty(0, dtype=np.int64)
            packed[f] = (z, z, z)
    return out_varint, out_span, packed


def _versions_from_info(data, info_occ, n, val, vlen) -> np.ndarray:
    """version (int64, -1 where absent) from Info OCCURRENCE arrays
    ((msg_idx, starts, ends) — the 'lenm' walk output): a second lockstep
    walk over every occurrence span, then a field-wise MERGE per message.
    A spec-legal writer may split one Info message across several
    length-delimited occurrences; embedded-message merge semantics say
    later occurrences override field-by-field, so the LAST occurrence that
    CARRIES a version wins and earlier-only fields survive (ADVICE r6 —
    plain last-occurrence-wins would lose a version set only in the first
    span)."""
    midx, starts, ends = info_occ
    ver = np.full(n, -1, dtype=np.int64)
    if midx.size == 0:
        return ver
    if midx.size > 1:
        order = np.lexsort((starts, midx))
        midx, starts, ends = midx[order], starts[order], ends[order]
    vi, _si, _pk = _walk_messages_vec(
        data,
        list(zip(starts.tolist(), ends.tolist())),
        {1: "varint"},
        val=val,
        vlen=vlen,
        defaults={1: np.uint64(0xFFFFFFFFFFFFFFFF)},  # absent version -> -1
    )
    vocc = vi[1].astype(np.int64)
    present = vocc != -1
    if present.any():
        m, v = midx[present], vocc[present]
        # occurrences are (msg, byte-order) sorted: reversing + unique's
        # first-index gives the LAST present occurrence per message
        um, first_rev = np.unique(m[::-1], return_index=True)
        ver[um] = v[::-1][first_rev]
    return ver


def _bulk_packed(data, occ, n, terms_cumsum):
    """Bulk-decode ONE packed field across MANY messages: concatenate the
    field spans, one vectorized varint pass, per-message counts from the
    terminator prefix sum. `occ` is (msg_idx, starts, ends) occurrence
    arrays from _walk_messages_vec's 'packed' output — a message may own
    SEVERAL occurrences (spec-legal split packed fields); they are sorted
    to (message, byte-order) so values group contiguously per message and
    concatenate, and per-message counts sum across occurrences.
    Returns (values u64, counts per message [len n])."""
    midx, starts, ends = occ
    counts = np.zeros(n, dtype=np.int64)
    if midx.size == 0:
        return np.empty(0, dtype=np.uint64), counts
    if midx.size > 1 and not (midx[:-1] < midx[1:]).all():
        order = np.lexsort((starts, midx))
        midx, starts, ends = midx[order], starts[order], ends[order]
    occ_counts = P.count_varints_per_span(terms_cumsum, starts, ends)
    np.add.at(counts, midx, occ_counts)
    vals = (
        V.decode_uvarints(P.concat_spans(data, starts, ends))
        if (ends - starts).sum()
        else np.empty(0, dtype=np.uint64)
    )
    return vals, counts


def _decode_ways(data, spans, table, val=None, vlen=None) -> dict:
    """Vectorized Way decode: ONE lockstep field walk over every Way of
    the block (no per-message Python), then the packed refs/keys/vals
    bulk-decode. Correctness is pinned by the write/read roundtrip tests
    (byte-identical tables through the spec-valid writer) in
    tests/test_osmpbf.py."""
    n = len(spans)
    if val is None:
        val, vlen = P.precompute_varints(data)
    vints, spans_out, packed = _walk_messages_vec(
        data, spans,
        {1: "varint", 2: "packed", 3: "packed", 4: "lenm", 8: "packed"},
        val=val, vlen=vlen,
    )
    ids = vints[1].astype(np.int64)
    ver = _versions_from_info(data, packed[4], n, val, vlen)
    arr = np.frombuffer(data, dtype=np.uint8)
    tc = np.cumsum(arr < 0x80)
    kidx, nk = _bulk_packed(data, packed[2], n, tc)
    vidx, nv = _bulk_packed(data, packed[3], n, tc)
    if not (nk == nv).all():
        raise ValueError("way keys/vals length mismatch")
    rdel, nrefs = _bulk_packed(data, packed[8], n, tc)
    seg_starts = np.zeros(n, dtype=np.int64)
    np.cumsum(nrefs[:-1], out=seg_starts[1:])
    flat = V.segmented_delta_decode(P.zigzag64(rdel), seg_starts, nrefs)
    off = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(nrefs, out=off[1:])
    return {
        "id": ids,
        "version": ver.astype(np.int32),
        "refs": pa.ListArray.from_arrays(pa.array(off, pa.int32()), pa.array(flat, pa.int64())),
        "tags": _map_from_flat(nk, table[kidx.astype(np.int64)], table[vidx.astype(np.int64)]),
    }


def _decode_relations(data, spans, table, val=None, vlen=None) -> dict:
    """Vectorized Relation decode — same lockstep walk as _decode_ways."""
    if val is None:
        val, vlen = P.precompute_varints(data)
    vints, spans_out, packed = _walk_messages_vec(
        data, spans,
        {1: "varint", 2: "packed", 3: "packed", 4: "lenm",
         8: "packed", 9: "packed", 10: "packed"},
        val=val, vlen=vlen,
    )
    n = len(spans)
    ids = vints[1].astype(np.int64)
    ver = _versions_from_info(data, packed[4], n, val, vlen)
    arr = np.frombuffer(data, dtype=np.uint8)
    tc = np.cumsum(arr < 0x80)
    kidx, nk = _bulk_packed(data, packed[2], n, tc)
    vidx, nv = _bulk_packed(data, packed[3], n, tc)
    ridx, nroles = _bulk_packed(data, packed[8], n, tc)
    mdel, nmem = _bulk_packed(data, packed[9], n, tc)
    mty, nty = _bulk_packed(data, packed[10], n, tc)
    if not ((nk == nv).all() and (nroles == nmem).all() and (nmem == nty).all()):
        raise ValueError("relation parallel-array length mismatch")
    seg_starts = np.zeros(n, dtype=np.int64)
    np.cumsum(nmem[:-1], out=seg_starts[1:])
    refs = V.segmented_delta_decode(P.zigzag64(mdel), seg_starts, nmem)
    off = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(nmem, out=off[1:])
    members = pa.StructArray.from_arrays(
        [
            pa.array(mty.astype(np.int8), pa.int8()),
            pa.array(refs, pa.int64()),
            pa.array(table[ridx.astype(np.int64)], pa.string()),
        ],
        names=["mtype", "ref", "role"],
    )
    return {
        "id": ids,
        "version": ver.astype(np.int32),
        "members": pa.ListArray.from_arrays(pa.array(off, pa.int32()), members),
        "tags": _map_from_flat(nk, table[kidx.astype(np.int64)], table[vidx.astype(np.int64)]),
    }


def _fields_dict_fast(data, val, vlen, lo: int, hi: int) -> dict[int, list]:
    """fields_dict over precomputed varint tables: O(1) array lookups per
    FIELD instead of per byte — this is what makes the group-level walk
    (one length-delimited field per Way message, thousands per block)
    cheap. Semantics identical to proto.fields_dict."""
    out: dict[int, list] = {}
    pos = lo
    while pos < hi:
        key = int(val[pos])
        klen = int(vlen[pos])
        fno, wt = key >> 3, key & 7
        p2 = pos + klen
        if wt == P.WT_VARINT:
            v = int(val[p2])
            pos = p2 + int(vlen[p2])
        elif wt == P.WT_LEN:
            ln = int(val[p2])
            s = p2 + int(vlen[p2])
            v = (s, s + ln)
            pos = s + ln
        elif wt == P.WT_FIXED64:
            v = int.from_bytes(data[p2 : p2 + 8], "little")
            pos = p2 + 8
        elif wt == P.WT_FIXED32:
            v = int.from_bytes(data[p2 : p2 + 4], "little")
            pos = p2 + 4
        else:
            raise ValueError(f"unsupported wire type {wt} (field {fno})")
        out.setdefault(fno, []).append(v)
        if pos > hi:
            raise ValueError("message field overruns buffer")
    return out


def decode_primitive_block(data: bytes, kind: int) -> Iterator[pa.RecordBatch]:
    """Inflated PrimitiveBlock bytes -> record batches of `kind` entities
    (a block may mix kinds across groups; others are skipped cheaply —
    their payload spans are never varint-decoded). The varint tables are
    precomputed ONCE per block and shared by every walk below."""
    # LAZY varint tables: the dense-node path (the planet-dominant table)
    # never walks per-message fields and must not pay the O(10 x buflen)
    # precompute; way/relation blocks compute it once and share it
    tables: list = []

    def tabs():
        if not tables:
            tables.append(P.precompute_varints(data))
        return tables[0]

    fd = P.fields_dict(data, 0, len(data))  # few top-level fields: scalar
    table = _decode_stringtable(data, fd[1][0]) if 1 in fd else np.empty(0, dtype=object)
    gran = fd.get(17, [100])[0]
    lat_off = fd.get(19, [0])[0]
    lon_off = fd.get(20, [0])[0]
    for gspan in fd.get(2, []):
        if kind == KIND_NODES:
            g = P.fields_dict(data, *gspan)  # dense group: ~1 field
            if 2 in g:
                yield _block_to_batch(kind, _decode_dense(data, g[2][0], table, gran, lat_off, lon_off))
            if 1 in g:
                yield _block_to_batch(kind, _decode_plain_nodes(data, g[1], table, gran, lat_off, lon_off))
        elif kind == KIND_WAYS:
            val, vlen = tabs()
            g = _fields_dict_fast(data, val, vlen, *gspan)
            if 3 in g:
                yield _block_to_batch(kind, _decode_ways(data, g[3], table, val=val, vlen=vlen))
        elif kind == KIND_RELATIONS:
            val, vlen = tabs()
            g = _fields_dict_fast(data, val, vlen, *gspan)
            if 4 in g:
                yield _block_to_batch(kind, _decode_relations(data, g[4], table, val=val, vlen=vlen))


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------


def _list_pbf_files(path: str) -> list[str]:
    if os.path.isfile(path):
        return [path]
    out = []
    for root, _dirs, files in os.walk(path):
        out += [os.path.join(root, f) for f in files if f.endswith((".osm.pbf", ".pbf"))]
    return sorted(out)


def _blob_task_decoder(kind: int):
    def decode(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        handles: dict[str, object] = {}
        try:
            for rb in batches:
                paths = rb.column(0).to_pylist()
                offs = rb.column(1).to_pylist()
                sizes = rb.column(2).to_pylist()
                for path, off, size in zip(paths, offs, sizes):
                    f = handles.get(path)
                    if f is None:
                        f = handles[path] = open(path, "rb")
                    f.seek(off)
                    data = decode_blob(f.read(size))
                    yield from decode_primitive_block(data, kind)
        finally:
            for f in handles.values():
                f.close()

    return decode


def iter_blob_payloads(content: bytes) -> Iterator[tuple[str, bytes]]:
    """(blob_type, blob_payload) pairs from in-memory .osm.pbf bytes (the
    streaming path decodes whole dropped files per task)."""
    pos = 0
    total = len(content)
    while pos < total:
        if pos + 4 > total:
            raise ValueError("truncated pbf: short header length")
        (hlen,) = struct.unpack_from(">I", content, pos)
        hdr_end = pos + 4 + hlen
        if hdr_end > total:
            raise ValueError("truncated pbf: short BlobHeader")
        fd = P.fields_dict(content, pos + 4, hdr_end)
        s, e = fd[1][0]
        btype = content[s:e].decode()
        dsize = fd[3][0]
        if hdr_end + dsize > total:
            raise ValueError("truncated pbf: blob overruns file")
        yield btype, content[hdr_end : hdr_end + dsize]
        pos = hdr_end + dsize


def _content_decoder_for(kind: int):
    def decode(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for rb in batches:
            contents = rb.column(rb.schema.get_field_index("content"))
            for i in range(len(contents)):
                for btype, payload in iter_blob_payloads(contents[i].as_py()):
                    if btype != "OSMData":
                        continue
                    yield from decode_primitive_block(decode_blob(payload), kind)

    return decode


def read_osmpbf_stream(spark, path: str, kind: int):
    """Structured-Streaming variant: .osm.pbf files appearing under `path`
    decode incrementally (binaryFile file source tracks seen files in the
    checkpoint). Parallelism here is per-FILE (streaming drops are extract-
    sized); the batch reader's blob-level fan-out is the planet-scale
    path. Pair with streaming/ingest_stream.py for exactly-once ingest."""
    df = (
        spark.readStream.format("binaryFile")
        # streaming sources require an explicit schema; binaryFile's is fixed
        .schema("path string, modificationTime timestamp, length long, content binary")
        .option("pathGlobFilter", "*.pbf")
        .load(path)
        .select("content")
    )
    return df.mapInArrow(_content_decoder_for(kind), _schema_for(kind))


def read_osmpbf(
    spark,
    path: str,
    kind: int,
    parallelism: int | None = None,
    index_scan_spark_threshold: int = 64,
    index_scan_spark_bytes: int | None = None,
):
    """Entity DataFrame from real .osm.pbf file(s). Planning: a metadata-
    only blob-index scan per file (O(#blobs) tiny reads, like any source's
    split planning); execution: (path, offset, size) rows round-robined
    across `parallelism` tasks, each task seeking and decoding only its own
    blobs. One 80 GB planet file therefore becomes thousands of independent
    work units instead of binaryFile's single task.

    The index scan itself runs driver-side for a handful of files, but a
    directory of thousands of extracts would serialize thousands of
    metadata passes through the driver — above `index_scan_spark_threshold`
    files, OR when the files total more than `index_scan_spark_bytes`
    (default threshold × 64 MB — the blob count, and thus the driver seek
    count, scales with BYTES, so a directory of 100 multi-GB extracts must
    distribute even though its file COUNT is small; VERDICT r5 ask #8),
    the scan distributes as a Spark job (one task per file batch), keeping
    planning O(files/cluster) wall-clock. A SINGLE file always scans
    driver-side: its index is one sequential cursor, distribution can't
    split it."""
    files = _list_pbf_files(path)
    if index_scan_spark_bytes is None:
        index_scan_spark_bytes = index_scan_spark_threshold * (64 << 20)
    total_bytes = sum(os.path.getsize(f) for f in files)
    if (
        len(files) > index_scan_spark_threshold
        or total_bytes > index_scan_spark_bytes
    ) and len(files) > 1:
        index = [
            (p, off, size)
            for (p, off, size) in spark.createDataFrame(
                [(f,) for f in files], "path string"
            )
            .repartition(min(len(files), spark.sparkContext.defaultParallelism * 4))
            .rdd.flatMap(
                lambda r: [
                    (r["path"], off, size)
                    for btype, off, size in scan_blob_index(r["path"])
                    if btype == "OSMData"
                ]
            )
            .collect()
        ]
    else:
        index = [
            (p, off, size)
            for p in files
            for btype, off, size in scan_blob_index(p)
            if btype == "OSMData"
        ]
    par = parallelism or spark.sparkContext.defaultParallelism
    idx = spark.createDataFrame(index, "path string, off long, size long")
    # round-robin, not hash: blob sizes are uniform-ish by construction
    # (writers bound block entity counts), so count-balanced is byte-balanced
    idx = idx.repartition(min(par, max(1, len(index))))
    return idx.mapInArrow(_blob_task_decoder(kind), _schema_for(kind))
