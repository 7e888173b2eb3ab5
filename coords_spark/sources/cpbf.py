"""cpbf — a COORDS/PBF-shaped blocked binary entity format (SURVEY.md §2.1
S1, the reference's front door; REF? src/osm/osmParser* [M] — mount empty,
shape per SURVEY §0: varint + delta + per-block string table behind zlib).

Layout (stdlib + numpy only — no protobuf):

    file  := b"CPBF\\x01" block*
    block := u32le comp_len, zlib(body)
    body  := u8 kind (0=nodes, 1=ways), u32le count,
             u32le numstream_len, numstream, strdata

`numstream` is ONE contiguous LEB128 uvarint stream (kernels/varint.py
decodes it in a single vectorized pass), sliced by known counts:

    nodes: [n_strings][str_len x S][zz-delta id x n][zz-delta lat x n]
           [zz-delta lon x n][version x n][ntags x n][tag k,v idx x 2T]
    ways:  [n_strings][str_len x S][zz-delta id x n][version x n]
           [nrefs x n][zz per-way-delta refs x R][ntags x n][k,v idx x 2T]
    rels:  [n_strings][str_len x S][zz-delta id x n][version x n]
           [nmembers x n][mtype x M][zz per-rel-delta refs x M]
           [role idx x M][ntags x n][k,v idx x 2T]
    (member roles share the block string table with tag keys/values)

`strdata` is the block's string table, concatenated utf8 sliced by the
str_len entries. Every block is self-describing and independently
decodable — the parallelism unit, exactly like PBF blobs. The Spark reader
maps `binaryFile` rows through mapInArrow (one task per file; writers
bound file size via blocks_per_file so a large extract splits across the
cluster).
"""

from __future__ import annotations

import os
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pyarrow as pa

from coords_spark.kernels import varint as V

MAGIC = b"CPBF\x01"
KIND_NODES = 0
KIND_WAYS = 1
KIND_RELATIONS = 2

NODE_SCHEMA = "id long, version int, lat int, lon int, tags map<string,string>"
WAY_SCHEMA = "id long, version int, refs array<long>, tags map<string,string>"
REL_SCHEMA = (
    "id long, version int, "
    "members array<struct<mtype:tinyint,ref:bigint,role:string>>, "
    "tags map<string,string>"
)


# ---------------------------------------------------------------------------
# encode (driver/fixture side)
# ---------------------------------------------------------------------------


def _string_table(arrays: list[np.ndarray]) -> tuple[list[bytes], list[np.ndarray]]:
    """One block-level string table over every string column (tag keys, tag
    values, member roles) -> (table, one index array per input)."""
    total = sum(a.size for a in arrays)
    if total == 0:
        return [], [np.empty(0, dtype=np.int64) for _ in arrays]
    all_s = np.concatenate(arrays)
    uniq, inv = np.unique(all_s.astype(str), return_inverse=True)
    out = []
    pos = 0
    for a in arrays:
        out.append(inv[pos : pos + a.size].astype(np.int64))
        pos += a.size
    return [s.encode() for s in uniq.tolist()], out


def _tags_of(tbl: pa.Table, lo: int, hi: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(ntags per row, flat keys, flat items) for rows [lo, hi)."""
    col = tbl.column("tags").combine_chunks()
    sl = col.slice(lo, hi - lo)
    # a sliced MapArray's offsets stay ABSOLUTE into the full child arrays
    off = sl.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    ntags = off[1:] - off[:-1]
    a, b = int(off[0]), int(off[-1])
    keys = np.asarray(col.keys.slice(a, b - a).to_pylist(), dtype=object)
    items = np.asarray(col.items.slice(a, b - a).to_pylist(), dtype=object)
    return ntags, keys, items


def _seg_deltas(flat: np.ndarray, seg_lens: np.ndarray) -> np.ndarray:
    """Per-segment delta encode (each segment's first value absolute)."""
    seg_starts = np.zeros(seg_lens.size, dtype=np.int64)
    np.cumsum(seg_lens[:-1], out=seg_starts[1:])
    deltas = V.delta_encode(flat)
    if flat.size:
        # restart only NON-EMPTY segments: an empty segment's start aliases
        # the next segment's (or falls off the end) and must not be touched
        nz = seg_lens > 0
        deltas[seg_starts[nz]] = flat[seg_starts[nz]]
    return deltas


def _encode_block(tbl: pa.Table, lo: int, hi: int, kind: int) -> bytes:
    n = hi - lo
    ids = tbl.column("id").to_numpy(zero_copy_only=False)[lo:hi].astype(np.int64)
    ver = tbl.column("version").to_numpy(zero_copy_only=False)[lo:hi].astype(np.int64)
    ntags, keys, items = _tags_of(tbl, lo, hi)
    roles = np.empty(0, dtype=object)
    if kind == KIND_RELATIONS:
        mcol = tbl.column("members").combine_chunks().slice(lo, n)
        moff = mcol.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        nmem = moff[1:] - moff[:-1]
        a0, b0 = int(moff[0]), int(moff[-1])
        mvals = mcol.values
        mtype = mvals.field("mtype").to_numpy(zero_copy_only=False).astype(np.int64)[a0:b0]
        mrefs = mvals.field("ref").to_numpy(zero_copy_only=False).astype(np.int64)[a0:b0]
        roles = np.asarray(mvals.field("role").slice(a0, b0 - a0).to_pylist(), dtype=object)
    strings, (kidx, iidx, ridx) = _string_table([keys, items, roles])
    parts: list[np.ndarray] = [
        np.asarray([len(strings)], dtype=np.uint64),
        np.asarray([len(s) for s in strings], dtype=np.uint64),
        V.zigzag(V.delta_encode(ids)),
    ]
    if kind == KIND_NODES:
        lat = tbl.column("lat").to_numpy(zero_copy_only=False)[lo:hi].astype(np.int64)
        lon = tbl.column("lon").to_numpy(zero_copy_only=False)[lo:hi].astype(np.int64)
        parts += [
            V.zigzag(V.delta_encode(lat)),
            V.zigzag(V.delta_encode(lon)),
            ver.astype(np.uint64),
        ]
    elif kind == KIND_WAYS:
        col = tbl.column("refs").combine_chunks().slice(lo, n)
        off = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        nrefs = off[1:] - off[:-1]
        flat = col.values.to_numpy(zero_copy_only=False).astype(np.int64)
        flat = flat[off[0] : off[-1]]
        parts += [ver.astype(np.uint64), nrefs.astype(np.uint64),
                  V.zigzag(_seg_deltas(flat, nrefs))]
    elif kind == KIND_RELATIONS:
        parts += [
            ver.astype(np.uint64),
            nmem.astype(np.uint64),
            mtype.astype(np.uint64),
            V.zigzag(_seg_deltas(mrefs, nmem)),
            ridx.astype(np.uint64),
        ]
    else:
        raise ValueError(f"unknown kind {kind}")
    kv = np.empty(2 * kidx.size, dtype=np.uint64)
    kv[0::2] = kidx.astype(np.uint64)
    kv[1::2] = iidx.astype(np.uint64)
    parts += [ntags.astype(np.uint64), kv]
    numstream = V.encode_uvarints(np.concatenate(parts))
    body = (
        struct.pack("<BII", kind, n, len(numstream)) + numstream + b"".join(strings)
    )
    comp = zlib.compress(body, 6)
    return struct.pack("<I", len(comp)) + comp


def write_cpbf(
    tbl: pa.Table,
    out_dir: str,
    kind: int,
    basename: str = "part",
    rows_per_block: int = 2000,
    blocks_per_file: int = 8,
) -> list[str]:
    """Encode an entity table into .cpbf files under out_dir (one file per
    blocks_per_file blocks — file count is the Spark read parallelism)."""
    os.makedirs(out_dir, exist_ok=True)
    n = tbl.num_rows
    if n == 0:
        blocks = [_encode_block(tbl, 0, 0, kind)]
    else:
        blocks = [
            _encode_block(tbl, lo, min(lo + rows_per_block, n), kind)
            for lo in range(0, n, rows_per_block)
        ]
    paths = []
    for fi, flo in enumerate(range(0, len(blocks), blocks_per_file)):
        p = os.path.join(out_dir, f"{basename}-{fi:05d}.cpbf")
        with open(p, "wb") as f:
            f.write(MAGIC)
            for b in blocks[flo : flo + blocks_per_file]:
                f.write(b)
        paths.append(p)
    return paths


# ---------------------------------------------------------------------------
# decode (runs inside Spark tasks — vectorized per block)
# ---------------------------------------------------------------------------


def iter_blocks(content: bytes) -> Iterator[bytes]:
    if content[: len(MAGIC)] != MAGIC:
        raise ValueError("bad cpbf magic")
    pos = len(MAGIC)
    total = len(content)
    while pos < total:
        if pos + 4 > total:
            raise ValueError("truncated cpbf block header")
        (clen,) = struct.unpack_from("<I", content, pos)
        pos += 4
        # validate BEFORE zlib so a damaged file raises a diagnosable
        # ValueError, not an opaque zlib.error mid-iteration (ADVICE r4)
        if clen == 0 or pos + clen > total:
            raise ValueError("truncated cpbf block")
        yield zlib.decompress(content[pos : pos + clen])
        pos += clen


def decode_block(body: bytes) -> tuple[int, dict[str, np.ndarray | pa.Array]]:
    """One block body -> (kind, columns). One vectorized varint pass."""
    kind, n, nslen = struct.unpack_from("<BII", body, 0)
    hdr = struct.calcsize("<BII")
    vals = V.decode_uvarints(body[hdr : hdr + nslen])
    strdata = body[hdr + nslen :]
    pos = 0

    def take(k: int) -> np.ndarray:
        nonlocal pos
        out = vals[pos : pos + k]
        if out.size != k:
            raise ValueError("short numstream")
        pos += k
        return out

    n_strings = int(take(1)[0])
    str_lens = take(n_strings).astype(np.int64)
    ends = np.cumsum(str_lens)
    starts = ends - str_lens
    table = np.asarray(
        [strdata[a:b].decode() for a, b in zip(starts.tolist(), ends.tolist())],
        dtype=object,
    )
    ids = V.delta_decode(V.unzigzag(take(n)))
    cols: dict[str, np.ndarray | pa.Array] = {"id": ids}
    if kind == KIND_NODES:
        cols["lat"] = V.delta_decode(V.unzigzag(take(n))).astype(np.int32)
        cols["lon"] = V.delta_decode(V.unzigzag(take(n))).astype(np.int32)
        cols["version"] = take(n).astype(np.int32)
    elif kind == KIND_WAYS:
        cols["version"] = take(n).astype(np.int32)
        nrefs = take(n).astype(np.int64)
        total_refs = int(nrefs.sum())
        seg_starts = np.zeros(n, dtype=np.int64)
        np.cumsum(nrefs[:-1], out=seg_starts[1:])
        deltas = V.unzigzag(take(total_refs))
        flat = V.segmented_delta_decode(deltas, seg_starts, nrefs)
        off = np.zeros(n + 1, dtype=np.int32)
        off[1:] = np.cumsum(nrefs)
        cols["refs"] = pa.ListArray.from_arrays(
            pa.array(off, pa.int32()), pa.array(flat, pa.int64())
        )
    elif kind == KIND_RELATIONS:
        cols["version"] = take(n).astype(np.int32)
        nmem = take(n).astype(np.int64)
        total_m = int(nmem.sum())
        seg_starts = np.zeros(n, dtype=np.int64)
        np.cumsum(nmem[:-1], out=seg_starts[1:])
        mtype = take(total_m).astype(np.int8)
        refs = V.segmented_delta_decode(V.unzigzag(take(total_m)), seg_starts, nmem)
        ridx = take(total_m).astype(np.int64)
        roles = table[ridx] if total_m else np.empty(0, dtype=object)
        off = np.zeros(n + 1, dtype=np.int32)
        off[1:] = np.cumsum(nmem)
        members = pa.StructArray.from_arrays(
            [
                pa.array(mtype, pa.int8()),
                pa.array(refs, pa.int64()),
                pa.array(roles, pa.string()),
            ],
            names=["mtype", "ref", "role"],
        )
        cols["members"] = pa.ListArray.from_arrays(pa.array(off, pa.int32()), members)
    else:
        raise ValueError(f"unknown kind {kind}")
    ntags = take(n).astype(np.int64)
    total_tags = int(ntags.sum())
    kv = take(2 * total_tags).astype(np.int64)
    toff = np.zeros(n + 1, dtype=np.int32)
    toff[1:] = np.cumsum(ntags)
    keys = table[kv[0::2]] if total_tags else np.empty(0, dtype=object)
    items = table[kv[1::2]] if total_tags else np.empty(0, dtype=object)
    cols["tags"] = pa.MapArray.from_arrays(
        pa.array(toff, pa.int32()),
        pa.array(keys, pa.string()),
        pa.array(items, pa.string()),
    )
    if pos != vals.size:
        raise ValueError("trailing numstream values")
    return kind, cols


def _block_to_batch(kind: int, cols: dict) -> pa.RecordBatch:
    if kind == KIND_NODES:
        names = ["id", "version", "lat", "lon", "tags"]
        arrays = [
            pa.array(cols["id"], pa.int64()),
            pa.array(cols["version"], pa.int32()),
            pa.array(cols["lat"], pa.int32()),
            pa.array(cols["lon"], pa.int32()),
            cols["tags"],
        ]
    elif kind == KIND_WAYS:
        names = ["id", "version", "refs", "tags"]
        arrays = [
            pa.array(cols["id"], pa.int64()),
            pa.array(cols["version"], pa.int32()),
            cols["refs"],
            cols["tags"],
        ]
    else:
        names = ["id", "version", "members", "tags"]
        arrays = [
            pa.array(cols["id"], pa.int64()),
            pa.array(cols["version"], pa.int32()),
            cols["members"],
            cols["tags"],
        ]
    return pa.RecordBatch.from_arrays(arrays, names=names)


def _decoder_for(kind: int):
    def decode(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for rb in batches:
            contents = rb.column(rb.schema.get_field_index("content"))
            for i in range(len(contents)):
                content = contents[i].as_py()
                for body in iter_blocks(content):
                    k, cols = decode_block(body)
                    if k != kind:
                        raise ValueError(f"kind mismatch: file has {k}, expected {kind}")
                    yield _block_to_batch(k, cols)

    return decode


def _schema_for(kind: int) -> str:
    return {KIND_NODES: NODE_SCHEMA, KIND_WAYS: WAY_SCHEMA, KIND_RELATIONS: REL_SCHEMA}[kind]


def read_cpbf(spark, path: str, kind: int):
    """Entity DataFrame from .cpbf files: binaryFile source + mapInArrow
    block decode (one task per file; each block decodes in one vectorized
    varint pass — no per-entity Python)."""
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.cpbf")
        .load(path)
        .select("content")
    )
    return df.mapInArrow(_decoder_for(kind), _schema_for(kind))


def read_cpbf_stream(spark, path: str, kind: int):
    """Structured-Streaming variant of the S1 front door: .cpbf files
    appearing under `path` decode incrementally (binaryFile file source
    tracks seen files in the checkpoint; the SAME mapInArrow block decoder
    as the batch path — one decode definition). Pair with an exactly-once
    sink (e.g. streaming/ingest_stream.py) for resumable planet ingest."""
    df = (
        spark.readStream.format("binaryFile")
        # streaming sources require an explicit schema; binaryFile's is fixed
        .schema("path string, modificationTime timestamp, length long, content binary")
        .option("pathGlobFilter", "*.cpbf")
        .load(path)
        .select("content")
    )
    return df.mapInArrow(_decoder_for(kind), _schema_for(kind))
