"""Minimal protobuf wire-format subset for OSM PBF (SURVEY.md §2.1 S1;
VERDICT r4 ask #1 — the reference's ACTUAL front door, REF? src/osm/
osmParser* [M], mount empty; format per the public OSM PBF spec:
fileformat.proto / osmformat.proto, wiki.openstreetmap.org/wiki/PBF_Format).

From scratch, stdlib + numpy only — no protobuf library exists in the
sandbox and none is needed: OSM PBF uses a narrow slice of the wire format
(varint, length-delimited, packed repeated scalars). The hot payloads —
packed sint64 id/lat/lon/ref arrays — decode through the SAME vectorized
LEB128 kernel as cpbf (kernels/varint.py: one reduceat pass per buffer,
no per-value Python). Per-MESSAGE field walks (a handful of fields each
for Way/Relation/Blob headers) are plain Python over offsets; the
byte-proportional work stays in numpy.

Wire types: 0 = varint, 1 = fixed64, 2 = length-delimited, 5 = fixed32.
A field key is (field_number << 3) | wire_type, itself a varint.
"""

from __future__ import annotations

import struct

import numpy as np

from coords_spark.kernels import varint as V

WT_VARINT = 0
WT_FIXED64 = 1
WT_LEN = 2
WT_FIXED32 = 5


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def read_varint(buf, pos: int) -> tuple[int, int]:
    """Single varint at pos -> (value, next_pos). Scalar path for field
    keys and lone int fields; packed arrays go through varint.decode_uvarints."""
    result = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result & 0xFFFFFFFFFFFFFFFF, pos
        shift += 7
        if shift >= 70:
            raise ValueError("varint wider than 64 bits")


def walk_fields(buf, lo: int, hi: int):
    """Yield (field_no, wire_type, value) for each field in buf[lo:hi].
    value: int for varint/fixed; (start, end) offsets for length-delimited
    (no copy — callers slice lazily)."""
    pos = lo
    while pos < hi:
        key, pos = read_varint(buf, pos)
        fno, wt = key >> 3, key & 7
        if wt == WT_VARINT:
            val, pos = read_varint(buf, pos)
        elif wt == WT_LEN:
            ln, pos = read_varint(buf, pos)
            if pos + ln > hi:
                raise ValueError(f"length-delimited field {fno} overruns message")
            val = (pos, pos + ln)
            pos += ln
        elif wt == WT_FIXED64:
            val = struct.unpack_from("<Q", buf, pos)[0]
            pos += 8
        elif wt == WT_FIXED32:
            val = struct.unpack_from("<I", buf, pos)[0]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wt} (field {fno})")
        yield fno, wt, val
    if pos != hi:
        raise ValueError("message field overruns buffer")


def fields_dict(buf, lo: int, hi: int) -> dict[int, list]:
    """All fields of a small message as {field_no: [values]}."""
    out: dict[int, list] = {}
    for fno, _wt, val in walk_fields(buf, lo, hi):
        out.setdefault(fno, []).append(val)
    return out


def zigzag64(u: np.ndarray) -> np.ndarray:
    """Packed sint64 payload (already varint-decoded) -> int64."""
    return V.unzigzag(np.asarray(u, dtype=np.uint64))


def packed_uvarints(buf, span) -> np.ndarray:
    """Decode one packed-varint field payload (span = (s, e)) -> uint64,
    one vectorized pass."""
    s, e = span
    return V.decode_uvarints(memoryview(buf)[s:e])


def count_varints_per_span(terms_cumsum: np.ndarray, starts: np.ndarray,
                           ends: np.ndarray) -> np.ndarray:
    """#varints inside each (start, end) byte span, vectorized: a varint
    ends at every byte with the high bit clear, so the count is a prefix-sum
    difference over the terminator indicator. terms_cumsum = np.cumsum(
    bytes < 0x80) over the WHOLE buffer (computed once per block)."""
    starts = np.asarray(starts, dtype=np.int64)
    ends = np.asarray(ends, dtype=np.int64)
    hi = np.where(ends > 0, terms_cumsum[ends - 1], 0)
    lo = np.where(starts > 0, terms_cumsum[np.maximum(starts - 1, 0)], 0)
    return hi - lo


def concat_spans(buf, starts: np.ndarray, ends: np.ndarray) -> np.ndarray:
    """Concatenate byte spans of one buffer into a single uint8 array (for
    a bulk packed-varint decode across MANY messages in one kernel call)."""
    arr = np.frombuffer(buf, dtype=np.uint8)
    lens = ends - starts
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.uint8)
    # vectorized gather: output index i maps to arr[starts[seg(i)] + offset]
    seg_of = np.repeat(np.arange(starts.size), lens)
    base = np.repeat(starts, lens)
    within = np.arange(total, dtype=np.int64) - np.repeat(
        np.concatenate(([0], np.cumsum(lens)[:-1])), lens
    )
    return arr[base + within]


def precompute_varints(buf) -> tuple[np.ndarray, np.ndarray]:
    """(value, byte-length) of the varint starting at EVERY byte position —
    one vectorized pass over the whole buffer. Lets a message walk replace
    per-byte Python loops with O(1) array gathers: the decoded-in-lockstep
    message scan (sources/osmpbf._walk_messages_vec) iterates once per
    FIELD SLOT (~6 for a Way), each iteration vectorized over every message
    in the block.

    Positions that do not actually start a varint get garbage values —
    harmless, the walk only ever reads positions the wire format defines.
    Length is clamped to 10 (a 64-bit varint's max); a walk landing on a
    longer run raises downstream via bounds checks."""
    arr = np.frombuffer(buf, dtype=np.uint8) if isinstance(buf, (bytes, bytearray, memoryview)) else np.asarray(buf, dtype=np.uint8)
    n = arr.size
    if n == 0:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64)
    term = arr < 0x80
    # next terminator index at or after p (suffix scan, vectorized)
    idx = np.where(term, np.arange(n, dtype=np.int64), np.int64(n + 20))
    nxt = np.minimum.accumulate(idx[::-1])[::-1]
    vlen = np.minimum(nxt - np.arange(n, dtype=np.int64) + 1, 10)
    pad = np.zeros(n + 10, dtype=np.uint64)
    pad[:n] = arr & 0x7F
    val = pad[:n].copy()
    base = np.arange(n, dtype=np.int64)
    # iterate only to the longest varint actually present (typically 5-6,
    # not 10 — measured ~35% off this function's wall)
    for k in range(1, int(vlen.max())):
        mask = vlen > k
        val[mask] |= pad[base[mask] + k] << np.uint64(7 * k)
    return val, vlen


# ---------------------------------------------------------------------------
# encode (writer side — drivers/fixtures; packed payloads vectorized)
# ---------------------------------------------------------------------------


def enc_varint(x: int) -> bytes:
    x &= 0xFFFFFFFFFFFFFFFF
    out = bytearray()
    while True:
        b = x & 0x7F
        x >>= 7
        if x:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def enc_key(fno: int, wt: int) -> bytes:
    return enc_varint((fno << 3) | wt)


def enc_field_varint(fno: int, x: int) -> bytes:
    return enc_key(fno, WT_VARINT) + enc_varint(x)


def enc_field_len(fno: int, payload: bytes) -> bytes:
    return enc_key(fno, WT_LEN) + enc_varint(len(payload)) + payload


def enc_packed_uvarints(fno: int, vals: np.ndarray) -> bytes:
    """Packed repeated varint field — payload built by the vectorized
    LEB128 encoder. Empty arrays emit nothing (proto3-style omission)."""
    v = np.asarray(vals, dtype=np.uint64)
    if v.size == 0:
        return b""
    return enc_field_len(fno, V.encode_uvarints(v))


def enc_packed_sint64(fno: int, vals: np.ndarray) -> bytes:
    return enc_packed_uvarints(fno, V.zigzag(np.asarray(vals, dtype=np.int64)))


def enc_field_sint64(fno: int, x: int) -> bytes:
    return enc_field_varint(fno, int(V.zigzag(np.asarray([x]))[0]))
