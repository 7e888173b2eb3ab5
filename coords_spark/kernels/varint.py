"""Vectorized LEB128 varint + zigzag codec (SURVEY.md §2.1 S1).

The COORDS front door is a PBF-style blocked binary format (REF?
src/osm/osmParser* [M] — mount empty, shape per SURVEY §2.1): varint/
delta-packed entity blocks behind zlib. These kernels are the numeric
layer: pure numpy, no Spark, both directions batch-vectorized (no
per-value Python in the decode hot path — one pass builds every varint in
a buffer via reduceat over 7-bit groups).
"""

from __future__ import annotations

import numpy as np

_U = np.uint64


def zigzag(v: np.ndarray) -> np.ndarray:
    """int64 -> uint64 zigzag (small magnitudes stay small either sign)."""
    v = np.asarray(v, dtype=np.int64)
    return ((v.astype(np.uint64) << _U(1)) ^ (v >> np.int64(63)).astype(np.uint64))


def unzigzag(u: np.ndarray) -> np.ndarray:
    u = np.asarray(u, dtype=np.uint64)
    return ((u >> _U(1)) ^ (~(u & _U(1)) + _U(1))).astype(np.int64)


def encode_uvarints(vals: np.ndarray) -> bytes:
    """All values as concatenated LEB128 varints — fully vectorized:
    a (n, 10) 7-bit-group matrix, exact per-value byte counts from
    threshold comparisons (never float bit-length), flattened by mask."""
    v = np.asarray(vals, dtype=np.uint64)
    if v.size == 0:
        return b""
    k = 10  # ceil(64 / 7)
    shifts = (np.arange(k, dtype=np.uint64) * _U(7))
    parts = ((v[:, None] >> shifts) & _U(0x7F)).astype(np.uint8)
    thresholds = _U(1) << (np.arange(1, k, dtype=np.uint64) * _U(7))
    nbytes = 1 + (v[:, None] >= thresholds).sum(axis=1)
    j = np.arange(k)
    used = j[None, :] < nbytes[:, None]
    cont = j[None, :] < (nbytes - 1)[:, None]
    parts = np.where(cont, parts | 0x80, parts)
    return parts[used].tobytes()


def decode_uvarints(buf: bytes | np.ndarray, count: int | None = None) -> np.ndarray:
    """Every LEB128 varint in `buf` as uint64 — one vectorized pass:
    terminator bytes (high bit clear) delimit groups; each group's value is
    a reduceat-sum of its 7-bit payloads shifted by in-group position."""
    b = np.frombuffer(buf, dtype=np.uint8) if isinstance(buf, (bytes, bytearray, memoryview)) else np.asarray(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    term = b < 0x80
    if not term[-1]:
        raise ValueError("truncated varint stream")
    starts = np.zeros(int(term.sum()), dtype=np.int64)
    starts[1:] = np.nonzero(term)[0][:-1] + 1
    idx = np.arange(b.size, dtype=np.int64)
    group = np.cumsum(term) - term  # group id per byte
    pos = idx - starts[group]
    if pos.max() >= 10:
        raise ValueError("varint wider than 64 bits")
    payload = (b & 0x7F).astype(np.uint64) << (pos.astype(np.uint64) * _U(7))
    vals = np.add.reduceat(payload, starts)
    if count is not None and vals.size != count:
        raise ValueError(f"expected {count} varints, decoded {vals.size}")
    return vals


def delta_encode(v: np.ndarray) -> np.ndarray:
    """First value absolute, then consecutive differences (int64)."""
    v = np.asarray(v, dtype=np.int64)
    out = np.empty_like(v)
    if v.size:
        out[0] = v[0]
        np.subtract(v[1:], v[:-1], out=out[1:])
    return out


def delta_decode(d: np.ndarray) -> np.ndarray:
    return np.cumsum(np.asarray(d, dtype=np.int64), dtype=np.int64)


def segmented_delta_decode(deltas: np.ndarray, seg_starts: np.ndarray, seg_lens: np.ndarray) -> np.ndarray:
    """Per-segment cumulative sums (each segment's first delta is absolute)
    without a Python loop: global cumsum minus the segment-start baseline."""
    d = np.asarray(deltas, dtype=np.int64)
    if d.size == 0:
        return d
    cs = np.cumsum(d, dtype=np.int64)
    # an EMPTY trailing segment starts at d.size — clip its (unused) base
    # index in-bounds; np.repeat drops zero-length segments anyway
    ss = np.minimum(np.asarray(seg_starts, dtype=np.int64), d.size - 1)
    base = cs[ss] - d[ss]
    return cs - np.repeat(base, np.asarray(seg_lens, dtype=np.int64))
