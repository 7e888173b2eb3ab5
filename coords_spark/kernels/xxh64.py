"""XXH64 (public xxHash algorithm, Yann Collet) — from-scratch numpy/python
implementation compatible with Spark SQL's ``xxhash64`` expression.

Spark seeds with 42 and chains multi-argument hashes (the hash of argument
k becomes the seed for argument k+1). Longs hash as their 8-byte
little-endian representation (``hash_long``); strings hash their UTF-8
bytes (``hash_bytes``). Used by tools/gen_goldens.py to derive the
engine's phash/anchor inputs independently of any Spark session, and
parity-tested against F.xxhash64 in tests/test_kernels_xxh64.py.
"""

from __future__ import annotations

import numpy as np

_M = np.uint64(0xFFFFFFFFFFFFFFFF)
P1 = np.uint64(0x9E3779B185EBCA87)
P2 = np.uint64(0xC2B2AE3D27D4EB4F)
P3 = np.uint64(0x165667B19E3779F9)
P4 = np.uint64(0x85EBCA77C2B2AE63)
P5 = np.uint64(0x27D4EB2F165667C5)

SPARK_SEED = 42


def _rotl(x: np.uint64, r: int) -> np.uint64:
    r = np.uint64(r)
    return ((x << r) | (x >> (np.uint64(64) - r))) & _M


def _fmix(h: np.uint64) -> np.uint64:
    h ^= h >> np.uint64(33)
    h = (h * P2) & _M
    h ^= h >> np.uint64(29)
    h = (h * P3) & _M
    h ^= h >> np.uint64(32)
    return h


def _round(acc: np.uint64, lane: np.uint64) -> np.uint64:
    acc = (acc + lane * P2) & _M
    acc = _rotl(acc, 31)
    return (acc * P1) & _M


def hash_long(value: int | np.ndarray, seed: int = SPARK_SEED):
    """XXH64 of a single 8-byte little-endian long (Spark's hashLong).
    Vectorized: accepts an int64 numpy array and returns int64 hashes."""
    old = np.seterr(over="ignore")
    try:
        v = np.asarray(value, dtype=np.int64).view(np.uint64)
        h = (np.uint64(seed) + P5 + np.uint64(8)) & _M
        k1 = (v * P2) & _M
        k1 = ((k1 << np.uint64(31)) | (k1 >> np.uint64(33))) & _M
        k1 = (k1 * P1) & _M
        h ^= k1
        h = ((((h << np.uint64(27)) | (h >> np.uint64(37))) & _M) * P1 + P4) & _M
        h ^= h >> np.uint64(33)
        h = (h * P2) & _M
        h ^= h >> np.uint64(29)
        h = (h * P3) & _M
        h ^= h >> np.uint64(32)
        out = h.view(np.int64) if isinstance(h, np.ndarray) else np.int64(np.uint64(h))
        return out if isinstance(value, np.ndarray) else int(out)
    finally:
        np.seterr(**old)


def hash_int(value: int, seed: int = SPARK_SEED) -> int:
    """XXH64 of a single 4-byte int (Spark hashes IntegerType as 4 bytes
    via hashInt)."""
    old = np.seterr(over="ignore")
    try:
        h = (np.uint64(seed) + P5 + np.uint64(4)) & _M
        k = (np.uint64(np.int64(value) & 0xFFFFFFFF) * P1) & _M
        h ^= k
        h = (_rotl(h, 23) * P2 + P3) & _M
        return int(np.uint64(_fmix(h)).view(np.int64))
    finally:
        np.seterr(**old)


def hash_bytes(data: bytes, seed: int = SPARK_SEED) -> int:
    """XXH64 over a byte string (Spark's hashUnsafeBytes for StringType:
    the UTF-8 bytes). Scalar — golden generation operates at fixture scale."""
    old = np.seterr(over="ignore")
    try:
        n = len(data)
        buf = np.frombuffer(data, dtype=np.uint8)
        i = 0
        if n >= 32:
            v1 = (np.uint64(seed) + P1 + P2) & _M
            v2 = (np.uint64(seed) + P2) & _M
            v3 = np.uint64(seed)
            v4 = (np.uint64(seed) - P1) & _M
            nstripes = n // 32
            lanes = np.frombuffer(data[: nstripes * 32], dtype="<u8").reshape(-1, 4)
            for s in range(nstripes):
                v1 = _round(v1, np.uint64(lanes[s, 0]))
                v2 = _round(v2, np.uint64(lanes[s, 1]))
                v3 = _round(v3, np.uint64(lanes[s, 2]))
                v4 = _round(v4, np.uint64(lanes[s, 3]))
            h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
            for v in (v1, v2, v3, v4):
                h = ((h ^ _round(np.uint64(0), v)) * P1 + P4) & _M
            i = nstripes * 32
        else:
            h = (np.uint64(seed) + P5) & _M
        h = (h + np.uint64(n)) & _M
        while i + 8 <= n:
            lane = np.uint64(int.from_bytes(data[i : i + 8], "little"))
            h = ((_rotl(h ^ _round(np.uint64(0), lane), 27)) * P1 + P4) & _M
            i += 8
        if i + 4 <= n:
            lane = np.uint64(int.from_bytes(data[i : i + 4], "little"))
            h = ((_rotl(h ^ ((lane * P1) & _M), 23)) * P2 + P3) & _M
            i += 4
        while i < n:
            h = ((_rotl(h ^ ((np.uint64(buf[i]) * P5) & _M), 11)) * P1) & _M
            i += 1
        return int(np.uint64(_fmix(h)).view(np.int64))
    finally:
        np.seterr(**old)


def spark_xxhash64_str(*args: str, seed: int = SPARK_SEED) -> int:
    """Spark's multi-argument xxhash64 over string columns: the hash of
    argument k (as unsigned seed) seeds argument k+1."""
    h = seed
    for a in args:
        h = hash_bytes(a.encode("utf-8"), seed=h & 0xFFFFFFFFFFFFFFFF)
    return h
