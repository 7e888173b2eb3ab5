"""Perceptual hash (DCT-free blockhash) + deterministic geo-anchor.

FIXTURES.md §1: each image row carries ``phash: int64``, a 64-bit blockhash
of the decoded pixels; the geo-anchor derives (lat, lon) *deterministically
from phash* with the skewed spatial distribution the engine must defuse
(70% urban hotspots / 20% coastline / 10% uniform — BASELINE.json:6
"coastline/urban skew").

Pure numpy; anchor() is vectorized over arrays of phash values.
"""

from __future__ import annotations

import hashlib

import numpy as np

_U = np.uint64

# --- deterministic procedural image ----------------------------------------


def procedural_image(image_id: str, w: int, h: int) -> np.ndarray:
    """HxWx3 uint8: seeded tiled gradient + hash noise (FIXTURES.md §1)."""
    seed = np.frombuffer(hashlib.sha256(image_id.encode()).digest(), dtype=np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.empty((h, w, 3), dtype=np.float64)
    base[..., 0] = (xx * (1 + seed[0] % 7)) % 256
    base[..., 1] = (yy * (1 + seed[1] % 7)) % 256
    base[..., 2] = ((xx + yy) * (1 + seed[2] % 7)) % 256
    # tiled 8x8 noise pattern from the digest, repeated across the image
    tile = seed[np.arange(64) % 32].reshape(8, 8).astype(np.float64)
    noise = tile[yy % 8, xx % 8]
    img = (0.75 * base + 0.25 * noise[..., None]) % 256
    return img.astype(np.uint8)


# --- blockhash --------------------------------------------------------------


def blockhash64(img: np.ndarray) -> int:
    """64-bit blockhash: mean-pool grayscale to 8x8, threshold at the median,
    pack row-major (bit 63 = block (0,0)). Returns signed int64.

    For h, w multiples of 8 this MUST stay bit-identical to
    blockhash64_batch (same float summation order), so it delegates."""
    img = np.asarray(img)
    h, w = img.shape[0], img.shape[1]
    if h % 8 == 0 and w % 8 == 0:
        return int(blockhash64_batch(img[None, ...])[0])
    g = img.astype(np.float64).mean(axis=2)
    by = (np.arange(h) * 8) // h
    bx = (np.arange(w) * 8) // w
    idx = (by[:, None] * 8 + bx[None, :]).ravel()
    sums = np.bincount(idx, weights=g.ravel(), minlength=64)
    cnts = np.bincount(idx, minlength=64)
    blocks = sums / np.maximum(cnts, 1)
    med = np.median(blocks)
    bits = (blocks > med).astype(np.uint8)
    packed = np.packbits(bits)  # bit 63 = block (0,0)
    val = packed.view(">u8")[0]
    return int(np.uint64(val).view(np.int64))


def blockhash64_batch(imgs: np.ndarray) -> np.ndarray:
    """Vectorized blockhash over a stack (N, h, w, 3) with h, w multiples
    of 8. Bit-identical to blockhash64 per image. Returns int64[N].

    The channel mean sums the uint8 channels in uint16 (exact: max 765)
    and divides once in float64 — bit-identical to the float64 chain
    ((r+g)+b)/3 because integer sums <= 765 are exact in both domains,
    while skipping the 8x float64 materialization and the slow mixed-cast
    pairwise reduce of the direct mean."""
    imgs = np.asarray(imgs)
    k = imgs[..., 0].astype(np.uint16)
    k += imgs[..., 1]
    k += imgs[..., 2]
    g = k.astype(np.float64)
    g /= 3.0
    n, h, w = g.shape
    assert h % 8 == 0 and w % 8 == 0, "batch path needs h,w multiples of 8"
    blocks = g.reshape(n, 8, h // 8, 8, w // 8).mean(axis=(2, 4)).reshape(n, 64)
    med = np.median(blocks, axis=1, keepdims=True)
    bits = (blocks > med).astype(np.uint8)
    packed = np.packbits(bits, axis=1)
    return packed.view(">u8").astype(np.uint64).reshape(n).view(np.int64).copy()


# --- splitmix64 + anchor ----------------------------------------------------


def splitmix64(x) -> np.ndarray:
    """One splitmix64 step (public-domain constant mix), vectorized.
    uint64 wraparound is the point — silence numpy's overflow warning."""
    with np.errstate(over="ignore"):
        z = np.asarray(x).astype(np.uint64) + _U(0x9E3779B97F4A7C15)
        z = (z ^ (z >> _U(30))) * _U(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> _U(27))) * _U(0x94D049BB133111EB)
        return z ^ (z >> _U(31))


def _unif(x, salt: int) -> np.ndarray:
    """Deterministic uniform [0,1) stream `salt` derived from x."""
    h = splitmix64(np.asarray(x).astype(np.uint64) ^ _U(salt * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF))
    return (h >> _U(11)).astype(np.float64) / float(1 << 53)


# five "urban" hotspots (lat_deg, lon_deg) — fixed, documented
HOTSPOTS = np.asarray(
    [
        (40.7, -74.0),  # NYC-ish
        (51.5, -0.1),  # London-ish
        (35.7, 139.7),  # Tokyo-ish
        (-23.5, -46.6),  # São Paulo-ish
        (28.6, 77.2),  # Delhi-ish
    ],
    dtype=np.float64,
)

# synthetic closed coastline ring: perturbed circle around (10, 20), r=15 deg
_COAST_N = 512
_t = np.arange(_COAST_N) * (2.0 * np.pi / _COAST_N)
COAST_LAT = 10.0 + 15.0 * np.sin(_t) + 2.0 * np.sin(5 * _t + 1.0)
COAST_LON = 20.0 + 15.0 * np.cos(_t) + 2.0 * np.cos(3 * _t + 0.5)


def anchor(phash) -> tuple[np.ndarray, np.ndarray]:
    """phash(int64 array) -> (lat_i32, lon_i32) OSM fixed-point anchors.

    70% hotspot-clustered (Box-Muller gaussian, sigma 0.5 deg), 20% along
    the synthetic coastline ring (small perpendicular jitter), 10% uniform.
    """
    ph = np.asarray(phash).astype(np.int64).view(np.uint64)
    sel = _unif(ph, 1)
    u1 = np.maximum(_unif(ph, 2), 1e-12)
    u2 = _unif(ph, 3)
    u3 = _unif(ph, 4)
    u4 = _unif(ph, 5)

    # gaussian offsets via Box-Muller
    r = np.sqrt(-2.0 * np.log(u1))
    g1 = r * np.cos(2.0 * np.pi * u2)
    g2 = r * np.sin(2.0 * np.pi * u2)

    # hotspot branch
    hidx = np.minimum((u3 * len(HOTSPOTS)).astype(np.int64), len(HOTSPOTS) - 1)
    hot_lat = HOTSPOTS[hidx, 0] + 0.5 * g1
    hot_lon = HOTSPOTS[hidx, 1] + 0.5 * g2

    # coastline branch: position along the ring + ~0.05 deg jitter
    cidx = np.minimum((u4 * _COAST_N).astype(np.int64), _COAST_N - 1)
    coast_lat = COAST_LAT[cidx] + 0.05 * g1
    coast_lon = COAST_LON[cidx] + 0.05 * g2

    # uniform branch
    uni_lat = -60.0 + _unif(ph, 6) * 130.0
    uni_lon = -179.0 + _unif(ph, 7) * 358.0

    lat = np.where(sel < 0.7, hot_lat, np.where(sel < 0.9, coast_lat, uni_lat))
    lon = np.where(sel < 0.7, hot_lon, np.where(sel < 0.9, coast_lon, uni_lon))
    lat = np.clip(lat, -85.0, 85.0)
    lon = ((lon + 180.0) % 360.0) - 180.0
    return (np.round(lat * 1e7)).astype(np.int32), (np.round(lon * 1e7)).astype(np.int32)
