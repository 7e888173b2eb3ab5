"""Kernel unit tests: image codec, PSNR, phash, anchor (no Spark)."""

import zlib

import numpy as np

from coords_spark.kernels import codec, phash


def _img(seed=0, w=16, h=24):
    return phash.procedural_image(f"img{seed:010d}", w, h)


def test_raw_roundtrip():
    img = _img(1)
    b = codec.encode_raw(img)
    np.testing.assert_array_equal(codec.decode_raw(b, 16, 24), img)


def test_pngz_roundtrip_and_valid_png():
    img = _img(2, 32, 16)
    b = codec.encode_pngz(img)
    assert b[:8] == b"\x89PNG\r\n\x1a\n"
    np.testing.assert_array_equal(codec.decode_pngz(b), img)
    # CRCs are real crc32 over type+data
    ln = int.from_bytes(b[8:12], "big")
    crc = int.from_bytes(b[16 + ln : 20 + ln], "big")
    assert crc == zlib.crc32(b[12 : 16 + ln]) & 0xFFFFFFFF


def test_q6_lossy_psnr_over_40():
    img = _img(3, 64, 64)
    b = codec.encode_q6(img)
    dec = codec.decode_q6(b, 64, 64)
    p = codec.psnr(img, dec)
    assert p >= 40.0
    assert np.max(np.abs(img.astype(int) - dec.astype(int))) <= 3


def test_psnr_identity_inf():
    img = _img(4)
    assert codec.psnr(img, img) == float("inf")


def test_encode_decode_dispatch():
    img = _img(5, 16, 16)
    for fmt in ("raw", "pngz", "q6"):
        b = codec.encode_image(img, fmt)
        dec = codec.decode_image(b, fmt, 16, 16)
        if codec.is_lossless(fmt):
            np.testing.assert_array_equal(dec, img)
        else:
            assert codec.psnr(img, dec) >= 40


def test_procedural_image_deterministic():
    a = phash.procedural_image("imgX", 16, 16)
    b = phash.procedural_image("imgX", 16, 16)
    np.testing.assert_array_equal(a, b)
    c = phash.procedural_image("imgY", 16, 16)
    assert not np.array_equal(a, c)


def test_blockhash_properties():
    img = _img(6, 64, 64)
    h1 = phash.blockhash64(img)
    assert isinstance(h1, int)
    assert -(2**63) <= h1 < 2**63
    # deterministic
    assert h1 == phash.blockhash64(img)
    # roughly half the bits set (median threshold)
    bits = bin(h1 & ((1 << 64) - 1)).count("1")
    assert 16 <= bits <= 48
    # q6-lossy image has a close hash (perceptual robustness)
    dec = codec.decode_q6(codec.encode_q6(img), 64, 64)
    h2 = phash.blockhash64(dec)
    ham = bin((h1 ^ h2) & ((1 << 64) - 1)).count("1")
    assert ham <= 8


def test_anchor_distribution_and_determinism():
    r = np.random.default_rng(21)
    ph = r.integers(-(2**62), 2**62, 20000)
    lat1, lon1 = phash.anchor(ph)
    lat2, lon2 = phash.anchor(ph)
    np.testing.assert_array_equal(lat1, lat2)
    np.testing.assert_array_equal(lon1, lon2)
    assert lat1.dtype == np.int32 and lon1.dtype == np.int32
    assert np.all(np.abs(lat1) <= 850000000)
    assert np.all(np.abs(lon1) <= 1800000000)
    # skew: the 5 hotspots should capture ~70% of points within ~3 deg
    lat_deg = lat1 * 1e-7
    lon_deg = lon1 * 1e-7
    near_hot = np.zeros(len(ph), dtype=bool)
    for hlat, hlon in phash.HOTSPOTS:
        near_hot |= (np.abs(lat_deg - hlat) < 3) & (np.abs(lon_deg - hlon) < 3)
    frac = near_hot.mean()
    assert 0.6 < frac < 0.8
