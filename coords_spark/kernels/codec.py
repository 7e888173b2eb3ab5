"""Image payload codecs + PSNR (input_hint, BASELINE.json:15).

No PIL in this environment (SURVEY.md §0), so codecs are from-scratch
numpy + stdlib zlib:

  * ``raw``  — packed RGB uint8, lossless.
  * ``pngz`` — a real, minimal PNG (8-bit RGB, filter 0, zlib), lossless;
               readable by any standard PNG decoder.
  * ``q6``   — lossy 6-bit-per-channel quantization (the "lossy format"
               exercising the PSNR >= 40 dB invariant).

All images are HxWx3 uint8 arrays.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_raw(img: np.ndarray) -> bytes:
    return np.ascontiguousarray(img, dtype=np.uint8).tobytes()


def decode_raw(data: bytes, w: int, h: int) -> np.ndarray:
    return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)


def encode_pngz(img: np.ndarray, level: int = 6) -> bytes:
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, _ = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    # filter byte 0 per scanline
    scan = np.empty((h, 1 + w * 3), dtype=np.uint8)
    scan[:, 0] = 0
    scan[:, 1:] = img.reshape(h, w * 3)
    idat = zlib.compress(scan.tobytes(), level)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode_pngz(data) -> np.ndarray:
    """Accepts bytes or any buffer (memoryview / pyarrow Buffer slice) —
    zero-copy friendly for Arrow-native UDFs."""
    data = memoryview(data)
    if bytes(data[:8]) != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    idat_parts = []
    while pos < len(data):
        (ln,) = struct.unpack_from(">I", data, pos)
        ctype = bytes(data[pos + 4 : pos + 8])
        if ctype == b"IHDR":
            w, h, depth, ctyp, _, _, interlace = struct.unpack_from(">IIBBBBB", data, pos + 8)
            if depth != 8 or ctyp != 2 or interlace != 0:
                raise ValueError("unsupported PNG variant")
        elif ctype == b"IDAT":
            idat_parts.append(bytes(data[pos + 8 : pos + 8 + ln]))
        elif ctype == b"IEND":
            break
        pos += 12 + ln
    rawb = zlib.decompress(b"".join(idat_parts))
    scan = np.frombuffer(rawb, dtype=np.uint8).reshape(h, 1 + w * 3)
    if np.any(scan[:, 0] != 0):
        raise ValueError("only filter 0 supported")
    return scan[:, 1:].reshape(h, w, 3).copy()


def encode_q6(img: np.ndarray) -> bytes:
    """Lossy: keep the top 6 bits per channel (max abs error 2 after midpoint
    reconstruction => PSNR ~47 dB, comfortably over the 40 dB gate)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    return (img >> 2).tobytes()


def decode_q6(data: bytes, w: int, h: int) -> np.ndarray:
    q = np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)
    return np.minimum(q.astype(np.uint16) * 4 + 1, 255).astype(np.uint8)


def encode_image(img: np.ndarray, fmt: str, level: int = 6) -> bytes:
    """`level` is the pngz deflate level (ignored by raw/q6): the
    payload SIZE/CPU trade is the caller's — render tiles favour encode
    speed, archival image fixtures keep the default 6. Any level decodes
    identically (zlib streams are self-describing)."""
    if fmt == "raw":
        return encode_raw(img)
    if fmt == "pngz":
        return encode_pngz(img, level)
    if fmt == "q6":
        return encode_q6(img)
    raise ValueError(f"unknown fmt {fmt!r}")


def decode_image(data: bytes, fmt: str, w: int, h: int) -> np.ndarray:
    if fmt == "raw":
        return decode_raw(data, w, h)
    if fmt == "pngz":
        return decode_pngz(data)
    if fmt == "q6":
        return decode_q6(data, w, h)
    raise ValueError(f"unknown fmt {fmt!r}")


def is_lossless(fmt: str) -> bool:
    return fmt in ("raw", "pngz")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf when identical."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    mse = float(np.mean((a - b) ** 2))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)
