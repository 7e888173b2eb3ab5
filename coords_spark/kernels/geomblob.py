"""GenericGeometry-style binary serialization (SURVEY.md §1.1/§2.1 S4).

COORDS stores tiles as serialized geometry blobs (REF?
src/geom/genericGeometry.h/.cc [M]). Our deterministic little-endian
layout — the unit of byte-for-byte comparison against the oracle:

    u8   gtype            (0 point, 1 line, 2 polygon)
    i64  id
    u32  n_rings          (1 for point/line)
    per ring: u32 n_pts, then n_pts * (i32 lat, i32 lon)
    u32  n_tags
    per tag: u16 klen, bytes key, u16 vlen, bytes value   (utf-8)

Vectorized-enough: ring coords are dumped via numpy tobytes; only the
framing is Python-level (runs inside Arrow batch UDFs, not per-row Spark).
"""

from __future__ import annotations

import struct

import numpy as np

GTYPE_POINT = 0
GTYPE_LINE = 1
GTYPE_POLYGON = 2


def encode_geom(gtype: int, gid: int, rings, tags) -> bytes:
    """rings: list of (lat_i32_array, lon_i32_array); tags: list[(k, v)]."""
    out = [struct.pack("<Bqi", gtype, gid, len(rings))]
    for lat, lon in rings:
        lat = np.asarray(lat, dtype=np.int32)
        lon = np.asarray(lon, dtype=np.int32)
        out.append(struct.pack("<I", lat.shape[0]))
        pts = np.empty((lat.shape[0], 2), dtype="<i4")
        pts[:, 0] = lat
        pts[:, 1] = lon
        out.append(pts.tobytes())
    out.append(struct.pack("<I", len(tags)))
    for k, v in tags:
        kb, vb = k.encode(), v.encode()
        out.append(struct.pack("<H", len(kb)) + kb + struct.pack("<H", len(vb)) + vb)
    return b"".join(out)


def decode_geom(buf: bytes):
    gtype, gid, n_rings = struct.unpack_from("<Bqi", buf, 0)
    pos = struct.calcsize("<Bqi")
    rings = []
    for _ in range(n_rings):
        (n,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        pts = np.frombuffer(buf, dtype="<i4", count=2 * n, offset=pos).reshape(n, 2)
        rings.append((pts[:, 0].copy(), pts[:, 1].copy()))
        pos += 8 * n
    (n_tags,) = struct.unpack_from("<I", buf, pos)
    pos += 4
    tags = []
    for _ in range(n_tags):
        (klen,) = struct.unpack_from("<H", buf, pos)
        pos += 2
        k = buf[pos : pos + klen].decode()
        pos += klen
        (vlen,) = struct.unpack_from("<H", buf, pos)
        pos += 2
        v = buf[pos : pos + vlen].decode()
        pos += vlen
        tags.append((k, v))
    return gtype, gid, rings, tags


def envelope_of_rings(rings) -> tuple[int, int, int, int]:
    """(min_lat, min_lon, max_lat, max_lon) over all ring points (T3)."""
    lats = np.concatenate([np.asarray(r[0], dtype=np.int64) for r in rings])
    lons = np.concatenate([np.asarray(r[1], dtype=np.int64) for r in rings])
    return int(lats.min()), int(lons.min()), int(lats.max()), int(lons.max())
