"""WGS84 <-> web-mercator unit-square transform (SURVEY.md §2.4 T1).

COORDS converts lat/lng to mercator for square tiling (REF?
src/geom/srsConversion [M]). Coordinates enter as OSM fixed-point int32
(1e-7 degrees, SURVEY.md §1.1) and leave as floats in the unit square
[0,1)^2 with (0,0) at the north-west corner — the standard web-map
convention, so y grows southward.

Pure numpy; a pure-Column Spark variant lives in
coords_spark/operators/cells.py and is cross-checked in tests.
"""

from __future__ import annotations

import numpy as np

SCALE = 1e-7  # int32 fixed-point -> degrees
MAX_LAT = 85.05112878  # web-mercator latitude clamp


def latlon_i32_to_unit(lat_i32, lon_i32) -> tuple[np.ndarray, np.ndarray]:
    """Fixed-point OSM coords -> unit-square mercator (ux, uy) in [0,1)."""
    lat = np.asarray(lat_i32, dtype=np.float64) * SCALE
    lon = np.asarray(lon_i32, dtype=np.float64) * SCALE
    ux = (lon + 180.0) / 360.0
    latc = np.clip(lat, -MAX_LAT, MAX_LAT)
    s = np.sin(np.radians(latc))
    uy = 0.5 - np.log((1.0 + s) / (1.0 - s)) / (4.0 * np.pi)
    eps = np.finfo(np.float64).eps
    return np.clip(ux, 0.0, 1.0 - eps), np.clip(uy, 0.0, 1.0 - eps)


def unit_to_latlon_deg(ux, uy) -> tuple[np.ndarray, np.ndarray]:
    """Inverse transform (degrees), for tests and bounds display."""
    lon = np.asarray(ux, dtype=np.float64) * 360.0 - 180.0
    n = np.pi * (1.0 - 2.0 * np.asarray(uy, dtype=np.float64))
    lat = np.degrees(np.arctan(np.sinh(n)))
    return lat, lon


def haversine_m(lat1_deg, lon1_deg, lat2_deg, lon2_deg) -> np.ndarray:
    """Great-circle distance in meters (vectorized); used by kNN exact ranking."""
    r = 6371000.0
    p1 = np.radians(np.asarray(lat1_deg, dtype=np.float64))
    p2 = np.radians(np.asarray(lat2_deg, dtype=np.float64))
    dp = p2 - p1
    dl = np.radians(np.asarray(lon2_deg, dtype=np.float64) - np.asarray(lon1_deg, dtype=np.float64))
    a = np.sin(dp / 2.0) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dl / 2.0) ** 2
    return 2.0 * r * np.arcsin(np.sqrt(np.clip(a, 0.0, 1.0)))
