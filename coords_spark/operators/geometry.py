"""Geometry columns: envelopes (T3), deepest-containing-cell placement for
extended geometries (T4), LOD simplification (T7), GenericGeometry blob
encode (S4 payload) — SURVEY.md §2.4.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, LongType

from coords_spark.kernels import geomblob, mercator, simplify, zcurve


def with_envelope(df: DataFrame, pts: str = "pts") -> DataFrame:
    """AABB as four plain int columns (never a UDT — prunable, SURVEY §1.2).
    Pure Column higher-order functions: stays in whole-stage codegen."""
    return (
        df.withColumn("env_minlat", F.expr(f"array_min(transform({pts}, p -> p.lat))"))
        .withColumn("env_minlon", F.expr(f"array_min(transform({pts}, p -> p.lon))"))
        .withColumn("env_maxlat", F.expr(f"array_max(transform({pts}, p -> p.lat))"))
        .withColumn("env_maxlon", F.expr(f"array_max(transform({pts}, p -> p.lon))"))
    )


def envelope_cell_col(
    minlat, minlon, maxlat, maxlon, max_level: int = zcurve.MAX_LEVEL
) -> Column:
    """Deepest cell fully containing the lat/lon envelope. Note the y flip:
    north (max lat) maps to the smaller mercator gy."""

    @F.pandas_udf(LongType())
    def _env(a: pd.Series, b: pd.Series, c: pd.Series, d: pd.Series) -> pd.Series:
        ux0, uy0 = mercator.latlon_i32_to_unit(c.to_numpy(), b.to_numpy())  # NW corner
        ux1, uy1 = mercator.latlon_i32_to_unit(a.to_numpy(), d.to_numpy())  # SE corner
        gx0, gy0 = zcurve.unit_to_grid(ux0, uy0)
        gx1, gy1 = zcurve.unit_to_grid(ux1, uy1)
        return pd.Series(
            zcurve.deepest_common_cell(gx0, gy0, gx1, gy1, max_level).astype("int64")
        )

    return _env(minlat, minlon, maxlat, maxlon)


def with_geometry_cell(df: DataFrame, max_level: int = zcurve.MAX_LEVEL) -> DataFrame:
    """envelope columns -> `cell` (deepest containing quadtree cell, T4)."""
    return df.withColumn(
        "cell",
        envelope_cell_col(
            F.col("env_minlat"), F.col("env_minlon"), F.col("env_maxlat"), F.col("env_maxlon"),
            max_level,
        ),
    )


def simplified_pts_col(pts_col, lod: int) -> Column:
    """T7: Douglas-Peucker at the pixel tolerance of `lod` (mercator grid
    units). Batch-level Arrow UDF; per-geometry numpy DP inside."""
    eps = simplify.lod_eps_units(lod)

    @F.pandas_udf("array<struct<lat:int,lon:int>>")
    def _dp(pts: pd.Series) -> pd.Series:
        out = []
        for geom in pts:
            if geom is None or len(geom) <= 2:
                out.append(geom)
                continue
            lat = np.asarray([p["lat"] for p in geom], dtype=np.int64)
            lon = np.asarray([p["lon"] for p in geom], dtype=np.int64)
            ux, uy = mercator.latlon_i32_to_unit(lat, lon)
            gx = ux * zcurve.GRID
            gy = uy * zcurve.GRID
            mask = simplify.dp_mask(gx, gy, eps)
            out.append([{"lat": int(a), "lon": int(b)} for a, b in zip(lat[mask], lon[mask])])
        return pd.Series(out)

    return _dp(pts_col)


def build_lod_tables(
    geoms: DataFrame,
    lods: list[int],
    pts: str = "pts",
    min_px: float = 2.0,
) -> dict[int, DataFrame]:
    """T7 applied: per-zoom materializable tables — geometry simplified to
    the lod's pixel tolerance, features whose envelope is smaller than
    `min_px` pixels at that lod dropped (COORDS precomputes exactly this
    per level, REF? src/lod/ [L-M]). Returns {lod: DataFrame}; callers
    materialize each via tiling.materialize_chunk_table."""
    out = {}
    df = with_envelope(geoms, pts)
    for lod in sorted(lods):
        # feature size threshold in int32 degree units: one pixel at `lod`
        # spans ~ 360 deg / (2^lod * 256 px) horizontally
        px_deg_1e7 = int(3_600_000_000 / ((1 << lod) * 256))
        # cast before subtracting: a dateline-spanning envelope's extent
        # (up to 3.6e9 units) overflows int32 under ANSI arithmetic
        keep = (
            (F.col("env_maxlon").cast("long") - F.col("env_minlon").cast("long")
             >= min_px * px_deg_1e7)
            | (F.col("env_maxlat").cast("long") - F.col("env_minlat").cast("long")
               >= min_px * px_deg_1e7)
        )
        out[lod] = (
            df.filter(keep)
            .withColumn(pts, simplified_pts_col(F.col(pts), lod))
            .withColumn("lod", F.lit(lod))
        )
    return out


def lod_for_zoom(zoom: int, lods: list[int]) -> int:
    """The LOD table a render at `zoom` reads: the FINEST lod <= zoom (a
    deeper zoom must never read coarser geometry than available), falling
    back to the coarsest table for zooms below every lod. Pairs
    build_lod_tables (T7) with ingest.render_read (S5): materialize each
    LOD via tiling.materialize_chunk_table, then viewport-fetch from the
    table this picks."""
    if not lods:
        raise ValueError("no lod tables")
    cands = [lv for lv in lods if lv <= zoom]
    return max(cands) if cands else min(lods)


def geom_blob_col(gtype_col, id_col, pts_col) -> Column:
    """Deterministic GenericGeometry-style serialization (the byte-for-byte
    comparison unit, SURVEY §1.2). Single-ring geometries."""

    @F.pandas_udf(BinaryType())
    def _blob(gt: pd.Series, gid: pd.Series, pts: pd.Series) -> pd.Series:
        out = []
        for t, i, geom in zip(gt, gid, pts):
            lat = np.asarray([p["lat"] for p in geom], dtype=np.int32)
            lon = np.asarray([p["lon"] for p in geom], dtype=np.int32)
            out.append(geomblob.encode_geom(int(t), int(i), [(lat, lon)], []))
        return pd.Series(out)

    return _blob(gtype_col, id_col, pts_col)
