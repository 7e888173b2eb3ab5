"""Spatial point-in-polygon enrichment join (SURVEY.md §2.3 J4;
BASELINE.json:6 "ray-casting point-in-polygon tests against admin/coastline
polygons").

Plan shape (broadcast-friendly, scale-safe):

  1. driver-side (polygons are the SMALL dimension — admin/coastline sets
     are O(10^2..10^5) while images are O(10^12)): rasterize each polygon's
     envelope into covering cells at a per-polygon adaptive level (coarsest
     level whose cover is <= max_cover cells);
  2. broadcast equi-join: images match on (level, ancestor(cell, level)) —
     one join per distinct cover level (few), unioned;
  3. exact refine: vectorized numpy ray-cast per candidate pair inside an
     Arrow-batched pandas UDF (polygon rings travel as a managed
     sparkContext.broadcast variable — once per executor, memory-tracked).

No cross join ever materializes; candidate cardinality is bounded by cover
selectivity. Refinement is exact, so cover-level choice affects cost only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

from coords_spark.kernels import mercator, pip, zcurve
from coords_spark.operators.cells import ancestor_expr


def _poly_grid_rings(poly: dict) -> tuple[np.ndarray, np.ndarray, list]:
    """outer/inners from a polygon row -> mercator grid coordinate arrays."""

    def ring_xy(pts):
        lat = np.asarray([p["lat"] for p in pts], dtype=np.int64)
        lon = np.asarray([p["lon"] for p in pts], dtype=np.int64)
        ux, uy = mercator.latlon_i32_to_unit(lat, lon)
        return ux * zcurve.GRID, uy * zcurve.GRID

    ox, oy = ring_xy(poly["outer"])
    inners = [ring_xy(h) for h in (poly["inners"] or [])]
    return ox, oy, inners


def build_polygon_cover(polygons: list[dict], max_cover: int = 64) -> tuple[list[dict], dict]:
    """polygons: collected rows with (poly_id, outer, inners). Returns
    (cover rows [{poly_id, level, cover_cell}], {poly_id: grid rings})."""
    cover_rows = []
    rings_by_id = {}
    for poly in polygons:
        ox, oy, inners = _poly_grid_rings(poly)
        rings_by_id[int(poly["poly_id"])] = (ox, oy, inners)
        gx0, gx1 = int(ox.min()), int(ox.max())
        gy0, gy1 = int(oy.min()), int(oy.max())
        level = zcurve.MAX_LEVEL
        while level > 0:
            shift = zcurve.MAX_LEVEL - level
            n = ((gx1 >> shift) - (gx0 >> shift) + 1) * ((gy1 >> shift) - (gy0 >> shift) + 1)
            if n <= max_cover:
                break
            level -= 1
        cells = zcurve.cover_envelope(gx0, gy0, gx1, gy1, level)
        for c in cells.tolist():
            cover_rows.append({"poly_id": int(poly["poly_id"]), "level": level, "cover_cell": c})
    return cover_rows, rings_by_id


def pip_enrich(
    points: DataFrame,
    polygons: DataFrame,
    max_cover: int = 64,
    point_key: str = "image_id",
) -> DataFrame:
    """points: needs (point_key, lat, lon, cell at MAX or any level >= cover
    levels — we require `cell` at MAX_LEVEL via grid coords); polygons:
    (poly_id, outer, inners). Returns (point_key, poly_id) containment pairs."""
    spark = points.sparkSession
    polys = polygons.select("poly_id", "outer", "inners").collect()
    cover_rows, rings_by_id = build_polygon_cover([r.asDict() for r in polys], max_cover)
    cover = spark.createDataFrame(
        pd.DataFrame(cover_rows), "poly_id long, level int, cover_cell long"
    )
    levels = sorted({r["level"] for r in cover_rows})
    # Ship the ring payload as a managed broadcast variable, NOT a task
    # closure: torrent-distributed once per executor and memory-tracked,
    # so a large polygon set doesn't ride along with every task launch.
    rings_bc = spark.sparkContext.broadcast(rings_by_id)

    # candidates: one broadcast equi-join per distinct cover level
    pts = points.select(point_key, "lat", "lon", "cell")
    cands = None
    for lv in levels:
        c_lv = cover.filter(F.col("level") == lv).select("poly_id", "cover_cell")
        p_lv = pts.withColumn("cover_cell", ancestor_expr("cell", lv))
        j = p_lv.join(F.broadcast(c_lv), "cover_cell").select(point_key, "lat", "lon", "poly_id")
        cands = j if cands is None else cands.unionAll(j)
    if cands is None:
        return spark.createDataFrame([], f"{point_key} string, poly_id long")

    @F.pandas_udf(BooleanType())
    def _inside(lat: pd.Series, lon: pd.Series, pid: pd.Series) -> pd.Series:
        rings = rings_bc.value
        la = lat.to_numpy()
        lo = lon.to_numpy()
        pids = pid.to_numpy()
        ux, uy = mercator.latlon_i32_to_unit(la, lo)
        px = ux * zcurve.GRID
        py = uy * zcurve.GRID
        out = np.zeros(len(la), dtype=bool)
        for p in np.unique(pids):
            sel = pids == p
            ox, oy, inners = rings[int(p)]
            out[sel] = pip.points_in_polygon(px[sel], py[sel], ox, oy, inners)
        return pd.Series(out)

    return cands.filter(_inside(F.col("lat"), F.col("lon"), F.col("poly_id"))).select(
        point_key, "poly_id"
    )
