"""Spatial point-in-polygon enrichment join (SURVEY.md §2.3 J4;
BASELINE.json:6 "ray-casting point-in-polygon tests against admin/coastline
polygons").

Plan shape (fully distributed, scale-safe — r3 rework of the r2 version
whose cover rasterization was a driver-side loop over collect()ed rows):

  1. cover generation: each polygon's envelope is rasterized into covering
     cells at a per-polygon adaptive level (coarsest level whose cover is
     <= max_cover cells) INSIDE an Arrow-batched mapInPandas over the
     polygons DataFrame — the driver never touches ring payloads; only the
     DISTINCT COVER LEVELS (bounded by tree depth <= zcurve.MAX_LEVEL) are
     collected for join planning;
  2. candidates: ONE broadcast equi-join on (level, ancestor(cell, level))
     — points explode over the distinct cover levels (bounded by tree
     depth) and the polygons are the SMALL broadcast dimension:
     admin/coastline sets are O(10^2..10^5) while images are O(10^12);
  3. exact refine: candidates COGROUP with the polygon rings on
     (poly_id, salt) — ring payloads travel through the shuffle `salt`
     times per polygon (not per candidate row, and never as a driver-built
     broadcast dict), and the vectorized numpy ray-cast runs per
     (polygon, salt, candidate-batch) group. The salt (default 8) spreads
     a mega-polygon's candidates over `salt` tasks — applyInPandas
     materializes whole groups, so an unsalted continent-scale polygon
     would otherwise concentrate its entire candidate set in one task.

No cross join ever materializes; candidate cardinality is bounded by cover
selectivity. Refinement is exact, so cover-level choice affects cost only
and the result set is salt-invariant (the ray-cast is per-row).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from coords_spark.kernels import mercator, pip, zcurve
from coords_spark.operators.cells import ancestor_expr_col

COVER_SCHEMA = "poly_id long, level int, cover_cell long"


def _ring_xy(pts) -> tuple[np.ndarray, np.ndarray]:
    """One ring (sequence of {lat, lon} rows) -> mercator grid coords."""
    lat = np.asarray([p["lat"] for p in pts], dtype=np.int64)
    lon = np.asarray([p["lon"] for p in pts], dtype=np.int64)
    ux, uy = mercator.latlon_i32_to_unit(lat, lon)
    return ux * zcurve.GRID, uy * zcurve.GRID


def _poly_grid_rings(outer, inners) -> tuple[np.ndarray, np.ndarray, list]:
    # Arrow hands list columns to pandas as numpy arrays — no truthiness
    holes = [] if inners is None else list(inners)
    return (*_ring_xy(outer), [_ring_xy(h) for h in holes])


def _cover_cells(ox: np.ndarray, oy: np.ndarray, max_cover: int) -> tuple[int, np.ndarray]:
    """(level, cells): coarsest level whose envelope cover fits max_cover."""
    gx0, gx1 = int(ox.min()), int(ox.max())
    gy0, gy1 = int(oy.min()), int(oy.max())
    level = zcurve.MAX_LEVEL
    while level > 0:
        shift = zcurve.MAX_LEVEL - level
        n = ((gx1 >> shift) - (gx0 >> shift) + 1) * ((gy1 >> shift) - (gy0 >> shift) + 1)
        if n <= max_cover:
            break
        level -= 1
    return level, zcurve.cover_envelope(gx0, gy0, gx1, gy1, level)


def polygon_covers(polygons: DataFrame, max_cover: int = 64) -> DataFrame:
    """(poly_id, level, cover_cell) rows, rasterized DISTRIBUTED: the
    per-polygon adaptive-level envelope cover runs inside mapInPandas over
    the polygons DataFrame with the same zcurve kernels the driver loop
    used in r2 — identical output, no driver-side per-polygon Python."""

    def gen(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            pids: list[int] = []
            levels: list[int] = []
            cells: list[int] = []
            for pid, outer in zip(pdf["poly_id"], pdf["outer"]):
                ox, oy = _ring_xy(outer)
                level, cc = _cover_cells(ox, oy, max_cover)
                cc = cc.tolist()
                pids.extend([int(pid)] * len(cc))
                levels.extend([level] * len(cc))
                cells.extend(cc)
            yield pd.DataFrame({"poly_id": pids, "level": levels, "cover_cell": cells})

    return polygons.select("poly_id", "outer").mapInPandas(gen, COVER_SCHEMA)


def pip_enrich(
    points: DataFrame,
    polygons: DataFrame,
    max_cover: int = 64,
    point_key: str = "image_id",
    salt: int = 8,
) -> DataFrame:
    """points: needs (point_key, lat, lon, cell at MAX_LEVEL via grid
    coords); polygons: (poly_id, outer, inners). Returns (point_key,
    poly_id) containment pairs (outer ring minus holes, even-odd rule).

    r4 plan changes:
      * ONE broadcast equi-join on (level, cover_cell) — points explode
        over the distinct cover levels (bounded by tree depth, typically
        1-3) and compute the variable-level ancestor JVM-side; the r3 loop
        of one-join-per-level + unionAll needed a leaked .cache() on the
        cover to avoid recomputing it per level;
      * the refine cogroup key is (poly_id, _salt) with _salt =
        pmod(xxhash64(point_key), salt) and each ring row replicated
        `salt` ways — a continent-scale polygon that attracts a huge share
        of candidates now spreads over `salt` tasks instead of
        concentrating in one (applyInPandas materializes whole groups).
        The result set is salt-invariant: the ray-cast is per-row."""
    spark = points.sparkSession
    key_type = points.schema[point_key].dataType.simpleString()
    out_schema = f"{point_key} {key_type}, poly_id long"
    salt = max(1, int(salt))

    # the cover is a small dim (poly_count x <= max_cover rows, never ring
    # payloads); it is evaluated twice (level-set collect + the join) —
    # cheaper than a session-lifetime .cache() leak
    cover = polygon_covers(polygons, max_cover)
    levels = sorted(r["level"] for r in cover.select("level").distinct().collect())
    if not levels:
        return spark.createDataFrame([], out_schema)

    lv_arr = ",".join(str(lv) for lv in levels)
    pts = points.select(point_key, "lat", "lon", "cell")
    p = pts.select(
        "*", F.explode(F.expr(f"array({lv_arr})")).alias("level")
    ).withColumn("cover_cell", ancestor_expr_col("cell", "level"))
    cands = p.join(F.broadcast(cover), ["level", "cover_cell"]).select(
        point_key, "lat", "lon", "poly_id"
    )
    cands = cands.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(point_key)), F.lit(salt)).cast("int")
    )

    # exact refine: rings meet their candidate points via COGROUP on
    # (poly_id, _salt) — each ring payload crosses the shuffle `salt` times
    # (still never per candidate row, never a driver-built broadcast dict)
    rings = polygons.select("poly_id", "outer", "inners").withColumn(
        "_salt", F.explode(F.expr(f"sequence(0, {salt - 1})"))
    )

    def refine(cand_pdf: pd.DataFrame, poly_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(cand_pdf) == 0 or len(poly_pdf) == 0:
            return pd.DataFrame({point_key: [], "poly_id": []})
        ox, oy, inners = _poly_grid_rings(
            poly_pdf["outer"].iloc[0], poly_pdf["inners"].iloc[0]
        )
        la = cand_pdf["lat"].to_numpy()
        lo = cand_pdf["lon"].to_numpy()
        ux, uy = mercator.latlon_i32_to_unit(la, lo)
        mask = pip.points_in_polygon(ux * zcurve.GRID, uy * zcurve.GRID, ox, oy, inners)
        return pd.DataFrame(
            {
                point_key: cand_pdf[point_key].to_numpy()[mask],
                "poly_id": cand_pdf["poly_id"].to_numpy()[mask],
            }
        )

    return (
        cands.groupBy("poly_id", "_salt")
        .cogroup(rings.groupBy("poly_id", "_salt"))
        .applyInPandas(refine, out_schema)
    )
