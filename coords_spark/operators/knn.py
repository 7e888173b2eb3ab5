"""Cell-ring-expansion kNN lookup (SURVEY.md §2.3 J5, §2.6 W2;
BASELINE.json:6 "cell-ring-expansion kNN lookup").

Distance metric: euclidean in web-mercator grid units (documented choice —
monotone with true distance locally, and it makes the ring-termination
bound EXACT: every point outside disk(q, r) at the search level is at
least (r-1) * cell_size grid units away in Chebyshev, hence also in
euclidean).

Algorithm (per round, ALL still-pending queries advance together in ONE
Spark job):
  1. each query holds a disk radius r (cells at `level`);
  2. candidates = points whose level-cell is in any pending query's disk
     (broadcast equi-join on cell — no cross join, no full scan ranking);
  3. exact distances + per-query top-k via window;
  4. a query FINISHES when kth_dist <= (r-1) * cell_size (the guarantee
     that no unseen point can beat rank k) — otherwise its radius doubles.

Queries are the small broadcast side (viewport lookups); points are the
10^12-row side, always touched via cell equality + partition pruning.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType
from pyspark.sql.window import Window

from coords_spark.kernels import mercator, zcurve


def cell_at_level_col(level: int, lat: str = "lat", lon: str = "lon"):
    """lat/lon -> cell at `level` (fused Arrow UDF)."""

    @F.pandas_udf(LongType())
    def _c(la: pd.Series, lo: pd.Series) -> pd.Series:
        ux, uy = mercator.latlon_i32_to_unit(la.to_numpy(), lo.to_numpy())
        gx, gy = zcurve.unit_to_grid(ux, uy)
        return pd.Series(zcurve.cell_from_point(gx, gy, level).astype("int64"))

    return _c(F.col(lat), F.col(lon))


def _dist_units_col():
    @F.pandas_udf(DoubleType())
    def _d(la: pd.Series, lo: pd.Series, qgx: pd.Series, qgy: pd.Series) -> pd.Series:
        ux, uy = mercator.latlon_i32_to_unit(la.to_numpy(), lo.to_numpy())
        gx, gy = zcurve.unit_to_grid(ux, uy)
        dx = (gx - qgx.to_numpy()).astype(np.float64)
        dy = (gy - qgy.to_numpy()).astype(np.float64)
        return pd.Series(np.hypot(dx, dy))

    return _d(F.col("lat"), F.col("lon"), F.col("qgx"), F.col("qgy"))


def knn_join(
    points: DataFrame,
    queries: list[tuple[str, int, int]],
    k: int,
    level: int = 12,
    point_key: str = "image_id",
    max_rounds: int = 16,
    max_queries: int = 2000,
) -> DataFrame:
    """points: (point_key, lat, lon); queries: [(qid, lat_i32, lon_i32)].
    Returns (qid, rank, <point_key>, dist_units), rank 1..k by mercator-grid
    euclidean distance, ties broken by key. Exact (brute-force-equivalent)
    by the disk-guarantee rule above.

    SCOPE BOUNDARY (r3 verdict #8): this is a VIEWPORT-LOOKUP operator —
    the query list is the small driver-side dimension. Driver-side state is
    bounded by k x |queries| result rows plus max_disk_cells x |queries|
    broadcast disk cells per round; it is NOT a query-table join. For large
    query SETS (>= ~10^3 points) use the fully distributed
    similarity.ann_topk_join / similarity.ivf_topk_join shape instead
    (vectors keyed by bucket/cell, queries exploded over probes, one
    equi-join, per-query window top-k — nothing query-proportional ever
    materializes on the driver)."""
    # max_queries bounds DRIVER memory (result rows + broadcast disk cells
    # are O(|queries|)); it is a keyword so callers with bigger/smaller
    # driver budgets can opt up or down (ADVICE r4) — the guidance to route
    # large sets to the distributed ANN joins stands regardless.
    if len(queries) > max_queries:
        raise ValueError(
            f"knn_join is a viewport-lookup operator ({len(queries)} queries "
            f"given, max_queries={max_queries}); route large query sets to "
            "similarity.ann_topk_join / ivf_topk_join (fully distributed), "
            "or raise max_queries= if your driver memory allows"
        )
    spark = points.sparkSession
    cell_size = 1 << (zcurve.MAX_LEVEL - level)
    grid_cells = 1 << level

    lat = np.asarray([q[1] for q in queries], dtype=np.int64)
    lon = np.asarray([q[2] for q in queries], dtype=np.int64)
    ux, uy = mercator.latlon_i32_to_unit(lat, lon)
    gx, gy = zcurve.unit_to_grid(ux, uy)

    pts = points.select(point_key, "lat", "lon").withColumn(
        "qcell", cell_at_level_col(level)
    )

    results: list[tuple] = []
    pending = {str(q[0]): (int(gx[i]), int(gy[i]), 1) for i, q in enumerate(queries)}
    # disk-size cap: a query whose disk would exceed this many cells (points
    # are that sparse around it) drops to a full-scan exact rank instead of
    # materializing a huge broadcast cell list
    max_disk_cells = 50_000
    fallback: dict[str, tuple[int, int]] = {}
    for _ in range(max_rounds):
        if not pending:
            break
        disk_rows = []
        for qid, (qx, qy, r) in list(pending.items()):
            rr = min(r, grid_cells)
            if (2 * rr + 1) ** 2 > max_disk_cells:
                fallback[qid] = (qx, qy)
                del pending[qid]
                continue
            qcell = int(zcurve.cell_from_point(qx, qy, level))
            for c in zcurve.cell_disk(qcell, rr).tolist():
                disk_rows.append((qid, c, qx, qy))
        if not disk_rows:
            break
        disks = spark.createDataFrame(
            pd.DataFrame(disk_rows, columns=["qid", "qcell", "qgx", "qgy"]).drop_duplicates(),
            "qid string, qcell long, qgx long, qgy long",
        )
        cand = pts.join(F.broadcast(disks), "qcell").withColumn("dist", _dist_units_col())
        w = Window.partitionBy("qid").orderBy("dist", point_key)
        rows = (
            cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "rank", point_key, "dist")
            .collect()
        )
        got: dict[str, list] = {}
        for row in rows:
            got.setdefault(row["qid"], []).append(row)
        nxt = {}
        for qid, (qx, qy, r) in pending.items():
            rows_q = sorted(got.get(qid, []), key=lambda x: x["rank"])
            whole_grid = r >= 2 * grid_cells  # disk covers every cell
            guarantee = (r - 1) * cell_size
            if len(rows_q) >= k and rows_q[k - 1]["dist"] <= guarantee:
                results.extend((qid, x["rank"], x[point_key], float(x["dist"])) for x in rows_q)
            elif whole_grid:
                results.extend((qid, x["rank"], x[point_key], float(x["dist"])) for x in rows_q)
            else:
                nxt[qid] = (qx, qy, r * 2)
        pending = nxt
    if pending:
        fallback.update({qid: (qx, qy) for qid, (qx, qy, _r) in pending.items()})
    if fallback:
        # exact full-scan ranking for the sparse stragglers — ONE job for
        # all of them (broadcast query set, window top-k)
        fq = spark.createDataFrame(
            pd.DataFrame(
                [(qid, qx, qy) for qid, (qx, qy) in fallback.items()],
                columns=["qid", "qgx", "qgy"],
            ),
            "qid string, qgx long, qgy long",
        )
        cand = points.select(point_key, "lat", "lon").crossJoin(F.broadcast(fq)).withColumn(
            "dist", _dist_units_col()
        )
        w = Window.partitionBy("qid").orderBy("dist", point_key)
        rows = (
            cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "rank", point_key, "dist")
            .collect()
        )
        results.extend((r["qid"], r["rank"], r[point_key], float(r["dist"])) for r in rows)
    return spark.createDataFrame(
        pd.DataFrame(results, columns=["qid", "rank", point_key, "dist_units"]),
        f"qid string, rank int, {point_key} string, dist_units double",
    )
