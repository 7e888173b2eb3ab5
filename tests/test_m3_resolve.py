"""M3/M4: location-resolution joins + multipolygon assembly + geometry
placement, byte-for-byte vs the mini-COORDS oracle (SURVEY.md §5.3)."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from coords_spark.operators import geometry, multipolygon, resolve
from tests.oracle import minicoords as oracle


@pytest.fixture(scope="module")
def osm(spark, fixture_dir):
    return {
        name: spark.read.parquet(os.path.join(fixture_dir, f"{name}.parquet"))
        for name in ("nodes", "ways", "relations", "ring_ways")
    }


@pytest.fixture(scope="module")
def osm_py(fixture_dir):
    return {
        name: pq.read_table(os.path.join(fixture_dir, f"{name}.parquet")).to_pylist()
        for name in ("nodes", "ways", "relations", "ring_ways")
    }


def test_resolve_ways_matches_oracle(spark, osm, osm_py):
    got = {
        r["way_id"]: [(p["node_id"], p["lat"], p["lon"]) for p in r["pts"]]
        for r in resolve.resolve_ways(osm["ways"], osm["nodes"]).collect()
    }
    nodes = {n["id"]: (n["lat"], n["lon"]) for n in osm_py["nodes"]}
    want = oracle.resolve_ways(nodes, [(w["id"], w["refs"]) for w in osm_py["ways"]])
    want = {wid: [(nid, la, lo) for nid, la, lo in pts] for wid, pts in want.items()}
    assert got == want  # byte-for-byte: same ways, same order, same coords


def test_dangling_refs_none_in_fixture_ways(spark, osm):
    assert resolve.dangling_refs(osm["ways"], osm["nodes"]).count() == 0


def test_reverse_index(spark, osm, osm_py):
    ri = {r["node_id"]: list(r["way_ids"]) for r in resolve.reverse_index(osm["ways"]).collect()}
    want: dict[int, set] = {}
    for w in osm_py["ways"]:
        for ref in w["refs"]:
            want.setdefault(ref, set()).add(w["id"])
    assert len(ri) == len(want)
    for nid, ways in want.items():
        assert ri[nid] == sorted(ways)


def _ring_members(spark, osm):
    rw = osm["ring_ways"].select(F.col("id").alias("way_id"), "pts")
    return resolve.resolve_relation_members(osm["relations"], rw)


def test_dangling_relation_members_reported(spark, osm, osm_py):
    rw = osm["ring_ways"].select(F.col("id").alias("way_id"), "pts")
    got = {
        (r["relation_id"], r["way_id"])
        for r in resolve.dangling_members(osm["relations"], rw).collect()
    }
    want = set()
    ring_ids = {w["id"] for w in osm_py["ring_ways"]}
    for rel in osm_py["relations"]:
        for m in rel["members"]:
            if m["mtype"] == 1 and m["ref"] not in ring_ids:
                want.add((rel["id"], m["ref"]))
    assert got == want
    assert want, "fixture should contain dangling members"


def test_multipolygon_assembly_matches_oracle(spark, osm, osm_py):
    mp = multipolygon.reconstruct_multipolygons(_ring_members(spark, osm))
    got = {}
    for r in mp.collect():
        got.setdefault(r["relation_id"], []).append(
            (
                r["poly_idx"],
                [(p["lat"], p["lon"]) for p in r["outer"]],
                [[(p["lat"], p["lon"]) for p in h] for h in r["inners"]],
            )
        )
    ring_pts = {w["id"]: [(p["lat"], p["lon"]) for p in w["pts"]] for w in osm_py["ring_ways"]}
    want = {}
    n_mp = 0
    for rel in osm_py["relations"]:
        arcs = [
            ring_pts[m["ref"]]
            for m in rel["members"]
            if m["mtype"] == 1 and m["ref"] in ring_pts
        ]
        if not arcs:
            continue
        n_mp += 1
        polys = oracle.oracle_build_polygons(arcs)
        if polys:
            want[rel["id"]] = [
                (i, list(outer), [list(h) for h in holes]) for i, (outer, holes) in enumerate(polys)
            ]
    assert n_mp >= 10
    assert set(got) == set(want)
    for rid in want:
        assert sorted(got[rid]) == sorted(want[rid]), f"relation {rid} differs"
    # holes must exist somewhere in the fixture
    assert any(holes for polys in want.values() for _, _, holes in polys)


def test_envelope_and_geometry_cell_match_oracle(spark, osm, osm_py):
    rw = osm["ring_ways"].select(F.col("id").alias("way_id"), "pts")
    df = geometry.with_geometry_cell(geometry.with_envelope(rw))
    got = {r["way_id"]: (r["env_minlat"], r["env_minlon"], r["env_maxlat"], r["env_maxlon"], r["cell"]) for r in df.collect()}
    for w in osm_py["ring_ways"]:
        pts = [(p["lat"], p["lon"]) for p in w["pts"]]
        lats = [p[0] for p in pts]
        lons = [p[1] for p in pts]
        want_cell = oracle.way_envelope_cell(pts)
        assert got[w["id"]] == (min(lats), min(lons), max(lats), max(lons), want_cell)


def test_lod_simplification_invariants(spark, osm):
    rw = osm["ring_ways"].select(F.col("id").alias("way_id"), "pts")
    df = rw.select(
        "way_id",
        F.size("pts").alias("n0"),
        F.size(geometry.simplified_pts_col(F.col("pts"), 12)).alias("n12"),
        F.size(geometry.simplified_pts_col(F.col("pts"), 4)).alias("n4"),
    )
    rows = df.collect()
    assert all(r["n4"] <= r["n12"] <= r["n0"] for r in rows)
    assert all(r["n4"] >= 2 for r in rows)
    # coarse lod must actually drop points somewhere
    assert sum(r["n0"] - r["n4"] for r in rows) > 0


def test_build_lod_tables(spark, osm):
    rw = osm["ring_ways"].select(F.col("id").alias("way_id"), "pts")
    tabs = geometry.build_lod_tables(rw, [4, 10, 14])
    n14, n10, n4 = tabs[14].count(), tabs[10].count(), tabs[4].count()
    assert n4 <= n10 <= n14 <= rw.count()  # coarser lods drop small features
    assert n14 > 0
    # simplification applied: average vertex count shrinks at coarse lods
    if n4 > 0:
        avg4 = tabs[4].select(F.avg(F.size("pts"))).first()[0]
        avg14 = tabs[14].select(F.avg(F.size("pts"))).first()[0]
        assert avg4 <= avg14
    assert tabs[10].filter(F.col("lod") != 10).count() == 0


def test_geom_blob_roundtrip(spark, osm):
    from coords_spark.kernels import geomblob

    rw = osm["ring_ways"].select(F.col("id").alias("way_id"), "pts").limit(20)
    rows = rw.select(
        "way_id", "pts", geometry.geom_blob_col(F.lit(1), F.col("way_id"), F.col("pts")).alias("blob")
    ).collect()
    for r in rows:
        gtype, gid, rings, tags = geomblob.decode_geom(bytes(r["blob"]))
        assert gtype == 1 and gid == r["way_id"] and tags == []
        np.testing.assert_array_equal(rings[0][0], [p["lat"] for p in r["pts"]])
        np.testing.assert_array_equal(rings[0][1], [p["lon"] for p in r["pts"]])
