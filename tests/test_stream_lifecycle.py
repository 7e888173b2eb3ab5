"""Auto-lifecycle in the continuous update stream (VERDICT r6 ask #5):
every Nth micro-batch compacts + expires every table the stream
fragments. Over a long stream the file and snapshot counts must stay
BOUNDED while content stays identical to a maintenance-free run."""

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from coords_spark.fixtures import gen_update_world
from coords_spark.operators import entity_store as ES
from coords_spark.operators import geometry, resolve, tiling, update
from coords_spark.operators import rindex as RI
from coords_spark.operators.update import _locator_path
from coords_spark.sources.icepick import IcepickTable
from coords_spark.streaming import update_stream as US

NODES_SCHEMA = "id long, version int, lat int, lon int, tags map<string,string>"
WAYS_SCHEMA = "id long, version int, refs array<long>, tags map<string,string>"
RELS_SCHEMA = (
    "id long, version int, "
    "members array<struct<mtype: tinyint, ref: long, role: string>>, "
    "tags map<string,string>"
)

N_BATCHES = 21
MAINT_EVERY = 7


def _mk_world(spark, d):
    nodes_rows, ways_rows, rels_rows = gen_update_world(6)
    nodes = spark.createDataFrame(nodes_rows, NODES_SCHEMA).localCheckpoint()
    ways = spark.createDataFrame(ways_rows, WAYS_SCHEMA).localCheckpoint()
    rels = spark.createDataFrame(rels_rows, RELS_SCHEMA).localCheckpoint()
    stores = {k: str(d / f"store_{k}") for k in ("nodes", "ways", "rels")}
    ES.build_entity_store(nodes, stores["nodes"], id_shift=6)
    ES.build_entity_store(ways, stores["ways"], id_shift=3)
    ES.build_entity_store(rels, stores["rels"], id_shift=2)
    g = geometry.with_geometry_cell(
        geometry.with_envelope(resolve.resolve_ways(ways, nodes))
    ).withColumn("nbytes", (F.size("pts") * 8 + 64).cast("long"))
    split = tiling.compute_split_set(g, max_bytes=4 * 1024)
    way_table = str(d / "waychunks")
    update.build_way_chunk_table(
        spark, nodes, ways, way_table, split, locator_id_shift=3
    )
    rix = str(d / "rindex_nw")
    RI.build_rindex_store(spark, ways.select("id", "refs"), rix, id_shift=6)
    return stores, way_table, rix, nodes_rows


def _diff_batches(nodes_rows):
    """N_BATCHES one-node-move diffs cycling over a handful of nodes —
    every batch dirties the same ways repeatedly, the worst fragmentation
    pattern (each apply lands a rewrite generation + 2 locator commits)."""
    ids = [r[0] for r in nodes_rows][:5]
    out = []
    by_id = {r[0]: r for r in nodes_rows}
    for b in range(N_BATCHES):
        nid = ids[b % len(ids)]
        base = by_id[nid]
        out.append(
            [
                (
                    0, "upsert", nid, 2 + b,
                    base[2] + 10_000 * (b + 1), base[3] - 7_000 * (b + 1),
                    None, None, {},
                )
            ]
        )
    return out


def _write_batches(spark, tmp, batches):
    diff_dir = str(tmp / "diffs")
    os.makedirs(diff_dir)
    for i, rows in enumerate(batches):
        stage = str(tmp / f"stage{i}")
        spark.createDataFrame(rows, US.DIFF_SCHEMA).coalesce(1).write.parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        dst = os.path.join(diff_dir, f"b-{i:04d}.parquet")
        shutil.move(part, dst)
        os.utime(dst, (1_000_000 + i, 1_000_000 + i))
    return diff_dir


def _store_rows(spark, path, cols):
    return sorted(
        tuple(r)
        for r in ES.read_entity_store(spark, path).selectExpr(*cols).collect()
    )


def _table_rows(spark, path):
    return sorted(
        tuple(r)
        for r in spark.read.parquet(*IcepickTable(path).data_paths())
        .selectExpr("way_id", "chunk_id", "to_json(pts) as p")
        .collect()
    )


def test_long_stream_maintenance_bounds_files(spark, tmp_path):
    batches = None
    results = {}
    for label, maint in (("plain", None), ("maint", MAINT_EVERY)):
        d = tmp_path / label
        d.mkdir()
        stores, way_table, rix, nodes_rows = _mk_world(spark, d)
        if batches is None:
            batches = _diff_batches(nodes_rows)
        diff_dir = _write_batches(spark, d, batches)
        q = US.stream_apply_diffs(
            US.stream_diffs_from_dir(spark, diff_dir),
            stores["nodes"], stores["ways"], stores["rels"],
            way_table, None,
            checkpoint_dir=str(d / "ckpt"),
            rindex_store=rix,
            maintenance_every=maint,
            maintenance_keep=2,
        )
        q.processAllAvailable()
        q.stop()
        results[label] = (d, stores, way_table, rix, diff_dir)

    # content identical: maintenance must never change what a read sees
    for k, cols in (
        ("nodes", ["id", "version", "lat", "lon"]),
        ("ways", ["id", "version", "to_json(refs) as r"]),
    ):
        assert _store_rows(spark, results["plain"][1][k], cols) == _store_rows(
            spark, results["maint"][1][k], cols
        ), k
    assert _table_rows(spark, results["plain"][2]) == _table_rows(
        spark, results["maint"][2]
    )

    # file + snapshot counts BOUNDED under maintenance, growing without
    maintained = [
        results["maint"][1]["nodes"], results["maint"][2],
        _locator_path(results["maint"][2]), results["maint"][3],
    ]
    plain = [
        results["plain"][1]["nodes"], results["plain"][2],
        _locator_path(results["plain"][2]), results["plain"][3],
    ]
    for i, (pm, pp) in enumerate(zip(maintained, plain)):
        tm, tp_ = IcepickTable(pm), IcepickTable(pp)
        # node-only diffs never commit to the rindex store (index 3) — it
        # stays at its build version in BOTH runs; the per-batch committers
        # (store, table, locator) must shrink strictly under maintenance
        if i == 3:
            assert len(tm.files()) <= len(tp_.files()), pm
            assert len(tm.versions()) <= len(tp_.versions()), pm
        else:
            # r8: a diff-sized rewrite stages its whole touched range as
            # ONE merged file, so in this tiny world the un-maintained
            # table no longer fragments its live file count — snapshots
            # remain the unbounded-growth axis maintenance must cap
            assert len(tm.files()) <= len(tp_.files()), pm
            # snapshots: expiry keeps 2 manifests + the few commits since
            # the last sweep; the plain run accumulates one per commit
            assert len(tm.versions()) < len(tp_.versions()), pm
        assert len(tm.versions()) <= 2 + 3 * (MAINT_EVERY + 1)
        # on-disk data files are actually reclaimed, not just delisted
        disk = [n for n in os.listdir(tm.data_dir) if n.startswith("part-")]
        assert len(disk) <= len(tm.files()) + 4, pm

    # exactly-once across maintenance: a fresh stream over the same
    # checkpoint adds zero new versions anywhere
    d, stores, way_table, rix, diff_dir = results["maint"]
    versions = {
        p: IcepickTable(p).current_manifest()["version"]
        for p in (*stores.values(), way_table, rix, _locator_path(way_table))
    }
    q2 = US.stream_apply_diffs(
        US.stream_diffs_from_dir(spark, diff_dir),
        stores["nodes"], stores["ways"], stores["rels"],
        way_table, None,
        checkpoint_dir=str(d / "ckpt"),
        rindex_store=rix,
        maintenance_every=MAINT_EVERY,
        maintenance_keep=2,
    )
    q2.processAllAvailable()
    q2.stop()
    for p, v in versions.items():
        assert IcepickTable(p).current_manifest()["version"] == v, p
