"""icepick table-format unit tests (no Spark): atomic commits, crash
snapshot isolation, pruning, checksum verification."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from coords_spark.sources.icepick import IcepickTable


def _stage(tmp_path, name, chunk_ids):
    d = tmp_path / name
    d.mkdir()
    pq.write_table(
        pa.table({"chunk_id": pa.array(chunk_ids, pa.int64()), "v": list(range(len(chunk_ids)))}),
        str(d / "part-0.parquet"),
    )
    return str(d)


def test_commit_and_lineage(tmp_path):
    t = IcepickTable.create(str(tmp_path / "t"))
    entries = t.commit_staged(_stage(tmp_path, "s1", [5, 7, 9]), group="g1")
    assert len(entries) == 1
    e = entries[0]
    assert e["rows"] == 3 and e["chunk_min"] == 5 and e["chunk_max"] == 9
    assert e["checksum"].startswith("sha256:")
    assert t.committed_groups() == {"g1"}
    assert t.total_rows() == 3
    assert t.verify_checksums()


def test_append_commits_and_pruning(tmp_path):
    t = IcepickTable.create(str(tmp_path / "t"))
    t.commit_staged(_stage(tmp_path, "s1", [1, 2]), group="a")
    t.commit_staged(_stage(tmp_path, "s2", [100, 200]), group="b")
    assert t.total_rows() == 4
    assert len(t.data_paths()) == 2
    assert len(t.data_paths(chunk_min=50)) == 1  # first file pruned
    assert len(t.data_paths(chunk_max=50)) == 1  # second file pruned
    assert len(t.data_paths(chunk_min=150, chunk_max=160)) == 1  # overlap rule


def test_crash_before_current_swap_keeps_old_snapshot(tmp_path):
    t = IcepickTable.create(str(tmp_path / "t"))
    t.commit_staged(_stage(tmp_path, "s1", [1]), group="a")
    v1 = t.current_manifest()["version"]
    # simulate a crash: a newer manifest file exists but CURRENT not swapped
    man = t.current_manifest()
    man["version"] += 1
    man["files"] = man["files"] + [{"path": "data/ghost.parquet", "rows": 99, "chunk_min": 0, "chunk_max": 0, "checksum": "sha256:x", "group": "ghost"}]
    with open(os.path.join(t.manifest_dir, f"manifest-{man['version']:06d}.json"), "w") as f:
        json.dump(man, f)
    # reader still sees the old snapshot
    assert t.current_manifest()["version"] == v1
    assert t.total_rows() == 1
    assert "ghost" not in t.committed_groups()


def test_empty_group_marking(tmp_path):
    t = IcepickTable.create(str(tmp_path / "t"))
    t.mark_group_committed("empty1")
    assert t.committed_groups() == {"empty1"}
    assert t.total_rows() == 0


def test_checksum_detects_tamper(tmp_path):
    t = IcepickTable.create(str(tmp_path / "t"))
    t.commit_staged(_stage(tmp_path, "s1", [1, 2, 3]), group="a")
    path = t.data_paths()[0]
    with open(path, "r+b") as f:
        f.seek(10)
        f.write(b"\x00\x00")
    assert not t.verify_checksums()


def test_time_travel_snapshots(tmp_path):
    """Every commit writes an immutable manifest; readers can pin any
    version (snapshot isolation) while the table keeps growing."""
    t = IcepickTable.create(str(tmp_path / "tt"))
    t.commit_staged(_stage(tmp_path, "v1", [1, 2]), group="g1")
    t.commit_staged(_stage(tmp_path, "v2", [3, 4, 5]), group="g2")
    t.commit_staged(_stage(tmp_path, "v3", [6]), group="g3")
    assert t.versions() == [0, 1, 2, 3]
    assert len(t.files(version=0)) == 0
    assert len(t.files(version=1)) == 1
    assert len(t.files(version=2)) == 2
    assert len(t.files()) == 3
    # snapshot-pinned reads see only that version's files
    assert len(t.data_paths(version=1)) == 1
    assert len(t.data_paths()) == 3
    # range pruning composes with time travel
    assert len(t.data_paths(chunk_min=3, chunk_max=5, version=1)) == 0
    assert len(t.data_paths(chunk_min=3, chunk_max=5, version=2)) == 1
    import pytest as _pt

    with _pt.raises(FileNotFoundError):
        t.manifest_at(99)


def test_manifest_stored_schema(tmp_path):
    """Schema is stamped into the manifest at commit and readable without
    touching any data file (VERDICT r4 ask #8)."""
    t = IcepickTable.create(str(tmp_path / "sch"))
    assert t.arrow_schema() is None  # empty table, never stamped
    t.commit_staged(_stage(tmp_path, "s1", [1, 2]), group="g1")
    s = t.arrow_schema()
    assert s is not None and s.names == ["chunk_id", "v"]
    # delete every data file: schema must STILL be readable (manifest-only)
    for e in t.files():
        os.remove(os.path.join(t.path, e["path"]))
    s2 = t.arrow_schema()
    assert s2.equals(s)
    # version pinning: the schema travels with each stamped manifest
    assert t.arrow_schema(version=1).equals(s)


def test_empty_viewport_render_read_plans_zero_file_scans(spark, tmp_path):
    """A viewport overlapping no chunk range must return an empty DF with
    the table schema whose physical plan contains NO parquet scan (schema
    comes from the manifest, VERDICT r4 ask #8)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from coords_spark.kernels import mercator, zcurve
    from coords_spark.operators import ingest

    # a table holding ONE deep chunk under London (level 12): a south-
    # pacific viewport's cover ranges (its own ancestors + pacific deep
    # cells) cannot overlap it -> guaranteed manifest miss
    ux, uy = mercator.latlon_i32_to_unit(
        np.asarray([int(51.5e7)]), np.asarray([int(-0.1e7)])
    )
    gx, gy = zcurve.unit_to_grid(ux, uy)
    london = int(zcurve.cell_from_point(gx, gy, 12)[0])
    d = tmp_path / "stage"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "image_id": pa.array(["a", "b"], pa.string()),
                "lat": pa.array([int(51.5e7)] * 2, pa.int32()),
                "lon": pa.array([int(-0.1e7)] * 2, pa.int32()),
                "chunk_id": pa.array([london] * 2, pa.int64()),
            }
        ),
        str(d / "part-0.parquet"),
    )
    path = str(tmp_path / "ptable")
    t = IcepickTable.create(path)
    t.commit_staged(str(d), group="g1")
    full = ingest.read_chunk_table(spark, path)
    bbox = (int(-48.0e7), int(-123.0e7), int(-47.9999e7), int(-122.9999e7))
    # precondition: the manifest really prunes everything
    g = ingest.bbox_grid(*bbox)
    ranges = zcurve.bbox_cover_ranges(*g, 12, max_level=12)
    assert t.data_paths_ranges(ranges) == []
    miss = ingest.render_read(spark, path, bbox, zoom=12, base_level=12)
    assert miss.count() == 0
    assert miss.schema == full.schema
    plan = miss._jdf.queryExecution().executedPlan().toString()
    assert "FileScan" not in plan and "parquet" not in plan.lower()
