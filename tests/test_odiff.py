"""O(diff) continuous updates (VERDICT r6 ask #1): with the persistent
reverse-index stores (operators/rindex.py) and per-table locator sidecars
(operators/update.py), a diff batch's PLAN reads a number of store files
bounded by the diff's blast radius — growing the world must not grow the
per-batch file reads — while results stay byte-identical to the legacy
full-scan path. Locator staleness (crash-window supersets) must only widen
reads, never lose rows, and must self-heal on the next touch."""

import pytest
from pyspark.sql import functions as F

from coords_spark.fixtures import gen_update_diffs, gen_update_world
from coords_spark.operators import entity_store as ES
from coords_spark.operators import geometry, resolve, tiling, update
from coords_spark.operators import rindex as RI
from coords_spark.sources.icepick import IcepickTable
from coords_spark.streaming import update_stream as US

NODES_SCHEMA = "id long, version int, lat int, lon int, tags map<string,string>"
WAYS_SCHEMA = "id long, version int, refs array<long>, tags map<string,string>"
RELS_SCHEMA = (
    "id long, version int, "
    "members array<struct<mtype: tinyint, ref: long, role: string>>, "
    "tags map<string,string>"
)
_MEMBER_REFS = "transform(filter(members, m -> m.mtype = 1), m -> m.ref)"


def _build_world(spark, d, n_rel, with_rindex):
    """Stores + derived tables for an n_rel world; optionally the two
    reverse-index stores. Small id shifts -> many id-range files, so
    pruning evidence is real."""
    nodes_rows, ways_rows, rels_rows = gen_update_world(n_rel)
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
    split = tiling.compute_split_set(
        g, max_bytes=4 * 1024, base_level=tiling.DEFAULT_BASE_LEVEL
    )
    way_table = str(d / "waychunks")
    update.build_way_chunk_table(
        spark, nodes, ways, way_table, split, locator_id_shift=3
    )
    rel_table = str(d / "relchunks")
    update.build_relation_chunk_table(
        spark, rels, resolve.resolve_ways(ways, nodes), rel_table, split,
        locator_id_shift=2,
    )
    kw = {}
    if with_rindex:
        kw["rindex_store"] = str(d / "rindex_nw")
        RI.build_rindex_store(
            spark, ways.select("id", "refs"), kw["rindex_store"], id_shift=6
        )
        kw["rel_rindex_store"] = str(d / "rindex_wr")
        RI.build_rindex_store(
            spark,
            rels.select("id", F.expr(_MEMBER_REFS).alias("refs")),
            kw["rel_rindex_store"],
            ref_col="way_id",
            ids_col="relation_ids",
            id_shift=3,
        )
    return stores, way_table, rel_table, kw


def _batches(spark):
    b1, b2 = gen_update_diffs(*gen_update_world(10))
    return (
        spark.createDataFrame(b1, US.DIFF_SCHEMA),
        spark.createDataFrame(b2, US.DIFF_SCHEMA),
    )


def _rows(spark, path, cols):
    paths = IcepickTable(path).data_paths()
    if not paths:
        return []
    return sorted(tuple(r) for r in spark.read.parquet(*paths).selectExpr(*cols).collect())


WAY_COLS = ["way_id", "chunk_id", "to_json(pts) as p"]
REL_COLS = [
    "relation_id", "poly_idx", "chunk_id", "to_json(outer) as o", "to_json(inners) as i"
]


def _apply_all(spark, tmp, stores, way_table, rel_table, kw):
    b1, b2 = _batches(spark)
    dirty = str(tmp / "dirty")
    stats = []
    for i, b in enumerate((b1, b2)):
        stats.append(
            US.apply_diff_batch(
                spark, b, stores["nodes"], stores["ways"], stores["rels"],
                way_table, rel_table, group=f"diff-{i}", dirty_table=dirty, **kw,
            )
        )
    return dirty, stats


def test_rindex_path_results_identical(spark, tmp_path):
    """Same diffs through the legacy full-scan path and the indexed path:
    every store, derived table and dirty-log row identical; the index
    stores end exactly at the from-scratch reverse index of the final
    entity state (no staleness in the clean path)."""
    d_a = tmp_path / "legacy"
    d_b = tmp_path / "indexed"
    d_a.mkdir(), d_b.mkdir()
    st_a, wt_a, rt_a, _ = _build_world(spark, d_a, 10, with_rindex=False)
    st_b, wt_b, rt_b, kw = _build_world(spark, d_b, 10, with_rindex=True)
    dirty_a, _ = _apply_all(spark, d_a, st_a, wt_a, rt_a, {})
    dirty_b, stats_b = _apply_all(spark, d_b, st_b, wt_b, rt_b, kw)

    for k, cols in (
        ("nodes", ["id", "version", "lat", "lon"]),
        ("ways", ["id", "version", "to_json(refs) as r"]),
        ("rels", ["id", "version", "to_json(members) as m"]),
    ):
        assert _rows(spark, st_a[k], cols) == _rows(spark, st_b[k], cols), k
    assert _rows(spark, wt_a, WAY_COLS) == _rows(spark, wt_b, WAY_COLS)
    assert _rows(spark, rt_a, REL_COLS) == _rows(spark, rt_b, REL_COLS)
    dcols = ["zoom", "tile_x", "tile_y", "batch_group"]
    assert _rows(spark, dirty_a, dcols) == _rows(spark, dirty_b, dcols)

    # the lookups actually ran through the index (stats carry file counts)
    assert "rindex_lookup" in stats_b[0]["files_read"]
    assert stats_b[0]["way_chunks"]["locator_files_read"] is not None

    # index stores == from-scratch reverse index of the FINAL state
    fin_ways = ES.read_entity_store(spark, st_b["ways"])
    want_nw = sorted(
        (r["node_id"], tuple(r["way_ids"]))
        for r in resolve.reverse_index(fin_ways.select(F.col("id"), "refs")).collect()
    )
    got_nw = sorted(
        (r["node_id"], tuple(r["way_ids"]))
        for r in ES.read_entity_store(spark, kw["rindex_store"]).collect()
    )
    assert got_nw == want_nw
    fin_rels = ES.read_entity_store(spark, st_b["rels"])
    want_wr = sorted(
        (r["way_id"], tuple(r["relation_ids"]))
        for r in RI._index_rows(
            fin_rels.select("id", F.expr(_MEMBER_REFS).alias("refs")),
            "way_id", "relation_ids",
        ).collect()
    )
    got_wr = sorted(
        (r["way_id"], tuple(r["relation_ids"]))
        for r in ES.read_entity_store(spark, kw["rel_rindex_store"]).collect()
    )
    assert got_wr == want_wr


def test_per_batch_reads_do_not_grow_with_world(spark, tmp_path):
    """THE O(diff) pin: the same diff applied to a 4x bigger world must
    plan the same pruned file reads per step (the world grew, the diff
    did not), while the stores themselves hold strictly more files."""
    d_s = tmp_path / "small"
    d_l = tmp_path / "large"
    d_s.mkdir(), d_l.mkdir()
    st_s, wt_s, rt_s, kw_s = _build_world(spark, d_s, 10, with_rindex=True)
    st_l, wt_l, rt_l, kw_l = _build_world(spark, d_l, 40, with_rindex=True)
    # the worlds nest: world(40) contains world(10)'s entities verbatim
    n10 = set(r[0] for r in gen_update_world(10)[0])
    n40 = set(r[0] for r in gen_update_world(40)[0])
    assert n10 < n40

    _, stats_s = _apply_all(spark, d_s, st_s, wt_s, rt_s, kw_s)
    _, stats_l = _apply_all(spark, d_l, st_l, wt_l, rt_l, kw_l)

    n_files_s = len(IcepickTable(st_s["ways"]).files())
    n_files_l = len(IcepickTable(st_l["ways"]).files())
    assert n_files_l > n_files_s, "bigger world must mean more store files"

    for i in (0, 1):
        fr_s, fr_l = stats_s[i]["files_read"], stats_l[i]["files_read"]
        assert set(fr_s) == set(fr_l)
        for k in fr_s:
            assert fr_l[k] <= fr_s[k] + 1, (
                f"batch {i} step {k}: pruned reads grew with the world "
                f"({fr_s[k]} -> {fr_l[k]})"
            )
        # and the derived-table rewrites located their chunks via the
        # locator, reading a bounded number of locator files
        for tbl in ("way_chunks", "rel_chunks"):
            lf_s = stats_s[i][tbl].get("locator_files_read")
            lf_l = stats_l[i][tbl].get("locator_files_read")
            if lf_s is not None and lf_l is not None:
                assert lf_l <= lf_s + 1


def test_locator_superset_stale_entry_heals(spark, tmp_path):
    """A crash between the table commit and the locator trim leaves the
    locator a SUPERSET (old ∪ new chunk ids). A later diff touching the
    same key must still rewrite correctly (supersets only widen the file
    set) and must trim the entry back to exact."""
    st, way_table, rel_table, _ = _build_world(spark, tmp_path, 10, with_rindex=False)
    nodes = ES.read_entity_store(spark, st["nodes"])
    ways = ES.read_entity_store(spark, st["ways"])
    wid = ways.select("id").orderBy("id").first()["id"]

    # poison: add a bogus chunk id to the key's locator entry
    loc = update._locator_path(way_table)
    cur = ES.read_entity_store(spark, loc)
    row = cur.filter(F.col("way_id") == wid).first()
    poisoned = spark.createDataFrame(
        [(wid, sorted(set(list(row["chunk_ids"]) + [99_999])))],
        "way_id bigint, chunk_ids array<bigint>",
    )
    ES.upsert_entities(spark, loc, poisoned, group="poison")

    # a way diff re-tagging wid (refs unchanged -> same geometry)
    ways_diff = ways.filter(F.col("id") == wid).withColumn(
        "tags", F.expr("map('touched', '1')")
    )
    stats = update.apply_way_diff(
        spark, way_table, nodes, ways_diff, group="heal"
    )
    assert stats["locator_files_read"] is not None

    # content equals a from-scratch rebuild of the same final state
    split, bl = update.load_split_set(way_table)
    scratch = str(tmp_path / "scratch")
    fin_ways = ways.join(ways_diff.select("id"), "id", "left_anti").unionByName(
        ways_diff
    )
    update.build_way_chunk_table(spark, nodes, fin_ways, scratch, split, base_level=bl)
    assert _rows(spark, way_table, WAY_COLS) == _rows(spark, scratch, WAY_COLS)

    # healed: the entry is exact again (bogus chunk gone)
    healed = (
        ES.read_entity_store(spark, loc).filter(F.col("way_id") == wid).first()
    )
    assert 99_999 not in list(healed["chunk_ids"])
    true_chunks = sorted(
        r["chunk_id"]
        for r in spark.read.parquet(*IcepickTable(way_table).data_paths())
        .filter(F.col("way_id") == wid)
        .select("chunk_id")
        .distinct()
        .collect()
    )
    assert sorted(healed["chunk_ids"]) == true_chunks


def test_polygon_dirty_splice_in_update_loop(spark, tmp_path):
    """dirty_polygons=True (r7): a member-way node move must expire the
    FILLED area's tiles — including swath tiles between the old and new
    boundary that neither polyline touches — and splicing dirty-re-rendered
    polygon tiles over the pre state must equal a full post render."""
    from coords_spark.operators import multipolygon, render

    st, way_table, rel_table, kw = _build_world(spark, tmp_path, 8, with_rindex=True)
    nodes = ES.read_entity_store(spark, st["nodes"]).localCheckpoint()
    ways = ES.read_entity_store(spark, st["ways"]).localCheckpoint()
    rels = ES.read_entity_store(spark, st["rels"]).localCheckpoint()

    # one node of the first relation's first member way, moved ~1 degree
    first = rels.orderBy("id").first()
    wid = next(m["ref"] for m in first["members"] if m["mtype"] == 1)
    w_row = ways.filter(F.col("id") == wid).first()
    nid = w_row["refs"][1]
    n_row = nodes.filter(F.col("id") == nid).first()
    batch = spark.createDataFrame(
        [(0, "upsert", nid, 2, n_row["lat"] + 10_000_000,
          n_row["lon"] + 7_000_000, None, None, {})],
        US.DIFF_SCHEMA,
    )
    dirty_table = str(tmp_path / "dirty")
    zoom = 10
    US.apply_diff_batch(
        spark, batch, st["nodes"], st["ways"], st["rels"],
        way_table, rel_table, group="pd-0",
        dirty_table=dirty_table, dirty_zoom=zoom, dirty_min_zoom=9,
        dirty_polygons=True, **kw,
    )
    dirty10 = {
        (r["tile_x"], r["tile_y"])
        for r in spark.read.parquet(*IcepickTable(dirty_table).data_paths())
        .filter(F.col("zoom") == zoom)
        .collect()
    }

    post_nodes = nodes.withColumn(
        "lat", F.when(F.col("id") == nid, F.col("lat") + 10_000_000).otherwise(F.col("lat"))
    ).withColumn(
        "lon", F.when(F.col("id") == nid, F.col("lon") + 7_000_000).otherwise(F.col("lon"))
    ).localCheckpoint()

    def polys_of(nds):
        return multipolygon.reconstruct_multipolygons(
            resolve.resolve_relation_members(rels, resolve.resolve_ways(ways, nds))
        ).localCheckpoint()

    bbox = (int(-85e7), int(-179.9e7), int(85e7), int(179.9e7))

    def tiles_of(polys):
        return {
            (r["tile_x"], r["tile_y"]): (r["n_px"], r["px_crc"])
            for r in render.render_polygon_tiles(
                spark, None, bbox, zoom, polys=polys
            ).collect()
        }

    t_pre = tiles_of(polys_of(nodes))
    t_post = tiles_of(polys_of(post_nodes))
    changed = {
        k for k in set(t_pre) | set(t_post) if t_pre.get(k) != t_post.get(k)
    }
    assert changed, "the move must change some polygon tile"
    # completeness: every changed polygon tile is expired
    assert changed <= dirty10

    # the way-segment rule ALONE misses interior swath tiles — the reason
    # dirty_polygons exists
    aff_w = ways.filter(F.col("id") == wid)
    old_g = resolve.resolve_ways(aff_w, nodes)
    new_g = resolve.resolve_ways(aff_w, post_nodes)
    wdirty = {
        (r["tile_x"], r["tile_y"])
        for r in render.dirty_tiles(old_g.unionByName(new_g), zoom, zoom).collect()
    }
    assert changed - wdirty, "expected fill-swath tiles beyond the polyline rule"

    # splice == rebuild
    spliced = {k: v for k, v in t_pre.items() if k not in dirty10} | {
        k: v for k, v in t_post.items() if k in dirty10
    }
    assert spliced == t_post
