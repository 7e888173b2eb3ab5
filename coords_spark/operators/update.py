"""Incremental update apply (SURVEY.md §2.3 J3's intent; VERDICT r4 ask
#6). REF? src/containers/reverseIndex.* [M] — mount empty; the reference
keeps a node->ways reverse index precisely so a node-diff can rewrite ONLY
the affected ways' chunks instead of re-running the planet build.

Spark-first shape: the diff is the small side everywhere —

    nodes_diff --join reverse index (or explode(ways.refs))--> affected ways
    affected ways --re-resolve with patched nodes--> new geometry/cell/chunk
    old files whose chunk range holds an affected way --left_anti rewrite--
    one icepick commit_replace: drop stale files, add rewrites + new rows

Everything data-proportional stays distributed; the only driver-side state
is the affected CHUNK id set and the file list (both bounded by the diff
size × chunk fan-out, never by table size). Files whose chunk range holds
no affected way are untouched byte-for-byte — the zero-rewrites-elsewhere
guarantee the pytest pins.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from coords_spark.operators import geometry, resolve, tiling
from coords_spark.sources.icepick import IcepickTable


def _way_rows(ways: DataFrame, nodes: DataFrame, split, base_level: int) -> DataFrame:
    """The canonical way-chunk row set: resolve -> envelope -> deepest
    containing cell (T4) -> chunk under `split` (T5). Single definition
    shared by full build and incremental rebuild so both paths cannot
    drift."""
    resolved = resolve.resolve_ways(ways, nodes)
    g = geometry.with_geometry_cell(geometry.with_envelope(resolved))
    chunked = tiling.with_chunk(g, split, base_level=base_level)
    return chunked.select("way_id", "cell", "chunk_id", "pts")


def build_way_chunk_table(
    spark,
    nodes: DataFrame,
    ways: DataFrame,
    table_path: str,
    split,
    base_level: int = tiling.DEFAULT_BASE_LEVEL,
) -> IcepickTable:
    """Full build of a way-geometry chunk table (the incremental target)."""
    rows = _way_rows(ways, nodes, split, base_level)
    return tiling.materialize_chunk_table(rows, table_path, key_col="way_id")


def affected_way_ids(
    ways: DataFrame, nodes_diff: DataFrame, rindex: DataFrame | None = None
) -> DataFrame:
    """(way_id) touched by the diff. With a precomputed reverse-index table
    (resolve.reverse_index output) this is one broadcast equi-join +
    explode; otherwise it derives the index on the fly from ways.refs."""
    ids = nodes_diff.select(F.col("id").alias("node_id")).distinct()
    if rindex is not None:
        return (
            rindex.join(F.broadcast(ids), "node_id")
            .select(F.explode("way_ids").alias("way_id"))
            .distinct()
        )
    return (
        resolve.explode_refs(ways)
        .join(F.broadcast(ids), "node_id")
        .select("way_id")
        .distinct()
    )


def patched_nodes(nodes: DataFrame, nodes_diff: DataFrame) -> DataFrame:
    """nodes with the diff's lat/lon (and version, if present) applied —
    a broadcast left join, never a shuffle of the big node table."""
    d = nodes_diff.select(
        F.col("id"),
        F.col("lat").alias("_dlat"),
        F.col("lon").alias("_dlon"),
    )
    out = nodes.join(F.broadcast(d), "id", "left")
    return out.select(
        *[c for c in nodes.columns if c not in ("lat", "lon")],
        F.coalesce("_dlat", "lat").alias("lat"),
        F.coalesce("_dlon", "lon").alias("lon"),
    )


def apply_node_diff(
    spark,
    table_path: str,
    nodes: DataFrame,
    ways: DataFrame,
    nodes_diff: DataFrame,
    split,
    base_level: int = tiling.DEFAULT_BASE_LEVEL,
    rindex: DataFrame | None = None,
    group: str = "node_diff",
) -> dict:
    """Apply a node diff (moved/updated nodes) to an existing way-chunk
    icepick table: re-resolve and re-chunk ONLY the affected ways, rewrite
    ONLY the data files whose chunk range holds an affected way, and land
    everything as ONE atomic commit_replace (old snapshots keep reading
    the pre-diff state — time travel is preserved).

    The split set is the table's chunking contract and must be the one the
    table was built with (chunk ids are only comparable under one split).

    Returns stats: affected way/chunk/file counts and the commit entries.
    """
    table = IcepickTable(table_path)
    aff = affected_way_ids(ways, nodes_diff, rindex=rindex).localCheckpoint()
    n_aff = aff.count()
    if n_aff == 0:
        return {"affected_ways": 0, "files_replaced": 0, "files_added": 0}

    # new rows for affected ways, under the patched node set
    ways_aff = ways.join(aff.withColumnRenamed("way_id", "id"), "id", "semi")
    new_rows = _way_rows(ways_aff, patched_nodes(nodes, nodes_diff), split, base_level)

    # old chunk ids holding affected ways -> file replace set (driver-side
    # list bounded by the diff's chunk fan-out, not by table size)
    all_paths = table.data_paths()
    old_aff_chunks = {
        r["chunk_id"]
        for r in spark.read.parquet(*all_paths)
        .join(aff, "way_id", "semi")
        .select("chunk_id")
        .distinct()
        .collect()
    }
    replace = [
        e
        for e in table.files()
        if e.get("chunk_min") is not None
        and any(e["chunk_min"] <= c <= e["chunk_max"] for c in old_aff_chunks)
    ]
    replace_paths = [os.path.join(table_path, e["path"]) for e in replace]

    staging = tempfile.mkdtemp(prefix="node_diff_", dir=table_path)
    # rewritten survivors: replaced files minus affected ways (row-exact
    # on way_id — a file's chunk range may span untouched chunks too)
    if replace_paths:
        (
            spark.read.parquet(*replace_paths)
            .join(aff, "way_id", "left_anti")
            .repartitionByRange("chunk_id")
            .sortWithinPartitions("chunk_id")
            .write.mode("append")
            .parquet(os.path.join(staging, "rewritten"))
        )
    # re-chunked affected ways (their NEW chunks may land anywhere; reads
    # union overlapping ranges, so appending beside existing coverage is
    # correct and keeps untouched files untouched)
    (
        new_rows.repartitionByRange("chunk_id")
        .sortWithinPartitions("chunk_id")
        .write.mode("append")
        .parquet(os.path.join(staging, "updated"))
    )
    # Spark leaves _SUCCESS markers; _finalize_staged globs *.parquet only
    entries = table.commit_replace(
        staging, [e["path"] for e in replace], group=group
    )
    return {
        "affected_ways": n_aff,
        "old_chunks": sorted(old_aff_chunks),
        "files_replaced": len(replace),
        "files_added": len(entries),
        "files_untouched": len(all_paths) - len(replace),
        "entries": entries,
    }
