"""Continuous minutely-diff apply: OSM-replication-style diff batches ->
entity-store upserts -> bounded rewrites of the derived way-chunk and
multipolygon tables, exactly-once (SURVEY.md §2.9 × the update family).
REF? COORDS consumes OSC replication diffs to keep its storage current
(update pipeline around src/containers/reverseIndex.* [M] — mount empty);
the Spark-first shape is Structured Streaming's file source over diff
parquet batches + foreachBatch, where each micro-batch composes the
EXISTING batch operators:

    diff batch (mixed node/way/relation upserts+deletes)
      1. upsert_entities into each id-keyed store     (O(diff) files)
      2. blast radius: changed nodes -> referencing ways (reverse index
         from the CURRENT ways store), + the way diff itself
      3. apply_way_diff on the way-chunk table         (O(radius) files)
      4. blast radius: changed ways -> member relations, + the relation
         diff itself; apply_relation_diff              (O(radius) files)

Exactly-once: every table keeps its own committed-group ledger and the
group id is the stream batch id — a replayed micro-batch after a crash
skips per-table (stores committed, derived not -> only derived re-apply;
the derivation is deterministic from the post-upsert stores, which a
replay reads in exactly the post-upsert state). Batches compose: batch
N+1's re-resolution reads stores that already contain batch N, which is
why the mutable entity-store layer exists at all.

100 TB posture: every per-batch job is diff-proportional — the only
table-proportional joins are equi-joins where the diff side is small
(broadcast), and rewrites touch only files whose chunk/id range holds an
affected entity. A day of minutely diffs then fragments the tables;
icepick compact()/expire_snapshots() (S8) is the matching lifecycle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from coords_spark.operators import entity_store as ES
from coords_spark.operators import resolve, update
from coords_spark.sources.icepick import IcepickTable

# one unified row per changed entity, OSC-style: kind 0=node 1=way 2=rel;
# action upsert|delete; payload columns nullable per kind
DIFF_SCHEMA = (
    "kind tinyint, action string, id bigint, version int, "
    "lat int, lon int, refs array<bigint>, "
    "members array<struct<mtype: tinyint, ref: bigint, role: string>>, "
    "tags map<string,string>"
)

KIND_NODE, KIND_WAY, KIND_REL = 0, 1, 2


def stream_diffs_from_dir(spark: SparkSession, path: str, max_files: int = 1) -> DataFrame:
    """File-source stream of diff batches: one parquet file per replication
    interval, picked up in arrival order (maxFilesPerTrigger=1 keeps one
    interval per micro-batch, preserving diff ordering semantics)."""
    return (
        spark.readStream.schema(DIFF_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def _ids(df: DataFrame) -> DataFrame:
    return df.select("id")


def apply_diff_batch(
    spark,
    batch_df: DataFrame,
    nodes_store: str,
    ways_store: str,
    rels_store: str,
    way_table: str | None,
    rel_table: str | None,
    group: str,
    dirty_table: str | None = None,
    dirty_zoom: int = 12,
    dirty_min_zoom: int = 9,
    rindex_store: str | None = None,
    rel_rindex_store: str | None = None,
    dirty_polygons: bool = False,
) -> dict:
    """Apply ONE diff batch everywhere; shared by the streaming sink and
    batch callers (stream==batch cannot drift). Idempotent per table via
    the committed-group ledger. Returns per-table stats.

    O(diff) posture (VERDICT r6 ask #1): every store read in this function
    is id-range-PRUNED to the batch's blast radius
    (entity_store.read_entities_for_ids — O(diff ids / 2^shift) files),
    and with `rindex_store` / `rel_rindex_store` (persistent reverse-index
    entity stores, operators/rindex.py, maintained in this same ledgered
    batch) the blast radius itself derives from pruned index lookups —
    NOTHING in the per-batch plan scans a full table anymore. Without the
    index stores the blast radius falls back to exploding the full
    ways/relations store (correct, table-proportional — pre-r7 behavior).
    Results are byte-identical either way; `stats['files_read']` reports
    the per-step pruned file counts so tests can pin the O(diff) claim."""
    # consolidate to one final state per (kind, id): replication intervals
    # are already consolidated upstream (one row per changed entity, OSC
    # semantics), but a merged/late batch may carry several versions —
    # keep the highest, delete winning version ties ('delete' < 'upsert')
    from pyspark.sql.window import Window

    w = Window.partitionBy("kind", "id").orderBy(
        F.desc_nulls_last("version"), F.asc("action")
    )
    b = (
        batch_df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .localCheckpoint()
    )
    stats: dict = {}

    node_up = b.filter((F.col("kind") == KIND_NODE) & (F.col("action") == "upsert")).select(
        "id", "version", "lat", "lon", "tags"
    )
    node_del = _ids(b.filter((F.col("kind") == KIND_NODE) & (F.col("action") == "delete")))
    way_up = b.filter((F.col("kind") == KIND_WAY) & (F.col("action") == "upsert")).select(
        "id", "version", "refs", "tags"
    )
    way_del = _ids(b.filter((F.col("kind") == KIND_WAY) & (F.col("action") == "delete")))
    rel_up = b.filter((F.col("kind") == KIND_REL) & (F.col("action") == "upsert")).select(
        "id", "version", "members", "tags"
    )
    rel_del = _ids(b.filter((F.col("kind") == KIND_REL) & (F.col("action") == "delete")))

    files_read: dict = {}
    stats["files_read"] = files_read
    node_ch = node_up.select("id").unionAll(node_del).distinct().localCheckpoint()
    way_ch = way_up.select("id").unionAll(way_del).distinct().localCheckpoint()

    # PRE-diff rows of the diff's own ways/relations, captured before any
    # store moves (pruned reads — diff-bounded): the reverse-index upserts
    # need the OLD refs, and the dirty log needs pre-diff geometry.
    def _pruned_rows(store: str, ids: DataFrame, tag: str) -> DataFrame:
        rows, n = ES.read_entities_for_ids(spark, store, ids)
        files_read[tag] = n
        return rows.join(F.broadcast(ids), "id", "semi")

    # way_old's only consumer is the reverse-index upsert: the legacy
    # (no-rindex) path must not pay a per-batch pruned store read +
    # checkpoint for it (ADVICE r7)
    way_old = (
        _pruned_rows(ways_store, way_ch, "way_old")
        .select("id", "refs")
        .localCheckpoint()
        if rindex_store is not None
        else None
    )

    def _ways_hit_pre(changed_nodes: DataFrame) -> DataFrame:
        """(way_id) referencing a changed node in the PRE state: a pruned
        reverse-index lookup when the store exists, else a full explode of
        the ways store (legacy, table-proportional)."""
        if rindex_store is not None:
            from coords_spark.operators import rindex as RI

            hit, n = RI.rindex_lookup(spark, rindex_store, changed_nodes)
            files_read["rindex_lookup"] = n
            return hit.withColumnRenamed(hit.columns[0], "way_id")
        ways0 = ES.read_entity_store(spark, ways_store)
        return (
            ways0.select(F.col("id").alias("way_id"), F.explode("refs").alias("nid"))
            .join(F.broadcast(node_ch.withColumnRenamed("id", "nid")), "nid")
            .select("way_id")
        )

    # ways whose geometry this batch can change: referencing a changed
    # node (pre-state hit; an unchanged way keeps its refs, so post-state
    # hits add nothing new) ∪ the way diff itself
    hit_pre = _ways_hit_pre(node_ch)
    aff_way_ids = (
        hit_pre.unionAll(way_ch.withColumnRenamed("id", "way_id"))
        .distinct()
        .localCheckpoint()
    )
    aff_ids = aff_way_ids.withColumnRenamed("way_id", "id")

    # -- 0. tile-expiry log (MUST commit before the stores: the dirty set
    # needs the PRE-diff geometry, so a replay after a store commit could
    # not recompute it — commit-dirty-first makes every crash window
    # replay-safe under the per-table ledgers). The post-diff state is
    # derived in DataFrame-land from the pre stores + the batch, never
    # from a committed store.
    if dirty_table is not None:
        import tempfile

        from coords_spark.operators.render import dirty_tiles as _dirty_tiles

        dt = IcepickTable.create(dirty_table)  # idempotent
        if group in dt.committed_groups():
            stats["dirty_tiles"] = "replayed"
        else:
            ways0_aff = _pruned_rows(ways_store, aff_ids, "dirty_ways").select(
                "id", "refs"
            ).localCheckpoint()
            # node files that can hold any ref of the affected ways' OLD
            # or NEW geometry (the union bounds the resolve either side)
            ref_ids = (
                ways0_aff.select(F.explode("refs").alias("id"))
                .unionAll(
                    way_up.join(F.broadcast(aff_ids), "id", "semi").select(
                        F.explode("refs").alias("id")
                    )
                )
                .distinct()
            )
            nodes0_aff, n = ES.read_entities_for_ids(spark, nodes_store, ref_ids)
            files_read["dirty_nodes"] = n
            nodes0_aff = nodes0_aff.select("id", "lat", "lon")
            post_n = nodes0_aff.join(node_ch, "id", "anti").unionByName(
                node_up.select("id", "lat", "lon")
            )
            post_w = ways0_aff.join(way_ch, "id", "anti").unionByName(
                way_up.join(F.broadcast(aff_ids), "id", "semi").select("id", "refs")
            )
            old_geom = resolve.resolve_ways(ways0_aff, nodes0_aff)
            new_geom = resolve.resolve_ways(post_w, post_n)
            dirty = _dirty_tiles(
                old_geom.unionByName(new_geom), dirty_zoom, dirty_min_zoom
            )
            if dirty_polygons and rel_table is not None:
                # POLYGON expiry (r7, opt-in): a relation edit — or a
                # member way's geometry change — must dirty the FILLED
                # area's tiles (interior included), which the way-segment
                # rule above cannot see. Pre/post multipolygons of the
                # blast-radius relations reassemble from pruned pre-store
                # rows + the batch (diff-bounded, same pre-commit rule).
                from coords_spark.operators import multipolygon
                from coords_spark.operators.render import (
                    dirty_polygon_tiles as _dirty_polys,
                )

                rel_ch = rel_up.select("id").unionAll(rel_del).distinct()
                changed_ways_all = aff_way_ids.unionAll(
                    way_del.withColumnRenamed("id", "way_id")
                ).distinct()
                if rel_rindex_store is not None:
                    from coords_spark.operators import rindex as RI

                    rel_hit, n = RI.rindex_lookup(
                        spark, rel_rindex_store, changed_ways_all
                    )
                    files_read["dirty_rel_rindex"] = n
                    rel_hit = rel_hit.withColumnRenamed(rel_hit.columns[0], "id")
                else:
                    rels0_all = ES.read_entity_store(spark, rels_store)
                    rel_hit = update.affected_relation_ids(
                        rels0_all, changed_ways_all
                    ).withColumnRenamed("relation_id", "id")
                aff_rel = rel_hit.unionAll(rel_ch).distinct().localCheckpoint()
                rels0_aff = _pruned_rows(rels_store, aff_rel, "dirty_rels").select(
                    "id", "members"
                ).localCheckpoint()
                post_r = rels0_aff.join(rel_ch, "id", "anti").unionByName(
                    rel_up.join(F.broadcast(aff_rel), "id", "semi").select(
                        "id", "members"
                    )
                )
                mem_ids = (
                    rels0_aff.unionByName(post_r)
                    .select(F.explode(_member_way_refs()).alias("id"))
                    .distinct()
                )
                mways0, n = ES.read_entities_for_ids(spark, ways_store, mem_ids)
                files_read["dirty_member_ways"] = n
                mways0 = mways0.join(F.broadcast(mem_ids), "id", "semi").select(
                    "id", "refs"
                ).localCheckpoint()
                mref_ids = (
                    mways0.select(F.explode("refs").alias("id"))
                    .unionAll(
                        way_up.join(F.broadcast(mem_ids), "id", "semi").select(
                            F.explode("refs").alias("id")
                        )
                    )
                    .distinct()
                )
                mnodes0, n = ES.read_entities_for_ids(spark, nodes_store, mref_ids)
                files_read["dirty_member_nodes"] = n
                mnodes0 = mnodes0.select("id", "lat", "lon")
                mpost_n = mnodes0.join(node_ch, "id", "anti").unionByName(
                    node_up.select("id", "lat", "lon")
                )
                mpost_w = mways0.join(way_ch, "id", "anti").unionByName(
                    way_up.join(F.broadcast(mem_ids), "id", "semi").select(
                        "id", "refs"
                    )
                )
                old_polys = multipolygon.reconstruct_multipolygons(
                    resolve.resolve_relation_members(
                        rels0_aff, resolve.resolve_ways(mways0, mnodes0)
                    )
                )
                new_polys = multipolygon.reconstruct_multipolygons(
                    resolve.resolve_relation_members(
                        post_r, resolve.resolve_ways(mpost_w, mpost_n)
                    )
                )
                dirty = dirty.unionByName(
                    _dirty_polys(
                        old_polys.unionByName(new_polys),
                        dirty_zoom,
                        dirty_min_zoom,
                    )
                ).distinct()
            dirty = dirty.withColumn("batch_group", F.lit(group))
            stage = tempfile.mkdtemp(prefix="dirty_stage_")
            dirty.write.mode("overwrite").parquet(stage)
            entries = dt.commit_staged(stage, group=group, chunk_col="tile_x")
            stats["dirty_tiles"] = int(sum(e["rows"] for e in entries))

    # -- 1. entity stores (order irrelevant between kinds; each atomic,
    # each an arithmetic-chunk bounded rewrite) ---------------------------
    rel_old = None
    if rel_rindex_store is not None:
        rel_ch = rel_up.select("id").unionAll(rel_del).distinct()
        rel_old = (
            _pruned_rows(rels_store, rel_ch, "rel_old")
            .select("id", _member_way_refs().alias("refs"))
            .localCheckpoint()
        )
    for path, up, dele, name in (
        (nodes_store, node_up, node_del, "nodes"),
        (ways_store, way_up, way_del, "ways"),
        (rels_store, rel_up, rel_del, "relations"),
    ):
        if group in IcepickTable(path).committed_groups():
            stats[name] = "replayed"
            continue
        stats[name] = ES.upsert_entities(spark, path, up, dele, group=group)

    # -- 1.5 reverse-index maintenance (same ledgered batch; a replay may
    # see post-diff rows as way_old → superset entries, safe by the rindex
    # module invariant) ----------------------------------------------------
    if rindex_store is not None:
        from coords_spark.operators import rindex as RI

        # replay skip like every other per-table apply (ADVICE r7): a
        # replayed batch's re-upsert is content-idempotent but burns a
        # snapshot generation and rewrite work
        if group in IcepickTable(rindex_store).committed_groups():
            stats["rindex"] = "replayed"
        else:
            stats["rindex"] = RI.upsert_rindex(
                spark,
                rindex_store,
                way_old,
                way_up.select("id", "refs"),
                way_del,
                group=group,
            )
    if rel_rindex_store is not None:
        from coords_spark.operators import rindex as RI

        if group in IcepickTable(rel_rindex_store).committed_groups():
            stats["rel_rindex"] = "replayed"
        else:
            stats["rel_rindex"] = RI.upsert_rindex(
                spark,
                rel_rindex_store,
                rel_old,
                rel_up.select("id", _member_way_refs().alias("refs")),
                rel_del,
                group=group,
            )

    # -- 2/3. derived way-chunk table: blast radius re-resolve (pruned:
    # the store already holds the post-diff rows, so the "diff" for the
    # derived table is every affected way's CURRENT row) -------------------
    if way_table is not None:
        if group in IcepickTable(way_table).committed_groups():
            stats["way_chunks"] = "replayed"
        else:
            ways_diff = _pruned_rows(ways_store, aff_ids, "way_rows")
            node_ids = ways_diff.select(F.explode("refs").alias("id")).distinct()
            nodes_aff, n = ES.read_entities_for_ids(spark, nodes_store, node_ids)
            files_read["way_nodes"] = n
            stats["way_chunks"] = update.apply_way_diff(
                spark,
                way_table,
                nodes_aff,
                ways_diff,
                deleted_way_ids=way_del,
                group=group,
            )

    # -- 4. derived multipolygon table: relation blast radius --------------
    if rel_table is not None:
        changed_ways = aff_way_ids.unionAll(
            way_del.withColumnRenamed("id", "way_id")
        ).distinct()
        if rel_rindex_store is not None:
            from coords_spark.operators import rindex as RI

            rel_hit, n = RI.rindex_lookup(spark, rel_rindex_store, changed_ways)
            files_read["rel_rindex_lookup"] = n
            rel_hit = rel_hit.withColumnRenamed(rel_hit.columns[0], "relation_id")
        else:
            rels_all = ES.read_entity_store(spark, rels_store)
            rel_hit = update.affected_relation_ids(rels_all, changed_ways)
        aff_rel_ids = (
            rel_hit.unionAll(rel_up.select(F.col("id").alias("relation_id")))
            .distinct()
            .localCheckpoint()
        )
        if group in IcepickTable(rel_table).committed_groups():
            stats["rel_chunks"] = "replayed"
        else:
            rels_diff = _pruned_rows(
                rels_store, aff_rel_ids.withColumnRenamed("relation_id", "id"),
                "rel_rows",
            )
            # resolve ONLY the member ways of affected relations — the
            # radius-proportional subset, with post-diff node geometry
            member_ways = (
                rels_diff.select(F.explode("members").alias("m"))
                .filter(F.col("m.mtype") == 1)
                .select(F.col("m.ref").alias("id"))
                .distinct()
            )
            mways = _pruned_rows(ways_store, member_ways, "rel_member_ways")
            mnode_ids = mways.select(F.explode("refs").alias("id")).distinct()
            mnodes, n = ES.read_entities_for_ids(spark, nodes_store, mnode_ids)
            files_read["rel_member_nodes"] = n
            resolved = resolve.resolve_ways(mways, mnodes)
            stats["rel_chunks"] = update.apply_relation_diff(
                spark,
                rel_table,
                rels_diff,
                resolved,
                deleted_relation_ids=rel_del,
                group=group,
            )
    return stats


def _member_way_refs():
    """Column: a relation's way-member ids as a refs array (the parent-refs
    shape upsert_rindex expects)."""
    return F.expr("transform(filter(members, m -> m.mtype = 1), m -> m.ref)")


def maintain_tables(
    spark,
    paths: list[str | None],
    group: str,
    target_bytes: int = 128 << 20,
    keep_n: int = 2,
) -> dict:
    """One maintenance sweep over every existing table in `paths`:
    compact() small files (ledgered under `group` — a replay skips the
    rewrite), then expire_snapshots(keep_n) to reclaim the space the
    dropped generations pin. Expiry is idempotent and re-runs on replay
    (a crash between compact and expire must not leave snapshots
    unreclaimed forever). The committed-group ledger lives in the CURRENT
    manifest and carries through both operations, so the stream's
    exactly-once contract survives maintenance."""
    out: dict = {}
    for p in paths:
        if p is None:
            continue
        t = IcepickTable(p)
        if not t.exists():
            continue
        if group in t.committed_groups():
            st: object = "replayed"
        else:
            st = t.compact(spark, target_bytes=target_bytes, group=group)
            t.mark_group_committed(group)  # ledger the no-op sweeps too
        ex = t.expire_snapshots(keep_n=keep_n)
        out[p] = {
            "compact": st,
            "expired_versions": len(ex["expired_versions"]),
            "removed_files": len(ex["removed_files"]),
            "files_now": len(t.files()),
        }
    return out


def _maintained_paths(
    nodes_store, ways_store, rels_store, way_table, rel_table, dirty_table,
    rindex_store, rel_rindex_store,
) -> list[str | None]:
    """Every table the stream fragments, locator sidecars included (each
    derived-table apply lands TWO locator commits per batch — the fastest
    fragmenter in the loop)."""
    from coords_spark.operators.update import _locator_path

    paths = [
        nodes_store, ways_store, rels_store,
        rindex_store, rel_rindex_store,
        way_table, rel_table, dirty_table,
    ]
    for tbl in (way_table, rel_table):
        if tbl is not None:
            paths.append(_locator_path(tbl))
    return paths


def stream_apply_diffs(
    diffs_stream: DataFrame,
    nodes_store: str,
    ways_store: str,
    rels_store: str,
    way_table: str | None,
    rel_table: str | None,
    checkpoint_dir: str,
    dirty_table: str | None = None,
    dirty_zoom: int = 12,
    dirty_min_zoom: int = 9,
    rindex_store: str | None = None,
    rel_rindex_store: str | None = None,
    dirty_polygons: bool = False,
    maintenance_every: int | None = None,
    maintenance_keep: int = 2,
    maintenance_target_bytes: int = 128 << 20,
):
    """Start the continuous update query. Each micro-batch is one diff
    interval applied atomically-per-table with replay-safe skips. With
    `dirty_table`, each batch also appends its tile-expiry work list
    (render.dirty_tiles over the batch's blast radius) — the re-render
    feed for a downstream tile sink. With the reverse-index stores, every
    batch plans O(diff) (see apply_diff_batch).

    With `maintenance_every=N`, every Nth batch closes the lifecycle loop
    (VERDICT r6 ask #5): compact + expire_snapshots on every table the
    stream fragments — a day of minutely diffs no longer degrades reads
    (BENCH/BASELINE.md: fragmented 1.5 s -> compacted 0.18 s). Ledgered
    per sweep ('maint-{batch_id}'), so a replayed trigger batch skips the
    rewrite and only re-runs the idempotent expiry."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        apply_diff_batch(
            batch_df.sparkSession,
            batch_df,
            nodes_store,
            ways_store,
            rels_store,
            way_table,
            rel_table,
            group=f"diff-{batch_id}",
            dirty_table=dirty_table,
            dirty_zoom=dirty_zoom,
            dirty_min_zoom=dirty_min_zoom,
            rindex_store=rindex_store,
            rel_rindex_store=rel_rindex_store,
            dirty_polygons=dirty_polygons,
        )
        if maintenance_every and (batch_id + 1) % maintenance_every == 0:
            maintain_tables(
                batch_df.sparkSession,
                _maintained_paths(
                    nodes_store, ways_store, rels_store, way_table, rel_table,
                    dirty_table, rindex_store, rel_rindex_store,
                ),
                group=f"maint-{batch_id}",
                target_bytes=maintenance_target_bytes,
                keep_n=maintenance_keep,
            )

    return (
        diffs_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
