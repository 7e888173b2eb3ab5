"""Continuous chunk ingestion: image-drop stream -> fused decode/verify/
chunk -> icepick table, exactly-once (SURVEY.md §2.9 x north_star resume).

The sink is foreachBatch + icepick's committed-group ledger: Structured
Streaming replays a failed micro-batch with the SAME batch_id, and the
table skips groups already in the manifest — so a crash between the
parquet write and the checkpoint advance cannot duplicate rows. This is
the streaming twin of the batch pipeline's kill-safe resume (each batch is
one atomic manifest commit carrying per-file lineage + checksums).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

IMAGES_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long"
)


def stream_images_from_dir(spark: SparkSession, path: str, max_files: int = 1) -> DataFrame:
    return (
        spark.readStream.schema(IMAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def stream_ingest_images(
    images_stream: DataFrame,
    table_path: str,
    split_set,
    base_level: int,
    checkpoint_dir: str,
):
    """Start the ingest query. Returns the StreamingQuery; rows land in an
    icepick table with one atomic commit per micro-batch (group =
    stream batch id -> replays are no-ops)."""
    from coords_spark.operators import images as IMG
    from coords_spark.sources.icepick import IcepickTable

    table = IcepickTable.create(table_path)
    sink = _exactly_once_sink(
        table,
        table_path,
        lambda b: IMG.with_decode_check_chunk(b, split_set, base_level)
        .filter(F.col("decode_ok"))
        .drop("bytes"),
    )
    return (
        images_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def _exactly_once_sink(table, table_path: str, transform):
    """foreachBatch sink over the icepick committed-group ledger: group =
    stream batch id, so a replayed micro-batch after a crash is a no-op.
    `transform(batch_df) -> chunked df with chunk_id` is the ONLY
    per-entity-kind difference between the ingest streams."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        group = f"stream-{batch_id}"
        if group in table.committed_groups():
            return  # replayed batch after a crash: already durable
        chunked = transform(batch_df)
        staging = os.path.join(table_path, f"_staging-{group}")
        shutil.rmtree(staging, ignore_errors=True)
        (
            chunked.repartition("chunk_id")
            .sortWithinPartitions("chunk_id")
            .write.mode("overwrite")
            .parquet(staging)
        )
        table.commit_staged(staging, group=group, chunk_col="chunk_id")

    return sink


def chunk_node_batch(nodes_df: DataFrame, split_set, base_level: int) -> DataFrame:
    """Node batch -> chunked rows (cell encode -> chunk assign; tags as
    JSON so the parquet schema stays flat). Shared by the streaming sink
    and the batch twin so stream==batch cannot drift."""
    from coords_spark.operators import knn as K
    from coords_spark.operators import tiling as T

    return T.with_chunk(
        nodes_df.withColumn("cell", K.cell_at_level_col(base_level))
        .withColumn("tags_json", F.to_json("tags"))
        .drop("tags"),
        split_set,
        base_level=base_level,
    )


def chunk_way_batch(
    ways_df: DataFrame, nodes_df: DataFrame, split_set, base_level: int
) -> DataFrame:
    """Way batch -> chunked rows: location resolution against the STATIC
    node table (stream-static equi-join, J1) -> envelope -> deepest
    containing cell (T4) -> chunk (T5). Ways with dangling refs are
    dropped, matching resolve_ways' batch semantics."""
    from coords_spark.operators import geometry, resolve
    from coords_spark.operators import tiling as T

    meta = ways_df.select(F.col("id").alias("way_id"), F.to_json("tags").alias("tags_json"))
    resolved = resolve.resolve_ways(ways_df, nodes_df)
    g = geometry.with_geometry_cell(geometry.with_envelope(resolved))
    return T.with_chunk(g, split_set, base_level=base_level).join(meta, "way_id").select(
        "way_id", "cell", "chunk_id", "pts", "tags_json"
    )


def chunk_relation_batch(
    rels_df: DataFrame, resolved_ways: DataFrame, split_set, base_level: int
) -> DataFrame:
    """Relation batch -> chunked rows: way members join the STATIC resolved
    way table (J2), the relation's envelope is the min/max over every
    member vertex, then cell -> chunk as for ways. Relations with no
    resolvable way member carry no geometry and are dropped (the batch
    assembler's semantics); members are carried as JSON."""
    from coords_spark.operators import geometry, resolve
    from coords_spark.operators import tiling as T

    mem = resolve.resolve_relation_members(rels_df, resolved_ways)
    env = (
        mem.select(
            "relation_id",
            F.expr("array_min(transform(pts, p -> p.lat))").alias("a"),
            F.expr("array_min(transform(pts, p -> p.lon))").alias("b"),
            F.expr("array_max(transform(pts, p -> p.lat))").alias("c"),
            F.expr("array_max(transform(pts, p -> p.lon))").alias("d"),
        )
        .groupBy("relation_id")
        .agg(
            F.min("a").alias("env_minlat"),
            F.min("b").alias("env_minlon"),
            F.max("c").alias("env_maxlat"),
            F.max("d").alias("env_maxlon"),
        )
    )
    meta = rels_df.select(
        F.col("id").alias("relation_id"),
        F.to_json("tags").alias("tags_json"),
        F.to_json("members").alias("members_json"),
    )
    g = geometry.with_geometry_cell(env)
    return T.with_chunk(g, split_set, base_level=base_level).join(meta, "relation_id").select(
        "relation_id", "cell", "chunk_id", "tags_json", "members_json"
    )


def stream_ingest_nodes(
    nodes_stream: DataFrame,
    table_path: str,
    split_set,
    base_level: int,
    checkpoint_dir: str,
):
    """Streaming PLANET ingest, node kind: a cpbf/osmpbf node stream ->
    cell encode (lat/lon Arrow kernel) -> chunk assignment against a fixed
    split set -> icepick, with the exactly-once ledger (group = stream
    batch id; replays are no-ops)."""
    from coords_spark.sources.icepick import IcepickTable

    table = IcepickTable.create(table_path)
    sink = _exactly_once_sink(
        table, table_path, lambda b: chunk_node_batch(b, split_set, base_level)
    )
    return (
        nodes_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def stream_ingest_ways(
    ways_stream: DataFrame,
    nodes_df: DataFrame,
    table_path: str,
    split_set,
    base_level: int,
    checkpoint_dir: str,
):
    """Streaming planet ingest, way kind (VERDICT r4 ask #7): each way
    micro-batch location-resolves against the static node table (a
    stream-static equi-join per batch — the node table is the big, already-
    ingested side; the batch is small), then envelope -> cell -> chunk ->
    icepick under the same exactly-once ledger as nodes."""
    from coords_spark.sources.icepick import IcepickTable

    table = IcepickTable.create(table_path)
    sink = _exactly_once_sink(
        table, table_path, lambda b: chunk_way_batch(b, nodes_df, split_set, base_level)
    )
    return (
        ways_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def stream_ingest_relations(
    rels_stream: DataFrame,
    resolved_ways: DataFrame,
    table_path: str,
    split_set,
    base_level: int,
    checkpoint_dir: str,
):
    """Streaming planet ingest, relation kind (VERDICT r4 ask #7): way
    members join the static resolved-way table per micro-batch, the
    relation envelope aggregates member vertices, then cell -> chunk ->
    icepick, exactly-once."""
    from coords_spark.sources.icepick import IcepickTable

    table = IcepickTable.create(table_path)
    sink = _exactly_once_sink(
        table, table_path, lambda b: chunk_relation_batch(b, resolved_ways, split_set, base_level)
    )
    return (
        rels_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
