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

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        group = f"stream-{batch_id}"
        if group in table.committed_groups():
            return  # replayed batch after a crash: already durable
        chunked = (
            IMG.with_decode_check_chunk(batch_df, split_set, base_level)
            .filter(F.col("decode_ok"))
            .drop("bytes")
        )
        staging = os.path.join(table_path, f"_staging-{group}")
        shutil.rmtree(staging, ignore_errors=True)
        (
            chunked.repartition("chunk_id")
            .sortWithinPartitions("chunk_id")
            .write.mode("overwrite")
            .parquet(staging)
        )
        table.commit_staged(staging, group=group, chunk_col="chunk_id")

    return (
        images_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def stream_ingest_nodes(
    nodes_stream: DataFrame,
    table_path: str,
    split_set,
    base_level: int,
    checkpoint_dir: str,
):
    """Streaming PLANET ingest: a cpbf node stream (sources.cpbf.
    read_cpbf_stream) -> cell encode (lat/lon Arrow kernel) -> chunk
    assignment against a fixed split set -> icepick, with the same
    exactly-once ledger as the image ingest (group = stream batch id;
    replays are no-ops). Tags are carried as JSON so the parquet schema
    stays flat."""
    from coords_spark.operators import knn as K
    from coords_spark.operators import tiling as T
    from coords_spark.sources.icepick import IcepickTable

    table = IcepickTable.create(table_path)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        group = f"stream-{batch_id}"
        if group in table.committed_groups():
            return  # replayed batch after a crash: already durable
        chunked = T.with_chunk(
            batch_df.withColumn("cell", K.cell_at_level_col(base_level))
            .withColumn("tags_json", F.to_json("tags"))
            .drop("tags"),
            split_set,
            base_level=base_level,
        )
        staging = os.path.join(table_path, f"_staging-{group}")
        shutil.rmtree(staging, ignore_errors=True)
        (
            chunked.repartition("chunk_id")
            .sortWithinPartitions("chunk_id")
            .write.mode("overwrite")
            .parquet(staging)
        )
        table.commit_staged(staging, group=group, chunk_col="chunk_id")

    return (
        nodes_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
