"""Streaming transforms over events-shaped data (SURVEY.md §2.9).

All transforms take EITHER a streaming or a batch DataFrame (identical
semantics — that's the Structured Streaming contract), so tests verify
windowing logic on batch and smoke the stream wiring via an in-memory sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
)


def stream_events_from_dir(spark: SparkSession, path: str, max_files: int = 1) -> DataFrame:
    """File-source stream over events parquet drops (the no-Kafka sandbox
    equivalent; swap format('kafka') on a real bus)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def _wm(events: DataFrame, watermark: str | None) -> DataFrame:
    """Set the event-time watermark unless the upstream already has one
    (Spark disallows redefinition in one query)."""
    return events.withWatermark("ts", watermark) if watermark else events


def tumbling_window_counts(
    events: DataFrame, width: str = "10 minutes", watermark: str | None = "10 minutes"
) -> DataFrame:
    return (
        _wm(events, watermark)
        .groupBy(F.window("ts", width).alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type",
            "n",
            "total",
        )
    )


def sliding_window_counts(
    events: DataFrame, width: str = "10 minutes", slide: str = "5 minutes",
    watermark: str | None = "10 minutes",
) -> DataFrame:
    return (
        _wm(events, watermark)
        .groupBy(F.window("ts", width, slide).alias("win"), "user_id")
        .agg(F.count("*").alias("n"))
        .select(F.col("win.start").alias("win_start"), "user_id", "n")
    )


def session_window_stats(
    events: DataFrame, gap: str = "5 minutes", watermark: str | None = "10 minutes"
) -> DataFrame:
    return (
        _wm(events, watermark)
        .groupBy(F.session_window("ts", gap).alias("sess"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total"))
        .select(
            F.col("sess.start").alias("sess_start"),
            F.col("sess.end").alias("sess_end"),
            "user_id",
            "n_events",
            "total",
        )
    )


def watermark_dedup(events: DataFrame, key: str = "event_id") -> DataFrame:
    """Stateful dedup bounded by the watermark (late duplicates beyond 10
    minutes are dropped by the engine)."""
    if events.isStreaming:
        return events.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark([key])
    return events.dropDuplicates([key])
