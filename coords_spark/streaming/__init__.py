"""Structured Streaming facade (SURVEY.md §2.9): COORDS is strictly batch;
the driver testdata ships an `events` stream table, so the engine exposes
windowed/session/watermark/dedup streaming transforms over events-shaped
streams. Batch checkpoint-resume is icepick's job, not streaming state."""

from coords_spark.streaming.events import (  # noqa: F401
    session_window_stats,
    sliding_window_counts,
    stream_events_from_dir,
    tumbling_window_counts,
    watermark_dedup,
)
from coords_spark.streaming.joins import click_purchase_interval_join  # noqa: F401
from coords_spark.streaming.stateful import running_user_stats  # noqa: F401
from coords_spark.streaming.ingest_stream import (  # noqa: F401
    stream_images_from_dir,
    stream_ingest_images,
)
