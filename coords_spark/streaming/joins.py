"""Stream-stream interval join (SURVEY.md §2.9 — the remaining hard
Structured Streaming capability after windows/session/dedup/stateful):
purchases joined to every same-user click inside a lookback interval.

Scale posture: the join state is keyed by user (hash exchange both sides,
identical to the batch join); with a finite watermark Spark evicts buffered
rows once the interval condition can no longer match — state is bounded by
(watermark + lookback) x arrival rate, not the stream length. Passing
watermark=None keeps state unbounded but makes the result exactly equal to
the batch join regardless of micro-batch boundaries — that equality is the
correctness gate (stream==batch pytest + the driver's hash-checked replay
query)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def click_purchase_interval_join(
    clicks: DataFrame,
    purchases: DataFrame,
    lookback: str = "7 days",
    watermark: str | None = None,
) -> DataFrame:
    """(purchase_id, user_id, purchase_ts, click_id, click_ts): one row per
    (purchase, same-user click) pair with click_ts in
    (purchase_ts - lookback, purchase_ts]. Works identically on batch and
    streaming inputs — THE single join definition; DuckDB twins replicate
    it in SQL, so never fork it."""
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("ts").cast("timestamp").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    p = purchases.select(
        "user_id",
        F.col("ts").cast("timestamp").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    # per-side gate: withWatermark is only legal (and only meaningful) on a
    # streaming DataFrame — a mixed batch/stream call must still watermark
    # the streaming side, or its join state grows without bound
    if watermark is not None:
        if clicks.isStreaming:
            c = c.withWatermark("click_ts", watermark)
        if purchases.isStreaming:
            p = p.withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("c_user") == F.col("user_id"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") > F.col("purchase_ts") - F.expr(f"INTERVAL {lookback}"))
    )
    return p.join(c, cond).select(
        "purchase_id", "user_id", "purchase_ts", "click_id", "click_ts"
    )
