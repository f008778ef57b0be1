"""Event-time window helpers shared by batch slugs and streaming runs.

The same ``window``/``session_window`` expressions produce identical
groups in batch and streaming — the batch slugs in queries/streaming.py
are therefore the oracle-checkable spec of the streaming behavior, and
tests/test_streaming.py drives these helpers through readStream with a
watermark to prove the streaming path agrees.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    df: DataFrame, width: str = "1 hour", watermark: str | None = None
) -> DataFrame:
    if watermark and df.isStreaming:
        df = df.withWatermark("ts", watermark)
    return (
        df.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_counts(
    df: DataFrame,
    width: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    if watermark and df.isStreaming:
        df = df.withWatermark("ts", watermark)
    return (
        df.groupBy(F.window("ts", width, slide).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


def session_counts(
    df: DataFrame, gap: str = "6 hours", watermark: str | None = None
) -> DataFrame:
    if watermark and df.isStreaming:
        df = df.withWatermark("ts", watermark)
    return (
        df.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )


def first_event_dedup(df: DataFrame, watermark: str | None = None) -> DataFrame:
    """Streaming-safe dedup keyed on (user_id, event_type): keep the
    earliest event time and a duplicate count per key.

    Spark's dropDuplicates keeps an ARBITRARY row (arrival order in
    streaming, partition order in batch) — not reproducible across
    engines or retries, so not oracle-checkable.  min(ts)/count(*) is
    the same state size (one row per key) with deterministic output,
    and in streaming it is a plain aggregation: watermark bounds state,
    AvailableNow drains it.  Batch and streaming share this helper;
    tests/test_streaming.py proves they agree."""
    if watermark and df.isStreaming:
        df = df.withWatermark("ts", watermark)
    return df.groupBy("user_id", "event_type").agg(
        F.min("ts").alias("first_ts"),
        F.count("*").alias("n_dups"),
    )
