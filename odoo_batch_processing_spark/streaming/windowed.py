"""Watermarked event-time windowed aggregation (X7, streaming form).

Batch twin: operators/windows.py (same window expressions). Here the
aggregation runs under Structured Streaming with a watermark bounding
state: windows older than (max event time − delay) are finalized and
their state dropped; later-arriving rows for them are discarded — the
late-data policy the reference never needed (its source was a live DOM)
but any 100 TB event pipeline does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def hourly_counts(
    stream_df: DataFrame,
    watermark: str = "10 minutes",
    window: str = "1 hour",
) -> DataFrame:
    """Tumbling event-time counts with bounded state."""
    return (
        stream_df.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("hour_start"), "event_type", "n_events", "sum_value")
    )
