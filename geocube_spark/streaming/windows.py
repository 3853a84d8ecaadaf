"""Watermarked event-time windowed aggregation (Structured Streaming).

The engine's streaming surface for the events stream: tumbling
event-time windows with a watermark bounding how late data may arrive
before being dropped — the canonical Structured Streaming pattern for
late data. State is bounded by the watermark (Spark discards window
state older than watermark - window), so the query runs forever at
constant memory; ``Trigger.AvailableNow`` turns it into a resumable
incremental batch job like the tile refresh in ``incremental.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id bigint, user_id bigint, event_type string, ts timestamp, "
    "value double, props string"
)


def windowed_counts(events: DataFrame, *, window: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window event counts + value sums per event type.

    Works on both batch and streaming DataFrames (the same plan — the
    test exercises parity). With a stream, rows later than
    ``watermark`` behind the max seen event time are dropped and the
    window state is finalized.
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(
            F.window("ts", window).alias("w"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type", "n_events", "sum_value",
        )
    )


def run_windowed_stream(spark: SparkSession, input_path: str,
                        output_path: str, checkpoint: str, *,
                        window: str = "1 hour",
                        watermark: str = "2 hours") -> None:
    """Incremental windowed aggregation over a growing events
    directory: AvailableNow + checkpoint = resumable; append mode
    emits each window once its watermark passes (finalized windows
    only - the exactly-once, no-retraction contract)."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .parquet(input_path)
    )
    agg = windowed_counts(stream, window=window, watermark=watermark)
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
