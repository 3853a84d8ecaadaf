"""Streaming exact deduplication (Structured Streaming).

The streaming counterpart of ``functions.dedup.exact_duplicates``: a
document stream is deduplicated on its text hash as it arrives, keeping
the FIRST occurrence and dropping later copies. State is one small row
(hash + event time) per distinct document inside the watermark horizon
— ``dropDuplicatesWithinWatermark`` lets Spark evict state older than
the watermark, so the query runs forever at bounded memory. That is
the trade a streaming dedup must make: duplicates farther apart than
the horizon are NOT caught (re-run the batch operator for a full-corpus
sweep); everything inside it is exact.

``Trigger.AvailableNow`` + the stream checkpoint make it a resumable
incremental batch job, consistent with the tile refresh in
``incremental.py``: duplicates arriving in LATER increments of the same
checkpointed stream are still dropped while their state lives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCS_STREAM_SCHEMA = (
    "doc_id bigint, text string, ts timestamp"
)


def dedup_stream(docs: DataFrame, *, text_col: str = "text",
                 time_col: str = "ts",
                 watermark: str = "1 hour") -> DataFrame:
    """First-occurrence-wins exact dedup on the md5 text hash.

    Works on both streaming and batch DataFrames: a stream gets
    ``withWatermark`` + ``dropDuplicatesWithinWatermark`` (bounded
    state); a batch frame degrades to plain ``dropDuplicates`` on the
    same key (full-corpus semantics) so stream-vs-batch parity is
    directly testable. The hash column rides along in the output as
    ``text_hash``."""
    src = docs.withColumn("text_hash", F.md5(F.col(text_col)))
    if src.isStreaming:
        return src.withWatermark(
            time_col, watermark
        ).dropDuplicatesWithinWatermark(["text_hash"])
    return src.dropDuplicates(["text_hash"])


def run_dedup_stream(spark: SparkSession, input_path: str,
                     output_path: str, checkpoint: str, *,
                     schema: str = DOCS_STREAM_SCHEMA,
                     text_col: str = "text", time_col: str = "ts",
                     watermark: str = "1 hour") -> None:
    """Incremental dedup over a growing documents directory:
    AvailableNow + checkpoint = resumable exactly-once; append mode
    emits each first occurrence once."""
    stream = spark.readStream.schema(schema).parquet(input_path)
    out = dedup_stream(stream, text_col=text_col, time_col=time_col,
                       watermark=watermark)
    q = (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
