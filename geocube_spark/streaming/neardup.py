"""Streaming NEAR-duplicate dedup (MinHash-LSH, first occurrence wins).

The streaming counterpart of ``functions.dedup.minhash_lsh_pairs``: as
documents arrive, each one hashes into the SAME 16 LSH band buckets as
the batch operator (``minhash_band_buckets`` is shared, so the
arithmetic is bit-identical), and is DROPPED when any of its buckets
was already claimed by an earlier document — earlier increment, or an
earlier ``(ts, id)`` within the same micro-batch. Every document then
claims its still-unclaimed buckets (dropped ones too), so chains of
near-duplicates collapse onto the first arrival.

Semantics vs batch: a batch LSH candidate pair means the two docs share
>= 1 band bucket, so the later member of EVERY batch candidate pair is
guaranteed dropped here (the bucket was claimed by the earlier member
or someone earlier still) — streaming recall >= batch LSH recall.
Precision is the band's specificity (a collision is 4 matching 60-bit
MinHash rows, overwhelming evidence of overlap); there is no in-stream
exact-Jaccard verification — run the batch verifier over the survivors
for a certified sweep.

Plan per micro-batch (the ``foreachBatch`` + idempotent-epoch pattern
of ``incremental.py``): band buckets for the batch (Arrow-batched, no
shuffle) -> ONE equi-join against the claims table on ``(band, bh)``
-> one groupBy for the within-batch first claimer -> survivors and new
claims land under ``batch=<id>/`` dirs (overwrite on replay =
exactly-once with the stream checkpoint). The claims table holds one
tiny row per DISTINCT bucket ever seen (bounded by 16 x corpus, ~50
bytes each) and is equi-joined, never collected; prune it offline like
any snapshot table if the horizon allows.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.dedup import minhash_band_buckets

DOCS_STREAM_SCHEMA = "doc_id bigint, text string, ts timestamp"


class NearDupStream:
    """Incremental first-occurrence-wins near-dup dedup over a growing
    documents directory. ``survivors(spark)`` reads the kept docs."""

    def __init__(self, output_path: str, *, num_hashes: int = 64,
                 bands: int = 16, k: int = 3, text_col: str = "text",
                 id_col: str = "doc_id", time_col: str = "ts",
                 input_schema: str = DOCS_STREAM_SCHEMA):
        self.output_path = output_path
        self.num_hashes = num_hashes
        self.bands = bands
        self.k = k
        self.text_col = text_col
        self.id_col = id_col
        self.time_col = time_col
        self.input_schema = input_schema

    # -- paths ---------------------------------------------------------------

    def _claims_dir(self) -> str:
        return os.path.join(self.output_path, "claims")

    def _out_dir(self) -> str:
        return os.path.join(self.output_path, "survivors")

    # -- core ----------------------------------------------------------------

    def _buckets(self, docs: DataFrame) -> DataFrame:
        """(id, ts, band, bh) for one batch — shared batch arithmetic."""
        bb = minhash_band_buckets(
            docs, num_hashes=self.num_hashes, bands=self.bands,
            text_col=self.text_col, id_col=self.id_col, k=self.k,
        )
        ts = docs.select(
            F.col(self.id_col).alias("id"),
            F.col(self.time_col).alias("ts"),
        )
        return bb.join(ts, "id")

    def _prior_claims(self, spark: SparkSession,
                      batch_id: int) -> DataFrame | None:
        root = self._claims_dir()
        if not os.path.isdir(root):
            return None
        dirs = [
            d for d in os.listdir(root)
            if d.startswith("batch=") and int(d.split("=")[1]) < batch_id
        ]
        if not dirs:
            return None
        return spark.read.parquet(*[os.path.join(root, d) for d in dirs])

    def process_batch(self, docs: DataFrame, batch_id: int) -> None:
        """foreachBatch body. Idempotent per epoch: replays overwrite
        ``batch=<id>`` and prior-claim reads EXCLUDE the current epoch,
        so a crash mid-write cannot double-claim or double-emit."""
        if docs.isEmpty():
            return
        spark = docs.sparkSession
        bb = self._buckets(docs).persist()
        prior = self._prior_claims(spark, batch_id)

        first = bb.groupBy("band", "bh").agg(
            F.min(F.struct("ts", "id")).alias("first")
        )
        # dropped: any bucket claimed in a prior epoch ...
        hit_prior = (
            bb.join(prior.select("band", "bh"), ["band", "bh"], "inner")
            .select("id")
            if prior is not None else None
        )
        # ... or claimed within this batch by a smaller (ts, id)
        hit_batch = (
            bb.join(first, ["band", "bh"])
            .filter(F.struct("ts", "id") > F.col("first"))
            .select("id")
        )
        dropped = hit_batch if hit_prior is None else (
            hit_batch.unionByName(hit_prior)
        )
        dropped = dropped.distinct()

        survivors = docs.join(
            dropped.select(F.col("id").alias(self.id_col)),
            self.id_col, "left_anti",
        )
        survivors.write.mode("overwrite").parquet(
            os.path.join(self._out_dir(), f"batch={batch_id}")
        )

        new_claims = first.select("band", "bh")
        if prior is not None:
            new_claims = new_claims.join(
                prior.select("band", "bh"), ["band", "bh"], "left_anti"
            )
        new_claims.write.mode("overwrite").parquet(
            os.path.join(self._claims_dir(), f"batch={batch_id}")
        )
        bb.unpersist()

    def refresh(self, spark: SparkSession, input_path: str,
                checkpoint: str) -> None:
        """Process all currently-available new files, then stop
        (Trigger.AvailableNow) — a resumable incremental dedup pass."""
        src = spark.readStream.schema(self.input_schema).parquet(input_path)
        q = (
            src.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def survivors(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self._out_dir())
