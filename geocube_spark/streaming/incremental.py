"""Incremental tile refresh with Structured Streaming (SURVEY.md §2.10).

The reference is a batch library; this is the engine's optional scale
extension: new interleaved documents landing in a directory (or new
Iceberg snapshots) are burned INCREMENTALLY into an existing cube
without reprocessing history.

Design (Spark-first):

* ``readStream`` over the documents source with the spans schema;
* ``foreachBatch``: each micro-batch is burned into PARTIAL chunks
  against the FIXED pre-planned grid (streaming cannot re-derive
  data-dependent bounds), carrying the aux band that makes partials
  mergeable: touch counts for 'add', winning input ``seq`` for
  'replace' — the same algebra as the salted skew burn, so
  last-write-wins stays correct across arbitrary micro-batch
  boundaries (the seq is data-derived, not arrival-derived);
* partials land under ``<out>/partials/batch=<id>/`` (idempotent
  overwrite per epoch id -> exactly-once together with the stream
  checkpoint), the stream's own ``checkpointLocation`` tracks source
  progress, so a killed stream resumes without duplicates;
* ``compact()`` folds all partials per (tile, group, measurement)
  into final chunks — run it on demand or after each refresh;
  ``Trigger.AvailableNow`` turns the whole thing into an incremental
  batch job.
"""

from __future__ import annotations

import json
import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..cube import _CHUNK_FIELDS, CHUNK_SCHEMA, make_geocube, merge_partial_chunks
from ..datagen import SPANS_SCHEMA
from ..grid.geobox import GeoBox


class IncrementalCube:
    """Streamed, resumable, incrementally-refreshed raster cube.

    With ``event_time_col`` + ``watermark`` set, ingestion is
    event-time aware: documents arriving more than ``watermark`` behind
    the max seen event time are DROPPED before the burn (the stateful
    ``dropDuplicatesWithinWatermark`` applies Structured Streaming's
    late-record filter, and deduplicates doc ids within the watermark
    as a bonus), so the compacted cube reflects only in-watermark data.
    The watermark itself persists in the stream checkpoint across
    ``refresh`` calls / restarts."""

    def __init__(self, output_path: str, geobox: GeoBox, *,
                 measurements=None, fill: float = 0.0,
                 merge_alg: str = "add", tile_size: int = 256,
                 input_schema: str = SPANS_SCHEMA,
                 event_time_col: str = None, watermark: str = None,
                 id_col: str = "doc_id", categorical_enums=None):
        if merge_alg not in ("add", "replace"):
            raise ValueError(f"unsupported merge_alg {merge_alg!r}")
        if (event_time_col is None) != (watermark is None):
            raise ValueError(
                "event_time_col and watermark must be set together"
            )
        self.output_path = output_path
        self.geobox = geobox
        self.measurements = measurements
        self.fill = fill
        self.merge_alg = merge_alg
        self.tile_size = tile_size
        self.input_schema = input_schema
        self.event_time_col = event_time_col
        self.watermark = watermark
        self.id_col = id_col
        # explicit enum -> stable category codes across micro-batches
        # (per-batch derived categories would renumber between batches)
        self.categorical_enums = categorical_enums
        self._fills: dict = {}

    # -- write side --------------------------------------------------------

    def _burn_partials(self, docs: DataFrame) -> DataFrame:
        cube = make_geocube(
            docs,
            measurements=self.measurements,
            like=self.geobox,
            fill=self.fill,
            merge_alg=self.merge_alg,
            tile_size=self.tile_size,
            categorical_enums=self.categorical_enums,
            _emit_partials=True,
        )
        self._fills = {m: b.fill for m, b in cube.bands.items()}
        return cube.chunks

    def process_batch(self, docs: DataFrame, batch_id: int) -> None:
        """foreachBatch body: burn one micro-batch into a partials dir.

        Overwriting ``batch=<id>`` makes replays after a crash
        idempotent — with the stream checkpoint this is exactly-once.
        """
        if docs.isEmpty():
            return
        part_dir = os.path.join(
            self.output_path, "partials", f"batch={batch_id}"
        )
        self._burn_partials(docs).write.mode("overwrite").parquet(part_dir)
        # fills sidecar: compact() after a crash/restart must use the
        # per-band fills the burn planned, not the constructor default
        # (categorical -> -1, datetime -> 0.0 overrides would otherwise
        # silently merge wrong)
        with open(os.path.join(self.output_path, "fills.json"), "w") as f:
            json.dump(self._fills, f)

    def refresh(self, spark: SparkSession, input_path: str,
                checkpoint: str) -> None:
        """Process all currently-available new files, then stop
        (Trigger.AvailableNow): an incremental batch refresh that
        resumes from the stream checkpoint (including the event-time
        watermark, when configured)."""
        src = spark.readStream.schema(self.input_schema).parquet(input_path)
        if self.event_time_col is not None:
            src = src.withWatermark(
                self.event_time_col, self.watermark
            ).dropDuplicatesWithinWatermark([self.id_col])
        stream = (
            src.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        stream.awaitTermination()

    # -- read side ---------------------------------------------------------

    def partials(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(
            os.path.join(self.output_path, "partials")
        )

    def compact(self, spark: SparkSession) -> DataFrame:
        """Fold every partial into final chunks (CHUNK_SCHEMA)."""
        parts = self.partials(spark)
        fills = dict(self._fills)
        if not fills:
            # crash/restart path: read the sidecar written by
            # process_batch; only a cube with no batches at all falls
            # back to the constructor fill
            sidecar = os.path.join(self.output_path, "fills.json")
            if os.path.exists(sidecar):
                with open(sidecar) as f:
                    fills = json.load(f)
        if not fills:
            fills = {
                r["measurement"]: self.fill
                for r in parts.select("measurement").distinct().collect()
            }
        merge_alg = self.merge_alg
        merge_cols = [f.name for f in _CHUNK_FIELDS]

        def _merge(key, pdf: pd.DataFrame) -> pd.DataFrame:
            return merge_partial_chunks(pdf, fills, merge_alg, merge_cols)

        sc = spark.sparkContext
        return (
            parts.repartition(
                sc.defaultParallelism, "tile_id", "group_key"
            )
            .groupBy("tile_id", "group_key")
            .applyInPandas(_merge, schema=CHUNK_SCHEMA)
        )
