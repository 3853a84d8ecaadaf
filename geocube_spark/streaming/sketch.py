"""Streaming KMV distinct sketch with BOUNDED state.

``functions.sketch.kmv_state`` already streams (one aggregation), but
its Spark agg state is the per-group distinct hash set — unbounded on
a high-cardinality stream. This module keeps only the bottom-k hashes
per group via ``applyInPandasWithState``: state is at most ``k``
doubles per group forever, updates are an O(batch + k) merge-and-cut,
and the emitted sketch after the final micro-batch is bit-identical
to the batch :func:`functions.sketch.kmv_sketch` on the union of all
micro-batches (parity-tested in tests/test_sketch.py).

Same portable-hash contract as the rest of the sketch family: the
unit-interval hash is ``h60(value)/2^60``, so the streamed sketch is
a pure function of the input SET — arrival order and micro-batch
boundaries cannot move it.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.sketch import _KMV_SCALE
from ..textops.analysis import h60


def kmv_stream(df: DataFrame, col: str, *, k: int = 256,
               by=None, timeout: str = "NoTimeout") -> DataFrame:
    """Bottom-k KMV sketch over a (streaming or batch) DataFrame with
    O(k) state per group.

    Emits one row per group per micro-batch: (by..., ks ascending,
    n_vals, n_seen) where ``n_seen`` is the cumulative input rows the
    group has absorbed — monotone, so the row with the max ``n_seen``
    per group is the final sketch under update-mode sinks that keep
    every emission (e.g. the memory sink). Finish with
    :func:`functions.sketch.kmv_estimate`.

    Group keys default to a constant (one global sketch). A sketch
    merge is union + re-cut, so repartitioning the stream between
    restarts cannot change the result."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    keys = list(by) if by else []
    u = (h60(F.col(col).cast("string")) / F.lit(_KMV_SCALE)).alias("u")
    if keys:
        src = df.select(*keys, u)
        gcols = keys
    else:
        src = df.select(F.lit(0).alias("__g"), u)
        gcols = ["__g"]

    key_fields = [src.schema[c] for c in gcols]
    out_schema = T.StructType(
        list(key_fields)
        + [T.StructField("ks", T.ArrayType(T.DoubleType())),
           T.StructField("n_vals", T.LongType()),
           T.StructField("n_seen", T.LongType())]
    )
    state_schema = T.StructType([
        T.StructField("ks", T.ArrayType(T.DoubleType())),
        T.StructField("n_seen", T.LongType()),
    ])

    def _row(key, cut, n_seen):
        row = {c: [kv] for c, kv in zip(gcols, key)}
        row.update({"ks": [cut.tolist()], "n_vals": [len(cut)],
                    "n_seen": [n_seen]})
        return pd.DataFrame(row)

    if not df.isStreaming:
        # applyInPandasWithState is streaming-only; a batch frame
        # degrades to one grouped-map pass (same contract, one
        # emission per group), so stream-vs-batch parity is directly
        # testable like dedup_stream's batch mode.
        def _batch(key: Tuple, pdf: pd.DataFrame) -> pd.DataFrame:
            cut = np.unique(pdf["u"].to_numpy(dtype=np.float64))[:k]
            return _row(key, cut, len(pdf))

        out = src.groupBy(*gcols).applyInPandas(
            _batch, schema=out_schema
        )
        return out if keys else out.drop("__g")

    def _update(key: Tuple, pdfs: Iterator[pd.DataFrame],
                state) -> Iterator[pd.DataFrame]:
        if state.exists:
            ks_prev, n_seen = state.get
            vals = [np.asarray(ks_prev, dtype=np.float64)]
        else:
            vals, n_seen = [], 0
        for pdf in pdfs:
            n_seen += len(pdf)
            vals.append(pdf["u"].to_numpy(dtype=np.float64))
        merged = np.unique(np.concatenate(vals)) if vals else \
            np.empty(0, dtype=np.float64)
        cut = merged[:k]  # np.unique sorts ascending; state stays O(k)
        state.update((cut.tolist(), n_seen))
        yield _row(key, cut, n_seen)

    out = src.groupBy(*gcols).applyInPandasWithState(
        _update, outputStructType=out_schema,
        stateStructType=state_schema, outputMode="update",
        timeoutConf=timeout,
    )
    return out if keys else out.drop("__g")


def latest_sketches(emitted: DataFrame, *, by=None) -> DataFrame:
    """Reduce an update-mode sink table of :func:`kmv_stream`
    emissions to the final sketch per group: the row with the max
    cumulative ``n_seen`` (ties broken by the larger sketch, which is
    equal-or-later under set growth)."""
    keys = list(by) if by else [F.lit(0).alias("__g")]
    best = F.max_by(
        F.struct("ks", "n_vals", "n_seen"),
        F.struct("n_seen", "n_vals"),
    ).alias("b")
    out = emitted.groupBy(*keys).agg(best).select(
        *(list(by) if by else []), "b.ks", "b.n_vals", "b.n_seen"
    )
    return out
