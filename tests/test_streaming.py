"""Structured Streaming incremental cube (SURVEY.md §2.10 extension).

Two micro-batched refreshes over a growing documents directory must
produce exactly the cube a one-shot batch burn produces over the full
corpus — for both merge algebras (the winning-seq aux makes replace
correct across arbitrary batch boundaries), and the second refresh
must only process the NEW file (stream checkpoint resume).
"""

import os

import numpy as np
import pytest

from geocube_spark import datagen as DG
from geocube_spark.cube import GeoCube, make_geocube
from geocube_spark.streaming.incremental import IncrementalCube

MEAS = ["om_r", "claytotal_r"]


def _grid(spark):
    docs = DG.to_spark(spark, DG.flat_polygon_docs(n=12, seed=1))
    return make_geocube(
        docs, measurements=["om_r"], output_crs="EPSG:4326",
        resolution=(-0.0005, 0.0005), fill=0.0, tile_size=32,
    ).geobox


@pytest.mark.parametrize("merge_alg", ["add", "replace"])
def test_incremental_refresh_equals_batch(spark, tmp_path, merge_alg):
    pdf1 = DG.flat_polygon_docs(n=12, seed=1)
    pdf2 = DG.flat_polygon_docs(n=12, seed=2)
    # distinct doc ids (=> distinct seq) across batches
    pdf2["doc_id"] = [d.replace("soil_flat-", "soil_flat-1") for d in pdf2["doc_id"]]

    in_dir = str(tmp_path / "docs_in")
    out_dir = str(tmp_path / "cube_out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)

    geobox = _grid(spark)
    fill = 0.0 if merge_alg == "add" else -9999.0
    inc = IncrementalCube(
        out_dir, geobox, measurements=MEAS, fill=fill,
        merge_alg=merge_alg, tile_size=32,
    )

    # batch 1 arrives -> refresh
    DG.to_spark(spark, pdf1).coalesce(1).write.parquet(f"{in_dir}/b1")
    inc.refresh(spark, f"{in_dir}/*", ckpt)
    n_partials_1 = len(os.listdir(f"{out_dir}/partials"))
    assert n_partials_1 >= 1

    # batch 2 arrives -> refresh resumes from checkpoint (only new file)
    DG.to_spark(spark, pdf2).coalesce(1).write.parquet(f"{in_dir}/b2")
    inc.refresh(spark, f"{in_dir}/*", ckpt)

    final = inc.compact(spark)

    # oracle: one-shot batch burn over the union
    import pandas as pd

    all_docs = DG.to_spark(spark, pd.concat([pdf1, pdf2], ignore_index=True))
    batch_cube = make_geocube(
        all_docs, measurements=MEAS, like=geobox, fill=fill,
        merge_alg=merge_alg, tile_size=32,
    )
    want = batch_cube.assemble()
    got_cube = GeoCube(
        chunks=final, geobox=geobox, bands=batch_cube.bands,
        tile_size=32, fill=fill,
    )
    got = got_cube.assemble()
    for m in MEAS:
        if merge_alg == "replace":
            np.testing.assert_array_equal(want[m], got[m])
        else:
            np.testing.assert_allclose(want[m], got[m], rtol=1e-12)


def test_windowed_watermark_stream(spark, tmp_path):
    """Watermarked tumbling windows over a 2-batch event stream: after
    the event-time high-water mark advances past window+watermark, the
    finalized windows are emitted exactly once; a too-late row is
    dropped (never emitted, never retracted)."""
    import datetime as dt
    import os

    import pandas as pd
    from pyspark.sql import functions as F

    from geocube_spark.streaming.windows import (
        run_windowed_stream,
        windowed_counts,
    )

    def _ev(eid, hour, minute, etype, value):
        return {
            "event_id": eid, "user_id": eid % 5, "event_type": etype,
            "ts": dt.datetime(2026, 1, 1, hour, minute), "value": value,
            "props": "{}",
        }

    in_dir = str(tmp_path / "ev_in")
    out_dir = str(tmp_path / "ev_out")
    ckpt = str(tmp_path / "ev_ckpt")
    os.makedirs(in_dir)

    b1 = pd.DataFrame(
        [_ev(1, 0, 10, "view", 1.0), _ev(2, 0, 40, "view", 2.0),
         _ev(3, 1, 5, "click", 3.0)]
    )
    spark.createDataFrame(b1).coalesce(1).write.parquet(f"{in_dir}/b1")
    run_windowed_stream(
        spark, f"{in_dir}/*", out_dir, ckpt,
        window="1 hour", watermark="30 minutes",
    )

    # batch 2: advances event time to 05:00 -> after this micro-batch
    # the watermark is 04:30 and all earlier windows finalize
    b2 = pd.DataFrame([_ev(4, 5, 0, "view", 4.0)])
    spark.createDataFrame(b2).coalesce(1).write.parquet(f"{in_dir}/b2")
    run_windowed_stream(
        spark, f"{in_dir}/*", out_dir, ckpt,
        window="1 hour", watermark="30 minutes",
    )
    # batch 3: a row for hour 0, far behind the 04:30 watermark ->
    # dropped (watermarks update at micro-batch boundaries, so the
    # late row must arrive in a LATER batch than the time-advancer)
    b3 = pd.DataFrame([_ev(5, 0, 50, "view", 100.0)])
    spark.createDataFrame(b3).coalesce(1).write.parquet(f"{in_dir}/b3")
    run_windowed_stream(
        spark, f"{in_dir}/*", out_dir, ckpt,
        window="1 hour", watermark="30 minutes",
    )

    got = spark.read.parquet(out_dir)
    rows = {
        (r["window_start"].hour, r["event_type"]): (
            r["n_events"], r["sum_value"]
        )
        for r in got.collect()
    }
    # hour-0 view window: late event 5 dropped -> 2 events, sum 3.0
    assert rows[(0, "view")] == (2, 3.0)
    assert rows[(1, "click")] == (1, 3.0)
    # batch/stream parity on the on-time subset
    batch = windowed_counts(
        spark.createDataFrame(pd.concat([b1, b2], ignore_index=True))
    )
    want = {
        (r["window_start"].hour, r["event_type"]): (
            r["n_events"], r["sum_value"]
        )
        for r in batch.collect()
        if r["window_start"].hour < 5
    }
    assert {k: v for k, v in rows.items() if k[0] < 5} == want
