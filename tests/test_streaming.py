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


def test_incremental_watermark_drops_late_docs(spark, tmp_path):
    """Event-time watermark on document ingestion: a document arriving
    beyond the watermark (after the high-water mark advanced in an
    EARLIER refresh — watermarks advance at micro-batch boundaries) is
    excluded from the compacted cube; an in-watermark document in the
    same late batch still lands."""
    import datetime as dt

    import pandas as pd

    def _stamp(pdf, ts):
        pdf = pdf.copy()
        pdf["ts"] = ts
        return pdf

    pdf1 = DG.flat_polygon_docs(n=8, seed=1)
    late = DG.flat_polygon_docs(n=3, seed=2)
    late["doc_id"] = [d.replace("soil_flat-", "late-") for d in late["doc_id"]]
    ontime = DG.flat_polygon_docs(n=3, seed=3)
    ontime["doc_id"] = [
        d.replace("soil_flat-", "ontime-") for d in ontime["doc_id"]
    ]

    in_dir = str(tmp_path / "docs_in")
    out_dir = str(tmp_path / "cube_out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)

    geobox = _grid(spark)
    schema = DG.SPANS_SCHEMA + ", ts timestamp"

    def _write(pdf, ts, name):
        df = spark.createDataFrame(_stamp(pdf, ts), schema=schema)
        df.coalesce(1).write.parquet(f"{in_dir}/{name}")

    inc = IncrementalCube(
        out_dir, geobox, measurements=["om_r"], fill=0.0,
        merge_alg="add", tile_size=32, input_schema=schema,
        event_time_col="ts", watermark="1 hour",
    )

    # refresh 1: event time advances to 12:00 -> watermark = 11:00
    _write(pdf1, dt.datetime(2026, 1, 1, 12, 0), "b1")
    inc.refresh(spark, f"{in_dir}/*", ckpt)

    # refresh 2: one doc 3h late (dropped), one in-watermark (kept)
    _write(late, dt.datetime(2026, 1, 1, 9, 0), "b2_late")
    _write(ontime, dt.datetime(2026, 1, 1, 11, 30), "b2_ok")
    inc.refresh(spark, f"{in_dir}/*", ckpt)

    final = inc.compact(spark)

    # oracle: batch burn over pdf1 + ontime ONLY
    all_docs = DG.to_spark(
        spark, pd.concat([pdf1, ontime], ignore_index=True)
    )
    batch_cube = make_geocube(
        all_docs, measurements=["om_r"], like=geobox, fill=0.0,
        merge_alg="add", tile_size=32,
    )
    want = batch_cube.assemble()
    got = GeoCube(
        chunks=final, geobox=geobox, bands=batch_cube.bands,
        tile_size=32, fill=0.0,
    ).assemble()
    np.testing.assert_allclose(want["om_r"], got["om_r"], rtol=1e-12)

    # the late docs alone would have changed the cube (guard against a
    # vacuous pass)
    with_late = make_geocube(
        DG.to_spark(
            spark, pd.concat([pdf1, ontime, late], ignore_index=True)
        ),
        measurements=["om_r"], like=geobox, fill=0.0,
        merge_alg="add", tile_size=32,
    ).assemble()
    assert not np.allclose(with_late["om_r"], want["om_r"])


def test_compact_after_restart_uses_sidecar_fills(spark, tmp_path):
    """compact() on a FRESH IncrementalCube instance (simulated
    restart: in-memory _fills empty) must use the per-band fills the
    burn planned, via the fills.json sidecar."""
    pdf = DG.flat_polygon_docs(n=8, seed=1)
    in_dir = str(tmp_path / "docs_in")
    out_dir = str(tmp_path / "cube_out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)
    geobox = _grid(spark)
    inc = IncrementalCube(
        out_dir, geobox, measurements=["om_r"], fill=-9999.0,
        merge_alg="replace", tile_size=32,
    )
    DG.to_spark(spark, pdf).coalesce(1).write.parquet(f"{in_dir}/b1")
    inc.refresh(spark, f"{in_dir}/*", ckpt)
    assert os.path.exists(f"{out_dir}/fills.json")

    # restart: new instance with a DIFFERENT (wrong) constructor fill
    inc2 = IncrementalCube(
        out_dir, geobox, measurements=["om_r"], fill=0.0,
        merge_alg="replace", tile_size=32,
    )
    final = inc2.compact(spark)
    batch_cube = make_geocube(
        DG.to_spark(spark, pdf), measurements=["om_r"], like=geobox,
        fill=-9999.0, merge_alg="replace", tile_size=32,
    )
    got = GeoCube(
        chunks=final, geobox=geobox, bands=batch_cube.bands,
        tile_size=32, fill=-9999.0,
    ).assemble()
    np.testing.assert_array_equal(batch_cube.assemble()["om_r"], got["om_r"])


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


def test_restart_compact_categorical_band(spark, tmp_path):
    """Round-2 review item 7: crash between refresh and compact with a
    CATEGORICAL band. A fresh instance (empty in-memory _fills, wrong
    constructor fill) must compact using the persisted per-band fills
    (-1 for categorical) and the pinned enum so codes are stable
    across batches and restarts."""
    pdf1 = DG.grouped_polygon_docs(n_groups=1, per_group=6, seed=3)
    pdf2 = DG.grouped_polygon_docs(n_groups=1, per_group=6, seed=4)
    pdf2["doc_id"] = [d.replace("soil_group-", "soil_group-1")
                      for d in pdf2["doc_id"]]
    enums = {"drclassdcd": ["Well drained", "Poorly drained"]}

    in_dir = str(tmp_path / "docs_in")
    out_dir = str(tmp_path / "cube_out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)
    geobox = _grid(spark)

    inc = IncrementalCube(
        out_dir, geobox, measurements=["drclassdcd"], fill=0.0,
        merge_alg="replace", tile_size=32, categorical_enums=enums,
    )
    DG.to_spark(spark, pdf1).coalesce(1).write.parquet(f"{in_dir}/b1")
    inc.refresh(spark, f"{in_dir}/*", ckpt)
    DG.to_spark(spark, pdf2).coalesce(1).write.parquet(f"{in_dir}/b2")
    inc.refresh(spark, f"{in_dir}/*", ckpt)
    import json as _json

    with open(f"{out_dir}/fills.json") as f:
        assert _json.load(f)["drclassdcd"] == -1.0

    # crash + restart: fresh instance, wrong constructor fill
    inc2 = IncrementalCube(
        out_dir, geobox, measurements=["drclassdcd"], fill=0.0,
        merge_alg="replace", tile_size=32, categorical_enums=enums,
    )
    final = inc2.compact(spark)

    import pandas as pd

    batch_cube = make_geocube(
        DG.to_spark(spark, pd.concat([pdf1, pdf2], ignore_index=True)),
        measurements=["drclassdcd"], like=geobox, fill=0.0,
        merge_alg="replace", tile_size=32, categorical_enums=enums,
    )
    want = batch_cube.assemble()["drclassdcd"]
    got = GeoCube(
        chunks=final, geobox=geobox, bands=batch_cube.bands,
        tile_size=32, fill=-1.0,
    ).assemble()["drclassdcd"]
    assert want.dtype == np.int8
    np.testing.assert_array_equal(want, got)
    # untouched cells must be the categorical nodata code, not 0
    assert (got == -1).any()


def test_streaming_output_compacts_through_table_maintenance(
    spark, tmp_path
):
    """End-to-end interplay: streaming partial burns -> compact() ->
    checkpointed write (4 snapshots) -> snapshot compaction + expiry
    -> reads stay row-identical to the one-shot batch burn."""
    from geocube_spark.plans import checkpoint as CP

    pdf = DG.flat_polygon_docs(n=16, seed=5)
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "inc")
    ckpt = str(tmp_path / "ck")
    os.makedirs(in_dir)
    geobox = _grid(spark)
    inc = IncrementalCube(
        out_dir, geobox, measurements=MEAS, fill=-9999.0,
        merge_alg="replace", tile_size=32,
    )
    DG.to_spark(spark, pdf).coalesce(1).write.parquet(f"{in_dir}/b1")
    inc.refresh(spark, f"{in_dir}/*", ckpt)
    final = inc.compact(spark)

    cube_path = str(tmp_path / "cube")
    batch_cube = make_geocube(
        DG.to_spark(spark, pdf), measurements=MEAS, like=geobox,
        fill=-9999.0, merge_alg="replace", tile_size=32,
    )
    got_cube = GeoCube(
        chunks=final, geobox=geobox, bands=batch_cube.bands,
        tile_size=32, fill=-9999.0,
    )
    got_cube.write(cube_path, commit_batches=4)
    CP.compact_snapshots(spark, cube_path)
    CP.expire_snapshots(cube_path)
    back = CP.read_cube(spark, cube_path)
    read_cube = GeoCube(
        chunks=back, geobox=geobox, bands=batch_cube.bands,
        tile_size=32, fill=-9999.0,
    )
    want = batch_cube.assemble()
    got = read_cube.assemble()
    for m in MEAS:
        np.testing.assert_array_equal(want[m], got[m])


def test_streaming_dedup_first_wins_across_increments(spark, tmp_path):
    """Streaming exact dedup: duplicates WITHIN a micro-batch and
    across two checkpointed AvailableNow increments are both dropped;
    the surviving rows equal the batch operator's first-occurrence
    set on the union corpus."""
    import datetime as dt

    from geocube_spark.streaming.dedup import (
        dedup_stream,
        run_dedup_stream,
    )

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)

    def rows(ids_texts, minute):
        return [
            (i, t, t0 + dt.timedelta(minutes=minute + k))
            for k, (i, t) in enumerate(ids_texts)
        ]

    in_dir = str(tmp_path / "docs_in")
    out_dir = str(tmp_path / "dedup_out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)
    schema = "doc_id bigint, text string, ts timestamp"

    b1 = rows([(1, "alpha"), (2, "beta"), (3, "alpha")], 0)
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(
        f"{in_dir}/b1"
    )
    run_dedup_stream(spark, f"{in_dir}/*", out_dir, ckpt)

    # increment: one repeat of batch 1 (inside the watermark horizon,
    # state persisted via the checkpoint) + one new doc
    b2 = rows([(4, "alpha"), (5, "gamma")], 10)
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(
        f"{in_dir}/b2"
    )
    run_dedup_stream(spark, f"{in_dir}/*", out_dir, ckpt)

    got = spark.read.parquet(out_dir)
    texts = sorted(r["text"] for r in got.collect())
    assert texts == ["alpha", "beta", "gamma"]
    # first occurrence won
    assert {r["text"]: r["doc_id"] for r in got.collect()}["alpha"] == 1

    # stream == batch parity on the union corpus
    union = spark.createDataFrame(b1 + b2, schema)
    batch = dedup_stream(union.orderBy("ts"))
    assert sorted(
        r["text"] for r in batch.collect()
    ) == ["alpha", "beta", "gamma"]
