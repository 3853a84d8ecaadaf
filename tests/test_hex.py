"""Aperture-7 hexagonal index (grid/hex.py) — lattice invariants +
three-form cross-checks (numpy / Spark Column / DuckDB SQL).

The scheme claims (and these tests pin): nearest-center assignment,
exactly-7-children hierarchy, the published aperture-7 geometry
(1/sqrt(7) scaling, atan(sqrt(3)/5) rotation per resolution step),
crack-free boundaries, and bit-identical arithmetic across the three
implementations.
"""

from __future__ import annotations

import collections
import math

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from geocube_spark.grid import hex as H

RNG = np.random.default_rng(4242)
XS = RNG.uniform(-180, 180, 3000)
YS = RNG.uniform(-89, 89, 3000)


# ---------------------------------------------------------------------------
# lattice invariants (numpy)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("res", [0, 3, 8, 12, 15])
def test_center_roundtrip(res):
    cid = H.hex_cell_id(XS, YS, res)
    cx, cy = H.hex_center(cid)
    assert np.array_equal(H.hex_cell_id(cx, cy, res), cid)


def test_exactly_seven_children_and_parent_inverse():
    cid = np.unique(H.hex_cell_id(XS, YS, 8))
    ch = H.hex_children(cid)
    assert ch.shape == (len(cid), 7)
    # children sets are disjoint across parents
    assert len(np.unique(ch.ravel())) == 7 * len(cid)
    assert np.array_equal(H.hex_parent(ch.ravel()), np.repeat(cid, 7))
    # the center child shares the parent's center exactly
    px, py = H.hex_center(cid)
    cx, cy = H.hex_center(ch[:, 0])
    np.testing.assert_allclose(cx, px, rtol=0, atol=1e-9)
    np.testing.assert_allclose(cy, py, rtol=0, atol=1e-9)


def test_children_partition_every_fine_cell():
    """Every res-6 cell in a window has exactly one parent, and every
    interior res-5 parent receives exactly 7 children — the rounding
    preimage partition, checked exhaustively on ~50k parents."""
    ids6 = H.hex_polyfill(-50, -50, 50, 50, 6)
    cnt = collections.Counter(H.hex_parent(ids6).tolist())
    interior5 = H.hex_polyfill(-45, -45, 45, 45, 5)
    bad = [k for k in interior5.tolist() if cnt.get(k) != 7]
    assert not bad


def test_aperture7_scaling_and_rotation():
    """One resolution step scales the lattice by 1/sqrt(7) and rotates
    it by -atan(sqrt(3)/5) ~= -19.106605 degrees (the H3 Class II/III
    angle)."""
    c0 = H.hex_cell_id(np.array([0.0]), np.array([0.0]), 1)
    res, q, r = H.hex_decode(c0)
    nx, ny = H.hex_center(H._encode_np(res, q + 1, r))
    ox, oy = H.hex_center(c0)
    vx, vy = nx[0] - ox[0], ny[0] - oy[0]
    ang = math.degrees(math.atan2(vy, vx))
    expect = -math.degrees(math.atan(math.sqrt(3.0) / 5.0))
    assert abs(ang - expect) < 1e-9
    assert abs(
        math.hypot(vx, vy) - H.BASE_SIZE * math.sqrt(3.0 / 7.0)
    ) < 1e-9


@pytest.mark.parametrize("k", [0, 1, 2, 5])
def test_kring_counts(k):
    cid = int(H.hex_cell_id(np.array([12.3]), np.array([-4.5]), 7)[0])
    ring = H.hex_kring(cid, k)
    assert len(ring) == 1 + 3 * k * (k + 1)
    assert len(set(ring.tolist())) == len(ring)
    assert cid in ring.tolist()


def test_boundary_geometry_and_no_cracks():
    cid = np.unique(H.hex_cell_id(XS[:400], YS[:400], 8))[:100]
    v = H.hex_boundary(cid)
    cx, cy = H.hex_center(cid)
    # vertex centroid is the center; signed shoelace area is positive
    # (CCW) and equals the regular-hex closed form 3*sqrt(3)/2 * R^2
    np.testing.assert_allclose(v.mean(axis=1)[:, 0], cx, atol=1e-9)
    np.testing.assert_allclose(v.mean(axis=1)[:, 1], cy, atol=1e-9)
    xs, ys = v[..., 0], v[..., 1]
    sa = 0.5 * np.sum(
        xs * np.roll(ys, -1, axis=1) - np.roll(xs, -1, axis=1) * ys,
        axis=1,
    )
    R = np.hypot(xs[:, 0] - cx, ys[:, 0] - cy)
    assert (sa > 0).all()
    # rtol: the shoelace of a ~0.013-unit hex centered ~180 units from
    # the origin cancels ~4 digits; 1e-6 is still far tighter than any
    # geometric defect could hide under
    np.testing.assert_allclose(sa, 1.5 * math.sqrt(3.0) * R**2, rtol=1e-6)
    # axial neighbors share exactly one edge (two vertices)
    res, q, r = H.hex_decode(cid)
    vb = H.hex_boundary(H._encode_np(res, q + 1, r))
    for i in range(len(cid)):
        d = np.linalg.norm(v[i][:, None, :] - vb[i][None, :, :], axis=2)
        assert (d < 1e-9).sum() == 2


def test_parent_is_nearest_parent_center():
    cid = np.unique(H.hex_cell_id(XS, YS, 9))[:300]
    pc = H.hex_parent(cid)
    cx, cy = H.hex_center(cid)
    for i in range(0, len(cid), 23):
        cands = H.hex_kring(int(pc[i]), 2)
        px, py = H.hex_center(cands)
        d = np.hypot(px - cx[i], py - cy[i])
        assert cands[int(np.argmin(d))] == pc[i]


def test_polyfill_center_semantics():
    ids = H.hex_polyfill(-10, -10, 10, 10, 5)
    x, y = H.hex_center(ids)
    assert ((x >= -10) & (x <= 10) & (y >= -10) & (y <= 10)).all()
    # completeness: every cell indexed from an interior point grid is
    # in the polyfill when its center is inside the bbox
    gx, gy = np.meshgrid(np.linspace(-9, 9, 40), np.linspace(-9, 9, 40))
    hit = np.unique(H.hex_cell_id(gx.ravel(), gy.ravel(), 5))
    hx, hy = H.hex_center(hit)
    inside = (hx >= -10) & (hx <= 10) & (hy >= -10) & (hy <= 10)
    assert set(hit[inside].tolist()) <= set(ids.tolist())


def test_polyfill_wkb_donut():
    """Polygon polyfill (H3 semantics: centers-in-polygon) respects
    holes and matches the brute bbox-enumerate + PIP answer."""
    from geocube_spark.geometry import wkb as W
    from geocube_spark.kernels.pip import points_in_wkb

    outer = np.array(
        [[0, -8], [8, 0], [0, 8], [-8, 0], [0, -8]], dtype=np.float64
    )
    inner = np.array(
        [[0, -3], [3, 0], [0, 3], [-3, 0], [0, -3]], dtype=np.float64
    )[::-1]
    blob = W.Geometry(W.POLYGON, [outer, inner]).to_wkb()
    ids = H.hex_polyfill_wkb(blob, 6)
    x, y = H.hex_center(ids)
    assert ((np.abs(x) + np.abs(y)) < 8).all()
    assert ((np.abs(x) + np.abs(y)) > 3).all()
    cand = H.hex_polyfill(-8, -8, 8, 8, 6)
    cx, cy = H.hex_center(cand)
    want = set(cand[points_in_wkb(cx, cy, blob)].tolist())
    assert set(ids.tolist()) == want


def test_compact_uncompact_roundtrip():
    """Compact replaces complete 7-sibling groups recursively: exact
    coverage (uncompact reproduces the input set), minimality (no
    complete group survives at any level), idempotence, mixed-res."""
    ids = H.hex_polyfill(-20, -20, 20, 20, 6)
    comp = H.hex_compact(ids)
    assert len(comp) < len(ids) // 10  # interior compacts hard
    assert np.array_equal(H.hex_uncompact(comp, 6), np.sort(ids))
    res, _q, _r = H.hex_decode(comp)
    for lvl in range(int(res.max()), 0, -1):
        at = comp[res == lvl]
        if len(at):
            _u, c = np.unique(H.hex_parent(at), return_counts=True)
            assert (c < 7).all()
    assert np.array_equal(H.hex_compact(comp), comp)
    mixed = np.concatenate(
        [comp[:10], H.hex_children(comp[10:12]).ravel()]
    )
    assert np.array_equal(
        np.sort(H.hex_compact(mixed)), np.sort(comp[:12])
    )
    with pytest.raises(ValueError, match="coarser"):
        H.hex_uncompact(comp, 0)


def test_compact_cells_df_matches_numpy(spark):
    """The distributed compact (bounded groupBy-per-level DAG, no
    driver collect of cells) equals the numpy closed form."""
    ids = H.hex_polyfill(-12, -12, 12, 12, 5)
    df = spark.createDataFrame(
        pd.DataFrame({"cell": ids}), "cell long"
    )
    got = np.sort(
        H.compact_cells_df(df).toPandas()["cell"].values
    )
    assert np.array_equal(got, H.hex_compact(ids))
    # mixed resolutions through the distributed path too
    comp = H.hex_compact(ids)
    mixed = np.concatenate(
        [comp[:20], H.hex_children(comp[20:23]).ravel()]
    )
    got2 = np.sort(
        H.compact_cells_df(
            spark.createDataFrame(
                pd.DataFrame({"cell": mixed}), "cell long"
            )
        )
        .toPandas()["cell"]
        .values
    )
    assert np.array_equal(got2, H.hex_compact(mixed))


def test_validation_errors():
    with pytest.raises(ValueError, match="res"):
        H.hex_cell_id(XS[:2], YS[:2], 16)
    with pytest.raises(ValueError, match="steps"):
        H.hex_parent(H.hex_cell_id(XS[:2], YS[:2], 3), steps=0)
    with pytest.raises(ValueError, match="resolution"):
        H.hex_parent(H.hex_cell_id(XS[:2], YS[:2], 1), steps=2)
    with pytest.raises(ValueError, match="max_cells"):
        H.hex_polyfill(-180, -90, 180, 90, 12)
    with pytest.raises(ValueError, match="MAX_RES"):
        H.hex_children(H.hex_cell_id(XS[:2], YS[:2], 15))


@given(
    st.floats(-1e4, 1e4, allow_nan=False),
    st.floats(-1e4, 1e4, allow_nan=False),
    st.integers(0, 12),
)
@settings(max_examples=150, deadline=None, derandomize=True)
def test_fuzz_assignment_is_nearest_center(x, y, res):
    """Cube rounding assigns every point to the hex whose center is
    nearest (up to exact ties on cell boundaries, which the fixed
    floor(+0.5) tie rule resolves deterministically)."""
    cid = H.hex_cell_id(np.array([x]), np.array([y]), res)
    ring = H.hex_kring(int(cid[0]), 1)
    cx, cy = H.hex_center(ring)
    d = np.hypot(cx - x, cy - y)
    own = float(d[ring.tolist().index(int(cid[0]))])
    assert own <= d.min() + 1e-9


# ---------------------------------------------------------------------------
# three-form cross-checks
# ---------------------------------------------------------------------------


def _frame(n=5000, seed=11):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "x": rng.uniform(-180, 180, n),
            "y": rng.uniform(-89, 89, n),
        }
    )


@pytest.mark.parametrize("res,pres", [(8, 6), (15, 13), (5, 4)])
def test_column_program_matches_numpy(spark, res, pres):
    pdf = _frame()
    df = spark.createDataFrame(pdf)
    out = (
        df.select(
            "event_id",
            H.hex_cell_id_col(F.col("x"), F.col("y"), res).alias("c"),
        )
        .withColumn("p", H.hex_parent_col(F.col("c"), res - pres))
        .orderBy("event_id")
        .toPandas()
    )
    np_cell = H.hex_cell_id(pdf.x.values, pdf.y.values, res)
    assert np.array_equal(out.c.values, np_cell)
    assert np.array_equal(out.p.values, H.hex_parent(np_cell, res - pres))


def test_staged_parent_matches_numpy_deep_chain(spark):
    """15 resolution steps in one plan: the staged helper keeps the
    analyzed tree linear where the pure-Column form is capped at 3."""
    pdf = _frame(1000)
    df = spark.createDataFrame(pdf).select(
        "event_id",
        H.hex_cell_id_col(F.col("x"), F.col("y"), 15).alias("c"),
    )
    out = (
        H.with_hex_parent(df, "c", 15, "p").orderBy("event_id").toPandas()
    )
    np_cell = H.hex_cell_id(pdf.x.values, pdf.y.values, 15)
    assert np.array_equal(out.c.values, np_cell)
    assert np.array_equal(out.p.values, H.hex_parent(np_cell, 15))
    with pytest.raises(ValueError, match="steps <= 2"):
        H.hex_parent_col(F.col("c"), 3)


@pytest.mark.parametrize("res,pres", [(8, 6), (15, 10)])
def test_duckdb_oracle_matches_numpy(res, pres):
    duckdb = pytest.importorskip("duckdb")
    pdf = _frame(seed=13)
    con = duckdb.connect()
    con.register("events", pdf)
    out = con.execute(H.hex_cover_sql("x", "y", res, pres, "events")).df()
    np_cell = H.hex_cell_id(pdf.x.values, pdf.y.values, res)
    assert np.array_equal(out.hex_cell.values, np_cell)
    assert np.array_equal(
        out.hex_parent.values, H.hex_parent(np_cell, res - pres)
    )


@given(
    st.floats(0.5, 5000.0, allow_nan=False),
    st.integers(0, 12),
    st.integers(0, 4),
)
@settings(max_examples=40, deadline=None, derandomize=True)
def test_fuzz_duckdb_oracle_any_base_size(base, res, dp):
    """The SQL generator and numpy agree bit-for-bit for ANY base_size
    and parent depth, not just the query defaults."""
    import duckdb

    pres = max(0, res - dp)
    pdf = _frame(400, seed=7)
    con = duckdb.connect()
    con.register("events", pdf)
    out = con.execute(
        H.hex_cover_sql("x", "y", res, pres, "events", base_size=base)
    ).df()
    np_cell = H.hex_cell_id(pdf.x.values, pdf.y.values, res, base)
    want_par = (
        np_cell if pres == res else H.hex_parent(np_cell, res - pres)
    )
    assert np.array_equal(out.hex_cell.values, np_cell)
    assert np.array_equal(out.hex_parent.values, want_par)


def test_streaming_hex_rollup_matches_batch(spark, tmp_path):
    """The hex index is a pure Column program, so it composes with
    Structured Streaming as a stateful aggregation key: an
    availableNow stream over two parquet micro-batches grouped by the
    res-2 ancestor equals the batch answer exactly."""
    import os

    from pyspark.sql import types as T

    in_dir = str(tmp_path / "hex_in")
    os.makedirs(in_dir)
    pdf = _frame(4000, seed=99)
    pdf["value"] = np.arange(4000, dtype=np.float64) * 0.25
    half = len(pdf) // 2
    spark.createDataFrame(pdf.iloc[:half]).coalesce(1).write.parquet(
        f"{in_dir}/b1"
    )
    spark.createDataFrame(pdf.iloc[half:]).coalesce(1).write.parquet(
        f"{in_dir}/b2"
    )
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("x", T.DoubleType()),
            T.StructField("y", T.DoubleType()),
            T.StructField("value", T.DoubleType()),
        ]
    )

    def keyed(df):
        cells = df.select(
            H.hex_cell_id_col(F.col("x"), F.col("y"), 5).alias("c"),
            "value",
        )
        return (
            H.with_hex_parent(cells, "c", 3, "p")
            .groupBy("p")
            .agg(
                F.count("*").alias("n"),
                F.round(F.sum("value"), 6).alias("s"),
            )
        )

    q = (
        keyed(spark.readStream.schema(schema).parquet(f"{in_dir}/*"))
        .writeStream.format("memory")
        .queryName("hexroll_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = (
        spark.sql("SELECT * FROM hexroll_stream")
        .orderBy("p")
        .toPandas()
    )
    want = keyed(spark.createDataFrame(pdf)).orderBy("p").toPandas()
    assert np.array_equal(got.p.values, want.p.values)
    assert np.array_equal(got.n.values, want.n.values)
    np.testing.assert_allclose(got.s.values, want.s.values, atol=1e-6)


def test_hex_cover_df_matches_numpy_polyfill(spark):
    """The distributed envelope polyfill (pure-JVM sequence/explode)
    returns exactly the numpy hex_polyfill set per row."""
    rng = np.random.default_rng(5)
    rows = []
    for i in range(12):
        x0, y0 = rng.uniform(-100, 80), rng.uniform(-60, 40)
        rows.append(
            {
                "box_id": i,
                "minx": x0,
                "miny": y0,
                "maxx": x0 + rng.uniform(0.5, 25),
                "maxy": y0 + rng.uniform(0.5, 25),
            }
        )
    pdf = pd.DataFrame(rows)
    out = (
        H.hex_cover_df(spark.createDataFrame(pdf), 5)
        .groupBy("box_id")
        .agg(F.collect_list("hex_cell").alias("cells"))
        .toPandas()
        .set_index("box_id")
    )
    for r in rows:
        want = set(
            H.hex_polyfill(
                r["minx"], r["miny"], r["maxx"], r["maxy"], 5
            ).tolist()
        )
        got = set(out.loc[r["box_id"], "cells"])
        assert got == want, r["box_id"]
    # stays JVM-side
    plan = (
        H.hex_cover_df(spark.createDataFrame(pdf), 5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan and "InPandas" not in plan


def test_hex_cover_df_pad_is_join_superset(spark):
    """With pad = the res-k circumradius, the envelope cover contains
    the cell of EVERY point inside the envelope — the guarantee a
    hex-bucketed join needs (pad=0 polyfill covers can miss boundary
    cells whose center falls just outside)."""
    res = 6
    rng = np.random.default_rng(17)
    env = {"box_id": 0, "minx": 3.2, "miny": -7.7, "maxx": 19.9,
           "maxy": 4.1}
    pad = H.BASE_SIZE / (7.0 ** (res / 2.0))
    cover = set(
        H.hex_cover_df(
            spark.createDataFrame(pd.DataFrame([env])), res, pad=pad
        )
        .toPandas()["hex_cell"]
        .values.tolist()
    )
    px = rng.uniform(env["minx"], env["maxx"], 20000)
    py = rng.uniform(env["miny"], env["maxy"], 20000)
    cells = set(np.unique(H.hex_cell_id(px, py, res)).tolist())
    assert cells <= cover
    # and pad=0 is strictly smaller (polyfill semantics)
    cover0 = set(
        H.hex_cover_df(
            spark.createDataFrame(pd.DataFrame([env])), res
        )
        .toPandas()["hex_cell"]
        .values.tolist()
    )
    assert cover0 < cover


def test_column_program_is_pure_catalyst(spark):
    """The scan side must stay in Tungsten codegen: no Python eval
    nodes in the hex cover plan."""
    df = spark.createDataFrame(_frame(100))
    out = df.select(
        H.hex_cell_id_col(F.col("x"), F.col("y"), 8).alias("c")
    ).withColumn("p", H.hex_parent_col(F.col("c"), 2))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "InPandas" not in plan
