"""S2-scheme spherical cell index: the three implementations (numpy,
Spark Column fold, DuckDB SQL) must agree bit-for-bit, and the index
must satisfy the structural invariants that make it usable as a
distributed bucketing key (hierarchy-by-prefix, Hilbert locality,
area balance)."""

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geocube_spark.grid import s2

RNG = np.random.default_rng(20260818)
N = 4000
LON = RNG.uniform(-180.0, 180.0, N)
LAT = RNG.uniform(-89.9, 89.9, N)


def test_hilbert_tables_bijective_and_unit_step():
    """Validates the traversal tables themselves: on every face the
    level-5 curve visits each cell exactly once and every consecutive
    pair of curve positions is edge-adjacent (|di| + |dj| = 1) — the
    defining property of a Hilbert ordering."""
    L, n = 5, 32
    ii, jj = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    for face in range(6):
        pos = s2.hilbert_pos(
            np.full(ii.size, face), ii.ravel(), jj.ravel(), L
        )
        assert len(np.unique(pos)) == n * n
        order = np.argsort(pos)
        io, jo = ii.ravel()[order], jj.ravel()[order]
        step = np.abs(np.diff(io)) + np.abs(np.diff(jo))
        assert (step == 1).all()
        i2, j2 = s2.hilbert_ij(np.full(n * n, face), pos, L)
        assert (i2 == ii.ravel()).all() and (j2 == jj.ravel()).all()


def test_face_selection_axes():
    lon = np.array([0.0, 90.0, 0.0, 180.0, -90.0, 0.0])
    lat = np.array([0.0, 0.0, 90.0, 0.0, 0.0, -90.0])
    face, _, _ = s2.xyz_to_face_uv(*s2.lonlat_to_xyz(lon, lat))
    assert face.tolist() == [0, 1, 2, 3, 4, 5]


def test_compact_parent_is_prefix():
    c12 = s2.compact_cell_id(LON, LAT, 12)
    c5 = s2.compact_cell_id(LON, LAT, 5)
    assert (s2.compact_parent(c12, 12, 5) == c5).all()


def test_center_round_trip():
    c12 = s2.compact_cell_id(LON, LAT, 12)
    lon_c, lat_c = s2.compact_cell_center(c12, 12)
    assert (s2.compact_cell_id(lon_c, lat_c, 12) == c12).all()
    # the center really is inside: its level-30 cell descends from it
    c30 = s2.compact_cell_id(lon_c, lat_c, 30)
    assert (s2.compact_parent(c30, 30, 12) == c12).all()


def test_canonical_layout_and_parent():
    k12 = s2.cell_id(LON, LAT, 12)
    assert (s2.cell_id_level(k12) == 12).all()
    assert (s2.cell_id_parent(k12, 5) == s2.cell_id(LON, LAT, 5)).all()
    # canonical sort order == compact sort order face-by-face
    c12 = s2.compact_cell_id(LON, LAT, 12)
    for face in range(6):
        m = (c12 >> 24) == face
        if m.sum() > 1:
            assert (
                np.argsort(k12[m].view(np.uint64))
                == np.argsort(c12[m])
            ).all()
    tok = s2.cell_token(k12[0])
    assert 1 <= len(tok) <= 16 and not tok.endswith("0")


def test_area_balance_at_level_2():
    """The quadratic ST transform keeps cell areas within a small
    constant factor globally (the reason S2 beats plain lat/lon tiling
    for skew): sampled uniformly on the sphere, level-2 cell counts
    stay within ~1.6x of each other."""
    rng = np.random.default_rng(5)
    u = rng.uniform(-1, 1, 300_000)
    th = rng.uniform(-np.pi, np.pi, 300_000)
    c2 = s2.compact_cell_id(
        np.degrees(th), np.degrees(np.arcsin(u)), 2
    )
    counts = np.bincount(c2, minlength=6 * 16)
    assert (counts > 0).all()   # all 96 level-2 cells hit
    assert counts.max() / counts.min() < 1.6


def test_column_form_matches_numpy(spark):
    pdf = pd.DataFrame({"id": np.arange(N), "lon": LON, "lat": LAT})
    df = spark.createDataFrame(pdf)
    cell = s2.s2_cell_id_col(F.col("lon"), F.col("lat"), 12)
    out = (
        df.select(
            "id",
            cell.alias("c"),
            s2.s2_parent_col(cell, 12, 5).alias("p"),
        )
        .toPandas()
        .sort_values("id")
    )
    assert (out["c"].values == s2.compact_cell_id(LON, LAT, 12)).all()
    assert (out["p"].values == s2.compact_cell_id(LON, LAT, 5)).all()


@pytest.fixture()
def _duck():
    con = duckdb.connect()
    yield con
    con.close()


def test_sql_oracle_matches_numpy(_duck):
    pts_df = pd.DataFrame(
        {"event_id": np.arange(N), "lon": LON, "lat": LAT}
    )
    _duck.register("pts", pts_df)
    q = s2.s2_cover_sql("lon", "lat", 12, 5, "pts")
    out = _duck.execute(q).df().sort_values("event_id")
    assert (
        out["s2_cell"].values == s2.compact_cell_id(LON, LAT, 12)
    ).all()
    assert (
        out["s2_parent"].values == s2.compact_cell_id(LON, LAT, 5)
    ).all()


def test_edge_cases_poles_antimeridian_face_boundaries():
    """Degenerate inputs every lon/lat corpus contains: poles (cos=0),
    the antimeridian, the equator/prime-meridian face seams, and face
    centers — all three implementations must agree and produce valid
    ids with the prefix property intact."""
    lon = np.array([0.0, 180.0, -180.0, 179.999999, -179.999999,
                    0.0, 0.0, 45.0, -45.0, 135.0, 90.0, -90.0,
                    45.0, 0.0, 1e-12, -1e-12])
    lat = np.array([90.0, 90.0, -90.0, 0.0, 0.0,
                    -90.0, 0.0, 0.0, 0.0, 0.0, 45.0, -45.0,
                    35.26438968275465, 45.0, 0.0, 0.0])
    for level in (1, 12, 29):
        c = s2.compact_cell_id(lon, lat, level)
        n_cells = 6 << (2 * level)
        assert ((c >= 0) & (c < n_cells)).all()
        if level > 5:
            assert (
                s2.compact_parent(c, level, 5)
                == s2.compact_cell_id(lon, lat, 5)
            ).all()
    # the antimeridian seam: sin(+pi_float) = +1.2e-16 while
    # sin(-pi_float) = -1.2e-16, so +180 and -180 land on OPPOSITE
    # sides of the face-3 cell boundary (real S2 behaves the same —
    # normalize longitude to [-180, 180) upstream for canonical ids).
    # They must still be immediate curve-order neighbors, not far apart
    c180 = s2.compact_cell_id(np.array([180.0, -180.0]),
                              np.array([17.3, 17.3]), 12)
    lo0, la0 = s2.compact_cell_center(c180[:1], 12)
    lo1, la1 = s2.compact_cell_center(c180[1:], 12)
    width_deg = 360.0 / (1 << 12)
    dlon = abs(abs(lo0[0]) - abs(lo1[0]))  # both near +/-180
    assert dlon < 2 * width_deg and abs(la0[0] - la1[0]) < 2 * width_deg
    # canonical ids stay valid at the poles
    k = s2.cell_id(lon, lat, 12)
    assert (s2.cell_id_level(k) == 12).all()


def test_edge_cases_sql_and_column_agree(spark, _duck):
    lon = np.array([0.0, 180.0, -180.0, 179.999999, 0.0, 90.0,
                    -90.0, 45.0, 1e-12, -135.0])
    lat = np.array([90.0, -90.0, 0.0, 0.0, -90.0, 45.0, -45.0,
                    35.26438968275465, 0.0, 52.5])
    exp = s2.compact_cell_id(lon, lat, 12)
    pdf = pd.DataFrame({"event_id": np.arange(len(lon)),
                        "lon": lon, "lat": lat})
    _duck.register("edge_pts", pdf)
    got_sql = (
        _duck.execute(s2.s2_cover_sql("lon", "lat", 12, 5, "edge_pts"))
        .df().sort_values("event_id")["s2_cell"].values
    )
    assert (got_sql == exp).all()
    out = (
        spark.createDataFrame(pdf)
        .select("event_id",
                s2.s2_cell_id_col(F.col("lon"), F.col("lat"), 12)
                .alias("c"))
        .toPandas().sort_values("event_id")
    )
    assert (out["c"].values == exp).all()


def test_cell_polygon_boundary():
    """The sampled cell boundary ring is closed and contains the
    cell's own center (checked with the engine's even-odd kernel);
    every ring vertex maps back to the cell itself or a direct
    neighbor (boundary points are shared)."""
    from geocube_spark.kernels.pip import points_in_edges, ring_edges

    rng = np.random.default_rng(4)
    lon = rng.uniform(-170, 170, 40)
    lat = rng.uniform(-80, 80, 40)
    cids = s2.compact_cell_id(lon, lat, 8)
    for cid in cids[:15]:
        ring = s2.compact_cell_polygon(cid, 8, n_seg=6)
        assert (ring[0] == ring[-1]).all()
        lo_c, la_c = s2.compact_cell_center(np.array([cid]), 8)
        # antimeridian-crossing rings aren't simple in lon space
        if ring[:, 0].max() - ring[:, 0].min() < 180:
            inside = points_in_edges(
                lo_c, la_c, *ring_edges([ring])
            )
            assert inside[0]
        # vertices (nudged inward) belong to the cell
        mid = ring[:-1].mean(axis=0)
        shrunk = mid + (ring[:-1] - mid) * 0.99
        back = s2.compact_cell_id(shrunk[:, 0], shrunk[:, 1], 8)
        assert (back == int(cid)).mean() > 0.9
