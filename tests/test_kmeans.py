"""Fixed-iteration Lloyd k-means (functions.similarity.kmeans):
scalar replay parity, determinism under repartition, validation."""

import numpy as np
import pytest

from geocube_spark.functions.similarity import kmeans


def _replay(ids, X, k, iters):
    """Scalar replica of the engine's exact algorithm: exemplar seeds
    (smallest (h60(id), id)), rounded-argmin assignment, mean update,
    empty clusters keep their centroid."""
    from geocube_spark.functions.dedup import _h60_py

    order = sorted(range(len(ids)), key=lambda i: (_h60_py(str(ids[i])),
                                                   ids[i]))
    C = X[order[:k]].copy()

    def assign(C):
        d2 = ((X * X).sum(1)[:, None] - 2 * X @ C.T
              + (C * C).sum(1)[None, :])
        d2r = np.round(d2 + 1e-9, 6)
        cid = d2r.argmin(axis=1)
        return cid, d2r[np.arange(len(X)), cid]

    for _ in range(iters):
        cid, _ = assign(C)
        for c in range(len(C)):
            sel = X[cid == c]
            if len(sel):
                C[c] = sel.mean(axis=0)
    cid, d2 = assign(C)
    return {int(i): (int(c), float(d)) for i, c, d in zip(ids, cid, d2)}


def _df(spark, ids, X, parts=1):
    rows = [(int(i), [float(v) for v in x]) for i, x in zip(ids, X)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df.repartition(parts) if parts > 1 else df


def test_kmeans_matches_scalar_replay(spark):
    rng = np.random.default_rng(7)
    # 3 well-separated blobs + noise, float32 quantized like parquet
    X = np.concatenate([
        rng.normal(0, 0.5, (30, 8)),
        rng.normal(6, 0.5, (25, 8)),
        rng.normal(-6, 0.5, (25, 8)),
    ]).astype(np.float32).astype(np.float64)
    ids = np.arange(80)
    want = _replay(ids, X, 4, 2)
    for parts in (1, 7):
        got = {r["id"]: (r["cluster"], r["d2"])
               for r in kmeans(_df(spark, ids, X, parts),
                               k=4, iters=2).collect()}
        assert got == want


def test_kmeans_separated_blobs_recovered(spark):
    rng = np.random.default_rng(3)
    X = np.concatenate([
        rng.normal(0, 0.2, (40, 6)),
        rng.normal(10, 0.2, (40, 6)),
    ]).astype(np.float64)
    ids = np.arange(80)
    got = {r["id"]: r["cluster"]
           for r in kmeans(_df(spark, ids, X), k=2, iters=3).collect()}
    a = {got[i] for i in range(40)}
    b = {got[i] for i in range(40, 80)}
    assert len(a) == 1 and len(b) == 1 and a != b


def test_kmeans_validation(spark):
    df = _df(spark, [1], np.zeros((1, 4)))
    with pytest.raises(ValueError, match="k must"):
        kmeans(df, k=0)
    with pytest.raises(ValueError, match="iters"):
        kmeans(df, iters=0)
    with pytest.raises(ValueError, match="empty"):
        kmeans(df.where("vec_id < 0"), k=2)
    # corpus smaller than k: as many clusters as rows, still labeled
    out = kmeans(df, k=5, iters=1).collect()
    assert len(out) == 1 and out[0]["d2"] == 0.0


def test_iso_cluster_separates_band_regimes(spark):
    """Two synthetic bands with two obvious regimes: iso_cluster with
    k=2 must split them; cells missing EITHER band are excluded;
    grouped cubes are rejected."""
    from geocube_spark.bandops import iso_cluster
    from geocube_spark.cube import CHUNK_SCHEMA, BandMeta, GeoCube
    from geocube_spark.geometry.affine import Affine
    from geocube_spark.geometry.crs import CRS
    from geocube_spark.grid.geobox import GeoBox

    H = W = 16
    gb = GeoBox(W, H, Affine(1.0, 0.0, 0.0, 0.0, -1.0, 0.0), CRS(4326))
    a = np.where(np.arange(H)[:, None] < 8, 10.0, 100.0) \
        + np.zeros((H, W))
    b = np.where(np.arange(H)[:, None] < 8, 5.0, 50.0) \
        + np.zeros((H, W))
    a[0, 0] = np.nan  # missing band-a cell -> excluded

    def _rows(name, arr):
        out = []
        for tid, r0, c0, h, w in gb.tile_grid(8):
            sub = arr[r0:r0 + h, c0:c0 + w]
            out.append((name, None, 0, int(tid), int(r0), int(c0),
                        int(h), int(w),
                        [float(v) for v in sub.ravel()], 1, h * w,
                        0, 0))
        return out

    cube = GeoCube(
        chunks=spark.createDataFrame(_rows("a", a) + _rows("b", b),
                                     CHUNK_SCHEMA),
        geobox=gb,
        bands={"a": BandMeta("a", "float64", float("nan")),
               "b": BandMeta("b", "float64", float("nan"))},
        tile_size=8, fill=float("nan"),
    )
    got = {(r["row"], r["col"]): r["cluster"]
           for r in iso_cluster(cube, ["a", "b"], k=2,
                                iters=3).collect()}
    assert (0, 0) not in got and len(got) == H * W - 1
    top = {got[(r, c)] for r in range(8) for c in range(W)
           if (r, c) in got}
    bot = {got[(r, c)] for r in range(8, H) for c in range(W)}
    assert len(top) == 1 and len(bot) == 1 and top != bot

    import pytest as _pt
    with _pt.raises(ValueError, match="unknown band"):
        iso_cluster(cube, ["nope"])
    with _pt.raises(ValueError, match="at least one"):
        iso_cluster(cube, [])
