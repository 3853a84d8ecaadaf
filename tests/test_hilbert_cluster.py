"""Hilbert-clustered snapshot writes: parity + real file skipping.

The point of ``write_cube(cluster=...)`` is measurable: a small 2-D
window over a row-major layout overlaps almost every data file's
``tile_id`` [min, max] (one short id run per tile ROW), while the
hilbert layout concentrates the window into a handful of contiguous
``cluster_key`` runs, so most files' stats fall outside the window
predicate and the parquet reader never opens them.  The test asserts
both the exact-result parity AND the stats-level skip ratio from the
files' own parquet metadata (pyarrow) — the same min/max the Spark
scan consults.
"""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from geocube_spark.geometry.affine import Affine
from geocube_spark.geometry.crs import CRS
from geocube_spark.grid.geobox import GeoBox
from geocube_spark.grid.hilbert import hilbert_ranges
from geocube_spark.plans import checkpoint as CP

TILE = 16
NTX = NTY = 32  # 1024 tiles on a 512x512 grid


@pytest.fixture(scope="module")
def geobox():
    return GeoBox(
        NTX * TILE, NTY * TILE,
        Affine(1.0, 0.0, 0.0, 0.0, -1.0, float(NTY * TILE)),
        CRS.from_user_input("EPSG:32615"),
    )


@pytest.fixture(scope="module")
def chunks(spark, geobox):
    rows = []
    for tid, row0, col0, h, w in geobox.tile_grid(TILE):
        rows.append((
            "band", 12, int(tid), "", int(row0), int(col0), int(h),
            int(w), int(tid), int(tid),
            [float(tid)] * (h * w),
        ))
    # shuffle: at scale chunk arrival order is arbitrary, so the
    # row-major layout must not inherit accidental locality from
    # createDataFrame's in-order partition split
    rng = np.random.default_rng(42)
    rows = [rows[i] for i in rng.permutation(len(rows))]
    df = spark.createDataFrame(
        rows,
        "measurement string, zoom int, tile_id long, group_key string,"
        " row0 int, col0 int, h int, w int, min_seq long, max_seq long,"
        " values array<double>",
    )
    return df


def _parquet_files(path):
    out = []
    for root, _dirs, files in os.walk(os.path.join(path, "data")):
        out += [os.path.join(root, f) for f in files
                if f.endswith(".parquet")]
    return out


def _rowgroup_stats(files, col):
    """(min, max) of ``col`` per row group across ``files``."""
    stats = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i
                 for i in range(md.num_columns)}
        ci = names[col]
        for rg in range(md.num_row_groups):
            s = md.row_group(rg).column(ci).statistics
            stats.append((s.min, s.max))
    return stats


def test_clustered_window_parity_and_skipping(spark, geobox, chunks,
                                              tmp_path):
    plain = str(tmp_path / "plain")
    clustered = str(tmp_path / "hilbert")
    CP.write_cube(chunks, plain, n_buckets=8, commit_batches=2)
    CP.write_cube(
        chunks, clustered, n_buckets=8, commit_batches=2,
        cluster={"scheme": "hilbert", "ntx": NTX, "nty": NTY,
                 "n_files": 8},
    )

    # a city-sized window: the 4x4 tile rect tx 5..8, ty 5..8 out of
    # 32x32 (pixel rows 80..143 under the north-up affine)
    bbox = (5 * TILE, NTY * TILE - 143, 9 * TILE - 1, NTY * TILE - 80)
    a = CP.read_cube_window(spark, plain, geobox, TILE, bbox)
    b = CP.read_cube_window(spark, clustered, geobox, TILE, bbox)
    ta = sorted(r["tile_id"] for r in a.select("tile_id").collect())
    tb = sorted(r["tile_id"] for r in b.select("tile_id").collect())
    assert ta == tb and len(ta) > 0

    # stats-level skipping: count row groups whose [min,max] interval
    # intersects the window predicate in each layout
    ranges = hilbert_ranges(5, 8, 5, 8, 5, max_ranges=32)

    plain_stats = _rowgroup_stats(_parquet_files(plain), "tile_id")
    keep_ids = {
        tid for tid in range(NTX * NTY)
        if 5 <= tid % NTX <= 8 and 5 <= tid // NTX <= 8
    }
    plain_hit = sum(
        1 for lo, hi in plain_stats
        if any(lo <= t <= hi for t in keep_ids)
    )

    clus_stats = _rowgroup_stats(_parquet_files(clustered),
                                 "cluster_key")
    clus_hit = sum(
        1 for lo, hi in clus_stats
        if any(not (r1 < lo or r0 > hi) for r0, r1 in ranges)
    )
    # row-major over arbitrary-order input: every row group's
    # tile_id [min,max] spans nearly the full id space, so the window
    # prunes (almost) nothing; hilbert: each batch range-partitions
    # into n_files contiguous key runs and the 4x4-tile window's key
    # ranges land in ~2 of 8, so >=70% of row groups are skipped
    assert plain_hit >= 0.9 * len(plain_stats)
    assert clus_hit <= 0.3 * len(clus_stats)
    assert (clus_hit / len(clus_stats)) < 0.5 * (
        plain_hit / len(plain_stats))


def test_manifest_file_pruning(spark, geobox, chunks, tmp_path):
    """Level-1 pruning: the windowed reader hands Spark ONLY the data
    files whose manifest-recorded stats can intersect the window —
    checked via inputFiles(), i.e. what the scan would actually open."""
    clustered = str(tmp_path / "h")
    CP.write_cube(
        chunks, clustered, n_buckets=8, commit_batches=2,
        cluster={"scheme": "hilbert", "ntx": NTX, "nty": NTY,
                 "n_files": 8},
    )
    total = len(_parquet_files(clustered))
    manifests = CP.snapshots(clustered)
    assert all("files" in m for m in manifests)
    assert sum(len(m["files"]) for m in manifests) == total
    # every entry carries both stat columns
    for m in manifests:
        for ent in m["files"]:
            assert "tile_id" in ent and "cluster_key" in ent

    bbox = (5 * TILE, NTY * TILE - 143, 9 * TILE - 1, NTY * TILE - 80)
    got = CP.read_cube_window(spark, clustered, geobox, TILE, bbox)
    opened = got.inputFiles()
    assert 0 < len(opened) <= 0.5 * total
    want = {
        tid for tid in range(NTX * NTY)
        if 5 <= tid % NTX <= 8 and 5 <= tid // NTX <= 8
    }
    tiles = {r["tile_id"] for r in got.select("tile_id").collect()}
    assert tiles == want


def test_window_read_without_file_stats_falls_back(spark, geobox,
                                                   chunks, tmp_path):
    """Tables written before manifests recorded per-file stats still
    read correctly (dir-level read + predicate pruning only)."""
    import json as J

    path = str(tmp_path / "legacy")
    CP.write_cube(
        chunks, path, n_buckets=8, commit_batches=2,
        cluster={"scheme": "hilbert", "ntx": NTX, "nty": NTY,
                 "n_files": 8},
    )
    mdir = os.path.join(path, "_manifests")
    for name in os.listdir(mdir):
        if not name.endswith(".json"):
            continue
        fp = os.path.join(mdir, name)
        with open(fp) as f:
            m = J.load(f)
        m.pop("files", None)
        with open(fp, "w") as f:
            J.dump(m, f)
    bbox = (5 * TILE, NTY * TILE - 143, 9 * TILE - 1, NTY * TILE - 80)
    got = CP.read_cube_window(spark, path, geobox, TILE, bbox)
    want = {
        tid for tid in range(NTX * NTY)
        if 5 <= tid % NTX <= 8 and 5 <= tid // NTX <= 8
    }
    assert {r["tile_id"] for r in got.select("tile_id").collect()} == want


def test_cluster_resume_param_mismatch(spark, chunks, tmp_path):
    path = str(tmp_path / "c")
    spec = {"scheme": "hilbert", "ntx": NTX, "nty": NTY}
    with pytest.raises(RuntimeError, match="injected"):
        CP.write_cube(chunks, path, n_buckets=8, commit_batches=2,
                      fail_after=1, cluster=spec)
    with pytest.raises(ValueError, match="cluster"):
        CP.write_cube(chunks, path, n_buckets=8, commit_batches=2)
    # matching spec resumes cleanly
    rep = CP.write_cube(chunks, path, n_buckets=8, commit_batches=2,
                        cluster=spec)
    assert rep.skipped_snapshots == [0]
    assert len(rep.committed_snapshots) == 1
    back = CP.read_cube(spark, path)
    assert back.count() == chunks.count()


def test_compaction_preserves_clustering(spark, geobox, chunks,
                                         tmp_path):
    path = str(tmp_path / "c2")
    spec = {"scheme": "hilbert", "ntx": NTX, "nty": NTY, "n_files": 8}
    CP.write_cube(chunks, path, n_buckets=8, commit_batches=2,
                  cluster=spec)
    rep = CP.compact_snapshots(spark, path)
    assert len(rep.committed_snapshots) == 1
    manifests = CP.snapshots(path)
    assert manifests[-1]["kind"] == "compaction"
    assert manifests[-1]["cluster"]["scheme"] == "hilbert"
    # windowed read on the compacted table still prunes + matches
    bbox = (5 * TILE, NTY * TILE - 143, 9 * TILE - 1, NTY * TILE - 80)
    got = CP.read_cube_window(spark, path, geobox, TILE, bbox)
    want = {
        tid for tid in range(NTX * NTY)
        if 5 <= tid % NTX <= 8 and 5 <= tid // NTX <= 8
    }
    tiles = {r["tile_id"] for r in got.select("tile_id").collect()}
    assert tiles <= want and len(tiles) > 0
    # values survive the trip
    s = got.agg(F.sum(F.element_at("values", 1)).alias("s")).collect()
    assert s[0]["s"] == float(sum(tiles))


def test_window_read_rejects_mismatched_tile_grid(spark, geobox,
                                                  chunks, tmp_path):
    """cluster_key was computed on the write-time tile grid; pruning
    with a different grid would silently drop in-window rows, so the
    reader must raise instead (review regression)."""
    path = str(tmp_path / "hilbert_guard")
    CP.write_cube(
        chunks, path, n_buckets=8, commit_batches=1,
        cluster={"scheme": "hilbert", "ntx": NTX, "nty": NTY,
                 "n_files": 4},
    )
    bbox = (5 * TILE, NTY * TILE - 143, 9 * TILE - 1, NTY * TILE - 80)
    with pytest.raises(ValueError, match="clustered on"):
        CP.read_cube_window(spark, path, geobox, TILE * 2, bbox)
