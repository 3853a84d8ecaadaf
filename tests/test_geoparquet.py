"""GeoParquet source/sink: spec metadata, roundtrip, bbox skipping."""

import json
import os

import numpy as np
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from geocube_spark.geometry import wkb as W
from geocube_spark.sources.geoparquet import (
    GeoParquetError,
    geoparquet_metadata,
    read_geoparquet,
    write_geoparquet,
)


@pytest.fixture(scope="module")
def vec_df(spark):
    rng = np.random.default_rng(9)
    xs = rng.uniform(-170, 170, 400)
    ys = rng.uniform(-80, 80, 400)
    blobs = W.points_to_wkb(xs, ys)
    rows = [
        (i, float(xs[i]), float(ys[i]), bytearray(blobs[i]))
        for i in range(400)
    ]
    return spark.createDataFrame(
        rows, "fid long, x double, y double, geom binary"
    ).repartition(4)


def test_parts_roundtrip_and_footer(spark, vec_df, tmp_path):
    path = str(tmp_path / "gpq")
    written = write_geoparquet(
        vec_df, path, wkb_col="geom", epsg=4326, covering=True
    )
    assert len(written) == 4
    # every file carries a valid spec footer with its OWN bbox
    for fp in written:
        md = pq.ParquetFile(fp).schema_arrow.metadata
        geo = json.loads(md[b"geo"].decode())
        assert geo["version"] == "1.1.0"
        assert geo["primary_column"] == "geom"
        cm = geo["columns"]["geom"]
        assert cm["encoding"] == "WKB"
        assert cm["geometry_types"] == ["Point"]
        assert cm["crs"] is None  # 4326 -> spec default (CRS84)
        assert len(cm["bbox"]) == 4
        assert cm["covering"]["bbox"]["xmin"] == ["bbox", "xmin"]

    back, meta = read_geoparquet(spark, path)
    assert meta["n_files"] == 4
    assert meta["crs_epsg"] == 4326
    got = {
        r["fid"]: (r["x2"], r["y2"])
        for r in back.select(
            "fid",
            F.col("bbox.xmin").alias("x2"),
            F.col("bbox.ymin").alias("y2"),
        ).collect()
    }
    want = {r["fid"]: (r["x"], r["y"]) for r in vec_df.collect()}
    assert got == want  # bbox covering column == exact point coords


def test_single_mode_and_projected_crs(spark, vec_df, tmp_path):
    path = str(tmp_path / "one.parquet")
    write_geoparquet(
        vec_df.limit(10), path, wkb_col="geom", epsg=32615,
        mode="single",
    )
    meta = geoparquet_metadata(path)
    assert meta["crs_epsg"] == 32615 and meta["n_files"] == 1
    geo = json.loads(
        pq.ParquetFile(path).schema_arrow.metadata[b"geo"].decode()
    )
    crs = geo["columns"]["geom"]["crs"]
    assert crs["id"] == {"authority": "EPSG", "code": 32615}
    assert crs["type"] == "ProjectedCRS"


def test_table_bbox_unions_across_files(spark, vec_df, tmp_path):
    path = str(tmp_path / "gpq2")
    write_geoparquet(vec_df, path, wkb_col="geom", epsg=4326)
    meta = geoparquet_metadata(path)
    xs = [r["x"] for r in vec_df.collect()]
    ys = [r["y"] for r in vec_df.collect()]
    np.testing.assert_allclose(
        meta["bbox"], [min(xs), min(ys), max(xs), max(ys)]
    )


def test_covering_column_prunes_rowgroups(spark, vec_df, tmp_path):
    """The spec's purpose: a filter on the bbox struct reaches parquet
    min/max stats. Sort by x so files have narrow x-ranges, then check
    the scan opens fewer files than the dataset holds."""
    path = str(tmp_path / "gpq3")
    write_geoparquet(
        vec_df.repartitionByRange(8, "x"), path, wkb_col="geom",
        epsg=4326, covering=True,
    )
    back, _ = read_geoparquet(spark, path)
    narrow = back.filter(
        (F.col("bbox.xmin") >= -10.0) & (F.col("bbox.xmax") <= 10.0)
    )
    rows = narrow.collect()
    want = [r for r in vec_df.collect() if -10.0 <= r["x"] <= 10.0]
    assert len(rows) == len(want)
    # file-level skipping via min/max stats on bbox.xmin
    all_files = set()
    for root, _d, names in os.walk(path):
        all_files |= {n for n in names if n.endswith(".parquet")}
    hit = 0
    for root, _d, names in os.walk(path):
        for n in names:
            if not n.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(root, n)).metadata
            idx = {
                md.schema.column(i).name: i
                for i in range(md.num_columns)
            }
            ci = idx["xmin"]  # leaf name of the bbox struct field
            s = md.row_group(0).column(ci).statistics
            if s.min <= 10.0 and s.max >= -10.0:
                hit += 1
    assert hit <= len(all_files) / 2


def test_null_geometry_and_errors(spark, tmp_path):
    df = spark.createDataFrame(
        [(0, bytearray(W.points_to_wkb([1.0], [2.0])[0])), (1, None)],
        "fid long, geom binary",
    ).coalesce(1)
    path = str(tmp_path / "gpq4")
    write_geoparquet(df, path, wkb_col="geom", covering=True)
    back, meta = read_geoparquet(spark, path)
    assert back.count() == 2
    assert back.filter(F.col("bbox").isNull()).count() == 1
    assert meta["geometry_types"] == ["Point"]

    with pytest.raises(GeoParquetError, match="geometry column"):
        write_geoparquet(df, str(tmp_path / "x"), wkb_col="nope")
    # plain parquet (no geo footer) is rejected with a clear error
    plain = str(tmp_path / "plain")
    df.drop("geom").write.parquet(plain)
    with pytest.raises(GeoParquetError, match="geo"):
        geoparquet_metadata(plain)


def _rewrite_crs_id(src: str, dst: str, ident):
    """Copy a GeoParquet file, replacing the crs id object in the geo
    footer — simulates third-party writers."""
    import pyarrow as pa

    pf = pq.ParquetFile(src)
    tbl = pf.read()
    md = dict(tbl.schema.metadata or {})
    geo = json.loads(md[b"geo"].decode())
    col = geo["primary_column"]
    geo["columns"][col]["crs"] = {"type": "GeographicCRS", "id": ident}
    md[b"geo"] = json.dumps(geo).encode()
    pq.write_table(tbl.replace_schema_metadata(md), dst)


def test_crs_id_variants_from_third_party_writers(spark, vec_df,
                                                  tmp_path):
    """OGC:CRS84 maps to 4326; a malformed id raises the module's
    typed error, not a raw TypeError/ValueError (review regression)."""
    src = str(tmp_path / "base.parquet")
    write_geoparquet(vec_df, src, wkb_col="geom", mode="single")

    ok = str(tmp_path / "crs84.parquet")
    _rewrite_crs_id(src, ok, {"authority": "OGC", "code": "CRS84"})
    assert geoparquet_metadata(ok)["crs_epsg"] == 4326

    bad = str(tmp_path / "bad.parquet")
    _rewrite_crs_id(src, bad, {"authority": "EPSG", "code": "not-a-code"})
    with pytest.raises(GeoParquetError, match="unparseable crs id"):
        geoparquet_metadata(bad)

    nocode = str(tmp_path / "nocode.parquet")
    _rewrite_crs_id(src, nocode, {"authority": "EPSG"})
    with pytest.raises(GeoParquetError, match="unparseable crs id"):
        geoparquet_metadata(nocode)
