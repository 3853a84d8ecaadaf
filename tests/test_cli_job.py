"""spark-submit --py-files CLI job (north rule execution contract).

Runs scripts/make_geocube_job.py through the real spark-submit binary
with the package shipped as a zip — the exact deployment shape the
north rule demands — and checks the committed cube plus the resume
no-op on re-run.
"""

import json
import os
import shutil
import subprocess
import sys

import pytest

from geocube_spark import datagen as DG
from geocube_spark.plans import checkpoint as CP

SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
JOB = os.path.join(REPO, "scripts", "make_geocube_job.py")


def _submit(cmd, tries=3):
    """spark-submit with retries (nonzero exit OR launcher timeout):
    the shared sandbox host occasionally kills/starves a fresh JVM
    under load (observed: a run that fails in the full-suite sweep
    passes in isolation seconds later). A genuine regression still
    fails every attempt and surfaces the last stderr."""
    import time

    r = None
    for attempt in range(tries):
        try:
            r = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=420)
        except subprocess.TimeoutExpired:
            if attempt == tries - 1:
                raise
            continue
        if r.returncode == 0:
            return r
        time.sleep(5 * (attempt + 1))
    return r


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not installed"
)
def test_spark_submit_job_and_resume(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    docs_path = str(tmp / "docs")
    out_path = str(tmp / "cube")
    DG.to_spark(spark, DG.flat_polygon_docs(n=9)).write.parquet(docs_path)

    from geocube_spark.session import package_zip

    cmd = [
        SPARK_SUBMIT, "--master", "local[4]",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--conf", "spark.ui.enabled=false",
        "--py-files", package_zip(),
        JOB,
        "--input", docs_path, "--output", out_path,
        "--output-crs", "epsg:32615", "--resolution", "-10", "10",
        "--fill", "-9999.0", "--merge-alg", "replace",
        "--tile-size", "64", "--commit-batches", "2",
    ]
    r = _submit(cmd)
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])

    # a retried first run may have resumed a partial commit, so assert
    # total batch coverage (committed snapshot ids are "<ts>-<batch>",
    # skipped entries are bare batch indexes) rather than committed
    # count alone
    def _batches(s):
        ids = [str(b).rsplit("-", 1)[-1] for b in
               s["committed"] + s["skipped"]]
        return sorted(int(b) for b in ids)

    assert _batches(summary) == [0, 1]
    assert summary["bands"] == sorted(
        ["om_r", "sandtotal_r", "silttotal_r", "claytotal_r", "cec7_r",
         "ph1to1h2o_r", "dbthirdbar_r", "awc_r"]
    )
    back = CP.read_cube(spark, out_path)
    assert back.count() > 0
    assert os.path.exists(os.path.join(out_path, "_geobox.json"))

    # re-run = resume: everything already committed, nothing rewritten
    r2 = _submit(cmd)
    assert r2.returncode == 0, r2.stderr[-2000:]
    summary2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert summary2["committed"] == []
    assert sorted(summary2["skipped"]) == [0, 1]

    # .nc output path (reference `geocube make-geocube IN out.nc`
    # parity) with --like pointed at the cube written above
    nc_out = str(tmp / "out.nc")
    cmd_nc = cmd[:cmd.index("--output") + 1] + [nc_out] + [
        "--like", out_path, "--fill", "-9999.0",
        "--merge-alg", "replace", "--tile-size", "64",
        "--measurements", "om_r",
    ]
    r3 = _submit(cmd_nc)
    assert r3.returncode == 0, r3.stderr[-2000:]
    summary3 = json.loads(r3.stdout.strip().splitlines()[-1])
    assert summary3["format"] == "netcdf"
    from geocube_spark.sources.netcdf_classic import read_netcdf

    f = read_netcdf(nc_out)
    assert "om_r" in f.variables and f.dims["x"] > 0


def test_cli_geotiff_output_with_overviews(spark, tmp_path):
    """--output x.tif writes a GeoTIFF (reference CLI parity for
    raster outputs) and --overviews builds the internal COG pyramid
    when the grid spans multiple tiles."""
    from geocube_spark.sources.geotiff import (
        read_geotiff, tiff_ifd_count,
    )
    from scripts.make_geocube_job import main

    docs_path = str(tmp_path / "docs")
    DG.to_spark(spark, DG.flat_polygon_docs(n=9)).write.parquet(docs_path)
    out = str(tmp_path / "cube.tif")
    summary = main([
        "--input", docs_path, "--output", out,
        "--output-crs", "epsg:32615", "--resolution", "-10", "10",
        "--measurements", "om_r",
        "--fill", "0.0", "--merge-alg", "add", "--tile-size", "64",
        "--overviews", "auto",
    ])
    assert summary["format"] == "geotiff"
    assert tiff_ifd_count(out) >= 2  # 229x153-ish grid -> >=1 overview
    back = read_geotiff(spark, out, measurements=["om_r"], tile_size=64)
    assert back.chunks.count() > 0


def test_cli_contours_flag(spark, sf_dir, tmp_path):
    """--contours writes a shapefile of iso-lines next to the cube
    (direct-invoke path; the spark-submit path is covered by the main
    CLI test)."""
    import glob

    from geocube_spark import datagen as DG
    from scripts.make_geocube_job import main as job_main
    from geocube_spark.sources.shapefile import read_shapefile

    docs_path = str(tmp_path / "docs")
    DG.to_spark(spark, DG.flat_polygon_docs(n=9)).write.parquet(
        docs_path
    )
    out = str(tmp_path / "cube")
    summary = job_main([
        "--input", docs_path,
        "--output", out,
        "--measurements", "om_r",
        "--output-crs", "epsg:32615",
        "--resolution", "-50", "50",
        "--fill", "-9999.0",
        "--tile-size", "64",
        "--commit-batches", "2",
        "--contours", "20.0,60.0",
    ])
    assert "contours" in summary and len(summary["contours"]) >= 1
    shp = summary["contours"][0]
    assert shp.endswith(".shp") and glob.glob(shp)
    back = read_shapefile(spark, shp)
    rows = back.collect()
    assert len(rows) > 0
    assert {float(r["level"]) for r in rows} <= {20.0, 60.0}
