"""spark-submit entry point: the engine's CLI (reference parity).

Reference counterpart: ``geocube make-geocube [opts] VECTOR_DATA
OUTPUT_FILE`` (/root/reference/geocube/cli/geocube.py:53-84,
cli/commands/make_geocube.py:12-128). Flag semantics map 1:1; the
sink is the checkpointed snapshot cube (plans.checkpoint) instead of
netCDF, and the job is resumable: re-running the same command after a
kill picks up from the last committed snapshot.

Usage (north rule: spark-submit --py-files on a cluster):

  spark-submit --py-files geocube_spark.zip scripts/make_geocube_job.py \\
      --input  /path/to/documents_parquet \\
      --output /path/to/cube \\
      --resolution -10 10 --output-crs epsg:32615 \\
      [--measurements m1 m2 ...] [--group-by col] [--fill -9999] \\
      [--geom '<GeoJSON>'] [--align y x] [--merge-alg replace|add] \\
      [--interpolate-na-method nearest|linear|cubic] \\
      [--tile-size 256] [--salt 0] [--commit-batches 4]

Build the zip with ``python -c "from geocube_spark.session import
package_zip; print(package_zip())"``. In local mode the script also
runs directly (``python scripts/make_geocube_job.py ...``) because
the session helper ships the package zip itself.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="vector/document -> raster cube")
    p.add_argument("--input", required=True,
                   help="parquet/Iceberg path of documents or vector table")
    p.add_argument("--output", required=True, help="cube table path")
    p.add_argument("--measurements", nargs="*", default=None)
    p.add_argument("--output-crs", default=None)
    p.add_argument("--resolution", nargs=2, type=float, default=None,
                   metavar=("Y", "X"))
    p.add_argument("--align", nargs=2, type=float, default=None,
                   metavar=("Y", "X"))
    p.add_argument("--geom", default=None, help="GeoJSON geometry string")
    p.add_argument("--like", default=None,
                   help="existing cube path whose grid to reuse")
    p.add_argument("--fill", type=float, default=float("nan"))
    p.add_argument("--group-by", default=None)
    p.add_argument("--interpolate-na-method", default=None)
    p.add_argument("--merge-alg", default="replace",
                   choices=["replace", "add"])
    p.add_argument("--all-touched", action="store_true")
    p.add_argument("--tile-size", type=int, default=256)
    p.add_argument("--salt", type=int, default=0,
                   help=">1: salted two-phase burn for dense-tile skew")
    p.add_argument("--n-buckets", type=int, default=64)
    p.add_argument("--commit-batches", type=int, default=4)
    p.add_argument("--overviews", default="0",
                   help=".tif outputs: overview count or 'auto' "
                        "(internal COG pyramid)")
    p.add_argument("--contours", default=None,
                   help="comma-separated iso-levels; writes contour "
                        "LineStrings next to the cube output")
    p.add_argument("--contours-out", default=None,
                   help="contour sink: .shp path (default "
                        "<output>_contours.shp)")
    return p


def main(argv=None) -> dict:
    args = build_parser().parse_args(argv)
    from pyspark import SparkConf
    from pyspark.sql import SparkSession

    if SparkConf().get("spark.master", None):
        # under spark-submit: use the submitted conf (--py-files ships
        # the package)
        spark = SparkSession.builder.getOrCreate()
    else:
        # direct `python scripts/make_geocube_job.py ...`: the session
        # helper sets a local master and ships the package zip itself
        from geocube_spark.session import get_spark

        spark = get_spark(app="make-geocube-job")
    spark.sparkContext.setLogLevel("WARN")

    from geocube_spark.cube import make_geocube
    from geocube_spark.plans import checkpoint as CP

    like = None
    if args.like:
        from geocube_spark.grid.geobox import GeoBox, geobox_from_path

        if os.path.isfile(args.like):
            # a netCDF or GeoTIFF file (reference CLI -l parity):
            # reuse its grid
            like = geobox_from_path(args.like)
        else:
            manifests = CP.snapshots(args.like)
            if not manifests:
                raise SystemExit(
                    f"--like: no committed cube at {args.like}"
                )
            meta_path = os.path.join(args.like, "_geobox.json")
            with open(meta_path) as f:
                like = GeoBox.from_dict(json.load(f))

    # input format sniffing (reference CLI reads any OGR path):
    # .shp/.geojson/.json/.gpkg load through the GDAL-free vector-file
    # sources; anything else is the parquet documents/vector table
    low = args.input.lower()
    if low.endswith(".shp") or low.rstrip("/").endswith(".shp"):
        from geocube_spark.sources.shapefile import read_shapefile

        docs = read_shapefile(spark, args.input)
    elif low.endswith((".geojson", ".json")):
        from geocube_spark.sources.geojson import read_geojson

        docs = read_geojson(spark, args.input)
    elif low.endswith(".gpkg"):
        from geocube_spark.sources.geopackage import read_geopackage

        docs = read_geopackage(spark, args.input)
    else:
        docs = spark.read.parquet(args.input)
    cube = make_geocube(
        docs,
        measurements=args.measurements,
        output_crs=args.output_crs,
        resolution=tuple(args.resolution) if args.resolution else None,
        align=tuple(args.align) if args.align else None,
        geom=args.geom,
        like=like,
        fill=args.fill,
        group_by=args.group_by,
        interpolate_na_method=args.interpolate_na_method,
        merge_alg=args.merge_alg,
        all_touched=args.all_touched,
        tile_size=args.tile_size,
        salt=args.salt,
    )
    contour_files = None
    if args.contours:
        # gdal_contour parity: iso-lines of every band at the given
        # levels, written as a shapefile vector table
        from geocube_spark.sources.shapefile import write_shapefile

        levels = [float(v) for v in args.contours.split(",") if v]
        lines = cube.contour(levels)
        dest = args.contours_out or (
            args.output.rsplit(".", 1)[0] + "_contours.shp"
        )
        contour_files = write_shapefile(
            lines.withColumn(
                "level", lines["level"].cast("double")
            ).select(
                "measurement", "level", "line_id", "closed",
                "geometry_wkb",
            ),
            dest,
            epsg=cube.geobox.crs.epsg,
        )

    if args.output.endswith((".tif", ".tiff")):
        from geocube_spark.sources.geotiff import write_geotiff

        ov = args.overviews if args.overviews == "auto" else int(
            args.overviews
        )
        write_geotiff(cube, args.output, overviews=ov)
        summary = {
            "output": args.output,
            "format": "geotiff",
            "overviews": ov,
            "grid": {"shape": list(cube.geobox.shape)},
            "bands": sorted(cube.bands),
        }
        if contour_files:
            summary["contours"] = contour_files
        print(json.dumps(summary))
        return summary
    if args.output.endswith(".nc"):
        # reference CLI parity: `geocube make-geocube IN out.nc` writes
        # a netCDF file (classic CDF-2, driver-side assemble)
        cube.to_netcdf(args.output)
        summary = {
            "output": args.output,
            "format": "netcdf",
            "grid": {"shape": list(cube.geobox.shape)},
            "bands": sorted(cube.bands),
        }
        if contour_files:
            summary["contours"] = contour_files
        print(json.dumps(summary))
        return summary
    report = cube.write(
        args.output, n_buckets=args.n_buckets,
        commit_batches=args.commit_batches,
    )
    # persist the grid next to the cube so --like can reuse it
    with open(os.path.join(args.output, "_geobox.json"), "w") as f:
        json.dump(cube.geobox.to_dict(), f)
    summary = {
        "output": args.output,
        "committed": report.committed_snapshots,
        "skipped": report.skipped_snapshots,
        "metrics": report.metrics,
        "grid": {"shape": list(cube.geobox.shape)},
        "bands": sorted(cube.bands),
    }
    if contour_files:
        summary["contours"] = contour_files
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
