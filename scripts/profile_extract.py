"""Attribute the cover-stage JVM cost: scan vs extract exprs vs Arrow.

The burn profile (scripts/profile_burn.py) shows the extract+cover
stage is the JVM-CPU bottleneck (~23 s CPU at local[8] for 2M docs vs
~6 s in the burn stage). This harness isolates the components on the
scaling-bench corpus:

  scan       parquet scan of spans only (count of span structs)
  extract    scan + extract_vector_table_sql exprs (JVM only)
  arrow      extract + a no-op mapInPandas round trip (adds the
             JVM->Arrow->Python->Arrow->JVM boundary)
  cover      extract + the real _cover_df (adds pixel transform +
             tile explode in Python and the wider output rows)

Usage: python scripts/profile_extract.py [cpus] [n_docs]
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Iterator

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000

    from scripts.scaling_bench import GRID, _ensure_input

    import pandas as pd
    from pyspark.sql import functions as F

    from geocube_spark.extract import extract_vector_table_sql
    from geocube_spark.session import get_spark

    spark = get_spark(app="profile-extract", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    path = _ensure_input(n_docs=n_docs)
    docs = spark.read.parquet(path)

    def timed(label, fn, warm=1, runs=2):
        for _ in range(warm):
            fn()
        best = min(_time_one(fn) for _ in range(runs))
        print(json.dumps({"step": label, "sec": round(best, 3)}))
        return best

    def _time_one(fn):
        t0 = time.time()
        fn()
        return time.time() - t0

    # 1. scan only
    timed("scan", lambda: docs.select(F.size("spans")).agg(
        F.sum("size(spans)")).collect())

    # 2. scan + extract exprs (JVM only, no Python)
    vec = extract_vector_table_sql(docs, measurements=[("m0", "double")])
    timed("extract", lambda: vec.agg(
        F.sum("seq"), F.sum(F.length("geometry_wkb")), F.sum("m0")
    ).collect())

    # 3. extract + no-op Arrow round trip (same columns as the burn's
    #    work df: seq, geometry_wkb, m0)
    work = vec.select("seq", "geometry_wkb", F.col("m0").cast("double"))

    def _noop(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "n": [len(pdf)],
                "nb": [int(pdf["geometry_wkb"].str.len().sum())],
            })

    import pyspark.sql.types as T
    noop_schema = T.StructType([
        T.StructField("n", T.LongType()), T.StructField("nb", T.LongType())
    ])
    timed("arrow", lambda: work.mapInPandas(_noop, schema=noop_schema)
          .agg(F.sum("n")).collect())

    # 4. extract + real cover (Python pixel transform + tile explode),
    #    counted without the burn shuffle's group step
    from geocube_spark.cube import _cover_df
    from geocube_spark.grid.geobox import GeoBoxMaker

    res = 1.0 / GRID
    geom = json.dumps({
        "type": "Polygon",
        "coordinates": [[[-91, 41], [-90, 41], [-90, 42], [-91, 42],
                         [-91, 41]]],
    })
    # build the geobox exactly as make_geocube would
    from geocube_spark.geometry.crs import CRS
    maker = GeoBoxMaker(output_crs=None, resolution=(-res, res),
                        align=None, geom=geom, like=None)
    geobox = maker.from_bounds_crs(None, CRS.from_user_input("EPSG:4326"))
    cover = _cover_df(work, ["m0"], geobox.to_dict(),
                      geobox.crs.epsg, 256, False)
    timed("cover", lambda: cover.agg(
        F.count("*"), F.sum("tile_id")).collect())

    spark.stop()


if __name__ == "__main__":
    main()
