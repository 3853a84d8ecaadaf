"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value", "unit", "queries", "sf", ...}.

Extra keys: burn_cells_per_sec (north-star cells burned/sec for the
flagship burn) and the per-query row counts. Scaling evidence
(local[8] vs local[32]) is produced by scripts/scaling_bench.py.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def run(spark=None, sf_dir: str = None) -> dict:
    import __spark_entry__ as E
    from geocube_spark.session import get_spark

    sf_dir = sf_dir or SF_DIR
    spark = spark or get_spark(app="geocube-bench", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")

    # warm up JVM codegen + Python worker pool so the first timed query
    # isn't charged the one-time startup cost
    from pyspark.sql import functions as _F

    warm = spark.read.parquet(f"{sf_dir}/events.parquet").limit(2000)
    warm.mapInPandas(lambda it: it, schema=warm.schema).count()

    qs = E.queries()
    times, rows = {}, {}
    for name, fn in qs.items():
        t0 = time.time()
        rows[name] = fn(spark, sf_dir).count()
        times[name] = round(time.time() - t0, 3)

    # north-star throughput: cells burned/sec on the flagship world burn
    # (360x180 deg grid, all events rasterized, add merge)
    from geocube_spark.operators.geocube_queries import _burn_events

    t0 = time.time()
    n_cells = _burn_events(spark, sf_dir, "add", 0.0).count()
    burn_sec = time.time() - t0

    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0
    return {
        "metric": "total_query_sec",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "cpus": int(CPUS),
        "burn_cells": n_cells,
        "burn_sec": round(burn_sec, 3),
        "burn_cells_per_sec": round(n_cells / max(burn_sec, 1e-9), 1),
        "rows": rows,
    }


if __name__ == "__main__":
    print(json.dumps(run()))
