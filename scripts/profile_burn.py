"""Stage-level profile of the flagship burn (perf work harness).

Runs the scaling-bench workload once at a chosen parallelism and dumps
wall time plus per-stage executor metrics from the Spark REST API
(run time, CPU time, shuffle bytes) so the cover / shuffle / burn
split is visible. Also probes host page-fault health first — on the
shared sandbox, first-touch cost of fresh large allocations varies by
~100x between calm and noisy periods, and no measurement taken during
a noisy period is meaningful.

Usage:
  python scripts/profile_burn.py [cpus] [n_docs]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def host_health() -> dict:
    """First-touch page-fault probe: seconds to fault in 64 MB."""
    import numpy as np

    t0 = time.time()
    a = np.ones(8 * 1024 * 1024)   # 64 MB
    dt = time.time() - t0
    del a
    return {
        "first_touch_64mb_sec": round(dt, 3),
        "loadavg": round(os.getloadavg()[0], 1),
        "healthy": dt < 0.2,
    }


def main():
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000

    health = host_health()
    print("host:", json.dumps(health))

    from geocube_spark.cube import make_geocube
    from geocube_spark.session import get_spark
    from scripts.scaling_bench import GEOM, GRID, TILE, _ensure_input

    spark = get_spark(
        app="profile-burn", master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(_ensure_input(spark, n_docs=n_docs))
    res = 1.0 / GRID

    def run():
        cube = make_geocube(
            docs, geom=GEOM, resolution=(-res, res), fill=0.0,
            merge_alg="add", tile_size=TILE,
        )
        return cube.chunks.selectExpr(
            "sum(n_cells_burned) t", "count(*) n"
        ).collect()[0]

    run()   # warmup: codegen + python worker pool
    t0 = time.time()
    row = run()
    wall = time.time() - t0
    cells = int(row["t"])
    print(json.dumps({
        "wall_sec": round(wall, 2),
        "cells": cells,
        "mcells_per_sec": round(cells / wall / 1e6, 1),
        "host_after": host_health(),
    }))

    ui = spark.sparkContext.uiWebUrl
    app = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications")
    )[0]["id"]
    stages = json.load(urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app}/stages?status=complete"
    ))
    stages.sort(key=lambda s: -s["stageId"])
    for s in stages[:6]:
        print(json.dumps({
            k: s.get(k)
            for k in (
                "stageId", "numTasks", "executorRunTime",
                "executorCpuTime", "shuffleReadBytes",
                "shuffleWriteBytes", "inputBytes",
            )
        }))


if __name__ == "__main__":
    main()
