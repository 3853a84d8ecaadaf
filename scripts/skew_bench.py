"""Skew-escape evidence: salted vs unsalted burn of ONE hot tile.

The north rule's 'salted repartitioning for dense-geometry skew'
needs a measurement, not just a parity test: this generates a corpus
whose every geometry lands in a single 256px tile (the worst case —
the whole burn collapses to one task), burns it unsalted and with
``salt=N``, and reports both walls. The salted plan splits the tile's
input across N sub-keys (pmod on the deterministic seq), burns N
sparse partials in parallel and merges them per tile — output
identical (tested in tests/test_salted_burn.py), wall bounded by the
slowest 1/N slice instead of the whole tile.

Usage: python scripts/skew_bench.py [cpus] [n_docs] [salt]
Prints one JSON line; run on a calm host (see BASELINE.md host note).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GRID = 8192
TILE = 256

GEOM = json.dumps(
    {
        "type": "Polygon",
        "coordinates": [
            [[-91, 41], [-90, 41], [-90, 42], [-91, 42], [-91, 41]]
        ],
    }
)


def main():
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    salt = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    from geocube_spark import datagen
    from geocube_spark.cube import make_geocube
    from geocube_spark.session import get_spark

    spark = get_spark(app="skew-bench", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # every quad inside ONE 256px tile of the 8192^2 grid (the tile
    # spans 1/32 of a degree); quads only — maximal per-tile cell work
    tile_deg = TILE / GRID
    inset = 24.5 / GRID  # half the max quad size: quads stay inside
    pdf = datagen.scale_docs(
        n_docs, seed=3,
        lon_rng=(-91.0 + 2 * tile_deg + inset,
                 -91.0 + 3 * tile_deg - inset),
        lat_rng=(41.0 + 2 * tile_deg + inset,
                 41.0 + 3 * tile_deg - inset),
        points_fraction=0.0, n_attrs=1,
    )
    docs = datagen.to_spark(spark, pdf, n_partitions=cpus)
    docs.write.mode("overwrite").parquet("/tmp/skew_docs")
    docs = spark.read.parquet("/tmp/skew_docs")
    res = 1.0 / GRID

    def burn(s):
        cube = make_geocube(
            docs, geom=GEOM, resolution=(-res, res), fill=0.0,
            merge_alg="add", tile_size=TILE, salt=s,
        )
        t0 = time.time()
        row = cube.chunks.selectExpr(
            "sum(n_cells_burned) AS t", "count(*) AS n"
        ).collect()[0]
        return time.time() - t0, int(row["t"] or 0)

    burn(0)  # warm JVM + workers
    unsalted = min(burn(0)[0] for _ in range(2))
    salted, cells = burn(salt)
    salted = min(salted, burn(salt)[0])

    print(json.dumps({
        "cpus": cpus, "n_docs": n_docs, "salt": salt,
        "hot_tile_cells_burned": cells,
        "unsalted_wall_sec": round(unsalted, 3),
        "salted_wall_sec": round(salted, 3),
        "speedup": round(unsalted / salted, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
