"""Graph analytics as iterative DataFrame programs.

The package already carries several graph kernels where they belong
(connected components in ``regions``/``dedup.near_dup_clusters``,
D8-forest closures in ``bandops``); this module holds the generic
node-rank primitive.

PageRank (Page, Brin, Motwani & Winograd 1999 — public) with a FIXED
iteration count: like ``pca_power_scores``, pinning the iteration
count (instead of iterating to a tolerance) keeps the whole
computation a closed-form function of the edge set, so a SQL oracle
replays it CTE-for-CTE while the Spark plan stays the classic
scalable shape — one equi-join + one map-side-combined aggregate per
iteration, ``localCheckpoint`` between rounds so the plan depth is
O(1) (the hex-compact lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(edges: DataFrame, *, iters: int = 5,
             damping: float = 0.85, src_col: str = "src",
             dst_col: str = "dst") -> DataFrame:
    """PageRank over a directed edge list, ``iters`` synchronous
    rounds from the uniform start:

        rank'(v) = (1-d)/N + d * (sum_{u->v} rank(u)/deg(u)
                                  + dangling_mass / N)

    with dangling mass redistributed uniformly (the standard
    teleport treatment). Duplicate edges are collapsed (simple
    graph). Returns (node, rank) — ranks sum to 1 every round.

    Scale shape per round: ONE shuffle (the contribution aggregate on
    dst); the rank-to-edge join reuses the edge partitioning; degree
    and dangling mass are tiny aggregates. Node count and iteration
    count fixed up front — no driver-side convergence loop to stall a
    1000-executor job."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    ).distinct().localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct().localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        raise ValueError("empty edge list")
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    d = float(damping)

    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(int(iters)):
        with_deg = ranks.join(
            deg, ranks["node"] == deg["src"], "left"
        ).select("node", "rank", "deg")
        dangling = with_deg.where(F.col("deg").isNull()) \
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0))).collect()[0][0]
        contrib = (
            with_deg.where(F.col("deg").isNotNull())
            .join(e, with_deg["node"] == e["src"])
            .select("dst", (F.col("rank") / F.col("deg"))
                    .alias("c"))
            .groupBy("dst").agg(F.sum("c").alias("c"))
        )
        ranks = nodes.join(
            contrib, nodes["node"] == contrib["dst"], "left"
        ).select(
            "node",
            (F.lit((1.0 - d) / n)
             + F.lit(d) * (F.coalesce(F.col("c"), F.lit(0.0))
                           + F.lit(dangling / n))).alias("rank"),
        ).localCheckpoint(eager=True)
    return ranks
