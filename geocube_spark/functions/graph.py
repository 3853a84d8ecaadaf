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


def triangle_count(edges: DataFrame, *, src_col: str = "src",
                   dst_col: str = "dst") -> DataFrame:
    """Exact triangle counting on the undirected simple graph
    (directions and duplicate/self edges dropped) by the classic
    degree orientation (Schank & Wagner 2005 / the MPS shuffle
    bound): orient every edge from the endpoint with the smaller
    ``(degree, id)`` key to the larger; every triangle then has
    EXACTLY ONE wedge u->v, u->w with v<w in orientation order, so
    counting = one self-join on the oriented source + one semi-join
    against the oriented edge set. Wedge work is O(sum d_out^2) with
    d_out <= sqrt(2m) — the bound that keeps power-law hubs from
    exploding the shuffle (a hub's edges orient INTO it).

    Returns one row per node participating in >= 1 triangle:
    (node, n_triangles), each triangle counted at all three corners.
    """
    und = edges.select(
        F.least(F.col(src_col).cast("long"),
                F.col(dst_col).cast("long")).alias("a"),
        F.greatest(F.col(src_col).cast("long"),
                   F.col(dst_col).cast("long")).alias("b"),
    ).where(F.col("a") != F.col("b")).distinct() \
        .localCheckpoint(eager=True)
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("dega"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("degb"))
    lt = (F.col("dega") < F.col("degb")) | (
        (F.col("dega") == F.col("degb")) & (F.col("a") < F.col("b")))
    oriented = (
        und.join(da, "a").join(db, "b")
        .select(
            F.when(lt, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(lt, F.col("b")).otherwise(F.col("a")).alias("v"),
        ).localCheckpoint(eager=True)
    )
    w1 = oriented.select(F.col("u"), F.col("v").alias("x"))
    w2 = oriented.select(F.col("u"), F.col("v").alias("y"))
    wedges = w1.join(w2, "u").where(F.col("x") < F.col("y"))
    closed = wedges.join(
        oriented.select(F.col("u").alias("x"), F.col("v").alias("y"))
        .unionByName(
            oriented.select(F.col("u").alias("y"),
                            F.col("v").alias("x"))).distinct(),
        ["x", "y"], "left_semi",
    )
    tri = closed.select(
        F.explode(F.array("u", "x", "y")).alias("node"))
    return tri.groupBy("node").agg(
        F.count(F.lit(1)).alias("n_triangles"))
