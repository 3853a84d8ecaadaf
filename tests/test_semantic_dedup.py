"""semantic_dedup (SemDeDup): exemplar clustering + within-cluster
first-id-wins cosine drop rule."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geocube_spark.functions.similarity import (exemplar_centroids,
                                                semantic_dedup)


def _df(spark, vecs):
    rows = [(int(i), [float(x) for x in v]) for i, v in vecs]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>")


def test_duplicates_dropped_first_id_wins(spark):
    base = np.eye(4)
    vecs = [(0, base[0]), (1, base[1]), (2, base[2]),
            (10, base[0] * 2.0),       # same direction as 0
            (11, base[0] * 0.5),       # same direction as 0
            (12, base[1] + 1e-9)]      # ~dup of 1
    out = {r["id"]: r for r in semantic_dedup(
        _df(spark, vecs), threshold=0.999, k_clusters=3).collect()}
    assert len(out) == 6
    kept = {i for i, r in out.items() if r["keep"]}
    dropped = {i: r["dup_of"] for i, r in out.items() if not r["keep"]}
    # scaled copies of id 0 must be dropped in favor of 0, provided
    # they landed in 0's cluster (identical direction => identical
    # centroid cosine => identical assignment)
    assert out[10]["cid"] == out[0]["cid"] == out[11]["cid"]
    assert dropped.get(10) == 0 and dropped.get(11) == 0
    assert 0 in kept
    assert out[12]["cid"] == out[1]["cid"]
    assert dropped.get(12) == 1 and 1 in kept


def test_cross_cluster_dups_not_compared(spark):
    # two identical vectors forced into different clusters via custom
    # centroids never meet — the documented SemDeDup cost contract.
    vecs = [(0, [1.0, 0.0]), (1, [1.0, 0.0])]
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "cid long, cv array<double>")
    df = _df(spark, vecs)
    out = semantic_dedup(df, threshold=0.9, centroids=cents).collect()
    # same centroid argmax => same cluster => pair found
    assert sum(1 for r in out if not r["keep"]) == 1
    # now pin each to a different cluster by id-specific assignment:
    # not possible through the public API (assignment is argmax), so
    # instead verify the pair logic keyed strictly by cid using a
    # centroid that splits them is NOT constructible — assignment is
    # a pure function of the vector. Identical vectors always share
    # a cluster:
    a = semantic_dedup(df, threshold=0.9, k_clusters=2).collect()
    cids = {r["id"]: r["cid"] for r in a}
    assert cids[0] == cids[1]


def test_exemplar_centroids_deterministic(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = exemplar_centroids(e, k=4).collect()
    b = exemplar_centroids(e, k=4).collect()
    assert [r["cid"] for r in a] == [0, 1, 2, 3]
    assert [r["cv"] for r in a] == [r["cv"] for r in b]


def test_perturbed_corpus_recall(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet") \
        .select("vec_id", "embedding")
    pert = e.select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.concat(
            F.array(F.element_at("embedding", 1) + F.lit(0.25).cast("float")),
            F.slice("embedding", 2, 63),
        ).alias("embedding"),
    )
    n = e.count()
    out = semantic_dedup(e.unionByName(pert), threshold=0.9,
                         k_clusters=8)
    flagged = (out.where(~F.col("keep"))
               .where(F.col("id") >= 1000000)
               .where(F.col("dup_of") == F.col("id") - 1000000)
               .count())
    # perturbation keeps cosine >= 0.9 for nearly all vectors and the
    # pair shares a cluster whenever assignment agrees; demand most
    # planted dups are caught and attributed to their source
    assert flagged >= 0.7 * n


def test_validation(spark):
    df = _df(spark, [(0, [1.0, 0.0])])
    with pytest.raises(ValueError, match="threshold"):
        semantic_dedup(df, threshold=1.5)
    with pytest.raises(ValueError, match="k must"):
        exemplar_centroids(df, k=0)
