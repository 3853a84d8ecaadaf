"""Similarity search over embedding columns (array<float>).

* brute-force cosine top-k — exactness baseline. The corpus is
  L2-normalized once, broadcast to executors, and each Arrow batch of
  queries is scored with one numpy matmul (``mapInPandas``): the
  distributed scan is over the QUERY side, so it parallelizes and
  scales linearly in #queries; the corpus side must fit in a
  broadcast (same constraint as any broadcast join). For corpus
  sizes beyond broadcast, use ``ann_lsh_topk``.
* random-hyperplane LSH ANN — deterministic hyperplanes (portable
  integer hash -> pseudo-random weights), signature matmul per Arrow
  batch, band-bucket equi-join, exact numpy cosine re-rank inside
  each bucket via ``applyInPandas``. Sub-quadratic: cost ~ sum of
  bucket sizes squared; uniform signatures keep the shuffle balanced.
* cosine near-duplicate pairs — threshold variant for embedding dedup.

Spark HOF note: ``aggregate``/``zip_with`` lambdas are interpreted
(CodegenFallback), ~100x slower than Arrow-batched numpy for dense
float math — hence pandas UDFs here, exactly the "vectorized, no
per-row Python" contract. Cosines are float64 and rounded to 6 dp
before any ranking/threshold so DuckDB oracles reproduce them.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from ..plans.flatten import _flat


# -- small composable Column helpers (fine for few rows / wide plans) --------

def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


# -- shared numpy plumbing ----------------------------------------------------

def _to_matrix(pdf: pd.DataFrame, vec_col: str) -> np.ndarray:
    m = np.stack(pdf[vec_col].values).astype(np.float64)
    return m


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


# broadcast budget for the exact paths: same order as Spark's default
# autoBroadcastJoinThreshold philosophy but sized for a numpy matrix on
# every executor. Above it, exactness-by-broadcast is a scale bug, not
# a feature — callers fall back to the bucketed paths.
DEFAULT_BROADCAST_BUDGET = 512 * 1024 * 1024  # bytes of float64 matrix


def corpus_broadcast_bytes(corpus: DataFrame, vec_col: str) -> int:
    """Estimated bytes of the normalized corpus matrix (rows x dim x 8).
    One cheap agg job; at 100 TB the count comes from table metadata."""
    row = corpus.select(
        F.count(F.lit(1)).alias("n"),
        F.first(F.size(vec_col)).alias("dim"),
    ).collect()[0]
    return int(row["n"] or 0) * int(row["dim"] or 0) * 8


def _collect_corpus(corpus: DataFrame, id_col: str, vec_col: str,
                    budget: int = DEFAULT_BROADCAST_BUDGET):
    """Driver-side collect of the broadcast side (like building the
    hash relation of a broadcast join). Returns (ids, normalized
    matrix) sorted by id for determinism. Raises when the corpus
    exceeds ``budget`` — callers either route to a bucketed path or
    surface the error."""
    est = corpus_broadcast_bytes(corpus, vec_col)
    if est > budget:
        raise ValueError(
            f"corpus matrix ~{est / 1e6:.0f} MB exceeds the broadcast "
            f"budget ({budget / 1e6:.0f} MB); use ann_ivf_topk / "
            "ann_lsh_topk (bucketed, no broadcast), or raise `budget`"
        )
    pdf = corpus.select(id_col, vec_col).toPandas().sort_values(id_col)
    ids = pdf[id_col].to_numpy(dtype=np.int64)
    mat = _normalize(_to_matrix(pdf, vec_col))
    return ids, mat


_TOPK_SCHEMA = T.StructType(
    [
        T.StructField("qid", T.LongType()),
        T.StructField("rank", T.IntegerType()),
        T.StructField("nid", T.LongType()),
        T.StructField("cos", T.DoubleType()),
    ]
)


def brute_force_topk(corpus: DataFrame, *, k: int = 3,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     queries: DataFrame = None,
                     broadcast_budget: int = DEFAULT_BROADCAST_BUDGET,
                     on_oversize: str = "ivf") -> DataFrame:
    """Exact cosine top-k neighbors for every query (default:
    corpus x corpus, self-matches excluded).

    Deterministic ranking: (round(cos, 6) DESC, neighbor id ASC) so
    float noise below 1e-6 can never flip the output.

    The corpus matrix must fit ``broadcast_budget`` bytes on every
    executor; an oversize corpus automatically routes to the bucketed
    IVF path (``on_oversize='ivf'``, approximate — a warning is
    logged) or raises (``on_oversize='error'``)."""
    try:
        c_ids, c_mat = _collect_corpus(
            corpus, id_col, vec_col, budget=broadcast_budget
        )
    except ValueError:
        if on_oversize == "ivf" and queries is None:
            import logging

            logging.getLogger("geocube_spark").warning(
                "brute_force_topk: corpus exceeds the %d MB broadcast "
                "budget; falling back to ann_ivf_topk (approximate)",
                broadcast_budget // (1024 * 1024),
            )
            return ann_ivf_topk(
                corpus, k=k, id_col=id_col, vec_col=vec_col
            )
        raise
    q = (queries or corpus).select(id_col, vec_col)

    def _score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cm = c_mat.T  # (dim, N)
        for pdf in batches:
            if not len(pdf):
                continue
            qids = pdf[id_col].to_numpy(dtype=np.int64)
            sims = np.round(_normalize(_to_matrix(pdf, vec_col)) @ cm, 6)
            sims[qids[:, None] == c_ids[None, :]] = -np.inf  # drop self
            # rank by (-cos, nid): stable via lexsort on (id, -cos)
            order = np.lexsort((c_ids[None, :].repeat(len(qids), 0), -sims),
                               axis=1)[:, :k]
            rows = len(qids)
            yield pd.DataFrame(
                {
                    "qid": np.repeat(qids, k),
                    "rank": np.tile(np.arange(1, k + 1), rows),
                    "nid": c_ids[order].ravel(),
                    "cos": np.take_along_axis(sims, order, 1).ravel(),
                }
            )

    return q.mapInPandas(_score, schema=_TOPK_SCHEMA)


_PAIRS_SCHEMA = T.StructType(
    [
        T.StructField("id_a", T.LongType()),
        T.StructField("id_b", T.LongType()),
        T.StructField("cos", T.DoubleType()),
    ]
)


def cosine_dup_pairs(corpus: DataFrame, *, threshold: float = 0.99,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Embedding near-duplicate pairs: cosine >= threshold, id_a <
    id_b. Distributed over the left side; right side broadcast."""
    c_ids, c_mat = _collect_corpus(corpus, id_col, vec_col)

    def _pairs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cm = c_mat.T
        for pdf in batches:
            if not len(pdf):
                continue
            qids = pdf[id_col].to_numpy(dtype=np.int64)
            sims = np.round(_normalize(_to_matrix(pdf, vec_col)) @ cm, 6)
            keep = (sims >= threshold) & (qids[:, None] < c_ids[None, :])
            qi, cj = np.nonzero(keep)
            yield pd.DataFrame(
                {
                    "id_a": qids[qi],
                    "id_b": c_ids[cj],
                    "cos": sims[qi, cj],
                }
            )

    return corpus.select(id_col, vec_col).mapInPandas(
        _pairs, schema=_PAIRS_SCHEMA
    )


def cosine_dup_pairs_lsh(corpus: DataFrame, *, threshold: float = 0.99,
                         dim: int, bits: int = 32, bands: int = 8,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding") -> DataFrame:
    """Bucketed near-duplicate pairs — the 100 TB path beside the
    broadcast-exact ``cosine_dup_pairs``. Candidates share >=1 LSH band
    segment (equi-join, sub-quadratic); exact cosine verification per
    bucket, so precision is perfect and recall grows with ``bands``
    (near-identical vectors agree on almost every hyperplane sign, so
    recall at dup-grade thresholds is high by construction)."""
    sig = lsh_signatures(
        corpus, dim=dim, bits=bits, id_col=id_col, vec_col=vec_col
    )
    seg = bits // bands
    segs = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftright(F.col("sig"), i * seg)
                .bitwiseAND(F.lit((1 << seg) - 1))
                .alias("sv"),
            )
            for i in range(bands)
        ]
    )
    bkt = sig.select("id", "v", F.explode(segs).alias("s")).select(
        "id", "v", F.col("s.band").alias("band"), F.col("s.sv").alias("sv")
    )

    def _bucket_pairs(key, pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cos": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cos": "float64"}
            )
        ids = pdf["id"].to_numpy(dtype=np.int64)
        m = np.stack(pdf["v"].values).astype(np.float64)
        sims = np.round(m @ m.T, 6)
        ai, bj = np.nonzero(
            (sims >= threshold) & (ids[:, None] < ids[None, :])
        )
        return pd.DataFrame(
            {"id_a": ids[ai], "id_b": ids[bj], "cos": sims[ai, bj]}
        )

    return (
        bkt.groupBy("band", "sv")
        .applyInPandas(_bucket_pairs, schema=_PAIRS_SCHEMA)
        .groupBy("id_a", "id_b")
        .agg(F.max("cos").alias("cos"))
    )


# -- LSH ANN -------------------------------------------------------------------

def _hyperplane(dim: int, bit: int, d: int) -> float:
    """Deterministic pseudo-random weight in [-1, 1) for hyperplane
    ``bit``, dimension ``d`` (Weyl sequence on Knuth's constant) —
    identical on every executor and across engines."""
    x = (2654435761 * (bit * dim + d + 1) + 97) % (1 << 32)
    return x / float(1 << 31) - 1.0


def hyperplane_matrix(dim: int, bits: int) -> np.ndarray:
    return np.array(
        [[_hyperplane(dim, b, d) for d in range(dim)] for b in range(bits)],
        dtype=np.float64,
    )


def lsh_signatures(corpus: DataFrame, *, dim: int, bits: int = 32,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """(id, sig, v) — signature bit b = 1 iff dot(v, H_b) >= 0; one
    matmul per Arrow batch. Narrow map, no shuffle."""
    H = hyperplane_matrix(dim, bits).T  # (dim, bits)
    powers = (1 << np.arange(bits)).astype(np.int64)
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("sig", T.LongType()),
            T.StructField("v", T.ArrayType(T.DoubleType())),
        ]
    )

    def _sig(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            m = _to_matrix(pdf, vec_col)
            bits_on = (m @ H) >= 0
            sig = (bits_on * powers[None, :]).sum(axis=1)
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].to_numpy(dtype=np.int64),
                    "sig": sig,
                    "v": list(_normalize(m)),
                }
            )

    return corpus.select(id_col, vec_col).mapInPandas(_sig, schema=schema)


def ann_lsh_topk(corpus: DataFrame, *, k: int = 1, dim: int,
                 bits: int = 32, bands: int = 8,
                 id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: candidates share >=1 exact LSH band segment
    (the explode+groupBy is the only shuffle; segment values are
    uniform so no skew), pairwise cosine inside each bucket with one
    numpy matmul, then a global window keeps the best k per query.
    Recall grows with bands; returned cosines are exact."""
    from pyspark.sql import Window

    seg = bits // bands
    sig = lsh_signatures(
        corpus, dim=dim, bits=bits, id_col=id_col, vec_col=vec_col
    )
    segs = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftright(F.col("sig"), i * seg)
                .bitwiseAND(F.lit((1 << seg) - 1))
                .alias("sv"),
            )
            for i in range(bands)
        ]
    )
    bkt = sig.select("id", "v", F.explode(segs).alias("s")).select(
        "id", "v", F.col("s.band").alias("band"), F.col("s.sv").alias("sv")
    )

    cand_schema = T.StructType(
        [
            T.StructField("qid", T.LongType()),
            T.StructField("nid", T.LongType()),
            T.StructField("cos", T.DoubleType()),
        ]
    )

    def _bucket_pairs(key, pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"qid": [], "nid": [], "cos": []}).astype(
                {"qid": "int64", "nid": "int64", "cos": "float64"}
            )
        ids = pdf["id"].to_numpy(dtype=np.int64)
        m = np.stack(pdf["v"].values).astype(np.float64)
        sims = np.round(m @ m.T, 6)
        qi, nj = np.nonzero(~np.eye(n, dtype=bool))
        # keep only each query's local top-k to shrink the shuffle
        out = pd.DataFrame({"qid": ids[qi], "nid": ids[nj],
                            "cos": sims[qi, nj]})
        out = out.sort_values(["qid", "cos", "nid"],
                              ascending=[True, False, True])
        return out.groupby("qid", sort=False).head(k)

    cand = (
        bkt.groupBy("band", "sv")
        .applyInPandas(_bucket_pairs, schema=cand_schema)
        .groupBy("qid", "nid")
        .agg(F.max("cos").alias("cos"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("nid"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "nid", "cos")
    )


# -- IVF ANN -------------------------------------------------------------------

def ivf_centroids(corpus: DataFrame, *, k: int = 16, iters: int = 5,
                  sample: int = 4096, id_col: str = "vec_id",
                  vec_col: str = "embedding") -> np.ndarray:
    """Deterministic IVF coarse quantizer: Lloyd's k-means on a
    driver-side sample (the id-sorted first ``sample`` vectors - at
    corpus scale a sample is how IVF training works anyway), numpy
    only. Returns (k, dim) L2-normalized centroids, stable across runs
    and executors."""
    pdf = (
        corpus.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(sample)
        .toPandas()
    )
    m = _normalize(_to_matrix(pdf, vec_col))
    cents = m[:k].copy()                      # deterministic init
    for _ in range(iters):
        sims = m @ cents.T
        assign = np.argmax(sims, axis=1)
        for c in range(k):
            members = m[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
        cents = _normalize(cents)
    return cents


def ivf_centroids_distributed(corpus: DataFrame, *, k: int = 16,
                              iters: int = 5, id_col: str = "vec_id",
                              vec_col: str = "embedding") -> np.ndarray:
    """Distributed Lloyd's k-means over the FULL corpus: per-iteration
    each Arrow batch assigns its vectors to the nearest centroid and
    emits per-cluster partial (count, sum) rows — a map-side combine —
    which tree-aggregate to k tiny rows; only k x dim floats ever reach
    the driver. Deterministic init (first k vectors by id), so results
    are reproducible across runs and cluster sizes.

    Use when the driver-sample quantizer (``ivf_centroids``) would
    under-represent a corpus with many rare modes; cost is ``iters``
    corpus passes."""
    first = (
        corpus.select(id_col, vec_col).orderBy(id_col).limit(k).toPandas()
    )
    cents = _normalize(_to_matrix(first, vec_col))
    dim = cents.shape[1]

    part_schema = T.StructType(
        [
            T.StructField("cluster", T.IntegerType()),
            T.StructField("cnt", T.LongType()),
            T.StructField("vsum", T.ArrayType(T.DoubleType())),
        ]
    )

    for _ in range(iters):
        Ct = cents.T

        def _partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if not len(pdf):
                    continue
                m = _normalize(_to_matrix(pdf, vec_col))
                assign = np.argmax(m @ Ct, axis=1)
                rows = []
                for c in np.unique(assign):
                    members = m[assign == c]
                    rows.append(
                        {
                            "cluster": int(c),
                            "cnt": int(len(members)),
                            "vsum": members.sum(axis=0),
                        }
                    )
                yield pd.DataFrame(rows, columns=["cluster", "cnt", "vsum"])

        agg = (
            corpus.select(vec_col)
            .mapInPandas(_partials, schema=part_schema)
            .groupBy("cluster")
            .agg(
                F.sum("cnt").alias("cnt"),
                F.array(
                    *[
                        F.sum(F.element_at("vsum", i + 1)).alias(f"s{i}")
                        for i in range(dim)
                    ]
                ).alias("vsum"),
            )
            .collect()
        )
        new = cents.copy()
        for r in agg:
            if r["cnt"]:
                new[r["cluster"]] = (
                    np.asarray(r["vsum"], dtype=np.float64) / r["cnt"]
                )
        cents = _normalize(new)
    return cents


def ann_ivf_topk(corpus: DataFrame, *, k: int = 1, n_lists: int = 16,
                 nprobe: int = 4, id_col: str = "vec_id",
                 vec_col: str = "embedding",
                 centroids: np.ndarray = None) -> DataFrame:
    """IVF approximate top-k: vectors are assigned to their nearest
    centroid list (one matmul per Arrow batch, narrow map); each query
    probes its ``nprobe`` closest lists, candidates meet through an
    equi-join on list id, and exact cosine re-ranks per bucket - the
    inverted-file counterpart of ``ann_lsh_topk``. Shuffle cost ~
    sum of probed-list sizes, not corpus^2; list sizes are balanced by
    the k-means quantizer, skew falls to AQE otherwise."""
    from pyspark.sql import Window

    C = (
        centroids
        if centroids is not None
        else ivf_centroids(
            corpus, k=n_lists, id_col=id_col, vec_col=vec_col
        )
    ).T  # (dim, n_lists)

    # ONE corpus pass: the assignment list is exactly the probe
    # ranking's first column, so a single mapInPandas emits the data-
    # side row (side=0, nearest list) and all nprobe query-side rows
    # (side=1) per vector - no second scan/normalize/matmul
    sided_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("list_id", T.IntegerType()),
            T.StructField("side", T.IntegerType()),
            T.StructField("v", T.ArrayType(T.DoubleType())),
        ]
    )

    def _sides(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            m = _normalize(_to_matrix(pdf, vec_col))
            # deterministic probe ranking: 6-dp-rounded scores, stable
            # sort (ties to the smallest list id) — the cross-engine
            # float rule, which is what lets a fixed-centroid IVF be
            # replayed exactly by the SQL oracle
            d = np.round(-(m @ C) + 1e-9, 6)
            order = np.argsort(d, axis=1, kind="stable")[:, :nprobe] \
                .astype(np.int32)
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            n = len(pdf)
            yield pd.DataFrame(
                {
                    "id": np.concatenate([ids, np.repeat(ids, nprobe)]),
                    "list_id": np.concatenate(
                        [order[:, 0], order.ravel()]
                    ),
                    "side": np.concatenate(
                        [
                            np.zeros(n, dtype=np.int32),
                            np.ones(n * nprobe, dtype=np.int32),
                        ]
                    ),
                    "v": list(m) + [m[i] for i in range(n)
                                    for _ in range(nprobe)],
                }
            )

    sided = corpus.select(id_col, vec_col).mapInPandas(
        _sides, schema=sided_schema
    )

    cand_schema = T.StructType(
        [
            T.StructField("qid", T.LongType()),
            T.StructField("nid", T.LongType()),
            T.StructField("cos", T.DoubleType()),
        ]
    )

    def _bucket(key, pdf: pd.DataFrame) -> pd.DataFrame:
        q = pdf[pdf["side"] == 1]
        d = pdf[pdf["side"] == 0]
        if not len(q) or not len(d):
            return pd.DataFrame({"qid": [], "nid": [], "cos": []}).astype(
                {"qid": "int64", "nid": "int64", "cos": "float64"}
            )
        qm = np.stack(q["v"].values)
        dm = np.stack(d["v"].values)
        sims = np.round(qm @ dm.T, 6)
        qids = q["id"].to_numpy(dtype=np.int64)
        dids = d["id"].to_numpy(dtype=np.int64)
        sims[qids[:, None] == dids[None, :]] = -np.inf
        kk = min(k, sims.shape[1])
        order = np.lexsort(
            (dids[None, :].repeat(len(qids), 0), -sims), axis=1
        )[:, :kk]
        out = pd.DataFrame(
            {
                "qid": np.repeat(qids, kk),
                "nid": dids[order].ravel(),
                "cos": np.take_along_axis(sims, order, 1).ravel(),
            }
        )
        return out[out["cos"] > -np.inf]

    cand = (
        sided.groupBy("list_id")
        .applyInPandas(_bucket, schema=cand_schema)
        .groupBy("qid", "nid")
        .agg(F.max("cos").alias("cos"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("nid"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "nid", "cos")
    )


def random_projection(corpus: DataFrame, *, dim: int, out_dim: int = 16,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """Johnson-Lindenstrauss random projection: compress ``dim``-wide
    embeddings to ``out_dim`` dimensions with the deterministic Weyl
    hyperplane matrix (the same engine-portable pseudo-random family
    the LSH signatures use), scaled ``sqrt(3/out_dim)`` (the weights
    are uniform[-1, 1), variance 1/3, so this makes expected pairwise
    inner products unbiased -- the JL lemma). The pipeline
    use: cheap embedding compression before ANN indexing, clustering,
    or storage at corpus scale — project once, index the narrow
    vectors.

    Scale shape: one numpy matmul per Arrow batch (``mapInPandas``) —
    a narrow map, ZERO shuffle, linear in rows; the (out_dim x dim)
    matrix is rebuilt from the closed-form Weyl sequence inside each
    task (a few KB of floats, no broadcast needed). Dense float math
    stays out of interpreted HOF lambdas per the module note above.

    Returns (id, proj: array<double> length out_dim)."""
    if dim < 1:
        raise ValueError(f"dim must be >= 1, got {dim}")
    if out_dim < 1:
        raise ValueError(f"out_dim must be >= 1, got {out_dim}")
    Ht = hyperplane_matrix(dim, out_dim).T * np.sqrt(3.0 / out_dim)
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("proj", T.ArrayType(T.DoubleType())),
    ])

    def _project(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            m = _to_matrix(pdf, vec_col)
            if m.shape[1] != dim:
                raise ValueError(
                    f"embedding width {m.shape[1]} != dim {dim}"
                )
            yield pd.DataFrame({
                "id": pdf[id_col].to_numpy(dtype=np.int64),
                "proj": list(m @ Ht),
            })

    return corpus.select(id_col, vec_col).mapInPandas(
        _project, schema=schema
    )


def exemplar_centroids(corpus: DataFrame, *, k: int = 16,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding") -> DataFrame:
    """Deterministic exemplar centroids: the ``k`` corpus rows with the
    smallest ``(h60(id), id)`` key — i.e. a content-hash uniform sample
    used as cluster seeds (exactly one k-means|| init round, and —
    unlike an iterative trainer — a closed-form, SQL-replayable
    function of the corpus). Returns (cid 0..k-1 in key order, cv:
    array<double>). One tiny top-k; no shuffle of the wide vectors
    beyond it."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from ..textops.analysis import h60

    return (
        corpus.select(
            F.col(id_col).cast("long").alias("id"),
            as_double(F.col(vec_col)).alias("cv"),
        )
        .withColumn("h", h60(F.col("id").cast("string")))
        .orderBy("h", "id")
        .limit(k)
        .select(
            (F.row_number().over(
                Window.orderBy("h", "id")) - 1).alias("cid"),
            "cv",
        )
    )


def semantic_dedup(corpus: DataFrame, *, threshold: float = 0.9,
                   k_clusters: int = 16, id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   centroids: DataFrame = None) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, public method): semantic
    deduplication by clustering embeddings and dropping, within each
    cluster, every item whose cosine to an EARLIER-id item of the same
    cluster reaches ``threshold`` (greedy first-id-wins, the
    deterministic variant of the paper's keep-one-per-duplicate-group
    rule).

    * ``centroids=None`` uses :func:`exemplar_centroids` — fully
      deterministic and SQL-replayable end to end (the driver oracle
      runs the whole pipeline in DuckDB). Pass
      ``ivf_centroids_distributed(...)`` output (renamed to (cid, cv))
      for trained k-means centroids at quality-sensitive scale.
    * Assignment is one Arrow-batched matmul per batch against the
      collected (k x dim) centroid matrix — k*dim*8 bytes per
      executor, the same budget math as the IVF index; NO shuffle.
    * Pairwise cosines happen only WITHIN a cluster
      (``applyInPandas`` per cid after one hash shuffle on cid) —
      the published SemDeDup cost model: sum of squared cluster
      sizes, never corpus-squared. Scale ``k_clusters`` with the
      corpus to bound cluster width.

    Returns one row per input: (id, cid, centroid_cos, keep,
    dup_of) — ``dup_of`` is the smallest earlier same-cluster id
    within ``threshold``, NULL for kept rows. Cosines are rounded to
    6 dp before ranking/thresholding (cross-engine parity rule)."""
    if not -1.0 <= threshold <= 1.0:
        raise ValueError(f"threshold must be in [-1, 1], got {threshold}")
    if centroids is None:
        centroids = exemplar_centroids(
            corpus, k=k_clusters, id_col=id_col, vec_col=vec_col)
    crows = centroids.select("cid", "cv").orderBy("cid").collect()
    if not crows:
        raise ValueError("no centroids (empty corpus?)")
    cm = _normalize(np.array([r["cv"] for r in crows], dtype=np.float64))
    cids = np.array([r["cid"] for r in crows], dtype=np.int64)

    assign_schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("cid", T.LongType()),
        T.StructField("centroid_cos", T.DoubleType()),
    ])

    def _assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            m = _normalize(_to_matrix(pdf, vec_col))
            cos = np.round(m @ cm.T, 6)
            # argmax, ties -> smallest cid (cids ascend, so argmax
            # over the first maximal column works)
            best = cos.argmax(axis=1)
            yield pd.DataFrame({
                "id": pdf[id_col].to_numpy(dtype=np.int64),
                "cid": cids[best],
                "centroid_cos": cos[np.arange(len(best)), best],
            })

    assign = corpus.select(id_col, vec_col).mapInPandas(
        _assign, schema=assign_schema)

    vecs = corpus.select(
        F.col(id_col).cast("long").alias("id"),
        as_double(F.col(vec_col)).alias("v"),
    )
    sided = assign.select("id", "cid").join(vecs, "id")

    pair_schema = T.StructType([
        T.StructField("id_a", T.LongType()),
        T.StructField("id_b", T.LongType()),
    ])

    def _pairs(key, pdf: pd.DataFrame) -> pd.DataFrame:
        m = _normalize(np.stack(pdf["v"].values).astype(np.float64))
        ids = pdf["id"].to_numpy(dtype=np.int64)
        order = np.argsort(ids)
        m, ids = m[order], ids[order]
        cos = np.round(m @ m.T, 6)
        ia, ib = np.nonzero(np.triu(cos >= threshold, k=1))
        return pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib]})

    pairs = sided.groupBy("cid").applyInPandas(_pairs, schema=pair_schema)
    dup_of = pairs.groupBy("id_b").agg(F.min("id_a").alias("dup_of"))

    return (
        assign.join(dup_of, assign["id"] == dup_of["id_b"], "left")
        .select(
            "id", "cid", "centroid_cos",
            F.col("dup_of").isNull().alias("keep"),
            "dup_of",
        )
    )


def pca_power_scores(corpus: DataFrame, *, dim: int, iters: int = 5,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """First-principal-component scores by a FIXED number of power
    iterations — the embedding-compression / outlier-score primitive
    (score = projection of the mean-centered vector onto the dominant
    covariance eigenvector). Everything is deterministic: the start
    vector is the Weyl hyperplane row (data-independent), the
    iteration count is fixed, and each step is a plain sum over the
    corpus — so unlike an eigensolver the WHOLE computation is
    replayable in SQL (each iteration = two aggregates), which is how
    the driver oracle checks it. No sign ambiguity exists because the
    iterate is a continuous function of the data from a fixed start.

    Scale shape: the corpus is projected once to (id, centered vec)
    and cached; each iteration is one Arrow-batched pass producing
    per-batch partial (dim)-vectors that reduce on the driver
    (O(batches * dim) tiny rows — the treeAggregate pattern), so
    ``iters`` passes touch the cache, never reshuffle it. Scores are
    one final narrow map. Rounded to 6 dp (cross-engine parity rule).

    Returns (id, score)."""
    if dim < 1:
        raise ValueError(f"dim must be >= 1, got {dim}")
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")

    vecs = corpus.select(
        F.col(id_col).cast("long").alias("id"),
        as_double(F.col(vec_col)).alias("v"),
    ).persist()
    try:
        sum_schema = T.StructType([
            T.StructField("n", T.LongType()),
            T.StructField("s", T.ArrayType(T.DoubleType())),
        ])

        def _sums(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if not len(pdf):
                    continue
                m = np.stack(pdf["v"].values).astype(np.float64)
                if m.shape[1] != dim:
                    raise ValueError(
                        f"embedding width {m.shape[1]} != dim {dim}")
                yield pd.DataFrame({"n": [len(m)],
                                    "s": [m.sum(axis=0)]})

        parts = vecs.mapInPandas(_sums, schema=sum_schema).collect()
        if not parts:
            raise ValueError("empty corpus")
        n_rows = sum(p["n"] for p in parts)
        mu = np.sum([np.asarray(p["s"]) for p in parts], axis=0) / n_rows

        v = hyperplane_matrix(dim, 1)[0]
        v = v / np.linalg.norm(v)
        for _ in range(iters):
            def _step(batches: Iterator[pd.DataFrame],
                      v=v) -> Iterator[pd.DataFrame]:
                for pdf in batches:
                    if not len(pdf):
                        continue
                    m = np.stack(pdf["v"].values).astype(np.float64) - mu
                    yield pd.DataFrame({"n": [len(m)],
                                        "s": [(m.T @ (m @ v))]})

            parts = vecs.mapInPandas(_step, schema=sum_schema).collect()
            w = np.sum([np.asarray(p["s"]) for p in parts], axis=0)
            v = w / np.linalg.norm(w)

        score_schema = T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("score", T.DoubleType()),
        ])

        def _scores(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if not len(pdf):
                    continue
                m = np.stack(pdf["v"].values).astype(np.float64) - mu
                yield pd.DataFrame({
                    "id": pdf["id"].to_numpy(dtype=np.int64),
                    "score": np.round(m @ v, 6),
                })

        out = vecs.mapInPandas(_scores, schema=score_schema)
        # materialization happens lazily after unpersist would drop
        # the cache, so force the result before releasing it
        out = out.transform(_flat)
        return out
    finally:
        vecs.unpersist()


def kmeans(corpus: DataFrame, *, k: int = 8, iters: int = 2,
           id_col: str = "vec_id",
           vec_col: str = "embedding") -> DataFrame:
    """Fixed-iteration Lloyd k-means (Lloyd 1982) over an embedding
    column, fully deterministic and SQL-replayable: seeds are the
    :func:`exemplar_centroids` content-hash exemplars (one k-means||
    init round), the iteration count is FIXED, assignment is argmin
    of the squared euclidean distance ROUNDED to 6 dp (+1e-9 nudge —
    the repo's cross-engine float rule) with ties to the smallest
    cluster id, and a cluster that loses all members keeps its
    previous centroid. Unlike the tolerance-looped IVF trainer
    (``ivf_centroids_distributed``), every step here is a closed-form
    function of the corpus, which is what lets the DuckDB oracle
    replay it iteration by iteration.

    Scale shape (the pca_power_scores pattern): the trainer
    (:func:`kmeans_fit`) projects the corpus once to a persisted
    narrow (id, vec) cache and runs one Arrow-batched pass per
    iteration emitting per-batch per-cluster partial sums
    (O(batches * k * dim) tiny rows reduced on the driver); the
    final labeling here is one more narrow map — no shuffle of the
    wide vectors anywhere, centroids broadcast at k*dim*8 bytes.

    Returns (id, cluster, d2) with d2 the rounded squared distance to
    the final centroid."""
    C = kmeans_fit(corpus, k=k, iters=iters, id_col=id_col,
                   vec_col=vec_col)
    vecs = corpus.select(
        F.col(id_col).cast("long").alias("id"),
        as_double(F.col(vec_col)).alias("v"),
    )
    out_schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("cluster", T.LongType()),
        T.StructField("d2", T.DoubleType()),
    ])

    def _label(batches: Iterator[pd.DataFrame],
               C=C) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf["v"].values).astype(np.float64)
            cid, d2 = _kmeans_assign(m, C)
            yield pd.DataFrame({
                "id": pdf["id"].astype("int64"),
                "cluster": cid.astype("int64"),
                "d2": d2,
            })

    return vecs.mapInPandas(_label, schema=out_schema)


def _kmeans_assign(m: np.ndarray, C: np.ndarray):
    """6-dp-rounded argmin assignment, smallest-cid ties (the
    SQL-replayable rule shared by kmeans / kmeans_fit / pq_train)."""
    d2 = ((m * m).sum(axis=1)[:, None]
          - 2.0 * (m @ C.T)
          + (C * C).sum(axis=1)[None, :])
    d2r = np.round(d2 + 1e-9, 6)
    cid = d2r.argmin(axis=1)  # first-wins = smallest cid on ties
    return cid, d2r[np.arange(len(m)), cid]


def kmeans_fit(corpus: DataFrame, *, k: int = 8, iters: int = 2,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> np.ndarray:
    """The centroid matrix of :func:`kmeans`'s fixed-iteration
    deterministic Lloyd loop (exemplar seeds, rounded argmin,
    empty-cluster carry) WITHOUT the labeling pass — the trainer to
    compose with downstream index builders (e.g. a fully
    SQL-replayable IVF: pass the result as ``ann_ivf_topk``'s
    ``centroids=``). Driver reduce is O(batches * k * dim) partial
    sums; the wide vectors never shuffle."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    cents = exemplar_centroids(
        corpus, k=k, id_col=id_col, vec_col=vec_col
    ).orderBy("cid").collect()
    if not cents:
        raise ValueError("empty corpus")
    C = np.stack([np.asarray(r["cv"], dtype=np.float64) for r in cents])

    vecs = corpus.select(
        F.col(id_col).cast("long").alias("id"),
        as_double(F.col(vec_col)).alias("v"),
    ).persist()
    try:
        part_schema = T.StructType([
            T.StructField("cid", T.LongType()),
            T.StructField("n", T.LongType()),
            T.StructField("s", T.ArrayType(T.DoubleType())),
        ])
        for _ in range(int(iters)):
            def _parts(batches: Iterator[pd.DataFrame],
                       C=C) -> Iterator[pd.DataFrame]:
                for pdf in batches:
                    if not len(pdf):
                        continue
                    m = np.stack(pdf["v"].values).astype(np.float64)
                    cid, _ = _kmeans_assign(m, C)
                    rows = []
                    for c in np.unique(cid):
                        sel = m[cid == c]
                        rows.append((int(c), len(sel), sel.sum(axis=0)))
                    yield pd.DataFrame(rows, columns=["cid", "n", "s"])

            parts = vecs.mapInPandas(_parts, schema=part_schema).collect()
            sums = np.zeros_like(C)
            cnts = np.zeros(len(C), dtype=np.int64)
            for p in parts:
                sums[p["cid"]] += np.asarray(p["s"])
                cnts[p["cid"]] += p["n"]
            newC = C.copy()
            nz = cnts > 0
            newC[nz] = sums[nz] / cnts[nz, None]
            C = newC
        return C
    finally:
        vecs.unpersist()


def pq_train(corpus: DataFrame, *, m: int = 4, k: int = 8,
             iters: int = 1, id_col: str = "vec_id",
             vec_col: str = "embedding") -> np.ndarray:
    """Product-quantization codebooks (Jegou, Douze & Schmid 2011,
    "Product Quantization for Nearest Neighbor Search"): the vector
    splits into ``m`` contiguous subspaces and each learns its own
    ``k``-centroid codebook by the same deterministic fixed-iteration
    Lloyd scheme as :func:`kmeans` (exemplar seeds = the k smallest
    (h60(id), id) rows, sliced per subspace; 6-dp-rounded argmin with
    smallest-cid ties; empty cells keep their centroid) — so the
    whole trainer is SQL-replayable. Returns the (m, k', dsub)
    codebook array (k' <= k when the corpus is smaller).

    Scale shape: ALL subspaces train in the same Arrow pass — one
    persisted narrow projection, one mapInPandas per iteration
    emitting (subspace, cell) partial sums reduced on the driver
    (O(batches * m * k * dsub) tiny rows). Train on a capped sample
    at real scale; the codebook is m*k*dsub*8 bytes — broadcast
    territory at any realistic setting."""
    if m < 1:
        raise ValueError(f"m must be >= 1, got {m}")
    if k < 1 or iters < 1:
        raise ValueError("k and iters must be >= 1")

    cents = exemplar_centroids(
        corpus, k=k, id_col=id_col, vec_col=vec_col
    ).orderBy("cid").collect()
    if not cents:
        raise ValueError("empty corpus")
    seeds = np.stack([np.asarray(r["cv"], dtype=np.float64)
                      for r in cents])
    dim = seeds.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    # C[s]: (k', dsub) codebook of subspace s
    C = np.stack([seeds[:, s * dsub:(s + 1) * dsub] for s in range(m)])

    def _sub_assign(msub: np.ndarray, Cs: np.ndarray) -> np.ndarray:
        d2 = ((msub * msub).sum(axis=1)[:, None]
              - 2.0 * (msub @ Cs.T)
              + (Cs * Cs).sum(axis=1)[None, :])
        return np.round(d2 + 1e-9, 6).argmin(axis=1)

    vecs = corpus.select(
        F.col(id_col).cast("long").alias("id"),
        as_double(F.col(vec_col)).alias("v"),
    ).persist()
    try:
        part_schema = T.StructType([
            T.StructField("sub", T.LongType()),
            T.StructField("cid", T.LongType()),
            T.StructField("n", T.LongType()),
            T.StructField("s", T.ArrayType(T.DoubleType())),
        ])
        for _ in range(int(iters)):
            def _parts(batches: Iterator[pd.DataFrame],
                       C=C) -> Iterator[pd.DataFrame]:
                for pdf in batches:
                    if not len(pdf):
                        continue
                    mat = np.stack(pdf["v"].values).astype(np.float64)
                    rows = []
                    for s in range(m):
                        msub = mat[:, s * dsub:(s + 1) * dsub]
                        cid = _sub_assign(msub, C[s])
                        for c in np.unique(cid):
                            sel = msub[cid == c]
                            rows.append((s, int(c), len(sel),
                                         sel.sum(axis=0)))
                    yield pd.DataFrame(
                        rows, columns=["sub", "cid", "n", "s"])

            parts = vecs.mapInPandas(_parts, schema=part_schema).collect()
            sums = np.zeros_like(C)
            cnts = np.zeros(C.shape[:2], dtype=np.int64)
            for p in parts:
                sums[p["sub"], p["cid"]] += np.asarray(p["s"])
                cnts[p["sub"], p["cid"]] += p["n"]
            newC = C.copy()
            nz = cnts > 0
            newC[nz] = sums[nz] / cnts[nz][:, None]
            C = newC
        return C
    finally:
        vecs.unpersist()


def pq_codes(corpus: DataFrame, codebook: np.ndarray, *,
             id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """Encode every vector as its ``m`` nearest-subcentroid codes
    under a :func:`pq_train` codebook — dim*4 bytes down to m bytes
    per vector, the compression that lets a billion-vector index live
    in executor memory. One Arrow-batched narrow map, codebook
    broadcast, NO shuffle. Returns (id, codes: array<long>)."""
    C = np.ascontiguousarray(codebook, dtype=np.float64)
    m, _, dsub = C.shape

    out_schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("codes", T.ArrayType(T.LongType())),
    ])

    def _enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf["v"].values).astype(np.float64)
            codes = np.empty((len(mat), m), dtype=np.int64)
            for s in range(m):
                msub = mat[:, s * dsub:(s + 1) * dsub]
                Cs = C[s]
                d2 = ((msub * msub).sum(axis=1)[:, None]
                      - 2.0 * (msub @ Cs.T)
                      + (Cs * Cs).sum(axis=1)[None, :])
                codes[:, s] = np.round(d2 + 1e-9, 6).argmin(axis=1)
            yield pd.DataFrame({
                "id": pdf["id"].astype("int64"),
                "codes": list(codes),
            })

    vecs = corpus.select(
        F.col(id_col).cast("long").alias("id"),
        as_double(F.col(vec_col)).alias("v"),
    )
    return vecs.mapInPandas(_enc, schema=out_schema)


def ann_pq_topk(corpus: DataFrame, *, queries: DataFrame = None,
                m: int = 4, k: int = 8, iters: int = 1,
                topk: int = 3, id_col: str = "vec_id",
                vec_col: str = "embedding",
                exclude_self: bool = True) -> DataFrame:
    """Approximate top-k neighbors by PQ asymmetric distance (ADC,
    Jegou et al. 2011): train codebooks on the corpus
    (:func:`pq_train`), encode it (:func:`pq_codes`), then score each
    query against every code word via its per-subspace lookup table —
    O(m) adds per candidate instead of O(dim) multiplies, and the
    scan reads m-byte codes instead of dim*4-byte vectors. The
    subspace accumulation order is fixed (s = 0..m-1, left to right)
    and the result rounded at 6 dp, so the DuckDB oracle replays the
    ranking exactly. ``queries=None`` defaults to the corpus itself
    minus self-matches; ``exclude_self`` (default True) assumes query
    ids share the corpus id space — set it False when an explicit
    query set uses an unrelated id space. At real scale compose with the IVF coarse
    index (``ivf_topk``) to prune candidates first; the ADC scan here
    is the in-list scorer of a classic IVFADC index.

    Returns (qid, rank, nid, d2)."""
    if topk < 1:
        raise ValueError(f"topk must be >= 1, got {topk}")
    C = pq_train(corpus, m=m, k=k, iters=iters,
                 id_col=id_col, vec_col=vec_col)
    codes = pq_codes(corpus, C, id_col=id_col, vec_col=vec_col)
    qdf = queries if queries is not None else corpus
    Q = qdf.select(
        F.col(id_col).cast("long").alias("qid"),
        as_double(F.col(vec_col)).alias("v"),
    ).collect()
    if not Q:
        raise ValueError("empty query set")
    qids = np.array([r["qid"] for r in Q], dtype=np.int64)
    qv = np.stack([np.asarray(r["v"], dtype=np.float64) for r in Q])
    mm, _, dsub = C.shape
    # LUT[q, s, cid] = d2(query subvector, codeword)
    lut = np.stack([
        ((qv[:, s * dsub:(s + 1) * dsub] ** 2).sum(axis=1)[:, None]
         - 2.0 * (qv[:, s * dsub:(s + 1) * dsub] @ C[s].T)
         + (C[s] * C[s]).sum(axis=1)[None, :])
        for s in range(mm)
    ], axis=1)

    out_schema = T.StructType([
        T.StructField("qid", T.LongType()),
        T.StructField("nid", T.LongType()),
        T.StructField("d2", T.DoubleType()),
    ])

    def _score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            codes_m = np.stack(pdf["codes"].values)
            nids = pdf["id"].values.astype(np.int64)
            # accumulate subspace LUT hits in fixed order (parity)
            frames = []
            for qi in range(len(qids)):
                d = lut[qi, 0][codes_m[:, 0]]
                for s in range(1, mm):
                    d = d + lut[qi, s][codes_m[:, s]]
                frames.append(pd.DataFrame({
                    "qid": qids[qi],
                    "nid": nids,
                    "d2": np.round(d + 1e-9, 6),
                }))
            yield pd.concat(frames, ignore_index=True)

    scored = codes.mapInPandas(_score, schema=out_schema)
    if exclude_self:
        # meaningful only when query ids share the corpus id space
        # (queries=None, or an explicit subset of the corpus). Pass
        # exclude_self=False for a query set whose ids are unrelated
        # to the corpus, where a qid==nid collision is a legitimate
        # neighbor, not a self-match.
        scored = scored.where(F.col("qid") != F.col("nid"))
    w = Window.partitionBy("qid").orderBy("d2", "nid")
    return (
        scored.select("qid", "nid", "d2",
                      F.row_number().over(w).alias("rank"))
        .where(F.col("rank") <= topk)
        .select("qid", "rank", "nid", "d2")
    )


def quantize_embeddings(corpus: DataFrame, *, id_col: str = "vec_id",
                        vec_col: str = "embedding"):
    """Scalar (per-dimension min-max) int8 quantization — the 4x
    embedding-compression step vector stores run before indexing
    (e.g. faiss ScalarQuantizer SQ8): dimension ``j`` maps linearly
    onto codes 0..255 between the corpus-wide min and max of that
    dimension, ``code = clamp(floor((v - mn) / (mx - mn) * 255 +
    0.5))`` (half-up, degenerate dimensions -> 0). All arithmetic is
    closed-form over exact per-dim extremes (min/max carry no float-
    accumulation order), so codes are bit-deterministic and
    SQL-replayable.

    Returns (codes_df, mn, mx): ``codes_df`` = (id, codes:
    array<int>), ``mn``/``mx`` the per-dim extreme vectors (numpy) —
    feed both to :func:`dequantize_embeddings` to reconstruct.

    Scale shape: one Arrow pass of per-batch extreme partials reduced
    on the driver (O(batches x dim)), one broadcast, one narrow
    encode map. No shuffle anywhere."""
    vecs = corpus.select(
        F.col(id_col).cast("long").alias("id"),
        as_double(F.col(vec_col)).alias("v"),
    ).persist()
    try:
        part_schema = T.StructType([
            T.StructField("mn", T.ArrayType(T.DoubleType())),
            T.StructField("mx", T.ArrayType(T.DoubleType())),
        ])

        def _extremes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if not len(pdf):
                    continue
                m = np.stack(pdf["v"].values).astype(np.float64)
                yield pd.DataFrame({"mn": [m.min(axis=0)],
                                    "mx": [m.max(axis=0)]})

        parts = vecs.mapInPandas(_extremes, schema=part_schema).collect()
        if not parts:
            raise ValueError("empty corpus")
        mn = np.min([np.asarray(p["mn"]) for p in parts], axis=0)
        mx = np.max([np.asarray(p["mx"]) for p in parts], axis=0)
        rng = mx - mn

        out_schema = T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("codes", T.ArrayType(T.IntegerType())),
        ])

        def _enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if not len(pdf):
                    continue
                m = np.stack(pdf["v"].values).astype(np.float64)
                with np.errstate(invalid="ignore", divide="ignore"):
                    x = (m - mn) / np.where(rng == 0, 1.0, rng) * 255.0
                codes = np.clip(
                    np.floor(x + 0.5 + 1e-9), 0, 255
                ).astype(np.int32)
                codes[:, rng == 0] = 0
                yield pd.DataFrame({
                    "id": pdf["id"].astype("int64"),
                    "codes": list(codes),
                })

        codes_df = vecs.mapInPandas(_enc, schema=out_schema) \
            .transform(_flat)
        return codes_df, mn, mx
    finally:
        vecs.unpersist()


def dequantize_embeddings(codes_df: DataFrame, mn: np.ndarray,
                          mx: np.ndarray) -> DataFrame:
    """Inverse of :func:`quantize_embeddings`: ``v_hat = mn +
    code / 255 * (mx - mn)`` — reconstruction error bounded by half a
    quantization step per dimension. Narrow map, no shuffle. Returns
    (id, v: array<double>)."""
    mn = np.asarray(mn, dtype=np.float64)
    rng = np.asarray(mx, dtype=np.float64) - mn

    out_schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("v", T.ArrayType(T.DoubleType())),
    ])

    def _dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            c = np.stack(pdf["codes"].values).astype(np.float64)
            yield pd.DataFrame({
                "id": pdf["id"].astype("int64"),
                "v": list(mn + c / 255.0 * rng),
            })

    return codes_df.mapInPandas(_dec, schema=out_schema)
