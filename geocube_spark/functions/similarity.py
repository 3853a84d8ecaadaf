"""Similarity search over embedding columns (array<float>).

* brute-force cosine top-k — the exactness baseline. Dot product and
  norms via JVM higher-order functions (``aggregate``/``zip_with``) on
  double arrays: no Python workers, whole-stage codegen. The pairing
  is a broadcast nested-loop of queries x corpus — correct at any
  scale where ONE side fits in a broadcast; for corpus x corpus at
  100 TB use the LSH variant.
* random-hyperplane LSH ANN — 16-bit signatures from fixed
  deterministic hyperplanes (portable integer hash -> pseudo-gaussian
  weights), bucket equi-join, exact cosine re-rank inside buckets.
  Sub-quadratic; recall tunable via bands/bits.
* cosine near-duplicate pairs — threshold variant for embedding dedup.

All cosines are computed in float64 with sequential accumulation so
DuckDB's list_cosine_similarity reproduces them to <1e-12 (rounded to
6 dp before any comparison).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(corpus: DataFrame, *, k: int = 3,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     queries: DataFrame = None) -> DataFrame:
    """Exact cosine top-k neighbors for every query (default:
    corpus x corpus, self-matches excluded).

    Deterministic ranking: (round(cos, 6) DESC, neighbor id ASC) so
    float noise below 1e-6 can never flip the output. The corpus side
    is broadcast — at scale, broadcast the smaller side or switch to
    ann_lsh_topk."""
    from pyspark.sql import Window

    q = (queries or corpus).select(
        F.col(id_col).alias("qid"), as_double(F.col(vec_col)).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("nid"), as_double(F.col(vec_col)).alias("nv")
    )
    pairs = q.join(F.broadcast(c), F.col("qid") != F.col("nid")).select(
        "qid", "nid",
        F.round(cosine(F.col("qv"), F.col("nv")), 6).alias("cos"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("nid"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "nid", "cos")
    )


def cosine_dup_pairs(corpus: DataFrame, *, threshold: float = 0.99,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Embedding near-duplicate pairs: cosine >= threshold, id_a < id_b.
    Brute-force (broadcast) baseline; LSH variant below is the scale
    path."""
    a = corpus.select(
        F.col(id_col).alias("id_a"), as_double(F.col(vec_col)).alias("va")
    )
    b = corpus.select(
        F.col(id_col).alias("id_b"), as_double(F.col(vec_col)).alias("vb")
    )
    return (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def _hyperplane(dim: int, bit: int, d: int) -> float:
    """Deterministic pseudo-random weight in [-1, 1) for hyperplane
    ``bit``, dimension ``d`` (Weyl-sequence on Knuth's constant)."""
    x = (2654435761 * (bit * dim + d + 1) + 97) % (1 << 32)
    return x / float(1 << 31) - 1.0


def lsh_signature(vec: Column, *, dim: int, bits: int = 16) -> Column:
    """Random-hyperplane signature as an int column: bit b = 1 iff
    dot(vec, hyperplane_b) >= 0. Pure JVM arithmetic (unrolled dot
    products over fixed literals)."""
    sig = None
    for b in range(bits):
        s = None
        for d in range(dim):
            term = F.element_at(vec, d + 1) * F.lit(_hyperplane(dim, b, d))
            s = term if s is None else s + term
        bit = F.when(s >= 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sig = bit if sig is None else sig + bit
    return sig


def ann_lsh_topk(corpus: DataFrame, *, k: int = 1, dim: int,
                 bits: int = 16, bands: int = 4,
                 id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: candidates share >=1 exact LSH band (equi-
    join on (band, segment) — shuffle keys are uniform by
    construction), then exact cosine re-rank. Recall grows with
    bands; precision is exact on returned pairs."""
    from pyspark.sql import Window

    seg = bits // bands
    base = corpus.select(
        F.col(id_col).alias("id"),
        as_double(F.col(vec_col)).alias("v"),
    ).withColumn("sig", lsh_signature(F.col("v"), dim=dim, bits=bits))
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
    bkt = base.select("id", "v", F.explode(segs).alias("s")).select(
        "id", "v", F.col("s.band").alias("band"), F.col("s.sv").alias("sv")
    )
    l, r = bkt.alias("l"), bkt.alias("r")
    cand = (
        l.join(r, (F.col("l.band") == F.col("r.band"))
               & (F.col("l.sv") == F.col("r.sv"))
               & (F.col("l.id") != F.col("r.id")))
        .select(
            F.col("l.id").alias("qid"),
            F.col("r.id").alias("nid"),
            F.round(cosine(F.col("l.v"), F.col("r.v")), 6).alias("cos"),
        )
        .distinct()
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("nid"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "nid", "cos")
    )
