"""Deterministic sampling operators for training-data pipelines.

Corpus curation at 100 TB needs *reproducible* subsetting — Spark's
``df.sample`` is seed-dependent per partitioning and re-executes
differently across retries, which silently changes the training set.
These operators decide membership from a content hash instead, so the
same input row always samples the same way on any cluster layout, any
retry, any engine (the h60 hash is plain md5 — DuckDB oracles replay
it exactly):

* ``hash_sample``       — Bernoulli(rate) by hash of a key column; a
  narrow filter inside whole-stage codegen, zero shuffle.
* ``stratified_sample`` — per-stratum rates (e.g. language-balanced
  downsampling); one broadcast map lookup + the same narrow filter.
* ``quota_sample``      — exactly-n-per-stratum (deterministic "take
  the n smallest hashes"), two-phase so a giant stratum never sorts
  whole: per-(stratum, hash-bucket) top-n first (cuts each stratum to
  64*n candidate rows regardless of input size), then the global
  per-stratum top-n over candidates. Both phases are Column-only
  window programs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..textops.analysis import h60

_M = 1_000_000  # hash-rate denominator (micro-rates)


def _key_hash(key_col: str, salt: str):
    return h60(F.concat(F.col(key_col).cast("string"), F.lit(salt)))


def hash_sample(df: DataFrame, rate: float, *, key_col: str = "doc_id",
                salt: str = "") -> DataFrame:
    """Keep a row iff ``h60(key || salt) % 1e6 < rate * 1e6``.

    Deterministic, partitioning-independent, and disjoint samples come
    free: two calls with different ``salt`` draw independent subsets,
    and ``rate=0.1`` vs ``rate=0.2`` with the same salt are NESTED
    (the 10% sample is a subset of the 20% one) — the property
    training-data ablations need."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    thresh = int(round(rate * _M))
    return df.filter(F.pmod(_key_hash(key_col, salt), F.lit(_M)) < thresh)


def stratified_sample(df: DataFrame, rates: dict, stratum_col: str, *,
                      default_rate: float = 0.0,
                      key_col: str = "doc_id",
                      salt: str = "") -> DataFrame:
    """Per-stratum Bernoulli rates (language/source-balanced corpora).

    ``rates`` maps stratum value -> rate; strata absent from the map
    use ``default_rate``. The rate map is a literal broadcast into the
    filter expression — the plan stays a narrow, shuffle-free scan
    filter with full predicate pushdown above it."""
    for s, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for stratum {s!r} must be in [0, 1]")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError("default_rate must be in [0, 1]")
    rate_map = F.create_map(
        *[x for s, r in rates.items()
          for x in (F.lit(s), F.lit(int(round(r * _M))))]
    )
    thresh = F.coalesce(
        rate_map[F.col(stratum_col)],
        F.lit(int(round(default_rate * _M))),
    )
    return df.filter(F.pmod(_key_hash(key_col, salt), F.lit(_M)) < thresh)


def quota_sample(df: DataFrame, n: int, stratum_col: str, *,
                 key_col: str = "doc_id", salt: str = "",
                 buckets: int = 64) -> DataFrame:
    """Exactly ``min(n, stratum size)`` rows per stratum: the n rows
    with the smallest ``(h60(key||salt), key)`` — a deterministic
    uniform draw with a total order, so reruns and engines agree.

    Scale shape: a naive ``row_number() OVER (PARTITION BY stratum)``
    sorts every stratum in one task — a 10^11-row stratum is one hot
    partition. Phase 1 here splits each stratum into ``buckets`` hash
    buckets and takes the per-bucket top-n (tasks see 1/buckets of a
    stratum); phase 2 re-ranks only the surviving ``buckets * n``
    candidates per stratum. The global top-n is always contained in
    the union of per-bucket top-n, so the result is provably identical
    to the naive window.

    NULL keys are dropped (like ``hash_sample``, whose NULL hash fails
    the sampling predicate): they have no deterministic hash, and
    Spark's NULLS-FIRST ascending sort would otherwise let them preempt
    quota slots while a NULLS-LAST engine replaying the same draw
    picked different rows."""
    if n < 1:
        raise ValueError("n must be >= 1")
    if buckets < 1:
        raise ValueError("buckets must be >= 1")
    hc, r1, r2 = "__gcs_smpl_h", "__gcs_smpl_r1", "__gcs_smpl_r2"
    for col in (hc, r1, r2):
        if col in df.columns:
            raise ValueError(f"input already has a column named {col!r}")
    hcol = F.pmod(_key_hash(key_col, salt), F.lit(1 << 60))
    with_h = df.filter(F.col(key_col).isNotNull()).withColumn(hc, hcol)
    bucket = F.pmod(F.col(hc), F.lit(buckets))
    w1 = Window.partitionBy(F.col(stratum_col), bucket).orderBy(
        F.col(hc).asc(), F.col(key_col).asc()
    )
    cand = with_h.withColumn(r1, F.row_number().over(w1)).filter(
        F.col(r1) <= n
    )
    w2 = Window.partitionBy(stratum_col).orderBy(
        F.col(hc).asc(), F.col(key_col).asc()
    )
    return (
        cand.withColumn(r2, F.row_number().over(w2))
        .filter(F.col(r2) <= n)
        .drop(hc, r1, r2)
    )


def budget_sample(df: DataFrame, budget: float, stratum_col: str, *,
                  weight_col: str, key_col: str = "doc_id",
                  salt: str = "") -> DataFrame:
    """Per-stratum WEIGHT budget (the corpus-mixing primitive: "take
    documents per language until ~1B tokens"): walk each stratum in
    deterministic ``(h60(key||salt), key)`` order and keep rows while
    the running sum of ``weight_col`` stays <= ``budget``. Since
    weights are cumulative the kept set is a strict prefix of the
    hash order — the first overflowing row and everything after it
    are excluded (a single row heavier than the whole budget yields
    zero rows for its stratum). NULL keys are dropped; NULL weights
    count as 0; weights are assumed non-negative (a negative weight
    breaks the prefix property and the result is then order-dependent
    nonsense — token/byte counts never are).

    Scale shape: ONE running-sum window per stratum. Unlike
    ``quota_sample``'s rank, a cumulative budget cannot be bucketed
    into independent prefixes (dropping a mid-stream heavy row in one
    bucket shifts every later survivor's cumsum — weights [5, 10, 1]
    with budget 6 is a counterexample), so the exact form sorts each
    stratum. With language-like strata (bounded cardinality, huge
    rows) the production refinement is a two-pass cut search: pass 1
    aggregates weight totals per (stratum, hash range) to bracket the
    cut hash on the driver, pass 2 keeps ``hash < bracket_lo``
    outright and windows only the bracket's rows. The single-window
    form here is the semantics both must reproduce."""
    if budget < 0:
        raise ValueError("budget must be >= 0")
    hc, c2 = "__gcs_smpl_h", "__gcs_smpl_c"
    for col in (hc, c2):
        if col in df.columns:
            raise ValueError(f"input already has a column named {col!r}")
    wcol = F.coalesce(F.col(weight_col).cast("double"), F.lit(0.0))
    hcol = F.pmod(_key_hash(key_col, salt), F.lit(1 << 60))
    with_h = df.filter(F.col(key_col).isNotNull()).withColumn(hc, hcol)
    w = (
        Window.partitionBy(stratum_col)
        .orderBy(F.col(hc).asc(), F.col(key_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        with_h.withColumn(c2, F.sum(wcol).over(w))
        .filter(F.col(c2) <= budget)
        .drop(hc, c2)
    )
