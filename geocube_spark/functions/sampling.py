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


def weighted_sample(df: DataFrame, n: int, weight_col: str, *,
                    key_col: str = "doc_id", salt: str = "",
                    buckets: int = 64) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis & Spirakis 2006): the ``n`` rows with the largest
    ``ln(u) / w`` where ``u = (h60(key||salt) + 0.5) / 2^60`` — each
    row's inclusion probability is proportional to its weight, yet the
    draw is a pure function of content, so reruns, retries, and
    engines agree (per-quality-score corpus subsetting that survives
    job restarts). Rows with NULL keys or non-positive/NULL weights
    are dropped.

    Same two-phase scale shape as :func:`quota_sample`: per-hash-bucket
    top-n first (no single task ever sorts the full corpus), then the
    global top-n over ``buckets * n`` candidates — provably identical
    to the naive global window."""
    if n < 1:
        raise ValueError("n must be >= 1")
    if buckets < 1:
        raise ValueError("buckets must be >= 1")
    if weight_col not in df.columns:
        raise ValueError(f"unknown weight column {weight_col!r}")
    hc, kc, r1, r2 = ("__gcs_ws_h", "__gcs_ws_k", "__gcs_ws_r1",
                      "__gcs_ws_r2")
    for col in (hc, kc, r1, r2):
        if col in df.columns:
            raise ValueError(f"input already has a column named {col!r}")
    hcol = F.pmod(_key_hash(key_col, salt), F.lit(1 << 60))
    u = (F.col(hc).cast("double") + F.lit(0.5)) / F.lit(float(1 << 60))
    key = F.log(u) / F.col(weight_col).cast("double")
    with_k = (
        df.filter(F.col(key_col).isNotNull()
                  & (F.col(weight_col).cast("double") > 0.0))
        .withColumn(hc, hcol)
        .withColumn(kc, key)
    )
    bucket = F.pmod(F.col(hc), F.lit(buckets))
    w1 = Window.partitionBy(bucket).orderBy(
        F.col(kc).desc(), F.col(key_col).asc()
    )
    cand = with_k.withColumn(r1, F.row_number().over(w1)).filter(
        F.col(r1) <= n
    )
    w2 = Window.orderBy(F.col(kc).desc(), F.col(key_col).asc())
    return (
        cand.withColumn(r2, F.row_number().over(w2))
        .filter(F.col(r2) <= n)
        .drop(hc, kc, r1, r2)
    )


def budget_sample(df: DataFrame, budget: float, stratum_col: str, *,
                  weight_col: str, key_col: str = "doc_id",
                  salt: str = "", plan: str = "window",
                  bracket_buckets: int = 1024) -> DataFrame:
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

    Scale shape (``plan``): unlike ``quota_sample``'s rank, a
    cumulative budget cannot be bucketed into independent prefixes
    (dropping a mid-stream heavy row in one bucket shifts every later
    survivor's cumsum — weights [5, 10, 1] with budget 6 is a
    counterexample), so:

    * ``plan='window'`` (default) — ONE running-sum window per
      stratum; exact, but sorts each stratum in one task.
    * ``plan='bracket'`` — the exact two-pass form for giant strata:
      pass 1 aggregates weight totals per (stratum, ORDER-PRESERVING
      hash range) — a tiny map-side-combined aggregate — and the
      driver walks each stratum's ranges in order to find the single
      range the budget boundary falls in. Pass 2 keeps every row of
      earlier ranges outright (a scan filter, cumsum provably <=
      budget), drops later ranges, and windows ONLY the boundary
      range's rows (~1/``bracket_buckets`` of the stratum) with the
      earlier ranges' total as the cumsum offset. Identical output to
      'window' (differential-tested); requires stratum cardinality x
      ``bracket_buckets`` driver rows (languages x 1024 — trivial).
      Exactness caveat: the two plans add weights in different orders,
      so a row whose cumsum lands within one double ulp of the budget
      could flip between them — irrelevant for integer-valued weights
      (token/byte counts up to 2^53, the intended use)."""
    if budget < 0:
        raise ValueError("budget must be >= 0")
    if plan not in ("window", "bracket"):
        raise ValueError(f"unknown plan {plan!r}")
    hc, c2 = "__gcs_smpl_h", "__gcs_smpl_c"
    for col in (hc, c2):
        if col in df.columns:
            raise ValueError(f"input already has a column named {col!r}")
    wcol = F.coalesce(F.col(weight_col).cast("double"), F.lit(0.0))
    hcol = F.pmod(_key_hash(key_col, salt), F.lit(1 << 60))
    with_h = df.filter(F.col(key_col).isNotNull()).withColumn(hc, hcol)
    order = (F.col(hc).asc(), F.col(key_col).asc())

    if plan == "bracket":
        if bracket_buckets < 2:
            raise ValueError("bracket_buckets must be >= 2")
        # order-preserving range id: hash >> shift keeps hash order,
        # so range r's rows all precede range r+1's in the walk order
        shift = max(0, 60 - int(bracket_buckets - 1).bit_length())
        rng = F.shiftright(F.col(hc), shift)
        totals = (
            with_h.groupBy(F.col(stratum_col).alias("__s"),
                           rng.alias("__r"))
            .agg(F.sum(wcol).alias("__w"))
            .collect()
        )
        per_stratum: dict = {}
        for row in totals:
            per_stratum.setdefault(row["__s"], []).append(
                (row["__r"], row["__w"])
            )
        keep_lt: dict = {}    # stratum -> first range NOT fully kept
        offset: dict = {}     # stratum -> cumsum before that range
        for s, pairs in per_stratum.items():
            run = 0.0
            cut, base = -1, 0.0
            for r, tot in sorted(pairs):
                if run + tot > budget:
                    cut, base = r, run
                    break
                run += tot
            else:
                cut, base = (1 << 61), run  # whole stratum fits
            keep_lt[s] = cut
            offset[s] = base

        null_cut = keep_lt.pop(None, None)
        null_base = offset.pop(None, 0.0)

        def _lit_map(d, default):
            if not d:
                return F.lit(float(default))
            return F.coalesce(
                F.create_map(
                    *[x for k, v in d.items()
                      for x in (F.lit(k), F.lit(float(v)))]
                )[F.col(stratum_col)],
                F.lit(float(default)),
            )

        # a NULL stratum is its own group (SQL window semantics): its
        # cut/base can't live in a map literal (no null keys), so wire
        # it through the WHEN branch
        cut_col = _lit_map(keep_lt, -1.0)
        base_col = _lit_map(offset, 0.0)
        if null_cut is not None:
            isnull = F.col(stratum_col).isNull()
            cut_col = F.when(isnull, F.lit(float(null_cut))).otherwise(
                cut_col
            )
            base_col = F.when(
                isnull, F.lit(float(null_base))
            ).otherwise(base_col)
        early = with_h.filter(rng < cut_col)
        wb = (
            Window.partitionBy(stratum_col)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        boundary = (
            with_h.filter(rng == cut_col)
            .withColumn(c2, F.sum(wcol).over(wb) + base_col)
            .filter(F.col(c2) <= budget)
            .drop(c2)
        )
        return early.unionByName(boundary).drop(hc)

    w = (
        Window.partitionBy(stratum_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        with_h.withColumn(c2, F.sum(wcol).over(w))
        .filter(F.col(c2) <= budget)
        .drop(hc, c2)
    )
