"""Probabilistic sketches with ENGINE-PORTABLE determinism.

Classic sketches are usually seeded per-run; here every hash is the
portable ``h60`` (md5-based) used across the package, so a sketch is
a pure function of its input multiset — the same Bloom bits, the same
HLL registers, the same false positives on every engine. That is what
makes them driver-oracle-checkable: DuckDB replays the identical
arithmetic and must produce the identical (approximate!) answer.

* :func:`bloom_positions` / :func:`bloom_semijoin` — Bloom-filter
  join pruning, the canonical 100 TB shuffle-avoidance pattern: build
  the filter from the small key side, drop non-matching probe rows
  BEFORE the expensive join/shuffle. Double hashing
  (Kirsch & Mitzenmacher 2006): ``pos_j = (h1 + j * h2) mod m`` with
  ``h2`` forced odd.
* :func:`hll_count_distinct` — Flajolet et al. 2007 HyperLogLog over
  the 60-bit hash: ``p``-bit register index, max leading-zero rank
  per register, harmonic-mean estimate with the small-range
  linear-counting correction. One map-side-combined aggregate; the
  sketch state is ``m`` tiny rows.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..textops.analysis import h60


def _h2(col: Column) -> Column:
    """Second hash for double hashing, forced odd so all k probe
    positions are distinct mod any power-of-two m."""
    return h60(F.concat(col, F.lit("#"))).bitwiseOR(F.lit(1))


def bloom_positions(key: Column, *, bits: int, hashes: int):
    """The ``hashes`` Bloom bit positions of a key (list of Columns).
    Both hashes are reduced mod ``bits`` BEFORE the double-hash
    combination — algebraically identical to ``(h1 + j*h2) mod m``
    but immune to int64 overflow for any j."""
    h1 = h60(key) % F.lit(bits)
    h2 = _h2(key) % F.lit(bits)
    return [((h1 + F.lit(j) * h2) % F.lit(bits)).alias(f"pos{j}")
            for j in range(hashes)]


def bloom_bits(keys: DataFrame, key_col: str, *, bits: int = 1 << 20,
               hashes: int = 3) -> DataFrame:
    """The Bloom filter STATE: its set-bit table — one row per
    distinct set position (at most ``min(bits, n_keys * hashes)``
    longs). A single distinct aggregation, so it runs unchanged under
    Structured Streaming (update/complete mode) — stream the claims
    table from an unbounded key stream and feed the compacted state to
    :func:`bloom_semijoin` via ``bits_table=``; bit tables merge by
    union + re-distinct (sketches are mergeable by construction, like
    :func:`hll_registers` / :func:`kmv_state`)."""
    if bits < 2:
        raise ValueError(f"bits must be >= 2, got {bits}")
    if hashes < 1:
        raise ValueError(f"hashes must be >= 1, got {hashes}")
    kc = F.col(key_col).cast("string")
    # groupBy rather than distinct: same output (distinct positions),
    # but Structured Streaming recognizes only a real aggregation for
    # complete/update-mode state
    return keys.select(
        F.explode(F.array(*bloom_positions(kc, bits=bits,
                                           hashes=hashes))).alias("pos")
    ).groupBy("pos").agg(F.count(F.lit(1)).alias("__n")).select("pos")


def bloom_semijoin(probe: DataFrame, keys: DataFrame = None, *,
                   probe_col: str, key_col: str = None,
                   bits: int = 1 << 20, hashes: int = 3,
                   bits_table: DataFrame = None) -> DataFrame:
    """Filter ``probe`` to rows whose ``probe_col`` passes a Bloom
    filter built from ``keys[key_col]`` — a guaranteed SUPERSET of the
    exact semijoin (no false negatives; deterministic false positives
    at rate ~ ``(1 - e^(-kn/m))^k``).

    The filter is represented as its set-bit table (distinct
    positions, at most ``min(bits, n_keys * hashes)`` longs) and
    applied as ``hashes`` consecutive BROADCAST semijoins — the probe
    side never shuffles, and the whole filter chain is whole-stage
    JVM code (h60 is md5+conv, built-in). This is the join-pruning
    pattern: at 100 TB, run ``bloom_semijoin`` before the real join so
    only surviving rows enter the wide shuffle.

    ``bits_table=`` accepts a prebuilt :func:`bloom_bits` table
    (e.g. the compacted state of a streaming claims build) instead of
    ``keys`` — same ``bits``/``hashes`` must be used on both sides.
    """
    if bits < 2:
        raise ValueError(f"bits must be >= 2, got {bits}")
    if hashes < 1:
        raise ValueError(f"hashes must be >= 1, got {hashes}")
    if (keys is None) == (bits_table is None):
        raise ValueError("pass exactly one of keys / bits_table")
    if bits_table is not None:
        pos = bits_table.select("pos")
    else:
        pos = bloom_bits(keys, key_col or probe_col, bits=bits,
                         hashes=hashes)

    pc = F.col(probe_col).cast("string")
    out = probe
    for j, p in enumerate(bloom_positions(pc, bits=bits,
                                          hashes=hashes)):
        out = out.withColumn(f"__bpos{j}", p)
        out = out.join(
            F.broadcast(pos.withColumnRenamed("pos", f"__bpos{j}")),
            f"__bpos{j}", "left_semi",
        )
    return out.drop(*[f"__bpos{j}" for j in range(hashes)])


HLL_HASH_BITS = 60


def hll_count_distinct(df: DataFrame, col: str, *,
                       registers: int = 256) -> DataFrame:
    """HyperLogLog distinct-count estimate over ``h60(col)`` — the
    bounded-memory cardinality sketch (Flajolet, Fusy, Gandouet &
    Meunier 2007). ``registers`` (m) must be a power of two >= 16.

    * register = ``h mod m``; the remaining ``60 - p`` bits form w;
      rank = leading zeros of w in that width + 1
      (= ``60 - p + 1 - floor(log2(w)) - ... `` via bit position; w=0
      ranks ``60 - p + 1``).
    * raw estimate ``alpha_m * m^2 / sum(2^-M_j)`` (empty registers
      contribute ``2^0``); small-range correction: if raw <= 2.5m and
      some register is empty, ``m * ln(m / V)`` (linear counting).

    One narrow map + ONE map-side-combined ``groupBy(register).max``
    — the shuffle carries at most m rows per partition; the merged
    sketch is m rows regardless of input size (that is the point).
    Deterministic: same input multiset => same registers => same
    estimate, on any engine (the driver oracle replays it in SQL).

    Returns one row: (registers, zero_registers, raw_estimate,
    estimate) with the estimates rounded to 4 dp."""
    regs = hll_registers(df, col, registers=registers)
    return hll_estimate(regs, registers=registers)


def hll_registers(df: DataFrame, col: str, *,
                  registers: int = 256) -> DataFrame:
    """The HLL sketch STATE: (reg, mr) rows, max rank per register.
    This is a SINGLE aggregation, so it runs unchanged under
    Structured Streaming (update/complete mode) — stream the
    registers, then finish with :func:`hll_estimate` per micro-batch
    or on the compacted state (streaming forbids chained
    aggregations, which is exactly why the sketch is split here).
    Register tables merge by another groupBy(reg).max — sketches are
    mergeable by construction."""
    m = int(registers)
    if m < 16 or (m & (m - 1)) != 0:
        raise ValueError(f"registers must be a power of two >= 16, "
                         f"got {registers}")
    p = int(math.log2(m))
    wbits = HLL_HASH_BITS - p

    h = h60(F.col(col).cast("string"))
    reg = (h % m).alias("reg")
    w = F.floor(h / m)
    rank = F.when(w > 0,
                  F.lit(wbits) - F.floor(F.log2(w))) \
        .otherwise(F.lit(wbits + 1)).cast("int").alias("rank")
    return (
        df.select(reg, rank)
        .groupBy("reg").agg(F.max("rank").alias("mr"))
    )


def hll_estimate(regs: DataFrame, *, registers: int = 256) -> DataFrame:
    """Finish an :func:`hll_registers` state into the one-row
    estimate (see :func:`hll_count_distinct` for the formula)."""
    m = int(registers)
    if m < 16 or (m & (m - 1)) != 0:
        raise ValueError(f"registers must be a power of two >= 16, "
                         f"got {registers}")
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = regs.agg(
        F.count(F.lit(1)).alias("n_used"),
        F.sum(F.pow(F.lit(2.0), -F.col("mr"))).alias("s_used"),
    )
    return agg.select(
        F.lit(m).alias("registers"),
        (F.lit(m) - F.col("n_used")).alias("zero_registers"),
        F.round(
            F.lit(alpha * m * m)
            / (F.col("s_used") + (F.lit(m) - F.col("n_used"))), 4
        ).alias("raw_estimate"),
    ).select(
        "registers", "zero_registers", "raw_estimate",
        F.round(
            F.when(
                (F.col("raw_estimate") <= 2.5 * m)
                & (F.col("zero_registers") > 0),
                F.lit(float(m))
                * F.log(F.lit(float(m)) / F.col("zero_registers")),
            ).otherwise(F.col("raw_estimate")), 4
        ).alias("estimate"),
    )


def cms_counters(df: DataFrame, col: str, *, width: int = 1024,
                 depth: int = 4) -> DataFrame:
    """Count-Min sketch state (Cormode & Muthukrishnan 2005): a
    ``depth x width`` counter grid as (d, pos, cnt) rows; row ``d``
    hashes items with the double-hashed family
    ``(h1 + (d+1) * h2) mod width`` (h2 odd — same construction as
    the Bloom positions, different lane offsets so no row reuses the
    Bloom layout). ONE map-side-combined aggregate after a
    ``depth``-way explode; state is at most depth*width tiny rows no
    matter the input size, and sketches MERGE by summing counters.
    Single aggregation => runs unchanged under Structured Streaming.
    """
    if width < 2:
        raise ValueError(f"width must be >= 2, got {width}")
    if depth < 1:
        raise ValueError(f"depth must be >= 1, got {depth}")
    key = F.col(col).cast("string")
    h1 = h60(key) % F.lit(width)
    h2 = _h2(key) % F.lit(width)
    lanes = F.array(*[
        F.struct(F.lit(d).alias("d"),
                 ((h1 + F.lit(d + 1) * h2) % F.lit(width)).alias("pos"))
        for d in range(depth)
    ])
    return (
        df.select(F.explode(lanes).alias("l"))
        .select(F.col("l.d").alias("d"), F.col("l.pos").alias("pos"))
        .groupBy("d", "pos").agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(counters: DataFrame, probes: DataFrame, *,
                 probe_col: str, width: int = 1024,
                 depth: int = 4) -> DataFrame:
    """Point-frequency estimates from a :func:`cms_counters` state:
    for every probe key, ``min`` over its ``depth`` counters — never
    an under-estimate, over by at most ~ n*e/width with probability
    1 - e^-depth. The counter table broadcasts (<= depth*width rows);
    probes never shuffle. Returns (probe_col, estimate)."""
    if width < 2 or depth < 1:
        raise ValueError("width must be >= 2 and depth >= 1")
    key = F.col(probe_col).cast("string")
    h1 = h60(key) % F.lit(width)
    h2 = _h2(key) % F.lit(width)
    out = probes
    for d in range(depth):
        pos = ((h1 + F.lit(d + 1) * h2) % F.lit(width))
        cd = counters.where(F.col("d") == d).select(
            F.col("pos").alias(f"__p{d}"),
            F.col("cnt").alias(f"__c{d}"),
        )
        out = out.withColumn(f"__p{d}", pos).join(
            F.broadcast(cd), f"__p{d}", "left")
    est = F.least(*[F.coalesce(F.col(f"__c{d}"), F.lit(0))
                    for d in range(depth)])
    return out.select(probe_col, est.cast("long").alias("estimate"))


_KMV_SCALE = float(1 << 60)


def kmv_sketch(df: DataFrame, col: str, *, k: int = 256,
               by=None) -> DataFrame:
    """KMV (k-minimum-values) distinct sketch (Bar-Yossef et al.
    2002; Beyer et al. SIGMOD'07 for the set-operation estimators):
    the ``k`` smallest unit-interval hashes ``u = h60(v) / 2^60`` of
    the DISTINCT values — a mergeable, engine-portable summary whose
    estimates are deterministic functions of the input set (same
    portability contract as the Bloom/HLL/CMS sketches above).

    Returns one row per group: (by..., ks: array<double> ascending,
    n_vals) — ``n_vals < k`` means the sketch IS the exact distinct
    set. Plan: one distinct + one bottom-k window per group (the
    shuffle carries 8-byte hashes); at extreme group widths swap the
    window for the two-phase bucketed top-n used by quota sampling —
    the sketch itself stays identical."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    from pyspark.sql import Window

    keys = list(by) if by else []
    u = (h60(F.col(col).cast("string")) / F.lit(_KMV_SCALE)).alias("u")
    d = df.select(*keys, u).distinct()
    if not keys:
        # keyless: two-phase bottom-k (per-partition prune first) so
        # the final single-partition window only ever sees
        # k x n_partitions rows, never the distinct set
        wp = Window.partitionBy(F.spark_partition_id()).orderBy("u")
        d = d.select("u", F.row_number().over(wp).alias("rp")) \
            .where(F.col("rp") <= k).select("u")
    w = Window.partitionBy(*keys).orderBy("u") if keys else \
        Window.orderBy("u")
    topk = d.select(*keys, "u", F.row_number().over(w).alias("rn")) \
        .where(F.col("rn") <= k)
    return (
        topk.groupBy(*keys)
        .agg(F.sort_array(F.collect_list("u")).alias("ks"))
        .select(*keys, "ks", F.size("ks").cast("long").alias("n_vals"))
    )


def kmv_state(df: DataFrame, col: str, *, k: int = 256,
              by=None) -> DataFrame:
    """The KMV sketch as a SINGLE aggregation — the streaming-safe
    state form, mirroring :func:`hll_registers`: ``collect_set`` of
    the unit-interval hashes, sorted and cut to ``k`` in the same
    projection, so it runs unchanged under Structured Streaming
    (update/complete mode; the batch :func:`kmv_sketch` uses window
    functions, which streams forbid). Identical output contract —
    (by..., ks ascending, n_vals) — and bit-identical values, since
    bottom-k of the distinct hash set is the same set either way;
    finish with :func:`kmv_estimate`.

    State trade: Spark's agg state here is the per-group DISTINCT
    hash set (8 bytes/value), not the cut sketch — fine for bounded
    per-group cardinality. For unbounded streams use
    ``streaming.sketch.kmv_stream``, which keeps only the bottom-k
    per group via ``applyInPandasWithState``."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    keys = list(by) if by else []
    u = (h60(F.col(col).cast("string")) / F.lit(_KMV_SCALE)).alias("u")
    ks = F.slice(F.array_sort(F.collect_set("u")), 1, k).alias("ks")
    agg = df.select(*keys, u).groupBy(*keys).agg(ks)
    return agg.select(
        *keys, "ks", F.size("ks").cast("long").alias("n_vals")
    )


def kmv_estimate(sketch: DataFrame, *, k: int = 256) -> DataFrame:
    """Distinct-count estimate from a :func:`kmv_sketch` row:
    exact ``n_vals`` when the sketch is unsaturated, else the
    unbiased ``(k - 1) / u_(k)`` (Beyer et al. 2007). Adds ``est``
    (rounded 6 dp, the cross-engine parity rule)."""
    full = F.size("ks") >= k
    est = F.when(
        full, (F.lit(float(k - 1)) / F.element_at("ks", k))
    ).otherwise(F.size("ks").cast("double"))
    return sketch.select("*", F.round(est + F.lit(1e-9), 6).alias("est"))


def kmv_set_estimates(sk_a: DataFrame, sk_b: DataFrame, *,
                      k: int = 256) -> DataFrame:
    """Set-operation estimates from two single-group KMV sketches
    (Beyer et al. 2007): combine to the union sketch ``Kc`` =
    bottom-k of the merged hash sets, estimate the union cardinality
    from it, and estimate Jaccard as ``rho = |Kc ∩ A ∩ B| / |Kc|``;
    the intersection estimate is ``rho * union_est``. Every quantity
    is a deterministic function of the two input sets. Returns ONE
    row: (d_a, d_b, d_union, jaccard, n_inter), all rounded 6 dp."""
    a = kmv_estimate(sk_a, k=k).select(
        F.col("ks").alias("ka"), F.col("est").alias("d_a"),
        F.lit(1).alias("__k"))
    b = kmv_estimate(sk_b, k=k).select(
        F.col("ks").alias("kb"), F.col("est").alias("d_b"),
        F.lit(1).alias("__k"))
    j = a.join(b, "__k")  # 1 x 1 rows, literal-key equi-join
    kc = F.slice(F.array_sort(F.array_union("ka", "kb")), 1, k)
    ufull = F.size(kc) >= k
    u_est = F.when(
        ufull, F.lit(float(k - 1)) / F.element_at(kc, k)
    ).otherwise(F.size(kc).cast("double"))
    shared = F.array_intersect("ka", "kb")
    rho = (F.size(F.array_intersect(kc, shared))
           / F.size(kc).cast("double"))
    return j.select(
        "d_a", "d_b",
        F.round(u_est + F.lit(1e-9), 6).alias("d_union"),
        F.round(rho + F.lit(1e-9), 6).alias("jaccard"),
        F.round(rho * u_est + F.lit(1e-9), 6).alias("n_inter"),
    )
