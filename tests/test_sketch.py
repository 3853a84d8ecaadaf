"""Engine-portable sketches: Bloom semijoin + HyperLogLog."""

import pytest
from pyspark.sql import functions as F

from geocube_spark.functions.sketch import (bloom_semijoin,
                                            hll_count_distinct)


def _kv(spark, name, vals):
    return spark.createDataFrame([(v,) for v in vals], f"{name} long")


def test_bloom_superset_and_false_positives(spark):
    keys = _kv(spark, "k", range(0, 1000, 10))          # 100 keys
    probe = _kv(spark, "p", range(1000))
    out = bloom_semijoin(probe, keys, probe_col="p", key_col="k",
                         bits=512, hashes=3)
    got = {r["p"] for r in out.collect()}
    member = set(range(0, 1000, 10))
    # no false negatives
    assert member <= got
    # tiny filter => some deterministic false positives
    fps = got - member
    assert fps
    # and the filter still prunes most non-members
    assert len(fps) < 0.5 * (1000 - len(member))


def test_bloom_large_filter_is_precise(spark):
    keys = _kv(spark, "k", range(0, 1000, 10))
    probe = _kv(spark, "p", range(1000))
    out = bloom_semijoin(probe, keys, probe_col="p", key_col="k",
                         bits=1 << 20, hashes=3)
    got = {r["p"] for r in out.collect()}
    member = set(range(0, 1000, 10))
    assert member <= got
    assert len(got - member) <= 2   # ~n*k/m fp odds, essentially zero


def test_bloom_probe_side_broadcast_only(spark):
    keys = _kv(spark, "k", range(50))
    probe = _kv(spark, "p", range(500))
    out = bloom_semijoin(probe, keys, probe_col="p", key_col="k",
                         bits=4096, hashes=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 3
    # the probe relation itself is never exchanged on a probe key
    # (the only Exchange allowed is the tiny pos-distinct aggregate)
    assert "Exchange hashpartitioning(p#" not in plan
    assert "Exchange hashpartitioning(__bpos" not in plan


def test_bloom_validation(spark):
    df = _kv(spark, "p", [1])
    with pytest.raises(ValueError, match="bits"):
        bloom_semijoin(df, df, probe_col="p", bits=1)
    with pytest.raises(ValueError, match="hashes"):
        bloom_semijoin(df, df, probe_col="p", hashes=0)


def test_hll_accuracy(spark):
    n = 5000
    df = _kv(spark, "v", range(n))
    row = hll_count_distinct(df, "v", registers=256).collect()[0]
    # sigma ~ 1.04/sqrt(256) = 6.5%; 3 sigma bound
    assert abs(row["estimate"] - n) / n < 0.2
    assert row["registers"] == 256


def test_hll_duplicates_do_not_move_estimate(spark):
    a = _kv(spark, "v", range(500))
    b = _kv(spark, "v", list(range(500)) * 7)
    ea = hll_count_distinct(a, "v").collect()[0]["estimate"]
    eb = hll_count_distinct(b, "v").collect()[0]["estimate"]
    assert ea == eb


def test_hll_small_range_linear_counting(spark):
    df = _kv(spark, "v", range(10))
    row = hll_count_distinct(df, "v", registers=256).collect()[0]
    # linear counting regime: near-exact for tiny cardinalities
    assert row["zero_registers"] >= 246
    assert abs(row["estimate"] - 10) < 1.5


def test_hll_validation(spark):
    df = _kv(spark, "v", [1])
    with pytest.raises(ValueError, match="power of two"):
        hll_count_distinct(df, "v", registers=100)
    with pytest.raises(ValueError, match="power of two"):
        hll_count_distinct(df, "v", registers=8)


def test_hll_registers_streaming_equals_batch(spark, tmp_path):
    """hll_registers is a single aggregation, so it runs unchanged as
    a Structured Streaming stateful agg: an availableNow stream over
    two parquet micro-batches produces the exact batch register table
    (sketches merge by max), and hll_estimate finishes it to the
    identical estimate."""
    import os

    from pyspark.sql import types as T

    from geocube_spark.functions.sketch import (hll_count_distinct,
                                                hll_estimate,
                                                hll_registers)

    in_dir = str(tmp_path / "hll_in")
    os.makedirs(in_dir)
    vals = [(int(v),) for v in range(3000)]
    df1 = spark.createDataFrame(vals[:1500], "v long")
    df2 = spark.createDataFrame(vals[1500:], "v long")
    df1.coalesce(1).write.parquet(f"{in_dir}/b1")
    df2.coalesce(1).write.parquet(f"{in_dir}/b2")
    schema = T.StructType([T.StructField("v", T.LongType())])

    q = (
        hll_registers(
            spark.readStream.schema(schema).parquet(f"{in_dir}/*"),
            "v", registers=64)
        .writeStream.format("memory").queryName("hll_stream")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    stream_regs = spark.table("hll_stream")

    batch = spark.createDataFrame(vals, "v long")
    want_regs = {(r["reg"], r["mr"]) for r in
                 hll_registers(batch, "v", registers=64).collect()}
    got_regs = {(r["reg"], r["mr"]) for r in stream_regs.collect()}
    assert got_regs == want_regs

    est_stream = hll_estimate(stream_regs, registers=64).collect()[0]
    est_batch = hll_count_distinct(batch, "v",
                                   registers=64).collect()[0]
    assert est_stream == est_batch


def test_cms_never_underestimates_and_is_tight(spark):
    from geocube_spark.functions.sketch import (cms_counters,
                                                cms_estimate)

    rng_rows = [(v % 97,) for v in range(5000)]  # zipf-ish repeats
    df = spark.createDataFrame(rng_rows, "v long")
    counters = cms_counters(df, "v", width=256, depth=4)
    probes = spark.createDataFrame([(k,) for k in range(97)], "v long")
    est = {r["v"]: r["estimate"] for r in
           cms_estimate(counters, probes, probe_col="v", width=256,
                        depth=4).collect()}
    from collections import Counter

    exact = Counter(v for (v,) in rng_rows)
    slack = 5000 * 2.0 / 256          # ~ e*n/width, the CM tail bound
    over = [est[k] - exact[k] for k in range(97)]
    assert all(o >= 0 for o in over)  # NEVER an under-estimate
    # the per-key tail bound holds with prob ~1-e^-depth: allow a few
    # violations, none catastrophic, and most keys tight
    assert sum(1 for o in over if o > slack) <= 8
    assert max(over) <= 4 * slack
    assert sorted(over)[48] <= slack / 2


def test_cms_absent_key_small_estimate(spark):
    from geocube_spark.functions.sketch import (cms_counters,
                                                cms_estimate)

    df = spark.createDataFrame([(v,) for v in range(2000)], "v long")
    counters = cms_counters(df, "v", width=4096, depth=4)
    probes = spark.createDataFrame([(999999,)], "v long")
    est = cms_estimate(counters, probes, probe_col="v", width=4096,
                       depth=4).collect()[0]["estimate"]
    assert est <= 3    # wide sketch: near-zero collision mass


def test_cms_mergeable(spark):
    from geocube_spark.functions.sketch import cms_counters
    from pyspark.sql import functions as FF

    a = spark.createDataFrame([(v % 10,) for v in range(500)], "v long")
    b = spark.createDataFrame([(v % 7,) for v in range(300)], "v long")
    whole = a.unionByName(b)
    merged = (
        cms_counters(a, "v", width=128, depth=3)
        .unionByName(cms_counters(b, "v", width=128, depth=3))
        .groupBy("d", "pos").agg(FF.sum("cnt").alias("cnt"))
    )
    direct = cms_counters(whole, "v", width=128, depth=3)
    assert {tuple(r) for r in merged.collect()} == \
        {tuple(r) for r in direct.collect()}


def test_cms_validation(spark):
    from geocube_spark.functions.sketch import (cms_counters,
                                                cms_estimate)

    df = spark.createDataFrame([(1,)], "v long")
    with pytest.raises(ValueError, match="width"):
        cms_counters(df, "v", width=1)
    with pytest.raises(ValueError, match="depth"):
        cms_counters(df, "v", depth=0)
    with pytest.raises(ValueError, match="width"):
        cms_estimate(df, df, probe_col="v", width=1)


# ---------------------------------------------------------------------------
# KMV bottom-k sketch
# ---------------------------------------------------------------------------

def test_kmv_sketch_exact_replay_and_estimates(spark):
    """Scalar replay of the deterministic sketch + the (k-1)/u_k
    estimator; unsaturated sketches are exact by construction."""
    from geocube_spark.functions.dedup import _h60_py
    from geocube_spark.functions.sketch import kmv_estimate, kmv_sketch

    vals = [f"v{i}" for i in range(500)] * 3  # duplicates collapse
    df = spark.createDataFrame([(v,) for v in vals], "x string") \
        .repartition(7)
    k = 64
    sk = kmv_sketch(df, "x", k=k).collect()[0]
    want = sorted(_h60_py(f"v{i}") / float(1 << 60)
                  for i in range(500))[:k]
    assert list(sk["ks"]) == want
    est = kmv_estimate(
        kmv_sketch(df, "x", k=k), k=k).collect()[0]["est"]
    ref = round((k - 1) / want[-1] + 1e-9, 6)
    assert est == ref
    # the estimator should be in the right ballpark of 500
    assert 300 <= est <= 800
    # unsaturated: exact
    small = spark.createDataFrame([(f"s{i}",) for i in range(10)],
                                  "x string")
    e2 = kmv_estimate(kmv_sketch(small, "x", k=k), k=k).collect()[0]
    assert e2["est"] == 10.0 and e2["n_vals"] == 10


def test_kmv_set_estimates_overlap(spark):
    """Half-overlapping sets: Jaccard estimate lands near 1/3 and the
    intersection estimate near the true overlap."""
    from geocube_spark.functions.sketch import (
        kmv_set_estimates, kmv_sketch,
    )

    a = spark.createDataFrame([(f"k{i}",) for i in range(400)],
                              "x string")
    b = spark.createDataFrame([(f"k{i}",) for i in range(200, 600)],
                              "x string")
    k = 128
    out = kmv_set_estimates(kmv_sketch(a, "x", k=k),
                            kmv_sketch(b, "x", k=k), k=k).collect()[0]
    # truth: |A|=|B|=400, union 600, inter 200, J = 1/3
    assert 280 <= out["d_a"] <= 560 and 280 <= out["d_b"] <= 560
    assert 420 <= out["d_union"] <= 840
    assert 0.2 <= out["jaccard"] <= 0.5
    assert 100 <= out["n_inter"] <= 340
    from geocube_spark.functions.sketch import kmv_sketch as _ks
    import pytest as _pt
    with _pt.raises(ValueError, match="k must"):
        _ks(a, "x", k=1)


def test_cms_counters_streaming_equals_batch(spark, tmp_path):
    """cms_counters is a single aggregation (explode -> groupBy sum),
    so it runs unchanged as a Structured Streaming stateful agg: an
    availableNow stream over two micro-batches produces the exact
    batch counter grid, and the estimates finish identically."""
    import os

    from pyspark.sql import types as T

    from geocube_spark.functions.sketch import cms_counters, cms_estimate

    in_dir = str(tmp_path / "cms_in")
    os.makedirs(in_dir)
    vals = [(f"k{v % 97}",) for v in range(4000)]
    df1 = spark.createDataFrame(vals[:2000], "v string")
    df2 = spark.createDataFrame(vals[2000:], "v string")
    df1.coalesce(1).write.parquet(f"{in_dir}/b1")
    df2.coalesce(1).write.parquet(f"{in_dir}/b2")
    schema = T.StructType([T.StructField("v", T.StringType())])

    q = (
        cms_counters(
            spark.readStream.schema(schema).parquet(f"{in_dir}/*"),
            "v", width=256, depth=3)
        .writeStream.format("memory").queryName("cms_stream")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    stream_cnt = spark.table("cms_stream")

    batch = spark.createDataFrame(vals, "v string")
    want = {(r["d"], r["pos"], r["cnt"]) for r in
            cms_counters(batch, "v", width=256, depth=3).collect()}
    got = {(r["d"], r["pos"], r["cnt"]) for r in stream_cnt.collect()}
    assert got == want

    probes = spark.createDataFrame([("k0",), ("k5",)], "v string")
    es = cms_estimate(stream_cnt, probes, probe_col="v",
                      width=256, depth=3).collect()
    eb = cms_estimate(cms_counters(batch, "v", width=256, depth=3),
                      probes, probe_col="v", width=256,
                      depth=3).collect()
    assert sorted(map(tuple, es)) == sorted(map(tuple, eb))


def test_kmv_state_streaming_equals_batch(spark, tmp_path):
    """kmv_state is a single aggregation, so it runs unchanged as a
    Structured Streaming stateful agg: an availableNow stream over
    two parquet micro-batches produces the exact batch sketch
    (bottom-k of the distinct hash set merges by union + re-cut), and
    kmv_estimate finishes both to the identical estimate."""
    import os

    from pyspark.sql import types as T

    from geocube_spark.functions.sketch import (kmv_estimate,
                                                kmv_sketch, kmv_state)

    in_dir = str(tmp_path / "kmv_in")
    os.makedirs(in_dir)
    vals = [(int(v),) for v in range(2000)]
    spark.createDataFrame(vals[:900], "v long") \
        .coalesce(1).write.parquet(f"{in_dir}/b1")
    spark.createDataFrame(vals[900:], "v long") \
        .coalesce(1).write.parquet(f"{in_dir}/b2")
    schema = T.StructType([T.StructField("v", T.LongType())])

    q = (
        kmv_state(
            spark.readStream.schema(schema).parquet(f"{in_dir}/*"),
            "v", k=64)
        .writeStream.format("memory").queryName("kmv_stream_agg")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.table("kmv_stream_agg")

    batch = spark.createDataFrame(vals, "v long")
    want = kmv_sketch(batch, "v", k=64).collect()[0]
    got_row = got.collect()[0]
    assert list(got_row["ks"]) == list(want["ks"])
    assert got_row["n_vals"] == want["n_vals"]
    es = kmv_estimate(got, k=64).collect()[0]["est"]
    eb = kmv_estimate(kmv_sketch(batch, "v", k=64),
                      k=64).collect()[0]["est"]
    assert es == eb


def test_kmv_state_matches_sketch_grouped(spark):
    """Grouped single-agg state form == windowed batch form, group by
    group (same bottom-k either way)."""
    from geocube_spark.functions.sketch import kmv_sketch, kmv_state

    df = spark.createDataFrame(
        [(v % 3, v % 701) for v in range(5000)], "g long, x long"
    )
    a = {r["g"]: (list(r["ks"]), r["n_vals"])
         for r in kmv_sketch(df, "x", k=32, by=["g"]).collect()}
    b = {r["g"]: (list(r["ks"]), r["n_vals"])
         for r in kmv_state(df, "x", k=32, by=["g"]).collect()}
    assert a == b


def test_kmv_stream_bounded_state_equals_batch(spark, tmp_path):
    """The applyInPandasWithState KMV (O(k) state per group) over an
    availableNow two-micro-batch stream lands on the bit-identical
    sketch as the batch operator on the unioned input — bottom-k can
    only shrink downward, so evicted hashes can never re-enter and
    micro-batch boundaries cannot move the result."""
    import os

    from pyspark.sql import types as T

    from geocube_spark.functions.sketch import kmv_estimate, kmv_sketch
    from geocube_spark.streaming.sketch import (kmv_stream,
                                                latest_sketches)

    in_dir = str(tmp_path / "kmvs_in")
    os.makedirs(in_dir)
    # overlap between batches: duplicates across micro-batches must
    # not perturb the sketch
    spark.createDataFrame(
        [(int(v),) for v in range(1200)], "v long"
    ).coalesce(1).write.parquet(f"{in_dir}/b1")
    spark.createDataFrame(
        [(int(v),) for v in range(800, 2000)], "v long"
    ).coalesce(1).write.parquet(f"{in_dir}/b2")
    schema = T.StructType([T.StructField("v", T.LongType())])

    q = (
        kmv_stream(
            spark.readStream.schema(schema).parquet(f"{in_dir}/*"),
            "v", k=64)
        .writeStream.format("memory").queryName("kmv_stream_state")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    final = latest_sketches(spark.table("kmv_stream_state")).collect()
    assert len(final) == 1
    got = final[0]
    assert got["n_seen"] == 2400

    batch = spark.createDataFrame(
        [(int(v),) for v in range(2000)], "v long"
    )
    want = kmv_sketch(batch, "v", k=64).collect()[0]
    assert list(got["ks"]) == list(want["ks"])
    assert got["n_vals"] == want["n_vals"]


def test_kmv_stream_batch_mode_grouped(spark):
    """kmv_stream also runs on a plain batch frame (applyInPandas
    WithState degrades to a grouped map); grouped output matches the
    batch sketch per group."""
    from geocube_spark.functions.sketch import kmv_sketch
    from geocube_spark.streaming.sketch import kmv_stream

    df = spark.createDataFrame(
        [(("a" if v % 2 else "b"), v % 401) for v in range(3000)],
        "g string, x long",
    )
    want = {r["g"]: list(r["ks"])
            for r in kmv_sketch(df, "x", k=16, by=["g"]).collect()}
    got = {r["g"]: list(r["ks"])
           for r in kmv_stream(df, "x", k=16, by=["g"]).collect()}
    assert got == want


def test_bloom_bits_streaming_equals_batch(spark, tmp_path):
    """bloom_bits is a single distinct aggregation, so the Bloom
    claims table runs unchanged as a Structured Streaming stateful
    agg: an availableNow stream over two overlapping parquet
    micro-batches produces the exact batch bit table, and a
    bloom_semijoin fed the streamed table (bits_table=) equals one
    built from the batch keys."""
    import os

    from pyspark.sql import types as T

    from geocube_spark.functions.sketch import bloom_bits, bloom_semijoin

    in_dir = str(tmp_path / "bloom_in")
    os.makedirs(in_dir)
    spark.createDataFrame(
        [(int(v),) for v in range(0, 600, 10)], "k long"
    ).coalesce(1).write.parquet(f"{in_dir}/b1")
    spark.createDataFrame(
        [(int(v),) for v in range(400, 1000, 10)], "k long"
    ).coalesce(1).write.parquet(f"{in_dir}/b2")
    schema = T.StructType([T.StructField("k", T.LongType())])

    q = (
        bloom_bits(
            spark.readStream.schema(schema).parquet(f"{in_dir}/*"),
            "k", bits=512, hashes=3)
        .writeStream.format("memory").queryName("bloom_stream")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    streamed = spark.table("bloom_stream")

    batch_keys = spark.createDataFrame(
        [(int(v),) for v in range(0, 1000, 10)], "k long"
    )
    want = {r["pos"] for r in
            bloom_bits(batch_keys, "k", bits=512, hashes=3).collect()}
    got = {r["pos"] for r in streamed.collect()}
    assert got == want

    probe = spark.createDataFrame([(int(v),) for v in range(1000)],
                                  "p long")
    a = {r["p"] for r in bloom_semijoin(
        probe, batch_keys, probe_col="p", key_col="k",
        bits=512, hashes=3).collect()}
    b = {r["p"] for r in bloom_semijoin(
        probe, probe_col="p", bits=512, hashes=3,
        bits_table=streamed).collect()}
    assert a == b
    assert set(range(0, 1000, 10)) <= b  # no false negatives

    with pytest.raises(ValueError, match="exactly one"):
        bloom_semijoin(probe, batch_keys, probe_col="p",
                       bits_table=streamed)
    with pytest.raises(ValueError, match="exactly one"):
        bloom_semijoin(probe, probe_col="p")
