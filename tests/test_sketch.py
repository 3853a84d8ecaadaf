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
