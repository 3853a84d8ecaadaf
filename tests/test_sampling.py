"""Deterministic sampling operators: reproducibility, nesting, quota
exactness, and two-phase == naive-window equivalence."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from geocube_spark.functions.sampling import (
    hash_sample, quota_sample, stratified_sample,
)
from geocube_spark.textops.analysis import h60


@pytest.fixture(scope="module")
def docs(spark):
    return spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text-"), F.col("id")).alias("text"),
        F.element_at(
            F.array(F.lit("en"), F.lit("de"), F.lit("fr"), F.lit("zz")),
            (F.col("id") % 4 + 1).cast("int"),
        ).alias("lang"),
    )


def test_hash_sample_deterministic_and_near_rate(spark, docs):
    a = sorted(r["doc_id"] for r in hash_sample(docs, 0.2).collect())
    b = sorted(r["doc_id"] for r in hash_sample(docs, 0.2).collect())
    assert a == b and len(a) > 0
    # binomial(2000, 0.2): expect within ~5 sigma of 400
    assert 300 <= len(a) <= 500


def test_hash_sample_nested_and_salted(spark, docs):
    s10 = {r["doc_id"] for r in hash_sample(docs, 0.1).collect()}
    s30 = {r["doc_id"] for r in hash_sample(docs, 0.3).collect()}
    assert s10 <= s30
    other = {r["doc_id"] for r in hash_sample(docs, 0.1, salt="b").collect()}
    assert other != s10  # independent draw
    with pytest.raises(ValueError):
        hash_sample(docs, 1.5)


def test_stratified_rates(spark, docs):
    out = stratified_sample(
        docs, {"en": 1.0, "de": 0.0}, "lang", default_rate=0.2
    ).groupBy("lang").count().collect()
    got = {r["lang"]: r["count"] for r in out}
    assert got["en"] == 500
    assert "de" not in got
    for lang in ("fr", "zz"):
        assert 50 <= got[lang] <= 160


def test_quota_exact_and_matches_naive_window(spark, docs):
    out = quota_sample(docs, 30, "lang", buckets=8)
    counts = {r["lang"]: r["count"]
              for r in out.groupBy("lang").count().collect()}
    assert counts == {"en": 30, "de": 30, "fr": 30, "zz": 30}
    # naive single-window reference
    hh = F.pmod(h60(F.col("doc_id").cast("string")), F.lit(1 << 60))
    w = Window.partitionBy("lang").orderBy(hh.asc(), F.col("doc_id").asc())
    naive = (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 30).drop("rn")
    )
    got = {(r["lang"], r["doc_id"]) for r in out.collect()}
    want = {(r["lang"], r["doc_id"]) for r in naive.collect()}
    assert got == want


def test_quota_small_stratum(spark):
    few = spark.range(0, 7).select(
        F.col("id").alias("doc_id"), F.lit("only").alias("lang")
    )
    assert quota_sample(few, 100, "lang").count() == 7
    with pytest.raises(ValueError):
        quota_sample(few, 0, "lang")


def test_quota_null_keys_dropped_and_validation(spark):
    rows = [(None, "en"), (None, "en")] + [(i, "en") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = quota_sample(df, 5, "lang").collect()
    assert len(out) == 5
    assert all(r["doc_id"] is not None for r in out)
    with pytest.raises(ValueError, match="buckets"):
        quota_sample(df, 5, "lang", buckets=0)
    clash = df.withColumn("__gcs_smpl_h", F.lit(1))
    with pytest.raises(ValueError, match="__gcs_smpl_h"):
        quota_sample(clash, 5, "lang")
