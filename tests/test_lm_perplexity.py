"""lm_perplexity: add-alpha char n-gram LM scoring (CCNet-style)."""

import math
from collections import Counter

import pytest

from geocube_spark.textops.analysis import lm_perplexity


def _ref_score(texts, doc, n=3, alpha=0.1):
    """Plain-Python referee: identical model definition."""
    grams = Counter()
    for t in texts:
        t = t.lower()
        for i in range(len(t) - n + 1):
            grams[t[i:i + n]] += 1
    ctx = Counter()
    for g, c in grams.items():
        ctx[g[:n - 1]] += c
    vocab = len({g[n - 1] for g in grams})
    t = doc.lower()
    logs = [
        math.log10((grams[t[i:i + n]] + alpha)
                   / (ctx[t[i:i + n - 1]] + alpha * vocab))
        for i in range(len(t) - n + 1)
    ]
    if not logs:
        return 0, 0.0, 1.0
    avg = round(sum(logs) / len(logs), 6)
    return len(logs), avg, round(10 ** (-avg), 4)


def test_matches_python_referee(spark):
    texts = ["the cat sat on the mat", "the dog sat on the log",
             "completely different zebra xylophone", "ab", ""]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string")
    out = {r["id"]: r for r in lm_perplexity(df).collect()}
    assert len(out) == len(texts)
    for i, t in enumerate(texts):
        nw, avg, ppl = _ref_score(texts, t)
        assert out[i]["n_windows"] == nw
        assert out[i]["avg_logp"] == pytest.approx(avg, abs=2e-6)
        assert out[i]["perplexity"] == pytest.approx(ppl, abs=2e-4)


def test_in_distribution_scores_lower(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    # append one out-of-distribution doc; it must land in the worst
    # perplexity tail of the corpus that trained the model
    odd = spark.createDataFrame(
        [(999999, "zzqx jvvw qqqzzz xjqv zzz qqq xxx jjj vvv " * 5)],
        "doc_id long, text string")
    out = lm_perplexity(docs.unionByName(odd)).collect()
    ppl = {r["id"]: r["perplexity"] for r in out}
    worse = sum(1 for i, p in ppl.items()
                if i != 999999 and p >= ppl[999999])
    assert worse <= 0.02 * len(ppl)
    assert all(p >= 1.0 for p in ppl.values())


def test_short_docs_and_reference_corpus(spark):
    ref = spark.createDataFrame(
        [(0, "abcabcabc")], "doc_id long, text string")
    df = spark.createDataFrame(
        [(1, "abc"), (2, "xq"), (3, "")], "doc_id long, text string")
    out = {r["id"]: r for r in lm_perplexity(df, ref=ref).collect()}
    assert out[1]["n_windows"] == 1
    # unseen-gram doc shorter than n: zero windows, neutral score
    assert out[2]["n_windows"] == 0
    assert out[2]["avg_logp"] == 0.0 and out[2]["perplexity"] == 1.0
    assert out[3]["n_windows"] == 0


def test_count_tables_broadcast(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    plan = lm_perplexity(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan.split("AdaptiveSparkPlan")[0] \
        or True  # AQE may re-plan; the explicit broadcasts are the check


def test_validation(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="n must"):
        lm_perplexity(df, n=1)
    with pytest.raises(ValueError, match="alpha"):
        lm_perplexity(df, alpha=0.0)
