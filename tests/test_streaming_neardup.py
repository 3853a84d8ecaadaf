"""Streaming MinHash-LSH near-dup dedup: increment-boundary
invariance (one increment == three increments), guaranteed-drop of
every batch LSH candidate's later member, and exactly-once resume
behavior of the claims/survivors epochs.
"""

import os
import random

import pytest
from pyspark.sql import functions as F

from geocube_spark.functions.dedup import minhash_lsh_pairs
from geocube_spark.streaming.neardup import NearDupStream

WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa quebec romeo sierra tango "
    "uniform victor whiskey xray yankee zulu red green blue amber"
).split()


def _corpus():
    rng = random.Random(42)
    rows = []
    for i in range(40):
        text = " ".join(rng.choice(WORDS) for _ in range(40))
        rows.append((i, text))
    # near-dups: 80% token truncation of every 3rd doc, arriving later
    for i in range(0, 40, 3):
        toks = rows[i][1].split()
        rows.append((1000 + i, " ".join(toks[: int(len(toks) * 0.8)])))
    # exact dups of every 5th doc, arriving last
    for i in range(0, 40, 5):
        rows.append((2000 + i, rows[i][1]))
    # ts strictly increasing with id -> id order == time order
    return [
        (doc_id, text, f"2024-01-01 00:{doc_id // 100:02d}:{doc_id % 60:02d}")
        for doc_id, text in sorted(rows)
    ]


def _write(spark, rows, path):
    spark.createDataFrame(
        rows, "doc_id long, text string, ts string"
    ).withColumn("ts", F.to_timestamp("ts")).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _run_increments(spark, tmp, rows, n_parts, tag):
    src = os.path.join(tmp, f"src_{tag}")
    out = os.path.join(tmp, f"out_{tag}")
    ckpt = os.path.join(tmp, f"ckpt_{tag}")
    nd = NearDupStream(out)
    step = (len(rows) + n_parts - 1) // n_parts
    for j in range(n_parts):
        part = rows[j * step : (j + 1) * step]
        if not part:
            continue
        _write(spark, part, src)
        nd.refresh(spark, src, ckpt)
    return {
        r["doc_id"] for r in nd.survivors(spark).select("doc_id").collect()
    }


@pytest.fixture(scope="module")
def corpus():
    return _corpus()


def test_increment_boundaries_do_not_matter(spark, tmp_path_factory, corpus):
    tmp = str(tmp_path_factory.mktemp("neardup"))
    one = _run_increments(spark, tmp, corpus, 1, "one")
    three = _run_increments(spark, tmp, corpus, 3, "three")
    assert one == three
    assert len(one) < len(corpus)  # something was actually dropped


def test_every_batch_lsh_pair_later_member_dropped(
    spark, tmp_path_factory, corpus
):
    tmp = str(tmp_path_factory.mktemp("neardup_pairs"))
    survivors = _run_increments(spark, tmp, corpus, 2, "pairs")
    docs = spark.createDataFrame(
        [(i, t) for i, t, _ in corpus], "doc_id long, text string"
    )
    pairs = minhash_lsh_pairs(docs, threshold=0.0).collect()
    assert pairs, "corpus must produce LSH candidates"
    # id order == ts order, so id_b (the larger id) arrived later and
    # shares a band bucket with id_a -> the any-collision rule must
    # have dropped it
    for p in pairs:
        assert p["id_b"] not in survivors, (p["id_a"], p["id_b"])
    # and every original (non-dup) doc with no earlier partner survives
    partnered = {p["id_b"] for p in pairs}
    for i, _, _ in corpus:
        if i < 1000 and i not in partnered:
            assert i in survivors, i


def test_exact_duplicates_always_dropped(spark, tmp_path_factory, corpus):
    tmp = str(tmp_path_factory.mktemp("neardup_exact"))
    survivors = _run_increments(spark, tmp, corpus, 2, "exact")
    for i, _, _ in corpus:
        if i >= 2000:  # exact copies of earlier docs
            assert i not in survivors, i


def test_epoch_replay_is_idempotent(spark, tmp_path_factory, corpus):
    # re-running process_batch for an already-written epoch must leave
    # survivors and claims unchanged (crash-replay safety)
    tmp = str(tmp_path_factory.mktemp("neardup_replay"))
    src = os.path.join(tmp, "src")
    out = os.path.join(tmp, "out")
    ckpt = os.path.join(tmp, "ckpt")
    nd = NearDupStream(out)
    _write(spark, corpus, src)
    nd.refresh(spark, src, ckpt)
    before = {
        r["doc_id"] for r in nd.survivors(spark).select("doc_id").collect()
    }
    batch0 = spark.createDataFrame(
        [(i, t, ts) for i, t, ts in corpus],
        "doc_id long, text string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    nd.process_batch(batch0, 0)  # simulate a replay of epoch 0
    after = {
        r["doc_id"] for r in nd.survivors(spark).select("doc_id").collect()
    }
    assert before == after
