"""weighted_sample (Efraimidis-Spirakis) and chunk_documents: exact
pure-Python replays + structural properties."""

import hashlib
import math

import pytest

from geocube_spark.functions.sampling import weighted_sample
from geocube_spark.textops.analysis import chunk_documents


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _ref_weighted(rows, n, salt=""):
    keyed = []
    for doc_id, w in rows:
        if doc_id is None or w is None or w <= 0:
            continue
        u = ((_h60(doc_id + salt) % (1 << 60)) + 0.5) / float(1 << 60)
        keyed.append((math.log(u) / w, doc_id))
    keyed.sort(key=lambda t: (-t[0], t[1]))
    return {d for _, d in keyed[:n]}


@pytest.fixture(scope="module")
def weighted_df(spark):
    rows = [(f"d{i:03d}", float((i * 37) % 97 + 1)) for i in range(200)]
    rows += [(None, 5.0), ("neg", -3.0), ("zero", 0.0), ("nullw", None)]
    return (
        spark.createDataFrame(rows, "doc_id string, w double"),
        [(r[0], r[1]) for r in rows],
    )


def test_weighted_sample_matches_replay(spark, weighted_df):
    df, rows = weighted_df
    for n, buckets in ((10, 64), (50, 3), (500, 64)):
        got = {
            r["doc_id"]
            for r in weighted_sample(df, n, "w", buckets=buckets)
            .collect()
        }
        assert got == _ref_weighted(rows, n)
    # salt draws a different subset
    s1 = {r["doc_id"] for r in weighted_sample(df, 10, "w").collect()}
    s2 = {r["doc_id"]
          for r in weighted_sample(df, 10, "w", salt="b").collect()}
    assert s1 == _ref_weighted(rows, 10)
    assert s2 == _ref_weighted(rows, 10, salt="b")
    assert s1 != s2


def test_weighted_sample_prefers_heavy_rows(spark):
    """One row carries 10^6x the weight of 99 others: across 20
    independent salts it must essentially always be drawn (each light
    row only rarely)."""
    rows = [("heavy", 1e6)] + [(f"l{i}", 1.0) for i in range(99)]
    df = spark.createDataFrame(rows, "doc_id string, w double")
    heavy = sum(
        "heavy" in {
            r["doc_id"]
            for r in weighted_sample(df, 5, "w", salt=str(s)).collect()
        }
        for s in range(20)
    )
    assert heavy == 20


def test_weighted_sample_errors(spark, weighted_df):
    df, _ = weighted_df
    with pytest.raises(ValueError, match="n must"):
        weighted_sample(df, 0, "w")
    with pytest.raises(ValueError, match="weight column"):
        weighted_sample(df, 5, "nope")
    with pytest.raises(ValueError, match="buckets"):
        weighted_sample(df, 5, "w", buckets=0)


def test_chunk_documents_pinned_and_reconstruction(spark):
    df = spark.createDataFrame(
        [("a", "t0 t1 t2 t3 t4 t5 t6"), ("b", "  x  "), ("c", ""),
         ("d", "w0 w1 w2")],
        "doc_id string, text string",
    )
    got = {
        (r["id"], r["chunk_id"]): (r["n_tokens"], r["chunk"])
        for r in chunk_documents(df, 3, 1).collect()
    }
    assert got[("a", 0)] == (3, "t0 t1 t2")
    assert got[("a", 1)] == (3, "t2 t3 t4")
    assert got[("a", 2)] == (3, "t4 t5 t6")
    assert ("a", 3) not in got
    assert got[("b", 0)] == (1, "x")
    assert got[("c", 0)] == (0, "")          # empty doc -> one empty chunk
    assert got[("d", 0)] == (3, "w0 w1 w2")
    # no trailing chunk that would hold ONLY already-seen overlap
    assert ("d", 1) not in got
    # a genuine trailing partial IS kept
    got5 = {
        (r["id"], r["chunk_id"]): (r["n_tokens"], r["chunk"])
        for r in chunk_documents(
            df.filter("doc_id = 'a'"), 5, 1).collect()
    }
    assert got5[("a", 0)] == (5, "t0 t1 t2 t3 t4")
    assert got5[("a", 1)] == (3, "t4 t5 t6")
    # reconstruction: dropping the overlap prefix of every later chunk
    # and concatenating recovers the normalized token stream
    toks = []
    for i in range(3):
        chunk = got[("a", i)][1].split(" ")
        toks.extend(chunk if i == 0 else chunk[1:])
    assert toks == ["t0", "t1", "t2", "t3", "t4", "t5", "t6"]


def test_chunk_documents_errors(spark):
    df = spark.createDataFrame([("a", "x")], "doc_id string, text string")
    with pytest.raises(ValueError, match="max_tokens"):
        chunk_documents(df, 0)
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, 4, 4)
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, 4, -1)
