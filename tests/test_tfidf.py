"""tfidf_top_terms: hand-computed parity, tie determinism, ranking
semantics, validation."""

import math

import pytest

from geocube_spark.textops.analysis import tfidf_top_terms


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        ("d1", "apple banana apple cherry"),
        ("d2", "banana banana date"),
        ("d3", "cherry date date date"),
        ("d4", "apple  cherry\tcherry  "),
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


def _reference(rows, k):
    import collections
    tf = {d: collections.Counter(t.split()) for d, t in rows}
    n = len(rows)
    dfreq = collections.Counter()
    for c in tf.values():
        dfreq.update(set(c))
    out = {}
    for d, c in tf.items():
        scored = sorted(
            ((term, cnt, cnt * math.log(n / dfreq[term]))
             for term, cnt in c.items()),
            key=lambda x: (-x[2], x[0]),
        )
        out[d] = [(t, cnt, s, i + 1)
                  for i, (t, cnt, s) in enumerate(scored[:k])]
    return out


def test_tfidf_matches_reference(spark, corpus):
    rows = [(r.doc_id, r.text) for r in corpus.collect()]
    want = _reference(rows, k=2)
    got = tfidf_top_terms(corpus, k=2).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r.doc_id, []).append(
            (r.term, r.tf, r.score, r.rank))
    assert set(by_doc) == set(want)
    for d in want:
        assert len(by_doc[d]) == len(want[d])
        for (gt, gc, gs, gr), (wt, wc, ws, wr) in zip(by_doc[d], want[d]):
            assert (gt, gc, gr) == (wt, wc, wr)
            assert abs(gs - ws) < 1e-12


def test_tfidf_tie_breaks_alphabetical(spark):
    # two terms with identical tf and df in the same doc: term order
    df = spark.createDataFrame(
        [("a", "zebra apple"), ("b", "zebra apple"), ("c", "other")],
        "doc_id string, text string",
    )
    got = tfidf_top_terms(df, k=2).collect()
    a_terms = [r.term for r in got if r.doc_id == "a"]
    assert a_terms == ["apple", "zebra"]


def test_tfidf_everywhere_term_scores_zero(spark, corpus):
    # a term present in ALL docs has idf = ln(1) = 0
    df = corpus.sparkSession.createDataFrame(
        [("x", "common rare1"), ("y", "common rare2")],
        "doc_id string, text string",
    )
    got = {(r.doc_id, r.term): r.score
           for r in tfidf_top_terms(df, k=2).collect()}
    assert got[("x", "common")] == 0.0
    assert got[("x", "rare1")] > 0.0


def test_tfidf_validation(spark, corpus):
    with pytest.raises(ValueError, match="k must be"):
        tfidf_top_terms(corpus, k=0)
    empty = corpus.limit(0)
    with pytest.raises(ValueError, match="empty corpus"):
        tfidf_top_terms(empty)
