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


def test_token_ngram_counts_matches_counter(spark):
    """Counter referee over hand-made docs: totals, doc frequency,
    short-doc handling (fewer than n tokens -> no windows),
    min_count filter, and n=1 equals plain token counts."""
    import collections

    from geocube_spark.textops.analysis import token_ngram_counts

    rows = [(1, "a b a b c"), (2, "a b"), (3, "x"), (4, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["ngram"]: (r["count"], r["n_docs"])
           for r in token_ngram_counts(df, n=2).collect()}
    cnt = collections.Counter()
    docs = collections.defaultdict(set)
    for did, text in rows:
        ts = text.split()
        for i in range(len(ts) - 1):
            g = " ".join(ts[i:i + 2])
            cnt[g] += 1
            docs[g].add(did)
    want = {g: (c, len(docs[g])) for g, c in cnt.items()}
    assert got == want
    assert got["a b"] == (3, 2)
    # min_count filter
    got2 = {r["ngram"] for r in
            token_ngram_counts(df, n=2, min_count=2).collect()}
    assert got2 == {g for g, (c, _) in want.items() if c >= 2}
    # unigrams = token counts
    got1 = {r["ngram"]: r["count"]
            for r in token_ngram_counts(df, n=1).collect()}
    allt = collections.Counter(
        t for _, text in rows for t in text.split())
    assert got1 == dict(allt)
    import pytest as _pt
    with _pt.raises(ValueError, match="n must"):
        token_ngram_counts(df, n=0)
