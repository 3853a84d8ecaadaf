"""Paragraph-level dedup with reassembly (functions.dedup.
dedup_paragraphs): first-occurrence-wins keep rule, ordered rebuild,
and a scalar python replay referee."""

import pytest
from pyspark.sql import functions as F

from geocube_spark.functions.dedup import dedup_paragraphs


def _out(df):
    return {r["id"]: r for r in df.collect()}


def test_first_occurrence_wins_and_reassembly(spark):
    # 2-token paragraphs; doc 1 repeats its own first paragraph; doc 2
    # duplicates doc 1's opening; doc 3 is unique
    rows = [
        (1, "a b c d a b"),      # paras: "a b", "c d", "a b"(dup)
        (2, "a b x y"),          # "a b" dup of doc1#0, "x y" kept
        (3, "p q r"),            # "p q", "r" (trailing partial)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = _out(dedup_paragraphs(df, tokens_per_para=2))
    assert got[1]["text"] == "a b c d"
    assert got[1]["n_paras"] == 3 and got[1]["n_kept"] == 2
    assert got[2]["text"] == "x y"
    assert got[2]["n_paras"] == 2 and got[2]["n_kept"] == 1
    assert got[3]["text"] == "p q r"
    assert got[3]["n_kept"] == 2


def test_exact_duplicate_doc_reassembles_empty(spark):
    rows = [(1, "w1 w2 w3 w4"), (2, "w1 w2 w3 w4")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = _out(dedup_paragraphs(df, tokens_per_para=2))
    assert got[1]["text"] == "w1 w2 w3 w4"
    assert got[2]["text"] == "" and got[2]["n_kept"] == 0
    # no document disappears
    assert set(got) == {1, 2}


def test_matches_python_replay(spark):
    """Scalar replay of the whole pipeline (windows -> global
    first-occurrence by (id, pidx) -> rebuild) on a shuffled corpus —
    the distributed result must be order-independent."""
    words = ["w%d" % (i % 7) for i in range(200)]
    rows = [
        (i, " ".join(words[(i * 13) % 50:(i * 13) % 50 + 5 + i % 9]))
        for i in range(40)
    ]
    k = 3
    # python referee
    paras = []
    for did, text in rows:
        toks = [t for t in text.split() if t]
        n = max(1, -(-len(toks) // k))
        for p in range(n):
            paras.append((did, p, " ".join(toks[p * k:p * k + k])))
    seen = {}
    keep = {}
    for did, p, pt in sorted(paras):
        if pt not in seen:
            seen[pt] = (did, p)
            keep[(did, p)] = True
        else:
            keep[(did, p)] = False
    want = {}
    for did, _ in rows:
        mine = sorted(p for d, p, _t in paras if d == did)
        kept = [pt for d, p, pt in sorted(paras)
                if d == did and keep[(d, p)]]
        want[did] = (len(mine), sum(keep[(did, p)] for p in mine),
                     " ".join(kept))

    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(7)
    got = _out(dedup_paragraphs(df, tokens_per_para=k))
    assert set(got) == set(want)
    for did, (np_, nk, txt) in want.items():
        assert got[did]["n_paras"] == np_
        assert got[did]["n_kept"] == nk
        assert got[did]["text"] == txt


def test_validation(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="tokens_per_para"):
        dedup_paragraphs(df, tokens_per_para=0)


def test_dedup_paragraphs_plan_no_cartesian(spark):
    """Two shuffles (hash window + rebuild groupBy), no cartesian
    product, no Python anywhere — the whole pipeline is Catalyst."""
    rows = [(i, "w%d w%d w%d w%d" % (i % 3, i % 5, i % 3, i % 7))
            for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup_paragraphs(df, tokens_per_para=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan
    assert "InPandas" not in plan and "BatchEvalPython" not in plan


def test_cross_dedup_minhash_catches_planted_variants(spark):
    """New corpus = prefix-truncated variants of the reference; every
    variant must be flagged against its own source; unrelated docs
    must survive."""
    from geocube_spark.functions.dedup import cross_dedup_minhash

    ref_rows = [
        (i, " ".join("tok%d_%d" % (i, j) for j in range(30)))
        for i in range(20)
    ]
    ref = spark.createDataFrame(ref_rows, "doc_id long, text string")
    new_rows = (
        # truncated variants of refs 0..9 -> should be caught
        [(100 + i, " ".join(t.split()[:24])) for i, t in ref_rows[:10]]
        # fresh unrelated docs -> should be kept
        + [(200 + i, " ".join("x%d_%d" % (i, j) for j in range(25)))
           for i in range(5)]
    )
    new = spark.createDataFrame(new_rows, "doc_id long, text string")
    got = {r["id"]: r for r in
           cross_dedup_minhash(new, ref, threshold=0.5).collect()}
    assert set(got) == {i for i, _ in new_rows}
    for i in range(10):
        r = got[100 + i]
        assert not r["keep"] and r["dup_of"] == i
        assert r["jaccard"] >= 0.5
    for i in range(5):
        r = got[200 + i]
        assert r["keep"] and r["dup_of"] is None and r["jaccard"] is None
