"""PII detect/scrub and Gopher repetition metrics: parity against an
independent pure-Python (``re`` module) reference on adversarial rows,
plus the determinism/portability invariants the oracles rely on.

Reference has no text operators (training-data-pipeline extension
family); semantics follow the public Gopher repetition-removal rules
(Rae et al. 2021, table A1) and the standard regex PII pass.
"""

import re

import pytest
from pyspark.sql import functions as F

from geocube_spark.textops.analysis import repetition_metrics
from geocube_spark.textops.pii import (
    PII_PATTERNS,
    pii_counts,
    scrub_pii,
    with_pii,
)

ROWS = [
    "plain text with no pii at all, just words.",
    "mail me at jane.doe+spam@sub.example.co.uk today",
    "two mails: a@b.io and c_d%x@y-z.org in one line",
    "ssn 123-45-6789 phone 555-123-4567 ip 10.0.255.7",
    "dotted phone 555.123.4567 vs version 1.2.3 and 1.2.3.4",
    "user123@example.com glued9.9.9.9text and spaced 9.9.9.9 end",
    "edge: 999-99-9999, 000.000.0000, 1.22.333.44, not 12-34-5678",
    "",
]


def _py_scrub(text: str) -> str:
    for _, pat, repl in PII_PATTERNS:
        text = re.sub(pat, repl, text)
    return text


def _py_counts(text: str) -> dict:
    return {
        f"n_{name}": len(re.findall(pat, text))
        for name, pat, _ in PII_PATTERNS
    }


def test_pii_matches_re_module(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(ROWS)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in with_pii(df).orderBy("doc_id").collect()
    }
    for i, t in enumerate(ROWS):
        want = _py_counts(t)
        for k, v in want.items():
            assert got[i][k] == v, (i, k, t)
        assert got[i]["clean_text"] == _py_scrub(t), (i, t)


def test_pii_scrub_removes_every_detected_match(spark):
    # after scrubbing, re-running the detector finds nothing
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(ROWS)], "doc_id long, text string"
    )
    clean = df.select(scrub_pii(F.col("text")).alias("text"))
    rescan = clean.select(
        *[v.alias(k) for k, v in pii_counts(F.col("text")).items()]
    ).collect()
    for r in rescan:
        assert all(v == 0 for v in r.asDict().values()), r


def test_pii_count_independence_of_scrub_order(spark):
    # the categories are disjoint on raw text: total matched chars of
    # the union equals the sum of per-pattern matched chars
    for t in ROWS:
        spans = []
        for _, pat, _ in PII_PATTERNS:
            spans.extend(m.span() for m in re.finditer(pat, t))
        covered = set()
        for a, b in spans:
            rng = set(range(a, b))
            assert not (rng & covered), (t, (a, b))
            covered |= rng


REP_ROWS = [
    "one line only no repeats here",
    "alpha beta\ngamma delta\nalpha beta\nepsilon",
    "spam ham spam ham spam ham spam ham",
    "a\n\n  \na\nb\nb\nb",
    "unique lines\nall different\nno dups anywhere",
]


def _py_repetition(text: str) -> dict:
    lines = [l for l in text.split("\n") if l.strip(" ")]
    n = len(lines)
    dup_line_frac = round(1.0 - len(set(lines)) / n, 6) if n else 0.0
    total = float(sum(len(l) for l in lines))
    dup_chars = sum(
        lines.count(l) * len(l) for l in set(lines) if lines.count(l) > 1
    )
    dup_line_char_frac = round(dup_chars / max(total, 1.0), 6)
    toks = re.split(r"\s+", text.strip(" "))
    grams = [
        " ".join(toks[i - 1 : i + 1])
        for i in range(1, max(1, len(toks) - 1) + 1)
    ]
    top = max(
        (grams.count(g) * len(g) for g in set(grams)), default=0.0
    )
    top_2gram_char_frac = round(top / max(len(text), 1), 6)
    keep = int(dup_line_frac <= 0.30 and top_2gram_char_frac <= 0.20)
    return {
        "dup_line_frac": dup_line_frac,
        "dup_line_char_frac": dup_line_char_frac,
        "top_2gram_char_frac": top_2gram_char_frac,
        "rep_keep": keep,
    }


def test_repetition_matches_python_reference(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(REP_ROWS)],
        "doc_id long, text string",
    )
    m = repetition_metrics(F.col("text"))
    got = {
        r["doc_id"]: r.asDict()
        for r in df.select(
            "doc_id", *[v.alias(k) for k, v in m.items()]
        ).collect()
    }
    for i, t in enumerate(REP_ROWS):
        want = _py_repetition(t)
        for k, v in want.items():
            assert got[i][k] == pytest.approx(v, abs=1e-9), (i, k, t)


def test_repetition_flags_the_spammy_doc(spark):
    # the clean doc must be long enough that a count-1 top 2-gram
    # covers < 20% of its characters (Gopher applies to web docs,
    # not 5-word snippets)
    clean = (
        "the quick brown fox jumps over the lazy dog and then runs"
        " far away home tonight under a pale sky"
    )
    df = spark.createDataFrame(
        [(0, REP_ROWS[2]), (1, clean)], "doc_id long, text string"
    )
    m = repetition_metrics(F.col("text"))
    rows = {
        r["doc_id"]: r["rep_keep"]
        for r in df.select("doc_id", m["rep_keep"].alias("rep_keep"))
        .collect()
    }
    assert rows[0] == 0 and rows[1] == 1


def test_pii_plan_is_narrow(spark):
    # no shuffle: the whole op is a single projection over the scan
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    plan = with_pii(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_char_entropy_matches_counter(spark):
    """Scalar Counter referee + edge cases (uniform text -> log2 of
    alphabet size; single repeated char -> 0; empty -> 0)."""
    import collections
    import math

    import numpy as np

    from geocube_spark.textops.analysis import char_entropy

    rows = [(1, "abab"), (2, "aaaa"), (3, ""), (4, "abcd"),
            (5, "hello world, entropy!"), (6, "ü ü é")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: r for r in char_entropy(df).collect()}
    for did, text in rows:
        cnt = collections.Counter(text)
        n = len(text)
        want = (-sum((c / n) * math.log2(c / n)
                     for c in cnt.values()) if n else 0.0)
        assert got[did]["n_chars"] == n
        np.testing.assert_allclose(got[did]["entropy"], want, atol=1e-6)
    assert got[2]["entropy"] == 0.0
    assert abs(got[1]["entropy"] - 1.0) < 1e-9
    assert abs(got[4]["entropy"] - 2.0) < 1e-9
