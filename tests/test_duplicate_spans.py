"""duplicate_spans / duplicate_span_stats: brute-force parity against
a Counter-based reference, short-doc and validation behavior, and the
inverted-index plan shape (no cartesian, no Python)."""

from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from geocube_spark.functions.dedup import (
    duplicate_span_stats,
    duplicate_spans,
)

DOCS = [
    # 1 and 2 share the 10-token tail; 3 is unrelated; 4 repeats 1's
    # text exactly; 5 is shorter than the window; 6 repeats a window
    # WITHIN itself only (must NOT flag at min_docs=2)
    (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu"),
    (2, "different start here gamma delta epsilon zeta eta theta "
        "iota kappa lambda mu"),
    (3, "one two three four five six seven eight nine ten eleven"),
    (4, "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu"),
    (5, "too short"),
    (6, "a b c d e f g h a b c d e f g h"),
]


def _ref(width=8, min_docs=2):
    occs = defaultdict(list)
    for did, text in DOCS:
        toks = text.split()
        for i in range(len(toks) - width + 1):
            occs[" ".join(toks[i:i + width])].append((did, i + 1))
    flagged = {
        w: v for w, v in occs.items()
        if len({d for d, _ in v}) >= min_docs
    }
    return flagged


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_spans_match_bruteforce(spark, docs_df):
    got = duplicate_spans(docs_df).collect()
    flagged = _ref()
    want = sorted(
        (d, p) for v in flagged.values() for d, p in v
    )
    assert sorted((r["id"], r["pos"]) for r in got) == want
    # n_docs annotation
    ndocs = {}
    for w, v in flagged.items():
        for d, p in v:
            ndocs[(d, p)] = len({x for x, _ in v})
    assert {(r["id"], r["pos"]): r["n_docs"] for r in got} == ndocs
    # doc 6's self-repeat and doc 3/5 never flag
    assert not any(r["id"] in (3, 5, 6) for r in got)


def test_stats_ratios(spark, docs_df):
    got = {r["id"]: r for r in duplicate_span_stats(docs_df).collect()}
    assert set(got) == {1, 2, 3, 4, 5, 6}
    flagged = _ref()
    per_doc = defaultdict(int)
    for v in flagged.values():
        for d, _ in v:
            per_doc[d] += 1
    for did, text in DOCS:
        n_win = max(0, len(text.split()) - 7)
        r = got[did]
        assert r["n_windows"] == n_win
        assert r["n_dup"] == per_doc.get(did, 0)
        want = round(per_doc.get(did, 0) / n_win, 6) if n_win else 0.0
        assert r["dup_ratio"] == pytest.approx(want, abs=1e-9)
    assert got[5]["n_windows"] == 0 and got[5]["dup_ratio"] == 0.0


def test_within_doc_only_flags_with_min_docs_definition(spark):
    # the same window twice in ONE doc: not flagged (cross-document
    # semantics); duplicating the doc flags it
    df = spark.createDataFrame(
        [(1, "a b c d e f g h x a b c d e f g h")],
        "doc_id long, text string",
    )
    assert duplicate_spans(df).count() == 0
    df2 = df.union(
        spark.createDataFrame(
            [(2, "a b c d e f g h")], "doc_id long, text string"
        )
    )
    got = duplicate_spans(df2).collect()
    assert {(r["id"], r["pos"]) for r in got} == {
        (1, 1), (1, 10), (2, 1)
    }


def test_validation(spark, docs_df):
    with pytest.raises(ValueError, match="width"):
        duplicate_spans(docs_df, width=0)
    with pytest.raises(ValueError, match="min_docs"):
        duplicate_spans(docs_df, min_docs=1)


def test_plan_shape(spark, docs_df):
    plan = duplicate_spans(
        docs_df
    )._jdf.queryExecution().executedPlan().toString()
    for bad in ("CartesianProduct", "BroadcastNestedLoop",
                "BatchEvalPython", "ArrowEvalPython", "InPandas"):
        assert bad not in plan, bad


class TestDecontaminate:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_planted_leak_flagged(self, spark):
        bench = self._df(spark, [
            (0, "alpha beta gamma delta eps zeta eta theta iota kappa"),
        ])
        corpus = self._df(spark, [
            # full copy -> contaminated
            (10, "alpha beta gamma delta eps zeta eta theta iota kappa"),
            # shares the 8-token window starting at 'beta'
            (11, "XX beta gamma delta eps zeta eta theta iota YY"),
            # clean
            (12, "one two three four five six seven eight nine ten"),
            # too short for any window
            (13, "alpha beta"),
        ])
        from geocube_spark.functions.dedup import decontaminate

        out = {r["id"]: r for r in
               decontaminate(corpus, bench, width=8).collect()}
        assert out[10]["contaminated"] == 1
        assert out[10]["n_contaminated"] == out[10]["n_windows"] == 3
        assert out[11]["contaminated"] == 1
        assert out[11]["n_contaminated"] == 1
        assert out[12]["contaminated"] == 0
        assert out[13]["n_windows"] == 0
        assert out[13]["contaminated"] == 0

    def test_benchmark_broadcast_plan(self, spark, sf_dir):
        from geocube_spark.functions.dedup import decontaminate

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
            .select("doc_id", "text")
        bench = docs.limit(20)
        plan = decontaminate(docs, bench)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "BroadcastHashJoin" in plan

    def test_validation(self, spark):
        from geocube_spark.functions.dedup import decontaminate

        df = self._df(spark, [(1, "x")])
        import pytest as _pytest
        with _pytest.raises(ValueError, match="width"):
            decontaminate(df, df, width=0)
