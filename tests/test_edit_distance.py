"""edit_distance_pairs: fuzzy (Levenshtein) dedup with ED-Join
q-gram prefix blocking. The blocking must be a provably complete
candidate superset, so every test compares against a brute-force
all-pairs referee computed in plain Python."""

import itertools
import random

import pytest
from pyspark.sql import functions as F

from geocube_spark.functions.dedup import edit_distance_pairs


def _lev(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                     prev + (ca != cb))
    return dp[len(b)]


def _brute(rows, k):
    out = set()
    for (i, a), (j, b) in itertools.combinations(rows, 2):
        ia, ib = (i, j) if i < j else (j, i)
        d = _lev(a, b)
        if d <= k:
            out.add((ia, ib, d))
    return out


def _run(spark, rows, k, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return set(map(tuple,
                   edit_distance_pairs(df, max_dist=k, **kw).collect()))


def _corpus(seed, n=60, alpha="abcd", max_len=30):
    rng = random.Random(seed)
    rows = [(i, "".join(rng.choice(alpha)
                        for _ in range(rng.randint(0, max_len))))
            for i in range(n)]
    # near-variants of the first 20 (one inserted char)
    for i in range(n, n + 20):
        base = rows[i - n][1]
        if base:
            p = rng.randrange(len(base))
            rows.append((i, base[:p] + rng.choice(alpha) + base[p:]))
        else:
            rows.append((i, "a"))
    return rows


@pytest.mark.parametrize("k", [0, 1, 2, 3])
@pytest.mark.parametrize("prefix_filter", [True, False])
def test_matches_bruteforce(spark, k, prefix_filter):
    rows = _corpus(7)
    want = _brute(rows, k)
    got = _run(spark, rows, k, q=3, prefix_filter=prefix_filter)
    assert got == want


def test_short_strings_cross_bucket(spark):
    # lengths straddle the k+1 band boundary in BOTH id orders:
    # lower id in the higher bucket and vice versa.
    rows = [(0, "dda"), (1, "dd"), (2, "x"), (3, "xy"), (4, "")]
    for k in (1, 2):
        assert _run(spark, rows, k, q=3) == _brute(rows, k)


def test_repetitive_strings(spark):
    # degenerate gram diversity (distinct gram count <= k*q): the
    # length-based occurrence bound must still catch these.
    rows = [(0, "a" * 40), (1, "a" * 38), (2, "a" * 20 + "b" + "a" * 19),
            (3, "ab" * 20), (4, "ab" * 19 + "cd")]
    for k in (1, 2, 3):
        for pf in (True, False):
            assert _run(spark, rows, k, q=3,
                        prefix_filter=pf) == _brute(rows, k)


def test_long_documents(spark):
    rng = random.Random(3)
    words = ["alpha", "beta", "gamma", "delta", "eps"]
    rows = []
    for i in range(20):
        rows.append((i, " ".join(rng.choice(words) for _ in range(40))))
    rows.append((100, rows[0][1][3:]))          # ed 3 truncation
    rows.append((101, rows[1][1].replace("alpha", "alphq", 1)))  # ed 1
    got = _run(spark, rows, 3, q=3)
    want = _brute(rows, 3)
    assert got == want
    assert (0, 100, 3) in got and (1, 101, 1) in got


def test_validation(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="max_dist"):
        edit_distance_pairs(df, max_dist=-1)
    with pytest.raises(ValueError, match="q must"):
        edit_distance_pairs(df, q=0)


def test_no_text_in_gram_shuffle(spark):
    """Shuffle hygiene: the candidate-generation exchanges must not
    carry the document text column; text joins back only after the
    distinct candidate ids exist."""
    rows = _corpus(11)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = edit_distance_pairs(df, max_dist=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Exchange hashpartitioning(gram" in line:
            assert "text" not in line
