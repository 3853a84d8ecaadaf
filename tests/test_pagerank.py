"""pagerank: fixed-iteration rank vs a scalar referee + invariants."""

import numpy as np
import pytest

from geocube_spark.functions.graph import pagerank


def _ref(edges, iters=5, d=0.85):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = {}
    for u, v in set(edges):
        out.setdefault(u, set()).add(v)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nr = np.full(n, (1.0 - d) / n)
        dangling = sum(r[idx[u]] for u in nodes if u not in out)
        nr += d * dangling / n
        for u, vs in out.items():
            share = d * r[idx[u]] / len(vs)
            for v in vs:
                nr[idx[v]] += share
        r = nr
    return {v: r[idx[v]] for v in nodes}


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r["node"]: r["rank"]
            for r in pagerank(df, **kw).collect()}


def test_matches_referee_random_graph(spark):
    rng = np.random.default_rng(2)
    edges = [(int(rng.integers(0, 30)), int(rng.integers(0, 30)))
             for _ in range(120)]
    edges = [(u, v) for u, v in edges if u != v]
    got = _run(spark, edges, iters=5)
    want = _ref(edges, iters=5)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_hub_ranks_highest(spark):
    # star: everyone points at node 0
    edges = [(i, 0) for i in range(1, 20)]
    got = _run(spark, edges, iters=10)
    assert got[0] == max(got.values())
    spokes = [got[i] for i in range(1, 20)]
    assert max(spokes) == pytest.approx(min(spokes), abs=1e-15)


def test_dangling_mass_conserved(spark):
    # chain with a dangling end: ranks still sum to 1
    edges = [(0, 1), (1, 2), (2, 3)]
    got = _run(spark, edges, iters=7)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-12)
    assert got == pytest.approx(_ref(edges, iters=7), abs=1e-12)


def test_validation(spark):
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="iters"):
        pagerank(df, iters=0)
    with pytest.raises(ValueError, match="damping"):
        pagerank(df, damping=1.0)


class TestTriangles:
    def _run(self, spark, edges):
        from geocube_spark.functions.graph import triangle_count

        df = spark.createDataFrame(edges, "src long, dst long")
        return {r["node"]: r["n_triangles"]
                for r in triangle_count(df).collect()}

    def test_known_graphs(self, spark):
        # K4: every node in C(3,3)=3 triangles
        k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
        assert self._run(spark, k4) == {i: 3 for i in range(4)}
        # square (no diagonal): zero triangles
        sq = [(0, 1), (1, 2), (2, 3), (3, 0)]
        assert self._run(spark, sq) == {}
        # square + one diagonal: two triangles sharing the diagonal
        sq2 = sq + [(0, 2)]
        assert self._run(spark, sq2) == {0: 2, 2: 2, 1: 1, 3: 1}

    def test_direction_duplicates_selfloops_ignored(self, spark):
        tri = [(0, 1), (1, 0), (1, 2), (2, 0), (0, 0), (1, 2)]
        assert self._run(spark, tri) == {0: 1, 1: 1, 2: 1}

    def test_matches_bruteforce_random(self, spark):
        import itertools

        import numpy as np

        rng = np.random.default_rng(5)
        edges = {(int(a), int(b)) for a, b in
                 rng.integers(0, 25, (160, 2)) if a != b}
        und = {(min(a, b), max(a, b)) for a, b in edges}
        want = {}
        for x, y, z in itertools.combinations(range(25), 3):
            if {(x, y), (y, z), (x, z)} <= und:
                for n in (x, y, z):
                    want[n] = want.get(n, 0) + 1
        assert self._run(spark, sorted(edges)) == want
