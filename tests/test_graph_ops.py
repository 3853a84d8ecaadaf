"""sssp / label_propagation / k_core (functions.graph): scalar
referee parity on small graphs + determinism + validation."""

import collections
import heapq

import pytest

from geocube_spark.functions.graph import k_core, label_propagation, sssp


def _edges_df(spark, rows, weighted=False):
    schema = ("src long, dst long, w double" if weighted
              else "src long, dst long")
    return spark.createDataFrame(rows, schema)


def _dijkstra(edges, sources):
    """Scalar multi-source Dijkstra over the collapsed edge list."""
    adj = collections.defaultdict(list)
    best_w = {}
    for s, d, w in edges:
        key = (s, d)
        if key not in best_w or w < best_w[key]:
            best_w[key] = w
    for (s, d), w in best_w.items():
        adj[s].append((d, w))
    dist = {s: 0.0 for s in sources}
    pq = [(0.0, s) for s in sources]
    while pq:
        du, u = heapq.heappop(pq)
        if du > dist.get(u, float("inf")):
            continue
        for v, w in adj[u]:
            nd = du + w
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    return dist


def test_sssp_matches_dijkstra(spark):
    import random

    rng = random.Random(11)
    rows = []
    for _ in range(300):
        a, b = rng.randrange(40), rng.randrange(40)
        if a != b:
            w = float(rng.randrange(1, 10))
            rows.append((a, b, w))
    df = _edges_df(spark, rows, weighted=True)
    got = {r["node"]: r["dist"]
           for r in sssp(df, [0, 7], weight_col="w").collect()}
    want = _dijkstra(rows, [0, 7])
    assert got == want  # integer weights -> exact


def test_sssp_hops_and_unreachable(spark):
    # 0->1->2, isolated pair 5->6: hop distances, 5/6 unreached
    df = _edges_df(spark, [(0, 1), (1, 2), (5, 6)])
    got = {r["node"]: r["dist"] for r in sssp(df, [0]).collect()}
    assert got == {0: 0.0, 1: 1.0, 2: 2.0}


def test_sssp_validation(spark):
    df = _edges_df(spark, [(0, 1, -1.0)], weighted=True)
    with pytest.raises(ValueError, match="non-negative"):
        sssp(df, [0], weight_col="w")
    with pytest.raises(ValueError, match="source"):
        sssp(_edges_df(spark, [(0, 1)]), [])
    # a 5-hop path cannot converge in 2 rounds
    path = _edges_df(spark, [(i, i + 1) for i in range(5)])
    with pytest.raises(RuntimeError, match="converge"):
        sssp(path, [0], max_rounds=2)


def _lpa_ref(edges, iters):
    """Scalar synchronous LPA, most-frequent neighbor label, ties to
    smallest."""
    adj = collections.defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    labels = {n: n for n in adj}
    for _ in range(iters):
        new = {}
        for n in adj:
            cnt = collections.Counter(labels[m] for m in adj[n])
            new[n] = min(cnt, key=lambda l: (-cnt[l], l))
        labels = new
    return labels


def test_label_propagation_two_cliques(spark):
    # two 4-cliques bridged by one edge: after a few rounds each
    # clique holds its own minimum label
    cliq1 = [(a, b) for a in range(4) for b in range(4) if a < b]
    cliq2 = [(a, b) for a in range(10, 14) for b in range(10, 14)
             if a < b]
    edges = cliq1 + cliq2 + [(3, 10)]
    df = _edges_df(spark, edges)
    got = {r["node"]: r["label"]
           for r in label_propagation(df, iters=4).collect()}
    assert got == _lpa_ref(edges, 4)
    assert all(got[n] == 0 for n in range(3))
    assert all(got[n] == 10 for n in range(11, 14))


def test_label_propagation_matches_reference_random(spark):
    import random

    rng = random.Random(5)
    edges = list({(min(a, b), max(a, b))
                  for a, b in ((rng.randrange(30), rng.randrange(30))
                               for _ in range(120)) if a != b})
    df = _edges_df(spark, edges)
    for iters in (1, 3):
        got = {r["node"]: r["label"]
               for r in label_propagation(df, iters=iters).collect()}
        assert got == _lpa_ref(edges, iters)
    with pytest.raises(ValueError, match="iters"):
        label_propagation(df, iters=0)


def _kcore_ref(edges, k):
    es = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    while True:
        deg = collections.Counter()
        for a, b in es:
            deg[a] += 1
            deg[b] += 1
        keep = {n for n, d in deg.items() if d >= k}
        ne = {(a, b) for a, b in es if a in keep and b in keep}
        if ne == es:
            return {n: deg[n] for n in keep}
        es = ne


def test_k_core_cascade_and_referee(spark):
    # K4 core with a pendant chain: the chain peels away over
    # multiple rounds, the K4 survives as the 3-core
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    chain = [(3, 4), (4, 5), (5, 6)]
    df = _edges_df(spark, k4 + chain)
    got = {r["node"]: r["deg"] for r in k_core(df, 3).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}
    # 2-core: chain still peels (endpoints have degree 1)
    got2 = {r["node"]: r["deg"] for r in k_core(df, 2).collect()}
    assert got2 == _kcore_ref(k4 + chain, 2)
    # empty core
    assert k_core(df, 10).count() == 0

    import random

    rng = random.Random(3)
    edges = list({(min(a, b), max(a, b))
                  for a, b in ((rng.randrange(25), rng.randrange(25))
                               for _ in range(80)) if a != b})
    dfr = _edges_df(spark, edges)
    for k in (2, 3, 4):
        got = {r["node"]: r["deg"] for r in k_core(dfr, k).collect()}
        assert got == _kcore_ref(edges, k)
    with pytest.raises(ValueError, match="k must"):
        k_core(dfr, 0)


def test_connected_components_matches_union_find(spark):
    import random

    from geocube_spark.functions.graph import connected_components

    rng = random.Random(19)
    # several small clusters + isolated-pair edges
    edges = []
    for c in range(6):
        base = c * 20
        nodes = list(range(base, base + rng.randrange(2, 8)))
        for n in nodes[1:]:
            edges.append((nodes[0], n))
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["component"]
           for r in connected_components(df).collect()}
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp = {}
    for n in parent:
        comp.setdefault(find(n), []).append(n)
    want = {n: min(mem) for mem in comp.values() for n in mem}
    assert got == want
    # deep chain exceeds a tiny round budget -> loud failure
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "src long, dst long")
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(chain, max_rounds=3)
    # but converges given enough rounds
    got2 = {r["node"]: r["component"]
            for r in connected_components(chain, max_rounds=15).collect()}
    assert set(got2.values()) == {0}
