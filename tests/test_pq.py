"""Product quantization (functions.similarity.pq_train / pq_codes /
ann_pq_topk): scalar replay parity, ADC recall floor, validation."""

import numpy as np
import pytest

from geocube_spark.functions.similarity import (
    ann_pq_topk, pq_codes, pq_train,
)


def _df(spark, ids, X, parts=1):
    rows = [(int(i), [float(v) for v in x]) for i, x in zip(ids, X)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df.repartition(parts) if parts > 1 else df


def _sub_assign(msub, Cs):
    d2 = ((msub * msub).sum(1)[:, None] - 2 * msub @ Cs.T
          + (Cs * Cs).sum(1)[None, :])
    return np.round(d2 + 1e-9, 6).argmin(axis=1)


def _train_ref(ids, X, m, k, iters):
    from geocube_spark.functions.dedup import _h60_py

    order = sorted(range(len(ids)),
                   key=lambda i: (_h60_py(str(ids[i])), ids[i]))
    seeds = X[order[:k]]
    dsub = X.shape[1] // m
    C = np.stack([seeds[:, s * dsub:(s + 1) * dsub] for s in range(m)])
    for _ in range(iters):
        newC = C.copy()
        for s in range(m):
            msub = X[:, s * dsub:(s + 1) * dsub]
            cid = _sub_assign(msub, C[s])
            for c in range(len(C[s])):
                sel = msub[cid == c]
                if len(sel):
                    newC[s][c] = sel.mean(axis=0)
        C = newC
    return C


def test_pq_train_and_codes_match_scalar(spark):
    rng = np.random.default_rng(13)
    X = rng.normal(0, 1, (90, 16)).astype(np.float32).astype(np.float64)
    ids = np.arange(90)
    for parts in (1, 6):
        C = pq_train(_df(spark, ids, X, parts), m=4, k=6, iters=2)
        want = _train_ref(ids, X, 4, 6, 2)
        np.testing.assert_allclose(C, want, rtol=0, atol=0)
        codes = {r["id"]: list(r["codes"])
                 for r in pq_codes(_df(spark, ids, X, parts), C).collect()}
        for i in range(90):
            for s in range(4):
                assert codes[i][s] == _sub_assign(
                    X[i:i + 1, s * 4:(s + 1) * 4], C[s])[0]


def test_ann_pq_finds_planted_near_duplicates(spark):
    """ADC is a coarse quantized distance — asserting exact-kNN
    recall on tight clusters would test the noise floor, not the
    operator. The honest property: a planted near-duplicate (which
    encodes to the same or adjacent code word) must surface in the
    query's top-3 for the overwhelming majority of queries, while
    far-away vectors must not outrank it."""
    rng = np.random.default_rng(5)
    n, dim = 60, 32
    X = rng.normal(0, 3, (n, dim))
    dup = X + rng.normal(0, 0.01, (n, dim))  # id i -> near-dup i+n
    allx = np.concatenate([X, dup])
    ids = np.arange(2 * n)
    df = _df(spark, ids, allx, 4)
    q = _df(spark, ids[:12], allx[:12])
    got = ann_pq_topk(df, queries=q, m=4, k=16, iters=2,
                      topk=3).collect()
    byq = {}
    for r in got:
        byq.setdefault(r["qid"], []).append(r["nid"])
    hits = sum(1 for qi in range(12) if qi + n in byq[qi])
    assert hits >= 10  # >= ~83% of planted dups in top-3
    # ranks are 1..3, self excluded
    assert all(r["nid"] != r["qid"] for r in got)
    assert sorted(r["rank"] for r in got if r["qid"] == 0) == [1, 2, 3]


def test_pq_validation(spark):
    X = np.zeros((4, 10))
    df = _df(spark, range(4), X)
    with pytest.raises(ValueError, match="divisible"):
        pq_train(df, m=3)
    with pytest.raises(ValueError, match="m must"):
        pq_train(df, m=0)
    with pytest.raises(ValueError, match="topk"):
        ann_pq_topk(df, m=2, topk=0)
    with pytest.raises(ValueError, match="empty"):
        pq_train(df.where("vec_id < 0"), m=2)


def test_quantize_roundtrip_and_determinism(spark):
    from geocube_spark.functions.similarity import (
        dequantize_embeddings, quantize_embeddings,
    )

    rng = np.random.default_rng(2)
    X = rng.normal(0, 2, (70, 12)).astype(np.float32).astype(np.float64)
    X[:, 5] = 3.25  # degenerate dimension -> code 0 everywhere
    ids = np.arange(70)
    codes_df, mn, mx = quantize_embeddings(_df(spark, ids, X, 5))
    codes = {r["id"]: np.asarray(r["codes"]) for r in codes_df.collect()}
    np.testing.assert_array_equal(mn, X.min(axis=0))
    np.testing.assert_array_equal(mx, X.max(axis=0))
    assert all(c[5] == 0 for c in codes.values())
    assert all((c >= 0).all() and (c <= 255).all() for c in codes.values())
    # scalar replay: identical closed form
    rngv = mx - mn
    for i in ids:
        x = (X[i] - mn) / np.where(rngv == 0, 1.0, rngv) * 255.0
        want = np.clip(np.floor(x + 0.5 + 1e-9), 0, 255).astype(int)
        want[rngv == 0] = 0
        np.testing.assert_array_equal(codes[i], want)
    # reconstruction within half a step per dim
    rec = {r["id"]: np.asarray(r["v"])
           for r in dequantize_embeddings(codes_df, mn, mx).collect()}
    step = np.where(rngv == 0, 0.0, rngv / 255.0)
    for i in ids:
        assert (np.abs(rec[i] - X[i]) <= step / 2 + 1e-12).all()
