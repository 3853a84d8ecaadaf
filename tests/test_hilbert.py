"""Hilbert curve: numpy / Column / SQL agreement + pruning planner."""

import duckdb
import numpy as np
import pytest

from geocube_spark.grid.hilbert import (
    hilbert_key,
    hilbert_key_sql,
    hilbert_ranges,
    hilbert_xy,
    ranges_predicate,
    with_hilbert_key,
)


def test_order1_matches_hand_curve():
    # the order-1 curve visits (0,0) (0,1) (1,1) (1,0)
    xs = np.array([0, 0, 1, 1])
    ys = np.array([0, 1, 1, 0])
    assert hilbert_key(xs, ys, 1).tolist() == [0, 1, 2, 3]


def test_roundtrip_exhaustive_order5():
    order = 5
    n = 1 << order
    xs, ys = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    d = hilbert_key(xs.ravel(), ys.ravel(), order)
    # bijection onto [0, 4^order)
    assert sorted(d.tolist()) == list(range(n * n))
    rx, ry = hilbert_xy(d, order)
    np.testing.assert_array_equal(rx, xs.ravel())
    np.testing.assert_array_equal(ry, ys.ravel())


def test_adjacency_property_order6():
    # consecutive keys are 4-neighbors on the grid — the defining
    # locality property (fails for Morton/Z order)
    order = 6
    n = 1 << order
    x, y = hilbert_xy(np.arange(n * n), order)
    step = np.abs(np.diff(x)) + np.abs(np.diff(y))
    assert step.max() == 1


def test_aligned_block_is_contiguous_and_aligned():
    # every aligned 2^m x 2^m quadtree block is one contiguous,
    # 4^m-aligned key run — the fact hilbert_ranges relies on
    order, m = 7, 3
    side = 1 << m
    rng = np.random.default_rng(7)
    for _ in range(20):
        qx = int(rng.integers(0, (1 << order) >> m))
        qy = int(rng.integers(0, (1 << order) >> m))
        xs, ys = np.meshgrid(
            np.arange(qx * side, (qx + 1) * side),
            np.arange(qy * side, (qy + 1) * side),
            indexing="ij",
        )
        d = np.sort(hilbert_key(xs.ravel(), ys.ravel(), order))
        assert d[0] % (side * side) == 0
        assert d[-1] - d[0] == side * side - 1
        assert np.all(np.diff(d) == 1)


def test_ranges_cover_rectangle_exactly():
    order = 6
    rng = np.random.default_rng(11)
    for _ in range(25):
        tx0, ty0 = rng.integers(0, 60, 2)
        tx1 = int(rng.integers(tx0, 64))
        ty1 = int(rng.integers(ty0, 64))
        tx0, ty0 = int(tx0), int(ty0)
        ranges = hilbert_ranges(tx0, tx1, ty0, ty1, order,
                                max_ranges=10 ** 9)
        covered = set()
        for lo, hi in ranges:
            covered.update(range(lo, hi + 1))
        xs, ys = np.meshgrid(
            np.arange(tx0, tx1 + 1), np.arange(ty0, ty1 + 1),
            indexing="ij",
        )
        want = set(hilbert_key(xs.ravel(), ys.ravel(), order).tolist())
        assert covered == want  # EXACT when uncapped
        # sorted + disjoint
        flat = [v for r in ranges for v in r]
        assert flat == sorted(flat)


def test_ranges_cap_is_superset():
    order = 8
    ranges = hilbert_ranges(3, 200, 5, 9, order, max_ranges=10 ** 9)
    capped = hilbert_ranges(3, 200, 5, 9, order, max_ranges=4)
    assert len(capped) <= 4 < len(ranges)
    full = set()
    for lo, hi in capped:
        full.update(range(lo, hi + 1))
    for lo, hi in ranges:
        assert all(v in full for v in (lo, hi))


def test_out_of_range_raises():
    with pytest.raises(ValueError):
        hilbert_key(np.array([4]), np.array([0]), 2)
    with pytest.raises(ValueError):
        hilbert_xy(np.array([16]), 2)
    with pytest.raises(ValueError):
        hilbert_ranges(0, 4, 0, 1, 2)
    with pytest.raises(ValueError):
        hilbert_key(np.array([0]), np.array([0]), 0)


def test_column_program_matches_numpy(spark):
    order = 9
    n = 1 << order
    rng = np.random.default_rng(3)
    tx = rng.integers(0, n, 500)
    ty = rng.integers(0, n, 500)
    want = hilbert_key(tx, ty, order)
    df = spark.createDataFrame(
        [(int(i), int(a), int(b)) for i, (a, b) in
         enumerate(zip(tx, ty))],
        "id long, tx long, ty long",
    )
    got = {
        r["id"]: r["hilbert_key"]
        for r in with_hilbert_key(df, "tx", "ty", order).collect()
    }
    assert [got[i] for i in range(500)] == want.tolist()


def test_sql_generator_matches_numpy():
    order = 12
    n = 1 << order
    rng = np.random.default_rng(5)
    tx = rng.integers(0, n, 400)
    ty = rng.integers(0, n, 400)
    want = hilbert_key(tx, ty, order)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE pts AS SELECT * FROM (VALUES "
        + ",".join(f"({i},{int(a)},{int(b)})"
                   for i, (a, b) in enumerate(zip(tx, ty)))
        + ") t(event_id, tx, ty)"
    )
    sql = hilbert_key_sql("tx", "ty", order, "pts")
    rows = con.execute(sql + " ORDER BY event_id").fetchall()
    assert [r[1] for r in rows] == want.tolist()


def test_ranges_predicate_filters_exactly(spark):
    order = 5
    n = 1 << order
    xs, ys = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    keys = hilbert_key(xs.ravel(), ys.ravel(), order)
    df = spark.createDataFrame(
        [(int(x), int(y), int(k)) for x, y, k in
         zip(xs.ravel(), ys.ravel(), keys)],
        "tx long, ty long, k long",
    )
    ranges = hilbert_ranges(4, 9, 17, 23, order, max_ranges=10 ** 9)
    got = df.filter(ranges_predicate(df["k"], ranges))
    rows = {(r["tx"], r["ty"]) for r in got.collect()}
    want = {(x, y) for x in range(4, 10) for y in range(17, 24)}
    assert rows == want


def test_column_program_no_overflow_above_order_16(spark):
    """order >= 17 puts s*s past 2^32: the per-level quadrant term must
    accumulate in long arithmetic (review regression — int literals
    overflowed under ANSI mode)."""
    order = 17
    n = 1 << order
    rng = np.random.default_rng(7)
    tx = rng.integers(0, n, 50)
    ty = rng.integers(0, n, 50)
    want = hilbert_key(tx, ty, order)
    df = spark.createDataFrame(
        [(int(i), int(a), int(b)) for i, (a, b) in
         enumerate(zip(tx, ty))],
        "id long, tx long, ty long",
    )
    got = {
        r["id"]: r["hilbert_key"]
        for r in with_hilbert_key(df, "tx", "ty", order).collect()
    }
    assert [got[i] for i in range(50)] == want.tolist()
