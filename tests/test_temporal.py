"""asof_join / interval_join vs pandas oracles (merge_asof, brute force).

pandas.merge_asof is the published reference semantics for the as-of
join (the reference engine's users reach for it after make_geocube
when aligning event attributes in time); the interval join's oracle is
a brute-force O(n*m) pandas filter. Both are run over seeded random
data, keyed and keyless, all directions, with and without tolerance.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geocube_spark.functions.temporal import asof_join, interval_join


def _mk(spark, seed=7, n_left=400, n_right=120, n_keys=5):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame(
        {
            "lid": np.arange(n_left),
            "k": rng.integers(0, n_keys, n_left),
            "t": rng.integers(0, 10_000, n_left).astype(np.int64),
            "lv": rng.normal(size=n_left).round(6),
        }
    )
    # unique (k, t) on the right so every oracle agrees on ties
    right = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, n_right),
            "t": rng.integers(0, 10_000, n_right).astype(np.int64),
            "rv": rng.normal(size=n_right).round(6),
        }
    ).drop_duplicates(["k", "t"])
    return (
        left,
        right,
        spark.createDataFrame(left),
        spark.createDataFrame(right),
    )


def _pd_asof(left, right, direction, by, tolerance=None):
    kw = {}
    if by:
        kw["by"] = by
    if tolerance is not None:
        kw["tolerance"] = tolerance
    exp = pd.merge_asof(
        left.sort_values(["t", "lid"]),
        right.sort_values("t"),
        on="t",
        direction=direction,
        suffixes=("", "_r"),
        **kw,
    )
    return exp.sort_values("lid").reset_index(drop=True)


def _got(df):
    return (
        df.toPandas().sort_values("lid").reset_index(drop=True)
    )


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_asof_keyed_matches_pandas(spark, direction):
    left, right, L, R = _mk(spark)
    got = _got(
        asof_join(L, R, on="t", by="k", direction=direction)
    )
    exp = _pd_asof(left, right, direction, by="k")
    assert len(got) == len(left)
    pd.testing.assert_series_equal(
        got["rv"], exp["rv"], check_names=False
    )
    # the matched right time is carried through as t_r
    if direction != "nearest":
        matched = got["t_r"].notna()
        if direction == "backward":
            assert (got.loc[matched, "t_r"] <= got.loc[matched, "t"]).all()
        else:
            assert (got.loc[matched, "t_r"] >= got.loc[matched, "t"]).all()


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("buckets", [1, 7, 64])
def test_asof_keyless_matches_pandas(spark, direction, buckets):
    left, right, L, R = _mk(spark, seed=11)
    # keyless: drop k from the match (keep it as a passthrough column)
    got = _got(
        asof_join(L, R.drop("k"), on="t", direction=direction,
                  buckets=buckets)
    )
    exp = _pd_asof(left, right.drop(columns="k").drop_duplicates("t"),
                   direction, by=None)
    pd.testing.assert_series_equal(
        got["rv"], exp["rv"], check_names=False
    )


def test_asof_keyless_sparse_buckets_carry(spark):
    """Right rows clustered at the start: most buckets have no right
    row, so matches must flow through the cross-bucket carry."""
    left = pd.DataFrame({"lid": range(100),
                         "t": np.arange(100, dtype=np.int64) * 1000})
    right = pd.DataFrame({"t": np.array([5, 17], dtype=np.int64),
                          "rv": [1.5, 2.5]})
    L, R = spark.createDataFrame(left), spark.createDataFrame(right)
    got = _got(asof_join(L, R, on="t", direction="backward", buckets=32))
    assert pd.isna(got.loc[0, "rv"])        # t=0 precedes both rights
    assert (got.loc[1:, "rv"] == 2.5).all()  # t=17 is the latest right


def test_asof_tolerance_and_inner(spark):
    left, right, L, R = _mk(spark, seed=23)
    tol = 150
    got = _got(
        asof_join(L, R, on="t", by="k", direction="backward",
                  tolerance=tol)
    )
    exp = _pd_asof(left, right, "backward", by="k", tolerance=tol)
    pd.testing.assert_series_equal(
        got["rv"], exp["rv"], check_names=False
    )
    inner = asof_join(L, R, on="t", by="k", direction="backward",
                      tolerance=tol, how="inner")
    assert inner.count() == int(exp["rv"].notna().sum())


def test_asof_inclusive_equal_time(spark):
    L = spark.createDataFrame(pd.DataFrame({"lid": [0], "t": [100]}))
    R = spark.createDataFrame(
        pd.DataFrame({"t": [100], "rv": [9.0]})
    )
    for d in ("backward", "forward"):
        got = asof_join(L, R, on="t", direction=d).collect()
        assert got[0]["rv"] == 9.0


def test_asof_timestamp_axis_tolerance_seconds(spark):
    left = pd.DataFrame(
        {"lid": [0, 1],
         "t": pd.to_datetime(["2024-01-01 00:10:00",
                              "2024-01-01 09:00:00"])}
    )
    right = pd.DataFrame(
        {"t": pd.to_datetime(["2024-01-01 00:00:00"]), "rv": [4.0]}
    )
    L, R = spark.createDataFrame(left), spark.createDataFrame(right)
    got = _got(asof_join(L, R, on="t", direction="backward",
                         tolerance=3600))
    assert got.loc[0, "rv"] == 4.0          # 10 min back: within 1 h
    assert pd.isna(got.loc[1, "rv"])        # 9 h back: outside


def test_asof_no_cartesian_or_global_sort_on_data(spark):
    _, _, L, R = _mk(spark)
    plan = asof_join(L, R, on="t", by="k")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # keyless: the windows on the DATA are partitioned by bucket; only
    # the O(buckets) carry table may sort globally
    plan2 = asof_join(L, R.drop("k"), on="t", buckets=16) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan2
    assert "partitionBy=[__b]" in plan2.replace(" ", "") or "__b" in plan2


def _mk_intervals(spark, seed=3, n_pts=500, n_ivl=40, n_keys=4):
    rng = np.random.default_rng(seed)
    pts = pd.DataFrame(
        {
            "pid": np.arange(n_pts),
            "k": rng.integers(0, n_keys, n_pts),
            "t": rng.integers(0, 10_000, n_pts).astype(np.int64),
        }
    )
    s = rng.integers(0, 9_000, n_ivl).astype(np.int64)
    ivl = pd.DataFrame(
        {
            "iid": np.arange(n_ivl),
            "k": rng.integers(0, n_keys, n_ivl),
            "start": s,
            "end": s + rng.integers(0, 2_000, n_ivl),
        }
    )
    return pts, ivl, spark.createDataFrame(pts), spark.createDataFrame(ivl)


def _brute_pairs(pts, ivl, by):
    m = pts.merge(ivl, on=by, how="inner") if by else pts.merge(
        ivl, how="cross"
    )
    m = m[(m["t"] >= m["start"]) & (m["t"] <= m["end"])]
    return set(zip(m["pid"], m["iid"]))


@pytest.mark.parametrize("chunk", [None, 100, 5000])
def test_interval_join_matches_brute_force(spark, chunk):
    pts, ivl, P, I = _mk_intervals(spark)
    got = interval_join(P, I, t="t", by="k", chunk=chunk).toPandas()
    assert set(zip(got["pid"], got["iid"])) == _brute_pairs(pts, ivl, "k")
    assert len(got) == len(set(zip(got["pid"], got["iid"])))  # no dups


def test_interval_join_keyless_and_boundaries(spark):
    pts = pd.DataFrame({"pid": [0, 1, 2, 3],
                        "t": np.array([10, 20, 30, 31], dtype=np.int64)})
    ivl = pd.DataFrame({"iid": [0],
                        "start": np.array([10], dtype=np.int64),
                        "end": np.array([30], dtype=np.int64)})
    P, I = spark.createDataFrame(pts), spark.createDataFrame(ivl)
    got = interval_join(P, I, t="t").toPandas()
    assert sorted(got["pid"]) == [0, 1, 2]  # both ends inclusive


def test_interval_join_left_keeps_unmatched(spark):
    pts, ivl, P, I = _mk_intervals(spark, seed=9)
    got = interval_join(P, I, t="t", by="k", how="left").toPandas()
    matched = _brute_pairs(pts, ivl, "k")
    n_matched_pts = len({p for p, _ in matched})
    assert len(got) == len(matched) + (len(pts) - n_matched_pts)
    unmatched = got[got["iid"].isna()]
    assert not (set(unmatched["pid"]) & {p for p, _ in matched})


def test_interval_join_no_cartesian(spark):
    _, _, P, I = _mk_intervals(spark)
    plan = interval_join(P, I, t="t", by="k")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_interval_join_timestamp_axis(spark):
    pts = pd.DataFrame(
        {"pid": [0, 1],
         "t": pd.to_datetime(["2024-01-01 00:30:00",
                              "2024-01-01 05:00:00"])}
    )
    ivl = pd.DataFrame(
        {"iid": [0],
         "start": pd.to_datetime(["2024-01-01 00:00:00"]),
         "end": pd.to_datetime(["2024-01-01 01:00:00"])}
    )
    P, I = spark.createDataFrame(pts), spark.createDataFrame(ivl)
    got = interval_join(P, I, t="t").toPandas()
    assert list(got["pid"]) == [0]


# ---------------------------------------------------------------- sessionize

from geocube_spark.functions.temporal import rolling_agg, sessionize  # noqa: E402


def _pd_sessions(df, by, gap):
    """Reference sessionization: per-key time-sorted lag + cumsum."""
    out = []
    groups = df.groupby(by) if by else [(None, df)]
    for _, g in groups:
        g = g.sort_values("t").copy()
        brk = (g["t"].diff() > gap).astype(int)
        g["sid"] = brk.cumsum() + 1
        out.append(g)
    return pd.concat(out)


@pytest.mark.parametrize("gap", [0, 50, 500])
def test_sessionize_keyed_matches_pandas(spark, gap):
    rng = np.random.default_rng(41)
    pdf = pd.DataFrame({
        "rid": np.arange(600),
        "k": rng.integers(0, 6, 600),
        "t": rng.integers(0, 20_000, 600).astype(np.int64),
    }).drop_duplicates(["k", "t"])  # unique times per key: defined order
    got = (
        sessionize(spark.createDataFrame(pdf), t="t", by="k", gap=gap)
        .toPandas().sort_values("rid").reset_index(drop=True)
    )
    exp = _pd_sessions(pdf, "k", gap).sort_values("rid") \
        .reset_index(drop=True)
    pd.testing.assert_series_equal(
        got["session_id"].astype(int), exp["sid"].astype(int),
        check_names=False,
    )


@pytest.mark.parametrize("buckets", [1, 5, 64])
def test_sessionize_keyless_matches_pandas(spark, buckets):
    rng = np.random.default_rng(43)
    t = np.unique(rng.integers(0, 50_000, 800).astype(np.int64))
    pdf = pd.DataFrame({"rid": np.arange(len(t)), "t": t})
    got = (
        sessionize(spark.createDataFrame(pdf), t="t", gap=40,
                   buckets=buckets)
        .toPandas().sort_values("rid").reset_index(drop=True)
    )
    exp = _pd_sessions(pdf, None, 40).sort_values("rid") \
        .reset_index(drop=True)
    pd.testing.assert_series_equal(
        got["session_id"].astype(int), exp["sid"].astype(int),
        check_names=False,
    )


def test_sessionize_boundary_break_across_buckets(spark):
    """Two dense runs separated by one huge hole that is also a bucket
    boundary: the break must be detected on the O(buckets) summary."""
    t = np.concatenate([np.arange(100), np.arange(100) + 100_000]) \
        .astype(np.int64)
    pdf = pd.DataFrame({"rid": np.arange(len(t)), "t": t})
    got = (
        sessionize(spark.createDataFrame(pdf), t="t", gap=10, buckets=16)
        .toPandas().sort_values("rid")
    )
    assert (got["session_id"].iloc[:100] == 1).all()
    assert (got["session_id"].iloc[100:] == 2).all()


def test_sessionize_timestamp_gap_seconds(spark):
    pdf = pd.DataFrame({
        "rid": [0, 1, 2],
        "t": pd.to_datetime(["2024-01-01 00:00:00",
                             "2024-01-01 00:20:00",
                             "2024-01-01 02:00:00"]),
    })
    got = (
        sessionize(spark.createDataFrame(pdf), t="t", gap=1800)
        .toPandas().sort_values("rid")
    )
    assert list(got["session_id"]) == [1, 1, 2]  # 100-min hole breaks


def test_sessionize_no_single_task_window_keyless(spark):
    pdf = pd.DataFrame({"rid": np.arange(50),
                        "t": np.arange(50, dtype=np.int64) * 10})
    plan = sessionize(spark.createDataFrame(pdf), t="t", gap=5,
                      buckets=8)._jdf.queryExecution() \
        .executedPlan().toString()
    # the window over the DATA is partitioned by the bucket column
    assert "__b" in plan


# ---------------------------------------------------------------- rolling_agg

def test_rolling_agg_matches_pandas(spark):
    rng = np.random.default_rng(47)
    pdf = pd.DataFrame({
        "rid": np.arange(500),
        "k": rng.integers(0, 5, 500),
        "t": rng.integers(0, 10_000, 500).astype(np.int64),
        "v": rng.normal(size=500).round(6),
    })
    got = (
        rolling_agg(spark.createDataFrame(pdf),
                    {"s": ("v", "sum"), "n": ("v", "count")},
                    t="t", by="k", window=250)
        .toPandas().set_index("rid").sort_index()
    )
    for _, g in pdf.groupby("k"):
        for _, row in g.iterrows():
            m = g[(g["t"] >= row["t"] - 250) & (g["t"] <= row["t"])]
            assert abs(got.loc[row["rid"], "s"] - m["v"].sum()) < 1e-9
            assert got.loc[row["rid"], "n"] == len(m)


def test_rolling_agg_timestamp_window_seconds(spark):
    pdf = pd.DataFrame({
        "rid": [0, 1, 2],
        "t": pd.to_datetime(["2024-01-01 00:00:00",
                             "2024-01-01 00:30:00",
                             "2024-01-01 02:00:00"]),
        "v": [1.0, 2.0, 4.0],
    })
    got = (
        rolling_agg(spark.createDataFrame(pdf), {"s": ("v", "sum")},
                    t="t", window=3600)
        .toPandas().sort_values("rid")
    )
    assert list(got["s"]) == [1.0, 3.0, 4.0]


def test_rolling_agg_sides(spark):
    pdf = pd.DataFrame({"rid": [0, 1, 2],
                        "t": np.array([0, 10, 20], dtype=np.int64),
                        "v": [1.0, 2.0, 4.0]})
    df = spark.createDataFrame(pdf)
    lead = rolling_agg(df, {"s": ("v", "sum")}, t="t", window=10,
                       side="leading").toPandas().sort_values("rid")
    assert list(lead["s"]) == [3.0, 6.0, 4.0]
    cent = rolling_agg(df, {"s": ("v", "sum")}, t="t", window=20,
                       side="centered").toPandas().sort_values("rid")
    assert list(cent["s"]) == [3.0, 7.0, 6.0]


# -------------------------------------------------------- session_stats

from geocube_spark.functions.temporal import session_stats  # noqa: E402


def _session_times(seed=53, n=400, n_keys=4):
    """Per-key event times whose consecutive gaps are never exactly the
    session gap (90s), so sessionize (dt <= gap merges) and the native
    session_window (dt < gap merges) agree exactly."""
    rng = np.random.default_rng(seed)
    rows = []
    for k in range(n_keys):
        t0 = 1_700_000_000
        for _ in range(n // n_keys):
            step = int(rng.choice(np.r_[5:85, 95:400]))
            t0 += step
            rows.append((k, t0))
    pdf = pd.DataFrame(rows, columns=["k", "tsec"])
    pdf["ts"] = pd.to_datetime(pdf["tsec"], unit="s")
    pdf["v"] = np.arange(len(pdf), dtype=np.float64)
    return pdf


def test_sessionize_agrees_with_native_session_window(spark):
    pdf = _session_times()
    df = spark.createDataFrame(pdf[["k", "ts", "v"]])
    labeled = sessionize(df, t="ts", by="k", gap=90).toPandas()
    native = session_stats(
        df, {"n": ("v", "count"), "s": ("v", "sum")}, t="ts", by="k",
        gap=90,
    ).toPandas()
    # identical session partitioning: same count per key...
    a = labeled.groupby("k")["session_id"].nunique().sort_index()
    b = native.groupby("k").size().sort_index()
    assert (a.values == b.values).all()
    # ...and identical membership: per-session (min, max, n) sets match
    mine = {
        (k, g["ts"].min(), g["ts"].max(), len(g))
        for (k, _), g in labeled.groupby(["k", "session_id"])
    }
    theirs = set()
    for _, r in native.iterrows():
        grp = labeled[(labeled["k"] == r["k"])
                      & (labeled["ts"] >= r["session_start"])
                      & (labeled["ts"] < r["session_end"])]
        theirs.add((r["k"], grp["ts"].min(), grp["ts"].max(), int(r["n"])))
    assert mine == theirs


def test_session_stats_streaming_equals_batch(spark, tmp_path):
    """session_stats under Structured Streaming (availableNow, two
    input files, watermark) == the same call in batch — the state
    store's incremental session merge reproduces the batch windows."""
    pdf = _session_times(seed=59, n=200, n_keys=3)
    src = str(tmp_path / "events_stream")
    half = len(pdf) // 2
    sdf1 = spark.createDataFrame(pdf.iloc[:half][["k", "ts", "v"]])
    sdf2 = spark.createDataFrame(pdf.iloc[half:][["k", "ts", "v"]])
    sdf1.coalesce(1).write.parquet(src)
    sdf2.coalesce(1).write.mode("append").parquet(src)

    batch = session_stats(
        spark.read.parquet(src), {"n": ("v", "count"), "s": ("v", "sum")},
        t="ts", by="k", gap=90,
    ).toPandas()

    stream_in = (
        spark.readStream.schema(sdf1.schema).parquet(src)
        .withWatermark("ts", "10 minutes")
    )
    out = session_stats(
        stream_in, {"n": ("v", "count"), "s": ("v", "sum")},
        t="ts", by="k", gap=90,
    )
    q = (
        out.writeStream.outputMode("complete")
        .format("memory").queryName("sess_stream")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM sess_stream").toPandas()

    key = ["k", "session_start", "session_end"]
    b = batch.sort_values(key).reset_index(drop=True)
    g = got.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        b[key + ["n"]], g[key + ["n"]], check_dtype=False
    )
    assert np.allclose(b["s"].values, g["s"].values)


# ------------------------------------------------- review regressions (r4)

def test_asof_nearest_keeps_null_and_duplicate_left_rows(spark):
    """'nearest' recombines its two passes on a stamped row id: left
    rows holding NULLs survive (null-unsafe equi-join would drop
    them) and duplicate left rows come back exactly once each."""
    left = spark.createDataFrame(
        pd.DataFrame({"lid": [1, 2, 3, 3],
                      "t": np.array([10, 20, 30, 30], dtype=np.int64),
                      "note": ["a", None, "c", "c"]})
    )
    right = spark.createDataFrame(
        pd.DataFrame({"t": np.array([9, 21], dtype=np.int64),
                      "rv": [1.0, 2.0]})
    )
    got = asof_join(left, right, on="t", direction="nearest",
                    how="left").toPandas()
    assert len(got) == 4                      # no drop, no fan-out
    by_lid = got.sort_values(["lid", "t"]).reset_index(drop=True)
    assert by_lid.loc[by_lid["lid"] == 2, "rv"].iloc[0] == 2.0
    assert (by_lid.loc[by_lid["lid"] == 3, "rv"] == 2.0).all()


def test_interval_left_null_attribute_not_duplicated(spark):
    """A matched point carrying a NULL attribute must appear exactly
    once (the anti-join finds unmatched rows by row id, not by the
    null-unsafe data columns)."""
    pts = spark.createDataFrame(
        pd.DataFrame({"pid": [1, 2],
                      "t": np.array([5, 100], dtype=np.int64),
                      "attr": [None, "x"]})
    )
    ivl = spark.createDataFrame(
        pd.DataFrame({"iid": [0],
                      "start": np.array([0], dtype=np.int64),
                      "end": np.array([10], dtype=np.int64)})
    )
    got = interval_join(pts, ivl, t="t", how="left").toPandas()
    assert len(got) == 2
    assert got.loc[got["pid"] == 1, "iid"].notna().all()
    assert got.loc[got["pid"] == 2, "iid"].isna().all()


def test_rolling_agg_fractional_window_double_axis(spark):
    pdf = pd.DataFrame({"rid": [0, 1, 2],
                        "t": [0.0, 1.0, 2.4],
                        "v": [1.0, 2.0, 4.0]})
    got = (
        rolling_agg(spark.createDataFrame(pdf), {"s": ("v", "sum")},
                    t="t", window=1.5)
        .toPandas().sort_values("rid")
    )
    assert list(got["s"]) == [1.0, 3.0, 6.0]  # 2.4-1.5 <= 1.0 included


def test_rolling_agg_float_window_integer_axis_floors(spark):
    pdf = pd.DataFrame({"rid": [0, 1],
                        "t": np.array([0, 2], dtype=np.int64),
                        "v": [1.0, 2.0]})
    got = (
        rolling_agg(spark.createDataFrame(pdf), {"s": ("v", "sum")},
                    t="t", window=2.5)
        .toPandas().sort_values("rid")
    )
    assert list(got["s"]) == [1.0, 3.0]


def test_asof_decimal_axis_not_truncated(spark):
    from decimal import Decimal

    left = spark.createDataFrame(
        [(1, Decimal("1.25")), (2, Decimal("1.75"))],
        "lid INT, t DECIMAL(10,2)",
    )
    right = spark.createDataFrame(
        [(Decimal("1.30"), 7.0)], "t DECIMAL(10,2), rv DOUBLE"
    )
    got = (
        asof_join(left, right, on="t", direction="backward")
        .toPandas().sort_values("lid")
    )
    assert pd.isna(got["rv"].iloc[0])   # 1.25 < 1.30: no backward match
    assert got["rv"].iloc[1] == 7.0     # 1.75 >= 1.30


# ------------------------------------------------------------ time_fill

from geocube_spark.functions.temporal import time_fill  # noqa: E402


def _fill_frame(seed=61, n=300, n_keys=4, null_frac=0.4):
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame({
        "rid": np.arange(n),
        "k": rng.integers(0, n_keys, n),
        "t": rng.integers(0, 100_000, n).astype(np.int64),
        "v": rng.normal(size=n).round(6),
    }).drop_duplicates(["k", "t"]).reset_index(drop=True)
    pdf.loc[rng.random(len(pdf)) < null_frac, "v"] = np.nan
    return pdf


@pytest.mark.parametrize("method", ["ffill", "bfill", "linear"])
def test_time_fill_matches_pandas(spark, method):
    pdf = _fill_frame()
    got = (
        time_fill(spark.createDataFrame(pdf), "v", t="t", by="k",
                  method=method)
        .toPandas().sort_values("rid").reset_index(drop=True)
    )
    parts = []
    for _, g in pdf.groupby("k"):
        g = g.sort_values("t").copy()
        if method == "linear":
            s = pd.Series(g["v"].values,
                          index=pd.to_datetime(g["t"], unit="s"))
            g["v"] = s.interpolate(method="time",
                                   limit_direction="both").values
        else:
            g["v"] = g["v"].ffill() if method == "ffill" \
                else g["v"].bfill()
        parts.append(g)
    exp = pd.concat(parts).sort_values("rid").reset_index(drop=True)
    pd.testing.assert_series_equal(
        got["v"], exp["v"], check_names=False, rtol=1e-9, atol=1e-12
    )


def test_time_fill_keyless_and_multicol(spark):
    pdf = pd.DataFrame({
        "rid": [0, 1, 2, 3],
        "t": np.array([0, 10, 20, 30], dtype=np.int64),
        "a": [1.0, np.nan, np.nan, 4.0],
        "b": [np.nan, 2.0, np.nan, np.nan],
    })
    got = (
        time_fill(spark.createDataFrame(pdf), ["a", "b"], t="t",
                  method="linear")
        .toPandas().sort_values("rid")
    )
    assert np.allclose(got["a"], [1.0, 2.0, 3.0, 4.0])
    assert np.allclose(got["b"], [2.0, 2.0, 2.0, 2.0])  # edges one-sided


def test_time_fill_all_null_column_stays_null(spark):
    pdf = pd.DataFrame({"rid": [0, 1],
                        "t": np.array([0, 1], dtype=np.int64),
                        "v": [np.nan, np.nan]})
    got = time_fill(spark.createDataFrame(pdf), "v", t="t",
                    method="linear").toPandas()
    assert got["v"].isna().all()


# ------------------------------------------- determinism regressions (r4b)

def test_asof_nearest_single_plan_no_id_join(spark):
    """'nearest' computes both brackets as columns of ONE union plan:
    no monotonically_increasing_id, no rejoin of two re-evaluated
    subtrees (whose ids are not stable across evaluations when the
    left has an upstream shuffle)."""
    left, right, L, R = _mk(spark, seed=77)
    # force an upstream shuffle on the left plan
    Ls = L.repartition(7, "k").groupBy("lid", "k", "t").agg(
        F.max("lv").alias("lv")
    )
    res = asof_join(Ls, R, on="t", by="k", direction="nearest")
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "monotonically_increasing_id" not in plan
    got = _got(res)
    exp = _pd_asof(left, right, "nearest", by="k")
    pd.testing.assert_series_equal(
        got["rv"], exp["rv"], check_names=False
    )


def test_interval_left_no_id_stamp_and_shuffled_input(spark):
    pts, ivl, P, I = _mk_intervals(spark, seed=21)
    Ps = P.repartition(5, "k").groupBy("pid", "k", "t").agg(
        F.count(F.lit(1)).alias("n")
    ).drop("n")
    res = interval_join(Ps, I, t="t", by="k", how="left")
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "monotonically_increasing_id" not in plan
    got = res.toPandas()
    matched = _brute_pairs(pts, ivl, "k")
    n_matched_pts = len({p for p, _ in matched})
    assert len(got) == len(matched) + (len(pts) - n_matched_pts)


@pytest.mark.parametrize("buckets", [1, 5, 64])
def test_time_fill_keyless_bucketed_matches_pandas(spark, buckets):
    rng = np.random.default_rng(67)
    t = np.unique(rng.integers(0, 50_000, 500).astype(np.int64))
    pdf = pd.DataFrame({"rid": np.arange(len(t)), "t": t,
                        "v": rng.normal(size=len(t)).round(6)})
    pdf.loc[rng.random(len(pdf)) < 0.5, "v"] = np.nan
    got = (
        time_fill(spark.createDataFrame(pdf), "v", t="t",
                  method="linear", buckets=buckets)
        .toPandas().sort_values("rid").reset_index(drop=True)
    )
    s = pd.Series(pdf["v"].values, index=pd.to_datetime(pdf["t"], unit="s"))
    exp = s.interpolate(method="time", limit_direction="both").values
    np.testing.assert_allclose(got["v"].values, exp,
                               rtol=1e-9, atol=1e-12)
    if buckets > 1:
        plan = time_fill(spark.createDataFrame(pdf), "v", t="t",
                         method="linear", buckets=buckets) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "__b" in plan  # data windows partitioned by bucket


def test_rolling_agg_subunit_window_integer_axis(spark):
    """window=0.5 on an integer axis = same-timestamp peers only."""
    pdf = pd.DataFrame({"rid": [0, 1, 2],
                        "t": np.array([10, 10, 11], dtype=np.int64),
                        "v": [1.0, 2.0, 4.0]})
    got = (
        rolling_agg(spark.createDataFrame(pdf), {"s": ("v", "sum")},
                    t="t", window=0.5)
        .toPandas().sort_values(["rid"])
    )
    assert list(got["s"]) == [3.0, 3.0, 4.0]


def test_asof_decimal_scale0_exact_above_2pow53(spark):
    from decimal import Decimal

    base = (1 << 53) + 100  # adjacent longs collapse as doubles
    left = spark.createDataFrame(
        [(1, Decimal(base + 1))], "lid INT, t DECIMAL(20,0)"
    )
    right = spark.createDataFrame(
        [(Decimal(base), 1.0), (Decimal(base + 1), 2.0)],
        "t DECIMAL(20,0), rv DOUBLE",
    )
    got = asof_join(left, right, on="t",
                    direction="backward").collect()
    assert got[0]["rv"] == 2.0  # exact long arithmetic finds base+1


# ---------------------------------------------------------------------------
# resample_bars (OHLC time-bucket downsampling)
# ---------------------------------------------------------------------------

from geocube_spark.functions.temporal import resample_bars  # noqa: E402


def test_resample_bars_matches_pandas_ohlc(spark):
    """Distinct timestamps (no ties): pandas resample().ohlc() is the
    referee; buckets are epoch-anchored like TimescaleDB
    time_bucket."""
    rng = np.random.default_rng(9)
    ts = pd.to_datetime("2024-03-01") + pd.to_timedelta(
        sorted(rng.choice(10 * 86400, 300, replace=False).tolist()),
        unit="s",
    )
    vals = rng.uniform(-10, 100, 300).round(3)
    pdf = pd.DataFrame({"ts": ts, "value": vals})
    df = spark.createDataFrame(pdf).repartition(5)
    got = (
        resample_bars(df, "ts", "value", every=3600.0)
        .toPandas().sort_values("bucket").reset_index(drop=True)
    )
    want = (
        pdf.set_index("ts")["value"]
        .resample("1h").ohlc().dropna()
    )
    # epoch-anchored hourly buckets == calendar hours
    assert list(got["bucket"]) == list(want.index)
    for c in ("open", "high", "low", "close"):
        np.testing.assert_allclose(got[c].values, want[c].values,
                                   rtol=0, atol=0)
    n = pdf.set_index("ts")["value"].resample("1h").count()
    np.testing.assert_array_equal(got["n"].values,
                                  n[n > 0].values)


def test_resample_bars_tie_rule_and_keys(spark):
    # two rows share the boundary timestamp: open takes the smaller
    # value among earliest rows, close the larger among latest
    rows = [
        ("a", "2024-01-01 00:00:00", 5.0),
        ("a", "2024-01-01 00:00:00", 3.0),
        ("a", "2024-01-01 00:59:59", 7.0),
        ("a", "2024-01-01 00:59:59", 2.0),
        ("b", "2024-01-01 00:30:00", 1.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts string, value double") \
        .select("k", F.col("ts").cast("timestamp").alias("ts"), "value")
    got = {r["k"]: r for r in
           resample_bars(df, "ts", "value", every=3600.0,
                         by=["k"]).collect()}
    assert got["a"]["open"] == 3.0 and got["a"]["close"] == 7.0
    assert got["a"]["high"] == 7.0 and got["a"]["low"] == 2.0
    assert got["a"]["n"] == 4 and abs(got["a"]["vsum"] - 17.0) < 1e-12
    assert got["b"]["open"] == got["b"]["close"] == 1.0


def test_resample_bars_numeric_axis_and_validation(spark):
    df = spark.createDataFrame(
        [(0.5, 10.0), (1.4, 20.0), (2.5, 5.0)], "t double, value double"
    )
    got = {r["bucket"]: r for r in
           resample_bars(df, "t", "value", every=1.0).collect()}
    assert got[0.0]["open"] == 10.0 and got[1.0]["open"] == 20.0
    assert got[2.0]["low"] == 5.0
    with pytest.raises(ValueError, match="every"):
        resample_bars(df, "t", "value", every=0)


def test_resample_bars_map_side_combine_plan(spark):
    """ONE exchange; min_by/max_by/sum combine partially before it —
    the shuffle carries one partial row per (key, bucket) per task."""
    rows = [("a", "2024-01-01 00:10:00", 1.0)] * 4
    df = spark.createDataFrame(rows, "k string, ts string, value double") \
        .select("k", F.col("ts").cast("timestamp").alias("ts"), "value")
    out = resample_bars(df, "ts", "value", every=3600.0, by=["k"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "partial_min_by" in plan or "partial_minby" in plan.lower()
    assert plan.count("Exchange") == 1
    assert "InPandas" not in plan and "BatchEvalPython" not in plan
