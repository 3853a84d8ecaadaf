"""Hilbert space-filling-curve keys for tile clustering + data skipping.

Why this exists (scale story): the snapshot table's windowed reader
(`plans.checkpoint.read_cube_window`) prunes parquet row groups with a
``tile_id BETWEEN`` envelope over ROW-MAJOR tile ids.  Row-major order
has terrible 2-D locality — a city-sized window over a continent-sized
cube intersects one short run of tile ids **per tile row**, so the
single BETWEEN envelope spans almost the whole table and row-group
min/max statistics prune nothing in the y dimension.  Sorting data
files by a Hilbert key (the standard space-filling curve used by
Iceberg/Delta z-ordering, but with strictly better worst-case locality
than Morton/Z) makes any 2-D window decompose into a handful of
CONTIGUOUS key ranges, so an OR-of-BETWEENs predicate lets the parquet
reader skip every row group outside the window.  At 100 TB this is the
difference between "touch every file" and "touch the ~0.1% of row
groups whose key range overlaps the window".

Three cross-checked forms, same as ``grid/s2.py`` / ``grid/hex.py``:

* vectorized numpy (:func:`hilbert_key`, :func:`hilbert_xy`),
* a staged Catalyst Column program (:func:`with_hilbert_key`) — one
  cheap projection per bit level, so the analyzed plan grows linearly
  (the per-step rewrite references x and y several times; unrolling
  all levels into ONE expression tree would grow ~4x per level, the
  same blow-up documented for ``hex_parent_col``),
* a DuckDB SQL generator (:func:`hilbert_key_sql`) for the driver's
  oracle — the identical arithmetic as a CTE chain.

Plus the pruning planner :func:`hilbert_ranges`: decompose an aligned
query rectangle into O(perimeter) contiguous key ranges (quadtree
recursion over curve-aligned blocks — every aligned ``2^m x 2^m``
block at quadtree position is one contiguous, ``4^m``-aligned key
run, which is the defining recursive property of the curve), then
coalesce to a caller-bounded range count by merging the smallest gaps
(a superset predicate stays correct for pruning; the exact rectangle
test downstream drops false positives).

The xy<->d bit transforms follow the public-domain formulation on the
Wikipedia "Hilbert curve" page (the classic Butz/Lam-Shapiro bit
algorithm); no library is involved.

Reference parity note: corteva/geocube has no multi-file table layout
at all (single in-memory xarray Dataset); this module exists for the
north rule's 10^12-document Iceberg-table scale, where clustered
writes + statistics pruning decide whether windowed reads are
feasible.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAX_ORDER = 31  # keys fit int64: 2 bits per level, 62 bits total


def _check_order(order: int) -> None:
    if not 1 <= order <= MAX_ORDER:
        raise ValueError(
            f"hilbert order must be in [1, {MAX_ORDER}], got {order}"
        )


# ---------------------------------------------------------------------------
# numpy forms
# ---------------------------------------------------------------------------


def hilbert_key(tx, ty, order: int) -> np.ndarray:
    """Hilbert distance of integer cells ``(tx, ty)`` on the
    ``2^order x 2^order`` grid (vectorized).  Out-of-range coordinates
    raise — a silent mask would alias distant tiles onto the window
    being pruned."""
    _check_order(order)
    n = np.int64(1) << order
    x = np.asarray(tx, dtype=np.int64).copy()
    y = np.asarray(ty, dtype=np.int64).copy()
    if x.size and (x.min() < 0 or x.max() >= n or
                   y.min() < 0 or y.max() >= n):
        raise ValueError(
            f"tile coordinates outside [0, {int(n)}) for order {order}"
        )
    d = np.zeros_like(x)
    s = n >> 1
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * (3 * rx + ry - 2 * rx * ry)  # == (3*rx) XOR ry
        # rotate: where ry == 0, optionally flip about n-1, then swap
        flip = (ry == 0) & (rx == 1)
        x = np.where(flip, n - 1 - x, x)
        y = np.where(flip, n - 1 - y, y)
        swap = ry == 0
        x2 = np.where(swap, y, x)
        y2 = np.where(swap, x, y)
        x, y = x2, y2
        s >>= 1
    return d


def hilbert_xy(d, order: int):
    """Inverse: Hilbert distance -> ``(tx, ty)`` (vectorized)."""
    _check_order(order)
    n = np.int64(1) << order
    t = np.asarray(d, dtype=np.int64).copy()
    if t.size and (t.min() < 0 or t.max() >= n * n):
        raise ValueError(
            f"hilbert keys outside [0, 4^{order}) for order {order}"
        )
    x = np.zeros_like(t)
    y = np.zeros_like(t)
    s = np.int64(1)
    while s < n:
        rx = 1 & (t >> 1)
        ry = 1 & (t ^ rx)
        flip = (ry == 0) & (rx == 1)
        x = np.where(flip, s - 1 - x, x)
        y = np.where(flip, s - 1 - y, y)
        swap = ry == 0
        x2 = np.where(swap, y, x)
        y2 = np.where(swap, x, y)
        x, y = x2, y2
        x += s * rx
        y += s * ry
        t >>= 2
        s <<= 1
    return x, y


# ---------------------------------------------------------------------------
# range decomposition (the pruning planner)
# ---------------------------------------------------------------------------


def hilbert_ranges(
    tx0: int, tx1: int, ty0: int, ty1: int, order: int,
    max_ranges: int = 32,
) -> list[tuple[int, int]]:
    """Decompose the inclusive tile rectangle into sorted, disjoint,
    inclusive Hilbert-key ranges covering EXACTLY the rectangle's
    cells, then coalesce to at most ``max_ranges`` by merging the
    ranges separated by the smallest key gaps (the merged result is a
    superset — safe for pruning, never for membership).

    Driver-side and metadata-only: the recursion visits
    O(perimeter * order) quadtree nodes, independent of table size.
    """
    _check_order(order)
    n = 1 << order
    if not (0 <= tx0 <= tx1 < n and 0 <= ty0 <= ty1 < n):
        raise ValueError(
            f"rectangle ({tx0},{ty0})..({tx1},{ty1}) outside "
            f"[0, {n})^2 for order {order}"
        )
    out: list[tuple[int, int]] = []

    def rec(qx: int, qy: int, m: int) -> None:
        side = 1 << m
        bx0, by0 = qx * side, qy * side
        bx1, by1 = bx0 + side - 1, by0 + side - 1
        if bx1 < tx0 or bx0 > tx1 or by1 < ty0 or by0 > ty1:
            return
        if tx0 <= bx0 and bx1 <= tx1 and ty0 <= by0 and by1 <= ty1:
            # aligned block == one contiguous, 4^m-aligned key run
            d = int(hilbert_key(np.int64(bx0), np.int64(by0), order))
            lo = (d >> (2 * m)) << (2 * m)
            out.append((lo, lo + side * side - 1))
            return
        for dy in (0, 1):
            for dx in (0, 1):
                rec(qx * 2 + dx, qy * 2 + dy, m - 1)

    rec(0, 0, order)
    out.sort()
    merged: list[list[int]] = []
    for lo, hi in out:
        if merged and lo == merged[-1][1] + 1:
            merged[-1][1] = hi
        else:
            merged.append([lo, hi])
    if len(merged) > max_ranges:
        # merge across the smallest gaps until the budget holds
        gaps = sorted(
            range(1, len(merged)),
            key=lambda i: merged[i][0] - merged[i - 1][1],
        )
        drop = set(gaps[: len(merged) - max_ranges])
        coalesced: list[list[int]] = []
        for i, r in enumerate(merged):
            if i in drop:
                coalesced[-1][1] = r[1]
            else:
                coalesced.append(r)
        merged = coalesced
    return [(lo, hi) for lo, hi in merged]


def ranges_predicate(col: Column, ranges: list[tuple[int, int]]) -> Column:
    """OR-of-BETWEENs Column over ``ranges`` — each disjunct reaches
    the parquet reader as a min/max-prunable predicate."""
    if not ranges:
        return F.lit(False)
    cond = col.between(ranges[0][0], ranges[0][1])
    for lo, hi in ranges[1:]:
        cond = cond | col.between(lo, hi)
    return cond


# ---------------------------------------------------------------------------
# staged Catalyst Column program
# ---------------------------------------------------------------------------


def with_hilbert_key(
    df: DataFrame, tx_col: str, ty_col: str, order: int,
    out_col: str = "hilbert_key",
) -> DataFrame:
    """Add ``out_col`` = Hilbert key of integer columns ``(tx_col,
    ty_col)``; one named projection per bit level so the analyzed plan
    grows linearly in ``order`` (each level rewrites x and y in terms
    of the previous level's x and y several times — unrolled into one
    Column tree that multiplies ~4x per level, the same blow-up
    ``hex_parent_col`` documents).  All arithmetic stays JVM-side."""
    _check_order(order)
    n = 1 << order
    xc, yc, dc = f"__hx_{out_col}", f"__hy_{out_col}", f"__hd_{out_col}"
    cur = df.withColumn(xc, F.col(tx_col).cast("long")) \
            .withColumn(yc, F.col(ty_col).cast("long")) \
            .withColumn(dc, F.lit(0).cast("long"))
    s = n >> 1
    while s > 0:
        x, y = F.col(xc), F.col(yc)
        rx = F.when(x.bitwiseAND(F.lit(s)) > 0, 1).otherwise(0)
        ry = F.when(y.bitwiseAND(F.lit(s)) > 0, 1).otherwise(0)
        # name rx/ry once per level; the rotation below reads each
        # several times
        rxc, ryc = f"__hrx_{out_col}", f"__hry_{out_col}"
        cur = cur.withColumn(rxc, rx.cast("long")) \
                 .withColumn(ryc, ry.cast("long"))
        rx, ry = F.col(rxc), F.col(ryc)
        quad = rx * 3 + ry - rx * ry * 2
        flip = (ry == 0) & (rx == 1)
        swap = ry == 0
        nx = F.when(swap, F.when(flip, F.lit(n - 1) - y).otherwise(y)) \
              .otherwise(x)
        ny = F.when(swap, F.when(flip, F.lit(n - 1) - x).otherwise(x)) \
              .otherwise(y)
        cur = (
            cur.withColumn(
                dc,
                F.col(dc)
                + F.lit(s).cast("long") * F.lit(s).cast("long") * quad,
            )
            .withColumn(f"{xc}_n", nx)
            .withColumn(f"{yc}_n", ny)
            .drop(xc, yc, rxc, ryc)
            .withColumnRenamed(f"{xc}_n", xc)
            .withColumnRenamed(f"{yc}_n", yc)
        )
        s >>= 1
    return cur.withColumn(out_col, F.col(dc)).drop(xc, yc, dc)


# ---------------------------------------------------------------------------
# DuckDB SQL generator (the driver's oracle; same arithmetic as text)
# ---------------------------------------------------------------------------


def hilbert_key_sql(
    tx_sql: str, ty_sql: str, order: int, table: str,
    keep: str = "event_id", out_col: str = "hilbert_key",
) -> str:
    """DuckDB oracle: ``SELECT {keep}, {out_col}`` computing the same
    per-level transform as :func:`hilbert_key`, one CTE per bit level
    (the staged shape keeps the planner's expression trees linear,
    exactly like the Column program)."""
    _check_order(order)
    n = 1 << order
    ctes = [
        f"""h_in AS (
  SELECT {keep}, CAST({tx_sql} AS BIGINT) AS x,
         CAST({ty_sql} AS BIGINT) AS y, CAST(0 AS BIGINT) AS d
  FROM {table}
)"""
    ]
    prev = "h_in"
    s = n >> 1
    lvl = 0
    while s > 0:
        rx = f"CASE WHEN (x & {s}) > 0 THEN 1 ELSE 0 END"
        ry = f"CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END"
        b = f"h_b{lvl}"
        ctes.append(
            f"""{b} AS (
  SELECT {keep}, x, y, d, {rx} AS rx, {ry} AS ry
  FROM {prev}
)"""
        )
        step = f"h_s{lvl}"
        ctes.append(
            f"""{step} AS (
  SELECT {keep},
         CASE WHEN ry = 0 THEN
             CASE WHEN rx = 1 THEN {n - 1} - y ELSE y END
           ELSE x END AS x,
         CASE WHEN ry = 0 THEN
             CASE WHEN rx = 1 THEN {n - 1} - x ELSE x END
           ELSE y END AS y,
         d + {s}::BIGINT * {s} * (rx * 3 + ry - rx * ry * 2) AS d
  FROM {b}
)"""
        )
        prev = step
        s >>= 1
        lvl += 1
    body = ",\n".join(ctes)
    return (
        f"WITH {body}\n"
        f"SELECT {keep}, d AS {out_col} FROM {prev}"
    )
