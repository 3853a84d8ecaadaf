"""Temporal joins Spark lacks as built-ins: as-of join and interval join.

Event streams joined to slowly-changing state ("price as of this
click") and to time ranges ("events inside this session window") are
the two joins every time-series pipeline needs and vanilla Spark SQL
cannot express without a cartesian or a single-task sort. Both are
implemented here as pure Catalyst column programs — no Python UDFs,
no ``crossJoin`` — with explicitly bounded shuffles:

* ``asof_join``     — pandas ``merge_asof`` / DuckDB ``ASOF JOIN``
  semantics. Keyed path: ONE equi-shuffle on the ``by`` keys, a
  union-tag-sort-fill window per key (the classic distributed as-of).
  Keyless path: the time axis is range-bucketed and a per-bucket
  "carry" aggregate (tiny, O(buckets) rows) forward-propagates the
  last match across bucket boundaries — a parallel prefix scan, so no
  single-task window ever sees the full data.
* ``interval_join`` — join points ``t`` to intervals ``[start, end]``
  by chunking the time axis: intervals explode to the chunks they
  overlap (chunk width >= the longest interval, so <= 2 copies each,
  measured and reported), points land in exactly one chunk, and the
  match is ONE equi-join on (keys..., chunk) + an exact range filter.
  Each qualifying pair is produced exactly once (a point lives in one
  chunk), so no dedup pass is needed.
* ``sessionize``    — gap-based session assignment (a new session
  starts when the time since the previous same-key event exceeds
  ``gap``). Keyed: one equi-shuffle + lag/cumsum window. Keyless: the
  same two-level bucketed prefix scan as the keyless as-of — break
  flags are local to a time bucket, the cross-bucket break and the
  running session offset come from an O(buckets) aggregate broadcast
  back, so no single-task window.
* ``rolling_agg``   — time-range rolling aggregates (``RANGE BETWEEN
  w PRECEDING AND CURRENT ROW``) via Spark's native range frame; one
  shuffle on the keys, the frame scan is streaming within each
  partition.
* ``session_stats`` — per-session aggregates through Spark's NATIVE
  ``session_window`` (runs unchanged under Structured Streaming).
* ``time_fill``     — ffill / bfill / time-weighted linear gap fill
  (pandas ``interpolate(method='time')``); brackets from the shared
  :func:`_bracket_fills` (keyed RANGE frames, keyless bucketed
  prefix scan).

Scale notes (100 TB): the keyed as-of shuffles each side once by the
join keys — the same cost as any equi-join, skew handled by AQE. The
keyless as-of's only global step is an O(buckets) aggregate the driver
never collects (broadcast-joined back). The interval join's blow-up
factor is ``ceil(len/chunk)+1 <= 2`` copies per interval by
construction; callers with one pathological mega-interval can pass an
explicit ``chunk`` and accept more copies of that row instead of a
wider join.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_MICROS = 1_000_000


def _as_micros(col, dtype_name: str):
    """Numeric time axis: epoch micros for timestamp/date columns,
    the raw value (cast long if integral, kept double if fractional)
    otherwise. Ordering-preserving and exact for integer arithmetic."""
    if dtype_name.startswith("timestamp"):
        return F.unix_micros(col.cast("timestamp"))
    if dtype_name == "date":
        return F.unix_micros(col.cast("timestamp"))
    if dtype_name in ("double", "float"):
        return col.cast("double")
    if dtype_name.startswith("decimal"):
        # scale-0 decimals are integral: keep them exact as longs
        # (doubles collapse distinct values past 2^53); fractional
        # scales need the double
        scale = int(dtype_name.rstrip(")").rsplit(",", 1)[-1])
        return col.cast("long" if scale == 0 else "double")
    return col.cast("long")


def _tol_micros(tolerance, dtype_name: str):
    """Tolerance in the same unit as the internal axis: seconds ->
    micros for timestamps, verbatim for numeric axes."""
    if tolerance is None:
        return None
    if dtype_name.startswith("timestamp") or dtype_name == "date":
        return int(round(float(tolerance) * _MICROS))
    return tolerance


def _dtype_of(df: DataFrame, name: str) -> str:
    for f in df.schema.fields:
        if f.name == name:
            return f.dataType.simpleString()
    raise ValueError(f"column {name!r} not found in {df.columns}")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str = "ts",
    right_on: Optional[str] = None,
    by: Union[str, Sequence[str], None] = None,
    direction: str = "backward",
    tolerance=None,
    suffix: str = "_r",
    how: str = "left",
    buckets: int = 64,
) -> DataFrame:
    """As-of join: attach to each left row the single right row that is
    nearest in time on the ``direction`` side, matching ``by`` keys
    exactly — pandas ``merge_asof`` / DuckDB ``ASOF JOIN`` semantics
    (``backward``: largest right time <= left time, inclusive;
    ``forward``: smallest right time >= left time, inclusive;
    ``nearest``: whichever of the two is closer, backward on ties).

    ``tolerance`` (seconds for timestamp axes, axis units for numeric
    ones) drops matches farther than that. ``how='left'`` keeps
    unmatched left rows with NULL right columns; ``how='inner'`` drops
    them. Right columns keep their names, ``suffix``-renamed on
    collision with a left name. If several right rows share the exact
    same (keys, time), the one with the greatest column-struct value
    wins — arbitrary but deterministic under any partitioning/retry.

    Physical plan, keyed: tag + union both sides, ONE hash exchange on
    ``by``, per-key sort, ``last(..., ignorenulls)`` running fill —
    Spark's exchange/sort machinery does all the work, nothing
    single-task. Keyless: the same fill partitioned by a range bucket
    of the time axis (``buckets`` of them), then a per-bucket carry
    aggregate (O(buckets) rows, broadcast back) propagates matches
    across bucket boundaries — a two-level parallel prefix scan.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unsupported direction {direction!r}")
    if how not in ("left", "inner"):
        raise ValueError(f"unsupported how {how!r}")
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    right_on = right_on or on
    keys = [by] if isinstance(by, str) else list(by or [])
    for k in keys:
        if k not in left.columns or k not in right.columns:
            raise ValueError(f"by-key {k!r} must exist on both sides")

    dtype = _dtype_of(left, on)
    tol = _tol_micros(tolerance, dtype)

    # Right payload: every right column except the by-keys (their
    # values equal the left's). The time column rides inside so the
    # tolerance filter and the caller both see it.
    payload_cols = [c for c in right.columns if c not in keys]
    lcols = list(left.columns)
    out_names = {
        c: (c + suffix if c in lcols else c) for c in payload_cols
    }

    l_pre = left.select(
        *[F.col(c) for c in lcols],
        _as_micros(F.col(on), dtype).alias("__t"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(
            right.select(
                F.struct(*[F.col(c) for c in payload_cols]).alias("__p")
            ).schema["__p"].dataType.simpleString()
        ).alias("__rrow"),
    )
    r_pre = right.select(
        *[F.col(k) for k in keys],
        *[F.lit(None).cast(f.dataType).alias(f.name)
          for f in left.schema.fields if f.name not in keys],
        _as_micros(F.col(right_on), _dtype_of(right, right_on))
        .alias("__t"),
        F.lit(0).alias("__tag"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("__rrow"),
    ).select(*lcols, "__t", "__tag", "__rrow")

    u = l_pre.unionByName(r_pre)

    if direction == "nearest":
        # BOTH brackets as columns of the ONE union plan — never two
        # re-evaluated subtrees recombined by a join (a
        # monotonically_increasing_id rejoin is not stable across
        # re-evaluations when the left plan has an upstream shuffle).
        obs = F.when(
            F.col("__tag") == 0, F.struct(F.col("__t"), F.col("__rrow"))
        )
        u2 = _bracket_fills(u, obs, keys, buckets)
        res = u2.filter(F.col("__tag") == 1)
        t = F.col("__t")
        bt, brow = F.col("__mb")["__t"], F.col("__mb")["__rrow"]
        ft, frow = F.col("__mf")["__t"], F.col("__mf")["__rrow"]
        b_ok = F.col("__mb").isNotNull()
        f_ok = F.col("__mf").isNotNull()
        if tol is not None:
            b_ok = b_ok & (t - bt <= F.lit(tol))
            f_ok = f_ok & (ft - t <= F.lit(tol))
        use_b = (
            F.when(~b_ok, F.lit(False))
            .when(~f_ok, F.lit(True))
            .otherwise((t - bt) <= (ft - t))  # backward wins ties
        )
        match = (
            F.when(use_b & b_ok, brow).when(~use_b & f_ok, frow)
        )
        res = res.withColumn("__match", match)
        if how == "inner":
            res = res.filter(F.col("__match").isNotNull())
        return res.select(
            *[F.col(c) for c in lcols],
            *[F.col("__match").getField(c).alias(out_names[c])
              for c in payload_cols],
        )

    # Sort so the qualifying right row is the last non-null __rrow
    # strictly before-or-at each left row. Inclusive matching needs
    # right rows (tag 0) ahead of left rows at equal time; __rrow last
    # makes equal-time right duplicates deterministic (greatest wins).
    if direction == "backward":
        order = [F.col("__t").asc(), F.col("__tag").asc(),
                 F.col("__rrow").asc_nulls_first()]
    else:  # forward: reverse time, same tag/tie logic
        order = [F.col("__t").desc(), F.col("__tag").asc(),
                 F.col("__rrow").asc_nulls_first()]

    if keys:
        w = (Window.partitionBy(*keys).orderBy(*order)
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        filled = u.withColumn(
            "__match", F.last("__rrow", ignorenulls=True).over(w)
        )
    else:
        filled = _keyless_fill(u, order, direction, buckets)

    res = filled.filter(F.col("__tag") == 1)

    mt = _as_micros(
        F.col("__match").getField(right_on), _dtype_of(right, right_on)
    )
    if tol is not None:
        within = (
            (F.col("__t") - mt <= F.lit(tol)) if direction == "backward"
            else (mt - F.col("__t") <= F.lit(tol))
        )
        res = res.withColumn(
            "__match",
            F.when(within, F.col("__match")).otherwise(F.lit(None)),
        )
    if how == "inner":
        res = res.filter(F.col("__match").isNotNull())

    return res.select(
        *[F.col(c) for c in lcols],
        *[F.col("__match").getField(c).alias(out_names[c])
          for c in payload_cols],
    )


def _keyless_fill(u: DataFrame, order, direction: str,
                  buckets: int) -> DataFrame:
    """Range-bucketed running fill + cross-bucket carry: the keyless
    as-of without a single-task window. The only global objects are
    the 2-row min/max aggregate and the O(buckets)-row carry table
    (both broadcast), never the data."""
    lo, hi = u.select(F.min("__t"), F.max("__t")).first()
    if lo is None or hi is None or buckets == 1 or hi <= lo:
        w = (Window.orderBy(*order)
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        return u.withColumn(
            "__match", F.last("__rrow", ignorenulls=True).over(w)
        )
    width = (int(hi) - int(lo) + buckets) // buckets \
        if isinstance(lo, int) else (hi - lo) / buckets
    b = F.least(
        F.greatest(
            ((F.col("__t") - F.lit(lo)) / F.lit(width)).cast("long"),
            F.lit(0),
        ),
        F.lit(buckets - 1),
    )
    u = u.withColumn("__b", b)
    w = (Window.partitionBy("__b").orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = u.withColumn(
        "__match", F.last("__rrow", ignorenulls=True).over(w)
    )

    # Carry: the winning right row of each whole bucket, propagated to
    # every later (backward) / earlier (forward) bucket. max/min over
    # (t, tiebreak-struct) picks exactly the row the in-bucket fill
    # would have picked. O(buckets) rows end-to-end.
    pick = F.struct(F.col("__t"), F.col("__rrow"))
    per_bucket = (
        u.filter(F.col("__tag") == 0)
        .groupBy("__b")
        .agg((F.max(pick) if direction == "backward" else F.min(pick))
             .alias("__best"))
    )
    cw = (
        Window.orderBy(
            F.col("__b").asc() if direction == "backward"
            else F.col("__b").desc()
        ).rowsBetween(Window.unboundedPreceding, -1)
    )
    all_buckets = u.select("__b").distinct()
    carry = (
        all_buckets.join(per_bucket, "__b", "left")
        .withColumn("__carry",
                    F.last("__best", ignorenulls=True).over(cw))
        .select("__b", F.col("__carry").getField("__rrow")
                .alias("__carry_row"))
    )
    return (
        filled.join(F.broadcast(carry), "__b", "left")
        .withColumn("__match",
                    F.coalesce(F.col("__match"), F.col("__carry_row")))
        .drop("__b", "__carry_row")
    )


def _bracket_fills(u: DataFrame, obs, keys, buckets: int,
                   ) -> DataFrame:
    """Add to every row of ``u`` the latest observation at-or-before
    its ``__t`` (``__mb``) and the earliest at-or-after (``__mf``) —
    observations are the non-null values of the ``obs`` struct, whose
    FIRST field must be ``__t`` so struct max/min order by time first
    (ties resolved by the payload, deterministically).

    Keyed: two RANGE-frame window aggregates after ONE hash exchange
    (RANGE frames make equal-``__t`` rows peers, so matching is
    inclusive in both directions). Keyless: the same per-bucket fills
    plus an O(buckets) carry table (running max of bucket maxima /
    min of bucket minima) broadcast back — the two-level parallel
    prefix scan, no single-task window over the data.
    """
    u = u.withColumn("__obs", obs)
    if keys:
        w = Window.partitionBy(*keys).orderBy("__t")
        return (
            u.withColumn(
                "__mb",
                F.max("__obs").over(
                    w.rangeBetween(Window.unboundedPreceding, 0)
                ),
            )
            .withColumn(
                "__mf",
                F.min("__obs").over(
                    w.rangeBetween(0, Window.unboundedFollowing)
                ),
            )
            .drop("__obs")
        )

    lo, hi = u.select(F.min("__t"), F.max("__t")).first()
    if lo is None or hi is None or buckets == 1 or hi <= lo:
        w = Window.orderBy("__t")
        return (
            u.withColumn(
                "__mb",
                F.max("__obs").over(
                    w.rangeBetween(Window.unboundedPreceding, 0)
                ),
            )
            .withColumn(
                "__mf",
                F.min("__obs").over(
                    w.rangeBetween(0, Window.unboundedFollowing)
                ),
            )
            .drop("__obs")
        )
    width = (int(hi) - int(lo) + buckets) // buckets \
        if isinstance(lo, int) else (hi - lo) / buckets
    b = F.least(
        F.greatest(
            ((F.col("__t") - F.lit(lo)) / F.lit(width)).cast("long"),
            F.lit(0),
        ),
        F.lit(buckets - 1),
    )
    u = u.withColumn("__b", b)
    wb = Window.partitionBy("__b").orderBy("__t")
    u = (
        u.withColumn(
            "__lb",
            F.max("__obs").over(
                wb.rangeBetween(Window.unboundedPreceding, 0)
            ),
        )
        .withColumn(
            "__lf",
            F.min("__obs").over(
                wb.rangeBetween(0, Window.unboundedFollowing)
            ),
        )
    )
    per = u.groupBy("__b").agg(
        F.max("__obs").alias("__bb"), F.min("__obs").alias("__bf")
    )
    carry = per.select(
        "__b",
        F.max("__bb").over(
            Window.orderBy("__b").rowsBetween(
                Window.unboundedPreceding, -1
            )
        ).alias("__cb"),
        F.min("__bf").over(
            Window.orderBy("__b").rowsBetween(
                1, Window.unboundedFollowing
            )
        ).alias("__cf"),
    )
    return (
        u.join(F.broadcast(carry), "__b")
        .withColumn("__mb", F.greatest("__lb", "__cb"))
        .withColumn("__mf", F.least("__lf", "__cf"))
        .drop("__obs", "__b", "__lb", "__lf", "__cb", "__cf")
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    t: str = "ts",
    start: str = "start",
    end: str = "end",
    by: Union[str, Sequence[str], None] = None,
    chunk=None,
    how: str = "inner",
    suffix: str = "_i",
) -> DataFrame:
    """Join point rows to every interval row whose ``[start, end]``
    range contains the point's ``t`` (inclusive both ends), matching
    ``by`` keys exactly — the SQL ``a.t BETWEEN b.start AND b.end``
    range join, without the cartesian Spark would otherwise plan.

    Physical plan: the time axis is cut into fixed chunks at least as
    wide as the longest interval (computed with one tiny aggregate
    unless ``chunk`` — seconds for timestamp axes — is given), each
    interval is exploded to the <= 2 chunks it overlaps (JVM-side
    ``sequence``/``explode``), each point lands in exactly one chunk,
    and the match is ONE equi-join on (keys..., chunk) followed by the
    exact range filter. Because a point belongs to exactly one chunk,
    every qualifying (point, interval) pair appears exactly once — no
    dedup shuffle. ``how='left'`` keeps points with no containing
    interval, with NULL interval columns.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how {how!r}")
    keys = [by] if isinstance(by, str) else list(by or [])
    for k in keys:
        if k not in points.columns or k not in intervals.columns:
            raise ValueError(f"by-key {k!r} must exist on both sides")

    dt = _dtype_of(points, t)
    ds = _dtype_of(intervals, start)
    de = _dtype_of(intervals, end)

    icols = [c for c in intervals.columns if c not in keys]
    pcols = list(points.columns)
    out_names = {c: (c + suffix if c in pcols else c) for c in icols}

    ivl = intervals.select(
        *[F.col(k) for k in keys],
        *[F.col(c) for c in icols],
        _as_micros(F.col(start), ds).alias("__s"),
        _as_micros(F.col(end), de).alias("__e"),
    ).filter(F.col("__s") <= F.col("__e"))

    if chunk is not None:
        width = _tol_micros(chunk, ds)
        if width is None or width <= 0:
            raise ValueError(f"chunk must be positive, got {chunk!r}")
    else:
        width = ivl.select(
            F.max(F.col("__e") - F.col("__s"))
        ).first()[0]
        if width is None:
            width = 1
        width = max(int(width), 1)

    ivl = ivl.withColumn(
        "__c",
        F.explode(
            F.sequence(
                F.floor(F.col("__s") / F.lit(width)).cast("long"),
                F.floor(F.col("__e") / F.lit(width)).cast("long"),
            )
        ),
    )
    pts = points.withColumn("__pt", _as_micros(F.col(t), dt)).withColumn(
        "__c", F.floor(F.col("__pt") / F.lit(width)).cast("long")
    )

    on = keys + ["__c"]
    cond = (F.col("__pt") >= F.col("__s")) & (F.col("__pt") <= F.col("__e"))
    if how == "inner":
        res = pts.join(ivl, on, "inner").filter(cond)
        return res.select(
            *[F.col(c) for c in pcols],
            *[F.col(c).alias(out_names[c]) for c in icols],
        )
    # how='left': identify unmatched points by a unique non-null row
    # id — an anti-join on the data columns would mis-handle NULLs
    # (null-unsafe, so a matched row with a NULL attribute would also
    # land in the missing branch) and conflate duplicate point rows.
    # how='left': the missing branch anti-joins on the point CONTENT
    # with null-safe equality — content-identical rows share a match
    # status by definition, so this is exact for duplicates too, and
    # (unlike a monotonically_increasing_id stamp) it is stable across
    # the two re-evaluations of the pts plan that the two branches
    # imply.
    matched = pts.join(ivl, on, "inner").filter(cond)
    mk = matched.select(*pcols).distinct().alias("__mk")
    p = pts.alias("__p")
    anti_cond = None
    for c in pcols:
        term = F.col(f"__p.{c}").eqNullSafe(F.col(f"__mk.{c}"))
        anti_cond = term if anti_cond is None else (anti_cond & term)
    missing = p.join(mk, anti_cond, "left_anti").select(
        *[F.col(f"__p.{c}") for c in pcols],
        *[F.lit(None).cast(_dtype_of(intervals, c)).alias(out_names[c])
          for c in icols],
    )
    matched = matched.select(
        *[F.col(c) for c in pcols],
        *[F.col(c).alias(out_names[c]) for c in icols],
    )
    return matched.unionByName(missing)


def sessionize(
    df: DataFrame,
    *,
    t: str = "ts",
    by: Union[str, Sequence[str], None] = None,
    gap,
    session_col: str = "session_id",
    buckets: int = 64,
) -> DataFrame:
    """Gap-based sessionization: assign every row a session index such
    that consecutive same-key rows more than ``gap`` apart (seconds for
    timestamp axes, axis units for numeric ones; strictly greater
    breaks) start a new session. Sessions are numbered 1..n per key in
    time order — the classic sessionize every clickstream pipeline
    runs before per-session aggregation.

    Equal timestamps never break a session (dt = 0 <= gap). Output is
    the input plus ``session_col`` (long).

    Physical plan, keyed: ONE hash exchange on ``by``, a lag to flag
    breaks, a running sum to number them — all Catalyst window ops.
    Keyless: a global ordered window would be single-task, so the time
    axis is range-bucketed (``buckets``); break flags are computed
    inside each bucket, the boundary break (first row of bucket i vs
    last row of bucket i-1) and the running break-count offset come
    from an O(buckets)-row aggregate broadcast back — the same
    two-level parallel prefix scan as the keyless :func:`asof_join`.
    """
    keys = [by] if isinstance(by, str) else list(by or [])
    for k in keys:
        if k not in df.columns:
            raise ValueError(f"by-key {k!r} not in {df.columns}")
    if t not in df.columns:
        raise ValueError(f"time column {t!r} not in {df.columns}")
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")

    dtype = _dtype_of(df, t)
    g = _tol_micros(gap, dtype)
    if g is None or g < 0:
        raise ValueError(f"gap must be >= 0, got {gap!r}")

    cols = list(df.columns)
    u = df.withColumn("__t", _as_micros(F.col(t), dtype))

    if keys:
        w = Window.partitionBy(*keys).orderBy("__t")
        brk = F.when(
            F.col("__t") - F.lag("__t").over(w) > F.lit(g), F.lit(1)
        ).otherwise(F.lit(0))
        ws = (Window.partitionBy(*keys).orderBy("__t")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        out = u.withColumn("__brk", brk).withColumn(
            session_col, (F.sum("__brk").over(ws) + 1).cast("long")
        )
        return out.select(*cols, session_col)

    # Keyless: two-level prefix scan over time buckets.
    lo, hi = u.select(F.min("__t"), F.max("__t")).first()
    if lo is None:
        return df.withColumn(session_col, F.lit(None).cast("long"))
    if buckets == 1 or hi <= lo:
        w = Window.orderBy("__t")
        brk = F.when(
            F.col("__t") - F.lag("__t").over(w) > F.lit(g), F.lit(1)
        ).otherwise(F.lit(0))
        ws = (Window.orderBy("__t")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        out = u.withColumn("__brk", brk).withColumn(
            session_col, (F.sum("__brk").over(ws) + 1).cast("long")
        )
        return out.select(*cols, session_col)

    width = (int(hi) - int(lo) + buckets) // buckets \
        if isinstance(lo, int) else (hi - lo) / buckets
    b = F.least(
        F.greatest(
            ((F.col("__t") - F.lit(lo)) / F.lit(width)).cast("long"),
            F.lit(0),
        ),
        F.lit(buckets - 1),
    )
    u = u.withColumn("__b", b)
    wb = Window.partitionBy("__b").orderBy("__t")
    brk = F.when(
        F.col("__t") - F.lag("__t").over(wb) > F.lit(g), F.lit(1)
    ).otherwise(F.lit(0))
    ws = (Window.partitionBy("__b").orderBy("__t")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    local = u.withColumn("__brk", brk).withColumn(
        "__local", F.sum("__brk").over(ws)
    )

    # O(buckets) summary: per-bucket (min_t, max_t, total local
    # breaks). The boundary break between bucket i-1 and i is decided
    # on this tiny table; the session offset of bucket i is the
    # running sum of earlier buckets' breaks (local + boundary).
    summary = (
        u.groupBy("__b")
        .agg(F.min("__t").alias("__mn"), F.max("__t").alias("__mx"))
        .join(
            local.groupBy("__b").agg(F.sum("__brk").alias("__nb")),
            "__b",
        )
    )
    cw = Window.orderBy("__b")
    summary = summary.withColumn(
        "__bound",
        F.when(
            F.col("__mn") - F.lag("__mx").over(cw) > F.lit(g), F.lit(1)
        ).otherwise(F.lit(0)),
    )
    off_w = (Window.orderBy("__b")
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = summary.withColumn(
        "__off",
        F.coalesce(
            F.sum(F.col("__nb") + F.col("__bound")).over(off_w), F.lit(0)
        ) + F.col("__bound"),
    ).select("__b", "__off")

    out = local.join(F.broadcast(offsets), "__b").withColumn(
        session_col,
        (F.col("__local") + F.col("__off") + 1).cast("long"),
    )
    return out.select(*cols, session_col)


def rolling_agg(
    df: DataFrame,
    aggs,
    *,
    t: str = "ts",
    by: Union[str, Sequence[str], None] = None,
    window,
    side: str = "trailing",
) -> DataFrame:
    """Time-range rolling aggregates: for each row, aggregate all
    same-key rows whose time lies within ``window`` (seconds for
    timestamp axes, axis units for numeric) on the ``side`` of the
    row's own time — ``trailing`` = [t-window, t], ``centered`` =
    [t-window/2, t+window/2], ``leading`` = [t, t+window]. The SQL
    ``RANGE BETWEEN w PRECEDING AND CURRENT ROW`` frame, which Spark's
    window machinery executes natively (streaming frame scan inside
    each partition; ONE shuffle on the keys).

    ``aggs`` maps output column name -> (value column, fn name) with
    fn in sum/avg/min/max/count — e.g.
    ``{"spend_1h": ("value", "sum")}``.
    """
    if side not in ("trailing", "centered", "leading"):
        raise ValueError(f"unsupported side {side!r}")
    keys = [by] if isinstance(by, str) else list(by or [])
    dtype = _dtype_of(df, t)
    w = _tol_micros(window, dtype)
    if w is None or w <= 0:
        raise ValueError(f"window must be > 0, got {window!r}")
    fns = {"sum": F.sum, "avg": F.avg, "min": F.min, "max": F.max,
           "count": F.count}

    u = df.withColumn("__t", _as_micros(F.col(t), dtype))

    fractional_axis = (dtype in ("double", "float")
                       or dtype.startswith("decimal"))
    if not fractional_axis and not isinstance(w, int):
        # integer axis: |dt| <= 2.5 is the same predicate as |dt| <= 2,
        # and |dt| <= 0.5 is |dt| <= 0 (same-timestamp peers only)
        import math

        w = int(math.floor(w))
    lo_hi = {
        "trailing": (-w, 0),
        "leading": (0, w),
        "centered": (-(w // 2) if isinstance(w, int) else -w / 2,
                     (w // 2) if isinstance(w, int) else w / 2),
    }[side]

    out = u
    if fractional_axis:
        # Window.rangeBetween only takes long bounds, but a SQL RANGE
        # frame accepts fractional literals matching a double axis —
        # same plan, built through F.expr.
        def _bound(v, kw):
            return "CURRENT ROW" if v == 0 else f"{abs(float(v))!r} {kw}"

        part = (
            "PARTITION BY " + ", ".join(f"`{k}`" for k in keys) + " "
            if keys else ""
        )
        frame = (f"OVER ({part}ORDER BY `__t` RANGE BETWEEN "
                 f"{_bound(lo_hi[0], 'PRECEDING')} AND "
                 f"{_bound(lo_hi[1], 'FOLLOWING')})")
        for name, (col, fn) in aggs.items():
            if fn not in fns:
                raise ValueError(f"unsupported agg {fn!r}")
            out = out.withColumn(
                name, F.expr(f"{fn}(`{col}`) {frame}")
            )
    else:
        win = Window.orderBy("__t").rangeBetween(*lo_hi)
        if keys:
            win = (Window.partitionBy(*keys).orderBy("__t")
                   .rangeBetween(*lo_hi))
        for name, (col, fn) in aggs.items():
            if fn not in fns:
                raise ValueError(f"unsupported agg {fn!r}")
            out = out.withColumn(name, fns[fn](F.col(col)).over(win))
    return out.select(*df.columns, *aggs.keys())


def session_stats(
    df: DataFrame,
    aggs,
    *,
    t: str = "ts",
    by: Union[str, Sequence[str], None] = None,
    gap,
) -> DataFrame:
    """Per-session aggregates via Spark's NATIVE ``session_window`` —
    the idiomatic form when you want one row per session rather than a
    session label per event, and the form that runs unchanged under
    Structured Streaming (add ``withWatermark`` upstream and the state
    store merges/expires sessions incrementally; see
    tests/test_temporal.py for the availableNow stream == batch proof).

    ``gap`` is seconds; native semantics merge events strictly closer
    than ``gap`` (an exact-``gap`` step starts a NEW session), while
    :func:`sessionize` merges ``dt <= gap`` — the two agree whenever no
    consecutive step equals the gap exactly. Output: ``by`` keys +
    ``session_start`` / ``session_end`` + the requested aggregates.
    ``aggs`` maps output name -> (column, fn) like :func:`rolling_agg`.
    """
    dtype = _dtype_of(df, t)
    if not (dtype.startswith("timestamp") or dtype == "date"):
        raise ValueError(
            f"session_window needs a timestamp axis, got {dtype!r}"
        )
    g = float(gap)
    if g <= 0:
        raise ValueError(f"gap must be > 0 seconds, got {gap!r}")
    keys = [by] if isinstance(by, str) else list(by or [])
    fns = {"sum": F.sum, "avg": F.avg, "min": F.min, "max": F.max,
           "count": F.count}
    exprs = []
    for name, (col, fn) in aggs.items():
        if fn not in fns:
            raise ValueError(f"unsupported agg {fn!r}")
        exprs.append(fns[fn](F.col(col)).alias(name))
    w = F.session_window(F.col(t), f"{g} seconds")
    return (
        df.groupBy(*keys, w.alias("__w"))
        .agg(*exprs)
        .select(
            *keys,
            F.col("__w.start").alias("session_start"),
            F.col("__w.end").alias("session_end"),
            *aggs.keys(),
        )
    )


def time_fill(
    df: DataFrame,
    cols: Union[str, Sequence[str]],
    *,
    t: str = "ts",
    by: Union[str, Sequence[str], None] = None,
    method: str = "ffill",
    buckets: int = 64,
) -> DataFrame:
    """Fill NULL gaps in ``cols`` along the time axis, per ``by`` key —
    the pandas ``ffill`` / ``bfill`` / time-weighted ``interpolate``
    a series pipeline runs after joining sparse observations onto a
    dense clock.

    * ``ffill``  — last non-null value at-or-before each row
    * ``bfill``  — first non-null value at-or-after each row
    * ``linear`` — time-weighted interpolation between the bracketing
      non-null observations (pandas ``interpolate(method='time')``);
      rows before the first / after the last observation take the
      one-sided value (pandas limit_direction='both'); linear output
      columns are double

    Both brackets come from :func:`_bracket_fills` — keyed: two
    RANGE-frame window aggregates after ONE hash exchange; keyless:
    the bucketed two-level prefix scan (per-bucket fills + O(buckets)
    broadcast carry), never a single-task global window. Ties in
    ``t`` are frame peers, so a null row sharing its timestamp with
    an observation picks that observation's value (the greatest at
    that timestamp — deterministic).
    """
    if method not in ("ffill", "bfill", "linear"):
        raise ValueError(f"unsupported method {method!r}")
    cols = [cols] if isinstance(cols, str) else list(cols)
    keys = [by] if isinstance(by, str) else list(by or [])
    for c in cols:
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in {df.columns}")
    dtype = _dtype_of(df, t)

    out = df.withColumn("__t", _as_micros(F.col(t), dtype))
    fills = {}
    for c in cols:
        # (time, value) struct so the linear path knows WHEN the
        # bracketing observation happened, not just its value
        obs = F.when(
            F.col(c).isNotNull(), F.struct(F.col("__t"), F.col(c))
        )
        out = (
            _bracket_fills(out, obs, keys, buckets)
            .withColumnRenamed("__mb", f"__mb_{c}")
            .withColumnRenamed("__mf", f"__mf_{c}")
        )
        fills[c] = (F.col(f"__mb_{c}"), F.col(f"__mf_{c}"))

    for c in cols:
        val = F.col(c)
        b, f2 = fills[c]
        if method == "ffill":
            fill = b[c]
        elif method == "bfill":
            fill = f2[c]
        else:
            bt, bv = b["__t"], b[c].cast("double")
            ft, fv = f2["__t"], f2[c].cast("double")
            span = (ft - bt).cast("double")
            frac = F.when(
                span > 0, (F.col("__t") - bt).cast("double") / span
            ).otherwise(F.lit(0.0))
            fill = (
                F.when(b.isNull(), fv)
                .when(f2.isNull(), bv)
                .otherwise(bv + (fv - bv) * frac)
            )
            val = val.cast("double")
        out = out.withColumn(c, F.coalesce(val, fill))
    return out.select(*df.columns)


def resample_bars(df: DataFrame, time_col: str = "ts",
                  value_col: str = "value", *, every,
                  by=None) -> DataFrame:
    """Time-bucket OHLC downsampling — the candlestick/resample
    primitive (pandas ``resample().ohlc()`` / TimescaleDB
    ``time_bucket`` + first/last aggregates): rows fall into
    half-open buckets ``[k*every, (k+1)*every)`` on the time axis
    (``every`` in SECONDS for timestamp/date axes, raw axis units for
    numeric axes; epoch-anchored like time_bucket's default origin),
    and each (keys, bucket) emits:

    * ``open``  = value at the earliest time in the bucket
    * ``close`` = value at the latest time
    * ``high`` / ``low`` = max / min value
    * ``n`` rows and ``vsum`` (the volume column every bar chart
      wants)

    Rows sharing the boundary timestamp make first/last ambiguous;
    pandas resolves by input order, which a shuffle destroys — here
    ties break by value (open: smallest value among the earliest
    rows; close: largest among the latest), a deterministic total
    order both engines can replay.

    Scale shape: ONE map-side-combined groupBy over (keys, bucket) —
    ``min_by``/``max_by`` struct aggregates combine partially like
    any min/max, so the shuffle carries one partial row per group per
    task, never raw rows."""
    dtype = _dtype_of(df, time_col)
    keys = list(by) if by else []
    t = _as_micros(F.col(time_col), dtype)
    if dtype.startswith("timestamp") or dtype == "date":
        step = int(round(float(every) * _MICROS))
        if step <= 0:
            raise ValueError("every must be > 0")
        bucket = F.floor(t / F.lit(step)) * F.lit(step)
        bucket_out = F.timestamp_micros(bucket.cast("long")) \
            .alias("bucket")
    else:
        if float(every) <= 0:
            raise ValueError("every must be > 0")
        step = F.lit(every)
        bucket = F.floor(t / step) * step
        bucket_out = bucket.alias("bucket")
    v = F.col(value_col)
    base = df.select(
        *keys, bucket_out, t.alias("__t"), v.alias("__v")
    )
    return (
        base.groupBy(*keys, "bucket")
        .agg(
            F.min_by("__v", F.struct(F.col("__t"), F.col("__v")))
            .alias("open"),
            F.max("__v").alias("high"),
            F.min("__v").alias("low"),
            F.max_by("__v", F.struct(F.col("__t"), F.col("__v")))
            .alias("close"),
            F.count(F.lit(1)).alias("n"),
            F.sum("__v").alias("vsum"),
        )
    )
