"""S2-scheme spherical cell index (faces + quadratic ST + Hilbert).

Implements the published S2CellId design (s2geometry.io cell
hierarchy; reference geocube has no global index — its users lean on
H3/S2 sidecar libraries, and the north rule asks for H3/S2 tiling):

* the sphere is projected onto the 6 faces of a cube
  (``largest-absolute-component`` face selection),
* face (u, v) coordinates pass through the quadratic S->T transform
  (area-balancing: max/min cell area ratio ~2.1 instead of ~5.2 for
  the linear transform),
* each face is a level-30 quadtree ordered by a face-continuous
  Hilbert curve, so cell ids are hierarchical (parent = bit prefix)
  and consecutive ids are spatially adjacent.

Three implementations of the same arithmetic, cross-checked in tests:

* vectorized numpy (for pandas/Arrow UDFs and tests),
* a Spark ``Column`` program (pure ``pyspark.sql.functions`` — the
  hot path stays inside Tungsten codegen; no Python in the scan), and
* a DuckDB SQL generator (the driver's oracle; also documents the
  algorithm as twelve plain CTEs).

Two id layouts:

* **canonical**: the 64-bit S2CellId layout — 3 face bits, 2·level
  Hilbert position bits, then a trailing ``1`` marking the level.
  Faces 4/5 overflow a *signed* 64-bit int, so Spark/DuckDB carry the
  same bits two's-complement; numpy works in uint64 and views out.
* **compact**: ``face * 4^level + pos`` — always positive, fits
  comfortably in a BIGINT for level <= 29, and is what the
  distributed bucketing paths use (bucket keys need hierarchy and
  locality, not the canonical token format).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

MAX_LEVEL = 30

# Hilbert sub-cell traversal tables (S2's kPosToIJ / kPosToOrientation
# construction: orientation bit 0 = swap axes, bit 1 = invert both).
# _POS_TO_IJ[orient][pos] = ij   where ij = 2 * i_bit + j_bit
_POS_TO_IJ = (
    (0, 1, 3, 2),  # canonical order: (0,0), (0,1), (1,1), (1,0)
    (0, 2, 3, 1),  # swap
    (3, 2, 0, 1),  # invert
    (3, 1, 0, 2),  # swap + invert
)
_POS_TO_ORIENT = (1, 0, 0, 3)  # orientation delta by sub-cell position

# inverted / flattened forms used by the three implementations:
# indexed by orient * 4 + ij
_IJ_TO_POS16 = [0] * 16
_NEXT_ORIENT16 = [0] * 16
for _o in range(4):
    for _pos in range(4):
        _ij = _POS_TO_IJ[_o][_pos]
        _IJ_TO_POS16[_o * 4 + _ij] = _pos
        _NEXT_ORIENT16[_o * 4 + _ij] = _o ^ _POS_TO_ORIENT[_pos]
_IJ_TO_POS_NP = np.array(_IJ_TO_POS16, dtype=np.int64)
_NEXT_ORIENT_NP = np.array(_NEXT_ORIENT16, dtype=np.int64)
# forward walk (id -> ij), indexed by orient * 4 + pos
_POS_TO_IJ16 = [0] * 16
_WALK_ORIENT16 = [0] * 16
for _o in range(4):
    for _pos in range(4):
        _POS_TO_IJ16[_o * 4 + _pos] = _POS_TO_IJ[_o][_pos]
        _WALK_ORIENT16[_o * 4 + _pos] = _o ^ _POS_TO_ORIENT[_pos]
_POS_TO_IJ_NP = np.array(_POS_TO_IJ16, dtype=np.int64)
_WALK_ORIENT_NP = np.array(_WALK_ORIENT16, dtype=np.int64)


# ---------------------------------------------------------------------------
# numpy forms
# ---------------------------------------------------------------------------

def lonlat_to_xyz(lon, lat):
    lon = np.radians(np.asarray(lon, dtype=np.float64))
    lat = np.radians(np.asarray(lat, dtype=np.float64))
    cl = np.cos(lat)
    return cl * np.cos(lon), cl * np.sin(lon), np.sin(lat)


def xyz_to_face_uv(x, y, z):
    """Cube face (0..5) + gnomonic (u, v) on that face.

    Face = axis of the largest absolute component (+x,+y,+z,-x,-y,-z
    -> 0..5); comparison order matches S2's LargestAbsComponent
    (x beats y beats z only on strict inequality)."""
    x, y, z = (np.asarray(a, dtype=np.float64) for a in (x, y, z))
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    axis = np.where(ax > ay, np.where(ax > az, 0, 2),
                    np.where(ay > az, 1, 2))
    comp = np.choose(axis, [x, y, z])
    face = np.where(comp >= 0, axis, axis + 3).astype(np.int64)
    # ValidFaceXYZtoUV table
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (ue, ve) in enumerate((
        (lambda: y / x, lambda: z / x),        # 0: +x
        (lambda: -x / y, lambda: z / y),       # 1: +y
        (lambda: -x / z, lambda: -y / z),      # 2: +z
        (lambda: z / x, lambda: y / x),        # 3: -x
        (lambda: z / y, lambda: -x / y),       # 4: -y
        (lambda: -y / z, lambda: -x / z),      # 5: -z
    )):
        m = face == f
        if m.any():
            with np.errstate(divide="ignore", invalid="ignore"):
                u[m] = ue()[m]
                v[m] = ve()[m]
    return face, u, v


def _face_uv_to_xyz(face, u, v):
    face = np.asarray(face, dtype=np.int64)
    u = np.asarray(u, dtype=np.float64)
    v = np.asarray(v, dtype=np.float64)
    one = np.ones_like(u)
    # inverse of the table above (unnormalized is fine for lon/lat):
    # 0:(1,u,v) 1:(-u,1,v) 2:(-u,-v,1) 3:(-1,-v,-u) 4:(v,-1,-u)
    # 5:(v,u,-1)
    xs = [one, -u, -u, -one, v, v]
    ys = [u, one, -v, -v, -one, u]
    zs = [v, v, one, -u, -u, -one]
    x = np.empty_like(u)
    y = np.empty_like(u)
    z = np.empty_like(u)
    for f in range(6):
        m = face == f
        if m.any():
            x[m], y[m], z[m] = xs[f][m], ys[f][m], zs[f][m]
    return x, y, z


def uv_to_st(u):
    """S2's quadratic area-balancing transform, UV -> [0, 1]."""
    u = np.asarray(u, dtype=np.float64)
    # bit-identical to the branch form (negation is exact), without
    # evaluating sqrt of a negative in the untaken np.where branch
    q = 0.5 * np.sqrt(1.0 + 3.0 * np.abs(u))
    return np.where(u >= 0.0, q, 1.0 - q)


def st_to_uv(s):
    s = np.asarray(s, dtype=np.float64)
    return np.where(
        s >= 0.5,
        (1.0 / 3.0) * (4.0 * s * s - 1.0),
        (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s)),
    )


def st_to_ij(s, level: int):
    n = 1 << level
    return np.clip(
        np.floor(np.asarray(s, dtype=np.float64) * n), 0, n - 1
    ).astype(np.int64)


def hilbert_pos(face, i, j, level: int):
    """Hilbert curve position of the (i, j) cell on ``face``.

    Vectorized MSB-first walk: at each level the 2-bit (i, j) pair
    picks the sub-cell position under the current orientation, and the
    orientation advances by the sub-cell's modifier (S2's
    kIJtoPos/kPosToOrientation recurrence)."""
    face = np.asarray(face, dtype=np.int64)
    i = np.asarray(i, dtype=np.int64)
    j = np.asarray(j, dtype=np.int64)
    orient = face & 1  # initial orientation = face & kSwapMask
    pos = np.zeros_like(i)
    for k in range(level - 1, -1, -1):
        ij = ((i >> k) & 1) * 2 + ((j >> k) & 1)
        idx = orient * 4 + ij
        pos = pos * 4 + _IJ_TO_POS_NP[idx]
        orient = _NEXT_ORIENT_NP[idx]
    return pos


def hilbert_ij(face, pos, level: int):
    """Inverse walk: curve position -> (i, j) cell coordinates."""
    face = np.asarray(face, dtype=np.int64)
    pos = np.asarray(pos, dtype=np.int64)
    orient = face & 1
    i = np.zeros_like(pos)
    j = np.zeros_like(pos)
    for k in range(level - 1, -1, -1):
        p = (pos >> (2 * k)) & 3
        idx = orient * 4 + p
        ij = _POS_TO_IJ_NP[idx]
        i = (i << 1) | (ij >> 1)
        j = (j << 1) | (ij & 1)
        orient = _WALK_ORIENT_NP[idx]
    return i, j


def compact_cell_id(lon, lat, level: int):
    """``face * 4^level + pos``: positive, hierarchical, BIGINT-safe."""
    face, u, v = xyz_to_face_uv(*lonlat_to_xyz(lon, lat))
    i = st_to_ij(uv_to_st(u), level)
    j = st_to_ij(uv_to_st(v), level)
    return face * (1 << (2 * level)) + hilbert_pos(face, i, j, level)


def compact_parent(cid, level: int, parent_level: int):
    cid = np.asarray(cid, dtype=np.int64)
    shift = 2 * (level - parent_level)
    face = cid >> (2 * level)
    pos = cid - (face << (2 * level))
    return face * (1 << (2 * parent_level)) + (pos >> shift)


def compact_cell_corners(cid, level: int):
    """(n, 4, 2) lon/lat corner quads of compact cell ids, CCW in ST
    space. Corners are the exact ST-edge points mapped through the
    quadratic uv projection; neighboring cells share edge corners
    bit-for-bit (same arithmetic), so the tiling has no cracks."""
    cid = np.asarray(cid, dtype=np.int64).reshape(-1)
    face = cid >> (2 * level)
    pos = cid - (face << (2 * level))
    i, j = hilbert_ij(face, pos, level)
    n = float(1 << level)
    out = np.empty((len(cid), 4, 2), dtype=np.float64)
    for k, (di, dj) in enumerate(((0, 0), (1, 0), (1, 1), (0, 1))):
        u = st_to_uv((i.astype(np.float64) + di) / n)
        v = st_to_uv((j.astype(np.float64) + dj) / n)
        x, y, z = _face_uv_to_xyz(face, u, v)
        out[:, k, 0] = np.degrees(np.arctan2(y, x))
        out[:, k, 1] = np.degrees(np.arctan2(z, np.hypot(x, y)))
    return out


def compact_cell_center(cid, level: int):
    """Center (lon, lat) in degrees of a compact cell id."""
    cid = np.asarray(cid, dtype=np.int64)
    face = cid >> (2 * level)
    pos = cid - (face << (2 * level))
    i, j = hilbert_ij(face, pos, level)
    n = float(1 << level)
    u = st_to_uv((i.astype(np.float64) + 0.5) / n)
    v = st_to_uv((j.astype(np.float64) + 0.5) / n)
    x, y, z = _face_uv_to_xyz(face, u, v)
    lon = np.degrees(np.arctan2(y, x))
    lat = np.degrees(np.arctan2(z, np.hypot(x, y)))
    return lon, lat


def cell_id(lon, lat, level: int):
    """Canonical 64-bit S2CellId layout.

    ``face(3) | hilbert pos(2*level) | 1 | 0...``: the trailing set
    bit encodes the level, parents are bit prefixes, and sorting by id
    sorts by curve position. Faces 4/5 set the sign bit; the value is
    the uint64 pattern viewed as int64 (Spark/DuckDB BIGINT carry the
    same bits)."""
    c = compact_cell_id(lon, lat, level).astype(np.uint64)
    face = c >> np.uint64(2 * level)
    pos = c - (face << np.uint64(2 * level))
    lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
    out = (
        (face << np.uint64(2 * MAX_LEVEL + 1))
        | (pos << np.uint64(2 * (MAX_LEVEL - level) + 1))
        | lsb
    )
    return out.view(np.int64)


def cell_id_level(cid):
    """Recover the level from a canonical id (position of the lowest
    set bit)."""
    u = np.asarray(cid, dtype=np.int64).view(np.uint64)
    lsb = u & (~u + np.uint64(1))
    k = np.zeros_like(u, dtype=np.int64)
    v = lsb.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        m = v >= (np.uint64(1) << np.uint64(shift))
        k[m] += shift
        v[m] >>= np.uint64(shift)
    return MAX_LEVEL - (k >> 1)


def cell_id_parent(cid, parent_level: int):
    """Canonical-id parent: keep the prefix, reset the level bit."""
    u = np.asarray(cid, dtype=np.int64).view(np.uint64)
    lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - parent_level))
    return ((u & (~(lsb - np.uint64(1)) ^ lsb)) | lsb).view(np.int64)


def compact_cell_polygon(cid, level: int, n_seg: int = 4):
    """Boundary of a compact cell as a closed lon/lat ring (k, 2).

    The cell is a rect in (s, t) face space; each edge is sampled
    ``n_seg`` times and mapped through ST->UV->XYZ->lon/lat, so the
    ring follows the true curved cell boundary. Useful for
    visualization and for handing S2 cells to the vector x vector
    spatial joins as ordinary polygons."""
    cid = int(np.asarray(cid, dtype=np.int64))
    face = cid >> (2 * level)
    pos = cid - (face << (2 * level))
    i, j = hilbert_ij(np.array([face]), np.array([pos]), level)
    n = float(1 << level)
    s0, s1 = i[0] / n, (i[0] + 1) / n
    t0, t1 = j[0] / n, (j[0] + 1) / n
    ts = np.linspace(0.0, 1.0, n_seg + 1)
    ss = np.concatenate([
        s0 + (s1 - s0) * ts, np.full(n_seg + 1, s1),
        s1 + (s0 - s1) * ts, np.full(n_seg + 1, s0),
    ])
    tt = np.concatenate([
        np.full(n_seg + 1, t0), t0 + (t1 - t0) * ts,
        np.full(n_seg + 1, t1), t1 + (t0 - t1) * ts,
    ])
    u = st_to_uv(ss)
    v = st_to_uv(tt)
    x, y, z = _face_uv_to_xyz(np.full(len(u), face), u, v)
    lon = np.degrees(np.arctan2(y, x))
    lat = np.degrees(np.arctan2(z, np.hypot(x, y)))
    ring = np.column_stack([lon, lat])
    ring[-1] = ring[0]  # exact closure
    return ring


def cell_token(cid) -> str:
    """Canonical hex token: uint64 hex with trailing zeros stripped."""
    u = int(np.asarray(cid, dtype=np.int64).view(np.uint64))
    s = f"{u:016x}".rstrip("0")
    return s if s else "X"


# ---------------------------------------------------------------------------
# Spark Column form (JVM-side; no Python in the scan)
# ---------------------------------------------------------------------------

def _lut_col(table, idx: Column) -> Column:
    return F.element_at(
        F.array(*[F.lit(int(t)) for t in table]), idx + F.lit(1)
    )


def s2_cell_id_col(lon: Column, lat: Column, level: int) -> Column:
    """Compact S2 cell id as a pure Column program.

    Same arithmetic as :func:`compact_cell_id`; stays inside
    whole-stage codegen (trig + CASE + bit ops), so a 10^12-row scan
    never leaves the JVM."""
    lonr, latr = F.radians(lon), F.radians(lat)
    x = F.cos(latr) * F.cos(lonr)
    y = F.cos(latr) * F.sin(lonr)
    z = F.sin(latr)
    ax, ay, az = F.abs(x), F.abs(y), F.abs(z)
    axis = F.when(
        (ax > ay) & (ax > az), F.lit(0)
    ).when(ay > az, F.lit(1)).otherwise(F.lit(2))
    comp = F.when(axis == 0, x).when(axis == 1, y).otherwise(z)
    face = F.when(comp >= 0, axis).otherwise(axis + 3)
    u = (
        F.when(face == 0, y / x)
        .when(face == 1, -x / y)
        .when(face == 2, -x / z)
        .when(face == 3, z / x)
        .when(face == 4, z / y)
        .otherwise(-y / z)
    )
    v = (
        F.when(face == 0, z / x)
        .when(face == 1, z / y)
        .when(face == 2, -y / z)
        .when(face == 3, y / x)
        .when(face == 4, -x / y)
        .otherwise(-x / z)
    )
    s = F.when(
        u >= 0, 0.5 * F.sqrt(1.0 + 3.0 * u)
    ).otherwise(1.0 - 0.5 * F.sqrt(1.0 - 3.0 * u))
    t = F.when(
        v >= 0, 0.5 * F.sqrt(1.0 + 3.0 * v)
    ).otherwise(1.0 - 0.5 * F.sqrt(1.0 - 3.0 * v))
    n = 1 << level
    i = F.least(
        F.lit(n - 1),
        F.greatest(F.lit(0), F.floor(s * n)),
    ).cast("long")
    j = F.least(
        F.lit(n - 1),
        F.greatest(F.lit(0), F.floor(t * n)),
    ).cast("long")

    face = face.cast("long")
    # Hilbert walk as a runtime fold (F.aggregate over the levels)
    # with a struct accumulator. An unrolled Column loop would inline
    # the orientation subtree twice per level — a 2^level expression
    # tree that OOMs Catalyst before anything runs. The fold keeps the
    # plan O(1) in the level and still executes entirely JVM-side.
    # MSB extraction uses only STATIC shifts: i/j shift left one bit
    # per step instead of indexing by the loop variable.
    mask = (1 << level) - 1
    init = F.struct(
        i.alias("i"),
        j.alias("j"),
        (face % 2).alias("o"),
        F.lit(0).cast("long").alias("p"),
    )

    def _step(acc, _k):
        ib = F.shiftright(acc["i"], level - 1) % 2
        jb = F.shiftright(acc["j"], level - 1) % 2
        idx = (acc["o"] * 4 + ib * 2 + jb).cast("int")
        return F.struct(
            (acc["i"] * 2).bitwiseAND(F.lit(mask)).alias("i"),
            (acc["j"] * 2).bitwiseAND(F.lit(mask)).alias("j"),
            _lut_col(_NEXT_ORIENT16, idx).cast("long").alias("o"),
            (acc["p"] * 4 + _lut_col(_IJ_TO_POS16, idx)).alias("p"),
        )

    pos = F.aggregate(
        F.sequence(F.lit(1), F.lit(level)), init, _step,
        lambda acc: acc["p"],
    )
    return face * F.lit(1 << (2 * level)) + pos


def s2_parent_col(cid: Column, level: int, parent_level: int) -> Column:
    shift = 2 * (level - parent_level)
    face = F.shiftright(cid, 2 * level)
    pos = cid - F.shiftleft(face, 2 * level)
    return face * F.lit(1 << (2 * parent_level)) + F.shiftright(pos, shift)


# ---------------------------------------------------------------------------
# DuckDB SQL generator (oracle)
# ---------------------------------------------------------------------------

def s2_cover_sql(lon_sql: str, lat_sql: str, level: int,
                 parent_level: int, source_sql: str,
                 key: str = "event_id") -> str:
    """ANSI-ish SQL computing the compact cell id + parent for every
    row of ``source_sql`` — the same arithmetic as the Column form,
    written as one CTE chain per Hilbert level so DuckDB can serve as
    the independent oracle."""

    def lut(table, idx):
        vals = ", ".join(str(int(t)) for t in table)
        return f"([{vals}])[({idx}) + 1]"

    n = 1 << level
    ctes = [
        f"s2q_pts AS (SELECT {key}, {lon_sql} AS lon, {lat_sql} AS lat "
        f"FROM {source_sql})",
        (
            "s2q_xyz AS (SELECT *, "
            "cos(radians(lat)) * cos(radians(lon)) AS x, "
            "cos(radians(lat)) * sin(radians(lon)) AS y, "
            "sin(radians(lat)) AS z FROM s2q_pts)"
        ),
        (
            "s2q_ax AS (SELECT *, CASE WHEN abs(x) > abs(y) THEN "
            "CASE WHEN abs(x) > abs(z) THEN 0 ELSE 2 END ELSE "
            "CASE WHEN abs(y) > abs(z) THEN 1 ELSE 2 END END AS axis "
            "FROM s2q_xyz)"
        ),
        (
            "s2q_fc AS (SELECT *, CASE WHEN (CASE axis WHEN 0 THEN x "
            "WHEN 1 THEN y ELSE z END) >= 0 THEN axis ELSE axis + 3 "
            "END AS face FROM s2q_ax)"
        ),
        (
            "s2q_uv AS (SELECT *, "
            "CASE face WHEN 0 THEN y/x WHEN 1 THEN -x/y "
            "WHEN 2 THEN -x/z WHEN 3 THEN z/x WHEN 4 THEN z/y "
            "ELSE -y/z END AS u, "
            "CASE face WHEN 0 THEN z/x WHEN 1 THEN z/y "
            "WHEN 2 THEN -y/z WHEN 3 THEN y/x WHEN 4 THEN -x/y "
            "ELSE -x/z END AS v FROM s2q_fc)"
        ),
        (
            "s2q_st AS (SELECT *, "
            "CASE WHEN u >= 0 THEN 0.5*sqrt(1+3*u) "
            "ELSE 1-0.5*sqrt(1-3*u) END AS s, "
            "CASE WHEN v >= 0 THEN 0.5*sqrt(1+3*v) "
            "ELSE 1-0.5*sqrt(1-3*v) END AS t FROM s2q_uv)"
        ),
        (
            f"s2q_ij AS (SELECT {key}, face, "
            f"CAST(least({n - 1}, greatest(0, floor(s * {n}))) "
            "AS BIGINT) AS i, "
            f"CAST(least({n - 1}, greatest(0, floor(t * {n}))) "
            "AS BIGINT) AS j FROM s2q_st)"
        ),
        (
            f"s2q_h{level} AS (SELECT *, face % 2 AS o{level}, "
            f"CAST(0 AS BIGINT) AS p{level} FROM s2q_ij)"
        ),
    ]
    for k in range(level - 1, -1, -1):
        prev = k + 1
        idx = f"o{prev} * 4 + ((i >> {k}) & 1) * 2 + ((j >> {k}) & 1)"
        ctes.append(
            f"s2q_h{k} AS (SELECT *, "
            f"{lut(_NEXT_ORIENT16, idx)} AS o{k}, "
            f"p{prev} * 4 + {lut(_IJ_TO_POS16, idx)} AS p{k} "
            f"FROM s2q_h{prev})"
        )
    pshift = 2 * (level - parent_level)
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        f"SELECT {key}, face * {1 << (2 * level)} + p0 AS s2_cell, "
        f"face * {1 << (2 * parent_level)} + (p0 >> {pshift}) "
        f"AS s2_parent FROM s2q_h0 ORDER BY {key}"
    )
