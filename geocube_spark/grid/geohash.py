"""Geohash cell keys (public Niemeyer base32 encoding).

The fifth index scheme next to quadkey/XYZ (``grid/tiling.py``), S2
(``grid/s2.py``), aperture-7 hex (``grid/hex.py``) and the Hilbert
clustering key (``grid/hilbert.py``): geohash is the interleaved-bit
lat/lon code whose defining property is that the hierarchy is PREFIX
truncation — every ancestor cell of a geohash is a prefix of its
string, so rollups, joins and range scans work with plain string
operators any engine already has (``substr`` / ``LIKE 'u4pru%'`` /
BETWEEN on the prefix bounds). That makes it the cheapest possible
spatial bucketing to push into a data lake: no UDF on the read path at
all.

Encoding (public spec, en.wikipedia.org/wiki/Geohash): ``precision``
base32 characters = ``5 * precision`` bits, alternating longitude
(starting at the MSB) and latitude, each bit bisecting the remaining
interval. The iterative bisection is equivalent to the closed form
used here: quantize ``lon`` to ``ceil(bits/2)`` bits and ``lat`` to
``floor(bits/2)`` bits of their normalized fractions, then interleave
(Morton) and emit 5-bit groups through the ``0-9 b-z`` alphabet (i, l,
o omitted).

Three cross-checked forms, same as the sibling schemes:

* vectorized numpy (:func:`geohash_encode` / :func:`geohash_decode`),
* a pure-Catalyst Column program (:func:`geohash_col`) — the
  interleave is one FLAT bit sum (5p terms), so the expression tree is
  linear in precision (no staging needed, unlike the hilbert/hex
  recursions),
* a DuckDB SQL generator (:func:`geohash_sql`) with the identical
  arithmetic for the driver's oracle.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"

_MAX_PRECISION = 12  # 60 bits: fits signed int64 in every engine


def _check_precision(precision: int) -> None:
    if not 1 <= precision <= _MAX_PRECISION:
        raise ValueError(
            f"precision must be in [1, {_MAX_PRECISION}], got {precision}"
        )


def _bit_layout(precision: int):
    """(bits, nlon, nlat, placements): placements[t] = (src_is_lon,
    src_bit, dst_bit) for interleaved bit t (t=0 is the MSB)."""
    bits = 5 * precision
    nlon = (bits + 1) // 2
    nlat = bits // 2
    placements = []
    for t in range(bits):
        if t % 2 == 0:
            placements.append((True, nlon - 1 - t // 2, bits - 1 - t))
        else:
            placements.append((False, nlat - 1 - (t - 1) // 2,
                               bits - 1 - t))
    return bits, nlon, nlat, placements


def geohash_int(lon, lat, precision: int) -> np.ndarray:
    """Vectorized interleaved geohash as an int64 (the 5p-bit code
    before base32). Inputs clamp to the legal ranges like every public
    implementation (lon 180 -> the last cell)."""
    _check_precision(precision)
    bits, nlon, nlat, placements = _bit_layout(precision)
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    qlon = np.floor((lon + 180.0) / 360.0 * (1 << nlon)).astype(np.int64)
    qlat = np.floor((lat + 90.0) / 180.0 * (1 << nlat)).astype(np.int64)
    qlon = np.clip(qlon, 0, (1 << nlon) - 1)
    qlat = np.clip(qlat, 0, (1 << nlat) - 1)
    z = np.zeros_like(qlon)
    for is_lon, src, dst in placements:
        q = qlon if is_lon else qlat
        z |= ((q >> src) & 1) << dst
    return z


def geohash_encode(lon, lat, precision: int = 8) -> np.ndarray:
    """Vectorized geohash strings (array<str> of length ``precision``)."""
    z = geohash_int(lon, lat, precision)
    chars = []
    for g in range(precision):
        shift = 5 * (precision - 1 - g)
        chars.append(np.frombuffer(
            ALPHABET.encode(), dtype=np.uint8
        )[(z >> shift) & 31])
    out = np.stack(chars, axis=-1).astype(np.uint8)
    return out.view(f"S{precision}").reshape(z.shape).astype(str)


def geohash_decode(gh: str):
    """(lon_lo, lat_lo, lon_hi, lat_hi) bbox of a geohash cell —
    the exact inverse of the quantization (scalar; test/driver use)."""
    precision = len(gh)
    _check_precision(precision)
    bits, nlon, nlat, placements = _bit_layout(precision)
    z = 0
    for ch in gh:
        idx = ALPHABET.find(ch)
        if idx < 0:
            raise ValueError(f"invalid geohash character {ch!r}")
        z = (z << 5) | idx
    qlon = qlat = 0
    for is_lon, src, dst in placements:
        bit = (z >> dst) & 1
        if is_lon:
            qlon |= bit << src
        else:
            qlat |= bit << src
    lon_lo = qlon / (1 << nlon) * 360.0 - 180.0
    lat_lo = qlat / (1 << nlat) * 180.0 - 90.0
    return (lon_lo, lat_lo,
            lon_lo + 360.0 / (1 << nlon), lat_lo + 180.0 / (1 << nlat))


def geohash_int_col(lon: Column, lat: Column, precision: int) -> Column:
    """Pure-Catalyst interleaved geohash int64 — identical arithmetic
    to :func:`geohash_int` (one flat bit sum, whole-stage codegen)."""
    _check_precision(precision)
    bits, nlon, nlat, placements = _bit_layout(precision)
    qlon = F.greatest(F.lit(0), F.least(
        F.lit((1 << nlon) - 1),
        F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(1 << nlon)),
    )).cast("long")
    qlat = F.greatest(F.lit(0), F.least(
        F.lit((1 << nlat) - 1),
        F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(1 << nlat)),
    )).cast("long")
    z = F.lit(0).cast("long")
    for is_lon, src, dst in placements:
        q = qlon if is_lon else qlat
        z = z + F.shiftleft(F.shiftright(q, src).bitwiseAND(F.lit(1)),
                            dst)
    return z


def geohash_col(lon: Column, lat: Column, precision: int = 8) -> Column:
    """Pure-Catalyst geohash STRING of ``precision`` base32 chars."""
    z = geohash_int_col(lon, lat, precision)
    alph = F.array(*[F.lit(c) for c in ALPHABET])
    parts = [
        F.element_at(
            alph,
            (F.shiftright(z, 5 * (precision - 1 - g))
             .bitwiseAND(F.lit(31)) + F.lit(1)).cast("int"),
        )
        for g in range(precision)
    ]
    return F.concat(*parts)


def with_geohash(df: DataFrame, lon_col: str, lat_col: str,
                 precision: int = 8,
                 out_col: str = "geohash") -> DataFrame:
    """Add ``out_col`` = geohash of the lon/lat columns (JVM-side)."""
    return df.withColumn(
        out_col, geohash_col(F.col(lon_col), F.col(lat_col), precision)
    )


def geohash_sql(lon_sql: str, lat_sql: str, precision: int, table: str,
                keep: str = "event_id",
                out_col: str = "geohash") -> str:
    """DuckDB oracle: ``SELECT {keep}, {out_col}`` over ``table`` with
    the identical quantize/interleave/base32 arithmetic as a CTE chain
    (same shape as :func:`grid.hilbert.hilbert_key_sql`)."""
    _check_precision(precision)
    bits, nlon, nlat, placements = _bit_layout(precision)
    qlon = (f"greatest(0, least({(1 << nlon) - 1}, "
            f"CAST(floor((({lon_sql}) + 180.0) / 360.0 * {1 << nlon}) "
            f"AS BIGINT)))")
    qlat = (f"greatest(0, least({(1 << nlat) - 1}, "
            f"CAST(floor((({lat_sql}) + 90.0) / 180.0 * {1 << nlat}) "
            f"AS BIGINT)))")
    terms = []
    for is_lon, src, dst in placements:
        q = "qlon" if is_lon else "qlat"
        terms.append(f"((({q} >> {src}) & 1) << {dst})")
    z = "\n         + ".join(terms)
    chars = "\n      || ".join(
        f"substr('{ALPHABET}', "
        f"CAST(((z >> {5 * (precision - 1 - g)}) & 31) AS INT) + 1, 1)"
        for g in range(precision)
    )
    return f"""WITH gh_q AS (
  SELECT {keep}, {qlon} AS qlon, {qlat} AS qlat FROM {table}
), gh_z AS (
  SELECT {keep}, {z} AS z FROM gh_q
)
SELECT {keep}, {chars} AS {out_col} FROM gh_z"""
