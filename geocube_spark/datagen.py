"""Deterministic synthetic interleaved-document fixtures (seeded).

The engine's canonical input shape (BASELINE.json input_hint /
FIXTURES.md §1) is an interleaved table ``(doc_id, spans)``. The
driver's testdata parquet has no such table with geometries, so tests
and benchmarks synthesize one here — deterministic (seed fixed), no
external data, shapes mirroring the reference fixtures
(/root/reference/test/test_data/input/*.geojson):

* ``flat_polygon_docs``  — N polygons + float attrs (soil_data_flat-like,
  one attr with a null, FIXTURES.md §2)
* ``grouped_polygon_docs`` — groups x polygons with a group-key attr
  (soil_data_group-like)
* ``point_docs``         — points with float/str/time attrs
  (time_vector_data-like; also the point_with_null shape)
* ``scale_docs``         — parameterizable volume generator for bench

All geometry goes through WKB hex in ``media_ref``; attributes are
split across TWO json fragments merged in offset order; a noise
``text`` span is interleaved — exercising the span-sequence invariant.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd

from .geometry import wkb as W

# the reference's GARS cell (test_core_integration.py:31-39)
GARS_LON = (-90.59989999999999, -90.58343333333333)
GARS_LAT = (41.48343333333334, 41.4999)
GARS_POLY_GEOJSON = {
    "type": "Polygon",
    "coordinates": [
        [
            [GARS_LON[1], GARS_LAT[0]],
            [GARS_LON[0], GARS_LAT[0]],
            [GARS_LON[0], GARS_LAT[1]],
            [GARS_LON[1], GARS_LAT[1]],
            [GARS_LON[1], GARS_LAT[0]],
        ]
    ],
}

SOIL_ATTRS = [
    "om_r",
    "sandtotal_r",
    "silttotal_r",
    "claytotal_r",
    "cec7_r",
    "ph1to1h2o_r",
    "dbthirdbar_r",
    "awc_r",
]


def _doc_rows(prefix, geoms, attr_dicts, extra_text="lorem ipsum noise"):
    """Build (doc_id, spans) rows: attr json split in two fragments +
    geom span + trailing noise text span."""
    rows = []
    for i, (g, attrs) in enumerate(zip(geoms, attr_dicts)):
        items = list(attrs.items())
        half = max(1, len(items) // 2)
        frag1 = json.dumps(dict(items[:half]))
        frag2 = json.dumps(dict(items[half:]))
        spans = [
            {"kind": "attr", "text": frag1, "media_ref": "", "offset": 0},
            {
                "kind": "geom",
                "text": g.type_name,
                "media_ref": g.to_wkb().hex(),
                "offset": 1,
            },
            {"kind": "attr", "text": frag2, "media_ref": "", "offset": 2},
            {"kind": "text", "text": extra_text, "media_ref": "", "offset": 3},
        ]
        rows.append({"doc_id": f"{prefix}-{i:06d}", "spans": spans})
    return pd.DataFrame(rows)


def _jitter_polygons(rng, n, lon_rng=GARS_LON, lat_rng=GARS_LAT):
    """n random convex-ish quads inside the window."""
    geoms = []
    for _ in range(n):
        cx = rng.uniform(*lon_rng)
        cy = rng.uniform(*lat_rng)
        w = rng.uniform(0.05, 0.35) * (lon_rng[1] - lon_rng[0])
        h = rng.uniform(0.05, 0.35) * (lat_rng[1] - lat_rng[0])
        ang = rng.uniform(0, np.pi / 2)
        base = np.array(
            [[-w, -h], [w, -h], [w, h], [-w, h], [-w, -h]], dtype=float
        ) / 2.0
        rot = np.array(
            [[np.cos(ang), -np.sin(ang)], [np.sin(ang), np.cos(ang)]]
        )
        ring = base @ rot.T + [cx, cy]
        geoms.append(W.polygon(ring))
    return geoms


def flat_polygon_docs(n=7, seed=42) -> pd.DataFrame:
    """soil_data_flat-like: n polygons, 8 float attrs, one null in
    ph1to1h2o_r (FIXTURES.md §2)."""
    rng = np.random.RandomState(seed)
    geoms = _jitter_polygons(rng, n)
    attrs = []
    for i in range(n):
        a = {k: round(float(rng.uniform(0, 100)), 6) for k in SOIL_ATTRS}
        if i == n // 2:
            a.pop("ph1to1h2o_r")  # the null row
        attrs.append(a)
    return _doc_rows("soil_flat", geoms, attrs)


def grouped_polygon_docs(n_groups=11, per_group=7, seed=42) -> pd.DataFrame:
    """soil_data_group-like: same footprints repeated per group,
    group key hzdept_r ascending distinct values."""
    rng = np.random.RandomState(seed)
    footprints = _jitter_polygons(rng, per_group)
    group_keys = [0.0, 5.0, 15.0, 30.0, 45.0, 60.0, 75.0, 90.0, 105.0, 120.0, 150.0][
        :n_groups
    ]
    geoms, attrs = [], []
    for gi, gk in enumerate(group_keys):
        for fi, g in enumerate(footprints):
            geoms.append(g)
            attrs.append(
                {
                    # string attrs like the reference fixture's
                    # cokey/mukey/drclassdcd (non-numeric -> skipped)
                    "cokey": f"co-{gi:02d}{fi:02d}",
                    "mukey": f"mu-{fi:03d}",
                    "drclassdcd": ["Well drained", "Poorly drained"][fi % 2],
                    "hzdept_r": gk,
                    "hzdepb_r": gk + 5.0,
                    "claytotal_r": round(float(rng.uniform(0, 60)), 6),
                    "sandtotal_r": round(float(rng.uniform(0, 60)), 6),
                }
            )
    return _doc_rows("soil_group", geoms, attrs)


def point_docs(n=20, seed=42, with_null=False, tz_aware=True) -> pd.DataFrame:
    """time_vector_data-like points: float attr, str attr (skipped
    band), a timestamp attr with exactly 2 distinct values."""
    rng = np.random.RandomState(seed)
    lons = rng.uniform(GARS_LON[0], GARS_LON[1], n)
    lats = np.linspace(GARS_LAT[0], GARS_LAT[1], n)
    geoms = [W.point(x, y) for x, y in zip(lons, lats)]
    t0 = "2016-12-09T08:00:00-05:00" if tz_aware else "2016-12-09T08:00:00"
    t1 = "2016-12-10T08:00:00-05:00" if tz_aware else "2016-12-10T08:00:00"
    attrs = []
    for i in range(n):
        a = {
            "test_attr": round(float(rng.uniform(1, 3)), 6),
            "test_str_attr": f"attr-{i % 3}",
            "test_time_attr": t0 if i < n // 2 else t1,
        }
        if with_null and i % 4 == 0:
            a.pop("test_attr")
        attrs.append(a)
    return _doc_rows("pts", geoms, attrs)


def scale_docs(n_docs, seed=7, lon_rng=(-91.0, -90.0), lat_rng=(41.0, 42.0),
               points_fraction=0.5, n_attrs=4) -> pd.DataFrame:
    """Bench generator: n_docs features (mixed points/quads), n_attrs
    float attributes. Deterministic in (n_docs, seed)."""
    rng = np.random.RandomState(seed)
    n_pts = int(n_docs * points_fraction)
    geoms = [
        W.point(rng.uniform(*lon_rng), rng.uniform(*lat_rng))
        for _ in range(n_pts)
    ]
    geoms += _jitter_polygons(rng, n_docs - n_pts, lon_rng, lat_rng)
    attr_names = [f"m{i}" for i in range(n_attrs)]
    attrs = [
        {k: round(float(rng.uniform(0, 1000)), 4) for k in attr_names}
        for _ in range(n_docs)
    ]
    return _doc_rows("scale", geoms, attrs)


SPANS_SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)


def to_spark(spark, pdf: pd.DataFrame, n_partitions=None):
    df = spark.createDataFrame(pdf, schema=SPANS_SCHEMA)
    if n_partitions:
        df = df.repartition(n_partitions)
    return df
