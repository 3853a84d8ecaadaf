"""Interleaved-document -> vector-table extraction (Spark-first).

Input (BASELINE.json input_hint): an Iceberg/parquet table
``doc_id: string, spans: array<struct<kind:string, text:string,
media_ref:string, offset:int>>``. One document = one vector feature:
exactly one ``kind='geom'`` span (WKB hex in media_ref), zero or more
``kind='attr'`` spans whose ``text`` fragments are JSON objects merged
in offset order, and ``kind='text'`` noise spans that must pass
through untouched (span-sequence invariant).

Reference counterpart: load_vector_data
(/root/reference/geocube/geo_utils/geobox.py:49-99) — an OGR read +
validation. Here the "read" is a Catalyst scan and the parse is a
``mapInPandas`` batch UDF (vectorized; no per-row Python UDF calls —
the per-row JSON merge happens inside one Arrow batch in C-backed
pandas ops + the C json parser).

Scale notes: the extraction is a narrow map — no shuffle; column
pruning pushes ``spans`` element fields into the parquet reader when
only some fields are needed. The deterministic ``seq`` (doc ordinal
parsed from doc_id, FIXTURES.md §1) makes the later last-wins merge
order reproducible across any partitioning.
"""

from __future__ import annotations

import json
import re
from typing import Iterator, Optional, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .exceptions import VectorDataError

_ORDINAL_RE = re.compile(r"(\d+)\s*$")

_SPARK_TYPES = {
    "double": T.DoubleType(),
    "float64": T.DoubleType(),
    "float32": T.FloatType(),
    "float": T.FloatType(),
    "int64": T.LongType(),
    "long": T.LongType(),
    "int32": T.IntegerType(),
    "int": T.IntegerType(),
    "int16": T.ShortType(),
    "int8": T.ByteType(),
    "string": T.StringType(),
    "str": T.StringType(),
    "bool": T.BooleanType(),
    "timestamp": T.TimestampType(),
}


def doc_seq(doc_id: pd.Series) -> pd.Series:
    """Deterministic global sequence = trailing integer of doc_id.

    NOT monotonically_increasing_id: the reference's MergeAlg.replace
    depends on *input file order* (SURVEY.md §2.4), so the ordinal must
    come from the data itself.
    """
    return (
        doc_id.str.extract(_ORDINAL_RE, expand=False).astype("float64").fillna(-1).astype("int64")
    )


def infer_measurements(documents: DataFrame, sample_docs: int = 50):
    """Driver-side schema inference: sample attr spans, union JSON keys.

    Returns list[(name, spark_type_str)] in first-seen order. The
    sample is the global first N spans by (doc_id, offset) — a bare
    ``limit`` takes whatever rows arrive first, so the inferred field
    order would depend on the table's physical layout. orderBy+limit
    compiles to TakeOrderedAndProject (per-partition top-K + driver
    merge), not a full sort shuffle.
    """
    rows = (
        documents.select("doc_id", F.explode("spans").alias("s"))
        .where(F.col("s.kind") == "attr")
        .select("doc_id", F.col("s.offset").alias("off"), "s.text")
        .orderBy("doc_id", "off")
        .limit(sample_docs * 4)
        .select("text")
        .collect()
    )
    fields: dict[str, str] = {}
    for r in rows:
        try:
            obj = json.loads(r[0])
        except (TypeError, ValueError):
            continue
        for k, v in obj.items():
            if k in fields:
                continue
            if isinstance(v, bool):
                fields[k] = "bool"
            elif isinstance(v, int):
                fields[k] = "long"
            elif isinstance(v, float):
                fields[k] = "double"
            else:
                fields[k] = "string"
    return list(fields.items())


def extract_vector_table(
    documents: DataFrame,
    measurements: Optional[Sequence[tuple]] = None,
) -> DataFrame:
    """documents(spans) -> (doc_id, seq, geometry_wkb, *attrs).

    measurements: list of (name, type_str); inferred when None. The
    projection both prunes and **orders** the attribute columns,
    matching the reference's measurement pushdown (geobox.py:72-73,
    81-82).
    """
    if measurements is None:
        measurements = infer_measurements(documents)
    meas = [(n, t) for n, t in measurements]

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("seq", T.LongType()),
            T.StructField("geometry_wkb", T.BinaryType()),
        ]
        + [T.StructField(n, _SPARK_TYPES[t]) for n, t in meas]
    )

    names = [n for n, _ in meas]
    pd_casts = {
        n: {
            "double": "float64",
            "float": "float32",
            "long": "int64",
            "int": "int32",
            "string": "object",
            "bool": "object",
            "timestamp": "datetime64[us]",
        }.get(t, "object")
        for n, t in meas
    }

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            wkbs = [None] * n
            attr_cols: dict[str, list] = {m: [None] * n for m in names}
            for i, spans in enumerate(pdf["spans"].values):
                if spans is None:
                    continue
                # spans arrive as ndarray/list of Row-like dicts
                ordered = sorted(spans, key=lambda s: s["offset"])
                merged: dict = {}
                for s in ordered:
                    kind = s["kind"]
                    if kind == "attr" and s["text"]:
                        try:
                            merged.update(json.loads(s["text"]))
                        except ValueError:
                            pass
                    elif kind == "geom" and s["media_ref"]:
                        wkbs[i] = bytes.fromhex(s["media_ref"])
                for m in names:
                    if m in merged:
                        attr_cols[m][i] = merged[m]
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "seq": doc_seq(pdf["doc_id"]).values,
                    "geometry_wkb": wkbs,
                }
            )
            for m in names:
                s = pd.Series(attr_cols[m])
                dt = pd_casts[m]
                if dt not in ("object",):
                    s = pd.to_numeric(s, errors="coerce") if dt.startswith(("f", "i")) else s
                    try:
                        s = s.astype(dt)
                    except (ValueError, TypeError):
                        pass
                out[m] = s
            yield out

    return documents.mapInPandas(_extract, schema=out_schema)


def extract_vector_table_sql(
    documents: DataFrame,
    measurements: Optional[Sequence[tuple]] = None,
) -> DataFrame:
    """documents(spans) -> vector table with ZERO Python workers.

    Pure-Catalyst twin of ``extract_vector_table``: span filtering,
    offset ordering, JSON-fragment merging (last fragment wins, like
    dict.update), WKB unhex and the seq ordinal are all JVM array HOFs
    / ``from_json`` / ``unhex`` — whole-stage-friendly, no
    JVM<->Python crossing, no GIL. This is the production path; the
    pandas variant remains for odd schemas and as a differential-test
    oracle.
    """
    if measurements is None:
        measurements = infer_measurements(documents)
    meas = [(n, t) for n, t in measurements]

    by_offset = (
        "(a, b) -> CASE WHEN a.offset < b.offset THEN -1 "
        "WHEN a.offset > b.offset THEN 1 ELSE 0 END"
    )
    attrs_sorted = (
        f"array_sort(filter(spans, s -> s.kind = 'attr'), {by_offset})"
    )
    # pandas parity: the LAST geom span (offset order) with a non-empty
    # media_ref wins; try_element_at is ANSI-safe on geometry-less docs
    geom = (
        "unhex(try_element_at(array_sort("
        "filter(spans, s -> s.kind = 'geom' AND s.media_ref IS NOT NULL "
        "AND s.media_ref != ''), "
        f"{by_offset}), -1).media_ref)"
    )
    # same regex as doc_seq (\d+\s*$); '' -> -1
    seq = (
        r"coalesce(cast(nullif(regexp_extract(doc_id, '([0-9]+)\\s*$', 1),"
        " '') as bigint), -1)"
    )

    sql_types = {
        "double": "double", "float64": "double", "float32": "float",
        "float": "float", "int64": "bigint", "long": "bigint",
        "int32": "int", "int": "int", "int16": "smallint",
        "int8": "tinyint", "string": "string", "str": "string",
        "bool": "boolean", "timestamp": "timestamp",
    }

    # Per-measurement extraction, two JVM strategies:
    #
    # * plain identifier keys -> ``get_json_object(s.text, '$.k')`` per
    #   fragment (Jackson streaming; measured ~2.5x faster than the
    #   map<string,string> parse even when repeated for 8 bands, and it
    #   keeps scalar keys of fragments that also carry NESTED values);
    # * keys containing JSON-path metacharacters (dots, spaces, quotes,
    #   brackets) -> the fragment is parsed into a map and looked up
    #   literally (``m['k']``), which is path-injection-safe.
    #
    # Known narrowing vs the pandas path (benign for span-schema
    # corpora): an explicit JSON null in a later fragment cannot
    # override an earlier value (neither strategy can distinguish
    # key-absent from key:null) — our corpora encode missing values by
    # key omission, which all paths treat the same. The map strategy
    # additionally drops scalar keys of fragments holding nested
    # object/array values (from_json nulls the whole fragment).
    _safe_key = re.compile(r"^[A-Za-z0-9_]+$")
    need_maps = any(not _safe_key.match(n) for n, _ in meas)
    maps = (
        f"transform({attrs_sorted}, "
        "s -> coalesce(from_json(s.text, 'map<string,string>'), "
        "from_json('{}', 'map<string,string>')))"
    )

    def _meas_expr(name: str, typ: str) -> str:
        if _safe_key.match(name):
            vals = (
                f"filter(transform({attrs_sorted}, "
                f"s -> get_json_object(s.text, '$.{name}')), "
                "x -> x IS NOT NULL)"
            )
        else:
            key = name.replace("'", "\\'")
            vals = (
                f"filter(transform(__attr_maps, m -> m['{key}']), "
                "x -> x IS NOT NULL)"
            )
        return f"cast(try_element_at({vals}, -1) as {sql_types[typ]})"

    staged = documents.select(
        F.col("doc_id"),
        F.expr(seq).alias("seq"),
        F.expr(geom).alias("geometry_wkb"),
        "spans",
        *([F.expr(maps).alias("__attr_maps")] if need_maps else []),
    )
    return staged.select(
        "doc_id", "seq", "geometry_wkb",
        *[F.expr(_meas_expr(n, t)).alias(n) for n, t in meas],
    )


def with_wkb_from_wkt(df: DataFrame, wkt_column: str = "geometry_wkt",
                      out_column: str = "geometry_wkb") -> DataFrame:
    """Add a WKB geometry column parsed from a WKT text column.

    The reference accepts WKT geometry wherever OGR does (its
    geopandas ingest, cli/geocube.py:69-75); here WKT is a text codec
    over the engine's WKB columns — an Arrow-batched map, one parse
    per row, NULL text -> NULL geometry. The result plugs straight
    into ``make_geocube(vector_data=...)``.
    """
    from .geometry.wkt import wkt_to_wkb

    fields = [f for f in df.schema.fields if f.name != out_column]
    schema = T.StructType(fields + [T.StructField(out_column, T.BinaryType())])
    names = [f.name for f in fields]

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[names].copy()
            out[out_column] = wkt_to_wkb(pdf[wkt_column].values)
            yield out

    return df.mapInPandas(_parse, schema=schema)


def validate_vector_df(vector_df: DataFrame, geometry_column: str = "geometry_wkb"):
    """Reference input validation (geobox.py:78-90): empty table or
    missing geometry column -> VectorDataError."""
    if geometry_column not in vector_df.columns:
        raise VectorDataError(
            f"'{geometry_column}' column missing in the vector data"
        )
    if vector_df.isEmpty():
        raise VectorDataError("Empty DataFrame.")


def span_sequence(documents: DataFrame) -> DataFrame:
    """Canonical span-sequence view used for the per-row invariant
    (kind, text, media_ref, order) — BASELINE.json input_hint."""
    return documents.select(
        "doc_id",
        F.posexplode("spans").alias("pos", "s"),
    ).select(
        "doc_id",
        F.col("pos").alias("order"),
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.offset").alias("offset"),
    )
