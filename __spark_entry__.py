"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Queries live in ``geocube_spark.operators`` so they are importable
both here and from tests; this module only adapts them to the
driver's (spark, sf_dir) calling convention.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _ensure_pkg(spark: SparkSession) -> None:
    """Ship the package to Python workers (the --py-files contract) even
    when the driver created its own bare SparkSession."""
    try:
        from geocube_spark.session import package_zip

        spark.sparkContext.addPyFile(package_zip())
    except Exception:
        pass  # already added, or local-mode workers resolve via cwd


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: interleaved documents -> extract -> tile cover ->
    distributed scanline burn -> chunked raster cube (sf0.001)."""
    _ensure_pkg(spark)
    from geocube_spark.operators.geocube_queries import flagship

    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _ensure = _ensure_pkg
    from geocube_spark.operators import all_queries

    out = {}
    for name, (fn, _sql) in all_queries().items():
        def _wrap(spark, sf_dir, _fn=fn):
            _ensure(spark)
            return _fn(spark, sf_dir)

        out[name] = _wrap
    return out


def oracle_sql() -> dict[str, str]:
    from geocube_spark.operators import all_queries

    return {
        name: sql for name, (_fn, sql) in all_queries().items() if sql is not None
    }
