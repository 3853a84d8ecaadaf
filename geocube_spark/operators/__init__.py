"""Operator/query registry consumed by __spark_entry__.py.

Each registry maps name -> (callable(spark, sf_dir) -> DataFrame,
oracle SQL string or None). Column names are aliased identically on
both sides (driver hashes values after sorting columns by name).
"""

from __future__ import annotations


def all_queries():
    from .geocube_queries import QUERIES as GEO

    out = {}
    out.update(GEO)
    try:
        from .pipeline_queries import QUERIES as PIPE

        out.update(PIPE)
    except ImportError:
        pass
    return out
