"""Operator/query registry consumed by __spark_entry__.py.

Each registry maps name -> (callable(spark, sf_dir) -> DataFrame,
oracle SQL string or None). Column names are aliased identically on
both sides (driver hashes values after sorting columns by name).

Ordering matters: the driver verifies the first 50 entries in registry
order, so queries that have never received a driver CORRECTNESS row
(frame_sample was red in r01 and its fix went unverified in r02;
json_props and the four sample_* queries were registered past the
window) are placed FIRST, and the total registry is held at <=50 by
retiring near-duplicate variants into EXTRA_QUERIES (each subsumed by
a surviving query on the same code path, each still pytest-covered).
"""

from __future__ import annotations

# Queries that had no CORRECTNESS_r02 row — verified first.
# (sample_quota / sample_budget rotated to extras in round 5 after
# three green driver rows each; the pop below is a no-op for retired
# names, so the list records the original window history.)
_FRONT = (
    "frame_sample",
    "json_props",
    "sample_hash",
    "sample_stratified",
    "sample_quota",
    "sample_budget",
)


def all_queries(include_extra: bool = False):
    from .geocube_queries import EXTRA_QUERIES as GEO_EXTRA
    from .geocube_queries import QUERIES as GEO
    from .pipeline_queries import EXTRA_QUERIES as PIPE_EXTRA
    from .pipeline_queries import QUERIES as PIPE

    merged = {}
    merged.update(GEO)
    merged.update(PIPE)

    out = {}
    for name in _FRONT:
        if name in merged:
            out[name] = merged.pop(name)
    out.update(merged)
    if include_extra:
        out.update(GEO_EXTRA)
        out.update(PIPE_EXTRA)
    return out
