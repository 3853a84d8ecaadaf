"""Salted two-phase burn: equivalent to the unsalted burn.

'replace' results are bit-identical; 'add' results match to 1 ulp
(partial sums reassociate floating-point addition, exactly as any
distributed sum does).

North rule: "salted repartitioning for dense-geometry skew". The salt
splits each tile's input across pmod(seq, salt) sub-keys, burns
partials, and merges them per tile (sum + touch counts for 'add',
argmax winning-seq for 'replace'), so one dense tile becomes `salt`
parallel tasks without changing a single output cell.
"""

import numpy as np
import pytest

from geocube_spark import datagen as DG
from geocube_spark.cube import make_geocube


def _assemble(cube):
    return {m: a for m, a in cube.assemble().items()}


@pytest.mark.parametrize("merge_alg", ["add", "replace"])
def test_salted_equals_unsalted(spark, merge_alg):
    docs = DG.to_spark(spark, DG.flat_polygon_docs(n=25, seed=3))
    kw = dict(
        output_crs="EPSG:32615", resolution=(-30.0, 30.0),
        fill=-9999.0, merge_alg=merge_alg, tile_size=32,
    )
    base = _assemble(make_geocube(docs, **kw))
    salted = _assemble(make_geocube(docs, salt=4, **kw))
    assert base.keys() == salted.keys()
    for m in base:
        if merge_alg == "replace":
            np.testing.assert_array_equal(base[m], salted[m])
        else:
            np.testing.assert_allclose(base[m], salted[m], rtol=1e-12)


def test_salted_replace_with_nulls_and_filter_nan(spark):
    docs = DG.to_spark(spark, DG.point_docs(n=40, with_null=True))
    kw = dict(
        measurements=["test_attr"],
        output_crs="EPSG:4326", resolution=(-0.001, 0.001),
        fill=-9999.0, merge_alg="replace", tile_size=16,
        filter_nan=True,
    )
    base = _assemble(make_geocube(docs, **kw))
    salted = _assemble(make_geocube(docs, salt=3, **kw))
    for m in base:
        np.testing.assert_array_equal(base[m], salted[m])


def test_salted_grouped_add(spark):
    docs = DG.to_spark(spark, DG.grouped_polygon_docs(n_groups=4))
    kw = dict(
        measurements=["claytotal_r"],
        output_crs="EPSG:32615", resolution=(-30.0, 30.0),
        fill=0.0, merge_alg="add", group_by="hzdept_r", tile_size=32,
    )
    base = _assemble(make_geocube(docs, **kw))
    salted = _assemble(make_geocube(docs, salt=5, **kw))
    for m in base:
        np.testing.assert_allclose(base[m], salted[m], rtol=1e-12)
