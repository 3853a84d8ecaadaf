"""random_projection: exact numpy parity, JL norm preservation on
average, determinism, validation, and the zero-shuffle plan."""

import numpy as np
import pytest
from pyspark.sql import types as T

from geocube_spark.functions.similarity import (
    hyperplane_matrix,
    random_projection,
)

DIM, OUT = 24, 8


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.RandomState(11)
    m = rng.normal(size=(300, DIM)).astype(np.float32)
    rows = [(i, [float(x) for x in m[i]]) for i in range(len(m))]
    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ])
    return spark.createDataFrame(rows, schema), m


def test_matches_numpy(spark, vecs):
    df, m = vecs
    got = {
        r["id"]: np.asarray(r["proj"])
        for r in random_projection(df, dim=DIM, out_dim=OUT).collect()
    }
    Ht = hyperplane_matrix(DIM, OUT).T * np.sqrt(3.0 / OUT)
    want = m.astype(np.float64) @ Ht
    assert set(got) == set(range(len(m)))
    for i in range(len(m)):
        np.testing.assert_allclose(got[i], want[i], rtol=1e-12)
    # deterministic across runs
    again = {
        r["id"]: np.asarray(r["proj"])
        for r in random_projection(df, dim=DIM, out_dim=OUT).collect()
    }
    for i in got:
        np.testing.assert_array_equal(got[i], again[i])


def test_norms_preserved_on_average(spark, vecs):
    df, m = vecs
    got = np.stack([
        np.asarray(r["proj"])
        for r in random_projection(df, dim=DIM, out_dim=OUT)
        .orderBy("id").collect()
    ])
    ratio = (got ** 2).sum(axis=1) / (m.astype(np.float64) ** 2).sum(
        axis=1
    )
    # unbiased scaling: mean squared-norm ratio near 1 (the Weyl
    # matrix is pseudo-random, so allow a generous band)
    assert 0.7 < ratio.mean() < 1.3


def test_validation_and_width_check(spark, vecs):
    df, _ = vecs
    with pytest.raises(ValueError, match="out_dim"):
        random_projection(df, dim=DIM, out_dim=0)
    with pytest.raises(ValueError, match="dim"):
        random_projection(df, dim=0)
    import py4j
    from pyspark.errors import PythonException

    with pytest.raises((PythonException, py4j.protocol.Py4JJavaError),
                       match="embedding width"):
        random_projection(df, dim=DIM + 1, out_dim=OUT).collect()


def test_zero_shuffle_plan(spark, vecs):
    df, _ = vecs
    plan = random_projection(
        df, dim=DIM, out_dim=OUT
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "CartesianProduct" not in plan
