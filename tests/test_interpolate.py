"""Proximity raster kernel (method='proximity') unit tests."""

import numpy as np
import pytest

def test_proximity_matches_brute_force():
    """method='proximity': distance to the nearest point, exact, on
    both the brute-force and bucket-index paths."""
    from geocube_spark.kernels.interpolate import (
        GridInterpolator, _BUCKET_NN_MIN_POINTS,
    )

    rng = np.random.default_rng(17)
    for n in (50, _BUCKET_NN_MIN_POINTS + 100):
        px = rng.uniform(0, 100, n)
        py = rng.uniform(0, 100, n)
        gi = GridInterpolator("points_griddata", "proximity", px, py,
                              np.zeros(n))
        gx = np.linspace(2.5, 97.5, 20)
        gy = np.linspace(2.5, 97.5, 15)
        out = gi(gx, gy)
        qx, qy = np.meshgrid(gx, gy)
        d = np.sqrt(
            (qx.ravel()[:, None] - px[None, :]) ** 2
            + (qy.ravel()[:, None] - py[None, :]) ** 2
        ).min(axis=1).reshape(out.shape)
        np.testing.assert_allclose(out, d, rtol=1e-12, atol=1e-12)

    with pytest.raises(ValueError, match="rescale"):
        GridInterpolator("points_griddata", "proximity",
                         px, py, np.zeros(n), rescale=True)(gx, gy)
