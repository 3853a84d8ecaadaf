"""Per-band dtype planning (driver-side).

Reproduces the reference's dtype-minimization rule
(/root/reference/geocube/rasterize.py:46-64) with the modern-GDAL
branch (_INT8_SUPPORTED=True): int8 stays int8; any integer dtype with
a NaN fill becomes float32 when itemsize <= 2 bytes, else float64;
non-int/non-float becomes float64.

Test matrix parity (test_core_integration.py:891-914):
(uint16, 0)->uint16, (uint16, NaN)->float32, (int32, NaN)->float64,
(int64, 0)->int64.
"""

from __future__ import annotations

import numpy as np


def minimize_dtype(dtype: np.dtype, fill: float) -> np.dtype:
    dtype = np.dtype(dtype)
    if np.issubdtype(dtype, np.integer):
        if isinstance(fill, float) and np.isnan(fill):
            return (
                np.dtype("float64") if dtype.itemsize > 2 else np.dtype("float32")
            )
        return dtype
    if not np.issubdtype(dtype, np.floating):
        return np.dtype("float64")
    return dtype


def is_numeric(dtype) -> bool:
    """Reference _is_numeric (rasterize.py:23-27): non-numeric bands are
    skipped entirely with a warning."""
    try:
        return np.issubdtype(np.dtype(dtype), np.number)
    except TypeError:
        return False
