"""Public API facade (reference geocube/api/core.py:19-101 parity)."""

from ..cube import GeoCube, make_geocube  # noqa: F401
from ..vector import vectorize  # noqa: F401

__all__ = ["GeoCube", "make_geocube", "vectorize"]
