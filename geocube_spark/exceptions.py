"""Exception types mirroring the reference's public error surface.

Reference: /root/reference/geocube/exceptions.py:1-11
"""


class GeoCubeError(RuntimeError):
    """Base GeoCube exception (reference exceptions.py:6)."""


class VectorDataError(GeoCubeError):
    """Raised when vector data is invalid: empty table or missing
    geometry column (reference exceptions.py:11, geobox.py:78-90)."""
