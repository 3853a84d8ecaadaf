"""geocube_spark - PySpark-native vector-to-raster cube engine.

Public surface mirrors the reference package (geocube/__init__.py):
``make_geocube`` / ``vectorize`` via ``api.core``, plus
``show_versions`` (reference geocube/show_versions.py) and the
logging helpers in ``geocube_spark.logger`` (reference
geocube/logger.py).
"""

__version__ = "0.1.0"


def _tune_malloc() -> None:
    """Keep large numpy buffers on the reusable heap.

    glibc serves allocations over 128 KB from fresh mmap regions and
    unmaps them on free, so every large numpy temporary re-faults its
    pages. In a long-lived executor worker burning thousands of tiles
    that is pure page-fault churn (and on hosts where faults are
    expensive — virtualized/overcommitted memory — it dominates the
    kernel time). Raising M_MMAP_THRESHOLD/M_TRIM_THRESHOLD to 256 MB
    lets the allocator recycle those buffers. Best-effort: silently a
    no-op off glibc/Linux.
    """
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        m_trim_threshold, m_mmap_threshold = -1, -3
        libc.mallopt(m_mmap_threshold, 256 * 1024 * 1024)
        libc.mallopt(m_trim_threshold, 256 * 1024 * 1024)
    except Exception:
        pass


_tune_malloc()


def show_versions() -> str:
    """Print environment/dependency versions (reference
    geocube.show_versions parity, Spark-flavored)."""
    import platform
    import sys

    import numpy
    import pandas
    import pyarrow
    import pyspark

    lines = [
        f"geocube_spark: {__version__}",
        f"python: {sys.version.split()[0]} ({platform.platform()})",
        f"pyspark: {pyspark.__version__}",
        f"pyarrow: {pyarrow.__version__}",
        f"pandas: {pandas.__version__}",
        f"numpy: {numpy.__version__}",
    ]
    out = "\n".join(lines)
    print(out)
    return out
