"""geocube_spark - PySpark-native vector-to-raster cube engine.

Public surface mirrors the reference package (geocube/__init__.py):
``make_geocube`` / ``vectorize`` via ``api.core``, plus
``show_versions`` (reference geocube/show_versions.py).
"""

__version__ = "0.1.0"


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
