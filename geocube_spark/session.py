"""SparkSession factory with the engine's scale-oriented defaults."""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession


def package_zip() -> str:
    """Zip the geocube_spark package for --py-files-style shipping.

    On a real cluster the job runs ``spark-submit --py-files
    geocube_spark.zip`` (BASELINE.json north_rule); in-process we attach
    the same archive so Python workers resolve the package regardless of
    the driver's cwd.
    """
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    out = os.path.join(tempfile.gettempdir(), "geocube_spark_pkg.zip")
    # write-then-rename: concurrent sessions (another driver, a
    # spark-submit subprocess) may be READING the zip while we build —
    # an in-place rewrite hands them a truncated archive
    tmp = out + f".tmp.{os.getpid()}"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith((".pyc", ".pyo")) or "__pycache__" in root:
                    continue
                full = os.path.join(root, f)
                rel = os.path.join(
                    "geocube_spark", os.path.relpath(full, pkg_dir)
                )
                zf.write(full, rel)
    os.replace(tmp, out)
    return out


def get_spark(app="geocube_spark", master=None, shuffle_partitions=None,
              extra_conf=None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus)
    b = (
        SparkSession.builder.appName(app)
        .master(master)
        # deterministic timestamp semantics for datetime bands
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow everywhere: the engine is pandas-UDF heavy
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # AQE: runtime coalescing + skew-join splitting for dense tiles
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # parquet scan sizing for the 100TB target (per-task ~128MB)
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.addPyFile(package_zip())
    return spark
