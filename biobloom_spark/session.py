"""SparkSession helpers: package shipping and tuned session defaults.

On a cluster the library travels via ``spark-submit --py-files
biobloom_spark.zip`` (the north rule's deployment mode).  For programmatic
use, ``ensure_workers`` does the same thing at runtime: zips the installed
package once and ``addPyFile``s it, so worker processes can unpickle our
Arrow-UDF closures regardless of the caller's cwd/venv layout.  Idempotent
per session; every public job entry point calls it.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED: set[str] = set()


def ensure_workers(spark: SparkSession) -> None:
    """Ship the biobloom_spark package to executors (idempotent)."""
    app_id = spark.sparkContext.applicationId
    if app_id in _SHIPPED:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    if not os.path.isdir(pkg_dir):
        # imported from a zip (spark-submit --py-files): the archive already
        # rides with the job, nothing to ship
        _SHIPPED.add(app_id)
        return
    zip_path = os.path.join(
        tempfile.gettempdir(), f"biobloom_spark_{os.getpid()}.zip"
    )
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_STORED) as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for f in files:
                    if f.endswith((".py",)):
                        full = os.path.join(root, f)
                        rel = os.path.join(
                            "biobloom_spark", os.path.relpath(full, pkg_dir)
                        )
                        zf.write(full, rel)
    spark.sparkContext.addPyFile(zip_path)
    _SHIPPED.add(app_id)


def get_spark(
    app_name: str = "biobloom_spark",
    cores: int | str = "*",
    shuffle_partitions: int | None = None,
    driver_memory: str = "8g",
    extra_conf: dict | None = None,
) -> SparkSession:
    """Opinionated local-mode session (tests/bench); on a real cluster use
    spark-submit and your own session config."""
    # glibc tuning for the Arrow workers: this sandbox VM services fresh
    # page faults extremely slowly (~150 MB/s first-touch), so the default
    # mmap-then-free behavior for >128 KiB numpy buffers causes refault
    # storms that serialize across workers (measured 6x kernel slowdown at
    # 4-way concurrency).  Pinning the thresholds makes glibc reuse heap
    # chunks instead.  Must be set before the JVM (and its python workers)
    # spawn; harmless elsewhere.
    for var in ("MALLOC_MMAP_THRESHOLD_", "MALLOC_TRIM_THRESHOLD_"):
        os.environ.setdefault(var, "2147483647")

    n = cores if isinstance(cores, str) else str(cores)
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or (os.cpu_count() or 8)),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", driver_memory)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        # same malloc tuning for executors on a real cluster
        .config("spark.executorEnv.MALLOC_MMAP_THRESHOLD_", "2147483647")
        .config("spark.executorEnv.MALLOC_TRIM_THRESHOLD_", "2147483647")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ensure_workers(spark)
    return spark
