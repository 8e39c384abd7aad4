"""SparkSession factory.

Local test config tuned for local[N]; on a real cluster only the adaptive /
shuffle-partition settings matter and are safe defaults at scale (AQE
coalesces and re-plans at runtime).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "smartpy_arc_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    Defaults follow the 100 TB design guidance: AQE on (runtime partition
    coalescing + skew-join splitting), Arrow on for every pandas boundary,
    UTC session timezone so timestamps compare bit-for-bit with external
    oracles, and shuffle partitions sized to the parallelism actually
    available rather than the stock 200.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus

    # Python workers must be able to import this package (pandas-UDF
    # closures reference it by module name).  Must happen before the JVM
    # starts so the worker env inherits it.
    pkg_parent = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_parent not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_parent + (os.pathsep + existing if existing else "")
        )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Parquet TIMESTAMP(NANOS) (e.g. the events table) has no native
        # Spark type; read as long and convert via nanos_ts_cols in scan().
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # COUNT/MIN/MAX over plain parquet answer from footer statistics
        # instead of scanning row groups (no filters involved → safe)
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # NOTE on spark.sql.files.minPartitionNum: measured at sf0.1 it
        # HURTS (13.0s -> 20.1s headline total): the floor slices every
        # small file into `cpus` splits, paying per-task overhead on KB
        # dims and streaming micro-batches, while parquet row-group
        # granularity (testdata writes one group per file) means the big
        # scans still land on one task.  Split sizing is left to Spark's
        # bytes-per-core default; heavy operators that need more scan
        # parallelism repartition explicitly behind a small-input guard
        # (see contamination.py).
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


_PYFILE_SESSIONS: set[str] = set()


def ensure_worker_imports(spark: SparkSession) -> None:
    """Make this package importable on executor Python workers of a session
    we didn't create (e.g. the driver harness's own SparkSession started
    from a different cwd): zip the package and ``addPyFile`` it once per
    session.  No-op when already registered."""
    try:
        sid = spark.sparkContext.applicationId
    except Exception:
        sid = str(id(spark))
    if sid in _PYFILE_SESSIONS:
        return
    import glob
    import hashlib
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    parent = os.path.dirname(pkg_dir)
    files = sorted(glob.glob(os.path.join(pkg_dir, "**", "*.py"), recursive=True))
    digest = hashlib.md5(
        "".join(f"{f}:{os.path.getmtime(f)}" for f in files).encode()
    ).hexdigest()[:10]
    zpath = os.path.join(tempfile.gettempdir(), f"smartpy_arc_spark_{digest}.zip")
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w") as z:
            for f in files:
                z.write(f, os.path.relpath(f, parent))
    try:
        spark.sparkContext.addPyFile(zpath)
    except Exception:
        pass  # already added under this name in this JVM
    _PYFILE_SESSIONS.add(sid)
