"""SparkSession factory with the engine's tuned defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_SHM_MIN_FREE_BYTES = 32 << 30  # route shuffle to tmpfs only above this


def _default_local_dir() -> str:
    try:
        import shutil

        if shutil.disk_usage("/dev/shm").free >= _SHM_MIN_FREE_BYTES:
            return "/dev/shm/spark-local"
    except OSError:
        pass
    return "/tmp"


def get_spark(
    app_name: str = "sparksearch",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build a local SparkSession tuned for this engine.

    ``cores=None`` uses ``local[*]``.  On a real cluster the same confs
    apply; only ``master`` changes (set SPARK_MASTER env or spark-submit).
    """
    cores_s = "*" if cores is None else str(cores)
    master = os.environ.get("SPARK_MASTER", f"local[{cores_s}]")
    if shuffle_partitions is None:
        shuffle_partitions = (os.cpu_count() or 8) if cores is None else cores
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # sandbox-scale advisory: keeps AQE from under-parallelizing the
        # ~100 MB–1 GB shuffles of local benches; raise to 64m+ on a real
        # cluster where partitions should amortize task overhead
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        # split scans finely enough that sandbox-sized inputs (<1 GB) still
        # fan out across all cores; at real data sizes the default 128m
        # split is fine and this only costs a few extra tasks
        .config("spark.sql.files.maxPartitionBytes", "16m")
        # shuffle spill/transfer dir: the sandbox's /tmp sits on one slow
        # virtio disk that serializes shuffle I/O across all cores (a
        # ~28 s floor per shuffle-heavy stage regardless of parallelism);
        # tmpfs is the sandbox analogue of a cluster's per-executor NVMe.
        # Only defaulted when /dev/shm has real headroom — a host with a
        # small tmpfs (commonly 50 % of RAM) must keep the /tmp default
        # or large shuffles ENOSPC/OOM (ADVICE r1).
        .config("spark.local.dir", os.environ.get("SPARK_GRAFT_LOCAL_DIR", _default_local_dir()))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.shuffle.spill.compress", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
