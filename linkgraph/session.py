"""SparkSession factory tuned for the link-graph engine.

Arrow is always on (the extractor and CSR compactor are pandas UDFs);
AQE is on (runtime skew-join handling + partition coalescing); shuffle
partition count is explicit so small fixtures don't pay the 200-partition
default and big runs can size partitions to executor memory.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "linkgraph",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores`` sets ``local[cores]``; default comes from $SPARK_GRAFT_CPUS
    (driver contract) falling back to ``local[*]``. In a real deployment the
    master comes from spark-submit and this factory only applies confs.
    """
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    # Python workers must be able to import this package (the pandas UDFs are
    # module functions, pickled by reference). On a real cluster this is the
    # job of spark-submit --py-files (see main.py); in local mode the repo
    # root on PYTHONPATH does the same.
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pypath = os.environ.get("PYTHONPATH", "")
    if repo_root not in pypath.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{repo_root}{os.pathsep}{pypath}" if pypath else repo_root
        )
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("LINKGRAPH_SHUFFLE_PARTITIONS", "32"))

    # Shuffle files on tmpfs when available: this factory only ever builds
    # local[...] sessions (a cluster gets its local dirs from the resource
    # manager), and local shuffles are otherwise bottlenecked on one disk.
    # Gated on actual free space (tmpfs is typically capped at 50% of RAM;
    # spilling a big run into a nearly-full /dev/shm fails where plain disk
    # would succeed — ADVICE round 1). $LINKGRAPH_LOCAL_DIR overrides.
    local_dir = os.environ.get("LINKGRAPH_LOCAL_DIR")
    if local_dir is None and os.path.isdir("/dev/shm"):
        try:
            st = os.statvfs("/dev/shm")
            free_bytes = st.f_bavail * st.f_frsize
        except OSError:
            free_bytes = 0
        min_free = int(
            os.environ.get("LINKGRAPH_SHM_MIN_FREE_BYTES", str(8 << 30))
        )
        if free_bytes >= min_free:
            local_dir = "/dev/shm/linkgraph-spark-local"

    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", driver_memory or os.environ.get("LINKGRAPH_DRIVER_MEMORY", "8g"))
        # local mode: keep Python worker reuse on so pandas UDF startup
        # amortizes across supersteps
        .config("spark.python.worker.reuse", "true")
    )
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
