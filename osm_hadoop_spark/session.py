"""SparkSession factory with the engine's tuned defaults.

Scale posture (100 TB / 1000-executor design, tested on local[N]):
  - AQE on: runtime partition coalescing + skew-join splitting replace the
    reference's absent skew handling (SURVEY.md section 4).
  - Arrow execution for every pandas UDF; batches capped so one Arrow batch
    of exploded pixels/cells stays comfortably in executor memory.
  - shuffle.partitions defaults small locally; production submits override
    (spark-submit --conf), the plans never hardcode partition counts.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession


def build_pyfiles_zip(dest_dir: str | None = None) -> str | None:
    """Package `osm_hadoop_spark` into a zip for executor Python workers.

    This is the spark-submit --py-files artifact demanded by the north rule;
    `get_spark` also ships it automatically via addPyFile so library users
    (driver scripts run from any cwd) get importable UDF closures on workers.
    """
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    if not os.path.isdir(pkg_dir):
        # already running from a --py-files zip (spark-submit): there is no
        # directory to package, and the zip is already on every node
        return None
    dest_dir = dest_dir or tempfile.mkdtemp(prefix="osm_spark_pyfiles_")
    zip_path = os.path.join(dest_dir, "osm_hadoop_spark.zip")
    with zipfile.ZipFile(zip_path, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in root:
                continue
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    rel = os.path.join(
                        "osm_hadoop_spark", os.path.relpath(full, pkg_dir)
                    )
                    zf.write(full, rel)
    return zip_path


def get_spark(
    app_name: str = "osm-hadoop-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))

    # Arrow UDF workers allocate/free large buffers every batch; with the
    # default glibc behavior each >128 KB temporary is a fresh mmap/munmap
    # (page-fault + TLB work per use). Keep allocations inside the arena and
    # never trim, so steady-state batches run with zero memory syscalls.
    # Set via the driver env (local-mode daemons inherit it) AND
    # executorEnv (cluster mode). Measured on the profiling host: 2-4x
    # wall-time improvement on pandas-UDF-heavy stages.
    malloc_env = {
        "MALLOC_MMAP_THRESHOLD_": "1073741824",
        "MALLOC_TRIM_THRESHOLD_": "1073741824",
        "MALLOC_TOP_PAD_": "134217728",
        "MALLOC_ARENA_MAX": "2",
    }
    for k, v in malloc_env.items():
        os.environ.setdefault(k, v)

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 100k-row Arrow batches: 10x fewer buffer alloc/free cycles and
        # socket round-trips per worker than the 10k default — measured 2.5x
        # faster on the flagship's mapInPandas stages; still only ~10-20 MB
        # per in-flight batch for the engine's row widths.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "100000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    # Shuffle/spill scratch space: strictly opt-in via SPARK_GRAFT_LOCAL_DIR
    # (bench.py sets it to tmpfs after a capacity check). The default never
    # touches /dev/shm — on RAM-rich production nodes a tmpfs shuffle dir
    # silently competes with executor memory, and a small Docker /dev/shm
    # fails jobs with ENOSPC.
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir:
        os.makedirs(local_dir, exist_ok=True)
        b = b.config("spark.local.dir", local_dir)
    # Iceberg catalog when the runtime jar is on the classpath (production);
    # this container has no Iceberg jar, so the SnapshotCatalog (sources/catalog.py)
    # transparently falls back to Parquet snapshot directories with the same API.
    if os.environ.get("OSM_SPARK_ICEBERG_JAR"):
        b = (
            b.config("spark.jars", os.environ["OSM_SPARK_ICEBERG_JAR"])
            .config("spark.sql.catalog.local", "org.apache.iceberg.spark.SparkCatalog")
            .config("spark.sql.catalog.local.type", "hadoop")
            .config(
                "spark.sql.catalog.local.warehouse",
                os.environ.get("OSM_SPARK_WAREHOUSE", "/tmp/osm_spark_warehouse"),
            )
        )
    for k, v in malloc_env.items():
        b = b.config(f"spark.executorEnv.{k}", v)
    if extra_conf:
        for k, v in extra_conf.items():
            b = b.config(k, v)
    spark = b.getOrCreate()
    # ship the package to executor Python workers (UDFs import it there);
    # None means we were launched via spark-submit --py-files and the zip
    # is already distributed
    zip_path = build_pyfiles_zip()
    if zip_path is not None:
        spark.sparkContext.addPyFile(zip_path)
    return spark
