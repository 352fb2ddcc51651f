"""SparkSession factory tuned for the engine.

Local-mode defaults follow the 100 TB design notes: AQE on (runtime
re-planning, skew-join splitting, partition coalescing), shuffle
partitions sized to cores locally (on a real cluster this is overridden to
~2-3× total executor cores or left to AQE), UTC session timezone so
timestamp results are oracle-stable, and Arrow enabled for every
pandas-UDF exchange.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "asyncdatapipeline_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    Settings chosen for correctness-vs-oracle and scale behavior:

    - ``spark.sql.adaptive.enabled`` — AQE re-plans joins at runtime
      (broadcast demotion/promotion, skew-join split); essential at 100 TB
      where static stats mislead.
    - ``spark.sql.session.timeZone=UTC`` — DuckDB timestamps are
      UTC-naive; pinning avoids oracle drift.
    - Arrow on — every pandas UDF / toPandas crossing is columnar.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE's coalescing floor defaults to 1 MiB per partition, which
        # serializes every shuffle stage whose input is byte-small but
        # compute-heavy (the graph pair self-joins, decimal power-sum
        # reduces): a 5 MB frame coalesces to ~5 partitions — or ONE at
        # sub-MB sizes — and the expensive operator above it runs on one
        # core (guide §2.2/§2.5: bytes are a poor cost proxy for
        # CPU-bound operators). 64 KiB keeps tiny-frame stages spread
        # near total/parallelism while remaining a no-op at production
        # sizes, where partitions are advisory-sized (≥64 MiB) anyway.
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("SPARK_GRAFT_AQE_MIN_PARTITION_SIZE", "64k"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
        # events.ts is TIMESTAMP(NANOS) in parquet, which Spark's reader
        # rejects; read as long ns-since-epoch and convert in the loader
        # (sources/tables.py) — DuckDB keeps ns, so queries compare at
        # second/µs granularity by construction.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        # Managed tables (bucketed layouts, operators/layout.py) land in
        # a repo-local warehouse regardless of cwd; gitignored.
        .config("spark.sql.warehouse.dir", "/root/repo/.spark-warehouse")
        # Shuffle/spill scratch on tmpfs when available: the local disk
        # here shows iowait jitter that swings small-SF benchmarks 2×;
        # on a real cluster this is the usual NVMe scratch volume.
        .config(
            "spark.local.dir",
            "/dev/shm/spark-scratch"
            if os.path.isdir("/dev/shm")
            else "/tmp",
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def cluster_conf(
    executor_cores: int = 4,
    num_executors: int = 1000,
    executor_mem_gb: int = 16,
) -> dict[str, str]:
    """The conf profile this engine expects on a real cluster (the
    100 TB design point SCALING.md assumes) — pass as ``extra_conf`` to
    :func:`get_spark` with a cluster master, or feed to spark-submit.

    Rationale per knob:

    - shuffle partitions start at 2× total cores; AQE's advisory size
      (256 MB) then coalesces/splits per-stage, so the static number only
      has to be "enough to engage every core".
    - 256 MB scan splits: 100 TB / 256 MB ≈ 400k tasks — large enough to
      amortize task overhead, small enough that one task's working set
      fits executor memory alongside shuffle buffers.
    - broadcast threshold stays at 64 MB: region/nation-class dims
      always qualify; sf-scaled tables never silently do (operators that
      broadcast do so explicitly via ``F.broadcast``).
    - Kryo + zstd shuffle: CPU-cheap, halves shuffle bytes on wide rows
      — at 100 TB the shuffle fabric is the scarcest resource.
    """
    total_cores = executor_cores * num_executors
    return {
        "spark.executor.cores": str(executor_cores),
        "spark.executor.instances": str(num_executors),
        "spark.executor.memory": f"{executor_mem_gb}g",
        "spark.sql.shuffle.partitions": str(2 * total_cores),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "256m",
        "spark.sql.files.maxPartitionBytes": "256m",
        "spark.sql.autoBroadcastJoinThreshold": "64m",
        "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
        "spark.io.compression.codec": "zstd",
        "spark.shuffle.compress": "true",
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.legacy.parquet.nanosAsLong": "true",
    }
