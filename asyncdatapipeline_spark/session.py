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
