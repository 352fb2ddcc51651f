"""Fixture-table catalog: parquet batch scans (SURVEY.md §2 B1).

The engine's tables are the driver-generated TPC-H-ish star schema plus
``events``/``documents``/``embeddings`` (TESTDATA.md, FIXTURES.md §2).
``spark.read.parquet`` gives the vectorized reader with predicate pushdown
and column pruning for free — every downstream operator benefits
(verify via ``df.explain``: ``PushedFilters`` / ``ReadSchema``).

At 100 TB these would be multi-file partitioned datasets (ideally
partitioned on date keys like ``o_orderdate``/``l_shipdate`` and bucketed
on join keys like ``o_orderkey``); the loader takes a directory so the
same code reads one file or ten thousand.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor — TPC-H
# region is always 5 rows and nation 25; part/supplier/customer scale with
# sf and must NOT be unconditionally broadcast.
BROADCAST_SAFE = frozenset({"region", "nation"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Runtime-settable confs every engine query depends on. The engine's own
# session factory (session.py) sets these at build time, but the driver
# contract hands queries() an EXTERNAL SparkSession we don't construct —
# without nanosAsLong every events read dies (PARQUET_TYPE_ILLEGAL), and
# without UTC the timestamp columns drift from the DuckDB oracle.
_REQUIRED_CONFS = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def ensure_session_defaults(spark: SparkSession) -> None:
    """Idempotently pin the confs the operator surface requires on any
    session (the driver's included)."""
    for k, v in _REQUIRED_CONFS.items():
        if spark.conf.get(k, None) != v:
            spark.conf.set(k, v)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table (parquet, schema from the footer).

    ``events.ts`` has shipped in two physical representations across
    fixture generations, and this loader normalizes both to a plain
    ``TimestampType`` (TIMESTAMP_LTZ) so downstream code — in particular
    ``withWatermark``, which rejects TIMESTAMP_NTZ at analysis time — sees
    one stable type:

    - ns-as-int64 (older fixtures): read as ``bigint`` via
      ``spark.sql.legacy.parquet.nanosAsLong``, floored to µs.
    - ``timestamp[us]`` with ``isAdjustedToUTC=false`` (current fixtures):
      Spark 4 reads this as TIMESTAMP_NTZ; with the session pinned to UTC
      the cast to TimestampType is value-preserving.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    ensure_session_defaults(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        from pyspark.sql import functions as F

        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every fixture table as a dict of DataFrames."""
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view for the SQL API surface."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
