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

# --- scale-adaptive scan repair (optimization round 12, guide §2.5) ---
#
# The fixture tables ship as ONE parquet file with ONE row group, and
# Spark can parallelize a parquet scan only at row-group granularity —
# so every scan-rooted map stage (decimal power sums, explodes, regex
# passes, the graph pair self-join builds) runs on a SINGLE task no
# matter how many cores the session has. Measured r12 (probe_perf):
# q_ml_vif 18.6 s cold with 7 stages / 15 tasks — pure single-threaded
# compute; q_embed_participation 33/33 single-task stages.
#
# Repair: when the file's NATURAL split count (row groups capped by
# size/maxPartitionBytes) cannot engage the session's parallelism AND
# the table is small enough that one round-robin shuffle of it is
# trivially cheap, redistribute right after the read. The repair is
# scale-adaptive, not local-tuned: at production scale a table has
# thousands of row groups, the natural-split test passes, and the
# loader is a no-op — exactly the "derive from input size" rule of the
# optimization guide (§2: make partitioning scale-adaptive rather than
# a constant tuned for either local mode or the cluster).
#
# Catalyst pushes filters and column pruning THROUGH Repartition (the
# plan keeps PushedFilters/ReadSchema at the scan — verified on the
# resident build), so the repair costs only the small shuffle.
# Row-identity scans (input_file_name / _metadata) must opt out:
# those columns evaluate above the exchange and would come back empty.
_REPAIR_MAX_BYTES = int(
    os.environ.get("SPARK_GRAFT_SCAN_REPAIR_MAX_BYTES", str(256 << 20))
)
_REPAIR_MIN_ROWS = 2_000  # below this, 1 task is the right plan
_FOOTER_CACHE: dict[tuple[str, float], tuple[int, int, int]] = {}


def _footer_stats(path: str) -> tuple[int, int, int]:
    """(bytes, rows, row_groups) from the parquet footer, mtime-cached."""
    st = os.stat(path)
    key = (path, st.st_mtime)
    hit = _FOOTER_CACHE.get(key)
    if hit is None:
        import pyarrow.parquet as pq

        md = pq.ParquetFile(path).metadata
        hit = (st.st_size, md.num_rows, md.num_row_groups)
        _FOOTER_CACHE[key] = hit
    return hit


def _repair_parallelism(spark: SparkSession, df: DataFrame, path: str) -> DataFrame:
    try:
        size, rows, row_groups = _footer_stats(path)
    except Exception:  # non-file layouts: leave the scan alone
        return df
    if size > _REPAIR_MAX_BYTES or rows < _REPAIR_MIN_ROWS:
        return df
    par = spark.sparkContext.defaultParallelism
    # natural parallel read units: one per row group, but a split is
    # only produced per maxPartitionBytes of file — the min of the two
    natural = min(row_groups, max(1, -(-size // (128 << 20))))
    if natural * 2 >= par:
        return df
    # Round-robin, NOT hash-on-columns: a hash repartition references
    # its key columns, which defeats column pruning at the scan (the
    # audit caught ReadSchema widening to the full row — at scale that
    # re-reads every byte). Round-robin references nothing, so pruning
    # and pushdown pass through untouched; its determinism local sort
    # (sortBeforeRepartition, kept on) measured within noise of the
    # sort-free hash form — the exchange barrier, not the sort, is the
    # repair's cost, and per-query opt-outs below handle the operators
    # where that cost exceeds the parallelism it buys.
    return df.repartition(par)

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


def load_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    *,
    parallelize: bool = True,
) -> DataFrame:
    """Read one fixture table (parquet, schema from the footer).

    ``parallelize=False`` opts out of the scan-parallelism repair (see
    ``_repair_parallelism``) for callers that read row/file identity
    columns (``input_file_name()``, ``_metadata``) — those evaluate
    above the repair's exchange and would come back empty.

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
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    if parallelize:
        df = _repair_parallelism(spark, df, path)
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
