"""CollectFunc → Structured Streaming source adapter (SURVEY.md §2 A1/B6).

The reference's source contract is a pull callback:
``CollectFunc[T] func(ctx) ([]T, error)`` returning ``(nil, nil)`` for
"no new data" (/root/reference/async_data_pipeline.go:65-67). This module
adapts exactly that shape onto the PySpark Python DataSource API
(pyspark.sql.datasource, Spark 4): a ``SimpleDataSourceStreamReader``
whose ``read(start)`` invokes the user's collect callable and returns its
rows as the next micro-batch.

Transport note: the reader executes in a dedicated Python runner process
(not the driver), so the callable is cloudpickle-serialized into the
DataSource options (strings) and revived in the runner. Closure state
(e.g. a batch counter) lives in that runner for the lifetime of the
query — the same "one collector loop" lifetime the reference gives its
collect goroutine (async_data_pipeline.go:247-291).

Offset bookkeeping (SURVEY.md §7 hard-part 3): the offset is a monotonic
batch counter ``{"batch": n}``; ``read`` advances it only when data was
produced, so progress is monotonic. Like the reference, the adapter is
at-most-once: a restarted query re-pulls from the live callable rather
than replaying history (``readBetweenOffsets`` yields nothing) —
matching the reference's no-checkpoint behavior.
"""

from __future__ import annotations

import base64
from typing import Any, Callable, Iterator, Tuple

from pyspark import cloudpickle
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType


class _CollectFuncStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, schema: StructType, fn_b64: str):
        self._schema = schema
        self._fn_b64 = fn_b64
        self._fn: Callable[[], Any] | None = None

    def initialOffset(self) -> dict:
        return {"batch": 0}

    def read(self, start: dict) -> Tuple[Iterator[tuple], dict]:
        if self._fn is None:
            self._fn = cloudpickle.loads(base64.b64decode(self._fn_b64))
        data = self._fn()
        if data is None:
            # "no new data" (reference async_data_pipeline.go:66): empty
            # micro-batch, offset unchanged → idle watchdog keeps ticking.
            return iter(()), start
        rows = [r if isinstance(r, tuple) else tuple(r) for r in data]
        return iter(rows), {"batch": start["batch"] + 1}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # At-most-once, like the reference (no checkpoint replay).
        return iter(())

    def commit(self, end: dict) -> None:
        pass


class _CollectFuncBatchReader(DataSourceReader):
    """One-shot batch drain of a pull source (reference "finite run":
    tests emit fixed batches then idle out, async_data_pipeline_test.go:38-48
    — the ``spark.read`` analogue of that mode).

    A driver-supplied pull callback is inherently sequential, so the
    scan is a single input partition; ``max_pulls`` bounds the drain so
    a source that never returns None cannot wedge the job.
    """

    def __init__(self, fn_b64: str, max_pulls: int):
        self._fn_b64 = fn_b64
        self._max_pulls = max_pulls

    def partitions(self):
        return [InputPartition(0)]

    def read(self, partition) -> Iterator[tuple]:
        fn = cloudpickle.loads(base64.b64decode(self._fn_b64))
        for _ in range(self._max_pulls):
            data = fn()
            if data is None:
                return
            for r in data:
                yield r if isinstance(r, tuple) else tuple(r)


class CollectFuncDataSource(DataSource):
    """``format("collect_func")`` — the reference CollectFunc as a
    first-class source: streaming (micro-batch per pull) and batch
    (drain-until-None)."""

    @classmethod
    def name(cls) -> str:
        return "collect_func"

    def schema(self) -> str:
        return self.options.get("schema", "id long, value string")

    def simpleStreamReader(self, schema: StructType) -> _CollectFuncStreamReader:
        return _CollectFuncStreamReader(schema, self.options.get("fn", ""))

    def reader(self, schema: StructType) -> _CollectFuncBatchReader:
        return _CollectFuncBatchReader(
            self.options.get("fn", ""),
            int(self.options.get("max_pulls", "100000")),
        )


def register_data_source(spark: SparkSession) -> None:
    """Register the collect_func source on a session (idempotent)."""
    spark.dataSource.register(CollectFuncDataSource)


def collect_func_stream(
    spark: SparkSession,
    fn: Callable[[], Any],
    schema: str = "id long, value string",
) -> DataFrame:
    """Build a streaming DataFrame fed by ``fn()`` — the public adapter.

    ``fn`` returns a list of row-tuples per call, or None for "no new
    data". Must be picklable (module-level function or closure over
    picklable state).
    """
    register_data_source(spark)
    payload = base64.b64encode(cloudpickle.dumps(fn)).decode()
    return (
        spark.readStream.format("collect_func")
        .option("fn", payload)
        .option("schema", schema)
        .load()
    )


class _RangePartition(InputPartition):
    def __init__(self, lo: int, hi: int):
        self.lo, self.hi = lo, hi


class _RangePullBatchReader(DataSourceReader):
    """Partitioned pull reader for SPLITTABLE sources (round 7).

    The single-partition ``_CollectFuncBatchReader`` is honest for the
    reference's CollectFunc contract (one sequential callback), but a
    source that can serve ranges (a paginated API with offset/limit, a
    keyed table scan, a file with row groups) should be ingested in
    PARALLEL: ``partitions()`` splits the id space into ranges and each
    executor-side runner pulls only its own range — the Python-source
    rendition of what every JDBC/parquet reader does with predicated
    splits, and the shape that scales pull ingest to a 1000-executor
    cluster instead of a single runner process.
    """

    def __init__(self, fn_b64: str, total: int, n_splits: int):
        self._fn_b64 = fn_b64
        self._total = total
        self._n_splits = max(1, n_splits)

    def partitions(self):
        import math

        step = max(1, math.ceil(self._total / self._n_splits))
        return [
            _RangePartition(lo, min(lo + step, self._total))
            for lo in range(0, self._total, step)
        ]

    def read(self, partition: "_RangePartition") -> Iterator[tuple]:
        fn = cloudpickle.loads(base64.b64decode(self._fn_b64))
        for r in fn(partition.lo, partition.hi):
            yield r if isinstance(r, tuple) else tuple(r)


class RangePullDataSource(DataSource):
    """``format("range_pull")`` — parallel ingest of a splittable pull
    source: the user callable takes ``(lo, hi)`` and returns that id
    range's rows."""

    @classmethod
    def name(cls) -> str:
        return "range_pull"

    def schema(self) -> str:
        return self.options.get("schema", "id long, value string")

    def reader(self, schema: StructType) -> _RangePullBatchReader:
        return _RangePullBatchReader(
            self.options.get("fn", ""),
            int(self.options.get("total", "0")),
            int(self.options.get("n_splits", "8")),
        )


def range_pull_batch(
    spark: SparkSession,
    fn: Callable[[int, int], Any],
    total: int,
    n_splits: int = 8,
    schema: str = "id long, value string",
) -> DataFrame:
    """Parallel batch ingest of a splittable pull source: ``fn(lo, hi)``
    returns the rows of ``[lo, hi)``; the scan runs one input partition
    per split, in parallel across executors."""
    spark.dataSource.register(RangePullDataSource)
    payload = base64.b64encode(cloudpickle.dumps(fn)).decode()
    return (
        spark.read.format("range_pull")
        .option("fn", payload)
        .option("schema", schema)
        .option("total", str(total))
        .option("n_splits", str(n_splits))
        .load()
    )


def collect_func_batch(
    spark: SparkSession,
    fn: Callable[[], Any],
    schema: str = "id long, value string",
    max_pulls: int = 100_000,
) -> DataFrame:
    """Drain ``fn()`` until it returns None, as one batch DataFrame —
    the reference's finite-run mode over ``spark.read``."""
    register_data_source(spark)
    payload = base64.b64encode(cloudpickle.dumps(fn)).decode()
    return (
        spark.read.format("collect_func")
        .option("fn", payload)
        .option("schema", schema)
        .option("max_pulls", str(max_pulls))
        .load()
    )
