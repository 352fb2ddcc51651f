"""PerformFunc → Python DataSource WRITER adapter (SURVEY.md §2 A8/B7).

The reference's sink contract is a push callback: ``PerformFunc[T]
func(ctx, batch []T) error`` invoked per collected batch
(/root/reference/async_data_pipeline.go:69-71, :293-340). The runtime
Pipeline already honors that contract via foreachBatch
(pipeline.py); this module additionally exposes it through Spark 4's
Python DataSource WRITE path (``DataSourceWriter``) — the mirror of
sources/pull_source.py's read path — so a user callable can be the
target of a plain ``df.write.format(...).save()``.

Executor-side semantics (what the adapter must get right at scale):

- ``write(iterator)`` runs ONCE PER PARTITION in the executor's Python
  worker — the callable sees each partition as one "batch", the same
  granularity the reference's perform loop sees channel batches.
- The callable is cloudpickle'd into the options (strings cross the
  JVM↔Python boundary), revived per task — closure state is per-task,
  never shared; durable effects must go through the side channel the
  callable owns (files, a DB client, a queue producer).
- Each task returns a ``WriterCommitMessage`` carrying its row count;
  ``commit(messages)`` sees ALL of them on the driver — the two-phase
  contract that makes retried/speculated tasks safe: a task that ran
  twice produces two write() calls but only the committed attempt's
  message reaches commit(), so effects written via attempt-unique
  paths (the pattern the test uses) are exactly-once after commit
  filtering. ``abort()`` is the all-tasks-failed hook.
"""

from __future__ import annotations

import base64
from dataclasses import dataclass
from typing import Any, Callable, Iterator

from pyspark import cloudpickle
from pyspark.sql import DataFrame
from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class _PerformCommit(WriterCommitMessage):
    rows: int = 0
    batches: int = 0


class _PerformFuncWriter(DataSourceWriter):
    def __init__(self, fn_b64: str, batch_size: int):
        self._fn_b64 = fn_b64
        self._batch_size = batch_size

    def write(self, iterator: Iterator[Any]) -> _PerformCommit:
        fn: Callable[[list], None] = cloudpickle.loads(
            base64.b64decode(self._fn_b64)
        )
        rows = 0
        batches = 0
        buf: list = []
        for row in iterator:
            buf.append(tuple(row))
            if len(buf) >= self._batch_size:
                fn(buf)
                rows += len(buf)
                batches += 1
                buf = []
        if buf:
            fn(buf)
            rows += len(buf)
            batches += 1
        return _PerformCommit(rows=rows, batches=batches)

    def abort(self, messages) -> None:  # pragma: no cover — failure hook
        pass


class PerformFuncDataSource(DataSource):
    """``format("perform_func")`` — a user callable as a batch sink,
    with the reference's batch-wise perform granularity
    (async_data_pipeline.go:293-340: drain up to batch_size, call)."""

    @classmethod
    def name(cls) -> str:
        return "perform_func"

    def writer(self, schema, overwrite: bool) -> _PerformFuncWriter:
        return _PerformFuncWriter(
            self.options["fn"], int(self.options.get("batch_size", "100"))
        )


def perform_func_write(
    df: DataFrame, fn: Callable[[list], None], batch_size: int = 100
) -> None:
    """Write ``df`` through ``fn(batch_of_row_tuples)`` — the public
    adapter. ``fn`` must be picklable and effect-bearing (it IS the
    sink); it runs in executor Python workers, one call per
    ``batch_size`` rows within each partition."""
    spark = df.sparkSession
    spark.dataSource.register(PerformFuncDataSource)
    payload = base64.b64encode(cloudpickle.dumps(fn)).decode()
    (
        df.write.format("perform_func")
        .option("fn", payload)
        .option("batch_size", str(batch_size))
        .mode("append")
        .save()
    )
