"""Driver contract for the spark-graft builder (PySpark target).

Thin re-export of the engine's central registry
(``asyncdatapipeline_spark.registry``): every operator from SURVEY.md §2
registers a ``queries()`` callable and, where SQL-expressible, a DuckDB
``oracle_sql()`` twin. Column names/aliases match between both sides
(the driver sorts columns by name before hashing values).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from asyncdatapipeline_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1 shape, SURVEY.md §7 M1) on sf0.001."""
    return registry.get("q_agg_hash").fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; omitted keys → rows-only check."""
    return registry.all_oracles()
