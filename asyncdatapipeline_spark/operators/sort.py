"""Sort / limit operators (SURVEY.md §2B B32-B33).

Spark's global sort is a range-partitioned shuffle (sampled split points)
followed by per-partition sorts — fully parallel, unlike a naive
single-reducer sort. Top-k (`orderBy().limit(k)`) never materializes the
full sort: it plans as TakeOrderedAndProject — each task keeps a k-heap,
the driver merges p×k rows. That's the only sane global-top-k at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from asyncdatapipeline_spark.registry import query
from asyncdatapipeline_spark.sources.tables import load_table


@query(
    "q_sort",
    oracle="""
SELECT c_custkey, c_name, c_acctbal,
       nullif(c_mktsegment, 'MACHINERY') AS seg_or_null
FROM customer
ORDER BY seg_or_null DESC NULLS FIRST, c_acctbal DESC, c_custkey
""",
)
def q_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key global sort with explicit null ordering (B32).

    The driver's hash check is order-insensitive; the ordering contract
    itself is asserted by the pytest suite (tests/test_relational.py).
    """
    c = load_table(spark, sf_dir, "customer")
    return (
        c.withColumn("seg_or_null", F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")))
        .select("c_custkey", "c_name", "c_acctbal", "seg_or_null")
        .orderBy(
            F.col("seg_or_null").desc_nulls_first(),
            F.col("c_acctbal").desc(),
            F.col("c_custkey"),
        )
    )


@query(
    "q_topk",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
""",
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 by price (B33) — plans as TakeOrderedAndProject.

    The order is total (price desc, key) so the selected row *set* is
    deterministic and oracle-comparable.
    """
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
    )
