"""Set operators (SURVEY.md §2B B34-B36).

UNION ALL is a zero-shuffle concatenation of partitions; DISTINCT /
INTERSECT / EXCEPT each cost one hash-aggregate shuffle on the full row.
At scale, prefer pre-aggregated or key-only set ops (as these queries do:
single-key columns) — full-row distincts on wide rows shuffle everything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from asyncdatapipeline_spark.registry import query
from asyncdatapipeline_spark.sources.tables import load_table


@query(
    "q_union",
    oracle="""
SELECT DISTINCT c_custkey, src FROM (
  SELECT c_custkey, 'rich' AS src FROM customer WHERE c_acctbal > 5000
  UNION ALL
  SELECT c_custkey, 'building' AS src FROM customer WHERE c_mktsegment = 'BUILDING'
)
""",
)
def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL + DISTINCT (B34)."""
    c = load_table(spark, sf_dir, "customer")
    rich = c.filter(F.col("c_acctbal") > 5000).select(
        "c_custkey", F.lit("rich").alias("src")
    )
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey", F.lit("building").alias("src")
    )
    return rich.unionByName(building).distinct()


@query(
    "q_intersect",
    oracle="""
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
""",
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics, B35): customers with both a
    finished and an open order."""
    o = load_table(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    op = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.intersect(op)


@query(
    "q_except",
    oracle="""
SELECT l_partkey FROM lineitem WHERE l_quantity > 25
EXCEPT ALL
SELECT l_partkey FROM lineitem WHERE l_discount > 0.05
""",
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (multiset difference, B36) — preserves multiplicity,
    unlike EXCEPT; Spark ``exceptAll`` matches DuckDB ``EXCEPT ALL``."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") > 25).select("l_partkey")
    b = li.filter(F.col("l_discount") > 0.05).select("l_partkey")
    return a.exceptAll(b)


@query(
    "q_union_by_name",
    oracle="""
SELECT id, kind, round(amount, 4) AS amount, user_id FROM (
  SELECT o_orderkey AS id, 'order' AS kind, o_totalprice AS amount,
         NULL::BIGINT AS user_id
  FROM orders
  UNION ALL BY NAME
  SELECT event_id AS id, 'event' AS kind, value AS amount, user_id
  FROM events
)
ORDER BY kind, id
""",
)
def q_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union (B34's heterogeneous sibling):
    ``unionByName(allowMissingColumns=True)`` aligns by COLUMN NAME and
    null-fills columns one side lacks — the ingest-time shape when
    sources evolve (new fields appear) and position-based union would
    silently mis-align. Map-only at any scale.
    """
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("id"),
        F.lit("order").alias("kind"),
        F.col("o_totalprice").alias("amount"),
    )
    e = load_table(spark, sf_dir, "events").select(
        F.col("event_id").alias("id"),
        F.lit("event").alias("kind"),
        F.col("value").alias("amount"),
        "user_id",
    )
    return (
        o.unionByName(e, allowMissingColumns=True)
        .select("id", "kind", F.round("amount", 4).alias("amount"), "user_id")
        .orderBy("kind", "id")
    )
