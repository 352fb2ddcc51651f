"""Correlated subqueries (SURVEY.md §4 "subquery decorrelation").

The reference engine claims subquery decorrelation as a built-in
(SURVEY.md §4); until round 5 only the uncorrelated half was exercised
(q_scalar_subquery, q_join_semi/anti). These two operators cover the
correlated half — the most common relational idiom in analyst SQL:

- ``q_subquery_correlated``: TPC-H Q17's shape — rows compared against
  an aggregate over *their own* group (parts ordered below 20% of that
  part's average quantity).
- ``q_exists_correlated``: TPC-H Q21's shape — per-row EXISTS and
  NOT EXISTS with an extra predicate (multi-supplier orders where no
  *other* supplier's line was returned).

Scale notes (why these survive 100 TB): Catalyst DECORRELATES both —
the correlated scalar subqueries become one per-partkey aggregate
joined back on the key (and `MergeScalarSubqueries` fuses the sum and
count subqueries into a single aggregate), and EXISTS / NOT EXISTS
become left-semi / left-anti joins. Nothing executes per-row; the plan
audit (plans/audit.py) asserts no per-row subquery node survives in
the physical plan. The same SQL text runs on DuckDB as the oracle.

Determinism: the Q17 threshold ``qty < 0.2 * avg(qty)`` is evaluated
cross-multiplied in exact decimal/integer arithmetic
(``qty*5*count < sum``), so no engine's float `avg` rounding can flip
a boundary row (the operators/_util.py decimal-armor discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from asyncdatapipeline_spark.registry import query
from asyncdatapipeline_spark.sources.tables import load_table

# Exact-arithmetic Q17 shape, shared verbatim by Spark and DuckDB:
# qty*5*cnt < sum  ⟺  qty < 0.2 * (sum/cnt) = 0.2 * avg, with every
# operand exact (DECIMAL(18,6) casts of integer-valued quantities,
# BIGINT counts), so the strict inequality is bit-identical across
# engines — no float avg at the boundary.
_Q17_SQL = """
SELECT p.p_brand,
       count(*) AS n_small_lines,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
         AS small_revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE CAST(l.l_quantity AS DECIMAL(18,6)) * 5 *
      (SELECT count(*) FROM lineitem l2
       WHERE l2.l_partkey = l.l_partkey)
    < (SELECT sum(CAST(l2.l_quantity AS DECIMAL(18,6))) FROM lineitem l2
       WHERE l2.l_partkey = l.l_partkey)
GROUP BY p.p_brand
ORDER BY p.p_brand
"""

# Q21 shape: suppliers stuck in finished multi-supplier orders where no
# OTHER supplier's line was returned (l_returnflag stands in for the
# receipt/commit-date predicate the fixture lacks).
_Q21_SQL = """
SELECT s.s_name, count(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey
      AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey
      AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R')
GROUP BY s.s_name
ORDER BY s.s_name
"""


def _views(spark: SparkSession, sf_dir: str, *tables: str) -> None:
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


@query("q_subquery_correlated", oracle=_Q17_SQL)
def q_subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery, TPC-H Q17 shape (SURVEY.md §4):
    lineitem rows whose quantity is below 20% of *their part's* average
    quantity, rolled up to brand revenue.

    Catalyst decorrelates both correlated aggregates into per-partkey
    HashAggregates joined back to lineitem on l_partkey (the count via
    LeftOuter, the sum via Inner after a null filter) — at 100 TB that
    is a key-join on the column the table would be bucketed by, not
    60 billion per-row subquery executions. Each aggregate's output is
    one row per partkey (|parts| ≪ |lineitem|), so both sides broadcast
    here and stay shuffle-light at scale. The part join broadcasts
    (dim-sized). Plan-audited: no per-row Subquery node survives and
    the decorrelated LeftOuter aggregate join is present.
    """
    _views(spark, sf_dir, "lineitem", "part")
    return spark.sql(_Q17_SQL)


@query("q_exists_correlated", oracle=_Q21_SQL)
def q_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS, TPC-H Q21 shape (SURVEY.md §4):
    suppliers whose returned lines sit in finished orders that involve
    another supplier — but where no other supplier's line was returned.

    Catalyst rewrites EXISTS → left-semi join and NOT EXISTS →
    left-anti join, both on l_orderkey — the natural shuffle key all
    three lineitem branches already share, so at scale this is three
    co-partitioned passes over lineitem, never a per-row probe.
    Plan-audited: the physical plan contains a LeftSemi and a LeftAnti
    join and no per-row subquery execution.
    """
    _views(spark, sf_dir, "supplier", "lineitem", "orders")
    return spark.sql(_Q21_SQL)
