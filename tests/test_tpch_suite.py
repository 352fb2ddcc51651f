"""Gates for the named TPC-H suite and its derived-dimension device.

The oracle sweep pins every q_tpch_* against a DECORRELATED DuckDB twin;
these tests pin the decorrelation itself: Q20/Q21 are re-run in DuckDB
in the spec's LITERAL correlated EXISTS / nested-IN form and compared to
the engine output, so a wrong decorrelation cannot hide behind a twin
that made the same mistake. The partsupp / shipping-date device gets
structural gates (4 distinct in-range suppliers per part, exact match
with the oracle CTE, late == the pure integer predicate).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from asyncdatapipeline_spark import registry
from asyncdatapipeline_spark.operators.tpch import (
    _LSHIP_SQL,
    _PS_SQL,
    _lineitem_ship,
    _partsupp,
)

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from read_parquet('{SF}/{t}.parquet')"
        )
    return con


def test_named_suite_is_22_of_22():
    qs = registry.all_queries()
    missing = [n for n in range(1, 23) if f"q_tpch_q{n}" not in qs]
    assert missing == []


def test_partsupp_four_distinct_inrange_suppliers_per_part(spark, duck):
    ps = _partsupp(spark, SF)
    n_supp = duck.execute("select count(*) from supplier").fetchone()[0]
    bad = (
        ps.groupBy("ps_partkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("ps_suppkey").alias("nd"),
            F.min("ps_suppkey").alias("mn"),
            F.max("ps_suppkey").alias("mx"),
        )
        .filter(
            (F.col("n") != 4)
            | (F.col("nd") != 4)
            | (F.col("mn") < 0)
            | (F.col("mx") >= n_supp)
        )
        .count()
    )
    assert bad == 0


def test_partsupp_matches_oracle_cte_exactly(spark, duck):
    """The Spark builder and the SQL CTE are the same dimension,
    row for row — the device's cross-engine contract."""
    got = sorted(
        (r.ps_partkey, r.ps_suppkey, r.ps_availqty, r.ps_cost_cents)
        for r in _partsupp(spark, SF).collect()
    )
    want = sorted(
        map(
            tuple,
            duck.execute(
                f"WITH {_PS_SQL} SELECT ps_partkey, ps_suppkey, ps_availqty,"
                " ps_cost_cents FROM partsupp"
            ).fetchall(),
        )
    )
    assert got == want


def test_lineitem_ship_matches_oracle_cte(spark, duck):
    """Derived shipmode/commitdate/receiptdate agree bit-for-bit with
    the oracle CTE, and 'late' equals the pure integer predicate."""
    got = sorted(
        (r.l_orderkey, r.l_linenumber, r.l_shipmode, r.l_commitdate, r.l_receiptdate)
        for r in _lineitem_ship(spark, SF)
        .select("l_orderkey", "l_linenumber", "l_shipmode", "l_commitdate", "l_receiptdate")
        .collect()
    )
    rows = sorted(
        map(
            tuple,
            duck.execute(
                f"WITH {_LSHIP_SQL} SELECT l_orderkey, l_linenumber, l_shipmode,"
                " l_commitdate, l_receiptdate FROM lineitem_ship"
            ).fetchall(),
        )
    )
    # NB: (l_orderkey, l_linenumber) is NOT unique in the fixture; the
    # derived columns are a pure function of the pair, so duplicate
    # lines share values and a multiset compare is the right gate.
    assert got == rows
    for ok, ln, mode, cd, rd in rows:
        late_dates = rd > cd
        late_int = (ok * 17 + ln * 11) % 30 + 1 > (ok * 13 + ln * 7) % 61 - 30
        assert late_dates == late_int


def test_q2_returns_exactly_min_cost_europe_pairs(spark, duck):
    """Every Q2 row is AT the per-part EUROPE minimum (×100 = cents)."""
    out = registry.get("q_tpch_q2").fn(spark, SF).collect()
    assert out  # non-trivial at sf0.001 by construction
    mins = dict(
        duck.execute(
            f"""WITH {_PS_SQL}
SELECT ps.ps_partkey, min(ps.ps_cost_cents)
FROM partsupp ps
JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'EUROPE' GROUP BY 1"""
        ).fetchall()
    )
    for r in out:
        assert round(r.ps_supplycost * 100) == mins[r.p_partkey]


def test_q12_counts_partition_the_qualifying_lines(spark, duck):
    out = {r.l_shipmode: (r.high_line_count, r.low_line_count)
           for r in registry.get("q_tpch_q12").fn(spark, SF).collect()}
    totals = dict(
        duck.execute(
            f"""WITH {_LSHIP_SQL}
SELECT l_shipmode, count(*) FROM lineitem_ship l
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE l_shipmode IN ('MAIL','SHIP')
  AND l_commitdate < l_receiptdate
  AND CAST(l_shipdate AS DATE) < l_commitdate
  AND l_receiptdate >= DATE '1997-01-01' AND l_receiptdate < DATE '1998-01-01'
GROUP BY 1"""
        ).fetchall()
    )
    assert set(out) == set(totals)
    for mode, (hi, lo) in out.items():
        assert hi + lo == totals[mode]


def test_q20_decorrelation_equals_spec_nested_form(spark, duck):
    """The engine's decorrelated Q20 == DuckDB running the spec's
    literal nested-subquery text (IN over a correlated scalar)."""
    got = sorted(r.s_name for r in registry.get("q_tpch_q20").fn(spark, SF).collect())
    want = sorted(
        r[0]
        for r in duck.execute(
            f"""WITH {_PS_SQL}
SELECT s_name FROM supplier
WHERE s_suppkey IN (
  SELECT ps_suppkey FROM partsupp
  WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
    AND CAST(ps_availqty AS DOUBLE) > (
      SELECT 0.5e0 * sum(l_quantity) FROM lineitem
      WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
        AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'))
ORDER BY s_name"""
        ).fetchall()
    )
    assert got == want


def test_q21_decorrelation_equals_spec_exists_form(spark, duck):
    """The engine's one-pass Q21 == DuckDB running the spec's literal
    EXISTS / NOT EXISTS text on the derived dates."""
    got = sorted(
        (r.s_name, r.numwait)
        for r in registry.get("q_tpch_q21").fn(spark, SF).collect()
    )
    want = sorted(
        map(
            tuple,
            duck.execute(
                f"""WITH {_LSHIP_SQL}
SELECT s_name, count(*) AS numwait
FROM supplier s, lineitem_ship l1, orders o
WHERE s.s_suppkey = l1.l_suppkey AND o.o_orderkey = l1.l_orderkey
  AND o.o_orderstatus = 'F' AND l1.l_receiptdate > l1.l_commitdate
  AND EXISTS (SELECT 1 FROM lineitem_ship l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem_ship l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_receiptdate > l3.l_commitdate)
GROUP BY s_name"""
            ).fetchall(),
        )
    )
    assert got == want
