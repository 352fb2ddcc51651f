"""UDF / UDAF / UDTF surface (SURVEY.md §2B B51-B55).

Doctrine: UDFs are the slow path. Every query here exists to prove the
*plumbing* (Arrow batch transfer, grouped-map schemas, UDTF lateral
output), and each one's oracle is the pure-SQL equivalent — demonstrating
that the built-in route exists. Pandas UDFs move data via Arrow in
columnar batches (~10-100× faster than row-at-a-time Python UDFs); plain
Python UDFs appear exactly once (B51), as the contract demands, on a
filtered small input.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from asyncdatapipeline_spark.registry import query
from asyncdatapipeline_spark.sources.tables import load_table


@query(
    "q_udf_py",
    oracle="""
SELECT
  o_orderkey,
  o_totalprice,
  CASE
    WHEN o_totalprice >= 200000 THEN 'high'
    WHEN o_totalprice >= 80000 THEN 'mid'
    ELSE 'low'
  END AS bracket
FROM orders
WHERE o_orderstatus = 'P'
""",
)
def q_udf_py(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (B51) — the deliberately slow path,
    applied after a selective filter so the Python boundary sees few
    rows. The oracle is the CASE WHEN the UDF replaces."""

    @F.udf(T.StringType())
    def bracket(price: float) -> str:
        if price >= 200000:
            return "high"
        if price >= 80000:
            return "mid"
        return "low"

    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderstatus") == "P")
        .select("o_orderkey", "o_totalprice", bracket("o_totalprice").alias("bracket"))
    )


@query(
    "q_udf_pandas",
    oracle="""
SELECT
  l_orderkey,
  l_linenumber,
  l_extendedprice * (1 - l_discount) AS net_price,
  l_quantity + 0.5 AS adj_qty
FROM lineitem
""",
)
def q_udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas UDF over Arrow batches (B52).

    numpy double arithmetic is elementwise IEEE — bit-identical to the
    JVM/DuckDB expression, so the oracle matches exactly.
    """

    @F.pandas_udf(T.DoubleType())
    def net(price: pd.Series, discount: pd.Series) -> pd.Series:
        return price * (1.0 - discount)

    @F.pandas_udf(T.DoubleType())
    def adj(qty: pd.Series) -> pd.Series:
        return qty + 0.5

    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        net("l_extendedprice", "l_discount").alias("net_price"),
        adj("l_quantity").alias("adj_qty"),
    )


@query(
    "q_udaf_pandas",
    oracle="""
SELECT
  l_returnflag,
  round(SUM(l_quantity * l_discount) / SUM(l_quantity), 6) AS wavg_discount
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def q_udaf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDAF (B53): quantity-weighted mean
    discount per return flag.

    Float sums are order-dependent (numpy pairwise vs DuckDB sequential),
    so the result is rounded to 6 decimals on both sides — the ratio is
    O(0.05) with ~1e-14 accumulated error, far inside the rounding.
    """

    @F.pandas_udf(T.DoubleType())
    def wavg(qty: pd.Series, disc: pd.Series) -> float:
        return round(float((qty * disc).sum() / qty.sum()), 6)

    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(wavg("l_quantity", "l_discount").alias("wavg_discount"))
        .orderBy("l_returnflag")
    )


@query(
    "q_udf_grouped_map",
    oracle="""
SELECT
  c_custkey,
  c_mktsegment,
  round((c_acctbal - avg(c_acctbal) OVER (PARTITION BY c_mktsegment))
        / stddev_samp(c_acctbal) OVER (PARTITION BY c_mktsegment), 4) AS z
FROM customer
""",
)
def q_udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group map via applyInPandas (B54): z-normalize account
    balance within each market segment.

    Each group arrives as one pandas DataFrame (groups must fit in
    worker memory — fine for bounded segment counts; at 100 TB, per-key
    state this shape is what ``applyInPandasWithState`` bounds). pandas
    ``std`` (ddof=1) matches ``stddev_samp``; rounded to 4 decimals to
    absorb float summation-order drift.
    """

    def znorm(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["c_acctbal"].mean()
        sd = pdf["c_acctbal"].std(ddof=1)
        return pd.DataFrame(
            {
                "c_custkey": pdf["c_custkey"],
                "c_mktsegment": pdf["c_mktsegment"],
                "z": ((pdf["c_acctbal"] - mu) / sd).round(4),
            }
        )

    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").applyInPandas(
        znorm, schema="c_custkey long, c_mktsegment string, z double"
    )


@query(
    "q_udtf",
    oracle="""
SELECT d.doc_id, CAST(t.i AS INTEGER) AS word_index,
       split_part(d.text, ' ', CAST(t.i AS INTEGER)) AS word
FROM documents d, generate_series(1, 5) AS t(i)
WHERE d.doc_id < 100
  AND len(string_split(d.text, ' ')) >= t.i
""",
)
def q_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (B55, Spark 4): explode the first 5 words of each
    document into (doc_id, word_index, word) rows — a table function
    with a variable number of output rows per input row."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, word_index int, word string")
    class FirstWords:
        def eval(self, doc_id: int, text: str):
            if text is None:
                return
            for i, w in enumerate(text.split(" ")[:5], start=1):
                yield doc_id, i, w

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    d.createOrReplaceTempView("udtf_docs_in")
    spark.udtf.register("first_words", FirstWords)
    return spark.sql(
        "SELECT fw.doc_id, fw.word_index, fw.word "
        "FROM udtf_docs_in, LATERAL first_words(doc_id, text) AS fw"
    )


@query(
    "q_udf_grouped_arrow",
    # min-max scale instead of z-score: the arithmetic is
    # (x - min) / (max - min) on raw doubles — order-free extremes and
    # one IEEE division, so the oracle matches bit-for-bit with no
    # rounding absorber (unlike the pandas twin's mean/std).
    oracle="""
SELECT c_custkey, c_mktsegment,
  (c_acctbal - min(c_acctbal) OVER (PARTITION BY c_mktsegment))
  / (max(c_acctbal) OVER (PARTITION BY c_mktsegment)
     - min(c_acctbal) OVER (PARTITION BY c_mktsegment)) AS scaled
FROM customer
ORDER BY c_custkey
""",
)
def q_udf_grouped_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group map via ``applyInArrow`` (B54's zero-pandas sibling,
    Spark 4): min-max scale account balance within each market segment,
    operating directly on ``pyarrow.Table`` batches.

    Why this exists next to applyInPandas: the pandas bridge pays an
    Arrow→pandas→Arrow conversion per group (index materialization,
    dtype coercion, BlockManager copies); applyInArrow hands the
    group's Arrow buffers to pyarrow.compute kernels directly — for
    numeric transforms the pandas layer is pure overhead. Same
    group-fits-in-memory bound as the pandas form. Extremes are
    order-free and the scale is one IEEE division, so the result
    hash-matches the window-function oracle exactly.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    def scale(tbl: pa.Table) -> pa.Table:
        bal = tbl.column("c_acctbal")
        mn = pc.min(bal)
        mx = pc.max(bal)
        rng = pc.subtract(mx, mn)
        return pa.table(
            {
                "c_custkey": tbl.column("c_custkey"),
                "c_mktsegment": tbl.column("c_mktsegment"),
                "scaled": pc.divide(pc.subtract(bal, mn), rng),
            }
        )

    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_mktsegment")
        .applyInArrow(
            scale, schema="c_custkey long, c_mktsegment string, scaled double"
        )
        .orderBy("c_custkey")
    )


@query(
    "q_udf_cogroup",
    # Full-outer semantics: cogroup emits every key present on EITHER
    # side (a user with events but no orders still gets a row, and vice
    # versa). Per-key sums are rounded to 2 decimals on both engines —
    # the true sums sit on the cent grid (few rows per key), so rounding
    # snaps both engines to the same grid point and summation order
    # cannot show through.
    oracle="""
WITH e AS (
  SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS event_value
  FROM events GROUP BY 1
),
o AS (
  SELECT o_custkey AS user_id, count(*) AS n_orders,
         round(sum(o_totalprice), 2) AS order_value
  FROM orders GROUP BY 1
)
SELECT COALESCE(e.user_id, o.user_id) AS user_id,
       CAST(COALESCE(e.n_events, 0) AS BIGINT) AS n_events,
       CAST(COALESCE(o.n_orders, 0) AS BIGINT) AS n_orders,
       COALESCE(e.event_value, 0.0) AS event_value,
       COALESCE(o.order_value, 0.0) AS order_value,
       COALESCE(e.n_events, 0) > 0 AND COALESCE(o.n_orders, 0) > 0
         AS engaged_buyer
FROM e FULL OUTER JOIN o ON e.user_id = o.user_id
ORDER BY user_id
""",
)
def q_udf_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided grouped map via ``cogroup().applyInPandas`` (the one
    major pandas-bridge API beside scalar / grouped-agg / grouped-map /
    grouped-Arrow / UDTF): per-user reconciliation of TWO fact sides —
    events vs orders — in one co-partitioned pass.

    Both sides shuffle once on the user key and each key's two pandas
    frames arrive together (either may be empty — full-outer key
    semantics), so arbitrary cross-referencing logic runs without a
    join-then-regroup round trip. Same group-fits-in-memory bound as
    applyInPandas; at 100 TB the key partitioning is the co-location —
    no second shuffle, no broadcast. The oracle is the equivalent
    aggregate-then-FULL-OUTER-JOIN SQL, which is also the built-in plan
    a user should prefer when the per-key logic IS expressible
    relationally (this entry proves the escape hatch's plumbing).
    """

    def recon(key, ev: pd.DataFrame, od: pd.DataFrame) -> pd.DataFrame:
        n_ev, n_od = len(ev), len(od)
        return pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n_ev],
                "n_orders": [n_od],
                "event_value": [round(float(ev["value"].sum()), 2) if n_ev else 0.0],
                "order_value": [
                    round(float(od["o_totalprice"].sum()), 2) if n_od else 0.0
                ],
                "engaged_buyer": [n_ev > 0 and n_od > 0],
            }
        )

    # Explicit hash repartition on the group key BEFORE cogroup: AQE's
    # byte-based coalescing sees a few MB of shuffle data and folds the
    # cogroup exchange to ~3 partitions — but the downstream cost is
    # per-GROUP Python invocations (tens of thousands of tiny pandas
    # frames), which bytes do not predict. A user-specified repartition
    # is exempt from AQE coalescing and keeps the pandas stage at CPU
    # parallelism (measured 12s → ~1.5s warm at sf0.1 on local[32]).
    # At real scale the shuffle is large enough that AQE sizes it
    # correctly and this pre-partitioning is simply reused by cogroup
    # (same key, no second exchange).
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "value")
        .repartition(n_part, "user_id")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_totalprice")
        .repartition(n_part, "o_custkey")
    )
    return (
        e.groupBy("user_id")
        .cogroup(o.groupBy("o_custkey"))
        .applyInPandas(
            recon,
            schema=(
                "user_id long, n_events long, n_orders long, "
                "event_value double, order_value double, engaged_buyer boolean"
            ),
        )
        .orderBy("user_id")
    )
