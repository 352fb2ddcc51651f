"""Dataset profiling operator (SURVEY.md §2B B69).

A curation pipeline's first pass over a new 100 TB drop is always a
profile: per-column null fractions, cardinalities, ranges. The
reference leaves this to user callbacks; the engine exposes it as one
aggregation.

Scale doctrine: ONE scan, one agg row, driver-side pivot to the
per-column report — the report is O(columns), never O(rows). The
exact `count(DISTINCT col)` per column triggers Catalyst's Expand
(input × #distinct-aggs before the shuffle); that is the right
correctness baseline at test SF, and the in-code switch for 100 TB is
`approx_count_distinct` (HLL, no Expand, one pass) — same report
shape, documented drift bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from asyncdatapipeline_spark.registry import query
from asyncdatapipeline_spark.sources.tables import load_table

DEC = "decimal(28,6)"

_PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def _oracle() -> str:
    metrics = ", ".join(
        f"count({c}) AS c_{c}, count(DISTINCT {c}) AS d_{c}, "
        f"min({c}) AS mn_{c}, max({c}) AS mx_{c}, "
        f"CAST(sum(CAST({c} AS DECIMAL(28,6))) AS DOUBLE) AS sm_{c}"
        for c in _PROFILE_COLS
    )
    rows = "\nUNION ALL\n".join(
        f"SELECT '{c}' AS column_name, n AS n_rows, n - c_{c} AS n_null, "
        f"d_{c} AS n_distinct, mn_{c} AS min_val, mx_{c} AS max_val, "
        f"sm_{c} / c_{c} AS mean_val FROM s"
        for c in _PROFILE_COLS
    )
    return f"WITH s AS (SELECT count(*) AS n, {metrics} FROM lineitem)\n{rows}"


@query("q_profile", oracle=_oracle())
def q_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of lineitem's measure columns: row count, nulls,
    exact distinct count, min/max, mean (B69).

    One aggregation computes every metric for every column (single scan,
    single agg row); `inline` of a literal struct array pivots the wide
    row into the per-column report — the pivot touches one row, so the
    report step is free at any scale. Means are summed in exact decimal
    and divided in double (the engine-stable pattern — see
    operators/timeseries.py).
    """
    li = load_table(spark, sf_dir, "lineitem")
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in _PROFILE_COLS:
        aggs += [
            F.count(c).alias(f"c_{c}"),
            F.countDistinct(c).alias(f"d_{c}"),
            F.min(c).alias(f"mn_{c}"),
            F.max(c).alias(f"mx_{c}"),
            F.sum(F.col(c).cast(DEC)).cast("double").alias(f"sm_{c}"),
        ]
    wide = li.agg(*aggs)
    report_structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("n").alias("n_rows"),
                (F.col("n") - F.col(f"c_{c}")).alias("n_null"),
                F.col(f"d_{c}").alias("n_distinct"),
                F.col(f"mn_{c}").alias("min_val"),
                F.col(f"mx_{c}").alias("max_val"),
                (F.col(f"sm_{c}") / F.col(f"c_{c}")).alias("mean_val"),
            )
            for c in _PROFILE_COLS
        ]
    )
    return wide.select(F.inline(report_structs))
