"""Round-9 consolidation gates: the fold-proof constant-partition
device, null-safe dist_cumsum groups, and the hardened env parse
(r8 VERDICT #1 + ADVICE items)."""

from __future__ import annotations

import os

from pyspark.sql import Window as W, functions as F

from asyncdatapipeline_spark.operators._util import (
    bounded_part,
    dist_cumsum,
    exact_window_ok,
)
from asyncdatapipeline_spark.plans.audit import unpartitioned_windows


def test_bounded_part_survives_catalyst_on_nonnullable(spark):
    """`col * 0` constant-folds when col is a non-nullable count(*)
    (the q_ts_runs_test regression); bounded_part must NOT — the
    optimized plan's Window keeps a non-foldable partition key for
    both a non-nullable count and a nullable when()-column."""
    base = spark.range(100).groupBy((F.col("id") % 5).alias("g")).agg(
        F.count(F.lit(1)).alias("c")
    )
    # non-nullable count
    out = base.select(
        "g",
        F.lag("c").over(
            W.partitionBy(bounded_part(F.col("c"))).orderBy("g")
        ).alias("p"),
    )
    assert unpartitioned_windows(out) == []
    # the folded form, as a canary that the scan itself still detects it
    folded = base.select(
        "g",
        F.lag("c").over(W.partitionBy(F.col("c") * 0).orderBy("g")).alias("p"),
    )
    assert unpartitioned_windows(folded), "scan failed to flag folded c*0"
    # nullable signed column
    s = base.select("g", F.when(F.col("c") > 1, F.col("c") - 25).alias("s"))
    out2 = s.select(
        "g",
        F.lag("s").over(
            W.partitionBy(bounded_part(F.col("s"))).orderBy("g")
        ).alias("p"),
    )
    assert unpartitioned_windows(out2) == []


def test_bounded_part_keeps_all_rows_in_one_partition(spark):
    """bounded_part evaluates to 0 for negative, zero, positive and
    NULL inputs — the lag chain must be unbroken across all of them."""
    df = spark.createDataFrame(
        [(1, -5.0), (2, 0.0), (3, 7.5), (4, None)], "i long, v double"
    )
    got = (
        df.select(
            "i",
            F.lag("i").over(
                W.partitionBy(bounded_part(F.col("v"))).orderBy("i")
            ).alias("p"),
        )
        .orderBy("i")
        .collect()
    )
    assert [r["p"] for r in got] == [None, 1, 2, 3]


def test_dist_cumsum_null_group_rows_survive(spark):
    """ADVICE r8 (medium): part_cols joins must be null-safe — rows
    whose partition-key value is NULL are a real group and must
    neither vanish nor miscount."""
    rows = [
        (1, "a", 10.0),
        (2, "a", 20.0),
        (3, None, 5.0),
        (4, None, 15.0),
        (5, "b", 1.0),
    ]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    got = dist_cumsum(
        df.withColumn("one", F.lit(1)),
        "v",
        ["one"],
        nparts=4,
        part_cols=["g"],
        tiebreak=["id"],
    )
    assert got.count() == 5, "NULL-group rows were dropped"
    ref = df.withColumn("one", F.lit(1)).select(
        "id",
        F.sum("one")
        .over(
            W.partitionBy("g")
            .orderBy("v", "id")
            .rowsBetween(W.unboundedPreceding, 0)
        )
        .alias("r"),
    )
    bad = (
        got.join(ref, "id")
        .filter(F.col("cum_one") != F.col("r"))
        .count()
    )
    assert bad == 0


def test_exact_window_ok_malformed_env(spark):
    """ADVICE r8: an empty or non-numeric SPARK_GRAFT_EXACT_WINDOW_MAX
    must fall back to the default, not raise."""
    df = spark.range(10)
    key = "SPARK_GRAFT_EXACT_WINDOW_MAX"
    old = os.environ.get(key)
    try:
        for bad in ("", "abc", "5.5"):
            os.environ[key] = bad
            assert exact_window_ok(df) is True  # default cap = 5M
        os.environ[key] = "0"
        assert exact_window_ok(df) is False
        os.environ[key] = "5"
        assert exact_window_ok(df) is False
    finally:
        if old is None:
            os.environ.pop(key, None)
        else:
            os.environ[key] = old
