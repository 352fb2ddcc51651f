"""Planted-case gates for the round-13 optimization changes:

- ``exact_pct_values(rank_exprs=...)`` — the parity-exact rank mode
  (q_agg_moods_median's grand-median rank n DIV 2 + 1), pinned on the
  exact small-n case that breaks WITHOUT the widened bracket ceiling:
  n = 4 distinct values, upper-median rank 3, where the GK bracket at
  p50 ± 5/acc contains only the rank-2 value.
- the device's new entry contract (ADVICE r12): duplicate tags,
  reserved tag names and reserved ``extra`` aliases raise instead of
  silently dropping/duplicating columns.
- ``basket_pairs`` — the by-construction buffer bound (r12 verdict #5):
  a planted mega-basket (> cap distinct items) contributes no pairs,
  ≤ cap baskets keep exact pair sets, and the physical plan carries the
  rank pre-filter BELOW the set aggregation (the OOM-proof shape).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from asyncdatapipeline_spark.operators._util import exact_pct_values
from asyncdatapipeline_spark.operators.joins import basket_pairs


def test_rank_mode_upper_median_small_n(spark):
    """n=4, values 1..4: upper-median rank n DIV 2 + 1 = 3 → value 3.
    The p50 GK bracket [0.5−5/acc, 0.5+5/acc] around rank 2 cannot
    contain the rank-3 value at n=4; only the small-n widened ceiling
    (exact max off the same sketch) makes the candidate set cover it.
    """
    df = spark.createDataFrame([(float(v),) for v in (1, 2, 3, 4)], "v double")
    row = exact_pct_values(
        df,
        [("med", F.col("v"), 50)],
        rank_exprs={"med": "n DIV 2 + 1"},
    ).collect()[0]
    assert row["n"] == 4 and row["med"] == 3.0


def test_rank_mode_odd_n_matches_p50(spark):
    """Odd n: ceil((n+1)/2) == ceil(n/2) — rank mode and percent mode
    select the same value."""
    df = spark.createDataFrame([(float(v),) for v in (10, 20, 30, 40, 50)], "v double")
    row = exact_pct_values(
        df,
        [("med", F.col("v"), 50), ("p50", F.col("v"), 50)],
        rank_exprs={"med": "n DIV 2 + 1"},
    ).collect()[0]
    assert row["med"] == row["p50"] == 30.0


def test_device_entry_contract_rejects_collisions(spark):
    df = spark.createDataFrame([(1.0,)], "v double")
    with pytest.raises(ValueError, match="duplicate tags"):
        exact_pct_values(df, [("a", F.col("v"), 50), ("a", F.col("v"), 90)])
    with pytest.raises(ValueError, match="reserved name"):
        exact_pct_values(df, [("_b_x", F.col("v"), 50)])
    with pytest.raises(ValueError, match="reserved name"):
        exact_pct_values(df, [("n", F.col("v"), 50)])
    with pytest.raises(ValueError, match="extra aggregates"):
        exact_pct_values(
            df, [("a", F.col("v"), 50)], extra=[F.max("v").alias("n")]
        ).collect()
    with pytest.raises(ValueError, match="rank_exprs for unknown tags"):
        exact_pct_values(
            df, [("a", F.col("v"), 50)], rank_exprs={"b": "n"}
        )


def test_basket_pairs_mega_basket_discarded_and_plan_bounded(spark):
    """One basket with 2·cap distinct items (over-cap → no pairs), one
    with exactly cap (kept, full triangular pair set), one with 2, one
    with 1 (no pairs). Pair sets must match the spec exactly, and the
    plan must rank-filter BEFORE any set aggregation so no aggregation
    buffer ever holds more than cap+1 distinct items."""
    cap = 5
    rows = (
        [(1, i) for i in range(2 * cap)]          # mega-basket: discarded
        + [(2, i) for i in range(cap)]            # exactly cap: kept
        + [(3, 100), (3, 200), (3, 100)]          # dup rows collapse
        + [(4, 7)]                                # singleton: no pairs
    )
    df = spark.createDataFrame(rows, "k long, it long")
    got = {
        (r["u"], r["v"], r["sup"])
        for r in basket_pairs(df, "k", "it", cap=cap).collect()
    }
    want = {
        (a, b, 1) for a in range(cap) for b in range(a + 1, cap)
    } | {(100, 200, 1)}
    assert got == want
    plan = (
        basket_pairs(df, "k", "it", cap=cap)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # dense_rank filter below the collect: the buffer bound's signature
    assert "dense_rank" in plan
