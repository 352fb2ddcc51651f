"""Planted-fixture tests for the round-7 experimentation-stats batch:
Benjamini-Hochberg FDR (q_events_bh_fdr), the delta-method ratio-metric
CI (q_events_ratio_ci), and Neyman-optimal allocation (q_sample_neyman).

Arms are md5(user_id)-derived exactly like the engine's split device, so
the tests pre-compute each planted user's arm with hashlib and place
effects on KNOWN arms — the assertions are hand-computable."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from asyncdatapipeline_spark import registry


def _arm(uid: int) -> int:
    return int(hashlib.md5(str(uid).encode()).hexdigest()[:2], 16) % 2


def _users_by_arm(n_each: int):
    a, b, uid = [], [], 1
    while len(a) < n_each or len(b) < n_each:
        (a if _arm(uid) == 0 else b)[:0] = (
            [uid] if (len(a) < n_each if _arm(uid) == 0 else len(b) < n_each)
            else []
        )
        uid += 1
    return a, b


def _write_events(spark, out, rows):
    spark.createDataFrame(
        [(i, t, u, ty, v, "{}") for i, (t, u, ty, v) in enumerate(rows)],
        "event_id long, ts_s string, user_id long, event_type string,"
        " value double, props string",
    ).select(
        "event_id",
        F.col("ts_s").cast("timestamp").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    ).write.mode("overwrite").parquet(str(out / "events.parquet"))


def test_bh_fdr_discovers_only_the_planted_effect(spark, tmp_path_factory):
    """Three guardrail metrics; only 'exp' carries a real arm shift
    (arm0 ~1000-scale, arm1 ~0-scale, small within-arm jitter so the
    variance is positive). BH at q=0.10 must rank 'exp' first and
    discover it; the two null metrics draw identical distributions in
    both arms (zero mean difference) and must NOT be discovered."""
    out = tmp_path_factory.mktemp("bh7")
    arm0, arm1 = _users_by_arm(20)
    rows = []
    ts = "2024-03-01 00:00:00"
    for i, u in enumerate(arm0):
        rows.append((ts, u, "exp", 1000.0 + (i % 5)))
        rows.append((ts, u, "null_a", 10.0 + (i % 5)))
        rows.append((ts, u, "null_b", 20.0 + (i % 7)))
    for i, u in enumerate(arm1):
        rows.append((ts, u, "exp", 0.0 + (i % 5)))
        rows.append((ts, u, "null_a", 10.0 + (i % 5)))
        rows.append((ts, u, "null_b", 20.0 + (i % 7)))
    _write_events(spark, out, rows)
    got = {
        r["event_type"]: r
        for r in registry.get("q_events_bh_fdr").fn(spark, str(out)).collect()
    }
    assert set(got) == {"exp", "null_a", "null_b"}
    exp = got["exp"]
    assert exp["p_rank"] == 1 and bool(exp["discovery"])
    assert exp["p_value"] < 1e-6
    # identical arm distributions => |z| == 0 exactly => p == 1
    for k in ("null_a", "null_b"):
        assert got[k]["p_value"] > 0.99 and not bool(got[k]["discovery"])
    # BH threshold ladder: rank i of m=3 at q=0.10 -> i/30 (6dp emit)
    assert abs(exp["bh_threshold"] - 1 / 30) <= 5e-7


def test_ratio_ci_exact_on_zero_variance_arms(spark, tmp_path_factory):
    """Every arm-0 user contributes x=20 over y=4 events and every
    arm-1 user x=6 over y=3: zero between-user variance, so the delta
    method must emit se = 0 and a point CI at the exact ratios 5 and
    2."""
    out = tmp_path_factory.mktemp("rci7")
    arm0, arm1 = _users_by_arm(8)
    ts = "2024-03-01 00:00:00"
    rows = []
    for u in arm0:
        rows += [
            (ts, u, "purchase", 10.0),
            (ts, u, "purchase", 10.0),
            (ts, u, "view", 1.0),
            (ts, u, "click", 1.0),
        ]
    for u in arm1:
        rows += [
            (ts, u, "purchase", 6.0),
            (ts, u, "view", 1.0),
            (ts, u, "click", 1.0),
        ]
    _write_events(spark, out, rows)
    got = {
        r["arm"]: r
        for r in registry.get("q_events_ratio_ci")
        .fn(spark, str(out))
        .collect()
    }
    assert got[0]["n"] == 8 and got[1]["n"] == 8
    assert got[0]["ratio"] == 5.0 and got[0]["se"] == 0.0
    assert (got[0]["ci_lo"], got[0]["ci_hi"]) == (5.0, 5.0)
    assert got[1]["ratio"] == 2.0 and got[1]["se"] == 0.0
    assert (got[1]["ci_lo"], got[1]["ci_hi"]) == (2.0, 2.0)


def test_neyman_puts_all_budget_on_the_varying_stratum(
    spark, tmp_path_factory
):
    """Stratum A is constant (S_A = 0: sampling it teaches nothing) and
    stratum B alternates 0/200 (S_B = 100 exactly): Neyman allocates
    the ENTIRE budget to B, proportional would split 50/50, and the
    variance ratio is (W_B S_B)^2 / (W_B S_B^2) = 0.5."""
    out = tmp_path_factory.mktemp("ney7")
    rows = [("A", 100.0)] * 10 + [("B", 0.0), ("B", 200.0)] * 5
    spark.createDataFrame(
        rows, "l_returnflag string, l_extendedprice double"
    ).select(
        "l_returnflag",
        "l_extendedprice",
        F.lit(1.0).alias("l_quantity"),
        F.lit("O").alias("l_linestatus"),
    ).write.mode("overwrite").parquet(str(out / "lineitem.parquet"))
    got = {
        r["stratum"]: r
        for r in registry.get("q_sample_neyman").fn(spark, str(out)).collect()
    }
    a, b = got["A"], got["B"]
    assert (a["n_h"], b["n_h"]) == (10, 10)
    assert a["sd_h"] == 0.0 and b["sd_h"] == 100.0
    assert a["neyman_share"] == 0.0 and b["neyman_share"] == 1.0
    assert a["prop_share"] == 0.5 and b["prop_share"] == 0.5
    assert a["n_neyman"] == 0.0 and b["n_neyman"] == 10000.0
    assert a["variance_ratio"] == 0.5 and b["variance_ratio"] == 0.5
