"""Planted-case gates for the round-9 closing-batch operators: the
DeLong CI's agreement with the exact midrank AUC, conformal coverage on
an untouched fold, the out-of-order audit against a planted late event,
the debouncer against a planted flap, and the fixity audit's planted
corruption rule.

The oracle sweep pins values against DuckDB; these pin SEMANTICS
against hand-computable fixtures and cross-operator invariants.
"""

from __future__ import annotations

import math
import os
import tempfile

from pyspark.sql import functions as F

from asyncdatapipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_auc_ci_point_estimate_matches_eval_auc(spark, sf_dir):
    """DeLong's mean(V10) must equal the exact midrank AUC the suite
    already verifies (two independent derivations of one number)."""
    ci = registry.get("q_eval_auc_ci").fn(spark, sf_dir).collect()[0]
    auc_rows = registry.get("q_eval_auc").fn(spark, sf_dir).collect()
    auc_col = [c for c in auc_rows[0].asDict() if "auc" in c.lower()]
    point = auc_rows[0][auc_col[0]]
    assert math.isclose(ci.auc, point, abs_tol=2e-6), (ci.auc, point)
    assert ci.ci_lo < ci.auc < ci.ci_hi
    assert ci.se > 0


def test_conformal_radius_covers_untouched_fold(spark, sf_dir):
    """The p90 calibration radius should cover roughly 90% of an
    UNTOUCHED fold's residuals (folds 1-4 train, fold 0 calibrates;
    evaluate coverage on fold 1 — trained-on, so coverage can only be
    biased HIGH, which still bounds the sanity check from below at a
    loose 80%)."""
    r = registry.get("q_ml_conformal").fn(spark, sf_dir).collect()[0]
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").selectExpr(
        "cast(conv(substr(md5(concat(cast(l_orderkey as string), '-', "
        "cast(l_linenumber as string))), 1, 2), 16, 10) as int) % 5 as fold",
        "l_quantity as x",
        "l_extendedprice as y",
    )
    f1 = li.filter("fold = 1").select(
        (
            F.abs(F.col("y") - (F.lit(r.intercept) + F.lit(r.slope) * F.col("x")))
            <= F.lit(r.conformal_radius_p90)
        ).alias("covered")
    )
    cov = f1.agg(F.avg(F.col("covered").cast("double"))).collect()[0][0]
    assert cov >= 0.80, cov
    assert r.pi_width == round(2 * r.conformal_radius_p90, 6)


def test_out_of_order_flags_planted_late_event(spark):
    """One user with arrival order (id 1,2,3) but event times
    (100, 500, 200): exactly one out-of-order arrival, 300s late."""
    out = tempfile.mkdtemp()
    spark.createDataFrame(
        [
            (1, "2024-01-01 00:01:40", 7, "view", 1.0, "{}"),
            (2, "2024-01-01 00:08:20", 7, "view", 1.0, "{}"),
            (3, "2024-01-01 00:03:20", 7, "view", 1.0, "{}"),
        ],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts")).write.mode(
        "overwrite"
    ).parquet(os.path.join(out, "events.parquet"))
    r = registry.get("q_events_out_of_order").fn(spark, out).collect()[0]
    assert r.n_events == 3 and r.n_ooo == 1
    assert r.max_lateness_s == 300 and r.p99_lateness_s == 300


def test_debounce_suppresses_planted_flap(spark):
    """Bucketed error states: a 1-bucket flap and a 3-bucket episode →
    raw 2 episodes, debounced 1, suppressed 1. Buckets are 6h; plant
    error-majority hours inside chosen buckets."""
    rows = []
    eid = 0

    def plant(day_hour, n_err, n_ok):
        nonlocal eid
        for i in range(n_err):
            rows.append((eid, f"2024-01-0{day_hour[0]} {day_hour[1]:02d}:00:{i:02d}", 1, "error", 1.0, "{}"))
            eid += 1
        for i in range(n_ok):
            rows.append((eid, f"2024-01-0{day_hour[0]} {day_hour[1]:02d}:10:{i:02d}", 1, "view", 1.0, "{}"))
            eid += 1

    # bucket grid is floor(epoch/21600): day1 00-06h = bucket A, etc.
    plant((1, 1), 9, 1)   # alarm bucket (flap: neighbors quiet)
    plant((1, 7), 1, 9)   # quiet bucket
    plant((1, 13), 9, 1)  # alarm
    plant((1, 19), 9, 1)  # alarm
    plant((2, 1), 9, 1)   # alarm (3-bucket episode with the two above)
    plant((2, 7), 1, 9)   # quiet tail
    out = tempfile.mkdtemp()
    spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts")).write.mode(
        "overwrite"
    ).parquet(os.path.join(out, "events.parquet"))
    r = registry.get("q_ts_debounce").fn(spark, out).collect()[0]
    assert r.raw_alerts == 2, r
    assert r.debounced_alerts == 1 and r.suppressed_flaps == 1, r
    assert r.longest_alert_buckets == 3, r


def test_mm_integrity_flags_exactly_the_planted_objects(spark, sf_dir):
    """Corruption is doc_id % 41 == 0: the audit's per-source mismatch
    totals must equal the fixture's planted counts, and size/checksum
    verdicts must agree (one-byte corruption changes both)."""
    rows = registry.get("q_mm_integrity").fn(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("text").isNotNull()
    )
    planted = {
        r["source"]: r["n"]
        for r in docs.filter(F.col("doc_id") % 41 == 0)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in rows:
        assert r.n_checksum_mismatch == planted.get(r.source, 0), r
        assert r.n_size_mismatch == r.n_checksum_mismatch, r
