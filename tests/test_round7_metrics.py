"""Planted-fixture semantic tests for the round-7 eval/stats operators:
q_eval_auc / q_eval_confusion / q_eval_calibration and q_agg_kendall /
q_agg_chisq_gof / q_agg_levene. Each plants inputs whose statistic is
hand-computable and asserts the exact value."""

from __future__ import annotations

from pyspark.sql import functions as F

from asyncdatapipeline_spark import registry


def _write_events(spark, out, rows):
    """rows: (event_id, ts_str, user_id, event_type, value)"""
    spark.createDataFrame(
        [(i, t, u, ty, v, "{}") for i, t, u, ty, v in rows],
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


def _scored_events(n_pos, n_neg, pos_vals, neg_vals):
    rows = []
    for i in range(n_pos):
        rows.append((i, "2024-01-01 00:00:00", 1, "purchase", pos_vals[i]))
    for i in range(n_neg):
        rows.append(
            (10_000 + i, "2024-01-01 01:00:00", 2, "view", neg_vals[i])
        )
    return rows


def _write_lineitem_xy2(spark, out, pairs):
    """Minimal lineitem with (l_quantity, l_discount) = pairs."""
    spark.createDataFrame(
        [(float(x), float(y)) for x, y in pairs],
        "l_quantity double, l_discount double",
    ).select(
        "l_quantity",
        F.lit(100.0).alias("l_extendedprice"),
        "l_discount",
        F.lit(0.02).alias("l_tax"),
        F.lit("N").alias("l_returnflag"),
        F.lit("O").alias("l_linestatus"),
    ).write.mode("overwrite").parquet(str(out / "lineitem.parquet"))


def test_auc_perfect_separation(spark, tmp_path_factory):
    """Every positive outranks every negative: AUC = 1 exactly."""
    out = tmp_path_factory.mktemp("auc1")
    rows = _scored_events(
        50, 50, [100.0 + i for i in range(50)], [float(i) for i in range(50)]
    )
    _write_events(spark, out, rows)
    r = registry.get("q_eval_auc").fn(spark, str(out)).collect()[0]
    assert (r["n_pos"], r["n_neg"]) == (50, 50)
    assert r["auc"] == 1.0 and r["auc_flipped"] == 0.0


def test_auc_all_tied_is_half(spark, tmp_path_factory):
    """A constant score carries no ranking signal: midrank ties give
    AUC exactly 0.5 (a competition-rank implementation would not)."""
    out = tmp_path_factory.mktemp("auc5")
    rows = _scored_events(30, 70, [42.0] * 30, [42.0] * 70)
    _write_events(spark, out, rows)
    r = registry.get("q_eval_auc").fn(spark, str(out)).collect()[0]
    assert r["auc"] == 0.5


def test_confusion_planted_counts(spark, tmp_path_factory):
    """10 TP, 5 FP, 20 FN, 65 TN planted via scores across the fixed
    threshold of 50."""
    rows = []
    rows += _scored_events(10, 0, [90.0] * 10, [])  # TP
    rows = rows + [
        (200 + i, "2024-01-01 00:00:00", 3, "view", 80.0) for i in range(5)
    ]  # FP
    rows = rows + [
        (300 + i, "2024-01-01 00:00:00", 4, "purchase", 10.0)
        for i in range(20)
    ]  # FN
    rows = rows + [
        (400 + i, "2024-01-01 00:00:00", 5, "view", 20.0) for i in range(65)
    ]  # TN
    out = tmp_path_factory.mktemp("conf")
    _write_events(spark, out, rows)
    r = registry.get("q_eval_confusion").fn(spark, str(out)).collect()[0]
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (10, 5, 20, 65)
    assert r["accuracy"] == 0.75
    assert r["precision_"] == round(10 / 15, 6)
    assert r["recall"] == round(10 / 30, 6)
    assert r["f1"] == round(20 / 45, 6)


def test_calibration_perfect_ends(spark, tmp_path_factory):
    """Scores of 100 that are all positive and scores of 0 that are all
    negative: the two occupied bins are perfectly calibrated (gap 0)
    and 100 lands in the closed top bin 9, not an eleventh bin."""
    out = tmp_path_factory.mktemp("cal")
    rows = _scored_events(40, 60, [100.0] * 40, [0.0] * 60)
    _write_events(spark, out, rows)
    rs = registry.get("q_eval_calibration").fn(spark, str(out)).collect()
    assert [r["bin"] for r in rs] == [0, 9]
    by = {r["bin"]: r for r in rs}
    assert by[9]["n"] == 40 and by[9]["gap"] == 0.0
    assert by[0]["n"] == 60 and by[0]["gap"] == 0.0
    assert by[9]["confidence"] == 1.0 and by[9]["accuracy"] == 1.0


def test_kendall_perfect_and_reversed(spark, tmp_path_factory):
    """y = x gives tau_b = 1; y = -x gives -1 (no ties either way)."""
    out = tmp_path_factory.mktemp("kt")
    _write_lineitem_xy2(spark, out, [(i, i) for i in range(1, 21)])
    r = registry.get("q_agg_kendall").fn(spark, str(out)).collect()[0]
    assert r["n"] == 20 and r["kendall_tau_b"] == 1.0
    _write_lineitem_xy2(spark, out, [(i, -i) for i in range(1, 21)])
    r = registry.get("q_agg_kendall").fn(spark, str(out)).collect()[0]
    assert r["kendall_tau_b"] == -1.0


def test_kendall_ties_shrink_tau(spark, tmp_path_factory):
    """x = {1,1,2,2}, y = {1,2,1,2}: equal concordant/discordant mass
    -> tau_b = 0 even though ties abound."""
    out = tmp_path_factory.mktemp("kt0")
    _write_lineitem_xy2(spark, out, [(1, 1), (1, 2), (2, 1), (2, 2)])
    r = registry.get("q_agg_kendall").fn(spark, str(out)).collect()[0]
    assert r["kendall_tau_b"] == 0.0


def test_chisq_gof_exact_uniform_is_zero(spark, tmp_path_factory):
    """Each level 1..50 exactly 4 times: chi2 = 0, no rejection."""
    out = tmp_path_factory.mktemp("gof")
    pairs = [(q, 0.05) for q in range(1, 51) for _ in range(4)]
    _write_lineitem_xy2(spark, out, pairs)
    r = registry.get("q_agg_chisq_gof").fn(spark, str(out)).collect()[0]
    assert r["n"] == 200 and r["k_observed"] == 50
    assert r["chi2"] == 0.0 and not r["reject_uniform"]


def test_chisq_gof_point_mass_rejects(spark, tmp_path_factory):
    """All mass on one level: chi2 = n*(k-1) = 49n, far past the
    critical value."""
    out = tmp_path_factory.mktemp("gof1")
    _write_lineitem_xy2(spark, out, [(7, 0.05)] * 100)
    r = registry.get("q_agg_chisq_gof").fn(spark, str(out)).collect()[0]
    assert r["chi2"] == 4900.0 and r["reject_uniform"]


def test_levene_identical_groups_w_zero(spark, tmp_path_factory):
    """Two groups with identical value multisets: between-group spread
    of |x - median| is 0, so W = 0."""
    out = tmp_path_factory.mktemp("lev0")
    vals = [10.0, 20.0, 30.0, 40.0, 50.0]
    rows = []
    for i, v in enumerate(vals):
        rows.append((i, "2024-01-01 00:00:00", 1, "purchase", v))
        rows.append((100 + i, "2024-01-01 00:00:00", 2, "view", v))
    _write_events(spark, out, rows)
    r = registry.get("q_agg_levene").fn(spark, str(out)).collect()[0]
    assert r["n"] == 10 and r["k"] == 2
    assert r["levene_w"] == 0.0 and not r["unequal_spread"]


def test_levene_detects_unequal_spread(spark, tmp_path_factory):
    """Group A tightly packed, group B spread wide: W must exceed the
    threshold."""
    out = tmp_path_factory.mktemp("lev1")
    rows = []
    for i in range(20):
        rows.append((i, "2024-01-01 00:00:00", 1, "purchase", 50.0))
        rows.append(
            (100 + i, "2024-01-01 00:00:00", 2, "view", float(i * 10))
        )
    _write_events(spark, out, rows)
    r = registry.get("q_agg_levene").fn(spark, str(out)).collect()[0]
    assert r["levene_w"] > 2.372 and r["unequal_spread"]
