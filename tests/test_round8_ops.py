"""Round-8 scale-gate tests.

Round 8's theme: the exact-window family (q_rfm's ntile trio,
q_rfm_migration's per-period ntile, q_text_zipf's vocab rank, the
q_orders_abc_xyz / q_win_pareto cumulative sorts) now GATES its
single-partition exact window behind ``exact_window_ok`` — above the
row-count cap the DEFAULT path is the distributed ``dist_cumsum`` spine
(+ closed-form ``spark_ntile``). Both paths are exact, so the contract
tested here is strong: forcing the scale path must reproduce the exact
path's rows BIT-FOR-BIT on the real fixture, and the gate itself must
flip on the env cap.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window as W, functions as F

from asyncdatapipeline_spark import registry
from asyncdatapipeline_spark.operators._util import (
    dist_cumsum,
    exact_window_ok,
    spark_ntile,
)

GATED = [
    "q_rfm",
    "q_rfm_migration",
    "q_orders_abc_xyz",
    "q_win_pareto",
    "q_text_zipf",
]


def _rows(df):
    cols = sorted(df.columns)
    return sorted(
        tuple(r[c] for c in cols) for r in df.select(*cols).collect()
    )


@pytest.mark.parametrize("name", GATED)
def test_scale_path_bit_identical_to_exact(name, spark, sf_dir, monkeypatch):
    """The gate is a plan-shape switch, never a semantics switch: the
    dist_cumsum path must reproduce the single-partition exact window's
    output exactly (same rows, same values) on the fixture tables."""
    q = registry.all_queries()[name]
    monkeypatch.delenv("SPARK_GRAFT_EXACT_WINDOW_MAX", raising=False)
    exact = _rows(q(spark, sf_dir))
    monkeypatch.setenv("SPARK_GRAFT_EXACT_WINDOW_MAX", "0")
    scale = _rows(q(spark, sf_dir))
    assert exact == scale


def test_gate_flips_on_cap(spark, sf_dir, monkeypatch):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    monkeypatch.setenv("SPARK_GRAFT_EXACT_WINDOW_MAX", "0")
    assert not exact_window_ok(o)
    monkeypatch.setenv("SPARK_GRAFT_EXACT_WINDOW_MAX", str(10**9))
    assert exact_window_ok(o)
    # 0 forces the scale path even for a 1-row frame
    monkeypatch.setenv("SPARK_GRAFT_EXACT_WINDOW_MAX", "-1")
    assert not exact_window_ok(o)


def test_spark_ntile_matches_builtin_all_sizes(spark):
    """spark_ntile(rank, n, k) must equal F.ntile(k) for every n that
    exercises the remainder split, including n < k."""
    for n in (1, 2, 3, 4, 5, 6, 7, 11, 25, 103):
        df = spark.createDataFrame([(i,) for i in range(1, n + 1)], "r long")
        got = (
            df.select("r", spark_ntile(F.col("r"), F.lit(n), 5).alias("t"))
            .orderBy("r")
            .collect()
        )
        want = (
            df.select(
                "r", F.ntile(5).over(W.orderBy("r")).alias("t")
            )
            .orderBy("r")
            .collect()
        )
        assert [x["t"] for x in got] == [x["t"] for x in want], n


def test_dist_cumsum_grouped_descending_tiebreak(spark):
    """The generalized device (part_cols + descending + tiebreak) must
    match the per-group window running sum exactly, and must actually
    spread each group across >1 bucket."""
    import random

    rng = random.Random(11)
    rows = [
        (i, rng.choice(["a", "b", "c"]), rng.randint(0, 30), float(i % 7))
        for i in range(600)
    ]
    df = spark.createDataFrame(rows, "id long, g string, v long, x double")
    got = dist_cumsum(
        df.withColumn("one", F.lit(1)),
        "v",
        ["one", "x"],
        nparts=8,
        part_cols=["g"],
        tiebreak=["id"],
        descending=True,
    )
    w = (
        W.partitionBy("g")
        .orderBy(F.col("v").desc(), "id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    ref = df.withColumn("one", F.lit(1)).select(
        "id",
        F.sum("one").over(w).alias("r_one"),
        F.sum("x").over(w).alias("r_x"),
    )
    bad = (
        got.join(ref, "id")
        .filter(
            (F.col("cum_one") != F.col("r_one"))
            | (F.abs(F.col("cum_x") - F.col("r_x")) > 1e-9)
        )
        .count()
    )
    assert bad == 0
    # the device must distribute: >1 (group, bucket) cell per group
    n_cells = (
        got.select("g", (F.col("cum_one") - F.lit(0)).alias("_"))
        .groupBy("g")
        .count()
        .count()
    )
    assert n_cells == 3


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


def test_percentile_global_planted_ranks(spark, tmp_path):
    """Values 1..10: p25 = rank ceil(2.5)=3 → 3, p50 → 5, p90 → 9,
    p99 = rank ceil(9.9)=10 → 10 (type-1 discrete selection)."""
    spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(range(1, 11))],
        "o_orderkey long, o_totalprice double",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    r = registry.get("q_agg_percentile_global").fn(
        spark, str(tmp_path)
    ).collect()[0]
    assert (r["n_rows"], r["p25"], r["p50"], r["p90"], r["p99"]) == (
        10, 3.0, 5.0, 9.0, 10.0,
    )
    assert (r["vmin"], r["vmax"]) == (1.0, 10.0)


def test_median_exact_planted_even_and_odd(spark, tmp_path):
    """Group A [1,2,3,4]: lo=2, hi=3, median 2.5; group B [5,7,9]:
    lo=hi=median=7."""
    rows = [("A", 1.0), ("A", 2.0), ("A", 3.0), ("A", 4.0),
            ("B", 5.0), ("B", 7.0), ("B", 9.0)]
    spark.createDataFrame(
        rows, "l_returnflag string, l_quantity double"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    got = {
        r["l_returnflag"]: (r["n"], r["median_lo"], r["median_hi"],
                            r["median"])
        for r in registry.get("q_agg_median_exact").fn(
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {"A": (4, 2.0, 3.0, 2.5), "B": (3, 7.0, 7.0, 7.0)}


def test_anomaly_iqr_planted_fences(spark, tmp_path):
    """Values {-10, 1..12, 100}: Q1 = rank ceil(3.5)=4 → 3, Q3 = rank
    11 → 10, fences [-7.5, 20.5] → exactly one low and one high
    outlier."""
    vals = [-10.0] + [float(v) for v in range(1, 13)] + [100.0]
    rows = [
        (i, "2024-01-01 00:00:00", i, "view", v)
        for i, v in enumerate(vals)
    ]
    _write_events(spark, tmp_path, rows)
    r = registry.get("q_anomaly_iqr").fn(spark, str(tmp_path)).collect()
    assert len(r) == 1 and r[0]["event_type"] == "view"
    assert (r[0]["n"], r[0]["n_low"], r[0]["n_high"]) == (14, 1, 1)
    assert abs(r[0]["outlier_share"] - 2 / 14) < 1e-6


def test_feature_scale_planted_triplet(spark, tmp_path):
    """Values {0,5,10}: minmax = 0/.5/1, pct_rank = 0/.5/1, z = -1/0/1
    (mean 5, sd 5)."""
    rows = [
        (i, "2024-01-01 00:00:00", i, "view", float(v))
        for i, v in enumerate([0, 5, 10])
    ]
    _write_events(spark, tmp_path, rows)
    got = [
        (r["value"], r["z"], r["minmax"], r["pct_rank"])
        for r in registry.get("q_feature_scale").fn(
            spark, str(tmp_path)
        ).collect()
    ]
    assert got == [
        (0.0, -1.0, 0.0, 0.0),
        (5.0, 0.0, 0.5, 0.5),
        (10.0, 1.0, 1.0, 1.0),
    ]


def test_permutation_test_structure(spark, sf_dir):
    """Add-one p-value bounds, n_ge ≤ n_perm, and t_obs must equal the
    directly-computed arm mean difference."""
    r = registry.get("q_agg_permutation_test").fn(spark, sf_dir).collect()[0]
    assert r["n_perm"] == 199
    assert 0 <= r["n_ge"] <= 199
    assert 1 / 200 <= r["p_value"] <= 1.0
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    arm = (
        F.conv(
            F.substring(
                F.md5(F.col("user_id").cast("string").cast("binary")), 1, 2
            ),
            16,
            10,
        ).cast("int")
        % 2
    )
    u = e.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("m")
    ).select(arm.alias("arm"), "m")
    s = u.groupBy("arm").agg(
        F.sum("m").alias("s"), F.count(F.lit(1)).alias("c")
    ).collect()
    by = {x["arm"]: (x["s"], x["c"]) for x in s}
    want = by[0][0] / by[0][1] - by[1][0] / by[1][1]
    assert abs(r["t_obs"] - round(want, 6)) < 1e-9


def test_countmin_never_undercounts_and_exact_top(spark, tmp_path):
    """Planted frequencies 10/5/1: top rows ordered by true count, every
    estimate >= truth (the count-min one-sided guarantee)."""
    rows = []
    i = 0
    for uid, cnt in ((1, 10), (2, 5), (3, 1)):
        for _ in range(cnt):
            rows.append((i, "2024-01-01 00:00:00", uid, "view", 1.0))
            i += 1
    _write_events(spark, tmp_path, rows)
    out = registry.get("q_agg_countmin").fn(spark, str(tmp_path)).collect()
    assert [r["user_id"] for r in out] == [1, 2, 3]
    assert [r["true_cnt"] for r in out] == [10, 5, 1]
    assert all(r["never_undercounts"] for r in out)
    assert all(r["cm_est"] >= r["true_cnt"] for r in out)


def test_ml_knn_planted_separable_clusters(spark, tmp_path):
    """Two orthogonal clusters: every query's 5-NN majority label is its
    own cluster's label → per-class accuracy 1.0."""
    rows = [(0, [1.0, 0.0], 7), (1, [0.0, 1.0], 8)]
    for i in range(5):
        rows.append((20 + i, [1.0, 0.01 * i], 7))
        rows.append((25 + i, [0.01 * i, 1.0], 8))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    got = {
        r["true_label"]: (r["n_queries"], r["n_correct"], r["accuracy"])
        for r in registry.get("q_ml_knn").fn(spark, str(tmp_path)).collect()
    }
    assert got == {7: (1, 1, 1.0), 8: (1, 1, 1.0)}


def test_ml_ridge_planted_exact_line(spark, tmp_path):
    """y = 2x through the origin: λ=0 recovers OLS slope 2, intercept
    0, R² = 1, shrinkage 1; larger λ shrinks the slope toward 0
    monotonically."""
    spark.createDataFrame(
        [(float(x), 2.0 * x) for x in range(1, 6)],
        "l_quantity double, l_extendedprice double",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    rows = registry.get("q_ml_ridge").fn(spark, str(tmp_path)).collect()
    by_lam = {r["lambda"]: r for r in rows}
    assert (
        by_lam[0]["slope"],
        by_lam[0]["intercept"],
        by_lam[0]["r2"],
        by_lam[0]["shrinkage"],
    ) == (2.0, 0.0, 1.0, 1.0)
    slopes = [by_lam[l]["slope"] for l in (0, 1, 10, 100, 1000)]
    assert slopes == sorted(slopes, reverse=True) and slopes[-1] > 0


def test_eval_pr_planted_perfect_separation(spark, tmp_path):
    """Purchases score strictly above views → AP = 1 and precision at
    50% recall = 1."""
    rows = [
        (0, "2024-01-01 00:00:00", 0, "purchase", 10.0),
        (1, "2024-01-01 00:00:00", 1, "purchase", 9.0),
        (2, "2024-01-01 00:00:00", 2, "view", 2.0),
        (3, "2024-01-01 00:00:00", 3, "view", 1.0),
    ]
    _write_events(spark, tmp_path, rows)
    r = registry.get("q_eval_pr").fn(spark, str(tmp_path)).collect()[0]
    assert (r["n_pos"], r["n_neg"]) == (2, 2)
    assert r["average_precision"] == 1.0
    assert r["p_at_r50"] == 1.0


def test_mann_kendall_planted_monotone_series(spark, tmp_path):
    """Daily counts 1..10 strictly increasing: S = 45 (all pairs up),
    no ties, var·18 = 10·9·25 = 2250, z = 44/√125 ≈ 3.935 →
    'increasing'."""
    rows = []
    i = 0
    for day in range(10):
        for _ in range(day + 1):
            rows.append(
                (i, f"2024-01-{day + 1:02d} 12:00:00", i, "view", 1.0)
            )
            i += 1
    _write_events(spark, tmp_path, rows)
    r = registry.get("q_ts_mann_kendall").fn(spark, str(tmp_path)).collect()[0]
    assert (r["n_days"], r["s_stat"], r["var_num18"]) == (10, 45, 2250)
    assert abs(r["z"] - 44 / (2250 / 18) ** 0.5) < 1e-6
    assert r["trend"] == "increasing"


def test_label_prop_planted_two_cliques(spark, tmp_path):
    """Two support-2 triangles seeded at their %5==0 member spread that
    member's brand to the whole clique in one round."""
    baskets = [(1, [10, 11, 12]), (2, [10, 11, 12]),
               (3, [20, 21, 22]), (4, [20, 21, 22])]
    li = [
        (ok, pk) for ok, parts in baskets for pk in parts
    ]
    spark.createDataFrame(
        li, "l_orderkey long, l_partkey long"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    spark.createDataFrame(
        [(10, "BrandA"), (11, "X"), (12, "X"),
         (20, "BrandB"), (21, "X"), (22, "X")],
        "p_partkey long, p_brand string",
    ).write.mode("overwrite").parquet(str(tmp_path / "part.parquet"))
    got = {
        r["label"]: (r["n_nodes"], r["n_seeds"])
        for r in registry.get("q_graph_label_prop").fn(
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {"BrandA": (3, 1), "BrandB": (3, 1)}


def test_pack_shards_planted_start_offset_rule(spark, tmp_path):
    """Sizes 40k/30k/30k into 64 KiB shards: doc 2 STARTS at offset
    40000 (shard 0 — overfills to 70k), doc 3 starts at 70000 →
    shard 1."""
    spark.createDataFrame(
        [(1, 40000), (2, 30000), (3, 30000)],
        "doc_id long, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["shard_id"]: (r["n_docs"], r["bytes"], r["first_doc"],
                        r["last_doc"])
        for r in registry.get("q_pack_shards").fn(
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {0: (2, 70000, 1, 2), 1: (1, 30000, 3, 3)}


def test_newsvendor_planted_fractile(spark, tmp_path):
    """Daily demands {1,2,3,4,5}: the 0.8-fractile is the value at rank
    ceil(4) = 4 → q* = 4, mean 3, safety stock 1."""
    rows = []
    k = 0
    for day in range(1, 6):
        for _ in range(day):
            rows.append((k, f"2024-03-{day:02d}", "P"))
            k += 1
    spark.createDataFrame(
        rows, "o_orderkey long, d string, o_orderpriority string"
    ).select(
        "o_orderkey",
        F.col("d").cast("date").alias("o_orderdate"),
        "o_orderpriority",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    r = registry.get("q_orders_newsvendor").fn(
        spark, str(tmp_path)
    ).collect()
    assert len(r) == 1
    assert (r[0]["n_days"], r[0]["q_star"]) == (5, 4)
    assert (r[0]["mean_demand"], r[0]["safety_stock"]) == (3.0, 1.0)


def test_trimmed_mean_planted_drops_tails(spark, tmp_path):
    """Values 1..20: p05 rank 1 → lo=1, p95 rank 19 → hi=19; kept mean
    (1..19) = 10 vs raw 10.5."""
    spark.createDataFrame(
        [(float(v),) for v in range(1, 21)], "l_extendedprice double"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    r = registry.get("q_agg_trimmed_mean").fn(spark, str(tmp_path)).collect()[0]
    assert (r["n"], r["n_kept"], r["lo"], r["hi"]) == (20, 19, 1.0, 19.0)
    assert (r["trimmed_mean"], r["raw_mean"]) == (10.0, 10.5)


def test_sample_balanced_planted_quota(spark, tmp_path):
    """Classes of size 4 and 2: both keep exactly n_min = 2, and the
    minority class keeps ALL its members."""
    rows = [(i, [1.0], 0) for i in range(4)] + [
        (10, [1.0], 1), (11, [1.0], 1)
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    got = {
        r["label"]: r
        for r in registry.get("q_sample_balanced").fn(
            spark, str(tmp_path)
        ).collect()
    }
    assert (got[0]["n_before"], got[0]["n_kept"], got[0]["kept_ok"]) == (
        4, 2, True,
    )
    assert (got[1]["n_before"], got[1]["n_kept"], got[1]["kept_id_sum"]) == (
        2, 2, 21,
    )


def test_dp_counts_planted_consistency(spark, tmp_path):
    """The seeded Laplace release must be internally consistent
    (dp = true + noise at 6dp), reproducible across runs, and actually
    perturbed (noise nonzero for a generic seed)."""
    rows = [(i, "2024-01-01 00:00:00", i, "view", 1.0) for i in range(10)]
    rows += [(99, "2024-01-01 00:00:00", 99, "purchase", 1.0)]
    _write_events(spark, tmp_path, rows)
    q = registry.get("q_agg_dp_counts").fn
    r1 = {x["event_type"]: x for x in q(spark, str(tmp_path)).collect()}
    r2 = {x["event_type"]: x for x in q(spark, str(tmp_path)).collect()}
    assert r1.keys() == {"view", "purchase"} and r1 == r2
    for x in r1.values():
        assert x["epsilon"] == 1.0
        assert abs(x["dp_count"] - (x["true_cnt"] + x["noise"])) < 1e-6
    assert any(x["noise"] != 0.0 for x in r1.values())


def test_lsh_tuning_monotone_in_rows_per_band(spark, sf_dir):
    """More rows per band → stricter buckets: candidate pairs and
    multi-doc buckets must be non-increasing in r, and thresholds
    must match (1/b)^(1/r)."""
    rows = registry.get("q_dedup_lsh_tuning").fn(spark, sf_dir).collect()
    assert [r["rows_per_band"] for r in rows] == [1, 2, 4]
    assert [r["n_bands"] for r in rows] == [16, 8, 4]
    for r in rows:
        want = round((1.0 / r["n_bands"]) ** (1.0 / r["rows_per_band"]), 6)
        assert r["s_threshold"] == want
    pairs = [r["candidate_pairs"] for r in rows]
    assert pairs[0] >= pairs[1] >= pairs[2]


def test_raking_planted_margins_converge(spark, tmp_path):
    """A 2×2 grid raked to uniform margins: the final (column) scaling
    makes column margins exact; row margins carry IPF's geometric
    residual (<0.2% of mass after 3 rounds on this strongly
    interacting grid), and weight mass is conserved."""
    rows = (
        [("A", "X")] * 10 + [("A", "Y")] * 30
        + [("B", "X")] * 40 + [("B", "Y")] * 20
    )
    spark.createDataFrame(
        rows, "l_returnflag string, l_linestatus string"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    out = registry.get("q_agg_raking").fn(spark, str(tmp_path)).collect()
    w = {(r["l_returnflag"], r["l_linestatus"]): r["raked_weight"]
         for r in out}
    tot = sum(w.values())
    for f_ in ("A", "B"):
        assert abs(w[(f_, "X")] + w[(f_, "Y")] - 50.0) < 0.2
    for s_ in ("X", "Y"):
        assert abs(w[("A", s_)] + w[("B", s_)] - 50.0) < 0.01
    assert abs(tot - 100.0) < 0.02


def test_weighted_median_planted_heavy_tail(spark, tmp_path):
    """Prices 1..4 with quantity weights 1,1,1,7: half of the 10-unit
    mass is only reached at price 4 → weighted median 4 (the
    unweighted median would be 2.5); p05 → 1, p95 → 4."""
    spark.createDataFrame(
        [("A", 1.0, 1.0), ("A", 2.0, 1.0), ("A", 3.0, 1.0),
         ("A", 4.0, 7.0)],
        "l_returnflag string, l_extendedprice double, l_quantity double",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    r = registry.get("q_agg_weighted_median").fn(
        spark, str(tmp_path)
    ).collect()[0]
    assert (r["total_weight"], r["weighted_median"]) == (10.0, 4.0)
    assert (r["weighted_p05"], r["weighted_p95"]) == (1.0, 4.0)


def test_wilcoxon_signed_planted_shift(spark, tmp_path):
    """Four users gain one purchase, one loses one (all |d|=1, shared
    midrank 3): W⁺ = 12, μ = 7.5, tie-corrected σ = √11.25 →
    z ≈ 1.341641, not significant, direction 'increased'."""
    rows = [
        (0, "2024-01-01 00:00:00", 100, "view", 0.0),
        (1, "2024-01-10 00:00:00", 100, "view", 0.0),
    ]
    i = 2
    for uid in (1, 2, 3, 4):
        rows.append((i, "2024-01-09 00:00:00", uid, "purchase", 1.0))
        i += 1
    rows.append((i, "2024-01-02 00:00:00", 5, "purchase", 1.0))
    _write_events(spark, tmp_path, rows)
    r = registry.get("q_agg_wilcoxon_signed").fn(
        spark, str(tmp_path)
    ).collect()[0]
    assert (r["n_pairs"], r["w_plus"]) == (5, 12.0)
    assert abs(r["z"] - 1.341641) < 1e-6
    assert r["significant"] is False and r["direction"] == "increased"


def test_ivf_tuning_frontier_monotone(spark, sf_dir):
    """Recall and scan fraction must be non-decreasing in nprobe, and
    probing all nlist=8 cells IS the brute-force scan: recall 1.0,
    scan_frac 1.0."""
    rows = registry.get("q_sim_ivf_tuning").fn(spark, sf_dir).collect()
    assert [r["nprobe"] for r in rows] == [1, 2, 4, 8]
    rec = [r["recall_at_k"] for r in rows]
    frac = [r["scan_frac"] for r in rows]
    assert rec == sorted(rec) and frac == sorted(frac)
    assert rows[-1]["recall_at_k"] == 1.0
    assert rows[-1]["scan_frac"] == 1.0


def test_tost_planted_equivalence_verdicts(spark, tmp_path):
    """Two types drawn identically around the same mean are equivalent
    (at δ = 0.1·sd TOST needs n ≳ 2·(1.645/0.1)² ≈ 541 per arm — 800
    here, se = 0.05·sd → |t| = 2.0 > 1.645); a type shifted far beyond
    the margin is not."""
    rows = []
    i = 0
    for t, base in (("a", 10.0), ("b", 10.0), ("c", 50.0)):
        for j in range(800):
            rows.append((i, "2024-01-01 00:00:00", i, t,
                         base + (j % 5) * 0.01))
            i += 1
    _write_events(spark, tmp_path, rows)
    got = {
        (r["type_a"], r["type_b"]): r["equivalent"]
        for r in registry.get("q_agg_tost").fn(spark, str(tmp_path)).collect()
    }
    assert got[("a", "b")] is True
    assert got[("a", "c")] is False and got[("b", "c")] is False


def test_sequential_planted_declining_boundary(spark, tmp_path):
    """Users enrolling across 4 distinct days: 4 looks, strictly
    declining boundary ending at 1.96, cumulative enrollment counts
    non-decreasing and summing to all users at the last look."""
    rows = []
    i = 0
    for day in (1, 2, 3, 4):
        for u in range(10):
            uid = day * 100 + u
            rows.append((i, f"2024-01-{day:02d} 10:00:00", uid,
                         "view" if u % 2 else "purchase", 1.0))
            i += 1
    _write_events(spark, tmp_path, rows)
    out = registry.get("q_events_sequential").fn(
        spark, str(tmp_path)
    ).collect()
    assert [r["look"] for r in out] == [1, 2, 3, 4]
    bounds = [r["boundary"] for r in out]
    assert bounds == sorted(bounds, reverse=True)
    assert abs(bounds[-1] - 1.96) < 1e-9
    totals = [r["na"] + r["nb"] for r in out]
    assert totals == sorted(totals) and totals[-1] == 40


def test_novelty_planted_first_claimant(spark, tmp_path):
    """Doc 1 claims its shingles; doc 2 repeats doc 1 verbatim (novelty
    0); doc 3 is half-new (one fresh shingle of two)."""
    docs = [
        (1, "a b c d", "en", "s", 7),     # shingles: "a b c", "b c d"
        (2, "a b c d", "en", "s", 7),     # all seen → 0
        (3, "b c d e", "en", "s", 7),     # "b c d" seen, "c d e" new
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_novel"], r["novelty"])
        for r in registry.get("q_text_novelty").fn(
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {1: (2, 2, 1.0), 2: (2, 0, 0.0), 3: (2, 1, 0.5)}


def test_effect_size_planted_unit_shift(spark, tmp_path):
    """Two arms with sd 1-ish and a 1-unit mean shift: d ≈ 1 →
    'large'; identical arms: d = 0 → 'negligible'."""
    rows = []
    i = 0
    vals = [-1.0, 0.0, 1.0] * 20
    for t, shift in (("a", 0.0), ("b", 0.0), ("c", 4.0)):
        for v in vals:
            rows.append((i, "2024-01-01 00:00:00", i, t, v + shift))
            i += 1
    _write_events(spark, tmp_path, rows)
    got = {
        (r["type_a"], r["type_b"]): (r["cohens_d"], r["magnitude"])
        for r in registry.get("q_agg_effect_size").fn(
            spark, str(tmp_path)
        ).collect()
    }
    assert got[("a", "b")] == (0.0, "negligible")
    d_ac, mag_ac = got[("a", "c")]
    assert mag_ac == "large" and abs(abs(d_ac) - 4 / 0.823387) < 0.01


def test_sample_ess_planted_bounds(spark, tmp_path):
    """Uniform weights → ESS = n (efficiency 1); one dominant weight →
    ESS collapses toward 1."""
    docs = [(i, "x", "en", "u", 1000) for i in range(10)]
    docs += [(100, "x", "en", "v", 100000)] + [
        (101 + i, "x", "en", "v", 100) for i in range(9)
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["source"]: r
        for r in registry.get("q_sample_ess").fn(
            spark, str(tmp_path)
        ).collect()
    }
    assert got["u"]["efficiency"] == 1.0 and got["u"]["ess"] == 10.0
    assert got["v"]["ess"] < 1.1 and got["v"]["ess_le_n"]
    assert all(r["ess_le_n"] for r in got.values())


def test_eoq_planted_closed_form(spark, tmp_path):
    """D=100 over 10 days, S=100, H=2: EOQ = √(2·100·100/2) = 100,
    one replenishment per horizon, 10 days between orders."""
    rows = []
    k = 0
    for day in range(1, 11):
        for _ in range(10):
            rows.append((k, f"2024-02-{day:02d}", "P"))
            k += 1
    spark.createDataFrame(
        rows, "o_orderkey long, d string, o_orderpriority string"
    ).select(
        "o_orderkey",
        F.col("d").cast("date").alias("o_orderdate"),
        "o_orderpriority",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    r = registry.get("q_orders_eoq").fn(spark, str(tmp_path)).collect()[0]
    assert (r["demand"], r["n_days"], r["eoq"]) == (100, 10, 100.0)
    assert (r["n_replenishments"], r["days_between_orders"]) == (1.0, 10.0)


def test_keyness_planted_source_signature(spark, tmp_path):
    """A word used only by source A must top A's keyness list; a word
    shared evenly must rank below it."""
    docs = [
        (1, "zebra zebra zebra common common", "en", "A", 10),
        (2, "common common common filler filler", "en", "B", 10),
        (3, "filler filler common common common", "en", "B", 10),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = registry.get("q_text_keyness").fn(spark, str(tmp_path)).collect()
    top_a = [r for r in out if r["source"] == "A" and r["rnk"] == 1][0]
    assert top_a["word"] == "zebra" and top_a["g2"] > 0
    top_b = [r for r in out if r["source"] == "B" and r["rnk"] == 1][0]
    assert top_b["word"] == "filler"


def test_sql_identifier_matches_literal_query(spark, sf_dir):
    """IDENTIFIER-bound names must resolve to the same result as the
    literal query."""
    got = registry.get("q_sql_identifier").fn(spark, sf_dir).collect()
    want = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("o_orderstatus")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_pacf_planted_ar1_structure(spark, tmp_path):
    """A near-AR(1) daily series (geometric pulse train) must show
    pacf1 = r1 > 0 while |pacf2| collapses well below r2 (the DL
    recursion removing the propagated lag-1 influence)."""
    rows = []
    i = 0
    # counts 8,4,2,1 repeating: strong lag-1 decay
    pattern = [8, 4, 2, 1]
    for day in range(24):
        for _ in range(pattern[day % 4]):
            rows.append((i, f"2024-01-{day + 1:02d} 09:00:00", i,
                         "view", 1.0))
            i += 1
    _write_events(spark, tmp_path, rows)
    r = registry.get("q_ts_pacf").fn(spark, str(tmp_path)).collect()[0]
    assert r["pacf1"] == r["r1"]
    assert r["n_days"] == 24
    for c in ("r1", "r2", "pacf2", "pacf3", "pacf4"):
        assert r[c] is not None


def test_k_anonymity_planted_singleton_cell(spark, tmp_path):
    """One singleton (type, day) cell among 10-user cells: k=2 flags
    exactly that cell and its event share; min_cell_users = 1 fails
    every k."""
    rows = []
    i = 0
    for u in range(10):
        rows.append((i, "2024-01-01 09:00:00", u, "view", 1.0))
        i += 1
    rows.append((i, "2024-01-02 09:00:00", 999, "view", 1.0))
    _write_events(spark, tmp_path, rows)
    got = {r["k"]: r for r in registry.get("q_events_k_anonymity").fn(
        spark, str(tmp_path)).collect()}
    assert got[2]["n_cells"] == 2 and got[2]["n_cells_below"] == 1
    assert abs(got[2]["event_share_at_risk"] - 1 / 11) < 1e-6
    assert got[2]["min_cell_users"] == 1
    assert not any(r["k_anonymous"] for r in got.values())


def test_lorenz_planted_perfect_inequality(spark, tmp_path):
    """One whale among 9 zero-ish customers: the bottom 9 deciles hold
    ~0 share, the top decile completes to 1.0; shares are monotone."""
    rows = [(k, 1.0) for k in range(9)] + [(9, 991.0)]
    spark.createDataFrame(
        rows, "o_custkey long, o_totalprice double"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    out = registry.get("q_agg_lorenz").fn(spark, str(tmp_path)).collect()
    assert [r["decile"] for r in out] == list(range(1, 11))
    shares = [r["cum_share"] for r in out]
    assert shares == sorted(shares) and shares[-1] == 1.0
    assert shares[8] == 0.009  # bottom 90% holds 9/1000
    assert all(r["n_customers"] == 1 for r in out)


def test_fn_crypto_roundtrip_and_digests(spark, sf_dir):
    """Every AES round-trip recovers the plaintext; digests are
    64/32-char hex."""
    out = registry.get("q_fn_crypto").fn(spark, sf_dir).collect()
    assert out and all(r["aes_roundtrip_ok"] for r in out)
    assert all(len(r["name_sha256"]) == 64 for r in out)
    assert all(r["md5_hex_len_ok"] for r in out)


def test_heatmap_planted_known_cells(spark, tmp_path):
    """2024-01-01 is a Monday (dow 1 under the Thursday-anchored
    epoch arithmetic): events at known hours land in exactly those
    cells with exact shares."""
    rows = [
        (0, "2024-01-01 09:30:00", 1, "view", 1.0),
        (1, "2024-01-01 09:45:00", 2, "view", 1.0),
        (2, "2024-01-02 23:10:00", 3, "view", 1.0),
        (3, "2024-01-07 00:05:00", 4, "view", 1.0),  # Sunday → dow 0
    ]
    _write_events(spark, tmp_path, rows)
    got = {
        (r["dow"], r["hour"]): (r["n"], r["share"])
        for r in registry.get("q_events_heatmap").fn(
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {
        (1, 9): (2, 0.5),
        (2, 23): (1, 0.25),
        (0, 0): (1, 0.25),
    }


def test_runs_test_planted_alternating(spark, tmp_path):
    """Perfectly alternating daily counts (5,9,5,9,...) maximize the
    run count: every move is a run boundary → n_runs = n_moves,
    z > 1.96, nonrandom."""
    rows = []
    i = 0
    for day in range(14):
        for _ in (range(5) if day % 2 == 0 else range(9)):
            rows.append((i, f"2024-01-{day + 1:02d} 09:00:00", i,
                         "view", 1.0))
            i += 1
    _write_events(spark, tmp_path, rows)
    r = registry.get("q_ts_runs_test").fn(spark, str(tmp_path)).collect()[0]
    assert (r["n_moves"], r["n_runs"]) == (13, 13)
    assert r["z"] > 1.96 and r["nonrandom"]


def test_ml_threshold_planted_clean_cut(spark, tmp_path):
    """Positives at scores {10,9}, negatives at {2,1}: the F1-optimal
    threshold is 9 (F1=1, precision=recall=1)."""
    rows = [
        (0, "2024-01-01 00:00:00", 0, "purchase", 10.0),
        (1, "2024-01-01 00:00:00", 1, "purchase", 9.0),
        (2, "2024-01-01 00:00:00", 2, "view", 2.0),
        (3, "2024-01-01 00:00:00", 3, "view", 1.0),
    ]
    _write_events(spark, tmp_path, rows)
    r = registry.get("q_ml_threshold").fn(spark, str(tmp_path)).collect()[0]
    assert (r["threshold"], r["f1"]) == (9.0, 1.0)
    assert (r["precision_"], r["recall"]) == (1.0, 1.0)


def test_overlap_planted_containment(spark, tmp_path):
    """Type b's 2 users are a subset of type a's 4: jaccard = 0.5,
    containment = 1.0."""
    rows = []
    i = 0
    for u in range(4):
        rows.append((i, "2024-01-01 00:00:00", u, "a", 1.0)); i += 1
    for u in (0, 1):
        rows.append((i, "2024-01-01 00:00:00", u, "b", 1.0)); i += 1
    _write_events(spark, tmp_path, rows)
    r = registry.get("q_events_overlap").fn(spark, str(tmp_path)).collect()
    assert len(r) == 1
    x = r[0]
    assert (x["type_a"], x["type_b"], x["n_a"], x["n_b"], x["n_both"]) == (
        "a", "b", 4, 2, 2,
    )
    assert (x["jaccard"], x["containment"]) == (0.5, 1.0)


def test_bootstrap_diff_structure(spark, sf_dir):
    """CI must bracket the observed diff (Poisson resampling is
    centered on it), lo ≤ hi, 32 replicates retained on the real
    fixture, and the run is deterministic."""
    q = registry.get("q_agg_bootstrap_diff").fn
    r1 = q(spark, sf_dir).collect()[0]
    r2 = q(spark, sf_dir).collect()[0]
    assert tuple(r1) == tuple(r2)
    assert r1["n_reps"] == 32
    assert r1["ci_lo"] <= r1["diff_obs"] <= r1["ci_hi"]


def test_rate_ci_planted_brackets_rate(spark, tmp_path):
    """k=100 events over 10 days: rate 10/day; Byar CI must bracket it
    and sit near the exact Poisson interval (~[8.14, 12.17]/day)."""
    rows = []
    i = 0
    for day in range(1, 11):
        for _ in range(10):
            rows.append((i, f"2024-01-{day:02d} 12:00:00", i, "view", 1.0))
            i += 1
    _write_events(spark, tmp_path, rows)
    r = registry.get("q_ts_rate_ci").fn(spark, str(tmp_path)).collect()[0]
    assert (r["n_events"], r["n_days"], r["rate_per_day"]) == (100, 10, 10.0)
    assert r["ci_lo"] < 10.0 < r["ci_hi"]
    assert abs(r["ci_lo"] - 8.136) < 0.05 and abs(r["ci_hi"] - 12.17) < 0.05


def test_streaming_cdc_kill_mid_batch_keeps_prior_state(spark, tmp_path):
    """Kill-mid-batch for the STREAMING CDC state store: after a crash
    that leaves a half-written (uncommitted) generation in the state
    path, readers must still see the last committed state, and the
    restarted stream must converge to the full batch answer and GC the
    wreck — the round-7 protocol proof lifted to the foreachBatch
    driver that actually uses it."""
    from asyncdatapipeline_spark import registry
    from asyncdatapipeline_spark.operators.cdc import cdc_feed
    from asyncdatapipeline_spark.sources import generations as G
    from asyncdatapipeline_spark.streaming.curation import (
        read_cdc_state,
        start_cdc_apply_stream,
    )

    sf = "/root/testdata/sf0.001"
    feed = cdc_feed(spark, sf)
    a, b = feed.randomSplit([0.5, 0.5], seed=13)
    src = str(tmp_path / "feed")
    a.coalesce(1).write.mode("overwrite").parquet(src)

    schema = spark.read.parquet(src).schema
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    def run_stream():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = start_cdc_apply_stream(stream, state, ckpt)
        q.processAllAvailable()
        q.stop()
        q.awaitTermination(60)

    run_stream()
    committed = G.latest_generation(spark, state)
    assert committed is not None
    prior = {
        tuple(r) for r in read_cdc_state(spark, state).collect()
    }

    # the crash: a next-generation write that dies before _COMMITTED
    wreck = G.next_generation_dir(spark, state)
    spark.range(17).write.parquet(wreck)
    assert G.latest_generation(spark, state) == committed
    assert {
        tuple(r) for r in read_cdc_state(spark, state).collect()
    } == prior

    # recovery: the rest of the feed arrives; the restarted stream
    # commits over the wreck and the final state equals the batch op
    b.coalesce(1).write.mode("append").parquet(src)
    run_stream()
    streamed = {
        (
            r["k"],
            float(r["price"]) if r["price"] is not None else None,
            r["status"],
            r["seq"],
        )
        for r in read_cdc_state(spark, state)
        .filter(F.col("op") != "D")
        .collect()
    }
    batch = {
        (r["o_orderkey"], r["price"], r["status"], r["applied_seq"])
        for r in registry.get("q_cdc_apply").fn(spark, sf).collect()
    }
    assert streamed == batch
    wreck_num = int(wreck.rstrip("/").rsplit("gen-", 1)[1])
    nums = [n for n, _, _ in G.list_generations(spark, state)]
    assert wreck_num not in nums, "crashed generation must be GC'd"


def test_rfm_scale_plan_has_no_global_sort_window(spark, sf_dir, monkeypatch):
    """Above the gate, q_rfm's plan must not contain an unpartitioned
    (or constant-partitioned) window over the customer frame: every
    Window's partition spec includes the dist_cumsum bucket id."""
    monkeypatch.setenv("SPARK_GRAFT_EXACT_WINDOW_MAX", "0")
    plan = (
        registry.all_queries()["q_rfm"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for line in plan.splitlines():
        if "Window [" in line or line.strip().startswith("Window "):
            assert "_pid" in line, line
