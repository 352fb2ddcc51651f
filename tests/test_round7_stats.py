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


def test_theil_decomposition_on_planted_groups(spark, tmp_path_factory):
    """Group A: four rows of 100 (zero within-inequality); group B: 50
    and 150 (within-Theil = (50·ln0.5 + 150·ln1.5)/200 ≈ 0.130812).
    Both group MEANS equal the global mean, so between-Theil is
    exactly 0 and the whole index is within-group."""
    out = tmp_path_factory.mktemp("theil7")
    rows = [("A", 100.0)] * 4 + [("B", 50.0), ("B", 150.0)]
    spark.createDataFrame(
        rows, "l_returnflag string, l_extendedprice double"
    ).select(
        "l_returnflag",
        "l_extendedprice",
        F.lit(1.0).alias("l_quantity"),
        F.lit("O").alias("l_linestatus"),
    ).write.mode("overwrite").parquet(str(out / "lineitem.parquet"))
    got = {
        r["l_returnflag"]: r
        for r in registry.get("q_agg_theil").fn(spark, str(out)).collect()
    }
    a, b = got["A"], got["B"]
    assert a["theil_within_group"] == 0.0
    assert abs(b["theil_within_group"] - 0.130812) <= 2e-6
    assert a["theil_between"] == 0.0
    assert abs(a["theil_total"] - 0.043604) <= 2e-6
    assert abs(a["theil_within"] - a["theil_total"]) <= 2e-6
    assert bool(a["decomposition_ok"]) and bool(b["decomposition_ok"])
    assert abs(a["income_share"] - 2 / 3) <= 5e-7


def test_power_design_on_planted_coin_flip(spark, tmp_path_factory):
    """100 users at exactly 50% conversion: MDE_abs = 2.801585 *
    sqrt(2*0.25/50) = 0.2801585 (56% relative — wildly underpowered
    for a 5% lift), and the required n per arm for the 5% relative
    lift lands near the textbook ~6.3k."""
    out = tmp_path_factory.mktemp("pow7")
    ts = "2024-03-01 00:00:00"
    rows = []
    for u in range(1, 51):
        rows.append((ts, u, "purchase", 1.0))  # converter
    for u in range(51, 101):
        rows.append((ts, u, "view", 1.0))  # non-converter
    _write_events(spark, out, rows)
    r = registry.get("q_events_power").fn(spark, str(out)).collect()[0]
    assert (r["n_users"], r["n_conv"]) == (100, 50)
    assert r["conv_rate"] == 0.5
    assert abs(r["mde_abs"] - 0.280158) <= 2e-6
    assert 6000 < r["n_req_per_arm"] < 6600
    assert not bool(r["powered_for_5pct"])


def test_skyline_keeps_ties_drops_dominated(spark, tmp_path_factory):
    """(size, price): E(10,50) cheapest small; C(20,90) and F(20,90)
    are an exact tie (neither strictly dominates; both stay); B(20,100)
    dominated by C on price; A(10,100) dominated by B on size; D(30,
    200) untouchable on size. Skyline = {E, C, F, D}."""
    out = tmp_path_factory.mktemp("sky7")
    rows = [
        (1, 10, 100.0),
        (2, 20, 100.0),
        (3, 20, 90.0),
        (4, 30, 200.0),
        (5, 10, 50.0),
        (6, 20, 90.0),
    ]
    spark.createDataFrame(
        rows, "p_partkey long, p_size int, p_retailprice double"
    ).write.mode("overwrite").parquet(str(out / "part.parquet"))
    got = [
        (r["p_partkey"], r["p_size"])
        for r in registry.get("q_skyline").fn(spark, str(out)).collect()
    ]
    assert got == [(5, 10), (3, 20), (6, 20), (4, 30)]


def test_granger_detects_planted_one_day_lead(spark, tmp_path_factory):
    """Purchases copy yesterday's views (plus alternating noise so the
    unrestricted fit is not singular), views follow a low-autocorr
    pattern: the view->purchase cross-lag must clear the 3.841 gate by
    a wide margin and dominate the reverse direction."""
    out = tmp_path_factory.mktemp("gr7")
    rows = []
    x = [((t * 7) % 10) + 1 for t in range(40)]
    for t in range(40):
        day = f"2024-03-{t % 30 + 1:02d}" if t < 30 else f"2024-04-{t - 29:02d}"
        for _ in range(x[t]):
            rows.append((f"{day} 10:00:00", 1, "view", 1.0))
        y = (x[t - 1] if t > 0 else 1) + (t % 2)
        for _ in range(y):
            rows.append((f"{day} 11:00:00", 2, "purchase", 1.0))
    _write_events(spark, out, rows)
    got = {
        r["direction"]: r
        for r in registry.get("q_ts_granger").fn(spark, str(out)).collect()
    }
    fwd, rev = got["view->purchase"], got["purchase->view"]
    # 41-day dense spine (Mar 31 is an events-free gap day the spine
    # must densify) -> 40 lag-1 pairs
    assert fwd["n"] == 40
    assert bool(fwd["granger_at_asymp_5pct"])
    assert fwd["f_stat"] > 10 * max(rev["f_stat"], 1.0)
    assert fwd["r2_unrestricted"] > fwd["r2_restricted"]


def test_mix_temperature_upweights_the_small_source(
    spark, tmp_path_factory
):
    """90/10 token split at tau=0.7: the small source's temperature
    share is 0.1^0.7/(0.1^0.7+0.9^0.7) ≈ 0.176818 — upweighted ~1.77x
    over its natural share; shares still sum to 1."""
    out = tmp_path_factory.mktemp("mix7")
    ten_tokens = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    docs = [(i, ten_tokens, "en", "big", len(ten_tokens)) for i in range(9)]
    docs.append((9, ten_tokens, "en", "small", len(ten_tokens)))
    spark.createDataFrame(
        docs,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.mode("overwrite").parquet(str(out / "documents.parquet"))
    got = {
        r["source"]: r
        for r in registry.get("q_mix_temperature")
        .fn(spark, str(out))
        .collect()
    }
    small, big = got["small"], got["big"]
    assert small["tokens"] == 10 and big["tokens"] == 90
    assert small["natural_share"] == 0.1
    assert abs(small["temp_share"] - 0.176818) <= 1e-4
    assert abs(small["temp_share"] + big["temp_share"] - 1.0) <= 1e-5
    assert small["temp_share"] > small["natural_share"]
    assert big["temp_share"] < big["natural_share"]
    # 10M-token budget over 100 total tokens: everything upsampled
    assert bool(small["upsampled"]) and bool(big["upsampled"])


def test_ndcg_penalizes_the_tf_spammer(spark, tmp_path_factory):
    """doc2 spams 'spark' ten times (grade 1) and outranks doc1, which
    contains all three query terms once (grade 3): DCG = 1·1 +
    7·(1/log2 3), IDCG = 7·1 + 1·(1/log2 3), so NDCG ≈ 0.71 — the
    ranking error binary precision@k cannot see."""
    out = tmp_path_factory.mktemp("ndcg7")
    docs = [
        (1, "spark table query end", "en", "s", 21),
        (2, " ".join(["spark"] * 10), "en", "s", 59),
        (3, "nothing relevant here", "en", "s", 21),
    ]
    spark.createDataFrame(
        docs,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.mode("overwrite").parquet(str(out / "documents.parquet"))
    r = registry.get("q_eval_ndcg").fn(spark, str(out)).collect()[0]
    assert (r["n_grade3"], r["n_grade2"], r["n_grade1"]) == (1, 0, 1)
    disc2 = 1.0 / __import__("math").log2(3)
    assert abs(r["dcg"] - (1.0 + 7 * disc2)) <= 2e-6
    assert abs(r["idcg"] - (7.0 + 1 * disc2)) <= 2e-6
    assert 0.70 < r["ndcg"] < 0.72
    assert abs(r["ndcg"] - r["dcg"] / r["idcg"]) <= 2e-6


def test_elasticity_recovers_planted_log_slope(spark, tmp_path_factory):
    """Unit prices 1/2/4/8 with quantity = 256/price²: exactly
    ln q = ln 256 − 2·ln p, so the estimator must return elasticity
    −2 with R² = 1 and the elastic verdict."""
    out = tmp_path_factory.mktemp("el7")
    rows = [
        (1, 256.0, 256.0),  # (partkey, quantity, extendedprice=p*q)
        (2, 64.0, 128.0),
        (3, 16.0, 64.0),
        (4, 4.0, 32.0),
    ]
    spark.createDataFrame(
        rows, "l_partkey long, l_quantity double, l_extendedprice double"
    ).select(
        "l_partkey",
        "l_quantity",
        "l_extendedprice",
        F.lit("N").alias("l_returnflag"),
        F.lit("O").alias("l_linestatus"),
    ).write.mode("overwrite").parquet(str(out / "lineitem.parquet"))
    spark.createDataFrame(
        [(k, "BX") for k in (1, 2, 3, 4)], "p_partkey long, p_brand string"
    ).write.mode("overwrite").parquet(str(out / "part.parquet"))
    r = registry.get("q_orders_elasticity").fn(spark, str(out)).collect()
    assert len(r) == 1
    b = r[0]
    assert b["n"] == 4
    assert abs(b["elasticity"] - (-2.0)) <= 2e-6
    assert b["r2"] == 1.0
    assert bool(b["elastic"])


def test_kcore_keeps_the_clique_peels_the_chain(spark, tmp_path_factory):
    """Co-purchase graph planted as a K4 clique (every pair co-bought
    in two orders) plus a 1—5—6 pendant chain: the 3-core is exactly
    the K4 (4 nodes, 6 edges); the chain peels; converged is True."""
    out = tmp_path_factory.mktemp("kcore7")
    k4 = [(u, v) for u in (1, 2, 3, 4) for v in (1, 2, 3, 4) if u < v]
    edges = k4 + [(1, 5), (5, 6)]
    rows = []
    okey = 0
    for (u, v) in edges:
        for _ in range(2):  # support >= 2 per edge
            okey += 1
            rows += [(okey, u), (okey, v)]
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long"
    ).select(
        "l_orderkey",
        "l_partkey",
        F.lit(1.0).alias("l_quantity"),
        F.lit(10.0).alias("l_extendedprice"),
    ).write.mode("overwrite").parquet(str(out / "lineitem.parquet"))
    r = registry.get("q_graph_kcore").fn(spark, str(out)).collect()[0]
    assert r["n_core_nodes"] == 4
    assert r["n_core_edges"] == 6
    assert r["n_peeled"] == 2
    assert bool(r["converged"])


def test_tukey_flags_only_the_shifted_pairs(spark, tmp_path_factory):
    """Types 'a' and 'b' share the 10±1 distribution; 'hi' sits at
    100±1: both (a,hi) and (b,hi) gaps clear the HSD margin, the
    (a,b) gap (exactly 0) does not."""
    out = tmp_path_factory.mktemp("tukey7")
    ts = "2024-03-01 00:00:00"
    rows = []
    for i in range(30):
        rows.append((ts, 1, "a", 10.0 + (i % 3) - 1))
        rows.append((ts, 2, "b", 10.0 + (i % 3) - 1))
        rows.append((ts, 3, "hi", 100.0 + (i % 3) - 1))
    _write_events(spark, out, rows)
    got = {
        (r["type_a"], r["type_b"]): r
        for r in registry.get("q_agg_tukey").fn(spark, str(out)).collect()
    }
    assert set(got) == {("a", "b"), ("a", "hi"), ("b", "hi")}
    assert not bool(got[("a", "b")]["significant"])
    assert got[("a", "b")]["mean_gap"] == 0.0
    assert bool(got[("a", "hi")]["significant"])
    assert bool(got[("b", "hi")]["significant"])
    assert abs(got[("a", "hi")]["mean_gap"] - 90.0) <= 1e-6


def test_entropy_rate_zero_for_clockwork_users(spark, tmp_path_factory):
    """Every user cycles a->b->a->b deterministically: every
    conditional entropy is exactly 0, predictability is 1."""
    out = tmp_path_factory.mktemp("ent7")
    rows = []
    for u in (1, 2, 3):
        for i in range(10):
            rows.append(
                (f"2024-03-01 00:{i:02d}:00", u, "a" if i % 2 == 0 else "b",
                 1.0)
            )
    _write_events(spark, out, rows)
    got = {
        r["from_type"]: r
        for r in registry.get("q_events_entropy_rate")
        .fn(spark, str(out))
        .collect()
    }
    assert set(got) == {"a", "b"}
    for r in got.values():
        assert r["h_conditional"] == 0.0
        assert r["entropy_rate"] == 0.0
        assert r["predictability"] == 1.0


def test_entropy_rate_max_for_coin_flip_users(spark, tmp_path_factory):
    """A transition table that is exactly uniform over 2 next-states
    from each of 2 states: entropy rate = ln 2 = h_max, predictability
    0. Built by giving one user each of the four two-step patterns the
    right number of times via four users with fixed sequences."""
    out = tmp_path_factory.mktemp("ent7u")
    seqs = {1: "aabb", 2: "abba", 3: "baab", 4: "bbaa"}
    rows = []
    for u, seq in seqs.items():
        for i, c in enumerate(seq):
            rows.append((f"2024-03-01 00:{i:02d}:00", u, c, 1.0))
    _write_events(spark, out, rows)
    got = registry.get("q_events_entropy_rate").fn(spark, str(out)).collect()
    # each user contributes 3 transitions; by construction each of the
    # four (from, to) cells gets exactly 3 counts -> uniform rows
    byf = {r["from_type"]: r for r in got}
    import math
    for r in byf.values():
        assert abs(r["h_conditional"] - math.log(2)) <= 2e-6
        assert abs(r["entropy_rate"] - math.log(2)) <= 2e-6
        assert abs(r["predictability"]) <= 2e-6


def test_twa_holds_each_reading_until_the_next(spark, tmp_path_factory):
    """Value 10 held for 100s then 1000 held for 1s: TWA =
    (10·100 + 1000·1)/101 ≈ 19.80198, while the plain mean of the two
    closed segments is 505 — the chatty-period bias made visible."""
    out = tmp_path_factory.mktemp("twa7")
    rows = [
        ("2024-03-01 00:00:00", 1, "sensor", 10.0),
        ("2024-03-01 00:01:40", 1, "sensor", 1000.0),
        ("2024-03-01 00:01:41", 1, "sensor", 7.0),  # closes segment 2
    ]
    _write_events(spark, out, rows)
    r = registry.get("q_ts_twa").fn(spark, str(out)).collect()[0]
    assert r["n_segments"] == 2 and r["total_seconds"] == 101
    assert abs(r["twa"] - 2000 / 101) <= 1e-6
    assert r["plain_mean"] == 505.0


def test_shapley_splits_joint_credit_evenly(spark, tmp_path_factory):
    """10 converters touched only view (view gets all 10); 6 converters
    touched click+signup jointly (symmetric pair splits 3/3); a
    non-converter's touches must not move anything; efficiency holds
    exactly."""
    out = tmp_path_factory.mktemp("shap7")
    ts = "2024-03-01 00:00:00"
    rows = []
    for u in range(1, 11):
        rows += [(ts, u, "view", 1.0), (ts, u, "purchase", 1.0)]
    for u in range(11, 17):
        rows += [
            (ts, u, "click", 1.0),
            (ts, u, "signup", 1.0),
            (ts, u, "purchase", 1.0),
        ]
    rows += [(ts, 99, "view", 1.0), (ts, 99, "click", 1.0)]  # no purchase
    _write_events(spark, out, rows)
    got = {
        r["channel"]: r
        for r in registry.get("q_events_shapley")
        .fn(spark, str(out))
        .collect()
    }
    assert got["view"]["shapley_conversions"] == 10.0
    assert got["click"]["shapley_conversions"] == 3.0
    assert got["signup"]["shapley_conversions"] == 3.0
    assert abs(got["view"]["share"] - 10 / 16) <= 5e-7
    assert all(bool(r["efficiency_ok"]) for r in got.values())


def test_clock_mean_wraps_midnight(spark, tmp_path_factory):
    """Events at 23:00 and 01:00: circular mean = 0.0h (midnight) with
    R = cos(2π/24) ≈ 0.966; the naive mean says 12.0h — the wraparound
    bug the op exists to fix."""
    out = tmp_path_factory.mktemp("clock7")
    rows = []
    for d in range(1, 6):
        rows.append((f"2024-03-{d:02d} 23:00:00", 1, "cron", 1.0))
        rows.append((f"2024-03-{d:02d} 01:00:00", 1, "cron", 1.0))
    _write_events(spark, out, rows)
    r = registry.get("q_ts_clock_mean").fn(spark, str(out)).collect()[0]
    import math
    assert r["n"] == 10
    assert r["mean_clock_hour"] in (0.0, 24.0) or r["mean_clock_hour"] < 1e-3
    assert r["naive_mean_hour"] == 12.0
    assert abs(r["resultant_r"] - math.cos(2 * math.pi / 24)) <= 1e-6
    assert bool(r["concentrated"])


def test_code_detect_routes_code_and_prose(spark, tmp_path_factory):
    code = (
        "def main(): import os; return os.path.join(a, b) "
        "for i in range(10): if x_val == y_val: printValue(myVar)"
    )
    prose = (
        "the quick brown fox jumps over the lazy dog and keeps "
        "running through the quiet meadow toward the old farmhouse"
    )
    out = tmp_path_factory.mktemp("code7")
    spark.createDataFrame(
        [(1, code, "en", "s", len(code)), (2, prose, "en", "s", len(prose))],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.mode("overwrite").parquet(str(out / "documents.parquet"))
    got = {
        r["doc_id"]: r
        for r in registry.get("q_text_code_detect")
        .fn(spark, str(out))
        .collect()
    }
    assert bool(got[1]["is_code"]) and not bool(got[2]["is_code"])
    assert got[2]["n_code_punct"] == 0 and got[2]["n_keywords"] == 0


def test_vintage_triangle_counts(spark, tmp_path_factory):
    """Customer 1 orders in Jan and Mar (cohort Jan: ages 0 and 2),
    customer 2 only in Mar (cohort Mar: age 0): three cells with exact
    shares; revenue_per_active divides by ACTIVE, not cohort size."""
    out = tmp_path_factory.mktemp("vin7")
    rows = [
        (1, 1, "2024-01-10 00:00:00", 100.0),
        (2, 1, "2024-03-05 00:00:00", 50.0),
        (3, 2, "2024-03-20 00:00:00", 70.0),
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, od string, o_totalprice double",
    ).select(
        "o_orderkey",
        "o_custkey",
        F.col("od").cast("timestamp").alias("o_orderdate"),
        "o_totalprice",
        F.lit("O").alias("o_orderstatus"),
        F.lit("1-URGENT").alias("o_orderpriority"),
    ).write.mode("overwrite").parquet(str(out / "orders.parquet"))
    got = {
        (r["cohort_month"], r["age_months"]): r
        for r in registry.get("q_orders_vintage")
        .fn(spark, str(out))
        .collect()
    }
    jan = 2024 * 12 + 1
    mar = 2024 * 12 + 3
    assert set(got) == {(jan, 0), (jan, 2), (mar, 0)}
    assert got[(jan, 0)]["active_share"] == 1.0
    assert got[(jan, 2)]["n_active"] == 1
    assert got[(jan, 2)]["revenue_per_active"] == 50.0
    assert got[(mar, 0)]["cohort_size"] == 1


def test_pvm_bridge_is_additive_on_planted_shift(spark, tmp_path_factory):
    """Period 1: 2 orders at 100. Period 2: 3 orders at 120. ΔGMV=160
    decomposes exactly: volume (1·100=100) + price (2·20=40) + mix
    (1·20=20)."""
    out = tmp_path_factory.mktemp("pvm7")
    rows = [
        (1, 1, "2024-01-01 00:00:00", 100.0),
        (2, 2, "2024-01-02 00:00:00", 100.0),
        (3, 3, "2024-12-01 00:00:00", 120.0),
        (4, 4, "2024-12-02 00:00:00", 120.0),
        (5, 5, "2024-12-03 00:00:00", 120.0),
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, od string, o_totalprice double",
    ).select(
        "o_orderkey",
        "o_custkey",
        F.col("od").cast("timestamp").alias("o_orderdate"),
        "o_totalprice",
        F.lit("O").alias("o_orderstatus"),
        F.lit("1-URGENT").alias("o_orderpriority"),
    ).write.mode("overwrite").parquet(str(out / "orders.parquet"))
    r = registry.get("q_orders_pvm").fn(spark, str(out)).collect()[0]
    assert (r["n0"], r["n1"]) == (2, 3)
    assert r["gmv_delta"] == 160.0
    assert r["volume_effect"] == 100.0
    assert r["price_effect"] == 40.0
    assert r["mix_effect"] == 20.0
    assert bool(r["additivity_ok"])


def test_qq_table_on_planted_uniform_shift(spark, tmp_path_factory):
    """purchase = view + 100 pointwise (values 1..100 vs 101..200):
    every matched quantile gap is exactly 100."""
    out = tmp_path_factory.mktemp("qq7")
    rows = []
    for i in range(1, 101):
        rows.append(("2024-03-01 00:00:00", 1, "view", float(i)))
        rows.append(("2024-03-01 00:00:00", 1, "purchase", float(i + 100)))
    _write_events(spark, out, rows)
    got = registry.get("q_agg_qq").fn(spark, str(out)).collect()
    assert len(got) == 9
    for r in got:
        assert r["qq_gap"] == 100.0


def test_freshness_flags_the_lagging_feed(spark, tmp_path_factory):
    """events high-water 2024-03-10, orders 2024-03-01 (9 days stale),
    lineitem ships same day as the clock: orders flagged, exact lag."""
    out = tmp_path_factory.mktemp("fresh7")
    _write_events(spark, out, [("2024-03-10 00:00:00", 1, "view", 1.0)])
    spark.createDataFrame(
        [(1, 1, "2024-03-01 00:00:00", 10.0)],
        "o_orderkey long, o_custkey long, od string, o_totalprice double",
    ).select(
        "o_orderkey", "o_custkey",
        F.col("od").cast("timestamp").alias("o_orderdate"),
        "o_totalprice",
        F.lit("O").alias("o_orderstatus"),
        F.lit("1-URGENT").alias("o_orderpriority"),
    ).write.mode("overwrite").parquet(str(out / "orders.parquet"))
    spark.createDataFrame(
        [(1, "2024-03-10 00:00:00")], "l_orderkey long, sd string"
    ).select(
        "l_orderkey",
        F.col("sd").cast("timestamp").alias("l_shipdate"),
        F.lit(1.0).alias("l_quantity"),
        F.lit(1.0).alias("l_extendedprice"),
        F.lit(0.0).alias("l_discount"),
    ).write.mode("overwrite").parquet(str(out / "lineitem.parquet"))
    got = {
        r["feed"]: r
        for r in registry.get("q_dq_freshness").fn(spark, str(out)).collect()
    }
    assert got["events"]["lag_seconds"] == 0
    assert got["lineitem"]["lag_seconds"] == 0
    assert got["orders"]["lag_seconds"] == 9 * 86400
    assert bool(got["orders"]["stale_24h"])
    assert not bool(got["events"]["stale_24h"])


def test_control_chart_flags_the_spike_day(spark, tmp_path_factory):
    """Twenty quiet days of 10 events around one 1000-event spike:
    center = 1200/21, mR̄ = (990+990)/20 = 99, UCL ≈ 320.5 — exactly
    one individuals break (the spike) and two range breaks (the jump
    up and the jump back down)."""
    out = tmp_path_factory.mktemp("cc7")
    rows = []
    for d in range(21):
        day = f"2024-03-{d + 1:02d}"
        n = 1000 if d == 10 else 10
        for i in range(n):
            rows.append((f"{day} 01:00:00", 1, "view", 1.0))
    _write_events(spark, out, rows)
    r = registry.get("q_ts_control_chart").fn(spark, str(out)).collect()[0]
    assert r["n_days"] == 21
    assert abs(r["center"] - 1200 / 21) <= 1e-6
    assert abs(r["ucl"] - (1200 / 21 + 2.66 * 99)) <= 1e-6
    assert r["n_out_of_control"] == 1
    assert r["n_range_breaks"] == 2


def test_modularity_half_for_two_clean_triangles(spark, tmp_path_factory):
    """Two disjoint co-purchase triangles: each community holds half
    the edges with half the degree mass, so Q = 2·(3/6 − (6/12)²) =
    0.5 — the textbook two-clique value."""
    out = tmp_path_factory.mktemp("mod7")
    tri1 = [(1, 2), (2, 3), (1, 3)]
    tri2 = [(11, 12), (12, 13), (11, 13)]
    rows = []
    okey = 0
    for (u, v) in tri1 + tri2:
        for _ in range(2):  # support >= 2
            okey += 1
            rows += [(okey, u), (okey, v)]
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long"
    ).select(
        "l_orderkey",
        "l_partkey",
        F.lit(1.0).alias("l_quantity"),
        F.lit(10.0).alias("l_extendedprice"),
    ).write.mode("overwrite").parquet(str(out / "lineitem.parquet"))
    got = registry.get("q_graph_modularity").fn(spark, str(out)).collect()
    assert len(got) == 2
    for r in got:
        assert r["n_nodes"] == 3
        assert r["internal_edges"] == 3
        assert r["degree_sum"] == 6
        assert r["q_contribution"] == 0.25
        assert r["modularity"] == 0.5


def test_logreg_recovers_planted_logit(spark, tmp_path_factory):
    """Symmetric 2×2×2 design: 60 users, feature x1 = ±1 (10 vs 8
    events around the floor-mean 9), x2 = ±1 (4 vs 2 active days
    around mean 3), cells built so P(y=1|x1=+1) = 2/3 and
    P(y=1|x1=−1) = 1/3 with x2 independent of y. The logistic MLE is
    β0 = 0, β1 = ln 2 ≈ 0.693147, β2 = 0; by symmetry the IRLS
    gradient for β0 and β2 is EXACTLY zero every round, and three
    Newton rounds land β1 within 1% of ln 2."""
    out = tmp_path_factory.mktemp("lr7")
    rows = []
    uid = 0

    def add_user(n_events, n_days, y):
        nonlocal uid
        uid += 1
        # y=1: purchases outnumber views; y=0: views outnumber.
        core = (
            [("purchase", 2), ("view", 1)] if y else [("purchase", 1), ("view", 2)]
        )
        evs = [t for t, k in core for _ in range(k)]
        evs += ["click"] * (n_events - len(evs))
        days = [f"2024-03-{d:02d}" for d in range(1, n_days + 1)]
        for i, t in enumerate(evs):
            rows.append((f"{days[i % n_days]} 10:{i:02d}:00", uid, t, 1.0))

    for x1_events, n_y1 in ((10, 10), (8, 5)):  # per x2 cell: 15 users
        for n_days in (4, 2):
            for i in range(15):
                add_user(x1_events, n_days, 1 if i < n_y1 else 0)
    _write_events(spark, out, rows)
    r = registry.get("q_ml_logreg").fn(spark, str(out)).collect()[0]
    import math
    assert r["n_users"] == 60
    assert r["beta0"] == 0.0 and r["beta2"] == 0.0
    assert abs(r["beta1"] - math.log(2)) <= 0.01
    # the fitted rule classifies the majority cell correctly: 40/60
    assert r["n_correct"] == 40


def test_naive_bayes_separates_disjoint_vocabularies(
    spark, tmp_path_factory
):
    """'aa'-family docs are lang A, 'xx'-family docs lang B, vocabularies
    disjoint: resubstitution must classify every doc correctly."""
    out = tmp_path_factory.mktemp("nb7")
    docs = []
    for i in range(8):
        docs.append((i, "aa bb cc aa bb", "la", "s", 14))
    for i in range(8, 14):
        docs.append((i, "xx yy zz xx yy", "lb", "s", 14))
    spark.createDataFrame(
        docs,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.mode("overwrite").parquet(str(out / "documents.parquet"))
    got = registry.get("q_ml_naive_bayes").fn(spark, str(out)).collect()
    conf = {(r["true_lang"], r["pred_lang"]): r["n"] for r in got}
    assert conf == {("la", "la"): 8, ("lb", "lb"): 6}
    assert got[0]["accuracy"] == 1.0


def test_stump_finds_the_perfect_split(spark, tmp_path_factory):
    """Converters all have 6 events, non-converters 3: the stump must
    split at threshold 3 (left = non-converters, right = converters)
    with zero split impurity and perfect accuracy."""
    out = tmp_path_factory.mktemp("stump7")
    rows = []
    ts = "2024-03-01 00:00:00"
    for u in range(1, 11):  # converters: 2p+1v+3c = 6 events
        rows += [(ts, u, "purchase", 1.0)] * 2 + [(ts, u, "view", 1.0)]
        rows += [(ts, u, "click", 1.0)] * 3
    for u in range(11, 21):  # non: 1p+2v = 3 events
        rows += [(ts, u, "purchase", 1.0)] + [(ts, u, "view", 1.0)] * 2
    _write_events(spark, out, rows)
    r = registry.get("q_ml_stump").fn(spark, str(out)).collect()[0]
    assert r["threshold"] == 3
    assert (r["n_left"], r["n_right"]) == (10, 10)
    assert r["gini_root"] == 0.5
    assert r["gini_split"] == 0.0
    assert (r["left_label"], r["right_label"]) == (0, 1)
    assert r["accuracy"] == 1.0


def test_silhouette_separates_tight_clusters(spark, tmp_path_factory):
    """Two labels on opposite corners with tiny within-cluster jitter:
    a ≈ jitter, b ≈ the corner distance, silhouette ≈ 1 for both
    labels and the separation verdict fires."""
    out = tmp_path_factory.mktemp("sil7")
    import random
    rng = random.Random(7)
    rows = []
    for i in range(20):
        base = 0.0 if i < 10 else 10.0
        vec = [base + rng.uniform(-0.01, 0.01) for _ in range(8)]
        rows.append((i, vec, 0 if i < 10 else 1))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(out / "embeddings.parquet"))
    got = registry.get("q_embed_silhouette").fn(spark, str(out)).collect()
    assert len(got) == 2
    for r in got:
        assert r["n_vecs"] == 10
        assert r["mean_silhouette"] > 0.99
        assert bool(r["well_separated"])


def test_pretrends_catches_diverging_arms(spark, tmp_path_factory):
    """Arm-1 users ramp up INSIDE the pre-period (quarter 1: 1 event,
    quarter 2: 5) while arm-0 users stay flat (2 and 2): the placebo
    DiD reads ≈3.17 against a small arm-0 se — the parallel-trends
    verdict must be False. A flat counter-plant (both arms 2/2, same
    small placebo from the pin events) must pass."""
    out = tmp_path_factory.mktemp("pt7")
    arm0, arm1 = _users_by_arm(6)
    # horizon [00:00, 04:00): mid = 02:00, q1 = 01:00 boundaries fall
    # between the event clusters below
    def plant(diverge):
        rows = []
        for u in arm0:
            rows += [("2024-03-01 00:30:00", u, "view", 1.0)] * 2
            rows += [("2024-03-01 01:30:00", u, "view", 1.0)] * 2
            rows += [("2024-03-01 03:59:00", u, "view", 1.0)]
        for u in arm1:
            q2 = 5 if diverge else 2
            rows += [("2024-03-01 00:30:00", u, "view", 1.0)] * 2
            rows += [("2024-03-01 01:30:00", u, "view", 1.0)] * q2
            rows += [("2024-03-01 03:59:00", u, "view", 1.0)]
        # pin the horizon ends with one arm-0 user's extra events
        rows += [("2024-03-01 00:00:00", arm0[0], "click", 1.0)]
        rows += [("2024-03-01 04:00:00", arm0[0], "click", 1.0)]
        return rows

    # the two horizon-pin clicks give arm0[0] one extra quarter-1
    # event: arm-0 pre-trend = 2 - 13/6 = -1/6, so the placebo reads
    # 3-(-1/6) (diverging) and 0-(-1/6) (flat)
    _write_events(spark, out, plant(True))
    r = registry.get("q_events_pretrends").fn(spark, str(out)).collect()[0]
    assert abs(r["placebo_did"] - (3 + 1 / 6)) <= 2e-6
    assert not bool(r["parallel_trends_plausible"])
    _write_events(spark, out, plant(False))
    r2 = registry.get("q_events_pretrends").fn(spark, str(out)).collect()[0]
    assert abs(r2["placebo_did"] - 1 / 6) <= 2e-6
    assert bool(r2["parallel_trends_plausible"])


def test_kmeans_cells_partition_and_inertia_adds_up(
    spark, tmp_path_factory
):
    """Every vector lands in exactly one cell (sizes sum to n), purity
    is within (0, 1], and total_inertia equals the sum of per-cell
    inertias to rounding."""
    out = tmp_path_factory.mktemp("km7")
    import random
    rng = random.Random(11)
    rows = [
        (i, [rng.uniform(0, 1) for _ in range(8)], i % 3)
        for i in range(40)
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(out / "embeddings.parquet"))
    got = registry.get("q_ml_kmeans").fn(spark, str(out)).collect()
    assert sum(r["n_vecs"] for r in got) == 40
    tot = got[0]["total_inertia"]
    assert abs(sum(r["inertia"] for r in got) - tot) <= 1e-4
    for r in got:
        assert 0 < r["purity"] <= 1.0
        assert r["inertia"] >= 0.0


def test_spike_attribution_blames_the_error_stream(
    spark, tmp_path_factory
):
    """Five quiet days of 10 views + 2 errors, then a spike day with
    10 views + 52 errors: views have zero excess, errors carry 100% of
    the spike contribution (excess 50 over a 2/day baseline)."""
    out = tmp_path_factory.mktemp("spk7")
    rows = []
    for dnum in range(1, 6):
        day = f"2024-03-{dnum:02d}"
        rows += [(f"{day} 01:00:00", 1, "view", 1.0)] * 10
        rows += [(f"{day} 02:00:00", 1, "error", 1.0)] * 2
    rows += [("2024-03-06 01:00:00", 1, "view", 1.0)] * 10
    rows += [("2024-03-06 02:00:00", 1, "error", 1.0)] * 52
    _write_events(spark, out, rows)
    got = {
        r["event_type"]: r
        for r in registry.get("q_ts_spike_attribution")
        .fn(spark, str(out))
        .collect()
    }
    assert got["error"]["c_spike"] == 52
    assert got["error"]["baseline_per_day"] == 2.0
    assert got["error"]["excess"] == 50.0
    assert got["error"]["spike_contribution"] == 1.0
    assert got["view"]["excess"] == 0.0
    assert got["view"]["spike_contribution"] == 0.0


def test_fatigue_curve_decays_on_planted_sequences(
    spark, tmp_path_factory
):
    """Every user: view→purchase, then view→click (first exposure
    converts, second doesn't): rate(1) = 1.0, rate(2) = 0.0."""
    out = tmp_path_factory.mktemp("fat7")
    rows = []
    for u in (1, 2, 3):
        rows += [
            (f"2024-03-01 00:0{u}:00", u, "view", 1.0),
            (f"2024-03-01 00:0{u}:10", u, "purchase", 1.0),
            (f"2024-03-01 00:0{u}:20", u, "view", 1.0),
            (f"2024-03-01 00:0{u}:30", u, "click", 1.0),
        ]
    _write_events(spark, out, rows)
    got = {
        r["exposure_bucket"]: r
        for r in registry.get("q_events_fatigue")
        .fn(spark, str(out))
        .collect()
    }
    assert got[1]["n_exposures"] == 3 and got[1]["response_rate"] == 1.0
    assert got[2]["n_exposures"] == 3 and got[2]["response_rate"] == 0.0


def test_hill_alpha_on_planted_pareto_tail(spark, tmp_path_factory):
    """Exact Pareto(α=1.5) order values x_i = (200/i)^(2/3)·1000:
    the Hill estimator over the top 100 recovers α within 12% (it is
    consistent, not unbiased, at k=100) and flags the infinite-
    variance tail."""
    out = tmp_path_factory.mktemp("hill7")
    rows = [
        (i, 1, "2024-03-01 00:00:00", 1000.0 * (200.0 / i) ** (2.0 / 3.0))
        for i in range(1, 201)
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, od string, o_totalprice double",
    ).select(
        "o_orderkey",
        "o_custkey",
        F.col("od").cast("timestamp").alias("o_orderdate"),
        "o_totalprice",
        F.lit("O").alias("o_orderstatus"),
        F.lit("1-URGENT").alias("o_orderpriority"),
    ).write.mode("overwrite").parquet(str(out / "orders.parquet"))
    r = registry.get("q_agg_hill").fn(spark, str(out)).collect()[0]
    assert r["k"] == 100
    assert abs(r["hill_alpha"] - 1.5) <= 0.18
    assert bool(r["infinite_variance_tail"])


def test_null_pattern_separates_joint_from_independent(
    spark, tmp_path_factory
):
    """Plant rows where status+price go null TOGETHER (pattern 3) and
    priority goes null alone (pattern 4): the report shows exactly the
    three patterns with their counts."""
    out = tmp_path_factory.mktemp("np7")
    rows = [
        (1, "O", 10.0, "1-URGENT"),
        (2, "O", 10.0, "1-URGENT"),
        (3, None, None, "1-URGENT"),
        (4, None, None, "1-URGENT"),
        (5, "O", 10.0, None),
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_orderstatus string, o_totalprice double,"
        " o_orderpriority string",
    ).write.mode("overwrite").parquet(str(out / "orders.parquet"))
    got = {
        r["pattern"]: r
        for r in registry.get("q_profile_null_pattern")
        .fn(spark, str(out))
        .collect()
    }
    assert set(got) == {0, 3, 4}
    assert got[0]["n_rows"] == 2
    assert got[3]["n_rows"] == 2
    assert bool(got[3]["null_o_orderstatus"])
    assert bool(got[3]["null_o_totalprice"])
    assert not bool(got[3]["null_o_orderpriority"])
    assert got[4]["n_rows"] == 1 and bool(got[4]["null_o_orderpriority"])
    assert got[4]["share"] == 0.2


def test_mcnemar_on_disjoint_vocabs_vs_majority(spark, tmp_path_factory):
    """Disjoint vocabularies: NB is perfect (14/14); the majority
    baseline ('la', 8 docs) gets only those 8. Discordants: b = 6
    (the 'lb' docs NB alone gets), c = 0 — chi2 = (6-1)^2/6 ≈ 4.17 >
    3.841: significantly different."""
    out = tmp_path_factory.mktemp("mcn7")
    docs = [(i, "aa bb cc aa bb", "la", "s", 14) for i in range(8)]
    docs += [(i, "xx yy zz xx yy", "lb", "s", 14) for i in range(8, 14)]
    spark.createDataFrame(
        docs,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.mode("overwrite").parquet(str(out / "documents.parquet"))
    r = registry.get("q_eval_mcnemar").fn(spark, str(out)).collect()[0]
    assert r["n_docs"] == 14
    assert r["nb_accuracy"] == 1.0
    assert abs(r["base_accuracy"] - 8 / 14) <= 1e-6
    assert (r["nb_only_right"], r["base_only_right"]) == (6, 0)
    assert abs(r["mcnemar_chi2"] - 25 / 6) <= 1e-5
    assert bool(r["nb_significantly_different"])


def test_capture_recapture_estimates_the_unseen(spark, tmp_path_factory):
    """60 true users; half A captures users 1-30, half B captures
    16-45 (overlap 15): Chapman N̂ = 31·31/16 − 1 = 59.0625 ≈ 60, the
    45 seen give coverage ≈ 0.762."""
    out = tmp_path_factory.mktemp("cr7")
    rows = []
    for u in range(1, 31):
        rows.append(("2024-03-01 00:00:00", u, "view", 1.0))
    for u in range(16, 46):
        rows.append(("2024-03-09 00:00:00", u, "view", 1.0))
    _write_events(spark, out, rows)
    r = (
        registry.get("q_events_capture_recapture")
        .fn(spark, str(out))
        .collect()[0]
    )
    assert (r["n_first_half"], r["n_second_half"], r["n_both"]) == (
        30,
        30,
        15,
    )
    assert r["n_seen"] == 45
    assert abs(r["n_hat_chapman"] - (31 * 31 / 16 - 1)) <= 1e-6
    assert abs(r["coverage_share"] - 45 / (31 * 31 / 16 - 1)) <= 1e-6
    assert r["ci_lo"] >= 45.0


def test_robust_ttest_shrugs_off_the_whale(spark, tmp_path_factory):
    """Both arms share the 10±1 distribution except one arm-0 whale at
    100000: the capped means are equal-ish and the winsorized verdict
    must be NOT significant (a raw t on the same data would swing on
    the whale); the caps sit inside [9, 11]."""
    out = tmp_path_factory.mktemp("rt7")
    arm0, arm1 = _users_by_arm(30)
    ts = "2024-03-01 00:00:00"
    rows = []
    for i, u in enumerate(arm0):
        rows.append((ts, u, "view", 10.0 + (i % 3) - 1))
    for i, u in enumerate(arm1):
        rows.append((ts, u, "view", 10.0 + (i % 3) - 1))
    rows.append((ts, arm0[0], "view", 100000.0))  # the whale
    _write_events(spark, out, rows)
    r = registry.get("q_agg_robust_ttest").fn(spark, str(out)).collect()[0]
    assert 9.0 <= r["lo"] <= r["hi"] <= 11.0
    assert abs(r["mean_capped_a"] - r["mean_capped_b"]) < 0.2
    assert not bool(r["significant"])


def test_fatigue_trend_licenses_the_decline(spark, tmp_path_factory):
    """Reuse the fatigue plant (rate 1.0 at exposure 1, 0.0 at 2) with
    enough users that the CA z clears 1.96: declining True and
    significant."""
    out = tmp_path_factory.mktemp("fatt7")
    rows = []
    for u in range(1, 9):
        rows += [
            (f"2024-03-01 00:{u:02d}:00", u, "view", 1.0),
            (f"2024-03-01 00:{u:02d}:10", u, "purchase", 1.0),
            (f"2024-03-01 00:{u:02d}:20", u, "view", 1.0),
            (f"2024-03-01 00:{u:02d}:30", u, "click", 1.0),
        ]
    _write_events(spark, out, rows)
    r = (
        registry.get("q_events_fatigue_trend")
        .fn(spark, str(out))
        .collect()[0]
    )
    assert (r["n_exposures"], r["n_responses"]) == (16, 8)
    assert bool(r["declining"]) and bool(r["trend_significant"])
    # hand value: T = rs - R*ns/N = 8 - 8*24/16 = -4; V = .25*(40-36)=1
    assert r["trend_stat"] == -4.0 and r["z"] == -4.0
