"""Planted-case gates for the round-10b operators: WOE/IV on a
perfectly-separated bin pair, the exact stratified split on strata that
hit and miss the 80% boundary, MMD on a hand-placed 3-4-5 triangle,
TwoNN against an in-test Python reference, tail dependence on a
comonotone series (λᵤ = 1 by construction), permutation entropy on a
monotone ramp (one pattern, entropy 0), and Holt smoothing against the
literal Python recursion.

The oracle sweep pins values against DuckDB; these pin SEMANTICS
against hand-computable fixtures.
"""

from __future__ import annotations

import datetime
import math
import os
import tempfile

from asyncdatapipeline_spark import registry


def _write(spark, out, table, rows, schema):
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        os.path.join(out, f"{table}.parquet")
    )


def _day(i: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(days=i)


def _orders(spark, out, rows):
    """rows: (key, status, totalprice, day_index, priority)"""
    _write(
        spark,
        out,
        "orders",
        [(k, 1, s, p, _day(d), pr) for k, s, p, d, pr in rows],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )


def test_woe_perfectly_separated_bins(spark):
    """Bin A all-bad, bin B all-good: adjusted WOE_A = ln 9 (pb=0.9,
    pg=0.1 with half-count smoothing on 4+4 rows) and IV = 1.6·ln 9."""
    out = tempfile.mkdtemp()
    rows = [(i, "F", 10.0, i, "A") for i in range(4)]
    rows += [(10 + i, "O", 10.0, i, "B") for i in range(4)]
    _orders(spark, out, rows)
    got = {
        r["bin"]: r
        for r in registry.get("q_feature_woe").fn(spark, out).collect()
    }
    ln9 = math.log((4.5 / 5.0) / (0.5 / 5.0))
    assert abs(got["A"]["woe"] - round(ln9, 6)) < 1e-6
    assert abs(got["B"]["woe"] + round(ln9, 6)) < 1e-6
    assert abs(got["A"]["iv_total"] - round(1.6 * round(ln9, 9), 6)) < 1e-5
    assert got["A"]["n_bad"] == 4 and got["B"]["n_bad"] == 0


def test_stratified_split_exact_fractions(spark):
    """10 en docs -> exactly 8 train / 2 test; 3 de docs -> ceil(2.4)=3
    train, no test row — the to-the-row guarantee hash splits lack."""
    out = tempfile.mkdtemp()
    docs = [(i, f"text {i}", "en", "s", 10) for i in range(10)]
    docs += [(100 + i, f"text {i}", "de", "s", 10) for i in range(3)]
    _write(
        spark,
        out,
        "documents",
        docs,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = registry.get("q_split_stratified").fn(spark, out).collect()
    got = {(r["lang"], r["split"]): r["n_docs"] for r in rows}
    assert got[("en", "train")] == 8 and got[("en", "test")] == 2
    assert got[("de", "train")] == 3 and ("de", "test") not in got


def test_mmd_three_four_five(spark):
    """Singleton groups at (0,0) and (3,4): MMD² = 25, MMD = 5."""
    out = tempfile.mkdtemp()
    _write(
        spark,
        out,
        "embeddings",
        [(0, [0.0, 0.0], 0), (1, [3.0, 4.0], 1)],
        "vec_id long, embedding array<float>, label int",
    )
    r = registry.get("q_embed_mmd").fn(spark, out).collect()
    assert len(r) == 1
    assert r[0]["label_a"] == 0 and r[0]["label_b"] == 1
    assert abs(r[0]["mmd2"] - 25.0) < 1e-6
    assert abs(r[0]["mmd"] - 5.0) < 1e-6
    assert r[0]["n_dims"] == 2


def test_twonn_matches_python_reference(spark):
    """1-D points with distinct pairwise gaps; d̂ recomputed in-test by
    the literal estimator (anchors = vec_id % 5 == 0, scaled-integer
    squared distances, 9dp-ln grid)."""
    out = tempfile.mkdtemp()
    pos = [0.0, 1.0, 3.0, 7.0, 15.0, 31.0, 63.0]
    _write(
        spark,
        out,
        "embeddings",
        [(i, [p], 0) for i, p in enumerate(pos)],
        "vec_id long, embedding array<float>, label int",
    )
    r = registry.get("q_embed_twonn").fn(spark, out).collect()[0]
    anchors = [i for i in range(len(pos)) if i % 5 == 0]
    s = 0.0
    used = 0
    for a in anchors:
        d2s = sorted(
            round(round((pos[a] - pos[j]) ** 2, 12) * 1e12)
            for j in range(len(pos))
            if j != a
        )
        r1, r2 = d2s[0], d2s[1]
        if r1 > 0:
            used += 1
            s += round(0.5 * round(math.log(r2 / r1), 9), 12)
    assert r["n_anchors"] == len(anchors) and r["n_used"] == used
    assert abs(r["d_hat"] - round(used / s, 6)) < 1e-6


def test_taildep_comonotone_is_one(spark):
    """Price and quantity perfectly comonotone (both 1..100): every
    upper tail coincides, λᵤ = 1 at both q levels."""
    out = tempfile.mkdtemp()
    _write(
        spark,
        out,
        "lineitem",
        [(float(i), float(i)) for i in range(1, 101)],
        "l_extendedprice double, l_quantity double",
    )
    rows = registry.get("q_agg_taildep").fn(spark, out).collect()
    got = {r["q_pct"]: r for r in rows}
    assert got[90]["lambda_u"] == 1.0 and got[95]["lambda_u"] == 1.0
    assert got[90]["x_thresh"] == 90.0 and got[90]["n_y"] == 10
    assert got[95]["n_joint"] == 5


def test_perm_entropy_monotone_ramp_is_zero(spark):
    """Strictly increasing daily revenue: a single ordinal pattern,
    entropy 0, normalized 0."""
    out = tempfile.mkdtemp()
    _orders(
        spark,
        out,
        [(i, "O", 100.0 + 10.0 * i, i, "1-URGENT") for i in range(6)],
    )
    r = registry.get("q_ts_perm_entropy").fn(spark, out).collect()
    assert len(r) == 1
    assert r[0]["n_windows"] == 4
    assert r[0]["n_patterns"] == 1
    assert r[0]["perm_entropy"] == 0.0 and r[0]["normalized"] == 0.0


def test_holt_matches_python_recursion(spark):
    """Holt level/trend/forecast equal the literal α=β=½ recursion run
    in-test over the same daily series."""
    out = tempfile.mkdtemp()
    revs = [100.0, 130.0, 90.0, 160.0, 140.0, 200.0]
    _orders(
        spark,
        out,
        [(i, "O", rev, i, "1-URGENT") for i, rev in enumerate(revs)],
    )
    r = registry.get("q_ts_holt").fn(spark, out).collect()[0]
    l, b = revs[0], revs[1] - revs[0]
    for x in revs[2:]:
        lnew = 0.5 * x + 0.5 * (l + b)
        b = 0.5 * (lnew - l) + 0.5 * b
        l = lnew
    assert r["n_days"] == len(revs)
    assert abs(r["level"] - round(l, 6)) < 1e-9
    assert abs(r["trend"] - round(b, 6)) < 1e-9
    assert abs(r["forecast_7d"] - round(l + 7 * b, 6)) < 1e-9


def test_ratio_estimator_constant_ratio_zero_se(spark):
    """Constant price-per-unit: R̂ = 10 exactly, residuals 0, SE 0,
    CI degenerate at the point."""
    out = tempfile.mkdtemp()
    _write(
        spark,
        out,
        "lineitem",
        [("A", 2.0, 20.0) for _ in range(10)],
        "l_returnflag string, l_quantity double, l_extendedprice double",
    )
    r = registry.get("q_agg_ratio_estimator").fn(spark, out).collect()[0]
    assert r["price_per_unit"] == 10.0
    assert r["se"] == 0.0 and r["ci_lo"] == 10.0 and r["ci_hi"] == 10.0


def test_vocab_coverage_planted_head(spark):
    """One word with 50 occurrences + 200 singletons: top-100 covers
    50 + 99 = 149 of 250; top-1k/10k cover everything."""
    out = tempfile.mkdtemp()
    text_head = " ".join(["hot"] * 50)
    singles = [f"w{i:03d}" for i in range(200)]
    docs = [
        (0, text_head, "en", "s", 1),
        (1, " ".join(singles[:100]), "en", "s", 1),
        (2, " ".join(singles[100:]), "en", "s", 1),
    ]
    _write(
        spark,
        out,
        "documents",
        docs,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = registry.get("q_text_vocab_coverage").fn(spark, out).collect()
    got = {r["n_top"]: r for r in rows}
    assert got[100]["vocab_size"] == 201 and got[100]["total_occ"] == 250
    assert got[100]["covered_occ"] == 149
    assert got[1000]["coverage"] == 1.0 and got[10000]["coverage"] == 1.0


def test_systematic_sample_uniform_weights(spark):
    """10 docs of equal weight, 20 picks: every doc is hit exactly
    twice (W=100, skip=5, two midpoints per doc interval)."""
    out = tempfile.mkdtemp()
    docs = [(i, "t", "en", "s", 10) for i in range(10)]
    _write(
        spark,
        out,
        "documents",
        docs,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = registry.get("q_sample_systematic").fn(spark, out).collect()
    assert len(rows) == 10
    assert all(r["n_hits"] == 2 for r in rows)
    assert sum(r["n_hits"] for r in rows) == 20
    assert [r["first_pick"] for r in sorted(rows, key=lambda r: r["doc_id"])] \
        == [2 * i for i in range(10)]


def _alternating_events(spark, out, n_days=10):
    """One event type, daily counts alternating 5,1,5,1,... ."""
    rows = []
    eid = 0
    for d in range(n_days):
        cnt = 5 if d % 2 == 0 else 1
        for _ in range(cnt):
            rows.append((eid, _day(d), 1, "click", 1.0, "{}"))
            eid += 1
    _write(
        spark,
        out,
        "events",
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_yule_walker_alternating_series(spark):
    """Perfect period-2 alternation: r1 = -(n-1)/n, r2 = (n-2)/n, and
    the YW solve lands φ₁ ≈ 0 (within the finite-sample bias), φ₂ ≈ r2
    adjusted — checked against the literal formula in-test."""
    out = tempfile.mkdtemp()
    _alternating_events(spark, out, n_days=10)
    r = registry.get("q_ts_yule_walker").fn(spark, out).collect()[0]
    n = 10
    r1, r2 = -(n - 1) / n, (n - 2) / n
    phi1 = r1 * (1 - r2) / (1 - r1 * r1)
    phi2 = (r2 - r1 * r1) / (1 - r1 * r1)
    assert r["n_days"] == n
    assert abs(r["r1"] - round(r1, 6)) < 1e-6
    assert abs(r["r2"] - round(r2, 6)) < 1e-6
    assert abs(r["phi1"] - round(phi1, 6)) < 1e-6
    assert abs(r["phi2"] - round(phi2, 6)) < 1e-6


def test_spectral_entropy_period2_dominates(spark):
    """The same alternating series concentrates periodogram power at
    period 2: dominant band 2, flatness well below white noise."""
    out = tempfile.mkdtemp()
    _alternating_events(spark, out, n_days=12)
    r = registry.get("q_ts_spectral_entropy").fn(spark, out).collect()[0]
    assert r["dom_period"] == 2
    assert r["flatness"] < 0.5


def test_xtab_residuals_perfect_association(spark):
    """2×2 with perfect association (A→F, B→O): every cell's adjusted
    residual is ±2√5 and flagged significant."""
    out = tempfile.mkdtemp()
    rows = [(i, "F", 10.0, 0, "A") for i in range(10)]
    rows += [(10 + i, "O", 10.0, 0, "B") for i in range(10)]
    _orders(spark, out, rows)
    res = registry.get("q_agg_xtab_residuals").fn(spark, out).collect()
    got = {(r["o_orderpriority"], r["o_orderstatus"]): r for r in res}
    assert got[("A", "F")]["obs"] == 10 and got[("A", "F")]["expected"] == 5.0
    exp_adj = round(5 / math.sqrt(5 * 0.5 * 0.5), 6)
    assert abs(got[("A", "F")]["adj_residual"] - exp_adj) < 1e-6
    assert abs(got[("A", "O")]["adj_residual"] + exp_adj) < 1e-6
    assert all(r["significant"] for r in res)


def test_winsorized_corr_kills_tail_artifact(spark):
    """95 scattered body points (corr ≈ 0) + 5 joint whales at
    (1000, 1000): raw corr ≈ 1 is a tail artifact; clamping to
    [p5, p95] collapses it."""
    out = tempfile.mkdtemp()
    body = [
        ("A", float((i * 7) % 10 + 1), float(i % 10 + 1)) for i in range(95)
    ]
    whales = [("A", 1000.0, 1000.0)] * 5
    _write(
        spark,
        out,
        "lineitem",
        [(f, q, p) for f, q, p in body + whales],
        "l_returnflag string, l_quantity double, l_extendedprice double",
    )
    r = registry.get("q_agg_winsorized_corr").fn(spark, out).collect()[0]
    assert r["corr_raw"] > 0.9
    assert abs(r["corr_winsorized"]) < 0.5
    assert r["delta"] < -0.5


def test_learning_curve_separable_labels(spark):
    """Two tight clusters at (0,0) and (10,10): every training
    fraction classifies the holdout perfectly, and n_train nests."""
    out = tempfile.mkdtemp()
    rows = []
    for i in range(40):
        lab = i // 20  # halves, so every mod-subset sees both labels
        base = 0.0 if lab == 0 else 10.0
        jit = (i % 5) * 0.01
        rows.append((i, [base + jit, base - jit], lab))
    _write(
        spark,
        out,
        "embeddings",
        rows,
        "vec_id long, embedding array<float>, label int",
    )
    res = registry.get("q_ml_learning_curve").fn(spark, out).collect()
    got = {r["frac"]: r for r in res}
    assert got[25]["n_train"] < got[50]["n_train"] < got[100]["n_train"]
    assert all(got[f]["accuracy"] == 1.0 for f in (25, 50, 100))
    assert got[100]["n_test"] == 8


def test_gbm_stumps_exact_step_function(spark):
    """y = 100 for x ≤ 20, 200 above: thresholds 10/15/20 all induce
    the identical perfect partition, so the tie rule picks the
    SMALLEST (t = 10) with leaf means 100/200 and zero SSE left;
    round 2 has nothing to fit."""
    out = tempfile.mkdtemp()
    rows = [("A", 10.0, 100.0)] * 6 + [("A", 30.0, 200.0)] * 6
    _write(
        spark,
        out,
        "lineitem",
        rows,
        "l_returnflag string, l_quantity double, l_extendedprice double",
    )
    res = registry.get("q_ml_gbm_stumps").fn(spark, out).collect()
    r1 = next(r for r in res if r["round"] == 1)
    r2 = next(r for r in res if r["round"] == 2)
    assert r1["split_t"] == 10
    assert r1["mu_left"] == 100.0 and r1["mu_right"] == 200.0
    assert r1["sse_after"] == 0.0
    assert r2["sse_before"] == 0.0 and r2["sse_after"] == 0.0


def test_fisher_dims_planted_signal_dim(spark):
    """Dim 0 separates the labels perfectly (0 vs 10 with tiny within-
    class jitter); dim 1 is identical noise for both: dim 0 must rank
    first with a huge F, and dim 1's between-MS is ~0."""
    out = tempfile.mkdtemp()
    rows = []
    for i in range(20):
        lab = i % 2
        sig = 0.0 if lab == 0 else 10.0
        noise = float(i % 5)  # same distribution for both labels
        rows.append((i, [sig + (i % 3) * 0.01, noise], lab))
    _write(
        spark,
        out,
        "embeddings",
        rows,
        "vec_id long, embedding array<float>, label int",
    )
    res = registry.get("q_embed_fisher_dims").fn(spark, out).collect()
    assert res[0]["dim"] == 0
    assert res[0]["fisher_f"] > 100
    d1 = next(r for r in res if r["dim"] == 1)
    assert d1["fisher_f"] < 1.0


def _events(spark, out, rows):
    """rows: (event_id, day_index, user_id, event_type)"""
    _write(
        spark,
        out,
        "events",
        [(e, _day(d), u, t, 1.0, "{}") for e, d, u, t in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_absorbing_hand_computed_chain(spark):
    """user1: A→B→purchase, user2: A→purchase. p(A→B)=p(A→abs)=0.5,
    p(B→abs)=1 ⇒ v(B)=1, v(A)=1.5, absorb probs 1 within 12 steps."""
    out = tempfile.mkdtemp()
    _events(
        spark,
        out,
        [
            (1, 0, 1, "A"),
            (2, 1, 1, "B"),
            (3, 2, 1, "purchase"),
            (4, 0, 2, "A"),
            (5, 1, 2, "purchase"),
        ],
    )
    res = registry.get("q_events_absorbing").fn(spark, out).collect()
    got = {r["event_type"]: r for r in res}
    assert got["A"]["expected_steps"] == 1.5
    assert got["B"]["expected_steps"] == 1.0
    assert got["A"]["absorb_prob"] == 1.0 and got["B"]["absorb_prob"] == 1.0
    assert got["A"]["p_direct"] == 0.5 and got["B"]["p_direct"] == 1.0


def test_odds_ratio_perfect_separation(spark):
    """One segment, exposure ⇔ outcome (10/0/0/10): Haldane-corrected
    OR = 441, log-OR = ln 441, and the interval excludes 0."""
    out = tempfile.mkdtemp()
    orders = []
    for i in range(10):
        orders.append((i, i, "F", 10.0, _day(0), "1-URGENT"))
        orders.append((100 + i, i, "O", 10.0, _day(0), "3-MEDIUM"))
    _write(
        spark,
        out,
        "orders",
        [(k, ck, s, p, d, pr) for k, ck, s, p, d, pr in orders],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    _write(
        spark,
        out,
        "customer",
        [(i, f"c{i}", 1, 0.0, "BUILDING") for i in range(10)],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    )
    r = registry.get("q_ml_odds_ratio").fn(spark, out).collect()[0]
    assert abs(r["odds_ratio"] - round(10.5 * 10.5 / (0.5 * 0.5), 6)) < 1e-6
    assert abs(r["log_or"] - round(math.log(441.0), 6)) < 1e-6
    assert r["significant"]


def test_croston_constant_demand_pattern(spark):
    """Demand 3 every second day: z_hat = 3, tau_hat = 2, rate 1.5."""
    out = tempfile.mkdtemp()
    rows = []
    k = 0
    for d in (0, 2, 4, 6):
        for _ in range(3):
            rows.append((k, "O", 10.0, d, "1-URGENT"))
            k += 1
    _orders(spark, out, rows)
    r = registry.get("q_orders_croston").fn(spark, out).collect()[0]
    assert r["n_demand_days"] == 4
    assert r["z_hat"] == 3.0 and r["tau_hat"] == 2.0
    assert r["croston_rate"] == 1.5


def test_rich_club_planted_core(spark):
    """4 customers × 4 suppliers: a complete 2×2 hub core (ids 0,1 on
    both sides) plus degree-1 pendant edges. At k = 2 the rich club is
    exactly the core: density 1.0, normalized by the global density."""
    out = tempfile.mkdtemp()
    edges = [(c, s) for c in (0, 1) for s in (0, 1)]
    edges += [(2, 2), (3, 3)]
    _write(
        spark,
        out,
        "orders",
        [(i, c, "O", 1.0, _day(0), "1-URGENT") for i, (c, s) in enumerate(edges)],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    _write(
        spark,
        out,
        "lineitem",
        [(i, s) for i, (c, s) in enumerate(edges)],
        "l_orderkey long, l_suppkey long",
    )
    res = registry.get("q_graph_rich_club").fn(spark, out).collect()
    got = {r["k"]: r for r in res}
    assert got[2]["nu_rich"] == 2 and got[2]["nv_rich"] == 2
    assert got[2]["ne_rich"] == 4 and got[2]["rich_density"] == 1.0
    rho = 6 / (4 * 4)
    assert abs(got[2]["norm_ratio"] - round(1.0 / rho, 6)) < 1e-6
    assert got[8]["ne_rich"] == 0


def test_cpk_centered_vs_offcenter(spark):
    """Centered tight process (σ small around 0.05): Cp == Cpk and
    capable; hugging the USL at 0.099: Cpk collapses below 1.33."""
    out = tempfile.mkdtemp()
    centered = [("A", 0.05 + (i % 2) * 0.002 - 0.001) for i in range(40)]
    off = [("B", 0.099 + (i % 2) * 0.002 - 0.001) for i in range(40)]
    _write(
        spark,
        out,
        "lineitem",
        centered + off,
        "l_returnflag string, l_discount double",
    )
    res = registry.get("q_agg_cpk").fn(spark, out).collect()
    got = {r["l_returnflag"]: r for r in res}
    assert got["A"]["cp"] == got["A"]["cpk"] and got["A"]["capable"]
    assert got["B"]["cpk"] < got["B"]["cp"]
    assert not got["B"]["capable"]
