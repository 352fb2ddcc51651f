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


def _write_graph_fixture(spark, out, triples):
    """orders+lineitem from (custkey, suppkey, partkey) triples."""
    spark.createDataFrame(
        [(i, c, "O", 100.0, "1995-01-01", "1-URGENT") for i, (c, _, _) in enumerate(triples)],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate_s string, o_orderpriority string",
    ).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        F.col("o_orderdate_s").cast("date").alias("o_orderdate"),
        "o_orderpriority",
    ).write.mode("overwrite").parquet(str(out / "orders.parquet"))
    spark.createDataFrame(
        [(i, s, p) for i, (_, s, p) in enumerate(triples)],
        "l_orderkey long, l_suppkey long, l_partkey long",
    ).select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        F.lit(1.0).alias("l_quantity"),
        F.lit(100.0).alias("l_extendedprice"),
        F.lit(0.05).alias("l_discount"),
    ).write.mode("overwrite").parquet(str(out / "lineitem.parquet"))


def test_graph_degree_star(spark, tmp_path_factory):
    """Customer 1 trades with suppliers 1..4; customers 2..5 each with
    supplier 1 only: degree histograms must reflect the star."""
    out = tmp_path_factory.mktemp("gdeg")
    triples = [(1, s, 100) for s in range(1, 5)]
    triples += [(c, 1, 100) for c in range(2, 6)]
    _write_graph_fixture(spark, out, triples)
    rows = registry.get("q_graph_degree").fn(spark, str(out)).collect()
    got = {(r["kind"], r["degree"]): r["n_nodes"] for r in rows}
    # customer 1 has degree 4 (suppliers 1-4); customers 2-5 degree 1
    assert got[("customer", 4)] == 1 and got[("customer", 1)] == 4
    # supplier 1 serves customers 1-5 (degree 5); suppliers 2-4 degree 1
    assert got[("supplier", 5)] == 1 and got[("supplier", 1)] == 3


def test_graph_assortativity_star_is_negative(spark, tmp_path_factory):
    """A pure star (one hub, many leaves) is maximally disassortative:
    every edge joins the max-degree node to a degree-1 node, r = -1
    ... except r is undefined for a perfect star (zero variance on one
    side after mirroring makes it defined); use two stars to get a
    well-defined strongly negative r."""
    out = tmp_path_factory.mktemp("gass")
    triples = [(1, s, 100) for s in range(1, 6)]          # hub cust 1
    triples += [(c, 10, 100) for c in range(2, 7)]        # hub supp 10
    _write_graph_fixture(spark, out, triples)
    r = registry.get("q_graph_assortativity").fn(spark, str(out)).collect()[0]
    assert r["n_edges"] == 10
    assert r["assortativity"] < -0.5


def test_graph_jaccard_identical_baskets(spark, tmp_path_factory):
    """Customers 1 and 2 order exactly parts {10, 20, 30}: their
    Jaccard is 1.0 and tops the list."""
    out = tmp_path_factory.mktemp("gjac")
    triples = [(1, 1, p) for p in (10, 20, 30)]
    triples += [(2, 1, p) for p in (10, 20, 30)]
    triples += [(3, 1, 10), (3, 1, 99)]  # partial overlap with 1 and 2
    _write_graph_fixture(spark, out, triples)
    rows = registry.get("q_graph_jaccard").fn(spark, str(out)).collect()
    top = rows[0]
    assert (top["cust_a"], top["cust_b"]) == (1, 2)
    assert top["jaccard"] == 1.0 and top["n_common"] == 3
    pair13 = [r for r in rows if (r["cust_a"], r["cust_b"]) == (1, 3)][0]
    assert pair13["jaccard"] == 0.25  # |{10}| / |{10,20,30,99}|


def test_srm_balanced_and_broken(spark, tmp_path_factory):
    """A deliberately broken assignment (drop most of one arm's
    events) must trip the detector; chi2 is the exact closed form."""
    out = tmp_path_factory.mktemp("srm")
    # find user ids landing in each arm via the same md5 byte rule
    import hashlib

    def arm(uid):
        return int(hashlib.md5(str(uid).encode()).hexdigest()[:2], 16) % 2

    a_users = [u for u in range(100) if arm(u) == 0][:5]
    b_users = [u for u in range(100) if arm(u) == 1][:5]
    rows = []
    for i, u in enumerate(a_users):
        rows.append((i, "2024-01-01 00:00:00", u, "view", 1.0))
    # arm B: only one event -> 5 vs 1
    rows.append((999, "2024-01-01 00:00:00", b_users[0], "view", 1.0))
    _write_events(spark, out, rows)
    r = registry.get("q_events_srm").fn(spark, str(out)).collect()[0]
    assert (r["n_a"], r["n_b"]) == (5, 1)
    assert r["chi2"] == round(16 / 6, 6)
    # 2.67 < 3.841: small n keeps it under the trip wire
    assert not r["srm_detected"]


def test_adoption_curve_exact(spark, tmp_path_factory):
    """Three users arriving over two days: day-1 two adopters (share
    2/3), day-2 one more (share 1.0); returning events don't re-adopt."""
    out = tmp_path_factory.mktemp("adopt")
    rows = [
        (1, "2024-01-01 08:00:00", 1, "view", 1.0),
        (2, "2024-01-01 09:00:00", 2, "view", 1.0),
        (3, "2024-01-02 08:00:00", 1, "click", 1.0),  # returning, not new
        (4, "2024-01-02 09:00:00", 3, "view", 1.0),
    ]
    _write_events(spark, out, rows)
    rs = registry.get("q_events_adoption").fn(spark, str(out)).collect()
    assert [(r["new_users"], r["cum_users"]) for r in rs] == [(2, 2), (1, 3)]
    assert rs[0]["adoption_share"] == round(2 / 3, 6)
    assert rs[1]["adoption_share"] == 1.0


def test_changepoint_finds_level_shift(spark, tmp_path_factory):
    """10 days at 2 events/day then 10 days at 8/day: the best split is
    the last low day, with exact segment means."""
    out = tmp_path_factory.mktemp("cpt")
    rows = []
    eid = 0
    for day in range(1, 21):
        n = 2 if day <= 10 else 8
        for j in range(n):
            rows.append(
                (eid, f"2024-01-{day:02d} 0{j % 10}:00:00", j, "view", 1.0)
            )
            eid += 1
    _write_events(spark, out, rows)
    r = registry.get("q_ts_changepoint").fn(spark, str(out)).collect()[0]
    import datetime

    day10 = (datetime.date(2024, 1, 10) - datetime.date(1970, 1, 1)).days
    assert r["split_day"] == day10
    assert r["mean_left"] == 2.0 and r["mean_right"] == 8.0
    assert r["n_days"] == 20


def test_rolling_corr_perfect_comovement(spark, tmp_path_factory):
    """Daily purchase count == daily view count (varying): every full
    window has correlation exactly 1."""
    out = tmp_path_factory.mktemp("rcorr")
    rows = []
    eid = 0
    for day in range(1, 29):
        n = 1 + (day % 5)
        for j in range(n):
            for et in ("purchase", "view"):
                rows.append(
                    (eid, f"2024-01-{day:02d} 03:00:00", j, et, 1.0)
                )
                eid += 1
    _write_events(spark, out, rows)
    rs = registry.get("q_ts_rolling_corr").fn(spark, str(out)).collect()
    assert len(rs) == 15  # 28 days, 14-day window -> 15 full anchors
    assert all(r["rolling_corr"] == 1.0 for r in rs)


def test_periodogram_weekly_signal_dominates(spark, tmp_path_factory):
    """A pure 7-day spike train concentrates power at period 7 (and its
    multiple 14); the off-cycle period-10 bin stays near zero."""
    out = tmp_path_factory.mktemp("pgram")
    rows = []
    eid = 0
    for day in range(1, 29):
        n = 10 if (day % 7) == 0 else 2
        for j in range(n):
            rows.append(
                (eid, f"2024-01-{day:02d} 05:00:00", j, "view", 1.0)
            )
            eid += 1
    _write_events(spark, out, rows)
    rs = {
        r["period"]: r["power"]
        for r in registry.get("q_ts_periodogram").fn(spark, str(out)).collect()
    }
    assert rs[7] > 10 * rs[10]
    assert rs[7] > 0.0


def test_periodogram_constant_series_is_silent(spark, tmp_path_factory):
    """A constant series has zero power at every period after exact
    mean-centering."""
    out = tmp_path_factory.mktemp("pgram0")
    rows = []
    eid = 0
    for day in range(1, 22):
        for j in range(3):
            rows.append(
                (eid, f"2024-01-{day:02d} 06:00:00", j, "view", 1.0)
            )
            eid += 1
    _write_events(spark, out, rows)
    rs = registry.get("q_ts_periodogram").fn(spark, str(out)).collect()
    assert all(r["power"] == 0.0 for r in rs)


def _write_docs(spark, out, texts):
    spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.mode("overwrite").parquet(str(out / "documents.parquet"))


def test_collocations_planted_phrase_tops(spark, tmp_path_factory):
    """'alpha beta' always adjacent while filler words mix freely: the
    phrase tops the PMI list with its exact pair count."""
    out = tmp_path_factory.mktemp("coll")
    texts = [
        "alpha beta the of and the of and alpha beta the of",
        "of the alpha beta and of the and the of alpha beta",
        "the and of alpha beta of the and alpha beta of the",
    ]
    _write_docs(spark, out, texts)
    rows = registry.get("q_text_collocations").fn(spark, str(out)).collect()
    assert rows[0]["bigram"] == "alpha beta"
    assert rows[0]["n_ab"] == 6
    # every other surviving bigram mixes high-frequency fillers
    assert all(r["pmi"] <= rows[0]["pmi"] for r in rows)


def test_editdist_planted_pairs(spark, tmp_path_factory):
    """Identical docs at distance 0 outrank a one-edit pair; both
    share the 32-char blocking prefix with a third far document that
    must not pair (different block)."""
    out = tmp_path_factory.mktemp("edist")
    base = "the quick brown fox jumps over the lazy dog again and again"
    texts = [
        base,                      # 0
        base,                      # 1: identical -> dist 0
        base[:-1] + "x",           # 2: one substitution -> dist 1
        "zzz completely different text with another prefix entirely",
    ]
    _write_docs(spark, out, texts)
    rows = registry.get("q_text_editdist").fn(spark, str(out)).collect()
    assert (rows[0]["doc_a"], rows[0]["doc_b"], rows[0]["edit_dist"]) == (0, 1, 0)
    assert rows[0]["head_similarity"] == 1.0
    dists = {(r["doc_a"], r["doc_b"]): r["edit_dist"] for r in rows}
    assert dists[(0, 2)] == 1 and dists[(1, 2)] == 1
    assert not any(3 in k for k in dists)


def test_pca_power_single_axis_cloud(spark, tmp_path_factory):
    """Vectors strictly along dimension 0: the Gram matrix has one
    nonzero cell, power iteration converges immediately, and the trace
    equals the exact sum of squares."""
    out = tmp_path_factory.mktemp("pca")
    vecs = [(i, [float(i + 1)] + [0.0] * 7, i % 3) for i in range(20)]
    spark.createDataFrame(
        vecs, "vec_id long, embedding array<double>, label long"
    ).write.mode("overwrite").parquet(str(out / "embeddings.parquet"))
    r = registry.get("q_embed_pca_power").fn(spark, str(out)).collect()[0]
    assert (r["n_vecs"], r["d"]) == (20, 8)
    assert r["trace"] == float(sum((i + 1) ** 2 for i in range(20)))
    assert r["converged"] and r["share_in_range"]


def _write_orders(spark, out, rows):
    """rows: (orderkey, custkey, status, total, date_s, priority)"""
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate_s string, o_orderpriority string",
    ).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        F.col("o_orderdate_s").cast("date").alias("o_orderdate"),
        "o_orderpriority",
    ).write.mode("overwrite").parquet(str(out / "orders.parquet"))


def test_profile_fd_planted(spark, tmp_path_factory):
    """Plant orders where custkey determines priority exactly, and a
    violating pair on (date -> priority)."""
    out = tmp_path_factory.mktemp("fd")
    rows = [
        (1, 10, "O", 1.0, "2024-01-01", "1-URGENT"),
        (2, 10, "O", 1.0, "2024-01-01", "1-URGENT"),
        (3, 20, "O", 1.0, "2024-01-01", "2-HIGH"),
        (4, 20, "O", 1.0, "2024-01-02", "2-HIGH"),
    ]
    _write_orders(spark, out, rows)
    got = {
        (r["lhs"], r["rhs"]): r
        for r in registry.get("q_profile_fd").fn(spark, str(out)).collect()
    }
    assert got[("o_custkey", "o_orderpriority")]["fd_holds"]
    # 2024-01-01 maps to both URGENT and HIGH -> violated
    v = got[("o_orderdate", "o_orderpriority")]
    assert not v["fd_holds"] and v["n_lhs"] == 2 and v["n_pairs"] == 3
    assert v["violation_ratio"] == 0.5


def test_profile_keys_planted(spark, tmp_path_factory):
    """orderkey is a key; custkey with duplicates is not; the
    uniqueness ratio is exact."""
    out = tmp_path_factory.mktemp("keys")
    rows = [
        (1, 10, "O", 1.0, "2024-01-01", "1-URGENT"),
        (2, 10, "O", 1.0, "2024-01-02", "1-URGENT"),
        (3, 20, "O", 1.0, "2024-01-01", "2-HIGH"),
        (4, 30, "O", 1.0, "2024-01-03", "2-HIGH"),
    ]
    _write_orders(spark, out, rows)
    got = {
        r["candidate"]: r
        for r in registry.get("q_profile_keys").fn(spark, str(out)).collect()
    }
    assert got["o_orderkey"]["is_key"] and got["o_orderkey"]["uniqueness"] == 1.0
    assert not got["o_custkey"]["is_key"]
    assert got["o_custkey"]["uniqueness"] == 0.75
    assert got["o_custkey+o_orderdate"]["is_key"]


def test_prorate_straddling_order(spark, tmp_path_factory):
    """An order dated Jan 30 whose last ship day is Feb 2 contributes
    2 fulfillment days to January and 2 to February."""
    out = tmp_path_factory.mktemp("pro")
    _write_orders(spark, out, [(1, 10, "O", 1.0, "2024-01-30", "1-URGENT")])
    spark.createDataFrame(
        [(1, 100, 1, "2024-02-02 00:00:00")],
        "l_orderkey long, l_partkey long, l_suppkey long, l_ship_s string",
    ).select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        F.lit(1).alias("l_linenumber"),
        F.lit(1.0).alias("l_quantity"),
        F.lit(100.0).alias("l_extendedprice"),
        F.lit(0.05).alias("l_discount"),
        F.lit(0.02).alias("l_tax"),
        F.lit("N").alias("l_returnflag"),
        F.lit("O").alias("l_linestatus"),
        F.col("l_ship_s").cast("timestamp").alias("l_shipdate"),
    ).write.mode("overwrite").parquet(str(out / "lineitem.parquet"))
    rows = registry.get("q_join_prorate").fn(spark, str(out)).collect()
    # month_id = 12*year + month - 1
    jan, feb = 12 * 2024 + 0, 12 * 2024 + 1
    got = {r["month_id"]: r for r in rows}
    assert got[jan]["fulfillment_days"] == 2
    assert got[feb]["fulfillment_days"] == 2
    assert got[jan]["n_orders_active"] == 1 and got[feb]["n_orders_active"] == 1


def test_eval_report_perfect_model(spark, tmp_path_factory):
    """Scores of 100 on positives and 0 on negatives: AUC 1, all
    threshold metrics 1, ECE 0."""
    out = tmp_path_factory.mktemp("evrep")
    rows = _scored_events(40, 60, [100.0] * 40, [0.0] * 60)
    _write_events(spark, out, rows)
    r = registry.get("q_eval_report").fn(spark, str(out)).collect()[0]
    assert r["n"] == 100
    assert r["auc"] == 1.0 and r["accuracy"] == 1.0
    assert r["precision_"] == 1.0 and r["recall"] == 1.0 and r["f1"] == 1.0
    assert r["ece"] == 0.0


def test_inventory_peak_and_final(spark, tmp_path_factory):
    """Ship +5, ship +3, return -2 in ship-date order: peak 8, final 6;
    a second part with one return goes negative."""
    out = tmp_path_factory.mktemp("inv")
    li = [
        (1, 100, "1995-01-01", "N", 5.0),
        (2, 100, "1995-01-05", "N", 3.0),
        (3, 100, "1995-01-09", "R", 2.0),
        (4, 200, "1995-01-02", "R", 4.0),
    ]
    spark.createDataFrame(
        li,
        "l_orderkey long, l_partkey long, ship_s string,"
        " l_returnflag string, l_quantity double",
    ).select(
        "l_orderkey",
        "l_partkey",
        F.lit(1).alias("l_suppkey"),
        F.lit(1).alias("l_linenumber"),
        "l_quantity",
        F.lit(100.0).alias("l_extendedprice"),
        F.lit(0.05).alias("l_discount"),
        F.lit(0.02).alias("l_tax"),
        "l_returnflag",
        F.lit("O").alias("l_linestatus"),
        F.col("ship_s").cast("timestamp").alias("l_shipdate"),
    ).write.mode("overwrite").parquet(str(out / "lineitem.parquet"))
    rows = registry.get("q_orders_inventory").fn(spark, str(out)).collect()
    got = {r["l_partkey"]: r for r in rows}
    assert got[100]["peak_outstanding"] == 8
    assert got[100]["final_balance"] == 6
    assert got[100]["n_moves"] == 3
    assert got[200]["peak_outstanding"] == -4
    assert got[200]["final_balance"] == -4


def test_scan_files_reports_layout(spark, tmp_path_factory):
    """Three appended single-partition writes produce three files with
    known row counts; the tiny third file must carry the small_file
    flag and the exact skew ratio."""
    out = tmp_path_factory.mktemp("files")
    path = str(out / "lineitem.parquet")

    def chunk(n, key0):
        return spark.range(key0, key0 + n).select(
            F.col("id").alias("l_orderkey"),
            (F.col("id") % 50).alias("l_partkey"),
            F.lit(1).alias("l_suppkey"),
            F.lit(1).alias("l_linenumber"),
            F.lit(1.0).alias("l_quantity"),
            F.lit(100.0).alias("l_extendedprice"),
            F.lit(0.05).alias("l_discount"),
            F.lit(0.02).alias("l_tax"),
            F.lit("N").alias("l_returnflag"),
            F.lit("O").alias("l_linestatus"),
            F.lit("1995-01-01 00:00:00").cast("timestamp").alias(
                "l_shipdate"
            ),
        ).coalesce(1)

    chunk(400, 0).write.mode("overwrite").parquet(path)
    chunk(400, 1000).write.mode("append").parquet(path)
    chunk(10, 2000).write.mode("append").parquet(path)
    rows = registry.get("q_scan_files").fn(spark, str(out)).collect()
    assert len(rows) == 3
    by_rows = sorted(r["n_rows"] for r in rows)
    assert by_rows == [10, 400, 400]
    mean = 810 / 3
    small = [r for r in rows if r["n_rows"] == 10][0]
    assert small["small_file"] and small["skew_vs_mean"] == round(10 / mean, 6)
    assert all(not r["small_file"] for r in rows if r["n_rows"] == 400)


def test_rolling_active_window_and_warmup(spark, tmp_path_factory):
    """Users 1,2 active day 1; user 3 active day 5; user 1 again day
    9: rolling-7 counts carry users for seven days and the warm-up
    edge reports its shorter lookback."""
    out = tmp_path_factory.mktemp("wau")
    rows = [
        (1, "2024-01-01 08:00:00", 1, "view", 1.0),
        (2, "2024-01-01 09:00:00", 2, "view", 1.0),
        (3, "2024-01-05 08:00:00", 3, "view", 1.0),
        (4, "2024-01-09 08:00:00", 1, "view", 1.0),
    ]
    _write_events(spark, out, rows)
    rs = {
        r["day"]: r
        for r in registry.get("q_events_rolling_active")
        .fn(spark, str(out))
        .collect()
    }
    import datetime

    def d(n):
        return (
            datetime.date(2024, 1, n) - datetime.date(1970, 1, 1)
        ).days

    # day 1: users {1,2}; day 5: {1,2,3} (1,2 still within 7 days)
    assert rs[d(1)]["active_users"] == 2 and rs[d(1)]["window_days"] == 1
    assert rs[d(5)]["active_users"] == 3 and rs[d(5)]["window_days"] == 2
    # day 9: day-1 users aged out (1 is re-active via day 9), 3 still in
    assert rs[d(9)]["active_users"] == 2
    assert sorted(rs) == [d(1), d(5), d(9)]
