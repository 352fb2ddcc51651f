"""Planted-case gates for the round-11 operators: Haar energy on a
period-2 alternation (all energy at level 1), the variance ratio on the
same alternation (VR hand-computed, mean-reverting), cointegration
against a literal Python reference, Sarle's BC on a two-point mass,
Huber against the literal 2-step IRLS, anisotropy on identical vectors
(mean cos = 1), hubness on a hand-placed 1-D line, brand association
rules on a 4-order basket set, the neighbor-degree curve on a star, and
burstiness on planted gap patterns.

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


def _sec(s: float) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s)


def _daily_events(spark, out, counts, etype="view", extra=()):
    """counts[i] events on day i for ``etype`` plus ``extra`` rows of
    (event_id, ts, user_id, event_type)."""
    rows = []
    eid = 0
    for d, c in enumerate(counts):
        for _ in range(c):
            rows.append((eid, _day(d), 1, etype))
            eid += 1
    rows += list(extra)
    _write(
        spark,
        out,
        "events",
        [(e, t, u, et, 1.0, "{}") for e, t, u, et in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_haar_energy_period2_alternation(spark):
    """y = 2,1,2,1,2,1,2,1 (all days present, so the spine spans the
    full 8 days): every level-1 block differs by 1 (energy 4/2 = 2),
    levels 2 and 3 see balanced halves (energy 0)."""
    out = tempfile.mkdtemp()
    _daily_events(spark, out, [2, 1] * 4)
    got = {
        r["level"]: r
        for r in registry.get("q_ts_haar_energy").fn(spark, out).collect()
    }
    assert got[1]["n_blocks"] == 4 and abs(got[1]["energy"] - 2.0) < 1e-9
    assert got[2]["energy"] == 0.0 and got[3]["energy"] == 0.0
    assert abs(got[1]["energy_share"] - 1.0) < 1e-9


def test_variance_ratio_alternation_mean_reverts(spark):
    """y = j % 2 over 10 days: var1 = 80/81, var5 = 0.96,
    VR = 0.96/(5*80/81) = 0.1944 -> mean_reverting."""
    out = tempfile.mkdtemp()
    _daily_events(spark, out, [j % 2 for j in range(10)])
    # day 0 has zero events -> spine starts at day 1; recompute the
    # expected numbers on the observed spine (days 1..9, y=1,0,1,...)
    ys = [1, 0, 1, 0, 1, 0, 1, 0, 1]
    d1 = [ys[t] - ys[t - 1] for t in range(1, len(ys))]
    dk = [ys[t] - ys[t - 5] for t in range(5, len(ys))]

    def var(v):
        m = sum(v) / len(v)
        return sum(x * x for x in v) / len(v) - m * m

    vr = var(dk) / (5 * var(d1))
    r = registry.get("q_ts_variance_ratio").fn(spark, out).collect()
    row = next(x for x in r if x["event_type"] == "view")
    assert abs(row["vr"] - round(vr, 6)) < 1e-6
    assert row["verdict"] == "mean_reverting"


def test_cointegration_matches_python_reference(spark):
    """views x = [2,4,2,4,2,4], purchases y = [1,3,2,3,1,2]: slope,
    rho, df_t recomputed by the literal formulas."""
    out = tempfile.mkdtemp()
    xs = [2, 4, 2, 4, 2, 4]
    ys = [1, 3, 2, 3, 1, 2]
    rows = []
    eid = 0
    for d in range(6):
        for _ in range(xs[d]):
            rows.append((eid, _day(d), 1, "view"))
            eid += 1
        for _ in range(ys[d]):
            rows.append((eid, _day(d), 1, "purchase"))
            eid += 1
    _write(
        spark,
        out,
        "events",
        [(e, t, u, et, 1.0, "{}") for e, t, u, et in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    icept = (sy - slope * sx) / n
    u = [round(y - icept - slope * x, 6) for x, y in zip(xs, ys)]
    a = sum(u[t - 1] * u[t - 1] for t in range(1, n))
    b = sum((u[t] - u[t - 1]) * u[t - 1] for t in range(1, n))
    c = sum((u[t] - u[t - 1]) ** 2 for t in range(1, n))
    m = n - 1
    sig2 = (c - b * b / a) / (m - 1)
    df_t = b / math.sqrt(a * sig2)
    r = registry.get("q_ts_cointegration").fn(spark, out).collect()[0]
    assert r["n_days"] == n
    assert abs(r["slope"] - round(slope, 6)) < 1e-6
    assert abs(r["intercept"] - round(icept, 6)) < 1e-6
    assert abs(r["rho"] - round(b / a, 6)) < 1e-5
    assert abs(r["df_t"] - round(df_t, 6)) < 1e-4


def _lineitem_prices(spark, out, groups):
    """groups: dict flag -> list of extendedprice values."""
    rows = []
    for flag, vals in groups.items():
        for i, v in enumerate(vals):
            rows.append((i, float(v), float(v), flag))
    _write(
        spark,
        out,
        "lineitem",
        rows,
        "l_orderkey long, l_quantity double, l_extendedprice double, "
        "l_returnflag string",
    )


def test_bimodality_two_point_mass(spark):
    """20 zeros + 20 ones: g1 = 0, g2 = -2, BC = 1/(-2 + 3*39^2/(38*37))
    > 5/9 -> bimodal_leaning."""
    out = tempfile.mkdtemp()
    _lineitem_prices(spark, out, {"A": [0.0] * 20 + [1.0] * 20})
    r = registry.get("q_agg_bimodality").fn(spark, out).collect()[0]
    n = 40
    bc = 1.0 / (-2.0 + 3.0 * (n - 1) ** 2 / ((n - 2) * (n - 3)))
    assert r["skewness"] == 0.0
    assert abs(r["excess_kurtosis"] + 2.0) < 1e-9
    assert abs(r["bc"] - round(bc, 6)) < 1e-6
    assert r["bimodal_leaning"] is True and bc > 5 / 9


def test_huber_downweights_single_outlier(spark):
    """[10]*9 + [100]: the literal 2-step IRLS (k=1.345, mean/pop-sd
    start, 9dp/6dp weight grids) lands well below the mean."""
    out = tempfile.mkdtemp()
    vals = [10.0] * 9 + [100.0]
    _lineitem_prices(spark, out, {"A": vals})
    n = len(vals)
    mean = sum(vals) / n
    s = math.sqrt(sum(v * v for v in vals) / n - mean * mean)
    k = 1.345
    mu = mean
    for _ in range(2):
        sw = swx = 0.0
        for x in vals:
            w = 1.0 if x == mu else min(1.0, k * s / abs(x - mu))
            sw += round(w, 9)
            swx += round(w * x, 6)
        mu = swx / sw
    r = registry.get("q_agg_huber").fn(spark, out).collect()[0]
    assert abs(r["mean"] - 19.0) < 1e-9
    assert abs(r["huber_mean"] - round(mu, 6)) < 1e-6
    assert r["huber_mean"] < r["mean"] - 4  # the outlier lost influence
    assert abs(r["shift"] - round(mu - mean, 6)) < 1e-6


def test_anisotropy_identical_vectors_collapsed(spark):
    """Four copies of [1, 0]: every pairwise cosine is exactly 1."""
    out = tempfile.mkdtemp()
    _write(
        spark,
        out,
        "embeddings",
        [(i, [1.0, 0.0], 0) for i in range(4)],
        "vec_id long, embedding array<float>, label int",
    )
    r = registry.get("q_embed_anisotropy").fn(spark, out).collect()[0]
    assert r["n_vectors"] == 4 and r["n_zero_norm"] == 0
    assert abs(r["mean_norm"] - 1.0) < 1e-9
    assert abs(r["mean_pairwise_cos"] - 1.0) < 1e-9
    assert r["collapsed"] is True


def test_hubness_hand_placed_line(spark):
    """Anchors at ids 0 (x=0) and 5 (x=100); 8 fillers on 1..9.
    occ = [0,1,1,1,2,0,2,1,1,1]: mean 1, skew 0, antihub 0.2."""
    out = tempfile.mkdtemp()
    pos = {0: 0.0, 1: 1.0, 2: 2.0, 3: 3.0, 4: 4.0,
           5: 100.0, 6: 6.0, 7: 7.0, 8: 8.0, 9: 9.0}
    _write(
        spark,
        out,
        "embeddings",
        [(i, [x], 0) for i, x in pos.items()],
        "vec_id long, embedding array<float>, label int",
    )
    r = registry.get("q_embed_hubness").fn(spark, out).collect()[0]
    assert r["n_corpus"] == 10 and r["n_anchors"] == 2 and r["k"] == 5
    assert r["max_occ"] == 2
    assert abs(r["mean_occ"] - 1.0) < 1e-9
    assert abs(r["occ_skewness"] - 0.0) < 1e-9
    assert abs(r["antihub_frac"] - 0.2) < 1e-9


def test_basket_rules_single_surviving_pair(spark):
    """Orders {A,B},{A,B},{A,C},{B}: only (A,B) reaches 2 orders;
    support 0.5, confidence 2/3, lift 8/9."""
    out = tempfile.mkdtemp()
    baskets = {1: ["A", "B"], 2: ["A", "B"], 3: ["A", "C"], 4: ["B"]}
    brand_pk = {"A": 1, "B": 2, "C": 3}
    _write(
        spark,
        out,
        "part",
        [(pk, f"Brand#{b}") for b, pk in brand_pk.items()],
        "p_partkey long, p_brand string",
    )
    rows = [
        (ok, brand_pk[b]) for ok, bs in baskets.items() for b in bs
    ]
    _write(spark, out, "lineitem", rows, "l_orderkey long, l_partkey long")
    res = registry.get("q_orders_basket_rules").fn(spark, out).collect()
    assert len(res) == 1
    r = res[0]
    assert r["brand_a"] == "Brand#A" and r["brand_b"] == "Brand#B"
    assert r["n_pair"] == 2
    assert abs(r["support"] - 0.5) < 1e-9
    assert abs(r["confidence"] - round(2 / 3, 6)) < 1e-6
    assert abs(r["lift"] - round(8 / 9, 6)) < 1e-6


def test_neighbor_degree_star(spark):
    """c1-{s1,s2,s3}, c2-s1, c3-s1: degree-1 nodes average neighbor
    degree 3; degree-3 nodes average 10/6."""
    out = tempfile.mkdtemp()
    edges = [(1, 1), (1, 2), (1, 3), (2, 1), (3, 1)]  # (cust, supp)
    _write(
        spark,
        out,
        "orders",
        [(i, c) for i, (c, _) in enumerate(edges)],
        "o_orderkey long, o_custkey long",
    )
    _write(
        spark,
        out,
        "lineitem",
        [(i, s) for i, (_, s) in enumerate(edges)],
        "l_orderkey long, l_suppkey long",
    )
    got = {
        r["degree"]: r
        for r in registry.get("q_graph_neighbor_degree")
        .fn(spark, out)
        .collect()
    }
    assert got[1]["n_nodes"] == 4 and got[1]["avg_neighbor_degree"] == 3.0
    assert got[3]["n_nodes"] == 2
    assert abs(got[3]["avg_neighbor_degree"] - round(10 / 6, 6)) < 1e-6
    assert abs(got[1]["knn_over_k"] - 3.0) < 1e-9


def test_burstiness_planted_gap_patterns(spark):
    """Type R: equal 1s gaps -> sd 0, B = -1, 'regular'. Type B: gaps
    1,1,1,97 s -> B = (sd-25)/(sd+25) with sd = sqrt(1728), 'bursty'."""
    out = tempfile.mkdtemp()
    rows = []
    eid = 0
    for i in range(5):  # type R at t = 0,1,2,3,4
        rows.append((eid, _sec(i), 1, "R"))
        eid += 1
    for t in [0, 1, 2, 3, 100]:  # type B gaps 1,1,1,97
        rows.append((eid, _sec(t), 1, "B"))
        eid += 1
    _write(
        spark,
        out,
        "events",
        [(e, t, u, et, 1.0, "{}") for e, t, u, et in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {
        r["event_type"]: r
        for r in registry.get("q_events_burstiness").fn(spark, out).collect()
    }
    assert got["R"]["burstiness"] == -1.0 and got["R"]["verdict"] == "regular"
    assert abs(got["R"]["mean_gap_sec"] - 1.0) < 1e-9
    mu, var = 25.0, (3 * 1 + 97 * 97) / 4 - 625
    sd = math.sqrt(var)
    assert abs(got["B"]["burstiness"] - round((sd - mu) / (sd + mu), 6)) < 1e-6
    assert got["B"]["verdict"] == "bursty"
    assert got["B"]["n_gaps"] == 4


def _dtw_ref(a, b, w=7):
    n = len(a)
    prev, cur = None, [abs(a[0] - b[0]) if i == 0 else None
                       for i in range(n)]
    for k in range(1, 2 * n - 1):
        nxt = [None] * n
        for i in range(n):
            j = k - i
            if not (0 <= j < n and abs(i - j) <= w):
                continue
            cands = [
                c
                for c in (
                    cur[i - 1] if i > 0 else None,
                    cur[i],
                    prev[i - 1] if i > 0 and prev is not None else None,
                )
                if c is not None
            ]
            if cands:
                nxt[i] = abs(a[i] - b[j]) + min(cands)
        prev, cur = cur, nxt
    return cur[n - 1] if n > 1 else abs(a[0] - b[0])


def test_dtw_single_type_is_zero(spark):
    """One event type: its micro-share profile IS the global profile,
    so every local distance on the diagonal is 0 and DTW = 0."""
    out = tempfile.mkdtemp()
    _daily_events(spark, out, [3, 1, 4, 1, 5, 9, 2, 6])
    r = registry.get("q_ts_dtw").fn(spark, out).collect()
    assert len(r) == 1
    assert r[0]["dtw_cost_micro"] == 0 and r[0]["dtw_cost"] == 0.0
    assert r[0]["n_days"] == 8


def test_dtw_matches_python_reference(spark):
    """Two types with different shapes: engine cost equals the literal
    banded-DP replica on the integer micro-share grid."""
    out = tempfile.mkdtemp()
    ca = [5, 1, 1, 5, 1, 1, 5, 1]   # type A: spiky period 3
    cb = [1, 1, 3, 3, 1, 1, 3, 3]   # type B: square period 4
    rows = []
    eid = 0
    for d in range(8):
        for _ in range(ca[d]):
            rows.append((eid, _day(d), 1, "A"))
            eid += 1
        for _ in range(cb[d]):
            rows.append((eid, _day(d), 2, "B"))
            eid += 1
    _write(
        spark,
        out,
        "events",
        [(e, t, u, et, 1.0, "{}") for e, t, u, et in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    S = 1_000_000
    ya, yb = sum(ca), sum(cb)
    g = [x + y for x, y in zip(ca, cb)]
    gt = sum(g)
    bprof = [v * S // gt for v in g]
    got = {
        r["event_type"]: r
        for r in registry.get("q_ts_dtw").fn(spark, out).collect()
    }
    for et, counts, tot in (("A", ca, ya), ("B", cb, yb)):
        aprof = [v * S // tot for v in counts]
        exp = _dtw_ref(aprof, bprof)
        assert got[et]["dtw_cost_micro"] == exp
        assert abs(got[et]["dtw_cost"] - round(exp / S, 6)) < 1e-9


def test_isotonic_pools_violating_bins(spark):
    """Bins 1,2,3 with raw rates 0.5, 0.0, 1.0 (counts 2 each): the
    increasing isotonic fit pools bins 1-2 to 0.25 and keeps 1.0."""
    out = tempfile.mkdtemp()
    # (quantity, returnflag): bin1 = {R,N}, bin2 = {N,N}, bin3 = {R,R}
    rows = [
        (1, 1.0, 1.0, "R"), (2, 1.0, 1.0, "N"),
        (3, 2.0, 2.0, "N"), (4, 2.0, 2.0, "N"),
        (5, 3.0, 3.0, "R"), (6, 3.0, 3.0, "R"),
    ]
    _write(
        spark, out, "lineitem", rows,
        "l_orderkey long, l_quantity double, l_extendedprice double, "
        "l_returnflag string",
    )
    got = {
        r["bin"]: r
        for r in registry.get("q_ml_isotonic").fn(spark, out).collect()
    }
    assert abs(got[1]["rate_iso"] - 0.25) < 1e-9
    assert abs(got[2]["rate_iso"] - 0.25) < 1e-9
    assert abs(got[3]["rate_iso"] - 1.0) < 1e-9
    assert got[1]["rate_raw"] == 0.5 and got[2]["rate_raw"] == 0.0
    # monotone by construction
    assert got[1]["rate_iso"] <= got[2]["rate_iso"] <= got[3]["rate_iso"]


def test_holt_winters_periodic_invariance(spark):
    """A perfectly 7-periodic series [7,1,1,1,1,1,2] x 3 weeks: level
    stays at the weekly mean 2, trend 0, seasonals reproduce the
    profile exactly (range 6), forecast day +7 = 2 + s7 = 2."""
    out = tempfile.mkdtemp()
    _daily_events(spark, out, [7, 1, 1, 1, 1, 1, 2] * 3)
    r = registry.get("q_ts_holt_winters").fn(spark, out).collect()
    row = next(x for x in r if x["event_type"] == "view")
    assert row["n_days"] == 21
    assert row["level"] == 2.0 and row["trend"] == 0.0
    assert row["seasonal_range"] == 6.0
    assert row["forecast_7d"] == 2.0


def test_esd_unmasks_second_outlier(spark):
    """[10]*12 plus 100 and 50: the single-pass z of 50 is polluted by
    the 100; after round 1 peels the 100, round 2's recomputed sigma
    flags the 50 too. Round 3 (all-equal remainder) has sd 0 -> NULL z."""
    out = tempfile.mkdtemp()
    counts = [10] * 6 + [100] + [10] * 3 + [50] + [10] * 3
    _daily_events(spark, out, counts)
    rows = {
        r["round"]: r
        for r in registry.get("q_anomaly_esd").fn(spark, out).collect()
    }
    assert rows[1]["y"] == 100 and rows[1]["flagged"] is True
    assert rows[2]["y"] == 50 and rows[2]["flagged"] is True
    import math as _m
    n, tot, tot2 = 14, 12 * 10 + 150, 12 * 100 + 10000 + 2500
    mu = tot / n
    sd = _m.sqrt(tot2 / n - mu * mu)
    assert abs(rows[1]["z"] - round((100 - mu) / sd, 6)) < 1e-6
    assert rows[3]["y"] == 10 and rows[3]["z"] is None
    assert rows[3]["flagged"] is None


def test_merge_schema_null_surface(spark):
    """Gen-1 days (< split) lack `value`; mergeSchema surfaces NULLs
    for them and the new-column sum covers only gen-2 rows."""
    out = tempfile.mkdtemp()
    # day index 0 = 2024-01-01 = epoch-day 19723; split is 19740 (i=17)
    rows = [
        (1, _day(0), 1, "A", 9.0, "{}"),
        (2, _day(1), 1, "A", 9.0, "{}"),
        (3, _day(20), 1, "A", 1.5, "{}"),
        (4, _day(21), 1, "A", 2.5, "{}"),
        (5, _day(22), 1, "A", 3.0, "{}"),
        (6, _day(20), 2, "B", 4.0, "{}"),
    ]
    _write(
        spark, out, "events", rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {
        r["event_type"]: r
        for r in registry.get("q_scan_merge_schema").fn(spark, out).collect()
    }
    assert got["A"]["n_rows"] == 5 and got["A"]["n_value_null"] == 2
    assert abs(got["A"]["sum_value_new"] - 7.0) < 1e-9
    assert got["B"]["n_rows"] == 1 and got["B"]["n_value_null"] == 0
    assert abs(got["B"]["sum_value_new"] - 4.0) < 1e-9


def test_dedup_url_collapses_cosmetic_variants(spark):
    """Docs 0,2,3,4 of one source share (source, id div 7): case,
    trailing-slash and utm variants collapse to ONE canonical URL;
    raw variants = 3 (ids 2 and 4 produce the identical raw URL)."""
    out = tempfile.mkdtemp()
    _write(
        spark, out, "documents",
        [(i, "t", "en", "web", 1) for i in (0, 2, 3, 4)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    )
    res = registry.get("q_dedup_url").fn(spark, out).collect()
    assert len(res) == 1
    r = res[0]
    assert r["canonical_url"] == "https://web.example.com/docs/0?id=0"
    assert r["n_docs"] == 4 and r["n_raw_variants"] == 3
    assert r["keeper_doc_id"] == 0


def test_embed_drift_planted_shift(spark):
    """Label 0: even-id vectors at [0,0], odd at [3,4] -> centroid
    drift exactly 5. Label 1: identical halves -> drift 0."""
    out = tempfile.mkdtemp()
    rows = [
        (0, [0.0, 0.0], 0), (2, [0.0, 0.0], 0),
        (1, [3.0, 4.0], 0), (3, [3.0, 4.0], 0),
        (4, [1.0, 1.0], 1), (5, [1.0, 1.0], 1),
    ]
    _write(
        spark, out, "embeddings", rows,
        "vec_id long, embedding array<float>, label int",
    )
    got = {
        r["label"]: r
        for r in registry.get("q_embed_drift").fn(spark, out).collect()
    }
    assert got[0]["centroid_drift"] == 5.0 and got[0]["drifted"] is True
    assert got[0]["n_a"] == 2 and got[0]["n_b"] == 2
    assert got[1]["centroid_drift"] == 0.0 and got[1]["drifted"] is False


def test_kcenter_farthest_point_traversal(spark):
    """1-D points 0,1,2,3,4,50,51,100,101,200 (ids 0..9): greedy FPT
    from id 0 selects 200, 100, 50, 4; final coverage radius² = 4."""
    out = tempfile.mkdtemp()
    pos = [0.0, 1.0, 2.0, 3.0, 4.0, 50.0, 51.0, 100.0, 101.0, 200.0]
    _write(
        spark, out, "embeddings",
        [(i, [x], 0) for i, x in enumerate(pos)],
        "vec_id long, embedding array<float>, label int",
    )
    res = registry.get("q_sample_kcenter").fn(spark, out).collect()
    ids = [r["center_vec_id"] for r in res]
    assert ids == [0, 4, 5, 7, 9]
    assert all(r["n_corpus"] == 10 for r in res)
    assert all(abs(r["coverage_radius_sq"] - 4.0) < 1e-9 for r in res)
    assert [r["pick"] for r in res] == [1, 2, 3, 4, 5]


def test_encoding_audit_planted_artifacts(spark):
    """One doc with 2 replacement chars + 1 control char + 1 NBSP in
    100 chars; one clean doc. Rates per Mchar are exact."""
    out = tempfile.mkdtemp()
    bad = ("a" * 95) + "\ufffd\ufffd\x01\xa0x"   # len 100
    good = "b" * 50
    _write(
        spark, out, "documents",
        [(1, bad, "en", "web", len(bad)), (2, good, "en", "books", 50)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    )
    got = {
        r["source"]: r
        for r in registry.get("q_text_encoding_audit")
        .fn(spark, out)
        .collect()
    }
    w = got["web"]
    assert w["n_chars"] == 100
    assert abs(w["repl_per_mchar"] - 20000.0) < 1e-6
    assert abs(w["ctrl_per_mchar"] - 10000.0) < 1e-6
    assert abs(w["nbsp_per_mchar"] - 10000.0) < 1e-6
    assert w["clean"] is False
    b = got["books"]
    assert b["clean"] is True and b["repl_per_mchar"] == 0.0


def test_tpch_q18_threshold_boundary(spark):
    """Orders at qty 151 pass the >150 HAVING, exactly 150 does not."""
    out = tempfile.mkdtemp()
    _write(
        spark, out, "customer",
        [(1, "Customer#1"), (2, "Customer#2")],
        "c_custkey long, c_name string",
    )
    _write(
        spark, out, "orders",
        [(10, 1, 500.0, _day(0)), (20, 2, 400.0, _day(1))],
        "o_orderkey long, o_custkey long, o_totalprice double, "
        "o_orderdate timestamp",
    )
    rows = [(10, float(q)) for q in (50, 50, 51)]      # 151 -> in
    rows += [(20, float(q)) for q in (50, 50, 50)]     # 150 -> out
    _write(spark, out, "lineitem", rows,
           "l_orderkey long, l_quantity double")
    res = registry.get("q_tpch_q18").fn(spark, out).collect()
    assert len(res) == 1
    assert res[0]["o_orderkey"] == 10 and res[0]["total_qty"] == 151
    assert res[0]["c_name"] == "Customer#1"


def test_tpch_q6_band_boundaries(spark):
    """Discount band [0.05, 0.07] and qty < 24 are inclusive/exclusive
    exactly as specified."""
    out = tempfile.mkdtemp()
    d = datetime.datetime(1997, 6, 1)
    rows = [
        (1, 100.0, 0.05, 23.0, d),   # in (both boundaries inclusive)
        (2, 100.0, 0.07, 1.0, d),    # in
        (3, 100.0, 0.04, 1.0, d),    # out: discount low
        (4, 100.0, 0.06, 24.0, d),   # out: qty not < 24
        (5, 100.0, 0.06, 1.0, datetime.datetime(1998, 1, 1)),  # out: date
    ]
    _write(
        spark, out, "lineitem",
        [(k, p, disc, q, ts) for k, p, disc, q, ts in rows],
        "l_orderkey long, l_extendedprice double, l_discount double, "
        "l_quantity double, l_shipdate timestamp",
    )
    r = registry.get("q_tpch_q6").fn(spark, out).collect()[0]
    assert r["n_lines"] == 2
    assert abs(r["revenue"] - (100 * 0.05 + 100 * 0.07)) < 1e-9
