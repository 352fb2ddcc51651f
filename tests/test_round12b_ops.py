"""Planted-case gates for the round-12 additions (second batch):
Kruskal-Wallis on a no-ties 2×2 split (H = 2.4 by hand), Mood's median
on the same split (χ² = 4/3), Bartlett on variances 1 vs 4, Friedman on
a perfectly consistent 3-day panel (Q = 3, the k=2/b=3 maximum),
Bollinger on a planted spike (breach fires exactly once), RSI at its
pinned extremes (monotone ramp → 100, flat → neutral 50), MACD on a
constant series (identically 0), and closeness/harmonic on a planted
path graph (hand-counted hop sums).

The oracle sweep pins values against DuckDB; these pin SEMANTICS
against hand-computable fixtures.
"""

from __future__ import annotations

import datetime
import math
import os

from asyncdatapipeline_spark import registry

EVT = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _write(spark, out, table, rows, schema):
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        os.path.join(out, f"{table}.parquet")
    )


def _day(i: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(days=i)


def _events(spark, out, rows):
    """rows of (value, event_type, day_index)."""
    _write(
        spark,
        out,
        "events",
        [(i, _day(d), 1, et, float(v), "{}") for i, (v, et, d) in enumerate(rows)],
        EVT,
    )


def test_kruskal_no_ties_hand_value(spark, tmp_path_factory):
    """A = {1, 2}, B = {3, 4}: ranks 1..4, R_A = 3, R_B = 7 →
    H = 12/(4·5)·(9/2 + 49/2) − 3·5 = 2.4; no ties → correction 1."""
    out = str(tmp_path_factory.mktemp("kw"))
    _events(spark, out, [(1, "a", 0), (2, "a", 0), (3, "b", 0), (4, "b", 0)])
    row = registry.get("q_agg_kruskal").fn(spark, out).collect()[0]
    assert row["n"] == 4 and row["k"] == 2
    assert row["tie_correction"] == 1.0
    assert math.isclose(row["h"], 2.4, abs_tol=1e-9)
    assert math.isclose(row["h_corrected"], 2.4, abs_tol=1e-9)


def test_moods_median_hand_chi2(spark, tmp_path_factory):
    """Same split: grand median = 3 (lower-median pick 2·cum ≥ N+1),
    only 4 lies above → χ² = 2·((0.5²/0.5) + (0.5²/1.5)) = 4/3."""
    out = str(tmp_path_factory.mktemp("mm"))
    _events(spark, out, [(1, "a", 0), (2, "a", 0), (3, "b", 0), (4, "b", 0)])
    row = registry.get("q_agg_moods_median").fn(spark, out).collect()[0]
    assert row["median"] == 3.0 and row["m_above"] == 1
    assert row["df"] == 1
    assert math.isclose(row["chi2"], 4.0 / 3.0, abs_tol=1e-6)


def test_bartlett_variances_one_and_four(spark, tmp_path_factory):
    """A = {1,2,3} (s² = 1), B = {2,4,6} (s² = 4): pooled 2.5,
    T = (4·ln 2.5 − 2·ln 4) / (1 + (1 − 1/4)/3) = 0.714057…"""
    out = str(tmp_path_factory.mktemp("bt"))
    _events(
        spark,
        out,
        [(1, "a", 0), (2, "a", 0), (3, "a", 0), (2, "b", 0), (4, "b", 0), (6, "b", 0)],
    )
    row = registry.get("q_agg_bartlett").fn(spark, out).collect()[0]
    assert row["n"] == 6 and row["k"] == 2 and row["df"] == 1
    assert math.isclose(row["pooled_var"], 2.5, abs_tol=1e-9)
    t = (4 * math.log(2.5) - 2 * math.log(4.0)) / (1 + (1 - 0.25) / 3)
    assert math.isclose(row["t_stat"], t, abs_tol=1e-6)


def test_friedman_consistent_panel_is_maximal(spark, tmp_path_factory):
    """3 days × 2 types, type b always higher → perfect consistency:
    Q = (k−1)·Σ(R2_j − b(k+1))² / (Σr2² − bk(k+1)²) = 18/6 = 3,
    the k = 2, b = 3 maximum."""
    out = str(tmp_path_factory.mktemp("fr"))
    rows = []
    for d in range(3):
        rows += [(1, "a", d), (5, "b", d)]
    _events(spark, out, rows)
    row = registry.get("q_agg_friedman").fn(spark, out).collect()[0]
    assert row["b"] == 3 and row["k"] == 2 and row["df"] == 1
    assert math.isclose(row["q_stat"], 3.0, abs_tol=1e-9)


def test_bollinger_spike_breaches_upper_band(spark, tmp_path_factory):
    """7 flat days then a 10× spike: the flat row has σ = 0 and no
    breach; the spike day's own window still flags breach_hi
    (100 > 160/7 + 2·34.0168…)."""
    out = str(tmp_path_factory.mktemp("bb"))
    rows = [(10, "a", d) for d in range(7)] + [(100, "a", 7)]
    _events(spark, out, rows)
    got = {
        r["day"].day: r
        for r in registry.get("q_ts_bollinger").fn(spark, out).collect()
    }
    flat = got[7]  # day index 6 → Jan 7
    assert flat["ma"] == 10.0 and flat["sd"] == 0.0
    assert not flat["breach_hi"] and not flat["breach_lo"]
    spike = got[8]
    assert math.isclose(spike["ma"], 160.0 / 7.0, abs_tol=1e-6)
    s2, s1 = 600.0 + 10000.0, 160.0
    sd = math.sqrt((s2 - s1 * s1 / 7) / 6)
    assert math.isclose(spike["sd"], sd, abs_tol=1e-6)
    assert spike["breach_hi"] and not spike["breach_lo"]


def test_rsi_pinned_extremes(spark, tmp_path_factory):
    """Monotone ramp → all gains → RSI = 100; flat series → no gains,
    no losses → pinned to the neutral 50."""
    out = str(tmp_path_factory.mktemp("rsi"))
    rows = [(10 + d, "up", d) for d in range(15)]
    rows += [(7, "flat", d) for d in range(15)]
    _events(spark, out, rows)
    got = {
        (r["event_type"], r["day"].day): r["rsi"]
        for r in registry.get("q_ts_rsi").fn(spark, out).collect()
    }
    assert got[("up", 15)] == 100.0
    assert got[("flat", 15)] == 50.0


def test_macd_constant_series_is_zero(spark, tmp_path_factory):
    """Constant totals: fast EMA = slow EMA = signal = the constant →
    MACD, signal crossover and histogram are identically 0."""
    out = str(tmp_path_factory.mktemp("macd"))
    _events(spark, out, [(42, "a", d) for d in range(20)])
    rows = registry.get("q_ts_macd").fn(spark, out).collect()
    assert rows  # warmed rows exist
    for r in rows:
        assert r["macd"] == 0.0 and r["signal_line"] == 0.0
        assert r["histogram"] == 0.0


def test_closeness_on_planted_path(spark, tmp_path_factory):
    """Path 0–1–2–3 (each co-purchase pair planted in two orders to
    clear the support-2 bar): anchor 0 reaches at 1+2+3 = 6,
    closeness 0.5, harmonic (60+30+20)/60 = 1.833333; anchor 1 at
    1+1+2, closeness 0.75, harmonic (60+60+30)/60 = 2.5."""
    out = str(tmp_path_factory.mktemp("clo"))
    rows = []
    oid = 0
    for u, v in [(0, 1), (1, 2), (2, 3)]:
        for _ in range(2):  # support ≥ 2
            rows += [(oid, u), (oid, v)]
            oid += 1
    _write(spark, out, "lineitem", rows, "l_orderkey long, l_partkey long")
    got = {
        r["anchor"]: r
        for r in registry.get("q_graph_closeness").fn(spark, out).collect()
    }
    assert set(got) == {0, 1, 2, 3}
    assert got[0]["n_reached"] == 3 and got[0]["sum_dist"] == 6
    assert math.isclose(got[0]["closeness"], 0.5, abs_tol=1e-9)
    assert math.isclose(got[0]["harmonic"], round(110 / 60, 6), abs_tol=1e-9)
    assert got[1]["n_reached"] == 3 and got[1]["sum_dist"] == 4
    assert math.isclose(got[1]["closeness"], 0.75, abs_tol=1e-9)
    assert math.isclose(got[1]["harmonic"], 2.5, abs_tol=1e-9)


def test_flap_interleaved_vs_block(spark, tmp_path_factory):
    """User 1 interleaves error/click (9 toggles in 10 events, rate 1);
    user 2 has the same 5 errors in one block (1 toggle, rate 1/9).
    Only user 1 flaps."""
    out = str(tmp_path_factory.mktemp("flap"))
    rows = []
    eid = 0
    for i in range(10):  # user 1: e c e c e c e c e c
        rows.append((eid, _day(0).replace(minute=i), 1,
                     "error" if i % 2 == 0 else "click", 1.0, "{}"))
        eid += 1
    for i in range(10):  # user 2: c c c e e e e e c c
        rows.append((eid, _day(0).replace(minute=i), 2,
                     "error" if 3 <= i <= 7 else "click", 1.0, "{}"))
        eid += 1
    _write(spark, out, "events", rows, EVT)
    got = {r["user_id"]: r
           for r in registry.get("q_events_flap").fn(spark, out).collect()}
    assert got[1]["n_toggles"] == 9 and got[1]["flapping"]
    assert math.isclose(got[1]["toggle_rate"], 1.0, abs_tol=1e-9)
    assert got[2]["n_toggles"] == 2 and not got[2]["flapping"]
    assert math.isclose(got[2]["toggle_rate"], 2.0 / 9.0, abs_tol=1e-6)


def test_adversarial_detects_planted_length_shift(spark, tmp_path_factory):
    """Old half: short docs; new half: long docs. The chars feature
    separates perfectly (AUC = 1); the space ratio is identical in
    both halves (AUC = 0.5, midranks over one tie run)."""
    out = str(tmp_path_factory.mktemp("adv"))
    # ids 0..9 short, 10..19 long; NO strip — "ab " repeated keeps the
    # space ratio at exactly 1/3 in both halves
    rows = []
    for i in range(20):
        text = "ab " * (5 if i < 10 else 50)
        rows.append((i, text, "en", "s", len(text)))
    _write(spark, out, "documents", rows,
           "doc_id long, text string, lang string, source string, n_chars long")
    got = {r["feature"]: r
           for r in registry.get("q_ml_adversarial").fn(spark, out).collect()}
    assert got["chars"]["auc"] == 1.0 and got["chars"]["drifted"]
    assert got["space_ratio"]["auc"] == 0.5
    assert not got["space_ratio"]["drifted"]
    assert got["punct_ratio"]["auc"] == 0.5  # no punctuation anywhere
