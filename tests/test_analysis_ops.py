"""Semantic tests for the analysis operators (timeseries / profile /
fuzzy join / quantization — SURVEY.md §2B B20b, B58d, B65, B66).

The oracle sweep (tools/check_oracle.py) already proves Spark ≡ DuckDB
cell-for-cell; these tests assert the *semantics* both engines must
share: the resampled grid is dense and forward-filled, the profile is
internally consistent, the fuzzy join resolves every typo to its
source, and quantization saturates at ±127 exactly once per vector.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from asyncdatapipeline_spark import registry


def test_ts_resample_grid_is_dense_and_ffilled(spark, sf_dir):
    out = registry.get("q_ts_resample").fn(spark, sf_dir).cache()
    try:
        # dense: per user, (max-min)/1h + 1 buckets, each exactly once
        per_user = out.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("bucket").alias("nd"),
            (
                (
                    F.max("bucket").cast("long") - F.min("bucket").cast("long")
                )
                / 3600
                + 1
            ).cast("long").alias("expect"),
        )
        bad = per_user.filter(
            (F.col("n") != F.col("expect")) | (F.col("nd") != F.col("n"))
        )
        assert bad.count() == 0, bad.limit(5).collect()

        # gap rows are exactly the n_events=0 rows and carry a value
        # forward (every user's first bucket is real data by span
        # construction, so no gap row may have a NULL ffill)
        gaps = out.filter(F.col("gap_filled"))
        assert gaps.count() == out.filter(F.col("n_events") == 0).count()
        assert gaps.filter(F.col("avg_value_ffill").isNull()).count() == 0
        assert gaps.count() > 0, "fixture span has no gaps — test is vacuous"
    finally:
        out.unpersist()


def test_profile_internally_consistent(spark, sf_dir):
    rows = {
        r["column_name"]: r
        for r in registry.get("q_profile").fn(spark, sf_dir).collect()
    }
    from asyncdatapipeline_spark.sources.tables import load_table

    n = load_table(spark, sf_dir, "lineitem").count()
    assert set(rows) == {"l_quantity", "l_extendedprice", "l_discount", "l_tax"}
    for r in rows.values():
        assert r["n_rows"] == n
        assert 0 <= r["n_null"] <= n
        assert 1 <= r["n_distinct"] <= n - r["n_null"]
        assert r["min_val"] <= r["mean_val"] <= r["max_val"]


def test_fuzzy_join_resolves_every_typo_to_its_source(spark, sf_dir):
    out = registry.get("q_join_fuzzy").fn(spark, sf_dir)
    from asyncdatapipeline_spark.sources.tables import load_table

    nations = {
        r["n_nationkey"]: r["n_name"]
        for r in load_table(spark, sf_dir, "nation").collect()
    }
    got = out.collect()
    assert len(got) == len(nations)
    for r in got:
        # dropping one char costs exactly 1 edit; the source name is the
        # unique best match in this dimension
        assert r["matched_name"] == nations[r["typo_id"]]
        assert r["dist"] == 1


def test_quantize_saturates_and_roundtrips(spark, sf_dir):
    out = registry.get("q_embed_quantize").fn(spark, sf_dir).cache()
    try:
        assert out.filter(F.col("n_dims") != 64).count() == 0
        # symmetric max-abs quantization: the largest-|x| element maps to
        # exactly ±127 in every nonzero vector
        codes = out.select(
            "vec_id",
            F.transform(
                F.split("q_str", ","), lambda s: F.abs(s.cast("int"))
            ).alias("a"),
            "scale",
        )
        nonzero = codes.filter(F.col("scale") > 0)
        assert nonzero.filter(F.array_max("a") != 127).count() == 0
        # codes never exceed the int8 range
        assert codes.filter(F.array_max("a") > 127).count() == 0
    finally:
        out.unpersist()


def test_histogram_covers_every_row_exactly_once(spark, sf_dir):
    out = registry.get("q_agg_histogram").fn(spark, sf_dir)
    from asyncdatapipeline_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    rows = out.collect()
    assert sum(r["n_items"] for r in rows) == li.count()
    for r in rows:
        assert r["bucket_lo"] == r["bucket"] * 10_000
    # buckets are distinct and ordered
    buckets = [r["bucket"] for r in rows]
    assert buckets == sorted(set(buckets))


def test_weighted_sample_is_deterministic_and_weight_biased(spark, sf_dir):
    fn = registry.get("q_sample_weighted").fn
    a = {r["doc_id"] for r in fn(spark, sf_dir).collect()}
    b = {r["doc_id"] for r in fn(spark, sf_dir).collect()}
    assert a == b and len(a) == 100
    from asyncdatapipeline_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    corpus_en = (
        d.filter(F.col("lang") == "en").count() / d.count()
    )
    sample_en = (
        fn(spark, sf_dir).filter(F.col("lang") == "en").count() / 100
    )
    # en weight is 3x: its sample share must exceed its corpus share
    assert sample_en > corpus_en


def test_centroids_cover_corpus_and_dims(spark, sf_dir):
    out = registry.get("q_embed_centroids").fn(spark, sf_dir).collect()
    from asyncdatapipeline_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    assert sum(r["n_vecs"] for r in out) == e.count()
    for r in out:
        vals = r["centroid_q6"].split(",")
        assert len(vals) == 64
        # micro-unit means of unit-scale floats stay inside ±1e6
        assert all(abs(int(v)) <= 1_000_000 for v in vals)


def test_range_frame_counts_only_trailing_hour(spark, sf_dir):
    out = registry.get("q_win_range_time").fn(spark, sf_dir)
    # every row's frame includes itself; a frame can never out-count the
    # user's total events
    from asyncdatapipeline_spark.sources.tables import load_table

    totals = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .count()
        .withColumnRenamed("count", "total")
    )
    joined = out.join(totals, "user_id")
    assert joined.filter(F.col("n_1h") < 1).count() == 0
    assert joined.filter(F.col("n_1h") > F.col("total")).count() == 0
    # spot-check one user against a driver-side recompute
    rows = sorted(
        out.filter(F.col("user_id") == out.first()["user_id"]).collect(),
        key=lambda r: (r["epoch_s"], r["event_id"]),
    )
    for i, r in enumerate(rows):
        expect = sum(1 for o in rows if r["epoch_s"] - 3600 <= o["epoch_s"] <= r["epoch_s"])
        assert r["n_1h"] == expect


def test_funnel_is_monotone_and_bounded(spark, sf_dir):
    rows = {
        r["step_no"]: r
        for r in registry.get("q_funnel").fn(spark, sf_dir).collect()
    }
    assert set(rows) == {1, 2, 3}
    total = rows[1]["n_users_total"]
    counts = [rows[i]["n_users"] for i in (1, 2, 3)]
    # each stage can only lose users, never gain
    assert total >= counts[0] >= counts[1] >= counts[2] >= 0


def test_anomaly_flags_are_actually_extreme(spark, sf_dir):
    out = registry.get("q_anomaly").fn(spark, sf_dir).collect()
    from asyncdatapipeline_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "events")
    # every flagged row really is |z| > 3, and flags are rare (< 5% of
    # the stream — 3 sigma on any non-degenerate distribution)
    assert all(abs(r["z"]) > 3 for r in out)
    assert 0 < len(out) < 0.05 * e.count()


def test_vocab_counts_are_consistent(spark, sf_dir):
    rows = registry.get("q_text_vocab").fn(spark, sf_dir).collect()
    from asyncdatapipeline_spark.sources.tables import load_table

    n_docs = load_table(spark, sf_dir, "documents").count()
    assert 0 < len(rows) <= 100
    occs = [r["n_occ"] for r in rows]
    assert occs == sorted(occs, reverse=True)
    for r in rows:
        # a word can't appear in more docs than exist, and n_occ >= n_docs
        assert 1 <= r["n_docs"] <= min(r["n_occ"], n_docs)


def test_dq_report_passes_on_clean_fixtures(spark, sf_dir):
    rows = {r["rule"]: r for r in registry.get("q_dq_report").fn(spark, sf_dir).collect()}
    assert set(rows) == {
        "l_quantity_in_1_50",
        "l_discount_in_unit",
        "l_orderkey_in_orders",
        "o_totalprice_positive",
    }
    # the driver fixtures are clean by construction — all rules green,
    # all checked counts positive
    for r in rows.values():
        assert r["passed"] and r["n_violations"] == 0 and r["n_checked"] > 0


def test_not_in_null_semantics_match_duckdb(spark):
    """The q_join_null_anti idiom is TRI-VALUED: one NULL in the
    subquery column makes `x NOT IN (...)` UNKNOWN for every x, so the
    result is EMPTY — in both engines. The fixtures have no NULL keys,
    so this pins the semantics the operator exists for."""
    import duckdb

    spark.createDataFrame(
        [(1,), (2,), (3,)], "k BIGINT"
    ).createOrReplaceTempView("probe_t")
    spark.createDataFrame(
        [(2,), (None,)], "k BIGINT"
    ).createOrReplaceTempView("sub_t")
    sql = "SELECT k FROM probe_t WHERE k NOT IN (SELECT k FROM sub_t)"
    assert spark.sql(sql).count() == 0
    con = duckdb.connect()
    con.sql("CREATE TABLE probe_t AS SELECT * FROM (VALUES (1), (2), (3)) v(k)")
    con.sql("CREATE TABLE sub_t AS SELECT * FROM (VALUES (2), (NULL)) v(k)")
    assert len(con.sql(sql).fetchall()) == 0
    # and without the NULL, both engines agree on {1, 3}
    spark.createDataFrame([(2,)], "k BIGINT").createOrReplaceTempView("sub_t")
    assert {r["k"] for r in spark.sql(sql).collect()} == {1, 3}


def test_agg_trend_recovers_planted_slope(spark, tmp_path_factory):
    """q_agg_trend on a synthetic corpus with a KNOWN linear law must
    recover it exactly: type 'lin' has y = 10 + 3x events on day x
    (slope 3, intercept 10, R² = 1), type 'flat' has a constant 5/day
    (slope 0, R² NULL-or-0 ... exactly 0 here: syy term nonzero)."""
    import datetime

    from asyncdatapipeline_spark import registry

    rows = []
    eid = 0
    base = datetime.datetime(2024, 3, 1)
    for x in range(10):
        day = base + datetime.timedelta(days=x)
        for _ in range(10 + 3 * x):
            rows.append((eid, day, 1, "lin", 0.0, "{}")); eid += 1
        for _ in range(5):
            rows.append((eid, day, 2, "flat", 0.0, "{}")); eid += 1
    out = tmp_path_factory.mktemp("trend")
    spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING,"
        " value DOUBLE, props STRING",
    ).write.mode("overwrite").parquet(str(out / "events.parquet"))
    res = {
        r["event_type"]: r
        for r in registry.get("q_agg_trend").fn(spark, str(out)).collect()
    }
    lin, flat = res["lin"], res["flat"]
    assert lin["n"] == 10 and lin["slope"] == 3.0 and lin["intercept"] == 10.0
    assert lin["r2"] == 1.0
    assert flat["slope"] == 0.0 and flat["intercept"] == 5.0
    # constant series: corr numerator 0, denominator 0 (syy term) → NULL
    assert flat["r2"] is None


def test_split_group_is_leakage_safe(spark, sf_dir):
    """Every source maps to exactly one split (the property q_split_hash
    does NOT have — doc-level hashing straddles sources by design)."""
    from asyncdatapipeline_spark import registry

    rows = registry.get("q_split_group").fn(spark, sf_dir).collect()
    by_source = {}
    for r in rows:
        by_source.setdefault(r["source"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_source.values())
    # and the doc-level split really does straddle at least one source
    doc_rows = registry.get("q_split_hash").fn(spark, sf_dir).collect()
    doc_splits = {r["doc_id"]: r["split"] for r in doc_rows}
    src_of = {r["doc_id"]: r["source"] for r in rows}
    doc_by_source = {}
    for did, sp in doc_splits.items():
        doc_by_source.setdefault(src_of[did], set()).add(sp)
    assert any(len(s) > 1 for s in doc_by_source.values())


def test_profile_drift_flags_planted_shift(spark, sf_dir, tmp_path_factory):
    """The fixture's month halves are iid (PSI ~ 0 — the sweep only
    proves the arithmetic), so plant a real distribution shift: the
    second half's values move up two bins for one event type; its PSI
    must cross the 0.2 gate while the untouched types stay below."""
    import datetime

    from asyncdatapipeline_spark import registry
    from asyncdatapipeline_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-16 00:00:00").cast("timestamp")
    shifted = e.withColumn(
        "value",
        F.when(
            (F.col("event_type") == "click") & (F.col("ts") >= cut),
            F.col("value") + 120.0,  # ~2.4 bins of width 50
        ).otherwise(F.col("value")),
    )
    out = tmp_path_factory.mktemp("drift")
    shifted.write.mode("overwrite").parquet(str(out / "events.parquet"))
    rows = {
        r["event_type"]: r
        for r in registry.get("q_profile_drift").fn(spark, str(out)).collect()
    }
    assert rows["click"]["drifted"], f"planted shift not flagged: {rows['click']}"
    # At sf0.001 the untouched types carry real small-sample PSI noise
    # (~90 events/era ⇒ ~9/bin), so the discriminative assertion is
    # relative: the planted shift must dominate every natural PSI.
    for t, r in rows.items():
        if t != "click":
            assert rows["click"]["psi"] > r["psi"] * 2, (
                f"planted drift ({rows['click']['psi']}) does not dominate "
                f"{t}'s sampling noise ({r['psi']})"
            )


def test_zipf_fit_discriminates_natural_from_uniform(spark, sf_dir, tmp_path_factory):
    """The synthetic fixture's near-uniform word soup honestly fits
    flat (slope ~ -0.18, R2 ~ 0.06 — the 'not natural text' verdict);
    a planted 1/rank corpus must fit steep and tight."""
    from asyncdatapipeline_spark import registry

    words = [f"w{i}" for i in range(1, 201)]
    docs = []
    did = 0
    # word i appears ~ 2000/i times, chopped into 50-word docs
    stream = []
    for i, w in enumerate(words, start=1):
        stream.extend([w] * (2000 // i))
    for k in range(0, len(stream), 50):
        docs.append((did, " ".join(stream[k:k + 50]), "en", "zipf", 0))
        did += 1
    out = tmp_path_factory.mktemp("zipf")
    spark.createDataFrame(
        docs, "doc_id BIGINT, text STRING, lang STRING, source STRING,"
        " n_chars INT"
    ).write.mode("overwrite").parquet(str(out / "documents.parquet"))
    row = registry.get("q_text_zipf").fn(spark, str(out)).collect()[0]
    assert row["zipf_slope"] < -0.8, row
    assert row["r2"] > 0.9, row
    fixture = registry.get("q_text_zipf").fn(spark, sf_dir).collect()[0]
    assert fixture["zipf_slope"] > -0.5, fixture  # uniform soup fits flat


def test_markov_rows_are_proper_distributions(spark, sf_dir):
    rows = registry.get("q_events_markov").fn(spark, sf_dir).collect()
    from collections import defaultdict

    by_from = defaultdict(list)
    for r in rows:
        assert r["n_trans"] > 0 and 0 < r["p"] <= 1
        by_from[r["from_type"]].append(r)
    for f, rs in by_from.items():
        assert abs(sum(r["p"] for r in rs) - 1.0) < 1e-4, (f, rs)


def test_entropy_balance_bounds_and_uniform_case(spark, sf_dir, tmp_path_factory):
    rows = registry.get("q_agg_entropy").fn(spark, sf_dir).collect()
    for r in rows:
        assert 0 < r["balance"] <= 1.0 + 1e-9, r
        assert r["entropy_nats"] >= 0
    # planted perfectly-uniform 4-language source → balance ~ 1
    docs = [
        (i, f"text {i}", lang, "uni", 10)
        for i, lang in enumerate(["en", "de", "fr", "es"] * 25)
    ]
    out = tmp_path_factory.mktemp("entropy")
    spark.createDataFrame(
        docs, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars INT"
    ).write.mode("overwrite").parquet(str(out / "documents.parquet"))
    u = registry.get("q_agg_entropy").fn(spark, str(out)).collect()[0]
    assert u["n_langs"] == 4 and abs(u["balance"] - 1.0) < 1e-6


def test_gini_extremes(spark, sf_dir, tmp_path_factory):
    """Equal order values → Gini ~ 0; one whale holding ~all value →
    Gini → 1 (bounded by (n-1)/n)."""
    equal = [(i, 1, "F", 100.0, None, "EQ") for i in range(100)]
    whale = [(1000 + i, 2, "F", 0.01, None, "WH") for i in range(99)]
    whale.append((1999, 2, "F", 1_000_000.0, None, "WH"))
    out = tmp_path_factory.mktemp("gini")
    spark.createDataFrame(
        equal + whale,
        "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,"
        " o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority STRING",
    ).write.mode("overwrite").parquet(str(out / "orders.parquet"))
    rows = {
        r["o_orderpriority"]: r
        for r in registry.get("q_agg_gini").fn(spark, str(out)).collect()
    }
    assert abs(rows["EQ"]["gini"]) < 1e-9
    assert rows["WH"]["gini"] > 0.95


def test_streak_matches_python_reference(spark, sf_dir):
    from asyncdatapipeline_spark.sources.tables import load_table

    rows = {
        r["user_id"]: r
        for r in registry.get("q_win_streak").fn(spark, sf_dir).collect()
    }
    days = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("d"))
        .distinct()
        .collect()
    )
    from collections import defaultdict

    per_user = defaultdict(set)
    for r in days:
        per_user[r["user_id"]].add(r["d"])
    import datetime

    for uid, ds in per_user.items():
        sds = sorted(ds)
        longest = cur = 1
        streaks = 1
        for a, b in zip(sds, sds[1:]):
            if (b - a).days == 1:
                cur += 1
            else:
                streaks += 1
                cur = 1
            longest = max(longest, cur)
        r = rows[uid]
        assert r["longest_streak"] == longest and r["n_streaks"] == streaks
        assert r["n_active_days"] == len(ds)


def test_corrupt_json_scan_is_reinvocable(spark, sf_dir):
    """Regression (round-6 ADVICE): q_scan_json_corrupt must not mutate the
    shared module-level REGION_SCHEMA via StructType.add — a second
    invocation in the same process used to append a duplicate bad_raw
    field and fail the schema'd read with an AnalysisException."""
    fn = registry.get("q_scan_json_corrupt").fn
    first = fn(spark, sf_dir).collect()
    second = fn(spark, sf_dir).collect()  # used to raise duplicate-column
    assert first == second
    from asyncdatapipeline_spark.operators.scans import REGION_SCHEMA

    assert [f.name for f in REGION_SCHEMA.fields] == ["r_regionkey", "r_name"]


def test_seasonality_counts_absent_weekdays(spark, sf_dir, tmp_path_factory):
    """Regression (round-6 ADVICE): an event type active on ONE weekday
    only must produce chi2 = 6 * n/7 (six zero-cells contribute their
    (0 - n/7)^2 / (n/7) = n/7 terms) — summing only observed cells used
    to report just the single (n - n/7)^2/(n/7) = 36n/49 term."""
    import math

    tmp = str(tmp_path_factory.mktemp("season"))
    # 70 events, all on Mondays (2024-01-01 is a Monday), one type
    rows = [
        ("mondays", f"u{i}", "2024-01-%02d 12:00:00" % (1 + 7 * (i % 5)))
        for i in range(70)
    ]
    spark.createDataFrame(
        [(t, u, ts) for t, u, ts in rows], "event_type string, user_id string, ts_s string"
    ).select(
        "event_type", "user_id", F.col("ts_s").cast("timestamp").alias("ts")
    ).write.mode("overwrite").parquet(tmp + "/events.parquet")
    out = registry.get("q_ts_seasonality").fn(spark, tmp).collect()
    assert len(out) == 1
    r = out[0]
    n = 70
    exp = n / 7.0
    expected_chi2 = round((n - exp) ** 2 / exp + 6 * (0 - exp) ** 2 / exp, 6)
    assert r["n_events"] == n and r["n_days_active"] == 1
    assert math.isclose(r["chi2"], expected_chi2, rel_tol=1e-9), (
        r["chi2"],
        expected_chi2,
    )
    assert bool(r["weekly_pattern"]) is True
