"""Planted-fixture semantic tests for the round-7 operators.

Round 7's theme is scale-safe rank statistics: the exact trio
(q_agg_spearman / q_agg_mannwhitney / q_agg_ks) moved from global
unpartitioned windows to distributed distinct-value cumsums
(``dist_cumsum``), and each gained a KLL sketch twin. These tests plant
inputs with hand-computable answers and additionally assert the
DISTRIBUTION of the cumsum device (multiple range buckets actually
used)."""

from __future__ import annotations

from pyspark.sql import functions as F

from asyncdatapipeline_spark import registry
from asyncdatapipeline_spark.operators._util import dist_cumsum


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


def _write_lineitem_xy(spark, out, pairs):
    """Minimal lineitem with (l_quantity, l_extendedprice) = pairs."""
    spark.createDataFrame(
        [(float(x), float(y)) for x, y in pairs],
        "l_quantity double, l_extendedprice double",
    ).select(
        "l_quantity",
        "l_extendedprice",
        F.lit(0.05).alias("l_discount"),
        F.lit(0.02).alias("l_tax"),
        F.lit("N").alias("l_returnflag"),
        F.lit("O").alias("l_linestatus"),
    ).write.mode("overwrite").parquet(str(out / "lineitem.parquet"))


def test_dist_cumsum_matches_prefix_sums_across_buckets(spark):
    """Exact running sums over a shuffled, tied key set must equal the
    hand prefix sums, and the range device must actually spread the
    frame over >1 bucket (the whole point vs an unpartitioned
    window)."""
    import random

    rng = random.Random(7)
    vals = [float(v) for v in range(50) for _ in range(rng.randint(1, 3))]
    rng.shuffle(vals)
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    g = df.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
    out = {
        r["v"]: r["cum_c"]
        for r in dist_cumsum(g, "v", ["c"], nparts=8).collect()
    }
    # hand prefix sums over sorted distinct values
    from collections import Counter

    cnt = Counter(vals)
    run = 0
    for v in sorted(cnt):
        run += cnt[v]
        assert out[v] == run, f"cum at {v}: {out[v]} != {run}"
    # the device must use >1 range bucket for 50 distinct values
    nbuckets = (
        g.repartitionByRange(8, F.col("v"))
        .select(F.spark_partition_id().alias("p"))
        .distinct()
        .count()
    )
    assert nbuckets > 1


def test_spearman_exact_and_kll_on_planted_monotone(spark, tmp_path_factory):
    """y = x^2 over distinct x: perfectly monotone, so rho_s = 1
    exactly (Pearson on the same data would be < 1), and the KLL twin
    must land inside its band."""
    out = tmp_path_factory.mktemp("sp7")
    pairs = [(i, i * i) for i in range(1, 1001)]
    _write_lineitem_xy(spark, out, pairs)
    r = registry.get("q_agg_spearman").fn(spark, str(out)).collect()[0]
    assert r["n"] == 1000 and r["spearman_rho"] == 1.0
    rk = registry.get("q_agg_spearman_kll").fn(spark, str(out)).collect()[0]
    assert rk["rho_exact"] == 1.0 and bool(rk["kll_within_band"])


def test_spearman_ties_use_midranks(spark, tmp_path_factory):
    """x = {1,1,2}, y = {10,10,20}: tied pairs, rho = 1 with midranks
    (competition ranks without the tie term would disagree with the
    closed form)."""
    out = tmp_path_factory.mktemp("sp7t")
    _write_lineitem_xy(spark, out, [(1, 10), (1, 10), (2, 20)])
    r = registry.get("q_agg_spearman").fn(spark, str(out)).collect()[0]
    assert r["n"] == 3 and r["spearman_rho"] == 1.0


def test_mannwhitney_kll_effect_size_on_planted_shift(
    spark, tmp_path_factory
):
    """purchase values 1000..1999 all above view values 0..999:
    P(view <= purchase) = 1, so p_exact = 1 and the sketch estimate
    must sit within the band."""
    out = tmp_path_factory.mktemp("mwk7")
    rows = []
    for i in range(1000):
        rows.append((i, "2024-01-01 00:00:00", 1, "view", float(i)))
        rows.append(
            (10_000 + i, "2024-01-01 01:00:00", 1, "purchase", 1000.0 + i)
        )
    _write_events(spark, out, rows)
    r = registry.get("q_agg_mannwhitney_kll").fn(spark, str(out)).collect()[0]
    assert (r["na"], r["nb"]) == (1000, 1000)
    assert r["p_exact"] == 1.0 and bool(r["kll_within_band"])


def test_rfm_approx_agrees_with_exact_on_spread_values(
    spark, tmp_path_factory
):
    """200 customers, frequency spread over 1..20, distinct monetary
    and recency per customer: boundary assignment must agree with
    exact ntile within every band (r/m near-exact, f by MAE), and the
    exact champion count must match the ntile-based one."""
    out = tmp_path_factory.mktemp("rfma7")
    import datetime

    rows = []
    d0 = datetime.date(2024, 1, 1)
    okey = 0
    for c in range(200):
        freq = (c % 20) + 1
        for k in range(freq):
            rows.append(
                (
                    okey,
                    c,
                    str(d0 + datetime.timedelta(days=c)),
                    100.0 + c * 7.13 + k,
                )
            )
            okey += 1
    spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, od string, o_totalprice double"
    ).select(
        "o_orderkey",
        "o_custkey",
        F.col("od").cast("date").alias("o_orderdate"),
        "o_totalprice",
    ).write.mode("overwrite").parquet(str(out / "orders.parquet"))
    r = registry.get("q_rfm_approx").fn(spark, str(out)).collect()[0]
    assert r["n_customers"] == 200
    assert bool(r["r_agree_ok"]) and bool(r["f_mae_ok"]) and bool(
        r["m_agree_ok"]
    )


def test_generation_commit_crash_leaves_prior_current(spark, tmp_path):
    """The kill-mid-write proof for the generation protocol: a
    generation written WITHOUT its _COMMITTED marker (= crash between
    data write and commit) must stay invisible — readers keep the
    prior generation — and the next successful commit must GC the
    wreck."""
    from asyncdatapipeline_spark.sources import generations as G

    store = str(tmp_path / "store")
    a = spark.range(5).withColumnRenamed("id", "v")
    g1 = G.commit_generation(a, store)
    assert G.latest_generation(spark, store) == g1

    # simulate the crash: data (+ Spark _SUCCESS) lands, marker never does
    crashed = G.next_generation_dir(spark, store)
    spark.range(100).write.parquet(crashed)
    assert G.latest_generation(spark, store) == g1  # wreck invisible
    assert spark.read.parquet(G.latest_generation(spark, store)).count() == 5

    b = spark.range(7).withColumnRenamed("id", "v")
    g3 = G.commit_generation(b, store)
    assert G.latest_generation(spark, store) == g3
    assert spark.read.parquet(g3).count() == 7
    nums = [n for n, _, _ in G.list_generations(spark, store)]
    assert 2 not in nums, "crashed generation must be GC'd"


def test_generation_gc_keeps_configured_history(spark, tmp_path):
    from asyncdatapipeline_spark.sources import generations as G

    store = str(tmp_path / "store")
    for i in range(4):
        G.commit_generation(
            spark.range(i + 1).withColumnRenamed("id", "v"), store, keep=2
        )
    gens = G.list_generations(spark, store)
    assert [n for n, _, ok in gens if ok] == [3, 4]
    assert spark.read.parquet(G.latest_generation(spark, store)).count() == 4


def test_link_partitions_reuses_unchanged_files(spark, tmp_path):
    """Restating one partition must not copy the others: linked files
    share an inode with the prior generation (manifest reuse, local-FS
    rendition)."""
    import os

    from asyncdatapipeline_spark.sources import generations as G

    store = str(tmp_path / "store")
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "v long, p string"
    )
    gen1 = G.next_generation_dir(spark, store)
    df.repartition("p").write.partitionBy("p").parquet(gen1)
    G.mark_committed(spark, gen1)

    gen2 = G.next_generation_dir(spark, store)
    spark.createDataFrame([(30, "b")], "v long, p string").repartition(
        "p"
    ).write.partitionBy("p").parquet(gen2)
    G.link_partitions(gen1, gen2, skip_partitions={"p=b"})
    G.mark_committed(spark, gen2)

    back = spark.read.parquet(gen2)
    assert sorted(
        (r["v"], r["p"]) for r in back.collect()
    ) == [(1, "a"), (2, "a"), (30, "b")]
    # every p=a data file in gen2 is a hard link into gen1
    pa = os.path.join(G._local(gen2), "p=a")
    for f in os.listdir(pa):
        if f.endswith(".parquet"):
            st = os.stat(os.path.join(pa, f))
            assert st.st_nlink >= 2, "p=a must be linked, not copied"


def test_cdc_stream_recovers_past_crashed_generation(spark, tmp_path):
    """A crashed (uncommitted) state generation between micro-batch
    runs must be ignored AND cleaned up: the stream restarts from the
    last committed state and still converges to the batch CDC
    result."""
    from asyncdatapipeline_spark import registry
    from asyncdatapipeline_spark.operators.cdc import cdc_feed
    from asyncdatapipeline_spark.sources import generations as G
    from asyncdatapipeline_spark.streaming.curation import (
        read_cdc_state,
        start_cdc_apply_stream,
    )
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    feed = cdc_feed(spark, sf)
    src = str(tmp_path / "feed")
    a, b = feed.randomSplit([0.5, 0.5], seed=11)
    b.coalesce(1).write.mode("overwrite").parquet(src)

    schema = spark.read.parquet(src).schema
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    q = start_cdc_apply_stream(
        spark.readStream.schema(schema).parquet(src), state, ckpt
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(60)

    # crash: a garbage generation lands without a commit marker
    wreck = G.next_generation_dir(spark, state)
    spark.createDataFrame(
        [("XXX", "U", None, "garbage", 10**9)],
        "k string, op string, price double, status string, seq long",
    ).write.parquet(wreck)
    assert "gen-000001" in G.latest_generation(spark, state)

    # second half of the feed arrives; the stream resumes past the wreck
    a.coalesce(1).write.mode("append").parquet(src)
    q = start_cdc_apply_stream(
        spark.readStream.schema(schema).parquet(src), state, ckpt
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(60)

    streamed = {
        (r["k"], float(r["price"]) if r["price"] is not None else None,
         r["status"], r["seq"])
        for r in read_cdc_state(spark, state)
        .filter(F.col("op") != "D")
        .collect()
    }
    batch = {
        (r["o_orderkey"], r["price"], r["status"], r["applied_seq"])
        for r in registry.get("q_cdc_apply").fn(spark, sf).collect()
    }
    assert streamed == batch
    assert all(
        ok for _, _, ok in G.list_generations(spark, state)
    ), "crashed generation must be GC'd after the next commit"


def test_ks_kll_detects_disjoint_supports(spark, tmp_path_factory):
    """Disjoint supports: the ECDF gap reaches exactly 1.0, and the
    grid-probed sketch estimate stays within the band."""
    out = tmp_path_factory.mktemp("ksk7")
    rows = []
    for i in range(1000):
        rows.append((i, "2024-01-01 00:00:00", 1, "view", float(i)))
        rows.append(
            (10_000 + i, "2024-01-01 01:00:00", 1, "purchase", 5000.0 + i)
        )
    _write_events(spark, out, rows)
    r = registry.get("q_agg_ks_kll").fn(spark, str(out)).collect()[0]
    assert r["ks_d"] == 1.0 and bool(r["kll_within_band"])
