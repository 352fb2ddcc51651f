"""Oracle parity at sf0.001 — the in-repo mirror of the driver's t2 gate.

The full-strictness sweep lives in tools/check_oracle.py (run at sf0.01);
this test keeps a fast representative subset in the default pytest run so
regressions in value determinism (float summation order, timestamp
precision, type drift) are caught immediately.
"""

from __future__ import annotations

import math
from collections import Counter

import duckdb
import pytest

from asyncdatapipeline_spark import registry
from asyncdatapipeline_spark.sources.tables import TABLES

SUBSET = [
    "q_agg_hash",
    "q_agg_rollup",
    "q_join_broadcast",
    "q_join_asof",
    "q_win_frame",
    "q_window_session",
    "q_dedup_exact",
    "q_dedup_ngram",
    "q_sim_topk",
    "q_fn_array",
    "q_udaf_pandas",
    "q_subquery_correlated",
    "q_exists_correlated",
    "q_join_bloom",
    "q_join_lateral",
    "q_join_null_anti",
    "q_recursive_cte",
    "q_fn_variant",
]


def test_join_bloom_restores_session_confs(spark, sf_dir):
    """q_join_bloom scopes its 100 TB thresholds to its own plan
    materialization — the session the sweep shares must come back
    exactly as it was."""
    keys = [
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "spark.sql.autoBroadcastJoinThreshold",
    ]
    before = {k: spark.conf.get(k) for k in keys}
    registry.get("q_join_bloom").fn(spark, sf_dir)
    assert {k: spark.conf.get(k) for k in keys} == before


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(df):
    from tools.check_oracle import canon_rows

    return canon_rows(df)


@pytest.mark.parametrize("name", SUBSET)
def test_oracle_parity(spark, sf_dir, duck, name):
    qd = registry.get(name)
    assert qd.oracle, f"{name} has no oracle"
    sdf = qd.fn(spark, sf_dir).toPandas()
    odf = duck.sql(qd.oracle).df()
    scols, srows = _canon(sdf)
    ocols, orows = _canon(odf)
    assert scols == ocols
    assert srows == orows


def test_approx_distinct_tolerance(spark, sf_dir, duck):
    """B23: raw HLL estimate within 5% of DuckDB's exact count — an
    independent check of the sketch itself (the registered query now
    folds this tolerance into its own within_5pct booleans, so this
    test recomputes the RAW estimate rather than trusting those)."""
    from pyspark.sql import functions as F

    from asyncdatapipeline_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    est = {
        r["l_returnflag"]: (r["ao"], r["ap"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_orderkey", 0.02).alias("ao"),
            F.approx_count_distinct("l_partkey", 0.02).alias("ap"),
        )
        .collect()
    }
    exact = duck.sql(
        "SELECT l_returnflag, COUNT(DISTINCT l_orderkey) o, COUNT(DISTINCT l_partkey) p"
        " FROM lineitem GROUP BY 1"
    ).fetchall()
    for flag, o, p in exact:
        eo, ep = est[flag]
        assert math.isclose(eo, o, rel_tol=0.05)
        assert math.isclose(ep, p, rel_tol=0.05)
    # and the registered query's self-asserted tolerance flags hold
    for r in registry.get("q_agg_approx").fn(spark, sf_dir).collect():
        assert r["orders_within_5pct"] and r["parts_within_5pct"]


def test_approx_quantile_tolerance(spark, sf_dir, duck):
    """Raw percentile_approx within 2% of DuckDB's exact quantile (its
    accuracy parameter promises far better; 2% is the loose regression
    floor) — recomputed raw, independent of the query's own booleans."""
    from pyspark.sql import functions as F

    from asyncdatapipeline_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    est = {
        r["l_returnflag"]: (r["m"], r["p"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.percentile_approx(
                "l_extendedprice", F.lit(0.5), F.lit(10000)
            ).alias("m"),
            F.percentile_approx(
                "l_extendedprice", F.lit(0.99), F.lit(10000)
            ).alias("p"),
        )
        .collect()
    }
    exact = duck.sql(
        "SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) m,"
        " quantile_cont(l_extendedprice, 0.99) p FROM lineitem GROUP BY 1"
    ).fetchall()
    for flag, m, p in exact:
        em, ep = est[flag]
        assert math.isclose(em, m, rel_tol=0.02)
        assert math.isclose(ep, p, rel_tol=0.02)
    for r in registry.get("q_agg_approx_quantile").fn(spark, sf_dir).collect():
        assert r["median_within_2pct"] and r["p99_within_2pct"]


def test_sample_mix_fractions_and_determinism(spark, sf_dir):
    """Stratified mixing: per-source sampled counts track the declared
    fractions (binomial tolerance on small strata), and the same seed
    reproduces the same sample exactly."""
    from asyncdatapipeline_spark.llm.text import _MIX_FRACTIONS, sample_mix_counts

    a = {r["source"]: r["n_sampled"] for r in sample_mix_counts(spark, sf_dir).collect()}
    b = {r["source"]: r["n_sampled"] for r in sample_mix_counts(spark, sf_dir).collect()}
    assert a == b  # seeded determinism
    from asyncdatapipeline_spark.sources.tables import load_table

    totals = {
        r["source"]: r["n"]
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    assert a.get("src0", 0) == totals["src0"]  # fraction 1.0 keeps all
    for src, n_total in totals.items():
        frac = _MIX_FRACTIONS.get(src, 0.1)
        got = a.get(src, 0)
        # 4-sigma binomial window
        sigma = (n_total * frac * (1 - frac)) ** 0.5
        assert abs(got - n_total * frac) <= 4 * sigma + 1


def test_hll_sketch_union_tolerance(spark, sf_dir, duck):
    """B23 extension: sketch-union estimate (partial sketches per
    (flag, status) cell, unioned to flag level) within 5% of exact —
    the union must not degrade accuracy beyond plain HLL. Raw estimate
    recomputed here, independent of the query's own boolean."""
    from pyspark.sql import functions as F

    from asyncdatapipeline_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    cells = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.hll_sketch_agg("l_orderkey").alias("sk")
    )
    est = {
        r["l_returnflag"]: r["est"]
        for r in cells.groupBy("l_returnflag")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()
    }
    exact = duck.sql(
        "SELECT l_returnflag, COUNT(DISTINCT l_orderkey) o"
        " FROM lineitem GROUP BY 1"
    ).fetchall()
    for flag, o in exact:
        assert math.isclose(est[flag], o, rel_tol=0.05)
    for r in registry.get("q_agg_hll").fn(spark, sf_dir).collect():
        assert r["union_within_5pct"]


def test_md5_hash64_cross_engine_parity(spark, duck):
    """The md5-derived 64-bit word hash (_MD5_H64_SQL) and the 60-bit
    minhash base hash agree bit-for-bit across Spark, Python, and
    DuckDB — the foundation every dedup/winnow/LSH oracle rests on.
    Referenced from llm/dedup.py; covers multi-byte UTF-8 and the empty
    string."""
    import hashlib

    from pyspark.sql import functions as F

    from asyncdatapipeline_spark.llm.dedup import _MD5_H64_SQL, _MINHASH_P

    samples = ["hello", "", "héllo wörld", "日本語 テスト", "a b c", "x" * 200]
    df = spark.createDataFrame([(s,) for s in samples], ["w"])
    got = {
        r["w"]: (r["h64"], r["h60"])
        for r in df.select(
            "w",
            F.expr(_MD5_H64_SQL.format(c="w")).alias("h64"),
            F.expr(
                f"cast(conv(substr(md5(w), 1, 15), 16, 10) as bigint)"
                f" % {_MINHASH_P}L"
            ).alias("h60"),
        ).collect()
    }
    for s in samples:
        dig = hashlib.md5(s.encode()).hexdigest()
        py64 = int.from_bytes(bytes.fromhex(dig[:16]), "big", signed=True)
        py60 = int(dig[:15], 16) % _MINHASH_P
        d64, d60 = duck.sql(
            "SELECT CAST(CASE WHEN u >= 9223372036854775808::HUGEINT"
            " THEN u::HUGEINT - 18446744073709551616::HUGEINT"
            " ELSE u::HUGEINT END AS BIGINT),"
            " ('0x' || substr(md5(?), 1, 15))::UBIGINT::BIGINT % ?"
            " FROM (SELECT ('0x' || substr(md5(?), 1, 16))::UBIGINT AS u)",
            params=[s, _MINHASH_P, s],
        ).fetchone()
        assert got[s] == (py64, py60) == (d64, d60), s


def test_ann_plane_signs_cross_engine_parity(duck):
    """q_sim_ann's ±1 hyperplane entries: Python _plane_sign matches the
    DuckDB formula embedded in the oracle for every (bit, dim) pair in
    use."""
    from asyncdatapipeline_spark.llm.similarity import _ANN_BITS, _plane_sign

    for i in range(_ANN_BITS):
        for j in range(64):
            (d,) = duck.sql(
                "SELECT CASE WHEN ('0x' || substr(md5('p' || ? || ',' || ?), 1, 2))"
                "::UINTEGER >= 128 THEN 1.0 ELSE -1.0 END",
                params=[i, j],
            ).fetchone()
            assert _plane_sign(i, j) == d, (i, j)


def test_approx_top_k_partials_merge_losslessly(spark, sf_dir):
    """q_agg_heavy's re-aggregation property: frequency-sketch partials
    built over DISJOINT slices of the corpus (per-partition shape) and
    then combined must reproduce the whole-corpus counts exactly while
    the per-group key cardinality fits maxItemsTracked (no evictions).
    This is the persist-partials path — monthly sketch columns rolled up
    to any coarser grain without rescanning raw keys."""
    from pyspark.sql import functions as F

    from asyncdatapipeline_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "events")
    # two disjoint halves by event_id parity — a stand-in for any
    # physical partitioning (file, day, shard)
    halves = [
        e.filter(F.col("event_id") % 2 == i)
        .groupBy("event_type")
        .agg(F.expr("approx_top_k_accumulate(user_id, 10000)").alias("st"))
        for i in (0, 1)
    ]
    merged = (
        halves[0]
        .unionAll(halves[1])
        .groupBy("event_type")
        .agg(
            F.expr(
                "approx_top_k_estimate(approx_top_k_combine(st), 10000)"
            ).alias("est")
        )
    )
    got = {
        r["event_type"]: {x["item"]: x["count"] for x in r["est"]}
        for r in merged.collect()
    }
    exact = (
        e.groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    want: dict = {}
    for r in exact:
        want.setdefault(r["event_type"], {})[r["user_id"]] = r["c"]
    assert got == want

    # and the registered query's booleans hold
    for r in registry.get("q_agg_heavy").fn(spark, sf_dir).collect():
        assert r["sketch_top1_exact"] and r["sketch_top5_exact"]


def test_cogroup_emits_full_outer_keys(spark, sf_dir):
    """q_udf_cogroup must emit a row for keys present on EITHER side:
    users with events but no orders, and customers with orders but no
    events, both appear (with zeros on the absent side)."""
    from pyspark.sql import functions as F

    from asyncdatapipeline_spark.sources.tables import load_table

    out = registry.get("q_udf_cogroup").fn(spark, sf_dir).cache()
    try:
        ev_users = {
            r["user_id"]
            for r in load_table(spark, sf_dir, "events")
            .select("user_id").distinct().collect()
        }
        ord_users = {
            r["o_custkey"]
            for r in load_table(spark, sf_dir, "orders")
            .select("o_custkey").distinct().collect()
        }
        got = {r["user_id"] for r in out.select("user_id").collect()}
        assert got == ev_users | ord_users
        only_orders = out.filter(
            (F.col("n_events") == 0) & (F.col("n_orders") > 0)
        ).count()
        assert only_orders == len(ord_users - ev_users) and only_orders > 0
        assert out.filter("engaged_buyer").count() == len(ev_users & ord_users)
    finally:
        out.unpersist()
