"""Planted-case gates for the round-10 operators: Heaps-curve algebra on
saturated vs all-fresh corpora, the lang-mix majority rule on a stitched
doc, matryoshka retention against a planted prefix-decoy, cross-lingual
near-dup detection on planted translation twins, the fairness panel on a
perfectly-separated vs inverted group, Hill/OLS tail exponents against
hand-computed degrees, the gzip round-trip, and curriculum band edges.

The oracle sweep pins values against DuckDB; these pin SEMANTICS against
hand-computable fixtures.
"""

from __future__ import annotations

import math
import os
import tempfile

from pyspark.sql import functions as F

from asyncdatapipeline_spark import registry


def _write(spark, out, table, rows, schema):
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        os.path.join(out, f"{table}.parquet")
    )


def _docs(spark, out, rows):
    _write(
        spark,
        out,
        "documents",
        [(i, t, lang, "src", len(t)) for i, (t, lang) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )


def test_heaps_saturated_corpus_flat_beta(spark):
    """Four docs of the same 10 words: vocab pins at 10 from the first
    decile on and the log-log slope is exactly 0."""
    out = tempfile.mkdtemp()
    words = " ".join(f"w{i}" for i in range(10))
    _docs(spark, out, [(words, "en")] * 4)
    rows = registry.get("q_text_heaps").fn(spark, out).collect()
    assert len(rows) == 10
    assert all(r.cum_vocab == 10 for r in rows)
    assert rows[-1].cum_tokens == 40
    assert rows[0].beta == 0.0


def test_heaps_all_fresh_corpus_beta_one(spark):
    """Every token a new word: V(N) = N exactly, so beta = 1."""
    out = tempfile.mkdtemp()
    _docs(
        spark,
        out,
        [
            (" ".join(f"d{d}w{i}" for i in range(10)), "en")
            for d in range(4)
        ],
    )
    rows = registry.get("q_text_heaps").fn(spark, out).collect()
    assert all(r.cum_vocab == r.cum_tokens for r in rows)
    assert rows[0].beta == 1.0


def test_lang_mix_flags_stitched_doc(spark):
    """Doc 0: 8 'the' + 8 'table' words = one en segment + one code
    segment (tie broken to the lexicographically smaller class);
    doc 1: pure en — share 1.0, not mixed."""
    out = tempfile.mkdtemp()
    _docs(
        spark,
        out,
        [("the " * 8 + "table " * 7 + "table", "en"), (("the " * 15) + "the", "en")],
    )
    got = {
        r.majority_class: r
        for r in registry.get("q_text_lang_mix").fn(spark, out).collect()
    }
    assert got["code"].n_docs == 1 and got["code"].n_mixed == 1
    assert abs(got["code"].mean_majority_share - 0.5) < 1e-9
    assert got["en"].n_docs == 1 and got["en"].n_mixed == 0
    assert got["en"].mean_majority_share == 1.0


def test_matryoshka_prefix_decoy_breaks_retention_at_8(spark):
    """Probe = all-ones; the decoy matches the probe EXACTLY on the
    first 8 dims then dies; the true neighbor is slightly off in dim 8
    but aligned overall. Truncating to 8 dims picks the decoy
    (retention 0, positive regret); 16+ dims pick the true neighbor."""
    out = tempfile.mkdtemp()
    probe = [1.0] * 64
    true_n = [1.0] * 7 + [0.5] + [1.0] * 56
    decoy = [1.0] * 8 + [0.0] * 56
    _write(
        spark,
        out,
        "embeddings",
        [(0, probe, 0), (25, true_n, 0), (30, decoy, 0)],
        "vec_id long, embedding array<float>, label int",
    )
    rows = {
        r.dim: r
        for r in registry.get("q_embed_matryoshka").fn(spark, out).collect()
    }
    assert rows[8].top1_retention == 0.0 and rows[8].mean_regret > 0
    for k in (16, 32, 64):
        assert rows[k].top1_retention == 1.0, k
    assert rows[64].mean_regret == 0.0


def test_cross_lang_finds_planted_translation_twins(spark):
    """Three identical vectors (en, de, en): the de vector pairs with
    BOTH en vectors at cosine 1.0; the en-en pair is excluded."""
    out = tempfile.mkdtemp()
    v = [float(i % 3 + 1) for i in range(16)]
    _write(
        spark,
        out,
        "embeddings",
        [(0, v, 0), (1, v, 0), (2, v, 0)],
        "vec_id long, embedding array<float>, label int",
    )
    _docs(
        spark,
        out,
        [("x", "en"), ("y", "de"), ("z", "en")],
    )
    rows = registry.get("q_dedup_cross_lang").fn(spark, out).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.lang_a, r.lang_b) == ("de", "en")
    assert r.n_cand_pairs == 2
    assert r.max_cos == 1.0 and r.mean_cos == 1.0


def test_fairness_separated_vs_inverted_groups(spark):
    """Group 0 (users 0,3): score perfectly separates purchase/view →
    TPR 1, FPR 0. Group 1 (users 1,4): inverted → TPR 0, FPR 1.
    Spreads hit 1.0 and both verdict booleans go false."""
    out = tempfile.mkdtemp()
    rows = []
    eid = 0
    for uid in (0, 3):  # group 0: purchases high, views low
        rows += [(eid, "2024-01-01 00:00:00", uid, "purchase", 90.0, "{}")]
        rows += [(eid + 1, "2024-01-01 00:00:00", uid, "view", 10.0, "{}")]
        eid += 2
    for uid in (1, 4):  # group 1: purchases low, views high
        rows += [(eid, "2024-01-01 00:00:00", uid, "purchase", 10.0, "{}")]
        rows += [(eid + 1, "2024-01-01 00:00:00", uid, "view", 90.0, "{}")]
        eid += 2
    spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.to_timestamp("ts")).write.mode("overwrite").parquet(
        os.path.join(out, "events.parquet")
    )
    got = {
        r.grp: r
        for r in registry.get("q_eval_fairness").fn(spark, out).collect()
    }
    assert got[0].tpr == 1.0 and got[0].fpr == 0.0
    assert got[1].tpr == 0.0 and got[1].fpr == 1.0
    assert got[0].tpr_gap == 1.0 and got[0].fpr_gap == 1.0
    assert not got[0].equalized_odds_ok
    assert got[0].sel_gap == 0.0 and got[0].demographic_parity_ok


def test_powerlaw_hill_matches_hand_computation(spark):
    """Customer degrees {2, 2, 4} → Hill α = 1 + 3/ln 2; supplier
    degrees {3, 2, 2, 1} → tail {3,2,2}, α = 1 + 3/ln(3/2)."""
    out = tempfile.mkdtemp()
    edges = {
        1: ["s1", "s2"],
        2: ["s1", "s3"],
        3: ["s1", "s2", "s3", "s4"],
    }
    sup_ids = {"s1": 11, "s2": 12, "s3": 13, "s4": 14}
    orows, lrows, ok = [], [], 100
    for cust, sups in edges.items():
        orows.append((ok, cust))
        for i, s in enumerate(sups):
            lrows.append((ok, i + 1, sup_ids[s]))
        ok += 1
    _write(spark, out, "orders",
           [(o, c) for o, c in orows], "o_orderkey long, o_custkey long")
    _write(spark, out, "lineitem",
           [(o, ln, s) for o, ln, s in lrows],
           "l_orderkey long, l_linenumber int, l_suppkey long")
    got = {
        r.kind: r
        for r in registry.get("q_graph_powerlaw").fn(spark, out).collect()
    }
    # hand values through the same 9dp-ln contract: the two degree-2
    # customers contribute ln(2/2)=0 each; only the degree-4 node adds
    a_cust = 1 + 3 / round(math.log(2), 9)
    assert abs(got["customer"].alpha_hill - round(a_cust, 6)) < 2e-6
    a_sup = 1 + 3 / round(math.log(1.5), 9)
    assert abs(got["supplier"].alpha_hill - round(a_sup, 6)) < 2e-6
    assert got["customer"].n_tail == 3 and got["customer"].max_degree == 4
    assert got["supplier"].n_tail == 3 and got["supplier"].max_degree == 3


def test_csv_gzip_roundtrip_and_compressed_files(spark, sf_dir):
    """The gzip scan equals the parquet source row-for-row, and the
    scratch dir really holds .gz part files (codec actually applied)."""
    got = sorted(
        registry.get("q_scan_csv_gzip").fn(spark, sf_dir).collect()
    )
    src = sorted(
        spark.read.parquet(f"{sf_dir}/nation.parquet")
        .select("n_nationkey", "n_name", "n_regionkey")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in src]
    from asyncdatapipeline_spark.operators.scans import _scratch

    path = _scratch(sf_dir, "nation_csv_gz")
    assert any(f.endswith(".csv.gz") for f in os.listdir(path)), os.listdir(path)


def test_curriculum_band_edges(spark):
    """Token counts 24/25/49/50/74/75 land in stages 1/2/2/3/3/4 and the
    share arithmetic closes to 1 within each stage."""
    out = tempfile.mkdtemp()
    def doc(n): return " ".join(f"w{i}" for i in range(n))
    _docs(
        spark,
        out,
        [
            (doc(24), "en"), (doc(25), "en"), (doc(49), "de"),
            (doc(50), "en"), (doc(74), "de"), (doc(75), "en"),
        ],
    )
    rows = registry.get("q_mix_curriculum").fn(spark, out).collect()
    by = {(r.stage, r.lang): r for r in rows}
    assert by[(1, "en")].n_docs == 1 and by[(1, "en")].n_tokens == 24
    assert by[(2, "en")].n_docs == 1 and by[(2, "de")].n_docs == 1
    assert by[(3, "en")].n_tokens == 50 and by[(3, "de")].n_tokens == 74
    assert by[(4, "en")].n_tokens == 75
    for stage in (1, 2, 3, 4):
        tot = sum(r.share_of_stage for r in rows if r.stage == stage)
        assert abs(tot - 1.0) < 1e-5, (stage, tot)
    corpus = {r.stage: r.stage_share_of_corpus for r in rows}
    assert abs(sum(corpus.values()) - 1.0) < 1e-5


def test_dup_payments_planted_pair(spark):
    """Customer 5: two orders 3 days and $100 apart (hit), a third 30
    days away (cleared by the window), a fourth $10k away (cleared by
    the tolerance). Customer 6's single order pairs with nothing."""
    out = tempfile.mkdtemp()
    rows = [
        (1, 5, "O", 1000.00, "2024-01-01 00:00:00", "1-URGENT"),
        (2, 5, "O", 1100.00, "2024-01-04 00:00:00", "1-URGENT"),
        (3, 5, "O", 1050.00, "2024-02-01 00:00:00", "1-URGENT"),
        (4, 5, "O", 11000.00, "2024-01-02 00:00:00", "1-URGENT"),
        (5, 6, "O", 1000.00, "2024-01-01 00:00:00", "1-URGENT"),
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate")).write.mode(
        "overwrite"
    ).parquet(os.path.join(out, "orders.parquet"))
    got = registry.get("q_orders_dup_payments").fn(spark, out).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.o_custkey, r.key_a, r.key_b) == (5, 1, 2)
    assert r.day_gap == 3 and r.cents_diff == 10_000
    assert r.amount_a == 1000.0 and r.amount_b == 1100.0


def test_hard_negatives_surface_mislabeled_duplicate(spark):
    """An identical vector under a different label must be the rank-1
    hard negative at cosine 1.0; a same-label twin must never appear."""
    out = tempfile.mkdtemp()
    v = [1.0] * 16
    far = [1.0] * 8 + [-1.0] * 8
    _write(
        spark,
        out,
        "embeddings",
        [
            (0, v, 0),      # anchor, label 0
            (40, v, 1),     # mislabeled duplicate -> rank-1 impostor
            (41, v, 0),     # same-label twin -> excluded
            (42, far, 2),   # genuine far negative
        ],
        "vec_id long, embedding array<float>, label int",
    )
    rows = [
        r
        for r in registry.get("q_ml_hard_negatives").fn(spark, out).collect()
        if r.anchor_id == 0
    ]
    assert rows[0].hn_rank == 1 and rows[0].neg_id == 40
    assert rows[0].cos_sim == 1.0 and rows[0].neg_label == 1
    assert all(r.neg_label != 0 for r in rows)
    assert all(r.neg_id != 41 for r in rows)
