"""Planted-case gates for the round-9 second-half operators: the
k-fold complement/expansion algebra, the HITS fixed-point
renormalization, prefix-dup family detection, boilerplate census, and
the lift table's decile invariants.

The oracle sweep (tools/check_oracle.py) pins every one of these
against DuckDB value-for-value; these tests pin the SEMANTICS against
hand-computable fixtures so a future refactor that changes both engine
texts in the same wrong way still fails.
"""

from __future__ import annotations

import math

from asyncdatapipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_kfold_cv_matches_direct_fit(spark, sf_dir):
    """The complement-sum fit and the algebraic MSE expansion must
    equal a direct per-fold recomputation (collect at sf0.001 and
    refit fold 0 in Python)."""
    rows = registry.get("q_ml_kfold_cv").fn(spark, sf_dir).collect()
    assert len(rows) == 5
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .selectExpr(
            "cast(conv(substr(md5(concat(cast(l_orderkey as string), '-', "
            "cast(l_linenumber as string))), 1, 2), 16, 10) as int) % 5 "
            "as fold",
            "l_quantity as x",
            "l_extendedprice as y",
        )
        .toPandas()
    )
    for r in rows:
        tr = li[li.fold != r.fold]
        te = li[li.fold == r.fold]
        assert r.n_train == len(tr) and r.n_test == len(te)
        n = len(tr)
        dxx = (tr.x * tr.x).sum() - tr.x.sum() ** 2 / n
        b = ((tr.x * tr.y).sum() - tr.x.sum() * tr.y.sum() / n) / dxx
        a = tr.y.mean() - b * tr.x.mean()
        mse = ((te.y - a - b * te.x) ** 2).mean()
        assert math.isclose(r.slope, b, rel_tol=1e-4), (r.fold, r.slope, b)
        assert math.isclose(r.test_mse, mse, rel_tol=1e-3), (
            r.fold,
            r.test_mse,
            mse,
        )


def test_hits_mass_conservation_and_ranking(spark, sf_dir):
    """Each published HITS score column renormalizes to ~1e12 total
    mass over ALL nodes (top-k shows only the head, so check bounds:
    positive, ≤ mass, hubs and authorities both present and sorted)."""
    rows = registry.get("q_graph_hits").fn(spark, sf_dir).collect()
    hubs = [r for r in rows if r.kind == "hub"]
    auths = [r for r in rows if r.kind == "authority"]
    assert len(hubs) == 10 and len(auths) == 10
    for grp in (hubs, auths):
        scores = [r.score_fp for r in grp]
        assert scores == sorted(scores, reverse=True)
        assert all(0 < s <= 10**12 for s in scores)


def test_dedup_prefix_finds_planted_family(spark):
    """Two docs sharing a 16-word head but divergent tails are ONE
    prefix family that exact dedup misses."""
    head = " ".join(f"w{i}" for i in range(16))
    import tempfile, os

    out = tempfile.mkdtemp()
    spark.createDataFrame(
        [
            (1, head + " tail one", "en", "s1", 10),
            (2, head + " a completely different continuation", "en", "s2", 11),
            (3, "unrelated " + head, "en", "s1", 12),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))
    rows = registry.get("q_dedup_prefix").fn(spark, out).collect()
    assert len(rows) == 1
    fam = rows[0]
    assert fam.n_docs == 2 and fam.canonical_doc_id == 1
    assert fam.n_sources == 2  # cross-feed mirror signal


def test_boilerplate_census_flags_planted_template(spark):
    """A 3-gram present in 3 of 4 docs of one source crosses the
    df>=2, share>=5% floor; the other source stays clean."""
    import os, tempfile

    tpl = "click here now"
    docs = [
        (1, f"{tpl} alpha beta gamma", "en", "srcA", 1),
        (2, f"delta {tpl} epsilon zeta", "en", "srcA", 1),
        (3, f"eta theta {tpl}", "en", "srcA", 1),
        (4, "nothing shared at all", "en", "srcA", 1),
        (5, "totally clean document text", "en", "srcB", 1),
        (6, "another clean document entirely", "en", "srcB", 1),
    ]
    out = tempfile.mkdtemp()
    spark.createDataFrame(
        docs,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))
    rows = {
        r.source: r
        for r in registry.get("q_text_boilerplate").fn(spark, out).collect()
    }
    assert rows["srcA"].top_gram == tpl and rows["srcA"].top_df == 3
    assert rows["srcA"].boiler_docs == 3
    assert rows["srcB"].n_boiler_grams == 0 and rows["srcB"].top_gram is None


def test_eval_lift_decile_invariants(spark, sf_dir):
    """Gains-table invariants: deciles 0..9 partition the population,
    cumulative capture is monotone to 1.0, and the population-weighted
    mean response rate equals the base rate (lift averages to 1)."""
    rows = registry.get("q_eval_lift").fn(spark, sf_dir).collect()
    assert [r.decile for r in rows] == list(range(10))
    caps = [r.cum_capture for r in rows]
    assert caps == sorted(caps) and math.isclose(caps[-1], 1.0, abs_tol=1e-6)
    n = sum(r.n_d for r in rows)
    pos = sum(r.pos_d for r in rows)
    wmean = sum(r.resp_rate * r.n_d for r in rows) / n
    assert math.isclose(wmean, pos / n, rel_tol=1e-3)


def test_mix_epochs_budget_conservation(spark, sf_dir):
    """Uniform targets sum to ~the corpus total and the capped flag
    fires exactly when raw epochs exceed the cap."""
    rows = registry.get("q_mix_epochs").fn(spark, sf_dir).collect()
    total = sum(r.n_tokens for r in rows)
    tgt = sum(r.target_tokens for r in rows)
    assert abs(tgt - total) <= len(rows)  # floor() slack per source
    for r in rows:
        assert r.capped == (r.epochs_raw > 3.0)
        assert r.planned_tokens <= r.n_tokens * 3.0 + 1
