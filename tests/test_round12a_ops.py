"""Planted-case gates for the round-12 first-batch operators (they
previously rode only the oracle sweeps): Welch F on a hand-computed
two-group case (F = 15, Satterthwaite df = 2.9412), the order-statistic
median CI on 1..25 (ranks 7/13/19 by the floor/ceil formulas), CCC on
identical series (CCC = r = C_b = 1), Deming on an exact 2× relation
(all three slopes = 2, intercept 0), VIF on a full-factorial design
(orthogonal → VIF = 1), participation ratio on a rank-1 embedding cloud
(PR = 1), the hapax census on a 4-token corpus, and degree Gini on a
hand-counted bipartite graph (G = 1/6).

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


def test_welch_two_group_hand_value(spark, tmp_path_factory):
    """A = {1,2,3} (mean 2, s² = 1), B = {5,7,9} (mean 7, s² = 4):
    w_A = 3, w_B = 0.75, weighted grand mean 3, F = Σw(x̄−x̄w)²/(k−1)
    = 15 (the k = 2 correction term vanishes), Satterthwaite
    df₂ = (k²−1)/(3Λ) with Λ = 0.34 → 2.941176."""
    out = str(tmp_path_factory.mktemp("welch"))
    _events(
        spark,
        out,
        [(1, "a", 0), (2, "a", 0), (3, "a", 0), (5, "b", 0), (7, "b", 0), (9, "b", 0)],
    )
    row = registry.get("q_agg_welch").fn(spark, out).collect()[0]
    assert row["df1"] == 1
    assert math.isclose(row["f_welch"], 15.0, rel_tol=1e-4)
    assert math.isclose(row["df2"], 1 / 0.34, rel_tol=1e-4)
    assert math.isclose(row["grand_mean_weighted"], 3.0, rel_tol=1e-6)


def test_quantile_ci_ranks_on_1_to_25(spark, tmp_path_factory):
    """n = 25: median rank (25·50+99)//100 = 13, lo = ⌊12.5−0.98·5⌋ = 7,
    hi = ⌈12.5+1+0.98·5⌉ = 19 — on values 1..25 the CI is [7, 19]."""
    out = str(tmp_path_factory.mktemp("qci"))
    _write(
        spark,
        out,
        "orders",
        [(i, float(i)) for i in range(1, 26)],
        "o_orderkey long, o_totalprice double",
    )
    row = registry.get("q_agg_quantile_ci").fn(spark, out).collect()[0]
    assert row["n_rows"] == 25
    assert row["lo_rank"] == 7 and row["hi_rank"] == 19
    assert row["median"] == 13.0
    assert row["ci_lo"] == 7.0 and row["ci_hi"] == 19.0


def test_ccc_identical_series_is_one(spark, tmp_path_factory):
    """Identical daily view/click totals: Pearson r = 1, CCC = 1
    (no location or scale shift to penalize), C_b = CCC/r = 1."""
    out = str(tmp_path_factory.mktemp("ccc"))
    rows = []
    for d, v in enumerate([10, 20, 30, 25]):
        rows += [(v, "view", d), (v, "click", d)]
    _events(spark, out, rows)
    row = registry.get("q_agg_ccc").fn(spark, out).collect()[0]
    assert math.isclose(row["pearson_r"], 1.0, abs_tol=1e-9)
    assert math.isclose(row["ccc"], 1.0, abs_tol=1e-9)
    assert math.isclose(row["c_b"], 1.0, abs_tol=1e-9)


def test_deming_exact_double_relation(spark, tmp_path_factory):
    """purchase = 2·view exactly: v_y = 4v_x, c_xy = 2v_x → the λ = 1
    quadratic root is 2, and both OLS brackets collapse onto it;
    intercept 0."""
    out = str(tmp_path_factory.mktemp("dem"))
    rows = []
    for d, v in enumerate([10, 20, 30, 40]):
        rows += [(v, "view", d), (2 * v, "purchase", d)]
    _events(spark, out, rows)
    row = registry.get("q_agg_deming").fn(spark, out).collect()[0]
    assert math.isclose(row["slope_deming"], 2.0, abs_tol=1e-6)
    assert math.isclose(row["slope_ols"], 2.0, abs_tol=1e-6)
    assert math.isclose(row["slope_inverse_ols"], 2.0, abs_tol=1e-6)
    assert math.isclose(row["intercept_deming"], 0.0, abs_tol=1e-6)


def test_vif_orthogonal_factorial_is_one(spark, tmp_path_factory):
    """Full 2×2×2 factorial over (quantity, price, discount): all
    pairwise correlations are exactly 0 → every R² = 0 → VIF = 1."""
    out = str(tmp_path_factory.mktemp("vif"))
    rows = []
    k = 0
    for q in (1.0, 2.0):
        for p in (10.0, 20.0):
            for disc in (0.0, 0.1):
                rows.append((k, q, p, disc))
                k += 1
    _write(
        spark,
        out,
        "lineitem",
        rows,
        "l_orderkey long, l_quantity double, l_extendedprice double, "
        "l_discount double",
    )
    got = {r["feature"]: r for r in registry.get("q_ml_vif").fn(spark, out).collect()}
    assert len(got) == 3
    for r in got.values():
        assert math.isclose(r["vif"], 1.0, abs_tol=1e-6)


def test_participation_rank_one_cloud(spark, tmp_path_factory):
    """All variance on dimension 0 → one nonzero eigenvalue →
    PR = tr(C)²/tr(C²) = 1 regardless of the variance convention."""
    out = str(tmp_path_factory.mktemp("pr"))
    rows = []
    for i, a in enumerate([1.0, -1.0, 2.0, -2.0]):
        vec = [0.0] * 64
        vec[0] = a
        rows.append((i, vec, "x"))
    _write(
        spark,
        out,
        "embeddings",
        rows,
        "vec_id long, embedding array<float>, label string",
    )
    row = registry.get("q_embed_participation").fn(spark, out).collect()[0]
    assert row["n_vecs"] == 4 and row["n_dims"] == 64
    assert math.isclose(row["participation_ratio"], 1.0, abs_tol=1e-4)
    assert math.isclose(row["pr_fraction"], 1.0 / 64, abs_tol=1e-5)


def test_hapax_census_hand_counts(spark, tmp_path_factory):
    """Docs "a b" and "b c": vocab 3, tokens 4, hapax {a, c},
    dis legomena {b}; rate = 2/3, Good-Turing unseen mass = 2/4."""
    out = str(tmp_path_factory.mktemp("hapax"))
    _write(
        spark,
        out,
        "documents",
        [(0, "a b", "en", "s", 3), (1, "b c", "en", "s", 3)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    row = registry.get("q_text_hapax").fn(spark, out).collect()[0]
    assert row["vocab"] == 3 and row["n_tokens"] == 4
    assert row["hapax"] == 2 and row["dis_legomena"] == 1
    assert math.isclose(row["hapax_rate"], round(2 / 3, 6), abs_tol=1e-9)
    assert math.isclose(row["gt_unseen_mass"], 0.5, abs_tol=1e-9)


def test_degree_gini_hand_counted_graph(spark, tmp_path_factory):
    """Orders c0→{s0,s1}, c1→{s0}: bipartite degrees [2,1,2,1] →
    classes {1: 2 nodes, 2: 2 nodes}, Σmm|Δd| = 8,
    G = 8/(2·4·6) = 1/6; mean degree 1.5."""
    out = str(tmp_path_factory.mktemp("gini"))
    _write(
        spark,
        out,
        "orders",
        [(1, 0), (2, 0), (3, 1)],
        "o_orderkey long, o_custkey long",
    )
    _write(
        spark,
        out,
        "lineitem",
        [(1, 0), (2, 1), (3, 0)],
        "l_orderkey long, l_suppkey long",
    )
    row = registry.get("q_graph_degree_gini").fn(spark, out).collect()[0]
    assert row["n_nodes"] == 4 and row["n_classes"] == 2
    assert row["max_degree"] == 2
    assert math.isclose(row["mean_degree"], 1.5, abs_tol=1e-9)
    assert math.isclose(row["gini_degree"], round(1 / 6, 6), abs_tol=1e-9)
