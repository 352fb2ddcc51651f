"""Plan-shape regression gate: every check in plans/audit.py must hold.

The audit CLI (tools/audit_plans.py) is the interactive loop; this test
makes the same checks part of the pytest gate so a plan regression (lost
pushdown, a broadcast that became a sort-merge, a WindowGroupLimit that
stopped firing) fails CI, not just a manual run. Runs at sf0.001 — plan
*shapes* are scale-invariant here (all dims stay under the broadcast
threshold at every fixture SF).
"""

from __future__ import annotations

import pytest

from asyncdatapipeline_spark.plans.audit import run_audit


def test_all_plan_checks_hold(spark, sf_dir):
    failures = [
        f"{name}: {desc}" for name, desc, ok in run_audit(spark, sf_dir) if not ok
    ]
    assert not failures, f"plan checks failed: {failures}"


@pytest.mark.heavy
def test_no_unpartitioned_windows_registry_wide(spark, sf_dir):
    """r8 verdict #1: a registry-wide assertion that NO query plans a
    Window/WindowGroupLimit with an empty or all-foldable partition
    spec (single-partition execution + `WindowExec: No Partition
    Defined`). Round 7 claimed this class closed, but the check was
    per-query regexes — q_ts_runs_test's `c * 0` keys constant-folded
    (non-nullable count) and the audit couldn't see it. This walks the
    OPTIMIZED logical plan (post-folding) of every registered query;
    bounded-frame windows must ride the fold-proof `bounded_part` key,
    and any deliberate exception must be in WINDOW_SCAN_ALLOWLIST with
    a reason."""
    from asyncdatapipeline_spark.plans.audit import (
        WINDOW_SCAN_ALLOWLIST,
        scan_registry_windows,
    )

    offenders = scan_registry_windows(spark, sf_dir)
    bad = {k: v for k, v in offenders.items() if k not in WINDOW_SCAN_ALLOWLIST}
    assert not bad, f"unpartitioned windows outside allowlist: {bad}"


def test_sql_pipe_plans_identically_to_ansi(spark, sf_dir):
    """q_sql_pipe's claim: pipe syntax is pure parse-time sugar — the
    optimized plan must contain the same operator sequence as the ANSI
    form (same join strategy, same aggregate, same pushed filters)."""
    import re

    from asyncdatapipeline_spark import registry

    pipe_df = registry.get("q_sql_pipe").fn(spark, sf_dir)
    ansi_df = spark.sql(registry.all_oracles()["q_sql_pipe"])

    def shape(df):
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        # operator names only: strip expression ids / literals
        return [
            re.match(r"[+\- :]*([A-Za-z]+)", ln).group(1)
            for ln in plan.splitlines()
            if re.match(r"[+\- :]*[A-Za-z]", ln)
        ]

    assert shape(pipe_df) == shape(ansi_df)


# r12 scan-repair opt-outs: the whole-suite A/B (OPTIMIZATION_r12.md,
# "per-query opt-outs") measured these queries SLOWER with the
# single-row-group scan repair — their scans feed a keyed exchange
# directly, so the repair's round-robin shuffle is a pure extra
# barrier. Each passes parallelize=False at its load_table sites; this
# gate pins that plan shape so a refactor can't silently re-enable the
# repair (or a future repair change can't silently disable it for the
# queries that DO want it).
REPAIR_OPT_OUTS = [
    # (q_agg_taildep left this list when its threshold build moved to
    # the exact_pct_values sketch device — its first hop is now a
    # CPU-heavy map-side aggregate, the repair-winner profile.)
    "q_orders_leadtime", "q_ml_isotonic",
    "q_agg_kendall", "q_orders_repeat", "q_agg_sketch_setops",
    "q_tpch_q17", "q_win_rank", "q_tpch_q4", "q_tpch_q19",
    "q_ml_nearest_centroid", "q_subquery_correlated", "q_tpch_q5",
    "q_join_trigram", "q_tpch_q8", "q_exists_correlated",
    "q_ts_variance_ratio", "q_join_asof", "q_retention",
    "q_ts_haar_energy", "q_ts_granger", "q_agg_xtab_residuals",
    "q_orders_croston", "q_tpch_q9", "q_join_dpp",
    "q_text_source_divergence", "q_join_multiway",
    "q_ts_holt_winters", "q_tpch_q18",
    # r13 additions: the driver-regressed-44 re-verification
    # (tools/ab_repair.py, interleaved same-session ON/OFF medians,
    # clean ON-vs-ON control at 0.95-1.04) measured these 33 at
    # off/on <= 0.90 — all are sub-2 s queries whose scans feed keyed
    # exchanges or light map work where the repair's round-robin is a
    # pure extra barrier. Artifact: AB_REPAIR_r13.json.
    "q_text_lexical_diversity", "q_tpch_q13", "q_ml_odds_ratio",
    "q_feature_woe", "q_agg_kll", "q_pack_sequences", "q_recursive_cte",
    "q_tpch_q3", "q_tpch_q10", "q_agg_overdispersion",
    "q_ts_yule_walker", "q_anomaly_seasonal", "q_tpch_q22", "q_ts_dtw",
    "q_embed_drift", "q_dedup_url", "q_skyline", "q_ts_perm_entropy",
    "q_ts_mann_kendall", "q_ts_holt", "q_ts_backtest", "q_tpch_q6",
    "q_text_vocab_coverage", "q_ts_decompose", "q_dedup_exact",
    "q_agg_heavy", "q_graph_neighbor_degree", "q_ts_cointegration",
    "q_tpch_q15", "q_events_burstiness", "q_split_hash",
    "q_dq_expectations", "q_tpch_q7",
]


def _physical(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_repair_opt_outs_carry_no_roundrobin_exchange(spark, sf_dir):
    from asyncdatapipeline_spark import registry

    bad = [
        name
        for name in REPAIR_OPT_OUTS
        if "RoundRobinPartitioning"
        in _physical(registry.get(name).fn(spark, sf_dir))
    ]
    assert not bad, f"repair re-enabled on opted-out queries: {bad}"


def test_repair_still_engages_for_compute_heavy_scans(spark, sf_dir):
    """The inverse gate: the measured repair winners (single-task scan
    feeding heavy map-side compute) must KEEP the round-robin repair —
    sf0.001 lineitem is over the 2000-row floor and single-row-group,
    so the repair fires at any realistic test core count."""
    from asyncdatapipeline_spark import registry

    for name in ("q_ml_vif", "q_agg_winsorized_corr"):
        plan = _physical(registry.get(name).fn(spark, sf_dir))
        assert "RoundRobinPartitioning" in plan, f"{name} lost the repair"
