"""Scale-stress harness: run the dedup/curation family on a corpus
multiplied N-fold, to check the operators' cost curves empirically (the
fixtures top out at sf0.1 = 5k docs / 2k vectors; the 100 TB design
claims in SCALING.md deserve at least a 10-20x local extrapolation).

Builds a derived corpus under .spark-warehouse/stress_<mult>/ by
replicating documents/embeddings with offset ids (deterministic - no
randomness), then times each family member with the same
consume-everything terminal bench.py uses.

Usage: python tools/stress.py [mult] [sf_dir]
       python tools/stress.py 10 /root/testdata/sf0.1
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from asyncdatapipeline_spark import registry  # noqa: E402
from asyncdatapipeline_spark.session import get_spark  # noqa: E402
from asyncdatapipeline_spark.sources.tables import load_table  # noqa: E402

QUERIES = [
    # events family (replicated users: grid/state grows linearly)
    "q_ts_resample",
    "q_funnel",
    "q_anomaly",
    "q_win_range_time",
    "q_window_session",
    # documents/embeddings family
    "q_dedup_exact",
    "q_dedup_minhash",
    "q_dedup_simhash",
    "q_text_decontam",
    "q_text_repetition",
    "q_split_hash",
    "q_dedup_embed_lsh",
    "q_curation_full",
    "q_pack_sequences",
    "q_dedup_incremental",
    "q_dedup_chunk",
    "q_text_bm25",
    # round-4 flagships (VERDICT r4 item 6): q_rfm's global ntile sort
    # is the one to watch — the percentile-bounds swap documented in
    # windows.py should kick in as a measured, not asserted, trade
    "q_rfm",
    "q_sessionize",
    "q_funnel_time",
    "q_text_unigram_ppl",
    # round-5 additions
    "q_subquery_correlated",
    "q_exists_correlated",
    "q_join_bloom",
    "q_dedup_semantic",
    "q_dedup_semantic_incremental",
    "q_agg_sketch_setops",
    "q_agg_kll",
    "q_agg_bitmap",
    "q_join_lateral",
    "q_join_null_anti",
    "q_join_shuffle_hash",
    "q_recursive_cte",
    "q_agg_trend",
    "q_anomaly_mad",
    "q_ts_interpolate",
    "q_window_session_dynamic",
    "q_split_group",
    # TPC-H join family (replicated facts over fixed dims: the
    # AQE-sensitive snowflake join and agg-then-topk plans)
    "q_agg_hash",
    "q_join_multiway",
    "q_agg_topk",
    # round-6 additions: the two iterative multi-round jobs (per-round
    # join+agg cost should scale linearly; round count must NOT grow
    # with replication) and the new sketch/cogroup surface
    "q_graph_pagerank",
    "q_dedup_clusters",
    "q_agg_heavy",
    "q_udf_cogroup",
    # round-6 late additions: aggregate-first series ops (autocorr /
    # theilsen cost is bounded by SERIES LENGTH — replication grows
    # counts, not days, so these should measure ~FLAT), the sweep-line
    # and grid joins, and the CDC apply path
    "q_cdc_apply",
    "q_win_concurrency",
    "q_join_spatial_grid",
    "q_graph_components",
    "q_ts_autocorr",
    "q_ts_theilsen",
    "q_win_topn_change",
    "q_events_outage",
    "q_agg_ttest",
    "q_text_readability",
    "q_split_time",
    # round-6 second batch: statistics/eval/CDC/classification surface
    "q_agg_anova",
    "q_agg_mannwhitney",
    "q_agg_spearman",
    "q_agg_bootstrap",
    "q_events_lifecycle",
    "q_events_experiment",
    "q_ts_survival",
    "q_ts_forecast",
    "q_ts_decompose",
    "q_rfm_migration",
    "q_orders_abc_xyz",
    "q_orders_sla",
    "q_profile_benford",
    "q_eval_langid",
    "q_dedup_transactions",
    "q_join_pit",
    "q_ts_busday",
    "q_events_state_machine",
    # round-6 final batch: info-theory/regression/iterative/geo/eval ops
    "q_agg_reach",
    "q_agg_mutual_info",
    "q_ml_linreg",
    "q_events_markov_stationary",
    "q_graph_bfs",
    "q_events_stickiness",
    "q_events_slo_burn",
    "q_events_cuped",
    "q_agg_geo_centroid",
    "q_fn_calendar",
    "q_eval_ann",
    "q_eval_retrieval",
    "q_eval_dedup",
    # round-6 closing batch
    "q_agg_ks",
    "q_agg_cramers",
    "q_orders_bridge",
    "q_mdm_survivorship",
    "q_join_nullsafe",
    "q_events_did",
    "q_sink_dynamic",
    "q_agg_jarque_bera",
    "q_agg_hhi",
    # round-7: distributed-exact rank stats (the old single-partition
    # window walls should be GONE — expect these to track the grouped
    # agg family now, not a data-sized sort), their KLL sketch twins
    # (grid extraction + map-only ECDF passes: ~flat), and the
    # percentile-bounds RFM (one approx-percentile agg + map-only
    # assignment vs q_rfm's ntile sorts).
    "q_agg_spearman_kll",
    "q_agg_mannwhitney_kll",
    "q_agg_ks_kll",
    "q_rfm_approx",
    # round-7 second wave: graph locals (one shuffle families), events
    # experimentation stack (BH/ratio-CI/power reduce to per-user then
    # dimension frames: expect ~linear in the per-user pass, flat
    # after), inequality/allocation (power-sum closed forms: ~flat),
    # spine ops (changepoint/periodogram/rolling-corr cost bounded by
    # series length — replication grows counts, not days), the Gramian
    # PCA (d^2 agg: linear scan, fixed iteration), profiling passes,
    # and the skyline reduce.
    "q_graph_degree",
    "q_graph_assortativity",
    "q_graph_jaccard",
    "q_events_srm",
    "q_events_adoption",
    "q_events_pmi",
    "q_events_rolling_active",
    "q_events_bh_fdr",
    "q_events_ratio_ci",
    "q_events_power",
    "q_sample_neyman",
    "q_agg_theil",
    "q_skyline",
    "q_text_editdist",
    "q_ts_changepoint",
    "q_ts_rolling_corr",
    "q_ts_periodogram",
    "q_embed_pca_power",
    "q_profile_fd",
    "q_profile_keys",
    "q_eval_report",
    "q_orders_inventory",
    "q_ts_granger",
    "q_mix_temperature",
    "q_eval_ndcg",
    "q_orders_elasticity",
    "q_agg_tukey",
    "q_graph_kcore",
    "q_events_entropy_rate",
    "q_ts_twa",
    "q_events_shapley",
    "q_ts_clock_mean",
    "q_text_code_detect",
    "q_orders_vintage",
    "q_orders_pvm",
    "q_agg_qq",
    "q_dq_freshness",
    "q_ts_control_chart",
    "q_graph_modularity",
    "q_ml_logreg",
    "q_ml_naive_bayes",
    "q_ml_stump",
    "q_embed_silhouette",
    "q_events_pretrends",
    "q_ml_kmeans",
    "q_ts_spike_attribution",
    "q_events_fatigue",
    "q_agg_hill",
    "q_profile_null_pattern",
    "q_eval_mcnemar",
    "q_events_capture_recapture",
    "q_agg_robust_ttest",
    "q_events_fatigue_trend",
    # round-8: order-statistic device family (distinct-value reduce +
    # dist_cumsum rank crossings — expect ~linear in the reduce, flat
    # after), resampling/sketch (map-side collapse: ~linear), graph LP
    # (per-round join+agg), export sharding, quota sampling
    "q_agg_percentile_global",
    "q_agg_median_exact",
    "q_anomaly_iqr",
    "q_feature_scale",
    "q_agg_permutation_test",
    "q_agg_countmin",
    "q_ml_knn",
    "q_ml_ridge",
    "q_eval_pr",
    "q_ts_mann_kendall",
    "q_graph_label_prop",
    "q_pack_shards",
    "q_orders_newsvendor",
    "q_agg_trimmed_mean",
    "q_sample_balanced",
    "q_agg_dp_counts",
    "q_dedup_lsh_tuning",
    "q_agg_raking",
    "q_agg_weighted_median",
    "q_agg_wilcoxon_signed",
    "q_sim_ivf_tuning",
    "q_agg_tost",
    "q_events_sequential",
    "q_text_novelty",
    "q_agg_effect_size",
    "q_sample_ess",
    "q_sql_identifier",
    "q_orders_eoq",
    "q_text_keyness",
    "q_ts_pacf",
    "q_events_k_anonymity",
    "q_agg_lorenz",
    "q_fn_crypto",
    "q_events_heatmap",
    "q_ts_runs_test",
    "q_ml_threshold",
    "q_events_overlap",
    "q_agg_bootstrap_diff",
    "q_ts_rate_ci",
    # round-9 additions
    "q_graph_clustering",
    "q_dq_expectations",
    "q_eval_kappa",
    "q_ts_backtest",
    "q_graph_reciprocity",
    "q_orders_aging",
    "q_text_source_divergence",
    "q_text_char_entropy",
    "q_agg_overdispersion",
    "q_ts_ljungbox",
    "q_text_lexical_diversity",
    "q_text_pii_scan",
    "q_profile_topk",
    "q_anomaly_seasonal",
    "q_orders_repeat",
    "q_embed_outliers",
    "q_join_trigram",
    "q_retention_halflife",
    "q_ml_nearest_centroid",
    "q_ts_seasonal_drift",
    "q_ts_return_level",
    "q_orders_leadtime",
    "q_ts_gaps",
    "q_text_kneser_ney",
    "q_text_langid_margin",
    "q_text_boilerplate",
    "q_mix_epochs",
    "q_dedup_prefix",
    "q_ts_hurst",
    "q_events_hazard",
    "q_ts_sax",
    "q_agg_gpd_tail",
    "q_orders_crk",
    "q_graph_hits",
    "q_eval_lift",
    "q_profile_consistency",
    "q_layout_advisor",
    "q_ml_residual_diag",
    "q_sim_pair_hist",
    "q_ml_kfold_cv",
    "q_ts_strength",
    "q_events_templates",
    "q_orders_yoy",
    "q_curation_ablation",
    "q_embed_dim_profile",
    "q_ts_mtbf",
    "q_json_schema_infer",
    "q_events_dwell",
    "q_sample_importance_clip",
    "q_join_explosion_audit",
    "q_dedup_savings",
    "q_ts_debounce",
    "q_eval_brier",
    "q_text_fertility",
    "q_text_effective_tokens",
    "q_layout_file_plan",
    "q_scan_csv_sniff",
    "q_eval_auc_ci",
    "q_dq_referential",
    "q_dedup_threshold_curve",
    "q_agg_icc",
    "q_ts_its",
    "q_agg_partial_corr",
    "q_mm_integrity",
    "q_events_out_of_order",
    "q_ml_target_encoding",
    "q_orders_basket_profile",
    "q_scan_sorted_stats",
    "q_ml_conformal",
    # round-10 additions: corpus-growth/consistency diagnostics, the
    # matryoshka retrieval audit (probe-broadcast single corpus scan),
    # blocked cross-lingual screening, fairness panel, tail-exponent
    # fits (bounded-histogram folds: ~flat), curriculum banding
    "q_text_heaps",
    "q_text_lang_mix",
    "q_embed_matryoshka",
    "q_dedup_cross_lang",
    "q_eval_fairness",
    "q_graph_powerlaw",
    "q_mix_curriculum",
    "q_scan_csv_gzip",
    "q_ml_hard_negatives",
    # round-10b additions: feature screening / splits / sampling on
    # grid reduces (~linear in the one raw pass, flat after), the
    # embedding geometry family (anchor-broadcast scans: linear),
    # ordinal/spectral series diagnostics (calendar-bounded spines:
    # counts grow, days don't), and the histogram GBM (per-value
    # reduce + bounded-grid candidate evaluation)
    "q_feature_woe",
    "q_split_stratified",
    "q_sample_systematic",
    "q_embed_mmd",
    "q_embed_twonn",
    "q_embed_fisher_dims",
    "q_agg_taildep",
    "q_agg_winsorized_corr",
    "q_agg_ratio_estimator",
    "q_agg_xtab_residuals",
    "q_ts_perm_entropy",
    "q_ts_holt",
    "q_ts_yule_walker",
    "q_ts_spectral_entropy",
    "q_text_vocab_coverage",
    "q_ml_learning_curve",
    "q_ml_gbm_stumps",
    "q_events_absorbing",
    "q_ml_odds_ratio",
    "q_orders_croston",
    "q_graph_rich_club",
    "q_agg_cpk",
    # round-11 additions: spine-bounded wavelet/VR/cointegration/DTW
    # (counts grow, days don't: ~flat), power-sum shape stats and the
    # 3-pass Huber (~linear), bounded-anchor embedding scans (linear),
    # basket self-join + degree joins (~linear)
    "q_ts_haar_energy",
    "q_ts_variance_ratio",
    "q_ts_cointegration",
    "q_ts_dtw",
    "q_agg_bimodality",
    "q_agg_huber",
    "q_embed_anisotropy",
    "q_embed_hubness",
    "q_orders_basket_rules",
    "q_graph_neighbor_degree",
    "q_events_burstiness",
    "q_ml_isotonic",
    "q_ts_holt_winters",
    "q_anomaly_esd",
    "q_scan_merge_schema",
    "q_dedup_url",
    "q_embed_drift",
    "q_sample_kcenter",
    "q_text_encoding_audit",
    # TPC-H suite (fact growth over fixed dims - the realistic shape)
    "q_tpch_q3",
    "q_tpch_q6",
    "q_tpch_q7",
    "q_tpch_q8",
    "q_tpch_q10",
    "q_tpch_q14",
    "q_tpch_q15",
    "q_tpch_q18",
    "q_tpch_q22",
    "q_tpch_q4",
    "q_tpch_q13",
    "q_tpch_q19",
    # round-12 TPC-H completion: the partsupp queries are dim-only
    # (availqty/cost arithmetic over 4·|part| — expect ~FLAT under
    # fact replication), Q9/Q12/Q21/Q5/Q17/Q20/Q1 are fact-linear
    "q_tpch_q1",
    "q_tpch_q2",
    "q_tpch_q5",
    "q_tpch_q9",
    "q_tpch_q11",
    "q_tpch_q12",
    "q_tpch_q16",
    "q_tpch_q17",
    "q_tpch_q20",
    "q_tpch_q21",
    # round-12 second batch: rank spines (distinct-value growth is
    # sublinear under replication), day-grid windows (~flat), and the
    # multi-source BFS (edge growth saturates under replication)
    "q_agg_kruskal",
    "q_agg_moods_median",
    "q_agg_bartlett",
    "q_agg_friedman",
    "q_ts_bollinger",
    "q_ts_rsi",
    "q_ts_macd",
    "q_graph_closeness",
    "q_events_flap",
    "q_ml_adversarial",
]

STRESS_ROOT = Path(__file__).resolve().parent.parent / ".spark-warehouse"


def build_corpus(spark, sf_dir: str, mult: int) -> str:
    """Replicate documents/embeddings mult-fold with offset ids.

    Replica k shifts doc_id/vec_id by k * 10^7 and, for k > 0, prefixes
    the text with a replica tag so replicas are not exact duplicates of
    the original (exact-dup behavior stays exercised by the k=0 copy
    itself). Embeddings are reused as-is per replica (identical vectors
    land in identical LSH buckets - the hot-bucket guardrails are
    exactly what gets stressed).
    """
    out = STRESS_ROOT / f"stress_{mult}x_{Path(sf_dir).name}"
    marker = out / "_built_v3"  # v3: TPC-H facts replicated, dims copied
    if marker.exists():
        return str(out)
    out.mkdir(parents=True, exist_ok=True)
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    ev = load_table(spark, sf_dir, "events")
    reps = spark.range(mult).select(F.col("id").alias("rep"))
    (
        d.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
            F.when(F.col("rep") == 0, F.col("text"))
            .otherwise(F.concat(F.lit("rep"), F.col("rep"), F.lit(" "), F.col("text")))
            .alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(str(out / "documents.parquet"))
    )
    (
        e.crossJoin(reps)
        .select(
            (F.col("vec_id") + F.col("rep") * 10_000_000).alias("vec_id"),
            "embedding",
            "label",
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(str(out / "embeddings.parquet"))
    )
    # Events: replica k offsets event_id/user_id by k*10^7 and keeps ts
    # unchanged — user count grows N-fold over the same time span, so
    # resample grids, funnel sequences, and window state all grow
    # linearly in N while per-user bounds stay constant (the scale
    # claim under test).
    reps2 = spark.range(mult).select(F.col("id").alias("rep"))
    (
        ev.crossJoin(reps2)
        .select(
            (F.col("event_id") + F.col("rep") * 10_000_000).alias("event_id"),
            "ts",
            (F.col("user_id") + F.col("rep") * 10_000_000).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(str(out / "events.parquet"))
    )
    # TPC-H: replicate the FACTS (orders/lineitem, orderkey-offset per
    # replica; custkeys unchanged so per-customer order counts grow
    # N-fold — fact growth over fixed dims, the realistic 100 TB shape)
    # and copy the dims verbatim.
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    (
        o.crossJoin(reps)
        .select(
            (F.col("o_orderkey") + F.col("rep") * 100_000_000).alias("o_orderkey"),
            *[c for c in o.columns if c != "o_orderkey"],
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(str(out / "orders.parquet"))
    )
    (
        li.crossJoin(reps)
        .select(
            (F.col("l_orderkey") + F.col("rep") * 100_000_000).alias("l_orderkey"),
            *[c for c in li.columns if c != "l_orderkey"],
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(str(out / "lineitem.parquet"))
    )
    for dim in ("region", "nation", "customer", "supplier", "part"):
        load_table(spark, sf_dir, dim).write.mode("overwrite").parquet(
            str(out / f"{dim}.parquet")
        )
    marker.touch()
    return str(out)


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    # Optional query subset (args 3+) — deep multiples on flagships
    # without paying for the whole list.
    queries = sys.argv[3:] or QUERIES
    spark = get_spark("stress")
    stress_dir = build_corpus(spark, sf_dir, mult)
    n_docs = spark.read.parquet(f"{stress_dir}/documents.parquet").count()
    n_vecs = spark.read.parquet(f"{stress_dir}/embeddings.parquet").count()

    def consume(df):
        df.agg(F.max(F.xxhash64(*df.columns))).collect()

    base: dict[str, float] = {}
    stressed: dict[str, float] = {}
    for name in queries:
        fn = registry.get(name).fn
        consume(fn(spark, sf_dir))  # warm
        t0 = time.perf_counter()
        consume(fn(spark, sf_dir))
        base[name] = round(time.perf_counter() - t0, 3)
        consume(fn(spark, stress_dir))  # warm (plan/JIT)
        t0 = time.perf_counter()
        consume(fn(spark, stress_dir))
        stressed[name] = round(time.perf_counter() - t0, 3)

    print(
        json.dumps(
            {
                "mult": mult,
                "docs": n_docs,
                "vecs": n_vecs,
                "base_sec": base,
                "stressed_sec": stressed,
                "ratio": {
                    k: round(stressed[k] / base[k], 2) if base[k] else None
                    for k in base
                },
            }
        )
    )


if __name__ == "__main__":
    main()
