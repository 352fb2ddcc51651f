"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {slowest 5: sec}, "sf": ...}. The printed line is kept
COMPACT (≤ ~1 KB — round 5's full per-query dict outgrew the driver's
tail capture and the artifact landed unparseable); the complete
per-query warm+cold detail is written to BENCH_DETAIL_r{N}.json next
to this file, which each round commits.

Each query is executed to completion by aggregating a hash over EVERY
output cell (`agg(max(xxhash64(*cols)))` — one row to the driver, the
consumption stays distributed). Earlier rounds used `count()`, which
under-measures: Catalyst legally prunes projections under a count (a
map-only query times as just its scan) and drops aggregate expressions
when only group cardinality is needed (q_agg_hash timed 0.30s vs 1.13s
real at sf0.1). The hash terminal defeats both prunings uniformly, so
r3+ numbers are higher than r1/r2 on some queries BY MEASUREMENT FIX,
not regression.

One cold pass ("cold": JVM warmup, codegen compilation, derived
layouts, IVF index builds) then THREE warm passes with the per-query
MEDIAN reported — r2 showed 1.5-2x run-to-run noise on this box from
external load, and a single warm sample read as a phantom regression.
The localCheckpoint-heavy fixpoint set (FIXPOINT below) gets TWO extra
warm passes (median-of-5) and every query's best warm sample lands in
the detail file as `queries_min` — r11's q_graph_kcore spread 4.6-19.2s
within one run, and median-of-3 cannot absorb that.
The headline `value`/`queries` are the median warm pass — one-time
driver costs are irrelevant at the 100 TB design point — but
`value_cold`/`queries_cold` keep the build costs visible so cached
layouts can't silently flatter round-over-round comparisons.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from asyncdatapipeline_spark import registry  # noqa: E402
from asyncdatapipeline_spark.config import PipelineConfig  # noqa: E402
from asyncdatapipeline_spark.pipeline import CloseReason, Pipeline  # noqa: E402
from asyncdatapipeline_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q_agg_hash",        # flagship: scan-heavy grouped aggregation
    "q_join_inner",      # shuffle join
    "q_join_broadcast",  # broadcast dim join + agg
    "q_join_asof",       # union+window as-of join
    "q_win_rank",        # window shuffle + sort
    "q_topk_group",      # per-group top-k (WindowGroupLimit)
    "q_window_session",  # sessionization
    "q_dedup_exact",     # hash dedup
    "q_dedup_minhash",   # MinHash LSH banding
    "q_sim_topk",        # brute-force cosine top-k
    "q_text_tokens",     # regex tokenization scan
    "q_pack_sequences",  # window-cumsum sequence packing
    "q_join_dpp",        # dynamic partition pruning join
    "q_curation_pipeline",  # composed quality→dedup→pack flagship
    "q_text_decontam",   # benchmark decontamination (broadcast eval set)
    "q_text_repetition", # Gopher repetition signals (row-local folds)
    "q_split_hash",      # deterministic md5 train/valid/test split
    "q_dedup_embed_lsh", # hyperplane-LSH bucketed embedding dedup
    "q_curation_full",   # 6-stage composed curation flagship
    "q_ts_resample",     # hourly resample + gap-fill + forward-fill
    "q_profile",         # per-column exact profile (union shape)
    "q_join_multiway",   # six-table Q5-shape snowflake join
    "q_dedup_incremental",  # new batch vs persisted signature store
    "q_dedup_chunk",     # chunk-level boilerplate dedup
    "q_text_bm25",       # BM25 retrieval top-k (broadcast corpus stats)
    "q_retention",       # cohort retention rollup
    # round-5 additions (superset-stable: nothing above ever drops)
    "q_subquery_correlated",  # decorrelated TPC-H Q17 shape
    "q_exists_correlated",    # decorrelated EXISTS/NOT EXISTS (Q21)
    "q_join_bloom",           # runtime bloom-filter fact-scan pruning
    "q_dedup_semantic",       # SemDeDup: IVF cells + within-cell cosine
    "q_agg_sketch_setops",    # theta-sketch set algebra + exact twins
    "q_join_lateral",         # LATERAL + per-group LIMIT (WindowGroupLimit)
    "q_recursive_cte",        # WITH RECURSIVE calendar spine (UnionLoop)
    "q_agg_kll",              # mergeable KLL quantile sketches
    "q_agg_bitmap",           # exact bitmap distinct partials
    "q_ts_interpolate",       # linear gap fill (desc running frames)
    "q_anomaly_mad",          # robust MAD outliers (broadcast stats)
    "q_window_session_dynamic",  # per-event-gap session windows
    # round-6 additions
    "q_graph_pagerank",       # iterative: 3 damped power-iteration rounds
    "q_dedup_clusters",       # iterative: min-label propagation fixpoint
    "q_agg_heavy",            # mergeable frequency sketch (approx_top_k)
    "q_udf_cogroup",          # two-sided grouped map (pandas cogroup)
    "q_curation_report",      # per-gate rejection funnel, one corpus pass
    "q_text_bigram_lm",       # bigram-LM surprisal (ln-contract join)
    "q_cdc_apply",            # CDC feed apply: union + max_by hash agg
    "q_win_concurrency",      # sweep-line peak overlap per day
    "q_join_spatial_grid",    # grid-bucketed radius join
    "q_graph_components",     # iterative: connected components
    "q_ts_theilsen",          # O(days^2) pairwise-slope median
    "q_text_readability",     # scan-bound regex counts + group sums
    "q_eval_dedup",           # composite: exact-Jaccard truth vs LSH candidates
    "q_rfm_migration",        # two ntile sorts + customer self-join matrix
    "q_ts_decompose",         # STL-lite: window MA + dow seasonal join
    "q_agg_spearman",         # distributed rank stats (dist_cumsum spine)
    # round-7 additions
    "q_eval_report",          # composed model card: AUC+confusion+ECE
    "q_agg_kendall",          # contingency-grid quadratic tau-b
    "q_graph_jaccard",        # hot-capped common-neighbor pair mining
    "q_ts_changepoint",       # dist_cumsum prefix + argmax split
    "q_agg_theil",            # ln-contract decimal products, decomposition
    "q_ts_granger",           # 14 BIGINT power sums on the day spine
    "q_skyline",              # spine-reduced Pareto frontier
    "q_graph_kcore",          # iterative peel: join+agg per round
    # round-8 additions: the exact distributed order-statistic family
    # (distinct-value reduce + dist_cumsum rank crossings), permutation
    # resampling, quota sampling, export sharding, label propagation
    "q_agg_percentile_global",  # exact global percentiles, no sort buffer
    "q_agg_permutation_test",   # 199 md5 relabelings, map-side collapse
    "q_feature_scale",          # z/minmax/pct-rank, value-keyed join back
    "q_agg_countmin",           # 3x64 grid sketch + broadcast probe
    "q_pack_shards",            # dist_cumsum byte offsets -> manifest
    "q_sample_balanced",        # per-class exact quota via rank spine
    "q_graph_label_prop",       # 3 bounded voting rounds on node key
    "q_ts_mann_kendall",        # day-spine pair test, integer kernels
    # round-9 additions: consolidation round's new coverage — graph
    # normalization, DQ gating, rater agreement, forecast/backtest and
    # distribution-divergence ops
    "q_graph_clustering",       # support-graph triangles / wedges
    "q_dq_expectations",        # tolerance rules, one agg pass
    "q_ts_backtest",            # lag-7 holdout, day-spine equi join
    "q_text_source_divergence", # per-source JSD, decimal-ln fold
    "q_text_char_entropy",      # char-level entropy, bounded fan-in
    "q_agg_overdispersion",     # per-type dispersion on dense spine
    "q_text_lexical_diversity", # corpus + per-doc TTR panel
    "q_orders_repeat",          # first->second gap via rank device
    "q_embed_outliers",         # all-integer centroid distances
    "q_anomaly_seasonal",       # DOW-stratified z on dense spine
    "q_join_trigram",           # df-capped set-similarity join
    "q_ml_nearest_centroid",    # |labels|*d broadcast scoring
    "q_orders_leadtime",        # grouped rank device over a fact join
    "q_text_kneser_ney",        # KN-smoothed bigram LM (3-agg explode)
    "q_text_boilerplate",       # cross-doc gram census per source
    # round-10 additions
    "q_text_heaps",             # vocab-growth: dist_cumsum + rank crossings
    "q_text_lang_mix",          # per-segment lang-ID + per-doc majority
    "q_embed_matryoshka",       # probe-broadcast prefix-dim retention scan
    "q_dedup_cross_lang",       # bucketed cross-lingual cosine screening
    # round-10b additions: feature screening, exact stratified split,
    # embedding drift/geometry, tail co-movement, ordinal complexity
    "q_feature_woe",            # WOE/IV bin screen, one grid pass
    "q_split_stratified",       # exact per-stratum split via dist_cumsum
    "q_embed_mmd",              # (label,dim) grid reduce + pair grid join
    "q_embed_twonn",            # anchor-broadcast 2-NN scan, intrinsic dim
    "q_agg_taildep",            # rank-device thresholds + one joint pass
    "q_ts_perm_entropy",        # ordinal patterns on the daily grid
    "q_ts_holt",                # per-series fold over calendar arrays
    "q_agg_ratio_estimator",    # six power sums, closed-form Taylor SE
    "q_text_vocab_coverage",    # desc dist_cumsum + rank checkpoints
    "q_sample_systematic",      # integer PPS picks on the weight line
    "q_ts_yule_walker",         # AR(2) solve on integer lag products
    "q_ts_spectral_entropy",    # 12-band trig sums on the daily grid
    "q_agg_xtab_residuals",     # dense margin grid cell diagnostics
    "q_agg_winsorized_corr",    # rank-device clamps + ten power sums
    "q_ml_learning_curve",      # nested-subset centroid accuracy
    "q_ml_gbm_stumps",          # histogram GBM: 2 boosted stump rounds
    "q_embed_fisher_dims",      # per-dim ANOVA F discriminability
    "q_events_absorbing",       # 12 bounded-grid Neumann iterations
    "q_ml_odds_ratio",          # 2x2 cells + Woolf interval per segment
    "q_orders_croston",         # twin scalar folds on demand events
    "q_graph_rich_club",        # hub-core density vs background
    "q_agg_cpk",                # SPC capability on power sums
    # round-11 additions
    "q_ts_haar_energy",         # dyadic-block wavelet energy on the spine
    "q_ts_variance_ratio",      # lag windows + integer power sums
    "q_ts_cointegration",       # OLS + DF stat on the 6dp residual grid
    "q_agg_bimodality",         # x^4 power sums, closed form
    "q_agg_huber",              # 3 linear passes (mean start + 2 IRLS)
    "q_embed_anisotropy",       # norm-of-sum identity, per-dim reduce
    "q_embed_hubness",          # bounded-anchor corpus scan + top-k
    "q_orders_basket_rules",    # basket-key self-join + broadcast margins
    "q_graph_neighbor_degree",  # two degree joins, bounded class grid
    "q_events_burstiness",      # per-(user,type) lag + moment reduce
    "q_ts_dtw",                 # applyInPandas banded DP on the spine
    "q_ml_isotonic",            # bounded minimax isotonic fit
    "q_ts_holt_winters",        # seasonal fold, list state
    "q_anomaly_esd",            # 3 unrolled peel rounds on the spine
    "q_scan_merge_schema",      # two-generation mergeSchema scan
    "q_dedup_url",              # codegen canonicalizer + grouped count
    "q_embed_drift",            # micro-grid centroid drift per label
    "q_sample_kcenter",         # k unrolled farthest-point scans
    "q_text_encoding_audit",    # row-local charset artifact counts
    # round-11 TPC-H suite
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
    # round-12 additions
    "q_agg_ccc",              # day-panel power sums, one-row closed form
    "q_agg_deming",           # errors-in-both regression, same panel
    "q_ml_vif",               # 9 Gram sums -> 3-row VIF grid
    "q_embed_participation",  # 2080-cell covariance grid, trace ratio
    "q_text_hapax",           # frequency-of-frequency source census
    "q_graph_degree_gini",    # bounded class grid, integer MAD identity
    "q_agg_welch",            # heteroscedastic ANOVA, snapped weights
    "q_agg_quantile_ci",      # order-statistic median CI on the spine
    # round-12 TPC-H completion (derived-dimension device)
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
    # round-12 second batch
    "q_agg_kruskal",          # doubled-midrank spine, k groups
    "q_agg_moods_median",     # exact grand median + k×2 chi-square
    "q_agg_bartlett",         # per-group power sums + 9dp ln contract
    "q_agg_friedman",         # day-bounded midrank windows, integer Q
    "q_ts_bollinger",         # 7-row windowed power sums + breach flags
    "q_ts_rsi",               # 14-row SMA gain/loss oscillator
    "q_ts_macd",              # two chained truncated-EMA windows
    "q_graph_closeness",      # multi-source bounded BFS (fixpoint-set)
    "q_events_flap",          # entity-keyed toggle census
    "q_ml_adversarial",       # per-feature drift AUC (rank spine)
]


# The variance-prone set: localCheckpoint-heavy fixpoint queries (20+
# eager per-round materializations each; q_graph_kcore spread
# 4.6-19.2 s within ONE r11 bench run on an audited-clean plan) plus
# the recurrent box-weather magnets — dist_cumsum-spine and pandas-UDF
# queries whose materialization/Arrow phases land hardest when an
# external load spike crosses a warm pass (r12 observed a pass-wide
# spike: changepoint samples [1.2, 26.0, 11.7] with min ≈ the r11
# median — two contended passes defeat a median-of-3). These get TWO
# extra warm passes (median-of-5), and the detail artifact carries
# per-query minima so "best observed" is always visible next to the
# median (r11 verdict item 2).
FIXPOINT = {
    "q_graph_kcore",
    "q_graph_components",
    "q_graph_pagerank",
    "q_graph_clustering",
    "q_graph_label_prop",
    "q_graph_rich_club",
    "q_graph_jaccard",
    "q_dedup_clusters",
    # recurrent movers (r10 scare list + r11/r12 driver-bench spikes)
    "q_ts_changepoint",
    "q_udf_cogroup",
    "q_agg_winsorized_corr",
    "q_agg_spearman",
    "q_agg_taildep",
    "q_agg_percentile_global",
    "q_embed_participation",
    "q_ml_vif",
    "q_graph_closeness",  # r12: multi-source BFS, localCheckpoint/round
}


def consume(df) -> None:
    """Force full evaluation of every output cell, distributed.

    `count()` is NOT a faithful terminal: Catalyst prunes map-only
    projections and aggregate expressions under it. Hashing every column
    into one max() defeats the pruning while shipping a single row to
    the driver (collect() would time py4j row serialization instead of
    the engine).
    """
    from pyspark.sql import functions as F

    df.agg(F.max(F.xxhash64(*df.columns))).collect()


def bench_pipeline(workers: int, n_batches: int = 20_000) -> float:
    """Reference-parity pipeline throughput, batches/sec ("ops/sec" in
    BASELINE.md terms).

    Mirrors the reference benchmark harness (BASELINE.md; reference
    async_data_pipeline_test.go:19-78): 100-row batches, no-op process,
    run ends by idle timeout once the source dries up. Throughput is
    measured to the moment the LAST batch is processed — the idle-out
    tail is shutdown semantics, not work, and the reference's b.N timer
    likewise stops before its 3s drain sleep.
    """
    state = {"sent": 0, "done_at": 0.0}
    batch = [{"id": i, "value": f"value_{i}"} for i in range(100)]

    def collect(p):
        if state["sent"] >= n_batches:
            time.sleep(0.05)  # source dry → block → idle-out
            return None
        state["sent"] += 1
        return batch

    def process(p, data):
        if state["sent"] >= n_batches:
            state["done_at"] = time.perf_counter()

    pipe = Pipeline(
        PipelineConfig(max_workers=workers, idle_time=0.3, collect_timeout=5.0),
        collect,
        process,
    )
    t0 = time.perf_counter()
    reason, errors = pipe.run(deadline=120)
    assert reason is CloseReason.IDLE_TIMEOUT and not errors, (reason, errors)
    return n_batches / ((state["done_at"] or time.perf_counter()) - t0)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench")

    # cold pass: JVM + codegen warmup, layout/index builds — timed too,
    # so cache reuse stays visible round-over-round
    cold: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        consume(registry.get(name).fn(spark, sf_dir))
        cold[name] = round(time.perf_counter() - t0, 3)

    # warm passes: median-of-3 per query, interleaved by pass (not by
    # query) so a transient load spike on the box degrades one sample of
    # many queries instead of all three samples of one
    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for _ in range(3):
        for name in HEADLINE:
            fn = registry.get(name).fn
            t0 = time.perf_counter()
            consume(fn(spark, sf_dir))
            samples[name].append(time.perf_counter() - t0)
    # two extra interleaved passes over the fixpoint set only
    # (median-of-5 where the variance lives; the other ~134 queries
    # stay median-of-3 — their r11 sample spreads were tight)
    for _ in range(2):
        for name in HEADLINE:
            if name not in FIXPOINT:
                continue
            fn = registry.get(name).fn
            t0 = time.perf_counter()
            consume(fn(spark, sf_dir))
            samples[name].append(time.perf_counter() - t0)
    timings = {
        name: round(statistics.median(ts), 3)
        for name, ts in samples.items()
    }

    # reference-parity runtime throughput (BASELINE.md: 1000-5500 ops/sec
    # at workers 1-16 on 4 cores; "op" = one 100-row batch)
    pipeline_ops = {
        f"w{w}": round(bench_pipeline(w), 1) for w in (1, 2, 4, 8, 16)
    }

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf

    # Full per-query detail goes to a committed file; the stdout line
    # stays compact (≤ ~1 KB). Round 5's per-query dict outgrew the
    # driver's tail capture and BENCH_r05.json landed with parsed:null —
    # the headline line must never grow with the query count again.
    round_no = 1 + max(
        (
            int(p.stem.split("_r")[-1])
            for p in Path(__file__).parent.glob("BENCH_r*.json")
            if p.stem.split("_r")[-1].isdigit()
        ),
        default=0,
    )
    detail_path = Path(__file__).parent / f"BENCH_DETAIL_r{round_no:02d}.json"
    detail = {
        "metric": "headline_queries_total_runtime",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "value_cold": round(sum(cold.values()), 3),
        "queries_cold": cold,
        # raw per-pass samples behind each median — a single-sample
        # outlier (the r10 changepoint/cogroup scare) is then visible
        # as one bad sample of three instead of a phantom regression
        "queries_samples": {
            name: [round(t, 3) for t in ts] for name, ts in samples.items()
        },
        # best observed warm sample — with fixpoint in-suite variance
        # (r11: kcore 4.6-19.2 s within ONE bench run) the min is the
        # contention-free reading; median >> min flags block-manager /
        # box pressure, not an operator regression
        "queries_min": {
            name: round(min(ts), 3) for name, ts in samples.items()
        },
        "sf": sf_val,
        "pipeline_ops_per_sec": pipeline_ops,
    }
    # Gate/config knobs that change plan shapes (r8 verdict #4:
    # q_rfm_migration's 1.51x was the knowingly-paid exact-window-gate
    # cost — the artifact must record the config so round-over-round
    # diffs can separate config-driven deltas from drift).
    env_knobs = {
        k: os.environ.get(k, "<default>")
        for k in (
            "SPARK_GRAFT_EXACT_WINDOW_MAX",
            "SPARK_GRAFT_HASH",
            "SPARK_GRAFT_CPUS",
        )
    }
    detail["env"] = env_knobs
    detail_path.write_text(json.dumps(detail, indent=1) + "\n")

    slowest5 = dict(
        sorted(timings.items(), key=lambda kv: -kv[1])[:5]
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": detail["value"],
                "unit": "sec",
                "queries": slowest5,  # slowest 5 warm; full dict in detail file
                "n_queries": len(timings),
                "value_cold": detail["value_cold"],
                "sf": sf_val,
                "pipeline_ops_per_sec": pipeline_ops,
                "env": env_knobs,
                "detail": detail_path.name,
            }
        )
    )


if __name__ == "__main__":
    main()
