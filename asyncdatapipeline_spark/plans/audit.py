"""Physical-plan audit — the 100 TB design checks (SURVEY.md bench loop).

For each audited query, asserts structural plan properties that decide
scale behavior: filters pushed into the parquet scan, column pruning,
broadcast joins where a side is dim-sized, TakeOrderedAndProject for
global top-k, WindowGroupLimit for per-group top-k, whole-stage codegen
presence. The checks are data: ``CHECKS`` maps query name → a list of
check specs; ``run_audit`` evaluates everything and returns
(query, description, ok) triples for the CLI / tests to render.

Check spec forms (the ADVICE r3 fix — "must not contain" is a real
absence test, never an anchored negative-lookahead regex, which is
vacuous under DOTALL|MULTILINE because ``$`` matches at any line end):

- ``("must", description, regex)``   — re.search must hit the plan.
- ``("forbid", description, tok1, tok2, ...)`` — NO token may appear as
  a plain substring anywhere in the plan.
- ``("forbid_re", description, regex)`` — re.search must NOT hit.

The reference has no plan representation at all (SURVEY.md §4 — its
execution is two goroutines and a channel); this module is the engine's
guard that the *Spark* plans we generate keep the shapes that survive a
100× scale-up.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession

from asyncdatapipeline_spark import registry
from asyncdatapipeline_spark.operators.profile import _PROFILE_COLS

_PYTHON_EVAL_NODES = ("ArrowEvalPython", "BatchEvalPython")
_NESTED_LOOP_NODES = ("BroadcastNestedLoopJoin", "CartesianProduct")


def plan_of(
    spark: SparkSession, name: str, sf_dir: str, mode: str = "formatted"
) -> str:
    """Formatted physical plan of a registered query (no execution)."""
    df = registry.get(name).fn(spark, sf_dir)
    return spark.sparkContext._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


# name → list of check specs (see module docstring for forms)
CHECKS: dict[str, list[tuple]] = {
    "q_agg_hash": [
        ("must", "shipdate filter pushed to scan", r"PushedFilters: \[.*LessThanOrEqual\(l_shipdate"),
        ("forbid", "column pruning (no l_orderkey read)", "l_orderkey"),
        ("must", "partial aggregation before shuffle", r"HashAggregate.*partial"),
        # codegen ids only appear in executed/simple plans → run_audit
    ],
    "q_scan_parquet": [
        ("must", "quantity filter pushed", r"PushedFilters: \[.*GreaterThanOrEqual\(l_quantity"),
        ("must", "5-column pruned schema", r"ReadSchema: struct<l_orderkey:bigint,l_partkey:bigint,l_suppkey:bigint,l_quantity:double,l_extendedprice:double>"),
    ],
    "q_scan_orc": [
        ("must", "balance filter pushed into the ORC scan", r"PushedFilters: \[.*GreaterThan\(s_acctbal"),
    ],
    "q_embed_matryoshka": [
        # probe set must broadcast into a nested-loop (!= condition);
        # the corpus must never cartesian or shuffle for scoring
        ("must", "probe join is broadcast nested loop", r"BroadcastNestedLoopJoin"),
        ("forbid", "no cartesian product", "CartesianProduct"),
        ("must", "per-(probe,prefix) top-1 partially aggregated", r"HashAggregate.*partial"),
    ],
    "q_ml_hard_negatives": [
        ("must", "anchor fan-out is broadcast nested loop", r"BroadcastNestedLoopJoin"),
        ("must", "per-anchor top-k is WindowGroupLimit", r"WindowGroupLimit"),
        ("forbid", "no cartesian product", "CartesianProduct"),
    ],
    "q_dedup_cross_lang": [
        ("forbid", "no cartesian product", "CartesianProduct"),
        ("must", "bucket-size guardrail partially aggregated", r"HashAggregate.*partial"),
    ],
    "q_text_heaps": [
        ("must", "first-occurrence reduce partially aggregated", r"HashAggregate.*partial"),
        ("forbid", "no cartesian product", "CartesianProduct"),
    ],
    "q_orders_dup_payments": [
        # the +-1-band probe must plan as an EQUI join, never a
        # per-customer nested loop / cartesian
        ("forbid", "no nested-loop pair join", "BroadcastNestedLoopJoin", "CartesianProduct"),
    ],
    "q_scan_csv_gzip": [
        ("must", "explicit schema (3-column read)", r"ReadSchema: struct<n_nationkey:int,n_name:string,n_regionkey:int>"),
    ],
    "q_scan_sorted_stats": [
        # sort-on-write layout: the day-range predicate must reach the
        # parquet scan so row-group min/max stats can skip I/O
        ("must", "day range pushed to the sorted scan", r"PushedFilters: \[.*GreaterThanOrEqual\(day,19730\)"),
        ("must", "upper bound pushed too", r"LessThanOrEqual\(day,19736\)"),
        ("must", "4-column pruned schema", r"ReadSchema: struct<event_id:bigint,day:bigint,event_type:string,value:double>"),
    ],
    "q_join_broadcast": [
        ("must", "nation broadcast", r"BroadcastHashJoin"),
        ("forbid", "no sort-merge join", "SortMergeJoin"),
    ],
    "q_join_inner": [
        ("must", "status filter pushed below join", r"PushedFilters: \[.*EqualTo\(o_orderstatus,F\)"),
    ],
    "q_join_theta": [
        ("must", "broadcast nested loop (band side broadcast)", r"BroadcastNestedLoopJoin"),
    ],
    "q_topk": [
        ("must", "TakeOrderedAndProject (no full sort)", r"TakeOrderedAndProject"),
    ],
    "q_topk_group": [
        ("must", "WindowGroupLimit pushdown", r"WindowGroupLimit"),
    ],
    "q_join_asof": [
        ("must", "single window over union (no range join)", r"Window"),
        ("forbid", "no nested-loop blowup", *_NESTED_LOOP_NODES),
    ],
    "q_dedup_exact": [
        ("must", "partial agg on hash key", r"HashAggregate.*partial"),
        ("must", "only text+doc_id read", r"ReadSchema: struct<doc_id:bigint,text:string>"),
    ],
    "q_sim_topk": [
        ("must", "TakeOrderedAndProject over scan", r"TakeOrderedAndProject"),
        ("forbid", "no join anywhere (broadcast literal)", "Join"),
    ],
    "q_filter": [
        ("must", "all predicates pushed", r"PushedFilters: \[.*GreaterThan\(l_discount,0\.03\)"),
    ],
    "q_join_range": [
        ("forbid", "binned equi join, no nested loop", *_NESTED_LOOP_NODES),
    ],
    "q_join_interval": [
        ("forbid", "binned equi join, never a nested loop", *_NESTED_LOOP_NODES),
    ],
    "q_scan_partition_pruned": [
        ("must", "date filter became a partition filter", r"PartitionFilters: \[[^\]]*event_date"),
    ],
    "q_join_dpp": [
        ("must", "runtime pruning subquery planted on the fact scan", r"PartitionFilters: \[[^\]]*dynamicpruningexpression\(event_date"),
    ],
    "q_dedup_minhash": [
        ("must", "signature fold is a single projection (no per-lane explode)", r"aggregate\(transform"),
        ("must", "salted two-level bucket agg (partial mins map-side)", r"HashAggregate.*partial"),
    ],
    "q_unpivot": [
        ("must", "single map-only Expand (no union rescan)", r"Expand \[codegen id"),
        ("must", "orderkey filter pushed below the Expand", r"PushedFilters: \[.*LessThan\(l_orderkey,100\)"),
    ],
    "q_cdc_apply": [
        ("must", "latest-wins is a partial max_by aggregate", r"partial_max_by"),
        ("forbid", "no window sort over the union", "Window"),
        ("must", "payload-pruned snapshot scan", r"ReadSchema: struct<o_orderkey:bigint,o_orderstatus:string,o_totalprice:double>"),
    ],
    "q_events_outage": [
        ("must", "top-5 gaps ride WindowGroupLimit", r"WindowGroupLimit"),
        ("must", "3-column pruned event scan", r"ReadSchema: struct<event_id:bigint,ts:timestamp"),
    ],
    "q_join_spatial_grid": [
        ("must", "cell-key equi join broadcasts the expanded small side", r"BroadcastHashJoin"),
        ("forbid", "grid bucketing, never an all-pairs product", "CartesianProduct"),
        ("forbid", "no sort-merge join on the cell key", "SortMergeJoin"),
    ],
    "q_win_topn_change": [
        ("must", "per-week top-10 rides WindowGroupLimit", r"WindowGroupLimit"),
    ],
    "q_text_readability": [
        ("must", "3-column pruned document scan", r"ReadSchema: struct<text:string,lang:string,source:string>"),
        ("must", "group report is a partial-aggregated shuffle", r"HashAggregate.*partial"),
    ],
    "q_merge_upsert": [
        ("must", "source batch broadcasts onto one dimension pass", r"BroadcastHashJoin"),
        ("forbid", "no dimension shuffle join", "SortMergeJoin"),
    ],
    "q_pack_sequences": [
        ("must", "only the 3 needed document columns read", r"ReadSchema: struct<doc_id:bigint,text:string,source:string>"),
    ],
    "q_sim_knn_join": [
        ("must", "query batch broadcast (corpus streams once)", r"BroadcastExchange"),
        ("must", "per-query top-k via map-side WindowGroupLimit", r"WindowGroupLimit"),
    ],
    "q_curation_pipeline": [
        ("must", "dedup survivors via semi join", r"LeftSemi"),
        ("forbid", "no nested-loop anywhere in the fused plan", *_NESTED_LOOP_NODES),
    ],
    "q_text_decontam": [
        # The eval side must be the broadcast side — the corpus is the
        # 100 TB side and must never shuffle for this join.
        ("must", "eval shingle set broadcast against corpus scan", r"BroadcastHashJoin"),
        ("forbid", "no sort-merge join (corpus never shuffles to join)", "SortMergeJoin"),
    ],
    # (repetition / split_hash / sample_weighted: "no exchange" became
    # "no KEYED exchange" when the scan-parallelism repair landed — its
    # round-robin redistribution is the deliberate plan on 1-row-group
    # local fixtures and a no-op at production row-group counts; a
    # hash/range/single-partition exchange would still be the bug.)
    "q_text_repetition": [
        ("forbid", "row-local: no keyed exchange",
         r"Exchange (hash|range)partitioning|Exchange SinglePartition"),
        ("forbid", "no Python in the row path", *_PYTHON_EVAL_NODES),
    ],
    "q_split_hash": [
        ("forbid", "map-only: no keyed exchange",
         r"Exchange (hash|range)partitioning|Exchange SinglePartition"),
        ("must", "only doc_id read", r"ReadSchema: struct<doc_id:bigint>"),
    ],
    "q_dedup_embed_lsh": [
        ("forbid", "bucket-join, never a cartesian all-pairs", *_NESTED_LOOP_NODES),
    ],
    "q_curation_full": [
        ("must", "decontam eval set broadcast", r"BroadcastHashJoin"),
        ("forbid", "no nested-loop anywhere in the 6-stage plan", *_NESTED_LOOP_NODES),
        ("forbid", "no Python in the row path", *_PYTHON_EVAL_NODES),
    ],
    "q_ts_resample": [
        # Raw events must be aggregated BEFORE the spine explode — the
        # dense grid is generated from the (user × bucket) frame, never
        # from raw rows, so grid size is output-proportional at 100 TB.
        ("must", "bucket aggregation pushed below the spine join", r"HashAggregate.*partial"),
        ("forbid", "spine join is an equi join, not a nested loop", *_NESTED_LOOP_NODES),
    ],
    "q_profile": [
        # One check per profiled column: each branch scan must be pruned
        # to exactly that one column (ADVICE r3 — not just the first).
        *[
            ("must", f"{c} branch scan pruned to ONE column", rf"ReadSchema: struct<{c}:double>$")
            for c in _PROFILE_COLS
        ],
        # The multi-distinct Expand multiplies input rows ×(aggs+1) —
        # the per-column union shape must keep it out of the plan.
        ("forbid", "no Expand (per-column distincts, not multi-distinct)", "Expand"),
    ],
    "q_join_fuzzy": [
        ("must", "blocked equi join hashes the blocking key", r"BroadcastHashJoin"),
        ("forbid", "never a cross join of the two string sets", *_NESTED_LOOP_NODES),
    ],
    "q_embed_quantize": [
        ("forbid", "map-only quantization: no join, no agg shuffle", "Join", "HashAggregate"),
        ("forbid", "no Python in the row path", *_PYTHON_EVAL_NODES),
        # The max-abs fold must be let-bound, not re-inlined per element
        # by CollapseProject (O(d²) per row otherwise).
        ("forbid_re", "scale let-bound, not inlined into the code lambda", r"round\(\(lambda x.*array_max"),
    ],
    "q_anomaly": [
        ("must", "stats frame broadcast back onto the stream", r"BroadcastHashJoin"),
        ("forbid", "stream never shuffles to join", "SortMergeJoin"),
    ],
    "q_agg_topk": [
        ("must", "top-k after the agg via TakeOrderedAndProject", r"TakeOrderedAndProject"),
        ("must", "shipdate filter pushed into the lineitem scan", r"PushedFilters: \[.*GreaterThan\(l_shipdate"),
    ],
    "q_join_multiway": [
        ("must", "orderdate filter pushed into the orders scan", r"PushedFilters: \[.*LessThan\(o_orderdate"),
        ("must", "tiny dims broadcast (region filter prunes pre-join)", r"BroadcastHashJoin"),
        ("forbid", "no nested loop in the 6-table plan", *_NESTED_LOOP_NODES),
    ],
    "q_sample_weighted": [
        # Selection must be per-task k-heaps — a global sort of the
        # corpus to take 100 rows is the scale bug this op exists to avoid.
        ("must", "k smallest keys via TakeOrderedAndProject", r"TakeOrderedAndProject"),
        ("forbid", "no keyed corpus shuffle for the selection",
         r"Exchange (hash|range)partitioning|Exchange SinglePartition"),
    ],
    "q_agg_histogram": [
        ("must", "partial aggregation on the bucket key", r"HashAggregate.*partial"),
        ("must", "only the bucketed column read", r"ReadSchema: struct<l_extendedprice:double>"),
    ],
    "q_text_bm25": [
        ("must", "corpus-stats frame broadcast back onto the scan", r"BroadcastExchange"),
        ("must", "top-k via TakeOrderedAndProject (no global sort)", r"TakeOrderedAndProject"),
        ("forbid", "corpus never shuffles to join its own stats", "SortMergeJoin"),
        ("forbid", "no Python in the row path", *_PYTHON_EVAL_NODES),
    ],
    "q_dedup_chunk": [
        ("must", "boilerplate set broadcast against the corpus re-scan", r"BroadcastHashJoin"),
        ("must", "partial agg on the chunk hash (map-side combine)", r"HashAggregate.*partial"),
        ("forbid", "corpus never sort-merge-joins on chunk text", "SortMergeJoin"),
    ],
    "q_text_keywords": [
        ("must", "per-doc top-k via WindowGroupLimit", r"WindowGroupLimit"),
        ("must", "tf/df aggregate partially map-side", r"HashAggregate.*partial"),
        ("forbid", "no Python in the row path", *_PYTHON_EVAL_NODES),
    ],
    "q_winsorize": [
        ("must", "bounds frame broadcast back onto the stream", r"BroadcastHashJoin"),
        ("forbid", "stream never shuffles to join its bounds", "SortMergeJoin"),
    ],
    "q_merge_scd2": [
        ("must", "update batch broadcast onto one dimension pass", r"BroadcastHashJoin"),
        ("must", "1-to-N row explode via Generate (inline)", r"Generate"),
        ("forbid", "no dimension self-join shuffle", "SortMergeJoin"),
    ],
    "q_retention": [
        ("must", "cohort/activity frames aggregate partially map-side", r"HashAggregate.*partial"),
        ("forbid", "no nested loop anywhere", *_NESTED_LOOP_NODES),
    ],
    "q_copurchase": [
        ("must", "top-k via TakeOrderedAndProject", r"TakeOrderedAndProject"),
        ("must", "pair counts aggregate partially map-side", r"HashAggregate.*partial"),
        ("forbid", "no nested loop (basket-capped self equi-join)", *_NESTED_LOOP_NODES),
    ],
    "q_graph_pagerank": [
        # The 1-row base-mass frame crossJoins each round — a sanctioned
        # BroadcastNestedLoopJoin with an O(1) side (the q_join_theta
        # rule); an unbounded CartesianProduct is still forbidden.
        ("forbid", "bounded join+agg rounds, no cartesian blowup", "CartesianProduct"),
        ("forbid", "no Python in the iteration path", *_PYTHON_EVAL_NODES),
    ],
    "q_layout_zorder": [
        ("must", "cell aggregation partial map-side", r"HashAggregate.*partial"),
        ("forbid", "key is pure codegen bit math, no Python", *_PYTHON_EVAL_NODES),
    ],
    "q_feature_rank": [
        ("must", "one window per series", r"Window"),
        ("forbid", "no Python in the row path", *_PYTHON_EVAL_NODES),
    ],
    "q_dedup_simhash": [
        # The whole SimHash family is built-in expressions now — any
        # Python eval node in this plan is a regression to the slow path.
        # (Higher-order lambdas run in an interpreted ProjectExec, not
        # WholeStageCodegen — still JVM-side, no Arrow crossing.)
        ("forbid", "no Python in the row path", *_PYTHON_EVAL_NODES),
        # The vote fold must be let-bound, not inlined into the 64-bit
        # majority lambda: the collapsed (bad) plan reads the fold through
        # element_at(aggregate(...), j+1) inside the lambda body.
        ("forbid_re", "vote fold let-bound, not inlined per bit", r"element_at\(aggregate"),
    ],
    "q_join_bloom": [
        # The dim's selective brand filter must plant a runtime bloom
        # filter on the FACT scan (InjectRuntimeFilter) — the
        # non-partitioned sibling of q_join_dpp's pruning subquery.
        ("must", "bloom runtime filter on the fact side", r"might_contain"),
        ("must", "dim brand filter pushed to its scan", r"PushedFilters: \[.*EqualTo\(p_brand,Brand#1\)"),
        ("must", "aggregation partial map-side", r"HashAggregate.*partial"),
        ("forbid", "no nested loop", *_NESTED_LOOP_NODES),
    ],
    "q_subquery_correlated": [
        # Q17 shape: the correlated scalar subqueries must DECORRELATE
        # into per-partkey aggregates joined back on l_partkey — a
        # surviving per-row Subquery node (or a nested loop) would mean
        # Catalyst failed and the 100 TB plan executes per-row.
        ("must", "decorrelated count-aggregate joined LeftOuter", r"BroadcastHashJoin LeftOuter|SortMergeJoin LeftOuter"),
        ("must", "per-partkey aggregate partial map-side", r"HashAggregate.*partial"),
        ("forbid", "no per-row subquery execution", "Subquery"),
        ("forbid", "no nested loop", *_NESTED_LOOP_NODES),
    ],
    "q_join_shuffle_hash": [
        # The hint must stick: ShuffledHashJoin, not SMJ (no sort
        # passes) and not a broadcast demotion of the hinted side.
        ("must", "hinted ShuffledHashJoin", r"ShuffledHashJoin"),
        ("forbid_re", "no sort-merge fallback", r"SortMergeJoin"),
        ("must", "aggregation partial map-side", r"HashAggregate.*partial"),
    ],
    "q_profile_approx": [
        # Exact + approx distinct in ONE agg would trigger the Expand
        # multi-distinct fallback (input × #aggs row multiplication) —
        # the same trap q_profile documents; per-column frames avoid it.
        ("forbid", "no multi-distinct Expand", "Expand"),
        ("must", "per-column pruned scans", r"ReadSchema: struct<l_partkey:bigint>"),
    ],
    "q_agg_trend": [
        ("must", "day-grid aggregation partial map-side", r"HashAggregate.*partial"),
        ("forbid", "fit is pure codegen, no Python", *_PYTHON_EVAL_NODES),
    ],
    "q_ts_interpolate": [
        # Forward lookups must be the DESC running-frame rewrite — a
        # [current, unbounded following] frame is O(span^2) per user
        # (measured 15s vs 1.9s; SCALING.md pitfall).
        ("forbid", "no shrinking window frames", "unboundedfollowing"),
        ("forbid", "no nested loop", *_NESTED_LOOP_NODES),
    ],
    "q_recursive_cte": [
        # WITH RECURSIVE must plan as Spark's UnionLoop (iterative
        # union execution), and the per-day rollup must still partial-
        # aggregate map-side before its exchange.
        ("must", "recursion via UnionLoop", r"UnionLoop"),
        ("must", "per-day rollup partial map-side", r"HashAggregate.*partial"),
        ("forbid", "no nested loop", *_NESTED_LOOP_NODES),
    ],
    "q_fn_variant": [
        # parse_json/variant_get are JVM expressions — Python in this
        # plan means the variant path fell off the codegen fast path.
        ("forbid", "variant access stays JVM-side", *_PYTHON_EVAL_NODES),
    ],
    "q_fn_xml": [
        ("forbid", "from_xml stays JVM-side", *_PYTHON_EVAL_NODES),
    ],
    "q_agg_kll": [
        # KLL sketch partials must combine map-side (ObjectHashAggregate
        # partial_kll_sketch_agg) — the mergeable-partials contract.
        ("must", "map-side partial KLL sketches", r"partial_kll_sketch_agg_double"),
        ("must", "typed-object aggregate path", r"ObjectHashAggregate"),
    ],
    "q_agg_bitmap": [
        # Bitmap partials must build map-side before the exchange; the
        # rollup is OR within bucket — no Expand (multi-distinct
        # fallback) anywhere.
        ("must", "map-side partial bitmaps", r"partial_bitmap_construct_agg"),
        ("forbid", "no distinct Expand fallback", "Expand"),
    ],
    "q_dedup_semantic": [
        # Bucketed (cell, cellb) equi self-join only — an unkeyed pair
        # explosion would appear as a nested loop; the cosine fold is
        # JVM lambdas, never Python.
        ("forbid", "no nested loop (keyed self-join)", *_NESTED_LOOP_NODES),
        ("forbid", "no Python in the pair path", *_PYTHON_EVAL_NODES),
    ],
    "q_join_lateral": [
        # The LATERAL ... LIMIT 3 must decorrelate to WindowGroupLimit
        # with a PARTIAL map-side pass (per-task 3-heaps BEFORE the
        # shuffle) — the automatic derivation of q_topk_group's shape.
        ("must", "map-side partial group-limit heaps", r"WindowGroupLimit.*Partial|WindowGroupLimit\b(?s:.*)Arguments:.*row_number\(\), 3, Partial"),
        ("forbid", "no per-row subquery execution", "Subquery"),
        ("forbid", "no nested loop", *_NESTED_LOOP_NODES),
    ],
    "q_join_null_anti": [
        # NOT IN must plan as the null-aware broadcast anti join — the
        # `true` flag on HashedRelationBroadcastMode is the null-aware
        # marker (a plain anti join would drop the tri-valued semantics).
        ("must", "null-aware anti join", r"LeftAnti"),
        ("must", "null-aware broadcast relation", r"HashedRelationBroadcastMode\(List\(input\[0, bigint, true\]\),true\)"),
        ("must", "subquery-side filter pushed", r"PushedFilters: \[.*GreaterThan\(l_quantity,45"),
        ("forbid", "no nested loop", *_NESTED_LOOP_NODES),
    ],
    "q_exists_correlated": [
        # Q21 shape: EXISTS → LeftSemi, NOT EXISTS → LeftAnti, both on
        # l_orderkey; no per-row probe, no nested loop.
        ("must", "EXISTS rewritten to left-semi join", r"LeftSemi"),
        ("must", "NOT EXISTS rewritten to left-anti join", r"LeftAnti"),
        ("forbid", "no per-row subquery execution", "Subquery"),
        ("forbid", "no nested loop", *_NESTED_LOOP_NODES),
    ],
    # ---- round-6 additions ------------------------------------------------
    "q_udf_cogroup": [
        # The whole point of cogroup: ONE co-partitioned pandas pass,
        # never a join-then-regroup round trip.
        ("must", "two-sided grouped map node", r"FlatMapCoGroupsInPandas"),
        ("forbid", "no join-then-regroup", "SortMergeJoin", "BroadcastHashJoin"),
    ],
    "q_agg_heavy": [
        # Sketch partials must combine map-side (the mergeable contract)
        ("must", "partial sketch accumulation before shuffle", r"HashAggregate.*partial"),
    ],
    "q_sql_udf": [
        # SQL UDF bodies inline at analysis — the plan must contain NO
        # Python evaluation node of any kind.
        ("forbid", "no Python boundary (body inlined)", "BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas"),
        ("must", "TVF's quantity predicate pushed to the scan", r"PushedFilters: \[.*GreaterThanOrEqual\(l_quantity"),
    ],
    "q_events_attribution": [
        # The operator's claim IS the absent join: attribution via one
        # RANGE-frame window, purchases never join views.
        ("forbid", "no purchase-view join of any kind", "Join"),
        ("must", "trailing RANGE frame window", r"specifiedwindowframe\(RangeFrame, -86400"),
    ],
    "q_join_asof_nearest": [
        ("forbid", "no nested-loop blowup", *_NESTED_LOOP_NODES),
        ("must", "merge-scan windows over the union", r"Window"),
    ],
    "q_win_rolling_median": [
        ("forbid", "single-pass window, no join", "Join"),
        ("must", "bounded trailing ROWS frame", r"specifiedwindowframe\(RowFrame, -9, currentrow"),
    ],
    "q_ts_ewma": [
        ("forbid", "row-local fold, no join", "Join"),
        ("must", "bounded trailing ROWS frame", r"specifiedwindowframe\(RowFrame, -7, currentrow"),
    ],
    "q_events_paths": [
        ("must", "top-20 plans as TakeOrderedAndProject", r"TakeOrderedAndProject"),
        ("must", "map-side partial path counts", r"HashAggregate.*partial"),
    ],
    "q_profile_corr": [
        ("must", "all power sums in one partial aggregate", r"HashAggregate.*partial"),
        ("forbid", "one pass, no join", "Join"),
    ],
    "q_window_sliding_distinct": [
        ("must", "2-window Expand before the distinct", r"Expand"),
    ],
    "q_text_bigram_lm": [
        ("must", "map-side partial bigram counts", r"HashAggregate.*partial"),
    ],
    # round-8 order-statistic device family: every window must be the
    # dist_cumsum bucket window (_pid in the partition spec) — never an
    # unpartitioned global sort — and the distinct-value reduce must
    # combine map-side; no sort-based aggregation buffer anywhere.
    "q_agg_percentile_global": [
        # r12: exact_pct_values device — the only window is the
        # tag-partitioned bracket-candidate prefix sum (bounded frames),
        # never an unpartitioned global sort; sketch+refine passes all
        # combine map-side.
        ("must", "bracket reduce combines map-side", r"HashAggregate.*partial"),
        ("must", "tag-keyed bracket-candidate window", r"windowspecdefinition\(tag"),
        ("forbid", "no sort-based aggregation buffer", "SortAggregate"),
    ],
    "q_agg_median_exact": [
        ("must", "(group, bucket)-keyed cumsum window", r"windowspecdefinition\(grp[^,]*, _pid"),
        ("forbid", "no sort-based aggregation buffer", "SortAggregate"),
    ],
    "q_feature_scale": [
        ("must", "bucket-keyed rank window only", r"windowspecdefinition\(_pid"),
        ("must", "moments broadcast back", r"BroadcastNestedLoopJoin"),
    ],
    "q_agg_permutation_test": [
        ("must", "fan-out collapses in a partial aggregate", r"HashAggregate.*partial"),
        ("forbid", "no window anywhere", "windowspecdefinition"),
    ],
    "q_agg_countmin": [
        ("must", "exact top-k probe side is a k-heap", r"TakeOrderedAndProject"),
        ("must", "grid probe is a broadcast join", r"BroadcastHashJoin"),
    ],
    "q_sample_balanced": [
        ("must", "(label, bucket)-keyed rank window", r"windowspecdefinition\(label[^,]*, _pid"),
    ],
    "q_pack_shards": [
        ("must", "byte offsets ride the bucket window", r"windowspecdefinition\(_pid"),
        ("must", "manifest aggregate combines map-side", r"HashAggregate.*partial"),
    ],
    "q_ml_knn": [
        ("must", "per-query top-k rides WindowGroupLimit", r"WindowGroupLimit"),
        ("must", "query side broadcast", r"BroadcastNestedLoopJoin"),
    ],
    # ---- round-9 additions ------------------------------------------------
    "q_graph_clustering": [
        ("must", "top-20 rides TakeOrderedAndProject", r"TakeOrderedAndProject"),
        ("must", "edge/degree reduces combine map-side", r"HashAggregate.*partial"),
        ("forbid", "support-filtered equi joins only, no blowup", "CartesianProduct"),
    ],
    "q_dq_expectations": [
        ("must", "rule counts in one partial-agg pass", r"HashAggregate.*partial"),
        ("forbid", "no Python in the rule path", *_PYTHON_EVAL_NODES),
    ],
    "q_eval_kappa": [
        ("must", "four cells in one partial-agg pass", r"HashAggregate.*partial"),
        ("forbid", "no Python in the rater path", *_PYTHON_EVAL_NODES),
        ("forbid", "single pass, no join", "Join"),
    ],
    "q_ts_backtest": [
        ("forbid", "lag-7 is an equi join, no window anywhere", "windowspecdefinition"),
        ("forbid", "no unbounded pair blowup", "CartesianProduct"),
    ],
    "q_graph_reciprocity": [
        ("must", "transition reduce combines map-side", r"HashAggregate.*partial"),
        ("forbid", "bounded self-join, no blowup", "CartesianProduct"),
    ],
    "q_orders_aging": [
        ("must", "bucketing aggregates partially map-side", r"HashAggregate.*partial"),
        ("must", "3-column pruned orders scan", r"ReadSchema: struct<o_orderstatus:string,o_totalprice:double,o_orderdate:timestamp"),
    ],
    "q_text_source_divergence": [
        ("must", "word counts combine map-side", r"HashAggregate.*partial"),
        ("forbid", "no Python in the fold path", *_PYTHON_EVAL_NODES),
    ],
    "q_text_char_entropy": [
        ("must", "char counts combine map-side", r"HashAggregate.*partial"),
        ("forbid", "no Python in the entropy path", *_PYTHON_EVAL_NODES),
    ],
    "q_agg_overdispersion": [
        ("must", "daily counts combine map-side", r"HashAggregate.*partial"),
        ("forbid", "spine joins are equi/broadcast, no blowup", "CartesianProduct"),
    ],
    "q_ts_ljungbox": [
        ("forbid", "per-lag pairs via equi joins, no window", "windowspecdefinition"),
        ("forbid", "no unbounded pair blowup", "CartesianProduct"),
    ],
    "q_text_lexical_diversity": [
        ("must", "token/type reduces combine map-side", r"HashAggregate.*partial"),
        ("forbid", "no Python in the fold path", *_PYTHON_EVAL_NODES),
    ],
    "q_text_pii_scan": [
        ("must", "hit counts combine map-side", r"HashAggregate.*partial"),
        ("forbid", "regex scan stays JVM-side", *_PYTHON_EVAL_NODES),
        ("forbid", "map-only scan + one agg, no join", "Join"),
    ],
    "q_profile_topk": [
        ("must", "per-column top-5 rides WindowGroupLimit", r"WindowGroupLimit"),
        ("must", "value counts combine map-side", r"HashAggregate.*partial"),
    ],
    "q_anomaly_seasonal": [
        ("must", "top-10 rides TakeOrderedAndProject", r"TakeOrderedAndProject"),
        ("must", "DOW strata broadcast back onto the spine", r"BroadcastHashJoin"),
        ("forbid", "spine never shuffles to join its strata", "SortMergeJoin"),
    ],
    "q_orders_repeat": [
        ("must", "gap selections ride the bucket-keyed cumsum window", r"windowspecdefinition\(_pid"),
        ("forbid", "no sort-based aggregation buffer", "SortAggregate"),
    ],
    "q_embed_outliers": [
        ("must", "top-10 rides TakeOrderedAndProject", r"TakeOrderedAndProject"),
        ("must", "centroid cells / distance fold combine map-side", r"HashAggregate.*partial"),
        ("forbid", "no Python in the distance path", *_PYTHON_EVAL_NODES),
    ],
    "q_join_trigram": [
        ("must", "best-match rides WindowGroupLimit", r"WindowGroupLimit"),
        ("forbid", "gram-keyed equi joins only, no blowup", *_NESTED_LOOP_NODES),
    ],
    "q_retention_halflife": [
        ("must", "cohort/activity reduces combine map-side", r"HashAggregate.*partial"),
        ("forbid", "no unbounded pair blowup", "CartesianProduct"),
    ],
    "q_ml_nearest_centroid": [
        ("must", "centroid cells broadcast onto the scoring join", r"BroadcastHashJoin"),
        ("must", "distance fold combines map-side", r"HashAggregate.*partial"),
        ("forbid", "cells never shuffle to join centroids", "SortMergeJoin"),
        ("forbid", "no Python in the distance path", *_PYTHON_EVAL_NODES),
    ],
    "q_ts_seasonal_drift": [
        ("must", "cell grid reduces map-side", r"HashAggregate.*partial"),
        ("forbid", "14-cell frame only, no window", "windowspecdefinition"),
    ],
    "q_ts_return_level": [
        ("must", "hourly/daily-max reduces combine map-side", r"HashAggregate.*partial"),
        ("forbid", "closed-form fit, no join no window", "Join", "windowspecdefinition"),
    ],
    "q_orders_leadtime": [
        ("must", "grouped selections ride the (prio, bucket) cumsum window", r"windowspecdefinition\(prio[^,]*, _pid"),
        ("forbid", "no sort-based aggregation buffer", "SortAggregate"),
    ],
    "q_ts_gaps": [
        # the bounded_part key is projected to a _w# column by Spark's
        # window rewrite — assert the spec is keyed, not empty
        ("must", "zero-run window keyed (no empty partition spec)", r"windowspecdefinition\(_w\d+#\d+"),
        # crossJoin of two 1-row frames is a sanctioned O(1)-side BNLJ
        ("forbid", "no unbounded cartesian blowup", "CartesianProduct"),
    ],
    "q_embed_twonn": [
        # anchor sample must broadcast into the corpus scan; top-2 per
        # anchor must run as per-task 2-heaps
        ("must", "anchor fan-out is broadcast nested loop", r"BroadcastNestedLoopJoin"),
        ("must", "per-anchor top-2 is WindowGroupLimit", r"WindowGroupLimit"),
        ("forbid", "no cartesian product", "CartesianProduct"),
    ],
    "q_embed_mmd": [
        # the only raw-data pass is the (label, dim) grid reduce; the
        # pair join runs broadcast on that bounded grid
        ("must", "grid reduce partially aggregated", r"HashAggregate.*partial"),
        ("must", "pair join is broadcast hash on dim", r"BroadcastHashJoin"),
        ("forbid", "no cartesian product", "CartesianProduct"),
    ],
    "q_agg_taildep": [
        ("must", "joint counts partially aggregated", r"HashAggregate.*partial"),
        # thresholds are 1-row broadcast frames — BNLJ there is the
        # sanctioned O(1)-side shape, so only cartesian is forbidden
        ("forbid", "no cartesian product", "CartesianProduct"),
    ],
    "q_feature_woe": [
        ("must", "bin reduce partially aggregated", r"HashAggregate.*partial"),
        ("forbid", "no window anywhere (pure grid arithmetic)", "windowspecdefinition"),
    ],
    "q_ts_perm_entropy": [
        ("must", "daily grid reduce partially aggregated", r"HashAggregate.*partial"),
        ("must", "lag windows keyed by the priority vocabulary", r"windowspecdefinition\(grp"),
    ],
    "q_ts_holt": [
        ("must", "daily grid reduce partially aggregated", r"HashAggregate.*partial"),
        ("forbid", "fold is in-group, no window no join tail", "windowspecdefinition"),
    ],
    "q_agg_ratio_estimator": [
        ("must", "power sums partially aggregated", r"HashAggregate.*partial"),
        ("forbid", "one-pass closed form: no join, no window", "Join", "windowspecdefinition"),
    ],
    "q_text_vocab_coverage": [
        ("must", "word count partially aggregated", r"HashAggregate.*partial"),
        # threshold selection joins a 3-row broadcast frame
        ("must", "threshold join is broadcast", r"BroadcastHashJoin|BroadcastNestedLoopJoin"),
        ("forbid", "no cartesian product", "CartesianProduct"),
    ],
    "q_sample_systematic": [
        # hit counting is row-local integer math against a broadcast
        # 1-row total; the only window is dist_cumsum's bucketed one
        ("must", "cumsum window keyed by equi-depth bucket", r"windowspecdefinition\(_pid"),
        ("forbid", "no cartesian product", "CartesianProduct"),
    ],
    "q_ts_yule_walker": [
        ("must", "daily grid reduce partially aggregated", r"HashAggregate.*partial"),
        ("must", "lag windows keyed by event type", r"windowspecdefinition\(event_type"),
    ],
    "q_ts_spectral_entropy": [
        ("must", "band sums partially aggregated", r"HashAggregate.*partial"),
        ("must", "dominant-band rank keyed by event type", r"windowspecdefinition\(event_type"),
        ("forbid", "no cartesian product", "CartesianProduct"),
    ],
    "q_agg_xtab_residuals": [
        ("must", "cell counts partially aggregated", r"HashAggregate.*partial"),
        ("forbid", "grid arithmetic only — no window", "windowspecdefinition"),
    ],
    "q_agg_winsorized_corr": [
        ("must", "power sums partially aggregated", r"HashAggregate.*partial"),
        ("forbid", "no cartesian product", "CartesianProduct"),
    ],
    "q_ml_learning_curve": [
        # centroid grid broadcasts into the test scan; argmin is a
        # map-combinable min(struct), never a window
        ("must", "centroid grid joins broadcast", r"BroadcastHashJoin|BroadcastNestedLoopJoin"),
        ("forbid", "argmin is min(struct), not a window", "windowspecdefinition"),
        ("forbid", "no cartesian product", "CartesianProduct"),
    ],
    "q_ml_gbm_stumps": [
        ("must", "value histogram partially aggregated", r"HashAggregate.*partial"),
        ("forbid", "winners are tuple-mins, not windows", "windowspecdefinition"),
        ("forbid", "no cartesian product", "CartesianProduct"),
    ],
    "q_embed_fisher_dims": [
        ("must", "(label,dim) power sums partially aggregated", r"HashAggregate.*partial"),
        ("must", "top-k plans as TakeOrderedAndProject", r"TakeOrderedAndProject"),
        ("forbid", "no window in the ranking", "windowspecdefinition"),
    ],
    "q_events_absorbing": [
        ("must", "transition grid partially aggregated", r"HashAggregate.*partial"),
        ("forbid", "no cartesian product", "CartesianProduct"),
    ],
    "q_ml_odds_ratio": [
        ("must", "segment dim join broadcasts", r"BroadcastHashJoin"),
        ("must", "cell counters partially aggregated", r"HashAggregate.*partial"),
        ("forbid", "grid arithmetic only — no window", "windowspecdefinition"),
    ],
    "q_orders_croston": [
        ("must", "daily demand reduce partially aggregated", r"HashAggregate.*partial"),
        ("must", "gap lag keyed by the priority vocabulary", r"windowspecdefinition\(grp"),
    ],
    "q_graph_rich_club": [
        ("must", "degree/edge reduces partially aggregated", r"HashAggregate.*partial"),
        ("forbid", "edges counted, never node pairs", "CartesianProduct"),
        ("forbid", "no window anywhere", "windowspecdefinition"),
    ],
    "q_agg_cpk": [
        ("must", "power sums partially aggregated", r"HashAggregate.*partial"),
        ("forbid", "one-pass closed form: no join, no window", "Join", "windowspecdefinition"),
    ],
    # round-12 TPC-H completion: the derived-dimension suite's scale
    # contracts — dim-only queries must never touch a fact table, fact
    # queries must push their date filters and broadcast every dim.
    "q_tpch_q1": [
        ("must", "shipdate cutoff pushed to the fact scan", r"PushedFilters: \[.*LessThanOrEqual\(l_shipdate"),
        ("forbid", "column pruning (no l_orderkey read)", "l_orderkey"),
        ("must", "eight aggregates partially aggregated", r"HashAggregate.*partial"),
    ],
    "q_tpch_q2": [
        ("forbid", "dim-only: derived partsupp never touches a fact", "lineitem", "orders.parquet", "events"),
        ("must", "region-pruned supplier leg broadcast", r"BroadcastHashJoin"),
    ],
    "q_tpch_q5": [
        ("must", "order-year band pushed to the orders scan", r"PushedFilters: \[.*GreaterThanOrEqual\(o_orderdate"),
        ("must", "customer/supplier/nation/region broadcast", r"BroadcastHashJoin"),
        ("forbid", "no pair blowup", "CartesianProduct", "BroadcastNestedLoopJoin"),
    ],
    "q_tpch_q9": [
        ("must", "part/partsupp/supplier/nation broadcast onto the fact", r"BroadcastHashJoin"),
        # the derived partsupp's 1-row supplier-COUNT crossJoin plans as
        # a 1-row BroadcastNestedLoopJoin — the sanctioned decorrelated-
        # scalar shape — so only a true CartesianProduct is forbidden
        ("forbid", "two-key partsupp lookup is a hash join, not a loop", "CartesianProduct"),
    ],
    "q_tpch_q11": [
        ("forbid", "dim-only: stock value never scans a fact", "lineitem", "orders.parquet", "customer", "events"),
        ("must", "nation-pruned supplier leg broadcast", r"BroadcastHashJoin"),
    ],
    "q_tpch_q12": [
        ("forbid", "derived date triple is codegen, not Python", "ArrowEvalPython", "BatchEvalPython"),
        ("forbid", "no pair blowup", "CartesianProduct", "BroadcastNestedLoopJoin"),
    ],
    "q_tpch_q16": [
        ("forbid", "dim-only: supplier census never scans a fact", "lineitem", "orders.parquet", "events"),
        ("must", "pruned part + blocklist broadcast", r"BroadcastHashJoin"),
        ("must", "two-phase distinct expand on the bounded grid", r"HashAggregate.*partial"),
    ],
    "q_tpch_q17": [
        ("must", "brand filter broadcasts and prunes the fact first", r"BroadcastHashJoin"),
        ("must", "decorrelated per-part mean partially aggregated", r"HashAggregate.*partial"),
    ],
    "q_tpch_q20": [
        ("must", "1997 band pushed to the fact scan", r"PushedFilters: \[.*GreaterThanOrEqual\(l_shipdate"),
        # same 1-row scalar BNLJ exemption as q_tpch_q9
        ("forbid", "no pair blowup", "CartesianProduct"),
    ],
    "q_tpch_q21": [
        ("forbid", "late predicate is integer codegen, not Python", "ArrowEvalPython", "BatchEvalPython"),
        ("forbid", "EXISTS/NOT-EXISTS decorrelated, never a loop", "CartesianProduct", "BroadcastNestedLoopJoin"),
        ("must", "both distinct-supplier counts in one order-keyed reduce", r"HashAggregate.*partial"),
    ],
    "q_graph_closeness": [
        ("forbid", "frontier expansion is keyed joins, never a loop", "CartesianProduct", "BroadcastNestedLoopJoin"),
    ],
    "q_agg_kruskal": [
        ("must", "rank spine partially aggregated", r"HashAggregate.*partial"),
        # (unpartitioned-window absence is enforced registry-wide by the
        # standing WINDOWS_AUDIT pytest; no per-query regex needed)
    ],
}


# ---------------------------------------------------------------------------
# Registry-wide unpartitioned-window scan (r8 verdict #1).
#
# The house rule: every window carries a partition key — real data keys
# for data-sized frames, the fold-proof `bounded_part` constant for
# bounded (|days|-, dimension-sized) spines. An EMPTY (or fully
# constant-folded) partitionSpec means the window executes on ONE
# partition with Spark's `WindowExec: No Partition Defined` warning —
# invisible to the per-query regex CHECKS above, which is exactly how
# q_ts_runs_test's folded `c * 0` keys slipped past round 7's "class
# closed" claim. This scan walks the OPTIMIZED logical plan of every
# registered query (post-folding, pre-execution — what WindowExec will
# actually see) and reports any Window/WindowGroupLimit node whose
# partitionSpec is empty or all-foldable.

_WINDOW_NODE_CLASSES = ("Window", "WindowGroupLimit")

# Queries allowed to keep an unpartitioned window, each with the reason
# it is scale-safe. Empty today: every bounded-spine window rides the
# bounded_part key instead — additions need a bounded-frame argument in
# the op docstring.
WINDOW_SCAN_ALLOWLIST: dict[str, str] = {}


def unpartitioned_windows(df) -> list[str]:
    """Window nodes in ``df``'s optimized logical plan that would run
    on a single partition: partitionSpec empty or entirely foldable
    (a folded constant is removed from / inert in the spec — same
    execution as no spec). Returns one description string per
    offending node; [] is a pass. Traverses children AND subquery
    plans."""
    root = df._jdf.queryExecution().optimizedPlan()
    hits: list[str] = []
    stack = [root]
    while stack:
        node = stack.pop()
        cls = node.getClass().getSimpleName()
        if cls in _WINDOW_NODE_CLASSES:
            ps = node.partitionSpec()
            empty = ps.isEmpty()
            folded = False
            if not empty:
                folded = True
                it = ps.iterator()
                while it.hasNext():
                    if not it.next().foldable():
                        folded = False
                        break
            if empty or folded:
                hits.append(
                    f"{cls}[{'empty' if empty else 'foldable'} spec]: "
                    + node.simpleString(100)[:200]
                )
        cit = node.children().iterator()
        while cit.hasNext():
            stack.append(cit.next())
        sit = node.subqueries().iterator()
        while sit.hasNext():
            stack.append(sit.next())
    return hits


def scan_registry_windows(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, list[str]]:
    """Run :func:`unpartitioned_windows` over every registered query
    (or ``names``); returns {query: [offending windows]} for queries
    with at least one hit — construction-only (plans are optimized,
    never executed; iterative ops still run their bounded build jobs).
    """
    out: dict[str, list[str]] = {}
    for name in names or sorted(registry.all_queries()):
        df = registry.get(name).fn(spark, sf_dir)
        hits = unpartitioned_windows(df)
        if hits:
            out[name] = hits
    return out


def _eval_check(plan: str, check: tuple) -> bool:
    kind, _desc = check[0], check[1]
    if kind == "must":
        return re.search(check[2], plan, re.DOTALL | re.MULTILINE) is not None
    if kind == "forbid":
        return all(tok not in plan for tok in check[2:])
    if kind == "forbid_re":
        return re.search(check[2], plan, re.DOTALL) is None
    raise ValueError(f"unknown check kind {kind!r}")


def branch_clear_of_exchange(plan: str, leaf_token: str, stop_token: str) -> bool:
    """True when, in a formatted plan's tree section, the path from the
    unique tree line containing ``leaf_token`` up to its nearest ancestor
    containing ``stop_token`` crosses no Exchange node.

    This asserts the INVARIANT itself ("the store branch never
    re-shuffles") instead of a global Exchange count, so benign plan
    changes elsewhere (AQE confs, Spark versions, an extra batch-side
    repartition) cannot flip the audit while the guarded property still
    holds (ADVICE r4). Ancestorship is recovered from the tree
    indentation: each level is one 3-char ``+- ``/``:- ``/``:  `` frame,
    with an optional ``* `` codegen star folded into the prefix.
    """
    tree = plan.split("\n\n")[0].splitlines()

    def depth(line: str) -> int:
        i = 0
        while i < len(line) and line[i] in ":+-* ":
            i += 1
        return i

    leaf_idx = [i for i, ln in enumerate(tree) if leaf_token in ln]
    if len(leaf_idx) != 1:
        return False
    i = leaf_idx[0]
    d = depth(tree[i])
    for j in range(i - 1, -1, -1):
        dj = depth(tree[j])
        if dj < d:  # nearest ancestor at a shallower depth
            d = dj
            if stop_token in tree[j]:
                return True
            if "Exchange" in tree[j]:
                return False
    return False


def run_audit(spark: SparkSession, sf_dir: str) -> list[tuple[str, str, bool]]:
    """Evaluate every plan check; returns (query, description, ok)."""
    results: list[tuple[str, str, bool]] = []
    for name, checks in CHECKS.items():
        plan = plan_of(spark, name, sf_dir)
        for check in checks:
            results.append((name, check[1], _eval_check(plan, check)))

    # Bucketed join: broadcast disabled so the co-located SMJ (not a
    # broadcast demotion) is what gets audited — the conf is what a
    # fact⋈fact join at 100 TB faces anyway.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    from asyncdatapipeline_spark.operators.layout import ensure_bucketed_tables

    ot, ct = ensure_bucketed_tables(spark, sf_dir)
    o, c = spark.table(ot), spark.table(ct)
    jplan = spark.sparkContext._jvm.PythonSQLUtils.explainString(
        o.join(c, o.o_custkey == c.c_custkey)._jdf.queryExecution(), "formatted"
    )
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    results.append(
        ("q_join_bucketed", "SortMergeJoin over bucketed scans", "SortMergeJoin" in jplan)
    )
    results.append(("q_join_bucketed", "no Exchange anywhere", "Exchange" not in jplan))

    # Incremental dedup: with broadcast disabled (the large-drop case),
    # the persisted signature store must join via its bucketed layout —
    # an SMJ whose store branch (scan → read-time cap window → join)
    # carries NO Exchange; only the batch side and the pair aggregation
    # shuffle. Asserted structurally on the plan tree, not via a global
    # Exchange count (ADVICE r4: counts flip on benign plan changes).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    iplan = plan_of(spark, "q_dedup_incremental", sf_dir)
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    results.append(
        (
            "q_dedup_incremental",
            "store joins via bucketed SMJ (no broadcast)",
            "SortMergeJoin" in iplan and "sigstore_b_" in iplan,
        )
    )
    results.append(
        (
            "q_dedup_incremental",
            "no Exchange between the bucketed store scan and the SMJ",
            branch_clear_of_exchange(iplan, "sigstore_b_", "SortMergeJoin"),
        )
    )

    # Whole-stage codegen: AQE defers physical stage creation, so codegen
    # subtrees are only visible with AQE off — flip it for this one check
    # (execution behavior is identical; AQE re-plans between stages but
    # each stage still runs generated code).
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    cg = plan_of(spark, "q_agg_hash", sf_dir, mode="codegen")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", cg)
    results.append(
        (
            "q_agg_hash",
            "whole-stage codegen subtrees",
            m is not None and int(m.group(1)) >= 1,
        )
    )
    return results
