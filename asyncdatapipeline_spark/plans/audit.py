"""Physical-plan audit — the 100 TB design checks (SURVEY.md bench loop).

For each audited query, asserts structural plan properties that decide
scale behavior: filters pushed into the parquet scan, column pruning,
broadcast joins where a side is dim-sized, TakeOrderedAndProject for
global top-k, WindowGroupLimit for per-group top-k, whole-stage codegen
presence. The checks are data: ``CHECKS`` maps query name → (description,
regex over the formatted plan); ``run_audit`` evaluates everything and
returns (query, description, ok) triples for the CLI / tests to render.

The reference has no plan representation at all (SURVEY.md §4 — its
execution is two goroutines and a channel); this module is the engine's
guard that the *Spark* plans we generate keep the shapes that survive a
100× scale-up.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession

from asyncdatapipeline_spark import registry


def plan_of(
    spark: SparkSession, name: str, sf_dir: str, mode: str = "formatted"
) -> str:
    """Formatted physical plan of a registered query (no execution)."""
    df = registry.get(name).fn(spark, sf_dir)
    return spark.sparkContext._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


# name → list of (description, regex that must match the formatted plan)
CHECKS: dict[str, list[tuple[str, str]]] = {
    "q_agg_hash": [
        ("shipdate filter pushed to scan", r"PushedFilters: \[.*LessThanOrEqual\(l_shipdate"),
        ("column pruning (no l_orderkey read)", r"ReadSchema: (?!.*l_orderkey)"),
        ("partial aggregation before shuffle", r"HashAggregate.*partial"),
        # codegen ids only appear in executed/simple plans → run_audit
    ],
    "q_scan_parquet": [
        ("quantity filter pushed", r"PushedFilters: \[.*GreaterThanOrEqual\(l_quantity"),
        ("5-column pruned schema", r"ReadSchema: struct<l_orderkey:bigint,l_partkey:bigint,l_suppkey:bigint,l_quantity:double,l_extendedprice:double>"),
    ],
    "q_scan_orc": [
        ("balance filter pushed into the ORC scan", r"PushedFilters: \[.*GreaterThan\(s_acctbal"),
    ],
    "q_join_broadcast": [
        ("nation broadcast", r"BroadcastHashJoin"),
        ("no sort-merge join", r"^(?:(?!SortMergeJoin).)*$"),
    ],
    "q_join_inner": [
        ("status filter pushed below join", r"PushedFilters: \[.*EqualTo\(o_orderstatus,F\)"),
    ],
    "q_join_theta": [
        ("broadcast nested loop (band side broadcast)", r"BroadcastNestedLoopJoin"),
    ],
    "q_topk": [
        ("TakeOrderedAndProject (no full sort)", r"TakeOrderedAndProject"),
    ],
    "q_topk_group": [
        ("WindowGroupLimit pushdown", r"WindowGroupLimit"),
    ],
    "q_join_asof": [
        ("single window over union (no range join)", r"Window"),
        ("no nested-loop blowup", r"^(?:(?!BroadcastNestedLoopJoin|CartesianProduct).)*$"),
    ],
    "q_dedup_exact": [
        ("partial agg on hash key", r"HashAggregate.*partial"),
        ("only text+doc_id read", r"ReadSchema: struct<doc_id:bigint,text:string>"),
    ],
    "q_sim_topk": [
        ("TakeOrderedAndProject over scan", r"TakeOrderedAndProject"),
        ("no join anywhere (broadcast literal)", r"^(?:(?!Join).)*$"),
    ],
    "q_filter": [
        ("all predicates pushed", r"PushedFilters: \[.*GreaterThan\(l_discount,0\.03\)"),
    ],
    "q_join_range": [
        ("binned equi join, no nested loop", r"^(?:(?!BroadcastNestedLoopJoin|CartesianProduct).)*$"),
    ],
    "q_scan_partition_pruned": [
        ("date filter became a partition filter", r"PartitionFilters: \[[^\]]*event_date"),
    ],
    "q_join_dpp": [
        ("runtime pruning subquery planted on the fact scan", r"PartitionFilters: \[[^\]]*dynamicpruningexpression\(event_date"),
    ],
    "q_dedup_minhash": [
        ("signature fold is a single projection (no per-lane explode)", r"aggregate\(transform"),
        ("salted two-level bucket agg (partial mins map-side)", r"HashAggregate.*partial"),
    ],
    "q_unpivot": [
        ("single map-only Expand (no union rescan)", r"Expand \[codegen id"),
        ("orderkey filter pushed below the Expand", r"PushedFilters: \[.*LessThan\(l_orderkey,100\)"),
    ],
    "q_pack_sequences": [
        ("only the 3 needed document columns read", r"ReadSchema: struct<doc_id:bigint,text:string,source:string>"),
    ],
    "q_sim_knn_join": [
        ("query batch broadcast (corpus streams once)", r"BroadcastExchange"),
        ("per-query top-k via map-side WindowGroupLimit", r"WindowGroupLimit"),
    ],
    "q_curation_pipeline": [
        ("dedup survivors via semi join", r"LeftSemi"),
        ("no nested-loop anywhere in the fused plan", r"^(?:(?!BroadcastNestedLoopJoin|CartesianProduct).)*$"),
    ],
    "q_text_decontam": [
        # The eval side must be the broadcast side — the corpus is the
        # 100 TB side and must never shuffle for this join.
        ("eval shingle set broadcast against corpus scan", r"BroadcastHashJoin"),
        ("no sort-merge join (corpus never shuffles to join)", r"^(?:(?!SortMergeJoin).)*$"),
    ],
    "q_text_repetition": [
        ("row-local: no exchange at all", r"^(?:(?!Exchange).)*$"),
        ("no Python in the row path", r"^(?:(?!ArrowEvalPython|BatchEvalPython).)*$"),
    ],
    "q_split_hash": [
        ("map-only: no exchange at all", r"^(?:(?!Exchange).)*$"),
        ("only doc_id read", r"ReadSchema: struct<doc_id:bigint>"),
    ],
    "q_dedup_embed_lsh": [
        ("bucket-join, never a cartesian all-pairs", r"^(?:(?!CartesianProduct|BroadcastNestedLoopJoin).)*$"),
    ],
    "q_curation_full": [
        ("decontam eval set broadcast", r"BroadcastHashJoin"),
        ("no nested-loop anywhere in the 6-stage plan", r"^(?:(?!BroadcastNestedLoopJoin|CartesianProduct).)*$"),
        ("no Python in the row path", r"^(?:(?!ArrowEvalPython|BatchEvalPython).)*$"),
    ],
    "q_ts_resample": [
        # Raw events must be aggregated BEFORE the spine explode — the
        # dense grid is generated from the (user × bucket) frame, never
        # from raw rows, so grid size is output-proportional at 100 TB.
        ("bucket aggregation pushed below the spine join", r"HashAggregate.*partial"),
        ("spine join is an equi join, not a nested loop", r"^(?:(?!BroadcastNestedLoopJoin|CartesianProduct).)*$"),
    ],
    "q_profile": [
        ("each branch scan pruned to ONE column", r"ReadSchema: struct<l_quantity:double>$"),
        # The multi-distinct Expand multiplies input rows ×(aggs+1) —
        # the per-column union shape must keep it out of the plan.
        ("no Expand (per-column distincts, not multi-distinct)", r"^(?:(?!Expand).)*$"),
    ],
    "q_join_fuzzy": [
        ("blocked equi join hashes the blocking key", r"BroadcastHashJoin"),
        ("never a cross join of the two string sets", r"^(?:(?!CartesianProduct|BroadcastNestedLoopJoin).)*$"),
    ],
    "q_embed_quantize": [
        ("map-only quantization: no join, no agg shuffle", r"^(?:(?!Join|HashAggregate).)*$"),
        ("no Python in the row path", r"^(?:(?!ArrowEvalPython|BatchEvalPython).)*$"),
        # The max-abs fold must be let-bound, not re-inlined per element
        # by CollapseProject (O(d²) per row otherwise).
        ("scale let-bound, not inlined into the code lambda", r"^(?:(?!round\(\(lambda x.*array_max).)*$"),
    ],
    "q_anomaly": [
        ("stats frame broadcast back onto the stream", r"BroadcastHashJoin"),
        ("stream never shuffles to join", r"^(?:(?!SortMergeJoin).)*$"),
    ],
    "q_agg_topk": [
        ("top-k after the agg via TakeOrderedAndProject", r"TakeOrderedAndProject"),
        ("shipdate filter pushed into the lineitem scan", r"PushedFilters: \[.*GreaterThan\(l_shipdate"),
    ],
    "q_join_multiway": [
        ("orderdate filter pushed into the orders scan", r"PushedFilters: \[.*LessThan\(o_orderdate"),
        ("tiny dims broadcast (region filter prunes pre-join)", r"BroadcastHashJoin"),
        ("no nested loop in the 6-table plan", r"^(?:(?!BroadcastNestedLoopJoin|CartesianProduct).)*$"),
    ],
    "q_sample_weighted": [
        # Selection must be per-task k-heaps — a global sort of the
        # corpus to take 100 rows is the scale bug this op exists to avoid.
        ("k smallest keys via TakeOrderedAndProject", r"TakeOrderedAndProject"),
        ("no corpus shuffle for the selection", r"^(?:(?!Exchange).)*$"),
    ],
    "q_agg_histogram": [
        ("partial aggregation on the bucket key", r"HashAggregate.*partial"),
        ("only the bucketed column read", r"ReadSchema: struct<l_extendedprice:double>"),
    ],
    "q_dedup_simhash": [
        # The whole SimHash family is built-in expressions now — any
        # Python eval node in this plan is a regression to the slow path.
        # (Higher-order lambdas run in an interpreted ProjectExec, not
        # WholeStageCodegen — still JVM-side, no Arrow crossing.)
        ("no Python in the row path", r"^(?:(?!ArrowEvalPython|BatchEvalPython).)*$"),
        # The vote fold must be let-bound, not inlined into the 64-bit
        # majority lambda: the collapsed (bad) plan reads the fold through
        # element_at(aggregate(...), j+1) inside the lambda body.
        ("vote fold let-bound, not inlined per bit", r"^(?:(?!element_at\(aggregate).)*$"),
    ],
}


def run_audit(spark: SparkSession, sf_dir: str) -> list[tuple[str, str, bool]]:
    """Evaluate every plan check; returns (query, description, ok)."""
    results: list[tuple[str, str, bool]] = []
    for name, checks in CHECKS.items():
        plan = plan_of(spark, name, sf_dir)
        for desc, pattern in checks:
            ok = re.search(pattern, plan, re.DOTALL | re.MULTILINE) is not None
            results.append((name, desc, ok))

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
