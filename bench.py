"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed to completion (count() action — results stay
distributed; nothing is collected to the driver). Each query gets one
untimed warmup run first (JMH-style), so the measured numbers reflect
steady-state execution — JVM warmup and per-query Janino codegen
compilation are one-time driver costs that are irrelevant at the 100 TB
design point, where execution dominates by orders of magnitude.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from asyncdatapipeline_spark import registry  # noqa: E402
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
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench")

    # warmup: JVM, whole-stage-codegen compilation, parquet footer caches
    for name in HEADLINE:
        registry.get(name).fn(spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = registry.get(name).fn
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
