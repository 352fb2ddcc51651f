"""Isolated A/B bisection of per-query warm medians between two git
trees (r8 verdict #3: q_cdc_apply 1.46x, q_join_spatial_grid 1.36x,
q_curation_report 1.32x, q_win_concurrency 1.32x drifted r7→r8 with no
source change — suspected box noise, never bisected).

For each query: ONE subprocess per tree runs a cold pass + 5 warm
passes with bench.py's hash terminal and reports the warm median; tree
order is interleaved A,B,A,B per query so a load spike on this shared
box hits both trees, not one. Additionally diffs the two trees'
optimized plans (expression ids normalized away) — "identical plans +
overlapping medians" is the box-noise verdict; a plan drift localizes
a real regression.

Usage:
  python tools/bisect_queries.py REF_COMMIT [sf_dir] [q1 q2 ...]
(default queries: the four r8 drifters; REF_COMMIT is checked out to a
temp `git worktree` and removed afterwards.)
"""

from __future__ import annotations

import json
import re
import statistics
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

DEFAULT_QUERIES = [
    "q_cdc_apply",
    "q_join_spatial_grid",
    "q_curation_report",
    "q_win_concurrency",
]

_TRIAL_SRC = r"""
import sys, time, json
sys.path.insert(0, {tree!r})
from asyncdatapipeline_spark.session import get_spark
from asyncdatapipeline_spark import registry
from pyspark.sql import functions as F

spark = get_spark("bisect-q")
fn = registry.get({name!r}).fn

def consume(df):
    df.agg(F.max(F.xxhash64(*df.columns))).collect()

consume(fn(spark, {sf_dir!r}))          # cold
ts = []
for _ in range(5):
    t0 = time.perf_counter()
    consume(fn(spark, {sf_dir!r}))
    ts.append(time.perf_counter() - t0)
plan = fn(spark, {sf_dir!r})._jdf.queryExecution().optimizedPlan().toString()
print("RESULT " + json.dumps({{"warm": ts, "plan": plan}}))
"""


def run_tree(tree: str, name: str, sf_dir: str) -> dict:
    src = _TRIAL_SRC.format(tree=tree, name=name, sf_dir=sf_dir)
    out = subprocess.run(
        [sys.executable, "-c", src],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=tree,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])
    raise RuntimeError(f"trial failed ({tree}, {name}):\n{out.stderr[-3000:]}")


def norm_plan(plan: str) -> str:
    p = re.sub(r"#\d+L?", "#x", plan)
    p = re.sub(r"plan_id=\d+", "plan_id=x", p)
    # temp-view / derived-layout names carry content hashes
    p = re.sub(r"(sigstore|bucketed|reach)_[a-z0-9_]+", r"\1_x", p)
    return p


def main() -> int:
    ref = sys.argv[1]
    rest = sys.argv[2:]
    sf_dir = rest[0] if rest and rest[0].startswith("/") else "/root/testdata/sf0.1"
    queries = [a for a in rest if a.startswith("q_")] or DEFAULT_QUERIES

    tmp = tempfile.mkdtemp(prefix="bisect_r7_")
    tree = str(Path(tmp) / "tree")
    subprocess.run(
        ["git", "worktree", "add", "--detach", tree, ref],
        cwd=REPO,
        check=True,
        capture_output=True,
    )
    try:
        report: dict = {"ref": ref, "sf_dir": sf_dir, "queries": {}}
        for name in queries:
            cur = run_tree(str(REPO), name, sf_dir)
            old = run_tree(tree, name, sf_dir)
            same_plan = norm_plan(cur["plan"]) == norm_plan(old["plan"])
            med_cur = statistics.median(cur["warm"])
            med_old = statistics.median(old["warm"])
            report["queries"][name] = {
                "head_median": round(med_cur, 3),
                "head_warm": [round(t, 3) for t in cur["warm"]],
                "ref_median": round(med_old, 3),
                "ref_warm": [round(t, 3) for t in old["warm"]],
                "ratio_head_over_ref": round(med_cur / med_old, 3),
                "plans_identical": same_plan,
            }
            print(
                f"{name}: head {med_cur:.3f}s vs {ref} {med_old:.3f}s "
                f"(x{med_cur / med_old:.2f}), plans "
                f"{'IDENTICAL' if same_plan else 'DIFFER'}",
                file=sys.stderr,
            )
        print(json.dumps(report, indent=1))
        return 0
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", tree],
            cwd=REPO,
            capture_output=True,
        )


if __name__ == "__main__":
    raise SystemExit(main())
