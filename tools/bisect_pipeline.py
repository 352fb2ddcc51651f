"""Isolated median-of-5 bisection of the pipeline-throughput curve
(r8 verdict #2: w16 dropped 102.9k → 50.1k ops/s between BENCH_r07 and
BENCH_r08 with zero source change in pipeline.py / config.py /
bench.py — same protocol as the committed q_window_session bisection,
SCALING.md §"bisection protocol").

Two measurement conditions, 5 trials each per worker count, every
trial in a FRESH subprocess (no cross-trial thread/GC state):

- ``bare``    — the pipeline harness alone, as close to the reference
                benchmark's conditions as this box gets.
- ``with-jvm``— an idle local[32] Spark JVM alive in the same process,
                reproducing bench.py's in-situ condition (the pipeline
                bench runs after 4×70 Spark queries with the JVM
                resident; its GC/compiler threads compete for cores).

If ``bare`` restores the r7 curve while ``with-jvm`` shows the r8
numbers, the regression is environmental (JVM/box contention), not a
code regression. Output: one JSON blob on stdout; commit beside
BENCH_r09.json.

Usage: python tools/bisect_pipeline.py [--trials 5] [--workers 1,2,4,8,16]
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_TRIAL_SRC = r"""
import sys, time
sys.path.insert(0, {repo!r})
jvm = {with_jvm!r}
if jvm:
    from asyncdatapipeline_spark.session import get_spark
    spark = get_spark("bisect-idle-jvm")
    # touch it so the executor threadpool actually exists
    spark.range(10).count()
sys.path.insert(0, {repo!r})
import bench
print("RESULT", bench.bench_pipeline({workers}))
"""


def one_trial(workers: int, with_jvm: bool) -> float:
    src = _TRIAL_SRC.format(repo=str(REPO), with_jvm=with_jvm, workers=workers)
    out = subprocess.run(
        [sys.executable, "-c", src],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=str(REPO),
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return float(line.split()[1])
    raise RuntimeError(
        f"trial failed (w={workers}, jvm={with_jvm}):\n{out.stderr[-2000:]}"
    )


def main() -> int:
    trials = 5
    if "--trials" in sys.argv:
        trials = int(sys.argv[sys.argv.index("--trials") + 1])
    workers = [1, 2, 4, 8, 16]
    if "--workers" in sys.argv:
        workers = [
            int(w) for w in sys.argv[sys.argv.index("--workers") + 1].split(",")
        ]

    report: dict = {"trials": trials, "conditions": {}}
    for cond, with_jvm in (("bare", False), ("with_jvm", True)):
        curve = {}
        for w in workers:
            ts = [one_trial(w, with_jvm) for _ in range(trials)]
            curve[f"w{w}"] = {
                "median": round(statistics.median(ts), 1),
                "min": round(min(ts), 1),
                "max": round(max(ts), 1),
            }
            print(
                f"{cond} w{w}: median {curve[f'w{w}']['median']} "
                f"[{curve[f'w{w}']['min']}..{curve[f'w{w}']['max']}] ops/s",
                file=sys.stderr,
            )
        report["conditions"][cond] = curve
    print(json.dumps(report, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
