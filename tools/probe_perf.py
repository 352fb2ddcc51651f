"""Per-query performance probe for the optimization rounds (guide §1).

For each query: times the DataFrame BUILD (driver-side work incl. any
eager boundary jobs), captures ``explain("formatted")`` to a file, then
runs one cold + N warm consumes (bench.py's hash terminal) inside a job
group and reports wall times plus job/stage/task counts from the
status tracker. Job count ≈ eager materializations; task counts expose
single-task scan stages (the 1-row-group fixture problem).

Usage:
  python tools/probe_perf.py [sf_dir] [--plans DIR] [--warm N]
                             [--json OUT.json] q1 q2 ...
  python tools/probe_perf.py --top 25          # heaviest from BENCH_DETAIL
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from asyncdatapipeline_spark import registry  # noqa: E402
from asyncdatapipeline_spark.session import get_spark  # noqa: E402


def consume(df) -> None:
    from pyspark.sql import functions as F

    df.agg(F.max(F.xxhash64(*df.columns))).collect()


def probe(spark, name: str, sf_dir: str, warm: int, plans_dir: Path | None):
    fn = registry.get(name).fn
    sc = spark.sparkContext

    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    build_s = time.perf_counter() - t0

    if plans_dir is not None:
        plans_dir.mkdir(parents=True, exist_ok=True)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (plans_dir / f"{name}.txt").write_text(txt)

    group = f"probe-{name}"
    sc.setJobGroup(group, name)
    t0 = time.perf_counter()
    consume(df)
    cold_s = time.perf_counter() - t0

    warms = []
    for _ in range(warm):
        t0 = time.perf_counter()
        consume(fn(spark, sf_dir))
        warms.append(round(time.perf_counter() - t0, 3))
    sc.setJobGroup(None, None)

    tracker = sc.statusTracker()
    jobs = tracker.getJobIdsForGroup(group)
    n_stages = 0
    n_tasks = 0
    single_task_stages = 0
    for jid in jobs:
        ji = tracker.getJobInfo(jid)
        if ji is None:
            continue
        for sid in ji.stageIds:
            si = tracker.getStageInfo(sid)
            if si is None:
                continue
            n_stages += 1
            n_tasks += si.numTasks
            if si.numTasks == 1:
                single_task_stages += 1
    per_consume = 1 + warm  # jobs/stages are totals over all consumes
    return {
        "build_s": round(build_s, 3),
        "cold_s": round(cold_s, 3),
        "warm_s": warms,
        "warm_min": min(warms) if warms else None,
        "jobs_total": len(jobs),
        "stages_total": n_stages,
        "tasks_total": n_tasks,
        "single_task_stages": single_task_stages,
        "consumes_in_group": per_consume,
    }


def main() -> None:
    argv = sys.argv[1:]
    plans_dir = None
    if "--plans" in argv:
        i = argv.index("--plans")
        plans_dir = Path(argv[i + 1])
        del argv[i : i + 2]
    warm = 3
    if "--warm" in argv:
        i = argv.index("--warm")
        warm = int(argv[i + 1])
        del argv[i : i + 2]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    top = None
    if "--top" in argv:
        i = argv.index("--top")
        top = int(argv[i + 1])
        del argv[i : i + 2]

    pos = [a for a in argv if not a.startswith("--")]
    sf_dir = "/root/testdata/sf0.1"
    names = []
    for a in pos:
        if a.startswith("/") or a.startswith("."):
            sf_dir = a
        else:
            names.append(a)
    if top:
        detail = sorted(
            Path(__file__).resolve().parent.parent.glob("BENCH_DETAIL_r*.json")
        )[-1]
        d = json.loads(detail.read_text())
        names = [
            k
            for k, _ in sorted(
                d["queries"].items(), key=lambda kv: -kv[1]
            )[:top]
        ]

    spark = get_spark("probe-perf")
    out = {}
    for name in names:
        try:
            r = probe(spark, name, sf_dir, warm, plans_dir)
        except Exception as exc:  # noqa: BLE001
            r = {"err": f"{type(exc).__name__}: {exc}"}
        out[name] = r
        print(
            f"{name:30s} build {r.get('build_s', '?'):>6} cold"
            f" {r.get('cold_s', '?'):>7} warm_min {r.get('warm_min', '?'):>7}"
            f" jobs {r.get('jobs_total', '?'):>3}"
            f" stages {r.get('stages_total', '?'):>3}"
            f" tasks {r.get('tasks_total', '?'):>4}"
            f" 1-task {r.get('single_task_stages', '?'):>3}",
            flush=True,
        )
    if json_out:
        Path(json_out).write_text(json.dumps(out, indent=1) + "\n")


if __name__ == "__main__":
    main()
