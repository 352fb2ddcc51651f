"""Fresh-session vs end-of-suite discriminator for the graph fixpoint
family (r11 verdict items 1-2: q_graph_kcore read 2.13x with raw
samples 4.6/19.2/11.0 s in the 142-query driver bench while its
isolated plan is clean, and the whole localCheckpoint-heavy family
drifted +15-29% together — one coherent drift across six queries is a
shared cause, not six regressions).

Hypothesis under test: per-round eager ``localCheckpoint()``
materializations accumulate in the block manager over the growing
suite (142 queries x 4 passes, each fixpoint query banking 20+
checkpointed RDDs per pass), and the storage/cleaner pressure at the
END of a long suite is what doubles a sample — not the operator.

Three subprocess modes, one fresh JVM each:

- ``fresh``      — session -> family protocol (1 cold + 5 warm per
                   query, interleaved by pass).
- ``pressured``  — session -> one pass over every OTHER headline query
                   (the suite prefix the driver bench runs before
                   reaching the graph keys) -> same family protocol.
- ``pressured_gc`` — as ``pressured``, but ``gc.collect()`` after every
                   query so Python releases DataFrame refs promptly,
                   py4j drops the JVM handles, and ContextCleaner can
                   unpersist the checkpoint blocks between queries.

Verdict rule: pressured >> fresh confirms suite-position pressure;
pressured_gc ~= fresh additionally confirms the cheap hygiene fix
(prompt ref release) and licenses wiring it into bench.py.

Usage: python tools/probe_graph_family.py [sf_dir] [--quick]
Writes GRAPH_PROBE_r12.json at the repo root.
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

FAMILY = [
    "q_graph_kcore",
    "q_graph_components",
    "q_graph_pagerank",
    "q_graph_clustering",
    "q_graph_label_prop",
    "q_graph_rich_club",
    "q_graph_jaccard",
    "q_dedup_clusters",
]

_MODE_SRC = r"""
import gc, json, sys, time
sys.path.insert(0, {repo!r})
from asyncdatapipeline_spark.session import get_spark
from asyncdatapipeline_spark import registry
from pyspark.sql import functions as F
import bench

spark = get_spark("graph-probe")
sf_dir = {sf_dir!r}
family = {family!r}
mode = {mode!r}
warm_passes = {warm_passes!r}

def consume(df):
    df.agg(F.max(F.xxhash64(*df.columns))).collect()

if mode.startswith("pressured"):
    # One pass over the suite PREFIX the driver bench runs before the
    # graph keys (every headline query not in the family), mimicking
    # the block-manager state at the family's suite position.
    for name in bench.HEADLINE:
        if name in family:
            continue
        consume(registry.get(name).fn(spark, sf_dir))
        if mode == "pressured_gc":
            gc.collect()

cold = {{}}
for name in family:
    t0 = time.perf_counter()
    consume(registry.get(name).fn(spark, sf_dir))
    cold[name] = round(time.perf_counter() - t0, 3)
samples = {{name: [] for name in family}}
for _ in range(warm_passes):
    for name in family:
        fn = registry.get(name).fn
        t0 = time.perf_counter()
        consume(fn(spark, sf_dir))
        samples[name].append(round(time.perf_counter() - t0, 3))
        if mode == "pressured_gc":
            gc.collect()
print("RESULT " + json.dumps({{"cold": cold, "samples": samples}}))
"""


def run_mode(mode: str, sf_dir: str, warm_passes: int) -> dict:
    src = _MODE_SRC.format(
        repo=str(REPO),
        sf_dir=sf_dir,
        family=FAMILY,
        mode=mode,
        warm_passes=warm_passes,
    )
    out = subprocess.run(
        [sys.executable, "-c", src],
        capture_output=True,
        text=True,
        timeout=3600,
        cwd=str(REPO),
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])
    raise RuntimeError(f"mode {mode} failed:\n{out.stderr[-3000:]}")


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    warm = 3 if "--quick" in sys.argv else 5
    report: dict = {"sf_dir": sf_dir, "warm_passes": warm, "modes": {}}
    for mode in ("fresh", "pressured", "pressured_gc"):
        r = run_mode(mode, sf_dir, warm)
        med = {
            name: round(statistics.median(ts), 3)
            for name, ts in r["samples"].items()
        }
        report["modes"][mode] = {
            "median": med,
            "total_median": round(sum(med.values()), 3),
            "cold": r["cold"],
            "samples": r["samples"],
        }
        print(
            f"{mode}: family warm-median total "
            f"{report['modes'][mode]['total_median']:.2f}s  "
            + " ".join(f"{n.split('q_')[1]}={m:.2f}" for n, m in med.items()),
            file=sys.stderr,
        )
    f = report["modes"]["fresh"]["median"]
    for mode in ("pressured", "pressured_gc"):
        m = report["modes"][mode]["median"]
        report["modes"][mode]["ratio_vs_fresh"] = {
            name: round(m[name] / f[name], 3) if f[name] else None
            for name in FAMILY
        }
    out = REPO / "GRAPH_PROBE_r12.json"
    out.write_text(json.dumps(report, indent=1) + "\n")
    print(f"wrote {out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
