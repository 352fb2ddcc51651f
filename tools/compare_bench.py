"""Round-over-round bench comparison.

Reads two BENCH_r{N}.json artifacts (driver format: the JSON line is
embedded in the "tail" field; also accepts a raw bench.py output line)
and prints per-query deltas, flagging regressions beyond a noise
threshold. The verify notes warn this box swings 2-5x under external
load — treat any single-pass delta as a hypothesis, then re-measure the
flagged query median-of-3 before believing it.

Usage: python tools/compare_bench.py BENCH_r04.json BENCH_r05.json [--thresh 1.25]
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    raw = open(path).read()
    try:
        d = json.loads(raw)
    except json.JSONDecodeError:
        d = {"tail": raw}
    if "queries" not in d:
        tail = d.get("tail", "")
        i = tail.rfind('{"metric"')
        if i < 0:
            raise SystemExit(f"{path}: no bench JSON line found")
        d = json.loads(tail[i:].splitlines()[0])
    # Round-6+ compact headline lines carry only the slowest-5 queries
    # and point at the full per-query artifact via "detail" — follow it
    # (same directory as the input file) so per-query comparison and
    # superset-stability checks see the complete dict, not the top-5
    # intersection.
    if "detail" in d:
        from pathlib import Path

        dp = Path(path).resolve().parent / d["detail"]
        if dp.exists():
            full = json.loads(dp.read_text())
            if "queries" in full:
                d = full
        else:
            print(
                f"note: {path} is a compact headline line and its detail "
                f"file {d['detail']} was not found next to it — comparing "
                f"only the {len(d['queries'])} queries present"
            )
    return d


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    thresh = 1.25
    if "--thresh" in sys.argv:
        thresh = float(sys.argv[sys.argv.index("--thresh") + 1])
    old, new = load(args[0]), load(args[1])
    oq, nq = old["queries"], new["queries"]
    common = sorted(set(oq) & set(nq))
    added = sorted(set(nq) - set(oq))
    dropped = sorted(set(oq) - set(nq))
    slower, faster = [], []
    for k in common:
        r = nq[k] / oq[k] if oq[k] else float("inf")
        line = f"  {k}: {oq[k]:.3f}s -> {nq[k]:.3f}s ({r:.2f}x)"
        if r >= thresh:
            slower.append(line)
        elif r <= 1 / thresh:
            faster.append(line)
    print(f"common {len(common)} | added {len(added)} | dropped {len(dropped)}")
    if dropped:
        print("DROPPED (breaks superset-stability!):", ", ".join(dropped))
    if slower:
        print(f"slower >= {thresh}x ({len(slower)}):")
        print("\n".join(slower))
    if faster:
        print(f"faster <= {1/thresh:.2f}x ({len(faster)}):")
        print("\n".join(faster))
    tot_o = sum(oq[k] for k in common)
    tot_n = sum(nq[k] for k in common)
    print(f"common-query total: {tot_o:.2f}s -> {tot_n:.2f}s")
    if added:
        print("added:", ", ".join(f"{k}={nq[k]:.3f}s" for k in added))


if __name__ == "__main__":
    main()
