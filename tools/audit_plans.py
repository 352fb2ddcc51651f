"""CLI for the physical-plan audit (asyncdatapipeline_spark/plans/audit.py).

Usage: python tools/audit_plans.py [sf_dir] [--show name]
       python tools/audit_plans.py [sf_dir] --windows [--json OUT.json]

``--windows`` runs the registry-wide unpartitioned-window scan (r8
verdict #1): every registered query's OPTIMIZED logical plan is walked
and any Window/WindowGroupLimit node with an empty or all-foldable
partitionSpec is reported. Exit 1 if any offender is outside
WINDOW_SCAN_ALLOWLIST.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from asyncdatapipeline_spark.plans.audit import (  # noqa: E402
    WINDOW_SCAN_ALLOWLIST,
    plan_of,
    run_audit,
    scan_registry_windows,
)
from asyncdatapipeline_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    show = None
    if "--show" in sys.argv:
        show = sys.argv[sys.argv.index("--show") + 1]
    json_out = None
    if "--json" in sys.argv:
        json_out = sys.argv[sys.argv.index("--json") + 1]

    spark = get_spark("plan-audit")
    if show:
        print(plan_of(spark, show, sf_dir))
        return 0

    if "--windows" in sys.argv:
        offenders = scan_registry_windows(spark, sf_dir)
        bad = {k: v for k, v in offenders.items() if k not in WINDOW_SCAN_ALLOWLIST}
        allowed = {k: v for k, v in offenders.items() if k in WINDOW_SCAN_ALLOWLIST}
        for name, hits in sorted(offenders.items()):
            tag = "ALLOW" if name in WINDOW_SCAN_ALLOWLIST else "FAIL "
            for h in hits:
                print(f"{tag} {name}: {h}")
        print(
            f"\nwindow scan: {len(bad)} offenders outside allowlist, "
            f"{len(allowed)} allowlisted, "
            f"{len(offenders)} total with unpartitioned windows"
        )
        if json_out:
            Path(json_out).write_text(
                json.dumps(
                    {
                        "sf_dir": sf_dir,
                        "rule": (
                            "optimized logical plan of every registry "
                            "query must contain no Window/WindowGroupLimit "
                            "node with an empty or all-foldable "
                            "partitionSpec (single-partition execution, "
                            "`WindowExec: No Partition Defined`)"
                        ),
                        "allowlist": WINDOW_SCAN_ALLOWLIST,
                        "offenders": bad,
                        "allowlisted_hits": allowed,
                    },
                    indent=2,
                )
                + "\n"
            )
            print(f"wrote {json_out}")
        return 1 if bad else 0

    n_fail = 0
    for name, desc, ok in run_audit(spark, sf_dir):
        if not ok:
            n_fail += 1
        print(f"{'PASS' if ok else 'FAIL'}  {name}: {desc}")

    print(f"\n{n_fail} plan check failures")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
