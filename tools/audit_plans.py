"""CLI for the physical-plan audit (asyncdatapipeline_spark/plans/audit.py).

Usage: python tools/audit_plans.py [sf_dir] [--show name]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from asyncdatapipeline_spark.plans.audit import plan_of, run_audit  # noqa: E402
from asyncdatapipeline_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    show = None
    if "--show" in sys.argv:
        show = sys.argv[sys.argv.index("--show") + 1]

    spark = get_spark("plan-audit")
    if show:
        print(plan_of(spark, show, sf_dir))
        return 0

    n_fail = 0
    for name, desc, ok in run_audit(spark, sf_dir):
        if not ok:
            n_fail += 1
        print(f"{'PASS' if ok else 'FAIL'}  {name}: {desc}")

    print(f"\n{n_fail} plan check failures")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
