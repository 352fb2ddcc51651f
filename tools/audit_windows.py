"""Registry-wide unpartitioned-window audit → committed JSON artifact.

Walks the OPTIMIZED logical plan of every registered query (the same
scan tests/test_plans.py::test_no_unpartitioned_windows_registry_wide
gates on) and writes the round artifact (WINDOWS_AUDIT_r{N}.json shape):
offenders = queries planning a Window/WindowGroupLimit whose partition
spec is empty or folds to a constant — the single-partition
data-sized-sort class that cannot survive 100 TB.

Usage: python tools/audit_windows.py [sf_dir] [--json OUT.json]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from asyncdatapipeline_spark.plans.audit import (  # noqa: E402
    WINDOW_SCAN_ALLOWLIST,
    scan_registry_windows,
)
from asyncdatapipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    argv = list(sys.argv[1:])
    out = None
    if "--json" in argv:
        i = argv.index("--json")
        out = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    spark = get_spark("audit-windows")
    offenders = scan_registry_windows(spark, sf_dir)
    doc = {
        "sf_dir": sf_dir,
        "rule": (
            "optimized logical plan of every registry query must contain "
            "no Window/WindowGroupLimit node with an empty or all-foldable "
            "partitionSpec (single-partition execution, `WindowExec: No "
            "Partition Defined`)"
        ),
        "allowlist": dict(WINDOW_SCAN_ALLOWLIST),
        "offenders": {
            k: v for k, v in offenders.items() if k not in WINDOW_SCAN_ALLOWLIST
        },
        "allowlisted_hits": {
            k: v for k, v in offenders.items() if k in WINDOW_SCAN_ALLOWLIST
        },
    }
    text = json.dumps(doc, indent=1)
    if out:
        Path(out).write_text(text + "\n")
        print(f"wrote {out}: {len(doc['offenders'])} offenders")
    else:
        print(text)
    spark.stop()


if __name__ == "__main__":
    main()
