"""Dump `.explain("formatted")` physical plans for named queries.

Usage: python tools/dump_plans.py SF_DIR OUT_DIR SUFFIX name [name ...]

Writes OUT_DIR/<name><SUFFIX>.txt for each query name (e.g. suffix
``_after`` at the optimized tree, ``_before`` at the baseline tree via a
git worktree). Plans are built only (no execution), so this is cheap.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from asyncdatapipeline_spark import registry  # noqa: E402
from asyncdatapipeline_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir, out_dir, suffix, *names = sys.argv[1:]
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    spark = get_spark("dump-plans")
    jvm = spark.sparkContext._jvm
    for name in names:
        df = registry.get(name).fn(spark, sf_dir)
        plan = jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out / f"{name}{suffix}.txt").write_text(plan)
        print(f"wrote {name}{suffix}.txt ({len(plan)} bytes)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
