"""Registry-wide hint-health audit (r9 verdict #3).

A join-strategy hint that Spark cannot attach (e.g. a broadcast hint on
the preserved side of an outer join, or on the wrong alias of a
self-join) is silently DROPPED with only a
``org.apache.spark.sql.catalyst.analysis.HintErrorLogger`` warning —
the query stays correct, but the plan the author believed in is not the
plan that runs, and the warning noise trains readers to ignore real
plan regressions (r9's q_orders_yoy spammed 9 of them per bench run).

This tool builds the OPTIMIZED logical plan of every registered query
(construction only, same contract as the windows audit — bounded
fixture/build jobs still run) in a child interpreter whose JVM is
started with a log4j2 configuration that tees every HintErrorLogger
WARN+ event into a file, then fails if the file is non-empty.

Usage:  python tools/audit_hints.py [sf_dir] [--json OUT.json] [q ...]
Child:  python tools/audit_hints.py --child LOGFILE sf_dir [q ...]

Exit 0 = zero dropped/invalid hints across the registry.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_LOG4J2 = """\
rootLogger.level = error
rootLogger.appenderRef.stdout.ref = console

appender.console.type = Console
appender.console.name = console
appender.console.target = SYSTEM_ERR
appender.console.layout.type = PatternLayout
appender.console.layout.pattern = %d{{yy/MM/dd HH:mm:ss}} %p %c{{1}}: %m%n

logger.hints.name = org.apache.spark.sql.catalyst.analysis.HintErrorLogger
logger.hints.level = warn
logger.hints.appenderRef.hintfile.ref = hintfile

appender.hintfile.type = File
appender.hintfile.name = hintfile
appender.hintfile.fileName = {logfile}
appender.hintfile.layout.type = PatternLayout
appender.hintfile.layout.pattern = %p %m%n
"""


def child(logfile: str, sf_dir: str, only: list[str]) -> int:
    sys.path.insert(0, str(REPO))
    from asyncdatapipeline_spark import registry
    from asyncdatapipeline_spark.session import get_spark

    props = Path(tempfile.mkdtemp(prefix="hintaudit_")) / "log4j2.properties"
    props.write_text(_LOG4J2.format(logfile=logfile))
    spark = get_spark(
        "hint-audit",
        extra_conf={
            "spark.driver.extraJavaOptions": f"-Dlog4j.configurationFile=file:{props}"
        },
    )
    names = only or sorted(registry.all_queries())
    errs = {}
    by_query: dict[str, int] = {}
    seen_lines = 0

    def new_warnings() -> int:
        nonlocal seen_lines
        # FileAppender defaults to immediateFlush, so the log is current
        n = (
            len(Path(logfile).read_text().splitlines())
            if os.path.exists(logfile)
            else 0
        )
        fresh = n - seen_lines
        seen_lines = n
        return fresh

    for i, name in enumerate(names):
        try:
            df = registry.get(name).fn(spark, sf_dir)
            # HintErrorLogger fires at PHYSICAL planning (JoinSelection),
            # not logical optimization — executedPlan() constructs the
            # physical plan without running the query (AQE defers stages)
            df._jdf.queryExecution().executedPlan()
        except Exception as exc:  # report, keep sweeping
            errs[name] = f"{type(exc).__name__}: {exc}"
        fresh = new_warnings()
        if fresh:
            by_query[name] = fresh
        if (i + 1) % 50 == 0:
            print(f"  built {i + 1}/{len(names)} plans", file=sys.stderr)
    print("BUILT " + json.dumps({"n": len(names), "errs": errs, "by_query": by_query}))
    spark.stop()  # flush appenders via JVM shutdown
    return 0


def main() -> int:
    argv = sys.argv[1:]
    if argv and argv[0] == "--child":
        return child(argv[1], argv[2], argv[3:])

    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    sf_dir = argv[0] if argv and not argv[0].startswith("q_") else "/root/testdata/sf0.01"
    only = [a for a in argv if a.startswith("q_")]

    logfile = Path(tempfile.mkdtemp(prefix="hintaudit_")) / "hints.log"
    proc = subprocess.run(
        [sys.executable, __file__, "--child", str(logfile), sf_dir, *only],
        capture_output=True,
        text=True,
        timeout=3600,
        cwd=str(REPO),
    )
    built = {"n": 0, "errs": {"<child>": proc.stderr[-2000:]}, "by_query": {}}
    for line in proc.stdout.splitlines():
        if line.startswith("BUILT "):
            built = json.loads(line[6:])
    warnings = (
        [ln for ln in logfile.read_text().splitlines() if ln.strip()]
        if logfile.exists()
        else []
    )
    report = {
        "sf_dir": sf_dir,
        "plans_built": built["n"],
        "build_errors": built["errs"],
        "hint_warnings": warnings,
        "warnings_by_query": built.get("by_query", {}),
        "ok": not warnings and not built["errs"],
    }
    if json_out:
        Path(json_out).write_text(json.dumps(report, indent=1) + "\n")
    print(
        f"{built['n']} plans built, {len(built['errs'])} build errors, "
        f"{len(warnings)} hint warnings"
    )
    for q, n in built.get("by_query", {}).items():
        print(f"  HINT DROPPED in {q}: {n} warning(s)")
    for name, err in built["errs"].items():
        print(f"  BUILD ERROR {name}: {err}")
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
