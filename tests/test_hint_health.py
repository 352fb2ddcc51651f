"""Standing gate for join-hint health (r9 verdict #3).

``tools/audit_hints.py`` sweeps ALL registry keys (committed artifact
HINTS_AUDIT_r{N}.json); this pytest keeps a fast sentinel subset in the
suite so the two shapes that produced every round-10 offender can never
silently return:

- a broadcast hint on an alias of the SAME frame in a self-join
  (q_orders_yoy r9): Spark resolves by plan identity, attaches the hint
  to the preserved side, drops it;
- a spine DERIVED from a hinted bounds frame (12 timeseries ops + 1
  aggregate op, r10): the ResolvedHint leaks into the spine's left-join
  branch where "build left for left outer join" is unsupported.

The child JVM is started with a log4j2 config that tees
HintErrorLogger into a file; any captured line fails the test. The
capture path itself is validated by a deliberately-dropped hint first —
a broken appender must fail the test, not pass it.
"""

from __future__ import annotations

import json
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

SENTINELS = [
    "q_orders_yoy",      # self-join alias identity (r9 offender)
    "q_ts_hurst",        # spine-from-hinted-bounds, worst count (10)
    "q_ts_backtest",     # hinted bounds reused via crossJoin after fix
    "q_events_hazard",   # week spine from per-group max
    "q_ts_debounce",     # bucket spine
    "q_ml_residual_diag",  # same shape outside timeseries.py
]

_PROBE_SRC = r"""
import sys, tempfile
from pathlib import Path
sys.path.insert(0, {repo!r})
import tools.audit_hints as ah
logfile = Path(tempfile.mkdtemp()) / "h.log"
props = Path(tempfile.mkdtemp()) / "log4j2.properties"
props.write_text(ah._LOG4J2.format(logfile=logfile))
from asyncdatapipeline_spark.session import get_spark
spark = get_spark("hint-probe", extra_conf={{
    "spark.driver.extraJavaOptions": f"-Dlog4j.configurationFile=file:{{props}}"}})
from pyspark.sql import functions as F
a = spark.range(10).withColumnRenamed("id", "k")
b = spark.range(10).withColumnRenamed("id", "k")
# build left for LEFT outer join: unsupported -> must be captured
F.broadcast(a).join(b, "k", "left")._jdf.queryExecution().executedPlan()
got = logfile.read_text().splitlines() if logfile.exists() else []
assert got, "capture path broken: dropped hint produced no logged warning"
print("PROBE_OK")
spark.stop()
"""


def test_hint_capture_detects_dropped_hint():
    out = subprocess.run(
        [sys.executable, "-c", _PROBE_SRC.format(repo=str(REPO))],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=str(REPO),
    )
    assert "PROBE_OK" in out.stdout, out.stderr[-3000:]


def test_sentinel_queries_plan_with_zero_dropped_hints():
    logfile = Path(tempfile.mkdtemp(prefix="hintgate_")) / "hints.log"
    out = subprocess.run(
        [
            sys.executable,
            str(REPO / "tools" / "audit_hints.py"),
            "--child",
            str(logfile),
            "/root/testdata/sf0.001",
            *SENTINELS,
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=str(REPO),
    )
    built = None
    for line in out.stdout.splitlines():
        if line.startswith("BUILT "):
            built = json.loads(line[6:])
    assert built is not None, out.stderr[-3000:]
    assert not built["errs"], built["errs"]
    warnings = (
        logfile.read_text().splitlines() if logfile.exists() else []
    )
    assert not warnings, f"dropped hints: {built['by_query']}: {warnings}"
