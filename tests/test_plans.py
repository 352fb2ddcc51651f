"""Plan-shape regression gate: every check in plans/audit.py must hold.

The audit CLI (tools/audit_plans.py) is the interactive loop; this test
makes the same checks part of the pytest gate so a plan regression (lost
pushdown, a broadcast that became a sort-merge, a WindowGroupLimit that
stopped firing) fails CI, not just a manual run. Runs at sf0.001 — plan
*shapes* are scale-invariant here (all dims stay under the broadcast
threshold at every fixture SF).
"""

from __future__ import annotations

from asyncdatapipeline_spark.plans.audit import run_audit


def test_all_plan_checks_hold(spark, sf_dir):
    failures = [
        f"{name}: {desc}" for name, desc, ok in run_audit(spark, sf_dir) if not ok
    ]
    assert not failures, f"plan checks failed: {failures}"
