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


def test_sql_pipe_plans_identically_to_ansi(spark, sf_dir):
    """q_sql_pipe's claim: pipe syntax is pure parse-time sugar — the
    optimized plan must contain the same operator sequence as the ANSI
    form (same join strategy, same aggregate, same pushed filters)."""
    import re

    from asyncdatapipeline_spark import registry

    pipe_df = registry.get("q_sql_pipe").fn(spark, sf_dir)
    ansi_df = spark.sql(registry.all_oracles()["q_sql_pipe"])

    def shape(df):
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        # operator names only: strip expression ids / literals
        return [
            re.match(r"[+\- :]*([A-Za-z]+)", ln).group(1)
            for ln in plan.splitlines()
            if re.match(r"[+\- :]*[A-Za-z]", ln)
        ]

    assert shape(pipe_df) == shape(ansi_df)
