"""Driver-contract smoke tests: entry(), queries(), oracle_sql() shape."""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

import pytest

spec = importlib.util.spec_from_file_location(
    "__spark_entry__", Path(__file__).resolve().parent.parent / "__spark_entry__.py"
)
entry_mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(entry_mod)


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns and "l_returnflag" in df.columns


def test_queries_registry_shape(spark):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(qs) >= 50
    # every oracle key has a query
    assert set(oracles) <= set(qs)
    # a healthy majority is oracle-checked
    assert len(oracles) >= 0.8 * len(qs)


@pytest.mark.parametrize(
    "name",
    [
        "q_agg_hash",
        "q_join_inner",
        "q_win_rank",
        "q_dedup_exact",
        "q_sim_topk",
        "q_window_tumbling",
    ],
)
def test_headline_queries_run(spark, sf_dir, name):
    df = entry_mod.queries()[name](spark, sf_dir)
    assert df.count() > 0
