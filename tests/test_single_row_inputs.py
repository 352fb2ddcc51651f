"""Single-row robustness sweep: every registered query must execute
against one-row (schema-identical) fixture tables without crashing.

The degenerate sibling of tests/test_empty_inputs.py, added after the
round-8 sweep found TWENTY operators crashing here — every one an ANSI
DIVIDE_BY_ZERO from an (n−1) variance divisor, a zero-variance
correlation denominator, a zero-df F statistic, an empty experiment arm,
or (once) a temp-path-derived catalog name. A single-row group is even
more routine at 100 TB than an empty one: one order for a new customer,
one event for a new user, one day of history for a new source — and a
statistic that is undefined there must come back NULL, not page anyone.

Aggregate outputs may legitimately differ in shape from the full-corpus
run (fewer groups, NULL statistics); the contract tested is exactly
"executes and collects".
"""

from __future__ import annotations

from asyncdatapipeline_spark import registry
from asyncdatapipeline_spark.sources.tables import TABLES, load_table

import pytest


@pytest.fixture(scope="module")
def single_row_sf_dir(spark, sf_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("single_sf")
    for t in TABLES:
        df = load_table(spark, sf_dir, t)
        df.limit(1).write.mode("overwrite").parquet(
            str(out / f"{t}.parquet")
        )
    return str(out)


@pytest.mark.heavy
def test_every_query_survives_single_row_inputs(spark, single_row_sf_dir):
    failures = []
    for name, fn in registry.all_queries().items():
        try:
            fn(spark, single_row_sf_dir).collect()
        except Exception as e:  # noqa: BLE001 — collecting all failures
            failures.append(f"{name}: {type(e).__name__}: {e}")
    assert not failures, (
        "queries crashed on single-row inputs:\n" + "\n".join(failures)
    )
