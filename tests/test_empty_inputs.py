"""Empty-input robustness sweep: every registered query must execute
against empty (schema-identical) fixture tables without crashing.

At 100 TB, empty inputs are routine — an empty date partition, a source
with no documents today, a filter that matches nothing. An operator that
works on data but throws on its absence (first() on empty, seeding a
loop from a missing row, KMeans on zero vectors) is a production pager.
Aggregates-without-group correctly return their SQL identity row
(count=0, sum=NULL) rather than zero rows.

Exclusions, each for a declared reason — not silent skips:
- q_sim_ivf: pyspark.ml KMeans requires k ≤ n points; an empty corpus
  has no centroids to train. The operator's documented contract is a
  built index; "no corpus" is a deploy-time config error, not a runtime
  state (its guard raises a clear error either way).
"""

from __future__ import annotations

import pytest

from asyncdatapipeline_spark import registry
from asyncdatapipeline_spark.sources.tables import TABLES, load_table

EXCLUDED = {"q_sim_ivf"}


@pytest.fixture(scope="module")
def empty_sf_dir(spark, sf_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        df = load_table(spark, sf_dir, t)
        df.limit(0).write.mode("overwrite").parquet(str(out / f"{t}.parquet"))
    return str(out)


def test_every_query_survives_empty_inputs(spark, empty_sf_dir):
    failures = []
    for name, fn in registry.all_queries().items():
        if name in EXCLUDED:
            continue
        try:
            fn(spark, empty_sf_dir).collect()
        except Exception as e:  # noqa: BLE001 — collecting all failures
            failures.append(f"{name}: {type(e).__name__}: {e}")
    assert not failures, "queries crashed on empty inputs:\n" + "\n".join(failures)
