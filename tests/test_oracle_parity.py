"""Oracle parity at sf0.001 — the in-repo mirror of the driver's t2 gate.

The full-strictness sweep lives in tools/check_oracle.py (run at sf0.01);
this test keeps a fast representative subset in the default pytest run so
regressions in value determinism (float summation order, timestamp
precision, type drift) are caught immediately.
"""

from __future__ import annotations

import math
from collections import Counter

import duckdb
import pytest

from asyncdatapipeline_spark import registry
from asyncdatapipeline_spark.sources.tables import TABLES

SUBSET = [
    "q_agg_hash",
    "q_agg_rollup",
    "q_join_broadcast",
    "q_join_asof",
    "q_win_frame",
    "q_window_session",
    "q_dedup_exact",
    "q_dedup_ngram",
    "q_sim_topk",
    "q_fn_array",
    "q_udaf_pandas",
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(df):
    from tools.check_oracle import canon_rows

    return canon_rows(df)


@pytest.mark.parametrize("name", SUBSET)
def test_oracle_parity(spark, sf_dir, duck, name):
    qd = registry.get(name)
    assert qd.oracle, f"{name} has no oracle"
    sdf = qd.fn(spark, sf_dir).toPandas()
    odf = duck.sql(qd.oracle).df()
    scols, srows = _canon(sdf)
    ocols, orows = _canon(odf)
    assert scols == ocols
    assert srows == orows


def test_approx_distinct_tolerance(spark, sf_dir, duck):
    """B23: HLL estimate within 5% of exact (SURVEY.md §2 'weak')."""
    est = {
        r["l_returnflag"]: (r["approx_orders"], r["approx_parts"])
        for r in registry.get("q_agg_approx").fn(spark, sf_dir).collect()
    }
    exact = duck.sql(
        "SELECT l_returnflag, COUNT(DISTINCT l_orderkey) o, COUNT(DISTINCT l_partkey) p"
        " FROM lineitem GROUP BY 1"
    ).fetchall()
    for flag, o, p in exact:
        eo, ep = est[flag]
        assert math.isclose(eo, o, rel_tol=0.05)
        assert math.isclose(ep, p, rel_tol=0.05)
