"""Local mirror of the driver's correctness gate.

Runs every ``queries()[name]`` on Spark and its ``oracle_sql()[name]`` on
DuckDB over the same sf dir, compares row count + column names + values.

Value compare is ORDER-INSENSITIVE and stricter than the driver is likely
to be: rows are canonicalized (columns sorted by name, floats repr'd
exactly, timestamps to ISO-µs) and multiset-compared. Any float that
differs at all is reported with the max abs delta so drift can be traced
to a non-deterministic expression and fixed at the source (see
operators/_util.py for the decimal-armor pattern).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time
from collections import Counter
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from asyncdatapipeline_spark import registry  # noqa: E402
from asyncdatapipeline_spark.session import get_spark  # noqa: E402
from asyncdatapipeline_spark.sources.tables import TABLES  # noqa: E402


def canon_cell(v):
    import datetime

    import numpy as np
    import pandas as pd

    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "∅"
    if isinstance(v, (np.floating,)):
        v = float(v)
    if isinstance(v, (np.integer,)):
        v = int(v)
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, bool):
        return str(v)
    return str(v)


def canon_rows(df):
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append(tuple(canon_cell(v) for v in row))
    return cols, Counter(out)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = registry.all_queries()
    oracles = registry.all_oracles()
    n_pass = n_fail = n_rowsonly = 0
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: spark error: {type(exc).__name__}: {exc}")
            continue
        if name not in oracles:
            n_rowsonly += 1
            print(f"rows  {name}: {len(sdf)} rows (rows-only) [{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as exc:
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {exc}")
            continue

        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rowcount spark={len(sdf)} duck={len(odf)}")
        scols, srows = canon_rows(sdf)
        ocols, orows = canon_rows(odf)
        if scols != ocols:
            problems.append(f"columns spark={scols} duck={ocols}")
        elif srows != orows:
            extra_s = srows - orows
            extra_o = orows - srows
            ex_s = next(iter(extra_s), None)
            ex_o = next(iter(extra_o), None)
            problems.append(
                f"values differ: {sum(extra_s.values())} spark-only /"
                f" {sum(extra_o.values())} duck-only rows\n"
                f"        spark-only e.g.: {ex_s}\n"
                f"        duck-only  e.g.: {ex_o}"
            )
        if problems:
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: " + "; ".join(problems))
        else:
            n_pass += 1
            print(f"ok    {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")

    print(
        f"\n{n_pass} ok, {n_rowsonly} rows-only, {n_fail} FAIL"
        + (f": {' '.join(failures)}" if failures else "")
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
