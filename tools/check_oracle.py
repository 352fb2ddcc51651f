"""Local mirror of the driver's correctness gate.

Runs every ``queries()[name]`` on Spark and its ``oracle_sql()[name]`` on
DuckDB over the same sf dir, compares row count + column names + values.

Value compare is ORDER-INSENSITIVE and stricter than the driver is likely
to be: rows are canonicalized (columns sorted by name, floats repr'd
exactly, timestamps to ISO-µs) and multiset-compared. Any float that
differs at all is reported with the max abs delta so drift can be traced
to a non-deterministic expression and fixed at the source (see
operators/_util.py for the decimal-armor pattern).

Usage: python tools/check_oracle.py [--json OUT.json] [--slice ROUND]
       [sf_dir] [query ...]

``--slice ROUND`` selects a deterministic 50-key slice of keys that
have NEVER crossed a committed non-builder window (r8 verdict #5):
``tools/slice_seen.json`` banks the driver's frozen first-50 window
plus every previously committed slice's keys; candidates are the
sorted complement, rotated by ``(53·ROUND) mod n_candidates``, then
sampled at evenly spaced indices ``round(i·n/k)`` (no tail truncation
— the ADVICE r8 stride fix). With 383 keys this covers every key
within ~6 rounds instead of relying on the rotation constant; when
the complement empties the seen-set resets to slice-covered keys
only. ``--update-seen`` appends the selected keys to the seen file —
run it when committing the slice artifact.

``--json`` additionally writes the sweep as a driver-shaped artifact
(per-query rows_match/schema_match/hash_match/spark_rows/oracle_rows/err,
plus sec) so rounds can commit the full 93-query evidence
(CORRECTNESS_LOCAL_r{N}.json) even when the driver's own file stops at
its 50-entry budget.
"""

from __future__ import annotations

import json
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
    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    slice_round = None
    if "--slice" in argv:
        i = argv.index("--slice")
        slice_round = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    update_seen = "--update-seen" in argv
    if update_seen:
        argv.remove("--update-seen")
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    if slice_round is not None:
        seen_path = Path(__file__).parent / "slice_seen.json"
        seen_doc = json.loads(seen_path.read_text())
        keys = sorted(registry.all_queries())
        cand = [q for q in keys if q not in set(seen_doc["seen"])]
        if len(cand) < 50:
            # complement exhausted: keep the short remainder this round;
            # the NEXT update-seen resets to slice-coverage-only
            cand = cand or keys
        total, k = len(cand), min(50, len(cand))
        start = (53 * slice_round) % total
        rot = cand[start:] + cand[:start]
        only = {rot[round(i * total / k)] for i in range(k)}
        print(
            f"slice round={slice_round}: {len(only)}/{total} unseen "
            f"candidates ({len(keys)} registry keys, "
            f"{len(seen_doc['seen'])} already seen)"
        )
        if update_seen:
            seen_doc["seen"] = sorted(set(seen_doc["seen"]) | only)
            seen_path.write_text(json.dumps(seen_doc, indent=1) + "\n")
            print(f"updated {seen_path} → {len(seen_doc['seen'])} seen")

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
    report: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:
            n_fail += 1
            failures.append(name)
            report[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": None, "oracle_rows": None,
                "err": f"spark: {type(exc).__name__}: {exc}",
                "sec": round(time.time() - t0, 2),
            }
            print(f"FAIL  {name}: spark error: {type(exc).__name__}: {exc}")
            continue
        if name not in oracles:
            n_rowsonly += 1
            report[name] = {
                "rows_match": None, "schema_match": None, "hash_match": None,
                "spark_rows": len(sdf), "oracle_rows": None,
                "err": None, "rows_only": True,
                "sec": round(time.time() - t0, 2),
            }
            print(f"rows  {name}: {len(sdf)} rows (rows-only) [{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as exc:
            n_fail += 1
            failures.append(name)
            report[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": len(sdf),
                "oracle_rows": None, "err": f"duckdb: {exc}",
                "sec": round(time.time() - t0, 2),
            }
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
        report[name] = {
            "rows_match": len(sdf) == len(odf),
            "schema_match": scols == ocols,
            "hash_match": srows == orows,
            "spark_rows": len(sdf),
            "oracle_rows": len(odf),
            "err": "; ".join(problems) if problems else None,
            "sec": round(time.time() - t0, 2),
        }
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
    if json_out:
        Path(json_out).write_text(
            json.dumps(
                {
                    "sf_dir": sf_dir,
                    "slice": (
                        None
                        if slice_round is None
                        else {
                            "round": slice_round,
                            "rule": "rotate sorted keys by (53*round) % "
                            "total, take every total//50-th, first 50",
                            "keys": sorted(only),
                        }
                    ),
                    "note": (
                        "per-query 'sec' is ONE cold pass (Spark exec + "
                        "toPandas + DuckDB + compare) on a shared box — "
                        "external load swings single samples 2-5x; these "
                        "times verify correctness, not operator cost. For "
                        "cost, read BENCH_r*.json (median-of-3 warm)."
                    ),
                    "summary": {
                        "ok": n_pass, "rows_only": n_rowsonly, "fail": n_fail
                    },
                    "queries": report,
                },
                indent=2,
            )
            + "\n"
        )
        print(f"wrote {json_out}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
