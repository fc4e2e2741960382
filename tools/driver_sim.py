#!/usr/bin/env python
"""Replay the external driver's correctness gate locally.

Drives `__spark_entry__.py` (entry / queries / oracle_sql) with a PLAIN
SparkSession — deliberately not our tuned `get_spark`, because the
grading driver does not apply our configs and session-dependent
behavior is the #1 regression class — and compares every query against
its DuckDB oracle the way the driver does (sorted columns, sorted rows,
9-decimal float rounding, NaN folded to a token).

    python tools/driver_sim.py                 # sf0.01, all queries
    python tools/driver_sim.py --sf-dir /root/testdata/sf0.001
    python tools/driver_sim.py --only retention_sweep knn_bruteforce

Exit code 0 iff every checked query matches (NOORACLE rows are listed
but don't fail — the driver records those as weaker rows-only checks).
"""

from __future__ import annotations

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else round(v + 0.0, 9)
    return v


def _row_key(row):
    """Sort key robust to NULLs and mixed types: Python 3 refuses to
    order None against anything, and a nullable column with a NULL in
    one row would crash the plain tuple sort.  (None-ness, type name,
    str) is totally ordered, and within one (type, str) key the values
    are equal for every type the queries emit — so two equal multisets
    sort into identical sequences and the list equality stays exact."""
    return tuple((v is None, type(v).__name__, str(v)) for v in row)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--only", nargs="*", default=None,
        help="restrict to these query names (default: all)",
    )
    ap.add_argument(
        "--skip-entry", action="store_true",
        help="skip the entry() smoke check",
    )
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .appName("driver-sim")
        # non-UTC on purpose: catches session-tz-dependent expressions
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    import __spark_entry__ as e

    if not args.skip_entry:
        print("ENTRY rows:", e.entry(spark).count())

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'"
        )

    oracles = e.oracle_sql()
    queries = e.queries()
    if args.only:
        unknown = sorted(set(args.only) - set(queries))
        if unknown:
            # a typo'd --only must not produce a green "FAILS: 0 / 0"
            print(f"unknown query names in --only: {unknown}", file=sys.stderr)
            return 2
    fails = 0
    checked = 0
    for name, fn in queries.items():
        if args.only and name not in args.only:
            continue
        sdf = fn(spark, args.sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        scols = sdf.columns
        osql = oracles.get(name)
        if osql is None:
            print("NOORACLE", name, len(srows))
            continue
        checked += 1
        res = con.execute(osql)
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        o_s = sorted(range(len(scols)), key=lambda i: scols[i])
        o_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
        ms = sorted(
            (tuple(_norm(r[i]) for i in o_s) for r in srows), key=_row_key
        )
        md = sorted(
            (tuple(_norm(r[i]) for i in o_d) for r in drows), key=_row_key
        )
        ok = (
            sorted(scols) == sorted(dcols)
            and len(srows) == len(drows)
            and ms == md
        )
        if not ok:
            fails += 1
            diff = [(a, b) for a, b in zip(ms, md) if a != b][:2]
            print("FAIL", name, len(srows), "vs", len(drows), diff)
        else:
            print("OK ", name, len(srows))
    print(f"FAILS: {fails} / {checked}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
