"""CLI runner: execute any registered query by name.

    python -m vectorsearch_scylla_spark <query> [--sf-dir DIR] [--show N]
    python -m vectorsearch_scylla_spark --list

A user of the reference drives its pipeline scripts one at a time
(``python pipeline/detect_anomalies.py`` ...); this is the equivalent
surface for the Spark engine — every operator in ``plans.registry`` is
runnable standalone, printing the first rows and the row count.
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main(argv: list[str] | None = None) -> int:
    from vectorsearch_scylla_spark.plans.registry import REGISTRY

    ap = argparse.ArgumentParser(
        prog="vectorsearch_scylla_spark", description=__doc__
    )
    ap.add_argument("query", nargs="?", help="registered query name")
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
        help="test-table directory (default $SPARK_GRAFT_SF_DIR or sf0.01)",
    )
    ap.add_argument("--show", type=int, default=20, help="rows to print")
    ap.add_argument("--explain", action="store_true", help="print the physical plan")
    ap.add_argument("--list", action="store_true", help="list registered queries")
    ap.add_argument(
        "--check",
        action="store_true",
        help="also run the DuckDB oracle and compare (the correctness gate)",
    )
    args = ap.parse_args(argv)

    if args.list or not args.query:
        for name, q in REGISTRY.items():
            doc = " ".join((q.doc or "").split())
            print(f"{name:32s} {doc[:90]}")
        return 0
    if args.query not in REGISTRY:
        print(f"unknown query {args.query!r}; --list shows all", file=sys.stderr)
        return 2

    from vectorsearch_scylla_spark.session import get_spark

    spark = get_spark(f"vss-cli-{args.query}")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()
    df = REGISTRY[args.query].fn(spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    df.show(args.show, truncate=False)
    n = df.count()
    print(f"{args.query}: {n} rows in {time.perf_counter() - t0:.2f}s")
    if args.check:
        return _check(df, REGISTRY[args.query].oracle, args)
    return 0


def _check(df, oracle_sql: str | None, args) -> int:
    """Run the DuckDB oracle and compare (sorted columns, normalized
    floats, order-insensitive value multiset) — the same gate the
    external driver and tests/test_oracle_parity.py apply."""
    import math

    import duckdb

    if oracle_sql is None:
        print("no SQL oracle registered for this query (rows-only check)")
        return 0
    con = duckdb.connect()
    tables = [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(args.sf_dir, t)}.parquet'"
        )

    def norm(v):
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else round(v + 0.0, 9)
        return v

    res = con.execute(oracle_sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    scols = df.columns
    srows = [tuple(r) for r in df.collect()]
    o_s = sorted(range(len(scols)), key=lambda i: scols[i])
    o_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
    ms = sorted(tuple(norm(r[i]) for i in o_s) for r in srows)
    md = sorted(tuple(norm(r[i]) for i in o_d) for r in drows)
    ok = sorted(scols) == sorted(dcols) and ms == md
    print(
        f"oracle check: {'MATCH' if ok else 'MISMATCH'} "
        f"(spark {len(srows)} rows vs duckdb {len(drows)})"
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
