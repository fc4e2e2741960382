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
    return 0


if __name__ == "__main__":
    sys.exit(main())
