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
    import inspect

    tunable = sorted(
        n
        for n, q in REGISTRY.items()
        if {"k", "nprobe", "n_bands"} & set(inspect.signature(q.fn).parameters)
    )
    ann = ap.add_argument_group(
        "ANN tuning",
        "recall/cost knobs, passed through only if the query's function "
        f"accepts them; tunable queries: {', '.join(tunable)}",
    )
    ann.add_argument("--k", type=int, help="neighbors per query (top-k)")
    ann.add_argument(
        "--nprobe", type=int, help="IVF clusters probed per query"
    )
    ann.add_argument(
        "--bands", type=int, help="LSH band count (lsh_knn)"
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

    # ANN knob pass-through: forward only the flags the query's
    # function actually accepts (inspect the signature), and refuse
    # --check under overrides — the SQL oracle is pinned to the
    # registered defaults, so a tuned run has nothing to compare to
    fn = REGISTRY[args.query].fn
    accepted = inspect.signature(fn).parameters
    requested = {"k": args.k, "nprobe": args.nprobe, "n_bands": args.bands}
    overrides = {
        name: v
        for name, v in requested.items()
        if v is not None and name in accepted
    }
    ignored = [
        flag
        for flag, (name, v) in zip(
            ["--k", "--nprobe", "--bands"], requested.items()
        )
        if v is not None and name not in accepted
    ]
    if ignored:
        print(
            f"note: {', '.join(ignored)} not supported by {args.query}; ignored",
            file=sys.stderr,
        )
    if overrides and args.check:
        print(
            "--check is pinned to the registered defaults; drop the "
            "tuning flags to oracle-compare",
            file=sys.stderr,
        )
        return 2

    spark = get_spark(f"vss-cli-{args.query}")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()
    df = fn(spark, args.sf_dir, **overrides)
    if args.explain:
        df.explain("formatted")
    # ONE plan execution either way, and a bounded driver footprint
    # when not checking: --check needs the full result driver-side
    # (collect once, reuse for show/count/compare); without it the
    # result stays distributed — persist, count (materializes the
    # cache), then take the display rows from the cache.  Never
    # show+count+collect as three separate plan executions.
    if args.check:
        rows = df.collect()
        elapsed = time.perf_counter() - t0
        n = len(rows)
        shown = rows[: args.show]
    else:
        df.persist()
        n = df.count()
        elapsed = time.perf_counter() - t0
        shown = df.take(args.show)
    spark.createDataFrame(shown, df.schema).show(args.show, truncate=False)
    print(f"{args.query}: {n} rows in {elapsed:.2f}s")
    rc = 0
    if args.check:
        rc = _check(df.columns, rows, REGISTRY[args.query].oracle, args)
    else:
        df.unpersist()
    return rc


def _check(spark_cols, spark_rows, oracle_sql: str | None, args) -> int:
    """Run the DuckDB oracle and compare via the SHARED gate helper
    (vectorsearch_scylla_spark.oracle) — the same normalization
    tests/test_oracle_parity.py applies, so the two gates cannot
    drift."""
    import duckdb

    from vectorsearch_scylla_spark.oracle import compare_results
    from vectorsearch_scylla_spark.sources.tables import TABLES

    if oracle_sql is None:
        print("no SQL oracle registered for this query (rows-only check)")
        return 0
    con = duckdb.connect()
    # the SAME table list the pytest parity gate registers — a literal
    # copy here would let the two gates drift on view creation
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(args.sf_dir, t)}.parquet'"
        )
    res = con.execute(oracle_sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    srows = [tuple(r) for r in spark_rows]
    ok, reason = compare_results(spark_cols, srows, dcols, drows)
    print(
        f"oracle check: {'MATCH' if ok else 'MISMATCH'} "
        f"(spark {len(srows)} rows vs duckdb {len(drows)})"
        + (f" — {reason}" if reason else "")
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
