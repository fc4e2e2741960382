"""Replicates the driver's correctness gate locally: run every
registered query through Spark AND its DuckDB oracle on the same
parquet tables, then compare row count, column names, and an
order-insensitive value multiset.

This is the engine's primary regression suite (the reference ships no
tests at all — SURVEY.md §5 — so the oracle harness IS the test
strategy).
"""

from __future__ import annotations

import math

import duckdb
import pytest

from vectorsearch_scylla_spark.plans.registry import REGISTRY
from vectorsearch_scylla_spark.sources.tables import TABLES


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 and re-round to absorb 1-ulp printing differences
        return round(v + 0.0, 9)
    if isinstance(v, bool):
        return bool(v)
    return v


def _multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(
        tuple(_norm(r[i]) for i in order) for r in rows
    )


@pytest.mark.parametrize("name", [n for n, q in REGISTRY.items() if q.oracle])
def test_query_matches_oracle(spark, sf_dir, name):
    q = REGISTRY[name]
    sdf = q.fn(spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = _duck(sf_dir)
    res = con.execute(q.oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    con.close()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    ms_s = _multiset(spark_rows, spark_cols)
    ms_d = _multiset(duck_rows, duck_cols)
    if ms_s != ms_d:
        diff = [(a, b) for a, b in zip(ms_s, ms_d) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diff}")


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()).issubset(set(e.queries()))

def test_driver_window_exposure_order():
    """Pin the driver-window contract: the external harness checks only
    the first 50 entries of queries()/oracle_sql(), so those slots must
    hold exactly DRIVER_WINDOW (the never-driver-checked + changed +
    flagship set), and the full exposure must cover the registry with
    no duplicates."""
    from vectorsearch_scylla_spark.plans.registry import (
        DRIVER_WINDOW,
        spark_queries,
    )

    missing = [n for n in DRIVER_WINDOW if n not in REGISTRY]
    assert not missing, f"DRIVER_WINDOW names not in REGISTRY: {missing}"
    assert len(DRIVER_WINDOW) == len(set(DRIVER_WINDOW)) == 50

    exposed = list(spark_queries())
    assert exposed[:50] == DRIVER_WINDOW
    assert sorted(exposed) == sorted(REGISTRY)
