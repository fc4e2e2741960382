"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship Path-2 profile-similarity anomaly
detection end-to-end at sf0.001; ``queries()`` / ``oracle_sql()``
expose every operator registered in
``vectorsearch_scylla_spark.plans.registry`` (one entry per SURVEY.md
§2 operator family, each with a DuckDB-checkable SQL oracle).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vectorsearch_scylla_spark.plans.registry import (  # noqa: E402
    REGISTRY,
    oracle_queries,
    spark_queries,
)

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY["path2_anomaly"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return spark_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL for each query (same column names)."""
    return oracle_queries()
