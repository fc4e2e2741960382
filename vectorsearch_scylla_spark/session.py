"""SparkSession factory tuned for this engine.

Local testing runs on ``local[N]``; the same config block is what we'd
ship to a 1000-executor cluster — AQE on (runtime skew-join + coalesce),
adaptive shuffle partitions, Arrow for the few pandas-UDF paths, UTC
timestamps everywhere (the reference mixes naive/aware timestamps and
patches at read, ``dashboard/app.py:203-204`` — we standardize instead).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# At cluster scale spark.sql.shuffle.partitions should be ~2-3x total
# cores (or left to AQE coalescing, which we enable).  Locally, match
# the core count so tests don't create thousands of tiny tasks.
_DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "vectorsearch-scylla-spark", cpus: str | int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-ready defaults."""
    cpus = str(cpus or _DEFAULT_CPUS)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # --- correctness-critical ---
        .config("spark.sql.session.timeZone", "UTC")
        # driver testdata writes events.ts as TIMESTAMP(NANOS); Spark has
        # no nanos timestamp — read as long and convert in the loader
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # --- adaptive execution: runtime plan fixes at scale ---
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", cpus)
        # --- broadcast small dims (profiles, rules, fleet config) ---
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # --- Arrow for the pandas-UDF paths (embedding inference, kNN blocks) ---
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # --- keep the driver lean; results are written, not collected ---
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # many large generated-code queries in one JVM exhaust the
        # default ~240 MB code cache → JIT disables itself and every
        # subsequent query runs interpreted (observed 10-50× slowdowns
        # late in a bench run).  Reserve enough for the whole suite.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing",
        )
        .config("spark.ui.enabled", "false")
        # the console progress bar interleaves \r frames with stdout,
        # corrupting bench/driver log lines
        .config("spark.ui.showConsoleProgress", "false")
    )
    return builder.getOrCreate()
