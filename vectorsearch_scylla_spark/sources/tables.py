"""Parquet table loaders for the driver test data, plus the mapping of
the generic ``events`` stream onto the reference's narrow IoT shape.

Reference data model (SURVEY.md §1): the raw table is one row per
(device_id, date, timestamp, metric_name, metric_value) —
``scylladb_setup/create_iot_schema.py:69-86`` — partition key
(device_id, date).  We derive the same shape from the driver's
``events`` table: user_id → device, event_type → metric_name,
value → metric_value.

At scale the physical layout would be Hive-partitioned parquet on
``date`` (partition pruning) with files sorted by (device_id, ts)
for min/max data skipping; the loaders here read the driver's flat
parquet but every downstream operator filters on the same columns so
pruning engages automatically once the layout is partitioned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one test table. Column pruning / predicate pushdown reach the
    scan because we return the raw DataFrame (no materialization).

    ``events.ts`` is TIMESTAMP(NANOS) in the source parquet, which Spark
    rejects by default; we enable the legacy nanos-as-long read at
    runtime (works on any caller-provided session, e.g. the driver's)
    and convert to a microsecond timestamp instant (integer division —
    exact, timezone-independent).
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str, register_views: bool = True) -> dict[str, DataFrame]:
    """Load every table; optionally register temp views so operators are
    also expressible through ``spark.sql`` (SURVEY.md §7.1)."""
    dfs = {name: load_table(spark, sf_dir, name) for name in TABLES}
    if register_views:
        for name, df in dfs.items():
            df.createOrReplaceTempView(name)
    return dfs


def device_metrics_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``events`` → the reference's ``device_metrics_raw`` shape.

    Mirrors the Kafka message format of
    ``pipeline/kafka_producer.py:149-158`` (device_id, timestamp,
    metric_name, metric_value, + denormalized device metadata) and the
    raw table DDL ``scylladb_setup/create_iot_schema.py:69-86``.

    ``date`` is the reference's partition bucket
    (``strftime('%Y-%m-%d')``, ``pipeline/kafka_consumer.py:295``).
    """
    # Read the parquet directly (not via load_table's eager ts
    # conversion) so the raw int64-nanos column survives: predicates on
    # it (epoch × 1e9 literals) push down to the parquet scan, which
    # predicates on the converted timestamp cannot (they sit behind
    # arithmetic the pushdown rule can't invert).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(ev.dtypes).get("ts") == "bigint":
        ev = ev.withColumn("__ts_ns", F.col("ts")).withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    else:
        ev = ev.withColumn(
            "__ts_ns", F.unix_timestamp("ts").cast("long") * F.lit(1_000_000_000)
        )
    return ev.select(
        F.concat(F.lit("DEV-"), F.lpad(F.col("user_id").cast("string"), 3, "0")).alias("device_id"),
        F.date_format("ts", "yyyy-MM-dd").alias("date"),
        F.col("ts").alias("timestamp"),
        F.col("__ts_ns").alias("ts_ns"),
        F.col("event_type").alias("metric_name"),
        F.round(F.col("value"), 2).alias("metric_value"),
        F.col("event_id"),
    )
