"""The three anomaly-detection paths + consensus, as pure column logic.

Reference (SURVEY §2.2, docs/THREE_DETECTION_PATHS.md):
- Path 1 — statistical/threshold rules: per-(device_type, metric)
  min/max bounds with severity (``pipeline/detect_anomalies_rules.py:
  28-67``, P2) and cross-metric relationship predicates (``:70-91``,
  P3); z-score outliers ``abs((v-mean)/std) > σ`` skipping std≤0
  (``pipeline/anomaly_detection.py:47-73``, P4); fires on ≥ N outlier
  metrics (``anomaly_detection.py:17-18``, P5).
- Path 2 — profile similarity: cosine(snapshot embedding, profile
  centroid) < threshold (``anomaly_detection.py:76-88``, P6).
- Path 3 — inverted ANN: fewer than K similar *normal* neighbors in
  recent history ⇒ novel state (``pipeline/path3_vector_search.py:
  160-170``, P7/P8).
- Consensus: anomalous iff ≥ 2 of 3 paths vote
  (``pipeline/detect_anomalies_all.py:218-231``, A10).
- Score: ``max(0, 1−sim) + min(1, Σ min(10, z) / 40)``
  (``anomaly_detection.py:142-148``, A11).

Everything here is expression-only (joins + column math): at scale each
path is a broadcast join against a tiny dimension (profiles / rules)
plus per-row arithmetic inside whole-stage codegen — no Python, no
extra shuffle beyond what the kNN join in Path 3 already does.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vectorsearch_scylla_spark.functions.vector import cosine_similarity
from vectorsearch_scylla_spark.operators.knn import topk_similarity_join


# ---------------------------------------------------------------- Path 1

def threshold_violations(
    exploded_metrics: DataFrame,
    rules: DataFrame,
    on: list[str] | None = None,
) -> DataFrame:
    """P2: join metric rows against a (metric bounds) rules dimension and
    flag out-of-range values with severity.

    ``rules`` columns: join keys + ``min_value``, ``max_value``,
    ``critical`` (bool).  Mirrors ``DEVICE_RULES``
    (``pipeline/detect_anomalies_rules.py:28-67,136-167``) with the
    rules externalized to a broadcastable table (FIXTURES.md §5).
    """
    on = on or ["metric_name"]
    joined = exploded_metrics.join(F.broadcast(rules), on=on, how="inner")
    violation = (F.col("metric_value") < F.col("min_value")) | (
        F.col("metric_value") > F.col("max_value")
    )
    return joined.withColumn("is_violation", violation).withColumn(
        "severity",
        F.when(~violation, F.lit(None).cast("string")).otherwise(
            F.when(F.col("critical"), F.lit("CRITICAL")).otherwise(F.lit("WARNING"))
        ),
    )


def zscore_outliers(
    exploded_metrics: DataFrame,
    stats: DataFrame,
    sigma: float = 6.0,
    on: list[str] | None = None,
) -> DataFrame:
    """P4: z = (v − mean)/std per metric; outlier iff |z| > sigma and
    std > 0 (``pipeline/anomaly_detection.py:47-73`` — std≤0 skipped).

    ``stats`` columns: join keys + ``mean``, ``std``.  Also emits the
    deviation%: ``(v-mean)/mean*100`` guarded ÷0
    (``pipeline/detect_anomalies.py:155``, F11).
    """
    on = on or ["device_id", "metric_name"]
    joined = exploded_metrics.join(stats, on=on, how="inner")
    z = F.when(
        F.col("std") > 0.0, (F.col("metric_value") - F.col("mean")) / F.col("std")
    )
    return (
        joined.withColumn("z", z)
        .withColumn("is_outlier", F.coalesce(F.abs(F.col("z")) > sigma, F.lit(False)))
        .withColumn(
            "deviation_pct",
            F.when(
                F.col("mean") != 0.0,
                (F.col("metric_value") - F.col("mean")) / F.col("mean") * 100.0,
            ),
        )
    )


def path1_vote(outliers_per_snapshot: Column, min_outliers: int = 4) -> Column:
    """P5: Path 1 fires iff ≥ min_outliers outlier metrics
    (``pipeline/anomaly_detection.py:17-18,127-131``)."""
    return outliers_per_snapshot >= min_outliers


# ---------------------------------------------------------------- Path 2

def path2_similarity(
    snapshots: DataFrame,
    profiles: DataFrame,
    threshold: float = 0.93,
    key: str = "device_id",
    vec_col: str = "embedding",
    profile_vec_col: str = "profile_embedding",
) -> DataFrame:
    """P6/J1: broadcast-join profiles, cosine to centroid, flag < threshold.

    Threshold default 0.93 = the consumer's live value
    (``pipeline/anomaly_detection.py:19``); batch variants use 0.85 /
    0.75 (``detect_anomalies.py:28``, ``detect_anomalies_vector_search
    .py:29``).
    """
    joined = snapshots.join(F.broadcast(profiles.select(key, profile_vec_col)), key, "left")
    sim = cosine_similarity(vec_col, profile_vec_col)
    return joined.withColumn("similarity", sim).withColumn(
        "path2_triggered",
        F.when(F.col(profile_vec_col).isNull(), F.lit(False)).otherwise(
            F.col("similarity") < threshold
        ),
    )


# ---------------------------------------------------------------- Path 3

def path3_novelty(
    snapshots: DataFrame,
    history: DataFrame,
    k: int = 10,
    min_matches: int = 7,
    sim_threshold: float = 0.85,
    id_col: str = "snapshot_id",
    key: str = "device_id",
    vec_col: str = "embedding",
    anomaly_col: str = "is_anomalous",
) -> DataFrame:
    """P7/P8: for each snapshot, count same-device *normal* neighbors with
    cosine ≥ sim_threshold among its top-k; fewer than ``min_matches``
    ⇒ novel/anomalous.

    The reference over-fetches a global ANN top-k then client-filters
    (same device, not anomalous, exclude self —
    ``pipeline/path3_vector_search.py:135-159``); here the filters are
    pushed *into* the join input so the top-k is computed over exactly
    the eligible set (SURVEY §4.4: Spark improves on ScyllaDB's
    no-WHERE-with-ANN limitation).
    """
    eligible = history.filter(~F.coalesce(F.col(anomaly_col), F.lit(False)))
    # Same-device constraint pushed INTO the join predicate (join_keys)
    # so the top-k ranks only eligible same-device neighbors.
    matches = topk_similarity_join(
        queries=snapshots.select(
            F.col(id_col).alias("query_id"), F.col(key), F.col(vec_col).alias("query_vec")
        ),
        corpus=eligible.select(
            F.col(id_col).alias("corpus_id"), F.col(key), F.col(vec_col).alias("corpus_vec")
        ),
        k=k,
        exclude_self=True,
        threshold=None,
        join_keys=[key],
    )
    # count qualifying matches per query
    counts = (
        matches.filter(F.col("similarity") >= sim_threshold)
        .groupBy("query_id")
        .agg(F.count("*").alias("similar_count"))
    )
    return snapshots.join(
        counts, snapshots[id_col] == counts["query_id"], "left"
    ).select(
        snapshots["*"],
        F.coalesce(F.col("similar_count"), F.lit(0)).alias("similar_count"),
    ).withColumn("path3_triggered", F.col("similar_count") < min_matches)


# ------------------------------------------------------------- Combining

def consensus_vote(p1: Column, p2: Column, p3: Column, min_votes: int = 2) -> Column:
    """A10: anomalous iff ≥ min_votes of the three paths fire
    (``pipeline/detect_anomalies_all.py:218-231``)."""
    as_int = lambda c: F.when(F.coalesce(c, F.lit(False)), 1).otherwise(0)  # noqa: E731
    return (as_int(p1) + as_int(p2) + as_int(p3)) >= min_votes


def anomaly_score(similarity: Column, z_values: Column) -> Column:
    """A11: ``max(0, 1−sim) + min(1, Σ min(10, z) / 40)`` where z_values
    is an array of |z| scores (``pipeline/anomaly_detection.py:142-148``)."""
    sim_part = F.greatest(F.lit(0.0), F.lit(1.0) - similarity)
    z_sum = F.aggregate(
        z_values, F.lit(0.0), lambda acc, z: acc + F.least(F.lit(10.0), z)
    )
    return sim_part + F.least(F.lit(1.0), z_sum / F.lit(40.0))
