from vectorsearch_scylla_spark.operators.window_pivot import (
    tumbling_window_snapshots,
    pivot_fixed_metrics,
)
from vectorsearch_scylla_spark.operators.profiles import build_profiles, metric_stats
from vectorsearch_scylla_spark.operators.knn import topk_similarity_join
from vectorsearch_scylla_spark.operators.serving import latest_per_key

__all__ = [
    "tumbling_window_snapshots",
    "pivot_fixed_metrics",
    "build_profiles",
    "metric_stats",
    "topk_similarity_join",
    "latest_per_key",
]
