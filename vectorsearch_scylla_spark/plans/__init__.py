from vectorsearch_scylla_spark.plans.registry import REGISTRY, Query, spark_queries, oracle_queries

__all__ = ["REGISTRY", "Query", "spark_queries", "oracle_queries"]
