"""vectorsearch_scylla_spark — a PySpark-native analytics engine.

Re-expresses the dataflow surface of the reference IoT anomaly-detection
system (``tdenton8772/vectorsearch_scylla``) as idiomatic Spark
DataFrame / SQL / Structured Streaming operators, plus the large-scale
training-data-pipeline operators (dedup, ANN similarity search, text
analysis, multimodal plumbing) that a 100 TB deployment needs.

Design rules (see SURVEY.md §7):
- DataFrame/SQL first; Catalyst does the optimizing.
- No row-at-a-time Python UDFs on the hot path — cosine, z-score,
  rules, minhash are native column expressions (higher-order array
  functions); only model inference drops to ``mapInPandas``.
- Every batch operator is registered in ``plans.registry`` with a
  DuckDB-checkable SQL oracle.
"""

__version__ = "0.1.0"
