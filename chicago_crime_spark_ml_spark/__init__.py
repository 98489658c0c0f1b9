"""PySpark-native analytics engine with the query/data-processing surface of
reemzouhby/Chicago_crime_spark_ML, rebuilt Spark-first.

The reference (see /root/reference, SURVEY.md) is an end-to-end batch ML
application over one flat table. This package re-expresses that surface —
plus large-scale training-data-pipeline operators (dedup, similarity search,
multimodal columns, text analysis) — as named, typed, composable operators
over the public PySpark DataFrame/SQL API, designed for a 1000-executor
cluster reading ~100 TB even though CI runs on local[32].

Design stance (SURVEY.md §7):
- DataFrame/SQL only; Catalyst+Tungsten pick physical strategy.
- Parquet-first IO, predicate pushdown + column pruning preserved.
- Broadcast joins for small dims (asserted in tests), AQE on.
- No driver-side full-table collects; UDFs only where built-ins can't
  express the semantics, and then Arrow-batched pandas UDFs.
"""

from chicago_crime_spark_ml_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
