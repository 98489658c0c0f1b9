"""Scalar expression helpers (column-in, column-out — always JVM-side).

These wrap pyspark.sql.functions compositions the reference writes inline
(SURVEY.md §2.6) so they stay inside whole-stage codegen; none of them is
a Python UDF.
"""

from chicago_crime_spark_ml_spark.functions.scalar import (
    cyclical_cos,
    cyclical_sin,
    distance_from_km,
    is_weekend,
    json_get,
    temporal_parts,
)

__all__ = [
    "cyclical_sin",
    "cyclical_cos",
    "distance_from_km",
    "is_weekend",
    "json_get",
    "temporal_parts",
]
