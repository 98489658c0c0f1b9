"""Feature-engineering operators — SURVEY.md §2.6/§2.7 as one shared,
drift-free module.

The reference implements its feature pipeline TWICE — distributed for
training (/root/reference/XGBoost.py:83-132) and a NumPy twin for serving
(Stramlit_app.py:123-136) — a classic drift bug farm. Here there is ONE
expression-level definition; serving runs the same code on a 1-row
DataFrame (or extracts the expressions). Everything is pure Column
algebra: map-only, no shuffle (asserted in tests), full codegen.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from chicago_crime_spark_ml_spark.functions.scalar import (
    cyclical_cos,
    cyclical_sin,
    distance_from_km,
    is_weekend,
    temporal_parts,
)


def add_temporal_features(
    df: DataFrame, ts_col: str, prefix: str = ""
) -> DataFrame:
    """Year/Month/Hour/DayOfWeek in one select
    (/root/reference/Preprocessing.py:234-237, XGBoost.py:83-86).
    DayOfWeek uses Spark's 1=Sunday…7=Saturday convention — the
    convention the reference's trained model depends on."""
    parts = temporal_parts(ts_col)
    return df.select(
        "*",
        *[expr.alias(f"{prefix}{name}") for name, expr in parts.items()],
    )


def add_cyclical_features(
    df: DataFrame, col: str, period: float, prefix: str | None = None
) -> DataFrame:
    """sin/cos cyclical encoding (XGBoost.py:119-120 generalized)."""
    p = prefix or col
    return df.withColumns(
        {
            f"{p}_sin": cyclical_sin(col, period),
            f"{p}_cos": cyclical_cos(col, period),
        }
    )


def add_distance_feature(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    point: tuple[float, float],
    out_col: str = "distance_from_center",
) -> DataFrame:
    """Distance-from-fixed-point feature (XGBoost.py:124-132)."""
    return df.withColumn(out_col, distance_from_km(lat_col, lon_col, point))


def add_weekend_flag(
    df: DataFrame, dayofweek_col: str, out_col: str = "is_weekend"
) -> DataFrame:
    """IsWeekend flag on Spark dayofweek (XGBoost.py:121-122)."""
    return df.withColumn(out_col, is_weekend(dayofweek_col))


def add_boolean_flag(
    df: DataFrame,
    col: str,
    true_values: Sequence[str],
    out_col: str,
) -> DataFrame:
    """String→{0.0,1.0} flag (Arrest_Flag, XGBoost.py:91-92). The
    reference matches lowercase 'true' here but 'True' in Preprocessing —
    callers pass the exact value set they mean."""
    return df.withColumn(
        out_col,
        F.when(F.col(col).isin(list(true_values)), 1.0).otherwise(0.0),
    )
