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


def holt_linear_forecast(
    df,
    key_col: str,
    time_col: str,
    value_col: str,
    alpha: float = 0.5,
    beta: float = 0.3,
    horizon: int = 1,
):
    """Holt's linear-trend exponential smoothing per series, forecasting
    ``horizon`` steps past the last observation:

        level_t = α·y_t + (1−α)(level_{t−1} + trend_{t−1})
        trend_t = β·(level_t − level_{t−1}) + (1−β)·trend_{t−1}

    The coupled recursion is order-dependent (not associative), so it
    cannot be a window aggregate; it runs as applyInPandas — one Arrow
    batch per key, state never leaves the group, series parallelism =
    key cardinality. That's the right 100 TB shape for per-entity
    models: millions of short series each fitting in one batch, NOT one
    giant series (for that, chunk + refit or use the EWMA offset-explode
    form already in the catalog). Initialization: level₀ = y₀,
    trend₀ = y₁ − y₀ (0 for singleton series).

    Returns one row per key: (key, n_obs, level, trend, forecast).
    NumPy-reference-tested in tests/test_properties.py.
    """
    import pandas as pd  # noqa: PLC0415

    out_schema = (
        f"{key_col} long, n_obs long, level double, trend double, "
        "forecast double"
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(time_col, kind="mergesort")
        y = pdf[value_col].astype(float).to_numpy()
        level = y[0]
        trend = (y[1] - y[0]) if len(y) > 1 else 0.0
        for t in range(1, len(y)):
            prev = level
            level = alpha * y[t] + (1 - alpha) * (level + trend)
            trend = beta * (level - prev) + (1 - beta) * trend
        return pd.DataFrame(
            {
                key_col: [pdf[key_col].iloc[0]],
                "n_obs": [len(y)],
                "level": [level],
                "trend": [trend],
                "forecast": [level + horizon * trend],
            }
        )

    return df.groupBy(key_col).applyInPandas(fit, schema=out_schema)
