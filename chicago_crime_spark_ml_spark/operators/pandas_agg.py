"""Grouped-aggregate pandas UDAFs — the GROUPED_AGG tier of the Python
surface.

The engine's Python-boundary ladder (README "Python only off the hot
path"): JVM Column algebra first, then Arrow-batched pandas UDFs where
semantics genuinely need Python. This module covers the one UDF flavor
the rest of the engine didn't yet exercise: ``pandas_udf`` returning a
SCALAR PER GROUP (Spark's PandasUDFType.GROUPED_AGG), which rides the
partial-aggregation machinery — each group's columns arrive as Arrow
arrays, the result is a single value, and Spark shuffles only group
keys + inputs (no per-row Python round trips).

Determinism contract: these aggregates SELECT existing values (order
statistics over exact-integer cumulative weights) rather than computing
new floats, so results are bit-identical to the window-SQL oracle."""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def weighted_median(v: pd.Series, w: pd.Series) -> float:
    """Lower weighted median: the smallest v whose cumulative weight
    (in ascending-v order) reaches half the total weight. Equivalent
    window SQL (the oracle): sort by v, running sum(w), pick
    min(v) where cum ≥ total/2. Weights are exact integers, the
    comparison threshold is total/2.0 — no float accumulation, so the
    selected value is bit-identical across engines."""
    df = pd.DataFrame({"v": v, "w": w}).sort_values("v", kind="mergesort")
    cum = df["w"].cumsum()
    half = float(df["w"].sum()) / 2.0
    return float(df.loc[cum >= half, "v"].iloc[0])
