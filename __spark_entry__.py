"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over chicago_crime_spark_ml_spark.queries — the engine's query
catalog, where every SURVEY.md §2 operator is registered with a matching
DuckDB oracle (or marked rows-only for non-SQL-expressible ops).
"""

from __future__ import annotations

import glob
import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from chicago_crime_spark_ml_spark.queries import ORACLE, QUERIES

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["flagship_regional_revenue"](spark, SMOKE_SF_DIR)


def _previously_green() -> set[str]:
    """Query names with a hash-green row in any prior CORRECTNESS_r*.json.

    The driver checks a bounded prefix of queries() per round; rotating
    already-verified names to the back means every round spends its budget
    on queries that have never had a driver correctness row."""
    green: set[str] = set()
    here = os.path.dirname(os.path.abspath(__file__))
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if isinstance(row, dict) and row.get("hash_match"):
                green.add(name)
    return green


# Queries whose verification status changed THIS round — oracles fixed
# (the four round-2 dtype reds) or converted from rows-only to
# oracle-backed (the round-3 recall-check / per-row-oracle conversions).
# They jump the rotation queue so the driver's bounded per-round budget
# lands on the rows where fresh evidence matters most; once green they
# fall into the verified tier like everything else.
_ROUND_PRIORITY = [
    "late_shipment_priorities",
    "events_cumulative_users",
    "event_funnel_stages",
    "ansi_safe_arithmetic",
    "train_eval_embeddings",
    "prediction_calibration_bins",
    "ann_quantized_top10",
    "user_value_holt_forecast",
    "frequent_event_sequences",
    "acctbal_kll_quantiles",
    "doc_compression_ratio",
    "multimodal_feature_extract",
    "multimodal_resize",
    "multimodal_frame_sample",
    "multimodal_audio_envelope",
]


def _rotated(catalog: dict) -> dict:
    """Never-green first; within those, this round's status-changed
    queries, then oracle-backed before rows-only (a driver slot spent on
    an oracle-backed query yields a hash row, the strongest evidence
    class)."""
    from chicago_crime_spark_ml_spark.queries import ORACLE

    green = _previously_green()
    prio = {n: i for i, n in enumerate(_ROUND_PRIORITY)}

    def tier(k: str) -> tuple[int, int]:
        if k in green:
            return (3, 0)
        if k in prio:
            return (0, prio[k])
        return (1, 0) if k in ORACLE else (2, 0)

    return {
        k: catalog[k]
        for k in sorted(catalog, key=tier)
    }


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2,
    never-driver-verified entries first."""
    return _rotated(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each oracle-checkable query."""
    return _rotated(dict(ORACLE))


if __name__ == "__main__":
    from chicago_crime_spark_ml_spark import get_spark

    spark = get_spark("entry-smoke")
    df = entry(spark)
    df.show(10, truncate=False)
    print(f"{len(QUERIES)} queries, {len(ORACLE)} with oracles")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", SMOKE_SF_DIR)
    for name, fn in QUERIES.items():
        n = fn(spark, sf).count()
        print(f"  {name}: {n} rows")
