"""Plan-shape tests — the 100 TB contract, asserted on the actual
physical plans (SURVEY.md §4: broadcast where expected, pushdown reaching
the scan, top-k without full sort, partial aggregation)."""

from __future__ import annotations

from chicago_crime_spark_ml_spark.plans import (
    assert_broadcast_join,
    assert_pushed_filters,
    explain_str,
)
from chicago_crime_spark_ml_spark.queries import QUERIES


def test_flagship_broadcasts_dims(spark, sf_dir):
    # nation/region (and customer at test scale) must broadcast — a
    # sort-merge join against a 25-row dim would shuffle the fact table
    assert_broadcast_join(QUERIES["flagship_regional_revenue"](spark, sf_dir))


def test_group_count_feature_broadcasts(spark, sf_dir):
    assert_broadcast_join(QUERIES["customer_order_count_feature"](spark, sf_dir))


def test_brand_filter_pushed_to_scan(spark, sf_dir):
    df = QUERIES["parts_brand_filter"](spark, sf_dir)
    assert_pushed_filters(df, "p_size")
    assert_pushed_filters(df, "p_brand")


def test_pricing_summary_partial_agg(spark, sf_dir):
    df = QUERIES["pricing_summary"](spark, sf_dir)
    plan = explain_str(df, "simple")
    # partial (map-side) + final hash aggregation around ONE exchange
    assert plan.count("HashAggregate") >= 2
    assert "partial_sum" in plan
    assert plan.count("Exchange") == 1


def test_topk_avoids_full_sort(spark, sf_dir):
    plan = explain_str(QUERIES["top10_orders"](spark, sf_dir), "simple")
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan  # no global sort operator


def test_scan_prunes_columns(spark, sf_dir):
    # projection must reach the parquet reader: a 3-column select over
    # the 11-column lineitem reads 3 columns, not 11
    df = QUERIES["top10_orders"](spark, sf_dir)
    plan = explain_str(df, "formatted")
    scan = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan, plan
    assert "o_orderkey" in scan[0] and "o_orderstatus" not in scan[0]
