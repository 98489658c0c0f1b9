"""Unit tests for the cleaning layer on inline dirty crime-shaped data
(FIXTURES.md §B dirt catalog: "NULL" strings, embedded headers, duplicate
rows, unparseable dates, mixed-case booleans, missing values)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from chicago_crime_spark_ml_spark.operators.cleaning import (
    cast_booleans,
    cast_columns,
    clean_strings_pipeline,
    drop_embedded_header_rows,
    impute_median,
    normalize_nulls,
    parse_timestamp_quarantine,
)
from chicago_crime_spark_ml_spark.operators.relational import null_profile

DATE_FMT = "MM/dd/yyyy hh:mm:ss a"


@pytest.fixture(scope="module")
def dirty(spark):
    rows = [
        # ID, Date, Arrest, Ward, District
        ("1", "07/15/2003 11:30:00 PM", "True", "10", "5"),
        ("2", "01/02/2001 01:00:00 AM", "true", "NULL", "7"),
        ("3", "13/45/2003 99:99:99", "False", "20", "5"),  # bad date
        ("ID", "Date", "Arrest", "Ward", "District"),  # embedded header
        ("4", "06/30/2004 10:15:00 AM", "false", "", "9"),
        ("4", "06/30/2004 10:15:00 AM", "false", "", "9"),  # exact dup
        ("5", "NULL", "True", "30", "NULL"),
    ]
    return spark.createDataFrame(rows, ["ID", "Date", "Arrest", "Ward", "District"])


def test_normalize_nulls(dirty):
    out = normalize_nulls(dirty)
    assert out.filter(out.Ward.isNull()).count() == 3  # "NULL", "", "" dup
    assert out.filter(out.Date.isNull()).count() == 1
    # untouched values survive
    assert out.filter(out.Ward == "10").count() == 1


def test_drop_embedded_header_rows(dirty):
    out = drop_embedded_header_rows(dirty, "ID")
    assert out.count() == dirty.count() - 1
    assert out.filter(out.ID == "ID").count() == 0


def test_cast_columns_and_unknown_col(dirty):
    typed = cast_columns(dirty, {"Ward": "double", "District": "int"})
    dt = dict(typed.dtypes)
    assert dt["Ward"] == "double" and dt["District"] == "int"
    # non-numeric strings become NULL on cast: "NULL", "Ward" header, "" ×2
    assert typed.filter(typed.Ward.isNull()).count() == 4
    with pytest.raises(ValueError, match="not in DataFrame"):
        cast_columns(dirty, {"nope": "int"})


def test_cast_booleans_mixed_casing(dirty):
    out = cast_booleans(normalize_nulls(dirty), ["Arrest"])
    vals = {r.ID: r.Arrest for r in out.collect()}
    assert vals["1"] is True and vals["2"] is True  # 'True' AND 'true'
    assert vals["3"] is False and vals["4"] is False
    assert vals["ID"] is False  # header garbage → false (non-null input)


def test_parse_timestamp_quarantine(spark, dirty):
    clean = drop_embedded_header_rows(normalize_nulls(dirty), "ID")
    good, bad = parse_timestamp_quarantine(clean, "Date", DATE_FMT, out_col="ts")
    assert good.count() == 4  # rows 1,2,4,4dup
    assert bad.count() == 1  # the 13/45 date; NULL date row is in neither
    assert dict(good.dtypes)["ts"] == "timestamp"


def test_impute_median_exact_and_approx(spark):
    df = spark.createDataFrame(
        [Row(x=1.0), Row(x=2.0), Row(x=3.0), Row(x=None), Row(x=None)]
    )
    assert impute_median(df, ["x"], exact=True).filter("x = 2.0").count() == 3
    approx = impute_median(df, ["x"], rel_err=0.001)
    assert approx.filter(approx.x.isNull()).count() == 0


def test_null_profile_single_row(dirty):
    prof = null_profile(dirty).collect()[0]
    assert prof["Ward"] == 3  # "NULL" + "" + "" (dup)
    assert prof["Date"] == 1
    assert prof["ID"] == 0


def test_clean_pipeline_end_to_end(dirty):
    out = clean_strings_pipeline(
        dirty,
        probe_col="ID",
        cast_schema={"Ward": "double", "District": "double"},
        bool_cols=["Arrest"],
        dropna_subset=["District"],
    )
    rows = {r.ID: r for r in out.collect()}
    # dup collapsed, header dropped, District-null row (ID=5) dropped
    assert set(rows) == {"1", "2", "3", "4"}
    assert rows["2"].Arrest is True and rows["2"].Ward is None
    assert rows["4"].District == 9.0
    dt = dict(out.dtypes)
    assert dt["Ward"] == "double" and dt["Arrest"] == "boolean"


def test_dq_freshness_rule(spark):
    import datetime as dt

    from chicago_crime_spark_ml_spark.operators.dq import run_expectations

    df = spark.createDataFrame(
        [(1, dt.datetime(2026, 1, 10, 12, 0)), (2, dt.datetime(2026, 1, 9, 0, 0))],
        "id BIGINT, ts TIMESTAMP",
    )
    fresh = run_expectations(
        df,
        [{"type": "freshness", "column": "ts",
          "as_of": "2026-01-10 13:00:00", "max_age_seconds": 7200}],
    ).collect()[0]
    assert fresh.passed and fresh.violations == 0

    stale = run_expectations(
        df,
        [{"type": "freshness", "column": "ts",
          "as_of": "2026-01-12 00:00:00", "max_age_seconds": 3600}],
    ).collect()[0]
    assert not stale.passed and stale.violations == 2
