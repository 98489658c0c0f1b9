"""Golden-profile test: raw CSV ingest → clean pipeline replaying the
reference's end-to-end cleaning semantics on a synthetic dirty crime CSV
(FIXTURES.md §B), asserting the count invariants the reference only
eyeballed in console output (SURVEY.md §5.3)."""

from __future__ import annotations

import csv

from pyspark.sql import functions as F

from chicago_crime_spark_ml_spark.operators.cleaning import (
    clean_strings_pipeline,
    parse_timestamp_quarantine,
)
from chicago_crime_spark_ml_spark.sources.io import read_csv_raw

HEADER = ["_c0", "ID", "Date", "Primary Type", "Arrest", "Ward", "District"]
ROWS = [
    ["0", "100", "07/15/2003 11:30:00 PM", "THEFT", "True", "10", "5"],
    ["1", "101", "01/02/2001 01:00:00 AM", "BATTERY", "true", "NULL", "7"],
    ["2", "102", "13/45/2003 99:99:99", "THEFT", "False", "20", "5"],  # bad date
    ["3", "ID", "Date", "Primary Type", "Arrest", "Ward", "District"],  # header row
    ["4", "103", "06/30/2004 10:15:00 AM", "NARCOTICS", "false", "", "9"],
    ["5", "103", "06/30/2004 10:15:00 AM", "NARCOTICS", "false", "", "9"],  # dup*
    ["6", "104", "11/01/2002 08:00:00 AM", "THEFT", "True", "30", ""],  # no district
]
# * not an exact dup after _c0 differs — becomes one once _c0 is dropped


def test_csv_golden_profile(spark, tmp_path):
    path = str(tmp_path / "crimes_raw.csv")
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(HEADER)
        w.writerows(ROWS)

    raw = read_csv_raw(spark, path)  # header=True, all strings, _c0 dropped
    assert raw.columns == HEADER[1:]
    assert dict(raw.dtypes)["Ward"] == "string"
    assert raw.count() == 7

    clean = clean_strings_pipeline(
        raw,
        probe_col="ID",
        cast_schema={"Ward": "double", "District": "double"},
        bool_cols=["Arrest"],
        dropna_subset=["District"],
    )
    # 7 − header − exact-dup − missing-district = 4
    assert clean.count() == 4

    good, bad = parse_timestamp_quarantine(
        clean, "Date", "MM/dd/yyyy hh:mm:ss a", out_col="ts"
    )
    assert good.count() == 3  # 100, 101, 103
    assert bad.count() == 1  # 102's impossible date quarantined, not dropped
    ids = {r.ID for r in good.collect()}
    assert ids == {"100", "101", "103"}


def test_crimes_datasource_connector(spark):
    """Python DataSource API connector: partition-count-invariant
    deterministic generation, known dirt classes, and the cleaning
    pipeline consumes it exactly like the CSV path."""
    from chicago_crime_spark_ml_spark.sources import crimes_source

    crimes_source.register(spark)

    def load(parts):
        return (
            spark.read.format("crimes_synthetic")
            .option("rows", 500).option("partitions", parts).load()
        )

    a = sorted(map(tuple, load(4).collect()))
    b = sorted(map(tuple, load(7).collect()))
    assert len(a) == 500
    assert a == b  # repartition-invariant: same data for any layout

    raw = load(4)
    assert dict(raw.dtypes)["Ward"] == "string"
    # dirt present at generation rates: embedded headers + bad dates + dups
    n_headers = raw.filter(F.col("ID") == "ID").count()
    n_bad_dates = raw.filter(F.col("Date") == "13/45/2003 99:99:99").count()
    assert n_bad_dates >= 1

    clean = clean_strings_pipeline(
        raw,
        probe_col="ID",
        cast_schema={"Ward": "double", "District": "double"},
        bool_cols=["Arrest"],
        dropna_subset=["District"],
    )
    good, bad = parse_timestamp_quarantine(
        clean, "Date", "MM/dd/yyyy hh:mm:ss a", out_col="ts"
    )
    # headers and dups removed by cleaning; bad dates quarantined not lost
    assert clean.count() <= 500 - n_headers
    assert bad.count() >= 1
    assert good.count() + bad.count() == clean.count()


def test_crimes_datasource_streaming(spark):
    """The same connector as a micro-batch stream (simpleStreamReader):
    bounded replay-deterministic offsets; streamed rows == batch rows."""
    from chicago_crime_spark_ml_spark.sources import crimes_source

    crimes_source.register(spark)
    stream = (
        spark.readStream.format("crimes_synthetic")
        .option("rows_per_batch", 100).option("max_rows", 250)
        .option("seed", 7).load()
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory").queryName("crimes_stream").start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = sorted(
        map(tuple, spark.sql("SELECT * FROM crimes_stream").collect())
    )
    assert len(streamed) == 250
    batch = sorted(map(tuple, (
        spark.read.format("crimes_synthetic")
        .option("rows", 250).option("seed", 7)
        .option("dup_every", 10**9).load().collect()
    )))
    assert streamed == batch
