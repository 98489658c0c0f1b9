"""Sources & sinks.

The reference's only source is a headerful CSV read with
``inferSchema=False`` and a dropped pandas index column
(/root/reference/Preprocessing.py:20, XGBoost.py:45-49); its sinks are
driver-side JSON/PNG files. The engine is Parquet-first (columnar scan,
pushdown, pruning — what you want at 100 TB) and keeps a raw-string CSV
ingest mode for the reference's dirty-ingest semantics.
"""

from chicago_crime_spark_ml_spark.sources.io import (
    TABLES,
    load_table,
    load_tables,
    read_csv_raw,
    write_parquet,
)

__all__ = ["TABLES", "load_table", "load_tables", "read_csv_raw", "write_parquet"]
