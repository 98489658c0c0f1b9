"""Oracle-differential tests — replicates the driver's correctness gate.

For every query in the catalog with an oracle, run the Spark DataFrame AND
the DuckDB SQL over the same parquet tables and compare row count, sorted
column names, and the driver's pandas value-hash.

Bit-faithful to the grading driver (round-2 lesson): both sides are
materialized exactly as the driver materializes them — Spark ``toPandas()``
(Arrow) and DuckDB ``.df()`` — and hashed with the same canonicalizer as
tools/driver_preflight.py. ``collect()``/``fetchall()`` would yield Python
ints on both sides and hide driver-visible dtype drift (DuckDB sum(CASE…)
returns HUGEINT → pandas float64 vs Spark int64: identical values, red
driver hash).

Default SF is sf0.01 — the driver's correctness scale. Set
ORACLE_SF_DIR=/root/testdata/sf0.001 for a quick pass while iterating.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from chicago_crime_spark_ml_spark.queries import ORACLE, QUERIES
from tools.driver_preflight import canon_hash

SF = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_match(spark, name):
    sdf = QUERIES[name](spark, SF)
    spdf = sdf.toPandas()

    con = duck_con()
    dpdf = con.execute(ORACLE[name]).df()
    con.close()

    assert sorted(spdf.columns) == sorted(dpdf.columns), (
        f"{name}: column mismatch {list(spdf.columns)} vs {list(dpdf.columns)}"
    )
    assert len(spdf) == len(dpdf), (
        f"{name}: row count {len(spdf)} vs {len(dpdf)}"
    )
    hs, hd = canon_hash(spdf), canon_hash(dpdf)
    if hs != hd:
        # hash differs — rebuild a readable first-difference for the report
        s = spdf.reindex(sorted(spdf.columns), axis=1)
        d = dpdf.reindex(sorted(dpdf.columns), axis=1)
        if len(s):
            s = s.sort_values(list(s.columns)).reset_index(drop=True)
            d = d.sort_values(list(d.columns)).reset_index(drop=True)
        detail = ""
        for i in range(len(s)):
            if canon_hash(s.iloc[[i]]) != canon_hash(d.iloc[[i]]):
                detail = (
                    f"first diff at sorted row {i}: "
                    f"spark={s.iloc[i].to_dict()} duck={d.iloc[i].to_dict()} "
                    f"(dtypes spark={dict(s.dtypes.astype(str))} "
                    f"duck={dict(d.dtypes.astype(str))})"
                )
                break
        raise AssertionError(f"{name}: driver value-hash mismatch. {detail}")


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE)))
def test_rows_only_queries_execute(spark, name):
    # rows-only catalog entries (engine-specific: LSH, sampling, training,
    # stubbed codecs) must still run and return a sane frame — the same
    # weak check the driver applies
    df = QUERIES[name](spark, SF)
    assert len(df.columns) > 0
    assert df.count() >= 0
