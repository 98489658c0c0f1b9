"""Three-way parity: DataFrame catalog ≡ spark.sql(oracle) ≡ DuckDB.

tests/test_oracle.py already proves DataFrame ≡ DuckDB for every oracle.
This suite closes the triangle's third edge: the oracle SQL strings are
honest ANSI — the dialect-portable ones run VERBATIM through spark.sql
over registered temp views (chicago_crime_spark_ml_spark.sql) and
reproduce the DataFrame results exactly. That's only possible because
DataFrame and SQL compile to the same Catalyst plans; it also means a
spark.sql-habit user of the reference can drive this engine with SQL.

Numeric typing differs harmlessly across the edge (Spark's decimal
arithmetic keeps DECIMAL where DuckDB/our DataFrame form lands DOUBLE),
so canonicalization formats Decimal and float identically.
"""

from __future__ import annotations

import decimal
import math

from chicago_crime_spark_ml_spark.queries import ORACLE, QUERIES
from chicago_crime_spark_ml_spark.sql import register_tables

# Oracle strings that PARSE in Spark but legitimately mean something
# else there — each a documented DuckDB/Spark dialect divergence, not a
# catalog bug (tests/test_oracle.py proves the DuckDB meaning matches).
KNOWN_DIALECT_DIVERGENCES = {
    # DuckDB dayofweek() is 0=Sunday, Spark's is 1=Sunday: oracles
    # encode the +1 shift for DuckDB, so running them in Spark double-shifts
    "events_hourly_profile",
    "daily_revenue_dow_anomalies",
    "event_type_transitions",
    "session_bounce_rate",
    # DuckDB integer/integer division yields DOUBLE; Spark yields
    # integer division inside these chi2/KS accumulations
    "lang_source_chi2",
    "order_value_ks_two_sample",
    # DuckDB round() on DECIMAL keeps more scale than Spark's ANSI
    # decimal round at the output-rounding boundary used here
    "large_volume_customers",
}

MIN_PORTABLE = 130


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, decimal.Decimal):
                v = float(v)
            if isinstance(v, float):
                vals.append(
                    "nan" if math.isnan(v) else f"{v + 0.0 if v != 0 else 0.0:.6f}"
                )
            else:
                vals.append(repr(v))
        out.append(tuple(vals))
    return sorted(out)


def test_sql_surface_parity(spark, sf_dir):
    register_tables(spark, sf_dir)

    def check(item):
        # one (name, status) verdict per oracle — same logic as the
        # original serial loop, verbatim
        name, sql = item
        try:
            sdf = spark.sql(sql)
            srows = [tuple(r) for r in sdf.collect()]
        except Exception:  # noqa: BLE001 — duck-only syntax, expected
            return name, "no_parse"
        ddf = QUERIES[name](spark, sf_dir)
        drows = [tuple(r) for r in ddf.collect()]
        same_cols = sorted(sdf.columns) == sorted(ddf.columns)
        if same_cols and _canon(srows, sdf.columns) == _canon(drows, ddf.columns):
            return name, "portable"
        return name, "diverged"

    # ~300 queries x 2 collects over sf0.001 leave a 32-core local
    # cluster almost idle when run serially — this was the suite's
    # single slowest test at 245 s. Spark schedules concurrent actions
    # from driver threads natively (optimization guide §2.6, overlap
    # independent jobs); 6 in flight cuts the wall to the long pole.
    # The per-query check and the assertions below are byte-identical
    # to the serial form.
    from concurrent.futures import ThreadPoolExecutor  # noqa: PLC0415

    portable, diverged, no_parse = [], [], []
    with ThreadPoolExecutor(max_workers=6) as pool:
        for name, status in pool.map(check, list(ORACLE.items())):
            {"portable": portable, "diverged": diverged, "no_parse": no_parse}[
                status
            ].append(name)

    unexpected = set(diverged) - KNOWN_DIALECT_DIVERGENCES
    assert not unexpected, (
        f"oracle strings that run in Spark but disagree with the "
        f"DataFrame form (new dialect trap or a real bug): {sorted(unexpected)}"
    )
    assert len(portable) >= MIN_PORTABLE, (
        f"only {len(portable)} oracle strings ran verbatim through "
        f"spark.sql (expected >= {MIN_PORTABLE}); no-parse={len(no_parse)}"
    )


def test_register_tables_normalizes_ts(spark, sf_dir):
    # views must see the SAME ts normalization as DataFrame callers —
    # a bare read would leave bigint-ns or TIMESTAMP_NTZ
    register_tables(spark, sf_dir, ("events",))
    t = dict(spark.sql("SELECT * FROM events").dtypes)["ts"]
    assert t == "timestamp"
    n = spark.sql(
        "SELECT count(*) AS n FROM events WHERE ts >= TIMESTAMP '2024-01-01'"
    ).collect()[0].n
    assert n > 0
