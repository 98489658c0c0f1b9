"""Custom Spark DataSource (Python DataSource API, Spark 4): a
partitioned, deterministic generator of the reference's dirty crimes
CSV shape (FIXTURES.md §B — the input contract of
/root/reference/Preprocessing.py:20 and XGBoost.py:45-49).

Why a connector and not a file: the engine's ingest layer should be
exercisable at any scale without shipping fixture files — each Spark
partition generates its slice on the executor, so a 10-row smoke test
and a 10^9-row soak test use the same code path, parallelized like any
other scan. Determinism: every row is derived from a per-row RNG seeded
by (seed, row_index), so the dataset is IDENTICAL for any partition
count — repartition-invariant test data.

Dirt is generated at known rates (the same classes the reference's
cleaning handles): literal "NULL"/empty strings, embedded header rows,
unparseable dates, exact duplicates.
"""

from __future__ import annotations

import random

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

CRIME_TYPES = {
    "PROPERTY_CRIME": ["THEFT", "BURGLARY", "MOTOR VEHICLE THEFT"],
    "VIOLENT_CRIME": ["BATTERY", "ASSAULT", "ROBBERY"],
    "DRUG_CRIME": ["NARCOTICS"],
    "OTHER": ["DECEPTIVE PRACTICE", "CRIMINAL TRESPASS"],
}
LOCATIONS = ["STREET", "RESIDENCE", "APARTMENT", "SIDEWALK", "PARK"]

SCHEMA = (
    "`ID` STRING, `Date` STRING, `Primary Type` STRING, "
    "`Location Description` STRING, `Arrest` STRING, `Ward` STRING, "
    "`Community Area` STRING, `District` STRING, `Latitude` STRING, "
    "`Longitude` STRING"
)
_COLS = ["ID", "Date", "Primary Type", "Location Description", "Arrest",
         "Ward", "Community Area", "District", "Latitude", "Longitude"]


def _row(i: int, seed: int) -> tuple:
    rng = random.Random(seed * 1_000_003 + i)
    r = rng.random()
    if r < 0.002:  # embedded header row (reference strips via ID != 'ID')
        return tuple(_COLS)
    cats = list(CRIME_TYPES)
    district = rng.randint(1, 8)
    cat = cats[district % 4] if rng.random() < 0.8 else rng.choice(cats)
    if r < 0.006:  # unparseable date → timestamp quarantine path
        date = "13/45/2003 99:99:99"
    else:
        date = (
            f"{rng.randint(1, 12):02d}/{rng.randint(1, 28):02d}/"
            f"{rng.choice([2001, 2002, 2003, 2003, 2004])} "
            f"{rng.randint(1, 12):02d}:{rng.randint(0, 59):02d}:00 "
            f"{rng.choice(['AM', 'PM'])}"
        )
    return (
        str(1000 + i),
        date,
        rng.choice(CRIME_TYPES[cat]),
        rng.choice(LOCATIONS),
        rng.choice(["True", "true", "False", "false"]),
        "NULL" if rng.random() < 0.3 else str(rng.randint(1, 50)),
        "" if rng.random() < 0.3 else str(rng.randint(1, 77)),
        str(district),
        f"{41.6 + rng.random() * 0.5:.6f}",
        f"{-87.9 + rng.random() * 0.4:.6f}",
    )


class _CrimesReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.parts = int(options.get("partitions", 4))
        self.seed = int(options.get("seed", 42))
        self.dup_every = int(options.get("dup_every", 101))

    def partitions(self):
        return [InputPartition(i) for i in range(self.parts)]

    def read(self, partition):
        p = partition.value
        lo = self.rows * p // self.parts
        hi = self.rows * (p + 1) // self.parts
        for i in range(lo, hi):
            # exact duplicates at a known rate: row i repeats row i-1's
            # content (same ID → caught by dedup_exact after _c0 drop)
            src = i - 1 if (i % self.dup_every == 0 and i > 0) else i
            yield _row(src, self.seed)


def register(spark) -> None:
    spark.dataSource.register(CrimesDataSource)


class _CrimesStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch stream of the same deterministic rows: each trigger
    emits ``rows_per_batch`` new rows, offset = next row index. Replayed
    offsets regenerate identical rows (pure function of the index), so
    recovery gives exactly-once without a write-ahead log."""

    def __init__(self, options):
        self.rows_per_batch = int(options.get("rows_per_batch", 100))
        self.seed = int(options.get("seed", 42))
        self.max_rows = int(options.get("max_rows", 10_000))

    def initialOffset(self):
        return {"next": 0}

    def read(self, start):
        lo = start["next"]
        hi = min(lo + self.rows_per_batch, self.max_rows)
        return (iter([_row(i, self.seed) for i in range(lo, hi)]), {"next": hi})

    def readBetweenOffsets(self, start, end):
        return iter(
            [_row(i, self.seed) for i in range(start["next"], end["next"])]
        )

    def commit(self, end):
        pass


class CrimesDataSource(DataSource):
    """spark.read.format("crimes_synthetic").option("rows", N).load() —
    batch; spark.readStream.format("crimes_synthetic") — micro-batch
    stream of the same deterministic rows."""

    @classmethod
    def name(cls):
        return "crimes_synthetic"

    def schema(self):
        return SCHEMA

    def reader(self, schema):
        return _CrimesReader(self.options)

    def simpleStreamReader(self, schema):
        return _CrimesStreamReader(self.options)
