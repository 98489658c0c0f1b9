"""Spatial grid-join tests: the bucketed neighbor join must equal the
brute-force cross join exactly (candidate generation is provably
lossless), on clustered + isolated + cross-cell-boundary layouts."""

from __future__ import annotations

import itertools
import math

from chicago_crime_spark_ml_spark.operators.spatial import (
    grid_lookup_join,
    grid_neighbor_pairs,
)

# Chicago-ish extent (the reference's domain): a tight downtown cluster,
# a pair straddling a likely cell boundary, and an isolated point.
POINTS = [
    (1, 41.8781, -87.6298),
    (2, 41.8785, -87.6294),   # ~60 m from 1
    (3, 41.8790, -87.6310),   # ~130 m from 1
    (4, 41.9000, -87.6298),   # ~2.4 km north — outside 1 km
    (5, 41.8781, -87.6178),   # ~1.0 km east of 1 — near the radius edge
    (6, 42.3601, -87.0000),   # far away
]


def _haversine(a, b):
    la1, lo1, la2, lo2 = map(math.radians, (a[0], a[1], b[0], b[1]))
    h = (
        math.sin((la2 - la1) / 2) ** 2
        + math.cos(la1) * math.cos(la2) * math.sin((lo2 - lo1) / 2) ** 2
    )
    return 6371.0 * 2 * math.asin(math.sqrt(h))


def _brute_pairs(points, radius):
    out = set()
    for (ia, la, lo), (ib, lb, lb2) in itertools.combinations(points, 2):
        if _haversine((la, lo), (lb, lb2)) <= radius:
            out.add((min(ia, ib), max(ia, ib)))
    return out


def test_grid_pairs_equal_brute_force(spark):
    df = spark.createDataFrame(POINTS, "id bigint, lat double, lon double")
    for radius in (0.2, 1.0, 3.0):
        got = {
            (r["id_a"], r["id_b"])
            for r in grid_neighbor_pairs(df, "id", "lat", "lon", radius).collect()
        }
        assert got == _brute_pairs(POINTS, radius), f"radius={radius}"


def test_grid_pairs_no_duplicate_candidates(spark):
    df = spark.createDataFrame(POINTS, "id bigint, lat double, lon double")
    rows = grid_neighbor_pairs(df, "id", "lat", "lon", 3.0).collect()
    pairs = [(r["id_a"], r["id_b"]) for r in rows]
    assert len(pairs) == len(set(pairs))  # 3×3 mirror candidates deduped


def test_grid_lookup_nearest_site(spark):
    sites = spark.createDataFrame(
        [(100, 41.8781, -87.6298), (200, 41.9000, -87.6298)],
        "sid bigint, lat double, lon double",
    )
    points = spark.createDataFrame(
        [(1, 41.8785, -87.6294), (2, 41.8995, -87.6300), (3, 42.5, -88.0)],
        "pid bigint, lat double, lon double",
    )
    got = {
        r["point_id"]: r["site_id"]
        for r in grid_lookup_join(
            points, sites, "pid", "sid", "lat", "lon", radius_km=1.0
        ).collect()
    }
    assert got == {1: 100, 2: 200}  # point 3 has no site within 1 km
