"""Spatial operators — grid-bucketed neighbor joins over lat/lon points.

The reference works with point geodata (crime lat/lon: district centroid
maps at /root/reference/Preprocessing.py:500-510, folium scatter maps at
:488-534, the distance-from-center feature at XGBoost.py:124-132). Its
only spatial "operator" is that scalar distance; this module adds the
relational one a 100 TB point table needs: find pairs/matches within a
radius WITHOUT the O(N²) cross join.

Same family as relational.band_join (theta predicate → equi-join on a
binned key + exact post-filter): bucket each point into a square grid of
cell size ≥ the radius, join each left cell to its 3×3 neighborhood on
the right, then apply the exact distance predicate. Every candidate pair
within the radius is guaranteed to land in adjacent cells (cell size ≥
radius ⇒ a match can't span two cells in any axis), so the equi-join is
lossless; the shuffle carries grid keys, and cost is Σ_cell n_l·n_r over
neighboring cells — data-density bound, not table-size bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from chicago_crime_spark_ml_spark.functions.scalar import haversine_pair_km

# 1 degree of latitude ≈ 111.32 km (the reference's own flat-earth
# constant, XGBoost.py:129 uses 111). Longitude degrees SHRINK by
# cos(lat), so the lon axis must be rescaled before binning: with a
# fixed reference cos taken at the data's max |lat| (the smallest cos in
# the extent), a pair within radius km spans ≤ one cell width on both
# axes — the 3×3 neighborhood join stays lossless. City/continent-scale
# extents (the reference's Chicago case) are exactly this regime.
_KM_PER_DEG = 111.32


def _ref_lat(df: DataFrame, lat: str) -> float:
    """Max |latitude| of the data — one bounded agg+collect, same policy
    as the centroid collects in similarity.py."""
    row = df.agg(F.max(F.abs(F.col(lat))).alias("m")).first()
    return float(row["m"] or 0.0)


def grid_neighbor_pairs(
    df: DataFrame,
    id_col: str,
    lat: str,
    lon: str,
    radius_km: float,
    ref_lat: float | None = None,
) -> DataFrame:
    """All pairs of points within ``radius_km`` (great-circle), as
    (id_a, id_b, distance_km) with id_a < id_b.

    Self-join on the 3×3 grid neighborhood: left side keeps its own
    cell, right side explodes to the 9 surrounding cells; candidates
    meet on the cell key and the exact haversine filter decides. The
    dedup trick (id_a < id_b) also kills the mirror-candidate double
    count from neighboring-cell symmetry."""
    import math

    if ref_lat is None:
        ref_lat = _ref_lat(df, lat)
    cell_deg = radius_km / _KM_PER_DEG
    lon_scale = math.cos(math.radians(min(abs(ref_lat), 89.0)))
    gx = F.floor(F.col(lat) / cell_deg).cast("long")
    gy = F.floor(F.col(lon) * lon_scale / cell_deg).cast("long")
    left = df.select(
        F.col(id_col).alias("id_a"),
        F.col(lat).alias("lat_a"),
        F.col(lon).alias("lon_a"),
        gx.alias("gx"),
        gy.alias("gy"),
    )
    neigh = F.explode(
        F.array(*[F.struct((gx + dx).alias("gx"), (gy + dy).alias("gy"))
                  for dx in (-1, 0, 1) for dy in (-1, 0, 1)])
    )
    right = df.select(
        F.col(id_col).alias("id_b"),
        F.col(lat).alias("lat_b"),
        F.col(lon).alias("lon_b"),
        neigh.alias("cell"),
    ).select("id_b", "lat_b", "lon_b", "cell.gx", "cell.gy")
    dist = haversine_pair_km(
        F.col("lat_a"), F.col("lon_a"), F.col("lat_b"), F.col("lon_b")
    )
    return (
        left.join(right, ["gx", "gy"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("distance_km", dist)
        .filter(F.col("distance_km") <= radius_km)
        .select("id_a", "id_b", F.round("distance_km", 4).alias("distance_km"))
    )


def grid_lookup_join(
    points: DataFrame,
    sites: DataFrame,
    point_id: str,
    site_id: str,
    lat: str,
    lon: str,
    radius_km: float,
    ref_lat: float | None = None,
) -> DataFrame:
    """Nearest-site-within-radius lookup: each point matched to the
    closest site ≤ radius (the enrich-events-with-nearest-station
    shape). Sites explode to their 3×3 neighborhood (sites are the
    small side — stations, stores, districts), points keep one cell;
    per-point argmin via one window over the candidate matches."""
    import math

    from pyspark.sql.window import Window

    if ref_lat is None:
        ref_lat = max(_ref_lat(points, lat), _ref_lat(sites, lat))
    cell_deg = radius_km / _KM_PER_DEG
    lon_scale = math.cos(math.radians(min(abs(ref_lat), 89.0)))

    def _gx(c):
        return F.floor(F.col(c) / cell_deg).cast("long")

    def _gy(c):
        return F.floor(F.col(c) * lon_scale / cell_deg).cast("long")

    p = points.select(
        F.col(point_id).alias("point_id"),
        F.col(lat).alias("lat_p"),
        F.col(lon).alias("lon_p"),
        _gx(lat).alias("gx"),
        _gy(lon).alias("gy"),
    )
    neigh = F.explode(
        F.array(*[F.struct((_gx(lat) + dx).alias("gx"),
                           (_gy(lon) + dy).alias("gy"))
                  for dx in (-1, 0, 1) for dy in (-1, 0, 1)])
    )
    s = sites.select(
        F.col(site_id).alias("site_id"),
        F.col(lat).alias("lat_s"),
        F.col(lon).alias("lon_s"),
        neigh.alias("cell"),
    ).select("site_id", "lat_s", "lon_s", "cell.gx", "cell.gy")
    dist = haversine_pair_km(
        F.col("lat_p"), F.col("lon_p"), F.col("lat_s"), F.col("lon_s")
    )
    cand = (
        p.join(s, ["gx", "gy"])
        .withColumn("distance_km", dist)
        .filter(F.col("distance_km") <= radius_km)
    )
    w = Window.partitionBy("point_id").orderBy("distance_km", "site_id")
    return (
        cand.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "point_id", "site_id", F.round("distance_km", 4).alias("distance_km")
        )
    )
