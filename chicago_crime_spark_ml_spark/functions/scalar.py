"""Scalar column expressions — the reference's §2.6 function surface.

All pure Column compositions (codegen-friendly, no UDFs). Reference call
sites cited per function for parity checks.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cyclical_sin(col: Column | str, period: float) -> Column:
    """sin component of a cyclical encoding.

    Generalizes the reference's hour encoding
    ``sin(radians(Hour*15))`` (/root/reference/XGBoost.py:119) — 15° = 360/24,
    i.e. sin(2π·hour/24). ``cyclical_sin(col, 24)`` reproduces it exactly.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sin(c * (2.0 * 3.141592653589793 / period))


def cyclical_cos(col: Column | str, period: float) -> Column:
    """cos twin of cyclical_sin (/root/reference/XGBoost.py:120)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.cos(c * (2.0 * 3.141592653589793 / period))


def distance_from_km(
    lat: Column | str,
    lon: Column | str,
    point: tuple[float, float],
    km_per_degree: float = 111.0,
) -> Column:
    """Equirectangular-ish distance from a fixed point, in km.

    Exactly the reference's formula
    ``sqrt((lat-φ)² + (lon-λ)²) * 111`` from Chicago's center
    (/root/reference/XGBoost.py:124-132; NumPy twin Stramlit_app.py:127).
    Deliberately NOT haversine — parity with the reference's trained model
    requires the same (crude) metric; a proper haversine lives in
    ``haversine_km`` below for new pipelines.
    """
    la = F.col(lat) if isinstance(lat, str) else lat
    lo = F.col(lon) if isinstance(lon, str) else lon
    return F.sqrt(F.pow(la - point[0], 2) + F.pow(lo - point[1], 2)) * km_per_degree


def haversine_km(
    lat: Column | str, lon: Column | str, point: tuple[float, float]
) -> Column:
    """Great-circle distance (km) — the correct metric the reference skips."""
    la = F.radians(F.col(lat) if isinstance(lat, str) else lat)
    lo = F.radians(F.col(lon) if isinstance(lon, str) else lon)
    p_la, p_lo = F.radians(F.lit(point[0])), F.radians(F.lit(point[1]))
    h = (
        F.pow(F.sin((la - p_la) / 2), 2)
        + F.cos(la) * F.cos(p_la) * F.pow(F.sin((lo - p_lo) / 2), 2)
    )
    return F.lit(6371.0) * 2 * F.asin(F.sqrt(h))


def is_weekend(dayofweek_col: Column | str) -> Column:
    """1.0 when Spark dayofweek ∈ {1=Sunday, 7=Saturday} else 0.0
    (/root/reference/XGBoost.py:121-122). Spark's 1=Sunday convention is a
    documented trap — the reference converts Python weekday to it by hand at
    Stramlit_app.py:126; centralizing here kills that drift-prone twin."""
    c = F.col(dayofweek_col) if isinstance(dayofweek_col, str) else dayofweek_col
    return F.when(c.isin(1, 7), 1.0).otherwise(0.0)


def temporal_parts(ts: Column | str) -> dict[str, Column]:
    """Year/Month/Hour/DayOfWeek extraction bundle
    (/root/reference/Preprocessing.py:234-237, XGBoost.py:83-86)."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return {
        "year": F.year(c),
        "month": F.month(c),
        "hour": F.hour(c),
        "dayofweek": F.dayofweek(c),
    }


def json_get(col: Column | str, field: str) -> Column:
    """Extract a top-level string field from a JSON string column
    (events.props). get_json_object is JVM-side; for typed extraction use
    from_json with a schema at the call site."""
    c = F.col(col) if isinstance(col, str) else col
    return F.get_json_object(c, f"$.{field}")


def morton_code(col_a, col_b, bits: int = 16):
    """Morton (Z-order) interleaving of two non-negative ints ≤ 2^bits —
    pure Column bit algebra (JVM codegen, no UDF). Sorting a dataset by
    this code clusters rows that are close in BOTH dimensions into the
    same parquet row groups, so min/max stats prune 2-D range predicates
    — the data-skipping layout trick for co-filtered columns (date ×
    region, lat × lon) at 100 TB. Bit i of each input lands at output
    positions 2i (a) and 2i+1 (b)."""
    a = F.col(col_a) if isinstance(col_a, str) else col_a
    b = F.col(col_b) if isinstance(col_b, str) else col_b
    a = a.cast("long")
    b = b.cast("long")
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = (
            out
            .bitwiseOR(F.shiftleft(F.shiftright(a, i).bitwiseAND(1), 2 * i))
            .bitwiseOR(
                F.shiftleft(F.shiftright(b, i).bitwiseAND(1), 2 * i + 1)
            )
        )
    return out


def mask_digit_runs(
    col: Column | str, min_run: int = 4, token: str = "[ID]"
) -> Column:
    """PII/identifier masking: replace every run of ≥ min_run digits
    with a fixed token (account numbers, phone digits, SSN-ish runs).
    JVM-side regexp_replace (replaces ALL matches); pair with
    digit_count to audit how much was masked."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, "[0-9]{%d,}" % min_run, token)


def digit_count(col: Column | str) -> Column:
    """Number of digit characters in a string — masked-volume audit
    metric, computed as length minus digit-stripped length (no UDF)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c) - F.length(F.regexp_replace(c, "[0-9]", ""))


def haversine_pair_km(
    lat1: Column | str, lon1: Column | str, lat2: Column | str, lon2: Column | str
) -> Column:
    """Column-to-column great-circle distance (km) — the pairwise form
    haversine_km's fixed-point variant can't express (needed by the
    grid-bucketed spatial joins in operators/spatial.py)."""
    a1 = F.radians(F.col(lat1) if isinstance(lat1, str) else lat1)
    o1 = F.radians(F.col(lon1) if isinstance(lon1, str) else lon1)
    a2 = F.radians(F.col(lat2) if isinstance(lat2, str) else lat2)
    o2 = F.radians(F.col(lon2) if isinstance(lon2, str) else lon2)
    h = (
        F.pow(F.sin((a2 - a1) / 2), 2)
        + F.cos(a1) * F.cos(a2) * F.pow(F.sin((o2 - o1) / 2), 2)
    )
    return F.lit(6371.0) * 2 * F.asin(F.sqrt(h))
