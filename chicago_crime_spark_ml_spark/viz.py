"""Bounded viz-data layer — the engine-side half of the reference's
EDA/chart output (SURVEY.md §2 S5).

The reference renders 13 matplotlib/seaborn charts and 3 folium maps by
collecting aggregates to the driver (/root/reference/Preprocessing.py:366-798).
The AGGREGATES all live in the query catalog already; what this module adds
is the collect boundary done safely: every helper returns a driver-side
pandas frame whose size is bounded BY CONSTRUCTION (top-k, fixed axes, or
an explicit max_rows guard that raises instead of OOMing the driver) — the
engine's replacement for the reference's unbounded ``toPandas()`` calls
(e.g. ALL lat/lon rows at Preprocessing.py:372, fine at 1.9M rows, fatal
at 100 TB).

Rendering itself (PNG/HTML) is a thin optional layer: ``render_heatmap``
and ``render_line`` work when matplotlib is importable and raise a clear
error otherwise — chart DATA is the engine contract, pixels are not.
``render_map_html`` (the folium-parity map sink) is dependency-free:
self-contained SVG-in-HTML, no tile servers.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class VizBoundExceeded(ValueError):
    """A chart-data collect would exceed its declared row bound."""


def collect_for_viz(df: DataFrame, max_rows: int = 10_000) -> pd.DataFrame:
    """The ONLY sanctioned DataFrame→driver path for chart data: collects
    at most ``max_rows`` rows and RAISES if the result would be larger —
    never silently truncates (a silently truncated chart lies) and never
    OOMs the driver (limit pushes into the plan; at most max_rows+1 rows
    cross the wire)."""
    pdf = df.limit(max_rows + 1).toPandas()
    if len(pdf) > max_rows:
        raise VizBoundExceeded(
            f"chart data exceeds {max_rows} rows; aggregate further or "
            f"raise max_rows explicitly"
        )
    return pdf


def topk_counts(df: DataFrame, col: str, k: int = 10) -> pd.DataFrame:
    """Top-k category counts — the reference's bar-chart / map-legend
    input (top crime types, Preprocessing.py:399-400). TakeOrdered keeps
    k rows per partition then merges on the driver; output is exactly ≤ k
    rows regardless of input scale."""
    agg = (
        df.groupBy(col)
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.desc("count"), F.asc(col))
        .limit(k)
    )
    return collect_for_viz(agg, max_rows=k)


def pivot_matrix(
    df: DataFrame,
    index_col: str,
    column_col: str,
    max_index: int = 100,
    max_columns: int = 100,
) -> pd.DataFrame:
    """Count pivot matrix (index × column, zero-filled) — the shape
    behind the reference's three seaborn heatmaps: crime-type×district
    (Preprocessing.py:618-619), year×district (645-646), crime-type×hour
    (699-700). The group-by runs distributed; only the (≤ max_index ×
    ≤ max_columns) cell counts reach the driver, where pandas does the
    final pivot exactly like the reference."""
    counts = df.groupBy(index_col, column_col).agg(
        F.count(F.lit(1)).alias("count")
    )
    pdf = collect_for_viz(counts, max_rows=max_index * max_columns)
    if pdf[index_col].nunique() > max_index:
        raise VizBoundExceeded(f"{index_col} exceeds {max_index} categories")
    if pdf[column_col].nunique() > max_columns:
        raise VizBoundExceeded(f"{column_col} exceeds {max_columns} categories")
    return (
        pdf.pivot(index=index_col, columns=column_col, values="count")
        .fillna(0)
        .astype("int64")
    )


def centroid_map_data(
    df: DataFrame,
    key_col: str,
    x_col: str,
    y_col: str,
    max_keys: int = 1_000,
) -> pd.DataFrame:
    """Per-key centroid + weight — the reference's district-map input
    (avg lat/lon + crime count per district, Preprocessing.py:500-510)
    computed in ONE aggregation instead of its two group-bys + pandas
    merge. Bounded by the key cardinality guard."""
    agg = df.groupBy(key_col).agg(
        F.avg(x_col).alias(f"avg_{x_col}"),
        F.avg(y_col).alias(f"avg_{y_col}"),
        F.count(F.lit(1)).alias("count"),
    )
    return collect_for_viz(agg, max_rows=max_keys)


def time_pattern(
    df: DataFrame, ts_col: str, unit: str = "hour"
) -> pd.DataFrame:
    """Counts per calendar unit of a timestamp — the hourly/monthly/yearly
    pattern line charts (Preprocessing.py:689-696 hourly, 722 monthly,
    747 yearly). Axis cardinality is fixed by the calendar, so the
    collect is bounded by construction."""
    extract = {
        "hour": (F.hour, 24),
        "dow": (F.dayofweek, 7),
        "month": (F.month, 12),
        "year": (F.year, 200),
    }
    if unit not in extract:
        raise ValueError(f"unit must be one of {sorted(extract)}")
    fn, bound = extract[unit]
    agg = (
        df.groupBy(fn(ts_col).alias(unit))
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(unit)
    )
    return collect_for_viz(agg, max_rows=bound)


def sampled_points(
    df: DataFrame,
    category_col: str,
    categories: Sequence[str],
    cols: Sequence[str],
    per_category: int = 100,
    seed: int = 42,
) -> pd.DataFrame:
    """Bounded per-category point sample — the reference's color-coded
    scatter-map input (100-ish sampled rows per top crime type,
    Preprocessing.py:424-431), done as ONE deterministic-hash top-N per
    category instead of a per-category filter+sample loop (k jobs → 1).
    Output ≤ len(categories)·per_category rows."""
    from pyspark.sql.window import Window  # noqa: PLC0415

    w = Window.partitionBy(category_col).orderBy(
        F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols]))
    )
    picked = (
        df.filter(F.col(category_col).isin(list(categories)))
        .select(category_col, *cols)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= per_category)
        .drop("_rn")
    )
    _ = seed  # hash order is deterministic; seed kept for API parity
    return collect_for_viz(picked, max_rows=len(categories) * per_category)


def correlation_matrix_data(
    df: DataFrame, cols: Sequence[str], round_to: int = 4
) -> pd.DataFrame:
    """The correlation-heatmap input (Preprocessing.py:774-796: collect 14
    numeric columns to pandas, DataFrame.corr) as ONE distributed
    aggregation: all k·(k−1)/2 pairwise F.corr cells in a single pass,
    reshaped driver-side into the symmetric k×k pandas matrix seaborn
    wants. The collect moves k² floats, never rows."""
    pairs = [
        F.round(F.corr(a, b), round_to).alias(f"{i}_{j}")
        for i, a in enumerate(cols)
        for j, b in enumerate(cols)
        if i < j
    ]
    row = df.agg(*pairs).collect()[0]
    mat = pd.DataFrame(1.0, index=list(cols), columns=list(cols))
    for i, a in enumerate(cols):
        for j, b in enumerate(cols):
            if i < j:
                v = row[f"{i}_{j}"]
                mat.loc[a, b] = v
                mat.loc[b, a] = v
    return mat


def eda_report(
    df: DataFrame,
    category_col: str,
    district_col: str,
    ts_col: str,
    numeric_cols: Sequence[str],
    top_k: int = 10,
) -> dict[str, pd.DataFrame]:
    """Every chart-data frame the reference\'s EDA script renders
    (Preprocessing.py:366-798), produced in one call as BOUNDED pandas
    frames keyed by the figure they feed: top-k category counts, district
    distribution, yearly/hourly/day-of-week/monthly patterns, the three
    pivot heatmaps, and the correlation matrix. A user of the reference
    points this at their table and gets the same dashboard inputs without
    a single unbounded collect."""
    return {
        "top_categories": topk_counts(df, category_col, top_k),
        "district_distribution": topk_counts(df, district_col, 50),
        "yearly_trend": time_pattern(df, ts_col, "year"),
        "hourly_pattern": time_pattern(df, ts_col, "hour"),
        "dow_pattern": time_pattern(df, ts_col, "dow"),
        "monthly_pattern": time_pattern(df, ts_col, "month"),
        "category_district_heatmap": pivot_matrix(
            df, category_col, district_col
        ),
        "year_district_heatmap": pivot_matrix(
            df.withColumn("_yr", F.year(ts_col)), "_yr", district_col
        ),
        "category_hour_heatmap": pivot_matrix(
            df.withColumn("_hr", F.hour(ts_col)), category_col, "_hr"
        ),
        "correlation_matrix": correlation_matrix_data(df, numeric_cols),
    }


# ---------------------------------------------------------------------------
# Optional rendering (matplotlib not installed in this container — the
# data helpers above are the engine contract; these are conveniences)
# ---------------------------------------------------------------------------


def _require_matplotlib():
    try:  # pragma: no cover - env-dependent
        import matplotlib  # noqa: PLC0415

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt  # noqa: PLC0415

        return plt
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "matplotlib is required for rendering; install it or use the "
            "chart-DATA helpers (topk_counts/pivot_matrix/...) directly"
        ) from e


def render_heatmap(matrix: pd.DataFrame, path: str, title: str = "") -> str:
    """PNG heatmap from a pivot_matrix result (the seaborn-heatmap
    equivalent, Preprocessing.py:622-631)."""
    plt = _require_matplotlib()
    fig, ax = plt.subplots(figsize=(12, 8))
    im = ax.imshow(matrix.values, aspect="auto", cmap="YlOrRd")
    ax.set_xticks(range(len(matrix.columns)), matrix.columns, rotation=90)
    ax.set_yticks(range(len(matrix.index)), matrix.index)
    ax.set_title(title)
    fig.colorbar(im, ax=ax)
    fig.tight_layout()
    fig.savefig(path, dpi=150)
    plt.close(fig)
    return path


def render_line(pdf: pd.DataFrame, x: str, y: str, path: str, title: str = "") -> str:
    """PNG line chart from a time_pattern result
    (Preprocessing.py:689-696)."""
    plt = _require_matplotlib()
    fig, ax = plt.subplots(figsize=(12, 5))
    ax.plot(pdf[x], pdf[y], marker="o")
    ax.set_xlabel(x)
    ax.set_ylabel(y)
    ax.set_title(title)
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(path, dpi=150)
    plt.close(fig)
    return path


# Fixed categorical cycle for the point-map legend (ColorBrewer Set1-ish;
# deterministic category → color assignment in first-seen order).
_MAP_COLORS = [
    "#e41a1c", "#377eb8", "#4daf4a", "#984ea3", "#ff7f00",
    "#a65628", "#f781bf", "#17becf", "#999999", "#66c2a5",
]


def render_map_html(
    pdf: pd.DataFrame,
    lat_col: str,
    lon_col: str,
    path: str,
    weight_col: str | None = None,
    category_col: str | None = None,
    label_col: str | None = None,
    title: str = "",
    width: int = 900,
    height: int = 600,
) -> str:
    """Standalone HTML map sink — the folium-parity artifact
    (Preprocessing.py:488 ``crime_type_map.save`` and :534
    ``district_map.save``): same bounded inputs (a ``centroid_map_data``
    or ``sampled_points`` frame), same output (a self-contained .html
    the browser opens directly).

    Rendered as inline SVG over a linear lat/lon projection instead of
    folium + network tile layers: zero dependencies, works in a hermetic
    cluster environment, and the artifact is deterministic (same frame →
    byte-identical file, testable). Reference parity per mode:

    - ``weight_col`` (district map): circle radius ∝ √weight (area ∝
      count — the reference's linear-radius scaling makes a 2× count
      look 4× bigger), hover tooltip with label + weight via SVG
      ``<title>`` standing in for folium's popup.
    - ``category_col`` (crime-type map): per-category colors in
      first-seen order + the reference's fixed-position legend box
      (its legend_html div, Preprocessing.py:471-484).

    Input must already be driver-bounded — the helpers producing it
    enforce ``collect_for_viz`` caps, so this never sees more than a few
    thousand rows.
    """
    import html as _html  # noqa: PLC0415

    pad = 0.05
    lats = pdf[lat_col].astype(float)
    lons = pdf[lon_col].astype(float)
    lat_span = max(float(lats.max() - lats.min()), 1e-9) if len(pdf) else 1.0
    lon_span = max(float(lons.max() - lons.min()), 1e-9) if len(pdf) else 1.0
    lat0 = float(lats.min()) if len(pdf) else 0.0
    lon0 = float(lons.min()) if len(pdf) else 0.0
    inner_w, inner_h = width * (1 - 2 * pad), height * (1 - 2 * pad)

    def xy(lat: float, lon: float) -> tuple[float, float]:
        x = width * pad + (lon - lon0) / lon_span * inner_w
        y = height * pad + (1 - (lat - lat0) / lat_span) * inner_h
        return round(x, 2), round(y, 2)

    colors: dict[str, str] = {}
    if category_col is not None:
        for c in pdf[category_col].astype(str):
            if c not in colors:
                colors[c] = _MAP_COLORS[len(colors) % len(_MAP_COLORS)]
    wmax = (
        max(float(pdf[weight_col].max()), 1.0)
        if weight_col is not None and len(pdf)
        else 1.0
    )

    circles = []
    for _, row in pdf.iterrows():
        x, y = xy(float(row[lat_col]), float(row[lon_col]))
        if weight_col is not None:
            r = round(4 + 16 * (float(row[weight_col]) / wmax) ** 0.5, 2)
        else:
            r = 4
        color = (
            colors[str(row[category_col])]
            if category_col is not None
            else "#b22222"
        )
        tip_bits = []
        if label_col is not None:
            tip_bits.append(str(row[label_col]))
        if weight_col is not None:
            tip_bits.append(f"{weight_col}: {row[weight_col]:,}")
        tip = _html.escape(" | ".join(tip_bits)) if tip_bits else ""
        circles.append(
            f'<circle cx="{x}" cy="{y}" r="{r}" fill="{color}" '
            f'fill-opacity="0.6" stroke="{color}">'
            + (f"<title>{tip}</title>" if tip else "")
            + "</circle>"
        )

    legend = ""
    if colors:
        items = "".join(
            f'<p style="margin:5px;"><span style="color:{c};">&#9679;</span> '
            f"{_html.escape(k)}</p>"
            for k, c in colors.items()
        )
        legend = (
            '<div style="position: fixed; bottom: 50px; right: 50px; '
            "width: 220px; background-color: white; z-index:9999; "
            "font-size:14px; border:2px solid grey; border-radius: 5px; "
            'padding: 10px"><h4 style="margin-top:0; margin-bottom:10px;">'
            f"{_html.escape(title or category_col)}</h4>{items}</div>"
        )

    doc = (
        "<!DOCTYPE html><html><head><meta charset='utf-8'>"
        f"<title>{_html.escape(title)}</title></head><body>"
        f"<h3>{_html.escape(title)}</h3>"
        f'<svg width="{width}" height="{height}" '
        'style="border:1px solid #ccc; background:#f8f8f6">'
        + "".join(circles)
        + "</svg>"
        + legend
        + "</body></html>"
    )
    with open(path, "w", encoding="utf-8") as f:
        f.write(doc)
    return path
