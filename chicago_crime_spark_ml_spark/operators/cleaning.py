"""Dirty-ingest cleaning layer — the reference's two-phase model
(ingest everything as string → clean → explicitly cast) as named,
single-pass operators.

Reference semantics replayed here (SURVEY.md §1.3, §2.2):
- literal "NULL"/"" strings normalized to SQL NULL
  (/root/reference/Preprocessing.py:60-64, XGBoost.py:53-58)
- embedded header rows stripped (Preprocessing.py:66-74)
- declarative casts AFTER cleaning (Preprocessing.py:97-126)
- lenient timestamp parse with quarantine of failures (XGBoost.py:80-81)
- median imputation via quantiles (Preprocessing.py:145-168)

Scale discipline: every operator is ONE select over all columns — the
reference's per-column ``withColumn`` loops cost an analyzer pass per
column and its per-column count loop rescans the table per column
(22 scans at Preprocessing.py:43-46); here each op is one job.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_NULL_TOKENS = ("NULL", "")


def normalize_nulls(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    tokens: Sequence[str] = DEFAULT_NULL_TOKENS,
) -> DataFrame:
    """Map sentinel strings ("NULL", "") to SQL NULL in one select —
    the batched form of the reference's withColumn loop
    (/root/reference/Preprocessing.py:60-64)."""
    target = set(cols or df.columns)
    toks = list(tokens)
    return df.select(
        [
            F.when(F.col(c).isin(toks), None).otherwise(F.col(c)).alias(c)
            if c in target
            else F.col(c)
            for c in df.columns
        ]
    )


def drop_embedded_header_rows(df: DataFrame, probe_col: str) -> DataFrame:
    """Strip data rows that are actually repeated CSV headers — detected
    as the probe column equalling its own name
    (/root/reference/Preprocessing.py:66-74: col("ID") != "ID")."""
    return df.filter(
        F.col(probe_col).isNull() | (F.col(probe_col) != F.lit(probe_col))
    )


def cast_columns(
    df: DataFrame,
    schema: Mapping[str, T.DataType | str],
    lenient: bool = True,
) -> DataFrame:
    """Declarative post-clean casts in one select (the reference casts
    column-by-column at Preprocessing.py:103-116). Unknown columns in the
    mapping raise — silent schema drift is how 100 TB pipelines rot.

    ``lenient=True`` uses try_cast (malformed → NULL), matching the
    reference's Spark 3.x non-ANSI cast semantics; the engine keeps ANSI
    mode ON globally, so strict casts (``lenient=False``) fail loudly.
    """
    missing = set(schema) - set(df.columns)
    if missing:
        raise ValueError(f"cast_columns: columns not in DataFrame: {sorted(missing)}")
    cast = (lambda c: F.col(c).try_cast(schema[c])) if lenient else (
        lambda c: F.col(c).cast(schema[c])
    )
    return df.select(
        [cast(c).alias(c) if c in schema else F.col(c) for c in df.columns]
    )


def cast_booleans(
    df: DataFrame, cols: Sequence[str], true_values: Sequence[str] = ("True", "true")
) -> DataFrame:
    """String → boolean via CASE, not cast — preserves the reference's
    exact mapping (Preprocessing.py:119-126) including its casing quirk:
    the Preprocessing path matches 'True' while the XGBoost path matches
    'true' (XGBoost.py:92). We accept both by default; anything else →
    false when non-null, NULL stays NULL."""
    tv = list(true_values)
    return df.select(
        [
            F.when(F.col(c).isNull(), None)
            .otherwise(F.col(c).isin(tv))
            .alias(c)
            if c in set(cols)
            else F.col(c)
            for c in df.columns
        ]
    )


def parse_timestamp_quarantine(
    df: DataFrame, col: str, fmt: str, out_col: str | None = None
) -> tuple[DataFrame, DataFrame]:
    """Lenient timestamp parse: returns (parsed_rows, quarantined_rows).

    The reference uses try_to_timestamp then silently drops failures
    (/root/reference/XGBoost.py:80-81); at scale you never silently drop —
    quarantined rows go to a dead-letter sink for audit. Both outputs
    derive from one parsed plan (cache upstream to avoid double scan).
    """
    out = out_col or col
    parsed = df.withColumn(out, F.try_to_timestamp(F.col(col), F.lit(fmt)))
    good = parsed.filter(F.col(out).isNotNull())
    bad = parsed.filter(F.col(out).isNull() & F.col(col).isNotNull()).drop(out)
    return good, bad


def impute_median(
    df: DataFrame,
    cols: Sequence[str],
    rel_err: float = 0.01,
    exact: bool = False,
) -> DataFrame:
    """Fill NULLs with the column median (/root/reference/
    Preprocessing.py:145-168: approxQuantile + when/otherwise — we fillna,
    equivalent and simpler).

    ``exact=False`` (default) uses approxQuantile — Greenwald-Khanna,
    single pass, mergeable: the only sane choice at 100 TB. ``exact=True``
    uses percentile() for oracle-grade determinism on test scales.
    The medians are a bounded collect (len(cols) doubles) — not a
    driver-side table materialization.
    """
    cols = list(cols)
    if exact:
        row = df.select(
            [F.percentile(c, F.lit(0.5)).alias(c) for c in cols]
        ).first()
        medians = {c: row[c] for c in cols}
    else:
        vals = df.stat.approxQuantile(cols, [0.5], rel_err)
        medians = {c: v[0] for c, v in zip(cols, vals)}
    medians = {c: m for c, m in medians.items() if m is not None}
    return df.fillna(medians)


def clean_strings_pipeline(
    df: DataFrame,
    probe_col: str,
    cast_schema: Mapping[str, T.DataType | str],
    bool_cols: Sequence[str] = (),
    null_tokens: Sequence[str] = DEFAULT_NULL_TOKENS,
    dropna_subset: Sequence[str] | None = None,
) -> DataFrame:
    """The reference's full cleaning recipe as one composed, lazily-planned
    pipeline: dedup exact → header filter → NULL-normalize → boolean map →
    declarative casts → dropna on required columns
    (/root/reference/XGBoost.py:51-75 order). One logical plan, no
    intermediate actions — the reference fires a count() between nearly
    every step, re-executing the scan each time (SURVEY §4 anti-pattern).
    """
    out = df.dropDuplicates()
    out = drop_embedded_header_rows(out, probe_col)
    out = normalize_nulls(out, tokens=null_tokens)
    if bool_cols:
        out = cast_booleans(out, bool_cols)
    out = cast_columns(out, cast_schema)
    if dropna_subset:
        out = out.dropna(subset=list(dropna_subset))
    return out
