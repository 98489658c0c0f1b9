"""Declarative data-quality expectations — the Deequ/dbt-test shape.

The reference validates by printing counts and eyeballing them
(/root/reference/Preprocessing.py:26-95 — SURVEY §5 "console assertions
by inspection"). This module makes that a first-class, machine-checkable
operator: a rule LIST in, one violations row per rule out, so the gate
is data (joinable, trendable, alertable) instead of log lines.

Rule types and their plans:
- ``not_null`` / ``accepted_values`` / ``in_range``: conditional counts,
  ALL folded into a single aggregation pass over the table (the
  null_profile trick generalized — k rules still cost one scan).
- ``unique``: one groupBy on the column (count of keys seen more than
  once, and how many extra rows they carry).
- ``foreign_key``: left-anti join against the referenced dimension
  (orphan count); broadcast when the dimension is bounded.

Every rule yields (rule, column, violations, passed) — the contract
table a pipeline asserts on before publishing a partition.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def run_expectations(
    df: DataFrame, rules: Sequence[Mapping]
) -> DataFrame:
    """Evaluate ``rules`` against ``df`` → one row per rule:
    (rule, column, violations, passed). Scan-rule aggregates share one
    pass; unique/foreign_key rules add their own keyed job each."""
    spark = df.sparkSession
    scan_aggs = []
    scan_meta = []
    extra_frames = []

    for r in rules:
        kind, col = r["type"], r["column"]
        name = r.get("name", f"{kind}:{col}")
        if kind == "not_null":
            cond = F.col(col).isNull()
        elif kind == "accepted_values":
            cond = ~F.col(col).isin(list(r["values"])) | F.col(col).isNull()
        elif kind == "in_range":
            lo, hi = r["min"], r["max"]
            cond = (
                F.col(col).isNull()
                | (F.col(col) < F.lit(lo))
                | (F.col(col) > F.lit(hi))
            )
        elif kind == "freshness":
            # data recency vs an EXPLICIT reference instant (as_of) —
            # deterministic and replayable, unlike current_timestamp().
            # Table-level rule: if the newest value is older than max_age
            # relative to as_of, every row counts as violating (the table
            # is stale), else zero — surfaced through the same
            # (violations, passed) contract as the row rules.
            as_of = F.lit(r["as_of"]).cast("timestamp")
            max_age_us = int(r["max_age_seconds"]) * 1_000_000
            fresh = df.agg(
                F.max(F.col(col)).alias("__newest"),
                F.count(F.lit(1)).cast("bigint").alias("__n"),
            ).select(
                F.lit(name).alias("rule"),
                F.lit(col).alias("column"),
                F.when(
                    F.unix_micros(as_of) - F.unix_micros(F.col("__newest"))
                    > F.lit(max_age_us),
                    F.col("__n"),
                )
                .otherwise(F.lit(0))
                .cast("bigint")
                .alias("violations"),
            ).select(
                "rule",
                "column",
                "violations",
                (F.col("violations") == 0).alias("passed"),
            )
            extra_frames.append(fresh)
            continue
        elif kind == "unique":
            dups = (
                df.groupBy(col)
                .agg(F.count(F.lit(1)).alias("__n"))
                .filter(F.col("__n") > 1)
                .agg(
                    F.coalesce(F.sum(F.col("__n") - 1), F.lit(0))
                    .cast("bigint")
                    .alias("violations")
                )
            )
            extra_frames.append(
                dups.select(
                    F.lit(name).alias("rule"),
                    F.lit(col).alias("column"),
                    "violations",
                    (F.col("violations") == 0).alias("passed"),
                )
            )
            continue
        elif kind == "foreign_key":
            ref, ref_col = r["ref"], r["ref_column"]
            orphans = (
                df.select(F.col(col))
                .filter(F.col(col).isNotNull())
                .join(
                    ref.select(F.col(ref_col).alias(col)).distinct(),
                    col,
                    "left_anti",
                )
                .agg(F.count(F.lit(1)).cast("bigint").alias("violations"))
            )
            extra_frames.append(
                orphans.select(
                    F.lit(name).alias("rule"),
                    F.lit(col).alias("column"),
                    "violations",
                    (F.col("violations") == 0).alias("passed"),
                )
            )
            continue
        else:
            raise ValueError(f"unknown rule type: {kind}")
        scan_aggs.append(
            F.sum(F.when(cond, 1).otherwise(0)).cast("bigint").alias(
                f"__v{len(scan_aggs)}"
            )
        )
        scan_meta.append((name, col))

    frames = list(extra_frames)
    if scan_aggs:
        one = df.agg(*scan_aggs)
        stack = ", ".join(
            f"'{n}', '{c}', __v{i}" for i, (n, c) in enumerate(scan_meta)
        )
        scan_rows = one.selectExpr(
            f"stack({len(scan_meta)}, {stack}) AS (rule, column, violations)"
        ).select("rule", "column", "violations",
                 (F.col("violations") == 0).alias("passed"))
        frames.insert(0, scan_rows)
    if not frames:
        return spark.createDataFrame(
            [], "rule string, column string, violations bigint, passed boolean"
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out
