"""Incremental aggregate maintenance — merge a delta into a rollup
without rescanning the base table.

At 100 TB the difference between "recompute the daily-revenue rollup"
and "aggregate yesterday's partition and merge" is the whole batch
window: the delta path scans |delta| rows plus the rollup (which is
group-cardinality-sized, not fact-sized). This module provides the
merge for the mergeable-aggregate families:

- count / sum: add
- min / max: min / max
- avg: carried as (sum, count), finalized on read
- distinct-ish: use HLL sketches (queries.py sketch_distinct_customers
  shows the hll_sketch_agg/hll_union path) — NOT mergeable as plain
  counts, deliberately excluded here.

Sums that feed cross-engine comparison stay EXACT (decimal) until the
final read: merging *rounded* partials would not equal the rounded
full recompute. Same discipline as queries._dsum, which rounds only at
the output boundary.

The streaming twin is streaming/__init__.py's incremental rollup
(foreachBatch merge); this is the batch/backfill form of the same
contract: merged(MV, delta) == recompute(base ∪ delta).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MERGE_FN = {
    "sum": F.sum,
    "count": F.sum,  # partial counts merge by addition
    "min": F.min,
    "max": F.max,
}


def rollup_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    measures: dict[str, tuple[str, str]],
) -> DataFrame:
    """Build a mergeable rollup: ``measures`` maps output column →
    (input column, how) with how ∈ {sum, count, min, max}. Sum inputs
    are cast to DECIMAL(18,4) so partial sums are exact (associative)
    and therefore mergeable without drift."""
    aggs = []
    for out, (col, how) in measures.items():
        if how == "sum":
            aggs.append(F.sum(F.col(col).cast("decimal(18,4)")).alias(out))
        elif how == "count":
            aggs.append(F.count(col).alias(out))
        elif how in ("min", "max"):
            aggs.append(getattr(F, how)(col).alias(out))
        else:
            raise ValueError(f"unmergeable aggregate: {how}")
    return df.groupBy(*keys).agg(*aggs)


def merge_rollup(
    existing: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    measures: dict[str, tuple[str, str]],
) -> DataFrame:
    """Merge two rollups produced by ``rollup_aggregate`` with the same
    keys/measures. Full-outer on keys (new groups appear, old groups
    persist), per-measure merge by the aggregate's own monoid. The join
    is rollup-sized — group cardinality, not fact rows."""
    e = existing.alias("e")
    d = delta.alias("d")
    merged = e.join(d, on=list(keys), how="full_outer")
    cols = [F.col(k) for k in keys]
    for out, (_, how) in measures.items():
        a, b = F.col(f"e.{out}"), F.col(f"d.{out}")
        if how in ("sum", "count"):
            # Cast back to the partial's type (Spark's sum over
            # DECIMAL(18,4) yields DECIMAL(28,4)): decimal addition widens
            # precision per merge, which would change the schema on every
            # maintenance cycle.
            typ = "decimal(28,4)" if how == "sum" else "bigint"
            zero = F.lit(0)
            cols.append(
                (F.coalesce(a, zero) + F.coalesce(b, zero)).cast(typ).alias(out)
            )
        elif how == "min":
            cols.append(F.least(F.coalesce(a, b), F.coalesce(b, a)).alias(out))
        else:  # max
            cols.append(F.greatest(F.coalesce(a, b), F.coalesce(b, a)).alias(out))
    return merged.select(*cols)


def cascade_rollup(
    fine: DataFrame,
    regroup: dict[str, Column],
    measures: dict[str, tuple[str, str]],
) -> DataFrame:
    """Derive a COARSER rollup from a finer one (day → month → year —
    the continuous-aggregate cascade timeseries stores maintain): each
    mergeable partial re-aggregates by its own monoid (sum/count partials
    re-SUM, min/max re-min/max), so the monthly table reads ~30 day rows
    per group instead of re-scanning the fact table. ``regroup`` maps
    coarse key name → expression over the fine rollup's columns. Sum
    partials are cast back to DECIMAL(28,4) so the schema is identical
    at every level of the cascade (decimal addition would otherwise
    widen per level)."""
    aggs = []
    for out, (_, how) in measures.items():
        if how == "sum":
            aggs.append(F.sum(out).cast("decimal(28,4)").alias(out))
        elif how == "count":
            aggs.append(F.sum(out).cast("long").alias(out))
        else:
            aggs.append(getattr(F, how)(out).alias(out))
    base = fine.select(
        *[expr.alias(name) for name, expr in regroup.items()],
        *[F.col(out) for out in measures],
    )
    return base.groupBy(*regroup.keys()).agg(*aggs)
