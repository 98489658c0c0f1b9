"""Sketch-backed operators whose OUTPUT is exact.

Two production patterns for frequency/distinct questions at 100 TB:

- ``heavy_hitters``: a sketch pass bounds the candidate set, an exact
  pass verifies it — the answer is exactly the true heavy-hitter set,
  so it oracle-checks against plain GROUP BY/HAVING SQL while never
  shuffling the long tail of keys.
- ``bitmap_distinct``: exact distinct counts via mergeable bitmap
  partials (Spark 4 ``bitmap_construct_agg``) — the scalable exact
  alternative to ``count(DISTINCT ...)``'s expand-based plan, and the
  building block for incrementally-maintained distinct rollups
  (daily bitmap partials OR-merge without re-reading history).

These complement the *approximate* tier (hll_sketch_agg in
queries.sketch_distinct_customers, KLL in queries.acctbal_kll_quantiles):
same mergeable-partial shape, but the bitmap/verified outputs are exact,
which is what billing-grade rollups need.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def heavy_hitters(
    df: DataFrame,
    key: str,
    denom: int = 200,
    freq_items_slack: float = 0.8,
) -> DataFrame:
    """Exact keys occurring in more than ``1/denom`` of rows, via the
    classic two-pass sketch-then-verify plan:

    1. Candidate pass: ``DataFrame.freqItems`` (Karp/Misra–Gries
       streaming majority) with support ``freq_items_slack / denom`` —
       guaranteed a SUPERSET of the true heavy hitters, and at most
       ``denom / freq_items_slack`` candidates, so the driver collect
       is bounded regardless of key cardinality.
    2. Verify pass: exact counts restricted to the candidates (an
       IN-list filter that pushes to the scan), filtered by the integer
       cross-multiplied threshold ``n * denom >= total`` — no float
       support×total product that could straddle a rounding boundary
       between engines.

    NULL keys are counted as their own group, matching SQL GROUP BY /
    HAVING on a nullable key: the verify filter's IN-list alone would
    silently drop them (three-valued IN semantics — NULL IN (...) is
    never true), so an explicit ``isNull()`` branch is OR-ed in. NULL is
    a single extra group, so the candidate-set bound still holds.

    At 100 TB the first pass shuffles nothing (freqItems is a map-side
    fold + driver merge) and the second shuffles only rows whose key is
    one of ≤ denom/slack candidates (plus the NULL group). Compare the
    naive GROUP BY over every key: same answer, but its shuffle carries
    the full long tail. Returns (key, n, share) with
    share = round(n/total, 4).
    """
    support = freq_items_slack / denom
    cand = df.stat.freqItems([key], support).collect()[0][0]
    total = df.groupBy().agg(F.count(F.lit(1)).alias("total"))
    counts = (
        df.filter(F.col(key).isin(list(cand)) | F.col(key).isNull())
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("n") * F.lit(denom) >= F.col("total"))
        .select(
            key,
            F.col("n").cast("long").alias("n"),
            F.round(F.col("n") * 1.0 / F.col("total"), 4).alias("share"),
        )
    )


def bitmap_distinct(
    df: DataFrame,
    group_cols: list[str],
    key: str,
    out_col: str = "n_distinct",
) -> DataFrame:
    """Exact per-group distinct count of an integer key via two-level
    bitmap aggregation:

    1. group + bucket level: ``bitmap_construct_agg(bitmap_bit_position
       (key))`` builds one ≤4 KB bitmap per (group, bucket-of-32768-keys)
       — partial aggregation compresses each partition's keys into
       bitmaps BEFORE the shuffle, so the exchange carries dense bitsets,
       not raw keys.
    2. group level: ``sum(bitmap_count(...))`` — buckets partition the
       key space, so per-bucket cardinalities add exactly.

    Same answer as ``count(DISTINCT key)``, but the plan has no Expand
    and the partials are mergeable: materialize level 1 per day and
    ``bitmap_or_agg`` merges history without re-reading it (the
    incremental-rollup path; cf. operators/incremental.py).
    """
    level1 = df.groupBy(
        *group_cols, F.bitmap_bucket_number(F.col(key)).alias("__bucket")
    ).agg(
        F.bitmap_construct_agg(F.bitmap_bit_position(F.col(key))).alias("__bm")
    )
    return level1.groupBy(*group_cols).agg(
        F.sum(F.bitmap_count(F.col("__bm"))).cast("long").alias(out_col)
    )
