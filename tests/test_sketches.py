"""Sketch-then-verify operators: exact outputs, bounded sketch passes."""

from __future__ import annotations

from pyspark.sql import functions as F

from chicago_crime_spark_ml_spark.operators.sketches import (
    bitmap_distinct,
    heavy_hitters,
)
from chicago_crime_spark_ml_spark.plans import explain_str


def test_heavy_hitters_equals_exact_groupby(spark):
    # skewed synthetic with keys straddling the 1/20 threshold:
    # total 200 rows -> threshold n*20 >= 200 i.e. n >= 10.
    rows = (
        [("hot",)] * 100  # far above
        + [("edge",)] * 10  # exactly at threshold (>= keeps it)
        + [("near",)] * 9  # one below (dropped)
        + [(f"t{i}",) for i in range(81)]  # long tail of singletons
    )
    df = spark.createDataFrame(rows, "k string").repartition(8)
    got = {(r.k, r.n) for r in heavy_hitters(df, "k", denom=20).collect()}
    exact = {
        (r.k, r.n)
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") * 20 >= F.lit(len(rows)))
        .collect()
    }
    assert got == exact == {("hot", 100), ("edge", 10)}


def test_heavy_hitters_null_key_group(spark):
    # A NULL key that IS a true heavy hitter must be reported, matching
    # SQL GROUP BY/HAVING on a nullable key. The IN-list verify filter
    # alone drops NULLs (three-valued IN), so the operator OR-s in an
    # isNull() branch — this pins that behavior.
    rows = [(None,)] * 10 + [("a",)] * 2
    df = spark.createDataFrame(rows, "k string").repartition(4)
    got = {(r.k, r.n) for r in heavy_hitters(df, "k", denom=4).collect()}
    assert got == {(None, 10)}


def test_heavy_hitters_share_column(spark):
    df = spark.createDataFrame([("a",)] * 3 + [("b",)], "k string")
    out = {r.k: r.share for r in heavy_hitters(df, "k", denom=2).collect()}
    assert out == {"a": 0.75}


def test_bitmap_distinct_equals_count_distinct(spark, sf_dir):
    from chicago_crime_spark_ml_spark.sources.io import load_table

    o = load_table(spark, sf_dir, "orders")
    got = {
        (r.o_orderpriority, r.n)
        for r in bitmap_distinct(
            o, ["o_orderpriority"], "o_custkey", out_col="n"
        ).collect()
    }
    exact = {
        (r.o_orderpriority, r.n)
        for r in o.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert got == exact


def test_bitmap_distinct_plan_shape(spark, sf_dir):
    # two exchanges (group+bucket, then group), bitmaps built map-side
    # before the first, and no Expand anywhere
    from chicago_crime_spark_ml_spark.sources.io import load_table

    o = load_table(spark, sf_dir, "orders")
    plan = explain_str(
        bitmap_distinct(o, ["o_orderpriority"], "o_custkey"), "simple"
    )
    assert "Expand" not in plan
    assert plan.count("Exchange") <= 2
    assert "bitmap_construct_agg" in plan


def test_bitmap_partials_or_merge(spark):
    # the incremental-rollup contract: day-level bitmap partials OR-merge
    # to the same distinct count as a full recompute over the union
    df = spark.createDataFrame(
        [(d, k) for d in (1, 2) for k in range(50 * d, 50 * d + 60)],
        "day int, k int",
    )
    partials = df.groupBy(
        "day", F.bitmap_bucket_number("k").alias("b")
    ).agg(F.bitmap_construct_agg(F.bitmap_bit_position("k")).alias("bm"))
    merged = (
        partials.groupBy("b")
        .agg(F.bitmap_or_agg("bm").alias("bm"))
        .agg(F.sum(F.bitmap_count("bm")).alias("n"))
    )
    assert merged.collect()[0].n == df.select("k").distinct().count()
