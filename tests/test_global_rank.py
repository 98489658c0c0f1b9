"""global_rank: distributed row_number ≡ the single-partition window."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from chicago_crime_spark_ml_spark.operators.relational import global_rank
from chicago_crime_spark_ml_spark.plans import explain_str
from chicago_crime_spark_ml_spark.sources.io import load_table


def test_global_rank_equals_global_window(spark, sf_dir):
    rev = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("r"))
    )
    got = {
        (row.o_custkey, row.rnk)
        for row in global_rank(
            rev, [F.desc("r"), F.asc("o_custkey")], out_col="rnk"
        ).collect()
    }
    want = {
        (row.o_custkey, row.rnk)
        for row in rev.withColumn(
            "rnk",
            F.row_number().over(
                Window.orderBy(F.desc("r"), F.asc("o_custkey"))
            ),
        ).collect()
    }
    assert got == want


def test_global_rank_with_heavy_ties_and_many_partitions(spark):
    # only 3 distinct values over 5000 rows + unique tiebreak: ties pack
    # entire range partitions; offsets must still produce the exact
    # global sequence 1..5000
    df = spark.range(0, 5000, 1, 16).select(
        (F.col("id") % 3).alias("v"), F.col("id").alias("uid")
    )
    out = global_rank(df, ["v", "uid"], out_col="rnk", num_partitions=16)
    rows = out.orderBy("rnk").collect()
    assert [r.rnk for r in rows] == list(range(1, 5001))
    # rank order must equal the (v, uid) lexicographic order
    assert [(r.v, r.uid) for r in rows] == sorted(
        [(i % 3, i) for i in range(5000)]
    )


def test_global_rank_plan_is_range_partitioned(spark, sf_dir):
    rev = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("r"))
    )
    plan = explain_str(
        global_rank(rev, [F.desc("r"), F.asc("o_custkey")]), "simple"
    )
    # ranked via a range-partitioned exchange + partitioned window —
    # never the single-partition SinglePartition/Window.orderBy shape
    assert "rangepartitioning" in plan
    assert "SinglePartition" not in plan


def test_global_rank_empty_frame(spark):
    df = spark.range(0).select(F.col("id").alias("v"))
    assert global_rank(df, ["v"]).count() == 0
