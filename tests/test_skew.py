"""Skew kernels must produce exactly the same results as their naive
single-task counterparts."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from solarboat_data_pipeline_spark.operators.skew import (
    salted_topk,
    two_phase_count_distinct,
)


def _skewed(spark):
    # key 'hot' holds 10k rows, others 10 each
    hot = spark.range(10_000).select(
        F.lit("hot").alias("k"), (F.col("id") % 997).alias("v"), F.col("id").alias("rid")
    )
    cold = spark.range(100).select(
        F.concat(F.lit("c"), (F.col("id") % 10).cast("string")).alias("k"),
        F.col("id").alias("v"),
        (F.col("id") + 1_000_000).alias("rid"),
    )
    return hot.unionByName(cold)


def test_two_phase_count_distinct_matches_exact(spark):
    df = _skewed(spark)
    got = {
        r["k"]: r["n_distinct"]
        for r in two_phase_count_distinct(df, ["k"], "v").collect()
    }
    want = {
        r["k"]: r["n"]
        for r in df.groupBy("k").agg(F.countDistinct("v").alias("n")).collect()
    }
    assert got == want
    assert got["hot"] == 997


def test_salted_topk_matches_plain_window(spark):
    df = _skewed(spark)
    got = {
        (r["k"], r["rank"]): r["v"]
        for r in salted_topk(df, ["k"], "v", k=5, salt_on="rid").collect()
    }
    w = Window.partitionBy("k").orderBy(F.col("v").desc())
    want = {
        (r["k"], r["rank"]): r["v"]
        for r in df.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .collect()
    }
    assert got == want
