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


def test_exact_quantile_cont_matches_numpy(spark):
    import numpy as np

    from solarboat_data_pipeline_spark.operators.skew import exact_quantile_cont

    rng = np.random.RandomState(7)
    vals = np.concatenate(
        [rng.lognormal(3, 2, 5000), np.full(2000, 42.0), rng.uniform(-5, 5, 3000)]
    )
    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    fracs = [0.0, 0.01, 0.25, 0.5, 0.99, 1.0]
    got = exact_quantile_cont(df, "x", fracs)
    want = np.quantile(vals, fracs)  # numpy default = linear interpolation
    for g, w in zip(got, want):
        assert abs(g - w) < 1e-9 * max(1.0, abs(w)), (g, w)


def test_exact_quantile_cont_recursion_path(spark):
    # driver_threshold below N forces the bracket/count/recurse machinery
    import numpy as np

    from solarboat_data_pipeline_spark.operators.skew import exact_quantile_cont

    rng = np.random.RandomState(11)
    vals = rng.normal(0, 100, 4000)
    vals[1000:1500] = 7.0  # a heavy duplicate the brackets may land on
    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    fracs = [0.3, 0.5, 0.9]
    got = exact_quantile_cont(
        df, "x", fracs, accuracy=200, driver_threshold=100
    )
    want = np.quantile(vals, fracs)
    for g, w in zip(got, want):
        assert abs(g - w) < 1e-9 * max(1.0, abs(w)), (g, w)


def test_exact_quantile_cont_empty_and_nulls(spark):
    from solarboat_data_pipeline_spark.operators.skew import exact_quantile_cont

    empty = spark.createDataFrame([], "x double")
    assert exact_quantile_cont(empty, "x", [0.5]) == [None]
    with_nulls = spark.createDataFrame(
        [(None,), (1.0,), (None,), (3.0,)], "x double"
    )
    assert exact_quantile_cont(with_nulls, "x", [0.5]) == [2.0]
