"""Date-partitioned parquet layout: writes partitioned by date and proves
partition pruning fires on re-read (the 100 TB re-scan path — a day query
must touch one directory, not the whole lake)."""

from pyspark.sql import functions as F

from solarboat_data_pipeline_spark.plans.audit import explain_string
from solarboat_data_pipeline_spark.sources.sinks import write_parquet


def test_partitioned_write_prunes_on_read(spark, tmp_path):
    out = str(tmp_path / "telemetry")
    df = spark.range(1000).select(
        F.timestamp_seconds(F.lit(1700000000) + F.col("id") * 600).alias("timestamp"),
        (F.col("id") % 7).cast("double").alias("value"),
    ).withColumn("date", F.to_date("timestamp"))
    write_parquet(df, out, mode="overwrite", partition_by=["date"])

    back = spark.read.parquet(out).where(F.col("date") == "2023-11-15")
    plan = explain_string(back)
    assert "PartitionFilters" in plan
    # the date predicate must appear as a partition filter, not a data filter
    assert any(
        "date" in line and "PartitionFilters" in line
        for line in plan.splitlines()
    ), plan
    n = back.count()
    assert 0 < n < 1000


def test_mode_ignore_is_idempotent(spark, tmp_path):
    # K5: second write with mode="ignore" leaves the first result intact
    out = str(tmp_path / "once")
    df1 = spark.range(10).select(F.col("id"))
    df2 = spark.range(99).select(F.col("id"))
    write_parquet(df1, out)
    write_parquet(df2, out, mode="ignore")
    assert spark.read.parquet(out).count() == 10
