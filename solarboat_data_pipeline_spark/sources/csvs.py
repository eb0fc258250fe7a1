"""CSV enrichment sources (S3): Solcast forecast and GPS track CSVs."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def scan_forecast_csv(spark: SparkSession, path: str, prefix: str = "solcast_") -> DataFrame:
    """Forecast CSV with ``PeriodStart`` index and ``solcast_`` prefix
    (``lib/unifier_with_forecast_data.py:50-56``). The timestamp column is
    parsed (tz-aware ISO8601 → UTC) and named ``timestamp``."""
    raw = spark.read.csv(path, header=True, inferSchema=True)
    ts = F.to_timestamp("PeriodStart")
    value_cols = [c for c in raw.columns if c != "PeriodStart"]
    return raw.select(
        ts.alias("timestamp"),
        *[F.col(c).alias(prefix + c) for c in value_cols],
    )


def scan_gps_csv(spark: SparkSession, path: str, prefix: str = "gps_") -> DataFrame:
    """GPS track CSV (``lib/process_gpx_data.py:142-151``): ``timestamp``
    index, ``gps_`` prefix on value columns, null rows dropped."""
    raw = spark.read.csv(path, header=True, inferSchema=True)
    value_cols = [c for c in raw.columns if c != "timestamp"]
    return raw.select(
        F.to_timestamp("timestamp").alias("timestamp"),
        *[F.col(c).alias(prefix + c) for c in value_cols],
    ).na.drop()
