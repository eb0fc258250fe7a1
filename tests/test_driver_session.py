"""Regression tests for the round-1 environment failure mode: the DRIVER
builds its own SparkSession (unknown timezone, vanilla confs) and the
fixtures' naive timestamp[us] parquet reads as TIMESTAMP_NTZ there. The
scan wrapper and every time operator must survive both."""

import pyarrow.parquet as pq
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType, TimestampType

from solarboat_data_pipeline_spark import driver_queries as dq
from solarboat_data_pipeline_spark.operators import timeseries as ts

from tests.conftest import TESTDATA_ROOT

SF_DIR = f"{TESTDATA_ROOT}/sf0.001"


def test_t_normalizes_ntz_under_foreign_timezone(spark):
    # a sibling session with a non-UTC zone, as a third-party driver might
    s2 = spark.newSession()
    s2.conf.set("spark.sql.session.timeZone", "America/New_York")
    df = dq._t(s2, SF_DIR, "events")
    assert isinstance(df.schema["ts"].dataType, TimestampType)
    got = df.agg(F.min("ts").alias("m")).first()["m"]
    # the parquet's naive values ARE the UTC instants; _t pins the session
    # to UTC before casting, so the collected naive datetime must equal
    # the raw stored minimum exactly
    want = (
        pq.read_table(f"{SF_DIR}/events.parquet", columns=["ts"])["ts"]
        .to_pandas()
        .min()
        .to_pydatetime()
    )
    assert got == want


def test_time_operators_accept_raw_ntz_input(spark):
    raw = spark.read.parquet(f"{SF_DIR}/events.parquet")
    assert isinstance(raw.schema["ts"].dataType, TimestampNTZType)
    # ordered kernels must plan and run on NTZ directly (the _us cast)
    out = ts.cumulative_sum(
        raw, "value", "out", order_cols=["ts", "event_id"]
    )
    assert out.count() == raw.count()
    res = ts.resample_mean(
        raw.select(F.col("ts").alias("timestamp"), "value"),
        3600.0,
        value_cols=["value"],
    )
    assert res.count() > 0
