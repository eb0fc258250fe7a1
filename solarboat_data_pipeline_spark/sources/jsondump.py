"""JSON DB-dump source (S5) and candump-text round-trip (K4).

Reference: ``convert_json_to_candump.py`` — a JSON array of
``{bytes: ["159", ...], date: "YYYY-MM-DD HH:MM:SS.mmm", mod, top}``
records becomes candump text lines ``(epoch) can0 TTT#MMpayload``.
Quirks preserved: the date string is interpreted as naive UTC
(``np.datetime64`` arithmetic, no tz shift — verified by the reference's
own golden assert), empty ``bytes`` arrays are skipped, and rows whose
payload would be malformed (module id > 255 — the reference ``exit(-1)`` s)
are dropped with a flag column instead of killing the job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from solarboat_data_pipeline_spark.functions.formatting import (
    candump_line,
    payload_from_int_array,
)


def scan_json_dump(spark: SparkSession, path: str) -> DataFrame:
    """S5: streaming read of the JSON array dump (multiLine)."""
    df = spark.read.option("multiLine", "true").json(path)
    return df.select(
        F.col("bytes").cast("array<int>").alias("bytes"),
        F.to_timestamp("date").alias("date"),
        F.col("mod").cast("int").alias("mod"),
        F.col("top").cast("int").alias("top"),
    )


def json_dump_to_candump(df: DataFrame) -> DataFrame:
    """K4: format records into candump lines; returns ``value`` (the line)
    plus a ``valid`` flag (module ≤ 255, non-empty bytes)."""
    epoch = F.unix_micros(F.col("date").cast("timestamp")) / 1_000_000.0
    payload = payload_from_int_array(F.col("bytes"), F.col("mod"))
    line = candump_line(epoch, F.col("top"), payload)
    return df.select(
        line.alias("value"),
        (
            (F.size("bytes") > 0)
            & (F.col("mod") <= 255)
            & (F.col("mod") >= 0)
        ).alias("valid"),
    )
