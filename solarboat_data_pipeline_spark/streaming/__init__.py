"""Structured Streaming variants of the batch pipeline stages."""

from solarboat_data_pipeline_spark.streaming.pipeline import (
    stream_candump,
    stream_decode_long,
    stream_resample_mean,
    write_parquet_stream,
)

__all__ = [
    "stream_candump",
    "stream_decode_long",
    "stream_resample_mean",
    "write_parquet_stream",
]
