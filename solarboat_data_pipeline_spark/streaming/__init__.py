"""Structured Streaming variants of the batch pipeline stages."""

from solarboat_data_pipeline_spark.streaming.pipeline import (
    stream_candump,
    stream_decode_long,
    stream_decode_wide,
    stream_dedup_exact,
    stream_enrich_grid,
    stream_resample_mean,
    stream_sessionize,
    write_parquet_stream,
)
from solarboat_data_pipeline_spark.streaming.stateful import (
    stream_asof_backward,
    stream_ffill,
)

__all__ = [
    "stream_asof_backward",
    "stream_candump",
    "stream_decode_long",
    "stream_decode_wide",
    "stream_dedup_exact",
    "stream_enrich_grid",
    "stream_resample_mean",
    "stream_sessionize",
    "stream_ffill",
    "write_parquet_stream",
]
