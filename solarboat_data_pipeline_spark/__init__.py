"""PySpark-native analytics engine for solar-boat CAN telemetry pipelines.

A ground-up Spark reimplementation of the capabilities of the reference
pipeline (joaoantoniocardoso/solarboat_data_pipeline): candump parsing,
schema-driven binary decode, wide pivoting, fixed-period resampling with
bounded time interpolation, as-of enrichment joins (solar forecast, GPS),
plus large-scale training-data operators (dedup, similarity search, text
analysis, multimodal column plumbing).

Everything is expressed declaratively with the DataFrame API so Catalyst
can push filters, prune columns, broadcast small joins and keep the hot
path inside whole-stage codegen. The engine is designed for a large
multi-executor cluster (partition-key parameters on every ordered
operator); it is merely *tested* on local[N].
"""

__version__ = "0.1.0"

from solarboat_data_pipeline_spark.session import get_spark  # noqa: F401
