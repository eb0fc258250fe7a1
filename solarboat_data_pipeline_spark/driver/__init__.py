"""Driver-contract query catalog, split by operator family.

The public surface stays `solarboat_data_pipeline_spark.driver_queries`
(the facade defines the window/rotation order); these modules hold the
per-family query implementations and register into the shared registry
at import time.
"""
