"""Driver contract for the PySpark engine.

``entry(spark)`` runs the flagship pricing-summary aggregation at sf0.001;
``queries()`` exposes one callable per implemented operator from
SURVEY.md §2 (plus the LLM-data-pipeline operator family); ``oracle_sql()``
holds the DuckDB-equivalent SQL per query (omitted only for genuinely
non-SQL-expressible ops, which the driver checks rows-only).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from solarboat_data_pipeline_spark import driver_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    sf_dir = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")
    return driver_queries.q1_pricing_summary(spark, sf_dir)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return driver_queries.queries()


def oracle_sql() -> dict[str, str]:
    return driver_queries.oracle_sql()
