"""Skew-kernel driver queries (salted top-k, two-phase count-distinct).

Split out of driver_queries.py (round 9); conventions in the facade
docstring there.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


from solarboat_data_pipeline_spark.driver._registry import (  # noqa: F401
    _t,
    register,
)



@register(
    "skew_salted_topk",
    """
    WITH ranked AS (
      SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY value DESC, event_id DESC) AS rank
      FROM events WHERE value IS NOT NULL)
    SELECT user_id, event_id, round(value, 6) AS value, rank::BIGINT AS rank
    FROM ranked WHERE rank <= 3
    """,
)
def skew_salted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # two-phase salted top-k must equal the plain window top-k; event_id in
    # the order breaks value ties deterministically
    from solarboat_data_pipeline_spark.operators.skew import salted_topk

    ev = (
        _t(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select("user_id", "event_id", "value")
        .withColumn("__ord", F.struct("value", "event_id"))
    )
    out = salted_topk(ev, ["user_id"], "__ord", k=3, salt_on="event_id")
    return out.select(
        "user_id",
        "event_id",
        F.round("value", 6).alias("value"),
        F.col("rank").cast("long").alias("rank"),
    )


@register(
    "skew_count_distinct",
    """
    SELECT user_id, count(DISTINCT event_type) AS n_distinct
    FROM events GROUP BY user_id
    """,
)
def skew_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    # two-phase exact distinct count: no single task ever aggregates a hot
    # key's full value set (dedup spreads it across #distinct-value tasks)
    from solarboat_data_pipeline_spark.operators.skew import (
        two_phase_count_distinct,
    )

    ev = _t(spark, sf_dir, "events").select("user_id", "event_type")
    return two_phase_count_distinct(ev, ["user_id"], "event_type")
