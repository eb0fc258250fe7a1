"""Bucketed-table layout: shuffle-free co-located joins and aggregations.

At 100 TB the dominant cost of a repeated equi-join or keyed aggregation is
its shuffle — every run re-hashes and re-ships the full fact table. Spark's
bucketed tables amortize that shuffle into the WRITE: both sides stored
with ``bucketBy(N, key)`` (and ``sortBy`` for sort-merge reuse) hash rows
into the same N files by the same function, so a join or ``groupBy`` on the
bucket key reads co-located partitions and plans **zero Exchange** — the
scan itself reports ``SelectedBucketsCount`` and the sort-merge join runs
directly on the bucketed scans. This is the standard warehouse layout for
fact tables joined on the same key by many queries (the reference has no
analogue — its "join" is a pandas ``merge`` inside one process; this module
is the 1000-executor replacement for that pattern).

Rules of thumb encoded here:

* ``num_buckets`` should target ~128-512 MB per bucket file at final table
  size; both join sides must use the SAME bucket count (Spark 4 can
  coalesce mismatched counts when one divides the other, but identical
  counts always avoid the shuffle).
* bucket pruning: an equality filter on the bucket key scans 1/N of the
  files (``SelectedBucketsCount: 1 out of N``) — point lookups on a
  100 TB table touch one bucket's worth of data.
* bucketed tables live in the session catalog (a metastore entry over
  parquet files); ``path=`` stores the data externally so the parquet
  remains readable by any engine.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int,
    sort_cols: Sequence[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and sorted) parquet table.

    ``sort_cols`` defaults to ``bucket_cols`` so sort-merge joins on the
    bucket key skip their per-partition sort as well as the shuffle.
    """
    writer = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(int(num_buckets), *bucket_cols)
        .sortBy(*(sort_cols if sort_cols is not None else bucket_cols))
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read that preserves the bucket layout (``spark.read.parquet``
    on the same files would discard it — bucketing metadata lives in the
    catalog entry, not the parquet footers)."""
    return spark.table(table)


def drop_bucketed(spark: SparkSession, table: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table}")
