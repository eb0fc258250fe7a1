"""Sinks (K1-K5).

The reference's HDF5 exports become Parquet (columnar at rest, vectorized
scan); its skip-if-exists restartability (K5, ``lib/canparser.py:315-317``)
maps onto deterministic output paths + ``mode("ignore")``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "error",
    partition_by: list[str] | None = None,
) -> None:
    """K1. ``mode="ignore"`` gives K5 idempotent-restart semantics: an
    existing output directory is left untouched. ``partition_by`` (e.g. a
    date column) enables partition pruning downstream."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "error") -> None:
    """K2 (``to_csv`` sinks)."""
    df.write.mode(mode).option("header", "true").csv(path)


def write_json_records(df: DataFrame, path: str, mode: str = "error") -> None:
    """K3 (``to_json(orient="records")``)."""
    df.write.mode(mode).json(path)


def write_text(df: DataFrame, path: str, mode: str = "error") -> None:
    """K4 final hop: a single string column → text lines."""
    df.write.mode(mode).text(path)
