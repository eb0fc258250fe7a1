"""Skew-mitigation kernels for hot keys.

Plain ``groupBy().sum()`` is already skew-tolerant (map-side partial
aggregation reduces before the shuffle), and AQE handles skewed sort-merge
joins. The shapes that DO funnel a hot key through one task are exact
distinct-counting and per-key ordered top-k — these kernels restructure
them into two phases so no single task ever sees a whole hot key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def two_phase_count_distinct(
    df: DataFrame, keys: Sequence[str], col: str, out_col: str = "n_distinct"
) -> DataFrame:
    """Skew-safe exact ``countDistinct(col)`` per key.

    ``countDistinct`` plans an expand + single aggregation where a hot
    key's whole value set converges on one task. Phase 1 here dedups on
    (keys, col) — partial aggregation kills duplicates map-side, and the
    shuffle spreads a hot key across `#distinct values` tasks; phase 2
    counts the survivors with another partial-agg-friendly count."""
    return (
        df.select(*keys, col)
        .distinct()
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias(out_col))
    )


def salted_topk(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_col: str,
    k: int,
    n_salts: int = 32,
    descending: bool = True,
    salt_on: str | None = None,
) -> DataFrame:
    """Per-key top-k by ``order_col`` without a hot-key window sort.

    A plain ``row_number().over(partitionBy(key))`` sorts EVERY row of a
    hot key in one task. Phase 1 takes top-k within (key, salt) — each
    salt shard sorts only its slice; phase 2 re-ranks the ≤ k·n_salts
    survivors per key, a bounded amount of data regardless of key size.

    The salt hashes ``salt_on`` (a stable column, e.g. a row id) or uses a
    deterministic spread over ``order_col`` — results are identical to the
    unsalted top-k (modulo ties, broken by ``order_col`` only)."""
    order = F.col(order_col).desc() if descending else F.col(order_col).asc()
    salt_src = F.col(salt_on) if salt_on else F.col(order_col)
    salted = df.withColumn("__salt", F.pmod(F.hash(salt_src), F.lit(n_salts)))
    w1 = Window.partitionBy(*partition_cols, "__salt").orderBy(order)
    phase1 = (
        salted.withColumn("__rn", F.row_number().over(w1))
        .where(F.col("__rn") <= k)
        .drop("__rn", "__salt")
    )
    w2 = Window.partitionBy(*partition_cols).orderBy(order)
    return (
        phase1.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
    )
