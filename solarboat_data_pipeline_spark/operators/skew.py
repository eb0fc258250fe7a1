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


def _select_rank(
    df: DataFrame,
    col: str,
    k: int,
    accuracy: int,
    driver_threshold: int,
    depth: int = 0,
) -> float:
    """Exact value at 0-indexed sorted rank ``k`` among ``df[col]`` rows,
    with bounded memory everywhere: approx-percentile brackets the rank,
    conditional counts resolve boundary duplicates, and only the strictly
    interior band (≈ 4·N/accuracy rows by the approx error guarantee) is
    ever collected. Recurses (rare: N ≳ accuracy·threshold/4) on the band
    with a rank shifted by the rows excluded below it."""
    n = df.count()
    if n <= driver_threshold:
        vals = sorted(r[0] for r in df.select(col).collect())
        return vals[k]
    # bracket: approx values at fractions ±2/accuracy around the target
    # rank; the sketch's rank error is ≤ N/accuracy, so lo's true rank is
    # < k and hi's is > k. Clamp with global min/max at the edges.
    f = k / (n - 1)
    eps = 2.0 / accuracy
    lo_f, hi_f = max(0.0, f - eps), min(1.0, f + eps)
    row = df.agg(
        F.expr(
            f"percentile_approx({col}, array({lo_f}, {hi_f}), {accuracy})"
        ).alias("b"),
        F.min(col).alias("mn"),
        F.max(col).alias("mx"),
    ).first()
    lo = row["mn"] if lo_f == 0.0 else row["b"][0]
    hi = row["mx"] if hi_f == 1.0 else row["b"][1]
    c = F.col(col)
    cnt = df.agg(
        F.sum((c < lo).cast("long")).alias("lt_lo"),
        F.sum((c == lo).cast("long")).alias("eq_lo"),
        F.sum((c < hi).cast("long")).alias("lt_hi"),
        F.sum((c == hi).cast("long")).alias("eq_hi"),
    ).first()
    if cnt["lt_lo"] <= k < cnt["lt_lo"] + cnt["eq_lo"]:
        return lo
    if cnt["lt_hi"] <= k < cnt["lt_hi"] + cnt["eq_hi"]:
        return hi
    band = df.where((c > lo) & (c < hi))
    return _select_rank(
        band,
        col,
        k - cnt["lt_lo"] - cnt["eq_lo"],
        accuracy,
        driver_threshold,
        depth + 1,
    )


def _select_ranks_batched(
    df: DataFrame,
    col: str,
    ks: Sequence[int],
    n: int,
    accuracy: int,
    driver_threshold: int,
) -> dict[int, float]:
    """Resolve MANY sorted-rank lookups with shared full scans: one
    ``percentile_approx`` pass brackets every rank at once, one conditional
    -count pass classifies every bracket boundary, and only ranks that
    land strictly inside their band (≈ 4N/accuracy rows each) fall back to
    the per-rank recursion. O(1) full scans total instead of O(#ranks)."""
    c = F.col(col)
    fracs = []
    for k in ks:
        f = k / (n - 1) if n > 1 else 0.0
        eps = 2.0 / accuracy
        fracs.append((max(0.0, f - eps), min(1.0, f + eps)))
    flat = sorted({x for pair in fracs for x in pair})
    arr = ", ".join(repr(x) for x in flat)
    row = df.agg(
        F.expr(f"percentile_approx({col}, array({arr}), {accuracy})").alias("b"),
        F.min(col).alias("mn"),
        F.max(col).alias("mx"),
    ).first()
    approx = dict(zip(flat, row["b"]))
    bounds = {}
    for k, (lo_f, hi_f) in zip(ks, fracs):
        lo = row["mn"] if lo_f == 0.0 else approx[lo_f]
        hi = row["mx"] if hi_f == 1.0 else approx[hi_f]
        bounds[k] = (lo, hi)
    edges = sorted({v for b in bounds.values() for v in b})
    cnt = df.agg(
        *[F.sum((c < v).cast("long")).alias(f"lt_{i}") for i, v in enumerate(edges)],
        *[F.sum((c == v).cast("long")).alias(f"eq_{i}") for i, v in enumerate(edges)],
    ).first()
    lt = {v: cnt[f"lt_{i}"] for i, v in enumerate(edges)}
    eq = {v: cnt[f"eq_{i}"] for i, v in enumerate(edges)}
    out: dict[int, float] = {}
    for k in ks:
        lo, hi = bounds[k]
        if lt[lo] <= k < lt[lo] + eq[lo]:
            out[k] = lo
        elif lt[hi] <= k < lt[hi] + eq[hi]:
            out[k] = hi
        else:
            band = df.where((c > lo) & (c < hi))
            out[k] = _select_rank(
                band, col, k - lt[lo] - eq[lo], accuracy, driver_threshold
            )
    return out


def exact_quantile_cont(
    df: DataFrame,
    col: str,
    fractions: Sequence[float],
    accuracy: int = 10_000,
    driver_threshold: int = 1 << 20,
) -> list[float | None]:
    """Exact interpolated quantiles (SQL ``quantile_cont`` / pandas
    ``quantile``) with memory bounded at every stage — the scale-safe
    replacement for Spark's exact ``percentile`` aggregate, which
    materializes a value→count map of every distinct value on a single
    reducer (an OOM, not a slowdown, at 100 TB).

    Plan: per requested fraction p over N non-null rows, the result
    interpolates the sorted values at ranks ⌊(N-1)p⌋ and ⌈(N-1)p⌉. Small
    inputs (≤ ``driver_threshold``) collect ONCE and answer every rank
    from the same sorted array; large inputs resolve all ranks through
    ``_select_ranks_batched`` — a constant number of full aggregate passes
    regardless of how many quantiles were requested, plus collects of only
    the ≈ 4N/accuracy rows bracketing each rank. Everything driver-side is
    control flow on aggregate results (the AQE pattern), never data
    iteration.

    ``driver_threshold`` (default 2^20 = 1,048,576 rows) is the explicit
    cap on how many raw values may EVER be collected in one batch: it
    gates both the small-input direct path above and, inside
    ``_select_ranks_batched``, the width of each approx-bracketed band
    (a band still wider than the threshold recurses — shrinking by
    ~accuracy/4 per level — instead of collecting, and a single value
    repeated N times resolves through the boundary duplicate counts
    with no collect at all). One million float64s is ~8 MB on the driver —
    size it to driver memory, not data size; the recursion means the
    guarantee holds for any input distribution, including one value
    repeated N times."""
    filt = df.select(col).where(F.col(col).isNotNull())
    n = filt.count()
    if n == 0:
        return [None for _ in fractions]
    pos_k = [
        (p * (n - 1), int(p * (n - 1)), min(int(p * (n - 1)) + 1, n - 1))
        for p in fractions
    ]
    ks = sorted({k for _, k0, k1 in pos_k for k in (k0, k1)})
    if n <= driver_threshold:
        # Arrow batch transfer + numpy sort: ~10× the throughput of the
        # py4j row-at-a-time collect for a single numeric column
        import numpy as np

        vals = np.sort(filt.toPandas()[col].to_numpy())
        ranks = {k: float(vals[k]) for k in ks}
    else:
        ranks = _select_ranks_batched(
            filt, col, ks, n, accuracy, driver_threshold
        )
    return [
        ranks[k0] + (pos - k0) * (ranks[k1] - ranks[k0])
        for pos, k0, k1 in pos_k
    ]
