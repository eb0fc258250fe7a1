"""Deterministic sampling / dataset-mixing operators.

Training-data pipelines at 100 TB need *reproducible* subsetting: a
sample defined by a pure function of the row key, not by an RNG whose
output depends on partitioning or task retries. Everything here keys off
the md5-based 32-bit hash (``text.h32``), so

* re-running the job — on any cluster size, with any partition layout —
  selects the identical row set;
* the sample composes with incremental loads (a row's fate never changes
  as new data arrives);
* each operator has an exactly mirrorable ANSI-SQL oracle.

Scale design: ``hash_sample`` and ``weighted_mix`` are per-row
expressions (no shuffle, whole-stage codegen end to end, filter runs
before any downstream exchange). ``stratified_sample`` is a per-stratum
top-k window: one shuffle on the stratum key; for heavy skew (one
stratum ≫ others) compose with ``skew.salted_topk`` instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from solarboat_data_pipeline_spark.operators.text import h32

# granularity of sampling rates: rates are expressed in basis points
# (1/10_000) so 0.01 % granularity survives integer arithmetic identically
# in Spark and the SQL oracle.
RATE_DENOM = 10_000


def sample_bucket(key: Column, salt: str = "") -> Column:
    """Stable bucket in [0, RATE_DENOM) for a row key; pure expression."""
    return h32(key.cast("string"), salt=salt) % RATE_DENOM


def hash_sample(
    df: DataFrame, key_col: str, rate: float, salt: str = ""
) -> DataFrame:
    """Deterministic Bernoulli-style sample: keep rows whose hash bucket
    falls below ``rate`` (fraction in [0,1]). The reference pipeline has no
    sampling operator; this is part of the LLM-data-pipeline extension
    family (BASELINE.json north star)."""
    return df.filter(sample_bucket(F.col(key_col), salt) < int(rate * RATE_DENOM))


def weighted_mix(
    df: DataFrame, source_col: str, key_col: str, rates: dict[str, float], salt: str = ""
) -> DataFrame:
    """Mix data sources at per-source rates in ONE pass (the standard
    "dataset mixture weights" step of a pretraining pipeline). Sources
    absent from ``rates`` are dropped. Pure per-row expression — at 100 TB
    this runs inside the scan stage with zero shuffles."""
    rate_expr: Column = F.lit(0)
    for src, rate in sorted(rates.items()):
        rate_expr = (
            F.when(F.col(source_col) == src, F.lit(int(rate * RATE_DENOM)))
            .otherwise(rate_expr)
        )
    return df.filter(sample_bucket(F.col(key_col), salt) < rate_expr)


def stratified_sample(
    df: DataFrame, strata_col: str, key_col: str, k: int, salt: str = ""
) -> DataFrame:
    """Deterministic per-stratum quota: the k rows with the smallest hash
    per stratum (a reproducible stand-in for per-group reservoir
    sampling). Ties broken by the key itself so the result is unique.
    One shuffle (hash-partition by stratum); map-side nothing to combine,
    but the window is bounded (rank ≤ k) so state per stratum is O(k)."""
    w = Window.partitionBy(strata_col).orderBy(
        sample_bucket(F.col(key_col), salt), F.col(key_col)
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def token_budget_sample(
    df: DataFrame,
    budget_tokens: int,
    size_col: Column | str,
    key_col: str,
    strata_col: str | None = None,
    salt: str = "",
) -> DataFrame:
    """Greedy prefix sample to a TOKEN budget (pretraining corpora are
    sized in tokens, not rows): rows are taken in deterministic hash
    order until the running token total would exceed ``budget_tokens`` —
    per stratum when ``strata_col`` is given, globally otherwise.

    The kept set is a pure function of (key, salt, sizes): re-runs, other
    cluster layouts, and retries select the identical rows, and the
    greedy-prefix rule makes the sample maximal (the next candidate in
    hash order would overflow the budget — rows after a too-big document
    are NOT pulled forward, matching the SQL-mirrorable prefix rule).

    One shuffle on the stratum key. A single giant stratum funnels its
    running sum through one task — for that shape use
    :func:`token_budget_sample_bucketed`, which distributes the prefix
    over hash-range buckets exactly as :mod:`.scale` does for time."""
    size = F.col(size_col) if isinstance(size_col, str) else size_col
    parts = [strata_col] if strata_col else []
    w = (
        Window.partitionBy(*parts)
        .orderBy(sample_bucket(F.col(key_col), salt), F.col(key_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        df.withColumn("__cum_tokens", F.sum(size).over(w))
        .filter(F.col("__cum_tokens") <= budget_tokens)
        .drop("__cum_tokens")
    )


def token_budget_sample_bucketed(
    df: DataFrame,
    budget_tokens: int,
    size_col: Column | str,
    key_col: str,
    strata_col: str | None = None,
    salt: str = "",
    num_buckets: int = 32,
) -> DataFrame:
    """:func:`token_budget_sample` for GIANT strata — identical kept set,
    distributed running sum (the two-pass prefix-scan shape of
    ``scale._scan_sum``, keyed on the hash instead of time):

    1. the [0, RATE_DENOM) hash space splits into ``num_buckets``
       contiguous ranges, so bucket id is a non-decreasing function of
       the global order key (bucket boundaries can't split the
       (hash, key) order);
    2. the running token sum runs per (stratum, bucket) — N parallel
       sorts of |stratum|/N rows instead of one straggler task;
    3. per-bucket totals aggregate to ≤ |strata|·num_buckets summary
       rows; their exclusive prefix (a window over the tiny summary)
       broadcasts back and shifts each bucket-local cumsum into the
       global one.

    Ties in the hash order by (bucket, key) exactly like the global
    form, so the greedy prefix keeps the identical row set."""
    size = F.col(size_col) if isinstance(size_col, str) else size_col
    parts = [strata_col] if strata_col else []
    width = -(-RATE_DENOM // num_buckets)  # ceil: covers the full range
    b = df.withColumn("__sb", sample_bucket(F.col(key_col), salt))
    b = b.withColumn("__hbkt", (F.col("__sb") / width).cast("int"))
    b = _bucketed_running_prefix(b, size, key_col, parts, hash_col="__sb")
    # exclusive global prefix + this row's size = the inclusive cumsum
    return b.filter(
        (F.col("__gpre") + size) <= budget_tokens
    ).drop("__sb", "__hbkt", "__gpre")


def _bucketed_running_prefix(
    b: DataFrame,
    size: Column,
    key_col: str,
    parts: list[str],
    hash_col: str,
    bucket_col: str = "__hbkt",
) -> DataFrame:
    """The shared two-level distributed running sum: adds ``__gpre`` =
    the EXCLUSIVE global prefix of ``size`` over the (hash, key) order
    within each ``parts`` group. Requires ``bucket_col`` to be a
    NON-DECREASING function of ``hash_col`` (contiguous hash ranges),
    so bucket-local cumsum windows (N parallel sorts) plus an exclusive
    prefix over the ≤ num_buckets bucket totals (a window over a tiny
    broadcast summary) compose to the exact global sum — never one
    global sort. Used by :func:`token_budget_sample_bucketed` and
    :func:`pack_sequences`."""
    w_local = (
        Window.partitionBy(*parts, bucket_col)
        .orderBy(hash_col, key_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    b = b.withColumn(
        "__pre_local", F.coalesce(F.sum(size).over(w_local), F.lit(0))
    )
    totals = b.groupBy(*parts, bucket_col).agg(F.sum(size).alias("__tot"))
    w_pre = (
        Window.partitionBy(*parts)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = totals.select(
        *parts,
        bucket_col,
        F.coalesce(F.sum("__tot").over(w_pre), F.lit(0)).alias("__pre"),
    )
    b = b.join(F.broadcast(prefix), [*parts, bucket_col], "left")
    return b.withColumn("__gpre", F.col("__pre") + F.col("__pre_local")).drop(
        "__pre_local", "__pre"
    )


def shard_corpus(
    df: DataFrame,
    n_shards: int,
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic global shuffle + sharding — the last step of
    training-data prep, where the curated corpus becomes N dataloader
    shards in a pseudorandom but REPRODUCIBLE order (no RNG: a task
    retry, a different cluster size, or a re-run from scratch produces
    byte-identical shards). Each row gets

    * ``shard``     — ``h32(salt ‖ key) % n_shards``, and
    * ``shard_pos`` — its 0-based position within the shard under the
      hash order (ties broken by key), i.e. the global pseudorandom
      order restricted to the shard.

    100 TB shape: ONE exchange on the shard id, then each task sorts
    only its own shard — pick ``n_shards`` so a shard fits a task (the
    standard corpus-shuffle layout; more shards = more parallelism AND
    smaller sorts, never a global sort). Writing the result with
    ``partitionBy("shard")`` + ``sortWithinPartitions("shard",
    "shard_pos")`` persists exactly what a dataloader consumes.
    ``salt`` reshuffles between epochs without touching the data."""
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    h = h32(F.col(key_col).cast("string"), salt=salt)
    w = Window.partitionBy("shard").orderBy("__h", key_col)
    return (
        df.withColumn("__h", h)
        .withColumn("shard", F.pmod(F.col("__h"), F.lit(n_shards)).cast("int"))
        .withColumn("shard_pos", (F.row_number().over(w) - 1).cast("long"))
        .drop("__h")
    )


def pack_sequences(
    df: DataFrame,
    block_tokens: int,
    size_col: str | Column,
    key_col: str = "doc_id",
    salt: str = "",
    num_buckets: int = 32,
    partition_col: str | None = None,
) -> DataFrame:
    """Concat-and-chunk sequence packing — the standard LLM-pretraining
    layout where the corpus is laid end to end as ONE deterministic
    pseudorandom token stream and split into fixed-``block_tokens``
    training sequences. Each row gets its exact slice of that stream:

    * ``start_tok``    — global 0-based position of the document's first
      token under the hash order (``h32(salt ‖ key)``, ties by key);
    * ``block_first`` / ``block_last`` — the training sequences the
      document lands in (a document spanning a boundary is split by the
      loader; zero-token documents sit degenerately at ``block_first``);
    * ``block_offset`` — ``start_tok % block_tokens``, where inside
      ``block_first`` its tokens begin.

    Deterministic like everything in this module: re-runs, retries and
    different cluster layouts produce the identical packing, and
    ``salt`` re-packs between epochs.

    ``partition_col`` scopes the token stream: with e.g.
    ``partition_col="shard"`` (the :func:`shard_corpus` output) every
    shard is its OWN 0-based stream, so each shard directory is
    self-contained — exactly what a per-shard dataloader consumes.
    Without it the stream (and the block ids) are corpus-global, which
    is the right shape when the blocks themselves are what gets
    sharded downstream.

    Scale: the global running sum uses the same two-level structure as
    :func:`token_budget_sample_bucketed` — ``num_buckets`` CONTIGUOUS
    hash ranges make the bucket id non-decreasing in the global order,
    so bucket-local cumsums (N parallel sorts of corpus/N rows) plus an
    exclusive prefix over the ≤``num_buckets`` bucket totals (a window
    over a tiny broadcast summary) reconstruct exact global positions —
    never one global sort."""
    if block_tokens <= 0:
        raise ValueError(f"block_tokens must be positive, got {block_tokens}")
    size = F.col(size_col) if isinstance(size_col, str) else size_col
    parts = [partition_col] if partition_col else []
    h = h32(F.col(key_col).cast("string"), salt=salt)
    width = -(-(1 << 32) // num_buckets)  # ceil: covers the full h32 range
    b = df.withColumn("__h", h).withColumn(
        "__hbkt", (F.col("__h") / width).cast("int")
    )
    b = _bucketed_running_prefix(b, size, key_col, parts, hash_col="__h")
    start = F.col("__gpre").cast("long")
    bf = F.floor(start / block_tokens).cast("long")
    return (
        b.withColumn("start_tok", start)
        .withColumn("block_first", bf)
        .withColumn(
            "block_last",
            F.when(size > 0, F.floor((start + size - 1) / block_tokens))
            .otherwise(bf)
            .cast("long"),
        )
        .withColumn("block_offset", F.pmod(start, F.lit(block_tokens)).cast("long"))
        .drop("__h", "__hbkt", "__gpre")
    )
