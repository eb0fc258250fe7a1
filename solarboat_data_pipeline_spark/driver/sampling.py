"""Sampling/packing driver queries (hash/stratified/weighted, shard shuffle, sequence packing, token budgets).

Split out of driver_queries.py (round 9); conventions in the facade
docstring there.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from solarboat_data_pipeline_spark.operators import sampling as sp
from solarboat_data_pipeline_spark.operators import text as tx

from solarboat_data_pipeline_spark.driver._registry import (  # noqa: F401
    SQL_TOKENS,
    _REGISTRY,
    _t,
    register,
    sql_h32,
)



# ---------------------------------------------------------------------------
# deterministic sampling / dataset mixing / corpus hygiene
# (LLM-data-pipeline extension family, BASELINE.json north star)
# ---------------------------------------------------------------------------

_SQL_BUCKET = "(('0x' || substr(md5('{salt}' || doc_id::VARCHAR), 1, 8))::BIGINT % 10000)"


@register(
    "samp_hash_sample",
    f"""
    SELECT doc_id, source FROM documents
    WHERE {_SQL_BUCKET.format(salt='s1')} < 2000
    """,
)
def samp_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 20% Bernoulli sample keyed on md5(doc_id): stable
    across cluster size, partitioning, and retries (operators/sampling.py)."""
    docs = _t(spark, sf_dir, "documents")
    return sp.hash_sample(docs, "doc_id", 0.2, salt="s1").select("doc_id", "source")


@register(
    "samp_shard_shuffle",
    f"""
    WITH h AS (SELECT doc_id, {sql_h32("doc_id", salt="ep0")} AS hh
               FROM documents)
    SELECT doc_id,
           (hh % 8)::INT AS shard,
           (row_number() OVER (PARTITION BY hh % 8 ORDER BY hh, doc_id)
             - 1)::BIGINT AS shard_pos
    FROM h
    """,
)
def samp_shard_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global corpus shuffle into dataloader shards
    (operators/sampling.py:shard_corpus — round 7): shard =
    h32('ep0' || doc_id) % 8, shard_pos = the pseudorandom-but-
    reproducible order within the shard. One exchange on the shard id;
    every task sorts only its shard — no RNG, no global sort, identical
    output at any cluster size. The salt reshuffles between epochs."""
    docs = _t(spark, sf_dir, "documents")
    out = sp.shard_corpus(docs, n_shards=8, key_col="doc_id", salt="ep0")
    return out.select("doc_id", "shard", "shard_pos")


@register(
    "samp_pack_sequences",
    f"""
    WITH t AS (SELECT doc_id,
                      len({SQL_TOKENS.format(t="text")})::BIGINT AS n_tok,
                      {sql_h32("doc_id", salt="pk")} AS hh
               FROM documents),
         c AS (SELECT doc_id, n_tok,
                      coalesce(sum(n_tok) OVER (
                        ORDER BY hh, doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0)::BIGINT AS start_tok
               FROM t)
    SELECT doc_id, n_tok, start_tok,
           (start_tok // 512)::BIGINT AS block_first,
           (CASE WHEN n_tok > 0 THEN (start_tok + n_tok - 1) // 512
                 ELSE start_tok // 512 END)::BIGINT AS block_last,
           (start_tok % 512)::BIGINT AS block_offset
    FROM c
    """,
)
def samp_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing
    (operators/sampling.py:pack_sequences — round 7): the corpus laid
    end to end as one deterministic pseudorandom token stream and split
    into 512-token training sequences; each document gets its exact
    global slice and block coordinates. The running sum is the
    bucketed two-level form (contiguous hash ranges → bucket-local
    cumsums + an exclusive prefix over the tiny bucket totals), never
    one global sort; the oracle replays the identical order and
    arithmetic with a single SQL window."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.size(tx.tokens(F.col("text"))).cast("long").alias("n_tok")
    )
    out = sp.pack_sequences(docs, 512, "n_tok", key_col="doc_id", salt="pk")
    return out.select(
        "doc_id", "n_tok", "start_tok", "block_first", "block_last", "block_offset"
    )


@register(
    "samp_weighted_mix",
    f"""
    SELECT doc_id, source FROM documents
    WHERE {_SQL_BUCKET.format(salt='mix')} <
      CASE source WHEN 'src0' THEN 8000 WHEN 'src1' THEN 5000
                  WHEN 'src2' THEN 2500 ELSE 0 END
    """,
)
def samp_weighted_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass dataset mixing at per-source rates (pretraining mixture
    weights); pure per-row expression, no shuffle."""
    docs = _t(spark, sf_dir, "documents")
    mixed = sp.weighted_mix(
        docs, "source", "doc_id", {"src0": 0.8, "src1": 0.5, "src2": 0.25},
        salt="mix",
    )
    return mixed.select("doc_id", "source")


@register(
    "samp_stratified",
    f"""
    SELECT doc_id, source FROM (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY {_SQL_BUCKET.format(salt='strat')}, doc_id) AS rk
      FROM documents)
    WHERE rk <= 7
    """,
)
def samp_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quota of 7 docs, smallest hash first — a reproducible
    stand-in for per-group reservoir sampling. One shuffle on the stratum."""
    docs = _t(spark, sf_dir, "documents")
    return sp.stratified_sample(docs, "source", "doc_id", 7, salt="strat").select(
        "doc_id", "source"
    )


@register(
    "samp_token_budget",
    f"""
    WITH t AS (SELECT doc_id, source, {SQL_TOKENS.format(t="text")} AS toks
               FROM documents),
         s AS (SELECT doc_id, source, len(toks)::BIGINT AS n_tokens,
                      {_SQL_BUCKET.format(salt='tok')} AS bkt
               FROM t),
         c AS (SELECT doc_id, source, n_tokens,
                      sum(n_tokens) OVER (
                        PARTITION BY source ORDER BY bkt, doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
               FROM s)
    SELECT doc_id, source, n_tokens FROM c WHERE cum <= 2000
    """,
)
def samp_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy prefix sample to a 2000-token budget per source in
    deterministic hash order (operators/sampling.py:token_budget_sample) —
    pretraining mixtures are sized in tokens, not rows."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(tx.tokens(F.col("text"))).cast("long").alias("n_tokens"),
    )
    out = sp.token_budget_sample(
        docs, 2000, "n_tokens", "doc_id", strata_col="source", salt="tok"
    )
    return out.select("doc_id", "source", "n_tokens")


@register("samp_token_budget_scaled", _REGISTRY["samp_token_budget"][1])
def samp_token_budget_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sampling through the bucketed prefix scan
    (operators/sampling.py:token_budget_sample_bucketed): a giant
    stratum's running sum distributes over hash-range buckets instead of
    funneling one task — same oracle, identical kept set."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(tx.tokens(F.col("text"))).cast("long").alias("n_tokens"),
    )
    out = sp.token_budget_sample_bucketed(
        docs, 2000, "n_tokens", "doc_id", strata_col="source", salt="tok",
        num_buckets=16,
    )
    return out.select("doc_id", "source", "n_tokens")
