#!/usr/bin/env python
"""End-to-end training-corpus curation on the documents fixture — the
LLM-data-pipeline extension family composed the way a pretraining ingest
job would run it:

1. quality + language gate   (operators/text.py — per-row expressions)
2. exact dedup               (operators/dedup.py — digest hash-agg)
3. near-dup removal          (MinHash → LSH bands → Jaccard verify →
                              connected components; sub-quadratic end to end)
4. benchmark decontamination (broadcast eval-shingle overlap)
5. PII redaction             (chained regexp_replace)
6. token-budget sample       (deterministic hash-order prefix per source)
7. shard + pack              (deterministic global shuffle into dataloader
                              shards; concat-and-chunk block coordinates)
8. parquet sink              (idempotent mode="ignore" restartability;
                              partitioned + sorted exactly as a
                              dataloader consumes it)

Every stage is a verified operator with a DuckDB oracle in the driver
contract; this script just chains them, the same way
``examples/main_2022_spark.py`` chains the telemetry stages.

    python examples/curate_corpus.py --out /tmp/curated_corpus
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", default="/root/testdata/sf0.01/documents.parquet")
    ap.add_argument("--out", default="/tmp/curated_corpus")
    ap.add_argument("--budget-tokens", type=int, default=2000)
    ap.add_argument("--near-dup-threshold", type=float, default=0.5)
    ap.add_argument("--n-shards", type=int, default=4)
    ap.add_argument("--block-tokens", type=int, default=512)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from solarboat_data_pipeline_spark import get_spark
    from solarboat_data_pipeline_spark.operators import dedup as dd
    from solarboat_data_pipeline_spark.operators import sampling as sp
    from solarboat_data_pipeline_spark.operators import text as tx
    from solarboat_data_pipeline_spark.sources.sinks import write_parquet

    spark = get_spark(app_name="curate-corpus")
    docs = spark.read.parquet(args.docs)
    n0 = docs.count()

    # 1. quality/language gate — pure per-row expressions, runs in the scan
    gated = docs.where(
        (tx.lang_id(F.col("text")) == F.col("lang"))
        & tx.token_count(F.col("text")).between(10, 10_000)
    )

    # 2. exact dedup: keep the lowest doc_id per content digest
    keep = dd.exact_dedup(gated).select(F.col("keep_id").alias("doc_id"))
    uniq = gated.join(keep, "doc_id", "semi").localCheckpoint(eager=False)

    # 3. near-dup removal (LSH candidates → verify → components)
    drops = dd.near_dup_dedup(uniq, threshold=args.near_dup_threshold).select(
        F.col("drop_id").alias("doc_id")
    )
    deduped = uniq.join(drops, "doc_id", "anti")

    # 4. decontaminate against a held-out eval slice (every 29th doc)
    bench = deduped.where(F.col("doc_id") % 29 == 0)
    train = deduped.where(F.col("doc_id") % 29 != 0)
    contaminated = dd.decontaminate(train, bench).where(
        F.col("n_contaminated") > 0
    ).select(F.col("id").alias("doc_id"))
    clean = train.join(contaminated, "doc_id", "anti")

    # 5. PII scrub + 6. deterministic token-budget mixture per source
    scrubbed = clean.withColumn("text", tx.redact_pii(F.col("text")))
    sized = scrubbed.withColumn(
        "n_tokens", F.size(tx.tokens(F.col("text"))).cast("long")
    )
    sampled = sp.token_budget_sample(
        sized, args.budget_tokens, "n_tokens", "doc_id",
        strata_col="source", salt="curate",
    )

    # 7. deterministic global shuffle into dataloader shards + the
    # concat-and-chunk block coordinates each shard's loader consumes.
    # partition_col="shard" makes every shard its OWN 0-based token
    # stream, so each shard directory is self-contained — packing the
    # global stream here would scatter each block's documents across
    # all shard directories.
    sharded = sp.shard_corpus(sampled, args.n_shards, salt="ep0")
    packed = sp.pack_sequences(
        sharded, args.block_tokens, "n_tokens", salt="ep0",
        partition_col="shard",
    )

    # 8. idempotent sink in dataloader layout: one directory per shard,
    # rows in shard order (a rerun with the same out dir is a no-op)
    write_parquet(
        packed.repartition("shard").sortWithinPartitions("shard", "shard_pos"),
        args.out,
        mode="ignore",
        partition_by=["shard"],
    )

    kept = spark.read.parquet(args.out)
    stats = kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("docs"), F.sum("n_tokens").alias("tokens")
    )
    blocks_per_shard = (
        kept.groupBy("shard").agg((F.max("block_last") + 1).alias("b"))
        .agg(F.sum("b").alias("t")).first()["t"]
    )
    print(f"curation: {n0} docs in -> {kept.count()} out at {args.out}")
    print(f"  {args.n_shards} shards, {blocks_per_shard} x "
          f"{args.block_tokens}-token blocks across them (per-shard streams)")
    for r in stats.orderBy("source").collect():
        print(f"  {r['source']}: {r['docs']} docs, {r['tokens']} tokens")


if __name__ == "__main__":
    main()
