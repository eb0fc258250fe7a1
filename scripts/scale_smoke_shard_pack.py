#!/usr/bin/env python
"""Shard/pack SCALE smoke: measures the two-level bucketed running-sum
claim of ``sampling.pack_sequences`` (and the shard_corpus layout it
composes with) against the naive form.

Corpus: N documents with varied token counts, shuffled into 64 shards
and packed into 2048-token blocks per shard. Two implementations of the
identical global-position arithmetic run on it:

* the shipped kernel — per-shard streams whose running sums use
  ``num_buckets`` CONTIGUOUS hash ranges: bucket-local cumsum windows
  (N parallel sorts) + an exclusive prefix over the tiny bucket totals;
* a NAIVE twin — ``sum(...) OVER (PARTITION BY shard ORDER BY h)``
  with NO bucket level, i.e. one task per shard sorting the whole
  shard; with one shard (the corpus-global stream) this is Spark's
  "No Partition Defined ... moving all data to a single partition"
  plan — the shape that stops completing past one task's memory.

Checks (exit 1 unless all agree):
  1. kernel output == naive output row-for-row (both shard layouts),
  2. analytic totals: every doc exactly once, per-shard streams tile
     gaplessly (verified distributed, not by collect),
  3. the single-global-stream case: kernel peak task input stays
     ~rows/num_buckets while the naive global window funnels 100% of
     rows through one task (REST taskSummary),
  4. the kernel's plans contain no unpartitioned window over the data
     (only over the <= num_buckets summary rows).

Run from the repo root: python scripts/scale_smoke_shard_pack.py [n_docs]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from solarboat_data_pipeline_spark import get_spark  # noqa: E402
from solarboat_data_pipeline_spark.operators.sampling import (  # noqa: E402
    pack_sequences,
    shard_corpus,
)
from solarboat_data_pipeline_spark.operators.text import h32  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
N_SHARDS = 64
BLOCK = 2048
WORK = "/tmp/scale_smoke_shard_pack"
results: list[dict] = []


def report(check: str, agree: bool, extra: dict) -> None:
    rec = {"check": check, "agree": bool(agree), **extra}
    results.append(rec)
    print(json.dumps(rec), flush=True)


def _api(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    with urllib.request.urlopen(f"{base}/api/v1/applications{path}") as r:
        return json.loads(r.read())


def _run_measured(spark, df):
    """Evaluate the frame THROUGH its window columns (a bare count()
    lets Catalyst prune the windows away entirely) and return (rows,
    wall, peak single-task input records over the stages) — the funnel
    number."""
    app = spark.sparkContext.applicationId
    before = {s["stageId"] for s in _api(spark, f"/{app}/stages?status=complete")}
    t0 = time.perf_counter()
    agg = df.agg(
        F.count(F.lit(1)).alias("n"), F.sum("start_tok").alias("s")
    ).first()
    rows = agg["n"]
    wall = time.perf_counter() - t0
    peak_records = 0
    for s in _api(spark, f"/{app}/stages?status=complete"):
        if s["stageId"] in before:
            continue
        try:
            q = _api(
                spark,
                f"/{app}/stages/{s['stageId']}/{s['attemptId']}/taskSummary"
                "?quantiles=1.0",
            )
            # shuffle-read records ONLY: the window funnel shows up in
            # what a task reads from the exchange; per-task SCAN input
            # merely reflects the writer's file split count and would
            # false-fail the kernel bound on low-core machines
            peak_records = max(
                peak_records,
                int(q["shuffleReadMetrics"]["readRecords"][0]),
            )
        except Exception:
            pass
    return rows, wall, peak_records


def naive_pack(df, block_tokens, partition_col=None):
    """Identical arithmetic, NO bucket level: one window task per
    partition value (one task TOTAL when partition_col is None)."""
    parts = [partition_col] if partition_col else []
    h = h32(F.col("doc_id").cast("string"), salt="e")
    w = (
        Window.partitionBy(*parts)
        .orderBy("__h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    b = df.withColumn("__h", h)
    start = F.coalesce(F.sum("n_tok").over(w), F.lit(0)).cast("long")
    bf = F.floor(start / block_tokens).cast("long")
    return (
        b.withColumn("start_tok", start)
        .withColumn("block_first", bf)
        .withColumn(
            "block_last",
            F.when(F.col("n_tok") > 0,
                   F.floor((start + F.col("n_tok") - 1) / block_tokens))
            .otherwise(bf).cast("long"),
        )
        .withColumn("block_offset", F.pmod(start, F.lit(block_tokens)).cast("long"))
        .drop("__h")
    )


def main() -> None:
    os.makedirs(WORK, exist_ok=True)
    spark = get_spark(
        app_name="shard-pack-smoke",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4057"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()
    docs = spark.range(N).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.col("id") * 31, 977) + 1).alias("n_tok"),
    )
    path = os.path.join(WORK, "docs.parquet")
    docs.write.mode("overwrite").parquet(path)
    docs = spark.read.parquet(path)
    print(json.dumps({"stage": "generate", "docs": N,
                      "sec": round(time.perf_counter() - t0, 2)}), flush=True)

    # 1. kernel == naive, per-shard layout
    sharded = shard_corpus(docs, N_SHARDS, salt="e")
    kernel = pack_sequences(sharded, BLOCK, "n_tok", salt="e",
                            partition_col="shard")
    naive = naive_pack(sharded, BLOCK, partition_col="shard")
    mism = (
        kernel.alias("k")
        .join(naive.alias("n"), "doc_id")
        .where(
            (F.col("k.start_tok") != F.col("n.start_tok"))
            | (F.col("k.block_first") != F.col("n.block_first"))
            | (F.col("k.block_last") != F.col("n.block_last"))
            | (F.col("k.block_offset") != F.col("n.block_offset"))
        )
        .count()
    )
    k_rows = kernel.count()
    report("kernel_vs_naive_parity", mism == 0 and k_rows == N,
           {"mismatches": mism, "rows": k_rows})

    # 2. distributed gapless-tiling + exactly-once checks
    w = Window.partitionBy("shard").orderBy("start_tok", "doc_id")
    gaps = (
        kernel.withColumn(
            "__prev_end",
            F.coalesce(F.lag(F.col("start_tok") + F.col("n_tok")).over(w),
                       F.lit(0)),
        )
        .where(F.col("start_tok") != F.col("__prev_end"))
        .count()
    )
    tok_total = kernel.agg(F.sum("n_tok")).first()[0]
    end_total = kernel.groupBy("shard").agg(
        F.max(F.col("start_tok") + F.col("n_tok")).alias("e")
    ).agg(F.sum("e")).first()[0]
    dup = kernel.groupBy("doc_id").count().where("count > 1").count()
    report(
        "per_shard_streams_tile_gaplessly",
        gaps == 0 and dup == 0 and tok_total == end_total,
        {"gaps": gaps, "duplicate_docs": dup,
         "sum_tokens": int(tok_total), "sum_shard_stream_ends": int(end_total)},
    )

    # 3. the funnel measurement: ONE global stream (no shards)
    k_rows2, k_wall, k_peak = _run_measured(
        spark, pack_sequences(docs, BLOCK, "n_tok", salt="e")
    )
    n_rows2, n_wall, n_peak = _run_measured(
        spark, naive_pack(docs, BLOCK, partition_col=None)
    )
    report(
        "global_stream_no_single_task_funnel",
        k_rows2 == N and n_rows2 == N
        and n_peak >= int(N * 0.99)  # the naive twin funnels ~all rows
        # kernel: ~rows/num_buckets per bucket; a few buckets can share
        # one shuffle partition (32 buckets hashed into 32 partitions),
        # so the bound is a quarter of the corpus, not one bucket
        and k_peak <= N // 4,
        {
            "kernel_peak_task_records": k_peak,
            "naive_peak_task_records": n_peak,
            "funnel_ratio": round(n_peak / max(k_peak, 1), 1),
            "kernel_wall_sec": round(k_wall, 2),
            "naive_wall_sec": round(n_wall, 2),
        },
    )

    # 4. plan invariant: no unpartitioned window over the DATA — every
    # Window node either has a partition spec or sits above the tiny
    # bucket-totals aggregate
    plan = pack_sequences(docs, BLOCK, "n_tok", salt="e")._jdf.queryExecution(
    ).executedPlan().toString()
    win_lines = [ln.strip() for ln in plan.splitlines() if "Window " in ln]

    def is_unpartitioned_data_window(ln: str) -> bool:
        # a DATA window references the full hash __h#; it is healthy only
        # if __hbkt appears in its PARTITION clause (the spec text before
        # the first ASC/DESC is the partition column list). The prefix
        # window over the <= num_buckets totals never references __h#.
        if "__h#" not in ln:
            return False
        spec = ln.split("windowspecdefinition(", 1)[-1]
        part = spec.split(" ASC", 1)[0].split(" DESC", 1)[0]
        return "__hbkt" not in part

    bad = [ln for ln in win_lines if is_unpartitioned_data_window(ln)]
    report(
        "kernel_plan_windows_are_bucketed",
        len(win_lines) >= 2 and not bad,
        {"window_nodes": len(win_lines),
         "unpartitioned_data_windows": len(bad)},
    )

    all_agree = all(r["agree"] for r in results)
    print(json.dumps({"metric": "shard_pack_smoke", "docs": N,
                      "n_shards": N_SHARDS, "block_tokens": BLOCK,
                      "all_agree": all_agree}))
    if not all_agree:
        sys.exit(1)


if __name__ == "__main__":
    main()
