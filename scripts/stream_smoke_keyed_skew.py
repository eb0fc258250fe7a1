#!/usr/bin/env python
"""Keyed streaming as-of under KEY SKEW (round 9, VERDICT r8 item 6).

stream_smoke.py proves the streaming kernels at 10M events but over 16
well-balanced series — effectively few-key. At 100x the per-key state
store is the concern: ~10k keys with ONE HOT KEY holding 30% of all
events (a fleet where one logger dominates). This smoke runs the
production `stream_asof_backward(buffered="auto")` kernel over a REAL
5-micro-batch backlog and reports what the state store actually did:

1. output equals the batch `asof_join_backward` twin EXACTLY
   (0 mismatches, every left row present) despite the hot key;
2. peak state is BOUNDED BY THE MICRO-BATCH, not the corpus: the
   watermark advances between batches and compacts each key's right
   buffer into its carried row, so peak state rows must stay under one
   batch's right-side volume (plus per-key carry) rather than
   accumulating toward the 6.7M total right rows;
3. peak state rows/bytes and the hot key's share are reported for
   SCALE.md.

Run from the repo root: python scripts/stream_smoke_keyed_skew.py [n]
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from solarboat_data_pipeline_spark import get_spark  # noqa: E402
from solarboat_data_pipeline_spark.operators import timeseries as tsops  # noqa: E402
from solarboat_data_pipeline_spark.streaming.stateful import (  # noqa: E402
    stream_asof_backward,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
N_KEYS = 10_000
HOT_PCT = 30  # key "h" receives 3 of every 10 events
N_FILES = 20
FILES_PER_TRIGGER = 4  # -> 5 micro-batches over the backlog
WORK = "/tmp/stream_smoke_keyed_skew"
BASE_US = 1_000_000_000

results: list[dict] = []


def report(check: str, agree: bool, extra: dict) -> None:
    rec = {"check": check, "agree": bool(agree), **extra}
    results.append(rec)
    print(json.dumps(rec), flush=True)


def generate(spark, src: str) -> None:
    """Time-ordered files; event i at ts = BASE + 100 µs * i. Key: 30%
    hot ("h"), the rest spread over N_KEYS-1 cold keys. Right/left split
    by id % 3 (1/3 left probes, 2/3 right samples)."""
    os.makedirs(src, exist_ok=True)
    per_file = N // N_FILES
    tmp = os.path.join(WORK, "_gen_tmp")
    for f in range(N_FILES):
        df = spark.range(f * per_file, (f + 1) * per_file).select(
            F.when(F.pmod("id", F.lit(10)) < F.lit(HOT_PCT // 10), F.lit("h"))
            .otherwise(
                F.concat(
                    F.lit("s"),
                    F.pmod(F.hash("id"), F.lit(N_KEYS - 1)),
                )
            )
            .alias("series"),
            F.timestamp_micros(F.lit(BASE_US) + F.col("id") * 100).alias(
                "timestamp"
            ),
            F.col("id").cast("double").alias("value"),
            F.pmod("id", F.lit(3)).cast("int").alias("arm"),
        )
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        os.replace(part, os.path.join(src, f"events_{f:03d}.parquet"))
    shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    spark = get_spark(
        app_name="stream-smoke-keyed-skew",
        extra_conf={"spark.sql.shuffle.partitions": "32"},
    )
    shutil.rmtree(WORK, ignore_errors=True)
    src = os.path.join(WORK, "events")
    generate(spark, src)

    base = (
        spark.readStream.schema(
            "series string, timestamp timestamp, value double, arm int"
        )
        .option("maxFilesPerTrigger", FILES_PER_TRIGGER)
        .parquet(os.path.join(src, "*.parquet"))
    )
    left = base.where("arm = 0").select(
        "series", "timestamp", "value"
    ).withWatermark("timestamp", "0 seconds")
    right = base.where("arm != 0").select(
        "series", "timestamp", F.col("value").alias("ref")
    )
    joined = stream_asof_backward(
        left, right, key_cols=("series",), ts_col="timestamp",
        value_cols=("ref",), buffered="auto",
    )
    out = os.path.join(WORK, "out")
    ckpt = os.path.join(WORK, "ckpt")
    t0 = time.perf_counter()
    q = (
        joined.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = round(time.perf_counter() - t0, 2)
    peak_rows = peak_bytes = 0
    for p in q.recentProgress:
        for so in p.get("stateOperators") or []:
            peak_rows = max(peak_rows, so.get("numRowsTotal") or 0)
            peak_bytes = max(peak_bytes, so.get("memoryUsedBytes") or 0)

    got = spark.read.parquet(out)
    b = spark.read.parquet(os.path.join(src, "*.parquet"))
    bl = b.where("arm = 0").select("series", "timestamp", "value")
    br = b.where("arm != 0").select(
        "series", "timestamp", F.col("value").alias("ref")
    )
    batch = tsops.asof_join_backward(
        bl, br, on="timestamp", value_cols=["ref"], partition_cols=("series",)
    )
    n_left, n_got = bl.count(), got.count()
    cond = (
        (got["series"] == batch["series"])
        & (got["timestamp"] == batch["timestamp"])
        & got["value"].eqNullSafe(batch["value"])
        & got["ref"].eqNullSafe(batch["ref"])
    )
    mism = got.join(batch, cond, "left_anti").count()
    hot_n = b.where("series = 'h'").count()
    report(
        "keyed_skew_stream_equals_batch",
        n_got == n_left and mism == 0,
        {
            "events": N,
            "keys": N_KEYS,
            "hot_key_share": round(hot_n / N, 4),
            "left_rows": n_left,
            "rows": n_got,
            "mismatches": mism,
            "wall_sec": wall,
            "events_per_sec": round(N / wall),
        },
    )
    # state must be batch-bounded: rights per batch = (N/5 batches)*(2/3)
    batch_rights = N // 5 * 2 // 3
    report(
        "keyed_skew_state_bounded_by_batch",
        0 < peak_rows < 2 * batch_rights,
        {
            "peak_state_rows": peak_rows,
            "peak_state_bytes": peak_bytes,
            "rights_per_batch": batch_rights,
            "rights_total": N * 2 // 3,
        },
    )
    all_ok = all(r["agree"] for r in results)
    print(
        json.dumps(
            {
                "metric": "stream_smoke_keyed_skew",
                "events": N,
                "checks": len(results),
                "all_agree": all_ok,
            }
        ),
        flush=True,
    )
    spark.stop()
    sys.exit(0 if all_ok else 1)


if __name__ == "__main__":
    main()
