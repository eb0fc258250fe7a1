"""Quantify the st_stream_decode_wide harness floor (VERDICT r10 #5).

The driver row's wall time is dominated by Structured Streaming
micro-batch + state-store bookkeeping, NOT by decode throughput — this
script proves it by running the identical wide decode over the SAME
fixed corpus at different micro-batch counts (varying only
``maxFilesPerTrigger``) and printing wall vs batch count. If the wall
scaled with data, halving the batch count would not change it; if it is
harness-constant per batch (the claim), wall ≈ floor_per_batch ×
n_batches + decode_time.

Usage: python scripts/stream_decode_wide_floor.py
Prints one JSON line per configuration plus a summary line.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from solarboat_data_pipeline_spark import get_spark
from solarboat_data_pipeline_spark.catalog import CanCatalog
from solarboat_data_pipeline_spark.operators.parse import (
    with_frame_meta,
    with_timestamp,
)
from solarboat_data_pipeline_spark.sources.candump import extract_frames
from solarboat_data_pipeline_spark.streaming.pipeline import stream_decode_wide

WORK = "/tmp/solarboat_swd_floor"
N_LINES = 200_000
N_FILES = 20
WATERMARK = "2 seconds"


def _catalog() -> CanCatalog:
    return CanCatalog.from_dict({
        "version": "floor-0.1",
        "modules": [{
            "name": "SB", "signature": 250, "topics": [{
                "name": "W", "id": 21, "bytes": [
                    {"name": "SIGNATURE", "type": "uint8_t", "units": ""},
                    {"name": "VAL_L", "type": "uint16_t", "units": "V/100"},
                    {"name": "VAL_H", "type": "uint16_t", "units": "V/100"},
                    {"name": "D", "type": "uint8_t", "units": ""},
                ],
            }],
        }],
    })


def _gen_corpus(spark, src: str) -> None:
    os.makedirs(src, exist_ok=True)
    tmp = os.path.join(WORK, "_gen_tmp")
    per_file = N_LINES // N_FILES

    def payload(v16, v8):
        return F.concat(
            F.lit("fa"),
            F.lpad(F.lower(F.hex(v16 % 256)), 2, "0"),
            F.lpad(F.lower(F.hex(F.shiftright(v16, 8))), 2, "0"),
            F.lpad(F.lower(F.hex(v8)), 2, "0"),
        )

    for f in range(N_FILES):
        df = spark.range(f * per_file, (f + 1) * per_file)
        ts6 = F.lit(1_600_000_000.0) + F.col("id") * 0.1
        line = F.format_string(
            "(%.6f) can0 015#%s", ts6,
            payload(F.col("id") % 60000, F.col("id") % 256),
        )
        df.select(line.alias("value")).coalesce(1).write.mode(
            "overwrite"
        ).text(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.txt"))[0]
        os.replace(part, os.path.join(src, f"lines_{f:03d}.log"))
    shutil.rmtree(tmp, ignore_errors=True)


def run_once(spark, src: str, files_per_trigger: int) -> dict:
    out = os.path.join(WORK, f"out_{files_per_trigger}")
    ckpt = os.path.join(WORK, f"ckpt_{files_per_trigger}")
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    stream_lines = (
        spark.readStream.option("maxFilesPerTrigger", files_per_trigger)
        .text(os.path.join(src, "*.log"))
    )
    frames = with_frame_meta(
        with_timestamp(extract_frames(stream_lines, with_order=False))
    )
    wide = stream_decode_wide(frames, _catalog(), watermark=WATERMARK,
                              downcast=False)
    t0 = time.perf_counter()
    q = (
        wide.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    while q.isActive:
        q.awaitTermination(1)
    # recentProgress retains up to 100 entries — plenty for the <=21
    # batches this smoke runs (incl. the final empty commit batch)
    n_batches = len(q.recentProgress)
    wall = time.perf_counter() - t0
    rows = spark.read.parquet(out).count()
    return {
        "files_per_trigger": files_per_trigger,
        "micro_batches": n_batches,
        "wall_sec": round(wall, 2),
        "rows_emitted": rows,
        "lines_per_sec": round(N_LINES / wall),
    }


def main() -> None:
    spark = get_spark(app_name="swd-floor")
    src = os.path.join(WORK, "candump_text")
    _gen_corpus(spark, src)
    results = []
    # 1, 2, 5, 10, 20 micro-batches over the SAME 200k-line corpus
    for fpt in (20, 10, 4, 2, 1):
        r = run_once(spark, src, fpt)
        results.append(r)
        print(json.dumps(r), flush=True)
    walls = {r["micro_batches"]: r["wall_sec"] for r in results}
    bs = sorted(walls)
    if len(bs) >= 2:
        # least-squares slope of wall vs batch count = per-batch floor
        n = len(bs)
        mx = sum(bs) / n
        my = sum(walls[b] for b in bs) / n
        slope = sum((b - mx) * (walls[b] - my) for b in bs) / sum(
            (b - mx) ** 2 for b in bs
        )
        print(json.dumps({
            "summary": "per_micro_batch_floor",
            "floor_sec_per_batch": round(slope, 3),
            "decode_sec_extrapolated_at_0_batches": round(my - slope * mx, 3),
        }))


if __name__ == "__main__":
    main()
