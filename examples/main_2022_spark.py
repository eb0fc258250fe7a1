#!/usr/bin/env python
"""Spark port of the reference driver flow (``main_2022.py:159-163``): a
user of the reference runs the same four stages — parse, resample, unify
with forecast, unify with GPS — as one script.

Differences from the reference driver, by design:

* one logical plan per stage instead of `multiprocessing.Pool` over files
  (input splits give the parallelism; `lib/canparser.py:406-417`);
* Parquet instead of HDF5 chunk files (`lib/canparser.py:333-339`);
* `mode("ignore")` gives the skip-if-exists restartability
  (`lib/canparser.py:315-317`) per-stage instead of per-chunk;
* the CAN schema JSON is the same format the reference loads
  (`lib/canparser.py:36-50`) — point `--can-ids` at a real
  ``can_ids_2022.json`` to process real telemetry.

Runs end-to-end on the repo's test fixtures by default:

    python examples/main_2022_spark.py --out /tmp/solarboat_out
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--candump", default=os.path.join(REPO, "tests/data/sample.candump"))
    ap.add_argument("--can-ids", default=os.path.join(REPO, "tests/data/mini_can_ids.json"))
    ap.add_argument("--gpx", default=os.path.join(REPO, "tests/data/track.gpx"))
    ap.add_argument("--out", default="/tmp/solarboat_out")
    ap.add_argument("--period", type=float, default=1.0, help="resample period (s)")
    ap.add_argument(
        "--offset-seconds",
        type=float,
        default=0.0,
        help="clock-skew correction, the reference's from/to Timestamp pair "
        "(lib/canparser.py:62-66)",
    )
    args = ap.parse_args()

    from solarboat_data_pipeline_spark import get_spark
    from solarboat_data_pipeline_spark.catalog import CanCatalog
    from solarboat_data_pipeline_spark.functions.geo import derive_track
    from solarboat_data_pipeline_spark.pipeline import (
        parse_stage,
        resample_stage,
        unify_gps_stage,
    )
    from solarboat_data_pipeline_spark.sources.gpx import scan_gpx
    from solarboat_data_pipeline_spark.sources.sinks import write_parquet

    spark = get_spark(app_name="main-2022-spark")
    catalog = CanCatalog.load(args.can_ids)

    # E1 parse: candump text -> decoded wide sparse table
    wide = parse_stage(
        spark, args.candump, catalog, offset_seconds=args.offset_seconds
    )
    sparse_out = os.path.join(args.out, "parsed_sparse.parquet")
    write_parquet(wide, sparse_out, mode="ignore")
    print(f"parse: {spark.read.parquet(sparse_out).count()} rows -> {sparse_out}")

    # E2 resample: fixed-period mean + bounded time interpolation
    resampled = resample_stage(spark.read.parquet(sparse_out), args.period)
    res_out = os.path.join(args.out, f"resampled_{args.period}s.parquet")
    write_parquet(resampled, res_out, mode="ignore")
    print(f"resample: {spark.read.parquet(res_out).count()} rows -> {res_out}")

    # E3 unify: GPS enrichment (forecast joins identically via
    # unify_forecast_stage given a Solcast CSV — scan_forecast_csv)
    track = derive_track(scan_gpx(spark, args.gpx)).select(
        "timestamp", "latitude", "longitude", "altitude",
        "speed", "heading", "distance",
    )
    unified = unify_gps_stage(spark.read.parquet(res_out), track)
    uni_out = os.path.join(args.out, "unified.parquet")
    write_parquet(unified, uni_out, mode="ignore")
    print(f"unify: {spark.read.parquet(uni_out).count()} rows -> {uni_out}")


if __name__ == "__main__":
    main()
