#!/usr/bin/env python
"""Spark analogue of the reference's ``gps_data.ipynb``: read one or
more GPX activity files, derive the track kinematics (speed, heading,
cumulative distance — ``lib/process_gpx_data.py:40-73``), localize the
UTC timestamps to America/Sao_Paulo for display, and write the unified
``gps_data.csv`` the notebook produces.

Every operator here is the engine's public API; the notebook adds no
computation beyond what F1-F3/W1/S4 already cover (VERDICT r04) — this
example exists so a notebook user has a script to switch to.

    python examples/gps_analysis_spark.py --gpx tests/data/track.gpx --out /tmp/gps_out
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--gpx",
        nargs="+",
        default=[os.path.join(REPO, "tests/data/track.gpx")],
        help="one or more GPX files (the notebook concatenates four)",
    )
    ap.add_argument("--tz", default="America/Sao_Paulo")
    ap.add_argument("--out", default="/tmp/gps_out")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    import solarboat_data_pipeline_spark as sb

    spark = sb.get_spark(app_name="gps-analysis")

    # S4 scan + F1-F3/W1 kinematics per file, then concatenate — the
    # notebook's process_gpx loops files and appends
    tracks = None
    for path in args.gpx:
        t = sb.derive_track(sb.scan_gpx(spark, path)).withColumn(
            "source_file", F.lit(os.path.basename(path))
        )
        tracks = t if tracks is None else tracks.unionByName(t)

    # F4: localize for display (timestamps stay UTC instants; the CSV
    # column shows local wall time like the notebook's tz_convert)
    local = tracks.withColumn(
        "timestamp_local", F.from_utc_timestamp("timestamp", args.tz)
    )

    out_csv = os.path.join(args.out, "gps_data.csv")
    sb.write_csv(
        local.select(
            "timestamp", "timestamp_local", "source_file",
            "latitude", "longitude", "altitude",
            "speed", "heading", "distance",
        ),
        out_csv,
        mode="overwrite",
    )

    stats = local.agg(
        F.count(F.lit(1)).alias("points"),
        F.countDistinct("source_file").alias("files"),
        F.round(F.max("distance"), 3).alias("total_km"),
        F.round(F.avg("speed"), 2).alias("avg_kmh"),
        F.round(F.max("speed"), 2).alias("max_kmh"),
    ).first()
    print(
        f"gps: {stats['points']} points from {stats['files']} file(s), "
        f"{stats['total_km']} km, avg {stats['avg_kmh']} km/h, "
        f"max {stats['max_kmh']} km/h -> {out_csv}"
    )
    assert stats["points"] > 0
    print("gps_analysis_spark: OK")


if __name__ == "__main__":
    main()
