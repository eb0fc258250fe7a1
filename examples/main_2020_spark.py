#!/usr/bin/env python
"""Spark port of the reference's 2020 driver flow (``main_2020.py:213``):
parse per-event logs with clock-skew offsets → unify overlapping chunks
against a reference dump (``lib/unify_parsed_candump.py``, J5) → clean
timestamp outliers + resample (``lib/resampler.py:59-101``) → unify with
Solcast forecast data incl. POA irradiance + cumulative energy
(``lib/process_solcast_historic_data.py`` +
``lib/unifier_with_forecast_data.py``) and the GPS track.

This is the one reference entry point the 2022 example doesn't cover:
it exercises chunk unification, the outlier filter, the forecast
reprojection with ``shift_back`` (the reference's
``shift_back_localize``), and the REAL solar physics (NOAA position +
isotropic POA — `functions/solar.py`, no pvlib needed).

Runs end-to-end on the repo's test fixtures by default:

    python examples/main_2020_spark.py --out /tmp/solarboat_2020_out
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def synth_solcast_csv(path: str, start_epoch: int, rows: int = 60) -> None:
    """Tiny Solcast-format CSV (PeriodStart/Dni/Ghi/Dhi/AlbedoDaily,
    5-min period) spanning the fixture's time range — the reference
    reads the real export with exactly these columns
    (``lib/process_solcast_historic_data.py:77-91``)."""
    import csv
    import datetime as dt

    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["PeriodStart", "PeriodEnd", "Period", "Dni", "Ghi", "Dhi", "AlbedoDaily"])
        for i in range(rows):
            t0 = dt.datetime.fromtimestamp(start_epoch + i * 300, dt.timezone.utc)
            t1 = dt.datetime.fromtimestamp(start_epoch + (i + 1) * 300, dt.timezone.utc)
            # a plausible diurnal ramp
            ghi = max(0.0, 800.0 * (1 - abs(i - rows / 2) / (rows / 2)))
            w.writerow([
                t0.strftime("%Y-%m-%dT%H:%M:%SZ"), t1.strftime("%Y-%m-%dT%H:%M:%SZ"),
                "PT5M", round(ghi * 0.8, 1), round(ghi, 1), round(ghi * 0.2, 1), 0.9,
            ])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--candump", default=os.path.join(REPO, "tests/data/sample.candump"))
    ap.add_argument("--can-ids", default=os.path.join(REPO, "tests/data/mini_can_ids.json"))
    ap.add_argument("--gpx", default=os.path.join(REPO, "tests/data/track.gpx"))
    ap.add_argument("--out", default="/tmp/solarboat_2020_out")
    ap.add_argument("--period", type=float, default=1.0)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from solarboat_data_pipeline_spark import get_spark
    from solarboat_data_pipeline_spark.catalog import CanCatalog
    from solarboat_data_pipeline_spark.functions.geo import derive_track
    from solarboat_data_pipeline_spark.functions.solar import (
        poa_irradiance,
        solcast_preprocess,
    )
    from solarboat_data_pipeline_spark.sources.gpx import scan_gpx
    from solarboat_data_pipeline_spark.operators.timeseries import (
        clean_timestamp_outliers,
        trapezoid_integral,
        unify_chunks,
    )
    from solarboat_data_pipeline_spark.pipeline import (
        parse_stage,
        resample_stage,
        unify_forecast_stage,
        unify_gps_stage,
    )
    from solarboat_data_pipeline_spark.sources.sinks import write_parquet

    spark = get_spark(app_name="main-2020-spark")
    catalog = CanCatalog.load(args.can_ids)
    os.makedirs(args.out, exist_ok=True)

    # E1 parse: each 2020 event log carries its own from/to clock-skew
    # offset (main_2020.py:34-62; lib/canparser.py:62-66). The fixture is
    # parsed twice — the "event" log as-is and a "reference db" dump
    # shifted +2 s — standing in for the overlapping per-event files.
    event_wide = parse_stage(spark, args.candump, catalog, mab20_workaround=True)
    ref_wide = parse_stage(
        spark, args.candump, catalog, offset_seconds=2.0, mab20_workaround=True
    )

    # J5 unify chunks: the db reference is clipped to the event's time
    # range and concatenated (lib/unify_parsed_candump.py:13-27)
    unified = unify_chunks(event_wide, ref_wide)
    sparse_out = os.path.join(args.out, "unified_sparse.parquet")
    write_parquet(unified, sparse_out, mode="overwrite")
    print(f"parse+unify: {spark.read.parquet(sparse_out).count()} rows -> {sparse_out}")

    # E2 resample with the 2020 outlier cleaning
    # (lib/canparser.py:244-260; resampler outliers_percentile path)
    cleaned = clean_timestamp_outliers(
        spark.read.parquet(sparse_out), lag_rows=100
    )
    resampled = resample_stage(cleaned, args.period)
    res_out = os.path.join(args.out, f"resampled_{args.period}s.parquet")
    write_parquet(resampled, res_out, mode="overwrite")
    print(f"resample: {spark.read.parquet(res_out).count()} rows -> {res_out}")

    # E3a forecast unify: Solcast CSV → rename/drop → REAL POA physics →
    # cumulative energy → reproject onto the telemetry grid
    first_ts = spark.read.parquet(res_out).agg(F.min("timestamp")).first()[0]
    csv_path = os.path.join(args.out, "solcast_pt5m.csv")
    synth_solcast_csv(csv_path, int(first_ts.timestamp()) - 900)
    forecast = solcast_preprocess(
        spark.read.csv(csv_path, header=True, inferSchema=True)
    )
    forecast = poa_irradiance(
        forecast, latitude=-26.243602, longitude=-48.6417668,
        period_seconds=300.0,
    )
    forecast = trapezoid_integral(
        forecast, col="poa", out_col="energy", time_constant=3600.0
    )
    telemetry = spark.read.parquet(res_out)
    with_forecast = unify_forecast_stage(
        telemetry,
        forecast.select("timestamp", "ghi", "dni", "dhi", "poa", "energy"),
        args.period,
        shift_back_hours=3.0,  # the reference's shift_back_localize (UTC-3)
    )

    # E3b GPS unify (speed/heading/distance derived as in
    # lib/process_gpx_data.py:40-73)
    track = derive_track(scan_gpx(spark, args.gpx)).select(
        "timestamp", "latitude", "longitude", "altitude",
        "speed", "heading", "distance",
    )
    final = unify_gps_stage(with_forecast, track)
    final_out = os.path.join(args.out, "final.parquet")
    write_parquet(final, final_out, mode="overwrite")
    got = spark.read.parquet(final_out)
    n = got.count()
    n_poa = got.where(F.col("solcast_poa").isNotNull()).count()
    print(f"unify: {n} rows ({n_poa} with forecast POA) -> {final_out}")
    assert n > 0 and n_poa > 0, "forecast enrichment produced no rows"
    print("main_2020_spark: OK")


if __name__ == "__main__":
    main()
