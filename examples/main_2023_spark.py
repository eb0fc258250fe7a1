#!/usr/bin/env python
"""Spark analogue of the reference's 2023 driver
(``main_2023_lic_01072023.py:102-105``): parse with the ACTUAL published
``can_ids_lic_01072023.json`` catalog, resample to 1 s, then unify with
a GPS track whose timestamps live in America/Sao_Paulo local time and
are shifted back to the telemetry clock (the reference's
``shift_back_localize`` flag, ``lib/process_gpx_data.py:135-167``).

The 2023 flow differs from 2022/2020 in three ways this example keeps:
only ONE resample period (1 s — the reference comments out the rest),
GPS-only enrichment (no Solcast forecast stage), and no MAB20
workaround (that damage is specific to the 2022 logs).

Input is synthesized against the real catalog with the same generator
the 24 M-line e2e runs use (``scripts/e2e_report_scale.py``) — pass
``--candump`` to run a real log instead. Falls back to the mini test
catalog when the reference checkout is absent.

    python examples/main_2023_spark.py --out /tmp/solarboat_2023_out
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

REF_CATALOG = "/root/reference/can_ids_lic_01072023.json"
MINI_CATALOG = os.path.join(REPO, "tests/data/mini_can_ids.json")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--can-ids",
        default=REF_CATALOG if os.path.exists(REF_CATALOG) else MINI_CATALOG,
    )
    ap.add_argument(
        "--candump",
        default=None,
        help="candump log path; default synthesizes --lines against the catalog",
    )
    ap.add_argument("--lines", type=int, default=200_000)
    ap.add_argument("--out", default="/tmp/solarboat_2023_out")
    ap.add_argument("--period", type=float, default=1.0)
    ap.add_argument(
        "--shift-back-hours",
        type=float,
        default=3.0,
        help="GPS local-time shift back to the telemetry clock "
        "(America/Sao_Paulo = UTC-3; the reference's shift_back_localize)",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    # the e2e module reads sys.argv at import (it is a script first)
    _argv, sys.argv = sys.argv, sys.argv[:1]
    import e2e_report_scale as shape

    sys.argv = _argv
    from solarboat_data_pipeline_spark import (
        CanCatalog,
        get_spark,
        parse_stage,
        resample_stage,
        unify_gps_stage,
        write_parquet,
    )

    spark = get_spark(app_name="main-2023-spark")
    catalog = CanCatalog.load(args.can_ids)

    corpus = args.candump
    if corpus is None:
        corpus = os.path.join(args.out, "candump")
        # planted unknown-signature byte must not collide with a real
        # module signature of THIS catalog
        sigs = {m.signature for m, _ in catalog.iter_topics()}
        unknown = next(f"{b:02x}" for b in range(1, 256) if b not in sigs)
        shape.generate_corpus(
            spark, catalog, corpus, unknown_sig_hex=unknown, n_lines=args.lines
        )
        print(f"generate: {args.lines} lines against {args.can_ids} -> {corpus}")

    # E1 parse (no MAB20 workaround in the 2023 flow)
    wide = parse_stage(spark, corpus, catalog)
    sparse_out = os.path.join(args.out, "parsed_sparse.parquet")
    write_parquet(wide, sparse_out, mode="overwrite")
    n_sparse = spark.read.parquet(sparse_out).count()
    print(f"parse: {n_sparse} rows, {len(wide.columns)} cols -> {sparse_out}")

    # E2 resample: the reference runs ONLY '1s' in 2023
    resampled = resample_stage(spark.read.parquet(sparse_out), args.period)
    res_out = os.path.join(args.out, f"resampled_{args.period}s.parquet")
    write_parquet(resampled, res_out, mode="overwrite")
    print(f"resample: {spark.read.parquet(res_out).count()} rows -> {res_out}")

    # E3 GPS unify with shift_back_localize: track timestamps arrive in
    # Sao Paulo local time; shift them back onto the telemetry clock
    # before the backward as-of reprojection.
    telemetry = spark.read.parquet(res_out)
    lo, n_sec = telemetry.agg(
        F.min("timestamp"), F.ceil(
            (F.unix_micros(F.max("timestamp")) - F.unix_micros(F.min("timestamp")))
            / 1_000_000
        ) + 1,
    ).first()
    track = shape.synthetic_track(spark, int(n_sec)).withColumn(
        "timestamp",
        F.timestamp_micros(
            F.unix_micros(F.col("timestamp"))
            - F.unix_micros(F.lit(shape.BASE_EPOCH).cast("timestamp"))
            + F.unix_micros(F.lit(lo))
        ),
    )
    shift_us = int(args.shift_back_hours * 3600 * 1_000_000)
    track_local = track.withColumn(  # what a Sao-Paulo-localized CSV holds
        "timestamp", F.timestamp_micros(F.unix_micros("timestamp") - shift_us)
    )
    track_back = track_local.withColumn(  # shift_back_localize=True
        "timestamp", F.timestamp_micros(F.unix_micros("timestamp") + shift_us)
    )
    final = unify_gps_stage(telemetry, track_back)
    final_out = os.path.join(args.out, "unified_1s.parquet")
    write_parquet(final, final_out, mode="overwrite")
    got = spark.read.parquet(final_out)
    n = got.count()
    n_gps = got.where(F.col("gps_latitude").isNotNull()).count()
    print(f"unify: {n} rows ({n_gps} with GPS) -> {final_out}")
    assert n > 0 and n_gps > 0, "GPS enrichment produced no rows"
    print("main_2023_spark: OK")


if __name__ == "__main__":
    main()
