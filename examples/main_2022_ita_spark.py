#!/usr/bin/env python
"""Spark twin of the reference's Italy-event driver
(``main_2022_ita.py:1-119``) — the CONFIG-ONLY variant of
``main_2022.py``: the pipeline stages are identical, only the choices
differ, and this script mirrors each choice:

* schema from the working directory's ``can_ids.json``
  (``main_2022_ita.py:13`` — not the year-named ``can_ids_2022.json``);
* a single debugging dataset rather than the race-day list
  (``main_2022_ita.py:35-42``);
* resample at ``1s`` ONLY (``main_2022_ita.py:93-101`` — the other
  periods are commented out in the reference);
* timestamp-outlier cleaning on (``outliers_percentile=0.01``,
  ``main_2022_ita.py:105``);
* NO forecast/GPS unify stages — the ita driver runs parse + resample
  and stops (``main_2022_ita.py:117-119``).

Runs end-to-end on the repo's test fixtures by default:

    python examples/main_2022_ita_spark.py --out /tmp/solarboat_ita_out
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--candump", default=os.path.join(REPO, "tests/data/sample.candump"),
        help="the ita driver's single debugging log "
        "(candump-2022-10-15_234814.log in the reference)",
    )
    ap.add_argument(
        "--can-ids",
        default=(
            "can_ids.json" if os.path.exists("can_ids.json")
            else os.path.join(REPO, "tests/data/mini_can_ids.json")
        ),
        help="ita loads ./can_ids.json from the working directory "
        "(main_2022_ita.py:13)",
    )
    ap.add_argument("--out", default="/tmp/solarboat_ita_out")
    args = ap.parse_args()

    from solarboat_data_pipeline_spark import get_spark
    from solarboat_data_pipeline_spark.catalog import CanCatalog
    from solarboat_data_pipeline_spark.pipeline import (
        parse_stage,
        resample_stage,
    )
    from solarboat_data_pipeline_spark.sources.sinks import write_parquet

    spark = get_spark(app_name="main-2022-ita-spark")
    catalog = CanCatalog.load(args.can_ids)

    # E1 parse — with the ita driver's timestamp-outlier cleaning
    # (clean_timestamp_outliers runs unless the input is a "db" dump,
    # lib/canparser.py:336-337; outliers_percentile=0.01 is the ita
    # resampler config, main_2022_ita.py:105)
    wide = parse_stage(spark, args.candump, catalog, clean_outliers=True)
    sparse_out = os.path.join(args.out, "parsed_sparse.parquet")
    write_parquet(wide, sparse_out, mode="ignore")
    print(f"parse: {spark.read.parquet(sparse_out).count()} rows -> {sparse_out}")

    # E2 resample — 1 s only (the ita resample_periods list)
    for period in (1.0,):
        resampled = resample_stage(spark.read.parquet(sparse_out), period)
        res_out = os.path.join(args.out, f"resampled_{period}s.parquet")
        write_parquet(resampled, res_out, mode="ignore")
        print(
            f"resample {period}s: "
            f"{spark.read.parquet(res_out).count()} rows -> {res_out}"
        )
    # no unify stages: the ita driver ends after resample
    # (main_2022_ita.py:117-119)


if __name__ == "__main__":
    main()
