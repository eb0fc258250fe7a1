#!/usr/bin/env python
"""Benchmark harness: runs the headline queries on the sf bench tables.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Env knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32). Each query is executed through a noop
sink so the full physical plan runs without driver-side collect overhead.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from solarboat_data_pipeline_spark import driver_queries, get_spark  # noqa: E402

# Representative spread of SURVEY.md §2 + LLM-pipeline operator families;
# every name must exist in driver_queries.queries().
HEADLINE = [
    "q1_pricing_summary",      # scan + hash agg
    "s2_scan_pushdown",        # filter/projection pushdown
    "a2_pivot_wide",           # pivot
    "a3_resample_dense",       # windowed resample + dense spine
    "a5_quantile_iqr",         # percentile + broadcast-crossjoin clip
    "j1_left_join_enrich",     # broadcast left join
    "j3_asof_linear",          # as-of join, linear interpolation
    "j4_asof_backward",        # as-of join, backward fill
    "w2_lagk_outlier_filter",  # global-order lag-k window
    "w3_interpolate_bounded",  # bounded time interpolation
    "dd_exact",                # exact dedup
    "dd_lsh_pairs",            # MinHash + LSH near-dup candidate pairs
    "sim_cosine_topk",         # brute-force ANN baseline
    "txt_quality",             # text scalar-function battery
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf

    spark = get_spark(app_name="bench")
    qs = driver_queries.queries()

    # warm the JVM + parquet footers so per-query times measure the plans
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
