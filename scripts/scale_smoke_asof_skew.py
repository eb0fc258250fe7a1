#!/usr/bin/env python
"""Skewed-KEY evidence for the scaled as-of joins (operators/scale.py).

scale_smoke_skew.py covers hot GROUP keys (distinct/top-k/quantile);
this smoke covers the other skew axis the verdict asked to prove: a hot
ORDER-KEY REGION — 50% of all events packed into a 20-second timestamp
window inside a 30-day corpus (1M events/s burst, e.g. a logger fault or
a backfill seam). A range-bucketed kernel with EQUAL-WIDTH bounds sends
that whole region to one bucket = one task; CDF-based bounds (what
``compute_bounds``/``bounds_from_parquet_metadata`` produce) must keep
every bucket near N/num_buckets regardless of the distribution.

Checks (exit 1 unless all agree):
1. equal-width bounds: max per-bucket rows ≈ N/2 (the scale-killer,
   measured for the SCALE.md before/after row);
2. quantile-CDF bounds: max per-bucket rows ≤ 2 × N/buckets;
3. parquet-footer CDF bounds on a time-ordered layout (the zero-scan
   100 TB path), at BOTH row-group granularities:
   a. default 128 MB row groups — at 20M rows that is ~1 row group per
      file, FEWER groups than buckets, so the piecewise-uniform CDF
      cannot see intra-group skew; assert the theoretical guarantee
      ``target + 2 × max_row_group_rows`` (a sorted layout puts each
      bucket boundary inside ≤ 1 straddling group);
   b. row groups forced small enough that groups ≫ buckets — the shape
      a 100 TB table always has (thousands of 128 MB groups vs dozens
      of buckets) — assert the tight ``2 × target`` bound;
4. ``asof_join_backward`` and ``asof_join_linear`` (scaled, CDF bounds)
   remain EXACTLY equal to their global-window twins on the skewed
   corpus — skew must not change semantics, only the partition shape;
5. ``scale.interpolate_time`` (bucketed carries, CDF bounds) remains
   exactly equal to the global-window kernel on the skewed corpus with
   80% planted nulls (gaps span the hot/cold seam).

Run from the repo root: python scripts/scale_smoke_asof_skew.py [n_rows]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from solarboat_data_pipeline_spark import get_spark  # noqa: E402
from solarboat_data_pipeline_spark.operators import scale as sc  # noqa: E402
from solarboat_data_pipeline_spark.operators import timeseries as ts  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
BUCKETS = 64
WORK = "/tmp/asof_skew_smoke"
COLD_BASE = 1_600_000_000_000_000  # epoch µs
COLD_STEP = 259_000  # odd ids: one event / 259 ms → ~30 days for N/2 events
HOT_BASE = COLD_BASE + 1_000_000_000_000  # hot burst ~11.6 days in
# even ids: one event / 2 µs → N/2 events inside N µs (20 s at N=20M).
# Parity keeps the two arms globally DISTINCT even where the cold span
# crosses the hot window (hot = even offsets, cold = odd): duplicate
# order keys are outside the interpolation contract (pandas reindex
# raises on them; see interpolate_time docstrings), so the corpus must
# not produce any.

results: list[dict] = []


def report(check: str, agree: bool, extra: dict) -> None:
    rec = {"check": check, "agree": bool(agree), **extra}
    results.append(rec)
    print(json.dumps(rec), flush=True)


def skewed_events(spark):
    """50% of events in an N µs hot window, 50% spread over ~30 days.
    Timestamps are all distinct (hot arm even, cold arm odd), so global
    vs bucketed tie behavior cannot mask a boundary bug."""
    half = F.col("id") / 2
    hot = F.lit(HOT_BASE) + half.cast("long") * 2
    cold = F.lit(COLD_BASE) + half.cast("long") * COLD_STEP + 1
    return spark.range(N).select(
        F.col("id").alias("event_id"),
        F.timestamp_micros(
            F.when(F.col("id") % 2 == 0, hot).otherwise(cold).cast("long")
        ).alias("ts"),
    )


def reference_series(spark):
    """Sparse right side: 100k valued samples uniform over the full span
    (so as-of carries cross the hot region)."""
    n_ref = 100_000
    span = (N // 2) * COLD_STEP
    return spark.range(n_ref).select(
        F.timestamp_micros(
            (F.lit(COLD_BASE) + F.col("id") * (span // n_ref)).cast("long")
        ).alias("ts"),
        (F.col("id") % 1000 / 7.0).alias("v"),
    )


def max_bucket_rows(df, bounds):
    b = sc.with_buckets(df, "ts", bounds=bounds)
    row = b.groupBy("__bkt").count().agg(
        F.max("count").alias("mx"), F.count(F.lit(1)).alias("nb")
    ).first()
    return int(row["mx"]), int(row["nb"])


def main() -> None:
    spark = get_spark(app_name="asof-skew-smoke")
    ev = skewed_events(spark).localCheckpoint()
    ref = reference_series(spark).localCheckpoint()
    target = N // BUCKETS

    # -- 1. equal-width bounds: the naive form a CDF-less kernel would use
    lo, hi = ev.agg(
        F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))
    ).first()
    width_bounds = [lo + (hi - lo) * i // BUCKETS for i in range(1, BUCKETS)]
    mx_w, nb_w = max_bucket_rows(ev, width_bounds)
    report(
        "equal_width_bounds_funnel",
        mx_w >= N // 2,  # the hot region lands in ONE bucket — the killer
        {"max_bucket_rows": mx_w, "buckets": nb_w, "target_rows": target},
    )

    # -- 2. quantile-CDF bounds (compute_bounds — the kernels' default)
    t0 = time.perf_counter()
    cdf_bounds = sc.compute_bounds(ev, "ts", BUCKETS)
    t_bounds = round(time.perf_counter() - t0, 2)
    mx_c, nb_c = max_bucket_rows(ev, cdf_bounds)
    report(
        "cdf_bounds_hold_under_skew",
        mx_c <= 2 * target,
        {
            "max_bucket_rows": mx_c,
            "buckets": nb_c,
            "target_rows": target,
            "bounds_sec": t_bounds,
        },
    )

    # -- 3. parquet-footer CDF on a time-ordered layout (zero-scan path)
    import pyarrow.parquet as pq

    def rg_stats(p):
        rows = [
            pf.metadata.row_group(i).num_rows
            for r, _, fs in os.walk(p)
            for f in fs
            if f.endswith(".parquet")
            for pf in [pq.ParquetFile(os.path.join(r, f))]
            for i in range(pf.metadata.num_row_groups)
        ]
        return len(rows), max(rows)

    shutil.rmtree(WORK, ignore_errors=True)
    sorted_ev = ev.repartitionByRange(32, "ts").sortWithinPartitions("ts")

    # 3a. default 128 MB row groups: at this N the layout has FEWER row
    # groups than buckets, so intra-group skew is invisible to footer
    # stats; the provable bound is target + 2×max_rg (each bucket edge
    # straddles ≤1 group in a sorted layout), NOT 2×target.
    path = os.path.join(WORK, "events_sorted.parquet")
    sorted_ev.write.mode("overwrite").parquet(path)
    n_rg, max_rg = rg_stats(path)
    meta_bounds = sc.bounds_from_parquet_metadata(path, "ts", BUCKETS)
    assert meta_bounds, "footer statistics missing"
    mx_m, nb_m = max_bucket_rows(spark.read.parquet(path), meta_bounds)
    report(
        "footer_cdf_coarse_rowgroups_theoretical_bound",
        mx_m <= target + 2 * max_rg,
        {
            "max_bucket_rows": mx_m,
            "buckets": nb_m,
            "target_rows": target,
            "row_groups": n_rg,
            "max_rowgroup_rows": max_rg,
            "bound": target + 2 * max_rg,
        },
    )

    # 3b. row groups ≫ buckets — the 100 TB shape (a petabyte table has
    # thousands of 128 MB groups vs dozens of buckets). Force ~1 MB
    # groups so the CDF resolution matches that regime, then the tight
    # bound must hold even with 50% of rows inside a 20 s window.
    path_fine = os.path.join(WORK, "events_sorted_fine.parquet")
    sorted_ev.write.mode("overwrite").option(
        "parquet.block.size", str(64 << 10)
    ).parquet(path_fine)
    n_rg_f, max_rg_f = rg_stats(path_fine)
    meta_bounds_f = sc.bounds_from_parquet_metadata(path_fine, "ts", BUCKETS)
    assert meta_bounds_f, "footer statistics missing (fine)"
    mx_f, nb_f = max_bucket_rows(spark.read.parquet(path_fine), meta_bounds_f)
    report(
        "footer_cdf_bounds_hold_under_skew",
        mx_f <= 2 * target and n_rg_f >= 4 * BUCKETS,
        {
            "max_bucket_rows": mx_f,
            "buckets": nb_f,
            "target_rows": target,
            "row_groups": n_rg_f,
            "max_rowgroup_rows": max_rg_f,
        },
    )

    # -- 4. semantics unchanged: scaled as-of joins == global twins, exact
    def diverge(g, s):
        gg = g.select("event_id", F.col("v").alias("g"))
        ss = s.select("event_id", F.col("v").alias("s"))
        r = (
            gg.join(ss, "event_id", "full")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    (~F.col("g").eqNullSafe(F.col("s"))).cast("long")
                ).alias("mismatch"),
            )
            .first()
        )
        return int(r["n"]), int(r["mismatch"] or 0)

    for name, g_fn, s_fn in (
        (
            "asof_backward_skew_exact",
            lambda: ts.asof_join_backward(ev, ref, on="ts", value_cols=["v"]),
            lambda: sc.asof_join_backward(
                ev, ref, on="ts", value_cols=["v"], bounds=cdf_bounds
            ),
        ),
        (
            "asof_linear_skew_exact",
            lambda: ts.asof_join_linear(ev, ref, on="ts", value_cols=["v"]),
            lambda: sc.asof_join_linear(
                ev, ref, on="ts", value_cols=["v"], bounds=cdf_bounds
            ),
        ),
    ):
        t0 = time.perf_counter()
        g = g_fn()
        s = s_fn()
        n, mismatch = diverge(g, s)
        report(
            name,
            n == N and mismatch == 0,
            {"rows": n, "mismatches": mismatch, "sec": round(time.perf_counter() - t0, 2)},
        )

    # -- 5. bucketed interpolation == global kernel on the skewed corpus
    holes = ev.withColumn(
        "v",
        F.when(
            F.pmod(F.hash("event_id"), 5) == 0, (F.col("event_id") % 997).cast("double")
        ),  # 80% nulls; runs cross the hot/cold seam
    )
    t0 = time.perf_counter()
    g = ts.interpolate_time(holes, ts_col="ts", value_cols=["v"], limit_area="inside")
    s = sc.interpolate_time(
        holes, ts_col="ts", value_cols=["v"], limit_area="inside", bounds=cdf_bounds
    )
    n_i, mismatch_i = diverge(g, s)
    report(
        "interpolate_skew_exact",
        n_i == N and mismatch_i == 0,
        {
            "rows": n_i,
            "mismatches": mismatch_i,
            "sec": round(time.perf_counter() - t0, 2),
        },
    )

    all_agree = all(r["agree"] for r in results)
    print(
        json.dumps(
            {
                "metric": "asof_skew_smoke",
                "events": N,
                "all_agree": all_agree,
                "per_task_max_rows": {
                    "equal_width": mx_w,
                    "quantile_cdf": mx_c,
                    "footer_cdf_coarse_rg": mx_m,
                    "footer_cdf_fine_rg": mx_f,
                    "target": target,
                },
            }
        )
    )
    shutil.rmtree(WORK, ignore_errors=True)
    if not all_agree:
        sys.exit(1)


if __name__ == "__main__":
    main()
