#!/usr/bin/env python
"""Skew-kernel scale smoke: the operators/skew.py kernels vs their exact
single-task twins on a 20 M-row corpus with a genuinely hot key.

Completes the per-family scale evidence (ordered kernels:
scale_smoke.py; dedup/ANN: scale_smoke_dedup.py; streaming:
stream_smoke.py). Key distribution: one key holds 50% of all rows, 10
warm keys 2% each, the tail spreads over ~10 k cold keys — the shape
that funnels a plain per-key window sort or countDistinct through one
task.

Checks:
1. salted_topk == plain row_number window top-k, row for row (exact);
2. two_phase_count_distinct == countDistinct per key (exact);
3. exact_quantile_cont (forced onto its distributed rank-selection
   path) == DuckDB quantile_cont on the same parquet — the selected
   RANK VALUES are exact; only the final linear interpolation carries
   fp rounding, bounded at 1e-9.

Run from the repo root: python scripts/scale_smoke_skew.py [n_rows]
Exits 1 unless every check agrees.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from solarboat_data_pipeline_spark import get_spark  # noqa: E402
from solarboat_data_pipeline_spark.operators.skew import (  # noqa: E402
    exact_quantile_cont,
    salted_topk,
    two_phase_count_distinct,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
WORK = "/tmp/scale_smoke_skew"
K = 10

results: list[dict] = []


def report(check: str, agree: bool, extra: dict) -> None:
    rec = {"check": check, "agree": bool(agree), **extra}
    results.append(rec)
    print(json.dumps(rec), flush=True)


def generate(spark, path: str) -> None:
    """50% one hot key, 2% x 10 warm keys, rest over ~10 k cold keys.
    ``ov`` is unique per row (deterministic top-k ordering), ``dv`` has
    planted distinct-cardinalities, ``qv`` is a duplicate-heavy double."""
    u = F.pmod(F.hash("id"), 1000)
    key = (
        F.when(u < 500, F.lit("hot"))
        .when(u < 700, F.concat(F.lit("w"), F.pmod(u, F.lit(10))))
        .otherwise(F.concat(F.lit("c"), F.pmod(F.hash("id", F.lit(3)), 10_000)))
    )
    df = spark.range(N).select(
        key.alias("key"),
        F.col("id").cast("double").alias("ov"),
        F.pmod(F.hash("id", F.lit(5)), 50_000).alias("dv"),
        (F.pmod(F.hash("id", F.lit(9)), 1_000_000) / 7.0).alias("qv"),
    )
    df.write.mode("overwrite").parquet(path)


def check_salted_topk(spark, src: str) -> None:
    df = spark.read.parquet(src)
    t0 = time.perf_counter()
    salted = salted_topk(df, ["key"], "ov", K).select("key", "rank", "ov")
    salted_rows = set(map(tuple, salted.collect()))
    salted_sec = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    w = Window.partitionBy("key").orderBy(F.col("ov").desc())
    plain = (
        df.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= K)
        .select("key", "rank", "ov")
    )
    plain_rows = set(map(tuple, plain.collect()))
    plain_sec = round(time.perf_counter() - t0, 2)
    report(
        "salted_topk_vs_plain_window",
        salted_rows == plain_rows,
        {
            "rows": len(salted_rows),
            "mismatches": len(salted_rows ^ plain_rows),
            "salted_sec": salted_sec,
            "plain_window_sec": plain_sec,
        },
    )


def check_two_phase_distinct(spark, src: str) -> None:
    df = spark.read.parquet(src)
    t0 = time.perf_counter()
    got = {
        r["key"]: r["n_distinct"]
        for r in two_phase_count_distinct(df, ["key"], "dv").collect()
    }
    got_sec = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    want = {
        r["key"]: r["n"]
        for r in df.groupBy("key")
        .agg(F.countDistinct("dv").alias("n"))
        .collect()
    }
    want_sec = round(time.perf_counter() - t0, 2)
    bad = sum(1 for k in want if got.get(k) != want[k])
    report(
        "two_phase_distinct_vs_countDistinct",
        got == want,
        {
            "keys": len(want),
            "hot_key_distinct": want.get("hot"),
            "mismatched_keys": bad,
            "two_phase_sec": got_sec,
            "count_distinct_sec": want_sec,
        },
    )


def check_exact_quantile(spark, src: str) -> None:
    import duckdb

    df = spark.read.parquet(src)
    fracs = [0.01, 0.25, 0.5, 0.9, 0.999]
    t0 = time.perf_counter()
    # driver_threshold far below N forces the distributed batched
    # rank-selection path (the 100 TB path), not the driver sort
    got = exact_quantile_cont(
        df, "qv", fracs, accuracy=10_000, driver_threshold=100_000
    )
    got_sec = round(time.perf_counter() - t0, 2)
    arr = ", ".join(repr(f) for f in fracs)
    want = list(
        duckdb.sql(
            f"select unnest(quantile_cont(qv, [{arr}])) from '{src}/*.parquet'"
        ).df()
        .iloc[:, 0]
    )
    diffs = [abs(g - w) for g, w in zip(got, want)]
    report(
        "exact_quantile_distributed_vs_duckdb",
        max(diffs) < 1e-9,
        {
            "fractions": fracs,
            "max_abs_diff": max(diffs),
            "distributed_sec": got_sec,
        },
    )


def main() -> None:
    spark = get_spark(app_name="scale-smoke-skew")
    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(WORK)
    src = os.path.join(WORK, "rows")
    t0 = time.perf_counter()
    generate(spark, src)
    print(
        json.dumps(
            {"stage": "generate", "rows": N, "sec": round(time.perf_counter() - t0, 2)}
        ),
        flush=True,
    )

    check_salted_topk(spark, src)
    check_two_phase_distinct(spark, src)
    check_exact_quantile(spark, src)

    all_agree = all(r["agree"] for r in results)
    print(
        json.dumps(
            {"metric": "scale_smoke_skew", "rows": N, "all_agree": all_agree}
        )
    )
    if not all_agree:
        sys.exit(1)


if __name__ == "__main__":
    main()
