#!/usr/bin/env python
"""Decontamination STRATEGY smoke: measures the Bloom-prefilter claim of
``operators/dedup.py:decontaminate(strategy="bloom")``.

The broadcast strategy is for eval corpora whose distinct-shingle hash
set fits the broadcast threshold; past that, the train side must reach a
join some other way. This smoke runs the two non-broadcast strategies on
the same corpus — N train documents, a bench corpus, ~1% of train docs
genuinely contaminated — and records, from the Spark REST status API,
what each one puts on the wire:

* ``shuffle`` — co-partitioned shuffled-hash join: EVERY train shingle
  hash (one row per (doc, distinct shingle)) crosses the exchange;
* ``bloom`` — the bench set's Bloom filter (~10 bits/item, built by a
  distributed ``bit_or`` hash aggregate, broadcast as one blob) prunes
  the train side MAP-SIDE, so the exchange carries only survivors
  (true matches + ~fpp of the corpus).

Checks (exit 1 unless all agree):
  1. all three strategies return identical rows (bloom/shuffle/broadcast),
  2. the result matches the analytically expected contamination exactly,
  3. bloom's total shuffle write is < 50% of the shuffle strategy's
     (measured ~20x lower at the default 1% contamination + 1% fpp),
  4. plan shapes: the bloom probe is Arrow-batched (ArrowEvalPython,
     never BatchEvalPython) and sits before the join; the shuffle
     strategy actually plans a ShuffledHashJoin.

Run from the repo root: python scripts/scale_smoke_decontaminate.py [n_docs]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from solarboat_data_pipeline_spark import get_spark  # noqa: E402
from solarboat_data_pipeline_spark.operators.dedup import (  # noqa: E402
    decontaminate,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
N_BENCH = 50_000  # bench docs; 6 distinct shingles each
CONTAM_EVERY = 100  # every 100th train doc embeds a 4-word bench run
WORK = "/tmp/scale_smoke_decon"
results: list[dict] = []


def report(check: str, agree: bool, extra: dict) -> None:
    rec = {"check": check, "agree": bool(agree), **extra}
    results.append(rec)
    print(json.dumps(rec), flush=True)


def _api(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    with urllib.request.urlopen(f"{base}/api/v1/applications{path}") as r:
        return json.loads(r.read())


def _stage_ids(spark) -> set[int]:
    app = spark.sparkContext.applicationId
    return {s["stageId"] for s in _api(spark, f"/{app}/stages?status=complete")}


def _run_measured(spark, make_df):
    """Build the frame via ``make_df()`` INSIDE the measured window and
    count() it; return (df, rows, wall_sec, total shuffle write B, peak
    single-task shuffle read B) over every stage either step created.
    Construction must be inside the window because the bloom strategy
    runs its sizing/bitmap-build jobs eagerly at DataFrame-construction
    time — snapshotting after construction would silently exclude the
    filter build from the bloom side's wire accounting."""
    app = spark.sparkContext.applicationId
    before = _stage_ids(spark)
    t0 = time.perf_counter()
    df = make_df()
    rows = df.count()
    wall = time.perf_counter() - t0
    new = [
        s
        for s in _api(spark, f"/{app}/stages?status=complete")
        if s["stageId"] not in before
    ]
    shuffle_write = sum(s.get("shuffleWriteBytes", 0) for s in new)
    peak_read = 0
    for s in new:
        if s.get("shuffleReadBytes", 0) == 0:
            continue
        try:
            q = _api(
                spark,
                f"/{app}/stages/{s['stageId']}/{s['attemptId']}/taskSummary"
                "?quantiles=1.0",
            )
            peak_read = max(peak_read, int(q["shuffleReadMetrics"]["readBytes"][0]))
        except Exception:
            pass
    return df, rows, wall, shuffle_write, peak_read


def generate(spark):
    """Bench: N_BENCH docs of 8 unique words (6 shingles each). Train:
    N docs of 12 unique words; every CONTAM_EVERY-th doc replaces its
    last 4 words with a consecutive 4-word run from one bench doc —
    exactly 2 shared 3-shingles per contaminated doc."""
    bench = spark.range(N_BENCH).select(
        (F.col("id") + 10 * N).alias("doc_id"),
        F.concat_ws(
            " ", *[F.format_string(f"bm%dw{j}", F.col("id")) for j in range(8)]
        ).alias("text"),
    )
    own = [F.format_string(f"t%dw{j}", F.col("id")) for j in range(12)]
    b = F.col("id") % N_BENCH
    run = [F.format_string(f"bm%dw{j}", b) for j in range(4)]
    train = spark.range(N).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") % CONTAM_EVERY == 0, F.concat_ws(" ", *own[:8], *run)
        )
        .otherwise(F.concat_ws(" ", *own))
        .alias("text"),
    )
    bp = os.path.join(WORK, "bench.parquet")
    tp = os.path.join(WORK, "train.parquet")
    bench.write.mode("overwrite").parquet(bp)
    train.write.mode("overwrite").parquet(tp)
    return spark.read.parquet(tp), spark.read.parquet(bp)


def main() -> None:
    os.makedirs(WORK, exist_ok=True)
    spark = get_spark(
        app_name="decontaminate-strategy-smoke",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4056"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()
    train, bench = generate(spark)
    print(
        json.dumps(
            {"stage": "generate", "train_docs": N, "bench_docs": N_BENCH,
             "sec": round(time.perf_counter() - t0, 2)}
        ),
        flush=True,
    )

    # the caller-knows-the-count fast path (8 words -> 6 shingles/doc,
    # globally distinct by construction); the count() path is covered by
    # the driver row and unit tests
    expected_items = N_BENCH * 6
    shuffle_df, s_rows, s_wall, s_shw, s_peak = _run_measured(
        spark, lambda: decontaminate(train, bench, strategy="shuffle")
    )
    bloom_df, b_rows, b_wall, b_shw, b_peak = _run_measured(
        spark,
        lambda: decontaminate(
            train, bench, strategy="bloom", expected_items=expected_items
        ),
    )

    # 1. strategy parity, all three
    bcast_df = decontaminate(train, bench, strategy="broadcast")
    mism = (
        bloom_df.alias("b")
        .join(shuffle_df.alias("s"), "id", "full_outer")
        .join(bcast_df.alias("c"), "id", "full_outer")
        .where(
            ~F.col("b.n_contaminated").eqNullSafe(F.col("s.n_contaminated"))
            | ~F.col("b.n_contaminated").eqNullSafe(F.col("c.n_contaminated"))
        )
        .count()
    )
    report(
        "strategies_identical",
        mism == 0 and b_rows == s_rows,
        {"mismatches": mism, "bloom_rows": b_rows, "shuffle_rows": s_rows},
    )

    # 2. analytic: every CONTAM_EVERY-th doc shares exactly 2 shingles —
    # PLUS the h32 collision floor. The operator (like its DuckDB oracle)
    # is DEFINED on 32-bit shingle hashes, so ~ n_train_shingles ·
    # n_bench_shingles / 2^32 additional (doc, shingle) pairs collide
    # into matches (Poisson; measured 349 at N=500k vs mean 349.6).
    # Bounded at ±5σ — a logic regression (off-by-one shingling, a
    # broken filter) moves these counts by thousands, not ±5σ.
    expect_rows = (N + CONTAM_EVERY - 1) // CONTAM_EVERY
    mean_coll = N * 10 * (N_BENCH * 6) / 2**32
    slack = 5 * mean_coll**0.5 + 1
    total = int(bloom_df.agg(F.sum("n_contaminated")).first()[0])
    rows_ok = (
        expect_rows + max(0, mean_coll - slack)
        <= b_rows
        <= expect_rows + mean_coll + slack
    )
    sum_ok = (
        2 * expect_rows + max(0, mean_coll - slack)
        <= total
        <= 2 * expect_rows + mean_coll + slack
    )
    report(
        "bloom_vs_analytic",
        rows_ok and sum_ok,
        {"rows": b_rows, "expected_rows_before_collisions": expect_rows,
         "sum_contaminated": total,
         "expected_sum_before_collisions": 2 * expect_rows,
         "expected_h32_collisions": round(mean_coll, 1)},
    )

    # 3. the wire: bloom's exchange carries survivors, not the corpus
    report(
        "bloom_prunes_the_shuffle",
        b_shw < 0.5 * s_shw,
        {
            "shuffle_strategy_write_mb": round(s_shw / 1e6, 1),
            "bloom_strategy_write_mb": round(b_shw / 1e6, 1),
            "reduction_factor": round(s_shw / max(b_shw, 1), 1),
            "shuffle_peak_task_read_mb": round(s_peak / 1e6, 1),
            "bloom_peak_task_read_mb": round(b_peak / 1e6, 1),
            "shuffle_wall_sec": round(s_wall, 2),
            "bloom_wall_sec": round(b_wall, 2),
        },
    )

    # 4. plan shapes
    b_plan = bloom_df._jdf.queryExecution().executedPlan().toString()
    s_plan = shuffle_df._jdf.queryExecution().executedPlan().toString()
    report(
        "plan_shapes",
        "ArrowEvalPython" in b_plan
        and "BatchEvalPython" not in b_plan
        and "ShuffledHashJoin" in s_plan,
        {
            "bloom_probe_arrow": "ArrowEvalPython" in b_plan,
            "bloom_rowwise_python": "BatchEvalPython" in b_plan,
            "shuffle_join_kind": "ShuffledHashJoin"
            if "ShuffledHashJoin" in s_plan
            else "other",
        },
    )

    all_agree = all(r["agree"] for r in results)
    print(
        json.dumps(
            {"metric": "decontaminate_strategy_smoke", "train_docs": N,
             "bench_docs": N_BENCH, "all_agree": all_agree}
        )
    )
    if not all_agree:
        sys.exit(1)


if __name__ == "__main__":
    main()
