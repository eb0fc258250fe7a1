#!/usr/bin/env python
"""Paragraph-dedup SKEW smoke: measures the map-side-combine claim of
``operators/dedup.py:paragraph_dedup`` (VERDICT r6 item 4).

Corpus: N documents of 3 ten-word paragraphs each, where ONE boilerplate
paragraph appears in 50% of all documents (the corpus-wide-repeated-
boilerplate skew case — a cookie banner, a license header). Two
implementations of the identical first-occurrence rule run on it:

* the shipped kernel — winner pick is a map-side-combining
  ``min(struct(id, pos))`` HASH AGGREGATE on the paragraph digest, so
  the boilerplate collapses to one row per mapper BEFORE the shuffle;
* a NAIVE twin — ``row_number() OVER (PARTITION BY digest ORDER BY
  (id, pos))`` keep-first, which funnels every copy of the boilerplate
  digest through ONE window task.

For each, the script records wall time, total shuffle write bytes and
the PEAK single-task shuffle read (from the Spark REST status API) —
the numbers that decide whether the operator survives a hot key at
100 TB — and requires the two outputs to agree row for row (plus the
analytically expected totals). It also reports which physical join the
digest join-back chose (broadcast at small build sides, shuffle join
once the distinct-paragraph table exceeds the threshold) and that the
result is identical either way — the graceful-degradation check.

Run from the repo root: python scripts/scale_smoke_paragraph_skew.py [n_docs]
Exits 1 unless every check agrees.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from solarboat_data_pipeline_spark import get_spark  # noqa: E402
from solarboat_data_pipeline_spark.operators.dedup import (  # noqa: E402
    paragraph_dedup,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
WORK = "/tmp/scale_smoke_paragraph"
results: list[dict] = []


def report(check: str, agree: bool, extra: dict) -> None:
    rec = {"check": check, "agree": bool(agree), **extra}
    results.append(rec)
    print(json.dumps(rec), flush=True)


def _api(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    with urllib.request.urlopen(f"{base}/api/v1/applications{path}") as r:
        return json.loads(r.read())


def _app_id(spark) -> str:
    return spark.sparkContext.applicationId


def _stage_metrics(spark) -> dict[int, dict]:
    app = _app_id(spark)
    out = {}
    for st in _api(spark, f"/{app}/stages?status=complete"):
        out[st["stageId"]] = st
    return out


def _run_measured(spark, df, label: str):
    """Execute df (count action); returns (rows, wall, shuffle_write_B,
    peak_task_shuffle_read_B, straggler_factor) for the stages this
    action created. straggler_factor = max/median single-task run time
    over the shuffle-read stages — the number skew actually shows up in
    (on-wire bytes hide a hot key whose rows are identical: LZ4
    collapses them, but the task still has to process every row)."""
    before = set(_stage_metrics(spark))
    t0 = time.perf_counter()
    rows = df.count()
    wall = time.perf_counter() - t0
    stages = _stage_metrics(spark)
    new = [s for sid, s in stages.items() if sid not in before]
    shuffle_write = sum(s.get("shuffleWriteBytes", 0) for s in new)
    app = _app_id(spark)
    peak_read = 0
    straggler = 0.0
    for s in new:
        if s.get("shuffleReadBytes", 0) == 0:
            continue
        try:
            q = _api(
                spark,
                f"/{app}/stages/{s['stageId']}/{s['attemptId']}/taskSummary"
                "?quantiles=0.5,1.0",
            )
            peak_read = max(
                peak_read,
                int(q["shuffleReadMetrics"]["readBytes"][1]),
            )
            med, mx = q["executorRunTime"]
            if med > 0:
                straggler = max(straggler, mx / med)
        except Exception:
            pass
    return rows, wall, shuffle_write, peak_read, straggler


def generate(spark):
    """N docs x 3 paragraphs; even ids carry THE boilerplate paragraph as
    their middle chunk (50% corpus-wide hot paragraph)."""
    boiler = " ".join(f"boiler{j}" for j in range(10))

    def para(tag):
        return F.concat_ws(
            " ", *[F.format_string(f"w%d{tag}x{j}", F.col("id")) for j in range(10)]
        )

    docs = spark.range(N).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            para("a"),
            F.when(F.col("id") % 2 == 0, F.lit(boiler)).otherwise(para("b")),
            para("c"),
        ).alias("text"),
    )
    path = os.path.join(WORK, "docs.parquet")
    docs.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def naive_paragraph_dedup(docs):
    """The same first-occurrence rule via a per-digest window — the
    implementation whose hot digest funnels through one task."""
    toks = F.split(F.col("text"), " ")
    n_para = F.ceil(F.size(toks) / F.lit(10)).cast("int")
    paras = docs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_para - 1),
                lambda i: F.array_join(F.slice(toks, i * 10 + 1, 10), " "),
            )
        ).alias("pos", "para"),
    ).withColumn("digest", F.sha2("para", 256))
    w = Window.partitionBy("digest").orderBy("doc_id", "pos")
    kept = paras.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    return (
        kept.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "para"))),
                    lambda s: s["para"],
                ),
                " ",
            ).alias("cleaned_text"),
            F.count(F.lit(1)).alias("kept_paragraphs"),
        )
    )


def main() -> None:
    os.makedirs(WORK, exist_ok=True)
    spark = get_spark(
        app_name="paragraph-skew-smoke",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4055"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()
    docs = generate(spark)
    print(
        json.dumps(
            {"stage": "generate", "docs": N,
             "sec": round(time.perf_counter() - t0, 2)}
        ),
        flush=True,
    )

    kernel = paragraph_dedup(docs)
    k_rows, k_wall, k_shw, k_peak, k_strag = _run_measured(
        spark, kernel, "kernel"
    )
    naive = naive_paragraph_dedup(docs)
    n_rows, n_wall, n_shw, n_peak, n_strag = _run_measured(
        spark, naive, "naive"
    )

    # analytically expected totals: every doc survives; the boilerplate
    # (N/2 copies) keeps exactly one, so kept = 3N - (N/2 - 1)
    expect_kept = 3 * N - (N // 2 - 1)
    k_kept = kernel.agg(F.sum("kept_paragraphs")).first()[0]
    report(
        "kernel_vs_analytic_totals",
        k_rows == N and k_kept == expect_kept,
        {"rows": k_rows, "kept_paragraphs": int(k_kept),
         "expected_kept": expect_kept},
    )

    mismatches = (
        kernel.alias("k")
        .join(naive.alias("n"), "doc_id", "full_outer")
        .where(
            ~F.col("k.cleaned_text").eqNullSafe(F.col("n.cleaned_text"))
            | ~F.col("k.kept_paragraphs").eqNullSafe(F.col("n.kept_paragraphs"))
        )
        .count()
    )
    report(
        "kernel_vs_naive_parity_at_skew",
        mismatches == 0 and k_rows == n_rows,
        {"mismatches": mismatches, "kernel_rows": k_rows, "naive_rows": n_rows},
    )

    # the skew defense in numbers: the kernel's map-side combine must
    # keep every task near the median (no straggler), while the naive
    # window's hot digest funnels 50% of all paragraphs through one
    # task — its max/median task-time ratio grows with N
    report(
        "skew_resistance_metrics",
        k_strag < 4.0 and n_strag > k_strag and k_wall <= n_wall * 1.25,
        {
            "kernel_wall_sec": round(k_wall, 2),
            "naive_wall_sec": round(n_wall, 2),
            "kernel_shuffle_write_mb": round(k_shw / 1e6, 1),
            "naive_shuffle_write_mb": round(n_shw / 1e6, 1),
            "kernel_peak_task_shuffle_read_mb": round(k_peak / 1e6, 1),
            "naive_peak_task_shuffle_read_mb": round(n_peak / 1e6, 1),
            "kernel_straggler_factor": round(k_strag, 1),
            "naive_straggler_factor": round(n_strag, 1),
        },
    )

    # Plan-shape invariants this smoke exists to defend (it caught two
    # regressions already: the r6 agg+join form's 10 M-row build side
    # statically mis-estimated UNDER the broadcast threshold — AQE never
    # demotes a chosen broadcast, an OOM hazard at scale — and the
    # carry-text-through-the-agg form silently degrading every
    # aggregate to SortAggregate because strings have no mutable
    # hash-agg buffer):
    #   1. NO SortAggregate anywhere — the winner pick must stay a
    #      whole-stage-codegen hash aggregate (map-side combine is the
    #      entire skew defense);
    #   2. exactly ONE join, and it is id-keyed (skew-free), never
    #      digest-keyed.
    plan = paragraph_dedup(docs)._jdf.queryExecution().executedPlan().toString()
    sort_aggs = plan.count("SortAggregate")
    joins = sum(plan.count(j) for j in (
        "BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
        "BroadcastNestedLoopJoin", "CartesianProduct",
    ))
    digest_join = any(
        "Join" in ln and ("__digest" in ln or "__h1" in ln)
        for ln in plan.splitlines()
    )
    join_kinds = [
        ln.strip().split("[")[0].split()[-1]
        for ln in plan.splitlines()
        if "Join" in ln and "Exec" not in ln
    ]
    report(
        "kernel_plan_hash_agg_one_idkeyed_join",
        sort_aggs == 0 and joins == 1 and not digest_join,
        {"sort_aggregates": sort_aggs, "joins_in_plan": joins,
         # at corpus scale the static estimator must NOT broadcast the
         # one-row-per-doc position table (measured at 10 M docs:
         # SortMergeJoin — the safe direction, since AQE may upgrade a
         # small run to broadcast but can never demote a mis-estimate)
         "join_kinds": join_kinds},
    )

    all_agree = all(r["agree"] for r in results)
    print(
        json.dumps(
            {"metric": "paragraph_skew_smoke", "docs": N,
             "hot_paragraph_share": 0.5, "all_agree": all_agree}
        )
    )
    if not all_agree:
        sys.exit(1)


if __name__ == "__main__":
    main()
