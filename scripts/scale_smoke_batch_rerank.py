#!/usr/bin/env python
"""Batch-mode SQ8 re-rank scale smoke (round 10, VERDICT r9 #3).

`ivf_sq8_topk_indexed(mode="interactive")` collects the candidate
(query, neighbor) pairs to push a pruned predicate into the vectors
scan — right for interactive search, driver-bounded for offline
re-ranks (~50 MB of Python driver heap per million candidate rows).
`mode="batch"` keeps candidates distributed: candidates→vectors is a
join, queries join plain instead of broadcasting, nothing is collected.

Checks (self-checking, exit 1 on disagreement):

1. batch ≡ interactive row-for-row on a medium batch (the modes share
   the candidate definition and the deterministic ranking contract);
2. a ≥10 M-candidate batch run completes with FLAT Python-driver RSS
   (delta ≪ the ~500 MB the interactive collect would hold) and zero
   `collect()` of candidate rows — the structural claim;
3. `mode="auto"` picks batch for that batch size (threshold math).

Run from the repo root:  python scripts/scale_smoke_batch_rerank.py [n_vecs]
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from solarboat_data_pipeline_spark import get_spark  # noqa: E402
from solarboat_data_pipeline_spark.operators import similarity as sim  # noqa: E402

N_VECS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
DIM = 16
N_CENT = 256  # |cell| ~ 3.9k: scoring volume |Q|*nprobe*|cell| stays ~0.8B
K = 20
OVERSAMPLE = 5
# 10M candidates = |Q| * K * OVERSAMPLE -> |Q| = 100_000
N_Q_BIG = 100_000
N_Q_SMALL = 400

results: list[dict] = []


def report(check: str, agree: bool, extra: dict) -> None:
    rec = {"check": check, "agree": bool(agree), **extra}
    results.append(rec)
    print(json.dumps(rec), flush=True)


def reset_peak_rss() -> bool:
    """Reset the kernel's per-process RSS high-water mark (VmHWM) so the
    next :func:`peak_rss_mb` read measures THIS phase's true peak — a
    lifetime ru_maxrss delta can read 0.0 even if the measured phase
    transiently collected hundreds of MB below an earlier phase's peak."""
    try:
        with open("/proc/self/clear_refs", "w") as f:
            f.write("5")
        return True
    except OSError:
        return False


def peak_rss_mb() -> float:
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmHWM:"):
                    return int(line.split()[1]) / 1024.0
    except OSError:
        pass
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def main() -> None:
    spark = get_spark(app_name="scale-smoke-batch-rerank")
    spark.sparkContext.setLogLevel("ERROR")
    corpus_path = "/tmp/scale_smoke_batch_rerank_corpus"
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda k: (F.pmod(F.hash(F.col("id"), k), 2001) - 1000) / 1000.0,
    ).cast("array<double>")
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        spark.range(N_VECS).select(
            F.col("id").alias("vec_id"), vec.alias("embedding")
        ).write.mode("overwrite").parquet(corpus_path)
    df = spark.read.parquet(corpus_path)
    idx = "/tmp/scale_smoke_batch_rerank_idx"
    if not os.path.exists(os.path.join(idx, "vectors", "_SUCCESS")):
        sim.build_ivf_sq8_index(df, idx, n_centroids=N_CENT)

    # ---- check 1: medium batch, batch ≡ interactive ----
    q_small = df.where(F.col("vec_id") < N_Q_SMALL)
    kw = dict(k=K, nprobe=2, oversample=OVERSAMPLE)
    inter = sim.ivf_sq8_topk_indexed(
        spark, idx, q_small, mode="interactive", **kw
    )
    batch = sim.ivf_sq8_topk_indexed(spark, idx, q_small, mode="batch", **kw)
    a = inter.select("query_id", "rank", "neighbor_id", "cosine_sim")
    b = batch.select(
        "query_id",
        "rank",
        F.col("neighbor_id").alias("b_nid"),
        F.col("cosine_sim").alias("b_sim"),
    )
    j = a.join(b, ["query_id", "rank"], "full")
    mism = j.where(
        F.col("neighbor_id").isNull()
        | F.col("b_nid").isNull()
        | (F.col("neighbor_id") != F.col("b_nid"))
        | (F.col("cosine_sim") != F.col("b_sim"))
    ).count()
    n_rows = a.count()
    report(
        "batch_equals_interactive_medium",
        mism == 0 and n_rows > 0,
        {"queries": N_Q_SMALL, "rows": n_rows, "mismatches": mism},
    )

    # ---- check 3 (cheap, before the big run): auto picks batch ----
    q_big = df.where(F.col("vec_id") < N_Q_BIG)
    est = N_Q_BIG * K * OVERSAMPLE
    report(
        "auto_threshold_selects_batch",
        est > sim._BATCH_RERANK_MIN,
        {"estimated_candidates": est, "threshold": sim._BATCH_RERANK_MIN},
    )

    # ---- check 2: 10M-candidate batch, flat driver RSS ----
    hwm_reset = reset_peak_rss()
    rss0 = peak_rss_mb()
    t0 = time.perf_counter()
    big = sim.ivf_sq8_topk_indexed(spark, idx, q_big, mode="auto", **kw)
    # aggregate instead of collecting the 2M result rows — the check is
    # driver flatness of the SEARCH, not of result retrieval
    agg = big.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("query_id").alias("nq"),
        F.sum("cosine_sim").alias("s"),
    ).first()
    wall = time.perf_counter() - t0
    rss1 = peak_rss_mb()
    # the interactive path would hold ≥10M (id,id) Row objects (~500 MB+);
    # flat = the batch search's PEAK (VmHWM reset at phase start, so a
    # transient collect cannot hide under an earlier phase's peak) grew
    # the Python driver by well under that
    delta = rss1 - rss0
    report(
        "batch_10m_candidates_flat_driver_rss",
        agg["nq"] == N_Q_BIG and agg["n"] == N_Q_BIG * K and delta < 200.0,
        {
            "queries": N_Q_BIG,
            "estimated_candidates": est,
            "result_rows": agg["n"],
            "peak_rss_reset": hwm_reset,
            "rss_before_mb": round(rss0, 1),
            "rss_after_mb": round(rss1, 1),
            "rss_delta_mb": round(delta, 1),
            "wall_sec": round(wall, 1),
        },
    )

    ok = all(r["agree"] for r in results)
    print(json.dumps({"smoke": "batch_rerank", "checks": len(results),
                      "ok": ok}))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
