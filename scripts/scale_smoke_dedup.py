#!/usr/bin/env python
"""Corpus-scale smoke for the dedup/ANN family (operators/dedup.py,
operators/similarity.py) — the evidence SCALE.md's ordered-kernel table
gives the time-series ops, extended to the sub-quadratic dedup paths.

Four checks, each on synthetic data with PLANTED near-duplicates so both
recall and candidate volume have an analytic expectation:

1. **MinHash-LSH candidate volume + recall** (1 M docs, 10% planted
   near-dups): observed LSH recall over the planted pairs must agree with
   the banding formula 1-(1-J^r)^b evaluated at each planted pair's TRUE
   Jaccard (computed by the repo's own exact ``jaccard_verify`` kernel),
   and total candidate volume must stay sub-quadratic (≈ planted + hash
   background, nowhere near N²/2).
2. **Embedding LSH recall vs brute cosine** (300 k vectors; brute kernel
   on a slice both endpoints of which are in-slice): recall of
   ``embedding_lsh_dedup_pairs`` against ``embedding_cosine_pairs`` on
   the identical slice, plus full-corpus LSH wall-time + volume.
3. **Connected components: distributed loop ≡ union-find** (2.1 M edges,
   chain clusters of diameter 7): ``driver_threshold=0`` forces the
   iterative min-label loop; outputs must match the driver union-find
   finish row-for-row.
4. **Incremental dedup digest-index path** (1 M incoming vs 1 M seen via
   digest-only index): anti-join survivor count must equal the analytic
   expectation exactly.
5. **IVF recall/cost dial vs brute cosine** (300 k vectors, 64 queries,
   k=10): recall@k must be non-decreasing in ``nprobe``, and probing
   ALL cells (``nprobe = n_centroids``) must reproduce the brute
   ``cosine_topk`` result EXACTLY — the equivalence anchor that pins
   the IVF plan as a restriction of the exact kernel.

Run from the repo root:
    python scripts/scale_smoke_dedup.py [n_docs] [n_vecs] [n_edges]
Prints one JSON line per check + a summary line; exit 1 on any failure.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from solarboat_data_pipeline_spark import get_spark  # noqa: E402
from solarboat_data_pipeline_spark.operators import dedup as dd  # noqa: E402

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
N_VECS = int(sys.argv[2]) if len(sys.argv) > 2 else 300_000
N_EDGES = int(sys.argv[3]) if len(sys.argv) > 3 else 2_100_000

DUP_FRAC = 0.10  # fraction of docs that are a 1-word mutation of an original
WORDS_PER_DOC = 30
VOCAB = 50_000
EMB_DIM = 16
EMB_SLICE = 3_000  # originals in the brute-force slice (plus their twins)

results: dict[str, dict] = {}


def record(name: str, ok: bool, **kv) -> None:
    results[name] = {"agree": bool(ok), **kv}
    print(json.dumps({name: results[name]}, default=str), flush=True)


def corpus(spark):
    """N_DOCS docs of WORDS_PER_DOC pseudo-random words. The last
    DUP_FRAC*N are near-dup twins of originals 0..DUP_FRAC*N: same word
    seed, ONE word position replaced by a doc-unique token."""
    n_orig = int(N_DOCS * (1 - DUP_FRAC))
    seed = F.when(F.col("id") >= n_orig, F.col("id") - n_orig).otherwise(
        F.col("id")
    )
    mut_pos = F.pmod(F.hash("id", F.lit(7)), WORDS_PER_DOC)
    is_dup = F.col("id") >= n_orig
    word = lambda p: F.when(  # noqa: E731
        is_dup & (p == mut_pos), F.concat(F.lit("m"), F.col("id"))
    ).otherwise(
        F.concat(F.lit("w"), F.pmod(F.hash(seed.alias("s"), p), VOCAB))
    )
    words = F.transform(
        F.sequence(F.lit(0), F.lit(WORDS_PER_DOC - 1)), lambda p: word(p)
    )
    return spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"),
        F.array_join(words, " ").alias("text"),
    ), n_orig


def smoke_qids(n: int = 64) -> list[int]:
    """The shared query-id sample both recall checks rank against."""
    return [int(7 + 4679 * i) % N_VECS for i in range(n)]


def check_minhash_lsh(spark) -> None:
    df, n_orig = corpus(spark)
    df = df.localCheckpoint()
    n_dups = N_DOCS - n_orig

    t0 = time.perf_counter()
    cands = dd.lsh_candidate_pairs(df).localCheckpoint()
    n_cands = cands.count()
    t_lsh = round(time.perf_counter() - t0, 2)

    planted = spark.range(n_orig, N_DOCS).select(
        (F.col("id") - n_orig).alias("id_a"), F.col("id").alias("id_b")
    )
    hit = cands.join(planted, ["id_a", "id_b"], "semi").count()
    recall = hit / n_dups

    # analytic expectation: per planted pair, P(candidate) = 1-(1-J^r)^b
    # at the pair's TRUE Jaccard from the repo's exact verify kernel.
    # The formula assumes INDEPENDENT permutations; the engine's minhash
    # deliberately mixes ONE md5 through 16 affine maps (16x fewer
    # digests, dedup.py:33-37), whose residual correlation costs a few
    # points of recall — hence the asymmetric [exp-0.10, exp+0.02] band.
    jac = dd.jaccard_verify(df, planted, threshold=0.0)
    r, b = dd.ROWS_PER_BAND, dd.BANDS
    exp_recall = jac.agg(
        F.avg(1 - F.pow(1 - F.pow(F.col("jaccard"), r), b))
    ).first()[0]
    background = n_cands - hit

    ok = (
        exp_recall - 0.10 <= recall <= exp_recall + 0.02
        and n_cands < 5 * N_DOCS  # sub-quadratic: nowhere near N^2/2
    )
    record(
        "minhash_lsh_volume_recall",
        ok,
        docs=N_DOCS,
        planted_pairs=n_dups,
        candidates=n_cands,
        planted_hit=hit,
        recall=round(recall, 4),
        expected_recall=round(exp_recall, 4),
        background_pairs=background,
        lsh_sec=t_lsh,
    )


def vectors(spark):
    """N_VECS embeddings in [-1,1]^EMB_DIM; last DUP_FRAC*N are originals
    plus ±0.01 noise (cosine > 0.999)."""
    n_orig = int(N_VECS * (1 - DUP_FRAC))
    seed = F.when(F.col("id") >= n_orig, F.col("id") - n_orig).otherwise(
        F.col("id")
    )
    is_dup = (F.col("id") >= n_orig).cast("int")
    comp = lambda k: (  # noqa: E731
        (F.pmod(F.hash(seed.alias("s"), k), 2001) - 1000) / 1000.0
        + is_dup * (F.pmod(F.hash(F.col("id"), k, F.lit(99)), 21) - 10) / 1000.0
    )
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(EMB_DIM - 1)), lambda k: comp(k)
    ).cast("array<double>")
    return spark.range(N_VECS).select(
        F.col("id").alias("vec_id"), vec.alias("embedding")
    ), n_orig


def check_embedding_lsh(spark) -> None:
    df, n_orig = vectors(spark)
    df = df.localCheckpoint()
    thr = 0.99

    # full-corpus LSH wall-time + volume (the 100 TB path)
    t0 = time.perf_counter()
    full = dd.embedding_lsh_dedup_pairs(
        df, thr, planes=18, dim=EMB_DIM, tables=2
    ).localCheckpoint()
    n_full = full.count()
    t_lsh = round(time.perf_counter() - t0, 2)

    # recall vs the exact brute kernel on a both-endpoints-in-slice sample
    sl = df.where(
        (F.col("vec_id") < EMB_SLICE)
        | ((F.col("vec_id") >= n_orig) & (F.col("vec_id") < n_orig + EMB_SLICE))
    ).localCheckpoint()
    t0 = time.perf_counter()
    brute = dd.embedding_cosine_pairs(sl, thr).localCheckpoint()
    n_brute = brute.count()
    t_brute = round(time.perf_counter() - t0, 2)
    lsh_slice = dd.embedding_lsh_dedup_pairs(
        sl, thr, planes=18, dim=EMB_DIM, tables=2
    )
    n_hit = lsh_slice.join(brute, ["id_a", "id_b"], "semi").count()
    recall = n_hit / n_brute if n_brute else 1.0

    # hyperplane expectation: p = 1 - acos(cos)/pi per plane; the planted
    # twins sit at cos ~= 0.9999 -> p^18 per table, OR over 2 tables
    import math

    p = 1 - math.acos(0.9999) / math.pi
    exp_recall = 1 - (1 - p**18) ** 2

    planted_in_slice = min(EMB_SLICE, N_VECS - n_orig)
    ok = n_brute >= planted_in_slice * 0.9 and recall >= exp_recall - 0.05
    record(
        "embedding_lsh_recall",
        ok,
        vectors=N_VECS,
        full_lsh_pairs=n_full,
        full_lsh_sec=t_lsh,
        slice_rows=2 * EMB_SLICE,
        brute_pairs=n_brute,
        brute_sec=t_brute,
        lsh_hit=n_hit,
        recall=round(recall, 4),
        expected_recall=round(exp_recall, 4),
    )


def check_connected_components(spark) -> None:
    # chain clusters of 8 vertices (diameter 7 -> several label rounds):
    # edges (c*8+p, c*8+p+1) for p in 0..6
    edges = spark.range(N_EDGES).select(
        ((F.col("id") / 7).cast("long") * 8 + F.pmod(F.col("id"), 7)).alias(
            "id_a"
        ),
        (
            (F.col("id") / 7).cast("long") * 8 + F.pmod(F.col("id"), 7) + 1
        ).alias("id_b"),
    ).localCheckpoint()

    t0 = time.perf_counter()
    dist = dd.connected_components(edges, driver_threshold=0).localCheckpoint()
    n_dist = dist.count()
    t_dist = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    uf = dd.connected_components(
        edges, driver_threshold=1 << 62
    ).localCheckpoint()
    n_uf = uf.count()
    t_uf = round(time.perf_counter() - t0, 2)

    mismatch = (
        dist.join(uf.withColumnRenamed("cluster_id", "uf_cluster"), "doc_id", "full")
        .where(
            F.col("cluster_id").isNull()
            | F.col("uf_cluster").isNull()
            | (F.col("cluster_id") != F.col("uf_cluster"))
        )
        .count()
    )
    # every chain cluster's label must be its minimum vertex (c*8)
    bad_label = dist.where(
        F.col("cluster_id") != (F.col("doc_id") / 8).cast("long") * 8
    ).count()
    ok = mismatch == 0 and bad_label == 0 and n_dist == n_uf > 0
    record(
        "connected_components_dist_vs_uf",
        ok,
        edges=N_EDGES,
        vertices=n_dist,
        mismatches=mismatch,
        bad_labels=bad_label,
        distributed_sec=t_dist,
        unionfind_sec=t_uf,
    )


def check_incremental_digest(spark) -> None:
    # seen = docs 0..N-1 as a digest-only index; incoming = docs
    # N/2..3N/2 -> exactly N/2 survivors (the ids >= N)
    n = N_DOCS
    text = lambda c: F.concat(F.lit("doc "), c.cast("string"))  # noqa: E731
    seen_idx = spark.range(n).select(
        F.md5(text(F.col("id"))).alias("digest")
    )
    incoming = spark.range(n // 2, n + n // 2).select(
        F.col("id").alias("doc_id"), text(F.col("id")).alias("text")
    )
    t0 = time.perf_counter()
    kept = dd.dedup_against(incoming, seen_idx, digest_col="digest")
    n_kept = kept.count()
    bad = kept.where(F.col("doc_id") < n).count()
    t_sec = round(time.perf_counter() - t0, 2)
    ok = n_kept == n // 2 and bad == 0
    record(
        "incremental_digest_index",
        ok,
        seen=n,
        incoming=n,
        kept=n_kept,
        expected_kept=n // 2,
        leaked=bad,
        sec=t_sec,
    )


def check_ivf_recall(spark) -> None:
    """Recall@k of ivf_topk vs the exact cosine_topk on the same 64
    queries, at nprobe = 1, 4 and n_centroids (the last must be EXACT:
    probing every cell makes IVF a partition-wise restatement of the
    brute scan)."""
    from solarboat_data_pipeline_spark.operators import similarity as sim

    df, _ = vectors(spark)
    df = df.localCheckpoint()
    k, n_cent = 10, 16
    qids = smoke_qids()

    t0 = time.perf_counter()
    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in sim.cosine_topk(df, qids, k=k).collect()
    }
    brute_sec = round(time.perf_counter() - t0, 2)

    recalls, secs = {}, {}
    for nprobe in (1, 4, n_cent):
        t0 = time.perf_counter()
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in sim.ivf_topk(
                df, qids, k=k, n_centroids=n_cent, nprobe=nprobe
            ).collect()
        }
        secs[nprobe] = round(time.perf_counter() - t0, 2)
        recalls[nprobe] = round(len(got & brute) / len(brute), 4)
    full_exact = recalls[n_cent] == 1.0
    monotone = recalls[1] <= recalls[4] <= recalls[n_cent]
    record(
        "ivf_recall_dial_vs_brute",
        full_exact and monotone,
        queries=len(qids),
        k=k,
        n_centroids=n_cent,
        recall_at_nprobe={str(p): r for p, r in recalls.items()},
        ivf_sec={str(p): s for p, s in secs.items()},
        brute_sec=brute_sec,
        full_probe_exact=full_exact,
    )


def check_sq8_recall(spark) -> None:
    """Round 8: SQ8 asymmetric candidates + exact re-rank vs the brute
    cosine_topk at the same corpus. Recall must be non-decreasing in
    ``oversample`` and >= 0.95 at oversample=4; the persisted code
    table must actually be smaller than the float32 vectors ON DISK
    (the 4x raw claim, measured post-parquet-encoding so the number is
    honest about what a scan reads)."""
    import glob
    import os

    from solarboat_data_pipeline_spark.operators import similarity as sim

    df, _ = vectors(spark)
    df = df.localCheckpoint()
    k = 10
    qids = smoke_qids()

    t0 = time.perf_counter()
    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in sim.cosine_topk(df, qids, k=k).collect()
    }
    brute_sec = round(time.perf_counter() - t0, 2)

    recalls, secs = {}, {}
    for ov in (1, 4):
        t0 = time.perf_counter()
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in sim.sq8_topk(df, qids, k=k, oversample=ov).collect()
        }
        secs[ov] = round(time.perf_counter() - t0, 2)
        recalls[ov] = round(len(got & brute) / len(brute), 4)

    # storage: codes vs float32 vectors, both as parquet on disk. The
    # recall fixture above draws components from a 2001-value lattice,
    # which parquet DICTIONARY-encodes on both sides (float32 indices ~11
    # bits, codes ~8) and so UNDERSELLS the claim; real embeddings are
    # continuous floats that fall back to PLAIN 4-byte encoding. Measure
    # on a continuous-component corpus of the same shape.
    base = "/tmp/scale_smoke_sq8"
    cont = spark.range(N_VECS).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(EMB_DIM - 1)),
            lambda kk: (
                F.pmod(F.hash(F.col("id"), kk, F.lit(5)), F.lit(1 << 24))
                / F.lit(float(1 << 23)) - 1.0
            ),
        ).cast("array<double>").alias("embedding"),
    ).localCheckpoint()
    vec32 = cont.select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    )
    vec32.write.mode("overwrite").parquet(f"{base}/vectors")
    sim.sq8_quantize(cont).write.mode("overwrite").parquet(f"{base}/codes")
    size = lambda d: sum(  # noqa: E731
        os.path.getsize(p) for p in glob.glob(f"{d}/*.parquet")
    )
    vec_b, code_b = size(f"{base}/vectors"), size(f"{base}/codes")
    ratio = round(vec_b / code_b, 2)

    record(
        "sq8_recall_and_storage_vs_brute",
        recalls[1] <= recalls[4] and recalls[4] >= 0.95 and ratio >= 2.5,
        queries=len(qids),
        k=k,
        recall_at_oversample={str(o): r for o, r in recalls.items()},
        sq8_sec={str(o): s for o, s in secs.items()},
        brute_sec=brute_sec,
        vector_parquet_bytes=vec_b,
        code_parquet_bytes=code_b,
        storage_ratio=ratio,
    )


def main() -> None:
    spark = get_spark(app_name="scale-smoke-dedup")
    check_minhash_lsh(spark)
    check_embedding_lsh(spark)
    check_connected_components(spark)
    check_incremental_digest(spark)
    check_ivf_recall(spark)
    check_sq8_recall(spark)
    all_ok = all(c["agree"] for c in results.values())
    print(
        json.dumps(
            {
                "metric": "scale_smoke_dedup",
                "checks": len(results),
                "all_agree": all_ok,
            }
        )
    )
    if not all_ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
