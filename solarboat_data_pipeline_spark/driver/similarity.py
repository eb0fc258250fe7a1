"""Similarity-search driver queries (brute cosine, LSH, IVF, SQ8, persisted-index forms).

Split out of driver_queries.py (round 9); conventions in the facade
docstring there.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from solarboat_data_pipeline_spark.operators import similarity as sim

from solarboat_data_pipeline_spark.driver._registry import (  # noqa: F401
    _io_dir,
    _sql_lsh_bucket,
    _t,
    register,
)



_SQL_DOT = (
    "list_sum(list_transform(a.embedding, (x, i) -> "
    "x::DOUBLE * b.embedding[i]::DOUBLE))"
)
_SQL_NORM_A = (
    "sqrt(list_sum(list_transform(a.embedding, x -> x::DOUBLE * x::DOUBLE)))"
)
_SQL_NORM_B = (
    "sqrt(list_sum(list_transform(b.embedding, x -> x::DOUBLE * x::DOUBLE)))"
)


@register(
    "sim_cosine_topk",
    f"""
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10),
         sims AS (
           SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                  round({_SQL_DOT} / ({_SQL_NORM_A} * {_SQL_NORM_B}), 6) AS cosine_sim
           FROM q a JOIN embeddings b ON b.vec_id <> a.vec_id),
         ranked AS (
           SELECT *, row_number() OVER
             (PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id ASC) AS rank
           FROM sims)
    SELECT query_id, neighbor_id, cosine_sim, rank::BIGINT AS rank
    FROM ranked WHERE rank <= 5
    """,
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = sim.cosine_topk(_t(spark, sf_dir, "embeddings"), query_ids=range(10), k=5)
    return out.select(
        "query_id", "neighbor_id", "cosine_sim", F.col("rank").cast("long").alias("rank")
    )


_SQL_IVF_TOPK = f"""
    WITH cent AS (SELECT vec_id AS cid, embedding AS c_emb FROM embeddings
                  WHERE vec_id < 16),
         scored AS (
           SELECT e.vec_id, e.embedding, c.cid,
                  list_sum(list_transform(e.embedding, (x, i) ->
                    x::DOUBLE * c.c_emb[i]::DOUBLE)) /
                  (sqrt(list_sum(list_transform(e.embedding, x -> x::DOUBLE * x::DOUBLE))) *
                   sqrt(list_sum(list_transform(c.c_emb, x -> x::DOUBLE * x::DOUBLE)))) AS ccos
           FROM embeddings e CROSS JOIN cent c),
         assigned AS (
           SELECT vec_id, embedding, cid FROM (
             SELECT *, row_number() OVER
               (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn
             FROM scored) WHERE rn = 1),
         q AS (SELECT vec_id, embedding, cid FROM (
             SELECT vec_id, embedding, cid, row_number() OVER
               (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn
             FROM scored WHERE vec_id < 10) WHERE rn <= 2),
         sims AS (
           SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                  round({_SQL_DOT} / ({_SQL_NORM_A} * {_SQL_NORM_B}), 6) AS cosine_sim
           FROM q a JOIN assigned b
             ON b.cid = a.cid AND b.vec_id <> a.vec_id),
         ranked AS (
           SELECT *, row_number() OVER
             (PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id ASC) AS rank
           FROM sims)
    SELECT query_id, neighbor_id, cosine_sim, rank::BIGINT AS rank
    FROM ranked WHERE rank <= 5
    """


@register("sim_ivf_topk", _SQL_IVF_TOPK)
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = sim.ivf_topk(
        _t(spark, sf_dir, "embeddings"),
        query_ids=range(10),
        k=5,
        n_centroids=16,
        nprobe=2,
    )
    return out.select(
        "query_id", "neighbor_id", "cosine_sim", F.col("rank").cast("long").alias("rank")
    )


def _sql_ivf_trained(dim: int = 64, iters: int = 2, n_cent: int = 16,
                     nprobe: int = 2, k: int = 5,
                     source_cte: str | None = None) -> str:
    """Oracle for the TRAINED IVF path: replays the k-means refinement
    (operators/similarity.py:train_ivf_centroids) verbatim — seed =
    n-smallest-id vectors with rank-dense cids, then per iteration a
    nearest-centroid assignment and a FIXED-POINT component mean
    (floor(x·2²⁰) longs summed exactly, divided back as doubles), which
    is bit-identical across engines because integer addition is
    associative and floor has no tie/rounding-mode divergence.

    ``source_cte`` swaps the vector source: any SQL defining a CTE
    named ``e`` with columns ``(vec_id, emb)`` (``emb`` a DOUBLE list
    of length ``dim``). Default is the embeddings fixture; the media
    retrieval composition passes its decoded-pixel feature formula."""
    cos = (
        "list_sum(list_transform(e.emb, (x, i) -> x * c.c_vec[i])) /"
        " (sqrt(list_sum(list_transform(e.emb, x -> x * x))) *"
        "  sqrt(list_sum(list_transform(c.c_vec, x -> x * x))))"
    )
    if source_cte is None:
        source_cte = (
            "WITH e AS (SELECT vec_id, list_transform(embedding,"
            " x -> x::DOUBLE) AS emb FROM embeddings),"
        )
    parts = [
        source_cte,
        f"cent0 AS (SELECT (row_number() OVER (ORDER BY vec_id) - 1)::BIGINT"
        f" AS cid, emb AS c_vec FROM"
        f" (SELECT * FROM e ORDER BY vec_id LIMIT {n_cent})),",
    ]
    for it in range(iters):
        parts.append(
            f"sc{it} AS (SELECT e.vec_id, e.emb, c.cid, {cos} AS ccos"
            f" FROM e CROSS JOIN cent{it} c),"
        )
        parts.append(
            f"a{it} AS (SELECT vec_id, emb, cid FROM ("
            f" SELECT *, row_number() OVER (PARTITION BY vec_id"
            f" ORDER BY ccos DESC, cid ASC) AS rn FROM sc{it}) WHERE rn = 1),"
        )
        parts.append(
            f"m{it} AS (SELECT cid, i,"
            f" CAST(sum(CAST(floor(emb[i] * 1048576.0) AS BIGINT)) AS DOUBLE)"
            f" / (CAST(count(*) AS DOUBLE) * 1048576.0) AS mu"
            f" FROM a{it}, unnest(range(1, {dim + 1})) t(i) GROUP BY cid, i),"
        )
        parts.append(
            f"g{it} AS (SELECT cid, list(mu ORDER BY i) AS c_vec"
            f" FROM m{it} GROUP BY cid),"
        )
        parts.append(
            f"cent{it + 1} AS (SELECT s.cid,"
            f" coalesce(g{it}.c_vec, s.c_vec) AS c_vec"
            f" FROM cent{it} s LEFT JOIN g{it} USING (cid)),"
        )
    fin = iters
    parts.append(
        f"scf AS (SELECT e.vec_id, e.emb, c.cid, {cos} AS ccos"
        f" FROM e CROSS JOIN cent{fin} c),"
    )
    parts.append(
        "assigned AS (SELECT vec_id, emb, cid FROM ("
        " SELECT *, row_number() OVER (PARTITION BY vec_id"
        " ORDER BY ccos DESC, cid ASC) AS rn FROM scf) WHERE rn = 1),"
    )
    parts.append(
        f"q AS (SELECT vec_id, emb, cid FROM ("
        f" SELECT vec_id, emb, cid, row_number() OVER (PARTITION BY vec_id"
        f" ORDER BY ccos DESC, cid ASC) AS rn FROM scf WHERE vec_id < 10)"
        f" WHERE rn <= {nprobe}),"
    )
    dot_q = "list_sum(list_transform(a.emb, (x, i) -> x * b.emb[i]))"
    norm_a = "sqrt(list_sum(list_transform(a.emb, x -> x * x)))"
    norm_b = "sqrt(list_sum(list_transform(b.emb, x -> x * x)))"
    parts.append(
        f"sims AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,"
        f" round({dot_q} / ({norm_a} * {norm_b}), 6) AS cosine_sim"
        f" FROM q a JOIN assigned b"
        f" ON b.cid = a.cid AND b.vec_id <> a.vec_id),"
    )
    parts.append(
        "ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id"
        " ORDER BY cosine_sim DESC, neighbor_id ASC) AS rank FROM sims)"
    )
    parts.append(
        f"SELECT query_id, neighbor_id, cosine_sim, rank::BIGINT AS rank"
        f" FROM ranked WHERE rank <= {k}"
    )
    return "\n".join(parts)


@register("sim_ivf_trained_topk", _sql_ivf_trained())
def sim_ivf_trained_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with TRAINED centroids (round 8, VERDICT r7 item 2):
    two Lloyd iterations expressed as DataFrame aggregations
    (operators/similarity.py:train_ivf_centroids) refine the
    n-smallest-id seeds before assignment; the fixed-point component
    mean makes training bit-deterministic across partitionings AND
    engines, so the DuckDB oracle replays the full
    seed→assign→mean→assign→mean→probe pipeline exactly. Recall-vs-
    brute-force on a clustered corpus is gated in
    tests/test_ivf_training.py (trained ≥ 0.9 at nprobe=4 where the
    skewed seeds fall short)."""
    out = sim.ivf_topk(
        _t(spark, sf_dir, "embeddings"),
        query_ids=range(10),
        k=5,
        n_centroids=16,
        nprobe=2,
        train_iters=2,
    )
    return out.select(
        "query_id", "neighbor_id", "cosine_sim", F.col("rank").cast("long").alias("rank")
    )


@register("sim_ivf_index_topk", _SQL_IVF_TOPK)
def sim_ivf_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN against a PERSISTED IVF index
    (operators/similarity.py:build_ivf_index / ivf_topk_indexed —
    round 7): the corpus assignments are written partitioned by cell id
    and the probe join's broadcast drives DYNAMIC PARTITION PRUNING on
    the cell scan, so a search reads ~nprobe/n_centroids of the stored
    corpus bytes instead of re-assigning it per query — the
    build-once/query-many shape of a real vector index. Results are
    identical to sim_ivf_topk (same oracle SQL verbatim)."""
    emb = _t(spark, sf_dir, "embeddings")
    idx = _io_dir(sf_dir, "sim_ivf_index")
    sim.build_ivf_index(emb, idx, n_centroids=16)
    qv = emb.where(F.col("vec_id") < 10)
    out = sim.ivf_topk_indexed(spark, idx, qv, k=5, nprobe=2)
    return out.select(
        "query_id", "neighbor_id", "cosine_sim", F.col("rank").cast("long").alias("rank")
    )


_SQL_SQ8_TOPK = """
    WITH b0 AS (
      SELECT i, min(x::DOUBLE) AS mn, max(x::DOUBLE) AS mx
      FROM (SELECT unnest(embedding) AS x,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings)
      GROUP BY i),
    bl AS (SELECT list(mn ORDER BY i) AS mn, list(mx ORDER BY i) AS mx
           FROM b0),
    -- encode to the 0..255 grid, dequantize to the cell midpoint; the
    -- engine stores code-128 as tinyint, arithmetically identical here
    approx AS (
      SELECT e.vec_id AS neighbor_id,
             list_transform(e.embedding, (x, i) ->
               CASE WHEN b.mx[i] > b.mn[i] THEN
                 b.mn[i] + (least(greatest(floor((x::DOUBLE - b.mn[i])
                     / (b.mx[i] - b.mn[i]) * 255.0), 0), 255) + 0.5)
                   * ((b.mx[i] - b.mn[i]) / 255.0)
               ELSE b.mn[i] END) AS a_vec
      FROM embeddings e CROSS JOIN bl b),
    q AS (SELECT vec_id AS query_id, embedding AS q_vec
          FROM embeddings WHERE vec_id < 10),
    cand AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.query_id, a.neighbor_id,
               list_sum(list_transform(q.q_vec, (x, i) ->
                 x::DOUBLE * a.a_vec[i])) /
               (sqrt(list_sum(list_transform(q.q_vec, x ->
                  x::DOUBLE * x::DOUBLE))) *
                sqrt(list_sum(list_transform(a.a_vec, x -> x * x)))) AS asim,
               row_number() OVER (PARTITION BY q.query_id
                 ORDER BY asim DESC, a.neighbor_id ASC) AS rn
        FROM approx a CROSS JOIN q
        WHERE a.neighbor_id <> q.query_id)
      WHERE rn <= 20),
    sims AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             round(list_sum(list_transform(a.embedding, (x, i) ->
                     x::DOUBLE * b.embedding[i]::DOUBLE)) /
                   (sqrt(list_sum(list_transform(a.embedding, x ->
                      x::DOUBLE * x::DOUBLE))) *
                    sqrt(list_sum(list_transform(b.embedding, x ->
                      x::DOUBLE * x::DOUBLE)))), 6) AS cosine_sim
      FROM embeddings a
      JOIN cand ON cand.query_id = a.vec_id
      JOIN embeddings b ON b.vec_id = cand.neighbor_id),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
        ORDER BY cosine_sim DESC, neighbor_id ASC) AS rank FROM sims)
    SELECT query_id, neighbor_id, cosine_sim, rank::BIGINT AS rank
    FROM ranked WHERE rank <= 5
    """


@register("sim_sq8_topk", _SQL_SQ8_TOPK)
def sim_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via SCALAR QUANTIZATION with exact re-rank (round 8 —
    operators/similarity.py:sq8_topk): the corpus encodes to 1-byte-per-
    component codes (4× less storage/scan than float32), candidates are
    ranked ASYMMETRICALLY — full-precision query against dequantized
    codes — and only the k·oversample survivors fetch true vectors for
    the exact cosine re-rank. The SQ/ADC layer every production vector
    store puts under IVF; composable with the IVF family here (codes
    partition by cell like vectors do). Quantize/dequantize use
    floor/IEEE arithmetic the DuckDB oracle replays verbatim
    (cross-engine-exact, same grid argument as train_ivf_centroids);
    recall-vs-exact and the tinyint storage claim are gated in
    tests/test_dedup_similarity_text.py."""
    out = sim.sq8_topk(
        _t(spark, sf_dir, "embeddings"),
        query_ids=range(10),
        k=5,
        oversample=4,
    )
    return out.select(
        "query_id", "neighbor_id", "cosine_sim", F.col("rank").cast("long").alias("rank")
    )


_SQL_IVF_SQ8_TOPK = """
    WITH cent AS (SELECT vec_id AS cid, embedding AS c_emb FROM embeddings
                  WHERE vec_id < 16),
         scored AS (
           SELECT e.vec_id, e.embedding, c.cid,
                  list_sum(list_transform(e.embedding, (x, i) ->
                    x::DOUBLE * c.c_emb[i]::DOUBLE)) /
                  (sqrt(list_sum(list_transform(e.embedding, x -> x::DOUBLE * x::DOUBLE))) *
                   sqrt(list_sum(list_transform(c.c_emb, x -> x::DOUBLE * x::DOUBLE)))) AS ccos
           FROM embeddings e CROSS JOIN cent c),
         assigned AS (
           SELECT vec_id, embedding, cid FROM (
             SELECT *, row_number() OVER
               (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn
             FROM scored) WHERE rn = 1),
         q AS (SELECT vec_id, embedding, cid FROM (
             SELECT vec_id, embedding, cid, row_number() OVER
               (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn
             FROM scored WHERE vec_id < 10) WHERE rn <= 2),
         b0 AS (
           SELECT i, min(x::DOUBLE) AS mn, max(x::DOUBLE) AS mx
           FROM (SELECT unnest(embedding) AS x,
                        generate_subscripts(embedding, 1) AS i
                 FROM embeddings)
           GROUP BY i),
         bl AS (SELECT list(mn ORDER BY i) AS mn, list(mx ORDER BY i) AS mx
                FROM b0),
         approx AS (
           SELECT a.vec_id AS neighbor_id, a.cid,
                  list_transform(a.embedding, (x, i) ->
                    CASE WHEN b.mx[i] > b.mn[i] THEN
                      b.mn[i] + (least(greatest(floor((x::DOUBLE - b.mn[i])
                          / (b.mx[i] - b.mn[i]) * 255.0), 0), 255) + 0.5)
                        * ((b.mx[i] - b.mn[i]) / 255.0)
                    ELSE b.mn[i] END) AS a_vec
           FROM assigned a CROSS JOIN bl b),
         cand AS (
           SELECT query_id, neighbor_id FROM (
             SELECT q.vec_id AS query_id, a.neighbor_id,
                    list_sum(list_transform(q.embedding, (x, i) ->
                      x::DOUBLE * a.a_vec[i])) /
                    (sqrt(list_sum(list_transform(q.embedding, x ->
                       x::DOUBLE * x::DOUBLE))) *
                     sqrt(list_sum(list_transform(a.a_vec, x -> x * x)))) AS asim,
                    row_number() OVER (PARTITION BY q.vec_id
                      ORDER BY asim DESC, a.neighbor_id ASC) AS rn
             FROM q JOIN approx a
               ON a.cid = q.cid AND a.neighbor_id <> q.vec_id)
           WHERE rn <= 20),
         sims AS (
           SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                  round(list_sum(list_transform(a.embedding, (x, i) ->
                          x::DOUBLE * b.embedding[i]::DOUBLE)) /
                        (sqrt(list_sum(list_transform(a.embedding, x ->
                           x::DOUBLE * x::DOUBLE))) *
                         sqrt(list_sum(list_transform(b.embedding, x ->
                           x::DOUBLE * x::DOUBLE)))), 6) AS cosine_sim
           FROM embeddings a
           JOIN cand ON cand.query_id = a.vec_id
           JOIN embeddings b ON b.vec_id = cand.neighbor_id),
         ranked AS (
           SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY cosine_sim DESC, neighbor_id ASC) AS rank FROM sims)
    SELECT query_id, neighbor_id, cosine_sim, rank::BIGINT AS rank
    FROM ranked WHERE rank <= 5
    """


@register("sim_ivf_sq8_index_topk", _SQL_IVF_SQ8_TOPK)
def sim_ivf_sq8_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPOSED production ANN layout (round 8 —
    operators/similarity.py:build_ivf_sq8_index / ivf_sq8_topk_indexed):
    IVF partition pruning OVER SQ8 codes. The persisted index stores
    1-byte codes partitioned by cell, full-precision vectors id-sorted
    in their own table, and the two tiny codebooks; a search reads the
    stored centroids, dynamic-partition-prunes the CODES scan to the
    probed cells, pools each query's cells into an asymmetric
    (query x dequantized-code) candidate ranking, and fetches true
    vectors ONLY for the k*oversample survivors' exact re-rank. At
    100 TB of float32 embeddings a nprobe=2/16 search touches ~1/8 of
    a 4x-smaller table plus candidate rows. Oracle: the full
    seed-assign-probe-quantize-candidate-rerank chain in SQL; cell
    schema (tinyint) and DPP are asserted in
    tests/test_dedup_similarity_text.py."""
    emb = _t(spark, sf_dir, "embeddings")
    idx = _io_dir(sf_dir, "sim_ivf_sq8_index")
    sim.build_ivf_sq8_index(emb, idx, n_centroids=16)
    qv = emb.where(F.col("vec_id") < 10)
    out = sim.ivf_sq8_topk_indexed(spark, idx, qv, k=5, nprobe=2, oversample=4)
    return out.select(
        "query_id", "neighbor_id", "cosine_sim", F.col("rank").cast("long").alias("rank")
    )


def _sim_ann_oracle() -> str:
    planes = sim.hyperplanes(64, sim.NUM_PLANES)
    return f"""
    WITH e AS (SELECT vec_id, embedding FROM embeddings),
         withb AS (SELECT vec_id, embedding,
                          {_sql_lsh_bucket('e', planes).replace('e.embedding', 'embedding')} AS bucket
                   FROM e),
         q AS (SELECT * FROM withb WHERE vec_id < 10),
         sims AS (
           SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                  round({_SQL_DOT} / ({_SQL_NORM_A} * {_SQL_NORM_B}), 6) AS cosine_sim
           FROM q a JOIN withb b
             ON b.bucket = a.bucket AND b.vec_id <> a.vec_id),
         ranked AS (
           SELECT *, row_number() OVER
             (PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id ASC) AS rank
           FROM sims)
    SELECT query_id, neighbor_id, cosine_sim, rank::BIGINT AS rank
    FROM ranked WHERE rank <= 5
    """


@register("sim_ann_lsh", _sim_ann_oracle())
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = sim.lsh_ann_topk(
        _t(spark, sf_dir, "embeddings"), query_ids=range(10), k=5, dim=64
    )
    return out.select(
        "query_id", "neighbor_id", "cosine_sim", F.col("rank").cast("long").alias("rank")
    )


_SQL_IVF_DRIFT = """
    WITH cent AS (SELECT embedding AS c_emb FROM embeddings
                  WHERE vec_id % 2 = 0 ORDER BY vec_id LIMIT 8),
         best_b AS (
           SELECT e.vec_id,
                  max(list_sum(list_transform(e.embedding, (x, i) ->
                        x::DOUBLE * c.c_emb[i]::DOUBLE)) /
                      (sqrt(list_sum(list_transform(e.embedding,
                         x -> x::DOUBLE * x::DOUBLE))) *
                       sqrt(list_sum(list_transform(c.c_emb,
                         x -> x::DOUBLE * x::DOUBLE))))) AS best
           FROM embeddings e CROSS JOIN cent c
           WHERE e.vec_id % 2 = 0 GROUP BY e.vec_id),
         best_i AS (
           SELECT e.vec_id,
                  max(list_sum(list_transform(e.embedding, (x, i) ->
                        x::DOUBLE * c.c_emb[i]::DOUBLE)) /
                      (sqrt(list_sum(list_transform(e.embedding,
                         x -> x::DOUBLE * x::DOUBLE))) *
                       sqrt(list_sum(list_transform(c.c_emb,
                         x -> x::DOUBLE * x::DOUBLE))))) AS best
           FROM embeddings e CROSS JOIN cent c
           WHERE e.vec_id % 2 = 1 GROUP BY e.vec_id)
    SELECT (SELECT count(*) FROM embeddings WHERE vec_id % 2 = 1)::BIGINT AS n,
           round((SELECT avg(best) FROM best_b), 6) AS build_mean_cos,
           round((SELECT avg(best) FROM best_i), 6) AS increment_mean_cos,
           round((SELECT avg(best) FROM best_b)
                 - (SELECT avg(best) FROM best_i), 6) AS drift,
           ((SELECT avg(best) FROM best_b)
            - (SELECT avg(best) FROM best_i)) > 0.05 AS retrain_recommended
    """


@register("sim_ivf_drift", _SQL_IVF_DRIFT)
def sim_ivf_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-maintenance DRIFT telemetry (round 9, VERDICT r8 item 4 —
    operators/similarity.py:extend_ivf_index): build the persisted IVF
    index on the even-id half of the corpus, extend it with the odd-id
    half, and return the extend call's drift report — increment size,
    build-time vs increment mean assigned-cosine, their difference, and
    the advisory retrain trigger. The mean assigned-cosine is the max
    over centroids of the exact fold cosine, so the DuckDB oracle
    replays it verbatim (argmax ties share the max value; 6-dp rounding
    clears both engines' summation-order ulps). The trigger threshold
    comparison runs on the unrounded statistic in both engines."""
    emb = _t(spark, sf_dir, "embeddings")
    idx = _io_dir(sf_dir, "sim_ivf_drift_idx")
    import shutil

    shutil.rmtree(idx, ignore_errors=True)
    sim.build_ivf_index(
        emb.where(F.col("vec_id") % 2 == 0), idx, n_centroids=8
    )
    rep = sim.extend_ivf_index(
        emb.where(F.col("vec_id") % 2 == 1), idx, "odds"
    )
    return sim._local_frame(
        spark,
        [(
            rep["n"],
            round(rep["build_mean_cos"], 6),
            round(rep["increment_mean_cos"], 6),
            round(rep["drift"], 6),
            rep["retrain_recommended"],
        )],
        "n bigint, build_mean_cos double, increment_mean_cos double,"
        " drift double, retrain_recommended boolean",
    )


# ---------------------------------------------------------------------------
# recall evaluation of the pruned ANN paths vs the exact baseline
# (VERDICT r12 #7)
# ---------------------------------------------------------------------------

def _sql_recall_eval() -> str:
    """Recall@5 of the IVF (nprobe=2) and SQ8 (oversample=4) paths
    against the exact cosine top-5, per query — the three existing
    oracles composed as CTEs, then hit-counted. CTE bodies carry their
    own WITH clauses (standard nested query expressions)."""
    from solarboat_data_pipeline_spark.driver._registry import _REGISTRY

    exact_sql = _REGISTRY["sim_cosine_topk"][1]
    return f"""
    WITH exact AS ({exact_sql}),
         ivf AS ({_SQL_IVF_TOPK}),
         sq8 AS ({_SQL_SQ8_TOPK}),
         lsh AS ({_sim_ann_oracle()}),
         ih AS (
           SELECT e.query_id,
                  sum(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS ivf_hits
           FROM exact e LEFT JOIN ivf i
             ON i.query_id = e.query_id AND i.neighbor_id = e.neighbor_id
           GROUP BY e.query_id),
         sh AS (
           SELECT e.query_id,
                  sum(CASE WHEN s.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS sq8_hits
           FROM exact e LEFT JOIN sq8 s
             ON s.query_id = e.query_id AND s.neighbor_id = e.neighbor_id
           GROUP BY e.query_id),
         lh AS (
           SELECT e.query_id,
                  sum(CASE WHEN l.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS lsh_hits
           FROM exact e LEFT JOIN lsh l
             ON l.query_id = e.query_id AND l.neighbor_id = e.neighbor_id
           GROUP BY e.query_id)
    SELECT ih.query_id, ih.ivf_hits, sh.sq8_hits, lh.lsh_hits,
           round(ih.ivf_hits / 5.0, 6) AS ivf_recall,
           round(sh.sq8_hits / 5.0, 6) AS sq8_recall,
           round(lh.lsh_hits / 5.0, 6) AS lsh_recall
    FROM ih JOIN sh ON sh.query_id = ih.query_id
    JOIN lh ON lh.query_id = ih.query_id
    """


@register("sim_recall_eval", _sql_recall_eval())
def sim_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality of the pruned ANN paths, not just their determinism:
    recall@5 per query of ``sim_ivf_topk``'s configuration (16 fixed
    centroids, nprobe=2), ``sim_sq8_topk``'s (1-byte scalar
    quantization, 4x oversample + exact re-rank) and ``sim_ann_lsh``'s
    (single-table hyperplane buckets — the cheapest, lossiest path)
    against the exact ``sim_cosine_topk`` baseline on the same fixture.
    The oracle replays all four rankings arithmetically and the same
    hit-count joins. tests/test_dedup_similarity_text.py asserts the
    recall floors."""
    emb = _t(spark, sf_dir, "embeddings")
    exact = sim.cosine_topk(emb, query_ids=range(10), k=5).select(
        "query_id", "neighbor_id"
    )
    ivf = sim.ivf_topk(
        emb, query_ids=range(10), k=5, n_centroids=16, nprobe=2
    ).select("query_id", "neighbor_id")
    sq8 = sim.sq8_topk(emb, query_ids=range(10), k=5, oversample=4).select(
        "query_id", "neighbor_id"
    )
    lsh = sim.lsh_ann_topk(emb, query_ids=range(10), k=5).select(
        "query_id", "neighbor_id"
    )

    def hits(approx: DataFrame, name: str) -> DataFrame:
        a = approx.withColumn("__hit", F.lit(1))
        return (
            exact.join(a, ["query_id", "neighbor_id"], "left")
            .groupBy("query_id")
            .agg(F.sum(F.coalesce("__hit", F.lit(0))).cast("long").alias(name))
        )

    ih = hits(ivf, "ivf_hits")
    sh = hits(sq8, "sq8_hits")
    lh = hits(lsh, "lsh_hits")
    return ih.join(sh, "query_id").join(lh, "query_id").select(
        "query_id",
        "ivf_hits",
        "sq8_hits",
        "lsh_hits",
        F.round(F.col("ivf_hits") / 5.0, 6).alias("ivf_recall"),
        F.round(F.col("sq8_hits") / 5.0, 6).alias("sq8_recall"),
        F.round(F.col("lsh_hits") / 5.0, 6).alias("lsh_recall"),
    )
