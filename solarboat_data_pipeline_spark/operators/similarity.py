"""Similarity search over embedding columns.

* :func:`cosine_topk` — exact brute-force top-k: broadcast the (small)
  query set against the full corpus; per-row dot products stay in codegen
  via ``zip_with``+``aggregate``. At 100 TB the corpus side stays
  partitioned and only queries broadcast — no shuffle of the big side.
* :func:`lsh_ann_topk` — the scale path: random-hyperplane LSH bucketing
  (deterministic md5-derived ±1 hyperplanes, so the oracle can reproduce
  them); candidates only join within a bucket, turning O(N·Q) into
  O(N·Q/2^planes) expected.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

NUM_PLANES = 8

# cap on candidate ids folded into the vectors scan as an isin pushdown
# (ivf_sq8_topk_indexed) - beyond this a Catalyst literal list costs more
# than the row groups it prunes, and the fetch switches to coalesced
# BETWEEN ranges (see _id_range_predicate)
_ISIN_PUSHDOWN_MAX = 10_000

# max coalesced [lo, hi] id ranges pushed into the vectors scan for
# candidate sets past _ISIN_PUSHDOWN_MAX: 256 ranges = 512 comparison
# literals, constant Catalyst cost at ANY candidate count
_RANGE_PUSHDOWN_MAX = 256

# estimated candidate rows (|Q| * k * oversample) past which
# ivf_sq8_topk_indexed(mode="auto") switches from the interactive
# collected-predicate fetch (~50 MB driver per million candidates) to
# the fully-distributed batch re-rank (joins, zero driver collect)
_BATCH_RERANK_MIN = 1_000_000


def _id_range_predicate(col: Column, ids: list, max_ranges: int) -> Column:
    """Bounded-size scan pushdown for an arbitrarily large sorted id set:
    coalesce ``ids`` into at most ``max_ranges`` ``[lo, hi]`` intervals
    and OR the BETWEENs. Parquet pushes each as ``And(GtEq, LtEq)`` under
    an ``Or``, which row-group min/max statistics prune on an id-sorted
    table — unlike an ``In`` literal list, the predicate size never grows
    with the candidate count, so the pruned read survives production
    query batches (the round-8 cliff: past ``_ISIN_PUSHDOWN_MAX`` the
    fetch silently degraded to a full corpus scan).

    Interval selection: for numeric ids, keep the ``max_ranges - 1``
    WIDEST gaps between consecutive ids as the split points — that
    minimizes the total slack (non-candidate ids covered) among all
    ``max_ranges``-interval covers of the set. Non-numeric orderable ids
    (no gap width) split into equal-count runs. The cover is a superset
    fetch either way; the caller's inner join on the exact candidate
    frame restores precision."""
    if not ids:
        return F.lit(False)
    n = len(ids)
    if n <= max_ranges:
        bounds = list(range(n + 1))
    elif isinstance(ids[0], (int, float)):
        gaps = sorted(
            range(1, n), key=lambda i: ids[i] - ids[i - 1], reverse=True
        )
        bounds = [0] + sorted(gaps[: max_ranges - 1]) + [n]
    else:
        step = -(-n // max_ranges)
        bounds = list(range(0, n, step)) + [n]
    pred = None
    for a, b in zip(bounds, bounds[1:]):
        p = col.between(F.lit(ids[a]), F.lit(ids[b - 1]))
        pred = p if pred is None else (pred | p)
    return pred


def hyperplanes(
    dim: int, planes: int = NUM_PLANES, salt: str = ""
) -> list[list[int]]:
    """Deterministic ±1 hyperplanes: component d of plane p is +1 when the
    low bit of md5("{salt}plane{p}:{d}") is set. Shared verbatim with the
    SQL oracle. ``salt`` yields independent plane sets for multi-table LSH
    (OR-amplification)."""
    out = []
    for p in range(planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{salt}plane{p}:{d}".encode()).hexdigest()
            row.append(1 if int(h[:8], 16) & 1 else -1)
        out.append(row)
    return out


def _infer_dim(df: DataFrame, vec_col: str) -> int:
    """Embedding dimensionality from the first row, with explicit errors
    for an empty corpus or a NULL first embedding (mirrors
    :func:`sq8_bounds` — previously these raised an opaque TypeError)."""
    first = df.select(vec_col).first()
    if first is None:
        raise ValueError(
            f"cannot infer embedding dim: corpus has no rows in {vec_col!r}"
            " — pass dim= explicitly or supply a non-empty corpus"
        )
    if first[0] is None:
        raise ValueError(
            f"cannot infer embedding dim: first {vec_col!r} is NULL — drop"
            " null embeddings or pass dim= explicitly"
        )
    return len(first[0])


def dot(a: Column, b: Column) -> Column:
    """Sequential double-precision dot product (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _rank_topk(sims: DataFrame, k: int) -> DataFrame:
    """The ONE definition of the output ranking contract every ANN
    family shares (and every DuckDB oracle replays): row_number over
    6-dp-rounded cosine DESC with ascending-neighbor-id tie-break,
    keep rank <= k."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def _exact_sims(pairs: DataFrame) -> DataFrame:
    """(query_id, q_vec, neighbor_id, c_vec) -> the exact 6-dp cosine
    rows the ranking contract consumes."""
    return pairs.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cosine_sim"),
    )


def cosine_topk(
    df: DataFrame,
    query_ids,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query id (self excluded).
    Ties break by ascending neighbor id on the 6-dp-rounded similarity.
    Returns (query_id, neighbor_id, cosine_sim, rank)."""
    queries = df.where(F.col(id_col).isin(list(query_ids))).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    corpus = df.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    sims = _exact_sims(
        corpus.crossJoin(F.broadcast(queries)).where(
            F.col("neighbor_id") != F.col("query_id")
        )
    )
    return _rank_topk(sims, k)


def ivf_assign(
    df: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_iters: int = 0,
) -> DataFrame:
    """IVF coarse quantization: assign every vector to its nearest
    centroid by cosine (ties → lowest centroid id).

    ``train_iters=0`` uses the deterministic seed centroids (the
    ``n_centroids`` smallest-id vectors); ``train_iters>0`` refines them
    with that many k-means iterations first
    (:func:`train_ivf_centroids`) — on clustered real embeddings
    unrefined seeds skew cell sizes, which turns into hot probe cells.
    Assignment folds the tiny centroid set into a map-only Arrow pass
    over the corpus (:func:`_assign_to`): zero shuffle of the big side,
    O(N·C) vectorized with bit-exact sequential-fold cosine."""
    cent = _centroids(df, n_centroids, id_col, vec_col, train_iters)
    return _assign_to(df, cent, id_col, vec_col)


def _seed_centroids(
    df: DataFrame, n_centroids: int, id_col: str, vec_col: str
) -> DataFrame:
    """The ONE definition of seed-centroid selection — shared by
    assignment, training init, the stored index build, and the in-memory
    probe path so they can never drift.

    Seeds are the ``n_centroids`` SMALLEST-ID vectors with dense cell
    ids 0..n-1 assigned by id rank (round 8; previously ``id <
    n_centroids``, which silently yielded fewer centroids on corpora
    whose ids are not dense from 0 — e.g. 64-bit hash ids). On dense-id
    corpora rank(id)-1 == id, so the selection is unchanged there. The
    top-n is a ``TakeOrdered``, not a global sort; the rank window runs
    on ≤ n rows."""
    sub = df.select(F.col(id_col), F.col(vec_col)).orderBy(id_col).limit(
        n_centroids
    )
    w = Window.orderBy(id_col)
    return sub.select(
        (F.row_number().over(w) - 1).cast("long").alias("cid"),
        F.col(vec_col).alias("c_vec"),
    )


def train_ivf_centroids(
    df: DataFrame,
    n_centroids: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Lloyd (k-means) refinement of the IVF seed centroids: per
    iteration, assign every vector to its nearest centroid (a map-only
    Arrow pass, :func:`_assign_to` — never a shuffle of the corpus),
    then recompute each cell's centroid as the component mean of its
    members (ONE map-side-combined hash aggregate of the corpus into
    ``n_centroids`` rows). Cells that lose all members keep their
    previous centroid.

    Cross-engine determinism: float summation is order-sensitive, so a
    plain ``avg`` would differ run-to-run (Spark partition order) and
    engine-to-engine (the DuckDB oracle). The mean is therefore computed
    on a FIXED-POINT grid: components quantize to ``floor(x * 2^20)``
    longs whose integer sum is exactly associative, and the mean is the
    exact double ``sum / (count * 2^20)`` — bit-identical regardless of
    partitioning, and replayable verbatim in SQL (``floor``, unlike
    round or a double→bigint cast, has no tie/rounding-mode divergence
    between engines). The 2⁻²⁰ quantization error (~1e-6) is far below
    any embedding noise floor. Long overflow needs |x|·2²⁰·rows ≥ 2⁶³,
    i.e. ~10¹² unit-scale vectors per cell — beyond 100 TB corpus sizes.

    Returns ``(cid, c_vec array<double>)``."""
    if dim is None:
        dim = _infer_dim(df, vec_col)
    scale = float(1 << 20)
    cent = _seed_centroids(df, n_centroids, id_col, vec_col).select(
        "cid",
        F.transform("c_vec", lambda x: x.cast("double")).alias("c_vec"),
    )
    for _ in range(iters):
        assigned = _assign_to(df, cent, id_col, vec_col)
        means = (
            assigned.groupBy("cid")
            .agg(
                *[
                    F.sum(
                        F.floor(F.col(vec_col)[j].cast("double") * scale)
                    ).alias(f"s{j}")
                    for j in range(dim)
                ],
                F.count(F.lit(1)).alias("n"),
            )
            .select(
                "cid",
                F.array(
                    *[
                        F.col(f"s{j}") / (F.col("n") * F.lit(scale))
                        for j in range(dim)
                    ]
                ).alias("c_new"),
            )
        )
        cent = cent.join(means, "cid", "left").select(
            "cid", F.coalesce("c_new", "c_vec").alias("c_vec")
        )
        # materialize each iteration's n_centroids rows on the driver:
        # the next assignment and both downstream consumers reference
        # cent multiple times, and without this the full-corpus
        # aggregation lineage would re-execute ~2^iters times (values
        # are bit-deterministic, so materialization cannot change them)
        cent = df.sparkSession.createDataFrame(
            cent.collect(), "cid long, c_vec array<double>"
        )
    return cent


def _centroids(
    df: DataFrame,
    n_centroids: int,
    id_col: str,
    vec_col: str,
    train_iters: int,
) -> DataFrame:
    """Seeded or trained centroid table, per ``train_iters``."""
    if train_iters:
        return train_ivf_centroids(
            df, n_centroids, train_iters, id_col, vec_col
        )
    return _seed_centroids(df, n_centroids, id_col, vec_col)


def _assign_to(
    df: DataFrame,
    cent: DataFrame,
    id_col: str,
    vec_col: str,
    with_cosine: bool = False,
) -> DataFrame:
    """Nearest-centroid assignment against an explicit centroid table
    ``(cid, c_vec)`` by cosine, ties → lowest cid — as a MAP-ONLY pass:
    the tiny centroid table (bounded by the caller's ``n_centroids``)
    collects to the driver and rides into an Arrow ``mapInPandas``
    closure, so assignment never shuffles the corpus. The previous
    crossJoin + per-id-window form pushed all N·C scored rows (each
    carrying the full embedding) through an exchange PER ASSIGNMENT —
    and k-means re-assigns every iteration, so at 100 TB that exchange
    was the training bottleneck; a literal-expression argmax avoids the
    shuffle too but pays seconds of Catalyst analysis per assignment on
    the C·dim-literal tree (measured r8).

    Cross-engine exactness (the property the DuckDB oracles replay):
    every float op reproduces Spark's sequential fold bit-for-bit —
    products and sums accumulate LEFT-TO-RIGHT over dimensions via one
    vectorized numpy op per dimension (never ``np.dot``, whose pairwise
    summation reorders), norms take ``sqrt`` of the same fold, and the
    quotient is ``dot / (norm_a * norm_c)`` in that exact operation
    order; ``argmax`` returns the FIRST maximum = lowest cid on exact
    ties. Degenerate inputs RAISE with a clear message instead of
    corrupting assignments: a zero-norm centroid or embedding has no
    cosine (the expression form raises DIVIDE_BY_ZERO under this repo's
    ANSI default — a verified r8 review caught an earlier cut silently
    assigning everything to a zero centroid through a NaN→+inf argmax),
    and a NULL embedding raises rather than crash ``np.stack`` with an
    opaque worker IndexError. Note the centroid ``collect()`` runs at
    construction time (the snapshot is taken when the plan is BUILT, and
    building an assignment is no longer fully lazy — the price of the
    map-only plan)."""
    import numpy as np

    rows = sorted(cent.collect(), key=lambda r: r["cid"])
    cmat = np.array(
        [[float(x) for x in r["c_vec"]] for r in rows], dtype=np.float64
    )
    cids = np.array([int(r["cid"]) for r in rows], dtype=np.int64)
    n_c, dim = cmat.shape if rows else (0, 0)
    c_norm = np.zeros(n_c)
    for j in range(dim):
        c_norm += cmat[:, j] * cmat[:, j]
    c_norm = np.sqrt(c_norm)
    if n_c and (c_norm == 0.0).any():
        bad = [int(c) for c, nz in zip(cids, c_norm == 0.0) if nz]
        raise ValueError(
            f"centroid assignment: centroid(s) {bad} have zero norm — "
            "cosine distance is undefined there; drop zero vectors from "
            "the corpus before seeding/training"
        )

    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    base = df.select(F.col(id_col), F.col(vec_col))
    # build a FRESH StructType: StructType.add mutates (and returns) the
    # DataFrame's cached schema object, corrupting base.columns
    extra = [StructField("cid", LongType())]
    if with_cosine:
        extra.append(StructField("__acos", DoubleType()))
    schema = StructType(list(base.schema.fields) + extra)

    def fn(it):
        import pandas as pd

        for pdf in it:
            if not len(pdf):
                continue
            col = pdf[vec_col].to_numpy()
            if any(v is None for v in col):
                raise ValueError(
                    f"centroid assignment: column {vec_col!r} contains "
                    "NULL embeddings — filter or impute upstream"
                )
            a = np.stack(col).astype(np.float64)
            dots = np.zeros((len(pdf), n_c))
            a_sq = np.zeros(len(pdf))
            for j in range(dim):
                aj = a[:, j]
                a_sq += aj * aj
                dots += aj[:, None] * cmat[None, :, j]
            if (a_sq == 0.0).any():
                raise ValueError(
                    "centroid assignment: zero-norm embedding(s) present "
                    "— cosine distance is undefined; drop zero vectors "
                    "upstream (the expression form raises DIVIDE_BY_ZERO "
                    "here too)"
                )
            sims = dots / (np.sqrt(a_sq)[:, None] * c_norm[None, :])
            out = pdf.copy()
            best = sims.argmax(axis=1)
            out["cid"] = cids[best]
            if with_cosine:
                out["__acos"] = sims[np.arange(len(pdf)), best]
            yield out

    if not rows:
        out = base.withColumn("cid", F.lit(None).cast("long"))
        if with_cosine:
            out = out.withColumn("__acos", F.lit(None).cast("double"))
        return out.limit(0)
    return base.mapInPandas(fn, schema)


def _probe_queries(
    cent: DataFrame,
    qvecs: DataFrame,
    nprobe: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """The ONE definition of the IVF probe: each query joined to its
    ``nprobe`` nearest centroids by cosine (ties → lowest cid), the tiny
    centroid table broadcast. Returns (query_id, q_vec, q_cid) — shared
    by the in-memory, stored, and SQ8-composed search paths so the
    probe tie-break can never drift between them."""
    w_probe = Window.partitionBy(id_col).orderBy(
        F.col("__ccos").desc(), F.col("cid").asc()
    )
    return (
        qvecs.crossJoin(F.broadcast(cent))
        .select(
            F.col(id_col),
            F.col(vec_col),
            F.col("cid"),
            cosine(F.col(vec_col), F.col("c_vec")).alias("__ccos"),
        )
        .withColumn("__rn", F.row_number().over(w_probe))
        .where(F.col("__rn") <= nprobe)
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            F.col("cid").alias("q_cid"),
        )
    )


def ivf_topk(
    df: DataFrame,
    query_ids,
    k: int = 5,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 1,
    train_iters: int = 0,
) -> DataFrame:
    """Approximate top-k via IVF: exact cosine ranking restricted to the
    query's ``nprobe`` nearest centroid cells. Same output shape as
    :func:`cosine_topk`; recall loss shows up as missing neighbors that
    live in unprobed cells and shrinks as ``nprobe`` grows (the standard
    IVF recall/cost dial — probing multiplies only the tiny query side,
    never the corpus scan). ``train_iters>0`` runs that many k-means
    refinement rounds (:func:`train_ivf_centroids`) before assignment —
    on clustered corpora this balances cell sizes and lifts recall at
    the same ``nprobe`` (measured: tests/test_ivf_training.py)."""
    cent = _centroids(df, n_centroids, id_col, vec_col, train_iters)
    assigned = _assign_to(df, cent, id_col, vec_col)
    qvecs = df.where(F.col(id_col).isin(list(query_ids)))
    queries = _probe_queries(cent, qvecs, nprobe, id_col, vec_col)
    corpus = assigned.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.col("cid").alias("c_cid"),
    )
    sims = _exact_sims(
        corpus.join(
            F.broadcast(queries),
            (F.col("c_cid") == F.col("q_cid"))
            & (F.col("neighbor_id") != F.col("query_id")),
        )
    )
    return _rank_topk(sims, k)


def build_ivf_index(
    df: DataFrame,
    path: str,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_iters: int = 0,
) -> None:
    """Persist the IVF structure: the corpus assignments land under
    ``<path>/cells`` PARTITIONED BY the cell id and the centroid table
    under ``<path>/centroids``. Partitioning by cell is the point — a
    probe against the stored index becomes directory-level PARTITION
    PRUNING, so a search reads ~``nprobe/n_centroids`` of the corpus
    bytes from storage instead of scanning it (the property that makes
    IVF an INDEX at 100 TB rather than a filter). ``train_iters>0``
    k-means-refines the centroids before the build
    (:func:`train_ivf_centroids`); probes and increments
    (:func:`extend_ivf_index`) read whatever centroid table was
    persisted, so they follow automatically."""
    cent = _centroids(df, n_centroids, id_col, vec_col, train_iters)
    # the fit statistic (mean assigned-cosine) rides the cells write as
    # an observed metric — _assign_to already computed every row's
    # cosine, so drift bookkeeping costs ZERO extra corpus passes
    from pyspark.sql import Observation

    obs = Observation()
    assigned = (
        _assign_to(df, cent, id_col, vec_col, with_cosine=True)
        .observe(obs, F.avg("__acos").alias("m"), F.count(F.lit(1)).alias("n"))
        .drop("__acos")
    )
    assigned.write.mode("overwrite").partitionBy("cid").parquet(f"{path}/cells")
    cent.write.mode("overwrite").parquet(f"{path}/centroids")
    got = obs.get
    df.sparkSession.createDataFrame(
        [(
            float(got["m"]) if got["m"] is not None else None,
            int(got["n"]),
        )],
        "build_mean_cos double, n bigint",
    ).write.mode("overwrite").parquet(f"{path}/stats")


# an increment whose mean assigned-cosine falls this far below the
# build-time corpus mean indicates the stored centroids no longer
# describe the incoming distribution — recall silently decays from there
# (extend_ivf_index reports it; retrain_ivf_index is the remedy)
DRIFT_RETRAIN_THRESHOLD = 0.05


def _assigned_cosine_mean(cells: DataFrame, cent: DataFrame, vec_col: str):
    """Mean cosine between each assigned vector and its own centroid —
    the cheap fit statistic drift detection runs on: one broadcast join
    against the tiny centroid table + one map-side-combined avg, no
    corpus shuffle. (A monitoring statistic, not an oracle value — plain
    ``avg`` is fine here.)"""
    row = (
        cells.join(F.broadcast(cent), "cid")
        .agg(
            F.avg(cosine(F.col(vec_col), F.col("c_vec"))).alias("m"),
            F.count(F.lit(1)).alias("n"),
        )
        .first()
    )
    return (float(row["m"]) if row["m"] is not None else None, int(row["n"]))


def _write_build_stats(spark, path: str, vec_col: str) -> None:
    """Persist the build-time fit statistic (<path>/stats) the drift
    check compares increments against."""
    cent = spark.read.parquet(f"{path}/centroids")
    base = spark.read.parquet(f"{path}/cells")
    m, n = _assigned_cosine_mean(base, cent, vec_col)
    spark.createDataFrame(
        [(m, n)], "build_mean_cos double, n bigint"
    ).write.mode("overwrite").parquet(f"{path}/stats")


def _build_mean_cos(spark, path: str, vec_col: str) -> float:
    """Build-time mean assigned cosine; computed and persisted on first
    access for pre-round-9 indexes that lack <path>/stats."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(f"{path}/stats")
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(p):
        _write_build_stats(spark, path, vec_col)
    return float(spark.read.parquet(f"{path}/stats").first()["build_mean_cos"])


def extend_ivf_index(
    df_new: DataFrame,
    path: str,
    increment_id: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Incremental index maintenance: assign ONLY the new vectors
    against the STORED centroids and store them as the increment
    ``<path>/cells_inc/<increment_id>`` (cell-partitioned like the
    base) — the corpus already indexed is never re-read or re-assigned,
    and :func:`ivf_topk_indexed` reads base + increments as one corpus.
    Because assignment is a pure function of (vector, centroid table),
    an extended index is row-identical to rebuilding on the union as
    long as the centroid table (the n-smallest-id seeds, k-means-refined
    when the build used ``train_iters``) derives from the original
    corpus — the equivalence ``tests/test_dedup_similarity_text.py``
    locks.

    ``increment_id`` names the ingest batch and makes RETRIES safe: the
    write uses ``mode="ignore"``, so re-running a COMPLETED increment is
    a no-op instead of silently duplicating index rows (the same K5
    idempotent-restart semantics as ``sinks.write_parquet``, with the
    same caveat — a crash mid-write leaves a partial directory that
    must be deleted before the retry).

    DRIFT DETECTION (round 9): frozen centroids silently decay recall
    when the incoming distribution shifts — a shifted cluster straddles
    old cell boundaries, so same-cluster neighbors scatter across cells
    a probe won't co-visit. Each extend therefore measures the
    increment's mean assigned-cosine (one broadcast join + avg over the
    increment only) against the persisted build-time corpus mean
    (``<path>/stats``) and returns a report dict::

        {"increment_id", "n", "build_mean_cos", "increment_mean_cos",
         "drift", "retrain_recommended"}

    ``drift = build_mean_cos - increment_mean_cos``;
    ``retrain_recommended`` trips at ``DRIFT_RETRAIN_THRESHOLD``. On a
    tripped report, run :func:`retrain_ivf_index` — ingest keeps working
    correctly either way (assignment stays exact; only PROBE recall
    decays), so the trigger is advisory, surfaced, and logged under
    ``<path>/stats_inc/<increment_id>`` for fleet-side monitoring. The
    statistic rides the increment write as an observed metric (no extra
    pass); an EMPTY increment is a safe no-op reporting ``n=0``. On a
    retried, already-completed increment the ``ignore`` write skips the
    job (its observation never fires), so the stats are recomputed from
    the stored increment with an explicit schema."""
    spark = df_new.sparkSession
    cent = spark.read.parquet(f"{path}/centroids")
    inc_path = f"{path}/cells_inc/{increment_id}"
    jvm = spark._jvm
    hp = jvm.org.apache.hadoop.fs.Path(inc_path)
    fs = hp.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(hp):  # completed (or partial-crash: delete + rerun)
        from pyspark.sql.types import LongType, StructField, StructType

        sch = StructType(
            list(df_new.select(F.col(id_col), F.col(vec_col)).schema.fields)
            + [StructField("cid", LongType())]
        )
        # explicit schema: an empty increment (only _SUCCESS) must read
        # as 0 rows, not raise UNABLE_TO_INFER_SCHEMA
        stored = spark.read.schema(sch).parquet(inc_path)
        inc_mean, inc_n = _assigned_cosine_mean(stored, cent, vec_col)
    else:
        from pyspark.sql import Observation

        obs = Observation()
        assigned = (
            _assign_to(df_new, cent, id_col, vec_col, with_cosine=True)
            .observe(
                obs,
                F.avg("__acos").alias("m"),
                F.count(F.lit(1)).alias("n"),
            )
            .drop("__acos")
        )
        assigned.write.mode("ignore").partitionBy("cid").parquet(inc_path)
        got = obs.get
        inc_mean = float(got["m"]) if got["m"] is not None else None
        inc_n = int(got["n"])
    build_mean = _build_mean_cos(spark, path, vec_col)
    drift = (build_mean - inc_mean) if inc_mean is not None else None
    report = {
        "increment_id": increment_id,
        "n": inc_n,
        "build_mean_cos": build_mean,
        "increment_mean_cos": inc_mean,
        "drift": drift,
        "retrain_recommended": bool(
            drift is not None and drift > DRIFT_RETRAIN_THRESHOLD
        ),
    }
    spark.createDataFrame(
        [tuple(report.values())],
        "increment_id string, n bigint, build_mean_cos double,"
        " increment_mean_cos double, drift double,"
        " retrain_recommended boolean",
    ).write.mode("ignore").parquet(f"{path}/stats_inc/{increment_id}")
    return report


def retrain_ivf_index(
    spark,
    path: str,
    new_path: str,
    n_centroids: int = 16,
    train_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """The remedy for a tripped drift trigger: re-derive centroids from
    the FULL indexed corpus (base + every completed increment, read once
    via :func:`_index_cells`) with :func:`train_ivf_centroids` and build
    a fresh index at ``new_path`` — the consolidated replacement for the
    drifted ``path``. A new path rather than in-place: readers keep
    probing the old index until the new one's ``_SUCCESS`` markers land,
    then switch atomically (the same publish-by-path pattern as any
    immutable-storage index swap); rewriting in place would have the
    build read the very files it is overwriting."""
    corpus = _index_cells(spark, path).select(F.col(id_col), F.col(vec_col))
    build_ivf_index(
        corpus, new_path, n_centroids, id_col, vec_col, train_iters
    )


def _index_cells(spark, index_path: str) -> DataFrame:
    """The full indexed corpus: the base cells plus every COMPLETED
    increment directory — completed means the commit protocol's
    ``_SUCCESS`` marker exists, so an increment whose write crashed
    midway is invisible to readers until its retry (delete + rerun)
    lands it whole, never silently read as a partial corpus.
    FS-agnostic listing via the Hadoop FileSystem, so the index can
    live on HDFS/S3A as well as local disk."""
    cells = spark.read.parquet(f"{index_path}/cells")
    jvm = spark._jvm
    inc_root = jvm.org.apache.hadoop.fs.Path(f"{index_path}/cells_inc")
    fs = inc_root.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(inc_root):
        for st in fs.listStatus(inc_root):
            if st.isDirectory() and fs.exists(
                jvm.org.apache.hadoop.fs.Path(st.getPath(), "_SUCCESS")
            ):
                # explicit schema (the base cells'): an EMPTY completed
                # increment (only _SUCCESS — a zero-row ingest) must read
                # as 0 rows, not raise UNABLE_TO_INFER_SCHEMA
                cells = cells.unionByName(
                    spark.read.schema(cells.schema).parquet(
                        st.getPath().toString()
                    )
                )
    return cells


def ivf_topk_indexed(
    spark,
    index_path: str,
    query_vecs: DataFrame,
    k: int = 5,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k against a PERSISTED IVF index
    (:func:`build_ivf_index`) — identical results to :func:`ivf_topk` on
    the indexed corpus, but the corpus is never rebuilt or re-assigned:
    queries rank against the stored centroids (tiny read), and the cell
    join's broadcast of the probed (query, cell) pairs lets Spark's
    dynamic partition pruning drop every unprobed cell directory AT THE
    SCAN (`PartitionFilters: dynamicpruning#...` — asserted in
    tests/test_dedup_similarity_text.py), so storage reads scale with
    ``nprobe/n_centroids``, not corpus size."""
    cent = spark.read.parquet(f"{index_path}/centroids")
    cells = _index_cells(spark, index_path)
    queries = _probe_queries(cent, query_vecs, nprobe, id_col, vec_col)
    corpus = cells.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.col("cid").alias("c_cid"),
    )
    sims = _exact_sims(
        corpus.join(
            F.broadcast(queries),
            (F.col("c_cid") == F.col("q_cid"))
            & (F.col("neighbor_id") != F.col("query_id")),
        )
    )
    return _rank_topk(sims, k)


def sq8_bounds(
    df: DataFrame, vec_col: str = "embedding", dim: int | None = None
) -> tuple[list[float], list[float]]:
    """Per-DIMENSION [min, max] over the corpus — the scalar-quantization
    codebook. ONE map-side-combined aggregate pass collapsing the corpus
    to a single 2·dim-value row (the same shape as
    ``scale.compute_bounds``); the lists are driver-side constants from
    then on, folded into codegen as literals."""
    if dim is None:
        first = df.select(vec_col).first()
        if first is None or first[0] is None:
            raise ValueError(
                "sq8_bounds: corpus is empty or its first embedding is "
                "null — cannot derive quantization bounds (pass dim= and "
                "bounds= explicitly to encode against a frozen codebook)"
            )
        dim = len(first[0])
    c = F.col(vec_col)
    row = df.agg(
        *[F.min(c[j].cast("double")).alias(f"mn{j}") for j in range(dim)],
        *[F.max(c[j].cast("double")).alias(f"mx{j}") for j in range(dim)],
    ).first()
    return (
        [row[f"mn{j}"] for j in range(dim)],
        [row[f"mx{j}"] for j in range(dim)],
    )


def sq8_code(vec: Column, mn: list[float], mx: list[float]) -> Column:
    """SQ8 encode: component j maps to ``floor((x - mn_j) / (mx_j -
    mn_j) * 255)`` clamped to [0, 255] (a constant dimension encodes 0).
    ``floor`` over plain IEEE -,/,* is the cross-engine-exact choice
    (same grid note as :func:`train_ivf_centroids`); the result is an
    ``array<tinyint>`` — 1 byte/component on the wire and in parquet vs
    4 for float32: the 4× storage/scan lever this family exists for."""
    terms = []
    for j, (lo, hi) in enumerate(zip(mn, mx)):
        if hi > lo:
            code = F.floor(
                (vec[j].cast("double") - F.lit(lo))
                / F.lit(hi - lo) * F.lit(255.0)
            )
            code = F.least(F.greatest(code, F.lit(0)), F.lit(255))
        else:
            code = F.lit(0)
        # tinyint is signed: store code-128 so the full 0..255 range
        # fits; decode adds it back
        terms.append((code - F.lit(128)).cast("byte"))
    return F.array(*terms)


def sq8_decode(codes: Column, mn: list[float], mx: list[float]) -> Column:
    """Dequantize to the cell MIDPOINT: ``mn_j + (code + 0.5) * (mx_j -
    mn_j) / 255`` — halves the worst-case error vs the left edge and is
    the standard SQ reconstruction."""
    terms = []
    for j, (lo, hi) in enumerate(zip(mn, mx)):
        if hi > lo:
            terms.append(
                F.lit(lo)
                + (codes[j].cast("double") + F.lit(128.5))
                * F.lit((hi - lo) / 255.0)
            )
        else:
            terms.append(F.lit(lo))
    return F.array(*terms)


def sq8_quantize(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    bounds: tuple[list[float], list[float]] | None = None,
) -> DataFrame:
    """Corpus → ``(id, codes array<tinyint>)`` — the table you PERSIST:
    at 100 TB of float32 embeddings the code table is ~25 TB, and every
    ANN candidate pass scans codes instead of vectors. Pass ``bounds``
    to encode increments against a frozen codebook (new batches must
    reuse the original corpus bounds or codes are not comparable)."""
    mn, mx = bounds if bounds is not None else sq8_bounds(df, vec_col, dim)
    return df.select(
        F.col(id_col),
        sq8_code(F.col(vec_col), mn, mx).alias("codes"),
    )


def sq8_topk(
    df: DataFrame,
    query_ids,
    k: int = 5,
    oversample: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k cosine via SCALAR QUANTIZATION with exact
    re-rank (the SQ/ADC pattern every production ANN store layers under
    IVF): the corpus is ranked ASYMMETRICALLY — full-precision query
    against dequantized 1-byte corpus codes — to pick ``k · oversample``
    candidates per query, then ONLY the candidates fetch their true
    vectors for an exact cosine re-rank to the final top-k. Same output
    shape as :func:`cosine_topk`; recall loss is confined to true
    neighbors whose quantized similarity falls outside the candidate
    band (shrinks with ``oversample`` — gated in tests).

    100 TB shape: the candidate pass scans the 4×-smaller code table
    with the tiny query set broadcast (no corpus shuffle); the re-rank
    joins the ~``|Q|·k·oversample``-row candidate set back by id
    (broadcast again), so full-precision vectors are read only for
    candidates. Determinism: codes and dequantized values use
    floor/IEEE arithmetic replayable verbatim in the SQL oracle, and
    both ranking stages tie-break on ascending neighbor id."""
    mn, mx = sq8_bounds(df, vec_col, dim)
    codes = df.select(
        F.col(id_col).alias("neighbor_id"),
        sq8_code(F.col(vec_col), mn, mx).alias("__codes"),
    )
    approx = codes.select(
        "neighbor_id", sq8_decode(F.col("__codes"), mn, mx).alias("a_vec")
    )
    queries = df.where(F.col(id_col).isin(list(query_ids))).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    cand_w = Window.partitionBy("query_id").orderBy(
        F.col("__asim").desc(), F.col("neighbor_id").asc()
    )
    cands = (
        approx.crossJoin(F.broadcast(queries))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("q_vec"), F.col("a_vec")).alias("__asim"),
        )
        .withColumn("__rn", F.row_number().over(cand_w))
        .where(F.col("__rn") <= k * oversample)
        .select("query_id", "neighbor_id")
    )
    corpus = df.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    sims = _exact_sims(
        corpus.join(F.broadcast(cands), "neighbor_id").join(
            F.broadcast(queries), "query_id"
        )
    )
    return _rank_topk(sims, k)


def build_ivf_sq8_index(
    df: DataFrame,
    path: str,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_iters: int = 0,
    dim: int | None = None,
) -> None:
    """The composed production layout — IVF partition pruning OVER SQ8
    codes: ``<path>/cells`` holds ``(id, codes array<tinyint>)``
    partitioned by cell id (a probe reads ~nprobe/n_centroids of a
    table that is itself 4× smaller than the vectors), ``<path>/
    vectors`` holds the full-precision corpus SORTED BY id (so the
    re-rank's collected-candidate-id ``isin`` pushdown prunes row
    groups via footer min/max — see :func:`ivf_sq8_topk_indexed`),
    ``<path>/centroids`` and ``<path>/sq8_bounds`` hold the tiny
    codebooks. At 100 TB of float32 embeddings a nprobe=4/64 search
    touches ~1.6 TB of codes plus candidate-only vector fetches,
    instead of the 100 TB brute scan."""
    cent = _centroids(df, n_centroids, id_col, vec_col, train_iters)
    assigned = _assign_to(df, cent, id_col, vec_col)
    mn, mx = sq8_bounds(df, vec_col, dim)
    codes = assigned.select(
        F.col(id_col),
        sq8_code(F.col(vec_col), mn, mx).alias("codes"),
        "cid",
    )
    codes.write.mode("overwrite").partitionBy("cid").parquet(f"{path}/cells")
    cent.write.mode("overwrite").parquet(f"{path}/centroids")
    spark = df.sparkSession
    spark.createDataFrame(
        [(mn, mx)], "mn array<double>, mx array<double>"
    ).write.mode("overwrite").parquet(f"{path}/sq8_bounds")
    df.select(F.col(id_col), F.col(vec_col)).sort(id_col).write.mode(
        "overwrite"
    ).parquet(f"{path}/vectors")


def _sq8_candidate_frame(
    spark,
    index_path: str,
    queries: DataFrame,
    k: int,
    oversample: int,
    id_col: str,
    broadcast_queries: bool = True,
) -> DataFrame:
    """The LAZY candidate selection of :func:`ivf_sq8_topk_indexed`:
    asymmetric ranking of the probed cells' dequantized codes against
    the queries, top ``k · oversample`` per query. Kept as its own frame
    so the cells scan's dynamic partition pruning stays plan-assertable
    (the interactive caller collects this — the DPP subtree would
    otherwise be invisible in the returned re-rank plan).

    ``broadcast_queries=False`` (the batch re-rank path) joins plain on
    the cid equi-key instead: a million-query batch cannot broadcast,
    and with most cells probed anyway the DPP prune the broadcast form
    buys is worth ~nothing there. Candidate ROWS are identical either
    way — the per-query ranking is a deterministic total order
    (asymmetric cosine desc, neighbor id asc), independent of join
    strategy."""
    b = spark.read.parquet(f"{index_path}/sq8_bounds").first()
    mn, mx = list(b["mn"]), list(b["mx"])
    cells = spark.read.parquet(f"{index_path}/cells").select(
        F.col(id_col).alias("neighbor_id"),
        sq8_decode(F.col("codes"), mn, mx).alias("a_vec"),
        F.col("cid").alias("c_cid"),
    )
    cand_w = Window.partitionBy("query_id").orderBy(
        F.col("__asim").desc(), F.col("neighbor_id").asc()
    )
    q_side = F.broadcast(queries) if broadcast_queries else queries
    return (
        cells.join(
            q_side,
            (F.col("c_cid") == F.col("q_cid"))
            & (F.col("neighbor_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("q_vec"), F.col("a_vec")).alias("__asim"),
        )
        .withColumn("__rn", F.row_number().over(cand_w))
        .where(F.col("__rn") <= k * oversample)
        .select("query_id", "neighbor_id")
    )


def ivf_sq8_topk_indexed(
    spark,
    index_path: str,
    query_vecs: DataFrame,
    k: int = 5,
    nprobe: int = 1,
    oversample: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mode: str = "auto",
) -> DataFrame:
    """Search the :func:`build_ivf_sq8_index` layout: queries rank
    against the stored centroids (tiny read), the probed cells join
    drives dynamic partition pruning on the CODES scan, candidates are
    ranked asymmetrically (full-precision query × dequantized codes,
    pooled across the query's probed cells) down to ``k · oversample``,
    and only those fetch true vectors from ``<path>/vectors`` for the
    exact cosine re-rank. Output shape matches :func:`cosine_topk`.

    The candidate fetch is a real PRUNED READ, not just a join: a
    broadcast join never restricts its probe-side scan, so the
    candidate (query, neighbor) pairs — ≤ ``|Q| · k · oversample`` rows
    by construction — are collected and their neighbor ids pushed into
    the vectors scan as an ``isin`` predicate, which parquet row-group
    min/max statistics prune on the id-SORTED table (that sort order is
    why :func:`build_ivf_sq8_index` writes it sorted). Beyond
    ``_ISIN_PUSHDOWN_MAX`` candidate ids (where a Catalyst literal list
    costs more than it saves) the ids coalesce into at most
    ``_RANGE_PUSHDOWN_MAX`` BETWEEN ranges (:func:`_id_range_predicate`)
    — constant predicate size at any candidate count, still row-group
    pruned on the sorted table, so a production-sized query batch keeps
    the pruned read instead of degrading to a full corpus scan.
    The collect makes a search eager — ANN search is an interactive
    operation; the collected set is the same size as the result the
    caller is about to collect anyway. Driver memory for that set is
    ``|Q| · k · oversample`` (id, id) pairs — ~50 MB per million
    candidate rows.

    ``mode``: ``"interactive"`` is the collected-predicate path above;
    ``"batch"`` is the fully-DISTRIBUTED offline re-rank (VERDICT r9
    #3) — candidates→vectors is a join, queries join plain instead of
    broadcasting, nothing is collected, driver memory is flat at any
    batch size. Batch trades the pruned vectors read for a full scan
    joined down — the right trade exactly when the candidate set covers
    most row groups anyway (the uniform-scatter information bound,
    SCALE.md). ``"auto"`` picks batch past ``_BATCH_RERANK_MIN``
    estimated candidate rows (one cheap ``count()`` of the query
    frame). Results are row-identical across modes: the ranking
    contract is a deterministic total order."""
    if mode not in ("auto", "interactive", "batch"):
        raise ValueError("mode must be auto|interactive|batch")
    cent = spark.read.parquet(f"{index_path}/centroids")
    queries = _probe_queries(cent, query_vecs, nprobe, id_col, vec_col)
    if mode == "auto":
        # limit(n+1).count() instead of count(): the LocalLimit stops the
        # scan after threshold+1 query rows, so the estimate job is O(1)
        # for huge batches and never recomputes a full query lineage
        max_q = _BATCH_RERANK_MIN // max(1, k * oversample)
        mode = (
            "batch"
            if query_vecs.limit(max_q + 1).count() > max_q
            else "interactive"
        )
    if mode == "batch":
        cands = _sq8_candidate_frame(
            spark, index_path, queries, k, oversample, id_col,
            broadcast_queries=False,
        )
        vectors = spark.read.parquet(f"{index_path}/vectors").select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
        )
        q_only = queries.select("query_id", "q_vec").dropDuplicates(
            ["query_id"]
        )
        sims = _exact_sims(
            vectors.join(cands, "neighbor_id").join(q_only, "query_id")
        )
        return _rank_topk(sims, k)
    cand_df = _sq8_candidate_frame(
        spark, index_path, queries, k, oversample, id_col
    )
    cand_rows = cand_df.collect()
    cands = spark.createDataFrame(cand_rows or [], cand_df.schema)
    vectors = spark.read.parquet(f"{index_path}/vectors").select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    cand_ids = sorted({r["neighbor_id"] for r in cand_rows})
    if 0 < len(cand_ids) <= _ISIN_PUSHDOWN_MAX:
        vectors = vectors.where(F.col("neighbor_id").isin(cand_ids))
    elif cand_ids:
        vectors = vectors.where(
            _id_range_predicate(
                F.col("neighbor_id"), cand_ids, _RANGE_PUSHDOWN_MAX
            )
        )
    q_only = queries.select("query_id", "q_vec").dropDuplicates(["query_id"])
    sims = _exact_sims(
        vectors.join(F.broadcast(cands), "neighbor_id").join(
            F.broadcast(q_only), "query_id"
        )
    )
    return _rank_topk(sims, k)


def lsh_bucket(vec: Column, planes: list[list[int]]) -> Column:
    """Random-hyperplane bucket id: bit p = sign of ⟨vec, plane_p⟩."""
    acc = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        d = dot(vec, F.array(*[F.lit(float(w)) for w in plane]))
        acc = acc + F.when(d > 0, F.lit(1 << p)).otherwise(F.lit(0)).cast("long")
    return acc


def lsh_ann_topk(
    df: DataFrame,
    query_ids,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = NUM_PLANES,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: exact cosine ranking restricted to same-bucket
    candidates. Same output shape as :func:`cosine_topk` (fewer rows when a
    bucket holds < k candidates — the approximation's recall loss)."""
    if dim is None:
        dim = _infer_dim(df, vec_col)
    hp = hyperplanes(dim, planes)
    with_b = df.withColumn("__bucket", lsh_bucket(F.col(vec_col), hp))
    queries = with_b.where(F.col(id_col).isin(list(query_ids))).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.col("__bucket").alias("q_bucket"),
    )
    corpus = with_b.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.col("__bucket").alias("c_bucket"),
    )
    sims = _exact_sims(
        corpus.join(
            F.broadcast(queries),
            (F.col("c_bucket") == F.col("q_bucket"))
            & (F.col("neighbor_id") != F.col("query_id")),
        )
    )
    return _rank_topk(sims, k)
