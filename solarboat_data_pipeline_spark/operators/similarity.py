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
    rows the ranking contract consumes — as an Arrow pass over the
    candidate pairs. The ``cosine()`` expression is an interpreted
    higher-order-function fold (~3·dim lambda steps per pair); the
    numpy per-dimension accumulation reproduces the identical
    left-to-right fold (see :func:`_fold_scores`), with the 6-dp round
    still applied by Spark's ``F.round``. Only the four needed columns
    cross the Python boundary (guide §4.1)."""
    import numpy as np

    from pyspark.sql.types import DoubleType, StructField, StructType

    sub = pairs.select("query_id", "q_vec", "neighbor_id", "c_vec")
    schema = StructType(
        [
            StructField("query_id", sub.schema["query_id"].dataType),
            StructField("neighbor_id", sub.schema["neighbor_id"].dataType),
            StructField("cosine_sim", DoubleType()),
        ]
    )

    def fn(it):
        import pandas as pd

        for pdf in it:
            n = len(pdf)
            if not n:
                continue
            q = _corpus_matrix(pdf, "q_vec")
            c = _corpus_matrix(pdf, "c_vec")
            dots = np.zeros(n)
            q_sq = np.zeros(n)
            c_sq = np.zeros(n)
            for j in range(q.shape[1]):
                qj, cj = q[:, j], c[:, j]
                dots += qj * cj
                q_sq += qj * qj
                c_sq += cj * cj
            with np.errstate(divide="ignore", invalid="ignore"):
                sims = dots / (np.sqrt(q_sq) * np.sqrt(c_sq))
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"],
                    "neighbor_id": pdf["neighbor_id"],
                    "cosine_sim": sims,
                }
            )

    return sub.mapInPandas(fn, schema).select(
        "query_id",
        "neighbor_id",
        F.round(F.col("cosine_sim"), 6).alias("cosine_sim"),
    )


def _collect_query_rows(
    df: DataFrame, query_ids, id_col: str, vec_col: str
) -> list:
    """The (tiny) query set as collected rows — the snapshot every
    Arrow scoring pass closes over. Taken at plan-build time, same
    eagerness note as :func:`_assign_to`."""
    return (
        df.where(F.col(id_col).isin(list(query_ids)))
        .select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
        .collect()
    )


def _score_against_queries(
    df: DataFrame,
    q_rows: list,
    id_col: str,
    vec_col: str,
    out_col: str,
    transform=None,
) -> DataFrame:
    """Corpus × collected-queries cosine as ONE map-only Arrow pass —
    the vectorized form of ``crossJoin(broadcast(queries))`` +
    ``cosine()``. Spark's higher-order functions (``zip_with`` /
    ``aggregate``) are CodegenFallback — interpreted per ELEMENT — so
    the expression form paid |corpus|·|Q|·dim interpreted lambda steps
    (guide §4.2: hand whole batches to vectorized native code instead).
    Bit-exactness: per-dimension accumulation reproduces the
    sequential ``cosine()`` fold (see :func:`_fold_scores`), and the
    denominator is ``norm(q) * norm(c)`` — IEEE multiply is
    commutative, so the product equals the expression's either way.
    Self-pairs (neighbor == query id) are excluded, mirroring the
    crossJoin's ``!=`` predicate. ``transform`` (optional) maps the
    float64 corpus matrix before scoring — e.g. the SQ8
    quantize→dequantize — replicating expression arithmetic exactly.
    Returns ``(query_id, neighbor_id, out_col double)``, un-rounded;
    callers apply the 6-dp ``F.round`` contract in Spark."""
    import numpy as np

    qmat = np.array(
        [[float(x) for x in r["q_vec"]] for r in q_rows], dtype=np.float64
    )
    qids = np.array([r["query_id"] for r in q_rows])
    n_q, dim = qmat.shape if q_rows else (0, 0)
    q_sq = np.zeros(n_q)
    for j in range(dim):
        q_sq += qmat[:, j] * qmat[:, j]
    q_norm = np.sqrt(q_sq)

    from pyspark.sql.types import DoubleType, StructField, StructType

    id_type = df.schema[id_col].dataType
    schema = StructType(
        [
            StructField("query_id", id_type),
            StructField("neighbor_id", id_type),
            StructField(out_col, DoubleType()),
        ]
    )
    base = df.select(F.col(id_col), F.col(vec_col))

    def fn(it):
        import pandas as pd

        for pdf in it:
            n = len(pdf)
            if not n:
                continue
            a = _corpus_matrix(pdf, vec_col)
            if transform is not None:
                a = transform(a)
            dots = np.zeros((n, n_q))
            a_sq = np.zeros(n)
            for j in range(dim):
                aj = a[:, j]
                a_sq += aj * aj
                dots += aj[:, None] * qmat[None, :, j]
            with np.errstate(divide="ignore", invalid="ignore"):
                sims = dots / (q_norm[None, :] * np.sqrt(a_sq)[:, None])
            nid = np.asarray(pdf[id_col])
            out_q = np.tile(qids, n)
            out_n = np.repeat(nid, n_q)
            vals = sims.ravel()
            mask = out_q != out_n
            yield pd.DataFrame(
                {
                    "query_id": out_q[mask],
                    "neighbor_id": out_n[mask],
                    out_col: vals[mask],
                }
            )

    if not q_rows:
        return _local_frame(df.sparkSession, [], schema)
    return base.mapInPandas(fn, schema)


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
    q_rows = _collect_query_rows(df, query_ids, id_col, vec_col)
    scored = _score_against_queries(df, q_rows, id_col, vec_col, "__sim")
    sims = scored.select(
        "query_id",
        "neighbor_id",
        F.round(F.col("__sim"), 6).alias("cosine_sim"),
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


def _train_ivf_centroid_rows(
    df: DataFrame,
    n_centroids: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> list[tuple[int, list[float]]]:
    """The Lloyd loop of :func:`train_ivf_centroids`, returning plain
    ``(cid, c_vec)`` rows. Each iteration is ONE Spark job: a map-only
    Arrow pass that assigns every vector to its nearest centroid AND
    emits per-partition fixed-point partial sums per cell
    (:func:`_assign_partial_sums` — ≤ partitions × n_centroids tiny
    rows), which the driver combines with exact integer addition. The
    round-13 form instead ran, per iteration, a 64-column
    ``sum(floor(...))`` hash aggregate + join + collect whose
    DataFrame construction alone cost ~1.8 s of driver py4j time
    (guide §1.2: fix the per-call fixed costs once the algorithm is
    right); the integer partials are associative and commutative, so
    this produces bit-identical centroids with none of that plan.
    """
    if dim is None:
        dim = _infer_dim(df, vec_col)
    scale = float(1 << 20)
    seed = _seed_centroids(df, n_centroids, id_col, vec_col).select(
        "cid",
        F.transform("c_vec", lambda x: x.cast("double")).alias("c_vec"),
    )
    cent_rows = [
        (int(r["cid"]), [float(x) for x in r["c_vec"]])
        for r in sorted(seed.collect(), key=lambda r: r["cid"])
    ]
    for _ in range(iters):
        partials = _assign_partial_sums(
            df, cent_rows, id_col, vec_col, dim, scale
        ).collect()
        sums: dict[int, list[int]] = {}
        counts: dict[int, int] = {}
        for r in partials:
            cid = int(r["cid"])
            counts[cid] = counts.get(cid, 0) + int(r["n"])
            if cid in sums:
                s = sums[cid]
                for j, v in enumerate(r["sums"]):
                    s[j] += int(v)
            else:
                sums[cid] = [int(v) for v in r["sums"]]
        # mean = exact double sum / (count * 2^20) — identical to the SQL
        # oracle's CAST(sum AS DOUBLE) / (CAST(n AS DOUBLE) * 1048576.0):
        # float(int) and the bigint→double cast both round to nearest
        cent_rows = [
            (
                cid,
                [s / (counts[cid] * scale) for s in sums[cid]]
                if cid in sums
                else vec,  # cells that lose all members keep their centroid
            )
            for cid, vec in cent_rows
        ]
    return cent_rows


def train_ivf_centroids(
    df: DataFrame,
    n_centroids: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Lloyd (k-means) refinement of the IVF seed centroids: per
    iteration, assign every vector to its nearest centroid and reduce
    each cell's fixed-point component sums — ONE map-only Arrow pass
    over the corpus per iteration (:func:`_train_ivf_centroid_rows`),
    never a shuffle of the corpus. Cells that lose all members keep
    their previous centroid.

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
    rows = _train_ivf_centroid_rows(
        df, n_centroids, iters, id_col, vec_col, dim
    )
    return _local_frame(
        df.sparkSession, rows, "cid long, c_vec array<double>"
    )


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


def _centroid_rows_for(
    df: DataFrame,
    n_centroids: int,
    id_col: str,
    vec_col: str,
    train_iters: int,
) -> list[tuple[int, list[float]]]:
    """:func:`_centroids` as plain collected rows — the internal form
    the search/build paths consume, collected ONCE per call instead of
    once per downstream assignment/probe (each such collect was a full
    Spark job on the seed lineage)."""
    if train_iters:
        return _train_ivf_centroid_rows(
            df, n_centroids, train_iters, id_col, vec_col
        )
    seed = _seed_centroids(df, n_centroids, id_col, vec_col)
    return [
        (int(r["cid"]), [float(x) for x in r["c_vec"]])
        for r in sorted(seed.collect(), key=lambda r: r["cid"])
    ]


def _local_frame(spark, rows, schema) -> DataFrame:
    """Driver-local rows as a SINGLE-slice DataFrame. A plain
    ``createDataFrame(list)`` parallelizes to ``defaultParallelism``
    slices, so every later action pays one Python-runner evaluation PER
    SLICE even for a 16-row codebook (measured on local[32]: a 1-row
    parquet write costs 4.2 s via ``coalesce(1)`` — one task walking 32
    Python partitions sequentially — 1.45 s / 17 files written plain,
    0.31 s / 1 file single-slice; guide §4.3/§6.2)."""
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows or [], 1), schema
    )


def _centroid_frame(spark, rows: list[tuple[int, list[float]]]) -> DataFrame:
    """Collected centroid rows as the tiny ``(cid, c_vec)`` local frame
    the probe join broadcasts. NOTE the double cast: seed rows from a
    float-typed corpus keep their exact values (float→double is exact),
    so probe cosines are bit-identical to the lazy-frame form."""
    return _local_frame(spark, rows, "cid long, c_vec array<double>")


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
    rows = [
        (int(r["cid"]), [float(x) for x in r["c_vec"]])
        for r in sorted(cent.collect(), key=lambda r: r["cid"])
    ]
    return _assign_rows(df, rows, id_col, vec_col, with_cosine)


def _centroid_matrix(rows: list[tuple[int, list[float]]]):
    """(cmat float64 C×dim, cids int64, c_norm) from plain centroid rows,
    with the zero-norm guard every assignment path shares. c_norm is the
    exact left-to-right component fold of the ``norm()`` expression."""
    import numpy as np

    cmat = np.array([v for _, v in rows], dtype=np.float64)
    cids = np.array([c for c, _ in rows], dtype=np.int64)
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
    return cmat, cids, c_norm


def _corpus_matrix(pdf, vec_col: str):
    """The batch's embeddings as a float64 matrix, with the shared
    NULL-embedding guard."""
    import numpy as np

    col = pdf[vec_col].to_numpy()
    if any(v is None for v in col):
        raise ValueError(
            f"centroid assignment: column {vec_col!r} contains "
            "NULL embeddings — filter or impute upstream"
        )
    return np.stack(col).astype(np.float64)


def _fold_scores(a, cmat, c_norm):
    """Cosine of every (row, centroid) pair, accumulated PER DIMENSION
    left-to-right — bit-identical to the sequential ``cosine()`` fold
    (products and sums in the same order; IEEE multiply is commutative,
    so the denominator order cannot differ either)."""
    import numpy as np

    n = a.shape[0]
    dots = np.zeros((n, cmat.shape[0]))
    a_sq = np.zeros(n)
    for j in range(a.shape[1]):
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
    return dots / (np.sqrt(a_sq)[:, None] * c_norm[None, :])


def _assign_rows(
    df: DataFrame,
    rows: list[tuple[int, list[float]]],
    id_col: str,
    vec_col: str,
    with_cosine: bool = False,
) -> DataFrame:
    """:func:`_assign_to` against already-collected centroid rows — the
    form the training loop and index builders use so that iterating
    never re-collects a centroid frame per pass."""
    import numpy as np

    cmat, cids, c_norm = _centroid_matrix(rows)

    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    base = df.select(F.col(id_col), F.col(vec_col))
    # build a FRESH StructType: StructType.add mutates (and returns) the
    # DataFrame's cached schema object, corrupting base.columns
    extra = [StructField("cid", LongType())]
    if with_cosine:
        extra.append(StructField("__acos", DoubleType()))
    schema = StructType(list(base.schema.fields) + extra)

    def fn(it):
        for pdf in it:
            if not len(pdf):
                continue
            a = _corpus_matrix(pdf, vec_col)
            sims = _fold_scores(a, cmat, c_norm)
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


def _assign_partial_sums(
    df: DataFrame,
    rows: list[tuple[int, list[float]]],
    id_col: str,
    vec_col: str,
    dim: int,
    scale: float,
) -> DataFrame:
    """One Lloyd iteration's map side: nearest-centroid assignment AND
    per-cell fixed-point partial sums in the SAME Arrow pass. Emits
    ``(cid, n, sums array<long>)`` — at most one row per (partition,
    cell), so the whole corpus reduces to tiny partials with no wide
    aggregate plan and no shuffle. ``sums[j] = Σ floor(x_j * scale)``
    over the partition's members of the cell, exactly the per-component
    quantization the SQL oracle replays (np.floor on float64 ==
    ``floor(CAST(x AS DOUBLE) * scale)``; int64 partial sums are
    associative, so any partitioning combines to identical totals)."""
    import numpy as np

    cmat, cids, c_norm = _centroid_matrix(rows)

    def fn(it):
        import pandas as pd

        for pdf in it:
            if not len(pdf):
                continue
            a = _corpus_matrix(pdf, vec_col)
            sims = _fold_scores(a, cmat, c_norm)
            best = sims.argmax(axis=1)
            q = np.floor(a * scale).astype(np.int64)
            out_c, out_n, out_s = [], [], []
            for k in np.unique(best):
                members = q[best == k]
                out_c.append(int(cids[k]))
                out_n.append(members.shape[0])
                out_s.append(members.sum(axis=0).tolist())
            yield pd.DataFrame({"cid": out_c, "n": out_n, "sums": out_s})

    return df.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        fn, "cid long, n long, sums array<long>"
    )


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
    rows = _centroid_rows_for(df, n_centroids, id_col, vec_col, train_iters)
    cent = _centroid_frame(df.sparkSession, rows)
    assigned = _assign_rows(df, rows, id_col, vec_col)
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
    rows = _centroid_rows_for(df, n_centroids, id_col, vec_col, train_iters)
    cent = _centroid_frame(df.sparkSession, rows)
    # the fit statistic (mean assigned-cosine) rides the cells write as
    # an observed metric — _assign_rows already computed every row's
    # cosine, so drift bookkeeping costs ZERO extra corpus passes
    from pyspark.sql import Observation

    obs = Observation()
    assigned = (
        _assign_rows(df, rows, id_col, vec_col, with_cosine=True)
        .observe(obs, F.avg("__acos").alias("m"), F.count(F.lit(1)).alias("n"))
        .drop("__acos")
    )
    # guide §6 file layout: hash-cluster rows by cell BEFORE the
    # partitioned write — without it every input task writes one file
    # into every cell directory (tasks × cells tiny files; measured 512
    # files for a 5,000-row 16-cell build, and every later probe pays
    # that open() count at the scan). REBALANCE is the AQE-adaptive
    # form: small cells coalesce into shared write tasks, and a skewed
    # hot cell still splits into several size-bounded files at scale.
    # r14 (guide §2.6 — overlap independent jobs): the cells write and
    # the tiny codebook write share no lineage (the codebook is a
    # driver-local frame), so the codebook job's fixed latency hides
    # under the corpus write instead of following it serially
    from concurrent.futures import ThreadPoolExecutor

    def _write_cells():
        assigned.hint("rebalance", "cid").write.mode(
            "overwrite"
        ).partitionBy("cid").parquet(f"{path}/cells")

    def _write_centroids():
        # codebook/stats frames are single-slice local relations
        # (_local_frame): one file, one task, instead of
        # defaultParallelism mostly-empty Python-runner evaluations
        cent.write.mode("overwrite").parquet(f"{path}/centroids")

    with ThreadPoolExecutor(max_workers=2) as pool:
        for f in [pool.submit(_write_cells), pool.submit(_write_centroids)]:
            f.result()
    got = obs.get
    _local_frame(
        df.sparkSession,
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
    _local_frame(
        spark, [(m, n)], "build_mean_cos double, n bigint"
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
        # same guide §6 clustering as the base build (tasks × cells
        # tiny-file explosion otherwise). The rebalance exchange makes
        # the plan adaptive, and AQE's empty-relation propagation would
        # prune the CollectMetrics node on a ZERO-ROW increment —
        # Observation.get then dies on a missing metrics row — so that
        # one AQE rule is excluded for this write only.
        _AQE_EMPTY = (
            "org.apache.spark.sql.execution.adaptive.AQEPropagateEmptyRelation"
        )
        _EXCL = "spark.sql.adaptive.optimizer.excludedRules"
        try:
            prev_excl = spark.conf.get(_EXCL)
        except Exception:
            prev_excl = None
        spark.conf.set(
            _EXCL, f"{prev_excl},{_AQE_EMPTY}" if prev_excl else _AQE_EMPTY
        )
        try:
            assigned.hint("rebalance", "cid").write.mode("ignore").partitionBy(
                "cid"
            ).parquet(inc_path)
        finally:
            if prev_excl is None:
                spark.conf.unset(_EXCL)
            else:
                spark.conf.set(_EXCL, prev_excl)
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
    _local_frame(
        spark,
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
    # expr-string build: the 2·dim aggregate expressions parse in the JVM
    # in one shot instead of ~10·dim py4j Column calls (~1 s of driver
    # time per call at dim=64); `arr[j]` is 0-based in Spark SQL exactly
    # like Column.__getitem__, so the aggregate is identical
    row = df.agg(
        *[
            F.expr(f"min(CAST({vec_col}[{j}] AS DOUBLE)) AS mn{j}")
            for j in range(dim)
        ],
        *[
            F.expr(f"max(CAST({vec_col}[{j}] AS DOUBLE)) AS mx{j}")
            for j in range(dim)
        ],
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
    both ranking stages tie-break on ascending neighbor id.

    The candidate scan runs as ONE Arrow pass
    (:func:`_score_against_queries` with the quantize→dequantize as its
    matrix transform) — the encode/decode expression trees plus the
    interpreted ``cosine()`` fold previously cost ~3 s of driver plan
    build + interpreted eval per call at |corpus| = 2 k; the numpy
    arithmetic replicates ``sq8_code``/``sq8_decode`` op for op."""
    mn, mx = sq8_bounds(df, vec_col, dim)

    def quantize_roundtrip(a):
        # per dimension: floor((x - lo) / (hi - lo) * 255) clamped to
        # [0, 255], then lo + (code + 0.5) * ((hi - lo) / 255)  — the
        # exact op order of sq8_code ∘ sq8_decode (stored code-128 +
        # 128.5 == code + 0.5 exactly: all values are small integers)
        import numpy as np

        out = np.empty_like(a)
        for j, (lo, hi) in enumerate(zip(mn, mx)):
            if hi > lo:
                code = np.floor((a[:, j] - lo) / (hi - lo) * 255.0)
                code = np.minimum(np.maximum(code, 0.0), 255.0)
                out[:, j] = lo + (code + 0.5) * ((hi - lo) / 255.0)
            else:
                out[:, j] = lo
        return out

    q_rows = _collect_query_rows(df, query_ids, id_col, vec_col)
    scored = _score_against_queries(
        df, q_rows, id_col, vec_col, "__asim", transform=quantize_roundtrip
    )
    cand_w = Window.partitionBy("query_id").orderBy(
        F.col("__asim").desc(), F.col("neighbor_id").asc()
    )
    cands = (
        scored.withColumn("__rn", F.row_number().over(cand_w))
        .where(F.col("__rn") <= k * oversample)
        .select("query_id", "neighbor_id")
    )
    queries = df.where(F.col(id_col).isin(list(query_ids))).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
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
    rows = _centroid_rows_for(df, n_centroids, id_col, vec_col, train_iters)
    cent = _centroid_frame(df.sparkSession, rows)
    assigned = _assign_rows(df, rows, id_col, vec_col)
    mn, mx = sq8_bounds(df, vec_col, dim)
    codes = assigned.select(
        F.col(id_col),
        sq8_code(F.col(vec_col), mn, mx).alias("codes"),
        "cid",
    )
    # same guide §6 layout discipline as build_ivf_index: cluster by
    # cell before the partitioned write, single-file tiny codebooks
    codes.hint("rebalance", "cid").write.mode("overwrite").partitionBy(
        "cid"
    ).parquet(f"{path}/cells")
    cent.coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    spark = df.sparkSession
    _local_frame(
        spark, [(mn, mx)], "mn array<double>, mx array<double>"
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
    cands = _local_frame(spark, cand_rows, cand_df.schema)
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


def with_lsh_buckets_arrow(
    df: DataFrame,
    plane_sets: list[list[list[int]]],
    vec_col: str,
    out_cols: list[str],
) -> DataFrame:
    """``lsh_bucket`` for every plane set as ONE map-only Arrow pass
    appending one long bucket column per set — the corpus-sized form.
    The expression form pays |corpus| · planes · dim INTERPRETED
    higher-order-function steps (``dot`` is an ``aggregate`` fold —
    CodegenFallback); here each plane's ⟨vec, plane⟩ accumulates per
    dimension in the same left-to-right order (products against exact
    ±1.0 weights), so ``d > 0`` and therefore every bucket bit is
    bit-identical to the expression form. All other columns pass
    through unchanged."""
    import numpy as np

    mats = [
        np.array([[float(w) for w in plane] for plane in planes])
        for planes in plane_sets
    ]

    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        list(df.schema.fields)
        + [StructField(c, LongType()) for c in out_cols]
    )

    def fn(it):
        for pdf in it:
            if not len(pdf):
                continue
            a = _corpus_matrix(pdf, vec_col)
            out = pdf.copy()
            for mat, col in zip(mats, out_cols):
                n_p, dim = mat.shape
                dots = np.zeros((len(pdf), n_p))
                for j in range(dim):
                    dots += a[:, j][:, None] * mat[None, :, j]
                bits = (dots > 0).astype(np.int64)
                weights = (1 << np.arange(n_p, dtype=np.int64))
                out[col] = bits @ weights
            yield out

    return df.mapInPandas(fn, schema)


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
    with_b = with_lsh_buckets_arrow(df, [hp], vec_col, ["__bucket"])
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
