"""IVF centroid training (round 8, VERDICT r7 item 2): k-means as
DataFrame aggregations, arbitrary (non-dense) ids, and a measured
recall@k-vs-brute-force gate on a clustered corpus where unrefined
seeds are pathological (all drawn from one cluster)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from solarboat_data_pipeline_spark.operators import similarity as sim

DIM = 16
N_CLUSTERS = 8
PER_CLUSTER = 150


def _clustered_corpus(id_offset: int = 0):
    """Deterministic clustered embeddings: 8 well-separated unit
    directions, small noise. The 16 smallest ids ALL belong to cluster 0
    — the worst case for seed centroids (every seed points the same
    way), and exactly the skew VERDICT r7 flagged for real corpora."""
    rng = np.random.default_rng(42)
    centers = rng.normal(size=(N_CLUSTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    vid = 0
    # first 20 ids: cluster 0 (covers the 16 seeds and 10 query ids)
    for c in [0] * 20 + [
        c for c in range(N_CLUSTERS) for _ in range(PER_CLUSTER)
    ]:
        v = centers[c] + 0.15 * rng.normal(size=DIM)
        rows.append((vid + id_offset, [float(x) for x in v]))
        vid += 1
    return rows


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        _clustered_corpus(), "vec_id long, embedding array<double>"
    ).cache()


def _recall(spark, got_df, truth_df, k):
    got = {}
    for r in got_df.collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    truth = {}
    for r in truth_df.collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recs = [
        len(got.get(q, set()) & nb) / len(nb) for q, nb in truth.items()
    ]
    return sum(recs) / len(recs)


def test_trained_recall_beats_pathological_seeds(spark, corpus):
    """The measured gate: with all seeds in one cluster, seeded IVF at
    nprobe=4 of 8 cells loses a large share of true neighbors; 3 Lloyd
    iterations recover the cluster structure and recall >= 0.9."""
    qids = list(range(10))
    k = 10
    truth = sim.cosine_topk(corpus, qids, k=k)
    seeded = sim.ivf_topk(
        corpus, qids, k=k, n_centroids=N_CLUSTERS, nprobe=4, train_iters=0
    )
    trained = sim.ivf_topk(
        corpus, qids, k=k, n_centroids=N_CLUSTERS, nprobe=4, train_iters=3
    )
    r_seed = _recall(spark, seeded, truth, k)
    r_train = _recall(spark, trained, truth, k)
    assert r_train >= 0.9, f"trained recall {r_train:.3f} < 0.9"
    assert r_train > r_seed, (
        f"training did not help: trained {r_train:.3f} vs seeded {r_seed:.3f}"
    )


def test_training_is_deterministic_across_partitionings(spark, corpus):
    """The fixed-point mean makes training BIT-identical regardless of
    partition layout — a plain avg() would drift with summation order."""
    a = sim.train_ivf_centroids(
        corpus.repartition(1), n_centroids=N_CLUSTERS, iters=2
    ).collect()
    b = sim.train_ivf_centroids(
        corpus.repartition(17), n_centroids=N_CLUSTERS, iters=2
    ).collect()
    ca = {r["cid"]: r["c_vec"] for r in a}
    cb = {r["cid"]: r["c_vec"] for r in b}
    assert ca.keys() == cb.keys() and len(ca) == N_CLUSTERS
    for cid in ca:
        assert ca[cid] == cb[cid], f"cid {cid} differs across partitionings"


def test_arbitrary_non_dense_ids(spark):
    """ADVICE r7: id-offset corpora must get the full centroid count and
    the SAME cells (the old `id < n_centroids` seed rule silently
    yielded fewer centroids). Assignments must be identical up to the id
    shift."""
    off = 3 * 10**13
    dense = spark.createDataFrame(
        _clustered_corpus(0), "vec_id long, embedding array<double>"
    )
    shifted = spark.createDataFrame(
        _clustered_corpus(off), "vec_id long, embedding array<double>"
    )
    a_dense = sim.ivf_assign(
        dense, n_centroids=N_CLUSTERS, train_iters=2
    ).select("vec_id", "cid")
    a_shift = sim.ivf_assign(
        shifted, n_centroids=N_CLUSTERS, train_iters=2
    ).select((F.col("vec_id") - off).alias("vec_id"), "cid")
    da = {r["vec_id"]: r["cid"] for r in a_dense.collect()}
    db = {r["vec_id"]: r["cid"] for r in a_shift.collect()}
    assert da == db
    assert len(set(da.values())) == N_CLUSTERS


def test_empty_cells_keep_previous_centroid(spark):
    """A centroid that loses every member survives the iteration with
    its previous vector (no null centroids, no shrinkage)."""
    # 4 seeds: three point along +x, one along -x; every non-seed vector
    # sits near +x, so after one assignment at least one +x seed cell
    # (and the -x cell) can end up empty — training must still return 4.
    rows = [
        (0, [1.0, 0.0]), (1, [0.99, 0.01]), (2, [0.98, 0.02]),
        (3, [-1.0, 0.0]),
    ] + [(i, [1.0, 0.001 * i]) for i in range(4, 40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cent = sim.train_ivf_centroids(df, n_centroids=4, iters=2, dim=2)
    got = {r["cid"]: r["c_vec"] for r in cent.collect()}
    assert set(got.keys()) == {0, 1, 2, 3}
    assert all(len(v) == 2 and all(x is not None for x in v)
               for v in got.values())
    # the -x seed keeps pointing -x (it never gains members)
    assert got[3][0] < 0


def _unit(v):
    import numpy as np

    v = np.asarray(v, float)
    return [float(x) for x in v / np.linalg.norm(v)]


def test_drift_trigger_and_retrain_restores_recall(spark, tmp_path):
    """Round-9 drift handling (VERDICT r8 item 4): an increment whose
    distribution shifted away from the build corpus (1) trips the
    advisory retrain trigger with a measured drift statistic, (2)
    demonstrably decays probe recall against the frozen centroids, and
    (3) recovers recall >= 0.9 after `retrain_ivf_index`.

    Corpus construction (dim 4): the increment's SIMILARITY structure —
    a phi-arc ring in dims 3-4, neighbors = close in phi — is
    independent of its small dims-1-2 jitter, which is what decides
    assignment against the frozen X/Y centroids. So same-arc neighbors
    scatter ~50/50 across the two old cells (a nprobe=1 probe can never
    see them all), while retrained centroids capture the arc and restore
    phi-locality."""
    import math

    rng = np.random.default_rng(7)
    rows = []
    for i in range(50):
        rows.append((2 * i, _unit([1, 0, 0, 0] + 0.1 * rng.normal(size=4))))
        rows.append((2 * i + 1, _unit([0, 1, 0, 0] + 0.1 * rng.normal(size=4))))
    base = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    inc_rows = []
    for i in range(300):
        phi = math.radians(120.0 * i / 299.0)
        ex, ey = rng.uniform(0.2, 1.0), rng.uniform(0.2, 1.0)
        inc_rows.append(
            (100 + i, _unit([0.15 * ex, 0.15 * ey, math.cos(phi), math.sin(phi)]))
        )
    inc = spark.createDataFrame(inc_rows, "vec_id long, embedding array<double>")
    idx, idx2 = str(tmp_path / "drift_idx"), str(tmp_path / "drift_idx2")
    sim.build_ivf_index(base, idx, n_centroids=2, train_iters=3)

    # an increment matching the build distribution does NOT trip
    same = spark.createDataFrame(
        [(500 + i, _unit([1, 0, 0, 0] + 0.1 * rng.normal(size=4)))
         for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    rep_same = sim.extend_ivf_index(same, idx, "inc_same")
    assert not rep_same["retrain_recommended"], rep_same
    assert abs(rep_same["drift"]) < sim.DRIFT_RETRAIN_THRESHOLD

    rep = sim.extend_ivf_index(inc, idx, "inc_shifted")
    assert rep["retrain_recommended"], rep
    assert rep["drift"] > sim.DRIFT_RETRAIN_THRESHOLD
    assert rep["n"] == 300
    # the report is persisted for fleet-side monitoring
    stored = spark.read.parquet(f"{idx}/stats_inc/inc_shifted").first()
    assert stored["retrain_recommended"] is True

    union = base.unionByName(same).unionByName(inc)
    qids = [150, 200, 250, 300, 350]
    k = 10
    truth = sim.cosine_topk(union, qids, k=k)
    qv = union.where(F.col("vec_id").isin(qids))
    r_pre = _recall(
        spark, sim.ivf_topk_indexed(spark, idx, qv, k=k, nprobe=1), truth, k
    )
    assert r_pre < 0.8, f"frozen-centroid recall should decay, got {r_pre}"
    sim.retrain_ivf_index(spark, idx, idx2, n_centroids=3, train_iters=5)
    r_post = _recall(
        spark, sim.ivf_topk_indexed(spark, idx2, qv, k=k, nprobe=1), truth, k
    )
    assert r_post >= 0.9, f"retrained recall {r_post} < 0.9 (pre {r_pre})"
    assert r_post > r_pre
    # the retrained index carries fresh build stats for the next cycle
    assert spark.read.parquet(f"{idx2}/stats").first()["build_mean_cos"] > 0.5


def test_extend_with_empty_increment_is_safe_noop(spark, tmp_path):
    """A scheduled ingest with zero new vectors must complete with an
    n=0 report (round-9 review regression: the drift read-back of an
    empty increment raised UNABLE_TO_INFER_SCHEMA), and a RETRY of the
    same empty increment must behave identically."""
    base = spark.createDataFrame(
        [(i, [1.0, 0.1 * i]) for i in range(8)],
        "vec_id long, embedding array<double>",
    )
    idx = str(tmp_path / "empty_inc_idx")
    sim.build_ivf_index(base, idx, n_centroids=2)
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    rep = sim.extend_ivf_index(empty, idx, "nothing")
    assert rep["n"] == 0 and rep["increment_mean_cos"] is None
    assert rep["drift"] is None and rep["retrain_recommended"] is False
    rep2 = sim.extend_ivf_index(empty, idx, "nothing")  # retry path
    assert rep2["n"] == 0 and rep2["retrain_recommended"] is False
    # the index still searches fine with the empty increment present
    out = sim.ivf_topk_indexed(
        spark, idx, base.where(F.col("vec_id") < 2), k=3, nprobe=2
    )
    assert out.count() > 0
