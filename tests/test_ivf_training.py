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
