"""Unit tests for the LLM-data-pipeline operator families, verified
against independent pure-Python reference implementations (hashlib /
numpy / set algebra) rather than the Spark code under test.

Covers dedup (exact, MinHash, LSH, SimHash, Jaccard, components,
full near-dup pipeline), similarity (brute-force / IVF / LSH top-k),
text analysis, and multimodal plumbing.
"""

import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from solarboat_data_pipeline_spark.operators import dedup as dd
from solarboat_data_pipeline_spark.operators import multimodal as mm
from solarboat_data_pipeline_spark.operators import similarity as sim
from solarboat_data_pipeline_spark.operators import text as tx

# ---------------------------------------------------------------------------
# pure-Python reference implementations (the spec, independent of Spark)
# ---------------------------------------------------------------------------


def py_h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def py_tokens(text: str) -> list[str]:
    return [t for t in text.lower().split() if t]


def py_shingles(text: str, k: int = 3) -> set[str]:
    toks = py_tokens(text)
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def py_minhash(text: str, num_hashes: int = 16) -> list[int] | None:
    hs = [py_h32(s) for s in py_shingles(text)]
    if not hs:
        return None
    # constants per the documented recipe (dedup._perm_constants):
    # multiply-shift mod 2^32 with odd a < 2^31
    out = []
    for j in range(num_hashes):
        a = (int(hashlib.md5(f"a{j}".encode()).hexdigest()[:8], 16) % (1 << 31)) | 1
        b = int(hashlib.md5(f"b{j}".encode()).hexdigest()[:8], 16)
        out.append(min((a * h + b) % (1 << 32) for h in hs))
    return out


def py_simhash(text: str, bits: int = 16) -> int | None:
    hs = [py_h32(t) for t in py_tokens(text)]  # multiset, not distinct
    if not hs:
        return None
    acc = 0
    for b in range(bits):
        ones = sum((h >> b) & 1 for h in hs)
        if ones * 2 > len(hs):
            acc |= 1 << b
    return acc


def py_jaccard(t1: str, t2: str) -> float:
    a, b = py_shingles(t1), py_shingles(t2)
    return len(a & b) / len(a | b)


DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "the quick brown fox jumps over the lazy dog near the river shore"),
    (3, "entirely different content about solar boats and telemetry data"),
    (4, "the quick brown fox jumps over the lazy dog near the river bank"),
    (5, "短 doc"),  # fewer than 3 tokens → no shingles
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------


def test_exact_dedup_keeps_min_id_per_text(docs):
    rows = {r["keep_id"]: r["n_dups"] for r in dd.exact_dedup(docs).collect()}
    # docs 1 and 4 are byte-identical → keep 1 with 2 dups
    assert rows[1] == 2
    assert rows[2] == 1 and rows[3] == 1 and rows[5] == 1
    assert 4 not in rows


def test_minhash_matches_python_reference(docs):
    got = {
        r["doc_id"]: [r[f"mh{j}"] for j in range(16)]
        for r in dd.minhash_table(docs).collect()
    }
    for doc_id, text in DOCS:
        want = py_minhash(text)
        if want is None:
            assert doc_id not in got  # shingle-less docs have no signature
        else:
            assert got[doc_id] == want, f"doc {doc_id}"


def test_with_minhash_null_for_shingleless(docs):
    rows = {r["doc_id"]: r["minhash"] for r in dd.with_minhash(docs).collect()}
    assert rows[5] is None
    assert rows[1] == py_minhash(DOCS[0][1])


def test_lsh_identical_docs_always_candidates(docs):
    pairs = {(r["id_a"], r["id_b"]) for r in dd.lsh_candidate_pairs(docs).collect()}
    assert (1, 4) in pairs  # identical signature → every band collides
    # doc 3 shares no shingles with 1/2/4 → no band can match
    assert not any(3 in p for p in pairs)


def test_jaccard_verify_exact_values(spark, docs):
    cand = spark.createDataFrame([(1, 2), (1, 3)], ["id_a", "id_b"])
    rows = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dd.jaccard_verify(docs, cand, threshold=0.0).collect()
    }
    assert math.isclose(rows[(1, 2)], round(py_jaccard(DOCS[0][1], DOCS[1][1]), 6))
    assert (1, 3) not in rows  # zero intersection never survives the join


def test_ngram_jaccard_pairs_matches_python(docs):
    rows = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dd.ngram_jaccard_pairs(docs, threshold=0.1).collect()
    }
    want = {}
    for i, (ida, ta) in enumerate(DOCS):
        for idb, tb in DOCS[i + 1 :]:
            if py_shingles(ta) and py_shingles(tb):
                j = py_jaccard(ta, tb)
                if j >= 0.1:
                    want[(ida, idb)] = round(j, 6)
    assert rows == pytest.approx(want)


def test_simhash_matches_python_reference(docs):
    got = {r["doc_id"]: r["simhash"] for r in dd.simhash_table(docs).collect()}
    for doc_id, text in DOCS:
        want = py_simhash(text)
        if want is None:
            assert doc_id not in got
        else:
            assert got[doc_id] == want, f"doc {doc_id}"


def test_connected_components_known_graph(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (7, 5)], ["id_a", "id_b"]
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dd.connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 5: 5, 7: 5}


def test_near_dup_dedup_drops_higher_id(docs):
    rows = {
        r["drop_id"]: r["keep_id"] for r in dd.near_dup_dedup(docs, 0.5).collect()
    }
    # replicate the whole pipeline spec in Python: LSH bands (4 bands × 4
    # rows over the 16 minhashes) → jaccard ≥ 0.5 verify → components
    sigs = {i: py_minhash(t) for i, t in DOCS if py_minhash(t) is not None}
    cands = set()
    for ia in sigs:
        for ib in sigs:
            if ia < ib and any(
                sigs[ia][b * 4 : b * 4 + 4] == sigs[ib][b * 4 : b * 4 + 4]
                for b in range(4)
            ):
                cands.add((ia, ib))
    texts = dict(DOCS)
    edges = [p for p in cands if py_jaccard(texts[p[0]], texts[p[1]]) >= 0.5]
    # min-label components over the verified edges
    label = {i: i for p in edges for i in p}
    for _ in range(10):
        for a, b in edges:
            m = min(label[a], label[b])
            label[a] = label[b] = m
    want = {i: lbl for i, lbl in label.items() if lbl != i}
    assert rows == want
    assert rows[4] == 1  # identical docs always collapse


def test_embedding_cosine_pairs_matches_numpy(spark):
    vecs = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [1.0, 0.01, 0.0]),
    ]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    got = {
        (r["id_a"], r["id_b"]): r["cosine_sim"]
        for r in dd.embedding_cosine_pairs(df, threshold=0.9).collect()
    }
    want = {}
    for i, (ida, va) in enumerate(vecs):
        for idb, vb in vecs[i + 1 :]:
            a, b = np.array(va), np.array(vb)
            c = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
            if round(c, 6) >= 0.9:
                want[(ida, idb)] = round(c, 6)
    assert got == pytest.approx(want)


def test_simhash_pairs_exact_recall_at_max_hamming(docs):
    sh = {r["doc_id"]: r["simhash"] for r in dd.simhash_table(docs).collect()
          if r["simhash"] is not None}
    want = {}
    ids = sorted(sh)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = bin(sh[a] ^ sh[b]).count("1")
            if h <= 3:
                want[(a, b)] = h
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dd.simhash_near_dup_pairs(docs, max_hamming=3).collect()
    }
    # pigeonhole over 4 bands: recall must be EXACT at hamming <= bands-1
    assert got == want


def test_embedding_lsh_pairs_subset_of_exact_and_amplified(spark):
    vecs = [(i, [math.sin(i * d + 1) for d in range(1, 9)]) for i in range(30)]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    exact = {
        (r["id_a"], r["id_b"]): r["cosine_sim"]
        for r in dd.embedding_cosine_pairs(df, threshold=0.2).collect()
    }
    one = {
        (r["id_a"], r["id_b"]): r["cosine_sim"]
        for r in dd.embedding_lsh_dedup_pairs(
            df, threshold=0.2, planes=4, dim=8
        ).collect()
    }
    two = {
        (r["id_a"], r["id_b"]): r["cosine_sim"]
        for r in dd.embedding_lsh_dedup_pairs(
            df, threshold=0.2, planes=4, dim=8, tables=2
        ).collect()
    }
    # every LSH pair is a true pair with the exact cosine value
    assert set(one) <= set(exact) and set(two) <= set(exact)
    for k in one:
        assert one[k] == exact[k]
    # table 0 of the amplified form uses the single-table planes, so
    # OR-amplification can only ADD candidate pairs
    assert set(one) <= set(two)


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------


def _np_cosine(a, b):
    a, b = np.asarray(a, float), np.asarray(b, float)
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))


VEC_CORPUS = [
    (i, [math.sin(i * d + 1) for d in range(1, 5)]) for i in range(20)
]


@pytest.fixture(scope="module")
def vecs(spark):
    return spark.createDataFrame(VEC_CORPUS, ["vec_id", "embedding"])


def test_cosine_topk_matches_numpy(vecs):
    got = [
        (r["neighbor_id"], r["cosine_sim"], r["rank"])
        for r in sim.cosine_topk(vecs, [0], k=3).orderBy("rank").collect()
    ]
    sims = sorted(
        (
            (round(_np_cosine(VEC_CORPUS[0][1], v), 6), -i)
            for i, v in VEC_CORPUS
            if i != 0
        ),
        reverse=True,
    )
    want = [(-ni, s, rk + 1) for rk, (s, ni) in enumerate(sims[:3])]
    assert got == pytest.approx(want)


def test_ivf_topk_exact_within_cell(vecs):
    """IVF(nprobe=1) results must be exactly the brute-force ranking
    restricted to the query's centroid cell."""
    n_cent = 4
    # python replica of the deterministic seeding + assignment
    cents = [(i, v) for i, v in VEC_CORPUS if i < n_cent]
    assign = {}
    for i, v in VEC_CORPUS:
        best = max(cents, key=lambda c: (round(_np_cosine(v, c[1]), 12), -c[0]))
        assign[i] = best[0]
    got = [
        (r["neighbor_id"], r["cosine_sim"])
        for r in sim.ivf_topk(vecs, [5], k=3, n_centroids=n_cent)
        .orderBy("rank")
        .collect()
    ]
    cell = assign[5]
    cellmates = [
        (i, v) for i, v in VEC_CORPUS if i != 5 and assign[i] == cell
    ]
    ranked = sorted(
        ((round(_np_cosine(VEC_CORPUS[5][1], v), 6), -i) for i, v in cellmates),
        reverse=True,
    )
    want = [(-ni, s) for s, ni in ranked[:3]]
    assert got == pytest.approx(want)


def test_ivf_nprobe_only_adds_candidates(vecs):
    def neighbors(nprobe):
        out = sim.ivf_topk(
            vecs, query_ids=range(4), k=100, n_centroids=4, nprobe=nprobe
        ).collect()
        d = {}
        for r in out:
            d.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return d

    one, two = neighbors(1), neighbors(2)
    # with k above corpus size the rank cutoff never bites, so probing a
    # second cell can only ADD candidate neighbors per query
    for q, ns in one.items():
        assert ns <= two.get(q, set())
    assert sum(map(len, two.values())) > sum(map(len, one.values()))


def test_ivf_index_matches_in_memory_ivf(spark, vecs, tmp_path):
    """The persisted-index search must return EXACTLY what the in-memory
    ivf_topk returns on the same corpus — the index is a materialization,
    never an approximation change."""
    from pyspark.sql import functions as F

    idx = str(tmp_path / "ivf_idx")
    sim.build_ivf_index(vecs, idx, n_centroids=4)
    qv = vecs.where(F.col("vec_id") < 4)
    got = sorted(
        tuple(r)
        for r in sim.ivf_topk_indexed(spark, idx, qv, k=3, nprobe=2).collect()
    )
    want = sorted(
        tuple(r)
        for r in sim.ivf_topk(
            vecs, query_ids=range(4), k=3, n_centroids=4, nprobe=2
        ).collect()
    )
    assert got == want and got


def test_ivf_index_reader_skips_incomplete_increments(spark, vecs, tmp_path):
    """An increment directory without the commit protocol's _SUCCESS
    marker (a crashed mid-write) must be INVISIBLE to readers — a
    partial corpus silently changing top-k results is worse than a
    stale one."""
    import os
    import shutil

    from pyspark.sql import functions as F

    idx = str(tmp_path / "idx")
    sim.build_ivf_index(vecs.where(F.col("vec_id") < 8), idx, n_centroids=4)
    base_rows = sim._index_cells(spark, idx).count()
    # a completed increment counts...
    sim.extend_ivf_index(
        vecs.where(F.col("vec_id") == 8), idx, increment_id="ok"
    )
    assert sim._index_cells(spark, idx).count() == base_rows + 1
    # ...then simulate a crashed write: copy it and strip _SUCCESS
    src = f"{idx}/cells_inc/ok"
    dst = f"{idx}/cells_inc/crashed"
    shutil.copytree(src, dst)
    os.remove(f"{dst}/_SUCCESS")
    assert sim._index_cells(spark, idx).count() == base_rows + 1  # unchanged


def test_ivf_index_probe_uses_dynamic_partition_pruning(spark, vecs, tmp_path):
    """The scale contract of the stored index: the cells scan must carry a
    dynamic-pruning partition filter on cid (probe reads ~nprobe/n_cells
    of the stored bytes), and the cells directory must actually be
    partitioned by cell."""
    import os

    from pyspark.sql import functions as F

    idx = str(tmp_path / "ivf_idx")
    sim.build_ivf_index(vecs, idx, n_centroids=4)
    parts = [d for d in os.listdir(f"{idx}/cells") if d.startswith("cid=")]
    assert parts, os.listdir(f"{idx}/cells")
    qv = vecs.where(F.col("vec_id") < 4)
    out = sim.ivf_topk_indexed(spark, idx, qv, k=3, nprobe=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan, plan


def test_ivf_index_extend_equals_rebuild_on_union(spark, vecs, tmp_path):
    """Appending an increment's assignments against the STORED centroids
    must yield an index row-identical to rebuilding on the union (the
    centroid seeds live in the original corpus), and searches against
    either must agree."""
    from pyspark.sql import functions as F

    # the centroid seeds (ids < 4) must be in the original corpus
    seen = vecs.where((F.col("vec_id") < 4) | (F.col("vec_id") % 3 != 2))
    inc = vecs.where((F.col("vec_id") >= 4) & (F.col("vec_id") % 3 == 2))
    a, b = str(tmp_path / "ext"), str(tmp_path / "full")
    sim.build_ivf_index(seen, a, n_centroids=4)
    sim.extend_ivf_index(inc, a, increment_id="inc1")
    # a RETRY of the same completed increment must be a no-op (K5)
    sim.extend_ivf_index(inc, a, increment_id="inc1")
    sim.build_ivf_index(vecs, b, n_centroids=4)
    rows = lambda p: sorted(  # noqa: E731
        (r["vec_id"], r["cid"])
        for r in sim._index_cells(spark, p).collect()
    )
    assert rows(a) == rows(b) and len(rows(a)) == vecs.count()
    qv = vecs.where(F.col("vec_id") < 4)
    ra = sorted(tuple(r) for r in sim.ivf_topk_indexed(spark, a, qv, k=3, nprobe=2).collect())
    rb = sorted(tuple(r) for r in sim.ivf_topk_indexed(spark, b, qv, k=3, nprobe=2).collect())
    assert ra == rb and ra


def test_lsh_ann_cosine_values_exact_and_same_bucket(vecs):
    hp = sim.hyperplanes(4)

    def bucket(v):
        acc = 0
        for p, plane in enumerate(hp):
            if sum(x * w for x, w in zip(v, plane)) > 0:
                acc |= 1 << p
        return acc

    got = sim.lsh_ann_topk(vecs, [7], k=5, dim=4).collect()
    qb = bucket(VEC_CORPUS[7][1])
    for r in got:
        nv = VEC_CORPUS[r["neighbor_id"]][1]
        assert bucket(nv) == qb
        assert r["cosine_sim"] == pytest.approx(
            round(_np_cosine(VEC_CORPUS[7][1], nv), 6)
        )


def test_assignment_raises_on_degenerate_embeddings(spark):
    """Zero-norm and NULL embeddings RAISE with a clear message instead
    of corrupting assignments (an r8 review caught a cut that silently
    assigned the whole corpus to a zero centroid; the expression form
    raises DIVIDE_BY_ZERO under ANSI for the same inputs)."""
    zero_cent = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 0.0])], "cid long, c_vec array<double>"
    )
    good = spark.createDataFrame(
        [(7, [1.0, 2.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="zero norm"):
        sim._assign_to(good, zero_cent, "vec_id", "embedding")

    cent = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "cid long, c_vec array<double>"
    )
    zero_vec = spark.createDataFrame(
        [(7, [0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="zero-norm embedding"):
        sim._assign_to(zero_vec, cent, "vec_id", "embedding").collect()

    null_vec = spark.createDataFrame(
        [(7, None)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="NULL embeddings"):
        sim._assign_to(null_vec, cent, "vec_id", "embedding").collect()


def test_ivf_sq8_index_layout_and_pruned_probe(spark, vecs, tmp_path):
    """The composed layout's scale contract: cells store TINYINT codes
    partitioned by cid, the probe's codes scan carries a dynamic-pruning
    partition filter, and with oversample covering every cellmate the
    result equals plain ivf_topk (the exact re-rank hides quantization
    whenever the candidate band does not truncate)."""
    import os

    idx = str(tmp_path / "ivf_sq8_idx")
    sim.build_ivf_sq8_index(vecs, idx, n_centroids=4)
    parts = [d for d in os.listdir(f"{idx}/cells") if d.startswith("cid=")]
    assert parts, os.listdir(f"{idx}/cells")
    cells = spark.read.parquet(f"{idx}/cells")
    assert dict(cells.dtypes)["codes"] == "array<tinyint>"
    qv = vecs.where(F.col("vec_id") < 4)
    # DPP is asserted on the LAZY candidate frame — the search collects
    # it, so its cells-scan subtree is invisible in the returned plan
    cent = spark.read.parquet(f"{idx}/centroids")
    probe = sim._probe_queries(cent, qv, 1, "vec_id", "embedding")
    cand = sim._sq8_candidate_frame(spark, idx, probe, 3, 7, "vec_id")
    cplan = cand._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in cplan, cplan
    out = sim.ivf_sq8_topk_indexed(spark, idx, qv, k=3, nprobe=1, oversample=7)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the re-rank's vectors scan carries the collected candidate ids as
    # a pushed In filter (row-group pruning on the id-sorted table — a
    # broadcast join alone never restricts its probe-side scan)
    assert "In(vec_id" in plan, plan
    want = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["cosine_sim"])
        for r in sim.ivf_topk(vecs, range(4), k=3, n_centroids=4, nprobe=1)
        .collect()
    )
    got = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["cosine_sim"])
        for r in out.collect()
    )
    assert got == want


def test_id_range_predicate_bounds_and_gap_splits(spark):
    """The large-batch fetch predicate: widest gaps become splits, the
    cover is a superset of the ids, and the predicate size is bounded by
    max_ranges regardless of candidate count."""
    ids = [1, 2, 3, 50, 51, 90, 91, 92, 500]
    df = spark.range(0, 600).withColumnRenamed("id", "neighbor_id")
    pred = sim._id_range_predicate(F.col("neighbor_id"), ids, 3)
    got = sorted(r[0] for r in df.where(pred).collect())
    # 3 ranges keep the 2 widest gaps (3→50 and 92→500) as splits:
    # [1..3] ∪ [50..92] ∪ [500..500] — a superset containing every id
    assert got == list(range(1, 4)) + list(range(50, 93)) + [500]
    assert set(ids) <= set(got)
    # n <= max_ranges → exact singleton ranges, no slack
    pred1 = sim._id_range_predicate(F.col("neighbor_id"), ids, len(ids))
    assert sorted(r[0] for r in df.where(pred1).collect()) == ids
    # empty set → false predicate, not a full scan
    assert df.where(sim._id_range_predicate(F.col("neighbor_id"), [], 3)).count() == 0


def test_ivf_sq8_large_batch_keeps_pruned_fetch(spark, vecs, tmp_path, monkeypatch):
    """The round-8 cliff, closed: past _ISIN_PUSHDOWN_MAX candidate ids
    the vectors fetch must push coalesced BETWEEN ranges into the scan
    (GreaterThanOrEqual/LessThanOrEqual pushed filters) instead of
    silently degrading to a full corpus read — and return the identical
    result. Thresholds are patched down so the sf-test corpus exercises
    the large-batch branch."""
    idx = str(tmp_path / "ivf_sq8_idx_lb")
    sim.build_ivf_sq8_index(vecs, idx, n_centroids=4)
    qv = vecs.where(F.col("vec_id") < 4)
    want = sorted(
        map(tuple, sim.ivf_sq8_topk_indexed(
            spark, idx, qv, k=3, nprobe=1, oversample=7).collect())
    )
    monkeypatch.setattr(sim, "_ISIN_PUSHDOWN_MAX", 2)
    monkeypatch.setattr(sim, "_RANGE_PUSHDOWN_MAX", 3)
    out = sim.ivf_sq8_topk_indexed(spark, idx, qv, k=3, nprobe=1, oversample=7)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "In(vec_id" not in plan
    assert "GreaterThanOrEqual(vec_id" in plan, plan
    assert "LessThanOrEqual(vec_id" in plan, plan
    assert sorted(map(tuple, out.collect())) == want


def test_ivf_sq8_batch_mode_matches_interactive(spark, vecs, tmp_path,
                                                monkeypatch):
    """VERDICT r9 #3: the distributed batch re-rank (mode='batch' — no
    driver collect, candidates→vectors as a join, queries never
    broadcast) returns rows identical to the interactive
    collected-predicate path, and mode='auto' flips to batch past the
    candidate-estimate threshold."""
    idx = str(tmp_path / "ivf_sq8_idx_bm")
    sim.build_ivf_sq8_index(vecs, idx, n_centroids=4)
    qv = vecs.where(F.col("vec_id") < 4)
    want = sorted(map(tuple, sim.ivf_sq8_topk_indexed(
        spark, idx, qv, k=3, nprobe=1, oversample=7,
        mode="interactive").collect()))
    batch = sim.ivf_sq8_topk_indexed(
        spark, idx, qv, k=3, nprobe=1, oversample=7, mode="batch")
    plan = batch._jdf.queryExecution().executedPlan().toString()
    # the batch plan's vectors scan carries NO collected id predicate
    assert "In(vec_id" not in plan
    assert sorted(map(tuple, batch.collect())) == want
    # auto past the threshold takes the batch plan (4*3*7=84 > 10)
    monkeypatch.setattr(sim, "_BATCH_RERANK_MIN", 10)
    auto = sim.ivf_sq8_topk_indexed(
        spark, idx, qv, k=3, nprobe=1, oversample=7, mode="auto")
    aplan = auto._jdf.queryExecution().executedPlan().toString()
    assert "In(vec_id" not in aplan
    assert sorted(map(tuple, auto.collect())) == want
    with pytest.raises(ValueError, match="mode must be"):
        sim.ivf_sq8_topk_indexed(spark, idx, qv, mode="bogus")


def test_infer_dim_errors(spark):
    """Empty corpus / NULL first embedding raise descriptive ValueErrors
    from dim inference (train_ivf_centroids, lsh_ann_topk) instead of an
    opaque TypeError."""
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="no rows"):
        sim.train_ivf_centroids(empty, n_centroids=2, iters=1)
    nullv = spark.createDataFrame(
        [(1, None)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="NULL"):
        sim.lsh_ann_topk(nullv, [1], k=1)


def _sq8_replica(corpus):
    """Pure-python replica of sq8 encode/decode over a (id, vec) list."""
    dim = len(corpus[0][1])
    mn = [min(float(v[j]) for _, v in corpus) for j in range(dim)]
    mx = [max(float(v[j]) for _, v in corpus) for j in range(dim)]

    def code(v):
        out = []
        for j in range(dim):
            if mx[j] > mn[j]:
                c = math.floor((float(v[j]) - mn[j]) / (mx[j] - mn[j]) * 255.0)
                out.append(min(max(c, 0), 255))
            else:
                out.append(0)
        return out

    def decode(cs):
        return [
            mn[j] + (cs[j] + 0.5) * ((mx[j] - mn[j]) / 255.0)
            if mx[j] > mn[j] else mn[j]
            for j in range(dim)
        ]

    return mn, mx, code, decode


def test_sq8_codes_are_bytes_with_midpoint_error_bound(vecs):
    """Codes land in tinyint (the 4x storage claim) and the midpoint
    decode error is <= step/2 per component."""
    q = sim.sq8_quantize(vecs)
    assert dict(q.dtypes)["codes"] == "array<tinyint>"
    mn, mx, code, decode = _sq8_replica(VEC_CORPUS)
    stored = {r["vec_id"]: list(r["codes"]) for r in q.collect()}
    for i, v in VEC_CORPUS:
        want = [c - 128 for c in code(v)]
        assert stored[i] == want
        dec = decode(code(v))
        for j in range(4):
            step = (mx[j] - mn[j]) / 255.0
            assert abs(dec[j] - float(v[j])) <= step / 2 + 1e-12


def test_sq8_full_oversample_equals_exact_topk(vecs):
    """With k*oversample >= N-1 the candidate set is the whole corpus,
    so the exact re-rank must reproduce cosine_topk verbatim."""
    got = sim.sq8_topk(vecs, [3, 11], k=3, oversample=7).collect()
    want = sim.cosine_topk(vecs, [3, 11], k=3).collect()
    assert sorted(
        [(r["query_id"], r["neighbor_id"], r["cosine_sim"], r["rank"]) for r in got],
        key=lambda t: (t[0], t[3]),
    ) == sorted(
        [(r["query_id"], r["neighbor_id"], r["cosine_sim"], r["rank"]) for r in want],
        key=lambda t: (t[0], t[3]),
    )


def test_sq8_topk_matches_python_replica_at_small_oversample(vecs):
    """At oversample=1 the candidate band is tight enough that the
    quantization path matters: replicate encode -> asymmetric candidate
    ranking -> exact re-rank in python and demand identical output."""
    mn, mx, code, decode = _sq8_replica(VEC_CORPUS)
    k, q_id = 3, 9
    qv = VEC_CORPUS[q_id][1]
    cands = sorted(
        (
            (-_np_cosine(qv, decode(code(v))), i)
            for i, v in VEC_CORPUS
            if i != q_id
        ),
    )[: k * 1]
    rer = sorted(
        ((-round(_np_cosine(qv, VEC_CORPUS[i][1]), 6), i) for _, i in cands),
    )
    want = [(i, -s, rk + 1) for rk, (s, i) in enumerate(rer[:k])]
    got = [
        (r["neighbor_id"], r["cosine_sim"], r["rank"])
        for r in sim.sq8_topk(vecs, [q_id], k=k, oversample=1)
        .orderBy("rank")
        .collect()
    ]
    assert got == pytest.approx(want)


def test_sq8_frozen_bounds_clamp_and_constant_dim(spark):
    """Increments encoded against FROZEN bounds clamp out-of-range
    components instead of overflowing the byte; a constant dimension
    encodes 0 everywhere."""
    base = [(0, [0.0, 5.0]), (1, [1.0, 5.0])]
    df = spark.createDataFrame(base, ["vec_id", "embedding"])
    mn, mx = sim.sq8_bounds(df)
    assert mn == [0.0, 5.0] and mx == [1.0, 5.0]
    inc = spark.createDataFrame(
        [(2, [2.5, 5.0]), (3, [-1.0, 5.0])], ["vec_id", "embedding"]
    )
    got = {
        r["vec_id"]: list(r["codes"])
        for r in sim.sq8_quantize(inc, bounds=(mn, mx)).collect()
    }
    assert got[2] == [255 - 128, -128]  # clamped high, constant dim -> 0
    assert got[3] == [-128, -128]  # clamped low


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------


def _one(spark, text, col):
    return spark.range(1).select(col(F.lit(text)).alias("v")).first()["v"]


def test_token_counts(spark):
    assert _one(spark, "a  b\tc\nd ", tx.token_count) == 4
    assert _one(spark, "", tx.token_count) == 0
    # "don't" → don + ' + t ; "x2" → x + 2
    assert _one(spark, "don't x2", tx.bpe_ish_token_count) == 5


def test_lang_id_picks_stopword_majority(spark):
    assert _one(spark, "the cat and the dog is in it", tx.lang_id) == "en"
    assert _one(spark, "el perro y la casa es un gato", tx.lang_id) == "es"
    assert _one(spark, "xyzzy plugh", tx.lang_id) == "und"
    # tie between en ("the") and fr ("le") → lexicographic: en
    assert _one(spark, "the le", tx.lang_id) == "en"


def test_quality_metrics_values(spark):
    text = "The cat, the dog!"
    m = tx.quality_metrics(F.lit(text))
    row = spark.range(1).select(*[v.alias(k) for k, v in m.items()]).first()
    assert row["n_chars"] == len(text)
    assert row["n_words"] == 4
    # tokens: the cat, the dog! → lengths 3,4,3,4 (punct attached)
    assert row["avg_word_len"] == pytest.approx(14 / 4)
    assert row["punct_ratio"] == pytest.approx(round(2 / len(text), 6))
    assert row["stopword_ratio"] == pytest.approx(0.5)  # "the" ×2 of 4


def test_repetition_ratio(spark):
    col = lambda t: tx.repetition_ratio_tokens(tx.tokens(t))  # noqa: E731
    assert _one(spark, "a b c a b c a b c", col) == pytest.approx(1 - 3 / 7)
    assert _one(spark, "all words unique here now", col) == 0.0
    assert _one(spark, "too short", col) is None


def test_fingerprint_is_order_and_dup_insensitive(spark):
    f1 = _one(spark, "b a c a", tx.fingerprint)
    f2 = _one(spark, "c B A", tx.fingerprint)
    f3 = _one(spark, "c b a d", tx.fingerprint)
    assert f1 == f2 != f3
    assert f1 == hashlib.md5(b"a b c").hexdigest()


def test_rolling_min_hash_matches_python(spark):
    text = "one two three four five"
    want = min(py_h32(s) for s in py_shingles(text))
    assert _one(spark, text, tx.rolling_min_hash) == want
    assert _one(spark, "too short", tx.rolling_min_hash) is None


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------


def test_binary_metadata_matches_hashlib(spark, docs):
    media = mm.documents_as_media(docs)
    got = {r["media_id"]: r for r in mm.binary_metadata(media).collect()}
    for doc_id, text in DOCS:
        b = text.encode()
        assert got[doc_id]["n_bytes"] == len(b)
        assert got[doc_id]["sha256"] == hashlib.sha256(b).hexdigest()


def test_extract_features_fake_kernel(spark, docs):
    media = mm.documents_as_media(docs)
    got = {r["media_id"]: r for r in mm.extract_features(media).collect()}
    for doc_id, text in DOCS:
        b = text.encode()
        feat = got[doc_id]["feature"]
        assert feat[0] == float(len(b))
        assert feat[1] == pytest.approx(sum(b) / len(b))
        assert feat[2] == float(min(b)) and feat[3] == float(max(b))


def test_extract_features_real_decoder_is_marked_stub(spark, docs):
    media = mm.documents_as_media(docs)
    with pytest.raises(Exception, match="NotImplementedError|decode"):
        mm.extract_features(media, fake=False).collect()


def test_frame_sample_plan_counts(spark, docs):
    media = mm.documents_as_media(docs)
    got = (
        mm.frame_sample_plan(media, every_n=2)
        .groupBy("media_id")
        .count()
        .collect()
    )
    vids = {r["media_id"]: r["count"] for r in got}
    for doc_id, text in DOCS:
        if doc_id % 3 == 2:  # video/mp4 rows only
            n_frames = len(text.encode()) // 100 + 1
            assert vids[doc_id] == (n_frames + 1) // 2
        else:
            assert doc_id not in vids


def test_paragraph_dedup_matches_python_reference(spark):
    """Corpus-level exact paragraph dedup vs a direct Python replay of
    the contract: disjoint 10-word chunks, first occurrence by
    (doc_id, pos) wins corpus-wide, docs reassembled in order; a doc
    whose every paragraph lost disappears."""
    from solarboat_data_pipeline_spark.operators.dedup import paragraph_dedup

    texts = {
        0: "a b c d e f g h i j k l m n o p q r s t",      # 2 paras
        1: "a b c d e f g h i j x y z",                    # para0 dups doc0's
        2: "k l m n o p q r s t",                          # dups doc0's para1
        3: "fresh words only here nothing repeats at all ok fine",
        4: "a b c d e f g h i j",                          # fully duplicate
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["cleaned_text"], r["kept_paragraphs"])
        for r in paragraph_dedup(df).collect()
    }

    # python replay
    seen: set[str] = set()
    expect: dict[int, tuple[str, int]] = {}
    for did in sorted(texts):
        toks = texts[did].split(" ")
        kept = []
        for p in range((len(toks) + 9) // 10):
            para = " ".join(toks[p * 10 : p * 10 + 10])
            if para not in seen:
                seen.add(para)
                kept.append(para)
        if kept:
            expect[did] = (" ".join(kept), len(kept))

    assert got == expect
    assert 4 not in got            # fully-duplicate doc disappears
    assert got[1][0] == "x y z"    # only the fresh tail survives
    assert got[0][1] == 2          # the first doc keeps everything


def test_paragraph_dedup_guard_rails(spark):
    """Round-7 kernel contract guards: negative doc ids break the
    bit-packed winner ordering and must raise (never mis-rank
    silently); a regex-metacharacter separator splits literally
    (ADVICE r6 — F.split takes a Java regex, so '.' must be escaped)."""
    import pytest as _pytest

    from solarboat_data_pipeline_spark.operators.dedup import paragraph_dedup

    bad = spark.createDataFrame(
        [(-1, "a b c d e f g h i j")], "doc_id long, text string"
    )
    with _pytest.raises(Exception, match="id must be in"):
        paragraph_dedup(bad).collect()

    # ADVICE r7 (medium): ids >= 2^42 would overflow the non-ANSI
    # id*2^21 packing long and silently corrupt winner selection —
    # they must raise like the other violations.
    big = spark.createDataFrame(
        [(1 << 42, "a b c d e f g h i j")], "doc_id long, text string"
    )
    with _pytest.raises(Exception, match="id must be in"):
        paragraph_dedup(big).collect()
    # the largest legal id still packs and round-trips
    ok = spark.createDataFrame(
        [((1 << 42) - 1, "a b c d e f g h i j")], "doc_id long, text string"
    )
    row = paragraph_dedup(ok).collect()[0]
    assert row["doc_id"] == (1 << 42) - 1 and row["kept_paragraphs"] == 1

    docs = spark.createDataFrame(
        [(0, "a.b.c.d.e.f.g.h.i.j.a.b.c.d.e.f.g.h.i.j")],
        "doc_id long, text string",
    )
    row = paragraph_dedup(docs, sep=".").collect()[0]
    assert row["cleaned_text"] == "a.b.c.d.e.f.g.h.i.j"
    assert row["kept_paragraphs"] == 1


def test_paragraph_dedup_hash_lanes_independent(spark):
    """ADVICE r7 (high): Spark folds multi-column xxhash64 sequentially
    (each column hashed with the running value as seed), so
    xxhash64(para, lit('xx2')) == XX('xx2', seed=XX(para, 42)) is a
    PURE FUNCTION of lane 1 — any h1 collision implies an h2 collision
    and the pair has only 64-bit resistance. The kernel must therefore
    salt FIRST: xxhash64(lit('xx2'), para). Golden values pin the
    argument order so a swap cannot silently reappear."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("hello world",), ("a b c d e f g h i j",)], "s string"
    )
    got = {
        r["s"]: (r["salt_first"], r["salt_last"])
        for r in df.select(
            "s",
            F.xxhash64(F.lit("xx2"), F.col("s")).alias("salt_first"),
            F.xxhash64(F.col("s"), F.lit("xx2")).alias("salt_last"),
        ).collect()
    }
    # golden values (computed once, Spark 4.1): the two orders genuinely
    # differ, and the engine's fold direction hasn't changed under us
    assert got["hello world"] == (1378337019649179991, 6792064308563420400)
    assert got["a b c d e f g h i j"] == (
        -2785358961534219106, 8539089441610216492
    )

    # and the kernel itself uses the salt-first form: replaying the
    # digest pair over one unique paragraph per doc must key winners so
    # that both docs survive (sanity), while a direct probe of the
    # internal pair matches the salt-first golden
    from solarboat_data_pipeline_spark.operators.dedup import paragraph_dedup

    docs = spark.createDataFrame(
        [(0, "hello world"), (1, "goodbye world")], "doc_id long, text string"
    )
    assert {r["doc_id"] for r in paragraph_dedup(docs).collect()} == {0, 1}
    import inspect

    src = inspect.getsource(paragraph_dedup)
    assert 'F.xxhash64(F.lit("xx2"), F.col("para"))' in src


def test_near_dup_against_incremental_semantics(spark):
    """Incremental NEAR-dup dedup (round 7): an incoming doc drops when
    it band-collides with an indexed doc AND the signature Jaccard
    estimate clears the threshold; exact copies drop; unrelated docs
    and shingle-less docs survive; the verification step genuinely
    gates (a high threshold rescues a weak collision)."""
    import pytest as _pytest

    from solarboat_data_pipeline_spark.operators.dedup import (
        band_index,
        near_dup_against,
        signature_index,
    )

    base = ("the quick brown fox jumps over the lazy dog and then runs "
            "far away into the deep dark forest tonight")
    seen = spark.createDataFrame(
        [(1, base),
         (2, "completely unrelated corpus text about solar boats and "
             "battery telemetry decoding pipelines at scale")],
        "doc_id long, text string",
    )
    inc = spark.createDataFrame(
        [(10, base),                                     # exact copy
         (11, base.replace("tonight", "tomorrow")),      # near-dup
         (12, "nothing in common with anything indexed "
              "whatsoever in this entire corpus of words today"),
         (13, "tiny")],                                  # shingle-less
        "doc_id long, text string",
    )
    bands = band_index(seen)
    sigs = signature_index(seen)
    survivors = {
        r["doc_id"]
        for r in near_dup_against(
            inc, bands, seen_signatures=sigs, threshold=0.5
        ).collect()
    }
    assert 10 not in survivors          # exact copy dropped
    assert 11 not in survivors          # near-dup dropped
    assert {12, 13} <= survivors        # unrelated + shingle-less live

    # threshold gating is monotone: raising it can only rescue docs
    # (a one-word change CAN still estimate 1.0 with 16 hashes, so no
    # exact-value assumption here), and the exact copy never survives
    survivors_hi = {
        r["doc_id"]
        for r in near_dup_against(
            inc, bands, seen_signatures=sigs, threshold=1.0
        ).collect()
    }
    assert survivors <= survivors_hi
    assert 10 not in survivors_hi

    # band-only mode (no verification) must drop at least as much
    survivors_bands = {
        r["doc_id"] for r in near_dup_against(inc, bands).collect()
    }
    assert survivors_bands <= survivors

    # the two verification args travel together
    with _pytest.raises(ValueError, match="together"):
        near_dup_against(inc, bands, threshold=0.5)
    with _pytest.raises(ValueError, match="together"):
        near_dup_against(inc, bands, seen_signatures=sigs)


def test_ngram_topk_matches_python_counter(spark):
    rows = [
        (1, "a b c a b c a b c"),     # "a b c" x3 ... overlapping grams
        (2, "a b c d e"),
        (3, "x y z x y z"),
        (4, "a b c"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    from collections import Counter

    occ, docs_of = Counter(), {}
    for i, t in rows:
        toks = t.split()
        grams = [" ".join(toks[j : j + 3]) for j in range(len(toks) - 2)]
        occ.update(grams)
        for g in set(grams):
            docs_of.setdefault(g, set()).add(i)
    want = sorted(
        ((g, c, len(docs_of[g])) for g, c in occ.items()),
        key=lambda r: (-r[1], r[0]),
    )[:5]
    got = [
        (r["gram"], r["occurrences"], r["n_docs"])
        for r in tx.ngram_topk(df, k=5).collect()
    ]
    assert got == want  # ordered: TakeOrderedAndProject preserves it
    # "a b c": 3 overlapping occurrences in doc 1 + doc 2 + doc 4
    assert got[0] == ("a b c", 5, 3)


def test_ngram_topk_plan_is_take_ordered(spark):
    df = spark.createDataFrame([(1, "a b c d")], ["doc_id", "text"])
    plan = tx.ngram_topk(df, k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan


def test_id_range_predicate_properties(spark):
    """Property soak for the large-batch fetch predicate: for randomized
    sorted id sets and range budgets, the cover (1) contains every id,
    (2) uses at most max_ranges intervals, and (3) for numeric ids the
    kept splits are the widest gaps (minimum-slack cover)."""
    import random

    rng = random.Random(909)
    df = spark.range(0, 3000).withColumnRenamed("id", "neighbor_id")
    for trial in range(12):
        n = rng.randint(1, 400)
        ids = sorted(rng.sample(range(3000), n))
        max_ranges = rng.randint(1, 16)
        pred = sim._id_range_predicate(F.col("neighbor_id"), ids, max_ranges)
        got = sorted(r[0] for r in df.where(pred).collect())
        assert set(ids) <= set(got), (trial, n, max_ranges)
        # covered ids form at most max_ranges contiguous runs of the
        # value space restricted to [min, max]
        runs = 1
        for a, b in zip(got, got[1:]):
            if b != a + 1:
                runs += 1
        assert runs <= max_ranges, (trial, runs, max_ranges)
        # minimum slack: total cover size = n + sum of all gaps except
        # the (max_ranges - 1) widest (gap = ids[i] - ids[i-1] - 1)
        gaps = sorted(
            (ids[i] - ids[i - 1] - 1 for i in range(1, len(ids))),
            reverse=True,
        )
        kept_inside = sum(gaps[max(0, max_ranges - 1):])
        assert len(got) == len(ids) + kept_inside, (trial, n, max_ranges)


def test_sim_recall_eval_floors(spark, sf_dir):
    """The pruned ANN paths must retain real quality on the fixture, not
    just determinism: SQ8 (4x oversample + exact re-rank) is near-exact;
    IVF at nprobe=2/16 cells keeps a usable floor. Single-table
    hyperplane LSH measures ~0 recall@5 here (near-random embeddings
    rarely co-bucket with their true neighbors) — recorded, not
    floored: the row exists precisely to quantify why IVF/SQ8 are the
    recommended retrieval paths and LSH is the candidate-generation
    tool. Floors measured at sf0.001 with margin; the row itself is
    driver-gated for exactness."""
    from solarboat_data_pipeline_spark.driver.similarity import sim_recall_eval

    rows = sim_recall_eval(spark, sf_dir).collect()
    assert len(rows) == 10
    ivf = sum(r["ivf_recall"] for r in rows) / len(rows)
    sq8 = sum(r["sq8_recall"] for r in rows) / len(rows)
    lsh = sum(r["lsh_recall"] for r in rows) / len(rows)
    assert sq8 >= 0.9, f"SQ8 mean recall@5 regressed: {sq8}"
    assert ivf >= 0.5, f"IVF mean recall@5 regressed: {ivf}"
    assert 0.0 <= lsh <= 1.0  # recorded for visibility, no quality floor
