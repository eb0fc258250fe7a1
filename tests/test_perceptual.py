"""Perceptual near-dup lane (operators/perceptual.py): dHash decode
parity against the cell formula, invariance under re-encode/resize,
planted-group recovery that exact sha256 dedup provably misses, exact
banded recall vs the brute-force all-pairs reference, and the plan
audit (banded equi-join, no cartesian)."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from solarboat_data_pipeline_spark.operators import perceptual as pc
from solarboat_data_pipeline_spark.operators import png as png_codec


def _docs(spark, n):
    return spark.range(0, n).withColumnRenamed("id", "doc_id")


def _formula_hash(g: int, v: int) -> int:
    cx = np.arange(pc.PHASH_CELL_W, dtype=np.int64)[None, :]
    cy = np.arange(pc.PHASH_CELL_H, dtype=np.int64)[:, None]
    cells = pc._phash_cell(g, cx, cy)
    if v == 3:
        cells = cells.copy()
        r, c = g % pc.PHASH_CELL_H, g % pc.PHASH_CELL_W
        cells[r, c] = (cells[r, c] + 97) % 256
    bits = (cells[:, 1:] > cells[:, :-1]).astype(np.uint64)
    ph = 0
    for r in range(pc.DHASH_GRID_H):
        for c in range(pc.DHASH_GRID_W):
            ph |= int(bits[r, c]) << (r * pc.DHASH_GRID_W + c)
    return ph


def test_dhash_decode_matches_cell_formula(spark):
    """The hash of the DECODED bytes (full PNG round trip, all five
    filters + Adam7 on the v=1 variant) equals the pure cell-formula
    hash — the arithmetic the driver oracle relies on."""
    media = pc.synthesize_phash_media(_docs(spark, 48))
    got = {r["media_id"]: r["phash"] for r in pc.dhash_table(media).collect()}
    assert got == {mid: _formula_hash(mid // 4, mid % 4) for mid in range(48)}


def test_dhash_invariant_under_reencode_and_resize(spark):
    """v=0 (original), v=1 (different filters + interlace), v=2 (half
    resolution) hash IDENTICALLY; v=3 (one-cell edit) stays within
    Hamming 2 — while all four payloads are byte-distinct, so exact
    content dedup can never find these groups."""
    media = pc.synthesize_phash_media(_docs(spark, 40)).collect()
    payloads = {r["media_id"]: bytes(r["payload"]) for r in media}
    hashes = {mid: _formula_hash(mid // 4, mid % 4) for mid in payloads}
    for g in range(10):
        ids = [g * 4 + v for v in range(4)]
        assert hashes[ids[0]] == hashes[ids[1]] == hashes[ids[2]]
        assert bin(hashes[ids[0]] ^ hashes[ids[3]]).count("1") <= 2
        digests = {hashlib.sha256(payloads[i]).hexdigest() for i in ids}
        assert len(digests) == 4  # every variant re-encodes differently


def test_planted_groups_recovered_exactly(spark):
    pairs = pc.phash_near_dup_pairs(
        pc.synthesize_phash_media(_docs(spark, 80))
    )
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    want = {
        (g * 4 + i, g * 4 + j)
        for g in range(20)
        for i in range(4)
        for j in range(i + 1, 4)
        if bin(
            _formula_hash(g, i) ^ _formula_hash(g, j)
        ).count("1") <= 2
    }
    # every within-group pair under the threshold is found...
    assert want <= got
    # ...and anything extra is a genuine cross-group hash collision the
    # brute-force reference also reports (none expected at this size)
    hashes = {mid: _formula_hash(mid // 4, mid % 4) for mid in range(80)}
    brute = {
        (a, b)
        for a in range(80)
        for b in range(a + 1, 80)
        if bin(hashes[a] ^ hashes[b]).count("1") <= 2
    }
    assert got == brute  # exact recall AND exact precision vs all-pairs


def test_banded_recall_is_exact_vs_bruteforce(spark):
    """Pigeonhole guarantee end-to-end: banded candidates ∩ ham<=2 ==
    all-pairs ham<=2, on signatures adversarially packed near the
    threshold (random 63-bit values plus planted distance-1/2/3
    neighbors — distance 3 must be EXCLUDED by the filter)."""
    rng = np.random.RandomState(7)
    sigs = []
    for i in range(30):
        base = int(rng.randint(0, 2**31)) | (int(rng.randint(0, 2**31)) << 31)
        sigs.append(base)
        for d in (1, 2, 3):
            flip = 0
            for b in rng.choice(63, size=d, replace=False):
                flip |= 1 << int(b)
            sigs.append(base ^ flip)
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(sigs)], "media_id long, phash long"
    )
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in pc.banded_hamming_pairs(df, max_hamming=2).collect()
    }
    brute = {
        (a, b, bin(sigs[a] ^ sigs[b]).count("1"))
        for a in range(len(sigs))
        for b in range(a + 1, len(sigs))
        if bin(sigs[a] ^ sigs[b]).count("1") <= 2
    }
    assert got == brute


def test_pair_join_plan_is_banded_equijoin(spark):
    """No all-pairs join anywhere: the pair join must be a hash
    equi-join on (band, key) — never a cartesian/nested-loop product."""
    media = pc.synthesize_phash_media(_docs(spark, 16))
    plan = (
        pc.phash_near_dup_pairs(media)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_banded_hamming_pairs_parameter_validation(spark):
    df = spark.createDataFrame([(0, 5)], "media_id long, phash long")
    with pytest.raises(ValueError, match="evenly divide"):
        pc.banded_hamming_pairs(df, bits=63, bands=4)
    with pytest.raises(ValueError, match="exact recall"):
        pc.banded_hamming_pairs(df, max_hamming=3, bands=3)


def test_pooled_features_equal_cell_values(spark):
    """The exact average-pool of the DECODED pixels equals the cell
    formula (piecewise-constant corpus): the arithmetic the retrieval
    oracle replays, at both native and half resolution."""
    media = pc.synthesize_phash_media(_docs(spark, 24))
    got = {
        r["vec_id"]: r["embedding"]
        for r in pc.pooled_cell_features(media).collect()
    }
    cx = np.arange(pc.PHASH_CELL_W, dtype=np.int64)[None, :]
    cy = np.arange(pc.PHASH_CELL_H, dtype=np.int64)[:, None]
    for mid in range(24):
        g, v = mid // 4, mid % 4
        cells = pc._phash_cell(g, cx, cy)
        if v == 3:
            cells = cells.copy()
            r, c = g % pc.PHASH_CELL_H, g % pc.PHASH_CELL_W
            cells[r, c] = (cells[r, c] + 97) % 256
        assert got[mid] == [float(x) for x in cells.ravel()]


def test_media_retrieval_composition_dpp_and_selfmatch(spark, tmp_path):
    """Media→ANN end-to-end: decoded-pixel features → trained persisted
    IVF → indexed probe. The probe plan must show dynamic partition
    pruning on the cell scan, and every query's top hit must be one of
    its byte-distinct perceptual duplicates at cosine 1.0 (v0/v1/v2
    share exact feature vectors)."""
    from solarboat_data_pipeline_spark.operators import similarity as sim

    media = pc.synthesize_phash_media(_docs(spark, 48))
    feats = pc.pooled_cell_features(media)
    idx = str(tmp_path / "media_ivf")
    sim.build_ivf_index(feats, idx, n_centroids=8, train_iters=2)
    qv = feats.where(F.col("vec_id") < 8)
    out = sim.ivf_topk_indexed(spark, idx, qv, k=3, nprobe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan, plan
    top = {r["query_id"]: r for r in out.where(F.col("rank") == 1).collect()}
    for qid in range(8):
        r = top[qid]
        if qid % 4 != 3:  # v0/v1/v2 have byte-distinct EXACT twins
            assert r["cosine_sim"] == 1.0
        assert r["neighbor_id"] // 4 == qid // 4  # a planted duplicate


def test_incremental_index_matches_bruteforce_and_never_rehashes(spark, tmp_path):
    """phash_band_index persisted to parquet + phash_near_dup_against
    over an increment == brute-force (incoming × corpus) Hamming<=2
    from the formula hashes; the corpus media table is NOT an input to
    the query side (only the 32-byte index rows are)."""
    corpus_ids = [i for i in range(60) if i % 5 != 0]
    inc_ids = [i for i in range(60) if i % 5 == 0]
    corpus = pc.synthesize_phash_media(
        spark.createDataFrame([(i,) for i in corpus_ids], "doc_id long")
    )
    incoming = pc.synthesize_phash_media(
        spark.createDataFrame([(i,) for i in inc_ids], "doc_id long")
    )
    path = str(tmp_path / "phash_idx")
    pc.phash_band_index(pc.dhash_table(corpus)).write.parquet(path)
    got = {
        (r["inc_id"], r["seen_id"]): r["hamming"]
        for r in pc.phash_near_dup_against(
            incoming, spark.read.parquet(path)
        ).collect()
    }
    hashes = {i: _formula_hash(i // 4, i % 4) for i in range(60)}
    want = {
        (a, b): bin(hashes[a] ^ hashes[b]).count("1")
        for a in inc_ids
        for b in corpus_ids
        if bin(hashes[a] ^ hashes[b]).count("1") <= 2
    }
    assert got == want and want  # non-trivial: planted groups span the split


def test_incremental_against_validates_params(spark):
    df = spark.createDataFrame([(0, 5, 0, 5)], "media_id long, phash long, band int, key long")
    media = pc.synthesize_phash_media(_docs(spark, 4))
    with pytest.raises(ValueError, match="exact recall"):
        pc.phash_near_dup_against(media, df, max_hamming=3, bands=3)
    sig = spark.createDataFrame([(0, 5)], "media_id long, phash long")
    with pytest.raises(ValueError, match="evenly divide"):
        pc.phash_band_index(sig, bits=63, bands=4)


def test_jpeg_reencode_lands_within_hamming_threshold(spark):
    """Cross-FORMAT near-dup: a lossy baseline-JPEG re-encode of each
    PNG original must hash within the join's Hamming<=2 threshold, so
    the banded join pairs the two formats (measured drift on 400
    images: 383 exact, max 2 — quantization shifts a cell sum at most
    past a near-tie). sha256 sees completely unrelated bytes."""
    from solarboat_data_pipeline_spark.operators import jpeg

    rows = []
    for g in range(12):
        cx = np.arange(pc.PHASH_CELL_W, dtype=np.int64)[None, :]
        cy = np.arange(pc.PHASH_CELL_H, dtype=np.int64)[:, None]
        px = np.repeat(
            np.repeat(pc._phash_cell(g, cx, cy), 4, 0), 4, 1
        ).astype(np.uint8)
        h, w = px.shape
        rows.append((2 * g, bytearray(png_codec.encode_png(px.tobytes(), w, h, 1))))
        rows.append((2 * g + 1, bytearray(jpeg.encode_jpeg(px.tobytes(), w, h, 1))))
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    pairs = {
        (r["id_a"], r["id_b"])
        for r in pc.phash_near_dup_pairs(media).collect()
    }
    for g in range(12):
        assert (2 * g, 2 * g + 1) in pairs  # PNG↔JPEG twin recovered


def test_clusters_scaled_equals_pairs_path(spark):
    """phash_clusters_scaled (exact-class collapse first) must be
    row-identical to clustering the materialized pair set — on the
    planted corpus AND on a duplicate-heavy corpus with a 300-copy
    class, cross-class near-dups, and a far singleton (excluded by
    both)."""
    from solarboat_data_pipeline_spark.operators import dedup as dd

    media = pc.synthesize_phash_media(_docs(spark, 60))
    naive = {
        (r["media_id"], r["cluster_id"])
        for r in dd.connected_components(pc.phash_near_dup_pairs(media))
        .withColumnRenamed("doc_id", "media_id")
        .collect()
    }
    scaled = {
        (r["media_id"], r["cluster_id"])
        for r in pc.phash_clusters_scaled(media).collect()
    }
    assert scaled == naive and naive

    # duplicate-heavy: ids 0..299 all carry group 5's v0 image (one
    # exact class), 300/301 carry near-dup variants of it, 302 carries
    # a different group (its own singleton class — excluded)
    def img(g, v):
        cx = np.arange(pc.PHASH_CELL_W, dtype=np.int64)[None, :]
        cy = np.arange(pc.PHASH_CELL_H, dtype=np.int64)[:, None]
        cells = pc._phash_cell(g, cx, cy)
        if v == 3:
            cells = cells.copy()
            r, c = g % pc.PHASH_CELL_H, g % pc.PHASH_CELL_W
            cells[r, c] = (cells[r, c] + 97) % 256
        px = np.repeat(np.repeat(cells, 4, 0), 4, 1).astype(np.uint8)
        h, w = px.shape
        return bytearray(png_codec.encode_png(px.tobytes(), w, h, 1))

    rows = [(i, img(5, 0)) for i in range(300)]
    rows += [(300, img(5, 3)), (301, img(5, 3)), (302, img(40, 0))]
    skewed = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        (r["media_id"], r["cluster_id"])
        for r in pc.phash_clusters_scaled(skewed).collect()
    }
    # ham(group5 v0, v3) <= 2: all 302 cluster to min id 0; 302 excluded
    assert got == {(i, 0) for i in range(302)}


# --- audio fingerprint --------------------------------------------------------


def _audio_fp_formula(g: int, v: int) -> int:
    n = g % 480 + 64
    s = pc._audio_dup_samples(g, n) * (2 if v in (2, 3) else 1)
    if v == 3:
        s = s.copy()
        s[g % n] += 1009
    S = pc.AUDIO_FP_SEGMENTS
    edges = (np.arange(S + 1, dtype=np.int64) * n) // S
    segs = np.add.reduceat(s, edges[:-1])
    bits = (segs[1:] > segs[:-1]).astype(np.uint64)
    return sum(int(bits[k]) << k for k in range(S - 1))


def test_audio_fingerprint_decode_matches_formula(spark):
    """The fingerprint of the DECODED WAV bytes (full RIFF round trip
    incl. the remuxed LIST-chunk and stereo variants) equals the pure
    formula fingerprint — the arithmetic the driver oracle replays."""
    media = pc.synthesize_audio_dup_media(_docs(spark, 32))
    got = {
        r["media_id"]: r["afp"]
        for r in pc.audio_fingerprint_table(media).collect()
    }
    assert got == {m: _audio_fp_formula(m // 4, m % 4) for m in range(32)}


def test_audio_dup_variants_invariant_and_byte_distinct(spark):
    """Remux / stereo-duplicate / gain are fingerprint-invariant (gain
    + channel-sum scale both sides of every comparison) while all four
    payloads are byte-distinct — the transforms sha256 dedup misses."""
    media = {
        r["media_id"]: bytes(r["payload"])
        for r in pc.synthesize_audio_dup_media(_docs(spark, 40)).collect()
    }
    for g in range(10):
        fps = [_audio_fp_formula(g, v) for v in range(4)]
        assert fps[0] == fps[1] == fps[2]
        assert bin(fps[0] ^ fps[3]).count("1") <= 2
        assert len({hashlib.sha256(media[g * 4 + v]).hexdigest()
                    for v in range(4)}) == 4


def test_audio_near_dup_recovers_planted_groups(spark):
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in pc.audio_near_dup_pairs(
            pc.synthesize_audio_dup_media(_docs(spark, 48))
        ).collect()
    }
    fps = {m: _audio_fp_formula(m // 4, m % 4) for m in range(48)}
    brute = {
        (a, b): bin(fps[a] ^ fps[b]).count("1")
        for a in range(48)
        for b in range(a + 1, 48)
        if bin(fps[a] ^ fps[b]).count("1") <= 2
    }
    assert got == brute
    for g in range(12):  # all six within-group pairs present
        for i in range(4):
            for j in range(i + 1, 4):
                assert (g * 4 + i, g * 4 + j) in got


# --- video fingerprint ---------------------------------------------------------


def _video_fp_formula(g: int, v: int) -> int:
    cx = np.arange(pc.PHASH_CELL_W, dtype=np.int64)[None, :]
    cy = np.arange(pc.PHASH_CELL_H, dtype=np.int64)[:, None]
    cells = pc._video_dup_cells(g, cx, cy)
    if v == 3:
        cells = cells.copy()
        r, c = g % pc.PHASH_CELL_H, g % pc.PHASH_CELL_W
        cells[r, c] = (cells[r, c] + 97) % 200
    bits = (cells[:, 1:] > cells[:, :-1]).astype(np.uint64)
    return sum(
        int(bits[r, c]) << (r * pc.DHASH_GRID_W + c)
        for r in range(pc.DHASH_GRID_H)
        for c in range(pc.DHASH_GRID_W)
    )


def test_video_fingerprint_decode_matches_formula(spark):
    """The fingerprint of DECODED AVI frames (full RIFF/DIB round trip:
    brightness fade, frame drops, re-exposure, edits) equals the pure
    cell-formula fingerprint — the arithmetic the driver oracle
    replays — and the four variants are byte-distinct."""
    media = pc.synthesize_video_dup_media(_docs(spark, 32)).collect()
    payloads = {r["media_id"]: bytes(r["payload"]) for r in media}
    got = {
        r["media_id"]: r["vfp"]
        for r in pc.video_fingerprint_table(
            spark.createDataFrame(
                [(m, bytearray(p)) for m, p in payloads.items()],
                "media_id long, payload binary",
            )
        ).collect()
    }
    assert got == {m: _video_fp_formula(m // 4, m % 4) for m in payloads}
    for g in range(8):
        assert len({hashlib.sha256(payloads[g * 4 + v]).hexdigest()
                    for v in range(4)}) == 4


def test_video_majority_fold_on_heterogeneous_frames(spark):
    """The majority fold itself (not exercised by the planted corpus,
    whose frames share one hash): 5 frames where 3 carry pattern A and
    2 carry pattern B must fingerprint as A bit-for-bit; ties (2 of 4)
    must resolve to 0."""
    from solarboat_data_pipeline_spark.operators import avi

    cx = np.arange(pc.PHASH_CELL_W, dtype=np.int64)[None, :]
    cy = np.arange(pc.PHASH_CELL_H, dtype=np.int64)[:, None]
    a = pc._video_dup_cells(3, cx, cy)
    b = pc._video_dup_cells(7, cx, cy)

    def clip(patterns):
        frames = np.stack(
            [np.repeat(np.repeat(p, 4, 0), 4, 1) for p in patterns]
        ).astype(np.uint8)
        return avi.encode_avi(
            np.repeat(frames[:, :, :, None], 3, axis=3), codec="rgb"
        )

    def fp_of(data):
        df = spark.createDataFrame(
            [(0, bytearray(data))], "media_id long, payload binary"
        )
        return pc.video_fingerprint_table(df).collect()[0]["vfp"]

    def hash_of(cells):
        bits = (cells[:, 1:] > cells[:, :-1]).astype(np.uint64)
        return sum(
            int(bits[r, c]) << (r * 9 + c)
            for r in range(7) for c in range(9)
        )

    assert fp_of(clip([a, b, a, b, a])) == hash_of(a)  # 3-of-5 majority
    # exact tie (2 A + 2 B): only bits set in BOTH survive (>n/2 fails)
    assert fp_of(clip([a, a, b, b])) == hash_of(a) & hash_of(b)


def test_h264_mp4_reencode_pairs_with_raw_avi(spark):
    """Cross-CONTAINER, cross-CODEC duplicate: a lossless (I_PCM)
    H.264-in-MP4 re-encode of a raw BI_RGB AVI clip fingerprints
    IDENTICALLY (the decoded Y plane equals the AVI's fixed-point luma
    of gray RGB exactly) and the banded join pairs the two at Hamming
    0 — the duplicate shape sha256 dedup can never see. Composes the
    perceptual lane with the full H.264 pixel-decode lane
    (avcC → seek table → NAL unpack → intra decode)."""
    from solarboat_data_pipeline_spark.operators import avi, h264, mp4

    cx = np.arange(pc.PHASH_CELL_W, dtype=np.int64)[None, :]
    cy = np.arange(pc.PHASH_CELL_H, dtype=np.int64)[:, None]
    rows = []
    for g in range(4):
        cells = pc._video_dup_cells(g, cx, cy)
        planes = [
            np.repeat(np.repeat(cells, 4, 0), 4, 1) + 3 * i
            for i in range(5)
        ]
        rgb = np.stack(
            [np.repeat(p[:, :, None], 3, axis=2) for p in planes]
        ).astype(np.uint8)
        rows.append((2 * g, bytearray(avi.encode_avi(rgb, codec="rgb"))))
        h, w = planes[0].shape
        frames = [
            (
                p.astype(np.uint8),
                np.full((h // 2, w // 2), 128, np.uint8),
                np.full((h // 2, w // 2), 128, np.uint8),
            )
            for p in planes
        ]
        es = h264.encode_idr_frames(frames, w, h, force="pcm")
        rows.append((2 * g + 1, bytearray(mp4.annexb_to_mp4(es))))
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    fps = {
        r["media_id"]: r["vfp"]
        for r in pc.video_fingerprint_table(media).collect()
    }
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in pc.video_near_dup_pairs(media).collect()
    }
    for g in range(4):
        assert fps[2 * g] == fps[2 * g + 1] == _video_fp_formula(g, 0)
        assert pairs[(2 * g, 2 * g + 1)] == 0


def test_video_near_dup_recovers_planted_groups(spark):
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in pc.video_near_dup_pairs(
            pc.synthesize_video_dup_media(_docs(spark, 48))
        ).collect()
    }
    fps = {m: _video_fp_formula(m // 4, m % 4) for m in range(48)}
    brute = {
        (x, y): bin(fps[x] ^ fps[y]).count("1")
        for x in range(48)
        for y in range(x + 1, 48)
        if bin(fps[x] ^ fps[y]).count("1") <= 2
    }
    assert got == brute
    for g in range(12):
        for i in range(4):
            for j in range(i + 1, 4):
                assert (g * 4 + i, g * 4 + j) in got


# --- property tests: arbitrary content, not just the planted corpus ----------


def _local_dhash_from_gray(gray: np.ndarray) -> int:
    h, w = gray.shape
    gw, gh = pc.DHASH_GRID_W, pc.DHASH_GRID_H
    bw, bh = w // (gw + 1), h // gh
    sums = gray.astype(np.int64).reshape(gh, bh, gw + 1, bw).sum(axis=(1, 3))
    bits = (sums[:, 1:] > sums[:, :-1]).astype(np.uint64)
    return sum(
        int(bits[r, c]) << (r * gw + c) for r in range(gh) for c in range(gw)
    )


@pytest.mark.parametrize("seed", range(6))
def test_dhash_property_arbitrary_gray_and_rgb_images(spark, seed):
    """dhash_table == the independent local reference on RANDOM pixel
    content (not grid-constant) across PNG filters, Adam7, RGB
    (fixed-point luma), and JPEG-lossless-equivalent... gray JPEG is
    lossy so only PNG forms assert exact equality here."""
    from solarboat_data_pipeline_spark.operators import png as png_codec

    rng = np.random.RandomState(1000 + seed)
    rows, want = [], {}
    for i in range(8):
        scale = int(rng.randint(1, 5))
        w, h = 10 * scale, 7 * scale
        if i % 2 == 0:
            px = rng.randint(0, 256, (h, w)).astype(np.uint8)
            data = png_codec.encode_png(
                px.tobytes(), w, h, 1,
                filter_type="cycle" if i % 4 == 0 else int(rng.randint(0, 5)),
                interlace=bool(i % 3 == 0),
            )
            gray = px.astype(np.int64)
        else:
            px = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
            data = png_codec.encode_png(
                px.tobytes(), w, h, 3, filter_type=int(rng.randint(0, 5))
            )
            gray = (
                77 * px[:, :, 0].astype(np.int64)
                + 150 * px[:, :, 1].astype(np.int64)
                + 29 * px[:, :, 2].astype(np.int64)
            ) >> 8
        mid = seed * 8 + i
        rows.append((mid, bytearray(data)))
        want[mid] = _local_dhash_from_gray(gray)
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r["phash"] for r in pc.dhash_table(df).collect()}
    assert got == want


def test_dhash_rejects_off_grid_dimensions(spark):
    px = np.zeros((8, 8), dtype=np.uint8)
    bad = png_codec.encode_png(px.tobytes(), 8, 8, 1)
    df = spark.createDataFrame([(0, bytearray(bad))], "media_id long, payload binary")
    with pytest.raises(Exception, match="dHash grid"):
        pc.dhash_table(df).collect()
