"""H.264 Baseline intra pixel codec (operators/h264.py): the bit-exact
decode==encoder-reconstruction invariant across all mode paths, the
lossless I_PCM lane, INDEPENDENT arithmetic validation of the §8.3
prediction formulas (exact propagation/affine-ramp identities derived
from the published spec, not from this implementation), envelope
boundaries, and adversarial inputs."""

from __future__ import annotations

import numpy as np
import pytest

from solarboat_data_pipeline_spark.operators import h264, mp4

RNG = np.random.default_rng(20260816)


def _planes(h, w, kind, seed=0):
    rng = np.random.default_rng(seed)
    if kind == "noise":
        y = rng.integers(0, 256, (h, w), dtype=np.uint8)
    elif kind == "ramp":
        y = ((np.arange(h)[:, None] * 3 + np.arange(w)[None, :] * 5 + seed) % 256).astype(np.uint8)
    elif kind == "const":
        y = np.full((h, w), 40 + seed % 200, np.uint8)
    else:  # blocks
        y = (rng.integers(0, 8, (h, w)) * 36).astype(np.uint8)
    cb = rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)
    cr = ((np.arange(h // 2)[:, None] + np.arange(w // 2)[None, :] * 2 + seed) % 256).astype(np.uint8)
    return y, cb, cr


# --- the core invariant: decode == encoder reconstruction, bit-exact --------


@pytest.mark.parametrize("force", [None, "pcm", "i4", "i16"])
@pytest.mark.parametrize("dims", [(16, 16), (32, 48), (34, 50), (18, 66)])
def test_decode_equals_encoder_reconstruction(force, dims):
    h, w = dims
    for kind in ("noise", "ramp", "const", "blocks"):
        frames = [_planes(h, w, kind, s) for s in (1, 2)]
        recon: list = []
        es = h264.encode_idr_frames(frames, w, h, force=force, recon_out=recon)
        out = h264.decode_annexb(es)
        assert (out["width"], out["height"]) == (w, h)
        assert len(out["frames"]) == 2
        for (dy, dcb, dcr), (ry, rcb, rcr) in zip(out["frames"], recon):
            assert np.array_equal(dy, ry), (force, kind)
            assert np.array_equal(dcb, rcb) and np.array_equal(dcr, rcr)


def test_ipcm_lane_is_lossless():
    h, w = 48, 64
    frames = [_planes(h, w, "noise", s) for s in (3, 4, 5)]
    es = h264.encode_idr_frames(frames, w, h, force="pcm")
    out = h264.decode_annexb(es)
    for (sy, scb, scr), (dy, dcb, dcr) in zip(frames, out["frames"]):
        assert np.array_equal(sy, dy)
        assert np.array_equal(scb, dcb) and np.array_equal(scr, dcr)
    # noise cannot be predicted: auto mode must also choose PCM everywhere
    es2 = h264.encode_idr_frames(frames, w, h)
    out2 = h264.decode_annexb(es2)
    assert all(t == h264.MB_IPCM for t in out2["mb_types"][0])
    assert np.array_equal(out2["frames"][0][0], frames[0][0])


# --- independent §8.3 arithmetic identities ----------------------------------
# These are derived from the PUBLISHED formulas, not from this code:
# a slope-4 affine ramp satisfies the plane predictors EXACTLY
# (5·H+32 = 2040·4+32 = 64·(32·4)/2 ... i.e. b' lands on exactly 32·b
# for b = 4, luma and chroma both), and content constant along columns
# (rows) is reproduced exactly by Vertical (Horizontal) prediction.
# With zero-residual encoding, auto mode must therefore achieve MAE 0
# on these inputs, PCM-seeding only the first row/column of MBs.


def test_plane_mode_reproduces_slope4_ramp_exactly():
    h, w = 32, 32
    xs = np.arange(w)[None, :]
    ys = np.arange(h)[:, None]
    y = (0 + 4 * xs + 4 * ys).astype(np.uint8)  # max 248, no clipping
    cxs = np.arange(w // 2)[None, :]
    cys = np.arange(h // 2)[:, None]
    cb = (0 + 4 * cxs + 4 * cys).astype(np.uint8)
    cr = (8 + 4 * cxs + 4 * cys).astype(np.uint8)
    # tight PCM floor: edge MBs (no corner -> plane illegal) must carry
    # exact PCM so the interior plane identity is tested in isolation
    es = h264.encode_idr_frames([(y, cb, cr)], w, h, pcm_mae=2.0)
    out = h264.decode_annexb(es)
    dy, dcb, dcr = out["frames"][0]
    assert np.array_equal(dy, y)
    assert np.array_equal(dcb, cb) and np.array_equal(dcr, cr)
    # MB (1,1) has top+left+corner: plane prediction (I_16x16 mode 3,
    # mb_type 4) must have won there with an exact (SAD 0) fit
    assert out["mb_types"][0][3] == 4


def test_vertical_and_horizontal_propagate_exactly():
    h, w = 32, 32
    col = (np.arange(w) * 7 % 256).astype(np.uint8)
    y_v = np.tile(col, (h, 1))  # constant along columns
    cb = np.full((h // 2, w // 2), 60, np.uint8)
    cr = np.full((h // 2, w // 2), 190, np.uint8)
    out = h264.decode_annexb(h264.encode_idr_frames([(y_v, cb, cr)], w, h))
    assert np.array_equal(out["frames"][0][0], y_v)
    # second MB row predicts from the first: Vertical (mb_type 1) wins
    assert out["mb_types"][0][2] == 1 or out["mb_types"][0][3] == 1
    row = (np.arange(h) * 11 % 256).astype(np.uint8)
    y_h = np.tile(row[:, None], (1, w))
    out = h264.decode_annexb(h264.encode_idr_frames([(y_h, cb, cr)], w, h))
    assert np.array_equal(out["frames"][0][0], y_h)
    # right MB of the first row predicts from the left: Horizontal wins
    assert out["mb_types"][0][1] == 2


def test_constant_frame_exact_with_single_pcm_seed():
    h, w = 48, 80
    y = np.full((h, w), 133, np.uint8)
    cb = np.full((h // 2, w // 2), 77, np.uint8)
    cr = np.full((h // 2, w // 2), 20, np.uint8)
    out = h264.decode_annexb(h264.encode_idr_frames([(y, cb, cr)], w, h))
    assert np.array_equal(out["frames"][0][0], y)
    assert np.array_equal(out["frames"][0][1], cb)
    assert np.array_equal(out["frames"][0][2], cr)
    # exactly ONE I_PCM macroblock (the top-left seed)
    assert sum(1 for t in out["mb_types"][0] if t == h264.MB_IPCM) == 1


def test_mixed_pcm_i16_nc_contexts():
    """A PCM macroblock contributes TotalCoeff=16 to its neighbors'
    nC (§9.2.1), pushing the next I_16x16 DC coeff_token into the
    nC>=8 / FLC context — the mix must round-trip bit-exactly."""
    h, w = 16, 64
    rng = np.random.default_rng(9)
    y = np.empty((h, w), np.uint8)
    y[:, :16] = rng.integers(0, 256, (16, 16))   # MB0 -> PCM (noise)
    y[:, 16:] = 99                               # MB1..3 -> predicted
    cb = np.full((h // 2, w // 2), 10, np.uint8)
    cr = np.full((h // 2, w // 2), 250, np.uint8)
    recon: list = []
    es = h264.encode_idr_frames([(y, cb, cr)], w, h, recon_out=recon)
    out = h264.decode_annexb(es)
    types = out["mb_types"][0]
    # the noise MB (and the first constant MB, whose only neighbor is
    # noise) carry PCM; the next I_16x16 DC token is therefore read in
    # the nC>=8 FLC context (left neighbor TotalCoeff=16)
    assert types[0] == h264.MB_IPCM and types[1] == h264.MB_IPCM
    assert types[2] == 2 and types[2] != h264.MB_IPCM
    assert np.array_equal(out["frames"][0][0], recon[0][0])
    assert np.array_equal(out["frames"][0][0], y)  # PCM seed + exact H chain


# --- envelope boundaries ------------------------------------------------------


def _sps_pps_prefix(w=16, h=16):
    return (
        b"\x00\x00\x00\x01" + mp4.encode_sps(w, h)
        + b"\x00\x00\x00\x01" + mp4.encode_pps(deblocking_control=True)
    )


def _slice_with(payload_bits) -> bytes:
    w = h264._SliceWriter()
    w.ue(0); w.ue(7); w.ue(0); w.u(0, 4); w.ue(0)
    w.u(0, 1); w.u(0, 1); w.se(0); w.ue(1)
    payload_bits(w)
    return b"\x00\x00\x00\x01\x65" + mp4._rbsp_to_nal(w.rbsp_trailing())


def test_nonzero_residual_raises_envelope_error():
    # I_16x16 DC mb_type with a coeff_token that is NOT TotalCoeff=0
    def bits(w):
        w.ue(1)      # mb_type: I_16x16, V pred, zero CBP
        w.ue(0)      # chroma DC
        w.se(0)      # mb_qp_delta
        w.u(0, 1)    # first bit 0 in nC<2 context => not the TC=0 code '1'
    with pytest.raises(ValueError, match="nonzero CAVLC residual"):
        h264.decode_annexb(_sps_pps_prefix() + _slice_with(bits))


def test_nonzero_cbp_raises_envelope_error():
    def bits(w):
        for _ in range(16):
            w.u(1, 1)  # all predicted modes
        w.ue(0)        # chroma mode
        w.ue(0)        # CBP codeNum 0 => cbp 47, not the zero codeword
    stream = _sps_pps_prefix() + _slice_with(lambda w: (w.ue(0), bits(w)))
    with pytest.raises(ValueError, match="coded_block_pattern"):
        h264.decode_annexb(stream)


def test_i16_with_coded_residual_mb_type_raises():
    def bits(w):
        w.ue(13)  # I_16x16 with CodedBlockPatternLuma = 15
    with pytest.raises(ValueError, match="nonzero CBP"):
        h264.decode_annexb(_sps_pps_prefix() + _slice_with(bits))


def test_foreign_pps_shapes_raise():
    # default PPS (no deblocking control) is outside the envelope
    es = b"\x00\x00\x00\x01" + mp4.encode_sps(16, 16) + b"\x00\x00\x00\x01" + mp4.encode_pps()
    with pytest.raises(ValueError, match="deblocking"):
        h264.decode_annexb(es + _slice_with(lambda w: w.ue(25)))


def test_non_idr_and_empty_raise():
    y, cb, cr = _planes(16, 16, "const")
    es = h264.encode_idr_frames([(y, cb, cr)], 16, 16)
    hacked = es.replace(b"\x00\x00\x00\x01\x65", b"\x00\x00\x00\x01\x61", 1)
    with pytest.raises(ValueError, match="non-IDR"):
        h264.decode_annexb(hacked)
    with pytest.raises(ValueError):
        h264.decode_annexb(_sps_pps_prefix())  # no IDR pictures
    with pytest.raises(ValueError):
        h264.decode_annexb(b"")


def test_encoder_input_validation():
    y, cb, cr = _planes(16, 16, "const")
    with pytest.raises(ValueError, match="even"):
        h264.encode_idr_frames([(y, cb, cr)], 15, 16)
    with pytest.raises(ValueError, match="shape"):
        h264.encode_idr_frames([(y, cb, cr)], 32, 16)
    with pytest.raises(ValueError, match="half-size"):
        h264.encode_idr_frames([(y, cb[:2], cr)], 16, 16)


def test_mutation_truncation_fuzz_only_value_errors():
    y, cb, cr = _planes(32, 48, "blocks", 6)
    base = h264.encode_idr_frames([(y, cb, cr)], 48, 32)
    rnd = np.random.default_rng(20260816)
    for _ in range(800):
        if rnd.integers(0, 2):
            data = base[: int(rnd.integers(0, len(base)))]
        else:
            b = bytearray(base)
            for _ in range(int(rnd.integers(1, 10))):
                b[int(rnd.integers(0, len(b)))] = int(rnd.integers(0, 256))
            data = bytes(b)
        try:
            h264.decode_annexb(data)
        except ValueError:
            pass  # the ONLY permitted failure mode


# --- Spark lane ---------------------------------------------------------------


def test_decode_h264_stats_spark(spark):
    from solarboat_data_pipeline_spark.operators import multimodal as mm

    docs = spark.range(0, 36).withColumnRenamed("id", "doc_id")
    rows = {
        r["media_id"]: r
        for r in mm.decode_h264_stats(mm.synthesize_h264_idr_media(docs)).collect()
    }
    assert len(rows) == 36
    for mid, r in rows.items():
        p = mm._h264_params(mid)
        assert (r["width"], r["height"]) == (p["width"], p["height"])
        assert r["n_frames"] == p["n_frames"]
        mbs = ((p["width"] + 15) // 16) * ((p["height"] + 15) // 16)
        assert r["n_mb"] == mbs * p["n_frames"]
        want_y = want_cb = want_cr = 0
        for fi in range(p["n_frames"]):
            y, cb, cr = mm._h264_frame(mid, fi, p["width"], p["height"], p["lane"])
            want_y += int(y.astype(np.int64).sum())
            want_cb += int(cb.astype(np.int64).sum())
            want_cr += int(cr.astype(np.int64).sum())
        assert (r["y_sum"], r["cb_sum"], r["cr_sum"]) == (want_y, want_cb, want_cr)


def test_lanes_actually_exercise_prediction():
    """Guard against the oracle becoming vacuous: lanes 1 and 2 must
    decode through PREDICTED macroblocks (not wall-to-wall PCM)."""
    from solarboat_data_pipeline_spark.operators import multimodal as mm

    seen_pred = {1: False, 2: False}
    seen_kinds = set()
    for mid in range(36):
        p = mm._h264_params(mid)
        frames = [
            mm._h264_frame(mid, fi, p["width"], p["height"], p["lane"])
            for fi in range(p["n_frames"])
        ]
        es = h264.encode_idr_frames(frames, p["width"], p["height"], pcm_mae=0.0)
        out = h264.decode_annexb(es)
        types = [t for ts in out["mb_types"] for t in ts]
        if p["lane"] in seen_pred and any(t != h264.MB_IPCM for t in types):
            seen_pred[p["lane"]] = True
        seen_kinds.update(types)
    assert seen_pred[1] and seen_pred[2]


# --- container-to-pixels (MP4 with REAL coded samples) ------------------------


def _mp4_with_real_samples(frames, w, h, **enc_kw):
    return mp4.annexb_to_mp4(h264.encode_idr_frames(frames, w, h, **enc_kw))


def test_decode_mp4_equals_annexb_decode():
    h, w = 32, 48
    frames = [_planes(h, w, k, s) for s, k in enumerate(("ramp", "blocks", "const"))]
    data = _mp4_with_real_samples(frames, w, h)
    got = h264.decode_mp4(data)
    want = h264.decode_annexb(h264.encode_idr_frames(frames, w, h))
    assert (got["width"], got["height"]) == (w, h)
    assert got["mb_types"] == want["mb_types"]
    for (gy, gcb, gcr), (wy, wcb, wcr) in zip(got["frames"], want["frames"]):
        assert np.array_equal(gy, wy)
        assert np.array_equal(gcb, wcb) and np.array_equal(gcr, wcr)
    # the container is ALSO a fully probeable MP4: real avcC dims,
    # per-sample seek table slicing exactly the coded pictures
    info = mp4.probe_mp4(data)
    assert (info["coded_width"], info["coded_height"]) == (w, h)
    assert info["n_samples"] == 3
    idx = mp4.sample_index(data)
    for r in idx:
        sample = data[r["offset"] : r["offset"] + r["size"]]
        n = int.from_bytes(sample[:4], "big")
        assert n == len(sample) - 4 and sample[4] == 0x65  # one IDR NAL each


def test_extract_avcc_and_param_sets_roundtrip():
    h, w = 16, 32
    frames = [_planes(h, w, "const", 1)]
    data = _mp4_with_real_samples(frames, w, h)
    cfg = mp4.parse_avcc(mp4.extract_avcc(data))
    assert cfg["length_size"] == 4
    assert len(cfg["sps_nals"]) == 1 and len(cfg["pps_nals"]) == 1
    sps_info = mp4.parse_sps(cfg["sps_nals"][0])
    assert (sps_info["width"], sps_info["height"]) == (w, h)
    with pytest.raises(ValueError):
        mp4.extract_avcc(b"\x00\x00\x00\x08ftyp")


def test_decode_mp4_malformed_samples_raise():
    h, w = 16, 16
    frames = [_planes(h, w, "const", 1)]
    data = bytearray(_mp4_with_real_samples(frames, w, h))
    # corrupt the first sample's NAL length prefix to overrun
    idx = mp4.sample_index(bytes(data))
    off = idx[0]["offset"]
    data[off : off + 4] = (10**6).to_bytes(4, "big")
    with pytest.raises(ValueError, match="overruns the sample|overruns the file"):
        h264.decode_mp4(bytes(data))


def test_decode_mp4_spark_lane(spark):
    from solarboat_data_pipeline_spark.operators import multimodal as mm

    docs = spark.range(0, 24).withColumnRenamed("id", "doc_id")
    mp4_rows = {
        r["media_id"]: r
        for r in mm.decode_mp4_h264_stats(
            mm.synthesize_h264_mp4_media(docs)
        ).collect()
    }
    raw_rows = {
        r["media_id"]: r
        for r in mm.decode_h264_stats(
            mm.synthesize_h264_idr_media(docs)
        ).collect()
    }
    assert len(mp4_rows) == 24
    for mid in mp4_rows:
        a, b = mp4_rows[mid], raw_rows[mid]
        assert a.asDict() == b.asDict()  # container path == Annex-B path


def test_redundant_pic_cnt_pps_raises():
    # a PPS with redundant_pic_cnt_present_flag would silently misalign
    # every slice-header parse — it must be rejected at PPS parse time
    from solarboat_data_pipeline_spark.operators.mp4 import _BitWriter, _rbsp_to_nal

    w = _BitWriter()
    w.ue(0); w.ue(0); w.u(0, 1); w.u(0, 1); w.ue(0)
    w.ue(0); w.ue(0); w.u(0, 1); w.u(0, 2)
    w.se(0); w.se(0); w.se(0)
    w.u(1, 1)  # deblocking control present
    w.u(0, 1)  # constrained_intra_pred
    w.u(1, 1)  # redundant_pic_cnt_present_flag = 1
    pps = b"\x68" + _rbsp_to_nal(w.rbsp_trailing())
    es = b"\x00\x00\x00\x01" + mp4.encode_sps(16, 16) + b"\x00\x00\x00\x01" + pps
    with pytest.raises(ValueError, match="redundant_pic_cnt"):
        h264.decode_annexb(es + _slice_with(lambda s: s.ue(25)))


def test_annexb_to_mp4_requires_param_sets():
    with pytest.raises(ValueError, match="no SPS/PPS"):
        mp4.annexb_to_mp4(b"\x00\x00\x00\x01\x65\x88\x84")
