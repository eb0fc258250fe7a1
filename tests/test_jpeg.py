"""Baseline JPEG codec correctness (operators/jpeg.py): round-trip
fidelity bounds, spec-golden marker structure, DCT orthonormality,
determinism, adversarial corpus, and the MJPEG-in-AVI path."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from solarboat_data_pipeline_spark.operators import avi, jpeg


def _gradient(h: int, w: int, ch: int, seed: int = 0) -> np.ndarray:
    y, x = np.mgrid[0:h, 0:w]
    base = (x * 3 + y * 5 + seed) % 256
    px = np.stack([(base + c * 10) % 256 for c in range(ch)], axis=-1)
    return px.astype(np.uint8)


# --- fidelity --------------------------------------------------------------


@pytest.mark.parametrize("h,w,ch", [(8, 8, 1), (16, 24, 3), (5, 7, 3), (13, 9, 1), (32, 32, 3)])
def test_roundtrip_fidelity(h, w, ch):
    px = _gradient(h, w, ch, seed=h * w)
    W, H, C, out = jpeg.decode_jpeg(jpeg.encode_jpeg(px.tobytes(), w, h, ch))
    assert (W, H, C) == (w, h, ch)
    got = np.frombuffer(out, np.uint8).reshape(h, w, ch).astype(np.int32)
    mae = np.abs(got - px.astype(np.int32)).mean()
    assert mae < 12, f"MAE {mae} — a broken stage lands near ~85"


def test_flat_image_is_near_exact():
    # a constant block survives with only DC-quantization rounding:
    # |error| <= q_dc/(2*8) = 1 for luma (137 -> DC 72 -> /16 rounds to
    # 5 -> 138 exactly) — and the block must stay perfectly uniform
    px = np.full((16, 16, 3), 137, dtype=np.uint8)
    *_, out = jpeg.decode_jpeg(jpeg.encode_jpeg(px.tobytes(), 16, 16, 3))
    got = np.frombuffer(out, np.uint8).reshape(16, 16, 3).astype(np.int32)
    assert np.abs(got - 137).max() <= 1
    assert len(np.unique(got)) == 1  # no block artifacts on a flat field


def test_noise_stays_bounded_by_quant_theory():
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
    *_, out = jpeg.decode_jpeg(jpeg.encode_jpeg(px.tobytes(), 24, 24, 3))
    got = np.frombuffer(out, np.uint8).reshape(24, 24, 3).astype(np.int32)
    mae = np.abs(got - px.astype(np.int32)).mean()
    assert mae < 45  # worst-case content; broken codecs measure ~85


def test_determinism():
    px = _gradient(12, 20, 3)
    a = jpeg.encode_jpeg(px.tobytes(), 20, 12, 3)
    b = jpeg.encode_jpeg(px.tobytes(), 20, 12, 3)
    assert a == b
    assert jpeg.decode_jpeg(a) == jpeg.decode_jpeg(b)


# --- spec-golden structure --------------------------------------------------


def test_marker_structure_and_annex_k_tables():
    px = _gradient(8, 8, 3)
    d = jpeg.encode_jpeg(px.tobytes(), 8, 8, 3)
    assert d[:2] == b"\xff\xd8" and d[-2:] == b"\xff\xd9"
    # DQT holds the zigzagged Annex K luma table verbatim
    at = d.index(b"\xff\xdb")
    luma_zz = bytes(jpeg.QUANT_LUMA.reshape(64)[jpeg.ZIGZAG].astype(np.uint8))
    assert d[at + 5 : at + 69] == luma_zz
    # SOF0: 8-bit precision, dims, 3 components, 4:4:4 sampling
    at = d.index(b"\xff\xc0")
    prec, hh, ww, nc = struct.unpack(">BHHB", d[at + 4 : at + 10])
    assert (prec, hh, ww, nc) == (8, 8, 8, 3)
    assert d[at + 11] == 0x11  # comp 1 sampling 1x1


def test_huffman_codes_are_canonical():
    codes = jpeg._huff_codes(jpeg.DC_LUMA)
    # canonical property: codes of one length are consecutive integers
    by_len: dict[int, list[int]] = {}
    for code, length in codes.values():
        by_len.setdefault(length, []).append(code)
    for length, cs in by_len.items():
        cs = sorted(cs)
        assert cs == list(range(cs[0], cs[0] + len(cs)))
        assert cs[-1] < (1 << length)


def test_dct_matrix_is_orthonormal():
    eye = jpeg._DCT @ jpeg._DCT.T
    np.testing.assert_allclose(eye, np.eye(8), atol=1e-12)


# --- adversarial corpus ------------------------------------------------------


def _valid() -> bytes:
    return jpeg.encode_jpeg(_gradient(8, 8, 3).tobytes(), 8, 8, 3)


@pytest.mark.parametrize(
    "mutate, reason",
    [
        (lambda d: b"\x00\x00" + d[2:], "missing SOI"),
        (lambda d: d[: d.index(b"\xff\xd9")], "missing EOI"),
        # SOF0 -> SOF2: progressive is outside the envelope
        (lambda d: d.replace(b"\xff\xc0", b"\xff\xc2", 1), "progressive"),
        # sampling byte 0x11 -> 0x22 in SOF comp 1: subsampled chroma
        (
            lambda d: (lambda i: d[: i + 11] + b"\x22" + d[i + 12 :])(
                d.index(b"\xff\xc0")
            ),
            "subsampling",
        ),
        # 12-bit precision
        (
            lambda d: (lambda i: d[: i + 4] + b"\x0c" + d[i + 5 :])(
                d.index(b"\xff\xc0")
            ),
            "12-bit",
        ),
    ],
)
def test_adversarial_raises(mutate, reason):
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(mutate(_valid()))


@pytest.mark.parametrize("h,w", [(1, 1), (5, 3), (8, 8), (9, 17), (16, 16), (31, 33)])
def test_420_roundtrip_fidelity(h, w):
    """2×2-subsampled encode→decode stays within quantization distance on
    smooth content — same bound as the 4:4:4 lane, since box-downsample +
    replicate-upsample is near-lossless on low-gradient chroma."""
    px = _gradient(h, w, 3)
    d = jpeg.encode_jpeg(px.tobytes(), w, h, 3, subsampling="420")
    W, H, C, out = jpeg.decode_jpeg(d)
    assert (W, H, C) == (w, h, 3)
    got = np.frombuffer(out, np.uint8).reshape(h, w, 3)
    mae = np.abs(got.astype(int) - px.astype(int)).mean()
    assert mae < 4.0, mae


def test_420_sof_declares_sampling_factors():
    d = jpeg.encode_jpeg(_gradient(16, 16, 3).tobytes(), 16, 16, 3, subsampling="420")
    at = d.index(b"\xff\xc0")
    # component 1 (Y) sampling byte 0x22, components 2/3 (Cb/Cr) 0x11
    assert d[at + 11] == 0x22
    assert d[at + 14] == 0x11
    assert d[at + 17] == 0x11


def test_420_bitstream_differs_and_is_smaller_on_big_images():
    px = _gradient(64, 64, 3)
    d444 = jpeg.encode_jpeg(px.tobytes(), 64, 64, 3, subsampling="444")
    d420 = jpeg.encode_jpeg(px.tobytes(), 64, 64, 3, subsampling="420")
    assert d444 != d420
    assert len(d420) < len(d444)  # half the chroma blocks


def test_fractional_sampling_ratio_rejected():
    # Y=3x1 with max 3 vs chroma 2x1 → 3/2 is fractional: precise refusal
    d = bytearray(jpeg.encode_jpeg(_gradient(8, 8, 3).tobytes(), 8, 8, 3))
    at = d.index(b"\xff\xc0")
    d[at + 11] = 0x31  # Y sampling 3x1
    d[at + 14] = 0x21  # Cb sampling 2x1
    with pytest.raises(ValueError, match="fractional|Huffman|corrupt"):
        jpeg.decode_jpeg(bytes(d))


def test_fill_bytes_between_segments_tolerated():
    """0xFF fill bytes before a marker are legal (T.81 B.1.1.2) — foreign
    baseline files use them for alignment; decode must see through them."""
    d = _valid()
    at = d.index(b"\xff\xc0")
    padded = d[:at] + b"\xff\xff\xff" + d[at:]
    assert jpeg.decode_jpeg(padded) == jpeg.decode_jpeg(d)


def test_parameterless_marker_named_precisely():
    d = _valid()
    at = d.index(b"\xff\xc0")
    for mk in (b"\xff\x01", b"\xff\xd3"):  # TEM, stray RST3
        with pytest.raises(ValueError, match="parameterless marker"):
            jpeg.decode_jpeg(d[:at] + mk + d[at:])


@pytest.mark.parametrize("ri", [1, 2, 3, 5, 100])
@pytest.mark.parametrize("h,w,ch,sub", [
    (16, 16, 3, "444"), (17, 23, 3, "444"), (32, 48, 3, "420"), (40, 40, 1, "444"),
])
def test_restart_interval_roundtrip_identical(h, w, ch, sub, ri):
    """DRI/RSTn (the error-resilience markers many camera files carry):
    a restart-interval stream must decode IDENTICALLY to the no-DRI
    stream of the same image — predictor resets and byte alignment are
    exact, not approximate."""
    px = _gradient(h, w, ch)
    base = jpeg.decode_jpeg(jpeg.encode_jpeg(px.tobytes(), w, h, ch, subsampling=sub))
    d = jpeg.encode_jpeg(
        px.tobytes(), w, h, ch, subsampling=sub, restart_interval=ri
    )
    assert b"\xff\xdd" in d  # DRI segment present
    assert jpeg.decode_jpeg(d) == base


@pytest.mark.parametrize("h,w,ch,sub", [
    (1, 1, 1, "444"), (8, 8, 3, "444"), (17, 23, 3, "444"),
    (9, 7, 1, "444"), (32, 48, 3, "420"), (21, 9, 3, "420"),
])
def test_progressive_decode_identical_to_baseline(h, w, ch, sub):
    """SOF2 exactness: the progressive scan script (DC/AC successive
    approximation + spectral selection) codes the SAME quantized
    coefficients as baseline, so the decodes must match bit-for-bit —
    any error in EOB runs, correction bits or predictor resets breaks
    this equality."""
    px = _gradient(h, w, ch)
    base = jpeg.decode_jpeg(jpeg.encode_jpeg(px.tobytes(), w, h, ch, subsampling=sub))
    d = jpeg.encode_jpeg(px.tobytes(), w, h, ch, subsampling=sub, progressive=True)
    assert b"\xff\xc2" in d and b"\xff\xc0" not in d
    assert d.count(b"\xff\xda") >= 4  # genuinely multi-scan
    assert jpeg.decode_jpeg(d) == base


def test_progressive_truncation_raises():
    px = _gradient(16, 16, 3)
    d = jpeg.encode_jpeg(px.tobytes(), 16, 16, 3, progressive=True)
    for cut in (0.3, 0.6, 0.95):
        with pytest.raises(ValueError):
            jpeg.decode_jpeg(d[: int(len(d) * cut)])


def test_progressive_rejects_restart_interval_encode():
    with pytest.raises(ValueError, match="restart_interval"):
        jpeg.encode_jpeg(
            _gradient(8, 8, 3).tobytes(), 8, 8, 3,
            progressive=True, restart_interval=2,
        )


def test_restart_markers_emitted_and_sequenced():
    px = _gradient(40, 40, 1)
    d = jpeg.encode_jpeg(px.tobytes(), 40, 40, 1, restart_interval=1)
    # 25 MCUs at ri=1 → 24 markers, sequence numbers cycling 0-7
    counts = [d.count(bytes([0xFF, 0xD0 + i])) for i in range(8)]
    assert sum(counts) == 24 and counts[0] == 3
    # out-of-sequence RST is a precise corruption error
    mut = bytearray(d)
    i = mut.index(b"\xff\xd0")
    mut[i + 1] = 0xD5
    with pytest.raises(ValueError, match="out of sequence"):
        jpeg.decode_jpeg(bytes(mut))


def test_grayscale_roundtrip_has_no_color_tables():
    px = _gradient(9, 9, 1)
    d = jpeg.encode_jpeg(px.tobytes(), 9, 9, 1)
    # exactly one DQT table id (0) and 2 DHT specs
    at = d.index(b"\xff\xdb")
    (seglen,) = struct.unpack(">H", d[at + 2 : at + 4])
    assert seglen == 2 + 65  # one table only
    W, H, C, out = jpeg.decode_jpeg(d)
    assert (W, H, C) == (9, 9, 1)


# --- MJPEG in AVI -----------------------------------------------------------


def test_mjpeg_avi_roundtrip():
    f = np.arange(3)[:, None, None, None]
    y = np.arange(6)[None, :, None, None]
    x = np.arange(8)[None, None, :, None]
    c = np.arange(3)[None, None, None, :]
    fr = ((11 * f + 13 * y + 7 * x + 31 * c) % 256).astype(np.uint8)
    data = avi.encode_avi(fr, fps=15, codec="mjpg")
    W, H, N, fps, got = avi.decode_avi(data)
    assert (W, H, N, fps) == (8, 6, 3, 15)
    mae = np.abs(got.astype(np.int32) - fr.astype(np.int32)).mean()
    assert mae < 8
    # container declares the MJPG fourcc
    at = data.index(b"strf") + 8
    (comp,) = struct.unpack("<I", data[at + 16 : at + 20])
    assert comp == avi._MJPG


def test_mjpeg_avi_roundtrip_420():
    """The subsampled lane through the container: smooth frames (constant
    chroma) keep the 4:2:0 decode inside the same MAE gate as 4:4:4."""
    f = np.arange(3)[:, None, None, None]
    y = np.arange(12)[None, :, None, None]
    x = np.arange(18)[None, None, :, None]
    c = np.arange(3)[None, None, None, :]
    fr = np.clip(16 + 2 * f + 5 * y + 3 * x + 7 * c, 0, 255).astype(np.uint8)
    d444 = avi.encode_avi(fr, fps=20, codec="mjpg", subsampling="444")
    d420 = avi.encode_avi(fr, fps=20, codec="mjpg", subsampling="420")
    assert d444 != d420
    for data in (d444, d420):
        W, H, N, fps, got = avi.decode_avi(data)
        assert (W, H, N, fps) == (18, 12, 3, 20)
        mae = np.abs(got.astype(np.int32) - fr.astype(np.int32)).mean()
        assert mae < 8, mae


def test_avi_dimension_limit_is_a_clear_error():
    big = np.zeros((1, 1, 3, 3), np.uint8)
    with pytest.raises(ValueError, match="32767"):
        avi.encode_avi(np.zeros((1, 2, 40000, 3), np.uint8))
    avi.encode_avi(big)  # in-range still fine


def test_unknown_fourcc_still_rejected():
    data = bytearray(avi.encode_avi(np.zeros((1, 2, 2, 3), np.uint8), codec="mjpg"))
    at = bytes(data).index(b"strf") + 8
    data[at + 16 : at + 20] = b"H264"
    with pytest.raises(ValueError, match="biCompression"):
        avi.decode_avi(bytes(data))


def test_mjpeg_frame_dims_must_match_container():
    data = bytearray(avi.encode_avi(np.zeros((1, 4, 4, 3), np.uint8), codec="mjpg"))
    at = bytes(data).index(b"strf") + 8
    data[at + 4 : at + 8] = struct.pack("<i", 5)  # lie about width
    with pytest.raises(ValueError, match="container says"):
        avi.decode_avi(bytes(data))


def test_triangle_upsample_mode():
    """chroma_upsample='triangle' changes interpolation only: identical
    output on a 4:4:4 stream (nothing to upsample), a measurable chroma
    difference from replicate on 4:2:0 gradients, an identical luma
    plane in both modes (Y is never filtered), and a loud error for an
    unknown mode."""
    import numpy as np

    from solarboat_data_pipeline_spark.operators import jpeg

    y, x = np.mgrid[0:16, 0:24]
    px = np.stack(
        [(7 * x + 13 * y) % 256, (11 * x + 3 * y) % 256, (5 * x + 17 * y) % 256],
        axis=-1,
    ).astype(np.uint8)
    d444 = jpeg.encode_jpeg(px.tobytes(), 24, 16, 3, subsampling="444")
    assert jpeg.decode_jpeg(d444) == jpeg.decode_jpeg(
        d444, chroma_upsample="triangle"
    )
    d420 = jpeg.encode_jpeg(px.tobytes(), 24, 16, 3, subsampling="420")
    _, _, _, rep = jpeg.decode_jpeg(d420)
    _, _, _, tri = jpeg.decode_jpeg(d420, chroma_upsample="triangle")
    rep = np.frombuffer(rep, np.uint8).reshape(16, 24, 3).astype(int)
    tri = np.frombuffer(tri, np.uint8).reshape(16, 24, 3).astype(int)
    assert np.abs(rep - tri).max() > 0
    luma = lambda a: 0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]  # noqa: E731
    assert np.abs(luma(rep) - luma(tri)).mean() < 1.0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="chroma_upsample"):
        jpeg.decode_jpeg(d420, chroma_upsample="fancy")


def test_dc_size_beyond_11_rejected_not_desynced():
    """A DC Huffman table whose symbol exceeds 11 is invalid at 8-bit
    precision (T.81 F.1.2.1.1); the fused rs_value read consumes only
    (symbol & 15) magnitude bits, so without the guard a symbol of 13
    would silently mis-decode with a desynced bitstream instead of
    erroring. Mutate every DC symbol of a valid stream to 13 and demand
    the precise refusal."""
    d = bytearray(jpeg.encode_jpeg(_gradient(9, 9, 1).tobytes(), 9, 9, 1))
    at = d.index(b"\xff\xc4")
    (seglen,) = struct.unpack(">H", d[at + 2 : at + 4])
    assert d[at + 4] == 0x00  # first DHT spec is the DC table (class 0)
    counts = d[at + 5 : at + 21]
    n_sym = sum(counts)
    for i in range(n_sym):
        d[at + 21 + i] = 13
    with pytest.raises(ValueError, match="DC size > 11"):
        jpeg.decode_jpeg(bytes(d))
