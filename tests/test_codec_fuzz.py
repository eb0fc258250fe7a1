"""Seeded randomized round-trip sweeps over the stdlib media codecs —
cheap fuzz insurance beyond the fixed-case suites (test_png/wav/avi/
jpeg): random shapes and contents, every filter/channel/rate lane,
plus truncation fuzzing that must ALWAYS raise, never return garbage."""

from __future__ import annotations

import numpy as np
import pytest

from solarboat_data_pipeline_spark.operators import avi, jpeg, png, wav

RNG = np.random.default_rng(20260814)


@pytest.mark.parametrize("trial", range(20))
def test_png_random_roundtrip(trial):
    h = int(RNG.integers(1, 40))
    w = int(RNG.integers(1, 40))
    ch = int(RNG.choice([1, 2, 3, 4]))
    ft = RNG.choice([0, 1, 2, 3, 4, "cycle"])
    px = RNG.integers(0, 256, size=h * w * ch, dtype=np.uint8).tobytes()
    W, H, C, out = png.decode_png(png.encode_png(px, w, h, ch, filter_type=ft))
    assert (W, H, C) == (w, h, ch) and out == px  # PNG is lossless


@pytest.mark.parametrize("trial", range(20))
def test_wav_random_roundtrip(trial):
    n = int(RNG.integers(1, 2000))
    ch = int(RNG.integers(1, 5))
    bits = int(RNG.choice([8, 16]))
    rate = int(RNG.choice([8000, 16000, 44100]))
    if bits == 8:
        sig = RNG.integers(0, 256, size=(n, ch)).astype(np.uint8)
    else:
        sig = RNG.integers(-32768, 32768, size=(n, ch)).astype(np.int16)
    got = wav.decode_wav(wav.encode_wav(sig, rate, ch, bits=bits))
    assert got[:4] == (rate, ch, bits, n)
    np.testing.assert_array_equal(got[4], sig.astype(np.int32))  # lossless


@pytest.mark.parametrize("trial", range(10))
def test_avi_rgb_random_roundtrip(trial):
    n = int(RNG.integers(1, 8))
    h = int(RNG.integers(1, 20))
    w = int(RNG.integers(1, 20))
    fr = RNG.integers(0, 256, size=(n, h, w, 3), dtype=np.uint8)
    W, H, N, _, got = avi.decode_avi(avi.encode_avi(fr))
    assert (W, H, N) == (w, h, n)
    np.testing.assert_array_equal(got, fr)  # BI_RGB is lossless


@pytest.mark.parametrize("trial", range(10))
def test_jpeg_random_bounded_error(trial):
    h = int(RNG.integers(1, 40))
    w = int(RNG.integers(1, 40))
    ch = int(RNG.choice([1, 3]))
    px = RNG.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
    W, H, C, out = jpeg.decode_jpeg(jpeg.encode_jpeg(px.tobytes(), w, h, ch))
    assert (W, H, C) == (w, h, ch)
    got = np.frombuffer(out, np.uint8).reshape(h, w, ch).astype(np.int32)
    mae = np.abs(got - px.astype(np.int32)).mean()
    assert mae < 45  # random noise is JPEG's worst case; broken ≈ 85


@pytest.mark.parametrize("trial", range(12))
def test_png_palette_interlace_random_roundtrip(trial):
    h = int(RNG.integers(1, 30))
    w = int(RNG.integers(1, 30))
    ft = RNG.choice([0, 1, 2, 3, 4, "cycle"])
    interlace = bool(RNG.integers(0, 2))
    if trial % 2 == 0:  # palette lane
        n_pal = int(RNG.integers(1, 257))
        pal = RNG.integers(0, 256, size=(n_pal, 3), dtype=np.uint8)
        idx = RNG.integers(0, n_pal, size=h * w, dtype=np.uint8)
        data = png.encode_png_palette(
            idx.tobytes(), w, h, pal, filter_type=ft, interlace=interlace
        )
        W, H, C, out = png.decode_png(data)
        assert (W, H, C) == (w, h, 3)
        assert out == pal[idx.reshape(h, w)].tobytes()
    else:  # truecolor Adam7 lane
        ch = int(RNG.choice([1, 2, 3, 4]))
        px = RNG.integers(0, 256, size=h * w * ch, dtype=np.uint8).tobytes()
        W, H, C, out = png.decode_png(
            png.encode_png(px, w, h, ch, filter_type=ft, interlace=interlace)
        )
        assert (W, H, C) == (w, h, ch) and out == px


@pytest.mark.parametrize("trial", range(8))
def test_jpeg_420_random_bounded_error(trial):
    h = int(RNG.integers(1, 40))
    w = int(RNG.integers(1, 40))
    px = RNG.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    W, H, C, out = jpeg.decode_jpeg(
        jpeg.encode_jpeg(px.tobytes(), w, h, 3, subsampling="420")
    )
    assert (W, H, C) == (w, h, 3)
    got = np.frombuffer(out, np.uint8).reshape(h, w, 3).astype(np.int32)
    mae = np.abs(got - px.astype(np.int32)).mean()
    # random chroma noise additionally loses the 2x2 box-average detail;
    # broken Huffman/MCU interleave lands near 85
    assert mae < 60, mae


@pytest.mark.parametrize("trial", range(10))
def test_jpeg_progressive_random_equals_baseline(trial):
    """Random shapes/content: progressive decode must equal baseline
    decode EXACTLY (same quantized coefficients, different entropy
    layout) — the sharpest possible check of the SOF2 machinery."""
    h = int(RNG.integers(1, 40))
    w = int(RNG.integers(1, 40))
    ch = int(RNG.choice([1, 3]))
    sub = str(RNG.choice(["444", "420"])) if ch == 3 else "444"
    px = RNG.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
    base = jpeg.decode_jpeg(jpeg.encode_jpeg(px.tobytes(), w, h, ch, subsampling=sub))
    prog = jpeg.decode_jpeg(
        jpeg.encode_jpeg(px.tobytes(), w, h, ch, subsampling=sub, progressive=True)
    )
    assert prog == base


@pytest.mark.parametrize("codec", ["png", "wav", "avi", "jpeg"])
@pytest.mark.parametrize("cut", [0.15, 0.5, 0.9])
def test_truncation_always_raises_never_garbage(codec, cut):
    px = np.arange(4 * 6 * 3, dtype=np.uint8)
    if codec == "png":
        data = png.encode_png(px.tobytes(), 6, 4, 3)
        decode = png.decode_png
    elif codec == "wav":
        data = wav.encode_wav(px.astype(np.int16), 8000, 3, bits=16)
        decode = wav.decode_wav
    elif codec == "avi":
        data = avi.encode_avi(px.reshape(1, 4, 6, 3))
        decode = avi.decode_avi
    else:
        data = jpeg.encode_jpeg(px.tobytes(), 6, 4, 3)
        decode = jpeg.decode_jpeg
    with pytest.raises(ValueError):
        decode(data[: int(len(data) * cut)])


# --- probe lane (mp4 / vp9): mutation + truncation fuzz ---------------------
# the probers promise clean ValueError on ANY malformed input — a
# struct.error / IndexError / UnicodeDecodeError leaking out of the
# Arrow batch would fail a whole 100 TB task with an opaque trace.


def _probe_fixtures():
    from solarboat_data_pipeline_spark.operators import mp3, mp4, vp9

    rnd = np.random.default_rng(20260816)
    base_mp4 = mp4.encode_mp4(
        126, 98, [50 + (i * 13) % 100 for i in range(12)], profile_idc=100
    )
    base_fmp4 = mp4.encode_fmp4(126, 98, [[50, 61, 72], [83, 94]])
    frames = []
    for i in range(8):
        if i % 3 == 0:
            hdr = vp9.encode_vp9_keyframe_header(126, 98)
        elif i % 3 == 1:
            # randomized FULL inter header (round 12): every field the
            # parser walks is exercised by the mutation loop below
            hdr = vp9.encode_vp9_inter_header(
                0,
                refresh_frame_flags=int(rnd.integers(0, 256)),
                ref_frame_idx=tuple(int(x) for x in rnd.integers(0, 8, 3)),
                ref_sign_bias=tuple(int(x) for x in rnd.integers(0, 2, 3)),
                found_ref=bool(rnd.integers(0, 2)),
                width=126, height=98,
                allow_high_precision_mv=bool(rnd.integers(0, 2)),
                interp_filter=(
                    None if rnd.integers(0, 2) else int(rnd.integers(0, 4))
                ),
                reset_frame_context=int(rnd.integers(0, 4)),
            )
        else:
            hdr = vp9.encode_vp9_intra_only_header(
                126, 98, refresh_frame_flags=int(rnd.integers(0, 256))
            )
        frames.append(hdr + bytes(rnd.integers(0, 256, size=40, dtype=np.uint8)))
    base_mp3 = mp3.encode_mp3_frames(
        14, bitrate_index=9, rate_index=1, pad_every=3, id3v2_bytes=37
    )
    # free-format sibling: the next-sync derivation walk fuzzed too
    base_mp3_free = mp3.encode_mp3_frames(
        11, bitrate_index=0, free_format_bytes=301, pad_every=4, id3v2_bytes=23
    )
    return (
        mp4, vp9, mp3, rnd, base_mp4, base_fmp4,
        vp9.encode_ivf(126, 98, frames), base_mp3, base_mp3_free,
    )


@pytest.mark.parametrize("trial", range(30))
def test_probe_mutation_fuzz_only_value_errors(trial):
    (
        mp4, vp9, mp3, rnd, base_mp4, base_fmp4, base_ivf, base_mp3,
        base_mp3_free,
    ) = _probe_fixtures()
    for _ in range(100):
        kind = int(rnd.integers(0, 9))
        if kind == 0:
            data = bytes(rnd.integers(0, 256, size=int(rnd.integers(1, 300)), dtype=np.uint8))
            fns = (mp4.probe_mp4, vp9.probe_ivf, mp3.probe_mp3)
        elif kind == 1:
            data = base_mp4[: int(rnd.integers(0, len(base_mp4)))]
            fns = (mp4.probe_mp4, mp4.sample_index)
        elif kind == 2:
            b = bytearray(base_mp4)
            for _ in range(int(rnd.integers(1, 12))):
                b[int(rnd.integers(0, len(b)))] = int(rnd.integers(0, 256))
            data, fns = bytes(b), (mp4.probe_mp4, mp4.sample_index)
        elif kind == 3:
            b = bytearray(base_ivf)
            for _ in range(int(rnd.integers(1, 12))):
                b[int(rnd.integers(0, len(b)))] = int(rnd.integers(0, 256))
            data, fns = bytes(b), (vp9.probe_ivf,)
        elif kind == 4:
            data = base_ivf[: int(rnd.integers(0, len(base_ivf)))]
            fns = (vp9.probe_ivf,)
        elif kind == 5:
            b = bytearray(base_fmp4)
            for _ in range(int(rnd.integers(1, 12))):
                b[int(rnd.integers(0, len(b)))] = int(rnd.integers(0, 256))
            data, fns = bytes(b), (mp4.probe_mp4, mp4.fragment_index)
        elif kind == 6:
            b = bytearray(base_mp3)
            for _ in range(int(rnd.integers(1, 12))):
                b[int(rnd.integers(0, len(b)))] = int(rnd.integers(0, 256))
            data, fns = bytes(b), (mp3.probe_mp3,)
        elif kind == 7:
            data = base_mp3[: int(rnd.integers(0, len(base_mp3)))]
            fns = (mp3.probe_mp3,)
        else:
            if rnd.integers(0, 2):
                data = base_mp3_free[: int(rnd.integers(0, len(base_mp3_free)))]
            else:
                b = bytearray(base_mp3_free)
                for _ in range(int(rnd.integers(1, 12))):
                    b[int(rnd.integers(0, len(b)))] = int(rnd.integers(0, 256))
                data = bytes(b)
            fns = (mp3.probe_mp3,)
        for fn in fns:
            try:
                fn(data)  # surviving a benign mutation is fine
            except ValueError:
                pass  # the ONLY permitted failure mode


def test_probe_mp3_id3v1_trailer_only_is_value_error():
    # directed case for the one historical non-ValueError escape: an
    # audio section that is ONLY the 128-byte ID3v1 trailer
    from solarboat_data_pipeline_spark.operators import mp3

    for prefix in (b"", b"ID3\x04\x00\x00\x00\x00\x00\x05" + bytes(5)):
        with pytest.raises(ValueError):
            mp3.probe_mp3(prefix + b"TAG" + bytes(125))


@pytest.mark.parametrize("trial", range(10))
def test_header_parser_random_bytes_only_value_errors(trial):
    mp4, vp9, _mp3, rnd, *_ = _probe_fixtures()
    for _ in range(200):
        data = bytes(rnd.integers(0, 256, size=int(rnd.integers(0, 60)), dtype=np.uint8))
        for fn in (mp4.parse_sps, vp9.parse_vp9_frame_header, mp4.parse_avcc, mp4.nal_scan):
            try:
                fn(data)
            except ValueError:
                pass
