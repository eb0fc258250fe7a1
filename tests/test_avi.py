"""Uncompressed-AVI codec correctness (operators/avi.py): round-trips,
DIB layout corner cases (bottom-up flip, BGR swap, 4-byte row padding,
top-down negative-height variant), container golden checks, adversarial
corpus, and frame sampling."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from solarboat_data_pipeline_spark.operators import avi


def _frames(n: int, h: int, w: int, seed: int = 0) -> np.ndarray:
    f = np.arange(n, dtype=np.int64)
    y = np.arange(h, dtype=np.int64)
    x = np.arange(w, dtype=np.int64)
    c = np.arange(3, dtype=np.int64)
    px = (
        11 * f[:, None, None, None] + 13 * y[None, :, None, None]
        + 7 * x[None, None, :, None] + 31 * c[None, None, None, :] + seed
    ) % 256
    return px.astype(np.uint8)


# --- round trips -----------------------------------------------------------


@pytest.mark.parametrize("n,h,w", [(1, 1, 1), (2, 3, 4), (5, 6, 7), (12, 4, 9)])
def test_roundtrip(n, h, w):
    fr = _frames(n, h, w, seed=n * 100)
    W, H, N, fps, got = avi.decode_avi(avi.encode_avi(fr, fps=30))
    assert (W, H, N, fps) == (w, h, n, 30)
    np.testing.assert_array_equal(got, fr)


@pytest.mark.parametrize("w", [1, 2, 3, 4, 5])
def test_row_padding_widths(w):
    # w*3 % 4 varies across these widths: every padding amount exercised
    fr = _frames(2, 3, w)
    *_, got = avi.decode_avi(avi.encode_avi(fr))
    np.testing.assert_array_equal(got, fr)


# --- DIB layout is what the spec says, byte for byte -----------------------


def test_dib_is_bottom_up_bgr_padded():
    # single 1x2 (h=1, w=2) frame with distinct channel values: the raw
    # movi chunk must hold BGR-swapped pixels padded to 8 bytes
    fr = np.array([[[[10, 20, 30], [40, 50, 60]]]], dtype=np.uint8)
    data = avi.encode_avi(fr)
    at = data.index(b"00db")
    (length,) = struct.unpack("<I", data[at + 4 : at + 8])
    assert length == 8  # 2 px * 3 B = 6, padded to 8
    raw = data[at + 8 : at + 8 + length]
    assert raw == bytes([30, 20, 10, 60, 50, 40, 0, 0])


def test_bottom_up_flip():
    # two rows with different constants: bottom row must come FIRST in
    # the DIB stream
    fr = np.zeros((1, 2, 1, 3), dtype=np.uint8)
    fr[0, 0] = 1  # top row
    fr[0, 1] = 2  # bottom row
    data = avi.encode_avi(fr)
    at = data.index(b"00db")
    raw = data[at + 8 : at + 16]
    assert raw[0] == 2 and raw[4] == 1
    *_, got = avi.decode_avi(data)
    np.testing.assert_array_equal(got, fr)


def test_top_down_negative_height_variant():
    # a negative biHeight means top-down rows (also public DIB spec);
    # patch the strf header and pre-flip the frame data to match
    fr = _frames(1, 3, 2)
    data = bytearray(avi.encode_avi(fr))
    strf_at = data.index(b"strf") + 8
    (h,) = struct.unpack("<i", data[strf_at + 8 : strf_at + 12])
    data[strf_at + 8 : strf_at + 12] = struct.pack("<i", -h)
    at = data.index(b"00db") + 8
    row = 8  # (2*3+3)&~3
    rows = [bytes(data[at + i * row : at + (i + 1) * row]) for i in range(3)]
    data[at : at + 3 * row] = b"".join(reversed(rows))
    *_, got = avi.decode_avi(bytes(data))
    np.testing.assert_array_equal(got, fr)


# --- adversarial corpus ----------------------------------------------------


def _valid() -> bytes:
    return avi.encode_avi(_frames(2, 2, 2))


@pytest.mark.parametrize(
    "mutate, reason",
    [
        (lambda d: b"RIFX" + d[4:], "bad RIFF magic"),
        (lambda d: d[:8] + b"WAVE" + d[12:], "not AVI form"),
        (lambda d: d[:-4], "truncated"),
        # biCompression (payload offset 16) patched to 1 (BI_RLE8)
        (
            lambda d: (lambda i: d[:i + 16] + struct.pack("<I", 1) + d[i + 20:])(
                d.index(b"strf") + 8
            ),
            "compressed stream",
        ),
        # biBitCount (payload offset 14) patched to 32
        (
            lambda d: (lambda i: d[:i + 14] + struct.pack("<H", 32) + d[i + 16:])(
                d.index(b"strf") + 8
            ),
            "unsupported bpp",
        ),
        # frame chunk shortened: length field lies about the DIB size
        (
            lambda d: (lambda i: d[:i + 4] + struct.pack("<I", 4) + d[i + 8:])(
                d.index(b"00db")
            ),
            "frame size mismatch",
        ),
    ],
)
def test_adversarial_raises(mutate, reason):
    with pytest.raises(ValueError):
        avi.decode_avi(mutate(_valid()))


def test_missing_strf_raises():
    d = _valid().replace(b"strf", b"strZ")
    with pytest.raises(ValueError):
        avi.decode_avi(d)


# --- frame sampling --------------------------------------------------------


def test_sample_frames_every_k():
    fr = _frames(10, 2, 2)
    np.testing.assert_array_equal(avi.sample_frames(fr, 3), fr[[0, 3, 6, 9]])
    assert avi.sample_frames(fr, 1).shape[0] == 10
    assert avi.sample_frames(fr, 100).shape[0] == 1
    with pytest.raises(ValueError):
        avi.sample_frames(fr, 0)


def test_fps_survives_roundtrip():
    for fps in (1, 24, 60):
        *_, got_fps, _ = (lambda t: (None, None, None, t[3], t[4]))(
            avi.decode_avi(avi.encode_avi(_frames(1, 1, 1), fps=fps))
        )
        assert got_fps == fps
