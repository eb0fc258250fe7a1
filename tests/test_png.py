"""Pure-stdlib PNG codec + the real multimodal decode/resize kernels.

Two independent proofs of decode correctness:

* local: encode→decode round-trips across every (filter, color-type)
  combination, plus property-tested random images;
* distributed: the Spark kernels decode synthesized PNGs and the
  expected statistics are recomputed arithmetically from the generator
  formula — the PNG bytes are never consulted on the expectation side.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from solarboat_data_pipeline_spark.operators import multimodal as mm
from solarboat_data_pipeline_spark.operators import png


def _gradient(w: int, h: int, ch: int, seed: int = 0) -> bytes:
    x = np.arange(w, dtype=np.int64)
    y = np.arange(h, dtype=np.int64)
    c = np.arange(ch, dtype=np.int64)
    px = (7 * x[None, :, None] + 13 * y[:, None, None] + 31 * c[None, None, :] + seed) % 256
    return px.astype(np.uint8).tobytes()


# the synthesize_png_media generator contract (form = id % 5): 0 gray /
# 1 RGB / 2 palette (decodes to RGB) / 3 Adam7-interlaced RGB /
# 4 four-bit palette (round 7; every other one Adam7)
def _expected_channels(mid: int) -> int:
    return 1 if mid % 5 == 0 else 3


def _expected_pixel(mid: int, x: int, y: int, c: int) -> int:
    if mid % 5 == 2:
        return (((7 * x + 13 * y + mid) % 256) * (3 + 2 * c) + mid) % 256
    if mid % 5 == 4:
        return (((7 * x + 13 * y + mid) % 16) * (3 + 2 * c) + mid) % 256
    return (7 * x + 13 * y + 31 * c + mid) % 256


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4, "cycle"])
@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_roundtrip_all_filters_and_color_types(filter_type, channels):
    w, h = 13, 7
    raw = _gradient(w, h, channels, seed=5)
    data = png.encode_png(raw, w, h, channels, filter_type=filter_type)
    assert data.startswith(b"\x89PNG\r\n\x1a\n")
    dw, dh, dch, out = png.decode_png(data)
    assert (dw, dh, dch) == (w, h, channels)
    assert out == raw


def test_roundtrip_random_images():
    rng = np.random.default_rng(42)
    for _ in range(25):
        w = int(rng.integers(1, 40))
        h = int(rng.integers(1, 40))
        ch = int(rng.choice([1, 2, 3, 4]))
        raw = rng.integers(0, 256, size=w * h * ch, dtype=np.uint8).tobytes()
        ft = rng.choice([0, 1, 2, 3, 4, "cycle"])
        dw, dh, dch, out = png.decode_png(png.encode_png(raw, w, h, ch, filter_type=ft))
        assert (dw, dh, dch, out) == (w, h, ch, raw)


def test_decode_rejects_garbage_and_corruption():
    with pytest.raises(ValueError, match="signature"):
        png.decode_png(b"not a png at all")
    data = bytearray(png.encode_png(_gradient(4, 4, 1), 4, 4, 1))
    idat = data.find(b"IDAT")
    data[idat + 6] ^= 0xFF  # flip a byte inside the IDAT payload → CRC mismatch
    with pytest.raises(ValueError, match="CRC|corrupt"):
        png.decode_png(bytes(data))
    whole = png.encode_png(_gradient(4, 4, 1), 4, 4, 1)
    with pytest.raises(ValueError, match="truncated|corrupt"):
        png.decode_png(whole[:-8])


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(payload)) + ctype + payload
        + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
    )


def test_decode_rejects_unsupported_features():
    import struct

    sig = b"\x89PNG\r\n\x1a\n"
    # depth 3 is not a legal PNG depth (1/2/4/8/16 are; 4-bit gray and
    # palette are supported since round 7)
    ihdr3 = struct.pack(">IIBBBBB", 2, 2, 3, 0, 0, 0, 0)
    with pytest.raises(ValueError, match="bit depth"):
        png.decode_png(sig + _chunk(b"IHDR", ihdr3))
    # color type 5 is not a real PNG color type
    ihdr_bad = struct.pack(">IIBBBBB", 2, 2, 8, 5, 0, 0, 0)
    with pytest.raises(ValueError, match="color type"):
        png.decode_png(sig + _chunk(b"IHDR", ihdr_bad))
    # interlace method 2 does not exist (only 0 and 1/Adam7)
    ihdr_i2 = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 2)
    with pytest.raises(ValueError, match="interlace"):
        png.decode_png(sig + _chunk(b"IHDR", ihdr_i2))
    # tRNS is supported for types 0/2/3 (see test_trns_validation /
    # test_roundtrip_transparent_color_trns); on alpha-carrying types
    # it is spec-invalid and refused
    data = png.encode_png(_gradient(2, 2, 2), 2, 2, 2)
    ihdr_end = 8 + 8 + 13 + 4
    spliced = data[:ihdr_end] + _chunk(b"tRNS", b"\x00\x00") + data[ihdr_end:]
    with pytest.raises(ValueError, match="tRNS chunk on color type"):
        png.decode_png(spliced)


def test_decode_rejects_duplicate_ihdr():
    data = png.encode_png(_gradient(2, 2, 1), 2, 2, 1)
    import struct

    ihdr_end = 8 + 8 + 13 + 4
    dup = data[:ihdr_end] + _chunk(
        b"IHDR", struct.pack(">IIBBBBB", 9, 9, 8, 0, 0, 0, 0)
    ) + data[ihdr_end:]
    with pytest.raises(ValueError, match="duplicate IHDR"):
        png.decode_png(dup)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4, "cycle"])
@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_roundtrip_adam7_interlaced(filter_type, channels):
    for w, h in [(1, 1), (2, 3), (7, 5), (8, 8), (13, 9), (16, 12)]:
        raw = _gradient(w, h, channels, seed=11)
        data = png.encode_png(raw, w, h, channels, filter_type=filter_type, interlace=True)
        dw, dh, dch, out = png.decode_png(data)
        assert (dw, dh, dch) == (w, h, channels)
        assert out == raw, (w, h, channels, filter_type)


@pytest.mark.parametrize("interlace", [False, True])
@pytest.mark.parametrize("filter_type", [0, 4, "cycle"])
def test_roundtrip_palette(filter_type, interlace):
    rng = np.random.default_rng(3)
    for w, h in [(1, 1), (3, 2), (9, 7), (16, 12)]:
        n_pal = int(rng.integers(2, 257))
        pal = rng.integers(0, 256, size=(n_pal, 3), dtype=np.uint8)
        idx = rng.integers(0, n_pal, size=w * h, dtype=np.uint8)
        data = png.encode_png_palette(
            idx.tobytes(), w, h, pal, filter_type=filter_type, interlace=interlace
        )
        dw, dh, dch, out = png.decode_png(data)
        assert (dw, dh, dch) == (w, h, 3)
        assert out == pal[idx.reshape(h, w)].tobytes()


@pytest.mark.parametrize("interlace", [False, True])
def test_roundtrip_palette_trns_rgba(interlace):
    """Palette tRNS (the common web transparent PNG): decode expands to
    RGBA; entries beyond the tRNS table are opaque per spec §11.3.2."""
    rng = np.random.default_rng(23)
    w, h = 11, 6
    pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    alphas = rng.integers(0, 256, size=10, dtype=np.uint8)  # short table
    idx = rng.integers(0, 16, size=w * h, dtype=np.uint8)
    data = png.encode_png_palette(
        idx.tobytes(), w, h, pal, filter_type="cycle",
        interlace=interlace, trns=alphas,
    )
    dw, dh, dch, out = png.decode_png(data)
    assert (dw, dh, dch) == (w, h, 4)
    full_a = np.full(16, 255, np.uint8)
    full_a[:10] = alphas
    expect = np.concatenate([pal, full_a[:, None]], axis=1)[idx.reshape(h, w)]
    assert out == expect.tobytes()


def test_trns_validation():
    pal = np.zeros((4, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="tRNS"):
        png.encode_png_palette(bytes(4), 2, 2, pal, trns=np.zeros(5, np.uint8))
    # wrong-length gray/RGB tRNS is corruption (type 2 needs 6 bytes)
    data = png.encode_png(_gradient(2, 2, 3), 2, 2, 3)
    ihdr_end = 8 + 8 + 13 + 4
    spliced = data[:ihdr_end] + _chunk(b"tRNS", bytes(4)) + data[ihdr_end:]
    with pytest.raises(ValueError, match="tRNS length"):
        png.decode_png(spliced)
    # tRNS on an alpha-carrying color type is spec-invalid
    data = png.encode_png(_gradient(2, 2, 4), 2, 2, 4)
    spliced = data[:ihdr_end] + _chunk(b"tRNS", bytes(6)) + data[ihdr_end:]
    with pytest.raises(ValueError, match="tRNS chunk on color type"):
        png.decode_png(spliced)
    # tRNS longer than the palette is corruption
    d = bytearray(png.encode_png_palette(bytes([0, 1, 2, 3]), 2, 2, pal))
    plte_end = ihdr_end + 8 + 12 + 4
    bad = bytes(d[:plte_end]) + _chunk(b"tRNS", bytes(7)) + bytes(d[plte_end:])
    with pytest.raises(ValueError, match="longer than the palette"):
        png.decode_png(bad)


@pytest.mark.parametrize("channels", [1, 3])
def test_roundtrip_transparent_color_trns(channels):
    """Gray/RGB single-transparent-color tRNS: the marked color decodes
    with alpha 0, everything else opaque — output grows one channel."""
    w, h = 9, 5
    raw = np.frombuffer(_gradient(w, h, channels), np.uint8).reshape(h, w, channels)
    key = tuple(int(v) for v in raw[2, 3])  # an actually-present color
    data = png.encode_png(
        raw.tobytes(), w, h, channels, filter_type="cycle",
        transparent=key if channels == 3 else key[0],
    )
    dw, dh, dch, out = png.decode_png(data)
    assert (dw, dh, dch) == (w, h, channels + 1)
    got = np.frombuffer(out, np.uint8).reshape(h, w, channels + 1)
    np.testing.assert_array_equal(got[:, :, :channels], raw)
    expect_alpha = np.where(
        (raw == np.array(key, np.uint8)).all(axis=2), 0, 255
    )
    np.testing.assert_array_equal(got[:, :, channels], expect_alpha)
    assert (expect_alpha == 0).any()  # the key color really occurs


def test_palette_validation():
    pal = np.zeros((4, 3), dtype=np.uint8)
    # index out of range at encode time
    with pytest.raises(ValueError, match="out of range"):
        png.encode_png_palette(bytes([0, 1, 2, 7]), 2, 2, pal)
    # malformed palette shapes
    with pytest.raises(ValueError, match="palette"):
        png.encode_png_palette(bytes(4), 2, 2, np.zeros((0, 3), np.uint8))
    with pytest.raises(ValueError, match="palette"):
        png.encode_png_palette(bytes(4), 2, 2, np.zeros((300, 3), np.uint8))
    # palette image whose PLTE chunk was stripped → precise error
    data = png.encode_png_palette(bytes([0, 1, 2, 3]), 2, 2, pal)
    ihdr_end = 8 + 8 + 13 + 4
    plte_len = 8 + 4 * 3 + 4
    stripped = data[:ihdr_end] + data[ihdr_end + plte_len:]
    with pytest.raises(ValueError, match="PLTE"):
        png.decode_png(stripped)
    # index beyond the PLTE at decode time (craft a 2-entry palette but
    # index 3): encode with 4 entries then truncate the PLTE payload
    data = png.encode_png_palette(bytes([0, 1, 2, 3]), 2, 2, pal)
    short = data[:ihdr_end] + _chunk(b"PLTE", pal[:2].tobytes()) + data[ihdr_end + plte_len:]
    with pytest.raises(ValueError, match="out of range"):
        png.decode_png(short)


def test_ancillary_chunks_are_skipped():
    import struct
    import zlib

    data = png.encode_png(_gradient(3, 3, 3), 3, 3, 3)
    # splice a tEXt chunk between IHDR and IDAT
    ihdr_end = 8 + 8 + 13 + 4
    payload = b"Comment\x00hello"
    text = (
        struct.pack(">I", len(payload)) + b"tEXt" + payload
        + struct.pack(">I", zlib.crc32(b"tEXt" + payload) & 0xFFFFFFFF)
    )
    spliced = data[:ihdr_end] + text + data[ihdr_end:]
    assert png.decode_png(spliced)[:3] == (3, 3, 3)


def test_resize_nearest_matches_integer_mapping():
    w, h, ch, tw, th = 10, 6, 3, 4, 9
    raw = _gradient(w, h, ch, seed=3)
    out = np.frombuffer(png.resize_nearest(raw, w, h, ch, tw, th), np.uint8)
    img = np.frombuffer(raw, np.uint8).reshape(h, w, ch)
    expect = np.empty((th, tw, ch), np.uint8)
    for y in range(th):
        for x in range(tw):
            expect[y, x] = img[(y * h) // th, (x * w) // tw]
    assert (out.reshape(th, tw, ch) == expect).all()


def test_resize_bilinear_matches_naive_reference():
    w, h, ch, tw, th = 7, 5, 2, 11, 3
    raw = _gradient(w, h, ch, seed=9)
    out = np.frombuffer(png.resize_bilinear(raw, w, h, ch, tw, th), np.uint8)
    img = np.frombuffer(raw, np.uint8).reshape(h, w, ch).astype(np.float64)
    expect = np.empty((th, tw, ch), np.uint8)
    for y in range(th):
        sy = min(max((y + 0.5) * (h / th) - 0.5, 0.0), h - 1.0)
        y0, fy = int(np.floor(sy)), sy - int(np.floor(sy))
        y1 = min(y0 + 1, h - 1)
        for x in range(tw):
            sx = min(max((x + 0.5) * (w / tw) - 0.5, 0.0), w - 1.0)
            x0, fx = int(np.floor(sx)), sx - int(np.floor(sx))
            x1 = min(x0 + 1, w - 1)
            v = (
                img[y0, x0] * (1 - fx) * (1 - fy) + img[y0, x1] * fx * (1 - fy)
                + img[y1, x0] * (1 - fx) * fy + img[y1, x1] * fx * fy
            )
            expect[y, x] = np.floor(v + 0.5).astype(np.uint8)
    assert (out.reshape(th, tw, ch) == expect).all()


def test_resize_identity_is_noop():
    raw = _gradient(8, 8, 1)
    assert png.resize_nearest(raw, 8, 8, 1, 8, 8) == raw
    assert png.resize_bilinear(raw, 8, 8, 1, 8, 8) == raw


# ---------------------------------------------------------------------------
# Spark kernels (fake=False — the REAL decode path)
# ---------------------------------------------------------------------------


def _doc_ids(spark, n=40):
    return spark.range(n).select(F.col("id").alias("doc_id"))


def test_decode_image_stats_matches_generator_formula(spark):
    # n=40 covers all 5 generator forms (gray/RGB/palette/Adam7/4-bit) 8x each
    media = mm.synthesize_png_media(_doc_ids(spark))
    got = {r["media_id"]: r for r in mm.decode_image_stats(media).collect()}
    for mid in range(40):
        w, h = mid % 16 + 1, mid % 12 + 1
        ch = _expected_channels(mid)
        expect = sum(
            _expected_pixel(mid, x, y, c)
            for x in range(w) for y in range(h) for c in range(ch)
        )
        r = got[mid]
        assert (r["width"], r["height"], r["channels"]) == (w, h, ch)
        assert r["pixel_sum"] == expect


def test_resize_image_stats_matches_floor_mapping(spark):
    media = mm.synthesize_png_media(_doc_ids(spark))
    got = {
        r["media_id"]: r
        for r in mm.resize_image_stats(media, 8, 6, method="nearest").collect()
    }
    for mid in range(40):
        w, h = mid % 16 + 1, mid % 12 + 1
        ch = _expected_channels(mid)
        expect = sum(
            _expected_pixel(mid, (x * w) // 8, (y * h) // 6, c)
            for x in range(8) for y in range(6) for c in range(ch)
        )
        r = got[mid]
        assert (r["target_width"], r["target_height"]) == (8, 6)
        assert r["pixel_sum"] == expect, mid


def test_extract_features_real_decode(spark):
    media = mm.synthesize_png_media(_doc_ids(spark, n=12))
    rows = {r["media_id"]: r for r in mm.extract_features(media, fake=False).collect()}
    for mid, r in rows.items():
        w, h = mid % 16 + 1, mid % 12 + 1
        ch = _expected_channels(mid)
        mean = (
            sum(
                _expected_pixel(mid, x, y, c)
                for x in range(w) for y in range(h) for c in range(ch)
            ) / (w * h * ch)
        )
        assert r["feature"][0] == float(w)
        assert r["feature"][1] == float(h)
        assert r["feature"][2] == float(ch)
        assert abs(r["feature"][3] - mean) < 1e-9


def test_extract_features_audio_still_stubbed(spark):
    docs = _doc_ids(spark, n=9)
    media = mm.documents_as_media(docs.withColumn("text", F.lit("abc")))
    with pytest.raises(Exception, match="NotImplementedError|torchaudio"):
        mm.extract_features(media.where(F.col("media_type") == "audio/wav"), fake=False).collect()


def test_resize_plan_real_roundtrips(spark):
    media = mm.synthesize_png_media(_doc_ids(spark, n=10))
    out = mm.resize_plan(media, target_width=5, target_height=4, fake=False).collect()
    assert len(out) == 10
    # re-create each resized PNG locally and check the md5 the kernel emitted
    src = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    for r in out:
        w, h, ch, px = png.decode_png(src[r["media_id"]])
        resized = png.resize_nearest(px, w, h, ch, 5, 4)
        blob = png.encode_png(resized, 5, 4, ch, filter_type=0)
        assert r["payload_md5"] == hashlib.md5(blob).hexdigest()
        assert r["n_bytes"] == len(blob)
        # and the emitted file is itself a valid decodable PNG
        dw, dh, dch, dpx = png.decode_png(blob)
        assert (dw, dh, dch, dpx) == (5, 4, ch, resized)


# --- 16-bit depth ------------------------------------------------------------


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4, "cycle"])
@pytest.mark.parametrize("interlace", [False, True])
def test_roundtrip_16bit(filter_type, interlace):
    """depth-16 PNGs (scientific/depth imagery): byte-wise filters with
    doubled bpp, big-endian samples, exact round-trip via decode_png16."""
    rng = np.random.default_rng(37)
    for w, h, ch in [(1, 1, 1), (9, 7, 3), (16, 12, 4), (13, 5, 2)]:
        px = rng.integers(0, 65536, size=(h, w, ch)).astype(">u2")
        d = png.encode_png(
            px.tobytes(), w, h, ch, filter_type=filter_type,
            interlace=interlace, depth=16,
        )
        W, H, C, out = png.decode_png16(d)
        assert (W, H, C) == (w, h, ch)
        np.testing.assert_array_equal(
            np.frombuffer(out, dtype=">u2").reshape(h, w, ch), px
        )


def test_16bit_contract_routing():
    """The 8-bit byte contract never silently reinterprets 16-bit data:
    each front raises with a pointer to the other."""
    rng = np.random.default_rng(41)
    d16 = png.encode_png(
        rng.integers(0, 65536, size=(4, 4, 3)).astype(">u2").tobytes(),
        4, 4, 3, depth=16,
    )
    with pytest.raises(ValueError, match="decode_png16"):
        png.decode_png(d16)
    d8 = png.encode_png(_gradient(4, 4, 3), 4, 4, 3)
    with pytest.raises(ValueError, match="use decode_png"):
        png.decode_png16(d8)
    # 16-bit palette is refused precisely
    import struct as _s
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = _s.pack(">IIBBBBB", 2, 2, 16, 3, 0, 0, 0)
    with pytest.raises(ValueError, match="16-bit palette"):
        png.decode_png(sig + _chunk(b"IHDR", ihdr))


# --- sub-8-bit depths (round 7) ---------------------------------------------


@pytest.mark.parametrize("depth", [1, 2, 4])
@pytest.mark.parametrize("interlace", [False, True])
def test_sub8_gray_roundtrip_all_filters(depth, interlace):
    """Sub-8-bit grayscale: one byte per sample in, packed scanlines on
    the wire, bit-replicated 8-bit expansion out — across every filter
    (cycling) and both interlace layouts, at widths that force padding
    bits in the final byte of each scanline."""
    rng = np.random.default_rng(100 + depth)
    for w, h in [(1, 1), (7, 3), (8, 8), (13, 5), (31, 17)]:
        s = rng.integers(0, 1 << depth, size=(h, w)).astype(np.uint8)
        data = png.encode_png(
            s.tobytes(), w, h, 1, filter_type="cycle",
            interlace=interlace, depth=depth,
        )
        W, H, C, out = png.decode_png(data)
        assert (W, H, C) == (w, h, 1)
        want = s * (255 // ((1 << depth) - 1))
        np.testing.assert_array_equal(
            np.frombuffer(out, np.uint8).reshape(h, w), want
        )


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_sub8_palette_roundtrip_with_trns(depth):
    """Sub-8-bit palette (the favicon form): indices pack to bits, PLTE
    expands on decode; palette tRNS yields RGBA with short-table
    entries opaque."""
    rng = np.random.default_rng(200 + depth)
    n = 1 << depth
    pal = rng.integers(0, 256, size=(n, 3)).astype(np.uint8)
    for w, h, il in [(5, 4, False), (16, 9, True), (23, 11, False)]:
        idx = rng.integers(0, n, size=(h, w)).astype(np.uint8)
        data = png.encode_png_palette(
            idx.tobytes(), w, h, pal, filter_type="cycle",
            interlace=il, depth=depth,
        )
        W, H, C, out = png.decode_png(data)
        assert (W, H, C) == (w, h, 3)
        np.testing.assert_array_equal(
            np.frombuffer(out, np.uint8).reshape(h, w, 3), pal[idx]
        )
        trns = rng.integers(0, 256, size=n // 2 + 1).astype(np.uint8)
        data = png.encode_png_palette(
            idx.tobytes(), w, h, pal, trns=trns, depth=depth
        )
        W, H, C, out = png.decode_png(data)
        assert C == 4
        alphas = np.full(n, 255, np.uint8)
        alphas[: trns.size] = trns
        want = np.concatenate([pal, alphas[:, None]], axis=1)[idx]
        np.testing.assert_array_equal(
            np.frombuffer(out, np.uint8).reshape(h, w, 4), want
        )


def test_sub8_gray_transparent_sample_matches_raw_level():
    """Gray tRNS at sub-8 depth compares the RAW sample value (pre
    bit-replication, spec §11.3.2): level 2 at depth 2 becomes
    transparent, its expanded gray value is 2·85."""
    s = np.array([[0, 1, 2, 3], [3, 2, 1, 0]], np.uint8)
    data = png.encode_png(s.tobytes(), 4, 2, 1, depth=2, transparent=2)
    W, H, C, out = png.decode_png(data)
    assert C == 2
    ga = np.frombuffer(out, np.uint8).reshape(2, 4, 2)
    np.testing.assert_array_equal(ga[..., 0], s * 85)
    np.testing.assert_array_equal(ga[..., 1], np.where(s == 2, 0, 255))


def test_sub8_validation_errors():
    """Out-of-range samples/indices, illegal depth/color-type combos and
    non-uint8 tRNS arrays are refused loudly, never truncated."""
    with pytest.raises(ValueError, match="out of range"):
        png.encode_png(bytes([4]), 1, 1, 1, depth=2)
    with pytest.raises(ValueError, match="grayscale"):
        png.encode_png(bytes(3), 1, 1, 3, depth=4)
    with pytest.raises(ValueError, match="out of range"):
        png.encode_png_palette(
            bytes([3]), 1, 1, np.zeros((8, 3), np.uint8), depth=1
        )
    with pytest.raises(ValueError, match="out of range"):
        png.encode_png(bytes([1]), 1, 1, 1, depth=2, transparent=5)
    # ADVICE r6: a non-uint8 tRNS ndarray must raise, not wrap 256 -> 0
    with pytest.raises(ValueError, match="0..255"):
        png.encode_png_palette(
            bytes([0]), 1, 1, np.zeros((1, 3), np.uint8),
            trns=np.array([256]),
        )
    # decode side: sub-8 on a truecolor type is spec-illegal
    import struct as _s
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = _s.pack(">IIBBBBB", 2, 2, 4, 2, 0, 0, 0)
    with pytest.raises(ValueError, match="not legal"):
        png.decode_png(sig + _chunk(b"IHDR", ihdr))


def test_16bit_trns_transparent_color():
    """16-bit gray/RGB single-transparent-color tRNS (round 7 — the last
    tRNS form): the chunk's full-precision fields match 16-bit samples
    exactly; output grows a big-endian u16 alpha channel."""
    rng = np.random.default_rng(77)
    g = rng.integers(0, 65536, size=(3, 5)).astype(">u2")
    g[1, 2] = 40000
    data = png.encode_png(g.tobytes(), 5, 3, 1, depth=16, transparent=40000)
    W, H, C, out = png.decode_png16(data)
    assert (W, H, C) == (5, 3, 2)
    ga = np.frombuffer(out, ">u2").reshape(3, 5, 2)
    np.testing.assert_array_equal(ga[..., 0], g)
    np.testing.assert_array_equal(
        ga[..., 1], np.where(g == 40000, 0, 65535)
    )
    # RGB form
    px = rng.integers(0, 65536, size=(2, 4, 3)).astype(">u2")
    px[0, 1] = (1, 2, 3)
    data = png.encode_png(
        px.tobytes(), 4, 2, 3, depth=16, transparent=(1, 2, 3)
    )
    W, H, C, out = png.decode_png16(data)
    assert (W, H, C) == (4, 2, 4)
    rgba = np.frombuffer(out, ">u2").reshape(2, 4, 4)
    np.testing.assert_array_equal(rgba[..., :3], px)
    match = (px.astype(int) == np.array([1, 2, 3])).all(axis=2)
    np.testing.assert_array_equal(
        rgba[..., 3], np.where(match, 0, 65535)
    )
    # out-of-range transparent sample still refused at every depth
    with pytest.raises(ValueError, match="out of range"):
        png.encode_png(bytes(4 * 4 * 2), 4, 4, 1, depth=16,
                       transparent=70000)
