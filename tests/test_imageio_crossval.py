"""Independent cross-validation of the PNG and JPEG codecs against the
JVM's ``javax.imageio`` via Spark's built-in ``image`` data source — a
completely separate implementation (Java, not our Python): the same
independence the WAV codec gets from the stdlib ``wave`` module.

* PNG: ImageIO must decode our encoder's output PIXEL-EXACT (lossless).
* JPEG: two independent decoders of our bitstream (ImageIO and ours)
  must agree to sub-gray-level MAE (residual = IDCT rounding), and both
  must sit within quantization distance of the pre-encode original — a
  spec-invalid bitstream or an unfaithful decoder breaks one or both.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from solarboat_data_pipeline_spark.operators import jpeg, png


def _pattern(h: int, w: int, ch: int) -> np.ndarray:
    y, x = np.mgrid[0:h, 0:w]
    planes = [((x * (7 + 2 * c) + y * (13 - 3 * c) + 11 * c) % 256) for c in range(ch)]
    return np.stack(planes, axis=-1).astype(np.uint8)


def _imageio_decode(spark, path: str):
    """Decode one image file with javax.imageio; returns (h, w, ch, RGB
    array) — the image source stores channels in OpenCV BGR order."""
    r = (
        spark.read.format("image")
        .load(path)
        .select("image.height", "image.width", "image.nChannels", "image.data")
        .first()
    )
    arr = np.frombuffer(bytes(r["data"]), np.uint8).reshape(
        r["height"], r["width"], r["nChannels"]
    )
    if r["nChannels"] == 3:  # OpenCV BGR → RGB
        rgb = arr[:, :, ::-1]
    elif r["nChannels"] == 4:  # OpenCV BGRA → RGBA
        rgb = arr[:, :, [2, 1, 0, 3]]
    else:
        rgb = arr
    return r["height"], r["width"], r["nChannels"], rgb


@pytest.mark.parametrize("h,w", [(6, 9), (8, 8), (11, 5)])
def test_imageio_decodes_our_png_pixel_exact(spark, tmp_path, h, w):
    px = _pattern(h, w, 3)
    p = os.path.join(str(tmp_path), "t.png")
    with open(p, "wb") as f:
        f.write(png.encode_png(px.tobytes(), w, h, 3, filter_type="cycle"))
    H, W, C, rgb = _imageio_decode(spark, p)
    assert (H, W, C) == (h, w, 3)
    np.testing.assert_array_equal(rgb, px)


def test_imageio_decodes_our_gray_png_pixel_exact(spark, tmp_path):
    px = _pattern(7, 10, 1)
    p = os.path.join(str(tmp_path), "g.png")
    with open(p, "wb") as f:
        f.write(png.encode_png(px.tobytes(), 10, 7, 1, filter_type=4))
    H, W, C, got = _imageio_decode(spark, p)
    assert (H, W) == (7, 10)
    np.testing.assert_array_equal(got.reshape(7, 10, -1)[:, :, :1], px)


@pytest.mark.parametrize("h,w", [(6, 9), (8, 8), (13, 11)])
def test_imageio_decodes_our_interlaced_png_pixel_exact(spark, tmp_path, h, w):
    px = _pattern(h, w, 3)
    p = os.path.join(str(tmp_path), "i.png")
    with open(p, "wb") as f:
        f.write(png.encode_png(px.tobytes(), w, h, 3, filter_type="cycle", interlace=True))
    H, W, C, rgb = _imageio_decode(spark, p)
    assert (H, W, C) == (h, w, 3)
    np.testing.assert_array_equal(rgb, px)


@pytest.mark.parametrize("interlace", [False, True])
def test_imageio_decodes_our_palette_png_pixel_exact(spark, tmp_path, interlace):
    h, w = 9, 14
    rng = np.random.default_rng(17)
    pal = rng.integers(0, 256, size=(256, 3), dtype=np.uint8)
    idx = rng.integers(0, 256, size=h * w, dtype=np.uint8)
    p = os.path.join(str(tmp_path), "p.png")
    with open(p, "wb") as f:
        f.write(
            png.encode_png_palette(
                idx.tobytes(), w, h, pal, filter_type="cycle", interlace=interlace
            )
        )
    H, W, C, rgb = _imageio_decode(spark, p)
    assert (H, W, C) == (h, w, 3)
    np.testing.assert_array_equal(rgb, pal[idx.reshape(h, w)])
    # and our own decoder expands the PLTE to the same RGB
    with open(p, "rb") as f:
        dw, dh, dch, ours = png.decode_png(f.read())
    assert (dw, dh, dch) == (w, h, 3)
    np.testing.assert_array_equal(
        np.frombuffer(ours, np.uint8).reshape(h, w, 3), pal[idx.reshape(h, w)]
    )


@pytest.mark.parametrize("h,w,ch", [(6, 9, 3), (16, 16, 3), (8, 8, 1)])
def test_imageio_agrees_with_our_jpeg_decoder(spark, tmp_path, h, w, ch):
    px = _pattern(h, w, ch)
    data = jpeg.encode_jpeg(px.tobytes(), w, h, ch)
    p = os.path.join(str(tmp_path), "t.jpg")
    with open(p, "wb") as f:
        f.write(data)
    H, W, C, theirs = _imageio_decode(spark, p)
    assert (H, W) == (h, w)
    _, _, _, ours_bytes = jpeg.decode_jpeg(data)
    ours = np.frombuffer(ours_bytes, np.uint8).reshape(h, w, ch)
    if C != ch:  # ImageIO may upconvert grayscale JPEG to 3 channels
        theirs = theirs.reshape(h, w, C)[:, :, :1]
    # independent decoders of the SAME bitstream: sub-gray-level accord
    mae_decoders = np.abs(theirs.astype(int) - ours.astype(int)).mean()
    assert mae_decoders < 1.5, mae_decoders
    # and both within quantization distance of the original
    mae_orig = np.abs(theirs.astype(int) - px.astype(int)).mean()
    assert mae_orig < 12, mae_orig


def test_imageio_decodes_our_16bit_gray_png_sample_exact(spark, tmp_path):
    """16-bit gray PNGs through javax.imageio's raster API (the Spark
    image source is 8-bit-only, so read samples via py4j): every 16-bit
    sample must match our encoder's input exactly."""
    jvm = spark._jvm
    h, w = 6, 9
    rng = np.random.default_rng(43)
    px = rng.integers(0, 65536, size=(h, w, 1)).astype(">u2")
    p = os.path.join(str(tmp_path), "g16.png")
    with open(p, "wb") as f:
        f.write(png.encode_png(px.tobytes(), w, h, 1, filter_type="cycle", depth=16))
    img = jvm.javax.imageio.ImageIO.read(jvm.java.io.File(p))
    raster = img.getRaster()
    assert img.getWidth() == w and img.getHeight() == h
    got = np.array(
        [[raster.getSample(x, y, 0) for x in range(w)] for y in range(h)]
    )
    np.testing.assert_array_equal(got, px[:, :, 0].astype(np.int64))
    # and our own decoder round-trips the same file
    with open(p, "rb") as f:
        W, H, C, out = png.decode_png16(f.read())
    np.testing.assert_array_equal(
        np.frombuffer(out, dtype=">u2").reshape(h, w, 1), px
    )


def test_imageio_decodes_our_palette_trns_png_pixel_exact(spark, tmp_path):
    h, w = 7, 12
    rng = np.random.default_rng(29)
    pal = rng.integers(0, 256, size=(32, 3), dtype=np.uint8)
    alphas = rng.integers(0, 256, size=20, dtype=np.uint8)
    idx = rng.integers(0, 32, size=h * w, dtype=np.uint8)
    p = os.path.join(str(tmp_path), "pt.png")
    with open(p, "wb") as f:
        f.write(
            png.encode_png_palette(
                idx.tobytes(), w, h, pal, filter_type="cycle", trns=alphas
            )
        )
    H, W, C, rgba = _imageio_decode(spark, p)
    assert (H, W, C) == (h, w, 4)
    full_a = np.full(32, 255, np.uint8)
    full_a[:20] = alphas
    expect = np.concatenate([pal, full_a[:, None]], axis=1)[idx.reshape(h, w)]
    np.testing.assert_array_equal(rgba, expect)
    # and our own decoder agrees byte-for-byte
    with open(p, "rb") as f:
        dw, dh, dch, ours = png.decode_png(f.read())
    assert (dw, dh, dch) == (w, h, 4)
    np.testing.assert_array_equal(
        np.frombuffer(ours, np.uint8).reshape(h, w, 4), expect
    )


@pytest.mark.parametrize("h,w,sub", [(16, 16, "444"), (9, 21, "444"), (24, 32, "420")])
def test_imageio_decodes_our_progressive_jpeg(spark, tmp_path, h, w, sub):
    """Our SOF2 streams (spectral selection + successive approximation)
    through an independent decoder: full-RGB agreement for 4:4:4, luma
    agreement for 4:2:0 (chroma upsample filters legitimately differ)."""
    px = _pattern(h, w, 3)
    data = jpeg.encode_jpeg(px.tobytes(), w, h, 3, subsampling=sub, progressive=True)
    assert b"\xff\xc2" in data  # SOF2
    p = os.path.join(str(tmp_path), f"prog{sub}.jpg")
    with open(p, "wb") as f:
        f.write(data)
    H, W, C, theirs = _imageio_decode(spark, p)
    assert (H, W, C) == (h, w, 3)
    _, _, _, ours_bytes = jpeg.decode_jpeg(data)
    ours = np.frombuffer(ours_bytes, np.uint8).reshape(h, w, 3)
    if sub == "444":
        mae = np.abs(theirs.astype(int) - ours.astype(int)).mean()
        assert mae < 1.5, mae
    else:
        mae = np.abs(_luma(theirs) - _luma(ours)).mean()
        assert mae < 1.5, mae


def test_our_decoder_handles_imageio_written_progressive(spark, tmp_path):
    """The full-independence check: javax.imageio WRITES a progressive
    JPEG (its own scan script, optimized Huffman tables — nothing shared
    with our encoder) and our decoder must read it in luma agreement
    with ImageIO's own decode of the same stream."""
    jvm = spark._jvm
    h, w = 24, 32
    y, x = np.mgrid[0:h, 0:w]
    base = np.clip(16 + 3 * x + 5 * y, 0, 200)
    px = np.stack([base, base + 7, base + 14], axis=-1).astype(np.uint8)
    bi = jvm.java.awt.image.BufferedImage(
        w, h, jvm.java.awt.image.BufferedImage.TYPE_3BYTE_BGR
    )
    for yy in range(h):
        for xx in range(w):
            r_, g_, b_ = (int(px[yy, xx, c]) for c in range(3))
            bi.setRGB(xx, yy, (r_ << 16) | (g_ << 8) | b_)
    writer = jvm.javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    param = writer.getDefaultWriteParam()
    param.setProgressiveMode(jvm.javax.imageio.ImageWriteParam.MODE_DEFAULT)
    p = os.path.join(str(tmp_path), "foreign_prog.jpg")
    ios = jvm.javax.imageio.ImageIO.createImageOutputStream(jvm.java.io.File(p))
    writer.setOutput(ios)
    writer.write(None, jvm.javax.imageio.IIOImage(bi, None, None), param)
    ios.close()
    writer.dispose()
    with open(p, "rb") as f:
        data = f.read()
    assert b"\xff\xc2" in data  # genuinely progressive
    W, H, C, out = jpeg.decode_jpeg(data)
    assert (W, H, C) == (w, h, 3)
    ours = np.frombuffer(out, np.uint8).reshape(h, w, 3)
    _, _, _, theirs = _imageio_decode(spark, p)
    # chroma-smooth fixture: full-RGB agreement within upsample-filter
    # distance, luma at IDCT-noise level
    assert np.abs(_luma(theirs) - _luma(ours)).mean() < 1.5
    assert np.abs(theirs.astype(int) - ours.astype(int)).mean() < 4.0
    # and both track the original within quantization distance
    assert np.abs(ours.astype(int) - px.astype(int)).mean() < 12


@pytest.mark.parametrize("ri", [2, 5])
def test_imageio_agrees_with_our_dri_jpeg(spark, tmp_path, ri):
    """Restart-interval bitstreams: javax.imageio (libjpeg lineage) must
    decode our DRI/RSTn stream in sub-gray-level agreement with our own
    decoder — wrong predictor resets or misaligned restarts would
    diverge wildly."""
    h, w = 24, 32
    px = _pattern(h, w, 3)
    data = jpeg.encode_jpeg(px.tobytes(), w, h, 3, restart_interval=ri)
    p = os.path.join(str(tmp_path), f"dri{ri}.jpg")
    with open(p, "wb") as f:
        f.write(data)
    H, W, C, theirs = _imageio_decode(spark, p)
    assert (H, W, C) == (h, w, 3)
    _, _, _, ours_bytes = jpeg.decode_jpeg(data)
    ours = np.frombuffer(ours_bytes, np.uint8).reshape(h, w, 3)
    mae = np.abs(theirs.astype(int) - ours.astype(int)).mean()
    assert mae < 1.5, mae


def _luma(rgb: np.ndarray) -> np.ndarray:
    return (
        0.299 * rgb[..., 0].astype(float)
        + 0.587 * rgb[..., 1].astype(float)
        + 0.114 * rgb[..., 2].astype(float)
    )


@pytest.mark.parametrize("h,w", [(16, 16), (9, 21), (32, 24)])
def test_imageio_agrees_with_our_420_jpeg_decoder(spark, tmp_path, h, w):
    """The 4:2:0 bitstream is what libjpeg emits by default. ImageIO
    upsamples chroma with a triangle filter where we replicate samples —
    a legitimate decoder choice — so the sharp cross-decoder check is
    the LUMA plane (full resolution in 4:2:0, untouched by the chroma
    filter): recomputed Y from both decoders' RGB must agree to IDCT/
    rounding noise even on high-gradient content."""
    px = _pattern(h, w, 3)
    data = jpeg.encode_jpeg(px.tobytes(), w, h, 3, subsampling="420")
    p = os.path.join(str(tmp_path), "t420.jpg")
    with open(p, "wb") as f:
        f.write(data)
    H, W, C, theirs = _imageio_decode(spark, p)
    assert (H, W, C) == (h, w, 3)
    _, _, _, ours_bytes = jpeg.decode_jpeg(data)
    ours = np.frombuffer(ours_bytes, np.uint8).reshape(h, w, 3)
    mae_luma = np.abs(_luma(theirs) - _luma(ours)).mean()
    assert mae_luma < 1.5, mae_luma


@pytest.mark.parametrize("h,w", [(16, 16), (9, 21), (32, 24)])
def test_imageio_agrees_with_our_420_jpeg_decoder_full_rgb(spark, tmp_path, h, w):
    """On chroma-smooth content (constant Cb/Cr — the MJPEG fixture
    family) replicate- and triangle-upsampling coincide, so full-RGB
    cross-decoder agreement is back to sub-gray-level, and both
    decoders track the original within quantization distance."""
    y, x = np.mgrid[0:h, 0:w]
    base = np.clip(16 + 3 * x + 5 * y, 0, 200)
    px = np.stack([base, base + 7, base + 14], axis=-1).astype(np.uint8)
    data = jpeg.encode_jpeg(px.tobytes(), w, h, 3, subsampling="420")
    p = os.path.join(str(tmp_path), "t420s.jpg")
    with open(p, "wb") as f:
        f.write(data)
    H, W, C, theirs = _imageio_decode(spark, p)
    assert (H, W, C) == (h, w, 3)
    _, _, _, ours_bytes = jpeg.decode_jpeg(data)
    ours = np.frombuffer(ours_bytes, np.uint8).reshape(h, w, 3)
    mae_decoders = np.abs(theirs.astype(int) - ours.astype(int)).mean()
    assert mae_decoders < 1.5, mae_decoders
    mae_orig = np.abs(theirs.astype(int) - px.astype(int)).mean()
    assert mae_orig < 12, mae_orig


@pytest.mark.parametrize("depth", [1, 2, 4])
@pytest.mark.parametrize("interlace", [False, True])
def test_imageio_decodes_our_sub8_palette_png_pixel_exact(
    spark, tmp_path, depth, interlace
):
    """Sub-8-bit palette PNGs — the legacy icon/favicon form. ImageIO's
    independent implementation must expand our packed-index scanlines to
    the identical RGB image, and our own decoder must agree."""
    h, w = 11, 13  # odd width: scanlines carry padding bits
    rng = np.random.default_rng(23 + depth)
    n = 1 << depth
    pal = rng.integers(0, 256, size=(n, 3), dtype=np.uint8)
    idx = rng.integers(0, n, size=h * w, dtype=np.uint8)
    p = os.path.join(str(tmp_path), f"p{depth}.png")
    with open(p, "wb") as f:
        f.write(
            png.encode_png_palette(
                idx.tobytes(), w, h, pal, filter_type="cycle",
                interlace=interlace, depth=depth,
            )
        )
    H, W, C, rgb = _imageio_decode(spark, p)
    assert (H, W, C) == (h, w, 3)
    np.testing.assert_array_equal(rgb, pal[idx.reshape(h, w)])
    with open(p, "rb") as f:
        dw, dh, dch, ours = png.decode_png(f.read())
    assert (dw, dh, dch) == (w, h, 3)
    np.testing.assert_array_equal(
        np.frombuffer(ours, np.uint8).reshape(h, w, 3), pal[idx.reshape(h, w)]
    )


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_imageio_decodes_our_sub8_gray_png_pixel_exact(spark, tmp_path, depth):
    """Sub-8-bit grayscale: ImageIO expands the packed levels with the
    same bit-replication our decoder uses (1-bit x255, 2-bit x85,
    4-bit x17), so both must agree pixel-exact."""
    h, w = 7, 11
    rng = np.random.default_rng(31 + depth)
    s = rng.integers(0, 1 << depth, size=(h, w), dtype=np.uint8)
    p = os.path.join(str(tmp_path), f"g{depth}.png")
    with open(p, "wb") as f:
        f.write(
            png.encode_png(
                s.tobytes(), w, h, 1, filter_type="cycle", depth=depth
            )
        )
    H, W, C, got = _imageio_decode(spark, p)
    assert (H, W) == (h, w)
    want = (s * (255 // ((1 << depth) - 1))).astype(np.uint8)
    np.testing.assert_array_equal(got.reshape(h, w, -1)[:, :, 0], want)
    with open(p, "rb") as f:
        dw, dh, dch, ours = png.decode_png(f.read())
    assert (dw, dh, dch) == (w, h, 1)
    np.testing.assert_array_equal(
        np.frombuffer(ours, np.uint8).reshape(h, w), want
    )


@pytest.mark.parametrize("h,w", [(16, 16), (9, 21), (32, 24)])
def test_imageio_agrees_with_our_triangle_420_decoder_full_rgb_gradient(
    spark, tmp_path, h, w
):
    """Round-7: with chroma_upsample='triangle' our decoder uses the
    same center-aligned linear filter libjpeg/ImageIO apply, so the
    4:2:0 cross-decoder check tightens from luma-only to FULL-RGB MAE
    on high-gradient content — chroma included. The replicate decode of
    the same stream measurably disagrees more, proving the filter (not
    the gate width) closed the gap."""
    px = _pattern(h, w, 3)  # high-gradient in every channel
    data = jpeg.encode_jpeg(px.tobytes(), w, h, 3, subsampling="420")
    p = os.path.join(str(tmp_path), "t420t.jpg")
    with open(p, "wb") as f:
        f.write(data)
    H, W, C, theirs = _imageio_decode(spark, p)
    assert (H, W, C) == (h, w, 3)
    _, _, _, tri_bytes = jpeg.decode_jpeg(data, chroma_upsample="triangle")
    tri = np.frombuffer(tri_bytes, np.uint8).reshape(h, w, 3)
    mae_tri = np.abs(theirs.astype(int) - tri.astype(int)).mean()
    assert mae_tri < 2.0, mae_tri
    _, _, _, rep_bytes = jpeg.decode_jpeg(data)
    rep = np.frombuffer(rep_bytes, np.uint8).reshape(h, w, 3)
    mae_rep = np.abs(theirs.astype(int) - rep.astype(int)).mean()
    assert mae_rep > mae_tri, (mae_rep, mae_tri)
