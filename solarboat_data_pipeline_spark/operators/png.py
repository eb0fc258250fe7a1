"""Pure-stdlib PNG codec + resize kernels (``zlib`` + ``struct`` only).

The PNG format is public (RFC 2083 / ISO 15948): a signature, a chunk
stream (length, type, payload, CRC32), IHDR metadata, zlib-compressed
IDAT pixel data where every scanline is prefixed by one of five filter
types (None/Sub/Up/Average/Paeth). This module implements enough of it —
honestly and completely within its stated envelope — to make the
multimodal decode kernel REAL instead of a stub:

* :func:`encode_png` — 1/2/4-bit grayscale (packed sub-byte
  scanlines), 8- or 16-bit color types 0 (gray), 2 (RGB),
  4 (gray+alpha), 6 (RGBA); optionally Adam7-interlaced; optional
  single-transparent-color tRNS at every depth; per-scanline filter
  selection is caller-controlled so tests exercise every filter's
  decode path.
* :func:`encode_png_palette` — color type 3 (indexed) at depths
  1/2/4/8: a PLTE chunk of up to 256 RGB entries plus an index stream
  (the most common web PNG form, sub-byte depths being the legacy
  icon/favicon layout), optional per-entry tRNS alpha, optionally
  Adam7-interlaced.
* :func:`decode_png` — depths 1/2/4 (gray/palette) and 8 (all color
  types 0/2/3/4/6), interlace methods 0 and 1/Adam7; palette images
  are expanded to 3-channel RGB, or 4-channel RGBA when a palette tRNS
  chunk supplies per-entry alpha; sub-8-bit gray expands by exact bit
  replication; gray/RGB single-transparent-color tRNS decodes to an
  extra alpha channel. :func:`decode_png16` — the 16-bit sibling
  (big-endian uint16 samples out, 16-bit tRNS included). Both raise
  ``ValueError`` with the precise reason on anything outside the
  envelope (truncated/corrupt streams, CRC mismatch, illegal
  depth/color-type combinations) — never garbage silently.
* :func:`resize_nearest` / :func:`resize_bilinear` — resampling on the
  decoded array (numpy, vectorized — this runs inside Arrow-batched
  ``mapInPandas`` workers, so it must not be a per-pixel Python loop).

Reference parity: the reference pipeline has no image path (its media
handling stops at opaque blobs); this kernel exists for the
training-data-pipeline surface (multimodal decode/resize) that the
engine adds on top. Decode correctness is proven two independent ways:
encode→decode round-trips across all filter/color-type/interlace
combinations in ``tests/test_png.py``, and the driver oracle recomputes
decoded pixel statistics arithmetically from the generator formula
(DuckDB never sees the PNG bytes — if any stage of signature/IHDR/PLTE/
zlib/unfilter/de-interlace is wrong, the sums cannot match).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

#: channels per color type within the supported (8-bit) envelope;
#: color type 3 (palette) is handled separately — 1 byte/pixel on the
#: wire, expanded to 3-channel RGB on decode
_CHANNELS_BY_COLOR_TYPE = {0: 1, 2: 3, 4: 2, 6: 4}
_COLOR_TYPE_BY_CHANNELS = {v: k for k, v in _CHANNELS_BY_COLOR_TYPE.items()}

#: Adam7 pass layout (PNG spec §8.2): (x_start, y_start, x_step, y_step)
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
    )


def _paeth_vec(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor (PNG spec §6.6), vectorized; operands are int16+
    arrays so the |p - x| arithmetic cannot wrap."""
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def _filter_scanlines(
    img: np.ndarray, bpp: int, filter_type: int | str
) -> bytearray:
    """Apply per-scanline filters to a (rows, stride) uint8 image and
    return the filtered byte stream (1 filter-type byte + stride bytes
    per row). ``filter_type``: 0-4 fixed, or ``"cycle"`` = ``row % 5``.
    The prior row starts at zero — callers emitting Adam7 passes call
    this once per pass, which resets the Up/Average/Paeth recurrence at
    the pass boundary exactly as the spec requires."""
    rows, stride = img.shape
    out = bytearray()
    prior = np.zeros(stride, dtype=np.uint8)
    for y in range(rows):
        raw = img[y]
        ft = (y % 5) if filter_type == "cycle" else int(filter_type)
        left = np.concatenate([np.zeros(bpp, np.uint8), raw[:-bpp]]) if raw.size > 0 else raw
        up_left = (
            np.concatenate([np.zeros(bpp, np.uint8), prior[:-bpp]])
            if prior.size > 0
            else prior
        )
        if ft == 0:
            filt = raw
        elif ft == 1:  # Sub
            filt = raw - left
        elif ft == 2:  # Up
            filt = raw - prior
        elif ft == 3:  # Average
            filt = raw - ((left.astype(np.uint16) + prior.astype(np.uint16)) // 2).astype(np.uint8)
        elif ft == 4:  # Paeth
            filt = raw - _paeth_vec(left, prior, up_left)
        else:
            raise ValueError(f"unknown filter type {ft}")
        out.append(ft)
        out.extend(filt.tobytes())
        prior = raw
    return out


def _unfilter_scanlines(flat: np.ndarray, bpp: int) -> np.ndarray:
    """Reconstruct a (rows, 1 + stride) filtered block into a
    (rows, stride) pixel array. The inverse of :func:`_filter_scanlines`
    — prior starts at zero, so Adam7 callers pass one block per pass."""
    rows = flat.shape[0]
    stride = flat.shape[1] - 1
    out = np.empty((rows, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.uint8)
    for y in range(rows):
        ft = int(flat[y, 0])
        line = flat[y, 1:].copy()
        if ft == 0:
            pass
        elif ft == 2:  # Up — fully vectorizable
            line += prior
        elif ft == 1:
            # Sub is a per-byte-lane prefix sum mod 256: recon[i] =
            # filt[i] + recon[i-bpp] — cumsum each lane, wrap via uint8
            line = (
                np.cumsum(line.reshape(stride // bpp, bpp), axis=0, dtype=np.int64)
                .astype(np.uint8)
                .reshape(stride)
            )
        elif ft in (3, 4):
            # Average/Paeth mix the UP input into the left recurrence,
            # so these two lanes are inherently sequential per scanline
            # (row-level parallelism comes from the Arrow batch above)
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                if ft == 3:
                    up = prior[i]
                    line[i] = (int(line[i]) + (int(left) + int(up)) // 2) & 0xFF
                else:
                    up = int(prior[i])
                    ul = int(prior[i - bpp]) if i >= bpp else 0
                    a, b, c = int(left), up, ul
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    line[i] = (int(line[i]) + pred) & 0xFF
        else:
            raise ValueError(f"corrupt PNG: unknown scanline filter {ft}")
        out[y] = line
        prior = line
    return out


def _pack_rows(samples: np.ndarray, depth: int) -> np.ndarray:
    """(rows, width) samples (each < 2**depth) → (rows,
    ceil(width·depth/8)) packed bytes, MSB-first within each byte with
    zero padding at row end (PNG spec §7.2: sub-8-bit scanlines pack
    left-to-right into bytes high-bit-first)."""
    if depth == 8:
        return samples
    rows, width = samples.shape
    per = 8 // depth
    pad = (-width) % per
    if pad:
        samples = np.concatenate(
            [samples, np.zeros((rows, pad), np.uint8)], axis=1
        )
    bits = np.unpackbits(samples[:, :, None], axis=2)[:, :, 8 - depth:]
    return np.packbits(bits.reshape(rows, -1), axis=1)


def _unpack_rows(packed: np.ndarray, width: int, depth: int) -> np.ndarray:
    """Inverse of :func:`_pack_rows`: (rows, stride_bytes) → (rows,
    width) one-byte-per-sample, discarding row-end padding bits."""
    if depth == 8:
        return packed
    rows = packed.shape[0]
    bits = np.unpackbits(packed, axis=1)[:, : width * depth]
    bits = bits.reshape(rows, width, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    return (bits * weights[None, None, :]).sum(axis=2).astype(np.uint8)


def _adam7_dims(width: int, height: int) -> list[tuple[int, int]]:
    """(pass_w, pass_h) for each of the 7 passes; empty passes are
    (0, 0) and contribute zero bytes to the stream (spec §8.2)."""
    dims = []
    for x0, y0, dx, dy in _ADAM7:
        pw = (width - x0 + dx - 1) // dx if width > x0 else 0
        ph = (height - y0 + dy - 1) // dy if height > y0 else 0
        dims.append((pw, ph) if pw > 0 and ph > 0 else (0, 0))
    return dims


def _serialize_image(
    img: np.ndarray, bpp: int, filter_type: int | str, interlace: bool,
    depth: int = 8,
) -> bytes:
    """Filter a (height, width·bpp) image into the pre-compression byte
    stream — sequentially, or as the 7 Adam7 sub-images. For sub-8-bit
    depths ``img`` is (height, width) one byte per SAMPLE; each scanline
    (each pass scanline, under Adam7) packs to bits independently before
    filtering — filters stay byte-wise at every depth (spec §7.3)."""
    if depth < 8:
        if not interlace:
            return bytes(_filter_scanlines(_pack_rows(img, depth), 1, filter_type))
        height, width = img.shape
        out = bytearray()
        for (x0, y0, dx, dy), (pw, ph) in zip(
            _ADAM7, _adam7_dims(width, height)
        ):
            if pw == 0:
                continue
            sub = np.ascontiguousarray(img[y0::dy, x0::dx])
            out.extend(_filter_scanlines(_pack_rows(sub, depth), 1, filter_type))
        return bytes(out)
    if not interlace:
        return bytes(_filter_scanlines(img, bpp, filter_type))
    height, stride = img.shape
    width = stride // bpp
    cube = img.reshape(height, width, bpp)
    out = bytearray()
    for (x0, y0, dx, dy), (pw, ph) in zip(_ADAM7, _adam7_dims(width, height)):
        if pw == 0:
            continue
        sub = cube[y0::dy, x0::dx].reshape(ph, pw * bpp)
        out.extend(_filter_scanlines(np.ascontiguousarray(sub), bpp, filter_type))
    return bytes(out)


def _ihdr(
    width: int, height: int, color_type: int, interlace: bool, depth: int = 8
) -> bytes:
    return struct.pack(
        ">IIBBBBB", width, height, depth, color_type, 0, 0, 1 if interlace else 0
    )


def encode_png(
    pixels: bytes | bytearray | np.ndarray,
    width: int,
    height: int,
    channels: int,
    filter_type: int | str = 0,
    interlace: bool = False,
    transparent: int | tuple[int, ...] | None = None,
    depth: int = 8,
) -> bytes:
    """Encode a row-major pixel buffer as a PNG — ``depth=8`` expects
    ``height·width·channels`` bytes, ``depth=16`` expects big-endian
    uint16 samples (``2·height·width·channels`` bytes, the layout
    ``np.ndarray(dtype=">u2").tobytes()`` produces), and the sub-8-bit
    depths 1/2/4 (grayscale only, per spec) expect ONE BYTE PER SAMPLE
    with values below ``2**depth`` — the encoder packs them MSB-first
    per scanline (decoding expands them back to 8-bit by exact bit
    replication).

    ``filter_type``: 0-4 applies that filter to every scanline;
    ``"cycle"`` uses ``row % 5`` — deliberately exercising all five
    decode paths in one image. ``interlace=True`` emits the Adam7
    7-pass layout (each pass filtered independently, per spec).
    ``transparent`` (gray value, or an (r, g, b) tuple; channels 1/3,
    depth 8 only) emits a tRNS chunk marking that exact color fully
    transparent — decode returns it as an extra alpha channel."""
    if channels not in _COLOR_TYPE_BY_CHANNELS:
        raise ValueError(f"unsupported channel count {channels}; use 1/2/3/4")
    if depth not in (1, 2, 4, 8, 16):
        raise ValueError(f"unsupported bit depth {depth}; use 1/2/4/8/16")
    if depth < 8 and channels != 1:
        raise ValueError(
            f"bit depth {depth} is legal for grayscale (channels=1) only"
        )
    nbytes = max(1, depth // 8)
    arr = np.frombuffer(bytes(pixels), dtype=np.uint8)
    if arr.size != width * height * channels * nbytes:
        raise ValueError(
            f"pixel buffer has {arr.size} bytes, expected "
            f"{width}x{height}x{channels}x{nbytes} = "
            f"{width * height * channels * nbytes}"
        )
    if depth < 8 and arr.size and int(arr.max()) >= (1 << depth):
        raise ValueError(
            f"sample {int(arr.max())} out of range for depth {depth} "
            f"(one byte per sample, values 0..{(1 << depth) - 1})"
        )
    trns_chunk = b""
    if transparent is not None:
        color = (
            (int(transparent),)
            if np.isscalar(transparent)
            else tuple(int(c) for c in transparent)
        )
        if channels not in (1, 3) or len(color) != channels:
            raise ValueError(
                "transparent color requires channels 1 (gray value) or "
                "3 ((r, g, b)) matching the image"
            )
        lim = 1 << min(depth, 16)
        if any(not (0 <= c < lim) for c in color):
            raise ValueError(
                f"transparent sample {color} out of range for depth {depth}"
            )
        trns_chunk = _chunk(b"tRNS", b"".join(struct.pack(">H", c) for c in color))
    bpp = channels * nbytes
    if depth < 8:
        img = arr.reshape(height, width)
    else:
        img = arr.reshape(height, width * bpp)
    raw = _serialize_image(img, bpp, filter_type, interlace, depth)
    return (
        _SIGNATURE
        + _chunk(
            b"IHDR",
            _ihdr(width, height, _COLOR_TYPE_BY_CHANNELS[channels], interlace, depth),
        )
        + trns_chunk
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def encode_png_palette(
    indices: bytes | bytearray | np.ndarray,
    width: int,
    height: int,
    palette: np.ndarray,
    filter_type: int | str = 0,
    interlace: bool = False,
    trns: np.ndarray | bytes | None = None,
    depth: int = 8,
) -> bytes:
    """Encode an indexed (color type 3) PNG: ``indices`` is one byte per
    pixel referencing ``palette`` — an ``(n, 3)`` uint8 RGB array,
    1 ≤ n ≤ 256. Every index must be < n (checked — a silent modulo here
    would corrupt images undetectably). ``trns`` optionally supplies
    per-palette-entry alpha bytes (≤ n entries; omitted entries are
    opaque per spec) — the common web form of transparent PNGs.
    ``depth`` of 1/2/4 packs the indices into sub-byte scanlines — the
    legacy icon/favicon form (every index must also be < 2**depth)."""
    pal = np.asarray(palette, dtype=np.uint8)
    if pal.ndim != 2 or pal.shape[1] != 3 or not (1 <= pal.shape[0] <= 256):
        raise ValueError("palette must be an (n, 3) uint8 array with 1 <= n <= 256")
    if depth not in (1, 2, 4, 8):
        raise ValueError(
            f"unsupported palette bit depth {depth}; use 1/2/4/8"
        )
    arr = np.frombuffer(bytes(indices), dtype=np.uint8)
    if arr.size != width * height:
        raise ValueError(
            f"index buffer has {arr.size} bytes, expected {width * height}"
        )
    if arr.size and int(arr.max()) >= min(pal.shape[0], 1 << depth):
        raise ValueError(
            f"palette index {int(arr.max())} out of range for "
            f"{pal.shape[0]}-entry palette at depth {depth}"
        )
    trns_chunk = b""
    if trns is not None:
        if isinstance(trns, np.ndarray):
            # astype(uint8) would silently wrap out-of-range alphas
            # (256 -> 0, fully transparent) — validate like the palette
            # index check above instead of corrupting quietly
            if trns.dtype != np.uint8:
                t64 = np.asarray(trns)
                if (not np.issubdtype(t64.dtype, np.integer)
                        or t64.size and (int(t64.min()) < 0
                                         or int(t64.max()) > 255)):
                    raise ValueError(
                        "tRNS alphas must be integers in 0..255 "
                        f"(got dtype {t64.dtype}"
                        + (f", range {int(t64.min())}..{int(t64.max())})"
                           if t64.size else ")")
                    )
                trns = t64.astype(np.uint8)
            ta = np.frombuffer(trns.tobytes(), dtype=np.uint8)
        else:
            ta = np.frombuffer(bytes(trns), dtype=np.uint8)
        if not (1 <= ta.size <= pal.shape[0]):
            raise ValueError(
                f"tRNS must have 1..{pal.shape[0]} entries, got {ta.size}"
            )
        trns_chunk = _chunk(b"tRNS", ta.tobytes())
    img = arr.reshape(height, width)
    raw = _serialize_image(img, 1, filter_type, interlace, depth)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", _ihdr(width, height, 3, interlace, depth))
        + _chunk(b"PLTE", pal.tobytes())
        + trns_chunk
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _deserialize_image(
    raw: bytes, width: int, height: int, bpp: int, interlace: bool,
    depth: int = 8,
) -> np.ndarray:
    """Unfilter (and de-interlace) the inflated IDAT stream into a
    (height, width·bpp) pixel array — or, for sub-8-bit depths, a
    (height, width) one-byte-per-sample array (each scanline's packed
    bits unpack after the byte-wise unfilter; under Adam7 each pass
    unpacks at its own width)."""
    if depth < 8:
        if not interlace:
            sb = (width * depth + 7) // 8
            expected = (sb + 1) * height
            if len(raw) != expected:
                raise ValueError(
                    f"corrupt PNG: inflated {len(raw)} bytes, expected "
                    f"{expected} for {width}x{height}@{depth}bit"
                )
            flat = np.frombuffer(raw, dtype=np.uint8).reshape(height, sb + 1)
            return _unpack_rows(_unfilter_scanlines(flat, 1), width, depth)
        dims = _adam7_dims(width, height)
        expected = sum(
            ph * (1 + (pw * depth + 7) // 8) for pw, ph in dims
        )
        if len(raw) != expected:
            raise ValueError(
                f"corrupt PNG: inflated {len(raw)} bytes, expected "
                f"{expected} for Adam7 {width}x{height}@{depth}bit"
            )
        out = np.empty((height, width), dtype=np.uint8)
        pos = 0
        for (x0, y0, dx, dy), (pw, ph) in zip(_ADAM7, dims):
            if pw == 0:
                continue
            sb = (pw * depth + 7) // 8
            nbytes = ph * (1 + sb)
            flat = np.frombuffer(
                raw[pos : pos + nbytes], dtype=np.uint8
            ).reshape(ph, 1 + sb)
            pos += nbytes
            out[y0::dy, x0::dx] = _unpack_rows(
                _unfilter_scanlines(flat, 1), pw, depth
            )
        return out
    stride = width * bpp
    if not interlace:
        expected = (stride + 1) * height
        if len(raw) != expected:
            raise ValueError(
                f"corrupt PNG: inflated {len(raw)} bytes, expected "
                f"{expected} for {width}x{height}x{bpp}"
            )
        flat = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
        return _unfilter_scanlines(flat, bpp)

    dims = _adam7_dims(width, height)
    expected = sum(ph * (1 + pw * bpp) for pw, ph in dims)
    if len(raw) != expected:
        raise ValueError(
            f"corrupt PNG: inflated {len(raw)} bytes, expected {expected} "
            f"for Adam7 {width}x{height}x{bpp}"
        )
    out = np.empty((height, width, bpp), dtype=np.uint8)
    pos = 0
    for (x0, y0, dx, dy), (pw, ph) in zip(_ADAM7, dims):
        if pw == 0:
            continue
        nbytes = ph * (1 + pw * bpp)
        flat = np.frombuffer(raw[pos : pos + nbytes], dtype=np.uint8).reshape(
            ph, 1 + pw * bpp
        )
        pos += nbytes
        sub = _unfilter_scanlines(flat, bpp).reshape(ph, pw, bpp)
        out[y0::dy, x0::dx] = sub
    return out.reshape(height, stride)


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG of depth ≤ 8 within the supported envelope (color
    types 0/2/3/4/6, depths 1/2/4 for gray/palette plus 8 everywhere,
    interlace methods 0 and 1) to ``(width, height, channels, row-major
    8-bit pixel bytes)``. Palette (type 3) images are expanded through
    their PLTE to 3-channel RGB (4-channel RGBA with palette tRNS);
    sub-8-bit gray levels expand by exact bit replication; gray/RGB
    single-transparent-color tRNS adds an alpha channel. 16-bit images
    are routed to :func:`decode_png16` — the 8-bit byte contract here
    never silently reinterprets them. Raises ``ValueError`` on
    malformed input or unsupported features — never returns garbage
    silently."""
    width, height, channels, depth, out = _decode_any(data)
    if depth != 8:
        raise ValueError(
            "unsupported PNG: bit depth 16 in decode_png — use decode_png16"
        )
    return width, height, channels, out


def decode_png16(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a 16-bit PNG (color types 0/2/4/6, interlace 0/1) to
    ``(width, height, channels, big-endian uint16 pixel bytes)`` —
    ``np.frombuffer(out, dtype=">u2")`` recovers the samples exactly.
    8-bit inputs are routed back to :func:`decode_png`'s contract."""
    width, height, channels, depth, out = _decode_any(data)
    if depth != 16:
        raise ValueError(
            f"decode_png16 expects bit depth 16, got {depth} — use decode_png"
        )
    return width, height, channels, out


def _decode_any(data: bytes) -> tuple[int, int, int, int, bytes]:
    if not isinstance(data, (bytes, bytearray, memoryview)):
        raise ValueError("decode_png expects a bytes-like payload")
    data = bytes(data)
    if not data.startswith(_SIGNATURE):
        raise ValueError("not a PNG: bad signature")

    pos = len(_SIGNATURE)
    width = height = channels = -1
    color_type = interlace = 0
    depth = 8
    palette: np.ndarray | None = None
    trns: np.ndarray | None = None
    idat = bytearray()
    seen_ihdr = seen_iend = False
    while pos < len(data):
        if pos + 8 > len(data):
            raise ValueError("truncated PNG: chunk header past end of data")
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body_end = pos + 8 + length
        if body_end + 4 > len(data):
            raise ValueError(f"truncated PNG: {ctype!r} chunk past end of data")
        payload = data[pos + 8 : body_end]
        (crc,) = struct.unpack(">I", data[body_end : body_end + 4])
        if crc != (zlib.crc32(ctype + payload) & 0xFFFFFFFF):
            raise ValueError(f"corrupt PNG: CRC mismatch in {ctype!r} chunk")
        pos = body_end + 4

        if ctype == b"IHDR":
            if seen_ihdr:
                raise ValueError("corrupt PNG: duplicate IHDR")
            if length != 13:
                raise ValueError("corrupt PNG: IHDR length != 13")
            width, height, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth not in (1, 2, 4, 8, 16):
                raise ValueError(
                    f"unsupported PNG: bit depth {depth} (only 1/2/4/8/16)"
                )
            if color_type != 3 and color_type not in _CHANNELS_BY_COLOR_TYPE:
                raise ValueError(
                    f"unsupported PNG: color type {color_type} (only 0/2/3/4/6)"
                )
            if depth == 16 and color_type == 3:
                raise ValueError("corrupt PNG: 16-bit palette images are not legal")
            if depth < 8 and color_type not in (0, 3):
                # spec §11.2.2: sub-8 depths exist only for grayscale
                # and palette images
                raise ValueError(
                    f"corrupt PNG: bit depth {depth} is not legal for "
                    f"color type {color_type}"
                )
            if comp != 0 or filt != 0:
                raise ValueError("unsupported PNG: nonzero compression/filter method")
            if interlace not in (0, 1):
                raise ValueError(f"unsupported PNG: interlace method {interlace}")
            if width <= 0 or height <= 0:
                raise ValueError("corrupt PNG: non-positive dimensions")
            channels = 1 if color_type == 3 else _CHANNELS_BY_COLOR_TYPE[color_type]
            seen_ihdr = True
        elif ctype == b"PLTE":
            if not seen_ihdr:
                raise ValueError("corrupt PNG: PLTE before IHDR")
            if length == 0 or length % 3 != 0 or length > 768:
                raise ValueError("corrupt PNG: PLTE length not a multiple of 3 in 3..768")
            if palette is not None:
                raise ValueError("corrupt PNG: duplicate PLTE")
            if idat:
                raise ValueError("corrupt PNG: PLTE after IDAT")
            palette = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            if not seen_ihdr:
                raise ValueError("corrupt PNG: tRNS before IHDR")
            if trns is not None:
                raise ValueError("corrupt PNG: duplicate tRNS")
            if idat:
                raise ValueError("corrupt PNG: tRNS after IDAT")
            if color_type == 3:
                # palette transparency: one alpha byte per palette entry
                # (short tables imply 255 for the rest) — decoded below
                # by expanding to RGBA
                if palette is None:
                    raise ValueError("corrupt PNG: tRNS before PLTE")
                if length > palette.shape[0]:
                    raise ValueError(
                        "corrupt PNG: tRNS longer than the palette"
                    )
                trns = np.frombuffer(payload, dtype=np.uint8)
            elif color_type in (0, 2):
                # single transparent-color tRNS: 2 bytes per sample
                # (16-bit fields even at depth 8 — low byte significant)
                want = 2 if color_type == 0 else 6
                if length != want:
                    raise ValueError(
                        f"corrupt PNG: tRNS length {length} for color "
                        f"type {color_type} (expected {want})"
                    )
                # keep the full 16-bit field: a value > 255 is legal in
                # the chunk but can never match a depth-8 pixel — a u8
                # truncation here would create spurious transparency
                trns = np.frombuffer(payload, dtype=">u2").astype(np.int32)
            else:
                # gray+alpha / RGBA already carry alpha; a tRNS chunk on
                # them is spec-invalid
                raise ValueError(
                    f"corrupt PNG: tRNS chunk on color type {color_type}"
                )
        elif ctype == b"IDAT":
            if not seen_ihdr:
                raise ValueError("corrupt PNG: IDAT before IHDR")
            idat.extend(payload)
        elif ctype == b"IEND":
            seen_iend = True
            break
        # ancillary chunks (tEXt, pHYs, ...) are CRC-checked and skipped

    if not seen_ihdr:
        raise ValueError("corrupt PNG: missing IHDR")
    if not seen_iend:
        raise ValueError("truncated PNG: missing IEND")
    if not idat:
        raise ValueError("corrupt PNG: no IDAT data")
    if color_type == 3 and palette is None:
        raise ValueError("corrupt PNG: palette image missing PLTE")

    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise ValueError(f"corrupt PNG: zlib inflate failed ({exc})") from exc

    # PNG filters operate on BYTES at every depth (spec §7.3): at 16-bit
    # the per-pixel byte count simply doubles; below 8 bits the samples
    # pack into bits and the filter stride is the packed byte count
    bpp = max(1, channels * (depth // 8))
    out = _deserialize_image(raw, width, height, bpp, interlace == 1, depth)
    if depth == 16:
        if trns is not None:
            # 16-bit gray/RGB single-transparent-color (round 7 — the
            # last tRNS form): the chunk's 16-bit fields compare against
            # the full-precision samples; matching pixels get alpha 0,
            # the rest 65535, output grows one big-endian u16 channel
            px = np.frombuffer(out.tobytes(), dtype=">u2").reshape(
                height, width, channels
            )
            match = (px.astype(np.int64) == trns[None, None, :]).all(axis=2)
            alpha = np.where(match, 0, 65535).astype(">u2")
            # concatenate PROMOTES byte-swapped dtypes to native order
            # (values kept, wire order lost) — pin big-endian before
            # serializing
            return (
                width, height, channels + 1, 16,
                np.concatenate([px, alpha[:, :, None]], axis=2)
                .astype(">u2").tobytes(),
            )
        return width, height, channels, 16, out.tobytes()
    raw_samples = out
    if depth < 8 and color_type == 0:
        # expand sub-8 gray levels to the 8-bit output contract by exact
        # bit replication (1-bit ×255, 2-bit ×85, 4-bit ×17); tRNS below
        # compares the RAW sample value per spec
        out = (out * (255 // ((1 << depth) - 1))).astype(np.uint8)

    if color_type == 3:
        assert palette is not None
        idx = out.reshape(height, width)
        if int(idx.max()) >= palette.shape[0]:
            raise ValueError(
                f"corrupt PNG: palette index {int(idx.max())} out of range "
                f"for {palette.shape[0]}-entry PLTE"
            )
        if trns is not None:
            # expand through an RGBA palette: tRNS alphas for the first
            # len(trns) entries, 255 (opaque) for the rest (PNG §11.3.2)
            alphas = np.full(palette.shape[0], 255, dtype=np.uint8)
            alphas[: trns.shape[0]] = trns
            rgba = np.concatenate([palette, alphas[:, None]], axis=1)
            return width, height, 4, 8, rgba[idx].tobytes()
        return width, height, 3, 8, palette[idx].tobytes()
    if trns is not None:
        # gray/RGB single-transparent-color: pixels matching the tRNS
        # color get alpha 0, everything else 255 — output grows one
        # alpha channel (silently dropping it would decode a
        # transparent image as opaque). The match runs on the RAW
        # samples (pre-expansion at sub-8 depths, per spec §11.3.2)
        px = out.reshape(height, width, channels)
        px_raw = raw_samples.reshape(height, width, channels)
        match = (px_raw.astype(np.int32) == trns[None, None, :]).all(axis=2)
        alpha = np.where(match, 0, 255).astype(np.uint8)
        return (
            width,
            height,
            channels + 1,
            8,
            np.concatenate([px, alpha[:, :, None]], axis=2).tobytes(),
        )
    return width, height, channels, 8, out.tobytes()


def resize_nearest(
    pixels: bytes, width: int, height: int, channels: int, tw: int, th: int
) -> bytes:
    """Nearest-neighbor resize with the floor mapping
    ``src = (dst · src_dim) // dst_dim`` — exact integer arithmetic, so
    the driver oracle can recompute the result without decoding."""
    if tw <= 0 or th <= 0:
        raise ValueError("target dimensions must be positive")
    img = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, channels)
    ys = (np.arange(th, dtype=np.int64) * height) // th
    xs = (np.arange(tw, dtype=np.int64) * width) // tw
    return img[ys][:, xs].tobytes()


def resize_bilinear(
    pixels: bytes, width: int, height: int, channels: int, tw: int, th: int
) -> bytes:
    """Bilinear resize, half-pixel-center mapping
    ``src = (dst + 0.5)·(s/t) − 0.5`` clamped to the image, blended in
    float64 and rounded ``floor(v + 0.5)`` — fully deterministic."""
    if tw <= 0 or th <= 0:
        raise ValueError("target dimensions must be positive")
    img = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, channels)
    img = img.astype(np.float64)

    def axis(src: int, dst: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        pos = np.clip((np.arange(dst) + 0.5) * (src / dst) - 0.5, 0.0, src - 1.0)
        lo = np.floor(pos).astype(np.int64)
        hi = np.minimum(lo + 1, src - 1)
        return lo, hi, pos - lo

    y0, y1, fy = axis(height, th)
    x0, x1, fx = axis(width, tw)
    fy = fy[:, None, None]
    fx = fx[None, :, None]
    top = img[y0][:, x0] * (1 - fx) + img[y0][:, x1] * fx
    bot = img[y1][:, x0] * (1 - fx) + img[y1][:, x1] * fx
    out = top * (1 - fy) + bot * fy
    return np.floor(out + 0.5).astype(np.uint8).tobytes()
