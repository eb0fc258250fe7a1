"""Pure-stdlib+numpy baseline JPEG codec (ITU-T T.81, public spec).

The last multimodal decode stub was COMPRESSED video; MJPEG — a
sequence of baseline JPEG frames in an AVI container — is the simplest
real compressed-video format, and baseline JPEG itself is a public
standard: 8×8 FDCT, quantization (Annex K tables), zigzag, DC
prediction, Huffman coding (Annex K tables), 0xFF byte stuffing.

Envelope, implemented completely and honestly:

* :func:`encode_jpeg` — baseline sequential DCT, 8-bit, grayscale or
  YCbCr with 4:4:4 or 4:2:0 chroma sampling (2×2 box-downsampled
  chroma, interleaved MCUs — the shape every camera and libjpeg
  default emits), single scan, no restart markers, standard Annex K
  quantization + Huffman tables.
* :func:`decode_jpeg` — the same envelope generalized to any integer
  sampling-factor ratio (4:4:4, 4:2:0, 4:2:2, 4:4:0, 4:1:1; chroma
  upsampled by sample replication) plus restart intervals (DRI/RSTn
  with sequence verification and DC-predictor resets); raises
  ``ValueError`` with the precise reason on progressive scans,
  arithmetic coding, 12-bit precision or fractional sampling ratios —
  never returns garbage silently.

JPEG is LOSSY, so unlike the PNG/WAV/AVI twins the driver oracle
cannot recompute decoded pixel sums arithmetically. Correctness is
instead proven by: (a) decode∘encode fidelity — mean absolute error
against the pre-encode pixels bounded far below what any broken
Huffman/dequant/IDCT stage could achieve (asserted per-media in the
``mm_mjpeg_decode`` driver row and in ``tests/test_jpeg.py``), and
(b) frozen-vector exactness — our codec is fully deterministic, so
encode→decode of a fixed input pins every byte and every output pixel.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Annex K tables (ITU-T T.81 — public)
# ---------------------------------------------------------------------------

QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)
QUANT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)

# (bits-per-length counts, symbol values) — T.81 Annex K.3
DC_LUMA = (
    (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0),
    tuple(range(12)),
)
DC_CHROMA = (
    (0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0),
    tuple(range(12)),
)
AC_LUMA = (
    (0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D),
    (
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ),
)
AC_CHROMA = (
    (0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77),
    (
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ),
)

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
UNZIGZAG = np.argsort(ZIGZAG)

# 8x8 DCT-II basis matrix (orthonormal)
_k = np.arange(8)
_DCT = np.sqrt(2.0 / 8.0) * np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16.0)
_DCT[0, :] = np.sqrt(1.0 / 8.0)


def _huff_codes(spec) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical order per T.81 C.2."""
    counts, symbols = spec
    out: dict[int, tuple[int, int]] = {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[symbols[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


_ENC_TABLES = {
    "dc_l": _huff_codes(DC_LUMA),
    "dc_c": _huff_codes(DC_CHROMA),
    "ac_l": _huff_codes(AC_LUMA),
    "ac_c": _huff_codes(AC_CHROMA),
}


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec
        return bytes(self.buf)

    def restart_marker(self, seq: int) -> None:
        """1-pad to a byte boundary and emit RST(seq) — markers are not
        byte-stuffed (the padding byte, if it lands on 0xFF, is)."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        self.buf.append(0xFF)
        self.buf.append(0xD0 + (seq % 8))


def _magnitude(v: int) -> tuple[int, int]:
    """(size, amplitude bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _fdct_quant(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(n_blocks, 8, 8) level-shifted float blocks → quantized int32."""
    coef = np.einsum("ij,njk,lk->nil", _DCT, plane, _DCT)
    # round half away from zero — deterministic, matches the decoder's
    # expectations symmetric in sign
    scaled = coef / q
    return (np.sign(scaled) * np.floor(np.abs(scaled) + 0.5)).astype(np.int32)


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.stack([r, g, b], axis=-1)


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def _dht_payload(cls: int, tid: int, spec) -> bytes:
    counts, symbols = spec
    return bytes([cls << 4 | tid]) + bytes(counts) + bytes(symbols)


def _write_block(w: _BitWriter, zz: np.ndarray, prev_dc: int, dc_t, ac_t) -> int:
    """Huffman-encode one zigzag-ordered quantized block; returns the new
    DC predictor."""
    diff = int(zz[0]) - prev_dc
    size, bits = _magnitude(diff)
    code, length = dc_t[size]
    w.write(code, length)
    if size:
        w.write(bits, size)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_t[0xF0]  # ZRL
            w.write(code, length)
            run -= 16
        size, bits = _magnitude(v)
        code, length = ac_t[run << 4 | size]
        w.write(code, length)
        w.write(bits, size)
        run = 0
    if last_nz < 63:
        code, length = ac_t[0x00]  # EOB
        w.write(code, length)
    return int(zz[0])


def _pad_to(plane: np.ndarray, mult: int) -> np.ndarray:
    h, w = plane.shape
    H = (h + mult - 1) // mult * mult
    W = (w + mult - 1) // mult * mult
    return np.pad(plane, ((0, H - h), (0, W - w)), mode="edge")


def _block_grid(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Quantized zigzag coefficients of a level-shifted plane whose dims
    are 8-multiples, as a (rows/8, cols/8, 64) grid in raster order."""
    H, W = plane.shape
    blocks = (
        plane.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )
    zz = _fdct_quant(blocks, q).reshape(-1, 64)[:, ZIGZAG]
    return zz.reshape(H // 8, W // 8, 64)


def encode_jpeg(
    pixels: bytes | np.ndarray,
    width: int,
    height: int,
    channels: int,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode 8-bit pixels (row-major, RGB or grayscale) as baseline
    JPEG (Annex K tables). ``subsampling``: ``"444"`` (full-resolution
    chroma) or ``"420"`` (2×2 box-downsampled chroma in interleaved
    16×16 MCUs — the default shape libjpeg and cameras emit); ignored
    for grayscale. ``restart_interval`` > 0 emits a DRI segment and an
    RSTn marker (DC predictors reset) every that many MCUs — the
    error-resilience feature many camera files carry."""
    if channels not in (1, 3):
        raise ValueError("encode_jpeg supports 1 (gray) or 3 (RGB) channels")
    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r}; use '444' or '420'")
    if not (0 <= restart_interval <= 65535):
        raise ValueError("restart_interval must be in 0..65535")
    arr = np.frombuffer(bytes(pixels) if not isinstance(pixels, np.ndarray) else pixels.tobytes(), dtype=np.uint8)
    if arr.size != width * height * channels:
        raise ValueError(
            f"pixel buffer has {arr.size} bytes, expected {width * height * channels}"
        )
    img = arr.reshape(height, width, channels).astype(np.float64)
    sub420 = channels == 3 and subsampling == "420"

    w = _BitWriter()
    mcu_i = 0
    rst_seq = 0

    def maybe_restart(prev_dc: list[int]) -> None:
        nonlocal mcu_i, rst_seq
        if restart_interval and mcu_i and mcu_i % restart_interval == 0:
            w.restart_marker(rst_seq)
            rst_seq = (rst_seq + 1) % 8
            prev_dc[:] = [0] * len(prev_dc)
        mcu_i += 1

    if channels == 1:
        grid = _block_grid(_pad_to(img[..., 0], 8) - 128.0, QUANT_LUMA)
        prev = [0]
        for zz in grid.reshape(-1, 64):
            maybe_restart(prev)  # non-interleaved: MCU = one data unit
            prev[0] = _write_block(
                w, zz, prev[0], _ENC_TABLES["dc_l"], _ENC_TABLES["ac_l"]
            )
    elif not sub420:
        planes = list(np.moveaxis(_rgb_to_ycbcr(img), -1, 0))
        grids = [
            _block_grid(_pad_to(p, 8) - 128.0, QUANT_LUMA if ci == 0 else QUANT_CHROMA)
            for ci, p in enumerate(planes)
        ]
        prev_dc = [0, 0, 0]
        n_blocks = grids[0].shape[0] * grids[0].shape[1]
        flat = [g.reshape(-1, 64) for g in grids]
        for bi in range(n_blocks):
            maybe_restart(prev_dc)
            for ci in range(3):
                lum = ci == 0
                prev_dc[ci] = _write_block(
                    w, flat[ci][bi], prev_dc[ci],
                    _ENC_TABLES["dc_l" if lum else "dc_c"],
                    _ENC_TABLES["ac_l" if lum else "ac_c"],
                )
    else:
        ycc = _rgb_to_ycbcr(img)
        # pad everything to the 16×16 MCU grid first, THEN box-average
        # chroma 2×2 — the downsampled planes land exactly on 8-multiples
        yp = _pad_to(ycc[..., 0], 16)
        cb = _pad_to(ycc[..., 1], 16)
        cr = _pad_to(ycc[..., 2], 16)
        H, W = yp.shape
        mcuy, mcux = H // 16, W // 16
        cb = cb.reshape(H // 2, 2, W // 2, 2).mean(axis=(1, 3))
        cr = cr.reshape(H // 2, 2, W // 2, 2).mean(axis=(1, 3))
        yg = _block_grid(yp - 128.0, QUANT_LUMA)
        cbg = _block_grid(cb - 128.0, QUANT_CHROMA)
        crg = _block_grid(cr - 128.0, QUANT_CHROMA)
        prev_dc = [0, 0, 0]
        for my in range(mcuy):
            for mx in range(mcux):
                maybe_restart(prev_dc)
                # 4 luma blocks raster-order within the MCU, then Cb, Cr
                for by in range(2):
                    for bx in range(2):
                        prev_dc[0] = _write_block(
                            w, yg[2 * my + by, 2 * mx + bx], prev_dc[0],
                            _ENC_TABLES["dc_l"], _ENC_TABLES["ac_l"],
                        )
                prev_dc[1] = _write_block(
                    w, cbg[my, mx], prev_dc[1], _ENC_TABLES["dc_c"], _ENC_TABLES["ac_c"]
                )
                prev_dc[2] = _write_block(
                    w, crg[my, mx], prev_dc[2], _ENC_TABLES["dc_c"], _ENC_TABLES["ac_c"]
                )
    scan = w.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    dqt = bytes([0]) + bytes(QUANT_LUMA.reshape(64)[ZIGZAG].astype(np.uint8))
    if channels == 3:
        dqt += bytes([1]) + bytes(QUANT_CHROMA.reshape(64)[ZIGZAG].astype(np.uint8))
    out += _seg(0xFFDB, dqt)
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))
    sof = struct.pack(">BHHB", 8, height, width, channels)
    for ci in range(channels):
        sampling = 0x22 if (sub420 and ci == 0) else 0x11
        sof += bytes([ci + 1, sampling, 0 if ci == 0 else 1])  # q-table id
    out += _seg(0xFFC0, sof)
    dht = _dht_payload(0, 0, DC_LUMA) + _dht_payload(1, 0, AC_LUMA)
    if channels == 3:
        dht += _dht_payload(0, 1, DC_CHROMA) + _dht_payload(1, 1, AC_CHROMA)
    out += _seg(0xFFC4, dht)
    sos = bytes([channels])
    for ci in range(channels):
        tid = 0 if ci == 0 else 1
        sos += bytes([ci + 1, tid << 4 | tid])
    sos += bytes([0, 63, 0])
    out += _seg(0xFFDA, sos)
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _BitReader:
    """Entropy-coded-segment reader: undoes 0xFF00 byte stuffing, stops
    (without consuming) at RSTn markers so :meth:`restart` can byte-align
    and resume the next restart interval, and refuses any other in-scan
    marker."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0
        self.pending_rst: int | None = None  # 0-7 when parked at a RSTn

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.pending_rst is not None or self.pos >= len(self.data):
                self.acc = (self.acc << 8) | 0xFF  # spec: pad with 1s
                self.nbits += 8
                continue
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                elif 0xD0 <= nxt <= 0xD7:
                    # park at the restart marker: remaining buffered bits
                    # are the interval's 1-padding; pad from here on
                    self.pending_rst = nxt - 0xD0
                    self.pos += 1  # past the marker byte
                    self.acc = (self.acc << 8) | 0xFF
                    self.nbits += 8
                    continue
                else:
                    raise ValueError(
                        f"unsupported JPEG: marker 0xFF{nxt:02X} inside scan"
                    )
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill()
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def restart(self, expected: int) -> None:
        """Byte-align at a restart boundary and consume the RSTn marker,
        verifying its modulo-8 sequence number (T.81 E.1.4)."""
        # discard the interval's padding bits (and the 1-fill _fill may
        # have synthesized after parking at the marker)
        self.acc = 0
        self.nbits = 0
        if self.pending_rst is None:
            # the reader never needed to fill past the padding: the
            # marker bytes are still unread at pos
            if (
                self.pos + 1 >= len(self.data)
                or self.data[self.pos] != 0xFF
                or not (0xD0 <= self.data[self.pos + 1] <= 0xD7)
            ):
                raise ValueError(
                    "corrupt JPEG: expected RST marker at restart boundary"
                )
            self.pending_rst = self.data[self.pos + 1] - 0xD0
            self.pos += 2
        if self.pending_rst != expected:
            raise ValueError(
                f"corrupt JPEG: restart marker out of sequence "
                f"(got RST{self.pending_rst}, expected RST{expected})"
            )
        self.pending_rst = None


def _huff_decoder(spec):
    """length -> {code: symbol} lookup for canonical codes."""
    counts, symbols = spec
    table: dict[int, dict[int, int]] = {}
    code = 0
    i = 0
    for length in range(1, 17):
        d = {}
        for _ in range(counts[length - 1]):
            d[code] = symbols[i]
            code += 1
            i += 1
        if d:
            table[length] = d
        code <<= 1
    return table


def _read_symbol(r: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.bits(1)
        d = table.get(length)
        if d is not None and code in d:
            return d[code]
    raise ValueError("corrupt JPEG: invalid Huffman code in scan")


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def decode_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline JPEG within the envelope to ``(width, height,
    channels, row-major 8-bit pixel bytes)`` (RGB for 3 components)."""
    if not isinstance(data, (bytes, bytearray, memoryview)):
        raise ValueError("decode_jpeg expects a bytes-like payload")
    data = bytes(data)
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI marker")

    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], object] = {}
    width = height = channels = -1
    restart_interval = 0
    comp_q: list[int] = []
    comp_s: list[tuple[int, int]] = []
    comp_h: list[tuple[int, int]] = []
    scan_at = -1

    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"corrupt JPEG: expected marker at byte {pos}")
        # any number of 0xFF fill bytes may pad between segments
        # (T.81 B.1.1.2) — skip them before reading the marker byte
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 1 >= len(data):
            raise ValueError("truncated JPEG: fill bytes run past end of data")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            # TEM / stray RSTn: parameterless markers — legal JPEG, but
            # outside this codec's envelope; name them precisely instead
            # of misreading the next bytes as a segment length
            raise ValueError(
                f"unsupported JPEG: parameterless marker 0xFF{marker:02X} "
                "outside a scan"
            )
        if pos + 4 > len(data):
            raise ValueError("truncated JPEG: segment header past end of data")
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated JPEG: segment past end of data")
        if marker == 0xDB:  # DQT
            b = body
            while b:
                prec_id, b = b[0], b[1:]
                if prec_id >> 4:
                    raise ValueError("unsupported JPEG: 16-bit quant table")
                q = np.array(list(b[:64]), dtype=np.int32)[UNZIGZAG].reshape(8, 8)
                qtables[prec_id & 0xF] = q
                b = b[64:]
        elif marker == 0xC0:  # SOF0 baseline
            prec, height, width, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError(f"unsupported JPEG: {prec}-bit precision")
            if nc not in (1, 3):
                raise ValueError(f"unsupported JPEG: {nc} components")
            channels = nc
            for ci in range(nc):
                cid, sampling, qid = body[6 + ci * 3 : 9 + ci * 3]
                sh, sv = sampling >> 4, sampling & 0xF
                if not (1 <= sh <= 4 and 1 <= sv <= 4):
                    raise ValueError(
                        f"corrupt JPEG: sampling factors {sh}x{sv} outside 1..4"
                    )
                comp_s.append((sh, sv))
                comp_q.append(qid)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG: SOF{marker - 0xC0} (only baseline SOF0)"
            )
        elif marker == 0xC4:  # DHT
            b = body
            while b:
                cls_id = b[0]
                counts = tuple(b[1:17])
                n = sum(counts)
                symbols = tuple(b[17 : 17 + n])
                htables[(cls_id >> 4, cls_id & 0xF)] = _huff_decoder((counts, symbols))
                b = b[17 + n :]
        elif marker == 0xDD:  # DRI: restart every Ri MCUs
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            ns = body[0]
            if ns != channels:
                raise ValueError("unsupported JPEG: multi-scan (only single scan)")
            for si in range(ns):
                tids = body[2 + si * 2]
                comp_h.append((tids >> 4, tids & 0xF))
            scan_at = pos + 2 + seglen
            break
        # APPn/COM and others: skipped
        pos = pos + 2 + seglen

    if width < 0 or scan_at < 0:
        raise ValueError("corrupt JPEG: missing SOF0 or SOS")

    end = data.rfind(b"\xff\xd9")
    if end < 0:
        raise ValueError("truncated JPEG: missing EOI")
    r = _BitReader(data[scan_at:end])

    # a single-component scan is non-interleaved (one data unit per MCU,
    # T.81 A.2.2) — its declared sampling factors do not shape the scan
    if channels == 1:
        comp_s = [(1, 1)]
    max_h = max(s[0] for s in comp_s)
    max_v = max(s[1] for s in comp_s)
    for sh, sv in comp_s:
        if max_h % sh or max_v % sv:
            raise ValueError(
                f"unsupported JPEG: fractional sampling ratio "
                f"({sh}x{sv} vs max {max_h}x{max_v})"
            )
    mcux = (width + 8 * max_h - 1) // (8 * max_h)
    mcuy = (height + 8 * max_v - 1) // (8 * max_v)
    # per component: a (mcuy·v, mcux·h, 64) raster-ordered block grid
    grids = [
        np.zeros((mcuy * sv, mcux * sh, 64), dtype=np.int32) for sh, sv in comp_s
    ]
    dec_tables = []
    for ci in range(channels):
        dc_t = htables.get((0, comp_h[ci][0]))
        ac_t = htables.get((1, comp_h[ci][1]))
        if dc_t is None or ac_t is None:
            raise ValueError("corrupt JPEG: scan references missing DHT")
        dec_tables.append((dc_t, ac_t))

    def read_block(zz: np.ndarray, ci: int) -> None:
        dc_t, ac_t = dec_tables[ci]
        size = _read_symbol(r, dc_t)
        diff = _extend(r.bits(size), size)
        prev_dc[ci] += diff
        zz[0] = prev_dc[ci]
        k = 1
        while k < 64:
            rs = _read_symbol(r, ac_t)
            if rs == 0x00:  # EOB
                break
            if rs == 0xF0:  # ZRL
                k += 16
                continue
            k += rs >> 4
            if k > 63:
                raise ValueError("corrupt JPEG: AC run past block end")
            zz[k] = _extend(r.bits(rs & 0xF), rs & 0xF)
            k += 1

    prev_dc = [0] * channels
    mcu_i = 0
    rst_seq = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                # byte-align, consume RSTn (sequence checked), reset the
                # DC predictors — T.81 E.1.4 / F.2.1.3.1
                r.restart(rst_seq)
                rst_seq = (rst_seq + 1) % 8
                prev_dc = [0] * channels
            mcu_i += 1
            for ci, (sh, sv) in enumerate(comp_s):
                for by in range(sv):
                    for bx in range(sh):
                        read_block(grids[ci][my * sv + by, mx * sh + bx], ci)

    planes = []
    for ci, (sh, sv) in enumerate(comp_s):
        q = qtables.get(comp_q[ci])
        if q is None:
            raise ValueError("corrupt JPEG: component references missing DQT")
        rows, cols = grids[ci].shape[:2]
        blocks = (grids[ci].reshape(-1, 64)[:, UNZIGZAG].reshape(-1, 8, 8) * q).astype(
            np.float64
        )
        spatial = np.einsum("ji,njk,kl->nil", _DCT, blocks, _DCT) + 128.0
        plane = (
            spatial.reshape(rows, cols, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(rows * 8, cols * 8)
        )
        # upsample subsampled components by sample replication, then
        # crop the MCU padding to the image dims
        if sh != max_h or sv != max_v:
            plane = np.repeat(np.repeat(plane, max_v // sv, axis=0), max_h // sh, axis=1)
        planes.append(plane[:height, :width])

    if channels == 1:
        out = planes[0]
        out = np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)
        return width, height, 1, out.tobytes()
    ycc = np.stack(planes, axis=-1)
    rgb = np.clip(np.floor(_ycbcr_to_rgb(ycc) + 0.5), 0, 255).astype(np.uint8)
    return width, height, 3, rgb.tobytes()
