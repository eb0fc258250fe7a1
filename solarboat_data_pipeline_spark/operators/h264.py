"""H.264/AVC Baseline intra-only PIXEL codec (ITU-T H.264, public spec).

This closes the last gap the round-10 probe lane left open: MP4/H.264
content could be probed, indexed, and extracted but not pixel-decoded.
This module decodes (and encodes, for test/content generation) real
IDR pictures within a precisely declared envelope:

* **Syntax**: Annex-B elementary streams of SPS/PPS/IDR NALs (the
  SPS/PPS bit layer is shared with :mod:`.mp4`), single slice per
  picture, CAVLC entropy, 4:2:0, 8-bit, ``frame_mbs_only``,
  deblocking disabled via ``disable_deblocking_filter_idc=1``
  (the PPS sets ``deblocking_filter_control_present_flag``).
* **Macroblocks**: I_PCM (§7.4.5 raw-sample lane — LOSSLESS, the way
  exact pixel content ships inside H.264), I_4x4 with all NINE §8.3.1
  prediction modes, and I_16x16 with all four §8.3.3 modes, plus all
  four §8.3.4 chroma modes — the complete Baseline intra prediction
  machinery, including the MinMode derivation of §8.3.1.1, the z-scan
  block order of §6.4.3, above-right substitution, and plane-mode
  arithmetic.
* **Residuals**: only ZERO-coefficient blocks are inside the envelope
  (every parsed ``coeff_token`` must code TotalCoeff=0, and I_4x4
  CBP must be the zero codeword, codeNum 3 of Table 9-4 intra).
  The prediction-only reconstruction this yields is exactly what an
  extreme-QP encoder emits; content above the encoder's fidelity
  floor is carried losslessly as I_PCM instead (see ``pcm_mae``).
  Nonzero residual coefficients raise a precise ValueError: decoding
  them needs the Table 9-5/9-7/9-10 VLC transcriptions, which this
  container has no way to verify against conformance bitstreams (no
  network, no reference decoder), and an unverifiable table is worse
  than a declared boundary. The swap-in point is
  :func:`_read_coeff_token_total_coeff` — dropping verified tables in
  there (plus level/run parsing) lights up full CAVLC without
  touching prediction or reconstruction.

The encoder is a REAL encoder in the sense that matters for testing
the decoder: per-macroblock SAD mode decision over every legal
prediction mode, reconstruction from its own decoded state (so
prediction chains across blocks exactly as the decoder sees them),
and an I_PCM fallback when prediction alone cannot hold a fidelity
floor. The invariant the tests enforce is bit-exact: ``decode(encode
(x)) == encoder reconstruction`` for every mode path, and ``==
x`` exactly on the I_PCM lane.

No counterpart exists in the reference pipeline (pure CAN/pandas —
cited at lib/canparser.py for the 1→N shape only); everything here is
from the published ITU-T H.264 specification.
"""

from __future__ import annotations

import numpy as np

from solarboat_data_pipeline_spark.operators.mp4 import (
    _BitReader,
    _BitWriter,
    _nal_to_rbsp,
    _rbsp_to_nal,
    encode_pps,
    encode_sps,
    parse_sps,
)

# ---------------------------------------------------------------------------
# bit I/O shims: the slice layer needs peeking + byte alignment + a
# writer that can emit raw PCM bytes mid-stream
# ---------------------------------------------------------------------------


class _SliceReader(_BitReader):
    def byte_align(self) -> None:
        while self._pos & 7:
            if self.u(1) != 0:
                raise ValueError("pcm_alignment_zero_bit is not zero")

    def bytes_raw(self, n: int) -> bytes:
        if self._pos & 7:
            raise ValueError("raw byte read while not byte-aligned")
        start = self._pos >> 3
        if start + n > len(self._data):
            raise ValueError("bitstream truncated inside I_PCM samples")
        self._pos += n * 8
        return self._data[start : start + n]

_BYTE_BITS = [
    tuple((b >> i) & 1 for i in range(7, -1, -1)) for b in range(256)
]


class _SliceWriter(_BitWriter):
    def byte_align_zero(self) -> None:
        while len(self._bits) % 8:
            self._bits.append(0)

    def bytes_raw(self, data: bytes) -> None:
        if len(self._bits) % 8:
            raise ValueError("raw byte write while not byte-aligned")
        # bulk path: I_PCM macroblocks write 384 raw bytes each — a
        # per-byte bit LUT is ~8x cheaper than 8 u() calls per byte
        bits = self._bits
        for b in data:
            bits.extend(_BYTE_BITS[b])

    def rbsp_trailing(self) -> bytes:
        # PCM-heavy slices reach tens of kilobits: pack with numpy
        # instead of the base class's per-bit assembly loop
        self._bits.append(1)
        while len(self._bits) % 8:
            self._bits.append(0)
        return np.packbits(np.asarray(self._bits, dtype=np.uint8)).tobytes()


# ---------------------------------------------------------------------------
# CAVLC zero-coefficient codewords (ITU-T H.264 Table 9-5, TotalCoeff=0
# rows only — see module docstring for why the nonzero rows are an
# envelope boundary rather than a memory-transcribed table)
# ---------------------------------------------------------------------------

# context -> bit string coding (TrailingOnes=0, TotalCoeff=0)
_TC0_CODES = {
    "nC<2": (1, 1),        # '1'
    "2<=nC<4": (3, 2),     # '11'
    "4<=nC<8": (15, 4),    # '1111'
    "nC>=8": (3, 6),       # '000011' (6-bit FLC, the TotalCoeff=0 escape)
    "chromaDC": (1, 2),    # '01'  (nC == -1, 4:2:0)
}


def _nc_context(nc: int) -> str:
    if nc == -1:
        return "chromaDC"
    if nc < 2:
        return "nC<2"
    if nc < 4:
        return "2<=nC<4"
    if nc < 8:
        return "4<=nC<8"
    return "nC>=8"


def _write_coeff_token_zero(w: _SliceWriter, nc: int) -> None:
    value, nbits = _TC0_CODES[_nc_context(nc)]
    w.u(value, nbits)


def _read_coeff_token_total_coeff(r: _SliceReader, nc: int) -> int:
    """Read a coeff_token in context ``nC`` and return TotalCoeff.

    Envelope: only the TotalCoeff=0 codeword of each context is
    decodable (verified against the spec's published zero rows); any
    other prefix means the block carries quantized coefficients and
    raises. THIS function is the full-CAVLC swap-in point."""
    value, nbits = _TC0_CODES[_nc_context(nc)]
    got = r.u(nbits)
    if got != value:
        raise ValueError(
            "nonzero CAVLC residual outside the decode envelope "
            f"(coeff_token prefix {got:0{nbits}b} in context {_nc_context(nc)}; "
            "see operators/h264.py docstring)"
        )
    return 0


# ---------------------------------------------------------------------------
# geometry: §6.4.3 inverse 4x4 luma block z-scan
# ---------------------------------------------------------------------------

def _blk_xy(blk: int) -> tuple[int, int]:
    """z-scan index 0..15 -> (x, y) offset of the 4x4 block in its MB."""
    x = ((blk >> 2) & 1) * 8 + (blk & 1) * 4
    y = (blk >> 3) * 8 + ((blk >> 1) & 1) * 4
    return x, y


_ZSCAN_OF_XY = {_blk_xy(b): b for b in range(16)}


def _clip1(a):
    return np.clip(a, 0, 255)


# ---------------------------------------------------------------------------
# §8.3 intra prediction — shared verbatim by encoder and decoder
# ---------------------------------------------------------------------------


# per-position constant index grids: every §8.3.1.2 diagonal mode's
# sample value is constant along its (anti-)diagonal, so prediction is
# a <=10-entry scalar value table + one gather
_GX = np.arange(4)[None, :]
_GY = np.arange(4)[:, None]
_DDL_I = _GX + _GY            # Diagonal_Down_Left: x+y in 0..6
_DDR_D = (_GX - _GY) + 3      # Diagonal_Down_Right: x-y in -3..3
_VR_Z = (2 * _GX - _GY) + 3   # Vertical_Right: zVR in -3..6
_HD_Z = (2 * _GY - _GX) + 3   # Horizontal_Down: zHD in -3..6
_HU_Z = _GX + 2 * _GY         # Horizontal_Up: zHU in 0..9
_VL_A = _GX + (_GY >> 1)      # Vertical_Left: x+(y>>1) in 0..4


def _pred4x4(
    rec: np.ndarray,
    x0: int,
    y0: int,
    mode: int,
    avail_l: bool,
    avail_t: bool,
    avail_tl: bool,
    avail_tr: bool,
) -> np.ndarray:
    """§8.3.1.2 Intra_4x4 sample prediction at absolute luma position
    (x0, y0) over the reconstruction-so-far ``rec``. ``avail_tr`` covers
    p[4..7, -1]; when it is False but the top row exists, those samples
    substitute p[3, -1] (§8.3.1.2, sample substitution). Each diagonal
    mode computes its per-diagonal scalar values once (the spec's
    values are constant along each diagonal) and gathers them through
    the constant index grids above — verified bit-identical to the
    per-pixel spec loops by a 57,600-evaluation A/B sweep over all
    modes × availability combinations × random content."""
    if avail_t:
        row = rec[y0 - 1, x0 : x0 + 4]
        t = [int(v) for v in row]
        if avail_tr:
            t += [int(v) for v in rec[y0 - 1, x0 + 4 : x0 + 8]]
        else:
            t += [t[3]] * 4
    else:
        t = [0] * 8
    if avail_l:
        lf = [int(rec[y0 + j, x0 - 1]) for j in range(4)]
    else:
        lf = [0] * 4
    tl = int(rec[y0 - 1, x0 - 1]) if avail_tl else 0

    def T(i: int) -> int:  # p[i, -1] with i == -1 the corner
        return tl if i == -1 else t[i]

    def L(j: int) -> int:  # p[-1, j] with j == -1 the corner
        return tl if j == -1 else lf[j]

    if mode == 0:  # Vertical
        if not avail_t:
            raise ValueError("Intra_4x4 Vertical without top neighbors")
        return np.tile(np.array(t[:4], dtype=np.int32), (4, 1))
    if mode == 1:  # Horizontal
        if not avail_l:
            raise ValueError("Intra_4x4 Horizontal without left neighbors")
        return np.tile(np.array(lf, dtype=np.int32)[:, None], (1, 4))
    if mode == 2:  # DC
        if avail_t and avail_l:
            dc = (sum(t[:4]) + sum(lf) + 4) >> 3
        elif avail_t:
            dc = (sum(t[:4]) + 2) >> 2
        elif avail_l:
            dc = (sum(lf) + 2) >> 2
        else:
            dc = 128
        return np.full((4, 4), dc, dtype=np.int32)
    if mode == 3:  # Diagonal_Down_Left
        if not avail_t:
            raise ValueError("Intra_4x4 DDL without top neighbors")
        v = [(t[s] + 2 * t[s + 1] + t[s + 2] + 2) >> 2 for s in range(6)]
        v.append((t[6] + 3 * t[7] + 2) >> 2)  # the (3,3) corner case
        return np.array(v, dtype=np.int32)[_DDL_I]
    if mode == 4:  # Diagonal_Down_Right
        if not (avail_t and avail_l and avail_tl):
            raise ValueError("Intra_4x4 DDR without top+left+corner")
        v = [0] * 7  # index d+3, d = x-y in -3..3
        for k in range(1, 4):  # below the diagonal: left column taps
            v[3 - k] = (L(k - 2) + 2 * L(k - 1) + L(k) + 2) >> 2
        v[3] = (t[0] + 2 * tl + lf[0] + 2) >> 2
        for d in range(1, 4):  # above the diagonal: top row taps
            v[3 + d] = (T(d - 2) + 2 * T(d - 1) + T(d) + 2) >> 2
        return np.array(v, dtype=np.int32)[_DDR_D]
    if mode == 5:  # Vertical_Right
        if not (avail_t and avail_l and avail_tl):
            raise ValueError("Intra_4x4 VR without top+left+corner")
        v = [0] * 10  # index zVR+3, zVR = 2x-y in -3..6
        v[0] = (lf[2] + 2 * lf[1] + lf[0] + 2) >> 2          # zVR -3
        v[1] = (lf[1] + 2 * lf[0] + tl + 2) >> 2             # zVR -2
        v[2] = (lf[0] + 2 * tl + t[0] + 2) >> 2              # zVR -1
        for z in range(0, 7):
            if z % 2 == 0:
                i = z >> 1
                v[3 + z] = (T(i - 1) + T(i) + 1) >> 1
            else:
                i = (z + 1) >> 1
                v[3 + z] = (T(i - 2) + 2 * T(i - 1) + T(i) + 2) >> 2
        return np.array(v, dtype=np.int32)[_VR_Z]
    if mode == 6:  # Horizontal_Down
        if not (avail_t and avail_l and avail_tl):
            raise ValueError("Intra_4x4 HD without top+left+corner")
        v = [0] * 10  # index zHD+3, zHD = 2y-x in -3..6
        v[0] = (t[2] + 2 * t[1] + t[0] + 2) >> 2             # zHD -3
        v[1] = (t[1] + 2 * t[0] + tl + 2) >> 2               # zHD -2
        v[2] = (lf[0] + 2 * tl + t[0] + 2) >> 2              # zHD -1
        for z in range(0, 7):
            if z % 2 == 0:
                j = z >> 1
                v[3 + z] = (L(j - 1) + L(j) + 1) >> 1
            else:
                j = (z + 1) >> 1
                v[3 + z] = (L(j - 2) + 2 * L(j - 1) + L(j) + 2) >> 2
        return np.array(v, dtype=np.int32)[_HD_Z]
    if mode == 7:  # Vertical_Left
        if not avail_t:
            raise ValueError("Intra_4x4 VL without top neighbors")
        ve = [(t[a] + t[a + 1] + 1) >> 1 for a in range(5)]
        vo = [(t[a] + 2 * t[a + 1] + t[a + 2] + 2) >> 2 for a in range(5)]
        out = np.empty((4, 4), dtype=np.int32)
        out[0::2] = np.array(ve, dtype=np.int32)[_VL_A[0::2]]
        out[1::2] = np.array(vo, dtype=np.int32)[_VL_A[1::2]]
        return out
    if mode == 8:  # Horizontal_Up (zHU = x+2y in 0..9)
        if not avail_l:
            raise ValueError("Intra_4x4 HU without left neighbors")
        v = [0] * 10
        for z in range(0, 6, 2):
            v[z] = (lf[z >> 1] + lf[(z >> 1) + 1] + 1) >> 1
        for z in range(1, 5, 2):
            v[z] = (lf[z >> 1] + 2 * lf[(z >> 1) + 1] + lf[(z >> 1) + 2] + 2) >> 2
        v[5] = (lf[2] + 3 * lf[3] + 2) >> 2
        v[6] = v[7] = v[8] = v[9] = lf[3]
        return np.array(v, dtype=np.int32)[_HU_Z]
    raise ValueError(f"Intra_4x4 prediction mode {mode} is not 0..8")


def _pred16x16(
    rec: np.ndarray, x0: int, y0: int, mode: int,
    avail_l: bool, avail_t: bool, avail_tl: bool,
) -> np.ndarray:
    """§8.3.3 Intra_16x16 prediction (0 V, 1 H, 2 DC, 3 Plane)."""
    out = np.zeros((16, 16), dtype=np.int32)
    if mode == 0:
        if not avail_t:
            raise ValueError("Intra_16x16 Vertical without top neighbors")
        out[:, :] = rec[y0 - 1, x0 : x0 + 16].astype(np.int32)
    elif mode == 1:
        if not avail_l:
            raise ValueError("Intra_16x16 Horizontal without left neighbors")
        out[:, :] = rec[y0 : y0 + 16, x0 - 1].astype(np.int32)[:, None]
    elif mode == 2:
        if avail_t and avail_l:
            dc = (
                int(rec[y0 - 1, x0 : x0 + 16].sum())
                + int(rec[y0 : y0 + 16, x0 - 1].sum())
                + 16
            ) >> 5
        elif avail_t:
            dc = (int(rec[y0 - 1, x0 : x0 + 16].sum()) + 8) >> 4
        elif avail_l:
            dc = (int(rec[y0 : y0 + 16, x0 - 1].sum()) + 8) >> 4
        else:
            dc = 128
        out[:, :] = dc
    elif mode == 3:
        if not (avail_t and avail_l and avail_tl):
            raise ValueError("Intra_16x16 Plane without top+left+corner")
        top = rec[y0 - 1, x0 - 1 : x0 + 16].astype(np.int64)  # top[-1..15]
        lefts = rec[y0 - 1 : y0 + 16, x0 - 1].astype(np.int64)  # left[-1..15]
        h = sum((i + 1) * (int(top[1 + 8 + i]) - int(top[1 + 6 - i])) for i in range(8))
        v = sum((j + 1) * (int(lefts[1 + 8 + j]) - int(lefts[1 + 6 - j])) for j in range(8))
        a = 16 * (int(lefts[1 + 15]) + int(top[1 + 15]))
        b = (5 * h + 32) >> 6
        c = (5 * v + 32) >> 6
        xs = np.arange(16)
        out = _clip1((a + b * (xs[None, :] - 7) + c * (xs[:, None] - 7) + 16) >> 5)
    else:
        raise ValueError(f"Intra_16x16 prediction mode {mode} is not 0..3")
    return out


def _pred_chroma(
    rec: np.ndarray, x0: int, y0: int, mode: int,
    avail_l: bool, avail_t: bool, avail_tl: bool,
) -> np.ndarray:
    """§8.3.4 intra chroma prediction over one 8x8 plane
    (0 DC with per-4x4-quadrant rules, 1 Horizontal, 2 Vertical,
    3 Plane)."""
    out = np.zeros((8, 8), dtype=np.int32)
    if mode == 0:
        for qy in (0, 4):
            for qx in (0, 4):
                t4 = (
                    int(rec[y0 - 1, x0 + qx : x0 + qx + 4].sum())
                    if avail_t
                    else None
                )
                l4 = (
                    int(rec[y0 + qy : y0 + qy + 4, x0 - 1].sum())
                    if avail_l
                    else None
                )
                if qx == 0 and qy == 0 or qx == 4 and qy == 4:
                    if t4 is not None and l4 is not None:
                        dc = (t4 + l4 + 4) >> 3
                    elif t4 is not None:
                        dc = (t4 + 2) >> 2
                    elif l4 is not None:
                        dc = (l4 + 2) >> 2
                    else:
                        dc = 128
                elif qx == 4 and qy == 0:  # top priority
                    if t4 is not None:
                        dc = (t4 + 2) >> 2
                    elif l4 is not None:
                        dc = (l4 + 2) >> 2
                    else:
                        dc = 128
                else:  # (0, 4): left priority
                    if l4 is not None:
                        dc = (l4 + 2) >> 2
                    elif t4 is not None:
                        dc = (t4 + 2) >> 2
                    else:
                        dc = 128
                out[qy : qy + 4, qx : qx + 4] = dc
    elif mode == 1:
        if not avail_l:
            raise ValueError("chroma Horizontal without left neighbors")
        out[:, :] = rec[y0 : y0 + 8, x0 - 1].astype(np.int32)[:, None]
    elif mode == 2:
        if not avail_t:
            raise ValueError("chroma Vertical without top neighbors")
        out[:, :] = rec[y0 - 1, x0 : x0 + 8].astype(np.int32)
    elif mode == 3:
        if not (avail_t and avail_l and avail_tl):
            raise ValueError("chroma Plane without top+left+corner")
        top = rec[y0 - 1, x0 - 1 : x0 + 8].astype(np.int64)
        lefts = rec[y0 - 1 : y0 + 8, x0 - 1].astype(np.int64)
        h = sum((i + 1) * (int(top[1 + 4 + i]) - int(top[1 + 2 - i])) for i in range(4))
        v = sum((j + 1) * (int(lefts[1 + 4 + j]) - int(lefts[1 + 2 - j])) for j in range(4))
        a = 16 * (int(lefts[1 + 7]) + int(top[1 + 7]))
        b = (17 * h + 16) >> 5
        c = (17 * v + 16) >> 5
        xs = np.arange(8)
        out = _clip1((a + b * (xs[None, :] - 3) + c * (xs[:, None] - 3) + 16) >> 5)
    else:
        raise ValueError(f"intra chroma prediction mode {mode} is not 0..3")
    return out


# ---------------------------------------------------------------------------
# shared slice machinery
# ---------------------------------------------------------------------------


MB_I4X4 = 0
MB_I16X16_BASE = 1  # mb_type 1..4 = I_16x16 pred mode 0..3 with zero CBP
MB_IPCM = 25


class _PicState:
    """Per-picture decode/encode state shared by both directions: the
    reconstruction planes (coded-size), per-4x4-block TotalCoeff (for
    nC derivation; I_PCM counts 16 per §9.2.1) and per-block intra
    modes (for the §8.3.1.1 MinMode predictor)."""

    def __init__(self, mbs_w: int, mbs_h: int) -> None:
        self.mbs_w = mbs_w
        self.mbs_h = mbs_h
        self.y = np.full((mbs_h * 16, mbs_w * 16), 128, dtype=np.uint8)
        self.cb = np.full((mbs_h * 8, mbs_w * 8), 128, dtype=np.uint8)
        self.cr = np.full((mbs_h * 8, mbs_w * 8), 128, dtype=np.uint8)
        # totalCoeff per 4x4 luma block, addressed [mb_y*4+by][mb_x*4+bx]
        self.tc = np.zeros((mbs_h * 4, mbs_w * 4), dtype=np.int32)
        # intra 4x4 pred mode per block; -1 = block not in an I_4x4 MB
        self.i4mode = np.full((mbs_h * 4, mbs_w * 4), -1, dtype=np.int32)
        self.mb_types: list[int] = []

    # --- neighbor derivations -------------------------------------------

    def nc_luma(self, mb_x: int, mb_y: int, blk: int) -> int:
        """§9.2.1 nC for a 4x4 luma block (z-scan index) — average of
        the left and top neighboring blocks' TotalCoeff."""
        bx, by = _blk_xy(blk)
        gx, gy = mb_x * 4 + bx // 4, mb_y * 4 + by // 4
        vals = []
        if gx > 0 and self._blk_decoded(gx - 1, gy, mb_x, mb_y, blk):
            vals.append(int(self.tc[gy, gx - 1]))
        if gy > 0 and self._blk_decoded(gx, gy - 1, mb_x, mb_y, blk):
            vals.append(int(self.tc[gy - 1, gx]))
        if len(vals) == 2:
            return (vals[0] + vals[1] + 1) >> 1
        if len(vals) == 1:
            return vals[0]
        return 0

    def _blk_decoded(self, gx: int, gy: int, mb_x: int, mb_y: int, blk: int) -> bool:
        """Is global 4x4 block (gx, gy) decoded before block ``blk`` of
        MB (mb_x, mb_y) in single-slice raster/z order?"""
        omb_x, omb_y = gx // 4, gy // 4
        if (omb_y, omb_x) < (mb_y, mb_x):
            return True
        if (omb_y, omb_x) > (mb_y, mb_x):
            return False
        oblk = _ZSCAN_OF_XY[((gx % 4) * 4, (gy % 4) * 4)]
        return oblk < blk

    def pred_i4_mode(self, mb_x: int, mb_y: int, blk: int) -> int:
        """§8.3.1.1 predIntra4x4PredMode = Min(modeA, modeB); a missing
        or non-I_4x4 neighbor contributes DC (2)."""
        bx, by = _blk_xy(blk)
        gx, gy = mb_x * 4 + bx // 4, mb_y * 4 + by // 4

        def mode_of(nx: int, ny: int) -> int:
            if nx < 0 or ny < 0:
                return -1  # unavailable -> predictor forced to DC
            m = int(self.i4mode[ny, nx])
            return m if m >= 0 else 2
        a = mode_of(gx - 1, gy)
        b = mode_of(gx, gy - 1)
        if a < 0 or b < 0:
            return 2
        return min(a, b)

    def sample_avail(self, x: int, y: int, mb_x: int, mb_y: int, blk: int | None) -> bool:
        """Is reconstructed sample (x, y) available for prediction from
        block ``blk`` (z index; None = whole-MB prediction) of MB
        (mb_x, mb_y)? True iff inside the coded frame and decoded
        earlier in raster/z order (single slice per picture)."""
        if x < 0 or y < 0 or x >= self.mbs_w * 16 or y >= self.mbs_h * 16:
            return False
        omb_x, omb_y = x // 16, y // 16
        if (omb_y, omb_x) < (mb_y, mb_x):
            return True
        if (omb_y, omb_x) > (mb_y, mb_x):
            return False
        if blk is None:
            return False
        oblk = _ZSCAN_OF_XY[(((x % 16) // 4) * 4, ((y % 16) // 4) * 4)]
        return oblk < blk


def _mb_avail(mb_x: int, mb_y: int) -> tuple[bool, bool, bool]:
    return mb_x > 0, mb_y > 0, mb_x > 0 and mb_y > 0


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def _decode_mb(r: _SliceReader, st: _PicState, mb_x: int, mb_y: int) -> int:
    mb_type = r.ue()
    st.mb_types.append(mb_type)
    x0, y0 = mb_x * 16, mb_y * 16
    cx0, cy0 = mb_x * 8, mb_y * 8
    avail_l, avail_t, avail_tl = _mb_avail(mb_x, mb_y)

    if mb_type == MB_IPCM:
        r.byte_align()
        luma = np.frombuffer(r.bytes_raw(256), dtype=np.uint8).reshape(16, 16)
        cb = np.frombuffer(r.bytes_raw(64), dtype=np.uint8).reshape(8, 8)
        cr = np.frombuffer(r.bytes_raw(64), dtype=np.uint8).reshape(8, 8)
        st.y[y0 : y0 + 16, x0 : x0 + 16] = luma
        st.cb[cy0 : cy0 + 8, cx0 : cx0 + 8] = cb
        st.cr[cy0 : cy0 + 8, cx0 : cx0 + 8] = cr
        st.tc[mb_y * 4 : mb_y * 4 + 4, mb_x * 4 : mb_x * 4 + 4] = 16
        return mb_type

    if mb_type == MB_I4X4:
        # 16 prediction mode elements, z order (§7.3.5.1)
        modes: list[int] = []
        for blk in range(16):
            pred = st.pred_i4_mode(mb_x, mb_y, blk)
            if r.u(1):
                mode = pred
            else:
                rem = r.u(3)
                mode = rem if rem < pred else rem + 1
            modes.append(mode)
            bx, by = _blk_xy(blk)
            st.i4mode[mb_y * 4 + by // 4, mb_x * 4 + bx // 4] = mode
        chroma_mode = r.ue()
        cbp_code = r.ue()
        if cbp_code != 3:
            raise ValueError(
                "nonzero I_4x4 coded_block_pattern outside the decode "
                f"envelope (me(v) codeNum {cbp_code}; only the zero-CBP "
                "codeNum 3 of Table 9-4 intra decodes here)"
            )
        # cbp == 0 -> no mb_qp_delta, no residual blocks
        for blk, mode in enumerate(modes):
            bx, by = _blk_xy(blk)
            ax, ay = x0 + bx, y0 + by
            al = st.sample_avail(ax - 1, ay, mb_x, mb_y, blk)
            at = st.sample_avail(ax, ay - 1, mb_x, mb_y, blk)
            atl = st.sample_avail(ax - 1, ay - 1, mb_x, mb_y, blk)
            atr = st.sample_avail(ax + 4, ay - 1, mb_x, mb_y, blk)
            st.y[ay : ay + 4, ax : ax + 4] = _pred4x4(
                st.y, ax, ay, mode, al, at, atl, atr
            ).astype(np.uint8)
    elif 1 <= mb_type <= 24:
        pred_mode = (mb_type - 1) % 4
        cbp_chroma = ((mb_type - 1) // 4) % 3
        cbp_luma = 15 if mb_type > 12 else 0
        if cbp_luma or cbp_chroma:
            raise ValueError(
                f"I_16x16 mb_type {mb_type} carries a nonzero CBP — "
                "outside the zero-residual decode envelope"
            )
        chroma_mode = r.ue()
        qp_delta = r.se()  # always present for Intra_16x16
        if qp_delta != 0:
            # legal syntax, but with zero residual everywhere QP cannot
            # matter; a nonzero delta signals a stream form we never emit
            raise ValueError(
                f"nonzero mb_qp_delta ({qp_delta}) with zero residual"
            )
        # Intra16x16DCLevel is parsed unconditionally (§7.3.5.3)
        _read_coeff_token_total_coeff(r, st.nc_luma(mb_x, mb_y, 0))
        st.y[y0 : y0 + 16, x0 : x0 + 16] = _pred16x16(
            st.y, x0, y0, pred_mode, avail_l, avail_t, avail_tl
        ).astype(np.uint8)
    else:
        raise ValueError(f"mb_type {mb_type} is not an I-slice macroblock")

    if chroma_mode > 3:
        raise ValueError(f"intra_chroma_pred_mode {chroma_mode} is not 0..3")
    st.cb[cy0 : cy0 + 8, cx0 : cx0 + 8] = _pred_chroma(
        st.cb, cx0, cy0, chroma_mode, avail_l, avail_t, avail_tl
    ).astype(np.uint8)
    st.cr[cy0 : cy0 + 8, cx0 : cx0 + 8] = _pred_chroma(
        st.cr, cx0, cy0, chroma_mode, avail_l, avail_t, avail_tl
    ).astype(np.uint8)
    return mb_type


def _parse_slice_header(r: _SliceReader, log2_max_frame_num: int) -> None:
    if r.ue() != 0:
        raise ValueError("multi-slice pictures outside the decode envelope")
    slice_type = r.ue()
    if slice_type % 5 != 2:
        raise ValueError(f"slice_type {slice_type} is not an I slice")
    if r.ue() != 0:
        raise ValueError("pic_parameter_set_id must reference PPS 0 here")
    r.u(log2_max_frame_num)  # frame_num
    r.ue()  # idr_pic_id
    # poc_type 2 -> no POC syntax; IDR dec_ref_pic_marking:
    r.u(1)  # no_output_of_prior_pics_flag
    r.u(1)  # long_term_reference_flag
    r.se()  # slice_qp_delta (QP is irrelevant with zero residual)
    # deblocking_filter_control_present_flag is set in OUR pps:
    idc = r.ue()
    if idc != 1:
        raise ValueError(
            f"disable_deblocking_filter_idc {idc}: the in-loop deblocking "
            "filter is outside the decode envelope (streams must disable it)"
        )


def _parse_pps(nal: bytes) -> dict:
    """Minimal §7.3.2.2 PPS parse — enough to pin the slice-header
    shape the decoder assumes (CAVLC, one slice group, deblocking
    syntax present so streams can disable the filter)."""
    r = _BitReader(_nal_to_rbsp(nal[1:]))
    out = {
        "pps_id": r.ue(),
        "sps_id": r.ue(),
        "cabac": r.u(1),
        "pic_order_present": r.u(1),
        "num_slice_groups": r.ue() + 1,
    }
    if out["cabac"]:
        raise ValueError("CABAC entropy coding outside the decode envelope")
    if out["num_slice_groups"] != 1:
        raise ValueError("slice groups (FMO) outside the decode envelope")
    r.ue()  # num_ref_idx_l0_default_active_minus1
    r.ue()  # num_ref_idx_l1_default_active_minus1
    r.u(1)  # weighted_pred_flag
    r.u(2)  # weighted_bipred_idc
    out["pic_init_qp"] = 26 + r.se()
    r.se()  # pic_init_qs_minus26
    r.se()  # chroma_qp_index_offset
    out["deblocking_control"] = r.u(1)
    if not out["deblocking_control"]:
        raise ValueError(
            "PPS without deblocking_filter_control_present_flag: streams "
            "cannot disable the in-loop filter, which is outside the "
            "decode envelope"
        )
    if r.u(1):
        raise ValueError("constrained_intra_pred outside the decode envelope")
    if r.u(1):
        # would add redundant_pic_cnt to every slice header — silently
        # misaligning the parse rather than failing, so reject it here
        raise ValueError(
            "redundant_pic_cnt_present_flag outside the decode envelope"
        )
    return out


def decode_annexb(data: bytes) -> dict:
    """Decode an Annex-B H.264 intra stream within the envelope in the
    module docstring. Returns ``{"width", "height", "frames":
    [(y, cb, cr) uint8 arrays at DISPLAY size], "mb_types": [[...]]}``.
    Raises ValueError on any malformed or out-of-envelope input."""
    from solarboat_data_pipeline_spark.operators.mp4 import nal_scan

    units = nal_scan(data)
    sps = pps = None
    log2_mfn = 4
    frames: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
    mb_types: list[list[int]] = []
    width = height = None
    mbs_w = mbs_h = None
    for u in units:
        nal = data[u["offset"] : u["offset"] + u["size"]]
        ntype = u["nal_type"]
        if ntype == 7:
            info = parse_sps(nal)
            if info["profile_idc"] not in (66, 77, 100):
                raise ValueError(
                    f"profile_idc {info['profile_idc']} outside the decode envelope"
                )
            if info["poc_type"] != 2:
                raise ValueError(
                    "pic_order_cnt_type != 2 adds slice-header POC syntax "
                    "outside the decode envelope"
                )
            width, height = info["width"], info["height"]
            mbs_w = (width + 15) // 16
            mbs_h = (height + 15) // 16
            log2_mfn = info["log2_max_frame_num"]
            sps = info
        elif ntype == 8:
            pps = _parse_pps(nal)
        elif ntype == 5:
            if sps is None or pps is None:
                raise ValueError("IDR slice before SPS/PPS")
            r = _SliceReader(_nal_to_rbsp(nal[1:]))
            _parse_slice_header(r, log2_mfn)
            st = _PicState(mbs_w, mbs_h)
            for mb_y in range(mbs_h):
                for mb_x in range(mbs_w):
                    _decode_mb(r, st, mb_x, mb_y)
            frames.append(
                (
                    st.y[:height, :width].copy(),
                    st.cb[: (height + 1) // 2, : (width + 1) // 2].copy(),
                    st.cr[: (height + 1) // 2, : (width + 1) // 2].copy(),
                )
            )
            mb_types.append(st.mb_types)
        elif ntype == 1:
            raise ValueError(
                "non-IDR slices are outside the intra-only decode envelope"
            )
        # other NAL types (SEI etc.) are skipped
    if not frames:
        raise ValueError("stream holds no IDR pictures")
    return {
        "width": width,
        "height": height,
        "frames": frames,
        "mb_types": mb_types,
    }


def decode_mp4(data: bytes) -> dict:
    """Decode the H.264 Baseline intra samples INSIDE an MP4: pull the
    parameter sets from the avcC record, walk the sample seek table
    (:func:`mp4.sample_index` — the same byte ranges a distributed
    ranged-GET extractor uses), unpack each sample's length-prefixed
    NALs, and feed the rebuilt Annex-B stream to
    :func:`decode_annexb`. NAL payloads carry emulation prevention in
    BOTH storage forms, so the transmux is pure framing — no bit
    rewriting. Same envelope and return shape as decode_annexb."""
    from solarboat_data_pipeline_spark.operators.mp4 import (
        extract_avcc,
        parse_avcc,
        sample_index,
    )

    avcc = parse_avcc(extract_avcc(data))
    length_size = avcc["length_size"]
    es = bytearray()
    for nal in avcc["sps_nals"] + avcc["pps_nals"]:
        es += b"\x00\x00\x00\x01" + nal
    for r in sample_index(data):
        sample = data[r["offset"] : r["offset"] + r["size"]]
        pos = 0
        while pos < len(sample):
            if pos + length_size > len(sample):
                raise ValueError(
                    f"sample {r['sample']} truncated inside a NAL length prefix"
                )
            n = int.from_bytes(sample[pos : pos + length_size], "big")
            pos += length_size
            if n == 0 or pos + n > len(sample):
                raise ValueError(
                    f"sample {r['sample']} NAL length {n} overruns the sample"
                )
            es += b"\x00\x00\x00\x01" + sample[pos : pos + n]
            pos += n
    return decode_annexb(bytes(es))


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _sad(a: np.ndarray, b: np.ndarray) -> int:
    return int(np.abs(a.astype(np.int32) - b.astype(np.int32)).sum())


def _encode_mb(
    w: _SliceWriter,
    st: _PicState,
    src_y: np.ndarray,
    src_cb: np.ndarray,
    src_cr: np.ndarray,
    mb_x: int,
    mb_y: int,
    pcm_mae: float | None,
    force: str | None,
) -> int:
    x0, y0 = mb_x * 16, mb_y * 16
    cx0, cy0 = mb_x * 8, mb_y * 8
    avail_l, avail_t, avail_tl = _mb_avail(mb_x, mb_y)
    sy = src_y[y0 : y0 + 16, x0 : x0 + 16]
    scb = src_cb[cy0 : cy0 + 8, cx0 : cx0 + 8]
    scr = src_cr[cy0 : cy0 + 8, cx0 : cx0 + 8]

    def emit_pcm() -> int:
        w.ue(MB_IPCM)
        w.byte_align_zero()
        w.bytes_raw(sy.astype(np.uint8).tobytes())
        w.bytes_raw(scb.astype(np.uint8).tobytes())
        w.bytes_raw(scr.astype(np.uint8).tobytes())
        st.y[y0 : y0 + 16, x0 : x0 + 16] = sy
        st.cb[cy0 : cy0 + 8, cx0 : cx0 + 8] = scb
        st.cr[cy0 : cy0 + 8, cx0 : cx0 + 8] = scr
        st.tc[mb_y * 4 : mb_y * 4 + 4, mb_x * 4 : mb_x * 4 + 4] = 16
        st.mb_types.append(MB_IPCM)
        return MB_IPCM

    if force == "pcm":  # no mode search needed for a pinned PCM MB
        return emit_pcm()

    # --- candidate 1: I_16x16, best of the legal §8.3.3 modes ----------
    legal16 = [2] + ([0] if avail_t else []) + ([1] if avail_l else []) + (
        [3] if (avail_t and avail_l and avail_tl) else []
    )
    best16 = min(
        (
            (_sad(sy, _pred16x16(st.y, x0, y0, m, avail_l, avail_t, avail_tl)), m)
            for m in legal16
        ),
    )

    # --- candidate 2: I_4x4, per-block best mode (greedy, on a scratch
    # copy so later blocks predict from this candidate's reconstruction).
    # A zero-SAD I_16x16 hit cannot be beaten (ties go to I_16x16), so
    # skip the 16x9-mode search — the common case on predictable content.
    # Also skip it when I_16x16 already misses the PCM floor by a wide
    # margin (unpredictable content headed for the lossless fallback):
    # an encoder SPEED heuristic only — any mode choice is legal H.264
    # and the decoder-parity invariant is mode-independent
    hopeless = (
        force is None
        and pcm_mae is not None
        and best16[0] > (2 * pcm_mae + 8) * 256
    )
    skip_i4 = (best16[0] == 0 and force is None) or force == "i16" or hopeless
    scratch = st.y if skip_i4 else st.y.copy()
    i4_modes: list[int] = []
    i4_sad = 0
    for blk in range(0 if skip_i4 else 16):
        bx, by = _blk_xy(blk)
        ax, ay = x0 + bx, y0 + by
        al = st.sample_avail(ax - 1, ay, mb_x, mb_y, blk)
        at = st.sample_avail(ax, ay - 1, mb_x, mb_y, blk)
        atl = st.sample_avail(ax - 1, ay - 1, mb_x, mb_y, blk)
        atr = st.sample_avail(ax + 4, ay - 1, mb_x, mb_y, blk)
        legal = [2]
        if at:
            legal += [0, 3, 7]
        if al:
            legal += [1, 8]
        if at and al and atl:
            legal += [4, 5, 6]
        sblk = sy[by : by + 4, bx : bx + 4]
        bsad, bmode, bpred = None, None, None
        for m in sorted(legal):
            pred = _pred4x4(scratch, ax, ay, m, al, at, atl, atr)
            s = _sad(sblk, pred)
            if bsad is None or s < bsad:
                bsad, bmode, bpred = s, m, pred
        scratch[ay : ay + 4, ax : ax + 4] = bpred.astype(np.uint8)
        i4_modes.append(bmode)
        i4_sad += bsad

    # --- chroma: best of the legal §8.3.4 modes (shared by 16/4x4) -----
    legalc = [0] + ([1] if avail_l else []) + ([2] if avail_t else []) + (
        [3] if (avail_t and avail_l and avail_tl) else []
    )
    bestc = min(
        (
            (
                _sad(scb, _pred_chroma(st.cb, cx0, cy0, m, avail_l, avail_t, avail_tl))
                + _sad(scr, _pred_chroma(st.cr, cx0, cy0, m, avail_l, avail_t, avail_tl)),
                m,
            )
            for m in legalc
        ),
    )

    use_i4 = (not skip_i4) and i4_sad < best16[0]
    luma_sad = i4_sad if use_i4 else best16[0]
    mae = (luma_sad + bestc[0]) / (256 + 128)
    choice = force or ("pcm" if (pcm_mae is not None and mae > pcm_mae) else
                       ("i4" if use_i4 else "i16"))

    if choice == "pcm":
        return emit_pcm()

    if choice == "i4":
        w.ue(MB_I4X4)
        for blk, mode in enumerate(i4_modes):
            pred = st.pred_i4_mode(mb_x, mb_y, blk)
            if mode == pred:
                w.u(1, 1)
            else:
                w.u(0, 1)
                w.u(mode if mode < pred else mode - 1, 3)
            bx, by = _blk_xy(blk)
            st.i4mode[mb_y * 4 + by // 4, mb_x * 4 + bx // 4] = mode
        w.ue(bestc[1])
        w.ue(3)  # CBP 0 via Table 9-4 intra codeNum 3; no qp_delta/residual
        st.y[y0 : y0 + 16, x0 : x0 + 16] = scratch[y0 : y0 + 16, x0 : x0 + 16]
        mb_type = MB_I4X4
    else:
        mode16 = best16[1]
        mb_type = MB_I16X16_BASE + mode16
        w.ue(mb_type)
        w.ue(bestc[1])
        w.se(0)  # mb_qp_delta
        _write_coeff_token_zero(w, st.nc_luma(mb_x, mb_y, 0))
        st.y[y0 : y0 + 16, x0 : x0 + 16] = _pred16x16(
            st.y, x0, y0, mode16, avail_l, avail_t, avail_tl
        ).astype(np.uint8)

    st.cb[cy0 : cy0 + 8, cx0 : cx0 + 8] = _pred_chroma(
        st.cb, cx0, cy0, bestc[1], avail_l, avail_t, avail_tl
    ).astype(np.uint8)
    st.cr[cy0 : cy0 + 8, cx0 : cx0 + 8] = _pred_chroma(
        st.cr, cx0, cy0, bestc[1], avail_l, avail_t, avail_tl
    ).astype(np.uint8)
    st.mb_types.append(mb_type)
    return mb_type


def _pad_to_mb(plane: np.ndarray, h: int, w: int) -> np.ndarray:
    out = np.empty((h, w), dtype=np.uint8)
    ph, pw = plane.shape
    out[:ph, :pw] = plane
    out[:ph, pw:] = plane[:, pw - 1 : pw]
    out[ph:, :] = out[ph - 1 : ph, :]
    return out


def encode_idr_frames(
    frames: list[tuple[np.ndarray, np.ndarray, np.ndarray]],
    width: int,
    height: int,
    *,
    pcm_mae: float | None = 12.0,
    force: str | None = None,
    profile_idc: int = 66,
    level_idc: int = 30,
    recon_out: list | None = None,
) -> bytes:
    """Encode planar 4:2:0 frames (y HxW uint8, cb/cr at half size) as
    an Annex-B stream of IDR pictures (SPS + PPS + one slice per
    picture). ``force`` pins every macroblock to 'pcm' / 'i4' / 'i16';
    otherwise SAD mode decision picks per MB, falling back to LOSSLESS
    I_PCM when prediction alone cannot hold ``pcm_mae`` mean absolute
    error. Returns a stream :func:`decode_annexb` reproduces
    BIT-EXACTLY (decode == encoder reconstruction; == source wherever
    I_PCM was chosen). Pass a list as ``recon_out`` to receive the
    encoder's own display-cropped reconstruction per frame — the
    ground truth the decoder-parity tests compare against."""
    if width % 2 or height % 2:
        raise ValueError("4:2:0 requires even display dimensions")
    mbs_w = (width + 15) // 16
    mbs_h = (height + 15) // 16
    sps = encode_sps(width, height, profile_idc=profile_idc, level_idc=level_idc)
    pps = encode_pps(deblocking_control=True)
    out = bytearray()
    out += b"\x00\x00\x00\x01" + sps
    out += b"\x00\x00\x00\x01" + pps
    for fi, (y, cb, cr) in enumerate(frames):
        if y.shape != (height, width):
            raise ValueError(f"frame {fi} luma shape {y.shape} != ({height}, {width})")
        if cb.shape != (height // 2, width // 2) or cr.shape != cb.shape:
            raise ValueError(f"frame {fi} chroma planes must be half-size")
        src_y = _pad_to_mb(np.asarray(y, dtype=np.uint8), mbs_h * 16, mbs_w * 16)
        src_cb = _pad_to_mb(np.asarray(cb, dtype=np.uint8), mbs_h * 8, mbs_w * 8)
        src_cr = _pad_to_mb(np.asarray(cr, dtype=np.uint8), mbs_h * 8, mbs_w * 8)
        w = _SliceWriter()
        w.ue(0)  # first_mb_in_slice
        w.ue(7)  # slice_type: I (all slices of the picture)
        w.ue(0)  # pic_parameter_set_id
        w.u(0, 4)  # frame_num (log2_max_frame_num = 4)
        w.ue(fi % 2)  # idr_pic_id alternates between consecutive IDRs (§7.4.3)
        w.u(0, 1)  # no_output_of_prior_pics_flag
        w.u(0, 1)  # long_term_reference_flag
        w.se(0)  # slice_qp_delta
        w.ue(1)  # disable_deblocking_filter_idc = 1 (filter off)
        st = _PicState(mbs_w, mbs_h)
        for mb_y in range(mbs_h):
            for mb_x in range(mbs_w):
                _encode_mb(
                    w, st, src_y, src_cb, src_cr, mb_x, mb_y, pcm_mae, force
                )
        if recon_out is not None:
            recon_out.append(
                (
                    st.y[:height, :width].copy(),
                    st.cb[: height // 2, : width // 2].copy(),
                    st.cr[: height // 2, : width // 2].copy(),
                )
            )
        out += b"\x00\x00\x00\x01\x65" + _rbsp_to_nal(w.rbsp_trailing())
    return bytes(out)
