"""Pure-stdlib MP4 (ISO base media file format) prober and H.264
parameter-set parser (``struct`` only) — the compressed-video PROBE
companion to :mod:`.avi` / :mod:`.jpeg`.

Pixel decode of H.264/VP9 stays outside this repo's envelope
(:mod:`.multimodal` raises with the ffmpeg swap-in note).  What a
100 TB curation pipeline needs *before* any decode, though, is pure
structure: which files are video, their resolution / duration / frame
count / codec profile, and where the keyframes sit so frame sampling
can seek without decoding the stream.  All of that is container and
header parsing over public specifications, implemented completely
here:

* ISO/IEC 14496-12 (ISO BMFF): box walker over ``ftyp`` / ``moov``
  (``mvhd``, ``trak/tkhd``, ``mdia/mdhd``, ``stbl`` sample tables) —
  :func:`probe_mp4`, plus :func:`encode_mp4` to synthesize minimal
  valid files for tests and driver oracles.
* ISO/IEC 14496-15 (AVC in ISO BMFF): ``avcC``
  AVCDecoderConfigurationRecord parse/build.
* ITU-T H.264 §7.3.2.1.1 / §7.3.2.2: real Exp-Golomb bit-level SPS and
  PPS codecs with RBSP emulation-prevention (00 00 03) handling; coded
  dimensions derived per §7.4.2.1.1 including frame cropping with the
  chroma-format crop units.
* ITU-T H.264 Annex B: start-code NAL scanner —
  :func:`nal_scan` — yielding per-NAL (offset, type, size) so IDR
  keyframes index a raw elementary stream.

Everything raises ``ValueError`` with the precise reason on malformed
input (truncated boxes, bad sizes, overlong Exp-Golomb codes) — never
silent garbage.  Encoder envelope: even pixel dimensions (4:2:0 crop
units are 2 px; odd dimensions would need monochrome high profile) and
no VUI/scaling matrices; the PARSER handles the general syntax
including the high-profile chroma branch.

Reference parity note: the reference pipeline
(joaoantoniocardoso/solarboat_data_pipeline) has no video path at all;
this module extends the engine's LLM-curation surface (multimodal
columns) per SURVEY.md §2's training-data addendum.
"""

from __future__ import annotations

import struct

__all__ = [
    "encode_sps",
    "parse_sps",
    "encode_pps",
    "encode_avcc",
    "parse_avcc",
    "encode_mp4",
    "probe_mp4",
    "sample_index",
    "encode_fmp4",
    "fragment_index",
    "nal_scan",
]

# profile_idc values whose SPS carries the chroma_format_idc branch
# (ITU-T H.264 §7.3.2.1.1 note).
_HIGH_PROFILES = frozenset(
    {100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135}
)


# ---------------------------------------------------------------------------
# Bit-level RBSP I/O (Exp-Golomb, emulation prevention)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self._bits: list[int] = []

    def u(self, value: int, n: int) -> None:
        if value < 0 or value >> n:
            raise ValueError(f"u({n}) cannot hold {value}")
        for i in range(n - 1, -1, -1):
            self._bits.append((value >> i) & 1)

    def ue(self, value: int) -> None:
        # Exp-Golomb: M zeroes, 1, M-bit remainder of value+1.
        if value < 0:
            raise ValueError("ue(v) is unsigned")
        code = value + 1
        n = code.bit_length()
        self.u(0, n - 1)
        self.u(code, n)

    def se(self, value: int) -> None:
        # §9.1.1: positive k maps to 2k-1, non-positive to -2k.
        self.ue(2 * value - 1 if value > 0 else -2 * value)

    def rbsp_trailing(self) -> bytes:
        self._bits.append(1)
        while len(self._bits) % 8:
            self._bits.append(0)
        out = bytearray()
        for i in range(0, len(self._bits), 8):
            byte = 0
            for b in self._bits[i : i + 8]:
                byte = (byte << 1) | b
            out.append(byte)
        return bytes(out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self._data = data
        self._pos = 0  # bit cursor

    def u(self, n: int) -> int:
        if self._pos + n > len(self._data) * 8:
            raise ValueError("bitstream truncated")
        out = 0
        for _ in range(n):
            byte = self._data[self._pos >> 3]
            out = (out << 1) | ((byte >> (7 - (self._pos & 7))) & 1)
            self._pos += 1
        return out

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 32:
                raise ValueError("overlong Exp-Golomb code")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)


def _rbsp_to_nal(rbsp: bytes) -> bytes:
    """Insert emulation-prevention bytes (§7.4.1: 00 00 0x then x<=3)."""
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def _nal_to_rbsp(nal: bytes) -> bytes:
    """Strip emulation-prevention bytes (drop the 03 in 00 00 03)."""
    out = bytearray()
    zeros = 0
    i = 0
    while i < len(nal):
        b = nal[i]
        if zeros >= 2 and b == 3:
            zeros = 0
            i += 1
            continue
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
        i += 1
    return bytes(out)


# ---------------------------------------------------------------------------
# H.264 SPS / PPS
# ---------------------------------------------------------------------------


def encode_sps(
    width: int,
    height: int,
    profile_idc: int = 66,
    level_idc: int = 30,
    log2_max_frame_num: int = 4,
    max_num_ref_frames: int = 1,
) -> bytes:
    """Build a complete SPS NAL (header byte 0x67 + RBSP) for the given
    display dimensions, cropping from the 16x16-macroblock grid when
    needed.  4:2:0 crop units are 2 px, hence the even-dimension
    envelope (documented above)."""
    if width <= 0 or height <= 0:
        raise ValueError("dimensions must be positive")
    if width % 2 or height % 2:
        raise ValueError(
            "encode_sps envelope is even dimensions (4:2:0 crop units are 2 px)"
        )
    w = _BitWriter()
    w.u(profile_idc, 8)
    w.u(0, 8)  # constraint_set flags + reserved_zero_2bits
    w.u(level_idc, 8)
    w.ue(0)  # seq_parameter_set_id
    if profile_idc in _HIGH_PROFILES:
        w.ue(1)  # chroma_format_idc = 4:2:0
        w.ue(0)  # bit_depth_luma_minus8
        w.ue(0)  # bit_depth_chroma_minus8
        w.u(0, 1)  # qpprime_y_zero_transform_bypass_flag
        w.u(0, 1)  # seq_scaling_matrix_present_flag
    w.ue(log2_max_frame_num - 4)
    w.ue(2)  # pic_order_cnt_type 2: no further POC syntax
    w.ue(max_num_ref_frames)
    w.u(0, 1)  # gaps_in_frame_num_value_allowed_flag
    mbs_w = (width + 15) // 16
    map_h = (height + 15) // 16
    w.ue(mbs_w - 1)
    w.ue(map_h - 1)
    w.u(1, 1)  # frame_mbs_only_flag (progressive)
    w.u(1, 1)  # direct_8x8_inference_flag
    crop_r = (mbs_w * 16 - width) // 2  # CropUnitX = 2 (4:2:0)
    crop_b = (map_h * 16 - height) // 2  # CropUnitY = 2 * (2 - 1)
    if crop_r or crop_b:
        w.u(1, 1)  # frame_cropping_flag
        w.ue(0)
        w.ue(crop_r)
        w.ue(0)
        w.ue(crop_b)
    else:
        w.u(0, 1)
    w.u(0, 1)  # vui_parameters_present_flag
    return b"\x67" + _rbsp_to_nal(w.rbsp_trailing())


def parse_sps(nal: bytes) -> dict:
    """Parse an SPS NAL (with or without the 1-byte NAL header) down to
    coded dimensions per §7.4.2.1.1.  Handles the high-profile chroma
    branch, all three pic_order_cnt_types, interlaced map units, and
    frame cropping with chroma-dependent crop units."""
    if not nal:
        raise ValueError("empty SPS")
    # Strip a NAL header iff byte 0 is one a real SPS NAL can carry:
    # forbidden_zero_bit clear + nal_unit_type 7 (0x07/0x27/0x47/0x67).
    # No standard profile_idc (44..244 set) collides with those values,
    # while e.g. profile 135 = 0x87 has the low bits 7 but bit 7 set.
    if (nal[0] & 0x9F) == 0x07:
        nal = nal[1:]
    r = _BitReader(_nal_to_rbsp(nal))
    profile_idc = r.u(8)
    r.u(8)  # constraint flags + reserved
    level_idc = r.u(8)
    sps_id = r.ue()
    chroma_format_idc = 1
    separate_colour_plane = 0
    if profile_idc in _HIGH_PROFILES:
        chroma_format_idc = r.ue()
        if chroma_format_idc == 3:
            separate_colour_plane = r.u(1)
        r.ue()  # bit_depth_luma_minus8
        r.ue()  # bit_depth_chroma_minus8
        r.u(1)  # qpprime_y_zero_transform_bypass_flag
        if r.u(1):  # seq_scaling_matrix_present_flag
            raise ValueError("scaling matrices outside the probe envelope")
    log2_max_frame_num = r.ue() + 4
    poc_type = r.ue()
    if poc_type == 0:
        r.ue()  # log2_max_pic_order_cnt_lsb_minus4
    elif poc_type == 1:
        r.u(1)  # delta_pic_order_always_zero_flag
        r.se()  # offset_for_non_ref_pic
        r.se()  # offset_for_top_to_bottom_field
        for _ in range(r.ue()):
            r.se()
    r.ue()  # max_num_ref_frames
    r.u(1)  # gaps_in_frame_num_value_allowed_flag
    pic_width_in_mbs = r.ue() + 1
    pic_height_in_map_units = r.ue() + 1
    frame_mbs_only = r.u(1)
    if not frame_mbs_only:
        r.u(1)  # mb_adaptive_frame_field_flag
    r.u(1)  # direct_8x8_inference_flag
    width = pic_width_in_mbs * 16
    height = (2 - frame_mbs_only) * pic_height_in_map_units * 16
    if r.u(1):  # frame_cropping_flag
        left, right, top, bottom = r.ue(), r.ue(), r.ue(), r.ue()
        chroma_array_type = 0 if separate_colour_plane else chroma_format_idc
        if chroma_array_type == 0:
            unit_x, unit_y = 1, 2 - frame_mbs_only
        else:
            sub_w = 2 if chroma_array_type in (1, 2) else 1
            sub_h = 2 if chroma_array_type == 1 else 1
            unit_x = sub_w
            unit_y = sub_h * (2 - frame_mbs_only)
        width -= unit_x * (left + right)
        height -= unit_y * (top + bottom)
    return {
        "profile_idc": profile_idc,
        "level_idc": level_idc,
        "sps_id": sps_id,
        "chroma_format_idc": chroma_format_idc,
        "width": width,
        "height": height,
        "frame_mbs_only": frame_mbs_only,
        "log2_max_frame_num": log2_max_frame_num,
        "poc_type": poc_type,
    }


def encode_pps(deblocking_control: bool = False) -> bytes:
    """Minimal PPS NAL (§7.3.2.2): CAVLC, one slice group, defaults.
    ``deblocking_control`` sets deblocking_filter_control_present_flag
    so slice headers can carry disable_deblocking_filter_idc (the
    intra pixel codec in :mod:`.h264` turns the in-loop filter off)."""
    w = _BitWriter()
    w.ue(0)  # pic_parameter_set_id
    w.ue(0)  # seq_parameter_set_id
    w.u(0, 1)  # entropy_coding_mode_flag (CAVLC)
    w.u(0, 1)  # bottom_field_pic_order_in_frame_present_flag
    w.ue(0)  # num_slice_groups_minus1
    w.ue(0)  # num_ref_idx_l0_default_active_minus1
    w.ue(0)  # num_ref_idx_l1_default_active_minus1
    w.u(0, 1)  # weighted_pred_flag
    w.u(0, 2)  # weighted_bipred_idc
    w.se(0)  # pic_init_qp_minus26
    w.se(0)  # pic_init_qs_minus26
    w.se(0)  # chroma_qp_index_offset
    w.u(1 if deblocking_control else 0, 1)  # deblocking_filter_control_present_flag
    w.u(0, 1)  # constrained_intra_pred_flag
    w.u(0, 1)  # redundant_pic_cnt_present_flag
    return b"\x68" + _rbsp_to_nal(w.rbsp_trailing())


def encode_avcc(sps: bytes, pps: bytes) -> bytes:
    """AVCDecoderConfigurationRecord (ISO 14496-15 §5.3.3.1)."""
    return (
        bytes([1, sps[1], sps[2], sps[3], 0xFF, 0xE1])
        + struct.pack(">H", len(sps))
        + sps
        + b"\x01"
        + struct.pack(">H", len(pps))
        + pps
    )


def parse_avcc(data: bytes) -> dict:
    if len(data) < 7 or data[0] != 1:
        raise ValueError("not an AVCDecoderConfigurationRecord")

    def _take_sets(pos: int, n: int) -> tuple[list[bytes], int]:
        out = []
        for _ in range(n):
            if pos + 2 > len(data):
                raise ValueError("avcC truncated in a parameter-set length")
            (ln,) = struct.unpack_from(">H", data, pos)
            pos += 2
            if pos + ln > len(data):
                raise ValueError("avcC parameter set overruns the record")
            out.append(data[pos : pos + ln])
            pos += ln
        return out, pos

    n_sps = data[5] & 0x1F
    sps_list, pos = _take_sets(6, n_sps)
    if pos >= len(data):
        raise ValueError("avcC truncated before the PPS count")
    n_pps = data[pos]
    pps_list, pos = _take_sets(pos + 1, n_pps)
    if not sps_list:
        raise ValueError("avcC carries no SPS")
    out = parse_sps(sps_list[0])
    out["n_sps"] = n_sps
    out["n_pps"] = n_pps
    out["length_size"] = (data[4] & 3) + 1
    # raw parameter-set NALs: what a transmuxer prepends (with start
    # codes) to length-prefixed samples to rebuild an Annex-B stream
    out["sps_nals"] = sps_list
    out["pps_nals"] = pps_list
    return out


def _avcc_from_stsd(stsd: bytes) -> bytes:
    """Slice the raw avcC record out of an stsd payload whose first
    sample entry is avc1 (8-byte box header + 78-byte fixed
    VisualSampleEntry body before child boxes) — shared by the probe
    and the transmux path."""
    fourcc = stsd[4 + 4 + 4 : 4 + 4 + 8]
    if fourcc != b"avc1":
        raise ValueError(f"sample entry {fourcc!r} is not avc1")
    child = stsd[4 + 4 :][8 + 78 :]
    (csize,) = struct.unpack_from(">I", child, 0)
    if child[4:8] != b"avcC":
        raise ValueError("avc1 entry without leading avcC")
    return child[8:csize]


def extract_avcc(data: bytes) -> bytes:
    """Pull the raw AVCDecoderConfigurationRecord out of an MP4's avc1
    sample entry (stsd → avc1 → avcC) — the parameter-set source for
    MP4→Annex-B transmuxing."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an ISO BMFF file (no leading ftyp)")
    boxes: dict = {}
    _walk(data, 0, len(data), boxes)
    if b"stsd" not in boxes:
        raise ValueError("required box b'stsd' missing")
    try:
        return _avcc_from_stsd(boxes[b"stsd"][0])
    except (struct.error, IndexError) as exc:
        raise ValueError(f"stsd truncated or malformed: {exc}") from exc


def annexb_to_mp4(
    es: bytes, *, sample_delta: int = 25, timescale: int = 600
) -> bytes:
    """Package an Annex-B H.264 stream (SPS + PPS + coded pictures,
    e.g. :mod:`.h264` encoder output) as an MP4: parameter sets move
    into the avcC record, every VCL NAL becomes one length-prefixed
    sample, display dimensions come from the SPS. The inverse of
    :func:`h264.decode_mp4`'s framing walk."""
    sps = pps = None
    samples = []
    for u in nal_scan(es):
        nal = es[u["offset"] : u["offset"] + u["size"]]
        if u["nal_type"] == 7:
            sps = nal
        elif u["nal_type"] == 8:
            pps = nal
        elif u["nal_type"] in (1, 5):
            samples.append(struct.pack(">I", len(nal)) + nal)
    if sps is None or pps is None:
        raise ValueError("stream carries no SPS/PPS to move into avcC")
    info = parse_sps(sps)
    return encode_mp4_samples(
        info["width"], info["height"], samples,
        sps=sps, pps=pps, timescale=timescale, sample_delta=sample_delta,
    )


# ---------------------------------------------------------------------------
# ISO BMFF writer
# ---------------------------------------------------------------------------


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _full(btype: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(btype, struct.pack(">B3s", version, flags.to_bytes(3, "big")) + payload)


_UNITY_MATRIX = struct.pack(
    ">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000
)


def encode_mp4(
    width: int,
    height: int,
    sample_sizes: list[int],
    timescale: int = 600,
    sample_delta: int = 25,
    profile_idc: int = 66,
    level_idc: int = 30,
) -> bytes:
    """Minimal valid single-video-track MP4.  Sample payloads are
    deterministic opaque bytes (this is a PROBE fixture — the sample
    table geometry, avcC parameter sets, and every box header are real;
    only the slice payload bytes are synthetic).  For REAL coded
    samples use :func:`encode_mp4_samples`."""
    samples = []
    for i, size in enumerate(sample_sizes):
        if size < 6:
            raise ValueError("sample too small for a length-prefixed NAL")
        body = bytes(
            (width * 7 + height * 11 + i * 13 + j * 5) % 256 for j in range(size - 5)
        )
        samples.append(struct.pack(">I", size - 4) + b"\x65" + body)
    return encode_mp4_samples(
        width,
        height,
        samples,
        timescale=timescale,
        sample_delta=sample_delta,
        sps=encode_sps(width, height, profile_idc=profile_idc, level_idc=level_idc),
        pps=encode_pps(),
    )


def encode_mp4_samples(
    width: int,
    height: int,
    samples: list[bytes],
    *,
    sps: bytes,
    pps: bytes,
    timescale: int = 600,
    sample_delta: int = 25,
) -> bytes:
    """Single-video-track MP4 around EXPLICIT sample payloads (each a
    length-prefixed-NAL byte string, e.g. a real coded IDR picture) and
    explicit SPS/PPS NALs for the avcC record — the shape a packager
    produces around :mod:`.h264` encoder output."""
    n = len(samples)
    if n == 0:
        raise ValueError("at least one sample")
    sample_sizes = [len(s) for s in samples]
    duration = n * sample_delta
    avcc = _box(b"avcC", encode_avcc(sps, pps))
    avc1 = _box(
        b"avc1",
        b"\x00" * 6
        + struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 16  # pre_defined / reserved
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x480000, 0x480000)  # 72 dpi
        + b"\x00" * 4
        + struct.pack(">H", 1)  # frame_count
        + b"\x00" * 32  # compressorname
        + struct.pack(">Hh", 24, -1)  # depth, pre_defined
        + avcc,
    )
    stbl = (
        _full(b"stsd", 0, 0, struct.pack(">I", 1) + avc1)
        + _full(b"stts", 0, 0, struct.pack(">III", 1, n, sample_delta))
        + _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
        + _full(
            b"stsz",
            0,
            0,
            struct.pack(">II", 0, n) + b"".join(struct.pack(">I", s) for s in sample_sizes),
        )
        # stco chunk offset patched below once the moov size is known
        + _full(b"stco", 0, 0, struct.pack(">II", 1, 0))
    )
    minf = (
        _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
        + _box(
            b"dinf",
            _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b"")),
        )
        + _box(b"stbl", stbl)
    )
    mdia = (
        _full(
            b"mdhd",
            0,
            0,
            struct.pack(">IIIIHH", 0, 0, timescale, duration, 0x55C4, 0),
        )
        + _full(
            b"hdlr",
            0,
            0,
            struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"VideoHandler\x00",
        )
        + _box(b"minf", minf)
    )
    tkhd = _full(
        b"tkhd",
        0,
        3,  # enabled | in_movie
        struct.pack(">IIII", 0, 0, 1, 0)  # times, track_ID, reserved
        + struct.pack(">I", duration)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)  # layer, group, volume, reserved
        + _UNITY_MATRIX
        + struct.pack(">II", width << 16, height << 16),
    )
    mvhd = _full(
        b"mvhd",
        0,
        0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">iH", 0x10000, 0x0100)  # rate, volume
        + b"\x00" * 10
        + _UNITY_MATRIX
        + b"\x00" * 24  # pre_defined
        + struct.pack(">I", 2),  # next_track_ID
    )
    moov = _box(b"moov", mvhd + _box(b"trak", tkhd + _box(b"mdia", mdia)))
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomavc1")
    # Patch the single stco entry: first sample starts right after the
    # mdat header.
    chunk_offset = len(ftyp) + len(moov) + 8
    stco_payload = _full(b"stco", 0, 0, struct.pack(">II", 1, chunk_offset))
    idx = moov.rindex(b"stco")
    moov = moov[: idx - 4] + stco_payload + moov[idx - 4 + len(stco_payload) :]
    return ftyp + moov + _box(b"mdat", b"".join(samples))


# ---------------------------------------------------------------------------
# ISO BMFF prober
# ---------------------------------------------------------------------------

_CONTAINERS = {
    b"moov", b"trak", b"mdia", b"minf", b"stbl", b"dinf", b"edts",
    b"moof", b"traf", b"mvex",
}


_MAX_BOX_DEPTH = 32  # real files nest ~6 deep; a crafted bomb recurses


def _walk(data: bytes, start: int, end: int, out: dict, depth: int = 0) -> None:
    if depth > _MAX_BOX_DEPTH:
        raise ValueError(f"box nesting exceeds {_MAX_BOX_DEPTH} levels")
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError(f"truncated box header at {pos}")
        (size,) = struct.unpack_from(">I", data, pos)
        btype = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                raise ValueError(f"truncated largesize box at {pos}")
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            body = pos + 16
        elif size == 0:  # to end of file
            size = end - pos
        if size < body - pos or pos + size > end:
            raise ValueError(f"box {btype!r} at {pos} overruns its parent")
        if btype in _CONTAINERS:
            _walk(data, body, pos + size, out, depth + 1)
        elif btype == b"mdat":
            # zero-copy: only the media payload LENGTH is ever read, and
            # copying it would double peak RSS on large files
            out.setdefault(btype, []).append(memoryview(data)[body : pos + size])
        else:
            out.setdefault(btype, []).append(data[body : pos + size])
        pos += size


def probe_mp4(data: bytes) -> dict:
    """Probe an MP4: brand, movie timescale/duration, track dimensions,
    sample-entry fourcc, avcC-derived coded dimensions and profile,
    sample count/bytes and (constant-delta) frame rate.  Pure box and
    bitstream parsing — no pixel decode."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an ISO BMFF file (no leading ftyp)")
    boxes: dict = {}
    _walk(data, 0, len(data), boxes)

    def _req(btype: bytes) -> bytes:
        if btype not in boxes:
            raise ValueError(f"required box {btype!r} missing")
        return boxes[btype][0]

    def _fourcc(raw: bytes, what: str) -> str:
        try:
            return raw.decode("ascii")
        except UnicodeDecodeError as exc:
            raise ValueError(f"non-ASCII {what} {raw!r}") from exc

    try:
        return _probe_fields(data, boxes, _req, _fourcc)
    except (struct.error, IndexError) as exc:
        raise ValueError(f"box payload truncated or malformed: {exc}") from exc


def _probe_fields(data: bytes, boxes: dict, _req, _fourcc) -> dict:
    out: dict = {"major_brand": _fourcc(_req(b"ftyp")[:4], "brand")}
    mvhd = _req(b"mvhd")
    version = mvhd[0]
    if version == 1:
        timescale, duration = struct.unpack_from(">IQ", mvhd, 4 + 16)
    else:
        _, _, timescale, duration = struct.unpack_from(">IIII", mvhd, 4)
    out["timescale"] = timescale
    out["duration"] = duration
    out["duration_ms"] = round(duration * 1000 / timescale) if timescale else None
    tkhd = _req(b"tkhd")
    # version/flags + times/id/duration + reserved(8) +
    # layer/group/volume/reserved(8) + matrix(36)
    if tkhd[0] == 1:
        w_off = 4 + 32 + 8 + 8 + 36
    else:
        w_off = 4 + 20 + 8 + 8 + 36
    tw, th = struct.unpack_from(">II", tkhd, w_off)
    out["track_width"] = tw >> 16
    out["track_height"] = th >> 16
    stsd = _req(b"stsd")
    out["codec"] = _fourcc(stsd[4 + 4 + 4 : 4 + 4 + 8], "sample-entry fourcc")
    if out["codec"] == "avc1":
        cfg = parse_avcc(_avcc_from_stsd(stsd))
        out["profile_idc"] = cfg["profile_idc"]
        out["level_idc"] = cfg["level_idc"]
        out["coded_width"] = cfg["width"]
        out["coded_height"] = cfg["height"]
    stsz = _req(b"stsz")
    fixed, count = struct.unpack_from(">II", stsz, 4)
    # moof/mvex are containers in _walk, so test the trun leaf
    out["fragmented"] = count == 0 and b"trun" in boxes
    if out["fragmented"]:
        # CMAF/DASH shape: the sample population lives in the moof
        # sequence, not the (empty) moov sample tables.
        frag_rows = fragment_index(data)
        out["n_samples"] = len(frag_rows)
        out["sample_bytes"] = sum(r["size"] for r in frag_rows)
        out["n_fragments"] = frag_rows[-1]["fragment"] if frag_rows else 0
        delta = None
        if b"trex" in boxes:
            delta = struct.unpack_from(">I", boxes[b"trex"][0], 12)[0]
        mdhd = _req(b"mdhd")
        med_ts = struct.unpack_from(">I", mdhd, 4 + 16 if mdhd[0] == 1 else 4 + 8)[0]
        out["fps_x1000"] = round(med_ts * 1000 / delta) if delta else None
    else:
        out["n_samples"] = count
        if count > len(data):
            raise ValueError(
                f"stsz declares {count} samples in a {len(data)}-byte file"
            )
        if fixed:
            out["sample_bytes"] = fixed * count
        else:
            out["sample_bytes"] = sum(
                struct.unpack_from(">I", stsz, 12 + 4 * i)[0] for i in range(count)
            )
        stts = _req(b"stts")
        (n_entries,) = struct.unpack_from(">I", stts, 4)
        if n_entries == 1:
            _, delta = struct.unpack_from(">II", stts, 8)
            mdhd = _req(b"mdhd")
            med_ts = struct.unpack_from(">I", mdhd, 4 + 16 if mdhd[0] == 1 else 4 + 8)[0]
            out["fps_x1000"] = round(med_ts * 1000 / delta) if delta else None
        else:
            out["fps_x1000"] = None
    if b"mdat" in boxes:
        out["mdat_bytes"] = sum(len(m) for m in boxes[b"mdat"])
    # Integrity: the first chunk's sample data must fit in the file —
    # catches files truncated exactly at a box boundary (every box
    # parses, but the mdat the sample table points into is gone).
    if b"stco" in boxes:
        n_chunks, = struct.unpack_from(">I", boxes[b"stco"][0], 4)
        if n_chunks:
            first_off, = struct.unpack_from(">I", boxes[b"stco"][0], 8)
            if n_chunks == 1 and first_off + out["sample_bytes"] > len(data):
                raise ValueError(
                    "sample data extends past end of file "
                    f"(chunk at {first_off} + {out['sample_bytes']} bytes "
                    f"> {len(data)})"
                )
            if first_off > len(data):
                raise ValueError("chunk offset past end of file")
    return out


# ---------------------------------------------------------------------------
# Annex-B elementary-stream NAL scanner
# ---------------------------------------------------------------------------


def nal_scan(es: bytes) -> list[dict]:
    """Scan an H.264 Annex-B elementary stream into NAL units via
    start-code search (00 00 01 / 00 00 00 01).  Returns per-NAL
    ``{"offset", "size", "nal_type", "is_idr"}`` — enough to build a
    keyframe index for seek-based frame sampling without any decode."""
    units: list[dict] = []
    n = len(es)
    pos = es.find(b"\x00\x00\x01")
    if pos < 0:
        raise ValueError("no Annex-B start code found")
    while pos >= 0 and pos + 3 < n:
        start = pos + 3
        nxt = es.find(b"\x00\x00\x01", start)
        end = nxt if nxt >= 0 else n
        # a 4-byte start code owns its leading zero byte
        if nxt > 0 and es[nxt - 1] == 0:
            end = nxt - 1
        header = es[start]
        units.append(
            {
                "offset": start,
                "size": end - start,
                "nal_type": header & 0x1F,
                "is_idr": (header & 0x1F) == 5,
            }
        )
        pos = nxt
    return units


# ---------------------------------------------------------------------------
# Sample seek table (stsc / stsz / stco / stts walk)
# ---------------------------------------------------------------------------


def sample_index(data: bytes) -> list[dict]:
    """Build the per-sample seek table of an MP4: for every sample its
    byte ``offset``/``size`` in the file and its decode timestamp in
    media-timescale ``dts_ticks`` — the table a frame extractor needs
    to read ONE sample without touching the rest of the file.  Full
    ISO 14496-12 semantics: the stsc run-length chunk map (entries
    cover [first_chunk, next.first_chunk)), 32-bit stco or 64-bit co64
    offsets, fixed- or per-sample stsz, stts delta runs.  Raises
    ValueError on any inconsistency (counts disagreeing across tables,
    a sample overrunning the file)."""
    boxes: dict = {}
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an ISO BMFF file (no leading ftyp)")
    _walk(data, 0, len(data), boxes)
    try:
        return _sample_index_fields(data, boxes)
    except (struct.error, IndexError) as exc:
        raise ValueError(f"sample-table box truncated or malformed: {exc}") from exc


def _sample_index_fields(data: bytes, boxes: dict) -> list[dict]:
    def _req(btype: bytes) -> bytes:
        if btype not in boxes:
            raise ValueError(f"required box {btype!r} missing")
        return boxes[btype][0]

    stsz = _req(b"stsz")
    fixed, count = struct.unpack_from(">II", stsz, 4)
    if count == 0 and b"trun" in boxes:
        raise ValueError(
            "empty sample tables with moof fragments: a fragmented MP4 "
            "(use fragment_index)"
        )
    if count > len(data):
        raise ValueError(
            f"stsz declares {count} samples in a {len(data)}-byte file"
        )
    sizes = (
        [fixed] * count
        if fixed
        else [
            struct.unpack_from(">I", stsz, 12 + 4 * i)[0] for i in range(count)
        ]
    )
    if b"co64" in boxes:
        co = boxes[b"co64"][0]
        (n_chunks,) = struct.unpack_from(">I", co, 4)
        offsets = [
            struct.unpack_from(">Q", co, 8 + 8 * i)[0] for i in range(n_chunks)
        ]
    else:
        co = _req(b"stco")
        (n_chunks,) = struct.unpack_from(">I", co, 4)
        offsets = [
            struct.unpack_from(">I", co, 8 + 4 * i)[0] for i in range(n_chunks)
        ]
    stsc = _req(b"stsc")
    (n_runs,) = struct.unpack_from(">I", stsc, 4)
    runs = [
        struct.unpack_from(">III", stsc, 8 + 12 * i) for i in range(n_runs)
    ]  # (first_chunk 1-based, samples_per_chunk, sample_description_index)
    if not runs or runs[0][0] != 1:
        raise ValueError("stsc must start at chunk 1")
    stts = _req(b"stts")
    (n_tt,) = struct.unpack_from(">I", stts, 4)
    deltas: list[int] = []
    for i in range(n_tt):
        n, d = struct.unpack_from(">II", stts, 8 + 8 * i)
        if len(deltas) + n > count:
            # guard BEFORE extending: a mutated run count could other-
            # wise allocate a multi-GB list from a 4-byte field
            raise ValueError(
                f"stts covers more than the {count} samples stsz declares"
            )
        deltas.extend([d] * n)
    if len(deltas) != count:
        raise ValueError(
            f"stts covers {len(deltas)} samples, stsz declares {count}"
        )
    out: list[dict] = []
    sample = 0
    dts = 0
    for run_i, (first_chunk, per_chunk, _desc) in enumerate(runs):
        last_chunk = (
            runs[run_i + 1][0] - 1 if run_i + 1 < len(runs) else len(offsets)
        )
        if last_chunk < first_chunk:
            raise ValueError("stsc first_chunk values must increase")
        for chunk in range(first_chunk, last_chunk + 1):
            pos = offsets[chunk - 1]
            for _ in range(per_chunk):
                if sample >= count:
                    raise ValueError(
                        "stsc maps more samples than stsz declares"
                    )
                size = sizes[sample]
                if pos + size > len(data):
                    raise ValueError(
                        f"sample {sample} overruns the file "
                        f"({pos}+{size} > {len(data)})"
                    )
                out.append(
                    {
                        "sample": sample,
                        "offset": pos,
                        "size": size,
                        "dts_ticks": dts,
                    }
                )
                dts += deltas[sample]
                pos += size
                sample += 1
    if sample != count:
        raise ValueError(
            f"stsc maps {sample} samples, stsz declares {count}"
        )
    return out


# ---------------------------------------------------------------------------
# Fragmented MP4 (fMP4 / CMAF — the DASH/HLS segment shape)
# ---------------------------------------------------------------------------


def encode_fmp4(
    width: int,
    height: int,
    fragments: list[list[int]],
    timescale: int = 600,
    sample_delta: int = 25,
    profile_idc: int = 66,
    level_idc: int = 30,
) -> bytes:
    """Minimal valid FRAGMENTED MP4 (ISO 14496-12 §8.8): an init
    section (ftyp + moov whose sample tables are empty and whose mvex/
    trex carries the defaults) followed by one moof(mfhd, traf(tfhd,
    tfdt, trun)) + mdat pair per fragment — the shape DASH/HLS CMAF
    segments arrive in.  ``fragments`` is a list of per-fragment sample
    size lists."""
    if not fragments or any(not f for f in fragments):
        raise ValueError("at least one fragment, each with samples")
    sps = encode_sps(width, height, profile_idc=profile_idc, level_idc=level_idc)
    pps = encode_pps()
    avcc = _box(b"avcC", encode_avcc(sps, pps))
    avc1 = _box(
        b"avc1",
        b"\x00" * 6
        + struct.pack(">H", 1)
        + b"\x00" * 16
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x480000, 0x480000)
        + b"\x00" * 4
        + struct.pack(">H", 1)
        + b"\x00" * 32
        + struct.pack(">Hh", 24, -1)
        + avcc,
    )
    stbl = (
        _full(b"stsd", 0, 0, struct.pack(">I", 1) + avc1)
        + _full(b"stts", 0, 0, struct.pack(">I", 0))
        + _full(b"stsc", 0, 0, struct.pack(">I", 0))
        + _full(b"stsz", 0, 0, struct.pack(">II", 0, 0))
        + _full(b"stco", 0, 0, struct.pack(">I", 0))
    )
    minf = (
        _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
        + _box(
            b"dinf",
            _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b"")),
        )
        + _box(b"stbl", stbl)
    )
    mdia = (
        _full(b"mdhd", 0, 0, struct.pack(">IIIIHH", 0, 0, timescale, 0, 0x55C4, 0))
        + _full(
            b"hdlr",
            0,
            0,
            struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"VideoHandler\x00",
        )
        + _box(b"minf", minf)
    )
    tkhd = _full(
        b"tkhd",
        0,
        3,
        struct.pack(">IIII", 0, 0, 1, 0)
        + struct.pack(">I", 0)  # duration unknown in fragmented files
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + _UNITY_MATRIX
        + struct.pack(">II", width << 16, height << 16),
    )
    mvhd = _full(
        b"mvhd",
        0,
        0,
        struct.pack(">IIII", 0, 0, timescale, 0)
        + struct.pack(">iH", 0x10000, 0x0100)
        + b"\x00" * 10
        + _UNITY_MATRIX
        + b"\x00" * 24
        + struct.pack(">I", 2),
    )
    # trex: track 1, sample-description 1, default duration/size/flags
    trex = _full(
        b"trex", 0, 0, struct.pack(">IIIII", 1, 1, sample_delta, 0, 0x10000)
    )
    moov = _box(
        b"moov",
        mvhd + _box(b"trak", tkhd + _box(b"mdia", mdia)) + _box(b"mvex", trex),
    )
    ftyp = _box(b"ftyp", b"cmfc" + struct.pack(">I", 0) + b"isomiso6")
    out = bytearray(ftyp + moov)
    base_time = 0
    for frag_i, sizes in enumerate(fragments):
        mfhd = _full(b"mfhd", 0, 0, struct.pack(">I", frag_i + 1))
        tfhd = _full(b"tfhd", 0, 0x020000, struct.pack(">I", 1))  # base-is-moof
        tfdt = _full(b"tfdt", 0, 0, struct.pack(">I", base_time))
        # trun flags: 0x1 data-offset-present | 0x200 sample-size-present
        trun_payload = struct.pack(">I", len(sizes)) + struct.pack(">i", 0)
        trun_payload += b"".join(struct.pack(">I", s) for s in sizes)
        trun = _full(b"trun", 0, 0x000201, trun_payload)
        traf = _box(b"traf", tfhd + tfdt + trun)
        moof = _box(b"moof", mfhd + traf)
        # patch the data offset: first sample starts right after this
        # moof's mdat header (offset is relative to the moof start)
        data_offset = len(moof) + 8
        ti = moof.rindex(b"trun")
        moof = (
            moof[: ti + 4 + 4 + 4]  # 'trun' + version/flags + sample_count
            + struct.pack(">i", data_offset)
            + moof[ti + 4 + 4 + 4 + 4 :]
        )
        samples = bytearray()
        for i, size in enumerate(sizes):
            if size < 6:
                raise ValueError("sample too small for a length-prefixed NAL")
            body = bytes(
                (width * 7 + height * 11 + (base_time + i) * 13 + j * 5) % 256
                for j in range(size - 5)
            )
            samples += struct.pack(">I", size - 4) + b"\x65" + body
        out += moof + _box(b"mdat", bytes(samples))
        base_time += len(sizes) * sample_delta
    return bytes(out)


def _parse_tfhd(tfhd: bytes) -> dict:
    flags = int.from_bytes(tfhd[1:4], "big")
    pos = 4
    (track_id,) = struct.unpack_from(">I", tfhd, pos)
    pos += 4
    out = {"track_id": track_id, "base_is_moof": bool(flags & 0x020000)}
    if flags & 0x000001:
        (out["base_data_offset"],) = struct.unpack_from(">Q", tfhd, pos)
        pos += 8
    if flags & 0x000002:
        pos += 4  # sample_description_index
    if flags & 0x000008:
        (out["default_duration"],) = struct.unpack_from(">I", tfhd, pos)
        pos += 4
    if flags & 0x000010:
        (out["default_size"],) = struct.unpack_from(">I", tfhd, pos)
        pos += 4
    return out


def _parse_trun(trun: bytes) -> dict:
    version = trun[0]
    flags = int.from_bytes(trun[1:4], "big")
    pos = 4
    (count,) = struct.unpack_from(">I", trun, pos)
    pos += 4
    out: dict = {"count": count, "data_offset": None, "sizes": None, "durations": None}
    if flags & 0x000001:
        (out["data_offset"],) = struct.unpack_from(">i", trun, pos)
        pos += 4
    if flags & 0x000004:
        pos += 4  # first_sample_flags
    sizes: list[int] | None = [] if flags & 0x000200 else None
    durs: list[int] | None = [] if flags & 0x000100 else None
    for _ in range(count):
        if flags & 0x000100:
            (d,) = struct.unpack_from(">I", trun, pos)
            durs.append(d)
            pos += 4
        if flags & 0x000200:
            (s,) = struct.unpack_from(">I", trun, pos)
            sizes.append(s)
            pos += 4
        if flags & 0x000400:
            pos += 4  # sample_flags
        if flags & 0x000800:
            pos += 4  # composition offset (signed in v1; skipped either way)
    out["sizes"] = sizes
    out["durations"] = durs
    out["version"] = version
    return out


def _iter_top_level(data: bytes):
    """Yield (type, box_start, body_start, end) for top-level boxes."""
    pos = 0
    n = len(data)
    while pos < n:
        if pos + 8 > n:
            raise ValueError(f"truncated top-level box header at {pos}")
        (size,) = struct.unpack_from(">I", data, pos)
        btype = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > n:
                raise ValueError(f"truncated largesize box at {pos}")
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            body = pos + 16
        elif size == 0:
            size = n - pos
        if size < body - pos or pos + size > n:
            raise ValueError(f"top-level box {btype!r} at {pos} overruns the file")
        yield btype, pos, body, pos + size
        pos += size


def fragment_index(data: bytes) -> list[dict]:
    """Per-sample seek table of a FRAGMENTED MP4: walk the top-level
    moof sequence, resolve each traf's trun against the tfhd/trex
    defaults and the default-base-is-moof / base-data-offset anchoring
    rules (§8.8.7), and emit the same rows as :func:`sample_index` plus
    the owning ``fragment`` number.  Raises ValueError on malformed or
    non-fragmented input."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an ISO BMFF file (no leading ftyp)")
    try:
        return _fragment_index_fields(data)
    except (struct.error, IndexError) as exc:
        raise ValueError(f"fragment box truncated or malformed: {exc}") from exc


def _fragment_index_fields(data: bytes) -> list[dict]:
    # trex defaults from the init section
    boxes: dict = {}
    _walk(data, 0, len(data), boxes)
    default_duration = None
    default_size = None
    if b"trex" in boxes:
        _tid, _sdi, default_duration, default_size, _fl = struct.unpack_from(
            ">IIIII", boxes[b"trex"][0], 4
        )
    out: list[dict] = []
    sample = 0
    dts = 0
    frag = 0
    saw_moof = False
    for btype, box_start, body, end in _iter_top_level(data):
        if btype != b"moof":
            continue
        saw_moof = True
        frag += 1
        frag_boxes: dict = {}
        _walk(data, body, end, frag_boxes)
        if b"trun" not in frag_boxes:
            raise ValueError(f"moof at {box_start} carries no trun")
        if len(frag_boxes.get(b"tfhd", [])) > 1:
            raise ValueError(
                "multi-traf moof without explicit base offsets is outside "
                "the envelope (spec default anchors at the previous traf's "
                "data end, ISO 14496-12 \u00a78.8.7)"
            )
        tfhd = _parse_tfhd(frag_boxes[b"tfhd"][0]) if b"tfhd" in frag_boxes else {}
        if b"tfdt" in frag_boxes:
            t = frag_boxes[b"tfdt"][0]
            dts = (
                struct.unpack_from(">Q", t, 4)[0]
                if t[0] == 1
                else struct.unpack_from(">I", t, 4)[0]
            )
        for trun_raw in frag_boxes[b"trun"]:
            trun = _parse_trun(trun_raw)
            if trun["count"] > len(data):
                raise ValueError(
                    f"trun declares {trun['count']} samples in a "
                    f"{len(data)}-byte file"
                )
            if trun["data_offset"] is None:
                raise ValueError("trun without a data offset is outside the envelope")
            # \u00a78.8.7: explicit base wins; default-base-is-moof anchors
            # at the moof; otherwise the spec default for the FIRST traf
            # is also the moof start (later trafs are rejected above)
            base = tfhd.get("base_data_offset", box_start)
            pos = base + trun["data_offset"]
            for i in range(trun["count"]):
                if trun["sizes"] is not None:
                    size = trun["sizes"][i]
                elif tfhd.get("default_size") is not None:
                    size = tfhd["default_size"]
                elif default_size:
                    size = default_size
                else:
                    raise ValueError("no sample size: trun, tfhd and trex all silent")
                if trun["durations"] is not None:
                    dur = trun["durations"][i]
                elif tfhd.get("default_duration") is not None:
                    dur = tfhd["default_duration"]
                elif default_duration:
                    dur = default_duration
                else:
                    raise ValueError("no sample duration: trun, tfhd and trex all silent")
                if pos + size > len(data):
                    raise ValueError(
                        f"fragment sample {sample} overruns the file"
                    )
                out.append(
                    {
                        "sample": sample,
                        "fragment": frag,
                        "offset": pos,
                        "size": size,
                        "dts_ticks": dts,
                    }
                )
                pos += size
                dts += dur
                sample += 1
    if not saw_moof:
        raise ValueError("no moof boxes: not a fragmented MP4 (use sample_index)")
    return out
