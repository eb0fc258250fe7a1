"""Pure-stdlib MP3 frame-sync scanner (``struct``-free — the header is
four bytes of bit fields) — the compressed-AUDIO twin of the
:mod:`.mp4` / :mod:`.vp9` probe lane.

Same structure-not-samples envelope: no Huffman/IMDCT decode (a
production cluster swaps in a real codec), but everything an audio
curation pipeline needs BEFORE decode is pure header arithmetic from
the public MPEG audio spec (ISO/IEC 11172-3 §2.4.1.3, extended by
ISO/IEC 13818-3 for MPEG-2 and the de-facto MPEG-2.5 extension):

* the 4-byte frame header: 11 sync bits, version/layer ids, bitrate
  and sample-rate table indices, padding bit, channel mode — including
  FREE-FORMAT streams (bitrate index 0, round 11: the constant frame
  length is derived by scanning for the next matching sync, the
  §2.4.2.3 procedure real decoders use);
* the frame-length recurrences (Layer I: ``(12·bitrate/rate + pad)·4``
  bytes; Layers II/III: ``(N·bitrate/8)/rate + pad`` with N = samples
  per frame) that let a scanner WALK frame to frame without decoding;
* samples-per-frame (384 / 1152 / 1152-or-576) → exact duration from
  frame counts;
* the ID3v2 prefix (synchsafe 28-bit size) skipped, ID3v1 128-byte
  trailer tolerated.

:func:`probe_mp3` walks every frame and emits frame count, total
samples, exact duration, sample rate, channel mode, min/max/mean
bitrate and a CBR/VBR flag.  Raises ``ValueError`` with the precise
reason on desync, truncation, or reserved field values — never
garbage.  :func:`encode_mp3_frames` synthesizes spec-exact headers
with deterministic opaque payloads for tests and driver oracles.
"""

from __future__ import annotations

__all__ = ["encode_mp3_frames", "probe_mp3", "frame_length"]

# bitrate tables, kbit/s; index 0 = "free format" (constant
# out-of-table frame length, derived by next-sync scan — §2.4.2.3),
# index 15 = forbidden. Keyed by (version_group, layer): version_group
# "1" = MPEG-1, "2" = MPEG-2 / 2.5 (shared tables).
_BITRATES = {
    ("1", 1): [None, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    ("1", 2): [None, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    ("1", 3): [None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    ("2", 1): [None, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    ("2", 2): [None, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    ("2", 3): [None, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}

# sample-rate tables, Hz, by version id (header bits 19-20:
# 0 = MPEG-2.5, 2 = MPEG-2, 3 = MPEG-1; 1 is reserved)
_RATES = {
    3: [44100, 48000, 32000],
    2: [22050, 24000, 16000],
    0: [11025, 12000, 8000],
}

_CHANNEL_MODES = ["stereo", "joint_stereo", "dual_channel", "mono"]


def _samples_per_frame(version_id: int, layer: int) -> int:
    if layer == 1:
        return 384
    if layer == 2:
        return 1152
    return 1152 if version_id == 3 else 576  # Layer III halves in MPEG-2/2.5


def frame_length(
    version_id: int, layer: int, bitrate_kbps: int, rate_hz: int, padding: int
) -> int:
    """Frame length in bytes per the spec recurrences (the padding slot
    is 4 bytes for Layer I, 1 byte otherwise)."""
    if layer == 1:
        return (12 * bitrate_kbps * 1000 // rate_hz + padding) * 4
    n = _samples_per_frame(version_id, layer)
    return n // 8 * bitrate_kbps * 1000 // rate_hz + padding


def _header(
    version_id: int,
    layer: int,
    bitrate_index: int,
    rate_index: int,
    padding: int,
    channel_mode: int,
) -> bytes:
    layer_bits = 4 - layer  # layer id: 3=Layer I, 2=II, 1=III
    b0 = 0xFF
    b1 = 0xE0 | (version_id << 3) | (layer_bits << 1) | 1  # protection off
    b2 = (bitrate_index << 4) | (rate_index << 2) | (padding << 1)
    b3 = (channel_mode << 6) | 0  # no mode ext / copyright / original / emphasis
    return bytes([b0, b1, b2, b3])


def encode_mp3_frames(
    n_frames: int,
    version_id: int = 3,
    layer: int = 3,
    bitrate_index: int = 9,
    rate_index: int = 0,
    channel_mode: int = 3,
    pad_every: int = 0,
    id3v2_bytes: int = 0,
    seed: int = 0,
    free_format_bytes: int | None = None,
) -> bytes:
    """Synthesize a spec-exact MP3 frame stream: real headers, the
    frame-length arithmetic the scanner relies on, deterministic opaque
    payloads ``(seed + frame·7 + j·3) % 255 + 1`` (never 0xFF, so a
    payload byte can never fake a sync word with its successor).
    ``pad_every > 0`` sets the padding bit on every k-th frame.
    Optionally prefixed with a synthetic ID3v2 tag of the given body
    size. ``free_format_bytes`` (with ``bitrate_index=0``) emits a
    FREE-FORMAT stream: constant unpadded frame length outside the
    bitrate table, the shape §2.4.2.3 lets encoders use for arbitrary
    constant bitrates."""
    if n_frames < 1:
        raise ValueError("at least one frame")
    group = "1" if version_id == 3 else "2"
    if not 0 <= bitrate_index <= 14:
        raise ValueError("bitrate_index must be 0-14 (15 is forbidden)")
    if not 0 <= rate_index <= 2:
        raise ValueError("rate_index must be 0-2 (3 is reserved)")
    if free_format_bytes is not None:
        if bitrate_index != 0:
            raise ValueError("free_format_bytes requires bitrate_index 0")
        if free_format_bytes < 8:
            raise ValueError("free-format frames need at least 8 bytes")
    elif bitrate_index == 0:
        raise ValueError("bitrate_index 0 (free format) needs free_format_bytes")
    bitrate = _BITRATES[(group, layer)][bitrate_index]
    rate = _RATES[version_id][rate_index]
    out = bytearray()
    if id3v2_bytes:
        # ID3v2 header: "ID3", version 4.0, no flags, synchsafe size
        size = id3v2_bytes
        out += b"ID3\x04\x00\x00" + bytes(
            [(size >> 21) & 0x7F, (size >> 14) & 0x7F, (size >> 7) & 0x7F, size & 0x7F]
        )
        out += bytes((seed + j) % 128 for j in range(id3v2_bytes))
    for f in range(n_frames):
        padding = 1 if pad_every and f % pad_every == 0 else 0
        if free_format_bytes is not None:
            length = free_format_bytes + padding * (4 if layer == 1 else 1)
        else:
            length = frame_length(version_id, layer, bitrate, rate, padding)
        out += _header(version_id, layer, bitrate_index, rate_index, padding, channel_mode)
        out += bytes((seed + f * 7 + j * 3) % 255 + 1 for j in range(length - 4))
    return bytes(out)


def _parse_header(b: bytes, pos: int) -> dict:
    if b[pos] != 0xFF or (b[pos + 1] & 0xE0) != 0xE0:
        raise ValueError(f"lost frame sync at byte {pos}")
    version_id = (b[pos + 1] >> 3) & 3
    if version_id == 1:
        raise ValueError(f"reserved MPEG version id at byte {pos}")
    layer_bits = (b[pos + 1] >> 1) & 3
    if layer_bits == 0:
        raise ValueError(f"reserved layer id at byte {pos}")
    layer = 4 - layer_bits
    bitrate_index = (b[pos + 2] >> 4) & 0xF
    if bitrate_index == 15:
        raise ValueError(f"forbidden bitrate index at byte {pos}")
    rate_index = (b[pos + 2] >> 2) & 3
    if rate_index == 3:
        raise ValueError(f"reserved sample-rate index at byte {pos}")
    group = "1" if version_id == 3 else "2"
    bitrate = _BITRATES[(group, layer)][bitrate_index]  # None = free format
    rate = _RATES[version_id][rate_index]
    padding = (b[pos + 2] >> 1) & 1
    return {
        "version_id": version_id,
        "layer": layer,
        "bitrate_kbps": bitrate,
        "rate_hz": rate,
        "padding": padding,
        "channel_mode": _CHANNEL_MODES[(b[pos + 3] >> 6) & 3],
        # free-format length is derived by the caller's next-sync scan
        "length": (
            frame_length(version_id, layer, bitrate, rate, padding)
            if bitrate is not None
            else None
        ),
        "samples": _samples_per_frame(version_id, layer),
    }


def _free_format_base(b: bytes, pos: int, end: int, h: dict) -> int:
    """§2.4.2.3 free format: the (constant) frame length is outside the
    bitrate table, so derive it by scanning for the NEXT frame header
    whose version/layer/rate/channel fields match this one (bitrate
    index 0, padding bit free to differ) — what real decoders do. With
    no matching sync before the end, the single frame runs to the end
    of the audio section. Returns the UNPADDED base length."""
    want_b1 = b[pos + 1]
    want_b2 = b[pos + 2] & 0xFC  # ignore padding + private bits
    want_ch = (b[pos + 3] >> 6) & 3
    slot = 4 if h["layer"] == 1 else 1

    def _matches(i: int) -> bool:
        return (
            i + 4 <= end
            and b[i] == 0xFF
            and b[i + 1] == want_b1
            and (b[i + 2] & 0xFC) == want_b2
            and ((b[i + 3] >> 6) & 3) == want_ch
        )

    i = pos + 4
    while i + 4 <= end:
        if _matches(i):
            base = (i - pos) - h["padding"] * slot
            if base >= 8:
                # A payload byte run can mimic the header's version/
                # layer/rate/channel bytes and derive a too-short stride
                # (ADVICE r11). Do what mainstream decoders do: only
                # accept the stride if the matched header is itself
                # followed by a frame sync one (padded) frame later — or
                # is the stream's final frame. Any sync word (not just a
                # field-exact match) passes, so a mid-stream format
                # change still reaches the walk's precise diagnostics;
                # a mimic inside an opaque payload is rejected because
                # payload bytes one stride later carry no sync.
                pad_i = (b[i + 2] >> 1) & 1
                j = i + base + pad_i * slot
                # ADVICE r12: a look-ahead landing exactly on an ID3v1
                # trailer is also stream-final — a 2-frame stream +
                # trailer otherwise fell through to the single-frame
                # rule. Validated HERE (not by shrinking the scan
                # window up front): pre-stripping `end` would hide a
                # real next-frame header whenever a payload happens to
                # contain 'TAG' at end-128 in a trailerless stream.
                if (
                    j + 4 > end
                    or (b[j] == 0xFF and (b[j + 1] & 0xE0) == 0xE0)
                    or (end - j == 128 and b[j : j + 3] == b"TAG")
                ):
                    return base
        i += 1
    # no (validated) further frame: the single frame runs to the end of
    # the audio section — excluding a trailing 128-byte ID3v1 block
    # (the frame-boundary trailer rule has no boundary to anchor
    # on here, so the trailer is recognized positionally)
    if end - pos > 128 and b[end - 128 : end - 125] == b"TAG":
        end -= 128
    base = (end - pos) - h["padding"] * slot
    if base < 8:
        raise ValueError(
            f"free-format frame at byte {pos} derives an implausible "
            f"{base}-byte length"
        )
    return base


def probe_mp3(data: bytes) -> dict:
    """Walk an MP3 stream frame by frame (ID3v2 prefix skipped, ID3v1
    trailer tolerated) and emit its structure: frame count, total
    samples, exact duration in milliseconds, sample rate, layer,
    channel mode, min/max/mean bitrate, CBR flag, audio byte count."""
    pos = 0
    if data[:3] == b"ID3":
        if len(data) < 10:
            raise ValueError("truncated ID3v2 header")
        size = (
            ((data[6] & 0x7F) << 21)
            | ((data[7] & 0x7F) << 14)
            | ((data[8] & 0x7F) << 7)
            | (data[9] & 0x7F)
        )
        pos = 10 + size
        if pos > len(data):
            raise ValueError("ID3v2 tag overruns the file")
    end = len(data)
    if pos >= end:
        raise ValueError("no audio frames after the ID3 tag")
    n_frames = 0
    total_samples = 0
    audio_bytes = 0
    bitrates: set[int] = set()
    rate_hz = layer = channel_mode = None
    bitrate_sum = 0
    free_base = free_kbps = None
    while pos < end:
        # ID3v1 trailer: exactly 128 bytes of remaining data starting
        # with "TAG" at a FRAME BOUNDARY (checking only len-128 would
        # reject valid short files via a negative slice, and cut the
        # last frame of any stream with "TAG" mid-payload there)
        if end - pos == 128 and data[pos : pos + 3] == b"TAG":
            break
        if pos + 4 > end:
            raise ValueError(f"truncated frame header at byte {pos}")
        h = _parse_header(data, pos)
        if h["bitrate_kbps"] is None:  # free format (bitrate_index 0)
            if free_base is None:
                if n_frames:
                    raise ValueError(
                        f"free-format frame at byte {pos} inside a "
                        "table-bitrate stream"
                    )
                free_base = _free_format_base(data, pos, end, h)
                # derived constant bitrate: invert the length recurrence
                if h["layer"] == 1:
                    free_kbps = free_base // 4 * h["rate_hz"] // 12000
                else:
                    free_kbps = (
                        free_base * h["rate_hz"] // (h["samples"] // 8) // 1000
                    )
            h["length"] = free_base + h["padding"] * (4 if h["layer"] == 1 else 1)
            h["bitrate_kbps"] = free_kbps
        elif free_base is not None:
            raise ValueError(
                f"table-bitrate frame at byte {pos} inside a free-format stream"
            )
        if pos + h["length"] > end:
            raise ValueError(
                f"frame at byte {pos} overruns the stream "
                f"({pos}+{h['length']} > {end})"
            )
        if rate_hz is None:
            rate_hz, layer, channel_mode = h["rate_hz"], h["layer"], h["channel_mode"]
        elif h["rate_hz"] != rate_hz or h["layer"] != layer:
            raise ValueError(f"sample rate / layer changes mid-stream at byte {pos}")
        n_frames += 1
        total_samples += h["samples"]
        audio_bytes += h["length"]
        bitrates.add(h["bitrate_kbps"])
        bitrate_sum += h["bitrate_kbps"]
        pos += h["length"]
    if n_frames == 0:
        # reachable only via the ID3v1 break: the audio section was
        # nothing but a 128-byte "TAG" trailer (possibly after an ID3v2
        # prefix) — without this guard duration would divide by None
        raise ValueError("no audio frames before the ID3v1 trailer")
    return {
        "n_frames": n_frames,
        "total_samples": total_samples,
        "rate_hz": rate_hz,
        "layer": layer,
        "channel_mode": channel_mode,
        "duration_ms_x1000": total_samples * 1_000_000 // rate_hz,
        "bitrate_min_kbps": min(bitrates),
        "bitrate_max_kbps": max(bitrates),
        # exact mean (×1000 to stay integer — probes never emit floats)
        "bitrate_mean_kbps_x1000": bitrate_sum * 1000 // n_frames,
        "is_cbr": len(bitrates) == 1,
        "audio_bytes": audio_bytes,
    }
