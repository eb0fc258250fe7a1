"""Pure-stdlib AVI (RIFF) reader/writer for uncompressed AND
Motion-JPEG video (``struct`` only; MJPEG frames via the in-repo
baseline JPEG codec :mod:`.jpeg`) — the video twin of :mod:`.png` /
:mod:`.wav`.

The AVI container is public (Microsoft "AVI RIFF File Reference"): a
``RIFF``/``AVI `` form holding a ``LIST hdrl`` (``avih`` main header,
one ``LIST strl`` per stream with ``strh``/``strf``) and a ``LIST
movi`` whose ``00db``/``00dc`` chunks carry the frames; chunks are
word-aligned with a pad byte after odd sizes, exactly as in WAV. For
UNCOMPRESSED video the ``strf`` is a ``BITMAPINFOHEADER`` with
``biCompression == 0`` (BI_RGB) and each frame chunk is a raw DIB:
bottom-up scanlines, BGR byte order, rows padded to 4 bytes.

This module implements that envelope completely and honestly:

* :func:`encode_avi` — 24-bit BI_RGB frames, any fps/dimensions.
* :func:`decode_avi` — same envelope; raises ``ValueError`` with the
  precise reason on anything outside it (compressed streams need a real
  codec — ffmpeg on a production cluster; truncated/corrupt chunk
  streams never return garbage silently). Returns frames as row-major
  top-down RGB, i.e. the DIB flip and BGR swap are undone.
* :func:`sample_frames` — every-``k``-th / index-list frame selection
  on the decoded sequence (the real kernel behind frame sampling).

Correctness: encode→decode round-trips across sizes/frame counts, the
padding/flip/swap corner cases, an adversarial corpus
(``tests/test_avi.py``), and driver oracles that recompute decoded
frame statistics arithmetically from the generator formula
(``mm_avi_decode`` / ``mm_avi_frames``).
"""

from __future__ import annotations

import struct

import numpy as np

_BI_RGB = 0


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    return (
        ctype
        + struct.pack("<I", len(payload))
        + payload
        + (b"\x00" if len(payload) % 2 else b"")
    )


def _list(ltype: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", ltype + payload)


_MJPG = 0x47504A4D  # 'MJPG' fourcc, little-endian


def encode_avi(
    frames: np.ndarray,
    fps: int = 25,
    codec: str = "rgb",
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode ``(n_frames, height, width, 3)`` uint8 RGB frames as an
    AVI: ``codec="rgb"`` = uncompressed BI_RGB DIBs, ``codec="mjpg"`` =
    Motion-JPEG (each frame a baseline JPEG from :mod:`.jpeg`;
    ``subsampling`` — ``"444"`` or ``"420"`` — and ``restart_interval``
    are passed through to the per-frame JPEG encoder)."""
    if codec not in ("rgb", "mjpg"):
        raise ValueError(f"unknown codec {codec!r}; use 'rgb' or 'mjpg'")
    arr = np.asarray(frames, dtype=np.uint8)
    if arr.ndim != 4 or arr.shape[3] != 3:
        raise ValueError("frames must be (n, height, width, 3) uint8 RGB")
    if fps <= 0:
        raise ValueError("fps must be positive")
    n, height, width, _ = arr.shape
    if width > 32767 or height > 32767:
        # rcFrame in strh packs signed 16-bit shorts — fail with the
        # same clarity as the other validated parameters instead of an
        # opaque struct.error
        raise ValueError(
            f"AVI dimensions {width}x{height} exceed the 32767 rcFrame limit"
        )
    row_bytes = (width * 3 + 3) & ~3  # DIB rows pad to 4 bytes
    frame_bytes = row_bytes * height

    if codec == "mjpg":
        from solarboat_data_pipeline_spark.operators import jpeg as jpeg_codec

        payloads = [
            jpeg_codec.encode_jpeg(
                arr[i].tobytes(), width, height, 3,
                subsampling=subsampling, restart_interval=restart_interval,
            )
            for i in range(n)
        ]
        frame_bytes = max(len(p) for p in payloads) if payloads else 0
        compression = _MJPG
        bits = 24
    else:
        # raw DIB: bottom-up rows, BGR order, padded rows
        dib = np.zeros((n, height, row_bytes), dtype=np.uint8)
        dib[:, :, : width * 3] = arr[:, ::-1, :, ::-1].reshape(n, height, width * 3)
        payloads = [dib[i].tobytes() for i in range(n)]
        compression = _BI_RGB
        bits = 24

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,  # microseconds per frame
        frame_bytes * fps,  # max bytes per second
        0,  # padding granularity
        0,  # flags (no idx1 chunk is written, so HASINDEX stays clear)
        n, 0, 1, frame_bytes,  # total frames, initial, streams, buffer
        width, height, 0, 0, 0, 0,
    )
    handler = b"MJPG" if codec == "mjpg" else b"\x00" * 4
    strh = (
        b"vids" + handler
        + struct.pack("<IHHI", 0, 0, 0, 0)  # flags, prio, lang, initialFrames
        + struct.pack("<II", 1, fps)  # scale=1, rate=fps
        + struct.pack("<III", 0, n, frame_bytes)  # start, length, bufSize
        + struct.pack("<Ii", 0, -1)  # quality, sampleSize (-1: varies)
        + struct.pack("<hhhh", 0, 0, width, height)  # rcFrame
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, width, height, 1, bits, compression, frame_bytes, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    ftag = b"00dc" if codec == "mjpg" else b"00db"
    movi = _list(b"movi", b"".join(_chunk(ftag, p) for p in payloads))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi(data: bytes) -> tuple[int, int, int, int, np.ndarray]:
    """Decode an uncompressed AVI within the supported envelope to
    ``(width, height, n_frames, fps, frames)`` where ``frames`` is
    ``(n, height, width, 3)`` uint8 top-down RGB."""
    if not isinstance(data, (bytes, bytearray, memoryview)):
        raise ValueError("decode_avi expects a bytes-like payload")
    data = bytes(data)
    if len(data) < 12 or data[:4] != b"RIFF":
        raise ValueError("not an AVI: bad RIFF magic")
    (riff_size,) = struct.unpack("<I", data[4:8])
    if riff_size + 8 > len(data):
        raise ValueError("truncated AVI: RIFF size past end of data")
    if data[8:12] != b"AVI ":
        raise ValueError("not an AVI: RIFF form is not 'AVI '")

    width = height = -1
    bits = compression = None
    scale = rate = None
    raw_frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        nonlocal width, height, bits, compression, scale, rate
        while pos + 8 <= end:
            ctype = data[pos : pos + 4]
            (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            body_end = pos + 8 + length
            if body_end > end:
                raise ValueError(f"truncated AVI: {ctype!r} chunk past end")
            payload_at = pos + 8
            if ctype == b"LIST":
                walk(payload_at + 4, body_end)  # skip the list type tag
            elif ctype == b"strh":
                if data[payload_at : payload_at + 4] == b"vids":
                    scale, rate = struct.unpack(
                        "<II", data[payload_at + 20 : payload_at + 28]
                    )
            elif ctype == b"strf" and width < 0:
                if length < 40:
                    raise ValueError("corrupt AVI: strf shorter than BITMAPINFOHEADER")
                (_sz, width, height, _planes, bits, compression) = struct.unpack(
                    "<IiiHHI", data[payload_at : payload_at + 20]
                )
            elif ctype in (b"00db", b"00dc"):
                raw_frames.append(data[payload_at:body_end])
            pos = body_end + (length % 2)  # word-align

    walk(12, riff_size + 8)

    if width < 0:
        raise ValueError("corrupt AVI: missing video strf header")
    if compression not in (_BI_RGB, _MJPG):
        raise ValueError(
            f"unsupported AVI: biCompression 0x{compression:08X} (H.264/VP9/"
            "... need a real codec; only BI_RGB and MJPG supported)"
        )
    top_down = height < 0  # negative biHeight = top-down DIB (also public)
    height = abs(height)
    if width <= 0 or height <= 0:
        raise ValueError("corrupt AVI: non-positive dimensions")
    fps = (rate // scale) if (rate and scale) else 0

    if compression == _MJPG:
        from solarboat_data_pipeline_spark.operators import jpeg as jpeg_codec

        frames = np.empty((len(raw_frames), height, width, 3), dtype=np.uint8)
        for i, raw in enumerate(raw_frames):
            w, h, ch, px = jpeg_codec.decode_jpeg(raw)
            if (w, h) != (width, height):
                raise ValueError(
                    f"corrupt AVI: MJPEG frame {i} is {w}x{h}, "
                    f"container says {width}x{height}"
                )
            rgb = np.frombuffer(px, dtype=np.uint8).reshape(h, w, ch)
            frames[i] = rgb if ch == 3 else np.repeat(rgb, 3, axis=2)
        return width, height, len(raw_frames), fps, frames

    if bits != 24:
        raise ValueError(f"unsupported AVI: {bits} bpp (only 24-bit BI_RGB)")
    row_bytes = (width * 3 + 3) & ~3
    frames = np.empty((len(raw_frames), height, width, 3), dtype=np.uint8)
    for i, raw in enumerate(raw_frames):
        if len(raw) != row_bytes * height:
            raise ValueError(
                f"corrupt AVI: frame {i} has {len(raw)} bytes, expected "
                f"{row_bytes * height} for {width}x{height}x24 BI_RGB"
            )
        dib = np.frombuffer(raw, dtype=np.uint8).reshape(height, row_bytes)
        rgb = dib[:, : width * 3].reshape(height, width, 3)[:, :, ::-1]
        frames[i] = rgb if top_down else rgb[::-1]
    return width, height, len(raw_frames), fps, frames


def sample_frames(frames: np.ndarray, every_k: int) -> np.ndarray:
    """Every-``k``-th frame selection starting at 0 — the real kernel
    behind the frame-sampling plan (indices ``0, k, 2k, ...``)."""
    if every_k <= 0:
        raise ValueError("every_k must be positive")
    return frames[::every_k]
