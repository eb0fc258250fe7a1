"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The IMAGE path is real: ``fake=False`` decodes genuine PNG payloads with
the pure-stdlib codec in :mod:`.png` (zlib + struct — no PIL needed) and
resizes on the decoded pixel array, all inside Arrow-batched
``mapInPandas``. The AUDIO path is real too: genuine RIFF/PCM WAV
payloads decoded and resampled by the pure-stdlib codec in :mod:`.wav`
(struct only — no torchaudio needed, cross-validated against the stdlib
``wave`` module). The VIDEO path is real for the uncompressed envelope:
genuine BI_RGB AVI payloads decoded and frame-sampled by the pure-stdlib
RIFF reader in :mod:`.avi`, with COMPRESSED video covered by the MJPG
lane (per-frame baseline JPEG via :mod:`.jpeg`, 4:4:4 and 4:2:0) and —
round 11 — by the H.264 Baseline INTRA lane (:mod:`.h264`: real IDR
pixel decode, I_PCM lossless + full §8.3 prediction, zero-residual
CAVLC envelope). Beyond those envelopes (inter frames, nonzero CAVLC
residuals, VP9 pixels) the operators raise at the same Arrow
``mapInPandas`` contract — swap in ffmpeg on a cluster that has it and
nothing else changes (``frame_sample_plan``/``extract_features`` keep
byte-stream stand-ins for the SQL-mirrorable legacy oracles).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from solarboat_data_pipeline_spark.operators import avi as avi_codec
from solarboat_data_pipeline_spark.operators import mp4 as mp4_codec
from solarboat_data_pipeline_spark.operators import png as png_codec
from solarboat_data_pipeline_spark.operators import wav as wav_codec

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = "media_id long, media_type string, n_bytes long, feature array<double>"


def _id_source(df: DataFrame, id_col: str) -> DataFrame:
    """Media-id source shared by the synthetic generators, repartitioned
    to the cluster's default parallelism: real media arrives as many
    files/objects and parallelizes naturally, but the single-parquet-file
    test fixture would otherwise pin the whole synthesize->probe/decode
    Arrow chain to ONE task. The exchange moves 8-byte id rows —
    negligible against the media bytes whose processing it spreads."""
    return df.select(F.col(id_col).cast("long").alias("media_id")).repartition(
        df.sparkSession.sparkContext.defaultParallelism
    )



def documents_as_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Build a media-shaped table from the documents fixture: payload is the
    utf-8 text bytes, typed metadata derived deterministically."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.col(text_col).cast("binary").alias("payload"),
        F.when(F.col(id_col) % 3 == 0, "image/png")
        .when(F.col(id_col) % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
        (F.col(id_col) % 640 + 1).cast("int").alias("width"),
        (F.col(id_col) % 480 + 1).cast("int").alias("height"),
    )


def synthesize_png_media(
    df: DataFrame,
    id_col: str = "doc_id",
    max_width: int = 16,
    max_height: int = 12,
) -> DataFrame:
    """Build a media table whose payloads are GENUINE PNG files, one per
    input row, encoded by the stdlib codec inside ``mapInPandas``.

    Deterministic generator (the driver oracle recomputes decoded pixel
    statistics from this formula without ever seeing the bytes). With
    ``width = id % max_width + 1``, ``height = id % max_height + 1`` the
    image form cycles ``id % 5`` over the real-world PNG envelope:

    * 0 — grayscale, sequential:  ``pixel(x, y) = (7x + 13y + id) % 256``
    * 1 — RGB, sequential:  ``pixel(x, y, c) = (7x + 13y + 31c + id) % 256``
    * 2 — PALETTE (color type 3, the most common web PNG form):
      ``index(x, y) = (7x + 13y + id) % 256`` through the 256-entry
      palette ``palette[i][c] = (i·(3 + 2c) + id) % 256`` — decodes to
      3-channel RGB ``((7x+13y+id)%256 · (3+2c) + id) % 256``
    * 3 — RGB, ADAM7-INTERLACED: same pixels as form 1 (interlace
      changes only the wire layout, so the arithmetic oracle is shared)
    * 4 — 4-BIT PALETTE (the legacy icon/favicon form, round 7):
      ``index(x, y) = (7x + 13y + id) % 16`` packed two-per-byte
      through the 16-entry palette of the form-2 formula — decodes to
      ``((7x+13y+id)%16 · (3+2c) + id) % 256``; every other form-4
      image is additionally Adam7-interlaced (wire layout only)

    Scanline filters CYCLE ``row % 5`` (per Adam7 pass for forms 3/4)
    so every encoded image exercises all five PNG filter reconstruction
    paths on decode.
    """
    import numpy as np

    src = _id_source(df, id_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, widths, heights = [], [], []
            for mid in pdf["media_id"]:
                mid = int(mid)
                w = mid % max_width + 1
                h = mid % max_height + 1
                form = mid % 5
                x = np.arange(w, dtype=np.int64)
                y = np.arange(h, dtype=np.int64)
                if form in (2, 4):
                    n_pal = 256 if form == 2 else 16
                    idx = (7 * x[None, :] + 13 * y[:, None] + mid) % n_pal
                    i = np.arange(n_pal, dtype=np.int64)
                    c = np.arange(3, dtype=np.int64)
                    pal = (i[:, None] * (3 + 2 * c[None, :]) + mid) % 256
                    payloads.append(
                        png_codec.encode_png_palette(
                            idx.astype(np.uint8).tobytes(), w, h,
                            pal.astype(np.uint8), filter_type="cycle",
                            depth=8 if form == 2 else 4,
                            interlace=(form == 4 and (mid // 5) % 2 == 1),
                        )
                    )
                else:
                    ch = 1 if form == 0 else 3
                    c = np.arange(ch, dtype=np.int64)
                    px = (
                        7 * x[None, :, None] + 13 * y[:, None, None]
                        + 31 * c[None, None, :] + mid
                    ) % 256
                    payloads.append(
                        png_codec.encode_png(
                            px.astype(np.uint8).tobytes(), w, h, ch,
                            filter_type="cycle", interlace=(form == 3),
                        )
                    )
                widths.append(w)
                heights.append(h)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "media_type": "image/png",
                    "width": widths,
                    "height": heights,
                }
            )

    return src.mapInPandas(run, schema=MEDIA_SCHEMA)


DECODE_STATS_SCHEMA = (
    "media_id long, width int, height int, channels int, pixel_sum long"
)


def decode_image_stats(df: DataFrame) -> DataFrame:
    """REAL PNG decode via Arrow-batched ``mapInPandas``: parse the chunk
    stream, inflate IDAT, reconstruct all five scanline filters, and emit
    the decoded dimensions/channel count plus the pixel-value sum. Raises
    on non-PNG payloads — no silent fallback."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = {"media_id": [], "width": [], "height": [], "channels": [], "pixel_sum": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, ch, px = png_codec.decode_png(bytes(payload))
                rows["media_id"].append(int(mid))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["channels"].append(ch)
                rows["pixel_sum"].append(int(np.frombuffer(px, np.uint8).sum(dtype=np.int64)))
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=DECODE_STATS_SCHEMA)


RESIZE_STATS_SCHEMA = (
    "media_id long, width int, height int, target_width int, "
    "target_height int, channels int, pixel_sum long"
)


def resize_image_stats(
    df: DataFrame, target_width: int, target_height: int, method: str = "nearest"
) -> DataFrame:
    """REAL decode + resize: PNG payloads are decoded, resampled on the
    pixel array (``nearest`` uses the exact integer floor mapping the
    driver oracle recomputes; ``bilinear`` is the half-pixel-center
    blend), and summarized as decoded stats of the RESIZED image."""
    if method not in ("nearest", "bilinear"):
        raise ValueError(f"unknown resize method {method!r}")
    kernel = (
        png_codec.resize_nearest if method == "nearest" else png_codec.resize_bilinear
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = {
                "media_id": [], "width": [], "height": [],
                "target_width": [], "target_height": [],
                "channels": [], "pixel_sum": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, ch, px = png_codec.decode_png(bytes(payload))
                out = kernel(px, w, h, ch, target_width, target_height)
                rows["media_id"].append(int(mid))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["target_width"].append(target_width)
                rows["target_height"].append(target_height)
                rows["channels"].append(ch)
                rows["pixel_sum"].append(int(np.frombuffer(out, np.uint8).sum(dtype=np.int64)))
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=RESIZE_STATS_SCHEMA)


def synthesize_wav_media(
    df: DataFrame,
    id_col: str = "doc_id",
    sample_rate: int = 8000,
    max_frames: int = 480,
) -> DataFrame:
    """Build a media table whose payloads are GENUINE 16-bit PCM WAV
    files, one per input row, encoded by the stdlib codec inside
    ``mapInPandas`` (the audio twin of :func:`synthesize_png_media`).

    Deterministic generator (the driver oracle recomputes decoded sample
    statistics from this formula without ever seeing the bytes):

    * ``n_frames = id % max_frames + 16``
    * ``channels = 1`` (mono) for even ids, ``2`` (stereo) for odd
    * ``sample(i, c) = ((37·i + 101·c + 13·id) % 4096) − 2048``
      (int16-safe by construction)
    """
    import numpy as np

    src = _id_source(df, id_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, frames, chans = [], [], []
            for mid in pdf["media_id"]:
                mid = int(mid)
                n = mid % max_frames + 16
                ch = 1 if mid % 2 == 0 else 2
                i = np.arange(n, dtype=np.int64)
                c = np.arange(ch, dtype=np.int64)
                s = (37 * i[:, None] + 101 * c[None, :] + 13 * mid) % 4096 - 2048
                payloads.append(
                    wav_codec.encode_wav(
                        s.astype(np.int16), sample_rate, ch, bits=16
                    )
                )
                frames.append(n)
                chans.append(ch)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "payload": payloads,
                    "media_type": "audio/wav",
                    "n_frames": pd.array(frames, dtype="int32"),
                    "channels": pd.array(chans, dtype="int32"),
                }
            )

    return src.mapInPandas(
        run,
        schema=(
            "media_id long, payload binary, media_type string, "
            "n_frames int, channels int"
        ),
    )


AUDIO_STATS_SCHEMA = (
    "media_id long, sample_rate int, channels int, n_frames int, sample_sum long"
)


def decode_audio_stats(df: DataFrame) -> DataFrame:
    """REAL WAV decode via Arrow-batched ``mapInPandas``: walk the RIFF
    chunk stream, validate fmt/block-align, and emit the decoded rate/
    channel/frame counts plus the sample-value sum. Raises on non-PCM
    payloads — no silent fallback."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "media_id": [], "sample_rate": [], "channels": [],
                "n_frames": [], "sample_sum": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                rate, ch, _bits, n, samples = wav_codec.decode_wav(bytes(payload))
                rows["media_id"].append(int(mid))
                rows["sample_rate"].append(rate)
                rows["channels"].append(ch)
                rows["n_frames"].append(n)
                rows["sample_sum"].append(int(samples.sum(dtype="int64")))
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=AUDIO_STATS_SCHEMA)


RESAMPLE_STATS_SCHEMA = (
    "media_id long, sample_rate int, channels int, n_frames int, "
    "target_frames int, sample_sum long"
)


def resample_audio_stats(
    df: DataFrame, target_frames: int, method: str = "nearest"
) -> DataFrame:
    """REAL decode + resample: WAV payloads are decoded, resampled on the
    frame axis (``nearest`` uses the exact integer floor mapping the
    driver oracle recomputes; ``linear`` is the half-frame-center
    blend), and summarized as decoded stats of the RESAMPLED signal."""
    if method not in ("nearest", "linear"):
        raise ValueError(f"unknown resample method {method!r}")
    kernel = (
        wav_codec.resample_nearest
        if method == "nearest"
        else wav_codec.resample_linear
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "media_id": [], "sample_rate": [], "channels": [],
                "n_frames": [], "target_frames": [], "sample_sum": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                rate, ch, _bits, n, samples = wav_codec.decode_wav(bytes(payload))
                out = kernel(samples, target_frames)
                rows["media_id"].append(int(mid))
                rows["sample_rate"].append(rate)
                rows["channels"].append(ch)
                rows["n_frames"].append(n)
                rows["target_frames"].append(target_frames)
                rows["sample_sum"].append(int(out.sum(dtype="int64")))
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=RESAMPLE_STATS_SCHEMA)


def _video_pattern(mid: int, max_frames: int, max_width: int, max_height: int):
    """The deterministic frame generator shared by the AVI/MJPEG
    synthesizers AND the MJPEG fidelity check (which regenerates the
    pre-encode truth from the id): ``pixel(f, x, y, c) =
    (11f + 7x + 13y + 31c + id) % 256``."""
    import numpy as np

    nf = mid % max_frames + 2
    w = mid % max_width + 1
    h = mid % max_height + 1
    f = np.arange(nf, dtype=np.int64)
    y = np.arange(h, dtype=np.int64)
    x = np.arange(w, dtype=np.int64)
    c = np.arange(3, dtype=np.int64)
    px = (
        11 * f[:, None, None, None]
        + 7 * x[None, None, :, None]
        + 13 * y[None, :, None, None]
        + 31 * c[None, None, None, :]
        + mid
    ) % 256
    return px.astype(np.uint8)


def synthesize_avi_media(
    df: DataFrame,
    id_col: str = "doc_id",
    max_frames: int = 12,
    max_width: int = 8,
    max_height: int = 6,
    fps: int = 25,
) -> DataFrame:
    """Build a media table whose payloads are GENUINE uncompressed AVI
    files (raw BI_RGB DIB frames), one per input row, encoded by the
    stdlib codec inside ``mapInPandas`` (the video twin of
    :func:`synthesize_png_media`).

    Deterministic generator (the driver oracle recomputes decoded frame
    statistics from this formula without ever seeing the bytes):

    * ``n_frames = id % max_frames + 2``
    * ``width = id % max_width + 1``, ``height = id % max_height + 1``
    * ``pixel(f, x, y, c) = (11f + 7x + 13y + 31c + id) % 256``
    """
    import numpy as np

    src = _id_source(df, id_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, nfs = [], []
            for mid in pdf["media_id"]:
                px = _video_pattern(int(mid), max_frames, max_width, max_height)
                payloads.append(avi_codec.encode_avi(px, fps=fps))
                nfs.append(px.shape[0])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "payload": payloads,
                    "media_type": "video/x-msvideo",
                    "n_frames": pd.array(nfs, dtype="int32"),
                }
            )

    return src.mapInPandas(
        run,
        schema="media_id long, payload binary, media_type string, n_frames int",
    )


def _video_pattern_smooth(mid: int, max_frames: int, max_width: int, max_height: int):
    """Wrap-free variant of :func:`_video_pattern` for the LOSSY MJPEG
    path: a pure linear ramp (``16 + 3x + 5y + 2f + 7c + id % 32``, no
    mod-256 cliff), which is DCT-sparse — the working codec measures
    MAE ~1-2 on it, while the modular pattern's 255→0 cliffs cost a
    legitimate ~18 of Gibbs ringing that would drown the fidelity gate."""
    import numpy as np

    nf = mid % max_frames + 2
    w = mid % max_width + 1
    h = mid % max_height + 1
    f = np.arange(nf, dtype=np.int64)
    y = np.arange(h, dtype=np.int64)
    x = np.arange(w, dtype=np.int64)
    c = np.arange(3, dtype=np.int64)
    px = (
        16
        + 2 * f[:, None, None, None]
        + 3 * x[None, None, :, None]
        + 5 * y[None, :, None, None]
        + 7 * c[None, None, None, :]
        + mid % 32
    )
    # the "wrap-free" promise the MJPEG MAE gate relies on: fail loudly
    # if larger max_frames/max_width/max_height push values past 255
    # instead of letting astype(uint8) quietly reintroduce mod-256 cliffs
    peak = int(px.max()) if px.size else 0
    if peak > 255:
        raise ValueError(
            f"_video_pattern_smooth peak {peak} exceeds uint8 for "
            f"max_frames={max_frames}, max_width={max_width}, "
            f"max_height={max_height}; shrink the dims to keep the "
            "pattern wrap-free"
        )
    return px.astype(np.uint8)


def synthesize_mjpeg_media(
    df: DataFrame,
    id_col: str = "doc_id",
    max_frames: int = 12,
    max_width: int = 8,
    max_height: int = 6,
    fps: int = 25,
) -> DataFrame:
    """Media table of GENUINE Motion-JPEG AVIs: deterministic smooth
    frames (:func:`_video_pattern_smooth`), each compressed by the
    in-repo baseline JPEG codec (:mod:`.jpeg`) into ``00dc`` chunks
    with biCompression = 'MJPG'. The per-frame JPEG shape cycles the
    real-world envelope per id — even ids 4:4:4, odd ids 4:2:0 (the
    default shape cameras/libjpeg emit), and every third id adds a
    DRI/RSTn restart interval — so the driver row exercises the
    subsampled-MCU and restart-marker decode paths under the same
    fidelity gate."""
    src = _id_source(df, id_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, nfs = [], []
            for mid in pdf["media_id"]:
                mid = int(mid)
                px = _video_pattern_smooth(mid, max_frames, max_width, max_height)
                sub = "444" if mid % 2 == 0 else "420"
                ri = 2 if mid % 3 == 0 else 0
                payloads.append(
                    avi_codec.encode_avi(
                        px, fps=fps, codec="mjpg", subsampling=sub,
                        restart_interval=ri,
                    )
                )
                nfs.append(px.shape[0])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "payload": payloads,
                    "media_type": "video/x-msvideo; codec=mjpeg",
                    "n_frames": pd.array(nfs, dtype="int32"),
                }
            )

    return src.mapInPandas(
        run,
        schema="media_id long, payload binary, media_type string, n_frames int",
    )


MJPEG_CHECK_SCHEMA = (
    "media_id long, width int, height int, n_frames int, fps int, ok boolean"
)


def mjpeg_decode_check(
    df: DataFrame,
    max_frames: int = 12,
    max_width: int = 8,
    max_height: int = 6,
    mae_bound: float = 8.0,
) -> DataFrame:
    """REAL compressed-video decode + fidelity gate: decode the MJPEG
    AVI (container walk + per-frame baseline JPEG: Huffman, dequant,
    IDCT, color convert), regenerate the pre-encode truth
    (:func:`_video_pattern_smooth`) from the media id, and emit
    ``ok = mean-absolute-error < mae_bound``. JPEG is lossy so the
    oracle cannot recompute pixel sums; the bound is the check — the
    working codec measures MAE ~1-2 on the smooth pattern while a
    broken Huffman/IDCT stage lands near the ~85 of unrelated noise."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "media_id": [], "width": [], "height": [],
                "n_frames": [], "fps": [], "ok": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                mid = int(mid)
                w, h, n, fps, frames = avi_codec.decode_avi(bytes(payload))
                truth = _video_pattern_smooth(mid, max_frames, max_width, max_height)
                mae = float(
                    np.abs(
                        frames.astype(np.int64) - truth.astype(np.int64)
                    ).mean()
                ) if frames.shape == truth.shape else float("inf")
                rows["media_id"].append(mid)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_frames"].append(n)
                rows["fps"].append(fps)
                rows["ok"].append(mae < mae_bound)
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=MJPEG_CHECK_SCHEMA)


VIDEO_STATS_SCHEMA = (
    "media_id long, width int, height int, n_frames int, fps int, pixel_sum long"
)


def decode_video_stats(df: DataFrame) -> DataFrame:
    """REAL AVI decode via Arrow-batched ``mapInPandas``: walk the
    RIFF/hdrl/movi chunk tree, validate the BITMAPINFOHEADER, undo the
    DIB bottom-up/BGR/row-padding layout (BI_RGB), or decode per-frame
    baseline JPEG (MJPG fourcc), and emit decoded dimensions/frame
    counts plus the pixel-value sum. NOTE: for MJPEG inputs the pixel
    sum reflects the LOSSY decode — exact-sum oracles (``mm_avi_decode``)
    feed only BI_RGB; use :func:`mjpeg_decode_check` for the
    fidelity-gated compressed path. Codecs outside those two
    (H.264/VP9/...) raise — no silent fallback (a production cluster
    plugs ffmpeg in at this same contract)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "media_id": [], "width": [], "height": [],
                "n_frames": [], "fps": [], "pixel_sum": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, n, fps, frames = avi_codec.decode_avi(bytes(payload))
                rows["media_id"].append(int(mid))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_frames"].append(n)
                rows["fps"].append(fps)
                rows["pixel_sum"].append(int(frames.sum(dtype="int64")))
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=VIDEO_STATS_SCHEMA)


FRAME_STATS_SCHEMA = (
    "media_id long, n_frames int, sampled_frames int, pixel_sum long"
)


def sample_frame_stats(df: DataFrame, every_k: int) -> DataFrame:
    """REAL decode + every-``k``-th frame sampling: AVI payloads are
    decoded and frames ``0, k, 2k, ...`` selected; emits the sampled
    frame count and their pixel sum (the real kernel the
    :func:`frame_sample_plan` stub plans for)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "media_id": [], "n_frames": [],
                "sampled_frames": [], "pixel_sum": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                _w, _h, n, _fps, frames = avi_codec.decode_avi(bytes(payload))
                picked = avi_codec.sample_frames(frames, every_k)
                rows["media_id"].append(int(mid))
                rows["n_frames"].append(n)
                rows["sampled_frames"].append(picked.shape[0])
                rows["pixel_sum"].append(int(picked.sum(dtype="int64")))
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=FRAME_STATS_SCHEMA)


def binary_metadata(df: DataFrame) -> DataFrame:
    """Pure-expression metadata over the opaque payload: byte length and
    sha256 digest (JVM-side — no decode needed, scans stay columnar)."""
    return df.select(
        "media_id",
        "media_type",
        F.octet_length("payload").alias("n_bytes"),
        F.sha2("payload", 256).alias("sha256"),
    )


def extract_features(df: DataFrame, fake: bool = True, feat_dim: int = 4) -> DataFrame:
    """Decode + feature-extract via Arrow-batched ``mapInPandas``.

    ``fake=True`` computes a deterministic per-payload feature (byte-sum
    moments) standing in for a real decoder. ``fake=False`` REALLY
    decodes ``image/png`` payloads with the stdlib codec (feature =
    ``[width, height, channels, pixel_mean]``) and raises
    ``NotImplementedError`` for audio/video — the remaining
    torchaudio/ffmpeg integration points.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if not fake:
                feats = []
                for mtype, payload in zip(pdf["media_type"], pdf["payload"]):
                    if mtype != "image/png":
                        raise NotImplementedError(
                            f"real decode for {mtype!r} requires torchaudio/"
                            "ffmpeg; not available in this container"
                        )
                    w, h, ch, px = png_codec.decode_png(bytes(payload))
                    mean = float(np.frombuffer(px, np.uint8).mean()) if px else 0.0
                    feats.append([float(w), float(h), float(ch), mean][:feat_dim])
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "media_type": pdf["media_type"],
                        "n_bytes": pdf["payload"].map(len),
                        "feature": feats,
                    }
                )
                continue
            feats = []
            for payload in pdf["payload"]:
                b = bytes(payload)
                n = max(len(b), 1)
                s = sum(b)
                feats.append(
                    [
                        float(len(b)),
                        s / n,
                        float(min(b) if b else 0),
                        float(max(b) if b else 0),
                    ][:feat_dim]
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(len),
                    "feature": feats,
                }
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = (
    "media_id long, media_type string, width int, height int, "
    "target_width int, target_height int, n_bytes long, payload_md5 string"
)


def resize_plan(
    df: DataFrame, target_width: int, target_height: int, fake: bool = True
) -> DataFrame:
    """Image-resize plumbing via Arrow-batched ``mapInPandas``.

    The Spark-side contract is real: image rows selected by type, typed
    target dimensions attached, payloads re-emitted batch-wise.
    ``fake=False`` REALLY resizes: decode the PNG with the stdlib codec,
    nearest-neighbor resample the pixel array to the target dims, and
    re-encode as PNG — ``n_bytes``/``payload_md5`` describe the re-encoded
    file (round-tripped in ``tests/test_png.py``; the oracle-checkable
    stats live in :func:`resize_image_stats`). ``fake=True`` keeps the
    legacy SQL-mirrorable stand-in (proportional byte-stream truncation)
    so existing oracle rows stay valid. Output carries the md5 of the
    resized payload so correctness is hash-checkable without shipping the
    bytes around."""
    import hashlib

    area = target_width * target_height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                n_out, digests = [], []
                for payload in pdf["payload"]:
                    w, h, ch, px = png_codec.decode_png(bytes(payload))
                    resized = png_codec.resize_nearest(
                        px, w, h, ch, target_width, target_height
                    )
                    out = png_codec.encode_png(
                        resized, target_width, target_height, ch, filter_type=0
                    )
                    n_out.append(len(out))
                    digests.append(hashlib.md5(out).hexdigest())
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "media_type": pdf["media_type"],
                        "width": pdf["width"],
                        "height": pdf["height"],
                        "target_width": target_width,
                        "target_height": target_height,
                        "n_bytes": n_out,
                        "payload_md5": digests,
                    }
                )
                continue
            n_out, digests = [], []
            for payload, w, h in zip(pdf["payload"], pdf["width"], pdf["height"]):
                b = bytes(payload)
                n = max(1, min(len(b), len(b) * area // max(int(w) * int(h), 1)))
                out = b[:n]
                n_out.append(len(out))
                digests.append(hashlib.md5(out).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "target_width": target_width,
                    "target_height": target_height,
                    "n_bytes": n_out,
                    "payload_md5": digests,
                }
            )

    return df.where(F.col("media_type") == "image/png").mapInPandas(
        run, schema=RESIZE_SCHEMA
    )


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emits (media_id,
    frame_index) rows without decoding — the downstream decoder maps each
    row to one frame. Deterministic: frame count proxied by payload size."""
    n_frames = (F.octet_length("payload") / 100 + 1).cast("int")
    return df.where(F.col("media_type") == "video/mp4").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
        ).alias("frame_index"),
    )


# ---------------------------------------------------------------------------
# Compressed-video PROBE lane (MP4 / H.264 — structure, never pixels)
# ---------------------------------------------------------------------------


def _mp4_params(mid: int) -> dict:
    """Deterministic MP4 geometry per id, shared by the synthesizer and
    the driver oracle (which recomputes every probed column from these
    formulas without seeing the bytes). Widths/heights sweep cropped
    (non-multiple-of-16) dimensions so the SPS frame-cropping path is
    always live; the profile cycle covers the baseline/main syntax AND
    the high-profile chroma branch."""
    return {
        "width": 16 * (mid % 8 + 1) - 2 * (mid % 8),
        "height": 16 * (mid % 6 + 1) - 2 * (mid % 5),
        "n_samples": mid % 24 + 1,
        "timescale": 600 * (mid % 4 + 1),
        "sample_delta": mid % 40 + 10,
        "profile_idc": (66, 77, 100)[mid % 3],
        "level_idc": (30, 31, 41)[mid % 3],
    }


def synthesize_mp4_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Media table of GENUINE minimal MP4 files (ISO 14496-12 box tree,
    avc1 sample entry with a real bit-level H.264 SPS/PPS in avcC,
    length-prefixed NAL samples) — :func:`mp4_codec.encode_mp4` per id
    with :func:`_mp4_params` geometry and sample sizes
    ``50 + (7 id + 13 i) % 100``."""
    src = _id_source(df, id_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                p = _mp4_params(mid)
                sizes = [
                    50 + (7 * mid + 13 * i) % 100 for i in range(p["n_samples"])
                ]
                # the mm_mp4_extract oracle encodes byte_sum/head_u32 of
                # the 4-byte BE length prefix as the scalar (sz - 4),
                # valid only while sz - 4 < 256 (one nonzero prefix
                # byte); pin it so a geometry change cannot silently
                # invalidate the oracle arithmetic (ADVICE r11)
                assert max(sizes) < 260, "extract oracle assumes sizes < 260"
                payloads.append(
                    mp4_codec.encode_mp4(
                        p["width"],
                        p["height"],
                        sizes,
                        timescale=p["timescale"],
                        sample_delta=p["sample_delta"],
                        profile_idc=p["profile_idc"],
                        level_idc=p["level_idc"],
                    )
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "payload": payloads,
                    "media_type": "video/mp4; codec=avc1",
                }
            )

    return src.mapInPandas(
        run, schema="media_id long, payload binary, media_type string"
    )


VIDEO_PROBE_SCHEMA = (
    "media_id long, brand string, codec string, track_width long,"
    " track_height long, coded_width long, coded_height long,"
    " profile_idc long, level_idc long, n_samples long,"
    " sample_bytes long, duration long, timescale long"
)


def probe_video_stats(df: DataFrame) -> DataFrame:
    """REAL compressed-video PROBE via Arrow ``mapInPandas``: walk the
    ISO BMFF box tree, parse the avcC H.264 SPS bit-exactly (Exp-Golomb
    + emulation prevention + frame cropping), and emit container +
    codec metadata — resolution, profile/level, sample count/bytes,
    duration ticks. No pixel decode (that envelope raises; see module
    docstring); every emitted column is pure integer structure so the
    driver oracle can recompute it arithmetically."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k.split()[0]: [] for k in VIDEO_PROBE_SCHEMA.split(",")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                info = mp4_codec.probe_mp4(bytes(payload))
                rows["media_id"].append(int(mid))
                rows["brand"].append(info["major_brand"])
                rows["codec"].append(info["codec"])
                rows["track_width"].append(info["track_width"])
                rows["track_height"].append(info["track_height"])
                rows["coded_width"].append(info["coded_width"])
                rows["coded_height"].append(info["coded_height"])
                rows["profile_idc"].append(info["profile_idc"])
                rows["level_idc"].append(info["level_idc"])
                rows["n_samples"].append(info["n_samples"])
                rows["sample_bytes"].append(info["sample_bytes"])
                rows["duration"].append(info["duration"])
                rows["timescale"].append(info["timescale"])
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=VIDEO_PROBE_SCHEMA)


def _annexb_params(mid: int) -> dict:
    """Deterministic Annex-B stream geometry per id: ``n_nals`` NALs,
    IDR (type 5) every ``idr_every``-th unit starting at 0, non-IDR
    slices (type 1) between; NAL ``i`` carries ``20 + (5 id + 11 i) %
    64`` payload bytes, each ``(...) % 255 + 1`` (never zero, so no
    accidental start codes)."""
    return {"n_nals": mid % 50 + 3, "idr_every": mid % 7 + 2}


def synthesize_annexb_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Media table of raw H.264 Annex-B elementary streams (4-byte
    start codes) with :func:`_annexb_params` geometry."""
    src = _id_source(df, id_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                p = _annexb_params(mid)
                es = bytearray()
                for i in range(p["n_nals"]):
                    nal_type = 5 if i % p["idr_every"] == 0 else 1
                    header = (3 << 5) | nal_type  # nal_ref_idc=3
                    body_len = 20 + (5 * mid + 11 * i) % 64
                    body = bytes(
                        (mid * 3 + i * 7 + j) % 255 + 1 for j in range(body_len)
                    )
                    es += b"\x00\x00\x00\x01" + bytes([header]) + body
                payloads.append(bytes(es))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "payload": payloads,
                    "media_type": "video/h264",
                }
            )

    return src.mapInPandas(
        run, schema="media_id long, payload binary, media_type string"
    )


KEYFRAME_INDEX_SCHEMA = (
    "media_id long, n_nals long, n_idr long, first_idr_offset long,"
    " idr_bytes long, es_bytes long"
)


def keyframe_index(df: DataFrame) -> DataFrame:
    """Build a keyframe index over raw H.264 elementary streams
    (:func:`mp4_codec.nal_scan` start-code walk): per stream, the NAL
    count, IDR count, byte offset of the first IDR, total IDR bytes,
    and stream size — the seek table a frame sampler needs to pull
    keyframes out of compressed video WITHOUT decoding it."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k.split()[0]: [] for k in KEYFRAME_INDEX_SCHEMA.split(",")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                es = bytes(payload)
                units = mp4_codec.nal_scan(es)
                idrs = [u for u in units if u["is_idr"]]
                rows["media_id"].append(int(mid))
                rows["n_nals"].append(len(units))
                rows["n_idr"].append(len(idrs))
                rows["first_idr_offset"].append(
                    idrs[0]["offset"] if idrs else -1
                )
                rows["idr_bytes"].append(sum(u["size"] for u in idrs))
                rows["es_bytes"].append(len(es))
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=KEYFRAME_INDEX_SCHEMA)


def _ivf_params(mid: int) -> dict:
    """Deterministic IVF/VP9 stream geometry per id, shared with the
    driver oracle: display/coded dims, frame count, keyframe period,
    profile (0 or 2 with 10-bit), timebase, and per-frame opaque-tail
    length ``30 + (3 id + 17 i) % 80``."""
    return {
        "width": 32 * (mid % 10 + 1) - (mid % 7),
        "height": 32 * (mid % 8 + 1) - (mid % 5),
        "n_frames": mid % 20 + 1,
        "key_every": mid % 6 + 2,
        "profile": 0 if mid % 2 == 0 else 2,
        "bit_depth": 8 if mid % 2 == 0 else 10,
        "timebase_den": 24 + (mid % 4) * 6,
    }


def _inter_header(vp9_codec, seed: int, i: int, profile: int) -> bytes:
    """FULL VP9 inter-frame header (round 12) with deterministic
    per-frame fields — the oracle recomputes the probed aggregates from
    these formulas. ``found_ref`` stays True so the header is a
    constant 5 bytes (the `ELSE 5` in the mm_ivf_vp9_probe and
    pipeline_media_curation oracles, asserted in tests/test_vp9.py)."""
    return vp9_codec.encode_vp9_inter_header(
        profile,
        refresh_frame_flags=(seed + 3 * i) % 256,
        ref_frame_idx=(i % 8, (seed + i) % 8, (2 * i + 1) % 8),
        ref_sign_bias=(i % 2, 0, (seed + i) % 2),
        allow_high_precision_mv=bool(i % 2),
        interp_filter=(seed + i) % 4,
    )


def synthesize_ivf_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Media table of genuine IVF files whose frames carry REAL VP9
    uncompressed headers (keyframe every ``key_every``-th frame,
    bit-exact §6.2 syntax incl. the profile-2 10-bit branch) followed
    by deterministic opaque tails (:func:`_ivf_params`)."""
    from solarboat_data_pipeline_spark.operators import vp9 as vp9_codec

    src = _id_source(df, id_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                p = _ivf_params(mid)
                frames = []
                for i in range(p["n_frames"]):
                    if i % p["key_every"] == 0:
                        hdr = vp9_codec.encode_vp9_keyframe_header(
                            p["width"], p["height"],
                            profile=p["profile"], bit_depth=p["bit_depth"],
                        )
                    else:
                        hdr = _inter_header(vp9_codec, mid, i, p["profile"])
                    tail_len = 30 + (3 * mid + 17 * i) % 80
                    tail = bytes(
                        (mid * 5 + i * 11 + j) % 256 for j in range(tail_len)
                    )
                    frames.append(hdr + tail)
                payloads.append(
                    vp9_codec.encode_ivf(
                        p["width"], p["height"], frames,
                        timebase_den=p["timebase_den"],
                    )
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "payload": payloads,
                    "media_type": "video/x-ivf; codec=vp9",
                }
            )

    return src.mapInPandas(
        run, schema="media_id long, payload binary, media_type string"
    )


IVF_PROBE_SCHEMA = (
    "media_id long, fourcc string, width long, height long,"
    " coded_width long, coded_height long, profile long, bit_depth long,"
    " n_frames long, n_keyframes long, frame_bytes long, timebase_den long,"
    " refresh_flags_sum long, ref_idx_sum long, n_hp_mv long"
)


def probe_ivf_stats(df: DataFrame) -> DataFrame:
    """REAL IVF/VP9 probe via Arrow ``mapInPandas``: container walk +
    bit-exact VP9 frame-header parse per frame (keyframe
    classification, coded dims, profile/bit depth, and — round 12 —
    the inter-frame reference structure: refresh-mask and
    reference-index sums, high-precision-mv count) — the VP9 twin of
    :func:`probe_video_stats`. No pixel decode."""
    from solarboat_data_pipeline_spark.operators import vp9 as vp9_codec

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k.split()[0]: [] for k in IVF_PROBE_SCHEMA.split(",")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                info = vp9_codec.probe_ivf(bytes(payload))
                rows["media_id"].append(int(mid))
                rows["fourcc"].append(info["fourcc"])
                rows["width"].append(info["width"])
                rows["height"].append(info["height"])
                rows["coded_width"].append(info["coded_width"])
                rows["coded_height"].append(info["coded_height"])
                rows["profile"].append(info["profile"])
                rows["bit_depth"].append(info["bit_depth"])
                rows["n_frames"].append(info["n_frames"])
                rows["n_keyframes"].append(info["n_keyframes"])
                rows["frame_bytes"].append(info["frame_bytes"])
                rows["timebase_den"].append(info["timebase_den"])
                rows["refresh_flags_sum"].append(info["refresh_flags_sum"])
                rows["ref_idx_sum"].append(info["ref_idx_sum"])
                rows["n_hp_mv"].append(info["n_hp_mv"])
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=IVF_PROBE_SCHEMA)


SAMPLE_RANGES_SCHEMA = (
    "media_id long, sample_index long, rel_offset long, size long,"
    " dts_ticks long"
)


def mp4_sample_ranges(df: DataFrame) -> DataFrame:
    """Explode each MP4 payload into its per-sample seek table
    (:func:`mp4_codec.sample_index` — full stsc/stsz/stco/stts walk):
    one row per sample with its byte range (offset relative to the
    first sample, i.e. the mdat payload start) and decode timestamp.
    This is the row set a distributed frame extractor joins against to
    read single samples out of object storage with ranged GETs instead
    of whole-file reads — the 100 TB shape of video sampling."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k.split()[0]: [] for k in SAMPLE_RANGES_SCHEMA.split(",")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                idx = mp4_codec.sample_index(bytes(payload))
                base = idx[0]["offset"] if idx else 0
                for r in idx:
                    rows["media_id"].append(int(mid))
                    rows["sample_index"].append(r["sample"])
                    rows["rel_offset"].append(r["offset"] - base)
                    rows["size"].append(r["size"])
                    rows["dts_ticks"].append(r["dts_ticks"])
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=SAMPLE_RANGES_SCHEMA)


SAMPLE_SEEK_SCHEMA = (
    "media_id long, sample_index long, abs_offset long, size long,"
    " dts_ticks long"
)


def mp4_sample_seek_table(df: DataFrame) -> DataFrame:
    """Absolute-offset variant of :func:`mp4_sample_ranges`: one row per
    sample with the ABSOLUTE byte range inside the file — exactly the
    (offset, length) pair a distributed extractor turns into a storage
    ranged GET. Persist this table once per corpus; every later frame
    sample / keyframe pull joins against it instead of re-walking the
    box tree (the incremental-index shape of dd_near_dup_incremental,
    applied to media)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k.split()[0]: [] for k in SAMPLE_SEEK_SCHEMA.split(",")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for r in mp4_codec.sample_index(bytes(payload)):
                    rows["media_id"].append(int(mid))
                    rows["sample_index"].append(r["sample"])
                    rows["abs_offset"].append(r["offset"])
                    rows["size"].append(r["size"])
                    rows["dts_ticks"].append(r["dts_ticks"])
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=SAMPLE_SEEK_SCHEMA)


FMP4_SEEK_SCHEMA = (
    "media_id long, sample_index long, fragment long, abs_offset long,"
    " size long, dts_ticks long"
)


def fmp4_sample_seek_table(df: DataFrame) -> DataFrame:
    """Absolute-offset seek table over FRAGMENTED MP4s
    (:func:`mp4_codec.fragment_index` — moof/traf/trun walk): the
    ranged-GET form of :func:`fmp4_sample_ranges`, feeding
    :func:`extract_sample_payloads` directly. One row per sample with
    its owning fragment and absolute byte range."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k.split()[0]: [] for k in FMP4_SEEK_SCHEMA.split(",")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for r in mp4_codec.fragment_index(bytes(payload)):
                    rows["media_id"].append(int(mid))
                    rows["sample_index"].append(r["sample"])
                    rows["fragment"].append(r["fragment"])
                    rows["abs_offset"].append(r["offset"])
                    rows["size"].append(r["size"])
                    rows["dts_ticks"].append(r["dts_ticks"])
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=FMP4_SEEK_SCHEMA)


EXTRACT_SCHEMA = "media_id long, sample_index long, size long, payload binary"
EXTRACT_DIGEST_SCHEMA = (
    EXTRACT_SCHEMA + ", byte_sum long, head_u32 long, tail_byte long"
)


def extract_sample_payloads(
    media: DataFrame,
    ranges: DataFrame,
    *,
    id_col: str = "media_id",
    index_col: str = "sample_index",
    offset_col: str = "abs_offset",
    size_col: str = "size",
    broadcast_requests: bool | str = "auto",
    auto_broadcast_max_requests: int = 1_000_000,
    with_digest: bool = True,
) -> DataFrame:
    """Distributed RANGED-GET sample extraction — the payoff of the
    seek tables (:func:`mp4_sample_seek_table` / ``fragment_index``):
    given a media table and a (usually filtered) set of per-sample byte
    ranges, slice exactly those samples out, never decoding or copying
    the rest of the file.

    100 TB shape: the range rows are grouped per media id FIRST
    (``collect_list`` of 24-byte structs — the only shuffle, and it
    moves seek-table rows, not media bytes), then joined to the media
    table so each payload crosses the join ONCE regardless of how many
    samples it contributes. ``broadcast_requests`` picks the join
    strategy for the request side (VERDICT r11 item 5 — a forced
    broadcast is unsafe when billions of samples are selected):

    * ``"auto"`` (default) — count the request rows (a cheap aggregate
      over the thin seek table; ~24 bytes/row) and broadcast only while
      the grouped request table stays under
      ``auto_broadcast_max_requests`` rows (default 1M ≈ 24 MB built);
      past that, fall back to the shuffle-hash join below. Safe at any
      request count.
    * ``True`` — force the broadcast: the media table never shuffles at
      all. Correct whenever the caller knows the selection is small.
    * ``False`` — shuffle-hash join on media_id with the build side
      pinned to the grouped requests (the hint stops Catalyst from
      sort-merge-sorting media payload rows); media bytes cross one
      exchange, request structs another.

    The Arrow map below is the storage swap-in point:
    on a real cluster ``payload[off : off + size]`` becomes a ranged
    GET against the object store and the media table shrinks to
    ``(media_id, uri)`` — no other line changes.

    Reference anchor: this is SURVEY §2.8's 1→N explode
    (lib/canparser.py:174-187) applied to media bytes — one file row
    fans out to N sample rows selected by the seek table.

    A range overrunning its payload raises a clean ValueError (the
    probe-lane error contract). ``with_digest`` adds arithmetic digest
    columns (full byte sum, big-endian head u32, last byte) so a
    driver oracle can verify every extracted byte without seeing it.
    """
    req = (
        ranges.select(
            F.col(id_col).alias("media_id"),
            F.struct(
                F.col(index_col).cast("long").alias("sample_index"),
                F.col(offset_col).cast("long").alias("abs_offset"),
                F.col(size_col).cast("long").alias("size"),
            ).alias("req"),
        )
        .groupBy("media_id")
        .agg(F.collect_list("req").alias("reqs"))
    )
    if broadcast_requests == "auto":
        broadcast_requests = ranges.count() <= auto_broadcast_max_requests
    if broadcast_requests:
        joined = media.join(F.broadcast(req), "media_id")
    else:
        joined = media.join(req.hint("shuffle_hash"), "media_id")
    joined = joined.select("media_id", "payload", "reqs")
    schema = EXTRACT_DIGEST_SCHEMA if with_digest else EXTRACT_SCHEMA

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = {k.split()[0]: [] for k in schema.split(",")}
            for mid, payload, reqs in zip(
                pdf["media_id"], pdf["payload"], pdf["reqs"]
            ):
                data = bytes(payload)
                for r in reqs:
                    off, sz = int(r["abs_offset"]), int(r["size"])
                    if off < 0 or sz < 0 or off + sz > len(data):
                        raise ValueError(
                            f"sample range {off}+{sz} overruns the "
                            f"{len(data)}-byte payload of media {int(mid)}"
                        )
                    chunk = data[off : off + sz]
                    rows["media_id"].append(int(mid))
                    rows["sample_index"].append(int(r["sample_index"]))
                    rows["size"].append(sz)
                    rows["payload"].append(chunk)
                    if with_digest:
                        rows["byte_sum"].append(
                            int(np.frombuffer(chunk, np.uint8).sum())
                            if sz
                            else 0
                        )
                        rows["head_u32"].append(
                            int.from_bytes(chunk[:4], "big")
                        )
                        rows["tail_byte"].append(chunk[-1] if sz else -1)
            yield pd.DataFrame(rows)

    return joined.mapInPandas(run, schema=schema)


def _fmp4_params(mid: int) -> dict:
    """Deterministic fragmented-MP4 geometry per id: fragment count,
    per-fragment sample counts ``(id + f) % 6 + 1``, global sample
    sizes ``50 + (7 id + 13 i) % 100``, constant delta — shared with
    the mm_fmp4_ranges oracle."""
    n_frags = mid % 4 + 1
    return {
        "n_frags": n_frags,
        "frag_counts": [(mid + f) % 6 + 1 for f in range(n_frags)],
        "sample_delta": mid % 40 + 10,
        "width": 16 * (mid % 8 + 1) - 2 * (mid % 8),
        "height": 16 * (mid % 6 + 1) - 2 * (mid % 5),
    }


def synthesize_fmp4_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Media table of genuine FRAGMENTED MP4s (CMAF shape: init section
    + moof/mdat pairs, trex defaults, default-base-is-moof anchoring)
    per :func:`_fmp4_params`."""
    src = _id_source(df, id_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                p = _fmp4_params(mid)
                frags, i = [], 0
                for cnt in p["frag_counts"]:
                    frags.append(
                        [50 + (7 * mid + 13 * (i + j)) % 100 for j in range(cnt)]
                    )
                    i += cnt
                # same (sz - 4) < 256 prefix-arithmetic coupling as
                # synthesize_mp4_media — see the comment there
                assert all(max(f) < 260 for f in frags if f), (
                    "extract oracle assumes sizes < 260"
                )
                payloads.append(
                    mp4_codec.encode_fmp4(
                        p["width"], p["height"], frags,
                        sample_delta=p["sample_delta"],
                    )
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "payload": payloads,
                    "media_type": "video/mp4; profile=cmaf",
                }
            )

    return src.mapInPandas(
        run, schema="media_id long, payload binary, media_type string"
    )


FMP4_RANGES_SCHEMA = (
    "media_id long, sample_index long, fragment long, frag_rel_offset long,"
    " size long, dts_ticks long"
)


def fmp4_sample_ranges(df: DataFrame) -> DataFrame:
    """Seek table over FRAGMENTED MP4s (:func:`mp4_codec.
    fragment_index` — moof/traf/trun walk with tfhd/trex default
    resolution): one row per sample with its owning fragment, its
    offset relative to the fragment's first sample (pure prefix sum —
    the absolute anchor is the moof's data offset, asserted byte-exact
    in tests), size, and decode timestamp."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k.split()[0]: [] for k in FMP4_RANGES_SCHEMA.split(",")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                idx = mp4_codec.fragment_index(bytes(payload))
                frag_base: dict[int, int] = {}
                for r in idx:
                    frag_base.setdefault(r["fragment"], r["offset"])
                    rows["media_id"].append(int(mid))
                    rows["sample_index"].append(r["sample"])
                    rows["fragment"].append(r["fragment"])
                    rows["frag_rel_offset"].append(
                        r["offset"] - frag_base[r["fragment"]]
                    )
                    rows["size"].append(r["size"])
                    rows["dts_ticks"].append(r["dts_ticks"])
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=FMP4_RANGES_SCHEMA)


def _mp3_params(mid: int) -> dict:
    """Deterministic MP3 stream geometry per id, shared with the
    mm_mp3_probe oracle: MPEG-1 Layer III, bitrate index cycling the
    full table, all three MPEG-1 sample rates, a padding period, an
    optional ID3v2 prefix, and mono/stereo alternation."""
    return {
        "n_frames": mid % 60 + 1,
        "bitrate_index": mid % 14 + 1,
        "rate_index": mid % 3,
        "pad_every": mid % 4,  # 0 = never padded
        "id3v2_bytes": (mid % 5) * 23,
        "channel_mode": 3 if mid % 2 else 0,
    }


def synthesize_mp3_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Media table of spec-exact MP3 frame streams (real 4-byte
    headers, true frame-length arithmetic, ID3v2 prefixes on 4 of 5
    ids) per :func:`_mp3_params`."""
    from solarboat_data_pipeline_spark.operators import mp3 as mp3_codec

    src = _id_source(df, id_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                p = _mp3_params(mid)
                payloads.append(
                    mp3_codec.encode_mp3_frames(
                        p["n_frames"],
                        bitrate_index=p["bitrate_index"],
                        rate_index=p["rate_index"],
                        pad_every=p["pad_every"],
                        id3v2_bytes=p["id3v2_bytes"],
                        channel_mode=p["channel_mode"],
                        seed=mid,
                    )
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "payload": payloads,
                    "media_type": "audio/mpeg",
                }
            )

    return src.mapInPandas(
        run, schema="media_id long, payload binary, media_type string"
    )


MP3_PROBE_SCHEMA = (
    "media_id long, n_frames long, total_samples long, rate_hz long,"
    " layer long, channel_mode string, duration_ms_x1000 long,"
    " bitrate_min_kbps long, bitrate_max_kbps long,"
    " bitrate_mean_kbps_x1000 long, is_cbr boolean,"
    " audio_bytes long"
)


def _h264_params(mid: int) -> dict:
    """Deterministic H.264 IDR stream geometry per id, shared with the
    mm_h264_decode oracle. Three content lanes, every one of which the
    zero-residual intra codec reproduces EXACTLY (pcm_mae=0 keeps a
    predicted macroblock only when its prediction is bit-exact; every
    other MB ships lossless I_PCM): 0 = dense per-pixel pattern (all
    PCM), 1 = constant frames (one PCM seed, DC/V/H propagation),
    2 = column stripes (first MB row PCM, Vertical propagation)."""
    return {
        "width": 16 * (mid % 2 + 1) - 2 * (mid % 6),
        "height": 16 * (mid % 2 + 1) - 2 * (mid % 4),
        "n_frames": mid % 2 + 1,
        "lane": mid % 3,
    }


def _h264_frame(mid: int, fi: int, w: int, h: int, lane: int):
    """The per-frame planar content of the three lanes — pure integer
    formulas a SQL oracle recomputes."""
    import numpy as np

    r = np.arange(h)[:, None]
    c = np.arange(w)[None, :]
    rc = np.arange(h // 2)[:, None]
    cc = np.arange(w // 2)[None, :]
    if lane == 0:
        y = (7 * mid + 13 * r + 5 * c + 3 * fi) % 256
        cb = (11 * mid + 7 * rc + 3 * cc + 5 * fi) % 256
        cr = (5 * mid + 3 * rc + 11 * cc + 7 * fi) % 256
    elif lane == 1:
        y = np.full((h, w), (3 * mid + 11 * fi) % 256)
        cb = np.full((h // 2, w // 2), (5 * mid + 7 * fi) % 256)
        cr = np.full((h // 2, w // 2), (7 * mid + 13 * fi) % 256)
    else:
        y = np.broadcast_to((11 * mid + 29 * c + 7 * fi) % 256, (h, w))
        cb = np.broadcast_to((13 * mid + 17 * cc + 3 * fi) % 256, (h // 2, w // 2))
        cr = np.broadcast_to((17 * mid + 23 * cc + 11 * fi) % 256, (h // 2, w // 2))
    return (
        y.astype(np.uint8),
        np.ascontiguousarray(cb).astype(np.uint8),
        np.ascontiguousarray(cr).astype(np.uint8),
    )


def synthesize_h264_idr_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Media table of genuine Annex-B H.264 Baseline intra streams
    (SPS + PPS + IDR pictures, operators/h264.py) whose decoded pixels
    equal the :func:`_h264_frame` formulas exactly (pcm_mae=0: only
    bit-exact predictions survive; everything else is lossless
    I_PCM)."""
    from solarboat_data_pipeline_spark.operators import h264 as h264_codec

    src = _id_source(df, id_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                p = _h264_params(mid)
                frames = [
                    _h264_frame(mid, fi, p["width"], p["height"], p["lane"])
                    for fi in range(p["n_frames"])
                ]
                payloads.append(
                    h264_codec.encode_idr_frames(
                        frames, p["width"], p["height"], pcm_mae=0.0
                    )
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "payload": payloads,
                    "media_type": "video/h264; profile=baseline-intra",
                }
            )

    return src.mapInPandas(
        run, schema="media_id long, payload binary, media_type string"
    )


H264_DECODE_SCHEMA = (
    "media_id long, width long, height long, n_frames long, n_mb long,"
    " y_sum long, cb_sum long, cr_sum long"
)


def _h264_stats_runner(decode_fn):
    """Shared mapInPandas body for the Annex-B and in-container pixel
    decode rows: decode every payload with ``decode_fn`` and emit
    dimensions, frame/macroblock counts, and exact per-plane pixel
    sums (computed from the DECODED frames, so any wrong prediction
    formula, neighbor rule, or PCM alignment breaks the sums)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = {k.split()[0]: [] for k in H264_DECODE_SCHEMA.split(",")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                out = decode_fn(bytes(payload))
                rows["media_id"].append(int(mid))
                rows["width"].append(out["width"])
                rows["height"].append(out["height"])
                rows["n_frames"].append(len(out["frames"]))
                rows["n_mb"].append(sum(len(t) for t in out["mb_types"]))
                for key, plane in (("y_sum", 0), ("cb_sum", 1), ("cr_sum", 2)):
                    rows[key].append(
                        int(
                            sum(
                                int(f[plane].astype(np.int64).sum())
                                for f in out["frames"]
                            )
                        )
                    )
            yield pd.DataFrame(rows)

    return run


def decode_h264_stats(df: DataFrame) -> DataFrame:
    """REAL compressed-video PIXEL decode via Arrow ``mapInPandas``:
    full H.264 Baseline intra decode (operators/h264.py — slice/MB
    syntax, I_PCM, all §8.3 prediction modes, zero-residual CAVLC) of
    every Annex-B payload; see :func:`_h264_stats_runner`."""
    from solarboat_data_pipeline_spark.operators import h264 as h264_codec

    return df.mapInPandas(
        _h264_stats_runner(h264_codec.decode_annexb), schema=H264_DECODE_SCHEMA
    )


def synthesize_h264_mp4_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Media table of MP4 files whose samples are REAL coded H.264 IDR
    pictures (operators/h264.py output split into per-picture NALs and
    packaged length-prefixed via :func:`mp4_codec.encode_mp4_samples`,
    with the stream's own SPS/PPS in the avcC record) — the genuine
    end-to-end shape: container walk → seek table → sample extraction
    → pixel decode, every stage real."""
    from solarboat_data_pipeline_spark.operators import h264 as h264_codec

    src = _id_source(df, id_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                p = _h264_params(mid)
                frames = [
                    _h264_frame(mid, fi, p["width"], p["height"], p["lane"])
                    for fi in range(p["n_frames"])
                ]
                es = h264_codec.encode_idr_frames(
                    frames, p["width"], p["height"], pcm_mae=0.0
                )
                payloads.append(
                    mp4_codec.annexb_to_mp4(es, sample_delta=mid % 40 + 10)
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "payload": payloads,
                    "media_type": "video/mp4; codec=avc1 (real samples)",
                }
            )

    return src.mapInPandas(
        run, schema="media_id long, payload binary, media_type string"
    )


def decode_mp4_h264_stats(df: DataFrame) -> DataFrame:
    """Container-to-pixels decode via Arrow ``mapInPandas``: for every
    MP4 payload, pull the avcC parameter sets, walk the sample seek
    table, unpack the length-prefixed NALs (h264.decode_mp4 — the same
    byte ranges a ranged-GET extractor issues), and pixel-decode the
    intra stream. Map-only: no shuffle, single-core rate = cluster
    rate. Same exact-sum schema as :func:`decode_h264_stats` so one
    oracle covers both the raw-Annex-B and the in-container paths."""
    from solarboat_data_pipeline_spark.operators import h264 as h264_codec

    return df.mapInPandas(
        _h264_stats_runner(h264_codec.decode_mp4), schema=H264_DECODE_SCHEMA
    )


def _mixed_media_kind(mid: int) -> int:
    """Format rotation for the mixed curation corpus: 0=MP4, 1=IVF/VP9,
    2=MP3."""
    return mid % 3


# Distinct seeds below this bound can never produce byte-identical
# payloads: 600 is the lcm of every _mp4_params modulus plus the
# sample-size formula's mod-100 term (lcm(8,6,5,24,4,40,3,100) = 600 —
# the largest of the three lanes' formula periods), so two different
# seeds under the bound must differ in at least one generated byte.
# The pipeline_media_curation oracle's dedup arithmetic (seed-equality
# ⇔ payload-equality) rests on this; synthesize_mixed_media enforces it
# (VERDICT r11 item 6) so a future widening of _mixed_media_seed's
# range cannot silently invalidate the oracle.
_DUP_SEED_LCM_BOUND = 600


def _mixed_media_seed(mid: int) -> int:
    """Content seed shared by duplicate groups: the 5 ids of the same
    kind inside each block of 15 consecutive ids get identical payloads,
    and the block index wraps at 64 so large corpora also carry
    cross-block duplicates. The wrap keeps every seed < 192, BELOW the
    smallest lcm of the generator formulas' periods (600 for the MP4
    lane) — two distinct seeds can therefore never produce
    byte-identical payloads, so grouping by seed is EXACTLY grouping by
    content digest and the oracle can mirror the dedup arithmetically."""
    return ((mid // 15) % 64) * 3 + mid % 3


def synthesize_mixed_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Mixed-format media corpus for the curation composition: each id
    becomes a genuine MP4, IVF/VP9, or MP3 stream (kind = id mod 3)
    whose content derives from the GROUP seed — so duplicate groups
    carry byte-identical payloads — and ids with ``id % 7 == 3`` are
    CORRUPTED (first 8 bytes zeroed, which breaks the ftyp magic, the
    DKIF signature, and the MP3 frame sync respectively — every prober
    raises its clean ValueError)."""
    from solarboat_data_pipeline_spark.operators import mp3 as mp3_codec
    from solarboat_data_pipeline_spark.operators import vp9 as vp9_codec

    src = _id_source(df, id_col)

    def _encode(seed: int, kind: int) -> bytes:
        if kind == 0:
            p = _mp4_params(seed)
            sizes = [
                50 + (7 * seed + 13 * i) % 100 for i in range(p["n_samples"])
            ]
            return mp4_codec.encode_mp4(
                p["width"], p["height"], sizes,
                timescale=p["timescale"], sample_delta=p["sample_delta"],
                profile_idc=p["profile_idc"], level_idc=p["level_idc"],
            )
        if kind == 1:
            p = _ivf_params(seed)
            frames = []
            for i in range(p["n_frames"]):
                if i % p["key_every"] == 0:
                    hdr = vp9_codec.encode_vp9_keyframe_header(
                        p["width"], p["height"],
                        profile=p["profile"], bit_depth=p["bit_depth"],
                    )
                else:
                    hdr = _inter_header(vp9_codec, seed, i, p["profile"])
                tail_len = 30 + (3 * seed + 17 * i) % 80
                tail = bytes(
                    (seed * 5 + i * 11 + j) % 256 for j in range(tail_len)
                )
                frames.append(hdr + tail)
            return vp9_codec.encode_ivf(
                p["width"], p["height"], frames,
                timebase_den=p["timebase_den"],
            )
        p = _mp3_params(seed)
        return mp3_codec.encode_mp3_frames(
            p["n_frames"], bitrate_index=p["bitrate_index"],
            rate_index=p["rate_index"], pad_every=p["pad_every"],
            id3v2_bytes=p["id3v2_bytes"], channel_mode=p["channel_mode"],
            seed=seed,
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[tuple[int, int], bytes] = {}
        for pdf in batches:
            kinds, payloads = [], []
            for mid in pdf["media_id"]:
                mid = int(mid)
                kind = _mixed_media_kind(mid)
                seed = _mixed_media_seed(mid)
                assert seed < _DUP_SEED_LCM_BOUND, (
                    "seed range outgrew the generator-formula lcm bound;"
                    " the curation oracle's seed⇔payload argument breaks"
                )
                data = cache.get((seed, kind))
                if data is None:
                    data = _encode(seed, kind)
                    cache[(seed, kind)] = data
                if mid % 7 == 3:
                    data = bytes(8) + data[8:]
                kinds.append(kind)
                payloads.append(data)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "kind": pd.Series(kinds, dtype="int64"),
                    "payload": payloads,
                }
            )

    return src.mapInPandas(
        run, schema="media_id long, kind long, payload binary"
    )


MEDIA_PROBE_TOLERANT_SCHEMA = (
    "media_id long, kind long, digest string, ok boolean, n_units long,"
    " unit_bytes long"
)


def probe_media_tolerant(df: DataFrame) -> DataFrame:
    """Format-dispatching TOLERANT probe: run the right structure
    prober (MP4 box walk / IVF+VP9 header parse / MP3 frame sync) per
    row and turn its clean-ValueError contract into a FILTERABLE
    ``ok`` flag instead of a task failure — the corrupt-file-rejection
    stage of a media curation pipeline. Emits the per-file unit count
    (samples / frames) and unit byte total for the curation report,
    plus the payload's sha256 digest for exact content dedup (computed
    here so the corpus bytes cross the plan once). Map-only: no
    shuffle, single-core rate = cluster rate."""
    import hashlib

    from solarboat_data_pipeline_spark.operators import mp3 as mp3_codec
    from solarboat_data_pipeline_spark.operators import vp9 as vp9_codec

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                k.split()[0]: []
                for k in MEDIA_PROBE_TOLERANT_SCHEMA.split(",")
            }
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                data = bytes(payload)
                kind = int(kind)
                ok, n_units, unit_bytes = True, 0, 0
                try:
                    if kind == 0:
                        info = mp4_codec.probe_mp4(data)
                        n_units = info["n_samples"]
                        unit_bytes = info["sample_bytes"]
                    elif kind == 1:
                        info = vp9_codec.probe_ivf(data)
                        n_units = info["n_frames"]
                        unit_bytes = info["frame_bytes"]
                    else:
                        info = mp3_codec.probe_mp3(data)
                        n_units = info["n_frames"]
                        unit_bytes = info["audio_bytes"]
                except ValueError:
                    ok = False
                rows["media_id"].append(int(mid))
                rows["kind"].append(kind)
                rows["digest"].append(hashlib.sha256(data).hexdigest())
                rows["ok"].append(ok)
                rows["n_units"].append(n_units)
                rows["unit_bytes"].append(unit_bytes)
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=MEDIA_PROBE_TOLERANT_SCHEMA)


def probe_mp3_stats(df: DataFrame) -> DataFrame:
    """REAL compressed-audio probe via Arrow ``mapInPandas``: frame-
    sync walk over every payload (ID3v2 skip, frame-length arithmetic)
    emitting exact frame/sample counts, duration, rate, bitrate, CBR
    flag — the audio twin of :func:`probe_video_stats`."""
    from solarboat_data_pipeline_spark.operators import mp3 as mp3_codec

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k.split()[0]: [] for k in MP3_PROBE_SCHEMA.split(",")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                info = mp3_codec.probe_mp3(bytes(payload))
                rows["media_id"].append(int(mid))
                rows["n_frames"].append(info["n_frames"])
                rows["total_samples"].append(info["total_samples"])
                rows["rate_hz"].append(info["rate_hz"])
                rows["layer"].append(info["layer"])
                rows["channel_mode"].append(info["channel_mode"])
                rows["duration_ms_x1000"].append(info["duration_ms_x1000"])
                rows["bitrate_min_kbps"].append(info["bitrate_min_kbps"])
                rows["bitrate_max_kbps"].append(info["bitrate_max_kbps"])
                rows["bitrate_mean_kbps_x1000"].append(
                    info["bitrate_mean_kbps_x1000"]
                )
                rows["is_cbr"].append(info["is_cbr"])
                rows["audio_bytes"].append(info["audio_bytes"])
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=MP3_PROBE_SCHEMA)
