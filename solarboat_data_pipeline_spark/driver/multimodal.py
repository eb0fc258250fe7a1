"""Multimodal driver queries (binary metadata, PNG/WAV/AVI/MJPEG decode paths, resize/frame-sample/features).

Split out of driver_queries.py (round 9); conventions in the facade
docstring there.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from solarboat_data_pipeline_spark.operators import multimodal as mm
from solarboat_data_pipeline_spark.operators import sampling as sp

from solarboat_data_pipeline_spark.driver._registry import (  # noqa: F401
    _REGISTRY,
    _io_dir,
    _t,
    register,
)



@register(
    "mm_binary_meta",
    """
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                WHEN doc_id % 3 = 1 THEN 'audio/wav'
                ELSE 'video/mp4' END AS media_type,
           octet_length(encode(text))::BIGINT AS n_bytes,
           sha256(text) AS sha256
    FROM documents
    """,
)
def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = mm.documents_as_media(_t(spark, sf_dir, "documents"))
    return mm.binary_metadata(media)


@register(
    "mm_frame_sample",
    """
    WITH media AS (
      SELECT doc_id AS media_id, octet_length(encode(text)) AS n_bytes
      FROM documents WHERE doc_id % 3 = 2)
    SELECT media_id,
           unnest(generate_series(0, (n_bytes // 100 + 1) - 1, 10))::BIGINT AS frame_index
    FROM media
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = mm.documents_as_media(_t(spark, sf_dir, "documents"))
    out = mm.frame_sample_plan(media, every_n=10)
    return out.select("media_id", F.col("frame_index").cast("long").alias("frame_index"))


@register(
    "mm_png_decode",
    """
    WITH g AS (
      SELECT doc_id,
             doc_id % 16 + 1 AS w,
             doc_id % 12 + 1 AS h,
             doc_id % 5 AS form,
             CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 3 END AS ch
      FROM documents),
    px AS (
      SELECT g.doc_id, g.w, g.h, g.ch,
             CASE WHEN g.form = 2
                  THEN (((x.x * 7 + y.y * 13 + g.doc_id) % 256)
                        * (3 + 2 * c.c) + g.doc_id) % 256
                  WHEN g.form = 4
                  THEN (((x.x * 7 + y.y * 13 + g.doc_id) % 16)
                        * (3 + 2 * c.c) + g.doc_id) % 256
                  ELSE (x.x * 7 + y.y * 13 + c.c * 31 + g.doc_id) % 256
             END AS v
      FROM g, generate_series(0, 15) x(x), generate_series(0, 11) y(y),
           generate_series(0, 2) c(c)
      WHERE x.x < g.w AND y.y < g.h AND c.c < g.ch)
    SELECT doc_id AS media_id, w::INT AS width, h::INT AS height,
           ch::INT AS channels, CAST(SUM(v) AS BIGINT) AS pixel_sum
    FROM px GROUP BY doc_id, w, h, ch
    """,
)
def mm_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PNG decode (operators/png.py + multimodal.decode_image_stats):
    each document id becomes a genuine PNG file (stdlib zlib+struct
    encoder, scanline filters cycling 0-4), cycling ``id % 5`` over the
    real-world envelope — grayscale, RGB, PALETTE (color type 3, PLTE
    expanded to RGB on decode), ADAM7-INTERLACED RGB, and (round 7)
    4-BIT PALETTE with packed sub-byte scanlines, alternating
    sequential/Adam7 — decoded back by the stdlib decoder inside Arrow
    mapInPandas. The oracle recomputes the decoded
    width/height/channels/pixel-sum ARITHMETICALLY from the generator
    formula (interlace shares its form's formula: it changes only the
    wire layout) — DuckDB never sees the bytes, so a wrong
    signature/IHDR/PLTE/inflate/unfilter/bit-unpack/de-interlace stage
    cannot hash-match."""
    docs = _t(spark, sf_dir, "documents")
    media = mm.synthesize_png_media(docs)
    return mm.decode_image_stats(media)


@register(
    "mm_png_resize",
    """
    WITH g AS (
      SELECT doc_id,
             doc_id % 16 + 1 AS w,
             doc_id % 12 + 1 AS h,
             doc_id % 5 AS form,
             CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 3 END AS ch
      FROM documents),
    px AS (
      SELECT g.doc_id, g.w, g.h, g.ch,
             CASE WHEN g.form = 2
                  THEN (((((x.x * g.w) // 8) * 7 + ((y.y * g.h) // 6) * 13
                          + g.doc_id) % 256) * (3 + 2 * c.c) + g.doc_id) % 256
                  WHEN g.form = 4
                  THEN (((((x.x * g.w) // 8) * 7 + ((y.y * g.h) // 6) * 13
                          + g.doc_id) % 16) * (3 + 2 * c.c) + g.doc_id) % 256
                  ELSE (((x.x * g.w) // 8) * 7 + ((y.y * g.h) // 6) * 13
                        + c.c * 31 + g.doc_id) % 256
             END AS v
      FROM g, generate_series(0, 7) x(x), generate_series(0, 5) y(y),
           generate_series(0, 2) c(c)
      WHERE c.c < g.ch)
    SELECT doc_id AS media_id, w::INT AS width, h::INT AS height,
           8::INT AS target_width, 6::INT AS target_height,
           ch::INT AS channels, CAST(SUM(v) AS BIGINT) AS pixel_sum
    FROM px GROUP BY doc_id, w, h, ch
    """,
)
def mm_png_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL decode + nearest-neighbor resize (operators/png.py): decode
    the synthesized PNG (grayscale/RGB/palette/Adam7/4-bit-palette
    forms, ``id % 5``), resample with the exact floor mapping ``src =
    (dst·src_dim) // dst_dim``, and emit resized pixel stats. The
    oracle recomputes the same mapping arithmetically (palette rows
    through the PLTE formula at the form's palette size; interlaced
    forms share their sequential formulas)."""
    docs = _t(spark, sf_dir, "documents")
    media = mm.synthesize_png_media(docs)
    return mm.resize_image_stats(media, 8, 6, method="nearest")


@register(
    "mm_wav_decode",
    """
    WITH g AS (
      SELECT doc_id,
             doc_id % 480 + 16 AS n,
             CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 2 END AS ch
      FROM documents),
    s AS (
      SELECT g.doc_id, g.n, g.ch,
             (37 * i.i + 101 * c.c + 13 * g.doc_id) % 4096 - 2048 AS v
      FROM g, generate_series(0, 495) i(i), generate_series(0, 1) c(c)
      WHERE i.i < g.n AND c.c < g.ch)
    SELECT doc_id AS media_id, 8000::INT AS sample_rate, ch::INT AS channels,
           n::INT AS n_frames, CAST(SUM(v) AS BIGINT) AS sample_sum
    FROM s GROUP BY doc_id, n, ch
    """,
)
def mm_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL WAV decode (operators/wav.py + multimodal.decode_audio_stats):
    each document id becomes a genuine 16-bit PCM RIFF/WAVE file (stdlib
    struct encoder, cross-validated against the stdlib ``wave`` module),
    decoded back by the stdlib decoder inside Arrow mapInPandas. The
    oracle recomputes the decoded rate/channels/frames/sample-sum
    ARITHMETICALLY from the generator formula — DuckDB never sees the
    bytes, so a wrong RIFF-walk/fmt/block-align/PCM stage cannot
    hash-match."""
    docs = _t(spark, sf_dir, "documents")
    media = mm.synthesize_wav_media(docs)
    return mm.decode_audio_stats(media)


@register(
    "mm_wav_resample",
    """
    WITH g AS (
      SELECT doc_id,
             doc_id % 480 + 16 AS n,
             CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 2 END AS ch
      FROM documents),
    s AS (
      SELECT g.doc_id, g.n, g.ch,
             (37 * ((d.d * g.n) // 32) + 101 * c.c + 13 * g.doc_id)
               % 4096 - 2048 AS v
      FROM g, generate_series(0, 31) d(d), generate_series(0, 1) c(c)
      WHERE c.c < g.ch)
    SELECT doc_id AS media_id, 8000::INT AS sample_rate, ch::INT AS channels,
           n::INT AS n_frames, 32::INT AS target_frames,
           CAST(SUM(v) AS BIGINT) AS sample_sum
    FROM s GROUP BY doc_id, n, ch
    """,
)
def mm_wav_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL decode + nearest-frame resample (operators/wav.py): decode
    the synthesized WAV, resample the frame axis with the exact floor
    mapping ``src = (dst·n_src) // n_dst``, and emit resampled sample
    stats. The oracle recomputes the same mapping arithmetically."""
    docs = _t(spark, sf_dir, "documents")
    media = mm.synthesize_wav_media(docs)
    return mm.resample_audio_stats(media, 32, method="nearest")


@register(
    "mm_avi_decode",
    """
    WITH g AS (
      SELECT doc_id,
             doc_id % 12 + 2 AS nf,
             doc_id % 8 + 1 AS w,
             doc_id % 6 + 1 AS h
      FROM documents),
    px AS (
      SELECT g.doc_id, g.nf, g.w, g.h,
             (11 * f.f + 7 * x.x + 13 * y.y + 31 * c.c + g.doc_id) % 256 AS v
      FROM g, generate_series(0, 13) f(f), generate_series(0, 7) x(x),
           generate_series(0, 5) y(y), generate_series(0, 2) c(c)
      WHERE f.f < g.nf AND x.x < g.w AND y.y < g.h)
    SELECT doc_id AS media_id, w::INT AS width, h::INT AS height,
           nf::INT AS n_frames, 25::INT AS fps,
           CAST(SUM(v) AS BIGINT) AS pixel_sum
    FROM px GROUP BY doc_id, w, h, nf
    """,
)
def mm_avi_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL uncompressed-video decode (operators/avi.py +
    multimodal.decode_video_stats): each document id becomes a genuine
    BI_RGB AVI file (stdlib struct RIFF writer), decoded back by the
    stdlib reader inside Arrow mapInPandas — chunk-tree walk,
    BITMAPINFOHEADER validation, DIB bottom-up/BGR/row-padding undone.
    The oracle recomputes decoded dims/frames/pixel-sum ARITHMETICALLY
    from the generator formula — DuckDB never sees the bytes, so a wrong
    container/DIB stage cannot hash-match."""
    docs = _t(spark, sf_dir, "documents")
    media = mm.synthesize_avi_media(docs)
    return mm.decode_video_stats(media)


@register(
    "mm_avi_frames",
    """
    WITH g AS (
      SELECT doc_id,
             doc_id % 12 + 2 AS nf,
             doc_id % 8 + 1 AS w,
             doc_id % 6 + 1 AS h
      FROM documents),
    px AS (
      SELECT g.doc_id, g.nf, g.w, g.h,
             (11 * f.f + 7 * x.x + 13 * y.y + 31 * c.c + g.doc_id) % 256 AS v
      FROM g, generate_series(0, 13) f(f), generate_series(0, 7) x(x),
           generate_series(0, 5) y(y), generate_series(0, 2) c(c)
      WHERE f.f < g.nf AND f.f % 2 = 0 AND x.x < g.w AND y.y < g.h)
    SELECT doc_id AS media_id, nf::INT AS n_frames,
           ((nf + 1) // 2)::INT AS sampled_frames,
           CAST(SUM(v) AS BIGINT) AS pixel_sum
    FROM px GROUP BY doc_id, nf
    """,
)
def mm_avi_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL decode + every-2nd-frame sampling (operators/avi.py
    ``sample_frames``): frames 0, 2, 4, ... of the decoded AVI,
    summarized as sampled-frame count + pixel sum. The oracle selects
    the same frames arithmetically (``f % 2 = 0``)."""
    docs = _t(spark, sf_dir, "documents")
    media = mm.synthesize_avi_media(docs)
    return mm.sample_frame_stats(media, every_k=2)


@register(
    "mm_mjpeg_decode",
    """
    SELECT doc_id AS media_id,
           (doc_id % 8 + 1)::INT AS width,
           (doc_id % 6 + 1)::INT AS height,
           (doc_id % 12 + 2)::INT AS n_frames,
           25::INT AS fps,
           true AS ok
    FROM documents
    """,
)
def mm_mjpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-video decode (operators/jpeg.py baseline JPEG +
    operators/avi.py MJPEG container): each document id becomes a
    genuine Motion-JPEG AVI (frames compressed by the in-repo T.81
    baseline codec — FDCT, Annex K quantization, canonical Huffman,
    byte stuffing; even ids 4:4:4, odd ids 4:2:0 chroma subsampling,
    every third id a DRI/RSTn restart interval — so the
    interleaved-MCU and restart-marker decode paths are exercised),
    decoded back frame-by-frame inside Arrow mapInPandas (Huffman
    decode, restart resync, dequant, IDCT, chroma upsample,
    YCbCr→RGB). JPEG is
    LOSSY, so unlike the PNG/WAV rows the oracle checks the container
    dimensions/frame counts arithmetically plus a per-media fidelity
    gate: decoded-vs-truth mean absolute error < 8 (the working codec
    measures ~1-2 on the smooth wrap-free pattern; a broken Huffman/
    dequant/IDCT stage lands near the ~85 of unrelated noise).
    Exactness evidence lives in
    tests/test_jpeg.py (round-trips, spec-golden markers, orthonormal
    DCT, adversarial corpus)."""
    docs = _t(spark, sf_dir, "documents")
    media = mm.synthesize_mjpeg_media(docs)
    return mm.mjpeg_decode_check(media)


@register(
    "mm_resize",
    """
    WITH media AS (
      -- document text is pure ASCII in these fixtures, so VARCHAR substr
      -- equals the byte slice the Spark kernel takes on the utf-8 payload
      SELECT doc_id AS media_id, text,
             (doc_id % 640 + 1)::INT AS width,
             (doc_id % 480 + 1)::INT AS height
      FROM documents WHERE doc_id % 3 = 0),
    sized AS (
      SELECT media_id, width, height, text,
             greatest(1, least(octet_length(encode(text)),
               octet_length(encode(text)) * 3072 // (width * height)))::BIGINT AS n
      FROM media)
    SELECT media_id, 'image/png' AS media_type, width, height,
           64::INT AS target_width, 48::INT AS target_height,
           n AS n_bytes, md5(substr(text, 1, n::INT)) AS payload_md5
    FROM sized
    """,
)
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-resize plumbing (operators/multimodal.py:resize_plan): the
    Arrow mapInPandas batching, type filter, and typed target dims are
    real; the pixel kernel is the documented stub (proportional byte-
    stream truncation), which makes the output exactly SQL-checkable."""
    media = mm.documents_as_media(_t(spark, sf_dir, "documents"))
    return mm.resize_plan(media, target_width=64, target_height=48)


# mapInPandas feature extraction: the Spark-side plumbing is real, the
# decode kernel is a documented deterministic stub (byte-sum moments) —
# which makes even the stub exactly SQL-checkable on the ASCII fixtures
# (char ords equal payload bytes). A real decoder swaps in behind fake=.
@register(
    "mm_features",
    """
    WITH m AS (
      SELECT doc_id AS media_id,
             CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                  WHEN doc_id % 3 = 1 THEN 'audio/wav'
                  ELSE 'video/mp4' END AS media_type,
             octet_length(encode(text))::BIGINT AS n_bytes,
             list_transform(string_split(text, ''), c -> ord(c)) AS bytes
      FROM documents)
    SELECT media_id, media_type, n_bytes,
           round(n_bytes * 1.0e0, 6) AS f_len,
           round(list_sum(bytes) * 1.0e0 / greatest(n_bytes, 1), 6) AS f_mean,
           round(coalesce(list_min(bytes), 0) * 1.0e0, 6) AS f_min,
           round(coalesce(list_max(bytes), 0) * 1.0e0, 6) AS f_max
    FROM m
    """,
)
def mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = mm.documents_as_media(_t(spark, sf_dir, "documents"))
    feats = mm.extract_features(media, fake=True)
    return feats.select(
        "media_id",
        "media_type",
        "n_bytes",
        *[
            F.round(F.col("feature")[i], 6).alias(n)
            for i, n in enumerate(["f_len", "f_mean", "f_min", "f_max"])
        ],
    )


@register(
    "mm_mp4_probe",
    """
    WITH g AS (
      SELECT doc_id,
             16*(doc_id % 8 + 1) - 2*(doc_id % 8) AS width,
             16*(doc_id % 6 + 1) - 2*(doc_id % 5) AS height,
             doc_id % 24 + 1 AS n_samples,
             600*(doc_id % 4 + 1) AS timescale,
             doc_id % 40 + 10 AS delta,
             CASE doc_id % 3 WHEN 0 THEN 66 WHEN 1 THEN 77 ELSE 100 END
               AS profile_idc,
             CASE doc_id % 3 WHEN 0 THEN 30 WHEN 1 THEN 31 ELSE 41 END
               AS level_idc
      FROM documents),
    b AS (
      SELECT g.doc_id,
             SUM(50 + (7*g.doc_id + 13*i.i) % 100) AS sample_bytes
      FROM g, generate_series(0, 23) i(i)
      WHERE i.i < g.n_samples
      GROUP BY g.doc_id)
    SELECT g.doc_id AS media_id, 'isom' AS brand, 'avc1' AS codec,
           g.width::BIGINT AS track_width, g.height::BIGINT AS track_height,
           g.width::BIGINT AS coded_width, g.height::BIGINT AS coded_height,
           g.profile_idc::BIGINT AS profile_idc,
           g.level_idc::BIGINT AS level_idc,
           g.n_samples::BIGINT AS n_samples,
           b.sample_bytes::BIGINT AS sample_bytes,
           (g.n_samples * g.delta)::BIGINT AS duration,
           g.timescale::BIGINT AS timescale
    FROM g JOIN b USING (doc_id)
    """,
)
def mm_mp4_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-video probe (operators/mp4.py): each document id
    becomes a genuine minimal MP4 — full ISO 14496-12 box tree, avc1
    sample entry whose avcC carries a bit-level H.264 SPS/PPS (Exp-
    Golomb, emulation prevention, frame cropping live on every
    non-multiple-of-16 dimension) — then probed back by the box walker
    + SPS parser inside Arrow mapInPandas. The oracle recomputes every
    probed column ARITHMETICALLY from the generator formulas — DuckDB
    never sees the bytes, so a wrong box offset / Exp-Golomb read /
    crop-unit computation cannot hash-match. No video path exists in
    the reference (this extends SURVEY §2's training-data addendum)."""
    docs = _t(spark, sf_dir, "documents")
    media = mm.synthesize_mp4_media(docs)
    return mm.probe_video_stats(media)


@register(
    "mm_h264_keyframes",
    """
    WITH g AS (
      SELECT doc_id,
             doc_id % 50 + 3 AS n_nals,
             doc_id % 7 + 2 AS idr_every
      FROM documents),
    n AS (
      SELECT g.doc_id, g.n_nals, g.idr_every, i.i,
             21 + (5*g.doc_id + 11*i.i) % 64 AS nal_size,
             (i.i % g.idr_every = 0) AS is_idr
      FROM g, generate_series(0, 52) i(i)
      WHERE i.i < g.n_nals)
    SELECT doc_id AS media_id,
           COUNT(*)::BIGINT AS n_nals,
           SUM(CASE WHEN is_idr THEN 1 ELSE 0 END)::BIGINT AS n_idr,
           4::BIGINT AS first_idr_offset,
           SUM(CASE WHEN is_idr THEN nal_size ELSE 0 END)::BIGINT AS idr_bytes,
           SUM(nal_size + 4)::BIGINT AS es_bytes
    FROM n GROUP BY doc_id
    """,
)
def mm_h264_keyframes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyframe index over raw H.264 Annex-B elementary streams: the
    start-code NAL scanner (operators/mp4.py nal_scan) walks genuine
    synthesized streams (IDR every k-th NAL, payload bytes never zero
    so no accidental start codes) and emits the seek table — NAL/IDR
    counts, first-IDR offset, IDR bytes, stream size. The oracle
    recomputes the index arithmetically from the generator geometry
    (unit 0 is always IDR, so first_idr_offset is the 4-byte leading
    start code)."""
    docs = _t(spark, sf_dir, "documents")
    media = mm.synthesize_annexb_media(docs)
    return mm.keyframe_index(media)


@register(
    "mm_ivf_vp9_probe",
    """
    WITH g AS (
      SELECT doc_id,
             32*(doc_id % 10 + 1) - (doc_id % 7) AS width,
             32*(doc_id % 8 + 1) - (doc_id % 5) AS height,
             doc_id % 20 + 1 AS n_frames,
             doc_id % 6 + 2 AS key_every,
             CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 2 END AS profile,
             CASE WHEN doc_id % 2 = 0 THEN 8 ELSE 10 END AS bit_depth,
             24 + (doc_id % 4) * 6 AS timebase_den
      FROM documents),
    f AS (
      SELECT g.doc_id,
             SUM(CASE WHEN i.i % g.key_every = 0 THEN 9 ELSE 5 END
                 + 30 + (3*g.doc_id + 17*i.i) % 80) AS frame_bytes,
             SUM(CASE WHEN i.i % g.key_every = 0 THEN 1 ELSE 0 END)
               AS n_keyframes,
             SUM(CASE WHEN i.i % g.key_every = 0 THEN 0
                 ELSE (g.doc_id + 3*i.i) % 256 END) AS refresh_flags_sum,
             SUM(CASE WHEN i.i % g.key_every = 0 THEN 0
                 ELSE i.i % 8 + (g.doc_id + i.i) % 8 + (2*i.i + 1) % 8
                 END) AS ref_idx_sum,
             SUM(CASE WHEN i.i % g.key_every = 0 THEN 0
                 ELSE i.i % 2 END) AS n_hp_mv
      FROM g, generate_series(0, 19) i(i)
      WHERE i.i < g.n_frames
      GROUP BY g.doc_id)
    SELECT g.doc_id AS media_id, 'VP90' AS fourcc,
           g.width::BIGINT AS width, g.height::BIGINT AS height,
           g.width::BIGINT AS coded_width, g.height::BIGINT AS coded_height,
           g.profile::BIGINT AS profile, g.bit_depth::BIGINT AS bit_depth,
           g.n_frames::BIGINT AS n_frames,
           f.n_keyframes::BIGINT AS n_keyframes,
           f.frame_bytes::BIGINT AS frame_bytes,
           g.timebase_den::BIGINT AS timebase_den,
           f.refresh_flags_sum::BIGINT AS refresh_flags_sum,
           f.ref_idx_sum::BIGINT AS ref_idx_sum,
           f.n_hp_mv::BIGINT AS n_hp_mv
    FROM g JOIN f USING (doc_id)
    """,
)
def mm_ivf_vp9_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL IVF/VP9 probe (operators/vp9.py): each document id becomes
    a genuine IVF file whose frames carry bit-exact VP9 uncompressed
    headers (spec §6.2 — keyframe sync code, profile-2 10-bit branch,
    4:2:0 color config, 16-bit frame-size fields), walked back by the
    container prober + per-frame header parser inside Arrow
    mapInPandas. Round 12: inter frames carry FULL §6.2 headers
    (refresh_frame_flags, reference indices, mv precision — all with
    deterministic per-frame formulas via multimodal._inter_header) and
    the probe reports their aggregates. The oracle recomputes every
    column ARITHMETICALLY from the generator geometry; the only derived
    constants are the header byte lengths (keyframe = 69/70 bits -> 9
    bytes for profiles 0/2, full inter header = 36 bits -> 5 bytes),
    asserted exactly in tests/test_vp9.py so a syntax change cannot
    silently keep the oracle green."""
    docs = _t(spark, sf_dir, "documents")
    media = mm.synthesize_ivf_media(docs)
    return mm.probe_ivf_stats(media)


@register(
    "mm_mp4_sample_ranges",
    """
    WITH g AS (
      SELECT doc_id,
             doc_id % 24 + 1 AS n_samples,
             doc_id % 40 + 10 AS delta
      FROM documents),
    s AS (
      SELECT g.doc_id, i.i,
             50 + (7*g.doc_id + 13*i.i) % 100 AS sz, g.delta
      FROM g, generate_series(0, 23) i(i)
      WHERE i.i < g.n_samples)
    SELECT doc_id AS media_id, i::BIGINT AS sample_index,
           COALESCE(SUM(sz) OVER (PARTITION BY doc_id ORDER BY i
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
             AS rel_offset,
           sz::BIGINT AS size,
           (i * delta)::BIGINT AS dts_ticks
    FROM s
    """,
)
def mm_mp4_sample_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-sample MP4 seek table (operators/mp4.py sample_index): full
    stsc run-length chunk map + stsz/stco/stts walk, exploded to one
    row per sample with its relative byte range and decode timestamp —
    what a distributed extractor joins against for ranged reads. The
    oracle recomputes size/prefix-sum offset/dts arithmetically from
    the generator; the ABSOLUTE offsets are asserted byte-exact in
    tests/test_mp4.py (each (offset, size) range slices exactly the
    generated sample payload back out of the file)."""
    docs = _t(spark, sf_dir, "documents")
    media = mm.synthesize_mp4_media(docs)
    return mm.mp4_sample_ranges(media)


@register(
    "mm_fmp4_ranges",
    """
    WITH g AS (
      SELECT doc_id,
             doc_id % 4 + 1 AS n_frags,
             doc_id % 40 + 10 AS delta
      FROM documents),
    fr AS (
      SELECT g.doc_id, g.delta, f.f,
             (g.doc_id + f.f) % 6 + 1 AS cnt
      FROM g, generate_series(0, 3) f(f)
      WHERE f.f < g.n_frags),
    fr2 AS (
      SELECT doc_id, delta, f, cnt,
             COALESCE(SUM(cnt) OVER (PARTITION BY doc_id ORDER BY f
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS start_i
      FROM fr),
    s AS (
      SELECT fr2.doc_id, fr2.delta, fr2.f, j.j,
             fr2.start_i + j.j AS i,
             50 + (7*fr2.doc_id + 13*(fr2.start_i + j.j)) % 100 AS sz
      FROM fr2, generate_series(0, 5) j(j)
      WHERE j.j < fr2.cnt)
    SELECT doc_id AS media_id, i::BIGINT AS sample_index,
           (f + 1)::BIGINT AS fragment,
           COALESCE(SUM(sz) OVER (PARTITION BY doc_id, f ORDER BY j
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
             AS frag_rel_offset,
           sz::BIGINT AS size,
           (i * delta)::BIGINT AS dts_ticks
    FROM s
    """,
)
def mm_fmp4_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fragmented-MP4 seek table (operators/mp4.py fragment_index):
    each document id becomes a genuine CMAF-shaped file (init section
    with empty sample tables + trex defaults, then per-fragment
    moof(mfhd, traf(tfhd base-is-moof, tfdt, trun with data offset +
    per-sample sizes)) + mdat), walked back by the fragment prober
    under Arrow mapInPandas. Emitted offsets are fragment-relative
    (pure prefix sums the oracle recomputes arithmetically); the
    ABSOLUTE moof-anchored offsets are asserted byte-exact in
    tests/test_mp4.py by slicing the generated payloads back out."""
    docs = _t(spark, sf_dir, "documents")
    media = mm.synthesize_fmp4_media(docs)
    return mm.fmp4_sample_ranges(media)


@register(
    "mm_mp4_extract",
    """
    WITH g AS (
      SELECT doc_id,
             16*(doc_id % 8 + 1) - 2*(doc_id % 8) AS width,
             16*(doc_id % 6 + 1) - 2*(doc_id % 5) AS height,
             doc_id % 24 + 1 AS n_samples
      FROM documents),
    s AS (
      SELECT g.doc_id, i.i, g.width, g.height,
             50 + (7*g.doc_id + 13*i.i) % 100 AS sz
      FROM g, generate_series(0, 23) i(i)
      WHERE i.i < g.n_samples AND i.i % 3 = 0),
    body AS (
      SELECT s.doc_id, s.i,
             SUM((7*s.width + 11*s.height + 13*s.i + 5*j.j) % 256)
               AS body_sum
      FROM s, generate_series(0, 148) j(j)
      WHERE j.j < s.sz - 5
      GROUP BY s.doc_id, s.i)
    SELECT s.doc_id AS media_id, s.i::BIGINT AS sample_index,
           s.sz::BIGINT AS size,
           (s.sz - 4 + 101 + b.body_sum)::BIGINT AS byte_sum,
           (s.sz - 4)::BIGINT AS head_u32,
           ((7*s.width + 11*s.height + 13*s.i + 5*(s.sz - 6)) % 256)::BIGINT
             AS tail_byte
    FROM s JOIN body b ON s.doc_id = b.doc_id AND s.i = b.i
    """,
)
def mm_mp4_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed ranged-GET extraction — the probe lane's loop
    closed: build the absolute-offset seek table (operators/mp4.py
    sample_index), select every 3rd sample (a frame sampler's typical
    sparse pull), and slice exactly those byte ranges back out of the
    media with multimodal.extract_sample_payloads. Requests shuffle as
    24-byte structs and broadcast to the media scan — each payload
    crosses the plan once, no media shuffle (the Arrow slice is the
    documented swap-in for object-store ranged GETs at 100 TB). The
    oracle recomputes the FULL content of every extracted sample
    arithmetically — length-prefix head word, per-byte sum over the
    generator formula (7w+11h+13i+5j mod 256), tail byte — so an
    off-by-one offset, a wrong stsc chunk walk, or a short slice
    cannot hash-match. Extraction shape = SURVEY §2.8's 1→N explode
    (lib/canparser.py:174-187) applied to media bytes."""
    docs = _t(spark, sf_dir, "documents")
    # cache: the synthesized media feeds BOTH the seek-table side and
    # the join (payload) side of extract_sample_payloads — without it
    # the expensive synthesize mapInPandas plan executes twice
    # (ADVICE r11); on a real corpus the parquet scan's cache plays
    # this role.
    media = mm.synthesize_mp4_media(docs).cache()
    seek = mm.mp4_sample_seek_table(media)
    wanted = seek.where(F.col("sample_index") % 3 == 0)
    out = mm.extract_sample_payloads(media, wanted)
    return out.select(
        "media_id", "sample_index", "size", "byte_sum", "head_u32", "tail_byte"
    )


@register(
    "mm_mp3_probe",
    """
    WITH g AS (
      SELECT doc_id,
             doc_id % 60 + 1 AS n,
             doc_id % 14 + 1 AS bi,
             doc_id % 3 AS ri,
             doc_id % 4 AS pe,
             CASE doc_id % 2 WHEN 1 THEN 'mono' ELSE 'stereo' END
               AS channel_mode
      FROM documents),
    b AS (
      SELECT g.*,
             CASE bi WHEN 1 THEN 32 WHEN 2 THEN 40 WHEN 3 THEN 48
                     WHEN 4 THEN 56 WHEN 5 THEN 64 WHEN 6 THEN 80
                     WHEN 7 THEN 96 WHEN 8 THEN 112 WHEN 9 THEN 128
                     WHEN 10 THEN 160 WHEN 11 THEN 192 WHEN 12 THEN 224
                     WHEN 13 THEN 256 ELSE 320 END AS kbps,
             CASE ri WHEN 0 THEN 44100 WHEN 1 THEN 48000 ELSE 32000 END
               AS rate
      FROM g)
    SELECT doc_id AS media_id, n::BIGINT AS n_frames,
           (1152 * n)::BIGINT AS total_samples,
           rate::BIGINT AS rate_hz,
           3::BIGINT AS layer, channel_mode,
           (1152 * n * 1000000 // rate)::BIGINT AS duration_ms_x1000,
           kbps::BIGINT AS bitrate_min_kbps,
           kbps::BIGINT AS bitrate_max_kbps,
           (kbps * 1000)::BIGINT AS bitrate_mean_kbps_x1000,
           TRUE AS is_cbr,
           (n * (144000 * kbps // rate)
            + CASE WHEN pe > 0 THEN (n + pe - 1) // pe ELSE 0 END)::BIGINT
             AS audio_bytes
    FROM b
    """,
)
def mm_mp3_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-audio probe (operators/mp3.py): each document id
    becomes a spec-exact MPEG-1 Layer III frame stream (true 4-byte
    headers cycling the full bitrate table and all three sample rates,
    padding bits on a per-id period, ID3v2 prefixes on 4 of 5 ids),
    walked back frame-by-frame under Arrow mapInPandas. The oracle
    recomputes every probed column ARITHMETICALLY — the frame-length
    recurrence 144000·kbps//rate + padding, 1152 samples/frame, exact
    duration — so a wrong bitrate table entry, padding step, or ID3v2
    synchsafe skip cannot hash-match."""
    docs = _t(spark, sf_dir, "documents")
    media = mm.synthesize_mp3_media(docs)
    return mm.probe_mp3_stats(media)


@register(
    "pipeline_media_curation",
    """
    WITH g AS (
      SELECT doc_id,
             doc_id % 3 AS kind,
             ((doc_id // 15) % 64) * 3 + doc_id % 3 AS seed
      FROM documents
      WHERE doc_id % 7 <> 3),
    d AS (
      SELECT kind, seed, MIN(doc_id) AS media_id
      FROM g GROUP BY kind, seed),
    u0 AS (
      SELECT d.media_id, d.kind, d.seed, d.seed % 24 + 1 AS n_units
      FROM d WHERE d.kind = 0),
    u0b AS (
      SELECT u0.media_id, u0.kind, u0.n_units,
             SUM(50 + (7*u0.seed + 13*i.i) % 100) AS unit_bytes
      FROM u0, generate_series(0, 23) i(i)
      WHERE i.i < u0.n_units
      GROUP BY u0.media_id, u0.kind, u0.n_units),
    u1 AS (
      SELECT d.media_id, d.kind, d.seed,
             d.seed % 20 + 1 AS n_units,
             d.seed % 6 + 2 AS key_every
      FROM d WHERE d.kind = 1),
    u1b AS (
      SELECT u1.media_id, u1.kind, u1.n_units,
             SUM(CASE WHEN i.i % u1.key_every = 0 THEN 9 ELSE 5 END
                 + 30 + (3*u1.seed + 17*i.i) % 80) AS unit_bytes
      FROM u1, generate_series(0, 19) i(i)
      WHERE i.i < u1.n_units
      GROUP BY u1.media_id, u1.kind, u1.n_units),
    u2 AS (
      SELECT d.media_id, d.kind,
             d.seed % 60 + 1 AS n,
             d.seed % 14 + 1 AS bi,
             d.seed % 3 AS ri,
             d.seed % 4 AS pe
      FROM d WHERE d.kind = 2),
    u2b AS (
      SELECT media_id, kind, n AS n_units,
             n * (144000 * kbps // rate)
               + CASE WHEN pe > 0 THEN (n + pe - 1) // pe ELSE 0 END
               AS unit_bytes
      FROM (SELECT u2.*,
              CASE bi WHEN 1 THEN 32 WHEN 2 THEN 40 WHEN 3 THEN 48
                      WHEN 4 THEN 56 WHEN 5 THEN 64 WHEN 6 THEN 80
                      WHEN 7 THEN 96 WHEN 8 THEN 112 WHEN 9 THEN 128
                      WHEN 10 THEN 160 WHEN 11 THEN 192 WHEN 12 THEN 224
                      WHEN 13 THEN 256 ELSE 320 END AS kbps,
              CASE ri WHEN 0 THEN 44100 WHEN 1 THEN 48000 ELSE 32000 END
                AS rate
            FROM u2) q),
    allu AS (
      SELECT media_id, kind, n_units, unit_bytes FROM u0b
      UNION ALL SELECT media_id, kind, n_units, unit_bytes FROM u1b
      UNION ALL SELECT media_id, kind, n_units, unit_bytes FROM u2b)
    SELECT media_id, kind::BIGINT AS kind,
           n_units::BIGINT AS n_units, unit_bytes::BIGINT AS unit_bytes
    FROM allu
    WHERE (('0x' || substr(md5('mc' || media_id::VARCHAR), 1, 8))::BIGINT
            % 10000)
          < CASE kind WHEN 0 THEN 8000 WHEN 1 THEN 6000 ELSE 4000 END
    """,
)
def pipeline_media_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media-curation composition — the multimodal twin of
    pipeline_curation, proving the probe lane composes with the dedup
    and sampling operators: a mixed MP4/IVF/MP3 corpus (with planted
    byte-identical duplicate groups AND corrupted files) flows through
    (1) format-dispatching tolerant probe — the probers' clean-
    ValueError contract becomes the corrupt-file-rejection filter,
    (2) exact content dedup on sha256(payload) keeping the lowest id,
    (3) per-format stratified hash sampling (80/60/40% for video/VP9/
    audio) — every stage the already-verified operator. The corpus
    bytes cross the plan ONCE (digest computed inside the probe pass);
    dedup shuffles 70-byte digest rows, never payloads; the sample is
    a pure scan-stage expression. The oracle reconstructs the whole
    pipeline arithmetically from the generator formulas: rejection set
    = ids % 7 == 3 (zeroed magic bytes), duplicate groups = the seed
    classes (seeds bounded below the generator-formula lcm, so
    seed-equality IS payload-equality), per-format unit counts/bytes,
    and the identical md5 sampling buckets."""
    docs = _t(spark, sf_dir, "documents")
    raw = mm.synthesize_mixed_media(docs)
    probed = mm.probe_media_tolerant(raw)
    ok = probed.where(F.col("ok"))
    # exact content dedup: every non-key column is constant within a
    # digest group (identical payloads), so min() selects the
    # representative's values without a second join back
    reps = ok.groupBy("digest").agg(
        F.min("media_id").alias("media_id"),
        F.min("kind").alias("kind"),
        F.min("n_units").alias("n_units"),
        F.min("unit_bytes").alias("unit_bytes"),
    )
    sampled = sp.weighted_mix(
        reps.withColumn("kind_s", F.col("kind").cast("string")),
        "kind_s",
        "media_id",
        {"0": 0.8, "1": 0.6, "2": 0.4},
        salt="mc",
    )
    return sampled.select("media_id", "kind", "n_units", "unit_bytes")


_H264_SUM_ORACLE = """
    WITH g AS (
      SELECT doc_id,
             16*(doc_id % 2 + 1) - 2*(doc_id % 6) AS w,
             16*(doc_id % 2 + 1) - 2*(doc_id % 4) AS h,
             doc_id % 2 + 1 AS n_frames,
             doc_id % 3 AS lane
      FROM documents),
    f AS (SELECT g.*, fi.fi FROM g, generate_series(0, 1) fi(fi)
          WHERE fi.fi < g.n_frames),
    -- lane 0: dense per-pixel pattern, summed cell by cell
    l0y AS (
      SELECT f.doc_id, SUM((7*f.doc_id + 13*r.r + 5*c.c + 3*f.fi) % 256)
               AS s
      FROM f, generate_series(0, 31) r(r), generate_series(0, 31) c(c)
      WHERE f.lane = 0 AND r.r < f.h AND c.c < f.w
      GROUP BY f.doc_id),
    l0cb AS (
      SELECT f.doc_id, SUM((11*f.doc_id + 7*r.r + 3*c.c + 5*f.fi) % 256)
               AS s
      FROM f, generate_series(0, 15) r(r), generate_series(0, 15) c(c)
      WHERE f.lane = 0 AND r.r < f.h // 2 AND c.c < f.w // 2
      GROUP BY f.doc_id),
    l0cr AS (
      SELECT f.doc_id, SUM((5*f.doc_id + 3*r.r + 11*c.c + 7*f.fi) % 256)
               AS s
      FROM f, generate_series(0, 15) r(r), generate_series(0, 15) c(c)
      WHERE f.lane = 0 AND r.r < f.h // 2 AND c.c < f.w // 2
      GROUP BY f.doc_id),
    -- lane 1: constant frames
    l1 AS (
      SELECT f.doc_id,
             SUM(((3*f.doc_id + 11*f.fi) % 256) * f.h * f.w) AS ys,
             SUM(((5*f.doc_id + 7*f.fi) % 256) * (f.h//2) * (f.w//2)) AS cbs,
             SUM(((7*f.doc_id + 13*f.fi) % 256) * (f.h//2) * (f.w//2)) AS crs
      FROM f WHERE f.lane = 1 GROUP BY f.doc_id),
    -- lane 2: column stripes (constant along rows)
    l2y AS (
      SELECT f.doc_id, SUM(f.h * ((11*f.doc_id + 29*c.c + 7*f.fi) % 256))
               AS s
      FROM f, generate_series(0, 31) c(c)
      WHERE f.lane = 2 AND c.c < f.w
      GROUP BY f.doc_id),
    l2cb AS (
      SELECT f.doc_id,
             SUM((f.h//2) * ((13*f.doc_id + 17*c.c + 3*f.fi) % 256)) AS s
      FROM f, generate_series(0, 15) c(c)
      WHERE f.lane = 2 AND c.c < f.w // 2
      GROUP BY f.doc_id),
    l2cr AS (
      SELECT f.doc_id,
             SUM((f.h//2) * ((17*f.doc_id + 23*c.c + 11*f.fi) % 256)) AS s
      FROM f, generate_series(0, 15) c(c)
      WHERE f.lane = 2 AND c.c < f.w // 2
      GROUP BY f.doc_id)
    SELECT g.doc_id AS media_id,
           g.w::BIGINT AS width, g.h::BIGINT AS height,
           g.n_frames::BIGINT AS n_frames,
           (((g.w+15)//16) * ((g.h+15)//16) * g.n_frames)::BIGINT AS n_mb,
           (CASE g.lane WHEN 0 THEN l0y.s WHEN 1 THEN l1.ys ELSE l2y.s
            END)::BIGINT AS y_sum,
           (CASE g.lane WHEN 0 THEN l0cb.s WHEN 1 THEN l1.cbs ELSE l2cb.s
            END)::BIGINT AS cb_sum,
           (CASE g.lane WHEN 0 THEN l0cr.s WHEN 1 THEN l1.crs ELSE l2cr.s
            END)::BIGINT AS cr_sum
    FROM g
    LEFT JOIN l0y USING (doc_id) LEFT JOIN l0cb USING (doc_id)
    LEFT JOIN l0cr USING (doc_id) LEFT JOIN l1 USING (doc_id)
    LEFT JOIN l2y USING (doc_id) LEFT JOIN l2cb USING (doc_id)
    LEFT JOIN l2cr USING (doc_id)
    """


@register(
    "mm_h264_decode",
    _H264_SUM_ORACLE,
)
def mm_h264_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL H.264 PIXEL decode (operators/h264.py — round 11): each
    document id becomes a genuine Annex-B Baseline intra stream (real
    SPS/PPS, IDR slice headers, I_PCM + the full Intra_4x4/16x16/chroma
    prediction machinery of §8.3, zero-residual CAVLC, deblocking off),
    decoded back pixel-by-pixel inside Arrow mapInPandas. The encoder
    keeps a predicted macroblock only when its prediction is BIT-EXACT
    (pcm_mae=0) and ships lossless I_PCM otherwise, so the decoded
    planes equal the generator formulas exactly and the oracle
    recomputes every pixel sum ARITHMETICALLY — a wrong prediction
    formula, neighbor-availability rule, z-scan order, or PCM
    alignment cannot hash-match. Three content lanes steer the mode
    mix: dense (all-PCM), constant (DC/V/H propagation), column
    stripes (Vertical propagation)."""
    docs = _t(spark, sf_dir, "documents")
    media = mm.synthesize_h264_idr_media(docs)
    return mm.decode_h264_stats(media)


@register(
    "mm_mp4_pixels",
    _H264_SUM_ORACLE,
)
def mm_mp4_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Container-to-pixels — the probe lane fully closed (round 11):
    each document id becomes an MP4 whose samples are REAL coded H.264
    IDR pictures (the intra encoder's NALs packaged length-prefixed,
    its SPS/PPS in the avcC record), then decoded back container-first
    inside Arrow mapInPandas: box walk -> avcC parameter sets -> stsc/
    stsz/stco/stts seek table -> per-sample NAL unpack (the identical
    byte ranges mm_mp4_extract slices) -> full intra pixel decode.
    Content lanes and generator formulas are shared with
    mm_h264_decode, so the SAME arithmetic pixel-sum oracle verifies
    the in-container path — a wrong chunk offset, avcC length size, or
    NAL framing cannot hash-match. Map-only plan: zero shuffles."""
    docs = _t(spark, sf_dir, "documents")
    media = mm.synthesize_h264_mp4_media(docs)
    return mm.decode_mp4_h264_stats(media)


@register(
    "mm_fmp4_extract",
    """
    WITH g AS (
      SELECT doc_id,
             doc_id % 4 + 1 AS n_frags,
             doc_id % 40 + 10 AS delta,
             16*(doc_id % 8 + 1) - 2*(doc_id % 8) AS w,
             16*(doc_id % 6 + 1) - 2*(doc_id % 5) AS h
      FROM documents),
    fr AS (
      SELECT g.doc_id, g.delta, g.w, g.h, f.f,
             (g.doc_id + f.f) % 6 + 1 AS cnt
      FROM g, generate_series(0, 3) f(f)
      WHERE f.f < g.n_frags),
    fr2 AS (
      SELECT doc_id, delta, w, h, f, cnt,
             COALESCE(SUM(cnt) OVER (PARTITION BY doc_id ORDER BY f
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS start_i
      FROM fr),
    s AS (
      SELECT fr2.doc_id, fr2.w, fr2.h,
             fr2.start_i + j.j AS gi,
             -- content time index: delta*(samples before the fragment)
             -- + within-fragment index (encode_fmp4's base_time walk)
             fr2.delta * fr2.start_i + j.j AS k,
             50 + (7*fr2.doc_id + 13*(fr2.start_i + j.j)) % 100 AS sz
      FROM fr2, generate_series(0, 5) j(j)
      WHERE j.j < fr2.cnt),
    sel AS (SELECT * FROM s WHERE gi % 2 = 0),
    body AS (
      SELECT sel.doc_id, sel.gi,
             SUM((7*sel.w + 11*sel.h + 13*sel.k + 5*jj.jj) % 256) AS body_sum
      FROM sel, generate_series(0, 148) jj(jj)
      WHERE jj.jj < sel.sz - 5
      GROUP BY sel.doc_id, sel.gi)
    SELECT sel.doc_id AS media_id, sel.gi::BIGINT AS sample_index,
           sel.sz::BIGINT AS size,
           (sel.sz - 4 + 101 + b.body_sum)::BIGINT AS byte_sum,
           (sel.sz - 4)::BIGINT AS head_u32,
           ((7*sel.w + 11*sel.h + 13*sel.k + 5*(sel.sz - 6)) % 256)::BIGINT
             AS tail_byte
    FROM sel JOIN body b ON sel.doc_id = b.doc_id AND sel.gi = b.gi
    """,
)
def mm_fmp4_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranged-GET extraction over FRAGMENTED MP4s (CMAF/DASH — the
    shape streaming video actually arrives in): the absolute-offset
    fragment seek table (mp4.fragment_index via
    multimodal.fmp4_sample_seek_table) drives the identical
    extract_sample_payloads path as the flat-MP4 row, pulling every
    2nd sample. The oracle recomputes the FULL content of every
    extracted sample arithmetically — the length-prefix head word, the
    per-byte sum over encode_fmp4's generator (whose time index walks
    base_time = delta x samples-before-fragment, so a wrong moof data
    offset or trun walk shifts k and cannot hash-match), and the tail
    byte."""
    docs = _t(spark, sf_dir, "documents")
    # cached for the same two-consumer reason as mm_mp4_extract
    media = mm.synthesize_fmp4_media(docs).cache()
    seek = mm.fmp4_sample_seek_table(media)
    wanted = seek.where(F.col("sample_index") % 2 == 0)
    out = mm.extract_sample_payloads(media, wanted)
    return out.select(
        "media_id", "sample_index", "size", "byte_sum", "head_u32", "tail_byte"
    )


@register(
    "mm_phash_near_dup",
    """
    WITH g AS (
      SELECT doc_id AS media_id, doc_id // 4 AS grp, doc_id % 4 AS v
      FROM documents),
    cells AS (
      SELECT media_id, cx.i AS cx, cy.j AS cy,
             CASE WHEN v = 3 AND cy.j = grp % 7 AND cx.i = grp % 10
                  THEN ((grp*37 + cx.i*53 + cy.j*71
                         + ((cx.i + grp) % 13) * ((cy.j + grp) % 11) * 5)
                        % 256 + 97) % 256
                  ELSE (grp*37 + cx.i*53 + cy.j*71
                        + ((cx.i + grp) % 13) * ((cy.j + grp) % 11) * 5) % 256
             END AS val
      FROM g, generate_series(0, 9) cx(i), generate_series(0, 6) cy(j)),
    bits AS (
      SELECT a.media_id, (a.cy * 9 + a.cx)::BIGINT AS k,
             CASE WHEN b.val > a.val THEN 1 ELSE 0 END AS bit
      FROM cells a JOIN cells b
        ON a.media_id = b.media_id AND a.cy = b.cy AND b.cx = a.cx + 1
      WHERE a.cx < 9),
    sig AS (
      SELECT media_id, SUM(bit::BIGINT << k)::BIGINT AS phash
      FROM bits GROUP BY media_id)
    SELECT a.media_id AS id_a, b.media_id AS id_b,
           bit_count(xor(a.phash, b.phash))::BIGINT AS hamming
    FROM sig a JOIN sig b ON a.media_id < b.media_id
    WHERE bit_count(xor(a.phash, b.phash)) <= 2
    """,
)
def mm_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-dup over DECODED pixels (operators/perceptual.py
    — VERDICT r11 item 2, the one missing LLM-curation operator): a PNG
    corpus with planted duplicate groups (byte-identical re-encode with
    different filters + Adam7 interlace, half-resolution resize, one
    light cell edit) flows decode → 63-bit dHash (average-pool grid,
    adjacent-cell comparisons) → the banded-Hamming join lifted from
    dedup.simhash_near_dup_pairs. Exact sha256 dedup catches NONE of
    these pairs — every planted variant re-encodes to different bytes —
    while the perceptual hash recovers all of them. The oracle
    recomputes the hash arithmetically from the cell-value generator
    (images are piecewise constant on the pooling grid, so decode →
    block-sum → compare equals the cell comparison exactly) and takes
    all pairs at Hamming <= 2; the Spark side's banded join returns the
    identical set by the pigeonhole guarantee (max_hamming < bands), so
    a recall gap anywhere hash-mismatches."""
    from solarboat_data_pipeline_spark.operators import perceptual as pc

    docs = _t(spark, sf_dir, "documents")
    media = pc.synthesize_phash_media(docs)
    return pc.phash_near_dup_pairs(media, max_hamming=2, bands=3)


def _media_feature_cte() -> str:
    """DuckDB CTE producing the decoded-pixel feature vectors of the
    perceptual corpus arithmetically: images are piecewise constant on
    the 10×7 pooling grid, so the exact average-pool in
    perceptual.pooled_cell_features equals the cell-value generator —
    the same formula the mm_phash_near_dup oracle mirrors — flattened
    row-major into a 70-dim DOUBLE list named ``emb``."""
    return """
    WITH g AS (
      SELECT doc_id AS vec_id, doc_id // 4 AS grp, doc_id % 4 AS v
      FROM documents),
    cells AS (
      SELECT vec_id, cx.i AS cx, cy.j AS cy,
             CASE WHEN v = 3 AND cy.j = grp % 7 AND cx.i = grp % 10
                  THEN ((grp*37 + cx.i*53 + cy.j*71
                         + ((cx.i + grp) % 13) * ((cy.j + grp) % 11) * 5)
                        % 256 + 97) % 256
                  ELSE (grp*37 + cx.i*53 + cy.j*71
                        + ((cx.i + grp) % 13) * ((cy.j + grp) % 11) * 5) % 256
             END AS val
      FROM g, generate_series(0, 9) cx(i), generate_series(0, 6) cy(j)),
    e AS (
      SELECT vec_id, list(val::DOUBLE ORDER BY cy, cx) AS emb
      FROM cells GROUP BY vec_id),
    """


def _register_media_retrieval():
    from solarboat_data_pipeline_spark.driver.similarity import _sql_ivf_trained

    oracle = _sql_ivf_trained(
        dim=70, iters=2, n_cent=16, nprobe=2, k=5,
        source_cte=_media_feature_cte(),
    )

    @register("pipeline_media_retrieval", oracle)
    def pipeline_media_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Media→ANN retrieval composition (VERDICT r11 item 3 — the
        proof the decode lane and the similarity lane compose): PNG
        corpus → real decode → exact average-pool feature vectors
        (perceptual.pooled_cell_features, the embedding-column
        contract) → TRAINED IVF index persisted partitioned-by-cell
        (similarity.build_ivf_index, 2 Lloyd iterations with the
        bit-deterministic fixed-point mean) → ivf_topk_indexed probes
        with dynamic partition pruning at the cell scan (asserted in
        tests/test_perceptual.py). The oracle replays EVERYTHING
        arithmetically: feature extraction from the cell-value
        generator, seed→assign→mean→assign→mean training, the nprobe=2
        cell probe, and the exact cosine re-rank — so a wrong decode,
        pooling, training round, or pruned-cell set cannot hash-match.
        Reference anchor: E3's enrich-then-query shape
        (main_2022.py:89-156)."""
        from solarboat_data_pipeline_spark.operators import perceptual as pc
        from solarboat_data_pipeline_spark.operators import similarity as sim_ops
        from solarboat_data_pipeline_spark.driver._registry import _io_dir

        docs = _t(spark, sf_dir, "documents")
        media = pc.synthesize_phash_media(docs)
        # cache: k-means training scans the feature table once per
        # Lloyd iteration plus the final assignment and the query
        # lookup — without the cache every scan re-synthesizes and
        # re-decodes the PNG corpus (measured 12.9 s → ~4 s at sf0.1);
        # on a real corpus the features would be a persisted table
        feats = pc.pooled_cell_features(media).cache()
        idx = _io_dir(sf_dir, "media_ivf_index")
        sim_ops.build_ivf_index(feats, idx, n_centroids=16, train_iters=2)
        qv = feats.where(F.col("vec_id") < 10)
        out = sim_ops.ivf_topk_indexed(spark, idx, qv, k=5, nprobe=2)
        return out.select(
            "query_id", "neighbor_id", "cosine_sim",
            F.col("rank").cast("long").alias("rank"),
        )


_register_media_retrieval()


# Shared oracle fragment: the perceptual corpus's 63-bit dHash per
# image, computed arithmetically from the cell-value generator (the
# same formula mm_phash_near_dup inlines; images are piecewise constant
# on the pooling grid so decode → block-sum → compare == cell compare).
_PHASH_SIG_CTE = """
    g AS (
      SELECT doc_id AS media_id, doc_id // 4 AS grp, doc_id % 4 AS v
      FROM documents),
    cells AS (
      SELECT media_id, cx.i AS cx, cy.j AS cy,
             CASE WHEN v = 3 AND cy.j = grp % 7 AND cx.i = grp % 10
                  THEN ((grp*37 + cx.i*53 + cy.j*71
                         + ((cx.i + grp) % 13) * ((cy.j + grp) % 11) * 5)
                        % 256 + 97) % 256
                  ELSE (grp*37 + cx.i*53 + cy.j*71
                        + ((cx.i + grp) % 13) * ((cy.j + grp) % 11) * 5) % 256
             END AS val
      FROM g, generate_series(0, 9) cx(i), generate_series(0, 6) cy(j)),
    bits AS (
      SELECT a.media_id, (a.cy * 9 + a.cx)::BIGINT AS k,
             CASE WHEN b.val > a.val THEN 1 ELSE 0 END AS bit
      FROM cells a JOIN cells b
        ON a.media_id = b.media_id AND a.cy = b.cy AND b.cx = a.cx + 1
      WHERE a.cx < 9),
    sig AS (
      SELECT media_id, SUM(bit::BIGINT << k)::BIGINT AS phash
      FROM bits GROUP BY media_id)
"""


@register(
    "mm_phash_clusters",
    f"""
    WITH RECURSIVE {_PHASH_SIG_CTE},
    pairs AS (
      SELECT a.media_id AS id_a, b.media_id AS id_b
      FROM sig a JOIN sig b ON a.media_id < b.media_id
      WHERE bit_count(xor(a.phash, b.phash)) <= 2),
    edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    reach(src, dst) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
    SELECT src AS media_id, min(dst)::BIGINT AS cluster_id
    FROM reach GROUP BY src
    """,
)
def mm_phash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual duplicate CLUSTERS — the dedup decision a curation
    pipeline actually ships (keep one representative per cluster):
    decode → dHash → banded Hamming pairs → the already-verified
    connected-components kernel (dedup.connected_components, min-label
    propagation with the union-find finish). cluster_id = the
    component's minimum media id, i.e. the canonical representative.
    The oracle replays pairs arithmetically and closes them with a
    recursive reachability CTE — exactly dd_clusters' shape over the
    perceptual edge set."""
    from solarboat_data_pipeline_spark.operators import dedup as dd
    from solarboat_data_pipeline_spark.operators import perceptual as pc

    docs = _t(spark, sf_dir, "documents")
    pairs = pc.phash_near_dup_pairs(pc.synthesize_phash_media(docs))
    out = dd.connected_components(pairs)
    return out.select(F.col("doc_id").alias("media_id"), "cluster_id")


@register(
    "mm_phash_incremental",
    f"""
    WITH {_PHASH_SIG_CTE}
    SELECT a.media_id AS inc_id, b.media_id AS seen_id,
           bit_count(xor(a.phash, b.phash))::BIGINT AS hamming
    FROM sig a JOIN sig b
      ON a.media_id % 5 = 0 AND b.media_id % 5 <> 0
    WHERE bit_count(xor(a.phash, b.phash)) <= 2
    """,
)
def mm_phash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental perceptual dedup against a PERSISTED index — the
    build-once/query-many shape at 100 TB: the corpus (ids % 5 != 0) is
    hashed ONCE into a band index written to parquet; the increment
    (ids % 5 == 0) is hashed and joined against the stored 32-byte
    index rows — corpus media never re-read, never re-hashed
    (perceptual.phash_band_index / phash_near_dup_against, the media
    twin of dd_near_dup_incremental). The oracle recomputes every
    (increment, corpus) pair at Hamming <= 2 from the cell generator —
    identical to the banded join by pigeonhole."""
    from solarboat_data_pipeline_spark.operators import perceptual as pc

    docs = _t(spark, sf_dir, "documents")
    corpus = pc.synthesize_phash_media(docs.where(F.col("doc_id") % 5 != 0))
    incoming = pc.synthesize_phash_media(docs.where(F.col("doc_id") % 5 == 0))
    idx_path = _io_dir(sf_dir, "phash_band_index")
    pc.phash_band_index(pc.dhash_table(corpus)).write.mode(
        "overwrite"
    ).parquet(idx_path)
    seen = spark.read.parquet(idx_path)
    return pc.phash_near_dup_against(incoming, seen)


@register(
    "aud_fingerprint_near_dup",
    """
    WITH g AS (
      SELECT doc_id AS media_id, doc_id // 4 AS grp, doc_id % 4 AS v
      FROM documents),
    p AS (SELECT media_id, grp, v, grp % 480 + 64 AS n FROM g),
    fr AS (
      SELECT p.media_id, p.n, i.i,
             ((37*i.i + 13*p.grp) % 4096 - 2048)
               * (CASE WHEN p.v IN (2, 3) THEN 2 ELSE 1 END)
               + (CASE WHEN p.v = 3 AND i.i = p.grp % p.n
                       THEN 1009 ELSE 0 END) AS fs
      FROM p, generate_series(0, 543) i(i)
      WHERE i.i < p.n),
    seg AS (
      SELECT fr.media_id, k.k, SUM(fr.fs) AS s
      FROM fr JOIN generate_series(0, 63) k(k)
        ON fr.i >= (k.k * fr.n) // 64 AND fr.i < ((k.k + 1) * fr.n) // 64
      GROUP BY fr.media_id, k.k),
    bits AS (
      SELECT a.media_id, a.k::BIGINT AS k,
             CASE WHEN b.s > a.s THEN 1 ELSE 0 END AS bit
      FROM seg a JOIN seg b ON a.media_id = b.media_id AND b.k = a.k + 1
      WHERE a.k < 63),
    sig AS (
      SELECT media_id, SUM(bit::BIGINT << k)::BIGINT AS afp
      FROM bits GROUP BY media_id)
    SELECT a.media_id AS id_a, b.media_id AS id_b,
           bit_count(xor(a.afp, b.afp))::BIGINT AS hamming
    FROM sig a JOIN sig b ON a.media_id < b.media_id
    WHERE bit_count(xor(a.afp, b.afp)) <= 2
    """,
)
def aud_fingerprint_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUDIO perceptual near-dup — the third modality on the SAME
    banded-Hamming join (text simhash, image dHash, now audio): real
    WAV decode → per-frame channel sum → 64 exact time segments → 63
    adjacent-segment comparisons (perceptual.audio_fingerprint_table).
    The planted groups re-encode each signal four byte-distinct ways —
    original, REMUXED behind an extra LIST chunk, STEREO-DUPLICATED,
    GAIN ×2 with one nudged sample — all invisible to sha256, all
    within Hamming 2 of the original (gain and channel duplication
    scale both sides of every comparison; the nudge flips at most the
    two comparisons touching its segment). The oracle recomputes the
    fingerprint arithmetically from the PCM generator formula — a
    wrong chunk walk, block-align, channel de-interleave, or segment
    boundary cannot hash-match."""
    from solarboat_data_pipeline_spark.operators import perceptual as pc

    docs = _t(spark, sf_dir, "documents")
    media = pc.synthesize_audio_dup_media(docs)
    return pc.audio_near_dup_pairs(media)


@register(
    "vid_fingerprint_near_dup",
    """
    WITH g AS (
      SELECT doc_id AS media_id, doc_id // 4 AS grp, doc_id % 4 AS v
      FROM documents),
    cells AS (
      SELECT media_id, cx.i AS cx, cy.j AS cy,
             CASE WHEN v = 3 AND cy.j = grp % 7 AND cx.i = grp % 10
                  THEN ((grp*37 + cx.i*53 + cy.j*71
                         + ((cx.i + grp) % 13) * ((cy.j + grp) % 11))
                        % 200 + 97) % 200
                  ELSE (grp*37 + cx.i*53 + cy.j*71
                        + ((cx.i + grp) % 13) * ((cy.j + grp) % 11)) % 200
             END AS val
      FROM g, generate_series(0, 9) cx(i), generate_series(0, 6) cy(j)),
    bits AS (
      SELECT a.media_id, (a.cy * 9 + a.cx)::BIGINT AS k,
             CASE WHEN b.val > a.val THEN 1 ELSE 0 END AS bit
      FROM cells a JOIN cells b
        ON a.media_id = b.media_id AND a.cy = b.cy AND b.cx = a.cx + 1
      WHERE a.cx < 9),
    sig AS (
      SELECT media_id, SUM(bit::BIGINT << k)::BIGINT AS vfp
      FROM bits GROUP BY media_id)
    SELECT a.media_id AS id_a, b.media_id AS id_b,
           bit_count(xor(a.vfp, b.vfp))::BIGINT AS hamming
    FROM sig a JOIN sig b ON a.media_id < b.media_id
    WHERE bit_count(xor(a.vfp, b.vfp)) <= 2
    """,
)
def vid_fingerprint_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VIDEO perceptual near-dup — the fourth signature type on the
    shared banded-Hamming join: real BI_RGB AVI decode → per-frame
    dHash (fixed-point luma) → MAJORITY fold across frames
    (perceptual.video_fingerprint_table). The planted groups re-encode
    each clip four byte-distinct ways — original (with a slow
    brightness fade across frames), FRAME-DROPPED (every 4th frame
    removed), RE-EXPOSED (+7 brightness everywhere), one-cell edit —
    and the fingerprint survives all of them by construction
    (brightness shifts preserve every pooled comparison; dropped
    frames share the survivors' hash so the majority is unchanged),
    while sha256 sees four unrelated files. The oracle recomputes the
    fingerprint arithmetically from the cell generator — frames are
    grid-constant gray RGB, so decode → luma → pool → compare equals
    the cell comparison exactly, per-frame offsets cancel, and the
    majority of identical per-frame hashes is that hash."""
    from solarboat_data_pipeline_spark.operators import perceptual as pc

    docs = _t(spark, sf_dir, "documents")
    media = pc.synthesize_video_dup_media(docs)
    return pc.video_near_dup_pairs(media)


def _register_phash_clusters_scaled():
    """mm_phash_clusters_scaled shares mm_phash_clusters' oracle
    VERBATIM (the house *_scaled convention: identical output, bounded
    work): the class-collapse form must produce row-identical
    clusters."""
    oracle = _REGISTRY["mm_phash_clusters"][1]

    @register("mm_phash_clusters_scaled", oracle)
    def mm_phash_clusters_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Duplicate-heavy-safe perceptual clusters
        (perceptual.phash_clusters_scaled): exact hash classes collapse
        FIRST (one linear aggregate), the banded join runs over
        DISTINCT hashes only, components cluster the representatives,
        and the rep→cluster map joins back over class membership — so a
        viral image with 10⁸ copies costs one aggregate row instead of
        5·10¹⁵ materialized pairs. Row-identical to mm_phash_clusters
        by construction (class rep = min id; min over reachable reps =
        min over reachable members); shares its recursive-reachability
        oracle verbatim."""
        from solarboat_data_pipeline_spark.operators import perceptual as pc

        docs = _t(spark, sf_dir, "documents")
        media = pc.synthesize_phash_media(docs)
        return pc.phash_clusters_scaled(media)


_register_phash_clusters_scaled()


# ---------------------------------------------------------------------------
# the real curation order: sha256 exact-collapse, THEN perceptual
# near-dup on the residue (VERDICT r12 #8)
# ---------------------------------------------------------------------------

_COPY_OFFSET = 1_000_000  # planted exact-byte-copy ids: doc_id + offset


@register(
    "pipeline_media_dedup",
    f"""
    WITH RECURSIVE {_PHASH_SIG_CTE},
    sig2 AS (
      -- planted exact byte copies: every v=0 original appears again
      -- under id+1e6 with IDENTICAL bytes, hence identical phash
      SELECT media_id, phash FROM sig
      UNION ALL
      SELECT media_id + {_COPY_OFFSET}, phash FROM sig WHERE media_id % 4 = 0),
    pairs AS (
      SELECT a.media_id AS id_a, b.media_id AS id_b
      FROM sig2 a JOIN sig2 b ON a.media_id < b.media_id
      WHERE bit_count(xor(a.phash, b.phash)) <= 2),
    edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    reach(src, dst) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
    SELECT src AS media_id, min(dst)::BIGINT AS cluster_id
    FROM reach GROUP BY src
    """,
)
def pipeline_media_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation order a 100 TB media sweep actually runs, as ONE
    gated artifact: (1) sha256 EXACT collapse — identical bytes are
    grouped by one linear hash pass and only one representative per
    byte-class survives, so the expensive decode+dHash pass downstream
    is paid per DISTINCT byte content, never per copy; (2) perceptual
    near-dup clustering over the residue representatives (decode →
    dHash → banded Hamming pairs → connected components); (3) the
    rep→cluster map joins back over the sha classes so every copy
    lands in its content's cluster. Corpus = the planted perceptual
    groups PLUS exact byte copies of every v=0 original (ids +1e6) —
    the sha stage provably collapses those (the perceptual stage never
    sees them) while the byte-distinct re-encode/resize/edit variants
    flow through to the perceptual stage. Output (media_id, cluster_id
    = min id of the duplicate class) is identical to clustering the
    full corpus perceptually — proven by the shared-shape oracle —
    but the decode work is bounded by distinct contents.
    Reference anchor: none (LLM-curation lane; SURVEY §6)."""
    from solarboat_data_pipeline_spark.operators import dedup as dd
    from solarboat_data_pipeline_spark.operators import perceptual as pc

    docs = _t(spark, sf_dir, "documents")
    # r14: materialize the synthesis once (lazy local checkpoint). The
    # copies branch filters ABOVE the opaque mapInPandas synthesis —
    # the predicate cannot push below it — so the un-cut union
    # re-encoded the full corpus a second time just to keep 1/4 of it
    # (measured: the sha stage's materialization halves).
    base = pc.synthesize_phash_media(docs).localCheckpoint(eager=False)
    copies = base.where(F.col("media_id") % 4 == 0).withColumn(
        "media_id", F.col("media_id") + _COPY_OFFSET
    )
    media = base.unionByName(copies)

    # stage 1: sha256 exact collapse — one linear pass over the bytes.
    # Materialized once (lazy local checkpoint): three consumers follow
    # (class aggregate, representative payload fetch, membership join),
    # and each would otherwise re-run the PNG synthesis + sha pass.
    hashed = media.select(
        "media_id", F.sha2(F.col("payload"), 256).alias("sha"), "payload"
    ).localCheckpoint(eager=False)
    # the class table is tiny (one 40-byte row per DISTINCT byte
    # content) but is read by BOTH the representative fetch and the
    # membership join — without a cut each re-aggregates over the
    # payload-laden checkpoint. Materialize it once (lazy).
    classes = hashed.groupBy("sha").agg(
        F.min("media_id").alias("rep_id"),
        F.count(F.lit(1)).alias("n_members"),
    ).localCheckpoint(eager=False)
    reps = classes.join(
        hashed.select(F.col("media_id").alias("rep_id"), "payload"), "rep_id"
    ).select(F.col("rep_id").alias("media_id"), "payload")

    # stage 2: perceptual clusters over the residue only
    rep_pairs = pc.phash_near_dup_pairs(reps)
    comp = dd.connected_components(rep_pairs).withColumnsRenamed(
        {"doc_id": "rep_id", "cluster_id": "rep_cluster"}
    )

    # stage 3: membership join back — every copy inherits its class rep's
    # perceptual cluster; classes with >= 2 members are duplicates even
    # without a perceptual neighbor
    membership = hashed.select("media_id", "sha").join(classes, "sha").join(
        comp, "rep_id", "left"
    )
    return (
        membership.where(
            (F.col("n_members") >= 2) | F.col("rep_cluster").isNotNull()
        )
        .select(
            "media_id",
            F.coalesce("rep_cluster", F.col("rep_id")).alias("cluster_id"),
        )
    )
