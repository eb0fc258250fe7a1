"""Perceptual (near-duplicate) MEDIA hashing — the media twin of the
text near-dup lane (VERDICT r11 item 2): re-encoded, resized, remuxed,
re-gained, or frame-dropped duplicates survive exact sha256 dedup, so
curation needs content-derived hashes that are INVARIANT under those
transforms plus a sub-quadratic Hamming join. Three modalities live
here — image dHash (:func:`dhash_table`, PNG/JPEG), audio energy hash
(:func:`audio_fingerprint_table`, WAV), video majority-fold
(:func:`video_fingerprint_table`, BI_RGB AVI + H.264-intra MP4) — all
emitting one signed-long signature consumed by the SAME
:func:`banded_hamming_pairs` join that also serves text simhash.

Operators here compose two already-verified lanes:

* the real pixel decoders (:mod:`png` and :mod:`jpeg`, dispatched by
  magic bytes in :func:`_decode_image`; the H.264 lane shares the same
  ``(width, height, channels, bytes)`` contract and slots in the same
  way), and
* the banded-Hamming pair machinery of
  :func:`dedup.simhash_near_dup_pairs`, generalized in
  :func:`banded_hamming_pairs` to ANY precomputed signed-long signature
  column (same pigeonhole recall guarantee, same (band, key) equi-join
  plan — sub-quadratic, 100 TB-shaped; no all-pairs join anywhere).

The hash is a 63-bit difference hash (dHash): decode → grayscale →
average-pool onto a ``(grid_w+1) × grid_h`` cell grid → one bit per
horizontally adjacent cell pair (``right > left``). 63 bits keeps the
signature in one signed long — the repo-wide simhash convention
(dedup.py) — and factors as 9 comparisons × 7 rows. Pooling compares
block SUMS (the image dimensions are required to be exact grid
multiples, so all blocks have equal area and the mean comparison is the
sum comparison, exactly, in integers): any resize that preserves the
cell structure — including the synthesizer's half-resolution variant —
yields the IDENTICAL hash, and any re-encode trivially does.

Reference anchor: the 1→N decode shape of lib/canparser.py:174-187
applied to image bytes; the pair-join shape is dedup.py's banded LSH.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from solarboat_data_pipeline_spark.operators import multimodal as _mm
from solarboat_data_pipeline_spark.operators import png as png_codec

DHASH_BITS = 63
DHASH_GRID_W = 9  # comparisons per row (grid has DHASH_GRID_W+1 columns)
DHASH_GRID_H = 7  # rows; 9 × 7 = 63 bits

DHASH_SCHEMA = "media_id long, phash long, width int, height int"


def _decode_image(data: bytes, mid: int) -> tuple[int, int, int, bytes]:
    """Magic-byte decode dispatch for the perceptual lane: PNG and
    baseline/progressive JPEG share the ``(w, h, channels, bytes)``
    pixel contract, so the hash is format-blind — exactly what lets it
    catch a JPEG re-encode of a PNG (tested within Hamming ≤ 2 of the
    lossless hash; sha256 dedup sees unrelated bytes)."""
    if data[:4] == b"\x89PNG"[:4]:
        return png_codec.decode_png(data)
    if data[:2] == b"\xff\xd8":
        from solarboat_data_pipeline_spark.operators import jpeg as jpeg_codec

        return jpeg_codec.decode_jpeg(data)
    raise ValueError(
        f"media {mid}: not a PNG or JPEG (leading bytes {data[:4]!r})"
    )


def dhash_table(df: DataFrame) -> DataFrame:
    """Per-image 63-bit difference hash from DECODED pixels.

    ``df`` is a media table (``media_id``, ``payload``) of PNG or JPEG
    bytes whose dimensions are exact multiples of the 10×7 pooling
    grid. Arrow ``mapInPandas``, map-only — the scale shape of the
    probe lane: payload bytes cross the plan once and never shuffle;
    only the 16-byte (id, hash) rows continue to the pair join."""
    import numpy as np

    gw, gh = DHASH_GRID_W, DHASH_GRID_H

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k.split()[0]: [] for k in DHASH_SCHEMA.split(",")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, ch, raw = _decode_image(bytes(payload), int(mid))
                px = np.frombuffer(raw, np.uint8).reshape(h, w, ch)
                # integer grayscale: mean over channels is exact for the
                # grayscale corpus (ch == 1); for RGB the ITU-R 601
                # luma would go here — kept integral via a fixed-point
                # (77R + 150G + 29B) >> 8 so the oracle stays exact
                if ch == 1:
                    gray = px[:, :, 0].astype(np.int64)
                else:
                    lum = (
                        77 * px[:, :, 0].astype(np.int64)
                        + 150 * px[:, :, 1].astype(np.int64)
                        + 29 * px[:, :, 2].astype(np.int64)
                    ) >> 8
                    gray = lum
                if w % (gw + 1) or h % gh:
                    raise ValueError(
                        f"image {int(mid)} is {w}x{h}, not a multiple of "
                        f"the {gw + 1}x{gh} dHash grid"
                    )
                bw, bh = w // (gw + 1), h // gh
                sums = gray.reshape(gh, bh, gw + 1, bw).sum(axis=(1, 3))
                bits = (sums[:, 1:] > sums[:, :-1]).astype(np.uint64)
                k = np.arange(gw, dtype=np.uint64)
                phash = 0
                for cy in range(gh):
                    phash |= int((bits[cy] << (k + cy * gw)).sum())
                rows["media_id"].append(int(mid))
                rows["phash"].append(phash)  # < 2**63: stays positive
                rows["width"].append(w)
                rows["height"].append(h)
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=DHASH_SCHEMA)


FEATURE_VEC_SCHEMA = "vec_id long, embedding array<double>"


def pooled_cell_features(df: DataFrame) -> DataFrame:
    """Decoded-pixel FEATURE VECTOR per image: average-pool the
    grayscale onto the module's 10×7 grid and flatten row-major into a
    70-dim ``array<double>`` — the embedding-column contract of the ANN
    lane (:mod:`similarity`), produced from media bytes instead of the
    embeddings fixture, so the two lanes compose into retrieval.

    The pooling means are EXACT (equal-area blocks, integer block sums
    divided by the block area — one float division per cell), so for a
    piecewise-grid-constant corpus the driver oracle replays the whole
    vector arithmetically. Same map-only Arrow shape as
    :func:`dhash_table`: media bytes never shuffle; 70 doubles per image
    continue into the index build."""
    import numpy as np

    gw, gh = PHASH_CELL_W, PHASH_CELL_H

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, vecs = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, ch, raw = png_codec.decode_png(bytes(payload))
                if ch != 1:
                    raise ValueError(
                        f"image {int(mid)}: pooled_cell_features expects "
                        f"grayscale, got {ch} channels"
                    )
                if w % gw or h % gh:
                    raise ValueError(
                        f"image {int(mid)} is {w}x{h}, not a multiple of "
                        f"the {gw}x{gh} feature grid"
                    )
                gray = np.frombuffer(raw, np.uint8).reshape(h, w).astype(np.int64)
                bw, bh = w // gw, h // gh
                sums = gray.reshape(gh, bh, gw, bw).sum(axis=(1, 3))
                ids.append(int(mid))
                vecs.append((sums / float(bw * bh)).ravel().tolist())
            yield pd.DataFrame({"vec_id": ids, "embedding": vecs})

    return df.mapInPandas(run, schema=FEATURE_VEC_SCHEMA)


def banded_hamming_pairs(
    sig: DataFrame,
    max_hamming: int = 2,
    sig_col: str = "phash",
    id_col: str = "media_id",
    bits: int = DHASH_BITS,
    bands: int = 3,
    bucket_cap: int | None = None,
) -> DataFrame:
    """Near-dup pairs over ANY precomputed signed-long signature column
    — a thin facade over :func:`dedup.banded_signature_pairs` (the
    banded-bucket join lifted out of its text-specific signature
    builder) with the media lane's defaults, so text simhash, image
    dHash, audio energy hash and video fold all ride the identical,
    already-scale-audited plan.

    The signature splits into ``bands`` contiguous bit-bands; a pair is
    a candidate when ANY band matches exactly ((band, key) equi-join —
    the only shuffle, over 24-byte rows), then exact Hamming
    (``bit_count(xor)``) filters to ``max_hamming``. Pigeonhole: with
    ``max_hamming < bands`` a qualifying pair differs in at most
    ``max_hamming`` bands, so at least one matches — recall is EXACT.

    ``bucket_cap`` guards against hot buckets — many DISTINCT-but-near
    signatures sharing one band key (near-black images at 10⁸ scale)
    otherwise make that bucket's self-join quadratic; capped buckets are
    excluded via a bounded broadcast anti-join and enumerated by
    :func:`banded_hot_buckets` (persist that table alongside the pairs —
    no silent truncation). Exact-COPY skew is a different failure mode,
    handled by :func:`phash_clusters_scaled`'s hash-class collapse.

    Returns ``(id_a, id_b, hamming)``, ``id_a < id_b``, band duplicates
    collapsed."""
    from solarboat_data_pipeline_spark.operators import dedup as _dd

    return _dd.banded_signature_pairs(
        sig, max_hamming, sig_col, id_col, bits, bands, bucket_cap
    )


def banded_hot_buckets(
    sig: DataFrame,
    bucket_cap: int,
    sig_col: str = "phash",
    id_col: str = "media_id",
    bits: int = DHASH_BITS,
    bands: int = 3,
) -> DataFrame:
    """Media-lane facade over :func:`dedup.banded_hot_buckets`: the
    (band, key, n) buckets holding more than ``bucket_cap`` signatures —
    exactly what a ``bucket_cap``-guarded :func:`banded_hamming_pairs`
    call dropped. ≤ N/bucket_cap rows by construction."""
    from solarboat_data_pipeline_spark.operators import dedup as _dd

    return _dd.banded_hot_buckets(sig, bucket_cap, sig_col, id_col, bits, bands)


def phash_band_index(
    sig: DataFrame,
    sig_col: str = "phash",
    id_col: str = "media_id",
    bits: int = DHASH_BITS,
    bands: int = 3,
) -> DataFrame:
    """The persistable index form of a signature table: one
    ``(media_id, phash, band, key)`` row per (image, band) — what a
    curation service writes once per corpus so later increments join
    against stored 32-byte rows instead of re-hashing media
    (:func:`phash_near_dup_against`; the perceptual twin of
    :func:`dedup.band_index`)."""
    if bits % bands:
        raise ValueError(f"bands ({bands}) must evenly divide bits ({bits})")
    w = bits // bands
    keys = [
        F.shiftright(sig_col, t * w).bitwiseAND(F.lit((1 << w) - 1)).cast("long")
        for t in range(bands)
    ]
    return sig.select(
        F.col(id_col).alias("media_id"),
        F.col(sig_col).alias("phash"),
        F.posexplode(F.array(*keys)).alias("band", "key"),
    )


def phash_near_dup_against(
    incoming: DataFrame,
    seen_index: DataFrame,
    max_hamming: int = 2,
    bits: int = DHASH_BITS,
    bands: int = 3,
    bucket_cap: int | None = None,
) -> DataFrame:
    """Incremental perceptual dedup — the media twin of
    :func:`dedup.near_dup_against`: new images that perceptually
    duplicate images ALREADY IN the corpus are found WITHOUT re-reading
    or re-hashing the corpus. ``incoming`` is a media table (hashed
    once here); ``seen_index`` is the corpus's persisted
    :func:`phash_band_index` (read back from parquet between
    increments). Candidates share ≥ 1 band (incoming×index equi-join —
    same pigeonhole-exact recall as the self-join for
    ``max_hamming < bands``), verified by exact ``bit_count``.

    ``bucket_cap`` is the incremental form of the self-join's hot-bucket
    guard: (band, key) buckets holding more than ``cap`` INDEX rows are
    anti-joined away before the candidate join (a hot index bucket ×
    every incoming row sharing that key is the quadratic-ish blowup
    here), bounding per-bucket candidate work at |incoming_bucket|·cap.
    Enumerate the drops with :func:`dedup.banded_hot_buckets` applied to
    the DISTINCT (media_id, phash) rows of the index — the same
    no-silent-truncation contract as :func:`banded_hamming_pairs`.
    Recall stays exact for every (incoming, seen) pair sharing at least
    one non-hot band.

    Returns ``(inc_id, seen_id, hamming)`` with ``hamming <=
    max_hamming``."""
    if not max_hamming < bands:
        raise ValueError(
            f"exact recall needs max_hamming ({max_hamming}) < bands ({bands})"
        )
    inc = phash_band_index(
        dhash_table(incoming), bits=bits, bands=bands
    ).select(
        F.col("media_id").alias("__inc_id"),
        F.col("phash").alias("__inc_sig"),
        "band",
        "key",
    )
    seen = seen_index.select(
        F.col("media_id").alias("__seen_id"),
        F.col("phash").alias("__seen_sig"),
        "band",
        "key",
    )
    if bucket_cap is not None:
        from solarboat_data_pipeline_spark.operators.dedup import _hot_buckets_over

        hot = _hot_buckets_over(seen, bucket_cap, ("band", "key")).select(
            "band", "key"
        )
        seen = seen.join(F.broadcast(hot), ["band", "key"], "left_anti")
    ham = F.bit_count(F.col("__inc_sig").bitwiseXOR(F.col("__seen_sig")))
    return (
        inc.join(seen, ["band", "key"])
        .select(
            F.col("__inc_id").alias("inc_id"),
            F.col("__seen_id").alias("seen_id"),
            ham.cast("long").alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def phash_near_dup_pairs(
    media: DataFrame, max_hamming: int = 2, bands: int = 3
) -> DataFrame:
    """Perceptual near-dup pairs over a PNG media table: decode →
    :func:`dhash_table` → :func:`banded_hamming_pairs`. The composition
    the curation pipeline was missing — re-encoded and resized
    duplicates land at Hamming 0, light edits within ``max_hamming``."""
    return banded_hamming_pairs(
        dhash_table(media), max_hamming=max_hamming, bands=bands
    )


# --- synthetic corpus with planted perceptual duplicates ---------------------

# Cell-value formula for the planted corpus: images are piecewise
# constant on the pooling grid, so the dHash is an exact arithmetic
# function of these cell values — the driver oracle recomputes it
# without seeing a byte. Groups of four consecutive ids share a group
# seed g = id // 4; the variant v = id % 4 plants the transforms
# perceptual dedup must survive:
#   v=0  original        40×28, filter 2
#   v=1  re-encoded      same pixels, cycling filters + Adam7 interlace
#   v=2  half-resolution 20×14 (cell structure preserved → same hash)
#   v=3  light edit      one grid cell's value shifted (+97 mod 256)
#        → flips at most the 2 comparisons touching that cell
PHASH_CELL_W = DHASH_GRID_W + 1  # 10
PHASH_CELL_H = DHASH_GRID_H  # 7


def _phash_cell(g: int, cx, cy):
    """Grid cell value — mirrored verbatim in the driver oracle SQL."""
    return (g * 37 + cx * 53 + cy * 71 + ((cx + g) % 13) * ((cy + g) % 11) * 5) % 256


def synthesize_phash_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Media table of genuine PNGs with PLANTED perceptual-duplicate
    groups per the module-level scheme; every payload is a real encode
    (:func:`png.encode_png`) so :func:`dhash_table` exercises the full
    decode path including all five scanline filters and Adam7."""
    import numpy as np

    src = _mm._id_source(df, id_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, widths, heights = [], [], []
            for mid in pdf["media_id"]:
                mid = int(mid)
                g, v = mid // 4, mid % 4
                cx = np.arange(PHASH_CELL_W, dtype=np.int64)[None, :]
                cy = np.arange(PHASH_CELL_H, dtype=np.int64)[:, None]
                cells = _phash_cell(g, cx, cy)
                if v == 3:
                    cells = cells.copy()
                    cells[g % PHASH_CELL_H, g % PHASH_CELL_W] = (
                        cells[g % PHASH_CELL_H, g % PHASH_CELL_W] + 97
                    ) % 256
                blk = 2 if v == 2 else 4
                px = np.repeat(np.repeat(cells, blk, axis=0), blk, axis=1)
                h, w = px.shape
                payloads.append(
                    png_codec.encode_png(
                        px.astype(np.uint8).tobytes(), w, h, 1,
                        filter_type="cycle" if v == 1 else v % 5,
                        interlace=(v == 1),
                    )
                )
                widths.append(w)
                heights.append(h)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "payload": payloads,
                    "media_type": "image/png",
                    "width": widths,
                    "height": heights,
                }
            )

    return src.mapInPandas(run, schema=_mm.MEDIA_SCHEMA)


# --- audio fingerprinting (round 12) -----------------------------------------
#
# The audio twin of the image dHash: real WAV decode → per-frame channel
# SUM → 64 equal time segments (exact integer floor boundaries
# ``floor(k·n/64)``) → one bit per adjacent-segment comparison
# (``seg[k+1] > seg[k]``, 63 bits, one signed long). Comparisons are
# invariant under POSITIVE GAIN (both sums scale), CHANNEL DUPLICATION
# (channel sum doubles), and REMUXING (same samples, different RIFF
# chunk layout) — the three byte-changing transforms audio dedup must
# survive while sha256 sees unrelated files. Pairs reuse
# :func:`banded_hamming_pairs` unchanged — the same banded join now
# serves text (simhash), image (dHash), and audio signatures.

AUDIO_FP_SEGMENTS = DHASH_BITS + 1  # 64 segments → 63 comparisons

AUDIO_FP_SCHEMA = "media_id long, afp long, n_frames int, channels int"


def audio_fingerprint_table(df: DataFrame) -> DataFrame:
    """Per-file 63-bit audio fingerprint from DECODED PCM. Map-only
    Arrow pass; audio bytes never shuffle — 16-byte (id, fingerprint)
    rows continue to the pair join."""
    import numpy as np

    from solarboat_data_pipeline_spark.operators import wav as wav_codec

    S = AUDIO_FP_SEGMENTS

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k.split()[0]: [] for k in AUDIO_FP_SCHEMA.split(",")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                rate, ch, bits, n, samples = wav_codec.decode_wav(
                    bytes(payload)
                )
                frame_sum = (
                    samples.astype(np.int64).reshape(n, ch).sum(axis=1)
                )
                edges = (np.arange(S + 1, dtype=np.int64) * n) // S
                segs = np.add.reduceat(frame_sum, edges[:-1])
                # reduceat yields frame_sum[e] for an empty [e, e) span;
                # force true zeros so short files hash deterministically
                segs[edges[:-1] == edges[1:]] = 0
                bits_arr = (segs[1:] > segs[:-1]).astype(np.uint64)
                afp = 0
                for k in range(S - 1):
                    afp |= int(bits_arr[k]) << k
                rows["media_id"].append(int(mid))
                rows["afp"].append(afp)
                rows["n_frames"].append(int(n))
                rows["channels"].append(int(ch))
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=AUDIO_FP_SCHEMA)


def audio_near_dup_pairs(
    media: DataFrame, max_hamming: int = 2, bands: int = 3
) -> DataFrame:
    """Audio near-dup pairs: decode → :func:`audio_fingerprint_table` →
    the SAME :func:`banded_hamming_pairs` join the image lane uses."""
    return banded_hamming_pairs(
        audio_fingerprint_table(media),
        max_hamming=max_hamming,
        sig_col="afp",
        bands=bands,
    )


def _audio_dup_samples(g: int, n: int):
    """Base mono PCM for duplicate group ``g`` — mirrored verbatim in
    the aud_fingerprint_near_dup oracle SQL."""
    import numpy as np

    i = np.arange(n, dtype=np.int64)
    return (37 * i + 13 * g) % 4096 - 2048


def synthesize_audio_dup_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """WAV corpus with PLANTED perceptual-duplicate groups: four
    byte-distinct variants per group seed ``g = id // 4``:

    * v=0 — original mono 16-bit PCM,
    * v=1 — REMUXED: identical samples behind an extra LIST chunk
      (the chunk walk skips it; sha256 does not),
    * v=2 — STEREO-DUPLICATED: both channels carry the mono signal,
    * v=3 — GAIN ×2 plus ONE sample nudged +1009 (flips at most the
      two comparisons touching that sample's segment).

    ``n = g % 480 + 64`` frames, so every one of the 64 segments is
    nonempty."""
    import numpy as np

    from solarboat_data_pipeline_spark.operators import wav as wav_codec

    src = _mm._id_source(df, id_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        for pdf in batches:
            payloads, ids = [], []
            for mid in pdf["media_id"]:
                mid = int(mid)
                g, v = mid // 4, mid % 4
                n = g % 480 + 64
                s = _audio_dup_samples(g, n)
                if v == 0:
                    data = wav_codec.encode_wav(s.astype("<i2"), 8000, 1)
                elif v == 1:
                    base = wav_codec.encode_wav(s.astype("<i2"), 8000, 1)
                    tag = b"INFO" + b"remuxed.".ljust(8, b"\x00")
                    chunk = b"LIST" + struct.pack("<I", len(tag)) + tag
                    data = (
                        base[:8] + base[8:12] + chunk + base[12:]
                    )
                    data = (
                        data[:4]
                        + struct.pack("<I", len(data) - 8)
                        + data[8:]
                    )
                elif v == 2:
                    stereo = np.repeat(s, 2)
                    data = wav_codec.encode_wav(stereo.astype("<i2"), 8000, 2)
                else:
                    s2 = s * 2
                    s2[g % n] += 1009
                    data = wav_codec.encode_wav(s2.astype("<i2"), 8000, 1)
                ids.append(mid)
                payloads.append(data)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "payload": payloads,
                    "media_type": "audio/wav",
                }
            )

    return src.mapInPandas(
        run, schema="media_id long, payload binary, media_type string"
    )


# --- video fingerprinting (round 12) ------------------------------------------
#
# The video twin: decode every frame (BI_RGB AVI — the lossless lane,
# so the oracle stays exact), dHash each frame with the image-lane
# pooling (fixed-point luma for RGB), then MAJORITY-FOLD the per-frame
# bit columns into one 63-bit signature (bit = 1 iff more than half the
# frames set it; ties break to 0). The fold makes the signature
# invariant under FRAME DROPS and TEMPORAL RESAMPLING whenever the
# per-frame hashes agree (static-scene videos, speed changes), and the
# underlying dHash makes every frame's hash invariant under uniform
# BRIGHTNESS SHIFTS (a constant added to all cells preserves every
# comparison) — re-exposure, the video transform exact dedup misses.
# Pairs reuse :func:`banded_hamming_pairs` — the fourth signature type
# on the same join.

VIDEO_FP_SCHEMA = "media_id long, vfp long, n_frames int, width int, height int"


def _decode_video_luma(data: bytes, mid: int):
    """Container dispatch for the video lane → ``(w, h, (n, h, w)
    int64 luma planes)``: BI_RGB AVI via the fixed-point ITU-R 601
    luma, or H.264-in-MP4 via the real intra pixel decoder
    (:func:`h264.decode_mp4` — the luma plane IS the decoded Y). A
    lossless (I_PCM) H.264 re-encode of a raw AVI therefore
    fingerprints IDENTICALLY — the cross-container duplicate exact
    dedup can never see."""
    import numpy as np

    from solarboat_data_pipeline_spark.operators import avi as avi_codec

    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        w, h, n, _fps, frames = avi_codec.decode_avi(data)
        lum = (
            77 * frames[:, :, :, 0].astype(np.int64)
            + 150 * frames[:, :, :, 1].astype(np.int64)
            + 29 * frames[:, :, :, 2].astype(np.int64)
        ) >> 8
        return w, h, lum
    if len(data) >= 8 and data[4:8] == b"ftyp":
        from solarboat_data_pipeline_spark.operators import h264 as h264_codec

        d = h264_codec.decode_mp4(data)
        lum = np.stack([f[0] for f in d["frames"]]).astype(np.int64)
        return d["width"], d["height"], lum
    raise ValueError(
        f"media {mid}: not a BI_RGB AVI or an MP4 (leading bytes "
        f"{data[:4]!r})"
    )


def video_fingerprint_table(df: DataFrame) -> DataFrame:
    """Per-video 63-bit fingerprint from DECODED frames (map-only Arrow
    pass; video bytes never shuffle). Containers dispatch by magic
    bytes (:func:`_decode_video_luma`: BI_RGB AVI, H.264-intra MP4)."""
    import numpy as np

    gw, gh = DHASH_GRID_W, DHASH_GRID_H

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k.split()[0]: [] for k in VIDEO_FP_SCHEMA.split(",")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, lum = _decode_video_luma(bytes(payload), int(mid))
                n = lum.shape[0]
                if w % (gw + 1) or h % gh:
                    raise ValueError(
                        f"video {int(mid)} is {w}x{h}, not a multiple of "
                        f"the {gw + 1}x{gh} dHash grid"
                    )
                bw, bh = w // (gw + 1), h // gh
                sums = lum.reshape(n, gh, bh, gw + 1, bw).sum(axis=(2, 4))
                bits = (sums[:, :, 1:] > sums[:, :, :-1])  # (n, gh, gw)
                majority = bits.sum(axis=0) * 2 > n  # ties -> 0
                vfp = 0
                for cy in range(gh):
                    for cx in range(gw):
                        vfp |= int(majority[cy, cx]) << (cy * gw + cx)
                rows["media_id"].append(int(mid))
                rows["vfp"].append(vfp)
                rows["n_frames"].append(int(n))
                rows["width"].append(int(w))
                rows["height"].append(int(h))
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=VIDEO_FP_SCHEMA)


def video_near_dup_pairs(
    media: DataFrame, max_hamming: int = 2, bands: int = 3
) -> DataFrame:
    """Video near-dup pairs on the shared banded join."""
    return banded_hamming_pairs(
        video_fingerprint_table(media),
        max_hamming=max_hamming,
        sig_col="vfp",
        bands=bands,
    )


def _video_dup_cells(g: int, cx, cy):
    """Base grid cell luma for video duplicate group ``g`` (bounded 199
    so per-frame brightness offsets never wrap) — mirrored verbatim in
    the vid_fingerprint_near_dup oracle SQL."""
    return (g * 37 + cx * 53 + cy * 71 + ((cx + g) % 13) * ((cy + g) % 11)) % 200


def synthesize_video_dup_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """BI_RGB AVI corpus with PLANTED perceptual-duplicate groups,
    ``g = id // 4``, ``v = id % 4``:

    * v=0 — original: ``k = g % 12 + 4`` frames, frame ``i`` = gray RGB
      of the base cells + brightness offset ``3·i`` (a slow fade; gray
      RGB makes the fixed-point luma EXACTLY the cell value),
    * v=1 — FRAME-DROPPED: every 4th frame removed (temporal resample),
    * v=2 — RE-EXPOSED: +7 brightness on every pixel of every frame,
    * v=3 — light edit: one grid cell's base value shifted (+97 mod
      200) in every frame → flips at most 2 comparisons.

    All four payloads are byte-distinct; v0/v1/v2 fingerprint
    IDENTICALLY (brightness shifts preserve comparisons; dropped frames
    share the surviving frames' hash so the majority is unchanged)."""
    import numpy as np

    from solarboat_data_pipeline_spark.operators import avi as avi_codec

    src = _mm._id_source(df, id_col)
    blk = 4
    W, H = PHASH_CELL_W * blk, PHASH_CELL_H * blk

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for mid in pdf["media_id"]:
                mid = int(mid)
                g, v = mid // 4, mid % 4
                k = g % 12 + 4
                cx = np.arange(PHASH_CELL_W, dtype=np.int64)[None, :]
                cy = np.arange(PHASH_CELL_H, dtype=np.int64)[:, None]
                cells = _video_dup_cells(g, cx, cy)
                if v == 3:
                    cells = cells.copy()
                    r, c = g % PHASH_CELL_H, g % PHASH_CELL_W
                    cells[r, c] = (cells[r, c] + 97) % 200
                plane = np.repeat(np.repeat(cells, blk, 0), blk, 1)
                frame_ids = [i for i in range(k) if v != 1 or i % 4 != 3]
                frames = np.stack(
                    [plane + 3 * i + (7 if v == 2 else 0) for i in frame_ids]
                ).astype(np.uint8)
                rgb = np.repeat(frames[:, :, :, None], 3, axis=3)
                ids.append(mid)
                payloads.append(avi_codec.encode_avi(rgb, fps=12, codec="rgb"))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "payload": payloads,
                    "media_type": "video/x-msvideo",
                }
            )

    return src.mapInPandas(
        run, schema="media_id long, payload binary, media_type string"
    )


def phash_clusters_scaled(
    media: DataFrame, max_hamming: int = 2, bands: int = 3
) -> DataFrame:
    """Duplicate-heavy-safe perceptual clusters — the scale twin of the
    pairs→components path (house convention: identical output, bounded
    per-class work).

    The naive path materializes every within-class pair: a corpus where
    one image occurs k times emits k(k-1)/2 Hamming-0 pairs — at 100 TB
    a viral meme with 10⁸ copies would emit 5·10¹⁵ pairs before
    clustering. This form COLLAPSES exact hash classes first (one
    linear hash aggregate; min id = class representative), runs the
    banded join over DISTINCT hashes only (sub-quadratic in classes,
    independent of duplicate multiplicity), clusters the
    representatives, and broadcasts the rep→cluster map back over the
    membership join. Work is linear in corpus size + quadratic only in
    near-identical DISTINCT contents — never in copy counts.

    Returns ``(media_id, cluster_id)`` for every media whose class has
    ≥ 2 members or whose class neighbors another within ``max_hamming``
    — row-identical to clustering :func:`phash_near_dup_pairs` output
    (the mm_phash_clusters semantics; shared oracle)."""
    from solarboat_data_pipeline_spark.operators import dedup as dd

    # the signature table feeds the class aggregate AND the membership
    # join; without a cut each consumer re-decodes the whole corpus.
    # 16 bytes/row materialized vs a second full decode pass.
    sig = (
        dhash_table(media)
        .select("media_id", "phash")
        .localCheckpoint(eager=False)
    )
    classes = sig.groupBy("phash").agg(
        F.min("media_id").alias("rep_id"),
        F.count(F.lit(1)).alias("n_members"),
    )
    rep_pairs = banded_hamming_pairs(
        classes.select(F.col("rep_id").alias("media_id"), "phash"),
        max_hamming=max_hamming,
        bands=bands,
    )
    comp = dd.connected_components(rep_pairs).withColumnsRenamed(
        {"doc_id": "rep_id", "cluster_id": "rep_cluster"}
    )
    membership = sig.join(classes, "phash").join(comp, "rep_id", "left")
    return (
        membership
        # a class is IN the output iff it has an internal pair (≥ 2
        # members) or its rep clustered with another class
        .where((F.col("n_members") >= 2) | F.col("rep_cluster").isNotNull())
        .select(
            "media_id",
            F.coalesce("rep_cluster", F.col("rep_id")).alias("cluster_id"),
        )
    )
