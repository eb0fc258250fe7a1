"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video decode libraries are not available in this build
container, so the *decode kernels* are stubs — but the Spark-side contract
(schema, Arrow batch shape, partitioning, UDF signature) is real and
tested. Swap ``fake=True`` for an actual decoder (PIL/torchaudio/ffmpeg)
on a cluster that has it and nothing else changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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
    moments) standing in for a real decoder; ``fake=False`` raises
    ``NotImplementedError`` — the marked integration point for PIL /
    torchaudio / ffmpeg decoders.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decode requires PIL/torchaudio/ffmpeg; "
                    "not available in this container"
                )
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
    target dimensions attached, payloads re-emitted batch-wise. The pixel
    kernel is the stub — ``fake=True`` scales the BYTE STREAM
    proportionally to the area ratio (first ``min(len, len·target_area ÷
    source_area)`` bytes, ≥1), a deterministic SQL-mirrorable stand-in;
    ``fake=False`` raises ``NotImplementedError`` at the marked PIL/ffmpeg
    integration point. Output carries the md5 of the resized payload so
    correctness is hash-checkable without shipping the bytes around."""
    import hashlib

    area = target_width * target_height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image resize requires PIL/ffmpeg; "
                    "not available in this container"
                )
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
