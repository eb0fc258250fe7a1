#!/usr/bin/env python
"""Multimodal curation pipeline over the engine's REAL media codecs —
everything through the public root API, no image/audio/video libraries.

For each document id the pipeline synthesizes a genuine PNG, a 16-bit
PCM WAV, and a Motion-JPEG AVI (in-repo stdlib codecs), then runs the
decode/resize/resample/frame-sample kernels inside Arrow
``mapInPandas``, joins the per-modality stats, scores the document
text with the built-in trained quality model, and writes one curated
parquet — the shape of a real training-data media-curation job.

    python examples/media_pipeline_spark.py --sf-dir /root/testdata/sf0.01
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="/tmp/media_out")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    import solarboat_data_pipeline_spark as sb

    spark = sb.get_spark(app_name="media-pipeline")
    docs = spark.read.parquet(os.path.join(args.sf_dir, "documents.parquet"))

    # image: real PNG decode + bilinear resize stats
    png_stats = sb.resize_image_stats(
        sb.multimodal.synthesize_png_media(docs), 8, 6, method="bilinear"
    ).select(
        "media_id",
        F.col("width").alias("img_w"),
        F.col("height").alias("img_h"),
        F.col("pixel_sum").alias("img_pixel_sum"),
    )

    # audio: real WAV decode + linear resample stats
    wav_stats = sb.resample_audio_stats(
        sb.multimodal.synthesize_wav_media(docs), 32, method="linear"
    ).select(
        "media_id",
        F.col("n_frames").alias("audio_frames"),
        F.col("sample_sum").alias("audio_sample_sum"),
    )

    # video: real MJPEG decode + fidelity gate, plus frame sampling on
    # the uncompressed twin
    mjpeg = sb.mjpeg_decode_check(
        sb.multimodal.synthesize_mjpeg_media(docs)
    ).select(
        "media_id",
        F.col("n_frames").alias("video_frames"),
        F.col("ok").alias("video_ok"),
    )
    frames = sb.sample_frame_stats(
        sb.multimodal.synthesize_avi_media(docs), every_k=2
    ).select("media_id", "sampled_frames")

    # text: the trained quality model (real inference, real keep gate)
    scored = sb.text.model_score(docs, fake=False).select(
        F.col("doc_id").alias("media_id"), "logit", "score", "keep"
    )

    curated = (
        png_stats.join(wav_stats, "media_id")
        .join(mjpeg, "media_id")
        .join(frames, "media_id")
        .join(scored, "media_id")
        .where(F.col("video_ok") & F.col("keep"))
    )
    out = os.path.join(args.out, "curated_media.parquet")
    sb.write_parquet(curated, out, mode="overwrite")

    got = spark.read.parquet(out)
    n = got.count()
    total = docs.count()
    bad_video = got.where(~F.col("video_ok")).count()
    print(
        f"curated {n}/{total} docs (model keep-gate + MJPEG fidelity); "
        f"videos failing fidelity in output: {bad_video} -> {out}"
    )
    assert n > 0 and bad_video == 0
    print("media_pipeline_spark: OK")


if __name__ == "__main__":
    main()
