"""Streaming pipeline parity: the readStream parse variant must produce the
same decoded rows as the batch path, and the watermarked windowed resample
must match the batch windowed mean."""

import math
import os

import pytest
from pyspark.sql import functions as F

from solarboat_data_pipeline_spark.catalog import CanCatalog
from solarboat_data_pipeline_spark.operators.parse import (
    decode_long,
    with_frame_meta,
    with_timestamp,
)
from solarboat_data_pipeline_spark.sources.candump import extract_frames, scan_candump
from solarboat_data_pipeline_spark.streaming import (
    stream_candump,
    stream_decode_long,
    stream_resample_mean,
    write_parquet_stream,
)

from tests.conftest import DATA_DIR

CORPUS = os.path.join(DATA_DIR, "sample.candump")
# file streams require a directory/glob, not a single file
CORPUS_GLOB = os.path.join(DATA_DIR, "*.candump")
MINI = os.path.join(DATA_DIR, "mini_can_ids.json")


@pytest.fixture(scope="module")
def catalog():
    return CanCatalog.load(MINI)


def _key(r):
    return (r["timestamp"], r["module_name"], r["topic_name"], r["byte_name"])


def test_stream_decode_matches_batch(spark, catalog, tmp_path):
    lines = stream_candump(spark, CORPUS_GLOB)
    decoded = stream_decode_long(lines, catalog)
    assert decoded.isStreaming

    out = str(tmp_path / "out.parquet")
    ckpt = str(tmp_path / "ckpt")
    q = write_parquet_stream(decoded, out, ckpt)
    q.awaitTermination(120)

    got = {_key(r): r["value"] for r in spark.read.parquet(out).collect()}

    batch = decode_long(
        with_frame_meta(with_timestamp(extract_frames(scan_candump(spark, CORPUS)))),
        catalog,
    )
    want = {_key(r): r["value"] for r in batch.collect()}

    assert got.keys() == want.keys()
    for k, v in want.items():
        assert math.isclose(got[k], v, rel_tol=1e-12), k


def test_stream_restart_is_idempotent(spark, catalog, tmp_path):
    # K5: re-running against the same checkpoint must not duplicate rows
    lines = stream_candump(spark, CORPUS_GLOB)
    decoded = stream_decode_long(lines, catalog)
    out = str(tmp_path / "out.parquet")
    ckpt = str(tmp_path / "ckpt")
    write_parquet_stream(decoded, out, ckpt).awaitTermination(120)
    n1 = spark.read.parquet(out).count()
    write_parquet_stream(
        stream_decode_long(stream_candump(spark, CORPUS_GLOB), catalog), out, ckpt
    ).awaitTermination(120)
    assert spark.read.parquet(out).count() == n1


def test_stream_resample_matches_batch_windows(spark, catalog, tmp_path):
    decoded = stream_decode_long(stream_candump(spark, CORPUS_GLOB), catalog)
    res = stream_resample_mean(decoded, 1.0, watermark="0 seconds")
    q = (
        res.writeStream.format("memory")
        .queryName("res_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["timestamp"], r["module_name"], r["topic_name"], r["byte_name"]): r["value"]
        for r in spark.sql("select * from res_stream").collect()
    }

    batch = decode_long(
        with_frame_meta(with_timestamp(extract_frames(scan_candump(spark, CORPUS)))),
        catalog,
    )
    want = {
        (r["w"]["start"], r["module_name"], r["topic_name"], r["byte_name"]): r["value"]
        for r in batch.groupBy(
            F.window("timestamp", "1 seconds").alias("w"),
            "module_name",
            "topic_name",
            "byte_name",
        )
        .agg(F.avg("value").alias("value"))
        .collect()
    }
    assert got.keys() == want.keys()
    for k, v in want.items():
        assert math.isclose(got[k], v, rel_tol=1e-12), k
