"""Cross-batch stateful forward fill: the value seen in micro-batch 1 must
fill nulls in micro-batch 2 (the reference's per-chunk interpolation cannot
do this — chunk boundaries leak gaps, SURVEY §2.7)."""

import os
import time

from pyspark.sql import functions as F

from solarboat_data_pipeline_spark.streaming.stateful import stream_ffill


def _write_batch(spark, path, rows):
    df = spark.createDataFrame(rows, "series string, epoch long, value double")
    df.select(
        "series", F.timestamp_seconds("epoch").alias("timestamp"), "value"
    ).coalesce(1).write.mode("overwrite").parquet(path)


def test_ffill_carries_state_across_microbatches(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    # batch 1: series a ends with 2.0; batch 2: series a starts with nulls
    _write_batch(
        spark,
        f"{src}/b1.parquet",
        [("a", 100, 1.0), ("a", 101, 2.0), ("b", 100, 9.0)],
    )
    time.sleep(1.1)  # file source orders batches by modification time
    _write_batch(
        spark,
        f"{src}/b2.parquet",
        [("a", 102, None), ("a", 103, 3.0), ("b", 102, None)],
    )

    schema = "series string, timestamp timestamp, value double"
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(
        f"{src}/*.parquet"
    )
    out = stream_ffill(stream, key_cols=("series",))
    q = (
        out.writeStream.format("memory")
        .queryName("ffill_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), 'stream did not finish in 120s'

    rows = {
        (r["series"], r["timestamp"].second % 10): (r["value"], r["filled"])
        for r in spark.sql("select * from ffill_stream").collect()
    }
    assert len(rows) == 6
    # within batch 1
    assert rows[("a", 0)] == (1.0, 1.0)
    assert rows[("a", 1)] == (2.0, 2.0)
    # batch 2 nulls fill from batch 1 state — the cross-chunk win
    assert rows[("a", 2)] == (None, 2.0)
    assert rows[("a", 3)] == (3.0, 3.0)
    assert rows[("b", 2)] == (None, 9.0)


def test_ffill_multi_chunk_group_sorts_globally(spark, tmp_path):
    """A key's micro-batch arrives as MULTIPLE Arrow chunks with no
    cross-chunk time ordering; the fill must sort the whole batch, not
    chunk-by-chunk (regression: scripts/stream_smoke.py found 45
    mis-filled straddling rows at 10 M events). Forcing 16-row Arrow
    chunks over an interleaved-time file makes every chunk span distant
    timestamps."""
    src = str(tmp_path / "src_chunks")
    os.makedirs(src)
    n = 400
    # interleaved write order: all even seqs, then all odd seqs — any
    # contiguous chunk mixes early and late timestamps
    order = list(range(0, n, 2)) + list(range(1, n, 2))
    rows = [
        ("a", 1000 + s, None if s % 5 == 2 else float(s)) for s in order
    ]
    _write_batch(spark, f"{src}/all.parquet", rows)

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16")
    try:
        schema = "series string, timestamp timestamp, value double"
        stream = spark.readStream.schema(schema).parquet(f"{src}/*.parquet")
        out = stream_ffill(stream, key_cols=("series",))
        q = (
            out.writeStream.format("memory")
            .queryName("ffill_chunks")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), 'stream did not finish in 120s'
        got = {
            int(r["timestamp"].timestamp()) - 1000: r["filled"]
            for r in spark.sql("select * from ffill_chunks").collect()
        }
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)

    assert len(got) == n
    for s in range(n):
        want = float(s - 1) if s % 5 == 2 else float(s)  # s=2 fills from s=1
        assert got[s] == want, (s, got[s], want)
