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


# --- stream_asof_backward ---------------------------------------------------


def _drain(df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish in 120s"
    return df.sparkSession.sql(f"select * from {name}")


def test_asof_matches_batch_kernel(spark, tmp_path):
    """Single-batch parity: the streaming as-of must equal the batch
    asof_join_backward on the same (multi-key, interleaved) fixture."""
    from solarboat_data_pipeline_spark.operators import timeseries as ts
    from solarboat_data_pipeline_spark.streaming.stateful import (
        stream_asof_backward,
    )

    rng_rows_l, rng_rows_r = [], []
    for k in ("a", "b", "c"):
        for i in range(40):
            t = (i * 37 + hash(k) % 11) % 500
            rng_rows_l.append((k, 1000 + t, float(i)))
        for i in range(25):
            t = (i * 53 + hash(k) % 7) % 500
            rng_rows_r.append((k, 1000 + t, float(100 + i)))
    src = str(tmp_path / "asrc")
    os.makedirs(src)
    _write_batch(spark, f"{src}/l.parquet", rng_rows_l)
    rdf = spark.createDataFrame(rng_rows_r, "series string, epoch long, ref double")
    rdf.select(
        "series", F.timestamp_seconds("epoch").alias("timestamp"), "ref"
    ).coalesce(1).write.mode("overwrite").parquet(f"{src}/r.parquet")

    schema_l = "series string, timestamp timestamp, value double"
    schema_r = "series string, timestamp timestamp, ref double"
    sl = spark.readStream.schema(schema_l).parquet(f"{src}/l.parquet")
    sr = spark.readStream.schema(schema_r).parquet(f"{src}/r.parquet")
    got = _drain(
        stream_asof_backward(sl, sr, key_cols=("series",), ts_col="timestamp"),
        "asof_parity",
    )
    bl = spark.read.parquet(f"{src}/l.parquet")
    br = spark.read.parquet(f"{src}/r.parquet")
    expect = ts.asof_join_backward(
        bl, br, on="timestamp", value_cols=["ref"], partition_cols=("series",)
    )
    g = sorted(map(tuple, got.collect()))
    e = sorted(map(tuple, expect.select(*got.columns).collect()))
    assert g == e
    assert len(g) == len(rng_rows_l)


def test_asof_carries_right_state_across_microbatches(spark, tmp_path):
    """The J4 win over snap-to-grid: a left row in batch 2 matches the
    right row seen in batch 1, carried in per-key state."""
    from solarboat_data_pipeline_spark.streaming.stateful import (
        stream_asof_backward,
    )

    src = str(tmp_path / "csrc")
    os.makedirs(f"{src}/l")
    os.makedirs(f"{src}/r")
    rdf = spark.createDataFrame(
        [("a", 100, 5.0), ("b", 101, 7.0)], "series string, epoch long, ref double"
    )
    rdf.select(
        "series", F.timestamp_seconds("epoch").alias("timestamp"), "ref"
    ).coalesce(1).write.mode("overwrite").parquet(f"{src}/r/b1.parquet")
    time.sleep(1.1)
    # left rows arrive LATER (separate micro-batch), after the right rows
    _write_batch(
        spark,
        f"{src}/l/b2.parquet",
        [("a", 100, 1.0), ("a", 150, 2.0), ("b", 99, 3.0), ("c", 200, 4.0)],
    )

    sl = spark.readStream.schema(
        "series string, timestamp timestamp, value double"
    ).option("maxFilesPerTrigger", 1).parquet(f"{src}/l/*.parquet")
    sr = spark.readStream.schema(
        "series string, timestamp timestamp, ref double"
    ).option("maxFilesPerTrigger", 1).parquet(f"{src}/r/*.parquet")
    got = {
        (r["series"], r["timestamp"].minute * 60 + r["timestamp"].second): r["ref"]
        for r in _drain(
            stream_asof_backward(sl, sr, key_cols=("series",), ts_col="timestamp"),
            "asof_carry",
        ).collect()
    }
    assert got[("a", 100)] == 5.0  # tie: right at the same ts matches
    assert got[("a", 150)] == 5.0  # carried across the batch boundary
    assert got[("b", 99)] is None  # left precedes the only right row
    assert got[("c", 200)] is None  # key with no right rows at all


def test_asof_tolerance_nulls_stale_matches(spark, tmp_path):
    from solarboat_data_pipeline_spark.streaming.stateful import (
        stream_asof_backward,
    )

    src = str(tmp_path / "tsrc")
    os.makedirs(src)
    _write_batch(spark, f"{src}/l.parquet", [("a", 100, 1.0), ("a", 500, 2.0)])
    rdf = spark.createDataFrame([("a", 90, 9.0)], "series string, epoch long, ref double")
    rdf.select(
        "series", F.timestamp_seconds("epoch").alias("timestamp"), "ref"
    ).coalesce(1).write.mode("overwrite").parquet(f"{src}/r.parquet")
    sl = spark.readStream.schema(
        "series string, timestamp timestamp, value double"
    ).parquet(f"{src}/l.parquet")
    sr = spark.readStream.schema(
        "series string, timestamp timestamp, ref double"
    ).parquet(f"{src}/r.parquet")
    got = {
        r["value"]: r["ref"]
        for r in _drain(
            stream_asof_backward(
                sl, sr, key_cols=("series",), ts_col="timestamp",
                tolerance_seconds=60.0,
            ),
            "asof_tol",
        ).collect()
    }
    assert got[1.0] == 9.0   # 10 s stale — within tolerance
    assert got[2.0] is None  # 410 s stale — nulled


def test_asof_event_time_ttl_expires_idle_keys(spark, tmp_path):
    """state_ttl_seconds + watermark: a key silent past the TTL loses its
    carried right row — later left rows get null instead of a match from
    the distant past (bounded state for unbounded key spaces)."""
    from solarboat_data_pipeline_spark.streaming.stateful import (
        stream_asof_backward,
    )

    src = str(tmp_path / "esrc")
    os.makedirs(f"{src}/l")
    os.makedirs(f"{src}/r")
    rdf = spark.createDataFrame([("a", 100, 5.0)], "series string, epoch long, ref double")
    rdf.select(
        "series", F.timestamp_seconds("epoch").alias("timestamp"), "ref"
    ).coalesce(1).write.mode("overwrite").parquet(f"{src}/r/b1.parquet")
    time.sleep(1.1)
    # batches 2-3: other-key traffic pushes the watermark far past a's TTL
    _write_batch(spark, f"{src}/l/b2.parquet", [("b", 100000, 1.0)])
    time.sleep(1.1)
    _write_batch(spark, f"{src}/l/b3.parquet", [("b", 100001, 2.0)])
    time.sleep(1.1)
    # batch 4: key a reappears long after expiry
    _write_batch(spark, f"{src}/l/b4.parquet", [("a", 100100, 3.0)])

    sl = spark.readStream.schema(
        "series string, timestamp timestamp, value double"
    ).option("maxFilesPerTrigger", 1).parquet(f"{src}/l/*.parquet")
    sr = spark.readStream.schema(
        "series string, timestamp timestamp, ref double"
    ).option("maxFilesPerTrigger", 1).parquet(f"{src}/r/*.parquet")
    # watermark the LEFT only: with the default min multipleWatermarkPolicy
    # a watermarked-but-idle right stream pins the clock and the TTL
    # never fires (the operator docstring documents this contract)
    joined = stream_asof_backward(
        sl.withWatermark("timestamp", "0 seconds"),
        sr,
        key_cols=("series",),
        ts_col="timestamp",
        state_ttl_seconds=60.0,
    )
    got = {r["value"]: r["ref"] for r in _drain(joined, "asof_ttl").collect()}
    assert got[3.0] is None, "expired state must not match"
    assert got[1.0] is None and got[2.0] is None  # key b never had right rows


def test_asof_carry_skips_trailing_null_right_value(spark, tmp_path):
    """Regression (caught by stream_smoke at 1 M events): when the LAST
    right row of a micro-batch has a null value, the carried state must
    keep the earlier non-null value per column — matching the batch
    kernel's last(ignorenulls=True) — while the staleness reference
    still advances to the last right ROW's timestamp."""
    from solarboat_data_pipeline_spark.streaming.stateful import (
        stream_asof_backward,
    )

    src = str(tmp_path / "nsrc")
    os.makedirs(f"{src}/l")
    os.makedirs(f"{src}/r")
    rdf = spark.createDataFrame(
        [("a", 100, 5.0), ("a", 110, None)],  # trailing NULL right row
        "series string, epoch long, ref double",
    )
    rdf.select(
        "series", F.timestamp_seconds("epoch").alias("timestamp"), "ref"
    ).coalesce(1).write.mode("overwrite").parquet(f"{src}/r/b1.parquet")
    time.sleep(1.1)
    _write_batch(spark, f"{src}/l/b2.parquet", [("a", 200, 1.0), ("a", 300, 2.0)])

    sl = spark.readStream.schema(
        "series string, timestamp timestamp, value double"
    ).option("maxFilesPerTrigger", 1).parquet(f"{src}/l/*.parquet")
    sr = spark.readStream.schema(
        "series string, timestamp timestamp, ref double"
    ).option("maxFilesPerTrigger", 1).parquet(f"{src}/r/*.parquet")
    got = {
        r["value"]: r["ref"]
        for r in _drain(
            stream_asof_backward(sl, sr, key_cols=("series",), ts_col="timestamp"),
            "asof_nullcarry",
        ).collect()
    }
    # left rows in the NEXT batch must still see 5.0, not null
    assert got[1.0] == 5.0 and got[2.0] == 5.0
    # and with a tolerance anchored at the LAST right row (t=110), a
    # left row 95s later is within a 100s bound (vs 100s after t=100)
    got2 = {
        r["value"]: r["ref"]
        for r in _drain(
            stream_asof_backward(
                sl, sr, key_cols=("series",), ts_col="timestamp",
                tolerance_seconds=100.0,
            ),
            "asof_nullcarry_tol",
        ).collect()
    }
    assert got2[1.0] == 5.0   # 200-110=90s stale — within bound
    assert got2[2.0] is None  # 300-110=190s stale — nulled
