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


# --- watermark-buffered as-of (backward + linear) ---------------------------


def test_asof_buffered_resolves_cross_batch_disorder(spark, tmp_path):
    """The round-6 kernel's semantics cliff: a right row arriving one
    micro-batch late with an EARLIER timestamp. The unbuffered kernel
    consumes it as if newest (stale match for already-processed lefts);
    the buffered kernel holds the left row until the watermark passes it
    and matches exactly."""
    from solarboat_data_pipeline_spark.streaming.stateful import (
        stream_asof_backward,
    )

    src = str(tmp_path / "dsrc")
    os.makedirs(f"{src}/l")
    os.makedirs(f"{src}/r")

    rdf = spark.createDataFrame(
        [("a", 100, 5.0)], "series string, epoch long, ref double"
    )
    rdf.select(
        "series", F.timestamp_seconds("epoch").alias("timestamp"), "ref"
    ).coalesce(1).write.mode("overwrite").parquet(f"{src}/r/b1.parquet")
    _write_batch(spark, f"{src}/l/b1.parquet", [("a", 150, 1.0)])
    time.sleep(1.1)
    # batch 2: a DISORDERED right row — ts=120 is EARLIER than the left
    # row already seen, plus a left far ahead to advance the watermark
    rdf2 = spark.createDataFrame(
        [("a", 120, 7.0)], "series string, epoch long, ref double"
    )
    rdf2.select(
        "series", F.timestamp_seconds("epoch").alias("timestamp"), "ref"
    ).coalesce(1).write.mode("overwrite").parquet(f"{src}/r/b2.parquet")
    _write_batch(spark, f"{src}/l/b2.parquet", [("a", 400, 2.0)])

    def build(buffered):
        sl = spark.readStream.schema(
            "series string, timestamp timestamp, value double"
        ).option("maxFilesPerTrigger", 1).parquet(f"{src}/l/*.parquet")
        sr = spark.readStream.schema(
            "series string, timestamp timestamp, ref double"
        ).option("maxFilesPerTrigger", 1).parquet(f"{src}/r/*.parquet")
        if buffered:
            sl = sl.withWatermark("timestamp", "60 seconds")
        return stream_asof_backward(
            sl, sr, key_cols=("series",), ts_col="timestamp",
            buffered=buffered,
        )

    unbuf = {
        r["value"]: r["ref"]
        for r in _drain(build(False), "asof_unbuf_disorder").collect()
    }
    # the cliff, demonstrated: the left at t=150 was already emitted with
    # 5.0 when the t=120 right arrived
    assert unbuf[1.0] == 5.0

    buf = {
        r["value"]: r["ref"]
        for r in _drain(build(True), "asof_buf_disorder").collect()
    }
    # buffered: held until the watermark passed t=150, by which time the
    # late t=120 right had arrived — exact batch-kernel answer
    assert buf[1.0] == 7.0
    # the t=400 left sits inside the 60 s watermark-delay tail of the
    # finite stream: never passed by the final watermark, not emitted
    # (on an unbounded stream it would emit on the next advance)
    assert 2.0 not in buf


def _disordered_fixture(spark, root, n=600, n_series=5, n_files=6):
    """Multi-key corpus split into time-ordered files, with right rows
    displaced forward by a hash-bounded jitter of ONE file — bounded
    cross-batch disorder. Written straight from Spark so nulls stay
    genuine nulls. Returns (src_dir, batch_df)."""
    per = n // n_files
    base = spark.range(n).select(
        F.concat(F.lit("s"), F.pmod("id", F.lit(n_series))).alias("series"),
        F.timestamp_seconds(F.lit(1000) + F.col("id")).alias("timestamp"),
        F.when(F.pmod(F.hash("id"), 9) != 0, F.col("id").cast("double"))
        .alias("value"),
        (F.pmod(F.hash("id", F.lit(3)), 4) == 0).alias("is_right"),
        F.col("id"),
    )
    disp = F.when(
        F.col("is_right"), F.pmod(F.hash("id", F.lit(7)), 2)
    ).otherwise(F.lit(0))
    withf = base.withColumn(
        "fidx",
        F.least((F.col("id") / per).cast("int") + disp, F.lit(n_files - 1)),
    )
    os.makedirs(root)
    import glob as _glob
    import shutil as _shutil

    for f in range(n_files):
        tmp = f"{root}__tmp"
        withf.where(F.col("fidx") == f).drop("fidx").coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp)
        part = _glob.glob(f"{tmp}/part-*.parquet")[0]
        os.replace(part, f"{root}/f{f}.parquet")
        _shutil.rmtree(tmp, ignore_errors=True)
    return root, spark.read.parquet(f"{root}/*.parquet")


def _split_streams(spark, src, delay):
    st = spark.readStream.schema(
        "series string, timestamp timestamp, value double, "
        "is_right boolean, id long"
    ).option("maxFilesPerTrigger", 1).parquet(f"{src}/*.parquet")
    left = st.where(~F.col("is_right")).select(
        "series", "timestamp", "id"
    ).withWatermark("timestamp", delay)
    right = st.where("is_right").select(
        "series", "timestamp", F.col("value").alias("ref")
    )
    return left, right


def test_asof_buffered_matches_batch_kernel_under_disorder(spark, tmp_path):
    """Randomized multi-key parity: buffered backward as-of on a
    disordered multi-file stream equals the batch kernel EXACTLY on the
    emitted set (every left at-or-below the final watermark)."""
    from solarboat_data_pipeline_spark.operators import timeseries as ts
    from solarboat_data_pipeline_spark.streaming.stateful import (
        stream_asof_backward,
    )

    src, b = _disordered_fixture(spark, str(tmp_path / "mix"))
    delay_s = 2 * (600 // 6)  # twice the file span covers the jitter
    left, right = _split_streams(spark, src, f"{delay_s} seconds")
    got = _drain(
        stream_asof_backward(
            left, right, key_cols=("series",), ts_col="timestamp",
            value_cols=("ref",), buffered=True,
        ),
        "asof_buf_parity",
    )
    bl = b.where(~F.col("is_right")).select("series", "timestamp", "id")
    br = b.where("is_right").select(
        "series", "timestamp", F.col("value").alias("ref")
    )
    expect = ts.asof_join_backward(
        bl, br, on="timestamp", value_cols=["ref"], partition_cols=("series",)
    )
    max_left = bl.agg(F.max("timestamp")).collect()[0][0].timestamp()
    cut = max_left - delay_s
    expect = expect.where(F.unix_timestamp("timestamp") <= cut)
    g = sorted(map(tuple, got.select("id", "ref").collect()))
    e = sorted(map(tuple, expect.select("id", "ref").collect()))
    assert len(g) == len(e) > 0
    assert g == e


def test_asof_linear_matches_batch_kernel_full(spark, tmp_path):
    """Single-batch streaming linear as-of equals the batch
    asof_join_linear on every row — null head, skipped-null blends and
    clamp-forward tail included (the final no-data flush sees complete
    data)."""
    from solarboat_data_pipeline_spark.operators import timeseries as ts
    from solarboat_data_pipeline_spark.streaming.stateful import (
        stream_asof_linear,
    )

    src, b = _disordered_fixture(
        spark, str(tmp_path / "lin"), n_files=1
    )
    st = spark.readStream.schema(
        "series string, timestamp timestamp, value double, "
        "is_right boolean, id long"
    ).parquet(f"{src}/*.parquet")
    left = st.where(~F.col("is_right")).select(
        "series", "timestamp", "id"
    ).withWatermark("timestamp", "0 seconds")
    right = st.where("is_right").select(
        "series", "timestamp", F.col("value").alias("ref")
    )
    got = _drain(
        stream_asof_linear(
            left, right, key_cols=("series",), ts_col="timestamp",
            value_cols=("ref",),
        ),
        "asof_lin_parity",
    )
    bl = b.where(~F.col("is_right")).select("series", "timestamp", "id")
    br = b.where("is_right").select(
        "series", "timestamp", F.col("value").alias("ref")
    )
    expect = ts.asof_join_linear(
        bl, br, on="timestamp", value_cols=["ref"], partition_cols=("series",)
    )
    g = sorted(map(tuple, got.select("id", "ref").collect()))
    e = sorted(map(tuple, expect.select("id", "ref").collect()))
    assert len(g) == len(e) == bl.count()
    assert g == e


def test_asof_linear_semantics(spark, tmp_path):
    """Hand-computed blend table: head null, exact-ts pass-through,
    interior blend, null right rows skipped per column, clamp-forward
    tail (and null tail with clamp_forward=False)."""
    from solarboat_data_pipeline_spark.streaming.stateful import (
        stream_asof_linear,
    )

    src = str(tmp_path / "sem")
    os.makedirs(src)
    rdf = spark.createDataFrame(
        [("a", 100, 10.0), ("a", 200, 30.0), ("a", 300, None),
         ("a", 400, 50.0)],
        "series string, epoch long, ref double",
    )
    rdf.select(
        "series", F.timestamp_seconds("epoch").alias("timestamp"), "ref"
    ).coalesce(1).write.mode("overwrite").parquet(f"{src}/r.parquet")
    _write_batch(
        spark, f"{src}/l.parquet",
        [("a", 50, 0.0), ("a", 100, 1.0), ("a", 150, 2.0), ("a", 250, 3.0),
         ("a", 450, 4.0)],
    )

    def build(clamp):
        sl = spark.readStream.schema(
            "series string, timestamp timestamp, value double"
        ).parquet(f"{src}/l.parquet").withWatermark("timestamp", "0 seconds")
        sr = spark.readStream.schema(
            "series string, timestamp timestamp, ref double"
        ).parquet(f"{src}/r.parquet")
        return stream_asof_linear(
            sl, sr, key_cols=("series",), ts_col="timestamp",
            clamp_forward=clamp,
        )

    got = {
        r["value"]: r["ref"] for r in _drain(build(True), "lin_sem").collect()
    }
    assert got[0.0] is None          # before the first right sample
    assert got[1.0] == 10.0          # exact-ts match passes through
    assert got[2.0] == 20.0          # midpoint of 10..30
    # t=250 blends 30@200 .. 50@400 — the null right at 300 is skipped
    assert got[3.0] == 35.0
    assert got[4.0] == 50.0          # clamp-forward past the last sample

    got2 = {
        r["value"]: r["ref"]
        for r in _drain(build(False), "lin_sem_noclamp").collect()
    }
    assert got2[4.0] is None         # no extrapolation without clamp


def test_asof_buffered_tolerance_and_ttl(spark, tmp_path):
    """Buffered backward: tolerance nulls stale matches (anchored at the
    last right ROW, per the batch contract) and state_ttl_seconds still
    expires idle keys."""
    from solarboat_data_pipeline_spark.streaming.stateful import (
        stream_asof_backward,
    )

    src = str(tmp_path / "btl")
    os.makedirs(f"{src}/l")
    os.makedirs(f"{src}/r")
    rdf = spark.createDataFrame(
        [("a", 90, 9.0)], "series string, epoch long, ref double"
    )
    rdf.select(
        "series", F.timestamp_seconds("epoch").alias("timestamp"), "ref"
    ).coalesce(1).write.mode("overwrite").parquet(f"{src}/r/b1.parquet")
    _write_batch(
        spark, f"{src}/l/b1.parquet", [("a", 100, 1.0), ("a", 500, 2.0)]
    )

    sl = spark.readStream.schema(
        "series string, timestamp timestamp, value double"
    ).parquet(f"{src}/l/*.parquet").withWatermark("timestamp", "0 seconds")
    sr = spark.readStream.schema(
        "series string, timestamp timestamp, ref double"
    ).parquet(f"{src}/r/*.parquet")
    got = {
        r["value"]: r["ref"]
        for r in _drain(
            stream_asof_backward(
                sl, sr, key_cols=("series",), ts_col="timestamp",
                tolerance_seconds=60.0, buffered=True,
            ),
            "asof_buf_tol",
        ).collect()
    }
    assert got[1.0] == 9.0   # 10 s stale — within tolerance
    assert got[2.0] is None  # 410 s stale — nulled

    # TTL: traffic on key b pushes the watermark far past key a's TTL;
    # a reappears and must NOT match the expired carried row
    src2 = str(tmp_path / "bttl")
    os.makedirs(f"{src2}/l")
    os.makedirs(f"{src2}/r")
    rdf = spark.createDataFrame(
        [("a", 100, 5.0)], "series string, epoch long, ref double"
    )
    rdf.select(
        "series", F.timestamp_seconds("epoch").alias("timestamp"), "ref"
    ).coalesce(1).write.mode("overwrite").parquet(f"{src2}/r/b1.parquet")
    _write_batch(spark, f"{src2}/l/b1.parquet", [("a", 101, 1.0)])
    time.sleep(1.1)
    _write_batch(spark, f"{src2}/l/b2.parquet", [("b", 100000, 2.0)])
    time.sleep(1.1)
    _write_batch(spark, f"{src2}/l/b3.parquet", [("b", 100001, 3.0)])
    time.sleep(1.1)
    _write_batch(spark, f"{src2}/l/b4.parquet", [("a", 100100, 4.0)])

    sl = spark.readStream.schema(
        "series string, timestamp timestamp, value double"
    ).option("maxFilesPerTrigger", 1).parquet(
        f"{src2}/l/*.parquet"
    ).withWatermark("timestamp", "0 seconds")
    sr = spark.readStream.schema(
        "series string, timestamp timestamp, ref double"
    ).option("maxFilesPerTrigger", 1).parquet(f"{src2}/r/*.parquet")
    got = {
        r["value"]: r["ref"]
        for r in _drain(
            stream_asof_backward(
                sl, sr, key_cols=("series",), ts_col="timestamp",
                state_ttl_seconds=60.0, buffered=True,
            ),
            "asof_buf_ttl",
        ).collect()
    }
    assert got[1.0] == 5.0           # before expiry: normal match
    assert got[4.0] is None, "expired state must not match"


def _in_order_fixture(spark, root, n=600, n_series=5, n_files=6):
    """The _disordered_fixture corpus WITHOUT displacement: files split
    strictly by id range, so per-key delivery is in event-time order."""
    import glob as _glob
    import shutil as _shutil

    os.makedirs(root)
    per = n // n_files
    base = spark.range(n).select(
        F.concat(F.lit("s"), F.pmod("id", F.lit(n_series))).alias("series"),
        F.timestamp_seconds(F.lit(1000) + F.col("id")).alias("timestamp"),
        F.when(F.pmod(F.hash("id"), 9) != 0, F.col("id").cast("double"))
        .alias("value"),
        (F.pmod(F.hash("id", F.lit(3)), 4) == 0).alias("is_right"),
        F.col("id"),
    )
    for f in range(n_files):
        tmp = f"{root}__tmp"
        base.where(
            (F.col("id") >= f * per) & (F.col("id") < (f + 1) * per)
        ).coalesce(1).write.mode("overwrite").parquet(tmp)
        os.replace(_glob.glob(f"{tmp}/part-*.parquet")[0], f"{root}/f{f}.parquet")
        _shutil.rmtree(tmp, ignore_errors=True)
    return root, spark.read.parquet(f"{root}/*.parquet")


def test_asof_auto_in_order_parity_and_disorder_flip(spark, tmp_path):
    """buffered="auto" (round 8): on an in-order multi-batch stream the
    fast path emits every row with the exact batch-kernel answer; the
    first observed cross-batch disorder flips the key permanently to
    the watermark-buffered path, after which rows get exact buffered
    semantics (rows emitted before the flip keep the in-order
    best-effort match — append output cannot retract)."""
    from solarboat_data_pipeline_spark.operators import timeseries as ts
    from solarboat_data_pipeline_spark.streaming.stateful import (
        stream_asof_backward,
    )

    # 1) in-order multi-file stream: auto ≡ batch kernel on ALL lefts
    # (including the tail past the final watermark — the fast path does
    # not hold rows back)
    src, b = _in_order_fixture(spark, str(tmp_path / "auto_ord"))
    st = spark.readStream.schema(
        "series string, timestamp timestamp, value double, "
        "is_right boolean, id long"
    ).option("maxFilesPerTrigger", 1).parquet(f"{src}/*.parquet")
    left = st.where(~F.col("is_right")).select(
        "series", "timestamp", "id"
    ).withWatermark("timestamp", "0 seconds")
    right = st.where("is_right").select(
        "series", "timestamp", F.col("value").alias("ref")
    )
    got = _drain(
        stream_asof_backward(
            left, right, key_cols=("series",), ts_col="timestamp",
            value_cols=("ref",), buffered="auto",
        ),
        "asof_auto_parity",
    )
    bl = b.where(~F.col("is_right")).select("series", "timestamp", "id")
    br = b.where("is_right").select(
        "series", "timestamp", F.col("value").alias("ref")
    )
    expect = ts.asof_join_backward(
        bl, br, on="timestamp", value_cols=["ref"], partition_cols=("series",)
    )
    g = sorted(map(tuple, got.select("id", "ref").collect()))
    e = sorted(map(tuple, expect.select("id", "ref").collect()))
    assert len(g) == len(e) == bl.count()
    assert g == e

    # 2) disorder flip: b1 in-order (left emits immediately, in-order
    # answer), b2 disordered right -> key flips, later lefts get exact
    # buffered semantics
    src2 = str(tmp_path / "auto_flip")
    os.makedirs(f"{src2}/l")
    os.makedirs(f"{src2}/r")
    rdf = spark.createDataFrame(
        [("a", 100, 5.0)], "series string, epoch long, ref double"
    )
    rdf.select(
        "series", F.timestamp_seconds("epoch").alias("timestamp"), "ref"
    ).coalesce(1).write.mode("overwrite").parquet(f"{src2}/r/b1.parquet")
    _write_batch(spark, f"{src2}/l/b1.parquet", [("a", 150, 1.0)])
    time.sleep(1.1)
    rdf2 = spark.createDataFrame(
        [("a", 120, 7.0)], "series string, epoch long, ref double"
    )
    rdf2.select(
        "series", F.timestamp_seconds("epoch").alias("timestamp"), "ref"
    ).coalesce(1).write.mode("overwrite").parquet(f"{src2}/r/b2.parquet")
    _write_batch(spark, f"{src2}/l/b2.parquet", [("a", 400, 2.0)])
    time.sleep(1.1)
    _write_batch(spark, f"{src2}/l/b3.parquet", [("a", 1000, 3.0)])

    sl = spark.readStream.schema(
        "series string, timestamp timestamp, value double"
    ).option("maxFilesPerTrigger", 1).parquet(
        f"{src2}/l/*.parquet"
    ).withWatermark("timestamp", "60 seconds")
    sr = spark.readStream.schema(
        "series string, timestamp timestamp, ref double"
    ).option("maxFilesPerTrigger", 1).parquet(f"{src2}/r/*.parquet")
    got2 = {
        r["value"]: r["ref"]
        for r in _drain(
            stream_asof_backward(
                sl, sr, key_cols=("series",), ts_col="timestamp",
                buffered="auto",
            ),
            "asof_auto_flip",
        ).collect()
    }
    # pre-flip: emitted immediately with the in-order answer (the late
    # 120 right had not arrived)
    assert got2[1.0] == 5.0
    # post-flip: watermark-buffered exactness — the 400 left waited and
    # saw the late 120 right
    assert got2[2.0] == 7.0
    # the 1000 left sits inside the watermark-delay tail: buffered
    # semantics hold it (the flip is permanent — no fast re-emission)
    assert 3.0 not in got2


def test_asof_linear_auto_matches_batch_kernel(spark, tmp_path):
    """auto=True linear (round 8 frontier fast path): on an in-order
    multi-batch stream the result equals the batch asof_join_linear on
    every row, for both clamp modes — while state holds only the
    undecided tail."""
    from solarboat_data_pipeline_spark.operators import timeseries as ts
    from solarboat_data_pipeline_spark.streaming.stateful import (
        stream_asof_linear,
    )

    src, b = _in_order_fixture(spark, str(tmp_path / "linauto"))
    for clamp in (True, False):
        st = spark.readStream.schema(
            "series string, timestamp timestamp, value double, "
            "is_right boolean, id long"
        ).option("maxFilesPerTrigger", 1).parquet(f"{src}/*.parquet")
        left = st.where(~F.col("is_right")).select(
            "series", "timestamp", "id"
        ).withWatermark("timestamp", "0 seconds")
        right = st.where("is_right").select(
            "series", "timestamp", F.col("value").alias("ref")
        )
        got = _drain(
            stream_asof_linear(
                left, right, key_cols=("series",), ts_col="timestamp",
                value_cols=("ref",), auto=True, clamp_forward=clamp,
            ),
            f"lin_auto_{clamp}",
        )
        bl = b.where(~F.col("is_right")).select("series", "timestamp", "id")
        br = b.where("is_right").select(
            "series", "timestamp", F.col("value").alias("ref")
        )
        expect = ts.asof_join_linear(
            bl, br, on="timestamp", value_cols=["ref"],
            partition_cols=("series",), clamp_forward=clamp,
        )
        g = sorted(map(tuple, got.select("id", "ref").collect()))
        e = sorted(map(tuple, expect.select("id", "ref").collect()))
        assert len(g) == len(e) == bl.count()
        assert g == e


def test_asof_buffered_rejects_big_int_payload(spark, tmp_path):
    """ADVICE r7: integer left payloads above 2^53 cannot ride the
    float64-widened buffered state exactly — the kernel raises at
    ingest instead of emitting silently-rounded values."""
    import pytest

    from solarboat_data_pipeline_spark.streaming.stateful import (
        stream_asof_backward,
    )

    src = str(tmp_path / "big")
    os.makedirs(src)
    big = (1 << 53) + 1
    ldf = spark.createDataFrame(
        [("a", 100, big)], "series string, epoch long, payload long"
    )
    ldf.select(
        "series", F.timestamp_seconds("epoch").alias("timestamp"), "payload"
    ).coalesce(1).write.mode("overwrite").parquet(f"{src}/l.parquet")
    rdf = spark.createDataFrame(
        [("a", 50, 1.0)], "series string, epoch long, ref double"
    )
    rdf.select(
        "series", F.timestamp_seconds("epoch").alias("timestamp"), "ref"
    ).coalesce(1).write.mode("overwrite").parquet(f"{src}/r.parquet")
    sl = spark.readStream.schema(
        "series string, timestamp timestamp, payload long"
    ).parquet(f"{src}/l.parquet").withWatermark("timestamp", "0 seconds")
    sr = spark.readStream.schema(
        "series string, timestamp timestamp, ref double"
    ).parquet(f"{src}/r.parquet")
    j = stream_asof_backward(
        sl, sr, key_cols=("series",), ts_col="timestamp",
        value_cols=("ref",), buffered=True,
    )
    q = (
        j.writeStream.format("memory").queryName("big_int_guard")
        .outputMode("append").trigger(availableNow=True).start()
    )
    with pytest.raises(Exception, match="2\\^53"):
        q.awaitTermination(120)
        raise AssertionError("query should have failed")


def test_asof_buffered_rejects_bad_mode(spark, tmp_path):
    import pytest

    from solarboat_data_pipeline_spark.streaming.stateful import (
        stream_asof_backward,
    )

    left = spark.createDataFrame(
        [("a", 1, 1.0)], "series string, epoch int, v double"
    ).select("series", F.timestamp_seconds("epoch").alias("timestamp"), "v")
    right = spark.createDataFrame(
        [("a", 1, 1.0)], "series string, epoch int, ref double"
    ).select("series", F.timestamp_seconds("epoch").alias("timestamp"), "ref")
    with pytest.raises(ValueError, match="buffered must be"):
        stream_asof_backward(
            left, right, key_cols=("series",), ts_col="timestamp",
            buffered="yes-please",
        )


def test_asof_buffered_rejects_nested_left_payload(spark):
    """Left payload columns ride array-typed state — nested or timestamp
    payloads are refused loudly instead of corrupting silently."""
    import pytest

    from solarboat_data_pipeline_spark.streaming.stateful import (
        stream_asof_backward,
    )

    left = spark.createDataFrame(
        [("a", 1, [1, 2])], "series string, epoch int, payload array<int>"
    ).select("series", F.timestamp_seconds("epoch").alias("timestamp"),
             "payload")
    right = spark.createDataFrame(
        [("a", 1, 1.0)], "series string, epoch int, ref double"
    ).select("series", F.timestamp_seconds("epoch").alias("timestamp"), "ref")
    with pytest.raises(ValueError, match="atomic"):
        stream_asof_backward(
            left, right, key_cols=("series",), ts_col="timestamp",
            buffered=True,
        )
