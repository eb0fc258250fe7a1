"""Structured Streaming driver queries (parse/resample/dedup/sessionize/enrich/ffill/as-of) and their drain harness.

Split out of driver_queries.py (round 9); conventions in the facade
docstring there.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from solarboat_data_pipeline_spark.functions.formatting import epoch_seconds
from solarboat_data_pipeline_spark.operators import timeseries as ts

from solarboat_data_pipeline_spark.driver._registry import (  # noqa: F401
    _REGISTRY,
    _io_dir,
    _t,
    register,
)



# ---------------------------------------------------------------------------
# §2.7 streaming
# ---------------------------------------------------------------------------


@register(
    "st_stream_resample",
    """
    SELECT make_timestamp((epoch_us(ts) // 21600000000) * 21600000000) AS timestamp,
           round(avg(value), 6) AS value
    FROM events GROUP BY 1
    """,
)
def st_stream_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 as a real Structured Streaming run: file stream → watermarked
    tumbling-window mean → memory sink (availableNow drains the backlog,
    complete mode emits every window). Result equals the batch bucket
    mean, minus empty buckets (a stream has no dense spine)."""
    from pyspark.sql.types import LongType, TimestampNTZType

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = spark.readStream.schema(schema).parquet(f"{sf_dir}/events*.parquet")
    if isinstance(schema["ts"].dataType, TimestampNTZType):
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    elif isinstance(schema["ts"].dataType, LongType):
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    agg = (
        stream.withWatermark("ts", "0 seconds")
        .groupBy(F.window("ts", "21600 seconds").alias("w"))
        .agg(F.round(F.avg("value"), 6).alias("value"))
        .select(F.col("w.start").alias("timestamp"), "value")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("st_stream_resample")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table("st_stream_resample")


def _event_stream(spark: SparkSession, sf_dir: str):
    """File-source stream over the events fixture with the NTZ→TIMESTAMP
    cast the batch scans apply (same pattern as ``st_stream_resample``)."""
    from pyspark.sql.types import LongType, TimestampNTZType

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = spark.readStream.schema(schema).parquet(f"{sf_dir}/events*.parquet")
    if isinstance(schema["ts"].dataType, TimestampNTZType):
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    elif isinstance(schema["ts"].dataType, LongType):
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return stream


def _drain_to_memory(df, name: str, mode: str):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return df.sparkSession.table(name)


class _stream_conf:
    """Scoped streaming-query tuning: set session confs for one drain,
    restore after. State-partition count is a per-query SIZING choice
    (it is baked into the query's checkpoint): 1,500 keys at test scale
    do not need 32 state stores per micro-batch — at cluster scale the
    same knob is sized UP to the key cardinality / executor count."""

    def __init__(self, spark, **confs):
        self.spark, self.confs, self.saved = spark, confs, {}

    def __enter__(self):
        for k, v in self.confs.items():
            try:
                self.saved[k] = self.spark.conf.get(k)
            except Exception:
                self.saved[k] = None
            self.spark.conf.set(k, v)
        return self

    def __exit__(self, *exc):
        for k, v in self.saved.items():
            if v is None:
                self.spark.conf.unset(k)
            else:
                self.spark.conf.set(k, v)
        return False


@register(
    "st_stream_sessionize",
    """
    WITH g AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS new_s
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    s AS (
      SELECT user_id, ts,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS sid
      FROM g)
    SELECT session_start, session_end, user_id, n_events FROM (
      SELECT user_id, min(ts) AS session_start,
             max(ts) + INTERVAL 1800 SECOND AS session_end,
             count(*)::BIGINT AS n_events
      FROM s GROUP BY user_id, sid)
    """,
)
def st_stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap sessionization as a real Structured Streaming run: the engine's
    ``session_window`` merges session state (streaming/pipeline.py:100);
    complete mode over a drained backlog equals the batch gap-merge, with
    ``session_end = last event + gap`` (the session_window contract)."""
    from solarboat_data_pipeline_spark.streaming.pipeline import (
        stream_sessionize,
    )

    stream = _event_stream(spark, sf_dir)
    sess = stream_sessionize(
        stream, gap_seconds=1800.0, ts_col="ts", key_cols=("user_id",)
    )
    out = _drain_to_memory(sess, "st_stream_sessionize", "complete")
    return out.select(
        "session_start", "session_end", "user_id",
        F.col("n_events").cast("long").alias("n_events"),
    )


@register(
    "st_stream_dedup",
    """
    SELECT DISTINCT user_id, event_type FROM events
    """,
)
def st_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup (streaming/pipeline.py:123,
    ``dropDuplicatesWithinWatermark``): state is bounded by the watermark
    span; with a span covering the drained backlog it equals batch
    DISTINCT on the dedup key. Only the key columns are returned — WHICH
    duplicate row survives is batch-order-dependent by contract."""
    from solarboat_data_pipeline_spark.streaming.pipeline import (
        stream_dedup_exact,
    )

    stream = _event_stream(spark, sf_dir)
    deduped = stream_dedup_exact(
        stream, ("user_id", "event_type"), ts_col="ts", watermark="365 days"
    )
    out = _drain_to_memory(
        deduped.select("user_id", "event_type"), "st_stream_dedup", "append"
    )
    return out.select("user_id", "event_type")


@register("st_stream_parse", _REGISTRY["s1_candump_parse"][1])
def st_stream_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 as a real file STREAM (streaming/pipeline.py:stream_candump):
    the same candump lines as ``s1_candump_parse`` are staged to text
    files, read through ``readStream.text``, and parsed by the IDENTICAL
    stateless batch operators (P1-P12 are row-local, hence stream-safe).
    Shares s1's oracle verbatim — the stream must produce the exact same
    parsed frame set as the batch scan."""
    from solarboat_data_pipeline_spark.sources.candump import extract_frames
    from solarboat_data_pipeline_spark.streaming.pipeline import stream_candump

    ev = _t(spark, sf_dir, "events")
    frame1 = F.format_string(
        "(%.6f) can0 %s#%s",
        F.round(epoch_seconds(F.col("ts")), 6),
        F.lpad(F.lower(F.hex(F.col("event_id") % 2048)), 3, "0"),
        F.substring(F.md5("props"), 1, 14),
    )
    frame2 = F.format_string(
        "(%.6f) can1 %s#%s",
        F.round(epoch_seconds(F.col("ts")), 6) + 0.5,
        F.lpad(F.lower(F.hex((F.col("event_id") + 7) % 2048)), 3, "0"),
        F.substring(F.md5("props"), 15, 14),
    )
    lines = ev.select(
        F.concat(
            frame1, F.when(F.col("event_id") % 10 == 0, frame2).otherwise(F.lit(""))
        ).alias("value")
    )
    stage = _io_dir(sf_dir, "st_candump_text")
    # one staged file per core — same single-task-drain fix as
    # st_stream_decode_wide (the file stream source never splits files)
    lines.repartition(spark.sparkContext.defaultParallelism).write.mode(
        "overwrite"
    ).text(stage)
    stream = stream_candump(spark, f"{stage}/part-*")
    fr = extract_frames(stream, with_order=False)
    b = lambda pos: F.conv(F.substring("payload_hex", pos, 2), 16, 10).cast("long")  # noqa: E731
    parsed = fr.select(
        F.col("ts_raw").cast("double").alias("ts_raw"),
        "interface",
        F.conv("topic_hex", 16, 10).cast("long").alias("topic_id"),
        F.round((b(3) + b(5) * 256) / 100.0, 6).alias("u16_scaled"),
    )
    return _drain_to_memory(parsed, "st_stream_parse", "append")


@register(
    "st_stream_decode_wide",
    """
    WITH vals AS (
      -- the D byte replays the catalog's strict-units quirk (P11,
      -- lib/canparser_generator.py:57-75): a field after a fused _L/_H
      -- u16 pair inherits the pair's unit divisor, so D scales by /100
      SELECT round(extract(epoch FROM ts), 6) AS ts_s,
             (event_id % 60000) / 100.0 AS val,
             (event_id % 256) / 100.0 AS d
      FROM events
      UNION ALL
      SELECT round(extract(epoch FROM ts), 6),
             ((event_id * 3) % 60000) / 100.0,
             ((event_id + 13) % 256) / 100.0
      FROM events WHERE event_id % 7 = 0
    )
    SELECT ts_s, round(avg(val), 6) AS val_avg, round(avg(d), 6) AS d_avg
    FROM vals GROUP BY ts_s
    """,
)
def st_stream_decode_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 wide decode as a real STREAM (VERDICT r9 #5,
    streaming/pipeline.py:stream_decode_wide): candump text built from
    events — with a second same-µs frame for every 7th event so the A1
    duplicate merge actually merges — is staged, read through
    ``readStream.text``, and decoded by the projection-shaped streaming
    kernel (fixed-expression slot decode, watermark-bounded entry-list
    state). The oracle replays the u16-LE/u8 decode and the per-µs mean
    arithmetically."""
    from solarboat_data_pipeline_spark.catalog import CanCatalog
    from solarboat_data_pipeline_spark.operators.parse import (
        with_frame_meta,
        with_timestamp,
    )
    from solarboat_data_pipeline_spark.sources.candump import extract_frames
    from solarboat_data_pipeline_spark.streaming.pipeline import (
        stream_candump,
        stream_decode_wide,
    )

    ev = _t(spark, sf_dir, "events")

    def payload(v16, v8):
        return F.concat(
            F.lit("fa"),
            F.lpad(F.lower(F.hex(v16 % 256)), 2, "0"),
            F.lpad(F.lower(F.hex(F.shiftright(v16, 8))), 2, "0"),
            F.lpad(F.lower(F.hex(v8)), 2, "0"),
        )

    ts6 = F.round(epoch_seconds(F.col("ts")), 6)
    frame1 = F.format_string(
        "(%.6f) can0 015#%s", ts6,
        payload(F.col("event_id") % 60000, F.col("event_id") % 256),
    )
    frame2 = F.format_string(
        "(%.6f) can0 015#%s", ts6,
        payload((F.col("event_id") * 3) % 60000, (F.col("event_id") + 13) % 256),
    )
    lines = ev.select(
        F.concat(
            frame1, F.when(F.col("event_id") % 7 == 0, frame2).otherwise(F.lit(""))
        ).alias("value")
    )
    stage = _io_dir(sf_dir, "st_candump_wide_text")
    # stage one text file PER CORE: the streaming file source assigns one
    # task per file, so a single staged file serializes the whole parse
    # into one task (measured: addBatch 3.3 s -> 1.5 s at sf0.1 once the
    # drain reads core-count files). defaultParallelism keeps the choice
    # scale-adaptive — a production corpus is already many files.
    lines.repartition(spark.sparkContext.defaultParallelism).write.mode(
        "overwrite"
    ).text(stage)
    catalog = CanCatalog.from_dict({
        "version": "driver-swd-0.1",
        "modules": [{
            "name": "SB", "signature": 250, "topics": [{
                "name": "W", "id": 21, "bytes": [
                    {"name": "SIGNATURE", "type": "uint8_t", "units": ""},
                    {"name": "VAL_L", "type": "uint16_t", "units": "V/100"},
                    {"name": "VAL_H", "type": "uint16_t", "units": "V/100"},
                    {"name": "D", "type": "uint8_t", "units": ""},
                ],
            }],
        }],
    })
    stream = stream_candump(spark, f"{stage}/part-*")
    frames = with_frame_meta(
        with_timestamp(extract_frames(stream, with_order=False))
    )
    wide = stream_decode_wide(
        frames, catalog, watermark="0 seconds", downcast=False
    )
    out = wide.select(
        F.round(epoch_seconds(F.col("timestamp")), 6).alias("ts_s"),
        F.round(F.col("SB__W__VAL"), 6).alias("val_avg"),
        F.round(F.col("SB__W__D"), 6).alias("d_avg"),
    )
    # state-partition SIZING (same rationale as the as-of drains below):
    # ~100k timestamp keys at test scale do not need 32 state stores per
    # micro-batch — each store pays a per-batch commit regardless of its
    # key count; at cluster scale this knob sizes UP with key cardinality
    with _stream_conf(spark, **{"spark.sql.shuffle.partitions": "8"}):
        return _drain_to_memory(out, "st_stream_decode_wide", "complete")


@register(
    "st_stream_enrich",
    """
    WITH g AS (
      SELECT make_timestamp((epoch_us(ts) // 21600000000) * 21600000000) AS grid,
             round(avg(value), 6) AS avg_value
      FROM events GROUP BY 1)
    SELECT e.event_id, g.avg_value AS ref_avg_value
    FROM events e
    LEFT JOIN g
      ON g.grid = make_timestamp((epoch_us(e.ts) // 21600000000) * 21600000000)
    """,
)
def st_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming enrichment join (streaming/pipeline.py:stream_enrich_grid):
    the stream snaps each event to the static side's time grid and joins
    the broadcast static table statelessly — the streaming analogue of the
    J1/J2/J4 enrichment stage. Equals the batch snap-to-grid left join."""
    from solarboat_data_pipeline_spark.streaming.pipeline import (
        stream_enrich_grid,
    )

    ev = _t(spark, sf_dir, "events")
    static = (
        ev.groupBy(
            F.timestamp_micros(
                (F.floor(ts._us(F.col("ts")) / 21_600_000_000) * 21_600_000_000)
                .cast("long")
            ).alias("ts")
        )
        .agg(F.round(F.avg("value"), 6).alias("avg_value"))
    )
    stream = _event_stream(spark, sf_dir).select("event_id", "ts")
    enriched = stream_enrich_grid(
        stream, static, grid_seconds=21600.0, ts_col="ts",
        prefix="ref_", value_cols=("avg_value",),
    )
    out = _drain_to_memory(enriched, "st_stream_enrich", "append")
    return out.select("event_id", "ref_avg_value")


@register(
    "st_stream_ffill",
    """
    SELECT user_id, ts, value,
           last_value(value IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
    FROM events
    """,
)
def st_stream_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (streaming/stateful.py:
    ``applyInPandasWithState``): per-key forward fill whose state — one
    scalar per series — carries across micro-batches, so gaps spanning
    batch boundaries still fill. Equals the batch running
    last-non-null over a drained ordered backlog (the fixture has no
    (user_id, ts) ties, so the fill order is deterministic)."""
    from solarboat_data_pipeline_spark.streaming.stateful import stream_ffill

    stream = _event_stream(spark, sf_dir).select("user_id", "ts", "value")
    filled = stream_ffill(
        stream, key_cols=("user_id",), ts_col="ts", value_col="value",
        out_col="filled",
    )
    out = _drain_to_memory(filled, "st_stream_ffill", "append")
    return out.select("user_id", "ts", "value", "filled")


@register(
    "st_stream_asof",
    """
    WITH l AS (SELECT user_id, ts, event_id FROM events
               WHERE event_type = 'purchase'),
         r AS (SELECT user_id, ts, value FROM events
               WHERE event_type = 'error')
    SELECT l.event_id, round(r.value, 6) AS last_error_value
    FROM l ASOF LEFT JOIN r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
)
def st_stream_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE streaming backward as-of join (streaming/stateful.py:
    ``stream_asof_backward``): purchase events (left stream) enriched
    with each user's most recent error value at-or-before their
    timestamp, via ONE ``applyInPandasWithState`` over the tagged union
    of two streams — the J4 stream analogue (reference semantics
    ``lib/process_gpx_data.py:158-171``). Since round 8 this runs the
    AUTO kernel (``buffered="auto"``, VERDICT r7 item 1): each key
    stays on an in-order fast path (every left emits in its arrival
    batch — no left ever rides state) until the first observed
    cross-batch disorder, then flips permanently to pure
    watermark-buffered emission with the right buffer intact — on this
    single-file in-order stream the fast path emits every row in batch
    0, and on a disordered stream the exact buffered semantics take
    over per key. The no-data finalization micro-batch is skipped (no
    LEFT pends under the fast path; unflushed buffered rights need no
    finalization) and state partitions are sized to the 1,500-key
    fixture. Oracle: DuckDB's native keyed ASOF LEFT JOIN on the same
    fixture (no (user_id, ts) ties in the fixture, so the match is
    deterministic)."""
    from solarboat_data_pipeline_spark.streaming.stateful import (
        stream_asof_backward,
    )

    stream = _event_stream(spark, sf_dir)
    left = stream.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    ).withWatermark("ts", "0 seconds")
    right = stream.where(F.col("event_type") == "error").select(
        "user_id", "ts", F.col("value").alias("last_error_value")
    )
    joined = stream_asof_backward(
        left, right, key_cols=("user_id",), ts_col="ts",
        value_cols=("last_error_value",), buffered="auto",
    )
    with _stream_conf(
        spark,
        **{
            "spark.sql.shuffle.partitions": "8",
            # safe ONLY because no LEFT pends on the fast path (lefts
            # emit in their arrival batch); pending LEFTS would need the
            # final no-data batch to flush
            "spark.sql.streaming.noDataMicroBatches.enabled": "false",
        },
    ):
        out = _drain_to_memory(joined, "st_stream_asof", "append")
    # ADVICE r8: skipping the finalization batch is safe ONLY while no
    # left pends (every key stayed on the fast path). If the fixture
    # ever gains cross-batch disorder, flipped keys would hold pending
    # lefts the skipped batch never flushes — assert the drain is
    # complete instead of letting rows vanish silently.
    left_n = left.sparkSession.read.parquet(
        f"{sf_dir}/events.parquet"
    ).where(F.col("event_type") == "purchase").count()
    drained = out.count()
    if drained != left_n:
        raise AssertionError(
            f"st_stream_asof drained {drained} rows for {left_n} left rows"
            " — a flipped key held pending lefts past the skipped"
            " finalization batch; re-enable noDataMicroBatches for this"
            " fixture"
        )
    return out.select(
        "event_id", F.round("last_error_value", 6).alias("last_error_value")
    )


@register(
    "st_stream_asof_linear",
    """
    WITH l AS (SELECT user_id, ts, event_id, NULL::DOUBLE AS v, 1 AS src
               FROM events WHERE event_type = 'purchase'),
         r AS (SELECT user_id, ts, NULL::BIGINT AS event_id, value AS v, 0 AS src
               FROM events WHERE event_type = 'signup'),
         u AS (SELECT * FROM l UNION ALL SELECT * FROM r),
         w AS (
           SELECT *,
             last_value(v IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY ts, src
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             first_value(v IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY ts, src
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             last_value(CASE WHEN v IS NOT NULL THEN epoch_us(ts) END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, src
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
             first_value(CASE WHEN v IS NOT NULL THEN epoch_us(ts) END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, src
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
           FROM u)
    SELECT event_id,
           round(CASE
             WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
               CASE WHEN nt = pt THEN pv
                    ELSE pv + (nv - pv) * (epoch_us(ts) - pt) / (nt - pt) END
             WHEN pv IS NOT NULL THEN pv
           END, 6) AS interp_value
    FROM w WHERE src = 1
    """,
)
def st_stream_asof_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE streaming linear-interpolating as-of join (streaming/
    stateful.py: ``stream_asof_linear``) — the J3 analogue the round-6
    verdict asked for: each purchase event gets the time-weighted linear
    blend of the surrounding signup values for its user (reference
    semantics ``lib/unifier_with_forecast_data.py:62-75``), computed by
    the watermark-buffered stateful kernel: a left row is held until
    both surrounding right samples are DECIDED (the round-8
    ``auto=True`` mode additionally emits a left in its arrival batch
    once its next sample is known — VERDICT r7 item 1, available on
    this same kernel). The blend equals the batch
    ``asof_join_linear`` exactly — including the null head before the
    first signup and the clamp-forward tail after the last. Since
    round 9 this row runs ``auto=True`` unconditionally: the frontier
    mask is BATCH-AWARE (it engages only once the watermark clock has
    started, stateful.py), so on this one-file availableNow fixture —
    where the only data batch runs under a zero watermark and the
    finalization batch must run regardless (clamp-forward tails pend) —
    auto is bit-identical to the buffered kernel instead of paying the
    per-key emission math twice (the r8 fixture-shaped selection,
    measured 4.5 s auto vs 3.6 s buffered, is gone); on LONG
    multi-batch streams the frontier win engages from the first
    watermarked batch (scripts/stream_smoke.py
    ``stream_asof_auto_linear...``, 10 M events). Oracle: the keyed
    form of j3_asof_linear's SQL (same blend, same operation order,
    PARTITION BY user_id)."""
    from solarboat_data_pipeline_spark.streaming.stateful import (
        stream_asof_linear,
    )

    stream = _event_stream(spark, sf_dir)
    left = stream.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    ).withWatermark("ts", "0 seconds")
    right = stream.where(F.col("event_type") == "signup").select(
        "user_id", "ts", F.col("value").alias("interp_value")
    )
    joined = stream_asof_linear(
        left, right, key_cols=("user_id",), ts_col="ts",
        value_cols=("interp_value",), auto=True,
    )
    with _stream_conf(
        spark, **{"spark.sql.shuffle.partitions": "8"}
    ):
        out = _drain_to_memory(joined, "st_stream_asof_linear", "append")
    return out.select(
        "event_id", F.round("interp_value", 6).alias("interp_value")
    )


def _register_stream_media_probe():
    """st_stream_media_probe shares mm_mp4_probe's oracle VERBATIM: the
    streaming run must produce exactly the batch probe's rows. The
    explicit import makes the dependency order-proof — registration of
    mm_mp4_probe happens on first import of driver.multimodal, wherever
    the facade lists it (ADVICE r11: reading _REGISTRY here used to
    couple correctness to driver/__init__.py's import order)."""
    from solarboat_data_pipeline_spark.driver import multimodal as _mm  # noqa: F401

    oracle = _REGISTRY["mm_mp4_probe"][1]

    @register("st_stream_media_probe", oracle)
    def st_stream_media_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
        """The probe lane under Structured Streaming — media files
        arriving as a stream (the live-ingest shape of a curation
        pipeline): stage the synthesized MP4 corpus as parquet once
        (overwrite-idempotent, same convention as the sink round-trip
        rows), then file-stream it back in multi-file micro-batches
        (maxFilesPerTrigger) through the IDENTICAL Arrow mapInPandas
        box-walk + SPS parse the batch row uses. Stateless map-only
        streaming: no watermark, no state store; every emitted row
        hash-matches the batch oracle."""
        from solarboat_data_pipeline_spark.operators import multimodal as mm

        docs = _t(spark, sf_dir, "documents")
        path = _io_dir(sf_dir, "stream_media_mp4")
        mm.synthesize_mp4_media(docs).write.mode("overwrite").parquet(path)
        schema = spark.read.parquet(path).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 8)
            .parquet(path)
        )
        return _drain_to_memory(
            mm.probe_video_stats(stream), "st_stream_media_probe", "append"
        )


_register_stream_media_probe()


def _register_stream_phash():
    """st_stream_phash: the perceptual-hash lane under Structured
    Streaming — images arriving as a stream are decoded and dHashed by
    the IDENTICAL Arrow map the batch rows use (stateless map-only; no
    watermark, no state store). The oracle recomputes hash + dims
    arithmetically from the cell generator (the explicit import keeps
    the shared-fragment dependency order-proof, same as the media
    probe)."""
    from solarboat_data_pipeline_spark.driver.multimodal import _PHASH_SIG_CTE

    oracle = f"""
    WITH {_PHASH_SIG_CTE}
    SELECT media_id, phash,
           CASE WHEN media_id % 4 = 2 THEN 20 ELSE 40 END::INT AS width,
           CASE WHEN media_id % 4 = 2 THEN 14 ELSE 28 END::INT AS height
    FROM sig
    """

    @register("st_stream_phash", oracle)
    def st_stream_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
        from solarboat_data_pipeline_spark.operators import perceptual as pc

        docs = _t(spark, sf_dir, "documents")
        path = _io_dir(sf_dir, "stream_phash_media")
        pc.synthesize_phash_media(docs).write.mode("overwrite").parquet(path)
        schema = spark.read.parquet(path).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 8)
            .parquet(path)
        )
        return _drain_to_memory(pc.dhash_table(stream), "st_stream_phash", "append")


_register_stream_phash()
