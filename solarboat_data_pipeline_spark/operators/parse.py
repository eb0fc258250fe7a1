"""Parse stage: extracted frames → decoded long / wide telemetry tables.

Covers P2-P12, A1, A2, P17 from SURVEY.md §2 in pure native expressions —
the reference's per-row ctypes loop (``lib/canparser.py:74-187``) becomes
schema-driven codegen: every topic's decode is a generated ``Column`` over
the hex payload, so the whole stage runs inside whole-stage codegen with no
Python on the data path.

Two output shapes:

* :func:`decode_long` — one row per decoded signal (the reference's
  intermediate "tall" table built at ``lib/canparser.py:106-111,159-169``),
  via a single generated CASE producing ``array<struct>`` + ``explode``.
* :func:`decode_wide` — the pivoted wide table (``lib/canparser.py:222-239``)
  computed **directly** as one hash aggregate of conditional ``avg`` s per
  wide column. This replaces the reference's groupby-mean + unstack (A1+A2)
  with a single shuffle and map-side partial aggregation — the plan you want
  at 100 TB (no explode blow-up, no second pivot pass).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from solarboat_data_pipeline_spark.catalog import SEPARATOR, CanCatalog

SIGNAL_STRUCT = T.StructType(
    [
        T.StructField("module_name", T.StringType()),
        T.StructField("topic_name", T.StringType()),
        T.StructField("byte_name", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("unit", T.StringType()),
    ]
)


def with_timestamp(frames: DataFrame, offset_seconds: float = 0.0) -> DataFrame:
    """P2+P3: epoch string → µs TimestampType, plus per-dataset clock-skew
    offset (reference ``lib/canparser.py:62-66,201-205``)."""
    ts = F.timestamp_seconds(F.col("ts_raw").cast("double"))
    if offset_seconds:
        ts = F.timestamp_add("MICROSECOND", F.lit(int(round(offset_seconds * 1e6))), ts)
    return frames.withColumn("timestamp", ts)


def crop_to_bounds(frames: DataFrame) -> DataFrame:
    """P4: keep rows between the first and last timestamp *in file order*
    (``lib/canparser.py:207-212`` — first/last are trusted, intermediates
    may be corrupt). Implemented as a broadcast of the 1-row bounds so the
    plan stays lazy and scales: one cheap agg pass + a map-side filter.
    The order key includes the (file, block-offset) metadata keys from
    ``extract_frames`` — required once the corpus spans multiple splits,
    where bare ``monotonically_increasing_id`` is not file-ordered."""
    from solarboat_data_pipeline_spark.sources.candump import ORDER_COLS

    order = F.struct(*[c for c in ORDER_COLS if c in frames.columns])
    bounds = frames.agg(
        F.min_by("timestamp", order).alias("_first_ts"),
        F.max_by("timestamp", order).alias("_last_ts"),
    )
    return (
        frames.crossJoin(F.broadcast(bounds))
        .where(F.col("timestamp").between(F.col("_first_ts"), F.col("_last_ts")))
        .drop("_first_ts", "_last_ts")
    )


def with_frame_meta(frames: DataFrame, mab20_workaround: bool = False) -> DataFrame:
    """P5-P7 + P9: topic id (hex→int), signature (first payload byte),
    payload byte length; optional MAB20 rewrite (``lib/canparser.py:126-133``:
    topics 64/65 force signature 230, topic 65 truncates to 2 bytes)."""
    df = frames.withColumns(
        {
            "topic_id": F.conv("topic_hex", 16, 10).cast("int"),
            "signature": F.conv(F.substring("payload_hex", 1, 2), 16, 10).cast("int"),
        }
    )
    if mab20_workaround:
        df = df.withColumns(
            {
                "signature": F.when(
                    F.col("topic_id").isin(64, 65), F.lit(230)
                ).otherwise(F.col("signature")),
                "payload_hex": F.when(
                    F.col("topic_id") == 65, F.substring("payload_hex", 1, 4)
                ).otherwise(F.col("payload_hex")),
            }
        )
    return df.withColumn("payload_len", (F.length("payload_hex") / 2).cast("int"))


def _topic_condition(module_sig: int, topic_id: int, size: int) -> Column:
    return (
        (F.col("signature") == module_sig)
        & (F.col("topic_id") == topic_id)
        & (F.col("payload_len") == size)
    )


def decode_long(frames: DataFrame, catalog: CanCatalog) -> DataFrame:
    """P8+P10-P12: schema lookup + binary decode + 1→N explode.

    One generated CASE maps each (signature, topic, valid-length) to an
    ``array<struct<module_name,topic_name,byte_name,value,unit>>``;
    ``explode`` of a null/absent match drops the frame (the reference's
    silent-drop semantics at ``lib/canparser.py:135-157``)."""
    branches: Column | None = None
    for mod, top in catalog.iter_topics():
        arr = F.array(
            *[
                F.struct(
                    F.lit(mod.name).alias("module_name"),
                    F.lit(top.name).alias("topic_name"),
                    F.lit(s.name).alias("byte_name"),
                    s.decode(F.col("payload_hex")).alias("value"),
                    F.lit(s.unit).alias("unit"),
                )
                for s in top.signals
            ]
        )
        cond = _topic_condition(mod.signature, top.topic_id, top.size)
        branches = F.when(cond, arr) if branches is None else branches.when(cond, arr)
    if branches is None:
        raise ValueError("empty catalog")
    return frames.select(
        "timestamp",
        F.explode(branches).alias("signal"),
    ).select("timestamp", "signal.*")


# above this many wide columns, the pivot runs as ONE collect_list-to-map
# aggregate + per-column map extraction instead of n_cols aggregate
# functions: measured on 2M lines × 280 columns, agg-pivot 53k lines/s vs
# map-pivot 90k (the fused decode_wide drops to 43k at that width — its
# n_cols conditional aggregates are evaluated for every input row)
WIDE_PIVOT_MAX_AGG_COLS = 32


def pivot_wide(
    long_df: DataFrame, catalog: CanCatalog, strategy: str = "auto"
) -> DataFrame:
    """A1+A2: long signals → static wide schema (parity shape with the
    reference's groupby-mean + unstack). Pivot values come from the schema
    so the pivot is single-pass and the output schema is static.

    ``strategy="agg"`` plans one conditional-avg aggregate per wide column;
    ``"map"`` first A1-reduces per (timestamp, signal), then aggregates the
    few present signals into a map and extracts columns as projections —
    the scale path for wide catalogs where most columns are absent at any
    timestamp; ``"auto"`` picks by catalog width."""
    cols = catalog.wide_columns()
    if strategy not in ("auto", "agg", "map"):
        raise ValueError("strategy must be auto|agg|map")
    use_map = strategy == "map" or (
        strategy == "auto" and len(cols) > WIDE_PIVOT_MAX_AGG_COLS
    )
    name = F.concat_ws(
        SEPARATOR, F.col("module_name"), F.col("topic_name"), F.col("byte_name")
    )
    if not use_map:
        return (
            long_df.withColumn("_wide_name", name)
            .groupBy("timestamp")
            .pivot("_wide_name", cols)
            .agg(F.avg("value"))
        )
    a1 = (
        long_df.select("timestamp", name.alias("_wide_name"), "value")
        .groupBy("timestamp", "_wide_name")
        .agg(F.avg("value").alias("value"))
    )
    m = a1.groupBy("timestamp").agg(
        F.map_from_entries(
            F.collect_list(F.struct("_wide_name", "value"))
        ).alias("_m")
    )
    return m.select(
        "timestamp", *[F.col("_m").getItem(c).alias(c) for c in cols]
    )


def decode_wide(
    frames: DataFrame,
    catalog: CanCatalog,
    downcast: bool = True,
    strategy: str = "auto",
) -> DataFrame:
    """Decode + pivot to the wide table.

    ``strategy="fused"``: one hash aggregate of conditional means — a
    single shuffle, no row explosion; fastest for narrow catalogs but its
    n_cols aggregates are evaluated for EVERY input row, so it degrades as
    the catalog widens (43k lines/s at 280 columns vs 90k for the long
    path on the 2M-line bench). ``"long"``: ``decode_long`` →
    map-strategy ``pivot_wide``. ``"auto"`` picks by catalog width.

    Both are equivalent (same-µs duplicate frames average per signal, A1).
    ``downcast=True`` casts value columns to float, the faithful superset
    of the reference's float16 (``lib/canparser.py:234``, P17)."""
    if strategy not in ("auto", "fused", "long"):
        raise ValueError("strategy must be auto|fused|long")
    cols = catalog.wide_columns()
    if strategy == "long" or (
        strategy == "auto" and len(cols) > WIDE_PIVOT_MAX_AGG_COLS
    ):
        out = pivot_wide(decode_long(frames, catalog), catalog, strategy="map")
        if downcast:
            out = out.select(
                "timestamp", *[F.col(c).cast("float").alias(c) for c in cols]
            )
        return out
    aggs = []
    for mod, top in catalog.iter_topics():
        cond = _topic_condition(mod.signature, top.topic_id, top.size)
        for s in top.signals:
            colname = SEPARATOR.join([mod.name, top.name, s.name])
            expr = F.avg(F.when(cond, s.decode(F.col("payload_hex"))))
            if downcast:
                expr = expr.cast("float")
            aggs.append(expr.alias(colname))
    # frames that match no topic contribute only null aggregates; the
    # reference drops them entirely, so keep only timestamps with ≥1 match
    match_any = F.max(
        F.coalesce(
            *[
                F.when(_topic_condition(m.signature, t.topic_id, t.size), F.lit(1))
                for m, t in catalog.iter_topics()
            ],
            F.lit(0),
        )
    ).alias("_matched")
    out = frames.groupBy("timestamp").agg(*aggs, match_any)
    return out.where(F.col("_matched") == 1).drop("_matched")
