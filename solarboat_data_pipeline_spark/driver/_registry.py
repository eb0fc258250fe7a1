"""Shared driver-query machinery: the registry, the register decorator, table loaders, and SQL fragments used by more than one query family.

Split out of driver_queries.py (round 9); conventions in the facade
docstring there.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from solarboat_data_pipeline_spark.operators import dedup as dd
from solarboat_data_pipeline_spark.operators import scale as sc


# ---------------------------------------------------------------------------
# shared SQL fragments (DuckDB dialect) mirroring operators/text.py
# ---------------------------------------------------------------------------

SQL_TOKENS = r"list_filter(string_split_regex(lower({t}), '\s+'), x -> x != '')"


def sql_h32(expr: str, salt: str = "") -> str:
    inner = f"'{salt}' || {expr}" if salt else expr
    return f"(('0x' || substr(md5({inner}), 1, 8))::BIGINT)"


def sql_shingles(toks: str) -> str:
    return (
        f"case when len({toks}) >= 3 then "
        f"list_transform(generate_series(1, len({toks}) - 2), "
        f"i -> {toks}[i] || ' ' || {toks}[i+1] || ' ' || {toks}[i+2]) "
        f"else [] end"
    )


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts is naive timestamp[us] parquet → Spark 4 reads it as
        # TIMESTAMP_NTZ, which unix_micros() and tz arithmetic reject. Pin
        # the session tz to UTC (DuckDB's naive values are the stored UTC
        # instants; a non-UTC driver session would shift every collected
        # timestamp), then cast NTZ → TIMESTAMP — identical µs values under
        # a UTC session. The driver builds its own session, so the conf is
        # set here, runtime-settable, not at build time.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        from pyspark.sql.types import LongType, TimestampNTZType

        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        elif isinstance(ts_type, LongType):
            # legacy nanos-as-long encoding, kept for older fixture sets
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def _event_bounds(sf_dir: str, num_buckets: int = 32) -> list[int] | None:
    """Scale-path bucket bounds for ``events.ts`` derived from parquet
    FOOTER statistics — no data scanned (the 100 TB form; see
    :func:`operators.scale.bounds_from_parquet_metadata`). ``None`` makes
    the operators fall back to the approx-quantile scan."""
    import os

    return sc.bounds_from_parquet_metadata(
        os.path.join(sf_dir, "events.parquet"), "ts", num_buckets
    )


QuerySpec = tuple[Callable[[SparkSession, str], DataFrame], str | None]
_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None):
    def deco(fn):
        _REGISTRY[name] = (fn, oracle)
        return fn

    return deco


# ---------------------------------------------------------------------------
# LLM-data-pipeline operators (dedup / similarity / text / multimodal)
# ---------------------------------------------------------------------------

_SQL_TOKS = SQL_TOKENS.format(t="text")
_SQL_SH = sql_shingles("toks")


def _sql_minhash_mins(base: str = "hs") -> str:
    mins = []
    for a, b in dd.PERM_CONSTANTS:
        mins.append(
            f"list_min(list_transform({base}, h -> ({a} * h + {b}) % {dd.MINHASH_MOD}))"
        )
    return ", ".join(mins)


def _sql_band_hashes() -> str:
    bands = []
    for bnd in range(dd.BANDS):
        elems = ", ".join(
            f"mins[{bnd * dd.ROWS_PER_BAND + r + 1}]::VARCHAR"
            for r in range(dd.ROWS_PER_BAND)
        )
        bands.append(f"md5(list_aggregate([{elems}], 'string_agg', ','))")
    return f"[{', '.join(bands)}]"


def _sql_lsh_pairs(base: str = "documents") -> str:
    return f"""
         t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM {base}),
         s AS (SELECT doc_id, list_distinct({_SQL_SH}) AS sh FROM t
               WHERE len(list_distinct({_SQL_SH})) > 0),
         hb AS (SELECT doc_id,
                       list_transform(sh, s -> {sql_h32('s')}) AS hs FROM s),
         m AS (SELECT doc_id, [{_sql_minhash_mins()}] AS mins FROM hb),
         b AS (SELECT doc_id, unnest({_sql_band_hashes()}) AS band_hash,
                      unnest(generate_series(0, {dd.BANDS - 1})) AS band
               FROM m),
         lsh_pairs AS (
           SELECT DISTINCT a.doc_id AS id_a, bb.doc_id AS id_b
           FROM b a JOIN b bb
             ON a.band = bb.band AND a.band_hash = bb.band_hash
            AND a.doc_id < bb.doc_id)
    """


def _sql_lsh_bucket(alias: str, planes: list[list[int]]) -> str:
    terms = []
    for p, plane in enumerate(planes):
        arr = "[" + ", ".join(str(float(w)) for w in plane) + "]"
        dot = (
            f"list_sum(list_transform({alias}.embedding, (x, i) -> "
            f"x::DOUBLE * ({arr}::DOUBLE[])[i]))"
        )
        terms.append(f"(CASE WHEN {dot} > 0 THEN {1 << p} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


# ---------------------------------------------------------------------------
# source/sink round-trips (S3/S4/S5, K1-K5): write a deterministic subset of
# `events` through each sink, scan it back through the matching source, and
# verify against an oracle computed straight from the parquet — a full
# write→read→parse proof per format, visible to the driver. The /tmp staging
# is per-SF and overwrite-idempotent, so repeated runs are stable.
# ---------------------------------------------------------------------------


def _io_dir(sf_dir: str, name: str) -> str:
    import os

    tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    return f"/tmp/solarboat_driver_io/{tag}/{name}"
