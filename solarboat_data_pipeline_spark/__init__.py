"""PySpark-native analytics engine for solar-boat CAN telemetry pipelines.

A ground-up Spark reimplementation of the capabilities of the reference
pipeline (joaoantoniocardoso/solarboat_data_pipeline): candump parsing,
schema-driven binary decode, wide pivoting, fixed-period resampling with
bounded time interpolation, as-of enrichment joins (solar forecast, GPS),
plus large-scale training-data operators (dedup, similarity search, text
analysis, multimodal column plumbing).

Everything is expressed declaratively with the DataFrame API so Catalyst
can push filters, prune columns, broadcast small joins and keep the hot
path inside whole-stage codegen. The engine is designed for a large
multi-executor cluster (partition-key parameters on every ordered
operator); it is merely *tested* on local[N].

Public API
----------
Everything in ``__all__`` below is the supported surface — importable
from the package root and stable across rounds; anything ``_``-prefixed
or not re-exported here is internal. Ordered kernels come in two forms:
the single-series functions re-exported at the root (global window or
per-``partition_cols`` window), and their range-bucketed 100 TB twins
under the ``scale`` module namespace (``scale.asof_join_backward`` etc.,
same semantics, bounded per-task state — see SCALE.md). The full
operator ↔ query ↔ test map is COVERAGE.md; a quickstart table is in
README.md.
"""

__version__ = "0.1.0"

from solarboat_data_pipeline_spark.session import get_spark

# --- module namespaces (scaled twins, catalogs, families) ----------------
from solarboat_data_pipeline_spark import catalog, pipeline
from solarboat_data_pipeline_spark.operators import (
    avi,
    dedup,
    h264,
    jpeg,
    mp3,
    mp4,
    multimodal,
    perceptual,
    vp9,
    parse,
    png,
    sampling,
    scale,
    similarity,
    skew,
    text,
    timeseries,
    wav,
)
from solarboat_data_pipeline_spark.functions import formatting, geo, solar
from solarboat_data_pipeline_spark.sources import bucketed, sinks
from solarboat_data_pipeline_spark.streaming import pipeline as streaming
from solarboat_data_pipeline_spark.streaming import stateful

# --- sources / sinks ------------------------------------------------------
from solarboat_data_pipeline_spark.sources.bucketed import (
    read_bucketed,
    write_bucketed,
)
from solarboat_data_pipeline_spark.sources.candump import (
    extract_frames,
    scan_candump,
)
from solarboat_data_pipeline_spark.sources.csvs import (
    scan_forecast_csv,
    scan_gps_csv,
)
from solarboat_data_pipeline_spark.sources.gpx import scan_gpx
from solarboat_data_pipeline_spark.sources.jsondump import (
    json_dump_to_candump,
    scan_json_dump,
)
from solarboat_data_pipeline_spark.sources.sinks import (
    write_csv,
    write_json_records,
    write_parquet,
    write_text,
)

# --- parse / decode (§2.2) ------------------------------------------------
from solarboat_data_pipeline_spark.catalog import CanCatalog, apply_units
from solarboat_data_pipeline_spark.operators.parse import (
    crop_to_bounds,
    decode_long,
    decode_wide,
    pivot_wide,
    with_frame_meta,
    with_timestamp,
)

# --- pipeline stages ------------------------------------------------------
from solarboat_data_pipeline_spark.pipeline import (
    parse_stage,
    resample_stage,
    run_pipeline,
    unify_forecast_stage,
    unify_gps_stage,
)

# --- timeseries kernels (§2.3-§2.6; scaled twins under `scale.`) ----------
from solarboat_data_pipeline_spark.operators.timeseries import (
    asfreq,
    asof_join_backward,
    asof_join_linear,
    clean_timestamp_outliers,
    cumulative_sum,
    dedup_keep_first,
    interpolate_time,
    interval_join,
    iqr_clip,
    reindex_interpolate,
    resample_interpolate,
    resample_mean,
    rolling_time_stats,
    sessionize,
    time_spine,
    trapezoid_integral,
    unify_chunks,
)

# --- functions (§2.6) -----------------------------------------------------
from solarboat_data_pipeline_spark.functions.formatting import (
    candump_line,
    epoch_seconds,
)
from solarboat_data_pipeline_spark.functions.geo import (
    derive_track,
    haversine_km,
    heading_deg,
    speed_kmh,
)
from solarboat_data_pipeline_spark.functions.solar import (
    poa_irradiance,
    solar_position,
    solcast_preprocess,
)

# --- LLM-data-pipeline operators ------------------------------------------
from solarboat_data_pipeline_spark.operators.dedup import (
    band_index,
    decontaminate,
    dedup_against,
    embedding_lsh_dedup_pairs,
    exact_dedup,
    paragraph_dedup,
    lsh_candidate_pairs,
    near_dup_against,
    near_dup_dedup,
    ngram_jaccard_pairs,
    signature_index,
    simhash_near_dup_pairs,
    with_minhash,
    with_simhash,
)
from solarboat_data_pipeline_spark.operators.sampling import (
    hash_sample,
    pack_sequences,
    shard_corpus,
    stratified_sample,
    token_budget_sample,
    weighted_mix,
)
from solarboat_data_pipeline_spark.operators.similarity import (
    build_ivf_index,
    build_ivf_sq8_index,
    cosine_topk,
    extend_ivf_index,
    ivf_topk,
    ivf_topk_indexed,
    ivf_sq8_topk_indexed,
    lsh_ann_topk,
    sq8_quantize,
    sq8_topk,
    train_ivf_centroids,
)
from solarboat_data_pipeline_spark.operators.skew import (
    exact_quantile_cont,
    salted_topk,
    two_phase_count_distinct,
)
from solarboat_data_pipeline_spark.operators.text import (
    lang_id,
    ngram_topk,
    quality_filter,
    quality_metrics,
    redact_pii,
    token_count,
)
from solarboat_data_pipeline_spark.operators.multimodal import (
    binary_metadata,
    decode_audio_stats,
    decode_h264_stats,
    decode_image_stats,
    decode_mp4_h264_stats,
    decode_video_stats,
    extract_features,
    extract_sample_payloads,
    fmp4_sample_ranges,
    fmp4_sample_seek_table,
    frame_sample_plan,
    keyframe_index,
    mjpeg_decode_check,
    mp4_sample_ranges,
    mp4_sample_seek_table,
    probe_media_tolerant,
    probe_mp3_stats,
    probe_ivf_stats,
    probe_video_stats,
    resample_audio_stats,
    resize_image_stats,
    sample_frame_stats,
)

__all__ = [
    # session
    "get_spark",
    # module namespaces
    "catalog", "pipeline", "parse", "timeseries", "scale",
    "dedup", "similarity", "text", "sampling", "skew",
    "multimodal", "perceptual", "png", "wav", "avi", "jpeg", "mp3", "mp4", "vp9", "h264", "geo", "solar", "formatting",
    "sinks", "bucketed", "streaming", "stateful",
    # sources / sinks
    "scan_candump", "extract_frames", "scan_forecast_csv", "scan_gps_csv",
    "scan_gpx", "scan_json_dump", "json_dump_to_candump",
    "write_parquet", "write_csv", "write_json_records", "write_text",
    "write_bucketed", "read_bucketed",
    # parse / decode
    "CanCatalog", "apply_units", "with_timestamp", "crop_to_bounds",
    "with_frame_meta", "decode_long", "decode_wide", "pivot_wide",
    # pipeline stages
    "parse_stage", "resample_stage", "unify_forecast_stage",
    "unify_gps_stage", "run_pipeline",
    # timeseries kernels
    "time_spine", "resample_mean", "resample_interpolate",
    "interpolate_time", "asfreq", "dedup_keep_first", "interval_join",
    "unify_chunks", "clean_timestamp_outliers", "iqr_clip",
    "asof_join_backward", "asof_join_linear", "reindex_interpolate",
    "sessionize", "cumulative_sum", "trapezoid_integral", "rolling_time_stats",
    # functions
    "haversine_km", "heading_deg", "speed_kmh", "derive_track",
    "solcast_preprocess", "solar_position", "poa_irradiance",
    "candump_line", "epoch_seconds",
    # dedup / similarity / text / sampling / skew / multimodal
    "exact_dedup", "paragraph_dedup", "with_minhash", "lsh_candidate_pairs", "with_simhash",
    "simhash_near_dup_pairs", "ngram_jaccard_pairs",
    "embedding_lsh_dedup_pairs", "near_dup_dedup", "decontaminate",
    "dedup_against", "band_index", "signature_index", "near_dup_against",
    "cosine_topk", "ivf_topk", "lsh_ann_topk",
    "build_ivf_index", "ivf_topk_indexed", "extend_ivf_index", "train_ivf_centroids",
    "sq8_quantize", "sq8_topk", "build_ivf_sq8_index", "ivf_sq8_topk_indexed",
    "quality_metrics", "quality_filter", "lang_id", "token_count", "ngram_topk",
    "redact_pii",
    "hash_sample", "weighted_mix", "stratified_sample",
    "token_budget_sample", "shard_corpus", "pack_sequences",
    "two_phase_count_distinct", "salted_topk", "exact_quantile_cont",
    "binary_metadata", "extract_features", "decode_image_stats",
    "resize_image_stats", "decode_audio_stats", "resample_audio_stats",
    "decode_video_stats", "sample_frame_stats", "mjpeg_decode_check",
    "frame_sample_plan", "probe_video_stats", "keyframe_index",
    "probe_ivf_stats", "mp4_sample_ranges", "fmp4_sample_ranges", "probe_mp3_stats",
    # ranged-GET extraction + pixel decode + tolerant probe (round 11)
    "mp4_sample_seek_table", "fmp4_sample_seek_table", "extract_sample_payloads",
    "probe_media_tolerant", "decode_h264_stats", "decode_mp4_h264_stats",
]
