"""The package root IS the supported API: every name in ``__all__``
resolves, every COVERAGE.md implementation family is reachable from the
root, and importing the root stays side-effect free (no SparkSession)."""

from __future__ import annotations

import importlib


def test_all_names_resolve():
    pkg = importlib.import_module("solarboat_data_pipeline_spark")
    missing = [n for n in pkg.__all__ if not hasattr(pkg, n)]
    assert not missing, f"__all__ names that do not resolve: {missing}"
    assert len(set(pkg.__all__)) == len(pkg.__all__), "duplicate __all__ names"


def test_every_root_public_callable_is_in_all():
    # the CONVERSE of the check above: anything imported into the root
    # namespace without a leading underscore is presented as public and
    # must be declared in __all__ (a silent omission shipped twice —
    # shard_corpus and pack_sequences — before this test existed)
    import inspect

    pkg = importlib.import_module("solarboat_data_pipeline_spark")
    undeclared = [
        n
        for n, obj in vars(pkg).items()
        if not n.startswith("_")
        and (inspect.isfunction(obj) or inspect.isclass(obj))
        and getattr(obj, "__module__", "").startswith(
            "solarboat_data_pipeline_spark"
        )
        and n not in pkg.__all__
    ]
    assert not undeclared, f"root-public names missing from __all__: {undeclared}"


def test_coverage_rows_import_from_root():
    # one representative callable per COVERAGE.md section
    import solarboat_data_pipeline_spark as sb

    for name in [
        # §2.1 scans/sinks
        "scan_candump", "scan_gpx", "scan_json_dump", "write_parquet",
        "write_bucketed",
        # §2.2 parse/decode
        "with_frame_meta", "decode_wide", "pivot_wide", "CanCatalog",
        # §2.3 joins
        "asof_join_backward", "asof_join_linear", "interval_join",
        "unify_chunks",
        # §2.4 aggs
        "resample_mean", "trapezoid_integral", "cumulative_sum",
        # §2.5 windows
        "resample_interpolate", "dedup_keep_first", "asfreq",
        # §2.6 functions
        "haversine_km", "solar_position", "poa_irradiance", "candump_line",
        # LLM-data ops
        "exact_dedup", "lsh_candidate_pairs", "cosine_topk",
        "quality_metrics", "hash_sample", "decode_image_stats",
    ]:
        assert callable(getattr(sb, name)) or isinstance(
            getattr(sb, name), type
        ), name


def test_scaled_twins_under_scale_namespace():
    import solarboat_data_pipeline_spark as sb

    for name in [
        "compute_bounds", "bounds_from_parquet_metadata", "with_buckets",
        "asof_join_backward", "asof_join_linear", "interpolate_time",
        "cumulative_sum", "sessionize", "trapezoid_integral", "global_rank",
        "lag_k", "clean_timestamp_outliers",
    ]:
        assert callable(getattr(sb.scale, name)), f"scale.{name}"


def test_streaming_namespace():
    import solarboat_data_pipeline_spark as sb

    for name in [
        "stream_candump", "stream_decode_long", "stream_resample_mean",
        "stream_sessionize", "stream_dedup_exact", "stream_enrich_grid",
        "write_parquet_stream",
    ]:
        assert callable(getattr(sb.streaming, name)), f"streaming.{name}"
    assert callable(sb.stateful.stream_ffill)


def test_root_import_has_no_spark_session(monkeypatch):
    # importing the package must not create a SparkSession (module-level
    # side effects would break spark-submit workflows that configure the
    # session themselves)
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    importlib.reload(importlib.import_module("solarboat_data_pipeline_spark"))
    assert SparkSession.getActiveSession() is active
