"""K1-K4 sink round-trips (parquet has its own partitioned/idempotent
tests; these cover the CSV / JSON-records / text hops)."""

import json
import os

from pyspark.sql import functions as F

from solarboat_data_pipeline_spark.sources import sinks


def _sample(spark):
    return spark.createDataFrame(
        [(1, "a,b", 1.5), (2, None, -0.25), (3, "c", None)],
        "id long, s string, v double",
    )


def test_csv_sink_roundtrip(spark, tmp_path):
    path = str(tmp_path / "out_csv")
    df = _sample(spark)
    sinks.write_csv(df, path)
    back = spark.read.option("header", "true").schema(df.schema).csv(path)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_json_records_sink_roundtrip(spark, tmp_path):
    path = str(tmp_path / "out_json")
    df = _sample(spark)
    sinks.write_json_records(df, path)
    # each line is one record, independently parseable (orient="records")
    lines = []
    for f in os.listdir(path):
        if f.startswith("part-"):
            with open(os.path.join(path, f)) as fh:
                lines += [json.loads(ln) for ln in fh if ln.strip()]
    assert {r["id"] for r in lines} == {1, 2, 3}
    assert next(r for r in lines if r["id"] == 1)["s"] == "a,b"
    # nulls are omitted per record, not emitted as "null" strings
    assert "s" not in next(r for r in lines if r["id"] == 2)
    back = spark.read.schema(df.schema).json(path)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_text_sink_single_column(spark, tmp_path):
    path = str(tmp_path / "out_text")
    df = _sample(spark).select(
        F.format_string("(%d) line %s", "id", F.coalesce("s", F.lit("-"))).alias(
            "value"
        )
    )
    sinks.write_text(df, path)
    back = spark.read.text(path)
    assert back.count() == 3
    assert sorted(r["value"] for r in back.collect())[0].startswith("(1)")
