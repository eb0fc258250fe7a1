"""Geo math, formatting round-trips, solar stubs, GPX/JSON sources."""

import math
import os

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from solarboat_data_pipeline_spark.functions import geo, solar
from solarboat_data_pipeline_spark.functions.formatting import (
    candump_line,
    epoch_seconds,
    payload_from_int_array,
)
from solarboat_data_pipeline_spark.sources.gpx import scan_gpx
from solarboat_data_pipeline_spark.sources.jsondump import (
    json_dump_to_candump,
    scan_json_dump,
)

from tests.conftest import DATA_DIR


def _np_haversine(lat1, lon1, lat2, lon2):
    lat1, lon1, lat2, lon2 = map(np.radians, [lat1, lon1, lat2, lon2])
    a = np.sin((lat2 - lat1) / 2.0) ** 2 + (
        np.cos(lat1) * np.cos(lat2) * np.sin((lon2 - lon1) / 2.0) ** 2
    )
    return 6371 * 2 * np.arcsin(np.sqrt(a))


def _np_heading(lat1, lon1, lat2, lon2):
    lat1, lon1, lat2, lon2 = map(np.radians, [lat1, lon1, lat2, lon2])
    dlon = lon2 - lon1
    x = np.cos(lat1) * np.sin(dlon)
    y = np.sin(lat1) * (np.cos(lat1) - np.cos(lat2) * np.cos(dlon))
    return np.rad2deg(np.arctan2(x, y)) + 180.0


def test_haversine_and_heading_match_reference_math(spark):
    rng = np.random.RandomState(3)
    pts = rng.uniform(-60, 60, (50, 4))
    df = spark.createDataFrame(
        [tuple(map(float, p)) for p in pts], "lat1 double, lon1 double, lat2 double, lon2 double"
    )
    got = df.select(
        geo.haversine_km(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")).alias("d"),
        geo.heading_deg(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")).alias("h"),
    ).collect()
    for row, p in zip(got, pts):
        assert math.isclose(row["d"], _np_haversine(*p), rel_tol=1e-12)
        assert math.isclose(row["h"], _np_heading(*p), rel_tol=1e-9)


def test_derive_track_quirks(spark):
    # 3 points, 1 s apart plus one sub-second step (dt.seconds truncation)
    rows = [
        (pd.Timestamp(0.0, unit="s").to_pydatetime(), -27.0, -48.0),
        (pd.Timestamp(1.0, unit="s").to_pydatetime(), -27.001, -48.0),
        (pd.Timestamp(1.5, unit="s").to_pydatetime(), -27.002, -48.0),
    ]
    df = spark.createDataFrame(rows, "timestamp timestamp, latitude double, longitude double")
    out = geo.derive_track(df).orderBy("timestamp").collect()
    assert out[0]["speed"] is None and out[0]["heading"] is None
    step_km = _np_haversine(-27.0, -48.0, -27.001, -48.0)
    assert math.isclose(out[1]["speed"], step_km / (1 / 3600), rel_tol=1e-9)
    # 0.5 s gap → pandas .dt.seconds == 0 → division guard → null speed
    assert out[2]["speed"] is None
    assert math.isclose(out[2]["distance"], 2 * step_km, rel_tol=1e-6)


def test_json_dump_golden_roundtrip(spark, tmp_path):
    # the reference's own golden case (convert_json_to_candump.py:12-42)
    src = tmp_path / "dump.json"
    src.write_text(
        '[{"bytes":["159","4","246","0","246","0"],"_id":"x",'
        '"date":"2020-02-14 15:44:54.944","mod":250,"top":33,"__v":0},'
        '{"bytes":[],"date":"2020-02-14 15:44:55.000","mod":1,"top":2,"__v":0},'
        '{"bytes":["1"],"date":"2020-02-14 15:44:56.000","mod":300,"top":2,"__v":0}]'
    )
    df = scan_json_dump(spark, str(src))
    out = json_dump_to_candump(df).collect()
    lines = {r["value"]: r["valid"] for r in out}
    golden = "(1581695094.944000) can0 021#fa9f04f600f600"
    assert golden in lines and lines[golden]
    # empty bytes and mod>255 flagged invalid (reference skips / exits)
    invalid = [v for v, ok in lines.items() if not ok]
    assert len(invalid) == 2


def test_candump_format_parses_back(spark):
    # K4 → P1 round-trip through the parse regex
    from solarboat_data_pipeline_spark.sources.candump import extract_frames

    df = spark.createDataFrame([(1581695094.944, 33, "fa9f04f600f600")], "e double, t int, p string")
    lines = df.select(
        candump_line(F.col("e"), F.col("t"), F.col("p")).alias("value")
    )
    frames = extract_frames(lines).collect()
    assert len(frames) == 1
    assert frames[0]["topic_hex"] == "021"
    assert frames[0]["payload_hex"] == "fa9f04f600f600"


def test_epoch_seconds_roundtrip(spark):
    df = spark.createDataFrame(
        [(pd.Timestamp(1581695094.944, unit="s").to_pydatetime(),)], "ts timestamp"
    )
    v = df.select(epoch_seconds(F.col("ts")).alias("e")).first()["e"]
    assert math.isclose(v, 1581695094.944, abs_tol=1e-6)


def test_poa_builtin_contract(spark):
    # 1970-01-01 00:00 UTC at lon -48.5 is ~21:00 local solar time: sun
    # below the horizon, so tilt-0 isotropic POA reduces to the sky
    # diffuse term alone (beam clamps to 0, ground term is 0 at tilt 0)
    df = spark.createDataFrame(
        [(pd.Timestamp(0, unit="s").to_pydatetime(), 800.0, 500.0, 100.0, 0.1)],
        "timestamp timestamp, ghi double, dni double, dhi double, albedo double",
    )
    out = solar.poa_irradiance(df, latitude=-27.6, longitude=-48.5)
    row = out.first()
    assert out.columns == df.columns + ["poa"]
    assert row["poa"] == 100.0


def test_gpx_scan(spark, tmp_path):
    gpx = tmp_path / "track.gpx"
    gpx.write_text(
        """<?xml version="1.0"?>
<gpx xmlns="http://www.topografix.com/GPX/1/1" version="1.1">
 <trk><trkseg>
  <trkpt lat="-27.5949" lon="-48.5482"><ele>3.1</ele><time>2022-09-01T12:00:00+00:00</time></trkpt>
  <trkpt lat="-27.5950" lon="-48.5483"><ele>3.2</ele><time>2022-09-01T12:00:01+00:00</time></trkpt>
 </trkseg></trk>
</gpx>"""
    )
    out = scan_gpx(spark, str(gpx)).orderBy("timestamp").collect()
    assert len(out) == 2
    assert math.isclose(out[0]["latitude"], -27.5949)
    assert out[0]["altitude"] == 3.1
    assert out[1]["timestamp"].second == 1
