"""Property-based round-trip: random frames formatted to candump text
(K4, ``convert_json_to_candump.py:96``) then re-extracted and decoded
(P1/P5/P6) must recover every field exactly — the two directions of the
text format are mutual inverses on the valid domain."""

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from solarboat_data_pipeline_spark.functions.formatting import (
    candump_line,
    payload_from_int_array,
)
from solarboat_data_pipeline_spark.sources.candump import extract_frames

FRAME = st.tuples(
    # 10-digit epoch seconds, capped where a double's ulp stays < 1 µs so
    # the %.6f text is injective per distinct microsecond
    st.integers(1_000_000_000, 3_999_999_999),
    st.integers(0, 999_999),  # microseconds
    st.integers(0, 0x7FF),  # 11-bit CAN topic id
    st.integers(0, 255),  # module signature byte
    st.lists(st.integers(0, 255), min_size=1, max_size=7),  # payload bytes
)


@settings(max_examples=10, deadline=None)
@given(st.lists(FRAME, min_size=1, max_size=8, unique_by=lambda f: (f[0], f[1])))
def test_format_then_parse_roundtrip(spark, frames):
    rows = [
        (i, sec + us / 1e6, topic, mod, body)
        for i, (sec, us, topic, mod, body) in enumerate(frames)
    ]
    df = spark.createDataFrame(
        rows, "i long, epoch double, topic long, mod long, body array<int>"
    )
    lines = df.select(
        "i",
        "epoch",
        "topic",
        "mod",
        "body",
        candump_line(
            F.col("epoch"),
            F.col("topic"),
            payload_from_int_array(F.col("body"), F.col("mod")),
        ).alias("value"),
    )
    parsed = extract_frames(lines.select("value"))
    got = {r["ts_raw"]: r for r in parsed.collect()}
    assert len(got) == len(frames)
    for sec, us, topic, mod, body in frames:
        key = f"{sec + us / 1e6:.6f}"
        r = got[key]
        assert r["interface"] == "can0"
        assert int(r["topic_hex"], 16) == topic
        want_payload = f"{mod:02x}" + "".join(f"{b:02x}" for b in body)
        assert r["payload_hex"] == want_payload
