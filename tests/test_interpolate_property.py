"""Property-based parity: interpolate_time must match pandas
``Series.interpolate(method="time", ...)`` on randomized gap patterns —
the reference resampler's exact semantics (``lib/resampler.py:97-101``),
flagged the hardest kernel in SURVEY §7."""

import math

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from solarboat_data_pipeline_spark.operators.timeseries import interpolate_time


def _series(draw_values, step_choices):
    return st.tuples(
        st.lists(
            st.one_of(st.none(), st.floats(-100, 100, allow_nan=False)),
            min_size=2,
            max_size=24,
        ),
        st.lists(st.sampled_from(step_choices), min_size=23, max_size=23),
        st.sampled_from([None, 1, 2, 5]),
    )


@settings(max_examples=15, deadline=None)
@given(_series(None, [1, 1, 1, 3, 10]))
def test_matches_pandas_time_interpolation(spark, case):
    values, steps, limit = case
    # irregular strictly-increasing timestamps
    ts = [1_700_000_000]
    for s in steps[: len(values) - 1]:
        ts.append(ts[-1] + s)
    ts = ts[: len(values)]

    pdf = pd.Series(
        [float(v) if v is not None else None for v in values],
        index=pd.to_datetime(ts, unit="s"),
        dtype="float64",
    )
    expected = pdf.interpolate(
        method="time", limit_area="inside", limit=limit
    ).tolist()

    df = spark.createDataFrame(
        [(t, v) for t, v in zip(ts, values)], "epoch long, v double"
    ).select(F.timestamp_seconds("epoch").alias("timestamp"), "v")
    got = [
        r["v"]
        for r in interpolate_time(df, value_cols=["v"], limit=limit)
        .orderBy("timestamp")
        .collect()
    ]

    assert len(got) == len(expected)
    for i, (g, e) in enumerate(zip(got, expected)):
        e_null = e is None or (isinstance(e, float) and math.isnan(e))
        assert (g is None) == e_null, (i, g, e, values, steps, limit)
        if g is not None:
            assert math.isclose(g, e, rel_tol=1e-9, abs_tol=1e-9), (
                i,
                g,
                e,
                values,
                steps,
                limit,
            )


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.integers(0, 500), min_size=1, max_size=20, unique=True),
    st.lists(st.integers(0, 500), min_size=1, max_size=20, unique=True),
    st.sampled_from([None, 5, 50]),
)
def test_asof_backward_matches_merge_asof_randomized(spark, lts, rts, tol):
    from solarboat_data_pipeline_spark.operators.timeseries import (
        asof_join_backward,
    )

    lts, rts = sorted(lts), sorted(rts)
    base = 1_700_000_000
    left_p = pd.DataFrame({"timestamp": pd.to_datetime([base + t for t in lts], unit="s")})
    right_p = pd.DataFrame(
        {
            "timestamp": pd.to_datetime([base + t for t in rts], unit="s"),
            "v": [float(t) for t in rts],
        }
    )
    kw = {"tolerance": pd.Timedelta(seconds=tol)} if tol is not None else {}
    expected = pd.merge_asof(left_p, right_p, on="timestamp", **kw)["v"].tolist()

    left = spark.createDataFrame(
        [(base + t,) for t in lts], "epoch long"
    ).select(F.timestamp_seconds("epoch").alias("timestamp"))
    right = spark.createDataFrame(
        [(base + t, float(t)) for t in rts], "epoch long, v double"
    ).select(F.timestamp_seconds("epoch").alias("timestamp"), "v")
    got = [
        r["v"]
        for r in asof_join_backward(
            left, right, value_cols=["v"], tolerance_seconds=tol
        )
        .orderBy("timestamp")
        .collect()
    ]

    assert len(got) == len(expected)
    for g, e in zip(got, expected):
        e_null = e is None or (isinstance(e, float) and math.isnan(e))
        assert (g is None) == e_null, (lts, rts, tol, got, expected)
        if g is not None:
            assert math.isclose(g, e), (lts, rts, tol)
