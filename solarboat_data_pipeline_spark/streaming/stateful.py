"""Custom stateful streaming operator: cross-batch forward fill.

The reference interpolates per chunk and accepts gap artifacts at chunk
boundaries (``lib/resampler.py:100``, SURVEY §2.7). The streaming engine
can do strictly better: ``applyInPandasWithState`` carries each series'
last valid sample across micro-batches, so a gap spanning a batch boundary
still fills.

State is one scalar per series key — constant memory per key regardless of
stream length. Within a micro-batch rows are sorted by event time; across
batches the fill is correct when the source delivers batches in event-time
order (true for file sources processed in file order — the batch analogue
is chunk order). Late data beyond that ordering would need the windowed
aggregate path instead.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stream_ffill(
    df: DataFrame,
    key_cols: Sequence[str] = ("series",),
    ts_col: str = "timestamp",
    value_col: str = "value",
    out_col: str = "filled",
) -> DataFrame:
    """Per-key forward fill with state carried across micro-batches.

    Output: key cols + (ts_col, value_col, out_col) where ``out_col`` is
    the last non-null ``value_col`` at-or-before each row's timestamp —
    including values seen in PREVIOUS micro-batches.
    """
    key_fields = ", ".join(
        f"{c} {df.schema[c].dataType.simpleString()}" for c in key_cols
    )
    out_schema = (
        f"{key_fields}, {ts_col} timestamp, {value_col} double, {out_col} double"
    )
    state_schema = "last double"

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (last,) = state.get if state.exists else (None,)
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            filled = []
            for v in pdf[value_col]:
                if pd.notna(v):
                    last = float(v)
                filled.append(last)
            out = pdf[[*key_cols, ts_col, value_col]].copy()
            out[out_col] = pd.Series(filled, index=pdf.index, dtype="float64")
            yield out
        state.update((last,))

    return df.groupBy(*key_cols).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
