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
        # a key's micro-batch arrives as MULTIPLE Arrow chunks with no
        # cross-chunk ordering guarantee (~10k rows each), so sorting
        # chunk-by-chunk silently mis-fills rows that straddle a chunk
        # boundary out of time order (caught by scripts/stream_smoke.py
        # at 10 M events: 45 straddling rows). Materialize the key's
        # batch and sort ONCE — per-key-per-batch memory, bounded by the
        # micro-batch size (maxFilesPerTrigger), not by stream length.
        chunks = [p for p in pdfs if len(p)]
        if chunks:
            pdf = (pd.concat(chunks, ignore_index=True)
                   if len(chunks) > 1 else chunks[0])
            pdf = pdf.sort_values(ts_col)
            # vectorized carry: ffill within the batch, then the leading
            # null run (rows before the batch's first valid sample) takes
            # the value carried in state from previous batches
            filled = pdf[value_col].astype("float64").ffill()
            if last is not None:
                filled = filled.fillna(last)
            non_null = filled.dropna()
            if len(non_null):
                last = float(non_null.iloc[-1])
            out = pdf[[*key_cols, ts_col, value_col]].copy()
            out[out_col] = filled
            yield out
        state.update((last,))

    return df.groupBy(*key_cols).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
