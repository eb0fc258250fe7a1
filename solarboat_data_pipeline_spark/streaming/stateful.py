"""Custom stateful streaming operators: cross-batch forward fill and the
true streaming backward as-of join.

The reference interpolates per chunk and accepts gap artifacts at chunk
boundaries (``lib/resampler.py:100``, SURVEY §2.7), and its GPS
enrichment is a batch backward as-of
(``lib/process_gpx_data.py:158-171``). The streaming engine can do
strictly better: ``applyInPandasWithState`` carries each series' last
valid sample across micro-batches, so a gap (or an as-of match) spanning
a batch boundary still resolves.

State is one scalar (ffill) or one row (as-of) per key — constant memory
per key regardless of stream length, with optional event-time expiry for
the as-of so an unbounded key space cannot grow state forever. Within a
micro-batch rows are sorted by event time; across batches the fill is
correct when the source delivers batches in event-time order (true for
file sources processed in file order — the batch analogue is chunk
order). Late data beyond that ordering would need the windowed aggregate
path instead.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
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


def stream_asof_backward(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str] = ("series",),
    ts_col: str = "timestamp",
    value_cols: Sequence[str] | None = None,
    tolerance_seconds: float | None = None,
    state_ttl_seconds: float | None = None,
) -> DataFrame:
    """J4 as a TRUE stateful stream: each left row gets the most recent
    right-side values at-or-before its timestamp (ties match, same as
    the batch :func:`..operators.timeseries.asof_join_backward`), with
    the last right row per key CARRIED ACROSS MICRO-BATCHES — no
    snap-to-grid approximation, no grid assumption on the right side.

    Both inputs are streaming DataFrames sharing ``key_cols`` and
    ``ts_col``; ``value_cols`` (right-side payloads, numeric — they ride
    the state tuple as doubles) default to everything else on the right.
    The two streams are unioned with a source tag and processed by one
    ``applyInPandasWithState`` — within a batch, rows sort by
    ``(ts, src)`` so a right row at the same timestamp is visible to the
    left row beside it; across batches the per-key state holds the last
    right row's timestamp and values.

    ``tolerance_seconds`` nulls matches staler than the bound (the batch
    kernel's contract). ``state_ttl_seconds`` enables EVENT-TIME EXPIRY:
    a key silent for longer than the TTL (by watermark clock) drops its
    state, bounding total state at (active keys in a TTL window) for
    unbounded key spaces — the 100 TB requirement. Without it, state is
    one row per ever-seen key (``NoTimeout``). Watermark the LEFT stream
    (the query clock) only: Spark's default ``multipleWatermarkPolicy=
    min`` takes the minimum across watermarked inputs, so a watermark on
    a right stream that goes idle pins the global watermark and the TTL
    never fires (measured: an idle watermarked right side froze the
    clock at its last event).

    Cross-batch ordering contract: correct when the source delivers
    micro-batches in event-time order per key (file sources in file
    order — the reference's chunk order); intra-batch disorder is
    handled by the sort.
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (*key_cols, ts_col)]
    value_cols = list(value_cols)
    left_cols = [c for c in left.columns if c not in (*key_cols, ts_col)]
    overlap = set(left_cols) & set(value_cols)
    if overlap:
        raise ValueError(
            f"left payload and right value columns overlap: {sorted(overlap)}"
        )
    from pyspark.sql.types import NumericType

    bad_types = [
        c for c in value_cols
        if not isinstance(right.schema[c].dataType, NumericType)
    ]
    if bad_types:
        # a silent cast("double") would turn every non-numeric value
        # into null — every left row would "match" null with no error
        raise ValueError(
            "stream_asof_backward value columns must be numeric (they "
            f"ride the state tuple as doubles); non-numeric: {bad_types}"
        )

    lhs = left.select(
        *key_cols,
        ts_col,
        *left_cols,
        *[F.lit(None).cast("double").alias(c) for c in value_cols],
        F.lit(1).alias("__src"),
    )
    rhs = right.select(
        *key_cols,
        ts_col,
        *[
            F.lit(None).cast(left.schema[c].dataType.simpleString()).alias(c)
            for c in left_cols
        ],
        *[F.col(c).cast("double").alias(c) for c in value_cols],
        F.lit(0).alias("__src"),
    )
    u = lhs.unionByName(rhs)

    key_fields = ", ".join(
        f"{c} {left.schema[c].dataType.simpleString()}" for c in key_cols
    )
    left_fields = "".join(
        f", {c} {left.schema[c].dataType.simpleString()}" for c in left_cols
    )
    val_fields = "".join(f", {c} double" for c in value_cols)
    out_schema = f"{key_fields}, {ts_col} timestamp{left_fields}{val_fields}"
    state_schema = "last_ts_us long" + "".join(f", {c} double" for c in value_cols)
    tol_ns = None if tolerance_seconds is None else int(tolerance_seconds * 1e9)
    ttl_ms = None if state_ttl_seconds is None else int(state_ttl_seconds * 1000)

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # event-time expiry: the key was silent past the TTL — drop
            # the carried right row so state stays bounded
            state.remove()
            return
        carried = state.get if state.exists else None
        # same chunking caveat as stream_ffill: one key's batch arrives
        # as multiple Arrow chunks with no cross-chunk order guarantee —
        # materialize and sort ONCE (bounded by micro-batch size)
        chunks = [p for p in pdfs if len(p)]
        if chunks:
            pdf = (pd.concat(chunks, ignore_index=True)
                   if len(chunks) > 1 else chunks[0])
            # right rows (src 0) sort before left rows at the same
            # timestamp → ties match, identical to the batch kernel
            pdf = pdf.sort_values([ts_col, "__src"], kind="stable").reset_index(
                drop=True
            )
            is_right = pdf["__src"] == 0
            # nullable Int64, not a float where(): epoch-ns at 2020
            # magnitudes exceeds float64's 2^53 integer range, and a
            # ~256 ns representation error could flip an exact-boundary
            # tolerance comparison
            ts_ns = pdf[ts_col].astype("int64")
            ref_ts = ts_ns.astype("Int64").where(is_right).ffill()
            fills = {}
            for ci, c in enumerate(value_cols):
                filled = pdf[c].astype("float64").where(is_right).ffill()
                if carried is not None and carried[1 + ci] is not None:
                    filled = filled.fillna(carried[1 + ci])
                fills[c] = filled
            if carried is not None and carried[0] is not None:
                ref_ts = ref_ts.fillna(carried[0] * 1000)  # µs → ns
            left_mask = ~is_right
            out = pdf.loc[left_mask, [*key_cols, ts_col, *left_cols]].copy()
            for c in value_cols:
                v = fills[c][left_mask]
                if tol_ns is not None:
                    stale = (ts_ns[left_mask] - ref_ts[left_mask]) > tol_ns
                    v = v.mask(stale.fillna(True))
                out[c] = v
            # carry matches the batch kernel's semantics exactly: the
            # staleness reference is the last right ROW's timestamp, but
            # each value column carries its last NON-NULL value
            # (``last(c, ignorenulls=True)``) — storing the last row's
            # values verbatim loses an earlier non-null when the final
            # right row of a batch is null (measured: 20 boundary
            # mismatches at 1 M events in scripts/stream_smoke.py)
            r_rows = pdf[is_right]
            if len(r_rows) or carried is not None:
                if len(r_rows):
                    new_ts = int(r_rows.iloc[-1][ts_col].value // 1000)
                else:
                    new_ts = carried[0] if carried is not None else None
                new_vals = []
                for c in value_cols:
                    tail = fills[c].iloc[-1] if len(fills[c]) else None
                    new_vals.append(None if pd.isna(tail) else float(tail))
                carried = (new_ts, *new_vals)
            yield out
        if carried is not None:
            state.update(carried)
        if ttl_ms is not None and chunks:
            batch_max_ms = int(max(p[ts_col].max() for p in chunks).value // 1_000_000)
            # a timeout at-or-before the current watermark is an engine
            # error — a batch arriving entirely behind the watermark
            # (late data the caller chose not to drop) must not crash
            # the query, so clamp to watermark + 1 ms (= expire at the
            # next opportunity, which is what a lapsed TTL means)
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(batch_max_ms + ttl_ms, wm + 1))

    timeout = (
        GroupStateTimeout.EventTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return u.groupBy(*key_cols).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=timeout,
    )
