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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _ts_ns(s: pd.Series) -> pd.Series:
    """Event-time column → int64 NANOSECONDS, with the unit pinned.

    Arrow may hand ``applyInPandasWithState`` a timestamp column as
    datetime64[ns] OR datetime64[us] (pandas ≥ 2 preserves Arrow's unit);
    a bare ``astype('int64')`` would silently be off by 1000× in the
    [us] case, corrupting every staleness/tolerance comparison. Convert
    to datetime64[ns] explicitly first (tz-aware values go through UTC)."""
    s = pd.to_datetime(s)
    if getattr(s.dt, "tz", None) is not None:
        s = s.dt.tz_convert("UTC").dt.tz_localize(None)
    return s.astype("datetime64[ns]").astype("int64")


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
    buffered: bool | str = False,
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

    Cross-batch ordering contract (default, ``buffered=False``): correct
    when the source delivers micro-batches in event-time order per key
    (file sources in file order — the reference's chunk order);
    intra-batch disorder is handled by the sort; state is O(1) per key.
    ``buffered=True`` lifts the ordering requirement entirely: the
    watermark-buffered kernel (:func:`_stream_asof_buffered`) holds
    rows until the event-time watermark passes them, so ANY disorder
    within the ``withWatermark`` delay yields the exact batch-kernel
    answer, at the cost of O(disorder window) state per key. The
    buffered path REQUIRES a watermark on the left stream.
    ``buffered="auto"`` selects per key from OBSERVED disorder: a key
    stays on an in-order fast path (lefts emit immediately — only the
    watermark window's rights ride state) until the first batch whose
    minimum event time is at-or-below something the key already saw,
    then flips permanently to pure watermark-buffered emission with the
    buffer intact, so post-flip rows get the exact buffered answer; see
    :func:`_stream_asof_buffered` for the exact contract. Use ``True``
    when disorder is expected throughout, ``"auto"`` when the stream is
    normally in-order and disorder is the exception.
    """
    if buffered:
        if buffered not in (True, "auto"):
            raise ValueError(
                f"buffered must be False, True, or 'auto'; got {buffered!r}"
            )
        return _stream_asof_buffered(
            left, right, "backward", key_cols, ts_col, value_cols,
            tolerance_seconds=tolerance_seconds, clamp_forward=False,
            state_ttl_seconds=state_ttl_seconds,
            fast_path=buffered == "auto",
        )
    u, left_cols, value_cols = _asof_inputs(
        left, right, key_cols, ts_col, value_cols
    )

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
            ts_ns = _ts_ns(pdf[ts_col])
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


def _asof_inputs(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_cols: Sequence[str] | None,
):
    """Shared validation + tagged-union construction for the streaming
    as-of joins. Returns (union, left_cols, value_cols)."""
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
            "streaming as-of value columns must be numeric (they ride "
            f"the state as doubles); non-numeric: {bad_types}"
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
    return lhs.unionByName(rhs), left_cols, value_cols


def _stream_asof_buffered(
    left: DataFrame,
    right: DataFrame,
    mode: str,
    key_cols: Sequence[str],
    ts_col: str,
    value_cols: Sequence[str] | None,
    tolerance_seconds: float | None,
    clamp_forward: bool,
    state_ttl_seconds: float | None,
    fast_path: bool = False,
) -> DataFrame:
    """Watermark-buffered streaming as-of join — the cross-batch
    DISORDER-TOLERANT kernel behind :func:`stream_asof_backward`
    (``buffered=True``) and :func:`stream_asof_linear`.

    The in-order kernel's one semantics cliff is that a right row
    arriving one micro-batch late with an earlier timestamp is consumed
    as if newest. Here, per-key state holds a small SORTED BUFFER of
    right rows plus the pending left rows, and a left row is emitted
    only once the event-time watermark has passed its timestamp — at
    which point, under the watermark contract (a row arrives before the
    watermark passes its event time, i.e. disorder is bounded by the
    ``withWatermark`` delay), every right row at-or-before it has
    arrived, so the backward match is EXACT regardless of arrival order.
    Requires a watermark on the LEFT stream (the query clock — see
    :func:`stream_asof_backward` on why not the right stream); without
    one the watermark stays at 0 and nothing is ever emitted.

    Emission per micro-batch: pending lefts with ``ts <= watermark``
    emit; right rows at-or-before the watermark compact into a carried
    (per-column last-non-null, plus the last right ROW's timestamp for
    the tolerance reference — the batch kernel's exact semantics); later
    rights stay buffered. A ``wm + 1`` event-time timeout re-arms while
    anything is pending, so the flush happens on the next watermark
    advance even if the key receives no new rows (and, on a finite
    ``availableNow`` stream, in the engine's final no-data batch).
    State per key is O(rows in the disorder window), the standard bound
    for a watermarked stream join — vs O(1) for the in-order kernel.

    ``mode="linear"`` implements the J3 analogue (the batch
    :func:`..operators.timeseries.asof_join_linear`, reference semantics
    ``lib/unifier_with_forecast_data.py:62-75``): each left row blends
    the surrounding right samples time-linearly (per column: previous
    non-null at-or-before, next non-null strictly after; exact-ts
    matches pass through via the zero-weight blend; ``clamp_forward``
    carries the last value past the final right sample, else null; null
    before the first). The NEXT sample is not watermark-bounded — a
    left row emits when the watermark passes it, using the rights known
    at that moment: with in-order (or bounded-disorder) delivery the
    next right has always arrived by then except when a per-key right
    gap spans more than the watermark delay plus one micro-batch, and
    on a finite stream the final flush sees complete data, so batch
    parity is exact (measured: scripts/stream_smoke.py).

    Rows arriving LATE (behind the watermark — the engine does not drop
    them for stateful queries; measured) are handled best-effort: a late
    left emits immediately with an exact backward match (its rights all
    arrived long ago); a late right serves future lefts but cannot
    retroactively fix already-emitted ones; a late right older than the
    compaction frontier is reconciled against the carried row by
    timestamp, never blindly overwritten.

    Millisecond-boundary contract (ADVICE r7): Spark's watermark is
    ms-floored, so emission compares at ms granularity — a left emits
    once its MILLISECOND is at-or-below the watermark ms (comparing at
    µs would strand the stream's max row forever: the watermark never
    strictly passes its own millisecond). Exactness therefore assumes,
    beyond the watermark contract, that no right row lands in an
    already-watermarked millisecond in a LATER batch: an event with
    event time equal to the watermark is not "late" to the engine, so a
    right sharing the watermark's exact millisecond may still arrive
    after the left in that millisecond emitted. Equal-ms disorder
    ACROSS batches is the engine-granularity blind spot; within one
    batch it is fully resolved by the sort.

    Integer left payloads ride per-key state as float64 (the tagged
    union makes them nullable, and Arrow widens nullable ints before
    the kernel sees them), so values with magnitude above 2^53 cannot
    be buffered exactly — the kernel RAISES on ingest rather than emit
    silently-rounded payloads (ADVICE r7).

    ``fast_path=True`` (the ``buffered="auto"`` kernels): each key
    starts on an IN-ORDER fast path — while every incoming batch's
    minimum event time is strictly above everything the key has seen,
    lefts emit WITHOUT waiting for the watermark (backward: the whole
    batch, since every right at-or-before each left has arrived;
    linear: every left strictly below the decided-next frontier), so no
    left ever rides state. Rights still buffer until the watermark
    passes them — never compacted beyond it — which is what makes the
    FLIP sound: at the first observed cross-batch disorder the key
    flips permanently to pure watermark emission, and because the
    buffer still holds every right above the watermark, rows from then
    on get the EXACT buffered semantics (a disordered-but-not-late left
    finds its true previous sample in the buffer; rows emitted before
    the flip got the in-order answer — append-mode output cannot be
    retracted). On a genuinely in-order stream auto equals the buffered
    kernel's answer on every row while keeping per-key state to the
    rights of the watermark window (measured:
    scripts/stream_smoke.py)."""
    u, left_cols, value_cols = _asof_inputs(
        left, right, key_cols, ts_col, value_cols
    )
    from pyspark.sql.types import TimestampNTZType, TimestampType

    left_types = [left.schema[c].dataType.simpleString() for c in left_cols]
    bad = [
        c for c, t in zip(left_cols, left_types)
        if "<" in t or isinstance(
            left.schema[c].dataType, (TimestampType, TimestampNTZType)
        )
    ]
    if bad:
        raise ValueError(
            "buffered streaming as-of left payload columns must be atomic "
            f"non-timestamp types (they ride array-typed state): {bad}"
        )

    key_fields = ", ".join(
        f"{c} {left.schema[c].dataType.simpleString()}" for c in key_cols
    )
    left_fields = "".join(
        f", {c} {t}" for c, t in zip(left_cols, left_types)
    )
    val_fields = "".join(f", {c} double" for c in value_cols)
    out_schema = f"{key_fields}, {ts_col} timestamp{left_fields}{val_fields}"
    nv, nl = len(value_cols), len(left_cols)
    state_schema = (
        "carried_row_ts long"
        + "".join(f", car_ts_{i} long, car_v_{i} double" for i in range(nv))
        + ", rb_ts array<long>"
        + "".join(f", rb_v_{i} array<double>" for i in range(nv))
        + ", lb_ts array<long>"
        + "".join(f", lb_{i} array<{t}>" for i, t in enumerate(left_types))
    )
    if fast_path:
        # auto mode tracks per-key delivery order: ok_fast flips to
        # false (permanently) on the first observed cross-batch disorder
        state_schema += ", ok_fast boolean, max_us long"
    tol_us = None if tolerance_seconds is None else int(tolerance_seconds * 1e6)
    ttl_ms = None if state_ttl_seconds is None else int(state_ttl_seconds * 1000)
    fn = _asof_kernel(
        key_cols, ts_col, left_cols, left_types, list(value_cols),
        tol_us, clamp_forward, mode == "linear", fast_path, ttl_ms,
    )
    return u.groupBy(*key_cols).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def _asof_kernel(
    key_cols: Sequence[str],
    ts_col: str,
    left_cols: Sequence[str],
    left_types: Sequence[str],
    value_cols: Sequence[str],
    tol_us: int | None,
    clamp_forward: bool,
    linear: bool,
    fast_path: bool,
    ttl_ms: int | None,
):
    """Build the per-key state-machine function behind
    :func:`_stream_asof_buffered` — module-level so tests can drive it
    directly with a fake ``GroupState`` (hypothesis property tests run
    thousands of randomized batch schedules without paying a streaming
    query per example). The semantics contract lives in
    :func:`_stream_asof_buffered`'s docstring."""
    nv, nl = len(value_cols), len(left_cols)
    # The union makes left payload columns nullable, so Arrow hands them
    # to pandas widened (bigint → float64 with NaN). The kernel buffers
    # numeric payloads canonically as float64 ndarrays (vectorized — no
    # per-row conversion on the ingest hot path) and restores the
    # declared integer type only at the state/emission boundaries;
    # integer magnitudes above 2^53 would round silently in float64, so
    # they raise at ingest (ADVICE r7).
    _INT_T = {"tinyint", "smallint", "int", "bigint"}
    int_col = [t in _INT_T for t in left_types]
    num_col = [t in _INT_T or t in ("float", "double") for t in left_types]
    bool_col = [t == "boolean" for t in left_types]
    TWO53 = float(1 << 53)

    def _big_int_msg(c: str) -> str:
        return (
            f"buffered streaming as-of: integer left payload column {c!r} "
            "has values with magnitude at-or-above 2^53, which cannot ride the "
            "float64-widened buffered state exactly; cast to string or "
            "rescale upstream (the kernel raises rather than emit "
            "silently-rounded payloads)"
        )

    def _f64(lst) -> np.ndarray:
        """State list (None-able doubles) → float64 ndarray, None → NaN."""
        if not lst:
            return np.empty(0, dtype="float64")
        return pd.Series(lst, dtype="float64").to_numpy()

    def _obj(lst) -> np.ndarray:
        return np.array(lst, dtype=object) if lst else np.empty(0, dtype=object)

    def _num_state(arr: np.ndarray) -> list:
        out = arr.tolist()
        if np.isnan(arr).any():
            out = [None if x != x else x for x in out]
        return out

    def _persist_left(i: int, arr: np.ndarray) -> list:
        """Pending-left column → state list in its DECLARED type (only
        the carry-over remainder pays this per-element cost)."""
        if int_col[i]:
            return [None if x != x else int(x) for x in arr.tolist()]
        if num_col[i]:
            return _num_state(arr)
        if bool_col[i]:
            return [
                None if x is None or (isinstance(x, float) and x != x)
                else bool(x)
                for x in arr.tolist()
            ]
        return [
            None if x is None or (isinstance(x, float) and x != x) else x
            for x in arr.tolist()
        ]

    def _ffill_idx(nn: np.ndarray) -> np.ndarray:
        """Index of the last True at-or-before each position (-1: none)."""
        idx = np.where(nn, np.arange(nn.size), -1)
        np.maximum.accumulate(idx, out=idx)
        return idx

    def _bfill_idx(nn: np.ndarray) -> np.ndarray:
        """Index of the next True at-or-after each position (size: none)."""
        idx = np.where(nn, np.arange(nn.size), nn.size)
        return np.minimum.accumulate(idx[::-1])[::-1]

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            st = state.get
            carried_row_ts = st[0]
            car = [(st[1 + 2 * i], st[2 + 2 * i]) for i in range(nv)]
            off = 1 + 2 * nv
            rb_ts = np.asarray(st[off], dtype="int64")
            rb_v = [_f64(list(st[off + 1 + i])) for i in range(nv)]
            off2 = off + 1 + nv
            lb_ts = np.asarray(st[off2], dtype="int64")
            lb_c = [
                _f64(list(st[off2 + 1 + i])) if num_col[i]
                else _obj(list(st[off2 + 1 + i]))
                for i in range(nl)
            ]
            if fast_path:
                ok_fast = bool(st[off2 + 1 + nl])
                max_us = st[off2 + 2 + nl]
            else:
                ok_fast, max_us = False, None
        else:
            carried_row_ts = None
            car = [(None, None)] * nv
            rb_ts = np.empty(0, dtype="int64")
            rb_v = [np.empty(0, dtype="float64") for _ in range(nv)]
            lb_ts = np.empty(0, dtype="int64")
            lb_c = [
                np.empty(0, dtype="float64" if num_col[i] else object)
                for i in range(nl)
            ]
            ok_fast, max_us = fast_path, None
        chunks = [p for p in pdfs if len(p)]
        wm_ms = state.getCurrentWatermarkMs()
        wm_us = wm_ms * 1000

        if state.hasTimedOut and len(lb_ts) == 0 and len(rb_ts) == 0:
            if ttl_ms is not None:
                # TTL expiry: the key was silent past the TTL — drop the
                # carried right row so state stays bounded
                state.remove()
            # without a TTL, a timeout with empty buffers carries no
            # work: keep the carried row (NoTimeout-equivalent contract)
            return

        if chunks:
            pdf = (pd.concat(chunks, ignore_index=True)
                   if len(chunks) > 1 else chunks[0])
            ts_us = (_ts_ns(pdf[ts_col]) // 1000).to_numpy()
            src_arr = pdf["__src"].to_numpy()
            is_right = src_arr == 0

            if fast_path and ok_fast:
                # auto mode: in-order delivery is tracked, and rows
                # still flow through the BUFFERED machinery — the fast
                # part is purely a WIDER EMISSION MASK below (backward:
                # every left of an in-order batch emits immediately;
                # linear: every left below the decided-next frontier).
                # Rights are never compacted beyond the watermark, so
                # when the first cross-batch disorder flips the key the
                # buffer still holds everything a disordered-but-not-
                # late row may need — post-flip rows get the EXACT
                # buffered semantics (a round-8 review caught the
                # previous design consuming rights eagerly, which let a
                # post-flip left match a future right through the
                # carried pair).
                if max_us is not None and int(ts_us.min()) <= max_us:
                    # first observed cross-batch disorder: permanent
                    # flip (rows already emitted keep their in-order
                    # answers — append output cannot retract)
                    ok_fast = False
                else:
                    max_us = int(ts_us.max())

            n_r = int(is_right.sum())
            if n_r:
                # merge the SORTED new batch into the already-sorted
                # buffer (O(n+m), no re-sort of the old part); side=
                # "right" keeps arrival order as the tie-break among
                # equal ts, matching the batch kernel's plan-order ties
                r_ts = ts_us[is_right]
                order = np.argsort(r_ts, kind="stable")
                r_ts = r_ts[order]
                newv = [
                    pdf[c].astype("float64").to_numpy()[is_right][order]
                    for c in value_cols
                ]
                if rb_ts.size:
                    ins = np.searchsorted(rb_ts, r_ts, side="right")
                    rb_ts = np.insert(rb_ts, ins, r_ts)
                    rb_v = [
                        np.insert(v, ins, nw) for v, nw in zip(rb_v, newv)
                    ]
                else:
                    rb_ts, rb_v = r_ts, newv
            is_left_m = ~is_right
            if n_r < len(ts_us):
                l_ts_new = ts_us[is_left_m]
                lb_ts = (
                    np.concatenate([lb_ts, l_ts_new])
                    if lb_ts.size else l_ts_new
                )
                for i, c in enumerate(left_cols):
                    col = pdf[c]
                    if num_col[i]:
                        arr = col.astype("float64").to_numpy()[is_left_m]
                        if int_col[i] and np.any(np.abs(arr) >= TWO53):
                            raise ValueError(_big_int_msg(c))
                    else:
                        arr = np.asarray(col.to_numpy(), dtype=object)[
                            is_left_m
                        ]
                    lb_c[i] = (
                        np.concatenate([lb_c[i], arr])
                        if lb_c[i].size else arr
                    )

        # Spark's watermark is MILLISECOND-floored (the max event time is
        # truncated to ms before the delay is subtracted), so it never
        # strictly passes the stream's max event time — comparing at µs
        # would strand a left row in the watermark's own millisecond
        # forever (measured: the max-ts row of a finite stream never
        # emitted). Emit at ms granularity, matching the engine's own
        # late-row granularity; equal-ms disorder across batches is the
        # engine-granularity blind spot (see docstring), not this
        # kernel's.
        emit = (lb_ts // 1000) <= wm_ms
        if fast_path and ok_fast and lb_ts.size:
            if not linear:
                # backward auto, in-order so far: every right at-or-
                # before any pending left has arrived (pending lefts
                # are all <= max_us and future batches are strictly
                # above it), so every pending left's match is decided —
                # emit them all now
                emit = np.ones(lb_ts.size, dtype=bool)
            elif rb_ts.size and wm_ms > 0:
                # FRONTIER emission (linear auto, in-order so far): a
                # left strictly below every column's last non-null
                # right sample has BOTH surrounding samples decided —
                # under in-order delivery no future right can land
                # at-or-before the frontier — so it emits now instead
                # of waiting for the watermark. Strictly below: a left
                # exactly AT a column's last non-null sample still
                # needs the next batch to decide clamp-vs-blend when
                # clamp_forward=False.
                # BATCH-AWARE (round 9): the widened mask only engages
                # once the watermark clock has started (wm_ms > 0).
                # Under a zero watermark — the global first batch, and
                # the ONLY data batch of a single-file availableNow
                # fixture — frontier emission cannot retire state any
                # earlier than the first real watermark batch would,
                # but it does add a second per-key emission round
                # (yield + DataFrame construction against the ~1 ms/
                # key/batch framework floor, measured r8: 4.5 s vs
                # 3.6 s on the bench fixture). Gated, auto is
                # bit-identical to buffered on single-batch inputs and
                # keeps the multi-batch frontier win from batch 2 on,
                # so the kernel no longer needs per-fixture selection.
                # (Unlike backward's emit-all above, linear can never
                # fully drain in the data batch — tail lefts at/after
                # the last right sample always need finalization — so
                # skipping the widened mask at wm=0 costs nothing.)
                fr = None
                for v in rb_v:
                    nn = np.flatnonzero(~np.isnan(v))
                    if not nn.size:
                        fr = -1
                        break
                    t = int(rb_ts[nn[-1]])
                    fr = t if fr is None else min(fr, t)
                if fr is not None and fr >= 0:
                    emit = emit | (lb_ts < fr)
        if emit.any():
            L = lb_ts[emit]
            m = rb_ts.size
            idx = np.searchsorted(rb_ts, L, side="right")
            pp = idx - 1
            rb_ts_f = rb_ts.astype("float64")
            nanL = np.full(L.size, np.nan)
            data = dict(zip(key_cols, key))
            data[ts_col] = pd.to_datetime(L * 1000)
            for i, c in enumerate(left_cols):
                arr = lb_c[i][emit]
                data[c] = pd.array(arr, dtype="Int64") if int_col[i] else arr
            with np.errstate(invalid="ignore", divide="ignore"):
                for i, c in enumerate(value_cols):
                    v = rb_v[i]
                    if m == 0:
                        # empty right buffer: indexing below would fail
                        # (np.where evaluates both branches) — everything
                        # falls back to the carried row
                        bv = bt = nanL
                    else:
                        nn = ~np.isnan(v)
                        sel = _ffill_idx(nn)[np.maximum(pp, 0)]
                        valid = (pp >= 0) & (sel >= 0)
                        safe = np.maximum(sel, 0)
                        bv = np.where(valid, v[safe], np.nan)
                        bt = np.where(valid, rb_ts_f[safe], np.nan)
                    c_ts, c_v = car[i]
                    c_ts_f = np.nan if c_ts is None else float(c_ts)
                    c_v_f = np.nan if c_v is None else float(c_v)
                    # a late right older than the carried row must not
                    # shadow it: pick whichever last-non-null is newest
                    use_buf = ~np.isnan(bt) & (
                        np.isnan(c_ts_f) | (bt >= c_ts_f)
                    )
                    prev_v = np.where(use_buf, bv, c_v_f)
                    prev_ts = np.where(use_buf, bt, c_ts_f)
                    if linear:
                        if m == 0:
                            next_v = next_ts = nanL
                        else:
                            nsel = _bfill_idx(nn)[np.minimum(idx, m - 1)]
                            validn = (idx < m) & (nsel < m)
                            safen = np.minimum(nsel, m - 1)
                            next_v = np.where(validn, v[safen], np.nan)
                            next_ts = np.where(validn, rb_ts_f[safen], np.nan)
                        both = ~np.isnan(prev_v) & ~np.isnan(next_v)
                        # same operation order as the batch kernel / SQL
                        # oracle: pv + (nv - pv) * (t - pt) / (nt - pt)
                        blend = prev_v + (next_v - prev_v) * (
                            L - prev_ts
                        ) / (next_ts - prev_ts)
                        blend = np.where(next_ts == prev_ts, prev_v, blend)
                        res = np.where(both, blend, np.nan)
                        if clamp_forward:
                            clamp = ~np.isnan(prev_v) & np.isnan(next_v)
                            res = np.where(clamp, prev_v, res)
                        data[c] = res
                    else:
                        res = prev_v
                        if tol_us is not None:
                            brt = nanL if m == 0 else np.where(
                                pp >= 0, rb_ts_f[np.maximum(pp, 0)], np.nan
                            )
                            cr_f = (
                                np.nan if carried_row_ts is None
                                else float(carried_row_ts)
                            )
                            ref = np.where(
                                np.isnan(brt), cr_f, np.maximum(
                                    brt, np.nan_to_num(cr_f, nan=-np.inf)
                                )
                            )
                            stale = np.isnan(ref) | ((L - ref) > tol_us)
                            res = np.where(stale, np.nan, res)
                        data[c] = res
            yield pd.DataFrame(
                data, columns=[*key_cols, ts_col, *left_cols, *value_cols]
            )
            keep = ~emit
            lb_ts = lb_ts[keep]
            lb_c = [a[keep] for a in lb_c]

        # compact rights at-or-before the watermark into the carried
        # row — NEVER beyond it, even on the auto fast path: rights
        # above the watermark may still be needed as exact previous
        # samples by a disordered-but-not-late left after a flip
        fidx = int(np.searchsorted(rb_ts, wm_us, side="right"))
        if fidx > 0:
            t_last = int(rb_ts[fidx - 1])
            if carried_row_ts is None or t_last >= carried_row_ts:
                carried_row_ts = t_last
            for i in range(nv):
                seg = rb_v[i][:fidx]
                nnpos = np.flatnonzero(~np.isnan(seg))
                if len(nnpos):
                    j = nnpos[-1]
                    t_j = int(rb_ts[j])
                    if car[i][0] is None or t_j >= car[i][0]:
                        car[i] = (t_j, float(seg[j]))
            rb_ts = rb_ts[fidx:]
            rb_v = [v[fidx:] for v in rb_v]

        state.update((
            carried_row_ts,
            *[x for pair in car for x in pair],
            rb_ts.tolist(),
            *[_num_state(v) for v in rb_v],
            lb_ts.tolist(),
            *[_persist_left(i, lb_c[i]) for i in range(nl)],
            *((ok_fast, max_us) if fast_path else ()),
        ))
        if len(lb_ts) or len(rb_ts):
            # pending work: flush on the next watermark advance
            state.setTimeoutTimestamp(wm_ms + 1)
        elif ttl_ms is not None:
            state.setTimeoutTimestamp(wm_ms + max(ttl_ms, 1))

    return fn


def stream_asof_linear(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str] = ("series",),
    ts_col: str = "timestamp",
    value_cols: Sequence[str] | None = None,
    clamp_forward: bool = True,
    state_ttl_seconds: float | None = None,
    auto: bool = False,
) -> DataFrame:
    """J3 as a TRUE stateful stream: each left row gets the time-weighted
    linear blend of the surrounding right-side samples — the streaming
    analogue of :func:`..operators.timeseries.asof_join_linear`
    (reference semantics ``lib/unifier_with_forecast_data.py:62-75``),
    on the watermark-buffered machinery of :func:`_stream_asof_buffered`
    (which see, for the emission/disorder contract). Requires a
    watermark on the LEFT stream.

    ``auto=True`` enables the observed-disorder fast path: while a key's
    delivery stays in event-time order, a left row emits as soon as its
    NEXT surrounding sample is decided (a later non-null right exists in
    every value column) instead of waiting for the watermark — most rows
    emit in their arrival batch and pending-left state holds only the
    undecided tail past the last right sample (rights keep buffering to
    the watermark, as in every mode). The first observed cross-batch
    disorder flips the key permanently back to pure watermark-buffered
    semantics with the right buffer intact, so post-flip rows get the
    exact buffered answer (rows emitted before the flip got the in-order
    answer; append output cannot be retracted)."""
    return _stream_asof_buffered(
        left, right, "linear", key_cols, ts_col, value_cols,
        tolerance_seconds=None, clamp_forward=clamp_forward,
        state_ttl_seconds=state_ttl_seconds, fast_path=auto,
    )
