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
    buffered: bool = False,
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
    """
    if buffered:
        return _stream_asof_buffered(
            left, right, "backward", key_cols, ts_col, value_cols,
            tolerance_seconds=tolerance_seconds, clamp_forward=False,
            state_ttl_seconds=state_ttl_seconds,
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
    """
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
    tol_us = None if tolerance_seconds is None else int(tolerance_seconds * 1e6)
    ttl_ms = None if state_ttl_seconds is None else int(state_ttl_seconds * 1000)
    linear = mode == "linear"
    # the union makes left payload columns nullable, so Arrow hands them
    # to pandas widened (bigint → float64 with NaN); storing a float in
    # an array<bigint> state field silently nulls it — coerce each
    # buffered value back to its declared state type
    _CONV = {
        "tinyint": int, "smallint": int, "int": int, "bigint": int,
        "float": float, "double": float, "string": str, "boolean": bool,
    }
    left_convs = [_CONV.get(t, lambda x: x) for t in left_types]

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
            rb_v = [
                pd.Series(list(st[off + 1 + i]), dtype="float64").to_numpy()
                for i in range(nv)
            ]
            off2 = off + 1 + nv
            lb_ts = np.asarray(st[off2], dtype="int64")
            lb_p = [list(st[off2 + 1 + i]) for i in range(nl)]
        else:
            carried_row_ts = None
            car = [(None, None)] * nv
            rb_ts = np.empty(0, dtype="int64")
            rb_v = [np.empty(0, dtype="float64") for _ in range(nv)]
            lb_ts = np.empty(0, dtype="int64")
            lb_p = [[] for _ in range(nl)]
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
            is_right = (pdf["__src"] == 0).to_numpy()
            if is_right.any():
                rb_ts = np.concatenate([rb_ts, ts_us[is_right]])
                for i, c in enumerate(value_cols):
                    newv = pdf[c].astype("float64").to_numpy()[is_right]
                    rb_v[i] = np.concatenate([rb_v[i], newv])
                # stable: arrival order is the tie-break among equal ts,
                # matching the batch kernel's plan-order tie semantics
                order = np.argsort(rb_ts, kind="stable")
                rb_ts = rb_ts[order]
                rb_v = [v[order] for v in rb_v]
            is_left = ~is_right
            if is_left.any():
                lb_ts = np.concatenate([lb_ts, ts_us[is_left]])
                for i, c in enumerate(left_cols):
                    vals = pdf[c][is_left]
                    conv = left_convs[i]
                    lb_p[i].extend(
                        None if pd.isna(x) else conv(x) for x in vals.tolist()
                    )

        # Spark's watermark is MILLISECOND-floored (the max event time is
        # truncated to ms before the delay is subtracted), so it never
        # strictly passes the stream's max event time — comparing at µs
        # would strand a left row in the watermark's own millisecond
        # forever (measured: the max-ts row of a finite stream never
        # emitted). Emit at ms granularity, matching the engine's own
        # late-row granularity; disorder WITHIN one millisecond is the
        # engine's blind spot, not this kernel's.
        emit = (lb_ts // 1000) <= wm_ms
        if emit.any():
            L = lb_ts[emit]
            idx = np.searchsorted(rb_ts, L, side="right")
            has_prev_pos = idx > 0
            prev_pos = np.maximum(idx - 1, 0)
            out = {}
            rb_ts_f = rb_ts.astype("float64")
            with np.errstate(invalid="ignore", divide="ignore"):
                nanL = np.full(len(L), np.nan)
                for i, c in enumerate(value_cols):
                    v = rb_v[i]
                    if len(rb_ts) == 0:
                        # empty right buffer: indexing below would fail
                        # (np.where evaluates both branches) — everything
                        # falls back to the carried row
                        bv = bt = nanL
                    else:
                        nn = ~np.isnan(v)
                        p_v = pd.Series(v).ffill().to_numpy()
                        p_ts = pd.Series(
                            np.where(nn, rb_ts_f, np.nan)
                        ).ffill().to_numpy()
                        bv = np.where(has_prev_pos, p_v[prev_pos], np.nan)
                        bt = np.where(has_prev_pos, p_ts[prev_pos], np.nan)
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
                        if len(rb_ts) == 0:
                            next_v = next_ts = nanL
                        else:
                            n_v = pd.Series(v).bfill().to_numpy()
                            n_ts = pd.Series(
                                np.where(nn, rb_ts_f, np.nan)
                            ).bfill().to_numpy()
                            in_buf = idx < len(rb_ts)
                            take = np.minimum(idx, len(rb_ts) - 1)
                            next_v = np.where(in_buf, n_v[take], np.nan)
                            next_ts = np.where(in_buf, n_ts[take], np.nan)
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
                        out[c] = res
                    else:
                        res = prev_v
                        if tol_us is not None:
                            brt = nanL if len(rb_ts) == 0 else np.where(
                                has_prev_pos, rb_ts_f[prev_pos], np.nan
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
                        out[c] = res
            opdf = pd.DataFrame({
                **{c: k for c, k in zip(key_cols, key)},
                ts_col: pd.to_datetime(L * 1000),
                **{
                    c: np.asarray(lb_p[i], dtype=object)[emit]
                    for i, c in enumerate(left_cols)
                },
                **out,
            }, columns=[*key_cols, ts_col, *left_cols, *value_cols])
            yield opdf
            keep = ~emit
            lb_ts = lb_ts[keep]
            lb_p = [list(np.asarray(p, dtype=object)[keep]) for p in lb_p]

        # compact rights at-or-before the watermark into the carried row
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
            *[
                [None if np.isnan(x) else float(x) for x in v]
                for v in rb_v
            ],
            lb_ts.tolist(),
            *lb_p,
        ))
        if len(lb_ts) or len(rb_ts):
            # pending work: flush on the next watermark advance
            state.setTimeoutTimestamp(wm_ms + 1)
        elif ttl_ms is not None:
            state.setTimeoutTimestamp(wm_ms + max(ttl_ms, 1))

    return u.groupBy(*key_cols).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def stream_asof_linear(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str] = ("series",),
    ts_col: str = "timestamp",
    value_cols: Sequence[str] | None = None,
    clamp_forward: bool = True,
    state_ttl_seconds: float | None = None,
) -> DataFrame:
    """J3 as a TRUE stateful stream: each left row gets the time-weighted
    linear blend of the surrounding right-side samples — the streaming
    analogue of :func:`..operators.timeseries.asof_join_linear`
    (reference semantics ``lib/unifier_with_forecast_data.py:62-75``),
    on the watermark-buffered machinery of :func:`_stream_asof_buffered`
    (which see, for the emission/disorder contract). Requires a
    watermark on the LEFT stream."""
    return _stream_asof_buffered(
        left, right, "linear", key_cols, ts_col, value_cols,
        tolerance_seconds=None, clamp_forward=clamp_forward,
        state_ttl_seconds=state_ttl_seconds,
    )
