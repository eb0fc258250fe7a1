"""Property tests for the buffered/auto streaming as-of KERNEL
(`streaming.stateful._asof_kernel`), driven directly with a fake
GroupState — thousands of randomized event sequences, batch schedules
and watermark progressions per run, no streaming query per example.

The harness reproduces the engine contract the kernel is built
against: the watermark is ms-floored `max event time seen in PRIOR
batches - delay`, and generation bounds each event's arrival jitter
STRICTLY under the delay, so no event is ever at-or-below the
watermark millisecond when it arrives (the exactness precondition;
also excludes the documented equal-ms blind spot). Under that
contract:

* buffered backward: every left at-or-below the final watermark emits
  EXACTLY ONCE with the full-stream batch as-of answer; nothing above
  the final watermark emits;
* auto backward on an IN-ORDER stream: every left emits exactly once
  with the batch answer (including above the watermark — the fast
  path holds nothing back);
* auto backward under disorder: exactly-once still holds for
  everything at-or-below the final watermark, and no left ever emits
  twice;
* buffered linear: exactly-once + completeness, and every emitted
  left whose NEXT right sample had arrived by its emission batch
  carries the full-stream time-weighted blend (the next sample is not
  watermark-bounded — the kernel's documented caveat — so only those
  rows are value-decidable).
"""

from __future__ import annotations

import math
import os

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from solarboat_data_pipeline_spark.streaming.stateful import _asof_kernel

# deep-fuzz dial: ASOF_PROP_EXAMPLES=2000 for a one-off soak
_EX = int(os.environ.get("ASOF_PROP_EXAMPLES", "150"))


class FakeState:
    """The GroupState surface the kernel touches."""

    def __init__(self):
        self._v = None
        self.hasTimedOut = False
        self._wm = 0

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def remove(self):
        self._v = None

    def setTimeoutTimestamp(self, ms):
        pass

    def getCurrentWatermarkMs(self):
        return self._wm


def drive(events, batch_sizes, delay_ms, linear, fast_path,
          clamp_forward=True, tol_us=None):
    """Run the kernel over `events` (arrival order) split into batches.

    events: list of (ts_ms, src, value) — src 1 = left, 0 = right;
    value is the right sample (None allowed) and ignored for lefts
    (each left carries its arrival index as the `event_id` payload).
    Returns ({event_id: (emit_batch, v)}, final_wm_ms).
    """
    fn = _asof_kernel(
        key_cols=("k",), ts_col="ts", left_cols=["event_id"],
        left_types=["bigint"], value_cols=["v"], tol_us=tol_us,
        clamp_forward=clamp_forward, linear=linear, fast_path=fast_path,
        ttl_ms=None,
    )
    state = FakeState()
    emitted: dict[int, tuple[int, float | None]] = {}
    pos = 0
    max_seen_ms = None
    batch_no = 0

    def run_batch(rows):
        nonlocal batch_no
        if rows:
            pdf = pd.DataFrame(
                {
                    "k": ["a"] * len(rows),
                    "ts": pd.to_datetime(
                        np.array([r[0] for r in rows], dtype="int64")
                        * 1_000_000
                    ),
                    "event_id": [
                        float(r[3]) if r[1] == 1 else np.nan for r in rows
                    ],
                    "v": [
                        float(r[2])
                        if (r[1] == 0 and r[2] is not None) else np.nan
                        for r in rows
                    ],
                    "__src": [r[1] for r in rows],
                }
            )
            chunks = iter([pdf])
        else:
            chunks = iter([])
        for out in fn(("a",), chunks, state):
            for _, r in out.iterrows():
                eid = int(r["event_id"])
                assert eid not in emitted, f"event {eid} emitted twice"
                v = r["v"]
                emitted[eid] = (
                    batch_no, None if (isinstance(v, float) and v != v) else v
                )
        batch_no += 1

    seq = [(ts, src, val, i) for i, (ts, src, val) in enumerate(events)]
    for size in batch_sizes:
        rows = seq[pos: pos + size]
        pos += size
        run_batch(rows)
        if rows:
            mx = max(r[0] for r in rows)
            max_seen_ms = mx if max_seen_ms is None else max(max_seen_ms, mx)
        state._wm = max(0, (max_seen_ms or 0) - delay_ms)
    # the engine's final no-data batches at the terminal watermark
    final_wm = max(0, (max_seen_ms or 0) - delay_ms)
    state._wm = final_wm
    run_batch([])
    run_batch([])
    return emitted, final_wm


def ref_backward(events, ts_l):
    best = None
    for ts, src, val in events:
        if src == 0 and val is not None and ts <= ts_l:
            if best is None or ts >= best[0]:
                best = (ts, val)
    return None if best is None else best[1]


def ref_linear(events, ts_l, clamp=True):
    prev = nxt = None
    for ts, src, val in events:
        if src != 0 or val is None:
            continue
        if ts <= ts_l and (prev is None or ts >= prev[0]):
            prev = (ts, val)
        if ts > ts_l and (nxt is None or ts < nxt[0]):
            nxt = (ts, val)
    if prev is not None and nxt is not None:
        pt, pv = prev
        nt, nv = nxt
        us_l, us_p, us_n = ts_l * 1000, pt * 1000, nt * 1000
        return pv + (nv - pv) * (us_l - us_p) / (us_n - us_p)
    if prev is not None and clamp:
        return prev[1]
    return None


@st.composite
def stream_case(draw, in_order=False):
    n = draw(st.integers(min_value=1, max_value=30))
    ts_ms = draw(
        st.lists(
            st.integers(min_value=1, max_value=400),
            min_size=n, max_size=n, unique=True,
        )
    )
    srcs = draw(st.lists(st.integers(0, 1), min_size=n, max_size=n))
    vals = draw(
        st.lists(
            st.one_of(st.none(), st.integers(-5, 5)),
            min_size=n, max_size=n,
        )
    )
    delay = draw(st.integers(min_value=5, max_value=60))
    events = [
        (t, s, None if v is None else float(v))
        for t, s, v in zip(ts_ms, srcs, vals)
    ]
    if in_order:
        arrival = sorted(events, key=lambda e: e[0])
    else:
        # jitter STRICTLY under the delay: no event is ever at-or-below
        # the watermark ms when it arrives (see module docstring)
        jit = draw(
            st.lists(
                st.integers(min_value=0, max_value=max(0, delay - 2)),
                min_size=n, max_size=n,
            )
        )
        arrival = [
            e for _, e in sorted(
                zip([t + j for (t, _, _), j in zip(events, jit)], events),
                key=lambda p: p[0],
            )
        ]
    cuts = draw(st.lists(st.integers(1, 5), min_size=1, max_size=n))
    sizes, left = [], n
    for c in cuts:
        if left <= 0:
            break
        sizes.append(min(c, left))
        left -= sizes[-1]
    if left > 0:
        sizes.append(left)
    return arrival, sizes, delay


def _lefts(events):
    # event_id = arrival index (the payload the harness assigns)
    return {
        i: ts for i, (ts, src, _v) in enumerate(events) if src == 1
    }


@settings(max_examples=_EX, deadline=None)
@given(stream_case(in_order=False))
def test_buffered_backward_exact_under_bounded_disorder(case):
    events, sizes, delay = case
    emitted, wm = drive(events, sizes, delay, linear=False, fast_path=False)
    lefts = _lefts(events)
    for eid, ts_l in lefts.items():
        if ts_l <= wm:
            assert eid in emitted, (eid, ts_l, wm)
            got = emitted[eid][1]
            want = ref_backward(events, ts_l)
            assert got == want, (eid, ts_l, got, want)
        else:
            assert eid not in emitted, (eid, ts_l, wm)


@settings(max_examples=_EX, deadline=None)
@given(stream_case(in_order=True))
def test_auto_backward_equals_batch_on_in_order_stream(case):
    events, sizes, delay = case
    emitted, _wm = drive(events, sizes, delay, linear=False, fast_path=True)
    lefts = _lefts(events)
    assert set(emitted) == set(lefts)  # fast path holds nothing back
    for eid, ts_l in lefts.items():
        got = emitted[eid][1]
        want = ref_backward(events, ts_l)
        assert got == want, (eid, ts_l, got, want)


@settings(max_examples=_EX, deadline=None)
@given(stream_case(in_order=False))
def test_auto_backward_exactly_once_and_complete_under_disorder(case):
    events, sizes, delay = case
    emitted, wm = drive(events, sizes, delay, linear=False, fast_path=True)
    lefts = _lefts(events)
    for eid, ts_l in lefts.items():
        if ts_l <= wm:
            assert eid in emitted, (eid, ts_l, wm)
    # double emission asserted inside drive(); values above the flip
    # boundary are contractually in-order best-effort, not checked here


@settings(max_examples=_EX, deadline=None)
@given(stream_case(in_order=False), st.integers(min_value=1, max_value=100))
def test_buffered_backward_tolerance_under_disorder(case, tol_ms):
    """The staleness reference is the last right ROW's timestamp (even a
    null-valued sample refreshes it — the batch kernel's semantics)."""
    events, sizes, delay = case
    emitted, wm = drive(
        events, sizes, delay, linear=False, fast_path=False,
        tol_us=tol_ms * 1000,
    )
    lefts = _lefts(events)
    for eid, ts_l in lefts.items():
        if ts_l > wm:
            assert eid not in emitted
            continue
        assert eid in emitted, (eid, ts_l, wm)
        ref_ts = max(
            (ts for ts, src, _v in events if src == 0 and ts <= ts_l),
            default=None,
        )
        if ref_ts is None or (ts_l - ref_ts) > tol_ms:
            want = None
        else:
            want = ref_backward(events, ts_l)
        got = emitted[eid][1]
        assert got == want, (eid, ts_l, got, want, ref_ts)


@settings(max_examples=_EX, deadline=None)
@given(stream_case(in_order=False))
def test_buffered_linear_blend_on_decidable_rows(case):
    events, sizes, delay = case
    emitted, wm = drive(events, sizes, delay, linear=True, fast_path=False)
    lefts = _lefts(events)
    # arrival batch of every event (for next-sample decidability)
    batch_of = {}
    pos = 0
    for b, size in enumerate(sizes):
        for i in range(pos, min(pos + size, len(events))):
            batch_of[i] = b
        pos += size
    for eid, ts_l in lefts.items():
        if ts_l > wm:
            assert eid not in emitted
            continue
        assert eid in emitted, (eid, ts_l, wm)
        # next right sample (full stream): decidable iff it arrived
        # by the left's emission batch
        nxt = None
        for i, (ts, src, val) in enumerate(events):
            if src == 0 and val is not None and ts > ts_l:
                if nxt is None or ts < events[nxt][0]:
                    nxt = i
        emit_b = emitted[eid][0]
        if nxt is not None and batch_of[nxt] > emit_b:
            continue  # undecidable at emission (documented caveat)
        got = emitted[eid][1]
        want = ref_linear(events, ts_l)
        if want is None:
            assert got is None, (eid, got)
        else:
            assert got is not None and math.isclose(
                got, want, rel_tol=1e-12, abs_tol=1e-12
            ), (eid, ts_l, got, want)
