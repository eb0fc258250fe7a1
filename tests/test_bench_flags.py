"""Bench-harness self-flagging: the r14 burst detector.

A short hypervisor-steal burst mid-board can inflate a few rows'
medians 10x while both calibration anchors, the board-MEDIAN spread,
and every published min-sample stay clean (observed in round 14:
280 stolen CPU-s, txt_decontaminate median 30.2 s vs min 2.4 s,
contended=False). ``_burst_rows`` is the detector that catches that
shape; these tests pin its contract so a refactor cannot silently
widen or narrow what triggers a bench retry.
"""

import importlib.util
import os

import pytest

_BENCH = os.path.join(os.path.dirname(__file__), os.pardir, "bench.py")


@pytest.fixture(scope="module")
def burst_rows():
    # bench.py is a script, not a package module; load it directly but
    # only for the pure helper (no SparkSession is created at import).
    spec = importlib.util.spec_from_file_location("bench_module", _BENCH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod._burst_rows


def test_quiet_board_flags_nothing(burst_rows):
    timings = {"a": 1.0, "b": 0.4, "c": 2.5}
    medians = {"a": 1.2, "b": 0.5, "c": 2.6}
    assert burst_rows(timings, medians) == []


def test_burst_row_flags(burst_rows):
    # the observed r14 shape: one row's median 12x its min
    timings = {"txt": 2.447, "other": 1.0}
    medians = {"txt": 30.179, "other": 1.05}
    assert burst_rows(timings, medians) == ["txt"]


def test_tiny_rows_exempt(burst_rows):
    # sub-0.3s mins spread widely from scheduler jitter alone; they must
    # not trigger a full-board retry
    timings = {"tiny": 0.05}
    medians = {"tiny": 0.4}
    assert burst_rows(timings, medians) == []


def test_none_and_missing_medians_safe(burst_rows):
    timings = {"a": 1.0, "b": None, "c": 0.9}
    medians = {"a": None, "c": 0.95}
    assert burst_rows(timings, medians) == []
