"""Shared stage-metric measurement for the scale smokes — the CANONICAL
copy going forward (scale_smoke_assign.py imports it; the three older
smokes carry the inline copy their recorded artifacts were produced
with, migrate them when their numbers are next regenerated).

Metrics come from the Spark UI REST API, which is fed ASYNCHRONOUSLY by
the listener bus — reading immediately after an action returns can miss
the just-finished stage on a loaded box. ``_run_measured`` therefore
SETTLES: it re-reads the completed-stage snapshot until two consecutive
reads agree (bounded at ~10 s), so the shuffle accounting the smokes
gate on is never a partial view.
"""

from __future__ import annotations

import json
import time
import urllib.request


def _api(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    with urllib.request.urlopen(f"{base}/api/v1/applications{path}") as r:
        return json.loads(r.read())


def _stages(spark):
    app = spark.sparkContext.applicationId
    return _api(spark, f"/{app}/stages?status=complete")


def _stage_ids(spark) -> set[int]:
    return {s["stageId"] for s in _stages(spark)}


def _settled_stages(spark):
    prev = None
    for _ in range(10):
        snap = _stages(spark)
        key = sorted(
            (s["stageId"], s.get("shuffleWriteBytes", 0)) for s in snap
        )
        if key == prev:
            return snap
        prev = key
        time.sleep(1)
    return snap


def run_measured(spark, make_df):
    """Build the frame via ``make_df()`` INSIDE the measured window and
    count() it; return (df, rows, wall_sec, total shuffle write bytes,
    total input bytes read) over every stage either step created. Construction happens inside
    the window because some operators run jobs eagerly at
    DataFrame-construction time (bloom builds, centroid collects)."""
    before = _stage_ids(spark)
    t0 = time.perf_counter()
    df = make_df()
    rows = df.count()
    wall = time.perf_counter() - t0
    new = [s for s in _settled_stages(spark) if s["stageId"] not in before]
    shuffle_write = sum(s.get("shuffleWriteBytes", 0) for s in new)
    input_bytes = sum(s.get("inputBytes", 0) for s in new)
    return df, rows, wall, shuffle_write, input_bytes
