#!/usr/bin/env python
"""Time a subset of registered bench rows with bench.py's methodology
(noop sink, 3 repeats, min+median), plus per-row /proc/stat steal
deltas so a contended sample is visibly contended.

    python scripts/bench_subset.py [sf_dir] name [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _steal_ticks():
    try:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()
        return int(parts[8])
    except Exception:
        return None


def main() -> None:
    import __spark_entry__ as entry_mod
    from solarboat_data_pipeline_spark import get_spark

    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark(app_name="bench-subset")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    out = {}
    for name in names:
        fn = qs[name]
        samples, steals = [], []
        for i in range(3):
            spark.sparkContext.setJobDescription(f"{name}#{i}")
            s0 = _steal_ticks()
            t0 = time.monotonic()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.monotonic() - t0
            s1 = _steal_ticks()
            samples.append(dt)
            steals.append(None if s0 is None or s1 is None else s1 - s0)
        out[name] = {
            "min": round(min(samples), 3),
            "median": round(sorted(samples)[1], 3),
            "steal_ticks": steals,
        }
        print(name, json.dumps(out[name]), flush=True)
    print(json.dumps({"subset": out, "sf_dir": sf_dir}))


if __name__ == "__main__":
    main()
