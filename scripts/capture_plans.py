#!/usr/bin/env python
"""Capture .explain("formatted") for named driver queries into plans/r14/.

    python scripts/capture_plans.py <suffix> <query> [query ...]

Writes plans/r14/<query>_<suffix>.txt for each query (suffix = before|after).
"""
from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from solarboat_data_pipeline_spark import driver_queries, get_spark

    suffix = sys.argv[1]
    names = sys.argv[2:]
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r14",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = driver_queries.queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} ({suffix}) — explain('formatted') at {SF_DIR}\n")
            f.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
