#!/usr/bin/env python
"""10M-row smoke for the scale-path kernels (operators/scale.py).

For each single-series ordered operator this materializes the GLOBAL form
(one unpartitioned window — the semantics reference) and the BUCKETED scale
form on the same 10M-row synthetic series, times both, and then
row-joins the two outputs to bound their divergence. Exact-carry kernels
(sessionize, interpolation) must match bit-for-bit; accumulating kernels
(cumulative sum, trapezoid) are allowed relative drift < 1e-9 — the two
forms add the same numbers in different orders, so last-ulp drift is
expected and anything beyond it is a carry bug.

Run from the repo root:
    python scripts/scale_smoke.py [n_rows]
Prints one JSON line per kernel + a summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from solarboat_data_pipeline_spark import get_spark  # noqa: E402
from solarboat_data_pipeline_spark.operators import scale as sc  # noqa: E402
from solarboat_data_pipeline_spark.operators import timeseries as ts  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
BUCKETS = 64
REL_TOL = 1e-9


def series(spark):
    """Irregular single series: ~1 Hz with deterministic sub-second jitter
    (strictly monotone in event_id, so no order ties), 5% nulls, values
    with enough spread to catch carry mistakes."""
    return spark.range(N).select(
        F.col("id").alias("event_id"),
        F.timestamp_micros(
            F.lit(1_600_000_000_000_000)
            + F.col("id") * 1_000_000
            + F.pmod(F.hash("id"), 997_000)
        ).alias("ts"),
        F.when(
            F.pmod(F.hash("id", F.lit(1)), 20) != 0,
            (F.pmod(F.hash("id", F.lit(2)), 100_000) / 100.0) - 300.0,
        ).alias("value"),
    )


def timed_noop(df):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 2)


def divergence(g, s, out_col):
    gg = g.select(F.col("event_id").alias("id"), F.col(out_col).alias("g"))
    ss = s.select(F.col("event_id").alias("id"), F.col(out_col).alias("s"))
    r = (
        gg.join(ss, "id", "full")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (F.col("g").isNull() != F.col("s").isNull()).cast("long")
            ).alias("null_mismatch"),
            F.max(
                F.abs(F.col("g") - F.col("s"))
                / F.greatest(F.abs("g"), F.abs("s"), F.lit(1.0))
            ).alias("max_rel"),
        )
        .first()
    )
    return r["n"], r["null_mismatch"], r["max_rel"]


def main() -> None:
    spark = get_spark(app_name="scale-smoke")
    df = series(spark).localCheckpoint()  # freeze the input for both forms

    results = {}

    def case(name, global_fn, scaled_fn, out_col, exact=False):
        g, s = global_fn(), scaled_fn()
        t_g = timed_noop(g)
        t_s = timed_noop(s)
        n, null_mm, max_rel = divergence(g, s, out_col)
        # the full join's row count equals each side's count exactly when
        # both forms produced the same id set
        ng, ns = g.count(), s.count()
        tol = 0.0 if exact else REL_TOL
        ok = (
            n == ng == ns
            and n > 0
            and null_mm == 0
            and (max_rel is None or max_rel <= tol)
        )
        results[name] = {
            "rows": n,
            "global_sec": t_g,
            "scaled_sec": t_s,
            "null_mismatches": null_mm,
            "max_rel_divergence": max_rel,
            "agree": ok,
        }
        print(json.dumps({name: results[name]}), flush=True)

    case(
        "cumulative_sum",
        lambda: ts.cumulative_sum(
            df, "value", "out", order_cols=["ts", "event_id"]
        ),
        lambda: sc.cumulative_sum(
            df, "value", "out", ts_col="ts", tiebreak_cols=["event_id"],
            num_buckets=BUCKETS,
        ),
        "out",
    )

    case(
        "trapezoid_integral",
        lambda: ts.trapezoid_integral(df, "value", "out", ts_col="ts"),
        lambda: sc.trapezoid_integral(
            df, "value", "out", ts_col="ts", tiebreak_cols=["event_id"],
            num_buckets=BUCKETS,
        ),
        "out",
    )

    case(
        "sessionize",
        lambda: ts.sessionize(df, ts_col="ts", gap_seconds=2.5, out_col="out"),
        lambda: sc.sessionize(
            df, ts_col="ts", gap_seconds=2.5, out_col="out",
            tiebreak_cols=["event_id"], num_buckets=BUCKETS,
        ),
        "out",
        exact=True,
    )

    # as-of join: left = every 3rd point, right = the valued points; both
    # forms produce (event_id, v) — the carried most-recent right value
    left = df.where(F.col("event_id") % 3 == 0).select("event_id", "ts")
    right = df.where(F.col("value").isNotNull()).select(
        "ts", F.col("value").alias("v")
    )
    import solarboat_data_pipeline_spark.operators.timeseries as _ts

    case(
        "asof_join_backward",
        lambda: _ts.asof_join_backward(left, right, on="ts", value_cols=["v"])
        .select("event_id", F.col("v").alias("out")),
        lambda: sc.asof_join_backward(
            left, right, on="ts", value_cols=["v"], num_buckets=BUCKETS
        ).select("event_id", F.col("v").alias("out")),
        "out",
        exact=True,
    )

    case(
        "lag_k",
        lambda: df.withColumn(
            "out",
            F.lag("value", 1000).over(Window.orderBy("ts", "event_id")),
        ),
        lambda: sc.lag_k(
            df, 1000, {"out": "value"}, ts_col="ts",
            tiebreak_cols=["event_id"], num_buckets=BUCKETS,
        ),
        "out",
        exact=True,
    )

    case(
        "global_rank",
        lambda: df.withColumn(
            "out",
            F.row_number()
            .over(Window.orderBy("ts", "event_id"))
            .cast("double"),
        ),
        lambda: sc.global_rank(
            df, out_col="out", ts_col="ts", tiebreak_cols=["event_id"],
            num_buckets=BUCKETS,
        ).withColumn("out", F.col("out").cast("double")),
        "out",
        exact=True,
    )

    interp_in = df.select("event_id", F.col("ts").alias("timestamp"), "value")
    case(
        "interpolate_time",
        lambda: ts.interpolate_time(
            interp_in, value_cols=["value"], limit=None, limit_area="inside"
        ).withColumnRenamed("value", "out"),
        lambda: sc.interpolate_time(
            interp_in, value_cols=["value"], limit=None, limit_area="inside",
            num_buckets=BUCKETS,
        ).withColumnRenamed("value", "out"),
        "out",
        exact=True,
    )

    all_ok = all(c["agree"] for c in results.values())
    print(
        json.dumps(
            {
                "metric": "scale_smoke",
                "rows": N,
                "kernels": len(results),
                "all_agree": all_ok,
            }
        )
    )
    if not all_ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
