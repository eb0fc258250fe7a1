#!/usr/bin/env python
"""End-to-end parse→resample at the REAL published 2022 catalog.

`e2e_report_scale.py` measures rates on a reference-*shaped* synthetic
catalog; this run (VERDICT r03 item 5) drives the identical machinery
with the actual `can_ids_2022.json` from the reference checkout — 24
modules / 56 topics / 233 byte entries / 183 wide columns, including the
strict-units quirks (field-index unit lookup, `_L/_H` fusion,
bitfield-LSB) and the MAB20 damage: topics 64/65 are generated with a
junk sender byte and topic 65 oversized, so they decode ONLY through the
parse-stage workaround (`lib/canparser.py:126-133`; P9). Guards the
quirk paths against regressions at full catalog width and records
rate + survival for SCALE.md.

    python scripts/e2e_real_catalog.py [n_lines]   # default 24_000_000
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import e2e_report_scale as shape  # noqa: E402  (reuses generator + stages)

from solarboat_data_pipeline_spark import get_spark  # noqa: E402
from solarboat_data_pipeline_spark.catalog import CanCatalog  # noqa: E402
from solarboat_data_pipeline_spark.pipeline import (  # noqa: E402
    parse_stage,
    resample_stage,
)
from solarboat_data_pipeline_spark.sources.sinks import write_parquet  # noqa: E402

N_LINES = int(sys.argv[1]) if len(sys.argv) > 1 else 24_000_000
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REF_CATALOG = "/root/reference/can_ids_2022.json"
WORK = "/tmp/e2e_real_catalog"
UNKNOWN_SIG = "01"  # not a 2022 module signature (0xff IS one)


def main() -> None:
    spark = get_spark(app_name="e2e-real-catalog")
    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(WORK)

    catalog = CanCatalog.load(REF_CATALOG)  # strict_units quirks on
    n_topics = sum(1 for _ in catalog.iter_topics())
    sigs = {m.signature for m, _ in catalog.iter_topics()}
    assert int(UNKNOWN_SIG, 16) not in sigs
    n_cols = len(catalog.wide_columns())

    corpus = os.path.join(WORK, "candump")
    gen_sec = shape.generate_corpus(
        spark, catalog, corpus,
        unknown_sig_hex=UNKNOWN_SIG, mab20=True, n_lines=N_LINES,
    )
    print(json.dumps({
        "stage": "generate", "catalog": "can_ids_2022.json (reference)",
        "lines": N_LINES, "topics": n_topics, "wide_columns": n_cols,
        "sec": gen_sec,
    }), flush=True)

    # survival: per-topic. Base planted-valid is 991/1000; the MAB20
    # workaround additionally rescues the unknown-signature class on
    # topics 64 and 65 (it rewrites their signature unconditionally) and
    # the oversize class on topic 65 (it truncates before the size
    # guard). A topic whose payload is under 2 bytes NEVER parses: the
    # reference's frame regex requires `(?:[0-9a-f]{2}){2,8}`
    # (lib/canparser.py:279), so the real catalog's size-1 GENERIC
    # placeholder topic is unreachable in the reference too — this
    # engine reproduces that exactly (sources/candump.py pattern).
    # Topics are uniform 1/n_topics.
    expect = 0.0
    for _, top in catalog.iter_topics():
        if top.size < 2 or not top.signals:
            continue  # regex-unreachable (or nothing to decode)
        frac = 0.991
        if top.topic_id == 64:
            frac += 0.005
        elif top.topic_id == 65:
            frac += 0.005 + 0.002
        expect += frac / n_topics

    sparse_out = os.path.join(WORK, "parsed_sparse.parquet")

    def run_parse() -> float:
        t0 = time.perf_counter()
        write_parquet(
            parse_stage(spark, corpus, catalog, mab20_workaround=True),
            sparse_out, mode="overwrite",
        )
        return round(time.perf_counter() - t0, 2)

    cold = run_parse()
    steady = run_parse()
    rows = spark.read.parquet(sparse_out).count()
    survival = rows / N_LINES
    lps = N_LINES / steady
    print(json.dumps({
        "stage": "parse", "rows_out": rows,
        "survival": round(survival, 5), "expect_survival": round(expect, 5),
        "cold_sec": cold, "sec": steady,
        "lines_per_sec": round(lps),
        "lines_per_sec_per_core": round(lps / CPUS),
        "ms_per_line_per_core": round(CPUS / lps * 1000, 4),
    }), flush=True)

    res_out = os.path.join(WORK, "resampled_1s.parquet")
    t0 = time.perf_counter()
    write_parquet(
        resample_stage(spark.read.parquet(sparse_out), 1.0),
        res_out, mode="overwrite",
    )
    res_sec = round(time.perf_counter() - t0, 2)
    res_rows = spark.read.parquet(res_out).count()
    print(json.dumps({
        "stage": "resample", "rows_out": res_rows, "sec": res_sec,
    }), flush=True)

    ok = abs(survival - expect) < 5e-4 and res_rows > 0
    print(json.dumps({
        "summary": "e2e_real_catalog", "lines": N_LINES,
        "wide_columns": n_cols, "survival_ok": ok,
    }), flush=True)
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
