#!/usr/bin/env python
"""One-shot DuckDB-oracle sweep of every registered query at an arbitrary
scale factor — the same compare as the driver / tests/test_queries_oracle
(row count, sorted column names, order-insensitive value digest), but
runnable at sf0.1 where scale-dependent plan changes (AQE re-plans,
broadcast-threshold flips, skew handling) could diverge from sf0.01.

    python scripts/oracle_sweep.py [sf_dir] [name_prefix ...]

Prints one line per query and a JSON summary; exit 1 on any mismatch.
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ONLY = sys.argv[2:]
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6f}"
    return str(v)


def _digest(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(_norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> None:
    import __spark_entry__ as entry_mod
    from solarboat_data_pipeline_spark import get_spark

    spark = get_spark(app_name="oracle-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    if ONLY:
        queries = {
            n: q for n, q in queries.items()
            if any(n.startswith(p) for p in ONLY)
        }

    passed, failed, rows_only = [], [], []
    for name, q in queries.items():
        t0 = time.perf_counter()
        try:
            sdf = q(spark, SF_DIR)
            srows = sdf.collect()
            scols = sdf.columns
            if name not in oracles:
                rows_only.append(name)
                status = "rows_only"
            else:
                res = con.execute(oracles[name])
                dcols = [d[0] for d in res.description]
                drows = res.fetchall()
                ok = (
                    sorted(scols) == sorted(dcols)
                    and len(srows) == len(drows)
                    and _digest(scols, [[r[c] for c in scols] for r in srows])
                    == _digest(dcols, drows)
                )
                (passed if ok else failed).append(name)
                status = "pass" if ok else "FAIL"
        except Exception as exc:  # noqa: BLE001
            failed.append(name)
            status = f"ERROR {type(exc).__name__}: {exc}"[:200]
        print(
            f"{name}: {status} ({time.perf_counter() - t0:.1f}s)", flush=True
        )
    print(
        json.dumps(
            {
                "metric": "oracle_sweep",
                "sf_dir": SF_DIR,
                "pass": len(passed),
                "fail": len(failed),
                "rows_only": len(rows_only),
                "failed_names": failed,
            }
        )
    )
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    main()
