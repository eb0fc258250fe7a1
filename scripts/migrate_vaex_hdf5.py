#!/usr/bin/env python
"""One-time migration of the reference's vaex-HDF5 outputs to Parquet.

The reference pipeline persists processed chunks as vaex HDF5 exports
(``lib/canparser.py:333-339``); this engine's interchange format is
Parquet. Run this ONCE over existing artifacts:

    python scripts/migrate_vaex_hdf5.py OUT_DIR SRC.hdf5 [SRC2.hdf5 ...] \
        [--timestamp-col NAME[:unit]]

``--timestamp-col`` converts a numeric epoch column to a real timestamp
column (unit one of s/ms/us/ns, default ns — the reference's pandas
datetime64[ns] index exports as epoch nanoseconds). Repeatable.

Uses h5py when installed; otherwise the built-in pure-numpy reader for
the h5py-default subset vaex writes (sources/hdf5_migrate.py — raises
with the precise reason on anything outside that subset). Driver-side
by design: this is a one-time migration, not a distributed data path.
"""

import argparse
import sys

sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("out_dir")
    ap.add_argument("sources", nargs="+")
    ap.add_argument(
        "--timestamp-col", action="append", default=[],
        metavar="NAME[:unit]",
    )
    args = ap.parse_args()
    ts_cols = {}
    for spec in args.timestamp_col:
        name, _, unit = spec.partition(":")
        ts_cols[name] = unit or "ns"

    from solarboat_data_pipeline_spark import get_spark
    from solarboat_data_pipeline_spark.sources.hdf5_migrate import (
        migrate_vaex_hdf5,
    )

    spark = get_spark(app_name="migrate_vaex_hdf5")
    n = migrate_vaex_hdf5(
        spark, args.sources, args.out_dir, timestamp_cols=ts_cols
    )
    print(f"migrated {n} rows from {len(args.sources)} file(s) "
          f"to {args.out_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
