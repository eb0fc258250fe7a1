#!/usr/bin/env python
"""Measure hypervisor steal UNDER FULL LOAD (idle steal is ~0 even on a
badly overcommitted host — steal only manifests when our vCPUs demand
cycles). Burns all cores for N seconds and prints the stolen fraction
of capacity: the expected wall-time inflation of a CPU-bound job run
right now.

    python scripts/steal_probe.py [seconds]
"""
from __future__ import annotations

import multiprocessing as mp
import os
import sys
import time


def _steal_ticks() -> int:
    with open("/proc/stat") as fh:
        return int(fh.readline().split()[8])


def _burn(seconds: float) -> None:
    t0 = time.monotonic()
    x = 0
    while time.monotonic() - t0 < seconds:
        x += 1


def main() -> None:
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 5.0
    ncpu = os.cpu_count() or 1
    s0 = _steal_ticks()
    procs = [mp.Process(target=_burn, args=(seconds,)) for _ in range(ncpu)]
    for p in procs:
        p.start()
    for p in procs:
        p.join()
    stolen = (_steal_ticks() - s0) / 100.0
    frac = stolen / (seconds * ncpu)
    print(f"stolen {stolen:.1f} CPU-s over {seconds:.0f}s x {ncpu} cores "
          f"= {100 * frac:.1f}% of capacity")
    # exit code signals quiet (0) vs contended (1) for shell loops
    sys.exit(0 if frac < 0.03 else 1)


if __name__ == "__main__":
    main()
