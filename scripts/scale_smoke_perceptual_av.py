"""Audio + video perceptual near-dup at corpus scale, correctness-gated.

Same gate as scripts/scale_smoke_phash.py applied to the other two
modalities: run the full synthesize → decode → fingerprint → banded
Hamming join flow, then check the recovered pair set EXACTLY against
the formula-derived reference (distinct fingerprints bucketed by the
same pigeonhole bands — proven lossless for max_hamming < bands — then
expanded by class membership).

Usage: python scripts/scale_smoke_perceptual_av.py [n_audio] [n_video]
(defaults 100_000 and 20_000 — video clips carry ~10 uncompressed
frames each, so the byte volume per item is ~30x the audio items')
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

N_AUDIO = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
N_VIDEO = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000


def _audio_fp(g: int, v: int) -> int:
    n = g % 480 + 64
    s = pc._audio_dup_samples(g, n) * (2 if v in (2, 3) else 1)
    if v == 3:
        s = s.copy()
        s[g % n] += 1009
    S = pc.AUDIO_FP_SEGMENTS
    edges = (np.arange(S + 1, dtype=np.int64) * n) // S
    segs = np.add.reduceat(s, edges[:-1])
    bits = (segs[1:] > segs[:-1]).astype(np.uint64)
    return sum(int(bits[k]) << k for k in range(S - 1))


def _video_fp(g: int, v: int) -> int:
    cx = np.arange(pc.PHASH_CELL_W, dtype=np.int64)[None, :]
    cy = np.arange(pc.PHASH_CELL_H, dtype=np.int64)[:, None]
    cells = pc._video_dup_cells(g, cx, cy)
    if v == 3:
        cells = cells.copy()
        r, c = g % pc.PHASH_CELL_H, g % pc.PHASH_CELL_W
        cells[r, c] = (cells[r, c] + 97) % 200
    bits = (cells[:, 1:] > cells[:, :-1]).astype(np.uint64)
    return sum(
        int(bits[r, c]) << (r * 9 + c) for r in range(7) for c in range(9)
    )


def _reference_pairs(hashes: dict[int, int]) -> dict:
    """All pairs at Hamming <= 2 via the pigeonhole-banded reference
    over distinct hash classes (exact; O(classes), not O(N²))."""
    by_hash = defaultdict(list)
    for mid, h in hashes.items():
        by_hash[h].append(mid)
    want = {}
    for ids in by_hash.values():
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                want[(ids[i], ids[j])] = 0
    buckets = defaultdict(set)
    for h in by_hash:
        for t in range(3):
            buckets[(t, (h >> (t * 21)) & ((1 << 21) - 1))].add(h)
    cand = set()
    for b in buckets.values():
        bl = sorted(b)
        for i in range(len(bl)):
            for j in range(i + 1, len(bl)):
                cand.add((bl[i], bl[j]))
    for ha, hb in cand:
        d = bin(ha ^ hb).count("1")
        if d <= 2:
            for x in by_hash[ha]:
                for y in by_hash[hb]:
                    want[(min(x, y), max(x, y))] = d
    return want


def main() -> None:
    spark = get_spark(app_name="perceptual-av-smoke")
    out = []

    for label, n, synth, pair_fn, fp in (
        ("audio", N_AUDIO, pc.synthesize_audio_dup_media,
         pc.audio_near_dup_pairs, _audio_fp),
        ("video", N_VIDEO, pc.synthesize_video_dup_media,
         pc.video_near_dup_pairs, _video_fp),
    ):
        docs = spark.range(0, n).withColumnRenamed("id", "doc_id")
        t0 = time.perf_counter()
        got = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in pair_fn(synth(docs)).collect()
        }
        wall = time.perf_counter() - t0
        want = _reference_pairs({m: fp(m // 4, m % 4) for m in range(n)})
        ok = got == want
        rec = {
            "smoke": f"{label}_near_dup",
            "n_items": n,
            "n_pairs": len(got),
            "pair_set_exact": ok,
            "wall_sec": round(wall, 2),
            "items_per_sec": round(n / wall),
        }
        out.append(rec)
        print(json.dumps(rec), flush=True)
        if not ok:
            extra = [p for p in got if p not in want][:5]
            missing = [p for p in want if p not in got][:5]
            print(f"MISMATCH {label} extra={extra} missing={missing}",
                  file=sys.stderr)
            sys.exit(1)
    spark.stop()


if __name__ == "__main__":
    main()
