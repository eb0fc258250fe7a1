#!/usr/bin/env python
"""Media-codec decode throughput smoke (round 8, VERDICT r7 item 3).

Measures JPEG decode throughput across the full envelope the engine
claims (baseline 4:4:4 / 4:2:0, DRI restart intervals, progressive
SOF2) on realistic gradient+noise frames, with correctness gates that
must agree before any number is reported:

* decode∘encode fidelity: mean absolute error < 8 per stream (the
  working codec measures ~1-2; a broken Huffman/dequant/IDCT stage
  lands near the ~85 of unrelated noise);
* progressive ≡ baseline BIT-identical decode (same coefficients,
  different entropy layout — the sharpest codec equality);
* DRI ≡ no-DRI BIT-identical decode.

Throughput gate: ≥ 1.0 megapixel/s/core sustained decode (the round-8
LUT+fused-bit-read decoder measures ~2; the r7 bit-by-bit decoder
measured ~0.4 — the gate catches a regression to the old constant
factor while tolerating box noise). Self-checking: exits 1 on any
disagreement. Run: python scripts/scale_smoke_media.py [n_frames]
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from solarboat_data_pipeline_spark.operators.jpeg import (  # noqa: E402
    decode_jpeg,
    encode_jpeg,
)


def frames(n, w=320, h=240):
    rng = np.random.default_rng(7)
    y, x = np.mgrid[0:h, 0:w]
    out = []
    for i in range(n):
        img = np.stack(
            [
                128 + 100 * np.sin(x / 30 + i) + 5 * rng.normal(size=(h, w)),
                128 + 100 * np.cos(y / 25 + i) + 5 * rng.normal(size=(h, w)),
                128 + 80 * np.sin((x + y) / 40 + i)
                + 5 * rng.normal(size=(h, w)),
            ],
            axis=-1,
        )
        out.append(np.clip(img, 0, 255).astype(np.uint8))
    return out


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    w, h = 320, 240
    imgs = frames(n, w, h)
    checks = []

    # build the variant corpus
    streams = []
    for i, img in enumerate(imgs):
        streams.append(
            (
                i,
                encode_jpeg(
                    img.tobytes(), w, h, 3,
                    subsampling="420" if i % 2 else "444",
                    restart_interval=8 if i % 3 == 0 else 0,
                    progressive=(i % 3 == 2),
                ),
            )
        )

    # correctness gates first
    mae_max = 0.0
    for i, s in streams:
        _, _, _, px = decode_jpeg(s)
        got = np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3)
        mae = float(np.mean(np.abs(got.astype(float) - imgs[i].astype(float))))
        mae_max = max(mae_max, mae)
    checks.append({"check": "decode_fidelity_mae_lt_8", "agree": mae_max < 8,
                   "mae_max": round(mae_max, 3)})

    img0 = imgs[0].tobytes()
    base = encode_jpeg(img0, w, h, 3)
    prog = encode_jpeg(img0, w, h, 3, progressive=True)
    checks.append({
        "check": "progressive_equals_baseline_bit_identical",
        "agree": decode_jpeg(base) == decode_jpeg(prog),
    })
    dri = encode_jpeg(img0, w, h, 3, restart_interval=4)
    checks.append({
        "check": "dri_equals_nodri_bit_identical",
        "agree": decode_jpeg(base) == decode_jpeg(dri),
    })

    # throughput (single core, sustained over the whole variant corpus)
    for _, s in streams[:4]:
        decode_jpeg(s)  # warm LUT caches
    t0 = time.perf_counter()
    for _, s in streams:
        decode_jpeg(s)
    wall = time.perf_counter() - t0
    mpps = (n * w * h) / 1e6 / wall
    checks.append({
        "check": "decode_throughput_ge_1_mpps_per_core",
        "agree": mpps >= 1.0,
        "megapixels_per_sec": round(mpps, 3),
        "frames": n,
        "wall_sec": round(wall, 3),
    })

    for c in checks:
        print(json.dumps(c))
    ok = all(c["agree"] for c in checks)
    print(json.dumps({
        "metric": "media_smoke", "all_agree": ok,
        "megapixels_per_sec": round(mpps, 3),
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
