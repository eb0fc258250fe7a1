"""Probe-lane throughput smoke: single-core structure-parse rates over
realistically-sized compressed media, correctness-gated BEFORE any
number is reported (every probed field must match the generator).

The probe kernels (mp4/vp9/mp3) run embarrassingly parallel under
``mapInPandas`` — no shuffle, no state, one payload per row — so the
per-core figure IS the cluster figure.  What matters at 100 TB is the
constant factor per byte of container walked, measured here over:

* a long flat MP4 (100k samples: the stsz/stco tables dominate);
* a CMAF stream (2,000 fragments x 30 samples: moof walk dominates);
* an hour-scale MP3 (150k frames: per-frame header arithmetic);
* a long IVF/VP9 (50k frames: per-frame bit-level header parse);
* an Annex-B elementary stream (~50 MB: byte-scan start-code search).

Also demonstrates the seek-table point: reading ONE sample via its
(offset, size) range touches that many bytes, not the file.

Usage: python scripts/scale_smoke_probe.py [scale]   (default 1)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from solarboat_data_pipeline_spark.operators import mp3, mp4, vp9  # noqa: E402

SCALE = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0


def report(name: str, n_items: int, data_len: int, build_s: float, probe_s: float, ok: bool):
    print(
        json.dumps(
            {
                "probe": name,
                "items": n_items,
                "mb": round(data_len / 1e6, 1),
                "build_sec": round(build_s, 2),
                "probe_sec": round(probe_s, 3),
                "items_per_sec": round(n_items / probe_s) if probe_s else None,
                "mb_per_sec": round(data_len / 1e6 / probe_s, 1) if probe_s else None,
                "correct": ok,
            }
        ),
        flush=True,
    )
    if not ok:
        sys.exit(1)


def main() -> None:
    # --- flat MP4, 100k samples --------------------------------------------
    n = int(100_000 * SCALE)
    sizes = [50 + (i * 13) % 100 for i in range(n)]
    t0 = time.perf_counter()
    data = mp4.encode_mp4(640, 480, sizes, sample_delta=40)
    t1 = time.perf_counter()
    info = mp4.probe_mp4(data)
    t2 = time.perf_counter()
    ok = info["n_samples"] == n and info["sample_bytes"] == sum(sizes)
    report("mp4_probe_100k_samples", n, len(data), t1 - t0, t2 - t1, ok)

    t2 = time.perf_counter()
    idx = mp4.sample_index(data)
    t3 = time.perf_counter()
    ok = len(idx) == n and idx[-1]["offset"] + idx[-1]["size"] == len(data)
    report("mp4_sample_index_100k", n, len(data), 0.0, t3 - t2, ok)

    # the ranged-GET point: one sample's bytes, not the file's
    mid = idx[n // 2]
    blob = data[mid["offset"] : mid["offset"] + mid["size"]]
    print(
        json.dumps(
            {
                "probe": "ranged_get_demo",
                "file_mb": round(len(data) / 1e6, 1),
                "one_sample_bytes": len(blob),
                "note": "seek-table extraction touches size bytes, not the file",
            }
        ),
        flush=True,
    )

    # --- CMAF, 2000 fragments x 30 -----------------------------------------
    n_frags = int(2_000 * SCALE)
    frags = [[50 + ((f * 30 + i) * 13) % 100 for i in range(30)] for f in range(n_frags)]
    t0 = time.perf_counter()
    data = mp4.encode_fmp4(640, 480, frags, sample_delta=40)
    t1 = time.perf_counter()
    idx = mp4.fragment_index(data)
    t2 = time.perf_counter()
    total = n_frags * 30
    ok = len(idx) == total and idx[-1]["fragment"] == n_frags
    report("fmp4_fragment_index_2k_moofs", total, len(data), t1 - t0, t2 - t1, ok)

    # --- MP3, 150k frames (~1h05m at 26 ms/frame) ---------------------------
    nf = int(150_000 * SCALE)
    t0 = time.perf_counter()
    data = mp3.encode_mp3_frames(nf, bitrate_index=9, rate_index=0, pad_every=3, id3v2_bytes=500)
    t1 = time.perf_counter()
    info = mp3.probe_mp3(data)
    t2 = time.perf_counter()
    ok = (
        info["n_frames"] == nf
        and info["total_samples"] == nf * 1152
        and info["audio_bytes"] == len(data) - 510
    )
    report("mp3_probe_150k_frames", nf, len(data), t1 - t0, t2 - t1, ok)

    # --- IVF/VP9, 50k frames -------------------------------------------------
    nv = int(50_000 * SCALE)
    t0 = time.perf_counter()
    key = vp9.encode_vp9_keyframe_header(1280, 720)
    inter = vp9.encode_vp9_inter_header(0)
    frames = [
        (key if i % 30 == 0 else inter) + bytes(200 + (i * 13) % 100)
        for i in range(nv)
    ]
    data = vp9.encode_ivf(1280, 720, frames)
    t1 = time.perf_counter()
    info = vp9.probe_ivf(data)
    t2 = time.perf_counter()
    ok = info["n_frames"] == nv and info["n_keyframes"] == (nv + 29) // 30
    report("ivf_vp9_probe_50k_frames", nv, len(data), t1 - t0, t2 - t1, ok)

    # --- Annex-B, ~50 MB ------------------------------------------------------
    nn = int(100_000 * SCALE)
    t0 = time.perf_counter()
    unit = b"\x00\x00\x00\x01\x41" + bytes((j % 254) + 1 for j in range(500))
    idr = b"\x00\x00\x00\x01\x65" + bytes((j % 254) + 1 for j in range(500))
    es = b"".join(idr if i % 50 == 0 else unit for i in range(nn))
    t1 = time.perf_counter()
    units = mp4.nal_scan(es)
    t2 = time.perf_counter()
    n_idr = sum(1 for u in units if u["is_idr"])
    ok = len(units) == nn and n_idr == (nn + 49) // 50
    report("annexb_nal_scan_100k_units", nn, len(es), t1 - t0, t2 - t1, ok)


if __name__ == "__main__":
    main()
