"""H.264 intra pixel-decode throughput smoke, correctness-gated.

Like the probe smoke, the decode kernels run embarrassingly parallel
under ``mapInPandas`` (one payload per row, no shuffle, no state), so
the single-core figure IS the cluster figure. Four content classes pin
the constant factors of the three macroblock paths:

* 720p noise          -> all I_PCM (raw-sample copy; container-walk bound)
* 720p constant       -> one PCM seed + I_16x16 DC/V/H (numpy per MB)
* 320x240 col-stripes -> I_16x16 Vertical propagation
* 320x240 textured, forced I_4x4 -> the 16-blocks-x-9-modes worst case
  (pure-Python §8.3.1 loops: the honest slow path; real corpora hit it
  only on MBs where prediction is exact, since pcm_mae=0 synthesis
  sends everything else down the PCM fast path)

Every figure is gated on exact reconstruction parity (decode == encoder
recon) before being reported.

Usage: python scripts/scale_smoke_h264.py [scale]   (default 1)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from solarboat_data_pipeline_spark.operators import h264

SCALE = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0


def report(name, n_frames, w, h, es_len, enc_s, dec_s, ok):
    px = n_frames * w * h
    print(
        json.dumps(
            {
                "case": name,
                "frames": n_frames,
                "dims": f"{w}x{h}",
                "stream_mb": round(es_len / 1e6, 2),
                "encode_sec": round(enc_s, 2),
                "decode_sec": round(dec_s, 3),
                "luma_px_per_sec": round(px / dec_s) if dec_s else None,
                "mb_per_sec": round(es_len / 1e6 / dec_s, 1) if dec_s else None,
                "correct": ok,
            }
        ),
        flush=True,
    )
    if not ok:
        sys.exit(1)


def run_case(name, frames, w, h, force=None, pcm_mae=0.0, container=False):
    recon: list = []
    t0 = time.perf_counter()
    es = h264.encode_idr_frames(frames, w, h, force=force, pcm_mae=pcm_mae,
                                recon_out=recon)
    enc_s = time.perf_counter() - t0
    if container:
        from solarboat_data_pipeline_spark.operators import mp4

        data = mp4.annexb_to_mp4(es)
        t0 = time.perf_counter()
        out = h264.decode_mp4(data)
        dec_s = time.perf_counter() - t0
        es = data
    else:
        t0 = time.perf_counter()
        out = h264.decode_annexb(es)
        dec_s = time.perf_counter() - t0
    ok = len(out["frames"]) == len(recon) and all(
        np.array_equal(d[i], r[i])
        for d, r in zip(out["frames"], recon)
        for i in range(3)
    )
    report(name, len(frames), w, h, len(es), enc_s, dec_s, ok)


def main() -> None:
    rng = np.random.default_rng(20260816)

    def planes(h, w, kind):
        if kind == "noise":
            y = rng.integers(0, 256, (h, w), dtype=np.uint8)
            cb = rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)
            cr = rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)
        elif kind == "const":
            v = int(rng.integers(0, 256))
            y = np.full((h, w), v, np.uint8)
            cb = np.full((h // 2, w // 2), (v * 3) % 256, np.uint8)
            cr = np.full((h // 2, w // 2), (v * 7) % 256, np.uint8)
        else:  # stripes
            y = np.tile((np.arange(w) * 7 % 256).astype(np.uint8), (h, 1))
            cb = np.tile((np.arange(w // 2) * 3 % 256).astype(np.uint8), (h // 2, 1))
            cr = np.tile((np.arange(w // 2) * 5 % 256).astype(np.uint8), (h // 2, 1))
        return y, cb, cr

    n = max(1, int(3 * SCALE))
    run_case("720p_noise_all_pcm", [planes(720, 1280, "noise") for _ in range(n)], 1280, 720)
    run_case("720p_const_i16_dc", [planes(720, 1280, "const") for _ in range(n)], 1280, 720)
    run_case("320x240_stripes_i16_v", [planes(240, 320, "stripes") for _ in range(3 * n)], 320, 240)
    run_case(
        "320x240_textured_forced_i4",
        [planes(240, 320, "stripes") for _ in range(max(1, n // 3))],
        320, 240, force="i4", pcm_mae=None,
    )
    run_case(
        "320x240_stripes_in_mp4_container",
        [planes(240, 320, "stripes") for _ in range(3 * n)],
        320, 240, container=True,
    )


if __name__ == "__main__":
    main()
