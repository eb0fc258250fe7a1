"""Ranged-GET sample extraction + media-curation composition
(operators/multimodal.py: mp4_sample_seek_table, extract_sample_payloads,
synthesize_mixed_media, probe_media_tolerant): byte-exact slice parity
against the local seek walk, the clean-ValueError contract on overruns,
duplicate-group/corruption ground truth, and the no-media-shuffle plan.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from solarboat_data_pipeline_spark.operators import mp3, mp4, multimodal as mm, vp9


def _docs(spark, n=40):
    return spark.range(0, n).withColumnRenamed("id", "doc_id")


# --- seek table + extraction -------------------------------------------------


def test_seek_table_matches_local_walk(spark):
    media = mm.synthesize_mp4_media(_docs(spark, 25))
    got = {
        (r["media_id"], r["sample_index"]): (
            r["abs_offset"], r["size"], r["dts_ticks"]
        )
        for r in mm.mp4_sample_seek_table(media).collect()
    }
    payloads = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    want = {}
    for mid, data in payloads.items():
        for s in mp4.sample_index(data):
            want[(mid, s["sample"])] = (s["offset"], s["size"], s["dts_ticks"])
    assert got == want


def test_extract_sample_payloads_byte_exact(spark):
    media = mm.synthesize_mp4_media(_docs(spark, 25))
    seek = mm.mp4_sample_seek_table(media)
    out = mm.extract_sample_payloads(media, seek)
    payloads = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    rows = out.collect()
    n_expected = sum(len(mp4.sample_index(d)) for d in payloads.values())
    assert len(rows) == n_expected
    for r in rows:
        data = payloads[r["media_id"]]
        idx = mp4.sample_index(data)[r["sample_index"]]
        chunk = data[idx["offset"] : idx["offset"] + idx["size"]]
        assert bytes(r["payload"]) == chunk  # the ranged GET is byte-exact
        assert r["size"] == len(chunk)
        assert r["byte_sum"] == sum(chunk)
        assert r["head_u32"] == int.from_bytes(chunk[:4], "big")
        assert r["tail_byte"] == chunk[-1]
        # every extracted MP4 sample is a length-prefixed IDR NAL
        assert r["head_u32"] == r["size"] - 4
        assert chunk[4] == 0x65


def test_extract_filtered_subset_and_no_digest(spark):
    media = mm.synthesize_mp4_media(_docs(spark, 20))
    seek = mm.mp4_sample_seek_table(media)
    wanted = seek.where(F.col("sample_index") % 3 == 0)
    out = mm.extract_sample_payloads(
        media, wanted, with_digest=False, broadcast_requests=False
    )
    assert out.columns == ["media_id", "sample_index", "size", "payload"]
    got = {(r["media_id"], r["sample_index"]) for r in out.collect()}
    want = {
        (r["media_id"], r["sample_index"]) for r in wanted.collect()
    }
    assert got == want and all(s % 3 == 0 for _, s in got)


def test_fmp4_extraction_byte_exact(spark):
    """The ranged-GET extractor works unchanged over FRAGMENTED MP4s:
    the absolute-offset fragment seek table drives the identical
    slicing path, byte-exact against local fragment_index slices."""
    media = mm.synthesize_fmp4_media(_docs(spark, 20))
    seek = mm.fmp4_sample_seek_table(media)
    out = mm.extract_sample_payloads(media, seek)
    payloads = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    rows = out.collect()
    n_expected = sum(len(mp4.fragment_index(d)) for d in payloads.values())
    assert len(rows) == n_expected and n_expected > 0
    for r in rows:
        data = payloads[r["media_id"]]
        idx = mp4.fragment_index(data)[r["sample_index"]]
        assert bytes(r["payload"]) == data[idx["offset"] : idx["offset"] + idx["size"]]
        assert r["byte_sum"] == sum(bytes(r["payload"]))


def test_extract_overrun_raises_clean_value_error(spark):
    media = mm.synthesize_mp4_media(_docs(spark, 3))
    bad = spark.createDataFrame(
        [(0, 0, 10, 10**9)], "media_id long, sample_index long, size long, abs_offset long"
    )
    with pytest.raises(Exception, match="overruns"):
        mm.extract_sample_payloads(media, bad).collect()


def test_extract_plan_no_media_shuffle(spark):
    """The media table must reach the slicing map WITHOUT an exchange:
    requests aggregate (their own small shuffle) and broadcast to the
    media scan — at 100 TB the payload bytes never move."""
    media = mm.synthesize_mp4_media(_docs(spark, 10))
    seek = mm.mp4_sample_seek_table(media)
    plan = mm.extract_sample_payloads(media, seek)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_extract_auto_broadcast_threshold_flips_join(spark):
    """VERDICT r11 item 5: broadcast_requests='auto' (the default)
    broadcasts only while the request count stays under the threshold;
    past it the plan flips to a shuffle-hash join with the build side
    on the grouped requests — safe at any request count — and the two
    modes return identical rows."""
    media = mm.synthesize_mp4_media(_docs(spark, 12)).cache()
    seek = mm.mp4_sample_seek_table(media)

    def plan_of(df):
        return df._jdf.queryExecution().executedPlan().toString()

    small = mm.extract_sample_payloads(
        media, seek, auto_broadcast_max_requests=10**6
    )
    assert "BroadcastHashJoin" in plan_of(small)
    big = mm.extract_sample_payloads(
        media, seek, auto_broadcast_max_requests=0
    )
    p = plan_of(big)
    assert "BroadcastHashJoin" not in p and "ShuffledHashJoin" in p
    key = ["media_id", "sample_index"]
    assert sorted(map(tuple, small.select(*key, "byte_sum").collect())) == sorted(
        map(tuple, big.select(*key, "byte_sum").collect())
    )
    media.unpersist()


# --- mixed corpus + tolerant probe -------------------------------------------


def test_mixed_media_duplicate_groups_byte_identical(spark):
    media = {
        r["media_id"]: (r["kind"], bytes(r["payload"]))
        for r in mm.synthesize_mixed_media(_docs(spark, 60)).collect()
    }
    for mid, (kind, data) in media.items():
        assert kind == mid % 3
        seed = mm._mixed_media_seed(mid)
        # clean members of the same (seed, kind) group are identical
        for mid2, (kind2, data2) in media.items():
            if (
                mid2 != mid
                and kind2 == kind
                and mm._mixed_media_seed(mid2) == seed
                and mid % 7 != 3
                and mid2 % 7 != 3
            ):
                assert data2 == data
    # corruption zeroes exactly the first 8 bytes
    for mid, (kind, data) in media.items():
        if mid % 7 == 3:
            assert data[:8] == bytes(8)


def test_probe_media_tolerant_rejects_exactly_corrupted(spark):
    raw = mm.synthesize_mixed_media(_docs(spark, 84))
    rows = mm.probe_media_tolerant(raw).collect()
    assert len(rows) == 84
    for r in rows:
        assert r["ok"] == (r["media_id"] % 7 != 3)
        if r["ok"]:
            seed = mm._mixed_media_seed(r["media_id"])
            if r["kind"] == 0:
                assert r["n_units"] == seed % 24 + 1
            elif r["kind"] == 1:
                assert r["n_units"] == seed % 20 + 1
            else:
                assert r["n_units"] == seed % 60 + 1
            assert r["unit_bytes"] > 0
    # digests equal exactly within clean duplicate groups
    clean = [r for r in rows if r["ok"]]
    by_group: dict[tuple, set] = {}
    for r in clean:
        key = (r["kind"], mm._mixed_media_seed(r["media_id"]))
        by_group.setdefault(key, set()).add(r["digest"])
    assert all(len(v) == 1 for v in by_group.values())
    digs = [next(iter(v)) for v in by_group.values()]
    assert len(set(digs)) == len(digs)  # distinct groups never collide


def test_mixed_media_probers_roundtrip_directly():
    """The three encoders × the seed formulas give streams each prober
    accepts; zeroing the first 8 bytes makes each prober raise — the
    rejection filter's ground truth, asserted without Spark."""
    for seed in (0, 1, 2, 7, 47, 191):
        p = mm._mp4_params(seed)
        sizes = [50 + (7 * seed + 13 * i) % 100 for i in range(p["n_samples"])]
        data = mp4.encode_mp4(
            p["width"], p["height"], sizes,
            timescale=p["timescale"], sample_delta=p["sample_delta"],
            profile_idc=p["profile_idc"], level_idc=p["level_idc"],
        )
        assert mp4.probe_mp4(data)["n_samples"] == p["n_samples"]
        with pytest.raises(ValueError):
            mp4.probe_mp4(bytes(8) + data[8:])
        q = mm._mp3_params(seed)
        audio = mp3.encode_mp3_frames(
            q["n_frames"], bitrate_index=q["bitrate_index"],
            rate_index=q["rate_index"], pad_every=q["pad_every"],
            id3v2_bytes=q["id3v2_bytes"], channel_mode=q["channel_mode"],
            seed=seed,
        )
        assert mp3.probe_mp3(audio)["n_frames"] == q["n_frames"]
        with pytest.raises(ValueError):
            mp3.probe_mp3(bytes(8) + audio[8:])
        v = mm._ivf_params(seed)
        frames = []
        for i in range(v["n_frames"]):
            if i % v["key_every"] == 0:
                hdr = vp9.encode_vp9_keyframe_header(
                    v["width"], v["height"],
                    profile=v["profile"], bit_depth=v["bit_depth"],
                )
            else:
                hdr = vp9.encode_vp9_inter_header(v["profile"])
            tail = bytes(
                (seed * 5 + i * 11 + j) % 256
                for j in range(30 + (3 * seed + 17 * i) % 80)
            )
            frames.append(hdr + tail)
        ivf = vp9.encode_ivf(v["width"], v["height"], frames, timebase_den=v["timebase_den"])
        assert vp9.probe_ivf(ivf)["n_frames"] == v["n_frames"]
        with pytest.raises(ValueError):
            vp9.probe_ivf(bytes(8) + ivf[8:])
