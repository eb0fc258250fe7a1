"""Compressed-video PROBE correctness (operators/mp4.py): H.264 SPS
bit-level round-trips and a hand-assembled golden, RBSP emulation
prevention, ISO BMFF encode→probe round-trips, adversarial truncation
corpus, Annex-B NAL scanning, and the Spark mapInPandas lanes."""

from __future__ import annotations

import struct

import pytest

from solarboat_data_pipeline_spark.operators import mp4


# --- SPS / Exp-Golomb ------------------------------------------------------


@pytest.mark.parametrize("w", [2, 16, 126, 640, 1920, 3840])
@pytest.mark.parametrize("h", [2, 16, 98, 480, 1080])
@pytest.mark.parametrize("profile", [66, 77, 100])
def test_sps_roundtrip(w, h, profile):
    info = mp4.parse_sps(mp4.encode_sps(w, h, profile_idc=profile, level_idc=31))
    assert (info["width"], info["height"]) == (w, h)
    assert info["profile_idc"] == profile
    assert info["level_idc"] == 31


def test_sps_golden_16x16_baseline():
    # Hand-assembled bit layout for a 16x16 baseline SPS (ITU-T H.264
    # §7.3.2.1.1), independent of the encoder: after the three fixed
    # bytes 0x42 0x00 0x1E the RBSP bits are
    #   ue(0) sps_id            = 1
    #   ue(0) log2_mfn_minus4   = 1
    #   ue(2) poc_type          = 011
    #   ue(1) max_ref_frames    = 010
    #   u(1)  gaps flag         = 0
    #   ue(0) width_mbs_minus1  = 1
    #   ue(0) height_map_minus1 = 1
    #   u(1)  frame_mbs_only    = 1
    #   u(1)  direct_8x8        = 1
    #   u(1)  cropping          = 0
    #   u(1)  vui               = 0
    #   stop bit + pad          = 1 0000000 → wait, 16 bits already used
    # giving bytes 0b11011010 0b01111001 = 0xDA 0x79.
    assert mp4.encode_sps(16, 16, profile_idc=66, level_idc=30) == bytes(
        [0x67, 0x42, 0x00, 0x1E, 0xDA, 0x79]
    )


def test_sps_cropping_odd_macroblock_remainder():
    # 126 = 8 MB * 16 - 2 → crop_right_offset 1 (crop unit 2 px)
    sps = mp4.encode_sps(126, 98)
    info = mp4.parse_sps(sps)
    assert info["width"] == 126 and info["height"] == 98


def test_sps_rejects_odd_dimensions():
    with pytest.raises(ValueError):
        mp4.encode_sps(15, 16)
    with pytest.raises(ValueError):
        mp4.encode_sps(16, 17)


def test_exp_golomb_values():
    w = mp4._BitWriter()
    for v in (0, 1, 2, 3, 7, 100, 255):
        w.ue(v)
    for v in (0, 1, -1, 5, -7, 12):
        w.se(v)
    r = mp4._BitReader(w.rbsp_trailing())
    assert [r.ue() for _ in range(7)] == [0, 1, 2, 3, 7, 100, 255]
    assert [r.se() for _ in range(6)] == [0, 1, -1, 5, -7, 12]


def test_emulation_prevention_roundtrip():
    for raw in (
        b"\x00\x00\x00\x00\x01",
        b"\x00\x00\x02\x00\x00\x03",
        b"\x00\x00\x00\x00\x00\x00",
        bytes(range(256)) + b"\x00\x00\x01",
    ):
        nal = mp4._rbsp_to_nal(raw)
        for pat in (b"\x00\x00\x00", b"\x00\x00\x01", b"\x00\x00\x02"):
            assert pat not in nal
        assert mp4._nal_to_rbsp(nal) == raw


def test_avcc_roundtrip():
    sps = mp4.encode_sps(640, 480, profile_idc=100, level_idc=40)
    cfg = mp4.parse_avcc(mp4.encode_avcc(sps, mp4.encode_pps()))
    assert (cfg["width"], cfg["height"]) == (640, 480)
    assert cfg["n_sps"] == 1 and cfg["n_pps"] == 1 and cfg["length_size"] == 4


# --- ISO BMFF --------------------------------------------------------------


@pytest.mark.parametrize(
    "w,h,n,ts,delta,profile,level",
    [
        (16, 16, 1, 600, 25, 66, 30),
        (126, 98, 24, 1200, 40, 100, 41),
        (640, 480, 7, 2400, 11, 77, 31),
    ],
)
def test_mp4_probe_roundtrip(w, h, n, ts, delta, profile, level):
    sizes = [50 + (i * 13) % 100 for i in range(n)]
    info = mp4.probe_mp4(
        mp4.encode_mp4(
            w, h, sizes, timescale=ts, sample_delta=delta,
            profile_idc=profile, level_idc=level,
        )
    )
    assert info["major_brand"] == "isom" and info["codec"] == "avc1"
    assert (info["track_width"], info["track_height"]) == (w, h)
    assert (info["coded_width"], info["coded_height"]) == (w, h)
    assert (info["profile_idc"], info["level_idc"]) == (profile, level)
    assert info["n_samples"] == n
    assert info["sample_bytes"] == sum(sizes) == info["mdat_bytes"]
    assert (info["timescale"], info["duration"]) == (ts, n * delta)
    assert info["fps_x1000"] == round(ts * 1000 / delta)


def test_probe_adversarial_corpus():
    data = mp4.encode_mp4(64, 48, [50, 60, 70])
    # every truncation point raises ValueError (never garbage)
    for cut in range(4, len(data), 37):
        with pytest.raises(ValueError):
            mp4.probe_mp4(data[:cut])
    with pytest.raises(ValueError):
        mp4.probe_mp4(b"not a movie at all")
    # box size overrunning the file raises
    corrupt = bytearray(data)
    corrupt[0:4] = struct.pack(">I", len(data) + 1)
    with pytest.raises(ValueError):
        mp4.probe_mp4(bytes(corrupt))
    # ftyp swapped away raises
    corrupt = bytearray(data)
    corrupt[4:8] = b"junk"
    with pytest.raises(ValueError):
        mp4.probe_mp4(bytes(corrupt))


def test_probe_largesize_box():
    # re-wrap the mdat with a 64-bit largesize header; probe must walk it
    data = mp4.encode_mp4(32, 32, [50])
    idx = data.rindex(b"mdat") - 4
    (size,) = struct.unpack_from(">I", data, idx)
    payload = data[idx + 8 : idx + size]
    large = struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", 16 + len(payload)) + payload
    info = mp4.probe_mp4(data[:idx] + large)
    assert info["mdat_bytes"] == len(payload)


# --- Annex-B scan ----------------------------------------------------------


def test_nal_scan_mixed_start_codes():
    sps = mp4.encode_sps(32, 32)
    es = (
        b"\x00\x00\x00\x01" + sps
        + b"\x00\x00\x01\x65" + bytes([7] * 59)
        + b"\x00\x00\x00\x01\x41" + bytes([9] * 38)
    )
    units = mp4.nal_scan(es)
    assert [u["nal_type"] for u in units] == [7, 5, 1]
    assert [u["is_idr"] for u in units] == [False, True, False]
    assert units[0]["size"] == len(sps)
    assert units[1]["size"] == 60  # header + 59 payload bytes
    assert units[2]["size"] == 39
    # offsets point at the NAL header byte
    assert es[units[1]["offset"]] == 0x65


def test_nal_scan_no_start_code_raises():
    with pytest.raises(ValueError):
        mp4.nal_scan(b"\x01\x02\x03\x04" * 10)


# --- Spark lanes -----------------------------------------------------------


def test_probe_video_stats_spark(spark):
    from solarboat_data_pipeline_spark.operators import multimodal as mm

    docs = spark.range(0, 40).withColumnRenamed("id", "doc_id")
    rows = {
        r["media_id"]: r
        for r in mm.probe_video_stats(mm.synthesize_mp4_media(docs)).collect()
    }
    assert len(rows) == 40
    for mid, r in rows.items():
        p = mm._mp4_params(mid)
        assert r["track_width"] == r["coded_width"] == p["width"]
        assert r["track_height"] == r["coded_height"] == p["height"]
        assert r["profile_idc"] == p["profile_idc"]
        assert r["n_samples"] == p["n_samples"]
        assert r["duration"] == p["n_samples"] * p["sample_delta"]
        assert r["sample_bytes"] == sum(
            50 + (7 * mid + 13 * i) % 100 for i in range(p["n_samples"])
        )


def test_keyframe_index_spark(spark):
    from solarboat_data_pipeline_spark.operators import multimodal as mm

    docs = spark.range(0, 40).withColumnRenamed("id", "doc_id")
    rows = {
        r["media_id"]: r
        for r in mm.keyframe_index(mm.synthesize_annexb_media(docs)).collect()
    }
    assert len(rows) == 40
    for mid, r in rows.items():
        p = mm._annexb_params(mid)
        n, k = p["n_nals"], p["idr_every"]
        assert r["n_nals"] == n
        assert r["n_idr"] == (n + k - 1) // k
        assert r["first_idr_offset"] == 4
        assert r["es_bytes"] == sum(
            25 + (5 * mid + 11 * i) % 64 for i in range(n)
        )


# --- sample seek table -----------------------------------------------------


def test_sample_index_slices_exact_payloads():
    # the decisive check: every (offset, size) range slices exactly the
    # generated sample payload back out of the file bytes
    sizes = [50 + (i * 13) % 100 for i in range(9)]
    data = mp4.encode_mp4(64, 48, sizes, sample_delta=40)
    idx = mp4.sample_index(data)
    assert [r["size"] for r in idx] == sizes
    assert [r["dts_ticks"] for r in idx] == [i * 40 for i in range(9)]
    for i, r in enumerate(idx):
        blob = data[r["offset"] : r["offset"] + r["size"]]
        (ln,) = struct.unpack(">I", blob[:4])
        assert ln == r["size"] - 4 and blob[4] == 0x65
        expected = bytes(
            (64 * 7 + 48 * 11 + i * 13 + j * 5) % 256
            for j in range(r["size"] - 5)
        )
        assert blob[5:] == expected


def _seek_fixture(co64: bool = False) -> bytes:
    # hand-assembled general sample table: 7 samples over 3 chunks via
    # TWO stsc runs (chunks 1-2 carry 2 samples each, chunk 3 carries
    # 3), per-sample stsz, two stts delta runs (4x10 then 3x25)
    sizes = [5, 6, 7, 8, 9, 10, 11]
    ftyp = mp4._box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")
    stsc = mp4._full(
        b"stsc", 0, 0,
        struct.pack(">I", 2)
        + struct.pack(">III", 1, 2, 1)
        + struct.pack(">III", 3, 3, 1),
    )
    stsz = mp4._full(
        b"stsz", 0, 0,
        struct.pack(">II", 0, 7) + b"".join(struct.pack(">I", s) for s in sizes),
    )
    stts = mp4._full(
        b"stts", 0, 0,
        struct.pack(">I", 2) + struct.pack(">II", 4, 10) + struct.pack(">II", 3, 25),
    )
    # chunk payloads: chunk1 = samples 0-1, chunk2 = 2-3, chunk3 = 4-6
    meta_len_guess = 0
    for _ in range(2):  # two passes: offsets depend on header length
        if co64:
            co = mp4._full(
                b"co64", 0, 0,
                struct.pack(">I", 3)
                + b"".join(struct.pack(">Q", o) for o in offsets),
            ) if meta_len_guess else mp4._full(
                b"co64", 0, 0, struct.pack(">I", 3) + b"\x00" * 24
            )
        else:
            co = mp4._full(
                b"stco", 0, 0,
                struct.pack(">I", 3)
                + b"".join(struct.pack(">I", o) for o in offsets),
            ) if meta_len_guess else mp4._full(
                b"stco", 0, 0, struct.pack(">I", 3) + b"\x00" * 12
            )
        header = ftyp + stsc + stsz + stts + co
        meta_len_guess = len(header)
        base = meta_len_guess + 8  # samples start after the mdat header
        offsets = [
            base,
            base + sizes[0] + sizes[1],
            base + sum(sizes[:4]),
        ]
    body = b"".join(bytes([17 + i]) * s for i, s in enumerate(sizes))
    return header + mp4._box(b"mdat", body)


@pytest.mark.parametrize("co64", [False, True])
def test_sample_index_multi_chunk_stsc(co64):
    data = _seek_fixture(co64=co64)
    idx = mp4.sample_index(data)
    assert [r["size"] for r in idx] == [5, 6, 7, 8, 9, 10, 11]
    assert [r["dts_ticks"] for r in idx] == [0, 10, 20, 30, 40, 65, 90]
    for i, r in enumerate(idx):
        assert data[r["offset"] : r["offset"] + r["size"]] == bytes([17 + i]) * r["size"]


def test_sample_index_inconsistencies_raise():
    data = _seek_fixture()
    # stts covering the wrong sample count
    corrupt = bytearray(data)
    i = data.index(b"stts")
    struct.pack_into(">II", corrupt, i + 8, 3, 10)  # 3+3 != 7 samples
    with pytest.raises(ValueError):
        mp4.sample_index(bytes(corrupt))
    # a sample overrunning the file
    with pytest.raises(ValueError):
        mp4.sample_index(data[:-4])
    # stsc not starting at chunk 1
    corrupt = bytearray(data)
    i = data.index(b"stsc")
    struct.pack_into(">I", corrupt, i + 8 + 4, 2)
    with pytest.raises(ValueError):
        mp4.sample_index(bytes(corrupt))


def test_mp4_sample_ranges_spark(spark):
    from solarboat_data_pipeline_spark.operators import multimodal as mm

    docs = spark.range(0, 25).withColumnRenamed("id", "doc_id")
    out = mm.mp4_sample_ranges(mm.synthesize_mp4_media(docs)).collect()
    by_media: dict[int, list] = {}
    for r in out:
        by_media.setdefault(r["media_id"], []).append(r)
    assert len(by_media) == 25
    for mid, rows in by_media.items():
        rows.sort(key=lambda r: r["sample_index"])
        p = mm._mp4_params(mid)
        sizes = [50 + (7 * mid + 13 * i) % 100 for i in range(p["n_samples"])]
        assert [r["size"] for r in rows] == sizes
        assert [r["rel_offset"] for r in rows] == [
            sum(sizes[:i]) for i in range(len(sizes))
        ]
        assert [r["dts_ticks"] for r in rows] == [
            i * p["sample_delta"] for i in range(len(sizes))
        ]


# --- property tests (hypothesis) --------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(
    w=st.integers(1, 2048).map(lambda v: v * 2),
    h=st.integers(1, 2048).map(lambda v: v * 2),
    profile=st.sampled_from([66, 77, 88, 100, 110, 244]),
    level=st.integers(9, 52),
)
def test_sps_roundtrip_property(w, h, profile, level):
    info = mp4.parse_sps(mp4.encode_sps(w, h, profile_idc=profile, level_idc=level))
    assert (info["width"], info["height"]) == (w, h)
    assert (info["profile_idc"], info["level_idc"]) == (profile, level)


@settings(max_examples=50, deadline=None)
@given(
    sizes=st.lists(st.integers(6, 300), min_size=1, max_size=40),
    delta=st.integers(1, 10_000),
)
def test_sample_index_roundtrip_property(sizes, delta):
    data = mp4.encode_mp4(64, 48, sizes, sample_delta=delta)
    idx = mp4.sample_index(data)
    assert [r["size"] for r in idx] == sizes
    assert [r["dts_ticks"] for r in idx] == [
        delta * i for i in range(len(sizes))
    ]
    # contiguity inside the single chunk + containment in the file
    for a, b in zip(idx, idx[1:]):
        assert b["offset"] == a["offset"] + a["size"]
    last = idx[-1]
    assert last["offset"] + last["size"] == len(data)


# --- fragmented MP4 (fMP4 / CMAF) -------------------------------------------


def test_fragment_index_slices_exact_payloads():
    frags = [[50, 61, 72], [83, 94], [105, 116, 127, 138]]
    data = mp4.encode_fmp4(126, 98, frags, timescale=1200, sample_delta=40)
    idx = mp4.fragment_index(data)
    assert [r["size"] for r in idx] == [s for f in frags for s in f]
    assert [r["fragment"] for r in idx] == [1, 1, 1, 2, 2, 3, 3, 3, 3]
    assert [r["dts_ticks"] for r in idx] == [i * 40 for i in range(9)]
    k = 0
    base_time = 0
    for f in frags:
        for i in range(len(f)):
            r = idx[k]
            blob = data[r["offset"] : r["offset"] + r["size"]]
            (ln,) = struct.unpack(">I", blob[:4])
            assert ln == r["size"] - 4 and blob[4] == 0x65
            expected = bytes(
                (126 * 7 + 98 * 11 + (base_time + i) * 13 + j * 5) % 256
                for j in range(r["size"] - 5)
            )
            assert blob[5:] == expected
            k += 1
        base_time += len(f) * 40


def test_fragmented_probe():
    frags = [[50, 61, 72], [83, 94]]
    data = mp4.encode_fmp4(126, 98, frags, timescale=1200, sample_delta=40)
    info = mp4.probe_mp4(data)
    assert info["fragmented"] is True
    assert info["major_brand"] == "cmfc" and info["codec"] == "avc1"
    assert (info["n_samples"], info["n_fragments"]) == (5, 2)
    assert info["sample_bytes"] == sum(sum(f) for f in frags)
    assert info["fps_x1000"] == round(1200 * 1000 / 40)
    assert (info["coded_width"], info["coded_height"]) == (126, 98)
    # plain files stay unfragmented
    assert mp4.probe_mp4(mp4.encode_mp4(64, 48, [50]))["fragmented"] is False


def _rebuild_trun(data: bytes, payload: bytes) -> bytes:
    # swap the (single) trun box payload, fixing its size header
    i = data.index(b"trun") - 4
    (old_size,) = struct.unpack_from(">I", data, i)
    new = struct.pack(">I", 8 + len(payload)) + b"trun" + payload
    out = data[:i] + new + data[i + old_size :]
    # fix the enclosing traf and moof sizes
    delta = len(new) - old_size
    for btype in (b"traf", b"moof"):
        j = out.index(btype) - 4
        (sz,) = struct.unpack_from(">I", out, j)
        out = out[:j] + struct.pack(">I", sz + delta) + out[j + 4 :]
    return out


def test_fragment_defaults_from_trex():
    # strip per-sample sizes from the trun (flags 0x201 → 0x001): sizes
    # must then resolve from... trex default_size, which our encoder
    # writes as 0 → the walker must REFUSE (no silent zero-size rows)
    data = mp4.encode_fmp4(64, 48, [[50, 50]], sample_delta=40)
    idx = mp4.fragment_index(data)
    (doff,) = (r["offset"] for r in idx[:1])
    payload = (
        struct.pack(">B3s", 0, (0x000001).to_bytes(3, "big"))
        + struct.pack(">I", 2)
        + struct.pack(">i", doff - (data.index(b"moof") - 4))
    )
    stripped = _rebuild_trun(data, payload)
    with pytest.raises(ValueError, match="no sample size"):
        mp4.fragment_index(stripped)


def test_fragment_per_sample_durations():
    # rebuild the trun with BOTH durations and sizes present (0x301)
    data = mp4.encode_fmp4(64, 48, [[50, 61, 72]], sample_delta=40)
    idx = mp4.fragment_index(data)
    moof_start = data.index(b"moof") - 4
    doff = idx[0]["offset"] - moof_start
    payload = (
        struct.pack(">B3s", 0, (0x000301).to_bytes(3, "big"))
        + struct.pack(">I", 3)
        + struct.pack(">i", doff)
        + b"".join(
            struct.pack(">II", dur, sz)
            for dur, sz in zip((7, 11, 13), (50, 61, 72))
        )
    )
    rebuilt = _rebuild_trun(data, payload)
    idx2 = mp4.fragment_index(rebuilt)
    assert [r["size"] for r in idx2] == [50, 61, 72]
    assert [r["dts_ticks"] for r in idx2] == [0, 7, 18]  # per-sample deltas
    for a, b in zip(idx, idx2):
        assert a["offset"] == b["offset"]


def test_fragment_tfdt_v1_64bit():
    data = mp4.encode_fmp4(64, 48, [[50, 50]], sample_delta=40)
    i = data.index(b"tfdt") - 4
    (old_size,) = struct.unpack_from(">I", data, i)
    big = 2**33  # does not fit 32 bits
    v1 = struct.pack(">I", 8 + 12) + b"tfdt" + struct.pack(">B3sQ", 1, b"\x00\x00\x00", big)
    out = data[:i] + v1 + data[i + old_size :]
    delta = len(v1) - old_size
    for btype in (b"traf", b"moof"):
        j = out.index(btype) - 4
        (sz,) = struct.unpack_from(">I", out, j)
        out = out[:j] + struct.pack(">I", sz + delta) + out[j + 4 :]
    idx = mp4.fragment_index(out)
    assert [r["dts_ticks"] for r in idx] == [big, big + 40]


def test_fragment_adversarial():
    data = mp4.encode_fmp4(64, 48, [[50, 61], [72]], sample_delta=40)
    # plain seek table refuses fragmented files and vice versa
    with pytest.raises(ValueError):
        mp4.sample_index(data)  # stsc empty → "must start at chunk 1"
    with pytest.raises(ValueError, match="no moof"):
        mp4.fragment_index(mp4.encode_mp4(64, 48, [50]))
    # truncations raise
    for cut in range(12, len(data), 41):
        with pytest.raises(ValueError):
            mp4.fragment_index(data[:cut])


def test_fmp4_sample_ranges_spark(spark):
    from solarboat_data_pipeline_spark.operators import multimodal as mm

    docs = spark.range(0, 30).withColumnRenamed("id", "doc_id")
    out = mm.fmp4_sample_ranges(mm.synthesize_fmp4_media(docs)).collect()
    by_media: dict[int, list] = {}
    for r in out:
        by_media.setdefault(r["media_id"], []).append(r)
    assert len(by_media) == 30
    for mid, rows in by_media.items():
        rows.sort(key=lambda r: r["sample_index"])
        p = mm._fmp4_params(mid)
        counts = p["frag_counts"]
        n = sum(counts)
        sizes = [50 + (7 * mid + 13 * i) % 100 for i in range(n)]
        assert [r["size"] for r in rows] == sizes
        assert [r["dts_ticks"] for r in rows] == [
            i * p["sample_delta"] for i in range(n)
        ]
        # fragment-relative offsets restart at every fragment boundary
        i = 0
        for f, cnt in enumerate(counts, start=1):
            run = rows[i : i + cnt]
            assert all(r["fragment"] == f for r in run)
            assert [r["frag_rel_offset"] for r in run] == [
                sum(sizes[i : i + j]) for j in range(cnt)
            ]
            i += cnt


def test_box_nesting_bomb_raises_value_error():
    # ~100 nested container boxes must raise ValueError, not
    # RecursionError (the clean-failure contract inside Arrow tasks)
    inner = mp4._box(b"free", b"")
    for _ in range(100):
        inner = mp4._box(b"trak", inner)
    bomb = mp4._box(b"ftyp", b"isom" + struct.pack(">I", 0)) + inner
    with pytest.raises(ValueError, match="nesting"):
        mp4.probe_mp4(bomb)


def test_fragmented_mdat_bytes_sums_all_fragments():
    frags = [[50, 61], [72, 83], [94]]
    info = mp4.probe_mp4(mp4.encode_fmp4(64, 48, frags))
    assert info["mdat_bytes"] == sum(sum(f) for f in frags) == info["sample_bytes"]


def test_parse_sps_headerless_high_profile_135():
    # profile 135 has low header bits == 7; the old strip heuristic ate
    # its first byte when passed headerless
    sps = mp4.encode_sps(64, 48, profile_idc=135)
    headerless = sps[1:]
    info = mp4.parse_sps(headerless)
    assert info["profile_idc"] == 135 and (info["width"], info["height"]) == (64, 48)
    # and the with-header form still strips correctly
    assert mp4.parse_sps(sps)["profile_idc"] == 135


def test_multi_traf_without_explicit_base_raises():
    data = mp4.encode_fmp4(64, 48, [[50, 50]])
    # duplicate the traf inside the moof (second tfhd has no explicit base)
    ti = data.index(b"traf") - 4
    (tsz,) = struct.unpack_from(">I", data, ti)
    traf = data[ti : ti + tsz]
    mi = data.index(b"moof") - 4
    (msz,) = struct.unpack_from(">I", data, mi)
    doubled = (
        data[:mi]
        + struct.pack(">I", msz + tsz)
        + data[mi + 4 : ti + tsz]
        + traf
        + data[ti + tsz :]
    )
    with pytest.raises(ValueError, match="multi-traf"):
        mp4.fragment_index(doubled)


def test_implausible_count_fields_raise_fast():
    # a 4-byte mutation of a count field must raise, not allocate
    # gigabytes or loop billions of iterations inside an Arrow task
    base = mp4.encode_mp4(64, 48, [50, 60, 70])
    b = bytearray(base)
    i = base.index(b"stsz") - 4
    struct.pack_into(">II", b, i + 8 + 4, 10, 0xFFFFFFF0)  # fixed, huge count
    with pytest.raises(ValueError, match="declares"):
        mp4.probe_mp4(bytes(b))
    with pytest.raises(ValueError, match="declares"):
        mp4.sample_index(bytes(b))
    b = bytearray(base)
    j = base.index(b"stts") - 4
    struct.pack_into(">II", b, j + 8 + 4, 0xFFFFFFF0, 25)  # huge stts run
    with pytest.raises(ValueError, match="stts"):
        mp4.sample_index(bytes(b))
    f = mp4.encode_fmp4(64, 48, [[50, 50]])
    b = bytearray(f)
    k = f.index(b"trun") - 4
    struct.pack_into(">I", b, k + 8 + 4, 0xFFFFFFF0)  # huge trun count
    # with per-sample sizes present the parse overruns the payload
    # immediately; the "trun declares" guard covers the default-size
    # path where nothing else would bound the loop
    with pytest.raises(ValueError):
        mp4.fragment_index(bytes(b))
