"""Compressed-audio PROBE correctness (operators/mp3.py): frame-length
recurrence goldens, full bitrate/rate table round-trips, ID3v2/v1
handling, adversarial corpus, self-delimiting prefix semantics, and the
Spark mapInPandas lane."""

from __future__ import annotations

import pytest

from solarboat_data_pipeline_spark.operators import mp3


# --- frame-length arithmetic -------------------------------------------------


def test_frame_length_goldens():
    # the classic published figure: MPEG-1 Layer III, 128 kbps @ 44.1 kHz
    # is 417 bytes, 418 padded
    assert mp3.frame_length(3, 3, 128, 44100, 0) == 417
    assert mp3.frame_length(3, 3, 128, 44100, 1) == 418
    # 320 kbps @ 44.1 kHz → 1044; 192 @ 48k → 576 (exact division)
    assert mp3.frame_length(3, 3, 320, 44100, 0) == 1044
    assert mp3.frame_length(3, 3, 192, 48000, 0) == 576
    # Layer I padding slot is 4 bytes
    assert mp3.frame_length(3, 1, 128, 44100, 1) - mp3.frame_length(3, 1, 128, 44100, 0) == 4
    # MPEG-2 Layer III uses 576 samples/frame → half the byte count
    assert mp3.frame_length(2, 3, 64, 22050, 0) == 576 // 8 * 64000 // 22050


@pytest.mark.parametrize("version_id", [3, 2, 0])
@pytest.mark.parametrize("layer", [1, 2, 3])
@pytest.mark.parametrize("bitrate_index", [1, 7, 14])
@pytest.mark.parametrize("rate_index", [0, 1, 2])
def test_roundtrip_all_tables(version_id, layer, bitrate_index, rate_index):
    data = mp3.encode_mp3_frames(
        5, version_id=version_id, layer=layer,
        bitrate_index=bitrate_index, rate_index=rate_index,
    )
    info = mp3.probe_mp3(data)
    assert info["n_frames"] == 5 and info["layer"] == layer
    group = "1" if version_id == 3 else "2"
    assert info["bitrate_min_kbps"] == mp3._BITRATES[(group, layer)][bitrate_index]
    assert info["rate_hz"] == mp3._RATES[version_id][rate_index]
    spf = 384 if layer == 1 else (1152 if layer == 2 or version_id == 3 else 576)
    assert info["total_samples"] == 5 * spf
    assert info["audio_bytes"] == len(data)
    assert info["is_cbr"]


def test_padding_period_and_duration():
    data = mp3.encode_mp3_frames(38, bitrate_index=9, rate_index=0, pad_every=3)
    info = mp3.probe_mp3(data)
    n_padded = (38 + 2) // 3
    assert info["audio_bytes"] == 38 * 417 + n_padded
    assert info["duration_ms_x1000"] == 38 * 1152 * 1_000_000 // 44100


def test_id3v2_skip_and_id3v1_trailer():
    data = mp3.encode_mp3_frames(7, id3v2_bytes=321, seed=9)
    assert data[:3] == b"ID3"
    info = mp3.probe_mp3(data)
    assert info["n_frames"] == 7
    # ID3v1 128-byte trailer tolerated
    assert mp3.probe_mp3(data + b"TAG" + bytes(125))["n_frames"] == 7
    # synchsafe size > 127 exercised above (321 needs two 7-bit digits)


def test_vbr_detection():
    a = mp3.encode_mp3_frames(3, bitrate_index=9)
    b = mp3.encode_mp3_frames(3, bitrate_index=11)
    info = mp3.probe_mp3(a + b)
    assert not info["is_cbr"]
    assert (info["bitrate_min_kbps"], info["bitrate_max_kbps"]) == (128, 192)
    assert info["bitrate_mean_kbps_x1000"] == (3 * 128 + 3 * 192) * 1000 // 6


def test_prefix_of_complete_frames_is_valid():
    # MP3 is self-delimiting: cutting at a frame boundary yields a
    # valid shorter stream; cutting mid-frame raises
    data = mp3.encode_mp3_frames(10, bitrate_index=9, rate_index=1)  # 48 kHz: 384-byte frames
    assert mp3.probe_mp3(data[: 384 * 4])["n_frames"] == 4
    with pytest.raises(ValueError):
        mp3.probe_mp3(data[: 384 * 4 + 100])


def test_adversarial_headers():
    good = mp3.encode_mp3_frames(2)
    # desync
    with pytest.raises(ValueError, match="sync"):
        mp3.probe_mp3(b"\x00" + good)
    # reserved version id (bits 19-20 = 01)
    bad = bytearray(good)
    bad[1] = (bad[1] & ~0x18) | 0x08
    with pytest.raises(ValueError, match="version"):
        mp3.probe_mp3(bytes(bad))
    # reserved layer (bits 17-18 = 00)
    bad = bytearray(good)
    bad[1] = bad[1] & ~0x06
    with pytest.raises(ValueError, match="layer"):
        mp3.probe_mp3(bytes(bad))
    # forbidden bitrate index 15
    bad = bytearray(good)
    bad[2] = bad[2] | 0xF0
    with pytest.raises(ValueError, match="bitrate"):
        mp3.probe_mp3(bytes(bad))
    # free-format first frame whose derived length is implausibly short
    # (payload bytes immediately fake no matching sync, stream too small)
    bad = bytearray(good[:6])
    bad[2] = bad[2] & 0x0F
    with pytest.raises(ValueError, match="implausible"):
        mp3.probe_mp3(bytes(bad))
    # reserved sample-rate index 3
    bad = bytearray(good)
    bad[2] = bad[2] | 0x0C
    with pytest.raises(ValueError, match="sample-rate"):
        mp3.probe_mp3(bytes(bad))
    # ID3v2 tag overrunning the file
    with pytest.raises(ValueError, match="ID3"):
        mp3.probe_mp3(b"ID3\x04\x00\x00\x00\x00\x7f\x00" + bytes(10))
    # rate change mid-stream
    mixed = mp3.encode_mp3_frames(2, rate_index=0) + mp3.encode_mp3_frames(2, rate_index=1)
    with pytest.raises(ValueError, match="mid-stream"):
        mp3.probe_mp3(mixed)


def test_id3v1_trailer_only_audio_section_raises():
    # an "MP3" whose audio section is nothing but the 128-byte ID3v1
    # trailer must raise ValueError, not divide duration by None
    trailer = b"TAG" + bytes(125)
    with pytest.raises(ValueError, match="no audio frames"):
        mp3.probe_mp3(trailer)
    # same via an ID3v2 prefix followed directly by the trailer
    prefixed = mp3.encode_mp3_frames(1, id3v2_bytes=40)
    id3v2_len = 10 + 40
    with pytest.raises(ValueError, match="no audio frames"):
        mp3.probe_mp3(prefixed[:id3v2_len] + trailer)


def test_probe_mp3_random_bytes_only_value_errors():
    import numpy as np

    rnd = np.random.default_rng(20260816)
    base = mp3.encode_mp3_frames(20, bitrate_index=9, pad_every=2, id3v2_bytes=40)
    for _ in range(2000):
        kind = int(rnd.integers(0, 3))
        if kind == 0:
            data = bytes(rnd.integers(0, 256, size=int(rnd.integers(1, 200)), dtype=np.uint8))
        elif kind == 1:
            data = base[: int(rnd.integers(0, len(base)))]
        else:
            b = bytearray(base)
            for _ in range(int(rnd.integers(1, 8))):
                b[int(rnd.integers(0, len(b)))] = int(rnd.integers(0, 256))
            data = bytes(b)
        try:
            mp3.probe_mp3(data)
        except ValueError:
            pass  # the only permitted failure mode


# --- Spark lane --------------------------------------------------------------


def test_probe_mp3_stats_spark(spark):
    from solarboat_data_pipeline_spark.operators import multimodal as mm

    docs = spark.range(0, 40).withColumnRenamed("id", "doc_id")
    rows = {
        r["media_id"]: r
        for r in mm.probe_mp3_stats(mm.synthesize_mp3_media(docs)).collect()
    }
    assert len(rows) == 40
    for mid, r in rows.items():
        p = mm._mp3_params(mid)
        n = p["n_frames"]
        kbps = mp3._BITRATES[("1", 3)][p["bitrate_index"]]
        rate = mp3._RATES[3][p["rate_index"]]
        assert r["n_frames"] == n
        assert r["total_samples"] == 1152 * n
        assert r["rate_hz"] == rate
        assert r["bitrate_min_kbps"] == kbps == r["bitrate_max_kbps"]
        assert r["bitrate_mean_kbps_x1000"] == kbps * 1000
        assert r["duration_ms_x1000"] == 1152 * n * 1_000_000 // rate
        pe = p["pad_every"]
        n_padded = (n + pe - 1) // pe if pe else 0
        assert r["audio_bytes"] == n * (144000 * kbps // rate) + n_padded
        assert r["is_cbr"]


def test_id3v1_boundary_and_short_files():
    # valid short file (< 128 bytes) must parse — the old negative-slice
    # check rejected it when payload bytes happened to spell TAG
    short = mp3.encode_mp3_frames(2, version_id=0, bitrate_index=1, rate_index=0)
    assert len(short) < 128
    assert mp3.probe_mp3(short)["n_frames"] == 2
    # "TAG" mid-payload at len-128 of a tagless stream must NOT cut
    # audio: the trailer is only honored at a frame boundary
    data = mp3.encode_mp3_frames(10, bitrate_index=9, rate_index=1)  # 384 B frames
    k = len(data) - 128
    assert k % 384 != 0  # lands mid-frame
    forged = bytearray(data)
    forged[k : k + 3] = b"TAG"
    assert mp3.probe_mp3(bytes(forged))["n_frames"] == 10


# --- free format (bitrate_index 0, round 11) ---------------------------------


@pytest.mark.parametrize("version_id,layer,rate_index", [(3, 3, 0), (3, 1, 1), (2, 3, 2), (3, 2, 0)])
def test_free_format_roundtrip(version_id, layer, rate_index):
    base = 417 if layer != 1 else 384  # arbitrary out-of-table sizes
    data = mp3.encode_mp3_frames(
        9, version_id=version_id, layer=layer, bitrate_index=0,
        rate_index=rate_index, free_format_bytes=base, pad_every=3, seed=5,
    )
    info = mp3.probe_mp3(data)
    assert info["n_frames"] == 9
    assert info["audio_bytes"] == len(data)
    spf = mp3._samples_per_frame(version_id, layer)
    assert info["total_samples"] == 9 * spf
    rate = mp3._RATES[version_id][rate_index]
    if layer == 1:
        want_kbps = base // 4 * rate // 12000
    else:
        want_kbps = base * rate // (spf // 8) // 1000
    assert info["bitrate_min_kbps"] == want_kbps == info["bitrate_max_kbps"]
    assert info["is_cbr"]


def test_free_format_single_frame_runs_to_end():
    data = mp3.encode_mp3_frames(1, bitrate_index=0, free_format_bytes=500)
    info = mp3.probe_mp3(data)
    assert info["n_frames"] == 1 and info["audio_bytes"] == 500
    # and the ID3v1 trailer is still honored at the frame boundary
    info2 = mp3.probe_mp3(data + b"TAG" + bytes(125))
    assert info2["n_frames"] == 1 and info2["audio_bytes"] == 500


def test_free_format_two_frames_then_id3v1_trailer():
    """ADVICE r12 regression: with exactly TWO free-format frames and an
    ID3v1 trailer, the stride scanner's look-ahead for the second frame
    lands on the trailer (no sync there) — the trailer must be stripped
    before the scan so the candidate validates as stream-final, instead
    of falling through to the single-frame rule (n_frames=1, doubled
    bitrate, halved duration)."""
    data = mp3.encode_mp3_frames(2, bitrate_index=0, free_format_bytes=417, seed=4)
    bare = mp3.probe_mp3(data)
    assert bare["n_frames"] == 2
    tagged = mp3.probe_mp3(data + b"TAG" + bytes(125))
    assert tagged["n_frames"] == 2
    assert tagged["audio_bytes"] == bare["audio_bytes"] == len(data)
    assert tagged["bitrate_min_kbps"] == bare["bitrate_min_kbps"]
    assert tagged["duration_ms_x1000"] == bare["duration_ms_x1000"]
    # padded variant: the look-ahead stride includes the padding slot
    padded = mp3.encode_mp3_frames(
        2, bitrate_index=0, free_format_bytes=417, pad_every=1, seed=4
    )
    assert mp3.probe_mp3(padded + b"TAG" + bytes(125))["n_frames"] == 2


def test_free_format_payload_tag_at_end_minus_128_is_not_a_trailer():
    """The trailer acceptance must live in the look-ahead VALIDATION,
    not as a pre-scan window shrink: a trailerless 2-frame free-format
    stream whose FRAME-1 PAYLOAD happens to contain 'TAG' at exactly
    end-128 must still find frame 2's header (a pre-stripped scan
    window would end before it and report n_frames=1)."""
    data = bytearray(mp3.encode_mp3_frames(2, bitrate_index=0, free_format_bytes=70, seed=6))
    assert len(data) == 140
    k = len(data) - 128  # offset 12: inside frame 1's payload
    assert k >= 4
    data[k : k + 3] = b"TAG"
    info = mp3.probe_mp3(bytes(data))
    assert info["n_frames"] == 2
    assert info["audio_bytes"] == 140


def test_free_format_id3v2_prefix_and_trailer():
    data = mp3.encode_mp3_frames(
        7, bitrate_index=0, free_format_bytes=301, id3v2_bytes=44, seed=3
    )
    assert mp3.probe_mp3(data + b"TAG" + bytes(125))["n_frames"] == 7


def test_mixing_free_and_table_bitrates_raises():
    free = mp3.encode_mp3_frames(2, bitrate_index=0, free_format_bytes=417)
    table = mp3.encode_mp3_frames(2, bitrate_index=9)
    with pytest.raises(ValueError, match="table-bitrate frame .* free-format"):
        mp3.probe_mp3(free + table)
    with pytest.raises(ValueError, match="free-format frame .* table-bitrate"):
        mp3.probe_mp3(table + free)


def test_free_format_payload_mimic_rejected():
    """A payload byte run that mimics the header's version/layer/rate/
    channel bytes must NOT derive the stride (ADVICE r11): the scanner
    validates each candidate by requiring a second matching header one
    frame later, so the mimic is skipped and the true 200-byte stride
    found."""
    data = mp3.encode_mp3_frames(3, bitrate_index=0, free_format_bytes=200, seed=1)
    want = mp3.probe_mp3(data)
    forged = bytearray(data)
    forged[50:54] = data[0:4]  # fake sync 50 bytes into frame 0's payload
    got = mp3.probe_mp3(bytes(forged))
    assert got == want
    assert got["n_frames"] == 3 and got["audio_bytes"] == 600


def test_free_format_mimic_in_single_frame_stream():
    """Same mimic inside a ONE-frame stream: the candidate stride at 50
    fails its look-ahead validation and the walk falls back to the
    frame-runs-to-end rule instead of splitting the frame in two."""
    data = mp3.encode_mp3_frames(1, bitrate_index=0, free_format_bytes=500, seed=2)
    forged = bytearray(data)
    forged[50:54] = data[0:4]
    info = mp3.probe_mp3(bytes(forged))
    assert info["n_frames"] == 1 and info["audio_bytes"] == 500


def test_free_format_truncation_raises():
    data = mp3.encode_mp3_frames(5, bitrate_index=0, free_format_bytes=417)
    with pytest.raises(ValueError):
        mp3.probe_mp3(data[: 417 * 2 + 100])


def test_probe_reports_both_bitrate_bounds():
    info = mp3.probe_mp3(
        mp3.encode_mp3_frames(2, bitrate_index=9) + mp3.encode_mp3_frames(2, bitrate_index=14)
    )
    assert (info["bitrate_min_kbps"], info["bitrate_max_kbps"]) == (128, 320)
    assert not info["is_cbr"]
