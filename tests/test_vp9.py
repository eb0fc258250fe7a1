"""IVF/VP9 probe correctness (operators/vp9.py): frame-header bit
round-trips across profiles, the header byte lengths the driver oracle
depends on, branch coverage for show_existing/inter/profile-1-3/RGB
syntax, container round-trips, adversarial corpus, and the Spark lane."""

from __future__ import annotations

import struct

import pytest

from solarboat_data_pipeline_spark.operators import mp4, vp9


# --- frame headers ---------------------------------------------------------


@pytest.mark.parametrize("w", [1, 64, 313, 1920, 65536])
@pytest.mark.parametrize("h", [1, 98, 1080])
@pytest.mark.parametrize("profile,bit_depth", [(0, 8), (2, 10), (2, 12)])
def test_keyframe_header_roundtrip(w, h, profile, bit_depth):
    hdr = vp9.encode_vp9_keyframe_header(w, h, profile=profile, bit_depth=bit_depth)
    info = vp9.parse_vp9_frame_header(hdr + b"\xaa" * 8)
    assert info["is_key"] and info["frame_type"] == "key"
    assert (info["width"], info["height"]) == (w, h)
    assert (info["profile"], info["bit_depth"]) == (profile, bit_depth)
    assert (info["subsampling_x"], info["subsampling_y"]) == (1, 1)


def test_header_byte_lengths_are_the_oracle_constants():
    # mm_ivf_vp9_probe's DuckDB oracle recomputes frame_bytes with the
    # constants keyframe=9 / full-inter=5; if the header syntax ever
    # changes these assertions fail before the oracle can silently drift.
    assert len(vp9.encode_vp9_keyframe_header(1, 1, profile=0)) == 9
    assert len(vp9.encode_vp9_keyframe_header(65536, 65536, profile=0)) == 9
    assert len(vp9.encode_vp9_keyframe_header(64, 64, profile=2, bit_depth=10)) == 9
    assert len(vp9.encode_vp9_keyframe_header(64, 64, profile=2, bit_depth=12)) == 9
    assert len(vp9.encode_vp9_inter_header(0)) == 5
    assert len(vp9.encode_vp9_inter_header(2)) == 5
    # the explicit-size branch (no reference supplies the size): 9 bytes
    assert len(vp9.encode_vp9_inter_header(
        0, found_ref=False, width=64, height=48)) == 9


def test_inter_header_full_roundtrip():
    """Round 12: the FULL inter header round-trips field-exact through
    the parser — refresh mask, reference indices + sign biases,
    frame_size_with_refs both branches, mv precision, filter literal
    and switchable."""
    h = vp9.encode_vp9_inter_header(
        2, refresh_frame_flags=0xA5, ref_frame_idx=(3, 5, 7),
        ref_sign_bias=(1, 0, 1), allow_high_precision_mv=True,
        interp_filter=3, reset_frame_context=2,
    )
    info = vp9.parse_vp9_frame_header(h + bytes(6))
    assert info["frame_type"] == "inter" and not info["is_key"]
    assert info["refresh_frame_flags"] == 0xA5
    assert info["ref_frame_idx"] == (3, 5, 7)
    assert info["ref_sign_bias"] == (1, 0, 1)
    assert info["size_from_ref"] == 0  # first reference supplied the size
    assert info["allow_high_precision_mv"] is True
    assert info["interp_filter"] == 3
    assert info["reset_frame_context"] == 2
    # explicit-size branch + switchable filter
    h2 = vp9.encode_vp9_inter_header(
        0, found_ref=False, width=320, height=240, interp_filter=None,
    )
    i2 = vp9.parse_vp9_frame_header(h2 + bytes(4))
    assert i2["size_from_ref"] == -1
    assert (i2["width"], i2["height"]) == (320, 240)
    assert i2["interp_filter"] is None


def test_intra_only_header_roundtrip():
    for profile, depth in ((0, 8), (2, 10), (2, 12)):
        h = vp9.encode_vp9_intra_only_header(
            640, 480, profile=profile, bit_depth=depth,
            refresh_frame_flags=9,
        )
        info = vp9.parse_vp9_frame_header(h + bytes(4))
        assert info["frame_type"] == "intra_only"
        assert not info["is_key"] and not info["show_frame"]
        assert info["bit_depth"] == depth
        assert info["refresh_frame_flags"] == 9
        assert (info["width"], info["height"]) == (640, 480)


def test_inter_header_field_validation():
    with pytest.raises(ValueError, match="8 bits"):
        vp9.encode_vp9_inter_header(0, refresh_frame_flags=256)
    with pytest.raises(ValueError, match="3 bits"):
        vp9.encode_vp9_inter_header(0, ref_frame_idx=(8, 0, 0))
    with pytest.raises(ValueError, match="2 bits"):
        vp9.encode_vp9_inter_header(0, interp_filter=4)
    with pytest.raises(ValueError, match="explicit frame size"):
        vp9.encode_vp9_inter_header(0, found_ref=False)


def test_show_existing_branch():
    w = mp4._BitWriter()
    w.u(2, 2)  # marker
    w.u(1, 1)  # profile low → 1
    w.u(0, 1)  # profile high
    w.u(1, 1)  # show_existing_frame
    info = vp9.parse_vp9_frame_header(w.rbsp_trailing())
    assert info["frame_type"] == "show_existing" and not info["is_key"]
    assert info["profile"] == 1


def test_profile1_explicit_subsampling_parse():
    # hand-build a profile-1 keyframe header (4:2:2: sub_x=1 sub_y=0) —
    # the parser must walk the explicit subsampling bits
    w = mp4._BitWriter()
    w.u(2, 2)
    w.u(1, 1)  # profile low (profile 1)
    w.u(0, 1)
    w.u(0, 1)  # show_existing
    w.u(0, 1)  # key
    w.u(1, 1)  # show
    w.u(0, 1)  # error_resilient
    for b in (0x49, 0x83, 0x42):
        w.u(b, 8)
    w.u(2, 3)  # color_space
    w.u(0, 1)  # color_range
    w.u(1, 1)  # subsampling_x
    w.u(0, 1)  # subsampling_y
    w.u(0, 1)  # reserved
    w.u(639, 16)
    w.u(479, 16)
    w.u(0, 1)
    info = vp9.parse_vp9_frame_header(w.rbsp_trailing())
    assert (info["width"], info["height"]) == (640, 480)
    assert (info["subsampling_x"], info["subsampling_y"]) == (1, 0)
    assert info["bit_depth"] == 8 and info["profile"] == 1


def test_rgb_branch_parse():
    # profile-1 RGB (color_space 7): no range/subsampling bits, one
    # reserved bit, 4:4:4 implied
    w = mp4._BitWriter()
    w.u(2, 2)
    w.u(1, 1)
    w.u(0, 1)
    w.u(0, 1)
    w.u(0, 1)
    w.u(1, 1)
    w.u(0, 1)
    for b in (0x49, 0x83, 0x42):
        w.u(b, 8)
    w.u(7, 3)  # CS_RGB
    w.u(0, 1)  # reserved
    w.u(99, 16)
    w.u(49, 16)
    w.u(0, 1)
    info = vp9.parse_vp9_frame_header(w.rbsp_trailing())
    assert (info["width"], info["height"]) == (100, 50)
    assert (info["subsampling_x"], info["subsampling_y"]) == (0, 0)


def test_bad_marker_and_sync_raise():
    with pytest.raises(ValueError):
        vp9.parse_vp9_frame_header(b"\x00\x00\x00\x00")
    # keyframe prefix with a corrupted sync code
    hdr = bytearray(vp9.encode_vp9_keyframe_header(64, 64))
    hdr[1] ^= 0x40  # flips a sync-code bit (sync starts at bit 8)
    with pytest.raises(ValueError):
        vp9.parse_vp9_frame_header(bytes(hdr))
    with pytest.raises(ValueError):
        vp9.parse_vp9_frame_header(b"")


def test_encoder_envelope():
    with pytest.raises(ValueError):
        vp9.encode_vp9_keyframe_header(64, 64, profile=1)
    with pytest.raises(ValueError):
        vp9.encode_vp9_keyframe_header(64, 64, profile=0, bit_depth=10)
    with pytest.raises(ValueError):
        vp9.encode_vp9_keyframe_header(0, 64)


# --- IVF container ---------------------------------------------------------


def _stream(mid: int, n: int, key_every: int) -> bytes:
    frames = []
    for i in range(n):
        hdr = (
            vp9.encode_vp9_keyframe_header(126, 98)
            if i % key_every == 0
            else vp9.encode_vp9_inter_header(0)
        )
        frames.append(hdr + bytes((mid + i * 7 + j) % 256 for j in range(30 + i)))
    return vp9.encode_ivf(126, 98, frames, timebase_den=24)


def test_ivf_probe_roundtrip():
    data = _stream(3, 10, 4)
    info = vp9.probe_ivf(data)
    assert info["fourcc"] == "VP90"
    assert (info["width"], info["height"]) == (126, 98)
    assert (info["coded_width"], info["coded_height"]) == (126, 98)
    assert info["n_frames"] == 10 and info["n_keyframes"] == 3
    assert info["first_keyframe_offset"] == 44  # 32 header + 12 frame hdr
    assert info["timebase_den"] == 24


def test_ivf_adversarial():
    data = _stream(1, 5, 2)
    with pytest.raises(ValueError):
        vp9.probe_ivf(b"RIFF" + data[4:])  # wrong signature
    with pytest.raises(ValueError):
        vp9.probe_ivf(data[:30])  # truncated container header
    with pytest.raises(ValueError):
        vp9.probe_ivf(data[: len(data) - 10])  # truncated last frame
    # frame-count mismatch: header promises one more frame
    corrupt = bytearray(data)
    n = struct.unpack_from("<I", corrupt, 24)[0]
    struct.pack_into("<I", corrupt, 24, n + 1)
    with pytest.raises(ValueError):
        vp9.probe_ivf(bytes(corrupt))


def test_ivf_dimension_change_raises():
    frames = [
        vp9.encode_vp9_keyframe_header(64, 48) + b"\x01" * 10,
        vp9.encode_vp9_keyframe_header(32, 32) + b"\x01" * 10,
    ]
    with pytest.raises(ValueError):
        vp9.probe_ivf(vp9.encode_ivf(64, 48, frames))


# --- Spark lane ------------------------------------------------------------


def test_probe_ivf_stats_spark(spark):
    from solarboat_data_pipeline_spark.operators import multimodal as mm

    docs = spark.range(0, 40).withColumnRenamed("id", "doc_id")
    rows = {
        r["media_id"]: r
        for r in mm.probe_ivf_stats(mm.synthesize_ivf_media(docs)).collect()
    }
    assert len(rows) == 40
    for mid, r in rows.items():
        p = mm._ivf_params(mid)
        assert r["width"] == r["coded_width"] == p["width"]
        assert r["height"] == r["coded_height"] == p["height"]
        assert (r["profile"], r["bit_depth"]) == (p["profile"], p["bit_depth"])
        n, k = p["n_frames"], p["key_every"]
        assert r["n_frames"] == n and r["n_keyframes"] == (n + k - 1) // k
        assert r["frame_bytes"] == sum(
            (9 if i % k == 0 else 5) + 30 + (3 * mid + 17 * i) % 80
            for i in range(n)
        )
        # round 12: inter-frame reference-structure aggregates
        inter = [i for i in range(n) if i % k != 0]
        assert r["refresh_flags_sum"] == sum((mid + 3 * i) % 256 for i in inter)
        assert r["ref_idx_sum"] == sum(
            i % 8 + (mid + i) % 8 + (2 * i + 1) % 8 for i in inter
        )
        assert r["n_hp_mv"] == sum(i % 2 for i in inter)


# --- superframes -------------------------------------------------------------


def _superframe(frames: list[bytes], bytes_per: int = 1) -> bytes:
    marker = 0xC0 | (len(frames) - 1) | ((bytes_per - 1) << 3)
    idx = bytes([marker])
    for f in frames:
        idx += len(f).to_bytes(bytes_per, "little")
    return b"".join(frames) + idx + bytes([marker])


def test_split_superframe_roundtrip():
    key = vp9.encode_vp9_keyframe_header(64, 48) + bytes(20)
    inter = vp9.encode_vp9_inter_header(0) + bytes(10)
    for bp in (1, 2, 3):
        sf = _superframe([inter, key], bytes_per=bp)
        assert vp9.split_superframe(sf) == [inter, key]
    # three subframes
    sf = _superframe([inter, inter, key])
    assert len(vp9.split_superframe(sf)) == 3


def test_split_superframe_rejects_non_index():
    key = vp9.encode_vp9_keyframe_header(64, 48) + bytes(20)
    # ordinary payload untouched
    assert vp9.split_superframe(key) == [key]
    # marker-shaped last byte but sizes that do not tile the payload
    fake = key + bytes([0xC1, 5, 5, 0xC1])
    # leading marker mismatch or bad tiling → returned unsplit
    assert vp9.split_superframe(fake[:-1] + b"\xc0") == [fake[:-1] + b"\xc0"]
    assert vp9.split_superframe(b"") == [b""]


def test_split_superframe_rejects_zero_length_subframe():
    # a tiling index that claims an empty subframe is spec-illegal and
    # must fail HERE (naming the superframe index), not downstream as a
    # misleading "truncated frame header" on the empty subframe
    key = vp9.encode_vp9_keyframe_header(64, 48) + bytes(20)
    sf = _superframe([key, b""])
    with pytest.raises(ValueError, match="zero-length subframe"):
        vp9.split_superframe(sf)
    # and probe_ivf surfaces the same precise message
    with pytest.raises(ValueError, match="zero-length subframe"):
        vp9.probe_ivf(vp9.encode_ivf(64, 48, [sf]))


def test_probe_ivf_counts_keyframes_inside_superframes():
    key = vp9.encode_vp9_keyframe_header(126, 98) + bytes(20)
    inter = vp9.encode_vp9_inter_header(0) + bytes(10)
    frames = [
        _superframe([inter, key]),       # altref + visible key
        inter + bytes(5),
        _superframe([inter, inter]),
    ]
    info = vp9.probe_ivf(vp9.encode_ivf(126, 98, frames))
    assert info["n_frames"] == 3          # container frames
    assert info["n_keyframes"] == 1       # found INSIDE the superframe
    assert (info["coded_width"], info["coded_height"]) == (126, 98)


def test_probe_ivf_visible_frame_count():
    key = vp9.encode_vp9_keyframe_header(126, 98) + bytes(20)
    inter = vp9.encode_vp9_inter_header(0) + bytes(10)
    frames = [
        _superframe([inter, key]),  # altref (shown) + visible key = 2 visible
        inter + bytes(5),
    ]
    info = vp9.probe_ivf(vp9.encode_ivf(126, 98, frames))
    assert info["n_frames"] == 2 and info["n_visible"] == 3
