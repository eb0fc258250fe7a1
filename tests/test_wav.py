"""WAV codec correctness (operators/wav.py): encode→decode round-trips,
cross-validation against the stdlib ``wave`` module IN BOTH DIRECTIONS
(an independent oracle the PNG twin does not have), adversarial corpus,
and resample kernel properties."""

from __future__ import annotations

import io
import struct
import wave as stdlib_wave

import numpy as np
import pytest

from solarboat_data_pipeline_spark.operators import wav


def _signal(n_frames: int, channels: int, seed: int = 0) -> np.ndarray:
    i = np.arange(n_frames, dtype=np.int64)
    c = np.arange(channels, dtype=np.int64)
    return ((37 * i[:, None] + 101 * c[None, :] + 13 * seed) % 4096 - 2048).astype(
        np.int16
    )


# --- round trips -----------------------------------------------------------


@pytest.mark.parametrize("channels", [1, 2, 4])
@pytest.mark.parametrize("rate", [8000, 44100])
@pytest.mark.parametrize("n_frames", [1, 7, 480])
def test_roundtrip_16bit(channels, rate, n_frames):
    sig = _signal(n_frames, channels)
    data = wav.encode_wav(sig, rate, channels, bits=16)
    got_rate, got_ch, got_bits, got_n, got = wav.decode_wav(data)
    assert (got_rate, got_ch, got_bits, got_n) == (rate, channels, 16, n_frames)
    np.testing.assert_array_equal(got, sig.astype(np.int32))


def test_roundtrip_8bit():
    sig = (np.arange(33, dtype=np.int64)[:, None] * 7 % 256).astype(np.uint8)
    data = wav.encode_wav(sig, 8000, 1, bits=8)
    rate, ch, bits, n, got = wav.decode_wav(data)
    assert (rate, ch, bits, n) == (8000, 1, 8, 33)
    np.testing.assert_array_equal(got, sig.astype(np.int32))


def test_odd_data_length_is_word_aligned():
    # 8-bit mono with odd frame count → odd data chunk → pad byte; the
    # file must still parse and the pad must not leak into the samples
    sig = np.array([[1], [2], [3]], dtype=np.uint8)
    data = wav.encode_wav(sig, 8000, 1, bits=8)
    assert len(data) % 2 == 0
    *_, got = wav.decode_wav(data)
    np.testing.assert_array_equal(got, sig.astype(np.int32))


# --- stdlib `wave` cross-validation (both directions) ----------------------


def test_stdlib_wave_reads_our_output():
    sig = _signal(240, 2, seed=5)
    data = wav.encode_wav(sig, 22050, 2, bits=16)
    with stdlib_wave.open(io.BytesIO(data)) as w:
        assert w.getnchannels() == 2
        assert w.getframerate() == 22050
        assert w.getsampwidth() == 2
        assert w.getnframes() == 240
        raw = w.readframes(240)
    np.testing.assert_array_equal(
        np.frombuffer(raw, dtype="<i2").reshape(-1, 2), sig
    )


def test_we_read_stdlib_wave_output():
    sig = _signal(100, 1, seed=9)
    buf = io.BytesIO()
    with stdlib_wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(sig.astype("<i2").tobytes())
    rate, ch, bits, n, got = wav.decode_wav(buf.getvalue())
    assert (rate, ch, bits, n) == (16000, 1, 16, 100)
    np.testing.assert_array_equal(got, sig.astype(np.int32))


# --- adversarial corpus ----------------------------------------------------


def _valid() -> bytes:
    return wav.encode_wav(_signal(10, 1), 8000, 1, bits=16)


@pytest.mark.parametrize(
    "mutate, reason",
    [
        (lambda d: b"RIFX" + d[4:], "bad RIFF magic"),
        (lambda d: d[:8] + b"AVI " + d[12:], "not WAVE form"),
        (lambda d: d[:-6], "truncated data chunk"),
        (lambda d: d.replace(b"fmt ", b"fmtX"), "missing fmt"),
        # format tag 3 = IEEE float — outside the PCM envelope
        (lambda d: d[:20] + struct.pack("<H", 3) + d[22:], "float format tag"),
        # block align corrupted to disagree with channels*width
        (lambda d: d[:32] + struct.pack("<H", 7) + d[34:], "block align"),
    ],
)
def test_adversarial_raises(mutate, reason):
    with pytest.raises(ValueError):
        wav.decode_wav(mutate(_valid()))


def test_extra_chunks_are_skipped():
    # a LIST chunk between fmt and data (common in real recorders) must
    # be walked over, including its odd-size pad byte
    d = _valid()
    fmt_end = d.index(b"data")
    listed = (
        d[:fmt_end]
        + b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
        + d[fmt_end:]
    )
    listed = listed[:4] + struct.pack("<I", len(listed) - 8) + listed[8:]
    rate, ch, bits, n, got = wav.decode_wav(listed)
    assert (rate, ch, n) == (8000, 1, 10)


# --- resample kernels ------------------------------------------------------


def test_resample_nearest_floor_mapping():
    sig = _signal(48, 2)
    out = wav.resample_nearest(sig.astype(np.int32), 16)
    idx = (np.arange(16, dtype=np.int64) * 48) // 16
    np.testing.assert_array_equal(out, sig.astype(np.int32)[idx])


def test_resample_identity_when_same_length():
    sig = _signal(50, 1).astype(np.int32)
    np.testing.assert_array_equal(wav.resample_nearest(sig, 50), sig)
    np.testing.assert_array_equal(wav.resample_linear(sig, 50), sig)


def test_resample_linear_constant_signal_is_exact():
    sig = np.full((100, 2), 123, dtype=np.int32)
    out = wav.resample_linear(sig, 37)
    np.testing.assert_array_equal(out, np.full((37, 2), 123))


def test_resample_linear_is_monotone_on_ramp():
    sig = np.arange(200, dtype=np.int32)[:, None] * 10
    out = wav.resample_linear(sig, 60)[:, 0]
    assert np.all(np.diff(out) >= 0)
    assert out[0] >= sig[0, 0] and out[-1] <= sig[-1, 0]


def test_resample_empty_signal_raises_valueerror():
    # a structurally valid WAV may carry an empty data chunk; the
    # resamplers must fail with a precise error, not a numpy IndexError
    empty = np.zeros((0, 2), dtype=np.int32)
    with pytest.raises(ValueError, match="empty signal"):
        wav.resample_nearest(empty, 32)
    with pytest.raises(ValueError, match="empty signal"):
        wav.resample_linear(empty, 32)
    # and the empty WAV itself still round-trips
    rate, ch, bits, n, got = wav.decode_wav(
        wav.encode_wav(np.zeros((0, 2), dtype=np.int16), 8000, 2)
    )
    assert n == 0 and got.shape == (0, 2)


# --- IEEE-float lane ---------------------------------------------------------


@pytest.mark.parametrize("bits", [32, 64])
def test_float_roundtrip_exact(bits):
    """IEEE-float WAV (format tag 3): bit-exact sample round-trip
    through the explicit float front (float32 widens exactly)."""
    rng = np.random.default_rng(53)
    for n, ch in [(1, 1), (17, 2), (480, 4)]:
        dt = "<f4" if bits == 32 else "<f8"
        sig = rng.standard_normal((n, ch)).astype(dt)
        d = wav.encode_wav_float(sig, 44100, ch, bits=bits)
        rate, C, B, N, out = wav.decode_wav_float(d)
        assert (rate, C, B, N) == (44100, ch, bits, n)
        np.testing.assert_array_equal(out, sig.astype(np.float64))


def test_float_contract_routing_and_fact_chunk():
    d16 = wav.encode_wav(np.zeros((4, 1), np.int16), 8000, 1)
    df = wav.encode_wav_float(np.zeros((5, 2), np.float32), 8000, 2)
    with pytest.raises(ValueError, match="decode_wav_float"):
        wav.decode_wav(df)
    with pytest.raises(ValueError, match="use decode_wav"):
        wav.decode_wav_float(d16)
    # the spec-required fact chunk carries the frame count
    at = df.index(b"fact")
    import struct as _s
    ln, nf = _s.unpack("<II", df[at + 4 : at + 12])
    assert (ln, nf) == (4, 5)
    with pytest.raises(ValueError, match="float bits"):
        wav.encode_wav_float(np.zeros((2, 1), np.float32), 8000, 1, bits=16)


def test_float_truncation_raises():
    d = wav.encode_wav_float(np.ones((64, 2), np.float32), 16000, 2)
    for cut in (0.2, 0.6, 0.95):
        with pytest.raises(ValueError):
            wav.decode_wav_float(d[: int(len(d) * cut)])


def test_javasound_reads_our_float_wav(spark, tmp_path):
    """Independent container check: javax.sound.sampled (a completely
    separate RIFF implementation) must parse our float WAV's header —
    PCM_FLOAT encoding, rate, channels, 32-bit — and hand back the
    identical raw frame bytes."""
    import os

    rng = np.random.default_rng(59)
    sig = rng.standard_normal((37, 2)).astype("<f4")
    p = os.path.join(str(tmp_path), "f.wav")
    with open(p, "wb") as f:
        f.write(wav.encode_wav_float(sig, 22050, 2, bits=32))
    jvm = spark._jvm
    ais = jvm.javax.sound.sampled.AudioSystem.getAudioInputStream(
        jvm.java.io.File(p)
    )
    fmt = ais.getFormat()
    assert fmt.getEncoding().toString() == "PCM_FLOAT"
    assert fmt.getSampleRate() == 22050.0
    assert fmt.getChannels() == 2
    assert fmt.getSampleSizeInBits() == 32
    assert not fmt.isBigEndian()
    assert ais.getFrameLength() == 37
    data = bytearray()
    while True:
        b = ais.readNBytes(4096)
        if not b:
            break
        data.extend(b)
    assert bytes(data) == sig.tobytes()
