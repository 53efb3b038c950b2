"""FLAC codec tests (operators/flaccodec.py): lossless round-trips of
the fixture twin across subframe types and stereo decorrelation modes,
CRC enforcement, fail-fast seams, and the audio lane's to_pcm16
dispatch."""

import numpy as np
import pytest

from datasketches_cpp_spark.operators.flaccodec import (
    FlacError,
    decode_flac,
    encode_flac,
)


def _tone(n=10000, seed=7, amp=3000):
    g = np.random.default_rng(seed)
    t = np.arange(n)
    x = amp * np.sin(2 * np.pi * 440 * t / 16000) + g.integers(-50, 51, n)
    return x.astype("<i2")


def test_mono_roundtrip_fixed_and_lpc():
    x = _tone()
    for lpc in (False, True):
        buf = encode_flac(x, 16000, lpc=lpc)
        out, rate = decode_flac(buf)
        assert rate == 16000
        assert np.array_equal(out, x)


def test_compresses():
    x = _tone()
    assert len(encode_flac(x, 16000)) < 0.7 * 2 * len(x)


@pytest.mark.parametrize(
    "mode", ["independent", "left_side", "right_side", "mid_side"]
)
@pytest.mark.parametrize("lpc", [False, True])
def test_stereo_modes_roundtrip(mode, lpc):
    x = _tone(8000, seed=11)
    st = np.stack([x, np.roll(x, 5)], axis=1).astype("<i2")
    buf = encode_flac(st, 16000, channels=2, stereo_mode=mode, lpc=lpc)
    out, _ = decode_flac(buf)
    exp = np.clip(
        np.round(np.mean(st.astype(np.int64), axis=1)), -32768, 32767
    ).astype("<i2")
    assert np.array_equal(out, exp)


def test_edge_streams():
    for x in (
        np.zeros(100, "<i2"),                      # CONSTANT subframes
        np.full(513, -32768, "<i2"),               # extreme constant
        np.array([1], "<i2"),                      # single sample
        np.array([-32768, 32767] * 300, "<i2"),    # max alternation
        _tone(4096 * 2),                           # exact block boundary
    ):
        out, _ = decode_flac(encode_flac(x, 8000))
        assert np.array_equal(out, x)


def test_crc_enforced():
    buf = bytearray(encode_flac(_tone(2000), 16000))
    buf[-3] ^= 0x40  # flip a bit in the last frame's payload/CRC region
    with pytest.raises(FlacError):
        decode_flac(bytes(buf))


def test_garbage_and_truncation():
    with pytest.raises(FlacError):
        decode_flac(b"NotFlac" + b"\x00" * 64)
    buf = encode_flac(_tone(5000), 16000)
    with pytest.raises(FlacError):
        decode_flac(buf[: len(buf) - 10])


def test_to_pcm16_dispatch():
    from datasketches_cpp_spark.operators.audiocodec import to_pcm16

    x = _tone(3000)
    assert to_pcm16(encode_flac(x, 16000), "flac") == x.tobytes()
    with pytest.raises(NotImplementedError):
        to_pcm16(b"\x00", "mp3")
