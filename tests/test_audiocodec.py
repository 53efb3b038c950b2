"""RIFF/WAVE container parsing (operators/audiocodec.py): round-trip law,
stereo downmix, extensible-format acceptance, fail-fast seams, and the
wav lane flowing through audio_landmarks / audio_features identically to
raw pcm16."""

import struct

import numpy as np
import pytest

from datasketches_cpp_spark.operators.audiocodec import (
    WavError,
    decode_wav,
    encode_wav,
    to_pcm16,
)


def _sine_pcm(n=4096, seed=0):
    t = np.arange(n)
    x = np.sin(2 * np.pi * 50 * t / 1024) + 0.5 * np.sin(2 * np.pi * 300 * t / 1024)
    return (np.clip(x, -1, 1) * 20000).astype("<i2")


def test_wav_roundtrip():
    pcm = _sine_pcm()
    buf = encode_wav(pcm, sample_rate=22050)
    back, rate = decode_wav(buf)
    assert rate == 22050
    assert np.array_equal(back, pcm)
    assert to_pcm16(buf, "wav") == pcm.tobytes()
    assert to_pcm16(pcm.tobytes(), "pcm16") == pcm.tobytes()


def test_wav_stereo_downmix():
    left = _sine_pcm()
    right = np.zeros_like(left)
    inter = np.empty(2 * len(left), "<i2")
    inter[0::2], inter[1::2] = left, right
    body = inter.tobytes()
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 16000, 64000, 4, 16)
    data = b"data" + struct.pack("<I", len(body)) + body
    buf = b"RIFF" + struct.pack("<I", 4 + len(fmt) + len(data)) + b"WAVE" + fmt + data
    back, _ = decode_wav(buf)
    # float mean then int16 cast truncates toward zero
    assert np.array_equal(back, (left / 2.0).astype(np.int16))


def test_wav_extensible_pcm_accepted():
    pcm = _sine_pcm(2048)
    body = pcm.tobytes()
    ext = struct.pack("<HHI", 22, 16, 1) + struct.pack("<H", 1) + b"\x00" * 14
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16 + len(ext), 0xFFFE, 1, 8000,
                                16000, 2, 16) + ext
    data = b"data" + struct.pack("<I", len(body)) + body
    buf = b"RIFF" + struct.pack("<I", 4 + len(fmt) + len(data)) + b"WAVE" + fmt + data
    back, rate = decode_wav(buf)
    assert rate == 8000 and np.array_equal(back, pcm)


def test_wav_failfast_seams():
    with pytest.raises(WavError, match="RIFF"):
        decode_wav(b"nope")
    pcm = _sine_pcm(512)
    good = encode_wav(pcm)
    with pytest.raises(WavError, match="truncated"):
        decode_wav(good[:-10])
    # float format (code 3) is a documented seam
    bad = bytearray(good)
    struct.pack_into("<H", bad, 20, 3)
    with pytest.raises(WavError, match="format code=3"):
        decode_wav(bytes(bad))
    with pytest.raises(NotImplementedError, match="mp3"):
        to_pcm16(b"\x00" * 64, "mp3")


def test_wav_lane_matches_pcm16_lane(spark):
    """fmt='wav' clips land in the same landmark sets and clusters as the
    identical samples shipped as raw pcm16 — the planted-truth contract is
    container-independent."""
    from datasketches_cpp_spark.operators.audiodedup import audio_landmarks
    from datasketches_cpp_spark.operators.multimodal import audio_features

    pcm = _sine_pcm(8 * 1024)
    rows = [
        ("raw", pcm.tobytes(), "pcm16"),
        ("wav", bytearray(encode_wav(pcm)), "wav"),
    ]
    df = spark.createDataFrame(rows, "audio_id string, bytes binary, fmt string")
    got = {}
    for r in audio_landmarks(df, window=1024).collect():
        got.setdefault(r["audio_id"], set()).add(r["landmark"])
    assert got["raw"] == got["wav"] and len(got["raw"]) > 0
    feats = {r["audio_id"]: (r["n_windows"], r["rms"]) for r in
             audio_features(df, window=1024).collect()}
    assert feats["raw"] == feats["wav"]
