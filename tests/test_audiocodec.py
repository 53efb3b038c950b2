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
    # MP3-in-WAV (code 0x55) is a documented seam
    bad = bytearray(good)
    struct.pack_into("<H", bad, 20, 0x55)
    with pytest.raises(WavError, match="format code=85"):
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


def _snr(a, b):
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    e = ((a - b) ** 2).mean()
    return float("inf") if e == 0 else 10 * np.log10((a**2).mean() / e)


@pytest.mark.parametrize(
    "codec,floor",
    [
        ("pcm16", None), ("pcm24", None), ("pcm32", None),
        ("float32", None), ("float64", None),
        ("pcm8", 35.0), ("alaw", 33.0), ("mulaw", 33.0), ("ima_adpcm", 25.0),
    ],
)
def test_wav_codec_roundtrips(codec, floor):
    """Every decode_wav codec: lossless paths are byte-exact, lossy paths
    (8-bit PCM, G.711, IMA ADPCM) clear their published quality bands."""
    t = np.arange(16000)
    x = np.sin(2 * np.pi * 440 * t / 16000) + 0.3 * np.sin(
        2 * np.pi * 1330 * t / 16000
    )
    pcm = (np.clip(x / 1.3, -1, 1) * 28000).astype(np.int16)
    back, rate = decode_wav(encode_wav(pcm, 16000, codec=codec))
    assert rate == 16000 and len(back) == len(pcm)
    if floor is None:
        assert np.array_equal(back, pcm)
    else:
        assert _snr(pcm, back) >= floor


def test_wav_stereo_ima_downmix():
    """Stereo IMA ADPCM: 4-byte-word channel interleave decodes and
    downmixes to the same mono as a stereo pcm16 of the same samples
    (within ADPCM quantization error)."""
    pcm = _sine_pcm(6000)
    st = np.stack([pcm, pcm // 2], axis=1)
    exact, _ = decode_wav(encode_wav(st, 16000, codec="pcm16"))
    lossy, _ = decode_wav(encode_wav(st, 16000, codec="ima_adpcm"))
    assert len(lossy) == len(exact) == 6000
    # the fixture's 4.7 kHz component pushes per-sample slope near the max
    # ADPCM step, so ~22 dB is codec-typical here; a wrong channel
    # de-interleave lands near 0 dB
    assert _snr(exact, lossy) >= 15.0


def test_compressed_wav_lane_clusters(spark):
    """A mu-law-encoded twin clusters with its pcm16 original through the
    full audio dedup lane — G.711 noise stays below the landmark
    matching threshold."""
    from datasketches_cpp_spark.operators.audiodedup import dedup_audio

    pcm = _sine_pcm(16 * 1024)
    other = (_sine_pcm(16 * 1024) * 0).astype("<i2")
    rng = np.random.default_rng(3)
    other = (rng.standard_normal(16 * 1024) * 8000).astype("<i2")
    rows = [
        ("orig", pcm.tobytes(), "pcm16"),
        ("twin", bytearray(encode_wav(pcm, codec="mulaw")), "wav"),
        ("noise", other.tobytes(), "pcm16"),
    ]
    df = spark.createDataFrame(rows, "audio_id string, bytes binary, fmt string")
    out = dedup_audio(df)
    got = {r["id"]: r["cluster_id"] for r in out["assignments"].collect()}
    assert got["orig"] == got["twin"]
    assert got["noise"] != got["orig"]
