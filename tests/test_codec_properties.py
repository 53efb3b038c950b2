"""Hypothesis property tests for the pure-numpy codecs — the same
adversarial-input discipline that caught the KLL −0.0 serde edge:
random payloads (including extreme sample values and odd dims) must
round-trip within each codec's contract.

No Spark session needed; everything here is the kernel layer that runs
inside mapInPandas on executors."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from datasketches_cpp_spark.operators.audiocodec import decode_wav, encode_wav
from datasketches_cpp_spark.operators.avicodec import decode_avi, encode_avi
from datasketches_cpp_spark.operators.jpegcodec import (
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
)

_pcm = st.lists(
    st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=3000
)


def _snr(a, b):
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    e = ((a - b) ** 2).mean()
    p = (a**2).mean()
    if e == 0:
        return float("inf")
    if p == 0:
        return -float("inf")
    return 10 * np.log10(p / e)


@settings(max_examples=40, deadline=None)
@given(_pcm)
def test_wav_lossless_roundtrip_properties(samples):
    pcm = np.asarray(samples, "<i2")
    for codec in ("pcm16", "pcm24", "pcm32", "float32", "float64"):
        back, rate = decode_wav(encode_wav(pcm, 8000, codec=codec))
        assert rate == 8000
        assert np.array_equal(back, pcm), codec


@settings(max_examples=40, deadline=None)
@given(_pcm)
def test_wav_g711_roundtrip_properties(samples):
    """G.711 is a quantizer: round-tripping must be idempotent (decode of
    an encoded signal re-encodes to the same bytes) and each decoded
    sample must be the segment-quantized value of its input — error
    bounded by the largest mu-law step (~1024 around full scale)."""
    pcm = np.asarray(samples, "<i2")
    for codec in ("alaw", "mulaw"):
        buf = encode_wav(pcm, 8000, codec=codec)
        back, _ = decode_wav(buf)
        assert len(back) == len(pcm)
        err = np.abs(back.astype(np.int32) - pcm.astype(np.int32))
        assert err.max() <= 1024, (codec, int(err.max()))
        buf2 = encode_wav(back, 8000, codec=codec)
        assert buf2 == buf, f"{codec} re-encode not idempotent"


def test_wav_mulaw_negative_zero_regression():
    """Pinned Hypothesis counterexample: sample -1 quantizes to mu-law
    zero; the encoder must emit the canonical positive-zero code (0xFF),
    not minus-zero (0x7F), or decode→re-encode changes bytes."""
    pcm = np.asarray([-1], "<i2")
    buf = encode_wav(pcm, 8000, codec="mulaw")
    back, _ = decode_wav(buf)
    assert back[0] == 0
    assert encode_wav(back, 8000, codec="mulaw") == buf
    # the single code byte precedes the RIFF even-size pad byte
    assert buf[-2] == 0xFF


@settings(max_examples=25, deadline=None)
@given(_pcm, st.sampled_from([1, 2]))
def test_wav_ima_adpcm_roundtrip_properties(samples, channels):
    """IMA ADPCM: exact length preservation (fact chunk) for mono and
    stereo, first sample of every block exact (it travels in the block
    header), bounded worst-case step error elsewhere."""
    pcm = np.asarray(samples, "<i2")
    arr = pcm if channels == 1 else np.stack([pcm, pcm[::-1]], axis=1)
    back, _ = decode_wav(encode_wav(arr, 8000, codec="ima_adpcm"))
    assert len(back) == len(pcm)
    # block 0's header sample is exact; for mono that's the mixdown too
    if channels == 1:
        assert back[0] == pcm[0]


@settings(max_examples=15, deadline=None)
@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=30, max_value=95),
    st.booleans(),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_progressive_equals_sequential_property(w, h, quality, subsample, seed):
    """For ANY dims/quality/subsampling: fully-decoded progressive pixels
    are identical to the sequential path (same quantized coefficients)."""
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    seq, sw, sh = decode_jpeg(encode_jpeg(px, w, h, quality=quality,
                                          subsample=subsample))
    pro, pw, ph = decode_jpeg(
        encode_jpeg_progressive(px, w, h, quality=quality, subsample=subsample)
    )
    assert (sw, sh) == (pw, ph) == (w, h)
    assert np.array_equal(seq, pro)


@settings(max_examples=15, deadline=None)
@given(
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=1, max_value=5),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_avi_dib_roundtrip_property(w, h, n, seed):
    rng = np.random.default_rng(seed)
    rawv = rng.integers(0, 256, n * h * w * 3, dtype=np.uint8).tobytes()
    back, dw, dh, dn = decode_avi(encode_avi(rawv, w, h, n))
    assert (dw, dh, dn) == (w, h, n)
    assert back == rawv


def test_avi_skips_audio_stream():
    """An AVI whose FIRST strl is an audio stream (16-byte WAVEFORMATEX
    strf) must not trip the video strf parser — stream typing comes from
    the preceding strh."""
    import struct

    rng = np.random.default_rng(3)
    w, h, n = 8, 6, 2
    rawv = rng.integers(0, 256, n * h * w * 3, dtype=np.uint8).tobytes()
    avi = bytearray(encode_avi(rawv, w, h, n))

    def chunk(cc, body):
        out = cc + struct.pack("<I", len(body)) + body
        return out + (b"\x00" if len(body) & 1 else b"")

    auds_strh = b"auds" + b"\x00" * 52
    auds_strf = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    auds_strl = chunk(b"LIST", b"strl" + chunk(b"strh", auds_strh)
                      + chunk(b"strf", auds_strf))
    # splice the audio strl in FRONT of the video strl inside hdrl
    i = bytes(avi).find(b"strl")
    assert i > 0
    list_start = i - 8  # LIST header of the video strl
    patched = bytes(avi[:list_start]) + auds_strl + bytes(avi[list_start:])
    # fix up RIFF and hdrl LIST sizes
    patched = bytearray(patched)
    struct.pack_into("<I", patched, 4, len(patched) - 8)
    hdrl = bytes(patched).find(b"hdrl")
    (old_sz,) = struct.unpack_from("<I", patched, hdrl - 4)
    struct.pack_into("<I", patched, hdrl - 4, old_sz + len(auds_strl))
    back, dw, dh, dn = decode_avi(bytes(patched))
    assert (dw, dh, dn) == (w, h, n)
    assert back == rawv


@settings(max_examples=25, deadline=None)
@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=256),
    st.booleans(),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_gif_roundtrip_property(w, h, ncolors, interlace, seed):
    """Any ≤256-color image round-trips bit-exactly through the GIF
    codec, interlaced or not — including 1-pixel images, 1-row strips and
    palettes whose size is not a power of two."""
    from datasketches_cpp_spark.operators.gifcodec import decode_gif, encode_gif

    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, size=(ncolors, 3), dtype=np.uint8)
    px = pal[rng.integers(0, ncolors, size=w * h)].reshape(-1)
    back, dw, dh = decode_gif(encode_gif(px, w, h, interlace=interlace))
    assert (dw, dh) == (w, h)
    assert np.array_equal(back, px)


# -- FLAC ---------------------------------------------------------------------

from datasketches_cpp_spark.operators.flaccodec import decode_flac, encode_flac


@settings(max_examples=30, deadline=None)
@given(_pcm, st.booleans(), st.sampled_from([192, 576, 4096]))
def test_flac_mono_lossless_properties(samples, lpc, blocksize):
    pcm = np.asarray(samples, "<i2")
    back, rate = decode_flac(
        encode_flac(pcm, 8000, blocksize=blocksize, lpc=lpc)
    )
    assert rate == 8000
    assert np.array_equal(back, pcm)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-32768, max_value=32767),
            st.integers(min_value=-32768, max_value=32767),
        ),
        min_size=1,
        max_size=2000,
    ),
    st.sampled_from(["independent", "left_side", "right_side", "mid_side"]),
    st.booleans(),
)
def test_flac_stereo_lossless_properties(pairs, mode, lpc):
    st2 = np.asarray(pairs, "<i2")
    back, _ = decode_flac(
        encode_flac(st2, 8000, channels=2, stereo_mode=mode, lpc=lpc)
    )
    exp = np.clip(
        np.round(np.mean(st2.astype(np.int64), axis=1)), -32768, 32767
    ).astype("<i2")
    assert np.array_equal(back, exp)


# -- MP4 ----------------------------------------------------------------------

from datasketches_cpp_spark.operators.mp4codec import decode_mp4, encode_mp4


@settings(max_examples=25, deadline=None)
@given(
    st.integers(min_value=1, max_value=6),
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_mp4_raw_roundtrip_properties(n, w, h, seed):
    g = np.random.default_rng(seed)
    rawv = g.integers(0, 256, n * h * w * 3, dtype=np.uint8).tobytes()
    out, ow, oh, on = decode_mp4(encode_mp4(rawv, w, h, n, codec="raw"))
    assert (ow, oh, on) == (w, h, n)
    assert out == rawv


@settings(max_examples=15, deadline=None)
@given(
    st.integers(min_value=1, max_value=3),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_mp4_jpeg_roundtrip_properties(n, seed):
    w = h = 16
    g = np.random.default_rng(seed)
    base = g.integers(0, 256, (n, h // 4, w // 4, 3), dtype=np.uint8)
    rawv = np.repeat(np.repeat(base, 4, axis=1), 4, axis=2).tobytes()
    out, ow, oh, on = decode_mp4(
        encode_mp4(rawv, w, h, n, codec="jpeg", quality=97)
    )
    assert (ow, oh, on) == (w, h, n)
    assert _snr(
        np.frombuffer(rawv, np.uint8), np.frombuffer(out, np.uint8)
    ) >= 30.0
