"""Pure-numpy image codecs (PNG/PPM/BMP): lossless round-trips, spec-
derived foreign-stream decoding (all five PNG filters, gray/RGBA color
types, top-down BMPs), corruption errors, and the corpus + multimodal
integration (mixed-format corpora decode identically to raw)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from datasketches_cpp_spark.operators.imagecodec import (
    LOSSLESS_FORMATS,
    SUPPORTED_FORMATS,
    ImageCodecError,
    decode,
    decode_bmp,
    decode_dct,
    decode_png,
    encode,
    encode_bmp,
    encode_dct,
    encode_png,
    encode_ppm,
)
from datasketches_cpp_spark.sources.images import psnr

RNG = np.random.default_rng(99)


def _px(w: int, h: int) -> np.ndarray:
    return RNG.integers(0, 256, size=h * w * 3, dtype=np.uint8)


@pytest.mark.parametrize("fmt", ["png", "ppm", "bmp"])
@pytest.mark.parametrize("w,h", [(32, 32), (33, 7), (1, 1), (64, 3)])
def test_lossless_roundtrip(fmt, w, h):
    """decode(encode(x)) == x exactly — PSNR = ∞, which satisfies the
    input-hint ≥ 40 dB decode invariant with infinite margin."""
    px = _px(w, h)
    buf = encode(px, w, h, fmt)
    back = decode(buf, w, h, fmt)
    assert np.array_equal(back, px), fmt
    assert psnr(px, back) == float("inf")


def test_encode_deterministic():
    px = _px(16, 16)
    for fmt in ("png", "ppm", "bmp"):
        assert encode(px, 16, 16, fmt) == encode(px, 16, 16, fmt)


def _apply_filter(f: int, row: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    """Forward PNG filtering (what an encoder does) — used to craft
    foreign streams exercising every unfilter branch."""
    row16 = row.astype(np.int16)
    left = np.concatenate([np.zeros(bpp, np.int16), row16[:-bpp]])
    up = prev.astype(np.int16)
    upleft = np.concatenate([np.zeros(bpp, np.int16), up[:-bpp]])
    if f == 0:
        out = row16
    elif f == 1:
        out = row16 - left
    elif f == 2:
        out = row16 - up
    elif f == 3:
        out = row16 - (left + up) // 2
    else:  # Paeth
        p = left + up - upleft
        pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - upleft)
        pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft))
        out = row16 - pred
    return (out % 256).astype(np.uint8)


def _craft_png(px: np.ndarray, w: int, h: int, channels: int, color_type: int,
               filters: list[int]) -> bytes:
    """Build a PNG the way a real encoder with per-row filter choice
    would — from the spec, not from our encoder."""
    from datasketches_cpp_spark.operators.imagecodec import _png_chunk, _PNG_SIG

    img = px.reshape(h, w * channels)
    raw = bytearray()
    prev = np.zeros(w * channels, np.uint8)
    for y in range(h):
        f = filters[y % len(filters)]
        raw.append(f)
        raw += _apply_filter(f, img[y], prev, channels).tobytes()
        prev = img[y]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def test_png_all_filters_rgb():
    """A foreign PNG cycling through every filter type per row must
    decode to the exact source pixels."""
    w, h = 21, 10
    px = _px(w, h)
    buf = _craft_png(px, w, h, 3, 2, filters=[0, 1, 2, 3, 4])
    out, dw, dh = decode_png(buf)
    assert (dw, dh) == (w, h)
    assert np.array_equal(out, px)


def test_png_gray_and_rgba():
    w, h = 12, 9
    gray = RNG.integers(0, 256, size=h * w, dtype=np.uint8)
    buf = _craft_png(gray, w, h, 1, 0, filters=[0, 1, 2, 3, 4])
    out, _, _ = decode_png(buf)
    assert np.array_equal(out.reshape(h, w, 3)[:, :, 0], gray.reshape(h, w))
    assert np.array_equal(out.reshape(h, w, 3)[:, :, 1], gray.reshape(h, w))
    rgba = RNG.integers(0, 256, size=h * w * 4, dtype=np.uint8)
    buf = _craft_png(rgba, w, h, 4, 6, filters=[4, 3, 2, 1, 0])
    out, _, _ = decode_png(buf)
    assert np.array_equal(
        out.reshape(h, w, 3), rgba.reshape(h, w, 4)[:, :, :3]
    )


def test_bmp_topdown_and_padding():
    """Foreign BMPs: negative height = top-down row order; odd widths
    exercise the 4-byte row padding."""
    w, h = 33, 5
    px = _px(w, h)
    buf = bytearray(encode_bmp(px, w, h))
    out, dw, dh = decode_bmp(bytes(buf))
    assert np.array_equal(out, px) and (dw, dh) == (w, h)
    # flip to top-down: negate height, rows already bottom-up → reorder
    row_len = w * 3
    stride = row_len + ((-row_len) % 4)
    data = np.frombuffer(bytes(buf[54:]), np.uint8).reshape(h, stride)[::-1]
    td = bytes(buf[:54]) + data.tobytes()
    td = td[:22] + struct.pack("<i", -h) + td[26:]
    out2, _, _ = decode_bmp(td)
    assert np.array_equal(out2, px)


def test_ppm_header_comments():
    px = _px(8, 4)
    buf = b"P6\n# a comment\n8 4\n# another\n255\n" + px.tobytes()
    assert np.array_equal(decode(buf, 8, 4, "ppm"), px)


def test_error_paths():
    px = _px(8, 8)
    with pytest.raises(ImageCodecError, match="unsupported format"):
        encode(px, 8, 8, "heic")  # 'jpeg' and 'webp' became REAL in round 4
    with pytest.raises(ImageCodecError, match="not a PNG"):
        decode_png(b"\x00" * 20)
    with pytest.raises(ImageCodecError, match="metadata"):
        decode(encode_png(px, 8, 8), 9, 8, "png")
    with pytest.raises(ImageCodecError):
        decode(encode_ppm(px, 8, 8)[:-5], 8, 8, "ppm")  # truncated
    with pytest.raises(ImageCodecError):
        decode(px.tobytes()[:-1], 8, 8, "raw")  # size mismatch


# ---------------------------------------------------------------------------
# DCT (lossy lane) — the input_hint's "PSNR ≥ 40 dB for lossy" invariant
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("w,h", [(32, 32), (64, 64), (33, 7), (1, 1), (8, 8)])
def test_dct_psnr_floor_on_noise(w, h):
    """Uniform random noise is the WORST input for a transform codec —
    the analytic floor (PSNR ≥ 20·log10(255/(s/2+0.5)) = 44.6 dB at the
    default step 2) must hold even there."""
    px = _px(w, h)
    back = decode(encode(px, w, h, "dct"), w, h, "dct")
    assert psnr(px, back) >= 44.0, (w, h, psnr(px, back))


def test_dct_quality_knob():
    """Lower quality → coarser steps → smaller stream, lower (but still
    gated) PSNR; quality ≥ 80 keeps the 40 dB invariant by construction."""
    # smooth gradient: the compressible case
    y, x = np.mgrid[0:64, 0:64]
    px = np.stack([x * 4, y * 4, (x + y) * 2], axis=-1).astype(np.uint8).reshape(-1)
    sizes, psnrs = [], []
    for q in (95, 90, 80):
        buf = encode_dct(px, 64, 64, quality=q)
        back, _, _ = decode_dct(buf)
        sizes.append(len(buf))
        psnrs.append(psnr(px, back))
    # PSNR degrades monotonically with quality; stream size on an
    # already-sparse spectrum is zlib-noise-dominated, so only the
    # compression property itself is asserted (< half the 12 KiB raw)
    assert psnrs[0] >= psnrs[1] >= psnrs[2] >= 40.0
    assert max(sizes) < 64 * 64 * 3 // 2


def test_dct_deterministic_and_errors():
    px = _px(16, 16)
    assert encode(px, 16, 16, "dct") == encode(px, 16, 16, "dct")
    # 'jpg' is REAL baseline T.81 as of round 4 (jpegcodec.py): its bytes
    # start with SOI and round-trip through the real decoder
    jpg = encode(px, 16, 16, "jpg")
    assert jpg[:2] == b"\xff\xd8" and jpg != encode(px, 16, 16, "dct")
    assert decode(jpg, 16, 16, "jpg").shape == (16 * 16 * 3,)
    with pytest.raises(ImageCodecError, match="not a DCT1"):
        decode_dct(b"JUNKJUNKJUNKJUNK")
    with pytest.raises(ImageCodecError, match="metadata"):
        decode(encode(px, 16, 16, "dct"), 17, 16, "dct")
    with pytest.raises(ImageCodecError):
        decode_dct(encode(px, 16, 16, "dct")[:-7])  # truncated zlib
    with pytest.raises(ImageCodecError, match="quality"):
        encode_dct(px, 16, 16, quality=0)


def test_dct_corpus_decodes_within_gate(spark):
    """A fmt='dct' corpus: decoded pixels sit within the PSNR gate of the
    raw corpus from the same seed (same RNG stream → same source pixels),
    and the Spark-side grouped decode path handles the lossy format."""
    from datasketches_cpp_spark.operators.multimodal import decode_stats
    from datasketches_cpp_spark.sources.images import decode_image, generate_images

    raw_pdf, _ = generate_images(300, seed=23)
    dct_pdf, _ = generate_images(300, seed=23, fmt="dct")
    assert (raw_pdf["phash"] == dct_pdf["phash"]).all()
    for i in range(0, 300, 37):
        a = np.frombuffer(raw_pdf["bytes"][i], np.uint8)
        b = decode_image(
            dct_pdf["bytes"][i], dct_pdf["w"][i], dct_pdf["h"][i], "dct"
        )
        assert psnr(a, b) >= 40.0
    df = spark.createDataFrame(dct_pdf)
    stats = decode_stats(df).toPandas()
    assert len(stats) == 300


def test_corpus_mixed_formats_decode_identical(spark):
    """A 'mixed' corpus (per-id rotation over raw/bmp/png/ppm) must
    yield byte-identical decode_stats to the raw corpus from the same
    seed — the codecs are lossless and the generator's RNG stream does
    not depend on fmt."""
    import pandas as pd

    from datasketches_cpp_spark.operators.multimodal import decode_stats
    from datasketches_cpp_spark.sources.images import generate_images

    raw_pdf, _ = generate_images(400, seed=17)
    mix_pdf, _ = generate_images(400, seed=17, fmt="mixed")
    assert set(mix_pdf["fmt"]) == set(LOSSLESS_FORMATS)
    assert "dct" in SUPPORTED_FORMATS and "dct" not in LOSSLESS_FORMATS
    assert (raw_pdf["phash"] == mix_pdf["phash"]).all()

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        df = spark.createDataFrame(pdf)
        return (
            decode_stats(df).toPandas().sort_values("id", ignore_index=True)
        )

    a, b = stats(raw_pdf), stats(mix_pdf)
    pd.testing.assert_frame_equal(a, b)
