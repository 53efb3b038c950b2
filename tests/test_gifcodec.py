"""GIF codec: exact-palette round-trips, an INDEPENDENT minimal LZW
writer as a decoder cross-check, interlace, transparency + disposal
compositing, GIF87a, corruption errors, the imagecodec registry seam and
the animated-GIF → video-lane path."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from datasketches_cpp_spark.operators.gifcodec import (
    GifError,
    decode_gif,
    decode_gif_frames,
    encode_gif,
    encode_gif_animation,
)
from datasketches_cpp_spark.operators.imagecodec import (
    LOSSLESS_FORMATS,
    PALETTE_FORMATS,
    SUPPORTED_FORMATS,
    decode,
    encode,
)

RNG = np.random.default_rng(4242)


def _palette_image(w: int, h: int, ncolors: int, rng=RNG):
    pal = rng.integers(0, 256, size=(ncolors, 3), dtype=np.uint8)
    idx = rng.integers(0, ncolors, size=w * h)
    return pal[idx].reshape(-1), pal, idx


# --------------------------------------------------------------------------
# round-trips through our own encoder
# --------------------------------------------------------------------------


@pytest.mark.parametrize("w,h,ncolors", [
    (32, 32, 256), (33, 7, 17), (1, 1, 1), (64, 3, 2), (16, 16, 255),
])
def test_roundtrip_exact(w, h, ncolors):
    px, _, _ = _palette_image(w, h, ncolors)
    back, dw, dh = decode_gif(encode_gif(px, w, h))
    assert (dw, dh) == (w, h)
    assert np.array_equal(back, px)


def test_roundtrip_interlaced():
    for w, h in [(32, 32), (17, 13), (8, 1), (3, 4)]:
        px, _, _ = _palette_image(w, h, 29)
        back, _, _ = decode_gif(encode_gif(px, w, h, interlace=True))
        assert np.array_equal(back, px), (w, h)


def test_roundtrip_full_table_and_clear():
    """128x128 noise over 256 colors drives the code width to 12 bits and
    overflows the 4096-entry table, forcing a mid-stream CLEAR."""
    px, _, _ = _palette_image(128, 128, 256)
    back, _, _ = decode_gif(encode_gif(px, 128, 128))
    assert np.array_equal(back, px)


def test_encode_refuses_truecolor():
    """>256 distinct colors must be a hard error, never quantization."""
    px = RNG.integers(0, 256, size=32 * 32 * 3, dtype=np.uint8)
    assert len(np.unique(px.reshape(-1, 3), axis=0)) > 256
    with pytest.raises(GifError, match="256"):
        encode_gif(px, 32, 32)


def test_encode_deterministic():
    px, _, _ = _palette_image(16, 16, 40)
    assert encode_gif(px, 16, 16) == encode_gif(px, 16, 16)


# --------------------------------------------------------------------------
# decoder vs an INDEPENDENT writer (the clear-per-symbol "uncompressed
# GIF" form — a second implementation of the wire, not our encoder)
# --------------------------------------------------------------------------


def _uncompressed_gif(idx: np.ndarray, pal: np.ndarray, w: int, h: int) -> bytes:
    """Minimal literal-only GIF writer: emits CLEAR before every literal so
    the decoder's table never grows — codes stay at min_code_size+1 bits.
    Valid per the spec; shares no code with gifcodec's encoder."""
    bits = 1
    while (1 << bits) < len(pal):
        bits += 1
    mcs = max(2, bits)
    clear, end = 1 << mcs, (1 << mcs) + 1
    cs = mcs + 1
    bitbuf = bitcnt = 0
    data = bytearray()
    for code in [clear] + [
        v for i in np.asarray(idx, np.uint8).tolist() for v in (i, clear)
    ] + [end]:
        bitbuf |= code << bitcnt
        bitcnt += cs
        while bitcnt >= 8:
            data.append(bitbuf & 0xFF)
            bitbuf >>= 8
            bitcnt -= 8
    if bitcnt:
        data.append(bitbuf & 0xFF)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    table = np.zeros((1 << bits, 3), np.uint8)
    table[: len(pal)] = pal
    out += table.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
    out.append(mcs)
    for i in range(0, len(data), 255):
        chunk = bytes(data[i : i + 255])
        out.append(len(chunk))
        out += chunk
    out.append(0)
    out.append(0x3B)
    return bytes(out)


@pytest.mark.parametrize("w,h,ncolors", [(16, 16, 256), (9, 5, 3), (2, 2, 4)])
def test_decode_foreign_uncompressed_stream(w, h, ncolors):
    px, pal, idx = _palette_image(w, h, ncolors)
    back, dw, dh = decode_gif(_uncompressed_gif(idx, pal, w, h))
    assert (dw, dh) == (w, h)
    assert np.array_equal(back, px)


def test_decode_gif87a_header():
    px, pal, idx = _palette_image(8, 8, 4)
    buf = bytearray(_uncompressed_gif(idx, pal, 8, 8))
    buf[0:6] = b"GIF87a"
    back, _, _ = decode_gif(bytes(buf))
    assert np.array_equal(back, px)


# --------------------------------------------------------------------------
# animation: transparency, disposal, delta rects, video-lane layout
# --------------------------------------------------------------------------


def test_animation_delta_rects_composite():
    w, h = 24, 16
    pal = RNG.integers(0, 256, size=(64, 3), dtype=np.uint8)
    f0 = pal[RNG.integers(0, 64, size=w * h)].reshape(h, w, 3)
    f1 = f0.copy()
    f1[4:12, 6:18] = pal[RNG.integers(0, 16, size=8 * 12)].reshape(8, 12, 3)
    frames = np.stack([f0.reshape(-1), f1.reshape(-1)])
    buf = encode_gif_animation(frames, w, h, rects=[(0, 0, w, h), (6, 4, 12, 8)])
    raw, dw, dh, n = decode_gif_frames(buf)
    assert (dw, dh, n) == (w, h, 2)
    got = np.frombuffer(raw, np.uint8).reshape(n, h, w, 3)
    assert np.array_equal(got[0], f0)
    assert np.array_equal(got[1], f1)


def test_animation_transparency_shows_previous_canvas():
    w = h = 8
    base = np.full((h, w, 3), 200, np.uint8)
    overlay = np.zeros((h, w, 3), np.uint8)  # (0,0,0) = transparent key
    overlay[2:4, 2:4] = (10, 20, 30)
    frames = np.stack([base.reshape(-1), overlay.reshape(-1)])
    buf = encode_gif_animation(frames, w, h, transparent_color=(0, 0, 0))
    raw, _, _, n = decode_gif_frames(buf)
    got = np.frombuffer(raw, np.uint8).reshape(n, h, w, 3)
    expect = base.copy()
    expect[2:4, 2:4] = (10, 20, 30)
    assert np.array_equal(got[1], expect)


def test_disposal_restore_background_and_previous():
    w = h = 6
    a = np.full((h, w, 3), 50, np.uint8)
    b = np.full((h, w, 3), 90, np.uint8)
    c = np.full((h, w, 3), 130, np.uint8)
    # frame b stamps a 2x2 rect with disposal 3 (restore previous); frame c
    # stamps a different rect with disposal 2 (restore background) — the
    # COMPOSITED frames still show the stamps, but what each later frame
    # inherits differs by disposal.
    frames = np.stack([a.reshape(-1), b.reshape(-1), c.reshape(-1)])
    buf = encode_gif_animation(
        frames, w, h,
        rects=[(0, 0, w, h), (1, 1, 2, 2), (3, 3, 2, 2)],
        disposals=[1, 3, 2],
    )
    raw, _, _, n = decode_gif_frames(buf)
    got = np.frombuffer(raw, np.uint8).reshape(n, h, w, 3)
    f1 = a.copy(); f1[1:3, 1:3] = 90
    assert np.array_equal(got[1], f1)
    # disposal 3 after frame 1: the 2x2 stamp is reverted before frame 2
    f2 = a.copy(); f2[3:5, 3:5] = 130
    assert np.array_equal(got[2], f2)


def test_decode_first_frame_only_matches_frames0():
    w, h = 12, 10
    px0, _, _ = _palette_image(w, h, 30)
    px1, _, _ = _palette_image(w, h, 30)
    buf = encode_gif_animation(np.stack([px0, px1]), w, h)
    first, _, _ = decode_gif(buf)
    raw, _, _, _ = decode_gif_frames(buf)
    assert np.array_equal(first, np.frombuffer(raw, np.uint8)[: w * h * 3])
    assert np.array_equal(first, px0)


# --------------------------------------------------------------------------
# errors
# --------------------------------------------------------------------------


def test_corruption_errors():
    px, pal, idx = _palette_image(8, 8, 4)
    good = _uncompressed_gif(idx, pal, 8, 8)
    with pytest.raises(GifError):
        decode_gif(b"NOTAGIF" + good[7:])
    with pytest.raises(GifError):
        decode_gif(good[:20])  # truncated mid-table
    bad = bytearray(good)
    bad[-2] = 0x7F  # clobber the block terminator chain
    with pytest.raises(GifError):
        decode_gif(bytes(bad))
    with pytest.raises(GifError):
        decode_gif(b"GIF89a" + struct.pack("<HHBBB", 4, 4, 0, 0, 0) + b"\x3b")


def test_rect_outside_screen_rejected():
    px, pal, idx = _palette_image(8, 8, 4)
    buf = bytearray(_uncompressed_gif(idx, pal, 8, 8))
    # shrink the logical screen under the frame rect
    struct.pack_into("<HH", buf, 6, 4, 4)
    with pytest.raises(GifError, match="outside"):
        decode_gif(bytes(buf))


# --------------------------------------------------------------------------
# registry + lane integration
# --------------------------------------------------------------------------


def test_registry_seam():
    assert "gif" in SUPPORTED_FORMATS
    assert PALETTE_FORMATS == ("gif",)
    assert "gif" not in LOSSLESS_FORMATS  # excluded from the mixed rotation
    px, _, _ = _palette_image(16, 16, 50)
    buf = encode(px, 16, 16, "gif")
    assert np.array_equal(decode(buf, 16, 16, "gif"), px)


def test_animated_gif_through_video_lane(spark):
    """An animated GIF row flows through multimodal.sample_frames exactly
    like an AVI — composited frames in rawv order."""
    from datasketches_cpp_spark.operators.multimodal import sample_frames

    w, h, nf = 16, 8, 12
    pal = RNG.integers(0, 256, size=(32, 3), dtype=np.uint8)
    frames = pal[RNG.integers(0, 32, size=(nf, w * h))].reshape(nf, -1)
    buf = encode_gif_animation(frames, w, h)
    df = spark.createDataFrame(
        [("g1", bytearray(buf), w, h, "gif")],
        "video_id string, bytes binary, w int, h int, fmt string",
    )
    out = sample_frames(df, every_k=5).toPandas().sort_values("frame_idx")
    assert list(out["frame_idx"]) == [0, 5, 10]
    for _, row in out.iterrows():
        assert np.array_equal(
            np.frombuffer(row["bytes"], np.uint8),
            frames[row["frame_idx"]],
        )
