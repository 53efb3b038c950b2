"""TIFF 6.0 baseline codec tests — round-trips over every compression
mode, hand-built foreign fixtures (big-endian, grayscale, palette,
planar, PackBits edge packets), LZW width-boundary coverage, and the
registry integration (lossless rotation, metadata cross-check)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from datasketches_cpp_spark.operators import imagecodec
from datasketches_cpp_spark.operators.tiffcodec import (
    TiffError,
    _lzw_decode,
    _lzw_encode,
    _packbits_decode,
    _packbits_encode,
    decode_tiff,
    encode_tiff,
)


def _rand_rgb(w, h, seed):
    return np.random.default_rng(seed).integers(
        0, 256, size=h * w * 3, dtype=np.int64
    ).astype(np.uint8)


# --------------------------------------------------------------------------
# encoder/decoder round-trips


@pytest.mark.parametrize("compression", ["none", "lzw", "deflate", "packbits"])
@pytest.mark.parametrize("w,h", [(1, 1), (7, 3), (64, 48), (129, 65)])
def test_roundtrip_all_modes(compression, w, h):
    px = _rand_rgb(w, h, seed=w * 1000 + h)
    buf = encode_tiff(px, w, h, compression=compression)
    back, dw, dh = decode_tiff(buf)
    assert (dw, dh) == (w, h)
    assert np.array_equal(back, px), compression


def test_roundtrip_smooth_gradient():
    """Smooth data exercises the predictor's small-diff path and long
    PackBits repeat runs."""
    w, h = 200, 120
    x = np.linspace(0, 255, w, dtype=np.float64)
    y = np.linspace(0, 255, h, dtype=np.float64)
    px = np.stack(
        [
            np.add.outer(y * 0, x),
            np.add.outer(y, x * 0),
            np.add.outer(y, x) / 2,
        ],
        axis=-1,
    ).astype(np.uint8).reshape(-1)
    for compression in ("none", "lzw", "deflate", "packbits"):
        back, dw, dh = decode_tiff(encode_tiff(px, w, h, compression))
        assert np.array_equal(back, px), compression
    # the predictor should make LZW beat uncompressed on smooth data
    assert len(encode_tiff(px, w, h, "lzw")) < len(encode_tiff(px, w, h, "none"))


def test_roundtrip_multistrip():
    """Wide rows force rows_per_strip small -> many strips."""
    w, h = 1024, 37  # 3072 B/row -> rps=2 -> 19 strips
    px = _rand_rgb(w, h, seed=9)
    buf = encode_tiff(px, w, h, compression="lzw")
    back, dw, dh = decode_tiff(buf)
    assert np.array_equal(back, px)


def test_lzw_width_boundaries_and_clear():
    """Noise long enough to push the LZW table through the 9->10->11->12
    bit widenings AND the 4093-entry CLEAR, on both sides."""
    rng = np.random.default_rng(3)
    data = rng.integers(0, 256, size=60_000, dtype=np.int64).astype(np.uint8)
    raw = data.tobytes()
    enc = _lzw_encode(raw)
    assert _lzw_decode(enc, len(raw)) == raw


def test_lzw_repetitive_stream():
    raw = (b"abcabcabd" * 3000) + b"tail"
    enc = _lzw_encode(raw)
    assert len(enc) < len(raw) // 3
    assert _lzw_decode(enc, len(raw)) == raw


def test_packbits_packets():
    # literal, repeat, and the 128 no-op control byte
    assert _packbits_decode(bytes([2, 10, 20, 30]), 3) == bytes([10, 20, 30])
    assert _packbits_decode(bytes([257 - 5, 7]), 5) == bytes([7] * 5)
    assert _packbits_decode(bytes([128, 0, 65]), 1) == b"A"
    for pattern in (b"", b"x", b"xx", b"xxx", b"aaabccc" * 40,
                    bytes(range(256)) * 3, b"q" * 1000):
        assert _packbits_decode(_packbits_encode(pattern), len(pattern)) == pattern


# --------------------------------------------------------------------------
# hand-built foreign fixtures (layouts the encoder never writes)


def _build_tiff(bo, tags, payload, ifd_first=False):
    """Minimal TIFF builder for fixtures: header + payload + IFD."""
    ent = b"".join(
        struct.pack(bo + "HHI", tag, typ, n) + val
        for tag, typ, n, val in sorted(tags)
    )
    if ifd_first:
        ifd_off = 8
        data_off = 8 + 2 + len(ent) + 4
        head = struct.pack(bo + "2sHI", b"II" if bo == "<" else b"MM", 42, ifd_off)
        return (
            head
            + struct.pack(bo + "H", len(tags))
            + ent
            + struct.pack(bo + "I", 0)
            + payload
        ), data_off
    head = struct.pack(bo + "2sHI", b"II" if bo == "<" else b"MM", 42, 8 + len(payload))
    return (
        head
        + payload
        + struct.pack(bo + "H", len(tags))
        + ent
        + struct.pack(bo + "I", 0)
    ), 8


def _short(bo, v):
    return struct.pack(bo + "HH", v, 0)


def _long(bo, v):
    return struct.pack(bo + "I", v)


def test_big_endian_gray_fixture():
    """MM byte order, PhotometricInterpretation 1 (BlackIsZero), spp=1,
    single uncompressed strip."""
    bo = ">"
    w, h = 5, 4
    g = np.arange(w * h, dtype=np.uint8).reshape(h, w) * 12
    payload = g.tobytes()
    tags = [
        (256, 3, 1, _short(bo, w)),
        (257, 3, 1, _short(bo, h)),
        (258, 3, 1, _short(bo, 8)),
        (259, 3, 1, _short(bo, 1)),
        (262, 3, 1, _short(bo, 1)),
        (273, 4, 1, _long(bo, 8)),
        (277, 3, 1, _short(bo, 1)),
        (278, 4, 1, _long(bo, h)),
        (279, 4, 1, _long(bo, len(payload))),
    ]
    buf, _ = _build_tiff(bo, tags, payload)
    px, dw, dh = decode_tiff(buf)
    assert (dw, dh) == (w, h)
    assert np.array_equal(px.reshape(h, w, 3)[..., 0], g)
    assert np.array_equal(px.reshape(h, w, 3)[..., 1], g)


def test_white_is_zero_inverts():
    bo = "<"
    w, h = 3, 1
    g = np.array([0, 100, 255], np.uint8)
    tags = [
        (256, 3, 1, _short(bo, w)),
        (257, 3, 1, _short(bo, h)),
        (258, 3, 1, _short(bo, 8)),
        (259, 3, 1, _short(bo, 1)),
        (262, 3, 1, _short(bo, 0)),  # WhiteIsZero
        (273, 4, 1, _long(bo, 8)),
        (277, 3, 1, _short(bo, 1)),
        (278, 4, 1, _long(bo, h)),
        (279, 4, 1, _long(bo, 3)),
    ]
    buf, _ = _build_tiff(bo, tags, g.tobytes())
    px, _, _ = decode_tiff(buf)
    assert list(px.reshape(3, 3)[:, 0]) == [255, 155, 0]


def test_palette_fixture():
    """Photometric 3 with a 256-entry 16-bit ColorMap."""
    bo = "<"
    w, h = 4, 2
    idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0]], np.uint8)
    # colormap: entry i -> (i*257, (255-i)*257, 0) in 16-bit
    cmap = np.zeros(3 * 256, np.uint16)
    cmap[0:256] = np.arange(256, dtype=np.uint16) * 257
    cmap[256:512] = (255 - np.arange(256, dtype=np.uint16)) * 257
    payload = idx.tobytes() + cmap.astype("<u2").tobytes()
    cmap_off = 8 + idx.size
    tags = [
        (256, 3, 1, _short(bo, w)),
        (257, 3, 1, _short(bo, h)),
        (258, 3, 1, _short(bo, 8)),
        (259, 3, 1, _short(bo, 1)),
        (262, 3, 1, _short(bo, 3)),
        (273, 4, 1, _long(bo, 8)),
        (277, 3, 1, _short(bo, 1)),
        (278, 4, 1, _long(bo, h)),
        (279, 4, 1, _long(bo, idx.size)),
        (320, 3, 3 * 256, _long(bo, cmap_off)),
    ]
    buf, _ = _build_tiff(bo, tags, payload)
    px, _, _ = decode_tiff(buf)
    px = px.reshape(h, w, 3)
    assert px[0, 0].tolist() == [0, 255, 0]
    assert px[0, 3].tolist() == [3, 252, 0]
    assert np.array_equal(px[0], px[1, ::-1])


def test_planar_rgb_fixture():
    """PlanarConfiguration 2: three separate planes, one strip each."""
    bo = "<"
    w, h = 3, 2
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.int64).astype(np.uint8)
    planes = [px[..., c].tobytes() for c in range(3)]
    offs = [8, 8 + w * h, 8 + 2 * w * h]
    payload = b"".join(planes)
    extra_off = 8 + len(payload)
    tags = [
        (256, 3, 1, _short(bo, w)),
        (257, 3, 1, _short(bo, h)),
        (258, 3, 3, _long(bo, extra_off)),
        (259, 3, 1, _short(bo, 1)),
        (262, 3, 1, _short(bo, 2)),
        (273, 4, 3, _long(bo, extra_off + 6)),
        (277, 3, 1, _short(bo, 3)),
        (278, 4, 1, _long(bo, h)),
        (279, 4, 3, _long(bo, extra_off + 6 + 12)),
        (284, 3, 1, _short(bo, 2)),
    ]
    payload += struct.pack("<HHH", 8, 8, 8)
    payload += struct.pack("<3I", *offs)
    payload += struct.pack("<3I", w * h, w * h, w * h)
    buf, _ = _build_tiff(bo, tags, payload)
    out, dw, dh = decode_tiff(buf)
    assert np.array_equal(out.reshape(h, w, 3), px)


def test_rgba_extra_samples_dropped():
    """spp=4 chunky RGBA: alpha dropped, RGB kept (PNG-path parity)."""
    bo = "<"
    w, h = 2, 1
    data = bytes([10, 20, 30, 200, 40, 50, 60, 7])
    tags = [
        (256, 3, 1, _short(bo, w)),
        (257, 3, 1, _short(bo, h)),
        (258, 3, 4, _long(bo, 8 + len(data))),
        (259, 3, 1, _short(bo, 1)),
        (262, 3, 1, _short(bo, 2)),
        (273, 4, 1, _long(bo, 8)),
        (277, 3, 1, _short(bo, 4)),
        (278, 4, 1, _long(bo, h)),
        (279, 4, 1, _long(bo, len(data))),
        (338, 3, 1, _short(bo, 2)),
    ]
    payload = data + struct.pack("<4H", 8, 8, 8, 8)
    buf, _ = _build_tiff(bo, tags, payload)
    px, _, _ = decode_tiff(buf)
    assert px.tolist() == [10, 20, 30, 40, 50, 60]


# --------------------------------------------------------------------------
# fail-fast seams


def test_error_paths():
    px = _rand_rgb(4, 4, 0)
    good = encode_tiff(px, 4, 4)
    with pytest.raises(TiffError):
        decode_tiff(b"XX" + good[2:])
    with pytest.raises(TiffError):
        decode_tiff(good[:2] + struct.pack("<H", 43) + good[4:])
    with pytest.raises(TiffError):
        decode_tiff(good[:40])  # truncated mid-IFD / strips out of range
    with pytest.raises(TiffError):
        encode_tiff(px, 4, 4, compression="ccitt")


def test_tiled_and_deep_reject():
    bo = "<"
    base = [
        (256, 3, 1, _short(bo, 1)),
        (257, 3, 1, _short(bo, 1)),
        (259, 3, 1, _short(bo, 1)),
        (262, 3, 1, _short(bo, 1)),
        (273, 4, 1, _long(bo, 8)),
        (277, 3, 1, _short(bo, 1)),
        (279, 4, 1, _long(bo, 1)),
    ]
    buf, _ = _build_tiff(bo, base + [(322, 4, 1, _long(bo, 16))], b"\x00")
    with pytest.raises(TiffError, match="tiled"):
        decode_tiff(buf)
    buf, _ = _build_tiff(bo, base + [(258, 3, 1, _short(bo, 16))], b"\x00")
    with pytest.raises(TiffError, match="8 bits"):
        decode_tiff(buf)


# --------------------------------------------------------------------------
# registry integration


def test_registry_roundtrip_and_rotation():
    assert "tiff" in imagecodec.SUPPORTED_FORMATS
    assert "tiff" in imagecodec.LOSSLESS_FORMATS
    assert "tif" not in imagecodec.LOSSLESS_FORMATS  # alias not double-counted
    px = _rand_rgb(32, 16, 21)
    for fmt in ("tif", "tiff"):
        buf = imagecodec.encode(px, 32, 16, fmt)
        assert np.array_equal(imagecodec.decode(buf, 32, 16, fmt), px)
    # metadata mismatch fail-fast (shared decode() contract)
    with pytest.raises(imagecodec.ImageCodecError):
        imagecodec.decode(imagecodec.encode(px, 32, 16, "tiff"), 16, 32, "tiff")


def test_lzw_first_code_after_clear_beyond_table_is_typed_error():
    """Corrupt-strip hardening: the first code after CLEAR must be a
    literal; a table-range code there raises TiffError (the typed
    fail-fast contract), never a bare IndexError."""
    from datasketches_cpp_spark.operators.tiffcodec import (
        TiffError,
        _lzw_decode,
    )

    # 9-bit codes, MSB-first: CLEAR (256) then 300 (beyond the reset table)
    bits = "100000000" + format(300, "09b")
    data = int(bits + "0" * (8 - len(bits) % 8), 2).to_bytes(
        (len(bits) + 7) // 8, "big"
    )
    with pytest.raises(TiffError):
        _lzw_decode(data, 8)
