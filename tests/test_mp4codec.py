"""MP4/ISO-BMFF container codec tests (operators/mp4codec.py).

Round-trips its own fixture twin ('raw ' bit-exact, 'jpeg' within the
repo's 40 dB PSNR gate), checks the fail-fast seams, and checks the
video lane's to_rawv dispatch."""

import numpy as np
import pytest

from datasketches_cpp_spark.operators.mp4codec import (
    Mp4Error,
    decode_mp4,
    encode_mp4,
)


def _rawv(seed: int, n: int, w: int, h: int) -> bytes:
    g = np.random.default_rng(seed)
    # blocky frames so JPEG stays comfortably above the PSNR gate
    base = g.integers(0, 256, (n, h // 4, w // 4, 3), dtype=np.uint8)
    return np.repeat(np.repeat(base, 4, axis=1), 4, axis=2).tobytes()


def test_raw_roundtrip_bit_exact():
    w, h, n = 24, 16, 5
    rawv = _rawv(1, n, w, h)
    buf = encode_mp4(rawv, w, h, n, codec="raw")
    out, ow, oh, on = decode_mp4(buf)
    assert (ow, oh, on) == (w, h, n)
    assert out == rawv


def test_jpeg_roundtrip_psnr():
    w, h, n = 32, 24, 4
    rawv = _rawv(2, n, w, h)
    buf = encode_mp4(rawv, w, h, n, codec="jpeg", quality=97)
    out, ow, oh, on = decode_mp4(buf)
    assert (ow, oh, on) == (w, h, n)
    a = np.frombuffer(rawv, np.uint8).astype(np.float64)
    b = np.frombuffer(out, np.uint8).astype(np.float64)
    mse = np.mean((a - b) ** 2)
    psnr = 10 * np.log10(255.0**2 / max(mse, 1e-12))
    assert psnr >= 40.0, psnr


def test_rejects_garbage_and_truncation():
    with pytest.raises(Mp4Error):
        decode_mp4(b"\x00" * 8)
    w, h, n = 16, 16, 3
    buf = encode_mp4(_rawv(3, n, w, h), w, h, n, codec="raw")
    with pytest.raises(Mp4Error):
        decode_mp4(buf[: len(buf) // 2])  # moov is at the end
    # corrupt stco so samples point past EOF
    import struct

    idx = buf.rindex(b"stco")
    bad = bytearray(buf)
    struct.pack_into(">I", bad, idx + 4 + 8, 2**31)
    with pytest.raises(Mp4Error):
        decode_mp4(bytes(bad))


def test_unsupported_codec_is_named_seam():
    w, h, n = 16, 16, 2
    buf = encode_mp4(_rawv(4, n, w, h), w, h, n, codec="raw")
    bad = bytearray(buf)
    idx = bad.rindex(b"raw ")  # the stsd sample-entry fourcc
    bad[idx : idx + 4] = b"avc1"
    with pytest.raises(Mp4Error, match="avc1"):
        decode_mp4(bytes(bad))


def test_rawv_size_mismatch():
    with pytest.raises(Mp4Error):
        encode_mp4(b"\x00" * 10, 16, 16, 2, codec="raw")


def test_to_rawv_dispatch():
    from datasketches_cpp_spark.operators.avicodec import to_rawv

    w, h, n = 16, 12, 3
    rawv = _rawv(5, n, w, h)
    for codec in ("raw", "jpeg"):
        buf = encode_mp4(rawv, w, h, n, codec=codec)
        out, ow, oh = to_rawv(buf, "mp4")
        assert (ow, oh) == (w, h)
        assert len(out) == len(rawv)
    out, ow, oh = to_rawv(encode_mp4(rawv, w, h, n, codec="raw"), "mov")
    assert out == rawv


def test_largesize_mdat_parses():
    """A 64-bit largesize mdat (size==1 + 8-byte size) must parse."""
    import struct

    w, h, n = 16, 16, 2
    rawv = _rawv(6, n, w, h)
    buf = encode_mp4(rawv, w, h, n, codec="raw")
    idx = buf.index(b"mdat") - 4
    (sz,) = struct.unpack_from(">I", buf, idx)
    body = buf[idx + 8 : idx + sz]
    wide = struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", 16 + len(body)) + body
    # mdat grew by 8 bytes; every sample offset in stco shifts by +8
    rest = bytearray(buf[idx + sz :])
    sidx = rest.index(b"stco")
    (off,) = struct.unpack_from(">I", rest, sidx + 4 + 8)
    struct.pack_into(">I", rest, sidx + 4 + 8, off + 8)
    out, ow, oh, on = decode_mp4(buf[:idx] + wide + bytes(rest))
    assert (ow, oh, on) == (w, h, n)
    assert out == rawv
