"""Baseline JPEG codec (operators/jpegcodec.py, ITU-T T.81): round-trip
PSNR floors, 4:2:0 + restart intervals, grayscale, a hand-built
spec-derived minimal stream (independent of our encoder), fail-fast
seams, and flow through the image/pHash lanes."""

import struct

import numpy as np
import pytest

from datasketches_cpp_spark.operators.imagecodec import (
    ImageCodecError,
    decode,
    encode,
)
from datasketches_cpp_spark.operators.jpegcodec import (
    _AC_LUMA_BITS,
    _AC_LUMA_VALS,
    _DC_LUMA_BITS,
    _DC_LUMA_VALS,
    _QT_LUMA,
    _ZIGZAG,
    decode_jpeg,
    encode_jpeg,
)


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def _structured(h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    px = np.zeros((h, w, 3), np.uint8)
    px[:, :, 0] = (xx * 255 // max(w - 1, 1)).astype(np.uint8)
    px[:, :, 1] = (yy * 255 // max(h - 1, 1)).astype(np.uint8)
    px[:, :, 2] = ((xx // 8 + yy // 8) % 2 * 180 + rng.integers(0, 40, (h, w))).astype(
        np.uint8
    )
    return px


@pytest.mark.parametrize("h,w", [(48, 64), (17, 23), (8, 8), (9, 13)])
def test_jpeg_roundtrip_psnr_and_dims(h, w):
    # registry quality (99) must clear the 40 dB gate even on this
    # deliberately hostile image (hard checker edges + per-pixel noise);
    # q=95 stays within a few dB of it
    px = _structured(h, w, seed=h * 100 + w)
    buf = encode(px, w, h, "jpg")
    back, dw, dh = decode_jpeg(buf)
    assert (dw, dh) == (w, h)
    assert _psnr(px.reshape(-1), back) >= 40.0
    buf95 = encode_jpeg(px, w, h, quality=95)
    back95, _, _ = decode_jpeg(buf95)
    assert _psnr(px.reshape(-1), back95) >= 35.0


def test_jpeg_registry_default_clears_corpus_gate():
    """fmt='jpg' through the imagecodec registry (quality 99) holds the F1
    lossy contract: PSNR >= 40 dB on corpus-like pixels, including noise
    textures (the worst case for a transform codec)."""
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)  # pure noise
    buf = encode(px, 48, 32, "jpg")
    back = decode(buf, 48, 32, "jpg")
    assert _psnr(px.reshape(-1), back) >= 40.0
    assert buf[:2] == b"\xff\xd8" and buf[-2:] == b"\xff\xd9"


def test_jpeg_subsampled_and_restart_markers():
    px = _structured(40, 56, seed=9)
    buf = encode_jpeg(px, 56, 40, quality=95, subsample=True, restart_interval=2)
    assert b"\xff\xdd" in buf  # DRI present
    assert any(bytes([0xFF, 0xD0 + i]) in buf for i in range(8))  # RSTn
    back, dw, dh = decode_jpeg(buf)
    assert (dw, dh) == (56, 40)
    # chroma is halved: luma still dominates PSNR on a smooth-ish image
    assert _psnr(px.reshape(-1), back) >= 30.0
    # same stream WITHOUT restart handling must equal the unrestarted one
    plain = encode_jpeg(px, 56, 40, quality=95, subsample=True)
    back2, _, _ = decode_jpeg(plain)
    assert np.array_equal(back, back2)  # restarts change framing, not pixels


def test_jpeg_quality_monotone():
    px = _structured(32, 32, seed=4)
    psnrs = [
        _psnr(px.reshape(-1), decode_jpeg(encode_jpeg(px, 32, 32, quality=q))[0])
        for q in (95, 75, 40)
    ]
    assert psnrs[0] >= psnrs[1] >= psnrs[2]


def test_handbuilt_minimal_jpeg_decodes():
    """A single-MCU grayscale JPEG assembled byte-by-byte from the T.81
    spec (Annex B segment layout, Annex K tables) — fully independent of
    our encoder. Flat luma 130: DC coefficient 8*(130-128)=16 quantized
    by Q[0]=16 -> 1, i.e. DC category 1 with magnitude bit 1, all AC zero
    -> EOB. Decoded block must be exactly 130 everywhere."""
    qt = _QT_LUMA[_ZIGZAG].astype(np.uint8).tobytes()
    dht_dc = bytes([0x00]) + bytes(_DC_LUMA_BITS) + bytes(_DC_LUMA_VALS)
    dht_ac = bytes([0x10]) + bytes(_AC_LUMA_BITS) + bytes(_AC_LUMA_VALS)
    # entropy: DC size=1 -> canonical luma-DC code '010'; magnitude bit '1';
    # EOB (0x00) -> luma-AC code '1010' => 0101 1010 = 0x5A, no padding
    entropy = bytes([0b01011010])
    buf = (
        b"\xff\xd8"
        + b"\xff\xdb" + struct.pack(">H", 2 + 65) + b"\x00" + qt
        + b"\xff\xc0" + struct.pack(">HBHHB", 2 + 6 + 3, 8, 8, 8, 1)
        + bytes([1, 0x11, 0])
        + b"\xff\xc4" + struct.pack(">H", 2 + len(dht_dc)) + dht_dc
        + b"\xff\xc4" + struct.pack(">H", 2 + len(dht_ac)) + dht_ac
        + b"\xff\xda" + struct.pack(">HB", 2 + 1 + 2 + 3, 1) + bytes([1, 0x00])
        + bytes([0, 63, 0])
        + entropy
        + b"\xff\xd9"
    )
    px, w, h = decode_jpeg(buf)
    assert (w, h) == (8, 8)
    assert px.shape == (8 * 8 * 3,)
    assert set(px.tolist()) == {130}


def test_progressive_matches_sequential_exactly():
    """SOF2 progressive decode: same quantized coefficients as the
    sequential encoder, so fully-decoded pixels must be IDENTICAL to the
    baseline path — across subsampling, odd dims, and qualities."""
    from datasketches_cpp_spark.operators.jpegcodec import (
        encode_jpeg_progressive,
    )

    for (w, h, sub, q, seed) in [
        (16, 16, False, 90, 1),
        (24, 17, False, 75, 2),
        (33, 29, True, 85, 3),
        (64, 48, True, 50, 5),
        (7, 5, False, 60, 8),
    ]:
        px = _structured(h, w, seed=seed)
        seq, _, _ = decode_jpeg(encode_jpeg(px, w, h, quality=q, subsample=sub))
        pro, _, _ = decode_jpeg(
            encode_jpeg_progressive(px, w, h, quality=q, subsample=sub)
        )
        assert np.array_equal(seq, pro), (w, h, sub, q)
    # noise content stresses EOB runs + correction bits hardest
    rng = np.random.default_rng(99)
    px = rng.integers(0, 255, (32, 31, 3), dtype=np.uint8)
    seq, _, _ = decode_jpeg(encode_jpeg(px, 31, 32, quality=80))
    pro, _, _ = decode_jpeg(encode_jpeg_progressive(px, 31, 32, quality=80))
    assert np.array_equal(seq, pro)


def test_progressive_partial_scans_refine_monotonically():
    """Cutting a progressive stream after k scans still decodes; PSNR is
    non-decreasing in k and the full stream equals the sequential-path
    pixels — the actual point of progressive encoding."""
    from datasketches_cpp_spark.operators.jpegcodec import (
        encode_jpeg_progressive,
    )

    px = _structured(48, 64, seed=5)
    pro = encode_jpeg_progressive(px, 64, 48, quality=90)
    # entropy stuffing guarantees FFDA appears only as a real SOS marker
    sos = []
    i = 0
    while True:
        i = pro.find(b"\xff\xda", i)
        if i < 0:
            break
        sos.append(i)
        i += 2
    assert len(sos) == 8  # 2 DC scans + 3 AC first + 3 AC refine
    ref = np.asarray(px, np.uint8).reshape(-1).astype(np.float64)
    prev = -1.0
    for k in range(1, len(sos) + 1):
        cut = pro[: sos[k]] + b"\xff\xd9" if k < len(sos) else pro
        part, w, h = decode_jpeg(cut)
        assert (w, h) == (64, 48)
        mse = ((part.astype(np.float64) - ref) ** 2).mean()
        psnr = 200.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)
        assert psnr >= prev - 1e-9, (k, psnr, prev)
        prev = psnr
    full, _, _ = decode_jpeg(pro)
    assert np.array_equal(full, part)


def test_jpeg_failfast_seams():
    with pytest.raises(ImageCodecError, match="SOI"):
        decode_jpeg(b"nope")
    px = _structured(16, 16)
    good = encode_jpeg(px, 16, 16)
    # flip SOF0 -> SOF9 (arithmetic coding): must name the seam
    bad = good.replace(b"\xff\xc0", b"\xff\xc9", 1)
    with pytest.raises(ImageCodecError, match="arithmetic|SOF"):
        decode_jpeg(bad)
    # a sequential stream mislabeled SOF2 is not valid progressive: its
    # scan header (Ss=0, Se=63) is neither a DC nor an AC band
    with pytest.raises(ImageCodecError, match="DC scan"):
        decode_jpeg(good.replace(b"\xff\xc0", b"\xff\xc2", 1))
    with pytest.raises(ImageCodecError):
        decode_jpeg(good[: len(good) // 2])  # truncated mid-stream
    with pytest.raises(ImageCodecError, match="quality"):
        encode_jpeg(px, 16, 16, quality=0)
    with pytest.raises(ImageCodecError, match="metadata"):
        decode(good, 17, 16, "jpg")


def test_jpeg_flows_through_image_lanes(spark):
    """fmt='jpg' rows flow through the Spark-side decode/feature path like
    every other format (the VERDICT round-3 seam, now closed)."""
    from datasketches_cpp_spark.operators.multimodal import decode_stats

    px = _structured(24, 24, seed=11)
    rows = [
        ("j1", bytearray(encode(px, 24, 24, "jpg")), 24, 24, "jpg"),
        ("r1", bytearray(px.reshape(-1).tobytes()), 24, 24, "raw"),
    ]
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string"
    )
    got = {r["id"]: r for r in decode_stats(df).collect()}
    assert got["j1"]["n_pixels"] == got["r1"]["n_pixels"] == 24 * 24 * 3
    # lossy but gate-held: mean within a quantization step of the raw twin
    assert abs(got["j1"]["px_mean"] - got["r1"]["px_mean"]) < 2.0


def test_grayscale_scan_with_sampling_factors_is_noninterleaved():
    """T.81 A.2.2 regression: a single-component scan is NON-interleaved
    raster order even when the frame declares 2x2 sampling factors (some
    encoders keep luma factors when stripping chroma). A 32x16 grayscale
    stream of eight flat DC-only blocks (d=1..8, each '010'+'1' then EOB
    -> one 0x5A byte per block) must decode with blocks laid out in
    raster order — the interleaved-MCU reading would swap the top-right
    and bottom-left block pairs."""
    qt = _QT_LUMA[_ZIGZAG].astype(np.uint8).tobytes()
    dht_dc = bytes([0x00]) + bytes(_DC_LUMA_BITS) + bytes(_DC_LUMA_VALS)
    dht_ac = bytes([0x10]) + bytes(_AC_LUMA_BITS) + bytes(_AC_LUMA_VALS)
    entropy = bytes([0b01011010] * 8)
    buf = (
        b"\xff\xd8"
        + b"\xff\xdb" + struct.pack(">H", 2 + 65) + b"\x00" + qt
        + b"\xff\xc0" + struct.pack(">HBHHB", 2 + 6 + 3, 8, 16, 32, 1)
        + bytes([1, 0x22, 0])  # 2x2 factors on the only component
        + b"\xff\xc4" + struct.pack(">H", 2 + len(dht_dc)) + dht_dc
        + b"\xff\xc4" + struct.pack(">H", 2 + len(dht_ac)) + dht_ac
        + b"\xff\xda" + struct.pack(">HB", 2 + 1 + 2 + 3, 1) + bytes([1, 0x00])
        + bytes([0, 63, 0])
        + entropy
        + b"\xff\xd9"
    )
    px, w, h = decode_jpeg(buf)
    assert (w, h) == (32, 16)
    img = np.asarray(px, np.uint8).reshape(16, 32, 3)
    # DC d at raster block k: pixel value 128 + 2*(k+1)
    for by in range(2):
        for bx in range(4):
            k = by * 4 + bx
            blk = img[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8]
            assert set(blk.reshape(-1).tolist()) == {128 + 2 * (k + 1)}, (by, bx)
