"""Kernel-level pins for the recompression/watermark robustness planted
oracles (__spark_entry__._planted_jpeg_rows / _planted_watermark_rows):

  * JPEG quality-75 re-encode is GENUINELY lossy on the planted content
    (PSNR < 35 dB — not a near-lossless pass) yet moves the block-mean
    pHash ≤ 2 bits, inside the lane's verification radius;
  * an 8×8 block-aligned bright logo moves the pHash ≤ 2 bits (one
    cell of the 8×8 block grid plus median wobble);
  * both stay within SigConfig().phash_hamming-style radii so the
    standard lane clusters them — the full-lane behavior is pinned by
    the hash-checked driver queries jpeg_recompress_dedup_planted /
    watermarked_dedup_planted.
"""

import numpy as np

from datasketches_cpp_spark.operators.sigkernel import hamming64


def test_planted_jpeg_rows_are_lossy_but_phash_stable():
    import __spark_entry__ as e
    from datasketches_cpp_spark.operators.jpegcodec import decode_jpeg
    from datasketches_cpp_spark.sources.images import phash64

    rows, truth = e._planted_jpeg_rows()
    by_id = {r[0]: r for r in rows}
    checked = 0
    for tid, oid in truth.items():
        if tid == oid:
            continue
        orig = by_id[oid]
        re = by_id[tid]
        assert re[4] == "jpg"
        dec, w, h = decode_jpeg(bytes(re[1]))
        ref = np.frombuffer(bytes(orig[1]), np.uint8).astype(np.float64)
        # the re-encode started from the original's pixels (pre-noise is
        # part of the original here), so PSNR vs the original bounds loss
        mse = ((dec.astype(np.float64) - ref) ** 2).mean()
        psnr = 10 * np.log10(255.0**2 / max(mse, 1e-9))
        assert psnr < 35.0, "re-encode must be genuinely lossy"
        assert psnr > 20.0, "but not destroyed"
        ph_dec = phash64(dec.reshape(-1), w, h)
        d = hamming64(
            np.array([np.uint64(np.int64(orig[6]))]),
            np.array([np.uint64(ph_dec)]),
        )[0]
        assert d <= 2, (tid, int(d))
        # stored phash is the post-decode truth
        assert np.uint64(np.int64(re[6])) == np.uint64(ph_dec)
        checked += 1
    assert checked == 12


def test_planted_watermark_rows_within_radius():
    import __spark_entry__ as e

    rows, truth = e._planted_watermark_rows()
    ph = {r[0]: np.uint64(np.int64(r[6])) for r in rows}
    checked = 0
    for tid, oid in truth.items():
        if tid == oid:
            continue
        d = hamming64(np.array([ph[tid]]), np.array([ph[oid]]))[0]
        assert d <= 2, (tid, int(d))
        assert tid > oid  # original stays the canonical (min) cluster id
        checked += 1
    assert checked == 12
