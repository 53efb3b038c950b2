"""Content-box (crop/letterbox-invariant) pHash
(sigkernel.content_boxes + phash64_box_batch,
imagededup.with_content_phash / dedup_images(crop_invariant=True)).

Laws pinned here:
  * full-frame box ≡ the corpus pHash bit-for-bit (integer-exact
    integral-image path) for w, h multiples of 8;
  * a letterboxed / pillarboxed / pad-all-around copy's content hash
    equals the original's exactly (bars trimmed, same pixels hashed);
  * the plain stored pHash of a padded copy is FAR from the original
    (the very gap the flag closes — the pipeline contrast test);
  * autocrop never cuts uniform regions INSIDE content (trim is
    contiguous from the edges) and degenerates safely (all-uniform or
    sub-8×8 trim → full frame).
"""

import numpy as np

from datasketches_cpp_spark.operators.imagededup import (
    dedup_images,
    with_content_phash,
)
from datasketches_cpp_spark.operators.sigkernel import (
    SigConfig,
    content_boxes,
    gray_sum_batch,
    hamming64,
    phash64_box_batch,
)
from datasketches_cpp_spark.sources.images import phash64, phash64_batch

W = H = 64


def _img(seed):
    rng = np.random.default_rng(seed)
    # random blocks upsampled: block means far from the median tie, so
    # the hash is stable under ±2 pixel noise
    small = rng.integers(0, 256, (8, 8, 3), np.uint8)
    return np.repeat(np.repeat(small, H // 8, axis=0), W // 8, axis=1)


def _letterbox(px, top, bottom, color=17):
    h, w = px.shape[0], px.shape[1]
    out = np.full((h + top + bottom, w, 3), color, np.uint8)
    out[top : top + h] = px
    return out


def _pad_all(px, m, color=203):
    h, w = px.shape[0], px.shape[1]
    out = np.full((h + 2 * m, w + 2 * m, 3), color, np.uint8)
    out[m : m + h, m : m + w] = px
    return out


def test_full_box_matches_corpus_phash_bit_for_bit():
    rng = np.random.default_rng(11)
    for w, h in [(64, 64), (32, 32), (48, 32)]:
        px = rng.integers(0, 256, (20, 3 * w * h), np.uint8)
        gray = gray_sum_batch(px, w, h)
        boxes = np.tile([0, h, 0, w], (20, 1))
        assert (phash64_box_batch(gray, boxes) == phash64_batch(px, w, h)).all()


def test_boxes_trim_letterbox_pillarbox_and_pad():
    px = np.stack([_img(s) for s in range(4)])
    lb = np.stack([_letterbox(p, 16, 16) for p in px])  # 96×64
    g = gray_sum_batch(lb.reshape(4, -1), 64, 96)
    assert (content_boxes(g) == np.array([16, 80, 0, 64])).all()
    pa = np.stack([_pad_all(p, 12) for p in px])  # 88×88
    g2 = gray_sum_batch(pa.reshape(4, -1), 88, 88)
    assert (content_boxes(g2) == np.array([12, 76, 12, 76])).all()
    # asymmetric bars, different color per edge pair
    asym = np.full((4, 64 + 8 + 24, 64, 3), 0, np.uint8)
    asym[:, 8:72] = px
    asym[:, 72:] = 255
    g3 = gray_sum_batch(asym.reshape(4, -1), 64, 96)
    assert (content_boxes(g3) == np.array([8, 72, 0, 64])).all()


def test_content_hash_equals_original_exactly():
    for s in range(6):
        px = _img(s)
        orig = phash64(px.reshape(-1), W, H)
        for variant in (
            _letterbox(px, 16, 16),
            _letterbox(px, 4, 28),
            _pad_all(px, 12),
        ):
            h, w = variant.shape[0], variant.shape[1]
            g = gray_sum_batch(
                np.ascontiguousarray(variant).reshape(1, -1), w, h
            )
            ph = phash64_box_batch(g, content_boxes(g))[0]
            assert ph == orig
            # and the plain hash is far away — the gap being closed
            plain = phash64(np.ascontiguousarray(variant).reshape(-1), w, h)
            assert hamming64(
                np.array([plain], np.uint64), np.array([orig], np.uint64)
            )[0] > 12


def test_interior_uniform_region_never_cut():
    px = _img(9).copy()
    px[24:40, :, :] = 180  # solid band INSIDE the content
    g = gray_sum_batch(px.reshape(1, -1), W, H)
    assert (content_boxes(g)[0] == np.array([0, H, 0, W])).all()


def test_degenerate_boxes_fall_back_to_full_frame():
    uni = np.full((2, 3 * 32 * 32), 9, np.uint8)
    g = gray_sum_batch(uni, 32, 32)
    assert (content_boxes(g) == np.array([0, 32, 0, 32])).all()
    # content thinner than 8 px → full frame, not a degenerate box
    thin = np.full((1, 40, 32, 3), 5, np.uint8)
    thin[:, 18:22, :, :] = 250
    g2 = gray_sum_batch(thin.reshape(1, -1), 32, 40)
    assert (content_boxes(g2)[0] == np.array([0, 40, 0, 32])).all()


def test_padded_twins_cluster_in_pipeline(spark):
    """Planted corpus: originals + letterboxed/padded noisy copies.
    crop_invariant=True must cluster every copy with its original; False
    must miss them (plain pHash ~30 bits away)."""
    rows, truth = [], {}
    rng = np.random.default_rng(55)
    for i in range(12):
        px = _img(300 + i)
        iid = f"orig{i:02d}"
        rows.append((iid, bytearray(px.tobytes()), W, H, "raw",
                     f"caption original {i}",
                     int(np.int64(np.uint64(phash64(px.reshape(-1), W, H))))))
        truth[iid] = iid
        noisy = np.clip(
            px.astype(np.int16) + rng.integers(-1, 2, px.shape), 0, 255
        ).astype(np.uint8)
        t = (
            _letterbox(noisy, 16, 16)
            if i % 2
            else _pad_all(noisy, 12, color=40 + i)
        )
        t = np.ascontiguousarray(t)
        h2, w2 = t.shape[0], t.shape[1]
        tid = f"pad{i:02d}"
        rows.append((tid, bytearray(t.tobytes()), w2, h2, "raw",
                     f"caption padded {i}",
                     int(np.int64(np.uint64(phash64(t.reshape(-1), w2, h2))))))
        truth[tid] = iid
    images = spark.createDataFrame(
        rows,
        "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash long",
    )
    cfg = SigConfig(phash_hamming=6)

    res = dedup_images(images, cfg, enable_lanes=("phash",),
                       crop_invariant=True)
    got = {r["id"]: r["cluster_id"] for r in res["assignments"].collect()}
    for i in range(12):
        assert got[f"pad{i:02d}"] == got[f"orig{i:02d}"], i

    res_off = dedup_images(images, cfg, enable_lanes=("phash",))
    got_off = {r["id"]: r["cluster_id"] for r in res_off["assignments"].collect()}
    missed = sum(
        got_off[f"pad{i:02d}"] != got_off[f"orig{i:02d}"] for i in range(12)
    )
    assert missed > 6


def test_with_content_phash_spark_and_codec_path(spark):
    """The projection decodes through the codec layer: a PNG-encoded
    letterboxed copy and its raw original produce the same content hash."""
    from datasketches_cpp_spark.operators.imagecodec import encode

    px = _img(4)
    lb = np.ascontiguousarray(_letterbox(px, 16, 16))
    rows = [
        ("a", bytearray(px.tobytes()), W, H, "raw", "c a",
         int(np.int64(np.uint64(phash64(px.reshape(-1), W, H))))),
        ("b", bytearray(encode(lb.reshape(-1), 64, 96, "png")), 64, 96,
         "png", "c b",
         int(np.int64(np.uint64(phash64(lb.reshape(-1), 64, 96))))),
    ]
    df = spark.createDataFrame(
        rows,
        "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash long",
    )
    out = {r["image_id"]: r["phash"] for r in with_content_phash(df).collect()}
    assert out["a"] == out["b"]


def test_crop_composes_with_rotation(spark):
    """A rotated AND padded copy clusters with its original when both
    flags are on: the content box rotates with the image, so the D4
    orbit of the content hash contains the original's hash."""
    rows = []
    for i in range(6):
        px = _img(500 + i)
        rows.append((f"o{i}", bytearray(px.tobytes()), W, H, "raw",
                     f"cap o {i}",
                     int(np.int64(np.uint64(phash64(px.reshape(-1), W, H))))))
        t = np.ascontiguousarray(_pad_all(np.rot90(px, 1, axes=(0, 1)), 12))
        h2, w2 = t.shape[0], t.shape[1]
        rows.append((f"t{i}", bytearray(t.tobytes()), w2, h2, "raw",
                     f"cap t {i}",
                     int(np.int64(np.uint64(phash64(t.reshape(-1), w2, h2))))))
    images = spark.createDataFrame(
        rows,
        "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash long",
    )
    res = dedup_images(
        images, SigConfig(phash_hamming=6), enable_lanes=("phash",),
        crop_invariant=True, rotation_invariant=True,
    )
    got = {r["id"]: r["cluster_id"] for r in res["assignments"].collect()}
    for i in range(6):
        assert got[f"t{i}"] == got[f"o{i}"], i
