"""Multi-lane fusion policies (imagededup.dedup_images edge_policy).

"any" (default) ORs lane edges — recall-first. edge_policy=2 / "all"
requires a pair to be confirmed by ≥ k distinct lanes — the curation
precision question "same image AND same caption". Planted contrast
corpus: true dups (noisy image copy + identical caption) must merge
under both policies; recaptioned copies (same image, new caption) and
caption twins (same caption, different image) merge under "any" but
stay distinct under 2/"all".
"""

import numpy as np

from datasketches_cpp_spark.operators.imagededup import dedup_images
from datasketches_cpp_spark.operators.sigkernel import SigConfig
from datasketches_cpp_spark.sources.images import phash64

W = H = 64


def _img(seed):
    small = np.random.default_rng(seed).integers(0, 256, (8, 8, 3), np.uint8)
    return np.repeat(np.repeat(small, 8, axis=0), 8, axis=1)


def _noisy(px, rng):
    return np.clip(
        px.astype(np.int16) + rng.integers(-1, 2, px.shape), 0, 255
    ).astype(np.uint8)


def _caption(seed, n=12):
    r = np.random.default_rng(seed)
    return " ".join(f"tok{v:05d}" for v in r.integers(0, 9000, n))


def _row(iid, px, caption):
    flat = np.ascontiguousarray(px).reshape(-1)
    return (iid, bytearray(flat.tobytes()), W, H, "raw", caption,
            int(np.int64(np.uint64(phash64(flat, W, H)))))


def _corpus():
    rng = np.random.default_rng(4242)
    rows = []
    true_pairs, phash_only, caption_only = [], [], []
    for i in range(8):
        px, cap = _img(2000 + i), _caption(3000 + i)
        a, b = f"td_a{i:02d}", f"td_b{i:02d}"
        rows.append(_row(a, px, cap))
        rows.append(_row(b, _noisy(px, rng), cap))  # same image + caption
        true_pairs.append((a, b))
    for i in range(8):
        px = _img(2100 + i)
        a, b = f"rc_a{i:02d}", f"rc_b{i:02d}"
        rows.append(_row(a, px, _caption(3100 + i)))
        rows.append(_row(b, _noisy(px, rng), _caption(3200 + i)))  # recaption
        phash_only.append((a, b))
    for i in range(8):
        cap = _caption(3300 + i)
        a, b = f"ct_a{i:02d}", f"ct_b{i:02d}"
        rows.append(_row(a, _img(2200 + i), cap))
        rows.append(_row(b, _img(2300 + i), cap))  # same caption, new image
        caption_only.append((a, b))
    return rows, true_pairs, phash_only, caption_only


def _assign(spark, rows, policy):
    images = spark.createDataFrame(
        rows,
        "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash long",
    )
    res = dedup_images(
        images, SigConfig(phash_hamming=6),
        enable_lanes=("caption", "phash"), edge_policy=policy,
    )
    return {r["id"]: r["cluster_id"] for r in res["assignments"].collect()}


def test_any_policy_merges_all_three_kinds(spark):
    rows, true_pairs, phash_only, caption_only = _corpus()
    got = _assign(spark, rows, "any")
    for a, b in true_pairs + phash_only + caption_only:
        assert got[a] == got[b], (a, b)


def test_two_lane_policy_keeps_single_lane_pairs_distinct(spark):
    rows, true_pairs, phash_only, caption_only = _corpus()
    got = _assign(spark, rows, 2)
    for a, b in true_pairs:
        assert got[a] == got[b], (a, b)
    for a, b in phash_only + caption_only:
        assert got[a] != got[b], (a, b)


def test_all_equals_lane_count(spark):
    rows, true_pairs, phash_only, caption_only = _corpus()
    got = _assign(spark, rows, "all")
    merged = sum(got[a] == got[b] for a, b in true_pairs)
    kept = sum(got[a] != got[b] for a, b in phash_only + caption_only)
    assert merged == 8 and kept == 16
