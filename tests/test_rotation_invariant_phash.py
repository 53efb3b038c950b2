"""Dihedral-canonical pHash (sigkernel.phash_dihedral_min +
imagededup.with_canonical_phash / dedup_images(rotation_invariant=True)).

Grid law: the canonical hash of a rotated/mirrored image equals the
original's exactly for noise-free pixels (block means commute with the
D4 transform); with noise the planted rotated twins still cluster.
"""

import numpy as np
import pytest

from datasketches_cpp_spark.operators.imagededup import (
    dedup_images,
    with_canonical_phash,
)
from datasketches_cpp_spark.operators.sigkernel import (
    SigConfig,
    phash_dihedral_min,
)
from datasketches_cpp_spark.sources.images import phash64, phash64_batch

W = H = 64


def _img(seed):
    rng = np.random.default_rng(seed)
    # smooth-ish content: random blocks upsampled, so block means are
    # far from the median tie and the hash is noise-stable
    small = rng.integers(0, 256, (8, 8, 3), np.uint8)
    return np.repeat(np.repeat(small, H // 8, axis=0), W // 8, axis=1)


def _transforms(px):
    for k in range(4):
        r = np.rot90(px, k, axes=(0, 1))
        yield r
        yield r[:, ::-1, :]


def test_canonical_exact_under_all_eight_transforms():
    for seed in range(5):
        px = _img(seed)
        canon = phash_dihedral_min(
            np.array([phash64(px.reshape(-1), W, H)], np.uint64)
        )[0]
        for t in _transforms(px):
            h, w = t.shape[0], t.shape[1]
            ph_t = phash64(np.ascontiguousarray(t).reshape(-1), w, h)
            canon_t = phash_dihedral_min(np.array([ph_t], np.uint64))[0]
            assert canon_t == canon


def test_canonical_is_orbit_minimum_and_idempotent():
    ph = phash64_batch(
        np.stack([_img(s).reshape(-1) for s in range(8)]), W, H
    )
    canon = phash_dihedral_min(ph)
    assert (canon <= ph).all()
    assert np.array_equal(phash_dihedral_min(canon), canon)


def test_distinct_images_stay_distinct():
    ph = phash64_batch(
        np.stack([_img(s).reshape(-1) for s in range(50)]), W, H
    )
    canon = phash_dihedral_min(ph)
    assert len(set(canon.tolist())) == 50


def test_rotated_twins_cluster_in_pipeline(spark):
    """Planted corpus: originals + 90/180/270-rotated and mirrored copies
    (small noise). rotation_invariant=True must cluster every twin with
    its original; False must miss the rotations (the very gap the flag
    closes)."""
    rows = []
    truth = {}
    rng = np.random.default_rng(77)
    for i in range(12):
        px = _img(100 + i)
        iid = f"orig{i:02d}"
        rows.append((iid, bytearray(px.tobytes()), W, H, "raw",
                     f"caption original {i}",
                     int(np.int64(np.uint64(phash64(px.reshape(-1), W, H))))))
        truth[iid] = iid
        k = 1 + i % 3
        t = np.rot90(px, k, axes=(0, 1))
        if i % 2:
            t = t[:, ::-1, :]
        noisy = np.clip(
            t.astype(np.int16) + rng.integers(-1, 2, t.shape), 0, 255
        ).astype(np.uint8)
        tid = f"twin{i:02d}"
        h2, w2 = noisy.shape[0], noisy.shape[1]
        rows.append((tid, bytearray(np.ascontiguousarray(noisy).tobytes()),
                     w2, h2, "raw", f"caption twin {i}",
                     int(np.int64(np.uint64(
                         phash64(np.ascontiguousarray(noisy).reshape(-1), w2, h2))))))
        truth[tid] = iid
    images = spark.createDataFrame(
        rows,
        "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash long",
    )
    cfg = SigConfig(phash_hamming=6)

    res = dedup_images(images, cfg, enable_lanes=("phash",),
                       rotation_invariant=True)
    got = {r["id"]: r["cluster_id"] for r in res["assignments"].collect()}
    for i in range(12):
        assert got[f"twin{i:02d}"] == got[f"orig{i:02d}"], i

    res_off = dedup_images(images, cfg, enable_lanes=("phash",),
                           rotation_invariant=False)
    got_off = {r["id"]: r["cluster_id"] for r in res_off["assignments"].collect()}
    missed = sum(
        got_off[f"twin{i:02d}"] != got_off[f"orig{i:02d}"] for i in range(12)
    )
    assert missed > 6  # plain pHash misses most rotated copies


def test_with_canonical_phash_spark(spark):
    px = _img(3)
    ph = phash64(px.reshape(-1), W, H)
    rot = np.ascontiguousarray(np.rot90(px, 1, axes=(0, 1)))
    ph_rot = phash64(rot.reshape(-1), W, H)
    df = spark.createDataFrame(
        [("a", int(np.int64(np.uint64(ph)))),
         ("b", int(np.int64(np.uint64(ph_rot))))],
        "image_id string, phash long",
    )
    out = {r["image_id"]: r["phash"] for r in with_canonical_phash(df).collect()}
    assert out["a"] == out["b"]
