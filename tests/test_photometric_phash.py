"""The pHash photometric-invariance law, precisely: the hash thresholds
BLOCK MEANS against their median, and the mean is linear — so AFFINE
global tone maps (brightness shifts, contrast scaling) that do not clip
preserve every bit EXACTLY, while non-linear monotone maps (gamma) and
per-pixel rounding (mean-luma grayscale) reorder block means only near
the median, moving at most a few bits — well inside the lane's
phash_hamming radius. Pins the law behind the driver oracle
`photometric_dedup_planted`, plus the boundary where it breaks outright
(clipping)."""

from __future__ import annotations

import numpy as np
import pytest

from datasketches_cpp_spark.sources.images import phash64, phash64_batch


def _ham(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


@pytest.mark.parametrize("seed", list(range(8)))
def test_tone_maps_within_lane_radius(seed):
    r = np.random.default_rng(seed)
    w = h = 32
    base = r.integers(30, 220, (h, w, 3)).astype(np.uint8)
    ph0 = phash64(np.ascontiguousarray(base).reshape(-1), w, h)
    g = np.round(base.mean(axis=2))
    affine = {
        "brightness+15": np.clip(base.astype(np.int16) + 15, 0, 255).astype(
            np.uint8
        ),
        "brightness-20": np.clip(base.astype(np.int16) - 20, 0, 255).astype(
            np.uint8
        ),
        # integer-valued contrast about 128 stays exact only if the map
        # is order-preserving after rounding; 0.85 with round() is
        # monotone non-decreasing and linear in the mean up to a
        # constant, so block means scale uniformly -> exact
        "contrast*0.85": np.clip(
            (base.astype(np.float64) - 128) * 0.85 + 128, 0, 255
        ).round().astype(np.uint8),
    }
    for name, px in affine.items():
        ph = phash64(np.ascontiguousarray(px).reshape(-1), w, h)
        assert _ham(ph0, ph) <= 1, (name, _ham(ph0, ph))
    nonlinear = {
        "grayscale": np.repeat(g[:, :, None], 3, axis=2).astype(np.uint8),
        "gamma1.2": (255 * (base.astype(np.float64) / 255) ** 1.2)
        .round()
        .astype(np.uint8),
        "gamma0.8": (255 * (base.astype(np.float64) / 255) ** 0.8)
        .round()
        .astype(np.uint8),
    }
    for name, px in nonlinear.items():
        ph = phash64(np.ascontiguousarray(px).reshape(-1), w, h)
        assert _ham(ph0, ph) <= 4, (name, _ham(ph0, ph))


def test_clipping_breaks_the_law():
    """Hard clipping is NOT order-preserving: blocks saturate together
    and their means cross the median — a sanity check that the law is
    about monotonicity, not a trivially-always-equal hash."""
    r = np.random.default_rng(7)
    w = h = 32
    base = r.integers(0, 256, (h, w, 3)).astype(np.uint8)
    ph0 = phash64(np.ascontiguousarray(base).reshape(-1), w, h)
    crushed = np.clip(base.astype(np.int16) + 120, 0, 255).astype(np.uint8)
    ph1 = phash64(np.ascontiguousarray(crushed).reshape(-1), w, h)
    assert _ham(ph0, ph1) > 0


def test_batch_kernel_matches_scalar():
    r = np.random.default_rng(11)
    w = h = 16
    px = r.integers(0, 256, (5, h * w * 3)).astype(np.uint8)
    batch = phash64_batch(px, w, h)
    for i in range(5):
        assert int(batch[i]) == int(np.uint64(phash64(px[i], w, h)))
