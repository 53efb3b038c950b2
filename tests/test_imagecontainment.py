"""Crop-in-image containment tests (operators/imagecontainment.py):
planted crops with truth by construction, tile kernel vs a direct numpy
twin, hop-lattice localization, and layout invariance."""

import numpy as np
import pytest

from datasketches_cpp_spark.operators.minhash import SigConfig


def _image(seed: int, w: int, h: int, block: int = 8) -> np.ndarray:
    """Blocky random image (distinct content per 8x8 cell, so tile
    pHashes are informative and noise-robust)."""
    g = np.random.default_rng(seed)
    base = g.integers(0, 256, (h // block, w // block, 3), dtype=np.uint8)
    return np.repeat(np.repeat(base, block, axis=0), block, axis=1)


@pytest.fixture(scope="module")
def crop_corpus(spark):
    big = _image(1, 128, 96)              # container, 128x96
    crop = big[16:80, 32:96]              # 64x64 crop at (x=32, y=16)
    gn = np.random.default_rng(2)
    noisy = np.clip(
        crop.astype(np.int16) + gn.integers(-2, 3, crop.shape), 0, 255
    ).astype(np.uint8)
    other = _image(9, 128, 96)
    decoy = _image(7, 64, 64)
    rows = [
        ("big", big.tobytes(), 128, 96, "raw"),
        ("crop", noisy.tobytes(), 64, 64, "raw"),
        ("other", other.tobytes(), 128, 96, "raw"),
        ("decoy", decoy.tobytes(), 64, 64, "raw"),
    ]
    return spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string"
    )


def test_tile_phashes_matches_numpy_twin(spark, crop_corpus):
    from datasketches_cpp_spark.operators.imagecontainment import tile_phashes
    from datasketches_cpp_spark.sources.images import phash64_batch

    tile, hop = 32, 16
    got = {
        (r["image_id"], r["tx"], r["ty"]): r["phash"]
        for r in tile_phashes(crop_corpus, tile=tile, hop=hop).collect()
    }
    big = _image(1, 128, 96)
    for ty in range((96 - tile) // hop + 1):
        for tx in range((128 - tile) // hop + 1):
            t = big[ty * hop : ty * hop + tile, tx * hop : tx * hop + tile]
            exp = phash64_batch(t.reshape(1, -1), tile, tile).view(np.int64)[0]
            assert got[("big", tx, ty)] == exp


def test_image_containment_finds_planted_crop(spark, crop_corpus):
    from datasketches_cpp_spark.operators.imagecontainment import (
        image_containment,
    )

    res = image_containment(
        crop_corpus, SigConfig(phash_hamming=6), tile=32, hop=16,
        min_match_frac=0.8,
    ).collect()
    found = {(r["clip_id"], r["container_id"]): r for r in res}
    assert ("crop", "big") in found
    hit = found[("crop", "big")]
    # crop at pixel (x=32, y=16) = (2, 1) in hop=16 units
    assert (hit["dx_tiles"], hit["dy_tiles"]) == (2, 1)
    assert hit["match_frac"] >= 0.8
    assert ("decoy", "big") not in found
    assert ("crop", "other") not in found
    assert ("big", "crop") not in found  # container has more tiles


def test_image_containment_layout_invariance(spark, crop_corpus):
    from datasketches_cpp_spark.operators.imagecontainment import (
        image_containment,
    )

    a = sorted(map(tuple, image_containment(
        crop_corpus, SigConfig(phash_hamming=6), tile=32, hop=16
    ).collect()))
    b = sorted(map(tuple, image_containment(
        crop_corpus.repartition(7), SigConfig(phash_hamming=6), tile=32,
        hop=16,
    ).collect()))
    assert a == b


def test_tile_kernel_validations(spark, crop_corpus):
    from datasketches_cpp_spark.operators.imagecontainment import tile_phashes

    with pytest.raises(ValueError, match="tile"):
        tile_phashes(crop_corpus, tile=4)
    with pytest.raises(ValueError, match="hop"):
        tile_phashes(crop_corpus, tile=32, hop=64)
    # sub-tile images emit no rows (and don't crash)
    tiny = spark.createDataFrame(
        [("t", _image(3, 16, 16).tobytes(), 16, 16, "raw")],
        "image_id string, bytes binary, w int, h int, fmt string",
    )
    assert tile_phashes(tiny, tile=32).count() == 0
