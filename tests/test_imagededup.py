

# ---------------------------------------------------------------------------
# dHash gradient-sign lane (vertical-lighting invariance contrast law)
# ---------------------------------------------------------------------------


def test_dhash_invariant_to_vertical_profile_phash_is_not():
    import numpy as np

    from datasketches_cpp_spark.operators.sigkernel import (
        dhash64_batch,
        gray_sum_batch,
    )
    from datasketches_cpp_spark.sources.images import phash64_batch

    rng = np.random.default_rng(5)
    px = rng.integers(30, 200, (6, 32, 32, 3)).astype(np.uint8)
    flat = px.reshape(6, -1)
    # ARBITRARY per-row profile (not just linear), bounded so nothing clips
    profile = rng.integers(0, 56, 32)
    lit = np.clip(
        px.astype(np.int16) + profile[None, :, None, None], 0, 255
    ).astype(np.uint8)
    dh0 = dhash64_batch(gray_sum_batch(flat, 32, 32))
    dh1 = dhash64_batch(gray_sum_batch(lit.reshape(6, -1), 32, 32))
    assert (dh0 == dh1).all()  # bit-exact invariance, by construction
    ph0 = phash64_batch(flat, 32, 32)
    ph1 = phash64_batch(lit.reshape(6, -1), 32, 32)
    hd = [bin(int(a ^ b)).count("1") for a, b in zip(ph0, ph1)]
    assert min(hd) > 6  # the block-mean pHash lane cannot recover these


def test_dhash_sensitive_to_horizontal_structure():
    import numpy as np

    from datasketches_cpp_spark.operators.sigkernel import (
        dhash64_batch,
        gray_sum_batch,
    )

    rng = np.random.default_rng(9)
    px = rng.integers(30, 200, (1, 32, 32, 3)).astype(np.uint8)
    # horizontal ramp: changes the column gradients -> hash must move
    hramp = (np.arange(32, dtype=np.int16) * 55) // 31
    lit = np.clip(
        px.astype(np.int16) + hramp[None, None, :, None], 0, 255
    ).astype(np.uint8)
    dh0 = dhash64_batch(gray_sum_batch(px.reshape(1, -1), 32, 32))
    dh1 = dhash64_batch(gray_sum_batch(lit.reshape(1, -1), 32, 32))
    assert dh0[0] != dh1[0]
    # tiny rasters rejected
    import pytest

    with pytest.raises(ValueError):
        dhash64_batch(np.zeros((1, 4, 4)))


def test_dhash_lane_recovers_ramp_twins(spark):
    import __spark_entry__ as entry
    from datasketches_cpp_spark.operators.imagededup import dedup_images
    from datasketches_cpp_spark.operators.sigkernel import SigConfig

    rows, truth = entry._planted_gradient_rows()
    images = spark.createDataFrame(
        rows,
        "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash long",
    )
    # pHash lane alone: NO ramp twin ever joins its own base (hamming
    # 22-34); the strong shared ramp instead dominates the block-vs-
    # median bits and glues the TWINS to each other — wrong both ways
    ph = dedup_images(images, SigConfig(phash_hamming=6),
                      enable_lanes=("phash",))["assignments"]
    ph_map = {r.id: r.cluster_id for r in ph.collect()}
    assert all(
        ph_map[f"gr{i:02d}b"] != ph_map[f"gr{i:02d}a"] for i in range(10)
    )
    # dhash lane: exactly the planted clusters
    dh = dedup_images(images, SigConfig(phash_hamming=6),
                      enable_lanes=("dhash",))["assignments"]
    assert {r.id: r.cluster_id for r in dh.collect()} == truth
