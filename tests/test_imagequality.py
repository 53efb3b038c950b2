"""Image quality heuristics (operators/imagequality.py): planted solid /
noise / smooth-gradient images must separate cleanly on every metric,
batched-histogram entropy must equal the per-image numpy computation,
and the Spark surface must flag exactly the planted low-information ids.
"""

import numpy as np
import pytest

from datasketches_cpp_spark.operators.imagequality import (
    _gray,
    _laplacian,
    image_quality_stats,
)

W, H = 48, 32


def _solid(val=128):
    return np.full(H * W * 3, val, np.uint8)


def _noise(seed):
    return np.random.default_rng(seed).integers(0, 256, H * W * 3, np.uint8)


def _gradient():
    """Smooth horizontal ramp: spread histogram (high entropy) but almost
    no Laplacian response (blurry by construction)."""
    ramp = np.linspace(0, 255, W, dtype=np.uint8)
    img = np.broadcast_to(ramp, (H, W))
    return np.repeat(img.reshape(-1), 3).astype(np.uint8)


def test_metric_separation_numpy():
    batch = np.stack([_solid(), _noise(1), _gradient()])
    g = _gray(batch, H, W)
    lap_var = _laplacian(g).var(axis=(1, 2))
    # solid: zero variance; noise: huge; gradient: tiny but nonzero
    assert lap_var[0] == 0.0
    assert lap_var[1] > 1000.0
    assert lap_var[2] < 50.0


def test_entropy_matches_direct_computation():
    batch = np.stack([_noise(7), _gradient()])
    g = _gray(batch, H, W)
    gi = np.clip(g.reshape(2, -1).round(), 0, 255).astype(np.int64)
    for i in range(2):
        counts = np.bincount(gi[i], minlength=256)
        p = counts[counts > 0] / gi.shape[1]
        expected = float(-(p * np.log2(p)).sum())
        # recompute through the operator's batched path
        m = 2
        bc = np.bincount(
            (np.arange(m)[:, None] * 256 + gi).ravel(), minlength=m * 256
        ).reshape(m, 256)
        pp = bc[i] / gi.shape[1]
        with np.errstate(divide="ignore", invalid="ignore"):
            got = float(-np.where(pp > 0, pp * np.log2(pp), 0.0).sum())
        assert got == pytest.approx(expected, rel=1e-12)


PLANT = [
    ("solid_a", "solid"),
    ("noise_a", "noise"),
    ("grad_a", "gradient"),
    ("solid_b", "solid"),
    ("noise_b", "noise"),
]


def _planted_df(spark):
    rows = []
    for i, (iid, kind) in enumerate(PLANT):
        if kind == "solid":
            px = _solid(40 + i)
        elif kind == "noise":
            px = _noise(50 + i)
        else:
            px = _gradient()
        rows.append((iid, bytearray(px.tobytes()), W, H, "raw"))
    return spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string"
    )


def test_spark_surface_flags_planted(spark):
    got = {r["id"]: r for r in image_quality_stats(_planted_df(spark)).collect()}
    assert len(got) == len(PLANT)
    for iid, kind in PLANT:
        r = got[iid]
        if kind == "solid":
            assert r["is_low_information"]
            assert r["solid_frac"] == 1.0
            assert r["entropy_bits"] == 0.0
        else:
            assert not r["is_low_information"]
        if kind == "noise":
            assert r["laplacian_var"] > 1000.0
            assert r["entropy_bits"] > 6.0
            assert r["edge_density"] > 0.5
        if kind == "gradient":
            assert r["laplacian_var"] < 50.0  # blurry by construction
            assert r["edge_density"] < 0.05


# ---------------------------------------------------------------------------
# SSIM — integral-image implementation vs a naive sliding-window twin
# ---------------------------------------------------------------------------


def _ssim_naive(ga, gb, win=8, L=255.0):
    import numpy as np

    ga, gb = ga.astype(np.float64), gb.astype(np.float64)
    c1, c2 = (0.01 * L) ** 2, (0.03 * L) ** 2
    out = []
    for x, y in zip(ga, gb):
        h, w = x.shape
        vals = []
        for i in range(h - win + 1):
            for j in range(w - win + 1):
                wx = x[i:i + win, j:j + win]
                wy = y[i:i + win, j:j + win]
                mx, my = wx.mean(), wy.mean()
                vx, vy = wx.var(), wy.var()
                cxy = (wx * wy).mean() - mx * my
                vals.append(
                    ((2 * mx * my + c1) * (2 * cxy + c2))
                    / ((mx * mx + my * my + c1) * (vx + vy + c2))
                )
        out.append(sum(vals) / len(vals))
    return out


def test_ssim_batch_matches_naive_and_is_symmetric():
    import numpy as np

    from datasketches_cpp_spark.operators.imagequality import ssim_batch

    rng = np.random.default_rng(7)
    ga = rng.integers(0, 256, (3, 12, 14)).astype(np.float64)
    gb = np.clip(ga + rng.normal(0, 20, ga.shape), 0, 255)
    got = ssim_batch(ga, gb)
    want = _ssim_naive(ga, gb)
    assert np.allclose(got, want, rtol=0, atol=1e-9)
    assert np.allclose(got, ssim_batch(gb, ga), atol=1e-12)
    # identical stacks: exactly 1
    assert np.allclose(ssim_batch(ga, ga), 1.0, atol=1e-12)


def test_ssim_noise_ordering_and_tiny_images():
    import numpy as np

    from datasketches_cpp_spark.operators.imagequality import ssim_batch

    rng = np.random.default_rng(11)
    base = rng.integers(40, 200, (1, 32, 32)).astype(np.float64)
    mild = np.clip(base + rng.normal(0, 4, base.shape), 0, 255)
    heavy = np.clip(base + rng.normal(0, 80, base.shape), 0, 255)
    s_mild = ssim_batch(base, mild)[0]
    s_heavy = ssim_batch(base, heavy)[0]
    assert s_mild > 0.8 > s_heavy
    # window clamps below image size: 4x4 images still score
    tiny = base[:, :4, :4]
    assert ssim_batch(tiny, tiny)[0] == 1.0


def test_ssim_verify_pairs_and_gate(spark):
    import numpy as np

    from datasketches_cpp_spark.operators.imagequality import (
        ssim_gate_edges,
        ssim_verify_pairs,
    )

    rng = np.random.default_rng(3)
    w = h = 16
    base = rng.integers(30, 220, (h, w, 3)).astype(np.uint8)
    mild = np.clip(
        base.astype(np.int32) + rng.integers(-5, 6, base.shape), 0, 255
    ).astype(np.uint8)
    other = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    small = base[:8, :8]
    rows = [
        ("i0", base.tobytes(), w, h, "raw"),
        ("i1", mild.tobytes(), w, h, "raw"),
        ("i2", other.tobytes(), w, h, "raw"),
        ("i3", small.tobytes(), 8, 8, "raw"),
    ]
    images = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string"
    )
    pairs = spark.createDataFrame(
        [("i0", "i1"), ("i0", "i2"), ("i0", "i3")], "a string, b string"
    )
    got = {
        (r.a, r.b): r.ssim
        for r in ssim_verify_pairs(pairs, images).collect()
    }
    assert got[("i0", "i1")] > 0.9            # near-identical twin
    assert got[("i0", "i2")] < 0.5            # unrelated content
    assert got[("i0", "i3")] is None          # dimension mismatch -> NULL
    kept = {(r.a, r.b) for r in ssim_gate_edges(pairs, images, 0.8).collect()}
    assert kept == {("i0", "i1")}


def test_ssim_gate_separates_phash_identical_impostors(spark):
    """The planted law behind the ssim_gated_dedup_planted oracle: a
    zero-mean-per-4x4-block checkerboard preserves the block-mean pHash
    BIT-FOR-BIT (so the hash lane accepts the edge) while SSIM rejects
    it; mild noise twins survive both."""
    import numpy as np

    import __spark_entry__ as entry
    from datasketches_cpp_spark.operators.cc import assign_clusters
    from datasketches_cpp_spark.operators.imagededup import dedup_images
    from datasketches_cpp_spark.operators.imagequality import ssim_gate_edges
    from datasketches_cpp_spark.operators.sigkernel import SigConfig

    rows, truth = entry._planted_ssim_rows()
    # pHash identity of every impostor with its base, by construction
    ph = {r[0]: r[6] for r in rows}
    for i in range(10):
        assert ph[f"ss{i:02d}c"] == ph[f"ss{i:02d}a"]
    images = spark.createDataFrame(
        rows,
        "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash long",
    )
    res = dedup_images(images, SigConfig(phash_hamming=6),
                       enable_lanes=("phash",))
    ungated = {
        r.id: r.cluster_id
        for r in assign_clusters(
            images.selectExpr("image_id AS id"), res["edges"]
        ).collect()
    }
    # hash lane alone cannot tell the impostor from the base
    assert all(
        ungated[f"ss{i:02d}c"] == ungated[f"ss{i:02d}a"] for i in range(10)
    )
    gated = {
        r.id: r.cluster_id
        for r in assign_clusters(
            images.selectExpr("image_id AS id"),
            ssim_gate_edges(res["edges"], images, threshold=0.8),
        ).collect()
    }
    assert gated == truth


def test_tiny_images_get_zero_stats_not_nan(spark):
    """1x1/2x2 placeholders have no Laplacian interior: stats must be 0
    (maximally featureless), never NaN/NULL from empty reductions."""
    import math

    from datasketches_cpp_spark.operators.imagequality import (
        image_quality_stats,
    )

    rows = [
        ("t1", bytearray(b"\x10\x20\x30"), 1, 1, "raw"),
        ("t2", bytearray(bytes(range(12))), 2, 2, "raw"),
    ]
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string"
    )
    out = {r["id"]: r for r in image_quality_stats(df).collect()}
    for r in out.values():
        assert r["laplacian_var"] == 0.0 and not math.isnan(r["laplacian_var"])
        assert r["edge_density"] == 0.0
    # the 1x1 is a single solid color -> entropy 0 -> low information
    # (the 2x2 of four distinct colors has 2 bits of entropy: kept)
    assert out["t1"]["is_low_information"]
    assert not out["t2"]["is_low_information"]
