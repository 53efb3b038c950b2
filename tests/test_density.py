"""Density sketch (KDE coreset): estimate accuracy vs exact KDE, merge law,
compaction bound — mirroring the reference's density_sketch tests
(density/include/density_sketch_impl.hpp semantics)."""

import numpy as np
import pytest

from datasketches_cpp_spark.functions.density import DensitySketch, _kernel_rows


def exact_kde(points: np.ndarray, queries: np.ndarray, inv2sig2: float) -> np.ndarray:
    return _kernel_rows(queries, points, inv2sig2).sum(axis=1) / len(points)


def two_blob_data(n, seed=5):
    rng = np.random.default_rng(seed)
    a = rng.normal([-2, 0], 0.5, size=(n // 2, 2))
    b = rng.normal([3, 1], 0.8, size=(n - n // 2, 2))
    return np.concatenate([a, b])


def test_exact_below_k():
    pts = two_blob_data(200)
    ds = DensitySketch(k=256, dim=2)
    ds.update_batch(pts)
    assert not ds.is_estimation_mode()
    q = np.array([[-2.0, 0.0], [3.0, 1.0], [10.0, 10.0]])
    got = ds.get_estimate(q)
    want = exact_kde(pts, q, ds._inv2sig2)
    assert np.allclose(got, want)  # below k·levels: coreset == input


def test_estimation_mode_accuracy():
    pts = two_blob_data(20_000)
    ds = DensitySketch(k=256, dim=2)
    for chunk in np.array_split(pts, 40):
        ds.update_batch(chunk)
    assert ds.is_estimation_mode()
    assert ds.num_retained() < 4096
    q = np.array([[-2.0, 0.0], [0.5, 0.5], [3.0, 1.0]])
    got = ds.get_estimate(q)
    want = exact_kde(pts, q, ds._inv2sig2)
    # coreset KDE relative error at density peaks stays small
    assert np.all(np.abs(got - want) <= 0.15 * want.max() + 1e-3), (got, want)


def test_merge_matches_envelope():
    pts = two_blob_data(12_000, seed=9)
    parts = np.array_split(pts, 8)
    sketches = []
    for i, p in enumerate(parts):
        ds = DensitySketch(k=256, dim=2, seed=100 + i)
        ds.update_batch(p)
        sketches.append(ds)
    merged = sketches[0]
    for other in sketches[1:]:
        merged.merge(other)
    assert merged.n == len(pts)
    q = np.array([[-2.0, 0.0], [3.0, 1.0]])
    got = merged.get_estimate(q)
    want = exact_kde(pts, q, merged._inv2sig2)
    assert np.all(np.abs(got - want) <= 0.15 * want.max() + 1e-3)


def test_reference_default_kernel():
    # reference gaussian_kernel: exp(-||a-b||^2), i.e. sigma = sqrt(1/2)
    ds = DensitySketch(k=16, dim=1)
    assert abs(ds._inv2sig2 - 1.0) < 1e-12
    a = np.array([[0.0]])
    b = np.array([[1.0]])
    assert abs(_kernel_rows(a, b, 1.0)[0, 0] - np.exp(-1.0)) < 1e-12


def test_empty_raises():
    ds = DensitySketch(k=16, dim=2)
    with pytest.raises(ValueError):
        ds.get_estimate(np.array([[0.0, 0.0]]))


def test_spark_density_agg(spark):
    from datasketches_cpp_spark.functions.density import (
        density_sketch_agg,
        with_density_estimates,
    )

    pts = two_blob_data(6_000, seed=3)
    df = spark.createDataFrame(
        [(("g1" if i % 2 else "g2"), [float(x), float(y)]) for i, (x, y) in enumerate(pts)],
        "g string, vec array<double>",
    ).repartition(12)
    q = np.array([[-2.0, 0.0], [3.0, 1.0]])
    out = with_density_estimates(
        density_sketch_agg(df, ["g"], "vec", dim=2, k=128), q, dim=2, k=128
    ).collect()
    assert sorted(r["g"] for r in out) == ["g1", "g2"]
    for r in out:
        sub = pts[1::2] if r["g"] == "g1" else pts[0::2]
        want = exact_kde(sub, q, 1.0)
        got = np.array([r["density_0"], r["density_1"]])
        assert np.all(np.abs(got - want) <= 0.2 * want.max() + 1e-3)
