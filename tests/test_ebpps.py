"""EBPPS (exact PPS with bounded expected size) — reference
sampling/include/ebpps_sketch.hpp:64-152 semantics: inclusion probability
exactly min(1, w/tau) with Σ min(1, w/tau) = k."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from datasketches_cpp_spark.functions.sampling import _pps_threshold, ebpps_sample


def test_pps_threshold_math():
    # uniform weights: tau = total/k
    w = np.ones(100)
    tau = _pps_threshold(np.sort(w)[::-1][:11], 100.0, 10)
    assert abs(tau - 10.0) < 1e-12
    assert abs(sum(min(1.0, x / tau) for x in w) - 10.0) < 1e-9
    # one dominant heavy item: it gets probability 1
    w = np.array([1000.0] + [1.0] * 99)
    tau = _pps_threshold(np.sort(w)[::-1][:6], float(w.sum()), 5)
    assert 1000.0 > tau  # heavy: pi = 1
    assert abs(sum(min(1.0, x / tau) for x in w) - 5.0) < 1e-9
    # skewed continuum
    rng = np.random.default_rng(3)
    w = rng.pareto(1.5, 500) + 0.1
    k = 20
    tau = _pps_threshold(np.sort(w)[::-1][: k + 1], float(w.sum()), k)
    assert abs(np.minimum(1.0, w / tau).sum() - k) < 1e-6


def test_exact_mode_keeps_everything(spark):
    df = spark.createDataFrame(
        [(i, float(i + 1)) for i in range(50)], "item long, w double"
    )
    out = ebpps_sample(df, "item", "w", k=100).collect()
    assert len(out) == 50
    assert all(r["inclusion_prob"] == 1.0 for r in out)
    assert abs(sum(r["ht_weight"] for r in out) - sum(range(1, 51))) < 1e-9


def test_expected_size_and_ht_unbiasedness(spark):
    rng = np.random.default_rng(11)
    w = rng.pareto(1.5, 2000) + 0.1
    df = spark.createDataFrame(
        [(i, float(w[i])) for i in range(2000)], "item long, w double"
    )
    k = 50
    sizes, ht_totals = [], []
    for seed in range(8):
        s = ebpps_sample(df, "item", "w", k=k, seed=1000 + seed)
        rows = s.collect()
        sizes.append(len(rows))
        ht_totals.append(sum(r["ht_weight"] for r in rows))
        # heavy items (pi == 1) always present with their true weight
        for r in rows:
            if r["inclusion_prob"] == 1.0:
                assert r["ht_weight"] == r["weight"]
    total = float(w.sum())
    # HARD size bound (reference {floor(c), ceil(c)} contract,
    # ebpps_sample.hpp get_c()): systematic PPS realizes ceil(sum(pi)-U),
    # i.e. k or k-1 up to tau's float solve
    for sz in sizes:
        assert abs(sz - k) <= 1, sizes
    # Horvitz-Thompson estimator of total weight is unbiased
    assert abs(np.mean(ht_totals) - total) / total < 0.15


def test_deterministic_given_seed(spark):
    df = spark.createDataFrame(
        [(i, float((i % 13) + 1)) for i in range(500)], "item long, w double"
    )
    a = sorted(r["item"] for r in ebpps_sample(df, "item", "w", k=30, seed=7).collect())
    b = sorted(r["item"] for r in ebpps_sample(df, "item", "w", k=30, seed=7).collect())
    assert a == b  # xxhash64 uniforms: same seed -> same sample


def test_empty_input(spark):
    df = spark.createDataFrame([], "item long, w double")
    assert ebpps_sample(df, "item", "w", k=10).count() == 0
