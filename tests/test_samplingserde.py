"""Wire round-trips + hardening for the sampling/filter families
(var_opt family 13, count-min family 18, bloom family 21)."""

from __future__ import annotations

import numpy as np
import pytest

from datasketches_cpp_spark.functions.samplingserde import (
    SamplingSerdeError,
    deserialize_bloom,
    deserialize_countmin,
    deserialize_varopt,
    serialize_bloom,
    serialize_countmin,
    serialize_varopt,
)


# -- var_opt ---------------------------------------------------------------


def test_varopt_roundtrip_int_items():
    items = [10, 20, 30, 40, 50]
    weights = [9.0, 7.5, 2.0, 2.0, 2.0]
    exact = [True, True, False, False, False]
    buf = serialize_varopt(items, weights, exact, n=1000, k=5)
    got = deserialize_varopt(buf)
    assert got["k"] == 5 and got["n"] == 1000
    assert got["items"] == items
    np.testing.assert_allclose(got["weights"], weights)
    np.testing.assert_array_equal(got["exact"], exact)
    assert got["marks"] is None


def test_varopt_roundtrip_string_items_and_marks():
    items = ["alpha", "beta", "gamma", "delta"]
    weights = [5.0, 4.0, 1.5, 1.5]
    exact = [True, True, False, False]
    marks = [False, True]
    buf = serialize_varopt(items, weights, exact, n=77, k=4,
                           item_dtype="string", marks=marks)
    got = deserialize_varopt(buf, item_dtype="string")
    assert got["items"] == items
    np.testing.assert_array_equal(got["marks"], marks)
    np.testing.assert_allclose(got["weights"], weights)


def test_varopt_region_canonicalization():
    """Items arriving R-before-H are reordered H-first on the wire (the
    reference's layout) without losing the pairing."""
    items = [1, 2, 3]
    weights = [2.0, 9.0, 2.0]
    exact = [False, True, False]
    got = deserialize_varopt(serialize_varopt(items, weights, exact, n=50, k=3))
    assert got["items"] == [2, 1, 3]  # H first, then R in stable order
    np.testing.assert_allclose(got["weights"], [9.0, 2.0, 2.0])


def test_varopt_warmup_and_empty_layouts():
    # warmup: all exact, no R → 3 preamble longs, no total_wt_r
    buf = serialize_varopt([1, 2], [3.0, 4.0], [True, True], n=2, k=8)
    assert buf[0] & 0x3F == 3
    got = deserialize_varopt(buf)
    assert got["n"] == 2 and list(got["exact"]) == [True, True]
    # empty
    buf = serialize_varopt([], [], [], n=0, k=8)
    assert len(buf) == 8
    assert deserialize_varopt(buf)["n"] == 0


def test_varopt_spark_agg_row_shape_roundtrips(spark):
    """The var_opt_agg output row shape maps straight onto the wire."""
    import pyspark.sql.functions as F

    from datasketches_cpp_spark.functions.sampling import var_opt_agg

    df = spark.range(0, 2000).select(
        F.col("id"), (F.col("id") % 100 + 1).cast("double").alias("w")
    )
    rows = var_opt_agg(df, [], "id", "w", k=32).collect()
    buf = serialize_varopt(
        [r["item"] for r in rows],
        [r["adjusted_weight"] for r in rows],
        [r["weight_exact"] for r in rows],
        n=rows[0]["n"], k=32,
    )
    got = deserialize_varopt(buf)
    assert got["n"] == 2000
    # sample size ≈ k (this engine keeps lights by independent Bernoulli —
    # expected-size k, documented deviation from the reference's exact-k)
    assert len(got["items"]) == len(rows) > 0
    # subset-sum estimate is preserved exactly through the wire
    assert sum(got["weights"]) == pytest.approx(
        sum(r["adjusted_weight"] for r in rows)
    )


def test_varopt_hardening():
    buf = serialize_varopt([1, 2, 3], [5.0, 1.0, 1.0], [True, False, False], 9, 4)
    with pytest.raises(SamplingSerdeError):
        deserialize_varopt(buf[:20])
    bad = bytearray(buf)
    bad[2] = 99  # family
    with pytest.raises(SamplingSerdeError):
        deserialize_varopt(bytes(bad))


# -- count-min -------------------------------------------------------------


def test_countmin_roundtrip():
    rng = np.random.default_rng(11)
    d, w = 5, 256
    matrix = rng.integers(0, 1000, (d, w)).astype(np.uint64)
    buf = serialize_countmin(matrix, total_weight=123456, num_hashes=d,
                             num_buckets=w)
    got = deserialize_countmin(buf)
    assert got["total_weight"] == 123456
    assert (got["num_hashes"], got["num_buckets"]) == (d, w)
    np.testing.assert_array_equal(got["matrix"], matrix)


def test_countmin_empty_and_seed_guard():
    buf = serialize_countmin(np.zeros((3, 8), np.uint64), 0, 3, 8)
    assert len(buf) == 16  # two preamble longs only
    assert deserialize_countmin(buf)["total_weight"] == 0
    full = serialize_countmin(np.ones((3, 8), np.uint64), 24, 3, 8, seed=9001)
    with pytest.raises(SamplingSerdeError):
        deserialize_countmin(full, seed=1234)


# -- bloom -----------------------------------------------------------------


def test_bloom_roundtrip():
    rng = np.random.default_rng(12)
    bits = rng.integers(0, 256, 128).astype(np.uint8)  # 1024-bit filter
    buf = serialize_bloom(bits, num_hashes=7, seed=9001)
    got = deserialize_bloom(buf)
    assert got["num_hashes"] == 7 and got["seed"] == 9001
    np.testing.assert_array_equal(got["bits"], bits)
    assert got["num_bits_set"] == int(np.unpackbits(bits).sum())


def test_bloom_empty_and_hardening():
    buf = serialize_bloom(np.zeros(64, np.uint8), num_hashes=5, seed=42)
    assert deserialize_bloom(buf)["num_bits_set"] == 0
    with pytest.raises(SamplingSerdeError):
        serialize_bloom(np.zeros(7, np.uint8), 3, 1)  # not whole longs
    full = serialize_bloom(np.ones(64, np.uint8), 5, 42)
    with pytest.raises(SamplingSerdeError):
        deserialize_bloom(full[:40])
