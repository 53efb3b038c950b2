"""CPC coupon-matrix sketch: estimator accuracy envelope, merge algebra,
Spark two-stage parity, partition invariance, empty-partition safety.

Mirrors the reference's cpc_sketch_test.cpp accuracy/merge discipline
(estimate within the K-derived error envelope; union of disjoint halves
== sketch of the whole — for OR-merge that equality is exact, bit for
bit, which is a stronger check than the reference's tolerance-based one).
"""

import math

import numpy as np
import pyspark.sql.functions as F
import pytest

from datasketches_cpp_spark.functions.cpc import (
    _coupon_count,
    _fold_matrix,
    cpc_sketch_agg,
    cpc_union_agg,
    expected_coupons,
    invert_coupons,
    with_estimate,
)
from datasketches_cpp_spark.hashing import hash63_int64

LG_K = 11
K = 1 << LG_K
RSE = 1.0 / math.sqrt(K)


def _numpy_sketch(values: np.ndarray, lg_k: int = LG_K) -> np.ndarray:
    mat = np.zeros(1 << lg_k, dtype=np.uint64)
    _fold_matrix(mat, hash63_int64(values.astype(np.int64), 9001), lg_k)
    return mat


@pytest.mark.parametrize("n", [100, 5000, 100000])
def test_estimator_envelope(n):
    est = invert_coupons(_coupon_count(_numpy_sketch(np.arange(n))), LG_K)
    assert abs(est - n) / n < 3 * RSE


def test_expected_coupons_monotone():
    xs = [10.0, 100.0, 1e4, 1e6, 1e9]
    ys = [expected_coupons(x, LG_K) for x in xs]
    assert ys == sorted(ys) and ys[0] > 0


def test_union_of_disjoint_halves_is_whole():
    a = _numpy_sketch(np.arange(0, 40000))
    b = _numpy_sketch(np.arange(40000, 80000))
    whole = _numpy_sketch(np.arange(80000))
    assert np.array_equal(a | b, whole)  # OR-merge is exact, bit for bit


def test_union_idempotent():
    a = _numpy_sketch(np.arange(10000))
    assert np.array_equal(a | a, a)


def test_spark_agg_matches_numpy(spark):
    n = 20000
    df = spark.createDataFrame(
        [(int(i), f"g{i % 2}") for i in range(n)], "v long, grp string"
    ).repartition(8)
    out = with_estimate(cpc_sketch_agg(df, ["grp"], "v", lg_k=LG_K)).collect()
    assert len(out) == 2
    for r in out:
        g = int(r["grp"][1])
        want = _numpy_sketch(np.arange(g, n, 2))
        got = np.asarray(r["coupons"], dtype=np.int64).view(np.uint64)
        assert np.array_equal(got, want)  # two-stage == single-pass, exactly
        exact = n // 2
        assert r["lower_bound"] <= exact <= r["upper_bound"]
        assert abs(r["estimate"] - exact) / exact < 3 * RSE


def test_partition_invariance(spark):
    df = spark.createDataFrame([(int(i),) for i in range(5000)], "v long")
    ests = set()
    for parts in (1, 7, 32):
        row = with_estimate(
            cpc_sketch_agg(df.repartition(parts), [], "v", lg_k=LG_K)
        ).collect()[0]
        ests.add(round(row["estimate"], 6))
    assert len(ests) == 1  # layout never changes the answer


def test_union_agg_epochs(spark):
    df = spark.createDataFrame(
        [(int(i), i % 3) for i in range(9000)], "v long, epoch int"
    )
    per_epoch = cpc_sketch_agg(df, ["epoch"], "v", lg_k=LG_K)
    merged = with_estimate(
        cpc_union_agg(per_epoch.drop("epoch"), [])
    ).collect()[0]
    want = _numpy_sketch(np.arange(9000))
    got = np.asarray(merged["coupons"], dtype=np.int64).view(np.uint64)
    assert np.array_equal(got, want)
    assert abs(merged["estimate"] - 9000) / 9000 < 3 * RSE


def test_empty_partitions(spark):
    rows = [(i, f"grp{i % 2}") for i in range(5)]
    df = spark.createDataFrame(rows, "v long, grp string").repartition(16)
    out = with_estimate(cpc_sketch_agg(df, ["grp"], "v", lg_k=LG_K)).collect()
    assert sorted(r["grp"] for r in out) == ["grp0", "grp1"]
    # tiny n: coupon count == n, inversion lands within a whisker
    for r in out:
        assert abs(r["estimate"] - (3 if r["grp"] == "grp0" else 2)) < 0.5


def test_all_null_column(spark):
    df = spark.createDataFrame([(None,), (None,)], "v string")
    out = with_estimate(cpc_sketch_agg(df, [], "v", lg_k=LG_K)).collect()
    # no non-null items -> no partial rows -> empty result (caller's zero)
    assert out == [] or out[0]["estimate"] == 0.0
