"""CPC HIP estimator (reference cpc_sketch_impl.hpp:266-271 update_hip —
hip += k/kxp before kxp -= 2^-(col+1) on each novel coupon;
get_estimate :75-78 HIP unless was_merged; confidence per
cpc_confidence.hpp get_hip_confidence_lb/ub with the empirical side
constants for lg_k ≤ 14)."""

from __future__ import annotations

import math

import numpy as np

from datasketches_cpp_spark.functions.cpc import (
    HIP_ERROR_CONSTANT,
    CpcState,
    _coupon_count,
    cpc_stream_agg,
    invert_coupons,
)
from datasketches_cpp_spark.hashing import hash63_int64


def _hashes(n: int, seed: int) -> np.ndarray:
    return hash63_int64(np.arange(n, dtype=np.int64) + seed * 1_000_003, seed=9001)


def test_cpc_hip_sparse_is_nearly_exact():
    st = CpcState(lg_k=11)
    st.update_hashes(_hashes(30, seed=1))
    assert abs(st.get_estimate() - 30) < 0.2
    assert st.num_coupons == 30  # no coupon collisions at n << K


def test_cpc_hip_ignores_duplicates():
    h = _hashes(5000, seed=2)
    a, b = CpcState(10), CpcState(10)
    a.update_hashes(np.concatenate([h, h]))
    b.update_hashes(h)
    assert a.hip == b.hip and a.kxp == b.kxp and a.num_coupons == b.num_coupons


def test_cpc_hip_envelope_calibrated():
    lg_k, n = 10, 50_000
    errs = []
    for seed in range(12):
        st = CpcState(lg_k)
        st.update_hashes(_hashes(n, seed=seed))
        assert not st.merged
        errs.append((st.get_estimate() - n) / n)
        lb, ub = st.get_bounds(3)
        assert lb <= n <= ub, f"seed {seed}: {lb} !<= {n} !<= {ub}"
    hip_sigma = HIP_ERROR_CONSTANT / math.sqrt(1 << lg_k)
    assert max(abs(e) for e in errs) <= 3.5 * hip_sigma
    rms = math.sqrt(sum(e * e for e in errs) / len(errs))
    assert rms <= 2 * hip_sigma  # visibly tighter than the 1.0/sqrt(K) ICON envelope


def test_cpc_merge_forfeits_hip():
    a, b = CpcState(10), CpcState(10)
    a.update_hashes(_hashes(20_000, seed=31))
    b.update_hashes(_hashes(20_000, seed=32))
    a.merge_matrix(b.mat)
    assert a.merged
    assert a.get_estimate() == invert_coupons(_coupon_count(a.mat), 10)
    # true union cardinality within the (wider) merged envelope
    lb, ub = a.get_bounds(3)
    assert lb <= 40_000 <= ub
    # lower bound never below the observed coupon count
    assert lb >= 0 and a.num_coupons == _coupon_count(a.mat)


def test_cpc_hip_lower_bound_floored_at_coupons():
    st = CpcState(lg_k=11)
    st.update_hashes(_hashes(10, seed=4))
    lb, _ = st.get_bounds(1)
    assert lb >= st.num_coupons


def test_cpc_stream_agg_layout_invariant_and_covered(spark):
    rows = [(i % 3, f"u{i % 4000}") for i in range(12_000)]
    df1 = spark.createDataFrame(rows, "g int, item string").repartition(1)
    df2 = spark.createDataFrame(rows[::-1], "g int, item string").repartition(13)
    a = {r["g"]: (r["estimate"], r["lower_bound"], r["upper_bound"])
         for r in cpc_stream_agg(df1, ["g"], "item", lg_k=10, kappa=3).collect()}
    b = {r["g"]: (r["estimate"], r["lower_bound"], r["upper_bound"])
         for r in cpc_stream_agg(df2, ["g"], "item", lg_k=10, kappa=3).collect()}
    assert a == b
    for g, (est, lb, ub) in a.items():
        exact = len({item for gg, item in rows if gg == g})
        assert lb <= exact <= ub
