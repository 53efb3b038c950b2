"""Binomial bounds (binomial_bounds.py) — regime-by-regime validation of
the re-derived reference semantics (common/include/binomial_bounds.hpp):

* exact-Bayesian regime cross-checked against an independent log-domain
  evaluation of the posterior tail sum (lgamma, no term recurrence);
* Monte-Carlo coverage: a true count N sampled at rate θ must fall inside
  [lb, ub] at least as often as the nominal two-sided mass;
* clamp laws, degenerate regimes, and the documented equivalent-z
  deviation corner quantified (named delta, not hand-waved);
* JVM-side with_bounds == Python get_bounds to machine precision in the
  n > 120 regime every real sketch configuration lives in.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from datasketches_cpp_spark import binomial_bounds as bb


def _tail_sum_log(n: int, theta: float, M: int) -> float:
    """Independent oracle for the posterior tail: the negative-binomial
    mass Σ_{m=n}^{M} C(m-1, n-1)·θⁿ·(1-θ)^{m-n}, evaluated in the log
    domain via lgamma (no term recurrence, so a recurrence bug in the
    implementation cannot self-confirm)."""
    lp, lq = math.log(theta), math.log(1.0 - theta)
    tot = 0.0
    for m in range(n, M + 1):
        lc = math.lgamma(m) - math.lgamma(n) - math.lgamma(m - n + 1)
        tot += math.exp(lc + n * lp + (m - n) * lq)
    return tot


@pytest.mark.parametrize("n,theta", [(5, 0.2), (17, 0.3), (60, 0.5), (120, 0.4)])
@pytest.mark.parametrize("nsd", [1, 2, 3])
def test_exact_regime_matches_log_domain_oracle(n, theta, nsd):
    assert theta >= n / 360.0  # the exact-Bayesian regime
    delta = bb.DELTA_OF_NUM_STD_DEVS[nsd]
    lb = bb._approx_lb(n, theta, nsd)
    # lb = largest M with tail(M) <= delta
    assert _tail_sum_log(n, theta, int(lb)) <= delta
    assert _tail_sum_log(n, theta, int(lb) + 1) > delta
    ub = bb._approx_ub(n, theta, nsd)
    # ub = first M with tail_{n+1}(M) >= 1 - delta
    assert _tail_sum_log(n + 1, theta, int(ub)) >= 1.0 - delta
    assert _tail_sum_log(n + 1, theta, int(ub) - 1) < 1.0 - delta


@pytest.mark.parametrize("true_n,theta", [(500, 0.3), (5000, 0.05), (200, 0.8)])
def test_monte_carlo_coverage(true_n, theta):
    """P(lb ≤ true_n ≤ ub) must meet the nominal 2-std-dev mass (~95.4%).
    4000 trials put the MC noise floor near ±0.7%, so gate at 93%."""
    rng = np.random.default_rng(7)
    hits = 0
    trials = 4000
    samples = rng.binomial(true_n, theta, size=trials)
    for s in samples:
        lb = bb.lower_bound(int(s), theta, 2)
        ub = bb.upper_bound(int(s), theta, 2)
        hits += lb <= true_n <= ub
    assert hits / trials >= 0.93


def test_clamps_and_degenerate_regimes():
    # theta == 1: both bounds collapse to n
    assert bb.lower_bound(42, 1.0, 2) == 42.0
    assert bb.upper_bound(42, 1.0, 2) == 42.0
    # n == 0
    assert bb.lower_bound(0, 0.5, 2) == 0.0
    assert bb.upper_bound(0, 0.5, 2) >= 1.0
    # lb never exceeds the estimate, never undershoots n
    for n, th in [(1, 0.9), (3, 0.999999), (50, 0.4), (1000, 0.01)]:
        est = n / th
        lb, ub = bb.lower_bound(n, th, 2), bb.upper_bound(n, th, 2)
        assert n <= lb <= est <= ub
    # bounds widen with num_std_devs
    for nsd in (1, 2):
        assert bb.lower_bound(300, 0.2, nsd + 1) <= bb.lower_bound(300, 0.2, nsd)
        assert bb.upper_bound(300, 0.2, nsd + 1) >= bb.upper_bound(300, 0.2, nsd)


def _exact_lb(n: int, theta: float, nsd: int) -> float:
    """Ground-truth n_star by direct log-domain accumulation — valid for
    ANY estimate size (the reference's special_n_star is restricted to
    est < 500 only because it avoids logarithms)."""
    delta = bb.DELTA_OF_NUM_STD_DEVS[nsd]
    lp, lq = math.log(theta), math.log(1.0 - theta)
    tot, m = 0.0, n
    while True:
        lc = math.lgamma(m) - math.lgamma(n) - math.lgamma(m - n + 1)
        tot += math.exp(lc + n * lp + (m - n) * lq)
        if tot > delta:
            return float(m - 1)
        m += 1


def _exact_ub(n: int, theta: float, nsd: int) -> float:
    delta = bb.DELTA_OF_NUM_STD_DEVS[nsd]
    k = n + 1
    lp, lq = math.log(theta), math.log(1.0 - theta)
    tot, m = 0.0, k
    while True:
        lc = math.lgamma(m) - math.lgamma(k) - math.lgamma(m - k + 1)
        tot += math.exp(lc + k * lp + (m - k) * lq)
        if tot >= 1.0 - delta:
            return float(m)
        m += 1


def test_equiv_z_corner_is_exact():
    """2 ≤ n ≤ 120 at theta < n/360 — the regime the reference
    approximates with its equivalent-z tables — is computed EXACTLY here
    (incomplete-beta tail + bisection). Verify against an independent
    direct log-domain accumulation: zero deviation, in the regime where a
    nominal-z Gaussian would be off by up to 45% of the estimate (n=2
    upper bound) and anti-conservative on the lower bound."""
    for n in (2, 10, 60, 120):
        theta = n / 720.0  # inside the corner, estimate = 720
        est = n / theta
        lb = bb.lower_bound(n, theta, 2)
        ub = bb.upper_bound(n, theta, 2)
        assert lb == min(est, max(float(n), _exact_lb(n, theta, 2)))
        assert ub == max(est, _exact_ub(n, theta, 2))
    # deep-theta sanity: estimate ~1e6 from 50 samples still terminates
    # fast (bisection, not linear accumulation) and brackets the estimate
    lb = bb.lower_bound(50, 5e-5, 2)
    ub = bb.upper_bound(50, 5e-5, 2)
    assert 50 <= lb <= 1e6 <= ub


def test_estimation_sketch_bound_laws(spark):
    """End-to-end reference-law check (theta_sketch_test.cpp:143-168
    estimation case) + JVM/Python agreement: with_bounds' SQL closed form
    equals binomial_bounds' Python values to machine precision for
    n > 120 sketch rows."""
    import pyspark.sql.functions as F

    from datasketches_cpp_spark.functions.theta import (
        theta_sketch_agg,
        with_bounds,
    )

    n = 8000
    df = spark.range(n).select(F.col("id"), F.lit(0).alias("g"))
    sk = theta_sketch_agg(df, ["g"], "id", lg_k=12)
    row = with_bounds(sk, 2).collect()[0]
    est, lb, ub = row["estimate"], row["lower_bound"], row["upper_bound"]
    assert lb < n < ub
    assert est == pytest.approx(n, rel=0.05)
    theta_frac = row["theta"] / float(1 << 63)
    n_ret = len(row["sig"])
    assert n_ret > 120
    assert lb == pytest.approx(bb.lower_bound(n_ret, theta_frac, 2), abs=1e-9)
    assert ub == pytest.approx(bb.upper_bound(n_ret, theta_frac, 2), abs=1e-9)


def test_proportion_bounds_vs_exact_clopper_pearson():
    """The A&S 26.5.22 approximation must track the EXACT Clopper-Pearson
    interval (computed via the incomplete-beta the engine already has):
    exact lower p* solves P(Bin(n,p*) >= k) = delta."""
    for n, k in [(100, 30), (1000, 500), (5000, 123), (64, 2), (64, 62)]:
        for nsd in (1.0, 2.0, 3.0):
            delta = bb._delta_of_num_stdevs(nsd)
            lb = bb.approximate_lower_bound_on_p(n, k, nsd)
            ub = bb.approximate_upper_bound_on_p(n, k, nsd)
            # exact CP endpoints via regularized incomplete beta:
            # lower: I_p(k, n-k+1) = 1 - delta at p = lb_exact
            # (tail P(X>=k) = I_p(k, n-k+1) = delta at the lower endpoint)
            def tail_ge(p):  # P(Bin(n,p) >= k)
                return bb._reg_inc_beta(k, n - k + 1, p) if 0 < p < 1 else (0.0 if p <= 0 else 1.0)

            lo, hi = 0.0, 1.0
            for _ in range(80):
                mid = (lo + hi) / 2
                if tail_ge(mid) < delta:
                    lo = mid
                else:
                    hi = mid
            lb_exact = (lo + hi) / 2

            def tail_le(p):  # P(Bin(n,p) <= k) = 1 - P(>= k+1)
                return 1.0 - (bb._reg_inc_beta(k + 1, n - k, p) if 0 < p < 1 else (0.0 if p <= 0 else 1.0))

            lo, hi = 0.0, 1.0
            for _ in range(80):
                mid = (lo + hi) / 2
                if tail_le(mid) > delta:
                    lo = mid
                else:
                    hi = mid
            ub_exact = (lo + hi) / 2
            assert lb == pytest.approx(lb_exact, abs=5e-3)
            assert ub == pytest.approx(ub_exact, abs=5e-3)
            assert lb <= k / n <= ub


def test_ratio_bounds_shape_and_collapse():
    # f = 1 → exact ratio, no interval
    assert bb.lower_bound_for_b_over_a(100, 40, 1.0) == 0.4
    assert bb.upper_bound_for_b_over_a(100, 40, 1.0) == 0.4
    # interval brackets the estimate and tightens as f -> 1
    lb1 = bb.lower_bound_for_b_over_a(1000, 400, 0.1)
    lb2 = bb.lower_bound_for_b_over_a(1000, 400, 0.9)
    assert lb1 < lb2 < 0.4
    ub1 = bb.upper_bound_for_b_over_a(1000, 400, 0.1)
    ub2 = bb.upper_bound_for_b_over_a(1000, 400, 0.9)
    assert ub1 > ub2 > 0.4
    with pytest.raises(ValueError):
        bb.lower_bound_for_b_over_a(10, 11, 0.5)


def test_sampled_set_ratio_estimators():
    """bounds_on_ratios_in_sampled_sets estimate helpers: b/a with the
    a==0 → 0.5 convention; A,B scale-up by 1/f; f=1 collapses the ratio
    CI to the estimate."""
    from datasketches_cpp_spark import binomial_bounds as bb

    assert bb.estimate_of_b_over_a(200, 50) == 0.25
    assert bb.estimate_of_b_over_a(0, 0) == 0.5
    assert bb.estimate_of_a(100, 0.25) == 400.0
    assert bb.estimate_of_b(30, 0.25) == 120.0
    assert bb.lower_bound_for_b_over_a(200, 50, 1.0) == 0.25
    assert bb.upper_bound_for_b_over_a(200, 50, 1.0) == 0.25
    lb = bb.lower_bound_for_b_over_a(200, 50, 0.1)
    ub = bb.upper_bound_for_b_over_a(200, 50, 0.1)
    assert lb < 0.25 < ub
    import pytest as _pt

    with _pt.raises(ValueError):
        bb.estimate_of_b_over_a(10, 20)
    with _pt.raises(ValueError):
        bb.estimate_of_a(10, 0.0)
