"""Binomial confidence bounds for theta-sampled counts — a re-derivation
of the reference's bounds semantics (common/include/binomial_bounds.hpp,
Saydakov/Rhodes/Lang), NOT a port of its code or its 726-entry
equivalence tables.

The statistical object: having retained ``n`` samples at sampling rate
``theta``, bound the unseen population count at 1/2/3 "standard
deviations" (delta = one-sided normal tail mass: 0.1587 / 0.02275 /
0.00135). Regimes, matching the reference's dispatch:

* ``theta == 1``                exact: bound = n.
* ``n == 0`` / ``n == 1``       closed-form geometric-tail logs.
* ``n > 120``                   Gaussian approximation to the binomial
                                WITH continuity correction (the
                                ``cont_classic_*`` closed forms) — at
                                these sample counts the approximation
                                error is far below the interval width.
                                This regime covers every estimation-mode
                                sketch with k > 120, i.e. all practical
                                theta sketch configurations.
* ``2 ≤ n ≤ 120``:
    - ``theta > 1 - 1e-5``      degenerate: n (lb) / n+1 (ub);
    - ``n/360 ≤ theta``         EXACT Bayesian bound: the posterior tail
                                sum Σ_m C(m,n)·θⁿ·(1-θ)^(m-n) inverted by
                                direct accumulation (estimate ≤ 360 keeps
                                the loop short) — same definition the
                                reference's special_n_star/n_prime use;
    - ``theta < n/360``         EXACT Bayesian bound again, but via the
                                closed-form tail P(Bin(M,θ) ≥ n) =
                                I_θ(n, M−n+1) (regularized incomplete
                                beta, Lentz continued fraction) bisected
                                over M — O(log est) instead of the
                                direct sum's O(est). The reference
                                approximates this regime with
                                pre-computed equivalent-z tables
                                (lb/ub_equiv_table); this engine computes
                                the quantity those tables approximate, so
                                any divergence from the reference here is
                                the reference's own table error
                                (quantified ≤ a few ulps of an edge in
                                tests/test_binomial_bounds.py).

All bounds are clamped exactly like the reference's public entry points:
lb → min(estimate, max(n, raw)), ub → max(estimate, raw).
"""

from __future__ import annotations

import math

#: one-sided normal tail mass at 1/2/3 standard deviations
DELTA_OF_NUM_STD_DEVS = (
    0.5,  # unused placeholder for index 0
    0.1586553191586026479,
    0.0227502618904135701,
    0.0013498126861731796,
)


def _check(theta: float, num_std_devs: int) -> None:
    if not (0.0 < theta <= 1.0):
        raise ValueError("theta must be in (0, 1]")
    if num_std_devs not in (1, 2, 3):
        raise ValueError("num_std_devs must be 1, 2 or 3")


def _cont_classic_lb(n: float, theta: float, z: float) -> float:
    """Gaussian binomial bound with continuity correction (lower)."""
    n_hat = (n - 0.5) / theta
    b = z * math.sqrt((1.0 - theta) / theta)
    d = 0.5 * b * math.sqrt(b * b + 4.0 * n_hat)
    return n_hat + 0.5 * b * b - d


def _cont_classic_ub(n: float, theta: float, z: float) -> float:
    n_hat = (n + 0.5) / theta
    b = z * math.sqrt((1.0 - theta) / theta)
    d = 0.5 * b * math.sqrt(b * b + 4.0 * n_hat)
    return n_hat + 0.5 * b * b + d


def _posterior_tail_m(n: int, theta: float, target: float, strict: bool) -> int:
    """Smallest M with Σ_{m=n}^{M} C(m,n)·θⁿ·(1-θ)^{m-n} reaching
    ``target`` (> target when strict, ≥ otherwise). Terms follow the
    recurrence t(m+1) = t(m)·(1-θ)·m/(m+1-n) from t(n) = θⁿ. Only called
    with estimate ≤ 500, so the loop is short and θⁿ ≥ (n/360)ⁿ keeps the
    seed term well inside double range."""
    q = 1.0 - theta
    cur = theta ** n
    if cur <= 1e-100:
        raise OverflowError("posterior seed underflow — regime guard violated")
    tot = cur
    m = n
    while (tot <= target) if strict else (tot < target):
        cur = cur * q * m / (m + 1 - n)
        tot += cur
        m += 1
    return m


def _log_beta(a: float, b: float) -> float:
    return math.lgamma(a) + math.lgamma(b) - math.lgamma(a + b)


def _betacf(a: float, b: float, x: float) -> float:
    """Continued fraction for the incomplete beta (modified Lentz)."""
    tiny = 1e-30
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < tiny:
        d = tiny
    d = 1.0 / d
    h = d
    for m in range(1, 300):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < tiny:
            d = tiny
        c = 1.0 + aa / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < tiny:
            d = tiny
        c = 1.0 + aa / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < 1e-14:
            return h
    return h  # converged to working precision in practice


def _reg_inc_beta(a: float, b: float, x: float) -> float:
    """I_x(a, b), the regularized incomplete beta function."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_front = a * math.log(x) + b * math.log1p(-x) - _log_beta(a, b)
    front = math.exp(ln_front)
    if x < (a + 1.0) / (a + b + 2.0):
        return front * _betacf(a, b, x) / a
    return 1.0 - front * _betacf(b, a, 1.0 - x) / b


def _binom_tail_ge(n: int, theta: float, M: int) -> float:
    """P(Binomial(M, θ) ≥ n) = I_θ(n, M − n + 1) — equals the posterior
    tail Σ_{m=n}^{M} C(m−1,n−1)·θⁿ·(1−θ)^{m−n} (negative-binomial CDF)."""
    if M < n:
        return 0.0
    return _reg_inc_beta(float(n), float(M - n + 1), theta)


def _exact_tail_m_bisect(n: int, theta: float, target: float, strict: bool) -> int:
    """Same contract as _posterior_tail_m but O(log est): smallest M whose
    tail reaches target. Monotone in M, so bisection is exact."""
    lo = n
    hi = max(n + 1, int(2.0 * n / theta) + 64)
    while _binom_tail_ge(n, theta, hi) <= target if strict else _binom_tail_ge(n, theta, hi) < target:
        lo = hi
        hi *= 2
    while lo < hi:
        mid = (lo + hi) // 2
        t = _binom_tail_ge(n, theta, mid)
        if (t <= target) if strict else (t < target):
            lo = mid + 1
        else:
            hi = mid
    return lo


def _approx_lb(n: int, theta: float, nsd: int) -> float:
    if theta == 1.0:
        return float(n)
    if n == 0:
        return 0.0
    if n == 1:
        delta = DELTA_OF_NUM_STD_DEVS[nsd]
        return math.floor(math.log(1.0 - delta) / math.log(1.0 - theta))
    if n > 120:
        return _cont_classic_lb(n, theta, float(nsd)) - 0.5
    if theta > 1.0 - 1e-5:
        return float(n)
    delta = DELTA_OF_NUM_STD_DEVS[nsd]
    if theta < n / 360.0:
        # exact bound via closed-form tail + bisection (the regime the
        # reference approximates with its equivalent-z tables)
        return float(_exact_tail_m_bisect(n, theta, delta, strict=True) - 1)
    # n_star: largest M whose tail stays ≤ delta = (first M exceeding) - 1
    return float(_posterior_tail_m(n, theta, delta, strict=True) - 1)


def _approx_ub(n: int, theta: float, nsd: int) -> float:
    if theta == 1.0:
        return float(n)
    if n == 0:
        delta = DELTA_OF_NUM_STD_DEVS[nsd]
        return math.ceil(math.log(delta) / math.log(1.0 - theta))
    if n > 120:
        return _cont_classic_ub(n, theta, float(nsd)) + 0.5
    if theta > 1.0 - 1e-5:
        return float(n + 1)
    delta = DELTA_OF_NUM_STD_DEVS[nsd]
    if theta < n / 360.0:
        return float(_exact_tail_m_bisect(n + 1, theta, 1.0 - delta, strict=False))
    # n_prime_f(n) = n_prime_b(n+1): first M whose tail reaches 1 - delta
    return float(_posterior_tail_m(n + 1, theta, 1.0 - delta, strict=False))


# ---------------------------------------------------------------------------
# Binomial-proportion bounds (approximate Clopper-Pearson) and ratio bounds
# for sampled sets — the machinery behind jaccard CIs
# (common/include/bounds_binomial_proportions.hpp,
#  theta/include/bounds_on_ratios_in_sampled_sets.hpp), re-derived from the
# PUBLISHED formulas those headers cite: erf via Abramowitz & Stegun 7.1.28,
# inverse incomplete beta via A&S 26.5.22.
# ---------------------------------------------------------------------------

# A&S 7.1.28 coefficients (public-domain handbook values)
_ERF_A = (0.0705230784, 0.0422820123, 0.0092705272,
          0.0001520143, 0.0002765672, 0.0000430638)


def erf_approx(x: float) -> float:
    """erf to ~7 decimal digits (A&S 7.1.28: (1+Σ a_i x^i)^-16 form)."""
    if x < 0.0:
        return -erf_approx(-x)
    s = 1.0
    xp = 1.0
    for a in _ERF_A:
        xp *= x
        s += a * xp
    s2 = s * s
    s4 = s2 * s2
    s8 = s4 * s4
    return 1.0 - 1.0 / (s8 * s8)


def normal_cdf(x: float) -> float:
    return 0.5 * (1.0 + erf_approx(x / math.sqrt(2.0)))


def _delta_of_num_stdevs(kappa: float) -> float:
    return normal_cdf(-kappa)


def _as_26_5_22(a: float, b: float, yp: float) -> float:
    """A&S 26.5.22: approximate x solving I_x(a, b) = delta, with delta
    given through yp = #stddevs leaving delta in the right normal tail."""
    b2m1 = 2.0 * b - 1.0
    a2m1 = 2.0 * a - 1.0
    lam = (yp * yp - 3.0) / 6.0
    h = 2.0 / (1.0 / a2m1 + 1.0 / b2m1)
    w = (yp * math.sqrt(h + lam)) / h - (1.0 / b2m1 - 1.0 / a2m1) * (
        lam + 5.0 / 6.0 - 2.0 / (3.0 * h)
    )
    return a / (a + b * math.exp(2.0 * w))


def approximate_lower_bound_on_p(n: int, k: int, num_std_devs: float) -> float:
    """Approximate Clopper-Pearson lower bound on a binomial proportion."""
    if k > n:
        raise ValueError("k cannot exceed n")
    if n == 0 or k == 0:
        return 0.0
    if k == 1:
        return 1.0 - (1.0 - _delta_of_num_stdevs(num_std_devs)) ** (1.0 / n)
    if k == n:
        return _delta_of_num_stdevs(num_std_devs) ** (1.0 / n)
    return 1.0 - _as_26_5_22((n - k) + 1.0, float(k), -num_std_devs)


def approximate_upper_bound_on_p(n: int, k: int, num_std_devs: float) -> float:
    if k > n:
        raise ValueError("k cannot exceed n")
    if n == 0 or k == n:
        return 1.0
    if k == n - 1:
        return (1.0 - _delta_of_num_stdevs(num_std_devs)) ** (1.0 / n)
    if k == 0:
        return 1.0 - _delta_of_num_stdevs(num_std_devs) ** (1.0 / n)
    return 1.0 - _as_26_5_22(float(n - k), k + 1.0, num_std_devs)


def _sampling_adjuster(f: float) -> float:
    """CI width shrinkage for Bernoulli-sampled sets: √(1−f), with the
    reference's empirical +0.01·(f−0.5) correction above f=0.5
    (bounds_on_ratios_in_sampled_sets.hpp hacky_adjuster)."""
    t = math.sqrt(1.0 - f)
    return t if f <= 0.5 else t + 0.01 * (f - 0.5)


def lower_bound_for_b_over_a(a: int, b: int, f: float, num_std_devs: float = 2.0) -> float:
    """Lower bound on |B|/|A| from a Bernoulli(f) sample of A containing
    ``a`` items, ``b`` of which are in B."""
    if b > a:
        raise ValueError("a must be >= b")
    if not (0.0 < f <= 1.0):
        raise ValueError("f must be in (0, 1]")
    if a == 0:
        return 0.0
    if f == 1.0:
        return b / a
    return approximate_lower_bound_on_p(a, b, num_std_devs * _sampling_adjuster(f))


def upper_bound_for_b_over_a(a: int, b: int, f: float, num_std_devs: float = 2.0) -> float:
    if b > a:
        raise ValueError("a must be >= b")
    if not (0.0 < f <= 1.0):
        raise ValueError("f must be in (0, 1]")
    if a == 0:
        return 1.0
    if f == 1.0:
        return b / a
    return approximate_upper_bound_on_p(a, b, num_std_devs * _sampling_adjuster(f))


def lower_bound(num_samples: int, theta: float, num_std_devs: int = 2) -> float:
    """Frequentist lower bound on the population count; matches the
    reference's binomial_bounds::get_lower_bound in every regime except
    the small-n equivalent-z corner (module docstring)."""
    _check(theta, num_std_devs)
    estimate = num_samples / theta
    raw = _approx_lb(int(num_samples), float(theta), int(num_std_devs))
    return min(estimate, max(float(num_samples), raw))


def upper_bound(num_samples: int, theta: float, num_std_devs: int = 2) -> float:
    _check(theta, num_std_devs)
    estimate = num_samples / theta
    raw = _approx_ub(int(num_samples), float(theta), int(num_std_devs))
    return max(estimate, raw)


def estimate_of_b_over_a(a: int, b: int) -> float:
    """Point estimate of |B|/|A| from the sample (reference
    bounds_on_ratios_in_sampled_sets::get_estimate_of_b_over_a —
    including its a == 0 → 0.5 'know nothing' convention)."""
    if b > a:
        raise ValueError("a must be >= b")
    if a == 0:
        return 0.5
    return b / a


def estimate_of_a(a: int, f: float) -> float:
    """Estimate of |A| from a Bernoulli(f) sample of observed size a."""
    if not (0.0 < f <= 1.0):
        raise ValueError("f must be in (0, 1]")
    return a / f


def estimate_of_b(b: int, f: float) -> float:
    """Estimate of |B| from a Bernoulli(f) sample containing b B-items."""
    if not (0.0 < f <= 1.0):
        raise ValueError("f must be in (0, 1]")
    return b / f
