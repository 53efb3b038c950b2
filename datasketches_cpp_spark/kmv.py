"""KMV / theta sketch kernel — pure numpy, no Spark imports.

Re-expresses the reference's theta-sketch semantics
(/root/reference/theta/include/theta_update_sketch_base_impl.hpp:137-143
hash-and-screen, :229-251 rebuild; theta_union_base_impl.hpp:38-81 min-theta
union; theta_intersection_base_impl.hpp:36-110; theta_set_difference_base_impl
.hpp:38-82; theta_jaccard_similarity_base.hpp:55-146) as **whole-batch numpy
array operations**. The per-item open-addressed hash table + amortized
rebuild of the reference is replaced by one ``np.partition`` k-selection per
batch — mathematically identical because KMV state ("the k smallest distinct
hashes, plus theta") is independent of arrival order.

A sketch is an immutable triple ``(k, theta, hashes)``:
  * ``k``      — nominal max retained entries,
  * ``theta``  — uint64 sampling threshold in ``(0, 2**63]``; every retained
                 hash is strictly below it; ``theta == MAX_THETA`` ⇔ exact mode,
  * ``hashes`` — sorted unique uint64 values in ``[0, theta)``.

This is exactly the reference's *compact ordered* form
(theta_sketch_impl.hpp:266-289), which is the only form set ops need.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

MAX_THETA = 1 << 63  # hash domain is [0, 2**63); theta==2**63 means "keep all"
DEFAULT_LG_K = 12


def _as_sorted_unique_u64(hashes) -> np.ndarray:
    arr = np.asarray(hashes, dtype=np.uint64)
    return np.unique(arr)  # sorts + dedupes


@dataclass(frozen=True)
class ThetaSketch:
    k: int
    theta: int  # python int to avoid uint64 overflow traps in comparisons
    hashes: np.ndarray = field(default_factory=lambda: np.empty(0, np.uint64))

    @property
    def is_empty(self) -> bool:
        return self.theta == MAX_THETA and len(self.hashes) == 0

    @property
    def is_estimation_mode(self) -> bool:
        return self.theta < MAX_THETA

    def get_estimate(self) -> float:
        """num_retained / theta_fraction (theta_sketch_impl.hpp:47-49)."""
        return len(self.hashes) / (self.theta / MAX_THETA)

    def get_bounds(self, num_std_devs: int = 2) -> tuple[float, float]:
        """Binomial confidence bounds on the sampled count, exact
        (== estimate) when theta==MAX_THETA — the re-derived
        binomial_bounds regimes (binomial_bounds.py; reference:
        common/include/binomial_bounds.hpp get_lower/upper_bound). Matches
        the reference's bound VALUES in every regime except the
        equivalent-z corner (n ≤ 120 at theta < n/360), validated to
        1e-10 against the reference's own golden-sketch assertions in
        tests/test_golden_sk.py."""
        from . import binomial_bounds as bb

        n = len(self.hashes)
        if not self.is_estimation_mode or n == 0:
            est = self.get_estimate()
            return est, est
        f = self.theta / MAX_THETA
        return bb.lower_bound(n, f, num_std_devs), bb.upper_bound(n, f, num_std_devs)

    def __len__(self) -> int:
        return len(self.hashes)


def empty(k: int = 1 << DEFAULT_LG_K, p: float = 1.0) -> ThetaSketch:
    if not 0.0 < p <= 1.0:
        raise ValueError(f"sampling probability p must be in (0, 1], got {p}")
    return ThetaSketch(k, MAX_THETA if p >= 1.0 else int(p * MAX_THETA))


def from_hashes(
    hashes, k: int = 1 << DEFAULT_LG_K, theta: int = MAX_THETA, p: float = 1.0
) -> ThetaSketch:
    """Build a sketch from a batch of 63-bit hash values: screen < theta,
    dedupe, and if more than k survive do one batch 'rebuild' — theta becomes
    the (k+1)-th smallest (theta_update_sketch_base_impl.hpp:229-251) and the
    k smaller values are retained.

    ``p`` is the reference's up-front sampling probability
    (update_theta_sketch_builder::set_p, theta_update_sketch_base ctor:
    starting theta = p·MAX_THETA): every hash ≥ p·MAX is screened out before
    any rebuild, so the estimate retained/(theta/MAX) stays unbiased while
    the sketch only ever stores a p-fraction of the stream's hash space."""
    if not 0.0 < p <= 1.0:
        raise ValueError(f"sampling probability p must be in (0, 1], got {p}")
    if p < 1.0:
        theta = min(theta, int(p * MAX_THETA))
    arr = _as_sorted_unique_u64(hashes)
    if theta < MAX_THETA:
        arr = arr[: np.searchsorted(arr, np.uint64(theta))]
    if len(arr) > k:
        theta = int(arr[k])  # (k+1)-th smallest (0-indexed k)
        arr = arr[:k]
    return ThetaSketch(k, theta, arr)


def union(sketches, k: int | None = None) -> ThetaSketch:
    """Min-theta merge (theta_union_base_impl.hpp:38-81): theta = min of input
    thetas, retained = union of entries < theta, trimmed back to k via one
    k-selection (the reference's nth_element, :73-78)."""
    sketches = list(sketches)
    if not sketches:
        raise ValueError("union of zero sketches")
    if k is None:
        k = max(s.k for s in sketches)
    theta = min(s.theta for s in sketches)
    merged = np.unique(np.concatenate([s.hashes for s in sketches]))
    merged = merged[: np.searchsorted(merged, np.uint64(theta))]
    if len(merged) > k:
        theta = int(merged[k])
        merged = merged[:k]
    return ThetaSketch(k, theta, merged)


def intersection(a: ThetaSketch, b: ThetaSketch) -> ThetaSketch:
    """Min-theta + key intersection (theta_intersection_base_impl.hpp:36-110).
    The reference hash-joins; on sorted arrays np.intersect1d is the
    sort-merge equivalent."""
    theta = min(a.theta, b.theta)
    if a.is_empty or b.is_empty:
        return ThetaSketch(min(a.k, b.k), theta if (a.is_estimation_mode or b.is_estimation_mode) else MAX_THETA)
    common = np.intersect1d(a.hashes, b.hashes, assume_unique=True)
    common = common[: np.searchsorted(common, np.uint64(theta))]
    return ThetaSketch(min(a.k, b.k), theta, common)


def a_not_b(a: ThetaSketch, b: ThetaSketch) -> ThetaSketch:
    """Set difference (theta_set_difference_base_impl.hpp:38-82): keep A's
    entries below min theta that do not occur in B."""
    theta = min(a.theta, b.theta)
    kept = np.setdiff1d(a.hashes, b.hashes, assume_unique=True)
    kept = kept[: np.searchsorted(kept, np.uint64(theta))]
    return ThetaSketch(a.k, theta, kept)


def jaccard(a: ThetaSketch, b: ThetaSketch, num_std_devs: float = 2.0) -> tuple[float, float, float]:
    """{lower, estimate, upper} bound of J(A,B), following
    theta_jaccard_similarity_base.hpp:55-146: trivial cases first, then an
    effectively-lossless union (adaptive k, :138-146), intersection of
    {a, b, union}, and the reference's ratio bounds: an approximate
    Clopper-Pearson CI on b-over-a with CI width scaled by the sampling
    adjuster √(1−f) (binomial_bounds.lower/upper_bound_for_b_over_a — the
    re-derived bounds_on_ratios_in_sampled_sets.hpp:56-123, A&S-formula
    Clopper-Pearson per bounds_binomial_proportions.hpp)."""
    from . import binomial_bounds as bb

    if a.is_empty and b.is_empty:
        return (1.0, 1.0, 1.0)
    if a.is_empty or b.is_empty:
        return (0.0, 0.0, 0.0)
    theta = min(a.theta, b.theta)
    ha = a.hashes[: np.searchsorted(a.hashes, np.uint64(theta))]
    hb = b.hashes[: np.searchsorted(b.hashes, np.uint64(theta))]
    uni = len(np.union1d(ha, hb))
    if uni == 0:
        return (0.0, 0.0, 0.0)
    inter = len(np.intersect1d(ha, hb, assume_unique=True))
    p = inter / uni
    if theta == MAX_THETA and len(ha) == len(a.hashes) and len(hb) == len(b.hashes):
        return (p, p, p)  # exact mode — identical_sets short-circuit incl.
    f = theta / MAX_THETA
    lb = bb.lower_bound_for_b_over_a(uni, inter, f, num_std_devs)
    ub = bb.upper_bound_for_b_over_a(uni, inter, f, num_std_devs)
    return (lb, p, ub)


def ratio_b_over_a(
    a: ThetaSketch, b: ThetaSketch, num_std_devs: float = 2.0
) -> tuple[float, float, float]:
    """{lower, estimate, upper} bound of |B|/|A| where B is a theta-subset
    of A (typically B = intersection(A, C) for a predicate sketch C) —
    bounds_on_ratios_in_theta_sketched_sets.hpp:50-131 re-derived: A is
    downsampled to B's theta (count of A-keys below theta_b), then the
    Bernoulli-sampled-set ratio CI applies with f = theta_b
    (binomial_bounds.lower/upper_bound_for_b_over_a). Requires
    theta_a >= theta_b, as any intersection-produced B guarantees."""
    from . import binomial_bounds as bb

    if b.theta > a.theta:
        raise ValueError("theta_a must be >= theta_b")
    count_b = len(b.hashes)
    if a.theta == b.theta:
        count_a = len(a.hashes)
    else:
        count_a = int(np.searchsorted(a.hashes, np.uint64(b.theta)))
    f = b.theta / MAX_THETA
    est = 0.5 if count_a == 0 else count_b / count_a
    lb = 0.0 if count_a == 0 else bb.lower_bound_for_b_over_a(
        count_a, count_b, f, num_std_devs
    )
    ub = 1.0 if count_a == 0 else bb.upper_bound_for_b_over_a(
        count_a, count_b, f, num_std_devs
    )
    return (lb, est, ub)


def similarity_test(a: ThetaSketch, b: ThetaSketch, threshold: float) -> bool:
    """J_lb ≥ threshold at ~97.7% confidence
    (theta_jaccard_similarity_base.hpp:109-121)."""
    lb, _, _ = jaccard(a, b)
    return lb >= threshold


def dissimilarity_test(a: ThetaSketch, b: ThetaSketch, threshold: float) -> bool:
    """J_ub ≤ threshold (theta_jaccard_similarity_base.hpp:123-133)."""
    _, _, ub = jaccard(a, b)
    return ub <= threshold


# ---------------------------------------------------------------------------
# Flat-array micro-API for Spark UDFs.
#
# Inside pandas UDFs a sketch travels as (theta:int64, sig:array<int64>) —
# these helpers work on those raw pieces directly so the hot verification
# path allocates no ThetaSketch objects.
# ---------------------------------------------------------------------------


def kmin_signature(hashes: np.ndarray, k: int) -> tuple[int, np.ndarray]:
    """One-shot (theta, sorted-sig) from raw 63-bit hashes; the whole-batch
    analog of the reference's update loop + final compact(ordered=True)."""
    u = np.unique(hashes.astype(np.uint64))
    if len(u) > k:
        return int(u[k]), u[:k]
    return MAX_THETA, u


def merge_signatures(thetas: np.ndarray, sigs: list[np.ndarray], k: int) -> tuple[int, np.ndarray]:
    """Vector form of ``union`` for the two-stage Spark aggregate."""
    theta = int(min((int(t) for t in thetas), default=MAX_THETA))
    if not sigs:
        return MAX_THETA, np.empty(0, np.uint64)
    merged = np.unique(np.concatenate([np.asarray(s, dtype=np.uint64) for s in sigs]))
    merged = merged[: np.searchsorted(merged, np.uint64(theta))]
    if len(merged) > k:
        theta = int(merged[k])
        merged = merged[:k]
    return theta, merged


def estimate(theta: int, num_retained: int) -> float:
    return num_retained / (theta / MAX_THETA)


def jaccard_sig(sig_a: np.ndarray, sig_b: np.ndarray, theta_a: int = MAX_THETA, theta_b: int = MAX_THETA) -> float:
    """Point Jaccard estimate on two sorted signature arrays — the S7
    verification kernel (reference math of §3.3, batch-applied)."""
    theta = min(theta_a, theta_b)
    a = sig_a[: np.searchsorted(sig_a, np.uint64(theta))]
    b = sig_b[: np.searchsorted(sig_b, np.uint64(theta))]
    u = len(np.union1d(a, b))
    if u == 0:
        return 1.0
    return len(np.intersect1d(a, b, assume_unique=True)) / u
