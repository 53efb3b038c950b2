"""Composite-estimator parity against the reference implementation.

tests/interop/gen_hll_composite.cpp (compiled against the read-only
reference) sweeps hll_sketch over every tabled lg_k (4..21) and fill
levels bracketing all estimator regimes — harmonic linear counting,
the crossover window, table-interpolated raw, above-table extrapolation,
and unioned (out-of-order) states — recording each HLL_8 blob plus the
reference's get_composite_estimate() / bounds. Here the engine re-reads
each blob and must reproduce the composite estimate to 1e-12: this pins
the cubic interpolation over the extracted X tables, the
harmonic-number linear-counting branch, the 3K guard, and the measured
crossover constants (HllArray-internal.hpp:367-409), not merely the raw
harmonic-mean estimate.
"""

import json
import math
import os

import numpy as np
import pytest

from datasketches_cpp_spark.functions.hll import (
    _bitmap_estimate,
    _composite_estimate,
    _harmonic_number,
    coupon_bounds,
    coupon_estimate,
    get_rel_err,
)
from datasketches_cpp_spark.functions.hllserde import (
    coupon_count,
    deserialize_hll,
)

FIXDIR = os.path.join(os.path.dirname(__file__), "golden",
                      "refgen_hll_composite")

pytestmark = pytest.mark.skipif(
    not os.path.isfile(os.path.join(FIXDIR, "manifest.jsonl")),
    reason="hll composite fixtures not present",
)


def _manifest() -> list[dict]:
    with open(os.path.join(FIXDIR, "manifest.jsonl")) as f:
        return [json.loads(line) for line in f]


_ROWS = _manifest() if os.path.isfile(
    os.path.join(FIXDIR, "manifest.jsonl")) else []


@pytest.mark.parametrize("row", _ROWS, ids=[r["file"] for r in _ROWS])
def test_composite_estimate_parity(row):
    with open(os.path.join(FIXDIR, row["file"]), "rb") as f:
        blob = f.read()
    cc = coupon_count(blob)
    if cc is not None:
        # coupon LIST/SET regime: the reference answers from the coupon
        # count via the precomputed coupon mapping
        est = coupon_estimate(cc)
    else:
        lg_k, regs = deserialize_hll(blob)
        assert lg_k == row["lgk"]
        est = _composite_estimate(regs)
    assert est == pytest.approx(row["composite"], rel=1e-12, abs=1e-12)


@pytest.mark.parametrize(
    "row", [r for r in _ROWS if r["merged"]],
    ids=[r["file"] for r in _ROWS if r["merged"]],
)
def test_merged_bounds_parity(row):
    """For out-of-order sketches get_estimate() IS the composite estimate
    and the bounds use the non-HIP relErr dispatch — both must match."""
    with open(os.path.join(FIXDIR, row["file"]), "rb") as f:
        blob = f.read()
    lg_k, regs = deserialize_hll(blob)
    est = _composite_estimate(regs)
    assert est == pytest.approx(row["estimate"], rel=1e-12)
    lb = est / (1.0 + get_rel_err(False, True, lg_k, 2))
    ub = est / (1.0 + get_rel_err(True, True, lg_k, 2))
    # reference lower bound floors at numNonZeros
    lb = max(lb, float(np.count_nonzero(regs)))
    assert lb == pytest.approx(row["lb2"], rel=1e-12)
    assert ub == pytest.approx(row["ub2"], rel=1e-12)


def test_harmonic_numbers():
    """Exact table below 25, Euler–Maclaurin expansion above — continuous
    at the seam and correct against direct summation."""
    for n in (1, 2, 24):
        assert _harmonic_number(n) == pytest.approx(
            sum(1.0 / i for i in range(1, n + 1)), rel=1e-15)
    for n in (25, 100, 4096):
        assert _harmonic_number(n) == pytest.approx(
            sum(1.0 / i for i in range(1, n + 1)), rel=1e-13)


def test_bitmap_estimate_matches_log_form():
    """k·(H(k) − H(k−m)) ≈ k·ln(k/(k−m)) for large k (the classic linear
    counting formula) — sanity that the harmonic form is the right scale."""
    k = 1 << 12
    for hit in (10, 100, 1000, 3000):
        est = _bitmap_estimate(k, hit)
        approx = k * math.log(k / (k - hit))
        assert est == pytest.approx(approx, rel=0.01)
        assert est >= hit  # must cover the hit buckets


def test_sparse_regime_returns_linear_counting():
    """A barely-touched register array must answer with the
    harmonic-number linear count, not the raw estimate."""
    lg_k = 12
    k = 1 << lg_k
    regs = np.zeros(k, np.uint8)
    regs[:50] = 1
    est = _composite_estimate(regs)
    assert est == pytest.approx(_bitmap_estimate(k, 50), rel=1e-12)
