"""CPC ICON-estimator parity against the reference implementation.

tests/interop/gen_cpc_icon.cpp sweeps the reference's
compute_icon_estimate (icon_estimator.hpp) across every tabled lg_k and
coupon counts in both regimes; the engine's icon_estimate must
reproduce each value to 1e-12. Also pins the relationship the
polynomials approximate: the exact E[C]-inversion and ICON agree within
the sketch's own error envelope in the polynomial regime.
"""

import json
import os

import pytest

from datasketches_cpp_spark.functions.cpc import (
    _invert_expected_coupons,
    icon_estimate,
    invert_coupons,
)

FIXDIR = os.path.join(os.path.dirname(__file__), "golden", "refgen_cpc_icon")
MANIFEST = os.path.join(FIXDIR, "manifest.jsonl")

pytestmark = pytest.mark.skipif(
    not os.path.isfile(MANIFEST), reason="cpc icon fixtures not present"
)


def _rows():
    with open(MANIFEST) as f:
        return [json.loads(line) for line in f]


_ROWS = _rows() if os.path.isfile(MANIFEST) else []


@pytest.mark.parametrize(
    "row", _ROWS, ids=[f"lgk{r['lgk']}_c{r['c']}" for r in _ROWS]
)
def test_icon_parity(row):
    est = icon_estimate(row["c"], row["lgk"])
    assert est == pytest.approx(row["icon"], rel=1e-12, abs=1e-12)


def test_invert_coupons_is_icon():
    assert invert_coupons(5000, 11) == icon_estimate(5000, 11)


def test_icon_vs_exact_inversion_envelope():
    """The polynomial approximates the exact E[C] inversion: within
    ~1% everywhere in the polynomial regime (the reference's own
    validation procedure's contract)."""
    for lg_k in (8, 11, 14):
        k = 1 << lg_k
        for c in (k // 2, k, 2 * k, 4 * k, 5 * k):
            exact = _invert_expected_coupons(c, lg_k)
            approx = icon_estimate(c, lg_k)
            assert approx == pytest.approx(exact, rel=0.01)


def test_untabled_lg_k_falls_back():
    # lg_k 27 has no polynomial row; the exact inversion answers
    est = icon_estimate(1 << 27, 27)
    assert est == _invert_expected_coupons(1 << 27, 27)
    assert est > 0
