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


# ---------------------------------------------------------------------------
# Estimate + kappa-bound parity on REAL reference sketches (HIP and
# merged/ICON regimes), through the engine's own wire reader.
# ---------------------------------------------------------------------------

BFIXDIR = os.path.join(os.path.dirname(__file__), "golden",
                       "refgen_cpc_bounds")
BMANIFEST = os.path.join(BFIXDIR, "manifest.jsonl")


def _brows():
    if not os.path.isfile(BMANIFEST):
        return []
    with open(BMANIFEST) as f:
        return [json.loads(line) for line in f]


_BROWS = _brows()


@pytest.mark.parametrize("row", _BROWS, ids=[r["file"] for r in _BROWS])
def test_cpc_estimate_and_bounds_parity(row):
    from datasketches_cpp_spark.functions.cpc import (
        _HIP_HIGH_SIDE,
        _HIP_LOW_SIDE,
        _hip_rel,
        icon_bounds,
    )
    from datasketches_cpp_spark.functions.cpcserde import deserialize_cpc

    with open(os.path.join(BFIXDIR, row["file"]), "rb") as f:
        d = deserialize_cpc(f.read())
    c, lg = int(d["num_coupons"]), int(d["lg_k"])
    assert lg == row["lgk"]
    if row["merged"]:
        assert not d["has_hip"]
        est = icon_estimate(c, lg)
        assert est == pytest.approx(row["estimate"], rel=1e-12)
        for kappa in (1, 2, 3):
            lb, ub = icon_bounds(c, lg, kappa)
            assert lb == pytest.approx(row[f"lb{kappa}"], rel=1e-12)
            assert ub == pytest.approx(row[f"ub{kappa}"], rel=1e-12)
    else:
        assert d["has_hip"]
        est = float(d["hip_est_accum"])
        assert est == pytest.approx(row["estimate"], rel=1e-12)
        import numpy as np

        for kappa in (1, 2, 3):
            lb = max(
                est / (1.0 + kappa * _hip_rel(lg, kappa, _HIP_HIGH_SIDE)),
                float(c),
            )
            ub = float(np.ceil(
                est / (1.0 - kappa * _hip_rel(lg, kappa, _HIP_LOW_SIDE))
            ))
            assert lb == pytest.approx(row[f"lb{kappa}"], rel=1e-12)
            assert ub == pytest.approx(row[f"ub{kappa}"], rel=1e-12)
