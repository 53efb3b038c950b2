"""HIP estimator for stream-built HLL (reference HllArray HIP accumulator,
HllArray-internal.hpp:545-553 hipAndKxQIncrementalUpdate; getEstimate
:322-327 uses HIP unless out-of-order; RSE factors HllUtil.hpp:85-86).

The contracts mirrored from the reference's HllSketchTest streaming
sections:
  - a never-merged stream reports the HIP estimate, whose error envelope
    is the TIGHTER 0.8325546/√K (vs 1.03896/√K composite);
  - any merge sets the out-of-order flag: estimate falls back to the
    composite path and the wider envelope — exactly the union rule;
  - low range: HIP tracks the exact count almost perfectly (each state
    change adds ~1/p with p≈1 while registers are mostly empty);
  - kxq bookkeeping: kxq0+kxq1 == Σ 2^-reg at all times.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from datasketches_cpp_spark.functions.hll import (
    HLL_HIP_RSE_FACTOR,
    HLL_NON_HIP_RSE_FACTOR,
    HllState,
    _composite_estimate,
    hll_stream_agg,
)
from datasketches_cpp_spark.hashing import hash63_int64


def _hashes(n: int, seed: int) -> np.ndarray:
    return hash63_int64(np.arange(n, dtype=np.int64) + seed * 1_000_003, seed=9001)


def test_hip_low_range_is_nearly_exact():
    st = HllState(lg_k=12)
    n = 500
    st.update_hashes(_hashes(n, seed=1))
    # low range: HIP error stays inside 3σ_HIP of the exact count even
    # though slot collisions already occur (n/k ≈ 0.12)
    sigma = HLL_HIP_RSE_FACTOR / math.sqrt(1 << 12) * n
    assert abs(st.get_estimate() - n) <= 3 * sigma
    assert not st.ooo
    # truly sparse regime (n << k): every item raises a fresh register and
    # HIP is the exact count to float precision drift
    st2 = HllState(lg_k=12)
    st2.update_hashes(_hashes(20, seed=1))
    assert abs(st2.get_estimate() - 20) < 0.1


def test_hip_ignores_duplicates():
    st = HllState(lg_k=10)
    h = _hashes(2000, seed=2)
    st.update_hashes(np.concatenate([h, h, h]))
    st2 = HllState(lg_k=10)
    st2.update_hashes(h)
    assert st.get_estimate() == st2.get_estimate()
    assert st.hip == st2.hip and st.kxq0 == st2.kxq0 and st.kxq1 == st2.kxq1


def test_kxq_invariant_tracks_registers():
    st = HllState(lg_k=8)
    st.update_hashes(_hashes(50_000, seed=3))
    expect = float(np.exp2(-st.regs.astype(np.float64)).sum())
    assert math.isclose(st.kxq0 + st.kxq1, expect, rel_tol=1e-12)


def test_hip_envelope_tighter_and_calibrated():
    """Across independent universes, HIP errors must sit inside the 3σ HIP
    envelope — and their spread must be visibly tighter than the composite
    envelope would require (the whole point of HIP)."""
    lg_k, n = 10, 60_000
    k = 1 << lg_k
    errs = []
    for seed in range(12):
        st = HllState(lg_k)
        st.update_hashes(_hashes(n, seed=seed))
        assert not st.ooo
        errs.append((st.get_estimate() - n) / n)
        lb, ub = st.get_bounds(3)
        assert lb <= n <= ub, f"seed {seed}: {lb} !<= {n} !<= {ub}"
    hip_sigma = HLL_HIP_RSE_FACTOR / math.sqrt(k)
    assert max(abs(e) for e in errs) <= 3 * hip_sigma
    # empirical RMS within 2x of the HIP RSE (loose, 12 trials)
    rms = math.sqrt(sum(e * e for e in errs) / len(errs))
    assert rms <= 2 * hip_sigma


def test_merge_forfeits_hip_and_widens_bounds():
    a, b = HllState(lg_k=10), HllState(lg_k=10)
    a.update_hashes(_hashes(30_000, seed=21))
    b.update_hashes(_hashes(30_000, seed=22))
    hip_lb, hip_ub = a.get_bounds(3)
    a.merge_registers(b.regs)
    assert a.ooo
    assert a.get_estimate() == _composite_estimate(a.regs)
    # kxq rebuilt from merged registers
    expect = float(np.exp2(-a.regs.astype(np.float64)).sum())
    assert math.isclose(a.kxq0 + a.kxq1, expect, rel_tol=1e-12)
    # wider envelope after merge (relative width vs estimate)
    lb, ub = a.get_bounds(3)
    est = a.get_estimate()
    hip_width = (hip_ub - hip_lb) / (30_000)
    ooo_width = (ub - lb) / est
    assert ooo_width > hip_width
    # post-merge updates keep composite (hip stays frozen)
    frozen = a.hip
    a.update_hashes(_hashes(1000, seed=23))
    assert a.hip == frozen


def test_lower_bound_floored_at_nonzero_registers():
    st = HllState(lg_k=12)
    st.update_hashes(_hashes(40, seed=5))
    lb, _ = st.get_bounds(3)
    assert lb >= float(np.count_nonzero(st.regs))


def test_hip_rse_factors_match_reference_constants():
    assert HLL_HIP_RSE_FACTOR == pytest.approx(math.sqrt(math.log(2.0)), abs=1e-7)
    assert HLL_NON_HIP_RSE_FACTOR == pytest.approx(
        math.sqrt(3 * math.log(2.0) - 1.0), abs=1e-5
    )


def test_hll_stream_agg_layout_invariant_and_covered(spark):
    rows = [(i % 7, f"item_{i % 5000}") for i in range(20_000)]
    df1 = spark.createDataFrame(rows, "g int, item string").repartition(1)
    df2 = spark.createDataFrame(rows[::-1], "g int, item string").repartition(16)
    a = {
        r["g"]: (r["estimate"], r["lower_bound"], r["upper_bound"])
        for r in hll_stream_agg(df1, ["g"], "item", lg_k=11, num_std_devs=3).collect()
    }
    b = {
        r["g"]: (r["estimate"], r["lower_bound"], r["upper_bound"])
        for r in hll_stream_agg(df2, ["g"], "item", lg_k=11, num_std_devs=3).collect()
    }
    assert a == b  # canonical stream order -> bit-identical across layouts
    exact = {}
    for g, item in rows:
        exact.setdefault(g, set()).add(item)
    for g, (est, lb, ub) in a.items():
        assert lb <= len(exact[g]) <= ub


def test_rel_err_table_dispatch_matches_reference_constants():
    """getRelErr parity: lg_k <= 12 reads the reference's empirical
    RelativeErrorTables (spot-checked against the published values);
    lg_k > 12 uses the analytic factors with the UB sign flip."""
    from datasketches_cpp_spark.functions.hll import get_rel_err

    # HIP LB lg_k=12 sd=3 / NON_HIP UB lg_k=4 sd=1 (table corners)
    assert get_rel_err(False, False, 12, 3) == 0.039387631
    assert get_rel_err(True, True, 4, 1) == -0.256980172
    assert get_rel_err(False, True, 10, 2) == 0.067009668
    # analytic regime
    k = 1 << 14
    assert get_rel_err(False, True, 14, 2) == pytest.approx(
        2 * HLL_NON_HIP_RSE_FACTOR / math.sqrt(k)
    )
    assert get_rel_err(True, False, 14, 1) == pytest.approx(
        -HLL_HIP_RSE_FACTOR / math.sqrt(k)
    )
    with pytest.raises(ValueError, match="num_std_devs"):
        get_rel_err(False, False, 12, 4)


def test_table_bounds_still_cover_and_tighten():
    """Table-driven bounds (lg_k <= 12) keep coverage on real streams and
    the HIP table interval is tighter than the non-HIP one."""
    from datasketches_cpp_spark.functions.hll import get_rel_err

    n = 40_000
    st = HllState(lg_k=10)
    st.update_hashes(_hashes(n, seed=77))
    lb, ub = st.get_bounds(3)
    assert lb <= n <= ub
    hip_w = get_rel_err(False, False, 10, 3) - get_rel_err(True, False, 10, 3)
    ooo_w = get_rel_err(False, True, 10, 3) - get_rel_err(True, True, 10, 3)
    assert hip_w < ooo_w
