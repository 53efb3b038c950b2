"""Cross-language wire parity against the reference's OWN golden binaries.

Every other serde test in this repo proves round-trip isomorphism (our
writer ↔ our reader). These tests close the loop the reference closes with
its *_deserialize_from_java / compatibility tests: deserialize the exact
`.sk` byte streams shipped in /root/reference/*/test/ — produced by
datasketches-java (theta v1/v2), old Java quantiles releases
(Qk128_* v0.3.0–v0.8.3), the original t-digest reference implementation
(tdigest_ref_*), and datasketches C++ v1 (kll float) — and assert the SAME
values the reference's tests assert:

  theta      theta_sketch_test.cpp:171-258 (empty v1/v2; estimation v1/v2:
             retained 4342, theta 0.531700444213199, estimate
             8166.25234614053, bounds 7996.96/8339.09)
  quantiles  quantiles_compatibility_test.cpp:73-120 (median 25 @ n=50,
             497 @ n=1000, all four format vintages)
  tdigest    tdigest_test.cpp:414-445 (weight 10000, min 0, max 9999,
             quartile ranks within 1e-4)
  kll float  kll_sketch_test.cpp:316-328 (one item v1: n=1, retained=1,
             min=max=1.0)

The goldens are read as opaque public test vectors; no reference code is
executed or copied.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pytest

from datasketches_cpp_spark import kmv
from datasketches_cpp_spark.functions.classicserde import (
    deserialize_classic,
    serialize_classic,
)
from datasketches_cpp_spark.functions.kllserde import deserialize_kll, serialize_kll
from datasketches_cpp_spark.functions.tdigestserde import (
    deserialize_tdigest,
    serialize_tdigest,
)
from datasketches_cpp_spark.functions.thetaserde import (
    deserialize_compact,
    serialize_compact_v3,
    serialize_compressed,
)
from datasketches_cpp_spark.kmv import MAX_THETA

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference repo not present"
)


def _read(path: str) -> bytes:
    with open(path, "rb") as f:
        return f.read()


# ---------------------------------------------------------------------------
# theta v1/v2 (theta/test/theta_compact_*_from_java_v{1,2}.sk)
# ---------------------------------------------------------------------------

THETA_DIR = os.path.join(REF, "theta", "test")


@pytest.mark.parametrize("version", [1, 2])
def test_theta_golden_empty(version):
    buf = _read(os.path.join(THETA_DIR, f"theta_compact_empty_from_java_v{version}.sk"))
    theta, sig = deserialize_compact(buf)
    assert theta == -1  # exact mode, theta == MAX_THETA
    assert len(sig) == 0


@pytest.mark.parametrize("version", [1, 2])
def test_theta_golden_estimation(version):
    buf = _read(
        os.path.join(THETA_DIR, f"theta_compact_estimation_from_java_v{version}.sk")
    )
    theta, sig = deserialize_compact(buf)
    # theta_sketch_test.cpp:206-210 asserted values
    assert len(sig) == 4342
    assert theta / MAX_THETA == pytest.approx(0.531700444213199, abs=1e-10)
    assert kmv.estimate(theta, len(sig)) == pytest.approx(8166.25234614053, abs=1e-8)
    entries = np.asarray(sig, np.int64).view(np.uint64)
    assert (entries < np.uint64(theta)).all()
    assert (entries[:-1] < entries[1:]).all()  # sorted, no duplicates


def test_theta_golden_v1_v2_identical_entries():
    """The two goldens encode the SAME Java sketch in two formats."""
    t1, s1 = deserialize_compact(
        _read(os.path.join(THETA_DIR, "theta_compact_estimation_from_java_v1.sk"))
    )
    t2, s2 = deserialize_compact(
        _read(os.path.join(THETA_DIR, "theta_compact_estimation_from_java_v2.sk"))
    )
    assert t1 == t2
    np.testing.assert_array_equal(s1, s2)


def test_theta_golden_bounds_vs_reference_values():
    """EXACT bound parity on the golden sketch: the reference asserts
    lb2=7996.956955317471 / ub2=8339.090301078124 to 1e-10
    (theta_sketch_test.cpp:209-210). n=4342 > 120 lands in the
    continuity-corrected Gaussian regime, which binomial_bounds.py
    re-derives in closed form — the values must agree to the same 1e-10
    the reference's own test uses."""
    theta, sig = deserialize_compact(
        _read(os.path.join(THETA_DIR, "theta_compact_estimation_from_java_v1.sk"))
    )
    sk = kmv.from_hashes(np.asarray(sig, np.int64), k=1 << 30, theta=theta)
    lb, ub = sk.get_bounds(2)
    assert lb == pytest.approx(7996.956955317471, abs=1e-10)
    assert ub == pytest.approx(8339.090301078124, abs=1e-10)


def test_theta_golden_reserialize_roundtrip():
    """Legacy stream → engine state → modern v3/v4 stream → same state."""
    theta, sig = deserialize_compact(
        _read(os.path.join(THETA_DIR, "theta_compact_estimation_from_java_v1.sk"))
    )
    for writer in (serialize_compact_v3, serialize_compressed):
        t2, s2 = deserialize_compact(writer(theta, sig))
        assert t2 == theta
        np.testing.assert_array_equal(s2, sig)


# ---------------------------------------------------------------------------
# classic quantiles family 8 (quantiles/test/Qk128_n{50,1000}_v*.sk)
# ---------------------------------------------------------------------------

Q_DIR = os.path.join(REF, "quantiles", "test")
Q_CASES = [  # quantiles_compatibility_test.cpp:75-120
    ("Qk128_n50_v0.3.0.sk", 50, 25.0),
    ("Qk128_n1000_v0.3.0.sk", 1000, 497.0),
    ("Qk128_n50_v0.6.0.sk", 50, 25.0),
    ("Qk128_n1000_v0.6.0.sk", 1000, 497.0),
    ("Qk128_n50_v0.8.0.sk", 50, 25.0),
    ("Qk128_n1000_v0.8.0.sk", 1000, 497.0),
    ("Qk128_n50_v0.8.3.sk", 50, 25.0),
    ("Qk128_n1000_v0.8.3.sk", 1000, 497.0),
]


@pytest.mark.parametrize("fname,n,expected_median", Q_CASES)
def test_classic_quantiles_golden(fname, n, expected_median):
    sk = deserialize_classic(_read(os.path.join(Q_DIR, fname)))
    assert sk.k == 128
    assert sk.n == n
    assert sk.min_item == 1.0
    assert sk.max_item == float(n)
    assert sk.get_quantile(0.5) == expected_median  # exact, like the reference
    # structural law: retained == bb + k * popcount(n // 2k)
    retained = len(sk.base) + sum(len(l) for l in sk.levels if l is not None)
    assert retained == n % 256 + 128 * bin(n // 256).count("1")


@pytest.mark.parametrize("fname,n,expected_median", Q_CASES)
def test_classic_quantiles_golden_reserialize(fname, n, expected_median):
    """Old-vintage stream → engine state → v3 stream → identical queries."""
    sk = deserialize_classic(_read(os.path.join(Q_DIR, fname)))
    sk2 = deserialize_classic(serialize_classic(sk))
    assert sk2.n == sk.n
    assert sk2.get_quantile(0.5) == expected_median
    for r in (0.01, 0.25, 0.75, 0.99):
        assert sk2.get_quantile(r) == sk.get_quantile(r)
    for v in (1.0, n / 2, float(n)):
        assert sk2.get_rank(v) == sk.get_rank(v)


def test_classic_quantiles_golden_merge():
    """A deserialized golden must be mergeable with a native sketch and
    keep n accounting exact (the associativity the Spark agg relies on)."""
    sk = deserialize_classic(_read(os.path.join(Q_DIR, "Qk128_n1000_v0.8.3.sk")))
    from datasketches_cpp_spark.functions.classic_quantiles import (
        ClassicQuantilesSketch,
    )

    other = ClassicQuantilesSketch(128, seed=7)
    other.update_batch(np.arange(1001.0, 1501.0))
    sk.merge(other)
    assert sk.n == 1500
    assert sk.min_item == 1.0
    assert sk.max_item == 1500.0
    med = sk.get_quantile(0.5)
    eps = ClassicQuantilesSketch.normalized_rank_error(128)
    assert abs(med - 750.0) <= eps * 1500 * 2 + 1


# ---------------------------------------------------------------------------
# t-digest compat (tdigest/test/tdigest_ref_k100_n10000_{double,float}.sk)
# ---------------------------------------------------------------------------

TD_DIR = os.path.join(REF, "tdigest", "test")


@pytest.mark.parametrize("fname", [
    "tdigest_ref_k100_n10000_double.sk",
    "tdigest_ref_k100_n10000_float.sk",
])
def test_tdigest_golden(fname):
    td = deserialize_tdigest(_read(os.path.join(TD_DIR, fname)))
    n = 10000
    # tdigest_test.cpp:419-427 asserted values
    assert td.n == n
    assert td.min == 0.0
    assert td.max == float(n - 1)
    assert td.get_rank(0) == pytest.approx(0.0, abs=0.0001)
    assert td.get_rank(n / 4) == pytest.approx(0.25, abs=0.0001)
    assert td.get_rank(n / 2) == pytest.approx(0.5, abs=0.0001)
    assert td.get_rank(n * 3 / 4) == pytest.approx(0.75, abs=0.0001)
    assert td.get_rank(n) == 1.0


def test_tdigest_golden_reserialize():
    """Compat stream → engine state → modern (type-20) stream → same
    centroids and queries."""
    td = deserialize_tdigest(
        _read(os.path.join(TD_DIR, "tdigest_ref_k100_n10000_double.sk"))
    )
    td2 = deserialize_tdigest(serialize_tdigest(td))
    assert td2.n == td.n
    np.testing.assert_array_equal(td2.means, td.means)
    np.testing.assert_array_equal(td2.weights, td.weights)
    assert td2.get_quantile(0.99) == td.get_quantile(0.99)


# ---------------------------------------------------------------------------
# KLL float v1 (kll/test/kll_sketch_float_one_item_v1.sk)
# ---------------------------------------------------------------------------


def test_kll_float_golden_one_item():
    sk = deserialize_kll(
        _read(os.path.join(REF, "kll", "test", "kll_sketch_float_one_item_v1.sk")),
        item_dtype="<f4",
    )
    # kll_sketch_test.cpp:320-327 asserted values
    assert sk.n == 1
    assert sum(len(l) for l in sk.levels) == 1
    assert sk.min_item == 1.0
    assert sk.max_item == 1.0
    assert not sk.is_estimation_mode()
    assert sk.get_quantile(0.5) == 1.0


def test_kll_float_roundtrip_many_items():
    """Float item type is a first-class write path too: float32 wire
    round-trip preserves every retained item exactly."""
    from datasketches_cpp_spark.functions.quantiles import KllSketch

    sk = KllSketch(200, seed=3)
    sk.update_batch(np.arange(5000, dtype=np.float64))
    buf = serialize_kll(sk, item_dtype="<f4")
    sk2 = deserialize_kll(buf, item_dtype="<f4")
    assert sk2.n == sk.n
    # every value here is exactly representable in float32
    np.testing.assert_array_equal(
        np.sort(np.concatenate(sk2.levels)), np.sort(np.concatenate(sk.levels))
    )
    assert sk2.get_quantile(0.5) == sk.get_quantile(0.5)


def test_all_reference_goldens_covered():
    """Inventory guard: every .sk the reference ships is exercised above —
    if the reference adds goldens, this fails and points at the gap."""
    shipped = {os.path.basename(p) for p in glob.glob(os.path.join(REF, "*", "test", "*.sk"))}
    covered = {
        "theta_compact_empty_from_java_v1.sk",
        "theta_compact_empty_from_java_v2.sk",
        "theta_compact_estimation_from_java_v1.sk",
        "theta_compact_estimation_from_java_v2.sk",
        "tdigest_ref_k100_n10000_double.sk",
        "tdigest_ref_k100_n10000_float.sk",
        "kll_sketch_float_one_item_v1.sk",
    } | {c[0] for c in Q_CASES}
    assert shipped == covered
