"""REQ sketch: relative-error-at-the-tail envelope + merge law, mirroring
the reference's req_sketch tests (req/test/req_sketch_test.cpp; bounds per
req_sketch_impl.hpp:300-330)."""

import math

import numpy as np
import pytest

from datasketches_cpp_spark.functions.req import DEFAULT_K, ReqSketch


def exact_rank(sorted_vals: np.ndarray, x: float) -> float:
    return np.searchsorted(sorted_vals, x, side="right") / len(sorted_vals)


def test_exact_mode_below_capacity():
    sk = ReqSketch(k=12)
    vals = np.arange(50, dtype=np.float64)
    sk.update_batch(vals)
    assert not sk.is_estimation_mode()
    for q in [0.1, 0.5, 0.9]:
        assert sk.get_rank(sk.get_quantile(q)) == pytest.approx(q, abs=0.03)
    lb, ub = sk.rank_bounds(0.9)
    assert lb == 0.9 == ub  # exact mode: bounds collapse


def test_hra_tail_relative_error():
    """HRA: rank error at rank q must stay within the reference's
    2-sided bound z·max(rel, fixed) with rel ∝ (1−q) — i.e. the high tail
    is MUCH tighter than the body."""
    rng = np.random.default_rng(42)
    n = 300_000
    vals = rng.lognormal(0, 2, n)
    sk = ReqSketch(k=DEFAULT_K, hra=True)
    for chunk in np.array_split(vals, 30):
        sk.update_batch(chunk)
    assert sk.is_estimation_mode()
    s = np.sort(vals)
    for q in [0.5, 0.9, 0.99, 0.999, 0.9999]:
        est = sk.get_quantile(q)
        err = abs(exact_rank(s, est) - q)
        lb, ub = sk.rank_bounds(q, num_std_devs=3)
        budget = max(ub - q, q - lb) + 2.0 / n
        assert err <= budget, (q, err, budget)
    # the 0.9999 error must be far below the body-scale error budget
    est = sk.get_quantile(0.9999)
    assert abs(exact_rank(s, est) - 0.9999) < 0.002


def test_lra_mirror():
    rng = np.random.default_rng(7)
    n = 100_000
    vals = rng.normal(0, 1, n)
    sk = ReqSketch(k=DEFAULT_K, hra=False)
    sk.update_batch(vals)
    s = np.sort(vals)
    est = sk.get_quantile(0.0001)
    assert abs(exact_rank(s, est) - 0.0001) < 0.002  # LOW tail accurate


def test_merge_preserves_envelope():
    rng = np.random.default_rng(3)
    vals = rng.pareto(1.2, 200_000)
    parts = np.array_split(vals, 16)
    sketches = []
    for i, p in enumerate(parts):
        sk = ReqSketch(seed=50 + i)
        sk.update_batch(p)
        sketches.append(sk)
    merged = sketches[0]
    for o in sketches[1:]:
        merged.merge(o)
    assert merged.n == len(vals)
    s = np.sort(vals)
    for q in [0.99, 0.999]:
        est = merged.get_quantile(q)
        err = abs(exact_rank(s, est) - q)
        lb, ub = merged.rank_bounds(q, num_std_devs=3)
        assert err <= max(ub - q, q - lb) + 4.0 / len(vals), (q, err)


def test_retained_is_bounded():
    sk = ReqSketch(k=DEFAULT_K)
    rng = np.random.default_rng(1)
    for _ in range(100):
        sk.update_batch(rng.uniform(0, 1, 10_000))
    # O(k log^1.5 n)-ish; generous structural bound
    assert sk.num_retained() <= sk._max_nom_size()
    assert sk.min == sk.get_quantile(0.0) and sk.max == sk.get_quantile(1.0)


def test_empty_and_nan():
    sk = ReqSketch()
    assert math.isnan(sk.get_quantile(0.5))
    sk.update_batch(np.array([np.nan, 1.0, np.nan]))
    assert sk.n == 1 and sk.get_quantile(0.5) == 1.0


def test_spark_req_agg(spark):
    from datasketches_cpp_spark.functions.req import req_sketch_agg, with_req_quantiles

    rng = np.random.default_rng(5)
    vals = rng.lognormal(1, 1, 30_000)
    df = spark.createDataFrame(
        [(("a" if i % 2 else "b"), float(v)) for i, v in enumerate(vals)],
        "g string, x double",
    ).repartition(16)
    sk_df = req_sketch_agg(df, ["g"], "x")
    state = {r["g"]: r for r in sk_df.collect()}
    out = with_req_quantiles(sk_df, [0.99]).collect()
    assert sorted(r["g"] for r in out) == ["a", "b"]
    for r in out:
        sub = np.sort(
            np.array([v for i, v in enumerate(vals) if (i % 2 != 0) == (r["g"] == "a")])
        )
        assert state[r["g"]]["req_n"] == len(sub)
        err = abs(exact_rank(sub, r["q0_99"]) - 0.99)
        assert err <= 0.01, err


def test_req_mixed_k_merge():
    """Reference merge rule: HRA/LRA mixing is invalid; differing k is
    allowed, re-compressing under the receiving sketch's sections."""
    import numpy as np
    import pytest

    from datasketches_cpp_spark.functions.req import ReqSketch

    rng = np.random.default_rng(7)
    a_vals, b_vals = rng.random(30_000), rng.random(20_000) + 0.5
    a = ReqSketch(12, hra=True)
    a.update_batch(a_vals)
    b = ReqSketch(24, hra=True)
    b.update_batch(b_vals)
    a.merge(b)
    assert a.n == 50_000
    exact = np.sort(np.concatenate([a_vals, b_vals]))
    for r in (0.9, 0.99):  # HRA: high ranks are tight
        true_rank = np.searchsorted(exact, a.get_quantile(r)) / len(exact)
        assert abs(true_rank - r) < 0.05
    with pytest.raises(ValueError, match="HRA and LRA"):
        a.merge(ReqSketch(12, hra=False))


def test_pmf_cdf_uniform():
    """get_CDF/get_PMF query shape (req_sketch.hpp get_CDF/get_PMF via the
    sorted view): CDF at quartile splits of uniform data is within the
    sketch's own rank bounds; PMF sums to 1 and diffs the CDF."""
    rng = np.random.default_rng(7)
    vals = rng.permutation(np.arange(100_000, dtype=np.float64))
    sk = ReqSketch(k=50)
    sk.update_batch(vals)
    splits = np.array([24999.5, 49999.5, 74999.5])
    cdf = sk.get_cdf(splits)
    assert cdf.shape == (4,)
    assert cdf[-1] == 1.0
    assert np.all(np.diff(cdf) >= -1e-12)
    for s, c in zip(splits, cdf[:-1]):
        true_rank = (s + 0.5) / 100_000
        lb, ub = sk.rank_bounds(true_rank, num_std_devs=3)
        assert lb - 1e-9 <= c <= ub + 1e-9, (s, c, lb, ub)
    pmf = sk.get_pmf(splits)
    assert pmf.shape == (4,)
    assert math.isclose(float(pmf.sum()), 1.0, abs_tol=1e-12)
    assert np.allclose(np.cumsum(pmf), cdf)


def test_pmf_cdf_exact_mode():
    sk = ReqSketch(k=12)
    sk.update_batch(np.arange(10, dtype=np.float64))
    cdf = sk.get_cdf(np.array([-1.0, 4.0, 100.0]))
    assert np.allclose(cdf, [0.0, 0.5, 1.0, 1.0])
