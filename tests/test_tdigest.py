"""t-digest: tail-accuracy envelope + merge law, mirroring the reference's
tdigest tests (/root/reference/tdigest/include/tdigest.hpp, tdigest/test/
tdigest_test.cpp: rank error concentrated at tails, merge preserves it)."""

import math

import numpy as np
import pytest

from datasketches_cpp_spark.functions.tdigest import DEFAULT_K, TDigest


def exact_rank(sorted_vals: np.ndarray, x: float) -> float:
    return np.searchsorted(sorted_vals, x, side="right") / len(sorted_vals)


@pytest.mark.parametrize("dist", ["uniform", "lognormal"])
def test_tail_quantile_accuracy(dist):
    rng = np.random.default_rng(42)
    n = 200_000
    vals = rng.uniform(0, 1, n) if dist == "uniform" else rng.lognormal(0, 2, n)
    td = TDigest(DEFAULT_K)
    for chunk in np.array_split(vals, 20):
        td.update_batch(chunk)
    s = np.sort(vals)
    # rank error at the tails must be far tighter than KLL's uniform
    # ~2.3/k^0.9: t-digest error scales ~q(1-q)/delta
    for q in [0.5, 0.9, 0.99, 0.999, 0.9999]:
        est = td.get_quantile(q)
        rank_err = abs(exact_rank(s, est) - q)
        budget = max(6.0 * q * (1 - q) / DEFAULT_K, 10.0 / n)
        assert rank_err <= budget, (dist, q, rank_err, budget)


def test_extremes_exact():
    rng = np.random.default_rng(1)
    vals = rng.normal(0, 1, 50_000)
    td = TDigest()
    td.update_batch(vals)
    assert td.get_quantile(0.0) == vals.min()
    assert td.get_quantile(1.0) == vals.max()
    assert td.get_rank(vals.min() - 1) == 0.0
    # reference rank semantics: the max item sits at 1 − ½/n, strictly
    # above-max values at 1 (tdigest_impl.hpp get_rank right tail)
    assert td.get_rank(vals.max()) == 1.0 - 0.5 / len(vals)
    assert td.get_rank(vals.max() + 1) == 1.0


def test_merge_matches_single_digest_envelope():
    rng = np.random.default_rng(7)
    vals = rng.lognormal(0, 1.5, 100_000)
    parts = np.array_split(vals, 16)
    digests = []
    for p in parts:
        td = TDigest()
        td.update_batch(p)
        digests.append(td)
    merged = TDigest()
    for d in digests:
        merged.merge(d)
    assert merged.n == len(vals)
    s = np.sort(vals)
    for q in [0.01, 0.5, 0.99, 0.999]:
        est = merged.get_quantile(q)
        rank_err = abs(exact_rank(s, est) - q)
        assert rank_err <= max(6.0 * q * (1 - q) / DEFAULT_K, 4.0 / len(vals)), (q, rank_err)


def test_centroid_count_bounded():
    rng = np.random.default_rng(3)
    td = TDigest()
    for _ in range(50):
        td.update_batch(rng.uniform(0, 1, 10_000))
    # K_2 clustering keeps ~delta clusters; allow slack for buffering
    assert len(td.means) <= 2 * DEFAULT_K, len(td.means)
    assert math.isclose(td.weights.sum(), td.n)


def test_rank_quantile_roundtrip():
    rng = np.random.default_rng(11)
    vals = rng.normal(10, 3, 80_000)
    td = TDigest()
    td.update_batch(vals)
    for q in [0.05, 0.5, 0.95, 0.995]:
        x = td.get_quantile(q)
        assert abs(td.get_rank(x) - q) < 0.01, q


def test_empty_and_single():
    td = TDigest()
    assert math.isnan(td.get_quantile(0.5))
    td.update_batch(np.array([42.0]))
    assert td.get_quantile(0.5) == 42.0
    assert td.get_quantile(0.0) == 42.0 == td.get_quantile(1.0)


def test_spark_tdigest_agg(spark):
    """Two-stage agg over deliberately many partitions (incl. empty) matches
    the driver-side digest envelope and carries exact min/max."""
    from datasketches_cpp_spark.functions.tdigest import (
        tdigest_agg,
        with_tdigest_quantiles,
    )

    rng = np.random.default_rng(5)
    vals = rng.lognormal(1, 1, 20_000)
    df = spark.createDataFrame(
        [(("a" if i % 3 else "b"), float(v)) for i, v in enumerate(vals)],
        "g string, x double",
    ).repartition(16)
    sk = tdigest_agg(df, ["g"], "x")
    state = {r["g"]: r for r in sk.collect()}
    out = with_tdigest_quantiles(sk, [0.5, 0.99]).collect()
    assert sorted(r["g"] for r in out) == ["a", "b"] == sorted(state)
    for r in out:
        sub = np.sort(
            np.array([v for i, v in enumerate(vals) if (i % 3 != 0) == (r["g"] == "a")])
        )
        st = state[r["g"]]
        assert st["td_n"] == len(sub)
        assert st["td_min"] == sub[0] and st["td_max"] == sub[-1]
        for q, col in [(0.5, "q0_5"), (0.99, "q0_99")]:
            rank_err = abs(exact_rank(sub, r[col]) - q)
            assert rank_err <= max(6.0 * q * (1 - q) / DEFAULT_K, 4.0 / len(sub)), (
                r["g"], q, rank_err,
            )


def test_tdigest_mixed_delta_merge():
    """Reference tdigest::merge has no parameter restriction: the other
    digest's centroids re-compress under this digest's delta."""
    import numpy as np

    from datasketches_cpp_spark.functions.tdigest import TDigest

    rng = np.random.default_rng(8)
    a_vals, b_vals = rng.random(30_000), rng.random(30_000)
    a = TDigest(100)
    a.update_batch(a_vals)
    b = TDigest(400)
    b.update_batch(b_vals)
    a.merge(b)
    assert a.n == 60_000
    exact = np.sort(np.concatenate([a_vals, b_vals]))
    for r in (0.01, 0.5, 0.99):
        got = a.get_quantile(r)
        true_rank = np.searchsorted(exact, got) / len(exact)
        assert abs(true_rank - r) < 0.02, (r, true_rank)
