#!/usr/bin/env python
"""Microbenchmark: segmented flat-array KMV-Jaccard kernel vs the round-1
per-pair Python loop, at 1M candidate pairs (pure numpy, no Spark).

Writes BENCH/microbench_verify.json. Also asserts exact parity between the
two implementations on the same input.
"""
import json
import os
import sys
import time

import numpy as np
import pandas as pd

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from datasketches_cpp_spark.operators.verify import _kmv_jaccard_batch  # noqa: E402
from datasketches_cpp_spark.operators.sigkernel import MAX_THETA  # noqa: E402


def loop_reference(sig_a, sig_b, theta_a, theta_b):
    """The round-1 implementation, kept verbatim as the parity oracle."""
    n = len(sig_a)
    out = np.empty(n, dtype=np.float64)
    for i in range(n):
        a = np.asarray(sig_a.iloc[i], dtype=np.int64).astype(np.uint64)
        b = np.asarray(sig_b.iloc[i], dtype=np.int64).astype(np.uint64)
        ta = MAX_THETA if theta_a[i] < 0 else int(theta_a[i])
        tb = MAX_THETA if theta_b[i] < 0 else int(theta_b[i])
        theta = min(ta, tb)
        a = a[: np.searchsorted(a, np.uint64(theta))]
        b = b[: np.searchsorted(b, np.uint64(theta))]
        if len(a) == 0 and len(b) == 0:
            out[i] = 1.0
            continue
        inter = len(np.intersect1d(a, b, assume_unique=True))
        out[i] = inter / (len(a) + len(b) - inter)
    return out


def gen(n_pairs: int, k: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    sig_a, sig_b, th_a, th_b = [], [], [], []
    pool = np.sort(rng.integers(1, MAX_THETA, size=4 * k, dtype=np.int64))
    for _ in range(n_pairs):
        na = int(rng.integers(k // 2, k + 1))
        nb = int(rng.integers(k // 2, k + 1))
        a = np.sort(rng.choice(pool, size=na, replace=False))
        # overlap ~ half of b drawn from a
        nb_half = nb // 2
        b = np.unique(
            np.concatenate(
                [rng.choice(a, size=min(nb_half, na), replace=False),
                 rng.choice(pool, size=nb - nb_half, replace=False)]
            )
        )
        sig_a.append(a.astype(np.int64))
        sig_b.append(b.astype(np.int64))
        th_a.append(-1 if rng.random() < 0.5 else int(max(a.max(), b.max()) + 1))
        th_b.append(-1)
    return (
        pd.Series(sig_a), pd.Series(sig_b),
        np.array(th_a, dtype=np.int64), np.array(th_b, dtype=np.int64),
    )


def main():
    n_parity, n_bench = 2000, int(os.environ.get("VERIFY_BENCH_PAIRS", "1000000"))
    k = 64

    sa, sb, ta, tb = gen(n_parity, k)
    got = _kmv_jaccard_batch(sa, sb, ta, tb)
    want = loop_reference(sa, sb, ta, tb)
    assert np.allclose(got, want, atol=0), "parity FAILED"
    print(f"parity ok on {n_parity} pairs")

    # time the old loop on a subsample, extrapolate; time the new kernel full
    from datasketches_cpp_spark.operators.verify import (  # noqa: E402
        _flatten,
        _kmv_jaccard_flat,
    )

    sa, sb, ta, tb = gen(n_bench, k)
    sub = 20000
    t0 = time.time()
    loop_reference(sa.iloc[:sub], sb.iloc[:sub], ta[:sub], tb[:sub])
    loop_sec_per_pair = (time.time() - t0) / sub
    # production path: Spark hands the kernel flat values + lengths
    # zero-copy from Arrow (verify_pairs uses mapInArrow), so the kernel
    # timing excludes pandas flattening; the pandas wrapper is also timed.
    fa, la = _flatten(sa)
    fb, lb = _flatten(sb)
    t0 = time.time()
    _kmv_jaccard_flat(fa, la, fb, lb, ta, tb)
    vec_sec = time.time() - t0
    t0 = time.time()
    _kmv_jaccard_batch(sa, sb, ta, tb)
    pandas_sec = time.time() - t0
    loop_sec_est = loop_sec_per_pair * n_bench
    result = {
        "pairs": n_bench,
        "k": k,
        "loop_sec_extrapolated": round(loop_sec_est, 3),
        "loop_measured_pairs": sub,
        "vectorized_sec": round(vec_sec, 3),
        "pandas_path_sec": round(pandas_sec, 3),
        "speedup": round(loop_sec_est / vec_sec, 1),
        "vectorized_pairs_per_sec": round(n_bench / vec_sec),
    }
    print(json.dumps(result))
    out = os.path.join(ROOT, "BENCH", "microbench_verify.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
