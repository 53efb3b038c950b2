"""S7: pairwise verification — the theta-Jaccard query path
(/root/reference/theta/include/theta_jaccard_similarity_base.hpp:55-146)
batch-applied to millions of candidate pairs per task.

Candidates join the signature table twice (sort-merge on id; Catalyst/AQE
pick broadcast automatically when the sig side is small), then one
`mapInPandas` computes, fully vectorized per Arrow batch:

  * MinHash lane-agreement Jaccard (aligned lanes ⇒ one 2-D `==` + mean),
  * KMV bottom-k Jaccard (the reference's |a∩b|/|a∪b| below min theta) —
    tighter, used as the decision estimate,
  * SimHash hamming distance (bit_count of xor),
  * exact-content equality (kmv theta+sig identity ⇒ same shingle set).

A pair passes if ANY enabled lane passes (OR-fusion per SURVEY.md §2B S7).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .sigkernel import SigConfig, decode_theta, hamming64


def _kmv_jaccard_batch(
    sig_a: pd.Series, sig_b: pd.Series, theta_a: np.ndarray, theta_b: np.ndarray
) -> np.ndarray:
    """Per-pair KMV Jaccard. Arrays vary in length → per-pair loop, but each
    iteration is a few C-level ops on small sorted arrays (k ≤ kmv_k)."""
    n = len(sig_a)
    out = np.empty(n, dtype=np.float64)
    for i in range(n):
        a = np.asarray(sig_a.iloc[i], dtype=np.int64).astype(np.uint64)
        b = np.asarray(sig_b.iloc[i], dtype=np.int64).astype(np.uint64)
        theta = min(decode_theta(int(theta_a[i])), decode_theta(int(theta_b[i])))
        a = a[: np.searchsorted(a, np.uint64(theta))]
        b = b[: np.searchsorted(b, np.uint64(theta))]
        if len(a) == 0 and len(b) == 0:
            out[i] = 1.0
            continue
        inter = len(np.intersect1d(a, b, assume_unique=True))
        out[i] = inter / (len(a) + len(b) - inter)
    return out


VERIFIED_SCHEMA_SUFFIX = (
    "jaccard double, mh_jaccard double, simhash_hamming int, "
    "exact_match boolean, passed boolean"
)


def verify_pairs(
    pairs: DataFrame,
    sig_df: DataFrame,
    cfg: SigConfig,
    use_simhash: bool = True,
) -> DataFrame:
    """(a, b) candidates → (a, b, jaccard, mh_jaccard, simhash_hamming,
    exact_match, passed)."""
    sig = sig_df.select("id", "mh_sig", "kmv_theta", "kmv_sig", "simhash")
    a_side = sig.select(
        F.col("id").alias("a"),
        F.col("mh_sig").alias("mh_a"),
        F.col("kmv_theta").alias("th_a"),
        F.col("kmv_sig").alias("kv_a"),
        F.col("simhash").alias("sh_a"),
    )
    b_side = sig.select(
        F.col("id").alias("b"),
        F.col("mh_sig").alias("mh_b"),
        F.col("kmv_theta").alias("th_b"),
        F.col("kmv_sig").alias("kv_b"),
        F.col("simhash").alias("sh_b"),
    )
    joined = pairs.join(a_side, "a").join(b_side, "b")
    id_type = dict(pairs.dtypes)["a"]
    schema = f"a {id_type}, b {id_type}, {VERIFIED_SCHEMA_SUFFIX}"

    thr = cfg.jaccard_threshold
    max_ham = cfg.simhash_hamming

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mh_a = np.stack(pdf["mh_a"].to_numpy()).astype(np.int64)
            mh_b = np.stack(pdf["mh_b"].to_numpy()).astype(np.int64)
            mh_j = (mh_a == mh_b).mean(axis=1)
            kmv_j = _kmv_jaccard_batch(
                pdf["kv_a"], pdf["kv_b"],
                pdf["th_a"].to_numpy(), pdf["th_b"].to_numpy(),
            )
            sh = hamming64(
                pdf["sh_a"].to_numpy(np.int64).astype(np.uint64),
                pdf["sh_b"].to_numpy(np.int64).astype(np.uint64),
            )
            exact = (kmv_j == 1.0) & (
                pdf["th_a"].to_numpy() == pdf["th_b"].to_numpy()
            )
            passed = kmv_j >= thr
            if use_simhash:
                passed = passed | (sh <= max_ham)
            yield pd.DataFrame(
                {
                    "a": pdf["a"],
                    "b": pdf["b"],
                    "jaccard": kmv_j,
                    "mh_jaccard": mh_j,
                    "simhash_hamming": sh.astype(np.int32),
                    "exact_match": exact,
                    "passed": passed,
                }
            )

    return joined.mapInPandas(run, schema)
