"""Tuple sketch — theta sketch whose retained entries carry a summary
payload folded by a policy.

Reference semantics (tuple/include/tuple_sketch.hpp:59-62, 201-208): each
retained entry is ⟨64-bit key hash, Summary⟩; ``update(key, value)`` folds
``value`` into the key's summary via a user Policy (create/update);
set-ops combine summaries (tuple_union.hpp etc.); the example policies are
max / always-one / sum ("engagement analytics",
tuple/test/engagement_test.cpp:28-70).

Spark mapping: the Policy is a named reduction over a double payload —
'sum' | 'max' | 'min' | 'one'. Partial stage: vectorized hash → pandas
groupby(hash).agg(policy) → k-min cut keeping (hash, summary) aligned;
final stage: concat, re-fold by hash, re-cut. Estimates follow theta:
``estimate_sum(pred)`` = Σ summaries of retained entries passing pred ÷
theta-fraction (unbiased for the keyed population — the tuple analog of
num_retained/theta). Exact when theta never dropped (lg_k ≥ ndv).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..hashing import DEFAULT_SEED, hash63_int64, hash63_str_many
from ..kmv import MAX_THETA

_INT_TYPES = {"tinyint", "smallint", "int", "bigint", "date"}
_POLICIES = {"sum": "sum", "max": "max", "min": "min", "one": "first"}


def _hash_items(items: pd.Series, dtype: str, seed: int) -> np.ndarray:
    if dtype in _INT_TYPES:
        return hash63_int64(items.to_numpy(dtype=np.int64), seed)
    return hash63_str_many([str(v) for v in items], seed)


def _fold(hashes: np.ndarray, values: np.ndarray, policy: str) -> tuple[np.ndarray, np.ndarray]:
    """Reduce values per distinct hash (vectorized pandas groupby)."""
    if policy == "one":
        values = np.ones(len(hashes), dtype=np.float64)
        policy = "max"
    s = pd.Series(values).groupby(pd.Series(hashes.astype(np.uint64)), sort=True)
    agg = getattr(s, _POLICIES.get(policy, policy))()
    return agg.index.to_numpy(dtype=np.uint64), agg.to_numpy(dtype=np.float64)


def _cut(
    hashes: np.ndarray, summaries: np.ndarray, theta: int, k: int
) -> tuple[int, np.ndarray, np.ndarray]:
    """Keep entries < theta; trim to k smallest, lowering theta (the KMV
    rebuild with payloads carried along)."""
    keep = hashes < np.uint64(theta)
    hashes, summaries = hashes[keep], summaries[keep]
    if len(hashes) > k:
        order = np.argsort(hashes, kind="stable")
        hashes, summaries = hashes[order], summaries[order]
        theta = int(hashes[k])
        hashes, summaries = hashes[:k], summaries[:k]
    return theta, hashes, summaries


def tuple_sketch_agg(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    value_col: str,
    policy: str = "sum",
    lg_k: int = 12,
    seed: int = DEFAULT_SEED,
) -> DataFrame:
    """groupBy(group_cols).tuple_sketch(key, value, policy) → one row per
    group: (group..., theta long [-1 ⇔ exact], sig array<long>,
    summaries array<double>) with sig ∥ summaries aligned."""
    if policy not in _POLICIES:
        raise ValueError(f"unknown policy {policy!r}; use {sorted(_POLICIES)}")
    k = 1 << lg_k
    key_dtype = dict(df.dtypes)[key_col]
    group_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name in group_cols
    )
    prefix = f"{group_fields}, " if group_fields else ""
    schema = f"{prefix}theta long, sig array<long>, summaries array<double>"

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-group accumulated (hash → summary) frames, folded per batch
        acc: dict[tuple, tuple[np.ndarray, np.ndarray]] = {}
        for pdf in batches:
            pdf = pdf[pdf[key_col].notna()]
            if len(pdf) == 0:
                continue
            hashes_all = _hash_items(pdf[key_col], key_dtype, seed)
            vals_all = pdf[value_col].to_numpy(dtype=np.float64)
            grouped = (
                pdf.groupby(group_cols, sort=False, dropna=False).indices
                if group_cols
                else {(): np.arange(len(pdf))}
            )
            for key, idx in grouped.items():
                key = key if isinstance(key, tuple) else (key,)
                h, s = _fold(hashes_all[idx], vals_all[idx], policy)
                if key in acc:
                    ph, ps = acc[key]
                    h2, s2 = _fold(
                        np.concatenate([ph, h]), np.concatenate([ps, s]), policy
                    )
                    acc[key] = (h2, s2)
                else:
                    acc[key] = (h, s)
        rows = []
        for key, (h, s) in acc.items():
            theta, h, s = _cut(h, s, MAX_THETA, k)
            r = {c: key[i] for i, c in enumerate(group_cols)}
            r["theta"] = -1 if theta >= MAX_THETA else theta
            r["sig"] = h.astype(np.int64)
            r["summaries"] = s
            rows.append(r)
        if not rows:
            return  # empty partition: never yield an empty inferred-dtype frame
        yield pd.DataFrame(rows, columns=group_cols + ["theta", "sig", "summaries"])

    partials = df.select(group_cols + [key_col, value_col]).mapInPandas(partial, schema)

    def final(pdf: pd.DataFrame) -> pd.DataFrame:
        theta = MAX_THETA
        hs, ss = [], []
        for _, row in pdf.iterrows():
            t = int(row["theta"])
            theta = min(theta, MAX_THETA if t < 0 else t)
            hs.append(np.asarray(row["sig"], np.int64).astype(np.uint64))
            ss.append(np.asarray(row["summaries"], np.float64))
        h, s = _fold(np.concatenate(hs), np.concatenate(ss), policy)
        theta, h, s = _cut(h, s, theta, k)
        r = {c: [pdf[c].iloc[0]] for c in group_cols}
        r["theta"] = [-1 if theta >= MAX_THETA else theta]
        r["sig"] = [h.astype(np.int64)]
        r["summaries"] = [s]
        return pd.DataFrame(r, columns=group_cols + ["theta", "sig", "summaries"])

    if group_cols:
        return partials.groupBy(*group_cols).applyInPandas(final, schema)
    return partials.groupBy(F.lit(1).alias("_g")).applyInPandas(final, schema)


def with_key_estimate(sketch_df: DataFrame, out_col: str = "estimate") -> DataFrame:
    """Distinct-key estimate = size(sig)/theta-fraction (JVM-side)."""
    frac = F.col("theta").cast("double") / F.lit(float(MAX_THETA))
    est = F.when(F.col("theta") < 0, F.size("sig").cast("double")).otherwise(
        F.size("sig").cast("double") / frac
    )
    return sketch_df.withColumn(out_col, est)


def with_summary_sum_estimate(
    sketch_df: DataFrame, out_col: str = "summary_sum"
) -> DataFrame:
    """Estimated Σ summary over ALL keys = (Σ retained summaries) /
    theta-fraction — unbiased because retention is an independent
    hash-uniform sample of keys (JVM-side aggregate over the array)."""
    total = F.aggregate(
        "summaries", F.lit(0.0), lambda a, x: a + x
    )
    frac = F.col("theta").cast("double") / F.lit(float(MAX_THETA))
    est = F.when(F.col("theta") < 0, total).otherwise(total / frac)
    return sketch_df.withColumn(out_col, est)


def filtered_key_estimate(
    sketch_df: DataFrame,
    min_summary: float,
    out_col: str = "keys_passing",
) -> DataFrame:
    """Engagement-style query (engagement_test.cpp:28-70): estimated number
    of distinct keys whose folded summary ≥ min_summary."""
    passing = F.size(
        F.filter("summaries", lambda x: x >= F.lit(float(min_summary)))
    ).cast("double")
    frac = F.col("theta").cast("double") / F.lit(float(MAX_THETA))
    est = F.when(F.col("theta") < 0, passing).otherwise(passing / frac)
    return sketch_df.withColumn(out_col, est)
