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

from ..hashing import INT_DTYPES as _INT_TYPES  # one shared definition
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
        # per-group (theta, hash → summary) state, folded per batch and
        # amortized-trimmed at 2k (the reference's lazy-rebuild discipline,
        # theta_update_sketch_base.hpp:66-68) so partial state stays O(k)
        # per group instead of growing with distinct keys seen
        acc: dict[tuple, tuple[int, np.ndarray, np.ndarray]] = {}
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
                    ptheta, ph, ps = acc[key]
                    keep = h < np.uint64(ptheta)
                    h2, s2 = _fold(
                        np.concatenate([ph, h[keep]]),
                        np.concatenate([ps, s[keep]]),
                        policy,
                    )
                    theta = ptheta
                else:
                    theta, h2, s2 = MAX_THETA, h, s
                if len(h2) > 2 * k:
                    theta, h2, s2 = _cut(h2, s2, theta, k)
                acc[key] = (theta, h2, s2)
        rows = []
        for key, (theta, h, s) in acc.items():
            theta, h, s = _cut(h, s, theta, k)
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
        # vectorized partial merge: theta = min over encoded thetas
        # (-1 ⇔ MAX_THETA, which exceeds every real value), sig/summary
        # arrays gathered by column — no per-row pandas objects
        ts = pdf["theta"].to_numpy()
        enc = ts[ts >= 0]
        theta = int(enc.min()) if len(enc) else MAX_THETA
        hs = [np.asarray(sig, np.int64).astype(np.uint64) for sig in pdf["sig"].to_numpy()]
        ss = [np.asarray(sm, np.float64) for sm in pdf["summaries"].to_numpy()]
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


def _combine_summaries(sa: np.ndarray, sb: np.ndarray, policy: str) -> np.ndarray:
    """Summary-combine for entries present in BOTH sketches — the Policy of
    the reference's tuple set-ops (tuple/include/tuple_union.hpp:40+:
    union applies the policy when a key exists on both sides)."""
    if policy == "sum":
        return sa + sb
    if policy == "max":
        return np.maximum(sa, sb)
    if policy == "min":
        return np.minimum(sa, sb)
    if policy == "one":
        return np.ones_like(sa)
    raise ValueError(f"unknown policy {policy!r}")


_TUPLE_SETOP_SCHEMA = (
    "key string, theta long, "
    "est_a double, est_b double, est_union double, "
    "est_intersection double, est_a_not_b double, "
    "sum_a double, sum_b double, sum_union double, "
    "sum_intersection double, sum_a_not_b double"
)


def tuple_pair_set_ops(
    df_a: DataFrame,
    df_b: DataFrame,
    key_cols: list[str],
    k: int,
    policy: str = "sum",
) -> DataFrame:
    """Tuple-sketch union / intersection / a-not-b with summary combine,
    per join key — reference tuple_union.hpp:40+, tuple_intersection.hpp,
    tuple_a_not_b.hpp:39, with the engagement-analytics policy semantics of
    tuple/test/engagement_test.cpp:28-70 (union keyed summaries across
    epochs/tables).

    Inputs are keyed outputs of ``tuple_sketch_agg`` (same seed + lg_k on
    both sides, like the reference's seed-hash check). Emits per key both
    distinct-key estimates (est_*) and summary-sum estimates (sum_*) for
    each set op: a key in both sides contributes policy(sum_a, sum_b) to
    the union / intersection summaries; a-not-b keeps A's summaries.
    Missing side = empty sketch. Exact when both sides are exact-mode."""
    join_cols = key_cols or ["_k"]
    a = df_a.select(
        *key_cols,
        F.col("theta").alias("theta_a"),
        F.col("sig").alias("sig_a"),
        F.col("summaries").alias("sum_col_a"),
    )
    b = df_b.select(
        *key_cols,
        F.col("theta").alias("theta_b"),
        F.col("sig").alias("sig_b"),
        F.col("summaries").alias("sum_col_b"),
    )
    if not key_cols:  # global (one-row) sketches: constant join key
        a = a.withColumn("_k", F.lit(1))
        b = b.withColumn("_k", F.lit(1))
    joined = a.join(b, join_cols, "full_outer")

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        # one Python step per sketch PAIR (each O(k) numpy work), never
        # per data row — no pandas row objects in the loop
        def mk(theta_enc, sig, summ):
            if sig is None or (isinstance(sig, float) and pd.isna(sig)):
                return MAX_THETA, np.empty(0, np.uint64), np.empty(0, np.float64)
            t = MAX_THETA if int(theta_enc) < 0 else int(theta_enc)
            h = np.asarray(sig, np.int64).view(np.uint64)
            return t, h, np.asarray(summ, np.float64)

        if key_cols:
            keys = [
                "|".join(map(str, vals))
                for vals in zip(*(pdf[c].to_numpy() for c in key_cols))
            ]
        else:
            keys = [""] * len(pdf)
        out = []
        for key, theta_a, sig_a, sum_a, theta_b, sig_b, sum_b in zip(
            keys,
            pdf["theta_a"].to_numpy(), pdf["sig_a"].to_numpy(),
            pdf["sum_col_a"].to_numpy(),
            pdf["theta_b"].to_numpy(), pdf["sig_b"].to_numpy(),
            pdf["sum_col_b"].to_numpy(),
        ):
            ta, ha, sa = mk(theta_a if pd.notna(theta_a) else -1, sig_a, sum_a)
            tb, hb, sb = mk(theta_b if pd.notna(theta_b) else -1, sig_b, sum_b)
            theta = min(ta, tb)
            # screen both to < min theta (sigs are sorted ascending)
            ca = int(np.searchsorted(ha, np.uint64(theta)))
            cb = int(np.searchsorted(hb, np.uint64(theta)))
            ha, sa_s = ha[:ca], sa[:ca]
            hb, sb_s = hb[:cb], sb[:cb]

            common, ia, ib = np.intersect1d(ha, hb, assume_unique=True, return_indices=True)
            only_a = np.setdiff1d(ha, common, assume_unique=True)
            only_b = np.setdiff1d(hb, common, assume_unique=True)
            mask_a_only = np.ones(len(ha), bool); mask_a_only[ia] = False
            mask_b_only = np.ones(len(hb), bool); mask_b_only[ib] = False

            u_h = np.concatenate([common, only_a, only_b])
            u_s = np.concatenate([
                _combine_summaries(sa_s[ia], sb_s[ib], policy),
                sa_s[mask_a_only],
                sb_s[mask_b_only],
            ])
            order = np.argsort(u_h, kind="stable")
            u_h, u_s = u_h[order], u_s[order]
            if len(u_h) > k:  # union re-trim, lowering theta (min-theta merge law)
                theta = int(u_h[k])
                u_h, u_s = u_h[:k], u_s[:k]
                ca = int(np.searchsorted(ha, np.uint64(theta)))
                cb = int(np.searchsorted(hb, np.uint64(theta)))
                ha, sa_s = ha[:ca], sa[:ca]
                hb, sb_s = hb[:cb], sb[:cb]
                common, ia, ib = np.intersect1d(ha, hb, assume_unique=True, return_indices=True)
                mask_a_only = np.ones(len(ha), bool); mask_a_only[ia] = False

            i_s = _combine_summaries(sa_s[ia], sb_s[ib], policy)
            anb_h, anb_s = ha[mask_a_only], sa_s[mask_a_only]

            frac = theta / float(MAX_THETA)
            def est(n):
                return float(n) / frac
            def ssum(arr):
                return float(arr.sum()) / frac

            out.append({
                "key": key,
                "theta": -1 if theta >= MAX_THETA else theta,
                "est_a": est(len(ha)), "est_b": est(len(hb)),
                "est_union": est(len(u_h)),
                "est_intersection": est(len(common)),
                "est_a_not_b": est(len(anb_h)),
                "sum_a": ssum(sa_s), "sum_b": ssum(sb_s),
                "sum_union": ssum(u_s),
                "sum_intersection": ssum(i_s),
                "sum_a_not_b": ssum(anb_s),
            })
        return pd.DataFrame(out)

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            yield compute(pdf)

    return joined.mapInPandas(run, _TUPLE_SETOP_SCHEMA)


# ---------------------------------------------------------------------------
# array-of-doubles tuple sketches (reference array_tuple_sketch.hpp /
# array_of_doubles_sketch.hpp — the Java-interoperable AOD family: each
# retained key carries a fixed-width vector of doubles, combined
# element-wise by the policy)
# ---------------------------------------------------------------------------


def _fold_nd(
    hashes: np.ndarray, values: np.ndarray, policy: str
) -> tuple[np.ndarray, np.ndarray]:
    """Reduce (m, d) value rows per distinct hash, element-wise."""
    d = values.shape[1]
    frame = pd.DataFrame(values)
    frame["_h"] = hashes.astype(np.uint64)
    agg = getattr(frame.groupby("_h", sort=True), _POLICIES.get(policy, policy))()
    return (
        agg.index.to_numpy(dtype=np.uint64),
        np.ascontiguousarray(agg.to_numpy(dtype=np.float64).reshape(-1, d)),
    )


def array_tuple_sketch_agg(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    values_col: str,
    num_values: int,
    policy: str = "sum",
    lg_k: int = 12,
    seed: int = DEFAULT_SEED,
) -> DataFrame:
    """groupBy(group_cols).array_tuple_sketch(key, values[d], policy) →
    one row per group: (group..., theta long [-1 ⇔ exact], sig
    array<long>, summaries array<double> of length size(sig)·d,
    row-major).  ``values_col`` is an array<double> column of fixed
    length ``num_values``; summaries combine element-wise (the
    default_array_tuple_union_policy is element-wise sum).  Same k-min
    cut / lazy 2k-trim discipline as `tuple_sketch_agg` — the shuffle
    carries O(k·d) doubles per group, never raw rows."""
    if policy not in _POLICIES:
        raise ValueError(f"unknown policy {policy!r}; use {sorted(_POLICIES)}")
    d = int(num_values)
    if d < 1:
        raise ValueError("num_values must be >= 1")
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
        acc: dict[tuple, tuple[int, np.ndarray, np.ndarray]] = {}
        for pdf in batches:
            pdf = pdf[pdf[key_col].notna()]
            if len(pdf) == 0:
                continue
            hashes_all = _hash_items(pdf[key_col], key_dtype, seed)
            vals_all = np.stack(
                [np.asarray(v, np.float64) for v in pdf[values_col]]
            ).reshape(len(pdf), d)
            grouped = (
                pdf.groupby(group_cols, sort=False, dropna=False).indices
                if group_cols
                else {(): np.arange(len(pdf))}
            )
            for key, idx in grouped.items():
                key = key if isinstance(key, tuple) else (key,)
                h, s = _fold_nd(hashes_all[idx], vals_all[idx], policy)
                if key in acc:
                    ptheta, ph, ps = acc[key]
                    keep = h < np.uint64(ptheta)
                    h2, s2 = _fold_nd(
                        np.concatenate([ph, h[keep]]),
                        np.concatenate([ps, s[keep]]),
                        policy,
                    )
                    theta = ptheta
                else:
                    theta, h2, s2 = MAX_THETA, h, s
                if len(h2) > 2 * k:
                    theta, h2, s2 = _cut(h2, s2, theta, k)
                acc[key] = (theta, h2, s2)
        rows = []
        for key, (theta, h, s) in acc.items():
            theta, h, s = _cut(h, s, theta, k)
            r = {c: key[i] for i, c in enumerate(group_cols)}
            r["theta"] = -1 if theta >= MAX_THETA else theta
            r["sig"] = h.astype(np.int64)
            r["summaries"] = s.reshape(-1)
            rows.append(r)
        if not rows:
            return
        yield pd.DataFrame(rows, columns=group_cols + ["theta", "sig", "summaries"])

    partials = df.select(group_cols + [key_col, values_col]).mapInPandas(
        partial, schema
    )

    def final(pdf: pd.DataFrame) -> pd.DataFrame:
        # vectorized partial merge (see scalar-summary final above)
        ts = pdf["theta"].to_numpy()
        enc = ts[ts >= 0]
        theta = int(enc.min()) if len(enc) else MAX_THETA
        hs = [np.asarray(sig, np.int64).astype(np.uint64) for sig in pdf["sig"].to_numpy()]
        ss = [np.asarray(sm, np.float64).reshape(-1, d) for sm in pdf["summaries"].to_numpy()]
        h, s = _fold_nd(np.concatenate(hs), np.concatenate(ss), policy)
        theta, h, s = _cut(h, s, theta, k)
        r = {c: [pdf[c].iloc[0]] for c in group_cols}
        r["theta"] = [-1 if theta >= MAX_THETA else theta]
        r["sig"] = [h.astype(np.int64)]
        r["summaries"] = [s.reshape(-1)]
        return pd.DataFrame(r, columns=group_cols + ["theta", "sig", "summaries"])

    if group_cols:
        return partials.groupBy(*group_cols).applyInPandas(final, schema)
    return partials.groupBy(F.lit(1).alias("_g")).applyInPandas(final, schema)


def with_value_sums_estimate(
    sketch_df: DataFrame, num_values: int, out_col: str = "value_sums"
) -> DataFrame:
    """Estimated per-column population sums over ALL keys: column j's
    retained sum ÷ theta-fraction (the AOD analog of
    with_summary_sum_estimate), entirely JVM-side — positional filter +
    aggregate over the flattened row-major summaries array."""
    d = int(num_values)
    frac = F.col("theta").cast("double") / F.lit(float(MAX_THETA))

    def _col_filter(j: int):
        return lambda x, i: i % d == j

    cols = []
    for j in range(d):
        total = F.aggregate(
            F.filter("summaries", _col_filter(j)),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        cols.append(F.when(F.col("theta") < 0, total).otherwise(total / frac))
    return sketch_df.withColumn(out_col, F.array(*cols))


def array_tuple_pair_set_ops(
    df_a: DataFrame,
    df_b: DataFrame,
    key_cols: list[str],
    k: int,
    num_values: int,
    policy: str = "sum",
) -> DataFrame:
    """AOD union / intersection / a-not-b with element-wise summary
    combine, per join key — reference array_tuple_union.hpp /
    array_tuple_intersection.hpp / array_tuple_a_not_b.hpp (the
    ArrayOfDoublesUnion/Intersection/AnotB trio in Java).  Same min-theta
    screening and re-trim law as `tuple_pair_set_ops`; emits distinct-key
    estimates plus per-column population-sum estimates (arrays of length
    num_values) for each set op."""
    d = int(num_values)
    join_cols = key_cols or ["_k"]
    a = df_a.select(
        *key_cols,
        F.col("theta").alias("theta_a"),
        F.col("sig").alias("sig_a"),
        F.col("summaries").alias("sum_col_a"),
    )
    b = df_b.select(
        *key_cols,
        F.col("theta").alias("theta_b"),
        F.col("sig").alias("sig_b"),
        F.col("summaries").alias("sum_col_b"),
    )
    if not key_cols:
        a = a.withColumn("_k", F.lit(1))
        b = b.withColumn("_k", F.lit(1))
    joined = a.join(b, join_cols, "full_outer")

    schema = (
        "key string, theta long, "
        "est_a double, est_b double, est_union double, "
        "est_intersection double, est_a_not_b double, "
        "vsum_a array<double>, vsum_b array<double>, "
        "vsum_union array<double>, vsum_intersection array<double>, "
        "vsum_a_not_b array<double>"
    )

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        # one Python step per sketch PAIR (each O(k·d) numpy work), never
        # per data row — no pandas row objects in the loop
        def mk(theta_enc, sig, summ):
            if sig is None or (isinstance(sig, float) and pd.isna(sig)):
                return MAX_THETA, np.empty(0, np.uint64), np.empty((0, d), np.float64)
            t = MAX_THETA if int(theta_enc) < 0 else int(theta_enc)
            h = np.asarray(sig, np.int64).view(np.uint64)
            return t, h, np.asarray(summ, np.float64).reshape(-1, d)

        if key_cols:
            keys = [
                "|".join(map(str, vals))
                for vals in zip(*(pdf[c].to_numpy() for c in key_cols))
            ]
        else:
            keys = [""] * len(pdf)
        out = []
        for key, theta_a, sig_a, sum_a, theta_b, sig_b, sum_b in zip(
            keys,
            pdf["theta_a"].to_numpy(), pdf["sig_a"].to_numpy(),
            pdf["sum_col_a"].to_numpy(),
            pdf["theta_b"].to_numpy(), pdf["sig_b"].to_numpy(),
            pdf["sum_col_b"].to_numpy(),
        ):
            ta, ha, sa = mk(theta_a if pd.notna(theta_a) else -1, sig_a, sum_a)
            tb, hb, sb = mk(theta_b if pd.notna(theta_b) else -1, sig_b, sum_b)
            theta = min(ta, tb)
            ca = int(np.searchsorted(ha, np.uint64(theta)))
            cb = int(np.searchsorted(hb, np.uint64(theta)))
            ha, sa_s = ha[:ca], sa[:ca]
            hb, sb_s = hb[:cb], sb[:cb]

            common, ia, ib = np.intersect1d(ha, hb, assume_unique=True, return_indices=True)
            mask_a_only = np.ones(len(ha), bool); mask_a_only[ia] = False
            mask_b_only = np.ones(len(hb), bool); mask_b_only[ib] = False

            u_h = np.concatenate([common, ha[mask_a_only], hb[mask_b_only]])
            u_s = np.concatenate([
                _combine_summaries(sa_s[ia], sb_s[ib], policy),
                sa_s[mask_a_only],
                sb_s[mask_b_only],
            ])
            order = np.argsort(u_h, kind="stable")
            u_h, u_s = u_h[order], u_s[order]
            if len(u_h) > k:
                theta = int(u_h[k])
                u_h, u_s = u_h[:k], u_s[:k]
                ca = int(np.searchsorted(ha, np.uint64(theta)))
                cb = int(np.searchsorted(hb, np.uint64(theta)))
                ha, sa_s = ha[:ca], sa[:ca]
                hb, sb_s = hb[:cb], sb[:cb]
                common, ia, ib = np.intersect1d(ha, hb, assume_unique=True, return_indices=True)
                mask_a_only = np.ones(len(ha), bool); mask_a_only[ia] = False

            i_s = _combine_summaries(sa_s[ia], sb_s[ib], policy)
            anb_h, anb_s = ha[mask_a_only], sa_s[mask_a_only]

            frac = theta / float(MAX_THETA)
            def est(n):
                return float(n) / frac
            def vsum(arr):
                return (arr.sum(axis=0) / frac if len(arr) else np.zeros(d)).tolist()

            out.append({
                "key": key,
                "theta": -1 if theta >= MAX_THETA else theta,
                "est_a": est(len(ha)), "est_b": est(len(hb)),
                "est_union": est(len(u_h)),
                "est_intersection": est(len(common)),
                "est_a_not_b": est(len(anb_h)),
                "vsum_a": vsum(sa_s), "vsum_b": vsum(sb_s),
                "vsum_union": vsum(u_s),
                "vsum_intersection": vsum(i_s),
                "vsum_a_not_b": vsum(anb_s),
            })
        return pd.DataFrame(out)

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            yield compute(pdf)

    return joined.mapInPandas(run, schema)


# -- array-of-strings (AoS) tuple sketch --------------------------------------

_AOS_KEY_SEED = 0x7A3CCA71  # array_of_strings_sketch_impl.hpp:55


def aos_hash_key(key) -> int:
    """The reference's hash_array_of_strings_key
    (array_of_strings_sketch_impl.hpp:53-66): XXHash64 with seed
    0x7A3CCA71 over the UTF-8 strings joined by ',' — the value a caller
    passes to update() as the sketch key. Returns the unsigned u64."""
    from ..hashing import xxhash64_bytes

    return xxhash64_bytes(b",".join(s.encode("utf-8") for s in key),
                          _AOS_KEY_SEED)


def _aos_fold(hashes: np.ndarray, values: list) -> tuple[np.ndarray, list]:
    """One summary per unique retained hash. The reference's replace
    policy is last-write-wins (order-dependent); a distributed agg has no
    global order, so the winner is made deterministic: the
    lexicographically-greatest string tuple. Layout-invariant by
    construction."""
    best: dict[int, tuple] = {}
    for h, v in zip(hashes.tolist(), values):
        t = tuple(v)
        prev = best.get(h)
        if prev is None or t > prev:
            best[h] = t
    hs = np.array(sorted(best), np.uint64)
    return hs, [list(best[int(h)]) for h in hs]


def _aos_cut(
    hashes: np.ndarray, values: list, theta: int, k: int
) -> tuple[int, np.ndarray, list]:
    keep = hashes < np.uint64(theta)
    values = [v for v, kp in zip(values, keep) if kp]
    hashes = hashes[keep]
    if len(hashes) > k:
        theta = int(hashes[k])  # hashes sorted by _aos_fold
        hashes, values = hashes[:k], values[:k]
    return theta, hashes, values


def aos_sketch_agg(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    value_col: str,
    lg_k: int = 12,
    seed: int = DEFAULT_SEED,
) -> DataFrame:
    """groupBy(group_cols).array_of_strings_sketch(key, value) → one row
    per group: (group..., theta long [-1 ⇔ exact], sig array<long>,
    summaries array<array<string>> aligned with sig).

    ``key_col`` and ``value_col`` are array<string> columns: the key is
    hashed with the reference's AoS key scheme (aos_hash_key → the
    sketch's canonical 8-byte-message hash), the value lands as the
    retained entry's summary under the replace policy (deterministic
    greatest-tuple winner; the reference's policy is last-write-wins,
    which has no distributed meaning). Same k-min cut / lazy 2k-trim as
    every other sketch agg here."""
    k = 1 << lg_k
    group_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name in group_cols
    )
    prefix = f"{group_fields}, " if group_fields else ""
    schema = (
        f"{prefix}theta long, sig array<long>, summaries array<array<string>>"
    )

    def _hashes(series: pd.Series) -> np.ndarray:
        k64 = np.array(
            [aos_hash_key(key) for key in series], np.uint64
        ).view(np.int64)
        return hash63_int64(k64, seed)

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict[tuple, tuple[int, np.ndarray, list]] = {}
        for pdf in batches:
            pdf = pdf[pdf[key_col].notna()]
            if len(pdf) == 0:
                continue
            hashes_all = _hashes(pdf[key_col])
            vals_all = [
                [] if v is None else list(v) for v in pdf[value_col]
            ]
            grouped = (
                pdf.groupby(group_cols, sort=False, dropna=False).indices
                if group_cols
                else {(): np.arange(len(pdf))}
            )
            for gkey, idx in grouped.items():
                gkey = gkey if isinstance(gkey, tuple) else (gkey,)
                h, v = _aos_fold(
                    hashes_all[idx], [vals_all[i] for i in idx]
                )
                if gkey in acc:
                    ptheta, ph, pv = acc[gkey]
                    keep = h < np.uint64(ptheta)
                    h, v = _aos_fold(
                        np.concatenate([ph, h[keep]]),
                        pv + [vi for vi, kp in zip(v, keep) if kp],
                    )
                    theta = ptheta
                else:
                    theta = MAX_THETA
                if len(h) > 2 * k:
                    theta, h, v = _aos_cut(h, v, theta, k)
                acc[gkey] = (theta, h, v)
        rows = []
        for gkey, (theta, h, v) in acc.items():
            theta, h, v = _aos_cut(h, v, theta, k)
            r = {c: gkey[i] for i, c in enumerate(group_cols)}
            r["theta"] = -1 if theta >= MAX_THETA else theta
            r["sig"] = h.astype(np.int64)
            r["summaries"] = v
            rows.append(r)
        if not rows:
            return
        yield pd.DataFrame(rows, columns=group_cols + ["theta", "sig", "summaries"])

    partials = df.select(group_cols + [key_col, value_col]).mapInPandas(
        partial, schema
    )

    def final(pdf: pd.DataFrame) -> pd.DataFrame:
        ts = pdf["theta"].to_numpy()
        enc = ts[ts >= 0]
        theta = int(enc.min()) if len(enc) else MAX_THETA
        hs = np.concatenate(
            [np.asarray(s, np.int64).astype(np.uint64) for s in pdf["sig"]]
        ) if len(pdf) else np.empty(0, np.uint64)
        vs = [list(item) for s in pdf["summaries"] for item in s]
        h, v = _aos_fold(hs, vs)
        theta, h, v = _aos_cut(h, v, theta, k)
        r = {c: [pdf[c].iloc[0]] for c in group_cols}
        r["theta"] = [-1 if theta >= MAX_THETA else theta]
        r["sig"] = [h.astype(np.int64)]
        r["summaries"] = [v]
        return pd.DataFrame(r, columns=group_cols + ["theta", "sig", "summaries"])

    if group_cols:
        return partials.groupBy(*group_cols).applyInPandas(final, schema)
    return partials.groupBy(F.lit(1).alias("_g")).applyInPandas(final, schema)


def tuple_jaccard(
    row_a, row_b, k: int = 1 << 12, num_std_devs: float = 2.0
) -> tuple[float, float, float]:
    """{lower, estimate, upper} Jaccard over two tuple-sketch rows
    (anything name-indexable with ``theta`` [-1 ⇔ exact] and ``sig``,
    e.g. a Row from any *_sketch_agg here) — the reference's
    tuple_jaccard_similarity is the theta jaccard template instantiated
    over tuple entries' keys (tuple_jaccard_similarity.hpp:35,
    pair_extract_key); summaries play no role in the similarity, so the
    engine reuses kmv.jaccard on the key signatures directly."""
    from .. import kmv

    def to_theta(row):
        theta = int(row["theta"])
        t = kmv.MAX_THETA if theta < 0 else theta
        h = np.sort(np.asarray(row["sig"], np.int64).view(np.uint64))
        return kmv.ThetaSketch(k, t, h)

    return kmv.jaccard(to_theta(row_a), to_theta(row_b), num_std_devs)
