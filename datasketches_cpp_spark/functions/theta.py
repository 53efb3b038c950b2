"""Theta sketch as a Spark aggregate — the (update, merge, estimate) triple
mapped onto Spark's partial/final aggregation contract.

The reference's update loop (theta_update_sketch_base_impl.hpp:137-251) runs
*inside each input partition* as a `mapInPandas` fold that emits one partial
sketch row per (group, partition) — the map-side combine. The union
(theta_union_base_impl.hpp:38-81) runs after the shuffle as
`groupBy().applyInPandas`. This is explicit because Python UDAFs get no
partial push-down from Catalyst (SURVEY.md §4): without the map-side stage a
100 TB scan would shuffle raw rows; with it, the shuffle carries at most
(#groups × #partitions × k × 8) bytes.

Estimates and bounds are computed JVM-side with built-in column functions
wherever possible (size(sig)/theta-fraction needs no UDF at all).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StructField,
    StructType,
)

from ..hashing import DEFAULT_SEED, hash63_bytes_many, hash63_int64, hash63_str_many
from ..kmv import MAX_THETA

from ..hashing import INT_DTYPES as _INT_TYPES  # one shared definition


def _hash_series(s: pd.Series, dtype: str, seed: int) -> np.ndarray:
    """Hash one pandas column exactly like the reference hashes items:
    ints widen to int64 / 8 LE bytes (theta_sketch_impl.hpp:146-183),
    strings are UTF-8 bytes (:186-199), binary is raw bytes (:202-209).
    Nulls and empty strings are no-ops (skipped)."""
    mask = s.notna().to_numpy()
    if dtype in _INT_TYPES:
        vals = s.dropna().to_numpy(dtype=np.int64)
        return hash63_int64(vals, seed), mask
    if dtype == "binary":
        bufs = [bytes(b) for b in s.dropna() if len(b) > 0]
        arr = hash63_bytes_many(bufs, seed)
        mask = mask & s.map(lambda b: b is not None and len(b) > 0).to_numpy()
        return arr, mask
    # default: stringify (covers string, decimal rendered as text)
    vals = [str(v) for v in s.dropna() if str(v) != ""]
    mask = mask & (s.astype("string").fillna("").str.len() > 0).to_numpy()
    return hash63_str_many(vals, seed), mask


def _kmin_merge(state: tuple[int, np.ndarray], new_hashes: np.ndarray, k: int) -> tuple[int, np.ndarray]:
    """Fold a batch of hashes into (theta, sorted sig) — whole-batch rebuild."""
    theta, sig = state
    h = np.unique(new_hashes)
    if theta < MAX_THETA:
        h = h[: np.searchsorted(h, np.uint64(theta))]
    merged = np.union1d(sig, h) if len(sig) else h
    if len(merged) > k:
        theta = int(merged[k])
        merged = merged[:k]
    return theta, merged


def _encode_theta(theta: int) -> int:
    return -1 if theta >= MAX_THETA else theta


def _decode_theta(enc: int) -> int:
    return MAX_THETA if enc < 0 else int(enc)


def sketch_schema(group_fields: list[StructField]) -> StructType:
    return StructType(
        list(group_fields)
        + [
            StructField("theta", LongType(), False),
            StructField("sig", ArrayType(LongType(), False), False),
        ]
    )


def theta_sketch_agg(
    df: DataFrame,
    group_cols: list[str],
    item_col: str,
    lg_k: int = 12,
    seed: int = DEFAULT_SEED,
    p: float = 1.0,
) -> DataFrame:
    """groupBy(group_cols).theta_sketch(item_col) with explicit two-stage
    (partial per input partition → shuffle → final union) aggregation.

    ``p`` is the up-front sampling probability of the reference builder's
    set_p (theta_update_sketch_base.hpp): the sketch starts at
    theta = p·2^63 instead of exact mode, dropping 1−p of the hash space
    before any k-min cut — estimates and binomial bounds stay unbiased
    because both condition only on the final theta fraction.

    Returns DataFrame(group_cols..., theta long, sig array<long>) where
    theta = -1 encodes exact mode (theta == 2^63)."""
    if not 0.0 < p <= 1.0:
        raise ValueError(f"sampling probability p must be in (0, 1], got {p}")
    k = 1 << lg_k
    theta0 = MAX_THETA if p == 1.0 else int(p * MAX_THETA)
    item_dtype = dict(df.dtypes)[item_col]
    group_fields = [f for f in df.schema.fields if f.name in group_cols]
    out_schema = sketch_schema(group_fields)

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Deferred compaction (r6): the old fold ran _kmin_merge — an
        # O(k log k) union1d over the CURRENT sig — once per Arrow batch,
        # i.e. ~k/batch_size times more sort work than the data warrants
        # (at lg_k=18 over 8k-row batches that was ~32× overhead, ~45% of
        # the whole agg stage). Incoming hash batches are now buffered
        # per group and compacted only when the buffer outgrows 4k (and
        # once at the end). k-min-of-distinct is order/batching
        # insensitive, and theta only shrinks, so a stale (larger) theta
        # screen at compaction time keeps extra rows the final compaction
        # removes — the emitted partial sketch is bit-identical.
        state: dict[tuple, tuple[int, np.ndarray]] = {}
        bufs: dict[tuple, list[np.ndarray]] = {}
        buf_n: dict[tuple, int] = {}
        compact_at = 4 * k

        def _compact(key) -> None:
            pend = bufs.pop(key, None)
            if not pend:
                return
            buf_n[key] = 0
            st = state.get(key, (theta0, np.empty(0, np.uint64)))
            state[key] = _kmin_merge(st, np.concatenate(pend), k)

        for pdf in batches:
            hashes, mask = _hash_series(pdf[item_col], item_dtype, seed)
            if len(group_cols) == 0:
                grouped = {(): np.arange(mask.sum())}
            else:
                kept = pdf.loc[mask, group_cols]
                grouped = kept.groupby(group_cols, sort=False, dropna=False).indices
            for key, idx in grouped.items():
                key = key if isinstance(key, tuple) else (key,)
                h = hashes[idx]
                theta_now = state.get(key, (theta0, None))[0]
                if theta_now < MAX_THETA:
                    h = h[h < np.uint64(theta_now)]
                bufs.setdefault(key, []).append(h)
                buf_n[key] = buf_n.get(key, 0) + len(h)
                if buf_n[key] >= compact_at:
                    _compact(key)
        for key in list(bufs):
            _compact(key)
        if not state:
            # Empty input partition (common at sf>=0.1 where parquet row
            # groups leave most scan partitions rowless): yield NOTHING.
            # An empty pd.DataFrame built from {} lists infers float64 for
            # the sig column and pyarrow cannot convert float64 ndarray ->
            # list<int64>, crashing the whole job (round-1 driver bench).
            return
        rows = {
            c: [key[i] for key in state] for i, c in enumerate(group_cols)
        }
        rows["theta"] = [_encode_theta(t) for t, _ in state.values()]
        rows["sig"] = [s.astype(np.int64) for _, s in state.values()]
        yield pd.DataFrame(rows, columns=group_cols + ["theta", "sig"])

    partials = df.select(group_cols + [item_col]).mapInPandas(partial, out_schema)
    return _final_merge(partials, group_cols, k, out_schema)


def _merge_pdf(pdf: pd.DataFrame, group_cols: list[str], k: int) -> pd.DataFrame:
    theta = min((_decode_theta(t) for t in pdf["theta"]), default=MAX_THETA)
    sigs = [np.asarray(s, dtype=np.int64).astype(np.uint64) for s in pdf["sig"]]
    merged = np.unique(np.concatenate(sigs)) if sigs else np.empty(0, np.uint64)
    merged = merged[: np.searchsorted(merged, np.uint64(theta))]
    if len(merged) > k:
        theta = int(merged[k])
        merged = merged[:k]
    row = {c: [pdf[c].iloc[0]] for c in group_cols}
    row["theta"] = [_encode_theta(theta)]
    row["sig"] = [merged.astype(np.int64)]
    return pd.DataFrame(row, columns=group_cols + ["theta", "sig"])


def _final_merge(partials: DataFrame, group_cols: list[str], k: int, schema: StructType) -> DataFrame:
    if group_cols:
        return partials.groupBy(*group_cols).applyInPandas(
            lambda pdf: _merge_pdf(pdf, group_cols, k), schema
        )
    return partials.groupBy(F.lit(1).alias("_g")).applyInPandas(
        lambda pdf: _merge_pdf(pdf, [], k), schema
    )


def with_estimate(sketch_df: DataFrame, out_col: str = "estimate") -> DataFrame:
    """num_retained / theta-fraction, entirely JVM-side (no UDF):
    theta = -1 ⇔ exact ⇒ estimate = size(sig)."""
    frac = F.col("theta").cast("double") / F.lit(float(MAX_THETA))
    est = F.when(F.col("theta") < 0, F.size("sig").cast("double")).otherwise(
        F.size("sig").cast("double") / frac
    )
    return sketch_df.withColumn(out_col, est)


def with_bounds(sketch_df: DataFrame, num_std_devs: int = 2) -> DataFrame:
    """Binomial bounds, entirely JVM-side: the Gaussian-with-continuity-
    correction closed forms of the reference's n>120 regime
    (binomial_bounds.hpp cont_classic_lb/ub — exactly the regime every
    estimation-mode sketch with k > 120 lands in, so the SQL expressions
    match kmv.ThetaSketch.get_bounds to machine precision there). Sketch
    rows with ≤ 120 retained entries in estimation mode (deep
    intersections of tiny sketches) get the same closed form rather than
    the reference's exact small-n evaluation — use the Python-side
    get_bounds for those."""
    df = with_estimate(sketch_df, "estimate")
    n = F.size("sig").cast("double")
    f = F.when(F.col("theta") < 0, F.lit(1.0)).otherwise(
        F.col("theta").cast("double") / F.lit(float(MAX_THETA))
    )
    z = F.lit(float(num_std_devs))
    b = z * F.sqrt((F.lit(1.0) - f) / f)
    nhat_lb = (n - F.lit(0.5)) / f
    raw_lb = (
        nhat_lb + F.lit(0.5) * b * b
        - F.lit(0.5) * b * F.sqrt(b * b + F.lit(4.0) * nhat_lb)
        - F.lit(0.5)
    )
    nhat_ub = (n + F.lit(0.5)) / f
    raw_ub = (
        nhat_ub + F.lit(0.5) * b * b
        + F.lit(0.5) * b * F.sqrt(b * b + F.lit(4.0) * nhat_ub)
        + F.lit(0.5)
    )
    exact = (F.col("theta") < 0) | (n == 0)
    lb = F.when(exact, F.col("estimate")).otherwise(
        F.least(F.col("estimate"), F.greatest(n, raw_lb))
    )
    ub = F.when(exact, F.col("estimate")).otherwise(
        F.greatest(F.col("estimate"), raw_ub)
    )
    return df.withColumn("lower_bound", lb).withColumn("upper_bound", ub)


def theta_union_agg(sketch_df: DataFrame, group_cols: list[str], k: int) -> DataFrame:
    """Re-aggregate sketch rows to coarser groups (rollup): pure merge, no
    raw data touched — the reason sketches beat exact distinct at scale."""
    group_fields = [f for f in sketch_df.schema.fields if f.name in group_cols]
    schema = sketch_schema(group_fields)
    return _final_merge(sketch_df, group_cols, k, schema)


_SETOP_SCHEMA = "key string, theta long, sig array<long>, est_a double, est_b double, est_union double, est_intersection double, est_a_not_b double, jaccard double, jaccard_lb double, jaccard_ub double"


def theta_pair_set_ops(
    df_a: DataFrame, df_b: DataFrame, key_cols: list[str], k: int
) -> DataFrame:
    """Join two keyed sketch tables and compute union / intersection /
    a-not-b / jaccard per key in one vectorized pass (the S7 verification
    math on arbitrary keyed sketches). Missing side = empty sketch."""
    a = df_a.select(
        *key_cols, F.col("theta").alias("theta_a"), F.col("sig").alias("sig_a")
    )
    b = df_b.select(
        *key_cols, F.col("theta").alias("theta_b"), F.col("sig").alias("sig_b")
    )
    joined = a.join(b, key_cols, "full_outer")

    from ..kmv import ThetaSketch, a_not_b, intersection, jaccard, union

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        # Column-zip iteration: one Python step per SKETCH PAIR (each
        # carrying O(k) numpy work), never per data row — no pandas
        # row-object construction in the loop.
        def mk(theta, sig):
            if sig is None or (isinstance(sig, float) and pd.isna(sig)):
                return ThetaSketch(k, MAX_THETA)
            arr = np.asarray(sig, dtype=np.int64).astype(np.uint64)
            return ThetaSketch(k, _decode_theta(int(theta)), arr)

        if key_cols:
            keys = [
                "|".join(map(str, vals))
                for vals in zip(*(pdf[c].to_numpy() for c in key_cols))
            ]
        else:
            keys = [""] * len(pdf)
        out = []
        for key, theta_a, sig_a, theta_b, sig_b in zip(
            keys,
            pdf["theta_a"].to_numpy(),
            pdf["sig_a"].to_numpy(),
            pdf["theta_b"].to_numpy(),
            pdf["sig_b"].to_numpy(),
        ):
            sa = mk(theta_a if pd.notna(theta_a) else -1, sig_a)
            sb = mk(theta_b if pd.notna(theta_b) else -1, sig_b)
            u = union([sa, sb], k=k)
            jl, je, ju = jaccard(sa, sb)
            out.append(
                {
                    "key": key,
                    "theta": _encode_theta(u.theta),
                    "sig": u.hashes.astype(np.int64),
                    "est_a": sa.get_estimate(),
                    "est_b": sb.get_estimate(),
                    "est_union": u.get_estimate(),
                    "est_intersection": intersection(sa, sb).get_estimate(),
                    "est_a_not_b": a_not_b(sa, sb).get_estimate(),
                    "jaccard": je,
                    "jaccard_lb": jl,
                    "jaccard_ub": ju,
                }
            )
        return pd.DataFrame(out)

    return joined.mapInPandas(lambda it: (compute(pdf) for pdf in it), _SETOP_SCHEMA)
