"""CPC distinct counting — coupon-matrix re-derivation of the reference's
Compressed Probabilistic Counting sketch (cpc_sketch.hpp:64-303,
cpc_compressor.hpp, cpc_union.hpp:39-86). Re-derived from the published
algorithm (Lang, "Back to the Future: an Even More Nearly Optimal
Cardinality Estimation Algorithm"), NOT a port.

What CPC is: each distinct item deposits one *coupon* — a (row, column)
cell where row is uniform over K = 2^lg_k and column is geometric(1/2).
Cardinality is read from the total number of collected coupons C by
inverting the coupon-collector expectation curve

    E[C](n) = K * sum_{c=0}^{63} (1 - (1 - 2^-(c+1) / K)^n)

which is strictly increasing in n (the ICON estimator of the paper is a
precomputed spline of exactly this inversion; we invert numerically —
~100 bisection steps of a 64-term sum, driver-free, per *group*).

What we deliberately do NOT port: the reference's sliding-window +
surprising-value Fermat compression (cpc_compressor_impl.hpp). That
machinery exists to make the *serialized* sketch ~half the size of HLL at
equal accuracy. Here partial-sketch rows travel as Arrow/parquet array
columns between the map-side combine and the final merge, where columnar
encodings (RLE/dictionary/zstd) are the container's job; the engine keeps
the raw K-word coupon bitmatrix, whose merge is a plain bitwise OR —
associative, commutative, idempotent, the same merge-anywhere discipline
as theta's min-merge, so Spark can combine partials in any order.

Two-stage plan (same shape as functions/theta.py): mapInPandas partial
per input partition (vectorized np.bitwise_or scatter; state is O(K) per
group), then groupBy().applyInPandas final OR-merge. Estimates/bounds are
computed from the merged matrix; RSE envelope asserted empirically in
tests/test_cpc.py (observed ≈ 0.8/sqrt(K), consistent with the paper's
non-HIP ICON constant; bounds use a conservative 1.0/sqrt(K)).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..hashing import DEFAULT_SEED
from .tuplesketch import _hash_items

CPC_RSE_FACTOR = 1.0  # conservative envelope; reference ICON ≈ 0.83/√K


def _coupons(hashes: np.ndarray, lg_k: int) -> tuple[np.ndarray, np.ndarray]:
    """63-bit hashes → (row, col) coupon coordinates, vectorized.

    row = low lg_k bits (uniform over K); col = count of leading zeros in
    the remaining 63-lg_k bits read from bit lg_k upward (geometric(1/2),
    capped at 63 so the column always fits one uint64 word).
    """
    k_mask = np.uint64((1 << lg_k) - 1)
    rows = (hashes & k_mask).astype(np.int64)
    rest = hashes >> np.uint64(lg_k)
    width = 63 - lg_k
    # trailing-zero count of `rest` within `width` bits == geometric column
    # (bit j set with prob 1/2; col = index of first set bit)
    col = np.full(len(hashes), width, dtype=np.int64)
    found = np.zeros(len(hashes), dtype=bool)
    bit = np.uint64(1)
    for j in range(width):
        hit = (~found) & ((rest & bit) != 0)
        col[hit] = j
        found |= hit
        if found.all():  # ~half the survivors resolve per bit
            break
        bit = np.uint64(bit << np.uint64(1))
    return rows, np.minimum(col, 63)


def _fold_matrix(mat: np.ndarray, hashes: np.ndarray, lg_k: int) -> None:
    """OR the batch's coupons into the K-word matrix in place."""
    rows, cols = _coupons(hashes, lg_k)
    np.bitwise_or.at(mat, rows, np.uint64(1) << cols.astype(np.uint64))


def fold_matrix_k(mat: np.ndarray, levels: int = 1) -> np.ndarray:
    """Downsample a K-word coupon matrix to K/2^levels — the engine analog
    of the reference union's reduce-k path (cpc_union_impl.hpp reduce_k /
    walk_table_updating_sketch), which lets sketches built at different
    lg_k merge.

    EXACT: row = low lg_k hash bits and the column window starts at bit
    lg_k, so the row bit removed by halving becomes the new window's
    first bit.  Lower-half coupons keep their geometric tail one bit
    longer (col + 1 == word << 1); upper-half rows have that bit set, so
    ANY coupon there becomes col 0.  Hence fold(matrix@lg_k) ==
    matrix@(lg_k - levels) built from the same update stream."""
    mat = np.asarray(mat, np.uint64)
    for _ in range(levels):
        if mat.shape[0] <= 16:
            raise ValueError("cannot fold below lg_k = 4")
        k2 = mat.shape[0] // 2
        lo, hi = mat[:k2], mat[k2:]
        mat = (lo << np.uint64(1)) | (hi != 0).astype(np.uint64)
    return mat


def _coupon_count(mat: np.ndarray) -> int:
    # popcount via unpackbits on the byte view (numpy<2 safe)
    return int(np.unpackbits(mat.view(np.uint8)).sum())


def expected_coupons(n: float, lg_k: int) -> float:
    """E[C](n) for the coupon process at K = 2^lg_k."""
    k = float(1 << lg_k)
    c = np.arange(64, dtype=np.float64)
    p = (2.0 ** -(c + 1)) / k
    # (1-p)^n via expm1/log1p for numerical stability at tiny p, huge n
    return float(k * np.sum(-np.expm1(n * np.log1p(-p))))


def invert_coupons(coupons: int, lg_k: int) -> float:
    """Estimate n from observed coupon count by bisection on the strictly
    increasing E[C] curve (the numerical twin of the reference's ICON
    spline, cpc_confidence.cpp / icon_estimator.cpp)."""
    if coupons <= 0:
        return 0.0
    lo, hi = 0.0, 1.0
    while expected_coupons(hi, lg_k) < coupons and hi < 2**62:
        lo, hi = hi, hi * 2.0
    for _ in range(100):
        mid = 0.5 * (lo + hi)
        if expected_coupons(mid, lg_k) < coupons:
            lo = mid
        else:
            hi = mid
    return 0.5 * (lo + hi)


def _sketch_row(key, group_cols, lg_k: int, mat: np.ndarray) -> dict:
    r = {c: key[i] for i, c in enumerate(group_cols)}
    r["lg_k"] = lg_k
    r["coupons"] = mat.view(np.int64)
    return r


def cpc_sketch_agg(
    df: DataFrame,
    group_cols: list[str],
    item_col: str,
    lg_k: int = 11,
    seed: int = DEFAULT_SEED,
) -> DataFrame:
    """groupBy(group_cols).cpc_sketch(item) → one row per group:
    (group..., lg_k int, coupons array<long> of length K). Two-stage:
    map-side coupon fold (partial), OR-merge final — the shuffle carries
    K-word rows, never raw items."""
    k = 1 << lg_k
    item_dtype = dict(df.dtypes)[item_col]
    group_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name in group_cols
    )
    prefix = f"{group_fields}, " if group_fields else ""
    schema = f"{prefix}lg_k int, coupons array<long>"

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict[tuple, np.ndarray] = {}
        for pdf in batches:
            pdf = pdf[pdf[item_col].notna()]
            if len(pdf) == 0:
                continue
            hashes_all = _hash_items(pdf[item_col], item_dtype, seed)
            grouped = (
                pdf.groupby(group_cols, sort=False, dropna=False).indices
                if group_cols
                else {(): np.arange(len(pdf))}
            )
            for key, idx in grouped.items():
                key = key if isinstance(key, tuple) else (key,)
                mat = acc.get(key)
                if mat is None:
                    mat = np.zeros(k, dtype=np.uint64)
                    acc[key] = mat
                _fold_matrix(mat, hashes_all[idx], lg_k)
        if not acc:
            return  # empty partition: never yield an inferred-dtype frame
        yield pd.DataFrame(
            [_sketch_row(key, group_cols, lg_k, m) for key, m in acc.items()],
            columns=group_cols + ["lg_k", "coupons"],
        )

    partials = df.select(group_cols + [item_col]).mapInPandas(partial, schema)
    return _merge_sketches(partials, group_cols, schema)


def _merge_sketches(partials: DataFrame, group_cols: list[str], schema: str) -> DataFrame:
    def final(pdf: pd.DataFrame) -> pd.DataFrame:
        # mixed lg_k (reference cpc_union reduce-k semantics): fold larger
        # matrices down to the group's smallest k before the OR merge
        lg_k = int(pdf["lg_k"].min())
        mat = np.zeros(1 << lg_k, dtype=np.uint64)
        for arr, src_lg_k in zip(pdf["coupons"], pdf["lg_k"]):
            m = np.asarray(arr, dtype=np.int64).view(np.uint64)
            if int(src_lg_k) != lg_k:
                m = fold_matrix_k(m, int(src_lg_k) - lg_k)
            mat |= m
        row = {c: [pdf[c].iloc[0]] for c in group_cols}
        row["lg_k"] = [lg_k]
        row["coupons"] = [mat.view(np.int64)]
        return pd.DataFrame(row, columns=group_cols + ["lg_k", "coupons"])

    if group_cols:
        return partials.groupBy(*group_cols).applyInPandas(final, schema)
    return partials.repartition(1).groupBy().applyInPandas(final, schema)


def cpc_union_agg(sketch_df: DataFrame, group_cols: list[str]) -> DataFrame:
    """Union CPC sketch rows per group — bitwise-OR merge, the analog of
    cpc_union::update (cpc_union.hpp:39-86).  Mixed lg_k unions fold the
    larger matrices to the group's smallest k first (`fold_matrix_k`, the
    reference's reduce-k path), losslessly vs a direct build there."""
    fields = dict(zip(sketch_df.schema.names, sketch_df.schema.fields))
    group_fields = ", ".join(
        f"`{n}` {fields[n].dataType.simpleString()}" for n in group_cols
    )
    prefix = f"{group_fields}, " if group_fields else ""
    return _merge_sketches(
        sketch_df, group_cols, f"{prefix}lg_k int, coupons array<long>"
    )


def with_estimate(
    sketch_df: DataFrame, num_std_devs: int = 2, out_col: str = "estimate"
) -> DataFrame:
    """(lg_k, coupons) rows → + (estimate double, lower_bound, upper_bound).

    The inversion is a 64-term scalar computation per GROUP row (there is
    one sketch row per group after the merge), so a pandas UDF over the
    handful of result rows is the right altitude — the data-sized work
    already happened in the two-stage agg."""
    import pyspark.sql.functions as F
    import pyspark.sql.types as T

    @F.pandas_udf(T.DoubleType())
    def est(lg_ks: pd.Series, coupons: pd.Series) -> pd.Series:
        out = np.empty(len(lg_ks), dtype=np.float64)
        for i in range(len(lg_ks)):
            mat = np.asarray(coupons.iloc[i], dtype=np.int64).view(np.uint64)
            out[i] = invert_coupons(_coupon_count(mat), int(lg_ks.iloc[i]))
        return pd.Series(out)

    df = sketch_df.withColumn(out_col, est("lg_k", "coupons"))
    z = F.lit(float(num_std_devs)) * F.lit(CPC_RSE_FACTOR) / F.sqrt(
        F.pow(F.lit(2.0), F.col("lg_k").cast("double"))
    )
    return df.withColumn(
        "lower_bound", (F.col(out_col) / (1.0 + z)).cast("double")
    ).withColumn("upper_bound", (F.col(out_col) / (1.0 - z)).cast("double"))
