"""S7: pairwise verification — the theta-Jaccard query path
(/root/reference/theta/include/theta_jaccard_similarity_base.hpp:55-146)
batch-applied to millions of candidate pairs per task.

Candidates join the signature table twice (sort-merge on id; Catalyst/AQE
pick broadcast automatically when the sig side is small), then one
`mapInArrow` computes, fully vectorized per Arrow batch:

  * MinHash lane-agreement Jaccard (aligned lanes ⇒ one 2-D `==` + mean),
  * KMV bottom-k Jaccard (the reference's |a∩b|/|a∪b| below min theta) —
    tighter, used as the decision estimate,
  * SimHash hamming distance (bit_count of xor),
  * exact-content equality (kmv theta+sig identity ⇒ same shingle set).

A pair passes if ANY enabled lane passes (OR-fusion per SURVEY.md §2B S7).

The KMV lane reads the signature list-columns zero-copy from Arrow (flat
values + offsets, no per-row array materialization) and intersects all
pairs of a batch at once via a padded row-sort — no per-pair Python.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .sigkernel import MAX_THETA, SigConfig, hamming64

_SENTINEL = np.uint64(0xFFFFFFFFFFFFFFFF)  # hashes are < 2^63, sorts last
_VERIFY_CHUNK = 16384  # rows per padded 2-D block (bounds block memory)


def _flatten(sig: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Series of int64 arrays → (flat uint64 values, per-row lengths).
    Pandas fallback path; the Spark path gets these zero-copy from Arrow."""
    arrs = sig.to_numpy()
    lens = np.fromiter((len(a) for a in arrs), dtype=np.int64, count=len(arrs))
    if lens.sum() == 0:
        return np.empty(0, np.uint64), lens
    flat = np.concatenate(arrs).astype(np.int64, copy=False).view(np.uint64)
    return flat, lens


def _kmv_jaccard_flat(
    vals_a: np.ndarray,
    len_a: np.ndarray,
    vals_b: np.ndarray,
    len_b: np.ndarray,
    theta_a: np.ndarray,
    theta_b: np.ndarray,
) -> np.ndarray:
    """Segmented KMV Jaccard over flat (values, lengths) columns.

    For each pair i: J = |a∩b| / |a∪b| over entries < min(theta_a, theta_b)
    (theta encoded as int64, -1 ⇔ MAX_THETA / exact mode).

    Vectorization: scatter both sides of a chunk of pairs into one
    (rows, max_width) uint64 matrix padded with a sorts-last sentinel;
    theta-screen in 2-D (values ≥ theta → sentinel); `sort(axis=1)`; then
    |a∩b| = per-row count of adjacent duplicates and |a∪b| = per-row count
    of kept entries − |a∩b|. KMV sigs are duplicate-free per side, so
    adjacent-duplicate counting is exact. Replaces a ~19 µs/pair Python
    loop with a few C passes (~20× on 1M-pair batches)."""
    n = len(len_a)
    if n == 0:
        return np.empty(0, np.float64)
    ta = np.where(theta_a < 0, np.uint64(MAX_THETA), theta_a.astype(np.uint64))
    tb = np.where(theta_b < 0, np.uint64(MAX_THETA), theta_b.astype(np.uint64))
    theta = np.minimum(ta, tb)

    len_a = np.asarray(len_a, np.int64)
    len_b = np.asarray(len_b, np.int64)
    ends_a = np.cumsum(len_a)
    ends_b = np.cumsum(len_b)

    inter = np.zeros(n, dtype=np.int64)
    kept = np.zeros(n, dtype=np.int64)
    width_all = len_a + len_b
    for lo in range(0, n, _VERIFY_CHUNK):
        hi = min(lo + _VERIFY_CHUNK, n)
        width = int(width_all[lo:hi].max(initial=0))
        if width == 0:
            continue
        mat = np.full((hi - lo, width), _SENTINEL, dtype=np.uint64)
        # chunk rows are contiguous slices of the flat arrays; boolean-mask
        # assignment fills in row-major order, which is exactly the ragged
        # concatenation order — no per-element row/col index arrays needed
        a0 = ends_a[lo - 1] if lo else 0
        b0 = ends_b[lo - 1] if lo else 0
        a1, b1 = ends_a[hi - 1], ends_b[hi - 1]
        grid = np.arange(width, dtype=np.int64)[None, :]
        la_c = len_a[lo:hi, None]
        mat[grid < la_c] = vals_a[a0:a1]
        mat[(grid >= la_c) & (grid < la_c + len_b[lo:hi, None])] = vals_b[b0:b1]
        inter[lo:hi], kept[lo:hi] = _mat_inter_kept(mat, theta[lo:hi])

    union = kept - inter
    out = np.ones(n, dtype=np.float64)  # both-empty ⇒ 1.0
    nz = union > 0
    out[nz] = inter[nz] / union[nz]
    return out


def _mat_inter_kept(mat: np.ndarray, theta: np.ndarray) -> tuple:
    """Core of the KMV Jaccard: given a sentinel-padded (rows, width)
    uint64 matrix whose row = concat(a_sig, b_sig) in any order, and the
    per-row min-theta, return (|a∩b|, kept) per row. MUTATES mat.
    Shared by the flat kernel above and the pair-decider's padded path
    (operators/dedup) so the screen/sort/count math exists once."""
    mat[mat >= theta[:, None]] = _SENTINEL  # 2-D min-theta screen
    mat.sort(axis=1)
    not_pad = mat != _SENTINEL
    dup = (mat[:, 1:] == mat[:, :-1]) & not_pad[:, :-1]
    return dup.sum(axis=1), not_pad.sum(axis=1)


def _kmv_jaccard_padded(
    mat_a: np.ndarray,
    mat_b: np.ndarray,
    theta_a: np.ndarray,
    theta_b: np.ndarray,
) -> np.ndarray:
    """KMV Jaccard over two already-sentinel-padded per-pair matrices
    (rows aligned): hstack + the shared core — skips the ragged
    flatten/scatter round trip of the flat kernel when callers (the pair
    decider) hold padded per-doc rows anyway. Identical math: padding is
    the sorts-last sentinel, the screen maps sentinels to themselves, and
    kept counts only sub-theta values."""
    n = len(mat_a)
    if n == 0:
        return np.empty(0, np.float64)
    ta = np.where(theta_a < 0, np.uint64(MAX_THETA), theta_a.astype(np.uint64))
    tb = np.where(theta_b < 0, np.uint64(MAX_THETA), theta_b.astype(np.uint64))
    theta = np.minimum(ta, tb)
    inter = np.zeros(n, dtype=np.int64)
    kept = np.zeros(n, dtype=np.int64)
    for lo in range(0, n, _VERIFY_CHUNK):
        hi = min(lo + _VERIFY_CHUNK, n)
        mat = np.hstack([mat_a[lo:hi], mat_b[lo:hi]])
        inter[lo:hi], kept[lo:hi] = _mat_inter_kept(mat, theta[lo:hi])
    union = kept - inter
    out = np.ones(n, dtype=np.float64)  # both-empty ⇒ 1.0
    nz = union > 0
    out[nz] = inter[nz] / union[nz]
    return out


def _kmv_jaccard_batch(
    sig_a: pd.Series, sig_b: pd.Series, theta_a: np.ndarray, theta_b: np.ndarray
) -> np.ndarray:
    """Pandas-Series entry point (tests / non-Arrow callers)."""
    flat_a, len_a = _flatten(sig_a)
    flat_b, len_b = _flatten(sig_b)
    return _kmv_jaccard_flat(flat_a, len_a, flat_b, len_b, theta_a, theta_b)


def _list_flat(arr) -> tuple[np.ndarray, np.ndarray]:
    """Arrow ListArray of int64 → (flat uint64 values, per-row lengths),
    zero-copy where the layout allows."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    offs = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    lens = np.diff(offs)
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    return flat.astype(np.int64, copy=False).view(np.uint64), lens


VERIFIED_SCHEMA_SUFFIX = (
    "jaccard double, mh_jaccard double, simhash_hamming int, "
    "exact_match boolean, passed boolean"
)


def verify_pairs(
    pairs: DataFrame,
    sig_df: DataFrame,
    cfg: SigConfig,
    use_simhash: bool = True,
    include_mh: bool = True,
) -> DataFrame:
    """(a, b) candidates → (a, b, jaccard, mh_jaccard, simhash_hamming,
    exact_match, passed).

    ``include_mh=False`` drops the MinHash lane-agreement diagnostic:
    the pass decision only reads the KMV Jaccard and SimHash lanes, and
    the mh_sig columns are ~half the per-pair payload (num_perm longs per
    SIDE) shipped through the join + Arrow boundary — on the flagship
    path that's pure memory-bandwidth cost for a column nobody reads, so
    the pipeline call sites disable it (mh_jaccard comes back null; the
    schema — and the verified pair set — are identical either way)."""
    sig_cols = ["id", "kmv_theta", "kmv_sig", "simhash"] + (
        ["mh_sig"] if include_mh else []
    )
    sig = sig_df.select(*sig_cols)
    mh_a = [F.col("mh_sig").alias("mh_a")] if include_mh else []
    mh_b = [F.col("mh_sig").alias("mh_b")] if include_mh else []
    a_side = sig.select(
        F.col("id").alias("a"),
        *mh_a,
        F.col("kmv_theta").alias("th_a"),
        F.col("kmv_sig").alias("kv_a"),
        F.col("simhash").alias("sh_a"),
    )
    b_side = sig.select(
        F.col("id").alias("b"),
        *mh_b,
        F.col("kmv_theta").alias("th_b"),
        F.col("kmv_sig").alias("kv_b"),
        F.col("simhash").alias("sh_b"),
    )
    joined = pairs.join(a_side, "a").join(b_side, "b")
    id_type = dict(pairs.dtypes)["a"]
    schema = f"a {id_type}, b {id_type}, {VERIFIED_SCHEMA_SUFFIX}"

    thr = cfg.jaccard_threshold
    max_ham = cfg.simhash_hamming

    def run(batches) -> Iterator:
        import pyarrow as pa

        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            cols = {name: rb.column(i) for i, name in enumerate(rb.schema.names)}
            if include_mh:
                mh_a, mh_len_a = _list_flat(cols["mh_a"])
                mh_b, mh_len_b = _list_flat(cols["mh_b"])
                # MinHash lanes are fixed-width -> one reshape + 2-D compare
                num_perm = int(mh_len_a[0]) if n else 0
                if num_perm and (mh_len_a == num_perm).all() and (mh_len_b == num_perm).all():
                    mh_j = (
                        (mh_a.reshape(n, num_perm) == mh_b.reshape(n, num_perm))
                        .mean(axis=1)
                    )
                else:  # ragged (shouldn't happen): per-row fallback
                    oa = np.concatenate([[0], np.cumsum(mh_len_a)])
                    ob = np.concatenate([[0], np.cumsum(mh_len_b)])
                    mh_j = np.array(
                        [
                            (mh_a[oa[i]:oa[i + 1]] == mh_b[ob[i]:ob[i + 1]]).mean()
                            if mh_len_a[i] == mh_len_b[i] and mh_len_a[i]
                            else 0.0
                            for i in range(n)
                        ]
                    )
                mh_arr = pa.array(mh_j, type=pa.float64())
            else:
                mh_arr = pa.nulls(n, pa.float64())
            th_a = cols["th_a"].to_numpy(zero_copy_only=False)
            th_b = cols["th_b"].to_numpy(zero_copy_only=False)
            kv_a, kv_len_a = _list_flat(cols["kv_a"])
            kv_b, kv_len_b = _list_flat(cols["kv_b"])
            kmv_j = _kmv_jaccard_flat(kv_a, kv_len_a, kv_b, kv_len_b, th_a, th_b)
            sh = hamming64(
                cols["sh_a"].to_numpy(zero_copy_only=False).astype(np.uint64),
                cols["sh_b"].to_numpy(zero_copy_only=False).astype(np.uint64),
            )
            exact = (kmv_j == 1.0) & (th_a == th_b)
            passed = kmv_j >= thr
            if use_simhash:
                passed = passed | (sh <= max_ham)
            yield pa.RecordBatch.from_arrays(
                [
                    cols["a"],
                    cols["b"],
                    pa.array(kmv_j, type=pa.float64()),
                    mh_arr,
                    pa.array(sh.astype(np.int32), type=pa.int32()),
                    pa.array(exact, type=pa.bool_()),
                    pa.array(passed, type=pa.bool_()),
                ],
                names=[
                    "a", "b", "jaccard", "mh_jaccard",
                    "simhash_hamming", "exact_match", "passed",
                ],
            )

    return joined.mapInArrow(run, schema)
