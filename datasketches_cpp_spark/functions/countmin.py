"""Count-min sketch — two-stage Spark aggregate over a d×w counter matrix.

Reference semantics (count/include/count_min.hpp, count_min_impl.hpp):
  - d = num_hashes rows × w = num_buckets columns of int64 counters;
  - row i hashes the item with seed derived from (base seed, i) —
    count_min_impl.hpp:155-191 seeds each row hash independently;
  - update adds weight to one bucket per row; estimate = min over rows
    (count_min_impl.hpp:229-238);
  - guarantee: f_true ≤ f_est ≤ f_true + ε·total_weight with
    ε = e/num_buckets at confidence 1 - δ, δ = exp(-num_hashes)
    (count_min.hpp:71-104);
  - suggest_num_buckets(rel_err) = ceil(e/ε), suggest_num_hashes(conf) =
    ceil(ln(1/(1-conf))) (count_min.hpp:93-104);
  - merge = element-wise add, defined only for identical (d, w, seed)
    (count_min_impl.hpp:242-247) — enforced here via the config columns.

Spark mapping: the matrix is one flattened array<long> per group; partial
matrices per input partition via ``mapInPandas`` (vectorized np.add.at),
final merge is an element-wise sum. The estimate path is a join of a probe
table against the (small, usually broadcast) sketch row.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..hashing import DEFAULT_SEED, hash63_int64, hash63_str_many

from ..hashing import INT_DTYPES as _INT_TYPES  # one shared definition


def suggest_num_buckets(relative_error: float) -> int:
    """ceil(e / ε) — count_min.hpp:93-97."""
    return int(math.ceil(math.e / relative_error))


def suggest_num_hashes(confidence: float) -> int:
    """ceil(ln(1/(1-confidence))) — count_min.hpp:99-104."""
    return int(math.ceil(math.log(1.0 / (1.0 - confidence))))


def relative_error(num_buckets: int) -> float:
    return math.e / num_buckets


def _row_hashes(
    items: pd.Series, dtype: str, num_hashes: int, num_buckets: int, seed: int
) -> np.ndarray:
    """(n, d) bucket indices; row i uses seed+i like the reference's
    per-row seeded hash family."""
    out = np.empty((len(items), num_hashes), dtype=np.int64)
    for i in range(num_hashes):
        row_seed = (seed + i * 0x9E3779B9) & 0xFFFFFFFFFFFFFFFF
        if dtype in _INT_TYPES:
            h = hash63_int64(items.to_numpy(dtype=np.int64), row_seed)
        else:
            h = hash63_str_many([str(v) for v in items], row_seed)
        out[:, i] = (h % np.uint64(num_buckets)).astype(np.int64)
    return out


def count_min_agg(
    df: DataFrame,
    group_cols: list[str],
    item_col: str,
    num_hashes: int = 7,
    num_buckets: int = 2719,
    seed: int = DEFAULT_SEED,
    weight_col: str | None = None,
) -> DataFrame:
    """groupBy(group_cols).count_min(item_col[, weight]) → one row per
    group: (group..., cm_matrix array<long> of d·w, cm_total long,
    num_hashes int, num_buckets int, seed long)."""
    item_dtype = dict(df.dtypes)[item_col]
    group_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name in group_cols
    )
    prefix = f"{group_fields}, " if group_fields else ""
    schema = (
        f"{prefix}cm_matrix array<long>, cm_total long, "
        "num_hashes int, num_buckets int, seed long"
    )
    cols = group_cols + [item_col] + ([weight_col] if weight_col else [])

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mats: dict[tuple, np.ndarray] = {}
        totals: dict[tuple, int] = {}
        for pdf in batches:
            pdf = pdf[pdf[item_col].notna()]
            if len(pdf) == 0:
                continue
            grouped = (
                pdf.groupby(group_cols, sort=False, dropna=False).indices
                if group_cols
                else {(): np.arange(len(pdf))}
            )
            for key, idx in grouped.items():
                key = key if isinstance(key, tuple) else (key,)
                mat = mats.setdefault(
                    key, np.zeros(num_hashes * num_buckets, dtype=np.int64)
                )
                sub = pdf.iloc[idx]
                bucket = _row_hashes(
                    sub[item_col], item_dtype, num_hashes, num_buckets, seed
                )  # (n, d)
                w = (
                    sub[weight_col].to_numpy().astype(np.int64)
                    if weight_col
                    else np.ones(len(sub), dtype=np.int64)
                )
                flat = bucket + np.arange(num_hashes) * num_buckets  # (n, d)
                np.add.at(mat, flat.ravel(), np.repeat(w, num_hashes))
                totals[key] = totals.get(key, 0) + int(w.sum())
        rows = []
        for key, mat in mats.items():
            r = {c: key[i] for i, c in enumerate(group_cols)}
            r.update(
                cm_matrix=mat, cm_total=totals[key],
                num_hashes=num_hashes, num_buckets=num_buckets, seed=seed,
            )
            rows.append(r)
        if not rows:
            return  # empty partition: never yield an empty inferred-dtype frame
        yield pd.DataFrame(
            rows,
            columns=group_cols
            + ["cm_matrix", "cm_total", "num_hashes", "num_buckets", "seed"],
        )

    partials = df.select(cols).mapInPandas(partial, schema)

    def final(pdf: pd.DataFrame) -> pd.DataFrame:
        # shape/seed must match to merge (count_min_impl.hpp:242-247)
        assert pdf["num_hashes"].nunique() == 1 and pdf["num_buckets"].nunique() == 1
        mat = np.zeros(num_hashes * num_buckets, dtype=np.int64)
        for m in pdf["cm_matrix"]:
            mat += np.asarray(m, dtype=np.int64)
        r = {c: [pdf[c].iloc[0]] for c in group_cols}
        r.update(
            cm_matrix=[mat], cm_total=[int(pdf["cm_total"].sum())],
            num_hashes=[num_hashes], num_buckets=[num_buckets], seed=[seed],
        )
        return pd.DataFrame(
            r,
            columns=group_cols
            + ["cm_matrix", "cm_total", "num_hashes", "num_buckets", "seed"],
        )

    if group_cols:
        return partials.groupBy(*group_cols).applyInPandas(final, schema)
    return partials.groupBy(F.lit(1).alias("_g")).applyInPandas(final, schema)


def estimate_frequencies(
    sketch_df: DataFrame,
    probe_df: DataFrame,
    item_col: str,
    join_cols: list[str] | None = None,
) -> DataFrame:
    """Probe table → (probe..., estimate long, upper_bound long,
    lower_bound long). With no join_cols the (single-row) sketch is
    cross-broadcast to every probe — the scale shape for 'one sketch, many
    lookups'. estimate = min over rows; bounds per count_min.hpp:71-88
    (upper = est, lower = est - ε·total)."""
    item_dtype = dict(probe_df.dtypes)[item_col]
    join_cols = join_cols or []
    sk = sketch_df.select(
        *(join_cols + ["cm_matrix", "cm_total", "num_hashes", "num_buckets", "seed"])
    )
    joined = (
        probe_df.join(F.broadcast(sk), join_cols)
        if join_cols
        else probe_df.crossJoin(F.broadcast(sk))
    )
    out_fields = [f"`{c}` {t}" for c, t in probe_df.dtypes]
    schema = ", ".join(
        out_fields + ["estimate long", "upper_bound long", "lower_bound long"]
    )
    probe_cols = [c for c, _ in probe_df.dtypes]

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            d = int(pdf["num_hashes"].iloc[0])
            w = int(pdf["num_buckets"].iloc[0])
            seed = int(pdf["seed"].iloc[0])
            # group probes by identical sketch CONTENT (bytes), not id():
            # after Arrow conversion every row's buffer is a distinct
            # object, so id() made every group a single row and the
            # vectorized hash/gather degenerated to a per-row loop
            ests = np.empty(len(pdf), dtype=np.int64)
            eps_tot = np.empty(len(pdf), dtype=np.int64)
            for key, idx in pdf.groupby(
                pdf["cm_matrix"].map(bytes), sort=False
            ).indices.items():
                mat = np.asarray(pdf["cm_matrix"].iloc[idx[0]], np.int64).reshape(d, w)
                buckets = _row_hashes(pdf[item_col].iloc[idx], item_dtype, d, w, seed)
                vals = mat[np.arange(d)[None, :], buckets]  # (n, d)
                ests[idx] = vals.min(axis=1)
                eps_tot[idx] = int(
                    math.ceil(relative_error(w) * int(pdf["cm_total"].iloc[idx[0]]))
                )
            out = pdf[probe_cols].copy()
            out["estimate"] = ests
            out["upper_bound"] = ests
            out["lower_bound"] = np.maximum(ests - eps_tot, 0)
            yield out

    return joined.mapInPandas(probe, schema)
