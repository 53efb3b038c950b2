"""Bloom filter — two-stage OR-merge Spark aggregate + broadcast probe.

Reference semantics (filters/include/bloom_filter.hpp, bloom_filter_impl.hpp):
  - m-bit array, k hash functions via double hashing: index_i =
    (h0 + i·h1) mod m over a 64-bit base hash (bloom_filter_impl.hpp:
    617-635 uses xxhash64 pairs; we derive h0, h1 from one murmur128-based
    63-bit hash pair, same structure);
  - query = all k bits set; no false negatives, false-positive rate
    ≈ (1 - e^{-kn/m})^k;
  - builder sizing: optimal m = ceil(-n ln(p) / ln2²), k = round((m/n)·ln2)
    (bloom_filter.hpp:649-665);
  - union = OR, intersect = AND (bloom_filter.hpp:505-517) — requires
    identical (m, k, seed), enforced via config columns.

Spark mapping: per-partition packed uint8 bit arrays via ``mapInPandas``
(np.bitwise_or reduce), final OR merge; the filter row is broadcast for
probing, which is the scale pattern: build once over the small/dim side,
prefilter the huge fact side *before* the exact join — the exact join then
only sees survivors, and the result is identical to the unfiltered join
because bloom never produces false negatives.
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


def suggest_num_bits(n: int, fpp: float) -> int:
    """optimal m = ceil(-n ln p / ln²2) — bloom_filter.hpp:649-657."""
    return max(8, int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))))


def suggest_num_hashes_from(n: int, m: int) -> int:
    """k = max(1, round((m/n)·ln 2)) — bloom_filter.hpp:659-665."""
    return max(1, int(round(m / max(n, 1) * math.log(2))))


def _base_hashes(items: pd.Series, dtype: str, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """(h0, h1) uint64 pairs for double hashing (h1 forced odd so the
    probe sequence walks the whole table)."""
    if dtype in _INT_TYPES:
        h0 = hash63_int64(items.to_numpy(dtype=np.int64), seed)
        h1 = hash63_int64(items.to_numpy(dtype=np.int64), seed ^ 0x5BD1E995)
    else:
        svals = [str(v) for v in items]
        h0 = hash63_str_many(svals, seed)
        h1 = hash63_str_many(svals, seed ^ 0x5BD1E995)
    return h0, h1 | np.uint64(1)


def _bit_positions(
    items: pd.Series, dtype: str, num_bits: int, num_hashes: int, seed: int
) -> np.ndarray:
    h0, h1 = _base_hashes(items, dtype, seed)
    i = np.arange(num_hashes, dtype=np.uint64)[None, :]
    return ((h0[:, None] + i * h1[:, None]) % np.uint64(num_bits)).astype(np.int64)


def bloom_filter_agg(
    df: DataFrame,
    item_col: str,
    num_bits: int,
    num_hashes: int,
    seed: int = DEFAULT_SEED,
) -> DataFrame:
    """Build ONE bloom filter over a column (ungrouped — filters are
    broadcast objects, not per-group rows): returns a single-row DataFrame
    (bits binary, num_bits int, num_hashes int, seed long, n_items long)."""
    item_dtype = dict(df.dtypes)[item_col]
    nbytes = (num_bits + 7) // 8
    schema = "bits binary, num_bits int, num_hashes int, seed long, n_items long"

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        arr = np.zeros(nbytes, dtype=np.uint8)
        n = 0
        for pdf in batches:
            s = pdf[item_col].dropna()
            if len(s) == 0:
                continue
            pos = _bit_positions(s, item_dtype, num_bits, num_hashes, seed).ravel()
            np.bitwise_or.at(arr, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
            n += len(s)
        yield pd.DataFrame(
            {
                "bits": [arr.tobytes()],
                "num_bits": [num_bits],
                "num_hashes": [num_hashes],
                "seed": [seed],
                "n_items": [n],
            }
        )

    partials = df.select(item_col).mapInPandas(partial, schema)

    def final(pdf: pd.DataFrame) -> pd.DataFrame:
        assert (pdf["num_bits"] == num_bits).all() and (
            pdf["num_hashes"] == num_hashes
        ).all(), "bloom union requires identical (m, k, seed)"
        arr = np.zeros(nbytes, dtype=np.uint8)
        for b in pdf["bits"]:
            arr |= np.frombuffer(b, dtype=np.uint8)
        return pd.DataFrame(
            {
                "bits": [arr.tobytes()],
                "num_bits": [num_bits],
                "num_hashes": [num_hashes],
                "seed": [seed],
                "n_items": [int(pdf["n_items"].sum())],
            }
        )

    return partials.groupBy(F.lit(1).alias("_g")).applyInPandas(final, schema)


def might_contain(
    probe_df: DataFrame,
    filter_df: DataFrame,
    item_col: str,
    out_col: str = "might_contain",
) -> DataFrame:
    """Append a boolean membership column by broadcasting the (single-row)
    filter to every probe partition. No false negatives — a False is
    definitive."""
    item_dtype = dict(probe_df.dtypes)[item_col]
    joined = probe_df.crossJoin(
        F.broadcast(filter_df.select("bits", "num_bits", "num_hashes", "seed"))
    )
    probe_cols = [c for c, _ in probe_df.dtypes]
    schema = ", ".join(
        [f"`{c}` {t}" for c, t in probe_df.dtypes] + [f"{out_col} boolean"]
    )

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            arr = np.frombuffer(pdf["bits"].iloc[0], dtype=np.uint8)
            m = int(pdf["num_bits"].iloc[0])
            k = int(pdf["num_hashes"].iloc[0])
            seed = int(pdf["seed"].iloc[0])
            # NULL probe keys: the filter was never updated with a null
            # (updates drop notna rows), so membership is definitively
            # False — without the mask a null-widened int column hashes
            # NaN-cast garbage and answers randomly
            valid = pdf[item_col].notna().to_numpy()
            ans = np.zeros(len(pdf), bool)
            if valid.any():
                sub = pdf[item_col][valid]
                pos = _bit_positions(sub, item_dtype, m, k, seed)  # (n, k)
                bits = (arr[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
                ans[valid] = bits.all(axis=1)
            out = pdf[probe_cols].copy()
            out[out_col] = ans
            yield out

    return joined.mapInPandas(probe, schema)


_FILTER_SCHEMA = "bits binary, num_bits int, num_hashes int, seed long, n_items long"


def _combine_filters(filters_df: DataFrame, op: str) -> DataFrame:
    """OR/AND every filter row of ``filters_df`` into one — the reference's
    ``union_with`` / ``intersect`` (bloom_filter.hpp:505-512). Requires
    identical (num_bits, num_hashes, seed), enforced exactly like the
    reference's compatibility check. ``n_items`` degrades to an upper
    bound: sum for union (each true item is in some input), min for
    intersect (the result holds at most the smaller side)."""

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        cfgs = pdf[["num_bits", "num_hashes", "seed"]].drop_duplicates()
        if len(cfgs) != 1:
            raise ValueError(
                f"bloom {op} requires identical (num_bits, num_hashes, seed); got "
                f"{cfgs.to_dict('records')}"
            )
        mats = np.stack([np.frombuffer(b, dtype=np.uint8) for b in pdf["bits"]])
        arr = (np.bitwise_or if op == "union" else np.bitwise_and).reduce(mats, axis=0)
        n = int(pdf["n_items"].sum()) if op == "union" else int(pdf["n_items"].min())
        return pd.DataFrame(
            {
                "bits": [arr.tobytes()],
                "num_bits": [int(pdf["num_bits"].iloc[0])],
                "num_hashes": [int(pdf["num_hashes"].iloc[0])],
                "seed": [int(pdf["seed"].iloc[0])],
                "n_items": [n],
            }
        )

    return filters_df.groupBy(F.lit(1).alias("_g")).applyInPandas(
        lambda pdf: merge(pdf), _FILTER_SCHEMA
    )


def bloom_union(filters_df: DataFrame) -> DataFrame:
    """OR-merge every filter row into one (bloom_filter.hpp:505 union_with).
    No false negatives survive: an item in ANY input filter is in the
    union. Filters are single rows, so this is a driver-size aggregate."""
    return _combine_filters(filters_df, "union")


def bloom_intersect(filters_df: DataFrame) -> DataFrame:
    """AND-merge every filter row (bloom_filter.hpp:512 intersect): an item
    present in ALL inputs still has all its bits set (no false negatives
    w.r.t. the true intersection); false-positive rate is higher than a
    filter built directly on the intersection — same caveat as the
    reference documents."""
    return _combine_filters(filters_df, "intersect")


def bloom_invert(filter_df: DataFrame) -> DataFrame:
    """Flip every bit (bloom_filter.hpp:517 invert) — approximately inverts
    set membership: items NOT in the original set now probe true with high
    probability; items in the original set probe false unless hash
    collisions keep all their bits set. ``n_items`` becomes -1 (unknown),
    as the complement's cardinality is not tracked."""

    def flip(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf.copy()
        out["bits"] = [
            np.bitwise_not(np.frombuffer(b, dtype=np.uint8)).tobytes()
            for b in pdf["bits"]
        ]
        out["n_items"] = np.int64(-1)
        return out

    return filter_df.groupBy(F.lit(1).alias("_g")).applyInPandas(
        lambda pdf: flip(pdf), _FILTER_SCHEMA
    )


def bloom_prefilter_join(
    fact_df: DataFrame,
    dim_df: DataFrame,
    fact_key: str,
    dim_key: str,
    fpp: float = 0.01,
    seed: int = DEFAULT_SEED,
) -> DataFrame:
    """The production pattern: build a bloom filter on the dim keys, prune
    the fact side before the exact join. Result rows are IDENTICAL to the
    plain join (no false negatives ⇒ nothing true is pruned; the exact
    join removes false positives) — only the shuffled volume changes. At
    100 TB this is the difference between shuffling the whole fact table
    and shuffling the ~matching slice."""
    n = dim_df.select(dim_key).distinct().count()
    m = suggest_num_bits(n, fpp)
    k = suggest_num_hashes_from(n, m)
    filt = bloom_filter_agg(dim_df, dim_key, m, k, seed)
    pruned = might_contain(fact_df, filt, fact_key).where(F.col("might_contain")).drop(
        "might_contain"
    )
    return pruned.join(dim_df, pruned[fact_key] == dim_df[dim_key])
