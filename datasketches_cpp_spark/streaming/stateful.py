"""Custom stateful streaming operator: per-key theta (KMV) distinct-count
over an unbounded stream via ``applyInPandasWithState``.

This is the Structured-Streaming-native form of the sketch contract: the
group state IS the sketch (theta + sorted k-min signature — bounded, so
the state store holds O(k) longs per key forever), each micro-batch folds
its rows in with the same whole-batch rebuild as the batch aggregate
(functions/theta.py), and every trigger emits the key's current estimate.
Because KMV folding is deterministic and order-insensitive (the reference's
entire streaming story — any-order updates/merges, SURVEY §2A), the state
after N micro-batches is IDENTICAL to the batch sketch over the union of
those batches; tests assert that equivalence.

Late data needs no special handling — sketches are monoids; a late row
just folds in. (Watermark-windowed variants compose on top by adding the
window to the group key.)
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.theta import _hash_series, _kmin_merge
from ..hashing import DEFAULT_SEED
from ..kmv import MAX_THETA

_STATE_SCHEMA = StructType(
    [
        StructField("theta", LongType(), False),
        StructField("sig", ArrayType(LongType(), False), False),
    ]
)


def _output_schema(key_type: str = "string") -> StructType:
    return StructType(
        [
            StructField("key", StringType() if key_type == "string" else LongType(), True),
            StructField("estimate", DoubleType(), False),
            StructField("theta", LongType(), False),
            StructField("n_retained", LongType(), False),
        ]
    )


def streaming_theta_distinct(
    stream_df: DataFrame,
    key_col: str,
    item_col: str,
    lg_k: int = 12,
    seed: int = DEFAULT_SEED,
    item_dtype: str | None = None,
) -> DataFrame:
    """groupBy(key).applyInPandasWithState: per-key running distinct-count
    sketch. Emits (key, estimate, theta, n_retained) every trigger for keys
    present in the batch. State never exceeds k+1 longs per key.

    ``item_dtype`` defaults to the COLUMN's declared type (exactly like
    the batch aggregate derives it) — a bigint column must hash through
    the int64 path, or the streaming state would not merge/compare equal
    with a batch sketch over the same column."""
    k = 1 << lg_k
    if item_dtype is None:
        item_dtype = dict(stream_df.dtypes)[item_col]

    def fold(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            theta_enc, sig_list = state.get
            theta = MAX_THETA if theta_enc < 0 else int(theta_enc)
            sig = np.asarray(sig_list, np.int64).view(np.uint64)
        else:
            theta, sig = MAX_THETA, np.empty(0, np.uint64)
        for pdf in pdfs:
            hashes, mask = _hash_series(pdf[item_col], item_dtype, seed)
            theta, sig = _kmin_merge((theta, sig), hashes, k)
        enc = -1 if theta >= MAX_THETA else int(theta)
        state.update((enc, [int(x) for x in sig.view(np.int64)]))
        frac = 1.0 if theta >= MAX_THETA else theta / float(MAX_THETA)
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "estimate": [len(sig) / frac],
                "theta": [enc],
                "n_retained": [len(sig)],
            }
        )

    key_type = dict(stream_df.dtypes)[key_col]
    return (
        stream_df.select(stream_df[key_col].alias("key"), stream_df[item_col])
        .groupBy("key")
        .applyInPandasWithState(
            fold,
            _output_schema("string" if key_type == "string" else "long"),
            _STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
