"""S1/S2: signature computation as one Arrow-batched Spark stage.

One `mapInPandas` pass per content lane computes, per row:
  * MinHash signature (num_perm aligned lanes) — for LSH banding,
  * KMV bottom-k signature + theta — for tight Jaccard verification
    (the reference's theta compact form, theta_sketch_impl.hpp:266-289),
  * 64-bit SimHash — near-identical text detection,
  * LSH band hashes — precomputed here so banding is a pure `posexplode`
    downstream (no second pass over content).

The stage is embarrassingly parallel (no shuffle); at 100 TB it scales
linearly with input splits. Content bytes are dropped immediately after —
everything downstream moves only ids + fixed-size signatures, which is the
whole point of sketching the corpus instead of joining it.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .sigkernel import (
    SigConfig,
    band_hashes,
    byte_shingle_hashes,
    kmv_signatures,
    minhash_signatures,
    simhash64,
    token_hashes_batch,
    token_shingle_hashes,
)


_BINARY_SUBBATCH = 128  # docs per cache-resident pass (see note below)


def signature_batch(
    ids: list,
    contents: list,
    cfg: SigConfig,
    kind: str = "text",
    byte_stride: int = 1,
) -> pd.DataFrame:
    """Pure-numpy signature computation for one batch — shared verbatim by
    the Spark UDF below and the single-node oracle (oracle/pydedup.py), so
    'identical shingle/signature config ⇒ identical signatures' holds by
    construction, the analog of the reference's seed-hash contract.

    Binary payloads are processed in sub-batches of ``_BINARY_SUBBATCH``
    docs run through ALL stages (shingle→minhash→kmv→bands) before the
    next sub-batch: the per-stage intermediates (window matrix, shingle
    hashes) then fit in cache instead of making full-batch DRAM round
    trips between stages — with 32 parallel workers the full-batch version
    is memory-bandwidth-bound and stops scaling. Per-doc results are
    independent, so chunking cannot change any output."""
    if kind == "binary" and len(ids) > _BINARY_SUBBATCH:
        frames = [
            signature_batch(
                ids[s : s + _BINARY_SUBBATCH],
                contents[s : s + _BINARY_SUBBATCH],
                cfg,
                kind,
                byte_stride,
            )
            for s in range(0, len(ids), _BINARY_SUBBATCH)
        ]
        return pd.concat(frames, ignore_index=True)
    if kind == "text":
        sh, off = token_shingle_hashes(contents, cfg.shingle_w, cfg.seed)
        tok, tok_off = token_hashes_batch(contents, cfg.seed)
    elif kind == "binary":
        bufs = [bytes(b) if b is not None else b"" for b in contents]
        sh, off = byte_shingle_hashes(bufs, cfg.shingle_w, cfg.seed, stride=byte_stride)
        tok, tok_off = sh, off  # simhash over the same shingle stream
    else:
        raise ValueError(f"unknown content kind {kind!r}")

    mh = minhash_signatures(sh, off, cfg)
    thetas, kmv_sigs = kmv_signatures(sh, off, cfg.kmv_k)
    # SimHash is a caption-lane verifier (use_simhash=True only for text);
    # for binary payloads it is never consulted, and computing it over the
    # full shingle stream costs ~40% of the stage — emit the empty-doc
    # sentinel (0) instead. The oracle shares this function, so parity holds.
    if kind == "text":
        sim = simhash64(tok, tok_off, cfg.seed)
    else:
        sim = np.zeros(len(ids), dtype=np.uint64)
    bands = band_hashes(mh, cfg)
    n_shingles = np.diff(off)

    return pd.DataFrame(
        {
            "id": ids,
            "n_shingles": n_shingles.astype(np.int64),
            "mh_sig": [row.astype(np.int64) for row in mh],
            "kmv_theta": thetas,
            "kmv_sig": [s.astype(np.int64) for s in kmv_sigs],
            "simhash": sim.astype(np.int64),
            "bands": [row.astype(np.int64) for row in bands],
        }
    )


SIG_SCHEMA_SUFFIX = (
    "n_shingles long, mh_sig array<long>, kmv_theta long, "
    "kmv_sig array<long>, simhash long, bands array<long>"
)


def _binary_flat_frames(
    ids: list, flat: "np.ndarray", starts_abs: "np.ndarray",
    cfg: SigConfig, byte_stride: int,
):
    """Sub-batched signature computation over an Arrow-layout flat buffer
    (absolute doc offsets into ``flat``) — the zero-copy twin of
    signature_batch(kind='binary'). Yields pandas frames per sub-batch."""
    from .sigkernel import byte_shingle_hashes_flat

    n = len(ids)
    for lo in range(0, n, _BINARY_SUBBATCH):
        hi = min(lo + _BINARY_SUBBATCH, n)
        sh, off = byte_shingle_hashes_flat(
            flat, starts_abs[lo : hi + 1], cfg.shingle_w, cfg.seed, byte_stride
        )
        mh = minhash_signatures(sh, off, cfg)
        thetas, kmv_sigs = kmv_signatures(sh, off, cfg.kmv_k)
        bands = band_hashes(mh, cfg)
        yield pd.DataFrame(
            {
                "id": ids[lo:hi],
                "n_shingles": np.diff(off).astype(np.int64),
                "mh_sig": [row.astype(np.int64) for row in mh],
                "kmv_theta": thetas,
                "kmv_sig": [s.astype(np.int64) for s in kmv_sigs],
                "simhash": np.zeros(hi - lo, dtype=np.int64),
                "bands": [row.astype(np.int64) for row in bands],
            }
        )


def compute_signatures(
    df: DataFrame,
    id_col: str,
    content_col: str,
    cfg: SigConfig,
    kind: str = "text",
    byte_stride: int = 1,
) -> DataFrame:
    """DataFrame(id_col, content) → DataFrame(id, n_shingles, mh_sig,
    kmv_theta, kmv_sig, simhash, bands). Narrow (no shuffle).

    The binary lane uses ``mapInArrow`` and reads the BinaryArray's
    (offsets, data) buffers directly — the raw payload bytes are never
    copied into Python objects (at 100 TB the marshalling copies would
    cost more memory bandwidth than the hashing itself). The text lane
    stays on pandas (token hashing materializes Python strings anyway)."""
    id_type = dict(df.dtypes)[id_col]
    schema = f"id {id_type}, {SIG_SCHEMA_SUFFIX}"

    # CPU-heavy narrow stage: if the scan yields fewer splits than the
    # cluster has cores (one fat parquet file, small corpus), rebalance
    # first. The signature math costs ~100× the one-time shuffle of the
    # content bytes, and without this a 32-core cluster runs the hottest
    # stage on 2 tasks. At 100 TB the scan already has >> cores splits and
    # this is a no-op.
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * 2
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        df = df.repartition(target)

    if kind == "binary":

        def run_arrow(batches):
            import pyarrow as pa

            for rb in batches:
                if rb.num_rows == 0:
                    continue
                ids = rb.column(0).to_pylist()
                arr = rb.column(1)
                if arr.null_count or not isinstance(
                    arr, (pa.BinaryArray, pa.LargeBinaryArray)
                ):
                    # nulls / exotic layouts: correctness fallback via the
                    # list-based kernel (same outputs)
                    bufs = [b if b is not None else b"" for b in arr.to_pylist()]
                    frames = [signature_batch(ids, bufs, cfg, "binary", byte_stride)]
                else:
                    off_dtype = (
                        np.int64 if isinstance(arr, pa.LargeBinaryArray) else np.int32
                    )
                    offs = np.frombuffer(arr.buffers()[1], dtype=off_dtype)
                    starts_abs = offs[arr.offset : arr.offset + len(arr) + 1].astype(
                        np.int64
                    )
                    flat = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
                    frames = list(
                        _binary_flat_frames(ids, flat, starts_abs, cfg, byte_stride)
                    )
                for f in frames:
                    yield pa.RecordBatch.from_pandas(f, preserve_index=False)

        return df.select(id_col, content_col).mapInArrow(run_arrow, schema)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            contents = pdf[content_col].fillna("").tolist()
            yield signature_batch(
                pdf[id_col].tolist(), contents, cfg, kind, byte_stride
            )

    return df.select(id_col, content_col).mapInPandas(run, schema)
