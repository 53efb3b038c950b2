"""HLL_8 wire serialization — the reference byte layout for dense
HLL-mode sketches (hll/include/HllUtil.hpp:40-74 constants,
HllArray-internal.hpp:219-243 serialize / :95-152 deserialize), re-derived
so HLL sketches built by `hll.hll_sketch_agg` can be exchanged with
Java/C++ DataSketches deployments.

Layout (little-endian, HLL mode, target HLL_8, compact):

    byte 0    preamble_ints   10 (HLL_PREINTS)
    byte 1    serial version  1
    byte 2    family          7 (HLL)
    byte 3    lg_k
    byte 4    lg_aux_arr      0 (HLL_8 has no aux exception map)
    byte 5    flags           COMPACT(8) | OUT_OF_ORDER(16) [| EMPTY(4)]
    byte 6    cur_min         min register value
    byte 7    mode            curMode HLL(2) | tgtType HLL_8(2) << 2 = 0x0A
    double @8   hip_accum     0.0 — we always set OUT_OF_ORDER (register
                              state comes from a distributed merge), and
                              the reference reader ignores hip when OOO
    double @16  kxq0          Σ 2^-reg over regs with value < 32
    double @24  kxq1          Σ 2^-reg over regs with value ≥ 32
    uint32 @32  num_at_cur_min
    uint32 @36  aux_count     0
    bytes  @40  K register bytes (uint8 each)

The kxq/cur_min scalars are pure functions of the registers; serialize
computes them exactly so the C++ reader's composite estimator sees the
same state it would have built itself.
"""

from __future__ import annotations

import struct

import numpy as np

_PREINTS = 10
_SER_VER = 1
_FAMILY = 7
_F_EMPTY = 4
_F_COMPACT = 8
_F_OUT_OF_ORDER = 16
_MODE_HLL_TGT8 = 2 | (2 << 2)
_DATA_START = 40


class HllSerdeError(ValueError):
    pass


def _kxq(regs: np.ndarray) -> tuple[float, float]:
    vals = regs.astype(np.float64)
    contrib = np.exp2(-vals)
    lo = float(contrib[regs < 32].sum())
    hi = float(contrib[regs >= 32].sum())
    return lo, hi


def serialize_hll8(regs: np.ndarray, lg_k: int) -> bytes:
    """K uint8 registers → reference-compatible dense HLL_8 bytes."""
    regs = np.ascontiguousarray(np.asarray(regs, np.uint8))
    if len(regs) != (1 << lg_k):
        raise HllSerdeError(f"register count {len(regs)} != 2^lg_k ({1 << lg_k})")
    cur_min = int(regs.min())
    num_at_cur_min = int(np.count_nonzero(regs == cur_min))
    kxq0, kxq1 = _kxq(regs)
    flags = _F_COMPACT | _F_OUT_OF_ORDER
    if cur_min == 0 and num_at_cur_min == len(regs):
        flags |= _F_EMPTY
    out = bytearray()
    out += struct.pack(
        "<BBBBBBBB", _PREINTS, _SER_VER, _FAMILY, lg_k, 0, flags, cur_min,
        _MODE_HLL_TGT8,
    )
    out += struct.pack("<ddd", 0.0, kxq0, kxq1)
    out += struct.pack("<II", num_at_cur_min, 0)
    out += regs.tobytes()
    return bytes(out)


def deserialize_hll8(buf: bytes) -> tuple[int, np.ndarray]:
    """Reference dense HLL_8 bytes → (lg_k, K uint8 registers); fails fast
    on family/version/mode mismatch, truncation, and scalar inconsistency
    (deserialize-hardening discipline: the kxq/cur_min fields must agree
    with the registers they describe)."""
    if len(buf) < _DATA_START:
        raise HllSerdeError(f"buffer too short for HLL preamble: {len(buf)}")
    preints, sv, family, lg_k, _lg_arr, flags, cur_min, mode = struct.unpack_from(
        "<BBBBBBBB", buf, 0
    )
    if family != _FAMILY:
        raise HllSerdeError(f"not an HLL sketch (family {family})")
    if sv != _SER_VER:
        raise HllSerdeError(f"unsupported serial version {sv}")
    if preints != _PREINTS:
        raise HllSerdeError(f"bad preamble_ints {preints} for HLL mode")
    if (mode & 0x3) != 2:
        raise HllSerdeError("stream is not in HLL mode (LIST/SET unsupported)")
    if ((mode >> 2) & 0x3) != 2:
        raise HllSerdeError("only HLL_8 target type is supported")
    k = 1 << lg_k
    if len(buf) < _DATA_START + k:
        raise HllSerdeError(
            f"truncated registers: need {_DATA_START + k} bytes, have {len(buf)}"
        )
    regs = np.frombuffer(buf, np.uint8, count=k, offset=_DATA_START).copy()
    if int(regs.min()) != cur_min:
        raise HllSerdeError(
            f"corrupt stream: cur_min {cur_min} != register min {int(regs.min())}"
        )
    return lg_k, regs


def with_hll_bytes(regs_df, lg_k: int, regs_col: str = "regs", out_col: str = "sketch_bytes"):
    """Append a BinaryType column of reference HLL_8 wire blobs to a table
    carrying K-byte register states (the shape `hll.hll_sketch_agg(...,
    keep_registers=True)` emits). Parquet-writable, consumable by any
    DataSketches deployment."""
    import pandas as pd
    from pyspark.sql.types import BinaryType, StructField, StructType

    schema = StructType(
        list(regs_df.schema.fields) + [StructField(out_col, BinaryType(), False)]
    )
    cols = [f.name for f in regs_df.schema.fields]

    def add(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            pdf = pdf.copy()
            pdf[out_col] = [
                serialize_hll8(np.frombuffer(b, np.uint8), lg_k)
                for b in pdf[regs_col]
            ]
            yield pdf[cols + [out_col]]

    return regs_df.mapInPandas(add, schema)
