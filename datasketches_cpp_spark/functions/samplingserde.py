"""Wire serialization for the sampling + filter families — var_opt
(family 13, var_opt_sketch_impl.hpp:326-420 serialize / :430-560
deserialize), count-min (family 18, count_min_impl.hpp:264-333), and
bloom filter (family 21, bloom_filter_impl.hpp:404-427). Re-derived
layouts, NOT ports.

Interop scope, stated honestly:

* var_opt — FULL value interop: the stream carries explicit items and
  weights (no hash placement), so a sketch exported here is consumed by
  Java/C++ deployments with identical sample semantics and vice versa.
  Item serdes: int64 (8-byte LE), double, and length-prefixed UTF-8
  strings — the reference's serde<int64_t>/serde<double>/serde<string>.
* count-min / bloom — LAYOUT interop: headers, dimensions, seeds, totals
  and the counter/bit arrays round-trip byte-exactly, but cell/bit
  PLACEMENT depends on the hash family. The reference itself seeds its
  count-min rows from std::mt19937_64 + std::uniform_int_distribution —
  implementation-defined, so placement is not portable even between C++
  standard libraries (count_min_impl.hpp:53-58); this engine's rows use
  its own splitmix-stepped 63-bit murmur family. A blob is therefore
  exchangeable as STATE for same-engine readers, and structurally
  parseable by any DataSketches reader, but cross-engine probes of a
  count-min/bloom blob are meaningful only within the engine that built
  it. (Theta/HLL/KLL/quantiles do not have this caveat.)

Layouts (little-endian):

var_opt:  byte0 = preamble_longs | resize_factor<<6 (1 empty / 3 warmup
          / 4 full), byte1 ser_ver=2, byte2 family=13, byte3 flags
          (EMPTY=4, GADGET=128), u32 k @4; then u64 n, u32 h, u32 r,
          [r>0] double total_wt_r; h doubles (exact weights); [gadget]
          ceil(h/8) packed mark bytes; h+r items.
count-min: byte0 pre=2, sv=1, family=18, flags (EMPTY=4), u32 unused;
          u32 num_buckets, u8 num_hashes, u16 seed_hash, u8 unused;
          [non-empty] u64 total_weight, num_hashes×num_buckets u64 cells.
bloom:    byte0 pre (3 empty / 4), sv=1, family=21, flags (EMPTY=4);
          u16 num_hashes, u16 unused, u64 seed, i32 capacity_longs,
          u32 unused; [non-empty] u64 num_bits_set, capacity/8 bit bytes.
"""

from __future__ import annotations

import struct

import numpy as np

from ..hashing import seed_hash as _seed_hash_fn


class SamplingSerdeError(ValueError):
    pass


# ---------------------------------------------------------------------------
# item serdes (serde.hpp: trivially-copyable + string specialization)
# ---------------------------------------------------------------------------


def _enc_items(items, item_dtype: str) -> bytes:
    if item_dtype == "string":
        out = bytearray()
        for s in items:
            b = str(s).encode("utf-8")
            out += struct.pack("<I", len(b)) + b
        return bytes(out)
    np_dt = {"int64": "<i8", "double": "<f8"}[item_dtype]
    return np.asarray(list(items)).astype(np_dt).tobytes()


def _dec_items(buf: bytes, off: int, count: int, item_dtype: str):
    if item_dtype == "string":
        items = []
        for _ in range(count):
            if len(buf) < off + 4:
                raise SamplingSerdeError("truncated string length")
            (ln,) = struct.unpack_from("<I", buf, off)
            off += 4
            if len(buf) < off + ln:
                raise SamplingSerdeError("truncated string payload")
            items.append(buf[off : off + ln].decode("utf-8"))
            off += ln
        return items, off
    np_dt = {"int64": "<i8", "double": "<f8"}[item_dtype]
    need = off + 8 * count
    if len(buf) < need:
        raise SamplingSerdeError(f"truncated items: need {need}, have {len(buf)}")
    return list(np.frombuffer(buf, np_dt, count=count, offset=off)), need


# ---------------------------------------------------------------------------
# var_opt (family 13)
# ---------------------------------------------------------------------------

_VO_FAMILY = 13
_VO_SER_VER = 2
_F_EMPTY = 4
_F_GADGET = 128


def serialize_varopt(
    items,
    weights,
    exact,
    n: int,
    k: int,
    item_dtype: str = "int64",
    marks=None,
) -> bytes:
    """(retained items, adjusted weights, exact-weight flags, stream n, k)
    → family-13 bytes. ``exact[i]`` True ⇔ item i is in the H (heavy)
    region with its own weight; False ⇔ R region (shared weight =
    total_wt_r / r). ``marks`` (optional, H-region only) sets the gadget
    flag — the union's resampled-item bookkeeping."""
    items = list(items)
    weights = np.asarray(list(weights), np.float64)
    exact = np.asarray(list(exact), bool)
    if not (len(items) == len(weights) == len(exact)):
        raise SamplingSerdeError("items/weights/exact length mismatch")
    if len(items) == 0:
        return struct.pack("<BBBBI", 1, _VO_SER_VER, _VO_FAMILY, _F_EMPTY, k)
    order = np.argsort(~exact, kind="stable")  # H region first, then R
    items = [items[i] for i in order]
    weights = weights[order]
    exact = exact[order]
    h = int(exact.sum())
    r = len(items) - h
    total_wt_r = float(weights[h:].sum())
    pre = 3 if r == 0 else 4
    flags = _F_GADGET if marks is not None else 0
    out = bytearray()
    out += struct.pack("<BBBBI", pre, _VO_SER_VER, _VO_FAMILY, flags, k)
    out += struct.pack("<QII", int(n), h, r)
    if r > 0:
        out += struct.pack("<d", total_wt_r)
    out += weights[:h].astype("<f8").tobytes()
    if marks is not None:
        marks = np.asarray(list(marks), bool)
        if len(marks) != h:
            raise SamplingSerdeError("marks must cover exactly the H region")
        out += np.packbits(marks, bitorder="little").tobytes()
    out += _enc_items(items, item_dtype)
    return bytes(out)


def deserialize_varopt(buf: bytes, item_dtype: str = "int64") -> dict:
    """family-13 bytes → {k, n, items, weights, exact, marks}. R-region
    items surface with weight total_wt_r / r (the reference's shared
    adjusted weight, == tau for sketches this engine wrote)."""
    if len(buf) < 8:
        raise SamplingSerdeError(f"buffer too short: {len(buf)}")
    first, sv, family, flags, k = struct.unpack_from("<BBBBI", buf, 0)
    pre = first & 0x3F
    if family != _VO_FAMILY:
        raise SamplingSerdeError(f"not a var_opt sketch (family {family})")
    if sv != _VO_SER_VER:
        raise SamplingSerdeError(f"unsupported serial version {sv}")
    if flags & _F_EMPTY:
        return {"k": k, "n": 0, "items": [], "weights": np.empty(0),
                "exact": np.empty(0, bool), "marks": None}
    if len(buf) < 24:
        raise SamplingSerdeError("truncated var_opt preamble")
    n, h, r = struct.unpack_from("<QII", buf, 8)
    off = 24
    total_wt_r = 0.0
    if r > 0:
        if pre != 4 or len(buf) < off + 8:
            raise SamplingSerdeError("truncated/inconsistent full preamble")
        (total_wt_r,) = struct.unpack_from("<d", buf, off)
        off += 8
    if len(buf) < off + 8 * h:
        raise SamplingSerdeError("truncated H weights")
    w_h = np.frombuffer(buf, "<f8", count=h, offset=off).copy()
    off += 8 * h
    marks = None
    if flags & _F_GADGET:
        nb = (h + 7) // 8
        if len(buf) < off + nb:
            raise SamplingSerdeError("truncated marks")
        marks = np.unpackbits(
            np.frombuffer(buf, np.uint8, count=nb, offset=off), bitorder="little"
        )[:h].astype(bool)
        off += nb
    items, off = _dec_items(buf, off, h + r, item_dtype)
    w_r = np.full(r, total_wt_r / r if r else 0.0)
    return {
        "k": int(k),
        "n": int(n),
        "items": items,
        "weights": np.concatenate([w_h, w_r]),
        "exact": np.concatenate([np.ones(h, bool), np.zeros(r, bool)]),
        "marks": marks,
    }


# ---------------------------------------------------------------------------
# count-min (family 18)
# ---------------------------------------------------------------------------

_CM_FAMILY = 18


def serialize_countmin(
    matrix: np.ndarray, total_weight: int, num_hashes: int, num_buckets: int,
    seed: int = 9001,
) -> bytes:
    matrix = np.ascontiguousarray(np.asarray(matrix, np.uint64)).ravel()
    if len(matrix) != num_hashes * num_buckets:
        raise SamplingSerdeError(
            f"matrix size {len(matrix)} != {num_hashes}x{num_buckets}"
        )
    empty = total_weight == 0
    out = bytearray()
    out += struct.pack("<BBBBI", 2, 1, _CM_FAMILY, _F_EMPTY if empty else 0, 0)
    out += struct.pack("<IBHB", num_buckets, num_hashes, _seed_hash_fn(seed), 0)
    if empty:
        return bytes(out)
    out += struct.pack("<Q", int(total_weight))
    out += matrix.astype("<u8").tobytes()
    return bytes(out)


def deserialize_countmin(buf: bytes, seed: int = 9001) -> dict:
    if len(buf) < 16:
        raise SamplingSerdeError(f"buffer too short: {len(buf)}")
    pre, sv, family, flags, _ = struct.unpack_from("<BBBBI", buf, 0)
    if family != _CM_FAMILY:
        raise SamplingSerdeError(f"not a count-min sketch (family {family})")
    if sv != 1:
        raise SamplingSerdeError(f"unsupported serial version {sv}")
    nbuckets, nhashes, sh, _ = struct.unpack_from("<IBHB", buf, 8)
    if sh != _seed_hash_fn(seed):
        raise SamplingSerdeError(
            f"seed hash mismatch: stream {sh:#06x} vs seed {seed}"
        )
    if flags & _F_EMPTY:
        return {"num_hashes": nhashes, "num_buckets": nbuckets,
                "total_weight": 0,
                "matrix": np.zeros((nhashes, nbuckets), np.uint64)}
    if len(buf) < 24 + 8 * nhashes * nbuckets:
        raise SamplingSerdeError("truncated count-min array")
    (total,) = struct.unpack_from("<Q", buf, 16)
    matrix = np.frombuffer(
        buf, "<u8", count=nhashes * nbuckets, offset=24
    ).reshape(nhashes, nbuckets).copy()
    return {"num_hashes": int(nhashes), "num_buckets": int(nbuckets),
            "total_weight": int(total), "matrix": matrix}


# ---------------------------------------------------------------------------
# bloom filter (family 21)
# ---------------------------------------------------------------------------

_BF_FAMILY = 21


def serialize_bloom(
    bits: np.ndarray, num_hashes: int, seed: int, num_bits_set: int | None = None,
) -> bytes:
    """``bits``: uint8 byte array of the filter (capacity_bits = 8·len,
    must be a multiple of 8 bytes — java-long sizing per the layout)."""
    bits = np.ascontiguousarray(np.asarray(bits, np.uint8))
    if len(bits) % 8 != 0:
        raise SamplingSerdeError("bit array must be a whole number of longs")
    if num_bits_set is None:
        num_bits_set = int(np.unpackbits(bits).sum())
    empty = num_bits_set == 0
    out = bytearray()
    out += struct.pack("<BBBB", 3 if empty else 4, 1, _BF_FAMILY,
                       _F_EMPTY if empty else 0)
    out += struct.pack("<HHQiI", num_hashes, 0, seed & 0xFFFFFFFFFFFFFFFF,
                       len(bits) // 8, 0)
    if empty:
        return bytes(out)
    out += struct.pack("<Q", int(num_bits_set))
    out += bits.tobytes()
    return bytes(out)


def deserialize_bloom(buf: bytes) -> dict:
    if len(buf) < 24:
        raise SamplingSerdeError(f"buffer too short: {len(buf)}")
    pre, sv, family, flags = struct.unpack_from("<BBBB", buf, 0)
    if family != _BF_FAMILY:
        raise SamplingSerdeError(f"not a bloom filter (family {family})")
    if sv != 1:
        raise SamplingSerdeError(f"unsupported serial version {sv}")
    num_hashes, _, seed, cap_longs, _ = struct.unpack_from("<HHQiI", buf, 4)
    if flags & _F_EMPTY:
        return {"num_hashes": int(num_hashes), "seed": int(seed),
                "num_bits_set": 0, "bits": np.zeros(cap_longs * 8, np.uint8)}
    need = 32 + cap_longs * 8
    if len(buf) < need:
        raise SamplingSerdeError(f"truncated bit array: need {need}, have {len(buf)}")
    (nset,) = struct.unpack_from("<Q", buf, 24)
    bits = np.frombuffer(buf, np.uint8, count=cap_longs * 8, offset=32).copy()
    if nset == 0xFFFFFFFFFFFFFFFF:
        # the reference tracks the set-bit count lazily and serializes
        # UINT64_MAX when it is dirty — recount from the array
        nset = int(np.unpackbits(bits).sum())
    return {"num_hashes": int(num_hashes), "seed": int(seed),
            "num_bits_set": int(nset), "bits": bits}


# ---------------------------------------------------------------------------
# ebpps (family 19)
# ---------------------------------------------------------------------------

_EB_FAMILY = 19
_EB_SER_VER = 1
_F_HAS_PARTIAL = 8


def serialize_ebpps(
    items,
    k: int,
    n: int,
    cumulative_wt: float,
    wt_max: float,
    rho: float,
    c: float | None = None,
    partial_item=None,
    item_dtype: str = "int64",
) -> bytes:
    """Retained full items + stream totals → family-19 EBPPS bytes
    (sampling/include/ebpps_sketch_impl.hpp:275-360 layout comment —
    re-derived, NOT a port).  ``c`` is the expected sample size; its
    fractional part implies a partial item, which must then be supplied.
    Defaults to len(items) (an integral-C image — what the engine's
    systematic PPS sampler exports, since its realized size ∈ {⌊c⌋,⌈c⌉}
    already integrates the coin flip the reference defers)."""
    items = list(items)
    if c is None:
        c = float(len(items))
    has_partial = (c != int(c))
    if int(c) != len(items):
        raise SamplingSerdeError(f"⌊c⌋={int(c)} != len(items)={len(items)}")
    if has_partial != (partial_item is not None):
        raise SamplingSerdeError("partial_item must be given iff frac(c) != 0")
    if n == 0:
        return struct.pack("<BBBBI", 1, _EB_SER_VER, _EB_FAMILY, _F_EMPTY, k)
    flags = _F_HAS_PARTIAL if has_partial else 0
    out = bytearray()
    out += struct.pack("<BBBBI", 5, _EB_SER_VER, _EB_FAMILY, flags, k)
    out += struct.pack("<Qdddd", int(n), float(cumulative_wt), float(wt_max),
                       float(rho), float(c))
    out += _enc_items(items, item_dtype)
    if has_partial:
        out += _enc_items([partial_item], item_dtype)
    return bytes(out)


def deserialize_ebpps(buf: bytes, item_dtype: str = "int64") -> dict:
    if len(buf) < 8:
        raise SamplingSerdeError(f"buffer too short: {len(buf)}")
    pre, sv, family, flags = struct.unpack_from("<BBBB", buf, 0)
    if family != _EB_FAMILY:
        raise SamplingSerdeError(f"not an ebpps sketch (family {family})")
    if sv != _EB_SER_VER:
        raise SamplingSerdeError(f"unsupported serial version {sv}")
    (k,) = struct.unpack_from("<I", buf, 4)
    if flags & _F_EMPTY:
        if pre != 1:
            raise SamplingSerdeError(f"empty sketch with preamble_longs {pre}")
        return {"k": int(k), "n": 0, "cumulative_wt": 0.0, "wt_max": 0.0,
                "rho": 1.0, "c": 0.0, "items": [], "partial_item": None}
    if pre != 5:
        raise SamplingSerdeError(f"non-empty sketch with preamble_longs {pre}")
    if len(buf) < 48:
        raise SamplingSerdeError("truncated preamble")
    n, cum_wt, wt_max, rho, c = struct.unpack_from("<Qdddd", buf, 8)
    if c < 0.0:
        raise SamplingSerdeError("sketch image has C < 0")
    num_full = int(c)
    items, off = _dec_items(buf, 48, num_full, item_dtype)
    partial = None
    if c != num_full:
        if not flags & _F_HAS_PARTIAL:
            raise SamplingSerdeError("fractional C but HAS_PARTIAL flag unset")
        (partial,), off = _dec_items(buf, off, 1, item_dtype)
    return {"k": int(k), "n": int(n), "cumulative_wt": float(cum_wt),
            "wt_max": float(wt_max), "rho": float(rho), "c": float(c),
            "items": items, "partial_item": partial}


def ebpps_export_bytes(
    df,
    item_col: str,
    weight_col: str,
    k: int,
    seed: int = 9001,
    item_dtype: str = "int64",
) -> bytes:
    """Run the engine's distributed EBPPS sampler (`sampling.ebpps_sample`
    — systematic PPS, hard ≤k size bound) and export the realized sample
    as a reference family-19 blob any DataSketches deployment reads.

    The image is integral-C: the engine's systematic draw already
    integrates the coin flip the reference's get_result() would perform,
    so C = realized sample size and there is no partial item.  Driver
    traffic is the ≤k-item sample plus three scalars."""
    from pyspark.sql import functions as F

    from .sampling import ebpps_sample

    n, cum_wt, wt_max = df.agg(
        F.count(F.lit(1)),
        F.sum(F.col(weight_col).cast("double")),
        F.max(F.col(weight_col).cast("double")),
    ).collect()[0]
    if not n:
        return serialize_ebpps([], k, 0, 0.0, 0.0, 1.0, item_dtype=item_dtype)
    items = [
        r["item"]
        for r in ebpps_sample(df, item_col, weight_col, k, seed=seed).collect()
    ]
    c = float(len(items))
    return serialize_ebpps(
        items, k, int(n), float(cum_wt), float(wt_max),
        rho=min(1.0, c / float(cum_wt)), c=c, item_dtype=item_dtype,
    )
