"""REQ sketch wire serialization — the reference byte layout
(req/include/req_sketch_impl.hpp serialize, req_compactor_impl.hpp
compactor serialize, constants req_sketch.hpp:443-444, MIN_K=4
req_common.hpp:33), re-derived for REQ sketches over either wire item
width: ``item_dtype="<f8"`` (double serde, the engine's native state) or
``"<f4"`` (the reference's canonical ``req_sketch<float>``), so states
built by `req.req_sketch_agg` can be exchanged with Java/C++ deployments
of both instantiations.  Float items widen losslessly to float64 state.

Layout (little-endian):

    byte 0   preamble_ints   4 (estimation mode) or 2 (raw/exact)
    byte 1   serial version  1
    byte 2   family          17 (REQ)
    byte 3   flags           bit0 IS_EMPTY | bit1 IS_HIGH_RANK |
                             bit4 RAW_ITEMS | bit5 IS_LEVEL_ZERO_SORTED
    uint16 @4 k
    byte 6   num_levels
    byte 7   num_raw_items (only when RAW_ITEMS: n ≤ MIN_K)
    [estimation mode] uint64 n, item min, item max
    [raw items]       num_raw_items × item
    [else, per compactor, ascending levels]
        uint64 state, float32 section_size_raw, uint8 lg_weight,
        uint8 num_sections, uint16 padding, uint32 num_items,
        num_items × item (sorted — this engine keeps buffers sorted)

    where "item" is 8 bytes for "<f8" and 4 bytes for "<f4".
"""

from __future__ import annotations

import struct

import numpy as np

from .req import MIN_K, ReqSketch, _Compactor

_SERIAL_VERSION = 1
_FAMILY = 17
# flag bits start at 2: req_sketch.hpp:446 enum flags { RESERVED1,
# RESERVED2, IS_EMPTY, IS_HIGH_RANK, RAW_ITEMS, IS_LEVEL_ZERO_SORTED }
_F_EMPTY = 2
_F_HIGH_RANK = 3
_F_RAW_ITEMS = 4
_F_LEVEL_ZERO_SORTED = 5


class ReqSerdeError(ValueError):
    pass


def serialize_req(sk: ReqSketch, item_dtype: str = "<f8") -> bytes:
    """ReqSketch → reference-compatible bytes; ``item_dtype`` picks the
    wire item width ("<f8" double serde, "<f4" float serde)."""
    dt = np.dtype(item_dtype)
    raw_items = sk.n <= MIN_K
    estimation = sk.is_estimation_mode() if hasattr(sk, "is_estimation_mode") else len(sk.compactors) > 1
    preamble_ints = 4 if estimation else 2
    flags = (
        ((1 << _F_EMPTY) if sk.n == 0 else 0)
        | ((1 << _F_HIGH_RANK) if sk.hra else 0)
        | ((1 << _F_RAW_ITEMS) if raw_items else 0)
        | (1 << _F_LEVEL_ZERO_SORTED)  # this engine keeps buffers sorted
    )
    num_levels = 0 if sk.n == 0 else len(sk.compactors)
    num_raw = int(sk.n) if raw_items else 0
    out = bytearray()
    out += struct.pack("<BBBBHBB", preamble_ints, _SERIAL_VERSION, _FAMILY,
                       flags, sk.k, num_levels, num_raw)
    if sk.n == 0:
        return bytes(out)
    if estimation:
        out += struct.pack("<Q", sk.n)
        out += np.array([sk.min, sk.max], dtype=dt).tobytes()
    if raw_items:
        # stable: identity on already-sorted buffers -> byte isomorphism over ±0.0
        out += np.sort(sk.compactors[0].buf, kind="stable").astype(dt).tobytes()
        return bytes(out)
    for c in sk.compactors:
        buf = np.sort(np.asarray(c.buf, np.float64), kind="stable")
        out += struct.pack("<Qf", int(c.state), float(c.section_size_raw))
        out += struct.pack("<BBHI", int(c.lg_weight), int(c.num_sections), 0, len(buf))
        out += buf.astype(dt).tobytes()
    return bytes(out)


def deserialize_req(buf: bytes, seed: int = 9001,
                    item_dtype: str = "<f8") -> ReqSketch:
    """Reference-layout bytes → ReqSketch; ``item_dtype`` must match the
    writer's item serde ("<f8" doubles, "<f4" floats — items widen
    losslessly to float64 state). Fails fast on family/version mismatch
    and truncation."""
    dt = np.dtype(item_dtype)
    w = dt.itemsize
    if len(buf) < 8:
        raise ReqSerdeError(f"buffer too short for preamble: {len(buf)}")
    preamble_ints, sv, family, flags, k, num_levels, num_raw = struct.unpack_from(
        "<BBBBHBB", buf, 0
    )
    if family != _FAMILY:
        raise ReqSerdeError(f"not a REQ sketch (family {family})")
    if sv != _SERIAL_VERSION:
        raise ReqSerdeError(f"unsupported serial version {sv}")
    hra = bool(flags & (1 << _F_HIGH_RANK))
    sk = ReqSketch(k, hra=hra, seed=seed)
    if flags & (1 << _F_EMPTY):
        return sk
    off = 8
    estimation = preamble_ints == 4
    if estimation:
        if len(buf) < off + 8 + 2 * w:
            raise ReqSerdeError("truncated n/min/max")
        (n,) = struct.unpack_from("<Q", buf, off)
        off += 8
        mn, mx = np.frombuffer(buf, dt, count=2, offset=off).astype(np.float64)
        off += 2 * w
    if flags & (1 << _F_RAW_ITEMS):
        if len(buf) < off + w * num_raw:
            raise ReqSerdeError("truncated raw items")
        items = np.frombuffer(buf, dt, count=num_raw, offset=off)
        sk.update_batch(items.astype(np.float64))
        return sk
    compactors = []
    total = 0
    for lvl in range(num_levels):
        if len(buf) < off + 20:
            raise ReqSerdeError(f"truncated compactor header at level {lvl}")
        state, ssr = struct.unpack_from("<Qf", buf, off)
        lg_w, num_sections, _, num_items = struct.unpack_from("<BBHI", buf, off + 12)
        off += 20
        if len(buf) < off + w * num_items:
            raise ReqSerdeError(f"truncated items at level {lvl}")
        items = np.frombuffer(buf, dt, count=num_items, offset=off).astype(np.float64)
        off += w * num_items
        c = _Compactor(lg_w, k, hra, sk.rng)
        c.state = int(state)
        c.section_size_raw = float(ssr)
        c.section_size = max(MIN_K, int(round(ssr)))
        c.num_sections = int(num_sections)
        c.buf = items
        compactors.append(c)
        total += num_items << lg_w
    sk.compactors = compactors
    if estimation:
        sk.n = int(n)
        sk.min = float(mn)
        sk.max = float(mx)
    else:
        sk.n = total
        if total:
            allv = np.concatenate([c.buf for c in compactors])
            sk.min = float(allv.min())
            sk.max = float(allv.max())
    return sk
