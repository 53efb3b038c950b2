"""KLL doubles-sketch wire serialization — the reference byte layout
(kll_sketch_impl.hpp:368-399 serialize / :deserialize, constants
kll_sketch.hpp:540-550), re-derived so KLL sketches built by this engine
can be exchanged with Java/C++ DataSketches deployments.

Layout (little-endian):

    byte 0   preamble_ints    2 (empty / single item) or 5 (full)
    byte 1   serial version   1 (full/empty) or 2 (single item)
    byte 2   family           15 (KLL)
    byte 3   flags            bit0 IS_EMPTY | bit1 IS_LEVEL_ZERO_SORTED |
                              bit2 IS_SINGLE_ITEM
    byte 4-5 k (uint16)
    byte 6   m (uint8, 8)
    byte 7   unused
    [empty] end.
    [single item] one float64 at offset 8.
    [full]
      uint64 n, uint16 min_k, uint8 num_levels, uint8 unused  (→ offset 20)
      num_levels × uint32 level offsets (the LAST boundary is NOT
        serialized — the reader derives it as compute_total_capacity(k, m,
        num_levels); the retained region is right-aligned at that
        capacity, free space lives at the front: kll_sketch_impl.hpp:326)
      float64 min_item, float64 max_item
      retained items (level 0 first, ascending levels), float64 each

Capacity math mirrors kll_helper int_cap_aux / int_cap_aux_aux exactly
(integer fixed-point round of k·(2/3)^depth — NOT float pow, whose
rounding drifts by 1 at some depths): level h of H has capacity
max(m, int_cap(k, H−h−1)).
"""

from __future__ import annotations

import math
import struct

import numpy as np

from .quantiles import KllSketch

_FAMILY = 15
_SV_FULL = 1
_SV_SINGLE = 2
_PREAMBLE_SHORT = 2
_PREAMBLE_FULL = 5
_M = 8
_F_EMPTY = 0
_F_LEVEL_ZERO_SORTED = 1
_F_SINGLE_ITEM = 2


class KllSerdeError(ValueError):
    pass


def _int_cap(k: int, depth: int) -> int:
    """kll_helper::int_cap_aux — integer round of k·(2/3)^depth."""
    if depth > 60:
        raise KllSerdeError("depth > 60")
    if depth > 30:
        half = depth // 2
        return _int_cap(_int_cap(k, half), depth - half)
    twok = k << 1
    tmp = (twok << depth) // (3 ** depth)
    result = (tmp + 1) >> 1
    if result > k:
        raise KllSerdeError("capacity result > k")
    return result


def _level_capacity(k: int, num_levels: int, h: int, m: int = _M) -> int:
    return max(m, _int_cap(k, num_levels - h - 1))


def _total_capacity(k: int, m: int, num_levels: int) -> int:
    return sum(_level_capacity(k, num_levels, h, m) for h in range(num_levels))


def serialize_kll(sk: KllSketch, item_dtype: str = "<f8") -> bytes:
    """KllSketch → reference-layout bytes. ``item_dtype`` selects the
    reference's item type: "<f8" (kll_doubles_sketch, the default) or
    "<f4" (kll_floats_sketch — the type of the reference's golden
    kll_sketch_float_one_item_v1.sk). The wire format does not encode the
    item type; reader and writer must agree, exactly as in the reference
    (kll_sketch.hpp template parameter)."""
    dt = np.dtype(item_dtype)
    if sk.n == 0:
        return struct.pack(
            "<BBBBHBB", _PREAMBLE_SHORT, _SV_FULL, _FAMILY, 1 << _F_EMPTY,
            sk.k, _M, 0,
        )
    # stable sort: a stable sort of an already-sorted buffer is the identity,
    # so serialize(deserialize(b)) == b holds even for foreign blobs whose
    # equal-comparing items (e.g. -0.0 vs +0.0) arrive in an order np.sort's
    # default quicksort would not preserve.
    levels = [np.sort(np.asarray(lvl, np.float64), kind="stable") for lvl in sk.levels]
    retained = int(sum(len(lvl) for lvl in levels))
    if sk.n == 1:
        head = struct.pack(
            "<BBBBHBB", _PREAMBLE_SHORT, _SV_SINGLE, _FAMILY,
            (1 << _F_SINGLE_ITEM) | (1 << _F_LEVEL_ZERO_SORTED), sk.k, _M, 0,
        )
        item = next(lvl for lvl in levels if len(lvl))[0]
        return head + np.array([item], dt).tobytes()
    num_levels = len(levels)
    capacity = _total_capacity(sk.k, _M, num_levels)
    if retained > capacity:
        raise KllSerdeError(
            f"retained {retained} exceeds reference capacity {capacity} "
            f"for k={sk.k}, H={num_levels}"
        )
    out = bytearray()
    out += struct.pack(
        "<BBBBHBB", _PREAMBLE_FULL, _SV_FULL, _FAMILY,
        1 << _F_LEVEL_ZERO_SORTED, sk.k, _M, 0,
    )
    out += struct.pack("<QHBB", sk.n, min(sk.min_k, sk.k), num_levels, 0)
    offsets = np.empty(num_levels + 1, np.uint32)
    offsets[0] = capacity - retained
    for i, lvl in enumerate(levels):
        offsets[i + 1] = offsets[i] + len(lvl)
    assert offsets[num_levels] == capacity
    out += offsets[:num_levels].astype("<u4").tobytes()
    out += np.array([sk.min_item, sk.max_item], dt).tobytes()
    for lvl in levels:
        out += lvl.astype(dt, copy=False).tobytes()
    return bytes(out)


def deserialize_kll(buf: bytes, seed: int = 9001,
                    item_dtype: str = "<f8") -> KllSketch:
    """Reference-layout bytes → KllSketch; fails fast on family/version
    mismatch and truncation (deserialize-hardening discipline).
    ``item_dtype`` must match the writer's item type ("<f8" doubles,
    "<f4" floats); items widen losslessly to the engine's float64 state.
    Handles both the v2 single-item short form and v1 streams that store
    a single item in the full layout (kll_sketch_float_one_item_v1.sk)."""
    dt = np.dtype(item_dtype)
    w = dt.itemsize
    if len(buf) < 8:
        raise KllSerdeError(f"buffer too short for preamble: {len(buf)}")
    preamble_ints, sv, family, flags, k, m, _ = struct.unpack_from("<BBBBHBB", buf, 0)
    if family != _FAMILY:
        raise KllSerdeError(f"not a KLL sketch (family {family})")
    if sv not in (_SV_FULL, _SV_SINGLE):
        raise KllSerdeError(f"unsupported serial version {sv}")
    if m != _M:
        raise KllSerdeError(f"unsupported m {m} (expected {_M})")
    sk = KllSketch(k, seed)
    if flags & (1 << _F_EMPTY):
        return sk
    if flags & (1 << _F_SINGLE_ITEM):
        if len(buf) < 8 + w:
            raise KllSerdeError("truncated single-item stream")
        item = float(np.frombuffer(buf, dt, count=1, offset=8)[0])
        sk.update_batch(np.array([item]))
        return sk
    if preamble_ints != _PREAMBLE_FULL:
        raise KllSerdeError(f"bad preamble_ints {preamble_ints} for full sketch")
    if len(buf) < 20:
        raise KllSerdeError("truncated full preamble")
    n, _min_k, num_levels, _ = struct.unpack_from("<QHBB", buf, 8)
    off = 20
    need = off + 4 * num_levels + 2 * w
    if len(buf) < need:
        raise KllSerdeError("truncated levels/min/max")
    offsets = np.frombuffer(buf, "<u4", count=num_levels, offset=off).astype(np.int64)
    off += 4 * num_levels
    mn, mx = np.frombuffer(buf, dt, count=2, offset=off)
    off += 2 * w
    capacity = _total_capacity(k, m, num_levels)
    bounds = np.append(offsets, capacity)
    retained = int(capacity - offsets[0])
    if len(buf) < off + w * retained:
        raise KllSerdeError(
            f"truncated items: need {off + w * retained} bytes, have {len(buf)}"
        )
    items = np.frombuffer(buf, dt, count=retained, offset=off).astype(np.float64)
    sk.n = int(n)
    sk.min_k = int(_min_k)
    sk.min_item = float(mn)
    sk.max_item = float(mx)
    sk.levels = [
        items[int(bounds[i] - bounds[0]) : int(bounds[i + 1] - bounds[0])].copy()
        for i in range(num_levels)
    ]
    return sk
