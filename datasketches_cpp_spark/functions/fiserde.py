"""Frequent-items wire serialization — the reference byte layout
(fi/include/frequent_items_sketch_impl.hpp:165-208, constants
frequent_items_sketch.hpp:309-316, item serde per common/serde.hpp),
re-derived so Misra-Gries states built by `freq.frequent_items_agg` can be
exchanged with Java/C++ DataSketches deployments.

Layout (little-endian):

    byte 0   preamble_longs   1 (empty) or 4 (non-empty)
    byte 1   serial version   1
    byte 2   family           10 (FREQUENCY)
    byte 3   lg_max_map_size
    byte 4   lg_cur_map_size
    byte 5   flags            bits 0 and 2 set iff empty (IS_EMPTY_1/2)
    byte 6-7 unused
    [non-empty]
      uint32 num_items, uint32 unused
      uint64 total_weight, uint64 offset
      num_items × uint64 weights (the per-item over-estimates MINUS the
        map's offset are reconstructed by the reader; the reference
        serializes the map values, which already include the offset —
        we mirror that: values are the stored over-estimates)
      num_items × item via serde: int64 → 8 raw bytes; string →
        uint32 length + UTF-8 bytes

Note on lg_max: the engine allows any max_map_size m; the wire format
carries lg sizes, so the serializer writes ceil(log2(m)) (ε = 3.5/2^lg is
then ≤ the engine's 3.5/m claim — never looser than advertised).
"""

from __future__ import annotations

import math
import struct

import numpy as np

from .freq import MGState

_SER_VER = 1
_FAMILY = 10
_PRE_EMPTY = 1
_PRE_NONEMPTY = 4
_EMPTY_FLAGS = (1 << 0) | (1 << 2)
_LG_MIN_MAP_SIZE = 3


class FiSerdeError(ValueError):
    pass


def _lg(x: int) -> int:
    return max(_LG_MIN_MAP_SIZE, int(math.ceil(math.log2(max(1, x)))))


def serialize_frequent_items(state: MGState) -> bytes:
    """MGState → reference-compatible frequency-sketch bytes. Item type is
    taken from the stored keys: all-int → int64 serde, else UTF-8 string
    serde (the two serde instantiations the reference ships)."""
    if not state.counts:
        return struct.pack(
            "<BBBBBBH", _PRE_EMPTY, _SER_VER, _FAMILY, _lg(state.m),
            _LG_MIN_MAP_SIZE, _EMPTY_FLAGS, 0,
        )
    n = len(state.counts)
    lg_cur = max(_LG_MIN_MAP_SIZE, _lg(int(math.ceil(n / 0.75))))
    lg_max = max(_lg(state.m), lg_cur)
    out = bytearray()
    out += struct.pack("<BBBBBBH", _PRE_NONEMPTY, _SER_VER, _FAMILY, lg_max, lg_cur, 0, 0)
    out += struct.pack("<IIQQ", n, 0, int(state.total), int(state.offset))
    items = list(state.counts.keys())
    # wire weights are the raw map weights — the reference's get_estimate
    # adds the serialized offset back (frequent_items_sketch_impl.hpp:105-108),
    # while MGState.counts already carry the offset; subtract on the way out
    weights = np.fromiter(
        (int(state.counts[i]) - state.offset for i in items), np.uint64, count=n
    )
    out += weights.astype("<u8").tobytes()
    if all(isinstance(i, (int, np.integer)) for i in items):
        out += np.fromiter((int(i) for i in items), np.int64, count=n).astype("<i8").tobytes()
    else:
        for i in items:
            b = str(i).encode("utf-8")
            out += struct.pack("<I", len(b)) + b
    return bytes(out)


def deserialize_frequent_items(buf: bytes, item_type: str = "str") -> MGState:
    """Reference frequency-sketch bytes → MGState. ``item_type``: "str" or
    "int64" (the wire format does not self-describe the item serde — the
    reference requires the caller to know T, and so do we)."""
    if len(buf) < 8:
        raise FiSerdeError(f"buffer too short for preamble: {len(buf)}")
    pre, sv, family, lg_max, _lg_cur, flags, _ = struct.unpack_from("<BBBBBBH", buf, 0)
    if family != _FAMILY:
        raise FiSerdeError(f"not a frequency sketch (family {family})")
    if sv != _SER_VER:
        raise FiSerdeError(f"unsupported serial version {sv}")
    state = MGState(1 << lg_max)
    if flags & _EMPTY_FLAGS:
        return state
    if pre != _PRE_NONEMPTY:
        raise FiSerdeError(f"bad preamble_longs {pre} for non-empty sketch")
    if len(buf) < 32:
        raise FiSerdeError("truncated preamble")
    n, _, total, offset = struct.unpack_from("<IIQQ", buf, 8)
    off = 32
    if len(buf) < off + 8 * n:
        raise FiSerdeError("truncated weights")
    weights = np.frombuffer(buf, "<u8", count=n, offset=off)
    off += 8 * n
    items: list = []
    if item_type == "int64":
        if len(buf) < off + 8 * n:
            raise FiSerdeError("truncated items")
        items = list(np.frombuffer(buf, "<i8", count=n, offset=off))
    elif item_type == "str":
        for _ in range(n):
            if len(buf) < off + 4:
                raise FiSerdeError("truncated item length")
            (ln,) = struct.unpack_from("<I", buf, off)
            off += 4
            if len(buf) < off + ln:
                raise FiSerdeError("truncated item bytes")
            items.append(buf[off : off + ln].decode("utf-8"))
            off += ln
    else:
        raise FiSerdeError(f"unknown item_type {item_type!r}")
    state.total = int(total)
    state.offset = int(offset)
    # raw wire weights + offset == estimates, the form MGState.counts holds
    state.counts = {i: int(w) + int(offset) for i, w in zip(items, weights)}
    return state
