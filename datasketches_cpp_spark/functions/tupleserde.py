"""Tuple compact-sketch wire serialization — the reference byte layout
(tuple/include/tuple_sketch_impl.hpp compact serialize, constants
tuple_sketch.hpp:471-473), re-derived for double-summary tuple sketches
(the shape `tuplesketch.tuple_sketch_agg` emits) so they can be exchanged
with Java/C++ DataSketches deployments instantiated with a fixed-width
8-byte summary serde.

Layout (little-endian):

    byte 0   preamble_longs   3 if estimation mode else (1 if empty or a
                              single entry else 2)
    byte 1   serial version   3
    byte 2   family           9 (tuple)
    byte 3   sketch type      1
    byte 4   unused
    byte 5   flags            READ_ONLY | COMPACT | ORDERED [| EMPTY]
    byte 6-7 seed hash        (same compute_seed_hash as theta)
    [preamble_longs > 1] uint32 num_entries, uint32 unused
    [estimation mode]    uint64 theta
    entries              num_entries × (uint64 key, float64 summary),
                         interleaved, keys ascending
"""

from __future__ import annotations

import struct

import numpy as np

from ..hashing import DEFAULT_SEED, seed_hash
from ..kmv import MAX_THETA

_SERIAL_VERSION = 3
_FAMILY = 9
_SKETCH_TYPE = 1
_F_READ_ONLY = 1
_F_EMPTY = 2
_F_COMPACT = 3
_F_ORDERED = 4


class TupleSerdeError(ValueError):
    pass


def serialize_tuple_compact(
    theta: int,
    keys: np.ndarray,
    summaries: np.ndarray,
    seed: int = DEFAULT_SEED,
) -> bytes:
    """(theta [-1 ⇔ exact], sorted u64 keys, aligned float64 summaries) →
    reference-compatible compact tuple bytes."""
    theta = MAX_THETA if theta < 0 else int(theta)
    keys = np.ascontiguousarray(np.asarray(keys, np.int64).view(np.uint64))
    summaries = np.ascontiguousarray(np.asarray(summaries, np.float64))
    if len(keys) != len(summaries):
        raise TupleSerdeError(
            f"keys ({len(keys)}) and summaries ({len(summaries)}) misaligned"
        )
    if len(keys) > 1 and not (keys[:-1] < keys[1:]).all():
        raise TupleSerdeError("keys must be strictly ascending")
    n = len(keys)
    is_empty = n == 0 and theta >= MAX_THETA
    estimation = theta < MAX_THETA
    preamble_longs = 3 if estimation else (1 if (is_empty or n == 1) else 2)
    flags = (
        (1 << _F_COMPACT)
        | (1 << _F_READ_ONLY)
        | ((1 << _F_EMPTY) if is_empty else 0)
        | (1 << _F_ORDERED)
    )
    out = bytearray()
    out += struct.pack(
        "<BBBBBBH", preamble_longs, _SERIAL_VERSION, _FAMILY, _SKETCH_TYPE,
        0, flags, seed_hash(seed),
    )
    if preamble_longs > 1:
        out += struct.pack("<II", n, 0)
    if estimation:
        out += struct.pack("<Q", theta)
    # interleave (key, summary) pairs via a structured view — one memcpy
    inter = np.empty(n, dtype=[("k", "<u8"), ("s", "<f8")])
    inter["k"] = keys
    inter["s"] = summaries
    out += inter.tobytes()
    return bytes(out)


def deserialize_tuple_compact(
    buf: bytes, seed: int = DEFAULT_SEED
) -> tuple[int, np.ndarray, np.ndarray]:
    """Reference compact tuple bytes (double summaries) → (theta [-1 ⇔
    exact], sorted int64 keys, float64 summaries); fails fast on
    family/type/version/seed-hash mismatch and truncation."""
    if len(buf) < 8:
        raise TupleSerdeError(f"buffer too short for preamble: {len(buf)}")
    preamble_longs, ver, family, typ, _, flags, sh = struct.unpack_from(
        "<BBBBBBH", buf, 0
    )
    if family != _FAMILY:
        raise TupleSerdeError(f"not a tuple sketch (family {family})")
    if ver != _SERIAL_VERSION:
        raise TupleSerdeError(f"unsupported serial version {ver}")
    if typ != _SKETCH_TYPE:
        raise TupleSerdeError(f"unsupported sketch type {typ}")
    if sh != seed_hash(seed):
        raise TupleSerdeError(
            f"seed hash mismatch: stream {sh:#06x} vs seed {seed}"
        )
    is_empty = bool(flags & (1 << _F_EMPTY))
    off = 8
    if preamble_longs > 1:
        if len(buf) < off + 8:
            raise TupleSerdeError("truncated preamble (num_entries)")
        (n,) = struct.unpack_from("<I", buf, off)
        off += 8
    else:
        n = 0 if is_empty else 1
    if preamble_longs == 3:
        if len(buf) < off + 8:
            raise TupleSerdeError("truncated preamble (theta)")
        (theta,) = struct.unpack_from("<Q", buf, off)
        off += 8
    else:
        theta = MAX_THETA
    need = off + 16 * n
    if len(buf) < need:
        raise TupleSerdeError(f"truncated entries: need {need}, have {len(buf)}")
    inter = np.frombuffer(buf, dtype=[("k", "<u8"), ("s", "<f8")], count=n, offset=off)
    return (
        -1 if theta >= MAX_THETA else int(theta),
        inter["k"].view(np.int64).copy(),
        inter["s"].copy(),
    )


# ---------------------------------------------------------------------------
# array-of-doubles compact sketch (family 9, sketch type 3 — the
# Java-interoperable ArrayOfDoublesSketch; layout per
# array_tuple_sketch_impl.hpp:70-141 serialize: fixed 16-byte preamble
# with num_values at byte 5 and theta ALWAYS present, then num_entries,
# then ALL keys, then ALL value arrays — keys and values in separate
# blocks, unlike the interleaved type-1 stream)
# ---------------------------------------------------------------------------

_AOD_SERIAL_VERSION = 1
_AOD_SKETCH_TYPE = 3
_AODF_EMPTY = 2
_AODF_HAS_ENTRIES = 3
_AODF_ORDERED = 4
# the reference's theta_constants::MAX_THETA is LLONG_MAX (2^63 - 1, the
# Java-compat signed max) while this engine's exact-mode sentinel is 2^63;
# AOD streams carry theta unconditionally, so map at the wire boundary
_REF_MAX_THETA = (1 << 63) - 1


def serialize_aod(
    theta: int,
    keys: np.ndarray,
    summaries: np.ndarray,
    num_values: int,
    seed: int = DEFAULT_SEED,
) -> bytes:
    """(theta [-1 ⇔ exact], sorted u64 keys, (n, num_values) float64
    summaries) → reference-compatible compact AOD bytes."""
    theta = MAX_THETA if theta < 0 else int(theta)
    keys = np.ascontiguousarray(np.asarray(keys, np.int64).view(np.uint64))
    d = int(num_values)
    summaries = np.ascontiguousarray(np.asarray(summaries, np.float64)).reshape(-1, d)
    if len(keys) != len(summaries):
        raise TupleSerdeError(
            f"keys ({len(keys)}) and summaries ({len(summaries)}) misaligned"
        )
    if len(keys) > 1 and not (keys[:-1] < keys[1:]).all():
        raise TupleSerdeError("keys must be strictly ascending")
    n = len(keys)
    is_empty = n == 0 and theta >= MAX_THETA
    flags = (
        ((1 << _AODF_EMPTY) if is_empty else 0)
        | ((1 << _AODF_HAS_ENTRIES) if n > 0 else 0)
        | (1 << _AODF_ORDERED)
    )
    out = bytearray()
    out += struct.pack(
        "<BBBBBBH", 1, _AOD_SERIAL_VERSION, _FAMILY, _AOD_SKETCH_TYPE,
        flags, d, seed_hash(seed),
    )
    out += struct.pack("<Q", min(theta, _REF_MAX_THETA))
    if n > 0:
        out += struct.pack("<II", n, 0)
        out += keys.astype("<u8").tobytes()
        out += summaries.astype("<f8").tobytes()
    return bytes(out)


def deserialize_aod(
    buf: bytes, seed: int = DEFAULT_SEED
) -> tuple[int, np.ndarray, np.ndarray, int]:
    """Reference compact AOD bytes → (theta [-1 ⇔ exact], sorted int64
    keys, (n, num_values) float64 summaries, num_values)."""
    if len(buf) < 16:
        raise TupleSerdeError(f"buffer too short for AOD preamble: {len(buf)}")
    _pre, ver, family, typ, flags, d, sh = struct.unpack_from("<BBBBBBH", buf, 0)
    if family != _FAMILY:
        raise TupleSerdeError(f"not a tuple sketch (family {family})")
    if ver != _AOD_SERIAL_VERSION:
        raise TupleSerdeError(f"unsupported AOD serial version {ver}")
    if typ != _AOD_SKETCH_TYPE:
        raise TupleSerdeError(f"unsupported sketch type {typ} (want 3)")
    if sh != seed_hash(seed):
        raise TupleSerdeError(
            f"seed hash mismatch: stream {sh:#06x} vs seed {seed}"
        )
    (theta,) = struct.unpack_from("<Q", buf, 8)
    has_entries = bool(flags & (1 << _AODF_HAS_ENTRIES))
    if not has_entries:
        return (
            -1 if theta >= _REF_MAX_THETA else int(theta),
            np.empty(0, np.int64),
            np.empty((0, d), np.float64),
            int(d),
        )
    if len(buf) < 24:
        raise TupleSerdeError("truncated AOD num_entries")
    (n,) = struct.unpack_from("<I", buf, 16)
    off = 24
    need = off + 8 * n + 8 * n * d
    if len(buf) < need:
        raise TupleSerdeError(f"truncated AOD entries: need {need}, have {len(buf)}")
    keys = np.frombuffer(buf, "<u8", count=n, offset=off)
    vals = np.frombuffer(buf, "<f8", count=n * d, offset=off + 8 * n)
    return (
        -1 if theta >= _REF_MAX_THETA else int(theta),
        keys.view(np.int64).copy(),
        vals.reshape(n, d).copy(),
        int(d),
    )


# -- array-of-strings (AoS) tuple wire ----------------------------------------
# Generic compact tuple preamble (serial v3, sketch type 1 — identical to
# serialize_tuple_compact) with the summary stream replaced by the
# reference's default_array_of_strings_serde item format
# (array_of_strings_sketch_impl.hpp:100-160): per item, u32 total_bytes,
# u8 num_nodes (<= 127), then per string u32 length + UTF-8 bytes.


def _aos_item_bytes(strings) -> bytes:
    if len(strings) > 127:
        raise TupleSerdeError("array_of_strings size exceeds 127")
    enc = [s.encode("utf-8") for s in strings]
    total = 4 + 1 + sum(4 + len(e) for e in enc)
    out = bytearray(struct.pack("<IB", total, len(enc)))
    for e in enc:
        out += struct.pack("<I", len(e)) + e
    return bytes(out)


def serialize_aos(
    theta: int,
    keys: np.ndarray,
    summaries,
    seed: int = DEFAULT_SEED,
) -> bytes:
    """(theta [-1 ⇔ exact], sorted u64 keys, aligned list of string
    lists) → reference-compatible compact array-of-strings tuple bytes."""
    theta = MAX_THETA if theta < 0 else int(theta)
    keys = np.ascontiguousarray(np.asarray(keys, np.int64).view(np.uint64))
    if len(keys) != len(summaries):
        raise TupleSerdeError(
            f"keys ({len(keys)}) and summaries ({len(summaries)}) misaligned"
        )
    if len(keys) > 1 and not (keys[:-1] < keys[1:]).all():
        raise TupleSerdeError("keys must be strictly ascending")
    n = len(keys)
    is_empty = n == 0 and theta >= MAX_THETA
    estimation = theta < MAX_THETA
    preamble_longs = 3 if estimation else (1 if (is_empty or n == 1) else 2)
    flags = (
        (1 << _F_COMPACT)
        | (1 << _F_READ_ONLY)
        | ((1 << _F_EMPTY) if is_empty else 0)
        | (1 << _F_ORDERED)
    )
    out = bytearray()
    out += struct.pack(
        "<BBBBBBH", preamble_longs, _SERIAL_VERSION, _FAMILY, _SKETCH_TYPE,
        0, flags, seed_hash(seed),
    )
    if preamble_longs > 1:
        out += struct.pack("<II", n, 0)
    if estimation:
        out += struct.pack("<Q", theta)
    for k64, item in zip(keys, summaries):
        out += struct.pack("<Q", int(k64)) + _aos_item_bytes(item)
    return bytes(out)


def deserialize_aos(
    buf: bytes, seed: int = DEFAULT_SEED
) -> tuple[int, np.ndarray, list]:
    """Reference compact array-of-strings tuple bytes → (theta [-1 ⇔
    exact], sorted int64 keys, list of string lists)."""
    if len(buf) < 8:
        raise TupleSerdeError(f"buffer too short for preamble: {len(buf)}")
    preamble_longs, ver, family, typ, _, flags, sh = struct.unpack_from(
        "<BBBBBBH", buf, 0
    )
    if family != _FAMILY:
        raise TupleSerdeError(f"not a tuple sketch (family {family})")
    if ver != _SERIAL_VERSION:
        raise TupleSerdeError(f"unsupported serial version {ver}")
    if typ != _SKETCH_TYPE:
        raise TupleSerdeError(f"unsupported sketch type {typ}")
    if sh != seed_hash(seed):
        raise TupleSerdeError(
            f"seed hash mismatch: stream {sh:#06x} vs seed {seed}"
        )
    is_empty = bool(flags & (1 << _F_EMPTY))
    off = 8
    n = None
    if preamble_longs > 1:
        if len(buf) < off + 8:
            raise TupleSerdeError("truncated preamble (num_entries)")
        (n,) = struct.unpack_from("<I", buf, off)
        off += 8
    theta = MAX_THETA
    if preamble_longs > 2:
        if len(buf) < off + 8:
            raise TupleSerdeError("truncated preamble (theta)")
        (theta,) = struct.unpack_from("<Q", buf, off)
        off += 8
    if n is None:
        n = 0 if is_empty else 1
    keys = np.empty(n, np.uint64)
    items = []
    for i in range(n):
        if len(buf) < off + 13:
            raise TupleSerdeError(f"truncated AoS entry {i}")
        (keys[i],) = struct.unpack_from("<Q", buf, off)
        off += 8
        item_start = off
        total, num_nodes = struct.unpack_from("<IB", buf, off)
        if num_nodes > 127:
            raise TupleSerdeError("array_of_strings size exceeds 127")
        p = off + 5
        strings = []
        for _ in range(num_nodes):
            if len(buf) < p + 4:
                raise TupleSerdeError(f"truncated AoS string in entry {i}")
            (slen,) = struct.unpack_from("<I", buf, p)
            p += 4
            if len(buf) < p + slen:
                raise TupleSerdeError(f"truncated AoS string in entry {i}")
            strings.append(buf[p : p + slen].decode("utf-8"))
            p += slen
        if p - item_start != total:
            raise TupleSerdeError(
                f"AoS entry {i}: total_bytes {total} != parsed "
                f"{p - item_start}"
            )
        items.append(strings)
        off = p
    return (
        -1 if theta >= MAX_THETA else int(theta),
        keys.view(np.int64).copy(),
        items,
    )
