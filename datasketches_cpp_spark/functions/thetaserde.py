"""Theta compact-sketch v3 byte serialization — the wire format of
Apache DataSketches (theta/include/theta_sketch_impl.hpp:378-398 serialize,
compact_theta_sketch_parser.hpp:1-73 parse), re-derived so sketches built
by THIS engine can be exchanged with Java/C++ datasketches deployments and
vice versa.

Layout (little-endian, 8-byte preamble words):

    byte 0   preamble_longs   3 if estimation mode else (1 if empty or a
                              single entry else 2)
    byte 1   serial version   3 (uncompressed)
    byte 2   sketch type      3 (compact theta)
    byte 3-4 unused           0
    byte 5   flags            bit1 READ_ONLY | bit2 EMPTY | bit3 COMPACT |
                              bit4 ORDERED (we always write ordered)
    byte 6-7 seed hash        murmur3(seed bytes, seed=0) & 0xFFFF
    [preamble_longs > 1] uint32 num_entries, uint32 unused
    [estimation mode]    uint64 theta
    entries              num_entries × uint64 (sorted ascending)

Deserialization is zero-copy over the entries region (np.frombuffer) — the
analog of the reference's wrapped compact sketch (theta_sketch.hpp:542).
Only v3 (the current uncompressed version) is produced/consumed; v1/v2
legacy and v4 delta-bit-packed streams are out of scope (parquet's
DELTA_BINARY_PACKED covers the storage-compression role engine-side).
"""

from __future__ import annotations

import struct

import numpy as np

from ..hashing import DEFAULT_SEED, seed_hash
from ..kmv import MAX_THETA

_SERIAL_VERSION = 3
_SKETCH_TYPE = 3
# flag bit positions (theta_sketch.hpp:495 enum flags)
_F_READ_ONLY = 1
_F_EMPTY = 2
_F_COMPACT = 3
_F_ORDERED = 4


class ThetaSerdeError(ValueError):
    pass


def serialize_compact_v3(
    theta: int, sig: np.ndarray, seed: int = DEFAULT_SEED
) -> bytes:
    """(theta, sorted uint64 entries) → reference-compatible v3 bytes.
    theta may be passed encoded (-1 ⇔ MAX_THETA / exact mode)."""
    theta = MAX_THETA if theta < 0 else int(theta)
    entries = np.ascontiguousarray(np.asarray(sig, np.int64).view(np.uint64))
    if len(entries) > 1 and not (entries[:-1] < entries[1:]).all():
        raise ThetaSerdeError("entries must be strictly ascending")
    n = len(entries)
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
        "<BBBHBH", preamble_longs, _SERIAL_VERSION, _SKETCH_TYPE, 0, flags,
        seed_hash(seed),
    )
    if preamble_longs > 1:
        out += struct.pack("<II", n, 0)
    if estimation:
        out += struct.pack("<Q", theta)
    out += entries.astype("<u8", copy=False).tobytes()
    return bytes(out)


def deserialize_compact_v3(
    buf: bytes, seed: int = DEFAULT_SEED
) -> tuple[int, np.ndarray]:
    """Reference v3 bytes → (theta [-1 ⇔ exact], sorted int64 entries).
    Validates version / type / seed hash and fails fast on truncation,
    mirroring the reference's deserialize hardening
    (common/test/deserialize_hardening_test.cpp discipline)."""
    if len(buf) < 8:
        raise ThetaSerdeError(f"buffer too short for preamble: {len(buf)} bytes")
    preamble_longs, ver, typ, _, flags, sh = struct.unpack_from("<BBBHBH", buf, 0)
    if ver != _SERIAL_VERSION:
        raise ThetaSerdeError(f"unsupported serial version {ver} (expected 3)")
    if typ != _SKETCH_TYPE:
        raise ThetaSerdeError(f"not a compact theta sketch (type {typ})")
    if sh != seed_hash(seed):
        raise ThetaSerdeError(
            f"seed hash mismatch: stream {sh:#06x} vs seed {seed} "
            f"-> {seed_hash(seed):#06x}"
        )
    is_empty = bool(flags & (1 << _F_EMPTY))
    off = 8
    if preamble_longs > 1:
        if len(buf) < off + 8:
            raise ThetaSerdeError("truncated preamble (num_entries)")
        (n,) = struct.unpack_from("<I", buf, off)
        off += 8
    else:
        n = 0 if is_empty else 1
    if preamble_longs == 3:
        if len(buf) < off + 8:
            raise ThetaSerdeError("truncated preamble (theta)")
        (theta,) = struct.unpack_from("<Q", buf, off)
        off += 8
    else:
        theta = MAX_THETA
    need = off + 8 * n
    if len(buf) < need:
        raise ThetaSerdeError(
            f"truncated entries: need {need} bytes, have {len(buf)}"
        )
    entries = np.frombuffer(buf, dtype="<u8", count=n, offset=off)
    return (-1 if theta >= MAX_THETA else int(theta)), entries.view(np.int64)
