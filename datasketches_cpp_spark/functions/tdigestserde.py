"""t-digest wire serialization — the reference byte layout
(tdigest/include/tdigest_impl.hpp serialize, constants tdigest.hpp:289-295,
SKETCH_TYPE=20, double centroids = (float64 mean, uint64 weight)),
re-derived so digests built by `tdigest.tdigest_agg` can be exchanged with
Java/C++ DataSketches deployments.

Layout (little-endian):

    byte 0   preamble_longs  1 (empty / single value) or 2 (multiple)
    byte 1   serial version  1
    byte 2   sketch type     20
    uint16 @3 k (the compression parameter; this engine's `delta`)
    byte 5   flags           bit0 IS_EMPTY | bit1 IS_SINGLE_VALUE |
                             bit2 REVERSE_MERGE (always 0 here — the
                             engine's digests are order-canonicalized)
    uint16 @6 unused
    [empty] end.  [single value] float64 value.
    [multiple]
      uint32 num_centroids, uint32 buffer_count (0 — serialized digests
        are compressed first, same as the reference's with_buffer=false)
      float64 min, float64 max
      num_centroids × (float64 mean, uint64 weight)
"""

from __future__ import annotations

import struct

import numpy as np

from .tdigest import TDigest

_SERIAL_VERSION = 1
_SKETCH_TYPE = 20
_F_EMPTY = 0
_F_SINGLE_VALUE = 1


class TDigestSerdeError(ValueError):
    pass


def serialize_tdigest(td: TDigest) -> bytes:
    """TDigest → reference-compatible bytes (double item type)."""
    if td.n == 0:
        return struct.pack("<BBBHBH", 1, _SERIAL_VERSION, _SKETCH_TYPE,
                           td.delta, 1 << _F_EMPTY, 0)
    if td.n == 1:
        head = struct.pack("<BBBHBH", 1, _SERIAL_VERSION, _SKETCH_TYPE,
                           td.delta, 1 << _F_SINGLE_VALUE, 0)
        return head + struct.pack("<d", td.min)
    out = bytearray()
    out += struct.pack("<BBBHBH", 2, _SERIAL_VERSION, _SKETCH_TYPE, td.delta, 0, 0)
    n_cent = len(td.means)
    out += struct.pack("<IIdd", n_cent, 0, td.min, td.max)
    inter = np.empty(n_cent, dtype=[("m", "<f8"), ("w", "<u8")])
    inter["m"] = np.asarray(td.means, np.float64)
    inter["w"] = np.asarray(td.weights, np.float64).astype(np.uint64)
    out += inter.tobytes()
    return bytes(out)


_COMPAT_DOUBLE = 1
_COMPAT_FLOAT = 2


def deserialize_tdigest_compat(buf: bytes) -> TDigest:
    """Parse the ORIGINAL t-digest reference implementation's byte format
    (Ted Dunning's asBytes()/asSmallBytes(), big-endian ByteBuffer layout)
    — the format of the datasketches goldens
    tdigest/test/tdigest_ref_k100_n10000_{double,float}.sk, mirroring
    tdigest_impl.hpp:533-595 deserialize_compat:

        uint32 BE type @0: 1 (asBytes, doubles) or 2 (asSmallBytes, floats)
        double BE min, double BE max
        type 1: double BE k, uint32 BE num_centroids,
                num × (double BE weight, double BE mean)
        type 2: float BE k, uint32 unused, uint16 BE num_centroids,
                num × (float BE weight, float BE mean)
    """
    if len(buf) < 4:
        raise TDigestSerdeError("buffer too short for compat preamble")
    (ctype,) = struct.unpack_from(">I", buf, 0)
    if ctype == _COMPAT_DOUBLE:
        if len(buf) < 32:
            raise TDigestSerdeError("truncated compat-double preamble")
        mn, mx, kd = struct.unpack_from(">ddd", buf, 4)
        (n_cent,) = struct.unpack_from(">I", buf, 28)
        off, rec = 32, np.dtype([("w", ">f8"), ("m", ">f8")])
    elif ctype == _COMPAT_FLOAT:
        if len(buf) < 30:
            raise TDigestSerdeError("truncated compat-float preamble")
        mn, mx = struct.unpack_from(">dd", buf, 4)
        (kd,) = struct.unpack_from(">f", buf, 20)
        (n_cent,) = struct.unpack_from(">H", buf, 28)
        off, rec = 30, np.dtype([("w", ">f4"), ("m", ">f4")])
    else:
        raise TDigestSerdeError(f"unexpected compat preamble 0 0 0 {ctype}")
    need = off + rec.itemsize * n_cent
    if len(buf) < need:
        raise TDigestSerdeError(f"truncated centroids: need {need}, have {len(buf)}")
    inter = np.frombuffer(buf, rec, count=n_cent, offset=off)
    if not np.isfinite(mn) or not np.isfinite(mx):
        raise TDigestSerdeError("non-finite min/max")
    if n_cent and (not np.isfinite(inter["w"]).all() or (inter["w"] <= 0).any()
                   or not np.isfinite(inter["m"]).all()):
        raise TDigestSerdeError("corrupt centroid weight/mean")
    td = TDigest(int(kd))
    # the reference truncates weights to integers (static_cast<W>)
    td.means = inter["m"].astype(np.float64)
    td.weights = inter["w"].astype(np.float64).astype(np.uint64).astype(np.float64)
    order = np.argsort(td.means, kind="stable")
    td.means, td.weights = td.means[order], td.weights[order]
    td.n = int(td.weights.sum())
    td.min = float(mn)
    td.max = float(mx)
    return td


def deserialize_tdigest(buf: bytes) -> TDigest:
    """Reference-layout bytes → TDigest; fails fast on type/version
    mismatch and truncation. A stream whose first three bytes are zero is
    dispatched to the original-reference-implementation compat parser
    (tdigest_impl.hpp:406)."""
    if len(buf) < 8:
        raise TDigestSerdeError(f"buffer too short for preamble: {len(buf)}")
    pre, sv, typ, k, flags, _ = struct.unpack_from("<BBBHBH", buf, 0)
    if pre == 0 and sv == 0 and typ == 0:
        return deserialize_tdigest_compat(buf)
    if typ != _SKETCH_TYPE:
        raise TDigestSerdeError(f"not a t-digest (sketch type {typ})")
    if sv != _SERIAL_VERSION:
        raise TDigestSerdeError(f"unsupported serial version {sv}")
    td = TDigest(k)
    if flags & (1 << _F_EMPTY):
        return td
    if flags & (1 << _F_SINGLE_VALUE):
        if len(buf) < 16:
            raise TDigestSerdeError("truncated single value")
        (v,) = struct.unpack_from("<d", buf, 8)
        td.means = np.array([v])
        td.weights = np.array([1.0])
        td.n = 1
        td.min = td.max = v
        return td
    if len(buf) < 32:
        raise TDigestSerdeError("truncated centroid preamble")
    n_cent, buf_count, mn, mx = struct.unpack_from("<IIdd", buf, 8)
    off = 32
    if len(buf) < off + 16 * n_cent + 8 * buf_count:
        raise TDigestSerdeError(
            f"truncated centroids: need {off + 16 * n_cent + 8 * buf_count}, "
            f"have {len(buf)}"
        )
    inter = np.frombuffer(buf, dtype=[("m", "<f8"), ("w", "<u8")], count=n_cent, offset=off)
    off += 16 * n_cent
    td.means = inter["m"].copy()
    td.weights = inter["w"].astype(np.float64)
    # an unbuffered stream has buffer_count 0; fold any buffered raw items
    if buf_count:
        extra = np.frombuffer(buf, "<f8", count=buf_count, offset=off)
        td.means = np.concatenate([td.means, extra])
        td.weights = np.concatenate([td.weights, np.ones(buf_count)])
        order = np.argsort(td.means, kind="stable")
        td.means, td.weights = td.means[order], td.weights[order]
    td.n = int(td.weights.sum())
    td.min = float(mn)
    td.max = float(mx)
    return td
