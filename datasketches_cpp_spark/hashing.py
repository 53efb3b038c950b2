"""Deterministic 64/128-bit hashing — the bedrock of the whole engine.

Re-expresses the reference's hash discipline (MurmurHash3_x64_128 with a
fixed default seed, ``h1 >> 1`` to keep hashes in ``[0, 2**63)``; see
/root/reference/common/include/MurmurHash3.h:95-167 and
/root/reference/theta/include/theta_update_sketch_base.hpp:180-184,
/root/reference/common/include/common_defs.hpp:34 ``DEFAULT_SEED = 9001``)
as **vectorized numpy kernels** so that per-Arrow-batch UDFs never touch a
Python-per-row loop. Every worker imports this exact module (shipped with the
package), which is what makes signatures bit-identical across executors —
the distributed analog of the reference's seed-hash fingerprint check
(/root/reference/theta/include/theta_union_base_impl.hpp:41-42).

Nothing here is copied from the reference: murmur3/xxhash64 are public
published algorithms; the implementations below are fresh numpy expressions
of the published spec.
"""

from __future__ import annotations

import struct

import numpy as np

# Spark SQL dtypes that hash through the int64 path (shared by every
# sketch module's pandas-dtype dispatch — keep ONE definition)
INT_DTYPES = frozenset({"tinyint", "smallint", "int", "bigint", "date"})

DEFAULT_SEED = 9001  # same default-seed discipline as the reference
MAX_HASH_63 = (1 << 63) - 1  # hash domain after >>1 is [0, 2**63)

_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)
_C1 = np.uint64(0x87C37B91114253D5)
_C2 = np.uint64(0x4CF5AD432745937F)

# numpy integer ops wrap silently for unsigned types, which is exactly the
# mod-2^64 arithmetic murmur needs; silence the RuntimeWarning numpy >=1.24
# sometimes emits for scalar-array mixed ops by keeping everything uint64.


def _rotl64(x: np.ndarray, r: int) -> np.ndarray:
    r = np.uint64(r)
    return (x << r) | (x >> (np.uint64(64) - r))


def _fmix64(k: np.ndarray) -> np.ndarray:
    k = k ^ (k >> np.uint64(33))
    k = k * np.uint64(0xFF51AFD7ED558CCD)
    k = k ^ (k >> np.uint64(33))
    k = k * np.uint64(0xC4CEB9FE1A85EC53)
    k = k ^ (k >> np.uint64(33))
    return k


def murmur3_x64_128_fixed(data: np.ndarray, seed: int = DEFAULT_SEED):
    """Vectorized MurmurHash3_x64_128 over n fixed-length byte rows.

    ``data``: uint8 array of shape (n, L) — every row is one L-byte message.
    Returns ``(h1, h2)`` uint64 arrays of shape (n,). The block loop runs
    L//16 times (a handful of iterations) while all row-parallelism is
    vectorized, so throughput is memory-bound, not interpreter-bound.
    """
    if data.ndim != 2 or data.dtype != np.uint8:
        raise ValueError("expected uint8 array of shape (n, L)")
    n, length = data.shape
    # slab the row dimension so the ~20 temporaries stay cache-resident —
    # one giant pass makes every op a DRAM round-trip, which collapses
    # under many parallel workers (memory-bandwidth-bound, not CPU-bound)
    slab = 1 << 15
    if n > slab:
        h1 = np.empty(n, dtype=np.uint64)
        h2 = np.empty(n, dtype=np.uint64)
        for s in range(0, n, slab):
            h1[s : s + slab], h2[s : s + slab] = murmur3_x64_128_fixed(
                data[s : s + slab], seed
            )
        return h1, h2
    h1 = np.full(n, seed, dtype=np.uint64)
    h2 = np.full(n, seed, dtype=np.uint64)
    nblocks = length // 16

    if nblocks:
        # little-endian u64 view of the block region
        blocks = data[:, : nblocks * 16].copy().view("<u8").reshape(n, nblocks * 2)
        for i in range(nblocks):
            k1 = blocks[:, 2 * i].astype(np.uint64)
            k2 = blocks[:, 2 * i + 1].astype(np.uint64)
            k1 = k1 * _C1
            k1 = _rotl64(k1, 31)
            k1 = k1 * _C2
            h1 = h1 ^ k1
            h1 = _rotl64(h1, 27)
            h1 = h1 + h2
            h1 = h1 * np.uint64(5) + np.uint64(0x52DCE729)
            k2 = k2 * _C2
            k2 = _rotl64(k2, 33)
            k2 = k2 * _C1
            h2 = h2 ^ k2
            h2 = _rotl64(h2, 31)
            h2 = h2 + h1
            h2 = h2 * np.uint64(5) + np.uint64(0x38495AB5)

    tail = length & 15
    if tail:
        t = data[:, nblocks * 16 :].astype(np.uint64)  # (n, tail)
        k1 = np.zeros(n, dtype=np.uint64)
        k2 = np.zeros(n, dtype=np.uint64)
        for j in range(min(tail, 8)):
            k1 = k1 | (t[:, j] << np.uint64(8 * j))
        for j in range(8, tail):
            k2 = k2 | (t[:, j] << np.uint64(8 * (j - 8)))
        if tail > 8:
            k2 = k2 * _C2
            k2 = _rotl64(k2, 33)
            k2 = k2 * _C1
            h2 = h2 ^ k2
        k1 = k1 * _C1
        k1 = _rotl64(k1, 31)
        k1 = k1 * _C2
        h1 = h1 ^ k1

    ln = np.uint64(length)
    h1 = h1 ^ ln
    h2 = h2 ^ ln
    h1 = h1 + h2
    h2 = h2 + h1
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = h1 + h2
    h2 = h2 + h1
    return h1, h2


def murmur3_x64_128_scalar(data: bytes, seed: int = DEFAULT_SEED):
    """Pure-python scalar murmur3 x64_128 — independent cross-check oracle
    for the vectorized kernel, and the variable-length path for one-off
    hashing (config fingerprints, distinct-token caches)."""
    m = (1 << 64) - 1
    c1, c2 = 0x87C37B91114253D5, 0x4CF5AD432745937F
    h1 = h2 = seed & m
    length = len(data)
    nblocks = length // 16

    def rotl(x, r):
        return ((x << r) | (x >> (64 - r))) & m

    def fmix(k):
        k ^= k >> 33
        k = (k * 0xFF51AFD7ED558CCD) & m
        k ^= k >> 33
        k = (k * 0xC4CEB9FE1A85EC53) & m
        k ^= k >> 33
        return k

    for i in range(nblocks):
        k1 = int.from_bytes(data[16 * i : 16 * i + 8], "little")
        k2 = int.from_bytes(data[16 * i + 8 : 16 * i + 16], "little")
        k1 = rotl((k1 * c1) & m, 31)
        k1 = (k1 * c2) & m
        h1 ^= k1
        h1 = rotl(h1, 27)
        h1 = (h1 + h2) & m
        h1 = (h1 * 5 + 0x52DCE729) & m
        k2 = rotl((k2 * c2) & m, 33)
        k2 = (k2 * c1) & m
        h2 ^= k2
        h2 = rotl(h2, 31)
        h2 = (h2 + h1) & m
        h2 = (h2 * 5 + 0x38495AB5) & m

    tail = data[nblocks * 16 :]
    k1 = int.from_bytes(tail[:8], "little")
    k2 = int.from_bytes(tail[8:], "little")
    if len(tail) > 8:
        k2 = rotl((k2 * c2) & m, 33)
        k2 = (k2 * c1) & m
        h2 ^= k2
    if len(tail) > 0:
        k1 = rotl((k1 * c1) & m, 31)
        k1 = (k1 * c2) & m
        h1 ^= k1

    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & m
    h2 = (h2 + h1) & m
    h1 = fmix(h1)
    h2 = fmix(h2)
    h1 = (h1 + h2) & m
    h2 = (h2 + h1) & m
    return h1, h2


def hash63_fixed(data: np.ndarray, seed: int = DEFAULT_SEED) -> np.ndarray:
    """Reference hash-domain convention: ``murmur(...).h1 >> 1`` ∈ [0, 2^63)
    (theta_update_sketch_base.hpp:183 keeps values Java-long-compatible)."""
    h1, _ = murmur3_x64_128_fixed(data, seed)
    return (h1 >> np.uint64(1)).astype(np.uint64)


def hash63_int64(values: np.ndarray, seed: int = DEFAULT_SEED) -> np.ndarray:
    """Hash an int64 column exactly like the reference hashes integers:
    widen to int64, serialize 8 bytes little-endian, murmur, ``h1 >> 1``
    (theta_sketch_impl.hpp:146-183 int canonicalization)."""
    v = np.ascontiguousarray(values, dtype="<i8")
    return hash63_fixed(v.view(np.uint8).reshape(-1, 8), seed)


def hash63_bytes_scalar(data: bytes, seed: int = DEFAULT_SEED) -> int:
    return murmur3_x64_128_scalar(data, seed)[0] >> 1


def seed_hash(seed: int = DEFAULT_SEED) -> int:
    """16-bit seed fingerprint, the reference's cross-sketch compatibility
    check (MurmurHash3 of the 8-byte LE seed hashed WITH SEED 0 —
    compute_seed_hash, MurmurHash3.h:171-175; mismatch must fail fast,
    theta_union_base_impl.hpp:41-42). Byte-compatible with Java/C++
    datasketches so serialized sketches interoperate. Also stamped into
    checkpoint manifests."""
    h = murmur3_x64_128_scalar(int(seed).to_bytes(8, "little"), 0)[0]
    return h & 0xFFFF


def hash63_bytes_many(bufs: list, seed: int = DEFAULT_SEED) -> np.ndarray:
    """Vectorized murmur over a batch of variable-length byte strings by
    length-bucketing: rows of equal length are stacked into one (m, L)
    matrix and hashed in a single vectorized call. Worst case (all lengths
    distinct) degrades to per-length calls, which is still batch-amortized
    for natural-language tokens (few dozen distinct lengths per batch)."""
    n = len(bufs)
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out
    lengths = np.fromiter((len(b) for b in bufs), dtype=np.int64, count=n)
    flat = np.frombuffer(b"".join(bufs), dtype=np.uint8)
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(lengths[:-1], out=starts[1:])
    for length in np.unique(lengths):
        idx = np.nonzero(lengths == length)[0]
        if length == 0:
            # empty input is a no-op in the reference update path
            # (theta_sketch_impl.hpp:196-199); callers filter these, but
            # hash deterministically anyway
            h, _ = murmur3_x64_128_fixed(np.empty((len(idx), 0), np.uint8), seed)
        else:
            rows = flat[starts[idx, None] + np.arange(length)]
            h, _ = murmur3_x64_128_fixed(rows, seed)
        out[idx] = h >> np.uint64(1)
    return out


def hash63_str_many(strings, seed: int = DEFAULT_SEED) -> np.ndarray:
    """UTF-8 encode + hash63 a batch of python strings."""
    return hash63_bytes_many([s.encode("utf-8") for s in strings], seed)


# ---------------------------------------------------------------------------
# xxhash64 — vectorized for 8-byte messages, spark-compatible.
#
# Spark's builtin ``xxhash64`` hashes a LongType column as its 8 little-endian
# bytes with seed 42; implementing the same thing in numpy gives us an
# externally-validated hash path (tests cross-check vs pyspark.sql.functions
# .xxhash64). Used for band-hash salting where murmur-parity isn't required.
# ---------------------------------------------------------------------------

_XXP1 = np.uint64(0x9E3779B185EBCA87)
_XXP2 = np.uint64(0xC2B2AE3D27D4EB4F)
_XXP3 = np.uint64(0x165667B19E3779F9)
_XXP4 = np.uint64(0x85EBCA77C2B2AE63)
_XXP5 = np.uint64(0x27D4EB2F165667C5)


def xxhash64_bytes(data: bytes, seed: int = 0) -> int:
    """Full XXH64 over an arbitrary-length byte string (the published
    xxHash spec: 4-lane 32-byte stripes, merge rounds, 8/4/1-byte tail,
    avalanche). Scalar — used for short keys (e.g. the reference's
    array-of-strings tuple key hash); 8-byte messages agree with the
    vectorized xxhash64_int64 (cross-checked in tests)."""
    m = (1 << 64) - 1
    p1, p2, p3, p4, p5 = (int(_XXP1), int(_XXP2), int(_XXP3),
                          int(_XXP4), int(_XXP5))

    def rotl(x: int, r: int) -> int:
        return ((x << r) | (x >> (64 - r))) & m

    def rnd(acc: int, lane: int) -> int:
        return (rotl((acc + lane * p2) & m, 31) * p1) & m

    n = len(data)
    pos = 0
    seed &= m
    if n >= 32:
        v1 = (seed + p1 + p2) & m
        v2 = (seed + p2) & m
        v3 = seed
        v4 = (seed - p1) & m
        while pos + 32 <= n:
            l1, l2, l3, l4 = struct.unpack_from("<4Q", data, pos)
            v1, v2 = rnd(v1, l1), rnd(v2, l2)
            v3, v4 = rnd(v3, l3), rnd(v4, l4)
            pos += 32
        h = (rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)) & m
        for v in (v1, v2, v3, v4):
            h = ((h ^ rnd(0, v)) * p1 + p4) & m
    else:
        h = (seed + p5) & m
    h = (h + n) & m
    while pos + 8 <= n:
        (lane,) = struct.unpack_from("<Q", data, pos)
        h = (rotl(h ^ rnd(0, lane), 27) * p1 + p4) & m
        pos += 8
    if pos + 4 <= n:
        (lane,) = struct.unpack_from("<I", data, pos)
        h = (rotl(h ^ ((lane * p1) & m), 23) * p2 + p3) & m
        pos += 4
    while pos < n:
        h = (rotl(h ^ ((data[pos] * p5) & m), 11) * p1) & m
        pos += 1
    h ^= h >> 33
    h = (h * p2) & m
    h ^= h >> 29
    h = (h * p3) & m
    h ^= h >> 32
    return h


def xxhash64_int64(values: np.ndarray, seed: int = 42) -> np.ndarray:
    """xxhash64 of each int64 as an 8-byte LE message (Spark semantics)."""
    inp = np.ascontiguousarray(values, dtype="<i8").view(np.uint64)
    h = np.uint64(seed) + _XXP5 + np.uint64(8)
    k1 = inp * _XXP2
    k1 = _rotl64(k1, 31)
    k1 = k1 * _XXP1
    h = h ^ k1
    h = _rotl64(h, 27) * _XXP1 + _XXP4
    h = h ^ (h >> np.uint64(33))
    h = h * _XXP2
    h = h ^ (h >> np.uint64(29))
    h = h * _XXP3
    h = h ^ (h >> np.uint64(32))
    return h
