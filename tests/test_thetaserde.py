"""Theta v3 serde: round-trip isomorphism + deserialize hardening,
mirroring the reference's IsomorphicTest / deserialize_hardening_test
discipline and byte-layout of theta_sketch_impl.hpp:378-398."""

import numpy as np
import pytest

from datasketches_cpp_spark.functions.thetaserde import (
    ThetaSerdeError,
    deserialize_compact_v3,
    serialize_compact_v3,
)
from datasketches_cpp_spark.hashing import DEFAULT_SEED, seed_hash
from datasketches_cpp_spark.kmv import MAX_THETA


def _sig(n, seed=1, hi=1 << 62):
    rng = np.random.default_rng(seed)
    vals = np.unique(rng.integers(1, hi, size=4 * n + 4, dtype=np.int64))
    return np.sort(rng.choice(vals, size=n, replace=False)) if n else vals[:0]


@pytest.mark.parametrize("n,theta", [
    (0, -1),            # empty exact
    (1, -1),            # single entry exact
    (5, -1),            # exact
    (100, 1 << 61),     # estimation mode
    (1, 1 << 60),       # estimation, single entry
])
def test_roundtrip_isomorphic(n, theta):
    sig = _sig(n, hi=(theta if theta > 0 else 1 << 62))
    buf = serialize_compact_v3(theta, sig)
    t2, s2 = deserialize_compact_v3(buf)
    assert t2 == (theta if (theta > 0 and theta < MAX_THETA) else -1)
    assert np.array_equal(s2, sig)
    # serialize(deserialize(x)) is byte-identical (isomorphism)
    assert serialize_compact_v3(t2, s2) == buf


def test_preamble_layout():
    # exact, multi-entry: preamble_longs=2, version=3, type=3, ordered+
    # compact+readonly flags, correct seed hash — the exact reference bytes
    buf = serialize_compact_v3(-1, _sig(5))
    assert buf[0] == 2 and buf[1] == 3 and buf[2] == 3
    flags = buf[5]
    assert flags & (1 << 1) and flags & (1 << 3) and flags & (1 << 4)
    assert not flags & (1 << 2)  # not empty
    assert int.from_bytes(buf[6:8], "little") == seed_hash(DEFAULT_SEED)
    assert len(buf) == 16 + 5 * 8
    # estimation mode: preamble_longs=3, theta word present
    buf = serialize_compact_v3(1 << 61, _sig(3, hi=1 << 61))
    assert buf[0] == 3
    assert int.from_bytes(buf[16:24], "little") == 1 << 61


def test_empty_sketch_is_one_preamble_long():
    buf = serialize_compact_v3(-1, np.empty(0, np.int64))
    assert len(buf) == 8 and buf[0] == 1
    assert buf[5] & (1 << 2)  # EMPTY flag
    t, s = deserialize_compact_v3(buf)
    assert t == -1 and len(s) == 0


def test_seed_hash_matches_reference_formula():
    # compute_seed_hash(9001) per MurmurHash3.h:171-175: murmur3 of the
    # 8-byte LE seed with hash seed 0, low 16 bits
    from datasketches_cpp_spark.hashing import murmur3_x64_128_scalar

    h = murmur3_x64_128_scalar((9001).to_bytes(8, "little"), 0)[0] & 0xFFFF
    assert seed_hash(9001) == h
    assert seed_hash(9001) != seed_hash(9002)


def test_hardening_truncation_and_mismatch():
    buf = serialize_compact_v3(1 << 61, _sig(50, hi=1 << 61))
    with pytest.raises(ThetaSerdeError, match="truncated"):
        deserialize_compact_v3(buf[:-8])
    with pytest.raises(ThetaSerdeError, match="truncated"):
        deserialize_compact_v3(buf[:10])
    with pytest.raises(ThetaSerdeError, match="seed hash mismatch"):
        deserialize_compact_v3(buf, seed=123)
    bad = bytearray(buf)
    bad[1] = 4
    with pytest.raises(ThetaSerdeError, match="serial version"):
        deserialize_compact_v3(bytes(bad))
    bad = bytearray(buf)
    bad[2] = 1
    with pytest.raises(ThetaSerdeError, match="not a compact theta"):
        deserialize_compact_v3(bytes(bad))


def test_unsorted_entries_rejected():
    with pytest.raises(ThetaSerdeError, match="ascending"):
        serialize_compact_v3(-1, np.array([5, 3, 9], np.int64))
