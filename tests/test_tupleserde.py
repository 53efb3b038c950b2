"""Tuple compact-sketch wire serde: round-trip + layout + hardening
(reference tuple_sketch_impl.hpp compact serialize, constants :471-473)."""

import numpy as np
import pytest

from datasketches_cpp_spark.functions.tupleserde import (
    TupleSerdeError,
    deserialize_tuple_compact,
    serialize_tuple_compact,
)
from datasketches_cpp_spark.hashing import DEFAULT_SEED, seed_hash
from datasketches_cpp_spark.kmv import MAX_THETA


def _entries(n, seed=3, hi=1 << 62):
    rng = np.random.default_rng(seed)
    keys = np.sort(rng.choice(np.arange(1, 10 * n + 2), size=n, replace=False)).astype(np.int64) if n else np.empty(0, np.int64)
    summaries = rng.random(n) * 100
    return keys, summaries


@pytest.mark.parametrize("n,theta", [
    (0, -1), (1, -1), (7, -1), (200, 1 << 61), (1, 1 << 60),
])
def test_roundtrip(n, theta):
    keys, summaries = _entries(n)
    buf = serialize_tuple_compact(theta, keys, summaries)
    t2, k2, s2 = deserialize_tuple_compact(buf)
    assert t2 == (theta if 0 < theta < MAX_THETA else -1)
    np.testing.assert_array_equal(k2, keys)
    np.testing.assert_array_equal(s2, summaries)
    assert serialize_tuple_compact(t2, k2, s2) == buf


def test_layout():
    keys, summaries = _entries(5)
    buf = serialize_tuple_compact(-1, keys, summaries)
    assert buf[0] == 2 and buf[1] == 3 and buf[2] == 9 and buf[3] == 1
    assert int.from_bytes(buf[6:8], "little") == seed_hash(DEFAULT_SEED)
    assert len(buf) == 16 + 16 * 5  # interleaved (u64, f8) pairs
    # spark agg output feeds straight in: (theta, sig, summaries) row shape
    from datasketches_cpp_spark.functions.tuplesketch import tuple_sketch_agg  # noqa: F401


def test_hardening():
    keys, summaries = _entries(50)
    buf = serialize_tuple_compact(1 << 61, keys, summaries)
    with pytest.raises(TupleSerdeError, match="truncated"):
        deserialize_tuple_compact(buf[:-8])
    with pytest.raises(TupleSerdeError, match="seed hash"):
        deserialize_tuple_compact(buf, seed=77)
    bad = bytearray(buf)
    bad[2] = 3
    with pytest.raises(TupleSerdeError, match="family"):
        deserialize_tuple_compact(bytes(bad))
    with pytest.raises(TupleSerdeError, match="misaligned"):
        serialize_tuple_compact(-1, keys, summaries[:-1])
    with pytest.raises(TupleSerdeError, match="ascending"):
        serialize_tuple_compact(-1, keys[::-1].copy(), summaries)
