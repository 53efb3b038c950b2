"""KLL wire serde: round-trip isomorphism + layout constants + hardening
(reference kll_sketch_impl.hpp:368-399; constants kll_sketch.hpp:540-550)."""

import math
import struct

import numpy as np
import pytest

from datasketches_cpp_spark.functions.kllserde import (
    KllSerdeError,
    _int_cap,
    _total_capacity,
    deserialize_kll,
    serialize_kll,
)
from datasketches_cpp_spark.functions.quantiles import KllSketch


def _mk(n, k=200, seed=1):
    sk = KllSketch(k=k)
    if n:
        rng = np.random.default_rng(seed)
        for chunk in np.array_split(rng.random(n) * 100, max(1, n // 1000)):
            sk.update_batch(chunk)
    return sk


@pytest.mark.parametrize("n", [0, 1, 50, 5_000, 120_000])
def test_roundtrip_isomorphic(n):
    sk = _mk(n)
    buf = serialize_kll(sk)
    sk2 = deserialize_kll(buf)
    assert sk2.n == sk.n and sk2.k == sk.k
    if n:
        assert sk2.min_item == sk.min_item and sk2.max_item == sk.max_item
    if n > 1:
        v1, w1 = sk.sorted_view()
        v2, w2 = sk2.sorted_view()
        np.testing.assert_array_equal(v1, v2)
        np.testing.assert_array_equal(w1, w2)
        # and the round-trip of the round-trip is byte-identical
        assert serialize_kll(sk2) == buf


def test_layout_constants():
    # empty: 8 bytes, preamble_ints 2, sv 1, family 15, EMPTY flag
    buf = serialize_kll(_mk(0))
    assert len(buf) == 8 and buf[0] == 2 and buf[1] == 1 and buf[2] == 15
    assert buf[3] & 1
    # single item: 16 bytes, sv 2, SINGLE_ITEM flag, item at offset 8
    sk = KllSketch(200)
    sk.update_batch(np.array([42.5]))
    buf = serialize_kll(sk)
    assert len(buf) == 16 and buf[1] == 2 and (buf[3] & 4)
    assert struct.unpack_from("<d", buf, 8)[0] == 42.5
    # full: data starts at 20 (n @ 8, levels @ 20)
    sk = _mk(5_000)
    buf = serialize_kll(sk)
    assert buf[0] == 5 and buf[1] == 1
    assert struct.unpack_from("<Q", buf, 8)[0] == 5_000


def test_int_cap_matches_closed_form():
    """Integer fixed-point capacity == round(k*(2/3)^d) wherever the float
    is unambiguous (the fixed-point form is the tie-breaking truth)."""
    for k in (8, 128, 200, 1024):
        for d in range(0, 25):
            exact = k * (2.0 / 3.0) ** d
            got = _int_cap(k, d)
            assert abs(got - exact) <= 0.5 + 1e-9, (k, d, got, exact)
    assert _total_capacity(200, 8, 1) == 200
    assert _total_capacity(200, 8, 2) == 200 + 133


def test_hardening():
    buf = serialize_kll(_mk(5_000))
    with pytest.raises(KllSerdeError, match="truncated"):
        deserialize_kll(buf[:-4])
    bad = bytearray(buf)
    bad[2] = 9
    with pytest.raises(KllSerdeError, match="family"):
        deserialize_kll(bytes(bad))
    bad = bytearray(buf)
    bad[1] = 7
    with pytest.raises(KllSerdeError, match="version"):
        deserialize_kll(bytes(bad))
