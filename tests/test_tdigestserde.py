"""t-digest wire serde: round-trip + layout + hardening (reference
tdigest_impl.hpp serialize, constants tdigest.hpp:289-295)."""

import struct

import numpy as np
import pytest

from datasketches_cpp_spark.functions.tdigest import TDigest
from datasketches_cpp_spark.functions.tdigestserde import (
    TDigestSerdeError,
    deserialize_tdigest,
    serialize_tdigest,
)


def _mk(n, delta=100, seed=9):
    td = TDigest(delta)
    if n:
        rng = np.random.default_rng(seed)
        for chunk in np.array_split(rng.random(n) * 1000, max(1, n // 1000)):
            td.update_batch(chunk)
    return td


@pytest.mark.parametrize("n", [0, 1, 30, 50_000])
def test_roundtrip(n):
    td = _mk(n)
    buf = serialize_tdigest(td)
    td2 = deserialize_tdigest(buf)
    assert td2.n == td.n and td2.delta == td.delta
    if n:
        assert td2.min == td.min and td2.max == td.max
    if n > 1:
        np.testing.assert_array_equal(td2.means, td.means)
        np.testing.assert_array_equal(td2.weights, td.weights)
        for q in (0.01, 0.5, 0.99, 0.999):
            assert td2.get_quantile(q) == td.get_quantile(q)
    assert serialize_tdigest(td2) == buf


def test_layout():
    td = _mk(50_000)
    buf = serialize_tdigest(td)
    assert buf[0] == 2 and buf[1] == 1 and buf[2] == 20
    (k,) = struct.unpack_from("<H", buf, 3)
    assert k == 100
    n_cent, bc, mn, mx = struct.unpack_from("<IIdd", buf, 8)
    assert n_cent == len(td.means) and bc == 0
    assert mn == td.min and mx == td.max
    assert len(buf) == 32 + 16 * n_cent
    # empty and single-value short forms
    assert len(serialize_tdigest(_mk(0))) == 8
    one = serialize_tdigest(_mk(1))
    assert len(one) == 16 and (one[5] & 2)


def test_hardening():
    buf = serialize_tdigest(_mk(50_000))
    with pytest.raises(TDigestSerdeError, match="truncated"):
        deserialize_tdigest(buf[:-8])
    bad = bytearray(buf)
    bad[2] = 15
    with pytest.raises(TDigestSerdeError, match="sketch type"):
        deserialize_tdigest(bytes(bad))
