"""REQ wire serde: round-trip + layout + hardening (reference
req_sketch_impl.hpp serialize / req_compactor_impl.hpp)."""

import struct

import numpy as np
import pytest

from datasketches_cpp_spark.functions.req import ReqSketch
from datasketches_cpp_spark.functions.reqserde import (
    ReqSerdeError,
    deserialize_req,
    serialize_req,
)


def _mk(n, k=12, hra=True, seed=5):
    sk = ReqSketch(k, hra=hra)
    if n:
        rng = np.random.default_rng(seed)
        for chunk in np.array_split(rng.random(n) * 1000, max(1, n // 500)):
            sk.update_batch(chunk)
    return sk


@pytest.mark.parametrize("n,hra", [(0, True), (3, True), (50, False), (20_000, True), (20_000, False)])
def test_roundtrip(n, hra):
    sk = _mk(n, hra=hra)
    buf = serialize_req(sk)
    sk2 = deserialize_req(buf)
    assert sk2.n == sk.n and sk2.k == sk.k and sk2.hra == sk.hra
    if n > 4:
        assert sk2.min == sk.min and sk2.max == sk.max
        for q in (0.1, 0.5, 0.99):
            assert sk2.get_quantile(q) == sk.get_quantile(q)
        assert len(sk2.compactors) == len(sk.compactors)
        for a, b in zip(sk.compactors, sk2.compactors):
            assert a.state == b.state and a.num_sections == b.num_sections
            np.testing.assert_array_equal(np.sort(a.buf), b.buf)
    # stable re-serialization
    assert serialize_req(sk2) == buf


def test_layout():
    sk = _mk(20_000)
    buf = serialize_req(sk)
    assert buf[0] == 4 and buf[1] == 1 and buf[2] == 17
    assert buf[3] & (1 << 3)  # high-rank flag (req_sketch.hpp:446 enum)
    (k,) = struct.unpack_from("<H", buf, 4)
    assert k == 12
    n, mn, mx = struct.unpack_from("<Qdd", buf, 8)
    assert n == 20_000 and mn == sk.min and mx == sk.max
    empty = serialize_req(_mk(0))
    assert len(empty) == 8 and empty[3] & (1 << 2)


def test_hardening():
    buf = serialize_req(_mk(20_000))
    with pytest.raises(ReqSerdeError, match="truncated"):
        deserialize_req(buf[:-8])
    bad = bytearray(buf)
    bad[2] = 15
    with pytest.raises(ReqSerdeError, match="family"):
        deserialize_req(bytes(bad))
