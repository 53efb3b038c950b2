"""Frequent-items wire serde: round-trip + layout + hardening
(reference frequent_items_sketch_impl.hpp:165-208)."""

import struct

import numpy as np
import pandas as pd
import pytest

from datasketches_cpp_spark.functions.fiserde import (
    FiSerdeError,
    deserialize_frequent_items,
    serialize_frequent_items,
)
from datasketches_cpp_spark.functions.freq import MGState


def _mk(items, m=64):
    st = MGState(m)
    st.update_batch(pd.Series(items))
    return st


def test_roundtrip_strings():
    st = _mk(["click"] * 500 + ["view"] * 200 + ["buy"] * 7)
    buf = serialize_frequent_items(st)
    st2 = deserialize_frequent_items(buf, "str")
    assert st2.counts == st.counts
    assert st2.total == st.total and st2.offset == st.offset
    assert serialize_frequent_items(st2) == buf


def test_roundtrip_ints_and_purged_offset():
    rng = np.random.default_rng(7)
    zipf = np.minimum(rng.zipf(1.3, 5000), 1000)
    st = _mk(list(zipf), m=16)  # small map forces purges -> offset > 0
    assert st.offset > 0
    buf = serialize_frequent_items(st)
    st2 = deserialize_frequent_items(buf, "int64")
    assert st2.counts == st.counts and st2.offset == st.offset


def test_layout_and_empty():
    st = _mk(["a", "b", "a"], m=64)
    buf = serialize_frequent_items(st)
    assert buf[0] == 4 and buf[1] == 1 and buf[2] == 10 and buf[3] == 6
    n, _, total, offset = struct.unpack_from("<IIQQ", buf, 8)
    assert n == 2 and total == 3 and offset == 0
    empty = serialize_frequent_items(MGState(64))
    assert len(empty) == 8 and empty[0] == 1 and (empty[5] & 0b101) == 0b101
    assert deserialize_frequent_items(empty).counts == {}


def test_hardening():
    st = _mk(["x", "y"] * 10)
    buf = serialize_frequent_items(st)
    with pytest.raises(FiSerdeError, match="truncated"):
        deserialize_frequent_items(buf[:-3], "str")
    bad = bytearray(buf)
    bad[2] = 7
    with pytest.raises(FiSerdeError, match="family"):
        deserialize_frequent_items(bytes(bad), "str")
    with pytest.raises(FiSerdeError, match="item_type"):
        deserialize_frequent_items(buf, "float")
