"""Property-based (hypothesis) serde round-trip laws — the engine analog
of the reference's randomized serialize/deserialize tests (e.g.
kll_sketch_test.cpp serialize-deserialize sections, quantiles_sketch_test
random streams, frequent_items_sketch_serde tests).

Two laws per family, over arbitrary update streams:

  1. state isomorphism — deserialize(serialize(sk)) answers every query
     (n, min/max, quantiles/ranks/estimates) exactly like sk;
  2. byte idempotence — serialize(deserialize(bytes)) == bytes, i.e. the
     wire form is a fixpoint (nothing is lost or reordered by a decode/
     encode cycle).

Pure numpy (no SparkSession) so hypothesis can run hundreds of examples
cheaply.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from datasketches_cpp_spark.functions.classic_quantiles import ClassicQuantilesSketch
from datasketches_cpp_spark.functions.classicserde import (
    deserialize_classic,
    serialize_classic,
)
from datasketches_cpp_spark.functions.freq import MGState
from datasketches_cpp_spark.functions.fiserde import (
    deserialize_frequent_items,
    serialize_frequent_items,
)
from datasketches_cpp_spark.functions.hllserde import (
    deserialize_hll,
    serialize_hll4,
    serialize_hll6,
    serialize_hll8,
)
from datasketches_cpp_spark.functions.kllserde import deserialize_kll, serialize_kll
from datasketches_cpp_spark.functions.quantiles import KllSketch
from datasketches_cpp_spark.functions.req import ReqSketch
from datasketches_cpp_spark.functions.reqserde import deserialize_req, serialize_req
from datasketches_cpp_spark.functions.tdigest import TDigest
from datasketches_cpp_spark.functions.tdigestserde import (
    deserialize_tdigest,
    serialize_tdigest,
)

RANKS = (0.0, 0.25, 0.5, 0.9, 0.99, 1.0)

# finite doubles that survive a float64 round-trip untouched. -0.0 is
# normalized to +0.0: the two compare equal, so their relative order among
# tied items is not pinned by any sort, and byte idempotence would
# otherwise hinge on sort stability over a semantically invisible sign
# bit (hypothesis found exactly that: ten 0.0s and one -0.0 flip one sign
# byte across a decode/encode cycle while every query stays identical).
FINITE = st.floats(
    allow_nan=False, allow_infinity=False, allow_subnormal=False, width=64
).map(lambda v: v + 0.0)
STREAMS = st.lists(FINITE, min_size=1, max_size=600)


def _quantile_state_equal(a, b) -> None:
    assert b.n == a.n
    for r in RANKS:
        assert b.get_quantile(r) == a.get_quantile(r), r


@settings(max_examples=60, deadline=None)
@given(STREAMS, st.sampled_from([8, 64, 200]), st.sampled_from(["<f8", "<f4"]))
def test_kll_roundtrip_properties(values, k, item_dtype):
    vals = np.asarray(values, np.float64)
    if item_dtype == "<f4":
        # keep values exactly representable as float32 (clip, then narrow)
        vals = np.clip(vals, -3e38, 3e38).astype(np.float32).astype(np.float64)
    sk = KllSketch(k=k)
    sk.update_batch(vals)
    buf = serialize_kll(sk, item_dtype=item_dtype)
    back = deserialize_kll(buf, item_dtype=item_dtype)
    _quantile_state_equal(sk, back)
    assert serialize_kll(back, item_dtype=item_dtype) == buf


@settings(max_examples=40, deadline=None)
@given(STREAMS, st.sampled_from([64, 128]))
def test_classic_roundtrip_properties(values, k):
    sk = ClassicQuantilesSketch(k=k)
    sk.update_batch(np.asarray(values, np.float64))
    buf = serialize_classic(sk)
    back = deserialize_classic(buf)
    _quantile_state_equal(sk, back)
    assert serialize_classic(back) == buf


@settings(max_examples=40, deadline=None)
@given(STREAMS, st.sampled_from([12, 50]), st.booleans())
def test_req_roundtrip_properties(values, k, hra):
    sk = ReqSketch(k=k, hra=hra)
    sk.update_batch(np.asarray(values, np.float64))
    buf = serialize_req(sk)
    back = deserialize_req(buf)
    _quantile_state_equal(sk, back)
    assert serialize_req(back) == buf


@settings(max_examples=40, deadline=None)
@given(STREAMS, st.sampled_from([50, 100]))
def test_tdigest_roundtrip_properties(values, delta):
    td = TDigest(delta=delta)
    td.update_batch(np.asarray(values, np.float64))
    buf = serialize_tdigest(td)
    back = deserialize_tdigest(buf)
    assert back.n == td.n
    for r in RANKS:
        assert back.get_quantile(r) == td.get_quantile(r)
    assert serialize_tdigest(back) == buf


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.text(alphabet="abcdefgh", min_size=1, max_size=6), min_size=1,
             max_size=400),
    st.sampled_from([64, 256]),
)
def test_frequent_items_roundtrip_properties(items, m):
    state = MGState(m)
    state.update_batch(pd.Series(items))
    buf = serialize_frequent_items(state)
    back = deserialize_frequent_items(buf, item_type="str")
    ia, wa = state.rows()
    ib, wb = back.rows()
    assert sorted(zip(ia, wa)) == sorted(zip(ib, wb))
    assert back.offset == state.offset and back.total == state.total
    assert serialize_frequent_items(back) == buf


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.text(min_size=0, max_size=12), min_size=1, max_size=400),
    st.sampled_from([8, 128]),
)
def test_kll_strings_roundtrip_properties(items, k):
    """Generic-item (string, UTF-8 length-prefixed serde) KLL — arbitrary
    unicode including empty strings and surrogate-adjacent code points."""
    from datasketches_cpp_spark.functions.kll_items import (
        KllItemSketch,
        deserialize_kll_strings,
        serialize_kll_strings,
    )

    sk = KllItemSketch(k=k)
    sk.update_batch(items)
    buf = serialize_kll_strings(sk)
    back = deserialize_kll_strings(buf)
    assert back.n == sk.n
    for r in RANKS:
        assert back.get_quantile(r) == sk.get_quantile(r)
    assert serialize_kll_strings(back) == buf


@settings(max_examples=40, deadline=None)
@given(
    st.integers(4, 10),
    st.integers(0, 2**32 - 1),
    st.sampled_from([4, 6, 8]),
)
def test_hll_register_roundtrip_properties(lg_k, rng_seed, width):
    """Register-exact round-trips for all three bucket widths, including
    the HLL_4 aux-map overflow path (values beyond cur_min+14)."""
    rng = np.random.default_rng(rng_seed)
    k = 1 << lg_k
    # geometric-ish register values with occasional large outliers to
    # force HLL_4 aux exceptions
    regs = rng.geometric(0.5, size=k).astype(np.uint8)
    regs[rng.random(k) < 0.02] += 20
    regs = np.minimum(regs, 62)
    ser = {4: serialize_hll4, 6: serialize_hll6, 8: serialize_hll8}[width]
    buf = ser(regs, lg_k)
    got_lg_k, got = deserialize_hll(buf)
    assert got_lg_k == lg_k
    assert np.array_equal(got, regs)
    assert ser(got, lg_k) == buf
