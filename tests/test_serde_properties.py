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
from hypothesis import example, given, settings
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

# finite doubles that survive a float64 round-trip untouched. -0.0 and
# subnormals are deliberately ALLOWED: the kernels canonicalize -0.0 ->
# +0.0 at update (quantiles.py update_batch, mirroring the reference's
# theta_update_sketch_base.hpp:235-249), so byte idempotence must hold
# over them. Hypothesis twice found the failure mode this guards: a
# -0.0 among equal zeros (directly, or via a small normal float64 that
# underflows to -0.0 when the f4 item type narrows it) moves one sign
# byte across a decode/encode cycle while every query stays identical.
FINITE = st.floats(allow_nan=False, allow_infinity=False, width=64)
STREAMS = st.lists(FINITE, min_size=1, max_size=600)

# pinned hypothesis counterexample (round-3 red test): the -3.58e-121
# underflows to -0.0 under the test's f4 narrowing.
_NEGZERO_STREAM = [0.0, 0.0, 1.0, 1.0, 0.0, -3.5795266374136416e-121,
                   0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 1.0, 0.0]


def _quantile_state_equal(a, b) -> None:
    assert b.n == a.n
    for r in RANKS:
        assert b.get_quantile(r) == a.get_quantile(r), r


@settings(max_examples=60, deadline=None)
@given(STREAMS, st.sampled_from([8, 64, 200]), st.sampled_from(["<f8", "<f4"]))
@example(values=_NEGZERO_STREAM, k=64, item_dtype="<f4")
@example(values=[-0.0] + [0.0] * 10 + [-0.0, 5e-324, -5e-324], k=8,
         item_dtype="<f8")
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
@example(values=_NEGZERO_STREAM + [-0.0], k=64)
def test_classic_roundtrip_properties(values, k):
    sk = ClassicQuantilesSketch(k=k)
    sk.update_batch(np.asarray(values, np.float64))
    buf = serialize_classic(sk)
    back = deserialize_classic(buf)
    _quantile_state_equal(sk, back)
    assert serialize_classic(back) == buf


@settings(max_examples=40, deadline=None)
@given(STREAMS, st.sampled_from([12, 50]), st.booleans())
@example(values=_NEGZERO_STREAM + [-0.0], k=12, hra=True)
def test_req_roundtrip_properties(values, k, hra):
    sk = ReqSketch(k=k, hra=hra)
    sk.update_batch(np.asarray(values, np.float64))
    buf = serialize_req(sk)
    back = deserialize_req(buf)
    _quantile_state_equal(sk, back)
    assert serialize_req(back) == buf


@settings(max_examples=40, deadline=None)
@given(STREAMS, st.sampled_from([50, 100]))
@example(values=_NEGZERO_STREAM + [-0.0], delta=50)
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
    st.lists(
        st.tuples(
            st.integers(-(2**62), 2**62),
            st.floats(min_value=1e-6, max_value=1e9, allow_nan=False),
            st.booleans(),
        ),
        min_size=0, max_size=60,
        unique_by=lambda t: t[0],
    ),
    st.integers(8, 256),
    st.integers(0, 2**32 - 1),
)
def test_varopt_roundtrip_properties(rows, k, mark_seed):
    """var_opt family 13: H/R region split, shared R weight, gadget marks —
    all preserved exactly through a decode/encode cycle."""
    from datasketches_cpp_spark.functions.samplingserde import (
        deserialize_varopt,
        serialize_varopt,
    )

    items = [t[0] for t in rows]
    weights = [t[1] for t in rows]
    exact = [t[2] for t in rows]
    # stable-sort H first exactly like the writer, so marks line up
    order = sorted(range(len(rows)), key=lambda i: not exact[i])
    items = [items[i] for i in order]
    weights = [weights[i] for i in order]
    exact = [exact[i] for i in order]
    h = sum(exact)
    rng = np.random.default_rng(mark_seed)
    marks = rng.random(h) < 0.3 if h else np.zeros(0, bool)
    n = len(rows) * 3 + 1
    buf = serialize_varopt(items, weights, exact, n, k, marks=marks)
    back = deserialize_varopt(buf)
    if not rows:
        return
    assert back["n"] == n and back["k"] == k
    assert list(back["items"][:h]) == items[:h]
    assert np.allclose(back["weights"][:h], weights[:h])
    assert sorted(back["items"][h:]) == sorted(items[h:])
    # R-region rows surface the shared weight total_wt_r / r
    r = len(rows) - h
    if r:
        assert np.allclose(back["weights"][h:], sum(weights[h:]) / r)
    assert np.array_equal(back["marks"][:h], marks)
    # second cycle: re-encode the decoded state, decode again — stable
    buf2 = serialize_varopt(
        back["items"], back["weights"], back["exact"], back["n"], back["k"],
        marks=back["marks"][:h],
    )
    back2 = deserialize_varopt(buf2)
    assert list(back2["items"]) == list(back["items"])
    assert np.allclose(back2["weights"], back["weights"])
    assert np.array_equal(back2["exact"], back["exact"])


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 5), st.integers(4, 300), st.integers(0, 2**32 - 1))
def test_countmin_roundtrip_properties(d, w, rng_seed):
    from datasketches_cpp_spark.functions.samplingserde import (
        deserialize_countmin,
        serialize_countmin,
    )

    rng = np.random.default_rng(rng_seed)
    mat = rng.integers(0, 1000, size=(d, w)).astype(np.uint64)
    total = int(mat[0].sum())
    buf = serialize_countmin(mat, total, d, w)
    back = deserialize_countmin(buf)
    assert back["num_hashes"] == d and back["num_buckets"] == w
    assert back["total_weight"] == total
    assert np.array_equal(np.asarray(back["matrix"]).reshape(d, w), mat)
    assert serialize_countmin(back["matrix"], total, d, w) == buf


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 16), st.integers(1, 64), st.integers(0, 2**32 - 1))
def test_bloom_bytes_roundtrip_properties(num_hashes, cap_longs, rng_seed):
    from datasketches_cpp_spark.functions.samplingserde import (
        deserialize_bloom,
        serialize_bloom,
    )

    rng = np.random.default_rng(rng_seed)
    bits = rng.integers(0, 256, size=cap_longs * 8).astype(np.uint8)
    buf = serialize_bloom(bits, num_hashes, seed=12345)
    back = deserialize_bloom(buf)
    assert back["num_hashes"] == num_hashes
    assert np.array_equal(back["bits"], bits)
    assert serialize_bloom(back["bits"], back["num_hashes"], seed=12345) == buf


@settings(max_examples=25, deadline=None)
@given(
    st.integers(4, 11),
    st.floats(min_value=0.0, max_value=0.6),
    st.integers(0, 2**32 - 1),
)
def test_cpc_matrix_roundtrip_properties(lg_k, density, rng_seed):
    """CPC family 16 full compressed wire format: random coupon matrices
    across densities sweep all flavors (EMPTY/SPARSE/HYBRID/PINNED/
    SLIDING) through the Huffman/unary entropy coders; matrix-exact
    round-trip + byte idempotence."""
    from datasketches_cpp_spark.functions.cpcserde import (
        deserialize_cpc,
        serialize_cpc,
    )

    rng = np.random.default_rng(rng_seed)
    k = 1 << lg_k
    # geometric column profile ~ a real coupon matrix; density scales how
    # far along the stream the sketch is
    cols = np.minimum(rng.geometric(0.5, size=(k, 8)) - 1, 60)
    keep = rng.random((k, 8)) < density
    mat = np.zeros(k, np.uint64)
    for j in range(8):
        sel = keep[:, j]
        mat[sel] |= np.uint64(1) << cols[sel, j].astype(np.uint64)
    buf = serialize_cpc(mat, lg_k)
    st_ = deserialize_cpc(buf)
    assert st_["lg_k"] == lg_k
    assert np.array_equal(st_["matrix"], mat)
    assert serialize_cpc(st_["matrix"], st_["lg_k"]) == buf


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
