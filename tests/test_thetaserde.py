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


# ---------------------------------------------------------------------------
# v4 (compressed, delta-bit-packed)
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

from datasketches_cpp_spark.functions.thetaserde import (  # noqa: E402
    deserialize_compact,
    deserialize_compact_v4,
    serialize_compact_v4,
    serialize_compressed,
)


def _pack_bits_reference(values, bits):
    """Direct transliteration of the reference's scalar pack_bits loop
    (theta/include/bit_packing.hpp:27-47) — the independent cross-check
    that the vectorized np.packbits path produces the identical stream."""
    out = bytearray((len(values) * bits + 7) // 8)
    pos = 0  # ptr index
    offset = 0
    for value in values:
        b = bits
        if offset > 0:
            chunk_bits = 8 - offset
            mask = (1 << chunk_bits) - 1
            if b < chunk_bits:
                out[pos] |= (value << (chunk_bits - b)) & mask
                offset += b
                continue
            out[pos] |= (value >> (b - chunk_bits)) & mask
            pos += 1
            b -= chunk_bits
        while b >= 8:
            out[pos] = (value >> (b - 8)) & 0xFF
            pos += 1
            b -= 8
        if b > 0:
            out[pos] = (value << (8 - b)) & 0xFF
            offset = b
        else:
            offset = 0
    return bytes(out)


@given(
    n=st.integers(min_value=1, max_value=300),
    theta=st.sampled_from([-1, MAX_THETA // 3, MAX_THETA // 2]),
    width=st.integers(min_value=1, max_value=50),
)
@settings(max_examples=40, deadline=None)
def test_v4_roundtrip(n, theta, width):
    rng = np.random.default_rng(n * 7 + width)
    deltas = rng.integers(1, 1 << width, size=n, dtype=np.uint64)
    entries = np.cumsum(deltas).astype(np.uint64)
    if theta > 0:
        entries = entries[entries < theta]
        if len(entries) == 0:
            return
    if theta <= 0 and len(entries) == 1:
        return  # single-entry exact: not v4-suitable (reference gate)
    buf = serialize_compact_v4(theta, entries.view(np.int64))
    t2, e2 = deserialize_compact_v4(buf)
    assert t2 == (theta if theta > 0 else -1)
    np.testing.assert_array_equal(e2.view(np.uint64), entries)
    # version-dispatch parse agrees
    t3, e3 = deserialize_compact(buf)
    assert t3 == t2
    np.testing.assert_array_equal(e3, e2)


def test_v4_bitstream_matches_reference_packer():
    rng = np.random.default_rng(99)
    for bits in (1, 3, 8, 13, 31, 64):
        vals = rng.integers(0, 1 << min(bits, 62), size=23, dtype=np.uint64)
        vals &= (np.uint64(1) << np.uint64(bits)) - np.uint64(1) if bits < 64 else np.uint64(2**64 - 1)
        from datasketches_cpp_spark.functions.thetaserde import _pack_deltas_msb
        assert _pack_deltas_msb(vals, bits) == _pack_bits_reference(vals.tolist(), bits), bits


def test_v4_smaller_than_v3_and_compressed_dispatch():
    """Clustered entries (small deltas) must compress well below 8n bytes,
    and serialize_compressed must fall back to v3 exactly where the
    reference's is_suitable_for_compression gate says so."""
    entries = np.arange(1, 5001, dtype=np.int64) * 100
    v3 = serialize_compact_v3(-1, entries)
    v4 = serialize_compact_v4(-1, entries)
    assert len(v4) < len(v3) / 3
    # empty and single-entry-exact fall back to v3
    assert serialize_compressed(-1, np.empty(0, np.int64))[1] == 3
    assert serialize_compressed(-1, np.array([42], np.int64))[1] == 3
    # single entry in estimation mode IS v4-suitable (reference gate)
    assert serialize_compressed(MAX_THETA // 2, np.array([42], np.int64))[1] == 4


def test_v4_hardening():
    entries = np.arange(1, 100, dtype=np.int64)
    buf = serialize_compact_v4(MAX_THETA // 2, entries)
    with pytest.raises(ThetaSerdeError, match="truncated"):
        deserialize_compact_v4(buf[:-2])
    with pytest.raises(ThetaSerdeError, match="seed hash"):
        deserialize_compact_v4(buf, seed=1234)
    bad = bytearray(buf)
    bad[1] = 9
    with pytest.raises(ThetaSerdeError, match="version"):
        deserialize_compact(bytes(bad))


def test_spark_export_import_roundtrip(spark):
    """theta_sketch_agg -> with_theta_bytes (reference blobs) -> parquet ->
    theta_from_bytes -> identical estimates: the cross-engine interop
    path, end to end through Spark."""
    import pandas as pd
    from datasketches_cpp_spark.functions.theta import theta_sketch_agg, with_estimate
    from datasketches_cpp_spark.functions.thetaserde import (
        theta_from_bytes,
        with_theta_bytes,
    )

    df = spark.createDataFrame(
        pd.DataFrame({"g": ["a"] * 5000 + ["b"] * 3000, "v": list(range(5000)) + list(range(3000))})
    ).repartition(6)
    sk = theta_sketch_agg(df, ["g"], "v", lg_k=10)
    blobs = with_theta_bytes(sk).select("g", "sketch_bytes")
    back = theta_from_bytes(blobs)
    est0 = {r["g"]: r["estimate"] for r in with_estimate(sk).collect()}
    est1 = {r["g"]: r["estimate"] for r in with_estimate(back).collect()}
    assert est0 == est1
    # every blob parses standalone and v4-compresses below raw size
    for r in blobs.collect():
        assert bytes(r["sketch_bytes"])[1] in (3, 4)
