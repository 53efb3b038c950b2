"""Importing the reference's sparse (coupon LIST/SET) and narrow-width
(HLL_4/HLL_6) HLL streams into the engine's HLL-8 register gadget.

The container has no datasketches binding, so foreign bytes are generated
here from the documented layouts (HllUtil.hpp:58-74 offsets,
CouponList/CouponHashSet/Hll4Array/Hll6Array internal packing) — the same
evidence style the reference uses for its own cross-format tests. Each
test checks the import lands in a register state IDENTICAL to what direct
HLL-8 semantics would produce, so merges via hll_merge_sketches are
lossless by construction.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from datasketches_cpp_spark.functions.hllserde import (
    HllSerdeError,
    deserialize_hll,
    deserialize_hll8,
    serialize_hll8,
)

LG_K = 11
K = 1 << LG_K


def _coupon(slot: int, value: int) -> int:
    assert 0 <= slot < (1 << 26) and 1 <= value < 64
    return (value << 26) | slot


def _list_bytes(coupons: list[int], lg_k: int = LG_K, compact: bool = True,
                lg_arr: int = 3) -> bytes:
    flags = 8 if compact else 0  # COMPACT
    if not coupons:
        flags |= 4  # EMPTY
    head = struct.pack("<BBBBBBBB", 2, 1, 7, lg_k, lg_arr, flags,
                       len(coupons), 0)  # mode byte 0: LIST, tgt HLL_4 (ignored)
    if compact:
        arr = np.array(coupons, "<u4")
    else:
        arr = np.zeros(1 << lg_arr, "<u4")
        arr[: len(coupons)] = coupons
        rng = np.random.default_rng(5)
        rng.shuffle(arr)
    return head + arr.tobytes()


def _set_bytes(coupons: list[int], lg_k: int = LG_K, compact: bool = True,
               lg_arr: int = 5) -> bytes:
    flags = 8 if compact else 0
    head = struct.pack("<BBBBBBBB", 3, 1, 7, lg_k, lg_arr, flags, 0, 1)
    head += struct.pack("<I", len(coupons))
    if compact:
        arr = np.array(coupons, "<u4")
    else:
        arr = np.zeros(1 << lg_arr, "<u4")
        arr[: len(coupons)] = coupons
        rng = np.random.default_rng(6)
        rng.shuffle(arr)
    return head + arr.tobytes()


def _hll_mode_head(lg_k: int, tgt: int, cur_min: int, aux_count: int,
                   lg_aux_arr: int = 0, compact: bool = True) -> bytes:
    flags = (8 if compact else 0) | 16  # COMPACT | OUT_OF_ORDER
    head = struct.pack("<BBBBBBBB", 10, 1, 7, lg_k, lg_aux_arr, flags,
                       cur_min, 2 | (tgt << 2))
    head += struct.pack("<ddd", 0.0, 0.0, 0.0)  # hip/kxq ignored on import
    head += struct.pack("<II", 0, aux_count)
    return head


def _hll4_bytes(regs: np.ndarray, lg_k: int = LG_K) -> bytes:
    """Pack registers the way Hll4Array does: nibble = value - cur_min,
    15 escapes to the aux map (compact form: aux_count coupon ints)."""
    cur_min = int(regs.min())
    rel = regs.astype(np.int64) - cur_min
    aux = [(int(s), int(regs[s])) for s in np.nonzero(rel >= 15)[0]]
    nib = np.minimum(rel, 15).astype(np.uint8)
    packed = (nib[0::2] | (nib[1::2] << 4)).astype(np.uint8)
    head = _hll_mode_head(lg_k, tgt=0, cur_min=cur_min, aux_count=len(aux))
    aux_arr = np.array([_coupon(s, v) for s, v in aux], "<u4")
    return head + packed.tobytes() + aux_arr.tobytes()


def _hll6_bytes(regs: np.ndarray, lg_k: int = LG_K) -> bytes:
    k = len(regs)
    bits = np.zeros(k * 6, np.uint8)
    for i in range(6):
        bits[i::6] = (regs >> i) & 1
    arr = np.packbits(bits, bitorder="little")
    out = np.zeros(((k * 3) >> 2) + 1, np.uint8)
    out[: len(arr)] = arr
    return _hll_mode_head(lg_k, tgt=1, cur_min=0, aux_count=0) + out.tobytes()


def _expected_regs(coupons: list[int]) -> np.ndarray:
    regs = np.zeros(K, np.uint8)
    for c in coupons:
        slot, val = c & (K - 1), c >> 26
        regs[slot] = max(regs[slot], val)
    return regs


COUPONS = [_coupon(17, 3), _coupon(900, 1), _coupon(900, 5), _coupon(2047, 62)]


def test_list_compact_import():
    lg_k, regs = deserialize_hll(_list_bytes(COUPONS[:3]))
    assert lg_k == LG_K
    np.testing.assert_array_equal(regs, _expected_regs(COUPONS[:3]))


def test_list_updatable_import_skips_empty_slots():
    lg_k, regs = deserialize_hll(_list_bytes(COUPONS[:3], compact=False))
    np.testing.assert_array_equal(regs, _expected_regs(COUPONS[:3]))


def test_list_empty():
    lg_k, regs = deserialize_hll(_list_bytes([]))
    assert regs.sum() == 0


def test_set_compact_and_updatable_import():
    for compact in (True, False):
        lg_k, regs = deserialize_hll(_set_bytes(COUPONS, compact=compact))
        assert lg_k == LG_K
        np.testing.assert_array_equal(regs, _expected_regs(COUPONS))


def test_hll4_import_with_aux_exceptions():
    rng = np.random.default_rng(42)
    regs = rng.integers(2, 12, K).astype(np.uint8)
    regs[5] = 40   # cur_min=2, rel 38 ≥ 15 → aux exception
    regs[99] = 25  # second exception
    got_lg_k, got = deserialize_hll(_hll4_bytes(regs))
    assert got_lg_k == LG_K
    np.testing.assert_array_equal(got, regs)


def test_hll4_missing_aux_rejected():
    regs = np.full(K, 2, np.uint8)
    regs[5] = 40
    buf = bytearray(_hll4_bytes(regs))
    # corrupt: claim aux_count 0 while an AUX_TOKEN nibble exists
    struct.pack_into("<I", buf, 36, 0)
    with pytest.raises(HllSerdeError):
        deserialize_hll(bytes(buf[: 40 + (K >> 1)]))


def test_hll6_import():
    rng = np.random.default_rng(43)
    regs = rng.integers(0, 63, K).astype(np.uint8)
    got_lg_k, got = deserialize_hll(_hll6_bytes(regs))
    assert got_lg_k == LG_K
    np.testing.assert_array_equal(got, regs)


def test_hll8_dispatch_through_universal_reader():
    rng = np.random.default_rng(44)
    regs = rng.integers(0, 30, K).astype(np.uint8)
    buf = serialize_hll8(regs, LG_K)
    for reader in (deserialize_hll, deserialize_hll8):
        got_lg_k, got = reader(buf)
        assert got_lg_k == LG_K
        np.testing.assert_array_equal(got, regs)


def test_sparse_import_merges_losslessly_into_native_union():
    """HllUnion semantics: union(import(list_bytes), native) ==
    register-wise max — the property the Spark-side merge relies on."""
    _, sparse = deserialize_hll(_set_bytes(COUPONS))
    rng = np.random.default_rng(45)
    native = rng.integers(0, 20, K).astype(np.uint8)
    merged = np.maximum(sparse, native)
    # every coupon with value above the native register must surface
    for c in COUPONS:
        slot, val = c & (K - 1), c >> 26
        assert merged[slot] >= val
    # and nothing else moved
    touched = {c & (K - 1) for c in COUPONS}
    untouched = np.array([i for i in range(K) if i not in touched])
    np.testing.assert_array_equal(merged[untouched], native[untouched])


def test_truncation_and_bad_mode_rejected():
    good = _set_bytes(COUPONS)
    with pytest.raises(HllSerdeError):
        deserialize_hll(good[:10])
    bad = bytearray(_list_bytes(COUPONS[:3]))
    bad[7] = 3  # corrupt cur_mode
    with pytest.raises(HllSerdeError):
        deserialize_hll(bytes(bad))
    with pytest.raises(HllSerdeError):
        deserialize_hll(_list_bytes(COUPONS[:3], lg_k=25))  # lg_k out of range


def test_hll4_write_read_roundtrip():
    """Engine-written HLL_4 (with aux exceptions) round-trips exactly and
    is half the register bytes of HLL_8."""
    from datasketches_cpp_spark.functions.hllserde import serialize_hll4

    rng = np.random.default_rng(46)
    regs = rng.integers(3, 14, K).astype(np.uint8)
    regs[[7, 1000, 2000]] = [45, 30, 50]  # exceptions
    buf = serialize_hll4(regs, LG_K)
    lg_k, got = deserialize_hll(buf)
    assert lg_k == LG_K
    np.testing.assert_array_equal(got, regs)
    buf8 = serialize_hll8(regs, LG_K)
    assert len(buf) < len(buf8) - K // 2 + 64  # ~half register payload


def test_hll6_write_read_roundtrip():
    from datasketches_cpp_spark.functions.hllserde import serialize_hll6

    rng = np.random.default_rng(47)
    regs = rng.integers(0, 63, K).astype(np.uint8)
    buf = serialize_hll6(regs, LG_K)
    lg_k, got = deserialize_hll(buf)
    assert lg_k == LG_K
    np.testing.assert_array_equal(got, regs)


def test_all_widths_estimate_identically():
    """HLL_4 / HLL_6 / HLL_8 encodings of the same registers must produce
    the identical composite estimate after import — width is storage, not
    semantics (the reference's tgtHllType contract)."""
    from datasketches_cpp_spark.functions.hll import _composite_estimate
    from datasketches_cpp_spark.functions.hllserde import (
        serialize_hll4,
        serialize_hll6,
    )

    rng = np.random.default_rng(48)
    regs = rng.integers(1, 16, K).astype(np.uint8)
    ests = {
        _composite_estimate(deserialize_hll(blob)[1])
        for blob in (serialize_hll4(regs, LG_K), serialize_hll6(regs, LG_K),
                     serialize_hll8(regs, LG_K))
    }
    assert len(ests) == 1
