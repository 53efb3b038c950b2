"""HLL_8 wire serde: round-trip + layout constants + hardening + Spark
export path (reference HllUtil.hpp:40-74, HllArray-internal.hpp:219-243)."""

import struct

import numpy as np
import pytest

from datasketches_cpp_spark.functions.hllserde import (
    HllSerdeError,
    deserialize_hll8,
    serialize_hll8,
    with_hll_bytes,
)


def _regs(lg_k, seed=1, frac=0.7):
    rng = np.random.default_rng(seed)
    k = 1 << lg_k
    regs = np.zeros(k, np.uint8)
    hot = rng.choice(k, size=int(k * frac), replace=False)
    regs[hot] = rng.integers(1, 40, size=len(hot))
    return regs


@pytest.mark.parametrize("lg_k", [4, 11, 14])
def test_roundtrip(lg_k):
    regs = _regs(lg_k)
    buf = serialize_hll8(regs, lg_k)
    lg2, r2 = deserialize_hll8(buf)
    assert lg2 == lg_k
    np.testing.assert_array_equal(r2, regs)
    assert serialize_hll8(r2, lg2) == buf


def test_layout_constants():
    lg_k = 10
    regs = _regs(lg_k)
    buf = serialize_hll8(regs, lg_k)
    assert len(buf) == 40 + (1 << lg_k)
    assert buf[0] == 10 and buf[1] == 1 and buf[2] == 7 and buf[3] == lg_k
    assert buf[7] == 0x0A  # HLL mode, HLL_8 target
    flags = buf[5]
    assert flags & 8 and flags & 16  # COMPACT | OUT_OF_ORDER
    assert buf[6] == int(regs.min())
    hip, kxq0, kxq1 = struct.unpack_from("<ddd", buf, 8)
    assert hip == 0.0
    # kxq0 == sum of 2^-reg over regs < 32 (exactly, all regs here < 40)
    expect0 = float(np.exp2(-regs[regs < 32].astype(np.float64)).sum())
    assert kxq0 == pytest.approx(expect0, rel=1e-12)
    n_min, aux = struct.unpack_from("<II", buf, 32)
    assert n_min == int(np.count_nonzero(regs == regs.min())) and aux == 0


def test_hardening():
    regs = _regs(8)
    buf = serialize_hll8(regs, 8)
    with pytest.raises(HllSerdeError, match="truncated"):
        deserialize_hll8(buf[:-10])
    bad = bytearray(buf)
    bad[2] = 3
    with pytest.raises(HllSerdeError, match="family"):
        deserialize_hll8(bytes(bad))
    bad = bytearray(buf)
    bad[7] = 0x00  # LIST mode
    with pytest.raises(HllSerdeError, match="HLL mode"):
        deserialize_hll8(bytes(bad))
    bad = bytearray(buf)
    bad[6] = 63  # cur_min inconsistent with registers
    with pytest.raises(HllSerdeError, match="cur_min"):
        deserialize_hll8(bytes(bad))
    with pytest.raises(HllSerdeError, match="register count"):
        serialize_hll8(regs, 9)


def test_spark_export_roundtrip(spark, sf_dir):
    """hll_sketch_agg(keep_registers=True) -> wire blobs -> parse -> the
    register state and estimate survive the trip exactly."""
    from datasketches_cpp_spark.functions.hll import (
        _composite_estimate,
        hll_sketch_agg,
    )

    lg_k = 10
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    sk = hll_sketch_agg(li, ["l_returnflag"], "l_partkey", lg_k=lg_k, keep_registers=True)
    blobs = with_hll_bytes(sk, lg_k).select("l_returnflag", "estimate", "sketch_bytes").collect()
    assert len(blobs) > 0
    for r in blobs:
        lg2, regs = deserialize_hll8(bytes(r["sketch_bytes"]))
        assert lg2 == lg_k
        assert _composite_estimate(regs) == r["estimate"]
