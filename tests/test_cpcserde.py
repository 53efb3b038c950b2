"""CPC wire serde (family 16): round-trip isomorphism across all flavors,
golden parity against reference-generated fixtures (byte-identical
re-serialization + exact HIP parity), corruption hardening, Spark-level
export/import.  Write-path validation through the actual reference binary
lives in tests/test_reference_interop_write.py."""

from __future__ import annotations

import json
import os
import struct

import numpy as np
import pytest

from datasketches_cpp_spark.functions.cpc import _fold_matrix, invert_coupons
from datasketches_cpp_spark.functions.cpcserde import (
    CpcSerdeError,
    _flavor,
    deserialize_cpc,
    serialize_cpc,
)

FIXDIR = os.path.join(os.path.dirname(__file__), "golden", "refgen")


def _matrix(n: int, lg_k: int = 10, seed: int = 5) -> np.ndarray:
    """A genuine coupon matrix built by the engine's own update path."""
    rng = np.random.default_rng(seed)
    mat = np.zeros(1 << lg_k, np.uint64)
    if n:
        hashes = rng.integers(0, 1 << 63, n, dtype=np.uint64)
        _fold_matrix(mat, hashes, lg_k)
    return mat


FLAVOR_NS = {  # lg_k=10 (K=1024): flavor thresholds 96 / 512 / 3456 coupons
    "empty": 0,
    "sparse": 50,
    "hybrid": 300,
    "pinned": 2000,
    "sliding": 100_000,
}


@pytest.mark.parametrize("flav,n", FLAVOR_NS.items())
def test_roundtrip_all_flavors(flav, n):
    mat = _matrix(n)
    c = int(np.unpackbits(mat.view(np.uint8)).sum())
    assert _flavor(10, c) == flav
    buf = serialize_cpc(mat, 10)
    st = deserialize_cpc(buf)
    assert st["lg_k"] == 10
    assert st["num_coupons"] == c
    assert np.array_equal(st["matrix"], mat)
    assert not st["has_hip"]
    # stable re-serialization
    assert serialize_cpc(st["matrix"], st["lg_k"]) == buf


def test_roundtrip_other_lgks():
    for lg_k in (4, 11, 16):
        for n in (0, 10, (1 << lg_k), 40 << lg_k):
            mat = _matrix(n, lg_k=lg_k, seed=lg_k + n)
            buf = serialize_cpc(mat, lg_k)
            st = deserialize_cpc(buf)
            assert np.array_equal(st["matrix"], mat), (lg_k, n)


def test_hip_preserved():
    mat = _matrix(300)
    buf = serialize_cpc(mat, 10, kxp=512.25, hip_est_accum=301.5)
    st = deserialize_cpc(buf)
    assert st["has_hip"]
    assert st["kxp"] == 512.25 and st["hip_est_accum"] == 301.5
    assert serialize_cpc(
        st["matrix"], 10, kxp=st["kxp"], hip_est_accum=st["hip_est_accum"]
    ) == buf


def test_seed_mismatch():
    buf = serialize_cpc(_matrix(50), 10, seed=9001)
    with pytest.raises(CpcSerdeError, match="seed hash"):
        deserialize_cpc(buf, seed=1234)


def test_corruption_hardening():
    buf = bytearray(serialize_cpc(_matrix(2000), 10))
    with pytest.raises(CpcSerdeError):
        deserialize_cpc(bytes(buf[:6]))
    bad = bytearray(buf)
    bad[2] = 15  # family
    with pytest.raises(CpcSerdeError, match="family"):
        deserialize_cpc(bytes(bad))
    bad = bytearray(buf)
    bad[1] = 9  # serial version
    with pytest.raises(CpcSerdeError, match="serial version"):
        deserialize_cpc(bytes(bad))
    with pytest.raises(CpcSerdeError):
        deserialize_cpc(bytes(buf[:-8]))  # truncated table words


@pytest.mark.skipif(
    not os.path.isfile(os.path.join(FIXDIR, "manifest.jsonl")),
    reason="reference-generated fixtures not present",
)
def test_golden_byte_identical_reserialization():
    """Every reference-generated CPC fixture must decompress and then
    re-compress to the EXACT original bytes — the strongest possible
    evidence that both directions of the entropy coding are faithful."""
    rows = [
        json.loads(line)
        for line in open(os.path.join(FIXDIR, "manifest.jsonl"))
        if '"cpc"' in line
    ]
    assert len(rows) >= 18
    for r in rows:
        buf = open(os.path.join(FIXDIR, r["file"]), "rb").read()
        st = deserialize_cpc(buf)
        assert st["lg_k"] == r["lgk"]
        c = int(np.unpackbits(st["matrix"].view(np.uint8)).sum())
        assert c == st["num_coupons"], r["file"]
        # the stored HIP accumulator IS the reference's estimate
        if st["has_hip"] and r["n"] > 0:
            assert st["hip_est_accum"] == pytest.approx(r["estimate"], rel=1e-12)
        # engine's ICON-twin estimator agrees within the sketch's RSE
        if r["n"] > 0:
            est = invert_coupons(c, st["lg_k"])
            rse = 1.0 / np.sqrt(1 << st["lg_k"])
            assert est == pytest.approx(r["estimate"], rel=4 * rse)
        out = serialize_cpc(
            st["matrix"], st["lg_k"],
            kxp=st["kxp"] if st["has_hip"] else None,
            hip_est_accum=st["hip_est_accum"] if st["has_hip"] else None,
            first_interesting_column=st["first_interesting_column"],
        )
        assert out == buf, r["file"]


def test_spark_export_import(spark):
    from pyspark.sql import functions as F

    from datasketches_cpp_spark.functions.cpc import cpc_sketch_agg, with_estimate
    from datasketches_cpp_spark.functions.cpcserde import (
        cpc_from_bytes,
        with_cpc_bytes,
    )

    df = spark.range(20_000).withColumn("g", (F.col("id") % 2).cast("int"))
    sk = cpc_sketch_agg(df, ["g"], "id", lg_k=10)
    blobs = with_cpc_bytes(sk).select("g", "sketch_bytes")
    back = cpc_from_bytes(blobs)
    est = {r["g"]: r["estimate"] for r in with_estimate(back).collect()}
    orig = {r["g"]: r["estimate"] for r in with_estimate(sk).collect()}
    assert est == orig  # byte round-trip preserves the matrix exactly
    for g in (0, 1):
        assert est[g] == pytest.approx(10_000, rel=0.15)
