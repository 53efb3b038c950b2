"""Density + EBPPS wire serde: unit round-trips, corruption hardening,
and Spark-level export/import glue.  Golden parity against
reference-generated fixtures lives in tests/test_reference_interop.py;
validation through the actual reference binary in
tests/test_reference_interop_write.py."""

from __future__ import annotations

import numpy as np
import pytest

from datasketches_cpp_spark.functions.density import DensitySketch
from datasketches_cpp_spark.functions.densityserde import (
    DensitySerdeError,
    deserialize_density,
    serialize_density,
)
from datasketches_cpp_spark.functions.samplingserde import (
    SamplingSerdeError,
    deserialize_ebpps,
    serialize_ebpps,
)


def _sketch(n: int, dim: int = 2, k: int = 16) -> DensitySketch:
    ds = DensitySketch(k=k, dim=dim, seed=3)
    if n:
        pts = (np.arange(n * dim, dtype=np.float64) * 0.7548776662 % 1.0)
        ds.update_batch(np.float32(pts.reshape(n, dim)))
    return ds


@pytest.mark.parametrize("n", [0, 5, 100, 5000])
def test_density_roundtrip(n):
    ds = _sketch(n)
    buf = serialize_density(ds.levels, ds.n, ds.k, ds.dim)
    st = deserialize_density(buf)
    assert st["k"] == ds.k and st["dim"] == ds.dim and st["n"] == n
    if n:
        assert sum(len(lv) for lv in st["levels"]) == ds.num_retained()
        for a, b in zip(st["levels"], ds.levels):
            assert np.array_equal(a, np.float32(b))
    # stable re-serialization
    assert serialize_density(st["levels"], st["n"], st["k"], st["dim"]) == buf


def test_density_f8_items():
    ds = _sketch(800, dim=3)
    buf = serialize_density(ds.levels, ds.n, ds.k, ds.dim, item_dtype="<f8")
    st = deserialize_density(buf, item_dtype="<f8")
    for a, b in zip(st["levels"], ds.levels):
        assert np.array_equal(a, b)  # doubles: lossless


def test_density_corruption():
    ds = _sketch(100)
    buf = bytearray(serialize_density(ds.levels, ds.n, ds.k, ds.dim))
    with pytest.raises(DensitySerdeError):
        deserialize_density(bytes(buf[:8]))
    bad = bytearray(buf)
    bad[2] = 7  # family
    with pytest.raises(DensitySerdeError, match="family"):
        deserialize_density(bytes(bad))
    with pytest.raises(DensitySerdeError):
        deserialize_density(bytes(buf[:-4]))  # truncated points


def test_ebpps_roundtrip_partial():
    items = list(range(30))
    buf = serialize_ebpps(
        items, 30, 500, 1000.0, 9.5, rho=0.0305, c=30.5, partial_item=499
    )
    st = deserialize_ebpps(buf)
    assert st["items"] == items and st["partial_item"] == 499
    assert st["c"] == 30.5 and st["n"] == 500
    assert serialize_ebpps(
        st["items"], st["k"], st["n"], st["cumulative_wt"], st["wt_max"],
        st["rho"], c=st["c"], partial_item=st["partial_item"],
    ) == buf


def test_ebpps_empty_and_errors():
    buf = serialize_ebpps([], 10, 0, 0.0, 0.0, 1.0)
    assert deserialize_ebpps(buf)["n"] == 0
    with pytest.raises(SamplingSerdeError, match="partial"):
        serialize_ebpps([1, 2], 5, 10, 3.0, 1.0, 0.5, c=2.5)  # frac, no item
    with pytest.raises(SamplingSerdeError):
        serialize_ebpps([1, 2], 5, 10, 3.0, 1.0, 0.5, c=4.0)  # ⌊c⌋≠len


def test_density_spark_glue(spark):
    from pyspark.sql import functions as F

    from datasketches_cpp_spark.functions.density import (
        density_sketch_agg,
        with_density_estimates,
    )
    from datasketches_cpp_spark.functions.densityserde import (
        density_from_bytes,
        with_density_bytes,
    )

    df = (
        spark.range(4000)
        .withColumn("g", (F.col("id") % 2).cast("int"))
        .withColumn(
            "vec",
            F.array(
                (F.col("id") * 0.618033988749895 % 1.0),
                (F.col("id") * 0.754877666246693 % 1.0),
            ),
        )
    )
    sk = density_sketch_agg(df, ["g"], "vec", dim=2, k=16)
    blobs = with_density_bytes(sk, dim=2, k=16).select("g", "sketch_bytes")
    back = density_from_bytes(blobs)
    q = np.array([[0.5, 0.5]])
    est0 = {r["g"]: r["density_0"] for r in with_density_estimates(sk, q, 2, 16).collect()}
    est1 = {r["g"]: r["density_0"] for r in with_density_estimates(back, q, 2, 16).collect()}
    for g in (0, 1):
        # float32 wire items: estimates agree to float precision
        assert est1[g] == pytest.approx(est0[g], rel=1e-5)


def test_ebpps_export_bytes(spark):
    from pyspark.sql import functions as F

    from datasketches_cpp_spark.functions.samplingserde import ebpps_export_bytes

    df = spark.range(2000).withColumn("w", (F.col("id") % 10 + 1).cast("double"))
    buf = ebpps_export_bytes(df, "id", "w", k=40)
    st = deserialize_ebpps(buf)
    assert st["k"] == 40 and st["n"] == 2000
    assert st["cumulative_wt"] == pytest.approx(11000.0)
    assert st["wt_max"] == 10.0
    assert len(st["items"]) in (39, 40)  # hard size bound
    assert st["partial_item"] is None
    assert all(0 <= i < 2000 for i in st["items"])
    # empty input
    st0 = deserialize_ebpps(ebpps_export_bytes(df.limit(0), "id", "w", k=40))
    assert st0["n"] == 0 and st0["items"] == []
