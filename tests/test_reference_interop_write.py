"""Write-path wire parity: the reference implementation reads OUR bytes.

tests/interop/read_blobs.cpp makes the read-only reference implementation
deserialize blobs produced by this engine's Python writers, answer queries,
and re-serialize its parsed state.  These tests then re-read the
reference's re-encoding with the engine's own readers and assert state
equality — closing the loop

    engine state → engine writer → reference reader → reference writer
      → engine reader → state'   (identical, zero tolerance)

which proves the engine's write path emits bytes a real DataSketches
deployment accepts (the reverse direction of test_reference_interop.py).
"""

from __future__ import annotations

import json
import os
import subprocess

import numpy as np
import pytest

from datasketches_cpp_spark import kmv
from datasketches_cpp_spark.functions.classic_quantiles import ClassicQuantilesSketch
from datasketches_cpp_spark.functions.classicserde import (
    deserialize_classic,
    serialize_classic,
)
from datasketches_cpp_spark.functions.cpc import _fold_matrix, invert_coupons
from datasketches_cpp_spark.functions.cpcserde import (
    deserialize_cpc,
    serialize_cpc,
)
from datasketches_cpp_spark.functions.density import DensitySketch
from datasketches_cpp_spark.functions.densityserde import (
    deserialize_density,
    serialize_density,
)
from datasketches_cpp_spark.functions.fiserde import (
    deserialize_frequent_items,
    serialize_frequent_items,
)
from datasketches_cpp_spark.functions.freq import MGState
from datasketches_cpp_spark.functions.hllserde import (
    deserialize_hll,
    serialize_hll4,
    serialize_hll6,
    serialize_hll8,
)
from datasketches_cpp_spark.functions.kll_items import (
    KllItemSketch,
    deserialize_kll_strings,
    serialize_kll_strings,
)
from datasketches_cpp_spark.functions.kllserde import deserialize_kll, serialize_kll
from datasketches_cpp_spark.functions.quantiles import KllSketch
from datasketches_cpp_spark.functions.req import ReqSketch
from datasketches_cpp_spark.functions.reqserde import deserialize_req, serialize_req
from datasketches_cpp_spark.functions.samplingserde import (
    deserialize_ebpps,
    serialize_ebpps,
    deserialize_bloom,
    deserialize_countmin,
    deserialize_varopt,
    serialize_bloom,
    serialize_countmin,
    serialize_varopt,
)
from datasketches_cpp_spark.functions.tdigest import TDigest
from datasketches_cpp_spark.functions.tdigestserde import (
    deserialize_tdigest,
    serialize_tdigest,
)
from datasketches_cpp_spark.functions.thetaserde import (
    deserialize_compact,
    serialize_compact_v3,
    serialize_compressed,
)
from datasketches_cpp_spark.functions.tupleserde import (
    deserialize_aod,
    deserialize_tuple_compact,
    serialize_aod,
    serialize_tuple_compact,
)
from datasketches_cpp_spark.kmv import MAX_THETA

INTEROP = os.path.join(os.path.dirname(__file__), "interop")
REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference repo not present"
)


def _binary() -> str | None:
    exe = os.path.join(INTEROP, "read_blobs")
    src = os.path.join(INTEROP, "read_blobs.cpp")
    if not os.path.isfile(exe) or os.path.getmtime(exe) < os.path.getmtime(src):
        try:
            subprocess.run(
                ["sh", os.path.join(INTEROP, "build.sh")],
                check=True, capture_output=True, timeout=300,
            )
        except (subprocess.SubprocessError, OSError):
            return None
    return exe if os.path.isfile(exe) else None


@pytest.fixture(scope="module")
def roundtrip(tmp_path_factory):
    """Write every family's blobs, run the reference harness ONCE, and
    return {file: (reference answers row, reference re-encoding bytes)}."""
    exe = _binary()
    if exe is None:
        pytest.skip("cannot build the reference interop harness")
    d = tmp_path_factory.mktemp("wire")
    blobs = _make_blobs()
    for name, b in blobs.items():
        (d / name).write_bytes(b)
    out = subprocess.run(
        [exe, str(d)], check=True, capture_output=True, timeout=300, text=True
    )
    rows = {}
    for line in out.stdout.splitlines():
        row = json.loads(line)
        reenc = None
        p = d / (row["file"] + ".out")
        if p.exists():
            reenc = p.read_bytes()
        rows[row["file"]] = (row, reenc)
    return rows


RNG = np.random.default_rng(20260817)

# -- engine states under test (module-level so tests can re-derive answers) --

THETA_EXACT = np.sort(RNG.integers(0, MAX_THETA, 100, dtype=np.uint64))
_TH = int(MAX_THETA // 3)
THETA_EST = np.sort(
    RNG.integers(0, _TH, 900, dtype=np.uint64).astype(np.uint64)
)
HLL_REGS = {
    lg_k: RNG.integers(0, 16, 1 << lg_k, dtype=np.uint8) for lg_k in (10, 11)
}
KLL_D_VALS = (np.arange(5000) * 0.6180339887498949) % 1.0
KLL_F_VALS = RNG.random(5000).astype(np.float32).astype(np.float64)
KLL_S_ITEMS = [f"s_{(i * 7919) % 3000:05d}" for i in range(3000)]
REQ_VALS = RNG.random(8000).astype(np.float32).astype(np.float64)
TD_VALS = (np.arange(4000) * 0.6180339887498949) % 1.0
TUPLE_KEYS = np.sort(RNG.integers(0, _TH, 300, dtype=np.uint64))
TUPLE_SUMS = RNG.random(300) * 10
AOD_KEYS = np.sort(RNG.choice(1 << 62, 250, replace=False).astype(np.uint64))
AOD_VALS = RNG.random((250, 3)) * 5
AOS_KEYS = np.sort(RNG.choice(1 << 62, 120, replace=False).astype(np.uint64))
AOS_VALS = [[f"s{i}", "x" * (i % 5)] if i % 3 else [f"solo{i}"]
            for i in range(120)]
VAROPT_H_ITEMS = np.arange(10, dtype=np.int64)
VAROPT_H_WTS = np.linspace(50, 30, 10)
VAROPT_R_ITEMS = np.arange(100, 122, dtype=np.int64)
CM_MATRIX = RNG.integers(0, 1000, (5, 32)).astype(np.int64)
BLOOM_BITS = RNG.integers(0, 256, 128, dtype=np.uint8)


def _cpc_matrix(n: int, lg_k: int = 10) -> np.ndarray:
    """Coupon matrix built by the engine's own update path."""
    mat = np.zeros(1 << lg_k, np.uint64)
    if n:
        _fold_matrix(mat, RNG.integers(0, 1 << 63, n, dtype=np.uint64), lg_k)
    return mat


CPC_MATS = {  # lg_k=10: sparse / hybrid / pinned / sliding flavors
    "sparse": _cpc_matrix(60),
    "hybrid": _cpc_matrix(350),
    "pinned": _cpc_matrix(2500),
    "sliding": _cpc_matrix(120_000),
}

# EBPPS: the integral-C image the engine's systematic PPS sampler exports
EBPPS_ITEMS = np.sort(RNG.choice(5000, 40, replace=False)).astype(np.int64)
EBPPS_CUM_WT, EBPPS_WT_MAX = 12_345.5, 60.25


def _density_sketch() -> DensitySketch:
    ds = DensitySketch(k=10, dim=3, seed=7)
    pts = (np.arange(6000, dtype=np.float64) * 0.6180339887498949 % 1.0)
    ds.update_batch(np.float32(pts.reshape(2000, 3)))  # float-representable
    return ds


def _make_blobs() -> dict[str, bytes]:
    out: dict[str, bytes] = {}
    out["theta__exact.bin"] = serialize_compact_v3(-1, THETA_EXACT)
    out["theta__est.bin"] = serialize_compact_v3(_TH, THETA_EST)
    out["theta__est_v4.bin"] = serialize_compressed(_TH, THETA_EST)
    for lg_k, regs in HLL_REGS.items():
        out[f"hll__8_{lg_k}.bin"] = serialize_hll8(regs, lg_k)
        out[f"hll__6_{lg_k}.bin"] = serialize_hll6(regs, lg_k)
        out[f"hll__4_{lg_k}.bin"] = serialize_hll4(regs, lg_k)
    skd = KllSketch(200)
    skd.update_batch(KLL_D_VALS)
    out["klld__1.bin"] = serialize_kll(skd, item_dtype="<f8")
    skf = KllSketch(200)
    skf.update_batch(KLL_F_VALS)
    out["kllf__1.bin"] = serialize_kll(skf, item_dtype="<f4")
    sks = KllItemSketch(200)
    sks.update_batch(KLL_S_ITEMS)
    out["klls__1.bin"] = serialize_kll_strings(sks)
    skc = ClassicQuantilesSketch(128)
    skc.update_batch(KLL_D_VALS)
    out["classic__1.bin"] = serialize_classic(skc)
    for hra in (True, False):
        skr = ReqSketch(12, hra=hra)
        skr.update_batch(REQ_VALS)
        out[f"reqf__{'hra' if hra else 'lra'}.bin"] = serialize_req(skr, "<f4")
    td = TDigest(100)
    td.update_batch(TD_VALS)
    out["tdigest__1.bin"] = serialize_tdigest(td)
    fis = MGState(64)
    import pandas as pd

    fis.update_batch(pd.Series([f"h_{i % 5}" for i in range(5000)]))
    fis.update_batch(pd.Series([f"l_{i}" for i in range(500)]))  # forces purges
    out["fis__1.bin"] = serialize_frequent_items(fis)
    fii = MGState(64)
    fii.update_batch(pd.Series(np.arange(2000, dtype=np.int64) % 7))
    out["fii__1.bin"] = serialize_frequent_items(fii)
    out["tuple__1.bin"] = serialize_tuple_compact(_TH, TUPLE_KEYS, TUPLE_SUMS)
    out["aod__est.bin"] = serialize_aod(_TH, AOD_KEYS[AOD_KEYS < _TH], AOD_VALS[AOD_KEYS < _TH], 3)
    out["aod__exact.bin"] = serialize_aod(-1, AOD_KEYS, AOD_VALS, 3)
    from datasketches_cpp_spark.functions.tupleserde import serialize_aos

    out["aos__exact.bin"] = serialize_aos(-1, AOS_KEYS, AOS_VALS)
    aos_keep = AOS_KEYS < _TH
    out["aos__est.bin"] = serialize_aos(
        _TH, AOS_KEYS[aos_keep],
        [v for v, kp in zip(AOS_VALS, aos_keep) if kp],
    )
    out["varopti__exact.bin"] = serialize_varopt(
        VAROPT_H_ITEMS, VAROPT_H_WTS, np.ones(10, bool), 10, 32, "int64"
    )
    r = len(VAROPT_R_ITEMS)
    out["varopti__est.bin"] = serialize_varopt(
        np.concatenate([VAROPT_H_ITEMS, VAROPT_R_ITEMS]),
        np.concatenate([VAROPT_H_WTS, np.full(r, 12.5)]),
        np.concatenate([np.ones(10, bool), np.zeros(r, bool)]),
        5000, 32, "int64",
    )
    out["countmin__1.bin"] = serialize_countmin(CM_MATRIX, 99_999, 5, 32)
    out["bloom__1.bin"] = serialize_bloom(BLOOM_BITS, 7, 9001)
    for flav, mat in CPC_MATS.items():
        out[f"cpc__{flav}.bin"] = serialize_cpc(mat, 10)
    out["ebpps__1.bin"] = serialize_ebpps(
        EBPPS_ITEMS, 40, 5000, EBPPS_CUM_WT, EBPPS_WT_MAX,
        rho=40.0 / EBPPS_CUM_WT,
    )
    ds = _density_sketch()
    out["density__1.bin"] = serialize_density(ds.levels, ds.n, ds.k, ds.dim)
    return out


# ---------------------------------------------------------------------------


def test_theta_write(roundtrip):
    for name, sig, theta in (
        ("theta__exact.bin", THETA_EXACT, MAX_THETA),
        ("theta__est.bin", THETA_EST, _TH),
        ("theta__est_v4.bin", THETA_EST, _TH),
    ):
        row, reenc = roundtrip[name]
        assert "error" not in row, row
        assert row["num_retained"] == len(sig)
        assert row["theta"] == pytest.approx(theta / MAX_THETA, rel=0, abs=0)
        assert row["estimate"] == pytest.approx(
            kmv.estimate(theta, len(sig)), rel=1e-12
        )
        t2, sig2 = deserialize_compact(reenc)
        assert (MAX_THETA if t2 == -1 else t2) == theta
        assert np.array_equal(sig2, sig)


def test_hll_write(roundtrip):
    for lg_k, regs in HLL_REGS.items():
        for width in (8, 6, 4):
            row, reenc = roundtrip[f"hll__{width}_{lg_k}.bin"]
            assert "error" not in row, row
            assert row["lgk"] == lg_k
            lg2, regs2 = deserialize_hll(reenc)
            assert lg2 == lg_k
            assert np.array_equal(regs2, regs), f"width {width} lg_k {lg_k}"


def _kll_state(sk):
    items, cw = sk.sorted_view()
    return items, cw, sk.n, sk.min_item, sk.max_item


def test_kll_double_write(roundtrip):
    skd = KllSketch(200)
    skd.update_batch(KLL_D_VALS)
    row, reenc = roundtrip["klld__1.bin"]
    assert "error" not in row, row
    assert row["n"] == skd.n
    assert row["median"] == skd.get_quantile(0.5)
    a = _kll_state(skd)
    b = _kll_state(deserialize_kll(reenc, item_dtype="<f8"))
    for x, y in zip(a, b):
        assert np.array_equal(x, y)


def test_kll_float_write(roundtrip):
    skf = KllSketch(200)
    skf.update_batch(KLL_F_VALS)
    row, reenc = roundtrip["kllf__1.bin"]
    assert "error" not in row, row
    assert row["n"] == skf.n
    assert row["median"] == skf.get_quantile(0.5)
    b = _kll_state(deserialize_kll(reenc, item_dtype="<f4"))
    for x, y in zip(_kll_state(skf), b):
        assert np.array_equal(x, y)


def test_kll_string_write(roundtrip):
    sks = KllItemSketch(200)
    sks.update_batch(KLL_S_ITEMS)
    row, reenc = roundtrip["klls__1.bin"]
    assert "error" not in row, row
    assert row["n"] == sks.n
    assert row["median"] == sks.get_quantile(0.5)
    sk2 = deserialize_kll_strings(reenc)
    assert sk2.min_item == sks.min_item and sk2.max_item == sks.max_item
    assert [list(lvl) for lvl in sk2.levels] == [list(lvl) for lvl in sks.levels]


def test_classic_write(roundtrip):
    skc = ClassicQuantilesSketch(128)
    skc.update_batch(KLL_D_VALS)
    row, reenc = roundtrip["classic__1.bin"]
    assert "error" not in row, row
    assert row["n"] == skc.n
    assert row["median"] == skc.get_quantile(0.5)
    sk2 = deserialize_classic(reenc)
    assert sk2.n == skc.n
    assert sk2.min_item == skc.min_item and sk2.max_item == skc.max_item
    a_i, a_c = skc.sorted_view()
    b_i, b_c = sk2.sorted_view()
    assert np.array_equal(a_i, b_i) and np.array_equal(a_c, b_c)


def test_req_write(roundtrip):
    for hra in (True, False):
        skr = ReqSketch(12, hra=hra)
        skr.update_batch(REQ_VALS)
        row, reenc = roundtrip[f"reqf__{'hra' if hra else 'lra'}.bin"]
        assert "error" not in row, row
        assert row["n"] == skr.n
        assert row["num_retained"] == skr.num_retained()
        sk2 = deserialize_req(reenc, item_dtype="<f4")
        assert sk2.n == skr.n and sk2.min == skr.min and sk2.max == skr.max
        for c1, c2 in zip(skr.compactors, sk2.compactors):
            assert c1.lg_weight == c2.lg_weight
            assert np.array_equal(np.sort(c1.buf), np.sort(c2.buf))


def test_tdigest_write(roundtrip):
    td = TDigest(100)
    td.update_batch(TD_VALS)
    row, reenc = roundtrip["tdigest__1.bin"]
    assert "error" not in row, row
    assert row["n"] == td.n
    td2 = deserialize_tdigest(reenc)
    assert td2.n == td.n and td2.min == td.min and td2.max == td.max
    assert np.array_equal(td2.means, td.means)
    assert np.array_equal(td2.weights, td.weights)


def test_fi_write(roundtrip):
    import pandas as pd

    fis = MGState(64)
    fis.update_batch(pd.Series([f"h_{i % 5}" for i in range(5000)]))
    fis.update_batch(pd.Series([f"l_{i}" for i in range(500)]))
    row, reenc = roundtrip["fis__1.bin"]
    assert "error" not in row, row
    assert row["total_weight"] == fis.total
    assert row["num_active"] == len(fis.counts)
    assert row["max_error"] == fis.offset
    st2 = deserialize_frequent_items(reenc, item_type="str")
    assert st2.counts == fis.counts
    assert st2.offset == fis.offset and st2.total == fis.total
    # the reference's own estimates on our bytes match ours exactly
    row_i, reenc_i = roundtrip["fii__1.bin"]
    assert "error" not in row_i, row_i
    fii = MGState(64)
    fii.update_batch(pd.Series(np.arange(2000, dtype=np.int64) % 7))
    st3 = deserialize_frequent_items(reenc_i, item_type="int64")
    assert st3.counts == fii.counts


def test_tuple_write(roundtrip):
    row, reenc = roundtrip["tuple__1.bin"]
    assert "error" not in row, row
    assert row["num_retained"] == len(TUPLE_KEYS)
    assert row["estimate"] == pytest.approx(
        kmv.estimate(_TH, len(TUPLE_KEYS)), rel=1e-12
    )
    assert row["summary_sum"] == pytest.approx(float(TUPLE_SUMS.sum()), rel=1e-12)
    t2, keys2, sums2 = deserialize_tuple_compact(reenc)
    assert t2 == _TH
    assert np.array_equal(keys2.view(np.uint64), TUPLE_KEYS)
    assert np.array_equal(sums2, TUPLE_SUMS)


def test_aod_write(roundtrip):
    """The reference must read engine-written ArrayOfDoublesSketch blobs
    (family 9 type 3), report matching estimates and column sums, and
    re-serialize byte-identically."""
    for name, theta_enc, keys, vals in (
        ("aod__exact.bin", -1, AOD_KEYS, AOD_VALS),
        ("aod__est.bin", _TH, AOD_KEYS[AOD_KEYS < _TH], AOD_VALS[AOD_KEYS < _TH]),
    ):
        row, reenc = roundtrip[name]
        assert "error" not in row, row
        assert row["num_values"] == 3
        assert row["num_retained"] == len(keys)
        theta = MAX_THETA if theta_enc < 0 else theta_enc
        assert row["estimate"] == pytest.approx(
            kmv.estimate(theta, len(keys)), rel=1e-12
        )
        assert row["sum0"] == pytest.approx(vals[:, 0].sum(), rel=1e-12)
        t2, k2, v2, d2 = deserialize_aod(reenc)
        assert d2 == 3
        assert np.array_equal(k2.view(np.uint64), keys)
        assert np.array_equal(v2, vals)
        assert reenc == serialize_aod(theta_enc, keys, vals, 3), name


def test_aos_write(roundtrip):
    """The reference must read engine-written ArrayOfStrings tuple blobs
    (generic compact tuple + AoS summary serde), report matching retained
    counts / estimates / string totals, and re-serialize byte-identically."""
    from datasketches_cpp_spark.functions.tupleserde import (
        deserialize_aos,
        serialize_aos,
    )

    aos_keep = AOS_KEYS < _TH
    for name, theta_enc, keys, vals in (
        ("aos__exact.bin", -1, AOS_KEYS, AOS_VALS),
        ("aos__est.bin", _TH, AOS_KEYS[aos_keep],
         [v for v, kp in zip(AOS_VALS, aos_keep) if kp]),
    ):
        row, reenc = roundtrip[name]
        assert "error" not in row, row
        assert row["num_retained"] == len(keys)
        theta = MAX_THETA if theta_enc < 0 else theta_enc
        assert row["estimate"] == pytest.approx(
            kmv.estimate(theta, len(keys)), rel=1e-12
        )
        assert row["total_strings"] == sum(len(v) for v in vals)
        t2, k2, v2 = deserialize_aos(reenc)
        assert t2 == theta_enc
        assert np.array_equal(k2.view(np.uint64), keys)
        assert v2 == [list(v) for v in vals]
        assert reenc == serialize_aos(theta_enc, keys, vals), name


def test_varopt_write(roundtrip):
    row, reenc = roundtrip["varopti__exact.bin"]
    assert "error" not in row, row
    assert row["n"] == 10 and row["num_samples"] == 10
    assert row["total"] == pytest.approx(float(VAROPT_H_WTS.sum()), rel=1e-12)
    st = deserialize_varopt(reenc, item_dtype="int64")
    assert np.array_equal(np.asarray(st["items"]), VAROPT_H_ITEMS)
    assert np.allclose(st["weights"], VAROPT_H_WTS, rtol=0, atol=0)

    row2, reenc2 = roundtrip["varopti__est.bin"]
    assert "error" not in row2, row2
    assert row2["n"] == 5000 and row2["num_samples"] == 32
    st2 = deserialize_varopt(reenc2, item_dtype="int64")
    assert np.array_equal(
        np.asarray(st2["items"]), np.concatenate([VAROPT_H_ITEMS, VAROPT_R_ITEMS])
    )
    assert np.allclose(st2["weights"][10:], 12.5, rtol=0, atol=0)


def test_countmin_write(roundtrip):
    row, reenc = roundtrip["countmin__1.bin"]
    assert "error" not in row, row
    assert row["total_weight"] == 99_999
    assert row["num_hashes"] == 5 and row["num_buckets"] == 32
    st = deserialize_countmin(reenc)
    assert np.array_equal(st["matrix"], CM_MATRIX)
    assert st["total_weight"] == 99_999


def test_cpc_write(roundtrip):
    """Engine-built coupon matrices, compressed by cpcserde, must be
    readable by the actual reference binary: its ICON estimate must agree
    with the engine's coupon-inversion twin, and its re-serialization must
    be BYTE-IDENTICAL to what cpcserde wrote (merged-mode stream)."""
    for flav, mat in CPC_MATS.items():
        name = f"cpc__{flav}.bin"
        row, reenc = roundtrip[name]
        assert "error" not in row, row
        assert row["lgk"] == 10
        c = int(np.unpackbits(mat.view(np.uint8)).sum())
        est = invert_coupons(c, 10)
        rse = 1.0 / np.sqrt(1 << 10)
        assert row["estimate"] == pytest.approx(est, rel=2 * rse), flav
        assert row["lb2"] <= row["estimate"] <= row["ub2"]
        st = deserialize_cpc(reenc)
        assert np.array_equal(st["matrix"], mat), flav
        assert reenc == serialize_cpc(mat, 10), flav


def test_ebpps_write(roundtrip):
    """The reference must read the engine's exported EBPPS sample and
    report the same k / n / C / cumulative weight, and re-serialize it
    byte-identically."""
    row, reenc = roundtrip["ebpps__1.bin"]
    assert "error" not in row, row
    assert row["k"] == 40 and row["n"] == 5000
    assert row["c"] == pytest.approx(40.0, rel=0, abs=0)
    assert row["cumulative_weight"] == pytest.approx(EBPPS_CUM_WT, rel=1e-12)
    st = deserialize_ebpps(reenc)
    assert np.array_equal(np.asarray(st["items"]), EBPPS_ITEMS)
    assert st["wt_max"] == EBPPS_WT_MAX
    assert reenc == serialize_ebpps(
        EBPPS_ITEMS, 40, 5000, EBPPS_CUM_WT, EBPPS_WT_MAX,
        rho=40.0 / EBPPS_CUM_WT,
    )


def test_density_write(roundtrip):
    """The reference must read the engine's KDE coreset and answer the
    SAME density estimate the engine computes, and re-serialize the blob
    byte-identically."""
    row, reenc = roundtrip["density__1.bin"]
    assert "error" not in row, row
    ds = _density_sketch()
    assert row["k"] == ds.k and row["dim"] == ds.dim and row["n"] == ds.n
    assert row["num_retained"] == ds.num_retained()
    engine_est = ds.get_estimate(np.array([[0.5, 0.5, 0.5]]))[0]
    assert row["est_origin"] == pytest.approx(engine_est, rel=1e-5)
    st = deserialize_density(reenc)
    assert all(
        np.array_equal(a, np.float32(b)) for a, b in zip(st["levels"], ds.levels)
    )
    assert reenc == serialize_density(ds.levels, ds.n, ds.k, ds.dim)


def test_bloom_write(roundtrip):
    row, reenc = roundtrip["bloom__1.bin"]
    assert "error" not in row, row
    assert row["capacity"] == len(BLOOM_BITS) * 8
    assert row["num_hashes"] == 7
    expected_bits = int(np.unpackbits(BLOOM_BITS).sum())
    assert row["bits_used"] == expected_bits
    st = deserialize_bloom(reenc)
    assert np.array_equal(st["bits"], BLOOM_BITS)
    assert st["num_bits_set"] == expected_bits
