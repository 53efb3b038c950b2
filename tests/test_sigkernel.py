"""Signature-kernel tests: every segmented/vectorized kernel is checked
against an obvious per-doc brute-force implementation (the reference's
test philosophy: exact oracle below sketch capacity, statistical envelope
above — theta_sketch_test.cpp:112-168)."""

import numpy as np
import pytest

from datasketches_cpp_spark.hashing import DEFAULT_SEED, hash63_str_many, _fmix64
from datasketches_cpp_spark.operators.sigkernel import (
    MAX_HASH,
    MAX_THETA,
    SigConfig,
    band_hashes,
    byte_shingle_hashes,
    decode_theta,
    hamming64,
    kmv_signatures,
    lane_seeds,
    minhash_jaccard,
    minhash_signatures,
    phash_band_hashes,
    simhash64,
    token_hashes_batch,
    token_shingle_hashes,
)

CFG = SigConfig(num_perm=32, bands=8, kmv_k=16, shingle_w=2)


def brute_shingles(tokens, w, seed):
    """Obvious per-doc w-gram shingle set via the scalar hash path."""
    th = hash63_str_many(tokens, seed)
    if len(tokens) == 0:
        return np.empty(0, np.uint64)
    if len(tokens) < w:
        padded = np.zeros(w, dtype=np.uint64)
        padded[: len(tokens)] = th
        grams = [padded]
    else:
        grams = [th[i : i + w] for i in range(len(tokens) - w + 1)]
    from datasketches_cpp_spark.hashing import murmur3_x64_128_fixed

    rows = np.ascontiguousarray(np.stack(grams), dtype="<u8").view(np.uint8).reshape(len(grams), 8 * w)
    h1, _ = murmur3_x64_128_fixed(rows, seed)
    return h1 >> np.uint64(1)


TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the lazy cat",
    "",
    "single",
    "a b",
    "completely different words here now",
]


def test_token_hashes_batch_matches_scalar():
    th, off = token_hashes_batch(TEXTS, DEFAULT_SEED)
    assert len(off) == len(TEXTS) + 1
    for i, t in enumerate(TEXTS):
        toks = t.split()
        seg = th[off[i] : off[i + 1]]
        assert len(seg) == len(toks)
        if toks:
            expected = hash63_str_many(toks, DEFAULT_SEED)
            assert np.array_equal(seg, expected)


def test_token_shingles_match_brute():
    sh, off = token_shingle_hashes(TEXTS, 2, DEFAULT_SEED)
    for i, t in enumerate(TEXTS):
        seg = sh[off[i] : off[i + 1]]
        expected = brute_shingles(t.split(), 2, DEFAULT_SEED)
        assert np.array_equal(seg, expected), f"doc {i}"


def test_byte_shingles_boundaries():
    bufs = [b"abcdefgh", b"xy", b"", b"abcdefgh"]
    sh, off = byte_shingle_hashes(bufs, 4, DEFAULT_SEED)
    # doc 0 and doc 3 identical → identical shingle sequences
    assert np.array_equal(sh[off[0] : off[1]], sh[off[3] : off[4]])
    # doc 1 shorter than w → exactly one (padded) shingle
    assert off[2] - off[1] == 1
    # empty doc → no shingles
    assert off[3] - off[2] == 0
    # no window crosses the doc 0/doc 1 boundary: shingle count = 8-4+1
    assert off[1] - off[0] == 5


def test_byte_shingles_stride():
    bufs = [bytes(range(100))]
    sh1, off1 = byte_shingle_hashes(bufs, 8, DEFAULT_SEED, stride=1)
    sh4, off4 = byte_shingle_hashes(bufs, 8, DEFAULT_SEED, stride=4)
    assert off4[1] < off1[1]
    # strided shingles are a subset of stride-1 shingles
    assert np.isin(sh4, sh1).all()


def test_minhash_matches_brute():
    sh, off = token_shingle_hashes(TEXTS, CFG.shingle_w, CFG.seed)
    sigs = minhash_signatures(sh, off, CFG)
    seeds = lane_seeds(CFG)
    for i in range(len(TEXTS)):
        seg = sh[off[i] : off[i + 1]]
        if len(seg) == 0:
            assert (sigs[i] == MAX_HASH).all()
            continue
        for lane in (0, 7, 31):
            mixed = _fmix64(seg ^ seeds[lane]) >> np.uint64(1)
            assert sigs[i, lane] == mixed.min()


def test_minhash_jaccard_similar_docs():
    cfg = SigConfig(num_perm=256, bands=32, shingle_w=2)
    sh, off = token_shingle_hashes(TEXTS, cfg.shingle_w, cfg.seed)
    sigs = minhash_signatures(sh, off, cfg)
    # docs 0,1 differ by one token → high jaccard; docs 0,5 unrelated
    j01 = minhash_jaccard(sigs[0][None, :], sigs[1][None, :])[0]
    j05 = minhash_jaccard(sigs[0][None, :], sigs[5][None, :])[0]
    a = set(brute_shingles(TEXTS[0].split(), 2, cfg.seed).tolist())
    b = set(brute_shingles(TEXTS[1].split(), 2, cfg.seed).tolist())
    true_j = len(a & b) / len(a | b)
    assert j01 == pytest.approx(true_j, abs=0.12)  # se ≈ sqrt(J(1-J)/256)
    assert j05 < 0.1


def test_kmv_signatures_exact_and_estimation():
    rng = np.random.default_rng(1)
    sh = rng.integers(0, 1 << 63, size=1000, dtype=np.int64).astype(np.uint64)
    off = np.array([0, 10, 10, 1000])  # doc0: 10 shingles, doc1: 0, doc2: 990
    thetas, sigs = kmv_signatures(sh, off, k=64)
    # doc 0: fewer than k → exact mode, all distinct retained, sorted
    assert decode_theta(thetas[0]) == MAX_THETA
    assert np.array_equal(sigs[0], np.unique(sh[0:10]))
    # doc 1: empty
    assert len(sigs[1]) == 0 and decode_theta(thetas[1]) == MAX_THETA
    # doc 2: estimation mode — k smallest distinct, theta = (k+1)-th
    u = np.unique(sh[10:1000])
    assert np.array_equal(sigs[2], u[:64])
    assert decode_theta(thetas[2]) == int(u[64])


def test_simhash_properties():
    th, off = token_hashes_batch(TEXTS, DEFAULT_SEED)
    s = simhash64(th, off)
    assert s.dtype == np.uint64
    # near-identical docs (0,1) are close in hamming; unrelated (0,5) far
    d01 = hamming64(s[0:1], s[1:2])[0]
    d05 = hamming64(s[0:1], s[5:6])[0]
    assert d01 < d05
    assert d01 <= 12
    # deterministic
    s2 = simhash64(th, off)
    assert np.array_equal(s, s2)
    # empty doc → 0
    assert s[2] == 0


def test_band_hashes_shape_and_locality():
    cfg = SigConfig(num_perm=32, bands=8)
    sigs = np.arange(64, dtype=np.uint64).reshape(2, 32)
    bh = band_hashes(sigs, cfg)
    assert bh.shape == (2, 8)
    # identical sig rows → identical band rows
    bh2 = band_hashes(np.vstack([sigs[0], sigs[0]]), cfg)
    assert np.array_equal(bh2[0], bh2[1])
    # sharing a band of lanes → that band's hash matches
    s3 = sigs.copy()
    s3[1, :4] = s3[0, :4]  # band 0 = lanes 0..3
    bh3 = band_hashes(s3, cfg)
    assert bh3[1, 0] == bh3[0, 0]
    assert not np.array_equal(bh3[0], bh3[1])


def test_phash_bands_pigeonhole():
    a = np.uint64(0xDEADBEEFCAFEBABE)
    # flip 5 bits < 8 bands → at least one band slice equal
    b = a ^ np.uint64(0b10001000100010001000 << 20)
    assert hamming64(np.array([a]), np.array([b]))[0] == 5
    ba = phash_band_hashes(np.array([a]), 8)[0]
    bb = phash_band_hashes(np.array([b]), 8)[0]
    assert (ba == bb).any()


def test_hamming64():
    a = np.array([0, 0xFFFFFFFFFFFFFFFF], dtype=np.uint64)
    b = np.array([0, 0], dtype=np.uint64)
    assert list(hamming64(a, b)) == [0, 64]


def test_config_fingerprint():
    assert SigConfig().fingerprint() == SigConfig().fingerprint()
    assert SigConfig().fingerprint() != SigConfig(shingle_w=5).fingerprint()


def test_phash_slice_pair_pigeonhole():
    """hamming ≤ num_slices-2 ⇒ at least one slice-PAIR band matches
    (the guarantee behind the production pHash blocking scheme)."""
    from datasketches_cpp_spark.operators.sigkernel import phash_slice_pair_hashes

    rng = np.random.default_rng(3)
    for _ in range(200):
        a = np.uint64(rng.integers(0, 1 << 63))
        nflips = int(rng.integers(0, 7))  # ≤ 6
        bits = rng.choice(64, size=nflips, replace=False)
        b = a
        for bit in bits:
            b = np.uint64(b) ^ (np.uint64(1) << np.uint64(bit))
        ka = phash_slice_pair_hashes(np.array([a]), 8)[0]
        kb = phash_slice_pair_hashes(np.array([b]), 8)[0]
        assert (ka == kb).any(), (hex(int(a)), hex(int(b)), nflips)
    # shape: C(8,2) = 28 bands
    assert phash_slice_pair_hashes(np.array([np.uint64(5)]), 8).shape == (1, 28)


def test_phash_slice_combo_pigeonhole():
    """hamming ≤ num_slices - combo ⇒ at least one combo band matches —
    the guarantee behind the production radius-5 triple blocking."""
    from datasketches_cpp_spark.operators.sigkernel import phash_slice_combo_hashes

    rng = np.random.default_rng(7)
    for _ in range(200):
        a = np.uint64(rng.integers(0, 1 << 63))
        nflips = int(rng.integers(0, 6))  # ≤ 5 = 8 - 3
        bits = rng.choice(64, size=nflips, replace=False)
        b = a
        for bit in bits:
            b = np.uint64(b) ^ (np.uint64(1) << np.uint64(bit))
        ka = phash_slice_combo_hashes(np.array([a]), 8, 3)[0]
        kb = phash_slice_combo_hashes(np.array([b]), 8, 3)[0]
        assert (ka == kb).any(), (hex(int(a)), hex(int(b)), nflips)
    # shape: C(8,3) = 56 bands
    assert phash_slice_combo_hashes(np.array([np.uint64(5)]), 8, 3).shape == (1, 56)
