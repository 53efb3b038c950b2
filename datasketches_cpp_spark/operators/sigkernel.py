"""Signature kernels — pure numpy, shared by the Spark UDFs (operators/
minhash.py) and the single-node oracle (oracle/pydedup.py).

Everything is **batch-vectorized across documents**: a batch of N docs is
flattened into one shingle-hash array with doc-boundary offsets, and every
per-doc reduction (k-min selection, per-lane min, per-bit majority) is a
single segmented numpy op (``reduceat`` / ``lexsort`` + rank arithmetic).
This is the whole-batch replacement for the reference's per-item update loop
(theta_update_sketch_base_impl.hpp:137-251) — same math, no Python-per-row.

Config discipline mirrors the reference's fixed-seed contract
(common_defs.hpp:34; seed-hash check theta_union_base_impl.hpp:41-42):
every kernel takes the seed explicitly and `SigConfig.fingerprint()` stamps
the full parameter set, so two runs can only be compared when fingerprints
match.
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass

import numpy as np

from ..hashing import (
    DEFAULT_SEED,
    hash63_bytes_scalar,
    hash63_str_many,
    murmur3_x64_128_fixed,
    _fmix64,
)

MAX_HASH = np.uint64((1 << 63) - 1)
MAX_THETA = 1 << 63


@dataclass(frozen=True)
class SigConfig:
    """The (seed, shingle, signature, banding) configuration — the dedup
    analog of the reference's (seed, lg_k, resize-factor) builder params."""

    seed: int = DEFAULT_SEED
    shingle_w: int = 3  # token n-gram width (text) / byte-window width (binary)
    num_perm: int = 128  # MinHash lanes (k independent 1-min sketches)
    kmv_k: int = 256  # bottom-k KMV signature size for verification
    bands: int = 32  # LSH bands; rows per band = num_perm // bands
    jaccard_threshold: float = 0.8
    simhash_hamming: int = 3
    # pHash verification radius; slice-COMBO blocking (every
    # ``phash_combo``-subset of the ``phash_bands`` slices forms one band
    # key of combo·(64/bands) bits) guarantees candidate recall for
    # hamming ≤ phash_bands - phash_combo (pigeonhole). Wider keys =
    # exponentially fewer random bucket collisions: single slices (8-bit
    # keys) collide ~n²/64 pair-candidates, pairs (16-bit) ~n²/4681,
    # triples (24-bit) ~n²/599k — triples are the first tier that stays
    # sane at web scale, at radius 8-3 = 5
    phash_hamming: int = 5
    phash_bands: int = 8
    phash_combo: int = 3

    @property
    def rows_per_band(self) -> int:
        return self.num_perm // self.bands

    def fingerprint(self) -> str:
        payload = json.dumps(asdict(self), sort_keys=True).encode()
        return f"{hash63_bytes_scalar(payload, self.seed):016x}"


def lane_seeds(cfg: SigConfig) -> np.ndarray:
    """One 64-bit seed per MinHash lane, derived from the master seed the
    same way for every worker (deterministic fan-out of DEFAULT_SEED)."""
    base = np.arange(1, cfg.num_perm + 1, dtype=np.uint64)
    return _fmix64(base * np.uint64(0x9E3779B97F4A7C15) + np.uint64(cfg.seed))


# ---------------------------------------------------------------------------
# Flattening: docs → (shingle hashes, offsets)
# ---------------------------------------------------------------------------


def tokenize_batch(texts: list[str]) -> tuple[list[str], np.ndarray]:
    """Whitespace tokens for a batch; returns flat token list + int64
    offsets of length n+1 (doc i's tokens are flat[off[i]:off[i+1]])."""
    flat: list[str] = []
    offsets = np.zeros(len(texts) + 1, dtype=np.int64)
    for i, t in enumerate(texts):
        toks = t.split() if t else []
        flat.extend(toks)
        offsets[i + 1] = offsets[i] + len(toks)
    return flat, offsets


def token_hashes_batch(texts: list[str], seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-token 63-bit hashes with doc offsets. Distinct tokens are hashed
    once (factorize + unique-hash + gather) — the batch analog of a
    hash-memo, sound because murmur is pure."""
    flat, offsets = tokenize_batch(texts)
    if not flat:
        return np.empty(0, np.uint64), offsets
    import pandas as pd

    codes, uniques = pd.factorize(np.asarray(flat, dtype=object))
    uh = hash63_str_many(list(uniques), seed)
    return uh[codes], offsets


def token_shingle_hashes(
    texts: list[str], w: int, seed: int
) -> tuple[np.ndarray, np.ndarray]:
    """Token w-gram shingle hashes per doc: per-token hashes are rolled into
    w-grams and the 8*w little-endian bytes are murmur-hashed (fixed width ⇒
    one vectorized call for the whole batch). Docs shorter than w tokens
    contribute a single shingle over all their tokens."""
    th, offsets = token_hashes_batch(texts, seed)
    return _roll_and_hash(th, offsets, w, seed)


def byte_shingle_hashes(
    bufs: list[bytes], w: int, seed: int, stride: int = 1
) -> tuple[np.ndarray, np.ndarray]:
    """Byte w-gram shingles over binary payloads (the image lane of S1) —
    list-of-bytes convenience wrapper over the flat-buffer kernel."""
    n = len(bufs)
    lengths = np.fromiter((len(b) for b in bufs), dtype=np.int64, count=n)
    starts = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=starts[1:])
    flat = np.frombuffer(b"".join(bufs), dtype=np.uint8)
    return byte_shingle_hashes_flat(flat, starts, w, seed, stride)


def byte_shingle_hashes_flat(
    flat: np.ndarray, starts: np.ndarray, w: int, seed: int, stride: int = 1
) -> tuple[np.ndarray, np.ndarray]:
    """Flat-buffer byte-shingle kernel: ``flat`` is the concatenation of all
    docs' bytes, ``starts`` the int64 doc offsets (len n+1) — exactly the
    layout of an Arrow BinaryArray's (data, offsets) buffers, so the Spark
    ``mapInArrow`` path feeds this ZERO-COPY. Rolling windows are gathered
    from a sliding view; windows never cross doc boundaries; ``stride``
    subsamples windows deterministically."""
    n = len(starts) - 1
    lengths = np.diff(starts)

    win_counts = np.maximum((np.maximum(lengths - w, 0) // stride) + (lengths > 0), 0)
    win_counts[lengths == 0] = 0
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(win_counts, out=offsets[1:])
    total = int(offsets[-1])
    if total == 0:
        return np.empty(0, np.uint64), offsets

    # global start index of every window
    doc_of_win = np.repeat(np.arange(n), win_counts)
    rank_in_doc = np.arange(total) - offsets[doc_of_win]
    win_start = starts[doc_of_win] + rank_in_doc * stride

    # full windows (doc length ≥ w): row-gather from a zero-copy sliding
    # view — no per-element index matrix, no boundary masks (every window
    # starting inside a long-enough doc is fully in-doc by construction)
    rows = np.empty((total, w), dtype=np.uint8)
    full = lengths[doc_of_win] >= w
    if full.any():
        swv = np.lib.stride_tricks.sliding_window_view(flat, w)
        rows[full] = swv[win_start[full]]
    # short docs (< w bytes): single window over what exists, zero-padded
    short_wins = np.nonzero(~full)[0]
    if len(short_wins):
        rows[short_wins] = 0
        for j in short_wins:
            d = doc_of_win[j]
            ln = lengths[d]
            rows[j, :ln] = flat[starts[d] : starts[d] + ln]
    h1, _ = murmur3_x64_128_fixed(rows, seed)
    return (h1 >> np.uint64(1)), offsets


def _roll_and_hash(
    item_hashes: np.ndarray, offsets: np.ndarray, w: int, seed: int
) -> tuple[np.ndarray, np.ndarray]:
    """w-gram rolling windows over per-doc hash sequences → murmur of the
    8w-byte window. Short docs yield one zero-padded window."""
    n = len(offsets) - 1
    counts = np.diff(offsets)
    win_counts = np.where(counts == 0, 0, np.maximum(counts - w + 1, 1))
    out_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(win_counts, out=out_off[1:])
    total = int(out_off[-1])
    if total == 0:
        return np.empty(0, np.uint64), out_off

    doc_of_win = np.repeat(np.arange(n), win_counts)
    rank = np.arange(total) - out_off[doc_of_win]
    base = offsets[:-1][doc_of_win] + rank
    idx = base[:, None] + np.arange(w)
    end = offsets[1:][doc_of_win]
    over = idx >= end[:, None]
    idx = np.where(over, base[:, None], idx)
    vals = item_hashes[idx]
    vals[over] = 0
    rows = np.ascontiguousarray(vals, dtype="<u8").view(np.uint8).reshape(total, 8 * w)
    h1, _ = murmur3_x64_128_fixed(rows, seed)
    return (h1 >> np.uint64(1)), out_off


# ---------------------------------------------------------------------------
# Segmented signature reductions
# ---------------------------------------------------------------------------


_MH_BLOCK = 1 << 15  # shingles per cache block (2 × 256 KiB buffers ≈ L2)


def minhash_signatures(
    shingles: np.ndarray, offsets: np.ndarray, cfg: SigConfig
) -> np.ndarray:
    """Classic k-permutation MinHash, positionally aligned for LSH banding:
    lane i keeps min over shingles of fmix64(h ^ seed_i) — k independent
    1-minimum-value sketches (the k=1 corner of the reference's KMV loop).
    Returns (n_docs, num_perm) uint64; empty docs get all-MAX sentinel.

    Cache-blocked: the naive loop makes num_perm full DRAM passes over the
    shingle array (~num_perm × 8 B × n_shingles of traffic — at 32 parallel
    workers this saturates memory bandwidth and collapses scaling); instead
    we walk doc-aligned blocks that fit in L2 and run every lane over the
    resident block with in-place fmix arithmetic. Identical outputs."""
    n = len(offsets) - 1
    seeds = lane_seeds(cfg)
    out = np.full((n, cfg.num_perm), MAX_HASH, dtype=np.uint64)
    if len(shingles) == 0:
        return out

    counts = np.diff(offsets)
    mixed = np.empty(min(_MH_BLOCK * 2, len(shingles)), dtype=np.uint64)
    scratch = np.empty_like(mixed)
    one = np.uint64(1)
    c33 = np.uint64(33)
    m1 = np.uint64(0xFF51AFD7ED558CCD)
    m2 = np.uint64(0xC4CEB9FE1A85EC53)

    start_doc = 0
    while start_doc < n:
        # grow the block doc-by-doc up to _MH_BLOCK shingles (≥ 1 doc)
        end_doc = start_doc + 1
        span0 = offsets[start_doc]
        while end_doc < n and offsets[end_doc + 1] - span0 <= _MH_BLOCK:
            end_doc += 1
        seg = shingles[span0 : offsets[end_doc]]
        sub_counts = counts[start_doc:end_doc]
        sub_nonempty = sub_counts > 0
        red_off = (offsets[start_doc:end_doc] - span0)[sub_nonempty]
        rows = np.arange(start_doc, end_doc)[sub_nonempty]
        if len(seg):
            m = len(seg)
            if m > len(mixed):  # single doc larger than the block
                mixed = np.empty(m, dtype=np.uint64)
                scratch = np.empty_like(mixed)
            mx, sx = mixed[:m], scratch[:m]
            for i in range(cfg.num_perm):
                # in-place fmix64(seg ^ seed) >> 1 — two L2-resident buffers
                np.bitwise_xor(seg, seeds[i], out=mx)
                np.right_shift(mx, c33, out=sx)
                np.bitwise_xor(mx, sx, out=mx)
                np.multiply(mx, m1, out=mx)
                np.right_shift(mx, c33, out=sx)
                np.bitwise_xor(mx, sx, out=mx)
                np.multiply(mx, m2, out=mx)
                np.right_shift(mx, c33, out=sx)
                np.bitwise_xor(mx, sx, out=mx)
                np.right_shift(mx, one, out=mx)
                out[rows, i] = np.minimum.reduceat(mx, red_off)
        start_doc = end_doc
    return out


def kmv_signatures(
    shingles: np.ndarray, offsets: np.ndarray, k: int
) -> tuple[np.ndarray, list[np.ndarray]]:
    """Per-doc bottom-k KMV signature (theta + sorted k smallest distinct
    shingle hashes) — the verification-side sketch (reference theta compact,
    theta_sketch_impl.hpp:266-289).

    Per-doc ``np.partition`` bottom-(2k+2) + unique — the introselect idiom
    the reference uses for rebuild (theta_union_base_impl.hpp:73-78) —
    instead of a full batch lexsort (13× cheaper; the lexsort was ~20% of
    the whole signature kernel). Correctness: the (k+1)-th smallest
    DISTINCT value is within the smallest 2k+2 values unless those contain
    ≤ k distinct values — exactly the case the full-unique fallback
    handles.

    theta encoding for int64 Spark columns: -1 ⇔ MAX_THETA (exact mode),
    since 2^63 itself doesn't fit in a signed long."""
    n = len(offsets) - 1
    thetas = np.full(n, -1, dtype=np.int64)
    sigs: list[np.ndarray] = []
    head_n = 2 * (k + 1)
    for i in range(n):
        seg = shingles[offsets[i] : offsets[i + 1]]
        if len(seg) == 0:
            sigs.append(np.empty(0, np.uint64))
            continue
        if len(seg) > head_n:
            head = np.partition(seg, head_n - 1)[:head_n]
        else:
            head = seg
        u = np.unique(head)
        if len(u) <= k and len(head) < len(seg):
            u = np.unique(seg)  # duplicates ate the slack: exact fallback
        if len(u) > k:
            thetas[i] = int(u[k])
            u = u[:k]
        sigs.append(u)
    return thetas, sigs


def decode_theta(theta_enc: int) -> int:
    """int64 column value → true theta (−1 encodes MAX_THETA / exact)."""
    return MAX_THETA if theta_enc < 0 else int(theta_enc)


def simhash64(
    token_hashes: np.ndarray, offsets: np.ndarray, seed: int = DEFAULT_SEED
) -> np.ndarray:
    """64-bit SimHash per doc: per-bit ±1 majority over token hashes —
    the hash-bit-decomposition idiom of the reference's HLL coupons
    (HllUtil.hpp:133-146), used here for near-identical caption detection.
    Vectorized: unpack bits → segmented add → majority → pack."""
    n = len(offsets) - 1
    out = np.zeros(n, dtype=np.uint64)
    if len(token_hashes) == 0:
        return out
    th = _fmix64(token_hashes ^ np.uint64(seed))  # decorrelate from minhash
    bits = np.unpackbits(
        np.ascontiguousarray(th, dtype="<u8").view(np.uint8).reshape(-1, 8),
        axis=1,
        bitorder="little",
    )  # (total_tokens, 64), values 0/1
    counts = np.diff(offsets)
    nonempty = counts > 0
    red_off = offsets[:-1][nonempty]
    sums = np.add.reduceat(bits.astype(np.int64), red_off, axis=0)  # (m, 64)
    maj = (2 * sums) > counts[nonempty, None]
    packed = np.packbits(maj.astype(np.uint8), axis=1, bitorder="little")
    out[nonempty] = packed.view("<u8").ravel()
    return out


def band_hashes(sigs: np.ndarray, cfg: SigConfig) -> np.ndarray:
    """LSH banding (S4): reshape the (n, num_perm) MinHash matrix into
    (n, bands, rows) and murmur each band's 8*rows bytes → (n, bands)
    uint64 band keys. Grouping key downstream is (band_idx, band_hash)."""
    n, k = sigs.shape
    b, r = cfg.bands, cfg.rows_per_band
    assert b * r == k, "num_perm must equal bands * rows_per_band"
    rows = (
        np.ascontiguousarray(sigs, dtype="<u8")
        .view(np.uint8)
        .reshape(n * b, 8 * r)
    )
    h1, _ = murmur3_x64_128_fixed(rows, cfg.seed)
    return (h1 >> np.uint64(1)).reshape(n, b)


def phash_dihedral_min(phashes: np.ndarray) -> np.ndarray:
    """Canonicalize 64-bit block pHashes under the dihedral group D4
    (rotations by 0/90/180/270 plus mirrors): unpack each hash to its 8×8
    bit grid, apply all 8 grid transforms, re-pack, take the numeric
    minimum. Rotating or mirroring an IMAGE permutes its 8×8 block-mean
    grid by exactly the corresponding grid transform (block means commute
    with the transform for w, h multiples of 8), so the canonical hash of
    a rotated/mirrored copy equals the original's up to pixel noise —
    making the pHash lane rotation/mirror-invariant with zero change to
    banding or verification. Fully vectorized (one unpackbits, 8
    rot/flip views, one reduce); same packbits bit order as the corpus
    pHash (sources/images.phash64_batch, little-endian)."""
    return phash_dihedral_orbit(phashes).min(axis=1)


def phash_dihedral_orbit(phashes: np.ndarray) -> np.ndarray:
    """(m,) uint64 pHashes → (m, 8) uint64: the full D4 orbit of each
    hash's 8×8 bit grid (4 rotations × optional mirror), packed in the
    corpus bit order. The noise-ROBUST rotation-invariant blocking path
    bands ALL 8 orbit hashes rather than the numeric minimum: a min-of-
    orbit canonical form can jump to a different orbit element when pixel
    noise flips a high-order bit (observed: two near-twins 29 bits apart
    after canonicalization but 1 bit apart under the aligning transform),
    whereas orbit banding guarantees the aligned pair meets in a band
    whenever ANY transform brings the two hashes within the lane's
    hamming radius."""
    ph = np.ascontiguousarray(np.asarray(phashes).view(np.uint64))
    m = len(ph)
    if m == 0:
        return ph.reshape(0, 1).repeat(8, axis=1)
    bits = np.unpackbits(
        ph.view(np.uint8).reshape(m, 8), axis=1, bitorder="little"
    ).reshape(m, 8, 8)
    cands = []
    for k in range(4):
        r = np.rot90(bits, k, axes=(1, 2))
        for t in (r, r[:, :, ::-1]):
            cands.append(
                np.packbits(
                    np.ascontiguousarray(t).reshape(m, 64),
                    axis=1,
                    bitorder="little",
                )
                .view("<u8")
                .ravel()
            )
    return np.stack(cands, axis=1)


def gray_sum_batch(pixels: np.ndarray, w: int, h: int) -> np.ndarray:
    """(m, 3*w*h) uint8 RGB → (m, h, w) int64 channel-SUM grayscale.

    Sum (not mean) keeps the arithmetic integer-exact through the
    integral-image path in ``phash64_box_batch`` — and scaling every
    value by 3 changes neither block-mean vs median comparisons nor
    border-color deviation tests, so the hashes and boxes are identical
    to what the corpus mean-gray would give."""
    m = pixels.shape[0]
    return pixels.reshape(m, h, w, 3).sum(axis=3, dtype=np.int64)


def content_boxes(gray: np.ndarray, tol: float = 3.0) -> np.ndarray:
    """Vectorized autocrop: (m, h, w) channel-sum grayscale → (m, 4) int64
    boxes (y0, y1, x0, x1) bounding each image's CONTENT after trimming
    uniform borders (letterbox bars, pillarbox padding, solid margins).

    Semantics follow the classic border-trim (ImageMagick ``-trim``): a
    row/column is padding iff every pixel in it is within ``tol``
    (per-channel 0-255 units) of the nearest corner's color; trimming is
    contiguous from each edge inward, so a uniform region INSIDE the
    content (sky, walls) is never cut. Top/left trim against the
    top-left corner color, bottom/right against the bottom-right — the
    common letterbox/pillarbox/pad cases have one bar color, mixed-color
    bars still trim per-edge. Degenerate guards: an all-uniform image,
    or a trim that leaves less than an 8×8 content box, falls back to
    the full frame (the plain corpus pHash). One pass, no Python loop:
    two broadcast |g - corner| deviations, four argmax scans."""
    m, h, w = gray.shape
    t3 = 3.0 * float(tol)  # channel-sum units
    d_tl = np.abs(gray - gray[:, :1, :1])  # (m, h, w) deviation vs top-left
    d_br = np.abs(gray - gray[:, -1:, -1:])
    row_act_tl = d_tl.max(axis=2) > t3  # (m, h) row has content vs TL color
    row_act_br = d_br.max(axis=2) > t3
    col_act_tl = d_tl.max(axis=1) > t3  # (m, w)
    col_act_br = d_br.max(axis=1) > t3
    y0 = row_act_tl.argmax(axis=1).astype(np.int64)
    y1 = (h - row_act_br[:, ::-1].argmax(axis=1)).astype(np.int64)
    x0 = col_act_tl.argmax(axis=1).astype(np.int64)
    x1 = (w - col_act_br[:, ::-1].argmax(axis=1)).astype(np.int64)
    bad = (
        ~row_act_tl.any(axis=1)
        | ~row_act_br.any(axis=1)
        | ~col_act_tl.any(axis=1)
        | ~col_act_br.any(axis=1)
        | ((y1 - y0) < 8)
        | ((x1 - x0) < 8)
    )
    y0[bad] = 0
    y1[bad] = h
    x0[bad] = 0
    x1[bad] = w
    return np.stack([y0, y1, x0, x1], axis=1)


def phash64_box_batch(gray: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    """(m, h, w) channel-sum grayscale + (m, 4) boxes → (m,) uint64: the
    corpus block-mean pHash (sources/images.phash64_batch bit law: 8×8
    block means, bit i set iff block i's mean > the 64-block median,
    little-endian packbits) computed over each image's box.

    Varying per-image boxes stay fully vectorized through ONE shared
    integral image: block boundaries are the 9 evenly-spaced integer
    cuts of each box, block sums come from a fancy-indexed (m, 9, 9)
    gather + 2D difference, means divide by the per-block area. Integer
    channel-sum input keeps every cumsum/difference exact (≤ 2^53), so
    for a full-frame box with h, w multiples of 8 the result is
    bit-identical to phash64_batch."""
    m, h, w = gray.shape
    S = np.zeros((m, h + 1, w + 1), dtype=np.float64)
    S[:, 1:, 1:] = gray.cumsum(axis=1).cumsum(axis=2)
    y0, y1, x0, x1 = (boxes[:, i].astype(np.int64) for i in range(4))
    i9 = np.arange(9, dtype=np.int64)
    ry = y0[:, None] + (i9[None, :] * (y1 - y0)[:, None]) // 8  # (m, 9)
    rx = x0[:, None] + (i9[None, :] * (x1 - x0)[:, None]) // 8
    G = S[np.arange(m)[:, None, None], ry[:, :, None], rx[:, None, :]]
    sums = G[:, 1:, 1:] - G[:, :-1, 1:] - G[:, 1:, :-1] + G[:, :-1, :-1]
    hh = (ry[:, 1:] - ry[:, :-1])[:, :, None].astype(np.float64)
    ww = (rx[:, 1:] - rx[:, :-1])[:, None, :].astype(np.float64)
    flat = (sums / (hh * ww)).reshape(m, 64)
    med = np.median(flat, axis=1, keepdims=True)
    bits = (flat > med).astype(np.uint8)
    return np.packbits(bits, axis=1, bitorder="little").view("<u8").ravel()


def phash_band_hashes(phashes: np.ndarray, num_bands: int = 8) -> np.ndarray:
    """Multi-index blocking for 64-bit pHash: split into ``num_bands``
    equal bit-slices; two hashes within hamming distance < num_bands share
    at least one identical slice (pigeonhole) → guaranteed candidate
    recall for hamming ≤ num_bands - 1."""
    assert 64 % num_bands == 0
    width = 64 // num_bands
    ph = np.asarray(phashes, dtype=np.uint64)
    out = np.empty((len(ph), num_bands), dtype=np.uint64)
    mask = np.uint64((1 << width) - 1)
    for i in range(num_bands):
        out[:, i] = (ph >> np.uint64(i * width)) & mask
    return out


def phash_slice_combo_hashes(
    phashes: np.ndarray, num_slices: int = 8, combo: int = 3
) -> np.ndarray:
    """Slice-COMBO multi-index blocking: the 64-bit pHash splits into
    ``num_slices`` equal slices; every ``combo``-subset of slices forms one
    band whose key packs those slice values. Pigeonhole: hamming ≤
    num_slices - combo dirties at most that many slices, leaving ≥ combo
    clean slices whose combo-band matches → guaranteed candidate recall at
    radius num_slices - combo, with per-band random-collision probability
    2^-(combo·width). C(num_slices, combo) bands."""
    from itertools import combinations

    assert 64 % num_slices == 0 and 1 <= combo <= num_slices
    width = 64 // num_slices
    ph = np.asarray(phashes, dtype=np.uint64)
    mask = np.uint64((1 << width) - 1)
    slices = [
        (ph >> np.uint64(i * width)) & mask for i in range(num_slices)
    ]
    cols = []
    for comb in combinations(range(num_slices), combo):
        key = slices[comb[0]].copy()
        for j, c in enumerate(comb[1:], start=1):
            key |= slices[c] << np.uint64(j * width)
        cols.append(key)
    return np.stack(cols, axis=1)


def phash_slice_pair_hashes(phashes: np.ndarray, num_slices: int = 8) -> np.ndarray:
    """Slice-PAIR blocking (combo=2 special case); kept for the radius-6
    tier on smaller corpora."""
    return phash_slice_combo_hashes(phashes, num_slices, combo=2)


_POPCOUNT_TABLE = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized popcount of XOR for uint64 arrays (byte-table lookup)."""
    x = np.asarray(a, np.uint64) ^ np.asarray(b, np.uint64)
    cnt = np.zeros(x.shape, dtype=np.int64)
    for _ in range(8):
        cnt += _POPCOUNT_TABLE[(x & np.uint64(0xFF)).astype(np.intp)]
        x = x >> np.uint64(8)
    return cnt


def minhash_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> np.ndarray:
    """Lane-agreement Jaccard estimate for aligned MinHash matrices
    (n, k) × (n, k) → (n,) — the batched S7 verification kernel."""
    return (sig_a == sig_b).mean(axis=1)


def dhash64_batch(gray: np.ndarray) -> np.ndarray:
    """(m, h, w) grayscale (channel-sum ints from gray_sum_batch) →
    (m,) uint64 difference hashes: 8×9 grid of block means (integral
    image, same machinery as phash64_box_batch), bit (r, c) set iff
    mean[r, c+1] > mean[r, c] — the classic dHash gradient-sign hash.

    The signal is complementary to the block-mean pHash: any edit that
    adds a CONSTANT PER PIXEL ROW (smooth vertical lighting ramp,
    vignette band, scanline gain) shifts every column's mean within a
    row band by the same amount, so all 64 horizontal comparisons — and
    the hash — are preserved EXACTLY (integer sums stay exact in
    float64 below 2^53), while the pHash's block-vs-median bits flip
    with the band offsets. tests/test_imagededup pins both laws.
    Requires h ≥ 8, w ≥ 9."""
    m, h, w = gray.shape
    if h < 8 or w < 9:
        raise ValueError(f"dhash64 needs h >= 8 and w >= 9, got {h}x{w}")
    S = np.zeros((m, h + 1, w + 1), dtype=np.float64)
    S[:, 1:, 1:] = gray.cumsum(axis=1).cumsum(axis=2)
    ry = (np.arange(9, dtype=np.int64) * h) // 8
    rx = (np.arange(10, dtype=np.int64) * w) // 9
    G = S[:, ry][:, :, rx]                                    # (m, 9, 10)
    sums = G[:, 1:, 1:] - G[:, :-1, 1:] - G[:, 1:, :-1] + G[:, :-1, :-1]
    hh = (ry[1:] - ry[:-1])[None, :, None].astype(np.float64)
    ww = (rx[1:] - rx[:-1])[None, None, :].astype(np.float64)
    means = sums / (hh * ww)                                  # (m, 8, 9)
    bits = np.ascontiguousarray(
        (means[:, :, 1:] > means[:, :, :-1]).astype(np.uint8).reshape(m, 64)
    )
    return np.packbits(bits, axis=1, bitorder="little").view("<u8").ravel()
