"""Deterministic synthetic image+caption corpus (FIXTURES.md F1/F2).

Generates the exact `input_hint` table shape from BASELINE.json:
    (image_id string, bytes binary, w int, h int, fmt string,
     caption string, phash long)
plus a ground-truth frame (image_id, dup_group, dup_kind, overlap) for
recall measurement. Everything is seeded numpy — no external data, no image
libraries. fmt='raw' decode is identity; 'png'/'ppm'/'bmp' corpora
(``fmt=`` parameter, or 'mixed' for a per-id rotation) encode and decode
through the pure-numpy codecs in operators/imagecodec.py — all lossless,
so the PSNR ≥ 40 dB decode invariant holds exactly (PSNR = ∞); the
near-dup noise amplitude ±2/255 keeps near-pixel pairs at ≈ 42-48 dB.

The pHash surrogate is a real perceptual-hash-shaped function (8×8 block
means vs their median → 64 bits) computed from the pixel buffer — so
near-pixel duplicates genuinely land within small hamming distance, and the
pHash lane of the pipeline is exercised honestly.

Dup mix (FIXTURES.md F2): ~70% unique, ~10% exact, ~10% near_pixel,
~7% near_caption, ~3% substring, plus one hot group (~1% of rows, the skew
fixture) and one long transitive caption chain (stresses CC depth).

Generation is block-vectorized (all same-size pixel buffers in one RNG
draw, batched pHash, array-gathered captions) and chunk-streamed, so a
million-image bench corpus materializes in minutes and never holds more
than one chunk in memory. Determinism contract: (n, seed, chunk_size)
fully determine the corpus; the default chunk_size is part of that
contract.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

VOCAB_SIZE = 10_000
_SIZES = (32, 64)  # keep pixel buffers small: 3*64*64 = 12 KiB max
_VOCAB = np.array([f"w{i:05d}" for i in range(VOCAB_SIZE)])
DEFAULT_CHUNK = 50_000


def phash64(pixels: np.ndarray, w: int, h: int) -> int:
    """Perceptual-hash surrogate: grayscale → 8×8 block means → bit i set
    iff block mean > median. Deterministic, locality-preserving under small
    pixel noise (the property the pipeline's phash lane needs)."""
    return int(phash64_batch(pixels.reshape(1, -1), w, h)[0])


def phash64_batch(pixels: np.ndarray, w: int, h: int) -> np.ndarray:
    """(m, 3*w*h) uint8 → (m,) uint64 pHashes, fully vectorized."""
    m = pixels.shape[0]
    gray = pixels.reshape(m, h, w, 3).mean(axis=3)
    bh, bw = h // 8, w // 8
    blocks = gray[:, : bh * 8, : bw * 8].reshape(m, 8, bh, 8, bw).mean(axis=(2, 4))
    flat = blocks.reshape(m, 64)
    med = np.median(flat, axis=1, keepdims=True)
    bits = (flat > med).astype(np.uint8)
    return np.packbits(bits, axis=1, bitorder="little").view("<u8").ravel()


def _captions(rng: np.random.Generator, lengths: np.ndarray) -> list[str]:
    """One caption per requested token length — single RNG draw, vocab
    gather, per-row join."""
    if len(lengths) == 0:
        return []
    mx = int(lengths.max())
    toks = rng.integers(0, VOCAB_SIZE, size=(len(lengths), mx))
    words = _VOCAB[toks]
    return [" ".join(words[i, : lengths[i]]) for i in range(len(lengths))]


def _emit_block(
    rows: list, truth: list, ids: np.ndarray, pixels: np.ndarray,
    w: int, h: int, captions: list[str], groups: np.ndarray,
    kinds: list[str], overlaps: np.ndarray, fmt: str = "raw",
) -> None:
    """``fmt``: 'raw' (default — the golden-checksum corpus), a codec name
    ('png'/'ppm'/'bmp'/'dct' — the last is lossy, PSNR ≥ 44.6 dB), or
    'mixed' (deterministic per-id rotation across the LOSSLESS formats —
    exercises grouped decode paths while keeping decode-identity with the
    raw corpus)."""
    ph = phash64_batch(pixels, w, h).astype(np.int64)
    if fmt != "raw":
        from ..operators.imagecodec import LOSSLESS_FORMATS, encode
    for j in range(len(ids)):
        if fmt == "raw":
            f_j, payload = "raw", pixels[j].tobytes()
        else:
            f_j = (
                LOSSLESS_FORMATS[int(ids[j]) % len(LOSSLESS_FORMATS)]
                if fmt == "mixed"
                else fmt
            )
            payload = encode(pixels[j], w, h, f_j)
        rows.append(
            {
                "image_id": f"img{ids[j]:09d}",
                "bytes": payload,
                "w": w, "h": h, "fmt": f_j,
                "caption": captions[j],
                "phash": ph[j],
            }
        )
        truth.append(
            {
                "image_id": f"img{ids[j]:09d}",
                "dup_group": int(groups[j]),
                "dup_kind": kinds[j],
                "overlap": float(overlaps[j]),
            }
        )


def iter_image_chunks(
    n: int,
    seed: int = 42,
    hot_group_frac: float = 0.01,
    chain_len: int = 24,
    chunk_size: int = DEFAULT_CHUNK,
    fmt: str = "raw",
):
    """Yields (images_pdf, truth_pdf) chunks. One RNG drives everything;
    chunk boundaries align to dup-group boundaries so no pair straddles."""
    rng = np.random.default_rng(seed)
    next_id = 0
    next_gid = 0

    # ---- chunk 0 prologue: hot group + transitive caption chain ----------
    rows: list = []
    truth: list = []
    # n >= 2: a 2-member hot group; n == 1: a single row (never emit MORE
    # rows than n — "(n, seed, chunk_size) fully determine the corpus"
    # includes its size). n >= 2 corpora are unchanged (checksum-stable).
    n_hot = min(n, max(2, int(n * hot_group_frac)))
    w = h = 32
    hot_pixels = rng.integers(0, 256, size=3 * w * h, dtype=np.uint8)
    hot_caption = " ".join(_VOCAB[rng.integers(0, VOCAB_SIZE, size=12)])
    hp = np.broadcast_to(hot_pixels, (n_hot, hot_pixels.size)).copy()
    _emit_block(
        rows, truth, np.arange(next_id, next_id + n_hot), hp, w, h,
        [hot_caption] * n_hot, np.full(n_hot, next_gid), ["exact"] * n_hot,
        np.ones(n_hot), fmt,
    )
    next_id += n_hot
    next_gid += 1

    m_chain = min(chain_len, max(0, n - next_id))
    if m_chain:
        chain_tokens = list(_VOCAB[rng.integers(0, VOCAB_SIZE, size=40)])
        caps = []
        for _ in range(m_chain):
            pos = rng.integers(0, 40, size=3)
            for p in pos:
                chain_tokens[p] = _VOCAB[rng.integers(0, VOCAB_SIZE)]
            caps.append(" ".join(chain_tokens))
        px = rng.integers(0, 256, size=(m_chain, 3 * w * h), dtype=np.uint8)
        _emit_block(
            rows, truth, np.arange(next_id, next_id + m_chain), px, w, h,
            caps, np.full(m_chain, next_gid), ["near_caption"] * m_chain,
            np.full(m_chain, 0.8), fmt,
        )
        next_id += m_chain
        next_gid += 1

    # ---- main mix, chunked ------------------------------------------------
    while next_id < n:
        budget = min(chunk_size, n - next_id)
        # draw groups until the chunk budget is filled: group kind by r,
        # second member present for dup kinds (clipped at the corpus end)
        n_groups_est = budget  # upper bound; trim below
        r = rng.random(n_groups_est)
        # kind per group: [0,.10) exact, [.10,.20) near_pixel,
        # [.20,.27) near_caption, [.27,.30) substring, else unique
        kind_code = np.select(
            [r < 0.10, r < 0.20, r < 0.27, r < 0.30],
            [1, 2, 3, 4],
            default=0,
        )
        sizes = np.where(kind_code > 0, 2, 1)
        csum = np.cumsum(sizes)
        n_groups = int(np.searchsorted(csum, budget, side="left") + 1)
        n_groups = min(n_groups, n_groups_est)
        kind_code = kind_code[:n_groups]
        sizes = sizes[:n_groups]
        total = int(sizes.sum())
        if next_id + total > n:  # clip the final pair
            sizes[-1] = 1
            kind_code[-1] = 0
            total = int(sizes.sum())

        # per-group draws (order-stable regardless of kind)
        img_size = np.asarray(_SIZES)[rng.integers(0, len(_SIZES), size=n_groups)]
        cap_lens = np.where(
            kind_code == 3,
            rng.integers(16, 41, size=n_groups),
            rng.integers(5, 41, size=n_groups),
        )
        captions = _captions(rng, cap_lens)

        gids = next_gid + np.arange(n_groups)
        next_gid += n_groups
        # consecutive ids; group g's first member sits at first_pos[g],
        # its dup (if any) at first_pos[g] + 1
        first_pos = np.cumsum(sizes) - sizes
        ids = next_id + np.arange(total)
        next_id += total

        # materialize per pixel-size block, preserving one RNG draw order:
        # pixels for member-1 of every group (by size class), then dup
        # members derived
        for sz in _SIZES:
            sel = np.nonzero(img_size == sz)[0]
            if len(sel) == 0:
                continue
            wh = 3 * sz * sz
            base_px = rng.integers(0, 256, size=(len(sel), wh), dtype=np.uint8)
            # second-member pixels where needed
            kc = kind_code[sel]
            idx_first = first_pos[sel]
            _emit_block(
                rows, truth, ids[idx_first], base_px, sz, sz,
                [captions[g] for g in sel], gids[sel],
                ["unique"] * len(sel), np.ones(len(sel)), fmt,
            )
            has_second = kc > 0
            if not has_second.any():
                continue
            sel2 = sel[has_second]
            kc2 = kc[has_second]
            bpx = base_px[has_second]
            second_px = np.empty_like(bpx)
            # exact: copy
            second_px[kc2 == 1] = bpx[kc2 == 1]
            # near_pixel: ±2 noise
            npix = kc2 == 2
            if npix.any():
                noise = rng.integers(-2, 3, size=bpx[npix].shape).astype(np.int16)
                second_px[npix] = np.clip(
                    bpx[npix].astype(np.int16) + noise, 0, 255
                ).astype(np.uint8)
            # near_caption / substring: fresh pixels
            fresh = kc2 >= 3
            if fresh.any():
                second_px[fresh] = rng.integers(
                    0, 256, size=second_px[fresh].shape, dtype=np.uint8
                )
            # second-member captions
            caps2 = []
            kinds2 = []
            overlaps2 = np.empty(len(sel2))
            for t, g in enumerate(sel2):
                k = kc2[t]
                base_cap = captions[g]
                if k == 1:
                    caps2.append(base_cap)
                    kinds2.append("exact")
                    overlaps2[t] = 1.0
                elif k == 2:
                    caps2.append(base_cap)
                    kinds2.append("near_pixel")
                    overlaps2[t] = 1.0
                elif k == 3:
                    toks = base_cap.split()
                    n_edits = 1 if len(toks) < 28 else 2
                    for p in rng.integers(0, len(toks), size=n_edits):
                        toks[p] = _VOCAB[rng.integers(0, VOCAB_SIZE)]
                    caps2.append(" ".join(toks))
                    kinds2.append("near_caption")
                    overlaps2[t] = 0.9
                else:
                    extra = " ".join(_VOCAB[rng.integers(0, VOCAB_SIZE, size=8)])
                    caps2.append(base_cap + " " + extra)
                    kinds2.append("substring")
                    overlaps2[t] = 0.8
            _emit_block(
                rows, truth, ids[idx_first[has_second] + 1], second_px, sz, sz,
                caps2, gids[sel2], kinds2, overlaps2, fmt,
            )

        images_pdf = pd.DataFrame(rows).sort_values("image_id", ignore_index=True)
        truth_pdf = pd.DataFrame(truth).sort_values("image_id", ignore_index=True)
        rows, truth = [], []
        yield images_pdf, truth_pdf

    if rows:  # tiny corpora: prologue only
        yield (
            pd.DataFrame(rows).sort_values("image_id", ignore_index=True),
            pd.DataFrame(truth).sort_values("image_id", ignore_index=True),
        )


def generate_images(
    n: int,
    seed: int = 42,
    hot_group_frac: float = 0.01,
    chain_len: int = 24,
    fmt: str = "raw",
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Returns (images_pdf, truth_pdf) — concatenation of all chunks."""
    imgs, truths = [], []
    for i, t in iter_image_chunks(n, seed, hot_group_frac, chain_len, fmt=fmt):
        imgs.append(i)
        truths.append(t)
    return (
        pd.concat(imgs, ignore_index=True),
        pd.concat(truths, ignore_index=True),
    )


def decode_image(buf: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    """Decode to an (h*w*3,) uint8 pixel array.  fmt='raw' is identity;
    'png' / 'ppm' / 'bmp' decode through the pure-numpy codecs in
    operators/imagecodec.py (stdlib zlib only — no image libraries
    needed).  Other formats raise ImageCodecError."""
    if fmt == "raw":
        return np.frombuffer(buf, dtype=np.uint8)
    from ..operators.imagecodec import decode

    return decode(buf, w, h, fmt)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio between two uint8 pixel buffers — the
    input_hint per-row invariant (PSNR ≥ 40 dB for lossy round-trips)."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 20.0 * np.log10(255.0) - 10.0 * np.log10(mse)


def write_images_parquet(
    path: str, n: int, seed: int = 42, fmt: str = "raw"
) -> tuple[str, str]:
    """Materialize images + truth as parquet, streaming one chunk at a
    time (a 10^6-image corpus never lives in memory whole). Small row
    groups (~25 MB of pixels) keep the file splittable across many scan
    tasks."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    img_path = f"{path}/images.parquet"
    truth_path = f"{path}/images_truth.parquet"
    iw = tw = None
    try:
        for images, truth in iter_image_chunks(n, seed=seed, fmt=fmt):
            it = pa.Table.from_pandas(images, preserve_index=False)
            tt = pa.Table.from_pandas(truth, preserve_index=False)
            if iw is None:
                iw = pq.ParquetWriter(img_path, it.schema)
                tw = pq.ParquetWriter(truth_path, tt.schema)
            iw.write_table(it, row_group_size=2048)
            tw.write_table(tt, row_group_size=65536)
    finally:
        if iw is not None:
            iw.close()
        if tw is not None:
            tw.close()
    return img_path, truth_path
