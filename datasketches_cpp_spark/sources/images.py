"""Deterministic synthetic image+caption corpus (FIXTURES.md F1/F2).

Generates the exact `input_hint` table shape from BASELINE.json:
    (image_id string, bytes binary, w int, h int, fmt string,
     caption string, phash long)
plus a ground-truth frame (image_id, dup_group, dup_kind, overlap) for
recall measurement. Everything is seeded numpy — no external data, no image
libraries. "Decode" for fmt='raw' is identity; for lossy formats the decode
step is STUBBED (see decode_image) while the pixel buffers are generated so
the PSNR ≥ 40 dB invariant holds by construction (near-dup noise amplitude
±2/255 ⇒ PSNR ≈ 42-48 dB).

The pHash surrogate is a real perceptual-hash-shaped function (8×8 block
means vs their median → 64 bits) computed from the pixel buffer — so
near-pixel duplicates genuinely land within small hamming distance, and the
pHash lane of the pipeline is exercised honestly.

Dup mix (FIXTURES.md F2): ~70% unique, ~10% exact, ~10% near_pixel,
~7% near_caption, ~3% substring, plus one hot group (~1% of rows, the skew
fixture) and one long transitive caption chain (stresses CC depth).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

VOCAB_SIZE = 10_000
_SIZES = (32, 64)  # keep pixel buffers small: 3*64*64 = 12 KiB max


def phash64(pixels: np.ndarray, w: int, h: int) -> int:
    """Perceptual-hash surrogate: grayscale → 8×8 block means → bit i set
    iff block mean > median. Deterministic, locality-preserving under small
    pixel noise (the property the pipeline's phash lane needs)."""
    gray = pixels.reshape(h, w, 3).mean(axis=2)
    bh, bw = h // 8, w // 8
    blocks = gray[: bh * 8, : bw * 8].reshape(8, bh, 8, bw).mean(axis=(1, 3))
    med = np.median(blocks)
    bits = (blocks > med).ravel()
    return int(np.packbits(bits.astype(np.uint8), bitorder="little").view("<u8")[0])


def _caption(rng: np.random.Generator, n_tokens: int) -> str:
    toks = rng.integers(0, VOCAB_SIZE, size=n_tokens)
    return " ".join(f"w{t:05d}" for t in toks)


def generate_images(
    n: int,
    seed: int = 42,
    hot_group_frac: float = 0.01,
    chain_len: int = 24,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Returns (images_pdf, truth_pdf).

    images_pdf columns: image_id, bytes, w, h, fmt, caption, phash
    truth_pdf columns:  image_id, dup_group, dup_kind, overlap
    """
    rng = np.random.default_rng(seed)
    rows = []
    truth = []
    gid = 0
    i = 0

    def emit(image_id, pixels, w, h, caption, group, kind, overlap):
        rows.append(
            {
                "image_id": image_id,
                "bytes": pixels.tobytes(),
                "w": int(w),
                "h": int(h),
                "fmt": "raw",
                "caption": caption,
                "phash": np.int64(np.uint64(phash64(pixels, w, h))),
            }
        )
        truth.append(
            {
                "image_id": image_id,
                "dup_group": group,
                "dup_kind": kind,
                "overlap": overlap,
            }
        )

    # hot group: identical caption + identical pixels (the skew fixture)
    n_hot = max(2, int(n * hot_group_frac))
    w = h = 32
    hot_pixels = rng.integers(0, 256, size=3 * w * h, dtype=np.uint8)
    hot_caption = _caption(rng, 12)
    for j in range(n_hot):
        emit(f"img{i:09d}", hot_pixels, w, h, hot_caption, gid, "exact", 1.0)
        i += 1
    gid += 1

    # transitive caption chain: each caption shares ~90% tokens with the
    # previous one (pairwise near-dups, ends unrelated)
    chain_tokens = [f"w{t:05d}" for t in rng.integers(0, VOCAB_SIZE, size=40)]
    for j in range(min(chain_len, max(0, n - i))):
        pixels = rng.integers(0, 256, size=3 * w * h, dtype=np.uint8)
        pos = rng.integers(0, 40, size=3)
        for p in pos:
            chain_tokens[p] = f"w{rng.integers(0, VOCAB_SIZE):05d}"
        emit(f"img{i:09d}", pixels, w, h, " ".join(chain_tokens), gid, "near_caption", 0.8)
        i += 1
    gid += 1

    # main mix
    while i < n:
        w = h = int(rng.choice(_SIZES))
        pixels = rng.integers(0, 256, size=3 * w * h, dtype=np.uint8)
        r = rng.random()
        # near_caption groups need captions long enough that a ≤2-token
        # edit keeps shingle-set overlap ≈ 0.9 (FIXTURES.md F2) — a 2-token
        # edit in a 6-token caption is not a near-dup by any measure
        if 0.20 <= r < 0.27:
            caption = _caption(rng, int(rng.integers(16, 41)))
        else:
            caption = _caption(rng, int(rng.integers(5, 41)))
        emit(f"img{i:09d}", pixels, w, h, caption, gid, "unique", 1.0)
        i += 1
        if i >= n:
            break
        if r < 0.10:  # exact duplicate
            emit(f"img{i:09d}", pixels, w, h, caption, gid, "exact", 1.0)
            i += 1
        elif r < 0.20:  # near_pixel: ±2 noise → PSNR ≈ 42-48 dB
            noise = rng.integers(-2, 3, size=pixels.shape).astype(np.int16)
            noisy = np.clip(pixels.astype(np.int16) + noise, 0, 255).astype(np.uint8)
            emit(f"img{i:09d}", noisy, w, h, caption, gid, "near_pixel", 1.0)
            i += 1
        elif r < 0.27:  # near_caption: ≤2 token edits (1 for shorter texts)
            toks = caption.split()
            n_edits = 1 if len(toks) < 28 else 2
            for p in rng.integers(0, len(toks), size=n_edits):
                toks[p] = f"w{rng.integers(0, VOCAB_SIZE):05d}"
            pixels2 = rng.integers(0, 256, size=3 * w * h, dtype=np.uint8)
            emit(f"img{i:09d}", pixels2, w, h, " ".join(toks), gid, "near_caption", 0.9)
            i += 1
        elif r < 0.30:  # substring: caption contained in a longer caption
            longer = caption + " " + _caption(rng, 8)
            pixels2 = rng.integers(0, 256, size=3 * w * h, dtype=np.uint8)
            emit(f"img{i:09d}", pixels2, w, h, longer, gid, "substring", 0.8)
            i += 1
        gid += 1

    return pd.DataFrame(rows), pd.DataFrame(truth)


def decode_image(buf: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    """Decode to an (h*w*3,) uint8 pixel array. fmt='raw' is identity;
    compressed formats are a STUB in this container (no image libs baked
    in) — the Spark-side plumbing (binary column, typed metadata, batch
    UDF shape) is real and tested with raw buffers."""
    if fmt == "raw":
        return np.frombuffer(buf, dtype=np.uint8)
    raise NotImplementedError(
        f"decode for fmt={fmt!r} requires an image codec not present in "
        "this environment; only fmt='raw' is supported here"
    )


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio between two uint8 pixel buffers — the
    input_hint per-row invariant (PSNR ≥ 40 dB for lossy round-trips)."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 20.0 * np.log10(255.0) - 10.0 * np.log10(mse)


def write_images_parquet(path: str, n: int, seed: int = 42) -> tuple[str, str]:
    """Materialize images + truth as parquet (for bench / entry usage)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    images, truth = generate_images(n, seed=seed)
    img_path = f"{path}/images.parquet"
    truth_path = f"{path}/images_truth.parquet"
    # small row groups (~25 MB of pixel payload) so Spark's scan can split
    # one file across many tasks — a single default-size row group would
    # force the whole corpus into ONE partition and serialize the pipeline
    pq.write_table(
        pa.Table.from_pandas(images, preserve_index=False), img_path,
        row_group_size=2048,
    )
    pq.write_table(
        pa.Table.from_pandas(truth, preserve_index=False), truth_path,
        row_group_size=65536,
    )
    return img_path, truth_path
