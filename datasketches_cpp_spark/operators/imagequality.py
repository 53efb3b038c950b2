"""Image quality heuristics for training-corpus curation.

The text side of the engine carries the standard quality filters
(C4 heuristics, repetition ratios, language ID — operators/curation.py,
textstats.py); this is the image-axis counterpart. Per image, from the
decoded pixels:

* ``laplacian_var`` — variance of the 4-neighbor Laplacian of the
  grayscale plane; the classic blur detector (low variance = no edges =
  blurry or out-of-focus). Computed with shifted-array arithmetic, fully
  vectorized across the batch.
* ``entropy_bits`` — Shannon entropy of the 256-bin grayscale histogram;
  near-zero for synthetic/solid images, ~8 for dense natural texture.
* ``edge_density`` — fraction of pixels whose Laplacian magnitude
  exceeds a fixed step (16 levels); separates flat posters from photos.
* ``solid_frac`` — fraction of pixels equal to the modal gray value;
  catches single-color placeholders and letterboxed padding.
* ``is_low_information`` — the composite curation flag:
  entropy < 1 bit OR solid_frac > 0.9.

All of it is one narrow ``mapInPandas`` over (id, bytes, w, h, fmt) —
per-batch numpy over uniform-shape groups, no shuffle, no Python per
pixel; at 100 TB the cost is the decode it shares with every other
pixel-touching stage.

Reference analog: none (sketch library); extends the engine's curation
family along the image payload axis.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .multimodal import _decode_block, _shape_groups

_QUALITY_SCHEMA = (
    "id string, laplacian_var double, entropy_bits double, "
    "edge_density double, solid_frac double, is_low_information boolean"
)


def _gray(px: np.ndarray, h: int, w: int) -> np.ndarray:
    """(m, h*w*3) uint8 RGB → (m, h, w) float32 luma (Rec.601 weights)."""
    rgb = px.reshape(px.shape[0], h, w, 3).astype(np.float32)
    return rgb[..., 0] * 0.299 + rgb[..., 1] * 0.587 + rgb[..., 2] * 0.114


def _laplacian(g: np.ndarray) -> np.ndarray:
    """4-neighbor Laplacian over the interior, batched: (m, h-2, w-2)."""
    return (
        g[:, :-2, 1:-1] + g[:, 2:, 1:-1] + g[:, 1:-1, :-2] + g[:, 1:-1, 2:]
        - 4.0 * g[:, 1:-1, 1:-1]
    )


def image_quality_stats(
    images: DataFrame,
    id_col: str = "image_id",
    entropy_floor_bits: float = 1.0,
    solid_frac_ceiling: float = 0.9,
) -> DataFrame:
    """Per-image quality heuristics (see module docstring) as one narrow
    map; the thresholds behind ``is_low_information`` are exposed so a
    pipeline can tighten them per corpus."""
    cols = [id_col, "bytes", "w", "h", "fmt"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            for idx, w, h, fmt in _shape_groups(pdf):
                px = _decode_block(pdf["bytes"].iloc[idx].tolist(), w, h, fmt)
                m = px.shape[0]
                g = _gray(px, h, w)
                if h < 3 or w < 3:
                    # no Laplacian interior: a 1x1/2x2 placeholder has no
                    # measurable structure — report zero variance and
                    # edge density (maximally blurry/featureless), never
                    # NaN from empty-axis reductions
                    lap_var = np.zeros(m, np.float64)
                    edge_density = np.zeros(m, np.float64)
                else:
                    lap = _laplacian(g)
                    lap_var = lap.var(axis=(1, 2))
                    edge_density = (np.abs(lap) > 16.0).mean(axis=(1, 2))
                # batched 256-bin histogram: bincount over (row_index*256
                # + gray_level) — one pass, no per-image Python
                gi = np.clip(g.reshape(m, -1).round(), 0, 255).astype(np.int64)
                npx = gi.shape[1]
                counts = np.bincount(
                    (np.arange(m)[:, None] * 256 + gi).ravel(),
                    minlength=m * 256,
                ).reshape(m, 256)
                p = counts / npx
                with np.errstate(divide="ignore", invalid="ignore"):
                    ent = -np.where(p > 0, p * np.log2(p), 0.0).sum(axis=1)
                solid = counts.max(axis=1) / npx
                yield pd.DataFrame(
                    {
                        "id": pdf[id_col].iloc[idx].to_numpy(),
                        "laplacian_var": lap_var.astype(np.float64),
                        "entropy_bits": ent.astype(np.float64),
                        "edge_density": edge_density.astype(np.float64),
                        "solid_frac": solid.astype(np.float64),
                        "is_low_information": (ent < entropy_floor_bits)
                        | (solid > solid_frac_ceiling),
                    }
                )

    return images.select(cols).mapInPandas(run, _QUALITY_SCHEMA)


# ---------------------------------------------------------------------------
# SSIM (Wang et al. 2004, "Image Quality Assessment: From Error Visibility
# to Structural Similarity") — the principled perceptual-similarity metric,
# used here as an OPTIONAL precision gate over dedup candidate edges: pHash
# banding recalls candidates cheaply from 8-byte signatures; SSIM re-scores
# just the surviving pairs from pixels. A pair that shares every low-
# frequency DCT sign (identical pHash) but has destroyed local structure
# (e.g. heavy high-frequency noise) passes the hash lane and is rejected
# here — the knob that trades a pixel decode on O(edges) rows for
# pair-level precision.
# ---------------------------------------------------------------------------


def _win_sums(x: np.ndarray, win: int) -> np.ndarray:
    """(m, h, w) → (m, h-win+1, w-win+1) sliding win×win window sums via
    integral images (two cumsums + four gathers) — O(h·w) per image
    regardless of window size."""
    c = x.cumsum(axis=1).cumsum(axis=2)
    c = np.pad(c, ((0, 0), (1, 0), (1, 0)))
    return (
        c[:, win:, win:]
        - c[:, :-win, win:]
        - c[:, win:, :-win]
        + c[:, :-win, :-win]
    )


def ssim_batch(
    ga: np.ndarray, gb: np.ndarray, win: int = 8, L: float = 255.0
) -> np.ndarray:
    """Mean SSIM between two (m, h, w) grayscale stacks: uniform win×win
    window slid at stride 1 (the uniform-window variant of Wang et al.
    2004 eq. 13 with the standard K1=0.01, K2=0.03 stabilizers), local
    moments from integral images, map averaged over all windows.
    Windows clamp to min(h, w) for tiny images. Returns (m,) doubles
    in [-1, 1]; 1.0 iff the images are identical."""
    ga = ga.astype(np.float64)
    gb = gb.astype(np.float64)
    _, h, w = ga.shape
    win = max(1, min(win, h, w))
    n = float(win * win)
    mua = _win_sums(ga, win) / n
    mub = _win_sums(gb, win) / n
    va = _win_sums(ga * ga, win) / n - mua * mua
    vb = _win_sums(gb * gb, win) / n - mub * mub
    cab = _win_sums(ga * gb, win) / n - mua * mub
    c1 = (0.01 * L) ** 2
    c2 = (0.03 * L) ** 2
    num = (2.0 * mua * mub + c1) * (2.0 * cab + c2)
    den = (mua * mua + mub * mub + c1) * (va + vb + c2)
    return (num / den).mean(axis=(1, 2))


_SSIM_SCHEMA = "a string, b string, ssim double"


def ssim_verify_pairs(
    pairs: DataFrame,
    images: DataFrame,
    win: int = 8,
    id_col: str = "image_id",
) -> DataFrame:
    """Per candidate pair (a, b): mean SSIM between the two decoded
    grayscale images. Two joins pull each side's (bytes, w, h, fmt)
    onto the pair rows — the pair table is the small side by
    construction (post-banding candidates), so Catalyst broadcasts it
    and the image table never reshuffles — then ONE mapInPandas decodes
    per uniform shape group and scores with integral-image SSIM.
    Pairs whose dimensions differ get ssim NULL (structural similarity
    is undefined across rasters; the content-box/resize lanes handle
    cross-resolution dedup before this gate)."""
    a_side = images.select(
        F.col(id_col).alias("a"),
        F.col("bytes").alias("abytes"),
        F.col("w").alias("aw"),
        F.col("h").alias("ah"),
        F.col("fmt").alias("afmt"),
    )
    b_side = images.select(
        F.col(id_col).alias("b"),
        F.col("bytes").alias("bbytes"),
        F.col("w").alias("bw"),
        F.col("h").alias("bh"),
        F.col("fmt").alias("bfmt"),
    )
    j = pairs.select("a", "b").join(a_side, "a").join(b_side, "b")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ssim = np.full(len(pdf), np.nan)
            same = (pdf["aw"].values == pdf["bw"].values) & (
                pdf["ah"].values == pdf["bh"].values
            )
            sub = pdf[same]
            for (w, h, afmt, bfmt), idx in sub.groupby(
                ["aw", "ah", "afmt", "bfmt"], sort=False
            ).indices.items():
                rows = sub.iloc[idx]
                ga = _gray(
                    _decode_block(
                        rows["abytes"].tolist(), int(w), int(h), str(afmt)
                    ),
                    int(h),
                    int(w),
                )
                gb = _gray(
                    _decode_block(
                        rows["bbytes"].tolist(), int(w), int(h), str(bfmt)
                    ),
                    int(h),
                    int(w),
                )
                ssim[pdf.index.get_indexer(rows.index)] = ssim_batch(
                    ga, gb, win=win
                )
            yield pd.DataFrame(
                {"a": pdf["a"], "b": pdf["b"], "ssim": ssim}
            )

    return j.mapInPandas(run, schema=_SSIM_SCHEMA)


def ssim_gate_edges(
    edges: DataFrame,
    images: DataFrame,
    threshold: float = 0.8,
    win: int = 8,
    id_col: str = "image_id",
) -> DataFrame:
    """Precision gate: keep only edges whose SSIM clears ``threshold``
    (dimension-mismatched pairs, ssim NULL, are dropped — gate what you
    can measure). Compose before assign_clusters for an SSIM-verified
    clustering."""
    v = ssim_verify_pairs(edges, images, win=win, id_col=id_col)
    return v.where(F.col("ssim") >= F.lit(threshold)).select("a", "b")
