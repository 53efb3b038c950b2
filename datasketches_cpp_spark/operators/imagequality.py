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
