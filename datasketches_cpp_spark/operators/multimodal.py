"""Multimodal column operators: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side plumbing is real and tested — schemas, Arrow batch shapes,
partitioning, vectorized UDF signatures. The codec calls are STUBBED
(`fmt='raw'` identity only) because this container ships no image/audio
libraries; swapping in a real decoder is a one-function change per modality
(the seam is `sources.images.decode_image`).

Operators (all `mapInPandas`, zero per-row Python):
  decode_stats     decode → per-image pixel statistics (mean/std/extrema)
  resize_images    decode → nearest-neighbor resize → re-encoded raw bytes
  image_features   decode → compact feature vector (block means — the same
                   family as the pHash surrogate, usable for ANN)
  sample_frames    video bytes → every k-th frame as image rows (raw video
                   = concatenated raw frames; real containers are stubbed)
  audio_features   audio bytes → windowed RMS/zero-crossing features (raw
                   PCM16; compressed codecs stubbed)

Scale notes: each operator is a narrow stage (no shuffle) over the binary
column; output drops the payload bytes unless explicitly re-encoded, so
downstream stages move small typed rows. Frame sampling explodes rows —
at 100 TB gate it behind a stride and project frame bytes only when the
consumer needs pixels.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..sources.images import decode_image


def decode_stats(
    images: DataFrame,
    id_col: str = "image_id",
) -> DataFrame:
    """(id, w, h, n_pixels, mean, std, min, max) per image — the canonical
    'did the decode plumbing work' operator and the QA input for the PSNR
    invariant checks."""
    schema = (
        "id string, w int, h int, n_pixels long, "
        "px_mean double, px_std double, px_min int, px_max int"
    )
    cols = [id_col, "bytes", "w", "h", "fmt"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                px = decode_image(r["bytes"], r["w"], r["h"], r["fmt"])
                out.append(
                    {
                        "id": r[id_col],
                        "w": int(r["w"]),
                        "h": int(r["h"]),
                        "n_pixels": len(px),
                        "px_mean": float(px.mean()) if len(px) else 0.0,
                        "px_std": float(px.std()) if len(px) else 0.0,
                        "px_min": int(px.min()) if len(px) else 0,
                        "px_max": int(px.max()) if len(px) else 0,
                    }
                )
            yield pd.DataFrame(out)

    return images.select(cols).mapInPandas(run, schema)


def resize_images(
    images: DataFrame,
    out_w: int,
    out_h: int,
    id_col: str = "image_id",
) -> DataFrame:
    """Nearest-neighbor resize to (out_w, out_h); returns the resized raw
    buffer + metadata, same input_hint column shapes so resized tables can
    re-enter any pipeline stage."""
    schema = "image_id string, bytes binary, w int, h int, fmt string"
    cols = [id_col, "bytes", "w", "h", "fmt"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ys = None
        for pdf in batches:
            out_bytes = []
            for _, r in pdf.iterrows():
                px = decode_image(r["bytes"], r["w"], r["h"], r["fmt"]).reshape(
                    r["h"], r["w"], 3
                )
                yi = (np.arange(out_h) * r["h"] // out_h).astype(np.intp)
                xi = (np.arange(out_w) * r["w"] // out_w).astype(np.intp)
                out_bytes.append(px[yi][:, xi].tobytes())
            yield pd.DataFrame(
                {
                    "image_id": pdf[id_col],
                    "bytes": out_bytes,
                    "w": out_w,
                    "h": out_h,
                    "fmt": "raw",
                }
            )
        _ = ys

    return images.select(cols).mapInPandas(run, schema)


def image_features(
    images: DataFrame,
    grid: int = 8,
    id_col: str = "image_id",
) -> DataFrame:
    """(id, features array<float>) — grid×grid grayscale block means,
    L2-normalized: a deterministic, codec-free stand-in for an embedding
    model (real feature extractors slot into the same signature). Output
    feeds operators/knn.py directly."""
    schema = "id string, features array<float>"
    cols = [id_col, "bytes", "w", "h", "fmt"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats = [], []
            for _, r in pdf.iterrows():
                px = decode_image(r["bytes"], r["w"], r["h"], r["fmt"])
                gray = px.reshape(r["h"], r["w"], 3).mean(axis=2)
                bh, bw = max(r["h"] // grid, 1), max(r["w"] // grid, 1)
                blocks = gray[: bh * grid, : bw * grid].reshape(
                    grid, bh, grid, bw
                ).mean(axis=(1, 3)).ravel()
                norm = np.linalg.norm(blocks)
                ids.append(r[id_col])
                feats.append((blocks / norm if norm > 0 else blocks).astype(np.float32))
            yield pd.DataFrame({"id": ids, "features": feats})

    return images.select(cols).mapInPandas(run, schema)


def sample_frames(
    videos: DataFrame,
    every_k: int = 10,
    id_col: str = "video_id",
) -> DataFrame:
    """(video_id, frame_idx, bytes, w, h, fmt) — every k-th frame.
    fmt='rawv' means concatenated raw RGB frames (n_frames × h × w × 3);
    container formats (mp4 etc.) raise NotImplementedError at the decode
    seam, exactly like image codecs."""
    schema = f"{id_col} string, frame_idx int, bytes binary, w int, h int, fmt string"
    cols = [id_col, "bytes", "w", "h", "fmt"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                if r["fmt"] != "rawv":
                    raise NotImplementedError(
                        f"video decode for fmt={r['fmt']!r} requires a codec "
                        "not present in this environment; only fmt='rawv' "
                        "(concatenated raw frames) is supported here"
                    )
                frame_sz = int(r["w"]) * int(r["h"]) * 3
                buf = r["bytes"]
                n_frames = len(buf) // frame_sz
                for fi in range(0, n_frames, every_k):
                    out.append(
                        {
                            id_col: r[id_col],
                            "frame_idx": fi,
                            "bytes": buf[fi * frame_sz : (fi + 1) * frame_sz],
                            "w": int(r["w"]),
                            "h": int(r["h"]),
                            "fmt": "raw",
                        }
                    )
            yield pd.DataFrame(
                out, columns=[id_col, "frame_idx", "bytes", "w", "h", "fmt"]
            )

    return videos.select(cols).mapInPandas(run, schema)


def audio_features(
    audio: DataFrame,
    window: int = 1024,
    id_col: str = "audio_id",
) -> DataFrame:
    """(audio_id, n_windows, rms array<float>, zero_crossings array<int>)
    over raw PCM16 mono ('pcm16'); compressed codecs raise at the seam."""
    schema = f"{id_col} string, n_windows int, rms array<float>, zero_crossings array<int>"
    cols = [id_col, "bytes", "fmt"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                if r["fmt"] != "pcm16":
                    raise NotImplementedError(
                        f"audio decode for fmt={r['fmt']!r} requires a codec "
                        "not present in this environment; only fmt='pcm16' "
                        "is supported here"
                    )
                pcm = np.frombuffer(r["bytes"], dtype="<i2").astype(np.float32)
                n = len(pcm) // window
                if n == 0:
                    out.append(
                        {id_col: r[id_col], "n_windows": 0, "rms": [], "zero_crossings": []}
                    )
                    continue
                w = pcm[: n * window].reshape(n, window)
                rms = np.sqrt((w ** 2).mean(axis=1)) / 32768.0
                zc = (np.diff(np.signbit(w), axis=1) != 0).sum(axis=1)
                out.append(
                    {
                        id_col: r[id_col],
                        "n_windows": n,
                        "rms": rms.astype(np.float32),
                        "zero_crossings": zc.astype(np.int32),
                    }
                )
            yield pd.DataFrame(
                out, columns=[id_col, "n_windows", "rms", "zero_crossings"]
            )

    return audio.select(cols).mapInPandas(run, schema)
