"""Video near-duplicate detection: frame-sampled perceptual hashing over
the image pipeline's fused pHash band lane.

Extends the flagship image dedup (operators/imagededup.py) to the video
payload: sample every k-th frame (operators/multimodal.sample_frames),
perceptual-hash each frame (the same DCT-free 8×8 block pHash the
synthetic corpus uses, sources/images.phash64_batch — one vectorized
batch per (w, h) shape group), and reuse the multi-index slice-combo
blocking + inline hamming verification of the image lane on the FRAME
table. Two videos are near-duplicates when at least
``min_matching_frames`` of their sampled frames match within the
configured hamming radius; clusters come from the shared
connected-components operator.

Scale shape (10^12-frame credible):

* Frame explosion is a narrow mapInPandas — no shuffle; the per-frame
  row carries (id, idx, 8-byte phash) only after hashing, never pixels.
* The pair stage is the image lane's single-shuffle band groupBy with
  payload-riding verification (imagededup.phash_pairs) — zero joins back
  to a frame table.
* Frame-pair → video-pair scoring is one map-side-combinable
  countDistinct aggregation over (video_a, video_b).

The decode seam matches the rest of the engine: fmt='rawv' (concatenated
raw RGB frames) is real; container codecs raise NotImplementedError at
the seam (multimodal.sample_frames), with all Spark plumbing identical.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .cc import assign_clusters
from .imagededup import phash_pairs
from .multimodal import sample_frames
from .sigkernel import SigConfig

# composite frame-id delimiter; parsing strips a trailing '#<digits>', so
# video ids containing '#' still round-trip
_SEP = "#"


def with_frame_phash(
    frames: DataFrame, id_col: str = "video_id"
) -> DataFrame:
    """(id, frame_idx, bytes, w, h, ...) → (id, frame_idx, phash). Frames
    are grouped by (w, h) inside each Arrow batch and hashed as ONE
    (m, 3wh) ndarray per group (the engine's batch-vectorization idiom) —
    no per-row Python beyond the unavoidable buffer gather."""
    from ..sources.images import phash64_batch

    schema = f"{id_col} string, frame_idx int, phash long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            for (w, h), g in pdf.groupby(["w", "h"], sort=False):
                pixels = np.frombuffer(
                    b"".join(g["bytes"].tolist()), np.uint8
                ).reshape(len(g), 3 * int(w) * int(h))
                ph = phash64_batch(pixels, int(w), int(h)).view(np.int64)
                yield pd.DataFrame(
                    {
                        id_col: g[id_col].to_numpy(),
                        "frame_idx": g["frame_idx"].to_numpy(),
                        "phash": ph,
                    }
                )

    return frames.mapInPandas(run, schema)


def video_pairs(
    frame_phashes: DataFrame,
    cfg: SigConfig,
    id_col: str = "video_id",
    min_matching_frames: int = 2,
    max_pairs_group: int = 256,
    hot_policy: str = "chain_hub",
) -> DataFrame:
    """(video_a, video_b, matched_frames) for video pairs with at least
    ``min_matching_frames`` sampled frames within cfg.phash_hamming.
    ``matched_frames`` counts DISTINCT matching frame indices of the
    lexicographically smaller video, so a long static segment matching one
    frame of the other video counts once per local frame, not per pair."""
    fid = F.concat_ws(_SEP, F.col(id_col), F.col("frame_idx"))
    frame_pairs = phash_pairs(
        frame_phashes.select(fid.alias("fid"), "phash"),
        cfg,
        id_col="fid",
        phash_col="phash",
        max_pairs_group=max_pairs_group,
        hot_policy=hot_policy,
    )
    strip = lambda c: F.regexp_replace(c, r"#[0-9]+$", "")  # noqa: E731
    frame = lambda c: F.substring_index(c, _SEP, -1).cast("int")  # noqa: E731
    va, vb = strip(F.col("a")), strip(F.col("b"))
    fa, fb = frame(F.col("a")), frame(F.col("b"))
    cross = frame_pairs.where(va != vb).select(
        F.least(va, vb).alias("video_a"),
        F.greatest(va, vb).alias("video_b"),
        F.when(va < vb, fa).otherwise(fb).alias("frame_small"),
    )
    return (
        cross.groupBy("video_a", "video_b")
        .agg(F.countDistinct("frame_small").alias("matched_frames"))
        .where(F.col("matched_frames") >= min_matching_frames)
    )


def dedup_videos(
    videos: DataFrame,
    cfg: SigConfig | None = None,
    id_col: str = "video_id",
    every_k: int = 4,
    min_matching_frames: int = 2,
    max_pairs_group: int = 256,
    hot_policy: str = "chain_hub",
) -> dict:
    """Full video near-dup pipeline: sample → frame pHash → fused band
    lane → video-pair scoring → connected components. Returns
    {'assignments', 'pairs', 'frame_phashes'} (assignments:
    (id, cluster_id) for EVERY input video, singletons included —
    partition-layout-invariant like the image flagship)."""
    cfg = cfg or SigConfig()
    frames = sample_frames(videos, every_k=every_k, id_col=id_col)
    # lazy checkpoint: the decode+pHash kernel feeds the pair lane AND is
    # returned for checkpointing/inspection — without it, materializing
    # each output re-runs frame sampling and hashing (same idiom as
    # video_containment / imagededup)
    ph = with_frame_phash(frames, id_col=id_col).localCheckpoint(eager=False)
    pairs = video_pairs(
        ph,
        cfg,
        id_col=id_col,
        min_matching_frames=min_matching_frames,
        max_pairs_group=max_pairs_group,
        hot_policy=hot_policy,
    )
    edges = pairs.select(F.col("video_a").alias("a"), F.col("video_b").alias("b"))
    assignments = assign_clusters(
        videos.select(F.col(id_col).alias("id")), edges
    )
    return {"assignments": assignments, "pairs": pairs, "frame_phashes": ph}


def video_containment(
    videos: DataFrame,
    cfg: SigConfig | None = None,
    id_col: str = "video_id",
    every_k: int = 1,
    min_match_frac: float = 0.8,
    min_aligned_frames: int = 2,
    max_pairs_group: int = 256,
    hot_policy: str = "chain_hub",
) -> DataFrame:
    """Clip-in-video (excerpt) detection: (clip_id, container_id,
    aligned_frames, clip_frames, match_frac, frame_offset) for every
    oriented pair where ≥ ``min_match_frac`` of the clip's sampled
    frames match the container's frames (within cfg.phash_hamming) AT A
    SINGLE CONSISTENT temporal offset — the Wang-2003 offset-voting
    histogram applied to frame pHashes, which near-twin pair scoring
    (video_pairs) cannot express: a 30 s clip inside a 2 h video shares
    a tiny fraction of the long video's frames but 100% of its own, all
    at one offset.

    Plan shape: the SAME fused one-shuffle band lane as video_pairs
    (frame pHashes ride the band shuffle as 8-byte payloads), then two
    narrow aggs: offset votes = countDistinct(clip frame) per (clip,
    container, dt), best offset per oriented pair via max(struct), and
    a per-video frame-count join (video-cardinality, not
    frame-cardinality). Nothing materializes on the driver.

    Containment is frame-index alignment, so the default every_k=1
    hashes every frame (pHash rows are 8 bytes — frames never leave the
    signature stage); a stride samples both sides on the same lattice
    and misses excerpts whose offset is not a multiple of the stride.
    Self-pairs are excluded; equal-length twins qualify in both
    orientations (containment is reflexive on duplicates) — callers
    wanting strict excerpts filter clip_frames < container_frames."""
    cfg = cfg or SigConfig()
    frames = sample_frames(videos, every_k=every_k, id_col=id_col)
    # frame pHashes fan out to the band lane AND two frame-count joins;
    # checkpoint so the decode+pHash kernel runs once (the imagededup
    # signature-reuse idiom)
    ph = with_frame_phash(frames, id_col=id_col).localCheckpoint(eager=False)
    n_frames = ph.groupBy(F.col(id_col).alias("vid")).agg(
        F.count(F.lit(1)).alias("n_frames")
    )

    fid = F.concat_ws(_SEP, F.col(id_col), F.col("frame_idx"))
    frame_pairs = phash_pairs(
        ph.select(fid.alias("fid"), "phash"),
        cfg,
        id_col="fid",
        phash_col="phash",
        max_pairs_group=max_pairs_group,
        hot_policy=hot_policy,
    )
    strip = lambda c: F.regexp_replace(c, r"#[0-9]+$", "")  # noqa: E731
    frame = lambda c: F.substring_index(c, _SEP, -1).cast("int")  # noqa: E731
    base = frame_pairs.select(
        strip(F.col("a")).alias("va"),
        frame(F.col("a")).alias("fa"),
        strip(F.col("b")).alias("vb"),
        frame(F.col("b")).alias("fb"),
    ).where(F.col("va") != F.col("vb"))
    oriented = base.select(
        F.col("va").alias("clip_id"),
        F.col("vb").alias("container_id"),
        (F.col("fb") - F.col("fa")).alias("dt"),
        F.col("fa").alias("clip_frame"),
    ).unionByName(
        base.select(
            F.col("vb").alias("clip_id"),
            F.col("va").alias("container_id"),
            (F.col("fa") - F.col("fb")).alias("dt"),
            F.col("fb").alias("clip_frame"),
        )
    )
    votes = oriented.groupBy("clip_id", "container_id", "dt").agg(
        F.countDistinct("clip_frame").alias("aligned")
    )
    best = (
        votes.groupBy("clip_id", "container_id")
        .agg(
            # ties on vote count break toward the SMALLEST offset (max on
            # (aligned, -dt)), so equally-supported alignments — common in
            # self-similar/stationary content — resolve deterministically
            # to the earliest one
            F.max(F.struct(F.col("aligned"), (-F.col("dt")).alias("ndt")))
            .alias("best")
        )
        .select(
            "clip_id",
            "container_id",
            F.col("best.aligned").alias("aligned_frames"),
            (-F.col("best.ndt")).alias("frame_offset"),
        )
    )
    out = (
        best.join(
            n_frames.select(
                F.col("vid").alias("clip_id"),
                F.col("n_frames").alias("clip_frames"),
            ),
            "clip_id",
        )
        .join(
            n_frames.select(
                F.col("vid").alias("container_id"),
                F.col("n_frames").alias("container_frames"),
            ),
            "container_id",
        )
        .withColumn(
            "match_frac",
            F.col("aligned_frames") / F.col("clip_frames"),
        )
    )
    return out.where(
        (F.col("aligned_frames") >= min_aligned_frames)
        & (F.col("match_frac") >= min_match_frac)
        & (F.col("container_frames") >= F.col("clip_frames"))
    ).select(
        "clip_id",
        "container_id",
        "aligned_frames",
        "clip_frames",
        "container_frames",
        "match_frac",
        "frame_offset",
    )
