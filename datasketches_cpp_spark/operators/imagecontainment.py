"""Crop-in-image (sub-image) detection: the 2D member of the engine's
containment family (text: textstats.text_containment; audio:
audiodedup.audio_containment; video: videodedup.video_containment).

A crop of a larger image shares a tiny fraction of the big image's
content by area but 100% of its own, all at ONE consistent (dx, dy)
offset — so the Wang-2003 offset-vote histogram generalizes directly to
two dimensions: tile both images on a hop grid, pHash every tile (the
engine's 8×8-block pHash, sources/images.phash64_batch), match tiles
through the SAME fused slice-combo band lane the image/video twins use
(imagededup.phash_pairs — hashes ride the shuffle as 8-byte payloads,
zero joins), and vote each matched tile pair into a (dx, dy) histogram;
the crop is localized at the argmax.

Granularity: detection needs crop corners on the hop lattice — the
default hop = tile//2 (overlapping tiles, the audio lane's
overlapping-STFT trade in 2D) quadruples tile rows for half-tile
localization. ``dx_tiles``/``dy_tiles`` are in hop units. Tiles are
``tile``×``tile`` pixels and pHash needs 8×8 blocks, so tile ≥ 8;
sub-hop-aligned crops and rescaled crops are out of scope (the D4-orbit
and content-box lanes in imagededup cover rotation/letterbox variants).

Scale shape: tiling is one narrow mapInPandas (per-row decode is
unavoidable for variable-size payloads — the sample_frames precedent —
but tile extraction + hashing vectorize per (w, h) group); then ONE
wide band shuffle, two narrow aggs (votes, best offset with the
earliest-offset tiebreak), and image-cardinality tile-count joins.
Nothing materializes on the driver."""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .imagededup import phash_pairs
from .sigkernel import SigConfig

_SEP = "#"


def tile_phashes(
    images: DataFrame,
    id_col: str = "image_id",
    tile: int = 32,
    hop: int | None = None,
) -> DataFrame:
    """(id, tx, ty, phash) — pHash of every ``tile``×``tile`` window on
    the ``hop`` lattice (hop defaults to tile//2: overlapping tiles,
    half-tile localization). Images smaller than one tile emit no rows.
    Decoding goes through sources.images.decode_image (raw + the
    pure-numpy codecs); tile extraction and hashing are vectorized per
    (w, h) shape group."""
    if tile < 8:
        raise ValueError(f"tile must be >= 8 (pHash needs 8x8 blocks), got {tile}")
    hop = tile // 2 if hop is None else hop
    if not (1 <= hop <= tile):
        raise ValueError(f"hop must be in [1, tile], got {hop}")
    schema = f"{id_col} string, tx int, ty int, phash long"
    cols = [id_col, "bytes", "w", "h", "fmt"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..sources.images import decode_image, phash64_batch

        for pdf in batches:
            if len(pdf) == 0:
                continue
            pdf = pdf.assign(
                bytes=[
                    decode_image(bytes(b), int(w), int(h), f).tobytes()
                    for b, w, h, f in zip(
                        pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]
                    )
                ]
            )
            for (w, h), g in pdf.groupby(["w", "h"], sort=False):
                w, h = int(w), int(h)
                if w < tile or h < tile:
                    continue
                m = len(g)
                px = np.frombuffer(
                    b"".join(g["bytes"].tolist()), np.uint8
                ).reshape(m, h, w, 3)
                # all tile windows on the hop lattice, vectorized:
                # (m, ny, nx, tile, tile, 3)
                win = np.lib.stride_tricks.sliding_window_view(
                    px, (tile, tile), axis=(1, 2)
                )[:, ::hop, ::hop]
                ny, nx = win.shape[1], win.shape[2]
                # window view axes: (m, ny, nx, 3, tile, tile) after
                # sliding over (h, w); reorder to rows of (tile,tile,3)
                flat = np.ascontiguousarray(
                    win.transpose(0, 1, 2, 4, 5, 3)
                ).reshape(m * ny * nx, 3 * tile * tile)
                ph = phash64_batch(
                    flat.reshape(m * ny * nx, -1), tile, tile
                ).view(np.int64)
                ids = np.repeat(g[id_col].to_numpy(), ny * nx)
                ty, tx = np.divmod(np.arange(ny * nx), nx)
                yield pd.DataFrame(
                    {
                        id_col: ids,
                        "tx": np.tile(tx, m).astype(np.int32),
                        "ty": np.tile(ty, m).astype(np.int32),
                        "phash": ph,
                    }
                )

    return images.select(cols).mapInPandas(run, schema)


def image_containment(
    images: DataFrame,
    cfg: SigConfig | None = None,
    id_col: str = "image_id",
    tile: int = 32,
    hop: int | None = None,
    min_match_frac: float = 0.8,
    min_aligned_tiles: int = 2,
    max_pairs_group: int = 256,
    hot_policy: str = "chain_hub",
) -> DataFrame:
    """(clip_id, container_id, aligned_tiles, clip_tiles, match_frac,
    dx_tiles, dy_tiles) for oriented pairs where ≥ ``min_match_frac`` of
    the smaller image's tiles match the larger image's tiles (within
    cfg.phash_hamming) at ONE consistent 2D offset (hop units). Ties on
    vote count break toward the smallest (dx, dy) lexicographically —
    the containment family's deterministic earliest-offset rule."""
    cfg = cfg or SigConfig()
    # tile table fans out to the band lane + two tile-count joins
    tiles = tile_phashes(
        images, id_col=id_col, tile=tile, hop=hop
    ).localCheckpoint(eager=False)
    counts = tiles.groupBy(F.col(id_col).alias("iid")).agg(
        F.count(F.lit(1)).alias("n_tiles")
    )
    fid = F.concat_ws(_SEP, F.col(id_col), F.col("tx"), F.col("ty"))
    tile_pairs = phash_pairs(
        tiles.select(fid.alias("fid"), "phash"),
        cfg,
        id_col="fid",
        phash_col="phash",
        max_pairs_group=max_pairs_group,
        hot_policy=hot_policy,
    )
    strip = lambda c: F.regexp_replace(c, r"#[0-9]+#[0-9]+$", "")  # noqa: E731

    def parts(col):
        s = F.col(col)
        return (
            strip(s),
            F.element_at(F.split(s, _SEP), -2).cast("int"),
            F.element_at(F.split(s, _SEP), -1).cast("int"),
        )

    ia, xa, ya = parts("a")
    ib, xb, yb = parts("b")
    base = tile_pairs.select(
        ia.alias("ia"), xa.alias("xa"), ya.alias("ya"),
        ib.alias("ib"), xb.alias("xb"), yb.alias("yb"),
    ).where(F.col("ia") != F.col("ib"))
    oriented = base.select(
        F.col("ia").alias("clip_id"),
        F.col("ib").alias("container_id"),
        (F.col("xb") - F.col("xa")).alias("dx"),
        (F.col("yb") - F.col("ya")).alias("dy"),
        F.concat_ws(",", "xa", "ya").alias("clip_tile"),
    ).unionByName(
        base.select(
            F.col("ib").alias("clip_id"),
            F.col("ia").alias("container_id"),
            (F.col("xa") - F.col("xb")).alias("dx"),
            (F.col("ya") - F.col("yb")).alias("dy"),
            F.concat_ws(",", "xb", "yb").alias("clip_tile"),
        )
    )
    votes = oriented.groupBy("clip_id", "container_id", "dx", "dy").agg(
        F.countDistinct("clip_tile").alias("aligned")
    )
    best = (
        votes.groupBy("clip_id", "container_id")
        .agg(
            F.max(
                F.struct(
                    F.col("aligned"),
                    (-F.col("dx")).alias("ndx"),
                    (-F.col("dy")).alias("ndy"),
                )
            ).alias("best")
        )
        .select(
            "clip_id",
            "container_id",
            F.col("best.aligned").alias("aligned_tiles"),
            (-F.col("best.ndx")).alias("dx_tiles"),
            (-F.col("best.ndy")).alias("dy_tiles"),
        )
    )
    out = (
        best.join(
            counts.select(
                F.col("iid").alias("clip_id"),
                F.col("n_tiles").alias("clip_tiles"),
            ),
            "clip_id",
        )
        .join(
            counts.select(
                F.col("iid").alias("container_id"),
                F.col("n_tiles").alias("container_tiles"),
            ),
            "container_id",
        )
        .withColumn("match_frac", F.col("aligned_tiles") / F.col("clip_tiles"))
    )
    return out.where(
        (F.col("aligned_tiles") >= min_aligned_tiles)
        & (F.col("match_frac") >= min_match_frac)
        & (F.col("container_tiles") >= F.col("clip_tiles"))
    ).select(
        "clip_id",
        "container_id",
        "aligned_tiles",
        "clip_tiles",
        "match_frac",
        "dx_tiles",
        "dy_tiles",
    )
