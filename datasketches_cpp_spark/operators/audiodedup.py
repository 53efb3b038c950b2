"""Audio near-duplicate detection: spectral-landmark fingerprints
(Shazam-style constellation hashing, Wang 2003) over raw PCM16, scored by
shared-landmark counts and clustered with the shared connected-components
operator.

Lane shape, consistent with the image/video lanes:

* Fingerprinting is a narrow ``mapInPandas`` stage — clips are grouped by
  buffer length inside each Arrow batch and processed as ONE
  (m, frames, window) ndarray per group (the engine's batch-vectorization
  idiom): rFFT magnitudes, top-k peak bins per frame, anchor→target
  landmark pairs packed into int64 hashes. No shuffle, no per-clip numpy
  calls.
* Pair generation groups by landmark hash (ONE wide shuffle, map-side
  combined), drops ubiquitous landmarks above a cap (a hot landmark —
  like a stopword — carries no identity signal; the cap is deterministic
  and documented in the result), expands within-group pairs with JVM
  array algebra, and scores each audio pair by its DISTINCT shared
  landmark count.
* The decode seam matches the engine: fmt='pcm16' (raw mono) and
  fmt='wav' (RIFF PCM16 container, operators/audiocodec.py) are real;
  compressed codecs raise NotImplementedError at the seam
  (multimodal.audio_features precedent).

Landmark hash layout (int64, reproducible across partitionings):
``(f1 << 24) | (f2 << 8) | dt`` with f1, f2 < 2^12 (rFFT bins of a ≤ 8192
window) and dt ≤ fan_dt < 2^8 frames.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .cc import assign_clusters


def _check_landmark_params(window: int, fan_dt: int) -> None:
    """Packed-landmark layout guard: (f1 << 24) | (f2 << 8) | dt gives the
    second bin 16 bits and the frame gap 8 bits. Out-of-range values
    would not error — they would silently overflow into neighboring
    fields, making DISTINCT landmarks collide and unrelated clips merge.
    rFFT bins run 0..window//2, so window caps at 2^17 - 2."""
    if not 2 <= window <= (1 << 17) - 2:
        raise ValueError(
            f"window must be in [2, {(1 << 17) - 2}] "
            f"(f2 field is 16 bits), got {window}"
        )
    if not 1 <= fan_dt <= 255:
        raise ValueError(f"fan_dt must be in [1, 255] (8-bit field), got {fan_dt}")


def audio_landmarks(
    audio: DataFrame,
    id_col: str = "audio_id",
    window: int = 1024,
    peaks_per_frame: int = 3,
    fan_dt: int = 3,
) -> DataFrame:
    """(id, landmark:long) — distinct spectral landmarks per clip.

    Frames are non-overlapping ``window``-sample slices; each frame
    contributes its ``peaks_per_frame`` strongest rFFT bins (DC excluded),
    and every peak is paired with every peak of the next ``fan_dt`` frames
    to form (f1, f2, dt) landmarks. Sub-window clips yield no rows."""
    _check_landmark_params(window, fan_dt)
    schema = f"{id_col} string, landmark long"
    cols = [id_col, "bytes", "fmt"]
    k = peaks_per_frame

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .audiocodec import to_pcm16

        for pdf in batches:
            if len(pdf) == 0:
                continue
            # normalize containers to raw mono PCM16 (wav parses, pcm16
            # passes through, compressed codecs raise at the seam)
            pdf = pdf.assign(
                bytes=[
                    to_pcm16(bytes(b), f)
                    for b, f in zip(pdf["bytes"], pdf["fmt"])
                ]
            )
            lens = pdf["bytes"].map(len)
            for blen, idx in pdf.groupby(lens, sort=False).indices.items():
                idx = np.asarray(idx)
                n_frames = (int(blen) // 2) // window
                if n_frames < 2:
                    continue
                ids = pdf[id_col].iloc[idx].to_numpy()
                pcm = np.frombuffer(
                    b"".join(pdf["bytes"].iloc[idx].tolist()), dtype="<i2"
                ).astype(np.float32)
                frames = pcm.reshape(len(idx), -1)[
                    :, : n_frames * window
                ].reshape(len(idx), n_frames, window)
                mag = np.abs(np.fft.rfft(frames, axis=2))
                mag[:, :, 0] = 0.0  # DC carries level, not identity
                # top-k bins per frame, then SORT the k bins so the peak
                # set is order-canonical (argpartition order is unspecified)
                peaks = np.sort(
                    np.argpartition(mag, -k, axis=2)[:, :, -k:], axis=2
                ).astype(np.int64)
                hashes = []
                for d in range(1, min(fan_dt, n_frames - 1) + 1):
                    f1 = peaks[:, :-d, :, None]          # (m, T-d, k, 1)
                    f2 = peaks[:, d:, None, :]           # (m, T-d, 1, k)
                    h = (f1 << 24) | (f2 << 8) | d       # (m, T-d, k, k)
                    hashes.append(h.reshape(len(idx), -1))
                allh = np.concatenate(hashes, axis=1)
                # per-clip distinct landmarks without a Python loop: sort
                # each row (vectorized), then keep first-of-run per row —
                # same sets np.unique produced per clip, one pass
                sh = np.sort(allh, axis=1)
                keep = np.ones(sh.shape, dtype=bool)
                keep[:, 1:] = sh[:, 1:] != sh[:, :-1]
                yield pd.DataFrame(
                    {
                        id_col: np.repeat(ids, keep.sum(axis=1)),
                        "landmark": sh[keep],
                    }
                )

    return audio.select(cols).mapInPandas(run, schema)


def audio_pairs(
    landmarks: DataFrame,
    id_col: str = "audio_id",
    min_shared: int = 8,
    max_ids_per_landmark: int = 64,
) -> DataFrame:
    """(audio_a, audio_b, shared_landmarks) for clip pairs sharing at
    least ``min_shared`` distinct landmarks.

    One wide shuffle: groupBy(landmark).collect_set(id) (map-side
    combined), landmarks held by more than ``max_ids_per_landmark`` clips
    are dropped (a landmark that ubiquitous is spectrum boilerplate — the
    same reasoning as the LSH lane's hot-band policies, and deterministic),
    then within-group pairs expand as sorted JVM array algebra (a < b by
    construction) and score by count per pair."""
    grouped = (
        landmarks.groupBy("landmark")
        .agg(F.array_sort(F.collect_set(F.col(id_col))).alias("ids"))
        .where(
            (F.size("ids") >= 2) & (F.size("ids") <= max_ids_per_landmark)
        )
    )
    pairs = grouped.select(
        F.posexplode("ids").alias("i", "a"), F.col("ids")
    ).select(
        "a", F.explode(F.slice("ids", F.col("i") + 2, F.size("ids"))).alias("b")
    )
    return (
        pairs.groupBy(F.col("a").alias("audio_a"), F.col("b").alias("audio_b"))
        .agg(F.count(F.lit(1)).alias("shared_landmarks"))
        .where(F.col("shared_landmarks") >= min_shared)
    )


def dedup_audio(
    audio: DataFrame,
    id_col: str = "audio_id",
    window: int = 1024,
    peaks_per_frame: int = 3,
    fan_dt: int = 3,
    min_shared: int = 8,
    max_ids_per_landmark: int = 64,
) -> dict:
    """Full audio near-dup pipeline: landmarks → shared-count pairs →
    connected components. Returns {'assignments', 'pairs', 'landmarks'};
    assignments cover EVERY input clip (singletons keep their own id) and
    are partition-layout-invariant."""
    lm = audio_landmarks(
        audio,
        id_col=id_col,
        window=window,
        peaks_per_frame=peaks_per_frame,
        fan_dt=fan_dt,
    ).localCheckpoint(eager=False)
    # lazy checkpoint: the rFFT landmark kernel feeds the pair lane AND
    # is returned for checkpointing — the audio_containment idiom
    pairs = audio_pairs(
        lm,
        id_col=id_col,
        min_shared=min_shared,
        max_ids_per_landmark=max_ids_per_landmark,
    )
    edges = pairs.select(F.col("audio_a").alias("a"), F.col("audio_b").alias("b"))
    assignments = assign_clusters(audio.select(F.col(id_col).alias("id")), edges)
    return {"assignments": assignments, "pairs": pairs, "landmarks": lm}


def audio_landmarks_timed(
    audio: DataFrame,
    id_col: str = "audio_id",
    window: int = 1024,
    peaks_per_frame: int = 3,
    fan_dt: int = 3,
    hop: int | None = None,
) -> DataFrame:
    """(id, landmark:long, t:int) — spectral landmarks WITH their anchor
    frame index, keeping every distinct (landmark, t) occurrence per
    clip (audio_landmarks collapses to the distinct landmark set, which
    is what near-twin scoring needs; offset voting needs the times).
    Same batch-vectorized kernel: one rFFT per buffer-length group, the
    per-clip dedup is one lexsort-segment pass over a packed
    (landmark << 20 | t) composite — no per-row Python.

    ``hop`` (default = window, non-overlapping) strides the analysis
    frames: hop = window//2 doubles the rFFT work but makes offset
    voting coherent for excerpts aligned to any half-window boundary —
    the standard overlapping-STFT trade. ``t`` is in hop units."""
    schema = f"{id_col} string, landmark long, t int"
    cols = [id_col, "bytes", "fmt"]
    k = peaks_per_frame
    _check_landmark_params(window, fan_dt)
    hop = window if hop is None else hop
    if not (1 <= hop <= window):
        raise ValueError(f"hop must be in [1, window], got {hop}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .audiocodec import to_pcm16

        for pdf in batches:
            if len(pdf) == 0:
                continue
            pdf = pdf.assign(
                bytes=[
                    to_pcm16(bytes(b), f)
                    for b, f in zip(pdf["bytes"], pdf["fmt"])
                ]
            )
            lens = pdf["bytes"].map(len)
            for blen, idx in pdf.groupby(lens, sort=False).indices.items():
                idx = np.asarray(idx)
                n_samples = int(blen) // 2
                n_frames = (
                    (n_samples - window) // hop + 1 if n_samples >= window else 0
                )
                if n_frames < 2 or n_frames >= (1 << 20):
                    if n_frames >= (1 << 20):
                        raise ValueError(
                            "clip too long for the packed (landmark, t) "
                            f"composite: {n_frames} frames >= 2^20"
                        )
                    continue
                ids = pdf[id_col].iloc[idx].to_numpy()
                pcm = np.frombuffer(
                    b"".join(pdf["bytes"].iloc[idx].tolist()), dtype="<i2"
                ).astype(np.float32).reshape(len(idx), -1)
                frames = np.lib.stride_tricks.sliding_window_view(
                    pcm, window, axis=1
                )[:, ::hop][:, :n_frames]
                mag = np.abs(np.fft.rfft(frames, axis=2))
                mag[:, :, 0] = 0.0
                peaks = np.sort(
                    np.argpartition(mag, -k, axis=2)[:, :, -k:], axis=2
                ).astype(np.int64)
                packed = []
                for d in range(1, min(fan_dt, n_frames - 1) + 1):
                    f1 = peaks[:, :-d, :, None]
                    f2 = peaks[:, d:, None, :]
                    h = (f1 << 24) | (f2 << 8) | d       # (m, T-d, k, k)
                    t = np.broadcast_to(
                        np.arange(n_frames - d, dtype=np.int64)[
                            None, :, None, None
                        ],
                        h.shape,
                    )
                    packed.append(
                        ((h << 20) | t).reshape(len(idx), -1)
                    )
                allp = np.concatenate(packed, axis=1)
                sh = np.sort(allp, axis=1)
                keep = np.ones(sh.shape, dtype=bool)
                keep[:, 1:] = sh[:, 1:] != sh[:, :-1]
                vals = sh[keep]
                yield pd.DataFrame(
                    {
                        id_col: np.repeat(ids, keep.sum(axis=1)),
                        "landmark": vals >> 20,
                        "t": (vals & ((1 << 20) - 1)).astype(np.int32),
                    }
                )

    return audio.select(cols).mapInPandas(run, schema)


def audio_containment(
    audio: DataFrame,
    id_col: str = "audio_id",
    window: int = 1024,
    peaks_per_frame: int = 3,
    fan_dt: int = 3,
    hop: int | None = None,
    min_aligned: int = 6,
    max_entries_per_landmark: int = 64,
) -> DataFrame:
    """Clip-in-track (excerpt / sample) detection: (clip_id, track_id,
    aligned_anchors, frame_offset) for oriented pairs where landmarks
    anchored at ≥ ``min_aligned`` DISTINCT clip frames recur in the
    track AT ONE CONSISTENT frame offset — the Wang 2003 time-offset histogram that
    makes constellation fingerprints excerpt-robust, which shared-count
    scoring (audio_pairs) approximates but cannot localize.

    Plan shape: one groupBy(landmark) shuffle (entries capped at
    ``max_entries_per_landmark`` — a landmark that common is spectral
    boilerplate, the same deterministic hot rule as audio_pairs), ordered
    within-group pair expansion in JVM array algebra, then two narrow
    aggs (offset votes via countDistinct(clip anchor time), best offset
    via max(struct)) and a per-clip span join. The track must be at
    least as long (in landmark span) as the clip.

    By default frames are non-overlapping ``window``-sample slices, so
    detection is at window granularity: excerpts cut mid-window shift
    every rFFT frame and won't vote coherently. Passing ``hop`` (e.g.
    window//2 or window//4) analyzes overlapping frames — hop-granular
    localization for window/hop× the rFFT work, the standard
    overlapping-STFT trade; ``frame_offset`` is then in hop units."""
    lm = audio_landmarks_timed(
        audio,
        id_col=id_col,
        window=window,
        peaks_per_frame=peaks_per_frame,
        fan_dt=fan_dt,
        hop=hop,
    )
    return containment_from_landmarks(
        lm,
        id_col=id_col,
        min_aligned=min_aligned,
        max_entries_per_landmark=max_entries_per_landmark,
    )


def containment_from_landmarks(
    lm: DataFrame,
    id_col: str = "audio_id",
    min_aligned: int = 6,
    max_entries_per_landmark: int = 64,
) -> DataFrame:
    """The offset-vote histogram core of audio_containment, factored out
    so any (id, landmark, t) table can ride it — the rFFT constellation
    lane above, and the compressed-domain MP3 frame-hash lane
    (operators/mp3parse.py), which produces the identical schema with
    landmark = per-frame content hash and t = frame index. Semantics and
    plan shape documented at audio_containment."""
    # the landmark table fans out to three consumers (vote grouping +
    # clip/track span joins); without a checkpoint Spark re-runs the
    # decode+rFFT kernel per consumer — the imagededup signature-reuse
    # idiom (imagededup.py localCheckpoint) applies verbatim
    lm = lm.localCheckpoint(eager=False)
    span = lm.groupBy(F.col(id_col).alias("sid")).agg(
        F.max("t").alias("t_span")
    )
    grouped = (
        lm.groupBy("landmark")
        .agg(F.collect_list(F.struct(F.col(id_col).alias("id"), "t")).alias("es"))
        .where(
            (F.size("es") >= 2) & (F.size("es") <= max_entries_per_landmark)
        )
    )
    pairs = (
        grouped.select(F.explode("es").alias("ea"), "es")
        .select("ea", F.explode("es").alias("eb"))
        .where(F.col("ea.id") != F.col("eb.id"))
    )
    votes = pairs.select(
        F.col("ea.id").alias("clip_id"),
        F.col("eb.id").alias("track_id"),
        (F.col("eb.t") - F.col("ea.t")).alias("dt"),
        F.col("ea.t").alias("clip_t"),
    ).groupBy("clip_id", "track_id", "dt").agg(
        F.countDistinct("clip_t").alias("aligned")
    )
    best = (
        votes.groupBy("clip_id", "track_id")
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
            "track_id",
            F.col("best.aligned").alias("aligned_anchors"),
            (-F.col("best.ndt")).alias("frame_offset"),
        )
    )
    out = (
        best.join(
            span.select(
                F.col("sid").alias("clip_id"), F.col("t_span").alias("clip_span")
            ),
            "clip_id",
        )
        .join(
            span.select(
                F.col("sid").alias("track_id"),
                F.col("t_span").alias("track_span"),
            ),
            "track_id",
        )
    )
    return out.where(
        (F.col("aligned_anchors") >= min_aligned)
        & (F.col("track_span") >= F.col("clip_span"))
    ).select("clip_id", "track_id", "aligned_anchors", "frame_offset")
