#!/usr/bin/env python
"""Excerpt/containment detection across all four modalities in one
pass: clips cut out of longer videos, audio excerpts, image crops, and
quoted documents are found and LOCALIZED (exact offset) via Wang-2003
offset-vote histograms — the case near-twin scoring misses (a 30 s
clip inside a 2 h video shares almost none of the long video's frames,
but 100% of its own, all at one temporal offset; same for a 64x64 crop
of a poster or a memo quoted inside a report).

The demo corpus is synthesized deterministically: N long videos
(24 frames) + one planted 8-frame excerpt per tenth video (with pixel
noise), N audio tracks (24 windows of white noise) + one planted
8-window excerpt per tenth track (half cut at a HALF-window boundary
to exercise the overlapping-STFT hop path), N large images + one
planted noisy crop per tenth image, and N documents + one planted
verbatim quote per tenth document. Run:

    spark-submit --py-files dist/datasketches_cpp_spark.zip \
        examples/containment_detection.py [n_media]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from pyspark.sql import SparkSession

from datasketches_cpp_spark.operators.audiodedup import audio_containment
from datasketches_cpp_spark.operators.imagecontainment import image_containment
from datasketches_cpp_spark.operators.sigkernel import SigConfig
from datasketches_cpp_spark.operators.textstats import text_containment
from datasketches_cpp_spark.operators.videodedup import video_containment

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100
W = H = 16
LONG_FRAMES, CLIP_FRAMES, CLIP_AT = 24, 8, 9
WINDOW = 1024


def make_video(seed: int) -> bytes:
    g = np.random.default_rng(seed)
    frames = []
    for _ in range(LONG_FRAMES):
        base = g.integers(0, 256, (H // 4, W // 4, 3), dtype=np.uint8)
        frames.append(np.repeat(np.repeat(base, 4, axis=0), 4, axis=1).tobytes())
    return b"".join(frames)


def noisy_slice(buf: bytes, lo: int, hi: int, seed: int) -> bytes:
    fs = W * H * 3
    arr = np.frombuffer(buf[lo * fs : hi * fs], np.uint8).astype(np.int16)
    gn = np.random.default_rng(seed)
    return np.clip(arr + gn.integers(-2, 3, arr.shape), 0, 255).astype(
        np.uint8
    ).tobytes()


def make_track(seed: int) -> bytes:
    g = np.random.default_rng(seed)
    pcm = np.concatenate(
        [g.normal(size=WINDOW // 2) for _ in range(2 * LONG_FRAMES)]
    )
    return (np.clip(pcm / 4, -1, 1) * 20000).astype("<i2").tobytes()


def make_image(seed: int, w: int = 128, h: int = 96) -> np.ndarray:
    g = np.random.default_rng(seed)
    base = g.integers(0, 256, (h // 8, w // 8, 3), dtype=np.uint8)
    return np.repeat(np.repeat(base, 8, axis=0), 8, axis=1)


def make_doc(seed: int, n_words: int = 60) -> str:
    """Random 6-letter words — a tiny shared vocabulary would make every
    fingerprint corpus-wide boilerplate and the hot-fp cap would (by
    design) drop them all; real documents are mostly non-boilerplate."""
    g = np.random.default_rng(seed)
    letters = g.integers(0, 26, (n_words, 6))
    return " ".join(
        "".join(chr(97 + c) for c in row) for row in letters
    )


def main() -> None:
    spark = SparkSession.builder.appName("containment-demo").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    vrows, v_truth = [], {}
    arows, a_truth = [], {}
    irows, i_truth = [], {}
    trows, t_truth = [], {}
    for i in range(N):
        long_v = make_video(1000 + i)
        vrows.append((f"vid{i:05d}", long_v, W, H, "rawv"))
        track = make_track(5000 + i)
        arows.append((f"trk{i:05d}", track, "pcm16"))
        big = make_image(3000 + i)
        irows.append((f"img{i:05d}", big.tobytes(), 128, 96, "raw"))
        doc = make_doc(7000 + i)
        trows.append((f"doc{i:05d}", doc))
        if i % 10 == 0:
            crop = big[16:80, 32:96]
            gn = np.random.default_rng(i)
            noisy = np.clip(
                crop.astype(np.int16) + gn.integers(-2, 3, crop.shape), 0, 255
            ).astype(np.uint8)
            irows.append((f"icrop{i:05d}", noisy.tobytes(), 64, 64, "raw"))
            i_truth[f"icrop{i:05d}"] = (f"img{i:05d}", 2, 1)
            words = doc.split()
            quote = " ".join(words[15:40])
            trows.append((f"quote{i:05d}", quote))
            t_truth[f"quote{i:05d}"] = (
                f"doc{i:05d}",
                len(" ".join(words[:15])) + 1,
            )
            vrows.append(
                (
                    f"vclip{i:05d}",
                    noisy_slice(long_v, CLIP_AT, CLIP_AT + CLIP_FRAMES, i),
                    W,
                    H,
                    "rawv",
                )
            )
            v_truth[f"vclip{i:05d}"] = (f"vid{i:05d}", CLIP_AT)
            # audio excerpts: even plants cut on the window grid, odd
            # plants on the half-window grid (hop localizes both)
            start_half = 2 * CLIP_AT + (1 if (i // 10) % 2 else 0)
            aclip = track[start_half * WINDOW : (start_half + 16) * WINDOW]
            arows.append((f"aclip{i:05d}", aclip, "pcm16"))
            a_truth[f"aclip{i:05d}"] = (f"trk{i:05d}", start_half)

    videos = spark.createDataFrame(
        vrows, "video_id string, bytes binary, w int, h int, fmt string"
    )
    audio = spark.createDataFrame(
        arows, "audio_id string, bytes binary, fmt string"
    )

    t0 = time.time()
    vhits = {
        r["clip_id"]: (r["container_id"], r["frame_offset"])
        for r in video_containment(
            videos, SigConfig(phash_hamming=6), min_match_frac=0.8
        ).collect()
        if r["clip_id"] in v_truth
    }
    v_recall = sum(vhits.get(c) == t for c, t in v_truth.items()) / len(v_truth)
    t1 = time.time()
    ahits = {
        r["clip_id"]: (r["track_id"], r["frame_offset"])
        for r in audio_containment(
            audio, hop=WINDOW // 2, min_aligned=5
        ).collect()
        if r["clip_id"] in a_truth
    }
    a_recall = sum(ahits.get(c) == t for c, t in a_truth.items()) / len(a_truth)
    t2 = time.time()

    images = spark.createDataFrame(
        irows, "image_id string, bytes binary, w int, h int, fmt string"
    )
    ihits = {
        r["clip_id"]: (r["container_id"], r["dx_tiles"], r["dy_tiles"])
        for r in image_containment(
            images, SigConfig(phash_hamming=6), tile=32, hop=16
        ).collect()
        if r["clip_id"] in i_truth
    }
    i_recall = sum(ihits.get(c) == t for c, t in i_truth.items()) / len(i_truth)
    t3 = time.time()
    docs = spark.createDataFrame(trows, "doc_id string, text string")
    thits = {
        r["clip_id"]: (r["container_id"], r["char_offset"])
        for r in text_containment(docs, min_match_frac=0.8).collect()
        if r["clip_id"] in t_truth
    }
    t_recall = sum(thits.get(c) == t for c, t in t_truth.items()) / len(t_truth)
    t4 = time.time()

    print(
        f"video: {len(v_truth)} planted excerpts, "
        f"recall-with-exact-offset {v_recall:.3f} ({t1 - t0:.1f}s)"
    )
    print(
        f"audio: {len(a_truth)} planted excerpts (half of them half-window "
        f"cuts), recall-with-exact-offset {a_recall:.3f} ({t2 - t1:.1f}s)"
    )
    print(
        f"image: {len(i_truth)} planted crops, "
        f"recall-with-exact-2D-offset {i_recall:.3f} ({t3 - t2:.1f}s)"
    )
    print(
        f"text: {len(t_truth)} planted quotes, "
        f"recall-with-exact-char-offset {t_recall:.3f} ({t4 - t3:.1f}s)"
    )
    assert v_recall == 1.0, vhits
    assert a_recall == 1.0, ahits
    assert i_recall == 1.0, ihits
    assert t_recall == 1.0, thits
    print("containment demo OK")
    spark.stop()


if __name__ == "__main__":
    main()
