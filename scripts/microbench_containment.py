#!/usr/bin/env python
"""Throughput of the containment lanes on a synthesized corpus: N large
images (with planted crops), N documents (with planted quotes), N audio
tracks (with planted excerpts) — wall time, media/sec, and planted
recall-with-exact-offset for each lane on local[CPUS].

Writes one JSON line; give --out a NEW filename (never point it at
committed evidence)."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

import numpy as np  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2000)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--lanes", default="image,text,audio",
        help="comma list from image,text,audio,video",
    )
    args = ap.parse_args()
    lanes = set(args.lanes.split(","))

    from datasketches_cpp_spark.operators.audiodedup import audio_containment
    from datasketches_cpp_spark.operators.imagecontainment import (
        image_containment,
    )
    from datasketches_cpp_spark.operators.sigkernel import SigConfig
    from datasketches_cpp_spark.operators.textstats import text_containment
    from datasketches_cpp_spark.operators.videodedup import video_containment
    from datasketches_cpp_spark.session import get_spark

    spark = get_spark(master=f"local[{args.cpus}]", app_name="containment-bench")
    spark.sparkContext.setLogLevel("ERROR")
    n = args.n

    g = np.random.default_rng(4)
    irows, i_truth = [], {}
    trows, t_truth = [], {}
    arows, a_truth = [], {}
    window = 1024
    letters = "abcdefghijklmnopqrstuvwxyz"
    for i in range(n):
        base = g.integers(0, 256, (12, 16, 3), dtype=np.uint8)
        big = np.repeat(np.repeat(base, 8, axis=0), 8, axis=1)  # 128x96
        irows.append((f"img{i:06d}", big.tobytes(), 128, 96, "raw"))
        words = [
            "".join(letters[c] for c in g.integers(0, 26, 6)) for _ in range(60)
        ]
        trows.append((f"doc{i:06d}", " ".join(words)))
        pcm = np.clip(
            g.normal(size=24 * window) / 4, -1, 1
        )
        track = (pcm * 20000).astype("<i2").tobytes()
        arows.append((f"trk{i:06d}", track, "pcm16"))
        if i % 20 == 0:
            crop = big[16:80, 32:96].astype(np.int16)
            noisy = np.clip(
                crop + g.integers(-2, 3, crop.shape), 0, 255
            ).astype(np.uint8)
            irows.append((f"crop{i:06d}", noisy.tobytes(), 64, 64, "raw"))
            i_truth[f"crop{i:06d}"] = (f"img{i:06d}", 2, 1)
            quote = " ".join(words[15:40])
            trows.append((f"quo{i:06d}", quote))
            t_truth[f"quo{i:06d}"] = (
                f"doc{i:06d}", len(" ".join(words[:15])) + 1,
            )
            aclip = track[18 * window : 34 * window]  # windows 9..16
            arows.append((f"acl{i:06d}", aclip, "pcm16"))
            a_truth[f"acl{i:06d}"] = (f"trk{i:06d}", 9)

    timings, recalls = {}, {}

    if "video" in lanes:
        vrows, v_truth = [], {}
        for i in range(n):
            frames = []
            for _ in range(24):
                b = g.integers(0, 256, (4, 4, 3), dtype=np.uint8)
                frames.append(
                    np.repeat(np.repeat(b, 4, axis=0), 4, axis=1).tobytes()
                )
            vid = b"".join(frames)
            vrows.append((f"vid{i:06d}", vid, 16, 16, "rawv"))
            if i % 20 == 0:
                fs = 16 * 16 * 3
                clip = np.frombuffer(
                    vid[9 * fs : 17 * fs], np.uint8
                ).astype(np.int16)
                noisy = np.clip(
                    clip + g.integers(-2, 3, clip.shape), 0, 255
                ).astype(np.uint8)
                vrows.append((f"vcl{i:06d}", noisy.tobytes(), 16, 16, "rawv"))
                v_truth[f"vcl{i:06d}"] = (f"vid{i:06d}", 9)
        videos = spark.createDataFrame(
            vrows, "video_id string, bytes binary, w int, h int, fmt string"
        )
        t0 = time.time()
        hits = {
            r["clip_id"]: (r["container_id"], r["frame_offset"])
            for r in video_containment(
                videos, SigConfig(phash_hamming=6), min_match_frac=0.8
            ).collect()
            if r["clip_id"] in v_truth
        }
        timings["video"] = round(time.time() - t0, 3)
        recalls["video"] = sum(
            hits.get(c) == t for c, t in v_truth.items()
        ) / len(v_truth)

    if "image" in lanes:
        images = spark.createDataFrame(
            irows, "image_id string, bytes binary, w int, h int, fmt string"
        )
        t0 = time.time()
        hits = {
            r["clip_id"]: (r["container_id"], r["dx_tiles"], r["dy_tiles"])
            for r in image_containment(
                images, SigConfig(phash_hamming=6), tile=32, hop=16
            ).collect()
            if r["clip_id"] in i_truth
        }
        timings["image"] = round(time.time() - t0, 3)
        recalls["image"] = sum(
            hits.get(c) == t for c, t in i_truth.items()
        ) / len(i_truth)

    if "text" in lanes:
        docs = spark.createDataFrame(trows, "doc_id string, text string")
        t0 = time.time()
        hits = {
            r["clip_id"]: (r["container_id"], r["char_offset"])
            for r in text_containment(docs, min_match_frac=0.8).collect()
            if r["clip_id"] in t_truth
        }
        timings["text"] = round(time.time() - t0, 3)
        recalls["text"] = sum(
            hits.get(c) == t for c, t in t_truth.items()
        ) / len(t_truth)

    if "audio" in lanes:
        audio = spark.createDataFrame(
            arows, "audio_id string, bytes binary, fmt string"
        )
        t0 = time.time()
        hits = {
            r["clip_id"]: (r["track_id"], r["frame_offset"])
            for r in audio_containment(audio, min_aligned=5).collect()
            if r["clip_id"] in a_truth
        }
        timings["audio"] = round(time.time() - t0, 3)
        recalls["audio"] = sum(
            hits.get(c) == t for c, t in a_truth.items()
        ) / len(a_truth)

    line = json.dumps(
        {
            "metric": "containment-lane wall sec (media/sec) + planted recall",
            "n_media": n,
            "cpus": args.cpus,
            "timings_sec": timings,
            "media_per_sec": {
                k: round(n / v, 1) for k, v in timings.items()
            },
            "recall_exact_offset": recalls,
        }
    )
    print(line)
    if args.out:
        if os.path.exists(args.out):
            raise SystemExit(f"refusing to overwrite {args.out}")
        with open(args.out, "w") as f:
            f.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
