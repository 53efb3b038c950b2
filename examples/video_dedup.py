#!/usr/bin/env python
"""Video near-duplicate detection in one pass: frame-sample → per-frame
pHash → fused band lane → frame-count pair scoring → clusters. The demo
corpus is synthesized deterministically (rawv = concatenated raw RGB
frames) with planted noisy twins, so recall is checkable. Run:

    spark-submit --py-files dist/datasketches_cpp_spark.zip \
        examples/video_dedup.py [n_videos]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import SparkSession

from datasketches_cpp_spark.operators.sigkernel import SigConfig
from datasketches_cpp_spark.operators.videodedup import dedup_videos

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200
W = H = 16
FRAMES = 8
rng = np.random.default_rng(7)


def make_video(seed: int, noise: bool) -> bytes:
    g = np.random.default_rng(seed)          # base content stream
    gn = np.random.default_rng(seed + 10**6)  # separate noise stream, so the
    frames = []                               # twin's base frames match exactly
    for _ in range(FRAMES):
        base = g.integers(0, 256, (H // 4, W // 4, 3), dtype=np.uint8)
        f = np.repeat(np.repeat(base, 4, axis=0), 4, axis=1)
        if noise:
            f = np.clip(
                f.astype(np.int16) + gn.integers(-2, 3, f.shape), 0, 255
            ).astype(np.uint8)
        frames.append(f.tobytes())
    return b"".join(frames)


rows, truth = [], {}
for i in range(N):
    if i % 4 == 3:  # every 4th video is a noisy twin of the previous one
        rows.append((f"v{i:05d}", make_video(i - 1, noise=True), W, H, "rawv"))
        truth[f"v{i:05d}"] = f"v{i - 1:05d}"
    else:
        rows.append((f"v{i:05d}", make_video(i, noise=False), W, H, "rawv"))

spark = SparkSession.builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
videos = spark.createDataFrame(
    rows, "video_id string, bytes binary, w int, h int, fmt string"
)

res = dedup_videos(videos, SigConfig(phash_hamming=6), every_k=2,
                   min_matching_frames=2)
assign = {r["id"]: r["cluster_id"] for r in res["assignments"].collect()}
planted_found = sum(1 for twin, orig in truth.items()
                    if assign[twin] == assign[orig])
n_clusters = len(set(assign.values()))
print(f"{N} videos -> {n_clusters} clusters; "
      f"planted-twin recall {planted_found}/{len(truth)}")
print("top pairs by matched frames:")
res["pairs"].orderBy(F.desc("matched_frames")).show(5, truncate=False)
assert planted_found == len(truth), "missed a planted near-dup twin"
spark.stop()
