#!/usr/bin/env python
"""Audio near-duplicate detection in one pass: spectral landmark
fingerprints (constellation hashing) → shared-count pair scoring →
clusters. The demo corpus is deterministic PCM16 sine mixes with planted
noisy twins, so recall is checkable. Run:

    spark-submit --py-files dist/datasketches_cpp_spark.zip \
        examples/audio_dedup.py [n_clips]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import SparkSession

from datasketches_cpp_spark.operators.audiodedup import dedup_audio

N = int(sys.argv[1]) if len(sys.argv) > 1 else 150
WINDOW, FRAMES = 1024, 8


def make_clip(base_bin: int, noise_seed=None) -> bytes:
    t = np.arange(FRAMES * WINDOW)
    x = sum(
        a * np.sin(2 * np.pi * b * t / WINDOW)
        for b, a in zip((base_bin, base_bin + 70, base_bin + 160), (1.0, 0.8, 0.6))
    )
    if noise_seed is not None:
        x = x + np.random.default_rng(noise_seed).normal(0, 0.002, x.shape)
    return (np.clip(x, -1, 1) * 20000).astype("<i2").tobytes()


rows, truth = [], {}
for i in range(N):
    aid = f"a{i:05d}"
    if i % 3 == 2:  # every 3rd clip is a noisy twin of its predecessor
        rows.append((aid, make_clip(20 + 2 * (i - 1), noise_seed=i), "pcm16"))
        truth[aid] = f"a{i - 1:05d}"
    else:
        rows.append((aid, make_clip(20 + 2 * i), "pcm16"))

spark = SparkSession.builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
audio = spark.createDataFrame(rows, "audio_id string, bytes binary, fmt string")

res = dedup_audio(audio, min_shared=8)
assign = {r["id"]: r["cluster_id"] for r in res["assignments"].collect()}
found = sum(1 for twin, orig in truth.items() if assign[twin] == assign[orig])
print(f"{N} clips -> {len(set(assign.values()))} clusters; "
      f"planted-twin recall {found}/{len(truth)}")
print("top pairs by shared landmarks:")
res["pairs"].orderBy(F.desc("shared_landmarks")).show(5, truncate=False)
assert found == len(truth), "missed a planted near-dup twin"
spark.stop()
