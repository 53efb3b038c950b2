#!/usr/bin/env python
"""Image-corpus curation end to end: EXIF GPS/PII scrubbing, quality
filters (blur / entropy / solid-color), and rotation-invariant
near-duplicate clustering — the image axis of the training-data
toolkit. Builds its corpus deterministically (no external data). Run:

    spark-submit --py-files dist/datasketches_cpp_spark.zip \
        examples/image_curation.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from pyspark.sql import SparkSession

from datasketches_cpp_spark.operators.exif import (
    build_exif_app1,
    insert_app1,
    scrub_metadata,
    with_exif,
)
from datasketches_cpp_spark.operators.imagededup import dedup_images
from datasketches_cpp_spark.operators.imagequality import image_quality_stats
from datasketches_cpp_spark.operators.jpegcodec import encode_jpeg
from datasketches_cpp_spark.operators.sigkernel import SigConfig
from datasketches_cpp_spark.sources.images import phash64

spark = SparkSession.builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

# -- deterministic corpus: photos (block texture), placeholders (solid),
#    rotated copies, and a few JPEGs carrying EXIF GPS ---------------------
W = H = 64
rows = []
n_gps_planted = 0
for i in range(40):
    rng = np.random.default_rng(1000 + i)
    if i % 10 == 9:  # solid placeholder
        px = np.full((H, W, 3), 30 + i, np.uint8)
    else:
        small = rng.integers(0, 256, (8, 8, 3), np.uint8)
        px = np.repeat(np.repeat(small, H // 8, axis=0), W // 8, axis=1)
    if i % 4 == 3 and rows[-1][4] == "raw":  # rotated near-copy of previous
        base = np.frombuffer(bytes(rows[-1][1]), np.uint8).reshape(H, W, 3)
        px = np.ascontiguousarray(np.rot90(base, 1 + i % 3, axes=(0, 1)))
    if i % 7 == 2:  # ship as JPEG with planted EXIF GPS
        jp = encode_jpeg(px, W, H, quality=95)
        jp = insert_app1(jp, build_exif_app1(
            make="ACME", gps=(37.0 + i / 10.0, -122.0 - i / 10.0)))
        n_gps_planted += 1
        rows.append((f"img{i:03d}", bytearray(jp), W, H, "jpeg",
                     f"caption {i}", 0))
    else:
        flat = px.reshape(-1)
        rows.append((f"img{i:03d}", bytearray(flat.tobytes()), W, H, "raw",
                     f"caption {i}",
                     int(np.int64(np.uint64(phash64(flat, W, H))))))
images = spark.createDataFrame(
    rows, "image_id string, bytes binary, w int, h int, fmt string, "
          "caption string, phash long")

# -- 1. PII audit + scrub (byte-level, pixels untouched) -------------------
before = with_exif(images)
print(f"EXIF GPS found: {before.filter('has_gps').count()} "
      f"(planted {n_gps_planted})")
clean = scrub_metadata(images)
print(f"metadata removed from {clean.filter('meta_removed').count()} images, "
      f"{clean.agg({'bytes_saved': 'sum'}).collect()[0][0]} bytes saved")
assert with_exif(clean).filter("has_gps").count() == 0

# -- 2. quality filters (raw-pixel rows) -----------------------------------
quality = image_quality_stats(images.filter("fmt = 'raw'"))
low_info = quality.filter("is_low_information").count()
blurry = quality.filter("laplacian_var < 50").count()
print(f"low-information images: {low_info}; blurry: {blurry}")

# -- 3. rotation-invariant near-dup clustering ------------------------------
res = dedup_images(images.filter("fmt = 'raw'"), SigConfig(phash_hamming=6),
                   enable_lanes=("phash",), rotation_invariant=True)
assign = res["assignments"]
n = assign.count()
clusters = assign.select("cluster_id").distinct().count()
print(f"{n} images -> {clusters} clusters "
      f"({n - clusters} rotated/duplicate images folded)")
assert clusters < n  # the planted rotations must fold

print("image curation example OK")
