#!/usr/bin/env python
"""End-to-end crawl-to-clean-corpus flow: WebDataset-style tar shards →
canonical image+caption table → multi-lane dedup → pair-level quality
metrics vs ground truth → keep-best representative selection. Run:

    spark-submit --py-files dist/datasketches_cpp_spark.zip \
        examples/tar_ingest_dedup.py [n_images] [shard_dir]

With no shard_dir the demo synthesizes a deterministic mixed-codec
corpus (raw/png/bmp/ppm/tiff rotation — gif sits out, its exact-palette
contract refuses the noise corpus) as shards first, so the lossless
pure-numpy decoders all run executor-side during ingest.
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from datasketches_cpp_spark.operators.evaldedup import (
    pair_confusion,
    recall_by_kind,
)
from datasketches_cpp_spark.operators.dedup import select_representatives
from datasketches_cpp_spark.operators.imagededup import dedup_images
from datasketches_cpp_spark.operators.sigkernel import SigConfig
from datasketches_cpp_spark.sources.tarshards import (
    read_tar_shards,
    write_tar_shards,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2000

spark = (
    SparkSession.builder.master(os.environ.get("SPARK_MASTER", "local[8]"))
    .appName("tar_ingest_dedup")
    .config("spark.sql.shuffle.partitions", "16")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

if len(sys.argv) > 2:
    shard_dir = sys.argv[2]
else:
    shard_dir = os.path.join(tempfile.gettempdir(), f"tar_demo_{N}")
    if not os.path.exists(os.path.join(shard_dir, "images_truth.parquet")):
        write_tar_shards(shard_dir, N, seed=11, fmt="mixed",
                         images_per_shard=500)
        print(f"synthesized shards -> {shard_dir}")

# 1. ingest: shards -> canonical table (decode + header sniff + pHash
#    all executor-side, one task per shard)
images = read_tar_shards(spark, shard_dir)
print("ingested:", images.count(), "images")
print(images.groupBy("fmt").count().orderBy("fmt").toPandas().to_string(index=False))

# 2. dedup: all four lanes, threshold tuned to also catch the planted
#    ~0.6-Jaccard caption edits
res = dedup_images(images, SigConfig(jaccard_threshold=0.55))
assignments = res["assignments"]

# 3. measure against ground truth (written next to the shards)
truth = spark.read.parquet(os.path.join(shard_dir, "images_truth.parquet"))
print("\npair confusion:")
print(pair_confusion(assignments, truth).toPandas().to_string(index=False))
print("\nrecall by planted kind:")
print(
    recall_by_kind(assignments, truth)
    .orderBy("dup_kind")
    .toPandas()
    .to_string(index=False)
)

# 4. keep the best representative per cluster (longest caption wins)
scores = images.select(
    F.col("image_id").alias("id"), F.length("caption").alias("score")
)
reps = select_representatives(assignments, scores, "id", "score")
print(
    f"\nkept {reps.filter('is_kept').count()} representatives "
    f"of {assignments.count()} images"
)
spark.stop()
