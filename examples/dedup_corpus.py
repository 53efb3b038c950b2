#!/usr/bin/env python
"""Near-duplicate detection + clustering over a text corpus in ~10 lines:
MinHash signatures -> LSH banding -> verification -> connected components.
Run:

    spark-submit --py-files dist/datasketches_cpp_spark.zip \
        examples/dedup_corpus.py /root/testdata/sf0.01
"""
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession

from datasketches_cpp_spark.operators.dedup import cluster_stats, dedup, duplicate_rate
from datasketches_cpp_spark.operators.sigkernel import SigConfig

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
spark = SparkSession.builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

cfg = SigConfig(num_perm=64, bands=32, kmv_k=128, shingle_w=2, jaccard_threshold=0.5)
assignments, verified_pairs, signatures = dedup(
    docs, "doc_id", "text", cfg,
    hot_policy="chain_hub",   # or "salted_full" for exact pair semantics under skew
)
print("clusters by size:", cluster_stats(assignments).collect())
print("dup rate:", duplicate_rate(assignments).collect())
print("sample verified pairs:", verified_pairs.limit(3).collect())
