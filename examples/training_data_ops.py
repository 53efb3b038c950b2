#!/usr/bin/env python
"""The training-data curation toolkit in one pass: semantic dedup over
embeddings (SemDeDup), winnowing fingerprints + exact/near text dedup
signals, quality + language + token stats — each a handful of DataFrame
ops over the driver tables. Run:

    spark-submit --py-files dist/datasketches_cpp_spark.zip \
        examples/training_data_ops.py /root/testdata/sf0.01
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import pyspark.sql.functions as F
from pyspark.sql import SparkSession

from datasketches_cpp_spark.operators.knn import semantic_dedup
from datasketches_cpp_spark.operators.textstats import (
    with_bpe_token_estimate,
    with_fingerprint,
    with_language_id,
    with_quality_score,
    with_token_count,
    winnow_fingerprints,
)

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
spark = SparkSession.builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

# -- semantic dedup (SemDeDup): k-means buckets + within-bucket cosine ------
sem = semantic_dedup(emb, "vec_id", "embedding", threshold=0.4, n_centroids=16)
kept = sem.where("is_kept").count()
print(f"semantic dedup: {emb.count()} vectors -> {kept} kept")

# -- winnowing fingerprints: substring-robust doc fingerprints ---------------
fps = winnow_fingerprints(docs, "doc_id", "text", k=8, w=4)
fp_counts = fps.groupBy("doc_id").count().withColumnRenamed("count", "n_fp")
shared = (
    fps.alias("x")
    .join(fps.alias("y"), (F.col("x.fp") == F.col("y.fp")) & (F.col("x.doc_id") < F.col("y.doc_id")))
    .groupBy(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
    .agg(F.count("*").alias("n_shared"))
    .join(fp_counts.select(F.col("doc_id").alias("a"), F.col("n_fp").alias("n_a")), "a")
    .join(fp_counts.select(F.col("doc_id").alias("b"), F.col("n_fp").alias("n_b")), "b")
    # containment: the smaller doc's fingerprints mostly inside the other's
    .where(F.col("n_shared") / F.least("n_a", "n_b") >= 0.8)
)
print("winnowing containment candidates (>=80% of the smaller side):", shared.count())

# -- per-document curation stats: pure JVM expressions ------------------------
stats = with_bpe_token_estimate(
    with_quality_score(with_language_id(with_fingerprint(docs, "text"), "text"), "text"),
    "text",
)
stats.select(
    "doc_id", "lang_guess", "quality_score", "token_count", "bpe_token_est"
).show(5, truncate=False)
print(
    "corpus:",
    stats.agg(
        F.countDistinct("fingerprint").alias("distinct_fingerprints"),
        F.avg("quality_score").alias("avg_quality"),
        F.sum("token_count").alias("total_tokens"),
    ).collect(),
)
spark.stop()
