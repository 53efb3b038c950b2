#!/usr/bin/env python
"""Quantiles three ways: KLL (uniform rank error), REQ (relative tail
error), t-digest (tail-accurate centroids) — plus the exact answer. Run:

    spark-submit --py-files dist/datasketches_cpp_spark.zip \
        examples/quantiles_tails.py /root/testdata/sf0.01
"""
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import pyspark.sql.functions as F
from pyspark.sql import SparkSession

from datasketches_cpp_spark.functions.quantiles import kll_sketch_agg, with_quantiles
from datasketches_cpp_spark.functions.req import req_sketch_agg, with_req_quantiles
from datasketches_cpp_spark.functions.tdigest import tdigest_agg, with_tdigest_quantiles

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
spark = SparkSession.builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
RANKS = [0.5, 0.99, 0.999]

print("kll    :", with_quantiles(kll_sketch_agg(li, [], "l_extendedprice", k=200), RANKS).select("kll_n", "quantiles").collect())
print("req    :", with_req_quantiles(req_sketch_agg(li, [], "l_extendedprice", k=12), RANKS).collect())
print("tdigest:", with_tdigest_quantiles(tdigest_agg(li, [], "l_extendedprice", delta=200), RANKS).collect())
print("exact  :", li.agg(*[F.expr(f"percentile(l_extendedprice, {q})").alias(f"p{q}") for q in RANKS]).collect())
