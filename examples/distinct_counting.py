#!/usr/bin/env python
"""Distinct counting four ways (theta / HLL builtin / HLL registers / CPC)
over one table, with bounds — the engine's side-by-side of the reference's
CrossCountingTest. Run:

    spark-submit --py-files dist/datasketches_cpp_spark.zip \
        examples/distinct_counting.py /root/testdata/sf0.01
"""
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession

from datasketches_cpp_spark.functions.cpc import cpc_sketch_agg, with_estimate as cpc_est
from datasketches_cpp_spark.functions.hll import hll_distinct_agg, hll_sketch_agg
from datasketches_cpp_spark.functions.theta import theta_sketch_agg, with_estimate

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
spark = SparkSession.builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")

print("theta:", with_estimate(theta_sketch_agg(li, [], "l_partkey", lg_k=12)).select("estimate", "lower_bound", "upper_bound").collect())
print("hll++ :", hll_distinct_agg(li, [], "l_partkey", lg_k=12).collect())
print("hll-8:", hll_sketch_agg(li, [], "l_partkey", lg_k=12).collect())
print("cpc  :", cpc_est(cpc_sketch_agg(li, [], "l_partkey", lg_k=12)).select("estimate", "lower_bound", "upper_bound").collect())
print("exact:", li.selectExpr("count(distinct l_partkey)").collect())
