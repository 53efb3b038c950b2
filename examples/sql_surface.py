#!/usr/bin/env python
"""Query sketches from pure SQL — the engine's analog of the DataSketches
Hive/Druid/PostgreSQL integrations. Builds theta sketches per order
status, exports them as reference-wire blobs (readable by any Java/C++
DataSketches deployment), then answers distinct-count, set-op, and
similarity questions entirely from spark.sql. Run:

    spark-submit --py-files dist/datasketches_cpp_spark.zip \
        examples/sql_surface.py /root/testdata/sf0.01
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession

from datasketches_cpp_spark.functions.theta import theta_sketch_agg
from datasketches_cpp_spark.functions.thetaserde import with_theta_bytes
from datasketches_cpp_spark.sqlfuncs import register_sketch_sql

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
spark = SparkSession.builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

names = register_sketch_sql(spark)
print(f"registered {len(names)} SQL functions: {', '.join(names)}")

orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
sk = theta_sketch_agg(orders, ["o_orderstatus"], "o_custkey", lg_k=14)
with_theta_bytes(sk).createOrReplaceTempView("status_sketches")

print("\ndistinct custkeys per status, read back through SQL:")
spark.sql(
    """
    SELECT o_orderstatus,
           CAST(ds_theta_estimate(sketch_bytes) AS long)        AS distinct_custkeys,
           CAST(ds_theta_lower_bound(sketch_bytes, 2) AS long)  AS lb,
           CAST(ds_theta_upper_bound(sketch_bytes, 2) AS long)  AS ub
    FROM status_sketches ORDER BY o_orderstatus
    """
).show()

print("grouped union of all statuses (one blob-carrying aggregate):")
spark.sql(
    """
    SELECT CAST(ds_theta_estimate(ds_theta_union(sketch_bytes)) AS long)
             AS custkeys_any_status
    FROM status_sketches
    """
).show()

print("pairwise overlap between the two largest statuses:")
spark.sql(
    """
    WITH ranked AS (
      SELECT sketch_bytes,
             ROW_NUMBER() OVER (ORDER BY ds_theta_estimate(sketch_bytes) DESC) rn
      FROM status_sketches
    )
    SELECT CAST(ds_theta_estimate(ds_theta_intersection(a.sketch_bytes, b.sketch_bytes)) AS long)
             AS custkeys_in_both,
           ROUND(ds_theta_jaccard(a.sketch_bytes, b.sketch_bytes), 4) AS jaccard
    FROM ranked a JOIN ranked b ON a.rn = 1 AND b.rn = 2
    """
).show()

# -- quantile families through SQL: classic k=128 blobs per return flag --
from datasketches_cpp_spark.functions.classic_quantiles import (  # noqa: E402
    classic_quantiles_agg,
)
from datasketches_cpp_spark.functions.classicserde import (  # noqa: E402
    with_classic_bytes,
)

li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
cq = classic_quantiles_agg(li, ["l_returnflag"], "l_extendedprice", k=128)
with_classic_bytes(cq, 128).createOrReplaceTempView("price_sketches")

print("price quantiles per return flag, via ds_classic_quantile:")
spark.sql(
    """
    SELECT l_returnflag,
           ROUND(ds_classic_quantile(sketch_bytes, 0.5), 2)  AS p50,
           ROUND(ds_classic_quantile(sketch_bytes, 0.99), 2) AS p99,
           ROUND(ds_classic_rank(sketch_bytes, 50000.0), 4)  AS rank_50k
    FROM price_sketches ORDER BY l_returnflag
    """
).show()

spark.stop()
