#!/usr/bin/env python
"""Cross-language wire interop: build sketches in Spark, export them as
reference-format byte blobs in a parquet table, read them back — the
exchange path a mixed Java/C++/PySpark DataSketches deployment uses.

    spark-submit --master local[4] examples/wire_interop.py [workdir]

What it shows:
  1. theta sketches → compressed v4 blobs → parquet → reimport → set ops
  2. classic quantiles (the Java-binary-compatible k=128 family) → family-8
     blobs → reimport → quantile queries
  3. parsing the reference's OWN golden binaries (if /root/reference is
     present) — the same streams datasketches-java wrote
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import SparkSession


def main() -> None:
    workdir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="interop_")
    spark = (
        SparkSession.builder.master(os.environ.get("SPARK_MASTER", "local[4]"))
        .appName("wire_interop")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from datasketches_cpp_spark.functions.classic_quantiles import (
        ClassicQuantilesSketch,
        classic_quantiles_agg,
    )
    from datasketches_cpp_spark.functions.classicserde import (
        classic_from_bytes,
        with_classic_bytes,
    )
    from datasketches_cpp_spark.functions.theta import theta_sketch_agg, with_estimate
    from datasketches_cpp_spark.functions.thetaserde import (
        theta_from_bytes,
        with_theta_bytes,
    )

    # -- 1. theta: Spark → wire blobs → parquet → reimport ------------------
    df = spark.range(0, 300_000).select(
        F.col("id"), (F.col("id") % 4).alias("segment")
    )
    sk = theta_sketch_agg(df, ["segment"], "id", lg_k=12)
    blob_path = os.path.join(workdir, "theta_blobs.parquet")
    with_theta_bytes(sk, compressed=True).select("segment", "sketch_bytes").write.mode(
        "overwrite"
    ).parquet(blob_path)
    # ...any DataSketches deployment can now read that parquet column; we
    # reimport it ourselves and finish with estimates:
    back = theta_from_bytes(spark.read.parquet(blob_path))
    print("theta estimates from reimported wire blobs:")
    for r in with_estimate(back).orderBy("segment").collect():
        print(f"  segment {r['segment']}: ~{r['estimate']:.0f} distinct")

    # -- 2. classic quantiles family 8 --------------------------------------
    vals = df.select("segment", (F.col("id") % 10_000).cast("double").alias("v"))
    cq = classic_quantiles_agg(vals, ["segment"], "v", k=128)
    cq_blobs = with_classic_bytes(cq, k=128).select("segment", "sketch_bytes")
    cq_path = os.path.join(workdir, "classic_blobs.parquet")
    cq_blobs.write.mode("overwrite").parquet(cq_path)
    back_cq = classic_from_bytes(spark.read.parquet(cq_path), k=128)
    print("classic-quantiles medians from reimported family-8 blobs:")
    for row in back_cq.orderBy("segment").collect():
        sk2 = ClassicQuantilesSketch.from_row(128, 9001, row.asDict())
        print(f"  segment {row['segment']}: median ≈ {sk2.get_quantile(0.5):.0f}")

    # -- 3. CPC: the fully-compressed family 16 ------------------------------
    from datasketches_cpp_spark.functions.cpc import cpc_sketch_agg
    from datasketches_cpp_spark.functions.cpc import with_estimate as cpc_estimate
    from datasketches_cpp_spark.functions.cpcserde import (
        cpc_from_bytes,
        with_cpc_bytes,
    )

    cpc = cpc_sketch_agg(df, ["segment"], "id", lg_k=11)
    cpc_path = os.path.join(workdir, "cpc_blobs.parquet")
    with_cpc_bytes(cpc).select("segment", "sketch_bytes").write.mode(
        "overwrite"
    ).parquet(cpc_path)
    back_cpc = cpc_from_bytes(spark.read.parquet(cpc_path))
    print("cpc estimates from reimported compressed family-16 blobs:")
    for r in cpc_estimate(back_cpc).orderBy("segment").collect():
        print(f"  segment {r['segment']}: ~{r['estimate']:.0f} distinct")

    # -- 4. the reference's own golden binaries ------------------------------
    ref = "/root/reference"
    if os.path.isdir(ref):
        from datasketches_cpp_spark import kmv
        from datasketches_cpp_spark.functions.classicserde import deserialize_classic
        from datasketches_cpp_spark.functions.thetaserde import deserialize_compact

        with open(
            os.path.join(ref, "theta/test/theta_compact_estimation_from_java_v1.sk"), "rb"
        ) as f:
            theta, sig = deserialize_compact(f.read())
        print(
            f"golden theta (written by datasketches-java, v1 format): "
            f"{len(sig)} entries, estimate {kmv.estimate(theta, len(sig)):.2f}"
        )
        with open(os.path.join(ref, "quantiles/test/Qk128_n1000_v0.3.0.sk"), "rb") as f:
            cqs = deserialize_classic(f.read())
        print(
            f"golden classic quantiles (Java v0.3.0 layout): n={cqs.n}, "
            f"median {cqs.get_quantile(0.5)}"
        )

    spark.stop()


if __name__ == "__main__":
    main()
