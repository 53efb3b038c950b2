#!/usr/bin/env python
"""spark-submit entrypoint: run the flagship multi-lane image dedup once
and print a JSON timing line. Used by scripts/scaling_bench.py at two
parallelism levels (the sandbox stand-in for N vs 4N executors).

    spark-submit --master local[8] --py-files dist/datasketches_cpp_spark.zip \
        scripts/run_pipeline.py <images.parquet> [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    img_parquet = sys.argv[1]
    out_path = sys.argv[2] if len(sys.argv) > 2 else None

    import os

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    master = spark.conf.get("spark.master")

    from datasketches_cpp_spark.operators.imagededup import dedup_images
    from datasketches_cpp_spark.operators.sigkernel import SigConfig

    img_cfg = SigConfig(num_perm=64, bands=32, kmv_k=128, shingle_w=3, jaccard_threshold=0.5)
    bytes_cfg = SigConfig(num_perm=64, bands=16, kmv_k=128, shingle_w=16, jaccard_threshold=0.9)

    images = spark.read.parquet(img_parquet)
    n = images.count()

    phases: dict = {}
    profile = os.environ.get("PIPE_PHASES") == "1"

    t0 = time.time()
    res = dedup_images(
        images, img_cfg, bytes_cfg, byte_stride=4,
        profile=phases if profile else None,
    )
    tp = time.time()
    # single publish action: row count AND the partition-order-insensitive
    # checksum (proves the two cluster-size runs computed the identical
    # result) come from ONE aggregate — not a count job plus a checksum job
    import pyspark.sql.functions as F

    pub = res["assignments"].agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64("id", "cluster_id").cast("decimal(38,0)")).alias("cs"),
    ).collect()[0]
    n_assigned, checksum = int(pub["n"]), pub["cs"]
    wall = time.time() - t0
    if profile:
        from datasketches_cpp_spark.operators import cc

        phases["final_assign"] = round(time.time() - tp, 2)
        phases["cc_stats"] = dict(cc.LAST_STATS)
    assert n_assigned == n

    out = {
        "master": master,
        "images": n,
        "wall_sec": round(wall, 3),
        "images_per_sec": round(n / wall, 2),
        "assignments_checksum": str(checksum),
    }
    if phases:
        out["phases"] = phases
    print(json.dumps(out))
    if out_path:
        # never silently clobber committed benchmark evidence: a round-3
        # side-effect re-run overwrote the cited 500k scaling JSONs with a
        # 20k probe. Refuse to overwrite an existing file unless the caller
        # explicitly opts in with RUN_PIPELINE_OVERWRITE=1.
        if os.path.exists(out_path) and os.environ.get("RUN_PIPELINE_OVERWRITE") != "1":
            raise SystemExit(
                f"refusing to overwrite existing {out_path} "
                "(set RUN_PIPELINE_OVERWRITE=1 or pick a new filename; "
                "committed evidence files must not be clobbered by re-runs)"
            )
        with open(out_path, "w") as f:
            json.dump(out, f)
    spark.stop()


if __name__ == "__main__":
    main()
