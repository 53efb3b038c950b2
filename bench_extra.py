#!/usr/bin/env python
"""Round-6 optimization profiler (guide §1). NOT the frozen bench.

Times individual bench queries (same callables bench.py times, same
actions) with setJobDescription labels, optional repeated passes, and
optional .explain("formatted") capture to plans/r06/.

Usage:
  python bench_extra.py [--sf /root/testdata/sf1.0] [--passes 2]
                        [--queries substring,doc_dedup] [--explain before]
                        [--flagship] [--noop]

--noop times query DataFrames with the noop sink (guide §1.4) instead of
the bench's count()/collect() action, isolating computation from result
collection. Output: one JSON line per query to stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--queries", default="")
    ap.add_argument("--explain", default="", help="suffix for plans/r06/<q>_<suffix>.txt")
    ap.add_argument("--flagship", action="store_true")
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--images", type=int, default=int(os.environ.get("BENCH_IMAGES", "50000")))
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from datasketches_cpp_spark.session import get_spark

    spark = get_spark(master=f"local[{cpus}]", app_name="bench_extra")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    sf_dir = args.sf

    # identical action shapes to bench.py
    bench_queries = {
        "doc_dedup": lambda: entry_mod.q_lsh_dedup_clusters(spark, sf_dir),
        "theta_distinct": lambda: entry_mod.q_theta_distinct_orderkey(spark, sf_dir),
        "theta_setops": lambda: entry_mod.q_theta_intersection_custkeys(spark, sf_dir),
        "frequent_items": lambda: entry_mod.q_frequent_event_types(spark, sf_dir),
        "events_hourly": lambda: entry_mod.q_events_hourly(spark, sf_dir),
        "knn": lambda: entry_mod.q_knn_bruteforce(spark, sf_dir),
        "substring": lambda: entry_mod.q_substring_pairs(spark, sf_dir),
        "text_quality": lambda: entry_mod.q_text_quality(spark, sf_dir),
        "tdigest_tails": lambda: entry_mod.q_tdigest_price_tails(spark, sf_dir),
        "tuple_setops": lambda: entry_mod.q_tuple_epoch_setops(spark, sf_dir),
        "ebpps_sample": lambda: entry_mod.q_ebpps_sample_exact(spark, sf_dir),
        "cpc_distinct": lambda: entry_mod.q_cpc_distinct_coverage(spark, sf_dir),
        "hll_registers": lambda: entry_mod.q_hll_sketch_coverage(spark, sf_dir),
        "classic_quantiles": lambda: entry_mod.q_classic_quantiles_coverage(spark, sf_dir),
        "kll_rank": lambda: entry_mod.q_kll_rank_coverage(spark, sf_dir),
        "stratified_qa": lambda: entry_mod.q_stratified_sample_qa(spark, sf_dir),
        "curation_decontam": lambda: entry_mod.q_decontaminate_train(spark, sf_dir),
    }
    count_actions = {"doc_dedup", "events_hourly", "knn", "substring",
                     "text_quality", "curation_decontam"}

    names = [n for n in args.queries.split(",") if n] or list(bench_queries)
    results: dict[str, list[float]] = {}

    if args.explain:
        os.makedirs("plans/r06", exist_ok=True)
        for name in names:
            if name not in bench_queries:
                continue
            df = bench_queries[name]()
            with open(f"plans/r06/{name}_{args.explain}.txt", "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))

    for p in range(args.passes):
        for name in names:
            if name == "flagship" or name not in bench_queries:
                continue
            spark.sparkContext.setJobDescription(f"r06:{name}:pass{p}")
            t0 = time.time()
            df = bench_queries[name]()
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            elif name in count_actions:
                df.count()
            else:
                df.collect()
            dt = round(time.time() - t0, 3)
            results.setdefault(name, []).append(dt)
            spark.sparkContext.setJobDescription(None)

    if args.flagship:
        from datasketches_cpp_spark.operators.imagededup import dedup_images
        from datasketches_cpp_spark.operators.sigkernel import SigConfig

        img_cfg = SigConfig(num_perm=64, bands=32, kmv_k=128, shingle_w=3, jaccard_threshold=0.5)
        bytes_cfg = SigConfig(num_perm=64, bands=16, kmv_k=128, shingle_w=16, jaccard_threshold=0.9)
        cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 ".bench_data", f"images_{args.images}_s42")
        img_parquet = os.path.join(cache_dir, "images.parquet")
        if not os.path.exists(img_parquet):
            from datasketches_cpp_spark.sources.images import write_images_parquet
            os.makedirs(cache_dir, exist_ok=True)
            write_images_parquet(cache_dir, args.images, seed=42)
        # warmup like bench.py
        warm = spark.read.parquet(img_parquet).limit(max(1000, args.images // 50))
        dedup_images(warm, img_cfg, bytes_cfg, byte_stride=4)["assignments"].count()
        for p in range(args.passes):
            spark.sparkContext.setJobDescription(f"r06:flagship:pass{p}")
            t0 = time.time()
            images = spark.read.parquet(img_parquet)
            res = dedup_images(images, img_cfg, bytes_cfg, byte_stride=4)
            n = res["assignments"].count()
            dt = round(time.time() - t0, 3)
            assert n == args.images
            results.setdefault("image_dedup", []).append(dt)
            spark.sparkContext.setJobDescription(None)

    out = {
        "sf_dir": sf_dir,
        "passes": args.passes,
        "noop": args.noop,
        "samples": results,
        "min": {k: min(v) for k, v in results.items()},
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
