#!/usr/bin/env python
"""Per-epoch cost of the streaming deduper's cluster maintenance as
history grows: the incremental path (contract new edges to touched
clusters, rewrite only the frontier) should hold FLAT per-epoch wall,
while the full-recompute reference (assign_clusters over ALL
accumulated ids+edges, what a naive per-epoch publish costs) grows with
corpus size. Asserts the correctness law every epoch (incremental
assignments checksum == full recompute checksum) so the speed claim is
never divorced from the equality claim.

Usage: python scripts/microbench_inc_cc.py [--epochs 12] [--rows 1500]
           [--out /tmp/inc_cc.json]
Refuses to overwrite an existing --out (bench-evidence no-clobber rule).
"""
import argparse
import json
import os
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--rows", type=int, default=1500)
    ap.add_argument("--dup-ratio", type=float, default=0.3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.out and os.path.exists(args.out):
        sys.exit(f"refusing to overwrite {args.out}; pick a new --out")

    from pyspark.sql import SparkSession

    from datasketches_cpp_spark.operators.cc import assign_clusters
    from datasketches_cpp_spark.operators.sigkernel import SigConfig
    from datasketches_cpp_spark.plans.checkpoint import checksum
    from datasketches_cpp_spark.streaming.incremental import IncrementalDeduper

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]"
        )
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("microbench_inc_cc")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    schema = ("image_id string, bytes binary, w int, h int, fmt string, "
              "caption string, phash long")

    def batch(ep: int):
        """args.rows rows; a dup_ratio slice re-crawls content from an
        EARLIER epoch (cross-epoch exact twins — every epoch both grows
        old clusters and mints new ones, the merge-heavy regime)."""
        n_dup = int(args.rows * args.dup_ratio) if ep else 0
        rows = []
        for i in range(args.rows):
            if i < n_dup:
                src_ep, src_i = (ep - 1) % max(ep, 1), i
            else:
                src_ep, src_i = ep, i
            content = (src_ep * 1_000_003 + src_i) % 251
            rows.append((
                f"e{ep:03d}_{i:05d}",
                bytearray([content, (content * 7) % 251] * 32),
                4, 4, "raw",
                f"synthetic caption {src_ep} {src_i} "
                f"{'alpha beta gamma delta epsilon zeta'[(src_i * 5) % 30:]}",
                0,
            ))
        return spark.createDataFrame(rows, schema)

    dd = IncrementalDeduper(
        spark, tempfile.mkdtemp(prefix="inc_cc_bench_"), SigConfig(),
        enable_lanes=("bytes",), exact_on=("bytes", "caption"),
    )
    per_epoch = []
    for ep in range(args.epochs):
        b = batch(ep)
        t0 = time.time()
        dd.process_batch(b, ep)
        inc_wall = time.time() - t0
        meta = json.loads(
            dd._hfs.read_bytes(dd._p("epochs.json")).decode()
        )["done"][str(ep)]
        # full-recompute reference: what the naive per-epoch publish
        # costs at this history size — CC over ALL accumulated edges
        # plus the full O(corpus) assignment-table write the old
        # per-epoch publish performed
        t1 = time.time()
        full = assign_clusters(dd._read("ids"), dd._read("edges"))
        full.write.mode("overwrite").parquet(dd._p("_bench_full_publish"))
        full_wall = time.time() - t1
        cs_full = checksum(
            spark.read.parquet(dd._p("_bench_full_publish")),
            "id", "cluster_id")
        cs_inc = checksum(dd.assignments(), "id", "cluster_id")
        assert cs_inc == cs_full, f"epoch {ep}: law violated"
        per_epoch.append({
            "epoch": ep,
            "history_rows": args.rows * (ep + 1),
            "epoch_wall_sec": round(inc_wall, 3),
            "incremental_cc_sec": meta.get("cc_sec"),
            "full_recompute_sec": round(full_wall, 3),
            "moved_members": meta.get("moved_members"),
            "checksum": str(cs_inc),
        })
        print(json.dumps(per_epoch[-1]), flush=True)
        # periodic store maintenance, the documented operating discipline
        # (probes read live epoch dirs; compaction keeps that O(buckets))
        if (ep + 1) % 3 == 0:
            dd.compact_all()

    def avg(key, sl):
        vals = [e[key] for e in per_epoch[sl] if e[key] is not None]
        return round(sum(vals) / len(vals), 3) if vals else None

    head, tail = slice(1, 4), slice(-3, None)
    result = {
        "metric": "per_epoch_cluster_maintenance_vs_history",
        "epochs": args.epochs,
        "rows_per_epoch": args.rows,
        "dup_ratio": args.dup_ratio,
        "per_epoch": per_epoch,
        # the claim: incremental_cc_sec stays ~flat as history grows;
        # full_recompute_sec grows with the corpus even at toy scale
        "incremental_cc_head_avg_sec": avg("incremental_cc_sec", head),
        "incremental_cc_tail_avg_sec": avg("incremental_cc_sec", tail),
        "full_head_avg_sec": avg("full_recompute_sec", head),
        "full_tail_avg_sec": avg("full_recompute_sec", tail),
    }
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
