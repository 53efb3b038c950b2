#!/usr/bin/env python
"""Tiered-vs-flat dedup throughput on a dup-heavy synthetic corpus.

Synthesizes N images where ``--dup-ratio`` of the rows are byte+caption
exact twins of a base (the web-crawl regime the cascade exists for),
then times the flat multi-lane run (bytes+phash over everything)
against the tiered cascade (operators/tiered.py) on local[CPUS], and
asserts the two clusterings are CHECKSUM-IDENTICAL (the lossless-
collapse law) before reporting the speedup.

Writes one JSON line; give --out a NEW filename (never point it at
committed evidence)."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

import numpy as np  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=40000)
    ap.add_argument("--dup-ratio", type=float, default=0.5,
                    help="fraction of rows that are exact twins")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from datasketches_cpp_spark.operators.imagededup import dedup_images
    from datasketches_cpp_spark.operators.sigkernel import SigConfig
    from datasketches_cpp_spark.operators.tiered import tiered_dedup_images
    from datasketches_cpp_spark.plans.checkpoint import checksum
    from datasketches_cpp_spark.session import get_spark
    from datasketches_cpp_spark.sources.images import phash64

    spark = get_spark(master=f"local[{args.cpus}]", app_name="tiered-bench")

    n_unique = max(1, int(args.n * (1.0 - args.dup_ratio)))
    n_dup = args.n - n_unique
    g = np.random.default_rng(4242)
    rows = []
    base_cache = []
    for i in range(n_unique):
        px = g.integers(0, 256, 32 * 32 * 3, np.int64).astype(np.uint8)
        cap = f"bench caption {i} " + " ".join(
            f"w{v}" for v in g.integers(0, 99999, 6)
        )
        ph = int(np.int64(np.uint64(phash64(px, 32, 32))))
        rows.append((f"u{i:07d}", bytearray(px.tobytes()), 32, 32, "raw",
                     cap, ph))
        if len(base_cache) < 4096:
            base_cache.append((px.tobytes(), cap, ph))
    for j in range(n_dup):
        bpx, bcap, bph = base_cache[int(g.integers(0, len(base_cache)))]
        rows.append((f"x{j:07d}", bytearray(bpx), 32, 32, "raw", bcap, bph))
    images = spark.createDataFrame(
        rows,
        "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash long",
    ).localCheckpoint(eager=True)

    t0 = time.time()
    flat = dedup_images(images, SigConfig(),
                        enable_lanes=("bytes", "phash"))["assignments"]
    cs_flat = checksum(flat, "id", "cluster_id")
    flat_sec = round(time.time() - t0, 3)

    t0 = time.time()
    res = tiered_dedup_images(images, SigConfig())
    cs_tiered = checksum(res["assignments"], "id", "cluster_id")
    tiered_sec = round(time.time() - t0, 3)
    stats = {r["tier"]: [int(r["input_rows"]), int(r["survivors"])]
             for r in res["tier_stats"].collect()}

    assert cs_tiered == cs_flat, (
        f"lossless-collapse violated: {cs_tiered} != {cs_flat}"
    )

    line = json.dumps(
        {
            "metric": "tiered vs flat dedup wall sec (checksum-identical)",
            "n_images": args.n,
            "dup_ratio": args.dup_ratio,
            "cpus": args.cpus,
            "flat_sec": flat_sec,
            "tiered_sec": tiered_sec,
            "speedup": round(flat_sec / max(tiered_sec, 1e-9), 3),
            "tier_funnel": stats,
            "checksum": cs_flat,
        }
    )
    print(line)
    if args.out:
        if os.path.exists(args.out):
            raise SystemExit(
                f"refusing to overwrite existing evidence file {args.out}"
            )
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
