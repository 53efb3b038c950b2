#!/usr/bin/env python
"""Streaming exact tier vs flat streaming on a dup-heavy drop sequence.

Synthesizes E epochs of image drops where ``--dup-ratio`` of each later
epoch's rows are byte+caption exact twins of earlier content (the
continuous-crawl regime: most of what a crawler re-sees, it has seen
before), then drives ``IncrementalDeduper.process_batch`` epoch by epoch
twice — flat, and with ``exact_on=("bytes", "caption")`` — and asserts
the final assignments are CHECKSUM-IDENTICAL (the streaming
lossless-collapse law, tests/test_streaming.py) before reporting wall
time and the lane-store row counts. The store rows are the number that
matters at 10^12 scale: flat streaming state grows with STREAM VOLUME,
tiered state grows with NOVEL CONTENT, and every later epoch probes the
smaller store.

Writes one JSON line; give --out a NEW filename (never point it at
committed evidence)."""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

import numpy as np  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=24000, help="total rows")
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--dup-ratio", type=float, default=0.5,
                    help="fraction of each epoch>0 that re-sees old content")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from datasketches_cpp_spark.operators.sigkernel import SigConfig
    from datasketches_cpp_spark.plans.checkpoint import checksum
    from datasketches_cpp_spark.session import get_spark
    from datasketches_cpp_spark.sources.images import phash64
    from datasketches_cpp_spark.streaming.incremental import IncrementalDeduper

    spark = get_spark(master=f"local[{args.cpus}]",
                      app_name="stream-tier-bench")

    g = np.random.default_rng(777)
    per_epoch = args.n // args.epochs
    seen: list[tuple[bytes, str, int]] = []
    epochs = []
    uid = 0
    schema = ("image_id string, bytes binary, w int, h int, fmt string, "
              "caption string, phash long")
    for e in range(args.epochs):
        rows = []
        n_dup = 0 if e == 0 or not seen else int(per_epoch * args.dup_ratio)
        for _ in range(per_epoch - n_dup):
            px = g.integers(0, 256, 32 * 32 * 3, np.int64).astype(np.uint8)
            cap = f"stream caption {uid} " + " ".join(
                f"w{v}" for v in g.integers(0, 99999, 6))
            ph = int(np.int64(np.uint64(phash64(px, 32, 32))))
            rows.append((f"u{uid:07d}", bytearray(px.tobytes()), 32, 32,
                         "raw", cap, ph))
            if len(seen) < 4096:
                seen.append((px.tobytes(), cap, ph))
            uid += 1
        for _ in range(n_dup):
            bpx, bcap, bph = seen[int(g.integers(0, len(seen)))]
            rows.append((f"x{uid:07d}", bytearray(bpx), 32, 32, "raw",
                         bcap, bph))
            uid += 1
        epochs.append(
            spark.createDataFrame(rows, schema).localCheckpoint(eager=True))

    root = tempfile.mkdtemp(prefix="stream_tier_bench_")
    results = {}
    try:
        for tag, exact_on in (("flat", None),
                              ("tiered", ("bytes", "caption"))):
            dd = IncrementalDeduper(
                spark, os.path.join(root, tag), SigConfig(),
                enable_lanes=("bytes", "phash"), exact_on=exact_on)
            t0 = time.time()
            for e, df in enumerate(epochs):
                dd.process_batch(df, e)
            wall = round(time.time() - t0, 3)
            results[tag] = {
                "wall_sec": wall,
                "checksum": checksum(dd.assignments(), "id", "cluster_id"),
                "sig_store_rows": dd._read_bucketed("sig_bytes").count(),
                "band_store_rows":
                    dd._read_bucketed("sig_bytes_bands").count(),
            }
            if exact_on:
                results[tag]["exact_key_rows"] = dd._read_bucketed(
                    "exact_keys").count()
    finally:
        shutil.rmtree(root, ignore_errors=True)

    assert results["flat"]["checksum"] == results["tiered"]["checksum"], (
        "streaming lossless-collapse violated: "
        f"{results['flat']['checksum']} != {results['tiered']['checksum']}")

    line = json.dumps({
        "metric": "streaming tiered vs flat wall sec (checksum-identical)",
        "n_images": per_epoch * args.epochs,
        "epochs": args.epochs,
        "dup_ratio": args.dup_ratio,
        "cpus": args.cpus,
        "flat_sec": results["flat"]["wall_sec"],
        "tiered_sec": results["tiered"]["wall_sec"],
        "speedup": round(results["flat"]["wall_sec"]
                         / max(results["tiered"]["wall_sec"], 1e-9), 3),
        "flat_store_rows": {
            "sig": results["flat"]["sig_store_rows"],
            "bands": results["flat"]["band_store_rows"]},
        "tiered_store_rows": {
            "sig": results["tiered"]["sig_store_rows"],
            "bands": results["tiered"]["band_store_rows"],
            "exact_keys": results["tiered"]["exact_key_rows"]},
        "checksum": results["flat"]["checksum"],
    })
    print(line)
    if args.out:
        if os.path.exists(args.out):
            raise SystemExit(
                f"refusing to overwrite existing evidence file {args.out}")
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
