#!/usr/bin/env python
"""Two-cluster-size scaling evidence (BASELINE.json north_rule).

Packages the library as a --py-files zip, then runs the identical flagship
image-dedup job via ``spark-submit`` at local[N] and local[4N] on the same
deterministic input, and writes BENCH/BASELINE.md with throughput at both
levels + scaling efficiency ( (R_4N / R_N) / 4 ), gate ≥ 0.8. Also asserts
the two runs produced the identical assignment checksum — scaling must not
change answers.

Usage: python scripts/scaling_bench.py [--images 20000] [--n 8]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)


def build_zip() -> str:
    dist = os.path.join(ROOT, "dist")
    os.makedirs(dist, exist_ok=True)
    zpath = os.path.join(dist, "datasketches_cpp_spark.zip")
    pkg = os.path.join(ROOT, "datasketches_cpp_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _, files in os.walk(pkg):
            for fn in files:
                if fn.endswith((".py", ".npz")):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, ROOT))
    return zpath


def run_once(
    master: str, zpath: str, img_parquet: str, shuffle_parts: int,
    out_json: str,
) -> dict:
    # every invocation gets its own fresh out_json (run_pipeline.py
    # refuses to overwrite an existing one — committed evidence files
    # must never be clobbered by a re-run)
    cmd = [
        "spark-submit",
        "--master", master,
        "--conf", f"spark.sql.shuffle.partitions={shuffle_parts}",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.sql.execution.arrow.pyspark.enabled=true",
        "--conf", "spark.sql.execution.arrow.maxRecordsPerBatch=8192",
        "--conf", "spark.sql.files.maxPartitionBytes=33554432",
        "--conf", "spark.driver.memory=16g",
        "--conf", "spark.ui.enabled=false",
        # multi-executor mode: never stall a ~100ms task 3s waiting for a
        # process-local slot — on a one-box local-cluster every executor is
        # equally "local" to the data, so locality waits are pure serial cost
        "--conf", "spark.locality.wait=0s",
        "--py-files", zpath,
        os.path.join(ROOT, "scripts", "run_pipeline.py"),
        img_parquet,
        out_json,
    ]
    print("+", " ".join(cmd), file=sys.stderr)
    subprocess.run(cmd, check=True, cwd=ROOT)
    with open(out_json) as f:
        return json.load(f)


def measure_bandwidth(procs_list=(1, 2, 4, 8, 16)) -> dict:
    """Same-day memory-bandwidth envelope: aggregate GB/s of `procs`
    concurrent numpy copy streams. The host VM's neighbors swing this by
    5-10x on minute timescales, so the envelope MUST be sampled alongside
    the runs it contextualizes — a stale curve is meaningless."""
    import multiprocessing as mp

    import numpy as np
    import time as _t

    def stream(q):
        a = np.random.rand(200 * 131072)
        b = np.empty_like(a)
        t0 = _t.time()
        for _ in range(6):
            np.copyto(b, a)
        q.put(2 * a.nbytes * 6 / (_t.time() - t0))

    out = {}
    for procs in procs_list:
        q = mp.Queue()
        ps = [mp.Process(target=stream, args=(q,)) for _ in range(procs)]
        [p.start() for p in ps]
        rates = [q.get() for _ in ps]
        [p.join() for p in ps]
        out[procs] = round(sum(rates) / 1e9, 1)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=int(os.environ.get("BENCH_IMAGES", "20000")))
    ap.add_argument("--n", type=int, default=8, help="small cluster size (big = 4n)")
    ap.add_argument(
        "--repeats", type=int, default=3,
        help="runs per level; best (max images/sec) is reported — the host "
        "VM has noisy neighbors, best-of-k at BOTH levels is the fair "
        "peak-throughput comparison",
    )
    ap.add_argument(
        "--mode", choices=["threads", "executors"], default="threads",
        help="threads: local[N] vs local[4N] (shared JVM). executors: "
        "local-cluster[N,1,mem] vs local-cluster[4N,1,mem] — REAL separate "
        "executor JVMs with their own heaps, Python worker pools, and "
        "socket shuffle: the literal N vs 4N executors of the north rule",
    )
    ap.add_argument("--exec-mem-mb", type=int, default=4096)
    ap.add_argument("--out", default=None, help="output md path (default BENCH/BASELINE.md)")
    ap.add_argument(
        "--tag", default=None,
        help="evidence tag: per-run JSONs go to BENCH/runs_<tag>/ and the "
        "markdown defaults to BENCH/BASELINE_<tag>.md, so a re-run can "
        "never clobber previously committed evidence files",
    )
    args = ap.parse_args()

    from datasketches_cpp_spark.sources.images import write_images_parquet

    cache_dir = os.path.join(ROOT, ".bench_data", f"images_{args.images}_s42")
    img_parquet = os.path.join(cache_dir, "images.parquet")
    if not os.path.exists(img_parquet):
        os.makedirs(cache_dir, exist_ok=True)
        write_images_parquet(cache_dir, args.images, seed=42)

    zpath = build_zip()
    os.makedirs(os.path.join(ROOT, "BENCH"), exist_ok=True)

    # INTERLEAVE the two levels (small, big, small, big, ...): the host's
    # noisy neighbors drift on minute timescales, so running all-small
    # then all-big would let a noise step-change masquerade as a scaling
    # effect; interleaving exposes both levels to the same noise regime.
    if args.mode == "executors":
        small_master = f"local-cluster[{args.n},1,{args.exec_mem_mb}]"
        big_master = f"local-cluster[{4 * args.n},1,{args.exec_mem_mb}]"
    else:
        small_master = f"local[{args.n}]"
        big_master = f"local[{4 * args.n}]"
    run_dir = os.path.join(
        ROOT, "BENCH", f"runs_{args.tag}" if args.tag else "runs_scratch"
    )
    os.makedirs(run_dir, exist_ok=True)

    def out_path(master: str, i: int) -> str:
        name = master.replace("[", "_").replace("]", "").replace(",", "_")
        return os.path.join(run_dir, f"run_{name}_{i}.json")

    bw_before = measure_bandwidth()
    small_runs, big_runs = [], []
    for i in range(args.repeats):
        small_runs.append(
            run_once(small_master, zpath, img_parquet, 2 * args.n,
                     out_path(small_master, i))
        )
        big_runs.append(
            run_once(big_master, zpath, img_parquet, 8 * args.n,
                     out_path(big_master, i))
        )
    bw_after = measure_bandwidth()

    def best_of(runs: list) -> dict:
        assert len({r["assignments_checksum"] for r in runs}) == 1
        best = max(runs, key=lambda r: r["images_per_sec"])
        best["all_runs_sec"] = [r["wall_sec"] for r in runs]
        return best

    small, big = best_of(small_runs), best_of(big_runs)

    assert small["assignments_checksum"] == big["assignments_checksum"], (
        "scaling changed the answer!"
    )
    eff = (big["images_per_sec"] / small["images_per_sec"]) / 4.0
    # hardware envelope: how much MORE aggregate memory bandwidth the box
    # actually grants 4N streams than N streams, sampled same-day (avg of
    # the before/after probes); a bandwidth-bound job cannot scale past it
    bw = {k: (bw_before[k] + bw_after[k]) / 2 for k in bw_before}
    hw_ratio = bw.get(4 * args.n, bw[max(bw)]) / bw[args.n]
    eff_vs_hw = (big["images_per_sec"] / small["images_per_sec"]) / min(4.0, hw_ratio)

    unit = "executors" if args.mode == "executors" else "cores"
    md = f"""# BENCH/BASELINE — two-cluster-size scaling evidence

North rule: ≥ 0.8 throughput scaling efficiency from N to 4N executors
(BASELINE.json). Evidence: the identical spark-submit --py-files
job at `{small_master}` vs `{big_master}` over the same deterministic
{args.images}-image corpus (sources/images.generate_images, seed 42).
{"local-cluster mode runs REAL separate executor JVMs (own heaps, own Python worker pools, shuffle over sockets) - the literal N vs 4N executors of the rule, not threads." if args.mode == "executors" else ""}

## Same-day hardware envelope (measured alongside the runs)

Aggregate memory bandwidth of k concurrent numpy copy streams, averaged
over probes taken immediately before and after the Spark runs (GB/s):

{json.dumps(bw)}

The host is a shared VM with noisy neighbors; its bandwidth swings 5-10x
on minute timescales, which is why the envelope is sampled same-run and
why the two levels are INTERLEAVED (small, big, small, big, ...) rather
than run back-to-back per level. On a real multi-executor cluster each
executor brings its own memory channels — a shared-DRAM box is the
hardest-possible stand-in for the rule's N→4N executor scaling, so the
efficiency is reported both raw and against the measured envelope.

Bandwidth the box grants {4 * args.n} streams vs {args.n}: **{hw_ratio:.2f}x**
(ideal 4.0x) — a fully bandwidth-bound job cannot scale past
{min(4.0, hw_ratio) / 4:.2f} on this box no matter how it is written.

## Results (best of {args.repeats} interleaved runs per level)

| cluster size | master | wall best (s) | all runs (s) | images/sec |
|---|---|---|---|---|
| N = {args.n} {unit} | {small_master} | {small['wall_sec']} | {small['all_runs_sec']} | {small['images_per_sec']} |
| 4N = {4 * args.n} {unit} | {big_master} | {big['wall_sec']} | {big['all_runs_sec']} | {big['images_per_sec']} |

**Scaling efficiency = (R_4N / R_N) / 4 = {eff:.3f}** (gate ≥ 0.8: {"PASS" if eff >= 0.8 else "FAIL"})
**Efficiency vs measured hardware envelope = {eff_vs_hw:.3f}**

Assignment checksum identical across all runs: `{small['assignments_checksum']}`
(the pipeline is partition-layout-invariant — scaling changes wall time,
never answers; see tests/test_dedup_pipeline.py::test_pipeline_partitioning_invariance).
"""
    out_md = args.out or os.path.join(
        ROOT, "BENCH",
        f"BASELINE_{args.tag}.md" if args.tag else "BASELINE.md",
    )
    with open(out_md, "w") as f:
        f.write(md)
    print(md)
    print(json.dumps({
        "efficiency": round(eff, 3),
        "efficiency_vs_hw": round(eff_vs_hw, 3),
        "bandwidth_gbps": bw,
        "small": small,
        "big": big,
    }))


if __name__ == "__main__":
    main()
