#!/usr/bin/env python
"""Profile the DISTRIBUTED connected-components regime (operators/cc.py)
on a synthetic edge set big enough to clear ``driver_finish_edges`` —
the code path a 10^12-image corpus would exercise, which unit tests only
ever pin at toy scale.

Corpus (deterministic, synthesized in Spark — no driver-side loops):

* ``n_chains`` chains of length ``chain_len`` — the adversarial shape for
  label propagation (O(diameter)) that the two-phase star algorithm
  flattens in O(log n) rounds;
* ``n_random`` extra random edges over the same node space (hash-paired),
  merging chains into larger blobs and giving hub-ish degree skew.

Node labels are xxhash64-relabeled so ids are scattered across the
64-bit space (consecutive ids would make component minima artificially
easy to route).

Runs the SAME edge set through BOTH regimes:

1. distributed star rounds (threshold below |E|) → LAST_STATS carries
   per-round seconds, checksum-barrier seconds, rounds;
2. driver finish (threshold above |E|) — the pytest-pinned baseline.

Asserts the two assignment checksums are identical, then prints ONE JSON
line with the profile. Usage:

    spark-submit --py-files dist/ds.zip scripts/profile_cc.py \
        [n_chains] [chain_len] [n_random] [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import pyspark.sql.functions as F  # noqa: E402


def synth_edges(spark, n_chains: int, chain_len: int, n_random: int):
    """Deterministic adversarial edge set, fully Spark-side."""
    n_nodes = n_chains * chain_len
    chain = (
        spark.range(n_nodes)
        .where((F.col("id") % chain_len) != chain_len - 1)
        .select(F.col("id").alias("u"), (F.col("id") + 1).alias("v"))
    )
    rnd = spark.range(n_random).select(
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(n_nodes)).alias("u"),
        F.pmod(F.xxhash64("id", F.lit(2)), F.lit(n_nodes)).alias("v"),
    )
    edges = chain.unionByName(rnd).select(
        F.xxhash64(F.col("u"), F.lit(7)).alias("a"),
        F.xxhash64(F.col("v"), F.lit(7)).alias("b"),
    )
    return edges


def main() -> None:
    n_chains = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
    chain_len = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    n_random = int(sys.argv[3]) if len(sys.argv) > 3 else 2_500_000
    out_path = sys.argv[4] if len(sys.argv) > 4 else None

    from datasketches_cpp_spark.operators import cc
    from datasketches_cpp_spark.plans.checkpoint import checksum
    from datasketches_cpp_spark.session import get_spark

    spark = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        app_name="profile_cc",
    )
    spark.sparkContext.setLogLevel("ERROR")

    edges = synth_edges(spark, n_chains, chain_len, n_random).localCheckpoint(
        eager=True
    )
    n_edges = edges.count()

    # 1. distributed regime: threshold forced below |E|
    t0 = time.time()
    dist = cc.connected_components(edges, driver_finish_edges=1_000_000)
    dist_ck = checksum(dist, "id", "cluster_id")
    dist_sec = round(time.time() - t0, 2)
    dist_stats = dict(cc.LAST_STATS)

    # 2. driver-finish baseline: threshold above |E|
    t0 = time.time()
    drv = cc.connected_components(edges, driver_finish_edges=max(n_edges * 2, 4_000_000))
    drv_ck = checksum(drv, "id", "cluster_id")
    drv_sec = round(time.time() - t0, 2)
    drv_stats = dict(cc.LAST_STATS)

    profile = {
        "n_chains": n_chains,
        "chain_len": chain_len,
        "n_random": n_random,
        "canonical_edges": n_edges,
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        "distributed": {
            "wall_sec": dist_sec,
            "rounds": dist_stats.get("rounds"),
            "round_secs": dist_stats.get("round_secs"),
            "checksum_barriers": dist_stats.get("checksums"),
            "init_sec": dist_stats.get("init_sec"),
            "driver_finish_sec": dist_stats.get("driver_finish_sec"),
            "checksum": dist_ck,
        },
        "driver_baseline": {
            "wall_sec": drv_sec,
            "init_sec": drv_stats.get("init_sec"),
            "driver_finish_sec": drv_stats.get("driver_finish_sec"),
            "checksum": drv_ck,
        },
        "checksums_equal": dist_ck == drv_ck,
    }
    line = json.dumps(profile)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")
    assert profile["checksums_equal"], "regime results diverge!"
    assert profile["distributed"]["rounds"] and profile["distributed"]["rounds"] >= 2, (
        "distributed regime did not run >=2 star rounds"
    )
    spark.stop()


if __name__ == "__main__":
    main()
