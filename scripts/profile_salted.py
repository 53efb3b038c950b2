#!/usr/bin/env python
"""Skew campaign for the exact-pair path: hot_policy="salted_full" vs
"chain_hub" on an adversarial band table where ONE band holds a large
fraction of all rows (the SURVEY §7 hot-band fixture shape).

What it proves (beyond the pytest semantics gates):

* salted_full really bounds PER-TASK memory under skew — task-level
  peakExecutionMemory / shuffle-read maxima from the Spark status REST
  API, compared against chain_hub on the same input;
* the two policies agree where they must: salted_full emits EXACTLY the
  brute-force pair count, and connected components over either edge set
  produce identical assignments (chain_hub trades pair-level recall for
  O(s) edges but preserves connectivity by construction).

Total pair volume of a hot band is Θ(s²) no matter the policy knob —
that is inherent to exact-pair semantics, which is why chain_hub is the
default for dedup (clustering only needs connectivity). salted_full
exists for callers that need every pair; this campaign sizes the hot
band so the full expansion is materializable (default: 20k-row band →
~2·10⁸ pairs) while keeping the skew ratio adversarial (10% of the
corpus in one band vs ~4-row background bands).

Usage:
    spark-submit --py-files dist/ds.zip scripts/profile_salted.py \
        [n_rows] [hot_rows] [bg_group] [chunk] [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import pyspark.sql.functions as F  # noqa: E402


def _rest(spark, path: str):
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}{path}") as r:
        return json.loads(r.read())


def _stage_peaks(spark, after_stage: int) -> dict:
    """Max per-task peakExecutionMemory / shuffle-read bytes / duration
    over all stages completed after ``after_stage`` (exclusive)."""
    stages = _rest(spark, "/stages?status=complete&withSummaries=true&quantiles=1.0")
    peak_mem = peak_shuf = peak_dur = 0
    hot_stage = None
    for s in stages:
        if s["stageId"] <= after_stage:
            continue
        d = s.get("taskMetricsDistributions") or {}
        mem = int(max(d.get("peakExecutionMemory", [0])))
        shuf = int(max((d.get("shuffleReadMetrics") or {}).get("readBytes", [0])))
        dur = int(max(d.get("executorRunTime", [0])))
        if mem > peak_mem:
            peak_mem, hot_stage = mem, s["stageId"]
        peak_shuf = max(peak_shuf, shuf)
        peak_dur = max(peak_dur, dur)
    return {
        "max_task_peak_execution_memory_bytes": peak_mem,
        "max_task_shuffle_read_bytes": peak_shuf,
        "max_task_run_time_ms": peak_dur,
        "peak_stage_id": hot_stage,
    }


def _last_stage(spark) -> int:
    stages = _rest(spark, "/stages")
    return max((s["stageId"] for s in stages), default=-1)


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    hot_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    bg_group = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    chunk = int(sys.argv[4]) if len(sys.argv) > 4 else 256
    out_path = sys.argv[5] if len(sys.argv) > 5 else None

    from datasketches_cpp_spark.operators.cc import connected_components
    from datasketches_cpp_spark.operators.lsh import pairs_from_bands
    from datasketches_cpp_spark.plans.checkpoint import checksum
    from datasketches_cpp_spark.session import get_spark

    spark = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        app_name="profile_salted",
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # one hot band (hash 0) with hot_rows members; the rest in bg_group-row
    # background bands — adversarial skew ratio hot_rows/n_rows
    bands = spark.range(n_rows).select(
        F.lit(0).alias("band_idx"),
        F.when(F.col("id") < hot_rows, F.lit(0))
        .otherwise((F.col("id") / bg_group).cast("long") + 1)
        .alias("band_hash"),
        F.col("id"),
    ).localCheckpoint(eager=True)

    # background bands key on ABSOLUTE id // bg_group, so when hot_rows
    # isn't a multiple of bg_group the first and last background bands
    # are partial — count each band's true membership rather than
    # assuming groups fill sequentially from hot_rows
    import numpy as np

    expect_pairs = hot_rows * (hot_rows - 1) // 2
    if n_rows > hot_rows:
        g = np.arange(hot_rows // bg_group, (n_rows - 1) // bg_group + 1,
                      dtype=np.int64)
        cnt = (np.minimum((g + 1) * bg_group, n_rows)
               - np.maximum(g * bg_group, hot_rows))
        expect_pairs += int((cnt * (cnt - 1) // 2).sum())

    results = {}
    cc_checks = {}
    for policy in ("chain_hub", "salted_full"):
        mark = _last_stage(spark)
        t0 = time.time()
        pairs = pairs_from_bands(
            bands, max_pairs_group=chunk, hot_policy=policy
        ).localCheckpoint(eager=True)
        n_pairs = pairs.count()
        wall = round(time.time() - t0, 2)
        peaks = _stage_peaks(spark, mark)
        results[policy] = {"pairs": n_pairs, "wall_sec": wall, **peaks}
        comp = connected_components(
            pairs.select(F.col("a"), F.col("b")), driver_finish_edges=0
        )
        cc_checks[policy] = checksum(comp, "id", "cluster_id")
        pairs.unpersist()

    profile = {
        "n_rows": n_rows,
        "hot_rows": hot_rows,
        "bg_group": bg_group,
        "chunk": chunk,
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        "expected_full_pairs": expect_pairs,
        "policies": results,
        "cc_checksums": cc_checks,
        "salted_equals_bruteforce_count": results["salted_full"]["pairs"]
        == expect_pairs,
        "cc_assignments_identical": cc_checks["chain_hub"]
        == cc_checks["salted_full"],
    }
    line = json.dumps(profile)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")
    assert profile["salted_equals_bruteforce_count"], (
        results["salted_full"]["pairs"],
        expect_pairs,
    )
    assert profile["cc_assignments_identical"], cc_checks
    spark.stop()


if __name__ == "__main__":
    main()
