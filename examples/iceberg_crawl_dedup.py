#!/usr/bin/env python
"""Continuous crawl over an Iceberg table, end to end. Run:

    spark-submit --py-files dist/datasketches_cpp_spark.zip \
        examples/iceberg_crawl_dedup.py [rows_per_commit] [commits]

The north-rule loop in one runnable: a crawler COMMITS each fetch as an
Iceberg snapshot (`sources.iceberg.write_snapshot`; parquet-snapshot
tier in this jar-less sandbox, same API on a real catalog), the deduper
CONSUMES each commit through the incremental CDC read
(`read_changes(root, last_seen, current)` — exactly one micro-batch per
commit), clusters are maintained INCREMENTALLY (contracted-graph CC,
O(batch + frontier) per epoch), retention expires old snapshots
mid-stream WITHOUT losing dedup state (the deduper's own stores carry
history), and the run closes with the counter-metrics table and a
cluster-state time travel check.

Planted truth: commit k>0 re-crawls half of commit k-1's content under
new ids (exact twins) — so every re-crawl must cluster with an original
whose SNAPSHOT may already be expired when the twin arrives.
"""
import sys
import tempfile

from pyspark.sql import SparkSession

from datasketches_cpp_spark.operators.sigkernel import SigConfig
from datasketches_cpp_spark.plans.checkpoint import checksum
from datasketches_cpp_spark.sources.iceberg import (
    current_snapshot_id,
    expire_snapshots,
    read_changes,
    read_table,
    write_snapshot,
)
from datasketches_cpp_spark.streaming.incremental import IncrementalDeduper


def main() -> None:
    rows_per = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    commits = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = SparkSession.builder.appName("iceberg_crawl_dedup").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="crawl_tbl_")
    schema = ("image_id string, bytes binary, w int, h int, fmt string, "
              "caption string, phash long")

    import numpy as np

    def content(src: int, j: int) -> tuple:
        """Unique deterministic payload per (commit, item): random-noise
        bytes so distinct items never near-match by accident and twins
        match exactly."""
        g = np.random.default_rng(1_000_000 * src + j)
        return (bytearray(g.integers(0, 256, 96, dtype=np.uint8).tobytes()),
                f"crawl item {src} {j} alpha beta gamma delta")

    def crawl(k: int):
        """Commit k: half re-crawled twins of commit k-1's NOVEL content
        (new ids), half novel."""
        n_dup = rows_per // 2 if k else 0
        rows = []
        for i in range(rows_per):
            if i < n_dup:
                b, cap = content(k - 1, n_dup + i)
            else:
                b, cap = content(k, i)
            rows.append((f"c{k:03d}_{i:05d}", b, 4, 4, "raw", cap, 0))
        return spark.createDataFrame(rows, schema)

    dd = IncrementalDeduper(
        spark, tempfile.mkdtemp(prefix="crawl_state_"), SigConfig(),
        enable_lanes=("bytes",), exact_on=("bytes", "caption"),
    )
    last = 0
    for k in range(commits):
        write_snapshot(crawl(k), root)
        cur = current_snapshot_id(root)
        dd.process_batch(
            read_changes(spark, root, from_id=last or None, to_id=cur), k
        )
        last = cur
        if k == 1:  # retention runs mid-stream: snapshot 1 expires here
            expire_snapshots(root, keep_last=1)

    a = dd.assignments().cache()
    n, clusters = a.count(), a.select("cluster_id").distinct().count()
    expect_rows = rows_per * commits
    expect_clusters = expect_rows - (commits - 1) * (rows_per // 2)
    assert n == expect_rows, (n, expect_rows)
    assert clusters == expect_clusters, (clusters, expect_clusters)
    # every re-crawl clusters with its original — including commit 2's
    # twins of commit 1, whose snapshot was already expired on arrival
    twins = a.where("id LIKE 'c002%'").where(
        f"CAST(substring(id, 6) AS INT) < {rows_per // 2}"
    ).collect()
    assert twins and all(
        r["cluster_id"].startswith("c001_") for r in twins
    ), twins[:3]
    # time travel: the table as of epoch 0 is just commit 0, all fresh
    assert dd.assignments(as_of_epoch=0).count() == rows_per
    m = {r["epoch"]: r for r in dd.metrics().collect()}
    funnel = [
        (k, m[k]["rows"], m[k]["novel_rows"], m[k]["exact_collapsed"],
         m[k]["wall_sec"]) for k in sorted(m)
    ]
    print("epoch funnel (rows, novel, collapsed, wall):")
    for row in funnel:
        print("  epoch %d: rows=%d novel=%d collapsed=%d wall=%.3fs" % row)
    assert all(m[k]["novel_rows"] == rows_per - rows_per // 2
               for k in sorted(m) if k), "lane input must track novelty"
    print({
        "commits": commits,
        "table_rows": read_table(spark, root).count(),
        "clusters": clusters,
        "checksum": str(checksum(a, "id", "cluster_id")),
        "truth_recovered": True,
    })


if __name__ == "__main__":
    main()
