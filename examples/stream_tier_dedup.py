#!/usr/bin/env python
"""Continuous-crawl streaming tiered dedup, end to end. Run:

    spark-submit --py-files dist/datasketches_cpp_spark.zip \
        examples/stream_tier_dedup.py [n_images] [epochs]

The regime this demonstrates: a crawler re-sees most of what it has
already seen. Epoch 0 is fresh content; every later epoch is half
re-crawled exact twins (same bytes+caption under new ids) and half new.
The deduper runs with the streaming exact tier (`exact_on`) plus the
bytes/phash near lanes, so:

  * the persistent exact-key store collapses re-crawls BEFORE any
    signature work — per-epoch metrics show lane input tracking NOVEL
    content, not crawl volume;
  * cross-epoch twins still land in the right cluster through exact
    edges against the stored representative;
  * the run then restarts from the same state dir and replays the last
    epoch (at-least-once delivery) — a no-op by epoch manifest;
  * the deduper maintains its own stores (`compact_every=2`): every 2nd
    committed epoch folds the bucketed stores back to O(num_buckets)
    files, read-identically (compact_sec lands in the epoch funnel);
    a final explicit compact_all shows the manual maintenance call too.

Asserts planted-truth cluster recovery, the replay no-op, and
compaction identity; prints the per-epoch novel/collapsed funnel.
"""
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from pyspark.sql import SparkSession

from datasketches_cpp_spark.operators.sigkernel import SigConfig
from datasketches_cpp_spark.plans.checkpoint import checksum
from datasketches_cpp_spark.sources.images import phash64
from datasketches_cpp_spark.streaming.incremental import IncrementalDeduper

N = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
EPOCHS = int(sys.argv[2]) if len(sys.argv) > 2 else 5

spark = (
    SparkSession.builder.master(os.environ.get("SPARK_MASTER", "local[8]"))
    .appName("stream_tier_dedup")
    .config("spark.sql.shuffle.partitions", "16")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("WARN")

SCHEMA = ("image_id string, bytes binary, w int, h int, fmt string, "
          "caption string, phash long")
g = np.random.default_rng(2026)
per_epoch = N // EPOCHS
seen = []          # (bytes, caption, phash, rep_id) pool for re-crawls
truth = {}
epochs = []
uid = 0
for e in range(EPOCHS):
    rows = []
    n_dup = 0 if e == 0 else per_epoch // 2
    for _ in range(per_epoch - n_dup):
        px = g.integers(0, 256, 24 * 24 * 3, np.int64).astype(np.uint8)
        cap = "crawl doc " + " ".join(
            f"w{v}" for v in g.integers(0, 99999, 8))
        ph = int(np.int64(np.uint64(phash64(px, 24, 24))))
        iid = f"u{uid:07d}"
        rows.append((iid, bytearray(px.tobytes()), 24, 24, "raw", cap, ph))
        truth[iid] = iid
        if len(seen) < 4096:
            seen.append((px.tobytes(), cap, ph, iid))
        uid += 1
    for _ in range(n_dup):
        bpx, bcap, bph, rep = seen[int(g.integers(0, len(seen)))]
        iid = f"x{uid:07d}"
        rows.append((iid, bytearray(bpx), 24, 24, "raw", bcap, bph))
        truth[iid] = rep
        uid += 1
    epochs.append(rows)

root = tempfile.mkdtemp(prefix="stream_tier_demo_")
state = os.path.join(root, "state")
dd = IncrementalDeduper(
    spark, state, SigConfig(), enable_lanes=("bytes", "phash"),
    exact_on=("bytes", "caption"), num_buckets=32,
    # self-maintaining store: fold epoch partitions every 2nd committed
    # epoch — cadence is operational only (not in the config fingerprint,
    # checksum-invariant); the 500k profile runs 1455->492 s with it
    compact_every=2,
)
for e, rows in enumerate(epochs):
    dd.process_batch(spark.createDataFrame(rows, SCHEMA), e)

meta = json.load(open(os.path.join(state, "epochs.json")))["done"]
print("epoch funnel (rows -> novel, collapsed, wall):")
for e in sorted(meta, key=int):
    m = meta[e]
    comp = (f" compact={m['compact_sec']}s"
            if m.get("compact_sec") is not None else "")
    print(f"  epoch {e}: rows={m['rows']} novel={m.get('novel_rows', m['rows'])}"
          f" collapsed={m.get('exact_collapsed', 0)} wall={m['wall_sec']}s{comp}")

# truth is min-id per content group: re-crawl reps are original uids,
# and cluster ids are component minima, which is exactly the rep id
got = {r["id"]: r["cluster_id"] for r in dd.assignments().collect()}
assert got == truth, "streamed clusters != planted crawl truth"
cs = checksum(dd.assignments(), "id", "cluster_id")

# restart + replay the final epoch: epoch manifest makes it a no-op
dd2 = IncrementalDeduper(
    spark, state, SigConfig(), enable_lanes=("bytes", "phash"),
    exact_on=("bytes", "caption"), num_buckets=32,
)
dd2.process_batch(
    spark.createDataFrame(epochs[-1], SCHEMA), EPOCHS - 1)
assert checksum(dd2.assignments(), "id", "cluster_id") == cs

# maintenance: fold every bucketed store, reads unchanged
key_rows = dd2._read_bucketed("exact_keys").count()
folded = dd2.compact_all()
assert dd2._read_bucketed("exact_keys").count() == key_rows
assert checksum(dd2.assignments(), "id", "cluster_id") == cs

n_novel = dd2._read_bucketed("sig_bytes").count()
print(json.dumps({
    "rows_streamed": len(truth),
    "novel_content_in_lane_stores": n_novel,
    "clusters": len(set(truth.values())),
    "stores_folded": folded,
    "checksum": cs,
    "truth_recovered": True,
}))
spark.stop()
