#!/usr/bin/env python
"""End-to-end profile of the streaming incremental deduper at scale
(VERDICT r04 #8): readStream over parquet drop epochs, tiered exact
store + caption/bytes/phash lanes, incremental CC on — per-epoch
latency, store-growth curves, and a REAL mid-campaign SIGKILL + resume
whose final assignments must checksum-equal the uninterrupted run.

Modes (run via spark-submit --py-files dist/ds.zip):

  prep <work_dir> [n_images] [n_epochs]
      synthesize the planted corpus (sources/images.iter_image_chunks —
      deterministic dup structure) into <work_dir>/drops/epoch_*.parquet,
      one file per epoch (maxFilesPerTrigger=1 ⇒ one micro-batch each).
      Pure pandas/pyarrow, no Spark needed.

  run <work_dir> <state_name>
      start/resume the stream over the drops with availableNow=True.
      env KILL_AFTER_EPOCHS=k arms a watcher thread that SIGKILLs the
      whole JVM+driver as soon as k epochs are committed (i.e. MID-epoch
      k+1) — the honest crash. On clean termination prints one JSON line
      with per-epoch metrics, store sizes, and the assignments checksum.

A full campaign (see BENCH/profile_stream.md):
    prep; run clean; KILL_AFTER_EPOCHS=4 run crash (dies rc=137);
    run crash (resumes, completes); checksums must match.
"""

from __future__ import annotations

import json
import os
import signal
import sys
import threading
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def prep(work_dir: str, n_images: int, n_epochs: int) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    from datasketches_cpp_spark.sources.images import iter_image_chunks

    drops = os.path.join(work_dir, "drops")
    os.makedirs(drops, exist_ok=True)
    per_epoch = n_images // n_epochs
    writer = None
    epoch = 0
    rows_in_epoch = 0
    t0 = time.time()
    total = 0
    from datasketches_cpp_spark.sources.images import DEFAULT_CHUNK

    chunk = max(256, min(DEFAULT_CHUNK, per_epoch))
    for images, _truth in iter_image_chunks(n_images, seed=77, chunk_size=chunk):
        t = pa.Table.from_pandas(images, preserve_index=False)
        if writer is None:
            schema = t.schema
            writer = pq.ParquetWriter(
                os.path.join(drops, f"epoch_{epoch:04d}.parquet"), schema
            )
        writer.write_table(t, row_group_size=2048)
        rows_in_epoch += len(images)
        total += len(images)
        if rows_in_epoch >= per_epoch and epoch < n_epochs - 1:
            writer.close()
            epoch += 1
            rows_in_epoch = 0
            writer = pq.ParquetWriter(
                os.path.join(drops, f"epoch_{epoch:04d}.parquet"), schema
            )
    if writer is not None:
        writer.close()
    print(
        json.dumps(
            {
                "mode": "prep",
                "images": total,
                "epochs": epoch + 1,
                "sec": round(time.time() - t0, 1),
            }
        )
    )


def _store_sizes(state_dir: str) -> dict:
    out = {}
    for name in sorted(os.listdir(state_dir)):
        p = os.path.join(state_dir, name)
        if not os.path.isdir(p):
            continue
        total = 0
        nfiles = 0
        for dirpath, _dirs, files in os.walk(p):
            for f in files:
                total += os.path.getsize(os.path.join(dirpath, f))
                nfiles += 1
        out[name] = {"bytes": total, "files": nfiles}
    return out


def run(work_dir: str, state_name: str) -> None:
    from datasketches_cpp_spark.operators.sigkernel import SigConfig
    from datasketches_cpp_spark.plans.checkpoint import checksum
    from datasketches_cpp_spark.session import get_spark
    from datasketches_cpp_spark.streaming.incremental import IncrementalDeduper

    spark = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        app_name=f"profile_stream_{state_name}",
    )
    spark.sparkContext.setLogLevel("ERROR")
    state_dir = os.path.join(work_dir, state_name)
    drops = os.path.join(work_dir, "drops")

    # COMPACT_EVERY=k → the deduper's own maintenance cadence: fold
    # committed epoch partitions into one directory per store every k
    # epochs (per-epoch store directories otherwise accumulate
    # O(buckets × epochs) small files and every probe pays the listing —
    # the clean 500k run ended at 31,636 files per signature store).
    compact_every = int(os.environ.get("COMPACT_EVERY", "0"))
    dd = IncrementalDeduper(
        spark,
        state_dir,
        SigConfig(),
        byte_stride=4,
        max_fanout=512,
        enable_lanes=("caption", "bytes", "phash"),
        exact_on=("bytes", "caption"),
        compact_every=compact_every,
    )

    kill_after = int(os.environ.get("KILL_AFTER_EPOCHS", "0"))
    if kill_after:

        def watcher():
            ep_file = os.path.join(state_dir, "epochs.json")
            while True:
                time.sleep(0.5)
                try:
                    done = json.loads(open(ep_file).read())["done"]
                except Exception:
                    continue
                if len(done) >= kill_after:
                    # SIGKILL the whole process mid-(epoch k+1): no
                    # cleanup, no atexit — the honest crash
                    os.kill(os.getpid(), signal.SIGKILL)

        threading.Thread(target=watcher, daemon=True).start()

    t0 = time.time()
    schema = (
        "image_id string, bytes binary, w long, h long, fmt string, "
        "caption string, phash long"
    )
    q = dd.start(drops, schema, max_files_per_trigger=1, available_now=True)
    q.awaitTermination()
    wall = round(time.time() - t0, 2)

    metrics = [r.asDict() for r in dd.metrics().orderBy("epoch").collect()]
    asg = dd.assignments()
    ck = checksum(asg, "id", "cluster_id")
    result = {
        "mode": "run",
        "state": state_name,
        "wall_sec": wall,
        "epochs": metrics,
        "store_sizes": _store_sizes(state_dir),
        "assignments_checksum": ck,
        "n_assigned": int(ck.split(":", 1)[0]),
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        "compact_every": compact_every,
        "compact_secs": [
            m["compact_sec"] for m in metrics if m.get("compact_sec") is not None
        ],
    }
    line = json.dumps(result)
    print(line)
    with open(os.path.join(work_dir, f"profile_{state_name}.json"), "w") as f:
        f.write(line + "\n")
    dd.close()
    spark.stop()


def main() -> None:
    mode = sys.argv[1]
    work_dir = sys.argv[2]
    if mode == "prep":
        n_images = int(sys.argv[3]) if len(sys.argv) > 3 else 500_000
        n_epochs = int(sys.argv[4]) if len(sys.argv) > 4 else 10
        prep(work_dir, n_images, n_epochs)
    elif mode == "run":
        run(work_dir, sys.argv[3] if len(sys.argv) > 3 else "state")
    else:
        raise SystemExit(f"unknown mode {mode!r}")


if __name__ == "__main__":
    main()
