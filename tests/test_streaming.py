"""Structured Streaming incremental dedup tests:

  - batch-equivalence: feeding the corpus in micro-batches yields the SAME
    cluster assignments as the one-shot batch pipeline (sketches are
    order-insensitive monoids — the reference's streaming contract);
  - idempotent epochs: replaying a processed epoch (restart semantics) is
    a no-op;
  - a real readStream → foreachBatch(availableNow) run over parquet drops.
"""

import os

import pyspark.sql.functions as F
import pytest

from datasketches_cpp_spark.operators.imagededup import dedup_images
from datasketches_cpp_spark.operators.sigkernel import SigConfig
from datasketches_cpp_spark.plans.checkpoint import checksum
from datasketches_cpp_spark.sources.images import generate_images
from datasketches_cpp_spark.streaming.incremental import IncrementalDeduper

CFG = SigConfig(num_perm=64, bands=32, kmv_k=128, shingle_w=3, jaccard_threshold=0.5)
BYTES_CFG = SigConfig(
    num_perm=64, bands=16, kmv_k=128, shingle_w=16, jaccard_threshold=0.9
)
LANES = ("caption", "bytes", "phash")


@pytest.fixture(scope="module")
def corpus_pdf():
    images, _ = generate_images(400, seed=13)
    return images


def test_incremental_equals_batch(spark, corpus_pdf, tmp_path):
    full = spark.createDataFrame(corpus_pdf).cache()
    batch_res = dedup_images(
        full, CFG, BYTES_CFG, byte_stride=4, enable_lanes=LANES
    )
    want = checksum(batch_res["assignments"], "id", "cluster_id")

    dd = IncrementalDeduper(
        spark, str(tmp_path / "state"), CFG, BYTES_CFG, byte_stride=4,
        max_fanout=512, enable_lanes=LANES,
    )
    chunks = [corpus_pdf.iloc[0:150], corpus_pdf.iloc[150:280], corpus_pdf.iloc[280:400]]
    for epoch, chunk in enumerate(chunks):
        dd.process_batch(spark.createDataFrame(chunk), epoch)

    got = checksum(dd.assignments(), "id", "cluster_id")
    assert got == want  # any-order incremental folding = one-shot batch


def test_epoch_replay_is_idempotent(spark, corpus_pdf, tmp_path):
    dd = IncrementalDeduper(
        spark, str(tmp_path / "state"), CFG, BYTES_CFG,
        enable_lanes=("caption",),
    )
    chunk = spark.createDataFrame(corpus_pdf.iloc[0:100])
    dd.process_batch(chunk, 0)
    cs1 = checksum(dd.assignments(), "id", "cluster_id")
    n_sig_files = len(os.listdir(str(tmp_path / "state" / "sig_caption")))
    # restart replays epoch 0: must be a no-op (no double-append)
    dd2 = IncrementalDeduper(
        spark, str(tmp_path / "state"), CFG, BYTES_CFG,
        enable_lanes=("caption",),
    )
    dd2.process_batch(chunk, 0)
    assert checksum(dd2.assignments(), "id", "cluster_id") == cs1
    assert len(os.listdir(str(tmp_path / "state" / "sig_caption"))) == n_sig_files


def test_readstream_available_now(spark, corpus_pdf, tmp_path):
    src = tmp_path / "drops"
    src.mkdir()
    # three parquet drops
    for i, sl in enumerate(
        [corpus_pdf.iloc[0:150], corpus_pdf.iloc[150:280], corpus_pdf.iloc[280:400]]
    ):
        spark.createDataFrame(sl).coalesce(1).write.mode("overwrite").parquet(
            str(src / f"drop_{i}")
        )
    schema = spark.createDataFrame(corpus_pdf.iloc[:1]).schema

    dd = IncrementalDeduper(
        spark, str(tmp_path / "state"), CFG, BYTES_CFG, byte_stride=4,
        max_fanout=512, enable_lanes=LANES,
    )
    q = dd.start(
        str(src / "drop_*"), schema, max_files_per_trigger=1, available_now=True
    )
    q.awaitTermination(300)

    got = dd.assignments()
    assert got.count() == 400
    # same clusters as the one-shot batch run
    full = spark.createDataFrame(corpus_pdf)
    want = checksum(
        dedup_images(full, CFG, BYTES_CFG, byte_stride=4, enable_lanes=LANES)[
            "assignments"
        ],
        "id",
        "cluster_id",
    )
    assert checksum(got, "id", "cluster_id") == want


def test_partial_epoch_replay_is_idempotent(spark, corpus_pdf, tmp_path):
    """At-least-once crash semantics: a crash AFTER lane-store writes but
    BEFORE the epoch commit replays the whole epoch. The replay must
    OVERWRITE the partial epoch's store data, not append to it (the
    round-1 gap: appends before _mark_epoch inflated assignments)."""
    state = str(tmp_path / "state")
    dd = IncrementalDeduper(
        spark, state, CFG, BYTES_CFG, enable_lanes=("caption",),
    )
    chunk0 = spark.createDataFrame(corpus_pdf.iloc[0:100])
    dd.process_batch(chunk0, 0)
    want_rows = dd._read("sig_caption").count()
    want_ids = dd._read("ids").count()
    cs0 = checksum(dd.assignments(), "id", "cluster_id")

    # simulate the crashed epoch 1: stores written, epoch NOT marked done
    chunk1 = spark.createDataFrame(corpus_pdf.iloc[100:180])
    from datasketches_cpp_spark.operators.minhash import compute_signatures

    sig = compute_signatures(chunk1, "image_id", "caption", CFG, kind="text")
    dd._write_epoch("sig_caption", sig, 1)
    dd._write_epoch("ids", chunk1.select(F.col("image_id").alias("id")), 1)
    assert not dd._epoch_done(1)

    # restart: foreachBatch redelivers epoch 1 in full
    dd2 = IncrementalDeduper(
        spark, state, CFG, BYTES_CFG, enable_lanes=("caption",),
    )
    dd2.process_batch(chunk1, 1)
    assert dd2._epoch_done(1)
    # no duplicate signature/id rows from the partial attempt
    assert dd2._read("sig_caption").count() == want_rows + 80
    assert dd2._read("ids").count() == want_ids + 80
    sig_ids = dd2._read("sig_caption").select("id")
    assert sig_ids.distinct().count() == sig_ids.count()

    # epoch 0's published state was never disturbed
    dd3 = IncrementalDeduper(
        spark, str(tmp_path / "state_b"), CFG, BYTES_CFG, enable_lanes=("caption",),
    )
    dd3.process_batch(chunk0, 0)
    assert checksum(dd3.assignments(), "id", "cluster_id") == cs0
