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


def test_band_store_probe_is_partition_pruned(spark, corpus_pdf, tmp_path):
    """The 10^12-scale property: probing the band store must carry a
    partition filter on `bucket` so only matching bucket=Y directories are
    read — asserted on the optimized plan, not just the API shape."""
    dd = IncrementalDeduper(
        spark, str(tmp_path / "state"), CFG, BYTES_CFG,
        enable_lanes=("caption",), num_buckets=16,
    )
    dd.process_batch(spark.createDataFrame(corpus_pdf.iloc[0:80]), 0)
    probe = dd._read_bucketed("sig_caption_bands", [1, 5, 9])
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "bucket" in plan.split("PartitionFilters", 1)[1][:200]
    # and the filter actually prunes: only the named buckets come back
    got = {r["bucket"] for r in probe.select("bucket").distinct().collect()}
    assert got <= {1, 5, 9}
    all_buckets = {
        r["bucket"]
        for r in dd._read_bucketed("sig_caption_bands")
        .select("bucket").distinct().collect()
    }
    assert len(all_buckets) > 3  # the store really is spread over buckets


def test_compaction_preserves_store_and_prunes_dirs(spark, corpus_pdf, tmp_path):
    """compact_store folds epoch dirs into one; reads (pruned and full)
    are unchanged, directory count drops, and a post-compaction epoch is
    still visible (manifest excludes only superseded dirs)."""
    dd = IncrementalDeduper(
        spark, str(tmp_path / "state"), CFG, BYTES_CFG,
        enable_lanes=("caption",), num_buckets=8,
    )
    for epoch, sl in enumerate([slice(0, 60), slice(60, 130), slice(130, 200)]):
        dd.process_batch(spark.createDataFrame(corpus_pdf.iloc[sl]), epoch)
    store = "sig_caption_bands"
    before = checksum(
        dd._read_bucketed(store), "id", "band_idx", "band_hash", "bucket"
    )
    n_dirs_before = len(dd._live_epoch_dirs(store))
    assert n_dirs_before == 3
    folded = dd.compact_store(store)
    assert folded == 3
    assert len(dd._live_epoch_dirs(store)) == 1
    assert checksum(
        dd._read_bucketed(store), "id", "band_idx", "band_hash", "bucket"
    ) == before
    # a new epoch after compaction must be live without re-compacting
    dd.process_batch(spark.createDataFrame(corpus_pdf.iloc[200:260]), 3)
    assert len(dd._live_epoch_dirs(store)) == 2
    after = dd._read_bucketed(store).count()
    assert after > 0
    assignments = dd.assignments()
    assert assignments.count() == 260


def test_compaction_generation_count_stays_logarithmic(spark, corpus_pdf, tmp_path):
    """ADVICE r5 (tiered-fold growth): with only 'new generation' vs
    'merge everything', equal-size cadence folds grew one live
    compacted_* dir each until the full-merge trigger. The per-tier
    doubling rule must keep the live generation count O(log folds) —
    and every fold must preserve the store's contents exactly."""
    import math

    dd = IncrementalDeduper(
        spark, str(tmp_path / "state"), CFG, BYTES_CFG,
        enable_lanes=("caption",), num_buckets=4,
    )
    store = "sig_caption_bands"
    n_cycles = 8
    step = 30
    for i in range(n_cycles):
        dd.process_batch(
            spark.createDataFrame(corpus_pdf.iloc[i * step:(i + 1) * step]), i
        )
        dd.compact_store(store)
        live = dd._live_epoch_dirs(store)
        gens = [d for d in live if "compacted_" in d]
        assert len(gens) <= int(math.log2(i + 1)) + 2, (i, live)
    total = dd._read_bucketed(store).count()
    assert total > 0
    assert dd.assignments().count() == n_cycles * step


def test_store_over_scheme_qualified_uri(spark, corpus_pdf, tmp_path):
    """The streaming state_dir is scheme-agnostic (same Hadoop FileSystem
    facade as plans/checkpoint.py): a file:// URI exercises epoch-bucketed
    writes, manifest-gated compaction, done-marker commit, and replay
    idempotency end to end through the facade."""
    state = f"file://{tmp_path}/state"
    dd = IncrementalDeduper(
        spark, state, CFG, BYTES_CFG, enable_lanes=("caption",), num_buckets=4,
    )
    dd.process_batch(spark.createDataFrame(corpus_pdf.iloc[:80]), 0)
    dd.process_batch(spark.createDataFrame(corpus_pdf.iloc[80:160]), 1)
    store = "sig_caption_bands"
    before = checksum(
        dd._read_bucketed(store), "id", "band_idx", "band_hash", "bucket"
    )
    assert dd._epoch_done(0) and dd._epoch_done(1)

    # replaying a done epoch through the URI store is a no-op
    dd.process_batch(spark.createDataFrame(corpus_pdf.iloc[:80]), 0)
    assert checksum(
        dd._read_bucketed(store), "id", "band_idx", "band_hash", "bucket"
    ) == before

    # compaction commit protocol over the facade
    assert dd.compact_store(store) == 2
    assert len(dd._live_epoch_dirs(store)) == 1
    assert checksum(
        dd._read_bucketed(store), "id", "band_idx", "band_hash", "bucket"
    ) == before
    assert dd.assignments().count() == 160


def test_exact_tier_gates_lanes_and_matches_flat(spark, corpus_pdf, tmp_path):
    """Streaming exact tier (exact_on): assignments equal the flat batch
    run (lossless-collapse law, streaming twin of operators/tiered.py),
    while the lane stores hold only stream-wide NOVEL content — state
    growth tracks novel content, not stream volume — and cross-epoch
    exact twins link through the persistent exact-key store."""
    import pandas as pd

    base = corpus_pdf.iloc[0:150].reset_index(drop=True)
    # cross-epoch exact twins: re-emit 20 epoch-0 rows in later epochs
    # under fresh ids (identical bytes+caption => exact-tier store hits)
    tw1 = base.iloc[0:10].copy()
    tw1["image_id"] = ["xtw1_%02d" % i for i in range(10)]
    tw2 = base.iloc[5:15].copy()
    tw2["image_id"] = ["xtw2_%02d" % i for i in range(10)]
    chunks = [base.iloc[0:80], pd.concat([base.iloc[80:150], tw1]), tw2]
    full = spark.createDataFrame(pd.concat(chunks, ignore_index=True)).cache()

    flat = dedup_images(
        full, CFG, BYTES_CFG, byte_stride=4, enable_lanes=LANES
    )
    want = checksum(flat["assignments"], "id", "cluster_id")

    dd = IncrementalDeduper(
        spark, str(tmp_path / "state"), CFG, BYTES_CFG, byte_stride=4,
        max_fanout=512, enable_lanes=LANES, exact_on=("bytes", "caption"),
    )
    for epoch, chunk in enumerate(chunks):
        dd.process_batch(spark.createDataFrame(chunk), epoch)
    assert checksum(dd.assignments(), "id", "cluster_id") == want

    # gating: every lane store holds one row per stream-wide novel key,
    # strictly fewer than the rows streamed (20 planted twins + any
    # generator-planted byte+caption twins collapse before the lanes)
    n_total = full.count()
    n_novel = dd._read_bucketed("exact_keys").count()
    assert n_novel <= n_total - 20
    assert dd._read_bucketed("sig_caption").count() == n_novel
    assert dd._read_bucketed("sig_bytes").count() == n_novel

    # replay idempotence through the exact tier: simulate a crash AFTER
    # epoch 2's store writes but BEFORE its commit (unmark it), then
    # redeliver — the probe must EXCLUDE epoch 2's own exact_keys slot
    # (else its keys read as already-seen and the epoch collapses to
    # nothing), rewriting identical state and assignments
    import json as _json

    epochs_p = str(tmp_path / "state" / "epochs.json")
    st = _json.load(open(epochs_p))
    del st["done"]["2"]
    open(epochs_p, "w").write(_json.dumps(st))
    dd.process_batch(spark.createDataFrame(chunks[2]), 2)
    assert dd._epoch_done(2)
    assert checksum(dd.assignments(), "id", "cluster_id") == want
    assert dd._read_bucketed("exact_keys").count() == n_novel
    assert dd._read_bucketed("sig_caption").count() == n_novel

    # epoch counter metrics: chunk 2 is ALL previously-seen content
    meta = _json.load(open(epochs_p))["done"]["2"]
    assert meta["rows"] == 10
    assert meta["novel_rows"] == 0 and meta["exact_collapsed"] == 10


def test_embedding_lane_matches_batch_lsh(spark, tmp_path):
    """Streaming SemDeDup lane: micro-batched hyperplane-LSH + cosine
    verify equals the one-shot batch LSH self-join (same planes, same
    threshold) composed with CC — the union over epochs covers every
    co-banded pair exactly once. Also pins that the planted
    near-parallel groups actually cluster (recall sanity, determinstic
    under the fixed seed)."""
    import numpy as np

    from datasketches_cpp_spark.operators.cc import assign_clusters
    from datasketches_cpp_spark.operators.knn import cosine_near_dup_pairs_lsh

    dim = 16
    rng = np.random.default_rng(99)
    rows, truth = [], {}
    for i in range(30):
        base = rng.standard_normal(dim)
        base /= np.linalg.norm(base)
        copies = 3 if i < 10 else 1
        for j in range(copies):
            v = base.copy()
            if j:
                v = v + 0.02 * rng.standard_normal(dim)
            v /= np.linalg.norm(v)
            iid = f"e{i:03d}{j}"
            rows.append((iid, [float(x) for x in v]))
            truth[iid] = f"e{i:03d}0"
    schema = "image_id string, embedding array<float>"
    full = spark.createDataFrame(rows, schema).cache()

    pairs = cosine_near_dup_pairs_lsh(
        full, dim, id_col="image_id", vec_col="embedding", threshold=0.9
    ).select("a", "b")
    batch_assign = assign_clusters(
        full.select(F.col("image_id").alias("id")), pairs
    )
    want = checksum(batch_assign, "id", "cluster_id")

    dd = IncrementalDeduper(
        spark, str(tmp_path / "state"), max_fanout=512,
        enable_lanes=("embedding",), embedding_dim=dim,
    )
    chunks = [rows[0:17], rows[17:35], rows[35:50]]
    for epoch, chunk in enumerate(chunks):
        dd.process_batch(spark.createDataFrame(chunk, schema), epoch)
    assert checksum(dd.assignments(), "id", "cluster_id") == want

    # planted recovery (deterministic under seed 9001 hyperplanes):
    # every 3-copy group clusters to its base, singles stay alone
    got = {r["id"]: r["cluster_id"] for r in dd.assignments().collect()}
    assert got == truth


def test_edge_policy_fusion_matches_batch(spark, corpus_pdf, tmp_path):
    """Streaming k-of-n lane fusion equals the batch
    dedup_images(edge_policy=2): every candidate pair is voted by every
    enabled lane exactly once — in the arrival epoch of its later
    member — so the per-epoch vote is the batch vote. AND-fusion must
    also genuinely differ from OR on this corpus (precision semantics
    have teeth)."""
    pdf = corpus_pdf.iloc[0:200]
    full = spark.createDataFrame(pdf).cache()
    lanes = ("caption", "bytes")
    want = checksum(
        dedup_images(full, CFG, BYTES_CFG, byte_stride=4,
                     enable_lanes=lanes, edge_policy=2)["assignments"],
        "id", "cluster_id",
    )
    or_want = checksum(
        dedup_images(full, CFG, BYTES_CFG, byte_stride=4,
                     enable_lanes=lanes)["assignments"],
        "id", "cluster_id",
    )
    assert want != or_want  # AND is stricter than OR here

    dd = IncrementalDeduper(
        spark, str(tmp_path / "state"), CFG, BYTES_CFG, byte_stride=4,
        max_fanout=512, enable_lanes=lanes, edge_policy=2,
    )
    for epoch, chunk in enumerate([pdf.iloc[0:90], pdf.iloc[90:200]]):
        dd.process_batch(spark.createDataFrame(chunk), epoch)
    assert checksum(dd.assignments(), "id", "cluster_id") == want


def test_compact_all_folds_bucketed_stores_only(spark, corpus_pdf, tmp_path):
    """compact_all: every bucketed store under state_dir folds to one
    compacted dir; plain epoch stores (ids/edges) are left alone; reads
    and published assignments are unchanged, and the next epoch still
    lands correctly."""
    dd = IncrementalDeduper(
        spark, str(tmp_path / "state"), CFG, BYTES_CFG,
        enable_lanes=("caption",), exact_on=("bytes", "caption"),
        num_buckets=8,
    )
    for epoch, sl in enumerate([slice(0, 60), slice(60, 120)]):
        dd.process_batch(spark.createDataFrame(corpus_pdf.iloc[sl]), epoch)
    cs = checksum(dd.assignments(), "id", "cluster_id")
    sig_rows = dd._read_bucketed("sig_caption").count()
    key_rows = dd._read_bucketed("exact_keys").count()

    folded = dd.compact_all()
    assert folded.get("sig_caption") == 2
    assert folded.get("sig_caption_bands") == 2
    assert folded.get("exact_keys") == 2
    assert "ids" not in folded and "edges" not in folded
    assert os.path.isdir(str(tmp_path / "state" / "ids" / "epoch_000000000001"))
    assert dd._read_bucketed("sig_caption").count() == sig_rows
    assert dd._read_bucketed("exact_keys").count() == key_rows
    assert checksum(dd.assignments(), "id", "cluster_id") == cs

    dd.process_batch(spark.createDataFrame(corpus_pdf.iloc[120:180]), 2)
    assert dd.assignments().count() == 180


def test_compact_every_cadence_semantically_invisible(spark, corpus_pdf, tmp_path):
    """compact_every=k is the deduper's OWN maintenance cadence (folds the
    bucketed stores after every k-th committed epoch, inside
    process_batch, after the epoch commit). Operational only: assignments
    checksum equals the never-compacted twin, file layout shrinks to the
    compacted dir, metrics() reports compact_sec exactly on cadence
    epochs, replaying a cadence epoch does NOT re-compact, and a resumed
    deduper may change the cadence freely (not in the config
    fingerprint)."""
    chunks = [slice(0, 60), slice(60, 120), slice(120, 170), slice(170, 230)]

    plain = IncrementalDeduper(
        spark, str(tmp_path / "plain"), CFG, BYTES_CFG,
        enable_lanes=("caption",), exact_on=("caption",), num_buckets=8,
    )
    cadenced = IncrementalDeduper(
        spark, str(tmp_path / "cad"), CFG, BYTES_CFG,
        enable_lanes=("caption",), exact_on=("caption",), num_buckets=8,
        compact_every=2,
    )
    for epoch, sl in enumerate(chunks):
        pdf = spark.createDataFrame(corpus_pdf.iloc[sl])
        plain.process_batch(pdf, epoch)
        cadenced.process_batch(pdf, epoch)

    assert checksum(cadenced.assignments(), "id", "cluster_id") == checksum(
        plain.assignments(), "id", "cluster_id"
    )
    # epochs 1 and 3 compacted; folds are TIERED (delta generations under
    # the doubling rule), so live dirs are a couple of generations — never
    # the per-epoch pile-up of the unmaintained twin
    import glob as _glob
    for store in ("sig_caption", "sig_caption_bands", "exact_keys"):
        live = cadenced._live_epoch_dirs(store)
        assert 1 <= len(live) <= 2, (store, live)
        assert all(
            d.rstrip("/").rsplit("/", 1)[-1].startswith("compacted_")
            for d in live
        ), (store, live)
        assert len(plain._live_epoch_dirs(store)) == len(chunks), store
        # every fold output honors the O(num_buckets) FILE contract: one
        # parquet file per bucket (the repartition-by-bucket write), not
        # one per (read-partition × bucket)
        for d in live:
            n_parquet = len(_glob.glob(os.path.join(
                str(d).replace("file:", ""), "bucket=*", "*.parquet")))
            assert 0 < n_parquet <= 8, (store, d, n_parquet)
    m = {r["epoch"]: r for r in cadenced.metrics().collect()}
    assert m[1]["compact_sec"] is not None and m[3]["compact_sec"] is not None
    assert m[0]["compact_sec"] is None and m[2]["compact_sec"] is None
    assert m[3]["compact_folded"] > 0

    # replay of a committed cadence epoch: pure no-op, no re-fold (the
    # post-replay layout still shows exactly the one compacted dir)
    resumed = IncrementalDeduper(
        spark, str(tmp_path / "cad"), CFG, BYTES_CFG,
        enable_lanes=("caption",), exact_on=("caption",), num_buckets=8,
        compact_every=2,  # cadence change on resume is allowed; epoch 3
        # IS a cadence epoch under it, so this replay exercises the
        # cadence branch itself (not just a non-firing modulus)
    )
    live_before = sorted(resumed._live_epoch_dirs("sig_caption"))
    resumed.process_batch(spark.createDataFrame(corpus_pdf.iloc[chunks[3]]), 3)
    assert sorted(resumed._live_epoch_dirs("sig_caption")) == live_before
    assert checksum(resumed.assignments(), "id", "cluster_id") == checksum(
        plain.assignments(), "id", "cluster_id"
    )


def test_fold_crash_before_manifest_swap_is_invisible(spark, corpus_pdf, tmp_path):
    """A fold that crashes AFTER writing its compacted_* target but
    BEFORE the atomic _LIVE.json swap must leave no trace in reads:
    compacted dirs are live ONLY via the manifest's `live` list, so the
    orphan (possibly half-written, unreadable parquet) is invisible to
    every probe, never double-counts against its still-live source epoch
    dirs, and is garbage-collected by the next compact_store."""
    import shutil

    dd = IncrementalDeduper(
        spark, str(tmp_path / "state"), CFG, BYTES_CFG,
        enable_lanes=("caption",), exact_on=("caption",), num_buckets=8,
    )
    for epoch, sl in enumerate([slice(0, 60), slice(60, 120)]):
        dd.process_batch(spark.createDataFrame(corpus_pdf.iloc[sl]), epoch)
    store = "sig_caption"
    rows_before = dd._read_bucketed(store).count()
    cs = checksum(dd.assignments(), "id", "cluster_id")

    # simulate the pre-swap crash: a fold target exists on disk (here: a
    # bit-identical copy of epoch 0's data — the worst case, real rows
    # that would double-count) but no manifest references it
    root = tmp_path / "state" / store
    orphan = root / "compacted_9999999999999"
    shutil.copytree(str(root / "epoch_000000000000"), str(orphan))
    assert not any(
        "compacted_9999999999999" in d for d in dd._live_epoch_dirs(store)
    )
    assert dd._read_bucketed(store).count() == rows_before  # no double-read
    assert checksum(dd.assignments(), "id", "cluster_id") == cs

    # half-written variant in a second store: an unreadable fold target
    # must not break probes either
    broken = tmp_path / "state" / "sig_caption_bands" / "compacted_9999999999998"
    broken.mkdir()
    (broken / "_temporary").mkdir()
    (broken / "part-00000.parquet.crc").write_bytes(b"\x00" * 8)
    band_rows = dd._read_bucketed("sig_caption_bands").count()
    assert band_rows > 0

    # the next fold garbage-collects the orphan and commits normally
    folded = dd.compact_store(store)
    assert folded == 2
    assert not orphan.exists()
    assert dd._read_bucketed(store).count() == rows_before
    assert checksum(dd.assignments(), "id", "cluster_id") == cs


def test_tiered_fold_doubling_rule(spark, corpus_pdf, tmp_path):
    """Routine folds touch only the new epoch deltas (generation count
    grows to 2); the generations merge only when the accumulated deltas
    outweigh the oldest generation — bounding lifetime fold I/O at
    O(N log N) instead of O(N²/cadence) full rewrites."""
    dd = IncrementalDeduper(
        spark, str(tmp_path / "state"), CFG, BYTES_CFG,
        enable_lanes=("caption",), exact_on=("caption",), num_buckets=8,
    )
    store = "sig_caption"
    # big first generation: epochs 0-2 folded together
    for epoch, sl in enumerate([slice(0, 60), slice(60, 120), slice(120, 180)]):
        dd.process_batch(spark.createDataFrame(corpus_pdf.iloc[sl]), epoch)
    pre = dd._read_bucketed(store).count()
    assert dd.compact_store(store) == 3
    gens = [d for d in dd._live_epoch_dirs(store)]
    assert len(gens) == 1
    assert dd._read_bucketed(store).count() == pre  # fold is read-identity

    # small delta: epoch 3 — a single already-one-file-per-bucket delta
    # dir is never folded alone (no-op, deterministic)
    dd.process_batch(spark.createDataFrame(corpus_pdf.iloc[180:210]), 3)
    assert dd.compact_store(store) == 0
    # two deltas DO fold; whether g1 joins the fold depends on the byte
    # doubling rule (at unit scale parquet overhead can dominate, so pin
    # the invariants, not the branch): 2 = delta-only fold, 3 = full merge
    dd.process_batch(spark.createDataFrame(corpus_pdf.iloc[210:240]), 4)
    pre = dd._read_bucketed(store).count()
    folded = dd.compact_store(store)
    assert folded in (2, 3)
    live = sorted(dd._live_epoch_dirs(store))
    assert 1 <= len(live) <= 2
    if len(live) == 2:
        assert live[0] in gens  # delta fold left the oldest gen intact
    assert dd._read_bucketed(store).count() == pre  # fold is read-identity

    # deltas keep accumulating across further folds → generation count
    # stays BOUNDED (the doubling rule merges before generations pile up)
    # and every fold stays a read-identity
    start = 240
    for epoch in range(5, 9):
        sl = slice(start, start + 40)
        start += 40
        dd.process_batch(spark.createDataFrame(corpus_pdf.iloc[sl]), epoch)
        pre = dd._read_bucketed(store).count()
        dd.compact_store(store)
        assert dd._read_bucketed(store).count() == pre
        assert len(dd._live_epoch_dirs(store)) <= 3  # bounded, always
    assert dd.assignments().count() == start  # ids cover every row


def test_dhash_lane_matches_batch(spark, corpus_pdf, tmp_path):
    """Streaming gradient-sign dHash lane: micro-batched epochs equal
    the one-shot batch dedup_images(enable_lanes=("dhash",)) run —
    completing streaming/batch lane parity (substring stays batch-only
    by documented design)."""
    pdf = corpus_pdf.iloc[0:160]
    full = spark.createDataFrame(pdf).cache()
    want = checksum(
        dedup_images(full, CFG, BYTES_CFG, byte_stride=4,
                     enable_lanes=("dhash",))["assignments"],
        "id", "cluster_id",
    )
    dd = IncrementalDeduper(
        spark, str(tmp_path / "state"), CFG, BYTES_CFG, byte_stride=4,
        max_fanout=512, enable_lanes=("dhash",),
    )
    for epoch, chunk in enumerate([pdf.iloc[0:70], pdf.iloc[70:160]]):
        dd.process_batch(spark.createDataFrame(chunk), epoch)
    assert checksum(dd.assignments(), "id", "cluster_id") == want
    # the lane wrote its own store
    assert dd._read_bucketed("dhash_keys").count() > 0


def test_new_stores_probe_partition_pruned(spark, corpus_pdf, tmp_path):
    """The 10^12-scale property extends to every round-4 store: the
    exact-key, embedding-band, and dhash-key stores all read with a
    bucket partition filter on probe (same assert as the sig band
    store)."""
    import numpy as np

    rng = np.random.default_rng(7)
    pdf = corpus_pdf.iloc[0:60].copy()
    pdf["embedding"] = [
        [float(x) for x in v / np.linalg.norm(v)]
        for v in rng.standard_normal((60, 16))
    ]
    dd = IncrementalDeduper(
        spark, str(tmp_path / "state"), CFG, BYTES_CFG,
        enable_lanes=("dhash", "embedding"), exact_on=("bytes", "caption"),
        embedding_dim=16, num_buckets=16,
    )
    dd.process_batch(spark.createDataFrame(pdf), 0)
    for store in ("exact_keys", "emb_bands", "dhash_keys", "emb_vecs",
                  "clusters_by_id", "clusters_by_cluster"):
        probe = dd._read_bucketed(store, [1, 5, 9])
        plan = probe._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan, store
        assert "bucket" in plan.split("PartitionFilters", 1)[1][:200], store
        got = {r["bucket"] for r in probe.select("bucket").distinct().collect()}
        assert got <= {1, 5, 9}, store
    # assignments() resolution must partial-aggregate before the exchange
    # (max_by agg, not a sort window): partial_max_by BELOW the Exchange
    plan = dd.assignments()._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    i_partial = plan.find("partial_max_by")
    i_exchange = plan.find("Exchange")
    assert -1 not in (i_partial, i_exchange), plan
    # plan strings print top-down: exchange ≺ partial
    assert i_exchange < i_partial, plan


def test_config_mismatch_fails_fast(spark, corpus_pdf, tmp_path):
    """Reopening a state_dir under a different config must fail fast
    with StreamConfigMismatch naming both configs (the streaming analog
    of plans/checkpoint.CheckpointConfigMismatch), for the deduper AND
    the containment probe; the same config reopens fine."""
    from datasketches_cpp_spark.streaming.incremental import (
        StreamConfigMismatch,
    )

    state = str(tmp_path / "state")
    dd = IncrementalDeduper(spark, state, CFG, BYTES_CFG,
                            enable_lanes=("caption",))
    dd.process_batch(spark.createDataFrame(corpus_pdf.iloc[0:40]), 0)
    # same config: fine
    IncrementalDeduper(spark, state, CFG, BYTES_CFG,
                       enable_lanes=("caption",))
    # different banding config: refused, both fingerprints in the message
    other = SigConfig(num_perm=32, bands=16, kmv_k=64, shingle_w=3,
                      jaccard_threshold=0.5)
    with pytest.raises(StreamConfigMismatch) as ei:
        IncrementalDeduper(spark, state, other, BYTES_CFG,
                           enable_lanes=("caption",))
    assert "stored" in str(ei.value) and "given" in str(ei.value)
    # different lane set / fusion policy: also refused
    with pytest.raises(StreamConfigMismatch):
        IncrementalDeduper(spark, state, CFG, BYTES_CFG,
                           enable_lanes=("caption", "bytes"))
    with pytest.raises(StreamConfigMismatch):
        IncrementalDeduper(spark, state, CFG, BYTES_CFG,
                           enable_lanes=("caption",), edge_policy="all")

    from datasketches_cpp_spark.streaming.containment import (
        IncrementalContainmentProbe,
    )

    cstate = str(tmp_path / "cstate")
    IncrementalContainmentProbe(spark, cstate, CFG, tile=32, hop=16)
    with pytest.raises(StreamConfigMismatch):
        IncrementalContainmentProbe(spark, cstate, CFG, tile=16, hop=8)


def test_degenerate_first_epoch_yields_singletons(spark, tmp_path):
    """An epoch whose rows produce zero band keys (captions too short to
    shingle) must not crash on the empty band-store read — every row
    publishes as a singleton and later epochs proceed normally."""
    rows = [(f"d{i}", bytearray(b"\x00" * 64), 4, 4, "raw", "", 0)
            for i in range(5)]
    schema = ("image_id string, bytes binary, w int, h int, fmt string, "
              "caption string, phash long")
    dd = IncrementalDeduper(
        spark, str(tmp_path / "state"), CFG, BYTES_CFG,
        enable_lanes=("caption",),
    )
    dd.process_batch(spark.createDataFrame(rows, schema), 0)
    a = dd.assignments()
    assert a.count() == 5
    assert a.where("id != cluster_id").count() == 0
    rows2 = [(f"e{i}", bytearray(b"\x01" * 64), 4, 4, "raw",
              f"real caption number {i} with words", 0) for i in range(4)]
    dd.process_batch(spark.createDataFrame(rows2, schema), 1)
    assert dd.assignments().count() == 9


def test_assignments_time_travel_and_metrics(spark, corpus_pdf, tmp_path):
    """assignments(as_of_epoch=k) reproduces the table exactly as it
    stood after epoch k (the epoch deltas ARE the frontier history, and
    the generic compact_all fold preserves them); metrics() surfaces the
    per-epoch counters as a DataFrame."""
    dd = IncrementalDeduper(
        spark, str(tmp_path / "state"), CFG, BYTES_CFG,
        enable_lanes=("caption",), exact_on=("bytes", "caption"),
    )
    snaps = []
    for epoch, sl in enumerate([slice(0, 60), slice(60, 120), slice(120, 200)]):
        dd.process_batch(spark.createDataFrame(corpus_pdf.iloc[sl]), epoch)
        snaps.append(checksum(dd.assignments(), "id", "cluster_id"))
    for k, want in enumerate(snaps):
        assert checksum(dd.assignments(as_of_epoch=k), "id", "cluster_id") == want
    dd.compact_all()  # generic fold preserves the history rows
    for k, want in enumerate(snaps):
        assert checksum(dd.assignments(as_of_epoch=k), "id", "cluster_id") == want
    m = {r["epoch"]: r for r in dd.metrics().collect()}
    assert sorted(m) == [0, 1, 2]
    assert [m[k]["rows"] for k in (0, 1, 2)] == [60, 60, 80]
    assert sum(r["fresh_ids"] for r in m.values()) == 200
    assert all(r["cc_sec"] is not None and r["wall_sec"] is not None
               for r in m.values())
    # resolved compaction collapses history to the current state
    dd.compact_clusters()
    assert checksum(dd.assignments(), "id", "cluster_id") == snaps[-1]


def _rawv(seed: int, noise: bool, w: int = 16, h: int = 16,
          frames: int = 8) -> bytes:
    """Deterministic rawv clip; noise=True perturbs each frame ±2 around
    the same blocky base so the frame pHashes stay within radius."""
    import numpy as np

    g = np.random.default_rng(seed)
    gn = np.random.default_rng(seed + 10**6)
    out = []
    for _ in range(frames):
        base = g.integers(0, 256, (h // 4, w // 4, 3), dtype=np.uint8)
        f = np.repeat(np.repeat(base, 4, axis=0), 4, axis=1)
        if noise:
            f = np.clip(
                f.astype(np.int16) + gn.integers(-2, 3, f.shape), 0, 255
            ).astype(np.uint8)
        out.append(f.tobytes())
    return b"".join(out)


def test_video_lane_matches_batch(spark, tmp_path):
    """Streaming video lane == one-shot dedup_videos: every noisy twin
    arrives an epoch AFTER its original, so clustering them requires the
    persistent frame-key store; same knobs, same assignments checksum."""
    from datasketches_cpp_spark.operators.videodedup import dedup_videos

    rows = []
    for i in range(12):
        vid = f"v{i:03d}"
        if i % 4 == 3:
            rows.append((vid, _rawv(i - 1, True), 16, 16, "rawv"))
        else:
            rows.append((vid, _rawv(i, False), 16, 16, "rawv"))
    schema = "image_id string, bytes binary, w int, h int, fmt string"
    full = spark.createDataFrame(rows, schema)
    batch = dedup_videos(full, id_col="image_id")
    want = checksum(batch["assignments"], "id", "cluster_id")
    assert batch["assignments"].where("id != cluster_id").count() == 3

    dd = IncrementalDeduper(
        spark, str(tmp_path / "state"), enable_lanes=("video",),
    )
    ep0 = [r for r in rows if int(r[0][1:]) % 4 != 3]
    ep1 = [r for r in rows if int(r[0][1:]) % 4 == 3]
    dd.process_batch(spark.createDataFrame(ep0, schema), 0)
    dd.process_batch(spark.createDataFrame(ep1, schema), 1)
    assert checksum(dd.assignments(), "id", "cluster_id") == want


def test_audio_lane_matches_batch(spark, tmp_path):
    """Streaming audio lane == one-shot dedup_audio: the noisy twin and
    an exact re-render arrive after their originals; the landmark store
    carries the constellation across the epoch boundary."""
    import numpy as np

    from datasketches_cpp_spark.operators.audiodedup import dedup_audio

    def pcm(bins, noise_seed=None) -> bytes:
        t = np.arange(8 * 1024)
        x = sum(a * np.sin(2 * np.pi * b * t / 1024)
                for b, a in zip(bins, (1.0, 0.8, 0.6)))
        if noise_seed is not None:
            x = x + np.random.default_rng(noise_seed).normal(0, 0.002, x.shape)
        return (np.clip(x, -1, 1) * 20000).astype("<i2").tobytes()

    rows = [
        ("a1", pcm([50, 120, 300]), "pcm16"),
        ("a2", pcm([50, 120, 300], noise_seed=5), "pcm16"),
        ("b1", pcm([60, 130, 310]), "pcm16"),
        ("b2", pcm([60, 130, 310]), "pcm16"),
        ("c1", pcm([70, 140, 320]), "pcm16"),
    ]
    schema = "image_id string, bytes binary, fmt string"
    full = spark.createDataFrame(rows, schema)
    batch = dedup_audio(full, id_col="image_id")
    want = checksum(batch["assignments"], "id", "cluster_id")

    dd = IncrementalDeduper(
        spark, str(tmp_path / "state"), enable_lanes=("audio",),
    )
    first = {"a1", "b1", "c1"}
    dd.process_batch(
        spark.createDataFrame([r for r in rows if r[0] in first], schema), 0)
    dd.process_batch(
        spark.createDataFrame([r for r in rows if r[0] not in first], schema), 1)
    got = dd.assignments()
    assert checksum(got, "id", "cluster_id") == want
    a = {r["id"]: r["cluster_id"] for r in got.collect()}
    assert a["a2"] == "a1" and a["b2"] == "b1" and a["c1"] == "c1"


def test_incremental_cc_adversarial_merge_cascades(spark, tmp_path):
    """Direct torture of the incremental cluster maintenance
    (_apply_edges): canon takeover by a later-arriving smaller id,
    multi-cluster merges through a single epoch's contracted graph,
    a no-new-ids bridging epoch, a re-sent id that must NOT break out
    of its cluster, replay idempotence, and compaction identity — each
    epoch checked against batch assign_clusters over the accumulated
    vertex/edge sets (the law the store maintains incrementally)."""
    from datasketches_cpp_spark.operators.cc import assign_clusters

    dd = IncrementalDeduper(
        spark, str(tmp_path / "state"), CFG, BYTES_CFG,
        enable_lanes=("caption",), num_buckets=8,
    )
    epochs = [
        # (new ids, edges): canon of {c,d} is c; of {x,y} is x; z single
        (["c", "d", "x", "y", "z"], [("c", "d"), ("x", "y")]),
        # smaller id b takes over cluster c -> members c,d move
        (["b"], [("b", "d")]),
        # one epoch: w joins x-cluster, (d,x) merges b- and x-clusters
        # (contracted edge between two OLD canons), plus a fresh pair
        (["a", "w"], [("a", "z"), ("w", "y"), ("d", "x")]),
        # no new ids at all: bridge the two remaining clusters
        ([], [("z", "w")]),
        # re-sent id with no edges: must stay in its cluster
        (["c"], []),
    ]
    seen_ids: list[str] = []
    seen_edges: list[tuple] = []
    for ep, (ids, edges) in enumerate(epochs):
        seen_ids += [i for i in ids if i not in seen_ids]
        seen_edges += edges
        ids_df = spark.createDataFrame([(i,) for i in ids], "id string")
        e_df = spark.createDataFrame(edges or [], "a string, b string")
        dd._apply_edges(ids_df, e_df, ep)
        # commit the epoch as process_batch would — compaction (below)
        # folds only committed slots
        dd._mark_epoch(ep, {"rows": len(ids)})
        want = checksum(
            assign_clusters(
                spark.createDataFrame([(i,) for i in seen_ids], "id string"),
                spark.createDataFrame(seen_edges or [], "a string, b string"),
            ),
            "id", "cluster_id",
        )
        got = checksum(dd.assignments(), "id", "cluster_id")
        assert got == want, f"epoch {ep}: incremental != batch"
    final = {r["id"]: r["cluster_id"] for r in dd.assignments().collect()}
    assert final == {i: "a" for i in "abcdwxyz"} | {"z": "a"}
    # replay of the bridging epoch: recomputed from pre-epoch state only
    dd._apply_edges(
        spark.createDataFrame([], "id string"),
        spark.createDataFrame([("z", "w")], "a string, b string"), 3,
    )
    cs = checksum(dd.assignments(), "id", "cluster_id")
    # compaction folds both cluster stores, resolution unchanged
    folded = dd.compact_all()
    assert folded.get("clusters_by_id") >= 2
    assert folded.get("clusters_by_cluster") >= 2
    assert checksum(dd.assignments(), "id", "cluster_id") == cs
    # resolved compaction: all superseded/stale rows drop — exactly one
    # row per live id in BOTH stores (the churn above rewrote most ids
    # 2-3 times) — and resolution is byte-identical before/after
    assert dd.compact_clusters() == 2  # one compacted dir per store
    assert dd._read_bucketed("clusters_by_id").count() == 8  # live ids only
    assert dd._read_bucketed("clusters_by_cluster").count() == 8
    assert checksum(dd.assignments(), "id", "cluster_id") == cs
    # and the store still accepts later epochs after a resolved fold
    dd._apply_edges(
        spark.createDataFrame([("q",)], "id string"),
        spark.createDataFrame([("q", "x")], "a string, b string"), 5,
    )
    dd._mark_epoch(5, {"rows": 1})  # assignments() reads committed slots
    final2 = {r["id"]: r["cluster_id"] for r in dd.assignments().collect()}
    assert final2["q"] == "a" and len(final2) == 9


def test_fusion_k_above_lane_count_matches_batch(spark, corpus_pdf, tmp_path):
    """edge_policy=2 with a single enabled lane must emit NO edges —
    the batch semantics (count_distinct(lane) >= 2 can never hold), not
    an OR fallback. Streaming and batch agree: all singletons."""
    pdf = corpus_pdf.iloc[0:60]
    full = spark.createDataFrame(pdf).cache()
    batch = dedup_images(full, CFG, BYTES_CFG, byte_stride=4,
                         enable_lanes=("bytes",), edge_policy=2)
    assert batch["assignments"].where("id != cluster_id").count() == 0
    dd = IncrementalDeduper(
        spark, str(tmp_path / "state"), CFG, BYTES_CFG, byte_stride=4,
        enable_lanes=("bytes",), edge_policy=2,
    )
    dd.process_batch(spark.createDataFrame(pdf), 0)
    got = dd.assignments()
    assert got.count() == 60
    assert got.where("id != cluster_id").count() == 0


def test_compact_skips_uncommitted_epoch(spark, corpus_pdf, tmp_path):
    """Replay-safety regression: a crash between a store write and
    _mark_epoch leaves an uncommitted epoch dir; compaction must NOT fold
    it (folding would launder mid-flight data into prior state, past the
    replay's exclude_epoch probe). The uncommitted dir stays live and the
    replayed epoch converges to the clean-run assignments."""
    dd = IncrementalDeduper(
        spark, str(tmp_path / "state"), CFG, BYTES_CFG,
        enable_lanes=("caption",), num_buckets=8,
    )
    dd.process_batch(spark.createDataFrame(corpus_pdf.iloc[0:60]), 0)
    dd.process_batch(spark.createDataFrame(corpus_pdf.iloc[60:130]), 1)
    store = "sig_caption_bands"
    committed = checksum(
        dd._read_bucketed(store, dirs=dd._committed_epoch_dirs(store)),
        "id", "band_idx", "band_hash", "bucket",
    )
    # simulate the crash: epoch 2's store write lands (a synthetic slot —
    # content is irrelevant, only its uncommitted status matters), but
    # _mark_epoch never runs
    uncommitted = spark.createDataFrame(
        [("ghost", 0, 12345)], "id string, band_idx int, band_hash long"
    )
    dd._write_epoch_bucketed(store, uncommitted, 2, ["band_idx", "band_hash"])
    assert not dd._epoch_done(2)
    # compaction folds ONLY the two committed epochs
    assert dd.compact_store(store) == 2
    live = dd._live_epoch_dirs(store)
    assert any(d.rstrip("/").endswith("epoch_000000000002") for d in live)
    # the compacted output equals the committed state exactly — no ghost
    compacted_dirs = [d for d in live if "compacted_" in d]
    assert len(compacted_dirs) == 1
    assert checksum(
        dd._read_bucketed(store, dirs=compacted_dirs),
        "id", "band_idx", "band_hash", "bucket",
    ) == committed
    # the replay overwrites the uncommitted slot and converges
    dd.process_batch(spark.createDataFrame(corpus_pdf.iloc[130:200]), 2)
    got = checksum(dd.assignments(), "id", "cluster_id")
    clean = IncrementalDeduper(
        spark, str(tmp_path / "clean"), CFG, BYTES_CFG,
        enable_lanes=("caption",), num_buckets=8,
    )
    for epoch, sl in enumerate([slice(0, 60), slice(60, 130), slice(130, 200)]):
        clean.process_batch(spark.createDataFrame(corpus_pdf.iloc[sl]), epoch)
    assert got == checksum(clean.assignments(), "id", "cluster_id")


def test_start_refuses_reset_spark_checkpoint(spark, tmp_path):
    """Silent-skip guard: committed epochs + an empty/new Spark
    checkpoint means batch ids would restart at 0 and collide with done
    epochs (every new batch silently dropped) — start() must refuse."""
    from datasketches_cpp_spark.streaming.incremental import (
        StreamConfigMismatch,
    )

    dd = IncrementalDeduper(
        spark, str(tmp_path / "state"), CFG, BYTES_CFG,
        enable_lanes=("caption",),
    )
    dd._mark_epoch(0, {"rows": 10})
    src = tmp_path / "src"
    src.mkdir()
    with pytest.raises(StreamConfigMismatch, match="checkpoint"):
        dd.start(str(src), "image_id string, caption string")
