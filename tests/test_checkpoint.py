"""S9/S10 checkpoint/resume tests — the pipeline-state analog of the
reference's isomorphism + deserialize-hardening suites
(hll/test/IsomorphicTest.cpp:95-137; common/test/deserialize_hardening_test.cpp:43-150):

  - kill-and-resume: committed stages are read, not recomputed, and the
    final cluster assignments are byte-identical (checksum);
  - config-fingerprint mismatch on resume fails fast (seed-hash analog,
    theta_union_base_impl.hpp:41-42);
  - corrupt snapshots (truncated part file) fail fast;
  - torn manifests (died before the atomic rename) are invisible — the
    stage recomputes.
"""

import json
import os

import pytest

from datasketches_cpp_spark.operators.imagededup import dedup_images
from datasketches_cpp_spark.operators.sigkernel import SigConfig
from datasketches_cpp_spark.plans.checkpoint import (
    CheckpointConfigMismatch,
    CheckpointCorrupt,
    StageCheckpointer,
    checksum,
)
from datasketches_cpp_spark.plans.pipeline import dedup_images_resumable
from datasketches_cpp_spark.sources.images import generate_images

CFG = SigConfig(num_perm=64, bands=32, kmv_k=128, shingle_w=3, jaccard_threshold=0.5)
BYTES_CFG = SigConfig(
    num_perm=64, bands=16, kmv_k=128, shingle_w=16, jaccard_threshold=0.9
)


@pytest.fixture(scope="module")
def images_df(spark):
    images, _ = generate_images(300, seed=7)
    return spark.createDataFrame(images).repartition(6).cache()


# ---------------------------------------------------------------------------
# StageCheckpointer unit behavior
# ---------------------------------------------------------------------------


def test_run_stage_computes_once_then_resumes(spark, tmp_path):
    ck = StageCheckpointer(spark, str(tmp_path / "ck"), fingerprint="fp1")
    calls = {"n": 0}

    def make():
        calls["n"] += 1
        return spark.range(100).withColumnRenamed("id", "x")

    out1 = ck.run_stage("s1", make)
    assert out1.count() == 100 and calls["n"] == 1
    out2 = ck.run_stage("s1", make)
    assert out2.count() == 100 and calls["n"] == 1  # resumed, not recomputed

    # manifest carries per-partition lineage that sums to the row count
    m = ck.load_manifest("s1")
    assert m["rows"] == 100
    assert sum(p["rows"] for p in m["partitions"]) == 100
    assert all(p["bytes"] > 0 for p in m["partitions"])
    # lineage log recorded one write + one resume
    events = [
        json.loads(line)
        for line in open(os.path.join(str(tmp_path / "ck"), "_LINEAGE.jsonl"))
    ]
    assert [e["event"] for e in events if e["stage"] == "s1"] == ["write", "resume"]


def test_fingerprint_mismatch_fails_fast(spark, tmp_path):
    root = str(tmp_path / "ck")
    ck1 = StageCheckpointer(spark, root, fingerprint="fpA")
    ck1.run_stage("s1", lambda: spark.range(10))
    ck2 = StageCheckpointer(spark, root, fingerprint="fpB")
    with pytest.raises(CheckpointConfigMismatch):
        ck2.run_stage("s1", lambda: spark.range(10))


def test_corrupt_snapshot_fails_fast(spark, tmp_path):
    root = str(tmp_path / "ck")
    ck = StageCheckpointer(spark, root, fingerprint="fp")
    ck.run_stage("s1", lambda: spark.range(1000))
    data_dir = os.path.join(root, "s1", "data")
    part = next(f for f in os.listdir(data_dir) if f.endswith(".parquet"))
    with open(os.path.join(data_dir, part), "r+b") as f:
        f.truncate(8)  # torn part file
    with pytest.raises(CheckpointCorrupt):
        ck.run_stage("s1", lambda: spark.range(1000))


def test_torn_manifest_recomputes(spark, tmp_path):
    root = str(tmp_path / "ck")
    ck = StageCheckpointer(spark, root, fingerprint="fp")
    calls = {"n": 0}

    def make():
        calls["n"] += 1
        return spark.range(50)

    ck.run_stage("s1", make)
    with open(os.path.join(root, "s1", "_MANIFEST.json"), "w") as f:
        f.write('{"version": 1, "trunc')  # died mid-write before os.replace
    ck.run_stage("s1", make)
    assert calls["n"] == 2  # torn manifest == incomplete stage


# ---------------------------------------------------------------------------
# Kill-and-resume isomorphism on the flagship pipeline
# ---------------------------------------------------------------------------


def test_pipeline_resume_is_isomorphic(spark, images_df, tmp_path):
    root = str(tmp_path / "run1")

    res = dedup_images_resumable(spark, images_df, root, CFG, BYTES_CFG)
    cs_full = checksum(res["assignments"], "id", "cluster_id")

    # the non-checkpointed pipeline agrees (checkpointing changes nothing)
    direct = dedup_images(images_df, CFG, BYTES_CFG, byte_stride=4)
    assert checksum(direct["assignments"], "id", "cluster_id") == cs_full

    # simulate a crash after the signature stages: wipe downstream stages
    import shutil

    shutil.rmtree(os.path.join(root, "edges"))
    shutil.rmtree(os.path.join(root, "assignments"))

    # resume: signature stage closures must NOT run again — poison them
    def boom(*a, **k):
        raise AssertionError("signature stage recomputed on resume")

    import datasketches_cpp_spark.plans.pipeline as plmod

    orig = plmod.compute_signatures
    plmod.compute_signatures = boom
    try:
        res2 = dedup_images_resumable(spark, images_df, root, CFG, BYTES_CFG)
    finally:
        plmod.compute_signatures = orig
    assert checksum(res2["assignments"], "id", "cluster_id") == cs_full

    # full re-run with everything committed: answers identical again
    res3 = dedup_images_resumable(spark, images_df, root, CFG, BYTES_CFG)
    assert checksum(res3["assignments"], "id", "cluster_id") == cs_full

    # per-stage lineage is present for every snapshot stage
    for stage in ("caption_sig", "bytes_sig", "edges", "assignments"):
        m = StageCheckpointer(
            spark, root, res3["checkpointer"].fingerprint
        ).load_manifest(stage)
        assert m is not None and m["rows"] == sum(p["rows"] for p in m["partitions"])


def test_pipeline_resume_rejects_config_change(spark, images_df, tmp_path):
    root = str(tmp_path / "run2")
    dedup_images_resumable(spark, images_df, root, CFG, BYTES_CFG)
    other = SigConfig(
        num_perm=64, bands=32, kmv_k=128, shingle_w=4, jaccard_threshold=0.5
    )
    with pytest.raises(CheckpointConfigMismatch):
        dedup_images_resumable(spark, images_df, root, other, BYTES_CFG)


def test_observed_metrics_in_manifest(spark, tmp_path):
    """S10 in-query counters: Observation rides the stage's write job and
    lands in the manifest + lineage — no extra Spark action."""
    import pyspark.sql.functions as F

    from datasketches_cpp_spark.plans.checkpoint import StageCheckpointer

    ck = StageCheckpointer(spark, str(tmp_path / "ck"), "fp-observe")
    df = spark.range(100).withColumn("g", F.col("id") % 7)
    ck.run_stage(
        "obs_stage",
        lambda: df,
        observe={
            "rows": F.count(F.lit(1)),
            "groups_approx": F.approx_count_distinct("g"),
            "id_sum": F.sum("id"),
        },
    )
    m = ck.load_manifest("obs_stage")
    assert m["observed"]["rows"] == 100
    assert m["observed"]["id_sum"] == 4950
    assert abs(m["observed"]["groups_approx"] - 7) <= 1
    # resume path: fn not invoked, observed metrics preserved in manifest
    ck2 = StageCheckpointer(spark, str(tmp_path / "ck"), "fp-observe")
    ck2.run_stage("obs_stage", lambda: (_ for _ in ()).throw(AssertionError))
    assert ck2.load_manifest("obs_stage")["observed"]["rows"] == 100


def test_unregistered_scheme_fails_fast(spark):
    """A root whose scheme has no registered Hadoop FileSystem must fail
    LOUDLY at construction — silent manifest mis-detection on an
    unreachable store is the worst resume failure."""
    import pytest as _pytest

    from datasketches_cpp_spark.plans.checkpoint import StageCheckpointer

    with _pytest.raises(ValueError, match="nosuchfs"):
        StageCheckpointer(spark, "nosuchfs://bucket/ckpt", "fp")


def test_scheme_qualified_root_full_cycle(spark, tmp_path):
    """The checkpoint root is scheme-agnostic: a file:// URI exercises the
    whole Hadoop FileSystem path — manifest write/rename, FileStatus
    integrity check, footer-only row counts, lineage append, corrupt
    detection — end to end. (hdfs:///s3a:// route through the identical
    facade; only the scheme differs.)"""
    root = f"file://{tmp_path}/ck"
    local_root = str(tmp_path / "ck")
    ck = StageCheckpointer(spark, root, fingerprint="fp-uri")
    calls = {"n": 0}

    def make():
        calls["n"] += 1
        return spark.range(200).withColumnRenamed("id", "x")

    out = ck.run_stage("s1", make)
    assert out.count() == 200 and calls["n"] == 1

    # manifest landed (visible through the plain local path) with
    # footer-derived per-partition row counts
    m = json.load(open(os.path.join(local_root, "s1", "_MANIFEST.json")))
    assert m["rows"] == 200 == sum(p["rows"] for p in m["partitions"])
    assert all(p["bytes"] > 0 for p in m["partitions"])

    # resume through the URI root: fn not invoked again, same data
    ck2 = StageCheckpointer(spark, root, fingerprint="fp-uri")
    out2 = ck2.run_stage("s1", make)
    assert out2.count() == 200 and calls["n"] == 1

    # lineage log accumulated through the facade (append or
    # read-concat-rewrite, whichever the store supports)
    events = [
        json.loads(line)
        for line in open(os.path.join(local_root, "_LINEAGE.jsonl"))
    ]
    assert [e["event"] for e in events if e["stage"] == "s1"] == ["write", "resume"]

    # corrupt a part file out-of-band: metadata-only check still trips
    data_dir = os.path.join(local_root, "s1", "data")
    part = next(f for f in os.listdir(data_dir) if f.endswith(".parquet"))
    with open(os.path.join(data_dir, part), "r+b") as f:
        f.truncate(8)
    with pytest.raises(CheckpointCorrupt):
        ck2.run_stage("s1", make)


def test_run_fingerprint_covers_pair_stage_cap():
    """max_pairs_group shapes the edges stage: resuming committed
    signatures under a different cap must be refused via the
    fingerprint, not silently blended."""
    from datasketches_cpp_spark.operators.sigkernel import SigConfig
    from datasketches_cpp_spark.plans.pipeline import run_fingerprint

    cfg = SigConfig()
    a = run_fingerprint(cfg, cfg, 4, max_pairs_group=256)
    b = run_fingerprint(cfg, cfg, 4, max_pairs_group=64)
    assert a != b


def test_recommit_crash_window_recomputes_not_corrupt(spark, tmp_path):
    """A crash during a RE-commit (manifest already existed) must look
    like 'never committed' on restart — the stale manifest is retired
    before the data dir is touched, so load_manifest returns None and
    run_stage recomputes instead of raising CheckpointCorrupt over
    missing data."""
    from datasketches_cpp_spark.plans.checkpoint import StageCheckpointer

    ck = StageCheckpointer(spark, str(tmp_path / "ck"), "fp1")
    df = spark.range(10).toDF("v")
    ck.write("s", df)
    assert ck.is_complete("s")

    # simulate the crash: a re-commit whose Spark write job dies
    class Boom(RuntimeError):
        pass

    class ExplodingWriter:
        def __getattr__(self, _):
            raise Boom()

    real_write = type(df).write
    try:
        type(df).write = property(lambda self: ExplodingWriter())
        with pytest.raises(Boom):
            ck.write("s", spark.range(20).toDF("v"))
    finally:
        type(df).write = real_write
    # the stage must now read as UNCOMMITTED (recompute), not corrupt
    assert ck.load_manifest("s") is None
    out = ck.run_stage("s", lambda: spark.range(20).toDF("v"))
    assert out.count() == 20


def test_append_line_repairs_torn_log(spark, tmp_path):
    """append_line's rewrite fallback drops a torn trailing fragment and
    never duplicates an already-landed line."""
    import json as _json

    from datasketches_cpp_spark.plans.fsio import HadoopFS

    fs = HadoopFS(spark, str(tmp_path))
    log = str(tmp_path / "lineage.jsonl")
    good = _json.dumps({"event": "a"})
    fs.write_bytes_atomic(log, (good + "\n").encode() + b'{"torn": ')
    fs.append_line(log, _json.dumps({"event": "b"}))
    lines = fs.read_bytes(log).decode().splitlines()
    assert [(_json.loads(l)["event"]) for l in lines] == ["a", "b"]
    # idempotent when the line already fully landed (the repair path
    # treats a trailing exact copy as the failed append's own payload —
    # lineage records carry timestamps, so legitimate consecutive
    # duplicates do not occur)
    fs.append_line(log, _json.dumps({"event": "b"}))
    lines = fs.read_bytes(log).decode().splitlines()
    assert [(_json.loads(l)["event"]) for l in lines] == ["a", "b"]
