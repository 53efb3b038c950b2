"""Resumable flagship pipeline: multi-lane image dedup with stage-boundary
checkpoints (north_rule: "resumable from checkpoint with per-partition
lineage + metrics").

Stage graph (each box one manifest-gated snapshot; see plans/checkpoint.py):

    caption_sig ─┐
    bytes_sig  ──┼─→ edges ─→ assignments
    (phash + substring lanes are recomputed inside the edges stage — they
     are cheap JVM-side scans over the input, not worth a snapshot)

Killing the driver after any stage commit and re-running resumes from the
next stage: committed stages are READ (their compute closures never run),
and the final assignments are byte-identical — the pipeline-state analog of
the reference's serialize/deserialize isomorphism tests
(hll/test/IsomorphicTest.cpp:95-137, theta_sketch_test.cpp:270-302).

At 100 TB the two signature stages are the expensive passes over raw image
bytes (narrow, no shuffle); snapshotting exactly those means a mid-run
failure never re-reads the corpus. The edges snapshot bounds re-verification
work; assignments is the published result table.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.cc import assign_clusters
from ..operators.imagededup import phash_pairs
from ..operators.lsh import candidate_pairs
from ..operators.minhash import compute_signatures
from ..operators.sigkernel import SigConfig
from ..operators.substring import substring_pairs
from ..operators.verify import verify_pairs
from .checkpoint import StageCheckpointer


def run_fingerprint(
    cfg: SigConfig,
    bytes_cfg: SigConfig,
    byte_stride: int,
    max_pairs_group: int = 256,
) -> str:
    """One fingerprint for the whole run config — both lane configs plus
    every knob that shapes stage OUTPUTS (stride, hot-band cap). Any
    change ⇒ different fingerprint ⇒ resume refuses; resuming committed
    signatures under a different pair-stage cap would silently produce a
    mixed-config result equal to neither clean run."""
    return (
        f"{cfg.fingerprint()}-{bytes_cfg.fingerprint()}"
        f"-s{byte_stride}-g{max_pairs_group}"
    )


def dedup_images_resumable(
    spark: SparkSession,
    images: DataFrame,
    ckpt_root: str,
    cfg: SigConfig | None = None,
    bytes_cfg: SigConfig | None = None,
    max_pairs_group: int = 256,
    byte_stride: int = 4,
) -> dict:
    """Checkpointed equivalent of operators.imagededup.dedup_images.

    Returns {'assignments', 'edges', 'checkpointer'}; per-stage lineage and
    metrics are in ``<ckpt_root>/_LINEAGE.jsonl`` and each stage's
    ``_MANIFEST.json``.
    """
    cfg = cfg or SigConfig()
    bytes_cfg = bytes_cfg or SigConfig(
        seed=cfg.seed,
        shingle_w=16,
        num_perm=cfg.num_perm,
        kmv_k=cfg.kmv_k,
        bands=cfg.bands,
        jaccard_threshold=0.9,
    )
    ck = StageCheckpointer(
        spark, ckpt_root,
        run_fingerprint(cfg, bytes_cfg, byte_stride, max_pairs_group),
    )

    # in-query counters (Observation) ride each stage's write job — no
    # extra actions (SURVEY §2B S10); approx_count_distinct doubles as the
    # sketch-metrics example the reference motivates (#16)
    sig_obs = {
        "rows": F.count(F.lit(1)),
        "empty_sigs": F.sum((F.col("n_shingles") == 0).cast("long")),
    }
    cap_sig = ck.run_stage(
        "caption_sig",
        lambda: compute_signatures(images, "image_id", "caption", cfg, kind="text"),
        observe=sig_obs,
    )
    byt_sig = ck.run_stage(
        "bytes_sig",
        lambda: compute_signatures(
            images, "image_id", "bytes", bytes_cfg, kind="binary",
            byte_stride=byte_stride,
        ),
        observe=sig_obs,
    )

    def _edges() -> DataFrame:
        cap_pairs = candidate_pairs(cap_sig, max_pairs_group=max_pairs_group)
        cap_ver = verify_pairs(cap_pairs, cap_sig, cfg, use_simhash=True, include_mh=False).where("passed")
        byt_pairs = candidate_pairs(byt_sig, max_pairs_group=max_pairs_group)
        byt_ver = verify_pairs(byt_pairs, byt_sig, bytes_cfg, use_simhash=False, include_mh=False).where(
            "passed"
        )
        ph_ver = phash_pairs(images, cfg, max_pairs_group=max_pairs_group)
        sub = substring_pairs(images, "image_id", "caption", cfg)
        edges = (
            cap_ver.select("a", "b")
            .union(byt_ver.select("a", "b"))
            .union(ph_ver.select("a", "b"))
            .union(sub.select("a", "b"))
            .dropDuplicates(["a", "b"])
        )
        return edges

    edges = ck.run_stage("edges", _edges, observe={"rows": F.count(F.lit(1))})

    assignments = ck.run_stage(
        "assignments",
        lambda: assign_clusters(images.select(F.col("image_id").alias("id")), edges),
        observe={
            "rows": F.count(F.lit(1)),
            "clusters_approx": F.approx_count_distinct("cluster_id"),
        },
    )
    return {"assignments": assignments, "edges": edges, "checkpointer": ck}
