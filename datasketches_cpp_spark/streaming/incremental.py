"""Structured Streaming incremental near-dup detection.

Sketches are order-insensitive monoids (the reference's whole streaming
story: any-order updates + merges give the same answer,
SURVEY.md §2A note on watermarks) — so the streaming pipeline is the batch
pipeline with a persistent signature store:

  micro-batch of new images
    → signatures (same kernels, same config fingerprint)
    → candidate pairs = new-batch bands ⋈ band index of EVERYTHING seen
      (new×old and new×new in one join; old×old pairs were emitted by the
      batches that introduced them — the union over batches covers every
      co-banded pair exactly once)
    → verify (same UDF) → append edges
    → connected components over the accumulated edge set → publish
      assignments

Wiring is ``readStream → foreachBatch(IncrementalDeduper.process_batch)``
with a Spark checkpointLocation: exactly-once per micro-batch, and the
signature/edge stores make the *semantic* state resumable — kill the query
anywhere, restart, and unprocessed files replay into the same stores
(idempotent per batch via epoch manifest, mirroring plans/checkpoint.py).

Deliberate scope: the caption/bytes/phash lanes stream; the exact-substring
lane is batch-only (its inverted index wants a corpus-wide build — run it
as a periodic compaction job over the same stores).

Scale notes: the per-batch join is |new bands| ⋈ band index — broadcast the
new side (micro-batches are small by construction); the band index is
bucketed parquet keyed by (band_idx, band_hash) so at 10^12 rows the join
prunes to matching buckets instead of rescanning the store. Per-new-row
fan-out in degenerate bands is capped deterministically (``max_fanout``),
the streaming analog of the batch hot-band cap.
"""

from __future__ import annotations

import json
import os
import time

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.cc import assign_clusters
from ..operators.minhash import compute_signatures
from ..operators.sigkernel import SigConfig
from ..operators.verify import verify_pairs


class IncrementalDeduper:
    """foreachBatch-driven incremental dedup with a parquet state store."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        cfg: SigConfig | None = None,
        bytes_cfg: SigConfig | None = None,
        byte_stride: int = 4,
        max_fanout: int = 64,
        enable_lanes: tuple = ("caption", "bytes", "phash"),
    ):
        self.spark = spark
        self.state_dir = state_dir
        self.cfg = cfg or SigConfig()
        self.bytes_cfg = bytes_cfg or SigConfig(
            seed=self.cfg.seed, shingle_w=16, num_perm=self.cfg.num_perm,
            kmv_k=self.cfg.kmv_k, bands=self.cfg.bands, jaccard_threshold=0.9,
        )
        self.byte_stride = byte_stride
        self.max_fanout = max_fanout
        self.enable_lanes = enable_lanes
        os.makedirs(state_dir, exist_ok=True)

    # -- state paths ---------------------------------------------------------
    def _p(self, name: str) -> str:
        return os.path.join(self.state_dir, name)

    def _exists(self, name: str) -> bool:
        p = self._p(name)
        if not os.path.exists(p):
            return False
        for _, _, files in os.walk(p):
            if any(f.endswith(".parquet") for f in files):
                return True
        return False

    def _read(self, name: str) -> DataFrame | None:
        if not self._exists(name):
            return None
        return (
            self.spark.read.option("recursiveFileLookup", "true")
            .parquet(self._p(name))
        )

    # -- epoch-atomic store writes --------------------------------------------
    # foreachBatch is at-least-once: a crash AFTER a store write but BEFORE
    # _mark_epoch replays the whole epoch. Appending on replay would
    # double-count signatures/ids/edges, silently inflating assignments.
    # Every store write therefore lands in an epoch-tagged subdirectory with
    # overwrite semantics: replaying epoch e rewrites exactly epoch e's
    # data, and _mark_epoch (atomic rename) is the commit point.
    def _write_epoch(self, name: str, df: DataFrame, epoch_id: int) -> None:
        df.write.mode("overwrite").parquet(
            self._p(os.path.join(name, f"epoch_{epoch_id:012d}"))
        )

    def _epoch_done(self, epoch_id: int) -> bool:
        p = self._p("epochs.json")
        if not os.path.exists(p):
            return False
        with open(p) as f:
            return str(epoch_id) in json.load(f)["done"]

    def _mark_epoch(self, epoch_id: int, meta: dict) -> None:
        p = self._p("epochs.json")
        state = {"done": {}}
        if os.path.exists(p):
            with open(p) as f:
                state = json.load(f)
        state["done"][str(epoch_id)] = meta
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, p)

    # -- lane helpers ----------------------------------------------------------
    def _lane_pairs(
        self,
        sig_new: DataFrame,
        store_name: str,
        cfg: SigConfig,
        use_simhash: bool,
        epoch_id: int,
    ) -> DataFrame:
        """Write new sigs into the lane store's epoch slot (idempotent on
        replay), join new bands against the full band index, verify.
        Returns passed (a, b) edges."""
        self._write_epoch(store_name, sig_new, epoch_id)
        sig_all = self._read(store_name)

        def bands_of(df: DataFrame) -> DataFrame:
            return df.where(F.col("n_shingles") > 0).select(
                "id", F.posexplode("bands").alias("band_idx", "band_hash")
            )

        new_b = bands_of(sig_new).select(
            F.col("id").alias("new_id"), "band_idx", "band_hash"
        )
        all_b = bands_of(sig_all)
        matched = all_b.join(F.broadcast(new_b), ["band_idx", "band_hash"]).where(
            F.col("id") != F.col("new_id")
        )
        # deterministic fan-out cap per (new row, band): hot-band guard
        from pyspark.sql import Window

        wnd = Window.partitionBy("new_id", "band_idx").orderBy("id")
        cand = (
            matched.withColumn("_rn", F.row_number().over(wnd))
            .where(F.col("_rn") <= self.max_fanout)
            .select(
                F.least("id", "new_id").alias("a"),
                F.greatest("id", "new_id").alias("b"),
            )
            .dropDuplicates(["a", "b"])
        )
        return verify_pairs(cand, sig_all, cfg, use_simhash=use_simhash, include_mh=False).where(
            "passed"
        ).select("a", "b")

    # -- the foreachBatch callback -----------------------------------------------
    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        if self._epoch_done(epoch_id):
            return  # replay after restart: already folded into the stores
        t0 = time.time()
        batch_df = batch_df.localCheckpoint(eager=True)  # one scan of the source
        n = batch_df.count()
        if n == 0:
            self._mark_epoch(epoch_id, {"rows": 0})
            return
        edges_parts = []

        if "caption" in self.enable_lanes:
            sig = compute_signatures(
                batch_df, "image_id", "caption", self.cfg, kind="text"
            )
            edges_parts.append(
                self._lane_pairs(
                    sig, "sig_caption", self.cfg, use_simhash=True, epoch_id=epoch_id
                )
            )
        if "bytes" in self.enable_lanes:
            sig = compute_signatures(
                batch_df, "image_id", "bytes", self.bytes_cfg,
                kind="binary", byte_stride=self.byte_stride,
            )
            edges_parts.append(
                self._lane_pairs(
                    sig, "sig_bytes", self.bytes_cfg, use_simhash=False,
                    epoch_id=epoch_id,
                )
            )
        if "phash" in self.enable_lanes:
            edges_parts.append(self._phash_lane(batch_df, epoch_id))

        ids_new = batch_df.select(F.col("image_id").alias("id"))
        self._write_epoch("ids", ids_new, epoch_id)

        new_edges = edges_parts[0]
        for e in edges_parts[1:]:
            new_edges = new_edges.union(e)
        new_edges = new_edges.dropDuplicates(["a", "b"])
        self._write_epoch("edges", new_edges, epoch_id)

        # publish assignments over everything seen so far
        all_ids = self._read("ids")
        all_edges = self._read("edges")
        assignments = assign_clusters(all_ids, all_edges)
        assignments.write.mode("overwrite").parquet(self._p("assignments"))
        self._mark_epoch(
            epoch_id, {"rows": n, "wall_sec": round(time.time() - t0, 3)}
        )

    def _phash_lane(self, batch_df: DataFrame, epoch_id: int) -> DataFrame:
        """Streaming pHash lane: slice-combo keys of the new batch join the
        accumulated pHash store; verify with bit_count."""
        from ..operators.imagededup import phash_combo_keys_expr

        def keys(df: DataFrame, idc: str) -> DataFrame:
            arr = phash_combo_keys_expr("phash", self.cfg)
            return df.select(
                F.col("image_id").alias(idc), F.col("phash").alias(f"ph_{idc}"),
                F.posexplode(arr).alias("band_idx", "band_hash"),
            )

        self._write_epoch("phash", batch_df.select("image_id", "phash"), epoch_id)
        store = self._read("phash")
        new_k = keys(batch_df.select("image_id", "phash"), "new_id")
        all_k = keys(store, "id")
        cand = (
            all_k.join(F.broadcast(new_k), ["band_idx", "band_hash"])
            .where(F.col("id") != F.col("new_id"))
            .withColumn(
                "ham", F.bit_count(F.col("ph_id").bitwiseXOR(F.col("ph_new_id")))
            )
            .where(F.col("ham") <= self.cfg.phash_hamming)
            .select(
                F.least("id", "new_id").alias("a"),
                F.greatest("id", "new_id").alias("b"),
            )
            .dropDuplicates(["a", "b"])
        )
        return cand

    # -- stream wiring -----------------------------------------------------------
    def start(
        self,
        source_dir: str,
        schema,
        checkpoint_dir: str | None = None,
        max_files_per_trigger: int = 8,
        available_now: bool = True,
    ):
        """readStream over a directory of parquet drops → foreachBatch.
        With available_now=True the query drains everything currently in
        the source and stops (the test/backfill mode); otherwise it runs
        continuously."""
        reader = (
            self.spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(source_dir)
        )
        writer = reader.writeStream.foreachBatch(self.process_batch).option(
            "checkpointLocation", checkpoint_dir or self._p("_spark_checkpoint")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def assignments(self) -> DataFrame | None:
        return self._read("assignments")
