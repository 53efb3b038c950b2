"""Structured Streaming incremental crop-containment probing: "is this
new image a crop of anything we have ever seen — or does it contain
something we have seen?", answered per micro-batch against a persistent
tile-pHash store.

The batch operator (operators/imagecontainment.py) is an offset-vote
histogram over tile-pHash matches; like the dedup lanes, its state is
an order-insensitive monoid (a tile's band keys don't depend on when
the image arrived), so the streaming form is the batch form with a
persistent store:

  micro-batch of new images
    → tile pHashes on the hop lattice (same kernel, same config)
    → tile matches = new tiles' band keys ⋈ tile-key store of EVERYTHING
      seen (new×old and new×new in one join; old×old containments were
      emitted by the epoch that completed each pair)
    → 2D offset votes → argmax (earliest-offset tiebreak) → per-epoch
      containment hits appended to a results store
    → new tiles + tile counts fold into the stores

Wiring, idempotence, bucketing, and compaction are inherited verbatim
from the dedup stores (_BucketedStateStore): the tile-key store is
bucketed by pmod(xxhash64(band_idx, band_hash), B) so a probe reads
only touched buckets; every store write is an epoch-tagged overwrite
with the epoch manifest as the commit point, so replays are no-ops.

Coverage contract: a (clip, container) pair is evaluated in the epoch
that introduces the LATER of the two images, against the complete
store — the union of per-epoch hits over any run therefore equals the
batch operator's output on the union corpus (tested), modulo hot-cap
policy (the probe caps per-(new tile, band) fan-out deterministically
at ``max_fanout``, the streaming analog of the batch hot-band cap)."""

from __future__ import annotations

import time

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..operators.imagecontainment import tile_phashes
from ..operators.sigkernel import SigConfig
from .incremental import _BucketedStateStore


class IncrementalContainmentProbe(_BucketedStateStore):
    """foreachBatch-driven crop-containment probe with parquet state."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        cfg: SigConfig | None = None,
        tile: int = 32,
        hop: int | None = None,
        min_match_frac: float = 0.8,
        min_aligned_tiles: int = 2,
        max_fanout: int = 64,
        num_buckets: int = 64,
    ):
        super().__init__(spark, state_dir, num_buckets)
        self.cfg = cfg or SigConfig()
        # tile/hop shape the key store's contents — constant per state_dir
        self.tile = tile
        self.hop = tile // 2 if hop is None else hop
        self.min_match_frac = min_match_frac
        self.min_aligned_tiles = min_aligned_tiles
        self.max_fanout = max_fanout
        self._assert_config({
            "cfg": self.cfg.fingerprint(),
            "tile": self.tile,
            "hop": self.hop,
            "min_match_frac": min_match_frac,
            "min_aligned_tiles": min_aligned_tiles,
            "max_fanout": max_fanout,
            "num_buckets": num_buckets,
        })

    # -- the foreachBatch callback --------------------------------------------
    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        if self._epoch_done(epoch_id):
            return  # replay after restart: already folded into the stores
        t0 = time.time()
        from ..operators.imagededup import phash_combo_keys_expr

        tiles = tile_phashes(
            batch_df, tile=self.tile, hop=self.hop
        ).localCheckpoint(eager=True)
        n_tiles = tiles.count()
        if n_tiles == 0:
            self._mark_epoch(epoch_id, {"rows": 0})
            return
        counts_new = tiles.groupBy(
            F.col("image_id").alias("id")
        ).agg(F.count(F.lit(1)).alias("n_tiles"))

        keys_new = tiles.select(
            F.col("image_id").alias("new_id"),
            F.col("tx").alias("new_tx"),
            F.col("ty").alias("new_ty"),
            F.col("phash").alias("new_ph"),
            F.posexplode(phash_combo_keys_expr("phash", self.cfg)).alias(
                "band_idx", "band_hash"
            ),
        )
        # fold the new keys into the store FIRST (epoch-overwrite =
        # replay-idempotent), then probe store∪new via the bucketed read
        self._write_epoch_bucketed(
            "tile_keys",
            keys_new.select(
                F.col("new_id").alias("id"), F.col("new_tx").alias("tx"),
                F.col("new_ty").alias("ty"), F.col("new_ph").alias("ph"),
                "band_idx", "band_hash",
            ),
            epoch_id,
            ["band_idx", "band_hash"],
        )
        self._write_epoch("tile_counts", counts_new, epoch_id)

        probe_buckets = self._touched_buckets(
            keys_new, "band_idx", "band_hash"
        )
        all_k = self._read_bucketed("tile_keys", probe_buckets)
        matched = (
            all_k.join(F.broadcast(keys_new), ["band_idx", "band_hash"])
            .where(F.col("id") != F.col("new_id"))
            .withColumn(
                "ham", F.bit_count(F.col("ph").bitwiseXOR(F.col("new_ph")))
            )
            .where(F.col("ham") <= self.cfg.phash_hamming)
        )
        wnd = Window.partitionBy(
            "new_id", "new_tx", "new_ty", "band_idx"
        ).orderBy("id", "tx", "ty")
        matched = (
            matched.withColumn("_rn", F.row_number().over(wnd))
            .where(F.col("_rn") <= self.max_fanout)
            .select("id", "tx", "ty", "new_id", "new_tx", "new_ty")
            .dropDuplicates(["id", "tx", "ty", "new_id", "new_tx", "new_ty"])
        )
        # both orientations: the new image may be the crop OR the container
        oriented = matched.select(
            F.col("new_id").alias("clip_id"),
            F.col("id").alias("container_id"),
            (F.col("tx") - F.col("new_tx")).alias("dx"),
            (F.col("ty") - F.col("new_ty")).alias("dy"),
            F.concat_ws(",", "new_tx", "new_ty").alias("clip_tile"),
        ).unionByName(
            matched.select(
                F.col("id").alias("clip_id"),
                F.col("new_id").alias("container_id"),
                (F.col("new_tx") - F.col("tx")).alias("dx"),
                (F.col("new_ty") - F.col("ty")).alias("dy"),
                F.concat_ws(",", "tx", "ty").alias("clip_tile"),
            )
        )
        votes = oriented.groupBy("clip_id", "container_id", "dx", "dy").agg(
            F.countDistinct("clip_tile").alias("aligned")
        )
        best = (
            votes.groupBy("clip_id", "container_id")
            .agg(
                F.max(
                    F.struct(
                        F.col("aligned"),
                        (-F.col("dx")).alias("ndx"),
                        (-F.col("dy")).alias("ndy"),
                    )
                ).alias("best")
            )
            .select(
                "clip_id",
                "container_id",
                F.col("best.aligned").alias("aligned_tiles"),
                (-F.col("best.ndx")).alias("dx_tiles"),
                (-F.col("best.ndy")).alias("dy_tiles"),
            )
        )
        counts_all = self._read("tile_counts")
        hits = (
            best.join(
                counts_all.select(
                    F.col("id").alias("clip_id"),
                    F.col("n_tiles").alias("clip_tiles"),
                ),
                "clip_id",
            )
            .join(
                counts_all.select(
                    F.col("id").alias("container_id"),
                    F.col("n_tiles").alias("container_tiles"),
                ),
                "container_id",
            )
            .withColumn(
                "match_frac", F.col("aligned_tiles") / F.col("clip_tiles")
            )
            .where(
                (F.col("aligned_tiles") >= self.min_aligned_tiles)
                & (F.col("match_frac") >= self.min_match_frac)
                & (F.col("container_tiles") >= F.col("clip_tiles"))
            )
            .select(
                "clip_id", "container_id", "aligned_tiles", "clip_tiles",
                "match_frac", "dx_tiles", "dy_tiles",
            )
        )
        self._write_epoch("hits", hits, epoch_id)
        self._mark_epoch(
            epoch_id,
            {"rows": int(n_tiles), "wall_sec": round(time.time() - t0, 3)},
        )

    # -- stream wiring ----------------------------------------------------------
    def start(
        self,
        source_dir: str,
        schema,
        checkpoint_dir: str | None = None,
        max_files_per_trigger: int = 8,
        available_now: bool = True,
    ):
        """readStream over a directory of parquet drops → foreachBatch
        (same contract as IncrementalDeduper.start)."""
        reader = (
            self.spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(source_dir)
        )
        ckpt = checkpoint_dir or self._p("_spark_checkpoint")
        self._assert_checkpoint_live(ckpt)
        writer = reader.writeStream.foreachBatch(self.process_batch).option(
            "checkpointLocation", ckpt
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def hits(self) -> DataFrame | None:
        """Union of every COMMITTED epoch's containment hits — an
        uncommitted slot left by a crash before the epoch marker is
        excluded (its replay will rewrite it)."""
        return self._read_committed("hits")
