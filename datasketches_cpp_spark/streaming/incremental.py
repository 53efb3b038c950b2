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
    → INCREMENTAL connected components: contract the new edges to their
      current clusters, run CC on that contracted graph only (size =
      touched clusters + new ids), and rewrite just the merged clusters'
      members in a bucketed cluster store — O(frontier) per epoch, never
      O(corpus); equal to batch assign_clusters over the accumulated
      edge set at every epoch (pinned by checksum in tests)

Wiring is ``readStream → foreachBatch(IncrementalDeduper.process_batch)``
with a Spark checkpointLocation: exactly-once per micro-batch, and the
signature/edge stores make the *semantic* state resumable — kill the query
anywhere, restart, and unprocessed files replay into the same stores
(idempotent per batch via epoch manifest, mirroring plans/checkpoint.py).

Deliberate scope: the caption/bytes/phash lanes stream; the exact-substring
lane is batch-only (its inverted index wants a corpus-wide build — run it
as a periodic compaction job over the same stores).

Scale notes: the per-batch join is |new bands| ⋈ band index — broadcast the
new side (micro-batches are small by construction). Both persistent stores
are BUCKETED: the band index by pmod(xxhash64(band_idx, band_hash), B) and
the signature store by pmod(xxhash64(id), B), written as
``partitionBy("bucket")`` parquet. A probe first computes the (≤ B)
distinct buckets its keys can live in, then reads ONLY those partitions —
Spark partition pruning turns the per-epoch probe from a full store scan
into |touched buckets|/B of the store, the property that keeps 10^12-row
stores joinable per micro-batch (plan-asserted in
tests/test_streaming.py). Epoch writes land per-epoch directories of
bucket partitions; ``compact_store`` folds committed epochs' partitions
into one directory under a manifest commit point so file count stays
O(B), not O(B × epochs). Per-new-row fan-out in degenerate bands is
capped deterministically (``max_fanout``), the streaming analog of the
batch hot-band cap.
"""

from __future__ import annotations

import json
import time

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.cc import connected_components
from ..operators.minhash import compute_signatures
from ..operators.sigkernel import SigConfig
from ..operators.verify import verify_pairs
from ..plans.fsio import HadoopFS


class StreamConfigMismatch(RuntimeError):
    """A state_dir was reopened with a different operator configuration —
    the streaming analog of plans/checkpoint.CheckpointConfigMismatch.
    Signature/band/key stores are only meaningful under the EXACT config
    that wrote them (seeds, banding, invariance flags, exact/embedding
    tiers, fusion policy); silently continuing would mix incompatible
    state into one edge pool. Start a fresh state_dir or restore the
    original config."""


class _BucketedStateStore:
    """Shared persistence machinery for foreachBatch-driven incremental
    operators: a state_dir of parquet stores (optionally bucketed by a
    key hash for partition-pruned probes), per-epoch overwrite-idempotent
    writes with an atomic epoch manifest as the commit point, and a
    manifest-gated compaction that keeps file counts O(num_buckets).
    All bookkeeping routes through the Hadoop FileSystem facade, so
    state_dir may be any URI with a registered FileSystem (same contract
    as plans/checkpoint.py)."""

    def __init__(self, spark: SparkSession, state_dir: str, num_buckets: int):
        self.spark = spark
        self.state_dir = state_dir
        self.num_buckets = num_buckets
        self._hfs = HadoopFS(spark, state_dir)
        self._hfs.mkdirs(state_dir)
        # write-once dir sizes for the tiered-fold doubling rule
        self._size_cache: dict[str, int] = {}

    def close(self) -> None:
        """Release the private Hadoop FileSystem (connections/thread pools
        on remote stores). The store is unusable afterwards."""
        self._hfs.close()

    def __enter__(self) -> "_BucketedStateStore":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # -- state paths ---------------------------------------------------------
    def _p(self, name: str) -> str:
        return HadoopFS.join(self.state_dir, name)

    def _assert_config(self, fp: dict) -> None:
        """Config-constancy fail-fast: subclasses call this at the end of
        __init__ with every semantic knob that shapes store contents.
        First open stamps <state_dir>/_CONFIG.json (atomic); any later
        open with a different payload raises StreamConfigMismatch naming
        both — the documented must-stay-constant contract, enforced."""
        p = self._p("_CONFIG.json")
        payload = json.dumps(fp, sort_keys=True, default=str)
        if self._hfs.exists(p):
            prior = self._hfs.read_bytes(p).decode()
            if prior != payload:
                raise StreamConfigMismatch(
                    f"state_dir {self.state_dir} was written under a "
                    f"different config.\n  stored: {prior}\n  given:  "
                    f"{payload}"
                )
        else:
            self._hfs.write_bytes_atomic(p, payload.encode())

    def _exists(self, name: str) -> bool:
        return self._hfs.has_file_with_suffix(self._p(name), ".parquet")

    def _assert_checkpoint_live(self, ckpt: str) -> None:
        """Fail-fast on a RESET Spark checkpoint over live state: epoch
        idempotency keys on Spark's batch id, so a fresh/wiped
        checkpointLocation restarts ids at 0 and every redelivered batch
        would match an old epoch in epochs.json and be silently SKIPPED —
        new data lost with no error."""
        epochs_p = self._p("epochs.json")
        if not (self._hfs.exists(epochs_p) and json.loads(
            self._hfs.read_bytes(epochs_p).decode()
        )["done"]):
            return
        if not (self._hfs.exists(HadoopFS.join(ckpt, "offsets"))
                or self._hfs.exists(HadoopFS.join(ckpt, "metadata"))):
            raise StreamConfigMismatch(
                f"state_dir {self.state_dir} holds committed epochs but "
                f"the Spark checkpoint {ckpt} is empty/new — batch ids "
                "would restart at 0 and collide with done epochs, "
                "silently skipping new data. Restore the original "
                "checkpointLocation or start a fresh state_dir."
            )

    def _read(self, name: str) -> DataFrame | None:
        if not self._exists(name):
            return None
        return (
            self.spark.read.option("recursiveFileLookup", "true")
            .parquet(self._p(name))
        )

    def _read_committed(self, name: str) -> DataFrame | None:
        """Plain epoch-store read restricted to COMMITTED epochs — the
        public-surface variant of _read. A crash between a store write
        and _mark_epoch leaves an uncommitted (possibly partial) slot
        that the replay will rewrite; external readers must not observe
        it. Internal probes keep using _read/_read_bucketed, where the
        current epoch's own slot is part of the store∪new contract."""
        if not self._exists(name):
            return None
        out = None
        # _committed_epoch_dirs is manifest-aware (_LIVE.json): after a
        # compaction crash between the swap and the superseded-dir
        # delete, a raw directory listing would read folded rows TWICE
        for full in self._committed_epoch_dirs(name):
            if not self._hfs.has_file_with_suffix(full, ".parquet"):
                continue
            df = self.spark.read.option(
                "recursiveFileLookup", "true"
            ).parquet(full)
            out = df if out is None else out.unionByName(df)
        return out

    # -- bucketed stores ------------------------------------------------------
    # Layout: <store>/epoch_XXXX/bucket=Y/*.parquet plus an optional
    # <store>/_LIVE.json manifest written by compact_store. Each epoch dir is
    # a self-contained partitioned dataset, so partition pruning applies to
    # every probe; the manifest is the compaction commit point.
    def _bucket_expr(self, *cols):
        return F.pmod(F.xxhash64(*cols), F.lit(self.num_buckets)).cast("int")

    def _live_epoch_dirs(self, name: str) -> list[str]:
        """Visibility rule (the compaction commit protocol's read side):
        epoch_* dirs are live unless named in the manifest's `superseded`
        list; compacted_* dirs are live ONLY if named in the manifest's
        `live` list. A compacted_* dir exists on disk but not in any
        manifest exactly when a crash landed between the fold write and
        the atomic manifest swap — treating it as live (the old rule:
        "anything not superseded") would read the folded rows TWICE next
        to their still-live source epoch dirs, or crash every probe on a
        half-written parquet directory. Such orphans are invisible here
        and garbage-collected by the next compact_store."""
        root = self._p(name)
        on_disk = [d for d in self._hfs.list_dirs(root)
                   if d.startswith("epoch_") or d.startswith("compacted_")]
        if not on_disk:
            return []
        manifest = HadoopFS.join(root, "_LIVE.json")
        live_gens: set = set()
        superseded: set = set()
        if self._hfs.exists(manifest):
            m = json.loads(self._hfs.read_bytes(manifest).decode())
            superseded = set(m.get("superseded", []))
            live_gens = set(m.get("live", []))
        out = []
        for d in on_disk:
            if d.startswith("compacted_"):
                if d in live_gens:
                    out.append(d)
            elif d not in superseded:
                out.append(d)
        return [HadoopFS.join(root, d) for d in out]

    def _committed_epoch_dirs(self, name: str) -> list[str]:
        """Live epoch directories that are safe to COMPACT: compacted_*
        outputs plus epoch_* slots whose epoch is marked done in
        epochs.json. A crash between a store write and _mark_epoch leaves
        an uncommitted epoch_* dir on disk; folding it into compacted_*
        would launder that mid-flight data into PRIOR state (replays
        exclude their own epoch by directory name — exclude_epoch — which
        can no longer see it once folded), silently double-seeding the
        stores. Uncommitted dirs stay live untouched: the replay
        overwrites them in place."""
        done: set[int] = set()
        p = self._p("epochs.json")
        if self._hfs.exists(p):
            done = {
                int(k)
                for k in json.loads(self._hfs.read_bytes(p).decode())["done"]
            }
        out = []
        for d in self._live_epoch_dirs(name):
            base = d.rstrip("/").rsplit("/", 1)[-1]
            if not base.startswith("epoch_") or int(base[len("epoch_"):]) in done:
                out.append(d)
        return out

    def _write_epoch_bucketed(self, name: str, df: DataFrame, epoch_id: int,
                              key_cols: list[str]) -> None:
        # repartition on bucket before the write: one file per bucket per
        # epoch instead of one per (task × bucket) — the 500k profile
        # measured ~2.8k files per epoch per store without it (44 write
        # tasks × 64 buckets), which every bucket-pruned probe pays in
        # listings and every fold pays in opens. The narrow extra shuffle
        # is per-epoch signature data (MBs), dwarfed by the lane joins.
        (df.withColumn("bucket", self._bucket_expr(*key_cols))
           .repartition(self.num_buckets, "bucket")
           .write.mode("overwrite").partitionBy("bucket")
           .parquet(self._p(f"{name}/epoch_{epoch_id:012d}")))

    def _read_bucketed(self, name: str, buckets: list[int] | None = None,
                       exclude_epoch: int | None = None,
                       dirs: list[str] | None = None) -> DataFrame | None:
        """Union of the store's live epoch directories; with ``buckets``
        given, each read carries a partition filter — Spark prunes to the
        matching bucket=Y directories and never lists the rest.
        ``exclude_epoch`` drops that epoch's own slot from the read — for
        probes that must see only PRIOR state even on an at-least-once
        replay that already wrote this epoch's slot (safe because
        compaction folds only COMMITTED epochs — _committed_epoch_dirs —
        so a mid-flight slot is always still excludable by name).
        ``dirs`` overrides the directory list (compaction passes the
        committed subset)."""
        if dirs is None:
            dirs = self._live_epoch_dirs(name)
        if exclude_epoch is not None:
            tag = f"epoch_{exclude_epoch:012d}"
            dirs = [d for d in dirs if not d.rstrip("/").endswith(tag)]
        out = None
        for d in dirs:
            if not self._hfs.has_file_with_suffix(d, ".parquet"):
                continue  # empty epoch slot (e.g. an all-duplicate batch)
            df = self.spark.read.parquet(d)
            if buckets is not None:
                df = df.where(F.col("bucket").isin([int(b) for b in buckets]))
            out = df if out is None else out.unionByName(df)
        return out

    def _touched_buckets(self, df: DataFrame, *cols) -> list[int]:
        """Distinct bucket ids a probe's keys can live in — bounded by
        num_buckets, so the collect is a scalar-sized driver hop."""
        rows = (df.select(self._bucket_expr(*cols).alias("bucket"))
                  .distinct().collect())
        return sorted(int(r["bucket"]) for r in rows)

    def _touched_buckets_pair(self, df: DataFrame, col_a: str,
                              col_b: str) -> list[int]:
        """Buckets touched by EITHER endpoint column, in ONE Spark job —
        two separate _touched_buckets calls would scan the (checkpointed)
        pair frame twice and pay two driver collects per lane per epoch."""
        rows = (
            df.select(
                F.explode(
                    F.array(
                        self._bucket_expr(col_a), self._bucket_expr(col_b)
                    )
                ).alias("bucket")
            )
            .distinct()
            .collect()
        )
        return sorted(int(r["bucket"]) for r in rows)

    def _tree_size(self, path: str) -> int:
        """Recursive byte size of a store directory (bucket=Y children +
        files) — the input to the tiered-fold doubling rule. epoch_*/
        compacted_* directories are write-once after commit, so sizes are
        memoized per path (ADVICE r5: the fold re-listed every live
        generation each cadence)."""
        cached = self._size_cache.get(path)
        if cached is not None:
            return cached
        total = sum(sz for _n, sz in self._hfs.list_files(path))
        for d in self._hfs.list_dirs(path):
            total += self._tree_size(HadoopFS.join(path, d))
        self._size_cache[path] = total
        return total

    def compact_store(self, name: str) -> int:
        """Fold COMMITTED epoch directories of a bucketed store into a
        compacted GENERATION (one file per bucket). Only epochs marked
        done in epochs.json fold — an uncommitted epoch_* slot left by a
        crash before _mark_epoch stays live untouched, so the redelivered
        epoch's exclude_epoch probe can still see past it (folding it
        would launder mid-flight data into prior state).

        Tiered, not monolithic: a routine fold touches only the NEW epoch
        deltas (cost O(data since last fold)); live generations merge
        only under the doubling rule — when the younger generations plus
        the incoming deltas together outweigh the oldest generation —
        so total fold I/O over a stream's lifetime is O(N log N), never
        the O(N²/cadence) of rewriting the whole store every fold. Live
        directory count stays O(log) (in practice ≤3), so probe listings
        stay O(files-per-bucket × generations).

        Commit protocol: write the merged directory, atomically swap the
        _LIVE manifest (live = surviving generations + the new one), then
        delete the superseded directories. A crash BEFORE the swap leaves
        the half-written dir invisible (_live_epoch_dirs admits compacted
        dirs only via the manifest's `live` list) and it is deleted here
        as an orphan on the next fold; a crash AFTER the swap leaves
        already-excluded superseded dirs for the same cleanup. Returns
        the number of directories folded."""
        committed = self._committed_epoch_dirs(name)
        epoch_dirs = [d for d in committed
                      if d.rstrip("/").rsplit("/", 1)[-1].startswith("epoch_")]
        gen_dirs = sorted(
            d for d in committed
            if d.rstrip("/").rsplit("/", 1)[-1].startswith("compacted_")
        )  # tag = creation ms ⇒ lexicographic = chronological
        manifest = self._p(f"{name}/_LIVE.json")
        prior_live: set = set()
        prior_superseded: set = set()
        if self._hfs.exists(manifest):
            m = json.loads(self._hfs.read_bytes(manifest).decode())
            prior_live = set(m.get("live", []))
            prior_superseded = set(m.get("superseded", []))
        # garbage-collect orphans: compacted_* on disk referenced by no
        # manifest list — a fold that crashed before its swap
        for d in self._hfs.list_dirs(self._p(name)):
            if (d.startswith("compacted_") and d not in prior_live
                    and d not in prior_superseded):
                try:
                    self._hfs.delete(self._p(f"{name}/{d}"), recursive=True)
                except Exception:
                    pass

        if not epoch_dirs:
            return 0  # no new deltas — nothing to fold
        # per-tier doubling rule (ADVICE r5: with only the two actions
        # "new generation" / "merge everything", young generations were
        # never merged among themselves, so live dirs grew by one per
        # cadence until the full-merge trigger — ~N/delta dirs worst
        # case). Walking young→old, a generation joins the fold whenever
        # the mass folding in front of it already outweighs it; the fold
        # that would have been "everything" under the old rule still is
        # (the cumulative mass passes each older tier in turn), and live
        # generation sizes stay geometric, so the count is O(log) by
        # construction, not by cadence luck.
        fold_mass = sum(self._tree_size(d) for d in epoch_dirs)
        folded_gens: list[str] = []
        for g in reversed(gen_dirs):  # youngest generation first
            g_sz = self._tree_size(g)
            if fold_mass >= g_sz:
                folded_gens.append(g)
                fold_mass += g_sz
            else:
                break
        full_merge = bool(gen_dirs) and len(folded_gens) == len(gen_dirs)
        to_fold = epoch_dirs + folded_gens
        if len(to_fold) <= 1 and not full_merge:
            return 0  # a single delta dir is already one file per bucket
        df = self._read_bucketed(name, dirs=to_fold)
        if df is None:
            return 0  # every live slot is empty — nothing to fold
        tag = f"compacted_{int(time.time() * 1000):013d}"
        target = self._p(f"{name}/{tag}")
        # repartition ON the bucket column before the fold write: without
        # it every read task writes one file per bucket it holds, so the
        # "compacted" dir fans out to O(read_partitions × num_buckets)
        # files — the 500k profile measured 24k files in one fold output.
        # Hashing each bucket to one task makes the output exactly one
        # file per bucket: the O(num_buckets) contract this store promises.
        (df.repartition(self.num_buckets, "bucket")
           .write.mode("overwrite").partitionBy("bucket").parquet(target))
        folded_names = {d.rstrip("/").rsplit("/", 1)[-1] for d in to_fold}
        live = [
            d.rstrip("/").rsplit("/", 1)[-1]
            for d in gen_dirs
            if d not in folded_gens
        ] + [tag]
        self._hfs.write_bytes_atomic(
            manifest,
            json.dumps({
                "live": sorted(live),
                "superseded": sorted(folded_names | prior_superseded),
            }).encode(),
        )
        for d in to_fold:
            try:
                self._hfs.delete(d, recursive=True)
            except Exception:
                pass  # orphan stays excluded via the manifest
            # evict folded paths (and their subtrees) so the size cache
            # stays O(live dirs) over a long stream
            self._size_cache = {
                k: v for k, v in self._size_cache.items()
                if not k.startswith(d)
            }
        return len(to_fold)

    def compact_all(self) -> dict[str, int]:
        """Run compact_store over every bucketed store under state_dir
        (any directory holding epoch_*/compacted_* children) — the
        maintenance entrypoint a scheduler calls between micro-batches so
        callers never enumerate lane-dependent store names. Same safety
        contract as compact_store: must not interleave with
        process_batch. Returns {store: directories folded}."""
        out = {}
        for d in self._hfs.list_dirs(self.state_dir):
            store = HadoopFS.join(self.state_dir, d)
            children = self._hfs.list_dirs(store)
            slots = [c for c in children
                     if c.startswith(("epoch_", "compacted_"))]
            if not slots:
                continue
            # only BUCKETED stores compact (epoch slots partitioned by
            # bucket=); plain epoch stores (ids/edges) are append-logs
            # whose per-epoch identity the CC publish step relies on
            if not any(
                c.startswith("bucket=")
                for s in slots
                for c in self._hfs.list_dirs(HadoopFS.join(store, s))
            ):
                continue  # plain epoch store, or every slot empty
            out[d] = self.compact_store(d)
        return out

    # -- epoch-atomic store writes --------------------------------------------
    # foreachBatch is at-least-once: a crash AFTER a store write but BEFORE
    # _mark_epoch replays the whole epoch. Appending on replay would
    # double-count signatures/ids/edges, silently inflating assignments.
    # Every store write therefore lands in an epoch-tagged subdirectory with
    # overwrite semantics: replaying epoch e rewrites exactly epoch e's
    # data, and _mark_epoch (atomic rename) is the commit point.
    def _write_epoch(self, name: str, df: DataFrame, epoch_id: int) -> None:
        df.write.mode("overwrite").parquet(
            self._p(f"{name}/epoch_{epoch_id:012d}")
        )

    def _epoch_done(self, epoch_id: int) -> bool:
        p = self._p("epochs.json")
        if not self._hfs.exists(p):
            return False
        return str(epoch_id) in json.loads(self._hfs.read_bytes(p).decode())["done"]

    def _mark_epoch(self, epoch_id: int, meta: dict) -> None:
        p = self._p("epochs.json")
        state = {"done": {}}
        if self._hfs.exists(p):
            state = json.loads(self._hfs.read_bytes(p).decode())
        state["done"][str(epoch_id)] = meta
        self._hfs.write_bytes_atomic(p, json.dumps(state).encode())


class IncrementalDeduper(_BucketedStateStore):
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
        num_buckets: int = 64,
        rotation_invariant: bool = False,
        crop_invariant: bool = False,
        exact_on: tuple | None = None,
        embedding_col: str = "embedding",
        embedding_dim: int | None = None,
        cosine_threshold: float = 0.9,
        emb_tables: int = 16,
        emb_bits: int = 10,
        emb_seed: int = 9001,
        edge_policy: str | int = "any",
        video_every_k: int = 4,
        video_min_frames: int = 2,
        audio_window: int = 1024,
        audio_peaks: int = 3,
        audio_fan_dt: int = 3,
        audio_min_shared: int = 8,
        audio_max_ids_per_landmark: int = 64,
        compact_every: int = 0,
    ):
        super().__init__(spark, state_dir, num_buckets)
        self.cfg = cfg or SigConfig()
        self.bytes_cfg = bytes_cfg or SigConfig(
            seed=self.cfg.seed, shingle_w=16, num_perm=self.cfg.num_perm,
            kmv_k=self.cfg.kmv_k, bands=self.cfg.bands, jaccard_threshold=0.9,
        )
        self.byte_stride = byte_stride
        self.max_fanout = max_fanout
        self.enable_lanes = enable_lanes
        # streaming twins of the batch lane's invariance flags; like cfg,
        # they shape the phash_keys store contents, so they must stay
        # constant for the lifetime of a state_dir
        self.rotation_invariant = rotation_invariant
        self.crop_invariant = crop_invariant
        # streaming twin of the batch tiered cascade (operators/tiered.py):
        # when set (e.g. ("bytes", "caption")), a persistent exact-key
        # store gates the expensive lanes — only rows whose content key is
        # NOVEL across the whole stream's history enter the band/signature
        # stores, so state growth tracks novel content, not stream volume.
        # Same lossless-collapse law as batch; same constancy contract as
        # the invariance flags.
        self.exact_on = exact_on
        # streaming SemDeDup lane ("embedding" in enable_lanes): rows must
        # carry ``embedding_col`` (array<float>, content-derived so the
        # exact tier's collapse stays lossless) and ``embedding_dim`` must
        # be set. Hyperplane seed/tables/bits shape the band store — same
        # lifetime-constancy contract as cfg.
        if "embedding" in enable_lanes and embedding_dim is None:
            raise ValueError(
                "the embedding lane needs embedding_dim (hyperplane shape)"
            )
        self.embedding_col = embedding_col
        self.embedding_dim = embedding_dim
        self.cosine_threshold = cosine_threshold
        self.emb_tables = emb_tables
        self.emb_bits = emb_bits
        self.emb_seed = emb_seed
        # streaming twin of dedup_images(edge_policy=...): "any" (OR),
        # "all" (AND over enabled lanes) or k (k-of-n). Correct per epoch
        # because every lane evaluates a candidate pair exactly once — in
        # the arrival epoch of its LATER member (each lane probes all
        # stored state there; old×old pairs never re-form) — so fusing
        # within the epoch sees every lane's verdict, identical to batch
        # fusion over the whole corpus. Exact-tier edges bypass fusion
        # (identity evidence, not lane similarity), as in the cascade.
        self.edge_policy = edge_policy
        # streaming twins of dedup_videos / dedup_audio ("video"/"audio"
        # in enable_lanes): rows carry container payloads in `bytes` with
        # `fmt` naming the codec. The knobs shape the frame-key and
        # landmark stores — same lifetime-constancy contract as cfg.
        self.video_every_k = video_every_k
        self.video_min_frames = video_min_frames
        self.audio_window = audio_window
        self.audio_peaks = audio_peaks
        self.audio_fan_dt = audio_fan_dt
        self.audio_min_shared = audio_min_shared
        self.audio_max_ids_per_landmark = audio_max_ids_per_landmark
        # maintenance cadence: after every k-th COMMITTED epoch, fold the
        # bucketed stores' epoch directories (compact_all) so file counts
        # stay O(num_buckets) instead of O(num_buckets × epochs) — the
        # 500k-image profile showed per-epoch wall creeping 74→210 s from
        # listing 30k+ files/store without it (BENCH/stream_profile_r5.md).
        # Deliberately NOT in _assert_config: cadence is operational, never
        # semantic — any value may resume any state_dir and the assignments
        # checksum is invariant to it (pinned in tests).
        self.compact_every = int(compact_every)
        self._assert_config({
            # format 2 = incremental cluster maintenance (clusters_by_id/
            # clusters_by_cluster stores instead of a per-epoch full
            # assignments publish); a format-1 state_dir resumed under
            # this code would silently mis-cluster, so it fails fast here
            "state_format": 2,
            "cfg": self.cfg.fingerprint(),
            "bytes_cfg": self.bytes_cfg.fingerprint(),
            "byte_stride": byte_stride,
            "max_fanout": max_fanout,
            "enable_lanes": sorted(enable_lanes),
            "num_buckets": num_buckets,
            "rotation_invariant": rotation_invariant,
            "crop_invariant": crop_invariant,
            "exact_on": list(exact_on) if exact_on else None,
            "embedding_col": embedding_col,
            "embedding_dim": embedding_dim,
            "cosine_threshold": cosine_threshold,
            "emb_tables": emb_tables,
            "emb_bits": emb_bits,
            "emb_seed": emb_seed,
            "edge_policy": edge_policy,
            "video": [video_every_k, video_min_frames],
            "audio": [audio_window, audio_peaks, audio_fan_dt,
                      audio_min_shared, audio_max_ids_per_landmark],
        })

    # -- lane helpers ----------------------------------------------------------
    def _empty_edges(self) -> DataFrame:
        return self.spark.createDataFrame([], "a string, b string")

    def _lane_pairs(
        self,
        sig_new: DataFrame,
        store_name: str,
        cfg: SigConfig,
        use_simhash: bool,
        epoch_id: int,
    ) -> DataFrame:
        """Write new sigs (bucketed by id) and their exploded bands
        (bucketed by band key) into the lane stores' epoch slots
        (idempotent on replay), probe the band index with partition
        pruning, verify against a bucket-pruned signature lookup.
        Returns passed (a, b) edges."""

        def bands_of(df: DataFrame) -> DataFrame:
            return df.where(F.col("n_shingles") > 0).select(
                "id", F.posexplode("bands").alias("band_idx", "band_hash")
            )

        # four consumers (two store writes, touched-bucket collect,
        # broadcast probe join) — without the checkpoint the upstream
        # minhash/shingle mapInPandas kernel would run once per consumer
        sig_new = sig_new.localCheckpoint(eager=True)
        # the persistent signature store keeps only what verification
        # reads (id, kmv_theta, kmv_sig, simhash): mh_sig (num_perm
        # longs) and the bands array have no store-side consumer — band
        # keys live exploded in the *_bands store — and would roughly
        # double PERMANENT state size (the batch pipeline drops mh_sig
        # before checkpointing for the same reason)
        self._write_epoch_bucketed(
            store_name,
            sig_new.select("id", "kmv_theta", "kmv_sig", "simhash"),
            epoch_id, ["id"],
        )
        self._write_epoch_bucketed(
            store_name + "_bands", bands_of(sig_new), epoch_id,
            ["band_idx", "band_hash"],
        )
        new_b = bands_of(sig_new).select(
            F.col("id").alias("new_id"), "band_idx", "band_hash"
        )
        probe_buckets = self._touched_buckets(new_b, "band_idx", "band_hash")
        all_b = self._read_bucketed(store_name + "_bands", probe_buckets)
        if all_b is None:  # every live slot empty (e.g. all-degenerate batch)
            return self._empty_edges()
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
        cand = cand.localCheckpoint(eager=True)  # reused for bucket calc + verify
        id_buckets = sorted(
            self._touched_buckets_pair(cand, "a", "b")
        )
        sig_lookup = self._read_bucketed(store_name, id_buckets)
        if sig_lookup is None:  # no stored signatures -> nothing verifies
            return self._empty_edges()
        sig_lookup = sig_lookup.drop("bucket")
        return verify_pairs(cand, sig_lookup, cfg, use_simhash=use_simhash, include_mh=False).where(
            "passed"
        ).select("a", "b")

    def _exact_tier(self, batch_df: DataFrame, epoch_id: int
                    ) -> tuple[DataFrame, DataFrame]:
        """Streaming exact tier: collapse within-batch content twins
        (window min over the 128-bit key — ids and keys only, payloads
        never shuffle), probe the persistent exact-key store with
        partition pruning for keys seen in PRIOR epochs, append edges
        for both, and return (survivors, exact_edges) where survivors
        are the rows whose key is novel stream-wide — the only rows the
        band/signature lanes ever see or store."""
        from pyspark.sql import Window

        from ..operators.tiered import _exact_key

        keyed = batch_df.select(
            "image_id", _exact_key(batch_df, self.exact_on).alias("tkey")
        )
        wnd = Window.partitionBy("tkey")
        a1 = keyed.select(
            "image_id", "tkey", F.min("image_id").over(wnd).alias("rep")
        ).localCheckpoint(eager=True)  # ids+keys only; three consumers
        bk = a1.where(F.col("image_id") == F.col("rep")).select("tkey", "rep")
        probe_buckets = self._touched_buckets(bk, "tkey")
        store = self._read_bucketed(
            "exact_keys", probe_buckets, exclude_epoch=epoch_id
        )
        if store is None:
            hits = self.spark.createDataFrame(
                [], "tkey string, rep string, store_rep string"
            )
        else:
            # the store is the BIG side (grows with stream history): keep it
            # streamed through two broadcast-hash joins against batch-sized
            # builds — the batch keys here, the hit set below — so no probe
            # ever shuffles or broadcasts stream-lifetime state
            hits = (
                store.select("tkey", F.col("rep").alias("store_rep"))
                .join(F.broadcast(bk), "tkey")
                .groupBy("tkey", "rep")
                .agg(F.min("store_rep").alias("store_rep"))
            )
        hits = hits.localCheckpoint(eager=True)  # novel-anti + edges
        novel = bk.join(
            F.broadcast(hits.select("tkey")), "tkey", "left_anti"
        ).localCheckpoint(eager=True)  # store write + survivor filter
        self._write_epoch_bucketed("exact_keys", novel, epoch_id, ["tkey"])
        within = a1.where(F.col("image_id") != F.col("rep")).select(
            F.least("image_id", "rep").alias("a"),
            F.greatest("image_id", "rep").alias("b"),
        )
        across = hits.where(F.col("rep") != F.col("store_rep")).select(
            F.least("rep", "store_rep").alias("a"),
            F.greatest("rep", "store_rep").alias("b"),
        )
        survivors = batch_df.join(
            F.broadcast(novel.select(F.col("rep").alias("image_id"))),
            "image_id", "left_semi",
        )
        return survivors, within.union(across)

    # -- the foreachBatch callback -----------------------------------------------
    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        if self._epoch_done(epoch_id):
            return  # replay after restart: already folded into the stores
        t0 = time.time()
        batch_df = batch_df.localCheckpoint(eager=True)  # one scan of the source
        n = batch_df.count()
        if n == 0:
            self._mark_epoch(epoch_id, {"rows": 0})
            self._maybe_compact(epoch_id, {"rows": 0})
            return
        lane_parts: list[tuple[str, DataFrame]] = []
        exact_edges = None
        all_rows = batch_df
        meta: dict = {"rows": n}
        if self.exact_on:
            batch_df, exact_edges = self._exact_tier(batch_df, epoch_id)
            # the lanes see survivors only; the exact edges join the pool
            batch_df = batch_df.localCheckpoint(eager=True)
            # counter metrics on the (checkpointed) survivor frame: how
            # much of this epoch was novel vs already-seen content
            meta["novel_rows"] = batch_df.count()
            meta["exact_collapsed"] = n - meta["novel_rows"]

        if "caption" in self.enable_lanes:
            sig = compute_signatures(
                batch_df, "image_id", "caption", self.cfg, kind="text"
            )
            lane_parts.append((
                "caption",
                self._lane_pairs(
                    sig, "sig_caption", self.cfg, use_simhash=True, epoch_id=epoch_id
                ),
            ))
        if "bytes" in self.enable_lanes:
            sig = compute_signatures(
                batch_df, "image_id", "bytes", self.bytes_cfg,
                kind="binary", byte_stride=self.byte_stride,
            )
            lane_parts.append((
                "bytes",
                self._lane_pairs(
                    sig, "sig_bytes", self.bytes_cfg, use_simhash=False,
                    epoch_id=epoch_id,
                ),
            ))
        if "phash" in self.enable_lanes:
            lane_parts.append(("phash", self._phash_lane(batch_df, epoch_id)))
        if "dhash" in self.enable_lanes:
            lane_parts.append(("dhash", self._dhash_lane(batch_df, epoch_id)))
        if "video" in self.enable_lanes:
            lane_parts.append(("video", self._video_lane(batch_df, epoch_id)))
        if "audio" in self.enable_lanes:
            lane_parts.append(("audio", self._audio_lane(batch_df, epoch_id)))
        if "embedding" in self.enable_lanes:
            lane_parts.append(
                ("embedding", self._embedding_lane(batch_df, epoch_id))
            )

        # ids must cover EVERY row of the batch (all_rows), not only the
        # exact-tier survivors — collapsed twins reach their cluster through
        # the exact edges, but only if they exist as vertices
        ids_new = all_rows.select(F.col("image_id").alias("id"))
        self._write_epoch("ids", ids_new, epoch_id)

        # lane fusion (the batch dedup_images edge_policy semantics, via
        # the SHARED imagededup.fuse_edges implementation so the two can
        # never drift): a pair is evaluated by every enabled lane exactly
        # once, in this epoch (the arrival epoch of its later member), so
        # the per-epoch k-of-n vote equals the batch vote over the whole
        # corpus — including k > n(lanes) yielding no edges
        if lane_parts:
            from ..operators.imagededup import fuse_edges

            new_edges, _ = fuse_edges(lane_parts, self.edge_policy)
        else:
            new_edges = None
        if exact_edges is not None:  # identity evidence bypasses fusion
            new_edges = (
                exact_edges if new_edges is None
                else new_edges.union(exact_edges)
            )
        if new_edges is None:
            new_edges = self.spark.createDataFrame([], "a string, b string")
        new_edges = new_edges.dropDuplicates(["a", "b"])
        # append-log of raw fused edges: audit + repair path (a full
        # assign_clusters over ids+edges must always reproduce the
        # incrementally maintained table — pinned in tests)
        self._write_epoch("edges", new_edges, epoch_id)

        # incremental cluster maintenance: O(batch + touched clusters)
        # per epoch, NOT O(corpus) — the north rule's "cluster frontier"
        t_cc = time.time()
        meta.update(self._apply_edges(ids_new, new_edges, epoch_id))
        meta["cc_sec"] = round(time.time() - t_cc, 3)
        meta["wall_sec"] = round(time.time() - t0, 3)
        self._mark_epoch(epoch_id, meta)
        self._maybe_compact(epoch_id, meta)

    def _maybe_compact(self, epoch_id: int, meta: dict) -> None:
        """Scheduled maintenance at the tail of process_batch — AFTER
        _mark_epoch, so compaction only ever sees committed epochs and a
        crash mid-compaction replays nothing (the epoch is already done;
        the half-written compacted_* dir is excluded by the _LIVE
        manifest until the atomic swap). Cadence keys on epoch_id, so a
        replayed epoch (early-returned above) never re-compacts and a
        resumed run compacts at the same points the uninterrupted run
        would. The fold duration lands in epochs.json so metrics() shows
        maintenance cost next to cc_sec/wall_sec."""
        if not self.compact_every or (epoch_id + 1) % self.compact_every:
            return
        t = time.time()
        folded = self.compact_all()
        meta = dict(meta)
        meta["compact_sec"] = round(time.time() - t, 3)
        meta["compact_folded"] = int(sum(folded.values()))
        self._mark_epoch(epoch_id, meta)

    # -- incremental connected components --------------------------------------
    # The cluster table lives in TWO bucketed stores with epoch-delta
    # writes and latest-asg_epoch-wins resolution:
    #   clusters_by_id      (id, cluster_id, asg_epoch)  bucket(id)
    #   clusters_by_cluster (id, cluster_id, asg_epoch)  bucket(cluster_id)
    # by_id answers point lookups (edge-endpoint resolution); by_cluster
    # answers "members of cluster c" (merge rewrites) with partition
    # pruning. Canonical labels only ever DECREASE (min-id convention), so
    # a retired label can never become canonical again — stale member rows
    # under retired labels are therefore unreachable by probes (which only
    # ever probe live labels) and get dropped at compaction. Per-epoch
    # cost is O(|batch| + |new edges| + members of touched clusters): the
    # cluster FRONTIER, independent of corpus size.
    def _asg_lookup(self, ids_df: DataFrame, epoch_id: int) -> DataFrame:
        """(id, cluster_id) for the subset of ``ids_df`` already assigned
        in epochs BEFORE ``epoch_id`` (replay safety: a partially written
        current slot is invisible). Store is the big side — streamed
        through a broadcast join against the batch-bounded probe set."""
        empty = self.spark.createDataFrame([], "id string, cluster_id string")
        buckets = self._touched_buckets(ids_df, "id")
        st = self._read_bucketed("clusters_by_id", buckets,
                                 exclude_epoch=epoch_id)
        if st is None:
            return empty
        return (
            st.join(F.broadcast(ids_df.select("id")), "id")
            .groupBy("id")
            .agg(F.expr("max_by(cluster_id, asg_epoch)").alias("cluster_id"))
        )

    def _apply_edges(self, ids_new: DataFrame, edges: DataFrame,
                     epoch_id: int) -> dict:
        """Fold this epoch's vertices + fused edges into the cluster
        stores. Steps: (1) resolve edge endpoints and new ids against the
        pre-epoch assignment state; (2) contract edges to their clusters
        and run connected_components on the contracted graph — size
        O(touched clusters + new ids), never the corpus; (3) rewrite the
        members of merged-away clusters (bucket-pruned) and insert fresh
        ids. Same min-label law as batch CC, so the maintained table
        equals assign_clusters(all ids, all edges) at every epoch."""
        ends = (
            edges.select(F.col("a").alias("id"))
            .union(edges.select(F.col("b").alias("id")))
        )
        lookup = ends.union(ids_new).distinct().localCheckpoint(eager=True)
        asg_pre = self._asg_lookup(lookup, epoch_id).localCheckpoint(eager=True)

        contracted = (
            edges.join(
                F.broadcast(asg_pre.select(F.col("id").alias("a"),
                                           F.col("cluster_id").alias("ca"))),
                "a", "left")
            .join(
                F.broadcast(asg_pre.select(F.col("id").alias("b"),
                                           F.col("cluster_id").alias("cb"))),
                "b", "left")
            .select(F.coalesce("ca", F.col("a")).alias("a"),
                    F.coalesce("cb", F.col("b")).alias("b"))
            .where(F.col("a") != F.col("b"))
        )
        comp = connected_components(contracted).localCheckpoint(eager=True)
        merges = comp.where(F.col("id") != F.col("cluster_id"))
        # labels needing member rewrite = merge keys that are live cluster
        # canons (every contracted label is either a pre-epoch canon —
        # hence appears among asg_pre.cluster_id values — or a fresh id,
        # which has no members to move)
        lbl = merges.join(
            F.broadcast(asg_pre.select(F.col("cluster_id").alias("id"))
                        .distinct()),
            "id", "left_semi",
        ).localCheckpoint(eager=True)

        moved = self.spark.createDataFrame([], "id string, cluster_id string")
        if lbl.limit(1).count():
            mem_buckets = self._touched_buckets(lbl, "id")
            mem = self._read_bucketed("clusters_by_cluster", mem_buckets,
                                      exclude_epoch=epoch_id)
            if mem is not None:
                moved = (
                    mem.join(
                        F.broadcast(
                            lbl.select(
                                F.col("id").alias("cluster_id"),
                                F.col("cluster_id").alias("_new_cluster"),
                            )
                        ),
                        "cluster_id",
                    )
                    .select("id",
                            F.col("_new_cluster").alias("cluster_id"))
                )
        fresh = ids_new.join(F.broadcast(asg_pre.select("id")),
                             "id", "left_anti")
        fresh_asg = fresh.join(F.broadcast(comp), "id", "left").select(
            "id",
            F.coalesce("cluster_id", F.col("id")).alias("cluster_id"),
        )
        delta = (
            fresh_asg.withColumn("_src", F.lit("fresh"))
            .union(moved.withColumn("_src", F.lit("moved")))
            .dropDuplicates(["id"])
            .withColumn("asg_epoch", F.lit(epoch_id))
            .localCheckpoint(eager=True)  # two store writes + counters
        )
        out = delta.select("id", "cluster_id", "asg_epoch")
        self._write_epoch_bucketed("clusters_by_id", out, epoch_id, ["id"])
        self._write_epoch_bucketed("clusters_by_cluster", out, epoch_id,
                                   ["cluster_id"])
        counts = {
            r["_src"]: r["n"]
            for r in delta.groupBy("_src").agg(F.count("*").alias("n")).collect()
        }
        return {
            "fresh_ids": int(counts.get("fresh", 0)),
            "moved_members": int(counts.get("moved", 0)),
        }

    def _embedding_lane(self, batch_df: DataFrame, epoch_id: int) -> DataFrame:
        """Streaming SemDeDup lane: random-hyperplane band keys of the
        new batch's embeddings (knn.hyperplane_bucket_keys — the batch
        LSH self-join's bucket shape) join the accumulated bucketed band
        store with partition pruning (new×old and new×new in one join,
        like the sig lanes), then exact cosine ≥ threshold verifies
        against a bucket-pruned vector lookup — all JVM expressions
        (knn._cosine). Recall is the batch law 1-(1-p)^T; union over
        epochs covers every co-banded pair exactly once."""
        from pyspark.sql import Window

        from ..operators.knn import _cosine, hyperplane_bucket_keys

        src = batch_df.select("image_id", self.embedding_col)
        keys = hyperplane_bucket_keys(
            src, self.embedding_dim, id_col="image_id",
            vec_col=self.embedding_col, n_tables=self.emb_tables,
            n_bits=self.emb_bits, seed=self.emb_seed,
        ).localCheckpoint(eager=True)  # store write + probe: kernel runs once
        self._write_epoch_bucketed(
            "emb_bands", keys, epoch_id, ["band_idx", "band_hash"]
        )
        self._write_epoch_bucketed(
            "emb_vecs",
            src.select(F.col("image_id").alias("id"),
                       F.col(self.embedding_col).alias("v")),
            epoch_id, ["id"],
        )
        new_k = keys.select(F.col("id").alias("new_id"), "band_idx", "band_hash")
        probe_buckets = self._touched_buckets(new_k, "band_idx", "band_hash")
        all_k = self._read_bucketed("emb_bands", probe_buckets)
        if all_k is None:  # every live slot empty
            return self._empty_edges()
        matched = all_k.join(
            F.broadcast(new_k), ["band_idx", "band_hash"]
        ).where(F.col("id") != F.col("new_id"))
        wnd = Window.partitionBy("new_id", "band_idx").orderBy("id")
        cand = (
            matched.withColumn("_rn", F.row_number().over(wnd))
            .where(F.col("_rn") <= self.max_fanout)
            .select(
                F.least("id", "new_id").alias("a"),
                F.greatest("id", "new_id").alias("b"),
            )
            .dropDuplicates(["a", "b"])
            .localCheckpoint(eager=True)  # bucket calc + verify
        )
        id_buckets = sorted(
            self._touched_buckets_pair(cand, "a", "b")
        )
        vecs = self._read_bucketed("emb_vecs", id_buckets)
        if vecs is None:  # no candidates can verify without stored vectors
            return self._empty_edges()
        vecs = vecs.drop("bucket")
        return (
            cand.join(
                vecs.select(F.col("id").alias("a"), F.col("v").alias("va")), "a"
            )
            .join(
                vecs.select(F.col("id").alias("b"), F.col("v").alias("vb")), "b"
            )
            .where(_cosine(F.col("va"), F.col("vb")) >= self.cosine_threshold)
            .select("a", "b")
        )

    def _phash_lane(self, batch_df: DataFrame, epoch_id: int) -> DataFrame:
        """Streaming pHash lane: slice-combo keys of the new batch join the
        accumulated (bucketed, pre-exploded) pHash key store with partition
        pruning; verify with bit_count. Keys are materialized once at
        ingest — the store is never re-exploded on probe."""
        from ..operators.imagededup import (
            with_content_phash,
            with_phash_orbit,
        )

        # same invariance ladder as the batch lane (imagededup.dedup_images):
        # content-box hash first (needs bytes/w/h/fmt on the stream), then
        # D4 orbit explosion — the key store simply holds the transformed
        # (id, phash) rows, so probes match under the same laws as batch
        src = batch_df.select("image_id", "phash")
        if self.crop_invariant:
            src = with_content_phash(batch_df)
        if self.rotation_invariant:
            src = with_phash_orbit(src)
        return self._hashkey_lane(src, "phash", "phash_keys", epoch_id)

    def _dhash_lane(self, batch_df: DataFrame, epoch_id: int) -> DataFrame:
        """Streaming gradient-sign dHash lane (batch twin:
        dedup_images enable_lanes "dhash"): the 8×9 difference hash is
        computed from the streamed bytes in one narrow mapInPandas
        (imagededup.with_dhash — lighting-profile-invariant where the
        block-mean pHash is not), then rides the same slice-combo key
        store machinery as the pHash lane under its own store."""
        from ..operators.imagededup import with_dhash

        return self._hashkey_lane(
            with_dhash(batch_df), "dhash", "dhash_keys", epoch_id
        )

    def _video_lane(self, batch_df: DataFrame, epoch_id: int) -> DataFrame:
        """Streaming video near-dup lane (batch twin:
        videodedup.dedup_videos): sampled-frame pHashes flow through the
        SHARED 64-bit hash-key store under pseudo-ids ``video#frame``,
        then the epoch's frame edges aggregate to video pairs scored by
        countDistinct matched frames of the lexicographically smaller
        video — exactly videodedup.video_pairs' law. Per-epoch equality
        with batch holds because EVERY frame pair of a video pair forms
        in the later video's arrival epoch (all its frames are new
        then), so the within-epoch count is the whole-corpus count."""
        from ..operators.multimodal import sample_frames
        from ..operators.videodedup import _SEP, with_frame_phash

        frames = sample_frames(
            batch_df.select(F.col("image_id").alias("video_id"),
                            "bytes", "w", "h", "fmt"),
            every_k=self.video_every_k,
        )
        ph = with_frame_phash(frames)
        fid = F.concat_ws(_SEP, F.col("video_id"), F.col("frame_idx"))
        frame_edges = self._hashkey_lane(
            ph.select(fid.alias("image_id"), "phash"),
            "phash", "video_frame_keys", epoch_id,
        )
        strip = lambda c: F.regexp_replace(c, r"#[0-9]+$", "")  # noqa: E731
        fr = lambda c: F.substring_index(c, _SEP, -1).cast("int")  # noqa: E731
        va, vb = strip(F.col("a")), strip(F.col("b"))
        fa, fb = fr(F.col("a")), fr(F.col("b"))
        return (
            frame_edges.where(va != vb)
            .select(
                F.least(va, vb).alias("va"),
                F.greatest(va, vb).alias("vb"),
                F.when(va < vb, fa).otherwise(fb).alias("frame_small"),
            )
            .groupBy("va", "vb")
            .agg(F.countDistinct("frame_small").alias("mf"))
            .where(F.col("mf") >= self.video_min_frames)
            .select(F.col("va").alias("a"), F.col("vb").alias("b"))
        )

    def _audio_lane(self, batch_df: DataFrame, epoch_id: int) -> DataFrame:
        """Streaming audio near-dup lane (batch twin:
        audiodedup.dedup_audio): spectral-landmark fingerprints of the
        new clips land in a persistent landmark-bucketed store; pairs =
        store ⋈ broadcast(new landmarks), scored by distinct shared
        landmarks ≥ min_shared. The batch hot-landmark cap applies at
        the CURRENT corpus: a landmark whose total membership exceeds
        ``audio_max_ids_per_landmark`` emits no new pairs from this
        epoch on (pairs formed before it went hot survive — the
        documented monotone-ingestion deviation from a one-shot batch
        over the final corpus; identical below the cap)."""
        from ..operators.audiodedup import audio_landmarks

        lm = audio_landmarks(
            batch_df, id_col="image_id", window=self.audio_window,
            peaks_per_frame=self.audio_peaks, fan_dt=self.audio_fan_dt,
        ).localCheckpoint(eager=True)  # store write + touched + probe
        self._write_epoch_bucketed(
            "audio_landmarks",
            lm.select(F.col("image_id").alias("id"), "landmark"),
            epoch_id, ["landmark"],
        )
        new_lm = lm.select(F.col("image_id").alias("new_id"), "landmark")
        probe_buckets = self._touched_buckets(new_lm, "landmark")
        all_lm = self._read_bucketed("audio_landmarks", probe_buckets)
        if all_lm is None:  # every live slot empty (all sub-window clips)
            return self._empty_edges()
        # hot-landmark cap over the landmark's TOTAL membership so far
        # (pruned read = exactly the probed landmarks); store side stays
        # streamed, the batch-bounded new side broadcasts
        hot = (
            all_lm.groupBy("landmark")
            .agg(F.count_distinct("id").alias("nids"))
            .where(F.col("nids") > self.audio_max_ids_per_landmark)
            .select("landmark")
        )
        matched = (
            all_lm.join(F.broadcast(new_lm), "landmark")
            .join(F.broadcast(hot), "landmark", "left_anti")
            .where(F.col("id") != F.col("new_id"))
            .select(
                F.least("id", "new_id").alias("a"),
                F.greatest("id", "new_id").alias("b"),
                "landmark",
            )
            .dropDuplicates(["a", "b", "landmark"])  # new×new forms twice
        )
        return (
            matched.groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("shared"))
            .where(F.col("shared") >= self.audio_min_shared)
            .select("a", "b")
        )

    def _hashkey_lane(self, src: DataFrame, hash_col: str, store: str,
                      epoch_id: int) -> DataFrame:
        """Shared 64-bit-hash lane kernel: slice-combo keys of the new
        rows join the accumulated (bucketed, pre-exploded) key store
        with partition pruning; verify with bit_count ≤ cfg hamming.
        Keys are materialized once at ingest — the store is never
        re-exploded on probe."""
        from ..operators.imagededup import phash_combo_keys_expr

        arr = phash_combo_keys_expr(hash_col, self.cfg)
        new_k = src.select(
            F.col("image_id").alias("new_id"),
            F.col(hash_col).alias("ph_new_id"),
            F.posexplode(arr).alias("band_idx", "band_hash"),
        ).localCheckpoint(eager=True)
        # ^ three consumers (store write, touched-buckets, probe) — without
        # the checkpoint the upstream kernel (with_dhash's image decode, or
        # the crop/orbit ladder) would run once per consumer
        self._write_epoch_bucketed(
            store,
            new_k.select(F.col("new_id").alias("id"),
                         F.col("ph_new_id").alias("ph_id"),
                         "band_idx", "band_hash"),
            epoch_id, ["band_idx", "band_hash"],
        )
        probe_buckets = self._touched_buckets(new_k, "band_idx", "band_hash")
        all_k = self._read_bucketed(store, probe_buckets)
        if all_k is None:  # every live slot empty
            return self._empty_edges()
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
        continuously.

        Fail-fast on a RESET Spark checkpoint over live state: epoch
        idempotency keys on Spark's batch id, so a fresh/wiped
        checkpointLocation restarts ids at 0 and every redelivered batch
        would match an old epoch in epochs.json and be silently
        SKIPPED — new data lost with no error. If the semantic state has
        committed epochs but the Spark checkpoint is empty, refuse and
        tell the user to either restore the checkpoint or start a fresh
        state_dir."""
        ckpt = checkpoint_dir or self._p("_spark_checkpoint")
        self._assert_checkpoint_live(ckpt)
        reader = (
            self.spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(source_dir)
        )
        writer = reader.writeStream.foreachBatch(self.process_batch).option(
            "checkpointLocation", ckpt
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def assignments(self, as_of_epoch: int | None = None) -> DataFrame | None:
        """Full assignment table (id, cluster_id), resolved from the
        incrementally maintained cluster store (latest asg_epoch per id
        wins — an id's row is superseded when its cluster merged). One
        max_by aggregation over the store (partial agg before the
        exchange — cheaper than a sort window) — an on-demand export,
        not a per-epoch cost; `compact_all`/`compact_clusters` keep the
        underlying file and row counts bounded.

        ``as_of_epoch`` time-travels: the table as it stood after that
        epoch (the epoch-delta rows ARE the cluster-frontier history).
        Valid back to the last `compact_clusters` call — resolved
        compaction collapses history to the current state (the generic
        `compact_all` fold preserves it).

        Only COMMITTED epoch slots are read: a crash between the store
        write and the epoch marker leaves a partial slot the replay will
        rewrite — external readers must not see it."""
        st = self._read_bucketed(
            "clusters_by_id",
            dirs=self._committed_epoch_dirs("clusters_by_id"),
        )
        if st is None:
            return None
        if as_of_epoch is not None:
            st = st.where(F.col("asg_epoch") <= as_of_epoch)
        return st.groupBy("id").agg(
            F.expr("max_by(cluster_id, asg_epoch)").alias("cluster_id")
        )

    def metrics(self) -> DataFrame | None:
        """Per-epoch counter metrics as a DataFrame: one row per
        committed epoch with rows / novel_rows / exact_collapsed /
        fresh_ids / moved_members / cc_sec / wall_sec (absent counters
        null). The DataFrame form of the epochs.json manifest — the
        north rule's lineage + counters surface."""
        p = self._p("epochs.json")
        if not self._hfs.exists(p):
            return None
        done = json.loads(self._hfs.read_bytes(p).decode())["done"]
        rows = [
            {
                "epoch": int(ep),
                "rows": m.get("rows"),
                "novel_rows": m.get("novel_rows"),
                "exact_collapsed": m.get("exact_collapsed"),
                "fresh_ids": m.get("fresh_ids"),
                "moved_members": m.get("moved_members"),
                "cc_sec": m.get("cc_sec"),
                "wall_sec": m.get("wall_sec"),
                "compact_sec": m.get("compact_sec"),
                "compact_folded": m.get("compact_folded"),
            }
            for ep, m in sorted(done.items(), key=lambda kv: int(kv[0]))
        ]
        return self.spark.createDataFrame(
            rows,
            "epoch int, rows bigint, novel_rows bigint, exact_collapsed "
            "bigint, fresh_ids bigint, moved_members bigint, cc_sec "
            "double, wall_sec double, compact_sec double, "
            "compact_folded bigint",
        )

    def compact_clusters(self) -> int:
        """Resolved compaction of the two cluster stores: rewrite both to
        exactly ONE row per live id (the latest assignment) — dropping
        superseded rows and stale member rows under retired labels — so
        row count returns to O(live ids) no matter how much merge churn
        has accumulated. Same manifest commit protocol as compact_store
        (write resolved dir, swap _LIVE, delete superseded); resolution
        is idempotent, so a crash between the two stores' swaps leaves
        both readable and a re-run converges. Call between micro-batches
        only (compact_store's contract). Like compact_store, only
        COMMITTED epoch slots fold — an uncommitted slot from a crashed
        epoch stays live for its replay's exclude_epoch probe. Returns
        directories folded."""
        by_id_dirs = self._committed_epoch_dirs("clusters_by_id")
        st = self._read_bucketed("clusters_by_id", dirs=by_id_dirs)
        if st is None:
            return 0
        resolved = st.groupBy("id").agg(
            F.expr("max_by(cluster_id, asg_epoch)").alias("cluster_id"),
            F.max("asg_epoch").alias("asg_epoch"),
        ).localCheckpoint(eager=True)  # two store rewrites
        folded = 0
        for name, key in (("clusters_by_id", ["id"]),
                          ("clusters_by_cluster", ["cluster_id"])):
            dirs = self._committed_epoch_dirs(name)
            tag = f"compacted_{int(time.time() * 1000):013d}"
            target = self._p(f"{name}/{tag}")
            (resolved.withColumn("bucket", self._bucket_expr(*key))
             .repartition(self.num_buckets, "bucket")  # one file per bucket
             .write.mode("overwrite").partitionBy("bucket").parquet(target))
            manifest = self._p(f"{name}/_LIVE.json")
            prior: list[str] = []
            if self._hfs.exists(manifest):
                prior = json.loads(
                    self._hfs.read_bytes(manifest).decode()
                ).get("superseded", [])
            superseded = sorted(
                {d.rstrip("/").rsplit("/", 1)[-1] for d in dirs} | set(prior)
            )
            self._hfs.write_bytes_atomic(
                manifest,
                json.dumps({"live": [tag], "superseded": superseded}).encode(),
            )
            for d in dirs:
                try:
                    self._hfs.delete(d, recursive=True)
                except Exception:
                    pass  # orphan stays excluded via the manifest
            folded += len(dirs)
        return folded
