"""S9/S10: checkpoint/resume with per-partition lineage manifests + metrics.

The reference's serialized-image contract is the model: a sketch resumes
from bytes exactly, and set-ops validate the seed hash before consuming a
serialized sketch (theta_union_base_impl.hpp:41-42; preamble layout
theta_sketch_impl.hpp:378-398). Here the "serialized image" of a pipeline
stage is a parquet snapshot directory, and the "seed hash" is the
``SigConfig.fingerprint()`` stamped into the stage manifest: a resume under
a different config MUST fail fast, never silently mix signatures built with
different seeds/shingles (that would corrupt Jaccard estimates the same way
mixing seeds corrupts a theta union).

The root may be ANY URI with a registered Hadoop FileSystem (file://,
hdfs://, s3a://, abfs://, bare local paths...): manifest and lineage
bookkeeping route through the same ``org.apache.hadoop.fs.FileSystem``
API Spark uses to commit the parquet snapshots themselves (plans/fsio.py).
On stores with atomic rename (HDFS, local) the manifest publish is a true
commit point; on stores without FileContext rename-OVERWRITE (e.g. s3a)
the overwrite fallback has a narrow crash window in which a RE-commit can
lose the previous manifest — the stage then reads as incomplete and is
recomputed, never read corrupt (see fsio.HadoopFS.rename_overwrite). A
scheme with no registered FileSystem fails at construction
(``FsResolutionError``), never mid-pipeline.

Layout (one root per pipeline run):

    <root>/<stage>/data/...parquet        the stage output snapshot
    <root>/<stage>/_MANIFEST.json         fingerprint + per-partition lineage
    <root>/_LINEAGE.jsonl                 append-only run log (metrics)

Manifest contents: config fingerprint, epoch, row count, schema, and a
per-partition table ``[{file, rows, bytes}]`` — each written task produces
one file, so file-grain IS partition-grain lineage. Resume validation is
O(#files) metadata work (FileStatus names + lengths vs manifest), not a
data rescan; the per-file row counts are parquet *footer* reads through
positioned FSDataInputStream access (fsio.ParquetFooterFile), also not a
data scan.

Failure modes (mirrors the reference's deserialize-hardening tests,
common/test/deserialize_hardening_test.cpp:43-150):
  - manifest missing / unparseable → stage treated as INCOMPLETE, recomputed
    (a partial write that died before the manifest rename is invisible);
  - manifest present but fingerprint mismatch → ``CheckpointConfigMismatch``
    (fail fast, like the seed-hash throw);
  - manifest present but data files missing/short → ``CheckpointCorrupt``
    (fail fast; never silently recompute wrong).

The manifest is written via <path>.tmp + rename — atomic on HDFS-class
stores, the same publish primitive behind Spark's own job commit — and
only after the data is fully committed by Spark's _SUCCESS-gated parquet
job commit.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from typing import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .fsio import FsResolutionError, HadoopFS

__all__ = [
    "StageCheckpointer",
    "CheckpointConfigMismatch",
    "CheckpointCorrupt",
    "FsResolutionError",
    "checksum",
    "MANIFEST_NAME",
    "LINEAGE_LOG",
]

MANIFEST_NAME = "_MANIFEST.json"
LINEAGE_LOG = "_LINEAGE.jsonl"
MANIFEST_VERSION = 1


class CheckpointConfigMismatch(RuntimeError):
    """Resume attempted with a different config fingerprint — the analog of
    the reference's seed-hash mismatch throw."""


class CheckpointCorrupt(RuntimeError):
    """Manifest claims data that isn't there (missing/truncated files)."""


@dataclass
class StageCheckpointer:
    """Manifest-gated idempotent stage runner (SURVEY.md §2B S9/S10)."""

    spark: SparkSession
    root: str
    fingerprint: str
    epoch: int = 0
    metrics: list = field(default_factory=list)

    def __post_init__(self) -> None:
        # Resolve the FileSystem once, up front: an unregistered scheme is a
        # configuration error and must fail at construction, not after hours
        # of pipeline work (FsResolutionError <: ValueError).
        self._fs = HadoopFS(self.spark, self.root)

    def close(self) -> None:
        """Release the private Hadoop FileSystem (connections/thread pools
        on remote stores). The checkpointer is unusable afterwards."""
        self._fs.close()

    def __enter__(self) -> "StageCheckpointer":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # -- paths ---------------------------------------------------------------
    def _stage_dir(self, stage: str) -> str:
        return HadoopFS.join(self.root, stage)

    def _data_dir(self, stage: str) -> str:
        return HadoopFS.join(self._stage_dir(stage), "data")

    def _manifest_path(self, stage: str) -> str:
        return HadoopFS.join(self._stage_dir(stage), MANIFEST_NAME)

    # -- lineage -----------------------------------------------------------
    def _partition_lineage(self, data_dir: str) -> list[dict]:
        """File-grain lineage of a committed parquet snapshot: one entry per
        part-file with its byte size (from FileStatus) and row count (from
        the parquet footer via positioned reads — no data scan)."""
        entries = []
        for name, nbytes in self._fs.list_files(data_dir):
            if not name.endswith(".parquet"):
                continue
            full = HadoopFS.join(data_dir, name)
            entries.append(
                {
                    "file": name,
                    "bytes": nbytes,
                    "rows": self._fs.parquet_num_rows(full),
                }
            )
        return entries

    # -- manifest ------------------------------------------------------------
    def load_manifest(self, stage: str) -> dict | None:
        """Parse + validate the stage manifest. None ⇔ stage incomplete."""
        path = self._manifest_path(stage)
        if not self._fs.exists(path):
            return None
        try:
            m = json.loads(self._fs.read_bytes(path).decode())
        except Exception:
            # torn manifest == no manifest (recompute). Broad catch is
            # deliberate: fsio reads go through py4j, so a manifest that
            # vanishes or errors between exists() and read_bytes() surfaces
            # as Py4JJavaError / Py4JError, not OSError — all of them mean
            # "this stage has no readable commit marker".
            return None
        if m.get("version") != MANIFEST_VERSION or "fingerprint" not in m:
            return None
        if m["fingerprint"] != self.fingerprint:
            raise CheckpointConfigMismatch(
                f"stage {stage!r}: checkpoint was written with config "
                f"fingerprint {m['fingerprint']} but this run has "
                f"{self.fingerprint}; refusing to resume (delete {path} to "
                "rebuild)"
            )
        # metadata-only integrity check: every manifest partition file must
        # exist with the recorded size (one listStatus, no data reads)
        actual = dict(self._fs.list_files(self._data_dir(stage)))
        for part in m["partitions"]:
            if actual.get(part["file"]) != part["bytes"]:
                raise CheckpointCorrupt(
                    f"stage {stage!r}: manifest lists {part['file']} "
                    f"({part['bytes']} bytes) but the snapshot doesn't match; "
                    "checkpoint is corrupt — failing fast instead of "
                    "recomputing over bad state"
                )
        return m

    def is_complete(self, stage: str) -> bool:
        return self.load_manifest(stage) is not None

    # -- write / read ----------------------------------------------------------
    def write(self, stage: str, df: DataFrame, observe: dict | None = None) -> DataFrame:
        """Commit a stage snapshot + manifest; returns the re-read DataFrame
        (reading back cuts lineage and makes downstream stages consume the
        exact committed bytes, like wrapping a serialized sketch).

        ``observe`` = {name: aggregate Column}: in-query counters riding the
        write job itself via ``Observation`` (SURVEY §2B S10) — zero extra
        actions, recorded under manifest['observed'] and in the lineage log."""
        t0 = time.time()
        data_dir = self._data_dir(stage)
        # retire any committed manifest BEFORE touching the data dir: a
        # crash mid-rewrite must look like "never committed" (recompute),
        # never like a valid manifest over missing/partial data
        # (CheckpointCorrupt hard-fail on the next load)
        mpath = self._manifest_path(stage)
        if self._fs.exists(mpath):
            self._fs.delete(mpath, recursive=False)
        if self._fs.exists(data_dir):
            self._fs.delete(data_dir, recursive=True)  # partial previous attempt
        obs = None
        if observe:
            from pyspark.sql import Observation

            obs = Observation(f"{stage}_metrics")
            df = df.observe(obs, *[expr.alias(name) for name, expr in observe.items()])
        df.write.mode("overwrite").parquet(data_dir)

        parts = self._partition_lineage(data_dir)
        manifest = {
            "version": MANIFEST_VERSION,
            "stage": stage,
            "epoch": self.epoch,
            "fingerprint": self.fingerprint,
            "rows": sum(p["rows"] for p in parts),
            "bytes": sum(p["bytes"] for p in parts),
            "num_partitions": len(parts),
            "schema": df.schema.jsonValue(),
            "partitions": parts,
            "wall_sec": round(time.time() - t0, 3),
            "written_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "observed": obs.get if obs is not None else None,
        }
        self._fs.write_bytes_atomic(
            self._manifest_path(stage), json.dumps(manifest).encode()
        )
        self._log(stage, "write", manifest)
        return self.spark.read.parquet(data_dir)

    def read(self, stage: str) -> DataFrame:
        m = self.load_manifest(stage)
        if m is None:
            raise CheckpointCorrupt(f"stage {stage!r} has no committed snapshot")
        self._log(stage, "resume", m)
        return self.spark.read.parquet(self._data_dir(stage))

    def run_stage(
        self,
        stage: str,
        fn: Callable[[], DataFrame],
        observe: dict | None = None,
    ) -> DataFrame:
        """Idempotent stage entry: committed → read the snapshot (fn NOT
        invoked); else compute, commit, return. This is what makes the whole
        pipeline resumable from any stage boundary."""
        # ONE manifest load + listing on the resume path (is_complete +
        # read would each do their own — 2N remote round trips per resume)
        m = self.load_manifest(stage)
        if m is not None:
            self._log(stage, "resume", m)
            return self.spark.read.parquet(self._data_dir(stage))
        return self.write(stage, fn(), observe=observe)

    # -- metrics ------------------------------------------------------------
    def _log(self, stage: str, event: str, manifest: dict) -> None:
        rec = {
            "event": event,
            "stage": stage,
            "epoch": manifest.get("epoch"),
            "rows": manifest.get("rows"),
            "bytes": manifest.get("bytes"),
            "num_partitions": manifest.get("num_partitions"),
            "wall_sec": manifest.get("wall_sec"),
            "fingerprint": self.fingerprint,
            "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        self.metrics.append(rec)
        self._fs.mkdirs(self.root)
        self._fs.append_line(
            HadoopFS.join(self.root, LINEAGE_LOG), json.dumps(rec)
        )


def checksum(df: DataFrame, *cols: str) -> str:
    """Partition-order-insensitive content checksum (count + decimal sum of
    xxhash64 over the named columns) — used to assert byte-identical resumes."""
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(F.xxhash64(*cols).cast("decimal(38,0)")), F.lit(0)
        ).alias("cs"),
    ).collect()[0]
    return f"{row['n']}:{row['cs']}"
