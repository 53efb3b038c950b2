"""WebDataset-style tar-shard ingest — the standard front door for
web-scale image+caption corpora.

At 10^12-image scale, crawled corpora arrive as tar shards (the
WebDataset convention: members ``<key>.<ext>`` grouped by key — one
image member per key plus ``<key>.txt`` caption and optional
``<key>.json`` metadata), not as parquet. This source turns a directory
of shards into the engine's canonical input table
``(image_id, bytes, w, h, fmt, caption, phash)`` (BASELINE.json
input_hint) so the whole dedup pipeline runs unchanged on raw crawl
output.

Spark shape — built for the shard parallelism model:

* ``spark.read.format("binaryFile")`` lists and distributes the shard
  FILES; each shard is one task (tar is non-splittable, which is exactly
  the WebDataset contract: shards ARE the unit of parallelism — size
  them 100 MB-1 GB when writing, and 10^12 images ≈ millions of shards
  spread over every executor).
* ONE ``mapInPandas`` pass per shard: stdlib ``tarfile`` over the
  in-memory shard, members paired by key, format validated against the
  stream's magic bytes (imagecodec.sniff_format), dims read from the
  stream HEADER only (imagecodec.sniff_dims — no pixel decode), and the
  64-bit block-mean pHash computed via the same batched kernel the
  synthetic corpus uses (decode grouped per (w,h,fmt) shape class).
  Output rows are narrow; pixels never leave the task.
* A per-shard size guard raises executor-side before materializing a
  shard larger than ``max_shard_bytes`` (default 2 GiB) — a mis-sized
  shard fails fast with its path, never an opaque OOM.

``write_tar_shards`` is the writer twin (synthetic corpus → shards) used
by tests and the ``tar_shard_ingest`` driver oracle; raw members carry a
``<key>.json`` sidecar with their dims (raw is headerless).

The reference repo (apache/datasketches-cpp) has no ingest layer; this
module extends the engine's pipeline surface like sources/images.py.
"""

from __future__ import annotations

import io
import json
import os
import tarfile

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_IMAGE_EXTS = {
    "png": "png", "ppm": "ppm", "bmp": "bmp", "gif": "gif",
    "tif": "tiff", "tiff": "tiff", "jpg": "jpeg", "jpeg": "jpeg",
    "webp": "webp", "dct": "dct", "raw": "raw",
}

_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long"
)


class TarShardError(ValueError):
    """Malformed shard or member layout (fail-fast seam)."""


def _rows_from_shard(name: str, data: bytes) -> pd.DataFrame:
    """One shard -> canonical-table rows (image_id sorted, pHash-less)."""
    from ..operators.imagecodec import sniff_dims, sniff_format

    members: dict[str, dict] = {}
    with tarfile.open(fileobj=io.BytesIO(data), mode="r") as tf:
        for m in tf:
            if not m.isfile():
                continue
            # WebDataset keys are PATH-qualified (dir/0001.jpg pairs with
            # dir/0001.txt, never dir2/0001.txt) — basename keying would
            # mispair nested-directory shards
            norm = m.name.lstrip("./")
            key, dot, ext = norm.rpartition(".")
            if not dot:
                continue  # extension-less member: not ours, skip structurally
            ext = ext.lower()
            slot = members.setdefault(key, {})
            payload = tf.extractfile(m).read()
            if ext == "txt":
                slot["caption"] = payload.decode("utf-8")
            elif ext == "json":
                slot["meta"] = json.loads(payload.decode("utf-8"))
            elif ext in _IMAGE_EXTS:
                if "bytes" in slot:
                    raise TarShardError(
                        f"{name}: key {key!r} has two image members"
                    )
                slot["bytes"] = payload
                slot["fmt"] = _IMAGE_EXTS[ext]
            # any other extension: foreign sidecar, skipped structurally

    rows = []
    for key in sorted(members):
        slot = members[key]
        if "bytes" not in slot:
            continue  # caption-only key (image filtered upstream)
        fmt = slot["fmt"]
        buf = slot["bytes"]
        meta = slot.get("meta", {})
        if fmt == "raw":
            try:
                w, h = int(meta["w"]), int(meta["h"])
            except KeyError:
                raise TarShardError(
                    f"{name}: raw member {key!r} needs a .json sidecar "
                    "with w/h (raw is headerless)"
                ) from None
        else:
            sniffed = sniff_format(buf)
            if sniffed is not None and sniffed != fmt:
                raise TarShardError(
                    f"{name}: member {key!r} named .{fmt} but its magic "
                    f"bytes say {sniffed}"
                )
            w, h = sniff_dims(buf, fmt)
        caption = slot.get("caption", meta.get("caption", ""))
        rows.append((key, bytearray(buf), w, h, fmt, caption))
    return pd.DataFrame(
        rows, columns=["image_id", "bytes", "w", "h", "fmt", "caption"]
    )


def read_tar_shards(
    spark: SparkSession,
    path: str | list[str],
    glob: str = "*.tar",
    max_shard_bytes: int = 2 << 30,
) -> DataFrame:
    """Directory/glob (or explicit shard-path list) of tar shards -> the
    canonical image+caption table (image_id, bytes, w, h, fmt, caption,
    phash).  One task per shard; see the module docstring for the scale
    model."""
    from ..operators.multimodal import _decode_block, _shape_groups
    from .images import phash64_batch

    reader = spark.read.format("binaryFile").option("pathGlobFilter", glob)
    shards = (
        reader.load(path) if isinstance(path, str) else reader.load(list(path))
    ).select("path", "length", "content")

    # fail fast from the LISTING (path+length only — column pruning never
    # touches content), before any shard body is materialized in a task;
    # binaryFile itself caps content at Int.MaxValue, so oversize shards
    # must be rejected here to surface as TarShardError, not an opaque
    # reader error after a multi-GB load
    over = (
        shards.select("path", "length")
        .where(F.col("length") > max_shard_bytes)
        .limit(1)
        .collect()
    )
    if over:
        raise TarShardError(
            f"{over[0]['path']}: shard is {over[0]['length']} bytes "
            f"(> max_shard_bytes={max_shard_bytes}); re-shard the corpus "
            "— shards are the unit of parallelism"
        )

    def run(batches):
        for pdf in batches:
            for i in range(len(pdf)):
                spath = pdf["path"].iloc[i]
                out = _rows_from_shard(spath, bytes(pdf["content"].iloc[i]))
                if len(out) == 0:
                    continue
                ph = np.empty(len(out), np.uint64)
                for idx, w, h, fmt in _shape_groups(out):
                    px = _decode_block(out["bytes"].iloc[idx].tolist(), w, h, fmt)
                    ph[idx] = phash64_batch(px, w, h)
                out["phash"] = ph.view(np.int64)
                yield out

    return shards.mapInPandas(run, _SCHEMA)


def write_tar_shards(
    out_dir: str,
    n: int,
    seed: int = 42,
    fmt: str = "mixed",
    images_per_shard: int = 1000,
    **gen_kwargs,
) -> list[str]:
    """Synthesize the deterministic planted corpus (sources/images.py)
    as WebDataset-style shards: shard-%05d.tar with <key>.<fmt> +
    <key>.txt members (raw members add a <key>.json dims sidecar).
    Writes images_truth.parquet alongside; returns the shard paths."""
    from .images import iter_image_chunks

    os.makedirs(out_dir, exist_ok=True)
    paths: list[str] = []
    truths = []
    tf = None
    in_shard = shard_no = 0

    def _open_next():
        nonlocal tf, in_shard, shard_no
        if tf is not None:
            tf.close()
        p = os.path.join(out_dir, f"shard-{shard_no:05d}.tar")
        paths.append(p)
        tf = tarfile.open(p, "w")
        shard_no += 1
        in_shard = 0

    def _add(name: str, payload: bytes) -> None:
        info = tarfile.TarInfo(name)
        info.size = len(payload)
        info.mtime = 0  # deterministic bytes for a given (n, seed, fmt)
        tf.addfile(info, io.BytesIO(payload))

    _open_next()
    for images_pdf, truth_pdf in iter_image_chunks(n, seed=seed, fmt=fmt,
                                                   **gen_kwargs):
        truths.append(truth_pdf)
        for r in images_pdf.itertuples(index=False):
            if in_shard >= images_per_shard:
                _open_next()
            ext = "raw" if r.fmt == "raw" else r.fmt
            _add(f"{r.image_id}.{ext}", bytes(r.bytes))
            _add(f"{r.image_id}.txt", r.caption.encode("utf-8"))
            if r.fmt == "raw":
                _add(
                    f"{r.image_id}.json",
                    json.dumps({"w": int(r.w), "h": int(r.h)}).encode(),
                )
            in_shard += 1
    tf.close()
    pd.concat(truths, ignore_index=True).to_parquet(
        os.path.join(out_dir, "images_truth.parquet"), index=False
    )
    return paths


def incremental_ingest(
    spark: SparkSession,
    shard_dir: str,
    state_dir: str,
    glob: str = "*.tar",
    max_shard_bytes: int = 2 << 30,
) -> dict:
    """Continuous-crawl ingest: read ONLY shards not yet recorded in the
    state manifest, append them as one parquet epoch under
    ``state_dir/images/epoch=<k>``, and commit the manifest atomically.

    Crash discipline mirrors plans/checkpoint.py: the epoch's parquet is
    written FIRST (overwrite mode — the epoch id is derived from the
    committed manifest, so a retry after a crash rewrites the same epoch
    with the same rows), the manifest rename is the commit point, and
    readers go through the manifest's epoch list — an orphan epoch dir
    from a torn run is invisible until its manifest lands. A shard whose
    SIZE changed since it was manifested raises (shards are immutable by
    the WebDataset contract; in-place mutation means upstream corruption,
    not new data).

    All bookkeeping goes through the Hadoop FileSystem API
    (plans/fsio.py), so shard_dir/state_dir may live on any URI scheme
    Spark can reach. Returns {'n_new_shards', 'n_new_images', 'epoch',
    'table'} — 'table' is the full snapshot DataFrame across committed
    epochs (None while empty)."""
    import fnmatch

    from ..plans.fsio import HadoopFS

    # separate FS handles: shard_dir and state_dir may live on different
    # URI schemes (crawl bucket vs warehouse)
    with HadoopFS(spark, state_dir) as fs, HadoopFS(spark, shard_dir) as sfs:
        fs.mkdirs(state_dir)
        man_path = fs.join(state_dir, "_INGESTED.json")
        manifest = {"shards": {}, "epochs": []}
        if fs.exists(man_path):
            manifest = json.loads(fs.read_bytes(man_path).decode())

        seen: dict = manifest["shards"]
        # list_files yields basenames; re-root them under shard_dir
        listed = [
            (sfs.join(shard_dir, name), name, sz)
            for name, sz in sfs.list_files(shard_dir)
            if fnmatch.fnmatch(name, glob)
        ]
        for p, name, sz in listed:
            if name in seen and seen[name] != sz:
                raise TarShardError(
                    f"{p}: size changed since ingest ({seen[name]} -> {sz});"
                    " shards are immutable — this is corruption, not new data"
                )
        new = [(p, name, sz) for p, name, sz in listed if name not in seen]

        epoch = len(manifest["epochs"])
        table_dir = fs.join(state_dir, "images")
        n_new = 0
        if new:
            df = read_tar_shards(
                spark, [p for p, _, _ in new], glob=glob,
                max_shard_bytes=max_shard_bytes,
            )
            epoch_dir = fs.join(table_dir, f"epoch={epoch}")
            df.write.mode("overwrite").parquet(epoch_dir)
            n_new = spark.read.parquet(epoch_dir).count()
            for _, name, sz in new:
                seen[name] = sz
            manifest["epochs"].append(
                {"epoch": epoch, "shards": len(new), "images": n_new}
            )
            fs.write_bytes_atomic(
                man_path, json.dumps(manifest, sort_keys=True).encode()
            )

        committed = [
            fs.join(table_dir, f"epoch={e['epoch']}")
            for e in manifest["epochs"]
        ]
        table = (
            spark.read.option("basePath", table_dir).parquet(*committed)
            if committed
            else None
        )
        new_table = (
            spark.read.parquet(fs.join(table_dir, f"epoch={epoch}"))
            if new
            else None
        )
    return {
        "n_new_shards": len(new),
        "n_new_images": n_new,
        "epoch": epoch if new else epoch - 1,
        "table": table,
        # just this round's rows — the natural feed for
        # streaming.incremental.IncrementalDeduper.process_batch
        "new_table": new_table,
    }
