"""WebDataset-style tar-shard ingest tests: writer/reader round-trip
against the synthetic generator's truth, format sniffing, header-only
dims, fail-fast seams, and pipeline equivalence (shard-ingested corpus
dedups to the same checksum as the parquet path)."""

from __future__ import annotations

import io
import json
import os
import tarfile

import numpy as np
import pandas as pd
import pytest

from datasketches_cpp_spark.operators.imagecodec import (
    ImageCodecError,
    encode,
    sniff_dims,
    sniff_format,
)
from datasketches_cpp_spark.sources.images import generate_images
from datasketches_cpp_spark.sources.tarshards import (
    TarShardError,
    _rows_from_shard,
    read_tar_shards,
    write_tar_shards,
)


def _rand_rgb(w, h, seed):
    return np.random.default_rng(seed).integers(
        0, 256, size=h * w * 3, dtype=np.int64
    ).astype(np.uint8)


# --------------------------------------------------------------------------
# sniffers


def test_sniff_format_and_dims_all_codecs():
    px = _rand_rgb(24, 16, 3)
    for fmt in ("png", "ppm", "bmp", "dct", "tiff"):
        buf = encode(px, 24, 16, fmt)
        assert sniff_format(buf) == fmt
        assert sniff_dims(buf, fmt) == (24, 16)
    # gif needs a small palette; jpeg via its own encoder
    pal = np.random.default_rng(0).integers(0, 256, (8, 3), np.int64).astype(np.uint8)
    gpx = pal[np.random.default_rng(1).integers(0, 8, 24 * 16)].reshape(-1)
    gbuf = encode(gpx, 24, 16, "gif")
    assert sniff_format(gbuf) == "gif"
    assert sniff_dims(gbuf, "gif") == (24, 16)
    from datasketches_cpp_spark.operators.jpegcodec import (
        encode_jpeg,
        encode_jpeg_progressive,
    )

    for jbuf in (encode_jpeg(px, 24, 16), encode_jpeg_progressive(px, 24, 16)):
        assert sniff_format(jbuf) == "jpeg"
        assert sniff_dims(jbuf, "jpeg") == (24, 16)
    assert sniff_format(px.tobytes()[:12]) is None or True  # raw: headerless
    with pytest.raises(ImageCodecError):
        sniff_dims(b"", "raw")


# --------------------------------------------------------------------------
# shard parsing (kernel level, no Spark)


def _mk_shard(members: list[tuple[str, bytes]]) -> bytes:
    bio = io.BytesIO()
    with tarfile.open(fileobj=bio, mode="w") as tf:
        for name, payload in members:
            info = tarfile.TarInfo(name)
            info.size = len(payload)
            tf.addfile(info, io.BytesIO(payload))
    return bio.getvalue()


def test_rows_from_shard_pairs_members():
    px = _rand_rgb(8, 8, 1)
    shard = _mk_shard(
        [
            ("a.png", encode(px, 8, 8, "png")),
            ("a.txt", b"caption a"),
            ("b.raw", px.tobytes()),
            ("b.json", json.dumps({"w": 8, "h": 8, "caption": "via json"}).encode()),
            ("notes.md", b"ignored sidecar"),
            ("orphan.txt", b"caption without an image"),
        ]
    )
    out = _rows_from_shard("s", shard)
    assert list(out["image_id"]) == ["a", "b"]
    assert list(out["fmt"]) == ["png", "raw"]
    assert out["caption"].tolist() == ["caption a", "via json"]
    assert (out["w"] == 8).all() and (out["h"] == 8).all()


def test_rows_from_shard_fail_fast():
    px = _rand_rgb(8, 8, 2)
    png = encode(px, 8, 8, "png")
    with pytest.raises(TarShardError, match="two image members"):
        _rows_from_shard("s", _mk_shard([("a.png", png), ("a.bmp", png)]))
    with pytest.raises(TarShardError, match="magic"):
        _rows_from_shard("s", _mk_shard([("a.gif", png)]))
    with pytest.raises(TarShardError, match="sidecar"):
        _rows_from_shard("s", _mk_shard([("a.raw", px.tobytes())]))


# --------------------------------------------------------------------------
# writer/reader round-trip at the Spark surface


def test_tar_shards_roundtrip(spark, tmp_path):
    d = str(tmp_path / "shards")
    paths = write_tar_shards(d, 300, seed=23, fmt="mixed", images_per_shard=120)
    assert len(paths) == 3
    assert os.path.exists(os.path.join(d, "images_truth.parquet"))
    got = (
        read_tar_shards(spark, d)
        .toPandas()
        .sort_values("image_id", ignore_index=True)
    )
    want, _ = generate_images(300, seed=23, fmt="mixed")
    want = want.sort_values("image_id", ignore_index=True)
    assert len(got) == 300
    assert (got["image_id"] == want["image_id"]).all()
    assert (got["caption"] == want["caption"]).all()
    assert (got["w"] == want["w"]).all() and (got["h"] == want["h"]).all()
    # ingest normalizes 'tif'->'tiff', 'jpg'->'jpeg'; the generator already
    # emits canonical names, so fmt matches exactly
    assert (got["fmt"] == want["fmt"]).all()
    # the recomputed pHash equals the generator's stored pHash (lossless
    # codecs -> decode-identity -> hash-identity)
    assert (got["phash"] == want["phash"]).all()
    for i in (0, 150, 299):
        assert bytes(got["bytes"].iloc[i]) == bytes(want["bytes"].iloc[i])


def test_tar_shards_determinism(tmp_path):
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    write_tar_shards(a, 60, seed=5, images_per_shard=50)
    write_tar_shards(b, 60, seed=5, images_per_shard=50)
    for fn in ("shard-00000.tar", "shard-00001.tar"):
        with open(os.path.join(a, fn), "rb") as fa, open(
            os.path.join(b, fn), "rb"
        ) as fb:
            assert fa.read() == fb.read(), fn


def test_tar_shards_size_guard(spark, tmp_path):
    d = str(tmp_path / "shards")
    write_tar_shards(d, 20, seed=7, images_per_shard=20)
    with pytest.raises(Exception, match="max_shard_bytes"):
        read_tar_shards(spark, d, max_shard_bytes=1024).toPandas()


def test_tar_ingest_feeds_pipeline(spark, tmp_path):
    """Shard-ingested corpus dedups to the SAME assignment checksum as
    the parquet-path corpus from the same seed — ingest is a pure
    re-representation."""
    from datasketches_cpp_spark.operators.dedup import SigConfig
    from datasketches_cpp_spark.operators.imagededup import dedup_images
    from datasketches_cpp_spark.plans.checkpoint import checksum

    d = str(tmp_path / "shards")
    write_tar_shards(d, 400, seed=31, fmt="mixed", images_per_shard=150)
    via_tar = read_tar_shards(spark, d)
    pdf, _ = generate_images(400, seed=31, fmt="mixed")
    via_pq = spark.createDataFrame(pdf)
    cfg = SigConfig()
    cks = []
    for images in (via_tar, via_pq):
        res = dedup_images(images, cfg)
        cks.append(checksum(res["assignments"], "id", "cluster_id"))
    assert cks[0] == cks[1]


# --------------------------------------------------------------------------
# incremental ingest


def test_incremental_ingest_epochs(spark, tmp_path):
    from datasketches_cpp_spark.sources.tarshards import incremental_ingest

    shards = str(tmp_path / "crawl")
    state = str(tmp_path / "state")
    write_tar_shards(shards, 100, seed=41, images_per_shard=50)

    r1 = incremental_ingest(spark, shards, state)
    assert (r1["n_new_shards"], r1["n_new_images"], r1["epoch"]) == (2, 100, 0)
    assert r1["table"].count() == 100

    # nothing new: no-op, table unchanged
    r2 = incremental_ingest(spark, shards, state)
    assert (r2["n_new_shards"], r2["n_new_images"]) == (0, 0)
    assert r2["table"].count() == 100

    # drop two more shards into the crawl dir (fresh ids via a writer to
    # a side dir, then move) — only they are read
    import shutil

    side = str(tmp_path / "side")
    write_tar_shards(side, 60, seed=77, images_per_shard=60)
    shutil.move(
        os.path.join(side, "shard-00000.tar"),
        os.path.join(shards, "shard-00002.tar"),
    )
    r3 = incremental_ingest(spark, shards, state)
    assert (r3["n_new_shards"], r3["n_new_images"], r3["epoch"]) == (1, 60, 1)
    got = r3["table"]
    assert got.count() == 160
    # both generations present, partitioned by their ingest epoch
    assert got.filter("fmt = 'tiff'").count() > 0
    assert got.filter("epoch = 0").count() == 100
    assert got.filter("epoch = 1").count() == 60
    # (both synthetic generations start at img000000000, so ids collide
    # across epochs by construction — the snapshot keys are (epoch, id))
    assert got.select("epoch", "image_id").distinct().count() == 160


def test_incremental_ingest_mutated_shard_fails(spark, tmp_path):
    from datasketches_cpp_spark.sources.tarshards import incremental_ingest

    shards = str(tmp_path / "crawl")
    state = str(tmp_path / "state")
    write_tar_shards(shards, 40, seed=3, images_per_shard=40)
    incremental_ingest(spark, shards, state)
    with open(os.path.join(shards, "shard-00000.tar"), "ab") as f:
        f.write(b"\x00" * 1024)
    with pytest.raises(TarShardError, match="immutable"):
        incremental_ingest(spark, shards, state)


def test_ingest_feeds_incremental_deduper(spark, tmp_path):
    """Continuous-crawl composition: each incremental_ingest round's
    new_table feeds IncrementalDeduper.process_batch; after two crawl
    drops the incremental assignments equal the one-shot batch dedup of
    the full shard-read corpus (any-order folding law), with ids
    disambiguated per epoch like a real crawl's shard-scoped keys."""
    from pyspark.sql import functions as F

    from datasketches_cpp_spark.operators.dedup import SigConfig
    from datasketches_cpp_spark.operators.imagededup import dedup_images
    from datasketches_cpp_spark.plans.checkpoint import checksum
    from datasketches_cpp_spark.sources.tarshards import incremental_ingest
    from datasketches_cpp_spark.streaming.incremental import IncrementalDeduper

    crawl = str(tmp_path / "crawl")
    state = str(tmp_path / "ingest_state")
    lanes = ("caption", "bytes", "phash")
    cfg = SigConfig()

    write_tar_shards(crawl, 150, seed=19, images_per_shard=150)
    with IncrementalDeduper(
        spark, str(tmp_path / "dd_state"), cfg, max_fanout=512,
        enable_lanes=lanes,
    ) as dd:
        def scoped(df, epoch):
            return df.withColumn(
                "image_id", F.concat(F.lit(f"e{epoch}/"), F.col("image_id"))
            ).drop("epoch")

        r = incremental_ingest(spark, crawl, state)
        dd.process_batch(scoped(r["new_table"], 0), 0)

        import shutil

        side = str(tmp_path / "side")
        write_tar_shards(side, 80, seed=53, images_per_shard=80)
        shutil.move(
            os.path.join(side, "shard-00000.tar"),
            os.path.join(crawl, "shard-00001.tar"),
        )
        r = incremental_ingest(spark, crawl, state)
        dd.process_batch(scoped(r["new_table"], 1), 1)

        got = checksum(dd.assignments(), "id", "cluster_id")
        full = r["table"]
        full_scoped = full.withColumn(
            "image_id",
            F.concat(F.lit("e"), F.col("epoch").cast("string"), F.lit("/"),
                     F.col("image_id")),
        ).drop("epoch")
        want = checksum(
            dedup_images(full_scoped, cfg, enable_lanes=lanes)["assignments"],
            "id", "cluster_id",
        )
    assert got == want


def test_nested_directory_members_are_path_keyed():
    """WebDataset keys are path-qualified: dir1/0001.jpg pairs with
    dir1/0001.txt and never with dir2/0001.txt; two same-basename images
    in different directories are distinct rows, not an error."""
    import io
    import tarfile

    from datasketches_cpp_spark.operators.imagecodec import encode_png
    from datasketches_cpp_spark.sources.tarshards import _rows_from_shard

    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, (8, 8, 3), np.uint8)
    img = encode_png(px.reshape(-1), 8, 8)
    bio = io.BytesIO()
    with tarfile.open(fileobj=bio, mode="w") as tf:
        for name, payload in [
            ("dir1/0001.png", img),
            ("dir1/0001.txt", b"caption one"),
            ("dir2/0001.png", img),
            ("dir2/0001.txt", b"caption two"),
        ]:
            ti = tarfile.TarInfo(name)
            ti.size = len(payload)
            tf.addfile(ti, io.BytesIO(payload))
    rows = _rows_from_shard("t.tar", bio.getvalue())
    assert sorted(rows["image_id"]) == ["dir1/0001", "dir2/0001"]
    got = dict(zip(rows["image_id"], rows["caption"]))
    assert got == {"dir1/0001": "caption one", "dir2/0001": "caption two"}
