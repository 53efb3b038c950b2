"""Incremental crop-containment probe (streaming/containment.py):
batch equivalence over the union corpus, both probe directions across
epochs, and replay idempotence."""

import numpy as np
import pytest

from datasketches_cpp_spark.operators.minhash import SigConfig
from datasketches_cpp_spark.streaming.containment import (
    IncrementalContainmentProbe,
)

CFG = SigConfig(phash_hamming=6)


def _image(seed: int, w: int, h: int, block: int = 8) -> np.ndarray:
    g = np.random.default_rng(seed)
    base = g.integers(0, 256, (h // block, w // block, 3), dtype=np.uint8)
    return np.repeat(np.repeat(base, block, axis=0), block, axis=1)


def _crop(big: np.ndarray, seed: int) -> np.ndarray:
    crop = big[16:80, 32:96]
    gn = np.random.default_rng(seed)
    return np.clip(
        crop.astype(np.int16) + gn.integers(-2, 3, crop.shape), 0, 255
    ).astype(np.uint8)


def _rows(ids_seeds, kind):
    out = []
    for iid, seed in ids_seeds:
        if kind == "big":
            out.append((iid, _image(seed, 128, 96).tobytes(), 128, 96, "raw"))
        else:
            out.append((iid, kind(seed).tobytes(), 64, 64, "raw"))
    return out


SCHEMA = "image_id string, bytes binary, w int, h int, fmt string"


@pytest.fixture(scope="module")
def union_rows():
    bigs = {f"big{i}": _image(100 + i, 128, 96) for i in range(4)}
    rows = [
        (k, v.tobytes(), 128, 96, "raw") for k, v in bigs.items()
    ]
    # crops of big0 and big2, plus a decoy
    rows.append(("crop0", _crop(bigs["big0"], 1).tobytes(), 64, 64, "raw"))
    rows.append(("crop2", _crop(bigs["big2"], 2).tobytes(), 64, 64, "raw"))
    rows.append(("decoy", _image(999, 64, 64).tobytes(), 64, 64, "raw"))
    return rows


def _batch_truth(spark, union_rows):
    from datasketches_cpp_spark.operators.imagecontainment import (
        image_containment,
    )

    df = spark.createDataFrame(union_rows, SCHEMA)
    return sorted(
        map(
            tuple,
            image_containment(
                df, CFG, tile=32, hop=16, min_match_frac=0.8
            ).collect(),
        )
    )


def test_incremental_equals_batch_and_covers_both_directions(
    spark, union_rows, tmp_path
):
    probe = IncrementalContainmentProbe(
        spark, str(tmp_path / "state"), CFG, tile=32, hop=16
    )
    # epoch 0: big0 + crop2's CONTAINER comes later (big2 in epoch 2),
    # so both directions are exercised: crop0 arrives after its
    # container, crop2 arrives before its container
    chunks = [
        union_rows[0:1] + [union_rows[5]],     # big0, crop2
        union_rows[1:2] + [union_rows[4]],     # big1, crop0
        union_rows[2:4] + [union_rows[6]],     # big2, big3, decoy
    ]
    for epoch, chunk in enumerate(chunks):
        probe.process_batch(spark.createDataFrame(chunk, SCHEMA), epoch)
    got = sorted(map(tuple, probe.hits().collect()))
    assert got == _batch_truth(spark, union_rows)
    pairs = {(r[0], r[1]) for r in got}
    assert ("crop0", "big0") in pairs  # clip arrived after container
    assert ("crop2", "big2") in pairs  # clip arrived before container
    probe.close()


def test_epoch_replay_is_idempotent(spark, union_rows, tmp_path):
    state = str(tmp_path / "state2")
    probe = IncrementalContainmentProbe(
        spark, state, CFG, tile=32, hop=16
    )
    chunk = spark.createDataFrame(
        union_rows[0:1] + [union_rows[4]], SCHEMA
    )
    probe.process_batch(chunk, 0)
    first = sorted(map(tuple, probe.hits().collect()))
    probe.close()
    # a restarted query replays epoch 0: must be a no-op
    probe2 = IncrementalContainmentProbe(
        spark, state, CFG, tile=32, hop=16
    )
    probe2.process_batch(chunk, 0)
    assert sorted(map(tuple, probe2.hits().collect())) == first
    assert len(first) == 1  # (crop0, big0)
    probe2.close()


def test_readstream_available_now(spark, union_rows, tmp_path):
    src = str(tmp_path / "drops")
    spark.createDataFrame(union_rows, SCHEMA).repartition(3).write.parquet(src)
    probe = IncrementalContainmentProbe(
        spark, str(tmp_path / "state3"), CFG, tile=32, hop=16
    )
    q = probe.start(
        src,
        spark.createDataFrame([], SCHEMA).schema,
        max_files_per_trigger=1,
    )
    q.awaitTermination(300)
    got = sorted(map(tuple, probe.hits().collect()))
    assert got == _batch_truth(spark, union_rows)
    probe.close()


def test_compact_all_preserves_tile_store_and_hits(spark, union_rows, tmp_path):
    """The inherited maintenance entrypoint (_BucketedStateStore via
    compact_all) folds the probe's tile store and leaves hits and a
    subsequent epoch's probing unchanged."""
    probe = IncrementalContainmentProbe(
        spark, str(tmp_path / "state"), CFG, tile=32, hop=16
    )
    chunks = [
        union_rows[0:1] + [union_rows[5]],
        union_rows[1:2] + [union_rows[4]],
    ]
    for epoch, chunk in enumerate(chunks):
        probe.process_batch(spark.createDataFrame(chunk, SCHEMA), epoch)
    before = sorted(map(tuple, probe.hits().collect()))
    rows_before = probe._read_bucketed("tile_keys").count()

    folded = probe.compact_all()
    assert folded.get("tile_keys") == 2
    assert probe._read_bucketed("tile_keys").count() == rows_before
    assert sorted(map(tuple, probe.hits().collect())) == before

    probe.process_batch(
        spark.createDataFrame(union_rows[2:4] + [union_rows[6]], SCHEMA), 2
    )
    assert sorted(map(tuple, probe.hits().collect())) == _batch_truth(
        spark, union_rows
    )
    probe.close()
