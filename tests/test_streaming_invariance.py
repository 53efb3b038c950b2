"""Streaming twins of the batch pHash invariance flags
(streaming/incremental.IncrementalDeduper rotation_invariant /
crop_invariant): originals ingested in one epoch, padded or rotated
copies arriving in a LATER epoch, must still cluster — the key store
holds the transformed hashes, so cross-epoch probes match under the
same laws as the batch lane (imagededup.dedup_images).
"""

import numpy as np
import pandas as pd

from datasketches_cpp_spark.operators.sigkernel import SigConfig
from datasketches_cpp_spark.sources.images import phash64
from datasketches_cpp_spark.streaming.incremental import IncrementalDeduper

W = H = 64
CFG = SigConfig(phash_hamming=6)


def _img(seed):
    small = np.random.default_rng(seed).integers(0, 256, (8, 8, 3), np.uint8)
    return np.repeat(np.repeat(small, 8, axis=0), 8, axis=1)


def _row(iid, px, cap):
    px = np.ascontiguousarray(px)
    h, w = px.shape[0], px.shape[1]
    return {
        "image_id": iid, "bytes": px.tobytes(), "w": w, "h": h,
        "fmt": "raw", "caption": cap,
        "phash": int(np.int64(np.uint64(phash64(px.reshape(-1), w, h)))),
    }


def _pad(px, m, color):
    h, w = px.shape[0], px.shape[1]
    out = np.full((h + 2 * m, w + 2 * m, 3), color, np.uint8)
    out[m : m + h, m : m + w] = px
    return out


def _assignments(dd):
    return {r["id"]: r["cluster_id"] for r in dd.assignments().collect()}


def test_streaming_crop_invariant_cross_epoch(spark, tmp_path):
    rng = np.random.default_rng(31)
    orig, pads = [], []
    for i in range(8):
        px = _img(7000 + i)
        orig.append(_row(f"so{i:02d}", px, f"stream cap {i}"))
        noisy = np.clip(
            px.astype(np.int16) + rng.integers(-1, 2, px.shape), 0, 255
        ).astype(np.uint8)
        pads.append(_row(f"sp{i:02d}", _pad(noisy, 12, 30 + i),
                         f"stream pad cap {i}"))
    with IncrementalDeduper(
        spark, str(tmp_path / "state"), CFG, enable_lanes=("phash",),
        crop_invariant=True,
    ) as dd:
        dd.process_batch(spark.createDataFrame(pd.DataFrame(orig)), 0)
        dd.process_batch(spark.createDataFrame(pd.DataFrame(pads)), 1)
        got = _assignments(dd)
    for i in range(8):
        assert got[f"sp{i:02d}"] == got[f"so{i:02d}"], i

    # contrast: without the flag the padded copies stay separate
    with IncrementalDeduper(
        spark, str(tmp_path / "state_off"), CFG, enable_lanes=("phash",),
    ) as dd:
        dd.process_batch(spark.createDataFrame(pd.DataFrame(orig)), 0)
        dd.process_batch(spark.createDataFrame(pd.DataFrame(pads)), 1)
        got_off = _assignments(dd)
    missed = sum(got_off[f"sp{i:02d}"] != got_off[f"so{i:02d}"] for i in range(8))
    assert missed == 8


def test_streaming_rotation_invariant_cross_epoch(spark, tmp_path):
    rng = np.random.default_rng(32)
    orig, rots = [], []
    for i in range(8):
        px = _img(7100 + i)
        orig.append(_row(f"ro{i:02d}", px, f"stream rot cap {i}"))
        t = np.rot90(px, 1 + i % 3, axes=(0, 1))
        noisy = np.clip(
            t.astype(np.int16) + rng.integers(-1, 2, t.shape), 0, 255
        ).astype(np.uint8)
        rots.append(_row(f"rt{i:02d}", noisy, f"stream rot twin {i}"))
    with IncrementalDeduper(
        spark, str(tmp_path / "state"), CFG, enable_lanes=("phash",),
        rotation_invariant=True,
    ) as dd:
        dd.process_batch(spark.createDataFrame(pd.DataFrame(orig)), 0)
        dd.process_batch(spark.createDataFrame(pd.DataFrame(rots)), 1)
        got = _assignments(dd)
    for i in range(8):
        assert got[f"rt{i:02d}"] == got[f"ro{i:02d}"], i
