"""Multimodal operator tests: real Spark plumbing (schemas, batch shapes,
narrow stages) over raw payloads; codec seams raise NotImplementedError."""

import numpy as np
import pandas as pd
import pytest

from datasketches_cpp_spark.operators.knn import brute_force_topk
from datasketches_cpp_spark.operators.multimodal import (
    audio_features,
    decode_stats,
    image_features,
    resize_images,
    sample_frames,
)
from datasketches_cpp_spark.sources.images import generate_images


@pytest.fixture(scope="module")
def images_df(spark):
    images, _ = generate_images(120, seed=5)
    return spark.createDataFrame(images).repartition(4).cache()


def test_decode_stats(spark, images_df):
    out = decode_stats(images_df).toPandas()
    assert len(out) == 120
    assert (out["n_pixels"] == 3 * out["w"] * out["h"]).all()
    assert ((out["px_min"] >= 0) & (out["px_max"] <= 255)).all()
    assert out["px_mean"].between(100, 155).all()  # uniform noise ≈ 127.5


def test_resize_roundtrip(spark, images_df):
    out = resize_images(images_df, 16, 16).toPandas()
    assert len(out) == 120
    assert (out["w"] == 16).all() and (out["h"] == 16).all()
    assert out["bytes"].map(len).eq(16 * 16 * 3).all()
    # identity resize reproduces the original buffer exactly
    same = resize_images(images_df.where("w = 32"), 32, 32).toPandas()
    orig = images_df.where("w = 32").select("image_id", "bytes").toPandas()
    merged = same.merge(orig, on="image_id", suffixes=("_r", "_o"))
    assert all(bytes(a) == bytes(b) for a, b in zip(merged["bytes_r"], merged["bytes_o"]))


def test_image_features_feed_knn(spark, images_df):
    feats = image_features(images_df, grid=8)
    pdf = feats.toPandas()
    assert pdf["features"].map(len).eq(64).all()
    norms = pdf["features"].map(lambda v: float(np.linalg.norm(v)))
    assert ((norms - 1.0).abs() < 1e-3).all()
    # plumbing composes with the ANN operator
    probes = feats.limit(3).withColumnRenamed("features", "embedding").withColumnRenamed("id", "vec_id")
    corpus = feats.withColumnRenamed("features", "embedding").withColumnRenamed("id", "vec_id")
    top = brute_force_topk(corpus, probes, "vec_id", "embedding", k=3)
    assert top.count() == 9


def test_sample_frames(spark):
    w = h = 8
    frame = np.arange(w * h * 3, dtype=np.uint8).tobytes()
    vid = b"".join(
        ((np.frombuffer(frame, np.uint8).astype(np.int32) + i) % 256)
        .astype(np.uint8)
        .tobytes()
        for i in range(25)
    )
    df = spark.createDataFrame(
        pd.DataFrame(
            {"video_id": ["v1"], "bytes": [vid], "w": [w], "h": [h], "fmt": ["rawv"]}
        )
    )
    out = sample_frames(df, every_k=10).toPandas().sort_values("frame_idx")
    assert out["frame_idx"].tolist() == [0, 10, 20]
    assert out["bytes"].map(len).eq(w * h * 3).all()
    # codec seam: container formats fail loudly
    df_mp4 = spark.createDataFrame(
        pd.DataFrame(
            {"video_id": ["v2"], "bytes": [b"xx"], "w": [w], "h": [h], "fmt": ["mp4"]}
        )
    )
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        sample_frames(df_mp4).collect()


def test_audio_features(spark):
    t = np.arange(48000, dtype=np.float32)
    sine = (np.sin(2 * np.pi * 440 * t / 48000) * 16384).astype("<i2")
    df = spark.createDataFrame(
        pd.DataFrame({"audio_id": ["a1"], "bytes": [sine.tobytes()], "fmt": ["pcm16"]})
    )
    out = audio_features(df, window=1024).toPandas()
    assert out["n_windows"].iloc[0] == 46
    rms = np.asarray(out["rms"].iloc[0])
    # sine RMS = amplitude/√2 = 0.5/1.414 ≈ 0.354
    assert np.allclose(rms, 0.3536, atol=0.01)
    zc = np.asarray(out["zero_crossings"].iloc[0])
    # 440 Hz at 48 kHz ⇒ ~18.8 crossings per 1024-sample window
    assert ((zc >= 16) & (zc <= 21)).all()


def test_image_features_smaller_than_grid(spark):
    """A 5x5 thumbnail must yield grid*grid features (edge-replicated),
    not crash the Arrow batch on an impossible reshape."""
    import numpy as np

    from datasketches_cpp_spark.operators.multimodal import image_features

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, 5 * 5 * 3, dtype=np.uint8)
    df = spark.createDataFrame(
        [("tiny", bytearray(px.tobytes()), 5, 5, "raw")],
        "image_id string, bytes binary, w int, h int, fmt string",
    )
    rows = image_features(df, grid=8).collect()
    assert len(rows) == 1 and len(rows[0]["features"]) == 64
    assert abs(sum(f * f for f in rows[0]["features"]) - 1.0) < 1e-5
