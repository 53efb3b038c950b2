"""Audio landmark lane: hand-computable landmark sets from pure sine
clips (bin-exact rFFT peaks), noise robustness, hot-landmark cap,
layout invariance, codec seam."""

import numpy as np
import pytest

from datasketches_cpp_spark.operators.audiodedup import (
    audio_landmarks,
    audio_pairs,
    dedup_audio,
)

WINDOW = 1024
FRAMES = 8


def _pcm(bins, amps, noise_seed=None) -> bytes:
    """PCM16 mono clip: FRAMES frames, each the same sum of sines at exact
    rFFT bin centers — so the per-frame peak set is exactly `bins`."""
    t = np.arange(FRAMES * WINDOW)
    x = sum(a * np.sin(2 * np.pi * b * t / WINDOW) for b, a in zip(bins, amps))
    if noise_seed is not None:
        x = x + np.random.default_rng(noise_seed).normal(0, 0.002, x.shape)
    return (np.clip(x, -1, 1) * 20000).astype("<i2").tobytes()


def _expected_landmarks(bins, fan_dt=3):
    out = set()
    for d in range(1, fan_dt + 1):
        for f1 in bins:
            for f2 in bins:
                out.add((f1 << 24) | (f2 << 8) | d)
    return out


@pytest.fixture(scope="module")
def clips(spark):
    rows = [
        ("a1", _pcm([50, 120, 300], [1.0, 0.8, 0.6]), "pcm16"),
        ("a2", _pcm([50, 120, 300], [1.0, 0.8, 0.6], noise_seed=5), "pcm16"),
        ("b1", _pcm([60, 130, 310], [1.0, 0.8, 0.6]), "pcm16"),
    ]
    return spark.createDataFrame(rows, "audio_id string, bytes binary, fmt string")


def test_landmarks_match_hand_oracle(spark, clips):
    got = {}
    for r in audio_landmarks(clips, window=WINDOW).collect():
        got.setdefault(r["audio_id"], set()).add(r["landmark"])
    assert got["a1"] == _expected_landmarks([50, 120, 300])
    assert got["b1"] == _expected_landmarks([60, 130, 310])
    # noisy twin keeps the identical constellation
    assert got["a2"] == got["a1"]


def test_dedup_audio_clusters(spark, clips):
    res = dedup_audio(clips, min_shared=8)
    assign = {r["id"]: r["cluster_id"] for r in res["assignments"].collect()}
    assert assign["a1"] == assign["a2"] == "a1"
    assert assign["b1"] == "b1"
    pairs = res["pairs"].collect()
    assert len(pairs) == 1
    assert pairs[0]["shared_landmarks"] == 27  # 3x3 peak pairs x 3 deltas


def test_hot_landmark_cap_drops_boilerplate(spark, clips):
    lm = audio_landmarks(clips, window=WINDOW)
    # cap of 1 makes every shared landmark "hot" -> no pairs at all
    assert audio_pairs(lm, max_ids_per_landmark=1).count() == 0


def test_layout_invariance(spark, clips):
    a = {r["id"]: r["cluster_id"]
         for r in dedup_audio(clips.repartition(1))["assignments"].collect()}
    b = {r["id"]: r["cluster_id"]
         for r in dedup_audio(clips.repartition(5))["assignments"].collect()}
    assert a == b


def test_codec_seam_raises(spark):
    df = spark.createDataFrame(
        [("x", b"\x00" * 4096, "mp3")], "audio_id string, bytes binary, fmt string"
    )
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        audio_landmarks(df).collect()


def test_subwindow_clip_yields_no_rows(spark):
    df = spark.createDataFrame(
        [("tiny", b"\x00" * 100, "pcm16")],
        "audio_id string, bytes binary, fmt string",
    )
    assert audio_landmarks(df).count() == 0
    # ...but still gets an assignment (its own singleton cluster)
    res = dedup_audio(df)
    assert [(r["id"], r["cluster_id"]) for r in res["assignments"].collect()] == [
        ("tiny", "tiny")
    ]


def test_landmark_params_validated(spark):
    """fan_dt/window outside the packed bit layout must raise, not
    silently overflow neighboring hash fields."""
    from datasketches_cpp_spark.operators.audiodedup import (
        audio_landmarks,
        audio_landmarks_timed,
    )

    df = spark.createDataFrame(
        [("a", bytearray(b"\x00" * 4096), "pcm16")],
        "audio_id string, bytes binary, fmt string",
    )
    with pytest.raises(ValueError, match="fan_dt"):
        audio_landmarks(df, fan_dt=300)
    with pytest.raises(ValueError, match="window"):
        audio_landmarks_timed(df, window=(1 << 17))
