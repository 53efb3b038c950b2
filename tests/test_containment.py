"""Excerpt/containment detection tests: video clip-in-video
(operators/videodedup.video_containment) and audio clip-in-track
(operators/audiodedup.audio_containment), both on planted corpora with
truth known by construction."""

import numpy as np
import pytest

from datasketches_cpp_spark.operators.minhash import SigConfig


def _frame(seed: int, w: int, h: int) -> np.ndarray:
    g = np.random.default_rng(seed)
    base = g.integers(0, 256, (h // 4, w // 4, 3), dtype=np.uint8)
    return np.repeat(np.repeat(base, 4, axis=0), 4, axis=1)


def _video(seeds, w, h, noise_seed=None) -> bytes:
    out = []
    gn = np.random.default_rng(noise_seed) if noise_seed is not None else None
    for s in seeds:
        f = _frame(s, w, h)
        if gn is not None:
            f = np.clip(
                f.astype(np.int16) + gn.integers(-2, 3, f.shape), 0, 255
            ).astype(np.uint8)
        out.append(f.tobytes())
    return b"".join(out)


@pytest.fixture(scope="module")
def video_corpus(spark):
    w = h = 16
    rows = [
        # container A: frames 0..23 (seeds 100..123)
        ("long_a", _video(range(100, 124), w, h), w, h, "rawv"),
        # clip of A: frames 8..15 with pixel noise
        ("clip_a", _video(range(108, 116), w, h, noise_seed=1), w, h, "rawv"),
        # container B and an unrelated clip
        ("long_b", _video(range(500, 524), w, h), w, h, "rawv"),
        ("clip_x", _video(range(900, 908), w, h), w, h, "rawv"),
    ]
    return spark.createDataFrame(
        rows, "video_id string, bytes binary, w int, h int, fmt string"
    )


def test_video_containment_finds_planted_clip(spark, video_corpus):
    from datasketches_cpp_spark.operators.videodedup import video_containment

    res = video_containment(
        video_corpus, SigConfig(phash_hamming=6), min_match_frac=0.8
    ).collect()
    found = {(r["clip_id"], r["container_id"]): r for r in res}
    assert ("clip_a", "long_a") in found
    hit = found[("clip_a", "long_a")]
    assert hit["frame_offset"] == 8
    assert hit["aligned_frames"] >= 7  # 8 frames, noise may cost one
    assert hit["match_frac"] >= 0.8
    # no false containment: clip_x matches nothing, long_b contains nothing
    assert all(
        k in (("clip_a", "long_a"),) or k[0] not in ("clip_x",)
        for k in found
    )
    assert ("clip_x", "long_a") not in found
    assert ("clip_x", "long_b") not in found
    # a 24-frame container is never "contained" in an 8-frame clip
    assert ("long_a", "clip_a") not in found


def test_video_containment_twins_both_orientations(spark):
    from datasketches_cpp_spark.operators.videodedup import video_containment

    w = h = 16
    rows = [
        ("t1", _video(range(10, 18), w, h), w, h, "rawv"),
        ("t2", _video(range(10, 18), w, h, noise_seed=2), w, h, "rawv"),
    ]
    df = spark.createDataFrame(
        rows, "video_id string, bytes binary, w int, h int, fmt string"
    )
    res = video_containment(df, SigConfig(phash_hamming=6)).collect()
    keys = {(r["clip_id"], r["container_id"]) for r in res}
    assert keys == {("t1", "t2"), ("t2", "t1")}
    assert all(r["frame_offset"] == 0 for r in res)


def _tone_frames(bins_per_frame, window=1024) -> bytes:
    """One deterministic tone mix per frame (bin-exact, so landmarks are
    hand-predictable across excerpt offsets)."""
    out = []
    t = np.arange(window)
    for bins in bins_per_frame:
        x = sum(
            a * np.sin(2 * np.pi * b * t / window)
            for b, a in zip(bins, (1.0, 0.8, 0.6))
        )
        out.append((np.clip(x, -1, 1) * 20000).astype("<i2").tobytes())
    return b"".join(out)


@pytest.fixture(scope="module")
def audio_corpus(spark):
    # 24-frame track with per-frame distinct spectra; clip = frames 10..17
    frame_bins = [(30 + 11 * i, 130 + 7 * i, 260 + 5 * i) for i in range(24)]
    rows = [
        ("track", _tone_frames(frame_bins), "pcm16"),
        ("clip", _tone_frames(frame_bins[10:18]), "pcm16"),
        ("other", _tone_frames([(37 + 13 * i, 171 + 9 * i, 301 + 3 * i)
                                for i in range(8)]), "pcm16"),
    ]
    return spark.createDataFrame(rows, "audio_id string, bytes binary, fmt string")


def test_audio_containment_finds_planted_excerpt(spark, audio_corpus):
    from datasketches_cpp_spark.operators.audiodedup import audio_containment

    res = audio_containment(audio_corpus, min_aligned=5).collect()
    found = {(r["clip_id"], r["track_id"]): r for r in res}
    assert ("clip", "track") in found
    assert found[("clip", "track")]["frame_offset"] == 10
    assert ("other", "track") not in found
    assert ("track", "clip") not in found  # track is longer than the clip


def test_audio_landmarks_timed_matches_untimed_sets(spark, audio_corpus):
    """Collapsing the timed landmarks to distinct sets must reproduce
    audio_landmarks exactly (same kernel, same hashes)."""
    from datasketches_cpp_spark.operators.audiodedup import (
        audio_landmarks,
        audio_landmarks_timed,
    )

    plain = {
        (r["audio_id"], r["landmark"])
        for r in audio_landmarks(audio_corpus).collect()
    }
    timed = {
        (r["audio_id"], r["landmark"])
        for r in audio_landmarks_timed(audio_corpus).collect()
    }
    assert plain == timed


def test_video_containment_layout_invariance(spark, video_corpus):
    from datasketches_cpp_spark.operators.videodedup import video_containment

    a = sorted(
        map(tuple, video_containment(
            video_corpus, SigConfig(phash_hamming=6)
        ).collect())
    )
    b = sorted(
        map(tuple, video_containment(
            video_corpus.repartition(7), SigConfig(phash_hamming=6)
        ).collect())
    )
    assert a == b


def test_audio_containment_half_window_offset_with_hop(spark):
    """An excerpt cut at a HALF-window boundary cannot be localized by
    non-overlapping frames (the true offset, 10.5 windows, is not an
    integer frame count — any whole-frame vote is wrong) but localizes
    exactly with hop=window//2 — the overlapping-STFT option."""
    from datasketches_cpp_spark.operators.audiodedup import audio_containment

    window = 1024
    # distinct white noise per half-window segment: dense spectra make
    # every hop position's peak set unique, so the true offset is the
    # ONLY coherent vote (tone fixtures are degenerate — a stationary
    # spectrum recurs at adjacent positions and ties the histogram;
    # verified offline: this fixture votes (14, dt=21) and nothing else)
    g = np.random.default_rng(99)
    hop = window // 2
    pcm = np.concatenate([g.normal(size=hop) for _ in range(48)])
    track = (np.clip(pcm / 4, -1, 1) * 20000).astype("<i2").tobytes()
    # clip = samples [10.5 windows, 18.5 windows) — half-window aligned
    half = window  # int16 bytes per half window = window (2 bytes/sample)
    clip = track[21 * half : 37 * half]
    rows = [("track", track, "pcm16"), ("clip", clip, "pcm16")]
    df = spark.createDataFrame(rows, "audio_id string, bytes binary, fmt string")

    hopped = audio_containment(
        df, hop=window // 2, min_aligned=5
    ).collect()
    found = {(r["clip_id"], r["track_id"]): r for r in hopped}
    assert ("clip", "track") in found
    # offset is in hop units: 10.5 windows = 21 half-windows
    assert found[("clip", "track")]["frame_offset"] == 21


def test_audio_hop_default_matches_nonoverlapping(spark, audio_corpus):
    """hop=None must reproduce the original non-overlapping framing
    exactly (same landmark rows)."""
    from datasketches_cpp_spark.operators.audiodedup import (
        audio_landmarks_timed,
    )

    a = sorted(
        map(tuple, audio_landmarks_timed(audio_corpus).collect())
    )
    b = sorted(
        map(tuple, audio_landmarks_timed(audio_corpus, hop=1024).collect())
    )
    assert a == b and len(a) > 0


# -- text containment ---------------------------------------------------------


def test_positioned_winnowing_matches_value_set(spark):
    """Collapsing positioned fingerprints to values must reproduce
    winnow_fingerprints exactly, and each pos must point at its fp."""
    from datasketches_cpp_spark.operators.textstats import (
        winnow_fingerprints,
        winnow_fingerprints_positioned,
    )

    rows = [
        ("d1", "the quick brown fox jumps over the lazy dog again and again"),
        ("d2", "pack my box with five dozen liquor jugs"),
        ("d3", "short"),
        ("d4", ""),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    plain = {
        (r["doc_id"], r["fp"]) for r in winnow_fingerprints(df).collect()
    }
    positioned = winnow_fingerprints_positioned(df).collect()
    assert {(r["doc_id"], r["fp"]) for r in positioned} == plain
    texts = dict(rows)
    for r in positioned:
        assert texts[r["doc_id"]][r["pos"] : r["pos"] + 8] == r["fp"]


def test_text_containment_finds_verbatim_inclusion(spark):
    from datasketches_cpp_spark.operators.textstats import text_containment

    quote = (
        "we hold these truths to be self evident that all models are "
        "wrong but some are useful in practice"
    )
    prefix = "as the committee report observed at length before concluding "
    container = prefix + quote + " which settled the matter for everyone"
    rows = [
        ("quote", quote),
        ("container", container),
        ("decoy", "completely unrelated text about marmalade recipes and "
                  "the correct ratio of sugar to fruit for a stable set"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    res = text_containment(df, min_match_frac=0.8).collect()
    found = {(r["clip_id"], r["container_id"]): r for r in res}
    assert ("quote", "container") in found
    hit = found[("quote", "container")]
    assert hit["char_offset"] == len(prefix)
    assert hit["match_frac"] == 1.0  # verbatim inclusion, positional guarantee
    assert ("decoy", "container") not in found
    assert ("container", "quote") not in found  # container is longer


def test_text_containment_edited_copy_scores_below_verbatim(spark):
    """A mid-quote edit breaks only the local fingerprints: the edited
    copy still localizes at the right offset but with match_frac < 1."""
    from datasketches_cpp_spark.operators.textstats import text_containment

    quote = (
        "the five boxing wizards jump quickly over seventeen lazy dogs "
        "while the band plays on through the night"
    )
    # same-length edit: a length-changing edit legitimately splits the
    # vote between the pre- and post-edit offsets (both are correct for
    # their segment); equal length keeps one global offset
    edited = quote.replace("seventeen", "eleventwo")
    assert len(edited) == len(quote)
    container = "intro section " + edited + " closing remarks"
    df = spark.createDataFrame(
        [("orig", quote), ("doc", container)], "doc_id string, text string"
    )
    res = text_containment(df, min_match_frac=0.5).collect()
    found = {(r["clip_id"], r["container_id"]): r for r in res}
    assert ("orig", "doc") in found
    hit = found[("orig", "doc")]
    assert 0.5 <= hit["match_frac"] < 1.0
    assert hit["char_offset"] == len("intro section ")
