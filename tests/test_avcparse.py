"""AVC/H.264 structure parsing (operators/avcparse): SPS exp-Golomb
round-trips against independently bit-written fixtures, avcC/stss/NAL
walking, remux/trim invariance of keyframe hashes, and the Spark
compressed-domain dedup + containment lanes."""

from __future__ import annotations

import numpy as np
import pytest

from datasketches_cpp_spark.operators.avcparse import (
    AvcError,
    avc_containment,
    avc_stream_info,
    avc_stream_meta,
    build_avcc,
    build_sps,
    decode_avc_sample,
    dedup_avc,
    iter_nals,
    keyframe_hashes,
    parse_avc_track,
    parse_avcc,
    parse_sps,
    remux,
    synth_avc1_mp4,
    trim_keyframe_aligned,
    _strip_emulation,
)


@pytest.mark.parametrize(
    "w,h,profile",
    [(640, 360, 66), (1920, 1080, 66), (1280, 720, 100), (854, 480, 100),
     (320, 240, 77), (176, 144, 66)],
)
def test_sps_roundtrip(w, h, profile):
    """parse_sps recovers the exact pixel dimensions the bit-writer
    encoded — including crop-encoded non-multiples of 16 (1080 = 1088-8,
    854 = 864-10) and high-profile chroma/bit-depth fields."""
    sps = build_sps(w, h, profile_idc=profile)
    p = parse_sps(sps)
    assert (p["width"], p["height"]) == (w, h)
    assert p["profile_idc"] == profile
    assert p["bit_depth_luma"] == 8 and p["chroma_format_idc"] == 1
    assert p["frame_mbs_only"]


def test_emulation_prevention_strip():
    assert _strip_emulation(b"\x00\x00\x03\x01") == b"\x00\x00\x01"
    assert _strip_emulation(b"\x00\x00\x03\x00\x00\x03") == b"\x00\x00\x00\x00"
    assert _strip_emulation(b"\x01\x02\x03") == b"\x01\x02\x03"


def test_avcc_roundtrip():
    sps = build_sps(640, 360)
    cfg = parse_avcc(build_avcc(sps))
    assert cfg["nal_length_size"] == 4
    assert cfg["sps"] == [sps]
    assert len(cfg["pps"]) == 1
    assert cfg["width"] == 640 and cfg["height"] == 360


def test_track_structure_and_nals():
    buf = synth_avc1_mp4(20, gop=8, seed=4)
    t = parse_avc_track(buf)
    assert t["n_samples"] == 20
    assert t["keyframes"].tolist() == [0, 8, 16]
    assert t["w"] == 640 and t["h"] == 360
    # NAL types: IDR (5) at gop heads, non-IDR (1) elsewhere
    offs, sizes = t["offsets"], t["sizes"]
    for i in (0, 8, 16):
        sample = buf[int(offs[i]):int(offs[i]) + int(sizes[i])]
        types = [ty for ty, _ in iter_nals(sample)]
        assert types == [5]
    sample = buf[int(offs[3]):int(offs[3]) + int(sizes[3])]
    assert [ty for ty, _ in iter_nals(sample)] == [1]
    info = avc_stream_info(buf)
    assert info["n_keyframes"] == 3 and info["profile_idc"] == 66


def test_remux_preserves_keyframe_hashes():
    base = synth_avc1_mp4(40, gop=8, seed=7, chunking=5)
    re = remux(base, chunking=3)
    assert re != base  # different container layout...
    k1, h1 = keyframe_hashes(base)
    k2, h2 = keyframe_hashes(re)
    assert np.array_equal(k1, k2) and np.array_equal(h1, h2)  # ...same content


def test_trim_is_hash_subsequence():
    base = synth_avc1_mp4(40, gop=8, seed=9)
    cut = trim_keyframe_aligned(base, 8, 24)  # samples 8..31
    kb, hb = keyframe_hashes(base)
    kc, hc = keyframe_hashes(cut)
    assert kc.tolist() == [0, 8, 16]
    assert np.array_equal(hc, hb[1:4])
    with pytest.raises(AvcError):
        trim_keyframe_aligned(base, 3, 8)  # not a keyframe


def test_non_avc_and_seam_raise():
    from datasketches_cpp_spark.operators.mp4codec import encode_mp4

    w = h = 16
    frames = np.zeros((2, h * w * 3), np.uint8).tobytes()
    jpeg_mp4 = encode_mp4(frames, w, h, 2, codec="raw")
    with pytest.raises(AvcError):
        parse_avc_track(jpeg_mp4)
    with pytest.raises(NotImplementedError):
        decode_avc_sample(b"")


@pytest.fixture(scope="module")
def avc_corpus(spark):
    base = synth_avc1_mp4(40, gop=8, seed=31)
    rows = [
        ("a_base", base),
        ("a_remux", remux(base, chunking=3)),
        ("a_trim", trim_keyframe_aligned(base, 8, 24)),
        ("a_other", synth_avc1_mp4(40, gop=8, seed=32)),
    ]
    return spark.createDataFrame(rows, "video_id string, bytes binary")


def test_avc_stream_meta_spark(avc_corpus):
    meta = {r.id: r for r in avc_stream_meta(avc_corpus).collect()}
    assert meta["a_base"].n_samples == 40 and meta["a_base"].n_keyframes == 5
    assert meta["a_remux"].n_samples == 40
    assert meta["a_trim"].n_samples == 24 and meta["a_trim"].n_keyframes == 3
    assert meta["a_base"].width == 640 and meta["a_base"].height == 360


def test_dedup_avc_planted(avc_corpus):
    out = dedup_avc(avc_corpus, min_shared=2)
    asg = {r.id: r.cluster_id for r in out["assignments"].collect()}
    assert asg["a_base"] == asg["a_remux"] == asg["a_trim"]
    assert asg["a_other"] != asg["a_base"]


def test_avc_containment_offsets(avc_corpus):
    out = {
        (r.clip_id, r.track_id): (r.aligned_anchors, r.frame_offset)
        for r in avc_containment(avc_corpus, min_aligned=2).collect()
    }
    assert out[("a_trim", "a_base")] == (3, 8)
    assert out[("a_trim", "a_remux")] == (3, 8)
    assert out[("a_base", "a_remux")] == (5, 0)
    assert out[("a_remux", "a_base")] == (5, 0)
    assert ("a_trim", "a_other") not in out
    assert len(out) == 4


def test_short_file_roundtrips():
    """Fixtures shorter than one full chunk (n_samples < chunking) must
    emit a single-run stsc the parser accepts — the two-runs-at-
    first_chunk=1 layout it used to write is invalid ISO-BMFF."""
    for n in (1, 2, 4):
        buf = synth_avc1_mp4(n, seed=n)
        t = parse_avc_track(buf)
        assert t["n_samples"] == n
    # trim down to a sub-chunk tail and re-parse
    buf = synth_avc1_mp4(9, seed=3)
    t = parse_avc_track(buf)
    k0 = int(t["keyframes"][-1])
    n_tail = t["n_samples"] - k0
    if 0 < n_tail < 5:
        short = trim_keyframe_aligned(buf, k0, n_tail)
        assert parse_avc_track(short)["n_samples"] == n_tail
