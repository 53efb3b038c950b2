"""MPEG audio (MP3) frame parser + compressed-domain dedup lanes:
header/table arithmetic, tag invariance, resync, and the Spark lanes
(dedup_mp3 / mp3_containment) on planted corpora — the codec-seam
discipline of audiocodec/flaccodec applied to the parse-only format."""

from __future__ import annotations

import numpy as np
import pytest

from datasketches_cpp_spark.operators.mp3parse import (
    Mp3Error,
    dedup_mp3,
    excerpt_frames,
    frame_hashes,
    mp3_containment,
    mp3_frame_landmarks,
    mp3_stream_meta,
    parse_frames,
    stream_info,
    strip_tags,
    synth_mp3_stream,
    with_id3v1,
    with_id3v2,
)


def test_frame_walk_mpeg1_layer3():
    """MPEG1 Layer III 128 kbps 44.1 kHz: frame length 144*128000/44100
    = 417 (+1 padded). The walk must recover every frame boundary."""
    buf = synth_mp3_stream(20, seed=3, pad_pattern=True)
    p = parse_frames(buf)
    assert len(p["offsets"]) == 20
    assert p["sample_rate"] == 44100 and p["layer"] == 1 and p["version"] == 3
    lens = set(p["lengths"].tolist())
    assert lens == {417, 418}
    # frames tile the stream exactly
    assert p["offsets"][0] == 0
    assert (np.diff(p["offsets"]) == p["lengths"][:-1]).all()
    assert int(p["offsets"][-1] + p["lengths"][-1]) == len(buf)


@pytest.mark.parametrize(
    "version,layer,br_idx,sr_idx,expect_len,expect_sr",
    [
        (3, 3, 9, 1, 288, 48000),   # MPEG1 Layer I 288 kbps? -> (12*288000/48000)*4
        (3, 2, 9, 0, 522, 44100),   # MPEG1 Layer II 160 kbps
        (2, 1, 9, 0, 261, 22050),   # MPEG2 Layer III 80 kbps, 72*80000/22050
        (0, 1, 5, 2, 360, 8000),    # MPEG2.5 Layer III 40 kbps, 72*40000/8000
    ],
)
def test_frame_lengths_across_versions(version, layer, br_idx, sr_idx, expect_len, expect_sr):
    buf = synth_mp3_stream(
        4, seed=1, version=version, layer=layer, br_idx=br_idx, sr_idx=sr_idx
    )
    p = parse_frames(buf)
    assert len(p["offsets"]) == 4
    assert p["sample_rate"] == expect_sr
    assert set(p["lengths"].tolist()) == {expect_len}


def test_stream_info_duration():
    """MPEG1 Layer III: 1152 samples/frame; 50 frames @44.1k =
    1.306... s. MPEG2: 576/frame."""
    buf = synth_mp3_stream(50, seed=2)
    info = stream_info(buf)
    assert info["n_frames"] == 50
    assert info["layer"] == 3 and info["mpeg1"]
    assert info["duration_sec"] == pytest.approx(50 * 1152 / 44100)
    assert info["bitrate_kbps_mean"] == 128.0
    assert not info["is_vbr"]
    b2 = synth_mp3_stream(50, seed=2, version=2)
    assert stream_info(b2)["duration_sec"] == pytest.approx(50 * 576 / 22050)


def test_tag_stripping_and_invariance():
    base = synth_mp3_stream(12, seed=7)
    tagged = with_id3v1(with_id3v2(base, tag_bytes=300))
    body, v2, v1 = strip_tags(tagged)
    assert v2 == 310 and v1 and body == base
    # the content fingerprint is identical across tag wrappers
    assert np.array_equal(frame_hashes(base), frame_hashes(tagged))
    assert len(frame_hashes(base)) == 12
    info = stream_info(tagged)
    assert info["id3v2_bytes"] == 310 and info["id3v1"]
    assert info["n_frames"] == 12


def test_resync_over_junk():
    """Leading junk and inter-frame garbage are resynced past; frame
    hashes of the surviving frames match the clean stream's."""
    base = synth_mp3_stream(8, seed=9)
    p0 = parse_frames(base)
    cut = int(p0["offsets"][4])
    junky = b"\x00\x12garbage\xfe" + base[:cut] + b"\x01\x02\x03" + base[cut:]
    p = parse_frames(junky)
    assert len(p["offsets"]) == 8
    assert p["junk_bytes"] == 13
    assert np.array_equal(frame_hashes(junky), frame_hashes(base))


def test_excerpt_is_contiguous_hash_subsequence():
    base = synth_mp3_stream(30, seed=11)
    exc = excerpt_frames(base, 10, 8)
    hb = frame_hashes(base)
    he = frame_hashes(exc)
    assert len(he) == 8
    assert np.array_equal(he, hb[10:18])


def test_free_format_and_garbage_raise():
    with pytest.raises(Mp3Error):
        parse_frames(b"\x00" * 64)
    # free-format header: valid sync, bitrate index 0
    hdr = bytes((0xFF, 0xFB, 0x02, 0x44))
    with pytest.raises(Mp3Error):
        parse_frames(hdr + b"\x00" * 100)


def test_audiocodec_seam_still_raises_for_mp3():
    from datasketches_cpp_spark.operators.audiocodec import to_pcm16

    with pytest.raises(NotImplementedError):
        to_pcm16(synth_mp3_stream(2), "mp3")


@pytest.fixture(scope="module")
def mp3_corpus(spark):
    base = synth_mp3_stream(40, seed=21)
    other = synth_mp3_stream(40, seed=22)
    rows = [
        ("m_base", base),
        ("m_retag", with_id3v1(with_id3v2(base, tag_bytes=128, seed=5), seed=6)),
        ("m_excerpt", excerpt_frames(base, 12, 10)),
        ("m_other", other),
        ("m_concat", excerpt_frames(base, 0, 6) + excerpt_frames(other, 0, 6)),
    ]
    return spark.createDataFrame(rows, "audio_id string, bytes binary")


def test_mp3_stream_meta_spark(mp3_corpus):
    meta = {r.id: r for r in mp3_stream_meta(mp3_corpus).collect()}
    assert meta["m_base"].n_frames == 40
    assert meta["m_retag"].n_frames == 40 and meta["m_retag"].id3v1
    assert meta["m_excerpt"].n_frames == 10
    assert meta["m_concat"].n_frames == 12
    assert meta["m_base"].sample_rate == 44100


def test_dedup_mp3_planted(mp3_corpus):
    """Retag + excerpt + concat all cluster with the base encode; the
    unrelated stream stays apart (it shares 6 frames with m_concat, which
    chains it in — so run with min_shared above that to split, and at a
    low threshold to verify chaining)."""
    out = dedup_mp3(mp3_corpus, min_shared=8)
    asg = {r.id: r.cluster_id for r in out["assignments"].collect()}
    assert asg["m_base"] == asg["m_retag"] == asg["m_excerpt"]
    assert asg["m_other"] != asg["m_base"]
    # m_concat shares only 6 frames with each parent -> below min_shared
    assert asg["m_concat"] != asg["m_base"]
    chained = dedup_mp3(mp3_corpus, min_shared=4)
    asg2 = {r.id: r.cluster_id for r in chained["assignments"].collect()}
    # concat bridges base and other into one component
    assert asg2["m_base"] == asg2["m_concat"] == asg2["m_other"]


def test_mp3_containment_offset(mp3_corpus):
    """The excerpt (frames 12..21 of m_base) must be located at frame
    offset 12, tag-invariantly (also inside the retagged copy)."""
    out = {
        (r.clip_id, r.track_id): (r.aligned_anchors, r.frame_offset)
        for r in mp3_containment(mp3_corpus, min_aligned=4).collect()
    }
    assert out[("m_excerpt", "m_base")] == (10, 12)
    assert out[("m_excerpt", "m_retag")] == (10, 12)
    assert ("m_excerpt", "m_other") not in out
    # concat contains the first 6 frames of both parents at offset -0? No:
    # clip must be SHORTER (track_span >= clip_span): concat(12) vs base(40)
    assert out[("m_concat", "m_base")][1] == 0


def test_mp3_frame_landmarks_schema(mp3_corpus):
    lm = mp3_frame_landmarks(mp3_corpus)
    assert [f.name for f in lm.schema.fields] == ["audio_id", "landmark", "t"]
    counts = {r.audio_id: r.n for r in lm.groupBy("audio_id").agg(
        __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("n")
    ).collect()}
    assert counts["m_base"] == 40 and counts["m_excerpt"] == 10


def test_midstream_free_format_lookalike_resyncs():
    """Junk bytes that happen to form a valid sync with bitrate index 0
    (a free-format header lookalike) mid-stream must be RESYNCED past
    like any other invalid header, not abort the whole stream — one
    recoverable real-world file must never kill a Spark task."""
    buf = synth_mp3_stream(8, seed=5)
    info = parse_frames(buf)
    cut = int(info["offsets"][4])
    junk = bytes([0xFF, 0xFB, 0x00, 0x44])  # sync ok, br_idx=0
    dirty = buf[:cut] + junk + buf[cut:]
    got = parse_frames(dirty)
    assert len(got["offsets"]) == len(info["offsets"])
    assert got["junk_bytes"] == info["junk_bytes"] + len(junk)
    # a stream that is ONLY free-format lookalikes still raises the seam
    with pytest.raises(Mp3Error, match="free-format"):
        parse_frames(junk * 30)


def test_crc_protected_xing_detected():
    """Xing after the 2-byte CRC (protection_bit=0): the VBR tag offset
    must account for the CRC or a CRC-protected VBR file reads as CBR."""
    buf = bytearray(synth_mp3_stream(6, seed=9))
    info = parse_frames(buf)
    off = int(info["offsets"][0])
    # flip frame 0 to CRC-protected and plant Xing at 4 + 2 + side
    buf[off + 1] &= 0xFE
    side = 17 if ((buf[off + 3] >> 6) & 0x03) == 3 else 32
    tag = off + 4 + 2 + side
    buf[tag:tag + 4] = b"Xing"
    got = parse_frames(bytes(buf))
    assert got["has_vbr_header"] is True
