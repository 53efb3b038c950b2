"""Video near-dup lane: frame sampling → per-frame pHash → fused band
lane → video-pair scoring → clusters. Checked against the numpy pHash
twin, with layout invariance and the decode-seam error."""

import numpy as np
import pytest

from datasketches_cpp_spark.operators.sigkernel import SigConfig
from datasketches_cpp_spark.operators.videodedup import (
    dedup_videos,
    video_pairs,
    with_frame_phash,
)
from datasketches_cpp_spark.sources.images import phash64


def _frame(seed: int, w: int = 16, h: int = 16) -> np.ndarray:
    rng = np.random.default_rng(seed)
    # blocky structure so pHash is stable under small noise
    base = rng.integers(0, 256, (h // 4, w // 4, 3), dtype=np.uint8)
    return np.repeat(np.repeat(base, 4, axis=0), 4, axis=1)


def _video(frame_seeds, noise_seed=None, w: int = 16, h: int = 16) -> bytes:
    frames = [_frame(s, w, h) for s in frame_seeds]
    if noise_seed is not None:
        rng = np.random.default_rng(noise_seed)
        frames = [
            np.clip(f.astype(np.int16) + rng.integers(-2, 3, f.shape), 0, 255)
            .astype(np.uint8)
            for f in frames
        ]
    return b"".join(f.tobytes() for f in frames)


@pytest.fixture(scope="module")
def videos(spark):
    w = h = 16
    rows = [
        ("vidA", _video(range(8)), w, h, "rawv"),
        ("vidB", _video(range(8), noise_seed=99), w, h, "rawv"),  # near-dup of A
        ("vidC", _video(range(100, 108)), w, h, "rawv"),          # distinct
        ("vidD", _video(range(200, 204)), w, h, "rawv"),          # distinct, shorter
    ]
    return spark.createDataFrame(
        rows, "video_id string, bytes binary, w int, h int, fmt string"
    )


def test_frame_phash_matches_numpy_twin(spark, videos):
    from datasketches_cpp_spark.operators.multimodal import sample_frames

    frames = sample_frames(videos, every_k=2, id_col="video_id")
    got = {
        (r["video_id"], r["frame_idx"]): r["phash"]
        for r in with_frame_phash(frames, "video_id").collect()
    }
    assert len(got) == 8 // 2 * 3 + 4 // 2  # 4 per 8-frame video, 2 for vidD
    for (vid, fi), ph in got.items():
        seed = {"vidA": fi, "vidC": 100 + fi, "vidD": 200 + fi}.get(vid)
        if seed is None:
            continue  # vidB is the noisy twin, checked via pairing below
        exp = phash64(_frame(seed).reshape(1, -1).ravel(), 16, 16)
        assert ph == np.int64(np.uint64(exp)).item()


def test_dedup_videos_clusters_near_dups_only(spark, videos):
    cfg = SigConfig(phash_hamming=6)
    res = dedup_videos(videos, cfg, every_k=2, min_matching_frames=2)
    assign = {r["id"]: r["cluster_id"] for r in res["assignments"].collect()}
    assert set(assign) == {"vidA", "vidB", "vidC", "vidD"}
    assert assign["vidA"] == assign["vidB"] == "vidA"
    assert assign["vidC"] == "vidC"
    assert assign["vidD"] == "vidD"
    pairs = res["pairs"].collect()
    assert len(pairs) == 1
    assert (pairs[0]["video_a"], pairs[0]["video_b"]) == ("vidA", "vidB")
    assert pairs[0]["matched_frames"] >= 2


def test_video_pairs_min_frames_threshold(spark, videos):
    from datasketches_cpp_spark.operators.multimodal import sample_frames

    cfg = SigConfig(phash_hamming=6)
    ph = with_frame_phash(sample_frames(videos, every_k=2), "video_id")
    # raising the bar above the sampled-frame count kills the A-B pair
    none = video_pairs(ph, cfg, min_matching_frames=5)
    assert none.count() == 0


def test_dedup_videos_layout_invariant(spark, videos):
    cfg = SigConfig(phash_hamming=6)
    a = {
        r["id"]: r["cluster_id"]
        for r in dedup_videos(videos.repartition(1), cfg, every_k=2)[
            "assignments"
        ].collect()
    }
    b = {
        r["id"]: r["cluster_id"]
        for r in dedup_videos(videos.repartition(7), cfg, every_k=2)[
            "assignments"
        ].collect()
    }
    assert a == b


def test_container_codec_seam_raises(spark):
    df = spark.createDataFrame(
        [("v", b"\x00" * 100, 4, 4, "mp4")],
        "video_id string, bytes binary, w int, h int, fmt string",
    )
    from py4j.protocol import Py4JJavaError
    from datasketches_cpp_spark.operators.multimodal import sample_frames

    with pytest.raises((Py4JJavaError, Exception), match="NotImplementedError|codec"):
        sample_frames(df, every_k=1).collect()


def test_avi_container_matches_rawv_lane(spark):
    """Uncompressed-AVI containers (operators/avicodec.py) flow through
    sample_frames identically to the same frames shipped as rawv: the
    round-4 closure of part of the av-container seam."""
    import numpy as np

    from datasketches_cpp_spark.operators.avicodec import (
        AviError,
        decode_avi,
        encode_avi,
    )
    from datasketches_cpp_spark.operators.multimodal import sample_frames

    rng = np.random.default_rng(5)
    w, h, n = 18, 12, 6  # w*3 not divisible by 4 -> exercises DIB stride pad
    rawv = rng.integers(0, 256, n * h * w * 3, dtype=np.uint8).tobytes()
    avi = encode_avi(rawv, w, h, n)
    back, dw, dh, dn = decode_avi(avi)
    assert (dw, dh, dn) == (w, h, n) and back == rawv  # lossless round-trip
    rows = [
        ("v_avi", bytearray(avi), w, h, "avi"),
        ("v_raw", bytearray(rawv), w, h, "rawv"),
    ]
    df = spark.createDataFrame(
        rows, "video_id string, bytes binary, w int, h int, fmt string"
    )
    got = {}
    for r in sample_frames(df, every_k=2).collect():
        got.setdefault(r["video_id"], []).append((r["frame_idx"], bytes(r["bytes"])))
    assert sorted(got["v_avi"]) == sorted(got["v_raw"])
    assert len(got["v_raw"]) == 3
    # fail-fast seams
    with pytest.raises(AviError, match="RIFF"):
        decode_avi(b"junk")
    with pytest.raises(Exception, match="mp4|codec"):
        sample_frames(
            spark.createDataFrame(
                [("x", b"\x00" * 64, 2, 2, "mp4")],
                "video_id string, bytes binary, w int, h int, fmt string",
            )
        ).collect()


def test_mjpeg_avi_container(spark):
    """MJPEG-in-AVI ('MJPG' fourcc, DHT-less baseline JPEG per '00dc'
    chunk): decodes within the repo's 40 dB PSNR gate and flows through
    sample_frames with per-frame pHash within a small hamming radius of
    the rawv twin — the compressed half of the AVI seam, closed by
    reusing operators/jpegcodec.py."""
    from datasketches_cpp_spark.operators.avicodec import (
        AviError,
        decode_avi,
        encode_avi,
    )
    from datasketches_cpp_spark.operators.jpegcodec import with_default_huffman
    from datasketches_cpp_spark.operators.multimodal import sample_frames

    w = h = 16
    rawv = _video(range(6), w=w, h=h)
    avi = encode_avi(rawv, w, h, 6, codec="mjpg")
    back, dw, dh, dn = decode_avi(avi)
    assert (dw, dh, dn) == (w, h, 6)
    a = np.frombuffer(rawv, np.uint8).astype(np.float64)
    b = np.frombuffer(back, np.uint8).astype(np.float64)
    psnr = 10 * np.log10(255.0**2 / ((a - b) ** 2).mean())
    assert psnr >= 40.0, psnr

    # written frames follow the DHT-less MJPG convention
    import struct

    i = avi.find(b"00dc")
    sz = struct.unpack_from("<I", avi, i + 4)[0]
    frame = avi[i + 8 : i + 8 + sz]
    assert with_default_huffman(frame) != frame

    # end-to-end: sampled-frame pHashes track the rawv lane's
    rows = [
        ("v_mjpg", bytearray(avi), w, h, "avi"),
        ("v_raw", bytearray(rawv), w, h, "rawv"),
    ]
    df = spark.createDataFrame(
        rows, "video_id string, bytes binary, w int, h int, fmt string"
    )
    got = {}
    for r in sample_frames(df, every_k=2).collect():
        got.setdefault(r["video_id"], {})[r["frame_idx"]] = bytes(r["bytes"])
    assert sorted(got["v_mjpg"]) == sorted(got["v_raw"]) == [0, 2, 4]
    for fi in got["v_raw"]:
        pa = phash64(np.frombuffer(got["v_raw"][fi], np.uint8), w, h)
        pb = phash64(np.frombuffer(got["v_mjpg"][fi], np.uint8), w, h)
        assert bin(pa ^ pb).count("1") <= 6

    # header/frame dimension mismatch fails fast
    bad = bytearray(avi)
    strf = bad.find(b"strf")
    struct.pack_into("<i", bad, strf + 8 + 4, w + 8)  # biWidth lies
    with pytest.raises(AviError, match="stream header"):
        decode_avi(bytes(bad))


def test_avi_audio_stream_first_and_rec_list():
    """AVI stream-ordinal regression: when an audio strl is declared
    before the video strl, video data chunks are '01db' (not '00db') and
    interleaved files group them under 'rec ' LISTs — both must decode,
    with pixels identical to the plain single-stream layout."""
    import struct

    import numpy as np

    from datasketches_cpp_spark.operators.avicodec import (
        decode_avi,
        encode_avi,
    )

    rng = np.random.default_rng(21)
    frame = rng.integers(0, 256, (2, 8, 3), np.uint8)  # h=2, w=8
    rawv = frame.tobytes()
    ref, w, h, n = decode_avi(encode_avi(rawv, 8, 2, 1))
    assert (w, h, n) == (8, 2, 1)

    def chunk(cc, body):
        return cc + struct.pack("<I", len(body)) + body + (b"\x00" * (len(body) & 1))

    def lst(kind, body):
        return chunk(b"LIST", kind + body)

    # 24-bit DIB: bottom-up rows, BGR, stride 8*3=24 (already word-aligned)
    dib = frame[::-1, :, ::-1].tobytes()
    strh_auds = chunk(b"strh", b"auds" + b"\x00" * 52)
    strh_vids = chunk(b"strh", b"vids" + b"\x00" * 52)
    bih = struct.pack("<IiiHHI", 40, 8, 2, 1, 24, 0) + b"\x00" * 20
    strf_vids = chunk(b"strf", bih)
    hdrl = lst(b"hdrl", lst(b"strl", strh_auds) + lst(b"strl", strh_vids + strf_vids))
    movi = lst(b"movi", lst(b"rec ", chunk(b"01db", dib)))
    body = b"AVI " + hdrl + movi
    buf = b"RIFF" + struct.pack("<I", len(body)) + body
    got, w2, h2, n2 = decode_avi(buf)
    assert (w2, h2, n2) == (8, 2, 1)
    assert got == ref
