"""AVC (H.264) structure parsing inside ISO-BMFF — the avc1 twin of
operators/mp3parse.py: everything STRUCTURAL about real web video is
parsed for real (sample tables, sync-sample/keyframe maps, avcC decoder
configuration, SPS via exp-Golomb — profile/level/bit-depth/true pixel
dimensions including frame cropping, length-prefixed NAL walking), and
the dedup lanes work in the COMPRESSED domain; only entropy-decoding
slice data to pixels remains the documented seam (CABAC/CAVLC residual
decode + inter prediction is a full decoder, far beyond rederivable
spec tables, and unvalidatable here with no real encoder in the
sandbox).

Why compressed-domain is the 10^12-scale lane for video even more than
for audio: decode cost per video is seconds-to-minutes, and the dominant
duplication mass on the web is the SAME ENCODE remuxed (different
interleave/chunking — sample BYTES identical), trimmed at keyframes, or
concatenated. Per-keyframe content hashes detect all of that at
bytes-in/8-bytes-out cost. Distinct re-encodes need the pixel lane
(videodedup.py over decodable codecs) — compose, don't compete.

Spark shapes reuse the shared machinery: ``avc_keyframe_landmarks``
emits (id, landmark, t) with landmark = keyframe-sample content hash and
t = sample index, so pair scoring is audiodedup.audio_pairs and
trim/excerpt containment is audiodedup.containment_from_landmarks — the
same offset-vote family as audio/MP3/video/image containment.

Box-walk helpers are imported from mp4codec.py (one ISO-BMFF parser in
the repo); the fixture twin builds valid avc1 MP4s whose SPS bitstreams
are written bit-by-bit from the syntax (so the exp-Golomb parser is
tested against independently-constructed input, not against itself).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .mp4codec import Mp4Error, _find, _fullbox, _sample_table, _walk_boxes


class AvcError(Mp4Error):
    """Malformed or unsupported AVC structure (fail-fast seam)."""


# ---------------------------------------------------------------------------
# Exp-Golomb bit reader (SPS-sized inputs — plain ints, no numpy needed)
# ---------------------------------------------------------------------------


def _strip_emulation(rbsp: bytes) -> bytes:
    """Remove 00 00 03 emulation-prevention bytes (the 03 is an escape
    inserted by encoders so RBSP never contains a start-code prefix)."""
    return rbsp.replace(b"\x00\x00\x03", b"\x00\x00")


class _Bits:
    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0

    def u(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.d[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 32:
                raise AvcError("invalid exp-Golomb code")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)


_HIGH_PROFILES = frozenset(
    {100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135}
)


def parse_sps(sps: bytes) -> dict:
    """Parse a seq_parameter_set_rbsp (including the 1-byte NAL header)
    → profile/level/chroma/bit depth and TRUE pixel dimensions (macroblock
    grid minus frame cropping, with chroma-dependent crop units) — the
    ISO/IEC 14496-10 §7.3.2.1 syntax, fields beyond what we need are
    consumed positionally so the cropping window lands correctly."""
    if not sps or (sps[0] & 0x1F) != 7:
        raise AvcError("not an SPS NAL (type != 7)")
    b = _Bits(_strip_emulation(sps[1:]))
    profile_idc = b.u(8)
    b.u(8)  # constraint flags + reserved
    level_idc = b.u(8)
    b.ue()  # sps_id
    chroma_format_idc = 1
    bit_depth_luma = bit_depth_chroma = 8
    separate_colour_plane = 0
    if profile_idc in _HIGH_PROFILES:
        chroma_format_idc = b.ue()
        if chroma_format_idc == 3:
            separate_colour_plane = b.u(1)
        bit_depth_luma = b.ue() + 8
        bit_depth_chroma = b.ue() + 8
        b.u(1)  # qpprime_y_zero_transform_bypass
        if b.u(1):  # seq_scaling_matrix_present
            n_lists = 8 if chroma_format_idc != 3 else 12
            for i in range(n_lists):
                if b.u(1):  # seq_scaling_list_present[i]
                    size = 16 if i < 6 else 64
                    last, nxt = 8, 8
                    for _ in range(size):
                        if nxt != 0:
                            nxt = (last + b.se() + 256) % 256
                        last = nxt if nxt else last
    b.ue()  # log2_max_frame_num_minus4
    poc_type = b.ue()
    if poc_type == 0:
        b.ue()  # log2_max_pic_order_cnt_lsb_minus4
    elif poc_type == 1:
        b.u(1)
        b.se()
        b.se()
        for _ in range(b.ue()):
            b.se()
    b.ue()  # max_num_ref_frames
    b.u(1)  # gaps_in_frame_num_value_allowed
    pic_width_in_mbs = b.ue() + 1
    pic_height_in_map_units = b.ue() + 1
    frame_mbs_only = b.u(1)
    if not frame_mbs_only:
        b.u(1)  # mb_adaptive_frame_field
    b.u(1)  # direct_8x8_inference
    crop_l = crop_r = crop_t = crop_b = 0
    if b.u(1):  # frame_cropping_flag
        crop_l, crop_r, crop_t, crop_b = b.ue(), b.ue(), b.ue(), b.ue()
    # crop units (§7.4.2.1.1): SubWidthC/SubHeightC by chroma format;
    # monochrome / 4:4:4-separate crop in luma samples
    if chroma_format_idc == 1:
        cw, ch = 2, 2
    elif chroma_format_idc == 2:
        cw, ch = 2, 1
    else:
        cw, ch = 1, 1
    if separate_colour_plane or chroma_format_idc == 0:
        cw, ch = 1, 1
    frame_height_mbs = (2 - frame_mbs_only) * pic_height_in_map_units
    width = pic_width_in_mbs * 16 - cw * (crop_l + crop_r)
    height = frame_height_mbs * 16 - ch * (2 - frame_mbs_only) * (crop_t + crop_b)
    return {
        "profile_idc": profile_idc,
        "level_idc": level_idc,
        "chroma_format_idc": chroma_format_idc,
        "bit_depth_luma": bit_depth_luma,
        "bit_depth_chroma": bit_depth_chroma,
        "width": width,
        "height": height,
        "frame_mbs_only": bool(frame_mbs_only),
    }


def parse_avcc(avcc: bytes) -> dict:
    """AVCDecoderConfigurationRecord (ISO 14496-15): NAL length-field
    size plus the parameter sets; the first SPS is parsed for stream
    properties."""
    if len(avcc) < 7 or avcc[0] != 1:
        raise AvcError("bad avcC (configurationVersion != 1)")
    nal_length_size = (avcc[4] & 0x03) + 1
    n_sps = avcc[5] & 0x1F
    pos = 6
    sps_list = []
    for _ in range(n_sps):
        (ln,) = struct.unpack_from(">H", avcc, pos)
        sps_list.append(avcc[pos + 2 : pos + 2 + ln])
        pos += 2 + ln
    n_pps = avcc[pos]
    pos += 1
    pps_list = []
    for _ in range(n_pps):
        (ln,) = struct.unpack_from(">H", avcc, pos)
        pps_list.append(avcc[pos + 2 : pos + 2 + ln])
        pos += 2 + ln
    if not sps_list:
        raise AvcError("avcC carries no SPS")
    return {
        "nal_length_size": nal_length_size,
        "sps": sps_list,
        "pps": pps_list,
        **parse_sps(sps_list[0]),
    }


def iter_nals(sample: bytes, nal_length_size: int = 4):
    """Yield (nal_type, nal_bytes) for a length-prefixed avc1 sample."""
    pos, n = 0, len(sample)
    while pos + nal_length_size <= n:
        ln = int.from_bytes(sample[pos : pos + nal_length_size], "big")
        pos += nal_length_size
        if ln == 0 or pos + ln > n:
            raise AvcError("NAL length field points past sample end")
        yield sample[pos] & 0x1F, sample[pos : pos + ln]
        pos += ln


# ---------------------------------------------------------------------------
# avc1 track extraction
# ---------------------------------------------------------------------------


def _parse_stss(buf: bytes, stbl_body: int, stbl_end: int):
    for cc, body, _be in _walk_boxes(buf, stbl_body, stbl_end):
        if cc == b"stss":
            _, p = _fullbox(buf, body)
            (cnt,) = struct.unpack_from(">I", buf, p)
            return (
                np.frombuffer(buf, ">u4", count=cnt, offset=p + 4).astype(
                    np.int64
                )
                - 1  # stss is 1-based
            )
    return None  # no stss box: EVERY sample is a sync sample (ISO 14496-12)


def _find_avcc(buf: bytes, stbl_body: int, stbl_end: int) -> bytes:
    for cc, body, box_end in _walk_boxes(buf, stbl_body, stbl_end):
        if cc != b"stsd":
            continue
        _, p = _fullbox(buf, body)
        ep = p + 4
        # boxes nested in the VisualSampleEntry start after its 86 fixed bytes
        for icc, ib, ie in _walk_boxes(buf, ep + 86, box_end):
            if icc == b"avcC":
                return buf[ib:ie]
    raise AvcError("avc1 sample entry carries no avcC box")


def parse_avc_track(buf: bytes) -> dict:
    """ISO-BMFF bytes → the avc1 video track's structure::

        {"config": parse_avcc(...), "w", "h" (from avcC SPS — the
         authoritative pixel dims, cropping-aware, vs the sample entry's
         16-multiple), "offsets", "sizes", "keyframes" (sorted sample
         indices; stss or all-sync), "n_samples"}

    Decode order only (ctts reordering rejected upstream); fragmented
    MP4 raises in decode_mp4's walk the same way."""
    video = None
    for moov_b, moov_e in _find(buf, 0, len(buf), b"moov"):
        for trak_b, trak_e in _find(buf, moov_b, moov_e, b"trak"):
            for mdia_b, mdia_e in _find(buf, trak_b, trak_e, b"mdia"):
                handler = None
                for hb, _he in _find(buf, mdia_b, mdia_e, b"hdlr"):
                    _, p = _fullbox(buf, hb)
                    handler = buf[p + 4 : p + 8]
                if handler != b"vide":
                    continue
                for sb, se in _find(buf, mdia_b, mdia_e, b"minf", b"stbl"):
                    if video is not None:
                        raise AvcError("multiple video tracks unsupported")
                    entry_cc, w, h, _depth, offsets, sizes = _sample_table(
                        buf, sb, se
                    )
                    stss = _parse_stss(buf, sb, se)
                    avcc = (
                        _find_avcc(buf, sb, se)
                        if entry_cc in (b"avc1", b"avc3")
                        else None
                    )
                    video = (entry_cc, w, h, offsets, sizes, stss, avcc)
    if video is None:
        raise AvcError("MP4 has no video ('vide') track")
    entry_cc, w, h, offsets, sizes, stss, avcc = video
    if entry_cc not in (b"avc1", b"avc3"):
        raise AvcError(
            f"video sample entry {entry_cc!r} is not AVC; use decode_mp4 "
            "for 'jpeg'/'raw ' tracks"
        )
    if avcc is None:
        raise AvcError("avc1 track without avcC")
    cfg = parse_avcc(avcc)
    n = len(sizes)
    keyframes = (
        np.arange(n, dtype=np.int64) if stss is None else np.sort(stss)
    )
    if len(keyframes) and (keyframes[0] < 0 or keyframes[-1] >= n):
        raise AvcError("stss indexes out of sample range")
    if int((offsets + sizes).max() if n else 0) > len(buf):
        raise AvcError("sample table points past end of file")
    return {
        "config": cfg,
        "w": cfg["width"],
        "h": cfg["height"],
        "offsets": offsets,
        "sizes": sizes,
        "keyframes": keyframes,
        "n_samples": n,
    }


def avc_stream_info(buf: bytes) -> dict:
    """Flat stream metadata for the Spark lane."""
    t = parse_avc_track(buf)
    c = t["config"]
    return {
        "n_samples": t["n_samples"],
        "n_keyframes": int(len(t["keyframes"])),
        "width": c["width"],
        "height": c["height"],
        "profile_idc": c["profile_idc"],
        "level_idc": c["level_idc"],
        "bit_depth_luma": c["bit_depth_luma"],
        "chroma_format_idc": c["chroma_format_idc"],
        "nal_length_size": c["nal_length_size"],
    }


def keyframe_hashes(buf: bytes) -> tuple[np.ndarray, np.ndarray]:
    """(sample_indices int64[k], hashes int64[k]) — a 64-bit content
    hash of each SYNC sample's bytes. Remux-invariant (sample bytes
    survive re-chunking/interleave changes) and keyframe-trim-aligned."""
    t = parse_avc_track(buf)
    offs, sizes, keys = t["offsets"], t["sizes"], t["keyframes"]
    out = np.empty(len(keys), np.int64)
    for i, s in enumerate(keys):
        o, ln = int(offs[s]), int(sizes[s])
        d = hashlib.blake2b(buf[o : o + ln], digest_size=8).digest()
        out[i] = struct.unpack("<q", d)[0]
    return keys, out


def decode_avc_sample(*_a, **_k):  # pragma: no cover - documented seam
    raise NotImplementedError(
        "H.264 slice decode (CAVLC/CABAC residual + intra/inter "
        "prediction) is a full video decoder — not implementable from "
        "rederivable spec tables in this environment, and unvalidatable "
        "without a real encoder. Structure (sample tables, keyframes, "
        "SPS dimensions) is fully parsed; dedup runs compressed-domain."
    )


# ---------------------------------------------------------------------------
# Spark lanes
# ---------------------------------------------------------------------------


def avc_stream_meta(
    videos: DataFrame, id_col: str = "video_id", bytes_col: str = "bytes"
) -> DataFrame:
    """(id, n_samples, n_keyframes, width, height, profile_idc,
    level_idc, bit_depth_luma, chroma_format_idc, nal_length_size) —
    one mapInPandas pass over the containers; the width/height are the
    SPS's cropping-aware dimensions, not the sample entry's."""
    import pandas as pd
    from typing import Iterator

    id_type = dict(videos.dtypes)[id_col]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = [avc_stream_info(bytes(b)) for b in pdf[bytes_col]]
            out = pd.DataFrame(rows)
            out.insert(0, "id", pdf[id_col].to_numpy())
            yield out

    return videos.select(id_col, bytes_col).mapInPandas(
        run,
        f"id {id_type}, n_samples int, n_keyframes int, width int, "
        "height int, profile_idc int, level_idc int, bit_depth_luma int, "
        "chroma_format_idc int, nal_length_size int",
    )


def avc_keyframe_landmarks(
    videos: DataFrame, id_col: str = "video_id", bytes_col: str = "bytes"
) -> DataFrame:
    """(id, landmark, t): keyframe-sample content hash + SAMPLE index —
    the shared (id, landmark, t) schema, so pair scoring and offset-vote
    containment reuse the audio lane's operators unchanged. t is the
    sample index (not the keyframe ordinal) so a keyframe-aligned trim
    shifts every landmark by ONE constant offset."""
    import pandas as pd
    from typing import Iterator

    id_type = dict(videos.dtypes)[id_col]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, lms, ts = [], [], []
            for rid, b in zip(pdf[id_col], pdf[bytes_col]):
                keys, h = keyframe_hashes(bytes(b))
                ids.append(np.full(len(h), rid, dtype=object))
                lms.append(h)
                ts.append(keys.astype(np.int32))
            yield pd.DataFrame(
                {
                    id_col: np.concatenate(ids) if ids else [],
                    "landmark": np.concatenate(lms) if lms else [],
                    "t": np.concatenate(ts) if ts else [],
                }
            )

    return videos.select(id_col, bytes_col).mapInPandas(
        run, f"{id_col} {id_type}, landmark long, t int"
    )


def dedup_avc(
    videos: DataFrame,
    id_col: str = "video_id",
    bytes_col: str = "bytes",
    min_shared: int = 2,
    max_ids_per_landmark: int = 64,
) -> dict:
    """Compressed-domain AVC dedup: keyframe-hash landmarks →
    shared-count pairs → connected components. Catches remuxes,
    keyframe-aligned trims, and concatenations of the SAME encode;
    re-encodes are the pixel lane's job. Returns {'assignments',
    'pairs', 'landmarks'}. min_shared defaults low because keyframes
    are sparse (one per GOP, seconds apart)."""
    from .audiodedup import audio_pairs
    from .cc import assign_clusters

    lm = avc_keyframe_landmarks(videos, id_col=id_col, bytes_col=bytes_col)
    lm = lm.localCheckpoint(eager=False)
    pairs = audio_pairs(
        lm,
        id_col=id_col,
        min_shared=min_shared,
        max_ids_per_landmark=max_ids_per_landmark,
    )
    edges = pairs.select(F.col("audio_a").alias("a"), F.col("audio_b").alias("b"))
    assignments = assign_clusters(videos.select(F.col(id_col).alias("id")), edges)
    return {"assignments": assignments, "pairs": pairs, "landmarks": lm}


def avc_containment(
    videos: DataFrame,
    id_col: str = "video_id",
    bytes_col: str = "bytes",
    min_aligned: int = 2,
    max_entries_per_landmark: int = 64,
) -> DataFrame:
    """Keyframe-trim / excerpt localization: (clip_id, track_id,
    aligned_anchors, frame_offset) via the shared offset-vote core;
    frame_offset is in SAMPLES (convert with the track timescale)."""
    from .audiodedup import containment_from_landmarks

    lm = avc_keyframe_landmarks(videos, id_col=id_col, bytes_col=bytes_col)
    return containment_from_landmarks(
        lm,
        id_col=id_col,
        min_aligned=min_aligned,
        max_entries_per_landmark=max_entries_per_landmark,
    )


# ---------------------------------------------------------------------------
# Fixture twins (tests / planted oracles only — may loop, build bitstreams)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def u(self, v: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def ue(self, v: int):
        k = v + 1
        n = k.bit_length()
        self.u(0, n - 1)
        self.u(k, n)

    def bytes(self) -> bytes:
        bits = self.bits + [1]  # rbsp_stop_one_bit
        while len(bits) % 8:
            bits.append(0)
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for j in range(8):
                b = (b << 1) | bits[i + j]
            out.append(b)
        return bytes(out)


def build_sps(
    width: int,
    height: int,
    profile_idc: int = 66,
    level_idc: int = 30,
) -> bytes:
    """Write a syntactically-valid baseline SPS for the given pixel
    dimensions, bit-by-bit from the §7.3.2.1 syntax (frame_mbs_only=1;
    cropping encodes non-multiple-of-16 sizes). The fixture twin of
    parse_sps — independently constructed, so the parser is tested
    against the syntax, not against itself."""
    if width % 2 or height % 2:
        raise AvcError("fixture SPS needs even dimensions (4:2:0 crop units)")
    w = _BitWriter()
    w.u(profile_idc, 8)
    w.u(0, 8)  # constraint flags
    w.u(level_idc, 8)
    w.ue(0)  # sps_id
    if profile_idc in _HIGH_PROFILES:
        w.ue(1)  # chroma_format_idc 4:2:0
        w.ue(0)  # bit_depth_luma_minus8
        w.ue(0)  # bit_depth_chroma_minus8
        w.u(0, 1)
        w.u(0, 1)  # no scaling matrix
    w.ue(0)  # log2_max_frame_num_minus4
    w.ue(0)  # pic_order_cnt_type
    w.ue(0)  # log2_max_pic_order_cnt_lsb_minus4
    w.ue(1)  # max_num_ref_frames
    w.u(0, 1)  # gaps allowed
    mb_w = (width + 15) // 16
    mb_h = (height + 15) // 16
    w.ue(mb_w - 1)
    w.ue(mb_h - 1)
    w.u(1, 1)  # frame_mbs_only
    w.u(1, 1)  # direct_8x8_inference
    crop_r = (mb_w * 16 - width) // 2
    crop_b = (mb_h * 16 - height) // 2
    if crop_r or crop_b:
        w.u(1, 1)
        w.ue(0)
        w.ue(crop_r)
        w.ue(0)
        w.ue(crop_b)
    else:
        w.u(0, 1)
    w.u(0, 1)  # vui_parameters_present
    return bytes([0x67]) + w.bytes()  # NAL header: type 7, nal_ref_idc 3


def build_avcc(sps: bytes, pps: bytes | None = None) -> bytes:
    pps = pps if pps is not None else bytes([0x68, 0xCE, 0x38, 0x80])
    return (
        bytes([1, sps[1], sps[2], sps[3], 0xFF, 0xE1])
        + struct.pack(">H", len(sps))
        + sps
        + bytes([1])
        + struct.pack(">H", len(pps))
        + pps
    )


def synth_avc1_mp4(
    n_samples: int,
    gop: int = 8,
    width: int = 640,
    height: int = 360,
    seed: int = 0,
    sample_bytes: int = 400,
    chunking: int = 5,
) -> bytes:
    """Header-valid avc1 MP4: length-prefixed fake NAL payloads (IDR
    type-5 at each GOP head, type-1 otherwise — parser-valid structure,
    NOT decodable video), stss listing the IDR samples, samples packed
    ``chunking`` per chunk. Re-invoking with a different ``chunking``
    remuxes the SAME samples — the remux-invariance fixture."""
    rng = np.random.default_rng(seed)
    samples = []
    for i in range(n_samples):
        is_idr = i % gop == 0
        body = rng.integers(0, 256, sample_bytes - 5, dtype=np.uint8).tobytes()
        nal = bytes([(0x65 if is_idr else 0x41)]) + body
        samples.append(struct.pack(">I", len(nal)) + nal)
    keyframes = [i for i in range(n_samples) if i % gop == 0]
    sps = build_sps(width, height)
    return _build_avc1_container(
        samples, keyframes, sps, None, width, height, chunking
    )


def trim_keyframe_aligned(buf: bytes, start_sample: int, n: int) -> bytes:
    """Cut samples [start_sample, start_sample+n) of a fixture avc1 MP4
    into a NEW fixture container (start_sample must be a keyframe for
    the result to be playable-shaped). Rebuilds via synth-like plumbing:
    reuses the original sample bytes verbatim so keyframe hashes are
    preserved."""
    t = parse_avc_track(buf)
    offs, sizes = t["offsets"], t["sizes"]
    if start_sample not in set(int(k) for k in t["keyframes"]):
        raise AvcError("trim must start at a keyframe")
    picked = [
        bytes(buf[int(offs[i]) : int(offs[i]) + int(sizes[i])])
        for i in range(start_sample, start_sample + n)
    ]
    keyframes = [
        int(k) - start_sample
        for k in t["keyframes"]
        if start_sample <= int(k) < start_sample + n
    ]
    return _rebuild_avc1(picked, keyframes, t)


def remux(buf: bytes, chunking: int) -> bytes:
    """Repack the SAME samples with a different chunk layout — byte-
    identical samples, different stsc/stco: the remux fixture."""
    t = parse_avc_track(buf)
    offs, sizes = t["offsets"], t["sizes"]
    picked = [
        bytes(buf[int(offs[i]) : int(offs[i]) + int(sizes[i])])
        for i in range(t["n_samples"])
    ]
    return _rebuild_avc1(
        picked, [int(k) for k in t["keyframes"]], t, chunking=chunking
    )


def _rebuild_avc1(samples, keyframes, track, chunking: int = 5) -> bytes:
    cfg = track["config"]
    return _build_avc1_container(
        samples,
        keyframes,
        cfg["sps"][0],
        cfg["pps"][0] if cfg["pps"] else None,
        cfg["width"],
        cfg["height"],
        chunking,
    )


def _build_avc1_container(
    samples, keyframes, sps, pps, width, height, chunking: int = 5
) -> bytes:
    """Shared minimal-but-valid avc1 container writer (fixture-only)."""
    from .mp4codec import _box, _full

    avcc = build_avcc(sps, pps)
    n_samples = len(samples)
    mdat_body = b"".join(samples)
    ftyp = _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2avc1mp41")
    mdat = _box(b"mdat", mdat_body)
    first_off = len(ftyp) + 8
    mb_w16, mb_h16 = ((width + 15) // 16) * 16, ((height + 15) // 16) * 16
    entry = (
        struct.pack(">I", 86 + 8 + len(avcc))
        + b"avc1"
        + b"\x00" * 6
        + struct.pack(">H", 1)
        + b"\x00" * 16
        + struct.pack(">HH", mb_w16, mb_h16)
        + struct.pack(">II", 0x00480000, 0x00480000)
        + b"\x00" * 4
        + struct.pack(">H", 1)
        + b"\x00" * 32
        + struct.pack(">Hh", 24, -1)
        + _box(b"avcC", avcc)
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n_samples, 512))
    n_chunks = (n_samples + chunking - 1) // chunking
    last = n_samples - (n_chunks - 1) * chunking
    if n_chunks == 1:
        # a single (short) chunk must be ONE run — emitting the generic
        # [(1, chunking), (1, last)] pair here put two runs at
        # first_chunk=1, an stsc no parser (including ours) accepts
        stsc_runs = [(1, last, 1)]
    else:
        stsc_runs = [(1, chunking, 1)]
        if last != chunking:
            stsc_runs.append((n_chunks, last, 1))
    stsc = _full(
        b"stsc",
        0,
        0,
        struct.pack(">I", len(stsc_runs))
        + b"".join(struct.pack(">III", *r) for r in stsc_runs),
    )
    sizes = [len(s) for s in samples]
    stsz = _full(
        b"stsz",
        0,
        0,
        struct.pack(">II", 0, n_samples)
        + b"".join(struct.pack(">I", s) for s in sizes),
    )
    offs = []
    pos = first_off
    for c in range(n_chunks):
        offs.append(pos)
        for s in sizes[c * chunking : (c + 1) * chunking]:
            pos += s
    stco = _full(
        b"stco",
        0,
        0,
        struct.pack(">I", n_chunks)
        + b"".join(struct.pack(">I", o) for o in offs),
    )
    stss = _full(
        b"stss",
        0,
        0,
        struct.pack(">I", len(keyframes))
        + b"".join(struct.pack(">I", k + 1) for k in keyframes),
    )
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco + stss)
    url = _full(b"url ", 0, 1, b"")
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + url)
    dinf = _box(b"dinf", dref)
    vmhd = _full(b"vmhd", 0, 1, b"\x00" * 8)
    minf = _box(b"minf", vmhd + dinf + stbl)
    hdlr = _full(b"hdlr", 0, 0, b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"\x00")
    mdhd = _full(
        b"mdhd", 0, 0,
        struct.pack(">IIIIHH", 0, 0, 12800, n_samples * 512, 0x55C4, 0),
    )
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(
        b"tkhd", 0, 7,
        struct.pack(">IIII", 0, 0, 1, 0)
        + b"\x00" * 4
        + struct.pack(">II", n_samples * 512, 0)
        + b"\x00" * 4
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),
    )
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, 12800, n_samples * 512)
        + struct.pack(">IH", 0x00010000, 0x0100)
        + b"\x00" * 10
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2),
    )
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov
