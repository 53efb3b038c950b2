"""MPEG audio (MP3) frame parsing + compressed-domain dedup lanes.

Scope — what is real here and what is a seam, honestly drawn:

* **Frame-level parsing is complete**: ID3v2/ID3v1 tag stripping, frame
  sync + header validation across MPEG-1/2/2.5 × Layer I/II/III, the
  published bitrate/sample-rate tables, frame-length arithmetic
  (padding-aware), resync over junk bytes, Xing/Info VBR-header
  detection, and stream-level metadata (frame count, duration, mean
  bitrate, channel mode). These are small, public, fully-specified
  tables — the same pure-stdlib/numpy discipline as the other codecs.
* **PCM decode is a documented seam**: a correct Layer-III decoder needs
  the ISO 11172-3 Huffman code tables (34 tables, thousands of entries)
  and the 512-coefficient synthesis-window table — spec DATA that cannot
  be rederived from formulas, is not present in this environment, and
  could not be validated here anyway (no real encoder exists in the
  sandbox to produce ground-truth fixtures; a self-consistent
  decoder+encoder pair would only prove it agrees with itself).
  ``to_pcm16`` in audiocodec.py therefore still raises for fmt='mp3'.

Why the compressed domain is the lane that matters at 10^12 scale
anyway: duplicated web audio is overwhelmingly the SAME ENCODE
redistributed — retagged (different ID3 wrappers), truncated/excerpted
(frame-aligned cuts: MP3 frames are independent units modulo the bit
reservoir, and cutters cut on frame boundaries), or concatenated — and
for that mass, per-frame content hashes give exact dup + excerpt
containment WITHOUT paying any decode, at bytes-in/8-bytes-out cost.
Distinct re-encodes of the same recording need the spectral lane
(audiodedup.py over wav/flac/pcm16) — the two lanes compose, they do
not compete.

The Spark shapes reuse the audio lane wholesale: ``mp3_frame_landmarks``
emits the exact (id, landmark, t) schema of audio_landmarks_timed with
landmark = per-frame content hash and t = frame index, so pair scoring
is audiodedup.audio_pairs and excerpt containment is
audiodedup.containment_from_landmarks — one offset-vote family across
modalities, zero new shuffle machinery.

Fixture twins: ``synth_mp3_stream`` builds header-valid frame streams
with deterministic pseudorandom payloads (parser-valid, not decodable
audio — exactly what the parser lane needs to be tested against), and
the planted dedup queries retag/excerpt/concat those streams.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame


class Mp3Error(ValueError):
    """Malformed or unsupported MPEG audio payload (fail-fast seam)."""


# version bits (header bits 20-19): 0 = MPEG2.5, 1 = reserved,
# 2 = MPEG2, 3 = MPEG1; layer bits (18-17): 1 = III, 2 = II, 3 = I.
_SAMPLE_RATES = {
    3: (44100, 48000, 32000),
    2: (22050, 24000, 16000),
    0: (11025, 12000, 8000),
}

# kbps by bitrate index 1..14 (0 = free-format, 15 = invalid), from the
# published ISO/IEC 11172-3 / 13818-3 tables.
_BR_V1 = {
    3: (32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    2: (32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    1: (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
}
_BR_V2 = {
    3: (32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    2: (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    1: (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}

#: samples per frame by (is_mpeg1, layer)
_SPF = {
    (True, 1): 1152, (False, 1): 576,   # Layer III
    (True, 2): 1152, (False, 2): 1152,  # Layer II
    (True, 3): 384, (False, 3): 384,    # Layer I
}


def _skip_id3v2(buf: bytes, pos: int) -> int:
    """Skip one or more ID3v2 tags at ``pos`` (syncsafe size; +10 footer
    when flagged). Returns the first post-tag offset."""
    while (
        pos + 10 <= len(buf)
        and buf[pos:pos + 3] == b"ID3"
        and buf[pos + 3] != 0xFF
        and max(buf[pos + 6:pos + 10]) < 0x80
    ):
        size = (
            (buf[pos + 6] << 21) | (buf[pos + 7] << 14)
            | (buf[pos + 8] << 7) | buf[pos + 9]
        )
        pos += 10 + size + (10 if buf[pos + 5] & 0x10 else 0)
    return pos


def strip_tags(buf: bytes) -> tuple[bytes, int, bool]:
    """(frame payload, leading ID3v2 bytes skipped, had trailing ID3v1).
    The payload slice is what every content fingerprint hashes — two
    copies of one encode with different tags fingerprint identically."""
    start = _skip_id3v2(buf, 0)
    end = len(buf)
    id3v1 = end - start >= 128 and buf[end - 128:end - 125] == b"TAG"
    if id3v1:
        end -= 128
    return buf[start:end], start, id3v1


def _frame_len(version: int, layer: int, br_kbps: int, sr: int, pad: int) -> int:
    if layer == 3:  # Layer I
        return (12 * br_kbps * 1000 // sr + pad) * 4
    if layer == 2:  # Layer II
        return 144 * br_kbps * 1000 // sr + pad
    # Layer III
    per = 144 if version == 3 else 72
    return per * br_kbps * 1000 // sr + pad


def parse_frames(buf: bytes) -> dict:
    """Walk the frame chain of an MPEG audio stream (tags already NOT
    required to be stripped — they are skipped here). Resyncs over junk
    by scanning to the next sync candidate. Returns::

        {"offsets": int64[n], "lengths": int32[n],
         "version": int, "layer": int, "sample_rate": int,
         "channels": int, "mode": int, "bitrates_kbps": int16[n],
         "junk_bytes": int, "id3v2_bytes": int, "id3v1": bool,
         "has_vbr_header": bool}

    version/layer/sample_rate are those of the FIRST valid frame; frames
    whose header disagrees on version/layer/sample-rate are treated as
    junk (one stream = one encode — mixed streams resync past them).
    Free-format frames (bitrate index 0) cannot be length-derived from
    the header and raise at the seam."""
    body, id3v2_bytes, id3v1 = strip_tags(buf)
    n = len(body)
    offsets: list[int] = []
    lengths: list[int] = []
    brs: list[int] = []
    junk = 0
    pos = 0
    sig = None  # (version, layer, sr_idx)
    saw_free_format = False
    while pos + 4 <= n:
        b0, b1, b2 = body[pos], body[pos + 1], body[pos + 2]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            pos += 1
            junk += 1
            continue
        version = (b1 >> 3) & 0x03
        layer = (b1 >> 1) & 0x03
        br_idx = (b2 >> 4) & 0x0F
        sr_idx = (b2 >> 2) & 0x03
        pad = (b2 >> 1) & 0x01
        if version == 1 or layer == 0 or br_idx == 15 or sr_idx == 3:
            pos += 1
            junk += 1
            continue
        if br_idx == 0:
            # free-format: no header-derivable frame length. Mid-stream
            # this is overwhelmingly a junk byte that happens to look
            # like a sync word — resync past it like every other invalid
            # header (a hard raise here would kill a whole Spark task on
            # one recoverable stream). Only if the WHOLE stream yields no
            # length-derivable frame does it raise as the honest seam.
            saw_free_format = True
            pos += 1
            junk += 1
            continue
        if sig is None:
            sig = (version, layer, sr_idx)
        elif (version, layer, sr_idx) != sig:
            pos += 1
            junk += 1
            continue
        sr = _SAMPLE_RATES[version][sr_idx]
        br = (_BR_V1 if version == 3 else _BR_V2)[layer][br_idx - 1]
        flen = _frame_len(version, layer, br, sr, pad)
        if pos + flen > n:
            junk += n - pos
            break
        offsets.append(pos)
        lengths.append(flen)
        brs.append(br)
        pos += flen
    if sig is None:
        if saw_free_format:
            raise Mp3Error(
                "free-format MPEG audio (bitrate index 0) has no "
                "header-derivable frame length; unsupported at this seam"
            )
        raise Mp3Error("no valid MPEG audio frame found")
    version, layer, sr_idx = sig
    mode = (body[offsets[0] + 3] >> 6) & 0x03 if offsets else 3
    has_vbr = False
    if offsets and layer == 1:  # Xing/Info/VBRI are Layer-III headers
        f0 = body[offsets[0]:offsets[0] + lengths[0]]
        # Xing/Info lives after the Layer-III side info: MPEG1 32 bytes
        # stereo-ish / 17 mono; MPEG2/2.5 17 / 9 — plus the 4-byte frame
        # header AND the 2-byte CRC when protection_bit=0 (CRC present)
        side = {3: (17, 32)}.get(version, (9, 17))[0 if mode == 3 else 1]
        crc = 0 if (body[offsets[0] + 1] & 0x01) else 2
        tag_off = 4 + crc + side
        has_vbr = f0[tag_off:tag_off + 4] in (b"Xing", b"Info") or (
            b"VBRI" in f0[:64]
        )
    return {
        "offsets": np.asarray(offsets, np.int64) + id3v2_bytes,
        "lengths": np.asarray(lengths, np.int32),
        "version": version,
        "layer": layer,
        "sample_rate": _SAMPLE_RATES[version][sr_idx],
        "channels": 1 if mode == 3 else 2,
        "mode": mode,
        "bitrates_kbps": np.asarray(brs, np.int16),
        "junk_bytes": junk,
        "id3v2_bytes": id3v2_bytes,
        "id3v1": id3v1,
        "has_vbr_header": has_vbr,
    }


def stream_info(buf: bytes) -> dict:
    """Stream-level metadata: frame count, duration, bitrate shape."""
    p = parse_frames(buf)
    spf = _SPF[(p["version"] == 3, p["layer"])]
    n_frames = len(p["offsets"])
    return {
        "n_frames": n_frames,
        "sample_rate": p["sample_rate"],
        "channels": p["channels"],
        "layer": {1: 3, 2: 2, 3: 1}[p["layer"]],
        "mpeg1": p["version"] == 3,
        "duration_sec": n_frames * spf / p["sample_rate"],
        "bitrate_kbps_mean": float(np.mean(p["bitrates_kbps"])) if n_frames else 0.0,
        "is_vbr": bool(p["has_vbr_header"])
        or (n_frames > 0 and len(np.unique(p["bitrates_kbps"])) > 1),
        "id3v2_bytes": p["id3v2_bytes"],
        "id3v1": p["id3v1"],
        "junk_bytes": p["junk_bytes"],
    }


def frame_hashes(buf: bytes) -> np.ndarray:
    """Per-frame 64-bit content hashes (int64[n_frames]) over the raw
    frame bytes — tag-invariant by construction (strip_tags runs first
    inside parse_frames and offsets are payload-relative pre-shift)."""
    p = parse_frames(buf)
    body = buf  # offsets already include the id3v2 shift
    out = np.empty(len(p["offsets"]), np.int64)
    for i, (off, ln) in enumerate(zip(p["offsets"], p["lengths"])):
        d = hashlib.blake2b(body[off:off + ln], digest_size=8).digest()
        out[i] = struct.unpack("<q", d)[0]
    return out


# ---------------------------------------------------------------------------
# Spark lanes
# ---------------------------------------------------------------------------


def mp3_stream_meta(
    audio: DataFrame, id_col: str = "audio_id", bytes_col: str = "bytes"
) -> DataFrame:
    """Stream metadata extraction: (id, n_frames, sample_rate, channels,
    layer, duration_sec, bitrate_kbps_mean, is_vbr, id3v2_bytes, id3v1,
    junk_bytes). One mapInPandas pass, whole-batch per Arrow chunk."""
    import pandas as pd
    from typing import Iterator

    id_type = dict(audio.dtypes)[id_col]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = [stream_info(bytes(b)) for b in pdf[bytes_col]]
            out = pd.DataFrame(rows)
            out.insert(0, "id", pdf[id_col].to_numpy())
            out["id3v1"] = out["id3v1"].astype(bool)
            yield out[
                ["id", "n_frames", "sample_rate", "channels", "layer",
                 "duration_sec", "bitrate_kbps_mean", "is_vbr",
                 "id3v2_bytes", "id3v1", "junk_bytes"]
            ]

    return audio.select(id_col, bytes_col).mapInPandas(
        run,
        f"id {id_type}, n_frames int, sample_rate int, channels int, "
        "layer int, duration_sec double, bitrate_kbps_mean double, "
        "is_vbr boolean, id3v2_bytes int, id3v1 boolean, junk_bytes int",
    )


def mp3_frame_landmarks(
    audio: DataFrame, id_col: str = "audio_id", bytes_col: str = "bytes"
) -> DataFrame:
    """(id, landmark, t): per-frame content hash + frame index — the
    EXACT schema of audiodedup.audio_landmarks_timed, so the pair lane
    (audio_pairs) and the offset-vote containment core
    (containment_from_landmarks) run on it unchanged. Retagged copies of
    one encode emit identical landmark sets; a frame-aligned excerpt
    emits a contiguous subsequence shifted by a constant t offset —
    exactly what the vote histogram detects."""
    import pandas as pd
    from typing import Iterator

    id_type = dict(audio.dtypes)[id_col]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, lms, ts = [], [], []
            for rid, b in zip(pdf[id_col], pdf[bytes_col]):
                h = frame_hashes(bytes(b))
                ids.append(np.full(len(h), rid, dtype=object))
                lms.append(h)
                ts.append(np.arange(len(h), dtype=np.int32))
            yield pd.DataFrame(
                {
                    id_col: np.concatenate(ids) if ids else [],
                    "landmark": np.concatenate(lms) if lms else [],
                    "t": np.concatenate(ts) if ts else [],
                }
            )

    return audio.select(id_col, bytes_col).mapInPandas(
        run, f"{id_col} {id_type}, landmark long, t int"
    )


def dedup_mp3(
    audio: DataFrame,
    id_col: str = "audio_id",
    bytes_col: str = "bytes",
    min_shared: int = 4,
    max_ids_per_landmark: int = 64,
) -> dict:
    """Compressed-domain MP3 dedup: frame-hash landmarks → shared-count
    pairs (audiodedup.audio_pairs — one groupBy(landmark) shuffle, JVM
    pair algebra, hot-landmark cap) → connected components. Returns
    {'assignments', 'pairs', 'landmarks'}; assignments cover every input
    stream. Catches retags, frame-aligned excerpts/truncations, and
    concatenations of the SAME encode; distinct re-encodes are the
    spectral lane's job (dedup_audio over decodable formats)."""
    from .audiodedup import audio_pairs
    from .cc import assign_clusters

    lm = mp3_frame_landmarks(audio, id_col=id_col, bytes_col=bytes_col)
    lm = lm.localCheckpoint(eager=False)
    pairs = audio_pairs(
        lm,
        id_col=id_col,
        min_shared=min_shared,
        max_ids_per_landmark=max_ids_per_landmark,
    )
    edges = pairs.select(F.col("audio_a").alias("a"), F.col("audio_b").alias("b"))
    assignments = assign_clusters(audio.select(F.col(id_col).alias("id")), edges)
    return {"assignments": assignments, "pairs": pairs, "landmarks": lm}


def mp3_containment(
    audio: DataFrame,
    id_col: str = "audio_id",
    bytes_col: str = "bytes",
    min_aligned: int = 4,
    max_entries_per_landmark: int = 64,
) -> DataFrame:
    """Excerpt-in-stream detection for MP3 payloads: (clip_id, track_id,
    aligned_anchors, frame_offset) where ≥ min_aligned distinct clip
    frames recur in the track at ONE consistent frame offset — the
    shared offset-vote core (audiodedup.containment_from_landmarks) over
    frame-hash landmarks. frame_offset is in MP3 frames (×1152/sr or
    ×576/sr seconds)."""
    from .audiodedup import containment_from_landmarks

    lm = mp3_frame_landmarks(audio, id_col=id_col, bytes_col=bytes_col)
    return containment_from_landmarks(
        lm,
        id_col=id_col,
        min_aligned=min_aligned,
        max_entries_per_landmark=max_entries_per_landmark,
    )


# ---------------------------------------------------------------------------
# Fixture twin (tests / planted oracles only — may loop)
# ---------------------------------------------------------------------------


def synth_mp3_stream(
    n_frames: int,
    seed: int = 0,
    version: int = 3,
    layer: int = 1,
    br_idx: int = 9,
    sr_idx: int = 0,
    mode: int = 0,
    pad_pattern: bool = False,
) -> bytes:
    """Header-valid MPEG audio frame stream with deterministic
    pseudorandom payloads — parser-valid, NOT decodable audio (there is
    nothing in this sandbox that could validate decoded samples anyway).
    ``pad_pattern`` alternates the padding bit to exercise frame-length
    arithmetic. Defaults: MPEG1 Layer III 128 kbps 44.1 kHz stereo."""
    rng = np.random.default_rng(seed)
    out = bytearray()
    sr = _SAMPLE_RATES[version][sr_idx]
    br = (_BR_V1 if version == 3 else _BR_V2)[layer][br_idx - 1]
    for i in range(n_frames):
        pad = (i % 2) if pad_pattern else 0
        b1 = 0xE0 | (version << 3) | (layer << 1) | 0x01  # no CRC
        b2 = (br_idx << 4) | (sr_idx << 2) | (pad << 1)
        b3 = (mode << 6) | 0x04  # 'original' bit set
        flen = _frame_len(version, layer, br, sr, pad)
        body = rng.integers(0, 256, flen - 4, dtype=np.uint8)
        # keep payload bytes from faking a sync word mid-frame: the
        # parser walks frame lengths so it never looks inside, but
        # resync-after-junk tests slice frames arbitrarily
        body[body == 0xFF] = 0xFE
        out += bytes((0xFF, b1, b2, b3)) + body.tobytes()
    return bytes(out)


def with_id3v2(buf: bytes, tag_bytes: int = 256, seed: int = 1) -> bytes:
    """Prepend a syncsafe-sized ID3v2 tag of ``tag_bytes`` payload."""
    rng = np.random.default_rng(seed)
    body = rng.integers(0, 0x80, tag_bytes, dtype=np.uint8).tobytes()
    hdr = b"ID3\x04\x00\x00" + bytes(
        (tag_bytes >> 21) & 0x7F
        for _ in (0,)
    ) + bytes([(tag_bytes >> 14) & 0x7F, (tag_bytes >> 7) & 0x7F, tag_bytes & 0x7F])
    return hdr + body + buf


def with_id3v1(buf: bytes, seed: int = 2) -> bytes:
    """Append a 128-byte ID3v1 tag."""
    rng = np.random.default_rng(seed)
    return buf + b"TAG" + rng.integers(32, 127, 125, dtype=np.uint8).tobytes()


def excerpt_frames(buf: bytes, start: int, count: int) -> bytes:
    """Frame-aligned cut [start, start+count) of an (untagged) stream."""
    p = parse_frames(buf)
    offs, lens = p["offsets"], p["lengths"]
    lo = int(offs[start])
    hi = int(offs[start + count - 1] + lens[start + count - 1])
    return buf[lo:hi]
