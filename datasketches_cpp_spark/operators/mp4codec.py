"""MP4 / QuickTime (ISO base media file format, ISO/IEC 14496-12)
container parsing for the video lane — pure stdlib/numpy, the ISO-BMFF
twin of avicodec.py: where a box walk (plus the in-repo JPEG codec)
suffices, the container is real; compressed bitstream codecs (avc1,
hev1, vp09, av01, mp4v...) stay honest NotImplementedError seams.

Scope: files whose single video track ('vide' handler) uses a sample
entry of
  * 'jpeg' / 'mjpa': each sample is one complete JPEG image (motion
    JPEG in MP4/MOV carries full frames; DHT-less frames get the T.81
    Annex K typical tables spliced in, same rule as MJPEG-in-AVI); or
  * 'raw ' at depth 24: QuickTime uncompressed RGB, rows top-down,
    no padding (w*h*3 bytes per sample).

The sample table is reconstructed the standard way: per-sample sizes
from stsz/stz2, chunk offsets from stco/co64, samples-per-chunk runs
from stsc; samples are laid out back-to-back within each chunk.
Edit lists, b-frame reordering (ctts) and fragmented MP4 (moof) are out
of scope for these intra-only codecs and raise if they would change
sample order. decode_mp4 returns the engine's rawv layout
(concatenated top-down unpadded RGB frames) so the frame-sampling
pHash lane (operators/videodedup.py) runs unchanged.

encode_mp4 is the fixture twin: ftyp + mdat + a minimal-but-valid moov
(mvhd / tkhd / mdhd / hdlr / vmhd / dref / stsd / stts / stsc / stsz /
stco), codec='jpeg' or codec='raw'. The parser round-trips its own
output bit-exactly for 'raw' and within the JPEG codec's PSNR gate for
'jpeg'.
"""

from __future__ import annotations

import struct

import numpy as np


class Mp4Error(ValueError):
    """Malformed or unsupported ISO-BMFF payload (fail-fast seam)."""


def _walk_boxes(buf: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_end); handles 64-bit largesize
    and size==0 (box extends to end of enclosing scope)."""
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", buf, pos)
        cc = buf[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if body + 8 > end:
                raise Mp4Error(f"truncated largesize box {cc!r}")
            (size,) = struct.unpack_from(">Q", buf, body)
            body += 8
            box_end = pos + size
        elif size == 0:
            box_end = end
        else:
            box_end = pos + size
        if box_end > end or box_end < body:
            raise Mp4Error(f"box {cc!r} overruns its container")
        yield cc, body, box_end
        pos = box_end


def _find(buf: bytes, pos: int, end: int, *path: bytes):
    """Yield body ranges of every box matching the nested fourcc path."""
    head, rest = path[0], path[1:]
    for cc, body, box_end in _walk_boxes(buf, pos, end):
        if cc != head:
            continue
        if not rest:
            yield body, box_end
        else:
            yield from _find(buf, body, box_end, *rest)


def _fullbox(buf: bytes, body: int) -> tuple[int, int]:
    """(version, payload_start) of a FullBox."""
    return buf[body], body + 4


_JPEG_ENTRIES = (b"jpeg", b"mjpa", b"JPEG")


def _sample_table(buf: bytes, stbl_body: int, stbl_end: int):
    """Parse stbl → (codec, w, h, [(offset, size), ...] in decode order)."""
    entry_cc = None
    w = h = depth = None
    sizes = None
    chunk_offsets = None
    stsc_runs = None
    for cc, body, box_end in _walk_boxes(buf, stbl_body, stbl_end):
        if cc == b"stsd":
            _, p = _fullbox(buf, body)
            (n_entries,) = struct.unpack_from(">I", buf, p)
            if n_entries < 1:
                raise Mp4Error("stsd has no sample entries")
            ep = p + 4
            (esize,) = struct.unpack_from(">I", buf, ep)
            entry_cc = buf[ep + 4 : ep + 8]
            if esize < 86 or ep + 86 > box_end:
                raise Mp4Error("visual sample entry too short")
            # VisualSampleEntry: 8 hdr + 6 reserved + 2 dref idx +
            # 16 pre_defined/reserved → width/height at +32
            w, h = struct.unpack_from(">HH", buf, ep + 32)
            (depth,) = struct.unpack_from(">H", buf, ep + 82)
        elif cc == b"stsz":
            _, p = _fullbox(buf, body)
            fixed, cnt = struct.unpack_from(">II", buf, p)
            if fixed:
                sizes = np.full(cnt, fixed, np.int64)
            else:
                sizes = np.frombuffer(
                    buf, ">u4", count=cnt, offset=p + 8
                ).astype(np.int64)
        elif cc == b"stz2":
            _, p = _fullbox(buf, body)
            field, cnt = struct.unpack_from(">xxxBI", buf, p)
            if field == 16:
                sizes = np.frombuffer(
                    buf, ">u2", count=cnt, offset=p + 8
                ).astype(np.int64)
            elif field == 8:
                sizes = np.frombuffer(
                    buf, np.uint8, count=cnt, offset=p + 8
                ).astype(np.int64)
            else:
                raise Mp4Error(f"stz2 field size {field} unsupported")
        elif cc == b"stco":
            _, p = _fullbox(buf, body)
            (cnt,) = struct.unpack_from(">I", buf, p)
            chunk_offsets = np.frombuffer(
                buf, ">u4", count=cnt, offset=p + 4
            ).astype(np.int64)
        elif cc == b"co64":
            _, p = _fullbox(buf, body)
            (cnt,) = struct.unpack_from(">I", buf, p)
            chunk_offsets = np.frombuffer(
                buf, ">u8", count=cnt, offset=p + 4
            ).astype(np.int64)
        elif cc == b"stsc":
            _, p = _fullbox(buf, body)
            (cnt,) = struct.unpack_from(">I", buf, p)
            stsc_runs = [
                struct.unpack_from(">III", buf, p + 4 + 12 * i)
                for i in range(cnt)
            ]
        elif cc == b"ctts":
            _, p = _fullbox(buf, body)
            (cnt,) = struct.unpack_from(">I", buf, p)
            # intra-only codecs must not reorder; a ctts with any
            # nonzero offset would mean decode order != display order
            offs = np.frombuffer(buf, ">u4", count=2 * cnt, offset=p + 4)
            if cnt and offs[1::2].any():
                raise Mp4Error(
                    "ctts declares composition offsets (frame reordering) "
                    "— not valid for the intra-only codecs parsed here"
                )
    if entry_cc is None or sizes is None or chunk_offsets is None:
        raise Mp4Error("stbl is missing stsd/stsz/stco")
    if stsc_runs is None or not stsc_runs:
        raise Mp4Error("stbl is missing stsc")

    # expand stsc runs → samples_per_chunk for every chunk
    n_chunks = len(chunk_offsets)
    spc = np.empty(n_chunks, np.int64)
    for i, (first, per, _sdi) in enumerate(stsc_runs):
        last = (
            stsc_runs[i + 1][0] - 1 if i + 1 < len(stsc_runs) else n_chunks
        )
        if not (1 <= first <= last <= n_chunks):
            raise Mp4Error("stsc chunk runs out of range")
        spc[first - 1 : last] = per
    if int(spc.sum()) != len(sizes):
        raise Mp4Error(
            f"stsc maps {int(spc.sum())} samples, stsz declares {len(sizes)}"
        )

    # per-sample offsets: chunk base + prefix sum of sizes within chunk
    chunk_of_sample = np.repeat(np.arange(n_chunks), spc)
    csum = np.concatenate(([0], np.cumsum(sizes)))
    chunk_first = np.concatenate(([0], np.cumsum(spc)))[:-1]
    within = csum[: len(sizes)] - csum[chunk_first[chunk_of_sample]]
    offsets = chunk_offsets[chunk_of_sample] + within
    return entry_cc, int(w), int(h), int(depth or 0), offsets, sizes


def decode_mp4(buf: bytes) -> tuple[bytes, int, int, int]:
    """MP4/MOV bytes → (rawv frame bytes, w, h, n_frames).

    rawv = concatenated top-down unpadded RGB frames, the video lane's
    native layout (multimodal.sample_frames)."""
    if len(buf) < 16:
        raise Mp4Error("not an ISO-BMFF stream (too short)")
    top = list(_walk_boxes(buf, 0, len(buf)))
    names = {cc for cc, _, _ in top}
    if b"moov" not in names:
        if b"moof" in names:
            raise Mp4Error("fragmented MP4 (moof) unsupported")
        raise Mp4Error("not an ISO-BMFF stream (no moov box)")

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
                for sb, se in _find(
                    buf, mdia_b, mdia_e, b"minf", b"stbl"
                ):
                    if video is not None:
                        raise Mp4Error("multiple video tracks unsupported")
                    video = _sample_table(buf, sb, se)
    if video is None:
        raise Mp4Error("MP4 has no video ('vide') track")
    entry_cc, w, h, depth, offsets, sizes = video
    n = len(sizes)
    if n == 0:
        raise Mp4Error("video track has no samples")
    if int((offsets + sizes).max()) > len(buf):
        raise Mp4Error("sample table points past end of file")

    if entry_cc in _JPEG_ENTRIES:
        from .jpegcodec import decode_jpeg, with_default_huffman

        out = np.empty((n, h * w * 3), np.uint8)
        for i in range(n):
            o, s = int(offsets[i]), int(sizes[i])
            px, fw, fh = decode_jpeg(with_default_huffman(buf[o : o + s]))
            if (fw, fh) != (w, h):
                raise Mp4Error(
                    f"sample {i}: JPEG is {fw}x{fh}, sample entry says {w}x{h}"
                )
            out[i] = px
        return out.tobytes(), w, h, n
    if entry_cc in (b"raw ", b"raw\x00"):
        if depth != 24:
            raise Mp4Error(f"'raw ' depth {depth} unsupported (24 only)")
        expect = w * h * 3
        out = np.empty((n, expect), np.uint8)
        for i in range(n):
            o, s = int(offsets[i]), int(sizes[i])
            if s != expect:
                raise Mp4Error(
                    f"sample {i}: {s} bytes, expected {expect} (= {w}x{h}x3)"
                )
            out[i] = np.frombuffer(buf, np.uint8, count=s, offset=o)
        return out.tobytes(), w, h, n
    raise Mp4Error(
        f"MP4 video codec {entry_cc!r} unsupported for PIXEL decode; "
        "parsed here: 'jpeg'/'mjpa' (motion JPEG) and 'raw ' depth-24 RGB. "
        "avc1/avc3 tracks have full STRUCTURE support (sample tables, "
        "keyframes, SPS dimensions) and compressed-domain dedup in "
        "operators/avcparse.py; slice decode stays a documented seam "
        "(as do hev1/mp4v/vp09/av01 entirely)"
    )


def _box(cc: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + cc + body


def _full(cc: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(cc, struct.pack(">I", (version << 24) | flags) + body)


def encode_mp4(
    rawv: bytes,
    w: int,
    h: int,
    n_frames: int,
    fps: int = 10,
    codec: str = "jpeg",
    quality: int = 97,
) -> bytes:
    """rawv frame bytes → minimal valid MP4 (fixture twin).

    codec='jpeg' writes one full baseline JPEG per sample (DHT kept —
    the MP4 convention, unlike MJPEG-in-AVI); codec='raw' writes
    QuickTime 'raw ' depth-24 RGB samples."""
    frames = np.frombuffer(rawv, np.uint8)
    if len(frames) != n_frames * h * w * 3:
        raise Mp4Error("rawv size does not match n_frames*h*w*3")
    frames = frames.reshape(n_frames, h * w * 3)

    if codec == "jpeg":
        from .jpegcodec import encode_jpeg

        bodies = [encode_jpeg(f, w, h, quality=quality) for f in frames]
        entry_cc, depth, cname = b"jpeg", 24, b"Motion JPEG"
    elif codec == "raw":
        bodies = [f.tobytes() for f in frames]
        entry_cc, depth, cname = b"raw ", 24, b"Uncompressed RGB"
    else:
        raise Mp4Error(f"encode_mp4 codec must be 'jpeg' or 'raw', got {codec!r}")

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mdat_payload = b"".join(bodies)
    # sample 0 starts right after the mdat header, which follows ftyp
    first_off = len(ftyp) + 8
    mdat = _box(b"mdat", mdat_payload)

    timescale = fps * 1000
    delta = 1000
    duration = n_frames * delta

    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">iHH", 0x00010000, 0x0100, 0)
        + b"\x00" * 8
        + struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0,
                      0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2),  # next_track_ID
    )
    tkhd = _full(
        b"tkhd", 0, 7,  # enabled | in_movie | in_preview
        struct.pack(">IIIII", 0, 0, 1, 0, duration)
        + b"\x00" * 8
        + struct.pack(">hhhh", 0, 0, 0, 0)
        + struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0,
                      0x40000000)
        + struct.pack(">II", w << 16, h << 16),
    )
    mdhd = _full(
        b"mdhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">HH", 0x55C4, 0),  # language 'und'
    )
    hdlr = _full(
        b"hdlr", 0, 0,
        struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"VideoHandler\x00",
    )
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _full(
        b"dref", 0, 0,
        struct.pack(">I", 1) + _full(b"url ", 0, 1, b""),
    )
    dinf = _box(b"dinf", dref)

    compressor = bytes([len(cname)]) + cname
    compressor = compressor + b"\x00" * (32 - len(compressor))
    entry = _box(
        entry_cc,
        b"\x00" * 6 + struct.pack(">H", 1)          # data_reference_index
        + b"\x00" * 16                               # pre_defined/reserved
        + struct.pack(">HH", w, h)
        + struct.pack(">IIIH", 0x00480000, 0x00480000, 0, 1)
        + compressor
        + struct.pack(">Hh", depth, -1),
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n_frames, delta))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n_frames, 1))
    stsz = _full(
        b"stsz", 0, 0,
        struct.pack(">II", 0, n_frames)
        + b"".join(struct.pack(">I", len(b)) for b in bodies),
    )
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, first_off))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov
