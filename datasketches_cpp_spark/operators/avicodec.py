"""AVI (RIFF 'AVI ') container parsing for the video lane — pure
stdlib/numpy, the video twin of audiocodec.py's WAV support: where a
header walk (plus the in-repo JPEG codec) suffices, the container is
real; other compressed codecs stay honest NotImplementedError seams.

Scope: RIFF AVI files whose video stream is either
  * uncompressed DIB (BITMAPINFOHEADER biCompression == 0), 24-bit:
    '00db' payloads, BGR bytes, rows bottom-up, stride padded to 4 —
    the classic Windows DIB conventions; or
  * MJPEG ('MJPG'/'mjpg'/'dmb1' fourcc): each '00dc' payload is one
    complete baseline JPEG frame, decoded by operators/jpegcodec.py.
    Frames following the historical convention of omitting DHT get the
    T.81 Annex K typical tables spliced in (jpegcodec.
    with_default_huffman) — the OpenDML-era MJPG rule.
Audio streams and index chunks are skipped (stream type is taken from
the preceding strh, so non-video strf blocks are ignored, not errors).
decode_avi converts to the engine's rawv layout (concatenated top-down
unpadded RGB frames) so the whole frame-sampling pHash lane runs
unchanged.

encode_avi is the fixture twin (and a way to export lane inputs as
playable files): minimal hdrl (avih + one vids strl with a
BITMAPINFOHEADER strf) + movi with one chunk per frame; codec='dib'
writes '00db' DIBs, codec='mjpg' writes DHT-less baseline JPEG '00dc'
frames (quality high enough to clear the repo's 40 dB PSNR gate).
"""

from __future__ import annotations

import struct

import numpy as np


class AviError(ValueError):
    """Malformed or unsupported RIFF/AVI payload (fail-fast seam)."""


def _walk_chunks(buf: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_size); RIFF chunks are word-aligned."""
    while pos + 8 <= end:
        cc = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        body = pos + 8
        if body + size > end:
            raise AviError(f"truncated chunk {cc!r}: needs {size} bytes")
        yield cc, body, size
        pos = body + size + (size & 1)


def decode_avi(buf: bytes) -> tuple[bytes, int, int, int]:
    """AVI bytes → (rawv frame bytes, w, h, n_frames).

    rawv = concatenated top-down unpadded RGB frames, the video lane's
    native layout (multimodal.sample_frames)."""
    if len(buf) < 12 or buf[0:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise AviError("not a RIFF/AVI stream")
    w = h = None
    codec = None  # 'dib' | 'mjpg'
    frames: list[tuple[int, bytes]] = []  # (stream ordinal, body)
    cur_stream = [b""]  # fccType of the most recent strh
    stream_idx = [-1]  # strh ordinal — data chunks carry it as 'NN'
    vid_idx = [None]  # ordinal of the FIRST vids stream
    topdown = [False]

    _MJPG = (b"MJPG", b"mjpg", b"dmb1")

    def walk_list(pos: int, end: int) -> None:
        nonlocal w, h, codec
        for cc, body, size in _walk_chunks(buf, pos, end):
            if cc == b"LIST":
                kind = buf[body : body + 4]
                # 'rec ' groups interleaved frames inside movi
                if kind in (b"hdrl", b"strl", b"movi", b"rec "):
                    walk_list(body + 4, body + size)
            elif cc == b"strh":
                stream_idx[0] += 1
                cur_stream[0] = buf[body : body + 4]
                if cur_stream[0] == b"vids" and vid_idx[0] is None:
                    vid_idx[0] = stream_idx[0]
            elif cc == b"strf" and cur_stream[0] == b"vids" and w is None:
                if size < 40:
                    raise AviError("strf BITMAPINFOHEADER too short")
                (_bisize, biw, bih, _planes, bcnt, comp) = struct.unpack_from(
                    "<IiiHHI", buf, body
                )
                fourcc = struct.pack("<I", comp)
                if comp == 0:
                    if bcnt != 24:
                        raise AviError(
                            f"only 24-bit DIB frames supported, got {bcnt}"
                        )
                    codec = "dib"
                elif fourcc in _MJPG:
                    codec = "mjpg"
                else:
                    raise AviError(
                        f"AVI video compression {fourcc!r} unsupported; "
                        "parsed here: uncompressed DIB (BI_RGB) and MJPEG "
                        "('MJPG') — other codecs are a documented seam"
                    )
                w, h = int(biw), int(abs(bih))
                # negative biHeight means top-down; remember the sign
                topdown[0] = bih < 0
            elif cc[2:4] in (b"db", b"dc") and cc[:2].isdigit():
                # 'db'/'dc' suffixes are video-typed by definition; the
                # 2-digit prefix is the stream ordinal (01db/01dc when
                # the audio strl is declared first). Keep the ordinal so
                # the right stream is selected below.
                frames.append((int(cc[:2]), buf[body : body + size]))

    walk_list(12, len(buf))
    if w is None:
        raise AviError("AVI has no supported video stream header")
    # prefer chunks whose ordinal matches the vids strl; tolerate legacy
    # writers that label the only video stream's chunks 00db regardless
    # of strl order (db/dc chunks are video-typed either way)
    want = vid_idx[0] if vid_idx[0] is not None else 0
    matched = [b for idx, b in frames if idx == want]
    frames = matched if matched else [b for _, b in frames]
    if not frames:
        raise AviError("AVI has no frame data in movi")

    if codec == "mjpg":
        from .jpegcodec import decode_jpeg, with_default_huffman

        out = np.empty((len(frames), h * w * 3), np.uint8)
        for i, fb in enumerate(frames):
            px, fw, fh = decode_jpeg(with_default_huffman(bytes(fb)))
            if (fw, fh) != (w, h):
                raise AviError(
                    f"frame {i}: JPEG is {fw}x{fh}, stream header says {w}x{h}"
                )
            out[i] = px
        return out.tobytes(), w, h, len(frames)

    stride = (w * 3 + 3) & ~3
    expect = stride * h
    out = np.empty((len(frames), h, w, 3), np.uint8)
    for i, fb in enumerate(frames):
        if len(fb) != expect:
            raise AviError(
                f"frame {i}: {len(fb)} bytes, expected {expect} "
                f"(stride {stride} x {h})"
            )
        rows = np.frombuffer(fb, np.uint8).reshape(h, stride)[:, : w * 3]
        img = rows.reshape(h, w, 3)
        if not topdown[0]:
            img = img[::-1]  # DIB rows are bottom-up
        out[i] = img[:, :, ::-1]  # BGR -> RGB
    return out.tobytes(), w, h, len(frames)


def encode_avi(
    rawv: bytes,
    w: int,
    h: int,
    n_frames: int,
    fps: int = 10,
    codec: str = "dib",
    quality: int = 97,
) -> bytes:
    """rawv frame bytes → minimal AVI (fixture twin).

    codec='dib' writes uncompressed 24-bit '00db' frames; codec='mjpg'
    writes one DHT-less baseline JPEG per '00dc' chunk (the historical
    MJPG convention), quality-scaled Annex K tables."""
    frames = np.frombuffer(rawv, np.uint8)
    if len(frames) != n_frames * h * w * 3:
        raise AviError("rawv size does not match n_frames*h*w*3")
    frames = frames.reshape(n_frames, h, w, 3)

    if codec == "dib":
        fourcc, chunk_cc = 0, b"00db"
        stride = (w * 3 + 3) & ~3
        pad = stride - w * 3
        frame_bodies = []
        for f in frames:
            bgr = f[::-1, :, ::-1]  # bottom-up + RGB->BGR
            rows = bgr.reshape(h, w * 3)
            if pad:
                rows = np.concatenate(
                    [rows, np.zeros((h, pad), np.uint8)], axis=1
                )
            frame_bodies.append(rows.tobytes())
        frame_sz = stride * h
        handler = b"DIB "
    elif codec == "mjpg":
        from .jpegcodec import encode_jpeg, strip_huffman

        (fourcc,) = struct.unpack("<I", b"MJPG")
        chunk_cc = b"00dc"
        frame_bodies = [
            strip_huffman(encode_jpeg(f, w, h, quality=quality)) for f in frames
        ]
        frame_sz = max(len(fb) for fb in frame_bodies)
        handler = b"MJPG"
    else:
        raise AviError(f"encode_avi codec must be 'dib' or 'mjpg', got {codec!r}")

    def chunk(cc: bytes, body: bytes) -> bytes:
        out = cc + struct.pack("<I", len(body)) + body
        return out + (b"\x00" if len(body) & 1 else b"")

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps, frame_sz * fps, 0, 0x10, n_frames, 0, 1,
        frame_sz, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + handler + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps,
                                        0, n_frames, frame_sz, 0, 0, 0)
        + struct.pack("<HHHH", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, fourcc, frame_sz,
                       0, 0, 0, 0)
    strl = chunk(b"LIST", b"strl" + chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", avih) + strl)
    movi = chunk(b"LIST", b"movi" + b"".join(chunk(chunk_cc, fb) for fb in frame_bodies))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def to_rawv(buf: bytes, fmt: str) -> tuple[bytes, int | None, int | None]:
    """Normalize a video payload to rawv bytes. 'rawv' passes through
    (dims unknown, caller supplies them); 'avi' parses the container and
    returns its own dims; anything else raises at the documented seam."""
    if fmt == "rawv":
        return buf, None, None
    if fmt == "avi":
        raw, w, h, _n = decode_avi(buf)
        return raw, w, h
    if fmt in ("mp4", "mov", "m4v"):
        from .mp4codec import decode_mp4

        raw, w, h, _n = decode_mp4(buf)
        return raw, w, h
    if fmt == "gif":
        from .gifcodec import decode_gif_frames

        raw, w, h, _n = decode_gif_frames(buf)
        return raw, w, h
    raise NotImplementedError(
        f"video decode for fmt={fmt!r} requires a codec not present in this "
        "environment; supported here: 'rawv' (concatenated raw RGB frames), "
        "'avi' (uncompressed 24-bit DIB or MJPEG), 'mp4'/'mov' (motion-JPEG "
        "or 'raw ' ISO-BMFF tracks), 'gif' (animated, composited frames)"
    )
