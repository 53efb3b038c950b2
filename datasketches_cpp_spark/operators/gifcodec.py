"""GIF (87a/89a) codec for the image and video lanes — pure stdlib/numpy.

Same discipline as the PNG decoder (imagecodec.py) and the WAV/AVI
containers (audiocodec.py, avicodec.py): where a published byte format
can be implemented exactly with the stdlib plus numpy, the engine ships a
real codec rather than a seam. GIF is the remaining common *web* image
format after PNG/JPEG — a web-scale image+caption crawl contains GIFs,
both still and animated, so the dedup pipeline should decode them rather
than drop them at the seam.

Scope (GIF89a specification, CompuServe 1990; LZW per the spec's
Appendix F variable-code variant):

* decode: GIF87a and GIF89a; global and local color tables; interlaced
  images (the 8/8/4/2 four-pass row order); transparency via the Graphic
  Control Extension; animated streams with disposal methods 0/1 (keep),
  2 (restore to background) and 3 (restore to previous); all extension
  blocks skipped structurally (sub-block chains), so comments/NETSCAPE
  loops/plain-text blocks never break the parse.
* ``decode_gif`` renders the FIRST frame composited onto the logical
  screen — the image-lane entry (one still image per row).
* ``decode_gif_frames`` renders EVERY frame fully composited (what a
  player shows, not the raw sub-rectangles) and returns the engine's
  rawv layout (concatenated top-down RGB frames), so an animated GIF
  flows through the frame-sampling pHash video lane unchanged
  (operators/videodedup.py, multimodal.sample_frames).
* encode: exact-palette writer — GIF is an indexed-color format, so
  encoding is LOSSLESS iff the image has ≤ 256 distinct colors and a
  hard error otherwise (no silent quantization: the registry's contract
  is decode-identity or a declared lossy gate, never "approximately
  stored"). ``encode_gif_animation`` writes multi-frame fixtures with
  per-frame palettes, optional transparency and disposal — used by the
  tests to drive the compositing paths from independently-built streams.

LZW notes: decoder implements the deferred-clear rule (a full table stays
usable at 12 bits until the encoder sends CLEAR); encoder emits CLEAR on
table overflow and grows its code width exactly one entry ahead of the
decoder (the emitted code stream is read against the decoder's table
size, which lags the encoder's by one entry — see _lzw_encode).

The reference repo (apache/datasketches-cpp) has no image codecs; this
module extends the engine's training-data pipeline surface, like
jpegcodec.py (round-4) before it.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_CODE_SIZE = 12
_TABLE_LIMIT = 1 << _MAX_CODE_SIZE  # 4096


class GifError(ValueError):
    """Malformed or unsupported GIF payload (fail-fast seam)."""


# --------------------------------------------------------------------------
# LZW (GIF variant: variable 3..12-bit codes, LSB-first bit packing)
# --------------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF-LZW code stream → (n_pixels,) uint8 palette indices."""
    if not 2 <= min_code_size <= 11:
        raise GifError(f"LZW min code size {min_code_size} out of range")
    clear = 1 << min_code_size
    end = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    code_size = min_code_size + 1
    prev = -1
    out: list[bytes] = []
    out_len = 0

    bitbuf = 0
    bitcnt = 0
    pos = 0
    n = len(data)
    while True:
        while bitcnt < code_size:
            if pos >= n:
                # Spec requires an END code, but truncated-at-pixel-count
                # streams exist in the wild; accept iff we already have
                # every pixel.
                if out_len >= n_pixels:
                    pixels = np.frombuffer(b"".join(out), np.uint8)
                    return pixels[:n_pixels]
                raise GifError("LZW stream truncated")
            bitbuf |= data[pos] << bitcnt
            bitcnt += 8
            pos += 1
        code = bitbuf & ((1 << code_size) - 1)
        bitbuf >>= code_size
        bitcnt -= code_size

        if code == clear:
            table = list(base)
            code_size = min_code_size + 1
            prev = -1
            continue
        if code == end:
            break
        if prev < 0:
            if code >= clear:
                raise GifError("first LZW code after clear is not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < _TABLE_LIMIT:
                table.append(table[prev] + entry[:1])
        elif code == len(table):
            entry = table[prev] + table[prev][:1]
            if len(table) < _TABLE_LIMIT:
                table.append(entry)
        else:
            raise GifError(f"LZW code {code} beyond table size {len(table)}")
        out.append(entry)
        out_len += len(entry)
        if (
            len(table) == (1 << code_size)
            and code_size < _MAX_CODE_SIZE
        ):
            code_size += 1
        prev = code
        if out_len >= n_pixels:
            break

    pixels = np.frombuffer(b"".join(out), np.uint8)
    if pixels.shape[0] < n_pixels:
        raise GifError(
            f"LZW stream decodes {pixels.shape[0]} pixels, image needs "
            f"{n_pixels}"
        )
    return pixels[:n_pixels]


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """(n,) uint8 palette indices → GIF-LZW code stream (real LZW, not the
    clear-per-symbol 'uncompressed GIF' trick — the tests keep an
    independent writer of THAT form as a decoder cross-check).

    Code-width discipline: the decoder's table lags the encoder's by one
    entry (it registers entry t only after reading code t+1), so the
    width of an emitted code must fit the DECODER's table size — grow
    when ``next_code - 1`` reaches the current width's capacity.
    """
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    bitbuf = 0
    bitcnt = 0

    def emit(code: int, width: int) -> None:
        nonlocal bitbuf, bitcnt
        bitbuf |= code << bitcnt
        bitcnt += width
        while bitcnt >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            bitcnt -= 8

    table: dict[tuple[int, int], int] = {}
    next_code = end + 1
    code_size = min_code_size + 1
    emit(clear, code_size)
    it = iter(np.asarray(indices, np.uint8).tolist())
    try:
        w_code = next(it)
    except StopIteration:
        emit(end, code_size)
        if bitcnt:
            out.append(bitbuf & 0xFF)
        return bytes(out)
    for k in it:
        key = (w_code, k)
        found = table.get(key)
        if found is not None:
            w_code = found
            continue
        emit(w_code, code_size)
        if next_code < _TABLE_LIMIT:
            table[key] = next_code
            next_code += 1
            if next_code - 1 == (1 << code_size) and code_size < _MAX_CODE_SIZE:
                code_size += 1
        else:
            emit(clear, code_size)
            table.clear()
            next_code = end + 1
            code_size = min_code_size + 1
        w_code = k
    emit(w_code, code_size)
    # The decoder appends one more table entry after reading that final
    # data code and runs its growth check BEFORE reading END — mirror it,
    # or END lands one bit short exactly when the table size hits a power
    # of two on the last symbol.
    if next_code == (1 << code_size) and code_size < _MAX_CODE_SIZE:
        code_size += 1
    emit(end, code_size)
    if bitcnt:
        out.append(bitbuf & 0xFF)
    return bytes(out)


# --------------------------------------------------------------------------
# container parse
# --------------------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_rows(h: int) -> np.ndarray:
    """Stored-row → display-row permutation for interlaced images."""
    return np.concatenate(
        [np.arange(start, h, step) for start, step in _INTERLACE_PASSES]
    )


def _read_subblocks(buf: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate a sub-block chain starting at ``pos``; return
    (payload, position after the block terminator)."""
    parts = []
    n = len(buf)
    while True:
        if pos >= n:
            raise GifError("unterminated sub-block chain")
        size = buf[pos]
        pos += 1
        if size == 0:
            return b"".join(parts), pos
        if pos + size > n:
            raise GifError("truncated sub-block")
        parts.append(buf[pos : pos + size])
        pos += size


def _parse_frames(buf: bytes, max_frames: int | None = None):
    """→ (w, h, background_rgb, frames). Each frame is a dict with the
    sub-rectangle geometry, decoded indices, its palette, transparency
    index (or -1) and disposal method."""
    if len(buf) < 13 or buf[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifError("not a GIF87a/GIF89a stream")
    w, h, packed, bg_idx, _aspect = struct.unpack_from("<HHBBB", buf, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        size = 2 << (packed & 0x07)
        if pos + 3 * size > len(buf):
            raise GifError("truncated global color table")
        gct = np.frombuffer(buf[pos : pos + 3 * size], np.uint8).reshape(size, 3)
        pos += 3 * size
    background = (
        tuple(int(c) for c in gct[bg_idx]) if gct is not None and bg_idx < len(gct)
        else (0, 0, 0)
    )

    frames: list[dict] = []
    transparent = -1
    disposal = 0
    n = len(buf)
    while pos < n:
        marker = buf[pos]
        pos += 1
        if marker == 0x3B:  # trailer
            break
        if marker == 0x21:  # extension
            if pos >= n:
                raise GifError("truncated extension block")
            label = buf[pos]
            pos += 1
            payload, pos = _read_subblocks(buf, pos)
            if label == 0xF9 and len(payload) >= 4:  # graphic control
                gce_packed = payload[0]
                disposal = (gce_packed >> 2) & 0x07
                transparent = payload[3] if gce_packed & 0x01 else -1
            continue
        if marker != 0x2C:
            raise GifError(f"unexpected block marker 0x{marker:02x}")
        if pos + 9 > n:
            raise GifError("truncated image descriptor")
        left, top, fw, fh, ipacked = struct.unpack_from("<HHHHB", buf, pos)
        pos += 9
        if fw == 0 or fh == 0 or left + fw > w or top + fh > h:
            raise GifError(
                f"frame rect {fw}x{fh}@({left},{top}) outside {w}x{h} screen"
            )
        palette = gct
        if ipacked & 0x80:
            size = 2 << (ipacked & 0x07)
            if pos + 3 * size > n:
                raise GifError("truncated local color table")
            palette = np.frombuffer(buf[pos : pos + 3 * size], np.uint8).reshape(
                size, 3
            )
            pos += 3 * size
        if palette is None:
            raise GifError("image has neither local nor global color table")
        if pos >= n:
            raise GifError("missing LZW minimum code size")
        mcs = buf[pos]
        pos += 1
        data, pos = _read_subblocks(buf, pos)
        idx = _lzw_decode(data, mcs, fw * fh).reshape(fh, fw)
        if ipacked & 0x40:
            rows = _interlace_rows(fh)
            de = np.empty_like(idx)
            de[rows] = idx
            idx = de
        if np.any(idx >= len(palette)):
            raise GifError("palette index beyond color table size")
        frames.append(
            {
                "left": left, "top": top, "w": fw, "h": fh,
                "indices": idx, "palette": palette,
                "transparent": transparent, "disposal": disposal,
            }
        )
        transparent = -1
        disposal = 0
        if max_frames is not None and len(frames) >= max_frames:
            break
    if not frames:
        raise GifError("GIF stream contains no image")
    return w, h, background, frames


def _composite(w: int, h: int, background, frames) -> np.ndarray:
    """Player-style compositing → (n_frames, h, w, 3) uint8."""
    canvas = np.empty((h, w, 3), np.uint8)
    canvas[:] = background
    out = np.empty((len(frames), h, w, 3), np.uint8)
    for i, fr in enumerate(frames):
        t, l, fw, fh = fr["top"], fr["left"], fr["w"], fr["h"]
        saved = canvas[t : t + fh, l : l + fw].copy() if fr["disposal"] == 3 else None
        rgb = fr["palette"][fr["indices"]]
        region = canvas[t : t + fh, l : l + fw]
        if fr["transparent"] >= 0:
            opaque = fr["indices"] != fr["transparent"]
            region[opaque] = rgb[opaque]
        else:
            region[:] = rgb
        out[i] = canvas
        if fr["disposal"] == 2:
            canvas[t : t + fh, l : l + fw] = background
        elif fr["disposal"] == 3:
            canvas[t : t + fh, l : l + fw] = saved
    return out


# --------------------------------------------------------------------------
# public decode
# --------------------------------------------------------------------------


def decode_gif(buf: bytes) -> tuple[np.ndarray, int, int]:
    """GIF bytes → ((h*w*3,) uint8 RGB of the first composited frame, w, h)
    — the imagecodec registry signature."""
    w, h, background, frames = _parse_frames(bytes(buf), max_frames=1)
    return _composite(w, h, background, frames)[0].reshape(-1), w, h


def decode_gif_frames(buf: bytes) -> tuple[bytes, int, int, int]:
    """Animated GIF bytes → (rawv bytes, w, h, n_frames): every frame
    fully composited, concatenated top-down RGB — the video lane's native
    layout (avicodec.to_rawv contract)."""
    w, h, background, frames = _parse_frames(bytes(buf))
    stack = _composite(w, h, background, frames)
    return stack.tobytes(), w, h, len(frames)


# --------------------------------------------------------------------------
# encode (exact palette — lossless or refuse)
# --------------------------------------------------------------------------


def _palettize(pixels: np.ndarray, w: int, h: int) -> tuple[np.ndarray, np.ndarray]:
    """(h*w*3,) uint8 RGB → (palette (p,3), indices (h*w,)). Raises when
    the image has more than 256 distinct colors — GIF is indexed color and
    this engine never silently quantizes."""
    px = np.asarray(pixels, np.uint8).reshape(-1)
    if px.shape[0] != w * h * 3:
        raise GifError(f"pixel buffer is {px.shape[0]} bytes, want {w * h * 3}")
    rgb = px.reshape(-1, 3)
    packed = (
        rgb[:, 0].astype(np.uint32) << 16
        | rgb[:, 1].astype(np.uint32) << 8
        | rgb[:, 2].astype(np.uint32)
    )
    colors, indices = np.unique(packed, return_inverse=True)
    if colors.shape[0] > 256:
        raise GifError(
            f"image has {colors.shape[0]} distinct colors; GIF holds at most "
            "256 — palettize upstream or use a truecolor format"
        )
    palette = np.stack(
        [(colors >> 16) & 0xFF, (colors >> 8) & 0xFF, colors & 0xFF], axis=1
    ).astype(np.uint8)
    return palette, indices.astype(np.uint8)


def _color_table_bits(n_colors: int) -> int:
    bits = 1
    while (1 << bits) < n_colors:
        bits += 1
    return bits


def _image_block(
    indices: np.ndarray, palette: np.ndarray, w: int, h: int,
    left: int = 0, top: int = 0, interlace: bool = False, local: bool = True,
) -> bytes:
    bits = _color_table_bits(len(palette))
    mcs = max(2, bits)
    idx = indices.reshape(h, w)
    if interlace:
        idx = idx[_interlace_rows(h)]
    out = bytearray()
    packed = (0x80 | (bits - 1)) if local else 0
    if interlace:
        packed |= 0x40
    out += struct.pack("<BHHHHB", 0x2C, left, top, w, h, packed)
    if local:
        table = np.zeros((1 << bits, 3), np.uint8)
        table[: len(palette)] = palette
        out += table.tobytes()
    out.append(mcs)
    data = _lzw_encode(idx.reshape(-1), mcs)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(
    pixels: np.ndarray, w: int, h: int, interlace: bool = False
) -> bytes:
    """(h*w*3,) uint8 RGB → single-image GIF89a with an exact global
    palette. Lossless by construction (decode(encode(x)) == x); images
    with more than 256 distinct colors raise GifError."""
    palette, indices = _palettize(pixels, w, h)
    bits = _color_table_bits(len(palette))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) << 4) | (bits - 1), 0, 0)
    table = np.zeros((1 << bits, 3), np.uint8)
    table[: len(palette)] = palette
    out += table.tobytes()
    out += _image_block(indices, palette, w, h, interlace=interlace, local=False)
    # the global table already carries the palette; _image_block wrote no LCT
    out.append(0x3B)
    return bytes(out)


def encode_gif_animation(
    frames: np.ndarray,
    w: int,
    h: int,
    rects: list[tuple[int, int, int, int]] | None = None,
    transparent_color: tuple[int, int, int] | None = None,
    disposals: list[int] | None = None,
    delay_cs: int = 4,
) -> bytes:
    """Multi-frame GIF89a writer (fixture/export path for the video lane).

    ``frames``: (n, h*w*3) uint8 — each frame's FULL composited content;
    when ``rects`` is given, frame i stores only the (left, top, fw, fh)
    sub-rectangle of frames[i] (the standard animated-GIF delta layout).
    ``transparent_color``: pixels of exactly this RGB inside a stored rect
    are written as transparent (the previous canvas shows through).
    ``disposals``: per-frame disposal method (default 1 = keep).
    Per-frame LOCAL palettes, so each stored rect obeys its own ≤256-color
    budget independently."""
    frames = np.asarray(frames, np.uint8).reshape(len(frames), h, w, 3)
    n = len(frames)
    if rects is None:
        rects = [(0, 0, w, h)] * n
    if disposals is None:
        disposals = [1] * n
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0, 0, 0)  # no global color table
    # NETSCAPE2.0 loop-forever block — exercises the extension-skip path in
    # every third-party decoder and marks the file as an animation.
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for i in range(n):
        left, top, fw, fh = rects[i]
        sub = frames[i, top : top + fh, left : left + fw].reshape(-1)
        palette, indices = _palettize(sub, fw, fh)
        t_idx = -1
        if transparent_color is not None:
            tc = np.array(transparent_color, np.uint8)
            hit = np.nonzero((palette == tc).all(axis=1))[0]
            if hit.size:
                t_idx = int(hit[0])
        gce_packed = (disposals[i] & 0x07) << 2 | (1 if t_idx >= 0 else 0)
        out += struct.pack(
            "<BBBBHBB", 0x21, 0xF9, 4, gce_packed, delay_cs,
            t_idx if t_idx >= 0 else 0, 0,
        )
        out += _image_block(indices, palette, fw, fh, left=left, top=top)
    out.append(0x3B)
    return bytes(out)
