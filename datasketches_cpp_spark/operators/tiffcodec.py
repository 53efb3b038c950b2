"""TIFF 6.0 baseline codec for the image lanes — pure stdlib/numpy.

Same discipline as the PNG/GIF/JPEG decoders (imagecodec.py, gifcodec.py,
jpegcodec.py): where a published byte format can be implemented exactly
with the stdlib plus numpy, the engine ships a real codec rather than a
seam.  TIFF is the dominant archival / scanner / print format — a
web-scale crawl of institutional or document corpora carries TIFFs, so
the dedup pipeline should decode them rather than drop them.

Scope (TIFF 6.0 specification, Adobe 1992, Part 1 "Baseline TIFF" plus
the Part 2 LZW and Deflate extensions):

* decode: both byte orders (``II`` little-endian and ``MM`` big-endian);
  strip-based images; chunky (PlanarConfiguration 1) and planar (2)
  layouts; Compression 1 (none), 5 (LZW, de-facto "early-change" code
  widths as written by libtiff/Photoshop), 8 / 32946 (Deflate via zlib)
  and 32773 (PackBits); Predictor 2 (horizontal differencing);
  PhotometricInterpretation 0 (WhiteIsZero), 1 (BlackIsZero), 2 (RGB,
  with ExtraSamples alpha dropped like the PNG path — opaque contract)
  and 3 (palette via ColorMap).  8 bits per sample only — baseline
  bilevel/4-bit/16-bit depths and tiled layout raise ``TiffError``
  (fail-fast seams, never a silent misdecode).  Multi-page files decode
  their first IFD (one still image per table row).
* encode: little-endian chunky 8-bit RGB with Compression 'lzw'
  (default, with Predictor 2), 'deflate', 'packbits' or 'none'; strips
  sized to the spec's recommended ~8 KiB.  All four modes are LOSSLESS
  for arbitrary RGB input, so 'tiff' joins the mixed-corpus rotation
  (imagecodec.LOSSLESS_FORMATS).

LZW notes: TIFF LZW packs codes MSB-first (GIF is LSB-first) and uses
the de-facto "early change": the encoder widens the code size when the
next code to be *added* would be 2^w - 1 (511/1023/2047), one code
earlier than strictly necessary; the decoder, lagging one table entry
behind, widens at 2^w - 2.  The spec-literal "late change" variant
(written only by pre-1988 tools) is a documented non-goal.  The encoder
emits CLEAR when the table reaches 4093 entries, mirroring libtiff.

The reference repo (apache/datasketches-cpp) has no image codecs; this
module extends the engine's training-data pipeline surface, like
gifcodec.py and jpegcodec.py before it.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_CLEAR = 256
_EOI = 257
_FIRST = 258
_MAX_WIDTH = 12
_TABLE_CLEAR_AT = 4093  # libtiff: re-CLEAR one entry before the 12-bit cap


class TiffError(ValueError):
    """Malformed or unsupported TIFF payload (fail-fast seam)."""


# --------------------------------------------------------------------------
# TIFF-variant LZW (MSB-first, early change)


def _lzw_decode(data: bytes, n_expected: int) -> bytes:
    out = bytearray()
    table: list[bytes] = []
    width = 9
    acc = 0
    accbits = 0
    pos = 0
    prev: bytes | None = None
    n = len(data)
    while len(out) < n_expected:
        while accbits < width:
            if pos >= n:
                raise TiffError("truncated LZW strip")
            acc = (acc << 8) | data[pos]
            pos += 1
            accbits += 8
        code = (acc >> (accbits - width)) & ((1 << width) - 1)
        accbits -= width
        if code == _CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if code == _EOI:
            break
        if not table:
            raise TiffError("LZW strip does not start with CLEAR")
        if prev is None:
            if code >= len(table):
                # first code after CLEAR must be a literal — typed error,
                # not a bare IndexError (the fail-fast seam contract)
                raise TiffError("corrupt LZW strip (code beyond table)")
            entry = table[code]
        else:
            if code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise TiffError("corrupt LZW strip (code beyond table)")
            # early change, decoder side: one entry before the encoder's
            # 2^w - 1 threshold because the decoder lags one add behind
            if len(table) == (1 << width) - 2 and width < _MAX_WIDTH:
                width += 1
        out += entry
        prev = entry
    if len(out) < n_expected:
        raise TiffError("LZW strip shorter than expected")
    return bytes(out[:n_expected])


def _lzw_encode(data: bytes) -> bytes:
    out = bytearray()
    acc = 0
    accbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, accbits
        acc = (acc << width) | code
        accbits += width
        while accbits >= 8:
            out.append((acc >> (accbits - 8)) & 0xFF)
            accbits -= 8
        acc &= 0xFF  # keep the accumulator bounded

    table: dict[bytes, int] = {}
    next_code = _FIRST
    width = 9

    def reset() -> None:
        nonlocal table, next_code, width
        table = {bytes([i]): i for i in range(256)}
        next_code = _FIRST
        width = 9

    emit(_CLEAR, width)
    reset()
    prefix = b""
    for i in range(len(data)):
        cand = prefix + data[i : i + 1]
        if cand in table:
            prefix = cand
            continue
        emit(table[prefix], width)
        table[cand] = next_code
        next_code += 1
        # early change, encoder side: widen when the code just added
        # reached 2^w - 2, i.e. the next add would be 2^w - 1
        if next_code == (1 << width) - 1 and width < _MAX_WIDTH:
            width += 1
        if next_code == _TABLE_CLEAR_AT:
            emit(_CLEAR, width)
            reset()
        prefix = data[i : i + 1]
    if prefix:
        emit(table[prefix], width)
    emit(_EOI, width)
    if accbits:
        out.append((acc << (8 - accbits)) & 0xFF)
    return bytes(out)


# --------------------------------------------------------------------------
# PackBits (Compression 32773)


def _packbits_decode(data: bytes, n_expected: int) -> bytes:
    out = bytearray()
    pos = 0
    n = len(data)
    while len(out) < n_expected:
        if pos >= n:
            raise TiffError("truncated PackBits strip")
        ctrl = data[pos]
        pos += 1
        if ctrl < 128:  # 0..127: copy ctrl+1 literals
            end = pos + ctrl + 1
            if end > n:
                raise TiffError("truncated PackBits literal run")
            out += data[pos:end]
            pos = end
        elif ctrl > 128:  # 129..255: repeat next byte 257-ctrl times
            if pos >= n:
                raise TiffError("truncated PackBits repeat run")
            out += data[pos : pos + 1] * (257 - ctrl)
            pos += 1
        # ctrl == 128: no-op per spec
    return bytes(out[:n_expected])


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        # measure the run starting at i
        j = i + 1
        while j < n and j - i < 128 and data[j] == data[i]:
            j += 1
        if j - i >= 3 or (j - i == 2 and j == n):
            out.append(257 - (j - i))
            out.append(data[i])
            i = j
            continue
        # literal run: extend until a >=3 repeat starts (or 128 bytes)
        j = i + 1
        while (
            j < n
            and j - i < 128
            and not (j + 2 < n and data[j] == data[j + 1] == data[j + 2])
        ):
            j += 1
        out.append(j - i - 1)
        out += data[i:j]
        i = j
    return bytes(out)


# --------------------------------------------------------------------------
# IFD parsing

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8,
              11: 4, 12: 8}
_INT_FMT = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i"}


def _read_ifd(buf: bytes, off: int, bo: str) -> dict[int, list]:
    """First-IFD tag map: tag -> list of python ints (integer types only;
    RATIONAL and other types are kept raw-skipped unless needed)."""
    if off + 2 > len(buf):
        raise TiffError("IFD offset out of range")
    (count,) = struct.unpack_from(bo + "H", buf, off)
    tags: dict[int, list] = {}
    for i in range(count):
        epos = off + 2 + 12 * i
        if epos + 12 > len(buf):
            raise TiffError("truncated IFD entry")
        tag, typ, n = struct.unpack_from(bo + "HHI", buf, epos)
        size = _TYPE_SIZE.get(typ)
        if size is None or tag in tags:
            continue  # unknown type / duplicate tag: skip structurally
        total = size * n
        vpos = epos + 8
        if total > 4:
            (vpos,) = struct.unpack_from(bo + "I", buf, epos + 8)
            if vpos + total > len(buf):
                raise TiffError(f"tag {tag} value out of range")
        fmt = _INT_FMT.get(typ)
        if fmt is None:
            continue  # non-integer (RATIONAL/ASCII/...) — not needed here
        tags[tag] = list(struct.unpack_from(bo + fmt * n, buf, vpos))
    return tags


def decode_tiff(buf: bytes) -> tuple[np.ndarray, int, int]:
    """bytes -> ((h*w*3,) uint8 RGB, w, h).  First IFD of the stream."""
    if len(buf) < 8:
        raise TiffError("not a TIFF stream")
    if buf[:2] == b"II":
        bo = "<"
    elif buf[:2] == b"MM":
        bo = ">"
    else:
        raise TiffError("bad TIFF byte-order mark")
    magic, ifd_off = struct.unpack_from(bo + "HI", buf, 2)
    if magic != 42:
        raise TiffError("bad TIFF magic")
    t = _read_ifd(buf, ifd_off, bo)
    for tiled in (322, 323, 324, 325):
        if tiled in t:
            raise TiffError("tiled TIFF not supported (strips only)")
    try:
        w = t[256][0]
        h = t[257][0]
        offsets = t[273]
        counts = t[279]
    except KeyError as e:
        raise TiffError(f"missing required tag {e}") from None
    spp = t.get(277, [1])[0]
    bps = t.get(258, [1] * spp)
    if any(b != 8 for b in bps):
        raise TiffError(f"only 8 bits/sample supported, got {bps}")
    comp = t.get(259, [1])[0]
    photo = t.get(262, [1])[0]
    planar = t.get(284, [1])[0]
    predictor = t.get(317, [1])[0]
    if t.get(339, [1])[0] != 1:
        raise TiffError("only unsigned-integer SampleFormat supported")
    rps = t.get(278, [0xFFFFFFFF])[0]
    if len(offsets) != len(counts):
        raise TiffError("StripOffsets/StripByteCounts length mismatch")
    strips_per_plane = max(1, -(-h // max(1, rps)))
    n_planes = spp if planar == 2 else 1
    if len(offsets) != strips_per_plane * n_planes:
        raise TiffError("strip count does not match dimensions")

    row_samples = w * (1 if planar == 2 else spp)
    plane_bytes = h * row_samples
    planes = []
    for p in range(n_planes):
        raw = bytearray()
        for s in range(strips_per_plane):
            idx = p * strips_per_plane + s
            o, c = offsets[idx], counts[idx]
            if o + c > len(buf):
                raise TiffError("strip outside stream")
            seg = buf[o : o + c]
            rows_here = min(max(1, rps), h - s * max(1, rps))
            want = rows_here * row_samples
            if comp == 1:
                if len(seg) < want:
                    raise TiffError("uncompressed strip too short")
                raw += seg[:want]
            elif comp == 5:
                raw += _lzw_decode(seg, want)
            elif comp in (8, 32946):
                d = zlib.decompress(seg)
                if len(d) < want:
                    raise TiffError("deflate strip too short")
                raw += d[:want]
            elif comp == 32773:
                raw += _packbits_decode(seg, want)
            else:
                raise TiffError(f"unsupported Compression {comp}")
        if len(raw) != plane_bytes:
            raise TiffError("assembled plane size mismatch")
        a = np.frombuffer(bytes(raw), np.uint8).reshape(h, row_samples)
        if predictor == 2:
            ch = 1 if planar == 2 else spp
            a = (
                a.reshape(h, w, ch)
                .astype(np.uint32)
                .cumsum(axis=1, dtype=np.uint32)
                .astype(np.uint8)
                .reshape(h, row_samples)
            )
        elif predictor != 1:
            raise TiffError(f"unsupported Predictor {predictor}")
        planes.append(a)

    if planar == 2:
        px = np.stack([p.reshape(h, w) for p in planes], axis=-1)
    elif planar == 1:
        px = planes[0].reshape(h, w, spp)
    else:
        raise TiffError(f"unsupported PlanarConfiguration {planar}")

    if photo in (0, 1):
        g = px[..., 0]
        if photo == 0:
            g = 255 - g
        rgb = np.repeat(g[..., None], 3, axis=-1)
    elif photo == 2:
        if spp < 3:
            raise TiffError("RGB photometric needs >= 3 samples")
        rgb = px[..., :3]  # ExtraSamples alpha dropped (opaque contract)
    elif photo == 3:
        cmap = t.get(320)
        if not cmap or len(cmap) < 3 * 256:
            raise TiffError("palette image without a 256-entry ColorMap")
        lut = (np.asarray(cmap[: 3 * 256], np.uint32).reshape(3, 256) >> 8
               ).astype(np.uint8)
        idx = px[..., 0]
        rgb = np.stack([lut[0][idx], lut[1][idx], lut[2][idx]], axis=-1)
    else:
        raise TiffError(f"unsupported PhotometricInterpretation {photo}")
    return np.ascontiguousarray(rgb, np.uint8).reshape(-1), w, h


# --------------------------------------------------------------------------
# encoder (little-endian, chunky RGB, 8-bit)

_COMP_IDS = {"none": 1, "lzw": 5, "deflate": 8, "packbits": 32773}


def encode_tiff(
    pixels: np.ndarray, w: int, h: int, compression: str = "lzw"
) -> bytes:
    try:
        comp_id = _COMP_IDS[compression]
    except KeyError:
        raise TiffError(f"unknown compression {compression!r}") from None
    px = np.asarray(pixels, np.uint8).reshape(h, w, 3)
    predictor = 2 if compression in ("lzw", "deflate") else 1
    rps = max(1, 8192 // max(1, w * 3))
    n_strips = -(-h // rps)

    chunks = []
    for s in range(n_strips):
        rows = px[s * rps : (s + 1) * rps]
        if predictor == 2:
            rows = np.diff(
                rows.astype(np.int16), axis=1,
                prepend=np.zeros((rows.shape[0], 1, 3), np.int16),
            ).astype(np.uint8)
        raw = rows.tobytes()
        if comp_id == 1:
            chunks.append(raw)
        elif comp_id == 5:
            chunks.append(_lzw_encode(raw))
        elif comp_id == 8:
            chunks.append(zlib.compress(raw, 6))
        else:
            chunks.append(_packbits_encode(raw))

    strip_off0 = 8
    offs, pos = [], strip_off0
    for c in chunks:
        offs.append(pos)
        pos += len(c)
    if pos % 2:  # keep following structures word-aligned
        pos += 1
    bps_off = pos
    pos += 6
    arr_pos = pos  # offsets/counts arrays (only if n_strips > 1)
    if n_strips > 1:
        pos += 8 * n_strips
    ifd_off = pos

    def short(v: int) -> bytes:
        return struct.pack("<HH", v, 0)

    def entry(tag: int, typ: int, n: int, val: bytes) -> bytes:
        return struct.pack("<HHI", tag, typ, n) + val

    if n_strips > 1:
        off_val = struct.pack("<I", arr_pos)
        cnt_val = struct.pack("<I", arr_pos + 4 * n_strips)
    else:
        off_val = struct.pack("<I", offs[0])
        cnt_val = struct.pack("<I", len(chunks[0]))

    entries = [
        entry(256, 4, 1, struct.pack("<I", w)),
        entry(257, 4, 1, struct.pack("<I", h)),
        entry(258, 3, 3, struct.pack("<I", bps_off)),
        entry(259, 3, 1, short(comp_id)),
        entry(262, 3, 1, short(2)),
        entry(273, 4, n_strips, off_val),
        entry(277, 3, 1, short(3)),
        entry(278, 4, 1, struct.pack("<I", rps)),
        entry(279, 4, n_strips, cnt_val),
        entry(284, 3, 1, short(1)),
    ]
    if predictor == 2:
        entries.append(entry(317, 3, 1, short(2)))

    out = bytearray(struct.pack("<2sHI", b"II", 42, ifd_off))
    for c in chunks:
        out += c
    if len(out) % 2:
        out += b"\x00"
    out += struct.pack("<HHH", 8, 8, 8)
    if n_strips > 1:
        out += struct.pack(f"<{n_strips}I", *offs)
        out += struct.pack(f"<{n_strips}I", *(len(c) for c in chunks))
    out += struct.pack("<H", len(entries))
    for e in entries:
        out += e
    out += struct.pack("<I", 0)  # no next IFD
    return bytes(out)
