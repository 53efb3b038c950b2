"""WebP (VP8L lossless) codec for the image lanes — pure stdlib/numpy.

Same discipline as the PNG/GIF/TIFF/JPEG codecs (imagecodec.py,
gifcodec.py, tiffcodec.py, jpegcodec.py): where a published byte format
can be implemented exactly with the stdlib plus numpy, the engine ships
a real codec rather than a seam. WebP is now one of the most common
image formats on the web — a web-scale image+caption crawl is full of
``.webp`` payloads — so the dedup pipeline should decode them rather
than drop them at the seam.

Scope (WebP Container Specification + WebP Lossless Bitstream
Specification, Google; both published under a public license and
mirrored in RFC 9649):

* decode: RIFF/WEBP container walk (VP8X extended headers are walked
  structurally; ancillary chunks skipped) to the ``VP8L`` chunk, then
  the full VP8L lossless bitstream — LSB-first bit packing, simple and
  normal (code-length-coded) canonical prefix codes, the 19-symbol
  code-length code with 16/17/18 repeat semantics, optional max-symbol
  counts, LZ77 backward references with the 120-entry 2D short-distance
  neighborhood map, color-cache codes (the 0x1e35a7bd multiplicative
  hash), meta prefix-code (entropy) images, and all four transforms
  applied inverse-in-reverse-read-order: PREDICTOR (all 14 modes with
  the spec's border rules), COLOR (ColorTransformDelta = signed
  ``(t*c) >> 5``), SUBTRACT_GREEN, and COLOR_INDEXING (delta-coded
  palette, sub-byte index bundling at 1/2/4/8 indices per pixel).
* lossy ``VP8 `` streams raise a named seam error (boolean arithmetic
  decoder + loop filter — a different codec family, documented seam
  like arithmetic JPEG).
* encode: a spec-valid LOSSLESS twin, the FLAC-encoder discipline — no
  transforms, no color cache, one prefix-code group; each channel gets
  a complete balanced canonical prefix code over its present symbols
  (Kraft sum exactly 1 by construction, so decode∘encode == id for
  ARBITRARY RGB input and the format joins the 'mixed' lossless
  rotation). Alpha and distance trees collapse to zero-bit
  single-symbol codes, so pixels cost only the three channel codes.

Interop caveat (documented, count-min-placement style): the container
has no libwebp and no external ``.webp`` fixtures, so cross-library
byte interop cannot be demonstrated in-sandbox. The bitstream layout
follows the public spec text (prefix-code bits are emitted
most-significant-bit-first into the LSB-first stream, the same
DEFLATE-style convention libwebp's table builder decodes); the tests
pin hand-computed fixtures for every decoder feature — each one built
bit-by-bit from the spec's own field order, not by the encoder — plus
encoder round-trip properties.

The reference repo (apache/datasketches-cpp) has no image codecs; this
module extends the engine's training-data pipeline surface, like
jpegcodec.py and gifcodec.py (round 4) before it.
"""

from __future__ import annotations

import struct

import numpy as np


class WebpError(ValueError):
    pass


# ---------------------------------------------------------------------------
# bit I/O — VP8L packs values LSB-first within bytes
# ---------------------------------------------------------------------------

_POW2 = (np.int64(1) << np.arange(32, dtype=np.int64))


class _BitReader:
    __slots__ = ("bits", "n", "pos")

    def __init__(self, data: bytes) -> None:
        self.bits = np.unpackbits(
            np.frombuffer(data, np.uint8), bitorder="little"
        )
        self.n = int(self.bits.shape[0])
        self.pos = 0

    def read(self, nbits: int) -> int:
        if nbits == 0:
            return 0
        p = self.pos
        if p + nbits > self.n:
            raise WebpError("truncated VP8L stream")
        self.pos = p + nbits
        return int(self.bits[p : p + nbits].astype(np.int64) @ _POW2[:nbits])

    def read1(self) -> int:
        p = self.pos
        if p >= self.n:
            raise WebpError("truncated VP8L stream")
        self.pos = p + 1
        return int(self.bits[p])


class _BitWriter:
    __slots__ = ("bits",)

    def __init__(self) -> None:
        self.bits: list[int] = []

    def write(self, value: int, nbits: int) -> None:
        b = self.bits
        for i in range(nbits):
            b.append((value >> i) & 1)

    def write_code(self, code: int, length: int) -> None:
        """Prefix-code bits go out MSB-of-code first (the DEFLATE/VP8L
        convention for canonical codes in an LSB-first stream)."""
        b = self.bits
        for i in range(length - 1, -1, -1):
            b.append((code >> i) & 1)

    def getvalue(self) -> bytes:
        if not self.bits:
            return b"\x00"
        return np.packbits(
            np.asarray(self.bits, np.uint8), bitorder="little"
        ).tobytes()


# ---------------------------------------------------------------------------
# canonical prefix codes
# ---------------------------------------------------------------------------


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (length, code), canonical assignment: codes count up in
    order of (length, symbol) exactly as the spec's table builder."""
    syms = sorted((l, s) for s, l in enumerate(lengths) if l > 0)
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    prev = syms[0][0] if syms else 0
    for l, s in syms:
        code <<= l - prev
        prev = l
        codes[s] = (l, code)
        code += 1
    return codes


class _Tree:
    __slots__ = ("single", "table", "maxlen")

    def __init__(self, lengths: list[int]) -> None:
        nz = [(s, l) for s, l in enumerate(lengths) if l > 0]
        if not nz:
            raise WebpError("empty prefix code")
        if len(nz) == 1:
            # one symbol: zero bits per read
            self.single: int | None = nz[0][0]
            self.table: dict[tuple[int, int], int] = {}
            self.maxlen = 0
            return
        self.single = None
        maxlen = max(l for _, l in nz)
        kraft = sum(1 << (maxlen - l) for _, l in nz)
        if kraft != (1 << maxlen):
            raise WebpError("prefix code is not complete")
        self.maxlen = maxlen
        self.table = {
            (l, c): s for s, (l, c) in _canonical_codes(lengths).items()
        }

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        length = 0
        table = self.table
        while length < self.maxlen:
            code = (code << 1) | br.read1()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise WebpError("invalid prefix code in stream")


# order in which the 19 code-length-code lengths are transmitted
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


def _read_code_lengths(br: _BitReader, alphabet_size: int) -> list[int]:
    num_clc = 4 + br.read(4)
    if num_clc > 19:
        raise WebpError("more than 19 code length codes")
    clc_lengths = [0] * 19
    for i in range(num_clc):
        clc_lengths[_CLC_ORDER[i]] = br.read(3)
    clc = _Tree(clc_lengths)
    if br.read1():
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev_nz = 8
    pos = 0
    while pos < alphabet_size and max_symbol > 0:
        max_symbol -= 1
        s = clc.read(br)
        if s < 16:
            lengths[pos] = s
            pos += 1
            if s:
                prev_nz = s
        else:
            if s == 16:
                rep, fill = 3 + br.read(2), prev_nz
            elif s == 17:
                rep, fill = 3 + br.read(3), 0
            else:
                rep, fill = 11 + br.read(7), 0
            if pos + rep > alphabet_size:
                raise WebpError("code length repeat overflows alphabet")
            if fill:
                lengths[pos : pos + rep] = [fill] * rep
            pos += rep
    return lengths


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _Tree:
    if br.read1():  # simple code
        num_symbols = 1 + br.read1()
        if br.read1():
            s0 = br.read(8)
        else:
            s0 = br.read1()
        # validate BEFORE indexing: an out-of-alphabet symbol in a
        # malformed stream must surface as WebpError (the codec's named
        # error contract), not a bare IndexError from lengths[s]
        if s0 >= alphabet_size:
            raise WebpError("simple code symbol out of alphabet")
        lengths = [0] * alphabet_size
        if num_symbols == 2:
            s1 = br.read(8)
            if s0 == s1 or s1 >= alphabet_size:
                raise WebpError("invalid simple prefix code symbols")
            lengths[s0] = lengths[s1] = 1
        else:
            lengths[s0] = 1
        return _Tree(lengths)
    return _Tree(_read_code_lengths(br, alphabet_size))


# ---------------------------------------------------------------------------
# LZ77 helpers
# ---------------------------------------------------------------------------


def _prefix_value(br: _BitReader, code: int) -> int:
    """length / distance prefix decoding (spec 5.2.3)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


# 2D neighborhood map for distance codes 1..120 (spec 5.2.3): (dx, dy)
# with plane distance dx + dy * xsize, clamped to >= 1. Reconstructed
# from the spec's published code<->offset table (the inverse of
# libwebp's plane_to_code_lut); the table is a permutation of 0..119
# over the x in [-7, 8], y in [0, 7] neighborhood, which the module
# test re-verifies.
_DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
)
assert len(_DIST_MAP) == 120


def _plane_distance(code: int, xsize: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _DIST_MAP[code - 1]
    d = dx + dy * xsize
    return d if d >= 1 else 1


def _sub_size(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


# ---------------------------------------------------------------------------
# spatially-coded image (the shared LZ77 + prefix-code pixel stream)
# ---------------------------------------------------------------------------


def _decode_pixels(
    br: _BitReader, w: int, h: int, allow_meta: bool
) -> np.ndarray:
    """Decode one spatially-coded ARGB image (spec 6) to a (h*w,)
    uint32 array 0xAARRGGBB. ``allow_meta`` is True only for the
    top-level image (transform/entropy sub-images never recurse)."""
    cache_bits = 0
    if br.read1():
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise WebpError(f"color cache bits {cache_bits} out of range")
    meta = None
    meta_w = huff_bits = 0
    num_groups = 1
    if allow_meta and br.read1():
        huff_bits = br.read(3) + 2
        meta_w, meta_h = _sub_size(w, huff_bits), _sub_size(h, huff_bits)
        meta_px = _decode_pixels(br, meta_w, meta_h, False)
        meta = (((meta_px >> 16) & 0xFF) << 8) | ((meta_px >> 8) & 0xFF)
        meta = meta.astype(np.int64)
        num_groups = int(meta.max()) + 1
    green_size = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    groups = []
    for _ in range(num_groups):
        groups.append(
            (
                _read_prefix_code(br, green_size),
                _read_prefix_code(br, 256),
                _read_prefix_code(br, 256),
                _read_prefix_code(br, 256),
                _read_prefix_code(br, 40),
            )
        )
    cache = (
        np.zeros(1 << cache_bits, np.uint32) if cache_bits else None
    )
    out = np.zeros(w * h, np.uint32)
    n = w * h
    pos = 0
    x = 0
    group = groups[0]
    gtree, rtree, btree, atree, dtree = group
    while pos < n:
        if meta is not None:
            y = pos // w
            gi = int(meta[(y >> huff_bits) * meta_w + (x >> huff_bits)])
            gtree, rtree, btree, atree, dtree = groups[gi]
        s = gtree.read(br)
        if s < 256:
            r = rtree.read(br)
            b = btree.read(br)
            a = atree.read(br)
            px = (a << 24) | (r << 16) | (s << 8) | b
            out[pos] = px
            if cache is not None:
                cache[((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - cache_bits)] = px
            pos += 1
            x += 1
            if x == w:
                x = 0
        elif s < 280:
            length = _prefix_value(br, s - 256)
            dist = _plane_distance(_prefix_value(br, dtree.read(br)), w)
            if dist > pos or pos + length > n:
                raise WebpError("LZ77 reference outside decoded region")
            for _ in range(length):
                px = int(out[pos - dist])
                out[pos] = px
                if cache is not None:
                    cache[
                        ((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - cache_bits)
                    ] = px
                pos += 1
                x += 1
                if x == w:
                    x = 0
        else:
            if cache is None:
                raise WebpError("color cache code without a color cache")
            px = int(cache[s - 280])
            out[pos] = px
            # re-keying an existing entry with its own value is the
            # identity, so inserting on every emitted pixel matches the
            # spec's "as pixels are decoded" rule
            cache[((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - cache_bits)] = px
            pos += 1
            x += 1
            if x == w:
                x = 0
    return out


# ---------------------------------------------------------------------------
# inverse transforms
# ---------------------------------------------------------------------------


def _avg2(a: int, b: int) -> int:
    return (a + b) >> 1


def _clamp(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _unpack(px: int) -> tuple[int, int, int, int]:
    return (px >> 24) & 0xFF, (px >> 16) & 0xFF, (px >> 8) & 0xFF, px & 0xFF


def _pack(a: int, r: int, g: int, b: int) -> int:
    return (a << 24) | (r << 16) | (g << 8) | b


def _predict(mode: int, left: int, top: int, tl: int, tr: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    la, lr, lg, lb = _unpack(left)
    ta, trr, tg, tb = _unpack(top)
    if mode == 5:
        xa, xr, xg, xb = _unpack(tr)
        return _pack(
            _avg2(_avg2(la, xa), ta),
            _avg2(_avg2(lr, xr), trr),
            _avg2(_avg2(lg, xg), tg),
            _avg2(_avg2(lb, xb), tb),
        )
    ca, cr, cg, cb = _unpack(tl)
    if mode == 6:
        return _pack(_avg2(la, ca), _avg2(lr, cr), _avg2(lg, cg), _avg2(lb, cb))
    if mode == 7:
        return _pack(_avg2(la, ta), _avg2(lr, trr), _avg2(lg, tg), _avg2(lb, tb))
    if mode == 8:
        return _pack(_avg2(ca, ta), _avg2(cr, trr), _avg2(cg, tg), _avg2(cb, tb))
    if mode == 9:
        xa, xr, xg, xb = _unpack(tr)
        return _pack(
            _avg2(ta, xa), _avg2(trr, xr), _avg2(tg, xg), _avg2(tb, xb)
        )
    if mode == 10:
        xa, xr, xg, xb = _unpack(tr)
        return _pack(
            _avg2(_avg2(la, ca), _avg2(ta, xa)),
            _avg2(_avg2(lr, cr), _avg2(trr, xr)),
            _avg2(_avg2(lg, cg), _avg2(tg, xg)),
            _avg2(_avg2(lb, cb), _avg2(tb, xb)),
        )
    if mode == 11:
        # Select: Manhattan distance of L and T to the L+T-TL estimate —
        # |est-L| collapses to |T-TL| and |est-T| to |L-TL|; ties go to T
        pl = abs(ta - ca) + abs(trr - cr) + abs(tg - cg) + abs(tb - cb)
        pt = abs(la - ca) + abs(lr - cr) + abs(lg - cg) + abs(lb - cb)
        return left if pl < pt else top
    if mode == 12:
        return _pack(
            _clamp(la + ta - ca),
            _clamp(lr + trr - cr),
            _clamp(lg + tg - cg),
            _clamp(lb + tb - cb),
        )
    if mode == 13:
        out = []
        for lc, tc, cc in ((la, ta, ca), (lr, trr, cr), (lg, tg, cg), (lb, tb, cb)):
            av = _avg2(lc, tc)
            d = av - cc
            # C truncating division toward zero (the spec's "/ 2")
            half = d // 2 if d >= 0 else -((-d) // 2)
            out.append(_clamp(av + half))
        return _pack(*out)
    raise WebpError(f"predictor mode {mode} out of range")


def _inverse_predictor(
    px: np.ndarray, w: int, h: int, size_bits: int, modes: np.ndarray
) -> np.ndarray:
    bw = _sub_size(w, size_bits)
    out = px.astype(np.int64)
    for pos in range(w * h):
        y, x = divmod(pos, w)
        if pos == 0:
            pred = 0xFF000000
        elif y == 0:
            pred = int(out[pos - 1])
        elif x == 0:
            pred = int(out[pos - w])
        else:
            mode = int(
                (modes[(y >> size_bits) * bw + (x >> size_bits)] >> 8) & 0xFF
            )
            # TR at the right border indexes pos-w+1 in the flat plane —
            # the first pixel of the CURRENT row, exactly as the spec's
            # contiguous-scan-order rule has it
            pred = _predict(
                mode,
                int(out[pos - 1]),
                int(out[pos - w]),
                int(out[pos - w - 1]),
                int(out[pos - w + 1]),
            )
        pa, pr, pg, pb = _unpack(int(pred))
        v = int(out[pos])
        out[pos] = _pack(
            (pa + ((v >> 24) & 0xFF)) & 0xFF,
            (pr + ((v >> 16) & 0xFF)) & 0xFF,
            (pg + ((v >> 8) & 0xFF)) & 0xFF,
            (pb + (v & 0xFF)) & 0xFF,
        )
    return out.astype(np.uint32)


def _ct_delta(t: int, c: int) -> int:
    """ColorTransformDelta: signed int8 t, signed int8 c, arithmetic
    right shift — Python's // on the product matches C's >> here."""
    if t > 127:
        t -= 256
    if c > 127:
        c -= 256
    return (t * c) >> 5


def _inverse_color_transform(
    px: np.ndarray, w: int, h: int, size_bits: int, ctes: np.ndarray
) -> np.ndarray:
    bw = _sub_size(w, size_bits)
    out = px.copy()
    for pos in range(w * h):
        y, x = divmod(pos, w)
        cte = int(ctes[(y >> size_bits) * bw + (x >> size_bits)])
        red_to_blue = (cte >> 16) & 0xFF
        green_to_blue = (cte >> 8) & 0xFF
        green_to_red = cte & 0xFF
        v = int(out[pos])
        g = (v >> 8) & 0xFF
        r = (v >> 16) & 0xFF
        b = v & 0xFF
        r = (r + _ct_delta(green_to_red, g)) & 0xFF
        b = (b + _ct_delta(green_to_blue, g)) & 0xFF
        b = (b + _ct_delta(red_to_blue, r)) & 0xFF
        out[pos] = (v & 0xFF000000) | (r << 16) | (g << 8) | b
    return out


def _inverse_subtract_green(px: np.ndarray) -> np.ndarray:
    g = (px >> 8) & 0xFF
    r = ((px >> 16) & 0xFF) + g
    b = (px & 0xFF) + g
    return (
        (px & 0xFF000000)
        | ((r & 0xFF) << 16)
        | ((px >> 8) & 0xFF) << 8
        | (b & 0xFF)
    ).astype(np.uint32)


def _inverse_color_indexing(
    px: np.ndarray, full_w: int, h: int, width_bits: int, palette: np.ndarray
) -> np.ndarray:
    packed_w = _sub_size(full_w, width_bits)
    idx_bits = 8 >> width_bits
    per = 1 << width_bits
    greens = ((px >> 8) & 0xFF).reshape(h, packed_w)
    # unbundle: index j within a packed pixel sits at bit j*idx_bits
    cols = np.arange(full_w)
    src = greens[:, cols >> width_bits]
    shift = (cols & (per - 1)) * idx_bits
    idx = (src >> shift[None, :]) & ((1 << idx_bits) - 1)
    if int(idx.max(initial=0)) >= palette.shape[0]:
        raise WebpError("palette index out of range")
    return palette[idx.reshape(-1)].astype(np.uint32)


# ---------------------------------------------------------------------------
# image stream (transforms + pixels) and the container
# ---------------------------------------------------------------------------


def _decode_image_stream(br: _BitReader, w: int, h: int) -> np.ndarray:
    """Top-level VP8L image: read transforms (mutating the coded
    width), decode pixels, apply inverses in reverse read order."""
    transforms: list[tuple] = []
    seen: set[int] = set()
    xsize = w
    while br.read1():
        t = br.read(2)
        if t in seen:
            raise WebpError("transform type repeated")
        seen.add(t)
        if t in (0, 1):  # PREDICTOR / COLOR share the block layout
            size_bits = br.read(3) + 2
            sub = _decode_pixels(
                br, _sub_size(xsize, size_bits), _sub_size(h, size_bits), False
            )
            transforms.append(("pred" if t == 0 else "color", size_bits, sub))
        elif t == 2:
            transforms.append(("subg",))
        else:  # COLOR_INDEXING
            num_colors = br.read(8) + 1
            raw_pal = _decode_pixels(br, num_colors, 1, False)
            # palette entries are component-wise deltas vs the previous
            chans = np.stack(
                [(raw_pal >> s) & 0xFF for s in (24, 16, 8, 0)], axis=1
            ).astype(np.int64)
            cum = np.cumsum(chans, axis=0) & 0xFF
            palette = (
                (cum[:, 0] << 24) | (cum[:, 1] << 16) | (cum[:, 2] << 8) | cum[:, 3]
            ).astype(np.uint32)
            width_bits = (
                3 if num_colors <= 2 else 2 if num_colors <= 4
                else 1 if num_colors <= 16 else 0
            )
            transforms.append(("cidx", width_bits, palette, xsize))
            xsize = _sub_size(xsize, width_bits)
    px = _decode_pixels(br, xsize, h, True)
    for tr in reversed(transforms):
        if tr[0] == "cidx":
            _, width_bits, palette, full_w = tr
            px = _inverse_color_indexing(px, full_w, h, width_bits, palette)
            xsize = full_w
        elif tr[0] == "subg":
            px = _inverse_subtract_green(px)
        elif tr[0] == "color":
            px = _inverse_color_transform(px, xsize, h, tr[1], tr[2])
        else:
            px = _inverse_predictor(px, xsize, h, tr[1], tr[2])
    if xsize != w:
        raise WebpError("color-indexing width never restored")
    return px


def decode_vp8l(payload: bytes) -> tuple[np.ndarray, int, int]:
    """Decode a raw VP8L chunk payload to ((h*w*3,) uint8 RGB, w, h).
    Alpha is decoded (it participates in transforms and the cache hash)
    and then dropped — the engine's image tables are RGB."""
    if not payload or payload[0] != 0x2F:
        raise WebpError("bad VP8L signature byte")
    br = _BitReader(bytes(payload[1:]))
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read1()  # alpha-is-used hint
    if br.read(3) != 0:
        raise WebpError("unknown VP8L version")
    px = _decode_image_stream(br, w, h)
    rgb = np.empty((w * h, 3), np.uint8)
    rgb[:, 0] = (px >> 16) & 0xFF
    rgb[:, 1] = (px >> 8) & 0xFF
    rgb[:, 2] = px & 0xFF
    return rgb.reshape(-1), w, h


def _walk_riff(buf: bytes):
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WEBP":
        raise WebpError("not a RIFF/WEBP container")
    pos = 12
    while pos + 8 <= len(buf):
        fourcc = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        payload = buf[pos + 8 : pos + 8 + size]
        if len(payload) != size:
            raise WebpError(f"truncated {fourcc!r} chunk")
        yield fourcc, payload
        pos += 8 + size + (size & 1)


def decode_webp(buf: bytes) -> tuple[np.ndarray, int, int]:
    """bytes -> ((h*w*3,) uint8 RGB, w, h). Lossless (VP8L) only; a
    lossy VP8 stream raises the documented seam error."""
    buf = bytes(buf)
    saw_lossy = False
    for fourcc, payload in _walk_riff(buf):
        if fourcc == b"VP8L":
            return decode_vp8l(payload)
        if fourcc == b"VP8 ":
            saw_lossy = True
    if saw_lossy:
        raise WebpError(
            "lossy VP8 webp is a documented seam (boolean arithmetic "
            "decoder); only VP8L lossless streams decode here"
        )
    raise WebpError("no VP8L chunk in WEBP container")


def sniff_webp_dims(buf: bytes) -> tuple[int, int]:
    """(w, h) from the VP8L header's 14-bit fields — no pixel decode."""
    for fourcc, payload in _walk_riff(bytes(buf)):
        if fourcc == b"VP8L":
            if len(payload) < 5 or payload[0] != 0x2F:
                raise WebpError("bad VP8L signature byte")
            b0, b1, b2, b3 = payload[1], payload[2], payload[3], payload[4]
            w = 1 + (b0 | ((b1 & 0x3F) << 8))
            h = 1 + ((b1 >> 6) | (b2 << 2) | ((b3 & 0x0F) << 10))
            return w, h
        if fourcc == b"VP8X":
            # canvas size lives in VP8X too, but the engine's contract
            # is the coded VP8L frame — keep walking to it
            continue
    raise WebpError("no VP8L chunk in WEBP container")


# ---------------------------------------------------------------------------
# encoder — spec-valid lossless twin (no transforms, literal-only)
# ---------------------------------------------------------------------------


def _balanced_lengths(symbols: list[int], alphabet_size: int) -> list[int]:
    """Complete canonical code over the present symbols: with n >= 3
    distinct symbols and k = ceil(log2 n), the first (2^k - n) symbols
    get length k-1 and the rest k — Kraft sum exactly 1."""
    n = len(symbols)
    k = max(1, (n - 1).bit_length())
    short = (1 << k) - n
    lengths = [0] * alphabet_size
    for i, s in enumerate(sorted(symbols)):
        lengths[s] = k - 1 if i < short else k
    return lengths


def _write_simple_code(bw: _BitWriter, syms: list[int]) -> None:
    bw.write(1, 1)
    syms = sorted(syms)
    bw.write(len(syms) - 1, 1)
    s0 = syms[0]
    if s0 <= 1:
        bw.write(0, 1)
        bw.write(s0, 1)
    else:
        bw.write(1, 1)
        bw.write(s0, 8)
    if len(syms) == 2:
        bw.write(syms[1], 8)


def _write_code_lengths(bw: _BitWriter, lengths: list[int]) -> None:
    """Normal-code header: code-length tokens (literals + 17/18 zero
    runs), themselves coded with a balanced 19-symbol CLC."""
    tokens: list[tuple[int, int, int]] = []  # (symbol, extra, extra_bits)
    i = 0
    n = len(lengths)
    while i < n:
        if lengths[i] == 0:
            run = 1
            while i + run < n and lengths[i + run] == 0:
                run += 1
            i += run
            while run >= 11:
                take = min(run, 138)
                tokens.append((18, take - 11, 7))
                run -= take
            if run >= 3:
                tokens.append((17, run - 3, 3))
                run = 0
            tokens.extend((0, 0, 0) for _ in range(run))
        else:
            tokens.append((lengths[i], 0, 0))
            i += 1
    used = sorted({t[0] for t in tokens})
    if len(used) == 1:
        clc_lengths = [0] * 19
        clc_lengths[used[0]] = 1
    elif len(used) == 2:
        clc_lengths = [0] * 19
        clc_lengths[used[0]] = clc_lengths[used[1]] = 1
    else:
        clc_lengths = _balanced_lengths(used, 19)
    bw.write(0, 1)  # not simple
    bw.write(15, 4)  # transmit all 19 CLC lengths
    for s in _CLC_ORDER:
        bw.write(clc_lengths[s], 3)
    bw.write(0, 1)  # no explicit max-symbol: reader fills the alphabet
    codes = _canonical_codes(clc_lengths)
    for sym, extra, ebits in tokens:
        length, code = codes[sym]
        # single-symbol CLC trees read zero bits — emit nothing
        if len(used) > 1:
            bw.write_code(code, length)
        if ebits:
            bw.write(extra, ebits)


def _write_prefix_code(
    bw: _BitWriter, present: list[int], alphabet_size: int
) -> dict[int, tuple[int, int]]:
    """Emit a prefix-code header for the given present symbols; return
    symbol -> (length, code) for the body writer."""
    if len(present) <= 2 and max(present) <= 255:
        _write_simple_code(bw, present)
        if len(present) == 1:
            return {present[0]: (0, 0)}
        lengths = [0] * alphabet_size
        for s in present:
            lengths[s] = 1
        return _canonical_codes(lengths)
    lengths = _balanced_lengths(present, alphabet_size)
    _write_code_lengths(bw, lengths)
    return _canonical_codes(lengths)


def encode_vp8l(pixels: np.ndarray, w: int, h: int) -> bytes:
    px = np.asarray(pixels, np.uint8).reshape(-1)
    if px.shape[0] != w * h * 3:
        raise WebpError("pixel buffer does not match dimensions")
    if not (1 <= w <= 1 << 14 and 1 <= h <= 1 << 14):
        raise WebpError("dimensions exceed VP8L's 14-bit fields")
    rgb = px.reshape(-1, 3)
    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # no alpha
    bw.write(0, 3)  # version 0
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix image
    greens = rgb[:, 1]
    reds = rgb[:, 0]
    blues = rgb[:, 2]
    gcodes = _write_prefix_code(
        bw, sorted(np.unique(greens).tolist()), 256 + 24
    )
    rcodes = _write_prefix_code(bw, sorted(np.unique(reds).tolist()), 256)
    bcodes = _write_prefix_code(bw, sorted(np.unique(blues).tolist()), 256)
    _write_simple_code(bw, [255])  # alpha: zero-bit single-symbol
    _write_simple_code(bw, [0])  # distance: never referenced
    bits = bw.bits
    gl = {s: c for s, c in gcodes.items()}
    rl = {s: c for s, c in rcodes.items()}
    bl = {s: c for s, c in bcodes.items()}
    # pre-render each symbol's MSB-first bit pattern once
    gbits = {s: [(c >> i) & 1 for i in range(l - 1, -1, -1)] for s, (l, c) in gl.items()}
    rbits = {s: [(c >> i) & 1 for i in range(l - 1, -1, -1)] for s, (l, c) in rl.items()}
    bbits = {s: [(c >> i) & 1 for i in range(l - 1, -1, -1)] for s, (l, c) in bl.items()}
    for r, g, b in rgb.tolist():
        bits.extend(gbits[g])
        bits.extend(rbits[r])
        bits.extend(bbits[b])
    return b"\x2f" + bw.getvalue()


def encode_webp(pixels: np.ndarray, w: int, h: int) -> bytes:
    """(h*w*3,) uint8 RGB -> a lossless RIFF/WEBP (VP8L) stream."""
    vp8l = encode_vp8l(pixels, w, h)
    chunk = b"VP8L" + struct.pack("<I", len(vp8l)) + vp8l
    if len(vp8l) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
