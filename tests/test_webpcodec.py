"""WebP (VP8L) codec tests.

Decoder features are driven by HAND-BUILT bitstreams — each fixture is
composed bit-by-bit in the test from the spec's own field order (an
independent test-local bit composer, not the module's encoder), and the
expected pixels are hand-computed from the spec's transform/LZ77/cache
arithmetic. The encoder is covered by decode∘encode == id properties
over shapes and symbol-distribution regimes that hit every code-header
path (simple 1/2-symbol, balanced normal, single-CL-token normal).
"""

import struct

import numpy as np
import pytest

from datasketches_cpp_spark.operators.webpcodec import (
    _DIST_MAP,
    WebpError,
    decode_webp,
    encode_webp,
    sniff_webp_dims,
)


# ---------------------------------------------------------------------------
# test-local stream composer (independent of the module's _BitWriter)
# ---------------------------------------------------------------------------


class B:
    def __init__(self):
        self.bits = []

    def put(self, v, n):
        for i in range(n):
            self.bits.append((v >> i) & 1)

    def code(self, c, length):  # canonical prefix codes go MSB-first
        for i in range(length - 1, -1, -1):
            self.bits.append((c >> i) & 1)

    def tobytes(self):
        out = bytearray((len(self.bits) + 7) // 8)
        for i, bit in enumerate(self.bits):
            out[i >> 3] |= bit << (i & 7)
        return bytes(out)


def simple1(b, s):
    b.put(1, 1)
    b.put(0, 1)
    if s <= 1:
        b.put(0, 1)
        b.put(s, 1)
    else:
        b.put(1, 1)
        b.put(s, 8)


def simple2(b, s0, s1):
    assert s0 < s1
    b.put(1, 1)
    b.put(1, 1)
    if s0 <= 1:
        b.put(0, 1)
        b.put(s0, 1)
    else:
        b.put(1, 1)
        b.put(s0, 8)
    b.put(s1, 8)


def header(b, w, h):
    b.put(w - 1, 14)
    b.put(h - 1, 14)
    b.put(0, 1)  # alpha hint
    b.put(0, 3)  # version


def wrap(b):
    vp8l = b"\x2f" + b.tobytes()
    chunk = b"VP8L" + struct.pack("<I", len(vp8l)) + vp8l
    if len(vp8l) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def rgb(out):
    return out.reshape(-1, 3)


# ---------------------------------------------------------------------------
# hand-built decoder fixtures
# ---------------------------------------------------------------------------


def test_subtract_green_transform():
    b = B()
    header(b, 2, 1)
    b.put(1, 1)  # a transform follows
    b.put(2, 2)  # SUBTRACT_GREEN
    b.put(0, 1)  # no more transforms
    b.put(0, 1)  # no color cache
    b.put(0, 1)  # no meta prefix image
    simple2(b, 100, 200)  # green
    simple2(b, 10, 30)  # red (residuals)
    simple2(b, 4, 250)  # blue (residuals)
    simple1(b, 255)  # alpha
    simple1(b, 0)  # distance
    # pixel 0: g=200 (code 1), r=10 (0), b=4 (0)
    b.code(1, 1), b.code(0, 1), b.code(0, 1)
    # pixel 1: g=100 (0), r=30 (1), b=250 (1)
    b.code(0, 1), b.code(1, 1), b.code(1, 1)
    out, w, h = decode_webp(wrap(b))
    assert (w, h) == (2, 1)
    # inverse: r += g, b += g (mod 256)
    assert rgb(out).tolist() == [[210, 200, 204], [130, 100, 94]]


def test_predictor_transform_left_mode():
    w, h = 4, 2
    b = B()
    header(b, w, h)
    b.put(1, 1)
    b.put(0, 2)  # PREDICTOR
    b.put(0, 3)  # size_bits = 2 -> one 4x4 block
    # 1x1 mode sub-image follows the size bits immediately (no meta
    # bit at this level); all five trees single-symbol, zero pixel bits
    b.put(0, 1)  # no cache
    simple1(b, 1)  # green = predictor mode 1 (Left)
    simple1(b, 0), simple1(b, 0), simple1(b, 0), simple1(b, 0)
    b.put(0, 1)  # transforms end
    # main image
    b.put(0, 1)  # no cache
    b.put(0, 1)  # no meta
    simple2(b, 0, 6)  # green residuals
    simple2(b, 0, 5)  # red residuals
    simple2(b, 0, 7)  # blue residuals
    simple1(b, 0)  # alpha residual 0
    simple1(b, 0)
    res = [
        (5, 6, 7), (5, 0, 0), (0, 6, 7), (5, 0, 7),
        (0, 0, 7), (5, 6, 0), (0, 0, 7), (0, 6, 0),
    ]
    for r, g, bl in res:
        b.code(1 if g else 0, 1)
        b.code(1 if r else 0, 1)
        b.code(1 if bl else 0, 1)
    out, _, _ = decode_webp(wrap(b))
    # independent spec arithmetic: (0,0) predicts black, the rest of
    # row 0 predicts Left, (0,1) predicts Top, the block mode is Left
    exp = np.zeros((h, w, 3), np.int64)
    for y in range(h):
        for x in range(w):
            r, g, bl = res[y * w + x]
            if (x, y) == (0, 0):
                pred = (0, 0, 0)
            elif y == 0 or x > 0:
                pred = tuple(exp[y, x - 1])
            else:
                pred = tuple(exp[y - 1, x])
            exp[y, x] = [(pred[0] + r) & 255, (pred[1] + g) & 255,
                         (pred[2] + bl) & 255]
    assert np.array_equal(rgb(out).reshape(h, w, 3), exp.astype(np.uint8))


def test_color_transform():
    b = B()
    header(b, 2, 1)
    b.put(1, 1)
    b.put(1, 2)  # COLOR transform
    b.put(0, 3)  # size_bits = 2 -> one block
    # cte sub-image: blue channel carries green_to_red = 16
    b.put(0, 1)
    simple1(b, 0), simple1(b, 0), simple1(b, 16), simple1(b, 255)
    simple1(b, 0)
    b.put(0, 1)  # transforms end
    # main image
    b.put(0, 1)
    b.put(0, 1)
    simple2(b, 64, 130)  # green
    simple2(b, 100, 200)  # red (stored, pre-inverse)
    simple2(b, 9, 77)  # blue
    simple1(b, 255)
    simple1(b, 0)
    b.code(0, 1), b.code(0, 1), b.code(0, 1)  # (g=64, r=100, b=9)
    b.code(1, 1), b.code(1, 1), b.code(1, 1)  # (g=130, r=200, b=77)
    out, _, _ = decode_webp(wrap(b))
    # delta = (int8(16) * int8(g)) >> 5, added to red:
    #   g=64  -> +32;  g=130 -> int8 -126 -> (16*-126)>>5 = -63
    assert rgb(out).tolist() == [[132, 64, 9], [137, 130, 77]]


def test_color_indexing_with_bundling():
    b = B()
    header(b, 8, 1)
    b.put(1, 1)
    b.put(3, 2)  # COLOR_INDEXING
    b.put(3, 8)  # 4 colors -> width_bits = 2 (4 indices per byte)
    # palette image 4x1: delta-coded entries
    b.put(0, 1)  # no cache
    simple2(b, 5, 20)  # greens of deltas
    simple2(b, 5, 10)  # reds
    simple2(b, 5, 30)  # blues
    simple2(b, 0, 255)  # alphas
    simple1(b, 0)
    # entry 0 raw (a=255, r=10, g=20, b=30), entries 1..3 delta (0,5,5,5)
    b.code(1, 1), b.code(1, 1), b.code(1, 1), b.code(1, 1)
    for _ in range(3):
        b.code(0, 1), b.code(0, 1), b.code(0, 1), b.code(0, 1)
    b.put(0, 1)  # transforms end
    # packed main image 2x1: green bytes bundle indices LSB-first
    packed0 = 0 | (1 << 2) | (2 << 4) | (3 << 6)  # 228
    packed1 = 3 | (2 << 2) | (1 << 4) | (0 << 6)  # 27
    b.put(0, 1)
    b.put(0, 1)
    simple2(b, packed1, packed0)
    simple1(b, 0), simple1(b, 0), simple1(b, 0), simple1(b, 0)
    b.code(1, 1)  # packed0
    b.code(0, 1)  # packed1
    out, w, h = decode_webp(wrap(b))
    assert (w, h) == (8, 1)
    pal = [[10, 20, 30], [15, 25, 35], [20, 30, 40], [25, 35, 45]]
    assert rgb(out).tolist() == [pal[i] for i in (0, 1, 2, 3, 3, 2, 1, 0)]


def test_lz77_backref_with_normal_green_code():
    b = B()
    header(b, 4, 1)
    b.put(0, 1)  # no transforms
    b.put(0, 1)  # no cache
    b.put(0, 1)  # no meta
    # green: NORMAL code over alphabet 280, lengths {42:1, 258:1}
    b.put(0, 1)  # not simple
    b.put(0, 4)  # 4 code-length-code lengths: order 17,18,0,1
    b.put(0, 3), b.put(1, 3), b.put(0, 3), b.put(1, 3)
    b.put(0, 1)  # no explicit max-symbol
    # tokens: 42 zeros, len1, 215 zeros (138+77), len1, 21 zeros;
    # CLC canonical: sym1 -> code 0, sym18 -> code 1 (both length 1)
    b.code(1, 1), b.put(31, 7)  # 18: run 42
    b.code(0, 1)  # length 1 at symbol 42
    b.code(1, 1), b.put(127, 7)  # 18: run 138
    b.code(1, 1), b.put(66, 7)  # 18: run 77
    b.code(0, 1)  # length 1 at symbol 258
    b.code(1, 1), b.put(10, 7)  # 18: run 21
    simple1(b, 77)  # red
    simple1(b, 88)  # blue
    simple1(b, 255)  # alpha
    simple1(b, 1)  # distance: prefix code 1 -> value 2 -> map (1,0)
    # pixel 0: literal green 42 (code 0)
    b.code(0, 1)
    # then green 258 = length code 2 -> copy 3 pixels at distance 1
    b.code(1, 1)
    out, _, _ = decode_webp(wrap(b))
    assert rgb(out).tolist() == [[77, 42, 88]] * 4


def test_color_cache_roundtrip_hit():
    # px = 0xff010203 hashes to slot 1 of a 2-entry cache
    b = B()
    header(b, 2, 1)
    b.put(0, 1)  # no transforms
    b.put(1, 1)  # color cache present
    b.put(1, 4)  # cache_bits = 1
    b.put(0, 1)  # no meta
    # green: normal code over alphabet 282, lengths {2:1, 281:1}
    b.put(0, 1)
    b.put(0, 4)  # order 17,18,0,1
    b.put(0, 3), b.put(1, 3), b.put(2, 3), b.put(2, 3)
    b.put(0, 1)
    # CLC canonical: 18 -> (1, 0); 0 -> (2, 0b10); 1 -> (2, 0b11)
    b.code(2, 2), b.code(2, 2)  # two zeros
    b.code(3, 2)  # length 1 at symbol 2
    b.code(0, 1), b.put(127, 7)  # 18: run 138
    b.code(0, 1), b.put(127, 7)  # 18: run 138
    b.code(2, 2), b.code(2, 2)  # two zeros (run of 278 total)
    b.code(3, 2)  # length 1 at symbol 281 (cache code 1)
    simple1(b, 1)  # red
    simple1(b, 3)  # blue
    simple1(b, 255)  # alpha
    simple1(b, 0)  # distance
    b.code(0, 1)  # literal green 2 -> pixel 0xff010203, cached
    b.code(1, 1)  # cache code 1 -> the same pixel again
    out, _, _ = decode_webp(wrap(b))
    assert rgb(out).tolist() == [[1, 2, 3], [1, 2, 3]]


def test_meta_prefix_image_routes_groups():
    b = B()
    header(b, 8, 1)
    b.put(0, 1)  # no transforms
    b.put(0, 1)  # no cache
    b.put(1, 1)  # meta prefix image present
    b.put(0, 3)  # huff_bits = 2 -> meta image 2x1
    # meta image (no meta bit at this level): green = group index
    b.put(0, 1)  # no cache
    simple2(b, 0, 1)
    simple1(b, 0), simple1(b, 0), simple1(b, 0), simple1(b, 0)
    b.code(0, 1)  # meta pixel 0 -> group 0
    b.code(1, 1)  # meta pixel 1 -> group 1
    # group 0 trees
    simple1(b, 11), simple1(b, 12), simple1(b, 13), simple1(b, 255)
    simple1(b, 0)
    # group 1 trees
    simple1(b, 21), simple1(b, 22), simple1(b, 23), simple1(b, 255)
    simple1(b, 0)
    # 8 pixels, zero bits each (all trees single-symbol)
    out, _, _ = decode_webp(wrap(b))
    assert rgb(out).tolist() == [[12, 11, 13]] * 4 + [[22, 21, 23]] * 4


def test_normal_code_with_explicit_max_symbol():
    b = B()
    header(b, 2, 1)
    b.put(0, 1), b.put(0, 1), b.put(0, 1)
    simple2(b, 50, 60)  # green
    # red: normal code, lengths {0:1, 1:1}, transmitted as exactly two
    # tokens bounded by an explicit max-symbol count
    b.put(0, 1)
    b.put(0, 4)  # order 17,18,0,1
    b.put(0, 3), b.put(0, 3), b.put(0, 3), b.put(1, 3)
    b.put(1, 1)  # explicit max-symbol follows
    b.put(1, 3)  # length_nbits = 2 + 2*1 = 4
    b.put(0, 4)  # max_symbol = 2
    # the CLC is single-symbol (token 1): both tokens cost zero bits
    simple1(b, 0)  # blue
    simple1(b, 255)  # alpha
    simple1(b, 0)  # distance
    # pixels: red tree canonical {0 -> code 0, 1 -> code 1}
    b.code(0, 1), b.code(0, 1)  # g=50, r=0
    b.code(1, 1), b.code(1, 1)  # g=60, r=1
    out, _, _ = decode_webp(wrap(b))
    assert rgb(out).tolist() == [[0, 50, 0], [1, 60, 0]]


# ---------------------------------------------------------------------------
# container handling
# ---------------------------------------------------------------------------


def _tiny_vp8l_bytes():
    b = B()
    header(b, 1, 1)
    b.put(0, 1), b.put(0, 1), b.put(0, 1)
    simple1(b, 9), simple1(b, 8), simple1(b, 7), simple1(b, 255)
    simple1(b, 0)
    return b"\x2f" + b.tobytes()


def test_vp8x_container_walk_reaches_vp8l():
    vp8l = _tiny_vp8l_bytes()
    vp8x = b"VP8X" + struct.pack("<I", 10) + b"\x00" * 10
    lchunk = b"VP8L" + struct.pack("<I", len(vp8l)) + vp8l
    if len(vp8l) & 1:
        lchunk += b"\x00"
    body = b"WEBP" + vp8x + lchunk
    buf = b"RIFF" + struct.pack("<I", len(body)) + body
    out, w, h = decode_webp(buf)
    assert (w, h) == (1, 1)
    assert rgb(out).tolist() == [[8, 9, 7]]
    assert sniff_webp_dims(buf) == (1, 1)


def test_lossy_vp8_is_a_named_seam():
    body = b"WEBP" + b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4
    buf = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(WebpError, match="seam"):
        decode_webp(buf)


def test_container_errors():
    with pytest.raises(WebpError, match="RIFF"):
        decode_webp(b"nope")
    vp8l = _tiny_vp8l_bytes()
    trunc = b"RIFF" + struct.pack("<I", 100) + b"WEBP" + b"VP8L" + \
        struct.pack("<I", len(vp8l) + 50) + vp8l
    with pytest.raises(WebpError, match="truncated"):
        decode_webp(trunc)
    with pytest.raises(WebpError, match="signature"):
        decode_webp(
            b"RIFF" + struct.pack("<I", 12) + b"WEBP" + b"VP8L"
            + struct.pack("<I", 4) + b"\x00\x00\x00\x00"
        )


def test_distance_map_is_the_spec_neighborhood():
    assert len(_DIST_MAP) == 120
    assert len(set(_DIST_MAP)) == 120
    assert all(-7 <= dx <= 8 and 0 <= dy <= 7 for dx, dy in _DIST_MAP)
    assert _DIST_MAP[:10] == (
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2),
        (2, 0), (1, 2), (-1, 2), (2, 1), (-2, 1),
    )


# ---------------------------------------------------------------------------
# encoder round-trip properties
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("w,h", [(1, 1), (2, 2), (32, 32), (33, 7), (64, 3),
                                 (5, 1), (1, 9)])
def test_roundtrip_random(w, h):
    r = np.random.default_rng(w * 1000 + h)
    px = r.integers(0, 256, w * h * 3, dtype=np.int64).astype(np.uint8)
    buf = encode_webp(px, w, h)
    out, dw, dh = decode_webp(buf)
    assert (dw, dh) == (w, h)
    assert np.array_equal(out, px)
    assert sniff_webp_dims(buf) == (w, h)


@pytest.mark.parametrize("ncolors", [1, 2, 3, 5, 17, 255])
def test_roundtrip_symbol_regimes(ncolors):
    # hits simple 1/2-symbol headers and balanced codes with mixed
    # (k-1, k) lengths; ncolors=255 exercises long zero-run emission
    r = np.random.default_rng(ncolors)
    colors = r.integers(0, 256, (ncolors, 3), dtype=np.int64).astype(np.uint8)
    idx = r.integers(0, ncolors, 24 * 24)
    px = np.ascontiguousarray(colors[idx]).reshape(-1)
    buf = encode_webp(px, 24, 24)
    out, _, _ = decode_webp(buf)
    assert np.array_equal(out, px)


def test_roundtrip_gradient():
    # every channel value present exactly once per row block: all-256
    # alphabets take the single-CL-token normal-code path
    w, h = 64, 12
    base = np.arange(w * h, dtype=np.int64)
    px = np.stack([base % 256, (base * 7) % 256, (base * 13) % 256], axis=1)
    px = px.astype(np.uint8).reshape(-1)
    buf = encode_webp(px, w, h)
    out, _, _ = decode_webp(buf)
    assert np.array_equal(out, px)


def test_encode_errors():
    with pytest.raises(WebpError, match="match"):
        encode_webp(np.zeros(10, np.uint8), 2, 2)
    with pytest.raises(WebpError, match="14-bit"):
        encode_webp(np.zeros((1 << 15) * 3, np.uint8), 1 << 15, 1)


# ---------------------------------------------------------------------------
# imagecodec dispatch integration
# ---------------------------------------------------------------------------


def test_imagecodec_dispatch():
    from datasketches_cpp_spark.operators.imagecodec import (
        LOSSLESS_FORMATS,
        decode,
        encode,
        sniff_dims,
        sniff_format,
    )

    assert "webp" in LOSSLESS_FORMATS
    r = np.random.default_rng(99)
    px = r.integers(0, 256, 16 * 16 * 3, dtype=np.int64).astype(np.uint8)
    buf = encode(px, 16, 16, "webp")
    assert sniff_format(buf) == "webp"
    assert sniff_dims(buf, "webp") == (16, 16)
    assert np.array_equal(decode(buf, 16, 16, "webp"), px)


def test_simple_prefix_code_symbol_out_of_alphabet_raises_webperror():
    """Malformed-stream hardening: an 8-bit simple-code symbol beyond the
    alphabet must raise the codec's named error (crawl ingest filters by
    it), never a bare IndexError."""
    from datasketches_cpp_spark.operators.webpcodec import (
        WebpError,
        _BitReader,
        _read_prefix_code,
    )

    # bits (LSB-first per byte): 1=simple code, 0=one symbol,
    # 1=8-bit symbol, then symbol 200 — out of a 40-symbol alphabet
    bits = [1, 0, 1] + [(200 >> i) & 1 for i in range(8)]
    byts = bytearray((len(bits) + 7) // 8)
    for i, b in enumerate(bits):
        byts[i // 8] |= b << (i % 8)
    with pytest.raises(WebpError):
        _read_prefix_code(_BitReader(bytes(byts)), 40)
