"""Pure numpy + stdlib image codecs: PNG, PPM (P6), BMP (24-bit).

Replaces the round-2 `NotImplementedError` codec seam with real decoders
that need nothing beyond the standard library (zlib) — the container
ships no image libraries, and none are needed for these formats:

  PNG  — RGB/RGBA/grayscale(+alpha), 8-bit, all five scanline filters
         (spec: W3C/ISO PNG, RFC 2083; filtering per §6).  Encode emits
         filter-0 RGB with one zlib IDAT.  Lossless: decode(encode(x))
         == x exactly (PSNR = ∞ ≥ the 40 dB gate).
  PPM  — binary P6, maxval 255 (netpbm format spec).
  BMP  — BITMAPINFOHEADER, 24-bit uncompressed, bottom-up rows padded
         to 4 bytes (Windows BMP file format docs).

All decoders return (h*w*3,) uint8 RGB to match the pipeline's pixel
contract (sources/images.py decode_image); grayscale/alpha inputs are
expanded/composited.  The per-row unfilter loop in PNG is O(h) Python
iterations over vectorized width-wise numpy ops — rows are the batch
axis, never pixels.

Scale note: codecs run inside mapInPandas blocks on the executors; each
call touches only its own Arrow batch, so the operators stay narrow
(no shuffle) and the 100 TB story is unchanged from the raw path.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


class ImageCodecError(ValueError):
    pass


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray, w: int, h: int, level: int = 6) -> bytes:
    """(h*w*3,) or (h, w, 3) uint8 RGB → PNG bytes (filter 0, one IDAT)."""
    px = np.asarray(pixels, np.uint8).reshape(h, w * 3)
    raw = np.empty((h, 1 + w * 3), np.uint8)
    raw[:, 0] = 0  # filter type None per scanline
    raw[:, 1:] = px
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw.tobytes(), level))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor (PNG §6.6), vectorized across a scanline."""
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(buf: bytes) -> tuple[np.ndarray, int, int]:
    """PNG bytes → ((h*w*3,) uint8 RGB, w, h).  8-bit gray / gray+alpha /
    RGB / RGBA, filters 0-4; interlacing and palettes unsupported."""
    if buf[:8] != _PNG_SIG:
        raise ImageCodecError("not a PNG stream")
    off, w = 8, None
    idat = bytearray()
    h = bit_depth = color_type = None
    while off + 8 <= len(buf):
        (ln,) = struct.unpack_from(">I", buf, off)
        tag = buf[off + 4 : off + 8]
        data = buf[off + 8 : off + 8 + ln]
        if len(data) != ln:
            raise ImageCodecError("truncated chunk")
        if tag == b"IHDR":
            w, h, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if bit_depth != 8:
                raise ImageCodecError(f"unsupported bit depth {bit_depth}")
            if interlace:
                raise ImageCodecError("interlaced PNG unsupported")
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        off += 12 + ln
    if w is None or not idat:
        raise ImageCodecError("missing IHDR/IDAT")
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        raise ImageCodecError(f"unsupported color type {color_type}")
    stride = w * channels
    raw = np.frombuffer(zlib.decompress(bytes(idat)), np.uint8)
    if raw.shape[0] != h * (stride + 1):
        raise ImageCodecError("decompressed size mismatch")
    raw = raw.reshape(h, stride + 1)
    filters, rows = raw[:, 0], raw[:, 1:]
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    bpp = channels  # bytes per pixel at 8-bit depth
    for y in range(h):
        f, row = int(filters[y]), rows[y]
        if f == 0:
            cur = row.copy()
        elif f == 2:  # Up
            cur = row + prev
        elif f == 1:  # Sub: per-channel prefix sum mod 256 — vectorized
            cur = (
                row.reshape(-1, bpp)
                .astype(np.int64)
                .cumsum(axis=0)
                .astype(np.uint8)
                .reshape(stride)
            )
        elif f in (3, 4):  # Average / Paeth: true left-to-right dependency
            cur = np.empty(stride, np.uint8)
            left = np.zeros(bpp, np.uint8)
            upleft = np.zeros(bpp, np.uint8)
            for x in range(0, stride, bpp):
                up = prev[x : x + bpp]
                if f == 3:
                    avg = ((left.astype(np.int16) + up.astype(np.int16)) // 2).astype(np.uint8)
                    cur[x : x + bpp] = row[x : x + bpp] + avg
                else:
                    cur[x : x + bpp] = row[x : x + bpp] + _paeth(left, up, upleft)
                left = cur[x : x + bpp]
                upleft = up
        else:
            raise ImageCodecError(f"unknown filter type {f}")
        out[y] = cur
        prev = cur
    px = out.reshape(h, w, channels)
    if color_type == 0:  # gray → RGB
        px = np.repeat(px, 3, axis=2)
    elif color_type == 4:  # gray+alpha → RGB (alpha dropped; opaque contract)
        px = np.repeat(px[:, :, :1], 3, axis=2)
    elif color_type == 6:  # RGBA → RGB
        px = px[:, :, :3]
    return np.ascontiguousarray(px).reshape(-1), int(w), int(h)


# ---------------------------------------------------------------------------
# PPM (P6) and BMP (24-bit)
# ---------------------------------------------------------------------------


def encode_ppm(pixels: np.ndarray, w: int, h: int) -> bytes:
    return b"P6\n%d %d\n255\n" % (w, h) + np.asarray(pixels, np.uint8).tobytes()


def decode_ppm(buf: bytes) -> tuple[np.ndarray, int, int]:
    if not buf.startswith(b"P6"):
        raise ImageCodecError("not a binary PPM (P6) stream")
    # header: three whitespace-separated tokens (w, h, maxval), then one
    # whitespace byte, then raw samples; '#' comments allowed
    toks, off = [], 2
    while len(toks) < 3:
        while off < len(buf) and buf[off : off + 1].isspace():
            off += 1
        if buf[off : off + 1] == b"#":
            while off < len(buf) and buf[off] != 0x0A:
                off += 1
            continue
        start = off
        while off < len(buf) and not buf[off : off + 1].isspace():
            off += 1
        toks.append(int(buf[start:off]))
    off += 1  # single whitespace after maxval
    w, h, maxval = toks
    if maxval != 255:
        raise ImageCodecError(f"unsupported maxval {maxval}")
    need = w * h * 3
    if len(buf) < off + need:
        raise ImageCodecError("truncated PPM payload")
    return np.frombuffer(buf, np.uint8, count=need, offset=off).copy(), w, h


def encode_bmp(pixels: np.ndarray, w: int, h: int) -> bytes:
    """24-bit uncompressed BMP: BGR channel order, bottom-up rows padded
    to 4-byte boundaries."""
    px = np.asarray(pixels, np.uint8).reshape(h, w, 3)
    bgr = px[::-1, :, ::-1]  # bottom-up + RGB→BGR
    row_len = w * 3
    pad = (-row_len) % 4
    rows = np.zeros((h, row_len + pad), np.uint8)
    rows[:, :row_len] = bgr.reshape(h, row_len)
    data = rows.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + info + data


def decode_bmp(buf: bytes) -> tuple[np.ndarray, int, int]:
    if buf[:2] != b"BM":
        raise ImageCodecError("not a BMP stream")
    (data_off,) = struct.unpack_from("<I", buf, 10)
    hdr_size, w, h_signed = struct.unpack_from("<Iii", buf, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", buf, 26)
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise ImageCodecError(f"unsupported BMP variant (bpp={bpp}, comp={compression})")
    h = abs(h_signed)
    row_len = w * 3
    stride = row_len + ((-row_len) % 4)
    need = data_off + stride * h
    if len(buf) < need:
        raise ImageCodecError("truncated BMP payload")
    rows = np.frombuffer(buf, np.uint8, count=stride * h, offset=data_off).reshape(
        h, stride
    )[:, :row_len]
    bgr = rows.reshape(h, w, 3)
    if h_signed > 0:
        bgr = bgr[::-1]  # bottom-up storage
    return np.ascontiguousarray(bgr[:, :, ::-1]).reshape(-1), int(w), int(h)


# ---------------------------------------------------------------------------
# DCT — the lossy lane (JPEG-style transform codec)
# ---------------------------------------------------------------------------
#
# The input_hint's per-row invariant is "decoded-pixel allclose (PSNR ≥
# 40 dB for lossy)".  This codec is built so that floor is ANALYTIC, not
# empirical: 8×8 orthonormal DCT-II per channel (RGB domain — no color
# conversion, no chroma subsampling) with one uniform quantization step
# s per coefficient.  Orthonormality preserves L2, so per-block pixel
# MSE ≤ (s/2)²; the final round-to-uint8 adds ≤ 0.5 amplitude, giving a
# worst-case RMSE ≤ s/2 + 0.5 for ANY input (clipping only shrinks it).
# Default quality 90 → s = 2 → PSNR ≥ 20·log10(255/1.5) = 44.6 dB
# guaranteed; any quality ≥ 80 (s ≤ 4) keeps the 40 dB gate (the L2
# argument is exact for block-aligned dims; ragged edges are padded by
# replication and covered by the empirical tests).  Entropy stage:
# zigzag scan + cross-block DC delta + zlib over the int16 plane.
#
# This is a codec in the JPEG mold (T.81's transform/quantize/entropy
# pipeline shape), NOT JPEG interchange format — a real libjpeg decoder
# slots into the same `_DECODERS` seam if the container ever grows one.
# Everything is one vectorized pass over (N, 8, 8) block stacks.

_DCT_MAGIC = b"DCT1"


def _dct_matrix() -> np.ndarray:
    k = np.arange(8, dtype=np.float64)
    D = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16) * 0.5
    D[0] *= 1 / np.sqrt(2)
    return D  # orthonormal: D @ D.T == I


_DCT_D = _dct_matrix()


def _zigzag_order() -> np.ndarray:
    idx = sorted(
        ((i, j) for i in range(8) for j in range(8)),
        key=lambda t: (t[0] + t[1], t[1] if (t[0] + t[1]) % 2 else t[0]),
    )
    return np.array([i * 8 + j for i, j in idx])


_ZIGZAG = _zigzag_order()
_UNZIGZAG = np.argsort(_ZIGZAG)


def _dct_step(quality: int) -> int:
    if not 1 <= quality <= 100:
        raise ImageCodecError(f"quality {quality} outside [1, 100]")
    return max(1, round((100 - quality) / 5))


def encode_dct(pixels: np.ndarray, w: int, h: int, quality: int = 90) -> bytes:
    """(h*w*3,) or (h, w, 3) uint8 RGB → lossy DCT stream."""
    step = _dct_step(quality)
    px = np.asarray(pixels, np.uint8).reshape(h, w, 3).astype(np.float64) - 128.0
    ph, pw = (-h) % 8, (-w) % 8
    if ph or pw:
        px = np.pad(px, ((0, ph), (0, pw), (0, 0)), mode="edge")
    nby, nbx = px.shape[0] // 8, px.shape[1] // 8
    # (H, W, 3) → (N, 8, 8) block stack, channel-major within each tile row
    blocks = (
        px.reshape(nby, 8, nbx, 8, 3).transpose(0, 2, 4, 1, 3).reshape(-1, 8, 8)
    )
    coef = np.einsum("ij,njk,lk->nil", _DCT_D, blocks, _DCT_D, optimize=True)
    qc = np.round(coef / step).astype(np.int16).reshape(-1, 64)[:, _ZIGZAG]
    dc = qc[:, 0].copy()
    qc[1:, 0] = dc[1:] - dc[:-1]  # cross-block DC delta
    header = _DCT_MAGIC + struct.pack("<IIB", w, h, quality)
    return header + zlib.compress(qc.astype("<i2").tobytes(), 6)


def decode_dct(buf: bytes) -> tuple[np.ndarray, int, int]:
    if buf[:4] != _DCT_MAGIC:
        raise ImageCodecError("not a DCT1 stream")
    if len(buf) < 13:
        raise ImageCodecError("truncated DCT1 header")
    w, h, quality = struct.unpack_from("<IIB", buf, 4)
    step = _dct_step(quality)
    try:
        plane = zlib.decompress(buf[13:])
    except zlib.error as exc:
        raise ImageCodecError(f"corrupt DCT1 payload: {exc}") from None
    nby, nbx = (h + 7) // 8, (w + 7) // 8
    n = nby * nbx * 3
    if len(plane) != n * 128:
        raise ImageCodecError(
            f"DCT1 payload holds {len(plane)} bytes, header implies {n * 128}"
        )
    qc = np.frombuffer(plane, "<i2").reshape(n, 64).astype(np.int64)
    qc[:, 0] = np.cumsum(qc[:, 0])  # undo DC delta
    coef = (qc[:, _UNZIGZAG] * step).astype(np.float64).reshape(n, 8, 8)
    blocks = np.einsum("ji,njk,kl->nil", _DCT_D, coef, _DCT_D, optimize=True)
    px = (
        blocks.reshape(nby, nbx, 3, 8, 8)
        .transpose(0, 3, 1, 4, 2)
        .reshape(nby * 8, nbx * 8, 3)[:h, :w]
    )
    out = np.clip(np.round(px + 128.0), 0, 255).astype(np.uint8)
    return out.reshape(-1), int(w), int(h)


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------

# 'jpg'/'jpeg' are REAL ITU T.81 interchange streams as of round 4
# (operators/jpegcodec.py: pure numpy/stdlib encoder + decoder — SOF0/
# SOF1 sequential and SOF2 progressive, 4:4:4/4:2:0/4:2:2, restart
# intervals, grayscale; arithmetic coding and lossless remain documented
# seams). The former 'jpg' alias to the DCT1 transform codec is gone;
# 'dct' still names DCT1.
# jpegcodec imports this module's DCT machinery at its top, so the
# reverse edge must be lazy — import-order-independent either way round.


def _decode_jpeg(buf):
    from .jpegcodec import decode_jpeg

    return decode_jpeg(buf)


def _encode_jpeg_gate(pixels, w, h):
    # registry default quality 99: the F1 lossy-format contract is decoded
    # PSNR >= 40 dB on the synthetic corpus; measured floors there are
    # 40.0 dB at q=97 and 48.9 dB at q=99 — q=99 keeps real margin.
    # Callers wanting smaller files use jpegcodec.encode_jpeg directly.
    from .jpegcodec import encode_jpeg

    return encode_jpeg(pixels, w, h, quality=99)


def _decode_gif(buf):
    from .gifcodec import decode_gif

    return decode_gif(buf)


def _encode_gif(pixels, w, h):
    from .gifcodec import encode_gif

    return encode_gif(pixels, w, h)


def _decode_tiff(buf):
    from .tiffcodec import decode_tiff

    return decode_tiff(buf)


def _decode_webp(buf):
    from .webpcodec import decode_webp

    return decode_webp(buf)


def _encode_webp(pixels, w, h):
    # VP8L lossless — exact for arbitrary RGB (literal-coded twin)
    from .webpcodec import encode_webp

    return encode_webp(pixels, w, h)


def _encode_tiff(pixels, w, h):
    # default LZW + horizontal predictor — lossless for arbitrary RGB
    from .tiffcodec import encode_tiff

    return encode_tiff(pixels, w, h)


_ENCODERS = {"png": encode_png, "ppm": encode_ppm, "bmp": encode_bmp,
             "dct": encode_dct, "jpg": _encode_jpeg_gate,
             "jpeg": _encode_jpeg_gate, "gif": _encode_gif,
             "tif": _encode_tiff, "tiff": _encode_tiff,
             "webp": _encode_webp}
_DECODERS = {"png": decode_png, "ppm": decode_ppm, "bmp": decode_bmp,
             "dct": decode_dct, "jpg": _decode_jpeg, "jpeg": _decode_jpeg,
             "gif": _decode_gif, "tif": _decode_tiff, "tiff": _decode_tiff,
             "webp": _decode_webp}

LOSSY_FORMATS = ("dct", "jpg", "jpeg")
# Indexed-color formats: EXACT (decode∘encode == id) for images with at
# most 256 distinct colors, and a hard GifError otherwise — never a
# silent quantization. Excluded from the 'mixed' rotation because the
# synthetic noise corpus exceeds any palette.
PALETTE_FORMATS = ("gif",)
# Pure aliases ('tif' == 'tiff', as 'jpg' == 'jpeg') — decodable like any
# registered name but excluded from rotations so no format is counted twice.
_ALIAS_FORMATS = ("tif",)
SUPPORTED_FORMATS = ("raw",) + tuple(sorted(_ENCODERS))
# Formats whose decode(encode(x)) == x exactly for ARBITRARY RGB input —
# the only ones eligible for the 'mixed' corpus rotation (its contract is
# decode-identity with the raw corpus). The lossy lane guarantees
# PSNR ≥ 44.6 dB at the default quality, never bit-identity; the palette
# lane is exact but refuses >256-color images, so it cannot rotate over
# the noise corpus either.
LOSSLESS_FORMATS = ("raw",) + tuple(
    sorted(set(_ENCODERS) - set(LOSSY_FORMATS) - set(PALETTE_FORMATS)
           - set(_ALIAS_FORMATS))
)


def sniff_format(buf: bytes) -> str | None:
    """Magic-byte format detection — returns a registry format name or
    None (raw payloads are headerless by definition). Used by ingest
    paths (sources/tarshards.py) to validate or supply the fmt column
    without decoding pixels."""
    b = bytes(buf[:12])
    if b.startswith(b"\x89PNG\r\n\x1a\n"):
        return "png"
    if b.startswith((b"GIF87a", b"GIF89a")):
        return "gif"
    if b.startswith(b"\xff\xd8"):
        return "jpeg"
    if b.startswith((b"II*\x00", b"MM\x00*")):
        return "tiff"
    if b.startswith(b"RIFF") and b[8:12] == b"WEBP":
        return "webp"
    if b.startswith(b"BM"):
        return "bmp"
    if b.startswith(b"P6"):
        return "ppm"
    if b.startswith(_DCT_MAGIC):
        return "dct"
    return None


def sniff_dims(buf: bytes, fmt: str) -> tuple[int, int]:
    """(w, h) from the stream's HEADER only — no pixel decode, no
    decompression. For ingest: the input-table metadata columns come
    from here when the source carries no sidecar. 'raw' is headerless
    and raises (callers must supply dims out-of-band)."""
    buf = bytes(buf)
    try:
        if fmt == "png":
            w, h = struct.unpack_from(">II", buf, 16)
            return int(w), int(h)
        if fmt == "bmp":
            w, h = struct.unpack_from("<ii", buf, 18)
            return int(w), int(abs(h))
        if fmt == "gif":
            w, h = struct.unpack_from("<HH", buf, 6)
            return int(w), int(h)
        if fmt in ("tif", "tiff"):
            from .tiffcodec import _read_ifd

            bo = "<" if buf[:2] == b"II" else ">"
            (ifd_off,) = struct.unpack_from(bo + "I", buf, 4)
            t = _read_ifd(buf, ifd_off, bo)
            return int(t[256][0]), int(t[257][0])
        if fmt in ("jpg", "jpeg"):
            pos = 2
            while pos + 4 <= len(buf):
                if buf[pos] != 0xFF:
                    raise ImageCodecError("desynced JPEG marker stream")
                marker = buf[pos + 1]
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    pos += 2
                    continue
                (seglen,) = struct.unpack_from(">H", buf, pos + 2)
                # SOF0-SOF15 except DHT(C4)/JPG(C8)/DAC(CC)
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    h, w = struct.unpack_from(">HH", buf, pos + 5)
                    return int(w), int(h)
                pos += 2 + seglen
            raise ImageCodecError("no SOF marker found")
        if fmt == "webp":
            from .webpcodec import sniff_webp_dims

            return sniff_webp_dims(buf)
        if fmt == "ppm":
            toks = buf[:64].split()
            if toks[0] != b"P6":
                raise ImageCodecError("not a P6 PPM")
            return int(toks[1]), int(toks[2])
        if fmt == "dct":
            w, h = struct.unpack_from("<II", buf, 4)
            return int(w), int(h)
    except (struct.error, IndexError, KeyError, ValueError) as e:
        raise ImageCodecError(f"cannot sniff {fmt} dims: {e}") from None
    raise ImageCodecError(f"headerless or unknown format {fmt!r}")


def encode(pixels: np.ndarray, w: int, h: int, fmt: str) -> bytes:
    if fmt == "raw":
        return np.asarray(pixels, np.uint8).tobytes()
    try:
        enc = _ENCODERS[fmt]
    except KeyError:
        raise ImageCodecError(f"unsupported format {fmt!r}") from None
    return enc(pixels, w, h)


def decode(buf: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    """bytes → (h*w*3,) uint8 RGB.  w/h are the table's metadata columns;
    for self-describing formats the embedded dimensions must agree."""
    if fmt == "raw":
        px = np.frombuffer(buf, np.uint8)
        if px.shape[0] != w * h * 3:
            raise ImageCodecError("raw payload size mismatch")
        return px
    try:
        dec = _DECODERS[fmt]
    except KeyError:
        raise ImageCodecError(f"unsupported format {fmt!r}") from None
    px, dw, dh = dec(bytes(buf))
    if (dw, dh) != (w, h):
        raise ImageCodecError(
            f"metadata says {w}x{h} but the {fmt} stream is {dw}x{dh}"
        )
    return px
