"""Baseline JPEG (ITU-T T.81 interchange format) — pure numpy + stdlib,
same discipline as the PNG decoder in imagecodec.py: the container ships
no image libraries, and baseline sequential JPEG needs none.

Decoder scope:
  * SOF0/SOF1 baseline sequential, 8-bit, 1 component (grayscale) or 3
    components (JFIF YCbCr), sampling factors 1-2 in each axis (4:4:4,
    4:2:2, 4:2:0; 4:1:1 needs factor 4 and is out of scope);
  * SOF2 progressive: multi-scan spectral selection + successive
    approximation per T.81 G.2 — interleaved/single-component DC first
    and refinement scans, single-component AC band scans with EOB runs
    and correction bits, DHT/DQT/DRI redefinition between scans; a
    stream cut after any scan still decodes (coarse -> exact);
  * multiple DQT/DHT segments, 8- and 16-bit quant tables;
  * restart intervals (DRI + RSTn, byte-aligned, DC predictors reset);
  * APPn/COM segments skipped; EOI optional trailing garbage tolerated.
  Arithmetic coding, 12-bit precision, lossless and hierarchical modes
  raise ImageCodecError — honest seams, named in the message.

Encoder scope: baseline sequential JFIF (encode_jpeg), quality-scaled
Annex K quant tables (the libjpeg 5000/q | 200-2q scaling), standard
Annex K Huffman tables, 4:4:4 (default) or 4:2:0 chroma subsampling,
optional restart interval; and progressive JFIF
(encode_jpeg_progressive) with a DC + per-component AC first/refinement
scan script over a fixed custom AC table carrying the EOBn codes —
identical quantization, so the fully-decoded pixels match encode_jpeg's
exactly. decode(encode(x, q=90)) lands well above the repo's 40 dB
PSNR gate (asserted in tests/test_jpegcodec.py).

Entropy decode is a per-symbol Python loop over a numpy bit array — the
irreducibly serial part of Huffman data; everything block-shaped
(DCT/IDCT, dequant, zigzag, color transform, upsampling) is vectorized
over (N, 8, 8) stacks exactly like imagecodec's DCT1 codec. Scale note:
this runs inside mapInPandas on executors; decode cost is per-image and
embarrassingly parallel, so the 100 TB story is the raw path's.

All numeric tables below are the published constants of ITU-T T.81
Annex K (quantization tables K.1/K.2, typical Huffman tables K.3) —
spec-defining values, not implementation code.
"""

from __future__ import annotations

import struct

import numpy as np

from .imagecodec import _DCT_D, _UNZIGZAG, _ZIGZAG, ImageCodecError

# -- T.81 Annex K tables ------------------------------------------------------

_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], np.int32)

_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], np.int32)

# (bits[1..16], huffval) — K.3.1/K.3.2
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling: 5000/q below 50, 200-2q above."""
    if not 1 <= quality <= 100:
        raise ImageCodecError(f"quality {quality} outside [1, 100]")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


# -- canonical Huffman (T.81 Annex C/F) ---------------------------------------


def _build_encode_table(bits, vals) -> dict[int, tuple[int, int]]:
    """value → (code, length), canonical code assignment (C.2)."""
    out, code = {}, 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _HuffDecoder:
    """Canonical decoder per F.2.2.3: mincode/maxcode/valptr by length."""

    __slots__ = ("mincode", "maxcode", "valptr", "vals")

    def __init__(self, bits, vals):
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        self.vals = list(vals)
        code, k = 0, 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over a destuffed entropy segment."""

    __slots__ = ("bits", "pos")

    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, np.uint8))
        self.pos = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.bits):
            raise ImageCodecError("JPEG entropy data exhausted mid-symbol")
        b = int(self.bits[self.pos])
        self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos + n > len(self.bits):
            raise ImageCodecError("JPEG entropy data exhausted mid-symbol")
        chunk = self.bits[self.pos : self.pos + n]
        self.pos += n
        out = 0
        for b in chunk:
            out = (out << 1) | int(b)
        return out

    def decode(self, table: _HuffDecoder) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            if table.maxcode[length] >= code >= table.mincode[length]:
                return table.vals[table.valptr[length] + code - table.mincode[length]]
        raise ImageCodecError("invalid JPEG Huffman code")


def _extend(v: int, size: int) -> int:
    """F.2.1.3 EXTEND: map a size-bit magnitude to its signed value."""
    return v if size == 0 or v >= (1 << (size - 1)) else v - (1 << size) + 1


# -- decoder -------------------------------------------------------------------


def decode_jpeg(buf: bytes) -> tuple[np.ndarray, int, int]:
    """Baseline JPEG bytes → ((h*w*3,) uint8 RGB, w, h)."""
    if len(buf) < 4 or buf[0:2] != b"\xff\xd8":
        raise ImageCodecError("not a JPEG stream (missing SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, _HuffDecoder] = {}
    ac_tabs: dict[int, _HuffDecoder] = {}
    sof = None
    progressive = False
    prog = None  # lazily-initialized _ProgState once SOF2 + first SOS seen
    restart_interval = 0
    n = len(buf)
    while pos + 4 <= n:
        if buf[pos] != 0xFF:
            raise ImageCodecError(f"expected marker at offset {pos}")
        marker = buf[pos + 1]
        pos += 2
        if marker == 0xFF:  # fill byte — resynchronize one byte forward
            pos -= 1
            continue
        if marker == 0xD9:  # EOI: done (progressive) or no scan seen
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers
        (seglen,) = struct.unpack_from(">H", buf, pos)
        body = buf[pos + 2 : pos + seglen]
        if len(body) != seglen - 2:
            raise ImageCodecError("truncated JPEG segment")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0xF
                p += 1
                if pq == 0:
                    qts[tq] = np.frombuffer(body[p : p + 64], np.uint8).astype(np.int32)
                    p += 64
                else:
                    qts[tq] = np.frombuffer(body[p : p + 128], ">u2").astype(np.int32)
                    p += 128
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0xF
                bits = list(body[p + 1 : p + 17])
                cnt = sum(bits)
                vals = list(body[p + 17 : p + 17 + cnt])
                (dc_tabs if tc == 0 else ac_tabs)[th] = _HuffDecoder(bits, vals)
                p += 17 + cnt
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/SOF1 seq, SOF2 progressive
            prec, height, width, ncomp = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ImageCodecError(f"JPEG precision {prec} unsupported (8-bit only)")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * c)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            sof = (width, height, comps)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD,
                        0xCE, 0xCF):
            raise ImageCodecError(
                "only Huffman sequential (SOF0/SOF1) and progressive (SOF2) "
                f"JPEG are supported; SOF marker 0x{marker:02X} "
                "(arithmetic/lossless/hierarchical) is a documented codec seam"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if sof is None:
                raise ImageCodecError("JPEG SOS before SOF")
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tt = body[1 + 2 * c], body[2 + 2 * c]
                scan.append((cs, tt >> 4, tt & 0xF))
            data_start = pos + seglen
            if not progressive:
                return _decode_scan(
                    buf, data_start, sof, scan, qts, dc_tabs, ac_tabs,
                    restart_interval,
                )
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahl = body[3 + 2 * ns]
            if prog is None:
                prog = _ProgState(sof)
            pos = _decode_progressive_scan(
                buf, data_start, prog, scan, ss, se, ahl >> 4, ahl & 0xF,
                dc_tabs, ac_tabs, restart_interval,
            )
            continue
        # other segments (APPn, COM): skip
        pos += seglen
    if prog is not None:
        return _reconstruct(
            sof, prog.blocks, qts, prog.mcus_x, prog.mcus_y, prog.hmax,
            prog.vmax,
        )
    raise ImageCodecError("JPEG stream ended without a scan (no SOS)")


def _destuff(buf: bytes, start: int) -> tuple[bytes, list[int], int]:
    """Entropy bytes from `start`: drop 0x00 stuffing after 0xFF, record
    RST positions as bit offsets, stop at any other marker. Returns the
    source position where decoding stopped so a multi-scan (progressive)
    caller can resume its marker walk there."""
    out = bytearray()
    rst_bit_offsets = []
    pos, n = start, len(buf)
    while pos < n:
        b = buf[pos]
        if b != 0xFF:
            out.append(b)
            pos += 1
            continue
        nxt = buf[pos + 1] if pos + 1 < n else 0xD9
        if nxt == 0x00:
            out.append(0xFF)
            pos += 2
        elif 0xD0 <= nxt <= 0xD7:  # RSTn
            rst_bit_offsets.append(len(out) * 8)
            pos += 2
        else:  # EOI or next segment
            break
    return bytes(out), rst_bit_offsets, pos


def _decode_scan(buf, start, sof, scan, qts, dc_tabs, ac_tabs, restart_interval):
    width, height, comps = sof
    if len(scan) != len(comps):
        raise ImageCodecError("JPEG: non-interleaved multi-scan not supported")
    if len(comps) == 1:
        # T.81 A.2.2: a single-component scan is NON-interleaved — data
        # units cover the component's own ceil(w/8) x ceil(h/8) grid in
        # raster order, and the declared sampling factors do not shape
        # the MCU (a grayscale frame keeping 2x2 luma factors must not
        # decode as 2x2-block MCUs). Normalizing the factors to 1x1
        # makes the interleaved loop below BE that raster order, with
        # restarts counting data units as required.
        comps = [dict(comps[0], h=1, v=1)]
        sof = (width, height, comps)
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1 or hmax > 2 or vmax > 2:
        raise ImageCodecError(f"JPEG sampling {hmax}x{vmax} unsupported (1-2 only)")
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    data, rst_offsets, _end = _destuff(buf, start)
    reader = _BitReader(data)

    per_comp_blocks = []
    tabs = []
    for c in comps:
        bw = mcus_x * c["h"]
        bh = mcus_y * c["v"]
        per_comp_blocks.append(np.zeros((bh * bw, 64), np.int32))
        cs_entry = next((s for s in scan if s[0] == c["id"]), None)
        if cs_entry is None:
            raise ImageCodecError("JPEG scan omits a frame component")
        _, td, ta = cs_entry
        if td not in dc_tabs or ta not in ac_tabs:
            raise ImageCodecError("JPEG scan references a missing Huffman table")
        tabs.append((dc_tabs[td], ac_tabs[ta]))

    preds = [0] * len(comps)
    mcu_index = 0
    rst_iter = iter(rst_offsets)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                nxt = next(rst_iter, None)
                if nxt is None:
                    raise ImageCodecError("JPEG: missing expected RST marker")
                reader.pos = nxt
                preds = [0] * len(comps)
            for ci, c in enumerate(comps):
                dct, act = tabs[ci]
                bw = mcus_x * c["h"]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = per_comp_blocks[ci][
                            (my * c["v"] + by) * bw + (mx * c["h"] + bx)
                        ]
                        # DC
                        size = reader.decode(dct)
                        diff = _extend(reader.read_bits(size), size)
                        preds[ci] += diff
                        blk[0] = preds[ci]
                        # AC
                        k = 1
                        while k < 64:
                            rs = reader.decode(act)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ImageCodecError("JPEG AC run overflows block")
                            blk[k] = _extend(reader.read_bits(s), s)
                            k += 1
            mcu_index += 1

    return _reconstruct(sof, per_comp_blocks, qts, mcus_x, mcus_y, hmax, vmax)


def _reconstruct(sof, per_comp_blocks, qts, mcus_x, mcus_y, hmax, vmax):
    """Zigzag coefficient blocks → RGB: dequant + unzigzag + IDCT +
    upsample + color transform, vectorized per component (shared by the
    sequential and progressive paths)."""
    width, height, comps = sof
    planes = []
    for ci, c in enumerate(comps):
        if c["tq"] not in qts:
            raise ImageCodecError("JPEG frame references a missing quant table")
        q = qts[c["tq"]]
        zz = per_comp_blocks[ci] * q[None, :]
        coef = zz[:, _UNZIGZAG].reshape(-1, 8, 8).astype(np.float64)
        blocks = np.einsum("ji,njk,kl->nil", _DCT_D, coef, _DCT_D, optimize=True)
        bw = mcus_x * c["h"]
        bh = mcus_y * c["v"]
        plane = (
            blocks.reshape(bh, bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8)
        ) + 128.0
        # upsample to full MCU grid resolution
        plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        planes.append(plane[:height, :width])

    if len(comps) == 1:
        y = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        rgb = np.repeat(y[:, :, None], 3, axis=2)
    else:
        y, cb, cr = planes  # frame order is Y, Cb, Cr (JFIF)
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        rgb = np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)
    return rgb.reshape(-1), int(width), int(height)


# -- progressive decoding (T.81 G.2) ------------------------------------------


class _ProgState:
    """Per-component coefficient accumulators across progressive scans.

    Blocks are MCU-grid-padded (like the sequential path) and hold
    zigzag-order int32 coefficients; successive scans refine them in
    place, then _reconstruct runs once at EOI."""

    __slots__ = ("comps", "hmax", "vmax", "mcus_x", "mcus_y", "blocks",
                 "ndims")

    def __init__(self, sof):
        width, height, comps = sof
        self.comps = comps
        self.hmax = max(c["h"] for c in comps)
        self.vmax = max(c["v"] for c in comps)
        if not (1 <= self.hmax <= 2 and 1 <= self.vmax <= 2):
            raise ImageCodecError(
                f"JPEG sampling {self.hmax}x{self.vmax} unsupported (1-2 only)"
            )
        self.mcus_x = -(-width // (8 * self.hmax))
        self.mcus_y = -(-height // (8 * self.vmax))
        self.blocks = []
        self.ndims = []  # (blocks_w, blocks_h) of each comp's OWN raster
        for c in comps:
            bw = self.mcus_x * c["h"]
            bh = self.mcus_y * c["v"]
            self.blocks.append(np.zeros((bh * bw, 64), np.int32))
            cw = -(-width * c["h"] // self.hmax)
            ch = -(-height * c["v"] // self.vmax)
            self.ndims.append((-(-cw // 8), -(-ch // 8)))


def _decode_progressive_scan(
    buf, start, prog, scan, ss, se, ah, al, dc_tabs, ac_tabs,
    restart_interval,
):
    """One progressive scan: DC first/refine (interleaved or single-
    component) or AC first/refine (single-component, with EOB runs and
    correction bits per G.2). Mutates prog.blocks; returns the source
    position after the scan's entropy data."""
    data, rst_offsets, end_pos = _destuff(buf, start)
    reader = _BitReader(data)
    rst_iter = iter(rst_offsets)
    comps = prog.comps
    by_id = {c["id"]: ci for ci, c in enumerate(comps)}

    if ss == 0:
        if se != 0:
            raise ImageCodecError("JPEG DC scan with Se != 0")
        first = ah == 0
        sel = []
        for cs, td, _ta in scan:
            if cs not in by_id:
                raise ImageCodecError("JPEG scan names an unknown component")
            if first and td not in dc_tabs:
                raise ImageCodecError("JPEG scan references a missing Huffman table")
            sel.append((by_id[cs], dc_tabs.get(td)))
        preds = [0] * len(sel)

        def dc_block(pos_in_sel, blk):
            if first:
                tab = sel[pos_in_sel][1]
                size = reader.decode(tab)
                preds[pos_in_sel] += _extend(reader.read_bits(size), size)
                blk[0] = preds[pos_in_sel] << al
            else:
                blk[0] |= reader.read_bit() << al

        if len(scan) > 1:
            # interleaved MCU order over the selected components
            if len(scan) != len(comps):
                raise ImageCodecError(
                    "JPEG interleaved DC scan must name every component"
                )
            unit = 0
            for my in range(prog.mcus_y):
                for mx in range(prog.mcus_x):
                    if restart_interval and unit and unit % restart_interval == 0:
                        nxt = next(rst_iter, None)
                        if nxt is None:
                            raise ImageCodecError("JPEG: missing expected RST marker")
                        reader.pos = nxt
                        preds = [0] * len(sel)
                    for si, (ci, _tab) in enumerate(sel):
                        c = comps[ci]
                        bw = prog.mcus_x * c["h"]
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                dc_block(
                                    si,
                                    prog.blocks[ci][
                                        (my * c["v"] + by) * bw
                                        + (mx * c["h"] + bx)
                                    ],
                                )
                    unit += 1
        else:
            ci = sel[0][0]
            bw_n, bh_n = prog.ndims[ci]
            padded_bw = prog.mcus_x * comps[ci]["h"]
            unit = 0
            for row in range(bh_n):
                for col in range(bw_n):
                    if restart_interval and unit and unit % restart_interval == 0:
                        nxt = next(rst_iter, None)
                        if nxt is None:
                            raise ImageCodecError("JPEG: missing expected RST marker")
                        reader.pos = nxt
                        preds = [0] * len(sel)
                    dc_block(0, prog.blocks[ci][row * padded_bw + col])
                    unit += 1
        return end_pos

    # AC scan: exactly one component (T.81 G.1.1.1.1)
    if len(scan) != 1:
        raise ImageCodecError("JPEG AC scan must have exactly one component")
    cs, _td, ta = scan[0]
    if cs not in by_id:
        raise ImageCodecError("JPEG scan names an unknown component")
    if ta not in ac_tabs:
        raise ImageCodecError("JPEG scan references a missing Huffman table")
    act = ac_tabs[ta]
    ci = by_id[cs]
    bw_n, bh_n = prog.ndims[ci]
    padded_bw = prog.mcus_x * comps[ci]["h"]
    blocks = prog.blocks[ci]
    eobrun = 0
    first = ah == 0
    p1 = 1 << al
    m1 = -p1
    unit = 0
    for row in range(bh_n):
        for col in range(bw_n):
            if restart_interval and unit and unit % restart_interval == 0:
                nxt = next(rst_iter, None)
                if nxt is None:
                    raise ImageCodecError("JPEG: missing expected RST marker")
                reader.pos = nxt
                eobrun = 0
            unit += 1
            blk = blocks[row * padded_bw + col]
            if first:
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = reader.decode(act)
                    r, s = rs >> 4, rs & 0xF
                    if s == 0:
                        if r < 15:
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += reader.read_bits(r)
                            break
                        k += 16  # ZRL
                        continue
                    k += r
                    if k > se:
                        raise ImageCodecError("JPEG AC run overflows band")
                    blk[k] = _extend(reader.read_bits(s), s) << al
                    k += 1
            else:
                # refinement (G.2, the successive-approximation correction
                # pass): newly-nonzero coefficients arrive as ±1<<Al; every
                # already-nonzero coefficient crossed consumes one
                # correction bit
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = reader.decode(act)
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if r < 15:
                                eobrun = 1 << r
                                if r:
                                    eobrun += reader.read_bits(r)
                                break
                            # r == 15: ZRL — skip 16 zero-history coeffs
                            s_val = 0
                        else:
                            if s != 1:
                                raise ImageCodecError(
                                    "JPEG AC refinement size != 1"
                                )
                            s_val = p1 if reader.read_bit() else m1
                        while k <= se:
                            coef = int(blk[k])
                            if coef != 0:
                                if reader.read_bit() and (coef & p1) == 0:
                                    blk[k] = coef + (p1 if coef >= 0 else m1)
                            else:
                                if r == 0:
                                    if s_val:
                                        blk[k] = s_val
                                    k += 1
                                    break
                                r -= 1
                            k += 1
                if eobrun:
                    while k <= se:
                        coef = int(blk[k])
                        if coef != 0 and reader.read_bit() and (coef & p1) == 0:
                            blk[k] = coef + (p1 if coef >= 0 else m1)
                        k += 1
                    eobrun -= 1
    return end_pos


# -- encoder -------------------------------------------------------------------


class _BitWriter:
    __slots__ = ("acc", "nbits", "out")

    def __init__(self):
        self.acc = 0
        self.nbits = 0
        self.out = bytearray()

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
        # truncate the accumulator to the pending bits: an unbounded
        # Python bigint grows by every bit ever written and turns each
        # shift O(total output) — quadratic encode (same mask discipline
        # as the flac/tiff/gif bit writers)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-padding per spec


def _csize(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_block(bw: _BitWriter, zz: np.ndarray, pred: int, dc_tab, ac_tab) -> int:
    dc = int(zz[0])
    diff = dc - pred
    size = _csize(diff)
    code, length = dc_tab[size]
    bw.write(code, length)
    if size:
        bw.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            if k > last_nz:
                break
            run += 1
            continue
        while run > 15:
            c, l = ac_tab[0xF0]  # ZRL
            bw.write(c, l)
            run -= 16
        s = _csize(v)
        c, l = ac_tab[(run << 4) | s]
        bw.write(c, l)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        c, l = ac_tab[0x00]  # EOB
        bw.write(c, l)
    return dc


def _blockify(plane: np.ndarray) -> np.ndarray:
    """(H, W) float, H/W multiples of 8 → (nby*nbx, 8, 8) raster order."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _dht_segment(tc: int, th: int, bits, vals) -> bytes:
    return (
        b"\xff\xc4"
        + struct.pack(">H", 2 + 1 + 16 + len(vals))
        + bytes([tc << 4 | th])
        + bytes(bits)
        + bytes(vals)
    )


def with_default_huffman(buf: bytes) -> bytes:
    """Splice the T.81 Annex K typical Huffman tables into a DHT-less frame.

    MJPEG-in-AVI conventionally omits DHT from every frame (OpenDML /
    historical 'MJPG' convention: decoders supply the Annex K tables).
    Walks the marker segments between SOI and SOS; if any DHT is present
    the stream is returned unchanged, else all four standard tables are
    inserted immediately after SOI. The scan never enters entropy data,
    so a 0xFFC4 byte pair inside the compressed payload can't fool it."""
    if len(buf) < 4 or buf[0:2] != b"\xff\xd8":
        raise ImageCodecError("not a JPEG stream (missing SOI)")
    pos = 2
    n = len(buf)
    while pos + 4 <= n:
        if buf[pos] != 0xFF:
            raise ImageCodecError(f"expected marker at offset {pos}")
        marker = buf[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        if marker == 0xC4:
            return buf
        if marker in (0xDA, 0xD9):  # SOS / EOI: header walk is over
            break
        (seg_len,) = struct.unpack_from(">H", buf, pos + 2)
        pos += 2 + seg_len
    dht = (
        _dht_segment(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS)
        + _dht_segment(1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS)
        + _dht_segment(0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS)
        + _dht_segment(1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS)
    )
    return buf[:2] + dht + buf[2:]


def strip_huffman(buf: bytes) -> bytes:
    """Remove every DHT segment from a frame's header — the inverse
    convention of with_default_huffman, used by the MJPEG-in-AVI encoder
    so written files follow the historical 'MJPG frames carry no DHT'
    form. Only valid when the frame uses exactly the Annex K tables
    (encode_jpeg always does)."""
    if len(buf) < 4 or buf[0:2] != b"\xff\xd8":
        raise ImageCodecError("not a JPEG stream (missing SOI)")
    out = bytearray(buf[:2])
    pos = 2
    n = len(buf)
    while pos + 4 <= n:
        if buf[pos] != 0xFF:
            raise ImageCodecError(f"expected marker at offset {pos}")
        marker = buf[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        if marker in (0xDA, 0xD9):  # SOS: copy the rest verbatim
            out += buf[pos:]
            return bytes(out)
        (seg_len,) = struct.unpack_from(">H", buf, pos + 2)
        if marker != 0xC4:
            out += buf[pos : pos + 2 + seg_len]
        pos += 2 + seg_len
    return bytes(out)


def _prepare_quantized(pixels, w, h, quality, subsample):
    """RGB → quantized zigzag coefficient blocks per component (shared by
    the sequential and progressive encoders)."""
    px = np.asarray(pixels, np.uint8).reshape(h, w, 3).astype(np.float64)
    r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    qy = _scaled_qt(_QT_LUMA, quality)
    qc = _scaled_qt(_QT_CHROMA, quality)

    if subsample:
        hsamp, vsamp = 2, 2
        # pad to even, then 2x2 box-average the chroma planes
        pe_h, pe_w = (-h) % 2, (-w) % 2
        cbp = np.pad(cb, ((0, pe_h), (0, pe_w)), mode="edge")
        crp = np.pad(cr, ((0, pe_h), (0, pe_w)), mode="edge")
        cb_s = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean((1, 3))
        cr_s = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean((1, 3))
    else:
        hsamp = vsamp = 1
        cb_s, cr_s = cb, cr

    mcu_w, mcu_h = 8 * hsamp, 8 * vsamp
    mcus_x, mcus_y = -(-w // mcu_w), -(-h // mcu_h)

    def pad_to(plane, bh, bw_):
        return np.pad(
            plane,
            ((0, bh * 8 - plane.shape[0]), (0, bw_ * 8 - plane.shape[1])),
            mode="edge",
        )

    y_p = pad_to(y, mcus_y * vsamp, mcus_x * hsamp) - 128.0
    cb_p = pad_to(cb_s, mcus_y, mcus_x) - 128.0
    cr_p = pad_to(cr_s, mcus_y, mcus_x) - 128.0

    def quantize(plane, q):
        # q is in natural (row-major) order; quantize naturally, then emit
        # coefficients in zigzag scan order for the entropy coder
        coef = np.einsum("ij,njk,lk->nil", _DCT_D, _blockify(plane), _DCT_D,
                         optimize=True)
        return np.round(coef.reshape(-1, 64) / q[None, :]).astype(np.int32)[
            :, _ZIGZAG
        ]

    return (
        quantize(y_p, qy), quantize(cb_p, qc), quantize(cr_p, qc),
        qy, qc, hsamp, vsamp, mcus_x, mcus_y,
    )


def encode_jpeg(
    pixels: np.ndarray,
    w: int,
    h: int,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """(h*w*3,) or (h, w, 3) uint8 RGB → baseline JFIF bytes.

    ``subsample`` selects 4:2:0 chroma (halved in both axes); default is
    4:4:4. ``restart_interval`` (in MCUs) emits DRI + RSTn markers —
    mainly so the decoder's restart path has a real producer to test
    against."""
    y_zz, cb_zz, cr_zz, qy, qc, hsamp, vsamp, mcus_x, mcus_y = (
        _prepare_quantized(pixels, w, h, quality, subsample)
    )

    dc_l = _build_encode_table(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_l = _build_encode_table(_AC_LUMA_BITS, _AC_LUMA_VALS)
    dc_c = _build_encode_table(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    ac_c = _build_encode_table(_AC_CHROMA_BITS, _AC_CHROMA_VALS)

    bw = _BitWriter()
    preds = [0, 0, 0]
    y_bw = mcus_x * hsamp
    rst_count = 0
    entropy_parts = []
    for my in range(mcus_y):
        for mx in range(mcus_x):
            mcu_index = my * mcus_x + mx
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                bw.flush()
                entropy_parts.append(bytes(bw.out))
                entropy_parts.append(bytes([0xFF, 0xD0 + (rst_count % 8)]))
                rst_count += 1
                bw = _BitWriter()
                preds = [0, 0, 0]
            for by in range(vsamp):
                for bx in range(hsamp):
                    blk = y_zz[(my * vsamp + by) * y_bw + (mx * hsamp + bx)]
                    preds[0] = _encode_block(bw, blk, preds[0], dc_l, ac_l)
            preds[1] = _encode_block(bw, cb_zz[my * mcus_x + mx], preds[1], dc_c, ac_c)
            preds[2] = _encode_block(bw, cr_zz[my * mcus_x + mx], preds[2], dc_c, ac_c)
    bw.flush()
    entropy_parts.append(bytes(bw.out))
    entropy = b"".join(entropy_parts)

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(
        ">HHBB", 1, 1, 0, 0
    )  # APP0: version 1.1, aspect-ratio units, 1:1 density, no thumbnail
    out += b"\xff\xdb" + struct.pack(">H", 2 + 65) + b"\x00" + bytes(
        qy[_ZIGZAG].astype(np.uint8)
    )
    out += b"\xff\xdb" + struct.pack(">H", 2 + 65) + b"\x01" + bytes(
        qc[_ZIGZAG].astype(np.uint8)
    )
    out += b"\xff\xc0" + struct.pack(">HBHHB", 2 + 6 + 9, 8, h, w, 3)
    out += bytes([1, (hsamp << 4) | vsamp, 0])  # Y
    out += bytes([2, 0x11, 1])  # Cb
    out += bytes([3, 0x11, 1])  # Cr
    out += _dht_segment(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS)
    out += _dht_segment(1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS)
    out += _dht_segment(0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS)
    out += _dht_segment(1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 2 + 1 + 6 + 3, 3)
    out += bytes([1, 0x00, 2, 0x11, 3, 0x11])
    out += bytes([0, 63, 0])  # Ss, Se, Ah/Al
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# -- progressive encoder (T.81 G.1.2) -----------------------------------------


def _pt_ac(v: int, al: int) -> int:
    """AC point transform: signed magnitude shift (G.1.2.2)."""
    return (v >> al) if v >= 0 else -((-v) >> al)


def _prog_ac_table() -> tuple[list, list]:
    """(bits, vals) for a fixed canonical AC table covering every symbol a
    progressive AC scan can emit: run/size pairs (run 0-15, size 1-10),
    ZRL (0xF0), and the EOBn codes (r<<4, r 0-14) that the Annex K
    sequential tables lack. Static lengths chosen so Kraft holds with
    short codes on the common symbols; any valid prefix code is legal
    JPEG, the DHT ships with the file."""
    groups = [
        (4, [0x00, 0x01, 0x11, 0x21]),
        (6, [0x10, 0x20, 0x02, 0x12, 0x31, 0x41, 0x51, 0x61]),
        (8, [0x30, 0x40, 0x50, 0x60, 0x03, 0x13, 0x22, 0x32, 0x71, 0x81,
             0x91, 0xA1, 0xB1, 0xC1, 0xD1, 0xE1, 0xF1, 0xF0, 0x04, 0x14,
             0x23, 0x42, 0x52, 0x62, 0x72, 0x05, 0x15, 0x24, 0x33, 0x06,
             0x16, 0x07]),
    ]
    listed = {s for _, syms in groups for s in syms}
    rest = []
    for r in range(15):
        if (r << 4) not in listed:
            rest.append(r << 4)
    for run in range(16):
        for size in range(1, 11):
            s = (run << 4) | size
            if s not in listed:
                rest.append(s)
    groups.append((10, sorted(rest)))
    bits = [0] * 16
    vals = []
    for length, syms in groups:
        bits[length - 1] += len(syms)
        vals.extend(syms)
    return bits, vals


_PROG_AC_BITS, _PROG_AC_VALS = _prog_ac_table()


class _ProgScanWriter:
    """Entropy writer for one progressive scan, with the EOB-run and
    buffered-correction-bit discipline of G.1.2.3: correction bits of
    already-nonzero coefficients ride immediately after the next emitted
    symbol (ZRL, run/1, or EOBRUN)."""

    def __init__(self, ac_tab):
        self.bw = _BitWriter()
        self.ac_tab = ac_tab
        self.eobrun = 0
        self.be = []  # correction bits owned by the pending EOB run

    def flush_eobrun(self):
        if self.eobrun:
            r = self.eobrun.bit_length() - 1
            c, length = self.ac_tab[r << 4]
            self.bw.write(c, length)
            if r:
                self.bw.write(self.eobrun - (1 << r), r)
            for bit in self.be:
                self.bw.write(bit, 1)
            self.eobrun = 0
            self.be = []

    def ac_first_block(self, band, al):
        vals = [_pt_ac(v, al) for v in band]
        nz = [i for i, v in enumerate(vals) if v]
        if not nz:
            self.eobrun += 1
            if self.eobrun == 0x7FFF:
                self.flush_eobrun()
            return
        self.flush_eobrun()
        run = 0
        last = nz[-1]
        for i in range(last + 1):
            v = vals[i]
            if v == 0:
                run += 1
                continue
            while run > 15:
                c, length = self.ac_tab[0xF0]
                self.bw.write(c, length)
                run -= 16
            s = _csize(v)
            c, length = self.ac_tab[(run << 4) | s]
            self.bw.write(c, length)
            self.bw.write(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if last < len(band) - 1:
            self.eobrun += 1
            if self.eobrun == 0x7FFF:
                self.flush_eobrun()

    def ac_refine_block(self, band, al):
        # |v|>>al == 1 ⟺ newly nonzero at this precision; > 1 ⟺ the
        # coefficient was already nonzero and needs only a correction bit
        absv = [(abs(v) >> al) for v in band]
        newly = [i for i, a in enumerate(absv) if a == 1]
        eob_idx = newly[-1] if newly else -1
        br = []  # correction bits pending behind the next symbol
        run = 0
        for i, a in enumerate(absv):
            if a == 0:
                run += 1
                continue
            while run > 15 and i <= eob_idx:
                self.flush_eobrun()
                c, length = self.ac_tab[0xF0]
                self.bw.write(c, length)
                run -= 16
                for bit in br:
                    self.bw.write(bit, 1)
                br = []
            if a > 1:
                br.append(a & 1)
                continue
            self.flush_eobrun()
            c, length = self.ac_tab[(run << 4) | 1]
            self.bw.write(c, length)
            self.bw.write(1 if band[i] > 0 else 0, 1)
            for bit in br:
                self.bw.write(bit, 1)
            br = []
            run = 0
        if run > 0 or br:
            self.eobrun += 1
            self.be += br
            if self.eobrun == 0x7FFF:
                self.flush_eobrun()

    def finish(self) -> bytes:
        self.flush_eobrun()
        self.bw.flush()
        return bytes(self.bw.out)


def encode_jpeg_progressive(
    pixels: np.ndarray,
    w: int,
    h: int,
    quality: int = 90,
    subsample: bool = False,
) -> bytes:
    """(h*w*3,) or (h, w, 3) uint8 RGB → progressive (SOF2) JFIF bytes.

    Scan script exercises every progressive decode path: interleaved DC
    first at Al=1, DC refinement, then per-component AC first at Al=1 and
    AC refinement at Al=0 (EOB runs + correction bits throughout). Same
    quantization as encode_jpeg, so quality/PSNR behavior is identical
    once all scans are decoded."""
    y_zz, cb_zz, cr_zz, qy, qc, hsamp, vsamp, mcus_x, mcus_y = (
        _prepare_quantized(pixels, w, h, quality, subsample)
    )
    comps_zz = [y_zz, cb_zz, cr_zz]
    samp = [(hsamp, vsamp), (1, 1), (1, 1)]
    hmax, vmax = hsamp, vsamp
    ndims = []
    for ch_, cv in samp:
        cw = -(-w * ch_ // hmax)
        chh = -(-h * cv // vmax)
        ndims.append((-(-cw // 8), -(-chh // 8)))

    dc_l = _build_encode_table(_DC_LUMA_BITS, _DC_LUMA_VALS)
    dc_c = _build_encode_table(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    dc_tab = [dc_l, dc_c, dc_c]
    # one custom AC table (with EOBn codes) shared by all components
    ac_prog = _build_encode_table(_PROG_AC_BITS, _PROG_AC_VALS)
    ac_tab = [ac_prog, ac_prog, ac_prog]

    def blocks_of(ci):
        bw_n, bh_n = ndims[ci]
        padded_bw = mcus_x * samp[ci][0]
        for row in range(bh_n):
            for col in range(bw_n):
                yield comps_zz[ci][row * padded_bw + col]

    def sos(specs, ss, se, ah, al, entropy):
        head = b"\xff\xda" + struct.pack(
            ">HB", 2 + 1 + 2 * len(specs) + 3, len(specs)
        )
        for cid, td, ta in specs:
            head += bytes([cid, (td << 4) | ta])
        head += bytes([ss, se, (ah << 4) | al])
        return head + entropy

    scans = []

    # 1. DC first, interleaved, Al=1
    bw1 = _BitWriter()
    preds = [0, 0, 0]
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci in range(3):
                ch_, cv = samp[ci]
                padded_bw = mcus_x * ch_
                for by in range(cv):
                    for bx in range(ch_):
                        dc = int(
                            comps_zz[ci][
                                (my * cv + by) * padded_bw + (mx * ch_ + bx)
                            ][0]
                        ) >> 1
                        diff = dc - preds[ci]
                        preds[ci] = dc
                        s = _csize(diff)
                        c, length = dc_tab[ci][s]
                        bw1.write(c, length)
                        if s:
                            bw1.write(
                                diff if diff >= 0 else diff + (1 << s) - 1, s
                            )
    bw1.flush()
    scans.append(sos([(1, 0, 0), (2, 1, 0), (3, 1, 0)], 0, 0, 0, 1,
                     bytes(bw1.out)))

    # 2. DC refinement, Ah=1 -> Al=0 (one bit per block, MCU order)
    bw2 = _BitWriter()
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci in range(3):
                ch_, cv = samp[ci]
                padded_bw = mcus_x * ch_
                for by in range(cv):
                    for bx in range(ch_):
                        dc = int(
                            comps_zz[ci][
                                (my * cv + by) * padded_bw + (mx * ch_ + bx)
                            ][0]
                        )
                        bw2.write(dc & 1, 1)
    bw2.flush()
    scans.append(sos([(1, 0, 0), (2, 0, 0), (3, 0, 0)], 0, 0, 1, 0,
                     bytes(bw2.out)))

    # 3./4. per-component AC first (Al=1) then AC refinement (Ah=1, Al=0);
    # all reference the custom AC table 0 (re-declared by DHT mid-file)
    for ci, cid in enumerate((1, 2, 3)):
        sw = _ProgScanWriter(ac_tab[ci])
        for blk in blocks_of(ci):
            sw.ac_first_block([int(v) for v in blk[1:64]], 1)
        scans.append(sos([(cid, 0, 0)], 1, 63, 0, 1, sw.finish()))
    for ci, cid in enumerate((1, 2, 3)):
        sw = _ProgScanWriter(ac_tab[ci])
        for blk in blocks_of(ci):
            sw.ac_refine_block([int(v) for v in blk[1:64]], 0)
        scans.append(sos([(cid, 0, 0)], 1, 63, 1, 0, sw.finish()))

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(
        ">HHBB", 1, 1, 0, 0
    )
    out += b"\xff\xdb" + struct.pack(">H", 2 + 65) + b"\x00" + bytes(
        qy[_ZIGZAG].astype(np.uint8)
    )
    out += b"\xff\xdb" + struct.pack(">H", 2 + 65) + b"\x01" + bytes(
        qc[_ZIGZAG].astype(np.uint8)
    )
    out += b"\xff\xc2" + struct.pack(">HBHHB", 2 + 6 + 9, 8, h, w, 3)
    out += bytes([1, (hsamp << 4) | vsamp, 0])  # Y
    out += bytes([2, 0x11, 1])  # Cb
    out += bytes([3, 0x11, 1])  # Cr
    out += _dht_segment(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS)
    out += _dht_segment(0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS)
    out += _dht_segment(1, 0, _PROG_AC_BITS, _PROG_AC_VALS)
    for s in scans:
        out += s
    out += b"\xff\xd9"  # EOI
    return bytes(out)
