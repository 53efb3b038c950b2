"""FLAC decoding for the audio lanes — pure stdlib/numpy, from the
published xiph.org FLAC format specification (RFC 9639), same
discipline as audiocodec.py: the container and the lossless codec are
real; anything genuinely needing an external library stays a seam.

Decoder scope (the full baseline bitstream, minus oddities no encoder
emits for fingerprint-lane material):
  * STREAMINFO + all metadata blocks (skipped except STREAMINFO);
  * frames with both blocking strategies, UTF-8 coded frame numbers,
    inline blocksize/sample-rate fields, CRC-8 header check;
  * subframes CONSTANT, VERBATIM, FIXED orders 0-4, LPC orders 1-32,
    wasted bits, 8/12/16/20/24-bit samples;
  * Rice residuals, both methods (4- and 5-bit parameters), partition
    orders 0-15, escape-to-verbatim partitions;
  * stereo decorrelation: independent, left/side, right/side, mid/side.
Output is averaged to mono int16 like every other decode path in the
audio lane.

encode_flac is the fixture twin: a valid, lossless encoder writing
FIXED-order subframes (0-2, picked per frame by residual energy) or —
to exercise the decoder's LPC path — order-2 quantized-LPC subframes,
single-partition Rice residuals, and any of the three stereo
decorrelation modes. Lossless by construction (the residual is computed
against exactly the predictor written to the stream).

Bit-level work loops per residual in Python; fixture/lane clips are
small and decode batches per buffer-length group, so this is the same
honest trade audiocodec's ADPCM path makes (correctness + coverage
over raw speed)."""

from __future__ import annotations

import struct

import numpy as np


class FlacError(ValueError):
    """Malformed or unsupported FLAC payload (fail-fast seam)."""


# -- CRCs (polynomials from the FLAC spec: CRC-8 x^8+x^2+x+1 = 0x07,
#    CRC-16 x^16+x^15+x^2+1 = 0x8005, both initialized to 0) -----------------


def _crc_table(poly: int, width: int) -> np.ndarray:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    tab = np.zeros(256, np.uint32)
    for b in range(256):
        c = b << (width - 8)
        for _ in range(8):
            c = ((c << 1) ^ poly) if (c & top) else (c << 1)
        tab[b] = c & mask
    return tab


_CRC8 = _crc_table(0x07, 8)
_CRC16 = _crc_table(0x8005, 16)


def _crc8(data: bytes) -> int:
    c = 0
    for byte in data:
        c = int(_CRC8[c ^ byte])
    return c


def _crc16(data: bytes) -> int:
    c = 0
    for byte in data:
        c = int(_CRC16[((c >> 8) ^ byte) & 0xFF]) ^ ((c << 8) & 0xFFFF)
    return c


# -- bit I/O ------------------------------------------------------------------


class _BitReader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes, bytepos: int = 0):
        self.buf = buf
        self.pos = bytepos * 8

    def read(self, n: int) -> int:
        """Read n bits MSB-first."""
        p, buf = self.pos, self.buf
        end = p + n
        if end > len(buf) * 8:
            raise FlacError("bitstream truncated")
        first, last = p >> 3, (end + 7) >> 3
        val = int.from_bytes(buf[first:last], "big")
        val >>= (last << 3) - end
        self.pos = end
        return val & ((1 << n) - 1)

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def unary(self) -> int:
        """Count 0 bits until (and consuming) the terminating 1."""
        p, buf = self.pos, self.buf
        total = len(buf) * 8
        n = 0
        # skip whole zero bytes fast once byte-aligned-ish
        while True:
            if p >= total:
                raise FlacError("bitstream truncated in unary code")
            byte = buf[p >> 3]
            rem = 8 - (p & 7)
            window = byte & ((1 << rem) - 1)
            if window == 0:
                n += rem
                p += rem
                continue
            lead = rem - window.bit_length()
            n += lead
            p += lead + 1
            self.pos = p
            return n

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, val: int, n: int) -> None:
        self.acc = (self.acc << n) | (val & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.out)


# -- frame-header coded values ------------------------------------------------

_BLOCKSIZE_CODE = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}
_RATE_CODE = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_BPS_CODE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _read_utf8_number(br: _BitReader) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    while b0 & (0x80 >> n):
        n += 1
    if n < 2 or n > 7:
        raise FlacError("invalid UTF-8 coded number in frame header")
    val = b0 & (0x7F >> n)
    for _ in range(n - 1):
        c = br.read(8)
        if c & 0xC0 != 0x80:
            raise FlacError("invalid UTF-8 continuation in frame header")
        val = (val << 6) | (c & 0x3F)
    return val


def _decode_residual(br: _BitReader, blocksize: int, order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise FlacError(f"reserved residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    part_order = br.read(4)
    n_parts = 1 << part_order
    if blocksize % n_parts or (blocksize >> part_order) <= order:
        raise FlacError("invalid rice partition order")
    out = np.empty(blocksize - order, np.int64)
    idx = 0
    for p in range(n_parts):
        count = (blocksize >> part_order) - (order if p == 0 else 0)
        param = br.read(pbits)
        if param == escape:
            raw = br.read(5)
            for i in range(count):
                out[idx + i] = br.read_signed(raw) if raw else 0
        elif param == 0:
            for i in range(count):
                q = br.unary()
                out[idx + i] = (q >> 1) ^ -(q & 1)
            # zigzag: u = q, val = (u>>1) ^ -(u&1)
        else:
            for i in range(count):
                q = br.unary()
                u = (q << param) | br.read(param)
                out[idx + i] = (u >> 1) ^ -(u & 1)
        idx += count
    return out


_FIXED_COEF = {
    0: np.array([], np.int64),
    1: np.array([1], np.int64),
    2: np.array([2, -1], np.int64),
    3: np.array([3, -3, 1], np.int64),
    4: np.array([4, -6, 4, -1], np.int64),
}


def _predict(warm: np.ndarray, resid: np.ndarray, coefs: np.ndarray,
             shift: int) -> np.ndarray:
    order = len(coefs)
    out = np.empty(order + len(resid), np.int64)
    out[:order] = warm
    rc = coefs[::-1]
    for i in range(len(resid)):
        p = int(np.dot(out[i : i + order], rc)) >> shift
        out[order + i] = p + int(resid[i])
    return out


def _decode_subframe(br: _BitReader, blocksize: int, bps: int) -> np.ndarray:
    if br.read(1):
        raise FlacError("subframe padding bit set")
    sft = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.unary() + 1
    ebps = bps - wasted
    if sft == 0:  # CONSTANT
        v = br.read_signed(ebps)
        out = np.full(blocksize, v, np.int64)
    elif sft == 1:  # VERBATIM
        out = np.array([br.read_signed(ebps) for _ in range(blocksize)],
                       np.int64)
    elif 8 <= sft <= 12:  # FIXED
        order = sft - 8
        warm = np.array([br.read_signed(ebps) for _ in range(order)], np.int64)
        resid = _decode_residual(br, blocksize, order)
        out = _predict(warm, resid, _FIXED_COEF[order], 0)
    elif sft >= 32:  # LPC
        order = sft - 31
        warm = np.array([br.read_signed(ebps) for _ in range(order)], np.int64)
        prec = br.read(4) + 1
        if prec == 16:
            raise FlacError("invalid LPC precision code 15")
        shift = br.read_signed(5)
        if shift < 0:
            raise FlacError("negative LPC shift")
        coefs = np.array([br.read_signed(prec) for _ in range(order)], np.int64)
        resid = _decode_residual(br, blocksize, order)
        out = _predict(warm, resid, coefs, shift)
    else:
        raise FlacError(f"reserved subframe type {sft}")
    if wasted:
        out <<= wasted
    return out


def decode_flac(buf: bytes) -> tuple[np.ndarray, int]:
    """FLAC bytes → (mono int16 samples, sample_rate)."""
    if len(buf) < 42 or buf[:4] != b"fLaC":
        raise FlacError("not a FLAC stream (missing fLaC magic)")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(buf):
            raise FlacError("truncated metadata block header")
        hdr = buf[pos]
        (length,) = struct.unpack(">I", b"\x00" + buf[pos + 1 : pos + 4])
        body = pos + 4
        if body + length > len(buf):
            raise FlacError("truncated metadata block")
        if hdr & 0x7F == 0:  # STREAMINFO
            si = buf[body : body + 34]
            rate = (si[10] << 12) | (si[11] << 4) | (si[12] >> 4)
            channels = ((si[12] >> 1) & 0x7) + 1
            bps = (((si[12] & 1) << 4) | (si[13] >> 4)) + 1
            total = ((si[13] & 0x0F) << 32) | struct.unpack(
                ">I", si[14:18]
            )[0]
            info = (rate, channels, bps, total)
        pos = body + length
        if hdr & 0x80:
            break
    if info is None:
        raise FlacError("FLAC stream has no STREAMINFO")
    rate, channels, bps, total = info

    # per-frame chunks collected in lists, ONE concatenate at the end —
    # per-frame np.concatenate re-copies the whole history every frame
    # (O(frames^2) on long clips)
    chans_parts: list[list[np.ndarray]] = [[] for _ in range(channels)]
    got = 0
    while pos < len(buf) and (total == 0 or got < total):
        frame_start = pos
        br = _BitReader(buf, pos)
        sync = br.read(14)
        if sync != 0x3FFE:
            raise FlacError(f"bad frame sync at byte {pos}")
        br.read(1)  # reserved
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        rate_code = br.read(4)
        chan_code = br.read(4)
        bps_code = br.read(3)
        br.read(1)  # reserved
        _read_utf8_number(br)
        if bs_code == 0:
            raise FlacError("reserved blocksize code 0")
        elif bs_code == 6:
            blocksize = br.read(8) + 1
        elif bs_code == 7:
            blocksize = br.read(16) + 1
        else:
            blocksize = _BLOCKSIZE_CODE[bs_code]
        if rate_code == 12:
            br.read(8)
        elif rate_code in (13, 14):
            br.read(16)
        elif rate_code == 15:
            raise FlacError("invalid sample-rate code 15")
        fbps = bps if bps_code == 0 else _BPS_CODE.get(bps_code)
        if fbps is None:
            raise FlacError(f"reserved bps code {bps_code}")
        hdr_end = (br.pos + 7) >> 3
        if _crc8(buf[frame_start:hdr_end]) != br.read(8):
            raise FlacError("frame header CRC-8 mismatch")

        if chan_code < 8:
            n_sub = chan_code + 1
            if n_sub != channels:
                raise FlacError("frame channel count != STREAMINFO")
            subs = [_decode_subframe(br, blocksize, fbps) for _ in range(n_sub)]
        elif chan_code in (8, 9, 10):
            if channels != 2:
                raise FlacError("stereo decorrelation in non-stereo stream")
            extra_a = 1 if chan_code == 9 else 0   # right/side: side first
            extra_b = 1 if chan_code in (8, 10) else 0
            a = _decode_subframe(br, blocksize, fbps + extra_a)
            b = _decode_subframe(br, blocksize, fbps + extra_b)
            if chan_code == 8:      # left/side
                subs = [a, a - b]
            elif chan_code == 9:    # right/side
                subs = [a + b, b]
            else:                   # mid/side
                mid, side = a, b
                m2 = (mid << 1) | (side & 1)
                subs = [(m2 + side) >> 1, (m2 - side) >> 1]
        else:
            raise FlacError(f"reserved channel assignment {chan_code}")

        br.align()
        crc_end = br.pos >> 3
        if _crc16(buf[frame_start:crc_end]) != br.read(16):
            raise FlacError("frame footer CRC-16 mismatch")
        pos = br.pos >> 3
        for c in range(channels):
            chans_parts[c].append(subs[c])
        got += blocksize

    chans = [
        np.concatenate(p) if p else np.empty(0, np.int64)
        for p in chans_parts
    ]
    if total and got < total:
        raise FlacError(f"stream ends early: {got}/{total} samples")
    if total:
        chans = [c[:total] for c in chans]
    mono = np.mean(np.stack(chans), axis=0) if channels > 1 else chans[0]
    # scale to int16 like audiocodec's other depths
    if bps > 16:
        mono = mono / (1 << (bps - 16))
    elif bps < 16:
        mono = mono * (1 << (16 - bps))
    return np.clip(np.round(mono), -32768, 32767).astype("<i2"), rate


# -- fixture-twin encoder -----------------------------------------------------


def _write_residual(bw: _BitWriter, resid: np.ndarray) -> None:
    """Single-partition Rice residual (method 0, partition order 0)."""
    bw.write(0, 2)
    bw.write(0, 4)
    u = (np.abs(resid) << 1) - (resid < 0)
    mean = float(np.mean(u)) if len(u) else 0.0
    param = max(0, min(14, int(np.log2(mean + 1)) if mean >= 1 else 0))
    # cap pathological unary runs
    while param < 14 and mean / (1 << param) > 30:
        param += 1
    bw.write(param, 4)
    for s in u:
        s = int(s)
        bw.unary(s >> param)
        if param:
            bw.write(s & ((1 << param) - 1), param)


def _write_subframe(bw: _BitWriter, samples: np.ndarray, bps: int,
                    lpc: bool) -> None:
    if lpc and len(samples) >= 3:
        # order-2 quantized LPC: coefs [2, -1] << 11 (precision 14,
        # shift 11 — 2<<11 fits signed 14-bit) == the FIXED-2 predictor,
        # written through the LPC syntax so decoders exercise that path;
        # lossless regardless.
        order, prec, shift = 2, 14, 11
        coefs = np.array([2 << 11, -(1 << 11)], np.int64)
        bw.write(0, 1)
        bw.write(32 + order - 1, 6)
        bw.write(0, 1)  # no wasted bits
        for s in samples[:order]:
            bw.write(int(s), bps)
        bw.write(prec - 1, 4)
        bw.write(shift, 5)
        for c in coefs:
            bw.write(int(c), prec)
        pred = (2 * samples[1:-1].astype(np.int64) * (1 << 11)
                - samples[:-2].astype(np.int64) * (1 << 11)) >> shift
        resid = samples[2:].astype(np.int64) - pred
        _write_residual(bw, resid)
        return
    x = samples.astype(np.int64)
    diffs = {0: x, 1: np.diff(x), 2: np.diff(x, n=2) if len(x) > 2 else None}
    order, best_cost = 0, None
    for o in (0, 1, 2):
        if len(x) <= o or diffs[o] is None:
            continue
        cost = float(np.sum(np.abs(diffs[o])))
        if best_cost is None or cost < best_cost:
            order, best_cost = o, cost
    bw.write(0, 1)
    bw.write(8 + order, 6)
    bw.write(0, 1)
    for s in x[:order]:
        bw.write(int(s), bps)
    _write_residual(bw, diffs[order])


def encode_flac(
    pcm: np.ndarray,
    sample_rate: int = 16000,
    channels: int = 1,
    blocksize: int = 4096,
    stereo_mode: str = "independent",
    lpc: bool = False,
) -> bytes:
    """int16 samples → FLAC bytes (fixture twin, lossless).

    pcm: shape (n,) mono or (n, 2) stereo int16. stereo_mode one of
    'independent' | 'left_side' | 'right_side' | 'mid_side'."""
    pcm = np.asarray(pcm)
    if channels == 2:
        if pcm.ndim != 2 or pcm.shape[1] != 2:
            raise FlacError("stereo encode needs pcm shape (n, 2)")
    else:
        pcm = pcm.reshape(-1, 1)
    n = len(pcm)
    bps = 16

    out = bytearray(b"fLaC")
    si = bytearray(34)
    struct.pack_into(">HH", si, 0, blocksize, blocksize)
    si[10] = (sample_rate >> 12) & 0xFF
    si[11] = (sample_rate >> 4) & 0xFF
    si[12] = ((sample_rate & 0xF) << 4) | ((channels - 1) << 1) | ((bps - 1) >> 4)
    si[13] = (((bps - 1) & 0xF) << 4) | ((n >> 32) & 0xF)
    struct.pack_into(">I", si, 14, n & 0xFFFFFFFF)
    out += bytes([0x80]) + struct.pack(">I", 34)[1:] + bytes(si)

    mode_code = {"independent": None, "left_side": 8, "right_side": 9,
                 "mid_side": 10}[stereo_mode]
    frame_no = 0
    for start in range(0, n, blocksize):
        blk = pcm[start : start + blocksize]
        bs = len(blk)
        bw = _BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 2)  # reserved + fixed blocking
        bw.write(7, 4)  # blocksize: 16-bit field follows
        bw.write(0, 4)  # sample rate: from STREAMINFO
        if channels == 2 and mode_code is not None:
            bw.write(mode_code, 4)
        else:
            bw.write(channels - 1, 4)
        bw.write(4, 3)  # bps 16
        bw.write(0, 1)
        if frame_no < 0x80:
            bw.write(frame_no, 8)
        else:
            # general UTF-8-style multi-byte number (the decoder's
            # _read_utf8_number reads any width): a 2-byte-only encode
            # overflows its lead byte at frame 2048 into an invalid
            # 3-byte prefix the decoder rightly rejects
            # an n-byte form carries (7-n) lead + 6(n-1) continuation
            # bits = 5n+1 payload bits
            nbytes = 2
            while frame_no >= (1 << (5 * nbytes + 1)):
                nbytes += 1
            lead_bits = 7 - nbytes
            prefix = (0xFF << (lead_bits + 1)) & 0xFF
            bw.write(prefix | (frame_no >> (6 * (nbytes - 1))), 8)
            for k in range(nbytes - 2, -1, -1):
                bw.write(0x80 | ((frame_no >> (6 * k)) & 0x3F), 8)
        bw.write(bs - 1, 16)
        hdr = bw.out[:]
        assert bw.nbits == 0
        bw.write(_crc8(bytes(hdr)), 8)

        if channels == 1:
            _write_subframe(bw, blk[:, 0], bps, lpc)
        elif mode_code is None:
            _write_subframe(bw, blk[:, 0], bps, lpc)
            _write_subframe(bw, blk[:, 1], bps, lpc)
        else:
            left = blk[:, 0].astype(np.int64)
            right = blk[:, 1].astype(np.int64)
            side = left - right
            if mode_code == 8:
                _write_subframe(bw, left, bps, lpc)
                _write_subframe(bw, side, bps + 1, lpc)
            elif mode_code == 9:
                _write_subframe(bw, side, bps + 1, lpc)
                _write_subframe(bw, right, bps, lpc)
            else:
                mid = (left + right) >> 1
                _write_subframe(bw, mid, bps, lpc)
                _write_subframe(bw, side, bps + 1, lpc)
        bw.align()
        body = bytes(bw.out)
        bw.write(_crc16(body), 16)
        out += bw.bytes()
        frame_no += 1
    return bytes(out)
