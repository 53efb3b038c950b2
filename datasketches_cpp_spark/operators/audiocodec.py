"""RIFF/WAVE container parsing for the audio lanes — pure stdlib/numpy,
same discipline as imagecodec.py (real containers and codecs where the
published spec is self-contained; anything needing an external library
stays an honest NotImplementedError seam).

Scope: canonical RIFF little-endian WAVE files carrying
  * integer PCM (format code 1): 8-bit unsigned, 16/24/32-bit signed;
  * IEEE float PCM (format code 3): 32- or 64-bit;
  * G.711 A-law (6) and mu-law (7): decoded via the published CCITT
    expansion formulas (the classic public-domain g711 segment layout);
  * IMA/DVI ADPCM (format code 0x11): block-structured 4-bit ADPCM with
    the published IMA step/index tables, mono or stereo (stereo data
    interleaves 4-byte words per channel);
  * WAVE_FORMAT_EXTENSIBLE (0xFFFE) wrapping any of the above via its
    SubFormat tag.
Multi-channel audio is averaged to mono (the fingerprint lanes are mono
by construction); every decode path lands on mono int16. Compressed
formats outside this list (MP3, etc.) raise at the seam.

Layout (RIFF spec / public WAVE documentation):
    'RIFF' <u32 size> 'WAVE' then chunks: <4cc> <u32 size> <payload>,
    chunks are word-aligned (odd sizes padded by one byte);
    'fmt ' → u16 format, u16 channels, u32 sample_rate, u32 byte_rate,
             u16 block_align, u16 bits [+ extension];
    'fact' → u32 samples-per-channel (authoritative for compressed data);
    'data' → raw interleaved samples / ADPCM blocks.

Vectorization: G.711 decodes are a 256-entry table lookup; IMA ADPCM
decodes all blocks in lockstep (numpy across blocks, a Python loop only
over the ~505 sample positions within a block — the irreducibly serial
predictor recurrence). Encoders are fixture twins and may loop.
"""

from __future__ import annotations

import struct

import numpy as np

_WAVE_FORMAT_PCM = 0x0001
_WAVE_FORMAT_IEEE_FLOAT = 0x0003
_WAVE_FORMAT_ALAW = 0x0006
_WAVE_FORMAT_MULAW = 0x0007
_WAVE_FORMAT_IMA_ADPCM = 0x0011
_WAVE_FORMAT_EXTENSIBLE = 0xFFFE


class WavError(ValueError):
    """Malformed or unsupported RIFF/WAVE payload (fail-fast seam)."""


# -- G.711 (CCITT A-law / mu-law) --------------------------------------------
# Expansion formulas from the published G.711 segment layout (the classic
# public-domain g711 reference): mu-law t = ((mant<<3)+0x84)<<exp, sample
# = ±(t-0x84); A-law toggles 0x55, segment 0/1 are linear, higher
# segments shift. Decode is a 256-entry LUT; encode maps each sample to
# the code with the nearest decoded value (searchsorted on midpoints),
# which is exactly the quantizer the tables describe.


def _build_mulaw_lut() -> np.ndarray:
    out = np.empty(256, np.int16)
    for code in range(256):
        u = ~code & 0xFF
        t = (((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 0x07)
        val = t - 0x84
        out[code] = -val if (u & 0x80) else val
    return out


def _build_alaw_lut() -> np.ndarray:
    out = np.empty(256, np.int16)
    for code in range(256):
        a = code ^ 0x55
        t = (a & 0x0F) << 4
        seg = (a & 0x70) >> 4
        if seg == 0:
            t += 8
        elif seg == 1:
            t += 0x108
        else:
            t = (t + 0x108) << (seg - 1)
        out[code] = t if (a & 0x80) else -t
    return out


_MULAW_LUT = _build_mulaw_lut()
_ALAW_LUT = _build_alaw_lut()


def _g711_encoder(lut: np.ndarray):
    order = np.argsort(lut, kind="stable")
    decoded = lut[order].astype(np.int32)
    # mu-law has TWO codes decoding to 0 (0xFF "+0" and 0x7F "-0"); keep
    # exactly one code per decoded value (the last = the positive-zero
    # code) so the quantizer is a function of the decoded value alone and
    # encode∘decode is idempotent — otherwise encode(-1) picks -0 (0x7F)
    # while re-encoding its decoded 0 picks +0 (0xFF), and byte round-trip
    # contracts break (the same signed-zero canonicalization the float
    # sketches apply at update).
    keep = np.append(decoded[1:] != decoded[:-1], True)
    order, decoded = order[keep], decoded[keep]
    mids = (decoded[:-1] + decoded[1:]) // 2

    def enc(pcm: np.ndarray) -> np.ndarray:
        idx = np.searchsorted(mids, pcm.astype(np.int32), side="right")
        return order[idx].astype(np.uint8)

    return enc


_MULAW_ENC = _g711_encoder(_MULAW_LUT)
_ALAW_ENC = _g711_encoder(_ALAW_LUT)


# -- IMA/DVI ADPCM ------------------------------------------------------------
# Published IMA ADPCM tables (IMA Digital Audio Focus Group algorithm).

_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], np.int32)

_IMA_INDEX_ADJ = np.array([-1, -1, -1, -1, 2, 4, 6, 8], np.int32)


def _ima_step(pred: np.ndarray, index: np.ndarray, nib: np.ndarray):
    """One lockstep IMA ADPCM update over a vector of channels/blocks."""
    step = _IMA_STEPS[index]
    diff = step >> 3
    diff += np.where(nib & 4, step, 0)
    diff += np.where(nib & 2, step >> 1, 0)
    diff += np.where(nib & 1, step >> 2, 0)
    pred = np.where(nib & 8, pred - diff, pred + diff)
    pred = np.clip(pred, -32768, 32767)
    index = np.clip(index + _IMA_INDEX_ADJ[nib & 7], 0, 88)
    return pred, index


def _decode_ima(
    data: bytes, channels: int, block_align: int, samples_per_block: int
) -> np.ndarray:
    """ADPCM block stream → (n, channels) int16, all blocks in lockstep."""
    if channels not in (1, 2):
        raise WavError(f"IMA ADPCM supports 1-2 channels, got {channels}")
    if block_align < 4 * channels + 4:
        raise WavError(f"IMA ADPCM block_align {block_align} too small")
    n_blocks = len(data) // block_align
    if n_blocks == 0:
        raise WavError("IMA ADPCM data shorter than one block")
    raw = np.frombuffer(data[: n_blocks * block_align], np.uint8).reshape(
        n_blocks, block_align
    )
    # per-channel 4-byte headers: i16 predictor, u8 step index, u8 reserved
    hdr = raw[:, : 4 * channels].reshape(n_blocks, channels, 4)
    pred = (
        hdr[:, :, 0].astype(np.int32) | (hdr[:, :, 1].astype(np.int32) << 8)
    ).astype(np.int16).astype(np.int32)
    index = np.clip(hdr[:, :, 2].astype(np.int32), 0, 88)

    body = raw[:, 4 * channels :]
    # nibble streams per channel: stereo interleaves 4-byte words
    if channels == 2:
        words = body.reshape(n_blocks, -1, 2, 4)  # (blocks, word-pairs, ch, 4)
        chan_bytes = words.transpose(0, 2, 1, 3).reshape(n_blocks, 2, -1)
    else:
        chan_bytes = body.reshape(n_blocks, 1, -1)
    lo = chan_bytes & 0x0F
    hi = chan_bytes >> 4
    nibs = np.empty((n_blocks, channels, chan_bytes.shape[2] * 2), np.uint8)
    nibs[:, :, 0::2] = lo
    nibs[:, :, 1::2] = hi

    data_samples = min(samples_per_block - 1, nibs.shape[2])
    out = np.empty((n_blocks, channels, 1 + data_samples), np.int16)
    out[:, :, 0] = pred.astype(np.int16)
    for s in range(data_samples):
        pred, index = _ima_step(pred, index, nibs[:, :, s].astype(np.int32))
        out[:, :, s + 1] = pred.astype(np.int16)
    # (blocks, ch, samples) → (blocks*samples, ch)
    return out.transpose(0, 2, 1).reshape(-1, channels)


def _encode_ima(
    pcm: np.ndarray, channels: int, block_align: int
) -> tuple[bytes, int]:
    """(n, channels) int16 → ADPCM block stream; fixture twin, loops."""
    samples_per_block = (block_align - 4 * channels) * 2 // channels + 1
    n = pcm.shape[0]
    n_blocks = -(-max(n, 1) // samples_per_block)
    padded = np.zeros((n_blocks * samples_per_block, channels), np.int32)
    padded[:n] = pcm.astype(np.int32)
    out = bytearray()
    index = np.zeros(channels, np.int32)
    for b in range(n_blocks):
        blk = padded[b * samples_per_block : (b + 1) * samples_per_block]
        pred = blk[0].copy()
        for c in range(channels):
            out += struct.pack(
                "<hBB", int(pred[c]), int(index[c]), 0
            )
        nibs = np.empty((samples_per_block - 1, channels), np.uint8)
        for s in range(1, samples_per_block):
            step = _IMA_STEPS[index]
            diff = blk[s] - pred
            nib = np.where(diff < 0, 8, 0)
            ad = np.abs(diff)
            n4 = (ad >= step).astype(np.int32)
            ad -= n4 * step
            n2 = (ad >= step >> 1).astype(np.int32)
            ad -= n2 * (step >> 1)
            n1 = (ad >= step >> 2).astype(np.int32)
            nib = nib | (n4 << 2) | (n2 << 1) | n1
            pred, index = _ima_step(pred, index, nib)
            nibs[s - 1] = nib.astype(np.uint8)
        # pack: per channel, 2 nibbles/byte (low first), stereo in 4-byte words
        per_ch = nibs.T  # (ch, samples-1)
        packed = (per_ch[:, 0::2] | (per_ch[:, 1::2] << 4)).astype(np.uint8)
        if channels == 2:
            words = packed.reshape(2, -1, 4)  # (ch, words, 4)
            inter = words.transpose(1, 0, 2).reshape(-1)
            out += inter.tobytes()
        else:
            out += packed.tobytes()
    return bytes(out), samples_per_block


# -- container ----------------------------------------------------------------


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (mono int16 PCM ndarray, sample_rate).

    Multi-channel audio is averaged to mono (rounded toward zero, still
    int16). Handles integer PCM 8/16/24/32, IEEE float 32/64, G.711
    A-law/mu-law, and IMA ADPCM; anything else raises WavError."""
    if len(buf) < 12 or buf[0:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise WavError("not a RIFF/WAVE stream")
    pos = 12
    fmt = None
    data = None
    fact_samples = None
    n = len(buf)
    while pos + 8 <= n:
        cc = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        body = pos + 8
        if body + size > n:
            raise WavError(f"truncated chunk {cc!r}: needs {size} bytes")
        if cc == b"fmt ":
            if size < 16:
                raise WavError("fmt chunk too short")
            code, channels, rate, _br, block_align, bits = struct.unpack_from(
                "<HHIIHH", buf, body
            )
            ext = buf[body + 16 : body + size]
            if code == _WAVE_FORMAT_EXTENSIBLE:
                # SubFormat GUID's leading u16 is the real format code
                if size < 40:
                    raise WavError("extensible fmt chunk too short")
                (code,) = struct.unpack_from("<H", buf, body + 24)
            if channels < 1:
                raise WavError("fmt chunk declares zero channels")
            fmt = (code, channels, rate, block_align, bits, ext)
        elif cc == b"fact" and size >= 4:
            (fact_samples,) = struct.unpack_from("<I", buf, body)
        elif cc == b"data":
            data = buf[body : body + size]
        pos = body + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise WavError("missing fmt or data chunk")
    code, channels, rate, block_align, bits, ext = fmt

    if code == _WAVE_FORMAT_PCM:
        if bits == 16:
            width = 2
            usable = (len(data) // (width * channels)) * width * channels
            samples = np.frombuffer(data[:usable], "<i2").reshape(-1, channels)
            wide = samples.astype(np.float64)
        elif bits == 8:
            samples = np.frombuffer(data, np.uint8)
            usable = (len(samples) // channels) * channels
            wide = (
                samples[:usable].reshape(-1, channels).astype(np.float64) - 128.0
            ) * 256.0
        elif bits == 24:
            usable = (len(data) // (3 * channels)) * 3 * channels
            b3 = np.frombuffer(data[:usable], np.uint8).reshape(-1, 3)
            v = (
                b3[:, 0].astype(np.int32)
                | (b3[:, 1].astype(np.int32) << 8)
                | (b3[:, 2].astype(np.int32) << 16)
            )
            v = (v << 8) >> 8  # sign-extend 24 -> 32
            wide = v.reshape(-1, channels).astype(np.float64) / 256.0
        elif bits == 32:
            usable = (len(data) // (4 * channels)) * 4 * channels
            wide = (
                np.frombuffer(data[:usable], "<i4")
                .reshape(-1, channels)
                .astype(np.float64)
                / 65536.0
            )
        else:
            raise WavError(f"unsupported integer PCM width {bits}")
    elif code == _WAVE_FORMAT_IEEE_FLOAT:
        if bits == 32:
            flt = np.frombuffer(
                data[: (len(data) // (4 * channels)) * 4 * channels], "<f4"
            )
        elif bits == 64:
            flt = np.frombuffer(
                data[: (len(data) // (8 * channels)) * 8 * channels], "<f8"
            )
        else:
            raise WavError(f"unsupported float PCM width {bits}")
        # rint, not truncate: x/32767*32767 can land a hair below the
        # integer it encodes
        wide = np.clip(
            np.rint(flt.reshape(-1, channels).astype(np.float64) * 32767.0),
            -32768.0,
            32767.0,
        )
    elif code in (_WAVE_FORMAT_ALAW, _WAVE_FORMAT_MULAW):
        lut = _ALAW_LUT if code == _WAVE_FORMAT_ALAW else _MULAW_LUT
        samples = np.frombuffer(data, np.uint8)
        usable = (len(samples) // channels) * channels
        wide = lut[samples[:usable]].reshape(-1, channels).astype(np.float64)
    elif code == _WAVE_FORMAT_IMA_ADPCM:
        if len(ext) >= 4:
            (spb,) = struct.unpack_from("<H", ext, 2)
        else:
            spb = (block_align - 4 * channels) * 2 // max(channels, 1) + 1
        wide = _decode_ima(data, channels, block_align, spb).astype(np.float64)
    else:
        raise WavError(
            f"unsupported WAVE format code={code} bits={bits}; supported: "
            "integer PCM 8/16/24/32, IEEE float, G.711 A-law/mu-law, IMA "
            "ADPCM (other compressed audio is a documented codec seam)"
        )

    if fact_samples is not None:
        wide = wide[:fact_samples]
    pcm = wide.mean(axis=1).astype(np.int16) if channels > 1 else wide[
        :, 0
    ].astype(np.int16)
    return pcm, rate


def encode_wav(
    pcm: np.ndarray, sample_rate: int = 16000, codec: str = "pcm16"
) -> bytes:
    """Mono int16 PCM → WAV bytes (the test-fixture twin of decode_wav;
    also handy for exporting lane inputs).

    codec selects the on-disk format: 'pcm16' (default, lossless),
    'pcm8'/'pcm24'/'pcm32', 'float32'/'float64' (lossless), 'alaw'/
    'mulaw' (G.711), 'ima_adpcm' (4-bit blocks). A 2-D (n, 2) array
    writes stereo for 'pcm16' and 'ima_adpcm'."""
    arr = np.asarray(pcm)
    if arr.ndim == 1:
        arr = arr[:, None]
    channels = arr.shape[1]
    arr = arr.astype(np.int16)
    if channels != 1 and codec not in ("pcm16", "ima_adpcm"):
        raise WavError(f"stereo encode only for pcm16/ima_adpcm, not {codec}")

    ext = b""
    fact = None
    if codec == "pcm16":
        code, bits = _WAVE_FORMAT_PCM, 16
        body = np.ascontiguousarray(arr.astype("<i2")).tobytes()
        block_align = 2 * channels
    elif codec == "pcm8":
        code, bits = _WAVE_FORMAT_PCM, 8
        body = ((arr[:, 0].astype(np.int32) >> 8) + 128).astype(np.uint8).tobytes()
        block_align = 1
    elif codec == "pcm24":
        code, bits = _WAVE_FORMAT_PCM, 24
        v = arr[:, 0].astype(np.int32) << 8
        b = np.empty((len(v), 3), np.uint8)
        b[:, 0] = v & 0xFF
        b[:, 1] = (v >> 8) & 0xFF
        b[:, 2] = (v >> 16) & 0xFF
        body = b.tobytes()
        block_align = 3
    elif codec == "pcm32":
        code, bits = _WAVE_FORMAT_PCM, 32
        body = (arr[:, 0].astype("<i4") << 16).tobytes()
        block_align = 4
    elif codec in ("float32", "float64"):
        code = _WAVE_FORMAT_IEEE_FLOAT
        bits = 32 if codec == "float32" else 64
        flt = arr[:, 0].astype(np.float64) / 32767.0
        body = flt.astype("<f4" if bits == 32 else "<f8").tobytes()
        block_align = bits // 8
    elif codec in ("alaw", "mulaw"):
        code = _WAVE_FORMAT_ALAW if codec == "alaw" else _WAVE_FORMAT_MULAW
        bits = 8
        enc = _ALAW_ENC if codec == "alaw" else _MULAW_ENC
        body = enc(arr[:, 0]).tobytes()
        block_align = 1
        fact = len(arr)
    elif codec == "ima_adpcm":
        code, bits = _WAVE_FORMAT_IMA_ADPCM, 4
        block_align = 256 * channels
        body, spb = _encode_ima(arr, channels, block_align)
        ext = struct.pack("<HH", 2, spb)
        fact = len(arr)
    else:
        raise WavError(f"unknown encode codec {codec!r}")

    byte_rate = sample_rate * block_align if codec != "ima_adpcm" else (
        sample_rate * block_align // ((block_align - 4 * channels) * 2 // channels + 1)
    )
    fmt_chunk = b"fmt " + struct.pack(
        "<IHHIIHH",
        16 + len(ext),
        code,
        channels,
        sample_rate,
        byte_rate,
        block_align,
        bits,
    ) + ext
    chunks = fmt_chunk
    if fact is not None:
        chunks += b"fact" + struct.pack("<II", 4, fact)[:8]
    data_chunk = b"data" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        data_chunk += b"\x00"
    chunks += data_chunk
    riff_size = 4 + len(chunks)  # 'WAVE' + chunks
    return b"RIFF" + struct.pack("<I", riff_size) + b"WAVE" + chunks


def to_pcm16(buf: bytes, fmt: str) -> bytes:
    """Normalize an audio payload to raw mono PCM16 bytes.

    'pcm16' passes through; 'wav' parses the RIFF container (any decode_
    wav-supported codec inside); anything else raises NotImplementedError
    at the documented codec seam."""
    if fmt == "pcm16":
        return buf
    if fmt == "wav":
        return decode_wav(buf)[0].tobytes()
    if fmt == "flac":
        from .flaccodec import decode_flac

        return decode_flac(buf)[0].tobytes()
    raise NotImplementedError(
        f"audio decode for fmt={fmt!r} requires a codec not present in this "
        "environment; supported here: 'pcm16' (raw mono), 'wav' (RIFF: "
        "integer/float PCM, G.711, IMA ADPCM), 'flac' (lossless)"
    )
