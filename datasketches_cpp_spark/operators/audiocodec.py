"""RIFF/WAVE container parsing for the audio lanes — pure stdlib/numpy,
same discipline as imagecodec.py (real containers where a header walk
suffices; genuinely compressed codecs stay honest NotImplementedError
seams).

Scope: canonical RIFF little-endian WAVE files carrying integer PCM16
(format code 1, bits 16), mono or multi-channel (channels are averaged
to mono — the fingerprint lanes are mono by construction). WAVE_FORMAT_
EXTENSIBLE (0xFFFE) wrapping PCM16 is accepted via its SubFormat tag.
Float/ADPCM/mu-law raise at the seam.

Layout (RIFF spec / public WAVE documentation):
    'RIFF' <u32 size> 'WAVE' then chunks: <4cc> <u32 size> <payload>,
    chunks are word-aligned (odd sizes padded by one byte);
    'fmt ' → u16 format, u16 channels, u32 sample_rate, u32 byte_rate,
             u16 block_align, u16 bits [+ extension];
    'data' → raw interleaved samples.
"""

from __future__ import annotations

import struct

import numpy as np

_WAVE_FORMAT_PCM = 0x0001
_WAVE_FORMAT_EXTENSIBLE = 0xFFFE


class WavError(ValueError):
    """Malformed or unsupported RIFF/WAVE payload (fail-fast seam)."""


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (mono int16 PCM ndarray, sample_rate).

    Multi-channel audio is averaged to mono (rounded toward zero, still
    int16). Raises WavError on anything that is not integer PCM16."""
    if len(buf) < 12 or buf[0:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise WavError("not a RIFF/WAVE stream")
    pos = 12
    fmt = None
    data = None
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
            code, channels, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", buf, body
            )
            if code == _WAVE_FORMAT_EXTENSIBLE:
                # SubFormat GUID's leading u16 is the real format code
                if size < 40:
                    raise WavError("extensible fmt chunk too short")
                (code,) = struct.unpack_from("<H", buf, body + 24)
            if code != _WAVE_FORMAT_PCM or bits != 16:
                raise WavError(
                    f"unsupported WAVE format code={code} bits={bits}; only "
                    "integer PCM16 is supported (compressed audio is a "
                    "documented codec seam)"
                )
            if channels < 1:
                raise WavError("fmt chunk declares zero channels")
            fmt = (channels, rate)
        elif cc == b"data":
            data = buf[body : body + size]
        pos = body + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise WavError("missing fmt or data chunk")
    channels, rate = fmt
    pcm = np.frombuffer(data[: (len(data) // (2 * channels)) * 2 * channels], "<i2")
    if channels > 1:
        pcm = (
            pcm.reshape(-1, channels)
            .mean(axis=1)
            .astype(np.int16)
        )
    return pcm, rate


def encode_wav(pcm: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Mono int16 PCM → canonical WAV bytes (the test-fixture twin of
    decode_wav; also handy for exporting lane inputs)."""
    pcm = np.ascontiguousarray(np.asarray(pcm, "<i2"))
    body = pcm.tobytes()
    fmt_chunk = b"fmt " + struct.pack(
        "<IHHIIHH", 16, _WAVE_FORMAT_PCM, 1, sample_rate, sample_rate * 2, 2, 16
    )
    data_chunk = b"data" + struct.pack("<I", len(body)) + body
    riff_size = 4 + len(fmt_chunk) + len(data_chunk)  # 'WAVE' + chunks
    return b"RIFF" + struct.pack("<I", riff_size) + b"WAVE" + fmt_chunk + data_chunk


def to_pcm16(buf: bytes, fmt: str) -> bytes:
    """Normalize an audio payload to raw mono PCM16 bytes.

    'pcm16' passes through; 'wav' parses the RIFF container; anything
    else raises NotImplementedError at the documented codec seam."""
    if fmt == "pcm16":
        return buf
    if fmt == "wav":
        return decode_wav(buf)[0].tobytes()
    raise NotImplementedError(
        f"audio decode for fmt={fmt!r} requires a codec not present in this "
        "environment; supported here: 'pcm16' (raw mono), 'wav' (RIFF PCM16)"
    )
