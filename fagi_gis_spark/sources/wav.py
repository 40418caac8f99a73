"""From-scratch WAV (RIFF/WAVE) PCM encode/decode — the audio container
needs no codec library at all (headers + raw PCM), so "audio as an
opaque binary column" gets a REAL decode path: the remaining sanctioned
stubs shrink to compressed audio and video demuxing.

Coverage: PCM (format 1) and WAVE_FORMAT_EXTENSIBLE-wrapped PCM, 8-bit
unsigned / 16-bit / 32-bit signed samples, any channel count and rate,
unknown chunks (LIST/fact/cue) skipped per the RIFF contract, odd-sized
chunks padded per spec.  Interop: the JVM's javax.sound.sampled reads
our files and we read its (pytest)."""

from __future__ import annotations

import struct

import numpy as np

_PCM_DTYPES = {8: np.uint8, 16: np.int16, 32: np.int32}


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """(n,) or (n, channels) int16 PCM -> RIFF/WAVE bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.dtype != np.int16:
        raise ValueError("encode_wav writes 16-bit PCM; pass int16 samples")
    n, ch = samples.shape
    data = samples.astype("<i2").tobytes()
    block = ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * block, block, 16)
    out = bytearray(b"RIFF")
    out += struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data) + (len(data) & 1))
    out += b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        out += b"\x00"  # RIFF chunks are word-aligned
    return bytes(out)


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE bytes -> ((n, channels) int array, sample rate).
    8-bit returns uint8 (unsigned per spec), 16/32-bit signed."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    pcm = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (ln,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + ln]
        if tag == b"fmt ":
            if ln < 16:
                raise ValueError("truncated fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
            if fmt[0] == 0xFFFE and ln >= 40:  # EXTENSIBLE: real tag in GUID
                (sub,) = struct.unpack_from("<H", body, 24)
                fmt = (sub,) + fmt[1:]
        elif tag == b"data":
            pcm = body
        pos += 8 + ln + (ln & 1)  # word alignment
    if fmt is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    code, ch, rate, _byterate, _block, bits = fmt
    if code != 1:
        raise ValueError(f"compressed WAV (format {code}) not supported")
    if bits not in _PCM_DTYPES:
        raise ValueError(f"{bits}-bit PCM not supported")
    dt = np.dtype(_PCM_DTYPES[bits]).newbyteorder("<")
    n = len(pcm) // (ch * bits // 8)
    samples = np.frombuffer(pcm, dtype=dt, count=n * ch).reshape(n, ch)
    return np.ascontiguousarray(samples), rate
