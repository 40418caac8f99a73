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


def synth_clip(i: int) -> tuple[np.ndarray, int]:
    """Deterministic synthetic clip i: seeded tone + noise, varying
    rate/channels/length — the SAME parameters the audio ingest query
    has always generated (multimodal_audio_stats), factored here so the
    fingerprint corpus reuses them."""
    rng = np.random.default_rng(1000 + i)
    rate = (8000, 16000, 22050)[i % 3]
    ch = 1 + i % 2
    n = 400 + (i % 7) * 100
    t = np.arange(n)[:, None]
    tone = 8000.0 * np.sin(2 * np.pi * (110.0 + i) * t / rate)
    noise = rng.integers(-2000, 2000, size=(n, ch))
    return np.clip(tone + noise, -32768, 32767).astype(np.int16), rate


def synth_variant(i: int) -> tuple[np.ndarray, int]:
    """Perturbed re-ingest of clip i — amplitude x0.9 plus fresh small
    noise (seeded independently), the near-duplicate case an audio
    fingerprint must still match."""
    clip, rate = synth_clip(i)
    rng = np.random.default_rng(900000 + i)
    jitter = rng.integers(-300, 300, size=clip.shape)
    return np.clip(clip * 0.9 + jitter, -32768, 32767).astype(np.int16), rate


def generate_clips(spark, n: int, partitions: int = 8, variant_every: int = 0):
    """Distributed deterministic WAV corpus (clip_id, bytes); with
    ``variant_every`` = k > 0, every k-th clip also emits a perturbed
    "v:" near-duplicate row.  Same mapInPandas fan-out idiom as
    sources/images.generate_images."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["i"]:
                i = int(i)
                clip, rate = synth_clip(i)
                rows.append((f"clip_{i:06d}", encode_wav(clip, rate)))
                if variant_every and i % variant_every == 0:
                    v, vrate = synth_variant(i)
                    rows.append((f"v:clip_{i:06d}", encode_wav(v, vrate)))
            yield pd.DataFrame(rows, columns=["clip_id", "bytes"])

    return (
        spark.range(0, n, 1, partitions)
        .withColumnRenamed("id", "i")
        .mapInPandas(gen, schema="clip_id string, bytes binary")
    )
