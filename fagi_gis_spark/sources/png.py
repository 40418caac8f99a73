"""Minimal grayscale PNG encoder/decoder (stdlib zlib+struct only).

The sandbox has no image libraries, so the ``input_hint`` image payloads
are real PNGs produced here: 8-bit grayscale, filter 0. This is enough to
exercise the decoded-pixel PSNR>=40dB invariant end-to-end (lossy formats
are simulated by deterministic quantization before encode — see
sources/images.py). Format per the public PNG spec (RFC 2083).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png_gray(pixels: np.ndarray) -> bytes:
    """Encode an (h, w) uint8 array as a grayscale PNG."""
    if pixels.dtype != np.uint8 or pixels.ndim != 2:
        raise ValueError("expected (h, w) uint8")
    h, w = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # bitdepth 8, gray
    raw = b"".join(b"\x00" + pixels[r].tobytes() for r in range(h))
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", zlib.compress(raw, 1)) + _chunk(b"IEND", b"")


def decode_png_gray(data: bytes) -> np.ndarray:
    """Decode a grayscale filter-0/1/2 PNG back to (h, w) uint8."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG")
    i = 8
    w = h = None
    idat = b""
    while i < len(data):
        (ln,) = struct.unpack(">I", data[i : i + 4])
        tag = data[i + 4 : i + 8]
        payload = data[i + 8 : i + 8 + ln]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", payload[:10])
            if depth != 8 or ctype != 0:
                raise ValueError("only 8-bit grayscale supported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        i += 12 + ln
    raw = zlib.decompress(idat)
    out = np.zeros((h, w), dtype=np.uint8)
    stride = w + 1
    prev = np.zeros(w, dtype=np.uint8)
    for r in range(h):
        ft = raw[r * stride]
        line = np.frombuffer(raw[r * stride + 1 : (r + 1) * stride], dtype=np.uint8).copy()
        if ft == 0:
            pass
        elif ft == 1:  # Sub
            for c in range(1, w):
                line[c] = (int(line[c]) + int(line[c - 1])) & 0xFF
        elif ft == 2:  # Up
            line = (line.astype(np.int32) + prev.astype(np.int32)).astype(np.uint8)
        else:
            raise ValueError(f"unsupported PNG filter {ft}")
        out[r] = line
        prev = line
    return out


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)
