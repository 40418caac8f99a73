"""PNG codec (stdlib zlib+struct only — the sandbox has no image libs).

Encoder: 8-bit grayscale, filter 0 (plus an Adam7-interlaced variant
that exists to prove the decoder's pass geometry against a third-party
reader) — the corpus generator's lossless format.

Decoder (``decode_png``): any common real-world PNG — 8/16-bit depth
(16-bit returns the most significant byte), color types gray(0),
RGB(2), palette(3), gray+alpha(4), RGBA(6) (alpha dropped), scanline
filters 0-4 (None/Sub/Up/Average/Paeth), and Adam7 interlacing.
Conformance is proven against the JDK's javax.imageio in both
directions (tests/test_images_and_pipeline.py): the JDK writer's
adaptively-filtered files (its heuristic picks Sub/Up/Average/Paeth on
gradient content) decode bit-exactly, and the JDK reads our interlaced
files back bit-exactly.  Format per the public PNG spec (RFC 2083).
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


#: Adam7 interlace pass geometry: (xstart, ystart, xstep, ystep)
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _unfilter(raw: bytes, h: int, w: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filtering (types 0-4, RFC 2083 §6) for one
    (sub)image of h rows x w pixels x bpp filter bytes per pixel.
    Returns (h, w*bpp) uint8.  Sub is a per-channel-column modular
    prefix sum (vectorized); Up is vectorized; Average and Paeth are
    byte-sequential by definition (each byte depends on the previous
    reconstructed byte) — fine off the hot path: our own encoder only
    ever writes filter 0, so generated corpora never reach these."""
    rb = w * bpp
    stride = rb + 1
    out = np.zeros((h, rb), dtype=np.uint8)
    prev = np.zeros(rb, dtype=np.int32)
    for r in range(h):
        ft = raw[r * stride]
        line = np.frombuffer(raw[r * stride + 1 : (r + 1) * stride], dtype=np.uint8)
        if ft == 0:
            cur = line.astype(np.int32)
        elif ft == 1:  # Sub: recon[i] = x[i] + recon[i-bpp] — prefix sum
            cur = (
                np.add.accumulate(line.reshape(-1, bpp), axis=0, dtype=np.uint8)
                .reshape(-1)
                .astype(np.int32)
            )
        elif ft == 2:  # Up
            cur = (line.astype(np.int32) + prev) & 0xFF
        elif ft == 3:  # Average
            cur = np.empty(rb, dtype=np.int32)
            for i in range(rb):
                a = cur[i - bpp] if i >= bpp else 0
                cur[i] = (int(line[i]) + ((a + int(prev[i])) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            cur = np.empty(rb, dtype=np.int32)
            for i in range(rb):
                a = cur[i - bpp] if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (int(line[i]) + pred) & 0xFF
        else:
            raise ValueError(f"unsupported PNG filter {ft}")
        out[r] = cur.astype(np.uint8)
        prev = cur
    return out


def decode_png(data: bytes) -> np.ndarray:
    """Decode any common PNG (see module docstring for coverage).
    Returns (h, w) uint8 for grayscale, (h, w, 3) uint8 RGB otherwise."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG")
    i = 8
    w = h = depth = ctype = interlace = None
    plte = None
    idat = []
    while i < len(data):
        (ln,) = struct.unpack(">I", data[i : i + 4])
        tag = data[i + 4 : i + 8]
        payload = data[i + 8 : i + 8 + ln]
        if tag == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(">IIBBBBB", payload)
            if depth not in (8, 16) or (ctype == 3 and depth != 8):
                raise ValueError("only 8/16-bit depths supported")
            if ctype not in _CHANNELS:
                raise ValueError(f"unsupported PNG color type {ctype}")
        elif tag == b"PLTE":
            plte = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
        i += 12 + ln
    if w is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    raw = zlib.decompress(b"".join(idat))
    nch = _CHANNELS[ctype]
    bpp = nch * (depth // 8)

    if interlace == 0:
        img = _unfilter(raw, h, w, bpp)
    elif interlace == 1:  # Adam7: each pass is its own filtered subimage
        img = np.zeros((h, w * bpp), dtype=np.uint8)
        pos = 0
        for xs, ys, xst, yst in _ADAM7:
            pw = (w - xs + xst - 1) // xst
            ph = (h - ys + yst - 1) // yst
            if pw <= 0 or ph <= 0:
                continue
            n = ph * (pw * bpp + 1)
            sub = _unfilter(raw[pos : pos + n], ph, pw, bpp)
            pos += n
            cols = (xs + np.arange(pw) * xst)[:, None] * bpp + np.arange(bpp)
            img[ys::yst, cols.reshape(-1)] = sub.reshape(ph, -1)
    else:
        raise ValueError(f"unsupported interlace method {interlace}")

    px = img.reshape(h, w, nch, depth // 8)[..., 0]  # 16-bit: MSB
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        return plte[px[..., 0]]
    if ctype in (0, 4):
        return px[..., 0]  # gray (alpha dropped for type 4)
    return px[..., :3]  # RGB / RGBA minus alpha


def decode_png_gray(data: bytes) -> np.ndarray:
    """Decode any supported PNG to (h, w) uint8 grayscale: gray planes
    directly, color via BT.601 luma (the same weights the JPEG side
    uses), so every corpus row exposes one well-defined gray surface."""
    px = decode_png(data)
    if px.ndim == 2:
        return px
    y = 0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]
    return np.clip(np.round(y), 0, 255).astype(np.uint8)


def encode_png_gray_interlaced(pixels: np.ndarray) -> bytes:
    """Adam7-interlaced grayscale encode (filter 0 per pass) — exists to
    prove the decoder's pass geometry against a third-party reader."""
    if pixels.dtype != np.uint8 or pixels.ndim != 2:
        raise ValueError("expected (h, w) uint8")
    h, w = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 1)
    raw = bytearray()
    for xs, ys, xst, yst in _ADAM7:
        sub = pixels[ys::yst, xs::xst]
        if sub.size == 0:
            continue
        for row in sub:
            raw += b"\x00" + row.tobytes()
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 1))
        + _chunk(b"IEND", b"")
    )


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)
