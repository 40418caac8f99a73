"""From-scratch BMP (Windows DIB) encode/decode — public BITMAPFILEHEADER
/ BITMAPINFOHEADER layout.  Coverage: uncompressed (BI_RGB) 8-bit
paletted and 24-bit BGR, bottom-up and top-down (negative height) row
order, 4-byte row padding.  Real-corpus role: BMP is the simplest
container a crawler still meets; decoding it for real (instead of the
r1-r4 stub) exercises the same mapInPandas plumbing with zero codec
risk.  Interop: JDK ImageIO both reads our files and writes files we
read (pytest)."""

from __future__ import annotations

import struct

import numpy as np


def encode_bmp_gray(px: np.ndarray) -> bytes:
    """8-bit paletted BMP with the identity gray palette, bottom-up."""
    h, w = px.shape
    pad = (-w) % 4
    palette = b"".join(struct.pack("<BBBB", v, v, v, 0) for v in range(256))
    rows = b"".join(
        px[y].astype(np.uint8).tobytes() + b"\x00" * pad for y in range(h - 1, -1, -1)
    )
    off = 14 + 40 + len(palette)
    header = struct.pack("<2sIHHI", b"BM", off + len(rows), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(rows), 2835, 2835, 256, 0)
    return header + info + palette + rows


def encode_bmp_rgb(px: np.ndarray) -> bytes:
    """24-bit BGR BMP, bottom-up."""
    h, w, _ = px.shape
    pad = (-(w * 3)) % 4
    bgr = px[..., ::-1].astype(np.uint8)
    rows = b"".join(bgr[y].tobytes() + b"\x00" * pad for y in range(h - 1, -1, -1))
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(rows), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows), 2835, 2835, 0, 0)
    return header + info + rows


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode BI_RGB 8-bit paletted / 24-bit / 32-bit BMPs.  Returns
    (h, w) uint8 when the palette is gray (or the image is 8-bit with a
    gray palette), else (h, w, 3) RGB."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (off,) = struct.unpack_from("<I", data, 10)
    (hdr_size,) = struct.unpack_from("<I", data, 14)
    if hdr_size < 40:
        raise ValueError("BITMAPCOREHEADER not supported")
    w, h_signed = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    (compression,) = struct.unpack_from("<I", data, 30)
    (clr_used,) = struct.unpack_from("<I", data, 46)
    if compression != 0:
        raise ValueError(f"compressed BMP (BI_ code {compression}) not supported")
    if bpp not in (8, 24, 32):
        raise ValueError(f"{bpp}-bit BMP not supported")
    top_down = h_signed < 0
    h = abs(h_signed)
    if w <= 0 or h == 0:
        raise ValueError("bad BMP dimensions")
    row_bytes = (w * bpp // 8 + 3) & ~3
    need = off + row_bytes * h
    if len(data) < need:
        raise ValueError("truncated BMP pixel data")
    raw = np.frombuffer(data, dtype=np.uint8, count=row_bytes * h, offset=off)
    raw = raw.reshape(h, row_bytes)
    if not top_down:
        raw = raw[::-1]
    if bpp == 8:
        n_colors = clr_used or 256
        pal = np.frombuffer(
            data, dtype=np.uint8, count=4 * n_colors, offset=14 + hdr_size
        ).reshape(-1, 4)
        idx = raw[:, :w]
        rgb = pal[idx][..., :3][..., ::-1]  # BGRA palette entries -> RGB
    else:
        step = bpp // 8
        px = raw[:, : w * step].reshape(h, w, step)
        rgb = px[..., :3][..., ::-1]
    if (rgb[..., 0] == rgb[..., 1]).all() and (rgb[..., 1] == rgb[..., 2]).all():
        return np.ascontiguousarray(rgb[..., 0])
    return np.ascontiguousarray(rgb)
