"""Baseline TIFF 6.0 encode/decode, reusing the byte-order/IFD machinery
style of sources/exif.py (EXIF *is* a TIFF — same spec, same field
layout).  Coverage: uncompressed (Compression=1) 8-bit grayscale
(Photometric 1) and RGB (Photometric 2), strip-organized, either byte
order on decode.  A TIFF written here can also carry the GPS IFD —
EXIF's native home — but the corpus keeps geotags in JPEG/PNG rows.
Interop: JDK ImageIO (javax.imageio TIFF plugin, JDK 9+) reads our
files and writes files we read (pytest)."""

from __future__ import annotations

import struct

import numpy as np

_T_SHORT = 3
_T_LONG = 4

_W, _H, _BPS, _COMP, _PHOTO = 256, 257, 258, 259, 262
_STRIP_OFF, _SPP, _ROWS_PER_STRIP, _STRIP_CNT = 273, 277, 278, 279
_PLANAR = 284


def _entries(data: bytes, e: str, off: int) -> dict[int, tuple[int, int, int]]:
    (n,) = struct.unpack_from(e + "H", data, off)
    out = {}
    for i in range(n):
        base = off + 2 + 12 * i
        tag, typ = struct.unpack_from(e + "HH", data, base)
        (cnt,) = struct.unpack_from(e + "I", data, base + 4)
        out[tag] = (typ, cnt, base + 8)
    return out


def _values(data: bytes, e: str, typ: int, cnt: int, voff: int) -> list[int]:
    size = {_T_SHORT: 2, _T_LONG: 4, 1: 1}.get(typ)
    if size is None:
        raise ValueError(f"unsupported TIFF field type {typ}")
    if size * cnt > 4:
        (voff,) = struct.unpack_from(e + "I", data, voff)
    fmt = {1: "B", _T_SHORT: "H", _T_LONG: "I"}[typ]
    return list(struct.unpack_from(e + fmt * cnt, data, voff))


def decode_tiff(data: bytes) -> np.ndarray:
    """Returns (h, w) uint8 gray or (h, w, 3) uint8 RGB."""
    if data[:4] == b"II*\x00":
        e = "<"
    elif data[:4] == b"MM\x00*":
        e = ">"
    else:
        raise ValueError("not a TIFF")
    (ifd_off,) = struct.unpack_from(e + "I", data, 4)
    f = _entries(data, e, ifd_off)

    def one(tag: int, default: int | None = None) -> int:
        if tag not in f:
            if default is None:
                raise ValueError(f"TIFF missing required tag {tag}")
            return default
        typ, cnt, voff = f[tag]
        return _values(data, e, typ, cnt, voff)[0]

    w, h = one(_W), one(_H)
    comp = one(_COMP, 1)
    photo = one(_PHOTO)
    spp = one(_SPP, 1)
    if comp != 1:
        raise ValueError(f"compressed TIFF (Compression={comp}) not supported")
    if photo not in (0, 1, 2) or spp not in (1, 3):
        raise ValueError(f"TIFF photometric {photo}/spp {spp} not supported")
    if one(_PLANAR, 1) != 1:
        # planar (RRR..GGG..BBB) strips would reshape to garbled pixels
        # while passing every other guard — refuse, don't garble
        raise ValueError("planar-configuration TIFF not supported")
    typ, cnt, voff = f[_BPS]
    if any(b != 8 for b in _values(data, e, typ, cnt, voff)):
        raise ValueError("only 8-bit TIFF samples supported")
    typ, cnt, voff = f[_STRIP_OFF]
    offs = _values(data, e, typ, cnt, voff)
    typ, cnt, voff = f[_STRIP_CNT]
    cnts = _values(data, e, typ, cnt, voff)
    raw = b"".join(data[o : o + c] for o, c in zip(offs, cnts))
    need = w * h * spp
    if len(raw) < need:
        raise ValueError("truncated TIFF strips")
    px = np.frombuffer(raw, dtype=np.uint8, count=need)
    if spp == 1:
        px = px.reshape(h, w)
        if photo == 0:  # WhiteIsZero
            px = 255 - px
        return np.ascontiguousarray(px)
    return np.ascontiguousarray(px.reshape(h, w, 3))


def _encode(px: np.ndarray, spp: int) -> bytes:
    h, w = px.shape[:2]
    raw = px.astype(np.uint8).tobytes()
    # header + one IFD (9 entries) + BPS array (for RGB) + pixel data
    n_ent = 9
    ifd_off = 8
    ifd_size = 2 + n_ent * 12 + 4
    bps_off = ifd_off + ifd_size
    bps_extra = 6 if spp == 3 else 0
    data_off = bps_off + bps_extra

    def entry(tag: int, typ: int, cnt: int, val: int) -> bytes:
        if typ == _T_SHORT and cnt == 1:
            return struct.pack("<HHIHH", tag, typ, cnt, val, 0)
        return struct.pack("<HHII", tag, typ, cnt, val)

    out = bytearray(b"II*\x00" + struct.pack("<I", ifd_off))
    out += struct.pack("<H", n_ent)
    out += entry(_W, _T_LONG, 1, w)
    out += entry(_H, _T_LONG, 1, h)
    if spp == 3:
        out += struct.pack("<HHII", _BPS, _T_SHORT, 3, bps_off)
    else:
        out += entry(_BPS, _T_SHORT, 1, 8)
    out += entry(_COMP, _T_SHORT, 1, 1)
    out += entry(_PHOTO, _T_SHORT, 1, 2 if spp == 3 else 1)
    out += entry(_STRIP_OFF, _T_LONG, 1, data_off)
    out += entry(_SPP, _T_SHORT, 1, spp)
    out += entry(_ROWS_PER_STRIP, _T_LONG, 1, h)
    out += entry(_STRIP_CNT, _T_LONG, 1, len(raw))
    out += struct.pack("<I", 0)
    if spp == 3:
        out += struct.pack("<HHH", 8, 8, 8)
    out += raw
    return bytes(out)


def encode_tiff_gray(px: np.ndarray) -> bytes:
    return _encode(px, 1)


def encode_tiff_rgb(px: np.ndarray) -> bytes:
    return _encode(px, 3)
