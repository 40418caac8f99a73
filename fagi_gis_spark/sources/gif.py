"""From-scratch GIF87a/89a decode + encode — public GIF spec (CompuServe
1989 / W3C note) LZW with variable code width.

Decode covers what a crawler actually meets in still images: global and
local color tables, interlaced (4-pass) and sequential images, GCE
transparency ignored (alpha is out of the engine's typed surface), the
FIRST image of an animation (the corpus treats GIFs as stills).  The
LZW inner loop is per-code Python over small dictionaries — the same
honest trade the JPEG entropy decoder makes; batches stay Arrow-sized.

Encode writes a spec-valid stream with the classic untabled-LZW trick:
every literal is emitted at its own code width with a CLEAR before the
table would force a width bump — simple, deterministic, and readable by
every conforming decoder (JDK ImageIO interop in pytest)."""

from __future__ import annotations

import struct

import numpy as np

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _lzw_decode(min_code_size: int, data: bytes, n_expected: int) -> np.ndarray:
    clear = 1 << min_code_size
    end = clear + 1
    out = np.empty(n_expected, dtype=np.uint8)
    n_out = 0
    # bit reader over the concatenated sub-block payload, LSB-first
    bitpos = 0
    total_bits = len(data) * 8
    arr = np.frombuffer(data, dtype=np.uint8)

    def read(width: int) -> int:
        nonlocal bitpos
        if bitpos + width > total_bits:
            raise ValueError("truncated LZW stream")
        byte0 = bitpos >> 3
        v = int.from_bytes(arr[byte0 : byte0 + 3].tobytes(), "little")
        v = (v >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        return v

    table: list[bytes] = []

    def reset() -> int:
        nonlocal table
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        return min_code_size + 1

    width = reset()
    prev: bytes | None = None
    while n_out < n_expected:
        code = read(width)
        if code == clear:
            width = reset()
            prev = None
            continue
        if code == end:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError("corrupt LZW code")
        take = min(len(entry), n_expected - n_out)
        out[n_out : n_out + take] = np.frombuffer(entry[:take], dtype=np.uint8)
        n_out += take
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
        if len(table) == (1 << width) and width < 12:
            width += 1
        prev = entry
    if n_out < n_expected:
        raise ValueError("LZW stream ended early")
    return out


def decode_gif(data: bytes) -> np.ndarray:
    """First image of the stream.  Returns (h, w) uint8 for a gray
    palette, else (h, w, 3) RGB."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(data, dtype=np.uint8, count=3 * n, offset=pos).reshape(-1, 3)
        pos += 3 * n
    while pos < len(data):
        b = data[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        _x, _y, w, h, iflags = struct.unpack_from("<HHHHB", data, pos + 1)
        pos += 10
        ct = gct
        if iflags & 0x80:
            n = 2 << (iflags & 7)
            ct = np.frombuffer(data, dtype=np.uint8, count=3 * n, offset=pos).reshape(
                -1, 3
            )
            pos += 3 * n
        if ct is None:
            raise ValueError("GIF image without a color table")
        min_code = data[pos]
        pos += 1
        chunks = []
        while data[pos] != 0:
            ln = data[pos]
            chunks.append(data[pos + 1 : pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        idx = _lzw_decode(min_code, b"".join(chunks), w * h).reshape(h, w)
        if iflags & 0x40:  # interlaced: rows arrive in 4 passes
            rows = np.concatenate(
                [np.arange(start, h, step) for start, step in _INTERLACE_PASSES]
            )
            deinter = np.empty_like(idx)
            deinter[rows] = idx
            idx = deinter
        rgb = ct[idx]
        if (rgb[..., 0] == rgb[..., 1]).all() and (rgb[..., 1] == rgb[..., 2]).all():
            return np.ascontiguousarray(rgb[..., 0])
        return np.ascontiguousarray(rgb)
    raise ValueError("GIF contains no image block")


def encode_gif_gray(px: np.ndarray) -> bytes:
    """GIF89a with the identity gray palette; untabled LZW (literal
    codes + periodic CLEAR — spec-valid, zero table state)."""
    h, w = px.shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | 7, 0, 0)  # GCT, 256 entries
    for v in range(256):
        out += bytes((v, v, v))
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    min_code = 8
    clear, _end = 256, 257
    out.append(min_code)
    # 9-bit codes throughout: CLEAR after every 254 literals keeps the
    # table below the width-bump threshold (table grows by 1 per emit)
    bits = bytearray()
    acc = 0
    nacc = 0

    def emit(code: int) -> None:
        nonlocal acc, nacc
        acc |= code << nacc
        nacc += 9
        while nacc >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8

    emit(clear)
    for i, v in enumerate(px.reshape(-1).astype(np.uint8).tolist()):
        emit(int(v))
        if (i + 1) % 254 == 0:
            emit(clear)
    emit(257)
    if nacc:
        bits.append(acc & 0xFF)
    for i in range(0, len(bits), 255):
        block = bits[i : i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"
    return bytes(out)
