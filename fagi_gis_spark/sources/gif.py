"""From-scratch GIF87a/89a decode + encode — public GIF spec (CompuServe
1989 / W3C note) LZW with variable code width.

Decode covers what a crawler actually meets: global and local color
tables, interlaced (4-pass) and sequential images, and ANIMATIONS —
``decode_gif`` returns the first composited canvas (the still view),
``decode_gif_frames`` every frame with disposal none/background and GCE
transparency honored (alpha itself stays out of the typed surface).  The
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


def decode_gif_frames(data: bytes) -> list[np.ndarray]:
    """ALL frames of a GIF87a/89a stream (animation support): each image
    block decodes at its own position/size/color-table and composites
    onto the logical-screen canvas.  Disposal semantics cover the two
    methods real still-burst GIFs use — "none/keep" (default: frames
    paint over the previous canvas) and "restore to background" (method
    2: the frame's own rect clears before the NEXT frame paints);
    transparency (GCE flag) leaves underlying pixels visible.  Returns a
    list of (h, w) gray or (h, w, 3) RGB uint8 canvases, one per frame.
    ``decode_gif`` stays the single-frame fast path (first canvas)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh, flags, bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(data, dtype=np.uint8, count=3 * n, offset=pos).reshape(-1, 3)
        pos += 3 * n
    bg_rgb = gct[bg] if gct is not None and bg < len(gct) else np.zeros(3, np.uint8)
    canvas = np.broadcast_to(bg_rgb, (sh, sw, 3)).copy()
    frames: list[np.ndarray] = []
    transparent: int | None = None
    disposal = 0
    while pos < len(data):
        b = data[pos]
        if b == 0x3B:
            break
        if b == 0x21:  # extension
            label = data[pos + 1]
            pos += 2
            if label == 0xF9 and data[pos] >= 4:  # Graphic Control Extension
                packed = data[pos + 1]
                disposal = (packed >> 2) & 7
                transparent = data[pos + 4] if packed & 1 else None
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        x, y, w, h, iflags = struct.unpack_from("<HHHHB", data, pos + 1)
        pos += 10
        ct = gct
        if iflags & 0x80:
            n = 2 << (iflags & 7)
            ct = np.frombuffer(data, dtype=np.uint8, count=3 * n, offset=pos).reshape(-1, 3)
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
        if iflags & 0x40:
            rows = np.concatenate(
                [np.arange(start, h, step) for start, step in _INTERLACE_PASSES]
            )
            deinter = np.empty_like(idx)
            deinter[rows] = idx
            idx = deinter
        rect = canvas[y : y + h, x : x + w]
        if transparent is not None:
            opaque = idx != transparent
            rect[opaque] = ct[idx][opaque]
        else:
            rect[...] = ct[idx]
        frames.append(canvas.copy())
        if disposal == 2:  # restore the frame rect to background
            canvas[y : y + h, x : x + w] = bg_rgb
        transparent = None
        disposal = 0
    if not frames:
        raise ValueError("GIF contains no image block")
    out = []
    for f in frames:
        if (f[..., 0] == f[..., 1]).all() and (f[..., 1] == f[..., 2]).all():
            out.append(np.ascontiguousarray(f[..., 0]))
        else:
            out.append(np.ascontiguousarray(f))
    return out


def encode_gif_animation(frames: list[np.ndarray]) -> bytes:
    """Multi-frame GIF89a (gray frames, full-canvas, disposal none) —
    the untabled-LZW writer applied per frame."""
    h, w = frames[0].shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | 7, 0, 0)
    for v in range(256):
        out += bytes((v, v, v))
    for px in frames:
        if px.shape != (h, w):
            raise ValueError("all frames must share the canvas size")
        # GCE: disposal none, no transparency, 10cs delay
        out += b"\x21\xf9\x04\x00\x0a\x00\x00\x00"
        one = encode_gif_gray(px)
        # splice the image block (descriptor..terminator) out of the
        # single-frame writer's output: after header+LSD+GCT
        start = 6 + 7 + 768
        out += one[start:-1]  # keep the 0x00 block terminator, drop the trailer
    out += b"\x3b"
    return bytes(out)


def synth_animation(i: int) -> list[np.ndarray]:
    """Deterministic 4-frame animation i: the generated tile pattern
    rolled 2 px per frame (the same construction the frame-sample
    ingest query uses, at 48x32)."""
    from fagi_gis_spark.sources.images import _pixels_for

    base = _pixels_for(i, 48, 32)
    return [np.roll(base, shift, axis=1) for shift in (0, 2, 4, 6)]


def generate_animations(spark, n: int, partitions: int = 8, variant_every: int = 0):
    """Distributed deterministic animated-GIF corpus (clip_id, bytes);
    with ``variant_every`` = k > 0 every k-th clip also emits a "v:"
    near-duplicate re-ingest, alternating the two real-world edit
    cases: frames requantized (re-encode generation loss) for even
    multiples, last frame dropped (trim) for odd ones."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["i"]:
                i = int(i)
                frames = synth_animation(i)
                rows.append((f"anim_{i:06d}", encode_gif_animation(frames)))
                if variant_every and i % variant_every == 0:
                    if (i // variant_every) % 2 == 0:
                        vf = [
                            ((f.astype(np.int32) // 4) * 4 + 2)
                            .clip(0, 255)
                            .astype(np.uint8)
                            for f in frames
                        ]
                    else:
                        vf = frames[:-1]
                    rows.append((f"v:anim_{i:06d}", encode_gif_animation(vf)))
            yield pd.DataFrame(rows, columns=["clip_id", "bytes"])

    return (
        spark.range(0, n, 1, partitions)
        .withColumnRenamed("id", "i")
        .mapInPandas(gen, schema="clip_id string, bytes binary")
    )
