"""From-scratch EXIF (TIFF 6.0 container) build / parse / embed.

The north star's corpus is geotagged imagery; real-world geotags live in
an EXIF APP1 segment (JPEG) or an ``eXIf`` chunk (PNG 1.5 extension),
both carrying the same TIFF-structured payload.  This module implements
that payload from the public TIFF 6.0 + EXIF 2.3 + PNG specs:

- ``build_exif`` writes a little-endian TIFF with IFD0 (Orientation
  0x0112, DateTime 0x0132, GPS-IFD pointer 0x8825) and a GPS IFD
  (GPSVersionID, GPSLatitudeRef/GPSLatitude, GPSLongitudeRef/
  GPSLongitude as the spec's 3-RATIONAL deg/min/sec form).
- ``parse_exif`` walks any well-formed payload back (II or MM byte
  order, arbitrary rational denominators) and returns orientation,
  datetime and signed micro-degree lat/lon.
- ``embed_exif_jpeg`` / ``embed_exif_png`` insert the payload into
  existing bytes without touching pixel data (APP1 right after SOI /
  ``eXIf`` chunk right after IHDR); ``find_exif`` locates it again in
  either container.

Exactness contract (oracle parity): coordinates are micro-degree
integers (the repo-wide lattice, FIXTURES.md §1).  They are stored as
``(deg, 1), (remainder*60, 1_000_000), (0, 1)`` — all integers, so the
rational round-trip is EXACT and a DuckDB oracle can recompute the same
micro-degree values from the phash arithmetic without ever seeing the
binary.  Reference analog: FAGI-gis consumes WGS84 POI coordinates from
its inputs (`fagi-gis` geometry literals); here the coordinate truly
rides inside the image bytes, as the north rule's image+caption corpus
implies.
"""

from __future__ import annotations

import struct

_TIFF_LE = b"II*\x00"
_TIFF_BE = b"MM\x00*"
EXIF_HEADER = b"Exif\x00\x00"

# TIFF field types used here
_T_ASCII = 2
_T_SHORT = 3
_T_LONG = 4
_T_RATIONAL = 5
_T_UNDEFINED = 7

_TAG_ORIENTATION = 0x0112
_TAG_DATETIME = 0x0132
_TAG_GPS_IFD = 0x8825
_GPS_VERSION = 0x0000
_GPS_LAT_REF = 0x0001
_GPS_LAT = 0x0002
_GPS_LON_REF = 0x0003
_GPS_LON = 0x0004


def _dms_rationals(microdeg: int) -> list[tuple[int, int]]:
    """abs micro-degrees -> exact (deg,1),(min*1e6-scaled),(0,1)."""
    md = abs(int(microdeg))
    deg, rem = divmod(md, 1_000_000)
    return [(deg, 1), (rem * 60, 1_000_000), (0, 1)]


def _microdeg_from_dms(vals: list[tuple[int, int]]) -> int:
    """(deg,min,sec) rationals -> micro-degrees, half-up on any
    non-lattice input (our own payloads divide exactly)."""
    num = 0  # total micro-degrees * (product of denominators) accumulator
    # exact integer arithmetic: md = d + m/60 + s/3600 degrees, x 1e6
    dn, dd = vals[0]
    mn, md_ = vals[1]
    sn, sd = vals[2]
    # common denominator dd*md_*sd*3600
    num = dn * md_ * sd * 3600 * 1_000_000
    num += mn * dd * sd * 60 * 1_000_000
    num += sn * dd * md_ * 1_000_000
    den = dd * md_ * sd * 3600
    q, r = divmod(num, den)
    return int(q + (1 if 2 * r >= den else 0))


def build_exif(
    lat_microdeg: int,
    lon_microdeg: int,
    orientation: int = 1,
    datetime: str = "2023:01:01 00:00:00",
) -> bytes:
    """Serialize the TIFF payload (``Exif\\x00\\x00`` prefix included)."""
    # --- GPS IFD (fixed shape: 5 entries) -------------------------------
    # Entry values > 4 bytes live in a data area after the IFD; offsets
    # are from the TIFF header start.  Layout (all little-endian):
    #   0: TIFF header (8 bytes)
    #   8: IFD0 (2 + 3*12 + 4)
    #   IFD0 data: datetime (20 bytes, padded to even)
    #   GPS IFD (2 + 5*12 + 4)
    #   GPS data: lat rationals (24), lon rationals (24)
    dt = datetime.encode("ascii")[:19] + b"\x00"
    ifd0_off = 8
    ifd0_size = 2 + 3 * 12 + 4
    dt_off = ifd0_off + ifd0_size
    gps_off = dt_off + len(dt)
    gps_size = 2 + 5 * 12 + 4
    lat_off = gps_off + gps_size
    lon_off = lat_off + 24

    def entry(tag: int, typ: int, count: int, value: bytes) -> bytes:
        return struct.pack("<HHI", tag, typ, count) + value.ljust(4, b"\x00")

    out = bytearray()
    out += _TIFF_LE + struct.pack("<I", ifd0_off)
    # IFD0
    out += struct.pack("<H", 3)
    out += entry(_TAG_ORIENTATION, _T_SHORT, 1, struct.pack("<H", orientation))
    out += entry(_TAG_DATETIME, _T_ASCII, len(dt), struct.pack("<I", dt_off))
    out += entry(_TAG_GPS_IFD, _T_LONG, 1, struct.pack("<I", gps_off))
    out += struct.pack("<I", 0)  # next-IFD pointer: none
    out += dt
    # GPS IFD
    lat_ref = b"N\x00" if lat_microdeg >= 0 else b"S\x00"
    lon_ref = b"E\x00" if lon_microdeg >= 0 else b"W\x00"
    out += struct.pack("<H", 5)
    out += entry(_GPS_VERSION, _T_UNDEFINED, 4, bytes((2, 3, 0, 0)))
    out += entry(_GPS_LAT_REF, _T_ASCII, 2, lat_ref)
    out += entry(_GPS_LAT, _T_RATIONAL, 3, struct.pack("<I", lat_off))
    out += entry(_GPS_LON_REF, _T_ASCII, 2, lon_ref)
    out += entry(_GPS_LON, _T_RATIONAL, 3, struct.pack("<I", lon_off))
    out += struct.pack("<I", 0)
    for n, d in _dms_rationals(lat_microdeg) + _dms_rationals(lon_microdeg):
        out += struct.pack("<II", n, d)
    return EXIF_HEADER + bytes(out)


def parse_exif(payload: bytes) -> dict | None:
    """Parse an ``Exif\\x00\\x00``-prefixed TIFF payload.  Returns
    ``{orientation, datetime, lat_microdeg, lon_microdeg}`` (missing
    fields as None) or None if the payload is not EXIF/TIFF at all.
    Handles both byte orders and arbitrary rational denominators."""
    if payload[:6] != EXIF_HEADER:
        return None
    t = payload[6:]
    if t[:4] == _TIFF_LE:
        e = "<"
    elif t[:4] == _TIFF_BE:
        e = ">"
    else:
        return None

    def u16(off: int) -> int:
        return struct.unpack_from(e + "H", t, off)[0]

    def u32(off: int) -> int:
        return struct.unpack_from(e + "I", t, off)[0]

    def read_ifd(off: int) -> dict[int, tuple[int, int, int]]:
        n = u16(off)
        fields = {}
        for i in range(n):
            base = off + 2 + 12 * i
            tag, typ = u16(base), u16(base + 2)
            cnt = u32(base + 4)
            fields[tag] = (typ, cnt, base + 8)
        return fields

    def value_off(typ: int, cnt: int, voff: int) -> int:
        size = {_T_ASCII: 1, _T_SHORT: 2, _T_LONG: 4, _T_RATIONAL: 8, _T_UNDEFINED: 1}
        if size.get(typ, 4) * cnt <= 4:
            return voff
        return u32(voff)

    def rationals(cnt: int, voff: int) -> list[tuple[int, int]]:
        off = value_off(_T_RATIONAL, cnt, voff)
        return [(u32(off + 8 * i), u32(off + 8 * i + 4)) for i in range(cnt)]

    try:
        ifd0 = read_ifd(u32(4))
        out: dict = {
            "orientation": None,
            "datetime": None,
            "lat_microdeg": None,
            "lon_microdeg": None,
        }
        if _TAG_ORIENTATION in ifd0:
            typ, cnt, voff = ifd0[_TAG_ORIENTATION]
            out["orientation"] = u16(voff) if typ == _T_SHORT else u32(voff)
        if _TAG_DATETIME in ifd0:
            typ, cnt, voff = ifd0[_TAG_DATETIME]
            off = value_off(typ, cnt, voff)
            out["datetime"] = t[off : off + cnt].split(b"\x00")[0].decode("ascii")
        if _TAG_GPS_IFD in ifd0:
            gps = read_ifd(u32(ifd0[_TAG_GPS_IFD][2]))
            for tag_ref, tag_val, key, neg in (
                (_GPS_LAT_REF, _GPS_LAT, "lat_microdeg", b"S"),
                (_GPS_LON_REF, _GPS_LON, "lon_microdeg", b"W"),
            ):
                if tag_val not in gps:
                    continue
                typ, cnt, voff = gps[tag_val]
                if typ != _T_RATIONAL or cnt < 3:
                    continue
                md = _microdeg_from_dms(rationals(3, voff))
                if tag_ref in gps:
                    _, rcnt, rvoff = gps[tag_ref]
                    roff = value_off(_T_ASCII, rcnt, rvoff)
                    if t[roff : roff + 1] == neg:
                        md = -md
                out[key] = md
        return out
    except (struct.error, IndexError, UnicodeDecodeError, ZeroDivisionError):
        # ZeroDivisionError: a malformed GPS rational with denominator 0
        # (seen in the wild) must skip, not kill the Arrow batch
        return None


# ---------------------------------------------------------------------------
# container embed / locate
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def embed_exif_jpeg(data: bytes, payload: bytes) -> bytes:
    """Insert an APP1 segment right after SOI (JEITA places APP1 first;
    decoders skip unknown APPn, so pixels are untouched)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    seg = b"\xff\xe1" + (len(payload) + 2).to_bytes(2, "big") + payload
    return data[:2] + seg + data[2:]


def embed_exif_png(data: bytes, payload: bytes) -> bytes:
    """Insert an ``eXIf`` chunk right after IHDR (PNG 1.5 / ISO 15948
    registered chunk; ancillary, so any decoder safely skips it).  The
    chunk body is the raw TIFF (no ``Exif\\x00\\x00`` prefix, per spec)."""
    import zlib

    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    body = payload[6:] if payload[:6] == EXIF_HEADER else payload
    (ihdr_len,) = struct.unpack(">I", data[8:12])
    end = 8 + 12 + ihdr_len  # sig + len/type/payload/crc of IHDR
    tag = b"eXIf"
    chunk = (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )
    return data[:end] + chunk + data[end:]


def find_exif(data: bytes) -> bytes | None:
    """Locate the EXIF payload in JPEG (APP1) or PNG (eXIf) bytes and
    return it ``Exif\\x00\\x00``-prefixed, or None.  Scans segment/chunk
    tables only — never entropy data."""
    if data[:2] == b"\xff\xd8":
        pos = 2
        while pos + 4 <= len(data) and data[pos] == 0xFF:
            marker = data[pos + 1]
            if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            seg_len = int.from_bytes(data[pos + 2 : pos + 4], "big")
            if marker == 0xE1 and data[pos + 4 : pos + 10] == EXIF_HEADER:
                return data[pos + 4 : pos + 2 + seg_len]
            if marker == 0xDA:  # entropy follows; EXIF never after SOS
                return None
            pos += 2 + seg_len
        return None
    if data[:8] == _PNG_SIG:
        i = 8
        while i + 8 <= len(data):
            (ln,) = struct.unpack(">I", data[i : i + 4])
            tag = data[i + 4 : i + 8]
            if tag == b"eXIf":
                return EXIF_HEADER + data[i + 8 : i + 8 + ln]
            if tag == b"IEND":
                return None
            i += 12 + ln
        return None
    return None
