"""Geohash cells (Niemeyer 2008) — the base-32 public cell index.

The fourth cell index next to WebMercator z-tiles, Morton, real S2 and
hex7: alternating lon/lat bisection starting with LONGITUDE, 5 bits per
output character, base-32 alphabet ``0123456789bcdefghjkmnpqrstuvwxyz``
(i, l, o are skipped — the published geohash alphabet).  Everything here
is the documented public encoding; anchors in the tests are the
community test vectors (``ezs42`` and ``u4pruydqqvj``).

Like :mod:`fagi_gis_spark.index.tiles`, ONE SQL text is the source of
truth: :func:`geohash_bits_sql` / :func:`geohash_str_sql` generate plain
integer/substr arithmetic that runs verbatim on Spark SQL (whole-stage
codegen, via ``F.expr``) and on DuckDB (the oracle), so the engine and
the oracle cannot diverge.  The numpy twin serves Arrow-batched UDF
composition and local differentials.

Bit layout for precision ``p`` (``5*p`` bits, MSB first): even bit
positions from the MSB carry longitude, odd carry latitude, so
``nlon = ceil(5p/2)`` and ``nlat = floor(5p/2)``.  Quantization is
``floor((lon+180)/360 * 2^nlon)`` clamped to the top cell (lon=180 /
lat=90 land in the last cell, not out of range).  Precision <= 12 keeps
the code in int64.  Refinement nests: the first ``5q`` bits of a
precision-``p`` code (q < p) ARE the precision-``q`` code, so the
string prefix is the parent cell — the property the prefix-rollup
query leans on.
"""

from __future__ import annotations

import numpy as np

GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"
DEFAULT_PRECISION = 7


def _bit_sources(precision: int) -> tuple[int, int, list[tuple[str, int]]]:
    """For each output bit from the MSB: which axis and which source bit."""
    total = 5 * precision
    nlon = (total + 1) // 2
    nlat = total // 2
    plan = []
    for j in range(total):
        if j % 2 == 0:
            plan.append(("lon", nlon - 1 - j // 2))
        else:
            plan.append(("lat", nlat - 1 - (j - 1) // 2))
    return nlon, nlat, plan


def geohash_bits_np(
    lon: np.ndarray, lat: np.ndarray, precision: int = DEFAULT_PRECISION
) -> np.ndarray:
    """Interleaved geohash bit code as int64 (numpy twin)."""
    nlon, nlat, plan = _bit_sources(precision)
    qlon = np.clip(
        np.floor((np.asarray(lon, dtype=np.float64) + 180.0) / 360.0 * (1 << nlon)).astype(
            np.int64
        ),
        0,
        (1 << nlon) - 1,
    )
    qlat = np.clip(
        np.floor((np.asarray(lat, dtype=np.float64) + 90.0) / 180.0 * (1 << nlat)).astype(
            np.int64
        ),
        0,
        (1 << nlat) - 1,
    )
    total = 5 * precision
    code = np.zeros_like(qlon)
    for j, (axis, src) in enumerate(plan):
        bit = (qlon >> src if axis == "lon" else qlat >> src) & 1
        code |= bit << (total - 1 - j)
    return code


def geohash_str_np(
    lon: np.ndarray, lat: np.ndarray, precision: int = DEFAULT_PRECISION
) -> np.ndarray:
    bits = geohash_bits_np(lon, lat, precision)
    chars = []
    for i in range(precision):
        idx = (bits >> (5 * (precision - 1 - i))) & 31
        chars.append(np.array(list(GEOHASH_ALPHABET))[idx])
    out = chars[0].astype(object)
    for c in chars[1:]:
        out = out + c
    return out.astype(str)


def geohash_decode_np(code: str) -> tuple[float, float]:
    """Cell-center decode of one geohash string (test helper)."""
    precision = len(code)
    nlon, nlat, plan = _bit_sources(precision)
    bits = 0
    for ch in code:
        bits = (bits << 5) | GEOHASH_ALPHABET.index(ch)
    qlon = qlat = 0
    total = 5 * precision
    for j, (axis, src) in enumerate(plan):
        b = (bits >> (total - 1 - j)) & 1
        if axis == "lon":
            qlon |= b << src
        else:
            qlat |= b << src
    lon = (qlon + 0.5) / (1 << nlon) * 360.0 - 180.0
    lat = (qlat + 0.5) / (1 << nlat) * 180.0 - 90.0
    return lon, lat


def _q_sql(lon_expr: str, lat_expr: str, precision: int) -> tuple[str, str]:
    nlon, nlat, _ = _bit_sources(precision)
    qlon = (
        f"LEAST(GREATEST(CAST(floor(({lon_expr} + 180.0) / 360.0 * {float(1 << nlon)!r}) "
        f"AS BIGINT), 0), {(1 << nlon) - 1})"
    )
    qlat = (
        f"LEAST(GREATEST(CAST(floor(({lat_expr} + 90.0) / 180.0 * {float(1 << nlat)!r}) "
        f"AS BIGINT), 0), {(1 << nlat) - 1})"
    )
    return qlon, qlat


def _bit_sql(q_expr: str, src: int) -> str:
    """Bit ``src`` of a small (< 2^30, double-exact) nonnegative integer —
    no ``//`` (Spark lacks it) and no ``DIV`` (DuckDB lacks it), so the
    identical text parses on both engines."""
    return f"(CAST(floor(({q_expr}) / {float(1 << src)!r}) AS BIGINT) % 2)"


def geohash_bits_sql(
    lon_expr: str, lat_expr: str, precision: int = DEFAULT_PRECISION
) -> str:
    """Integer-arithmetic SQL for the interleaved bit code — runs verbatim
    on Spark SQL AND DuckDB (floor/least/greatest/%/* only)."""
    nlon, nlat, plan = _bit_sources(precision)
    qlon, qlat = _q_sql(lon_expr, lat_expr, precision)
    total = 5 * precision
    terms = []
    for j, (axis, src) in enumerate(plan):
        q = qlon if axis == "lon" else qlat
        terms.append(f"{_bit_sql(q, src)} * {1 << (total - 1 - j)}")
    return "(" + " + ".join(terms) + ")"


def geohash_str_sql(
    lon_expr: str, lat_expr: str, precision: int = DEFAULT_PRECISION
) -> str:
    """base-32 geohash string — each character's 5-bit group is assembled
    directly from the quantized axes (every operand < 2^30, so the shared
    floor-division text is exact on both engines at ANY precision)."""
    nlon, nlat, plan = _bit_sources(precision)
    qlon, qlat = _q_sql(lon_expr, lat_expr, precision)
    chars = []
    for i in range(precision):
        group = []
        for off in range(5):
            axis, src = plan[5 * i + off]
            q = qlon if axis == "lon" else qlat
            group.append(f"{_bit_sql(q, src)} * {1 << (4 - off)}")
        idx = " + ".join(group)
        chars.append(
            f"substr('{GEOHASH_ALPHABET}', CAST({idx} AS INTEGER) + 1, 1)"
        )
    return "concat(" + ", ".join(chars) + ")"
