"""Quadkey cells (the Bing Maps Tile System's published base-4 string
index; learn.microsoft.com/bingmaps/articles/bing-maps-tile-system) —
the fifth public cell index next to WebMercator z-tiles, Morton, real
S2, hex7 and geohash, and a string re-labelling of the SAME z/x/y tile
lattice :mod:`fagi_gis_spark.index.tiles` already computes: digit ``i``
(1-based from the most significant) is ``2*y_bit + x_bit`` at bit
``z - i`` of the tile coordinates, so the published worked example tile
``(x=3, y=5, level 3)`` encodes as ``"213"``.  Refinement nests by
construction: the first ``q`` digits of a level-``z`` quadkey ARE the
level-``q`` quadkey of the ancestor tile (string prefix = parent cell),
which is what makes quadkeys the industry key scheme for tile caches
and range scans (a prefix range IS a subtree).

Like :mod:`index.tiles` and :mod:`index.geohash`, ONE SQL text is the
source of truth: :func:`quadkey_sql` emits floor/least/%/substr
arithmetic that parses and evaluates identically on Spark SQL
(whole-stage codegen via ``F.expr``) and DuckDB (the oracle).  Tile
coordinates stay < 2^23 for z <= 23, so the shared floor-division bit
extraction is double-exact on both engines.
"""

from __future__ import annotations

import numpy as np

from fagi_gis_spark.index import tiles

QUADKEY_DIGITS = "0123"


def _bit_sql(expr: str, src: int) -> str:
    """Bit ``src`` of a nonnegative integer < 2^52 — no ``//`` (Spark)
    and no ``DIV`` (DuckDB); identical text parses on both engines."""
    return f"(CAST(floor(({expr}) / {float(1 << src)!r}) AS BIGINT) % 2)"


def quadkey_sql(lon_expr: str, lat_expr: str, z: int) -> str:
    """Level-``z`` quadkey string from lon/lat — shared Spark/DuckDB
    text over the engine's own tile arithmetic (tiles.tile_x_sql /
    tile_y_sql, the same expressions every tile oracle already runs)."""
    tx = tiles.tile_x_sql(lon_expr, z)
    # the pole rows of the clamped-mercator lattice land on ty = -1 / 2^z
    # by float slop (tiles.tile_y_sql leaves them out of range, and the
    # in-range tile queries never see them); a STRING cell index must be
    # total, so clamp into the edge row — and negative operands would
    # also send the two engines' floor/% bit texts different ways
    ty = f"LEAST(GREATEST({tiles.tile_y_sql(lat_expr, z)}, 0), {(1 << z) - 1})"
    chars = []
    for i in range(1, z + 1):
        src = z - i
        idx = f"{_bit_sql(ty, src)} * 2 + {_bit_sql(tx, src)}"
        chars.append(f"substr('{QUADKEY_DIGITS}', CAST({idx} AS INTEGER) + 1, 1)")
    return "concat(" + ", ".join(chars) + ")"


def quadkey_np(lon: np.ndarray, lat: np.ndarray, z: int) -> np.ndarray:
    """numpy twin (Arrow-batched composition + local differentials)."""
    tx, ty = tiles.tile_xy_np(np.asarray(lon, np.float64), np.asarray(lat, np.float64), z)
    ty = np.clip(ty, 0, (1 << z) - 1)  # same pole-row clamp as quadkey_sql
    return quadkey_from_xy_np(tx.astype(np.int64), ty.astype(np.int64), z)


def quadkey_from_xy_np(tx: np.ndarray, ty: np.ndarray, z: int) -> np.ndarray:
    digits = np.empty((len(tx), z), dtype="U1")
    lut = np.array(list(QUADKEY_DIGITS))
    for i in range(1, z + 1):
        src = z - i
        digits[:, i - 1] = lut[((ty >> src) & 1) * 2 + ((tx >> src) & 1)]
    return np.array(["".join(row) for row in digits])


def quadkey_decode(qk: str) -> tuple[int, int, int]:
    """(z, x, y) of a quadkey — the published inverse."""
    x = y = 0
    for ch in qk:
        d = QUADKEY_DIGITS.index(ch)
        x = (x << 1) | (d & 1)
        y = (y << 1) | (d >> 1)
    return len(qk), x, y
