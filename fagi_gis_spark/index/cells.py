"""Morton (Z-order) lat/lon cells — the S2-like space-filling-curve index.

Quantizes lon to [0, 2^level) and lat likewise over a configurable window,
then interleaves bits (lon even bits, lat odd bits) so nearby cells share
prefixes — prefix truncation gives the parent cell, exactly the property
S2/H3 indexes provide for locality bucketing and hierarchical rollup.

numpy implementation (used inside Arrow-batched pandas UDFs); level <= 26
keeps ids in int64.
"""

from __future__ import annotations

import numpy as np

DEFAULT_LEVEL = 16


def _part1by1(v: np.ndarray) -> np.ndarray:
    """Spread 32-bit ints so there is a zero bit between each bit."""
    v = v.astype(np.uint64)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def morton_cell_np(
    lon: np.ndarray,
    lat: np.ndarray,
    level: int = DEFAULT_LEVEL,
) -> np.ndarray:
    """Morton cell id at ``level`` (global window: lon [-180,180], lat [-90,90])."""
    n = 1 << level
    qx = np.clip(((np.asarray(lon) + 180.0) / 360.0 * n).astype(np.int64), 0, n - 1)
    qy = np.clip(((np.asarray(lat) + 90.0) / 180.0 * n).astype(np.int64), 0, n - 1)
    code = _part1by1(qx.astype(np.uint64)) | (_part1by1(qy.astype(np.uint64)) << np.uint64(1))
    return code.astype(np.int64)


def parent_cell_np(cell: np.ndarray, levels_up: int = 1) -> np.ndarray:
    """Hierarchical rollup: drop the low 2*levels_up bits."""
    return (np.asarray(cell).astype(np.int64) >> (2 * levels_up)) << (2 * levels_up)


def morton_cell_sql(lon_expr: str, lat_expr: str, level: int = DEFAULT_LEVEL) -> str:
    """DuckDB SQL computing the identical Morton cell (bit interleave as
    integer arithmetic) — the oracle twin of morton_cell_np. Assumes
    in-window coordinates (no clipping)."""
    n = 1 << level
    qx = f"CAST(floor(({lon_expr} + 180.0) / 360.0 * {float(n)!r}) AS BIGINT)"
    qy = f"CAST(floor(({lat_expr} + 90.0) / 180.0 * {float(n)!r}) AS BIGINT)"
    terms = []
    for i in range(level):
        terms.append(f"(({qx} // {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"(({qy} // {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"
