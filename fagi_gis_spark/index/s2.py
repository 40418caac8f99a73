"""S2 cell ids (levels 0-30) — the real S2 curve, not the Morton stand-in.

Implements the public S2 geometry cell-id scheme from scratch (the
north-star index named alongside H3): lat/lng -> unit-sphere XYZ -> cube
face (largest-|component| rule) -> face-local (u,v) -> quadratic S-T
transform -> 30-bit leaf (i,j) -> Hilbert curve position -> 64-bit cell
id ``face(3 bits) | position(2*level bits) | center bit``.  Formulas and
traversal tables follow the published s2geometry sources
(github.com/google/s2geometry: src/s2/s2coords.h ``XYZtoFaceUV``/
``UVtoST``, src/s2/s2cell_id.cc ``FromFaceIJ``); no code is copied —
this is a numpy re-derivation of the documented algorithm, vectorized
over Arrow batches.

Bit-parity caveat (documented sandbox boundary): the s2geometry library
is not installed here, so parity with Google's binaries cannot be
asserted against the binary itself.  What the tests DO pin down: a
second, independent scalar implementation agrees bit-for-bit with the
vectorized kernel (``tests/test_cell_indexes.py``), the curve is a
bijection with prefix-containment (parent id == truncated child id),
level-0 ids equal the hand-computable ``face << 61 | 1 << 60``,
decode(encode(p)) stays inside the cell, the DuckDB oracle (a
recursive-CTE replay of the same published recursion, ``s2_cell_sql``)
matches over the full test layers, and — strongest — LEAF-level anchor
ids hand-derived on paper from the published kPosToIJ/kPosToOrientation
tables (face centers -> ``face<<61 | 2^60 | 1``, curve-origin corner ->
``1``, far corner -> ``0x1555555555555555``) match exactly at level 30
(``test_s2_leaf_anchor_values_from_published_tables``), pinning the
full 30-level Hilbert recursion to the published scheme.

Ids are returned as *signed* int64 (two's-complement view of the
unsigned S2 id) because Spark and Parquet have no unsigned 64-bit type;
faces 4 and 5 therefore appear negative.  Ordering comparisons must use
the unsigned view; equality/grouping (our use) is unaffected.
"""

from __future__ import annotations

import numpy as np

# Hilbert traversal tables as published in s2geometry's s2coords.cc
# (kPosToIJ / kPosToOrientation with kSwapMask=1, kInvertMask=2).
_SWAP = 1
_INVERT = 2
POS_TO_IJ = np.array(
    [[0, 1, 3, 2], [0, 2, 3, 1], [3, 2, 0, 1], [3, 1, 0, 2]], dtype=np.uint64
)
# IJ_TO_POS[orientation] = inverse permutation of POS_TO_IJ[orientation]
IJ_TO_POS = np.zeros((4, 4), dtype=np.uint64)
for _o in range(4):
    for _pos in range(4):
        IJ_TO_POS[_o, POS_TO_IJ[_o, _pos]] = _pos
POS_TO_ORIENT = np.array([_SWAP, 0, 0, _SWAP | _INVERT], dtype=np.uint64)

_LIMIT_IJ = 1 << 30  # leaf resolution
MAX_LEVEL = 30


def _xyz(lon_deg: np.ndarray, lat_deg: np.ndarray):
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    cl = np.cos(lat)
    return cl * np.cos(lon), cl * np.sin(lon), np.sin(lat)


def _face_uv(x: np.ndarray, y: np.ndarray, z: np.ndarray):
    """Cube face + face-local (u, v) (s2coords.h XYZtoFaceUV).

    Face = axis of the largest |component| (ties resolved toward the
    later axis, exactly LargestAbsComponent's comparison chain), +3 when
    that component is negative.
    """
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax > ay, np.where(ax > az, 0, 2), np.where(ay > az, 1, 2))
    comp = np.choose(face, [x, y, z])
    face = face + np.where(comp < 0, 3, 0)
    with np.errstate(divide="ignore", invalid="ignore"):
        u = np.choose(face, [y / x, -x / y, -x / z, z / x, z / y, -y / z])
        v = np.choose(face, [z / x, z / y, -y / z, y / x, -x / y, -x / z])
    return face.astype(np.int64), u, v


def _uv_to_st(u: np.ndarray) -> np.ndarray:
    """Quadratic projection (s2coords.h UVtoST): equal-area-ish, the
    default S2 projection."""
    with np.errstate(invalid="ignore"):  # unselected where-branch NaNs
        return np.where(
            u >= 0.0, 0.5 * np.sqrt(1.0 + 3.0 * u), 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u)
        )


def _st_to_ij(s: np.ndarray) -> np.ndarray:
    return np.clip(
        np.floor(s * float(_LIMIT_IJ)).astype(np.int64), 0, _LIMIT_IJ - 1
    ).astype(np.uint64)


def s2_cell_np(
    lon_deg: np.ndarray, lat_deg: np.ndarray, level: int = MAX_LEVEL
) -> np.ndarray:
    """Vectorized S2 cell id at ``level`` for lon/lat degrees -> int64.

    The Hilbert position at ``level`` consumes only the top ``level``
    bits of (i, j) (orientation flows coarse -> fine), so the recursion
    runs ``level`` steps; ids are prefix-consistent across levels
    (``s2_parent(s2_cell(p, 30), l) == s2_cell(p, l)``).
    """
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be in [0, {MAX_LEVEL}]")
    x, y, z = _xyz(lon_deg, lat_deg)
    face, u, v = _face_uv(x, y, z)
    i = _st_to_ij(_uv_to_st(u))
    j = _st_to_ij(_uv_to_st(v))
    return _encode_face_ij(face, i, j, level)


def _encode_face_ij(face: np.ndarray, i: np.ndarray, j: np.ndarray, level: int) -> np.ndarray:
    """Forward Hilbert walk: in-range leaf (face, i, j) -> cell id at
    ``level`` (the single shared encode loop — s2_cell_np and the
    neighbor wrap both delegate here)."""
    face_u = np.asarray(face).astype(np.uint64)
    i = np.asarray(i).astype(np.uint64)
    j = np.asarray(j).astype(np.uint64)
    orient = face_u & np.uint64(_SWAP)
    pos = np.zeros(face_u.shape, dtype=np.uint64)
    for k in range(MAX_LEVEL - 1, MAX_LEVEL - 1 - level, -1):
        ku = np.uint64(k)
        ij = (((i >> ku) & np.uint64(1)) << np.uint64(1)) | ((j >> ku) & np.uint64(1))
        p = IJ_TO_POS[orient, ij]
        pos = (pos << np.uint64(2)) | p
        orient = orient ^ POS_TO_ORIENT[p]
    shift = np.uint64(2 * (MAX_LEVEL - level) + 1)
    lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
    return ((face_u << np.uint64(61)) | (pos << shift) | lsb).view(np.int64)


def s2_level_np(cell: np.ndarray) -> np.ndarray:
    """Level from the position of the lowest set bit (the center bit)."""
    c = np.asarray(cell).view(np.uint64)
    lsb = c & (~c + np.uint64(1))
    # level = 30 - (log2(lsb) / 2)
    exp = np.zeros(c.shape, dtype=np.int64)
    v = lsb.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        big = v >= (np.uint64(1) << np.uint64(shift))
        exp += np.where(big, shift, 0)
        v = np.where(big, v >> np.uint64(shift), v)
    return MAX_LEVEL - exp // 2


def s2_parent_np(cell: np.ndarray, level: int) -> np.ndarray:
    """Ancestor at ``level``: truncate the position and set the new
    center bit — pure bit arithmetic, the hierarchy rollup primitive."""
    c = np.asarray(cell).view(np.uint64)
    lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
    return ((c & ~(np.uint64(2) * lsb - np.uint64(1))) | lsb).view(np.int64)


def s2_cell_center_np(cell: np.ndarray):
    """Decode a cell id to its center (lon_deg, lat_deg) — inverse walk
    via _cell_face_ij, ST center, inverse quadratic, face frame; used by
    the round-trip tests."""
    face, i, j, level = _cell_face_ij(cell)
    # center of the cell in ST: midpoint of the level-truncated ij range
    half = (np.float64(2.0) ** (MAX_LEVEL - level.astype(np.float64))) * 0.5
    si = (i.astype(np.float64) + half) / float(_LIMIT_IJ)
    tj = (j.astype(np.float64) + half) / float(_LIMIT_IJ)
    u = _st_to_uv(si)
    v = _st_to_uv(tj)
    x, y, z = _face_uv_to_xyz(face, u, v)
    lon = np.degrees(np.arctan2(y, x))
    lat = np.degrees(np.arctan2(z, np.sqrt(x * x + y * y)))
    return lon, lat


def _st_to_uv(s: np.ndarray) -> np.ndarray:
    return np.where(
        s >= 0.5,
        (1.0 / 3.0) * (4.0 * s * s - 1.0),
        (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s)),
    )


def _face_uv_to_xyz(face: np.ndarray, u: np.ndarray, v: np.ndarray):
    one = np.ones_like(u)
    x = np.choose(face, [one, -u, -u, -one, v, v])
    y = np.choose(face, [u, one, -v, -v, -one, u])
    z = np.choose(face, [v, v, one, -u, -u, -one])
    return x, y, z


# --------------------------------------------------------------------------
# Independent scalar reference (differential-test twin; no numpy)
# --------------------------------------------------------------------------

def s2_cell_slow(lon_deg: float, lat_deg: float, level: int = MAX_LEVEL) -> int:
    """Straight-line scalar transcription of the published recursion —
    deliberately written without the vectorized code's helpers so the
    two implementations can check each other."""
    import math

    lon = math.radians(lon_deg)
    lat = math.radians(lat_deg)
    x = math.cos(lat) * math.cos(lon)
    y = math.cos(lat) * math.sin(lon)
    z = math.sin(lat)
    ax, ay, az = abs(x), abs(y), abs(z)
    if ax > ay:
        face0 = 0 if ax > az else 2
    else:
        face0 = 1 if ay > az else 2
    comp = (x, y, z)[face0]
    face = face0 + (3 if comp < 0 else 0)
    if face == 0:
        u, v = y / x, z / x
    elif face == 1:
        u, v = -x / y, z / y
    elif face == 2:
        u, v = -x / z, -y / z
    elif face == 3:
        u, v = z / x, y / x
    elif face == 4:
        u, v = z / y, -x / y
    else:
        u, v = -y / z, -x / z

    def st(w: float) -> float:
        return 0.5 * math.sqrt(1.0 + 3.0 * w) if w >= 0 else 1.0 - 0.5 * math.sqrt(1.0 - 3.0 * w)

    def ij(s: float) -> int:
        return max(0, min(_LIMIT_IJ - 1, math.floor(s * _LIMIT_IJ)))

    i, j = ij(st(u)), ij(st(v))
    ij_to_pos = [[0, 1, 3, 2], [0, 3, 1, 2], [2, 3, 1, 0], [2, 1, 3, 0]]
    pos_to_orient = [1, 0, 0, 3]
    orient = face & 1
    pos = 0
    for k in range(MAX_LEVEL - 1, MAX_LEVEL - 1 - level, -1):
        bits = (((i >> k) & 1) << 1) | ((j >> k) & 1)
        p = ij_to_pos[orient][bits]
        pos = (pos << 2) | p
        orient ^= pos_to_orient[p]
    cell = (face << 61) | (pos << (2 * (MAX_LEVEL - level) + 1)) | (1 << (2 * (MAX_LEVEL - level)))
    return cell - (1 << 64) if cell >= (1 << 63) else cell


# --------------------------------------------------------------------------
# DuckDB oracle builder
# --------------------------------------------------------------------------

def s2_base_sql(lon_expr: str, lat_expr: str) -> str:
    """SQL computing (face, i, j) for a row — the trig/face/quadratic-ST
    stage of the S2 transform, mirroring s2_cell_np's op order exactly so
    IEEE doubles agree between DuckDB and numpy."""
    return f"""
      SELECT *,
        face0 + CASE WHEN (CASE face0 WHEN 0 THEN x WHEN 1 THEN y ELSE z END) < 0
                     THEN 3 ELSE 0 END AS face
      FROM (
        SELECT *,
          CASE WHEN abs(x) > abs(y)
               THEN (CASE WHEN abs(x) > abs(z) THEN 0 ELSE 2 END)
               ELSE (CASE WHEN abs(y) > abs(z) THEN 1 ELSE 2 END) END AS face0
        FROM (
          SELECT *,
            cos(radians({lat_expr})) * cos(radians({lon_expr})) AS x,
            cos(radians({lat_expr})) * sin(radians({lon_expr})) AS y,
            sin(radians({lat_expr})) AS z
          FROM __s2_in
        )
      )
    """


_S2_UV = """
  SELECT *,
    CASE face WHEN 0 THEN y/x WHEN 1 THEN -x/y WHEN 2 THEN -x/z
              WHEN 3 THEN z/x WHEN 4 THEN z/y ELSE -y/z END AS u,
    CASE face WHEN 0 THEN z/x WHEN 1 THEN z/y WHEN 2 THEN -y/z
              WHEN 3 THEN y/x WHEN 4 THEN -x/y ELSE -x/z END AS v
  FROM __s2_face
"""


def _st_ij_sql(w: str) -> str:
    s = (
        f"CASE WHEN {w} >= 0 THEN 0.5 * sqrt(1.0 + 3.0 * {w}) "
        f"ELSE 1.0 - 0.5 * sqrt(1.0 - 3.0 * {w}) END"
    )
    return (
        f"GREATEST(0, LEAST({_LIMIT_IJ - 1}, "
        f"CAST(floor(({s}) * {float(_LIMIT_IJ)!r}) AS BIGINT)))"
    )


def s2_cell_sql(
    source_sql: str, key_cols: str, lon_expr: str, lat_expr: str, level: int
) -> str:
    """Full DuckDB replay of s2_cell_np at ``level``: face/uv/st/ij as
    closed-form SQL, then the Hilbert recursion as a recursive CTE
    (one 2-bit step per level, the published IJ->pos tables as CASE
    rows).  Returns a complete ``WITH RECURSIVE``-headed statement body
    fragment — embed after the standard oracle CTEs via
    ``registry._o_recursive``.  Output: ``{key_cols}, cell_id BIGINT``.
    """
    stop_k = MAX_LEVEL - level  # iterate k = 29 .. stop_k
    ij_to_pos_case = """
      CASE orient
        WHEN 0 THEN (CASE ijb WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 2 THEN 3 ELSE 2 END)
        WHEN 1 THEN (CASE ijb WHEN 0 THEN 0 WHEN 1 THEN 3 WHEN 2 THEN 1 ELSE 2 END)
        WHEN 2 THEN (CASE ijb WHEN 0 THEN 2 WHEN 1 THEN 3 WHEN 2 THEN 1 ELSE 0 END)
        ELSE        (CASE ijb WHEN 0 THEN 2 WHEN 1 THEN 1 WHEN 2 THEN 3 ELSE 0 END)
      END
    """
    return f"""
__s2_in AS ({source_sql}),
__s2_face AS ({s2_base_sql(lon_expr, lat_expr)}),
__s2_uv AS ({_S2_UV}),
__s2_ij AS (
  SELECT {key_cols}, face,
         {_st_ij_sql('u')} AS i,
         {_st_ij_sql('v')} AS j
  FROM __s2_uv
),
__s2_h AS (
  SELECT {key_cols}, face, i, j, 29 AS k,
         face % 2 AS orient, CAST(0 AS UBIGINT) AS pos
  FROM __s2_ij
  UNION ALL
  SELECT {key_cols}, face, i, j, k - 1,
         xor(orient, CASE p WHEN 0 THEN 1 WHEN 3 THEN 3 ELSE 0 END),
         pos * 4 + p
  FROM (
    SELECT *, {ij_to_pos_case} AS p
    FROM (
      SELECT *, ((i // (1::BIGINT << k)) % 2) * 2 + ((j // (1::BIGINT << k)) % 2) AS ijb
      FROM __s2_h WHERE k >= {stop_k}
    )
  )
),
__s2_out AS (
  -- id assembly in HUGEINT: face << 61 overflows DuckDB's checked
  -- UBIGINT shift for faces 4/5 (western hemisphere / south pole), so
  -- every term is a HUGEINT multiply; positions never collide with the
  -- face/center terms, so + == | here
  SELECT {key_cols},
         CAST(
           CAST(face AS HUGEINT) * 2305843009213693952
           + CAST(pos AS HUGEINT) * {1 << (2 * (MAX_LEVEL - level) + 1)}
           + {1 << (2 * (MAX_LEVEL - level))}
           - CASE WHEN face >= 4 THEN CAST(18446744073709551616 AS HUGEINT)
                  ELSE 0 END
         AS BIGINT) AS cell_id
  FROM __s2_h WHERE k = {stop_k - 1}
)
"""


# --------------------------------------------------------------------------
# Neighbors (cross-face wrap) — s2cell_id.cc AppendAllNeighbors semantics
# --------------------------------------------------------------------------

#: Published kMinWidth metric constant for the quadratic projection
#: (s2metrics.h): minimum ground width of a level-L cell is
#: (2*sqrt(2)/3) / 2^L radians — the completeness bound for
#: neighborhood joins (verified empirically in tests).
K_MIN_WIDTH_RAD = 2.0 * float(np.sqrt(2.0)) / 3.0


def _cell_face_ij(cell: np.ndarray):
    """Decode (face, leaf i, leaf j, level) — i/j of the cell's MIN
    corner in leaf coordinates (the inverse Hilbert walk)."""
    c = np.asarray(cell).view(np.uint64)
    level = s2_level_np(c.view(np.int64))
    face = (c >> np.uint64(61)).astype(np.int64)
    orient = (face.astype(np.uint64)) & np.uint64(_SWAP)
    i = np.zeros(c.shape, dtype=np.uint64)
    j = np.zeros(c.shape, dtype=np.uint64)
    maxlev = int(level.max()) if level.size else 0
    for step in range(maxlev):
        k = MAX_LEVEL - 1 - step
        active = step < level
        shift = np.where(active, 2 * (MAX_LEVEL - level) + 1 + 2 * (level - 1 - step), 0)
        p = (c >> shift.astype(np.uint64)) & np.uint64(3)
        ij = POS_TO_IJ[orient, p]
        ku = np.uint64(k)
        i = np.where(active, i | ((ij >> np.uint64(1)) << ku), i)
        j = np.where(active, j | ((ij & np.uint64(1)) << ku), j)
        orient = np.where(active, orient ^ POS_TO_ORIENT[p], orient)
    return face, i.astype(np.int64), j.astype(np.int64), level


def _wrap_encode(face: np.ndarray, i: np.ndarray, j: np.ndarray, level: int) -> np.ndarray:
    """Encode possibly-out-of-range leaf (face, i, j) points at ``level``:
    convert st -> uv (the quadratic _st_to_uv is piecewise-unclamped, so
    out-of-face st maps to |uv| > 1 — the FromFaceIJWrap device) -> XYZ
    -> (new face, uv), then the shared forward-Hilbert encode — landing
    inside the adjacent cell across the face edge (cell edges align
    across faces at every level)."""
    s = (i.astype(np.float64) + 0.5) / float(_LIMIT_IJ)
    t = (j.astype(np.float64) + 0.5) / float(_LIMIT_IJ)
    u = _st_to_uv(s)
    v = _st_to_uv(t)
    x, y, z = _face_uv_to_xyz(face, u, v)
    nface, nu, nv = _face_uv(x, y, z)
    ni = _st_to_ij(_uv_to_st(nu))
    nj = _st_to_ij(_uv_to_st(nv))
    return _encode_face_ij(nface, ni, nj, level)


def s2_all_neighbors_np(cell: np.ndarray, level: int) -> np.ndarray:
    """The 8 surrounding cells (edge + corner, cross-face wrapped) of
    each input cell at ``level`` — shape (n, 8); duplicates possible at
    the 8 cube corners (7-neighbor cells), callers dedupe."""
    face, i, j, lv = _cell_face_ij(cell)
    if not (lv == level).all():
        raise ValueError("cells must be at the requested level")
    size = np.int64(1 << (MAX_LEVEL - level))
    half = size // 2 if level < MAX_LEVEL else np.int64(0)
    ic = i + half  # center leaf coords
    jc = j + half
    out = np.empty((np.asarray(cell).shape[0], 8), dtype=np.int64)
    idx = 0
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            if di == 0 and dj == 0:
                continue
            out[:, idx] = _wrap_encode(face, ic + di * size, jc + dj * size, level)
            idx += 1
    return out
