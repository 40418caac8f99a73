"""Topological predicates (JTS `relate` semantics) for the pair-feature
extractor — crosses / touches / intersects / within / contains.

Reference: BooleanVector.geometriesCross/Touch/Intersect/AWithinB/...
(/root/reference/fagi-gis/src/main/java/gr/athenainnovation/imis/fusion/gis/learning/vectors/BooleanVector.java:476-530)
computes these with JTS on the pair's two geometries. This module gives
the same answers for the simple 2D geometry menagerie the engine handles
(POINT, MULTIPOINT, LINESTRING, MULTILINESTRING, POLYGON, MULTIPOLYGON)
without a JTS/GEOS dependency.

Method: a coarse DE-9IM — for each pair we derive three facts,
  * ANY:  A ∩ B ≠ ∅                       (any intersection at all)
  * II:   dim(interior(A) ∩ interior(B))  (-1 = empty, else 0/1/2)
  * AinB / BinA: X ⊆ closure(Y)           (no part of X in Y's exterior)
then express the predicates exactly as JTS defines them:
  intersects = ANY
  touches    = ANY and II == -1
  within     = II >= 0 and AinB
  contains   = within flipped
  crosses    = II >= 0 and (dim-specific: see _crosses)

Closure-containment and line/area interior tests classify geometry
vertices plus every segment midpoint (and ring centroids for area/area).
That sampling is EXACT for geometries whose boundaries are straight
segments and whose overlap regions are bounded by those samples — which
covers the convex lattice fixtures used in tests and the reference's POI
world; a fully general implementation would need a snap-rounded line
arrangement, which the feature extractor does not warrant.
"""

from __future__ import annotations

import numpy as np

from fagi_gis_spark.geometry.wkt import Geom

_EPS = 1e-12


# ------------------------------------------------------------- primitives
def _orient(ax, ay, bx, by, cx, cy) -> float:
    return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)


def _on_segment(px, py, ax, ay, bx, by) -> bool:
    """Point collinear with AND between segment endpoints (inclusive)."""
    if abs(_orient(ax, ay, bx, by, px, py)) > _EPS:
        return False
    return (
        min(ax, bx) - _EPS <= px <= max(ax, bx) + _EPS
        and min(ay, by) - _EPS <= py <= max(ay, by) + _EPS
    )


def _seg_seg(a1, a2, b1, b2) -> str:
    """Classify segment intersection: 'none' | 'proper' (interiors cross
    at one point) | 'touch' (meet only at an endpoint) | 'overlap'
    (collinear with positive-length shared part)."""
    o1 = _orient(*a1, *a2, *b1)
    o2 = _orient(*a1, *a2, *b2)
    o3 = _orient(*b1, *b2, *a1)
    o4 = _orient(*b1, *b2, *a2)
    if abs(o1) <= _EPS and abs(o2) <= _EPS:  # collinear
        # project onto the dominant axis of A
        if abs(a2[0] - a1[0]) >= abs(a2[1] - a1[1]):
            axis = 0
        else:
            axis = 1
        amin, amax = sorted((a1[axis], a2[axis]))
        bmin, bmax = sorted((b1[axis], b2[axis]))
        lo, hi = max(amin, bmin), min(amax, bmax)
        if hi - lo > _EPS:
            return "overlap"
        if hi - lo >= -_EPS:
            return "touch"
        return "none"
    if (o1 * o2 < -_EPS * _EPS) and (o3 * o4 < -_EPS * _EPS):
        return "proper"
    # at least one orientation is ~0: endpoint on the other segment?
    for p, (s1, s2) in ((b1, (a1, a2)), (b2, (a1, a2)), (a1, (b1, b2)), (a2, (b1, b2))):
        if _on_segment(p[0], p[1], s1[0], s1[1], s2[0], s2[1]):
            return "touch"
    return "none"


def _pt_in_rings(px, py, rings) -> str:
    """'interior' / 'boundary' / 'exterior' of a polygon (ring list,
    exterior ring first, holes after — even-odd rule)."""
    for ring in rings:
        for i in range(len(ring) - 1):
            if _on_segment(px, py, ring[i][0], ring[i][1], ring[i + 1][0], ring[i + 1][1]):
                return "boundary"
    inside = False
    for ring in rings:
        for i in range(len(ring) - 1):
            x1, y1 = ring[i]
            x2, y2 = ring[i + 1]
            if (y1 > py) != (y2 > py):
                xint = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
                if px < xint:
                    inside = not inside
    return "interior" if inside else "exterior"


# ---------------------------------------------------- geometry decomposition
def _decompose(g: Geom):
    """(dim, points(list[(x,y)]), segments(list[(p,q)]), poly_list
    (list[ring-list]), line_boundary_pts) — the pieces the relate
    machinery consumes."""
    t = g.gtype
    if t == "POINT":
        p = [(float(g.data[0][0]), float(g.data[0][1]))]
        return 0, p, [], [], []
    if t == "MULTIPOINT":
        return 0, [(float(x), float(y)) for x, y in np.asarray(g.data)], [], [], []
    if t == "LINESTRING":
        c = np.asarray(g.data)
        pts = [(float(x), float(y)) for x, y in c]
        segs = [(pts[i], pts[i + 1]) for i in range(len(pts) - 1)]
        return 1, pts, segs, [], [pts[0], pts[-1]]
    if t == "MULTILINESTRING":
        pts, segs, bnd = [], [], []
        for part in g.data:
            c = [(float(x), float(y)) for x, y in np.asarray(part)]
            pts += c
            segs += [(c[i], c[i + 1]) for i in range(len(c) - 1)]
            bnd += [c[0], c[-1]]
        return 1, pts, segs, [], bnd
    if t == "POLYGON":
        rings = [np.asarray(r, dtype=float) for r in g.data]
        pts, segs = [], []
        for r in rings:
            c = [(float(x), float(y)) for x, y in r]
            pts += c[:-1]
            segs += [(c[i], c[i + 1]) for i in range(len(c) - 1)]
        return 2, pts, segs, [rings], []
    if t == "MULTIPOLYGON":
        pts, segs, polys = [], [], []
        for poly in g.data:
            rings = [np.asarray(r, dtype=float) for r in poly]
            for r in rings:
                c = [(float(x), float(y)) for x, y in r]
                pts += c[:-1]
                segs += [(c[i], c[i + 1]) for i in range(len(c) - 1)]
            polys.append(rings)
        return 2, pts, segs, polys, []
    raise ValueError(f"relate unsupported for {t}")


def _locate(px, py, dim, pts, segs, polys, bnd) -> str:
    """Locate a point against a decomposed geometry:
    interior/boundary/exterior per JTS conventions (a line's interior is
    the line minus its endpoints; a point set's interior is the points)."""
    if dim == 2:
        best = "exterior"
        for rings in polys:
            loc = _pt_in_rings(px, py, rings)
            if loc == "interior":
                return "interior"
            if loc == "boundary":
                best = "boundary"
        return best
    if dim == 1:
        on = any(_on_segment(px, py, s[0][0], s[0][1], s[1][0], s[1][1]) for s in segs)
        if not on:
            return "exterior"
        if any(abs(px - q[0]) <= _EPS and abs(py - q[1]) <= _EPS for q in bnd):
            return "boundary"
        return "interior"
    # dim 0
    if any(abs(px - q[0]) <= _EPS and abs(py - q[1]) <= _EPS for q in pts):
        return "interior"
    return "exterior"


def _samples(dim, pts, segs, polys):
    """Sample points that witness a geometry's extent: vertices + segment
    midpoints (+ ring means for polygons). Each tagged with its location
    ON ITS OWN geometry (interior/boundary)."""
    out = []
    if dim == 0:
        return [(p, "interior") for p in pts]
    if dim == 1:
        return None  # caller tags against its own boundary list
    # dim 2: vertices & midpoints lie on the boundary; ring mean is interior
    for p in pts:
        out.append((p, "boundary"))
    for s in segs:
        out.append((((s[0][0] + s[1][0]) / 2.0, (s[0][1] + s[1][1]) / 2.0), "boundary"))
    for rings in polys:
        ext = rings[0]
        m = ext[:-1].mean(axis=0)
        out.append(((float(m[0]), float(m[1])), "interior"))
    return out


def _relate(ga: Geom, gb: Geom):
    """(any_intersection, ii_dim, a_in_closure_b, b_in_closure_a)."""
    da, pa, sa, qa, ba = _decompose(ga)
    db, pb, sb, qb, bb = _decompose(gb)

    any_hit = False
    ii = -1  # dim of interior∩interior

    def _upd_ii(d):
        nonlocal ii
        ii = max(ii, d)

    # --- sample-point cross classification -------------------------------
    def _tagged_samples(dim, pts, segs, polys, bnd):
        if dim == 1:
            out = []
            for p in pts:
                tag = "boundary" if any(
                    abs(p[0] - q[0]) <= _EPS and abs(p[1] - q[1]) <= _EPS for q in bnd
                ) else "interior"
                out.append((p, tag))
            for s in segs:
                out.append((((s[0][0] + s[1][0]) / 2.0, (s[0][1] + s[1][1]) / 2.0), "interior"))
            return out
        return _samples(dim, pts, segs, polys)

    samp_a = _tagged_samples(da, pa, sa, qa, ba)
    samp_b = _tagged_samples(db, pb, sb, qb, bb)

    a_in_b = True
    for (px, py), tag in samp_a:
        loc = _locate(px, py, db, pb, sb, qb, bb)
        if loc != "exterior":
            any_hit = True
        else:
            a_in_b = False
        if tag == "interior" and loc == "interior":
            # a point witness proves dim >= 0; for line/line only a
            # collinear overlap (handled below) raises II to dim 1
            _upd_ii(0 if da == db == 1 else (min(da, db) if (da and db) else 0))
    b_in_a = True
    for (px, py), tag in samp_b:
        loc = _locate(px, py, da, pa, sa, qa, ba)
        if loc != "exterior":
            any_hit = True
        else:
            b_in_a = False
        if tag == "interior" and loc == "interior":
            # a point witness proves dim >= 0; for line/line only a
            # collinear overlap (handled below) raises II to dim 1
            _upd_ii(0 if da == db == 1 else (min(da, db) if (da and db) else 0))

    # --- segment arrangement ---------------------------------------------
    if sa and sb:
        for s1 in sa:
            for s2 in sb:
                cls = _seg_seg(s1[0], s1[1], s2[0], s2[1])
                if cls == "none":
                    continue
                any_hit = True
                if cls == "proper":
                    # a proper boundary crossing puts part of each geometry
                    # in the other's interior AND part in its exterior;
                    # two lines crossing meet at a point (dim 0)
                    _upd_ii(0 if (da == 1 and db == 1) else min(da, db))
                    a_in_b = False
                    b_in_a = False
                elif cls == "overlap" and da == 1 and db == 1:
                    _upd_ii(1)  # shared positive-length piece of line
                # polygon-boundary overlap/touch alone never joins interiors
    # area/area interior overlap (witnessed by samples or crossings) has dim 2
    if da == 2 and db == 2 and ii >= 0:
        ii = 2

    return any_hit, ii, a_in_b, b_in_a


# -------------------------------------------------------------- predicates
def intersects(ga: Geom, gb: Geom) -> bool:
    return _relate(ga, gb)[0]


def touches(ga: Geom, gb: Geom) -> bool:
    any_hit, ii, _, _ = _relate(ga, gb)
    return any_hit and ii < 0


def within(ga: Geom, gb: Geom) -> bool:
    _, ii, a_in_b, _ = _relate(ga, gb)
    return ii >= 0 and a_in_b


def contains(ga: Geom, gb: Geom) -> bool:
    return within(gb, ga)


def crosses(ga: Geom, gb: Geom) -> bool:
    da = _decompose(ga)[0]
    db = _decompose(gb)[0]
    any_hit, ii, a_in_b, b_in_a = _relate(ga, gb)
    if ii < 0:
        return False
    if da == db == 1:
        return ii == 0  # lines cross at points, not along a shared piece
    if da == db:
        return False  # equal-dim non-line pairs never cross (JTS)
    # mixed dims: interiors meet AND the lower-dim geometry sticks out
    if da < db:
        return not a_in_b
    return not b_in_a


def relate_flags(ga: Geom, gb: Geom) -> tuple[bool, bool, bool, bool, bool, bool, bool]:
    """(crosses, touches, intersects, a_within_b, b_within_a,
    a_contains_b, b_contains_a) — one _relate pass, the BooleanVector
    topology bit order (BooleanVector.java:476-530)."""
    da = _decompose(ga)[0]
    db = _decompose(gb)[0]
    any_hit, ii, a_in_b, b_in_a = _relate(ga, gb)
    w_ab = ii >= 0 and a_in_b
    w_ba = ii >= 0 and b_in_a
    if ii < 0:
        crs = False
    elif da == db == 1:
        crs = ii == 0
    elif da == db:
        crs = False
    elif da < db:
        crs = not a_in_b
    else:
        crs = not b_in_a
    return (crs, any_hit and ii < 0, any_hit, w_ab, w_ba, w_ba, w_ab)
