"""Polygon overlay: intersection-area join between two polygon layers.

The classic vector-overlay conflation measure — "how much do the linked
footprints actually overlap" — which the reference approximates with
point distance only (FindLinkServlet radius probes); PostGIS users do
``ST_Area(ST_Intersection(a, b))``.  Spark-first shape:

  1. candidates from the SAME cell-bucketed ``radius_join`` every other
     spatial query uses (ring-1 expansion, shared hot-cell salting) —
     two overlapping footprints' centers are always within
     ``radius_m`` once the layers' max half-extent is bounded, so the
     cell join is a complete blocker;
  2. one Arrow batch pass clips each candidate pair
     (Sutherland–Hodgman, subject ring against a CONVEX clip ring) and
     emits the intersection area on the integer micro-degree lattice.

Area parity contract: clipped vertices are quantized half-up
(``floor(v * 1e6 + 0.5)``) to int64 micro-degrees BEFORE the shoelace
sum, and the emitted value is the TWICE-area (the raw integer shoelace
absolute sum) — exact integer arithmetic end-to-end, so DuckDB can
replay axis-aligned fixtures closed-form (``2 * overlap_w * overlap_h``)
with no float tolerance.  Axis-aligned clip edges assign the clipped
coordinate directly from the edge constant (not via the interpolation
formula), so rect∩rect corners are bit-exact min/max of the inputs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

__all__ = [
    "convex_clip",
    "quantized_twice_area",
    "overlay_intersection_join",
    "overlay_zones_join",
]


def _ccw(ring: np.ndarray) -> np.ndarray:
    """Ensure counter-clockwise orientation (positive shoelace)."""
    x, y = ring[:, 0], ring[:, 1]
    if np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y) < 0:
        return ring[::-1]
    return ring


def convex_clip(subject: np.ndarray, clip: np.ndarray) -> np.ndarray:
    """Sutherland–Hodgman: clip ``subject`` (any simple ring, (n,2),
    open — no repeated last vertex) by ``clip`` (must be CONVEX).
    Returns the intersection ring (possibly empty).  Points exactly on
    a clip edge count as inside, so touching-only results come back as
    degenerate (zero-area) rings — filter on area, not emptiness.

    Axis-aligned clip edges write the edge constant straight into the
    intersection vertex (a vertical edge x=c yields ix == c exactly;
    the general interpolation form ``x1 + t*(x2-x1)`` lands 1 ulp off),
    which is what makes the quantized-lattice parity contract exact."""
    out = _ccw(np.asarray(subject, dtype=np.float64))
    cp = _ccw(np.asarray(clip, dtype=np.float64))
    m = len(cp)
    for i in range(m):
        if len(out) == 0:
            break
        x1, y1 = cp[i]
        x2, y2 = cp[(i + 1) % m]
        ex, ey = x2 - x1, y2 - y1
        prev = out[-1]
        side_prev = ex * (prev[1] - y1) - ey * (prev[0] - x1)
        nxt: list[np.ndarray] = []
        for cur in out:
            side_cur = ex * (cur[1] - y1) - ey * (cur[0] - x1)
            if (side_cur >= 0) != (side_prev >= 0):  # edge crossing
                if ex == 0.0:  # vertical clip edge: x is exactly x1
                    t = (x1 - prev[0]) / (cur[0] - prev[0])
                    nxt.append(np.array([x1, prev[1] + t * (cur[1] - prev[1])]))
                elif ey == 0.0:  # horizontal clip edge: y is exactly y1
                    t = (y1 - prev[1]) / (cur[1] - prev[1])
                    nxt.append(np.array([prev[0] + t * (cur[0] - prev[0]), y1]))
                else:
                    dx, dy = cur[0] - prev[0], cur[1] - prev[1]
                    t = (ey * (prev[0] - x1) - ex * (prev[1] - y1)) / (ex * dy - ey * dx)
                    nxt.append(prev + t * np.array([dx, dy]))
            if side_cur >= 0:
                nxt.append(cur)
            prev, side_prev = cur, side_cur
        out = np.array(nxt) if nxt else np.empty((0, 2))
    return out


def quantized_twice_area(ring: np.ndarray, scale: float = 1e6) -> int:
    """|integer shoelace| of the ring quantized half-up to the
    ``1/scale`` lattice: exactly ``2 * area`` in lattice-unit² when the
    vertices sit on the lattice (1 ulp of float noise away), and the
    value both engines can agree on bit-for-bit."""
    if len(ring) < 3:
        return 0
    q = np.floor(np.asarray(ring, dtype=np.float64) * scale + 0.5).astype(np.int64)
    x, y = q[:, 0], q[:, 1]
    return int(abs(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)))


def overlay_intersection_join(
    poly_a: DataFrame,
    poly_b: DataFrame,
    radius_m: float = 150.0,
    hot_cells: "DataFrame | None | str" = "detect",
) -> DataFrame:
    """(node_a, node_b, area2_udeg2): every pair of polygons whose
    centers are within ``radius_m`` AND whose footprints overlap with
    positive area, with the intersection TWICE-area in micro-degree²
    (integer).  Inputs need (subject, lon, lat, geom_wkt); rows whose
    WKT is not a POLYGON are ignored.  The b-side ring is the clip side
    and must be convex (Sutherland–Hodgman's contract) — non-convex
    clip rings raise, they do not silently mis-clip.

    Scale shape: one cell-bucketed radius join (all the salting /
    ring-1 machinery shared with every other J5 query) + one Arrow
    batch map over the candidate pairs; per-pair work is O(vertices),
    nothing collects."""
    from fagi_gis_spark.operators.spatial_join import radius_join

    a = poly_a.filter(F.col("geom_wkt").startswith("POLYGON"))
    b = poly_b.filter(F.col("geom_wkt").startswith("POLYGON"))
    pairs = radius_join(a, b, radius_m, hot_cells=hot_cells).select("l_key", "r_key")
    withwkt = (
        pairs.join(
            a.select(F.col("subject").alias("l_key"), F.col("geom_wkt").alias("wkt_a")),
            "l_key",
        )
        .join(
            b.select(F.col("subject").alias("r_key"), F.col("geom_wkt").alias("wkt_b")),
            "r_key",
        )
    )

    def op(batches):
        from fagi_gis_spark.geometry.wkt import parse_wkt

        for pdf in batches:
            areas = np.zeros(len(pdf), dtype=np.int64)
            for i, (wa, wb) in enumerate(zip(pdf["wkt_a"], pdf["wkt_b"])):
                ga, gb = parse_wkt(wa), parse_wkt(wb)
                ra = ga.data[0][:-1]  # exterior ring, drop closing vertex
                rb = gb.data[0][:-1]
                _assert_convex(rb)
                areas[i] = quantized_twice_area(convex_clip(ra, rb))
            out = pd.DataFrame(
                {"node_a": pdf["l_key"], "node_b": pdf["r_key"], "area2_udeg2": areas}
            )
            yield out[out["area2_udeg2"] > 0]

    return withwkt.mapInPandas(
        op, schema="node_a string, node_b string, area2_udeg2 long"
    )


def overlay_zones_join(
    footprints: DataFrame,
    zones_pdf: "pd.DataFrame",
    scale: float = 2e6,
) -> DataFrame:
    """(subject, polygon_id, area2): each POLYGON footprint against every
    zone of a small broadcast polygon dimension (``zones_pdf``:
    polygon_id, geom_wkt — the zonal_stats admin layer shape), keeping
    pairs with positive intersection area.  ``area2`` is the TWICE-area
    in lattice-unit² at ``scale`` (default: half-micro-degrees, where
    both the footprint corners and the deliberately half-unit-offset
    admin corners land exactly on integers — see the registry oracle).

    Scale shape: the zone dimension rides into every Arrow batch as
    numpy arrays (a few hundred rects + rings); footprints NEVER
    shuffle — candidates per row come from one vectorized bbox test,
    then only actual hits pay the Sutherland-Hodgman clip.  Zones must
    be convex (the S-H clip contract; enforced once, driver-side)."""
    from fagi_gis_spark.geometry.wkt import parse_wkt

    zids: list[str] = []
    zrings: list[np.ndarray] = []
    for pid, wkt in zip(zones_pdf["polygon_id"], zones_pdf["geom_wkt"]):
        g = parse_wkt(wkt)
        ring = np.asarray(g.data[0][:-1], dtype=np.float64)
        _assert_convex(ring)
        zids.append(str(pid))
        zrings.append(ring)
    zx1 = np.array([r[:, 0].min() for r in zrings])
    zx2 = np.array([r[:, 0].max() for r in zrings])
    zy1 = np.array([r[:, 1].min() for r in zrings])
    zy2 = np.array([r[:, 1].max() for r in zrings])

    def op(batches):
        for pdf in batches:
            subj: list[str] = []
            pids: list[str] = []
            areas: list[int] = []
            for s, w in zip(pdf["subject"], pdf["geom_wkt"]):
                if not str(w).startswith("POLYGON"):
                    continue
                ring = parse_wkt(w).data[0][:-1]
                fx1, fy1 = ring[:, 0].min(), ring[:, 1].min()
                fx2, fy2 = ring[:, 0].max(), ring[:, 1].max()
                hits = np.nonzero(
                    (fx1 < zx2) & (fx2 > zx1) & (fy1 < zy2) & (fy2 > zy1)
                )[0]
                for h in hits:
                    a2 = quantized_twice_area(convex_clip(ring, zrings[h]), scale)
                    if a2 > 0:
                        subj.append(s)
                        pids.append(zids[h])
                        areas.append(a2)
            yield pd.DataFrame(
                {
                    "subject": pd.Series(subj, dtype="object"),
                    "polygon_id": pd.Series(pids, dtype="object"),
                    "area2": pd.Series(areas, dtype="int64"),
                }
            )

    return footprints.select("subject", "geom_wkt").mapInPandas(
        op, schema="subject string, polygon_id string, area2 long"
    )


def _assert_convex(ring: np.ndarray) -> None:
    r = np.asarray(ring, dtype=np.float64)
    nxt = np.roll(r, -1, axis=0)
    nxt2 = np.roll(r, -2, axis=0)
    cross = (nxt[:, 0] - r[:, 0]) * (nxt2[:, 1] - nxt[:, 1]) - (
        nxt[:, 1] - r[:, 1]
    ) * (nxt2[:, 0] - nxt[:, 0])
    if np.any(cross > 0) and np.any(cross < 0):
        raise ValueError("clip ring must be convex for Sutherland-Hodgman")
