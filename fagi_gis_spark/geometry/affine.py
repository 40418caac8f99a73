"""Affine geometry transforms: translate / scale / rotate (about centroid).

Mirror of the reference's PostGIS calls ``ST_Translate``, ``ST_Scale`` and
the custom SQL UDFs ``GeomResize`` / ``GeomRotate`` (scale / rotate about
the geometry centroid, /root/reference/fagi-gis/src/main/resources/schema.sql:97-104)
used by the Shift* transformations
(geotransformations/ShiftAToB.java:190-232).
"""

from __future__ import annotations

import math

import numpy as np

from fagi_gis_spark.geometry.wkt import Geom, map_coords
from fagi_gis_spark.geometry.measures import centroid


def translate(g: Geom, dx: float, dy: float) -> Geom:
    return map_coords(g, lambda c: c + np.array([dx, dy]))


def scale_about(g: Geom, fx: float, fy: float, origin: tuple[float, float] | None = None) -> Geom:
    """Scale about ``origin`` (default: centroid — GeomResize semantics)."""
    if origin is None:
        origin = centroid(g)
    ox, oy = origin

    def fn(c: np.ndarray) -> np.ndarray:
        out = c.copy()
        out[:, 0] = ox + (c[:, 0] - ox) * fx
        out[:, 1] = oy + (c[:, 1] - oy) * fy
        return out

    return map_coords(g, fn)


def rotate_about(g: Geom, angle_rad: float, origin: tuple[float, float] | None = None) -> Geom:
    """Rotate CCW by ``angle_rad`` about ``origin`` (default: centroid —
    GeomRotate semantics; the reference passes degrees converted via
    ``radians()``, schema.sql:103)."""
    if origin is None:
        origin = centroid(g)
    ox, oy = origin
    ca, sa = math.cos(angle_rad), math.sin(angle_rad)

    def fn(c: np.ndarray) -> np.ndarray:
        x = c[:, 0] - ox
        y = c[:, 1] - oy
        return np.column_stack((ox + x * ca - y * sa, oy + x * sa + y * ca))

    return map_coords(g, fn)
