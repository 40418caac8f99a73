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


def rotate_metric(g: Geom, angle_rad: float, proj=None) -> Geom:
    """GeomRotate at full fidelity: rotate about the centroid IN THE
    PROJECTED METRIC FRAME (default EPSG 2249), then transform back —
    exactly ST_Transform(rotate(ST_Transform(g, 2249)), 4326)
    (schema.sql:103). Shape-preserving on the ground, unlike the
    degree-space rotation (anisotropic by ~cos(lat))."""
    if proj is None:
        from fagi_gis_spark.geometry.projection import EPSG_2249

        proj = EPSG_2249

    def fwd(c: np.ndarray) -> np.ndarray:
        x, y = proj.forward(c[:, 0], c[:, 1])
        return np.column_stack((x, y))

    def inv(c: np.ndarray) -> np.ndarray:
        lon, lat = proj.inverse(c[:, 0], c[:, 1])
        return np.column_stack((lon, lat))

    gp = map_coords(g, fwd)
    gp = rotate_about(gp, angle_rad)  # centroid of the PROJECTED geometry
    return map_coords(gp, inv)
