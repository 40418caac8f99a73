"""From-scratch planar geometry kernel (numpy; no shapely/JTS dependency).

Covers exactly the geometry surface the reference engine uses
(`SURVEY.md §1.2/§2.8`): the 7 WKT types POINT..GEOMETRYCOLLECTION,
centroid / npoints / distance / bbox measures, affine rotate/scale/
translate, and ray-casting point-in-polygon. Everything is designed to be
called from Arrow-batched pandas UDFs (batch in, batch out).
"""

from fagi_gis_spark.geometry.wkt import Geom, parse_wkt, format_wkt  # noqa: F401
