"""Property-based tests (hypothesis) for the geometry kernel: WKT
round-trip stability, affine invariants, PIP consistency, tile/cell
invariants."""

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from fagi_gis_spark.geometry.affine import rotate_about, scale_about, translate
from fagi_gis_spark.geometry.measures import area, bbox, centroid, npoints
from fagi_gis_spark.geometry.pip import points_in_polygon
from fagi_gis_spark.geometry.wkt import Geom, format_wkt, parse_wkt
from fagi_gis_spark.index.cells import morton_cell_np, parent_cell_np
from fagi_gis_spark.index.tiles import cell_id_np, tile_xy_np, unpack_cell

coord = st.floats(min_value=-179.9, max_value=179.9, allow_nan=False).map(
    lambda x: round(x, 6)
)
lat_c = st.floats(min_value=-84.9, max_value=84.9, allow_nan=False).map(lambda x: round(x, 6))
pt = st.tuples(coord, lat_c)


def _poly_from_center(cx, cy, r, n=5):
    ring = [
        (cx + r * math.cos(2 * math.pi * i / n), cy + r * math.sin(2 * math.pi * i / n))
        for i in range(n)
    ]
    ring.append(ring[0])
    return Geom("POLYGON", [np.array(ring)])


@settings(max_examples=150, deadline=None)
@given(st.lists(pt, min_size=1, max_size=8))
def test_wkt_roundtrip_is_fixed_point(points):
    g = Geom("LINESTRING" if len(points) > 1 else "POINT", np.array(points))
    s1 = format_wkt(g)
    s2 = format_wkt(parse_wkt(s1))
    assert s1 == s2  # canonical form is a fixed point of parse∘format


@settings(max_examples=100, deadline=None)
@given(pt, st.floats(min_value=1e-4, max_value=0.3), st.floats(min_value=-5, max_value=5),
       st.floats(min_value=-5, max_value=5))
def test_translate_moves_centroid_exactly(p, r, dx, dy):
    g = _poly_from_center(p[0], p[1], r)
    c0 = centroid(g)
    c1 = centroid(translate(g, dx, dy))
    np.testing.assert_allclose([c1[0] - c0[0], c1[1] - c0[1]], [dx, dy], atol=1e-9)


@settings(max_examples=100, deadline=None)
@given(pt, st.floats(min_value=1e-3, max_value=0.2), st.floats(min_value=0.1, max_value=5.0))
def test_scale_about_centroid_fixes_centroid_scales_area(p, r, f):
    g = _poly_from_center(p[0], p[1], r)
    c0, a0 = centroid(g), area(g)
    g2 = scale_about(g, f, f)
    c1, a1 = centroid(g2), area(g2)
    np.testing.assert_allclose(c1, c0, atol=1e-9)
    np.testing.assert_allclose(a1, a0 * f * f, rtol=1e-9)


@settings(max_examples=100, deadline=None)
@given(pt, st.floats(min_value=1e-3, max_value=0.2),
       st.floats(min_value=-math.pi, max_value=math.pi))
def test_rotation_preserves_centroid_area_npoints(p, r, ang):
    g = _poly_from_center(p[0], p[1], r)
    g2 = rotate_about(g, ang)
    np.testing.assert_allclose(centroid(g2), centroid(g), atol=1e-9)
    np.testing.assert_allclose(area(g2), area(g), rtol=1e-9)
    assert npoints(g2) == npoints(g)


@settings(max_examples=100, deadline=None)
@given(pt, st.floats(min_value=1e-3, max_value=0.2))
def test_centroid_inside_convex_polygon(p, r):
    g = _poly_from_center(p[0], p[1], r)
    cx, cy = centroid(g)
    inside = points_in_polygon(np.array([cx]), np.array([cy]), g)
    assert inside[0]
    b = bbox(g)
    outside = points_in_polygon(np.array([b[2] + 1.0]), np.array([cy]), g)
    assert not outside[0]


@settings(max_examples=150, deadline=None)
@given(pt, st.integers(min_value=7, max_value=20))
def test_tile_cell_pack_unpack(p, z):
    lon, lat = np.array([p[0]]), np.array([p[1]])
    cell = int(cell_id_np(lon, lat, z)[0])
    zz, x, y = unpack_cell(cell)
    ex, ey = tile_xy_np(lon, lat, z)
    assert (zz, x, y) == (z, int(ex[0]), int(ey[0]))
    assert 0 <= x < 2**z and 0 <= y < 2**z


@settings(max_examples=150, deadline=None)
@given(pt, st.integers(min_value=2, max_value=16))
def test_morton_parent_is_prefix(p, level):
    lon, lat = np.array([p[0]]), np.array([p[1]])
    child = morton_cell_np(lon, lat, level)
    # re-encoding at a coarser level equals the rolled-up parent id scaled
    coarse = morton_cell_np(lon, lat, level - 1)
    assert int(parent_cell_np(child, 1)[0]) >> 2 == int(coarse[0])


@given(pt)
@settings(max_examples=200, deadline=None)
def test_lcc_projection_roundtrip_property(p):
    """EPSG 2249 LCC forward/inverse is a bijection to float64 precision
    anywhere on the globe away from the poles (the engine only needs it
    near the data, but the Snyder forms hold globally)."""
    from fagi_gis_spark.geometry.projection import EPSG_2249

    lon, lat = p
    x, y = EPSG_2249.forward(np.array([lon]), np.array([lat]))
    lo, la = EPSG_2249.inverse(x, y)
    assert abs(lo[0] - lon) < 1e-9
    assert abs(la[0] - lat) < 1e-9
