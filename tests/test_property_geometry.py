"""Property-based tests (hypothesis) for the geometry kernel: WKT
round-trip stability, affine invariants, PIP consistency, tile/cell
invariants."""

import math

import numpy as np
import pytest
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


# ---------------------------------------------------------------------------
# Metric-SRID distance frames (round 3): EPSG 900913 scoring, EPSG 2163
# clustering — closed Snyder forms vs published/derived reference values
# ---------------------------------------------------------------------------


def test_web_mercator_published_values():
    from fagi_gis_spark.geometry.projection import EPSG_900913

    # the canonical projected extent corner (published to the last digit)
    x, y = EPSG_900913.forward(180.0, 0.0)
    assert x == 20037508.342789244 and y == 0.0
    # y at the mirrored latitude is symmetric; round-trip is exact
    import numpy as np

    lons = np.array([-71.5, 0.25, 139.7])
    lats = np.array([42.0, 51.5, -35.7])
    px, py = EPSG_900913.forward(lons, lats)
    lo, la = EPSG_900913.inverse(px, py)
    assert np.abs(lo - lons).max() < 1e-12 and np.abs(la - lats).max() < 1e-9


def test_laea_snyder_formula_values():
    """Snyder 1987 eqs. 24-2/22-4/22-5, R=3, centre (40N, 100W), point
    (30N, 110W): k'=1.0063787, x=-0.4540288, y=-0.4987342 (derived by
    direct evaluation of the published closed form)."""
    import math

    from fagi_gis_spark.geometry.projection import EPSG_2163, LambertAzimuthalEqualArea

    p = LambertAzimuthalEqualArea(lat0_deg=40.0, lon0_deg=-100.0, radius_m=3.0)
    x, y = p.forward(-110.0, 30.0)
    # independent scalar evaluation of the same published equations
    phi0, phi, dl = math.radians(40), math.radians(30), math.radians(-10)
    kp = math.sqrt(2.0 / (1 + math.sin(phi0) * math.sin(phi) + math.cos(phi0) * math.cos(phi) * math.cos(dl)))
    assert abs(x - 3 * kp * math.cos(phi) * math.sin(dl)) < 1e-12
    assert abs(y - 3 * kp * (math.cos(phi0) * math.sin(phi) - math.sin(phi0) * math.cos(phi) * math.cos(dl))) < 1e-12
    # EPSG 2163: centre projects to the origin; a point 1 deg east of the
    # centre at lat0 projects to x ~ R*cos(45)*1deg (small-angle), y ~ small
    cx, cy = EPSG_2163.forward(-100.0, 45.0)
    assert abs(cx) < 1e-9 and abs(cy) < 1e-9
    ex, ey = EPSG_2163.forward(-99.0, 45.0)
    assert abs(ex - 6370997.0 * math.cos(math.radians(45)) * math.radians(1.0)) < 100.0
    assert 0 < ey < 1000.0  # slight northing from the azimuthal geometry


def test_metric_centroid_dist_frames(spark):
    """u_metric_centroid_dist: 900913 inflates ground distance by
    ~1/cos(lat) (Mercator scale), 2163 stays within a few % of the true
    ground distance near the projection centre — both centroid-after-
    transform like the reference's SQL."""
    import math

    from pyspark.sql import functions as F

    from fagi_gis_spark.operators.fusion import u_metric_centroid_dist

    # two points 0.001 deg apart in lon at lat 51 (ground ~69.9 m)
    df = spark.createDataFrame(
        [("POINT (10.000000 51.000000)", "POINT (10.001000 51.000000)")],
        "wkt_a string, wkt_b string",
    )
    d_merc = df.select(u_metric_centroid_dist(900913)(F.col("wkt_a"), F.col("wkt_b")).alias("d")).first()["d"]
    ground = 111195.0 * 0.001 * math.cos(math.radians(51.0))
    assert abs(d_merc - 111319.49079327358 * 0.001) < 0.01  # a*radians(0.001deg)
    assert d_merc / ground == pytest.approx(1.0 / math.cos(math.radians(51.0)), rel=0.01)

    # near the 2163 centre the LAEA distance tracks ground distance
    df2 = spark.createDataFrame(
        [("POINT (-100.000000 45.000000)", "POINT (-99.999000 45.000000)")],
        "wkt_a string, wkt_b string",
    )
    d_laea = df2.select(u_metric_centroid_dist(2163)(F.col("wkt_a"), F.col("wkt_b")).alias("d")).first()["d"]
    ground2 = 2.0 * 6370997.0 * math.asin(
        math.cos(math.radians(45.0)) * math.sin(math.radians(0.0005))
    )
    assert d_laea == pytest.approx(ground2, rel=0.001)


def test_epsg3035_spherical_frame_properties():
    """The 3035-like LAEA frame: false origin lands at the projection
    center, the radial distance of a 1-degree step matches the LAEA
    closed form 2R sin(c/2), and small areas are preserved (the
    defining equal-area property)."""
    import numpy as np

    from fagi_gis_spark.geometry.projection import EPSG_3035_SPHERICAL as p

    x0, y0 = p.forward(np.array([10.0]), np.array([52.0]))
    assert abs(x0[0] - 4321000.0) < 1e-6 and abs(y0[0] - 3210000.0) < 1e-6
    x1, y1 = p.forward(np.array([10.0]), np.array([53.0]))
    d = float(np.hypot(x1[0] - x0[0], y1[0] - y0[0]))
    # LAEA radial distance from center = 2R sin(c/2) (equal-area radial
    # compression, NOT the arc R*c): for c = 1 deg that is R*c*(1 - c^2/24),
    # ~1.41 m under the 111.2 km arc
    c = np.pi / 180.0
    R = 6371007.1809
    assert abs(d - 2.0 * R * np.sin(c / 2.0)) < 1e-6
    assert abs(d - R * c) < 2.0  # and still ~the great-circle degree
    # equal-area sanity: a small square's area is preserved (~0.1% tol)
    eps = 0.01
    lons = np.array([10.0, 10.0 + eps, 10.0 + eps, 10.0])
    lats = np.array([52.0, 52.0, 52.0 + eps, 52.0 + eps])
    xs, ys = p.forward(lons, lats)
    area = 0.5 * abs(
        sum(
            xs[i] * ys[(i + 1) % 4] - xs[(i + 1) % 4] * ys[i]
            for i in range(4)
        )
    )
    sphere_area = (
        (np.radians(eps))
        * (np.sin(np.radians(52.0 + eps)) - np.sin(np.radians(52.0)))
        * R
        * R
    )
    assert abs(area - sphere_area) / sphere_area < 1e-3


def test_epsg3035_ellipsoidal_published_sample_and_roundtrip():
    """The real (ellipsoidal, GRS80 q-series) EPSG 3035: the published
    EPSG Guidance Note 7-2 LAEA worked example — (50N, 5E) ->
    E 3962799.45, N 2999718.85 — reproduces to the centimeter; the
    false origin maps to the (52N, 10E) center both ways; forward ->
    inverse round-trips to ~1e-9 degrees across Europe; and the
    ellipsoidal grid diverges from the r3 spherical stand-in by ~1 km
    at the sample point (why the stand-in was only a stand-in).
    ``projection_for_srid(3035)`` now routes here."""
    import numpy as np

    from fagi_gis_spark.geometry.projection import (
        EPSG_3035,
        EPSG_3035_SPHERICAL,
        projection_for_srid,
    )

    assert projection_for_srid(3035) is EPSG_3035
    x, y = EPSG_3035.forward(np.array([5.0]), np.array([50.0]))
    assert abs(x[0] - 3962799.45) < 0.01 and abs(y[0] - 2999718.85) < 0.01
    x0, y0 = EPSG_3035.forward(np.array([10.0]), np.array([52.0]))
    assert abs(x0[0] - 4321000.0) < 1e-6 and abs(y0[0] - 3210000.0) < 1e-6
    lo0, la0 = EPSG_3035.inverse(np.array([4321000.0]), np.array([3210000.0]))
    assert abs(lo0[0] - 10.0) < 1e-9 and abs(la0[0] - 52.0) < 1e-9
    # round-trip across a Europe-wide lattice
    lons = np.linspace(-10.0, 30.0, 9)
    lats = np.linspace(35.0, 70.0, 8)
    glon, glat = np.meshgrid(lons, lats)
    fx, fy = EPSG_3035.forward(glon.ravel(), glat.ravel())
    rlon, rlat = EPSG_3035.inverse(fx, fy)
    assert np.abs(rlon - glon.ravel()).max() < 1e-8
    assert np.abs(rlat - glat.ravel()).max() < 1e-8
    # ellipsoid-vs-sphere divergence is real (~1.1 km at the sample)
    xs, ys = EPSG_3035_SPHERICAL.forward(np.array([5.0]), np.array([50.0]))
    assert 500.0 < np.hypot(xs[0] - x[0], ys[0] - y[0]) < 2000.0
    # equal-area property on the ellipsoid: a small quad's projected
    # area matches the ellipsoidal surface area (authalic sphere area)
    eps = 0.01
    qlon = np.array([10.0, 10.0 + eps, 10.0 + eps, 10.0])
    qlat = np.array([52.0, 52.0, 52.0 + eps, 52.0 + eps])
    px, py = EPSG_3035.forward(qlon, qlat)
    area = 0.5 * abs(
        sum(px[i] * py[(i + 1) % 4] - px[(i + 1) % 4] * py[i] for i in range(4))
    )
    # ellipsoidal zone area via the q-series: A = a^2 * dlam * (q2-q1)/2
    a = 6378137.0
    q1 = EPSG_3035._q(np.radians(np.array([52.0])))[0]
    q2 = EPSG_3035._q(np.radians(np.array([52.0 + eps])))[0]
    ell_area = a * a * np.radians(eps) * (q2 - q1) / 2.0
    assert abs(area - ell_area) / ell_area < 1e-3
